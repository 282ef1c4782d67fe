package graft.queries

import graft.{QueryDef, QueryGroup, Tables}
import graft.ops.{Clustering, Retrieval, Similarity, VectorLake}
import org.apache.spark.sql.functions._

/** Corpus-curation extensions: BM25 ranked retrieval, embedding-space
  * k-means (Lloyd), and SemDeDup-style cluster-then-dedup. Together these
  * are the "select what to train on" tier of an LLM data pipeline: retrieve
  * in-domain documents, cluster the embedding space, and drop semantic
  * duplicates cluster-locally instead of globally (O(m²) per cluster,
  * m = n/k, instead of O(n²)).
  *
  * Determinism: k-means seeds are the k smallest ids, distances ride the
  * native DotProduct expression (bit-identical to DuckDB list_dot_product),
  * centroids pin to 6 dp between iterations, and every score/cosine rounds
  * through DECIMAL(18,12) before ranking/thresholding — so both engines
  * walk the exact same Lloyd trajectory and keep/drop frontier.
  */
object CurationQueries extends QueryGroup {

  /** x_logreg_train's shared renderings: ONE SQL string per feature /
    * label / iteration step, interpolated into BOTH the Spark
    * expressions and the DuckDB oracle — the repo's single-rendering
    * invariant. Every division is between explicit DOUBLE casts so
    * neither engine's decimal-literal typing enters the arithmetic. */
  private object LrQ {
    val label = "CAST(CASE WHEN text LIKE '%spark%' THEN 1.0 ELSE 0.0 END " +
      "AS DOUBLE)"
    val features = Seq(
      "CAST(length(text) - length(replace(text, 'spark', '')) AS DOUBLE)" +
        " / CAST(5.0 AS DOUBLE)",
      "CAST(length(text) - length(replace(text, 'query', '')) AS DOUBLE)" +
        " / CAST(5.0 AS DOUBLE)",
      "CAST(least(n_chars, 2000) AS DOUBLE) / CAST(1000.0 AS DOUBLE)")
    val iters = 5

    /** The 6-dp-pinned sigmoid over the current weight row (a0..a3) —
      * textually identical per iteration, matching Training.sigmoid6. */
    private val p =
      "CAST(round(CAST(1.0 / (1.0 + exp(-(a0 + a1 * x1 + a2 * x2 + a3 * x3)))" +
        " AS DECIMAL(18,12)), 6) AS DOUBLE)"

    val oracle: String = {
      val f = s"""f AS (SELECT $label AS y,
                 |  ${features(0)} AS x1,
                 |  ${features(1)} AS x2,
                 |  ${features(2)} AS x3
                 |FROM documents)""".stripMargin
      val w0 = "w0 AS (SELECT CAST(0.0 AS DOUBLE) AS a0, " +
        "CAST(0.0 AS DOUBLE) AS a1, CAST(0.0 AS DOUBLE) AS a2, " +
        "CAST(0.0 AS DOUBLE) AS a3)"
      val steps = (1 to iters).map { k =>
        val terms = Seq("(p - y)", "(p - y) * x1", "(p - y) * x2",
          "(p - y) * x3").zipWithIndex.map { case (t, j) =>
          s"SUM(CAST($t AS DECIMAL(28,12))) AS s$j" }.mkString(", ")
        val upd = (0 to 3).map(j =>
          s"CAST(round(CAST(a$j - 2.0 * (CAST(s$j AS DOUBLE) / n) " +
            s"AS DECIMAL(18,12)), 6) AS DOUBLE) AS a$j").mkString(", ")
        s"""g$k AS (SELECT count(*) AS n, $terms
           |  FROM (SELECT f.*, $p AS p FROM f, w${k - 1}) t),
           |w$k AS (SELECT $upd FROM w${k - 1}, g$k)""".stripMargin
      }
      s"""WITH $f,
         |$w0,
         |${steps.mkString(",\n")},
         |scored AS (SELECT y, $p AS p FROM f, w$iters)
         |SELECT item, value FROM (
         |  SELECT 'w_bias' AS item, a0 AS value FROM w$iters
         |  UNION ALL SELECT 'w_kw', a1 FROM w$iters
         |  UNION ALL SELECT 'w_ctx', a2 FROM w$iters
         |  UNION ALL SELECT 'w_len', a3 FROM w$iters
         |  UNION ALL SELECT 'n_pred_pos',
         |    CAST((SELECT count(*) FROM scored WHERE p > 0.5) AS DOUBLE)
         |  UNION ALL SELECT 'n_correct',
         |    CAST((SELECT count(*) FROM scored
         |          WHERE (p > 0.5) = (y > 0.5)) AS DOUBLE)
         |) ORDER BY item""".stripMargin
    }
  }

  /** Shared kmeans CTE chain (k = 8, iters = 2, dim = 64) over `src`. */
  private def kmeansSql(src: String): String =
    s"""WITH v AS ($src),
       |vn AS (SELECT vec_id, e, list_dot_product(e, e) en FROM v),
       |c0 AS (SELECT vec_id cid, e ce FROM v ORDER BY vec_id LIMIT 8),
       |d1 AS (SELECT vn.vec_id, c0.cid,
       |         vn.en - 2 * list_dot_product(vn.e, c0.ce)
       |           + list_dot_product(c0.ce, c0.ce) AS d
       |       FROM vn, c0),
       |a1 AS (SELECT vec_id, cid FROM (
       |         SELECT *, row_number() OVER (PARTITION BY vec_id
       |                                      ORDER BY d, cid) r FROM d1)
       |       WHERE r = 1),
       |m1 AS (SELECT a1.cid, t.i,
       |         CAST(round(CAST(avg(vn.e[t.i]) AS DECIMAL(18,12)), 6) AS DOUBLE) m
       |       FROM a1 JOIN vn USING (vec_id), range(1, 65) t(i)
       |       GROUP BY a1.cid, t.i),
       |c1 AS (SELECT cid, list(m ORDER BY i) ce FROM m1 GROUP BY cid),
       |d2 AS (SELECT vn.vec_id, c1.cid,
       |         vn.en - 2 * list_dot_product(vn.e, c1.ce)
       |           + list_dot_product(c1.ce, c1.ce) AS d
       |       FROM vn, c1),
       |a2 AS (SELECT vec_id, cid, d FROM (
       |         SELECT *, row_number() OVER (PARTITION BY vec_id
       |                                      ORDER BY d, cid) r FROM d2)
       |       WHERE r = 1)""".stripMargin

  val defs: Seq[QueryDef] = Seq(

    // BM25 top-20 for a fixed bag-of-words query. The query-term filter is
    // applied to the token stream BEFORE any aggregation (candidate
    // postings only); (N, avgdl) ride a 1-row broadcast cross join.
    QueryDef(
      "x_bm25_topk",
      (s, d) =>
        Retrieval.bm25TopK(Tables.documents(s, d), "doc_id", "text",
            queryTerms = Seq("spark", "hash", "join"), k = 20)
          .orderBy("rank"),
      Some("""WITH toks AS (SELECT doc_id AS doc,
             |    unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9'']+'),
             |                       x -> len(x) > 0)) AS term
             |  FROM documents),
             |dl AS (SELECT doc, COUNT(*) AS dl FROM toks GROUP BY 1),
             |stats AS (SELECT COUNT(*) AS n, avg(dl) AS avgdl FROM dl),
             |tf AS (SELECT doc, term, COUNT(*) AS tf FROM toks
             |       WHERE term IN ('spark', 'hash', 'join') GROUP BY 1, 2),
             |df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
             |sc AS (SELECT tf.doc,
             |         sum(ln(1 + (n - df + 0.5) / (df + 0.5))
             |             * (tf * 2.2)
             |             / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))) AS s
             |       FROM tf JOIN df USING (term) JOIN dl USING (doc), stats
             |       GROUP BY 1),
             |r AS (SELECT doc,
             |        CAST(round(CAST(s AS DECIMAL(18,12)), 6) AS DOUBLE) AS score
             |      FROM sc)
             |SELECT doc, score, rank FROM (
             |  SELECT *, row_number() OVER (ORDER BY score DESC, doc) AS rank
             |  FROM r)
             |WHERE rank <= 20 ORDER BY rank""".stripMargin)),

    // Hybrid retrieval: reciprocal-rank fusion of the BM25 top-50 and
    // the cosine top-50 for embedding query 0 — the calibration-free
    // lexical+vector combiner every RAG/retrieval stack ships. Each
    // list contributes 1/(60+rank); the fused top-20 must match
    // DuckDB's replay of both rankings and the fusion exactly.
    QueryDef(
      "x_hybrid_rrf",
      (s, d) => {
        val bm = Retrieval.bm25TopK(Tables.documents(s, d), "doc_id",
            "text", queryTerms = Seq("spark", "hash", "join"), k = 50)
          .select(col("doc"), col("rank"))
        val emb = Tables.embeddings(s, d)
        val cos = Similarity.bruteForceTopK(
            emb.filter(col("vec_id") === 0), emb, "vec_id", "embedding",
            k = 50)
          .select(col("c_id").as("doc"), col("rn").as("rank"))
        Retrieval.rrfFuse(Seq(bm, cos), k = 20).orderBy("rank")
      },
      Some("""WITH toks AS (SELECT doc_id AS doc,
             |    unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9'']+'),
             |                       x -> len(x) > 0)) AS term
             |  FROM documents),
             |dl AS (SELECT doc, COUNT(*) AS dl FROM toks GROUP BY 1),
             |stats AS (SELECT COUNT(*) AS n, avg(dl) AS avgdl FROM dl),
             |tf AS (SELECT doc, term, COUNT(*) AS tf FROM toks
             |       WHERE term IN ('spark', 'hash', 'join') GROUP BY 1, 2),
             |df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
             |sc AS (SELECT tf.doc,
             |         sum(ln(1 + (n - df + 0.5) / (df + 0.5)) * (tf * 2.2)
             |             / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))) AS s
             |       FROM tf JOIN df USING (term) JOIN dl USING (doc), stats
             |       GROUP BY 1),
             |bm AS (SELECT doc, rank FROM (
             |         SELECT doc, row_number() OVER (
             |           ORDER BY CAST(round(CAST(s AS DECIMAL(18,12)), 6)
             |             AS DOUBLE) DESC, doc) AS rank
             |         FROM sc)
             |       WHERE rank <= 50),
             |v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) e FROM embeddings),
             |p AS (SELECT c.vec_id AS doc,
             |        round(list_dot_product(q.e, c.e)
             |          / (sqrt(list_dot_product(q.e, q.e))
             |             * sqrt(list_dot_product(c.e, c.e))), 6) AS sim
             |      FROM v q JOIN v c ON q.vec_id = 0 AND c.vec_id != 0),
             |cs AS (SELECT doc, rank FROM (
             |         SELECT doc, row_number() OVER (
             |           ORDER BY sim DESC, doc) AS rank FROM p)
             |       WHERE rank <= 50),
             |f AS (SELECT COALESCE(bm.doc, cs.doc) AS doc,
             |        CAST(round(CAST(
             |          COALESCE(CAST(1.0 AS DOUBLE) / (60 + bm.rank), 0)
             |          + COALESCE(CAST(1.0 AS DOUBLE) / (60 + cs.rank), 0)
             |          AS DECIMAL(18,12)), 6) AS DOUBLE) AS rrf
             |      FROM bm FULL OUTER JOIN cs ON bm.doc = cs.doc)
             |SELECT doc, rrf, rank FROM (
             |  SELECT *, row_number() OVER (ORDER BY rrf DESC, doc) AS rank
             |  FROM f)
             |WHERE rank <= 20 ORDER BY rank""".stripMargin)),

    // MMR diversity re-ranking over the cosine top-10 (Carbonell/
    // Goldstein): greedy picks maximize λ·rel − (1−λ)·max-sim-to-
    // selected. The oracle unrolls the 4 greedy steps as chained CTEs;
    // (1−λ) is computed as a double SUBTRACTION on both engines
    // (1.0 − 0.7 ≠ the literal 0.3 in binary). Every score rounds to
    // 6 dp before comparison, ties break on doc — bit-reproducible.
    QueryDef(
      "x_mmr_rerank",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val top = Similarity.bruteForceTopK(
            emb.filter(col("vec_id") === 0), emb, "vec_id", "embedding",
            k = 10)
          .select(col("c_id").as("doc"), col("sim").as("rel"))
        val cands = top.join(
          emb.select(col("vec_id").as("doc"), col("embedding").as("vec")),
          Seq("doc"))
        Retrieval.mmrRerank(cands, k = 4, lambda = 0.7).orderBy("rank")
      },
      Some("""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) e FROM embeddings),
             |p AS (SELECT c.vec_id AS doc,
             |        round(list_dot_product(q.e, c.e)
             |          / (sqrt(list_dot_product(q.e, q.e))
             |             * sqrt(list_dot_product(c.e, c.e))), 6) AS rel
             |      FROM v q JOIN v c ON q.vec_id = 0 AND c.vec_id != 0),
             |cand AS (SELECT doc, rel FROM (
             |    SELECT *, row_number() OVER (ORDER BY rel DESC, doc) rn
             |    FROM p) WHERE rn <= 10),
             |ps AS (SELECT a.doc da, b.doc db,
             |         round(list_dot_product(va.e, vb.e)
             |           / (sqrt(list_dot_product(va.e, va.e))
             |              * sqrt(list_dot_product(vb.e, vb.e))), 6) AS s
             |       FROM cand a JOIN cand b ON a.doc != b.doc
             |       JOIN v va ON va.vec_id = a.doc
             |       JOIN v vb ON vb.vec_id = b.doc),
             |lam AS (SELECT CAST(0.7 AS DOUBLE) AS l,
             |               CAST(1 AS DOUBLE) - CAST(0.7 AS DOUBLE) AS il),
             |m1 AS (SELECT doc, round(l * rel, 6) AS sc FROM cand, lam),
             |p1 AS (SELECT doc, sc FROM m1 ORDER BY sc DESC, doc LIMIT 1),
             |m2 AS (SELECT c.doc, round(l * c.rel - il * (
             |         SELECT max(s) FROM ps
             |         WHERE da = c.doc AND db IN (SELECT doc FROM p1)), 6) sc
             |       FROM cand c, lam WHERE c.doc NOT IN (SELECT doc FROM p1)),
             |p2 AS (SELECT doc, sc FROM m2 ORDER BY sc DESC, doc LIMIT 1),
             |s2 AS (SELECT doc FROM p1 UNION ALL SELECT doc FROM p2),
             |m3 AS (SELECT c.doc, round(l * c.rel - il * (
             |         SELECT max(s) FROM ps
             |         WHERE da = c.doc AND db IN (SELECT doc FROM s2)), 6) sc
             |       FROM cand c, lam WHERE c.doc NOT IN (SELECT doc FROM s2)),
             |p3 AS (SELECT doc, sc FROM m3 ORDER BY sc DESC, doc LIMIT 1),
             |s3 AS (SELECT doc FROM s2 UNION ALL SELECT doc FROM p3),
             |m4 AS (SELECT c.doc, round(l * c.rel - il * (
             |         SELECT max(s) FROM ps
             |         WHERE da = c.doc AND db IN (SELECT doc FROM s3)), 6) sc
             |       FROM cand c, lam WHERE c.doc NOT IN (SELECT doc FROM s3)),
             |p4 AS (SELECT doc, sc FROM m4 ORDER BY sc DESC, doc LIMIT 1),
             |sel AS (
             |  SELECT doc, sc, 1 AS rank FROM p1
             |  UNION ALL SELECT doc, sc, 2 FROM p2
             |  UNION ALL SELECT doc, sc, 3 FROM p3
             |  UNION ALL SELECT doc, sc, 4 FROM p4)
             |SELECT CAST(doc AS BIGINT) AS doc, CAST(sc AS DOUBLE) AS mmr,
             |  CAST(rank AS INT) AS rank
             |FROM sel ORDER BY rank""".stripMargin)),

    // Exact phrase search on a fly-built positional index: per-term
    // postings filtered before the position-intersect join; shuffle
    // volume is the phrase terms' postings, never the corpus.
    QueryDef(
      "x_phrase_search",
      (s, d) =>
        Retrieval.phraseSearch(Tables.documents(s, d), "doc_id", "text",
            Seq("spark", "join"))
          .orderBy("doc"),
      Some("""WITH toks AS (SELECT doc_id AS doc,
             |    list_filter(string_split_regex(lower(text), '[^a-z0-9'']+'),
             |                x -> len(x) > 0) AS tl
             |  FROM documents),
             |pos AS (SELECT doc, unnest(tl) AS term,
             |               unnest(range(1, len(tl) + 1)) AS p
             |        FROM toks),
             |t0 AS (SELECT doc, p AS p0 FROM pos WHERE term = 'spark'),
             |t1 AS (SELECT doc, p - 1 AS p0 FROM pos WHERE term = 'join')
             |SELECT doc, COUNT(*) AS n_matches
             |FROM t0 JOIN t1 USING (doc, p0)
             |GROUP BY doc ORDER BY doc""".stripMargin)),

    // FastText-style hashed linear scorer: md5-bucket token weights in
    // [-0.5, 0.5), logistic of the mean — the row-local, shuffle-free
    // model-inference shape of a quality filter.
    QueryDef(
      "x_hashed_classifier",
      (s, d) =>
        Tables.documents(s, d)
          .select(col("doc_id"),
            Retrieval.hashedLinearScore(col("text")).as("score"))
          .withColumn("keep", col("score") >= 0.5)
          .orderBy("doc_id"),
      Some("""WITH toks AS (SELECT doc_id,
             |    list_filter(string_split_regex(lower(text), '[^a-z0-9'']+'),
             |                x -> len(x) > 0) AS tl
             |  FROM documents),
             |s AS (SELECT doc_id,
             |        list_sum(list_transform(tl, t ->
             |          ('0x' || substr(md5(t), 1, 4))::INT / 65536.0 - 0.5))
             |          / len(tl) AS mw
             |      FROM toks)
             |SELECT doc_id,
             |  CAST(round(CAST(1.0 / (1.0 + exp(-4.0 * mw)) AS DECIMAL(18,12)), 6)
             |       AS DOUBLE) AS score,
             |  CAST(round(CAST(1.0 / (1.0 + exp(-4.0 * mw)) AS DECIMAL(18,12)), 6)
             |       AS DOUBLE) >= 0.5 AS keep
             |FROM s ORDER BY doc_id""".stripMargin)),

    // Two deterministic Lloyd iterations from the 8 smallest-id seeds over
    // the raw embedding corpus; both engines walk the same trajectory
    // because centroids pin to 6 dp between passes.
    QueryDef(
      "x_kmeans_lloyd",
      (s, d) =>
        Clustering.kmeansAssign(Tables.embeddings(s, d), "vec_id", "embedding",
            k = 8, iters = 2)
          .orderBy("id"),
      Some(kmeansSql(
        "SELECT vec_id, CAST(embedding AS DOUBLE[]) e FROM embeddings") +
        """
          |SELECT vec_id AS id, cid AS cluster,
          |  CAST(round(CAST(d AS DECIMAL(18,12)), 6) AS DOUBLE) AS dist
          |FROM a2 ORDER BY id""".stripMargin)),

    // TRAIN a model-based quality classifier end to end: batch-gradient
    // logistic regression (the fastText-style recipe behind production
    // quality filters) learning to RECOVER a keyword labeling rule from
    // bag-of-substring features — the standard heuristic-label setup
    // (label by rule, learn a smooth scorer). After 5 rounds the weight
    // concentrates on the informative feature and training accuracy
    // reaches 100% (n_correct = corpus size) — the oracle proves
    // convergence, not just arithmetic. Each round is ONE hash
    // aggregate (2 + features partial sums, no row shuffle); sigmoid
    // outputs pin to 6 dp and gradient terms sum as DECIMAL(28,12), so
    // both engines walk the exact same trajectory (the kmeans
    // determinism discipline applied to gradient descent). The oracle
    // unrolls the rounds as CTEs from the SAME per-iteration rendering.
    QueryDef(
      "x_logreg_train",
      (s, d) => {
        import s.implicits._
        val docs = Tables.documents(s, d)
        val features = LrQ.features.map(expr)
        val w = graft.ops.Training.logisticTrain(
          docs, features, expr(LrQ.label), iters = LrQ.iters, lr = 2.0)
        val scored = docs.select(expr(LrQ.label).as("y"),
          graft.ops.Training.score(w, features).as("p"))
        val Seq(nPred, nCorrect) = scored
          .agg(count(when(col("p") > 0.5, 1)),
            count(when((col("p") > 0.5) === (col("y") > 0.5), 1)))
          .head().toSeq.map(_.asInstanceOf[Long])
        Seq(("n_correct", nCorrect.toDouble),
          ("n_pred_pos", nPred.toDouble), ("w_bias", w(0)),
          ("w_ctx", w(2)), ("w_kw", w(1)), ("w_len", w(3)))
          .toDF("item", "value").orderBy("item")
      },
      Some(LrQ.oracle)),

    // Winnowing (MOSS) fingerprints: min-hash of each 4-window of trigram
    // hashes — density-guaranteed shared fingerprints for any k+w-1-token
    // overlap; entirely row-local, dedup becomes an equi-join on fp.
    QueryDef(
      "x_winnowing",
      (s, d) =>
        Tables.documents(s, d)
          .select(col("doc_id").as("doc"),
            explode(graft.ops.TextAnalysis.winnowFingerprints(
              col("text"), k = 3, w = 4)).as("fp"))
          .orderBy("doc", "fp"),
      Some("""WITH toksr AS (SELECT doc_id AS doc,
             |    list_filter(string_split_regex(lower(text), '[^a-z0-9'']+'),
             |                x -> len(x) > 0) AS tl
             |  FROM documents),
             |g AS (SELECT doc,
             |        [substr(md5(array_to_string(tl[i:i+2], ' ')), 1, 8)
             |         for i in range(1, len(tl) - 1)] AS hs
             |      FROM toksr WHERE len(tl) >= 3),
             |w AS (SELECT doc,
             |        list_sort(list_distinct(
             |          [list_min(hs[j:j+3]) for j in range(1, len(hs) - 2)])) AS fps
             |      FROM g WHERE len(hs) >= 4)
             |SELECT doc, unnest(fps) AS fp FROM w ORDER BY doc, fp""".stripMargin)),

    // Span-level exact substring dedup: tokens covered by any 4-gram that
    // occurs in >= 2 documents are scrubbed, the doc rebuilt from the
    // survivors — the Lee-et-al. span tier, as a chain of hash aggregates.
    QueryDef(
      "x_span_scrub",
      (s, d) =>
        graft.ops.Dedup.scrubRepeatedSpans(Tables.documents(s, d),
            "doc_id", "text", n = 4, minDf = 2)
          .orderBy("doc"),
      Some("""WITH toksr AS (SELECT doc_id AS doc,
             |    list_filter(string_split_regex(lower(text), '[^a-z0-9'']+'),
             |                x -> len(x) > 0) AS tl
             |  FROM documents),
             |sh AS (SELECT doc, unnest(range(1, len(tl) - 2)) AS p0,
             |              unnest([array_to_string(tl[i:i+3], ' ')
             |                      for i in range(1, len(tl) - 2)]) AS s
             |       FROM toksr WHERE len(tl) >= 4),
             |bp AS (SELECT s FROM (
             |         SELECT s, count(DISTINCT doc) AS df FROM sh GROUP BY s)
             |       WHERE df >= 2),
             |cov AS (SELECT DISTINCT doc, p FROM (
             |          SELECT sh.doc, unnest(range(sh.p0, sh.p0 + 4)) AS p
             |          FROM sh SEMI JOIN bp USING (s))),
             |pos AS (SELECT doc, unnest(tl) AS term,
             |               unnest(range(1, len(tl) + 1)) AS p
             |        FROM toksr),
             |kept AS (SELECT pos.doc, pos.p, pos.term
             |         FROM pos ANTI JOIN cov USING (doc, p)),
             |agg AS (SELECT doc, string_agg(term, ' ' ORDER BY p) AS text_clean,
             |               count(*) AS n_kept
             |        FROM kept GROUP BY doc)
             |SELECT t.doc, coalesce(a.text_clean, '') AS text_clean,
             |  CAST(coalesce(a.n_kept, 0) AS BIGINT) AS n_kept,
             |  CAST(len(t.tl) - coalesce(a.n_kept, 0) AS BIGINT) AS n_removed
             |FROM toksr t LEFT JOIN agg a USING (doc) ORDER BY doc""".stripMargin)),

    // SemDeDup over corpus + planted exact copies at vec_id+100000: cluster,
    // then within each cluster drop every vector with a smaller-id
    // neighbor at cosine >= 0.95. Finds exactly the planted copies.
    QueryDef(
      "x_semdedup",
      (s, d) => {
        val emb = Tables.embeddings(s, d).select("vec_id", "embedding")
        val corpus = emb.union(
          emb.select((col("vec_id") + 100000).as("vec_id"), col("embedding")))
        Clustering.semDedup(corpus, "vec_id", "embedding",
            k = 8, iters = 2, threshold = 0.95)
          .orderBy("id")
      },
      Some(kmeansSql(
        """SELECT vec_id, CAST(embedding AS DOUBLE[]) e FROM embeddings
          |           UNION ALL
          |           SELECT vec_id + 100000, CAST(embedding AS DOUBLE[]) FROM embeddings""".stripMargin) +
        """,
          |p AS (SELECT DISTINCT b.vec_id AS id
          |      FROM a2 a JOIN a2 b ON a.cid = b.cid AND a.vec_id < b.vec_id
          |      JOIN vn va ON va.vec_id = a.vec_id
          |      JOIN vn vb ON vb.vec_id = b.vec_id
          |      WHERE CAST(round(CAST(list_dot_product(va.e, vb.e)
          |              / (sqrt(va.en) * sqrt(vb.en)) AS DECIMAL(18,12)), 6)
          |            AS DOUBLE) >= 0.95)
          |SELECT a2.vec_id AS id, cid AS cluster,
          |  a2.vec_id NOT IN (SELECT id FROM p) AS keep
          |FROM a2 ORDER BY id""".stripMargin)),

    // IVF-on-the-lake ANN round trip: k-means cells become TxnCatalog
    // partitions (one atomic commit with the centroid router), the query
    // vector routes to its 2 nearest centroids driver-side, readWhereIn
    // prunes the read to exactly those cells at manifest cost, and the
    // exact cosine rerank returns top-10. The oracle replays the same
    // Lloyd trajectory (kmeansSql), the same (d, cid) probe routing
    // against the iteration-1 centroids, and the same rounded rerank —
    // the whole build→route→prune→rerank path is value-locked.
    QueryDef(
      "s_ann_lake",
      (s, d) => {
        // seeded IVF build cached (deterministic Lloyd trajectory);
        // iterations measure the probe-route-prune-rerank read
        val root = QueryFixtures.annLake(s, d)
        val emb = Tables.embeddings(s, d).select("vec_id", "embedding")
        val q = emb.orderBy("vec_id").limit(1)
          .select(graft.ops.Similarity.toDouble(col("embedding")))
          .collect()(0).getSeq[Double](0)
        VectorLake.query(s, root, "vecs", q, nProbe = 2, topK = 10)
          .orderBy("rank")
      },
      Some(kmeansSql(
        "SELECT vec_id, CAST(embedding AS DOUBLE[]) e FROM embeddings") +
        """,
          |qv AS (SELECT e, en FROM vn ORDER BY vec_id LIMIT 1),
          |pd AS (SELECT c1.cid,
          |         qv.en - 2 * list_dot_product(qv.e, c1.ce)
          |           + list_dot_product(c1.ce, c1.ce) AS d
          |       FROM c1, qv),
          |pc AS (SELECT cid FROM pd ORDER BY d, cid LIMIT 2),
          |cand AS (SELECT a2.vec_id, a2.cid FROM a2 SEMI JOIN pc USING (cid)),
          |sims AS (SELECT cand.vec_id, cand.cid,
          |           round(list_dot_product(qv.e, vn.e)
          |             / (sqrt(qv.en) * sqrt(vn.en)), 6) AS sim
          |         FROM cand JOIN vn USING (vec_id), qv)
          |SELECT vec_id AS id, cid AS cluster, sim, rank FROM (
          |  SELECT *, row_number() OVER (ORDER BY sim DESC, vec_id) AS rank
          |  FROM sims)
          |WHERE rank <= 10 ORDER BY rank""".stripMargin)),

    // FILTERED vector search (hybrid attribute + ANN): the index stores
    // the label column beside each vector, the query routes to 3 cells,
    // and the predicate applies to the probed candidates BEFORE the
    // cosine rerank — the oracle replays the identical probe set and
    // filters the same candidates, so ranks are value-locked end to
    // end.
    QueryDef(
      "s_ann_filtered",
      (s, d) => {
        val root = QueryFixtures.annFilteredLake(s, d) // shared cached IVF
        val emb = Tables.embeddings(s, d)
          .select("vec_id", "embedding", "label")
        val q = emb.orderBy("vec_id").limit(1)
          .select(graft.ops.Similarity.toDouble(col("embedding")))
          .collect()(0).getSeq[Double](0)
        VectorLake.query(s, root, "vecs", q, nProbe = 3, topK = 10,
            where = Some(col("label") === 1))
          .orderBy("rank")
      },
      Some(kmeansSql(
        "SELECT vec_id, CAST(embedding AS DOUBLE[]) e FROM embeddings") +
        """,
          |qv AS (SELECT e, en FROM vn ORDER BY vec_id LIMIT 1),
          |pd AS (SELECT c1.cid,
          |         qv.en - 2 * list_dot_product(qv.e, c1.ce)
          |           + list_dot_product(c1.ce, c1.ce) AS d
          |       FROM c1, qv),
          |pc AS (SELECT cid FROM pd ORDER BY d, cid LIMIT 3),
          |cand AS (SELECT a2.vec_id, a2.cid FROM a2 SEMI JOIN pc USING (cid)
          |         JOIN embeddings e2 ON e2.vec_id = a2.vec_id
          |         WHERE e2.label = 1),
          |sims AS (SELECT cand.vec_id, cand.cid,
          |           round(list_dot_product(qv.e, vn.e)
          |             / (sqrt(qv.en) * sqrt(vn.en)), 6) AS sim
          |         FROM cand JOIN vn USING (vec_id), qv)
          |SELECT vec_id AS id, cid AS cluster, sim, rank FROM (
          |  SELECT *, row_number() OVER (ORDER BY sim DESC, vec_id) AS rank
          |  FROM sims)
          |WHERE rank <= 10 ORDER BY rank""".stripMargin))
  )
}
