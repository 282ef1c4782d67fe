package graft.queries

import graft.{QueryDef, QueryGroup, Tables}
import graft.ops.{Dedup, LangId, Pq, Similarity, TextAnalysis}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** LLM-training-data pipeline extensions (SURVEY.md §2.2 last row; north-star
  * capabilities beyond the reference): deduplication, similarity search, and
  * text analysis over the `documents` / `embeddings` tables.
  *
  * The test lake has no natural duplicates (verified), so dedup queries build
  * a deterministic duplicated corpus inline — the same UNION ALL construction
  * on both engines — and then find exactly the planted pairs.
  */
object ExtensionQueries extends QueryGroup {

  /** Brute-force cosine top-k oracle computed with the SAME m-subspace
    * slice decomposition the PQ-ADC scorer uses (Σ_j of per-slice dots;
    * sliced norms) over the RAW vectors — with a lossless codebook the ADC
    * path must reproduce it exactly. DuckDB list slicing is 1-based
    * inclusive. */
  private def pqSlicedCosineOracle(m: Int, ds: Int, k: Int, qMax: Int): String = {
    def sliceDot(a: String, b: String) = (0 until m).map { j =>
      val lo = j * ds + 1; val hi = (j + 1) * ds
      s"list_dot_product($a[$lo:$hi], $b[$lo:$hi])"
    }.mkString("\n          + ")
    s"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) e FROM embeddings),
       |p AS (SELECT q.vec_id q_id, c.vec_id c_id,
       |        round((${sliceDot("q.e", "c.e")})
       |          / (sqrt(${sliceDot("q.e", "q.e")})
       |             * sqrt(${sliceDot("c.e", "c.e")})), 6) AS sim
       |      FROM v q JOIN v c ON q.vec_id < $qMax AND q.vec_id != c.vec_id)
       |SELECT q_id, c_id, sim, rn FROM (
       |  SELECT *, row_number() OVER (PARTITION BY q_id
       |                              ORDER BY sim DESC, c_id) rn FROM p)
       |WHERE rn <= $k ORDER BY q_id, rn""".stripMargin
  }

  /** Unrolled BPE as a DuckDB CTE chain (the k-core/pageRank device):
    * training REDERIVED in SQL. Each step counts adjacent symbol pairs
    * over the word dictionary weighted by word count (ties: count desc,
    * then lexicographically smallest pair — ASCII corpus, so UTF-8 binary
    * and UTF-16 orders agree), picks the winner, and applies it with the
    * greedy left-to-right non-overlap rule: candidate start positions in
    * consecutive runs keep only even offsets from the run start (overlaps
    * only arise for a==b runs, where this parity IS left-to-right greedy).
    *
    * Because [[graft.ops.Bpe.train]] applies each learned merge to the
    * whole dictionary as it goes and (at minWordCount=1) the dictionary
    * holds every distinct corpus word, the final training state already
    * equals the ENCODED form of each word: encodeWord's lowest-rank-first
    * loop is equivalent to applying merges in rank order, since a merge
    * can only create pairs of strictly higher rank than itself. So one
    * chain yields token counts per word; per-doc stats follow by join.
    * tokens_per_word's 6-dp HALF_UP is computed in exact integer
    * arithmetic — (2·t·10⁶ + w) // (2·w) — which matches the engine's
    * BigDecimal rounding for every feasible word count (non-terminating
    * expansions can't sit on a half-boundary; terminating ones are exact
    * in both engines). */
  private def bpeOracle(numMerges: Int): String = {
    val head =
      """WITH d0 AS MATERIALIZED (
        |  SELECT w, CAST(COUNT(*) AS BIGINT) c, string_split(w, '') s FROM (
        |    SELECT unnest(string_split(lower(text), ' ')) w FROM documents) t
        |  WHERE len(w) > 0 GROUP BY w)""".stripMargin
    val steps = (1 to numMerges).map { k =>
      val p = k - 1
      s"""pc$k AS MATERIALIZED (
         |  SELECT a, b, SUM(c) cnt FROM (
         |    SELECT s[j] a, s[j+1] b, c FROM (
         |      SELECT c, s, unnest(generate_series(1, len(s)-1)) j
         |      FROM d$p WHERE len(s) >= 2) t1) t2
         |  GROUP BY a, b),
         |m$k AS MATERIALIZED (SELECT a, b FROM pc$k ORDER BY cnt DESC, a, b LIMIT 1),
         |ap$k AS MATERIALIZED (
         |  SELECT w, i FROM (
         |    SELECT w, i, min(i) OVER (PARTITION BY w, g) rs FROM (
         |      SELECT p.w, p.i,
         |             p.i - row_number() OVER (PARTITION BY p.w ORDER BY p.i) g
         |      FROM (SELECT w, s, unnest(generate_series(1, len(s)-1)) i
         |            FROM d$p WHERE len(s) >= 2) p, m$k m
         |      WHERE p.s[p.i] = m.a AND p.s[p.i+1] = m.b) t1) t2
         |  WHERE (i - rs) % 2 = 0),
         |d$k AS MATERIALIZED (
         |  SELECT w, c, list(sym ORDER BY i) s FROM (
         |    SELECT p.w, p.c, p.i,
         |           CASE WHEN k1.i IS NOT NULL THEN p.s[p.i] || p.s[p.i+1]
         |                ELSE p.s[p.i] END sym,
         |           k2.i drop_i
         |    FROM (SELECT w, c, s, unnest(generate_series(1, len(s))) i FROM d$p) p
         |    LEFT JOIN ap$k k1 ON k1.w = p.w AND k1.i = p.i
         |    LEFT JOIN ap$k k2 ON k2.w = p.w AND k2.i = p.i - 1) t
         |  WHERE drop_i IS NULL
         |  GROUP BY w, c)""".stripMargin
    }
    (head +: steps).mkString(",\n") +
      s""",
         |tok AS MATERIALIZED (SELECT w, CAST(len(s) AS BIGINT) nt FROM d$numMerges),
         |docw AS (SELECT doc_id, w FROM (
         |    SELECT doc_id, unnest(string_split(lower(text), ' ')) w
         |    FROM documents) t
         |  WHERE len(w) > 0),
         |agg AS (SELECT doc.doc_id id,
         |               CAST(COUNT(t.w) AS BIGINT) nw,
         |               CAST(COALESCE(SUM(t.nt), 0) AS BIGINT) ntk
         |        FROM documents doc
         |        LEFT JOIN docw dw ON dw.doc_id = doc.doc_id
         |        LEFT JOIN tok t ON t.w = dw.w
         |        GROUP BY doc.doc_id)
         |SELECT id, CAST(nw AS INTEGER) n_words, CAST(ntk AS INTEGER) n_tokens,
         |       CASE WHEN nw = 0 THEN 0.0
         |            ELSE CAST((2*ntk*1000000 + nw) // (2*nw) AS DOUBLE)/1000000
         |       END tokens_per_word
         |FROM agg ORDER BY id""".stripMargin
  }

  /** Unrolled pinned power iteration as a DuckDB CTE chain (same device as
    * the PageRank oracle): per round, s = e·v via list_dot_product, w from
    * a 64-way position sum rounded to 10 dp, v = w/‖w‖ rounded to 10 dp —
    * expression shapes mirror [[graft.ops.Spectral.powerIteration]]. */
  private def powerIterationOracle(d: Int, iters: Int): String = {
    val head =
      s"""WITH e AS (SELECT CAST(embedding AS DOUBLE[]) e FROM embeddings),
         |v0 AS (SELECT j, round(1.0 / sqrt($d.0), 10) v
         |       FROM generate_series(1, $d) t(j))""".stripMargin
    val rounds = (1 to iters).map { k =>
      s"""s$k AS (SELECT list_dot_product(e.e,
         |          (SELECT list(v ORDER BY j) FROM v${k - 1})) s, e.e AS e
         |      FROM e),
         |w$k AS (SELECT j, round(SUM(s * e[j]), 10) w
         |      FROM s$k CROSS JOIN generate_series(1, $d) t(j) GROUP BY j),
         |n$k AS (SELECT sqrt(SUM(w * w)) n FROM w$k),
         |v$k AS (SELECT j, round(w / (SELECT n FROM n$k), 10) v FROM w$k)""".stripMargin
    }
    (head +: rounds).mkString(",\n") +
      s"\nSELECT j AS i, round(v, 6) AS loading FROM v$iters ORDER BY i"
  }

  /** documents ∪ exact copies at doc_id+100000. */
  private def dupCorpus(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select("doc_id", "text")
    docs.union(docs.select((col("doc_id") + 100000).as("doc_id"), col("text")))
  }

  private val dupCorpusSql =
    """SELECT doc_id, text FROM documents
      |UNION ALL SELECT doc_id + 100000, text FROM documents""".stripMargin

  /** documents ∪ near-copies (first word dropped) at doc_id+100000. */
  private def nearDupCorpus(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    docs.select(col("doc_id"), lower(col("text")).as("text"))
      .union(docs.select(
        (col("doc_id") + 100000).as("doc_id"),
        regexp_replace(lower(col("text")), "^[^ ]+ ", "").as("text")))
  }

  private val nearDupCorpusSql =
    """SELECT doc_id, lower(text) AS text FROM documents
      |UNION ALL
      |SELECT doc_id + 100000, regexp_replace(lower(text), '^[^ ]+ ', '') FROM documents""".stripMargin

  /** Shared oracle for the two near-dup finders: exact shingle-blocked
    * Jaccard (perfect recall); the MinHash query's LSH recall at J >= 0.875
    * (min doc = 10 words) is 1 - (1-J²)¹⁶ ≈ 1-7e-11 per pair — equal output.
    *
    * Intersections come from the exploded shingle join + GROUP BY (|A∩B| =
    * shared-shingle count, |A∪B| = |A|+|B|−|A∩B|), NOT from list_intersect
    * over per-pair list payloads: identical result, but the join carries
    * only scalars — the list-payload form blew past 70 GB on the 10×
    * corpus while this shape streams. */
  private val jaccardOracle =
    s"""WITH corpus AS ($nearDupCorpusSql),
       |toks AS (SELECT doc_id, string_split(text, ' ') w FROM corpus),
       |sh AS (SELECT doc_id,
       |         list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
       |                        for i in range(1, len(w) - 1)]) s
       |       FROM toks WHERE len(w) >= 3),
       |ex AS (SELECT doc_id, unnest(s) shingle FROM sh),
       |sz AS (SELECT doc_id, COUNT(*) nsh FROM ex GROUP BY doc_id),
       |inter AS (SELECT a.doc_id ida, b.doc_id idb, COUNT(*) c
       |          FROM ex a JOIN ex b ON a.shingle = b.shingle
       |            AND a.doc_id < b.doc_id
       |          GROUP BY 1, 2),
       |j AS (SELECT ida, idb,
       |        CAST(c AS DOUBLE) / (sa.nsh + sb.nsh - c) AS jac
       |      FROM inter
       |      JOIN sz sa ON sa.doc_id = inter.ida
       |      JOIN sz sb ON sb.doc_id = inter.idb)
       |SELECT ida, idb, round(jac, 6) AS jaccard FROM j
       |WHERE jac >= 0.5 ORDER BY ida, idb""".stripMargin

  /** documents ∪ first-half "quote" docs at doc_id+200000 — the containment
    * test corpus (shared by the exact and df-capped tiers). */
  private def containmentCorpus(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    docs.select(col("doc_id"), lower(col("text")).as("text"))
      .union(docs.select(
        (col("doc_id") + 200000).as("doc_id"),
        // first half of the token stream, space-joined
        concat_ws(" ", slice(split(lower(col("text")), " "), lit(1),
          (size(split(lower(col("text")), " ")) / 2).cast("int"))).as("text")))
  }

  /** Containment oracle; `capSql` optionally inserts the df-cap CTE (and the
    * intersection then reads from `exf` instead of `ex`). */
  private def containmentOracle(capSql: String): String = {
    val src = if (capSql.isEmpty) "ex" else "exf"
    s"""WITH corpus AS (
       |  SELECT doc_id, lower(text) AS text FROM documents
       |  UNION ALL
       |  SELECT doc_id + 200000,
       |    array_to_string(list_slice(string_split(lower(text), ' '), 1,
       |      len(string_split(lower(text), ' ')) // 2), ' ')
       |  FROM documents),
       |toks AS (SELECT doc_id, string_split(text, ' ') w FROM corpus),
       |sh AS (SELECT doc_id,
       |         list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
       |                        for i in range(1, len(w) - 1)]) s
       |       FROM toks WHERE len(w) >= 3),
       |ex AS (SELECT doc_id, len(s) AS sz, unnest(s) AS shingle FROM sh)$capSql,
       |inter AS (SELECT a.doc_id ida, b.doc_id idb, COUNT(*) cnt, max(a.sz) sza
       |          FROM $src a JOIN $src b ON a.shingle = b.shingle
       |                             AND a.doc_id != b.doc_id
       |          GROUP BY 1, 2)
       |SELECT ida AS contained, idb AS container,
       |  round(CAST(cnt AS DOUBLE) / sza, 6) AS containment
       |FROM inter WHERE CAST(cnt AS DOUBLE) / sza >= 0.9
       |ORDER BY contained, container""".stripMargin
  }

  /** Shared exact oracle for the embedding near-dup tiers (exact and LSH —
    * the LSH recall bound makes their outputs equal, see x_embedding_lsh). */
  private val embeddingNeardupOracle =
    """WITH corpus AS (
      |  SELECT vec_id, CAST(embedding AS DOUBLE[]) e FROM embeddings
      |  UNION ALL
      |  SELECT vec_id + 100000, CAST(embedding AS DOUBLE[]) FROM embeddings),
      |n AS (SELECT vec_id, e, sqrt(list_dot_product(e, e)) nrm FROM corpus),
      |p AS (SELECT a.vec_id ida, b.vec_id idb,
      |        round(list_dot_product(a.e, b.e) / (a.nrm * b.nrm), 6) AS cos
      |      FROM n a JOIN n b ON a.vec_id < b.vec_id)
      |SELECT ida, idb, cos FROM p WHERE cos >= 0.95 ORDER BY ida, idb""".stripMargin

  val defs: Seq[QueryDef] = Seq(

    // Exact dedup: surviving row ids after hash-dedup of the doubled corpus.
    QueryDef(
      "x_dedup_exact",
      (s, d) =>
        Dedup.exact(dupCorpus(s, d), "text", "doc_id")
          .select("doc_id").orderBy("doc_id"),
      Some(s"""WITH corpus AS ($dupCorpusSql)
              |SELECT min(doc_id) AS doc_id FROM corpus GROUP BY text
              |ORDER BY doc_id""".stripMargin)),

    // Exact dedup group stats keyed by content hash.
    QueryDef(
      "x_dedup_groups",
      (s, d) =>
        dupCorpus(s, d)
          .groupBy(sha2(col("text").cast("binary"), 256).as("h"))
          .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_copies"))
          .orderBy("h"),
      Some(s"""WITH corpus AS ($dupCorpusSql)
              |SELECT sha256(text) AS h, min(doc_id) AS keep_id, COUNT(*) AS n_copies
              |FROM corpus GROUP BY 1 ORDER BY h""".stripMargin)),

    // Paragraph-level (CCNet-style) dedup: sub-document granularity — each
    // distinct 8-word paragraph survives only at its first corpus position,
    // and documents are reassembled from their surviving paragraphs. On the
    // doubled corpus every copy's paragraphs are drops; originals keep all.
    QueryDef(
      "x_paragraph_dedup",
      (s, d) =>
        Dedup.paragraphDedup(dupCorpus(s, d), "doc_id", "text", paraWords = 8)
          .orderBy("doc_id"),
      Some(s"""WITH corpus AS ($dupCorpusSql),
              |toks AS (SELECT doc_id, string_split(lower(text), ' ') w FROM corpus),
              |paras AS (SELECT doc_id,
              |    [array_to_string(w[i*8+1 : i*8+8], ' ')
              |     for i in range(0, CAST(ceil(len(w)/8.0) AS INT))] ps
              |  FROM toks),
              |ex AS (SELECT doc_id, unnest(ps) AS para,
              |         generate_subscripts(ps, 1) AS para_idx FROM paras),
              |rn AS (SELECT *, row_number() OVER
              |         (PARTITION BY para ORDER BY doc_id, para_idx) rn FROM ex)
              |SELECT doc_id,
              |  CAST(COUNT(*) AS BIGINT) AS n_paras,
              |  CAST(COUNT(CASE WHEN rn = 1 THEN 1 END) AS BIGINT) AS n_kept,
              |  coalesce(string_agg(CASE WHEN rn = 1 THEN para END, ' '
              |                      ORDER BY para_idx), '') AS clean_text
              |FROM rn GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // Normalization-invariant dedup: case/whitespace-mangled copies collapse.
    QueryDef(
      "x_dedup_normalized",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val corpus = docs.select(col("doc_id"), col("text"))
          .union(docs.select(
            (col("doc_id") + 100000).as("doc_id"),
            concat(upper(col("text")), lit("  ")).as("text")))
        val norm = regexp_replace(lower(trim(col("text"))), "\\s+", " ")
        corpus
          .groupBy(md5(norm.cast("binary")).as("h"))
          .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_copies"))
          .orderBy("h")
      },
      Some("""WITH corpus AS (
             |  SELECT doc_id, text FROM documents
             |  UNION ALL
             |  SELECT doc_id + 100000, upper(text) || '  ' FROM documents)
             |SELECT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS h,
             |  min(doc_id) AS keep_id, COUNT(*) AS n_copies
             |FROM corpus GROUP BY 1 ORDER BY h""".stripMargin)),

    // Exact n-gram Jaccard near-dup pairs (count-based shingle blocking,
    // perfect recall). MEASURED choice vs the AllPairs prefix tier
    // (ngramJaccardPairsPrefix, spec-identical): at t=0.5 the prefix is
    // |A|/2+1 shingles — on this small-vocab corpus that still pairs
    // heavily and the per-candidate array intersects cost 13.2 s vs 4.8 s
    // for one count-based groupBy. Prefix wins only where the bound is
    // tight (see x_containment at t=0.9) or shingle frequencies are
    // long-tailed; both tiers stay in the library.
    QueryDef(
      "x_jaccard_neardup",
      (s, d) =>
        Dedup.ngramJaccardPairs(nearDupCorpus(s, d), "doc_id", "text",
            shingleN = 3, threshold = 0.5)
          .select(col("ida"), col("idb"), round(col("jaccard"), 6).as("jaccard"))
          .orderBy("ida", "idb"),
      Some(jaccardOracle)),

    // MinHash+LSH near-dup pairs: shingle → 32-hash signature → 16 bands →
    // bucket join → exact-Jaccard verify. Same verified output as above.
    QueryDef(
      "x_minhash_lsh",
      (s, d) =>
        Dedup.minHashLshPairs(nearDupCorpus(s, d), "doc_id", "text",
            shingleN = 3, numHashes = 32, bands = 16, threshold = 0.5)
          .select(col("ida"), col("idb"), round(col("jaccard"), 6).as("jaccard"))
          .orderBy("ida", "idb"),
      Some(jaccardOracle)),

    // Incremental dedup: pair ONLY the incoming batch (near-dup rewrites at
    // doc_id+100000) against the existing corpus — corpus-internal pairs
    // are never re-derived. Oracle: bipartite exact Jaccard.
    QueryDef(
      "x_incremental_dedup",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val corpus = docs.select(col("doc_id"), lower(col("text")).as("text"))
        val batch = docs.select(
          (col("doc_id") + 100000).as("doc_id"),
          regexp_replace(lower(col("text")), "^[^ ]+ ", "").as("text"))
        Dedup.minHashLshPairsAgainst(corpus, batch, "doc_id", "text",
            shingleN = 3, numHashes = 32, bands = 16, threshold = 0.5)
          .select(col("ida"), col("idb"), round(col("jaccard"), 6).as("jaccard"))
          .orderBy("ida", "idb")
      },
      Some("""WITH corpus AS (SELECT doc_id, lower(text) AS text FROM documents),
             |batch AS (SELECT doc_id + 100000 AS doc_id,
             |            regexp_replace(lower(text), '^[^ ]+ ', '') AS text
             |          FROM documents),
             |shc AS (SELECT doc_id,
             |          list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
             |                         for i in range(1, len(w) - 1)]) s
             |        FROM (SELECT doc_id, string_split(text, ' ') w FROM corpus)
             |        WHERE len(w) >= 3),
             |shb AS (SELECT doc_id,
             |          list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
             |                         for i in range(1, len(w) - 1)]) s
             |        FROM (SELECT doc_id, string_split(text, ' ') w FROM batch)
             |        WHERE len(w) >= 3),
             |exc AS (SELECT doc_id, unnest(s) shingle FROM shc),
             |exb AS (SELECT doc_id, unnest(s) shingle FROM shb),
             |szc AS (SELECT doc_id, COUNT(*) nsh FROM exc GROUP BY doc_id),
             |szb AS (SELECT doc_id, COUNT(*) nsh FROM exb GROUP BY doc_id),
             |inter AS (SELECT c.doc_id ida, b.doc_id idb, COUNT(*) cnt
             |          FROM exc c JOIN exb b ON c.shingle = b.shingle
             |          GROUP BY 1, 2),
             |j AS (SELECT ida, idb,
             |        CAST(cnt AS DOUBLE) / (sa.nsh + sb.nsh - cnt) AS jac
             |      FROM inter
             |      JOIN szc sa ON sa.doc_id = inter.ida
             |      JOIN szb sb ON sb.doc_id = inter.idb)
             |SELECT ida, idb, round(jac, 6) AS jaccard FROM j
             |WHERE jac >= 0.5 ORDER BY ida, idb""".stripMargin)),

    // Train-vs-eval decontamination: the benchmark-leakage scrub. A
    // deterministic md5-prefix split carves ~10% of the corpus into the
    // "eval set"; every remaining train doc is flagged with the number of
    // distinct 5-grams it shares with any eval doc. The contaminated rows
    // are exactly the near/exact duplicate twins that straddle the split.
    QueryDef(
      "x_decontamination",
      (s, d) => {
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), lower(col("text")).as("text"))
        val isEval = graft.ops.Sampling.sampleKey(col("doc_id")) <
          graft.ops.Sampling.hexThreshold(0.10)
        Dedup.decontaminate(docs.filter(!isEval), docs.filter(isEval),
            "doc_id", "text", shingleN = 5, minHits = 1)
          .orderBy("doc_id")
      },
      Some("""WITH d AS (SELECT doc_id, lower(text) AS text FROM documents),
             |ev AS (SELECT * FROM d
             |       WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < '199a'),
             |tr AS (SELECT * FROM d
             |       WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) >= '199a'),
             |evg AS (SELECT DISTINCT
             |          unnest(list_distinct(
             |            [w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' '
             |               || w[i+3] || ' ' || w[i+4]
             |             for i in range(1, len(w) - 3)])) AS shingle
             |        FROM (SELECT string_split(text, ' ') w FROM ev)
             |        WHERE len(w) >= 5),
             |trg AS (SELECT doc_id,
             |          unnest(list_distinct(
             |            [w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' '
             |               || w[i+3] || ' ' || w[i+4]
             |             for i in range(1, len(w) - 3)])) AS shingle
             |        FROM (SELECT doc_id, string_split(text, ' ') w FROM tr)
             |        WHERE len(w) >= 5),
             |h AS (SELECT doc_id, COUNT(*) AS eval_ngram_hits
             |      FROM trg JOIN evg USING (shingle) GROUP BY 1)
             |SELECT tr.doc_id,
             |       COALESCE(eval_ngram_hits, 0) AS eval_ngram_hits,
             |       CAST(COALESCE(eval_ngram_hits, 0) >= 1 AS INT) AS contaminated
             |FROM tr LEFT JOIN h USING (doc_id) ORDER BY tr.doc_id""".stripMargin)),

    // Document-frequency-capped Jaccard (the stop-shingle skew guard,
    // maxShingleFreq): shingles occurring in > 20 docs are excluded from the
    // blocking join AND the intersection count; set sizes stay full. The
    // oracle applies the identical cap — the capped measure is deterministic
    // on both engines.
    QueryDef(
      "x_jaccard_dfcapped",
      (s, d) =>
        Dedup.ngramJaccardPairs(nearDupCorpus(s, d), "doc_id", "text",
            shingleN = 3, threshold = 0.5, maxShingleFreq = 20)
          .select(col("ida"), col("idb"), round(col("jaccard"), 6).as("jaccard"))
          .orderBy("ida", "idb"),
      Some(s"""WITH corpus AS ($nearDupCorpusSql),
              |toks AS (SELECT doc_id, string_split(text, ' ') w FROM corpus),
              |sh AS (SELECT doc_id,
              |         list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
              |                        for i in range(1, len(w) - 1)]) s
              |       FROM toks WHERE len(w) >= 3),
              |ex AS (SELECT doc_id, len(s) AS sz, unnest(s) AS shingle FROM sh),
              |exf AS (SELECT * FROM (
              |          SELECT *, COUNT(*) OVER (PARTITION BY shingle) AS df FROM ex)
              |        WHERE df <= 20),
              |inter AS (
              |  SELECT a.doc_id ida, b.doc_id idb, COUNT(*) cnt,
              |         max(a.sz) sza, max(b.sz) szb
              |  FROM exf a JOIN exf b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
              |  GROUP BY 1, 2)
              |SELECT ida, idb,
              |  round(CAST(cnt AS DOUBLE) / (sza + szb - cnt), 6) AS jaccard
              |FROM inter
              |WHERE CAST(cnt AS DOUBLE) / (sza + szb - cnt) >= 0.5
              |ORDER BY ida, idb""".stripMargin)),

    // Containment pairs: the first half of every document is planted as a
    // separate "quote" doc at doc_id+200000 — contained ≥ 90% in its source
    // even though Jaccard ≈ 0.5 would miss at higher thresholds.
    // ...run via one-sided prefix filtering (only the CONTAINED side can
    // prune at t = 0.9: it indexes ~10% of its shingles, the rarest ones;
    // spec-identical to the count-based tier). Same oracle.
    QueryDef(
      "x_containment",
      (s, d) =>
        Dedup.containmentPairsPrefix(containmentCorpus(s, d), "doc_id", "text",
            shingleN = 3, threshold = 0.9)
          .select(col("contained"), col("container"),
            round(col("containment"), 6).as("containment"))
          .orderBy("contained", "container"),
      Some(containmentOracle(capSql = ""))),

    // Containment with the document-frequency cap engaged — the 100 TB tier
    // (same pattern as x_jaccard_dfcapped): shingles appearing in more than
    // 20 docs are dropped from BOTH the blocking join and the intersection
    // count on BOTH engines. A boilerplate shingle with frequency f feeds
    // f² candidate rows to the uncapped join; the cap bounds every
    // shingle's contribution at cap², making candidate volume linear in
    // corpus size for natural text. The exact row above stays as the
    // perfect-recall baseline.
    QueryDef(
      "x_containment_capped",
      (s, d) =>
        Dedup.containmentPairsPrefix(containmentCorpus(s, d), "doc_id", "text",
            shingleN = 3, threshold = 0.9, maxShingleFreq = 20)
          .select(col("contained"), col("container"),
            round(col("containment"), 6).as("containment"))
          .orderBy("contained", "container"),
      Some(containmentOracle(
        capSql = """,
          |exf AS (SELECT * FROM (
          |          SELECT *, COUNT(*) OVER (PARTITION BY shingle) AS df FROM ex)
          |        WHERE df <= 20)""".stripMargin))),

    // SimHash near-dup pairs over the EXPLICIT SQL-reproducible signature
    // (char-fold + two mix31-style avalanche chains — the HLL oracle
    // device applied to SimHash): pieces = maxHamming+1 makes the banded
    // join perfect-recall, so the output equals the all-pairs Hamming join
    // and the oracle reproduces the entire pipeline — tokenization,
    // per-token hash, bit votes, 62-bit signature, Hamming verify —
    // bit-for-bit in SQL.
    QueryDef(
      "x_simhash_neardup",
      (s, d) =>
        Dedup.simHashPairsExplicit(nearDupCorpus(s, d), "doc_id", "text",
            maxHamming = 3)
          .orderBy("ida", "idb"),
      Some(s"""WITH corpus AS ($nearDupCorpusSql),
             |tok AS (SELECT doc_id,
             |          unnest(list_filter(string_split(text, ' '),
             |                             t -> len(t) > 0)) AS t
             |        FROM corpus),
             |f AS (SELECT doc_id,
             |        list_reduce(list_prepend(CAST(0 AS BIGINT),
             |          list_transform(string_split(t, ''),
             |                         c -> CAST(ord(c) AS BIGINT))),
             |          (h, c) -> (h * 31 + c) % 2147483648) AS h0
             |      FROM tok),
             |m AS (SELECT doc_id,
             |        xor(h3a, h3a // 8192) AS ha,
             |        xor(h3b, h3b // 8192) AS hb
             |      FROM (SELECT doc_id,
             |              (xor(h1a, h1a // 32768) * 1103515245)
             |                % 2147483648 AS h3a,
             |              (xor(h1b, h1b // 32768) * 1103515245)
             |                % 2147483648 AS h3b
             |            FROM (SELECT doc_id,
             |                    (h0 * 2654435761) % 2147483648 AS h1a,
             |                    (xor(h0, 625148049) * 2654435761)
             |                      % 2147483648 AS h1b
             |                  FROM f))),
             |sigtok AS (SELECT doc_id, ha + hb * 2147483648 AS ts FROM m),
             |votes AS (SELECT doc_id, j,
             |            SUM(CASE WHEN (ts // power(2, j)::BIGINT) % 2 = 1
             |                     THEN 1 ELSE -1 END) AS v
             |          FROM sigtok
             |          CROSS JOIN (SELECT unnest(range(62)) AS j) bits
             |          GROUP BY doc_id, j),
             |sig AS (SELECT doc_id,
             |          SUM(CASE WHEN v > 0 THEN power(2, j)::BIGINT
             |                   ELSE 0 END)::BIGINT AS s
             |        FROM votes GROUP BY doc_id)
             |SELECT a.doc_id ida, b.doc_id idb,
             |  bit_count(xor(a.s, b.s)) AS hamming
             |FROM sig a JOIN sig b ON a.doc_id < b.doc_id
             |WHERE bit_count(xor(a.s, b.s)) <= 3
             |ORDER BY ida, idb""".stripMargin)),

    // Brute-force cosine top-5 per query vector (exact ANN baseline).
    QueryDef(
      "x_cosine_topk",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        Similarity.bruteForceTopK(
            emb.filter(col("vec_id") < 10), emb, "vec_id", "embedding", k = 5)
          .select("q_id", "c_id", "sim", "rn")
          .orderBy("q_id", "rn")
      },
      Some("""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) e FROM embeddings),
             |p AS (SELECT q.vec_id q_id, c.vec_id c_id,
             |        round(list_dot_product(q.e, c.e)
             |          / (sqrt(list_dot_product(q.e, q.e))
             |             * sqrt(list_dot_product(c.e, c.e))), 6) AS sim
             |      FROM v q JOIN v c ON q.vec_id < 10 AND q.vec_id != c.vec_id)
             |SELECT q_id, c_id, sim, rn FROM (
             |  SELECT *, row_number() OVER (PARTITION BY q_id
             |                              ORDER BY sim DESC, c_id) rn FROM p)
             |WHERE rn <= 5 ORDER BY q_id, rn""".stripMargin)),

    // Embedding-cosine near-dup pairs over corpus + planted copies — the
    // exact tier, run as the distributed blocked all-pairs schedule
    // (Similarity.nearDupPairsBlockJoin: pack → equi-join block pairs →
    // primitive per-block loops; bit-identical to the declarative BNLJ
    // nearDupPairs, which stays the library baseline the specs verify
    // against). Exact all-pairs is Θ(n²·d) flops by definition — this is
    // the plan that spends them at matmul constants with no driver state;
    // x_embedding_lsh below skips the n² entirely and is the 100 TB path.
    QueryDef(
      "x_embedding_neardup",
      (s, d) => {
        val emb = Tables.embeddings(s, d).select("vec_id", "embedding")
        val corpus = emb.union(
          emb.select((col("vec_id") + 100000).as("vec_id"), col("embedding")))
        Similarity.nearDupPairsBlockJoin(corpus, "vec_id", "embedding",
            threshold = 0.95, rowsPerBlock = 512)
          .orderBy("ida", "idb")
      },
      Some(embeddingNeardupOracle)),

    // LSH-blocked embedding near-dup — same verified output as the exact
    // tier (recall bound 1-2e-8 per pair at cos >= 0.95, 256 planes / 32
    // bands), but candidate volume is per-bucket, not n²: the shape that
    // survives a 100 TB corpus.
    QueryDef(
      "x_embedding_lsh",
      (s, d) => {
        val emb = Tables.embeddings(s, d).select("vec_id", "embedding")
        val corpus = emb.union(
          emb.select((col("vec_id") + 100000).as("vec_id"), col("embedding")))
        Similarity.cosineLshPairs(corpus, "vec_id", "embedding", threshold = 0.95)
          .orderBy("ida", "idb")
      },
      Some(embeddingNeardupOracle)),

    // int8 embedding quantization: per-vector scale + code CSV (the 4×
    // storage tier of a 100 TB embedding corpus), exact cross-engine.
    QueryDef(
      "x_quantize_int8",
      (s, d) => {
        val z = Similarity.quantizeInt8(col("embedding"))
        Tables.embeddings(s, d)
          .select(
            col("vec_id"),
            round(z.getField("scale"), 6).as("scale"),
            concat_ws(",", transform(z.getField("q"), _.cast("string"))).as("q_csv"))
          .orderBy("vec_id")
      },
      Some("""WITH t AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) e FROM embeddings),
             |s AS (SELECT vec_id, e,
             |        list_max(list_transform(e, x -> abs(x))) / 127.0 AS scale
             |      FROM t)
             |SELECT vec_id, round(scale, 6) AS scale,
             |  array_to_string(list_transform(e, x ->
             |    CAST(CAST(round(CASE WHEN scale = 0 THEN 0 ELSE x / scale END)
             |              AS INT) AS VARCHAR)), ',') AS q_csv
             |FROM s ORDER BY vec_id""".stripMargin)),

    // IVF approximate top-k — approximate by design → rows-only check here;
    // recall-vs-brute-force bound asserted in ScalaTest.
    QueryDef(
      "x_ann_ivf",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        Similarity.ivfTopK(
            emb.filter(col("vec_id") < 10), emb, "vec_id", "embedding",
            k = 5, nCentroids = 16, nProbe = 4)
          .select("q_id", "c_id", "sim", "rn")
          .orderBy("q_id", "rn")
      },
      None),

    // IVF with every cell probed (nProbe = nCentroids): the bucketing +
    // rerank machinery runs unchanged but degenerates to exact search, so
    // the full IVF pipeline — centroid selection, assignment, probing,
    // in-cell rerank — is checkable against the brute-force cosine oracle.
    // The approximate setting above keeps its recall spec (SimilaritySpec).
    QueryDef(
      "x_ann_ivf_exhaustive",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        Similarity.ivfTopK(
            emb.filter(col("vec_id") < 10), emb, "vec_id", "embedding",
            k = 5, nCentroids = 16, nProbe = 16)
          .select("q_id", "c_id", "sim", "rn")
          .orderBy("q_id", "rn")
      },
      Some("""-- exhaustive-IVF oracle
             |WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) e FROM embeddings),
             |p AS (SELECT q.vec_id q_id, c.vec_id c_id,
             |        round(list_dot_product(q.e, c.e)
             |          / (sqrt(list_dot_product(q.e, q.e))
             |             * sqrt(list_dot_product(c.e, c.e))), 6) AS sim
             |      FROM v q JOIN v c ON q.vec_id < 10 AND q.vec_id != c.vec_id)
             |SELECT q_id, c_id, sim, rn FROM (
             |  SELECT *, row_number() OVER (PARTITION BY q_id
             |                              ORDER BY sim DESC, c_id) rn FROM p)
             |WHERE rn <= 5 ORDER BY q_id, rn""".stripMargin)),

    // Product-quantization ADC search with a LOSSLESS dictionary codebook
    // (one centroid per distinct subvector ⇒ reconstruction is exact ⇒ ADC
    // degenerates to exact sliced-cosine search): the full PQ pipeline —
    // train, encode, per-query table build, m-lookup scoring, rank — is
    // oracle-checked against a plain SQL cosine computed with the same
    // 8-subspace slice decomposition on the RAW vectors (no PQ anywhere in
    // the oracle). The k-means-codebook compression tier is x_pq_adc below.
    QueryDef(
      "x_pq_adc_exact",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val cb = Pq.trainDict(emb, "embedding", m = 8)
        val encoded = Pq.encode(emb, "vec_id", "embedding", cb)
        Pq.topKAdc(emb.filter(col("vec_id") < 10), encoded,
            "vec_id", "embedding", cb, k = 5)
          .select("q_id", "c_id", "sim", "rn")
          .orderBy("q_id", "rn")
      },
      Some(pqSlicedCosineOracle(m = 8, ds = 8, k = 5, qMax = 10))),

    // PQ-ADC with the real per-subspace k-means codebook (m=8 bytes per
    // vector — a 32x storage cut on float32 d=64) + exact rerank of the
    // ADC shortlist: the production search shape (compression scans the
    // corpus, full precision ranks the shortlist). No cross-engine oracle
    // is expressible (scores depend on trained centroids); recall vs brute
    // force is spec-verified in PqSpec, and the encode/table/lookup
    // machinery itself is oracle-proven by x_pq_adc_exact above.
    QueryDef(
      "x_pq_adc",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val cb = Pq.trainKmeans(emb, "vec_id", "embedding", m = 8, k = 16, iters = 2)
        val encoded = Pq.encode(emb, "vec_id", "embedding", cb)
        Pq.topKAdcRerank(emb.filter(col("vec_id") < 10), encoded, emb,
            "vec_id", "embedding", cb, k = 5, pool = 50)
          .select("q_id", "c_id", "sim", "rn")
          .orderBy("q_id", "rn")
      },
      None),

    // Edit-distance similarity join (typo-level near-dup, where shingle
    // Jaccard is blunt): corpus = 100 docs + copies with ONE deleted char,
    // joined at levenshtein <= 2 via q-gram prefix filtering
    // (Dedup.editDistancePairs — only each string's q·t+1 RAREST grams are
    // indexed). The oracle runs the full quadratic levenshtein join: if the
    // prefix filter dropped any true pair, the hash would catch it — this
    // checks perfect recall of the blocking, not just the verifier.
    QueryDef(
      "x_editdist_neardup",
      (s, d) => {
        val t0 = Tables.documents(s, d).filter(col("doc_id") < 100)
          .select(col("doc_id"), substring(col("text"), 1, 200).as("t"))
        val corpus = t0.union(t0.select(
          (col("doc_id") + 100000).as("doc_id"),
          concat(substring(col("t"), 1, 4),
            col("t").substr(lit(6), length(col("t")))).as("t")))
        Dedup.editDistancePairs(corpus, "doc_id", "t", maxDist = 2, q = 3)
          .orderBy("ida", "idb")
      },
      Some("""WITH t0 AS (SELECT doc_id, substr(text, 1, 200) t
             |            FROM documents WHERE doc_id < 100),
             |corpus AS (SELECT doc_id, t FROM t0
             |           UNION ALL
             |           SELECT doc_id + 100000, substr(t, 1, 4) || substr(t, 6)
             |           FROM t0)
             |SELECT a.doc_id ida, b.doc_id idb,
             |  CAST(levenshtein(a.t, b.t) AS INT) dist
             |FROM corpus a JOIN corpus b
             |  ON a.doc_id < b.doc_id AND abs(length(a.t) - length(b.t)) <= 2
             |WHERE levenshtein(a.t, b.t) <= 2
             |ORDER BY ida, idb""".stripMargin)),

    // Count-min-sketch heavy hitters over part keys. The sketch uses the
    // EXPLICIT Carter-Wegman hash family (published constants, plain
    // BIGINT arithmetic), so the DuckDB oracle rebuilds the identical
    // depth*width cell table — estimates match INCLUDING every collision's
    // overestimate, not just on collision-free keys. Sketch size is
    // 3*256 cells regardless of input size; the build is one map-side-
    // combined hash aggregate.
    QueryDef(
      "x_cms_heavy_hitters",
      (s, d) =>
        graft.ops.Sketches.cmsHeavyHitters(
          Tables.lineitem(s, d).select(col("l_partkey")),
          "l_partkey", width = 256, depth = 3, topK = 20),
      Some("""WITH r AS (SELECT CAST(l_partkey AS BIGINT) k FROM lineitem),
             |h AS (SELECT * FROM (VALUES (0, 1299709, 7), (1, 15485863, 97),
             |                            (2, 32452843, 997)) t(j, a, b)),
             |cells AS (SELECT j, ((a * k + b) % 2147483647) % 256 AS bucket,
             |                 COUNT(*) cnt
             |          FROM r CROSS JOIN h GROUP BY 1, 2),
             |keys AS (SELECT DISTINCT k FROM r),
             |kb AS (SELECT keys.k, h.j,
             |              ((h.a * keys.k + h.b) % 2147483647) % 256 AS bucket
             |       FROM keys CROSS JOIN h),
             |est AS (SELECT k, MIN(COALESCE(cnt, 0)) est
             |        FROM kb LEFT JOIN cells ON kb.j = cells.j
             |                               AND kb.bucket = cells.bucket
             |        GROUP BY k)
             |SELECT k, CAST(est AS BIGINT) AS est FROM est
             |ORDER BY est DESC, k LIMIT 20""".stripMargin)),

    // HyperLogLog distinct-count estimate with an explicit avalanche hash
    // (two multiply-mod-2^31 + xorshift rounds — plain BIGINT/xor/shift
    // SQL): the oracle rebuilds the 64 registers bit-for-bit (bucket =
    // low 6 hash bits, rank = leading-zero position of the 25-bit suffix)
    // and applies the same published estimator — so the APPROXIMATE answer
    // itself is cross-engine verified, unlike builtin HLLs whose internal
    // hashes can't leave the engine (a_approx_distinct stays rows-only for
    // exactly that reason).
    QueryDef(
      "x_hll_distinct",
      (s, d) =>
        graft.ops.Sketches.hllEstimate(
          Tables.lineitem(s, d).select(col("l_partkey")), "l_partkey", bits = 6),
      Some("""WITH k0 AS (SELECT CAST(l_partkey AS BIGINT) % 2147483648 h0
             |            FROM lineitem),
             |m1 AS (SELECT (h0 * 2654435761) % 2147483648 AS h1 FROM k0),
             |m2 AS (SELECT xor(h1, h1 >> 15) AS h2 FROM m1),
             |m3 AS (SELECT (h2 * 1103515245) % 2147483648 AS h3 FROM m2),
             |h AS (SELECT xor(h3, h3 >> 13) AS hv FROM m3),
             |x AS (SELECT hv % 64 AS bucket, hv // 64 AS w FROM h),
             |rr AS (SELECT bucket,
             |         MAX(CASE WHEN w = 0 THEN 26.0
             |             ELSE 25.0 - floor(log2(CAST(w AS DOUBLE))) END) M
             |       FROM x GROUP BY bucket),
             |agg AS (SELECT COUNT(*) nb,
             |               COALESCE(SUM(pow(2.0, -M)), 0.0) s2 FROM rr),
             |vs AS (SELECT (64 - nb) AS V, (64.0 - nb) + s2 AS S FROM agg),
             |e AS (SELECT V, 0.709 * 64 * 64 / S AS E FROM vs)
             |SELECT round(CASE WHEN E <= 2.5 * 64 AND V > 0
             |                  THEN 64.0 * ln(64.0 / V) ELSE E END, 6)
             |         AS hll_estimate
             |FROM e""".stripMargin)),

    // Real BPE tokenization: 20 merges trained on THIS corpus's word-count
    // dictionary (distributed agg + driver greedy loop — the production
    // trainer shape), then row-local encoding under broadcast ranks.
    // Per-doc token/fertility stats; the synthetic corpus has a ~31-word
    // vocabulary, so a budget of 20 merges leaves tokenization partial and
    // the fertility column informative. The oracle REDERIVES training and
    // encoding as one unrolled CTE chain (the k-core/pageRank device, see
    // bpeOracle); merge order and encoding are also hand-verified in
    // BpeSpec.
    QueryDef(
      "x_bpe_tokenize",
      (s, d) => {
        val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
        val merges = graft.ops.Bpe.train(docs, "text", numMerges = 20)
        graft.ops.Bpe.tokenize(docs, "doc_id", "text", merges)
          .orderBy("id")
      },
      Some(bpeOracle(20))),

    // Compression-ratio quality signal over documents: deflate-bytes /
    // raw-bytes per doc (too low = boilerplate, too high = junk). No SQL
    // deflate exists in the oracle engine — rows-only; the signal's
    // determinism and direction are spec-verified (TextAnalysisSpec), and
    // raw_len doubles as a sanity column.
    QueryDef(
      "x_compression_ratio",
      (s, d) =>
        TextAnalysis.compressionSignals(
            Tables.documents(s, d).select(col("doc_id"), col("text")),
            "doc_id", "text")
          .orderBy("id"),
      None),

    // Per-group HLL: distinct parts per order-priority bucket — the
    // "distinct users per day" sketch shape, ≤64 register rows per group.
    // Same explicit avalanche hash; the oracle rebuilds every group's
    // registers and estimator in SQL.
    QueryDef(
      "x_hll_by_group",
      (s, d) =>
        graft.ops.Sketches.hllEstimateByGroup(
          Tables.lineitem(s, d)
            .select((col("l_orderkey") % 5).as("grp"), col("l_partkey")),
          "grp", "l_partkey", bits = 6)
          .orderBy("grp"),
      Some("""WITH r AS (SELECT CAST(l_orderkey AS BIGINT) % 5 g,
             |                  CAST(l_partkey AS BIGINT) % 2147483648 h0
             |           FROM lineitem),
             |m1 AS (SELECT g, (h0 * 2654435761) % 2147483648 AS h1 FROM r),
             |m2 AS (SELECT g, xor(h1, h1 >> 15) AS h2 FROM m1),
             |m3 AS (SELECT g, (h2 * 1103515245) % 2147483648 AS h3 FROM m2),
             |h AS (SELECT g, xor(h3, h3 >> 13) AS hv FROM m3),
             |x AS (SELECT g, hv % 64 AS bucket, hv // 64 AS w FROM h),
             |rr AS (SELECT g, bucket,
             |         MAX(CASE WHEN w = 0 THEN 26.0
             |             ELSE 25.0 - floor(log2(CAST(w AS DOUBLE))) END) M
             |       FROM x GROUP BY g, bucket),
             |agg AS (SELECT g, COUNT(*) nb,
             |               COALESCE(SUM(pow(2.0, -M)), 0.0) s2
             |        FROM rr GROUP BY g),
             |vs AS (SELECT g, (64 - nb) AS V, (64.0 - nb) + s2 AS S FROM agg),
             |e AS (SELECT g, V, 0.709 * 64 * 64 / S AS E FROM vs)
             |SELECT g AS grp, round(CASE WHEN E <= 2.5 * 64 AND V > 0
             |                  THEN 64.0 * ln(64.0 / V) ELSE E END, 6)
             |         AS hll_estimate
             |FROM e ORDER BY grp""".stripMargin)),

    // Dominant principal direction of the embedding corpus by 4 pinned
    // power iterations (w = X'(Xv), renormalize, re-snap to 10 dp each
    // round). The oracle walks the identical trajectory as an unrolled CTE
    // chain — the same cross-engine device as x_pagerank/x_kmeans_lloyd,
    // now over a dense linear-algebra recursion.
    QueryDef(
      "x_power_iteration",
      (s, d) =>
        graft.ops.Spectral.powerIteration(
            Tables.embeddings(s, d), "embedding", iters = 4)
          .orderBy("i"),
      Some(powerIterationOracle(d = 64, iters = 4))),

    // Language-ID heuristic: per-language stopword-hit ratios + argmax.
    QueryDef(
      "x_lang_id",
      (s, d) =>
        Tables.documents(s, d)
          .select(col("doc_id"), LangId.predict(col("text")).as("p"))
          .select(col("doc_id"), col("p.r_en"), col("p.r_es"), col("p.r_de"),
            col("p.r_fr"), col("p.predicted"))
          .orderBy("doc_id"),
      Some("""WITH t AS (SELECT doc_id, string_split(lower(text), ' ') w, text FROM documents),
             |r AS (SELECT doc_id,
             |  len(list_filter(w, t -> list_contains(['the','a','and','of','to','in','is','that','it','for'], t)))::DOUBLE / len(w) AS r_en,
             |  len(list_filter(w, t -> list_contains(['el','la','los','de','que','y','en','un','una','por'], t)))::DOUBLE / len(w) AS r_es,
             |  len(list_filter(w, t -> list_contains(['der','die','das','und','ist','von','den','mit','zu','ein'], t)))::DOUBLE / len(w) AS r_de,
             |  len(list_filter(w, t -> list_contains(['le','la','les','de','et','est','en','une','du','que'], t)))::DOUBLE / len(w) AS r_fr,
             |  (length(text) - length(regexp_replace(text, '[\x{4e00}-\x{9fff}]', '', 'g')))::DOUBLE / length(text) AS cjk
             |  FROM t)
             |SELECT doc_id, round(r_en,6) AS r_en, round(r_es,6) AS r_es,
             |  round(r_de,6) AS r_de, round(r_fr,6) AS r_fr,
             |  CASE WHEN cjk > 0.3 THEN 'zh'
             |       WHEN greatest(r_en,r_es,r_de,r_fr) > 0
             |            AND r_en = greatest(r_en,r_es,r_de,r_fr) THEN 'en'
             |       WHEN greatest(r_en,r_es,r_de,r_fr) > 0
             |            AND r_es = greatest(r_en,r_es,r_de,r_fr) THEN 'es'
             |       WHEN greatest(r_en,r_es,r_de,r_fr) > 0
             |            AND r_de = greatest(r_en,r_es,r_de,r_fr) THEN 'de'
             |       WHEN greatest(r_en,r_es,r_de,r_fr) > 0
             |            AND r_fr = greatest(r_en,r_es,r_de,r_fr) THEN 'fr'
             |       ELSE 'unknown' END AS predicted
             |FROM r ORDER BY doc_id""".stripMargin)),

    // Document quality scoring: stopword/word-length/alphabetic signals.
    QueryDef(
      "x_quality_score",
      (s, d) => {
        val toks = TextAnalysis.wsTokens(col("text"))
        Tables.documents(s, d)
          .select(
            col("doc_id"),
            size(toks).as("n_tokens"),
            round(TextAnalysis.meanTokenLen(toks), 6).as("mean_tok_len"),
            round(TextAnalysis.stopwordRatio(toks, LangId.en), 6).as("stop_ratio"),
            round(TextAnalysis.alphaRatio(col("text")), 6).as("alpha_ratio"),
            TextAnalysis.qualityScore(col("text")).as("quality"))
          .orderBy("doc_id")
      },
      Some("""WITH t AS (SELECT doc_id, text, string_split(lower(text), ' ') w FROM documents),
             |m AS (SELECT doc_id, text,
             |  len(w) AS n_tokens,
             |  list_sum(list_transform(w, x -> length(x)))::DOUBLE / len(w) AS mlen,
             |  len(list_filter(w, t -> list_contains(['the','a','and','of','to','in','is','that','it','for'], t)))::DOUBLE / len(w) AS stop,
             |  length(regexp_replace(lower(text), '[^a-z ]', '', 'g'))::DOUBLE / length(text) AS alpha
             |  FROM t)
             |SELECT doc_id, n_tokens, round(mlen,6) AS mean_tok_len,
             |  round(stop,6) AS stop_ratio, round(alpha,6) AS alpha_ratio,
             |  round(CAST(0.4 * least(stop * 4, 1.0) + 0.3 * least(mlen / 8.0, 1.0)
             |        + 0.3 * alpha AS DECIMAL(18,12)), 6)::DOUBLE AS quality
             |FROM m ORDER BY doc_id""".stripMargin)),

    // Document chunking: 40-token windows, 10-token overlap — one row per
    // chunk, the tokenize-and-chunk step before training/embedding.
    QueryDef(
      "x_chunking",
      (s, d) =>
        Tables.documents(s, d)
          .select(col("doc_id"),
            posexplode(TextAnalysis.chunk(col("text"), chunkTokens = 40, overlap = 10)))
          .select(col("doc_id"), col("col.chunk_idx"), col("col.chunk"),
            col("col.n_tokens"))
          .orderBy("doc_id", "chunk_idx"),
      Some("""WITH t AS (SELECT doc_id, string_split(lower(text), ' ') w FROM documents),
             |c AS (SELECT doc_id, w,
             |        unnest(generate_series(1, greatest(1, len(w) - 10), 30)) AS s
             |      FROM t)
             |SELECT doc_id, CAST((s - 1) / 30 AS INT) AS chunk_idx,
             |  array_to_string(list_slice(w, s, s + 39), ' ') AS chunk,
             |  least(40, len(w) - s + 1) AS n_tokens
             |FROM c ORDER BY doc_id, chunk_idx""".stripMargin)),

    // Token counting: whitespace, regex-word, distinct, and BPE-ish subword.
    QueryDef(
      "x_token_count",
      (s, d) => {
        val rtoks = TextAnalysis.regexTokens(col("text"))
        Tables.documents(s, d)
          .select(
            col("doc_id"),
            size(TextAnalysis.wsTokens(col("text"))).as("n_ws"),
            size(rtoks).as("n_re"),
            size(array_distinct(rtoks)).as("n_distinct"),
            TextAnalysis.bpeishTokenCount(col("text")).as("n_bpeish"),
            length(col("text")).as("n_chars"))
          .orderBy("doc_id")
      },
      Some("""WITH t AS (SELECT doc_id, text,
             |  list_filter(string_split_regex(lower(text), '[^a-z0-9'']+'), x -> len(x) > 0) rt
             |  FROM documents)
             |SELECT doc_id,
             |  len(string_split(lower(text), ' ')) AS n_ws,
             |  len(rt) AS n_re,
             |  len(list_distinct(rt)) AS n_distinct,
             |  CAST(list_sum(list_transform(rt, x -> 1 + CAST(floor(length(x) / 6.0) AS BIGINT))) AS BIGINT) AS n_bpeish,
             |  length(text) AS n_chars
             |FROM t ORDER BY doc_id""".stripMargin)),

    // Text cleaning + PII redaction over documents decorated with
    // deterministic markup/URL/email/phone spans — the preprocessing scrub.
    QueryDef(
      "x_text_clean",
      (s, d) => {
        val decorated = concat(
          lit("<p class=\"x\">"), col("text"),
          lit("</p> see https://example.com/a?b=1 or mail "),
          lit("user"), col("doc_id").cast("string"), lit("@example.org tel 0012 345 6789"))
        Tables.documents(s, d)
          .select(
            col("doc_id"),
            TextAnalysis.cleanText(decorated).as("cleaned"),
            TextAnalysis.redactPii(TextAnalysis.cleanText(decorated)).as("redacted"))
          .orderBy("doc_id")
      },
      Some("""WITH t AS (SELECT doc_id,
             |  '<p class="x">' || text || '</p> see https://example.com/a?b=1 or mail user'
             |    || CAST(doc_id AS VARCHAR) || '@example.org tel 0012 345 6789' AS raw
             |  FROM documents),
             |c AS (SELECT doc_id,
             |  trim(regexp_replace(regexp_replace(regexp_replace(raw,
             |    '<[^>]+>', ' ', 'g'), '[\x00-\x1f]', ' ', 'g'), ' +', ' ', 'g'))
             |    AS cleaned
             |  FROM t)
             |SELECT doc_id, cleaned,
             |  regexp_replace(regexp_replace(regexp_replace(cleaned,
             |    '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}', '<EMAIL>', 'g'),
             |    'https?://[^ ]+', '<URL>', 'g'),
             |    '[0-9][0-9 ()+-]{6,}[0-9]', '<NUM>', 'g') AS redacted
             |FROM c ORDER BY doc_id""".stripMargin)),

    // Unicode-canonical dedup: decomposed accents (NFD combining marks) are
    // planted onto the corpus; NFC normalization collapses them with their
    // composed forms before hashing — visually-identical text dedupes equal.
    QueryDef(
      "x_unicode_nfc_dedup",
      (s, d) => {
        val docs = Tables.documents(s, d).select("doc_id", "text")
        // composed 'é' (U+00E9) vs decomposed 'e' + combining acute (U+0301)
        val corpus = docs.select(col("doc_id"),
            concat(lit("caf\u00e9 "), col("text")).as("text"))
          .union(docs.select((col("doc_id") + 100000).as("doc_id"),
            concat(lit("cafe\u0301 "), col("text")).as("text")))
        corpus
          .groupBy(md5(TextAnalysis.nfc(col("text")).cast("binary")).as("h"))
          .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_copies"))
          .orderBy("h")
      },
      Some("""WITH corpus AS (
             |  SELECT doc_id, 'caf' || chr(233) || ' ' || text AS text FROM documents
             |  UNION ALL
             |  SELECT doc_id + 100000, 'cafe' || chr(769) || ' ' || text FROM documents)
             |SELECT md5(nfc_normalize(text)) AS h, min(doc_id) AS keep_id,
             |  COUNT(*) AS n_copies
             |FROM corpus GROUP BY 1 ORDER BY h""".stripMargin)),

    // Content fingerprinting: normalization-invariant md5 over token stream.
    QueryDef(
      "x_fingerprint",
      (s, d) =>
        Tables.documents(s, d)
          .select(
            col("doc_id"),
            TextAnalysis.fingerprint(col("text")).as("fp"),
            substring(TextAnalysis.fingerprint(col("text")), 1, 2).as("bucket"))
          .orderBy("doc_id"),
      Some("""SELECT doc_id,
             |  md5(array_to_string(list_filter(
             |    string_split_regex(lower(text), '[^a-z0-9'']+'), x -> len(x) > 0), ' ')) AS fp,
             |  substr(md5(array_to_string(list_filter(
             |    string_split_regex(lower(text), '[^a-z0-9'']+'), x -> len(x) > 0), ' ')), 1, 2) AS bucket
             |FROM documents ORDER BY doc_id""".stripMargin))
  )
}
