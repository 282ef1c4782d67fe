package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** BM25 ranked retrieval over a document corpus — the retrieval tier of a
  * training-data pipeline (e.g. sourcing in-domain documents for a target
  * task, or retrieval-augmented eval-set construction).
  *
  * Scoring is Robertson/Sparck-Jones BM25 with the standard "+1" idf floor
  * (Lucene's variant — strictly positive for any df):
  *
  *   idf(t)     = ln(1 + (N - df + 0.5) / (df + 0.5))
  *   score(d,q) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 - b + b·dl/avgdl))
  *
  * Scale design: the query-term IN-filter is applied to the token stream
  * BEFORE any aggregation, so the tf/df aggregates only ever see the
  * candidate postings (predicate pushdown straight into the exploded scan —
  * at 100 TB the tf table is |q| terms × matching docs, not the corpus
  * vocabulary). Document lengths and the corpus-wide (N, avgdl) scalars are
  * one hash aggregate + a 1-row broadcast cross join; dl sums are integers,
  * so avgdl is order-insensitive and exact across engines. The df table is
  * at most |q| rows — broadcast. The only per-corpus shuffle is the dl
  * aggregate and its join back to candidates (AQE-broadcast once candidates
  * are filtered). Final top-k is a TakeOrderedAndProject, never a global
  * sort.
  */
object Retrieval {

  private def r6(c: Column) = round(c.cast("decimal(18,12)"), 6).cast("double")

  /** Top-k documents for a bag-of-words query under BM25.
    *
    * Output: (doc, score, rank) — score rounded to 6 dp through
    * DECIMAL(18,12) before ranking so ordering is stable cross-engine;
    * ties break on doc id.
    */
  def bm25TopK(
      docs: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    val toks = docs.select(col(idCol).as("doc"),
      explode(TextAnalysis.regexTokens(col(textCol))).as("term"))

    // per-document length + corpus scalars (N docs with >=1 token, mean dl)
    val dl = toks.groupBy("doc").agg(count(lit(1)).as("dl"))
    val stats = dl.agg(count(lit(1)).as("n"), avg(col("dl")).as("avgdl"))

    // candidate postings only: filter BEFORE tf/df aggregation
    val tf = toks.filter(col("term").isin(queryTerms: _*))
      .groupBy("doc", "term").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))

    val scored = tf
      .join(broadcast(df), Seq("term"))
      .join(dl, Seq("doc"))
      .crossJoin(broadcast(stats))
      .withColumn("__idf",
        log(lit(1.0) + (col("n") - col("df") + 0.5) / (col("df") + 0.5)))
      .withColumn("__w",
        col("__idf") * (col("tf") * (k1 + 1.0)) /
          (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))))
      .groupBy("doc").agg(r6(sum(col("__w"))).as("score"))

    val w = Window.orderBy(col("score").desc, col("doc"))
    // single-partition window is fine: input is already the aggregated
    // per-candidate-doc score table; at scale swap for orderBy().limit(k)
    // (TakeOrderedAndProject) when rank output is not required.
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Exact phrase search over a positional index built on the fly:
    * documents containing `phrase` as consecutive tokens, with the number
    * of occurrences.
    *
    * Each phrase term's postings are filtered out of the token stream
    * BEFORE any join (per-term postings only — the IN-filter reaches the
    * exploded scan), then normalized to the phrase-start position
    * (pos − term offset) and intersected with an equi-join on
    * (doc, start). Every phrase occurrence survives the n−1 joins exactly
    * once; a final hash aggregate counts per document. At scale this is
    * the standard positional-postings merge: shuffle volume is the
    * postings of the query's terms, never the corpus.
    */
  def phraseSearch(
      docs: DataFrame, idCol: String, textCol: String,
      phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "phrase must be non-empty")
    val toks = docs.select(col(idCol).as("doc"),
      posexplode(TextAnalysis.regexTokens(col(textCol))).as(Seq("pos", "term")))
    val parts = phrase.zipWithIndex.map { case (t, i) =>
      toks.filter(col("term") === t).select(col("doc"), (col("pos") - i).as("p0"))
    }
    parts.reduce(_.join(_, Seq("doc", "p0")))
      .groupBy("doc").agg(count(lit(1)).as("n_matches"))
  }

  /** FastText-style hashed linear classifier: each token maps to a
    * 16-bit md5 bucket whose pseudo-weight is uniform in [−0.5, 0.5);
    * the document score is the logistic of the mean token weight. The
    * weights here are hash-derived (a stand-in for trained ones — the
    * md5 bucketing IS the production feature-hashing trick); the shape
    * is the CCNet/fastText quality-filter inference path: row-local,
    * shuffle-free, embarrassingly parallel over the scan.
    *
    * Output: sigmoid(slope · mean_w) rounded to 6 dp; `keep` is
    * score >= 0.5 (equivalently mean_w >= 0 — a rounding-stable frontier).
    */
  def hashedLinearScore(text: Column, slope: Double = 4.0): Column = {
    val toks = TextAnalysis.regexTokens(text)
    val wsum = aggregate(toks, lit(0.0), (acc, t) =>
      acc + (conv(substring(md5(t.cast("binary")), 1, 4), 16, 10)
        .cast("double") / 65536.0 - 0.5))
    val meanW = wsum / size(toks)
    round((lit(1.0) / (lit(1.0) + exp(lit(-slope) * meanW)))
      .cast("decimal(18,12)"), 6).cast("double")
  }

  /** Reciprocal-rank fusion (Cormack/Clarke/Buettcher 2009) of N ranked
    * retrieval lists — the standard way to combine lexical (BM25) and
    * vector (ANN cosine) retrieval into one hybrid ranking without score
    * calibration: each list contributes 1/(c + rank) for the documents
    * it ranked, fused score = the sum, and c = 60 (the paper's constant)
    * damps the head so no single list dominates.
    *
    * Inputs are (doc, rank) frames — any ranker's top-k output. Lists
    * join full-outer on doc (a doc missing from a list contributes 0),
    * contributions chain in list order (each is 1/(c+rank), an exact
    * IEEE division both engines reproduce bit-identically), and the
    * fused score rounds through DECIMAL(18,12) to 6 dp before ranking so
    * the cross-engine ordering is stable; ties break on doc id.
    *
    * Scale shape: the inputs are already top-k lists (driver-small by
    * construction — k rows per ranker, not the corpus), so the fusion
    * join and the final single-partition rank window cost nothing; the
    * heavy lifting happened inside each ranker, which is where the
    * 100 TB design lives ([[bm25TopK]]'s candidate-postings pushdown,
    * [[graft.ops.VectorLake]]'s manifest-pruned probes). */
  /** Maximal-marginal-relevance re-ranking (Carbonell/Goldstein 1998):
    * greedily pick `k` results balancing relevance against redundancy —
    * each pick maximizes `λ·rel(d) − (1−λ)·max_{s∈S} sim(d, s)` over
    * the not-yet-selected candidates, so near-duplicate hits stop
    * crowding out diverse ones. The standard diversity pass RAG stacks
    * run over their retriever's top-N.
    *
    * Input: a CANDIDATE list `(doc, rel, vec)` — some retriever's
    * top-N (N ~ tens), with 6-dp relevance scores and the embedding
    * used for redundancy. The greedy loop is inherently sequential and
    * N-sized, so it runs on the driver over the collected candidates
    * (the distributed work — scoring the corpus down to N — happened in
    * the retriever; this is the same driver-sized tail as
    * [[graft.ops.VectorLake]]'s centroid routing). Pairwise cosines
    * accumulate in candidate order (matching DuckDB's
    * `list_dot_product` fold) and every score rounds to 6 dp through
    * the plain-double BigDecimal path before comparison; ties break on
    * doc id — the selection is bit-reproducible cross-engine.
    *
    * Output: `(doc, mmr, rank)` for the `k` selected, in pick order. */
  def mmrRerank(candidates: DataFrame, k: Int,
      lambda: Double = 0.7): DataFrame = {
    val spark = candidates.sparkSession
    import spark.implicits._
    val cand: Array[(Long, Double, Array[Float])] = candidates
      .select(col("doc").cast("long"), col("rel").cast("double"),
        col("vec"))
      .as[(Long, Double, Array[Float])].collect().sortBy(_._1)
    def r6d(x: Double): Double =
      new java.math.BigDecimal(java.lang.Double.toString(x))
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
        i += 1
      }
      if (na == 0.0 || nb == 0.0) 0.0
      else r6d(dot / (math.sqrt(na) * math.sqrt(nb)))
    }
    val n = cand.length
    val sim = Array.tabulate(n, n)((i, j) =>
      if (i == j) 1.0 else cos(cand(i)._3, cand(j)._3))
    val selected = scala.collection.mutable.ArrayBuffer.empty[(Long, Double)]
    val picked = Array.fill(n)(false)
    while (selected.length < math.min(k, n)) {
      var bestIdx = -1
      var bestScore = Double.NegativeInfinity
      var i = 0
      while (i < n) {
        if (!picked(i)) {
          val redundancy =
            if (selected.isEmpty) 0.0
            else cand.indices.filter(picked).map(sim(i)(_)).max
          val score = r6d(lambda * cand(i)._2 - (1.0 - lambda) * redundancy)
          // strict > with ascending doc order = smallest doc id wins ties
          if (score > bestScore) { bestScore = score; bestIdx = i }
        }
        i += 1
      }
      picked(bestIdx) = true
      selected += ((cand(bestIdx)._1, bestScore))
    }
    selected.zipWithIndex
      .map { case ((doc, s), r) => (doc, s, r + 1) }.toSeq
      .toDF("doc", "mmr", "rank")
  }

  def rrfFuse(lists: Seq[DataFrame], k: Int, c: Int = 60): DataFrame = {
    require(lists.nonEmpty, "rrfFuse needs at least one ranked list")
    val contribs = lists.zipWithIndex.map { case (df, i) =>
      df.select(col("doc"), (lit(1.0) / (lit(c.toDouble) + col("rank")))
        .as(s"__rrf$i"))
    }
    val joined = contribs.reduce((a, b) => a.join(b, Seq("doc"), "full_outer"))
    val total = contribs.indices
      .map(i => coalesce(col(s"__rrf$i"), lit(0.0)))
      .reduce(_ + _)
    val w = Window.orderBy(col("rrf").desc, col("doc"))
    joined.select(col("doc"), r6(total).as("rrf"))
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }
}
