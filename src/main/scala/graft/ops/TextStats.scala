package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-level text statistics: TF-IDF term ranking and corpus n-gram
  * counts — the profiling/feature tier of a text pipeline.
  *
  * Scale design: everything is explode → hash aggregate → (optionally) a
  * per-document window for top-k. The document-frequency table is aggregated
  * once (hash agg, partial+final) and joined back by term — at corpus scale
  * the df table is vocabulary-sized (≪ corpus), and AQE broadcasts it when
  * it fits. No sort of the exploded token table; the only sort is the
  * per-document top-k window, partitioned by doc (bounded partitions).
  */
object TextStats {

  /** (doc, term, tf, df, tfidf) for every distinct term of every document,
    * with tf = in-doc count, idf = ln((N+1)/(df+1)) + 1 (smooth variant —
    * positive for all df, no division by zero).
    */
  def tfIdf(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = docs.select(col(idCol).as("doc"),
        explode(TextAnalysis.regexTokens(col(textCol))).as("term"))
    val tf = toks.groupBy("doc", "term").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = docs.select(col(idCol)).distinct().count()
    tf.join(df, Seq("term"))
      .withColumn("tfidf",
        col("tf") * (log((lit(n) + 1.0) / (col("df") + 1.0)) + 1.0))
      .select("doc", "term", "tf", "df", "tfidf")
  }

  /** Corpus-trained unigram-LM quality signal: per-document cross-entropy
    * (mean -ln p(term)) and perplexity under the corpus's own unigram
    * distribution — the degenerate (order-free) form of the CCNet/KenLM
    * LM-based quality filter, with the exact same dataflow: train token
    * statistics over the corpus, ship them back to every document, score.
    * Low perplexity = stereotypical text; high = rare-token soup — both
    * tails are the usual filter targets.
    *
    * Scale: the trained "model" is the vocabulary-sized count table (≪
    * corpus; AQE broadcasts the join back), the total-count scalar rides a
    * broadcast cross join of a 1-row aggregate, and scoring is one hash
    * aggregate over the exploded tokens — 2 shuffles, nothing global.
    */
  def unigramCrossEntropy(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = docs.select(col(idCol).as("doc"),
      explode(TextAnalysis.regexTokens(col(textCol))).as("term"))
    val counts = toks.groupBy("term").agg(count(lit(1)).as("c"))
    val total = counts.agg(sum("c").as("t"))
    toks.join(counts, Seq("term"))
      .crossJoin(broadcast(total))
      .groupBy("doc")
      .agg(
        count(lit(1)).as("n_tokens"),
        avg(-log(col("c").cast("double") / col("t"))).as("__ce"))
      .select(col("doc"), col("n_tokens"),
        round(col("__ce"), 6).as("cross_entropy"),
        round(exp(col("__ce")), 6).as("ppl"))
  }

  /** Corpus-trained bigram-LM quality signal (order-2 upgrade of
    * [[unigramCrossEntropy]] — the actual KenLM/CCNet filter shape):
    * per-document mean −ln P(wᵢ | wᵢ₋₁) under add-k-smoothed corpus bigram
    * statistics, P = (c₂(prev,w) + k) / (c₁(prev) + k·V).
    *
    * Scale: the trained model is two count tables (bigram- and
    * unigram-keyed hash aggs, vocabulary-sized ≪ corpus; AQE broadcasts
    * the joins back when they fit), the vocabulary-size scalar rides a
    * 1-row broadcast cross join, and scoring is one hash aggregate over
    * the exploded bigrams. Bigram construction is row-local over the
    * bound token-array attribute (never an expression tree in the
    * lambda — the NOTES HOF lesson).
    */
  def bigramCrossEntropy(docs: DataFrame, idCol: String, textCol: String,
      k: Double = 0.5): DataFrame = {
    // tokenization feeds two arms (bigram + unigram explode) and the
    // bigram frame three (count table, scoring join) — pin both so the
    // regex pass and the bigram construction run once, not per consumer
    val base = docs.select(col(idCol).as("doc"),
      TextAnalysis.regexTokens(col(textCol)).as("tl"))
      .localCheckpoint(false)
    val bi = base.filter(size(col("tl")) >= 2)
      .select(col("doc"), explode(transform(
        sequence(lit(1), size(col("tl")) - 1),
        i => struct(
          element_at(col("tl"), i).as("prev"),
          concat_ws(" ", slice(col("tl"), i, lit(2))).as("bg")))).as("b"))
      .select(col("doc"), col("b.prev"), col("b.bg"))
      .localCheckpoint(false)
    val uni = base.select(col("doc"), explode(col("tl")).as("term"))
    val c2 = bi.groupBy("bg").agg(count(lit(1)).as("c2"))
    val c1 = uni.groupBy(col("term").as("prev")).agg(count(lit(1)).as("c1"))
    val v = uni.agg(countDistinct(col("term")).as("v"))
    bi.join(c2, Seq("bg")).join(c1, Seq("prev"))
      .crossJoin(broadcast(v))
      .withColumn("__nll",
        -log((col("c2") + k) / (col("c1") + lit(k) * col("v"))))
      .groupBy("doc")
      .agg(
        count(lit(1)).as("n_bigrams"),
        avg(col("__nll")).as("__ce"))
      .select(col("doc"), col("n_bigrams"),
        round(col("__ce"), 6).as("cross_entropy"),
        round(exp(col("__ce")), 6).as("ppl"))
  }

  /** Top-k terms per document by (tfidf desc, term) — deterministic. */
  def topTerms(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val w = Window.partitionBy(col("doc"))
      .orderBy(col("tfidf").desc, col("term"))
    tfIdf(docs, idCol, textCol)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Corpus-wide n-gram frequencies, top `k` by (count desc, ngram) —
    * distinct-per-doc counting (document frequency of the shingle), the
    * boilerplate-detection signal of the dedup pipeline.
    */
  def topNgrams(docs: DataFrame, textCol: String, n: Int, k: Int): DataFrame =
    docs.select(explode(Dedup.shingles(col(textCol), n)).as("ngram"))
      .groupBy("ngram").agg(count(lit(1)).as("n_docs"))
      .orderBy(col("n_docs").desc, col("ngram"))
      .limit(k)

  /** Per-document repetition signals (Gopher-style corpus filtering): word
    * count, duplicate word/bigram/trigram ratios, and the fraction of
    * bigram slots taken by the single most frequent bigram. Docs that loop
    * or template score high on all of them; natural prose scores low.
    *
    * Scale design: EVERY signal here is per-row state — including the
    * top-bigram fraction (max in-doc count needs no cross-row context) —
    * so the whole operator is one codegen'd projection over the scan:
    * no shuffle, no join, embarrassingly parallel at 100 TB. Distinct and
    * top counts come from the native one-pass kernels
    * ([[graft.expressions.WordNGrams]], [[graft.expressions.TopNGramFrac]]);
    * the first cut paired HOF gram construction with an explode → two hash
    * aggregates → join-back for the top bigram, and benched ~40 s at sf0.1
    * against <1 s for this plan. All ratios round through DECIMAL(18,12)
    * (oracle half-boundary invariant, see NOTES.md).
    */
  def repetitionSignals(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    def r6(c: Column) = round(c.cast("decimal(18,12)"), 6).cast("double")
    val w = TextAnalysis.wsTokens(col(textCol))
    docs.select(
      col(idCol).as("doc"),
      size(w).cast("long").as("n_words"),
      r6(TextAnalysis.dupNgramRatioTokens(w, 1)).as("dup_word_ratio"),
      r6(TextAnalysis.dupNgramRatioTokens(w, 2)).as("dup_bigram_ratio"),
      r6(TextAnalysis.dupNgramRatioTokens(w, 3)).as("dup_trigram_ratio"),
      r6(graft.expressions.GraftFunctions.graftTopNGramFrac(w, 2))
        .as("top_bigram_frac"))
  }
}

/** Deterministic, oracle-reproducible sampling: the sampling decision is a
  * pure function of the row's key (md5 prefix), so any engine draws the
  * SAME sample — reproducible experiment splits, no RNG state, no seed
  * plumbing, stable under retries/recomputation (a `rand()` sample is not:
  * task retries resample).
  *
  * Scale: a narrow filter over the scan — no shuffle, pushdown-friendly,
  * embarrassingly parallel.
  */
object Sampling {

  /** Uniform 16-bit sample key: 4 lowercase-hex md5 prefix chars. Fixed
    * width + lowercase hex means LEXICOGRAPHIC order equals numeric order,
    * so thresholds compare as plain strings — portable to any engine with
    * md5, no base-conversion function needed. */
  def sampleKey(key: Column): Column =
    substring(md5(key.cast("string").cast("binary")), 1, 4)

  /** The hex threshold under which ~`rate` of uniform 16-bit keys fall. */
  def hexThreshold(rate: Double): String =
    f"${math.round(rate * 65536).toInt}%04x"

  /** Keep ~`rate` of rows, decided by the key hash (deterministic: any
    * engine — and any retry — draws the same sample; `rand()` does not). */
  def deterministicSample(df: DataFrame, keyCol: String, rate: Double): DataFrame =
    df.filter(sampleKey(col(keyCol)) < hexThreshold(rate))

  /** Per-stratum rates: `rates(stratum) -> rate`, strata absent from the map
    * are dropped — the class-rebalancing sampler of a training pipeline. */
  def stratifiedSample(df: DataFrame, keyCol: String, stratumCol: String,
      rates: Map[String, Double]): DataFrame = {
    val key = sampleKey(col(keyCol))
    val keep = rates.foldLeft(lit(false)) { case (acc, (stratum, rate)) =>
      when(col(stratumCol) === stratum, key < hexThreshold(rate))
        .otherwise(acc)
    }
    df.filter(keep)
  }

  /** Deterministic corpus mixing (domain weighting): each row is repeated
    * according to its stratum's weight — floor(w) guaranteed copies plus one
    * extra copy for the hash-chosen frac(w) of rows — so the realized mix
    * converges to the target weights while staying a pure function of each
    * row's key (engine-portable, retry-stable, and growth-stable: adding
    * rows never changes existing rows' copy counts). Weights < 1 downsample
    * (w = 0.4 keeps ~40%), weights > 1 upsample (w = 2.5 emits 2–3 copies);
    * strata absent from the map keep weight 1. Emits a 0-based `epoch`
    * column per copy so downstream shuffles spread repeats.
    *
    * Scale: a row-local filter + bounded explode over the scan — no
    * shuffle; this is how a 100 TB pre-training mix (upweight curated
    * domains, downweight crawl) is materialized without moving data twice.
    */
  def weightedMix(df: DataFrame, keyCol: String, stratumCol: String,
      weights: Map[String, Double]): DataFrame = {
    require(weights.values.forall(w => w >= 0 && w < 100), "weights in [0,100)")
    val key = Sampling.sampleKey(col(keyCol))
    val extra = weights.foldLeft(lit(0)) { case (acc, (stratum, w)) =>
      val frac = w - math.floor(w)
      when(col(stratumCol) === stratum,
        when(key < Sampling.hexThreshold(frac), 1).otherwise(0))
        .otherwise(acc)
    }
    val base = weights.foldLeft(lit(1)) { case (acc, (stratum, w)) =>
      when(col(stratumCol) === stratum, lit(math.floor(w).toInt)).otherwise(acc)
    }
    df.withColumn("__copies", base + extra)
      .filter(col("__copies") > 0)
      .withColumn("__epoch", explode(sequence(lit(0), col("__copies") - 1)))
      .withColumn("epoch", col("__epoch").cast("long"))
      .drop("__copies", "__epoch")
  }

  /** Deterministic size-balanced shard packing for corpus export: rows are
    * packed into shards of ~`targetPerShard` total `weightCol` (bytes,
    * tokens, …) in `idCol` order — shard = floor(exclusive-prefix-sum /
    * target), so a row starting before a shard boundary belongs to that
    * shard and shard sizes overshoot by at most one row. The assignment is
    * a pure function of the data (engine-portable, retry-stable).
    *
    * Scale: the global prefix sum does NOT use a single-partition window —
    * range-partition by id, per-partition totals to the driver (one tiny
    * row per partition), broadcast offsets back, within-partition running
    * sum. Same two-pass shape as CatalogOps.assignIdsDistributed, and the
    * same layout-pinning rule: the partition-stamped frame is checkpointed
    * once so both passes see identical partitioning.
    */
  def packShards(df: DataFrame, idCol: String, weightCol: String,
      targetPerShard: Long): DataFrame = {
    require(targetPerShard > 0, "targetPerShard must be positive")
    val withPart = df.repartitionByRange(col(idCol))
      .withColumn("__pid", org.apache.spark.sql.functions.spark_partition_id())
      .localCheckpoint(false)
    val partSums = withPart.groupBy("__pid")
      .agg(sum(col(weightCol).cast("long")).as("s"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val offsets = partSums.scanLeft(0L)(_ + _._2).zip(partSums.map(_._1))
      .map { case (off, pid) => pid -> off }.toMap
    val offCol = offsets.foldLeft(lit(0L)) { case (acc, (pid, off)) =>
      when(col("__pid") === pid, lit(off)).otherwise(acc)
    }
    val wp = Window.partitionBy(col("__pid")).orderBy(col(idCol))
    withPart
      .withColumn("__cum", offCol + sum(col(weightCol).cast("long")).over(wp))
      .withColumn("shard",
        floor((col("__cum") - col(weightCol).cast("long")) /
          lit(targetPerShard.toDouble)).cast("long"))
      .drop("__pid", "__cum")
  }

  /** GPT-style sequence packing: documents concatenate in `idCol` order
    * into one global token stream, which cuts into fixed context windows
    * of `ctxLen` tokens; the output maps every document to every window
    * it covers — one row per (doc, window) span with `doc_offset`
    * (where in the doc the span starts), `win_offset` (where in the
    * window it lands), and `span_len`. Windows are completely full by
    * construction (a doc straddling a boundary contributes spans to both
    * sides), which is exactly the training-loader contract: window w =
    * the spans with `window = w`, ordered by `win_offset`. A zero-length
    * doc contributes nothing. Deterministic — a pure function of
    * (id order, lengths) — so any engine and any retry cuts identical
    * windows.
    *
    * Scale: the global exclusive prefix sum uses the [[packShards]]
    * two-pass shape (range partition, per-partition totals to the
    * driver, broadcast offsets, within-partition running sum — never a
    * single-partition window); the window fan-out is a row-local
    * bounded explode (a doc spans ⌈len/ctx⌉+1 windows at most). */
  def packSequences(df: DataFrame, idCol: String, tokenLenCol: String,
      ctxLen: Long): DataFrame = {
    require(ctxLen > 0, "ctxLen must be positive")
    val withPart = df.repartitionByRange(col(idCol))
      .withColumn("__pid", org.apache.spark.sql.functions.spark_partition_id())
      .localCheckpoint(false)
    val partSums = withPart.groupBy("__pid")
      .agg(sum(col(tokenLenCol).cast("long")).as("s"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val offsets = partSums.scanLeft(0L)(_ + _._2).zip(partSums.map(_._1))
      .map { case (off, pid) => pid -> off }.toMap
    val offCol = offsets.foldLeft(lit(0L)) { case (acc, (pid, off)) =>
      when(col("__pid") === pid, lit(off)).otherwise(acc)
    }
    // ROWS frame, explicitly: the default RANGE frame is identical only
    // while idCol is unique; a duplicate id would silently sum peers.
    val wp = Window.partitionBy(col("__pid")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val len = col(tokenLenCol).cast("long")
    withPart
      .withColumn("__start",
        offCol + sum(len).over(wp) - len) // exclusive prefix sum
      .filter(len > 0)
      .withColumn("window",
        explode(sequence(floor(col("__start") / ctxLen),
          floor((col("__start") + len - lit(1)) / ctxLen))))
      .withColumn("__wlo", greatest(col("__start"), col("window") * ctxLen))
      .withColumn("__whi",
        least(col("__start") + len, (col("window") + 1) * ctxLen))
      .select(col(idCol), col("window").cast("long").as("window"),
        (col("__wlo") - col("__start")).cast("long").as("doc_offset"),
        (col("__wlo") - col("window") * ctxLen).cast("long").as("win_offset"),
        (col("__whi") - col("__wlo")).cast("long").as("span_len"))
  }

  /** Disjoint, exhaustive, deterministic dataset split (train/val/test…):
    * every row gets exactly one label, decided by which cumulative-weight
    * hash band its key falls in. Reproducible on any engine and any retry;
    * growing the table never moves an existing row between splits (each
    * row's band depends only on its own key). Weights must sum to ≤ 1;
    * any remainder falls into the LAST split (so 0.8/0.1/0.1 is exact). */
  def assignSplit(df: DataFrame, keyCol: String,
      splits: Seq[(String, Double)]): DataFrame = {
    require(splits.nonEmpty && splits.map(_._2).sum <= 1.0 + 1e-9,
      "split weights must sum to <= 1")
    val key = sampleKey(col(keyCol))
    val bounds = splits.map(_._2).scanLeft(0.0)(_ + _).tail
    val labeled = splits.map(_._1).zip(bounds).dropRight(1)
      .foldRight(lit(splits.last._1)) { case ((name, upper), els) =>
        when(key < hexThreshold(upper), lit(name)).otherwise(els)
      }
    df.withColumn("split", labeled)
  }

  /** Deterministic weighted sampling WITHOUT replacement (Efraimidis &
    * Spirakis A-ES, exponential-race form): each row draws a uniform
    * u ∈ (0,1) from its key's md5 prefix and races with arrival time
    * −ln(u)/w — the k smallest arrivals are the sample, which is exactly
    * weighted sampling without replacement (a row with twice the weight is
    * twice as likely at every draw). Pure function of (key, weight): any
    * engine — and any retry — draws the SAME sample; the md5-derived u is
    * the same device as [[sampleKey]], widened to 32 bits so ties are
    * negligible (and broken on `idCol` regardless).
    *
    * Scale: score is row-local; the top-k is `orderBy(...).limit(k)` —
    * Spark executes TakeOrderedAndProject (per-partition heaps + driver
    * merge of k·partitions rows), never a global sort. */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
      k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val u = (conv(substring(md5(col(idCol).cast("string").cast("binary")), 1, 8),
      16, 10).cast("long") + 0.5) / 4294967296.0
    val score = -log(u) / col(weightCol).cast("double")
    df.withColumn("__score", score)
      .orderBy(col("__score"), col(idCol))
      .limit(k)
      .drop("__score")
  }

  /** Deterministic negative sampling for contrastive training: each row
    * draws `k` pseudo-random partners by walking a hash-ordered RING —
    * rows sort by md5 within 16 hash buckets, and row r's j-th negative is
    * the row (r+j) mod bucket-size positions ahead. Hash order makes the
    * pairing effectively random w.r.t. any content signal, yet it is a
    * pure function of the id set (engine-portable, retry-stable — `rand()`
    * sampling is neither).
    *
    * Scale: NO global ordering — the window partitions by hash bucket, and
    * the wrap-around is an equi-join on (bucket, position), not a lead()
    * chain. One shuffle for the window, one modular self-join. Output
    * (id, j 1..k, neg_id), neg_id ≠ id whenever the bucket has > 1 row. */
  def ringNegatives(df: DataFrame, idCol: String, k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val base = df.select(col(idCol).as("__id"))
      .withColumn("__h", md5(col("__id").cast("string").cast("binary")))
      .withColumn("__bucket", substring(col("__h"), 1, 1))
    val w = Window.partitionBy(col("__bucket")).orderBy(col("__h"), col("__id"))
    val pos = base
      .withColumn("__rn", row_number().over(w))
      .withColumn("__cnt", count(lit(1)).over(Window.partitionBy(col("__bucket"))))
    val exploded = pos.select(col("__id"), col("__bucket"), col("__rn"), col("__cnt"),
        explode(sequence(lit(1), lit(k))).as("j"))
      .withColumn("__target", ((col("__rn") - 1 + col("j")) % col("__cnt")) + 1)
    exploded.join(
        pos.select(col("__bucket"), col("__rn").as("__target"),
          col("__id").as("neg_id")),
        Seq("__bucket", "__target"))
      .filter(col("neg_id") =!= col("__id"))
      .select(col("__id").as(idCol), col("j"), col("neg_id"))
  }

  /** DSIR-style importance weights for data selection (Xie et al. 2023,
    * "Data Selection for Language Models via Importance Resampling"),
    * re-expressed over the corpus-LM machinery: each raw document gets
    * the log importance weight
    *
    *   log w(x) = Σ_{tokens} [ log p_target(w) − log p_raw(w) ]
    *
    * under add-α smoothed unigram models of the TARGET corpus (the
    * domain you want more of) and the RAW corpus, both smoothed over
    * the UNION vocabulary so raw-only tokens get finite negative
    * evidence instead of −∞. Selection is then just a ranking:
    * `orderBy(log_weight desc)` and take n — the paper's Gumbel-top-k
    * resampling made deterministic for reproducible pipelines (add
    * seeded Gumbel noise to `log_weight` for the sampled variant).
    *
    * Scale: both "models" are vocabulary-sized count tables (≪ corpus;
    * AQE broadcasts the joins back), the three scalars (totals, |V|)
    * ride a 1-row broadcast cross join, and scoring is one hash
    * aggregate over the exploded raw tokens — the same 2-shuffle
    * dataflow as [[TextStats.unigramCrossEntropy]], run once for any target.
    * Output: (doc, n_tokens, log_weight round-6), one row per raw doc
    * with at least one token. */
  def dsirWeights(raw: DataFrame, target: DataFrame, idCol: String,
      textCol: String, alpha: Double = 0.5): DataFrame = {
    val rawToks = raw.select(col(idCol).as("doc"),
      explode(TextAnalysis.regexTokens(col(textCol))).as("term"))
    val tgtToks = target.select(
      explode(TextAnalysis.regexTokens(col(textCol))).as("term"))
    val cr = rawToks.groupBy("term").agg(count(lit(1)).as("cr"))
    val ct = tgtToks.groupBy("term").agg(count(lit(1)).as("ct"))
    // union vocabulary + the three model scalars in ONE small frame
    val vocab = cr.select("term").union(ct.select("term")).distinct()
    val scalars = vocab.agg(count(lit(1)).as("v"))
      .crossJoin(cr.agg(sum("cr").as("tr")))
      .crossJoin(ct.agg(coalesce(sum("ct"), lit(0L)).as("tt")))
    rawToks
      .join(cr, Seq("term")) // every raw token is in the raw counts
      .join(ct, Seq("term"), "left")
      .crossJoin(broadcast(scalars))
      .withColumn("__lw",
        log((coalesce(col("ct"), lit(0L)) + alpha) /
          (col("tt") + lit(alpha) * col("v"))) -
        log((col("cr") + alpha) / (col("tr") + lit(alpha) * col("v"))))
      .groupBy("doc")
      .agg(count(lit(1)).as("n_tokens"),
        round(sum(col("__lw")), 6).as("log_weight"))
  }

  /** DSIR's actual resampling step, made deterministic: Gumbel-top-k
    * over [[dsirWeights]] — key = log_weight + Gumbel(0,1) noise, the
    * classic trick that makes top-k by perturbed weight EQUAL sampling
    * without replacement ∝ softmax(weights). The noise is a pure
    * function of (seed, doc): a 16-bit md5-prefix uniform mapped to
    * (0, 1) (the +0.5/65536 midpoint keeps both logs finite), so any
    * engine — and any retry — draws the SAME sample; no RNG state.
    * Top-n is `orderBy.limit` (TakeOrderedAndProject — per-partition
    * top-n, k-row driver merge, never a global sort). */
  def dsirResample(raw: DataFrame, target: DataFrame, idCol: String,
      textCol: String, n: Int, seed: String = "dsir",
      alpha: Double = 0.5): DataFrame = {
    require(n > 0, "n must be positive")
    val hex = substring(
      md5(concat(lit(seed), col("doc").cast("string")).cast("binary")),
      1, 4)
    val u = (conv(hex, 16, 10).cast("double") + 0.5) / 65536.0
    val keyed = dsirWeights(raw, target, idCol, textCol, alpha)
      .withColumn("gumbel_key",
        round(col("log_weight") - log(-log(u)), 6))
      .orderBy(col("gumbel_key").desc, col("doc"))
      .limit(n)
    keyed.withColumn("rank", row_number().over(
      Window.orderBy(col("gumbel_key").desc, col("doc"))))
  }
}
