package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: tokenization, token
  * counting, quality scoring, n-gram language ID, and document
  * fingerprinting. All row-local column expressions (codegen'd, shuffle-free
  * — the embarrassingly parallel tier of a 100 TB pipeline).
  */
object TextAnalysis {

  /** Non-empty lowercase alphanumeric tokens (regex word split). */
  def regexTokens(text: Column): Column =
    filter(split(lower(text), "[^a-z0-9']+"), t => length(t) > lit(0))

  /** Plain whitespace tokens (literal single-space split). */
  def wsTokens(text: Column): Column = split(lower(text), " ")

  def tokenCount(text: Column): Column = size(regexTokens(text))

  /** BPE-ish subword count proxy: word-boundary pieces plus an extra piece
    * per 6 chars of long words (regex heuristic, no vocab needed). */
  def bpeishTokenCount(text: Column): Column = {
    val toks = regexTokens(text)
    aggregate(toks, lit(0L),
      (acc, t) => acc + lit(1L) + floor(length(t) / lit(6.0)).cast("long"))
  }

  /** Fraction of tokens found in `stops`. Exact rational double (hit count /
    * token count — the one-pass native kernel computes the identical
    * division, so results are bit-equal to the HOF formulation it
    * replaced). */
  def stopwordRatio(toks: Column, stops: Seq[String]): Column =
    graft.expressions.GraftFunctions.graftStopRatios(toks, Seq(stops)).getItem(0)

  /** Mean token length (chars per token). */
  def meanTokenLen(toks: Column): Column =
    when(size(toks) > 0,
      aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") / size(toks))
      .otherwise(lit(0.0))

  /** Fraction of characters that are lowercase letters or spaces. */
  def alphaRatio(text: Column): Column =
    when(length(text) > 0,
      length(regexp_replace(lower(text), "[^a-z ]", "")).cast("double") / length(text))
      .otherwise(lit(0.0))

  /** Composite document-quality score in [0,1]: stopword presence (natural
    * language signal), mean word length near prose norms, alphabetic purity.
    * The exact weights are engine policy, not learned. */
  def qualityScore(text: Column): Column = {
    val toks = wsTokens(text)
    val stop = stopwordRatio(toks, LangId.en)
    val mlen = meanTokenLen(toks)
    val lenScore = least(mlen / lit(8.0), lit(1.0))
    // round via DECIMAL(18,12), not the raw double: the weighted sum can
    // land EXACTLY on a 1e-6 half-boundary (e.g. 0.5153125), where Spark's
    // shortest-decimal HALF_UP and DuckDB's std::round(x*1e6) disagree by
    // one ulp of the binary double. Both engines agree on the decimal path
    // (caught by sf0.1 cross-validation: 2/5000 docs).
    round((lit(0.4) * least(stop * 4, lit(1.0)) + lit(0.3) * lenScore
      + lit(0.3) * alphaRatio(text)).cast("decimal(18,12)"), 6).cast("double")
  }

  /** Stable content fingerprint: md5 over the normalized token stream —
    * invariant to case, punctuation and whitespace runs. */
  def fingerprint(text: Column): Column =
    md5(concat_ws(" ", regexTokens(text)).cast("binary"))

  /** Winnowing fingerprints (the MOSS scheme): hash every `k`-gram, then
    * keep the minimum hash of each `w`-wide window of consecutive gram
    * hashes — a robust, position-tolerant fingerprint set with guaranteed
    * density 2/(w+1): any shared run of k+w-1 tokens yields at least one
    * shared fingerprint, so plagiarism/quote detection needs only an
    * equi-join on (fp). Hashes are fixed-width lowercase-hex md5 prefixes,
    * so MIN compares lexicographically — portable to any engine with md5,
    * no numeric conversion (this library's sampleKey trick).
    *
    * Entirely row-local (no shuffle): every intermediate array is bound
    * once through a single-element transform (the NOTES HOF lesson —
    * referencing a tree from a lambda re-evaluates it per element).
    * Returns a sorted distinct `array<string>`; empty below k+w-1 tokens.
    */
  def winnowFingerprints(text: Column, k: Int = 3, w: Int = 4): Column = {
    require(k >= 1 && w >= 1, "need k >= 1 and w >= 1")
    val raw = transform(array(regexTokens(text)), t =>
      transform(array(
          transform(sequence(lit(1), size(t) - (k - 1)), i =>
            substring(md5(concat_ws(" ", slice(t, i, lit(k))).cast("binary")),
              1, 8))),
        h => array_sort(array_distinct(
          transform(sequence(lit(1), size(h) - (w - 1)), j =>
            array_min(slice(h, j, lit(w)))))))
        .getItem(0))
      .getItem(0)
    when(size(regexTokens(text)) >= k + w - 1, raw)
      .otherwise(array().cast("array<string>"))
  }

  /** Polynomial rolling hash of the normalized token stream (mod 2^31-1,
    * base 31): a cheap locality-free fingerprint in plain long arithmetic —
    * used where a numeric key beats a hex string (e.g. range-bucketing). */
  def rollingHash(text: Column): Column =
    aggregate(regexTokens(text), lit(0L),
      (acc, t) => (acc * 31L + pmod(xxhash64(t), lit(2147483647L))) % 2147483647L)

  /** Unicode NFC normalization (JDK Normalizer — no ICU needed): canonical
    * composition so visually-identical strings dedupe/fingerprint equal.
    * Scalar UDF; cheap relative to the hashing it feeds. */
  val nfc: org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udf { (s: String) =>
      if (s == null) null
      else java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)
    }

  /** Overlapping token-window chunks — the tokenize-and-chunk step that
    * precedes training/embedding: windows of `chunkTokens` whitespace
    * tokens advancing by `chunkTokens - overlap`, last partial window kept.
    * Returns array<struct<chunk_idx:int, chunk:string, n_tokens:int>> —
    * posexplode at the call site for one row per chunk. Row-local,
    * shuffle-free; a 100 TB corpus chunks at scan speed.
    *
    * The token array is BOUND as a lambda variable before the per-window
    * transform — referencing the split tree inside the window lambda would
    * re-tokenize the document once per chunk (the tree-in-lambda rule,
    * NOTES.md). */
  def chunk(text: Column, chunkTokens: Int, overlap: Int): Column = {
    require(chunkTokens > 0 && overlap >= 0 && overlap < chunkTokens,
      "need 0 <= overlap < chunkTokens")
    val step = chunkTokens - overlap
    transform(array(wsTokens(text)), w => {
      val n = size(w)
      // window starts: 1, 1+step, … while start <= max(1, n - overlap)
      val starts = sequence(lit(1), greatest(lit(1), n - overlap), lit(step))
      transform(starts, (s, i) =>
        struct(
          i.cast("int").as("chunk_idx"),
          concat_ws(" ", slice(w, s, lit(chunkTokens))).as("chunk"),
          least(lit(chunkTokens), n - s + 1).cast("int").as("n_tokens")))
    }).getItem(0)
  }

  /** Fraction of word n-grams that repeat an earlier occurrence
    * (1 - distinct/total) — the within-document repetition signal of
    * Gopher-style corpus filtering: templated/boilerplate/looping text
    * scores high, natural prose low. 0.0 for docs with < n tokens.
    *
    * Shape: total n-grams is pure arithmetic (m - n + 1) and the distinct
    * count comes from the native one-pass [[graft.expressions.WordNGrams]]
    * kernel — everything codegen'd, no higher-order functions. (The first
    * cut built the gram array with transform(sequence…)+slice+array_distinct;
    * generic lambda eval made it the slowest line of the whole bench, ~40 s
    * at sf0.1 vs <1 s for this formulation.) */
  def dupNgramRatio(text: Column, n: Int): Column =
    dupNgramRatioTokens(wsTokens(text), n)

  /** [[dupNgramRatio]] over an already-tokenized array column. */
  def dupNgramRatioTokens(toks: Column, n: Int): Column = {
    require(n >= 1, "n-gram size must be >= 1")
    val total = size(toks) - (n - 1)
    when(total > 0,
      (total - size(graft.expressions.GraftFunctions.graftNGrams(toks, n)))
        .cast("double") / total)
      .otherwise(lit(0.0))
  }

  /** Markup strip + whitespace normalization: HTML tags and control chars
    * become spaces, whitespace runs collapse, ends trimmed. RE2-safe
    * patterns (no backrefs/lookaround) so the same regexes run on any
    * engine. Row-local, codegen'd, shuffle-free. */
  def cleanText(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(
        regexp_replace(text, "<[^>]+>", " "),
        "[\\x00-\\x1f]", " "),
      " +", " "))

  /** PII-shaped span redaction: emails → `<EMAIL>`, URLs → `<URL>`,
    * long digit runs (phone-ish) → `<NUM>`. Pattern policy, not NER —
    * the cheap first-pass scrub of a training-data pipeline. */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text,
          "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}", "<EMAIL>"),
        "https?://[^ ]+", "<URL>"),
      "[0-9][0-9 ()+-]{6,}[0-9]", "<NUM>")

  /** CJK-character ratio (Han range) — the zh/ja signal regex stopwords miss. */
  def cjkRatio(text: Column): Column =
    when(length(text) > 0,
      (length(text) - length(regexp_replace(text, "[\\u4e00-\\u9fff]", "")))
        .cast("double") / length(text))
      .otherwise(lit(0.0))

  /** Compression-ratio quality signal: deflate(text).length / text.length —
    * the classic "too compressible = boilerplate/repetition, incompressible
    * = noise/binary junk" curation filter (used by RefinedWeb-style
    * pipelines alongside the n-gram repetition signals). Deflate has no
    * Column form, so this is a `mapPartitions` batch pass like the media
    * codecs — one Deflater per partition, reused across rows (allocation
    * per row would dominate). Row-local, shuffle-free. Output:
    * (id, raw_len, deflate_len, ratio 6 dp). */
  def compressionSignals(df: org.apache.spark.sql.DataFrame,
      idCol: String, textCol: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val outSchema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("raw_len", IntegerType, nullable = false),
      StructField("deflate_len", IntegerType, nullable = false),
      StructField("ratio", DoubleType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val idIdx = df.schema.fieldIndex(idCol)
    val tIdx = df.schema.fieldIndex(textCol)
    df.mapPartitions { rows =>
      // partition-scoped deflater, reset per row (fixed level => the
      // signal is a pure function of the bytes)
      val deflater = new java.util.zip.Deflater(6)
      // native zlib memory is NOT gc-driven: release deterministically at
      // task end, or long-lived executors accumulate it until finalization
      Option(org.apache.spark.TaskContext.get()).foreach(
        _.addTaskCompletionListener[Unit](_ => deflater.end()))
      val buf = new Array[Byte](1 << 16)
      rows.map { r =>
        val bytes = r.getString(tIdx).getBytes("UTF-8")
        deflater.reset()
        deflater.setInput(bytes)
        deflater.finish()
        var n = 0
        while (!deflater.finished()) n += deflater.deflate(buf)
        val ratio =
          if (bytes.length == 0) 0.0
          else BigDecimal(n.toDouble / bytes.length)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        Row(r.getLong(idIdx), bytes.length, n, ratio)
      }
    }(enc)
  }
}

/** Tiny per-language stopword profiles for the n-gram/stopword language-ID
  * heuristic. Deliberately small: language ID at pipeline scale is a cheap
  * prefilter, not a classifier. */
object LangId {
  val en = Seq("the", "a", "and", "of", "to", "in", "is", "that", "it", "for")
  val es = Seq("el", "la", "los", "de", "que", "y", "en", "un", "una", "por")
  val de = Seq("der", "die", "das", "und", "ist", "von", "den", "mit", "zu", "ein")
  val fr = Seq("le", "la", "les", "de", "et", "est", "en", "une", "du", "que")

  val profiles: Seq[(String, Seq[String])] =
    Seq("en" -> en, "es" -> es, "de" -> de, "fr" -> fr)

  /** Per-language stopword-hit ratios + argmax prediction ("unknown" when no
    * profile fires; CJK ratio overrides to "zh"). Tie-break follows profile
    * order. Returns (ratios…, predicted) as a struct.
    *
    * All profile ratios come from ONE pass over the token array
    * ([[graft.expressions.StopwordRatios]] — bit-identical counts); the
    * per-profile HOF formulation re-walked the tokens ~3× per profile
    * through generic lambdas (measured ~10× slower end to end).
    */
  def predict(text: Column): Column = {
    val rs = graft.expressions.GraftFunctions.graftStopRatios(
      TextAnalysis.wsTokens(text), profiles.map(_._2))
    val ratios = profiles.zipWithIndex.map { case ((l, _), i) =>
      l -> rs.getItem(i)
    }
    val maxR = greatest(ratios.map(_._2): _*)
    val pick = ratios.foldRight(lit("unknown")) { case ((l, r), els) =>
      when(maxR > 0 && r === maxR, lit(l)).otherwise(els)
    }
    val pred = when(TextAnalysis.cjkRatio(text) > 0.3, lit("zh")).otherwise(pick)
    struct(
      ratios.map { case (l, r) => round(r, 6).as(s"r_$l") } :+ pred.as("predicted"): _*)
  }
}
