package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Byte-pair-encoding tokenizer (Sennrich et al. 2016) — train and apply,
  * Spark-first: the DATA-sized step (word counting) is a distributed hash
  * aggregate; the greedy merge loop then runs driver-side over the
  * VOCAB-sized count dictionary (bounded by `maxVocabWords`, the same
  * driver-resident-artifact posture as the PQ codebooks — this is how
  * production BPE trainers work at corpus scale too: they train on an
  * aggregated word-frequency dict, never on raw text). Encoding broadcasts
  * the merge ranks and applies them row-local in `mapPartitions`.
  *
  * Everything is deterministic: the dictionary orders by (count desc,
  * word), merge ties break on the lexicographically smallest pair, and
  * encoding always merges the LOWEST-ranked adjacent pair first — so any
  * retry, engine, or partition layout produces identical tokens.
  */
object Bpe {

  /** Greedy merge training: returns `numMerges` merges in creation order.
    * One distributed word-count aggregate; the driver loop touches only
    * the ≤ `maxVocabWords` dictionary.
    *
    * Memory envelope: the driver holds one `(word, count)` array of at
    * most `maxVocabWords` entries — ≲ tens of MB at the 2¹⁷ default —
    * regardless of corpus size; the full vocabulary only ever exists as a
    * distributed aggregate. A web-scale corpus's raw vocabulary (billions
    * of distinct "words": URLs, typos, hapax junk) would blow the gate,
    * so words rarer than `minWordCount` are dropped first, and if the
    * dictionary STILL exceeds the gate the threshold deterministically
    * doubles until it fits (standard practice — production BPE trainers
    * threshold low-frequency words; merges learned from the frequent
    * vocabulary are what matter, and a hapax tail cannot win a merge vote
    * against the gate-surviving mass anyway). Escalation is driven by
    * cheap counts over the vocab-sized aggregate, not by re-reading the
    * corpus. */
  def train(df: DataFrame, textCol: String, numMerges: Int,
      maxVocabWords: Int = 1 << 17, minWordCount: Long = 1L): Seq[(String, String)] = {
    require(numMerges > 0, "numMerges must be positive")
    require(minWordCount >= 1L, "minWordCount must be >= 1")
    val wc = df
      .select(explode(split(lower(col(textCol)), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("c"))
      .localCheckpoint(false) // vocab-sized; escalation probes re-scan this, not the corpus
    var threshold = minWordCount
    var dictSize = wc.filter(col("c") >= threshold).count()
    while (dictSize > maxVocabWords) {
      threshold *= 2L
      dictSize = wc.filter(col("c") >= threshold).count()
    }
    require(dictSize > 0L,
      s"BPE training dictionary is empty at min-count threshold $threshold " +
        s"(maxVocabWords=$maxVocabWords is too small for this corpus's " +
        "frequency profile); raise the gate")
    val collected = wc.filter(col("c") >= threshold)
      .orderBy(col("c").desc, col("w"))
      .collect()
    var words: Array[(Array[String], Long)] =
      collected.map(r => (r.getString(0).map(_.toString).toArray, r.getLong(1)))
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var i = 0
    var exhausted = false
    while (i < numMerges && !exhausted) {
      val pairCounts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, c) =>
        var j = 0
        while (j + 1 < syms.length) {
          val p = (syms(j), syms(j + 1))
          pairCounts(p) = pairCounts.getOrElse(p, 0L) + c
          j += 1
        }
      }
      if (pairCounts.isEmpty) exhausted = true
      else {
        // max count, ties to the lexicographically smallest pair
        val best = pairCounts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }._1
        merges += best
        words = words.map { case (syms, c) => (mergeOnce(syms, best), c) }
        i += 1
      }
    }
    merges.toSeq
  }

  private def mergeOnce(syms: Array[String], p: (String, String)): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var j = 0
    while (j < syms.length) {
      if (j + 1 < syms.length && syms(j) == p._1 && syms(j + 1) == p._2) {
        out += syms(j) + syms(j + 1); j += 2
      } else { out += syms(j); j += 1 }
    }
    out.toArray
  }

  /** Encode one word under the rank map: repeatedly merge the
    * lowest-ranked adjacent pair (standard BPE apply order). */
  def encodeWord(word: String, ranks: Map[(String, String), Int]): Seq[String] = {
    var syms = word.map(_.toString).toArray
    var done = syms.length < 2
    while (!done) {
      var bestRank = Int.MaxValue; var bestAt = -1
      var j = 0
      while (j + 1 < syms.length) {
        ranks.get((syms(j), syms(j + 1))).foreach { r =>
          if (r < bestRank) { bestRank = r; bestAt = j }
        }
        j += 1
      }
      if (bestAt < 0) done = true
      else {
        syms = (syms.take(bestAt) :+ (syms(bestAt) + syms(bestAt + 1))) ++
          syms.drop(bestAt + 2)
        if (syms.length < 2) done = true
      }
    }
    syms.toSeq
  }

  private val outSchema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("n_words", IntegerType, nullable = false),
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("tokens_per_word", DoubleType, nullable = false)))

  /** Tokenize a corpus under trained merges: per doc, word and BPE-token
    * counts (the fertility stats a data pipeline budgets by). Broadcast
    * ranks + row-local encode; shuffle-free. */
  def tokenize(df: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val spark = df.sparkSession
    val bc = spark.sparkContext.broadcast(merges.zipWithIndex.toMap)
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val idIdx = df.schema.fieldIndex(idCol)
    val tIdx = df.schema.fieldIndex(textCol)
    df.mapPartitions { rows =>
      val ranks = bc.value
      rows.map { r =>
        val words = r.getString(tIdx).toLowerCase.split(" ").filter(_.nonEmpty)
        var tokens = 0
        words.foreach { w => tokens += encodeWord(w, ranks).length }
        val tpw =
          if (words.isEmpty) 0.0
          else BigDecimal(tokens.toDouble / words.length)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        Row(r.getLong(idIdx), words.length, tokens, tpw)
      }
    }(enc)
  }
}
