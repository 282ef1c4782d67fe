package graft.ops

import org.apache.spark.ml.feature.{HashingTF, MinHashLSH}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MLlib-backed fuzzy dedup (SURVEY §2.2 extensions row named this as the
  * library path): shingles → HashingTF set vectors → MinHashLSH →
  * approxSimilarityJoin. Kept alongside the hand-rolled
  * [[Dedup.minHashLshPairs]]:
  *
  *  - the hand-rolled version is the engine's primary (explicit banding,
  *    bucket-skew cap, native one-pass signatures, exact-Jaccard verify —
  *    and its verified output is DuckDB-oracle-checked);
  *  - this one demonstrates drop-in interop with Spark ML pipelines (its
  *    Jaccard is computed over the 2^18-dim hashed term space, so values
  *    can differ from exact shingle Jaccard under hash collisions — treat
  *    its distances as approximate).
  */
object DedupMllib {

  /** Near-duplicate pairs (idA < idB, mllib Jaccard distance <= maxDistance). */
  def minHashLshPairs(
      df: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, numHashTables: Int = 8,
      maxDistance: Double = 0.5, seed: Long = 42L): DataFrame = {
    val sh = df.select(col(idCol).as("__id"),
      Dedup.shingles(col(textCol), shingleN).as("__sh"))
      .filter(size(col("__sh")) > 0)
    val tf = new HashingTF()
      .setInputCol("__sh").setOutputCol("__vec")
      .setBinary(true).setNumFeatures(1 << 18)
    val vecs = tf.transform(sh)
    val lsh = new MinHashLSH()
      .setInputCol("__vec").setOutputCol("__hashes")
      .setNumHashTables(numHashTables).setSeed(seed)
    val model = lsh.fit(vecs)
    model.approxSimilarityJoin(vecs, vecs, maxDistance, "dist")
      .select(
        col("datasetA.__id").as("ida"),
        col("datasetB.__id").as("idb"),
        col("dist"))
      .filter(col("ida") < col("idb"))
  }
}
