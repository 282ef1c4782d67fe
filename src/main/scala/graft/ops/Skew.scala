package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation (SURVEY §4 shuffle/partitioning row; 100 TB posture).
  *
  * AQE's skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`, on by
  * default) handles sort-merge skew at runtime; explicit salting remains the
  * tool when one side must be replicated anyway (hot-key fact×dim joins) or
  * when the skewed key feeds an aggregation, not a join.
  */
object Skew {

  /** Salted inner equi-join for a skewed fact side: fact rows get a
    * deterministic salt in [0, salts) derived from non-key columns' hash
    * (xxhash64 — NOT random: re-runs produce identical plans/results), the
    * dim side is replicated once per salt value, and the join key becomes
    * (key, salt) — spreading each hot key over `salts` reducers.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String, salts: Int): DataFrame = {
    require(salts > 0)
    val saltSrc = fact.columns.filter(_ != key).map(col)
    val salted = fact.withColumn("__salt",
      pmod(xxhash64(saltSrc: _*), lit(salts.toLong)).cast("int"))
    val replicated = dim.withColumn("__salt",
      explode(array((0 until salts).map(lit): _*)))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Two-phase (salted partial → final) aggregation for skewed group keys:
    * phase 1 aggregates (key, salt) partials, phase 2 merges per key. Only
    * decomposable aggregates apply; count/sum forms are provided. */
  def saltedCountSum(df: DataFrame, key: String, valueCol: Column, salts: Int): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(xxhash64(valueCol), lit(salts.toLong)).cast("int"))
    salted.groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("__n"), sum(valueCol).as("__s"))
      .groupBy(col(key))
      .agg(sum("__n").as("n"), sum("__s").as("sum"))
  }
}
