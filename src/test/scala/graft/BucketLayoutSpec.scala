package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.storage.{GraftLake, TxnCatalog}

/** [[TxnCatalog.bucketTable]]: hash-bucketed table layout whose reads
  * declare a Spark `BucketSpec` — joins and aggregations on the bucket
  * key plan WITHOUT an exchange, the shuffle paid once at layout time
  * instead of per-query. Claim-dropping on append keeps plans correct.
  */
class BucketLayoutSpec extends GraftSuite {
  import spark.implicits._

  private def tmp(p: String): String =
    Files.createTempDirectory(p).toFile.getAbsolutePath

  private def commitBatches(root: String, table: String, n: Int,
      rows: Int): Unit =
    (0 until n).foreach { b =>
      TxnCatalog.commitPartitions(spark, root,
        Seq((table, s"batch=$b",
          (0 until rows).map(i => (b * rows + i.toLong, s"v$i", i % 7))
            .toDF("k", "name", "grp"))),
        statsColumns = Seq("k"))
    }

  private def exchanges(df: DataFrame): Int = {
    df.collect() // finalize any adaptive plan first
    val plan = df.queryExecution.executedPlan.toString
    "(?i)Exchange hashpartitioning".r.findAllIn(plan).length
  }

  test("bucketTable preserves content exactly and reads back bucketed") {
    val root = tmp("bkt")
    commitBatches(root, "ev", 3, 100)
    val before = TxnCatalog.read(spark, root, "ev").get
      .orderBy("k").collect()
    TxnCatalog.bucketTable(spark, root, "ev", "k", 8)
    val after = GraftLake.table(spark, root, "ev").get
      .orderBy("k").collect()
    assert(after === before, "bucketing is a pure reorganization")
    val plan = GraftLake.table(spark, root, "ev").get
      .queryExecution.sparkPlan.toString
    assert(plan.contains("Bucketed: true") ||
      plan.contains("SelectedBucketsCount"),
      s"the scan must be bucket-aware, got:\n$plan")
  }

  test("join of two tables bucketed on the same key plans with NO exchange") {
    val root = tmp("bktjoin")
    commitBatches(root, "ev", 2, 200)
    (0 until 2).foreach { b =>
      TxnCatalog.commitPartitions(spark, root,
        Seq(("dim", s"batch=$b",
          (0 until 200).map(i => (b * 200 + i.toLong, s"d$i"))
            .toDF("k", "label"))),
        statsColumns = Seq("k"))
    }
    TxnCatalog.bucketTable(spark, root, "ev", "k", 8)
    TxnCatalog.bucketTable(spark, root, "dim", "k", 8)
    val ev = GraftLake.table(spark, root, "ev").get
    val dim = GraftLake.table(spark, root, "dim").get
    // force the sort-merge path: a broadcast join would hide the
    // co-partitioning claim this spec pins
    val joined = ev.hint("merge").join(dim, "k")
      .select(ev("k"), col("name"), col("label"))
    assert(exchanges(joined) === 0,
      "both sides report the SAME hash partitioning: no shuffle\n" +
        joined.queryExecution.executedPlan)
    // and the result is the plain join's
    assert(joined.count() === 400L)
    // buckets are sorted (one file each): under Spark's opt-in conf
    // the scan reports the per-bucket order and the merge join skips
    // its sorts too (off by default since Spark 3.0 — file order is
    // only trustworthy when the layout guarantees it, which ours does)
    val conf = "spark.sql.legacy.bucketedTableScan.outputOrdering"
    spark.conf.set(conf, "true")
    try {
      val sorted = ev.hint("merge").join(dim, "k")
        .select(ev("k"), col("name"), col("label"))
      sorted.collect()
      val plan = sorted.queryExecution.executedPlan.toString
      assert(!plan.contains("Sort "),
        s"sorted buckets must satisfy the merge join's ordering:\n$plan")
      assert(sorted.count() === 400L)
    } finally spark.conf.unset(conf)
  }

  test("groupBy on the bucket key aggregates without an exchange") {
    val root = tmp("bktagg")
    commitBatches(root, "ev", 2, 150)
    TxnCatalog.bucketTable(spark, root, "ev", "k", 8)
    val agg = GraftLake.table(spark, root, "ev").get
      .groupBy("k").agg(count(lit(1)).as("c"))
    assert(exchanges(agg) === 0,
      "bucketed scan satisfies the aggregation's distribution\n" +
        agg.queryExecution.executedPlan)
    assert(agg.count() === 300L)
  }

  test("an append after bucketing drops the claim; plans stay correct") {
    val root = tmp("bktapp")
    commitBatches(root, "ev", 2, 100)
    TxnCatalog.bucketTable(spark, root, "ev", "k", 4)
    commitBatches(root, "ev", 1, 50) // batch=0 replaced? no: same name —
    // commitPartitions REPLACES batch=0, which is fine: the point is a
    // post-bucketing data entry exists
    val agg = GraftLake.table(spark, root, "ev").get
      .groupBy("k").agg(count(lit(1)).as("c"))
    assert(exchanges(agg) >= 1,
      "a non-bucketed entry must drop the layout claim (shuffle is back)")
    assert(TxnCatalog.read(spark, root, "ev").get.count() === 250L)
  }

  test("the bucketing rewrite is invisible to incremental consumers") {
    val root = tmp("bktdiff")
    commitBatches(root, "ev", 2, 100)
    val before = TxnCatalog.currentTxn(spark, root).get
    val bt = TxnCatalog.bucketTable(spark, root, "ev", "k", 4)
    assert(TxnCatalog.diffData(spark, root, before, bt).isEmpty,
      "a pure reorganization delivers nothing new")
  }

  test("equality deletes after bucketing keep both the claim and correctness") {
    val root = tmp("bktdel")
    commitBatches(root, "ev", 2, 100)
    TxnCatalog.bucketTable(spark, root, "ev", "k", 4)
    TxnCatalog.deleteKeys(spark, root, "ev", "k", Seq(5L, 7L).toDF("k"))
    val df = GraftLake.table(spark, root, "ev").get
    assert(df.count() === 198L)
    val agg = df.groupBy("k").agg(count(lit(1)).as("c"))
    assert(exchanges(agg) === 0,
      "delete key lists ride above the scan; the layout claim holds")
    // but bucketing REFUSES to fold pending deletes in (content change)
    intercept[IllegalArgumentException] {
      TxnCatalog.bucketTable(spark, root, "ev", "k", 4)
    }
  }

  test("a filter on the bucket key prunes buckets inside the scan") {
    val root = tmp("bktprune")
    commitBatches(root, "ev", 2, 200)
    TxnCatalog.bucketTable(spark, root, "ev", "k", 8)
    val q = GraftLake.table(spark, root, "ev").get.where($"k" === 42L)
    val plan = q.queryExecution.sparkPlan.toString
    assert(plan.contains("SelectedBucketsCount: 1 out of 8"),
      s"a point filter must read one bucket, got:\n$plan")
    assert(q.count() === 1L)
  }
}
