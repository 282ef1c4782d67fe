package graft

import graft.storage.TxnCatalog
import org.apache.spark.sql.functions._

/** [[TxnCatalog.setTableProperties]]: table properties and CHECK
  * constraints — declared once, enforced on every future data commit,
  * validated against existing data, invisible to readers. */
class ConstraintSpec extends GraftSuite {
  import spark.implicits._

  private def tmp() =
    java.nio.file.Files.createTempDirectory("props").toString

  private def seed(root: String) =
    TxnCatalog.commitPartitions(spark, root, Seq(
      ("t", "b=0", Seq((1L, 10.0), (2L, 20.0)).toDF("k", "v"))))

  test("properties merge across sets; empty value removes a key") {
    val root = tmp()
    seed(root)
    TxnCatalog.setTableProperties(spark, root, "t",
      Map("owner" -> "etl", "retention.days" -> "30"))
    TxnCatalog.setTableProperties(spark, root, "t",
      Map("retention.days" -> "", "comment" -> "facts"))
    assert(TxnCatalog.tableProperties(spark, root, "t")
      === Map("owner" -> "etl", "comment" -> "facts"))
    // the properties entry is invisible to every reader surface
    val snap = TxnCatalog.snapshot(spark, root).get
    assert(snap.partitions("t") === Seq("b=0"))
    assert(snap.read("t").get.count() === 2L)
    assert(TxnCatalog.diffData(spark, root, 1L,
      TxnCatalog.currentTxn(spark, root).get) === Nil)
  }

  test("a commit violating a declared constraint fails atomically") {
    val root = tmp()
    seed(root)
    TxnCatalog.setTableProperties(spark, root, "t",
      Map("constraint.v_positive" -> "v > 0"))
    val before = TxnCatalog.currentTxn(spark, root).get
    val e = intercept[IllegalArgumentException] {
      TxnCatalog.commitPartitions(spark, root, Seq(
        ("t", "b=1", Seq((3L, 5.0), (4L, -1.0)).toDF("k", "v"))))
    }
    assert(e.getMessage.contains("constraint.v_positive"))
    // nothing moved: same txn, same rows, no orphan partition
    assert(TxnCatalog.currentTxn(spark, root).get === before)
    assert(TxnCatalog.read(spark, root, "t").get.count() === 2L)
    // and a clean commit still goes through afterwards
    TxnCatalog.commitPartitions(spark, root, Seq(
      ("t", "b=1", Seq((3L, 5.0)).toDF("k", "v"))))
    assert(TxnCatalog.read(spark, root, "t").get.count() === 3L)
  }

  test("NULL passes a CHECK (SQL semantics); IS NOT NULL enforces NOT NULL") {
    val root = tmp()
    seed(root)
    TxnCatalog.setTableProperties(spark, root, "t",
      Map("constraint.v_positive" -> "v > 0"))
    // a null v is UNKNOWN, not false — the commit is allowed
    TxnCatalog.commitPartitions(spark, root, Seq(
      ("t", "b=null", Seq((5L, Option.empty[Double])).toDF("k", "v"))))
    // an explicit NOT NULL constraint then rejects it
    intercept[IllegalArgumentException] {
      TxnCatalog.setTableProperties(spark, root, "t",
        Map("constraint.v_set" -> "v IS NOT NULL"))
    }
  }

  test("adding a constraint validates existing data first") {
    val root = tmp()
    seed(root)
    val before = TxnCatalog.currentTxn(spark, root).get
    val e = intercept[IllegalArgumentException] {
      TxnCatalog.setTableProperties(spark, root, "t",
        Map("constraint.small" -> "v < 15"))
    }
    assert(e.getMessage.contains("existing rows"))
    assert(TxnCatalog.currentTxn(spark, root).get === before)
  }

  test("constraints survive compaction and whole-table overwrite") {
    val root = tmp()
    seed(root)
    TxnCatalog.commitPartitions(spark, root, Seq(
      ("t", "b=1", Seq((3L, 30.0)).toDF("k", "v"))))
    TxnCatalog.setTableProperties(spark, root, "t",
      Map("constraint.v_positive" -> "v > 0"))
    // compaction (a reorg) passes without re-validation and keeps ~p
    TxnCatalog.compactPartitions(spark, root, "t", Seq("b=0", "b=1"), "c=0")
    assert(TxnCatalog.tableProperties(spark, root, "t")
      === Map("constraint.v_positive" -> "v > 0"))
    // a whole-table overwrite replaces the data, not the properties
    TxnCatalog.commit(spark, root,
      Seq(("t", Seq((9L, 90.0)).toDF("k", "v"))))
    assert(TxnCatalog.tableProperties(spark, root, "t")
      === Map("constraint.v_positive" -> "v > 0"))
    assert(TxnCatalog.read(spark, root, "t").get.count() === 1L)
    // and they still enforce on the overwritten table
    intercept[IllegalArgumentException] {
      TxnCatalog.commit(spark, root,
        Seq(("t", Seq((10L, -5.0)).toDF("k", "v"))))
    }
  }

  test("multi-column expressions and multiple constraints compose") {
    val root = tmp()
    seed(root)
    TxnCatalog.setTableProperties(spark, root, "t", Map(
      "constraint.k_range" -> "k BETWEEN 0 AND 1000",
      "constraint.shape" -> "v >= 0 OR k < 0"))
    TxnCatalog.commitPartitions(spark, root, Seq(
      ("t", "b=ok", Seq((100L, 1.5)).toDF("k", "v"))))
    intercept[IllegalArgumentException] {
      TxnCatalog.commitPartitions(spark, root, Seq(
        ("t", "b=bad", Seq((2000L, 1.0)).toDF("k", "v"))))
    }
    assert(TxnCatalog.read(spark, root, "t").get.count() === 3L)
  }
}
