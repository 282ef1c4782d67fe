package graft

import java.nio.file.Files

import org.apache.spark.sql.SaveMode

import graft.storage.TxnCatalog

/** `df.write.format("graft-lake")`: batch writes through the provider —
  * append batches, bulk keyed appends, overwrite, and the existence
  * modes, all landing as ordinary TxnCatalog commits. */
class LakeWriteSpec extends GraftSuite {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("lakewrite").toFile.getAbsolutePath

  private def write(root: String, df: org.apache.spark.sql.DataFrame,
      mode: SaveMode, opts: (String, String)*): Unit = {
    val w = df.write.format("graft-lake")
      .option("root", root).option("table", "t").mode(mode)
    opts.foldLeft(w) { case (b, (k, v)) => b.option(k, v) }.save()
  }

  test("append mode lands atomic batch partitions with stats") {
    val root = tmp()
    write(root, Seq((1L, "a"), (2L, "b")).toDF("k", "v"), SaveMode.Append,
      "statsColumns" -> "k")
    write(root, Seq((3L, "c")).toDF("k", "v"), SaveMode.Append,
      "statsColumns" -> "k")
    val snap = TxnCatalog.snapshot(spark, root).get
    assert(snap.partitions("t").size === 2)
    assert(snap.partitions("t").forall(_.startsWith("batch=")))
    assert(snap.read("t").get.count() === 3L)
    // stats threaded through: a range read prunes to one batch
    assert(snap.partitionsWhere("t", "k", 3L, 3L).size === 1)
  }

  test("keyColumn appends bulk partitions; second write becomes a generation") {
    val root = tmp()
    val df = (0 until 40).map(i => (i.toLong, i % 4)).toDF("id", "grp")
    write(root, df, SaveMode.Append, "keyColumn" -> "grp",
      "statsColumns" -> "id")
    val p1 = TxnCatalog.partitions(spark, root, "t")
    assert(p1.size === 4 && p1.forall(_.startsWith("grp=")))
    // appending again must not replace the first load
    val more = (40 until 60).map(i => (i.toLong, i % 4)).toDF("id", "grp")
    write(root, more, SaveMode.Append, "keyColumn" -> "grp",
      "statsColumns" -> "id")
    val p2 = TxnCatalog.partitions(spark, root, "t")
    assert(p2.size === 8, s"generation partitions must land beside: $p2")
    assert(TxnCatalog.read(spark, root, "t").get.count() === 60L)
  }

  test("overwrite replaces the table; properties survive") {
    val root = tmp()
    write(root, Seq((1L, "a")).toDF("k", "v"), SaveMode.Append)
    TxnCatalog.setTableProperties(spark, root, "t", Map("owner" -> "etl"))
    write(root, Seq((9L, "z")).toDF("k", "v"), SaveMode.Overwrite)
    assert(TxnCatalog.read(spark, root, "t").get.collect().map(_.getLong(0))
      === Array(9L))
    assert(TxnCatalog.tableProperties(spark, root, "t") === Map("owner" -> "etl"))
    intercept[IllegalArgumentException] {
      write(root, Seq((1L, 1L)).toDF("k", "grp"), SaveMode.Overwrite,
        "keyColumn" -> "grp")
    }
  }

  test("ErrorIfExists and Ignore follow SQL semantics") {
    val root = tmp()
    write(root, Seq((1L, "a")).toDF("k", "v"), SaveMode.ErrorIfExists)
    intercept[IllegalArgumentException] {
      write(root, Seq((2L, "b")).toDF("k", "v"), SaveMode.ErrorIfExists)
    }
    write(root, Seq((3L, "c")).toDF("k", "v"), SaveMode.Ignore) // no-op
    assert(TxnCatalog.read(spark, root, "t").get.count() === 1L)
  }

  test("batch read through the format: filters, deletes, time travel") {
    val root = tmp()
    TxnCatalog.commitPartitions(spark, root,
      (0 until 4).map(k => ("t", s"b=$k",
        (k * 25 until (k + 1) * 25).map(i => (i.toLong, s"v$i")).toDF("k", "v"))),
      statsColumns = Seq("k"))
    val v1 = TxnCatalog.currentTxn(spark, root).get
    TxnCatalog.deleteKeys(spark, root, "t",
      "k", Seq(Tuple1(10L), Tuple1(77L)).toDF("k"))
    def read(extra: (String, String)*) = extra.foldLeft(
      spark.read.format("graft-lake").option("root", root).option("table", "t")
    ) { case (r, (k2, v2)) => r.option(k2, v2) }.load()
    // merge-on-read deletes apply to the format read
    assert(read().count() === 98L)
    assert(read().filter($"k" === 10L).count() === 0L)
    // pushed filters stay correct (re-applied above the delegate scan)
    assert(read().filter($"k" >= 90L).select("v").as[String].collect().sorted
      === (90 until 100).map(i => s"v$i").toArray)
    // column pruning survives the v1 bridge
    assert(read().select("v").columns === Array("v"))
    // versionAsOf reads the pre-delete snapshot
    assert(read("versionAsOf" -> v1.toString).count() === 100L)
    intercept[IllegalArgumentException] {
      spark.read.format("graft-lake").option("root", root)
        .option("table", "absent").load()
    }
  }
}
