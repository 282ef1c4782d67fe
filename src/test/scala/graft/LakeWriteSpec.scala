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

  test("schema enforcement: a mismatched append fails, not silent drift") {
    val root = tmp()
    write(root, Seq((1L, "a")).toDF("k", "v"), SaveMode.Append)
    // typo'd column name: refused with the offending column named
    val ex = intercept[IllegalArgumentException] {
      write(root, Seq((2L, "b")).toDF("k", "vv"), SaveMode.Append)
    }
    assert(ex.getMessage.contains("vv") &&
      ex.getMessage.contains("mergeSchema"))
    assert(TxnCatalog.read(spark, root, "t").get.count() === 1L,
      "refused appends commit nothing")
    // missing column: null-filled at the table's type
    write(root, Seq(Tuple1(3L)).toDF("k"), SaveMode.Append)
    val rows = TxnCatalog.read(spark, root, "t").get
      .select("k", "v").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(rows.toSet === Set((1L, "a"), (3L, null)))
    // lossless upcast (int -> long) conforms silently
    write(root, Seq((4, "d")).toDF("k", "v"), SaveMode.Append)
    assert(TxnCatalog.read(spark, root, "t").get
      .filter("k = 4").select("v").collect().head.getString(0) === "d")
    // any-type-to-string IS a lossless upcast (Spark's canUpCast):
    // a long fed to the string column conforms as its rendering
    write(root, Seq((5L, 9L)).toDF("k", "v"), SaveMode.Append)
    assert(TxnCatalog.read(spark, root, "t").get
      .filter("k = 5").select("v").collect().head.getString(0) === "9")
    // lossy narrowing (long column fed a double) is refused
    val ex2 = intercept[IllegalArgumentException] {
      write(root, Seq((5.5, "e")).toDF("k", "v"), SaveMode.Append)
    }
    assert(ex2.getMessage.contains("not lossless"))
  }

  test("mergeSchema=true widens the table; old rows read null") {
    val root = tmp()
    write(root, Seq((1L, "a")).toDF("k", "v"), SaveMode.Append)
    write(root, Seq((2L, "b", 7.5)).toDF("k", "v", "score"),
      SaveMode.Append, "mergeSchema" -> "true")
    val df = TxnCatalog.read(spark, root, "t").get
    assert(df.columns.toSet === Set("k", "v", "score"))
    val byK = df.collect().map(r =>
      r.getLong(r.fieldIndex("k")) ->
        (if (r.isNullAt(r.fieldIndex("score"))) None
         else Some(r.getDouble(r.fieldIndex("score"))))).toMap
    assert(byK === Map(1L -> None, 2L -> Some(7.5)))
  }

  test("streaming sink enforces the table schema per micro-batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val root = tmp()
    write(root, Seq((1L, "a")).toDF("k", "v"), SaveMode.Append)
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Double, String)]
    in.addData((2.5, "b")) // k arrives as DOUBLE against a LONG column
    val ckpt = Files.createTempDirectory("sinkconform").toString
    val q = in.toDF().toDF("k", "v").writeStream
      .format("graft-lake").option("root", root).option("table", "t")
      .option("checkpointLocation", ckpt).start()
    val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q.processAllAvailable()
    }
    assert(ex.getCause.getMessage.contains("not lossless"))
    q.stop()
    assert(TxnCatalog.read(spark, root, "t").get.count() === 1L)
  }
}
