package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Sinks + storage layout (SURVEY S10/S11/S12, §4 partition pruning):
  * partitioned parquet round trips, pruning reaches the scan, dynamic
  * partition overwrite implements UPDATE…WHERE persistence, CSV sink writes
  * real rows, and native expressions are SQL-registered.
  */
class StorageSpec extends GraftSuite {
  import spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toFile.getAbsolutePath

  private lazy val catalog = Seq(
    (1L, "A", 0), (2L, "B", 0), (3L, "C", 2), (4L, "D", 2)
  ).toDF("ID", "INDICE", "ID_PROCESO")

  test("partitioned catalog write: partition pruning reaches the scan") {
    val dir = tmp("cat")
    catalog.write.mode("overwrite").partitionBy("ID_PROCESO").parquet(dir)
    val back = spark.read.parquet(dir).filter($"ID_PROCESO" === 2)
    assert(back.select("ID").as[Long].collect().sorted.toSeq === Seq(3L, 4L))
    val plan = back.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("ID_PROCESO"),
      s"partition filter missing from plan:\n$plan")
    // only the matching partition directory is scanned
    val scanned = back.queryExecution.executedPlan.collectLeaves()
      .flatMap(_.toString.linesIterator.filter(_.contains("Location"))).mkString
    assert(!scanned.contains("ID_PROCESO=0") || scanned.contains("InMemoryFileIndex"))
  }

  test("S12 persisted: dynamic partition overwrite touches only changed partitions") {
    val dir = tmp("upd")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    catalog.write.mode("overwrite").partitionBy("ID_PROCESO").parquet(dir)
    // update rows of partition 0 only (read-modify-overwrite of that slice)
    val updated = spark.read.parquet(dir)
      .filter($"ID_PROCESO" === 0)
      .withColumn("INDICE", concat($"INDICE", lit("_v2")))
    updated.write.mode("overwrite").partitionBy("ID_PROCESO").parquet(dir)
    val back = spark.read.parquet(dir)
    assert(back.count() === 4, "dynamic overwrite must keep untouched partitions")
    val byId = back.select("ID", "INDICE").as[(Long, String)].collect().toMap
    assert(byId(1L) === "A_v2" && byId(2L) === "B_v2")
    assert(byId(3L) === "C" && byId(4L) === "D")
  }

  test("append mode accumulates batches (S11 catalog append)") {
    val dir = tmp("app")
    catalog.write.mode("overwrite").partitionBy("ID_PROCESO").parquet(dir)
    Seq((5L, "E", 5)).toDF("ID", "INDICE", "ID_PROCESO")
      .write.mode("append").partitionBy("ID_PROCESO").parquet(dir)
    assert(spark.read.parquet(dir).count() === 5)
  }

  test("S10: indices.csv sink writes header + data rows") {
    val dir = tmp("csv")
    Seq(("img1.JPG", "1.0;2.0", "Fundo", "C_1_EU_1"))
      .toDF("IMAGEN", "CENTROIDE", "PREDIO", "INDICE")
      .write.option("header", "true").mode("overwrite").csv(dir)
    val back = spark.read.option("header", "true").csv(dir)
    assert(back.columns.toSeq === Seq("IMAGEN", "CENTROIDE", "PREDIO", "INDICE"))
    assert(back.count() === 1)
  }

  test("native expressions usable from SQL after registration") {
    graft.expressions.GraftFunctions.register(spark)
    val out = spark.sql(
      "SELECT graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d").as[Double]
      .collect().head
    assert(out === 11.0)
  }
}
