package graft.sources

import graft.GraftSuite
import org.apache.spark.sql.functions._

/** S9 round-trip against the in-process Derby engine (already on Spark's
  * classpath — no new dependency): write → read, pushdown read, and the
  * range-partitioned parallel read. */
class JdbcSpec extends GraftSuite {
  import spark.implicits._

  private val url = "jdbc:derby:memory:graftdb;create=true"

  test("jdbc write → read round trip preserves rows and schema") {
    val src = Seq((1L, "CO06097", 12.5), (2L, "CO06098", 7.0), (3L, "CO06099", 3.25))
      .toDF("id", "codigo", "apl")
    Jdbc.write(src, url, "catalog_rt", mode = "overwrite")
    val back = Jdbc.read(spark, url, "catalog_rt")
    assert(back.columns.map(_.toLowerCase).sorted === Array("apl", "codigo", "id"))
    assert(back.as[(Long, String, Double)].collect().sortBy(_._1)
      === Array((1L, "CO06097", 12.5), (2L, "CO06098", 7.0), (3L, "CO06099", 3.25)))
  }

  test("jdbc read pushes filters into the remote query") {
    val src = spark.range(100).select($"id", ($"id" % 10).as("bucket"))
    Jdbc.write(src, url, "catalog_push", mode = "overwrite")
    val filtered = Jdbc.read(spark, url, "catalog_push").filter($"bucket" === 3)
    // pushed predicate shows up in the scan node, not a Spark-side Filter
    val scan = filtered.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PushedFilters") && scan.toLowerCase.contains("bucket"),
      s"filter not pushed: $scan")
    assert(filtered.count() === 10)
  }

  test("range-partitioned read splits into parallel range scans") {
    val src = spark.range(1000).select($"id", ($"id" * 2).as("v"))
    Jdbc.write(src, url, "catalog_part", mode = "overwrite")
    val part = Jdbc.readPartitioned(spark, url, "catalog_part",
      partitionCol = "id", lowerBound = 0L, upperBound = 1000L, numPartitions = 4)
    assert(part.rdd.getNumPartitions === 4)
    assert(part.count() === 1000)
    assert(part.agg(sum("v")).as[Long].collect().head === 999L * 1000L)
  }

  test("append mode accumulates; ignore/errorifexists honored") {
    val a = Seq((1L, "x")).toDF("id", "name")
    Jdbc.write(a, url, "catalog_app", mode = "overwrite")
    Jdbc.write(a.select(($"id" + 1).as("id"), $"name"), url, "catalog_app")
    assert(Jdbc.read(spark, url, "catalog_app").count() === 2)
    intercept[Exception] {
      Jdbc.write(a, url, "catalog_app", mode = "errorifexists")
    }
  }
}
