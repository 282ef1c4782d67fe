package graft.ops

import graft.GraftSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

class SkewAndExtensionsSpec extends GraftSuite {
  import spark.implicits._

  test("saltedJoin equals plain join on skewed data") {
    // 90% of fact rows share one hot key
    val fact = (1 to 1000).map(i => (if (i <= 900) 1L else i.toLong, i))
      .toDF("k", "v")
    val dim = Seq((1L, "hot"), (950L, "cold")).toDF("k", "name")
    val plain = fact.join(dim, "k").select("k", "v", "name")
      .collect().map(_.toSeq).toSet
    val salted = Skew.saltedJoin(fact, dim, "k", salts = 8)
      .select("k", "v", "name").collect().map(_.toSeq).toSet
    assert(salted === plain)
    assert(salted.count(_.head == 1L) === 900)
  }

  test("saltedCountSum equals direct aggregation") {
    val df = (1 to 500).map(i => (i % 3, i.toLong)).toDF("k", "v")
    val direct = df.groupBy("k").agg(count(lit(1)).as("n"), sum("v").as("sum"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    val salted = Skew.saltedCountSum(df, "k", col("v"), salts = 4)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    assert(salted === direct)
  }

  test("GraftExtensions injects SQL functions via spark.sql.extensions") {
    // the spark.sql.extensions CONF string is only honored on a fresh
    // SparkContext (spark-submit path, untestable in this shared-context
    // JVM); the programmatic withExtensions API runs the same injection
    // logic, so that's what this test drives. getOrCreate would hand back
    // the shared session, so detach it first and restore after; the new
    // session reuses the same SparkContext — never stop it here.
    val shared = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s2 = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .withExtensions(new graft.GraftExtensions())
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      val d = s2.sql("SELECT graft_dot(array(1.0D,2.0D), array(3.0D,4.0D)) AS d")
        .collect().head.getDouble(0)
      assert(d === 11.0)
      val sh = s2.sql("SELECT graft_simhash(array('a','b')) AS h").collect().head.getLong(0)
      val sh2 = s2.sql("SELECT graft_simhash(array('a','b')) AS h").collect().head.getLong(0)
      assert(sh === sh2)
      val in = s2.sql(
        """SELECT graft_contains(
          |  array(named_struct('x', 0.0D, 'y', 0.0D), named_struct('x', 4.0D, 'y', 0.0D),
          |        named_struct('x', 4.0D, 'y', 4.0D), named_struct('x', 0.0D, 'y', 4.0D)),
          |  2.0D, 2.0D) AS c""".stripMargin).collect().head.getBoolean(0)
      assert(in)
    } finally {
      SparkSession.setDefaultSession(shared)
      SparkSession.setActiveSession(shared)
    }
  }

  test("SpatialJoinRewrite: naive cross join + graft_contains becomes a bucketed equi-join") {
    val shared = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s2 = SparkSession.builder()
      .master("local[2]")
      .appName("graft-rule-test")
      .withExtensions(new graft.GraftExtensions())
      .config("spark.ui.enabled", "false")
      .config("spark.graft.spatialJoin.cellSize", "2.0")
      .getOrCreate()
    try {
      import s2.implicits._
      val pts = Seq((1L, 1.0, 1.0), (2L, 5.0, 1.5), (3L, 9.0, 9.0))
        .toDF("id", "px", "py")
      val polys = Seq(
        (10L, Seq((0.0, 0.0), (2.0, 0.0), (2.0, 2.0), (0.0, 2.0))),
        (20L, Seq((4.0, 0.0), (6.0, 0.0), (6.0, 2.0), (4.0, 2.0)))
      ).toDF("pid", "pts")
        .select($"pid", org.apache.spark.sql.functions.transform($"pts",
          p => org.apache.spark.sql.functions.struct(
            p.getField("_1").as("x"), p.getField("_2").as("y"))).as("ring"))
      pts.createOrReplaceTempView("pts")
      polys.createOrReplaceTempView("polys")
      val naive = s2.sql(
        "SELECT id, pid FROM pts CROSS JOIN polys WHERE graft_contains(ring, px, py)")
      val plan = naive.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
        s"rule must eliminate the cross product:\n$plan")
      assert(naive.as[(Long, Long)].collect().toSet === Set((1L, 10L), (2L, 20L)))
    } finally {
      SparkSession.setDefaultSession(shared)
      SparkSession.setActiveSession(shared)
    }
  }
}
