package graft.queries

import graft.{QueryDef, QueryGroup, Tables}
import graft.ops.{Layout, Profile}
import org.apache.spark.sql.functions._

/** Physical-layout and profiling surface: Morton Z-values (multi-dimension
  * clustering for data skipping) and the one-pass table profile. */
object LayoutQueries extends QueryGroup {

  /** 8-term Morton interleave of the low 8 bits, as literal SQL. */
  private def zSql(a: String, b: String): String =
    (0 until 8).map { i =>
      s"((($a >> $i) & 1) * ${1L << (2 * i)} + (($b >> $i) & 1) * ${1L << (2 * i + 1)})"
    }.mkString(" + ")

  val defs: Seq[QueryDef] = Seq(

    // Z-value computation (the clustering key of a z-ordered write),
    // cross-checked as pure bit arithmetic.
    QueryDef(
      "x_zorder_value",
      (s, d) =>
        Tables.events(s, d)
          .select(col("event_id"),
            (col("user_id") % 256).as("za"),
            (col("event_id") % 256).as("zb"),
            Layout.interleaveBits(col("user_id") % 256, col("event_id") % 256, 8)
              .as("z"))
          .orderBy("event_id"),
      Some(s"""SELECT event_id,
              |  user_id % 256 AS za, event_id % 256 AS zb,
              |  ${zSql("(user_id % 256)", "(event_id % 256)")} AS z
              |FROM events ORDER BY event_id""".stripMargin)),

    // One-pass table profile (long format). Exact ndv here so the oracle
    // can check it; the default sketch mode is the scale path.
    QueryDef(
      "q_profile_lineitem",
      (s, d) =>
        Profile.profile(Tables.lineitem(s, d),
            Seq("l_quantity", "l_linenumber", "l_returnflag"), exactNdv = true)
          .select(col("colname"), col("metric"), round(col("value"), 6).as("value"))
          .orderBy("colname", "metric"),
      Some("""WITH m AS (
             |  SELECT 'l_quantity' AS colname, 'count' AS metric,
             |         CAST(COUNT(l_quantity) AS DOUBLE) AS value FROM lineitem
             |  UNION ALL SELECT 'l_quantity', 'nulls',
             |    CAST(SUM(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
             |    FROM lineitem
             |  UNION ALL SELECT 'l_quantity', 'ndv',
             |    CAST(COUNT(DISTINCT l_quantity) AS DOUBLE) FROM lineitem
             |  UNION ALL SELECT 'l_quantity', 'min',
             |    CAST(MIN(l_quantity) AS DOUBLE) FROM lineitem
             |  UNION ALL SELECT 'l_quantity', 'max',
             |    CAST(MAX(l_quantity) AS DOUBLE) FROM lineitem
             |  UNION ALL SELECT 'l_quantity', 'mean',
             |    SUM(CAST(l_quantity AS DOUBLE)) / COUNT(l_quantity) FROM lineitem
             |  UNION ALL SELECT 'l_linenumber', 'count',
             |    CAST(COUNT(l_linenumber) AS DOUBLE) FROM lineitem
             |  UNION ALL SELECT 'l_linenumber', 'nulls',
             |    CAST(SUM(CASE WHEN l_linenumber IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
             |    FROM lineitem
             |  UNION ALL SELECT 'l_linenumber', 'ndv',
             |    CAST(COUNT(DISTINCT l_linenumber) AS DOUBLE) FROM lineitem
             |  UNION ALL SELECT 'l_linenumber', 'min',
             |    CAST(MIN(l_linenumber) AS DOUBLE) FROM lineitem
             |  UNION ALL SELECT 'l_linenumber', 'max',
             |    CAST(MAX(l_linenumber) AS DOUBLE) FROM lineitem
             |  UNION ALL SELECT 'l_linenumber', 'mean',
             |    SUM(CAST(l_linenumber AS DOUBLE)) / COUNT(l_linenumber) FROM lineitem
             |  UNION ALL SELECT 'l_returnflag', 'count',
             |    CAST(COUNT(l_returnflag) AS DOUBLE) FROM lineitem
             |  UNION ALL SELECT 'l_returnflag', 'nulls',
             |    CAST(SUM(CASE WHEN l_returnflag IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
             |    FROM lineitem
             |  UNION ALL SELECT 'l_returnflag', 'ndv',
             |    CAST(COUNT(DISTINCT l_returnflag) AS DOUBLE) FROM lineitem)
             |SELECT colname, metric, round(value, 6) AS value FROM m
             |ORDER BY colname, metric""".stripMargin)),

    // Per-user Shannon entropy of the event-type distribution — the
    // diversity/skew profile column. Exact integer counts divide before
    // the only float step on both engines.
    QueryDef(
      "x_entropy_by_group",
      (s, d) =>
        Profile.entropyByGroup(Tables.events(s, d), "user_id", "event_type")
          .orderBy("user_id"),
      Some("""WITH c AS (SELECT user_id, event_type, COUNT(*) c
             |           FROM events GROUP BY 1, 2),
             |t AS (SELECT user_id, SUM(c) t FROM c GROUP BY 1),
             |p AS (SELECT c.user_id, CAST(c.c AS DOUBLE) / t.t AS p
             |      FROM c JOIN t ON c.user_id = t.user_id)
             |SELECT user_id, round(-SUM(p * ln(p)), 6) AS entropy,
             |  CAST(COUNT(*) AS BIGINT) AS n_categories
             |FROM p GROUP BY user_id ORDER BY user_id""".stripMargin))
  )
}
