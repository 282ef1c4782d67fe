package graft.queries

import graft.{QueryDef, QueryGroup, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Aggregation surface beyond plain groupBy (SURVEY.md §2.2: rollup/cube/
  * grouping sets, distinct aggregates, approx distinct, argmin/argmax A3/A4,
  * top-k, exact moment statistics).
  *
  * Determinism: additive aggregates run over DECIMAL casts (exact, associative,
  * shuffle-order-independent); stddev is derived from exact decimal moments with
  * the final scalar math in double — bit-identical on any partitioning and equal
  * to the DuckDB oracle. argmin/argmax tie-break on a unique column (ts).
  *
  * Scale: all of these are partial+final HashAggregate pairs in Catalyst —
  * map-side combine shrinks shuffle input to |groups| per partition, so 100 TB
  * input shuffles only kilobytes per distinct group.
  */
object GroupingQueries extends QueryGroup {

  private def dec(c: org.apache.spark.sql.Column) = c.cast(DecimalType(18, 2))
  private def dsum(c: org.apache.spark.sql.Column) = sum(dec(c)).cast("double")

  val defs: Seq[QueryDef] = Seq(

    // ROLLUP with grouping_id; NULLS FIRST ordering matched across engines.
    QueryDef(
      "a_rollup",
      (s, d) =>
        Tables.lineitem(s, d)
          .rollup("l_returnflag", "l_linestatus")
          .agg(
            count(lit(1)).as("n"),
            dsum(col("l_quantity")).as("sum_qty"),
            grouping_id().as("gid"))
          .orderBy(
            col("gid"),
            col("l_returnflag").asc_nulls_first,
            col("l_linestatus").asc_nulls_first),
      Some("""SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
             |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
             |  GROUPING(l_returnflag, l_linestatus) AS gid
             |FROM lineitem
             |GROUP BY ROLLUP(l_returnflag, l_linestatus)
             |ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin)),

    // CUBE over two order dimensions.
    QueryDef(
      "a_cube",
      (s, d) =>
        Tables.orders(s, d)
          .cube("o_orderstatus", "o_orderpriority")
          .agg(
            count(lit(1)).as("n"),
            dsum(col("o_totalprice")).as("sum_price"),
            grouping_id().as("gid"))
          .orderBy(
            col("gid"),
            col("o_orderstatus").asc_nulls_first,
            col("o_orderpriority").asc_nulls_first),
      Some("""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
             |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
             |  GROUPING(o_orderstatus, o_orderpriority) AS gid
             |FROM orders
             |GROUP BY CUBE(o_orderstatus, o_orderpriority)
             |ORDER BY gid, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin)),

    // Explicit GROUPING SETS ((status),(priority),()).
    QueryDef(
      "a_grouping_sets",
      (s, d) => {
        Tables.orders(s, d).createOrReplaceTempView("gs_orders")
        s.sql(
          """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
            |  GROUPING_ID() AS gid
            |FROM gs_orders
            |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
            |ORDER BY gid, o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST
            |""".stripMargin)
      },
      Some("""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
             |  GROUPING(o_orderstatus, o_orderpriority) AS gid
             |FROM orders
             |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
             |ORDER BY gid, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin)),

    // COUNT(DISTINCT) per group (expand+two-phase agg in Catalyst).
    QueryDef(
      "a_count_distinct",
      (s, d) =>
        Tables.lineitem(s, d)
          .groupBy("l_returnflag")
          .agg(
            countDistinct(col("l_suppkey")).as("n_supp"),
            countDistinct(col("l_partkey")).as("n_part"),
            count(lit(1)).as("n"))
          .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag, COUNT(DISTINCT l_suppkey) AS n_supp,
             |  COUNT(DISTINCT l_partkey) AS n_part, COUNT(*) AS n
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // HLL++ approx distinct — sketch values are engine-specific, so no SQL
    // oracle (driver rows-only check); exactness bound covered in ScalaTest.
    QueryDef(
      "a_approx_distinct",
      (s, d) =>
        Tables.lineitem(s, d)
          .groupBy("l_returnflag")
          .agg(approx_count_distinct(col("l_partkey"), 0.01).as("approx_parts"))
          .orderBy("l_returnflag"),
      None),

    // argmin/argmax (A3/A4 semantics): first/last event id per type by time.
    // The ordering key is (ts, event_id) — a TOTAL order — not bare ts:
    // driver data happens to have unique ts, but any scaled/replicated
    // corpus has timestamp ties and bare min_by/max_by would be
    // nondeterministic across engines (caught by the 10× sweep).
    QueryDef(
      "a_argmin_argmax",
      (s, d) => {
        // exact 128-bit composite: micros·10¹⁰ + event_id (DuckDB arg_min
        // takes no struct keys; DECIMAL(38,0)/HUGEINT carry it exactly)
        val key = unix_micros(col("ts")).cast("decimal(38,0)") *
          lit(10000000000L) + col("event_id")
        Tables.events(s, d)
          .groupBy("event_type")
          .agg(
            min_by(col("event_id"), key).as("first_event"),
            max_by(col("event_id"), key).as("last_event"),
            count(lit(1)).as("n"))
          .orderBy("event_type")
      },
      Some("""SELECT event_type,
             |  arg_min(event_id, epoch_us(ts)::HUGEINT * 10000000000 + event_id)
             |    AS first_event,
             |  arg_max(event_id, epoch_us(ts)::HUGEINT * 10000000000 + event_id)
             |    AS last_event,
             |  COUNT(*) AS n
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // Exact moment statistics: avg + sample stddev from DECIMAL sums; the only
    // double math is the identical final scalar expression on both engines.
    QueryDef(
      "a_stats_exact",
      (s, d) => {
        val q = dec(col("l_quantity"))
        Tables.lineitem(s, d)
          .groupBy("l_returnflag")
          .agg(
            count(lit(1)).as("n"),
            sum(q).cast("double").as("s"),
            sum(q * q).cast("double").as("ss"))
          .select(
            col("l_returnflag"), col("n"),
            (col("s") / col("n")).as("avg_qty"),
            sqrt((col("ss") - col("s") * col("s") / col("n")) / (col("n") - 1))
              .as("stddev_qty"))
          .orderBy("l_returnflag")
      },
      Some("""SELECT l_returnflag, n, s / n AS avg_qty,
             |  sqrt((ss - s * s / n) / (n - 1)) AS stddev_qty
             |FROM (SELECT l_returnflag, COUNT(*) AS n,
             |        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS s,
             |        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))
             |                 * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS ss
             |      FROM lineitem GROUP BY l_returnflag)
             |ORDER BY l_returnflag""".stripMargin)),

    // Exact interpolated percentiles (Spark percentile ≡ DuckDB
    // quantile_cont: sorted linear interpolation; rounded for libm parity).
    QueryDef(
      "a_percentiles",
      (s, d) =>
        Tables.lineitem(s, d)
          .groupBy("l_returnflag")
          .agg(
            round(expr("percentile(l_quantity, 0.5)"), 6).as("p50"),
            round(expr("percentile(l_quantity, 0.9)"), 6).as("p90"),
            round(expr("percentile(l_extendedprice, 0.99)"), 6).as("price_p99"))
          .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag,
             |  round(quantile_cont(l_quantity, 0.5), 6) AS p50,
             |  round(quantile_cont(l_quantity, 0.9), 6) AS p90,
             |  round(quantile_cont(l_extendedprice, 0.99), 6) AS price_p99
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // Collection aggregates: collect_list/collect_set are unordered in a
    // distributed group-by, so results are sorted before comparison (the
    // only deterministic contract). Array outputs are serialized to CSV
    // strings — the driver's pandas compare sorts every column and cannot
    // hash array cells.
    QueryDef(
      "a_collect_agg",
      (s, d) =>
        Tables.nation(s, d)
          .groupBy("n_regionkey")
          .agg(
            concat_ws(",", sort_array(collect_list(col("n_name")))).as("names"),
            concat_ws(",",
              transform(sort_array(collect_set(col("n_nationkey") % 3)),
                _.cast("string"))).as("mods"),
            concat_ws(",", sort_array(collect_list(col("n_name")))).as("csv"))
          .orderBy("n_regionkey"),
      Some("""SELECT n_regionkey,
             |  array_to_string(list_sort(list(n_name)), ',') AS names,
             |  array_to_string(list_sort(list(DISTINCT n_nationkey % 3)), ',') AS mods,
             |  string_agg(n_name, ',' ORDER BY n_name) AS csv
             |FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin)),

    // Bitwise aggregates (exact integer semantics).
    QueryDef(
      "a_bitwise_agg",
      (s, d) =>
        Tables.lineitem(s, d)
          .groupBy("l_returnflag")
          .agg(
            bit_and(col("l_linenumber")).as("band"),
            bit_or(col("l_linenumber")).as("bor"),
            bit_xor(col("l_suppkey")).as("bxor"))
          .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag,
             |  bit_and(l_linenumber) AS band,
             |  bit_or(l_linenumber) AS bor,
             |  bit_xor(l_suppkey) AS bxor
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // Exact-moment correlation: all sums in DECIMAL (exact), the final
    // scalar formula identical on both engines — the same construction as
    // a_stats_exact, extended to two variables.
    QueryDef(
      "a_corr_exact",
      (s, d) => {
        val x = dec(col("l_quantity"))
        val y = dec(col("l_extendedprice"))
        Tables.lineitem(s, d)
          .groupBy("l_returnflag")
          .agg(
            count(lit(1)).as("n"),
            sum(x).cast("double").as("sx"),
            sum(y).cast("double").as("sy"),
            sum(x * x).cast("double").as("sxx"),
            sum(y * y).cast("double").as("syy"),
            sum(x * y).cast("double").as("sxy"))
          .select(col("l_returnflag"), col("n"),
            round(
              (col("n") * col("sxy") - col("sx") * col("sy")) /
                (sqrt(col("n") * col("sxx") - col("sx") * col("sx")) *
                  sqrt(col("n") * col("syy") - col("sy") * col("sy"))), 6)
              .as("corr_qty_price"))
          .orderBy("l_returnflag")
      },
      Some("""SELECT l_returnflag, n,
             |  round((n * sxy - sx * sy)
             |        / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 6)
             |    AS corr_qty_price
             |FROM (SELECT l_returnflag, COUNT(*) AS n,
             |        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) sx,
             |        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) sy,
             |        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))
             |                 * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) sxx,
             |        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
             |                 * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) syy,
             |        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))
             |                 * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) sxy
             |      FROM lineitem GROUP BY l_returnflag)
             |ORDER BY l_returnflag""".stripMargin)),

    // Global top-k → TakeOrderedAndProject (no full sort, no single-partition
    // shuffle: per-partition heaps + driver merge of k rows).
    QueryDef(
      "a_topk_orders",
      (s, d) =>
        Tables.orders(s, d)
          .select("o_orderkey", "o_custkey", "o_totalprice")
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
          .limit(20),
      Some("""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
             |ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""".stripMargin))
  )
}
