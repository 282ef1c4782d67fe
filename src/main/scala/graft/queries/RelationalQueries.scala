package graft.queries

import graft.{QueryDef, QueryGroup, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Relational surface: projections, filters, joins, aggregations (SURVEY.md §2.1
  * rows P1-P5, J1/J5, A1/A2/A6).
  *
  * The flagship j1 is the isomorphic form of the reference's one real query
  * (`get_urllist`, mysql_process.py:64-81): a 3-way equi join with an IN-list +
  * equality filters and a 2-column projection, exercised over the driver lake as
  * orders ⋈ lineitem ⋈ part (FIXTURES.md §A).
  *
  * Scale notes (100 TB): dimension sides (part, orders-filtered) are broadcast
  * where small; fact-fact joins shuffle on the join key only after filters are
  * pushed to the parquet scan. Float aggregates run over DECIMAL(18,2) casts so
  * the sum is exact and associative — identical under any partitioning / shuffle
  * order (and identical to the DuckDB oracle) — then surfaced as double.
  */
object RelationalQueries extends QueryGroup {

  /** sum(double) made order-independent: exact decimal accumulate, double out.
    * Only SOURCE columns are cast (their values are exact ≤2dp decimals); casting
    * a computed double would round differently in Spark (HALF_UP on shortest
    * repr) vs DuckDB (scaled rint) — arithmetic stays in decimal domain instead. */
  private def dsum(c: org.apache.spark.sql.Column) =
    sum(c.cast(DecimalType(18, 2))).cast("double")

  private def dec(c: org.apache.spark.sql.Column) = c.cast(DecimalType(18, 2))

  val defs: Seq[QueryDef] = Seq(

    // J1 — flagship lineage query (mysql_process.py:64-81 isomorphism).
    // PROC_EJECUCION ⋈ DETALLE ⋈ CATALOG ≅ orders ⋈ lineitem ⋈ part.
    QueryDef(
      "j1_lineage_join",
      (s, d) => {
        val o = Tables.orders(s, d).filter(col("o_orderstatus") === "F")
        val l = Tables.lineitem(s, d)
          .filter(col("l_returnflag").isin("R", "A"))
        val p = Tables.part(s, d).filter(col("p_brand") === "Brand#10")
        o.join(l, o("o_orderkey") === l("l_orderkey"))
          .join(broadcast(p), l("l_partkey") === p("p_partkey"))
          .select(
            l("l_orderkey").as("id"),
            l("l_linenumber").as("lineno"),
            p("p_name").as("ruta"))
          .orderBy("id", "lineno", "ruta")
      },
      Some("""SELECT l.l_orderkey AS id, l.l_linenumber AS lineno, p.p_name AS ruta
             |FROM orders o
             |JOIN lineitem l ON o.o_orderkey = l.l_orderkey
             |JOIN part p ON l.l_partkey = p.p_partkey
             |WHERE o.o_orderstatus = 'F' AND l.l_returnflag IN ('R','A')
             |  AND p.p_brand = 'Brand#10'
             |ORDER BY id, lineno, ruta""".stripMargin)),

    // P1-P3 + LIKE/regex — projection, IN-list, equality, compound AND, rlike.
    QueryDef(
      "p_filter_predicates",
      (s, d) =>
        Tables.part(s, d)
          .filter(
            col("p_type").isin("PROMO", "ECONOMY") &&
              col("p_size") >= 10 &&
              col("p_name").like("%widget%") &&
              col("p_brand").rlike("^Brand#1[0-9]$"))
          .select("p_partkey", "p_name", "p_brand", "p_type", "p_size")
          .orderBy("p_partkey"),
      Some("""SELECT p_partkey, p_name, p_brand, p_type, p_size
             |FROM part
             |WHERE p_type IN ('PROMO','ECONOMY') AND p_size >= 10
             |  AND p_name LIKE '%widget%'
             |  AND regexp_matches(p_brand, '^Brand#1[0-9]$')
             |ORDER BY p_partkey""".stripMargin)),

    // A6 — grouped hash agg, partial+final (TPC-H Q1 shape) with exact sums.
    QueryDef(
      "a6_group_agg",
      (s, d) =>
        Tables.lineitem(s, d)
          .filter(col("l_shipdate") < lit("1999-01-01").cast("timestamp"))
          .groupBy("l_returnflag", "l_linestatus")
          .agg(
            dsum(col("l_quantity")).as("sum_qty"),
            dsum(col("l_extendedprice")).as("sum_price"),
            sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
              .cast("double").as("sum_disc_price"),
            count(lit(1)).as("n"),
            (dsum(col("l_quantity")) / count(lit(1))).as("avg_qty"))
          .orderBy("l_returnflag", "l_linestatus"),
      Some("""SELECT l_returnflag, l_linestatus,
             |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
             |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
             |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
             |  COUNT(*) AS n,
             |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty
             |FROM lineitem
             |WHERE l_shipdate < TIMESTAMP '1999-01-01'
             |GROUP BY l_returnflag, l_linestatus
             |ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    // A1 — max-key agg replacing the reference's racy AUTO_INCREMENT read
    // (mysql_process.py:13-25): next surrogate key = max(ID)+1.
    QueryDef(
      "a1_max_key",
      (s, d) =>
        Tables.orders(s, d)
          .agg((coalesce(max(col("o_orderkey")), lit(0L)) + 1L).as("next_id")),
      Some("SELECT COALESCE(MAX(o_orderkey), 0) + 1 AS next_id FROM orders")),

    // A2 — composite-key distinct (unique_places, script_geo.py:71-77) with the
    // F1 concat_ws composite key (script_geo.py:75).
    QueryDef(
      "a2_distinct_composite_key",
      (s, d) =>
        Tables.orders(s, d)
          .select(
            concat_ws("_", col("o_orderstatus"), col("o_orderpriority"))
              .as("composite_key"))
          .distinct()
          .orderBy("composite_key"),
      Some("""SELECT DISTINCT o_orderstatus || '_' || o_orderpriority AS composite_key
             |FROM orders ORDER BY composite_key""".stripMargin)),

    // J5 — left-anti join: ingest idempotence (skip already-cataloged rows;
    // engine addition vs the reference's blind re-insert, script_geo.py:205).
    QueryDef(
      "j5_anti_idempotence",
      (s, d) => {
        val c = Tables.customer(s, d)
        val o = Tables.orders(s, d).filter(col("o_orderstatus") === "P")
        c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
          .select("c_custkey", "c_name")
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey, c_name FROM customer c
             |WHERE NOT EXISTS (SELECT 1 FROM orders o
             |                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P')
             |ORDER BY c_custkey""".stripMargin)),

    // J5b — left-semi join (EXISTS).
    QueryDef(
      "j5_semi_join",
      (s, d) => {
        val c = Tables.customer(s, d)
        val o = Tables.orders(s, d).filter(col("o_totalprice") > 100000.0)
        c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
          .select("c_custkey", "c_mktsegment")
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey, c_mktsegment FROM customer c
             |WHERE EXISTS (SELECT 1 FROM orders o
             |              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 100000.0)
             |ORDER BY c_custkey""".stripMargin)),

    // Outer joins — left outer with null-producing side, null-safe ordering.
    QueryDef(
      "j_outer_left",
      (s, d) => {
        val n = Tables.nation(s, d)
        val sup = Tables.supplier(s, d)
        n.join(sup, n("n_nationkey") === sup("s_nationkey"), "left")
          .groupBy(n("n_name").as("n_name"))
          .agg(count(sup("s_suppkey")).as("n_suppliers"))
          .orderBy("n_name")
      },
      Some("""SELECT n.n_name AS n_name, COUNT(s.s_suppkey) AS n_suppliers
             |FROM nation n LEFT JOIN supplier s ON n.n_nationkey = s.s_nationkey
             |GROUP BY n.n_name ORDER BY n_name""".stripMargin)),

    // Full outer join with null-completing sides: suppliers vs customers
    // per nation (nations can lack either side at small SF).
    QueryDef(
      "j_outer_full",
      (s, d) => {
        val sup = Tables.supplier(s, d).groupBy(col("s_nationkey").as("nk"))
          .agg(count(lit(1)).as("n_supp"))
        val cust = Tables.customer(s, d).filter(col("c_acctbal") > 9000.0)
          .groupBy(col("c_nationkey").as("nk"))
          .agg(count(lit(1)).as("n_cust"))
        sup.join(cust, Seq("nk"), "full")
          .select(col("nk"),
            coalesce(col("n_supp"), lit(0L)).as("n_supp"),
            coalesce(col("n_cust"), lit(0L)).as("n_cust"))
          .orderBy("nk")
      },
      Some("""SELECT COALESCE(s.nk, c.nk) AS nk,
             |  COALESCE(n_supp, 0) AS n_supp, COALESCE(n_cust, 0) AS n_cust
             |FROM (SELECT s_nationkey AS nk, COUNT(*) AS n_supp
             |      FROM supplier GROUP BY 1) s
             |FULL OUTER JOIN (SELECT c_nationkey AS nk, COUNT(*) AS n_cust
             |      FROM customer WHERE c_acctbal > 9000.0 GROUP BY 1) c
             |  USING (nk)
             |ORDER BY nk""".stripMargin)),

    // Right outer join (dim side preserved).
    QueryDef(
      "j_outer_right",
      (s, d) => {
        val o = Tables.orders(s, d).filter(col("o_totalprice") > 450000.0)
        val c = Tables.customer(s, d)
        o.join(c, o("o_custkey") === c("c_custkey"), "right")
          .groupBy(col("c_mktsegment"))
          .agg(count(o("o_orderkey")).as("n_big_orders"), count(lit(1)).as("n_rows"))
          .orderBy("c_mktsegment")
      },
      Some("""SELECT c_mktsegment, COUNT(o_orderkey) AS n_big_orders, COUNT(*) AS n_rows
             |FROM (SELECT * FROM orders WHERE o_totalprice > 450000.0) o
             |RIGHT JOIN customer c ON o.o_custkey = c.c_custkey
             |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)),

    // Broadcast dim join chain: region → nation → customer rollup.
    QueryDef(
      "j_broadcast_dims",
      (s, d) => {
        val r = Tables.region(s, d)
        val n = Tables.nation(s, d)
        val c = Tables.customer(s, d)
        c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
          .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
          .groupBy(col("r_name"))
          .agg(
            count(lit(1)).as("n_customers"),
            dsum(col("c_acctbal")).as("sum_acctbal"))
          .orderBy("r_name")
      },
      Some("""SELECT r_name,
             |  COUNT(*) AS n_customers,
             |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_acctbal
             |FROM customer c
             |JOIN nation n ON c.c_nationkey = n.n_nationkey
             |JOIN region r ON n.n_regionkey = r.r_regionkey
             |GROUP BY r_name ORDER BY r_name""".stripMargin)),

    // Explicit runtime-filter semi join: bloom-prefilter the fact scan on
    // the dimension keys before the shuffle, then exact semi join — result
    // identical to the plain semi join (bloom only removes guaranteed
    // non-matches), shuffle volume cut by the dimension's selectivity.
    QueryDef(
      "x_bloom_semi_join",
      (s, d) => {
        val building = Tables.customer(s, d)
          .filter(col("c_mktsegment") === "BUILDING")
        graft.ops.RuntimeFilter.bloomSemiJoin(
            Tables.orders(s, d), building, "o_custkey", "c_custkey",
            expectedItems = 100000L, fpp = 0.01)
          .select(col("o_orderkey"))
          .orderBy("o_orderkey")
      },
      Some("""SELECT o_orderkey FROM orders
             |WHERE o_custkey IN
             |  (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
             |ORDER BY o_orderkey""".stripMargin))
  )
}
