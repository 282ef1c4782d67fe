package graft.queries

import graft.{QueryDef, QueryGroup, Tables}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** SQL-surface breadth: subqueries (scalar / EXISTS / IN — Catalyst
  * decorrelates, SURVEY §4), multi-CTE composition, pivot, map functions,
  * a TPC-H-style revenue top-k, and the typed Dataset API (Encoders).
  * `spark.sql` over temp views exercises the parser→analyzer path of the
  * engine; everything else stays in the DataFrame DSL.
  */
object SqlQueries extends QueryGroup {

  private def dec(c: org.apache.spark.sql.Column) = c.cast(DecimalType(18, 2))

  private def view(s: SparkSession, d: String, name: String): Unit =
    Tables.t(s, d, name).createOrReplaceTempView(name)

  val defs: Seq[QueryDef] = Seq(

    // Scalar subquery: orders above the global average price (exact decimal
    // average, identical scalar math on both engines).
    QueryDef(
      "q_scalar_subquery",
      (s, d) => {
        view(s, d, "orders")
        s.sql("""SELECT o_orderkey, o_totalprice FROM orders
                |WHERE o_totalprice > (
                |  SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                |         / COUNT(*) FROM orders)
                |ORDER BY o_orderkey""".stripMargin)
      },
      Some("""SELECT o_orderkey, o_totalprice FROM orders
             |WHERE o_totalprice > (
             |  SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             |         / COUNT(*) FROM orders)
             |ORDER BY o_orderkey""".stripMargin)),

    // Correlated EXISTS — decorrelated into a semi join by Catalyst.
    QueryDef(
      "q_correlated_exists",
      (s, d) => {
        view(s, d, "orders"); view(s, d, "customer")
        s.sql("""SELECT c_custkey, c_name FROM customer c
                |WHERE EXISTS (SELECT 1 FROM orders o
                |              WHERE o.o_custkey = c.c_custkey
                |                AND o.o_totalprice > 300000.0)
                |ORDER BY c_custkey""".stripMargin)
      },
      Some("""SELECT c_custkey, c_name FROM customer c
             |WHERE EXISTS (SELECT 1 FROM orders o
             |              WHERE o.o_custkey = c.c_custkey
             |                AND o.o_totalprice > 300000.0)
             |ORDER BY c_custkey""".stripMargin)),

    // IN subquery over a filtered dimension.
    QueryDef(
      "q_in_subquery",
      (s, d) => {
        view(s, d, "lineitem"); view(s, d, "part")
        s.sql("""SELECT l_returnflag, COUNT(*) AS n FROM lineitem
                |WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size > 45)
                |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
      },
      Some("""SELECT l_returnflag, COUNT(*) AS n FROM lineitem
             |WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size > 45)
             |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // Multi-CTE composition.
    QueryDef(
      "q_cte_chain",
      (s, d) => {
        view(s, d, "orders"); view(s, d, "customer")
        s.sql("""WITH big AS (
                |  SELECT o_custkey, COUNT(*) AS n_big FROM orders
                |  WHERE o_totalprice > 200000.0 GROUP BY o_custkey),
                |seg AS (SELECT c_custkey, c_mktsegment FROM customer)
                |SELECT seg.c_mktsegment, CAST(SUM(big.n_big) AS BIGINT) AS total_big
                |FROM big JOIN seg ON big.o_custkey = seg.c_custkey
                |GROUP BY seg.c_mktsegment ORDER BY c_mktsegment""".stripMargin)
      },
      // CAST AS BIGINT on both sides: DuckDB's SUM(BIGINT) yields HUGEINT,
      // which hash-mismatches Spark's int64 even when values agree.
      Some("""WITH big AS (
             |  SELECT o_custkey, COUNT(*) AS n_big FROM orders
             |  WHERE o_totalprice > 200000.0 GROUP BY o_custkey),
             |seg AS (SELECT c_custkey, c_mktsegment FROM customer)
             |SELECT seg.c_mktsegment, CAST(SUM(big.n_big) AS BIGINT) AS total_big
             |FROM big JOIN seg ON big.o_custkey = seg.c_custkey
             |GROUP BY seg.c_mktsegment ORDER BY c_mktsegment""".stripMargin)),

    // RECURSIVE CTE (SQL:1999 WITH RECURSIVE, Spark 4's UnionLoop
    // execution): iterative ancestor-chain traversal — each selected
    // order walks its orderkey through repeated integer halving until 0,
    // the textbook hierarchy-walk shape (parent = floor(key/2)) with a
    // data-dependent, per-row recursion depth no static unrolling could
    // express. Depth is O(log2 key) so the recursion terminates at ~23
    // levels even at sf1; the deterministic orderkey % 97 sample keeps
    // the root set SF-proportional but bounded (a full-corpus walk would
    // trip Spark's recursion row-limit guard by design, not by accident).
    // FLOOR(cur/2.0) instead of integer division: Spark's BIGINT `/`
    // truncates while DuckDB's `/` is a DOUBLE divide — floor-of-double
    // is the one rendering both engines agree on exactly (keys < 2^52).
    QueryDef(
      "q_recursive_cte",
      (s, d) => {
        view(s, d, "orders")
        s.sql("""WITH RECURSIVE chain AS (
                |  SELECT o_orderkey AS root, o_orderkey AS cur, 0 AS depth
                |  FROM orders
                |  WHERE o_totalprice > 300000.0 AND o_orderkey % 97 = 1
                |  UNION ALL
                |  SELECT root, CAST(FLOOR(cur / 2.0) AS BIGINT), depth + 1
                |  FROM chain WHERE cur > 0
                |)
                |SELECT root, CAST(MAX(depth) AS BIGINT) AS chain_len,
                |       CAST(SUM(cur) AS BIGINT) AS key_path_sum
                |FROM chain GROUP BY root ORDER BY root""".stripMargin)
      },
      Some("""WITH RECURSIVE chain AS (
             |  SELECT o_orderkey AS root, o_orderkey AS cur, 0 AS depth
             |  FROM orders
             |  WHERE o_totalprice > 300000.0 AND o_orderkey % 97 = 1
             |  UNION ALL
             |  SELECT root, CAST(FLOOR(cur / 2.0) AS BIGINT), depth + 1
             |  FROM chain WHERE cur > 0
             |)
             |SELECT root, CAST(MAX(depth) AS BIGINT) AS chain_len,
             |       CAST(SUM(cur) AS BIGINT) AS key_path_sum
             |FROM chain GROUP BY root ORDER BY root""".stripMargin)),

    // LATERAL correlated subquery (per-group top-N without a window
    // function): for every nation, the top-2 customers by balance — the
    // lateral subquery re-executes per outer row with its correlation
    // pushed into the inner sort+limit. Catalyst decorrelates this into
    // a ranked join; DuckDB runs the same SQL natively. Ties break on
    // the unique c_name so the result is total-ordered on both engines.
    QueryDef(
      "q_lateral_topn",
      (s, d) => {
        view(s, d, "nation"); view(s, d, "customer")
        s.sql("""SELECT n.n_name, t.c_name, t.c_acctbal
                |FROM nation n, LATERAL (
                |  SELECT c_name, c_acctbal FROM customer c
                |  WHERE c.c_nationkey = n.n_nationkey
                |  ORDER BY c_acctbal DESC, c_name LIMIT 2
                |) t
                |ORDER BY n_name, c_acctbal DESC, c_name""".stripMargin)
      },
      Some("""SELECT n.n_name, t.c_name, t.c_acctbal
             |FROM nation n, LATERAL (
             |  SELECT c_name, c_acctbal FROM customer c
             |  WHERE c.c_nationkey = n.n_nationkey
             |  ORDER BY c_acctbal DESC, c_name LIMIT 2
             |) t
             |ORDER BY n_name, c_acctbal DESC, c_name""".stripMargin)),

    // Pivot: priority columns per status (fixed value list → stable schema;
    // coalesce(0) because pivot yields null for empty cells).
    QueryDef(
      "a_pivot",
      (s, d) => {
        val prios = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
        val p = Tables.orders(s, d)
          .groupBy("o_orderstatus")
          .pivot("o_orderpriority", prios)
          .count()
        p.select(col("o_orderstatus") +:
          prios.map(n => coalesce(col(s"`$n`"), lit(0L)).as(n)): _*)
          .orderBy("o_orderstatus")
      },
      Some("""SELECT o_orderstatus,
             |  COUNT(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 END) AS "1-URGENT",
             |  COUNT(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 END) AS "2-HIGH",
             |  COUNT(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 END) AS "3-MEDIUM",
             |  COUNT(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 1 END)
             |    AS "4-NOT SPECIFIED",
             |  COUNT(CASE WHEN o_orderpriority = '5-LOW' THEN 1 END) AS "5-LOW"
             |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)),

    // UNPIVOT (melt) — the inverse of a_pivot: wide metric columns fold
    // into (metric, value) rows via Dataset.unpivot (Spark 3.4's melt);
    // DuckDB runs its native UNPIVOT. Both engines emit the source
    // column NAME as the metric, so the rendering is structural.
    QueryDef(
      "q_unpivot",
      (s, d) =>
        Tables.part(s, d)
          .filter(col("p_partkey") <= 50000)
          .select(col("p_partkey"),
            col("p_size").cast("double").as("p_size"),
            col("p_retailprice"))
          .unpivot(Array(col("p_partkey")),
            Array(col("p_size"), col("p_retailprice")), "metric", "value")
          .orderBy("p_partkey", "metric"),
      Some("""SELECT p_partkey, metric, value FROM (
             |  UNPIVOT (SELECT p_partkey, CAST(p_size AS DOUBLE) AS p_size,
             |                  p_retailprice
             |           FROM part WHERE p_partkey <= 50000)
             |  ON p_size, p_retailprice INTO NAME metric VALUE value)
             |ORDER BY p_partkey, metric""".stripMargin)),

    // Map functions: construct, extract, keys (§2.2 map row — surface).
    QueryDef(
      "f_map_battery",
      (s, d) =>
        Tables.nation(s, d)
          .select(
            col("n_nationkey"),
            map_from_arrays(
              array(lit("nation"), lit("region")),
              array(col("n_nationkey").cast("long"), col("n_regionkey").cast("long")))
              .as("m"))
          .select(
            col("n_nationkey"),
            element_at(col("m"), "nation").as("v_nation"),
            element_at(col("m"), "region").as("v_region"),
            // Stringified: the driver's pandas compare sorts every output
            // column and can't hash numpy arrays — keep outputs scalar.
            concat_ws(",", map_keys(col("m"))).as("ks"),
            size(map_values(col("m"))).as("n_vals"))
          .orderBy("n_nationkey"),
      Some("""SELECT n_nationkey,
             |  (map(['nation','region'],
             |       [CAST(n_nationkey AS BIGINT), CAST(n_regionkey AS BIGINT)])['nation'])[1]
             |    AS v_nation,
             |  (map(['nation','region'],
             |       [CAST(n_nationkey AS BIGINT), CAST(n_regionkey AS BIGINT)])['region'])[1]
             |    AS v_region,
             |  'nation,region' AS ks,
             |  2 AS n_vals
             |FROM nation ORDER BY n_nationkey""".stripMargin)),

    // TPC-H Q3-shaped revenue top-k (decimal-exact revenue).
    QueryDef(
      "q_revenue_topk",
      (s, d) => {
        val c = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
        val o = Tables.orders(s, d)
          .filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
        val l = Tables.lineitem(s, d)
          .filter(col("l_shipdate") > lit("1998-01-01").cast("timestamp"))
        c.join(o, c("c_custkey") === o("o_custkey"))
          .join(l, o("o_orderkey") === l("l_orderkey"))
          .groupBy(l("l_orderkey").as("okey"), o("o_orderdate").cast("date").as("odate"))
          .agg(sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
            .cast("double").as("revenue"))
          .orderBy(col("revenue").desc, col("okey"))
          .limit(10)
      },
      Some("""SELECT l.l_orderkey AS okey, CAST(o.o_orderdate AS DATE) AS odate,
             |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
             |           * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
             |FROM customer c
             |JOIN orders o ON c.c_custkey = o.o_custkey
             |JOIN lineitem l ON o.o_orderkey = l.l_orderkey
             |WHERE c.c_mktsegment = 'BUILDING'
             |  AND o.o_orderdate < TIMESTAMP '1998-01-01'
             |  AND l.l_shipdate > TIMESTAMP '1998-01-01'
             |GROUP BY 1, 2
             |ORDER BY revenue DESC, okey LIMIT 10""".stripMargin)),

    // TPC-H Q6-shaped forecast-revenue filter-aggregate (pure scan+filter —
    // the pushdown showcase: all three predicates reach the parquet scan).
    QueryDef(
      "q_forecast_revenue",
      (s, d) =>
        Tables.lineitem(s, d)
          .filter(
            col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
              col("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
              col("l_discount").between(0.02, 0.06) &&
              col("l_quantity") < 24)
          .agg(
            sum(dec(col("l_extendedprice")) * dec(col("l_discount")))
              .cast("double").as("revenue"),
            count(lit(1)).as("n")),
      Some("""SELECT
             |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
             |           * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
             |  COUNT(*) AS n
             |FROM lineitem
             |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
             |  AND l_shipdate < TIMESTAMP '1998-01-01'
             |  AND l_discount BETWEEN 0.02 AND 0.06
             |  AND l_quantity < 24""".stripMargin)),

    // TPC-H Q5-shaped 6-table join: regional revenue through the full
    // dim chain with the local-supplier equality (c_nationkey = s_nationkey).
    QueryDef(
      "q_regional_revenue",
      (s, d) => {
        val c = Tables.customer(s, d)
        val o = Tables.orders(s, d)
        val l = Tables.lineitem(s, d)
        val sup = Tables.supplier(s, d)
        val n = Tables.nation(s, d)
        val r = Tables.region(s, d)
        c.join(o, c("c_custkey") === o("o_custkey"))
          .join(l, o("o_orderkey") === l("l_orderkey"))
          .join(sup, l("l_suppkey") === sup("s_suppkey")
            && c("c_nationkey") === sup("s_nationkey"))
          .join(broadcast(n), sup("s_nationkey") === n("n_nationkey"))
          .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
          .groupBy(col("r_name"), col("n_name"))
          .agg(sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
            .cast("double").as("revenue"),
            count(lit(1)).as("n_items"))
          .orderBy("r_name", "n_name")
      },
      Some("""SELECT r_name, n_name,
             |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
             |           * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
             |  COUNT(*) AS n_items
             |FROM customer c
             |JOIN orders o ON c.c_custkey = o.o_custkey
             |JOIN lineitem l ON o.o_orderkey = l.l_orderkey
             |JOIN supplier s ON l.l_suppkey = s.s_suppkey
             |              AND c.c_nationkey = s.s_nationkey
             |JOIN nation n ON s.s_nationkey = n.n_nationkey
             |JOIN region r ON n.n_regionkey = r.r_regionkey
             |GROUP BY r_name, n_name
             |ORDER BY r_name, n_name""".stripMargin)),

    // Typed Dataset API: case-class Encoders, typed filter + groupByKey.
    QueryDef(
      "t_typed_dataset",
      (s, d) => {
        import s.implicits._
        val ds = Tables.lineitem(s, d)
          .select("l_orderkey", "l_returnflag", "l_quantity")
          .as[graft.model.LineitemSlim]
        ds.filter(_.l_quantity > 45.0)
          .groupByKey(_.l_returnflag)
          .count()
          .toDF("l_returnflag", "n")
          .orderBy("l_returnflag")
      },
      Some("""SELECT l_returnflag, COUNT(*) AS n FROM lineitem
             |WHERE l_quantity > 45.0
             |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin))
  )
}
