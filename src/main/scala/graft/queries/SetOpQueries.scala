package graft.queries

import graft.{QueryDef, QueryGroup, Tables}
import org.apache.spark.sql.functions._

/** Set operations (SURVEY.md §2.2 "set ops": the reference unions artifact-dir
  * scans, G2/download_list_images.py:84-86; intersect/except are engine surface).
  *
  * Scale: UNION ALL is a zero-shuffle concatenation of children; UNION/
  * INTERSECT/EXCEPT hash-shuffle on the full row — acceptable for key-projected
  * inputs like these (shuffle width = distinct keys, not source rows).
  */
object SetOpQueries extends QueryGroup {

  val defs: Seq[QueryDef] = Seq(

    // UNION (distinct): high-value custkeys from two independent criteria.
    QueryDef(
      "s_union_distinct",
      (s, d) => {
        val a = Tables.orders(s, d)
          .filter(col("o_totalprice") > 250000.0)
          .select(col("o_custkey").as("custkey"))
        val b = Tables.customer(s, d)
          .filter(col("c_acctbal") > 9000.0)
          .select(col("c_custkey").as("custkey"))
        a.union(b).distinct().orderBy("custkey")
      },
      Some("""SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 250000.0
             |UNION
             |SELECT c_custkey FROM customer WHERE c_acctbal > 9000.0
             |ORDER BY custkey""".stripMargin)),

    // UNION ALL by name with reordered columns (unionByName).
    QueryDef(
      "s_union_all_byname",
      (s, d) => {
        val a = Tables.nation(s, d).select(
          col("n_nationkey").as("id"), col("n_name").as("name"),
          lit("nation").as("src"))
        val b = Tables.region(s, d).select(
          lit("region").as("src"), col("r_regionkey").as("id"),
          col("r_name").as("name"))
        a.unionByName(b).orderBy("src", "id")
      },
      Some("""SELECT id, name, src FROM (
             |  SELECT n_nationkey AS id, n_name AS name, 'nation' AS src FROM nation
             |  UNION ALL
             |  SELECT r_regionkey, r_name, 'region' FROM region)
             |ORDER BY src, id""".stripMargin)),

    // INTERSECT: customers active in both order-status populations.
    QueryDef(
      "s_intersect",
      (s, d) => {
        val f = Tables.orders(s, d).filter(col("o_orderstatus") === "F")
          .select(col("o_custkey").as("custkey"))
        val o = Tables.orders(s, d).filter(col("o_orderstatus") === "O")
          .select(col("o_custkey").as("custkey"))
        f.intersect(o).orderBy("custkey")
      },
      Some("""SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
             |INTERSECT
             |SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
             |ORDER BY custkey""".stripMargin)),

    // EXCEPT: customers with no 'P' order (set-op sibling of j5 anti join).
    QueryDef(
      "s_except",
      (s, d) => {
        val all = Tables.customer(s, d).select(col("c_custkey").as("custkey"))
        val p = Tables.orders(s, d).filter(col("o_orderstatus") === "P")
          .select(col("o_custkey").as("custkey"))
        all.except(p).orderBy("custkey")
      },
      Some("""SELECT c_custkey AS custkey FROM customer
             |EXCEPT
             |SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
             |ORDER BY custkey""".stripMargin))
  )
}
