package graft

/** Harness-contract smoke: entry() yields rows; every registered query runs on
  * sf0.001 and each declared oracle key exists in queries. Value-level
  * correctness is enforced by the DuckDB harness (tools/validate.py / driver t2);
  * operator-level semantics get their own suites.
  */
class EntrySmokeSpec extends GraftSuite {

  test("entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql keys are a subset of queries") {
    val qs = SparkEntry.queries.keySet
    val orphans = SparkEntry.oracleSql.keySet -- qs
    assert(orphans.isEmpty, s"oracle without query: $orphans")
  }

  for ((name, fn) <- SparkEntry.queries) {
    test(s"query $name executes on sf0.001") {
      val df = fn(spark, sf)
      assert(df.columns.nonEmpty)
      df.count() // force full execution
    }
  }
}
