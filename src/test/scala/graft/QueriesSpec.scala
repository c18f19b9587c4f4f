package graft

/** Smoke-level spec: every registered query runs at sf0.001, yields rows,
  * and every oracle key maps to a registered query. Value-level
  * correctness is checked against DuckDB by scripts/oracle_check.py
  * (and the driver's own Verify pass).
  */
class QueriesSpec extends SparkSpec {

  test("every oracle key has a query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("entry smoke returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"$name runs and returns rows at sf0.001") {
      val df = fn(spark, sfDir)
      assert(df.columns.nonEmpty)
      assert(df.count() > 0, s"$name returned 0 rows")
    }
  }
}
