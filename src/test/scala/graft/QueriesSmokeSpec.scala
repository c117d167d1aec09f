package graft

/** Every registered query runs and returns rows at sf0.001, and every
  * oracle key refers to a real query — the structural contract the
  * driver's rows-only check relies on.
  */
class QueriesSmokeSpec extends SparkSpecBase {
  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query is non-empty at sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf("sf0.001")).count()
      assert(n > 0, s"$name returned 0 rows")
    }
  }

  test("approx_count_distinct stays within HLL++ error bounds") {
    val r = SparkEntry.queries("q47_approx_distinct")(spark, sf("sf0.01")).head
    def relErr(exact: Long, approx: Long) = math.abs(approx - exact).toDouble / exact
    assert(relErr(r.getLong(0), r.getLong(1)) < 0.1, "parts estimate off")
    assert(relErr(r.getLong(2), r.getLong(3)) < 0.1, "orders estimate off")
  }

  test("every oracle key has a query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }
}
