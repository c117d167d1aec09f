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

  test("no registered query plans a CartesianProduct") {
    // a cartesian is O(n²) by construction — a scale-killer no suite
    // query may contain. (BroadcastNestedLoopJoin over an explicitly
    // bounded broadcast side — probe sets, centroid tables — is the
    // intentional cross-join form and stays legal.) The exact all-pairs
    // verifiers (thresholdPairs, single-task union-find) live in specs,
    // not the registry, precisely because of this rule.
    SparkEntry.queries.foreach { case (name, fn) =>
      val plan = fn(spark, sf("sf0.001")).queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"),
        s"$name plans a CartesianProduct:\n${plan.take(3000)}")
    }
  }

  test("portable HLL estimates stay within error bounds on both branches") {
    // columns: exact_parts, exact_orders, hll_parts, hll_orders
    val r = SparkEntry.queries("q47_approx_distinct")(spark, sf("sf0.01")).head
    def relErr(exact: Long, approx: Double) = math.abs(approx - exact) / exact
    // 4096 registers → ~1.04/sqrt(4096) ≈ 1.6% typical error; 10% is a
    // loose determinism-independent sanity bound
    assert(relErr(r.getLong(0), r.getDouble(2)) < 0.1, "parts estimate off")
    assert(relErr(r.getLong(1), r.getDouble(3)) < 0.1, "orders estimate off")
  }

  test("every oracle key has a query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("every query has an oracle (no silent rows-only fallbacks)") {
    // the full surface is hash-verified today; a new query landing
    // without an oracle would silently weaken the correctness gate
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty, s"queries without oracles: $missing")
  }

  test("domain registries are disjoint and cover the extension surface") {
    // ExtensionQueries aggregates the per-domain maps with ++, which
    // silently keeps the LAST binding on a key collision — disjointness
    // is what makes the aggregation order immaterial
    val doms = graft.queries.ExtensionQueries.domains.toSeq
    for {
      Seq((na, (qa, _)), (nb, (qb, _))) <- doms.combinations(2)
    } {
      val overlap = qa.keySet.intersect(qb.keySet)
      assert(overlap.isEmpty, s"domains $na and $nb both register: $overlap")
    }
    doms.foreach { case (n, (q, o)) =>
      assert(q.keySet == o.keySet, s"domain $n query/oracle key mismatch")
    }
    val union = doms.map(_._2._1.keySet).reduce(_ ++ _)
    assert(union == graft.queries.ExtensionQueries.queries.keySet)
  }
}
