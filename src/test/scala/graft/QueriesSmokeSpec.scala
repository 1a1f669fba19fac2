package graft

/** Every declared query runs and returns rows at sf0.001 (the driver's
  * t1-smoke invariant, applied to the whole surface). */
class QueriesSmokeSpec extends SparkSpec {
  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"$name runs and returns rows at sf0.001") {
      try assert(fn(spark, sf).count() > 0, s"$name returned 0 rows")
      // the driver-harness rule (Verify/Bench do the same): gates cache
      // query-scoped frames, and a leaked cache entry rewrites LATER
      // suites' plans via automatic cache substitution (a cached t42
      // text leg swallowed PlanShapeSpec's t39 rank windows into an
      // InMemoryTableScan — round-9 full-suite failure)
      finally spark.catalog.clearCache()
    }
  }

  test("every oracleSql key has a queries entry") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle without query: $orphans")
  }

  test("every Bench amortized marker names a registered query") {
    // round-9 ADVICE: a typo/rename silently dropped from the marker
    // list would misreport a memo replay as compute cost; Bench.main
    // only warns (a crash there would cost the bench artifact) — the
    // structural failure lives here
    val stale = Bench.amortized.filterNot(SparkEntry.queries.contains)
    assert(stale.isEmpty, s"stale amortized markers: $stale")
  }

  test("entry() returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
