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

  test("receipt adjudication: noise / weather / regressed thresholds (synthetic)") {
    import Bench.{adjudicate, parseHistory}
    // noise: warm probe at/below 1.5x the best-ever floor
    assert(adjudicate(0.31, 0.40, Seq(1.4, 1.5)) == "noise")
    // weather: the literal round-10 q85 receipt — bench 0.69 vs floor
    // 0.31, probe 0.47, same-round benches 0.351/0.438 — which took a
    // manual git-show triage then and self-adjudicates now
    assert(adjudicate(0.31, 0.47, Seq(0.351, 0.438)) == "weather")
    // weather via the band: probe above 2x floor but below a committed
    // historical value
    assert(adjudicate(0.2, 0.9, Seq(0.5, 1.0)) == "weather")
    // regressed: clears the floor, the band, and 2x the hist median
    assert(adjudicate(0.2, 2.0, Seq(0.4, 0.5)) == "regressed")
    // no history: the pre-round-11 rule (floor-only) decides
    assert(adjudicate(0.2, 0.9, Nil) == "regressed")
    assert(adjudicate(0.2, 0.3, Nil) == "noise")
    // failed probe is never exonerated
    assert(adjudicate(0.2, -1.0, Seq(0.4)) == "regressed")
    // parseHistory reads the fold_baseline.py shape (flat arrays)
    val h = parseHistory(
      """{"queries":{"a":1.0},"history":{"a":[0.5, 0.7],"b_x":[1.25]}}""")
    assert(h == Map("a" -> Seq(0.5, 0.7), "b_x" -> Seq(1.25)))
    assert(parseHistory("""{"queries":{"a":1.0}}""") == Map.empty)
    // format-drift guard (round-11 ADVICE, hardened round 13): nested
    // braces inside the history object mean the flat parse would
    // truncate — parseHistory now REFUSES instead of proceeding with a
    // silently truncated map (Bench.main catches, adjudicates with no
    // history, and emits "history_degraded":true in the JSON)
    assert(Bench.historyFormatFlat(
      """{"history":{"a":[0.5],"b":[1.0]}}"""))
    assert(Bench.historyFormatFlat("""{"queries":{"a":1.0}}"""))
    val nested = """{"history":{"a":{"vals":[0.5]},"b":{"vals":[1.0]}}}"""
    assert(!Bench.historyFormatFlat(nested))
    assertThrows[IllegalArgumentException](parseHistory(nested))
    // the committed baseline itself must satisfy the flat assumption
    assert(Bench.historyFormatFlat(java.nio.file.Files.readString(
      java.nio.file.Paths.get("BENCH_BASELINE.json"))))
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
