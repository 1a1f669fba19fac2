package graft

/** Structural guard against doc-count drift (round-7 lesson, recurred in
  * round 9: README said 564 specs where the suite measured 584). The
  * query/oracle counts are asserted here against the registry itself;
  * the spec-count line — unknowable from inside a running suite — is
  * guarded by `tools/check_readme_counts.sh`, which parses the actual
  * `sbt -batch test` summary and must be run by the verify recipe. */
class DocCountsSpec extends SparkSpec {

  private lazy val readme =
    java.nio.file.Files.readString(java.nio.file.Paths.get("README.md"))

  test("README query and oracle counts match the SparkEntry registry") {
    val m = """registers (\d+) queries; the (\d+) with a""".r
      .findFirstMatchIn(readme)
    assert(m.isDefined, "README query-count sentence not found — update the regex with the doc")
    assert(m.get.group(1).toInt == SparkEntry.queries.size,
      s"README says ${m.get.group(1)} queries, registry has ${SparkEntry.queries.size}")
    assert(m.get.group(2).toInt == SparkEntry.oracleSql.size,
      s"README says ${m.get.group(2)} oracle-gated, registry has ${SparkEntry.oracleSql.size}")
  }

  test("README rows-only count matches the registry complement") {
    val m = """The other (\d+) —""".r.findFirstMatchIn(readme)
    assert(m.isDefined, "README rows-only sentence not found — update the regex with the doc")
    val rowsOnly = SparkEntry.queries.size - SparkEntry.oracleSql.size
    assert(m.get.group(1).toInt == rowsOnly,
      s"README says ${m.get.group(1)} rows-only queries, registry implies $rowsOnly")
  }
}
