package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** THE (session, dir, fixture-fingerprint, key)-keyed gate/result memo —
  * one definition for every session-lifetime result cache (Similarity's
  * family results and s13, TextAnalysis's t40/t41/t42 gates, Multimodal's
  * m07), so a strengthening lands everywhere at once (the round-8
  * fixtureFingerprint lesson: four structurally identical copies had
  * grown and drifted; review finding round 9: three memo copies were
  * growing the same way).
  *
  * Results are collected into LOCAL relations: lineage ends here, so the
  * retained state is the rows themselves (gates hold ≤ 50), nothing lazy
  * escapes into dropped tables, and replays cost one LocalTableScan.
  * Fingerprints come from [[graft.Tables.fixtureFingerprint]] — a
  * driver-side fixture regeneration changes the key and forces a
  * rebuild. */
private[graft] object GateMemo {
  private val memo = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String, Long, String), DataFrame]()

  /** NOT computeIfAbsent: its per-bin lock would serialize CONCURRENT
    * multi-second builds whose keys collide in a bin (s04 launches five
    * at once — the memoFamily review finding, now enforced in the one
    * shared definition). Compute outside the map; a lost publish race
    * just discards a deterministic duplicate. */
  def cached(s: SparkSession, dir: String, fp: Long, key: String)(
      build: => DataFrame): DataFrame = {
    val k = (s, dir, fp, key)
    Option(memo.get(k)).getOrElse {
      val df = build
      val local = s.createDataFrame(
        java.util.Arrays.asList(df.collect(): _*), df.schema)
      // evict stale generations on insert (round-9 ADVICE): an entry for
      // the same (session, dir, key) under a DIFFERENT fingerprint can
      // never be read again — the fixture it was computed from is gone —
      // and would otherwise pin its rows (and SparkSession reference)
      // for the process lifetime across driver-side regenerations
      memo.keySet.removeIf(e =>
        (e._1 eq s) && e._2 == dir && e._4 == key && e._3 != fp)
      Option(memo.putIfAbsent(k, local)).getOrElse(local)
    }
  }
}
