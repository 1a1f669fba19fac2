package graft

/** Degenerate-input robustness: every registered query must execute —
  * not necessarily return rows — against EMPTY tables with the
  * production schemas. At 100 TB empty inputs are routine (empty
  * partitions after pruning, a new source with no data yet, a filter
  * that matches nothing); an operator that throws on zero rows is a
  * pipeline outage. Guards the classic offenders: head() on an empty
  * Dataset, array_min/array_position on empty arrays, windows over
  * empty frames, seeds/centroids collected from an empty corpus.
  */
class EmptyInputSpec extends SparkSpec {

  private lazy val emptyDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-empty").toString
    // raw read → limit(0) → write keeps the exact physical schema
    // (events keeps its INT64-nanos ts column, readable via Tables.events)
    Tables.names.foreach { n =>
      spark.read.parquet(s"$sf/$n.parquet").limit(0)
        .write.mode("overwrite").parquet(s"$dir/$n.parquet")
    }
    dir
  }

  SparkEntry.queries.keys.toSeq.sorted.foreach { name =>
    test(s"$name executes on empty tables") {
      try {
        val rows = SparkEntry.queries(name)(spark, emptyDir).collect()
        assert(rows != null) // contract: no throw; zero rows is fine
      } finally spark.catalog.clearCache() // the driver-harness rule
    }
  }
}
