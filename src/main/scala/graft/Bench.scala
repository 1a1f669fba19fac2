package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line with per-query seconds.
  *
  * Methodology:
  *  - results are fully executed through the `noop` sink (whole plan runs,
  *    nothing is collected to the driver — `.count()` would let Catalyst
  *    prune the projection and under-measure scans);
  *  - a warm-up query absorbs one-time session/codegen/FileSystem init so
  *    per-query numbers measure the plan, not JVM warm-up;
  *  - AQE is on (runtime shuffle coalescing + skew splitting), shuffle
  *    partitions sized to the local core count, as a 1000-executor deploy
  *    would size them to cluster parallelism.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config(Tables.nanosFlag, "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def execute(name: String): Double = {
      val t0 = System.nanoTime()
      try {
        SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      } catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
        -1.0
      } finally {
        // release query-scoped caches (timed value is computed before the
        // finally) so timings are independent — no cross-query cache hits
        // — and cached plans don't accumulate over the session
        spark.catalog.clearCache()
      }
    }

    val names = SparkEntry.queries.keys.toSeq.sorted
    execute(names.head) // warm-up: session + codegen + parquet footer caches
    // min over passes: this host shows 2-3x noisy-neighbor swings on
    // identical plans (measured; see SCALE.md round-2 addendum), and the
    // minimum is the standard robust estimator of the plan's actual cost
    val passes = sys.env.getOrElse("SPARK_GRAFT_BENCH_PASSES", "2").toInt
    val results = names.map { n =>
      val runs = (1 to passes).map(_ => execute(n)).filter(_ >= 0)
      n -> (if (runs.nonEmpty) runs.min else -1.0)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val json = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    println(json)
    // stdout tails get truncated by log capture (round 2 lost 36 per-query
    // numbers that way; round 3's driver artifact parsed null) — ALWAYS
    // persist the full line to BENCH_LATEST.json in the working directory
    // (not a hardcoded absolute path: a run from another checkout would
    // silently write into the wrong tree), plus SPARK_GRAFT_BENCH_OUT
    val outs = Seq(new java.io.File(sys.props("user.dir"), "BENCH_LATEST.json").getPath) ++
      sys.env.get("SPARK_GRAFT_BENCH_OUT")
    outs.foreach { p =>
      try java.nio.file.Files.writeString(java.nio.file.Paths.get(p), json + "\n")
      catch { case e: Exception =>
        System.err.println(s"[bench] could not write $p: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
