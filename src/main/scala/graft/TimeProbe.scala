// Per-query timing probe: runMain graft.TimeProbe <query names...> against
// SPARK_GRAFT_SF_DIR — finer-grained than Bench when optimizing one query.
package graft
import org.apache.spark.sql.SparkSession
object TimeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .appName("probe").config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config(Tables.nanosFlag, "true")
      // probe the plans Bench/Verify actually run (production extensions)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (n <- args) {
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, sfDir).write.format("noop").mode("overwrite").save()
      println(f"PROBE $n ${(System.nanoTime()-t0)/1e9}%.2f s")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
