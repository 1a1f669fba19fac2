// Result probe: runMain graft.ShowProbe <query names...> against
// SPARK_GRAFT_SF_DIR — prints each query's rows (Verify's session shape,
// production extensions), for eyeballing gate flags while iterating.
package graft
import org.apache.spark.sql.SparkSession
object ShowProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[32]")
      .appName("show-probe").config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config(Tables.nanosFlag, "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (n <- args) {
      println(s"=== $n ===")
      SparkEntry.queries(n)(spark, sfDir).show(50, truncate = false)
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
