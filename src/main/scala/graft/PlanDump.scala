// Dump `explain("formatted")` for named queries into a directory —
// the r15 optimization-round evidence trail (plans/r15/<q>_{before,after}.txt).
// Usage: SPARK_GRAFT_SF_DIR=... runMain graft.PlanDump <outDir> <suffix> <query...>
// AQE stays ON (the benched config) but the dump is the pre-execution
// plan; Exchange counts / join strategies / PushedFilters are what the
// optimization notes claim against these files.
package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val names = args.drop(2)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[8]")
      .appName("plandump").config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config(Tables.nanosFlag, "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))
    for (n <- names) {
      val df = SparkEntry.queries(n)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(Paths.get(outDir, s"${n}_$suffix.txt"), plan)
      println(s"PLAN $n -> $outDir/${n}_$suffix.txt (${plan.length} chars)")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
