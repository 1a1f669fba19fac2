package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._
object D02Probe {
  def main(a: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.documents(spark, "/root/testdata/sf0.1")
      .select(col("doc_id"), tokenHashes(tokens(col("text"))).as("th"))
      .select(col("doc_id"), simhashCounts(col("th")).as("counts"))
      .select(col("doc_id"), simhashFromCounts(col("counts")).as("sim"))
    val bands = docs.select(col("doc_id"), explode(simhashBands(col("sim"))).as("band"))
    val sizes = bands.groupBy("band").count().orderBy(desc("count"))
    sizes.show(10)
    val pairs = sizes.selectExpr("sum(count*(count-1)/2) as total_pairs")
    pairs.show()
    spark.stop()
  }
}
