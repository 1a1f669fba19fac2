package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** File-based streaming source (SURVEY.md §2 Part B "Scans/sources" —
  * the production-shaped source; MemoryStream covers tests). Parquet
  * files dropped into a directory are discovered and processed as
  * micro-batches; Trigger.AvailableNow drains then stops.
  */
class FileStreamSpec extends SparkSpec {

  test("parquet directory stream drains with AvailableNow and aggregates") {
    val dir = Files.createTempDirectory("graft-stream").toString
    val docs = Tables.documents(spark, sf)
    // two "arrivals"
    docs.filter(col("doc_id") < 100).write.mode("append").parquet(dir)
    docs.filter(col("doc_id") >= 100 && col("doc_id") < 250).write.mode("append").parquet(dir)
    val stream = spark.readStream
      .schema(docs.schema)
      .option("maxFilesPerTrigger", "1") // bounded per-batch admission (≅ A14 at the source)
      .parquet(dir)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n"))
    val q = stream.writeStream
      .outputMode("complete")
      .format("memory").queryName("filestream")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    val total = spark.table("filestream").agg(sum(col("n"))).collect().head.getLong(0)
    assert(total == 250L)
  }
}
