package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.streaming.StreamingOps

/** 100 TB streaming-state discipline: RocksDB-backed state store (state
  * spills off-heap/on-disk instead of executor heap) and checkpointed
  * exactly-once recovery across query restarts (the durable analogue of
  * the reference's drain-on-stop).
  */
class StateStoreSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Int) = new Timestamp(3600_000L + min * 60_000L)

  test("windowed agg runs on the RocksDB state store provider") {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val in = MemoryStream[(Timestamp, String, Double)](spark)
      val agg = StreamingOps.tumblingAgg(in.toDF().toDF("ts", "event_type", "value"),
        "ts", "event_type", "5 minutes", "10 minutes")
      val q = agg.writeStream.outputMode(OutputMode.Append).format("memory")
        .queryName("rocksdb_agg").start()
      in.addData((ts(0), "a", 1.0), (ts(1), "a", 2.0))
      q.processAllAvailable()
      in.addData((ts(40), "b", 1.0)) // close the first window
      q.processAllAvailable()
      q.stop()
      val rows = spark.table("rocksdb_agg").selectExpr("event_type", "n").collect()
        .map(r => (r.getString(0), r.getLong(1))).toSet
      assert(rows.contains(("a", 2L)))
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("transformWithState running totals accumulate across batches (RocksDB)") {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val in = MemoryStream[(Long, Double)](spark)
      val q = StreamingOps.runningTotals(in.toDS())
        .toDF("key", "n", "total")
        .writeStream.outputMode(OutputMode.Update).format("memory")
        .queryName("tws_totals").start()
      in.addData((1L, 2.0), (1L, 3.0), (2L, 10.0))
      q.processAllAvailable()
      in.addData((1L, 5.0))
      q.processAllAvailable()
      q.stop()
      val last = spark.table("tws_totals").collect()
        .map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2))))
        .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).maxBy(_._1) }
      // state persisted across micro-batches: key 1 saw 3 rows totalling 10
      assert(last(1L) == ((3L, 10.0)))
      assert(last(2L) == ((1L, 10.0)))
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("checkpointed query resumes from offset after stop (no reprocessing)") {
    val ckpt = Files.createTempDirectory("graft-ckpt").toString
    val out = Files.createTempDirectory("graft-ckpt-out").toString
    val in = MemoryStream[Long](spark)
    def start() = in.toDF().toDF("v")
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    in.addData(1L to 100L: _*)
    val q1 = start(); q1.awaitTermination(60000)
    in.addData(101L to 150L: _*)
    val q2 = start(); q2.awaitTermination(60000)
    val vs = spark.read.parquet(out).select(col("v")).collect().map(_.getLong(0)).sorted
    // exactly once: the first 100 are NOT re-emitted by the second run
    assert(vs.toSeq == (1L to 150L))
  }
}
