package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.StreamingOps

class StreamingOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Int): Timestamp = new Timestamp(3600_000L + min * 60_000L)

  private def runToMemory(df: org.apache.spark.sql.DataFrame, name: String,
      mode: OutputMode): Unit = {
    val q = df.writeStream.outputMode(mode).format("memory").queryName(name).start()
    q.processAllAvailable()
    q.stop()
  }

  test("tumbling window with watermark drops late rows and counts per key") {
    val in = MemoryStream[(Timestamp, String, Double)](spark)
    val df = in.toDF().toDF("ts", "event_type", "value")
    val agg = StreamingOps.tumblingAgg(df, "ts", "event_type", "5 minutes", "10 minutes")
    val q = agg.writeStream.outputMode(OutputMode.Append).format("memory")
      .queryName("tumbling").start()
    in.addData((ts(0), "a", 1.0), (ts(1), "a", 2.0), (ts(6), "b", 3.0))
    q.processAllAvailable()
    in.addData((ts(40), "a", 4.0)) // advances watermark to minute 30
    q.processAllAvailable()
    in.addData((ts(2), "a", 99.0)) // late beyond watermark → dropped
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("tumbling")
      .selectExpr("event_type", "n", "total_value").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(rows.contains(("a", 2L, 3.0)))  // window [0,5) closed without the late row
    assert(rows.contains(("b", 1L, 3.0)))
  }

  test("session window merges events within gap") {
    val in = MemoryStream[(Timestamp, String)](spark)
    val df = in.toDF().toDF("ts", "user")
    val agg = StreamingOps.sessionAgg(df, "ts", "user", "5 minutes", "10 minutes")
    val q = agg.writeStream.outputMode(OutputMode.Append).format("memory")
      .queryName("sessions").start()
    in.addData((ts(0), "u"), (ts(2), "u"), (ts(3), "u"), (ts(20), "u"))
    q.processAllAvailable()
    in.addData((ts(60), "u")) // push watermark far enough to close both sessions
    q.processAllAvailable()
    q.stop()
    val ns = spark.table("sessions").selectExpr("n").collect().map(_.getLong(0)).sorted.toSeq
    assert(ns.take(2) == Seq(1L, 3L), s"got $ns") // one 3-event session, one singleton
  }

  test("streaming dedup emits each key once") {
    val in = MemoryStream[(Timestamp, Long)](spark)
    val df = in.toDF().toDF("ts", "k")
    val out = StreamingOps.dedupStream(df, "ts", "10 minutes", Seq("k"))
    val q = out.writeStream.outputMode(OutputMode.Append).format("memory")
      .queryName("dedup").start()
    in.addData((ts(0), 1L), (ts(0), 1L), (ts(0), 2L))
    q.processAllAvailable()
    in.addData((ts(0), 1L), (ts(1), 3L)) // same (k,ts) again → dropped
    q.processAllAvailable()
    q.stop()
    val ks = spark.table("dedup").selectExpr("k").collect().map(_.getLong(0)).toSeq
    assert(ks.sorted == Seq(1L, 2L, 3L))
  }

  test("running counts with idle timeout evict state (final count re-emitted)") {
    val in = MemoryStream[(String, Long)](spark)
    val out = StreamingOps.runningCounts(in.toDS(), idleTimeout = Some("1 second"))
    val q = out.writeStream.outputMode(OutputMode.Update).format("memory")
      .queryName("running_ttl")
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime("200 milliseconds"))
      .start()
    in.addData(("a", 2L))
    // wait for the idle timeout to fire (cleanup batches run continuously)
    val deadline = System.currentTimeMillis() + 15000
    var emissions = 0L
    while (emissions < 2 && System.currentTimeMillis() < deadline) {
      Thread.sleep(200)
      emissions = spark.table("running_ttl").count()
    }
    q.stop()
    // first emission from the data batch, second from the timeout eviction
    assert(emissions >= 2, s"timeout eviction never re-emitted (got $emissions rows)")
    val vals = spark.table("running_ttl").collect().map(r => (r.getString(0), r.getLong(1)))
    assert(vals.forall(_ == ("a", 2L)))
  }

  test("stream-static enrichment join (broadcast dimension against a stream)") {
    val dim = Seq((1L, "gold"), (2L, "basic")).toDF("k", "tier")
    val in = MemoryStream[(Long, Double)](spark)
    val enriched = in.toDF().toDF("k", "v")
      .join(org.apache.spark.sql.functions.broadcast(dim), Seq("k"), "left")
    val q = enriched.writeStream.outputMode(OutputMode.Append).format("memory")
      .queryName("enriched").start()
    in.addData((1L, 10.0), (2L, 5.0), (3L, 1.0))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("enriched").collect()
      .map(r => (r.getLong(0), Option(r.getString(2)))).toSet
    assert(rows == Set((1L, Some("gold")), (2L, Some("basic")), (3L, None)))
  }

  test("stream-stream interval join matches within window, drops outside") {
    val clicks = MemoryStream[(Timestamp, Long, String)](spark)
    val buys = MemoryStream[(Timestamp, Long, Double)](spark)
    val joined = StreamingOps.intervalJoin(
      clicks.toDF().toDF("click_ts", "click_user", "page"),
      buys.toDF().toDF("buy_ts", "buy_user", "amount"),
      "click_ts", "buy_ts", "click_user", "buy_user",
      watermark = "10 minutes", within = "10 minutes")
    val q = joined.writeStream.outputMode(OutputMode.Append).format("memory")
      .queryName("ssjoin").start()
    clicks.addData((ts(0), 1L, "home"), (ts(0), 2L, "search"))
    buys.addData((ts(5), 1L, 9.99),   // within 10 min of user 1's click → match
      (ts(25), 2L, 5.0))              // 25 min after user 2's click → no match
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("ssjoin")
      .selectExpr("click_user", "page", "amount").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(rows == Set((1L, "home", 9.99)), s"got $rows")
  }

  test("streaming top-k leaderboard merges across batches, stays bounded") {
    // transformWithState needs the RocksDB provider (multiple column
    // families) — same setup as StateStoreSpec
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val in = MemoryStream[(Long, Double)](spark)
      val out = StreamingOps.streamingTopK(in.toDS(), k = 3)
      val q = out.writeStream.outputMode(OutputMode.Update).format("memory")
        .queryName("stream_topk").start()
      in.addData((1L, 5.0), (1L, 9.0), (1L, 1.0), (2L, 4.0))
      q.processAllAvailable()
      in.addData((1L, 7.0), (1L, 2.0)) // 7 enters top-3, 2 does not
      q.processAllAvailable()
      q.stop()
      val latest = spark.table("stream_topk").collect()
        .map(r => (r.getLong(0), r.getSeq[Double](1).toList))
        .groupBy(_._1).map { case (k, vs) => k -> vs.last._2 }
      assert(latest(1L) == List(9.0, 7.0, 5.0), latest)
      assert(latest(2L) == List(4.0), latest)
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("flatMapGroupsWithState sessionizer closes sessions across batches") {
    val in = MemoryStream[(Long, Long)](spark)
    val out = StreamingOps.sessionizeStream(in.toDS(), gapMs = 5 * 60_000L)
    val q = out.writeStream.outputMode(OutputMode.Append).format("memory")
      .queryName("fmgs_sessions").start()
    def t(min: Int): Long = min * 60_000L
    in.addData((1L, t(0)), (1L, t(2)), (1L, t(3)), (2L, t(0)))
    q.processAllAvailable() // all within gap → sessions still open, nothing emitted
    assert(spark.table("fmgs_sessions").count() == 0)
    in.addData((1L, t(20)), (1L, t(21))) // >5 min after t(3) → closes session 1
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("fmgs_sessions").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(rows == Set((1L, t(0), t(3), 3L)), s"got $rows")
  }

  test("mapGroupsWithState running counts accumulate across batches") {
    val in = MemoryStream[(String, Long)](spark)
    val out = StreamingOps.runningCounts(in.toDS(), idleTimeout = None)
    val q = out.writeStream.outputMode(OutputMode.Update).format("memory")
      .queryName("running").start()
    in.addData(("a", 2L), ("b", 1L))
    q.processAllAvailable()
    in.addData(("a", 3L))
    q.processAllAvailable()
    q.stop()
    val last = spark.table("running").collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).max }
    assert(last == Map("a" -> 5L, "b" -> 1L))
  }
}
