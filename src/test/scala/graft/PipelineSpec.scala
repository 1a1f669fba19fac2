package graft

import java.util.concurrent.ConcurrentLinkedQueue
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import scala.concurrent.duration._
import scala.jdk.CollectionConverters._

import graft.core._

/** Parity tests for the reference's three test scenarios (SURVEY.md §5.2)
  * with logical assertions instead of wall-clock ones, plus the admission
  * and atomicity contracts. Sinks record into JVM-static state — valid in
  * local mode where executors share the JVM.
  */
object PipelineSpec {
  val delivered = new ConcurrentLinkedQueue[String]()
  val batchSizes = new ConcurrentLinkedQueue[Int]()
  val attempts = new AtomicInteger(0)
  val opened = new AtomicInteger(0)
  val closed = new AtomicInteger(0)
  val inFlight = new AtomicInteger(0)
  val maxInFlight = new AtomicInteger(0)

  def reset(): Unit = {
    delivered.clear(); batchSizes.clear(); attempts.set(0)
    opened.set(0); closed.set(0); inFlight.set(0); maxInFlight.set(0)
  }

  class RecordingFlusher(failFirst: Int = 0, sleepMs: Long = 0) extends Flusher[String] {
    override def open(workerIndex: Int): Unit = opened.incrementAndGet()
    override def close(): Unit = closed.incrementAndGet()
    override def flush(batch: Seq[String], ctx: FlushContext): Unit = {
      val cur = inFlight.incrementAndGet()
      maxInFlight.updateAndGet(m => math.max(m, cur))
      try {
        if (sleepMs > 0) Thread.sleep(sleepMs)
        if (attempts.incrementAndGet() <= failFirst) throw new RuntimeException("injected failure")
        batch.foreach(delivered.add)
        batchSizes.add(batch.size)
      } finally inFlight.decrementAndGet()
    }
  }
}

class PipelineSpec extends SparkSpec {
  import PipelineSpec._

  private var n = 0
  private def freshName(): String = { n += 1; s"pipe-spec-$n" }

  private def pipeline(cfg: PipelineConfig, failFirst: Int = 0, sleepMs: Long = 0) = {
    import spark.implicits._
    reset()
    BatchPipeline[String](spark, cfg,
      FlusherFactory(() => new RecordingFlusher(failFirst, sleepMs)))
  }

  test("completeness: every item delivered exactly once, batches bounded (ref test #1)") {
    val cfg = PipelineConfig(name = freshName(), maxBatchSize = 256, maxConcurrency = 4,
      numWorkers = 2, flushInterval = 100.millis)
    val p = pipeline(cfg).start()
    val items = (1 to 10000).map(i => s"item-$i")
    p.putAll(items)
    p.flush()
    p.stop()
    assert(delivered.asScala.toSet == items.toSet)
    assert(delivered.size == items.size) // no duplicates without retries
    assert(batchSizes.asScala.forall(_ <= 256))
    val st = p.stat()
    assert(st.itemsIn == 10000 && st.itemsFlushed == 10000 && st.itemsDropped == 0)
    assert(st.pending == 0)
    // A18 per-worker granularity: worker counts partition the globals
    assert(st.perWorkerItemsFlushed.values.sum == st.itemsFlushed)
    assert(st.perWorkerBatchesFlushed.values.sum == st.batchesFlushed)
    assert(st.perWorkerItemsFlushed.nonEmpty)
  }

  test("time-based flush: stragglers below maxBatchSize are delivered (ref test #2)") {
    val cfg = PipelineConfig(name = freshName(), maxBatchSize = 1024, flushInterval = 100.millis)
    val p = pipeline(cfg).start()
    p.put("a"); p.put("b"); p.put("c")
    p.flush()
    assert(delivered.asScala.toSet == Set("a", "b", "c"))
    p.stop()
  }

  test("bounded retry then success: at-least-once, retries counted (ref v2 test)") {
    val cfg = PipelineConfig(name = freshName(), maxRetryCount = 3, retryDelay = 10.millis,
      flushInterval = 100.millis)
    val p = pipeline(cfg, failFirst = 2).start()
    p.putAll((1 to 10).map(_.toString))
    p.flush()
    p.stop()
    val st = p.stat()
    assert(st.retries == 2)
    assert(delivered.asScala.toSet == (1 to 10).map(_.toString).toSet)
    assert(st.itemsFlushed == 10 && st.itemsDropped == 0)
  }

  test("retry exhaustion: batch dropped with accounting, pipeline survives (ref discard-and-warn)") {
    val cfg = PipelineConfig(name = freshName(), maxRetryCount = 2, retryDelay = 10.millis,
      flushInterval = 100.millis)
    val p = pipeline(cfg, failFirst = Int.MaxValue).start()
    p.putAll((1 to 5).map(_.toString))
    p.flush()
    val st = p.stat()
    assert(st.itemsDropped == 5 && st.itemsFlushed == 0)
    assert(st.retries == 2) // maxRetryCount attempts after the first
    // pipeline still alive: later data flows (flusher keeps failing, but
    // the query must not have died)
    p.put("x")
    p.flush()
    assert(p.stat().itemsDropped == 6)
    p.stop()
  }

  test("concurrency limiter: in-flight flushes never exceed maxConcurrency (A12)") {
    val cfg = PipelineConfig(name = freshName(), maxBatchSize = 100, maxConcurrency = 2,
      numWorkers = 4, flushInterval = 100.millis)
    val p = pipeline(cfg, sleepMs = 50).start()
    p.putAll((1 to 2000).map(i => s"i$i"))
    p.flush()
    p.stop()
    assert(maxInFlight.get() <= 2, s"observed ${maxInFlight.get()} concurrent flushes")
    assert(delivered.size == 2000)
  }

  test("tryPut honors capacity; tryPutAll is all-or-nothing (A2/A4)") {
    val cfg = PipelineConfig(name = freshName(), maxPendingRows = 10,
      flushInterval = 50.millis, blockOnFull = false)
    val p = pipeline(cfg).start()
    assert(p.tryPutAll((1 to 10).map(_.toString))) // exactly at capacity
    // buffer full now (until the trigger drains it): both forms must refuse
    val refused = !p.tryPut("overflow")
    val refusedBulk = !p.tryPutAll(Seq("o1", "o2"))
    // after a drain, capacity is back
    p.flush()
    val acceptedAfterDrain = p.tryPut("late")
    p.flush()
    p.stop()
    assert(refused && refusedBulk && acceptedAfterDrain)
    assert(delivered.asScala.toSet == ((1 to 10).map(_.toString).toSet + "late"))
  }

  test("worker lifecycle: open/close per worker per micro-batch (A19)") {
    val cfg = PipelineConfig(name = freshName(), flushInterval = 100.millis)
    val p = pipeline(cfg).start()
    p.putAll((1 to 50).map(_.toString))
    p.flush()
    p.stop()
    assert(opened.get() > 0 && opened.get() == closed.get())
  }

  test("stop rejects new puts (A17 drain contract)") {
    val cfg = PipelineConfig(name = freshName(), flushInterval = 100.millis)
    val p = pipeline(cfg).start()
    p.put("a")
    p.stop()
    intercept[IllegalStateException] { p.put("b") }
    assert(delivered.asScala.toSet == Set("a")) // drained before stop
  }

  test("put throws on a full buffer when blockOnFull=false (no silent overrun)") {
    // capacity 0: admission is ALWAYS full, independent of trigger timing
    val cfg = PipelineConfig(name = freshName(), maxPendingRows = 0,
      flushInterval = 100.millis, blockOnFull = false)
    val p = pipeline(cfg).start()
    val e = intercept[IllegalStateException] { p.put("overflow") }
    assert(e.getMessage.contains("buffer full"))
    assert(!p.tryPut("x") && !p.tryPutAll(Seq("y")))
    assert(p.stat().pending == 0) // counter not corrupted by the refusals
    p.stop()
    assert(delivered.isEmpty)
  }

  test("stop() wakes a producer blocked on capacity (throws, no hang/loss)") {
    val cfg = PipelineConfig(name = freshName(), maxPendingRows = 0,
      flushInterval = 100.millis, blockOnFull = true)
    val p = pipeline(cfg).start()
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    val blocked = Future(intercept[IllegalStateException] { p.put("x") })
    Thread.sleep(300) // let it block on (permanently zero) capacity
    p.stop()
    val e = Await.result(blocked, 10.seconds)
    // either blocked-then-woken or raced with the state flip — both must
    // surface as IllegalStateException, never a hang or silent success
    assert(e.getMessage.contains("stopped while blocked") || e.getMessage.contains("not started"))
  }

  test("coalesceSmall merges trailing sub-min runs that fit, never exceeds max") {
    import graft.core.BatchPipeline.coalesceSmall
    assert(coalesceSmall(Iterator(Seq(1, 2, 3), Seq(4, 5, 6), Seq(7)), 2, 4).toList ==
      List(Seq(1, 2, 3), Seq(4, 5, 6, 7)))
    // full predecessor: small run stays separate rather than exceeding max
    assert(coalesceSmall(Iterator(Seq(1, 2, 3, 4), Seq(5)), 2, 4).toList ==
      List(Seq(1, 2, 3, 4), Seq(5)))
    // big-enough trailing run untouched
    assert(coalesceSmall(Iterator(Seq(1, 2), Seq(3, 4)), 2, 4).toList ==
      List(Seq(1, 2), Seq(3, 4)))
    assert(coalesceSmall(Iterator.empty[Seq[Int]], 2, 4).toList == Nil)
  }

  test("single worker preserves arrival order (per-worker FIFO)") {
    val cfg = PipelineConfig(name = freshName(), numWorkers = 1, maxConcurrency = 1,
      maxBatchSize = 64, flushInterval = 100.millis)
    val p = pipeline(cfg).start()
    val items = (1 to 500).map(i => f"o$i%05d")
    p.putAll(items)
    p.flush()
    p.stop()
    assert(delivered.asScala.toList == items.toList)
  }

  private def awaitDelivered(n: Int, timeoutMs: Long = 10000): Unit = {
    val deadline = System.currentTimeMillis() + timeoutMs
    while (delivered.size < n && System.currentTimeMillis() < deadline) Thread.sleep(25)
    assert(delivered.size >= n, s"only ${delivered.size}/$n delivered in ${timeoutMs}ms")
  }

  test("A8 literal gate: sub-min runs defer across micro-batches until minBatchSize reached") {
    // time arm effectively off (long flushInterval); trigger much faster,
    // so deferral is observable across several micro-batch boundaries
    val cfg = PipelineConfig(name = freshName(), minBatchSize = 5, maxBatchSize = 1024,
      flushInterval = 30.seconds, triggerInterval = Some(100.millis),
      deferSmallBatches = true)
    val p = pipeline(cfg).start()
    (1 to 3).foreach(i => p.put(s"a$i"))
    // several triggers pass; 3 < minBatchSize and interval not elapsed →
    // nothing may flush (this is the behavior change the gate buys)
    Thread.sleep(600)
    assert(delivered.isEmpty, s"sub-min batch flushed early: ${delivered.asScala.toList}")
    (1 to 3).foreach(i => p.put(s"b$i"))
    // carry (3) + new (3) crosses the gate → flushes as one batch ≥ min
    awaitDelivered(5)
    assert(batchSizes.asScala.forall(_ >= 5),
      s"a sub-min batch was flushed with the time arm off: ${batchSizes.asScala.toList}")
    p.flush() // drains any pathological split remainder
    p.stop()
    assert(delivered.asScala.toSet == ((1 to 3).map(i => s"a$i") ++ (1 to 3).map(i => s"b$i")).toSet)
    val st = p.stat()
    assert(st.itemsFlushed == 6 && st.itemsDropped == 0)
  }

  test("A8 time arm: an idle deferred carry force-flushes after flushInterval (idle time arm)") {
    val cfg = PipelineConfig(name = freshName(), minBatchSize = 100, maxBatchSize = 1024,
      flushInterval = 400.millis, triggerInterval = Some(100.millis),
      deferSmallBatches = true)
    val p = pipeline(cfg).start()
    p.put("x"); p.put("y")
    // 2 << minBatchSize: only the interval arm (watchdog, since no more
    // data arrives to trigger a micro-batch) can flush these
    awaitDelivered(2, timeoutMs = 5000)
    assert(delivered.asScala.toSet == Set("x", "y"))
    p.stop()
  }

  test("A8 carry clock: an overdue-empty worker is refreshed, not flushed (interval-armed watchdog)") {
    // v1's flush() updates lastUpdateTime even on an empty buffer, so a
    // sub-min batch arriving after a long idle stretch still defers a
    // full interval instead of flushing against a stale clock
    val name = "carry-clock-test"
    try {
      assert(CarryBuffers.take(name, 0, now = 1000L) == (Vector.empty, 1000L))
      // overdue (elapsed 1000 >= 500) but empty: no emission, clock moves
      assert(CarryBuffers.drain(name, Some(500L), now = 2000L).isEmpty)
      assert(CarryBuffers.take(name, 0, now = 2100L) == (Vector.empty, 2000L))
      // with a carry present the same deadline emits it
      CarryBuffers.put(name, 0, Vector("x"))
      assert(CarryBuffers.drain(name, Some(500L), now = 2600L) == Seq(0 -> Vector("x")))
      // and a non-overdue carry stays put
      CarryBuffers.put(name, 0, Vector("y"))
      assert(CarryBuffers.drain(name, Some(500L), now = 2700L).isEmpty)
      assert(CarryBuffers.take(name, 0, now = 2800L)._1 == Vector("y"))
    } finally CarryBuffers.remove(name)
  }

  test("A8 defer with multiple workers: per-worker carries, exactly-once drain") {
    val cfg = PipelineConfig(name = freshName(), numWorkers = 3, minBatchSize = 50,
      maxBatchSize = 1024, flushInterval = 30.seconds,
      triggerInterval = Some(100.millis), deferSmallBatches = true)
    val p = pipeline(cfg).start()
    val items = (1 to 40).map(i => s"w$i")
    p.putAll(items) // round-robined over 3 workers, each share < minBatchSize
    Thread.sleep(500)
    assert(delivered.isEmpty, s"sub-min per-worker batches flushed early")
    p.flush() // drains every worker's carry
    assert(delivered.asScala.toSet == items.toSet)
    assert(delivered.size == items.size) // exactly once across 3 carries
    p.stop()
    val st = p.stat()
    assert(st.itemsFlushed == 40 && st.itemsDropped == 0)
    assert(st.perWorkerItemsFlushed.values.sum == 40)
  }

  test("A8 defer: flush() and graceful stop() drain the carry (no stranded items)") {
    val cfg = PipelineConfig(name = freshName(), minBatchSize = 50, maxBatchSize = 1024,
      flushInterval = 30.seconds, triggerInterval = Some(100.millis),
      deferSmallBatches = true)
    val p = pipeline(cfg).start()
    p.put("only")
    p.flush() // must force-drain the sub-min carry
    assert(delivered.asScala.toSet == Set("only"))
    p.put("tail")
    p.stop() // graceful stop drains too
    assert(delivered.asScala.toSet == Set("only", "tail"))
    assert(p.stat().itemsFlushed == 2)
  }

  // ---- A13/A14 rate limiting (≅ reference MixedLimiter.java:11-43) ----
  // Wall-clock LOWER bounds only: host noise makes things slower, never
  // faster, so "N acquisitions cannot finish before the bucket refills"
  // is robust where an upper bound would flake.

  private def timed(body: => Unit): Long = {
    val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1000000L
  }

  test("A13 TPS bucket: batch admissions beyond the burst wait for refill") {
    val lim = new Limiters(maxConcurrency = 64, tps = 20.0, ips = 0.0)
    // burst capacity = 20 (1s of rate); 31 one-batch acquisitions need
    // the burst plus 11 refilled tokens → ≥ 11/20 = 0.55s of waiting
    val ms = timed { (1 to 31).foreach(_ => lim.acquireRate(1)) }
    assert(ms >= 500, s"31 batches at tps=20 finished in ${ms}ms — bucket not limiting")
  }

  test("A14 IPS bucket: item admissions beyond the burst wait for refill") {
    val lim = new Limiters(maxConcurrency = 64, tps = 0.0, ips = 200.0)
    // burst 200 items; 5 batches × 100 = 500 items → 300 over burst →
    // ≥ 300/200 = 1.5s of waiting
    val ms = timed { (1 to 5).foreach(_ => lim.acquireRate(100)) }
    assert(ms >= 1400, s"500 items at ips=200 finished in ${ms}ms — bucket not limiting")
  }

  test("A13/A14 rate ≤ 0 disables the bucket (no blocking)") {
    val lim = new Limiters(maxConcurrency = 64, tps = 0.0, ips = 0.0)
    val ms = timed { (1 to 10000).foreach(_ => lim.acquireRate(1000)) }
    assert(ms < 2000, s"disabled limiter blocked for ${ms}ms")
  }

  test("oversize request is granted as debt and charged to later acquisitions") {
    val bucket = new TokenBucket(100.0)
    // n=150 > burst(100): granted at full bucket, tokens → -50
    val first = timed { bucket.acquire(150.0) }
    assert(first < 500, s"oversize grant blocked ${first}ms — debt rule broken (would deadlock)")
    // paying the debt: next 50 tokens need (50+50)/100 = 1.0s
    val second = timed { bucket.acquire(50.0) }
    assert(second >= 900, s"debt not charged: follow-up acquired in ${second}ms")
  }

  test("refund returns an acquisition's tokens (watchdog re-carry does not double-charge)") {
    val lim = new Limiters(maxConcurrency = 64, tps = 0.0, ips = 100.0)
    lim.acquireRate(100) // drain the burst
    lim.refundRate(100)  // failed single-attempt drain refunds
    // with the refund the next 100-item batch draws on a full bucket; a
    // double-charge would force a ~1s refill wait here
    val ms = timed { lim.acquireRate(100) }
    assert(ms < 500, s"refunded tokens not restored: re-acquire blocked ${ms}ms")
  }

  test("refund is capped at capacity (cannot mint tokens beyond one burst)") {
    val bucket = new TokenBucket(100.0)
    bucket.acquire(100.0)
    bucket.refund(100.0); bucket.refund(100.0) // double refund must not stack
    bucket.acquire(100.0) // free: the (capped) refund restored one burst
    // bucket now empty again — the second refund must NOT have left extra
    val ms = timed { bucket.acquire(50.0) }
    assert(ms >= 400, s"refund minted tokens: 50 over empty bucket acquired in ${ms}ms")
  }

  test("rate-limited pipeline end-to-end: delivery completes and is complete") {
    val cfg = PipelineConfig(name = freshName(), maxBatchSize = 10,
      triggerInterval = Some(50.millis),
      maxBatchesPerSecond = 50.0, maxItemsPerSecond = 1000.0)
    val p = pipeline(cfg).start()
    (1 to 200).foreach(i => p.put(s"i$i"))
    p.flush()
    p.stop()
    assert(delivered.size == 200, s"rate limiting lost items: ${delivered.size}/200")
    assert(p.stat().itemsFlushed == 200)
  }
}
