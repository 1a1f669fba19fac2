package graft.core

import scala.concurrent.duration._

/** Pipeline configuration — the engine's analogue of the reference's
  * config surface (union of all three generations, v3 names winning):
  *
  *  - `numWorkers`        ≅ workerCount (v3 BatchProcessorConfig.java:17)
  *  - `maxPendingRows`    ≅ ringBufferSize=65536 (v3 BatchProcessorConfig.java:19)
  *  - `maxBatchSize`      ≅ maxBatchSize=1024 (v3 BatchProcessorConfig.java:20)
  *  - `minBatchSize`      ≅ v1 minBatchSize (core/BatchProcessorProperties.java:17)
  *  - `maxConcurrency`    ≅ maxConcurrency=16 (v3 BatchProcessorConfig.java:21)
  *  - `flushInterval`     ≅ flushInterval=1s (v3 BatchProcessorConfig.java:24)
  *  - `maxRetryCount`     ≅ maxRetryCount=3 (v3 BatchProcessorConfig.java:23)
  *  - `retryDelay`        ≅ the delayMills arg of context.retry (v2 Flusher.java:57)
  *  - `maxBatchesPerSecond` ≅ v1 tps (core/BatchProcessorProperties.java:29)
  *  - `maxItemsPerSecond` ≅ v1 ips (core/BatchProcessorProperties.java:33)
  *  - `blockOnFull`       ≅ v1 blockOnInsufficientCapacity
  *  - `stopTimeout`       ≅ closeWaitTimeoutMills=5s (v3 BatchProcessorConfig.java:26)
  *  - `deferSmallBatches` ≅ v1's literal min-batch gate (core/
  *    InnerEventHandler.java:54-58): a trailing run below `minBatchSize`
  *    is HELD (not flushed) until more items arrive or `flushInterval`
  *    elapses since the worker's last flush — the `endOfBatch &&
  *    (size >= minBatchSize || elapsed >= forceFlushInterval)` predicate,
  *    with the micro-batch boundary playing endOfBatch. Off by default:
  *    the default path merges small trailing runs within the micro-batch
  *    and flushes everything each trigger (flush-everything is the safer
  *    default; deferral trades latency for batch efficiency exactly as
  *    v1's knob does).
  *  - `triggerInterval`   — micro-batch cadence when it should beat
  *    `flushInterval` (deferral is only observable when batch boundaries
  *    arrive faster than the force-flush interval, mirroring v1 where
  *    endOfBatch fires far more often than forceFlushInterval). Defaults
  *    to `flushInterval`.
  *
  * Rates ≤ 0 mean unlimited.
  */
final case class PipelineConfig(
    name: String = "graft",
    numWorkers: Int = 1,
    maxPendingRows: Long = 65536,
    maxBatchSize: Int = 1024,
    minBatchSize: Int = 1,
    maxConcurrency: Int = 16,
    flushInterval: FiniteDuration = 1.second,
    maxRetryCount: Int = 3,
    retryDelay: FiniteDuration = 100.millis,
    maxBatchesPerSecond: Double = 0.0,
    maxItemsPerSecond: Double = 0.0,
    blockOnFull: Boolean = true,
    stopTimeout: FiniteDuration = 5.seconds,
    deferSmallBatches: Boolean = false,
    triggerInterval: Option[FiniteDuration] = None) {
  require(numWorkers > 0 && maxBatchSize > 0 && maxConcurrency > 0)
  require(minBatchSize >= 0 && minBatchSize <= maxBatchSize)
  require(triggerInterval.forall(_ <= flushInterval),
    "triggerInterval must not exceed flushInterval")

  /** Micro-batch trigger cadence (defaults to the force-flush interval). */
  def trigger: FiniteDuration = triggerInterval.getOrElse(flushInterval)
}

/** Runtime statistics — ≅ v2 `stat()` (core/v2/Stat.java:11-135).
  * The per-worker maps (worker index → count) carry v2 Stat's
  * per-worker granularity — the reference exposes per-worker ring
  * occupancy; here a worker is a shard task, so its flush counts are
  * the analogous signal (which shard is hot / behind). Per-worker
  * counts always sum to the global fields. */
final case class PipelineStats(
    itemsIn: Long,
    itemsFlushed: Long,
    batchesFlushed: Long,
    retries: Long,
    itemsDropped: Long,
    pending: Long,
    perWorkerItemsFlushed: Map[Int, Long] = Map.empty,
    perWorkerBatchesFlushed: Map[Int, Long] = Map.empty)
