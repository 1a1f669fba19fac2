package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Streaming analytics the reference never had (its only time notion is
  * processing-time force-flush, SURVEY.md §2 Part B): event-time
  * watermarks, tumbling/sliding/session windows, streaming dedup.
  * Each op takes a streaming Dataset and returns a streaming DataFrame —
  * source/sink wiring stays with the caller ([[graft.core.BatchPipeline]]
  * or a file/Kafka stream in production).
  *
  * Scale notes: windowed aggregations shuffle on (window, key) with
  * partial aggregation map-side; watermarks bound state size, which is
  * what makes any of this viable on an unbounded 100 TB/day stream —
  * every operator here requires one.
  */
object StreamingOps {

  /** Tumbling event-time window counts with late-data drop; `valueCol`
    * is the summed measure (parameterized like the other columns). */
  def tumblingAgg(events: DataFrame, tsCol: String, keyCol: String,
      window_ : String, watermark: String, valueCol: String = "value"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), window_), col(keyCol))
      .agg(count(lit(1)).as("n"), sum(col(valueCol)).as("total_value"))

  /** Sliding window aggregate. */
  def slidingAgg(events: DataFrame, tsCol: String, keyCol: String,
      window_ : String, slide: String, watermark: String): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), window_, slide), col(keyCol))
      .agg(count(lit(1)).as("n"))

  /** Session windows: gap-based grouping per key. */
  def sessionAgg(events: DataFrame, tsCol: String, keyCol: String,
      gap: String, watermark: String): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(session_window(col(tsCol), gap), col(keyCol))
      .agg(count(lit(1)).as("n"))

  /** Streaming exact dedup on the KEY columns alone: redeliveries of the
    * same key with a different timestamp (the at-least-once shape) are
    * dropped too, and the watermark bounds how long a key is remembered
    * (state GC). `dropDuplicatesWithinWatermark` implements exactly this
    * contract; plain `dropDuplicates(keys :+ ts)` would let a re-ingested
    * key with a fresh timestamp through. */
  def dedupStream(events: DataFrame, tsCol: String, watermark: String,
      keys: Seq[String]): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keys)

  /** Custom sessionization via flatMapGroupsWithState (completing the
    * stateful triple with [[runningCounts]]'s mapGroupsWithState and
    * [[RunningTotalsProcessor]]'s transformWithState): per-key open
    * session accumulates (start, end, count) in typed state; an event
    * past the gap CLOSES the session — emitting it — and opens a new
    * one. flatMap (not map) because one batch can close several
    * sessions for a key. Event-time ordering within the batch is
    * enforced by sorting the per-key iterator (micro-batches don't
    * guarantee order); state is one tuple per ACTIVE key. Emits closed
    * sessions only — Append-mode compatible. `session_window` covers
    * the declarative path (see [[sessionAgg]]); this is the arbitrary-
    * logic escape hatch (e.g. dynamic per-key gaps) the built-in can't
    * express. */
  def sessionizeStream(ds: Dataset[(Long, Long)], gapMs: Long): Dataset[(Long, Long, Long, Long)] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
    import ds.sparkSession.implicits._
    ds.groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Long, Long), (Long, Long, Long, Long)](
        org.apache.spark.sql.streaming.OutputMode.Append,
        GroupStateTimeout.NoTimeout) {
        (key: Long, rows: Iterator[(Long, Long)], state: GroupState[(Long, Long, Long)]) =>
          val ts = rows.map(_._2).toSeq.sorted
          var open = state.getOption
          val closed = Seq.newBuilder[(Long, Long, Long, Long)]
          ts.foreach { t =>
            open match {
              case Some((s0, e0, n0)) if t - e0 <= gapMs =>
                open = Some((s0, t, n0 + 1))
              case Some((s0, e0, n0)) =>
                closed += ((key, s0, e0, n0))
                open = Some((t, t, 1L))
              case None =>
                open = Some((t, t, 1L))
            }
          }
          open.foreach(state.update)
          closed.result().iterator
      }
  }

  /** Stream-stream event-time interval join: left rows match right rows
    * with the same key whose timestamp lands in [leftTs, leftTs +
    * within]. BOTH inputs carry watermarks and the join condition bounds
    * event time on both sides — the two things Structured Streaming
    * needs to know when buffered state is safe to evict, making join
    * state O(watermark + interval), not O(stream). `joinType` admits
    * "inner" or the watermark-gated outer variants ("left_outer" etc.),
    * which emit null-padded rows only once the watermark proves no match
    * can arrive. Columns must be disambiguated by the caller beforehand
    * (rename before joining — self-join column capture is a classic
    * streaming footgun). */
  def intervalJoin(left: DataFrame, right: DataFrame,
      leftTs: String, rightTs: String, leftKey: String, rightKey: String,
      watermark: String, within: String, joinType: String = "inner"): DataFrame = {
    val l = left.withWatermark(leftTs, watermark)
    val r = right.withWatermark(rightTs, watermark)
    l.join(r,
      col(leftKey) === col(rightKey) &&
        col(rightTs) >= col(leftTs) &&
        col(rightTs) <= col(leftTs) + expr(s"interval $within"),
      joinType)
  }

  /** Per-key running (count, sum) via the transformWithState API
    * (Spark 4's arbitrary-state surface) — the scale path for custom
    * streaming state: typed state handles backed by the configured
    * state store (RocksDB in production — see StateStoreSpec), with
    * declarative TTL eviction available via TTLConfig instead of the
    * hand-rolled timeout dance in [[runningCounts]]. */
  class RunningTotalsProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, (Long, Double), (Long, Long, Double)] {
    @transient private var totals: org.apache.spark.sql.streaming.ValueState[(Long, Double)] = _
    override def init(outputMode: org.apache.spark.sql.streaming.OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      totals = getHandle.getValueState[(Long, Double)]("totals",
        org.apache.spark.sql.Encoders.tuple(
          org.apache.spark.sql.Encoders.scalaLong, org.apache.spark.sql.Encoders.scalaDouble),
        org.apache.spark.sql.streaming.TTLConfig.NONE)
    override def handleInputRows(key: Long, rows: Iterator[(Long, Double)],
        timerValues: org.apache.spark.sql.streaming.TimerValues): Iterator[(Long, Long, Double)] = {
      val (c0, s0) = if (totals.exists()) totals.get() else (0L, 0.0)
      var c = c0
      var s = s0
      rows.foreach { r => c += 1; s += r._2 }
      totals.update((c, s))
      Iterator.single((key, c, s))
    }
  }

  /** Streaming leaderboard: per-key top-k values maintained in typed
    * state via transformWithState — the streaming sibling of the batch
    * [[graft.plans.TopKPerKeyPlan]] heap operator. State per key is the
    * current top-k list (bounded, like the batch heaps); each batch
    * merges its rows and emits the key's refreshed leaderboard.
    * Update-mode output: downstream sees the latest top-k per key. */
  class TopKProcessor(k: Int)
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, (Long, Double), (Long, Seq[Double])] {
    @transient private var top: org.apache.spark.sql.streaming.ValueState[Seq[Double]] = _
    override def init(outputMode: org.apache.spark.sql.streaming.OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      top = getHandle.getValueState[Seq[Double]]("top",
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]](),
        org.apache.spark.sql.streaming.TTLConfig.NONE)
    override def handleInputRows(key: Long, rows: Iterator[(Long, Double)],
        timerValues: org.apache.spark.sql.streaming.TimerValues): Iterator[(Long, Seq[Double])] = {
      val prev = if (top.exists()) top.get() else Seq.empty[Double]
      val next = (prev ++ rows.map(_._2)).sorted(Ordering[Double].reverse).take(k)
      top.update(next)
      Iterator.single((key, next))
    }
  }

  /** Wire [[TopKProcessor]] over a keyed stream. */
  def streamingTopK(ds: Dataset[(Long, Double)], k: Int): Dataset[(Long, Seq[Double])] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_._1)
      .transformWithState(new TopKProcessor(k),
        org.apache.spark.sql.streaming.TimeMode.None(),
        org.apache.spark.sql.streaming.OutputMode.Update())
  }

  /** Wire [[RunningTotalsProcessor]] over a keyed stream. */
  def runningTotals(ds: Dataset[(Long, Double)]): Dataset[(Long, Long, Double)] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_._1)
      .transformWithState(new RunningTotalsProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(),
        org.apache.spark.sql.streaming.OutputMode.Update())
  }

  /** Running per-key counters via typed stateful processing — the
    * mapGroupsWithState surface (≅ what the reference's per-worker
    * mutable buffer state would become on Spark).
    *
    * With `idleTimeout = Some(d)` (the production default), state for
    * keys idle longer than d is evicted — emitting the final count once
    * more — so state size tracks the ACTIVE key set, not the all-time
    * key set: the bound that keeps this viable on a high-cardinality
    * stream. CAVEAT: a processing-time timeout makes the engine schedule
    * continuous state-cleanup batches, so `processAllAvailable()` never
    * returns — drive timeout-enabled queries with a real trigger and
    * `awaitTermination`, or pass `None` for barrier-style testing. */
  def runningCounts[K: org.apache.spark.sql.Encoder](
      ds: Dataset[(K, Long)],
      idleTimeout: Option[String] = Some("1 hour")): Dataset[(K, Long)] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
    implicit val longEnc: org.apache.spark.sql.Encoder[Long] =
      org.apache.spark.sql.Encoders.scalaLong
    implicit val tupleEnc: org.apache.spark.sql.Encoder[(K, Long)] =
      org.apache.spark.sql.Encoders.tuple(
        implicitly[org.apache.spark.sql.Encoder[K]], longEnc)
    val timeoutConf = if (idleTimeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout
                      else GroupStateTimeout.NoTimeout
    ds.groupByKey(_._1)
      .mapGroupsWithState[Long, (K, Long)](timeoutConf) {
        (key: K, rows: Iterator[(K, Long)], state: GroupState[Long]) =>
          if (state.hasTimedOut) {
            val last = state.getOption.getOrElse(0L)
            state.remove()
            (key, last)
          } else {
            val next = state.getOption.getOrElse(0L) + rows.map(_._2).sum
            state.update(next)
            idleTimeout.foreach(state.setTimeoutDuration)
            (key, next)
          }
      }
  }
}
