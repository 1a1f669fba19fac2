package graft.core

/** Per-flush context handed to the sink — ≅ the reference's
  * `Flusher.Context` (v2 Flusher.java:20-60, v3 Flusher.java:16-27).
  * The engine owns the retry loop: a flush that THROWS is retried after
  * `retryDelay`, up to `maxRetryCount`, then the batch is dropped with a
  * warning (the reference's discard-and-warn at v2 Worker.java:290-291).
  * Delivery is therefore at-least-once under retry, exactly like the
  * reference (which re-delivers the same batch object).
  */
trait FlushContext {
  /** Which worker (partition task) is flushing — ≅ Flusher.Factory
    * create(index) (v2 Flusher.java:14-16). */
  def workerIndex: Int
  /** 0 on first attempt — ≅ context.retryCount() (v2 Flusher.java:33). */
  def retryCount: Int
}

/** The sink SPI — ≅ `AsyncProcessor`/`Flusher` (core/AsyncProcessor.java:18,
  * v3 Flusher.java:10). Synchronous contract: return = complete(), throw =
  * retry(). Instances are created per worker via [[FlusherFactory]], so
  * they may hold non-serializable connections.
  */
trait Flusher[T] {
  /** Called once per worker before the first batch — ≅ open/create. */
  def open(workerIndex: Int): Unit = {}
  def flush(batch: Seq[T], ctx: FlushContext): Unit
  /** Called when the worker is done — ≅ AsyncProcessorManager.shutdown. */
  def close(): Unit = {}
}

/** Serializable factory shipped to executors; one Flusher per worker —
  * ≅ AsyncProcessorManager (core/AsyncProcessorManager.java:7-11) and
  * Flusher.Factory (v3 Flusher.java:12-14). */
trait FlusherFactory[T] extends Serializable {
  def create(): Flusher[T]
}

object FlusherFactory {
  def apply[T](f: () => Flusher[T]): FlusherFactory[T] =
    new FlusherFactory[T] { def create(): Flusher[T] = f() }
}
