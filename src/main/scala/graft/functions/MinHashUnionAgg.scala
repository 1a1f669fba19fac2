package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF (`Aggregator[IN, BUF, OUT]` — the user-facing aggregation
  * SPI, SURVEY.md §2 Part B "UDF/UDAF" row): merges per-document MinHash
  * signatures into a group-level sketch by elementwise min.
  *
  * This is the property that makes MinHash usable at 100 TB: signatures
  * are MERGEABLE — min(sig(A ∪ B)) = elementwise-min(sig(A), sig(B)) —
  * so a group's (source's, partition's, day's) sketch is a map-side
  * partial aggregate, and estimated Jaccard between any two groups costs
  * k comparisons instead of touching the documents again.
  *
  * Empty groups yield the all-MaxValue signature (matches
  * [[graft.plans.MinHashSignature]]'s empty-doc convention).
  */
class MinHashUnionAgg(k: Int) extends Aggregator[Seq[Long], Array[Long], Seq[Long]] {

  override def zero: Array[Long] = Array.fill(k)(Long.MaxValue)

  override def reduce(buf: Array[Long], sig: Seq[Long]): Array[Long] = {
    var i = 0
    val m = math.min(k, sig.length)
    while (i < m) { if (sig(i) < buf(i)) buf(i) = sig(i); i += 1 }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < k) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()

  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}
