package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine-exact fixed-decimal rounding for per-row doubles.
  *
  * Spark's `round()` rounds the shortest decimal string of the double
  * (BigDecimal HALF_UP); DuckDB rounds the binary value. On inputs whose
  * shortest string lands on x.…5 the engines disagree by one unit in the
  * last place kept. `floor(x*10^d + 0.5)/10^d` is the same IEEE op
  * sequence in both engines, so identical inputs give bit-identical
  * outputs. Non-negative inputs only (floor biases negatives down).
  */
object ExactRound {
  def round2(c: Column): Column = floor(c * 100.0 + 0.5) / 100.0
  def round4(c: Column): Column = floor(c * 10000.0 + 0.5) / 10000.0
  def round6(c: Column): Column = floor(c * 1000000.0 + 0.5) / 1000000.0

  /** Scaled-BIGINT form of [[round6]] (the round-4 "no raw doubles on
    * driver-gated outputs" rule): same IEEE floor(x·1e6 + 0.5) in both
    * engines, but emitted as an integer — one representation, immune to
    * float-repr/hash-canonicalization skew. Order-equivalent to the
    * double it replaces (x ↦ floor(x·1e6 + 0.5) is monotone). */
  def e6(c: Column): Column = floor(c * 1000000.0 + 0.5).cast("long")
}
