package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for equi-joins (SURVEY.md §7.2 step 6 / the 100 TB
  * checklist): when one join key carries a disproportionate share of the
  * big side, a plain shuffle join lands that key on one reducer. Salting
  * splits each big-side key into `salts` synthetic sub-keys and
  * replicates the matching small-side rows across all of them, so the
  * hot key fans out over `salts` reducers.
  *
  * AQE's skew-join handling (`spark.sql.adaptive.skewJoin.enabled`, on
  * by default here) covers sort-merge joins at runtime; explicit salting
  * remains the tool for broadcast-ineligible skewed hash joins and for
  * deterministic layout control.
  */
object Skew {

  /** Per-row salt in [0, salts): content hash mixed with the row's
    * position id, so even fully duplicate rows of a hot key spread (no
    * rand() — within a run the layout is stable; the salt is physical
    * only and never escapes the join). */
  private def salt(df: DataFrame, salts: Int): Column =
    pmod(xxhash64(struct(df.columns.map(col): _*), monotonically_increasing_id()),
      lit(salts.toLong)).cast("int")

  /** Inner equi-join of a skewed big side against a small side on
    * `key`, fanned out over `salts` sub-keys. Result is identical to
    * `big.join(small, key)` — only the physical distribution changes. */
  def saltedEquiJoin(big: DataFrame, small: DataFrame, key: String, salts: Int): DataFrame = {
    require(salts > 0)
    val bigS = big.withColumn("_salt", salt(big, salts))
    val smallS = small.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1)).cast("array<int>")))
    bigS.join(smallS, Seq(key, "_salt")).drop("_salt")
  }
}
