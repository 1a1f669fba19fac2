package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** EXACT per-key percentiles with BOUNDED executor memory — the 100 TB
  * replacement for `percentile()` / `sort_array(collect_list(...))`,
  * whose per-group state is an in-memory array of every row in the group
  * (a hot key at scale is an executor OOM; the
  * `ObjectHashAggregate`/`Percentile` buffer does not spill per group).
  *
  * Shape: (1) hash-aggregate to per-(key, value) counts — state is one
  * counter per DISTINCT value, with map-side partial aggregation; (2) a
  * window over the distinct values per key computes cumulative counts —
  * Spark plans this as a SORT, which spills to disk under pressure
  * (UnsafeExternalSorter), unlike an aggregation buffer; (3) one ordinary
  * hash-aggregate reads the target ranks off the cumulative counts.
  * No stage ever materializes a whole group in memory, every stage is
  * spillable, and the heavy shuffle keys on the group key exactly once.
  *
  * Value parity: `discByKey` returns the smallest value whose cumulative
  * count reaches `ceil(p·n)` — definitionally `percentile_disc` and
  * bit-identical to element `ceil(p·n)` of the sorted multiset (the
  * collect_list formulation it replaces). `contByKey` mirrors the builtin
  * `Percentile` interpolation op-for-op (`pos = p·(n-1)`;
  * `lo + (hi-lo)·(pos-floor(pos))`, same IEEE sequence), so results are
  * bit-identical to `percentile()` and to DuckDB's `quantile_cont`.
  *
  * NULL values are excluded (like the builtins). A NULL KEY forms a group
  * of its own, exactly like `groupBy` in the builtin formulation (it is
  * its own window partition — there is no totals join to drop it). A key whose values are ALL
  * null is dropped here (the builtins would emit a NULL row) — callers on
  * never-null columns (q29/q47/q69) are unaffected; outer-join the key
  * universe back if that case matters.
  */
object ExactPercentile {

  /** Per-(key, value) counts with per-key cumulative and total counts.
    * Both ride ONE WindowExec: `_cum` is the running frame, `_n` the
    * unbounded frame of the SAME (partitionBy, orderBy) spec — Spark
    * groups same-spec window expressions into a single operator, so the
    * total costs no extra pass, no totals aggregation, and no join.
    * (The round-5 shape joined a per-key totals agg — an extra shuffle
    * + sort-merge join of the distinct-value table, the q69 warm
    * regression; a DIFFERENT-spec whole-partition window would plan a
    * second WindowExec, the trap the old comment warned about.) A NULL
    * key forms its own window partition, so NULL-key groups survive
    * with no join to get right. */
  private def ranked(df: DataFrame, key: String, value: String): DataFrame =
    rankedWeighted(df, key, value, lit(1L))

  /** [[ranked]] with a per-row WEIGHT: `_c`/`_cum`/`_n` accumulate
    * weight sums instead of row counts (weight-1 IS the unweighted
    * frame). */
  private def rankedWeighted(df: DataFrame, key: String, value: String,
      weight: Column): DataFrame = {
    val wCum = Window.partitionBy(col(key)).orderBy(col(value))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col(key)).orderBy(col(value))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    df.filter(col(value).isNotNull)
      .groupBy(col(key), col(value)).agg(sum(weight).as("_c"))
      .select(col(key), col(value), col("_c"),
        sum(col("_c")).over(wCum).as("_cum"),
        sum(col("_c")).over(wAll).as("_n"))
  }

  /** Exact GLOBAL `percentile_disc` over a non-negative BIGINT column
    * WITHOUT a global window — the distributed-CDF shape for a corpus-
    * wide cut (a constant partition key would fold away and leave an
    * unbounded single-reducer WindowExec, which PlanShapeSpec bans):
    *
    *  1. per-value counts (map-side combined);
    *  2. per-SHARD totals, shard = value div `shardSpan` — the shard
    *     count is bounded by `maxValue/shardSpan + 1` BY ARITHMETIC, so
    *     collecting it is driver-bounded by construction (the IVF-seed
    *     precedent), and the running offsets are computed in one pass;
    *  3. the cumulative window partitions by SHARD (non-empty partition
    *     spec, distributes across reducers) and adds the broadcast
    *     shard offset — a global CDF with no global sort.
    *
    * Returns ONE row (`outName`): the smallest value whose global
    * cumulative count reaches ceil(p·n) — same rank rule as
    * [[discByKey]], pinned against the sorted-multiset element across
    * fractions and counts in ExactPercentileSpec, and bit-identical to
    * DuckDB `quantile_disc` at ANY fraction (the ceil(p·n) rule was
    * verified rank-for-rank against DuckDB across counts and fractions;
    * the driver gates it at p=0.25/0.5/0.75 — q85 — and p=0.5 — t34).
    * Empty input → one all-NULL row (callers' comparisons are then
    * never true, matching an empty-survivor cut). */
  def discGlobal(df: DataFrame, value: String, p: Double, outName: String,
      shardSpan: Long = 1000000000L): DataFrame =
    discGlobalMulti(df, value, Seq(p), Seq(outName), shardSpan)

  /** [[discGlobal]] for SEVERAL fractions in ONE CDF pass (review
    * finding: three separate calls cost three corpus-sized count
    * aggregations and three blocking collects — the [[discByKey]]
    * multi-fraction shape applies globally too). The per-value count
    * table is cached: it feeds the eager shard-totals collect AND the
    * returned lazy plan, so the corpus aggregates once per call rather
    * than twice (query-scoped; harnesses clearCache after — an
    * unpersisted replay merely recomputes). One window pass serves
    * every fraction via min(when(_cum ≥ ceil(pᵢ·n))). */
  def discGlobalMulti(df: DataFrame, value: String, ps: Seq[Double],
      outNames: Seq[String], shardSpan: Long = 1000000000L): DataFrame = {
    require(ps.length == outNames.length)
    val (cdf, n) = globalCdf(df, value, shardSpan)
    val aggs = ps.zip(outNames).map { case (p, name) =>
      min(when(col("_cum") >= lit(math.ceil(p * n).toLong), col(value))).as(name)
    }
    cdf.agg(aggs.head, aggs.tail: _*)
  }

  /** The distributed global CDF both global variants read their ranks
    * off: per-value counts (cached — feeds the eager shard-totals
    * collect AND the returned lazy plan), arithmetic-bounded shard
    * totals collected into running offsets, cumulative window
    * partitioned by SHARD. Returns the per-value frame with `_cum` and
    * the total count `n` as a driver scalar. */
  private def globalCdf(df: DataFrame, value: String,
      shardSpan: Long): (DataFrame, Long) =
    globalCdfWeighted(df, value, lit(1L), shardSpan)

  /** [[globalCdf]] with a per-row WEIGHT: `_cum` accumulates weight
    * sums instead of row counts, and the returned scalar is the total
    * weight. The unweighted CDF is the weight-1 special case. */
  private def globalCdfWeighted(df: DataFrame, value: String,
      weight: Column, shardSpan: Long): (DataFrame, Long) = {
    val spark = df.sparkSession
    val vc = df.filter(col(value).isNotNull)
      .groupBy(col(value)).agg(sum(weight).as("_c"))
      .withColumn("_sh", expr(s"$value div $shardSpan"))
      .cache()
    val totals = vc.groupBy(col("_sh")).agg(sum(col("_c")).as("_t"))
      .orderBy("_sh").collect()
    var acc = 0L
    val offs = totals.map { r => val o = (r.getLong(0), acc); acc += r.getLong(1); o }
    val n = acc
    val offDf = spark.createDataFrame(offs.toSeq).toDF("_sh", "_off")
    val w = Window.partitionBy(col("_sh")).orderBy(col(value))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    (vc.join(broadcast(offDf), "_sh")
      .withColumn("_cum", sum(col("_c")).over(w) + col("_off")), n)
  }

  /** Exact GLOBAL WEIGHTED discrete quantiles over a BIGINT column with
    * POSITIVE BIGINT weights: for fraction `num/den`, the smallest value
    * whose cumulative WEIGHT reaches `⌈num·W/den⌉` (W = total weight) —
    * definitionally the discrete quantile of the multiset where each row
    * appears `weight` times, without ever expanding it (the expansion IS
    * the naive formulation; a quantity-weighted price median at 100 TB
    * cannot materialize per-unit rows). Thresholds are integer-exact
    * (`(num·W + den − 1) div den`) driver literals off the shard-totals
    * collect; one CDF pass serves every fraction. Weight-1 degenerates
    * to [[discGlobalMulti]]'s ceil(p·n) rule exactly (spec-pinned).
    * NULL values and NULL weights are excluded; empty input → one
    * all-NULL row. */
  def discGlobalWeighted(df: DataFrame, value: String, weight: String,
      fracs: Seq[(Long, Long)], outNames: Seq[String],
      shardSpan: Long = 1000000000L): DataFrame = {
    require(fracs.length == outNames.length)
    require(fracs.forall { case (num, den) => den > 0 && num >= 0 && num <= den })
    // the POSITIVE-weight contract is enforced, not just documented
    // (round-10 ADVICE): a zero/negative weight breaks the cumulative-
    // weight monotonicity the threshold rule depends on, silently
    // yielding wrong quantiles — raise loudly instead (the
    // keepBestCanonicalWide out-of-domain rule). NULL weights stay
    // excluded like NULL values.
    val checked = when(col(weight) <= 0,
      expr(s"raise_error('discGlobalWeighted: non-positive weight " +
        s"(the contract is weight > 0)')").cast("long"))
      .otherwise(col(weight))
    val (cdf, tw) = globalCdfWeighted(df.filter(col(weight).isNotNull),
      value, checked, shardSpan)
    val aggs = fracs.zip(outNames).map { case ((num, den), name) =>
      val thr = (num * tw + den - 1) / den
      min(when(col("_cum") >= lit(thr), col(value))).as(name)
    }
    cdf.agg(aggs.head, aggs.tail: _*)
  }

  /** Exact GLOBAL INTERPOLATED quantiles over a BIGINT column, in
    * SCALED INTEGERS — the continuous twin of [[discGlobalMulti]], with
    * the driver-gate float rule built into the contract: for fraction
    * `num/den`, `pos = (num·(n−1)) / den` exactly (rational, never a
    * double), the lo/hi bracket ranks are `⌊pos⌋+1` / `⌈pos⌉+1`, and
    * the output column is `den·lo + (hi−lo)·((num·(n−1)) mod den)` —
    * the interpolated value times `den`, ONE integer representation, so
    * the hash gate cannot be flipped by float-repr skew at any
    * parallelism (÷den client-side recovers the conventional value;
    * `percentile_cont` parity up to that exact scaling). Ranks are
    * driver literals (n comes off the shard-totals collect), so the
    * bracket aggregation is one pass over the CDF frame. Empty input →
    * one all-NULL row (the agg-over-empty path; negative intermediate
    * ranks are harmless — `when` never fires). */
  def contGlobalScaled(df: DataFrame, value: String,
      fracs: Seq[(Long, Long)], outNames: Seq[String],
      shardSpan: Long = 1000000000L): DataFrame = {
    require(fracs.length == outNames.length)
    require(fracs.forall { case (num, den) => den > 0 && num >= 0 && num <= den })
    val (cdf, n) = globalCdf(df, value, shardSpan)
    def split(num: Long, den: Long): (Long, Long) =
      ((num * (n - 1)) / den, (num * (n - 1)) % den)
    val aggs = fracs.zip(outNames).flatMap { case ((num, den), name) =>
      val (fl, rem) = split(num, den)
      val hiR = fl + (if (rem > 0) 1L else 0L) + 1L
      Seq(min(when(col("_cum") >= lit(fl + 1), col(value))).as(s"_lo_$name"),
        min(when(col("_cum") >= lit(hiR), col(value))).as(s"_hi_$name"))
    }
    val bracketed = cdf.agg(aggs.head, aggs.tail: _*)
    val outs = fracs.zip(outNames).map { case ((num, den), name) =>
      val rem = split(num, den)._2
      (lit(den) * col(s"_lo_$name") +
        (col(s"_hi_$name") - col(s"_lo_$name")) * lit(rem)).as(name)
    }
    bracketed.select(outs: _*)
  }

  /** Exact GLOBAL EQUI-DEPTH histogram (quantile binning) over a
    * non-negative BIGINT column — the distributed replacement for a
    * global `ntile(B)` (whose empty partitionSpec is the banned
    * single-reducer WindowExec) and the exact, value-atomic contract
    * approximate binners don't give: every DISTINCT value lands wholly
    * in bucket `⌈cum·B/n⌉ ∈ [1, B]` where `cum` is the value's LAST
    * position in the sorted multiset, so equal values never split
    * across buckets and the assignment is a pure integer function of
    * the CDF — deterministic at any parallelism (ML feature
    * bucketization at 100 TB with no global sort; same one-pass CDF as
    * [[discGlobalMulti]]). Depths are ~n/B, distorted only by heavy
    * values — which MUST distort: a value outweighing a bucket cannot
    * split under the value-atomic contract. Returns
    * (bucket, n_rows, lo, hi) per non-empty bucket, ordered by bucket.
    * Empty input → empty frame (the div-by-n expression is never built:
    * n comes off the shard-totals collect before the plan is closed). */
  def equidepthGlobal(df: DataFrame, value: String, buckets: Int,
      shardSpan: Long = 1000000000L): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    val (cdf, n) = globalCdf(df, value, shardSpan)
    if (n == 0)
      // empty CDF: reuse its (value, _c) columns for an empty frame of
      // the contract schema — no div-by-zero expression ever exists
      cdf.select(col(value).as("bucket"), col("_c").as("n_rows"),
        col(value).as("lo"), col(value).as("hi")).limit(0)
    else
      cdf.withColumn("bucket",
          expr(s"(_cum * ${buckets}L + ${n - 1}L) div ${n}L"))
        .groupBy(col("bucket"))
        .agg(sum(col("_c")).as("n_rows"),
          min(col(value)).as("lo"), max(col(value)).as("hi"))
        .orderBy(col("bucket"))
  }

  /** Exact GLOBAL ROBUST STATISTICS over a BIGINT column: median, MAD
    * (median absolute deviation), and the count of k·MAD outliers —
    * the adaptive outlier cut curation pipelines reach for when fixed
    * thresholds (t30's Gopher bounds) don't transfer across corpora.
    * Median and MAD are inherently SEQUENTIAL (the deviation multiset
    * needs the median first), so each lands as a driver literal off its
    * own one-pass distributed CDF (two blocking rounds — the BPE-winner
    * / IVF-seed precedent for 1-row round results), and a final
    * map-combined aggregation counts `|v − med| > k·MAD`. Everything is
    * BIGINT end-to-end: the discrete-median rank rule (ceil(n/2), the
    * [[discGlobal]] contract DuckDB `quantile_disc` matches
    * rank-for-rank) on both passes, absolute deviations exact, the
    * threshold an integer product — no float surface anywhere. Returns
    * ONE row (med, mad, n_outliers, n); empty input → one all-NULL row
    * (the [[discGlobal]] convention). */
  def robustStatsGlobal(df: DataFrame, value: String, k: Long,
      outNames: Seq[String], shardSpan: Long = 1000000000L): DataFrame = {
    require(outNames.length == 4 && k > 0)
    val medRow = discGlobal(df, value, 0.5, "m", shardSpan).collect().head
    if (medRow.isNullAt(0)) {
      val nulls = outNames.map(n => lit(null).cast("long").as(n))
      df.sparkSession.range(1).select(nulls: _*)
    } else {
      val med = medRow.getLong(0)
      val dev = df.filter(col(value).isNotNull)
        .select(abs(col(value) - lit(med)).as("_d"))
      val mad = discGlobal(dev, "_d", 0.5, "md", shardSpan)
        .collect().head.getLong(0)
      df.filter(col(value).isNotNull)
        .agg(
          sum(when(abs(col(value) - lit(med)) > lit(k * mad), 1L)
            .otherwise(0L)).as("_o"),
          count(lit(1)).as("_n"))
        .select(lit(med).as(outNames(0)), lit(mad).as(outNames(1)),
          col("_o").as(outNames(2)), col("_n").as(outNames(3)))
    }
  }

  /** [[robustStatsGlobal]] BY KEY — per-group median / MAD / k·MAD
    * outlier count, completing the global/by-key matrix the disc/cont
    * quantiles already have. Unlike the global variant nothing touches
    * the driver: the per-key medians stay distributed and join back
    * onto the rows (every shuffle — both [[discByKey]] passes, both
    * joins, the final count — keys on the SAME group column, so the
    * planner reuses the partitioning), deviations re-rank per key, and
    * one aggregation counts `|v − med| > k·mad` per group. All-BIGINT
    * end-to-end like the global twin. NON-NULL KEY contract: the
    * medians join back with an equi-join, which would drop a NULL-key
    * group ([[discByKey]] alone keeps it) — callers on nullable keys
    * must pre-coalesce the key. Returns (key, med, mad, n_outliers, n)
    * per group, unordered. */
  def robustStatsByKey(df: DataFrame, key: String, value: String, k: Long,
      outNames: Seq[String]): DataFrame = {
    require(outNames.length == 4 && k > 0)
    val base = df.filter(col(value).isNotNull)
    val med = discByKey(base, key, value, Seq(0.5), Seq("_med"))
    // dev is referenced TWICE (the MAD pass and the final join) — cache
    // it or its whole lineage (scan, aggs, median window) plans twice
    // (query-scoped; Verify/Bench/spec harnesses clearCache after —
    // the exceptAll-gate precedent)
    val dev = base.join(med, Seq(key))
      .withColumn("_d", abs(col(value) - col("_med")))
      .cache()
    val mad = discByKey(dev, key, "_d", Seq(0.5), Seq("_mad"))
    dev.join(mad, Seq(key))
      .groupBy(col(key))
      .agg(max(col("_med")).as(outNames(0)), max(col("_mad")).as(outNames(1)),
        sum(when(col("_d") > lit(k) * col("_mad"), 1L).otherwise(0L))
          .as(outNames(2)),
        count(lit(1)).as(outNames(3)))
  }

  /** [[equidepthGlobal]] BY KEY — exact per-group quantile binning off
    * the per-key CDF ([[ranked]]): every distinct value lands wholly in
    * bucket `(_cum·B + _n−1) div _n ∈ [1, B]` within its group (the
    * value-atomic contract), the data-profiling shape users reach for
    * first (per-source length histograms). NO driver round-trips — the
    * by-key CDF needs no shard-offset collect because the window
    * partitions on the REAL group key — and every shuffle keys on the
    * group column (the q96 discipline; pinned in PlanShapeSpec).
    * Returns (key, bucket, n_rows, lo, hi) per non-empty bucket,
    * unordered. */
  def equidepthByKey(df: DataFrame, key: String, value: String,
      buckets: Int): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    ranked(df, key, value)
      .withColumn("bucket",
        expr(s"(_cum * ${buckets}L + _n - 1L) div _n"))
      .groupBy(col(key), col("bucket"))
      .agg(sum(col("_c")).as("n_rows"),
        min(col(value)).as("lo"), max(col(value)).as("hi"))
  }

  /** [[contGlobalScaled]] BY KEY — per-group exact interpolated
    * quantiles in SCALED INTEGERS: for fraction `num/den`,
    * `pos = num·(n−1)/den` is kept rational PER KEY (`n` varies by
    * group, so the bracket ranks are integer COLUMNS, not driver
    * literals — nothing touches the driver), and the output is
    * `den·lo + (hi−lo)·((num·(n−1)) mod den)` — `percentile_cont`
    * times `den` in ONE integer representation, immune to float-repr
    * skew at any parallelism. Same one-partitioning discipline as
    * [[equidepthByKey]]. Returns (key, outNames…), unordered. */
  def contScaledByKey(df: DataFrame, key: String, value: String,
      fracs: Seq[(Long, Long)], outNames: Seq[String]): DataFrame = {
    require(fracs.length == outNames.length)
    require(fracs.forall { case (num, den) => den > 0 && num >= 0 && num <= den })
    var r = ranked(df, key, value)
    val aggs = scala.collection.mutable.ArrayBuffer[Column]()
    fracs.zip(outNames).foreach { case ((num, den), name) =>
      // integer bracket ranks per key: lo rank = fl+1; hi rank adds 1
      // only when the rational position has a remainder
      r = r.withColumn(s"_fl_$name", expr(s"($num * (_n - 1)) div $den"))
        .withColumn(s"_rem_$name", expr(s"($num * (_n - 1)) % $den"))
      aggs += min(when(col("_cum") >= col(s"_fl_$name") + 1, col(value)))
        .as(s"_lo_$name")
      aggs += min(when(col("_cum") >= col(s"_fl_$name")
          + when(col(s"_rem_$name") > 0, 2L).otherwise(1L), col(value)))
        .as(s"_hi_$name")
      aggs += max(col(s"_rem_$name")).as(s"_r_$name")
    }
    val bracketed = r.groupBy(col(key)).agg(aggs.head, aggs.tail.toSeq: _*)
    val outs = fracs.zip(outNames).map { case ((_, den), name) =>
      (lit(den) * col(s"_lo_$name")
        + (col(s"_hi_$name") - col(s"_lo_$name")) * col(s"_r_$name")).as(name)
    }
    bracketed.select(col(key) +: outs: _*)
  }

  /** [[discGlobalWeighted]] BY KEY — per-group exact weighted discrete
    * quantiles, completing the disc/cont/weighted × global/by-key
    * matrix: for fraction `num/den`, the smallest value whose per-key
    * cumulative WEIGHT reaches `⌈num·W(key)/den⌉` — the quantile of
    * the per-key multiset where each row appears `weight` times,
    * never expanded. Thresholds are integer COLUMNS (W varies per
    * key — no driver round-trips), the positive-weight contract
    * raises like the global twin, NULL weights are excluded, and
    * every shuffle keys on the group column. */
  def discWeightedByKey(df: DataFrame, key: String, value: String,
      weight: String, fracs: Seq[(Long, Long)],
      outNames: Seq[String]): DataFrame = {
    require(fracs.length == outNames.length)
    require(fracs.forall { case (num, den) => den > 0 && num >= 0 && num <= den })
    val checked = when(col(weight) <= 0,
      expr("raise_error('discWeightedByKey: non-positive weight " +
        "(the contract is weight > 0)')").cast("long"))
      .otherwise(col(weight))
    val aggs = fracs.zip(outNames).map { case ((num, den), name) =>
      min(when(col("_cum") >= expr(s"($num * _n + ${den - 1}) div $den"),
        col(value))).as(name)
    }
    rankedWeighted(df.filter(col(weight).isNotNull), key, value, checked)
      .groupBy(col(key)).agg(aggs.head, aggs.tail: _*)
  }

  /** Exact discrete percentiles (`percentile_disc`): one output column per
    * fraction, named by `outNames`. */
  def discByKey(df: DataFrame, key: String, value: String,
      ps: Seq[Double], outNames: Seq[String]): DataFrame = {
    require(ps.length == outNames.length)
    val aggs = ps.zip(outNames).map { case (p, name) =>
      // smallest value whose cumulative count reaches ceil(p·n); the
      // double ceil(p·n) matches the sorted-array element formulation
      // (and the DuckDB oracle) ulp-for-ulp
      min(when(col("_cum") >= ceil(lit(p) * col("_n")), col(value))).as(name)
    }
    ranked(df, key, value).groupBy(col(key)).agg(aggs.head, aggs.tail: _*)
  }

  /** Exact interpolated percentiles (builtin `percentile` parity): one
    * output column per fraction, named by `outNames`. */
  def contByKey(df: DataFrame, key: String, value: String,
      ps: Seq[Double], outNames: Seq[String]): DataFrame = {
    require(ps.length == outNames.length)
    // per-row (within a key): pos = p·(n-1), 1-based bracket ranks
    def pos(p: Double): Column = lit(p) * (col("_n") - 1).cast("double")
    val aggs = scala.collection.mutable.ArrayBuffer[Column](max(col("_n")).as("_n"))
    ps.zip(outNames).foreach { case (p, name) =>
      aggs += min(when(col("_cum") >= floor(pos(p)) + 1, col(value))).as(s"_lo_$name")
      aggs += min(when(col("_cum") >= ceil(pos(p)) + 1, col(value))).as(s"_hi_$name")
    }
    val bracketed = ranked(df, key, value)
      .groupBy(col(key)).agg(aggs.head, aggs.tail.toSeq: _*)
    val outs = ps.zip(outNames).map { case (p, name) =>
      val posN = lit(p) * (col("_n") - 1).cast("double")
      val frac = posN - floor(posN)
      // builtin Percentile.getPercentile's exact op order:
      // lower + (higher - lower) * (pos - floor(pos))
      (col(s"_lo_$name") + (col(s"_hi_$name") - col(s"_lo_$name")) * frac).as(name)
    }
    bracketed.select(col(key) +: outs: _*)
  }
}
