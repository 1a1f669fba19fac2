package graft

import org.apache.spark.sql.functions._

import graft.operators.{ExactPercentile, Relational}

/** The bounded exact-percentile path: value parity with the builtins,
  * behavior on a skewed (hot-key) fixture, and the plan-shape guarantee
  * that the percentile-family queries no longer buffer whole groups in an
  * aggregation buffer (`collect_list` / builtin `percentile`). */
class ExactPercentileSpec extends SparkSpec {
  import spark.implicits._

  private def fixture = {
    // deterministic, tie-heavy: values collide across and within keys
    (1 to 5000).map { i =>
      val key = if (i % 10 < 7) "hot" else if (i % 10 < 9) "warm" else "cold"
      (key, ((i * 37) % 400).toDouble / 4.0)
    }.toDF("k", "v")
  }

  test("contByKey is bit-identical to the builtin percentile()") {
    val ours = ExactPercentile.contByKey(fixture, "k", "v",
        Seq(0.25, 0.5, 0.9, 0.99), Seq("p25", "p50", "p90", "p99"))
      .orderBy("k").collect()
    val builtin = fixture.groupBy("k")
      .agg(expr("percentile(v, array(0.25D, 0.5D, 0.9D, 0.99D))").as("ps"))
      .orderBy("k").collect()
    assert(ours.length == 3)
    ours.zip(builtin).foreach { case (o, b) =>
      assert(o.getString(0) == b.getString(0))
      val ref = b.getSeq[Double](1)
      (1 to 4).foreach(i => assert(o.getDouble(i) == ref(i - 1),
        s"key ${o.getString(0)} fraction #$i: ${o.getDouble(i)} != ${ref(i - 1)}"))
    }
  }

  test("discByKey equals element ceil(p*n) of the sorted multiset") {
    val ours = ExactPercentile.discByKey(fixture, "k", "v",
        Seq(0.5, 0.9), Seq("d50", "d90")).orderBy("k").collect()
    val ref = fixture.groupBy("k")
      .agg(sort_array(collect_list(col("v"))).as("sorted"))
      .select(col("k"),
        element_at(col("sorted"), ceil(lit(0.5) * size(col("sorted"))).cast("int")).as("d50"),
        element_at(col("sorted"), ceil(lit(0.9) * size(col("sorted"))).cast("int")).as("d90"))
      .orderBy("k").collect()
    assert(ours.map(_.toString).toSeq == ref.map(_.toString).toSeq)
  }

  test("a NULL key forms a group like the builtins (null-safe totals join)") {
    // round-4 ADVICE: the totals equi-join silently dropped the NULL-key
    // group; percentile()/percentile_disc emit a row for it
    val df = Seq((Some("a"), 1.0), (Some("a"), 3.0), (None, 10.0), (None, 30.0), (None, 50.0))
      .toDF("k", "v")
    val ours = ExactPercentile.contByKey(df, "k", "v", Seq(0.5), Seq("p50"))
      .collect().map(r => Option(r.getString(0)) -> r.getDouble(1)).toMap
    val builtin = df.groupBy("k").agg(expr("percentile(v, 0.5D)").as("p50"))
      .collect().map(r => Option(r.getString(0)) -> r.getDouble(1)).toMap
    assert(ours == builtin, s"ours=$ours builtin=$builtin")
    assert(ours.contains(None), "NULL-key group missing")
    val disc = ExactPercentile.discByKey(df, "k", "v", Seq(0.5), Seq("d50"))
      .collect().map(r => Option(r.getString(0)) -> r.getDouble(1)).toMap
    assert(disc == Map(Some("a") -> 1.0, None -> 30.0), s"disc=$disc")
  }

  test("skewed fixture: hot key with 200k rows stays exact (no whole-group buffer)") {
    // 200k rows on one key, only 1000 distinct values: per-(key,value)
    // count state is 1000 entries, where collect_list would buffer 200k
    val hot = spark.range(200000)
      .select(lit("hot").as("k"), (col("id") % 1000).cast("double").as("v"))
      .union(spark.range(100)
        .select(lit("tiny").as("k"), col("id").cast("double").as("v")))
    val got = ExactPercentile.discByKey(hot, "k", "v", Seq(0.5), Seq("d50"))
      .orderBy("k").collect()
    // hot: 200 copies each of 0..999 → rank 100000 → value 499 (ceil(0.5*200000)=100000 → 499.0)
    assert(got(0).getString(0) == "hot" && got(0).getDouble(1) == 499.0)
    // tiny: ceil(0.5*100)=50 → value 49.0
    assert(got(1).getString(0) == "tiny" && got(1).getDouble(1) == 49.0)
    val cont = ExactPercentile.contByKey(hot, "k", "v", Seq(0.5), Seq("p50"))
      .filter(col("k") === "hot").collect().head.getDouble(1)
    val builtin = hot.filter(col("k") === "hot")
      .agg(expr("percentile(v, 0.5)")).collect().head.getDouble(0)
    assert(cont == builtin)
  }

  test("null values are excluded like the builtin") {
    val df = Seq(("a", Some(1.0)), ("a", None), ("a", Some(3.0)), ("a", Some(2.0)))
      .toDF("k", "v")
    val got = ExactPercentile.contByKey(df, "k", "v", Seq(0.5), Seq("p50"))
      .collect().head.getDouble(1)
    val ref = df.agg(expr("percentile(v, 0.5)")).collect().head.getDouble(0)
    assert(got == ref && got == 2.0)
  }

  test("discGlobal matches element ceil(p*n) across fractions and counts (incl. exact-rank boundaries)") {
    // round-7 ADVICE: the doc's convention claim was only exercised at
    // p=0.5 — pin the rank rule across fractions whose p*n lands exactly
    // on an integer (0.25*100, 0.5*64) and ones that don't, and across
    // counts small enough that an off-by-one index is visible
    val counts = Seq(7L, 64L, 100L, 1001L)
    val ps = Seq(0.1, 0.25, 0.5, 0.75, 0.9, 0.95, 0.99)
    for (n <- counts; p <- ps) {
      // values 10*(i%k)+3: ties + non-contiguous, deterministic
      val vals = (1L to n).map(i => 10L * (i % 17) + 3L)
      val df = vals.toDF("v")
      val got = ExactPercentile.discGlobal(df, "v", p, "d")
        .collect().head.getLong(0)
      val sorted = vals.sorted
      val want = sorted(math.ceil(p * n).toInt - 1)
      assert(got == want, s"n=$n p=$p: got $got want $want")
    }
    // multi-shard path: values spanning several shardSpan buckets
    val wide = (1L to 500L).map(i => i * 7919L)
    val gotW = ExactPercentile.discGlobal(wide.toDF("v"), "v", 0.9, "d",
      shardSpan = 100000L).collect().head.getLong(0)
    assert(gotW == wide.sorted.apply(math.ceil(0.9 * 500).toInt - 1))
  }

  test("contGlobalScaled equals den-scaled sorted-multiset interpolation across fractions and counts") {
    // plain reference: pos = num*(n-1)/den rational; res_xden =
    // den*lo + (hi-lo)*rem — exercises rem=0 boundaries (num*(n-1)
    // divisible by den), ties, and multi-shard
    def ref(vals: Seq[Long], num: Long, den: Long): Long = {
      val s = vals.sorted
      val fl = (num * (s.size - 1)) / den
      val rem = (num * (s.size - 1)) % den
      val lo = s(fl.toInt)
      val hi = s(math.min(fl + (if (rem > 0) 1 else 0), s.size - 1L).toInt)
      den * lo + (hi - lo) * rem
    }
    val counts = Seq(2L, 7L, 64L, 100L, 101L)
    val fracs = Seq((0L, 4L), (1L, 4L), (2L, 4L), (3L, 4L), (4L, 4L),
      (1L, 3L), (9L, 10L))
    for (n <- counts) {
      val vals = (1L to n).map(i => 10L * (i % 17) + 3L)
      val got = ExactPercentile.contGlobalScaled(vals.toDF("v"), "v",
        fracs, fracs.indices.map(i => s"o$i"))
        .collect().head
      fracs.zipWithIndex.foreach { case ((num, den), i) =>
        assert(got.getLong(i) == ref(vals, num, den),
          s"n=$n frac=$num/$den: got ${got.getLong(i)} want ${ref(vals, num, den)}")
      }
    }
    // multi-shard path + empty input (one all-NULL row)
    val wide = (1L to 500L).map(i => i * 7919L)
    val gotW = ExactPercentile.contGlobalScaled(wide.toDF("v"), "v",
      Seq((3L, 4L)), Seq("o"), shardSpan = 100000L).collect().head.getLong(0)
    assert(gotW == ref(wide, 3L, 4L))
    val empty = ExactPercentile.contGlobalScaled(
      Seq.empty[Long].toDF("v"), "v", Seq((1L, 2L)), Seq("o")).collect()
    assert(empty.length == 1 && empty.head.isNullAt(0))
  }

  test("discGlobalWeighted equals the expanded-multiset discrete quantile; weight-1 degenerates to discGlobal") {
    // the contract: quantile of the multiset where each row appears
    // `weight` times, never materialized — the reference expands it
    val rows = (1L to 60L).map(i => (10L * (i % 13) + 3L, (i % 7) + 1L))
    val df = rows.toDF("v", "w")
    val fracs = Seq((1L, 4L), (1L, 2L), (3L, 4L), (9L, 10L), (1L, 1L))
    val got = ExactPercentile.discGlobalWeighted(df, "v", "w",
      fracs, fracs.indices.map(i => s"o$i")).collect().head
    val expanded = rows.flatMap { case (v, w) => Seq.fill(w.toInt)(v) }.sorted
    fracs.zipWithIndex.foreach { case ((num, den), i) =>
      val thr = (num * expanded.size + den - 1) / den
      val want = expanded(math.max(thr, 1L).toInt - 1)
      assert(got.getLong(i) == want, s"frac=$num/$den: got ${got.getLong(i)} want $want")
    }
    // weight-1 ≡ the unweighted ceil(p·n) rule
    val ones = rows.map { case (v, _) => (v, 1L) }
    val g1 = ExactPercentile.discGlobalWeighted(ones.toDF("v", "w"), "v", "w",
      Seq((3L, 4L)), Seq("o")).collect().head.getLong(0)
    val g2 = ExactPercentile.discGlobal(ones.map(_._1).toDF("v"), "v", 0.75, "o")
      .collect().head.getLong(0)
    assert(g1 == g2)
    // empty input → one all-NULL row
    val empty = ExactPercentile.discGlobalWeighted(
      Seq.empty[(Long, Long)].toDF("v", "w"), "v", "w",
      Seq((1L, 2L)), Seq("o")).collect()
    assert(empty.length == 1 && empty.head.isNullAt(0))
    // the positive-weight contract RAISES on zero/negative weights
    // instead of silently breaking cumulative-weight monotonicity
    for (bad <- Seq(0L, -2L)) {
      val ex = intercept[Exception] {
        ExactPercentile.discGlobalWeighted(
          Seq((1L, bad), (2L, 3L)).toDF("v", "w"), "v", "w",
          Seq((1L, 2L)), Seq("m")).collect()
      }
      def chain(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ chain(t.getCause)
      assert(chain(ex).exists(_.contains("non-positive weight")),
        s"weight=$bad: ${chain(ex)}")
    }
    // NULL weights stay excluded (never hit the guard)
    val withNull = ExactPercentile.discGlobalWeighted(
      (rows.map { case (v, w) => (v, Some(w)) } :+ ((999L, None: Option[Long])))
        .toDF("v", "w"), "v", "w", Seq((1L, 1L)), Seq("o"))
      .collect().head.getLong(0)
    assert(withNull == expanded.last, "NULL-weight row leaked into the CDF")
  }

  test("equidepthGlobal equals the sorted-multiset bucket rule across counts, B, ties, and skew") {
    // plain reference: bucket of a distinct value = ceil(lastpos*B/n)
    // over the sorted multiset; aggregate rows/min/max per bucket
    def reference(vals: Seq[Long], b: Int): Seq[(Long, Long, Long, Long)] = {
      val n = vals.size.toLong
      val byVal = vals.groupBy(identity).view.mapValues(_.size.toLong)
        .toSeq.sortBy(_._1)
      var cum = 0L
      byVal.map { case (v, c) =>
        cum += c
        ((cum * b + n - 1) / n, v, c)
      }.groupBy(_._1).toSeq.map { case (bk, g) =>
        (bk, g.map(_._3).sum, g.map(_._2).min, g.map(_._2).max)
      }.sortBy(_._1)
    }
    val fixtures = Seq(
      (1L to 100L).map(i => 10L * (i % 17) + 3L),           // tie-heavy
      (1L to 7L).map(i => i * 5L),                          // n < B cases
      (1L to 5000L).map(i => if (i <= 4000L) 42L else i),   // heavy value spans buckets
      (1L to 500L).map(i => i * 7919L))                     // multi-shard values
    for (vals <- fixtures; b <- Seq(1, 4, 16)) {
      val got = ExactPercentile.equidepthGlobal(vals.toDF("v"), "v", b,
          shardSpan = 100000L).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
      assert(got == reference(vals, b),
        s"n=${vals.size} B=$b: got $got want ${reference(vals, b)}")
    }
    // contract edges: buckets are 1..B, non-empty, rows sum to n,
    // value ranges are disjoint and ordered
    val vals = (1L to 1000L).map(i => (i * 37L) % 400L)
    val rows = ExactPercentile.equidepthGlobal(vals.toDF("v"), "v", 16).collect()
    assert(rows.map(_.getLong(1)).sum == 1000L)
    assert(rows.forall(r => r.getLong(0) >= 1L && r.getLong(0) <= 16L))
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getLong(3) < b.getLong(2), "bucket value ranges must be disjoint, ordered")
    case _ => }
    // empty input → empty frame with the contract schema
    val empty = ExactPercentile.equidepthGlobal(Seq.empty[Long].toDF("v"), "v", 16)
    assert(empty.columns.toSeq == Seq("bucket", "n_rows", "lo", "hi"))
    assert(empty.collect().isEmpty)
  }

  test("discWeightedByKey equals the per-group expanded-multiset quantile; raises on weight<=0") {
    val rows = (1L to 80L).map(i =>
      (s"k${i % 3}", 10L * (i % 13) + 3L, (i % 7) + 1L))
    val df = rows.toDF("k", "v", "w")
    val fracs = Seq((1L, 4L), (1L, 2L), (3L, 4L), (1L, 1L))
    val got = ExactPercentile.discWeightedByKey(df, "k", "v", "w",
        fracs, fracs.indices.map(i => s"o$i")).collect()
      .map(r => r.getString(0) -> fracs.indices.map(i => r.getLong(i + 1))).toMap
    rows.groupBy(_._1).foreach { case (k, g) =>
      val expanded = g.flatMap { case (_, v, w) => Seq.fill(w.toInt)(v) }.sorted
      fracs.zipWithIndex.foreach { case ((num, den), i) =>
        val thr = (num * expanded.size + den - 1) / den
        val want = expanded(math.max(thr, 1L).toInt - 1)
        assert(got(k)(i) == want, s"key=$k frac=$num/$den: got ${got(k)(i)} want $want")
      }
    }
    // positive-weight contract raises (the discGlobalWeighted rule)
    val ex = intercept[Exception] {
      ExactPercentile.discWeightedByKey(
        Seq(("a", 1L, 0L)).toDF("k", "v", "w"), "k", "v", "w",
        Seq((1L, 2L)), Seq("m")).collect()
    }
    def chain(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ chain(t.getCause)
    assert(chain(ex).exists(_.contains("non-positive weight")), chain(ex))
  }

  test("equidepthByKey equals the per-group sorted-multiset bucket rule") {
    def reference(vals: Seq[Long], b: Int): Seq[(Long, Long, Long, Long)] = {
      val n = vals.size.toLong
      val byVal = vals.groupBy(identity).view.mapValues(_.size.toLong)
        .toSeq.sortBy(_._1)
      var cum = 0L
      byVal.map { case (v, c) =>
        cum += c
        ((cum * b + n - 1) / n, v, c)
      }.groupBy(_._1).toSeq.map { case (bk, g) =>
        (bk, g.map(_._3).sum, g.map(_._2).min, g.map(_._2).max)
      }
    }
    // per-key shapes: tie-heavy, n < B, one heavy value spanning buckets
    val data = Map(
      "a" -> (1L to 100L).map(i => 10L * (i % 17) + 3L),
      "b" -> (1L to 3L).map(_ * 5L),
      "c" -> (1L to 800L).map(i => if (i <= 600L) 42L else i))
    val df = data.toSeq.flatMap { case (k, vs) => vs.map(k -> _) }.toDF("k", "v")
    for (b <- Seq(1, 4, 8)) {
      val got = ExactPercentile.equidepthByKey(df, "k", "v", b).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).toSet
      val want = data.flatMap { case (k, vs) =>
        reference(vs, b).map { case (bk, n, lo, hi) => (k, bk, n, lo, hi) }
      }.toSet
      assert(got == want, s"B=$b: extra=${got -- want} missing=${want -- got}")
    }
  }

  test("contScaledByKey equals den-scaled per-group interpolation (incl. rem=0 exact ranks)") {
    def reference(vals: Seq[Long], num: Long, den: Long): Long = {
      val sorted = vals.sorted
      val n = sorted.size.toLong
      val posNum = num * (n - 1)
      val fl = (posNum / den).toInt
      val rem = posNum % den
      val lo = sorted(fl)
      val hi = sorted(fl + (if (rem > 0) 1 else 0))
      den * lo + (hi - lo) * rem
    }
    // group sizes chosen so (n-1) hits rem=0 (n=5: q1 pos exact) and
    // rem>0 brackets; ties included
    val data = Map(
      "a" -> Seq(10L, 20L, 30L, 40L, 50L),
      "b" -> (1L to 7L).map(i => (i * 31L) % 50L).toSeq,
      "c" -> Seq(5L, 5L, 5L, 9L),
      "d" -> Seq(100L))
    val df = data.toSeq.flatMap { case (k, vs) => vs.map(k -> _) }.toDF("k", "v")
    val fracs = Seq((1L, 4L), (2L, 4L), (3L, 4L))
    val got = ExactPercentile.contScaledByKey(df, "k", "v", fracs,
        Seq("q1", "q2", "q3")).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    data.foreach { case (k, vs) =>
      val want = (reference(vs, 1, 4), reference(vs, 2, 4), reference(vs, 3, 4))
      assert(got(k) == want, s"key=$k: got ${got(k)} want $want")
    }
  }

  test("winsorization composition (q100 shape) equals the plain-Scala clip reference") {
    // the q100 pipeline over a generated frame: per-key P5/P95 via
    // discByKey, clip, count, sum — referenced against a plain-Scala
    // sorted-multiset winsorization
    val rows = (1 to 400).map { i =>
      val k = s"k${i % 4}"
      val v = if (i % 37 == 0) 100000L + i else ((i * 131) % 997).toLong
      (k, v)
    }
    val df = rows.toDF("k", "v").cache()
    val qs = ExactPercentile.discByKey(df, "k", "v", Seq(0.05, 0.95), Seq("p05", "p95"))
    val got = df.join(qs, Seq("k")).groupBy(col("k"))
      .agg(sum(when(col("v") < col("p05") || col("v") > col("p95"), 1L)
        .otherwise(0L)).as("nc"),
        sum(greatest(least(col("v"), col("p95")), col("p05"))).as("ws"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    rows.groupBy(_._1).foreach { case (k, g) =>
      val vs = g.map(_._2).sorted
      def fence(p: Double) = vs(math.max(math.ceil(p * vs.size).toLong, 1L).toInt - 1)
      val (lo, hi) = (fence(0.05), fence(0.95))
      val nc = vs.count(v => v < lo || v > hi).toLong
      val ws = vs.map(v => math.max(math.min(v, hi), lo)).sum
      assert(got(k) == ((nc, ws)), s"key=$k: got ${got(k)} want ${(nc, ws)}")
    }
    spark.sharedState.cacheManager.clearCache()
  }

  test("robustStatsGlobal equals the plain-Scala median/MAD/outlier reference") {
    def reference(vals: Seq[Long], k: Long): (Long, Long, Long, Long) = {
      def medOf(xs: Seq[Long]): Long = {
        val s = xs.sorted
        s(math.ceil(0.5 * s.size).toInt - 1)  // the ceil(p*n) disc rule
      }
      val m = medOf(vals)
      val md = medOf(vals.map(v => math.abs(v - m)))
      (m, md, vals.count(v => math.abs(v - m) > k * md).toLong, vals.size.toLong)
    }
    val fixtures = Seq(
      (1L to 100L).map(i => 10L * (i % 17) + 3L),          // tie-heavy, no tail
      (1L to 200L).map(i => if (i % 50 == 0) i * 1000L else i % 40L), // genuine outliers
      Seq.fill(30)(7L),                                    // all-equal: MAD 0, outliers = non-median values (none)
      (1L to 500L).map(i => i * 7919L))                    // multi-shard
    for (vals <- fixtures; k <- Seq(1L, 3L)) {
      val got = ExactPercentile.robustStatsGlobal(vals.toDF("v"), "v", k,
          Seq("m", "md", "o", "n"), shardSpan = 100000L).collect().head
      val want = reference(vals, k)
      assert((got.getLong(0), got.getLong(1), got.getLong(2), got.getLong(3)) == want,
        s"n=${vals.size} k=$k: got $got want $want")
    }
    // empty input → one all-NULL row (the discGlobal convention)
    val empty = ExactPercentile.robustStatsGlobal(
      Seq.empty[Long].toDF("v"), "v", 3L, Seq("m", "md", "o", "n")).collect()
    assert(empty.length == 1 && (0 to 3).forall(empty.head.isNullAt))
  }

  test("robustStatsByKey equals the per-group plain-Scala reference; null values excluded") {
    def medOf(xs: Seq[Long]): Long = {
      val s = xs.sorted; s(math.ceil(0.5 * s.size).toInt - 1)
    }
    val rows = (1L to 300L).map { i =>
      val key = s"k${i % 5}"
      val v = if (i % 60 == 0) i * 1000L else (i * 37L) % 200L // per-key tails
      (key, v)
    } ++ Seq(("k0", -50L)) // negative values: abs matters
    val got = ExactPercentile.robustStatsByKey(rows.toDF("k", "v"), "k", "v", 3L,
        Seq("m", "md", "o", "n")).orderBy("k").collect()
    val want = rows.groupBy(_._1).toSeq.sortBy(_._1).map { case (k, g) =>
      val vs = g.map(_._2)
      val m = medOf(vs); val md = medOf(vs.map(v => math.abs(v - m)))
      (k, m, md, vs.count(v => math.abs(v - m) > 3 * md).toLong, vs.size.toLong)
    }
    assert(got.length == want.length)
    got.zip(want).foreach { case (r, w) =>
      assert((r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) == w)
    }
    // null VALUES are excluded per key (the discByKey convention)
    val withNulls = Seq(("a", Some(1L)), ("a", None), ("a", Some(3L)), ("b", Some(5L)))
      .toDF("k", "v")
    val g2 = ExactPercentile.robustStatsByKey(withNulls, "k", "v", 3L,
      Seq("m", "md", "o", "n")).orderBy("k").collect()
    assert(g2.map(r => (r.getString(0), r.getLong(1), r.getLong(4))).toSeq ==
      Seq(("a", 1L, 2L), ("b", 5L, 1L)))
  }

  test("q29/q47/q69 plans carry no whole-group aggregation buffer on the value column") {
    // per query: the heavy value column that must NOT sit in a builtin
    // percentile/collect_list buffer. q47's percentile_approx
    // (O(accuracy) sketch) and q69's median over l_quantity (~50 distinct
    // values; prints as percentile(l_quantity, 0.5, 1)) remain allowed.
    val heavyCol = Map(
      "q29_percentile" -> "percentile(l_quantity",
      "q47_approx_quantile" -> "percentile(l_extendedprice",
      "q69_percentile_disc" -> "percentile(l_extendedprice")
    for ((q, banned) <- heavyCol) {
      val plan = Relational.queries(q)(spark, sf).queryExecution.executedPlan.toString
      assert(!plan.contains("collect_list"), s"$q buffers whole groups via collect_list")
      assert(!plan.contains(banned),
        s"$q still uses the unbounded builtin percentile buffer on its heavy column")
    }
  }
}
