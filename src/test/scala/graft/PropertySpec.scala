package graft

import scala.concurrent.duration._
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.core._
import graft.operators.Graph
import graft.functions.TextFunctions._

/** Property-style invariants over generated inputs (SURVEY.md §5.2 #4).
  * Deterministic: every Gen is sampled from a fixed seed.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  test("shingle count = max(0, tokens - n + 1) for arbitrary docs") {
    val doc = Gen.listOfN(30, Gen.oneOf(Gen.alphaLowerStr.map(_.take(5)), Gen.const("")))
      .map(_.mkString(" "))
    val docs = samples(doc, 20)
    val rows = docs.toDF("t")
      .select(tokens($"t").as("toks"))
      .select(size($"toks").as("nt"), size(shingles($"toks", 3)).as("ns"))
      .collect()
    rows.foreach { r =>
      assert(r.getInt(1) == math.max(0, r.getInt(0) - 2),
        s"tokens=${r.getInt(0)} shingles=${r.getInt(1)}")
    }
  }

  test("q101 CUSUM core: planted mean shifts detected at the exact day, signs and D values exact") {
    // three crafted daily series: an upward step after day 3, a downward
    // step after day 2, and a constant (D_k == 0 everywhere -> earliest
    // day, sign -1 by the dk >= 0 branch)
    val series = Map(
      "up" -> Seq(10L, 10L, 10L, 50L, 50L, 50L),
      "down" -> Seq(90L, 90L, 20L, 20L, 20L, 20L),
      "flat" -> Seq(30L, 30L, 30L, 30L, 30L, 30L))
    def ref(xs: Seq[Long]): (Int, Long, Long) = {
      val n = xs.size.toLong
      val tot = xs.sum
      val ds = xs.inits.toSeq.reverse.tail.zipWithIndex.collect {
        case (prefix, i) if i + 1 < n =>
          (i + 1, n * prefix.sum - (i + 1) * tot)
      }
      val (k, dk) = ds.minBy { case (k0, d) => (-math.abs(d), k0) }
      (k, math.abs(dk), if (dk < 0) 1L else -1L)
    }
    val expect = series.map { case (t, xs) =>
      val (k, dAbs, sign) = ref(xs)
      t -> (java.sql.Date.valueOf(f"2024-02-$k%02d"), dAbs, sign)
    }
    val rows = series.toSeq.flatMap { case (t, xs) =>
      xs.zipWithIndex.map { case (v, i) =>
        (t, java.sql.Date.valueOf(f"2024-02-${i + 1}%02d"), v) }
    }
    // the q101 tail on a local frame: same windows, same topKPerKey
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"event_type").orderBy($"day")
    val run = w.rowsBetween(Long.MinValue, 0)
    val whole = w.rowsBetween(Long.MinValue, Long.MaxValue)
    val c = rows.toDF("event_type", "day", "v")
      .select($"event_type", $"day",
        sum($"v").over(run).as("cum"),
        row_number().over(w).cast("long").as("k"),
        sum($"v").over(whole).as("tot"),
        count(lit(1)).over(whole).cast("long").as("n"))
      .filter($"k" < $"n")
      .select($"event_type", $"day",
        ($"n" * $"cum" - $"k" * $"tot").as("dk"))
      .select($"event_type", $"day", abs($"dk").as("d_abs"),
        when($"dk" < 0, lit(1L)).otherwise(lit(-1L)).as("shift_sign"))
    val got = org.apache.spark.sql.graft.relations
      .topKPerKey(c, Seq("event_type"), Seq(("d_abs", false), ("day", true)), 1)
      .collect()
      .map(r => r.getString(0) -> (r.getDate(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got == expect, s"got $got expected $expect")
    // hand-pin the planted shifts: up-series flips after day 3 (sign +1),
    // down-series after day 2 (sign -1)
    assert(got("up")._1.toString == "2024-02-03" && got("up")._3 == 1L)
    assert(got("down")._1.toString == "2024-02-02" && got("down")._3 == -1L)
    assert(got("flat")._2 == 0L)
  }

  test("q102 Mann-Kendall core: planted trends exact; floor-div tau parity on negative S") {
    // monotone up -> S = n(n-1)/2, tau = +1e6; monotone down mirrors;
    // constant -> all ties, S = 0; sawtooth exercises the non-divisible
    // tau (floorDiv, the offset-nonneg contract)
    val series = Map(
      "up"   -> Seq(1L, 2L, 3L, 4L, 5L, 6L),
      "down" -> Seq(6L, 5L, 4L, 3L, 2L, 1L),
      "flat" -> Seq(7L, 7L, 7L, 7L),
      "saw"  -> Seq(3L, 1L, 4L, 1L, 5L, 9L, 2L, 6L))
    def ref(xs: Seq[Long]): (Long, Long, Long, Long) = {
      val n = xs.size.toLong
      val sStat = (for {
        i <- xs.indices; j <- i + 1 until xs.size
      } yield math.signum(xs(j) - xs(i))).sum
      val nn1 = n * (n - 1)
      val tau = Math.floorDiv(2 * sStat * 1000000L + nn1 * 1000000L, nn1) - 1000000L
      (n, sStat, tau, math.signum(sStat))
    }
    val rows = series.toSeq.flatMap { case (t, xs) =>
      xs.zipWithIndex.map { case (v, i) =>
        (t, java.sql.Date.valueOf(f"2024-03-${i + 1}%02d"), v) }
    }
    val got = graft.operators.Relational
      .mannKendallOn(rows.toDF("event_type", "day", "v"))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    val expect = series.map { case (t, xs) => t -> ref(xs) }
    assert(got == expect, s"got $got expected $expect")
    assert(got("up") == ((6L, 15L, 1000000L, 1L)))
    assert(got("down") == ((6L, -15L, -1000000L, -1L)))
    assert(got("flat")._2 == 0L && got("flat")._4 == 0L)
  }

  test("q103 ACF core: planted series match a BigInt reference; period-2 and flat-series edge cases pinned") {
    // alternating -> strongly negative r1 / positive r2; ramp -> positive
    // r1; flat -> den = 0, all NULL; two -> lags 2/3 have no pairs
    val series = Map(
      "alt"  -> Seq(5L, 1L, 5L, 1L, 5L, 1L, 5L, 1L),
      "ramp" -> Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L),
      "flat" -> Seq(4L, 4L, 4L, 4L),
      "two"  -> Seq(3L, 9L),
      "saw"  -> Seq(3L, 1L, 4L, 1L, 5L, 9L, 2L, 6L))
    def ref(xs: Seq[Long]): Seq[(Long, Long, Option[Long])] = {
      val n = xs.size
      val sv = xs.sum
      val a = xs.map(x => BigInt(n) * x - sv)
      val den = a.map(x => x * x).sum
      (1 to 3).map { k =>
        val p = math.max(0, n - k)
        val num = (0 until p).map(t => a(t) * a(t + k)).sum
        // dividend nonneg by Cauchy-Schwarz -> BigInt truncate == floor
        val r = if (den > 0 && p > 0)
          Some(((num * 1000000 + den * 1000000) / den - 1000000).toLong)
        else None
        (k.toLong, p.toLong, r)
      }
    }
    val rows = series.toSeq.flatMap { case (t, xs) =>
      xs.zipWithIndex.map { case (v, i) =>
        (t, java.sql.Date.valueOf(f"2024-03-${i + 1}%02d"), v) }
    }
    val got = graft.operators.Relational
      .acfOn(rows.toDF("event_type", "day", "v"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), if (r.isNullAt(3)) None else Some(r.getLong(3))))
      .toMap
    val expect = series.flatMap { case (t, xs) =>
      ref(xs).map { case (k, p, r) => (t, k) -> (p, r) } }
    assert(got == expect, s"got $got expected $expect")
    // hand-pins: the period-2 series anticorrelates at lag 1 and
    // correlates at lag 2; the flat series is NULL at every lag; the
    // 2-point series has pairs only at lag 1
    assert(got(("alt", 1L))._2.get < -800000L)
    assert(got(("alt", 2L))._2.get > 600000L)
    assert(Seq(1L, 2L, 3L).forall(k => got(("flat", k))._2.isEmpty))
    assert(got(("two", 2L)) == ((0L, None)) && got(("two", 3L)) == ((0L, None)))
    assert(got(("ramp", 1L))._2.get > 500000L)
  }

  test("q104 concentration core: Gini/HHI match a BigInt reference; equal-split and monopoly poles pinned") {
    // equal -> gini 0, hhi = 1e6/n; monopoly-ish -> gini near (n-1)/n,
    // hhi near 1e6; skew exercises the rank formulation on real ties
    val groups = Map(
      "eq"   -> Seq(7L, 7L, 7L, 7L),
      "mono" -> Seq(1L, 1L, 1L, 9997L),
      "skew" -> Seq(10L, 10L, 20L, 40L, 80L, 160L),
      "one"  -> Seq(42L),
      "zero" -> Seq(0L, 0L))
    def ref(xs: Seq[Long]): (Long, Option[Long], Option[Long]) = {
      val n = xs.size
      val s = BigInt(xs.sum)
      val sorted = xs.sorted
      val t = sorted.zipWithIndex.map { case (x, i) => BigInt(i + 1) * x }.sum
      val q = xs.map(x => BigInt(x) * x).sum
      if (s > 0)
        (n.toLong,
          Some((((2 * t - (n + 1) * s) * 1000000) / (n * s)).toLong),
          Some(((q * 1000000) / (s * s)).toLong))
      else (n.toLong, None, None)
    }
    val rows = groups.toSeq.flatMap { case (g, xs) =>
      xs.zipWithIndex.map { case (v, i) => (g, i.toLong, v) } }
    val got = graft.operators.Relational
      .concentrationOn(rows.toDF("nation", "sk", "rev"))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        if (r.isNullAt(3)) None else Some(r.getLong(3))))
      .toMap
    val expect = groups.map { case (g, xs) => g -> ref(xs) }
    assert(got == expect, s"got $got expected $expect")
    assert(got("eq") == ((4L, Some(0L), Some(250000L))))
    assert(got("mono")._2.get > 700000L && got("mono")._3.get > 990000L)
    assert(got("one") == ((1L, Some(0L), Some(1000000L))))
    assert(got("zero") == ((2L, None, None)))
  }

  test("minhash collision fraction estimates jaccard for random overlap levels") {
    val base = (1 to 120).map(i => s"w$i")
    val overlaps = Seq(20, 60, 100)
    val pairs = overlaps.map { k =>
      val a = base.mkString(" ")
      val b = (base.take(k) ++ (1 to (120 - k)).map(i => s"z$i")).mkString(" ")
      (k, a, b)
    }
    pairs.foreach { case (k, a, b) =>
      val sigs = Seq(("a", a), ("b", b)).toDF("id", "t")
        .select($"id", tokens($"t").as("toks"))
        .select($"id", shingles($"toks", 3).as("sgl"))
        .select($"id", hashedDistinct($"sgl").as("sh"))
        .select($"id", minhashSignature($"sh", 256).as("sig"))
        .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
      val est = sigs("a").zip(sigs("b")).count { case (x, y) => x == y } / 256.0
      // true jaccard of 3-shingles for prefix overlap k of 120 tokens:
      // shared shingles = k-2, each side has 118
      val truth = (k - 2).toDouble / (2 * 118 - (k - 2)).toDouble
      assert(math.abs(est - truth) < 0.12, s"overlap=$k est=$est truth=$truth")
    }
  }

  test("srp signature: scale-invariant, sign-flip inverts, hamming(v,v)=0 for random vectors") {
    import graft.functions.VectorFunctions
    val vec = Gen.listOfN(16, Gen.chooseNum(-5.0, 5.0)).suchThat(_.exists(x => math.abs(x) > 1e-9))
    val vs = samples(vec, 25)
    val df = vs.map(v => (v, v.map(_ * 3.0), v.map(-_))).toDF("v", "scaled", "neg")
      .select(VectorFunctions.srpSig($"v").as("s"),
        VectorFunctions.srpSig($"scaled").as("ss"),
        VectorFunctions.srpSig($"neg").as("sn"))
      .collect()
    df.foreach { r =>
      val (s, ss, sn) = (r.getSeq[Long](0), r.getSeq[Long](1), r.getSeq[Long](2))
      // sign(v·p) is invariant under positive scaling of v
      assert(s == ss, "signature not scale-invariant")
      // sign(-v·p) flips every non-zero dot; random doubles never hit 0
      assert(s.zip(sn).forall { case (a, b) => (a & b) == 0L },
        "negated vector shares a set bit with the original")
    }
  }

  test("centroid_distances matches brute-force squared L2 for random vectors/centroids") {
    import graft.functions.VectorFunctions
    val vec = Gen.listOfN(8, Gen.chooseNum(-10.0, 10.0))
    val cents = samples(vec, 5).map(_.toArray)
    val vs = samples(vec, 20)
    val rows = vs.map(Tuple1(_)).toDF("v")
      .select($"v", VectorFunctions.centroidDists($"v", cents).as("d2s"))
      .collect()
    rows.foreach { r =>
      val v = r.getSeq[Double](0)
      val d2s = r.getSeq[Double](1)
      cents.zipWithIndex.foreach { case (c, i) =>
        val exact = v.zip(c).map { case (x, y) => (x - y) * (x - y) }.sum
        assert(math.abs(d2s(i) - exact) < 1e-9 * math.max(1.0, exact),
          s"cell $i: got ${d2s(i)}, brute force $exact")
      }
    }
  }

  test("IVF with full probing degenerates to exhaustive search (routing never corrupts scores)") {
    import org.apache.spark.sql.functions._
    import graft.functions.{VectorFunctions => VF}
    import graft.functions.ExactRound.round6
    // random-ish deterministic corpus + queries; probing ALL 16 cells
    // must reproduce brute force row for row — the cell routing can only
    // restrict the candidate set, never change a similarity or a rank
    val dim = 16
    def gen(ids: org.apache.spark.sql.DataFrame, seed: Int) = ids
      .select(col("id").as("vec_id"),
        transform(sequence(lit(0), lit(dim - 1)),
          i => pmod(xxhash64(col("id"), i, lit(seed)), lit(2000001L)).cast("double") / 1000000.0 - 1.0)
          .as("emb"))
      .withColumn("nrm", VF.l2Norm(col("emb")))
    val corpus = gen(spark.range(10, 130).toDF("id"), 5)
    val q = gen(spark.range(0, 6).toDF("id"), 77)
      .select(col("vec_id").as("query_id"), col("emb").as("qe"), col("nrm").as("qn"))
    val full = graft.operators.Similarity.annIvfInline(corpus, q, nProbe = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val brute = {
      val sims = corpus.join(broadcast(q))
        .select(col("query_id"), col("vec_id"),
          graft.functions.ExactRound.e6(
            VF.cosineWithNorms(col("qe"), col("emb"), col("qn"), col("nrm"))).as("sim_e6"))
      val w = org.apache.spark.sql.expressions.Window.partitionBy(col("query_id"))
        .orderBy(col("sim_e6").desc, col("vec_id"))
      sims.withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= 5).orderBy("query_id", "rank")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    }
    assert(full == brute, s"full-probe IVF != brute force:\n$full\n$brute")
  }

  test("radius search equals a plain-Scala reference for random corpora across thresholds") {
    import org.apache.spark.sql.functions._
    import graft.functions.{VectorFunctions => VF}
    // engine-independent differential (the t28 plain-reference rule):
    // VectorDot folds sequentially and cosineWithNorms is dot/(na*nb),
    // so a scalar JVM loop must reproduce every e6-floored similarity
    // bit-for-bit — and therefore the exact radius membership at ANY
    // threshold, including ones near the organic similarity ceiling
    val dim = 16
    def gen(ids: org.apache.spark.sql.DataFrame, seed: Int) = ids
      .select(col("id").as("vec_id"),
        transform(sequence(lit(0), lit(dim - 1)),
          i => pmod(xxhash64(col("id"), i, lit(seed)), lit(2000001L)).cast("double") / 1000000.0 - 1.0)
          .as("emb"))
      .withColumn("nrm", VF.l2Norm(col("emb")))
    val corpus = gen(spark.range(10, 200).toDF("id"), 11)
    val q = gen(spark.range(0, 5).toDF("id"), 23)
      .select(col("vec_id").as("query_id"), col("emb").as("qe"), col("nrm").as("qn"))
    def scalaSide(df: org.apache.spark.sql.DataFrame): Array[(Long, Array[Double])] =
      df.collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    val cv = scalaSide(corpus.select(col("vec_id"), col("emb")))
    val qv = scalaSide(q.select(col("query_id"), col("qe")))
    def dotS(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }; s
    }
    for (tau <- Seq(150000L, 250000L, 400000L)) {
      val got = corpus.join(broadcast(q))
        .select(col("query_id"), col("vec_id"),
          graft.functions.ExactRound.e6(
            VF.cosineWithNorms(col("qe"), col("emb"), col("qn"), col("nrm"))).as("sim_e6"))
        .filter(col("sim_e6") >= tau)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val exp = (for {
        (qid, qe) <- qv
        (vid, ce) <- cv
        sim = math.floor(dotS(qe, ce) /
          (math.sqrt(dotS(qe, qe)) * math.sqrt(dotS(ce, ce))) * 1000000.0 + 0.5).toLong
        if sim >= tau
      } yield (qid, vid, sim)).toSet
      assert(got == exp, s"tau=$tau: Spark radius != Scala reference " +
        s"(spark ${got.size} rows, scala ${exp.size} rows)")
      assert(exp.nonEmpty || tau > 300000L, s"tau=$tau produced no rows — vacuous case")
    }
  }

  test("IVF-PQ with full probing equals corpus-wide PQ-ADC (routing never changes ADC scores)") {
    import org.apache.spark.sql.functions._
    import graft.functions.{VectorFunctions => VF}
    // 64-d (PQ's 8×8 subspace contract); probing ALL 16 cells makes the
    // candidate universe identical to s05's corpus-wide ADC, so results
    // must match row for row — the cell join can only restrict, never
    // rescore
    val dim = 64
    def gen(ids: org.apache.spark.sql.DataFrame, seed: Int) = ids
      .select(col("id").as("vec_id"),
        transform(sequence(lit(0), lit(dim - 1)),
          i => pmod(xxhash64(col("id"), i, lit(seed)), lit(2000001L)).cast("double") / 1000000.0 - 1.0)
          .as("emb"))
      .withColumn("nrm", VF.l2Norm(col("emb")))
    val corpus = gen(spark.range(10, 150).toDF("id"), 11)
    val q = gen(spark.range(0, 6).toDF("id"), 78)
      .select(col("vec_id").as("query_id"), col("emb").as("qe"), col("nrm").as("qn"))
    val books = graft.operators.Similarity.trainPqCodebooks(corpus)
    assume(books.forall(_.size == 16), "codebooks complete on this corpus")
    val composed = graft.operators.Similarity.annIvfPqInline(corpus, q, nProbe = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val corpusWide = graft.operators.Similarity.annPqInline(corpus, q, books)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(composed == corpusWide,
      s"full-probe IVF-PQ != corpus-wide ADC:\n$composed\n$corpusWide")
  }

  test("pipeline: no loss, no duplication, batch bound for generated workloads") {
    val sizesGen = Gen.chooseNum(1, 700)
    val workloads = samples(sizesGen, 3)
    workloads.zipWithIndex.foreach { case (n, i) =>
      PipelineSpec.reset()
      val cfg = PipelineConfig(name = s"prop-pipe-$i-$n", maxBatchSize = 97,
        numWorkers = 2, flushInterval = 100.millis)
      val p = BatchPipeline[String](spark, cfg,
        FlusherFactory(() => new PipelineSpec.RecordingFlusher()))
      p.start()
      val items = (1 to n).map(x => s"w$i-$x")
      p.putAll(items)
      p.flush()
      p.stop()
      assert(PipelineSpec.delivered.asScala.toSet == items.toSet, s"loss/dup at n=$n")
      assert(PipelineSpec.delivered.size == n, s"duplicates at n=$n")
      assert(PipelineSpec.batchSizes.asScala.forall(_ <= 97))
    }
  }

  test("exact dedup keeps exactly one row per distinct key for generated tables") {
    val g = Gen.listOfN(300, Gen.chooseNum(0, 40))
    samples(g, 3).foreach { keys =>
      val df = keys.zipWithIndex.toDF("k", "id")
      val deduped = df.groupBy($"k").agg(min($"id").as("id"))
      assert(deduped.count() == keys.distinct.size)
      // keep-first: every kept id is the minimum for its key
      val kept = deduped.collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
      keys.zipWithIndex.foreach { case (k, id) => assert(kept(k) <= id) }
    }
  }

  test("ExactPercentile matches the builtins on generated tie-heavy tables") {
    import graft.operators.ExactPercentile
    // few keys, coarse values → dense ties; include a degenerate
    // single-value key via the narrow range
    val row = for {
      k <- Gen.oneOf("a", "b", "c")
      v <- Gen.chooseNum(0, 8)
    } yield (k, v.toDouble)
    val ps = Seq(0.1, 0.5, 0.9)
    samples(Gen.listOfN(400, row), 3).foreach { data =>
      val df = data.toDF("k", "v")
      val cont = ExactPercentile.contByKey(df, "k", "v", ps, Seq("p1", "p2", "p3"))
        .orderBy("k").collect()
      val builtin = df.groupBy($"k")
        .agg(expr("percentile(v, array(0.1D, 0.5D, 0.9D))").as("b"))
        .orderBy("k").collect()
      cont.zip(builtin).foreach { case (o, b) =>
        val ref = b.getSeq[Double](1)
        (1 to 3).foreach(i => assert(o.getDouble(i) == ref(i - 1),
          s"key ${o.getString(0)} p=${ps(i - 1)}"))
      }
      val disc = ExactPercentile.discByKey(df, "k", "v", ps, Seq("d1", "d2", "d3"))
        .orderBy("k").collect()
      val sortedRef = data.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
      disc.foreach { r =>
        val vs = sortedRef(r.getString(0))
        ps.zipWithIndex.foreach { case (p, i) =>
          val expected = vs(math.ceil(p * vs.size).toInt - 1)
          assert(r.getDouble(i + 1) == expected,
            s"key ${r.getString(0)} disc p=$p: ${r.getDouble(i + 1)} != $expected")
        }
      }
    }
  }

  test("rank prune preserves rank()-filter results on generated tie-heavy tables") {
    val row = for {
      k <- Gen.chooseNum(0, 3)
      v <- Gen.chooseNum(0, 5) // coarse → heavy ties at every boundary
    } yield (k, v)
    samples(Gen.listOfN(300, row), 3).foreach { data =>
      val df = data.zipWithIndex.map { case ((k, v), id) => (k, v, id) }.toDF("k", "v", "id")
      val w = org.apache.spark.sql.expressions.Window.partitionBy($"k").orderBy($"v".desc)
      val expected = df.withColumn("rnk", rank().over(w)).filter($"rnk" <= 2)
        .collect().map(_.toString).sorted.toSeq
      // exercise RankPruneExec through the manual builder (the shared
      // test session has no extensions): prune then window must
      // reproduce the plain result exactly, ties and all
      val pruned = org.apache.spark.sql.graft.relations.rankPrune(
        df, Seq("k"), Seq(("v", false)), 2)
      val got = pruned.withColumn("rnk", rank().over(w)).filter($"rnk" <= 2)
        .collect().map(_.toString).sorted.toSeq
      assert(got == expected, "prune+window diverged from plain window")
    }
  }

  test("q86 integer-moment correlation matches Spark's builtin corr on the scaled columns") {
    // corr is scale-invariant, so the builtin on the SAME scaled
    // integers is the independent double-path reference; the exact
    // integer-moment path must land within float noise of it
    val base = Tables.lineitem(spark, sf).select(
      floor(col("l_quantity") + 0.5).cast("long").as("q"),
      floor(col("l_extendedprice") * 100.0 + 0.5).cast("long").as("p"),
      floor(col("l_discount") * 100.0 + 0.5).cast("long").as("d"))
    val ref = base.agg(
      corr(col("q"), col("p")).as("qp"),
      corr(col("q"), col("d")).as("qd"),
      corr(col("p"), col("d")).as("pd")).collect().head
    val got = operators.Relational.q86CorrMatrix(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(2) / 1e6).toMap
    assert(math.abs(got("qty_price") - ref.getDouble(0)) < 1e-6)
    assert(math.abs(got("qty_discount") - ref.getDouble(1)) < 1e-6)
    assert(math.abs(got("price_discount") - ref.getDouble(2)) < 1e-6)
    // unlike real TPC-H (extendedprice = qty x unit price), this
    // generator draws all three columns independently — every pairwise
    // correlation is near zero (measured qty_price = -0.0098 at sf0.001)
    assert(got.values.forall(c => math.abs(c) < 0.1), got.toString)
  }

  test("q93 sharded skyline sweep finds EXACTLY the brute-force non-dominated pairs") {
    // coarse grids force duplicate pairs, same-price ties, same-size
    // ties, and shard-boundary crossings (span 10000 → prices straddle)
    val pt = for {
      p <- Gen.chooseNum(0L, 45000L)
      z <- Gen.chooseNum(0L, 20L)
    } yield (p / 1000L * 1000L, z) // snap prices to a 1000-grid for collisions
    samples(Gen.listOfN(200, pt), 3).foreach { pts =>
      val got = operators.Relational.skylineOf(pts.toDF("price_cents", "size"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val counts = pts.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      val want = counts.collect {
        case ((p, z), n) if !counts.keys.exists { case (p2, z2) =>
          p2 <= p && z2 >= z && (p2 < p || z2 > z) } => (p, z, n)
      }.toSet
      assert(got == want,
        s"skyline diverged: extra=${got -- want} missing=${want -- got}")
      spark.sharedState.cacheManager.clearCache()
    }
  }

  test("q90 deletion-neighborhood blocking finds EXACTLY the brute-force ed<=1 pairs") {
    // short random strings over a 3-letter alphabet maximize collisions
    // at every edit type (substitution / insert / delete / identity)
    // AND distance-2 near-misses the verify step must reject
    val name = Gen.chooseNum(1, 6).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))
    samples(Gen.listOfN(60, name), 3).foreach { names =>
      val df = names.zipWithIndex.map { case (nm, i) => (i.toLong, nm) }.toDF("k", "nm")
      val got = operators.Relational.fuzzyPairs(df)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      def ed(a: String, b: String): Int = {
        val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
          if (i == 0) j else if (j == 0) i else 0 }
        for (i <- 1 to a.length; j <- 1 to b.length)
          d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
            d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
        d(a.length)(b.length)
      }
      val want = (for {
        i <- names.indices; j <- names.indices if i < j
        d = ed(names(i), names(j)) if d <= 1
      } yield (i.toLong, j.toLong, d.toLong)).toSet
      assert(got == want,
        s"blocking diverged: extra=${got -- want} missing=${want -- got}")
    }
  }

  test("q90 class collapse is brute-force-exact on a DUPLICATE-HEAVY corpus") {
    // count(name) up to 10^3 — the shape the variant join must never
    // see raw (it would emit ~(len+1)·c² candidates per class). The
    // collapsed form blocks on DISTINCT names and expands key pairs at
    // the end; this pins exact multiset equality with arithmetic
    // expansion of a distinct-pool brute force.
    val pool = Seq("ab" -> 1000, "ac" -> 700, "abc" -> 300, "xyz" -> 5, "b" -> 1)
    val names = pool.flatMap { case (nm, c) => Seq.fill(c)(nm) }
    val df = names.zipWithIndex.map { case (nm, i) => (i.toLong, nm) }.toDF("k", "nm")
    val gotByD = operators.Relational.fuzzyPairs(df)
      .groupBy("d").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ed1(a: String, b: String): Boolean = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0 }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length) == 1
    }
    val wantIntra = pool.map { case (_, c) => c.toLong * (c - 1) / 2 }.sum
    val wantCross = (for {
      (a, ca) <- pool; (b, cb) <- pool if a < b && ed1(a, b)
    } yield ca.toLong * cb).sum
    assert(gotByD.getOrElse(0L, 0L) == wantIntra,
      s"intra d=0: got ${gotByD.get(0L)} want $wantIntra")
    assert(gotByD.getOrElse(1L, 0L) == wantCross,
      s"cross d=1: got ${gotByD.get(1L)} want $wantCross")
    assert(gotByD.keySet == Set(0L, 1L).filter(gotByD.getOrElse(_, 0L) > 0),
      s"unexpected distances: $gotByD")
    // distinct-pair contract: every (a_key, b_key) appears exactly once
    val total = operators.Relational.fuzzyPairs(df)
      .select("a_key", "b_key").distinct().count()
    assert(total == wantIntra + wantCross, s"pairs not distinct: $total")
  }

  test("lpaOn matches the plain-Scala reference on seeded random weighted graphs") {
    // the GraphSpec differential covers hand-built shapes; this sweeps
    // seeded random graphs (varying density, weight ties, isolated-pair
    // oscillators arising by chance) against the same reference rule:
    // argmax weighted in-neighbour vote, ties to the smallest label
    // (the one shared copy in GraphRefs — r12 ADVICE)
    def refLpa(we: Seq[(Long, Long, Long)], rounds: Int): Map[Long, Long] =
      GraphRefs.refLpa(we, rounds)
    for (seed <- 1 to 6) {
      val rnd = new scala.util.Random(1000L + seed)
      val v = 8 + rnd.nextInt(17)           // 8..24 nodes
      val nE = v + rnd.nextInt(2 * v)       // sparse to ~3x nodes
      val canon = (0 until nE).map { _ =>
        val a = rnd.nextInt(v).toLong; val b = rnd.nextInt(v).toLong
        (math.min(a, b), math.max(a, b), 1L + rnd.nextInt(5))
      }.filter(e => e._1 != e._2)
        .groupBy(e => (e._1, e._2)).map(_._2.head).toSeq  // distinct pairs
      val bi = canon ++ canon.map(e => (e._2, e._1, e._3))
      if (bi.nonEmpty) {
        val got = Graph.lpaOn(bi.toDF("src", "dst", "w"), rounds = 4)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        val want = refLpa(bi, rounds = 4)
        assert(got == want, s"seed $seed (v=$v, e=${canon.size}): got $got want $want")
        spark.sharedState.cacheManager.clearCache()
      }
    }
  }
}
