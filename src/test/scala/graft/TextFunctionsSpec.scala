package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column, text: String): T =
    Seq(text).toDF("t").select(c.as("r")).collect().head.getAs[T]("r")

  private def oneSeq(c: org.apache.spark.sql.Column, text: String): List[String] =
    Seq(text).toDF("t").select(c.as("r")).collect().head.getSeq[String](0).toList

  test("tokens drops empties and handles blank/edge input") {
    assert(oneSeq(tokens($"t"), "  a  bb   c ") == List("a", "bb", "c"))
    assert(oneSeq(tokens($"t"), "") == Nil)
    assert(oneSeq(tokens($"t"), "   ") == Nil)
  }

  test("shingles: n-grams in order; short docs give empty") {
    assert(oneSeq(shingles(tokens($"t"), 3), "a b c d") == List("a b c", "b c d"))
    assert(oneSeq(shingles(tokens($"t"), 3), "a b") == Nil)
  }

  // staged helpers mirroring the operators' select pipelines
  private def langOf(text: String): String =
    Seq(text).toDF("t")
      .select($"t", transform(tokens($"t"), x => lower(x)).as("ltoks"))
      .select(langId($"t", $"ltoks").as("r"))
      .collect().head.getString(0)

  private def simhashOf(texts: Seq[(String, String)]): Map[String, Long] =
    texts.toDF("id", "t")
      .select($"id", tokenHashes(tokens($"t")).as("th"))
      .select($"id", simhashCounts($"th").as("c"))
      .select($"id", simhashFromCounts($"c").as("s"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  private def fingerprintOf(text: String): Long =
    Seq(text).toDF("t")
      .select(tokens($"t").as("toks"))
      .select(shingles($"toks", 3).as("sgl"))
      .select(transform($"sgl", s => xxhash64(s)).as("hs"))
      .select(fingerprintFromHashes($"hs").as("fp"))
      .collect().head.getLong(0)

  test("langId identifies crafted sentences") {
    val cases = Seq(
      "the cat is on the mat and it is happy that the sun is out" -> "en",
      "der hund ist nicht mit der katze und das ist ein problem zu haben" -> "de",
      "le chat est dans la maison et il est content pour les enfants" -> "fr",
      "el perro es un animal para la casa y es una mascota con amor" -> "es",
      "这是一个中文句子用来测试语言识别功能" -> "zh",
      "zzz qqq xxx" -> "und")
    cases.foreach { case (text, expect) =>
      assert(langOf(text) == expect, s"for: $text")
    }
  }

  test("simhash: identical → 0 hamming; near-dup small; unrelated large") {
    val base = (1 to 60).map(i => s"tok$i").mkString(" ")
    val near = base.replace("tok30", "other")
    val far = (1 to 60).map(i => s"zzz$i").mkString(" ")
    val m = simhashOf(Seq(("a", base), ("b", base), ("c", near), ("d", far)))
    assert(m("a") == m("b"))
    assert(java.lang.Long.bitCount(m("a") ^ m("c")) <= 16)
    assert(java.lang.Long.bitCount(m("a") ^ m("d")) >= 16)
  }

  test("minhash signature estimates jaccard") {
    val a = (1 to 100).map(i => s"w$i").mkString(" ")
    val b = ((1 to 80).map(i => s"w$i") ++ (1 to 20).map(i => s"x$i")).mkString(" ")
    val df = Seq(("a", a), ("b", b)).toDF("id", "t")
      .select($"id", tokens($"t").as("toks"))
      .select($"id", shingles($"toks", 3).as("sgl"))
      .select($"id", hashedDistinct($"sgl").as("sh"))
      .select($"id", minhashSignature($"sh", 128).as("sig"))
    val rows = df.collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    val est = rows("a").zip(rows("b")).count { case (x, y) => x == y } / 128.0
    // true jaccard of 3-shingles: shared = 78 of (98 + 98 - 78)
    val truth = 78.0 / 118.0
    assert(math.abs(est - truth) < 0.15, s"est=$est truth=$truth")
  }

  test("fingerprint: deterministic, input-sensitive") {
    val t1 = (1 to 50).map(i => s"w$i").mkString(" ")
    val t2 = (1 to 50).map(i => s"v$i").mkString(" ")
    assert(fingerprintOf(t1) == fingerprintOf(t1))
    assert(fingerprintOf(t1) != fingerprintOf(t2))
    assert(fingerprintOf("") != 0L) // empty doc defined
  }

  test("quality score in [0,1] and orders garbage below text") {
    val good = "the quick brown fox jumps over the lazy dog and it is a fine day for that"
    val bad = "!!! ??? ### $$$ %%%"
    def q(text: String): Double =
      Seq(text).toDF("t").select($"t", tokens($"t").as("toks"))
        .select(qualityScore($"t", $"toks").as("q")).collect().head.getDouble(0)
    val qg = q(good); val qb = q(bad)
    assert(qg >= 0.0 && qg <= 1.0 && qb >= 0.0 && qb <= 1.0)
    assert(qg > qb)
  }

  test("t24 model quality: integer logit consistent with its features; both classes occur") {
    val rows = graft.operators.TextAnalysis.t24ModelQuality(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getBoolean(6)))
    assert(rows.nonEmpty)
    // the decision is EXACTLY the fixed-weight dot product thresholded at
    // 0 — recompute from the emitted features in driver-side Long math
    rows.foreach { case (id, pr, sr, mtl, nt, logit, pass) =>
      val want = -120000000L + (-60000L) * pr + 40000L * sr + 1500L * mtl +
        200000L * math.min(nt, 500L)
      assert(logit == want, s"doc $id logit $logit != $want")
      assert(pass == (logit >= 0L), s"doc $id pass flag inconsistent")
    }
    // a trained-filter that accepts or rejects EVERYTHING is miscalibrated
    assert(rows.exists(_._7) && rows.exists(!_._7),
      s"degenerate split: ${rows.count(_._7)}/${rows.length} pass")
  }

  test("t26 semantic decontamination equals a driver-side brute-force recompute") {
    val out = graft.operators.TextAnalysis.t26SemanticDecontaminate(spark, sf)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // independent recompute: plain Scala double math over the raw
    // parquet, mirroring VectorDot's sequential left-to-right fold
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
      .select($"vec_id", $"embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }; s
    }
    def nrm(a: Array[Double]) = math.sqrt(dot(a, a))
    val eval = vecs.filter(_._1 % 17 == 0)
    val want = vecs.filter(_._1 % 17 != 0).flatMap { case (id, v) =>
      val sims = eval.values.toSeq
        .map(e => math.floor(dot(v, e) / (nrm(v) * nrm(e)) * 1000000.0 + 0.5).toLong)
        .filter(_ >= 400000L)
      if (sims.isEmpty) None else Some(id -> (sims.length.toLong, sims.max))
    }
    assert(want.nonEmpty, "fixture has no semantic hits — threshold dead")
    assert(out == want.toMap)
  }

  test("t28 BPE merges equal a driver-side greedy-BPE reference") {
    val out = graft.operators.TextAnalysis.t28BpeMerges(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(out.length == 6 && out.map(_._1).toSeq == (1L to 6L))
    // plain-Scala reference: weighted word-frequency BPE with the same
    // greedy leftmost non-overlapping merge and (count desc, left, right)
    // tie order
    var words: Seq[(Vector[String], Long)] =
      spark.read.parquet(s"$sf/documents.parquet").select($"text").collect()
        .flatMap(_.getString(0).split("\\s+")).filter(w => w.nonEmpty && !w.contains('\u001F'))
        .groupBy(identity).toSeq
        .map { case (w, ws) => w.map(_.toString).toVector -> ws.length.toLong }
    val want = (1 to 6).map { round =>
      val pc = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((syms, n) <- words; i <- 0 until syms.length - 1)
        pc((syms(i), syms(i + 1))) = pc.getOrElse((syms(i), syms(i + 1)), 0L) + n
      val ((l, r), pn) = pc.minBy { case ((a, b), c) => (-c, a, b) }
      words = words.map { case (syms, n) =>
        syms.foldLeft(Vector.empty[String]) { (acc, x) =>
          if (acc.nonEmpty && acc.last == l && x == r) acc.init :+ (l + r)
          else acc :+ x
        } -> n
      }
      (round.toLong, l, r, pn)
    }
    assert(out.toSeq == want)
    // greedy merges can only shrink pair mass: best counts are non-increasing
    assert(out.map(_._4).toSeq == out.map(_._4).toSeq.sorted.reverse)
  }

  test("t29 BPE encode equals per-doc counts under the reference tokenizer") {
    val out = graft.operators.TextAnalysis.t29BpeEncode(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // re-learn with the same plain-Scala reference as the t28 spec, then
    // size each doc's tokenization under the final segmentation
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id", $"text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split("\\s+").toSeq
        .filter(w => w.nonEmpty && !w.contains('\u001F')))
    var segs: Map[Vector[String], Long] =
      docs.flatMap(_._2).groupBy(identity).map { case (w, ws) =>
        w.map(_.toString).toVector -> ws.length.toLong
      }
    var rep: Map[String, Vector[String]] =
      segs.keys.map(v => v.mkString -> v).toMap
    for (_ <- 1 to 6) {
      val pc = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((syms, n) <- segs; i <- 0 until syms.length - 1)
        pc((syms(i), syms(i + 1))) = pc.getOrElse((syms(i), syms(i + 1)), 0L) + n
      val ((l, r), _) = pc.minBy { case ((a, b), c) => (-c, a, b) }
      def merge(syms: Vector[String]) =
        syms.foldLeft(Vector.empty[String]) { (acc, x) =>
          if (acc.nonEmpty && acc.last == l && x == r) acc.init :+ (l + r)
          else acc :+ x
        }
      segs = segs.map { case (syms, n) => merge(syms) -> n }
      rep = rep.map { case (w, v) => w -> merge(v) }
    }
    val want = docs.map { case (id, ws) =>
      (id, ws.length.toLong, ws.map(w => rep(w).length.toLong).sum)
    }.sortBy(_._1)
    assert(out.toSeq == want.toSeq)
    assert(out.exists(_._3 > 0))
    // merges only ever shrink a doc's token count below its char count
    assert(out.forall { case (_, nw, nb) => nb >= nw })
  }

  test("t27 domain quality cut: per-source median threshold attained, majority kept") {
    val kept = graft.operators.TextAnalysis.t27DomainQualityCut(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(kept.nonEmpty)
    val perSourceN = spark.read.parquet(s"$sf/documents.parquet")
      .groupBy($"source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    kept.groupBy(_._2).foreach { case (src, rows) =>
      val thr = rows.map(_._4).distinct
      assert(thr.length == 1, s"$src: multiple thresholds $thr")
      // everything kept is at/above the bar, and the bar is ATTAINED
      // (disc percentile picks a real value, which then survives its
      // own cut — so min kept == thr exactly)
      assert(rows.map(_._3).min == thr.head, s"$src: min kept != thr")
      // smallest value with cum ≥ ceil(n/2) leaves at most ceil(n/2)-1
      // docs strictly below the bar
      val n = perSourceN(src)
      assert(rows.length >= n - (n + 1) / 2 + 1,
        s"$src: kept ${rows.length} of $n — below the median-cut floor")
    }
    // the cut must actually drop something somewhere
    assert(kept.length < perSourceN.values.sum, "degenerate: nothing dropped")
    // and cover every source (each source keeps at least its median doc)
    assert(kept.map(_._2).distinct.length == perSourceN.size)
  }

  test("t30 gopher repetition: coverage boundaries, mode tie-break, degenerate docs — exact") {
    // doc 1: "a b c" repeats at 0 and 3 → covers positions 0..5 of 9
    //        (overlapping grams "b c a"/"c a b" appear once — no help);
    //        2-gram mode ties ("a b"×2, "b c"×2) → lexicographic min
    // doc 2: clean → zero coverage, mode count 1
    // doc 3: single word → no grams at all, all-zero row
    // doc 4: "p p p p p" → "p p p"×3, every position covered;
    //        "p p"×4 → top2_char_frac = 3·4·1e6 div 9
    val docs = Seq(
      (1L, "a b c a b c x y z"),
      (2L, "u1 u2 u3 u4 u5"),
      (3L, "solo"),
      (4L, "p p p p p")
    ).toDF("doc_id", "text")
    val got = graft.operators.TextAnalysis.gopherRepetition(docs)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    val expected = Array(
      (1L, 9L, "a b", 2L, 3L * 2 * 1000000 / 17, 6L * 1000000 / 9),
      (2L, 5L, "u1 u2", 1L, 5L * 1 * 1000000 / 14, 0L),
      (3L, 1L, "", 0L, 0L, 0L),
      (4L, 5L, "p p", 4L, 3L * 4 * 1000000 / 9, 1000000L))
    assert(got.sameElements(expected), got.mkString("\n"))
  }

  test("t31 pii redact: planted emails/ips/phones/blocklist — exact counts, masks, keep flag") {
    // doc 1: email + phone + blocked word; doc 2: two ipv4s (one mid-
    // sentence), email with digits+dots in the domain; doc 3: clean;
    // doc 4: digit runs that must NOT match (4-octet needs all dots;
    // phone needs exactly 3-3-4 with dashes)
    val docs = Seq(
      (1L, "mail bob@example.com and call 555-123-4567 customer ok"),
      (2L, "hosts 10.0.0.1 and 192.168.1.255 admin@mail2.example.co"),
      (3L, "nothing sensitive here at all"),
      (4L, "v1.2 build 12-345-6789 and 1234-567-8901 stay")
    ).toDF("doc_id", "text")
    val got = graft.operators.TextAnalysis.piiRedact(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getString(6)))
    val expected = Array(
      (1L, 1L, 0L, 1L, 1L, 0L, "mail [PII] and call [PII] [BLOCKED] ok"),
      (2L, 1L, 2L, 0L, 0L, 0L, "hosts [PII] and [PII] [PII]"),
      (3L, 0L, 0L, 0L, 0L, 1L, "nothing sensitive here at all"),
      (4L, 0L, 0L, 0L, 0L, 1L, "v1.2 build 12-345-6789 and 1234-567-8901 stay"))
    assert(got.sameElements(expected), got.mkString("\n"))
  }

  test("t32 source mixing: exact isqrt at perfect-square boundaries; shares sum ≤ 1e6") {
    // one-word docs pin per-source token mass exactly: srcA 24 tokens
    // (isqrt 4), srcB 25 (isqrt 5 — exact square), srcC 26 (isqrt 5 —
    // one past the square: the fix-up must not round up to 6)
    val docs = (Seq.fill(24)("A") ++ Seq.fill(25)("B") ++ Seq.fill(26)("C"))
      .zipWithIndex.map { case (s, i) => (i.toLong, "w", s"src$s") }
      .toDF("doc_id", "text", "source")
    val dir = java.nio.file.Files.createTempDirectory("graft-t32").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.operators.TextAnalysis.t32SourceMixing(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val expected = Array(
      ("srcA", 24L, 24L, 4L, 4L * 1000000 / 14),
      ("srcB", 25L, 25L, 5L, 5L * 1000000 / 14),
      ("srcC", 26L, 26L, 5L, 5L * 1000000 / 14))
    assert(got.sameElements(expected), got.mkString("\n"))
    assert(got.map(_._5).sum <= 1000000L)
  }

  test("t33 lm score: hand-computed smoothed inverse probabilities; ordering by predictability") {
    // uni: a=3 b=2 c=1 z=1, V=4; bigrams: "a b"×2, "a c"×1
    // docs 1/2: (3+4)·1e4 div (2+1) = 23333 — the repeated (predictable)
    // bigram scores LOWER than doc 3's rare one: 7e4 div 2 = 35000
    val docs = Seq(
      (1L, "a b"), (2L, "a b"), (3L, "a c"), (4L, "z")
    ).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-t33").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.operators.TextAnalysis.t33LmScore(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val expected = Array(
      (1L, 1L, 23333L), (2L, 1L, 23333L), (3L, 1L, 35000L), (4L, 0L, 0L))
    assert(got.sameElements(expected), got.mkString("\n"))
  }

  test("t34 curation pipeline equals a plain-Scala reference over a planted corpus") {
    // planted: d3 email (gate 1), d4 blocklist (gate 1), d5 majority
    // 3-gram repeats (gate 2), d8 rare-word doc (LM tail), d2/d6 exact
    // dups of d1 across sources (dedup keeps min doc_id's source)
    val fixture = Seq(
      (1L, "srcA", "the cat sat on the mat"),
      (2L, "srcA", "the cat sat on the mat"),
      (3L, "srcA", "mail bob@example.com spam here"),
      (4L, "srcB", "the customer is here"),
      (5L, "srcB", "x y z x y z x y z"),
      (6L, "srcB", "the cat sat on the mat"),
      (7L, "srcB", "the dog sat on the mat"),
      (8L, "srcA", "qq ww ee rr tt"),
      (9L, "srcB", "the cat sat on a rug"))
    val dir = java.nio.file.Files.createTempDirectory("graft-t34").toString
    fixture.toDF("doc_id", "source", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    // ---- plain-Scala reference (collections, integer arithmetic) ----
    def toks(t: String) = t.split("\\s+").filter(_.nonEmpty).toSeq
    val pii = fixture.filter { case (_, _, t) =>
      !java.util.regex.Pattern.compile(
        "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}|\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b|\\b\\d{3}-\\d{3}-\\d{4}\\b|\\b(customer|dup)\\b")
        .matcher(t).find()
    }
    val rep = pii.filter { case (_, _, t) =>
      val w = toks(t)
      val g3 = w.sliding(3).filter(_.size == 3).map(_.mkString(" ")).zipWithIndex.toSeq
      val dups = g3.groupBy(_._1).filter(_._2.size >= 2).keySet
      val cov = g3.filter(x => dups(x._1)).flatMap(x => x._2 to x._2 + 2).distinct.size
      2L * cov < w.size
    }
    val all = fixture.flatMap { case (_, _, t) => toks(t) }
    val cu = all.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val v = cu.size.toLong
    val cg = fixture.flatMap { case (_, _, t) => toks(t).sliding(2).filter(_.size == 2).map(_.mkString(" ")) }
      .groupBy(identity).map { case (k, vs) => k -> vs.size.toLong }
    def lm(t: String): Long = {
      val ps = toks(t).sliding(2).filter(_.size == 2).toSeq
      if (ps.isEmpty) 0L
      else ps.map { p =>
        math.min((cu(p.head) + v) * 10000L / (cg(p.mkString(" ")) + 1), 1000000000000L)
      }.sum / ps.size
    }
    val scored = rep.map { case (id, s, t) => (id, s, t, lm(t)) }
    val sortedLm = scored.map(_._4).sorted
    val med = sortedLm(math.ceil(0.5 * sortedLm.size).toInt - 1)
    val lmOk = scored.filter(_._4 <= med)
    val kept = lmOk.groupBy(_._3).map(_._2.minBy(_._1)).toSeq
    def isqrt(n: Long) = { val s = math.sqrt(n.toDouble).toLong
      if ((s + 1) * (s + 1) <= n) s + 1 else if (s * s > n) s - 1 else s }
    val per = kept.groupBy(_._2).map { case (src, ds) =>
      val tok = ds.map(d => toks(d._3).size.toLong).sum
      (src, ds.size.toLong, tok, isqrt(tok))
    }.toSeq.sortBy(_._1)
    val tw = per.map(_._4).sum
    val expected = per.map { case (src, n, tok, w) => (src, n, tok, w, w * 1000000L / tw) }

    val got = graft.operators.TextAnalysis.t34CurationPipeline(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    assert(got == expected, s"got=$got expected=$expected")
    // the planted drops actually dropped: srcA keeps ≤ 2 distinct docs,
    // and the heavy-repeat/blocklist/email docs contribute nothing
    assert(got.map(_._2).sum < fixture.size)
  }

  test("t36 contamination report: hand-computed leaks, source counts, worst offender") {
    // eval docs are doc_id % 17 == 0 (ids 0 and 17); doc 0's three
    // 3-grams all leak (one via train doc 1, two via doc 2 → doc 2 is
    // the worst offender); doc 17 is clean; doc 3 never overlaps
    val docs = Seq(
      (0L, "a b c d e"),
      (1L, "a b c zz"),
      (2L, "b c d e qq rr"),
      (3L, "k l m n"),
      (17L, "zz yy xx")
    ).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-t36").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.operators.TextAnalysis.t36ContaminationReport(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    val expected = Array(
      (0L, 3L, 3L, 10000L, 2L, 2L, 2L),
      (17L, 1L, 0L, 0L, 0L, -1L, 0L))
    assert(got.sameElements(expected), got.mkString("\n"))
  }

  test("t37 domain affinity: exact smoothed frequency ratios; target-like docs rank first") {
    // target (doc 0): "x x y"; corpus: doc 1 all-x (target-like),
    // doc 2 all-z (alien), doc 3 mixed — scores must order 1 > 3 > 2
    val docs = Seq(
      (0L, "x x y"), (1L, "x x x"), (2L, "z z z"), (3L, "x z")
    ).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-t37").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    def frq(c: Long, n: Long) = c * 1000000000L / n
    def ratio(ct: Long, cc: Long, nt: Long, nc: Long) =
      math.min((frq(ct, nt) + 1) * 10000L / (frq(cc, nc) + 1), 100000000L)
    val rx = ratio(2, 4, 3, 8) // token x: target 2/3, corpus 4/8
    val rz = ratio(0, 4, 3, 8) // token z: absent from target
    val got = graft.operators.TextAnalysis.t37DomainAffinity(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val expected = Array(
      (1L, 3L, rx), (2L, 3L, rz), (3L, 2L, (rx + rz) / 2))
    assert(got.sameElements(expected), got.mkString("\n"))
    assert(rx > (rx + rz) / 2 && (rx + rz) / 2 > rz)
  }

  test("t39 hybrid RRF: contiguous fused ranks, contributions bounded, both-leg docs sum both") {
    import org.apache.spark.sql.functions.col
    val rows = graft.operators.TextAnalysis.t39HybridRrf(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    // per query: <= 10 rows, ranks contiguous from 1, fused scores
    // non-increasing along ranks
    rows.groupBy(_._1).foreach { case (qid, rs) =>
      val sorted = rs.sortBy(_._4)
      assert(sorted.map(_._4).toSeq == (1L to rs.length), s"q$qid ranks")
      val scores = sorted.map(_._3).toSeq
      assert(scores == scores.sorted.reverse, s"q$qid fused scores not sorted")
    }
    // RRF contribution bounds: one leg gives at most 1e6 div 61 = 16393
    // (rank 1) and at least 1e6 div 80 = 12500 (rank 20); a fused score
    // above one leg's max PROVES the doc appeared in both legs, and
    // nothing can exceed two rank-1 contributions
    val oneLegMax = 1000000L / 61
    rows.foreach { case (_, doc, rrf, _) =>
      assert(rrf <= 2 * oneLegMax, s"doc $doc rrf $rrf above two rank-1 legs")
      assert(rrf >= 1000000L / 80, s"doc $doc rrf $rrf below one rank-20 leg")
    }
    // the fixture plants real overlap: at least one fused hit must have
    // come from BOTH legs (text + vector agree on some neighbor)
    assert(rows.exists(_._3 > oneLegMax),
      "no document fused from both legs anywhere — legs look disjoint")
  }

  test("t35 streaming curation gate equals the batch admission counts") {
    val docs = graft.Tables.documents(spark, sf).filter(col("doc_id") < 1000)
    val keepIds = graft.operators.TextAnalysis.piiRedact(docs)
      .filter(col("keep") === 1).select("doc_id")
    val expected = docs.join(keepIds, "doc_id").groupBy("source")
      .agg(count(lit(1)).as("n_kept"))
      .orderBy("source").collect().map(r => (r.getString(0), r.getLong(1)))
    val got = graft.operators.TextAnalysis.t35StreamCurateGate(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(expected.nonEmpty && got.sameElements(expected),
      s"got=${got.toSeq} expected=${expected.toSeq}")
  }

  test("t51 PMI core: lift matches a plain-BigInt reference; min-count cut and ordering pinned") {
    // crafted corpus: "a b" saturates (count 6), "b c" sits at the cut
    // (exactly 5), "c d" misses it (4) — the >= 5 gate separates them
    val docs = Seq(
      "a b a b a b a b a b a b",
      "b c b c b c b c b c",
      "c d c d c d c d",
      "e e e e e e e e e e")
    def ref(texts: Seq[String]): Seq[(String, String, Long, Long)] = {
      val toks = texts.map(_.split("\\s+").filter(_.nonEmpty).toSeq)
      val uni = toks.flatten.groupBy(identity)
        .map { case (w, xs) => w -> xs.size.toLong }
      val n = uni.values.sum
      toks.flatMap(_.sliding(2).filter(_.length == 2).map(p => (p(0), p(1))))
        .groupBy(identity).toSeq
        .map { case (p, xs) => p -> xs.size.toLong }
        .filter(_._2 >= 5)
        .map { case ((w1, w2), c) =>
          (w1, w2, c,
            (BigInt(c) * n * 1000000 / (BigInt(uni(w1)) * uni(w2))).toLong) }
        .sortBy { case (w1, w2, _, l) => (-l, w1, w2) }
    }
    val got = graft.operators.TextAnalysis
      .pmiCollocationsOn(docs.toDF("text"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSeq
    val expect = ref(docs)
    assert(got == expect, s"got $got expected $expect")
    // the cut: "c d" (4 occurrences) is out, "b c" (exactly 5) is in
    assert(got.exists(t => t._1 == "b" && t._2 == "c" && t._3 == 5L))
    assert(!got.exists(t => t._1 == "c" && t._2 == "d"))
    // self-collocation survives: "e e" count 9 with c(e) = 10
    assert(got.exists(t => t._1 == "e" && t._2 == "e" && t._3 == 9L))
  }
}
