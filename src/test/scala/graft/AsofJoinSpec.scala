package graft

import java.sql.Timestamp

import graft.operators.AsofJoin

class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int) = new Timestamp(m * 60000L)

  test("asof join picks latest right row at-or-before each left row, per key") {
    val quotes = Seq(
      ("A", ts(1), 10.0), ("A", ts(5), 11.0), ("A", ts(9), 12.0),
      ("B", ts(2), 20.0), ("B", ts(8), 21.0))
      .toDF("sym", "qts", "price")
    val trades = Seq(
      ("A", ts(0), 1L),  // before any quote → dropped (inner semantics)
      ("A", ts(5), 2L),  // exactly at quote time → inclusive match 11.0
      ("A", ts(7), 3L),  // between 5 and 9 → 11.0
      ("A", ts(99), 4L), // far after → 12.0
      ("B", ts(3), 5L),  // → 20.0
      ("C", ts(5), 6L))  // key with no right rows → dropped
      .toDF("sym", "tts", "trade_id")
    val out = AsofJoin.asofJoin(
      left = trades, leftTs = "tts", leftKey = "sym",
      right = quotes, rightTs = "qts", rightKey = "sym",
      payload = Seq("price"))
      .select("trade_id", "asof_price")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out == Map(2L -> 11.0, 3L -> 11.0, 4L -> 12.0, 5L -> 20.0))
  }

  test("NULL payload values survive; fields never mix across right rows") {
    val quotes = Seq(
      ("A", ts(1), Some(10.0), Some("x")),
      ("A", ts(5), None, Some("y")),      // latest row has NULL price
      ("B", ts(1), Some(20.0), None))
      .toDF("sym", "qts", "price", "tag")
    val trades = Seq(("A", ts(9), 1L), ("B", ts(9), 2L)).toDF("sym", "tts", "trade_id")
    val out = AsofJoin.asofJoin(trades, "tts", "sym", quotes, "qts", "sym",
      payload = Seq("price", "tag"))
      .select("trade_id", "asof_price", "asof_tag")
      .collect().map(r => r.getLong(0) -> (Option(r.get(1)), Option(r.get(2)))).toMap
    // trade 1 must see the t=5 row AS-IS: NULL price + tag y (no stale 10.0 carried)
    assert(out(1L) == (None, Some("y")), s"mixed fields: ${out(1L)}")
    assert(out(2L) == (Some(20.0), None))
  }

  test("NULL keys and NULL timestamps never match (join-equality semantics)") {
    val quotes = Seq(
      (Option.empty[String], Option(ts(1)), 1.0),  // NULL key
      (Option("A"), Option.empty[java.sql.Timestamp], 2.0), // NULL ts
      (Option("A"), Option(ts(5)), 3.0))
      .toDF("sym", "qts", "price")
    val trades = Seq(
      (Option.empty[String], Option(ts(9)), 1L), // NULL key left → dropped
      (Option("A"), Option(ts(2)), 2L),          // precedes the only valid quote → dropped
      (Option("A"), Option(ts(9)), 3L))          // matches the t=5 quote only
      .toDF("sym", "tts", "trade_id")
    val out = AsofJoin.asofJoin(trades, "tts", "sym", quotes, "qts", "sym",
      payload = Seq("price"))
      .select("trade_id", "asof_price")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out == Map(3L -> 3.0), s"got $out")
  }

  test("empty payload fails fast with a clear message") {
    val e = intercept[IllegalArgumentException] {
      AsofJoin.asofJoin(Seq(("A", ts(1), 1L)).toDF("s", "t", "id"), "t", "s",
        Seq(("A", ts(0), 1.0)).toDF("s", "t", "p"), "t", "s", payload = Nil)
    }
    assert(e.getMessage.contains("payload"))
  }

  test("bucketed variant is row-identical to the unbucketed form") {
    // Deterministic pseudo-random data crossing many bucket boundaries:
    // 3 keys, 400 right rows and 300 left rows spread over ~40 buckets of
    // 60 s each, including exact-boundary timestamps (t a multiple of 60),
    // empty buckets, and a left row before any right row. Run with and
    // without tolerance; both must match the unbucketed output exactly.
    def prng(i: Int, salt: Int): Int = {
      val x = i * 2654435761L + salt * 40503L
      (((x ^ (x >>> 16)) % 2400L + 2400L) % 2400L).toInt
    }
    val quotes = (0 until 400)
      .map(i => (s"k${i % 3}", ts(0).getTime / 60000 + prng(i, 1), i.toLong, i * 1.5))
      .map { case (k, m, id, p) => (k, new Timestamp(m * 1000L), id, p) }
      .toDF("sym", "qts", "qid", "price")
    val trades = (0 until 300)
      .map(i => (s"k${i % 3}", new Timestamp(prng(i, 2) * 1000L), 1000L + i))
      .toDF("sym", "tts", "trade_id")
    for (tol <- Seq(None, Some("3 minutes"))) {
      val plain = AsofJoin.asofJoin(trades, "tts", "sym", quotes, "qts", "sym",
        payload = Seq("qid", "price"), tieBreak = Seq("qid"), tolerance = tol)
        .collect().map(_.toSeq).toSet
      val bucketed = AsofJoin.asofJoin(trades, "tts", "sym", quotes, "qts", "sym",
        payload = Seq("qid", "price"), tieBreak = Seq("qid"), tolerance = tol,
        bucketSeconds = Some(60L))
        .collect().map(_.toSeq).toSet
      assert(bucketed == plain,
        s"tol=$tol: bucketed diverged (only-bucketed=${(bucketed -- plain).take(3)}, " +
          s"only-plain=${(plain -- bucketed).take(3)})")
      assert(plain.nonEmpty)
    }
  }

  test("bucketed variant carries matches across empty buckets") {
    // one right row in bucket 0, left rows in buckets 5 and 100 — both
    // must match through the run of empty buckets between them
    val quotes = Seq(("A", ts(0), 42.0)).toDF("sym", "qts", "price")
    val trades = Seq(("A", ts(5), 1L), ("A", ts(100), 2L)).toDF("sym", "tts", "trade_id")
    val out = AsofJoin.asofJoin(trades, "tts", "sym", quotes, "qts", "sym",
      payload = Seq("price"), bucketSeconds = Some(60L))
      .select("trade_id", "asof_price")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out == Map(1L -> 42.0, 2L -> 42.0), s"got $out")
  }

  test("asofNearest picks min |dt| with backward winning ties") {
    val quotes = Seq(
      ("A", ts(2), 10L), ("A", ts(10), 11L),
      ("B", ts(5), 20L), ("B", ts(5), 21L),  // equal-ts pair: backward takes MAX tie-break
      ("C", ts(8), 30L))
      .toDF("sym", "qts", "qid")
    val trades = Seq(
      ("A", ts(3), 1L),  // dist 1 back vs 7 fwd → 10
      ("A", ts(9), 2L),  // dist 7 back vs 1 fwd → 11
      ("A", ts(6), 3L),  // dist 4 both ways → backward wins → 10
      ("A", ts(1), 4L),  // nothing before → forward 10
      ("A", ts(99), 5L), // nothing after → backward 11
      ("B", ts(5), 6L),  // exact ts, two candidates → max tie-break 21
      ("C", ts(0), 7L),  // forward only → 30
      ("D", ts(5), 8L))  // no right rows → dropped
      .toDF("sym", "tts", "trade_id")
    val out = AsofJoin.asofNearest(trades, "tts", "sym", quotes, "qts", "sym",
      payload = Seq("qid"), tieBreak = Seq("qid"))
      .select("trade_id", "nearest_qid")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 10L, 2L -> 11L, 3L -> 10L, 4L -> 10L,
      5L -> 11L, 6L -> 21L, 7L -> 30L))
  }

  test("asofNearest matches a brute-force nearest computation on generated data") {
    // deterministic pseudo-random streams with shared keys and heavy
    // timestamp collisions (mod 13 minutes)
    val rights = (0 until 120).map { i =>
      (s"K${i % 5}", ts((i * 7) % 13 + (i % 3) * 13), i.toLong)
    }
    val lefts = (0 until 80).map { i =>
      (s"K${i % 6}", ts((i * 11) % 29), 1000L + i)
    }
    val got = AsofJoin.asofNearest(
      lefts.toDF("k", "lts", "lid"), "lts", "k",
      rights.toDF("k", "rts", "rid"), "rts", "k",
      payload = Seq("rid"), tieBreak = Seq("rid"))
      .select("lid", "nearest_rid")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = lefts.flatMap { case (k, lt, lid) =>
      val cand = rights.filter(_._1 == k)
      if (cand.isEmpty) None
      else {
        val best = cand.minBy { case (_, rt, rid) =>
          val d = math.abs(rt.getTime - lt.getTime)
          val back = rt.getTime <= lt.getTime
          // min dist; backward preferred; backward max rid, forward min rid
          (d, if (back) 0 else 1, if (back) -rid else rid)
        }
        Some(lid -> best._3)
      }
    }.toMap
    assert(got == want,
      s"diff: ${(got.toSet -- want.toSet) ++ (want.toSet -- got.toSet)}")
  }

  test("asofForward picks first right row at-or-after; equal ts resolves like an inclusive match") {
    val quotes = Seq(
      ("A", ts(2), 10L), ("A", ts(10), 11L),
      ("B", ts(5), 20L), ("B", ts(5), 21L))
      .toDF("sym", "qts", "qid")
    val trades = Seq(
      ("A", ts(3), 1L),  // next at-or-after → 11
      ("A", ts(2), 2L),  // exact → 10
      ("A", ts(11), 3L), // nothing after → dropped
      ("B", ts(5), 4L),  // exact, two candidates → max tie-break 21
      ("B", ts(1), 5L))  // strictly later pair → min tie-break 20
      .toDF("sym", "tts", "trade_id")
    val out = AsofJoin.asofForward(trades, "tts", "sym", quotes, "qts", "sym",
      payload = Seq("qid"), tieBreak = Seq("qid"))
      .select("trade_id", "fwd_qid")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 11L, 2L -> 10L, 4L -> 21L, 5L -> 20L))
  }

  test("asof join matches a brute-force computation on the real tables") {
    // epoch-seconds views sidestep the java.time vs java.sql accessor split
    val ev = Tables.events(spark, sf).select($"event_id", $"user_id", $"ts").limit(200)
    val o = Tables.orders(spark, sf)
    val got = AsofJoin.asofJoin(ev, "ts", "user_id", o, "o_orderdate", "o_custkey",
        payload = Seq("o_orderdate"), tieBreak = Seq("o_orderkey"))
      .select($"event_id", $"asof_o_orderdate".cast("timestamp").cast("long").as("od"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val orders = o.select($"o_custkey", $"o_orderdate".cast("timestamp").cast("long")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val expected = ev.select($"event_id", $"user_id", $"ts".cast("long")).collect().flatMap { r =>
      val (eid, uid, t) = (r.getLong(0), r.getLong(1), r.getLong(2))
      val cands = orders.filter(x => x._1 == uid && x._2 <= t)
      if (cands.isEmpty) None else Some(eid -> cands.map(_._2).max)
    }.toMap
    assert(got == expected)
  }
}
