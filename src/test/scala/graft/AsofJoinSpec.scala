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
