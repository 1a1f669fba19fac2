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

  test("langId identifies crafted sentences") {
    val cases = Seq(
      "the cat is on the mat and it is happy that the sun is out" -> "en",
      "der hund ist nicht mit der katze und das ist ein problem zu haben" -> "de",
      "le chat est dans la maison et il est content pour les enfants" -> "fr",
      "el perro es un animal para la casa y es una mascota con amor" -> "es",
      "这是一个中文句子用来测试语言识别功能" -> "zh",
      "zzz qqq xxx" -> "und")
    cases.foreach { case (text, expect) =>
      assert(one[String](langId($"t"), text) == expect, s"for: $text")
    }
  }

  test("simhash: identical → 0 hamming; near-dup small; unrelated large") {
    val base = (1 to 60).map(i => s"tok$i").mkString(" ")
    val near = base.replace("tok30", "other")
    val far = (1 to 60).map(i => s"zzz$i").mkString(" ")
    val df = Seq(("a", base), ("b", base), ("c", near), ("d", far)).toDF("id", "t")
      .select($"id", simhash64(tokens($"t")).as("s"))
    val m = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m("a") == m("b"))
    assert(java.lang.Long.bitCount(m("a") ^ m("c")) <= 16)
    assert(java.lang.Long.bitCount(m("a") ^ m("d")) >= 16)
  }

  test("minhash signature estimates jaccard") {
    val a = (1 to 100).map(i => s"w$i").mkString(" ")
    val b = ((1 to 80).map(i => s"w$i") ++ (1 to 20).map(i => s"x$i")).mkString(" ")
    val df = Seq(("a", a), ("b", b)).toDF("id", "t")
      .select($"id", minhashSignature(shingleHashes($"t", 3), 128).as("sig"))
    val rows = df.collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    val est = rows("a").zip(rows("b")).count { case (x, y) => x == y } / 128.0
    // true jaccard of 3-shingles: shared = 78 of (98 + 98 - 78)
    val truth = 78.0 / 118.0
    assert(math.abs(est - truth) < 0.15, s"est=$est truth=$truth")
  }

  test("fingerprint: deterministic, input-sensitive") {
    val t1 = (1 to 50).map(i => s"w$i").mkString(" ")
    val t2 = (1 to 50).map(i => s"v$i").mkString(" ")
    assert(one[Long](fingerprint($"t"), t1) == one[Long](fingerprint($"t"), t1))
    assert(one[Long](fingerprint($"t"), t1) != one[Long](fingerprint($"t"), t2))
    assert(one[Long](fingerprint($"t"), "") != 0L) // empty doc defined
  }

  test("quality score in [0,1] and orders garbage below text") {
    val good = "the quick brown fox jumps over the lazy dog and it is a fine day for that"
    val bad = "!!! ??? ### $$$ %%%"
    val qg = one[Double](qualityScore($"t"), good)
    val qb = one[Double](qualityScore($"t"), bad)
    assert(qg >= 0.0 && qg <= 1.0 && qb >= 0.0 && qb <= 1.0)
    assert(qg > qb)
  }
}
