package graft

import org.apache.spark.sql.functions._

import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("media meta: real png/jpeg dims match the fixture contract; deterministic") {
    Multimodal.StubCodec.instances.set(0)
    val rows = Multimodal.m01MediaMeta(spark, sf).collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      val (id, fmt) = (r.getLong(0), r.getString(1))
      assert(Seq("png", "jpeg", "wav").contains(fmt))
      assert(r.getLong(2) > 0)                       // n_bytes
      if (fmt == "wav") {                            // stub fallback ranges
        assert(r.getLong(3) >= 1 && r.getLong(3) <= 1920)
        assert(r.getLong(4) >= 1 && r.getLong(4) <= 1080)
      } else {                                       // REAL ImageIO header parse
        val (w, h) = Multimodal.imageDims(id)
        assert(r.getLong(3) == w.toLong, s"width of $fmt media $id")
        assert(r.getLong(4) == h.toLong, s"height of $fmt media $id")
      }
    }
    // m01 decodes through the codec SPI: one instance per partition, not
    // per row (the integration seam a real JNI decoder relies on)
    val n = Multimodal.StubCodec.instances.get()
    assert(n >= 1 && n < rows.length, s"codec instances: $n for ${rows.length} rows")
    // re-run → identical (image encode + header decode are deterministic)
    val again = Multimodal.m01MediaMeta(spark, sf).collect()
    assert(rows.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("ImageHeaderCodec: decodes real png and jpeg bytes; corrupt bytes fall back") {
    import Multimodal.{ImageHeaderCodec, MediaRecord}
    val codec = new ImageHeaderCodec()
    for (fmt <- Seq("png", "jpeg"); id <- Seq(0L, 7L, 100L, 12345L)) {
      val d = codec.decode(MediaRecord(id, fmt, Multimodal.encodeImage(fmt, id)))
      val (w, h) = Multimodal.imageDims(id)
      assert((d.width, d.height) == (w, h), s"$fmt media $id")
      assert(d.n_bytes > 0)
    }
    // not an image at all → stub fallback, still in stub ranges
    val junk = codec.decode(MediaRecord(1L, "png", Array.fill[Byte](64)(42)))
    assert(junk.width >= 1 && junk.width <= 1920 && junk.height >= 1 && junk.height <= 1080)
  }

  test("frame sampling: count formula and frame width hold") {
    val payload = Array.fill[Byte](200)(7)
    val df = Seq(Tuple1(payload)).toDF("payload")
      .select(Multimodal.sampleFrames(col("payload"), 64, 48).as("frames"))
    val frames = df.collect().head.getSeq[Array[Byte]](0)
    // offsets 0,48,96,136? -> floor((200-64)/48)=2 → starts 0,48,96 → 3 frames
    assert(frames.length == 3)
    assert(frames.forall(_.length == 64))
    // payload shorter than a frame → no frames
    val none = Seq(Tuple1(Array.fill[Byte](10)(1))).toDF("payload")
      .select(Multimodal.sampleFrames(col("payload"), 64, 48).as("f"))
      .collect().head.getSeq[Array[Byte]](0)
    assert(none.isEmpty)
  }

  test("mapPartitions codec: one instance per partition, all rows decoded") {
    import Multimodal.{MediaRecord, StubCodec}
    StubCodec.instances.set(0)
    val ds = spark.createDataset(
      (1 to 100).map(i => MediaRecord(i.toLong, "png", Array.fill[Byte](i)(i.toByte))))(
      org.apache.spark.sql.Encoders.product[MediaRecord])
      .repartition(4)
    val out = Multimodal.decodeWithCodec(ds).collect()
    assert(out.length == 100)
    assert(out.forall(d => d.width >= 1 && d.width <= 1920 && d.height >= 1 && d.height <= 1080))
    assert(out.map(_.media_id).toSet == (1 to 100).map(_.toLong).toSet)
    val n = StubCodec.instances.get()
    assert(n <= 8, s"codec built per row? $n instances") // ≈ partitions, not rows
    // deterministic re-run
    val again = Multimodal.decodeWithCodec(ds).collect()
    assert(out.map(_.checksum).sorted.toSeq == again.map(_.checksum).sorted.toSeq)
  }

  test("feature vectors: fixed dim, values in [0,1), deterministic") {
    val df = Seq("x", "y").toDF("t")
      .select(Multimodal.features(encode(col("t"), "UTF-8"), 16).as("f"))
    val vs = df.collect().map(_.getSeq[Float](0))
    assert(vs.forall(_.length == 16))
    assert(vs.flatten.forall(v => v >= 0f && v < 1f))
    assert(vs(0) != vs(1))
  }

  test("m03 media near-dup finds exactly the duplicate payload classes (stub hash)") {
    // the stub features are content-hash-derived (not locality-sensitive),
    // so hamming ≤ 8 collisions ≡ identical payloads — giving the LSH
    // banding plumbing an exact, computable expectation
    val got = Multimodal.m03MediaNearDup(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val base = Multimodal.mediaTable(spark, sf)
      .selectExpr("media_id", "payload")
    val media = base.union(base.filter(col("media_id") < 100)
        .selectExpr("media_id + 10000 AS media_id", "payload"))
      // md5, not cast-to-string: binary image payloads aren't valid UTF-8
      .selectExpr("media_id", "md5(payload) AS p")
    val expected = media.as("a").join(media.as("b"),
        col("a.p") === col("b.p") && col("a.media_id") < col("b.media_id"))
      .select(col("a.media_id"), col("b.media_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expected)
    assert(expected.nonEmpty, "test corpus has no duplicate docs — fixture drifted")
  }
}
