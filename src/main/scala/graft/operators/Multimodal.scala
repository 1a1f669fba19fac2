package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Multimodal-column plumbing: image/audio/video as opaque BinaryType
  * payloads with typed metadata, plus decode / feature-extract /
  * frame-sample operators.
  *
  * Image decode is REAL (round 4): png/jpeg payloads are genuine encoded
  * images (JDK `ImageIO`), and [[ImageHeaderCodec]] parses width/height
  * from the actual bytes via `javax.imageio` header readers — no pixel
  * decode, so metadata extraction stays cheap at scale. Remaining STUBS
  * (no audio/model libraries in this environment): `decodeMeta` (the
  * pure-expression variant), `features` (hash-mixed, stands in for a
  * model embedding) and the wav path. The Spark-side shape — BinaryType
  * schema, mapPartitions codec SPI with one instance per partition,
  * frame slicing, partition-parallel execution — is the production
  * integration seam either way.
  */
object Multimodal {

  /** Deterministic image dimensions for a media id — the fixture contract
    * MultimodalSpec checks decoded values against. */
  def imageDims(id: Long): (Int, Int) =
    ((16 + math.floorMod(id, 32L)).toInt, (16 + math.floorMod(id / 3, 24L)).toInt)

  /** Encode a real single-color image (png/jpeg) via the JDK's ImageIO.
    * Tiny (≤47×39) so fixture synthesis stays cheap; color is id-derived
    * so distinct ids produce distinct payloads. */
  private[graft] def encodeImage(format: String, id: Long): Array[Byte] = {
    val (w, h) = imageDims(id)
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rgb = ((id * 2654435761L) & 0xFFFFFFL).toInt
    var y = 0
    while (y < h) { var x = 0; while (x < w) { img.setRGB(x, y, rgb); x += 1 }; y += 1 }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, format, out)
    out.toByteArray
  }

  /** Synthesize a media table from documents: format round-robin; png and
    * jpeg rows carry REAL encoded image bytes (dims = [[imageDims]]), wav
    * rows carry the UTF-8 text bytes (audio stand-in). Payload synthesis
    * runs in mapPartitions on the executors — the driver never holds
    * media bytes. */
  def mediaTable(s: SparkSession, dir: String): DataFrame =
    mediaTableFiltered(s, dir, None)

  /** Internal variant letting callers filter by format BEFORE payload
    * synthesis (image encoding for rows a downstream filter would drop is
    * pure waste — m02 only wants wav). */
  private[operators] def mediaTableFiltered(
      s: SparkSession, dir: String, only: Option[String]): DataFrame = {
    import s.implicits._
    val tagged = Tables.documents(s, dir)
      .select(col("doc_id").as("media_id"),
        element_at(typedlit(Seq("png", "jpeg", "wav")), (col("doc_id") % 3).cast("int") + 1).as("format"),
        col("text"))
    val wanted = only.fold(tagged)(f => tagged.filter(col("format") === f))
    wanted.as[(Long, String, String)].mapPartitions { it =>
      it.map { case (id, format, text) =>
        val payload = format match {
          case "png" | "jpeg" => encodeImage(format, id)
          case _              => text.getBytes("UTF-8")
        }
        (id, format, payload)
      }
    }.toDF("media_id", "format", "payload")
  }

  /** [STUB] "Decode" typed metadata from the payload: deterministic
    * pseudo-dimensions from the content hash, real byte length. */
  def decodeMeta(payload: Column): Column =
    struct(
      length(payload).cast("long").as("n_bytes"),
      (pmod(xxhash64(payload), lit(1920L)) + 1L).as("width"),
      (pmod(xxhash64(payload, lit(1L)), lit(1080L)) + 1L).as("height"))

  /** [STUB] Fixed-width float feature vector from the payload (hash-mixed;
    * a real model would replace the per-element expression). */
  def features(payload: Column, dim: Int): Column =
    transform(sequence(lit(0), lit(dim - 1)),
      i => (pmod(xxhash64(payload, i), lit(1000L)).cast("double") / 1000.0).cast("float"))

  /** Frame sampling for "video" payloads: every `stride` bytes take a
    * `frameSize`-byte slice. Real Spark slicing over BinaryType; frames
    * explode into one row each so downstream feature extraction
    * parallelizes per frame, not per video. */
  def sampleFrames(payload: Column, frameSize: Int, stride: Int): Column =
    when(length(payload) >= frameSize,
      transform(sequence(lit(0), floor((length(payload) - frameSize) / stride).cast("int")),
        i => substring(payload, (i * stride + 1).cast("int"), lit(frameSize))))
      .otherwise(array().cast("array<binary>"))

  /** Media metadata extraction through the codec SPI — the per-partition-
    * instance `mapPartitions` path ([[decodeWithCodec]]), NOT inline
    * expressions. png/jpeg dims are REAL `javax.imageio` header parses of
    * the actual bytes; wav falls back to the stub. (Rows-only check:
    * binary fixtures have no DuckDB counterpart; dims-vs-fixture contract
    * + instance-count covered by MultimodalSpec. [[decodeMeta]] remains
    * the pure-expression variant for pipelines that want codegen over a
    * cheap header parse.) */
  def m01MediaMeta(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    decodeWithCodec(mediaTable(s, dir).as[MediaRecord])
      .select(col("media_id"), col("format"), col("n_bytes"),
        col("width").cast("long").as("width"),
        col("height").cast("long").as("height"))
      .orderBy("media_id")
  }

  /** Frame sampling + per-frame features over the synthesized "videos".
    * Filters to wav BEFORE payload synthesis — encoding images for rows
    * this query drops would be pure waste. */
  def m02FrameFeatures(s: SparkSession, dir: String): DataFrame =
    mediaTableFiltered(s, dir, Some("wav"))
      .select(col("media_id"), posexplode(sampleFrames(col("payload"), 64, 48)))
      .toDF("media_id", "frame_no", "frame")
      .select(col("media_id"), col("frame_no").cast("long").as("frame_no"),
        length(col("frame")).cast("long").as("frame_bytes"),
        round(element_at(features(col("frame"), 8), 1).cast("double"), 3).as("f0"))
      .orderBy("media_id", "frame_no")

  /** [STUB-decode] 64-bit perceptual-hash analogue: one bit per stub
    * feature (threshold 0.5). A real pHash replaces `features` with
    * DCT-of-pixels; the bit-packing, banding and hamming verify below
    * are the production shape either way. Identical payloads hash
    * identically (the stub features are content-deterministic), so the
    * near-dup join finds at least the exact-duplicate classes. */
  def perceptualHash(payload: Column): Column =
    aggregate(
      zip_with(features(payload, 64), sequence(lit(0), lit(63)),
        (f, i) => when(f > 0.5f,
          call_function("shiftleft", lit(1L), i.cast("int"))).otherwise(lit(0L))),
      lit(0L), (acc, x) => acc.bitwiseOR(x))

  /** Media near-dup pairs via pHash band blocking + hamming verify —
    * [[Dedup.d02SimhashPairs]]'s shape lifted to the multimodal surface:
    * 16-bit bands key the candidate join (never all-pairs), xor+popcount
    * verifies. Rows-only check; MultimodalSpec proves the pairs match
    * exact payload equality for the stub hash. */
  def m03MediaNearDup(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.TextFunctions.{hamming64, simhashBands}
    // the synthetic corpus has no duplicate payloads, so plant re-uploads
    // of the first 100 media items under shifted ids (same trick as
    // t06's planted PII) — both the query and its spec see them
    val base = mediaTable(s, dir)
    val reuploads = base.filter(col("media_id") < 100)
      .select((col("media_id") + 10000L).as("media_id"), col("format"), col("payload"))
    val hashed = base.union(reuploads)
      .select(col("media_id"), perceptualHash(col("payload")).as("phash"))
    val bands = hashed.select(col("media_id"), col("phash"),
      explode(simhashBands(col("phash"))).as("band"))
    bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.media_id") < col("b.media_id"))
      .select(col("a.media_id").as("media_a"), col("b.media_id").as("media_b"),
        hamming64(col("a.phash"), col("b.phash")).as("hamming"))
      .filter(col("hamming") <= 8)
      .distinct()
      .orderBy("media_a", "media_b")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m01_media_meta"     -> (m01MediaMeta _),
    "m02_frame_features" -> (m02FrameFeatures _),
    "m03_media_neardup"  -> (m03MediaNearDup _),
  )

  val oracleSql: Map[String, String] = Map.empty

  // ---------------------------------------------------- codec-SPI pattern

  final case class MediaRecord(media_id: Long, format: String, payload: Array[Byte])
  final case class DecodedMedia(media_id: Long, format: String, n_bytes: Long,
      width: Int, height: Int, checksum: Long)

  /** [STUB] A "codec" with per-instance init cost — stands in for a JNI
    * image/audio decoder. Deterministic output from the payload bytes. */
  final class StubCodec extends Serializable {
    StubCodec.instances.incrementAndGet() // observable per-partition reuse
    def decode(m: MediaRecord): DecodedMedia = {
      var h = 1125899906842597L
      var i = 0
      while (i < m.payload.length) { h = 31 * h + m.payload(i); i += 1 }
      DecodedMedia(m.media_id, m.format, m.payload.length.toLong,
        (math.floorMod(h, 1920L) + 1).toInt, (math.floorMod(h >>> 13, 1080L) + 1).toInt, h)
    }
  }
  object StubCodec {
    val instances = new java.util.concurrent.atomic.AtomicInteger(0)
  }

  /** REAL image metadata codec: parses width/height from the actual
    * png/jpeg bytes via `javax.imageio` header readers (JDK built-in, no
    * external libraries). Header-only — `reader.getWidth(0)` reads the
    * IHDR/SOF marker, never decodes pixels — so cost per record is O(KB
    * of header), not O(pixels): the right production shape for metadata
    * extraction over 100 TB of media. Unrecognized formats and corrupt
    * payloads fall back to the stub (one fallback instance per codec, so
    * the per-partition instance accounting MultimodalSpec checks still
    * holds). */
  final class ImageHeaderCodec extends Serializable {
    private val fallback = new StubCodec()
    javax.imageio.ImageIO.setUseCache(false) // in-memory streams, no temp files
    def decode(m: MediaRecord): DecodedMedia =
      if (m.format == "png" || m.format == "jpeg") {
        val iis = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(m.payload))
        try {
          val readers = javax.imageio.ImageIO.getImageReaders(iis)
          if (readers.hasNext) {
            val r = readers.next()
            try {
              r.setInput(iis, true, true)
              fallback.decode(m).copy(width = r.getWidth(0), height = r.getHeight(0))
            } finally r.dispose()
          } else fallback.decode(m)
        } catch {
          case _: java.io.IOException => fallback.decode(m)
        } finally iis.close()
      } else fallback.decode(m)
  }

  /** The real-decoder integration path: `mapPartitions` with ONE codec
    * instance per partition (not per row) — the Spark-side shape a JNI
    * or model-based decoder needs (amortized init, batched access,
    * executor-parallel). This is the Scala analogue of a batched
    * `mapInPandas` decode stage. Routes png/jpeg through the REAL
    * [[ImageHeaderCodec]]; other formats hit its stub fallback. */
  def decodeWithCodec(ds: Dataset[MediaRecord]): Dataset[DecodedMedia] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      val codec = new ImageHeaderCodec()
      it.map(codec.decode)
    }
  }
}
