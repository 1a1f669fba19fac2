package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Multimodal-column plumbing: image/audio/video as opaque BinaryType
  * payloads with typed metadata, plus decode / feature-extract /
  * frame-sample operators.
  *
  * STUB NOTICE — the *decoders* are deterministic fakes (no image/audio
  * libraries in this environment): `decodeMeta` derives dimensions from
  * xxhash64 of the payload instead of parsing a real JPEG/WAV header, and
  * `features` hashes byte ranges instead of running a model. Everything
  * around them — BinaryType schema, column plumbing, frame slicing, batch
  * shape, partition-parallel execution — is real Spark and is what the
  * tests cover. Swapping in a real decoder means replacing only the
  * bodies of `decodeMeta`/`features` (e.g. with a mapPartitions over a
  * JNI codec, reusing one decoder instance per partition).
  */
object Multimodal {

  /** Synthesize a media table from documents: payload = UTF-8 bytes of
    * the text (a stand-in for real image bytes), format round-robin. */
  def mediaTable(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id").as("media_id"),
        element_at(typedlit(Seq("png", "jpeg", "wav")), (col("doc_id") % 3).cast("int") + 1).as("format"),
        encode(col("text"), "UTF-8").as("payload"))

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
    * expressions, so the driver gate exercises the exact seam a real JNI
    * decoder plugs into. (Rows-only check: stub-derived dims have no
    * DuckDB counterpart; plumbing + instance-count covered by
    * MultimodalSpec. [[decodeMeta]] remains the pure-expression variant
    * for pipelines that want codegen over a cheap header parse.) */
  def m01MediaMeta(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    decodeWithCodec(mediaTable(s, dir).as[MediaRecord])
      .select(col("media_id"), col("format"), col("n_bytes"),
        col("width").cast("long").as("width"),
        col("height").cast("long").as("height"))
      .orderBy("media_id")
  }

  /** Frame sampling + per-frame features over the synthesized "videos". */
  def m02FrameFeatures(s: SparkSession, dir: String): DataFrame =
    mediaTable(s, dir)
      .filter(col("format") === "wav")
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

  /** The real-decoder integration path: `mapPartitions` with ONE codec
    * instance per partition (not per row) — the Spark-side shape a JNI
    * or model-based decoder needs (amortized init, batched access,
    * executor-parallel). This is the Scala analogue of a batched
    * `mapInPandas` decode stage. */
  def decodeWithCodec(ds: Dataset[MediaRecord]): Dataset[DecodedMedia] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      val codec = new StubCodec()
      it.map(codec.decode)
    }
  }
}
