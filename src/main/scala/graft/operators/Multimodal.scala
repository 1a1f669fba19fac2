package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Multimodal-column plumbing: image/audio/video as opaque BinaryType
  * payloads with typed metadata, plus decode / feature-extract /
  * frame-sample operators.
  *
  * Decode is REAL as of round 4 (pure JDK, no external libraries):
  *  - png/jpeg payloads are genuine encoded images (`ImageIO`);
  *    [[ImageHeaderCodec]] parses width/height from actual bytes via
  *    `javax.imageio` header readers (header-only — cheap at scale), and
  *    [[AHashCodec]] computes a real pixel-space average-hash for m03's
  *    near-dup banding;
  *  - wav payloads are genuine RIFF/WAVE files (canonical header +
  *    16-bit PCM); [[WavHeaderCodec]] chunk-scans the real header for
  *    m04's hash-matched audio metadata.
  *
  * No stub operators remain: every decode reads actual bytes, and
  * content embeddings come from [[EmbedCodec]] — a deterministic
  * fixed-weight model runtime over DECODED features (m05 runs near-dup
  * banding on its vectors, hash-matched). [[StubCodec]] survives only
  * as the documented FALLBACK for undecodable payloads (and the
  * per-partition instance counter the specs observe). The Spark-side
  * shape — BinaryType schema, mapPartitions codec SPI with one instance
  * per partition, frame slicing, partition-parallel execution — is the
  * production integration seam throughout; swapping a neural model for
  * EmbedCodec's fixed weights changes no Spark-side line.
  */
object Multimodal {

  /** Deterministic image dimensions for a media id — the fixture contract
    * MultimodalSpec checks decoded values against. */
  def imageDims(id: Long): (Int, Int) =
    ((16 + math.floorMod(id, 32L)).toInt, (16 + math.floorMod(id / 3, 24L)).toInt)

  /** The id-derived source image every encoder shares: pixels form a 4×4
    * BLOCK pattern, not a flat color (a uniform image is degenerate for
    * average-hash — every pixel equals the mean — so
    * [[m03MediaNearDup]]'s real pHash needs structure; distinct ids get
    * decorrelated patterns). Filled through the INT_RGB raster's backing
    * array — identical ints to the per-pixel setRGB loop (INT_RGB stores
    * the packed value verbatim), ~10× less call overhead (r16 §1.2
    * per-task work; the mediamicro probe). */
  private def patternImage(id: Long): java.awt.image.BufferedImage = {
    val (w, h) = imageDims(id)
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val data = img.getRaster.getDataBuffer
      .asInstanceOf[java.awt.image.DataBufferInt].getData
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        var m = id * 2654435761L + (x >> 2) * 40503L + (y >> 2) * 65537L
        m ^= m >>> 33; m *= 0xff51afd7ed558ccdL; m ^= m >>> 33
        data(y * w + x) = (m & 0xFFFFFF).toInt
        x += 1
      }
      y += 1
    }
    img
  }

  /** Encode a real image (png/jpeg) via the JDK's ImageIO. Tiny (≤47×39)
    * so fixture synthesis stays cheap. The REFERENCE encoder — one
    * registry lookup per call; the hot path ([[mediaTableFiltered]]) goes
    * through [[MediaEncoder]], which reuses one ImageWriter per format
    * and is spec-pinned byte-identical to this. */
  private[graft] def encodeImage(format: String, id: Long): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(patternImage(id), format, out)
    out.toByteArray
  }

  /** Per-partition image encoder: one ImageWriter per format for the
    * partition's lifetime instead of a registry lookup + writer
    * construction per row (guide §1.2 per-task work / §4.5 amortized
    * init — the codec-SPI shape on the ENCODE side). Default write
    * params, same writers the registry returns → output bytes are
    * IDENTICAL to [[encodeImage]] (MultimodalSpec pins it for both
    * formats; jpeg is lossy, so byte-identity is the contract that keeps
    * every downstream decode bit-stable). NOT Serializable on purpose —
    * construct inside mapPartitions. */
  private[graft] final class MediaEncoder {
    private val writers = scala.collection.mutable.HashMap.empty[String, javax.imageio.ImageWriter]
    def encodeImage(format: String, id: Long): Array[Byte] = {
      val w = writers.getOrElseUpdate(format,
        javax.imageio.ImageIO.getImageWritersByFormatName(format).next())
      val bos = new java.io.ByteArrayOutputStream()
      val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
      try {
        w.setOutput(ios)
        w.write(null, new javax.imageio.IIOImage(patternImage(id), null, null), null)
      } finally ios.close()
      bos.toByteArray
    }
  }

  /** Audio fixture contract: deterministic WAV parameters for a media id
    * — SQL-expressible, so [[m04AudioMeta]]'s REAL header parse gets a
    * DuckDB oracle. */
  def wavParams(id: Long): (Int, Int, Int) =
    ((8000 + math.floorMod(id, 8L) * 1000).toInt,  // sample rate
      (1 + math.floorMod(id, 2L)).toInt,           // channels
      (256 + math.floorMod(id, 256L)).toInt)       // samples per channel

  /** Encode a REAL RIFF/WAVE file (44-byte canonical header + 16-bit PCM
    * samples, little-endian) — the audio analogue of [[encodeImage]].
    * Samples are id-derived noise; the header fields follow
    * [[wavParams]]. */
  private[graft] def encodeWav(id: Long): Array[Byte] = {
    val (rate, channels, nSamples) = wavParams(id)
    val dataLen = nSamples * channels * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(channels.toShort).putInt(rate)
      .putInt(rate * channels * 2).putShort((channels * 2).toShort).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < nSamples * channels) {
      buf.putShort(((id * 31 + i * 1299709L) % 65536L - 32768L).toShort)
      i += 1
    }
    buf.array()
  }

  /** Synthesize a media table from documents: format round-robin; png
    * and jpeg rows carry REAL encoded image bytes (dims = [[imageDims]]),
    * wav rows carry REAL RIFF/WAVE payloads ([[encodeWav]], params =
    * [[wavParams]]). Payload synthesis runs in mapPartitions on the
    * executors — the driver never holds media bytes. */
  def mediaTable(s: SparkSession, dir: String): DataFrame =
    mediaTableFiltered(s, dir, Nil)

  /** Internal variant letting callers filter by format BEFORE payload
    * synthesis (media encoding for rows a downstream filter would drop is
    * pure waste — m02/m04 only want wav, m03 only images). Empty `only`
    * keeps every format. */
  private[operators] def mediaTableFiltered(
      s: SparkSession, dir: String, only: Seq[String]): DataFrame = {
    import s.implicits._
    val tagged = Tables.documents(s, dir)
      .select(col("doc_id").as("media_id"),
        element_at(typedlit(Seq("png", "jpeg", "wav")), (col("doc_id") % 3).cast("int") + 1).as("format"),
        col("text"))
    val wanted = if (only.isEmpty) tagged else tagged.filter(col("format").isin(only: _*))
    wanted.as[(Long, String, String)].mapPartitions { it =>
      val enc = new MediaEncoder() // writer reuse, byte-identical (r16)
      it.map { case (id, format, _) =>
        val payload = format match {
          case "png" | "jpeg" => enc.encodeImage(format, id)
          case _              => encodeWav(id)
        }
        (id, format, payload)
      }
    }.toDF("media_id", "format", "payload")
  }

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
    * the actual bytes; wav rows fall back to the content-hash stub
    * (their real metadata is m04's dedicated RIFF parse). Rows-only
    * check: mixed-format dims have no single DuckDB counterpart; the
    * dims-vs-fixture contract + per-partition instance count are covered
    * by MultimodalSpec. */
  def m01MediaMeta(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // cache before the total-order sort: the range exchange SAMPLES its
    // child and there is no shuffle below it, so the whole synth+decode
    // chain would run twice (the r11 q90 lesson). Query-scoped;
    // Verify/Bench clearCache after.
    decodeWithCodec(mediaTable(s, dir).as[MediaRecord])
      .select(col("media_id"), col("format"), col("n_bytes"),
        col("width").cast("long").as("width"),
        col("height").cast("long").as("height"))
      .cache()
      .orderBy("media_id")
  }

  final case class FrameFeatures(media_id: Long, frame_no: Long,
      n_samples: Long, rms_e2: Long, zcr: Long)

  /** REAL per-frame signal features from the PCM stream: frames of 32
    * samples at stride 24 over the interleaved sample sequence
    * (channel-agnostic, documented contract; tail frames may be short,
    * same sliding contract as t22's chunking); per frame the
    * root-mean-square amplitude (scaled-integer `rms_e2` =
    * floor(√(Σv²/n)·100 + 0.5), one IEEE chain from exact integer sums)
    * and the zero-crossing count — the two classic cheap audio
    * descriptors. Decodes the actual RIFF bytes through the codec SPI. */
  final class PcmFrameCodec extends Serializable {
    private val header = new WavHeaderCodec()
    def features(m: MediaRecord): Iterator[FrameFeatures] = {
      val (meta, dataOffset) = header.decodeWithDataOffset(m)
      val buf = java.nio.ByteBuffer.wrap(m.payload)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      // seek to the parsed data-chunk offset (NOT a hardcoded 44: a WAV
      // with extra chunks before `data` would otherwise be misread);
      // total interleaved samples = n_samples × channels
      val total = (meta.n_samples * meta.n_channels).toInt
      val samples = new Array[Int](total)
      buf.position(dataOffset)
      var j = 0
      while (j < total) { samples(j) = buf.getShort.toInt; j += 1 }
      val out = scala.collection.mutable.ArrayBuffer[FrameFeatures]()
      var f = 0
      var start = 0
      while (start < total) {
        val len = math.min(32, total - start)
        var ss = 0L; var zc = 0L
        var i = start
        while (i < start + len) {
          val v = samples(i)
          ss += v.toLong * v
          if (i > start && ((samples(i - 1) < 0) != (v < 0))) zc += 1
          i += 1
        }
        val rmsE2 = math.floor(math.sqrt(ss.toDouble / len) * 100.0 + 0.5).toLong
        out += FrameFeatures(m.media_id, f.toLong, len.toLong, rmsE2, zc)
        f += 1; start += 24
      }
      out.iterator
    }
  }

  /** Frame sampling + REAL per-frame signal features over the genuine
    * WAV payloads (filtered to wav BEFORE payload synthesis). The
    * fixture's samples are an id-derived formula, so DuckDB recomputes
    * every frame's RMS and zero-crossing count — this query is
    * HASH-MATCHED, with the decode running over actual bytes. */
  def m02FrameFeatures(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    mediaTableFiltered(s, dir, Seq("wav")).as[MediaRecord]
      .mapPartitions { it =>
        val codec = new PcmFrameCodec()
        it.flatMap(codec.features)
      }
      .toDF()
      // NOTE (r16): a pre-sort cache A/B'd NEUTRAL-to-worse here (0.41 ->
      // 0.46 s min) — the per-frame explode makes the cached output ~22x
      // the input rows, and the columnar build eats the decode saving.
      .orderBy("media_id", "frame_no")
  }

  /** Image near-dup pairs via REAL average-hash band blocking + hamming
    * verify — [[Dedup.d02SimhashPairs]]'s shape lifted to the multimodal
    * surface with an actual pixel-space hash ([[AHashCodec]]: decode →
    * 8×8 luminance grid → above-mean bits): 16-bit bands key the
    * candidate join (never all-pairs), xor+popcount verifies ≤ 8.
    * Rows-only check (pixel decode has no SQL counterpart);
    * MultimodalSpec proves the pairs equal exact payload equality on
    * this fixture (identical payloads hash identically; distinct
    * id-derived patterns land far apart). */
  def m03MediaNearDup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.functions.TextFunctions.{hamming64, simhashBands}
    // the synthetic corpus has no duplicate payloads, so plant re-uploads
    // of the first 100 media items under shifted ids (same trick as
    // t06's planted PII) — both the query and its spec see them
    val imgs = mediaTableFiltered(s, dir, Seq("png", "jpeg"))
    val reuploads = imgs.filter(col("media_id") < 100)
      .select((col("media_id") + 10000L).as("media_id"), col("format"), col("payload"))
    // cache the narrow (media_id, phash) table: the union re-evaluates
    // imgs and the band self-join reads hashed twice — without the cache
    // the encode+decode pipeline runs ~4× (measured 9.3 s → ~3 s at
    // sf0.1). Query-scoped; Verify/Bench clearCache() after each query.
    val hashed = imgs.union(reuploads).as[MediaRecord]
      .mapPartitions { it =>
        val codec = new AHashCodec()
        it.map(m => (m.media_id, codec.ahash(m)))
      }
      .toDF("media_id", "phash")
      .cache()
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

  /** Content embeddings as an ANN-ready (vec_id, emb, nrm) frame — the
    * bridge from the multimodal decode path into the vector-store
    * surface: feed it to [[Similarity.writeAnnIndex]] and media joins
    * the SAME persisted artifact lifecycle (build/append/delete/query)
    * as any other embedding corpus. [[EmbedCodec]] emits unit vectors,
    * but nrm is computed rather than assumed so the frame satisfies the
    * ANN contract by construction. */
  def contentEmbeddings(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    mediaTableFiltered(s, dir, Seq("png", "jpeg")).as[MediaRecord]
      .mapPartitions { it =>
        val codec = new EmbedCodec()
        it.map(m => (m.media_id, codec.embed(m)))
      }
      .toDF("vec_id", "emb")
      .withColumn("nrm", graft.functions.VectorFunctions.l2Norm(col("emb")))
  }

  /** Image near-dup over CONTENT-DERIVED model embeddings — m03's
    * banding machinery re-based from the pixel average-hash onto
    * [[EmbedCodec]] vectors (decode → centered luminance features →
    * fixed-seed projection → L2-normalize), with SRP sign-bit banding
    * for candidates and an exact-cosine verify ≥ 0.9 on candidates only.
    * Planted re-uploads (ids +10000 of the first 100 images, the
    * d12/m03 trick) must come back as exactly (original, planted) at
    * cosine 1.0 — identical bytes decode to identical features — and
    * distinct patterns decorrelate far below threshold, so the expected
    * pair set is a pure id formula and the query is HASH-MATCHED. */
  def m05ContentEmbedPairs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.functions.TextFunctions.{hamming64, simhashBands}
    val imgs = mediaTableFiltered(s, dir, Seq("png", "jpeg"))
    val reuploads = imgs.filter(col("media_id") < 100)
      .select((col("media_id") + 10000L).as("media_id"), col("format"), col("payload"))
    // narrow (id, vector, srp) table cached: the band join and the
    // two-sided verify re-read it (same lifecycle note as m03)
    val embedded = imgs.union(reuploads).as[MediaRecord]
      .mapPartitions { it =>
        val codec = new EmbedCodec()
        it.map { m =>
          val v = codec.embed(m)
          (m.media_id, v, codec.srpBits(v))
        }
      }
      .toDF("media_id", "emb", "srp")
      .cache()
    val bands = embedded.select(col("media_id"), col("srp"),
      explode(simhashBands(col("srp"))).as("band"))
    val cand = bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.media_id") < col("b.media_id"))
      .select(col("a.media_id").as("media_a"), col("b.media_id").as("media_b"),
        hamming64(col("a.srp"), col("b.srp")).as("hamming"))
      .filter(col("hamming") <= 8)
      .distinct()
      .select(col("media_a"), col("media_b"))
    val va = embedded.select(col("media_id").as("media_a"), col("emb").as("ea"))
    val vb = embedded.select(col("media_id").as("media_b"), col("emb").as("eb"))
    cand.join(va, Seq("media_a")).join(vb, Seq("media_b"))
      .select(col("media_a"), col("media_b"),
        floor(graft.functions.VectorFunctions.dot(col("ea"), col("eb")) * 1e6 + 0.5)
          .cast("long").as("cos_e6"))
      .filter(col("cos_e6") >= 900000L)
      .orderBy("media_a", "media_b")
  }

  // -------------------------------------------------------------- resize

  final case class ThumbRow(media_id: Long, out_k: Long, mean_lum_e2: Long,
      thumb_e2: Array[Long])
  final case class ThumbGateRow(media_id: Long, in_w: Long, in_h: Long,
      n_pix: Long, ok: Long)

  /** Per-instance reusable full-frame image decoder: one ImageReader per
    * format (registry lookup + reader construction once per partition,
    * not per row — measured ~2× on the decode in the r16 mediamicro
    * probe), falling back to content-sniffing `ImageIO.read` on any
    * by-format failure so decode semantics are unchanged for payloads
    * whose bytes don't match their declared format. Same underlying JDK
    * reader either way → identical pixels. Construct inside
    * mapPartitions (not Serializable). */
  private[operators] final class ImageDecoder {
    javax.imageio.ImageIO.setUseCache(false)
    private val readers = scala.collection.mutable.HashMap.empty[String, javax.imageio.ImageReader]
    def read(m: MediaRecord): java.awt.image.BufferedImage = {
      val byFormat =
        try {
          val r = readers.getOrElseUpdate(m.format,
            javax.imageio.ImageIO.getImageReadersByFormatName(m.format).next())
          val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
            new java.io.ByteArrayInputStream(m.payload))
          try { r.setInput(iis, true, true); r.read(0) } finally iis.close()
        } catch { case scala.util.control.NonFatal(_) => null }
      if (byFormat != null) byFormat
      else javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(m.payload))
    }
  }

  /** Whole-image packed-RGB grab: the TYPE_3BYTE_BGR raster (what the JDK
    * png/jpeg decoders emit) is read straight from its backing byte
    * array when the layout is the canonical w·3-stride interleave —
    * ~10× over per-pixel getRGB (r16 mediamicro) — with the bulk
    * `getRGB` fallback for anything else. Both paths yield the identical
    * packed (r<<16|g<<8|b) ints row-major (consumers mask the low 24
    * bits, so the fallback's alpha byte is irrelevant). */
  private[graft] def packedRgb(img: java.awt.image.BufferedImage): Array[Int] = {
    val w = img.getWidth; val h = img.getHeight
    if (img.getType == java.awt.image.BufferedImage.TYPE_3BYTE_BGR &&
        img.getRaster.getDataBuffer.isInstanceOf[java.awt.image.DataBufferByte]) {
      img.getRaster.getSampleModel match {
        case sm: java.awt.image.PixelInterleavedSampleModel
            if sm.getPixelStride == 3 && sm.getScanlineStride == w * 3 &&
              img.getRaster.getSampleModelTranslateX == 0 &&
              img.getRaster.getSampleModelTranslateY == 0 =>
          val d = img.getRaster.getDataBuffer
            .asInstanceOf[java.awt.image.DataBufferByte].getData
          val out = new Array[Int](w * h)
          var i = 0; var j = 0
          while (i < out.length) {
            out(i) = ((d(j + 2) & 0xFF) << 16) | ((d(j + 1) & 0xFF) << 8) | (d(j) & 0xFF)
            i += 1; j += 3
          }
          return out
        case _ => ()
      }
    }
    img.getRGB(0, 0, w, h, null, 0, w)
  }

  /** k×k mean-pool of the integer BT.601 luminance plane (299R + 587G +
    * 114B, e3-scaled — integer per pixel, so cell sums are EXACT).
    * Pixel-major assignment: pixel (x, y) belongs to cell
    * (⌊x·k/w⌋, ⌊y·k/h⌋), so the cells tile the image — every pixel
    * counted exactly once by construction. Returns per-cell
    * (sum1000, count) so callers can derive means, totals, or bits
    * without losing exactness. */
  private[operators] def thumbCells(
      img: java.awt.image.BufferedImage, k: Int): (Array[Long], Array[Long]) = {
    val (w, h) = (img.getWidth, img.getHeight)
    val px = packedRgb(img) // exact same packed ints, 10× the access speed
    val sums = new Array[Long](k * k); val counts = new Array[Long](k * k)
    var y = 0
    while (y < h) {
      val gy = math.min(y * k / h, k - 1)
      var x = 0
      while (x < w) {
        val gx = math.min(x * k / w, k - 1)
        val rgb = px(y * w + x)
        val c = gy * k + gx
        sums(c) += 299L * ((rgb >> 16) & 0xFF) + 587L * ((rgb >> 8) & 0xFF) +
          114L * (rgb & 0xFF)
        counts(c) += 1
        x += 1
      }
      y += 1
    }
    (sums, counts)
  }

  /** Resize codec: decodes real png/jpeg bytes and mean-pools them to a
    * k×k luminance thumbnail (the imperative per-pixel loop is genuine
    * mapPartitions territory, like every decoder here). `gate` re-sums
    * the luminance plane in an INDEPENDENT whole-image pass and checks
    * the pooled cell sums tile it exactly — integer equality, so any
    * grid bug (dropped row, double-counted boundary) flips `ok`. */
  final class ThumbnailCodec(k: Int) extends Serializable {
    javax.imageio.ImageIO.setUseCache(false)
    @transient private lazy val decoder = new ImageDecoder()
    private def decode(m: MediaRecord): java.awt.image.BufferedImage = {
      val img = decoder.read(m)
      require(img != null, s"media ${m.media_id}: undecodable image payload")
      img
    }
    def thumb(m: MediaRecord): ThumbRow = {
      val (sums, counts) = thumbCells(decode(m), k)
      val nPix = counts.sum
      ThumbRow(m.media_id, k.toLong,
        if (nPix > 0) sums.sum * 100L / (nPix * 1000L) else 0L,
        Array.tabulate(k * k)(i =>
          if (counts(i) > 0) sums(i) * 100L / (counts(i) * 1000L) else 0L))
    }
    def gate(m: MediaRecord): ThumbGateRow = {
      val img = decode(m)
      val (w, h) = (img.getWidth, img.getHeight)
      val (sums, counts) = thumbCells(img, k)
      // still an INDEPENDENT whole-image pass (no cell assignment), just
      // through the same packed-RGB grab as thumbCells
      val px = packedRgb(img)
      var direct = 0L; var i = 0
      while (i < px.length) {
        val rgb = px(i)
        direct += 299L * ((rgb >> 16) & 0xFF) + 587L * ((rgb >> 8) & 0xFF) +
          114L * (rgb & 0xFF)
        i += 1
      }
      val ok = if (sums.sum == direct && counts.sum == w.toLong * h) 1L else 0L
      ThumbGateRow(m.media_id, w.toLong, h.toLong, counts.sum, ok)
    }
  }

  /** Image RESIZE: 4×4 mean-pooled luminance thumbnails from REAL
    * decoded pixels (integer-exact cell means, e2-scaled). This is the
    * LIBRARY API — `thumb_e2` stays a typed `Array[Long]` of the 16
    * cells. Rows-only — pixel content isn't SQL-expressible;
    * [[m06ThumbGate]] is the hash-matched companion and MultimodalSpec
    * pins exact cell values on crafted quadrant images. Plan: payload
    * synthesis + decode + pool all inside one mapPartitions pass —
    * embarrassingly parallel, one codec instance per partition. */
  def thumbnails(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    mediaTableFiltered(s, dir, Seq("png", "jpeg")).as[MediaRecord]
      .mapPartitions { it =>
        val codec = new ThumbnailCodec(4)
        it.map(codec.thumb)
      }.toDF()
      // cache before the total-order sort: the range exchange SAMPLES its
      // child and no shuffle sits below, so the full encode+decode+pool
      // pass would run twice (the r11 q90 lesson). Query-scoped;
      // Verify/Bench clearCache after.
      .cache()
      .orderBy("media_id")
  }

  /** Driver-registered face of [[thumbnails]]: the 16 cell values are
    * flattened to one deterministic "|"-joined string so the rows-only
    * harness (pandas canonicalization) can sort/hash the column —
    * array-typed cells are unhashable there (the round-7 `err`). The
    * array stays available through [[thumbnails]]. */
  def m06Thumbnail(s: SparkSession, dir: String): DataFrame =
    thumbnails(s, dir)
      .withColumn("thumb_e2",
        array_join(transform(col("thumb_e2"), _.cast("string")), "|"))

  /** [[m06Thumbnail]]'s oracle gate: per image, the REAL decoded
    * dimensions, the pooled pixel count, and the exact-tiling flag.
    * DuckDB recomputes dims from the [[imageDims]] fixture contract and
    * expects n_pix = w·h and ok = 1 everywhere — a full per-row hash
    * match, driver-visible. */
  def m06ThumbGate(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    mediaTableFiltered(s, dir, Seq("png", "jpeg")).as[MediaRecord]
      .mapPartitions { it =>
        val codec = new ThumbnailCodec(4)
        it.map(codec.gate)
      }.toDF()
      // cache before the total-order sort (range-sample double-decode,
      // the r11 q90 lesson); query-scoped, harnesses clearCache after
      .cache()
      .orderBy("media_id")
  }

  /** Driver gate for the MEDIA vector-store lifecycle (round-8 verdict
    * ask #6 — the append/delete/re-route story lived only in
    * MultimodalSpec; this lifts it into the oracle-visible surface,
    * the d18/s13 flag pattern): content embeddings of the image corpus
    * feed [[graft.operators.Similarity.writeAnnIndex]], then the
    * sequenced lifecycle runs and each stage's hit set is checked
    * exactly —
    *  - `reupload_routes`: a byte-identical re-upload of the first
    *    image (new media id, same embedding) APPENDed through the
    *    frozen sidecar becomes its own query's cos≈1 hit alongside the
    *    original;
    *  - `delete_forgets`: right-to-be-forgotten removes the ORIGINAL;
    *    only the re-upload may still match;
    *  - `reupload_reroutes`: a SECOND re-upload after the delete
    *    routes beside the survivor — frozen-state appends stay
    *    consistent across delete generations.
    * Hit sets are exact id sets at sim_e6 ≥ 999000 (identical bytes ⇒
    * identical [[EmbedCodec]] vectors ⇒ cos 1; organic image pairs
    * decorrelate far below, the m05-measured margin). DuckDB anchors
    * the image count and the literal-true flags. Results return as a
    * collected local relation; the artifact tables are dropped before
    * returning (the s13 rule). */
  /** m07 result memo keyed on the documents fingerprint ([[GateMemo]] —
    * the media table derives from documents, so that is the
    * invalidation key): first invocation pays the decode + lifecycle,
    * replays serve the collected one-row result; emitted under
    * "amortized" in the bench JSON. */
  def m07MediaLifecycleGate(s: SparkSession, dir: String): DataFrame =
    GateMemo.cached(s, dir,
      Tables.fixtureFingerprint(dir, "documents.parquet"), "m07")(
      m07Body(s, dir))

  private def m07Body(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val name = "graft_m07_lc"
    // cache: five consumers (build scan, count, first-id probe,
    // re-upload projection, query projection) would each re-DECODE the
    // whole image corpus through the embed codec otherwise (measured
    // dominating the gate); query-scoped, unpersisted in finally
    val vecs = contentEmbeddings(s, dir).cache()
    try {
      // ivf-only: the gate queries annIvfIndexed alone — training PQ
      // codebooks and SRP signatures over the media vectors would be
      // pure build-cost waste (the full-family media artifact is
      // MultimodalSpec's routing case, not this lifecycle contract)
      Similarity.writeAnnIndex(s, vecs, name, numBuckets = 4,
        families = Set("ivf"))
      val nImages = vecs.count()
      val firstId = vecs.orderBy("vec_id").limit(1).collect()
        .headOption.map(_.getLong(0)).getOrElse(0L)
      val reup = vecs.filter(col("vec_id") === firstId)
        .select((col("vec_id") + 50000L).as("vec_id"), col("emb"), col("nrm"))
      Similarity.appendToAnnIndex(s, reup, name, numBuckets = 4)
      val q = vecs.filter(col("vec_id") === firstId)
        .select(lit(0L).as("query_id"), col("emb").as("qe"), col("nrm").as("qn"))
      def hits(): Set[Long] = Similarity.annIvfIndexed(s, q, name)
        .filter(col("sim_e6") >= 999000L).collect().map(_.getLong(1)).toSet
      val emptyCorpus = nImages == 0L
      val routes = emptyCorpus || hits() == Set(firstId, firstId + 50000L)
      Similarity.deleteFromAnnIndex(s, name, Seq(firstId).toDF("vec_id"),
        numBuckets = 4)
      val forgets = emptyCorpus || hits() == Set(firstId + 50000L)
      Similarity.appendToAnnIndex(s,
        reup.select((col("vec_id") + 10000L).as("vec_id"), col("emb"), col("nrm")),
        name, numBuckets = 4)
      val reroutes = emptyCorpus ||
        hits() == Set(firstId + 50000L, firstId + 60000L)
      Seq((nImages, routes, forgets, reroutes))
        .toDF("n_images", "reupload_routes", "delete_forgets",
          "reupload_reroutes")
    } finally {
      vecs.unpersist()
      Seq("_cells", "_srp", "_pq", "_side",
        "_cells_tmp", "_srp_tmp", "_pq_tmp").foreach(sfx =>
        s.sql(s"DROP TABLE IF EXISTS `$name$sfx`"))
    }
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m01_media_meta"     -> (m01MediaMeta _),
    "m02_frame_features" -> (m02FrameFeatures _),
    "m03_media_neardup"  -> (m03MediaNearDup _),
    "m04_audio_meta"     -> (m04AudioMeta _),
    "m05_embed_neardup"  -> (m05ContentEmbedPairs _),
    "m06_thumbnail"      -> (m06Thumbnail _),
    "m06_thumb_gate"     -> (m06ThumbGate _),
    "m07_media_lifecycle_gate" -> (m07MediaLifecycleGate _),
  )

  /** m02/m04's outputs are deterministic functions of the fixture id
    * ([[wavParams]] + the PCM sample formula) — DuckDB recomputes what
    * the decoders must read out of the actual bytes. */
  val oracleSql: Map[String, String] = Map(
    "m02_frame_features" ->
      """WITH w AS (
        |  SELECT doc_id AS media_id,
        |    CAST((256 + doc_id % 256) * (1 + doc_id % 2) AS BIGINT) AS total
        |  FROM documents WHERE doc_id % 3 = 2),
        |fr AS (
        |  SELECT media_id, total, unnest(range(0, (total + 23) // 24)) AS frame_no
        |  FROM w),
        |fs AS (
        |  SELECT media_id, frame_no, frame_no * 24 AS fstart,
        |    least(32, total - frame_no * 24) AS len
        |  FROM fr),
        |sj AS (
        |  SELECT media_id, frame_no, len,
        |    unnest(range(fstart, fstart + len)) AS j
        |  FROM fs),
        |v AS (
        |  SELECT media_id, frame_no, len, j,
        |    CAST((media_id * 31 + j * 1299709) % 65536 - 32768 AS BIGINT) AS v
        |  FROM sj),
        |z AS (
        |  SELECT media_id, frame_no, len, v,
        |    lag(v) OVER (PARTITION BY media_id, frame_no ORDER BY j) AS pv
        |  FROM v),
        |agg AS (
        |  SELECT media_id, frame_no,
        |    CAST(max(len) AS BIGINT) AS n_samples,
        |    CAST(sum(v * v) AS BIGINT) AS ss,
        |    CAST(count(CASE WHEN pv IS NOT NULL AND ((pv < 0) <> (v < 0)) THEN 1 END) AS BIGINT) AS zcr
        |  FROM z GROUP BY 1, 2)
        |SELECT media_id, frame_no, n_samples,
        |  CAST(floor(sqrt(CAST(ss AS DOUBLE) / n_samples) * 100.0 + 0.5) AS BIGINT) AS rms_e2,
        |  zcr
        |FROM agg ORDER BY media_id, frame_no""".stripMargin,
    "m05_embed_neardup" ->
      """SELECT doc_id AS media_a, doc_id + 10000 AS media_b,
        |  CAST(1000000 AS BIGINT) AS cos_e6
        |FROM documents WHERE doc_id < 100 AND doc_id % 3 <> 2
        |ORDER BY media_a, media_b""".stripMargin,
    // dims from the imageDims fixture contract; exact tiling → n_pix is
    // the w·h product and ok is identically 1
    "m06_thumb_gate" ->
      """SELECT doc_id AS media_id,
        |  CAST(16 + doc_id % 32 AS BIGINT) AS in_w,
        |  CAST(16 + (doc_id // 3) % 24 AS BIGINT) AS in_h,
        |  CAST((16 + doc_id % 32) * (16 + (doc_id // 3) % 24) AS BIGINT) AS n_pix,
        |  CAST(1 AS BIGINT) AS ok
        |FROM documents WHERE doc_id % 3 <> 2 ORDER BY media_id""".stripMargin,
    "m04_audio_meta" ->
      """SELECT doc_id AS media_id,
        |  CAST(8000 + (doc_id % 8) * 1000 AS BIGINT) AS sample_rate,
        |  CAST(1 + doc_id % 2 AS BIGINT) AS n_channels,
        |  CAST(256 + doc_id % 256 AS BIGINT) AS n_samples,
        |  (CAST(256 + doc_id % 256 AS BIGINT) * 1000)
        |    // CAST(8000 + (doc_id % 8) * 1000 AS BIGINT) AS duration_ms
        |FROM documents WHERE doc_id % 3 = 2 ORDER BY media_id""".stripMargin,
    // lifecycle hit-set equalities are asserted Spark-side over the
    // sequenced append → delete → re-append (exact integer id sets at
    // sim_e6 ≥ 999000); DuckDB anchors the image count (the png/jpeg
    // rows of the media table) and the literal-true flags
    "m07_media_lifecycle_gate" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_images,
        |  true AS reupload_routes,
        |  true AS delete_forgets,
        |  true AS reupload_reroutes
        |FROM documents WHERE doc_id % 3 < 2""".stripMargin,
  )

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
    // one header reader per declared format, reused across the partition
    // (r16: the per-row registry scan + reader construction was ~half the
    // header-parse cost); a by-format failure falls through to the
    // original content-sniffing path, so mislabeled payloads decode
    // exactly as before
    @transient private lazy val readers =
      scala.collection.mutable.HashMap.empty[String, javax.imageio.ImageReader]
    def decode(m: MediaRecord): DecodedMedia =
      if (m.format == "png" || m.format == "jpeg") {
        val fast =
          try {
            val r = readers.getOrElseUpdate(m.format,
              javax.imageio.ImageIO.getImageReadersByFormatName(m.format).next())
            val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
              new java.io.ByteArrayInputStream(m.payload))
            try {
              r.setInput(iis, true, true)
              fallback.decode(m).copy(width = r.getWidth(0), height = r.getHeight(0))
            } finally iis.close()
          } catch { case scala.util.control.NonFatal(_) => null }
        if (fast != null) return fast
        val iis = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(m.payload))
        if (iis == null) return fallback.decode(m) // no SPI for the stream type
        try {
          val sniffed = javax.imageio.ImageIO.getImageReaders(iis)
          if (sniffed.hasNext) {
            val r = sniffed.next()
            try {
              r.setInput(iis, true, true)
              fallback.decode(m).copy(width = r.getWidth(0), height = r.getHeight(0))
            } finally r.dispose()
          } else fallback.decode(m)
        } catch {
          // JDK readers throw RuntimeExceptions (IAE/IOOBE), not just
          // IOException, on recognized-signature-but-corrupt headers —
          // any decode failure must land on the fallback, never kill
          // the task
          case scala.util.control.NonFatal(_) => fallback.decode(m)
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

  // --------------------------------------------------------- audio decode

  final case class AudioMeta(media_id: Long, sample_rate: Long,
      n_channels: Long, n_samples: Long, duration_ms: Long)

  /** REAL RIFF/WAVE header parser (chunk-scanning, not fixed-offset:
    * handles extra chunks a real encoder might insert before `data`).
    * Throws on non-WAV payloads — m04's input is the wav-format slice of
    * the fixture, so a parse failure there is a bug, not data. */
  final class WavHeaderCodec extends Serializable {
    def decode(m: MediaRecord): AudioMeta = decodeWithDataOffset(m)._1

    /** Parse returning the metadata AND the byte offset of the PCM data
      * section — [[PcmFrameCodec]] must seek there rather than assume
      * the canonical 44-byte layout (a WAV with, say, a LIST chunk
      * before `data` would otherwise be silently misread as samples). */
    private[operators] def decodeWithDataOffset(m: MediaRecord): (AudioMeta, Int) = {
      val buf = java.nio.ByteBuffer.wrap(m.payload)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      def fourcc(): String = {
        val b = new Array[Byte](4); buf.get(b); new String(b, "US-ASCII")
      }
      require(fourcc() == "RIFF", s"media ${m.media_id}: not a RIFF payload")
      buf.getInt // riff size
      require(fourcc() == "WAVE", s"media ${m.media_id}: not a WAVE form")
      var rate = 0L; var channels = 0L; var bits = 0L; var dataLen = -1L
      var dataOffset = -1
      while (dataLen < 0 && buf.remaining() >= 8) {
        val id = fourcc(); val size = buf.getInt
        if (id == "fmt ") {
          val start = buf.position()
          buf.getShort                       // audio format (1 = PCM)
          channels = buf.getShort.toLong
          rate = buf.getInt.toLong
          buf.getInt                         // byte rate
          buf.getShort                       // block align
          bits = buf.getShort.toLong
          buf.position(start + size + (size & 1))
        } else if (id == "data") { dataLen = size.toLong; dataOffset = buf.position() }
        // RIFF pads odd-sized chunks to an even boundary
        else buf.position(buf.position() + size + (size & 1))
      }
      require(dataLen >= 0 && rate > 0 && channels > 0 && bits > 0,
        s"media ${m.media_id}: malformed WAV header")
      val nSamples = dataLen / (channels * bits / 8)
      (AudioMeta(m.media_id, rate, channels, nSamples, nSamples * 1000L / rate), dataOffset)
    }
  }

  /** Audio metadata extraction — REAL WAV header parse of real RIFF
    * bytes through the codec SPI. Every output column is also a
    * SQL-expressible function of the fixture id ([[wavParams]]), so this
    * is the m-family's first HASH-MATCHED oracle query: DuckDB
    * recomputes the expected header fields and the driver compares them
    * against what the parser read out of the actual bytes. */
  def m04AudioMeta(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    mediaTableFiltered(s, dir, Seq("wav")).as[MediaRecord]
      .mapPartitions { it =>
        val codec = new WavHeaderCodec()
        it.map(codec.decode)
      }
      .toDF()
      // NOTE (r16): a pre-sort cache A/B'd a wash here (0.36 vs 0.37 s) —
      // the RIFF header parse is too cheap to pay a cache for.
      .orderBy("media_id")
  }

  // ------------------------------------------------- real perceptual hash

  /** REAL average-hash (aHash — the classic public pHash-family recipe):
    * decode the image, average luminance over an 8×8 grid, one bit per
    * cell (above mean = 1). Small local edits perturb few cells →
    * near-dup images land at low hamming distance; identical payloads
    * hash identically. Decode happens per-partition through the codec
    * SPI like every other real decoder here. */
  final class AHashCodec extends Serializable {
    javax.imageio.ImageIO.setUseCache(false)
    @transient private lazy val decoder = new ImageDecoder()
    def ahash(m: MediaRecord): Long = {
      val img = decoder.read(m)
      require(img != null, s"media ${m.media_id}: undecodable image payload")
      val cell = luminanceGridOf(img)
      val mean = cell.sum / 64.0
      var bits = 0L; var i = 0
      while (i < 64) { if (cell(i) > mean) bits |= (1L << i); i += 1 }
      bits
    }
  }

  /** Decode an image payload to its 8×8 mean-luminance grid (64 values)
    * — the shared content-feature front end of [[AHashCodec]] (which
    * thresholds it to bits) and [[EmbedCodec]] (which projects it to a
    * feature vector). */
  private[graft] def luminanceGrid(m: MediaRecord): Array[Double] = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(m.payload))
    require(img != null, s"media ${m.media_id}: undecodable image payload")
    luminanceGridOf(img)
  }

  /** The grid from an already-decoded frame — pixel access through
    * [[packedRgb]] (identical ints), float accumulation in the exact
    * per-cell (y, x) order of the original loop so the doubles are
    * bit-identical. */
  private[operators] def luminanceGridOf(
      img: java.awt.image.BufferedImage): Array[Double] = {
    val (w, h) = (img.getWidth, img.getHeight)
    val px = packedRgb(img)
    val cell = new Array[Double](64)
    var gy = 0
    while (gy < 8) {
      var gx = 0
      while (gx < 8) {
        val x0 = gx * w / 8; val x1 = math.max((gx + 1) * w / 8, x0 + 1)
        val y0 = gy * h / 8; val y1 = math.max((gy + 1) * h / 8, y0 + 1)
        var sum = 0.0; var n = 0
        var y = y0
        while (y < y1 && y < h) {
          var x = x0
          while (x < x1 && x < w) {
            val rgb = px(y * w + x)
            sum += 0.299 * ((rgb >> 16) & 0xFF) + 0.587 * ((rgb >> 8) & 0xFF) +
              0.114 * (rgb & 0xFF)
            n += 1; x += 1
          }
          y += 1
        }
        cell(gy * 8 + gx) = if (n > 0) sum / n else 0.0
        gx += 1
      }
      gy += 1
    }
    cell
  }

  // ------------------------------------------ content-embedding "model"

  /** Deterministic content-embedding model runtime — the component that
    * retires the m-family's last declared stub. A real pipeline embeds
    * media with a neural model; what the ENGINE owes that pipeline is the
    * integration seam (decode → features → model forward pass → vector,
    * one model instance per partition through the codec SPI) and the
    * downstream banding/verify machinery running on vectors derived from
    * DECODED CONTENT, not fixture formulas. This codec is that seam with
    * a dependency-free model: fixed-seed random-projection weights — as
    * deterministic as a shipped checkpoint — applied to real decoded
    * features. Swapping in ONNX/TorchScript = replacing `weights` and
    * `features`; every Spark-side shape stays.
    *
    *  - images: 8×8 mean-luminance grid from actual pixels
    *    ([[luminanceGrid]] — real decode, JPEG included)
    *  - audio: per-frame (RMS, zero-crossings) from the real PCM stream
    *    ([[PcmFrameCodec]]), first 32 frames interleaved, zero-padded
    *
    * Features are mean-centered (kills the all-positive common component
    * that would push every image pair's cosine toward ~0.75), projected
    * by W ∈ [-1,1]^(64×64) (splitmix64 of a fixed seed), L2-normalized.
    * Identical payloads embed identically; distinct fixture patterns
    * decorrelate (centered cosine ~N(0, 1/√64) — MultimodalSpec bounds
    * it), which is what makes a ≥ 0.9 cosine threshold a near-dup test. */
  final class EmbedCodec extends Serializable {
    javax.imageio.ImageIO.setUseCache(false)
    private val dim = 64
    private val frames = new PcmFrameCodec()
    @transient private lazy val decoder = new ImageDecoder()
    private def mix(z0: Long): Long = {
      var z = z0 + 0x9e3779b97f4a7c15L
      z ^= z >>> 30; z *= 0xbf58476d1ce4e5b9L
      z ^= z >>> 27; z *= 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    private def w(seed: Long, i: Int, j: Int): Double =
      mix(seed * 1000003L + i * 64L + j).toDouble / Long.MaxValue
    // the weight matrices are CONSTANT — materialize them once per codec
    // instance instead of re-deriving 2×4096 splitmix values per record
    // (r16 §1.2 per-task work); same w(seed, i, j) values, same order
    @transient private lazy val wModel =
      Array.tabulate(dim * dim)(k => w(0xC0FFEEL, k / dim, k % dim))
    @transient private lazy val wSrp =
      Array.tabulate(dim * dim)(k => w(0x5EED5EEDL, k / dim, k % dim))
    private def features(m: MediaRecord): Array[Double] = m.format match {
      case "png" | "jpeg" =>
        val img = decoder.read(m)
        require(img != null, s"media ${m.media_id}: undecodable image payload")
        luminanceGridOf(img)
      case _ =>
        val ff = frames.features(m).toArray
        val out = new Array[Double](dim)
        var i = 0
        while (i < 32 && i < ff.length) {
          out(2 * i) = ff(i).rms_e2.toDouble / 100.0
          out(2 * i + 1) = ff(i).zcr.toDouble
          i += 1
        }
        out
    }
    def embed(m: MediaRecord): Array[Double] = {
      val f = features(m)
      val mean = f.sum / f.length
      val v = new Array[Double](dim)
      val wm = wModel
      var i = 0
      while (i < dim) {
        var s = 0.0; var j = 0
        while (j < f.length) { s += wm(i * dim + j) * (f(j) - mean); j += 1 }
        v(i) = s; i += 1
      }
      val nrm = math.sqrt(v.map(x => x * x).sum)
      if (nrm > 0) { var i2 = 0; while (i2 < dim) { v(i2) /= nrm; i2 += 1 }; v }
      else { val e = new Array[Double](dim); e(0) = 1.0; e }
    }
    /** 64-bit sign-random-projection signature of an embedding (distinct
      * seed from the model weights): P[bit differs] = angle/π, so
      * near-identical vectors land at hamming ≈ 0 and the 16-bit band
      * blocking from the SimHash family applies unchanged. */
    def srpBits(v: Array[Double]): Long = {
      val ws = wSrp
      var bits = 0L; var i = 0
      while (i < 64) {
        var s = 0.0; var j = 0
        while (j < v.length) { s += ws(i * dim + j) * v(j); j += 1 }
        if (s > 0) bits |= (1L << i)
        i += 1
      }
      bits
    }
  }
}
