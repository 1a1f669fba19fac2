package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.streaming.StreamingOps

/** 100 TB streaming-state discipline: RocksDB-backed state store (state
  * spills off-heap/on-disk instead of executor heap) and checkpointed
  * exactly-once recovery across query restarts (the durable analogue of
  * the reference's drain-on-stop).
  */
class StateStoreSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Int) = new Timestamp(3600_000L + min * 60_000L)

  test("windowed agg runs on the RocksDB state store provider") {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val in = MemoryStream[(Timestamp, String, Double)](spark)
      val agg = StreamingOps.tumblingAgg(in.toDF().toDF("ts", "event_type", "value"),
        "ts", "event_type", "5 minutes", "10 minutes")
      val q = agg.writeStream.outputMode(OutputMode.Append).format("memory")
        .queryName("rocksdb_agg").start()
      in.addData((ts(0), "a", 1.0), (ts(1), "a", 2.0))
      q.processAllAvailable()
      in.addData((ts(40), "b", 1.0)) // close the first window
      q.processAllAvailable()
      q.stop()
      val rows = spark.table("rocksdb_agg").selectExpr("event_type", "n").collect()
        .map(r => (r.getString(0), r.getLong(1))).toSet
      assert(rows.contains(("a", 2L)))
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("transformWithState running totals accumulate across batches (RocksDB)") {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val in = MemoryStream[(Long, Double)](spark)
      val q = StreamingOps.runningTotals(in.toDS())
        .toDF("key", "n", "total")
        .writeStream.outputMode(OutputMode.Update).format("memory")
        .queryName("tws_totals").start()
      in.addData((1L, 2.0), (1L, 3.0), (2L, 10.0))
      q.processAllAvailable()
      in.addData((1L, 5.0))
      q.processAllAvailable()
      q.stop()
      val last = spark.table("tws_totals").collect()
        .map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2))))
        .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).maxBy(_._1) }
      // state persisted across micro-batches: key 1 saw 3 rows totalling 10
      assert(last(1L) == ((3L, 10.0)))
      assert(last(2L) == ((1L, 10.0)))
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("streaming vector dedup: near-dups flagged across batches via SRP bands + exact cosine") {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      import org.apache.spark.sql.functions.{col, lit, pmod, sequence, transform, xxhash64}
      val in = MemoryStream[(Long, Int)](spark)
      // deterministic 64-d vectors per (seed); a near-dup shares its
      // base's seed stream with a +0.001 perturbation flagged via group
      val vecs = in.toDF().toDF("vec_id", "grp")
        .select(col("vec_id"),
          transform(sequence(lit(0), lit(63)), i =>
            pmod(xxhash64(col("grp"), i), lit(2000001L)).cast("double") / 1000000.0 - 1.0 +
              org.apache.spark.sql.functions.when(col("vec_id") >= 100, 0.001).otherwise(0.0))
            .as("emb"))
      val q = StreamingOps.dedupStreamVectors(vecs, threshold = 0.99)
        .toDF("vec_id", "dup_of", "cos_e6")
        .writeStream.outputMode(OutputMode.Append).format("memory")
        .queryName("vdedup").start()
      // batch 1: three mutually-far vectors (distinct seed groups)
      in.addData((1L, 10), (2L, 20), (3L, 30))
      q.processAllAvailable()
      // batch 2: perturbed re-uploads of groups 10 and 30 + a novel one
      in.addData((101L, 10), (103L, 30), (5L, 40))
      q.processAllAvailable()
      q.stop()
      val flagged = spark.table("vdedup").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).distinct
      spark.catalog.dropTempView("vdedup")
      val byId = flagged.groupBy(_._1)
      // exactly the two cross-batch near-dups flag, each against its base
      assert(byId.keySet == Set(101L, 103L), s"flagged: ${flagged.mkString(",")}")
      assert(byId(101L).forall(f => f._2 == 1L && f._3 > 999000L), s"$flagged")
      assert(byId(103L).forall(f => f._2 == 3L && f._3 > 999000L), s"$flagged")
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("streaming vector dedup TTL: in-window dup flags, expired rep re-enters, depth stays bounded") {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val ckpt = Files.createTempDirectory("graft-vttl-ckpt").toString
    val out = Files.createTempDirectory("graft-vttl-out").toString
    try {
      import org.apache.spark.sql.functions.{col, lit, pmod, sequence, transform, when, xxhash64}
      val hour = 3600_000L
      val in = MemoryStream[(Long, Int, Long)](spark)
      // deterministic 64-d vector per group; re-uploads (vec_id >= 100)
      // perturb by +0.001 — cos ≈ 1 vs their base, far from other groups
      val vecs = in.toDF().toDF("vec_id", "grp", "ts_ms")
        .select(col("vec_id"), col("ts_ms"),
          transform(sequence(lit(0), lit(63)), i =>
            pmod(xxhash64(col("grp"), i), lit(2000001L)).cast("double") / 1000000.0 - 1.0 +
              when(col("vec_id") >= 100, 0.001).otherwise(0.0)).as("emb"))
      val q = StreamingOps.dedupStreamVectorsTtl(vecs, retentionMs = hour,
          threshold = 0.99)
        .toDF("vec_id", "dup_of", "cos_e6")
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .start()
      // t=0: vector 1 (group 10) becomes the representative
      in.addData((1L, 10, 0L)); q.processAllAvailable()
      // t=30min (inside retention): near-dup re-upload flags against 1
      in.addData((101L, 10, hour / 2)); q.processAllAvailable()
      // t=2h: rep 1 is > 1h old at visit → expired; vector 3 re-enters
      // as the NEW representative, unflagged (the retention contract)
      in.addData((3L, 10, 2 * hour)); q.processAllAvailable()
      // t=2.5h (inside retention of rep 3): flags against rep 3
      in.addData((103L, 10, 2 * hour + hour / 2)); q.processAllAvailable()
      q.stop()
      val flagged = spark.read.parquet(out)
        .select("vec_id", "dup_of").distinct().collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(flagged == Set((101L, 1L), (103L, 3L)), s"flagged=$flagged")
      // same-group vectors share band keys (identical base + tiny
      // perturbation): vector 3 visited every bucket rep 1 lived in, so
      // the expired generation is fully expunged — per-bucket depth
      // stays at one generation, the bound that grows forever without
      // retention
      val state = spark.read.format("statestore")
        .option("path", ckpt).option("stateVarName", "vreps").load()
        .selectExpr("partition_id", "key", "list_element._1 AS rep")
      val repIds = state.select("rep").distinct().collect().map(_.getLong(0)).toSet
      assert(repIds == Set(3L), s"state holds $repIds")
      val maxDepth = state.groupBy("partition_id", "key").count()
        .agg(org.apache.spark.sql.functions.max("count")).collect().head.getLong(0)
      assert(maxDepth <= 1, s"TTL bucket depth $maxDepth")
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  // ------------------------------------------------- streaming MinHash dedup

  // pairwise-distinct 12-token texts (J ≈ 0 between any two)
  private val textA = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
  private val textB = "red orange yellow green blue indigo violet cyan magenta white black gray"
  private val textC = "one two three four five six seven eight nine ten eleven twelve"

  test("streaming minhash dedup: dups flagged across batches, state survives checkpoint restart") {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val ckpt = Files.createTempDirectory("graft-dedup-ckpt").toString
    val out = Files.createTempDirectory("graft-dedup-out").toString
    try {
      val in = MemoryStream[(Long, String)](spark)
      def start() = StreamingOps.dedupStreamMinHash(in.toDF().toDF("doc_id", "text"))
        .toDF("doc_id", "dup_of", "jaccard")
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      // batch 1: two distinct docs + one exact re-upload of doc 1
      in.addData((1L, textA), (2L, textB), (3L, textA))
      val q1 = start(); q1.awaitTermination(120000)
      // restart from the checkpoint: the representative set (docs 1, 2)
      // must come back from RocksDB state, not from reprocessing
      in.addData((4L, textA), (5L, textC))
      val q2 = start(); q2.awaitTermination(120000)
      val flagged = spark.read.parquet(out)
        .select("doc_id", "dup_of", "jaccard").distinct().collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      // doc 3 (same batch as its original) and doc 4 (after the restart)
      // both resolve to representative 1 at exact jaccard 1.0; the
      // distinct docs 2 and 5 are never flagged
      assert(flagged == Set((3L, 1L, 1.0), (4L, 1L, 1.0)))
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("streaming minhash dedup: rep cap degrades to pass-through, never wrong output") {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val in = MemoryStream[(Long, String)](spark)
      // cap 0: nothing can be stored, so even an exact dup passes through
      // unflagged — the documented budget-degradation contract (flagging
      // is best-effort under the cap; it must never invent a false pair)
      val q = StreamingOps.dedupStreamMinHash(in.toDF().toDF("doc_id", "text"),
          maxRepsPerBucket = 0)
        .toDF("doc_id", "dup_of", "jaccard")
        .writeStream.outputMode(OutputMode.Append)
        .format("memory").queryName("dedup_cap0").start()
      in.addData((1L, textA), (2L, textA))
      q.processAllAvailable()
      q.stop()
      assert(spark.table("dedup_cap0").isEmpty)
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("streaming minhash dedup: near-dup (not just exact) verifies at its true jaccard") {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val in = MemoryStream[(Long, String)](spark)
      // textA with its last token changed: 12 tokens → 10 3-gram shingles;
      // token 12 sits only in the shingle starting at position 10, so one
      // shingle differs per side → inter 9, union 11, exact J = 9/11
      // (≈0.818 ⇒ per-band collision p = (9/11)^4 ≈ 0.45, P[no band of 32
      // collides] ≈ 5e-9 — and the hash family is fixed, so the outcome
      // is deterministic for these texts, not flaky)
      val textA2 = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda nu"
      val q = StreamingOps.dedupStreamMinHash(in.toDF().toDF("doc_id", "text"))
        .toDF("doc_id", "dup_of", "jaccard")
        .writeStream.outputMode(OutputMode.Append)
        .format("memory").queryName("dedup_neardup").start()
      in.addData((1L, textA), (2L, textA2))
      q.processAllAvailable()
      q.stop()
      val rows = spark.table("dedup_neardup")
        .select("doc_id", "dup_of", "jaccard").distinct().collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(rows == Set((2L, 1L, 9.0 / 11.0)))
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("state data source reads the dedup representatives back from the checkpoint (batch introspection)") {
    // Operational surface: the statestore batch source reads streaming
    // state WITHOUT a streaming query — audit which representatives the
    // dedup stream is currently holding, from the checkpoint alone.
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val ckpt = Files.createTempDirectory("graft-reader-ckpt").toString
    val out = Files.createTempDirectory("graft-reader-out").toString
    try {
      val in = MemoryStream[(Long, String)](spark)
      in.addData((1L, textA), (2L, textB), (3L, textA))
      val q = StreamingOps.dedupStreamMinHash(in.toDF().toDF("doc_id", "text"))
        .toDF("doc_id", "dup_of", "jaccard")
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
      val state = spark.read.format("statestore")
        .option("path", ckpt)
        .option("stateVarName", "reps")
        .load()
      // stored representative doc ids: docs 1 and 2 (the dup, doc 3, was
      // collapsed — never stored); each appears once per band bucket
      val repIds = state.selectExpr("list_element._1 AS rep").distinct()
        .collect().map(_.getLong(0)).toSet
      assert(repIds == Set(1L, 2L), s"state holds $repIds")
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("streaming dedup TTL: expired representative re-enters; in-window dup still flags") {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val ckpt = Files.createTempDirectory("graft-ttl-ckpt").toString
    val out = Files.createTempDirectory("graft-ttl-out").toString
    try {
      val hour = 3600_000L
      val in = MemoryStream[(Long, String, Long)](spark)
      val q = StreamingOps.dedupStreamMinHashTtl(
          in.toDF().toDF("doc_id", "text", "ts_ms"), retentionMs = hour)
        .toDF("doc_id", "dup_of", "jaccard")
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .start()
      // t=0: doc 1 becomes the representative
      in.addData((1L, textA, 0L)); q.processAllAvailable()
      // t=30min (inside retention): exact copy flags against rep 1
      in.addData((2L, textA, hour / 2)); q.processAllAvailable()
      // t=2h: rep 1 is > 1h old at visit → expired; doc 3 re-enters
      // as the NEW representative, unflagged (forgotten content may
      // legitimately recur — the documented retention contract)
      in.addData((3L, textA, 2 * hour)); q.processAllAvailable()
      // t=2.5h (inside retention of rep 3): flags against rep 3
      in.addData((4L, textA, 2 * hour + hour / 2)); q.processAllAvailable()
      q.stop()
      val flagged = spark.read.parquet(out)
        .select("doc_id", "dup_of", "jaccard").distinct().collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(flagged == Set((2L, 1L, 1.0), (4L, 3L, 1.0)), s"flagged=$flagged")
      // identical text ⇒ identical band keys, so doc 3 visited EVERY
      // bucket rep 1 lived in: the expired rep is fully expunged —
      // state holds exactly one generation, the plateau in its
      // sharpest form
      val repIds = spark.read.format("statestore")
        .option("path", ckpt).option("stateVarName", "reps").load()
        .selectExpr("list_element._1 AS rep").distinct()
        .collect().map(_.getLong(0)).toSet
      assert(repIds == Set(3L), s"state holds $repIds")
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("streaming dedup TTL: rolling near-dup corpus plateaus state where no-TTL accumulates") {
    // Five one-token-apart variants (pairwise J = 9/11 ≈ 0.818) at
    // threshold 0.95: every arrival shares band buckets with its
    // predecessors but FAILS verify, so each is stored — the shape that
    // grows per-bucket state forever without retention. Batches arrive
    // 2 h apart with a 1 h retention: on every revisit the previous
    // generation expires, so TTL state stays one rep deep in the shared
    // buckets while the no-TTL run stacks all five.
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val variants = Seq("mu", "nu", "xi", "omicron", "pi").map(last =>
      s"alpha beta gamma delta epsilon zeta eta theta iota kappa lambda $last")
    val hour = 3600_000L
    def run(retention: Long): (Long, Long) = {
      val ckpt = Files.createTempDirectory("graft-ttl-roll-ckpt").toString
      val out = Files.createTempDirectory("graft-ttl-roll-out").toString
      val in = MemoryStream[(Long, String, Long)](spark)
      val q = StreamingOps.dedupStreamMinHashTtl(
          in.toDF().toDF("doc_id", "text", "ts_ms"),
          retentionMs = retention, threshold = 0.95)
        .toDF("doc_id", "dup_of", "jaccard")
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .start()
      variants.zipWithIndex.foreach { case (text, i) =>
        in.addData((i.toLong, text, i * 2 * hour)); q.processAllAvailable()
      }
      q.stop()
      val state = spark.read.format("statestore")
        .option("path", ckpt).option("stateVarName", "reps").load()
        .selectExpr("partition_id", "key", "list_element._1 AS rep")
      val total = state.count()
      val maxPerBucket = state.groupBy("partition_id", "key").count()
        .agg(max("count")).collect().head.getLong(0)
      (total, maxPerBucket)
    }
    try {
      val (nottlTotal, nottlMax) = run(Long.MaxValue / 4)
      val (ttlTotal, ttlMax) = run(hour)
      // no-TTL: shared buckets stack every generation (5 variants at
      // ~45% per-band collision ⇒ buckets several deep)
      assert(nottlMax >= 3, s"fixture too weak: no-TTL max bucket $nottlMax")
      // TTL: each revisit expires the previous generation — never-
      // revisited buckets keep their single rep (lazy expiry), so the
      // bound is per-bucket depth, the quantity that grows unbounded
      // without retention
      assert(ttlMax <= 2, s"TTL bucket depth $ttlMax")
      assert(ttlTotal < nottlTotal,
        s"TTL state $ttlTotal !< no-TTL state $nottlTotal")
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("ingestion pipeline composed with streaming dedup: landed batches get re-uploads flagged end to end") {
    import graft.core.{BatchPipeline, Flusher, FlusherFactory, FlushContext, PipelineConfig}
    // The north-star composition: the reference-shaped ingest path
    // (put → worker shard → batch cut → sink flush) LANDS documents, and
    // the engine's streaming dedup runs over the landing zone as a file
    // stream — near-dup detection on the ingest path, no batch pass.
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val landing = Files.createTempDirectory("graft-landing").toString
    try {
      val factory = FlusherFactory[(Long, String)](() => new Flusher[(Long, String)] {
        def flush(batch: Seq[(Long, String)], ctx: FlushContext): Unit = {
          val lines = batch.map { case (id, t) => s"""{"doc_id":$id,"text":"$t"}""" }
            .mkString("", "\n", "\n")
          java.nio.file.Files.write(
            java.nio.file.Paths.get(landing,
              java.util.UUID.randomUUID().toString + ".json"),
            lines.getBytes("UTF-8"))
        }
      })
      val pipe = new BatchPipeline[(Long, String)](spark,
        PipelineConfig(name = "ingest-dedup-compose", numWorkers = 2, maxBatchSize = 2),
        factory)
      pipe.start()
      pipe.putAll(Seq((1L, textA), (2L, textB), (3L, textA), (4L, textC), (5L, textB)))
      pipe.flush()
      pipe.stop()
      val stream = spark.readStream.schema("doc_id LONG, text STRING").json(landing)
      val q = StreamingOps.dedupStreamMinHash(stream)
        .toDF("doc_id", "dup_of", "jaccard")
        .writeStream.outputMode(OutputMode.Append)
        .format("memory").queryName("ingest_dedup").start()
      q.processAllAvailable()
      q.stop()
      val flagged = spark.table("ingest_dedup")
        .select("doc_id", "dup_of").distinct().collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      // exact re-uploads resolve to the min-id representative of their
      // text; the three distinct texts are never flagged
      assert(flagged == Set((3L, 1L), (5L, 2L)))
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("checkpointed query resumes from offset after stop (no reprocessing)") {
    val ckpt = Files.createTempDirectory("graft-ckpt").toString
    val out = Files.createTempDirectory("graft-ckpt-out").toString
    val in = MemoryStream[Long](spark)
    def start() = in.toDF().toDF("v")
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    in.addData(1L to 100L: _*)
    val q1 = start(); q1.awaitTermination(60000)
    in.addData(101L to 150L: _*)
    val q2 = start(); q2.awaitTermination(60000)
    val vs = spark.read.parquet(out).select(col("v")).collect().map(_.getLong(0)).sorted
    // exactly once: the first 100 are NOT re-emitted by the second run
    assert(vs.toSeq == (1L to 150L))
  }
}
