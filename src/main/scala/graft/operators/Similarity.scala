package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.ExactRound._
import graft.functions.VectorFunctions._

/** Approximate-nearest-neighbor search over the embeddings table.
  *
  * s01 is the exact brute-force baseline: queries are broadcast, the
  * corpus streams through a map-side cross join — no corpus shuffle, so
  * wall-clock scales linearly with corpus size and executor count. The
  * per-query top-k is a row_number window over (query_id), which shuffles
  * only |queries| × |corpus| similarity rows; at large scale swap the
  * window for a per-partition heap (TakeOrdered) — plan shape noted in
  * the bench docs.
  *
  * s02 is the scale path: IVF (inverted-file) routing — Jégou et al.,
  * "Product Quantization for Nearest Neighbor Search" (public paper) —
  * with deterministic centroid seeds tightened by one Lloyd pass. The
  * centroid table is materialized ONCE on the driver (O(k·d) bytes,
  * independent of corpus size — the same driver-side footprint MLlib
  * KMeans accepts), so every downstream use sees bit-identical centroid
  * values: recomputing the avg() plan per consumer risked float
  * summation-order drift flipping near-equidistant cell assignments.
  * With centroids as literals, cell assignment is a per-row argmin that
  * stays inside whole-stage codegen — zero joins, zero shuffles for the
  * corpus; each query then scans only ~nprobe/ncentroids of the corpus.
  */
object Similarity {

  private val TopK = 5
  private val NCentroids = 16
  private val NProbe = 8

  private def withNorm(df: DataFrame): DataFrame =
    df.select(col("vec_id"), toDouble(col("embedding")).as("emb"))
      .withColumn("nrm", l2Norm(col("emb")))

  /** Exact cosine top-5 for queries (vec_id < 10) over the rest. */
  def s01CosineTopK(s: SparkSession, dir: String): DataFrame = {
    val e = withNorm(Tables.embeddings(s, dir))
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("emb").as("qe"), col("nrm").as("qn"))
    val c = e.filter(col("vec_id") >= 10)
    val sims = c.join(broadcast(q))
      .select(col("query_id"), col("vec_id"),
        round6(cosineWithNorms(col("qe"), col("emb"), col("qn"), col("nrm"))).as("sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("vec_id"))
    sims.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= TopK)
      .orderBy("query_id", "rank")
  }

  /** Per-row nearest-cell assignment: staged d² array (one native
    * [[graft.plans.CentroidDistances]] node — the literal-array
    * composition it replaced dominated wall-clock with driver planning
    * time) + array_position(array_min). The staged column is referenced
    * twice, so CollapseProject cannot inline (and so re-evaluate) it.
    * Purely map-side — the route a 100 TB corpus must take, since any
    * join/window formulation shuffles ncentroids × corpus rows. */
  private def withCell(df: DataFrame, cents: Seq[Array[Double]]): DataFrame =
    df.withColumn("d2s", centroidDists(col("emb"), cents))
      .withColumn("cell", (array_position(col("d2s"), array_min(col("d2s"))) - 1).cast("int"))
      .drop("d2s")

  /** One deterministic Lloyd (k-means) refinement pass: assign every
    * corpus vector to its nearest seed, recompute each centroid as the
    * elementwise mean of its cell — computed distributively (posexplode
    * → groupBy(cell, position) → avg → re-assembled in position order),
    * so only the k×d mean table ever reaches the driver. Empty cells
    * keep their seed. Tighter centroids → tighter cells → higher recall
    * at the same nprobe. */
  private[operators] def refine(corpus: DataFrame, seeds: Seq[Array[Double]]): Seq[Array[Double]] = {
    val means = withCell(corpus, seeds)
      .select(col("cell"), posexplode(col("emb")))
      .toDF("cell", "pos", "v")
      .groupBy(col("cell"), col("pos"))
      .agg(avg(col("v")).as("m"))
      .groupBy(col("cell"))
      .agg(sort_array(collect_list(struct(col("pos"), col("m")))).as("pm"))
      .select(col("cell"), expr("transform(pm, x -> x.m)").as("ce"))
    val got: Map[Int, Array[Double]] = means.collect()
      .map(r => r.getInt(0) -> r.getSeq[Double](1).toArray).toMap
    seeds.indices.map(i => got.getOrElse(i, seeds(i)))
  }

  /** The `n` nearest cell ids for a vector, nearest first: sort
    * (d², cell) structs (struct order = d² asc, cell asc — argmin ties
    * resolve to the lowest cell id), take the first `n` cells. Shared by
    * s02's query probing and Dedup's IVF near-dup indexing so the two
    * IVF paths cannot diverge on tie-break or probe order. */
  private[operators] def nearestCells(
      v: Column, cents: Seq[Array[Double]], n: Int): Column = {
    val d2c = transform(centroidDists(v, cents),
      (x, i) => struct(x.as("d2"), i.as("cell")))
    slice(transform(array_sort(d2c), x => x("cell")), 1, n)
  }

  /** IVF-routed approximate top-5: same queries/corpus split as s01 so
    * SimilaritySpec can measure recall against the exact baseline.
    * Cell ids are seed ranks (seeds = the NCentroids lowest corpus ids),
    * and argmin ties resolve to the lowest cell id — the same tie-break
    * the previous join+window formulation used. */
  def s02AnnIvf(s: SparkSession, dir: String): DataFrame = {
    val e = withNorm(Tables.embeddings(s, dir))
    val corpus = e.filter(col("vec_id") >= 10)
    val seeds: Seq[Array[Double]] = corpus.orderBy("vec_id").limit(NCentroids)
      .select(col("emb")).collect().map(_.getSeq[Double](0).toArray).toSeq
    // two Lloyd passes: the deterministic lowest-id seeds are arbitrary
    // points, and one pass left recall@5 at 0.54 on the sf0.01 corpus;
    // the second pass + probing 8/16 cells lifts it past the 0.6 gate
    // (s04) at every test SF while still scanning half the cells
    val cents = refine(corpus, refine(corpus, seeds))
    val assigned = withCell(corpus, cents)
    // Queries probe their NProbe nearest cells.
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("emb").as("qe"), col("nrm").as("qn"))
    val probes = q
      .withColumn("cell", explode(nearestCells(col("qe"), cents, NProbe)))
      .select(col("query_id"), col("qe"), col("qn"), col("cell"))
    // Candidate set = corpus vectors in probed cells only; probes are
    // |queries| × nprobe rows — always broadcastable.
    val sims = assigned.join(broadcast(probes), Seq("cell"))
      .select(col("query_id"), col("vec_id"),
        round6(cosineWithNorms(col("qe"), col("emb"), col("qn"), col("nrm"))).as("sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("vec_id"))
    sims.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= TopK)
      .orderBy("query_id", "rank")
  }

  // ------------------------------------------------------------ SRP-LSH ANN

  private val SrpBits = 128 // two 64-bit words: estimate noise ∝ 1/√bits
  private val SrpCandidates = 96

  /** SRP-LSH approximate top-5 — the hamming-space scale path
    * complementing s02's IVF: rank the corpus per query by signature
    * hamming distance (narrow (vec_id, sig) rows only — at 100 TB the
    * signature table is the only thing scanned per query), take the
    * closest SrpCandidates, then exact-rerank just those. Both the
    * candidate table and the query table stay broadcastable, so the
    * full-width corpus never shuffles. Signatures come from ONE native
    * [[graft.plans.SrpSignature]] node (deterministic xxhash64
    * Rademacher hyperplanes built inside the expression — no driver
    * dimension probe, no 128-literal plan tree). Rows-only check;
    * SimilaritySpec measures recall@5 against the exact s01 baseline. */
  def s03AnnSrp(s: SparkSession, dir: String): DataFrame = {
    val e = withNorm(Tables.embeddings(s, dir))
    val sigged = e
      .withColumn("sig", srpSig(col("emb"), SrpBits))
      .withColumn("sig0", col("sig").getItem(0))
      .withColumn("sig1", col("sig").getItem(1))
      .drop("sig")
    val corpus = sigged.filter(col("vec_id") >= 10)
    val q = sigged.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("emb").as("qe"), col("nrm").as("qn"),
        col("sig0").as("qsig0"), col("sig1").as("qsig1"))
    val cand = corpus.select(col("vec_id"), col("sig0"), col("sig1"))
      .join(broadcast(q.select(col("query_id"), col("qsig0"), col("qsig1"))))
      .select(col("query_id"), col("vec_id"),
        (graft.functions.TextFunctions.hamming64(col("sig0"), col("qsig0")) +
          graft.functions.TextFunctions.hamming64(col("sig1"), col("qsig1"))).as("ham"))
      .withColumn("hrank", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("ham"), col("vec_id"))))
      .filter(col("hrank") <= SrpCandidates)
      .select(col("query_id"), col("vec_id"))
    val sims = corpus.select(col("vec_id"), col("emb"), col("nrm"))
      .join(broadcast(cand), Seq("vec_id"))
      .join(broadcast(q.select(col("query_id"), col("qe"), col("qn"))), Seq("query_id"))
      .select(col("query_id"), col("vec_id"),
        round6(cosineWithNorms(col("qe"), col("emb"), col("qn"), col("nrm"))).as("sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("vec_id"))
    sims.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= TopK)
      .orderBy("query_id", "rank")
  }

  // ----------------------------------------------- PQ (product quantization)

  private val PqM = 8    // subspaces (64-d → 8 × 8-d)
  private val PqSub = 8  // dims per subspace
  private val PqK = 16   // codes per subspace (4 bits)
  private val PqCandidates = 96

  /** Per-subspace codebooks: slice the corpus to each 8-dim sub-vector,
    * seed with the PqK lowest-id sub-vectors, one Lloyd pass each
    * ([[refine]] is dimension-agnostic). Driver state = M × K × (d/M)
    * doubles — the PQ codebook, same bounded-collect pattern as s02's
    * centroid table. */
  private def pqCodebooks(corpus: DataFrame): Seq[Seq[Array[Double]]] =
    (0 until PqM).map { m =>
      val sub = corpus.select(col("vec_id"),
        slice(col("emb"), m * PqSub + 1, PqSub).as("emb"))
      val seeds = sub.orderBy("vec_id").limit(PqK)
        .select(col("emb")).collect().map(_.getSeq[Double](0).toArray).toSeq
      if (seeds.isEmpty) Seq.empty else refine(sub, seeds)
    }

  /** PQ-ADC approximate top-5 — the MEMORY-bounded ANN scale path
    * beside s02's IVF (scan reduction) and s03's SRP (hamming ranking):
    * Jégou et al.'s product quantization (public paper). Each corpus
    * vector compresses to M=8 4-bit codes (nearest per-subspace
    * centroid, map-side staged argmins — at 100 TB the scanned index is
    * 4 bytes/vector instead of 256), plus its reconstruction norm.
    * Queries precompute an M×K lookup table of sub-vector · centroid
    * dots (driver-side over the bounded query set, the same O(k·d)
    * footprint as the codebook), and the asymmetric distance is a pure
    * array-aggregate over codes — the full-width corpus is scanned once
    * at ENCODE time and never again; ranking touches only (vec_id,
    * codes, recon_n). Top PqCandidates per query are exact-reranked.
    * Rows-only check; SimilaritySpec measures recall@5 vs exact s01 and
    * s04 lifts it into the driver gate. */
  def s05AnnPq(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = withNorm(Tables.embeddings(s, dir))
    val corpus = e.filter(col("vec_id") >= 10)
    val books = pqCodebooks(corpus)
    val qRows = e.filter(col("vec_id") < 10)
      .select(col("vec_id"), col("emb"), col("nrm")).collect()
    if (qRows.isEmpty) return s01CosineTopK(s, dir).filter(lit(false))
    // flattened codebook/LUT indexing (m·PqK + code) assumes every book
    // holds exactly PqK centroids; a corpus with < PqK vectors seeds
    // shorter books and the offsets would misalign — fall back to the
    // exact path rather than score against a skewed table
    if (books.exists(_.size != PqK)) return s01CosineTopK(s, dir)
    // encode: per-subspace staged d² + argmin code, then the
    // reconstruction norm from the codebook's centroid norms
    val coded0 = (0 until PqM).foldLeft(corpus) { (acc, m) =>
      acc.withColumn(s"_d$m",
          centroidDists(slice(col("emb"), m * PqSub + 1, PqSub), books(m)))
        .withColumn(s"_c$m",
          (array_position(col(s"_d$m"), array_min(col(s"_d$m"))) - 1).cast("int"))
        .drop(s"_d$m")
    }
    val centNorm2 = typedlit(books.flatMap(b => b.map(c => c.map(x => x * x).sum)))
    val coded = coded0
      .withColumn("codes", array((0 until PqM).map(m => col(s"_c$m")): _*))
      .withColumn("recon_n", sqrt(aggregate(sequence(lit(0), lit(PqM - 1)), lit(0.0),
        (acc, m) => acc + element_at(centNorm2, m * PqK + element_at(col("codes"), m + lit(1)) + lit(1)))))
      .select(col("vec_id"), col("codes"), col("recon_n"))
    // queries: driver-computed ADC lookup tables (M×K dots per query)
    val q = qRows.toSeq.map { r =>
      val qe = r.getSeq[Double](1).toArray
      val lut = Array.tabulate(PqM * PqK) { i =>
        val m = i / PqK; val j = i % PqK
        var acc = 0.0; var t = 0
        while (t < PqSub) { acc += qe(m * PqSub + t) * books(m)(j)(t); t += 1 }
        acc
      }
      (r.getLong(0), lut.toSeq, r.getDouble(2))
    }.toDF("query_id", "lut", "qn")
    val approx = coded.join(broadcast(q))
      .withColumn("adot", aggregate(sequence(lit(0), lit(PqM - 1)), lit(0.0),
        (acc, m) => acc + element_at(col("lut"), m * PqK + element_at(col("codes"), m + lit(1)) + lit(1))))
      .withColumn("approx",
        when(col("recon_n") > 0.0 && col("qn") > 0.0,
          col("adot") / (col("qn") * col("recon_n"))).otherwise(lit(-2.0)))
      .withColumn("arank", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("approx").desc, col("vec_id"))))
      .filter(col("arank") <= PqCandidates)
      .select(col("query_id"), col("vec_id"))
    // exact rerank on candidates only (s03's tail, verbatim shape)
    val qe2 = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("emb").as("qe"), col("nrm").as("qn"))
    val sims = corpus.select(col("vec_id"), col("emb"), col("nrm"))
      .join(broadcast(approx), Seq("vec_id"))
      .join(broadcast(qe2), Seq("query_id"))
      .select(col("query_id"), col("vec_id"),
        round6(cosineWithNorms(col("qe"), col("emb"), col("qn"), col("nrm"))).as("sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("vec_id"))
    sims.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= TopK)
      .orderBy("query_id", "rank")
  }

  /** Oracle companion for rows-only s02/s03 (round-4 pattern): one row of
    * driver-checkable invariants. `n_queries` anchors the probe count
    * (DuckDB recomputes it); the flags lift SimilaritySpec's measured
    * recall@5 ≥ 0.6 bounds (vs the hash-matched exact s01 baseline) into
    * the driver gate. Recall compares semi-join hit counts in integer
    * arithmetic — no floats anywhere. */
  def s04AnnRecallGate(s: SparkSession, dir: String): DataFrame = {
    val exact = s01CosineTopK(s, dir).select(col("query_id"), col("vec_id"))
    val ivf = s02AnnIvf(s, dir).select(col("query_id"), col("vec_id"))
    val srp = s03AnnSrp(s, dir).select(col("query_id"), col("vec_id"))
    val pq = s05AnnPq(s, dir).select(col("query_id"), col("vec_id"))
    val base = exact.agg(
      countDistinct(col("query_id")).cast("long").as("n_queries"),
      count(lit(1)).as("n_exact"))
    val hitIvf = ivf.join(exact, Seq("query_id", "vec_id"), "left_semi")
      .agg(count(lit(1)).as("hit_ivf"))
    val hitSrp = srp.join(exact, Seq("query_id", "vec_id"), "left_semi")
      .agg(count(lit(1)).as("hit_srp"))
    val hitPq = pq.join(exact, Seq("query_id", "vec_id"), "left_semi")
      .agg(count(lit(1)).as("hit_pq"))
    base.crossJoin(hitIvf).crossJoin(hitSrp).crossJoin(hitPq)
      .select(col("n_queries"),
        (col("hit_ivf") * 10 >= col("n_exact") * 6).as("ivf_recall_ge_60"),
        (col("hit_srp") * 10 >= col("n_exact") * 6).as("srp_recall_ge_60"),
        (col("hit_pq") * 10 >= col("n_exact") * 6).as("pq_recall_ge_60"))
  }

  /** FILTERED vector search — the metadata-predicate top-k every real
    * vector store serves (tenancy, category, language filters): top-5
    * cosine per query among corpus vectors sharing the query's `label`.
    * The predicate sits BELOW the similarity computation as the
    * broadcast-join condition, so non-matching vectors are never scored
    * (scoring-then-filtering would both waste the dot products and
    * return < k rows when matches are scarce — the classic post-filter
    * ANN bug). At 100 TB the same shape composes with IVF routing: the
    * label condition rides the cell equi-join, and highly selective
    * labels shrink candidates before any distance math.
    *
    * Top-k here is the repo's own bounded-heap operator
    * ([[graft.plans.TopKPerKeyPlan]] via `relations.topKPerKey`), not a
    * row_number window: with few queries over a huge corpus each query's
    * matches land in ONE window partition, and even Spark 4's
    * WindowGroupLimit still sorts the per-partition survivors — the heap
    * operator moves at most `maps × queries × k` rows instead. The rank
    * column the contract output carries is recomputed by a window over
    * the ALREADY-REDUCED ≤ queries × k rows — cost-free, and bit-equal to
    * the old formulation because the heap's (sim desc, vec_id) order is
    * the exact total order row_number used (PlanShapeSpec pins the
    * TopKPerKeyExec + tiny-input WindowExec shape). */
  def s06FilteredTopK(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir)
      .select(col("vec_id"), toDouble(col("embedding")).as("emb"), col("label"))
      .withColumn("nrm", l2Norm(col("emb")))
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("emb").as("qe"),
        col("nrm").as("qn"), col("label").as("qlabel"))
    val c = e.filter(col("vec_id") >= 10)
    val sims = c.join(broadcast(q), col("label") === col("qlabel"))
      .select(col("query_id"), col("vec_id"),
        round6(cosineWithNorms(col("qe"), col("emb"), col("qn"), col("nrm"))).as("sim"))
    val top = org.apache.spark.sql.graft.relations.topKPerKey(
      sims, Seq("query_id"), Seq(("sim", false), ("vec_id", true)), TopK)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("vec_id"))
    top.withColumn("rank", row_number().over(w).cast("long"))
      .orderBy("query_id", "rank")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s01_cosine_topk" -> (s01CosineTopK _),
    "s02_ann_ivf"     -> (s02AnnIvf _),
    "s03_ann_srp"     -> (s03AnnSrp _),
    "s04_ann_recall_gate" -> (s04AnnRecallGate _),
    "s05_ann_pq"      -> (s05AnnPq _),
    "s06_filtered_topk" -> (s06FilteredTopK _),
  )

  val oracleSql: Map[String, String] = Map(
    "s01_cosine_topk" ->
      """WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
        |q AS (SELECT vec_id AS query_id, emb AS qe FROM v WHERE vec_id < 10),
        |c AS (SELECT vec_id, emb FROM v WHERE vec_id >= 10),
        |s AS (SELECT query_id, vec_id,
        |        floor(list_cosine_similarity(qe, emb) * 1000000.0 + 0.5) / 1000000.0 AS sim
        |      FROM q CROSS JOIN c),
        |r AS (SELECT query_id, vec_id, sim,
        |        CAST(row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS BIGINT) AS rank
        |      FROM s)
        |SELECT query_id, vec_id, sim, rank FROM r WHERE rank <= 5
        |ORDER BY query_id, rank""".stripMargin,
    // s01 with the label predicate as the join condition (pre-filter,
    // never post-filter)
    "s06_filtered_topk" ->
      """WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb, label FROM embeddings),
        |q AS (SELECT vec_id AS query_id, emb AS qe, label AS qlabel FROM v WHERE vec_id < 10),
        |c AS (SELECT vec_id, emb, label FROM v WHERE vec_id >= 10),
        |s AS (SELECT query_id, vec_id,
        |        floor(list_cosine_similarity(qe, emb) * 1000000.0 + 0.5) / 1000000.0 AS sim
        |      FROM q JOIN c ON q.qlabel = c.label),
        |r AS (SELECT query_id, vec_id, sim,
        |        CAST(row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS BIGINT) AS rank
        |      FROM s)
        |SELECT query_id, vec_id, sim, rank FROM r WHERE rank <= 5
        |ORDER BY query_id, rank""".stripMargin,
    "s04_ann_recall_gate" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_queries,
        |  true AS ivf_recall_ge_60, true AS srp_recall_ge_60,
        |  true AS pq_recall_ge_60
        |FROM embeddings WHERE vec_id < 10""".stripMargin,
  )
}
