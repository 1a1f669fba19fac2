package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
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
  * with deterministic centroid seeds. Corpus vectors are assigned to
  * their nearest centroid once (one broadcast join against ~16 rows);
  * queries probe the nprobe closest cells, so each query scans only
  * ~nprobe/ncentroids of the corpus.
  */
object Similarity {

  private val TopK = 5
  private val NCentroids = 16
  private val NProbe = 6

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

  /** One deterministic Lloyd (k-means) refinement pass: assign every
    * corpus vector to its nearest centroid, recompute each centroid as
    * the elementwise mean of its cell — computed distributively
    * (posexplode → groupBy(cell, position) → avg → re-assembled in
    * position order), so no vector data ever reaches the driver. Tighter
    * centroids → tighter cells → higher recall at the same nprobe. */
  private def refine(corpus: DataFrame, cents: DataFrame): DataFrame = {
    val assigned = corpus.join(broadcast(cents))
      .select(col("vec_id"), col("emb"), col("cent_id"),
        l2Sq(col("emb"), col("ce")).as("d2"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("vec_id")).orderBy(col("d2"), col("cent_id"))))
      .filter(col("rn") === 1)
    assigned
      .select(col("cent_id"), posexplode(col("emb")))
      .toDF("cent_id", "pos", "v")
      .groupBy(col("cent_id"), col("pos"))
      .agg(avg(col("v")).as("m"))
      .groupBy(col("cent_id"))
      .agg(sort_array(collect_list(struct(col("pos"), col("m")))).as("pm"))
      .select(col("cent_id"), expr("transform(pm, x -> x.m)").as("ce"))
  }

  /** IVF-routed approximate top-5: same queries/corpus split as s01 so
    * SimilaritySpec can measure recall against the exact baseline. */
  def s02AnnIvf(s: SparkSession, dir: String): DataFrame = {
    val e = withNorm(Tables.embeddings(s, dir))
    val corpus = e.filter(col("vec_id") >= 10)
    // Deterministic centroid seeds (the NCentroids lowest corpus ids),
    // tightened by one Lloyd pass.
    val seeds = corpus.orderBy("vec_id").limit(NCentroids)
      .select(col("vec_id").as("cent_id"), col("emb").as("ce"))
    val cents = refine(corpus, seeds)
    // One broadcast join assigns every corpus vector to its nearest cell.
    val assigned = corpus.join(broadcast(cents))
      .select(col("vec_id"), col("emb"), col("nrm"), col("cent_id"),
        l2Sq(col("emb"), col("ce")).as("d2"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("vec_id")).orderBy(col("d2"), col("cent_id"))))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("emb"), col("nrm"), col("cent_id"))
    // Queries probe their NProbe nearest cells.
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("emb").as("qe"), col("nrm").as("qn"))
    val probes = q.join(broadcast(cents))
      .select(col("query_id"), col("qe"), col("qn"), col("cent_id"),
        l2Sq(col("qe"), col("ce")).as("d2"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("d2"), col("cent_id"))))
      .filter(col("rn") <= NProbe)
      .select(col("query_id"), col("qe"), col("qn"), col("cent_id"))
    // Candidate set = corpus vectors in probed cells only.
    val sims = assigned.join(broadcast(probes), Seq("cent_id"))
      .select(col("query_id"), col("vec_id"),
        round6(cosineWithNorms(col("qe"), col("emb"), col("qn"), col("nrm"))).as("sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("vec_id"))
    sims.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= TopK)
      .orderBy("query_id", "rank")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s01_cosine_topk" -> (s01CosineTopK _),
    "s02_ann_ivf"     -> (s02AnnIvf _),
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
  )
}
