package graft

import graft.operators.Similarity

class SimilaritySpec extends SparkSpec {

  private lazy val exact = Similarity.s01CosineTopK(spark, sf).collect()
  private lazy val approx = Similarity.s02AnnIvf(spark, sf).collect()
  private lazy val srp = Similarity.s03AnnSrp(spark, sf).collect()
  private lazy val pq = Similarity.s05AnnPq(spark, sf).collect()

  test("exact top-k: 5 ranked neighbors per query, sims non-increasing") {
    val byQuery = exact.groupBy(_.getLong(0))
    assert(byQuery.size == 10)
    byQuery.foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getLong(3))
      assert(sorted.map(_.getLong(3)).toSeq == (1L to 5L))
      val sims = sorted.map(_.getDouble(2)).toSeq
      assert(sims == sims.sorted.reverse, s"sims not sorted: $sims")
    }
  }

  test("IVF recall@5 vs exact baseline is high") {
    val e = exact.map(r => (r.getLong(0), r.getLong(1))).toSet
    val a = approx.map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (e & a).size.toDouble / e.size
    // measured 0.78 at sf0.001 / 0.62 at sf0.1 with one Lloyd pass,
    // probing 6 of 16 cells over near-random embeddings
    assert(recall >= 0.6, s"recall@5=$recall")
  }

  test("SRP-LSH recall@5 vs exact baseline is high") {
    val e = exact.map(r => (r.getLong(0), r.getLong(1))).toSet
    val a = srp.map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (e & a).size.toDouble / e.size
    assert(recall >= 0.6, s"recall@5=$recall")
  }

  test("PQ-ADC recall@5 vs exact baseline is high; 5 ranked rows per query") {
    val e = exact.map(r => (r.getLong(0), r.getLong(1))).toSet
    val a = pq.map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (e & a).size.toDouble / e.size
    assert(recall >= 0.6, s"recall@5=$recall")
    val byQuery = pq.groupBy(_.getLong(0))
    assert(byQuery.size == 10)
    byQuery.foreach { case (_, rows) =>
      assert(rows.map(_.getLong(3)).sorted.toSeq == (1L to 5L))
    }
  }

  test("SRP-LSH returns exactly 5 ranked rows per query") {
    val byQuery = srp.groupBy(_.getLong(0))
    assert(byQuery.size == 10)
    byQuery.foreach { case (_, rows) =>
      assert(rows.map(_.getLong(3)).sorted.toSeq == (1L to 5L))
    }
  }

  test("int8-quantized storage path keeps brute-force recall@5 high") {
    // the 4x-smaller storage format (quantizeInt8) must not wreck
    // neighbor quality: dequantize and rerun the exact top-k, compare
    import org.apache.spark.sql.functions._
    import graft.functions.VectorFunctions
    val scale = 0.005 // |values| ≤ ~0.35 → well inside ±127 steps
    val deq = Tables.embeddings(spark, sf)
      .select(col("vec_id"),
        VectorFunctions.dequantizeInt8(
          VectorFunctions.quantizeInt8(col("embedding"), scale), scale).as("embedding"))
    deq.createOrReplaceTempView("graft_q_embeddings")
    val e = deq.select(col("vec_id"), VectorFunctions.toDouble(col("embedding")).as("emb"))
      .withColumn("nrm", VectorFunctions.l2Norm(col("emb")))
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("emb").as("qe"), col("nrm").as("qn"))
    val c = e.filter(col("vec_id") >= 10)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("sim").desc, col("vec_id"))
    val quantTop = c.join(broadcast(q))
      .select(col("query_id"), col("vec_id"),
        VectorFunctions.cosineWithNorms(col("qe"), col("emb"), col("qn"), col("nrm")).as("sim"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .collect()
    val ex = exact.map(r => (r.getLong(0), r.getLong(1))).toSet
    val qt = quantTop.map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (ex & qt).size.toDouble / ex.size
    assert(recall >= 0.8, s"int8 recall@5=$recall")
  }

  test("IVF never returns a better-than-exact neighbor (sanity)") {
    val bestExact = exact.filter(_.getLong(3) == 1L)
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    approx.filter(_.getLong(3) == 1L).foreach { r =>
      assert(r.getDouble(2) <= bestExact(r.getLong(0)) + 1e-9)
    }
  }

  test("filtered top-k: every neighbor shares its query's label, never beats unfiltered") {
    val labels = Tables.embeddings(spark, sf)
      .select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val f = Similarity.s06FilteredTopK(spark, sf).collect()
    assert(f.nonEmpty)
    // pre-filter contract: results drawn ONLY from the label-matching
    // subset, ranks contiguous from 1 per query
    f.foreach { r => assert(labels(r.getLong(1)) == labels(r.getLong(0))) }
    f.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      assert(rows.map(_.getLong(3)).sorted.sameElements(1L to rows.length))
    }
    // restricting the candidate set can never IMPROVE the best neighbor
    val bestExact = exact.filter(_.getLong(3) == 1L)
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    f.filter(_.getLong(3) == 1L).foreach { r =>
      assert(r.getDouble(2) <= bestExact(r.getLong(0)) + 1e-9)
    }
  }
}
