package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
/** 10x scale smoke: replicate sf0.1 lineitem/orders to ~6M/1.5M rows in
  * /tmp with shifted keys, run the heaviest relational plans, and report
  * per-query seconds for comparison against the sf0.1 numbers.
  *
  * `runMain graft.ScaleSmoke d100` instead runs the dedup-family 100×
  * smoke: documents amplified 100× (every text gains 100 exact copies —
  * the worst case for pairwise dedup, which the exact-dup class
  * collapse must keep linear), plus a synthetic 200k-hop chain
  * component proving clusterLabels' O(log diameter) convergence and
  * demonstrating what a too-low maxIters truncates. */
object ScaleSmoke {
  def main(a: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config(Tables.nanosFlag, "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    if (a.contains("d100")) { d100(spark); spark.stop(); return }
    val base = "/root/testdata/sf0.1"
    val out = "/tmp/sf1x"
    val reps = spark.range(10).toDF("rep")
    def amplify(name: String, keyCols: Seq[String], keySpan: Long): Unit = {
      val t = Tables(spark, base, name)
      val amplified = t.crossJoin(broadcast(reps))
        .select(t.columns.map {
          case c if keyCols.contains(c) => (col(c) + col("rep") * keySpan).as(c)
          case c => col(c)
        }: _*)
      amplified.write.mode("overwrite").parquet(s"$out/$name.parquet")
    }
    amplify("lineitem", Seq("l_orderkey"), 10000000L)
    amplify("orders", Seq("o_orderkey", "o_custkey"), 10000000L)
    amplify("customer", Seq("c_custkey"), 10000000L)
    amplify("documents", Seq("doc_id"), 1000000L)
    amplify("embeddings", Seq("vec_id"), 1000000L)
    // events: raw read keeps the INT64-nanos ts column intact
    spark.read.parquet(s"$base/events.parquet").crossJoin(broadcast(reps))
      .withColumn("event_id", col("event_id") + col("rep") * 1000000L)
      .withColumn("user_id", col("user_id") + col("rep") * 1000000L)
      .drop("rep")
      .write.mode("overwrite").parquet(s"$out/events.parquet")
    // tiny dims copied as-is
    Seq("region", "nation", "supplier", "part").foreach { n =>
      Tables(spark, base, n).write.mode("overwrite").parquet(s"$out/$n.parquet")
    }
    println(s"ROWS lineitem=${spark.read.parquet(s"$out/lineitem.parquet").count()}")
    Seq("q01_pricing_summary", "q02_filter_project", "q04_multijoin_region",
        "q08_window_topn", "q09_window_running", "q16_case_arith", "q27_array_agg",
        // round-2 additions: text/dedup/similarity + event analytics at 10x
        "d01_minhash_pairs", "d05_dedup_survivors", "d08_containment", "t03_quality", "t12_bm25",
        "t14_pipeline_e2e", "s03_ann_srp", "q52_funnel", "q53_retention",
        "q59_topk_custom").foreach { n =>
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, out).write.format("noop").mode("overwrite").save()
      println(f"SCALE10 $n ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    spark.stop()
  }

  /** 100× dedup-family smoke (see object Scaladoc). */
  private def d100(spark: SparkSession): Unit = {
    val base = "/root/testdata/sf0.1"
    val out = "/tmp/sf100x"
    val reps = spark.range(100).toDF("rep")
    val t = Tables(spark, base, "documents")
    t.crossJoin(broadcast(reps))
      .select(t.columns.map {
        case "doc_id" => (col("doc_id") + col("rep") * 10000000L).as("doc_id")
        case c => col(c)
      }: _*)
      .write.mode("overwrite").parquet(s"$out/documents.parquet")
    println(s"ROWS documents=${spark.read.parquet(s"$out/documents.parquet").count()}")
    Seq("d01_minhash_pairs", "d03_ngram_jaccard", "d05_dedup_survivors",
        "d08_containment", "t01_dedup_exact").foreach { n =>
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, out).write.format("noop").mode("overwrite").save()
      println(f"SCALE100 $n ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    // Wide-diameter convergence: a 200k-hop path is the adversarial
    // component shape (real near-dup clusters are dense and shallow).
    // Path-halving must converge in ~log2(200k) ≈ 18 rounds; a cap of 8
    // must truncate AND say so via the non-converged flag.
    val chain = spark.range(200000 - 1)
      .select(col("id").as("doc_a"), (col("id") + 1L).as("doc_b"))
    val t0 = System.nanoTime()
    val (labels, rounds, converged) =
      graft.operators.Dedup.clusterLabelsWithRounds(chain, maxIters = 25)
    val wrong = labels.filter(col("label") =!= 0L).count()
    println(f"CHAIN200K rounds=$rounds converged=$converged mislabeled=$wrong " +
      f"${(System.nanoTime() - t0) / 1e9}%.2f s")
    assert(converged && wrong == 0, "wide-diameter chain failed to converge")
    val (_, _, truncated) =
      graft.operators.Dedup.clusterLabelsWithRounds(chain, maxIters = 8)
    println(s"CHAIN200K maxIters=8 converged=$truncated (expected false)")
    assert(!truncated, "an 8-round cap cannot converge a 200k chain — flag is broken")
  }
}
