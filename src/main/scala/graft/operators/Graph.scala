package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Graph analytics over the purchase graph — the family the reference's
  * users reach for right after relational/dedup coverage (link analysis
  * for source trust, reachability for lineage). Nodes are customers and
  * suppliers (2·custkey / 2·suppkey+1 keeps the id spaces disjoint in one
  * BIGINT), edges are DISTINCT (customer, supplier) purchase pairs from
  * orders ⋈ lineitem, made undirected by emitting both directions.
  *
  * Both operators are FIXED-ITERATION (the iterative-algorithm lesson:
  * rounds are blocking multi-job barriers — a bounded unroll is the
  * honest contract, and it is what makes the DuckDB oracle expressible
  * as a plain CTE chain with zero recursion-semantics risk). All
  * arithmetic is scaled-BIGINT (`div`/`//` parity, the round-4 rule):
  * ranks and distances have ONE representation, so the hash gate cannot
  * be flipped by accumulation order at any parallelism.
  *
  * Scale shape: the edge set is built once, repartitioned by `src`, and
  * cached — every iteration's edge-side join reuses that partitioning
  * (zero edge re-shuffle; at cluster scale the same effect comes from
  * bucketing the edge table by src, the d13 corpus-index pattern). The
  * per-iteration shuffles move only the node-sized rank/frontier frames
  * (|V| ≪ |E|), which is the minimum any synchronous graph iteration
  * moves. Caches are query-scoped; Verify/Bench/spec harnesses
  * clearCache after each query (CLAUDE.md).
  */
object Graph {

  private val E12 = 1000000000000L

  /** Undirected purchase graph: (src, dst) both directions, repartitioned
    * by src and cached so iterations never re-shuffle the edge side. */
  private def purchaseEdges(s: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(s, dir).select(col("o_orderkey"), col("o_custkey"))
    val li = Tables.lineitem(s, dir).select(col("l_orderkey"), col("l_suppkey"))
    val pairs = li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .select((col("o_custkey").cast("long") * 2).as("a"),
        (col("l_suppkey").cast("long") * 2 + 1).as("b"))
      .distinct()
    pairs.select(col("a").as("src"), col("b").as("dst"))
      .union(pairs.select(col("b").as("src"), col("a").as("dst")))
      .repartition(col("src"))
      .cache()
  }

  /** PageRank, damping 0.85, 5 unrolled iterations, ranks scaled e12.
    *
    * rank₀ = 10¹² div N;
    * rankₖ₊₁(v) = (15·10¹²) div (100·N) + Σ_{(u,v)} (rankₖ(u)·85) div (100·deg(u)).
    *
    * Every node has degree ≥ 1 by construction (nodes are defined by
    * edge endpoints), so no dangling-mass term is needed. N and the
    * teleport base are driver scalars (one count — integer, one
    * representation, the IVF-seed collect precedent). Top 100 by
    * (rank desc, node) — a total order. */
  def g01PageRank(s: SparkSession, dir: String): DataFrame =
    pageRankOn(purchaseEdges(s, dir), iters = 5)
      .orderBy(col("rank_e12").desc, col("node")).limit(100)

  /** The iteration core over an arbitrary directed edge frame (src, dst)
    * where every node has out-degree ≥ 1 — exposed for the differential
    * spec (plain-Scala reference on a hand-built graph, the t28
    * pattern). Returns ALL node ranks. */
  private[graft] def pageRankOn(bi: DataFrame, iters: Int): DataFrame = {
    val s = bi.sparkSession
    val deg = bi.groupBy(col("src")).agg(count(lit(1)).as("outdeg")).cache()
    val n = deg.count()
    if (n == 0) {
      deg.unpersist()
      return s.range(0).select(col("id").as("node"), col("id").as("rank_e12"))
    }
    val base = (15L * E12) / (100L * n)
    var ranks = deg.select(col("src").as("node"), lit(E12 / n).as("rank_e12"))
    for (_ <- 1 to iters) {
      // ranks derives from deg — alias both sides or the self-join is
      // ambiguous
      val contrib = ranks.alias("r").join(deg.alias("d"), col("r.node") === col("d.src"))
        .select(col("d.src").as("src"),
          expr("(r.rank_e12 * 85) div (100 * d.outdeg)").as("share"))
      val inSums = bi.join(contrib, "src")
        .groupBy(col("dst"))
        .agg(sum(col("share")).as("in_sum"))
        .select(col("dst").as("node"), col("in_sum"))
      // LEFT from the node set: a node with no IN-edges keeps the
      // teleport base instead of vanishing (cannot happen on an
      // undirected graph like g01's, but the core's contract is any
      // directed graph with out-degree >= 1 — the gr100 smoke's random
      // digraph exercises exactly this)
      ranks = deg.select(col("src").as("node"))
        .join(inSums, Seq("node"), "left")
        .select(col("node"),
          (lit(base) + coalesce(col("in_sum"), lit(0L))).cast("long").as("rank_e12"))
    }
    ranks
  }

  /** BFS level profile from the smallest node id present in the graph:
    * 4 unrolled frontier expansions, then one row per distance 0–4 with
    * the node count and an id-sum checksum (empty levels emit (0, 0) —
    * the dense purchase graph's diameter is ~3, and the trailing empty
    * levels prove saturation rather than vanishing from the output).
    * Frontier sets are |V|-sized — broadcast into the cached edge scan,
    * so expansions never shuffle the edge side either. */
  def g02BfsLevels(s: SparkSession, dir: String): DataFrame =
    bfsLevelsOn(purchaseEdges(s, dir), hops = 4)

  /** BFS core over an arbitrary directed edge frame, rooted at the
    * smallest src id — exposed for the differential spec. */
  private[graft] def bfsLevelsOn(bi: DataFrame, hops: Int): DataFrame = {
    val src = bi.agg(min(col("src")).as("s"))
    var reach = bi.join(broadcast(src), bi("src") === src("s"))
      .select(bi("src").as("node")).distinct().cache()  // = {min node}
    val levels = Seq.newBuilder[DataFrame]
    levels += reach.agg(lit(0L).as("dist"),
      count(lit(1)).cast("long").as("n_nodes"),
      coalesce(sum(col("node")), lit(0L)).as("node_sum"))
    for (k <- 1 to hops) {
      val next = bi.join(broadcast(reach), bi("src") === reach("node"))
        .select(col("dst").as("node"))
        .union(reach).distinct().cache()
      val fresh = next.exceptAll(reach)
      levels += fresh.agg(lit(k.toLong).as("dist"),
        count(lit(1)).cast("long").as("n_nodes"),
        coalesce(sum(col("node")), lit(0L)).as("node_sum"))
      reach = next
    }
    levels.result().reduce(_ union _).orderBy(col("dist"))
  }

  /** Shared CTE prefix: the purchase graph in DuckDB terms. */
  private val EdgeCtes =
    """e AS (SELECT DISTINCT CAST(o_custkey AS BIGINT)*2 AS a,
      |                      CAST(l_suppkey AS BIGINT)*2+1 AS b
      |       FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
      |bi AS (SELECT a AS src, b AS dst FROM e
      |       UNION ALL SELECT b AS src, a AS dst FROM e)""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "g01_pagerank" -> (g01PageRank _),
    "g02_bfs_levels" -> (g02BfsLevels _),
  )

  val oracleSql: Map[String, String] = Map(
    "g01_pagerank" -> {
      // one c{k}/p{k} pair per unrolled iteration — the Spark loop body,
      // node-for-node (shares then base+sum, all BIGINT `//`)
      val iters = (1 to 5).map { k =>
        s"""c$k AS (SELECT p.node, (p.rank_e12 * 85) // (100 * d.outdeg) AS share
           |        FROM p${k - 1} p JOIN deg d ON d.src = p.node),
           |p$k AS (SELECT bi.dst AS node,
           |          (15000000000000 // (100 * (SELECT n FROM nn)))
           |            + CAST(SUM(c.share) AS BIGINT) AS rank_e12
           |        FROM bi JOIN c$k c ON c.node = bi.src GROUP BY bi.dst)""".stripMargin
      }.mkString(",\n")
      s"""WITH $EdgeCtes,
         |deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS outdeg FROM bi GROUP BY src),
         |nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM deg),
         |p0 AS (SELECT src AS node, 1000000000000 // (SELECT n FROM nn) AS rank_e12 FROM deg),
         |$iters
         |SELECT node, rank_e12 FROM p5 ORDER BY rank_e12 DESC, node LIMIT 100""".stripMargin
    },
    "g02_bfs_levels" -> {
      val reaches = (1 to 4).map { k =>
        s"""r$k AS (SELECT DISTINCT node FROM (
           |  SELECT bi.dst AS node FROM bi JOIN r${k - 1} r ON bi.src = r.node
           |  UNION ALL SELECT node FROM r${k - 1}) u)""".stripMargin
      }.mkString(",\n")
      val levels = (1 to 4).map { k =>
        s"""SELECT CAST($k AS BIGINT) AS dist, CAST(COUNT(*) AS BIGINT) AS n_nodes,
           |  COALESCE(CAST(SUM(node) AS BIGINT), 0) AS node_sum
           |FROM (SELECT node FROM r$k EXCEPT SELECT node FROM r${k - 1}) f""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH $EdgeCtes,
         |r0 AS (SELECT MIN(src) AS node FROM bi),
         |$reaches
         |SELECT * FROM (
         |SELECT CAST(0 AS BIGINT) AS dist, CAST(COUNT(*) AS BIGINT) AS n_nodes,
         |  COALESCE(CAST(SUM(node) AS BIGINT), 0) AS node_sum FROM r0
         |UNION ALL
         |$levels) l ORDER BY dist""".stripMargin
    },
  )
}
