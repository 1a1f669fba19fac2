package graft

import org.apache.spark.sql.functions._

import graft.operators.Graph

/** Graph family: differential tests against a plain-Scala integer
  * reference on a hand-built graph (the t28 pattern), plus fixture-level
  * structural properties of the registered g01/g02 queries. */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  // Petersen-ish small graph: 6 nodes, undirected edges as both
  // directions, irregular degrees so rank differences are real.
  private val undirected = Seq(
    (1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L), (3L, 6L))
  private def biDf = {
    val bi = undirected ++ undirected.map { case (a, b) => (b, a) }
    bi.toDF("src", "dst")
  }

  /** The exact integer recurrence, plain Scala. */
  private def refRanks(bi: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val deg = bi.groupBy(_._1).map { case (n, es) => n -> es.size.toLong }
    val n = deg.size.toLong
    val e12 = 1000000000000L
    val base = (15L * e12) / (100L * n)
    var ranks: Map[Long, Long] = deg.map { case (k, _) => k -> e12 / n }
    for (_ <- 1 to iters) {
      val shares = ranks.map { case (u, r) => u -> (r * 85L) / (100L * deg(u)) }
      ranks = bi.groupBy(_._2).map { case (v, es) =>
        v -> (base + es.map(e => shares(e._1)).sum)
      }
    }
    ranks
  }

  test("pageRankOn matches the plain-Scala integer recurrence exactly") {
    val bi = undirected ++ undirected.map { case (a, b) => (b, a) }
    val expected = refRanks(bi, 5)
    val got = Graph.pageRankOn(biDf, 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected)
    spark.sharedState.cacheManager.clearCache()
  }

  /** Textbook full-relax Bellman-Ford, plain Scala — the oracle's shape. */
  private def refSssp(we: Seq[(Long, Long, Long)], root: Long,
      rounds: Int): Map[Long, Long] = {
    var dist = Map(root -> 0L)
    for (_ <- 1 to rounds) {
      val cand = we.flatMap { case (s, d, w) => dist.get(s).map(ds => d -> (ds + w)) }
      dist = (dist.toSeq ++ cand).groupBy(_._1)
        .map { case (n, vs) => n -> vs.map(_._2).min }
    }
    dist
  }

  test("ssspOn matches full-relax Bellman-Ford; frontier re-entry on late improvement") {
    // 1→2 direct costs 10 but 1→3→2 costs 3, so node 2 IMPROVES in round
    // 2 and must re-enter the frontier for 4 and 5 to see the cheaper
    // prefix (5 improves in round 4 — the last allowed round)
    val we = Seq((1L, 2L, 10L), (1L, 3L, 1L), (3L, 2L, 2L),
      (2L, 4L, 1L), (4L, 5L, 1L))
    val expected = refSssp(we, root = 1L, rounds = 4)
    val got = Graph.ssspOn(we.toDF("src", "dst", "w"), 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected)
    assert(got(2L) == 3L && got(5L) == 5L)
    spark.sharedState.cacheManager.clearCache()
  }

  test("ssspOn short-circuits after saturation: extra rounds change nothing") {
    val we = Seq((1L, 2L, 5L), (2L, 3L, 5L))
    val at2 = Graph.ssspOn(we.toDF("src", "dst", "w"), 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val at6 = Graph.ssspOn(we.toDF("src", "dst", "w"), 6)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(at2 == at6 && at2 == Map(1L -> 0L, 2L -> 5L, 3L -> 10L))
    spark.sharedState.cacheManager.clearCache()
  }

  test("g07 fixture: 100 rows, root at distance 0, total order") {
    val rows = Graph.g07ShortestPaths(spark, sf).collect()
    assert(rows.length == 100)
    assert(rows.head.getLong(1) == 0L)
    val ds = rows.map(r => (r.getLong(1), r.getLong(0)))
    assert(ds.toSeq == ds.toSeq.sorted)
    spark.sharedState.cacheManager.clearCache()
  }

  /** The directed recurrence with dangling redistribution, plain Scala. */
  private def refDirected(de: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val nodes = (de.map(_._1) ++ de.map(_._2)).distinct.sorted
    val deg = de.groupBy(_._1).map { case (u, es) => u -> es.size.toLong }
    val n = nodes.size.toLong
    val e12 = 1000000000000L
    val base = (15L * e12) / (100L * n)
    var ranks: Map[Long, Long] = nodes.map(_ -> e12 / n).toMap
    for (_ <- 1 to iters) {
      val shares = ranks.collect { case (u, r) if deg.contains(u) =>
        u -> (r * 85L) / (100L * deg(u)) }
      val dang = (85L * ranks.collect {
        case (u, r) if !deg.contains(u) => r }.sum) / (100L * n)
      ranks = nodes.map { v =>
        v -> (base + de.filter(_._2 == v).map(e => shares(e._1)).sum + dang)
      }.toMap
    }
    ranks
  }

  test("pageRankDirectedOn matches the plain-Scala dangling recurrence exactly") {
    // digraph with pure sinks (5 and 6 have no out-edges) and an
    // in-degree-0 source (1) — both directed-only contract points
    val de = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L), (4L, 5L), (4L, 6L), (2L, 5L))
    val expected = refDirected(de, 5)
    val got = Graph.pageRankDirectedOn(de.toDF("src", "dst"), 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected)
    // mass conservation up to integer-division loss: total stays within
    // 6·(E+N+1) of 1e12 (each div drops < 1 unit per share/base/dang)
    val mass = got.values.sum
    assert(mass <= 1000000000000L &&
      mass >= 1000000000000L - 6L * (de.size + expected.size + 1) * 5,
      s"mass $mass drifted")
    spark.sharedState.cacheManager.clearCache()
  }

  /** The weighted seed-teleport recurrence, plain Scala — mirrors the
    * staged multiply-then-divide share exactly. */
  private def refPersonalized(we: Seq[(Long, Long, Long)], seeds: Seq[Long],
      iters: Int): Map[Long, Long] = {
    val nodes = we.map(_._1).distinct
    val tw = we.groupBy(_._1).map { case (u, es) => u -> es.map(_._3).sum }
    val ns = seeds.size.toLong
    val e12 = 1000000000000L
    val base = (15L * e12) / (100L * ns)
    var ranks: Map[Long, Long] =
      nodes.map(v => v -> (if (seeds.contains(v)) e12 / ns else 0L)).toMap
    for (_ <- 1 to iters) {
      val m = ranks.map { case (u, r) => u -> (r * 85L) / 100L }
      ranks = nodes.map { v =>
        val in = we.filter(_._2 == v)
          .map { case (u, _, w) => (m(u) * w) / tw(u) }.sum
        v -> ((if (seeds.contains(v)) base else 0L) + in)
      }.toMap
    }
    ranks
  }

  test("personalizedPageRankOn matches the plain-Scala weighted seed recurrence") {
    // weighted undirected graph with seeds {1, 4}: teleport mass returns
    // ONLY to seeds, walk steps follow edge weight (1-2 heavy, 1-3
    // light), node 6 reachable only through 5 so its rank is pure
    // decayed in-flow
    val und = Seq((1L, 2L, 5L), (1L, 3L, 1L), (2L, 3L, 2L),
      (3L, 4L, 7L), (4L, 5L, 1L), (5L, 6L, 3L))
    val we = und ++ und.map { case (a, b, w) => (b, a, w) }
    val seeds = Seq(1L, 4L)
    val expected = refPersonalized(we, seeds, 5)
    val got = Graph.personalizedPageRankOn(
        we.toDF("src", "dst", "w"), seeds.toDF("node"), 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected)
    assert(got(6L) > 0L && got(6L) < got(1L))
    spark.sharedState.cacheManager.clearCache()
  }

  test("g09 fixture: 100 rows, total order, all three seeds surface in the top 100") {
    val rows = Graph.g09PersonalizedPageRank(spark, sf).collect()
    assert(rows.length == 100)
    val ranks = rows.map(r => (r.getLong(1), r.getLong(0)))
    assert(ranks.toSeq == ranks.toSeq.sortBy { case (r, nd) => (-r, nd) })
    // the 3 smallest customer nodes get the teleport base every
    // iteration (~5e10 each) — far above the diffuse non-hub mass
    val nodes = rows.map(_.getLong(0)).toSet
    val seeds = Graph.g09PersonalizedPageRank(spark, sf).sparkSession
      .table(operators.Graph.sharedWeightedEdgeIndex(spark, sf) + "_edges")
      .filter(col("src") % 2 === 0).select(col("src")).distinct()
      .orderBy(col("src")).limit(3).collect().map(_.getLong(0))
    assert(seeds.forall(nodes.contains), s"seeds ${seeds.toSeq} not all in top 100")
    spark.sharedState.cacheManager.clearCache()
  }

  /** Plain-Scala triangle counter over canonical (u < v) edges. */
  private def refTriangles(edges: Seq[(Long, Long)]): (Long, Long, Long) = {
    val es = edges.toSet
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val tri = (for {
      (a, b) <- es.toSeq; c <- nodes
      if c > b && es.contains((a, c)) && es.contains((b, c))
    } yield 1).size.toLong
    (nodes.size.toLong, es.size.toLong, tri)
  }

  test("trianglesOn matches brute force: K4, hub star (0 triangles), mixed graph") {
    // K4 = 4 triangles; a star has wedges but no closures (the
    // orientation must not count open wedges); mixed graph exercises
    // degree ties broken by id
    val k4 = for (i <- 1L to 4L; j <- (i + 1) to 4L) yield (i, j)
    val star = (2L to 8L).map(i => (1L, i))
    val mixed = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L), (4L, 5L),
      (3L, 5L), (5L, 6L), (1L, 4L))
    for (g <- Seq(k4, star, mixed)) {
      val got = Graph.trianglesOn(g.toDF("u", "v")).collect().head
      val want = refTriangles(g)
      assert((got.getLong(0), got.getLong(1), got.getLong(2)) == want,
        s"graph $g: got $got want $want")
      spark.sharedState.cacheManager.clearCache()
    }
  }

  test("clusteringCoeffOn matches the per-node brute force (K4, star, mixed)") {
    def ref(edges: Seq[(Long, Long)]): Seq[(Long, Long, Long, Long)] = {
      val es = edges.toSet
      val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
      def nbrs(n: Long) = edges.collect {
        case (a, b) if a == n => b
        case (a, b) if b == n => a
      }.distinct
      nodes.map { n =>
        val nb = nbrs(n)
        val deg = nb.size.toLong
        val tri = (for (b <- nb; c <- nb if b < c && es.contains((b, c)))
          yield 1).size.toLong
        val coef = if (deg >= 2) (2 * tri * 1000000L) / (deg * (deg - 1)) else 0L
        (n, deg, tri, coef)
      }.sortBy(r => (-r._4, r._1)).take(100)
    }
    val k4 = for (i <- 1L to 4L; j <- (i + 1) to 4L) yield (i, j)
    val star = (2L to 8L).map(i => (1L, i))
    val mixed = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L), (4L, 5L),
      (3L, 5L), (5L, 6L), (1L, 4L))
    for (g <- Seq(k4, star, mixed)) {
      val got = Graph.clusteringCoeffOn(g.toDF("u", "v")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
      assert(got == ref(g), s"graph $g: got $got want ${ref(g)}")
      spark.sharedState.cacheManager.clearCache()
    }
  }

  // the plain-Scala LPA reference lives in GraphRefs (shared with
  // PropertySpec's random-graph sweep — r12 ADVICE: one contract, one copy)
  private def refLpa(we: Seq[(Long, Long, Long)], rounds: Int): Map[Long, Long] =
    GraphRefs.refLpa(we, rounds)

  private def biW(es: Seq[(Long, Long, Long)]): Seq[(Long, Long, Long)] =
    es ++ es.map(e => (e._2, e._1, e._3))

  test("lpaOn matches the plain-Scala reference: bridged triangles, tie-break, star, oscillator") {
    // two heavy triangles joined by a weak bridge → two communities;
    // an equal-weight path exercises the smallest-label tie-break; a
    // star collapses to the hub's star-of-ids dynamics; a single edge
    // OSCILLATES under synchronous LPA (labels swap each round) — the
    // bounded-round contract must reproduce it, not hide it
    val bridged = biW(Seq((1L, 2L, 5L), (1L, 3L, 5L), (2L, 3L, 5L),
      (4L, 5L, 5L), (4L, 6L, 5L), (5L, 6L, 5L), (3L, 4L, 1L)))
    val tiePath = biW(Seq((1L, 2L, 3L), (2L, 3L, 3L)))
    val star = biW((2L to 8L).map(i => (1L, i, 2L)))
    val oscillator = biW(Seq((1L, 2L, 7L)))
    for (g <- Seq(bridged, tiePath, star, oscillator)) {
      val got = Graph.lpaOn(g.toDF("src", "dst", "w"), rounds = 4)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = refLpa(g, rounds = 4)
      assert(got == want, s"graph $g: got $got want $want")
      spark.sharedState.cacheManager.clearCache()
    }
  }

  test("lazy lpaOn ≡ eager lpaRoundLabels.last on stabilizing AND oscillating graphs (r15 internals pin)") {
    // r15 made lpaOn a lazy unroll WITHOUT the per-round stability
    // short-circuit lpaRoundLabels keeps; the equivalence argument is
    // that a stable labelling reproduces itself under the vote. Pin it
    // on a graph that STABILIZES before round 4 (disjoint triangles —
    // the short-circuit path in the eager twin genuinely fires) and on
    // the oscillator (it never fires), across both code paths.
    val stable = biW(Seq((1L, 2L, 5L), (1L, 3L, 5L), (2L, 3L, 5L),
      (7L, 8L, 5L), (7L, 9L, 5L), (8L, 9L, 5L)))
    val oscillator = biW(Seq((1L, 2L, 7L)))
    for (g <- Seq(stable, oscillator)) {
      val we = g.toDF("src", "dst", "w")
      val lazyLabels = Graph.lpaOn(we, rounds = 4)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val eagerLabels = Graph.lpaRoundLabels(we, rounds = 4).last
        .select("node", "label")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(lazyLabels == eagerLabels,
        s"graph $g: lazy $lazyLabels eager $eagerLabels")
      spark.sharedState.cacheManager.clearCache()
    }
  }

  test("modularityOn matches an exact BigInt reference (bridged triangles, star, single triangle)") {
    import spark.implicits._
    def refQ(we: Seq[(Long, Long, Long)],
        lab: Map[Long, Long]): (Long, Long, Long, Long) = {
      val m2 = BigInt(we.map(_._3).sum)
      val intra = BigInt(we.filter(e => lab(e._1) == lab(e._2)).map(_._3).sum)
      val tot = we.groupBy(e => lab(e._1)).values
        .map(es => BigInt(es.map(_._3).sum))
      val d = m2 * m2
      val q = ((intra * m2 - tot.map(k => k * k).sum + d) *
        BigInt(1000000000)) / d - BigInt(1000000000)
      (tot.size.toLong, m2.toLong, intra.toLong, q.toLong)
    }
    val bridged = biW(Seq((1L, 2L, 5L), (1L, 3L, 5L), (2L, 3L, 5L),
      (4L, 5L, 5L), (4L, 6L, 5L), (5L, 6L, 5L), (3L, 4L, 1L)))
    val star = biW((2L to 8L).map(i => (1L, i, 2L)))
    val triangle = biW(Seq((1L, 2L, 3L), (1L, 3L, 3L), (2L, 3L, 3L)))
    for (g <- Seq(bridged, star, triangle)) {
      val lab = refLpa(g, 4)
      val got = Graph.modularityOn(g.toDF("src", "dst", "w"),
        lab.toSeq.toDF("node", "label")).collect().head
      val want = refQ(g, lab)
      assert((got.getLong(0), got.getLong(1), got.getLong(2),
        got.getLong(3)) == want, s"graph $g labels $lab: got $got want $want")
      spark.sharedState.cacheManager.clearCache()
    }
  }

  test("g15 fixture: one row, exact-integer Q defined and above the all-singletons floor") {
    val r = Graph.g15Modularity(spark, sf).collect()
    assert(r.length == 1)
    assert(r.head.getLong(1) > 0L, "empty weighted co-occurrence graph")
    // Q of the LPA partition must beat Q of all-singletons (= -sum
    // tot_i^2/(2m)^2 < 0): a labelling with ANY intra mass clears it
    assert(r.head.getLong(3) > -1000000000L && r.head.getLong(3) <= 1000000000L)
    assert(r.head.getLong(2) > 0L, "LPA partition captured zero intra-community weight")
    spark.sharedState.cacheManager.clearCache()
  }

  test("g14 fixture: more than one community, fewer communities than nodes (non-degenerate)") {
    val rows = Graph.g14LpaCommunities(spark, sf).collect()
    val nComm = rows.length.toLong
    val nNodes = rows.map(_.getLong(1)).sum
    assert(nComm > 1L, "LPA percolated to ONE community — degenerate fixture")
    assert(nComm < nNodes, "every node kept its own label — vacuous propagation")
    spark.sharedState.cacheManager.clearCache()
  }

  test("appendToEdgeIndex is idempotent: the same batch delivered twice inserts zero duplicates") {
    import spark.implicits._
    val name = "graft_spec_ingest_idem"
    try {
      Graph.writeEdgeIndexFrom(spark,
        Seq((1L, 2L), (2L, 1L)).toDF("src", "dst"), name, numBuckets = 2)
      val batch = Seq((1L, 2L), (2L, 3L), (3L, 2L)).toDF("src", "dst")
      Graph.appendToEdgeIndex(spark, batch, name)
      val n1 = spark.table(name + "_edges").count()
      assert(n1 == 4L, "overlap row (1,2) re-inserted on first append")
      Graph.appendToEdgeIndex(spark, batch, name) // at-least-once redelivery
      assert(spark.table(name + "_edges").count() == n1,
        "redelivered batch inserted duplicate edges")
      assert(spark.table(name + "_edges")
        .groupBy(col("src"), col("dst")).count()
        .filter(col("count") > 1).isEmpty, "distinct-edge invariant broken")
    } finally Seq("_edges", "_stats").foreach(sfx =>
      spark.sql(s"DROP TABLE IF EXISTS $name$sfx"))
  }

  test("g13 gate: streamed ingest converges — mid-crash queryable, redelivery zero, stream == rebuild") {
    val r = Graph.g13EdgeIngestGate(spark, sf).collect()
    assert(r.length == 1)
    assert(r.head.getLong(0) > 0L)
    assert(r.head.getBoolean(1), "table not queryable with crash debris in place")
    assert(r.head.getBoolean(2), "redelivered micro-batch inserted rows")
    assert(r.head.getBoolean(3), "streamed index drifted from the from-scratch rebuild")
    spark.sharedState.cacheManager.clearCache()
  }

  test("g10 fixture: one row, bipartite-free edge definition yields triangles") {
    val r = Graph.g10Triangles(spark, sf).collect()
    assert(r.length == 1)
    assert(r.head.getLong(2) > 0L, "part co-occurrence graph lost its triangles")
    assert(r.head.getLong(1) < r.head.getLong(0) * (r.head.getLong(0) - 1) / 2,
      "co-occurrence graph is COMPLETE at this SF — the degenerate case g10 must avoid")
    spark.sharedState.cacheManager.clearCache()
  }

  test("g06 fixture: 100 rows, total order, suppliers (sinks) still accumulate rank") {
    val rows = Graph.g06PageRankDirected(spark, sf).collect()
    assert(rows.length == 100)
    val ranks = rows.map(r => (r.getLong(1), r.getLong(0)))
    assert(ranks.toSeq == ranks.toSeq.sortBy { case (r, nd) => (-r, nd) })
    // suppliers receive all customer mass each round — the top slot is a
    // supplier (odd id) here too, despite being a pure sink
    assert(rows.head.getLong(0) % 2 == 1)
    spark.sharedState.cacheManager.clearCache()
  }

  test("bfsLevelsOn matches hand-computed levels on the small graph") {
    // From node 1: dist0={1}, dist1={2,3}, dist2={4,6}, dist3={5}, dist4={}
    val got = Graph.bfsLevelsOn(biDf, 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((0L, 1L, 1L), (1L, 2L, 5L), (2L, 2L, 10L),
      (3L, 1L, 5L), (4L, 0L, 0L)))
    spark.sharedState.cacheManager.clearCache()
  }

  test("g01 fixture: 100 rows, total order, supplier hubs outrank customers") {
    val rows = Graph.g01PageRank(spark, sf).collect()
    assert(rows.length == 100)
    val ranks = rows.map(r => (r.getLong(1), r.getLong(0)))
    assert(ranks.toSeq == ranks.toSeq.sortBy { case (r, n) => (-r, n) })
    // suppliers (odd ids) are the hubs of the bipartite purchase graph
    // (far fewer suppliers than customers at every SF) — the top slot
    // must be a supplier, with positive rank
    assert(rows.head.getLong(0) % 2 == 1)
    assert(rows.last.getLong(1) > 0)
    spark.sharedState.cacheManager.clearCache()
  }

  test("g02 fixture: levels partition the reachable set and saturate") {
    val rows = Graph.g02BfsLevels(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.map(_._1).toSeq == Seq(0L, 1L, 2L, 3L, 4L))
    assert(rows.head == ((0L, 1L, rows.head._3)))  // root level is one node
    // dense purchase graph: saturated well before 4 hops
    assert(rows.last._2 == 0L && rows.last._3 == 0L)
    // every level after saturation stays empty (monotone)
    val firstEmpty = rows.indexWhere(_._2 == 0L)
    assert(rows.drop(firstEmpty).forall(_._2 == 0L))
    spark.sharedState.cacheManager.clearCache()
  }

  test("bfsLevelsOn saturation: trailing levels of a short path are (0, 0)") {
    // path 1-2-3 exhausts at hop 2; hops 3 and 4 must come from the
    // distance spine (the early-exit branch), not from running joins
    val path = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L)).toDF("src", "dst")
    val got = Graph.bfsLevelsOn(path, 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((0L, 1L, 1L), (1L, 1L, 2L), (2L, 1L, 3L),
      (3L, 0L, 0L), (4L, 0L, 0L)))
    spark.sharedState.cacheManager.clearCache()
  }

  /** Plain-Scala union-find — the g03 reference implementation. */
  private def refComponents(pairs: Seq[(Long, Long)]): Seq[(Long, Long, Long)] = {
    val par = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = par.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); par(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { if (ra < rb) par(rb) = ra else par(ra) = rb }
    }
    par.keys.toSeq.groupBy(find).toSeq
      .map { case (_, ns) => (ns.min, ns.size.toLong, ns.sum) }
      .sortBy(_._1)
  }

  test("g03 matches a plain-Scala union-find over the same thresholded pairs") {
    // replicate the whole pipeline (the t28/t34 differential pattern):
    // Spark only reads the raw fact columns; grouping, thresholding, and
    // the component fold are plain Scala integer code
    val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_suppkey")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val ord = Tables.orders(spark, sf).select("o_orderkey", "o_custkey")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // NOT `.collect { case (p, occ) ... => p }`: on a Map that overload
    // rebuilds a Map keyed by doc_a and silently DEDUPLICATES pairs
    val pairs = li.toSeq.map { case (ok, sk) => (ord(ok) * 2, sk * 2 + 1) }
      .groupBy(identity).filter(_._2.size >= 3).keys.toSeq
    val expected = refComponents(pairs)
    val got = Graph.g03Components(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expected)
    assert(got.nonEmpty && got.forall(_._2 >= 2)) // edges imply pairs at least
    spark.sharedState.cacheManager.clearCache()
  }

  test("g16 gate: served components are row-identical to a fresh fact-table inline") {
    val rows = Graph.g16AffinityIndexGate(spark, sf).collect()
    assert(rows.length == 1)
    assert(rows.head.getLong(0) > 0)      // n_edges
    assert(rows.head.getBoolean(1), "served components drifted from inline")
    spark.sharedState.cacheManager.clearCache()
  }

  test("g04 gate: served pagerank, bfs, and directed pagerank are row-identical to fresh inline") {
    val rows = Graph.g04GraphIndexGate(spark, sf).collect()
    assert(rows.length == 1)
    assert(rows.head.getLong(0) > 0)      // n_edges
    assert(rows.head.getBoolean(1), "served pagerank drifted from inline")
    assert(rows.head.getBoolean(2), "served bfs drifted from inline")
    assert(rows.head.getBoolean(3), "served directed pagerank drifted from inline")
    spark.sharedState.cacheManager.clearCache()
  }

  test("g12 gate: indexed triangles and clustering coeff are row-identical to inline") {
    val rows = Graph.g12CooccurIndexGate(spark, sf).collect()
    assert(rows.length == 1)
    assert(rows.head.getLong(0) > 0)      // n_edges
    assert(rows.head.getBoolean(1), "indexed triangles drifted from inline")
    assert(rows.head.getBoolean(2), "indexed clustering coeff drifted from inline")
    spark.sharedState.cacheManager.clearCache()
  }

  test("g08 gate: sssp from the weighted edge table matches the inline computation") {
    try {
      val rows = Graph.g08SsspIndexGate(spark, sf).collect()
      assert(rows.length == 1)
      assert(rows.head.getLong(0) > 0)
      assert(rows.head.getBoolean(1), "indexed sssp drifted from inline")
    } finally spark.catalog.clearCache()
  }

  test("g17: incremental labels == full fixpoint on the fixture, whole label set") {
    import graft.operators.Dedup
    try {
      val base = Graph.affinityPairs(spark, sf)
      val delta = Graph.affinityDeltaPairs(spark, sf)
      assert(delta.count() > 0, "fixture delta is empty — the gate would be vacuous")
      val incremental =
        Graph.incrementalComponentLabels(Dedup.clusterLabels(base), delta).cache()
      val full = Dedup.clusterLabels(base.unionByName(delta)).cache()
      val diff = incremental.exceptAll(full).count() + full.exceptAll(incremental).count()
      assert(diff == 0, s"incremental labels diverged from the full fixpoint by $diff rows")
    } finally spark.catalog.clearCache()
  }

  test("g17: crafted multi-component merge — displaced minima, fresh nodes, no-op internal edge") {
    import graft.operators.Dedup
    try {
      // base components: {2,4,6} label 2, {10,12} label 10, {30,32} label 30
      val base = Seq((2L, 4L), (4L, 6L), (10L, 12L), (30L, 32L))
        .toDF("doc_a", "doc_b")
      // delta: (6,10) merges two components (displacing 10's label),
      // (40,4) attaches a fresh node, (20,22) is a fresh-only component,
      // (2,6) is an intra-component no-op
      val delta = Seq((6L, 10L), (40L, 4L), (20L, 22L), (2L, 6L))
        .toDF("doc_a", "doc_b")
      val got = Graph.incrementalComponentLabels(Dedup.clusterLabels(base), delta)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      val expected = Map(
        2L -> 2L, 4L -> 2L, 6L -> 2L, 10L -> 2L, 12L -> 2L, 40L -> 2L,
        20L -> 20L, 22L -> 20L, 30L -> 30L, 32L -> 30L)
      assert(got == expected, s"got $got")
      // and the full fixpoint agrees (the equivalence claim, in miniature)
      val full = Dedup.clusterLabels(base.unionByName(delta))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(got == full)
    } finally spark.catalog.clearCache()
  }

  test("g17: registered query == full recompute restricted to delta-touched components") {
    import graft.operators.Dedup
    try {
      val base = Graph.affinityPairs(spark, sf)
      val delta = Graph.affinityDeltaPairs(spark, sf).cache()
      val full = Dedup.clusterLabels(base.unionByName(delta)).cache()
      val deltaNodes = delta.select(col("doc_a").as("id"))
        .unionByName(delta.select(col("doc_b").as("id"))).distinct()
      val affected = full.join(deltaNodes, Seq("id"), "left_semi")
        .select(col("label")).distinct()
      val expected = full.join(affected, Seq("label"), "left_semi")
        .groupBy(col("label").as("component"))
        .agg(count(lit(1)).as("n_nodes"), sum(col("id")).as("node_sum"))
      val got = Graph.g17IncrementalComponents(spark, sf).cache()
      val diff = got.exceptAll(expected).count() + expected.exceptAll(got).count()
      assert(diff == 0, s"g17 diverged from the restricted full recompute by $diff rows")
      assert(got.count() > 0)
    } finally spark.catalog.clearCache()
  }

  test("g17: incremental after a real appendToEdgeIndex matches the post-append table fixpoint") {
    import graft.operators.Dedup
    val name = "graft_g17_spec"
    try {
      val base = Seq((2L, 4L), (10L, 12L), (30L, 32L)).toDF("src", "dst")
      Graph.writeEdgeIndexFrom(spark, base, name)
      val pre = Dedup.clusterLabels(spark.table(name + "_edges")
        .select(col("src").as("doc_a"), col("dst").as("doc_b")))
      val delta = Seq((4L, 10L), (50L, 52L)).toDF("src", "dst")
      Graph.appendToEdgeIndex(spark, delta, name)
      val incremental = Graph.incrementalComponentLabels(
        pre, delta.select(col("src").as("doc_a"), col("dst").as("doc_b"))).cache()
      val post = Dedup.clusterLabels(spark.table(name + "_edges")
        .select(col("src").as("doc_a"), col("dst").as("doc_b"))).cache()
      val diff = incremental.exceptAll(post).count() + post.exceptAll(incremental).count()
      assert(diff == 0, s"incremental diverged from the post-append fixpoint by $diff rows")
    } finally {
      // cleanup in finally (round-14 ADVICE): an assert failure must not
      // leak the tables into later tests and reruns
      Seq("_edges", "_stats").foreach(sfx =>
        spark.sql(s"DROP TABLE IF EXISTS $name$sfx"))
      spark.catalog.clearCache()
    }
  }

  test("g18: crafted A/B/C delta classes — credits match a plain-Scala full recount") {
    try {
      // base: wedge 2-7-4 (A-witness), edge (8,10) (B-closer), chain off
      // node 1 for degree variety; delta: (2,4) closes the A triangle,
      // wedge (8,9)+(9,10) closes B against base (8,10), full triple
      // {20,21,22} is a C triangle, (30,31) attaches two brand-new nodes
      val base = Seq((2L, 7L), (4L, 7L), (8L, 10L), (1L, 2L), (1L, 8L))
        .toDF("u", "v")
      val delta = Seq((2L, 4L), (8L, 9L), (9L, 10L),
        (20L, 21L), (21L, 22L), (20L, 22L), (30L, 31L)).toDF("u", "v")
      val t = Graph.triangleCore(base)
      val got = Graph.incrementalTriangleTable((t._1, t._2), base, delta)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      // plain-Scala recount over the union (the differential-spec rule)
      val edges = Set((2L, 7L), (4L, 7L), (8L, 10L), (1L, 2L), (1L, 8L),
        (2L, 4L), (8L, 9L), (9L, 10L), (20L, 21L), (21L, 22L), (20L, 22L),
        (30L, 31L))
      val nodes = edges.flatMap(e => Seq(e._1, e._2))
      def adjacent(a: Long, b: Long) =
        edges.contains((a, b)) || edges.contains((b, a))
      val expected = nodes.map { n =>
        val nbrs = nodes.filter(m => m != n && adjacent(n, m)).toSeq.sorted
        val tri = nbrs.combinations(2).count { case Seq(x, y) => adjacent(x, y) }
        n -> (nbrs.size.toLong, tri.toLong)
      }.toMap
      assert(got == expected, s"got $got\nexpected $expected")
    } finally spark.catalog.clearCache()
  }

  test("g18: incremental table == full triangle-core recompute over the union (fixture)") {
    try {
      val base = Graph.partEdges(spark, sf).cache()
      val delta = Graph.cooccurDeltaEdges(spark, sf).cache()
      assert(delta.count() > 0, "fixture delta is empty — the gate would be vacuous")
      // delta honors the append contract by construction
      assert(delta.join(base, Seq("u", "v"), "left_semi").count() == 0)
      val baseCore = Graph.triangleCore(base)
      val inc = Graph.incrementalTriangleTable((baseCore._1, baseCore._2), base, delta)
        .cache()
      val full = {
        val t = Graph.triangleCore(base.unionByName(delta))
        // the full-recompute (node, deg, tri) table, the coeffFromCore way
        val tn = t._1.select(col("src").as("node"),
            org.apache.spark.sql.functions.size(col("inter")).cast("long").as("c"))
          .unionAll(t._1.select(col("dst").as("node"),
            org.apache.spark.sql.functions.size(col("inter")).cast("long").as("c")))
          .unionAll(t._1.select(explode(col("inter")).as("node"), lit(1L).as("c")))
          .groupBy(col("node")).agg(sum(col("c")).as("tri"))
        t._2.select(col("node"), col("d").as("deg"))
          .join(tn, Seq("node"), "left")
          .select(col("node"), col("deg"), coalesce(col("tri"), lit(0L)).as("tri"))
      }.cache()
      val diff = inc.exceptAll(full).count() + full.exceptAll(inc).count()
      assert(diff == 0, s"incremental diverged from the union recompute by $diff rows")
      // the registered gate == the same table restricted to delta endpoints
      val dn = delta.select(col("u").as("node"))
        .unionByName(delta.select(col("v").as("node"))).distinct()
      val expected = full.join(dn, Seq("node"), "left_semi")
        .withColumn("coef_e6",
          when(col("deg") >= 2,
            expr("(2 * tri * 1000000) div (deg * (deg - 1))"))
            .otherwise(lit(0L)))
      val gotG18 = Graph.g18IncrementalTriangles(spark, sf)
      val gDiff = gotG18.exceptAll(expected).count() +
        expected.exceptAll(gotG18).count()
      assert(gDiff == 0, s"g18 diverged from the restricted recompute by $gDiff rows")
      assert(gotG18.count() > 0)
    } finally spark.catalog.clearCache()
  }

  test("g19: crafted propagation — incremental LPA == bounded-round rebuild, ball excludes far components") {
    def bi(pairs: Seq[(Long, Long, Long)]) =
      pairs.flatMap { case (u, v, w) => Seq((u, v, w), (v, u, w)) }
        .toDF("src", "dst", "w")
    try {
      // base: path 1-2-3-4-5-6 (w=1) + an untouched far triangle {41,42,43}
      val basePairs = Seq((1L, 2L, 1L), (2L, 3L, 1L), (3L, 4L, 1L),
        (4L, 5L, 1L), (5L, 6L, 1L),
        (41L, 42L, 1L), (42L, 43L, 1L), (41L, 43L, 1L))
      val baseWe = bi(basePairs)
      val packed = Graph.packLpaRounds(Graph.lpaRoundLabels(baseWe, 4))
      // delta: heavy hub 100 on mid-path node 3 (w=10 — flips 3's vote and
      // the flip must PROPAGATE outward round by round), plus a brand-new
      // two-node component {200, 201}
      val deltaPairs = Seq((3L, 100L, 10L), (200L, 201L, 1L))
      val unionWe = bi(basePairs ++ deltaPairs)
      val deltaNodes = Seq(3L, 100L, 200L, 201L).toDF("node")
      val (inc0, ball) = Graph.incrementalLpaLabels(unionWe, packed, 4, deltaNodes)
      val inc = inc0.cache()
      val full = Graph.lpaOn(unionWe, 4).cache()
      val diff = inc.exceptAll(full).count() + full.exceptAll(inc).count()
      assert(diff == 0, s"incremental diverged from the union rebuild by $diff rows")
      // the far triangle stayed OUTSIDE the ball — the frozen-label reuse
      // is substantive, not a disguised full recompute
      val ballSet = ball.collect().map(_.getLong(0)).toSet
      assert(Set(41L, 42L, 43L).forall(n => !ballSet.contains(n)),
        s"far component leaked into the ball: $ballSet")
      // and the delta genuinely propagated ≥ 2 hops from its endpoints
      val baseMap = packed.select(col("node"), col("l4").as("label"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val incMap = inc.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(incMap(5L) != baseMap(5L) || incMap(6L) != baseMap(6L),
        "delta failed to propagate beyond the endpoint's direct neighborhood")
    } finally spark.catalog.clearCache()
  }

  test("g19: incremental LPA == full union rebuild on the fixture; registered query == restricted summary") {
    try {
      val basePairs = Graph.weightedPartEdges(spark, sf)
      val baseWe = basePairs.select(col("u").as("src"), col("v").as("dst"), col("w"))
        .unionByName(basePairs.select(col("v").as("src"), col("u").as("dst"), col("w")))
        .cache()
      // fresh frozen state off the fact tables — bypasses artifact AND
      // memo (the r12 vacuous-gate rule)
      val packed = Graph.packLpaRounds(Graph.lpaRoundLabels(baseWe, 4))
      val delta = Graph.weightedDeltaPairs(spark, sf).cache()
      assert(delta.count() > 0, "fixture delta is empty — the gate would be vacuous")
      assert(delta.join(basePairs, Seq("u", "v"), "left_semi").count() == 0,
        "delta violates the append contract (overlaps the base)")
      val unionWe = baseWe.unionByName(
        delta.select(col("u").as("src"), col("v").as("dst"), col("w"))
          .unionByName(delta.select(col("v").as("src"), col("u").as("dst"), col("w"))))
        .cache()
      val deltaNodes = delta.select(col("u").as("node"))
        .unionByName(delta.select(col("v").as("node"))).distinct()
      val (inc0, ball) = Graph.incrementalLpaLabels(unionWe, packed, 4, deltaNodes)
      val inc = inc0.cache()
      val full = Graph.lpaOn(unionWe, 4).cache()
      val diff = inc.exceptAll(full).count() + full.exceptAll(inc).count()
      assert(diff == 0, s"incremental diverged from the union rebuild by $diff rows")
      val touched = full.join(broadcast(ball), Seq("node"), "left_semi")
        .select(col("label")).distinct()
      val expected = full.join(broadcast(touched), Seq("label"), "left_semi")
        .groupBy(col("label").as("community"))
        .agg(count(lit(1)).as("n_nodes"), sum(col("node")).as("node_sum"))
      val got = Graph.g19IncrementalLpa(spark, sf)
      val gDiff = got.exceptAll(expected).count() + expected.exceptAll(got).count()
      assert(gDiff == 0, s"g19 diverged from the restricted rebuild summary by $gDiff rows")
      assert(got.count() > 0)
    } finally spark.catalog.clearCache()
  }

  test("g20: crafted community-move — incremental modularity == full recompute over the union") {
    def bi(pairs: Seq[(Long, Long, Long)]) =
      pairs.flatMap { case (u, v, w) => Seq((u, v, w), (v, u, w)) }
        .toDF("src", "dst", "w")
    try {
      val basePairs = Seq((1L, 2L, 1L), (2L, 3L, 1L), (3L, 4L, 1L),
        (4L, 5L, 1L), (5L, 6L, 1L),
        (41L, 42L, 1L), (42L, 43L, 1L), (41L, 43L, 1L))
      val baseWe = bi(basePairs).cache()
      val packed = Graph.packLpaRounds(Graph.lpaRoundLabels(baseWe, 4))
      // frozen statistics off the base labelling (the sharedModularityStats
      // derivation, inline so the spec bypasses every memo)
      val l4 = packed.select(col("node"), col("l4").as("label"))
      val lw = baseWe
        .join(l4.select(col("node").as("_s"), col("label").as("cs")),
          col("src") === col("_s"))
        .join(l4.select(col("node").as("_d"), col("label").as("cd")),
          col("dst") === col("_d"))
        .select(col("w"), col("cs"), col("cd")).cache()
      val baseTot = lw.groupBy(col("cs").as("label")).agg(sum(col("w")).as("k"))
      val sums = lw.agg(sum(col("w")),
        sum(when(col("cs") === col("cd"), col("w")).otherwise(lit(0L))))
        .collect().head
      val deltaDf = Seq((3L, 100L, 10L), (200L, 201L, 1L)).toDF("u", "v", "w")
      val unionWe = bi(basePairs ++ Seq((3L, 100L, 10L), (200L, 201L, 1L))).cache()
      val deltaNodes = Seq(3L, 100L, 200L, 201L).toDF("node")
      val (updated0, ball) = Graph.incrementalLpaLabels(unionWe, packed, 4, deltaNodes)
      val updated = updated0.cache()
      val got = Graph.incrementalModularity(baseWe, packed, deltaDf, updated,
        ball, baseTot, sums.getLong(0), sums.getLong(1)).collect()
      val expected = Graph.modularityOn(unionWe, Graph.lpaOn(unionWe, 4)).collect()
      assert(got.toSeq == expected.toSeq,
        s"incremental Q ${got.toSeq} != rebuild Q ${expected.toSeq}")
    } finally spark.catalog.clearCache()
  }

  test("g20: incremental modularity == full recompute on the fixture; registered query agrees") {
    try {
      val basePairs = Graph.weightedPartEdges(spark, sf)
      val baseWe = basePairs.select(col("u").as("src"), col("v").as("dst"), col("w"))
        .unionByName(basePairs.select(col("v").as("src"), col("u").as("dst"), col("w")))
        .cache()
      val packed = Graph.packLpaRounds(Graph.lpaRoundLabels(baseWe, 4))
      val l4 = packed.select(col("node"), col("l4").as("label"))
      val lw = baseWe
        .join(l4.select(col("node").as("_s"), col("label").as("cs")),
          col("src") === col("_s"))
        .join(l4.select(col("node").as("_d"), col("label").as("cd")),
          col("dst") === col("_d"))
        .select(col("w"), col("cs"), col("cd")).cache()
      val baseTot = lw.groupBy(col("cs").as("label")).agg(sum(col("w")).as("k"))
      val sums = lw.agg(sum(col("w")),
        sum(when(col("cs") === col("cd"), col("w")).otherwise(lit(0L))))
        .collect().head
      val delta = Graph.weightedDeltaPairs(spark, sf).cache()
      val unionWe = baseWe.unionByName(
        delta.select(col("u").as("src"), col("v").as("dst"), col("w"))
          .unionByName(delta.select(col("v").as("src"), col("u").as("dst"), col("w"))))
        .cache()
      val deltaNodes = delta.select(col("u").as("node"))
        .unionByName(delta.select(col("v").as("node"))).distinct()
      val (updated0, ball) = Graph.incrementalLpaLabels(unionWe, packed, 4, deltaNodes)
      val updated = updated0.cache()
      val got = Graph.incrementalModularity(baseWe, packed, delta, updated,
        ball, baseTot, sums.getLong(0), sums.getLong(1)).collect()
      val expected = Graph.modularityOn(unionWe, Graph.lpaOn(unionWe, 4)).collect()
      assert(got.toSeq == expected.toSeq,
        s"incremental Q ${got.toSeq} != rebuild Q ${expected.toSeq}")
      val reg = Graph.g20IncrementalModularity(spark, sf).collect()
      assert(reg.toSeq == expected.toSeq,
        s"registered g20 ${reg.toSeq} != rebuild ${expected.toSeq}")
    } finally spark.catalog.clearCache()
  }

  test("g21/g22 engine: crafted improvements — patched distances == bounded-round rebuild, new reach, untouched component") {
    def bi(pairs: Seq[(Long, Long, Long)]) =
      pairs.flatMap { case (u, v, w) => Seq((u, v, w), (v, u, w)) }
        .toDF("src", "dst", "w")
    try {
      // base: weighted path 0-1-2-3-4-5 (w=10); 4 bounded rounds reach
      // node 4 (dist 40), node 5 stays UNREACHED (5 edges > 4 rounds);
      // far pair {100,101} unreachable from root on both sides
      val basePairs = Seq((0L, 1L, 10L), (1L, 2L, 10L), (2L, 3L, 10L),
        (3L, 4L, 10L), (4L, 5L, 10L), (100L, 101L, 10L))
      val baseWe = bi(basePairs).cache()
      val packed = Graph.packSsspRounds(Graph.ssspRoundDists(baseWe, 4))
      // delta: shortcut (0, 3) w=5 — improves 3/2/4 and makes 5 REACHABLE
      // within the round budget (0-3-4-5 = 3 edges)
      val unionWe = bi(basePairs ++ Seq((0L, 3L, 5L))).cache()
      val deltaNodes = Seq(0L, 3L).toDF("node")
      val (inc0, ball) = Graph.incrementalSsspDists(unionWe, packed, 4, deltaNodes)
      val inc = inc0.cache()
      val full = Graph.ssspOn(unionWe, 4).cache()
      val diff = inc.exceptAll(full).count() + full.exceptAll(inc).count()
      assert(diff == 0, s"incremental diverged from the union rebuild by $diff rows")
      val m = inc.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(m == Map(0L -> 0L, 1L -> 10L, 2L -> 15L, 3L -> 5L, 4L -> 15L, 5L -> 25L),
        s"patched distances wrong: $m")
      // the far component never entered the ball and never appears
      val ballSet = ball.collect().map(_.getLong(0)).toSet
      assert(!ballSet.contains(100L) && !ballSet.contains(101L))
      // unit-weight instance = BFS levels: delta (0,4) re-levels 3/4/5
      val ubase = bi(basePairs.map { case (u, v, _) => (u, v, 1L) })
      val upacked = Graph.packSsspRounds(Graph.ssspRoundDists(ubase, 4))
      val uUnion = bi(basePairs.map { case (u, v, _) => (u, v, 1L) } ++ Seq((0L, 4L, 1L)))
      val (uinc0, _) = Graph.incrementalSsspDists(uUnion, upacked, 4, Seq(0L, 4L).toDF("node"))
      val uinc = uinc0.cache()
      val ufull = Graph.ssspOn(uUnion, 4).cache()
      assert(uinc.exceptAll(ufull).count() + ufull.exceptAll(uinc).count() == 0)
      val um = uinc.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(um(4L) == 1L && um(5L) == 2L && um(3L) == 2L, s"unit levels wrong: $um")
    } finally spark.catalog.clearCache()
  }

  test("g21/g22 fixture: incremental == full bounded-round recompute over the union; g22 improvement real") {
    try {
      val delta = Graph.purchaseDeltaPairs(spark, sf).cache()
      assert(delta.count() > 0, "fixture delta is empty — the gates would be vacuous")
      // delta honors the append contract and the existing-nodes contract
      val ord = Tables.orders(spark, sf).select(col("o_orderkey"), col("o_custkey"))
      val li = Tables.lineitem(spark, sf).select(col("l_orderkey"), col("l_suppkey"))
      val basePairs = li.join(ord, li("l_orderkey") === ord("o_orderkey"))
        .select((col("o_custkey").cast("long") * 2).as("a"),
          (col("l_suppkey").cast("long") * 2 + 1).as("b")).distinct().cache()
      assert(delta.join(basePairs, Seq("a", "b"), "left_semi").count() == 0)
      // g21: BFS levels == bfsLevelsOn over the union (fresh, memo-bypassing)
      val unionBi = basePairs.select(col("a").as("src"), col("b").as("dst"))
        .unionByName(basePairs.select(col("b").as("src"), col("a").as("dst")))
        .unionByName(delta.select(col("a").as("src"), col("b").as("dst")))
        .unionByName(delta.select(col("b").as("src"), col("a").as("dst")))
        .cache()
      val expectedBfs = Graph.bfsLevelsOn(unionBi, 4)
      val gotBfs = Graph.g21IncrementalBfs(spark, sf)
      assert(gotBfs.exceptAll(expectedBfs).count() +
        expectedBfs.exceptAll(gotBfs).count() == 0,
        "g21 diverged from the union BFS rebuild")
      // NOTE: the purchase graph is BIPARTITE with diameter ~2 at every
      // SF, so a (customer, supplier) delta can never IMPROVE a level on
      // this fixture — the hash gate still kills corruption bugs, and the
      // crafted test above pins the improvement path; the SSSP twin's
      // improvement IS fixture-real (cheap w=2 edges re-route weights).
      val unionWe = Graph.weightedEdges(spark, sf)
        .unionByName(delta.select(col("a").as("src"), col("b").as("dst"), lit(2L).as("w"))
          .unionByName(delta.select(col("b").as("src"), col("a").as("dst"), lit(2L).as("w"))))
        .cache()
      val expectedSssp = Graph.ssspOn(unionWe, 4)
        .orderBy(col("dist_w"), col("node")).limit(100).cache()
      val gotSssp = Graph.g22IncrementalSssp(spark, sf).cache()
      assert(gotSssp.exceptAll(expectedSssp).count() +
        expectedSssp.exceptAll(gotSssp).count() == 0,
        "g22 diverged from the union SSSP rebuild")
      // and the delta genuinely moved distances vs the base top-100
      val baseTop = Graph.ssspOn(Graph.weightedEdges(spark, sf), 4)
        .orderBy(col("dist_w"), col("node")).limit(100)
      assert(gotSssp.exceptAll(baseTop).count() > 0,
        "g22's delta improved nothing — the gate is vacuous")
    } finally spark.catalog.clearCache()
  }

  test("g05 gate: append==rebuild, delete==rebuild-without, compact is pure layout") {
    try {
      val rows = Graph.g05EdgeLifecycleGate(spark, sf).collect()
      assert(rows.length == 1)
      assert(rows.head.getLong(0) > 0)
      assert(rows.head.getBoolean(1), "appended index drifted from a full rebuild")
      assert(rows.head.getBoolean(2), "post-delete index drifted from rebuild-without")
      assert(rows.head.getBoolean(3), "compaction changed the edge set")
      // layout: the gate ends with a compaction — exactly one file/bucket.
      // Guard on the table being non-empty: in an out-of-alphabetical
      // targeted run, EmptyInputSpec may have rebuilt graft_g05_lc from
      // EMPTY tables after the memoized sf body ran (empty buckets write
      // no files — the documented <= rule), so 0 files is the empty
      // artifact, not a compaction defect.
      if (spark.table("graft_g05_lc_edges").count() > 0) {
        val loc = new org.apache.hadoop.fs.Path(
          spark.conf.get("spark.sql.warehouse.dir"), "graft_g05_lc_edges")
        val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val parts = fs.listStatus(loc)
          .count(st => st.isFile && st.getPath.getName.startsWith("part-"))
        assert(parts == 8, s"expected one file per bucket after compact, got $parts")
      }
    } finally spark.catalog.clearCache()
  }

  /** Plain-Scala reference for the g23/g24 engine: level-synchronous
    * multi-source BFS with path counts, then the backward continuation
    * recurrence g(v) = Σ_{u ∈ DAG-succ(v)} (g(u) + 1) — the t28
    * double-implementation pattern. Returns ((seed, node) → (dist,
    * sigma), node → stress). */
  private def refCentrality(bi: Seq[(Long, Long)], seeds: Seq[Long],
      rounds: Int): (Map[(Long, Long), (Long, Long)], Map[Long, Long]) = {
    val adj = bi.groupBy(_._1).map { case (n, es) => n -> es.map(_._2) }
    var acc = seeds.map(s => (s, s) -> (0L, 1L)).toMap
    var frontier = acc
    for (k <- 1 to rounds if frontier.nonEmpty) {
      val cand = frontier.toSeq
        .flatMap { case ((sd, n), (_, sg)) =>
          adj.getOrElse(n, Nil).map(m => (sd, m) -> sg) }
        .groupBy(_._1).map { case (kk, vs) => kk -> vs.map(_._2).sum }
        .filter { case (kk, _) => !acc.contains(kk) }
      frontier = cand.map { case (kk, sg) => kk -> (k.toLong, sg) }
      acc = acc ++ frontier
    }
    var g = Map.empty[(Long, Long), Long]
    for (k <- (rounds - 1) to 1 by -1) {
      val contrib = acc.toSeq
        .collect { case ((sd, u), (d, _)) if d == k + 1 => (sd, u) }
        .flatMap { case (sd, u) =>
          val gu = g.getOrElse((sd, u), 0L)
          adj.getOrElse(u, Nil).map(v => (sd, v) -> (gu + 1L)) }
        .groupBy(_._1).map { case (kk, vs) => kk -> vs.map(_._2).sum }
        .filter { case ((sd, v), _) => acc.get((sd, v)).exists(_._1 == k) }
      g = g ++ contrib
    }
    val stress = acc.toSeq
      .collect { case ((sd, n), (d, sg)) if d >= 1 =>
        n -> sg * g.getOrElse((sd, n), 0L) }
      .groupBy(_._1).map { case (n, vs) => n -> vs.map(_._2).sum }
      .filter(_._2 > 0)
    (acc, stress)
  }

  test("g23/g24 engine: msBfsCounts sigma and stressOn match the reference (diamond, deep tail, disconnected)") {
    // diamond 1-2-4 / 1-3-4 (sigma(4) = 2 from seed 1), tail 4-5-6 (6
    // beyond the 3-round horizon from seed 1), pair 10-11 unreachable
    val und = Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L), (4L, 5L),
      (5L, 6L), (10L, 11L))
    val biSeq = und ++ und.map { case (a, b) => (b, a) }
    val bi = biSeq.toDF("src", "dst")
    val seeds = Seq(1L, 2L)
    val (refAcc, refStress) = refCentrality(biSeq, seeds, 3)
    try {
      val acc = Graph.msBfsCounts(bi, seeds, 3)
      val gotAcc = acc.collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
        .toMap
      assert(gotAcc == refAcc)
      // hand-pinned diamond sigma and horizon cut
      assert(gotAcc((1L, 4L)) == (2L, 2L), "two shortest 1->4 paths")
      assert(!gotAcc.contains((1L, 6L)), "node 6 is beyond seed 1's horizon")
      assert(!gotAcc.contains((1L, 10L)), "disconnected pair leaked in")
      val gotStress = Graph.stressOn(bi, acc, 3).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(gotStress == refStress)
      // hand-computed: seed 1 routes 2 paths through 4 to 5 (g = 1,
      // sigma = 2); seed 2 routes 3 continuations through 4 (1->3 via
      // inner, 5 and 5->6 via tail) — total stress(4) = 2 + 3 = 5
      assert(gotStress(4L) == 5L)
      // harmonic profile arithmetic (the g23 rollup) on the same acc:
      // h12 per node over seeds {1, 2} at dists {1,2,3} -> 12/6/4
      val prof = acc.filter(col("dist") >= 1)
        .groupBy(col("node"))
        .agg(sum(expr("12 div dist")).as("h12"))
        .groupBy(col("h12"))
        .agg(count(lit(1)).cast("long").as("n_nodes"),
          sum(col("node")).as("node_sum"))
        .orderBy(col("h12"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      assert(prof.toSeq == Seq((4L, 1L, 6L), (10L, 1L, 5L),
        (12L, 2L, 3L), (18L, 2L, 7L)))
    } finally spark.catalog.clearCache()
  }

  test("g25 engine: bounded-round Katz matches plain-Scala walk counts with geometric weights") {
    // walks, not paths: revisits COUNT (contrast msBfsCounts' first-visit)
    val biSeq = (undirected ++ undirected.map { case (a, b) => (b, a) })
    val adj = biSeq.groupBy(_._1).map { case (n, es) => n -> es.map(_._2) }
    var x: Map[Long, Long] = adj.keys.map(_ -> 1L).toMap
    var expect = Map.empty[Long, Long].withDefaultValue(0L)
    for (k <- 1 to 4) {
      x = x.toSeq.flatMap { case (u, c) => adj(u).map(_ -> c) }
        .groupBy(_._1).map { case (v, vs) => v -> vs.map(_._2).sum }
      val w = math.pow(8.0, (4 - k).toDouble).toLong
      x.foreach { case (v, c) => expect = expect.updated(v, expect(v) + w * c) }
    }
    try {
      // route through the registered query's arithmetic but over the
      // small graph: replicate g25's loop on a local frame
      var xf = biSeq.toDF("src", "dst").select(col("src").as("node")).distinct()
        .select(col("node"), lit(1L).as("x")).localCheckpoint(true)
      var terms = List.empty[org.apache.spark.sql.DataFrame]
      for (k <- 1 to 4) {
        xf = Graph.katzRound(biSeq.toDF("src", "dst"), xf).localCheckpoint(true)
        val w = math.pow(8.0, (4 - k).toDouble).toLong
        terms = xf.select(col("node"), (col("x") * lit(w)).as("t")) :: terms
      }
      val got = terms.reduce(_ unionAll _)
        .groupBy(col("node")).agg(sum(col("t")).as("katz_e"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expect.toMap, s"got $got expected $expect")
      // hand-pin the hub: node 3 (degree 4) dominates walk counts
      assert(got.maxBy(v => (v._2, -v._1))._1 == 3L)
    } finally spark.catalog.clearCache()
  }

  test("g26 engine: bounded-round HITS matches plain-Scala mutual reinforcement on a crafted digraph") {
    // customers 0,2,4 -> suppliers 1,3,5: 0 and 2 share degree 2, but
    // 0 buys from the two well-bought suppliers (1,3) while 2's basket
    // includes the single-buyer supplier 5 — HITS must rank
    // hub(0) > hub(2) > hub(4), which raw degree cannot
    val fwd = Seq((0L, 1L), (0L, 3L), (2L, 3L), (2L, 5L), (4L, 1L))
    var hub: Map[Long, Long] = fwd.map(_._1).distinct.map(_ -> 1L).toMap
    var auth = Map.empty[Long, Long]
    for (_ <- 1 to 2) {
      auth = fwd.groupBy(_._2).map { case (s, es) =>
        s -> es.map(e => hub(e._1)).sum }
      hub = fwd.groupBy(_._1).map { case (c, es) =>
        c -> es.map(e => auth(e._2)).sum }
    }
    try {
      val bi = (fwd ++ fwd.map { case (a, b) => (b, a) }).toDF("src", "dst")
      val fwdDf = bi.filter($"src" % 2 === 0)
      val revDf = bi.filter($"src" % 2 === 1)
      var h = fwdDf.select($"src".as("node")).distinct()
        .select($"node", lit(1L).as("x")).localCheckpoint(true)
      var a = h.limit(0)
      for (_ <- 1 to 2) {
        a = Graph.katzRound(fwdDf, h).localCheckpoint(true)
        h = Graph.katzRound(revDf, a).localCheckpoint(true)
      }
      val gotH = h.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val gotA = a.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(gotH == hub, s"hubs: got $gotH expected $hub")
      assert(gotA == auth, s"auths: got $gotA expected $auth")
      assert(gotH(0L) > gotH(2L) && gotH(2L) > gotH(4L),
        "mutual reinforcement failed to separate equal-degree hubs")
    } finally spark.catalog.clearCache()
  }

  test("g27 engine: assortativity matches an exact BigInt Pearson on crafted graphs") {
    // star (hubs connect to leaves only -> strongly disassortative) and
    // a near-regular graph; reference in exact BigInt, e9-scaled with
    // the same floor-div-by-offset arithmetic
    def ref(und: Seq[(Long, Long)]): (Long, Option[Long]) = {
      val bi = und ++ und.map { case (a, b) => (b, a) }
      val deg = bi.groupBy(_._1).map { case (n, es) => n -> BigInt(es.size) }
      val m = BigInt(bi.size)
      val sjk = bi.map { case (u, v) => deg(u) * deg(v) }.sum
      val sj = bi.map { case (u, _) => deg(u) }.sum
      val sj2 = bi.map { case (u, _) => deg(u) * deg(u) }.sum
      val num = m * sjk - sj * sj
      val den = m * sj2 - sj * sj
      val r = if (m > 0 && den > 0)
        Some((((num + den) * BigInt(1000000000)) / den - BigInt(1000000000)).toLong)
      else None
      (m.toLong, r)
    }
    def run(und: Seq[(Long, Long)]): (Long, Option[Long]) = {
      val bi = (und ++ und.map { case (a, b) => (b, a) }).toDF("src", "dst")
      val deg = bi.groupBy($"src").agg(count(lit(1)).as("d")).cache()
      val row = bi
        .join(deg.select($"src", $"d".as("dj")), Seq("src"))
        .join(deg.select($"src".as("dst"), $"d".as("dk")), Seq("dst"))
        .agg(count(lit(1)).as("m0"),
          sum($"dj".cast("decimal(38,0)") * $"dk").as("sjk"),
          sum($"dj".cast("decimal(38,0)")).as("sj"),
          sum($"dj".cast("decimal(38,0)") * $"dj").as("sj2"))
        .select($"m0".cast("long"),
          expr("""CASE WHEN m0 > 0
                    AND CAST(m0 AS DECIMAL(38,0)) * sj2 - sj * sj > 0
                  THEN CAST(
                    ((CAST(m0 AS DECIMAL(38,0)) * sjk - sj * sj)
                     + (CAST(m0 AS DECIMAL(38,0)) * sj2 - sj * sj))
                    * 1000000000
                    div (CAST(m0 AS DECIMAL(38,0)) * sj2 - sj * sj)
                    - 1000000000 AS BIGINT)
                  ELSE NULL END"""))
        .collect().head
      (row.getLong(0), if (row.isNullAt(1)) None else Some(row.getLong(1)))
    }
    val star = (1L to 6L).map(i => (0L, i))
    val mixed = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L))
    val triangle = Seq((1L, 2L), (2L, 3L), (1L, 3L)) // regular -> zero variance
    try {
      for (g <- Seq(star, mixed, triangle)) {
        val e = ref(g); val got = run(g)
        assert(got == e, s"graph $g: got $got expected $e")
      }
      assert(ref(star)._2.get == -1000000000L,
        "star must be exactly maximally disassortative (r = -1)")
      assert(ref(triangle)._2.isEmpty, "regular graph must yield NULL")
    } finally spark.catalog.clearCache()
  }

  test("g26/g27 fixture: hubs separate beyond degree ties at sf > 0.001; r_e9 within [-1e9, 1e9]") {
    try {
      val rows = Graph.g26HitsCentrality(spark, sf).collect()
      val kinds = rows.map(_.getString(0)).distinct.sorted
      assert(kinds.sameElements(Array("auth", "hub")))
      val within = rows.groupBy(_.getString(0)).forall { case (_, rs) =>
        val s = rs.map(r => (-r.getLong(2), r.getLong(1)))
        s.sameElements(s.sorted)
      }
      assert(within, "per-kind (score desc, node) order broken")
      val a = Graph.g27Assortativity(spark, sf).collect()
      assert(a.length == 1 && a.head.getLong(0) > 0)
      assert(!a.head.isNullAt(1) &&
        math.abs(a.head.getLong(1)) <= 1000000000L,
        "fixture assortativity outside [-1, 1] or NULL")
    } finally spark.catalog.clearCache()
  }

  test("g28 engine: link prediction matches a plain-Scala reference; hub cap and non-edge filter pinned") {
    // reference: capped-center wedge counts over distinct both-direction
    // adjacency, non-edges only, integer jaccard, the exact output order
    def ref(und: Seq[(Long, Long)]): Seq[(Long, Long, Long, Long)] = {
      val bi = (und ++ und.map { case (a, b) => (b, a) }).distinct
      val adj = bi.groupBy(_._1).map { case (n, es) => n -> es.map(_._2).toSet }
      val deg = adj.map { case (n, s) => n -> s.size.toLong }
      val edges = bi.toSet
      val cands = for {
        (_, nbrs) <- adj.toSeq if nbrs.size <= 64
        u <- nbrs.toSeq; v <- nbrs.toSeq if u < v
      } yield (u, v)
      cands.groupBy(identity).toSeq
        .map { case ((u, v), ws) => (u, v, ws.size.toLong) }
        .filter { case (u, v, _) => !edges((u, v)) }
        .map { case (u, v, cn) =>
          (u, v, cn, cn * 1000000L / (deg(u) + deg(v) - cn)) }
        .sortBy { case (u, v, cn, j) => (-j, -cn, u, v) }
        .take(100)
    }
    def run(und: Seq[(Long, Long)]): Seq[(Long, Long, Long, Long)] = {
      val bi = (und ++ und.map { case (a, b) => (b, a) }).toDF("src", "dst")
      try Graph.linkPredictionOn(bi).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSeq
      finally spark.catalog.clearCache()
    }
    val path = Seq((1L, 2L), (2L, 3L))
    val square = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))
    val triPendant = Seq((1L, 2L), (2L, 3L), (1L, 3L), (4L, 1L))
    val bigStar = (1L to 65L).map(i => (0L, i))   // center OVER the cap
    val okStar = (1L to 64L).map(i => (0L, i))    // center AT the cap
    val mesh = for {
      i <- 1L to 30L; j <- (i + 1) to 30L if (i * 7 + j * 11) % 5 == 0
    } yield (i, j)
    for (g <- Seq(path, square, triPendant, bigStar, okStar, mesh))
      assert(run(g) == ref(g), s"graph head ${g.take(4)}...")
    // hand-pins: the path predicts its endpoints at jaccard 1; the
    // square predicts exactly its diagonals (cn = 2); the pendant is
    // predicted into the triangle while the real edge (2,3) never
    // surfaces; the over-cap star generates NOTHING (its only wedge
    // center is excluded) while the at-cap star ranks 64·63/2 pairs
    assert(run(path) == Seq((1L, 3L, 1L, 1000000L)))
    assert(run(square).toSet ==
      Set((1L, 3L, 2L, 1000000L), (2L, 4L, 2L, 1000000L)))
    assert(run(triPendant).map(t => (t._1, t._2)).toSet ==
      Set((2L, 4L), (3L, 4L)))
    assert(run(bigStar).isEmpty)
    assert(run(okStar).length == 100)
  }

  test("g28 fixture: predicted pairs are genuine non-edges with real common neighbors") {
    try {
      val rows = Graph.g28LinkPrediction(spark, sf).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      assert(rows.nonEmpty)
      assert(rows.forall { case (u, v, cn, j) => u < v && cn >= 1 && j > 0 })
      assert(rows.toSeq == rows.toSeq.sortBy { case (u, v, cn, j) => (-j, -cn, u, v) })
      // no predicted pair may be an existing thresholded edge
      val es = Graph.weightedPartEdges(spark, sf)
        .select($"u", $"v").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(rows.forall { case (u, v, _, _) => !es((u, v)) })
    } finally spark.catalog.clearCache()
  }

  test("g23/g24 fixture: profile partitions the reached set; stress is a positive total order") {
    try {
      val prof = Graph.g23HarmonicCentrality(spark, sf).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      assert(prof.nonEmpty)
      assert(prof.map(_._1).toSeq == prof.map(_._1).sorted.toSeq)
      assert(prof.map(_._1).distinct.length == prof.length)
      assert(prof.forall(_._2 > 0), "empty profile bucket emitted")
      val st = Graph.g24StressCentrality(spark, sf).collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      assert(st.length == 100)
      assert(st.forall(_._2 > 0))
      assert(st.toSeq == st.toSeq.sortBy { case (n, v) => (-v, n) })
    } finally spark.catalog.clearCache()
  }
}
