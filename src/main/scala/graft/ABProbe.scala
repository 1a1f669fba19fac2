// One-JVM interleaved A/B probe (the r11 rule: on a loud host, never
// compare two absolute runs — alternate both shapes in one JVM and read
// the ratio). Dev tool for optimization rounds; experiments are edited
// in place per investigation and driven as:
//   SPARK_GRAFT_SF_DIR=... runMain graft.ABProbe <experiment> <reps>
package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

object ABProbe {
  def main(args: Array[String]): Unit = {
    val exp = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .appName("abprobe").config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config(Tables.nanosFlag, "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(label: String, mk: () => DataFrame): Double = {
      val t0 = System.nanoTime()
      mk().write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      println(f"AB $label $dt%.2f s")
      dt
    }

    val variants: Seq[(String, () => DataFrame)] = exp match {
      case "q84" =>
        val cols = Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber")
        def li = Tables.lineitem(spark, sfDir)
        def exactMulti = li.agg(
          countDistinct(col(cols.head)).cast("long").as(cols.head + "__exact"),
          cols.tail.map(c => countDistinct(col(c)).cast("long").as(s"${c}__exact")): _*)
        def exactSplit = cols.map(c =>
            li.agg(countDistinct(col(c)).cast("long").as(s"${c}__exact")))
          .reduce(_ crossJoin _)
        Seq("old_multi" -> (() => exactMulti), "new_split" -> (() => exactSplit))
      case "q82" =>
        val cols = Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_qty_i")
        def li = Tables.lineitem(spark, sfDir)
          .withColumn("l_qty_i", floor(col("l_quantity")).cast("long"))
        def aggsFor(c: String) = Seq(
          count(col(c)).as(s"${c}__n"),
          sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls"),
          min(col(c)).cast("long").as(s"${c}__min"),
          max(col(c)).cast("long").as(s"${c}__max"))
        def oldShape = {
          val aggs = cols.flatMap(c => aggsFor(c) :+
            countDistinct(col(c)).cast("long").as(s"${c}__distinct"))
          li.agg(aggs.head, aggs.tail: _*)
        }
        def newShape = {
          val base = cols.flatMap(aggsFor)
          val one = li.agg(base.head, base.tail: _*)
          cols.map(c => li.agg(countDistinct(col(c)).cast("long")
              .as(s"${c}__distinct")))
            .foldLeft(one)(_ crossJoin _)
        }
        Seq("old_multi" -> (() => oldShape), "new_split" -> (() => newShape))
      case "t34pii" =>
        val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
        val Ipv4Re = """\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"""
        val PhoneRe = """\b\d{3}-\d{3}-\d{4}\b"""
        val BlockRe = """\b(customer|dup)\b"""
        def docs = Tables.documents(spark, sfDir)
        def oldGate = docs.filter(
            call_function("regexp_count", col("text"), lit(EmailRe)) +
            call_function("regexp_count", col("text"), lit(Ipv4Re)) +
            call_function("regexp_count", col("text"), lit(PhoneRe)) +
            call_function("regexp_count", col("text"), lit(BlockRe)) === 0)
          .select(col("doc_id"))
        def newGate = docs.filter(
            !(col("text").rlike(EmailRe) || col("text").rlike(Ipv4Re) ||
              col("text").rlike(PhoneRe) || col("text").rlike(BlockRe)))
          .select(col("doc_id"))
        Seq("old_count4" -> (() => oldGate), "new_rlike" -> (() => newGate))
      case "g24" =>
        import graft.operators.Graph
        val rounds = 3
        def bi = spark.table(Graph.sharedCooccurIndex(spark, sfDir) + "_edges")
        def acc = Graph.sharedCentralityAcc(spark, sfDir)
        // the pre-r15 stressOn shape (2 checkpoints + a semi-join per level)
        def oldShape = {
          val accF = acc
          def level(k: Int) = accF.filter(col("dist") === k.toLong)
          var gPrev = level(rounds)
            .select(col("seed"), col("node"), lit(0L).as("g"))
          var gs = List.empty[DataFrame]
          var k = rounds - 1
          while (k >= 1) {
            val b = bi
            val cand = b.join(gPrev, b("src") === gPrev("node"))
              .select(gPrev("seed").as("seed"), b("dst").as("node"),
                (gPrev("g") + lit(1L)).as("t"))
              .groupBy(col("seed"), col("node"))
              .agg(sum(col("t")).as("g"))
            val gk = cand
              .join(level(k).select(col("seed"), col("node")),
                Seq("seed", "node"), "left_semi")
              .localCheckpoint(true)
            gs = gk :: gs
            gPrev = level(k).select(col("seed"), col("node"))
              .join(gk, Seq("seed", "node"), "left")
              .select(col("seed"), col("node"),
                coalesce(col("g"), lit(0L)).as("g"))
              .localCheckpoint(true)
            k -= 1
          }
          val gg = gs.reduce(_ unionAll _)
          accF.filter(col("dist") >= 1)
            .join(gg, Seq("seed", "node"), "left")
            .select(col("node"),
              (col("sigma") * coalesce(col("g"), lit(0L))).as("t"))
            .groupBy(col("node")).agg(sum(col("t")).as("stress"))
            .filter(col("stress") > 0)
            .orderBy(col("stress").desc, col("node")).limit(100)
        }
        Seq("old_2jobs" -> (() => oldShape),
          "new_1job" -> (() => Graph.g24StressCentrality(spark, sfDir)))
      case "grounds" =>
        // eager per-round localCheckpoint (pre-r15) vs the lazy one-job
        // collapse now in Graph for g09/g25/g26/g24 — all interleaved
        // in one JVM so the ratios survive host weather
        import graft.operators.Graph
        val E12 = 1000000000000L
        def oldG09 = {
          val name = Graph.sharedWeightedEdgeIndex(spark, sfDir)
          val we = spark.table(name + "_edges")
          val seeds = we.filter(col("src") % 2 === 0)
            .select(col("src").as("node")).distinct()
            .orderBy(col("node")).limit(3)
          val wd = we.groupBy(col("src")).agg(sum(col("w")).as("tw")).cache()
          val sd = seeds.select(col("node")).distinct()
            .withColumn("_seed", lit(1L)).cache()
          val ns = sd.count()
          val base = (15L * E12) / (100L * ns)
          val nodes = wd.select(col("src").as("node"))
          def withBase(inSums: DataFrame): DataFrame = nodes
            .join(inSums, Seq("node"), "left")
            .join(broadcast(sd), Seq("node"), "left")
            .select(col("node"),
              (when(col("_seed").isNotNull, lit(base)).otherwise(lit(0L))
                + coalesce(col("in_sum"), lit(0L))).cast("long").as("rank_e12"))
          var ranks = nodes.join(broadcast(sd), Seq("node"), "left")
            .select(col("node"),
              when(col("_seed").isNotNull, lit(E12 / ns)).otherwise(lit(0L))
                .as("rank_e12"))
            .localCheckpoint(true)
          for (_ <- 1 to 5)
            ranks = withBase(Graph.pprInSums(we, wd, ranks)).localCheckpoint(true)
          ranks.orderBy(col("rank_e12").desc, col("node")).limit(100)
        }
        def oldG25 = {
          val bi = spark.table(Graph.sharedCooccurIndex(spark, sfDir) + "_edges")
          var x = bi.select(col("src").as("node")).distinct()
            .select(col("node"), lit(1L).as("x"))
            .localCheckpoint(true)
          var weighted = List.empty[DataFrame]
          for (k <- 1 to 4) {
            x = Graph.katzRound(bi, x).localCheckpoint(true)
            val w = math.pow(8.0, (4 - k).toDouble).toLong
            weighted = x.select(col("node"), (col("x") * lit(w)).as("t")) :: weighted
          }
          weighted.reduce(_ unionAll _)
            .groupBy(col("node")).agg(sum(col("t")).as("katz_e"))
            .orderBy(col("katz_e").desc, col("node")).limit(100)
        }
        def oldG26 = {
          val t = spark.table(Graph.sharedEdgeIndex(spark, sfDir) + "_edges")
          val fwd = t.filter(col("src") % 2 === 0)
          val rev = t.filter(col("src") % 2 === 1)
          var hub = fwd.select(col("src").as("node")).distinct()
            .select(col("node"), lit(1L).as("x")).localCheckpoint(true)
          var auth = hub.limit(0)
          for (_ <- 1 to 2) {
            auth = Graph.katzRound(fwd, hub).localCheckpoint(true)
            hub = Graph.katzRound(rev, auth).localCheckpoint(true)
          }
          def top(df: DataFrame, kind: String) = df
            .orderBy(col("x").desc, col("node")).limit(50)
            .select(lit(kind).as("kind"), col("node"), col("x").as("score"))
          top(hub, "hub").unionAll(top(auth, "auth"))
            .orderBy(col("kind"), col("score").desc, col("node"))
        }
        def oldG24 = {
          val bi = spark.table(Graph.sharedCooccurIndex(spark, sfDir) + "_edges")
          val acc = Graph.sharedCentralityAcc(spark, sfDir)
          val rounds = 3
          def level(k: Int) = acc.filter(col("dist") === k.toLong)
          var gPrev = level(rounds)
            .select(col("seed"), col("node"), lit(0L).as("g"))
          var gs = List.empty[DataFrame]
          var k = rounds - 1
          while (k >= 1) {
            val cand = bi.join(gPrev, bi("src") === gPrev("node"))
              .select(gPrev("seed").as("seed"), bi("dst").as("node"),
                (gPrev("g") + lit(1L)).as("t"))
              .groupBy(col("seed"), col("node"))
              .agg(sum(col("t")).as("g"))
            gPrev = level(k).select(col("seed"), col("node"))
              .join(cand, Seq("seed", "node"), "left")
              .select(col("seed"), col("node"),
                coalesce(col("g"), lit(0L)).as("g"))
              .localCheckpoint(true)
            gs = gPrev :: gs
            k -= 1
          }
          val gg = gs.reduce(_ unionAll _)
          acc.filter(col("dist") >= 1)
            .join(gg, Seq("seed", "node"), "left")
            .select(col("node"),
              (col("sigma") * coalesce(col("g"), lit(0L))).as("t"))
            .groupBy(col("node")).agg(sum(col("t")).as("stress"))
            .filter(col("stress") > 0)
            .orderBy(col("stress").desc, col("node")).limit(100)
        }
        Seq(
          "old_g09" -> (() => oldG09),
          "new_g09" -> (() => Graph.g09PersonalizedPageRank(spark, sfDir)),
          "old_g25" -> (() => oldG25),
          "new_g25" -> (() => Graph.g25KatzCentrality(spark, sfDir)),
          "old_g26" -> (() => oldG26),
          "new_g26" -> (() => Graph.g26HitsCentrality(spark, sfDir)),
          "old_g24" -> (() => oldG24),
          "new_g24" -> (() => Graph.g24StressCentrality(spark, sfDir)))
      case "batch3" =>
        // g06 eager-checkpoint vs lazy-cache rounds; t30/t34 single
        // staged tokenize pass vs the re-tokenizing shapes
        import graft.operators.{Graph, TextAnalysis}
        import graft.functions.TextFunctions.{tokens, shingles}
        val E12 = 1000000000000L
        def oldG06 = {
          val de = spark.table(Graph.sharedEdgeIndex(spark, sfDir) + "_edges")
            .filter(col("src") % 2 === 0)
          val outCnt = de.groupBy(col("src")).agg(count(lit(1)).as("od"))
          val deg = de.select(col("src").as("node"))
            .union(de.select(col("dst").as("node"))).distinct()
            .join(outCnt.select(col("src").as("node"), col("od")), Seq("node"), "left")
            .select(col("node"), coalesce(col("od"), lit(0L)).as("outdeg"))
            .cache()
          val n = deg.count()
          val base = (15L * E12) / (100L * n)
          var ranks = deg.select(col("node"), lit(E12 / n).as("rank_e12"))
            .localCheckpoint(true)
          for (_ <- 1 to 5) {
            val inSums = Graph.directedInSums(de, deg, ranks)
            val dang = ranks.alias("r")
              .join(deg.filter(col("outdeg") === 0).alias("d"),
                col("r.node") === col("d.node"))
              .agg(expr(s"(85 * coalesce(sum(r.rank_e12), 0)) div (100 * $n)")
                .as("dang"))
            ranks = deg.select(col("node"))
              .join(inSums, Seq("node"), "left")
              .crossJoin(broadcast(dang))
              .select(col("node"),
                (lit(base) + coalesce(col("in_sum"), lit(0L)) + col("dang"))
                  .cast("long").as("rank_e12"))
              .localCheckpoint(true)
          }
          ranks.orderBy(col("rank_e12").desc, col("node")).limit(100)
        }
        def oldDup3(docs: DataFrame) = {
          val g3 = docs.select(col("doc_id"), tokens(col("text")).as("toks"))
            .select(col("doc_id"), posexplode(shingles(col("toks"), 3)))
            .toDF("doc_id", "start", "g")
            .cache()
          val dup3 = g3.groupBy(col("doc_id"), col("g"))
            .agg(count(lit(1)).as("n")).filter(col("n") >= 2)
            .select(col("doc_id"), col("g"))
          g3.join(dup3, Seq("doc_id", "g"), "left_semi")
            .select(col("doc_id"),
              explode(sequence(col("start"), col("start") + 2)).as("p"))
            .distinct()
            .groupBy(col("doc_id")).agg(count(lit(1)).as("cov"))
        }
        def oldT30 = {
          val docs = Tables.documents(spark, sfDir)
          val base = docs
            .select(col("doc_id"), tokens(col("text")).as("toks"),
              length(col("text")).cast("long").as("n_chars"))
            .withColumn("n_words", size(col("toks")).cast("long"))
          val g2 = base.select(col("doc_id"), explode(shingles(col("toks"), 2)).as("g"))
            .groupBy(col("doc_id"), col("g")).agg(count(lit(1)).as("n"))
          val top2 = g2
            .withColumn("k", concat(
              lpad((lit(99999999L) - least(col("n"), lit(99999999L))).cast("string"), 8, "0"),
              col("g")))
            .groupBy(col("doc_id")).agg(min(col("k")).as("k"))
            .select(col("doc_id"),
              expr("substring(k, 9)").as("top2_gram"),
              (lit(99999999L) - expr("CAST(substring(k, 1, 8) AS BIGINT)")).as("top2_n"))
          val cov = oldDup3(docs)
          base.select(col("doc_id"), col("n_words"), col("n_chars"))
            .join(top2, Seq("doc_id"), "left")
            .join(cov, Seq("doc_id"), "left")
            .select(col("doc_id"), col("n_words"),
              coalesce(col("top2_gram"), lit("")).as("top2_gram"),
              coalesce(col("top2_n"), lit(0L)).as("top2_n"),
              when(col("top2_n").isNotNull && col("n_chars") > 0,
                expr("(length(top2_gram) * top2_n * 1000000) div n_chars"))
                .otherwise(lit(0L)).as("top2_char_frac_e6"),
              when(col("n_words") > 0,
                expr("(coalesce(cov, 0) * 1000000) div n_words"))
                .otherwise(lit(0L)).as("dup3_cov_frac_e6"))
            .orderBy("doc_id")
        }
        val EmailReL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
        val Ipv4ReL = """\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"""
        val PhoneReL = """\b\d{3}-\d{3}-\d{4}\b"""
        val BlockReL = """\b(customer|dup)\b"""
        def piiGate = Tables.documents(spark, sfDir).filter(
          !(col("text").rlike(EmailReL) || col("text").rlike(Ipv4ReL) ||
            col("text").rlike(PhoneReL) || col("text").rlike(BlockReL)))
        def oldT34g = {
          val piiOk = piiGate
            .select(col("doc_id"), col("source"), col("text"),
              size(tokens(col("text"))).cast("long").as("n_toks"))
          piiOk
            .join(oldDup3(piiOk.select(col("doc_id"), col("text"))), Seq("doc_id"), "left")
            .filter(coalesce(col("cov"), lit(0L)) * 2 < col("n_toks"))
            .drop("cov")
        }
        def newT34g = {
          val piiOk = piiGate
            .select(col("doc_id"), col("source"), col("text"),
              tokens(col("text")).as("toks"))
            .withColumn("n_toks", size(col("toks")).cast("long"))
            .cache()
          piiOk
            .join(TextAnalysis.dup3CoverageToks(piiOk.select(col("doc_id"), col("toks"))),
              Seq("doc_id"), "left")
            .filter(coalesce(col("cov"), lit(0L)) * 2 < col("n_toks"))
            .drop("cov", "toks")
        }
        Seq(
          "old_g06" -> (() => oldG06),
          "new_g06" -> (() => Graph.g06PageRankDirected(spark, sfDir)),
          "old_t30" -> (() => oldT30),
          "new_t30" -> (() => TextAnalysis.t30GopherRepetition(spark, sfDir)),
          "old_t34g" -> (() => oldT34g),
          "new_t34g" -> (() => newT34g))
      case "lpa" =>
        // pre-r15 lpaOn (eager per-round checkpoint + stability count)
        // vs the lazy one-job unroll now in Graph, through g14 and g15
        import graft.operators.Graph
        def oldLpaOn(we: DataFrame) = Graph.lpaRoundLabels(we, 4).last
        def oldG14 = {
          val we = spark.table(
            Graph.sharedWeightedCooccurIndex(spark, sfDir) + "_edges")
          oldLpaOn(we)
            .groupBy(col("label").as("community"))
            .agg(count(lit(1)).as("n_nodes"), sum(col("node")).as("node_sum"))
            .orderBy(col("community"))
        }
        def oldG15 = {
          val we = spark.table(
            Graph.sharedWeightedCooccurIndex(spark, sfDir) + "_edges")
          Graph.modularityOn(we, oldLpaOn(we))
        }
        Seq(
          "old_g14" -> (() => oldG14),
          "new_g14" -> (() => Graph.g14LpaCommunities(spark, sfDir)),
          "old_g15" -> (() => oldG15),
          "new_g15" -> (() => Graph.g15Modularity(spark, sfDir)))
      case "textcache" =>
        // t39/t51 staged-tokenize caches vs the re-tokenizing shapes
        import graft.operators.TextAnalysis
        import graft.functions.TextFunctions.{tokens, shingles}
        def t39Leg(staged: Boolean) = {
          val corpusT0 = Tables.documents(spark, sfDir).filter(col("doc_id") >= 10)
            .select(col("doc_id"), tokens(col("text")).as("toks"))
          val corpusT = if (staged) corpusT0.cache() else corpusT0
          val qTerms = Tables.documents(spark, sfDir).filter(col("doc_id") < 10)
            .select(col("doc_id").as("query_id"),
              explode(array_distinct(tokens(col("text")))).as("term"))
          val n = corpusT.select(count(lit(1)).cast("double").as("nd"),
            avg(size(col("toks")).cast("double")).as("avgdl"))
          val tf0 = corpusT.select(col("doc_id"), explode(col("toks")).as("term"))
            .join(broadcast(qTerms.select(col("term")).distinct()), Seq("term"), "left_semi")
          val tf = if (staged) tf0.cache() else tf0
          val c = tf.groupBy(col("doc_id"), col("term"))
            .agg(count(lit(1)).cast("double").as("c"))
          val dlen = corpusT.select(col("doc_id"), size(col("toks")).cast("double").as("dl"))
          val dfT = tf.distinct().groupBy(col("term")).agg(count(lit(1)).cast("double").as("df"))
          broadcast(qTerms).join(c, Seq("term"))
            .join(dlen, "doc_id").join(broadcast(dfT), "term")
            .crossJoin(broadcast(n))
            .select(col("query_id"), col("doc_id"),
              col("c") * col("dl") * col("nd") * col("df") * col("avgdl"))
        }
        def oldT51 = {
          val t = Tables.documents(spark, sfDir).select(tokens(col("text")).as("toks"))
          val uc = t.select(explode(col("toks")).as("w"))
            .groupBy(col("w")).agg(count(lit(1)).as("c"))
          val n = uc.agg(sum(col("c")).cast("long").as("n_tok"))
          val pairs = t.select(explode(shingles(col("toks"), 2)).as("bigram"))
            .groupBy(col("bigram")).agg(count(lit(1)).as("n_pair"))
            .filter(col("n_pair") >= 5)
            .select(split(col("bigram"), " ").as("ws"), col("n_pair"))
            .select(element_at(col("ws"), 1).as("w1"),
              element_at(col("ws"), 2).as("w2"), col("n_pair"))
          pairs
            .join(uc.select(col("w").as("w1"), col("c").as("c1")), "w1")
            .join(uc.select(col("w").as("w2"), col("c").as("c2")), "w2")
            .crossJoin(broadcast(n))
            .select(col("w1"), col("w2"), col("n_pair"),
              expr("""(CAST(n_pair AS DECIMAL(38,0)) * n_tok * 1000000)
                       div (CAST(c1 AS DECIMAL(38,0)) * c2)""").as("lift_e6"))
            .orderBy(col("lift_e6").desc, col("w1"), col("w2"))
        }
        Seq(
          "old_t39leg" -> (() => t39Leg(staged = false)),
          "new_t39leg" -> (() => t39Leg(staged = true)),
          "old_t51" -> (() => oldT51),
          "new_t51" -> (() => TextAnalysis.t51PmiCollocations(spark, sfDir)))
      case "d09cache" =>
        // cached converted-embedding frame vs per-job re-conversion
        import graft.operators.Dedup
        import graft.functions.VectorFunctions
        def oldD09 = {
          val e = Tables.embeddings(spark, sfDir)
            .select(col("vec_id"), VectorFunctions.toDouble(col("embedding")).as("emb"))
            .withColumn("nrm", VectorFunctions.l2Norm(col("emb")))
          Dedup.ivfNearDupPairs(e, 32, 4, 0.4).orderBy("vec_a", "vec_b")
        }
        Seq(
          "old_d09" -> (() => oldD09),
          "new_d09" -> (() => Dedup.d09EmbedNearDupIvf(spark, sfDir)))
      case "q84hll" =>
        // the HLL++ sketch agg at rsd 0.01 carries 1639 Long buffer
        // slots PER COLUMN (6556 aggregate attributes in one operator —
        // the 438 KB before-plan); DataSketches hll_sketch_agg(lgK=14)
        // keeps ONE binary buffer per column at the same ~0.8% accuracy
        val cols84 = Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber")
        def li84 = Tables.lineitem(spark, sfDir)
        def oldHll = li84.agg(
          approx_count_distinct(col(cols84.head), 0.01).cast("long").as("a"),
          cols84.tail.map(c =>
            approx_count_distinct(col(c), 0.01).cast("long").as(s"${c}__est")): _*)
        def newHll = li84.agg(
          hll_sketch_estimate(hll_sketch_agg(col(cols84.head), lit(14))).as("a"),
          cols84.tail.map(c =>
            hll_sketch_estimate(hll_sketch_agg(col(c), lit(14))).as(s"${c}__est")): _*)
        // accuracy check: DataSketches lgK=14 estimates vs exact at this SF
        val exactRow = li84.agg(
          countDistinct(col(cols84.head)).as("a"),
          cols84.tail.map(c => countDistinct(col(c)).as(s"${c}__x")): _*).collect()(0)
        val dsRow = newHll.collect()(0)
        val ppRow = oldHll.collect()(0)
        cols84.indices.foreach { i =>
          val ex = exactRow.getLong(i); val ds = dsRow.getLong(i); val pp = ppRow.getLong(i)
          println(f"ACC ${cols84(i)} exact=$ex ds14=$ds (${100.0 * (ds - ex) / ex}%.2f%%) hllpp=$pp (${100.0 * (pp - ex) / ex}%.2f%%)")
        }
        Seq("old_hllpp" -> (() => oldHll), "new_datasketch" -> (() => newHll))
      case "mediamicro" =>
        // pure-JVM component timing for the media codecs (no Spark):
        // where does a media row's time actually go?
        import graft.operators.Multimodal
        val ids = (0L until 2000L).map(_ * 3) // png ids
        val jids = ids.map(_ + 1)             // jpeg ids
        def bench(label: String)(f: => Unit): Unit = {
          f // warm
          val t0 = System.nanoTime(); f
          println(f"MICRO $label ${(System.nanoTime() - t0) / 1e6}%.1f ms")
        }
        bench("encode_png")(ids.foreach(Multimodal.encodeImage("png", _)))
        bench("encode_jpeg")(jids.foreach(Multimodal.encodeImage("jpeg", _)))
        val pngs = ids.map(Multimodal.encodeImage("png", _))
        val jpgs = jids.map(Multimodal.encodeImage("jpeg", _))
        bench("decode_png_imageio")(pngs.foreach(b =>
          javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b))))
        bench("decode_jpeg_imageio")(jpgs.foreach(b =>
          javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b))))
        // reused reader per format
        def reusedReader(fmt: String, payloads: Seq[Array[Byte]]): Unit = {
          val r = javax.imageio.ImageIO.getImageReadersByFormatName(fmt).next()
          payloads.foreach { b =>
            val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
              new java.io.ByteArrayInputStream(b))
            r.setInput(iis, true, true)
            r.read(0)
            iis.close()
          }
          r.dispose()
        }
        bench("decode_png_reused")(reusedReader("png", pngs))
        bench("decode_jpeg_reused")(reusedReader("jpeg", jpgs))
        val imgs = pngs.map(b =>
          javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b)))
        println("decoded type: " + imgs.head.getType) // 5 = TYPE_3BYTE_BGR
        bench("pixels_getRGB")(imgs.foreach { img =>
          val (w, h) = (img.getWidth, img.getHeight)
          var s = 0L; var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y)
              s += 299L * ((rgb >> 16) & 0xFF) + 587L * ((rgb >> 8) & 0xFF) +
                114L * (rgb & 0xFF)
              x += 1
            }
            y += 1
          }
          if (s == -1) println("")
        })
        bench("pixels_bulkRGB")(imgs.foreach { img =>
          val (w, h) = (img.getWidth, img.getHeight)
          val buf = img.getRGB(0, 0, w, h, null, 0, w)
          var s = 0L; var i = 0
          while (i < buf.length) {
            val rgb = buf(i)
            s += 299L * ((rgb >> 16) & 0xFF) + 587L * ((rgb >> 8) & 0xFF) +
              114L * (rgb & 0xFF)
            i += 1
          }
          if (s == -1) println("")
        })
        bench("pixels_raster")(imgs.foreach { img =>
          val d = img.getRaster.getDataBuffer
            .asInstanceOf[java.awt.image.DataBufferByte].getData
          var s = 0L; var i = 0
          while (i < d.length) {
            val b = d(i) & 0xFF; val g = d(i + 1) & 0xFF; val r = d(i + 2) & 0xFF
            s += 299L * r + 587L * g + 114L * b
            i += 3
          }
          if (s == -1) println("")
        })
        // encode via REUSED writer + raster bulk fill: must be
        // byte-identical to ImageIO.write of the setRGB-built image
        def encodeReused(fmt: String, idsIn: Seq[Long]): Seq[Array[Byte]] = {
          val w = javax.imageio.ImageIO.getImageWritersByFormatName(fmt).next()
          val out = idsIn.map { id =>
            val (iw, ih) = Multimodal.imageDims(id)
            val img = new java.awt.image.BufferedImage(iw, ih,
              java.awt.image.BufferedImage.TYPE_INT_RGB)
            val data = img.getRaster.getDataBuffer
              .asInstanceOf[java.awt.image.DataBufferInt].getData
            var y = 0
            while (y < ih) {
              var x = 0
              while (x < iw) {
                var m = id * 2654435761L + (x >> 2) * 40503L + (y >> 2) * 65537L
                m ^= m >>> 33; m *= 0xff51afd7ed558ccdL; m ^= m >>> 33
                data(y * iw + x) = (m & 0xFFFFFF).toInt
                x += 1
              }
              y += 1
            }
            val bos = new java.io.ByteArrayOutputStream()
            val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
            w.setOutput(ios)
            w.write(null, new javax.imageio.IIOImage(img, null, null), null)
            ios.close()
            bos.toByteArray
          }
          w.dispose()
          out
        }
        var pngReused: Seq[Array[Byte]] = null
        var jpgReused: Seq[Array[Byte]] = null
        bench("encode_png_reused") { pngReused = encodeReused("png", ids) }
        bench("encode_jpeg_reused") { jpgReused = encodeReused("jpeg", jids) }
        val pngSame = pngs.zip(pngReused).forall { case (a, b) =>
          java.util.Arrays.equals(a, b) }
        val jpgSame = jpgs.zip(jpgReused).forall { case (a, b) =>
          java.util.Arrays.equals(a, b) }
        println(s"BYTE-IDENTICAL png=$pngSame jpeg=$jpgSame")
        spark.stop(); return
      case "g06dang" =>
        // r16: the pre-edit shape — eager localCheckpoint per round with
        // the dangling mass as a 1-row broadcast — vs the registered
        // collect-literal + lazy-cache rounds
        import graft.operators.Graph
        val E12v = 1000000000000L
        def de06 = spark.table(Graph.sharedEdgeIndex(spark, sfDir) + "_edges")
          .filter(col("src") % 2 === 0)
        def oldShape = {
          val de = de06
          val outCnt = de.groupBy(col("src")).agg(count(lit(1)).as("od"))
          val deg = de.select(col("src").as("node"))
            .union(de.select(col("dst").as("node"))).distinct()
            .join(outCnt.select(col("src").as("node"), col("od")), Seq("node"), "left")
            .select(col("node"), coalesce(col("od"), lit(0L)).as("outdeg"))
            .cache()
          val n = deg.count()
          val base = (15L * E12v) / (100L * n)
          var ranks = deg.select(col("node"), lit(E12v / n).as("rank_e12"))
            .localCheckpoint(true)
          for (_ <- 1 to 5) {
            val inSums = Graph.directedInSums(de, deg, ranks)
            val dang = ranks.alias("r")
              .join(deg.filter(col("outdeg") === 0).alias("d"),
                col("r.node") === col("d.node"))
              .agg(expr(s"(85 * coalesce(sum(r.rank_e12), 0)) div (100 * $n)")
                .as("dang"))
            ranks = deg.select(col("node"))
              .join(inSums, Seq("node"), "left")
              .crossJoin(broadcast(dang))
              .select(col("node"),
                (lit(base) + coalesce(col("in_sum"), lit(0L)) + col("dang"))
                  .cast("long").as("rank_e12"))
              .localCheckpoint(true)
          }
          ranks.orderBy(col("rank_e12").desc, col("node")).limit(100)
        }
        Seq("old_ckpt_bcast" -> (() => oldShape),
          "new_collect_lit" -> (() => Graph.g06PageRankDirected(spark, sfDir)))
      case "t34argmax" =>
        // t34's keep-first dedup: min(struct(doc_id, source, n_toks))
        // over groupBy(text) plans a SortAggregate (struct buffers are
        // not hash-aggregable) that sorts the survivor stream; the
        // alternative is min(doc_id) (HashAggregate, doc_id unique so
        // the struct tie-fields never decide) + a join back on doc_id
        // to fetch (source, n_toks).
        def docs34 = Tables.documents(spark, sfDir)
          .select(col("doc_id"), col("source"), col("text"),
            size(graft.functions.TextFunctions.tokens(col("text"))).cast("long").as("n_toks"))
        def keptStruct = docs34
          .groupBy(col("text"))
          .agg(min(struct(col("doc_id"), col("source"), col("n_toks"))).as("r"))
          .select(col("r.source").as("source"), col("r.n_toks").as("n_toks"))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_kept"), sum(col("n_toks")).as("kept_tokens"))
        def keptJoin = {
          val d = docs34
          val keep = d.groupBy(col("text")).agg(min(col("doc_id")).as("doc_id"))
            .select(col("doc_id"))
          d.select(col("doc_id"), col("source"), col("n_toks"))
            .join(keep, Seq("doc_id"), "left_semi")
            .groupBy(col("source"))
            .agg(count(lit(1)).as("n_kept"), sum(col("n_toks")).as("kept_tokens"))
        }
        Seq("old_struct" -> (() => keptStruct), "new_join" -> (() => keptJoin))
      case sc if sc.startsWith("sortcache:") =>
        // r16 batch A: the registered query now stages its pre-sort frame
        // in a query-scoped cache (range-sample double-compute guard).
        // "uncached" clears the CacheManager entry BEFORE execution, so
        // the same plan runs without substitution — byte-identical to the
        // pre-edit shape. Interleaved in one JVM (the r11 rule).
        val q = sc.stripPrefix("sortcache:")
        Seq(
          "new_cached" -> (() => SparkEntry.queries(q)(spark, sfDir)),
          "old_uncached" -> (() => {
            val df = SparkEntry.queries(q)(spark, sfDir)
            spark.catalog.clearCache()
            df
          }))
      case other => sys.error(s"unknown experiment $other")
    }

    // warm-up: run each variant once unrecorded, then interleave reps
    variants.foreach { case (l, mk) => time("warmup_" + l, mk) }
    val acc = collection.mutable.Map.empty[String, List[Double]]
    for (_ <- 1 to reps; (l, mk) <- variants)
      acc(l) = time(l, mk) :: acc.getOrElse(l, Nil)
    for ((l, ts) <- acc.toSeq.sortBy(_._1))
      println(f"AB-SUMMARY $l min=${ts.min}%.2f med=${ts.sorted.apply((ts.size - 1) / 2)}%.2f")
    spark.stop()
  }
}
