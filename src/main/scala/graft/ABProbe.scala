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
