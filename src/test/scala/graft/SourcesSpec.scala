package graft

import java.nio.file.Files

import org.apache.spark.sql.functions.col

/** Source/sink surface (SURVEY.md §2 Part B "Scans/sources" and
  * "Sinks/connectors"): parquet, ORC, JSON, CSV round trips plus
  * partitioned layout with partition pruning.
  */
class SourcesSpec extends SparkSpec {

  private lazy val docs = Tables.documents(spark, sf)
  private def tmp(): String =
    Files.createTempDirectory("graft-sources").toString

  private def roundTrip(format: String): Unit = {
    val dir = s"${tmp()}/$format"
    docs.write.format(format).mode("overwrite").save(dir)
    val back = spark.read.format(format)
      .options(if (format == "csv") Map("header" -> "true", "inferSchema" -> "true") else Map.empty[String, String])
      .load(dir)
    assert(back.count() == docs.count(), s"$format round trip lost rows")
    val a = docs.select("doc_id", "lang").orderBy("doc_id").collect().map(_.toString)
    val b = back.select("doc_id", "lang").orderBy("doc_id").collect().map(_.toString)
    assert(a.sameElements(b), s"$format round trip altered data")
  }

  test("parquet round trip")(roundTrip("parquet"))
  test("orc round trip")(roundTrip("orc"))
  test("json round trip")(roundTrip("json"))
  test("csv round trip with header") {
    val dir = s"${tmp()}/csv"
    docs.write.format("csv").option("header", "true").mode("overwrite").save(dir)
    val back = spark.read.format("csv").option("header", "true").option("inferSchema", "true").load(dir)
    assert(back.count() == docs.count())
  }

  test("partitioned write prunes partitions on read") {
    val dir = s"${tmp()}/part"
    docs.write.partitionBy("lang").mode("overwrite").parquet(dir)
    val pruned = spark.read.parquet(dir).filter(col("lang") === "de")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(lang"), plan)
    val expected = docs.filter(col("lang") === "de").count()
    assert(pruned.count() == expected)
  }
}
