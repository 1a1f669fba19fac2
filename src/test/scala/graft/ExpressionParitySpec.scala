package graft

import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions, VectorFunctions}

/** Interpreted-vs-codegen parity for the native expressions: every
  * custom Expression has two implementations (nullSafeEval and
  * doGenCode) and Spark silently falls back between them — a divergence
  * would surface as nondeterministic results depending on plan shape.
  * This spec runs the same inputs through both paths and requires
  * bit-identical outputs.
  */
class ExpressionParitySpec extends SparkSpec {
  import spark.implicits._

  private def bothModes[A](f: => A): (A, A) = {
    spark.conf.set("spark.sql.codegen.wholeStage", "true")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    val gen = f
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    val interp = f
    spark.conf.unset("spark.sql.codegen.wholeStage")
    spark.conf.unset("spark.sql.codegen.factoryMode")
    (gen, interp)
  }

  test("VectorDot: codegen == interpreted (incl. float and double inputs)") {
    val (gen, interp) = bothModes {
      Tables.embeddings(spark, sf).limit(100)
        .select($"vec_id",
          VectorFunctions.dot($"embedding", $"embedding").as("f"),
          VectorFunctions.dot(VectorFunctions.toDouble($"embedding"),
            VectorFunctions.toDouble($"embedding")).as("d"))
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSeq
    }
    assert(gen == interp)
  }

  test("MinHashSignature: codegen == interpreted (incl. empty input)") {
    val (gen, interp) = bothModes {
      Seq(Seq(1L, 2L, 3L), Seq(42L), Seq.empty[Long]).toDF("hs")
        .select(TextFunctions.minhashSignature($"hs", 32).as("sig"))
        .collect().map(_.getSeq[Long](0).toList).toList
    }
    assert(gen == interp)
    assert(gen(2) == List.fill(32)(Long.MaxValue)) // empty-doc convention
  }

  test("SimHash64: codegen == interpreted == staged HoF formulation") {
    val data = Seq(Seq(1L, 2L, 3L, -9L), Seq(42L), Seq.empty[Long])
    val (gen, interp) = bothModes {
      data.toDF("th")
        .select(TextFunctions.simhash64Native($"th").as("sim"))
        .collect().map(_.getLong(0)).toList
    }
    assert(gen == interp)
    assert(gen(2) == 0L) // empty-doc convention: no bits set
    // the native expression must be bit-identical to the composed
    // reference formulation it replaced in d02
    val hof = data.toDF("th")
      .select(TextFunctions.simhashFromCounts(
        TextFunctions.simhashCounts($"th")).as("sim"))
      .collect().map(_.getLong(0)).toList
    assert(gen == hof)
  }

  test("SrpSignature: codegen == interpreted; floats == pre-cast doubles") {
    val (gen, interp) = bothModes {
      Tables.embeddings(spark, sf).limit(50)
        .select($"vec_id",
          VectorFunctions.srpSig($"embedding").as("f"),
          VectorFunctions.srpSig(VectorFunctions.toDouble($"embedding")).as("d"))
        .collect()
        .map(r => (r.getLong(0), r.getSeq[Long](1).toList, r.getSeq[Long](2).toList))
        .toSeq
    }
    assert(gen == interp)
    // float input pre-widened to double must yield the same signature
    gen.foreach { case (_, f, d) => assert(f == d) }
    gen.foreach { case (_, f, _) => assert(f.length == 2) }
  }

  test("CentroidDistances: codegen == interpreted == compositional l2Sq") {
    val cents = Seq(Array(0.0, 1.0, -0.5, 2.0), Array(1.0, 1.0, 1.0, 1.0))
    val data = Seq(Seq(0.5, 1.0, -0.5, 2.0), Seq(0.0, 0.0, 0.0, 0.0)).toDF("emb")
    val (gen, interp) = bothModes {
      data.select(VectorFunctions.centroidDists($"emb", cents).as("d2s"))
        .collect().map(_.getSeq[Double](0).toList).toList
    }
    assert(gen == interp)
    // bit-identical to the (a·a − 2·(a·b)) + (b·b) composition it replaced
    val composed = data.select(array(cents.map(c =>
        VectorFunctions.l2Sq($"emb", typedLit(c.toSeq))): _*).as("d2s"))
      .collect().map(_.getSeq[Double](0).toList).toList
    assert(gen == composed)
  }

  test("ShingleHashes: codegen == interpreted (incl. short input)") {
    val (gen, interp) = bothModes {
      Seq(Seq(1L, 2L, 3L, 4L, 5L), Seq(1L, 2L), Seq.empty[Long]).toDF("th")
        .select(TextFunctions.shingleHashesNative($"th", 3).as("sh"))
        .collect().map(_.getSeq[Long](0).toList).toList
    }
    assert(gen == interp)
    assert(gen(0).length == 3 && gen(1).isEmpty && gen(2).isEmpty)
  }
}
