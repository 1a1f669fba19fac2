package graft

import java.util.concurrent.ConcurrentLinkedQueue

import scala.concurrent.duration._
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

import graft.core._

/** End-to-end product story: records stream in through the
  * BatchPipeline (the reference's surface), the sink lands batches, and
  * the relational surface analyzes what landed — ingest → analyze on
  * one engine. */
object PipelineIntegrationSpec {
  val landed = new ConcurrentLinkedQueue[(Long, String, Double)]()
}

class PipelineIntegrationSpec extends SparkSpec {
  import PipelineIntegrationSpec._
  import spark.implicits._

  test("ingest through the pipeline, then aggregate what the sink landed") {
    landed.clear()
    val cfg = PipelineConfig(name = "integration", maxBatchSize = 128,
      numWorkers = 2, flushInterval = 100.millis)
    val p = BatchPipeline[(Long, String, Double)](spark, cfg,
      FlusherFactory(() => new Flusher[(Long, String, Double)] {
        def flush(b: Seq[(Long, String, Double)], c: FlushContext): Unit =
          b.foreach(landed.add)
      }))
    p.start()
    val input = (1 to 5000).map(i => (i.toLong, s"type${i % 5}", i * 1.5))
    p.putAll(input)
    p.flush()
    p.stop()

    // analyze the landed data with the relational surface
    val df = landed.asScala.toSeq.toDF("id", "etype", "value")
    val agg = df.groupBy($"etype")
      .agg(count(lit(1)).as("n"), round(sum($"value"), 2).as("total"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // oracle: direct computation over the input
    val expect = input.groupBy(_._2).map { case (k, vs) =>
      k -> (vs.size.toLong, math.round(vs.map(_._3).sum * 100) / 100.0)
    }
    assert(agg == expect)
  }
}
