package graft.similarity

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.{GraftFunctions, HashUtil}
import graft.queries.Corpus

/** q_ann7: int8-quantized cosine — quantization domain, scoring parity,
  * codegen/interpreted agreement, and recall against the exact ranking. */
class Int8AnnSpec extends SparkSpec {
  import spark.implicits._

  private val d = "/root/testdata/sf0.001"

  private def vec(xs: Double*): Array[Float] = xs.map(_.toFloat).toArray

  test("driver quantization stays in the int8 domain and is sign-exact") {
    val q = HashUtil.int8Quantize(vec(0.5, -1.0, 0.25, 0))
    assert(q === Array(64L, -127L, 32L, 0L))
    assert(q.forall(x => x >= -127 && x <= 127))
    assert(HashUtil.int8Quantize(vec(0, 0, 0)) === Array(0L, 0L, 0L))
  }

  test("self-similarity is ~1, opposite is ~-1, zero vector hits the sentinel") {
    val q = HashUtil.int8Quantize(vec(0.3, -0.7, 0.2))
    val qn = q.map(x => x * x).sum
    val rows = Seq(
      (0L, vec(0.3, -0.7, 0.2)),
      (1L, vec(-0.3, 0.7, -0.2)),
      (2L, vec(0, 0, 0))
    ).toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
      .select(col("vec_id"), GraftFunctions.int8Cosine(col("embedding"), q, qn).as("c"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(rows(0L) - 1.0) < 1e-3)
    assert(math.abs(rows(1L) + 1.0) < 1e-3)
    assert(rows(2L) === -2.0)
  }

  test("codegen and interpreted paths agree bit-for-bit") {
    val emb = graft.Tables.embeddings(spark, d).limit(200)
    val q = HashUtil.int8Quantize(
      graft.Tables.embeddings(spark, d).filter(col("vec_id") === 0)
        .select("embedding").head.getSeq[Float](0).toArray)
    val qn = q.map(x => x * x).sum
    def run(mode: String): Seq[(Long, Double)] = {
      spark.conf.set("spark.sql.codegen.factoryMode", mode)
      try emb.select(col("vec_id"), GraftFunctions.int8Cosine(col("embedding"), q, qn).as("c"))
        .collect().toSeq.map(r => (r.getLong(0), r.getDouble(1)))
      finally spark.conf.unset("spark.sql.codegen.factoryMode")
    }
    assert(run("CODEGEN_ONLY") === run("NO_CODEGEN"))
  }

  test("ranking plan is scan -> codegen kernel -> TakeOrdered, no shuffle") {
    val plan = Corpus.annInt8TopK(spark, d).queryExecution.executedPlan
    val unwrapped = plan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.initialPlan
      case p => p
    }
    assert(unwrapped.collect {
      case t: org.apache.spark.sql.execution.TakeOrderedAndProjectExec => t
    }.nonEmpty, "expected TakeOrderedAndProject (per-partition heaps + driver merge)")
    assert(unwrapped.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }.isEmpty, "int8 scan must not shuffle — the kernel is map-side")
  }

  test("non-float input fails at analysis with a clear error") {
    val bad = Seq((1L, Seq(0.5, 0.25))).toDF("vec_id", "embedding") // array<double>
    val ex = intercept[org.apache.spark.sql.AnalysisException] {
      bad.select(GraftFunctions.int8Cosine(col("embedding"), Array(1L, 2L), 5L)).collect()
    }
    assert(ex.getMessage.contains("graft_int8_cosine requires array<float>"))
  }

  test("int8 ranking recalls the exact top-20 almost perfectly") {
    val exact = Corpus.annCosineTopK(spark, d).select("vec_id").as[Long].collect().toSet
    val quant = Corpus.annInt8TopK(spark, d).select("vec_id").as[Long].collect().toSet
    val overlap = (exact & quant).size
    assert(overlap >= 16, s"int8 top-20 recalled only $overlap/20 of the exact top-20")
  }
}
