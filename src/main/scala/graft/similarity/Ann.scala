package graft.similarity

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions

/** Similarity search over an embedding column (array<float>).
  *
  *  - [[bruteForceTopK]]: exact cosine top-k against a query vector — one
  *    linear scan, no shuffle until the final TakeOrdered(k). The correctness
  *    baseline, and perfectly scalable as a map-side scan.
  *  - [[exactTopKReproducible]]: same, but with decimal-exact accumulation so
  *    the scores are bit-identical across engines (oracle-checkable).
  *  - [[lshTopK]]: random-hyperplane bucketed variant — the 100 TB path.
  *    Candidates = vectors whose bucket signature is within `probes` Hamming
  *    bits of the query's signature (multi-probe), recall-verified exactly.
  */
object Ann {

  /** Fused-loop cosine (custom codegen expression) — the fast path. */
  def cosineCol(spark: SparkSession, vec: Column, query: Array[Float]): Column =
    GraftFunctions.cosine(spark, vec, typedLit(query.toSeq).cast("array<float>"))

  def bruteForceTopK(
      spark: SparkSession,
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      query: Array[Float],
      k: Int): DataFrame =
    emb.select(col(idCol), cosineCol(spark, col(vecCol), query).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol))
      .limit(k)

  /** Exact-reproducible scoring: per-element double products floored at
    * scale 15 and summed as exact longs (order-independent, IEEE-only ops —
    * see Exact.floorAvg for the rationale), so two engines compute identical
    * score bits. Fused codegen'd kernel (CosineFloorSimilarity). */
  def reproducibleCosine(vec: Column, query: Array[Double]): Column =
    GraftFunctions.cosineFloor(
      vec, typedLit(query.map(_.toFloat).toSeq).cast("array<float>"))

  def exactTopKReproducible(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      query: Array[Double],
      k: Int): DataFrame =
    emb.select(col(idCol), reproducibleCosine(col(vecCol), query).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol))
      .limit(k)

  /** Deterministic hyperplane set for signature hashing. */
  def hyperplanes(bits: Int, dim: Int, seed: Long = 42L): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(bits)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** Fused codegen'd signature (HyperplaneSigExpr): one planes × dim loop per
    * row. The previous per-bit aggregate(zip_with(...)) composition ran
    * interpreted — higher-order functions never enter codegen — and cost
    * bits × dim closure calls per row. Bit semantics and accumulation order
    * are identical (ascending i, dot >= 0 sets bit b). */
  def signature(vec: Column, planes: Array[Array[Double]]): Column =
    GraftFunctions.hyperplaneSig(vec, planes)

  /** ANN top-k: candidates within `probes` signature bits of the query,
    * reranked by exact cosine. At scale the signature is computed once per
    * vector (a map-side scan) and the candidate filter prunes the rerank to
    * a small fraction of the corpus. */
  def lshTopK(
      spark: SparkSession,
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      query: Array[Float],
      k: Int,
      bits: Int = 16,
      probes: Int = 3,
      seed: Long = 42L): DataFrame = {
    val dim = query.length
    val planes = hyperplanes(bits, dim, seed)
    // query signature, computed driver-side with the same arithmetic
    val qSig = planes.zipWithIndex.map { case (p, b) =>
      val dot = p.indices.map(i => query(i).toDouble * p(i)).sum
      if (dot >= 0) 1L << b else 0L
    }.sum
    emb
      .withColumn("sig", signature(col(vecCol), planes))
      .filter(bit_count(col("sig").bitwiseXOR(lit(qSig))) <= probes)
      .select(col(idCol), cosineCol(spark, col(vecCol), query).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol))
      .limit(k)
  }
}
