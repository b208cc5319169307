package graft.similarity

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** Product quantization (PQ) — the compression tier of the ANN family
  * (IVF prunes WHERE to look; PQ shrinks WHAT is scanned): each vector is
  * split into `m` subvectors, each quantized to one of `k` per-subspace
  * centroids, so a 64-dim float vector becomes `m` small codes (m=8, k=16:
  * 8 half-bytes — a 64× compression), and a query scores candidates with
  * table lookups instead of float loops (ADC — asymmetric distance
  * computation).
  *
  * Scale shape: codebooks are tiny driver state (m × k × subDim doubles)
  * shipped into codegen as reference objects; encoding is `m` fused
  * argmin expressions per row (one pass, no shuffle); an ADC scan reads
  * only the code column — at 100 TB the scan-for-candidates touches ~1/60th
  * of the bytes the raw vectors would cost — and the exact rerank touches
  * only the top candidates' full vectors.
  *
  * Determinism: the training sample is keyed-order (identical under any
  * partitioning), Lloyd iterations are fixed-count and seeded, and the L2
  * argmin reuses the codegen'd max-dot kernel via the augmented-dimension
  * trick — argmin ‖v−c‖² = argmax (v·c − ‖c‖²/2) = max-dot of [v,1] against
  * [c, −‖c‖²/2] — with a deterministic first-wins tie-break.
  */
object Pq {

  /** centroids(j)(c) is the subDim-length centroid c of subspace j. */
  case class Codebooks(subDim: Int, centroids: Array[Array[Array[Double]]]) {
    def m: Int = centroids.length
    def k: Int = centroids.head.length
  }

  /** Deterministic per-subspace Lloyd on a keyed-order driver sample (same
    * sampling contract as [[Ivf.fit]]). Plain L2 k-means per subspace — PQ
    * reconstructs raw subvectors, so centroids are NOT normalized. */
  def fit(
      emb: DataFrame,
      vecCol: String,
      m: Int = 8,
      k: Int = 16,
      iters: Int = 3,
      seed: Long = 42L,
      maxSample: Int = 4096): Codebooks = {
    val rows = emb.select(col(vecCol), xxhash64(col(vecCol)).as("__h"))
      .orderBy("__h")
      .limit(maxSample)
      .select(vecCol)
      .collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    require(rows.nonEmpty, "empty embedding table")
    val dim = rows.head.length
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val subDim = dim / m
    val rnd = new scala.util.Random(seed)
    val sample = rnd.shuffle(rows.toVector)
    val books = (0 until m).map { j =>
      val subs = sample.map(v => java.util.Arrays.copyOfRange(v, j * subDim, (j + 1) * subDim))
      var cents = subs.take(k).toArray
      for (_ <- 1 to iters) {
        val sums = Array.fill(cents.length)(new Array[Double](subDim))
        val counts = new Array[Int](cents.length)
        subs.foreach { v =>
          var best = 0; var bestD = Double.MaxValue
          for (c <- cents.indices) {
            var d = 0.0
            for (i <- 0 until subDim) { val t = v(i) - cents(c)(i); d += t * t }
            if (d < bestD) { bestD = d; best = c }
          }
          counts(best) += 1
          for (i <- 0 until subDim) sums(best)(i) += v(i)
        }
        cents = cents.indices.map { c =>
          if (counts(c) == 0) cents(c) else sums(c).map(_ / counts(c))
        }.toArray
      }
      cents
    }.toArray
    Codebooks(subDim, books)
  }

  /** Subspace-j centroids lifted for the augmented max-dot = L2-argmin
    * trick. */
  private def augmented(cb: Codebooks, j: Int): Array[Array[Double]] =
    cb.centroids(j).map(c => c :+ (-0.5 * c.map(x => x * x).sum))

  /** Adds the `code` column (array of m small ints): per subspace, the
    * codegen'd nearest-centroid kernel over the augmented subvector. */
  def encode(emb: DataFrame, vecCol: String, cb: Codebooks): DataFrame =
    emb.withColumn("code", array((0 until cb.m).map { j =>
      GraftFunctions.nearestCentroid(
        concat(
          slice(col(vecCol), j * cb.subDim + 1, cb.subDim),
          array(lit(1.0f))),
        augmented(cb, j))
    }: _*))

  /** ADC approximate cosine of the encoded vector against `query`: the
    * query's per-subspace dot/norm tables are computed once on the driver
    * and the per-row score is m literal-array lookups (codegen'd), no float
    * loops over the original vector. */
  def adcCosineCol(cb: Codebooks, query: Array[Float]): Column = {
    val q = query.map(_.toDouble)
    val qNorm = math.sqrt(q.map(x => x * x).sum)
    val dotT: Seq[Seq[Double]] = (0 until cb.m).map { j =>
      cb.centroids(j).map { c =>
        (0 until cb.subDim).map(i => q(j * cb.subDim + i) * c(i)).sum
      }.toSeq
    }
    val normT: Seq[Seq[Double]] = (0 until cb.m).map { j =>
      cb.centroids(j).map(c => c.map(x => x * x).sum).toSeq
    }
    def lookup(t: Seq[Seq[Double]], j: Int): Column =
      element_at(typedLit(t(j)), element_at(col("code"), j + 1) + 1)
    val approxDot = (0 until cb.m).map(lookup(dotT, _)).reduce(_ + _)
    val approxNormSq = (0 until cb.m).map(lookup(normT, _)).reduce(_ + _)
    approxDot / (lit(qNorm) * sqrt(approxNormSq))
  }

  /** Top-k: ADC scan ranks candidates from codes alone; everything scoring
    * at least the (k × rerankFactor)-th best approximate score is re-scored
    * exactly (fused cosine) and the true top k returned.
    *
    * The cutoff is a SCORE threshold, not a row limit: PQ codes collide by
    * design (that is the compression), so a row-limit with an id tiebreak
    * could silently evict a true match that ties the cutoff — with the
    * threshold, every row as good as the N-th best survives to the rerank.
    * The threshold itself costs one TakeOrdered over the code-only scan
    * (a scalar to the driver, same class as the quantizer sample). */
  def topK(
      spark: SparkSession,
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      cb: Codebooks,
      query: Array[Float],
      k: Int,
      rerankFactor: Int = 8): DataFrame = {
    val scored = encode(emb, vecCol, cb)
      .withColumn("approx", adcCosineCol(cb, query))
    val cutRow = scored.select(col("approx"))
      .orderBy(col("approx").desc)
      .limit(k * rerankFactor)
      .agg(min(col("approx")))
      .head()
    val base = if (cutRow.isNullAt(0)) scored
      else scored.filter(col("approx") >= cutRow.getDouble(0))
    base
      .select(col(idCol), Ann.cosineCol(spark, col(vecCol), query).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol))
      .limit(k)
  }
}
