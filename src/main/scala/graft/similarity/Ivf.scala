package graft.similarity

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** IVF (inverted-file) ANN index: a small coarse quantizer partitions the
  * corpus into nlist cells; a query probes only its nprobe nearest cells and
  * reranks exactly.
  *
  * Scale shape: the quantizer is tiny driver state (nlist × dim doubles)
  * shipped into codegen as a reference object; cell assignment is one fused
  * map-side expression; the probe is a partition-prunable filter (persist the
  * assigned table partitioned by `cell` and a query touches nprobe/nlist of
  * the data). Centroids come from seeded Lloyd iterations on a driver-side
  * sample — deterministic across runs.
  */
object Ivf {

  case class Index(centroids: Array[Array[Double]])

  private def l2normalize(v: Array[Double]): Array[Double] = {
    val n = math.sqrt(v.map(x => x * x).sum)
    if (n == 0) v else v.map(_ / n)
  }

  /** Deterministic coarse quantizer: seeded sample → Lloyd iterations on the
    * driver (sample ≤ maxSample vectors; the quantizer needs only rough
    * cell shapes). Centroids are L2-normalized so max-dot = cosine-nearest.
    *
    * The sample is the maxSample vectors with the smallest content hash —
    * a keyed order, so the result is identical under any partitioning or
    * file layout (a bare `limit(n)` is partition-order-dependent). The
    * orderBy+limit compiles to TakeOrderedAndProject: a per-partition
    * bounded heap + driver merge, no full sort at corpus scale. */
  def fit(
      emb: DataFrame,
      vecCol: String,
      nlist: Int,
      iters: Int = 3,
      seed: Long = 42L,
      maxSample: Int = 4096): Index = {
    val rows = emb.select(col(vecCol), xxhash64(col(vecCol)).as("__h"))
      .orderBy("__h")
      .limit(maxSample)
      .select(vecCol)
      .collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    require(rows.nonEmpty, "empty embedding table")
    val rnd = new scala.util.Random(seed)
    val sample = rnd.shuffle(rows.toVector)
    var centroids = sample.take(nlist).map(l2normalize).toArray
    for (_ <- 1 to iters) {
      val sums = Array.fill(centroids.length)(new Array[Double](rows.head.length))
      val counts = new Array[Int](centroids.length)
      sample.foreach { v =>
        var best = 0; var bestDot = Double.NegativeInfinity
        for (c <- centroids.indices) {
          var dot = 0.0
          for (i <- v.indices) dot += v(i) * centroids(c)(i)
          if (dot > bestDot) { bestDot = dot; best = c }
        }
        counts(best) += 1
        for (i <- v.indices) sums(best)(i) += v(i)
      }
      centroids = centroids.indices.map { c =>
        if (counts(c) == 0) centroids(c)
        else l2normalize(sums(c).map(_ / counts(c)))
      }.toArray
    }
    Index(centroids)
  }

  /** SQL-REPLAYABLE quantizer fit (the q_dd10b Lloyd discipline applied to
    * the IVF tier): seeds are the `nlist` lowest-id vectors (deterministic
    * init, keyed order — no RNG), then EXACTLY ONE Lloyd update — the
    * round count is part of the oracle contract (the q_ann10/q_r2 DuckDB
    * mirrors unroll one round), so it is fixed here rather than exposed
    * as a knob a caller could silently desynchronize. The update is ONE
    * distributed
    * (cluster, dim)-keyed aggregate whose per-dimension mean uses the
    * floor-quantized construction (Exact.floorAvg(·, 9)), and assignment is
    * the fused floor-quantized-cosine argmax with ties to the smaller
    * cluster index. Updated centroids round-trip through float (an IEEE
    * round-to-nearest cast, identical in any engine), and empty clusters
    * retain their previous centroid — so a SQL oracle can replay the ENTIRE
    * fit bit-for-bit (q_ann10's recall-curve gate does). Rounds-not-data on
    * the driver: per round the collected state is the nlist×dim centroid
    * grid. The sampled-Lloyd [[fit]] stays the serving-tier default (it
    * bounds the fit scan at maxSample); this fit is the evaluation tier's,
    * where oracle-exactness is the point. */
  def fitReplayable(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      nlist: Int): Array[Array[Float]] = {
    val base = emb.select(col(idCol).as("id"), col(vecCol).as("vec"))
    val cents: Array[Array[Float]] =
      base.orderBy("id").limit(nlist).collect()
        .map(_.getSeq[Number](1).map(_.floatValue()).toArray)
    val scored = array(cents.zipWithIndex.map { case (cv, j) =>
      struct(
        GraftFunctions.cosineFloor(col("vec"), typedLit(cv)).as("c"),
        lit(-j).as("neg_j"))
    }: _*)
    val means = base.select(
        (-array_max(scored).getField("neg_j")).cast("int").as("cluster"),
        posexplode(col("vec")))
      .groupBy("cluster", "pos")
      .agg(graft.functions.Exact.floorAvg(col("col").cast("double"), 9).as("m"))
      .collect()
    val next = cents.map(_.clone())
    means.foreach(r => next(r.getInt(0))(r.getInt(1)) = r.getDouble(2).toFloat)
    next
  }

  /** Adds the `cell` assignment column (fused codegen'd argmax-dot). */
  def assign(emb: DataFrame, vecCol: String, index: Index): DataFrame =
    emb.withColumn("cell",
      GraftFunctions.nearestCentroid(col(vecCol), index.centroids))

  /** The nprobe cell ids whose centroids are nearest (max-dot) the query. */
  def probeCells(index: Index, query: Array[Float], nprobe: Int): Seq[Int] = {
    val q = query.map(_.toDouble)
    index.centroids.zipWithIndex
      .map { case (c, i) => (i, c.zip(q).map { case (a, b) => a * b }.sum) }
      .sortBy(-_._2).take(nprobe).map(_._1).toSeq
  }

  /** Query: probe the nprobe cells nearest the query vector, exact-rerank
    * survivors with the fused cosine. */
  def topK(
      spark: SparkSession,
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      index: Index,
      query: Array[Float],
      k: Int,
      nprobe: Int = 4): DataFrame =
    rerank(spark,
      assign(emb, vecCol, index).filter(col("cell").isin(probeCells(index, query, nprobe): _*)),
      idCol, vecCol, query, k)

  private def rerank(
      spark: SparkSession,
      cands: DataFrame,
      idCol: String,
      vecCol: String,
      query: Array[Float],
      k: Int): DataFrame =
    cands
      .select(col(idCol), Ann.cosineCol(spark, col(vecCol), query).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol))
      .limit(k)

  /** Materialize the inverted file: the cell-assigned corpus written as a
    * `cell`-partitioned parquet layout. This is the 100 TB serving shape —
    * a probe against it reads only its nprobe/nlist directories because the
    * cell predicate becomes a partition filter, pruned at planning time
    * (never scanning the other cells' files). Plan-asserted in AnnSpec. */
  def writePartitioned(
      emb: DataFrame,
      vecCol: String,
      index: Index,
      path: String): Unit =
    assign(emb, vecCol, index)
      .write.mode("overwrite").partitionBy("cell").parquet(path)

  /** INCREMENTAL index maintenance: assign a batch of ARRIVING embeddings
    * to the FROZEN centroids and append its rows into the existing
    * cell-partitioned layout. The quantizer is never refit — cell identity
    * is a pure function of (vector, frozen centroids), so incremental
    * build ≡ from-scratch build over the union (asserted per-cell in
    * AnnSpec), and serving probes stay partition-pruned: the appended
    * files land inside the same `cell=` directories the probe's partition
    * filter already selects. Scale shape: the batch is one map-side
    * assignment pass + a partitioned append — no shuffle of the existing
    * corpus, no index rebuild; the same algebra as the cross-batch dedup
    * signature store (q_dd9). Centroid drift is handled the way real IVF
    * deployments do: serve frozen, refit offline when recall telemetry
    * (q_dd13's discipline) degrades, swap layouts. */
  def appendPartitioned(
      emb: DataFrame,
      vecCol: String,
      index: Index,
      path: String): Unit =
    assign(emb, vecCol, index)
      .write.mode("append").partitionBy("cell").parquet(path)

  /** Base layout for a STREAM-maintained index ([[appendPartitionedBatch]]):
    * identical to [[writePartitioned]] but with a second `batch` partition
    * level under each cell (`cell=<c>/batch=<id>/`), so later per-batch
    * appends and the base share one consistent partition structure. `cell`
    * stays the OUTER directory — probes filter on cell only and partition
    * pruning over cells is untouched. */
  def writePartitionedBatched(
      emb: DataFrame,
      vecCol: String,
      index: Index,
      path: String,
      batchId: Long = -1L): Unit =
    assign(emb, vecCol, index)
      .withColumn("batch", lit(batchId))
      .write.mode("overwrite").partitionBy("cell", "batch").parquet(path)

  /** CRASH-SAFE, RETRY-IDEMPOTENT incremental append — the streaming-sink
    * contract [[appendPartitioned]] deliberately doesn't carry (a blind
    * append retried after a mid-write crash duplicates rows). Each batch
    * lands under its own `batch=<id>` partitions via DYNAMIC partition
    * overwrite, so a RE-DELIVERED batchId (crash after data landed, before
    * the stream checkpoint committed) replaces exactly its own files —
    * cell assignment is deterministic under the frozen index, so the retry
    * touches the same (cell, batch) partitions its half-write did — and a
    * batchId whose commit marker exists is skipped outright (returns
    * false). The marker (`_batch_<id>`, written only after the parquet
    * commit) is invisible to partition discovery like every `_`-prefixed
    * file, and is resolved through the path's own Hadoop FileSystem so the
    * crash-safety contract holds on HDFS/object-store roots, not just the
    * local disk. Returns true iff THIS call ran the write path (a marker
    * that appears concurrently between the existence check and creation
    * does not demote a completed write to "skipped" — the parquet commit
    * already landed, and dynamic overwrite makes the racing writes
    * identical). Exercised across a real kill/restart in StreamingSpec. */
  def appendPartitionedBatch(
      emb: DataFrame,
      vecCol: String,
      index: Index,
      path: String,
      batchId: Long): Boolean = {
    val marker = new org.apache.hadoop.fs.Path(path, s"_batch_$batchId")
    val fs = marker.getFileSystem(emb.sparkSession.sessionState.newHadoopConf())
    if (fs.exists(marker)) false
    else {
      assign(emb, vecCol, index)
        .withColumn("batch", lit(batchId))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("cell", "batch")
        .parquet(path)
      fs.createNewFile(marker)
      true
    }
  }

  /** Probe a [[writePartitioned]] layout: partition-pruned scan + exact
    * rerank. */
  def topKPartitioned(
      spark: SparkSession,
      path: String,
      idCol: String,
      vecCol: String,
      index: Index,
      query: Array[Float],
      k: Int,
      nprobe: Int = 4): DataFrame =
    rerank(spark,
      spark.read.parquet(path).filter(col("cell").isin(probeCells(index, query, nprobe): _*)),
      idCol, vecCol, query, k)
}
