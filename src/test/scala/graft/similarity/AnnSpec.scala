package graft.similarity

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.dedup.Dedup

class AnnSpec extends SparkSpec {
  import spark.implicits._

  private def vec(xs: Double*): Array[Float] = xs.map(_.toFloat).toArray

  private lazy val emb = Seq(
    (0L, vec(1, 0, 0, 0)),
    (1L, vec(0.9, 0.1, 0, 0)),  // close to 0
    (2L, vec(0, 1, 0, 0)),      // orthogonal
    (3L, vec(-1, 0, 0, 0)),     // opposite
    (4L, vec(1, 0, 0, 0))       // identical to 0
  ).toDF("vec_id", "embedding")
    .withColumn("embedding", col("embedding").cast("array<float>"))

  private val query = vec(1, 0, 0, 0)

  test("brute-force cosine top-k ranks identical > close > orthogonal > opposite") {
    val ids = Ann.bruteForceTopK(spark, emb, "vec_id", "embedding", query, 5)
      .select("vec_id").as[Long].collect().toSeq
    assert(ids.take(2).toSet === Set(0L, 4L))
    assert(ids(2) === 1L)
    assert(ids.last === 3L)
  }

  test("fused cosine expression matches naive scala computation") {
    val c = Ann.bruteForceTopK(spark, emb, "vec_id", "embedding", query, 5)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(c(1L) - 0.9 / math.sqrt(0.9 * 0.9 + 0.1 * 0.1)) < 1e-6)
    assert(c(3L) === -1.0)
  }

  test("reproducible cosine agrees with fused cosine to float tolerance") {
    val repro = Ann.exactTopKReproducible(
      emb, "vec_id", "embedding", query.map(_.toDouble), 5)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val fast = Ann.bruteForceTopK(spark, emb, "vec_id", "embedding", query, 5)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    repro.foreach { case (id, c) => assert(math.abs(c - fast(id)) < 1e-9) }
  }

  test("LSH top-k finds the identical vector (same bucket) and reranks exactly") {
    val ids = Ann.lshTopK(spark, emb, "vec_id", "embedding", query, 3,
      bits = 8, probes = 2)
      .select("vec_id").as[Long].collect().toSeq
    assert(ids.take(2).toSet === Set(0L, 4L))
  }

  test("IVF: cell assignment + probe finds the identical vector; high recall vs brute force") {
    val emb500 = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val q = emb500.filter($"vec_id" === 0).select("embedding").head.getSeq[Float](0).toArray
    val index = Ivf.fit(emb500, "embedding", nlist = 16)
    assert(index.centroids.length === 16)
    val ivfIds = Ivf.topK(spark, emb500, "vec_id", "embedding", index, q, 10, nprobe = 6)
      .select("vec_id").as[Long].collect().toSet
    val exactIds = Ann.bruteForceTopK(spark, emb500, "vec_id", "embedding", q, 10)
      .select("vec_id").as[Long].collect().toSet
    assert(ivfIds.contains(0L)) // the query vector itself always survives
    val recall = (ivfIds intersect exactIds).size.toDouble / exactIds.size
    assert(recall >= 0.5, s"recall $recall too low: ivf=$ivfIds exact=$exactIds")
  }

  test("IVF fit is deterministic under repartitioning (keyed sample order)") {
    val emb500 = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val a = Ivf.fit(emb500, "embedding", nlist = 8)
    val b = Ivf.fit(emb500.repartition(7), "embedding", nlist = 8)
    val c = Ivf.fit(emb500.repartition(3, $"vec_id"), "embedding", nlist = 8)
    assert(a.centroids.map(_.toSeq).toSeq === b.centroids.map(_.toSeq).toSeq)
    assert(a.centroids.map(_.toSeq).toSeq === c.centroids.map(_.toSeq).toSeq)
  }

  test("partitioned IVF probe prunes the scan to nprobe cells and matches the in-memory probe") {
    val emb500 = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val q = emb500.filter($"vec_id" === 0).select("embedding").head.getSeq[Float](0).toArray
    val index = Ivf.fit(emb500, "embedding", nlist = 16)
    val dir = java.nio.file.Files.createTempDirectory("ivf_part").toString
    try {
      Ivf.writePartitioned(emb500, "embedding", index, dir)
      val nprobe = 4
      val probed = Ivf.topKPartitioned(spark, dir, "vec_id", "embedding", index, q, 10, nprobe)
      // the cell predicate must be a planning-time partition filter: the
      // scan's selected partitions are exactly the probed cells, not nlist
      val plan = probed.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.initialPlan
        case p => p
      }
      val scans = plan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }
      assert(scans.nonEmpty, "expected a FileSourceScanExec")
      assert(scans.head.partitionFilters.nonEmpty, "cell predicate did not become a partition filter")
      val selected = scans.head.selectedPartitions.partitionCount
      assert(selected === nprobe, s"scan read $selected partitions, expected $nprobe")
      // and the result set matches the non-materialized probe
      val mem = Ivf.topK(spark, emb500, "vec_id", "embedding", index, q, 10, nprobe)
        .select("vec_id").as[Long].collect().toSeq
      val disk = probed.select("vec_id").as[Long].collect().toSeq
      assert(disk === mem)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("incremental IVF append ≡ from-scratch build per cell, and the probe stays partition-pruned") {
    val emb500 = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select("vec_id", "embedding")
    val q = emb500.filter($"vec_id" === 0).select("embedding").head.getSeq[Float](0).toArray
    val base = emb500.filter(pmod($"vec_id", lit(3)) =!= 1)
    val delta = emb500.filter(pmod($"vec_id", lit(3)) === 1)
    val index = Ivf.fit(base, "embedding", nlist = 16)
    val incDir = java.nio.file.Files.createTempDirectory("ivf_inc").toString
    val fullDir = java.nio.file.Files.createTempDirectory("ivf_full").toString
    try {
      // incremental: base layout + frozen-centroid append of the delta
      Ivf.writePartitioned(base, "embedding", index, incDir)
      Ivf.appendPartitioned(delta, "embedding", index, incDir)
      // from-scratch: one write of the union under the SAME frozen index
      Ivf.writePartitioned(emb500, "embedding", index, fullDir)
      // per-cell row sets identical — cell identity is a pure function of
      // (vector, frozen centroids), so the merge algebra is exact
      val inc = spark.read.parquet(incDir).select("vec_id", "cell")
        .as[(Long, Int)].collect().toSet
      val full = spark.read.parquet(fullDir).select("vec_id", "cell")
        .as[(Long, Int)].collect().toSet
      assert(inc === full, "incremental layout diverged from from-scratch build")
      // the probe over the merged layout is still a planning-time
      // partition prune: exactly nprobe cell directories are read even
      // though each now holds base AND delta files
      val nprobe = 4
      val probed = Ivf.topKPartitioned(spark, incDir, "vec_id", "embedding", index, q, 10, nprobe)
      val plan = probed.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.initialPlan
        case p => p
      }
      val scans = plan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }
      assert(scans.nonEmpty && scans.head.partitionFilters.nonEmpty)
      assert(scans.head.selectedPartitions.partitionCount === nprobe)
      // and serving through the incremental layout matches the from-scratch one
      val a = probed.select("vec_id").as[Long].collect().toSeq
      val b = Ivf.topKPartitioned(spark, fullDir, "vec_id", "embedding", index, q, 10, nprobe)
        .select("vec_id").as[Long].collect().toSeq
      assert(a === b)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(incDir))
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(fullDir))
    }
  }

  test("composed IVF+PQ+rerank stack keeps the partition prune and full clone recall") {
    val d = "/root/testdata/sf0.001"
    val res = graft.queries.Corpus.annIvfPqTopK(spark, d)
    // the probe stage must still be a planning-time partition filter even
    // with the PQ encode + ADC shortlist stacked on top
    val plan = res.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.initialPlan
      case p => p
    }
    val scans = plan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.nonEmpty, "expected a FileSourceScanExec")
    assert(scans.head.partitionFilters.nonEmpty, "cell predicate did not become a partition filter")
    val selected = scans.head.selectedPartitions.partitionCount
    assert(selected <= 6, s"probe read $selected cells, expected <= nprobe=6")
    // and the full literal recall set survives all three tiers
    val ids = res.as[Long].collect().toSet
    assert(ids === (Set(0L) ++ (0 until 19).map(i => 1000000L + i)))
  }

  test("embedding near-dup LSH finds the identical pair above threshold") {
    val pairs = Dedup.embeddingNearDups(spark, emb, "vec_id", "embedding",
      threshold = 0.99, bitsPerTable = 4, tables = 2, dim = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 4L)))
  }

  test("hard-negative mining picks best same-label positive and best cross-label negative") {
    import spark.implicits._
    // anchor 0 (label 0, e_x); 1: near e_x label 0 (the positive);
    // 2: exactly e_x but label 1 (the hardest negative); 3: far, label 1.
    val vecs = Seq(
      (0L, Array(1f, 0f, 0f, 0f), 0),
      (1L, Array(0.9f, 0.1f, 0f, 0f), 0),
      (2L, Array(1f, 0f, 0f, 0f), 1),
      (3L, Array(0f, 0f, 1f, 0f), 1)
    ).toDF("vec_id", "embedding", "label")
    val sfLike = vecs // matches the embeddings schema the query expects
    val tmp = java.nio.file.Files.createTempDirectory("graft-ann6").toString
    sfLike.write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    val rows = graft.queries.Corpus.annHardNegatives(spark, tmp)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(3)))).toMap
    assert(rows(0L) === ((1L, 2L))) // positive = 1 (same label), negative = 2 (cos 1.0, other label)
    assert(rows(2L) === ((3L, 0L))) // only same-label peer is 3; hardest cross-label is 0 (cos 1.0)
  }

  test("streaming IVF ingest ≡ from-scratch build per cell, probe stays pruned") {
    val d = "/root/testdata/sf0.001"
    val streamed = graft.queries.Corpus.streamIvfIngest(spark, d)
    // shares the q_ann3/q_ann9 recall contract: vec 0 + the first 19
    // planted clones — every clone arrived THROUGH a micro-batch
    val ids = streamed.select("vec_id").as[Long].collect().toSeq
    assert(ids.sorted === (0L +: (0 until 19).map(i => 1000000L + i)))
    // per-cell equivalence: the stream-maintained layout holds exactly the
    // rows of a from-scratch build under the SAME frozen index
    val (index, layout) = graft.queries.Corpus.streamIvfCache((spark, d))
    val emb = graft.Tables.embeddings(spark, d).select("vec_id", "embedding")
    val all = emb.unionByName(
      emb.filter($"vec_id" === 0)
        .select(explode(sequence(lit(1000000L), lit(1000024L))).as("vec_id"), $"embedding"))
    val fullDir = java.nio.file.Files.createTempDirectory("ivf_stream_full").toString
    try {
      Ivf.writePartitioned(all, "embedding", index, fullDir)
      val a = spark.read.parquet(layout).select("vec_id", "cell")
        .as[(Long, Int)].collect().toSet
      val b = spark.read.parquet(fullDir).select("vec_id", "cell")
        .as[(Long, Int)].collect().toSet
      assert(a === b, "stream-maintained layout diverged from from-scratch build")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(fullDir))
    }
    // serving through the maintained layout is still a planning-time
    // partition prune: only the probed 6 cells' directories are read even
    // though each now holds (cell, batch) leaf partitions — the base at
    // batch=-1 plus one leaf per committed micro-batch that hit the cell
    val plan = streamed.queryExecution.executedPlan match {
      case ad: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => ad.initialPlan
      case p => p
    }
    // match the IVF layout's scan specifically (by its root path), not
    // whichever file scan happens to come first in the plan
    val scans = plan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec
          if f.relation.location.rootPaths.exists(_.toString.contains(layout)) => f
    }
    assert(scans.nonEmpty && scans.head.partitionFilters.nonEmpty)
    val probed = Ivf.probeCells(index, graft.queries.Corpus.queryVector(spark, d), 6)
    val expectedLeaves = probed.map { c =>
      Option(new java.io.File(layout, s"cell=$c").listFiles()).toSeq.flatten
        .count(f => f.isDirectory && f.getName.startsWith("batch="))
    }.sum
    assert(expectedLeaves >= 6, "every probed cell holds at least its base leaf")
    assert(scans.head.selectedPartitions.partitionCount === expectedLeaves)
  }

  test("replayable IVF fit is layout-invariant and float-typed") {
    val emb500 = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val a = Ivf.fitReplayable(emb500, "vec_id", "embedding", nlist = 8)
    val b = Ivf.fitReplayable(emb500.repartition(7), "vec_id", "embedding", nlist = 8)
    assert(a.length === 8)
    assert(a.map(_.toSeq).toSeq === b.map(_.toSeq).toSeq,
      "floor-quantized Lloyd update must be partition-order independent")
  }

  test("q_ann10 recall curve is monotone in nprobe and exact at nprobe = nlist") {
    val rows = graft.queries.Corpus.all("q_ann10_recall_curve")(
      spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => (r.getInt(0), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5)))
    assert(rows.map(_._1).toSeq === Seq(1, 2, 4, 8, 16))
    // candidates and hits never shrink as more cells are probed
    assert(rows.sliding(2).forall { case Array(p, n) =>
      n._2 >= p._2 && n._3 >= p._3 })
    // probing every cell IS the exact scan: recall 1 over the full corpus
    val last = rows.last
    assert(last._4 === 1.0, s"recall at nprobe=nlist must be exact, got $last")
    assert(last._5 === 1.0, s"scan_frac at nprobe=nlist must be 1, got $last")
    assert(rows.head._5 < 0.5, "nprobe=1 must prune most of the corpus")
  }

  test("q_r1 hybrid RRF: fused score is exact integer rank arithmetic; both legs contribute") {
    val out = graft.queries.Corpus.all("q_r1_hybrid_rrf")(
      spark, "/root/testdata/sf0.001").collect()
    assert(out.length === 20)
    def term(r: Any): Long = r match {
      case null => 0L
      case i: Int => math.floor(1e6 / (60.0 + i)).toLong
    }
    out.foreach { r =>
      assert(r.getLong(3) === term(r.get(1)) + term(r.get(2)),
        s"rrf_micro must be the integer RRF of the leg ranks: $r")
    }
    // doc 0's embedding IS the query vector, so the vector leg ranks it 1
    val doc0 = out.find(_.getLong(0) == 0L)
    assert(doc0.exists(_.getInt(2) == 1), s"doc 0 must lead the vector leg: $doc0")
    // the fused order is (rrf desc, doc_id): docs ranked by BOTH legs beat
    // single-leg docs of similar rank — at least one fused row carries both
    assert(out.exists(r => !r.isNullAt(1) && !r.isNullAt(2)),
      "fusion must surface at least one doc present in both legs")
    val scores = out.map(_.getLong(3)).toSeq
    assert(scores === scores.sorted.reverse, "output must be rrf-descending")
  }

  test("q_r2 hybrid IVF: index-served leg keeps the exact match; RRF identity holds") {
    val out = graft.queries.Corpus.all("q_r2_hybrid_ivf")(
      spark, "/root/testdata/sf0.001").collect()
    assert(out.length === 20)
    def term(r: Any): Long = r match {
      case null => 0L
      case i: Int => math.floor(1e6 / (60.0 + i)).toLong
    }
    out.foreach { r =>
      assert(r.getLong(3) === term(r.get(1)) + term(r.get(2)),
        s"rrf_micro must be the integer RRF of the leg ranks: $r")
    }
    // doc 0 IS the query vector; its own cell is always in the probe set,
    // so the index-served leg must still rank it first
    val doc0 = out.find(_.getLong(0) == 0L)
    assert(doc0.exists(_.getInt(2) == 1),
      s"doc 0 must survive the cell prune and lead the vector leg: $doc0")
    val scores = out.map(_.getLong(3)).toSeq
    assert(scores === scores.sorted.reverse, "output must be rrf-descending")
  }
}
