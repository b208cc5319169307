package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.streaming.EventStreams.Event

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${minute / 60}%02d:${minute % 60}%02d:00")

  test("hourly tumbling aggregation over a MemoryStream emits finalized windows") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventStreams.hourlyCounts(input.toDF(), watermark = "10 minutes")
      .writeStream.format("memory").queryName("hourly_test")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        Event(1, ts(5), "click", 1.0),
        Event(1, ts(20), "click", 2.0),
        Event(2, ts(30), "view", 5.0))
      q.processAllAvailable()
      // advance watermark past hour 0 so its windows finalize
      input.addData(Event(3, ts(135), "click", 1.0))
      q.processAllAvailable()
      val rows = spark.table("hourly_test")
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      assert(rows.contains((ts(0), "click", 2L, 3.0)))
      assert(rows.contains((ts(0), "view", 1L, 5.0)))
    } finally q.stop()
  }

  test("file-source stream of the real events table matches the batch hourly aggregation") {
    // Stream-batch parity: the SAME hourlyCounts plan, run once as a batch
    // query and once incrementally over a multi-file parquet source
    // (maxFilesPerTrigger=1 → one micro-batch per file), must agree — the
    // guarantee that lets one declarative aggregation serve both paths.
    val events = graft.Tables.events(spark, "/root/testdata/sf0.001")
      .select($"ts", $"event_type", $"value")
    val dir = java.nio.file.Files.createTempDirectory("events_stream")
    val src = dir.resolve("src").toString
    try {
      events.repartition(8).write.mode("overwrite").parquet(src)
      val schema = spark.read.parquet(src).schema
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(src)
      val q = EventStreams.hourlyCounts(stream)
        .writeStream.format("memory").queryName("hourly_parity")
        .outputMode(OutputMode.Complete()).start()
      try {
        q.processAllAvailable()
        assert(q.recentProgress.map(_.numInputRows).count(_ > 0) > 1,
          "expected multiple micro-batches")
        def canon(rows: Array[org.apache.spark.sql.Row]) = rows
          .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3)))
          .sortBy(t => (t._1.getTime, t._2))
        val streamed = canon(spark.table("hourly_parity").collect())
        val batch = canon(EventStreams.hourlyCounts(events).collect())
        assert(streamed.length === batch.length && streamed.nonEmpty)
        streamed.zip(batch).foreach { case ((h1, e1, n1, v1), (h2, e2, n2, v2)) =>
          assert(h1 === h2 && e1 === e2 && n1 === n2)
          // double sums accumulate in different orders batch vs incremental
          assert(math.abs(v1 - v2) <= 1e-9 * math.max(1.0, math.abs(v2)),
            s"total_value drift at ($h2,$e2): $v1 vs $v2")
        }
      } finally q.stop()
    } finally org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
  }

  test("stateful sessionization closes a session after the gap and on timeout") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventStreams.sessionize(spark, input.toDS(), gapMinutes = 30, watermark = "5 minutes")
      .writeStream.format("memory").queryName("session_test")
      .outputMode(OutputMode.Append()).start()
    try {
      // user 1: two events 10m apart (one session), then 40m silence → new session
      input.addData(
        Event(1, ts(0), "click", 1.0),
        Event(1, ts(10), "click", 2.0),
        Event(1, ts(50), "view", 3.0))
      q.processAllAvailable()
      // push the watermark far ahead so open sessions time out
      input.addData(Event(99, ts(600), "click", 0.0))
      q.processAllAvailable()
      input.addData(Event(98, ts(1200), "click", 0.0))
      q.processAllAvailable()
      val sessions = spark.table("session_test")
        .filter($"user_id" === 1L)
        .collect()
        .map(r => (r.getAs[Timestamp]("session_start"), r.getAs[Int]("n_events"),
          r.getAs[Double]("total_value")))
        .sortBy(_._1.getTime)
      assert(sessions.length === 2)
      assert(sessions(0) === ((ts(0), 2, 3.0)))
      assert(sessions(1) === ((ts(50), 1, 3.0)))
    } finally q.stop()
  }

  test("stream-stream interval join pairs purchases with preceding clicks only") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val withType = input.toDF()
    val q = EventStreams.purchasesWithRecentClicks(withType, gapMinutes = 30)
      .writeStream.format("memory").queryName("ssjoin_test")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        Event(1, ts(0), "click", 0.0),
        Event(1, ts(10), "purchase", 5.0),  // joins with click at :00
        Event(1, ts(50), "purchase", 7.0),  // click at :00 is 50m old → no join
        Event(2, ts(5), "purchase", 9.0))   // user 2 never clicked → no join
      q.processAllAvailable()
      input.addData(Event(99, ts(600), "click", 0.0)) // advance watermark
      q.processAllAvailable()
      val rows = spark.table("ssjoin_test")
        .collect().map(r => (r.getAs[Long]("user_id"), r.getAs[Timestamp]("purchase_ts"),
          r.getAs[Double]("value")))
      assert(rows.toSet === Set((1L, ts(10), 5.0)))
    } finally q.stop()
  }

  test("streaming dedup drops repeated ids within the watermark horizon") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, Double)]
    val df = input.toDF().toDF("event_id", "ts", "value")
    val q = EventStreams.dedupStream(df, Seq("event_id"), watermark = "10 minutes")
      .writeStream.format("memory").queryName("dedup_test")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData((1L, ts(0), 1.0), (1L, ts(1), 1.0), (2L, ts(2), 2.0), (1L, ts(3), 9.9))
      q.processAllAvailable()
      val ids = spark.table("dedup_test").select("event_id")
        .as[Long].collect().sorted.toSeq
      assert(ids === Seq(1L, 2L))
    } finally q.stop()
  }

  test("file-source stream: hourly aggregation over the events parquet directory") {
    // real readStream path: parquet file source with explicit schema
    val dir = java.nio.file.Files.createTempDirectory("graft-stream-src")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      dir.resolve("events.parquet"))
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val fileSchema = spark.read.parquet(dir.toString).schema
    val stream = graft.Tables.normalizeEventsTs(
      spark.readStream.schema(fileSchema).parquet(dir.toString))
    val q = EventStreams.hourlyCounts(stream, watermark = "1 hour")
      .writeStream.format("memory").queryName("file_hourly")
      .outputMode(OutputMode.Update()).start()
    try {
      q.processAllAvailable()
      val n = spark.table("file_hourly").count()
      assert(n > 0, "expected hourly rows from the file stream")
    } finally q.stop()
  }

  test("streaming count-min grid equals the batch sketch's point estimates") {
    // Complete-mode cells only add, so the final streamed grid must equal
    // the batch grid — and therefore every point estimate.
    val d = "/root/testdata/sf0.001"
    val batch = graft.queries.Corpus.countMinUsers(spark, d).collect()
    val streamed = graft.queries.Corpus.streamedCountMin(spark, d).collect()
    assert(streamed.toSeq === batch.toSeq)
  }

  test("streaming incremental dedup equals the one-shot batch classification") {
    // The q_e11 micro-batch state machine (static store + growing kept-
    // signature store) must land on exactly the q_dd9 batch answer.
    val d = "/root/testdata/sf0.001"
    val batch = graft.queries.Corpus.incrementalDedupBatch(spark, d).collect()
    val streamed = graft.queries.Corpus.streamedIncrementalDedup(spark, d).collect()
    assert(streamed.length === batch.length)
    streamed.zip(batch).foreach { case (sr, br) => assert(sr === br) }
  }

  test("streaming classifier scoring equals the batch pass bit-for-bit") {
    // frozen-model scoring is stateless, so the micro-batched stream must
    // reproduce q_t21's scores exactly (same doc set, same score bits)
    val d = "/root/testdata/sf0.001"
    val batch = graft.queries.Corpus.all("q_t21_quality_classifier")(spark, d)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getBoolean(2)))
    val streamed = graft.queries.Corpus.streamedClassifierScores(spark, d)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getBoolean(2)))
    assert(streamed.length === batch.length)
    streamed.zip(batch).foreach { case (sr, br) => assert(sr === br) }
  }

  test("batch session_window agrees with the stateful operator's grouping") {
    val batch = Seq(
      Event(1, ts(0), "click", 1.0),
      Event(1, ts(10), "click", 2.0),
      Event(1, ts(50), "view", 3.0)).toDF()
    val sessions = EventStreams.sessionizeBatch(batch, 30)
      .orderBy("session_start")
      .collect().map(r => (r.getAs[Long]("n_events"), r.getAs[Double]("total_value")))
    assert(sessions.toSeq === Seq((2L, 3.0), (1L, 3.0)))
  }

  test("streaming manifest maintenance converges to the from-scratch manifest") {
    val d = "/root/testdata/sf0.001"
    val streamed = graft.queries.Corpus.all("q_e15_stream_manifest")(spark, d)
      .collect().map(_.toSeq).toSeq
    val batch = graft.queries.Corpus.all("q_s13_shard_manifest")(spark, d)
      .collect().map(_.toSeq).toSeq
    assert(streamed === batch)
  }

  test("streaming URL frontier classifies exactly like the one-shot batch dedup") {
    val d = "/root/testdata/sf0.001"
    val streamed = graft.queries.Corpus.all("q_e14_stream_urls")(spark, d)
      .collect().map(r => r.getLong(0) -> ((r.getString(2), r.getBoolean(3)))).toMap
    val batch = graft.queries.Corpus.all("q_t25_url_canonical")(spark, d)
      .collect().map(r => r.getLong(0) -> ((r.getString(2), r.getBoolean(3)))).toMap
    assert(streamed.keySet === batch.keySet)
    streamed.foreach { case (id, v) =>
      assert(v === batch(id), s"doc $id: streaming $v != batch ${batch(id)}")
    }
    // cross-batch dups really occur (a canon kept in an early batch must
    // mark later arrivals dup): every odd corpus id pairs with an earlier
    // even keeper, possibly in a previous micro-batch
    assert(streamed.exists { case (id, (_, keep)) => id % 2 == 1 && !keep })
  }

  test("crash recovery: dedup-store stream killed between batches resumes from checkpoint to the identical state") {
    val d = "/root/testdata/sf0.001"
    val C = graft.queries.Corpus
    val (storeSig, waves) = C.dedupStreamWaves(spark, d)
    def runStream(root: String): Unit = {
      val q = spark.readStream
        .schema("doc_id BIGINT, text STRING")
        .option("maxFilesPerTrigger", 1)
        .parquet(s"$root/in/p*")
        .writeStream
        .option("checkpointLocation", s"$root/ckpt")
        .foreachBatch(
          (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
            C.dedupStoreBatch(spark, storeSig, root)(batch.toDF(), id))
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    def outRows(root: String) = spark.read.parquet(s"$root/out/b*")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), String.valueOf(r.get(2)))).toSet
    def stateIds(root: String) = spark.read.parquet(
        graft.streaming.BatchState.latestState(root, Long.MaxValue).get)
      .select("doc_id").as[Long].collect().toSet

    // uninterrupted reference run: all three waves visible up front
    val rootA = java.nio.file.Files.createTempDirectory("crash_e11_a").toString
    waves.zipWithIndex.foreach { case (df, i) => C.writeWave(rootA, i, df) }
    runStream(rootA)

    // crashed run: only wave 0 exists; the stream commits it and is KILLED.
    // Waves 1-2 then arrive; a NEW stream on the SAME checkpoint resumes
    // (batch numbering continues) and must converge to the identical
    // outputs and signature state — possible only because dedupStoreBatch
    // derives its input state from disk, not from a dead closure var.
    val rootB = java.nio.file.Files.createTempDirectory("crash_e11_b").toString
    C.writeWave(rootB, 0, waves(0))
    runStream(rootB)
    assert(new java.io.File(s"$rootB/out/b0").exists(), "batch 0 committed before the kill")
    assert(!new java.io.File(s"$rootB/out/b1").exists(), "batch 1 not yet arrived")
    C.writeWave(rootB, 1, waves(1))
    C.writeWave(rootB, 2, waves(2))
    runStream(rootB)
    assert(outRows(rootB) === outRows(rootA), "restart diverged from the uninterrupted run")
    assert(stateIds(rootB) === stateIds(rootA), "resumed state diverged")

    // re-delivery: a batchId that already committed is replayed (the crash
    // window between sink write and checkpoint commit) — reads the state
    // BEFORE itself and rewrites its outputs with identical content
    val before = (outRows(rootB), stateIds(rootB))
    C.dedupStoreBatch(spark, storeSig, rootB)(waves(1), 1L)
    assert((outRows(rootB), stateIds(rootB)) === before, "re-delivered batch changed state")
  }

  test("crash recovery: IVF ingest stream killed mid-flight resumes idempotently to the from-scratch layout") {
    val d = "/root/testdata/sf0.001"
    val C = graft.queries.Corpus
    val Ivf = graft.similarity.Ivf
    val (base, idx, waves) = C.ivfStreamWaves(spark, d)
    val root = java.nio.file.Files.createTempDirectory("crash_e16").toString
    Ivf.writePartitionedBatched(base, "embedding", idx, s"$root/ivf")
    // ROW MULTISET, not set: a double-ingest (the blind-append failure
    // mode this sink exists to prevent) duplicates rows a set would hide
    def layoutRows = spark.read.parquet(s"$root/ivf").select("vec_id", "cell")
      .as[(Long, Int)].collect().sorted.toSeq
    // wave 0 arrives; the stream commits it and is KILLED
    C.writeWave(root, 0, waves(0))
    C.runIvfIngestStream(spark, idx, root)
    assert(new java.io.File(s"$root/ivf/_batch_0").exists(), "batch 0 marker committed")
    // waves 1-2 arrive; the restarted stream (same checkpoint) ingests
    // only them, and the final layout equals a from-scratch build
    C.writeWave(root, 1, waves(1))
    C.writeWave(root, 2, waves(2))
    C.runIvfIngestStream(spark, idx, root)
    val fullDir = java.nio.file.Files.createTempDirectory("crash_e16_full").toString
    Ivf.writePartitionedBatched(
      base.unionByName(waves.reduce(_ unionByName _)), "embedding", idx, fullDir)
    val expected = spark.read.parquet(fullDir).select("vec_id", "cell")
      .as[(Long, Int)].collect().sorted.toSeq
    assert(layoutRows === expected,
      "restart-resumed layout must equal from-scratch (no loss, no double-ingest)")
    // re-delivery of a COMMITTED batchId is skipped outright
    val appended = Ivf.appendPartitionedBatch(waves(0), "embedding", idx, s"$root/ivf", 0L)
    assert(!appended && layoutRows === expected, "committed batch re-applied")
    // a half-write whose commit marker never landed is REPLACED by the
    // retry (dynamic partition overwrite), never duplicated
    assert(new java.io.File(s"$root/ivf/_batch_1").delete())
    val retried = Ivf.appendPartitionedBatch(waves(1), "embedding", idx, s"$root/ivf", 1L)
    assert(retried && layoutRows === expected, "retried half-write must replace, not append")
  }

  test("crash recovery: URL frontier stream killed between batches resumes from checkpoint to the identical classification") {
    val d = "/root/testdata/sf0.001"
    val C = graft.queries.Corpus
    val waves = C.urlFrontierWaves(spark, d)
    def outRows(root: String) = spark.read.parquet(s"$root/out/b*")
      .collect().map(r => (r.getLong(0), r.getString(2), r.getBoolean(3))).toSet
    def stateUrls(root: String) = spark.read.parquet(
        graft.streaming.BatchState.latestState(root, Long.MaxValue).get)
      .select("url_canon").as[String].collect().toSet

    // uninterrupted reference run: all three waves visible up front
    val rootA = java.nio.file.Files.createTempDirectory("crash_e14_a").toString
    waves.zipWithIndex.foreach { case (df, i) => C.writeWave(rootA, i, df) }
    C.runUrlFrontierStream(spark, rootA)

    // crashed run: only wave 0 exists; the stream commits it and is KILLED.
    // Waves 1-2 then arrive; a NEW stream on the SAME checkpoint resumes
    // and must converge to the identical classification and frontier state
    // — possible only because urlFrontierBatch derives its input state
    // from disk, not from a dead closure var.
    val rootB = java.nio.file.Files.createTempDirectory("crash_e14_b").toString
    C.writeWave(rootB, 0, waves(0))
    C.runUrlFrontierStream(spark, rootB)
    assert(new java.io.File(s"$rootB/out/b0").exists(), "batch 0 committed before the kill")
    assert(!new java.io.File(s"$rootB/out/b1").exists(), "batch 1 not yet arrived")
    C.writeWave(rootB, 1, waves(1))
    C.writeWave(rootB, 2, waves(2))
    C.runUrlFrontierStream(spark, rootB)
    assert(outRows(rootB) === outRows(rootA), "restart diverged from the uninterrupted run")
    assert(stateUrls(rootB) === stateUrls(rootA), "resumed frontier state diverged")

    // re-delivery: a batchId that already committed is replayed (the crash
    // window between sink write and checkpoint commit) — reads the state
    // BEFORE itself and rewrites its outputs with identical content
    val before = (outRows(rootB), stateUrls(rootB))
    C.urlFrontierBatch(spark, rootB)(waves(1), 1L)
    assert((outRows(rootB), stateUrls(rootB)) === before, "re-delivered batch changed state")
  }

  test("crash recovery: manifest stream killed between batches resumes from checkpoint to the identical manifest") {
    val d = "/root/testdata/sf0.001"
    val C = graft.queries.Corpus
    val waves = C.manifestStreamWaves(spark, d)
    def manifest(root: String) = spark.read.parquet(
        graft.streaming.BatchState.latestState(root, Long.MaxValue).get)
      .orderBy("shard").collect().map(_.toSeq).toSeq

    // uninterrupted reference run: all three waves visible up front
    val rootA = java.nio.file.Files.createTempDirectory("crash_e15_a").toString
    waves.zipWithIndex.foreach { case (df, i) => C.writeWave(rootA, i, df) }
    C.runManifestStream(spark, rootA)

    // crashed run: wave 0 commits, the stream dies; waves 1-2 arrive and a
    // NEW stream on the SAME checkpoint resumes — the maintained manifest
    // must equal the uninterrupted run's (and, by the q_e15 parity test,
    // the from-scratch q_s13 manifest).
    val rootB = java.nio.file.Files.createTempDirectory("crash_e15_b").toString
    C.writeWave(rootB, 0, waves(0))
    C.runManifestStream(spark, rootB)
    assert(new java.io.File(s"$rootB/state0").exists(), "batch 0 state committed before the kill")
    assert(!new java.io.File(s"$rootB/state1").exists(), "batch 1 not yet arrived")
    C.writeWave(rootB, 1, waves(1))
    C.writeWave(rootB, 2, waves(2))
    C.runManifestStream(spark, rootB)
    assert(manifest(rootB) === manifest(rootA), "restart diverged from the uninterrupted run")

    // re-delivery of a committed batchId: merges the state BEFORE itself
    // and overwrites its own snapshot — the NEWEST state is untouched
    val before = manifest(rootB)
    C.manifestStreamBatch(spark, rootB)(waves(1), 1L)
    assert(manifest(rootB) === before, "re-delivered batch changed the maintained manifest")
  }
}
