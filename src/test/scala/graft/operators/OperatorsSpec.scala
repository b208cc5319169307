package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.Exact

class OperatorsSpec extends SparkSpec {
  import spark.implicits._

  test("salted two-phase aggregation equals single-phase on skewed keys") {
    // 90% of rows on one key — the reference's UK-style skew
    val rows = (1 to 9000).map(i => ("HOT", i.toLong)) ++
      (1 to 1000).map(i => (s"k${i % 50}", i.toLong))
    val df = rows.toDF("key", "v")
    val plain = df.groupBy("key")
      .agg(sum($"v").as("s"), count(lit(1)).as("n"), min($"v").as("mn"), max($"v").as("mx"))
      .orderBy("key").collect().map(_.toSeq)
    val salted = Skew.saltedAgg(df, Seq("key"), Seq(
      Skew.sumLong("v", "s"), Skew.countAll("n"),
      Skew.minOf("v", "mn"), Skew.maxOf("v", "mx")), salts = 8)
      .orderBy("key").collect().map(_.toSeq)
    assert(salted.toSeq === plain.toSeq)
  }

  test("salted trailing range sum is salt-invariant and equals the plain window (q_w14)") {
    import org.apache.spark.sql.expressions.Window
    // hot key with gappy dates (every 2nd/3rd day) so the trailing frame
    // spans missing dates — the case a per-salt window would undercount
    val rows = (0 until 300).map(i => ("HOT", java.sql.Date.valueOf(
      java.time.LocalDate.of(1995, 1, 1).plusDays(i * 2L)), (i % 17).toLong)) ++
      (0 until 40).map(i => ("COLD", java.sql.Date.valueOf(
        java.time.LocalDate.of(1995, 1, 1).plusDays(i * 3L)), i.toLong))
    val df = rows.toDF("key", "d", "v")
    def run(salts: Int) = Skew
      .saltedTrailingSum(df, Seq("key"), "d", "v", days = 7, salts = salts, out = "t7")
      .orderBy("key", "d").collect().map(_.toSeq)
    val w = Window.partitionBy("key")
      .orderBy(datediff($"d", lit("1970-01-01"))).rangeBetween(-7, -1)
    val plain = df.groupBy("key", "d").agg(sum($"v").as("day_total"))
      .withColumn("t7", sum($"day_total").over(w))
      .orderBy("key", "d").collect().map(_.toSeq)
    assert(run(16).toSeq === plain.toSeq)
    assert(run(1).toSeq === run(16).toSeq, "result depends on salt count")
  }

  test("hierarchical block cumsum is bit-identical to the whole-partition window (q_w15)") {
    import org.apache.spark.sql.expressions.Window
    // one dominant key across many blocks, plus ties that the order columns
    // must break identically in both shapes
    val rows = for { b <- 0 until 24; i <- 0 until 50 } yield
      ("HOT", b / 12, b % 12, i.toLong, (i * 7 % 23).toLong)
    val df = (rows ++ Seq(("COLD", 0, 0, 0L, 5L), ("COLD", 1, 3, 1L, 6L)))
      .toDF("key", "yr", "mo", "seq", "v")
    val hier = Skew.blockCumSum(
      df, Seq("key"), Seq("yr", "mo"), Seq("seq"), "v", out = "rt")
      .orderBy("key", "yr", "mo", "seq").collect().map(_.toSeq)
    val w = Window.partitionBy("key").orderBy("yr", "mo", "seq")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val plain = df.withColumn("rt", sum($"v").over(w))
      .orderBy("key", "yr", "mo", "seq").collect().map(_.toSeq)
    assert(hier.toSeq === plain.toSeq)
  }

  test("partitionBy(Year) layout prunes partitions at the scan (q_s7)") {
    val df = graft.queries.Corpus.partitionedScan(spark, "/root/testdata/sf0.001")
    df.count() // force planning through AQE
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") &&
      scan.matches("(?s).*PartitionFilters: \\[[^\\]]*Year[^\\]]*1997[^\\]]*\\].*"),
      s"expected a Year=1997 partition filter at the scan:\n$scan")
    // pruning must not change semantics: equals the unpartitioned filter
    val plain = graft.queries.Corpus.dailySales(spark, "/root/testdata/sf0.001")
      .filter($"Year" === 1997)
      .select("Country", "StockCode", "InvoiceDate", "Year", "NetDailyQuantity")
      .orderBy("Country", "StockCode", "InvoiceDate")
      .collect().map(_.toSeq)
    assert(df.collect().map(_.toSeq).toSeq === plain.toSeq)
  }

  test("sized parquet write bounds file row counts and loses nothing (q_s10)") {
    // skew the input into one giant partition + many tiny ones, then demand
    // an even bounded layout back
    val rows = (1 to 9000).map(i => ("HOT", i)) ++ (1 to 900).map(i => (s"k$i", i))
    val df = rows.toDF("key", "v").repartition(col("key")) // all of HOT in one partition
    val dir = java.nio.file.Files.createTempDirectory("graft-sized-out").toString
    Output.sizedParquetWrite(df, dir, maxRecordsPerFile = 1000L)
    val files = new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".parquet")).map(_.getPath)
    assert(files.length >= 10, s"expected >=10 bounded files, got ${files.length}")
    files.foreach { f =>
      val n = spark.read.parquet(f).count()
      assert(n <= 1000, s"file $f has $n rows > maxRecordsPerFile")
    }
    // layout only — content round-trips exactly
    val back = spark.read.parquet(dir).orderBy("key", "v").collect().map(_.toSeq)
    val orig = df.orderBy("key", "v").collect().map(_.toSeq)
    assert(back.toSeq === orig.toSeq)
  }

  test("dim-filtered join plants a dynamicpruning subquery in the fact scan (q_s9)") {
    // No literal Year predicate reaches the fact side — the pruning filter
    // must come from the dimension's broadcast at runtime (DPP). The scan's
    // PartitionFilters must carry a dynamicpruning expression on Year, and
    // the executed scan must read fewer partitions than the layout holds.
    val df = graft.queries.Corpus.dppJoin(spark, "/root/testdata/sf0.001")
    df.count() // force planning + execution through AQE
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"expected a dynamicpruning subquery in PartitionFilters:\n$plan")
    assert(plan.matches("(?s).*PartitionFilters: \\[[^\\]]*dynamicpruning[^\\]]*\\].*"),
      s"dynamicpruning not inside the scan's PartitionFilters:\n$plan")
    // semantics unchanged: equals the plain (unpartitioned) join
    val dim = graft.Tables.orders(spark, "/root/testdata/sf0.001")
      .filter($"o_orderdate".between("1996-01-01", "1997-12-31"))
      .select(year($"o_orderdate").as("Year"))
      .distinct()
    val plain = graft.queries.Corpus.dailySales(spark, "/root/testdata/sf0.001")
      .join(dim, "Year")
      .groupBy("Year")
      .agg(sum("NetDailyQuantity").as("total_qty"), count(lit(1)).as("n_rows"))
      .orderBy("Year")
      .collect().map(_.toSeq)
    assert(df.collect().map(_.toSeq).toSeq === plain.toSeq)
  }

  test("SHUFFLE_HASH hint forces ShuffledHashJoin where default is sort-merge (q_j9)") {
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // disable broadcast so the strategy choice is hash-vs-sort-merge
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val hinted = graft.queries.Corpus.joinShuffleHash(spark, "/root/testdata/sf0.001")
      hinted.count()
      val plan = hinted.queryExecution.executedPlan.toString
      assert(plan.contains("ShuffledHashJoin"), s"expected ShuffledHashJoin:\n$plan")
      // same query without the hint sort-merges — the hint is load-bearing
      val li = graft.Tables.lineitem(spark, "/root/testdata/sf0.001")
        .select("l_orderkey", "l_extendedprice")
      val o = graft.Tables.orders(spark, "/root/testdata/sf0.001")
        .select("o_orderkey", "o_orderdate")
      val plain = li.join(o, col("l_orderkey") === col("o_orderkey"))
      plain.count()
      assert(plain.queryExecution.executedPlan.toString.contains("SortMergeJoin"))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    }
  }

  test("ORC scan pushes the filter and prunes columns like parquet (q_s8)") {
    val df = graft.queries.Corpus.orcRoundtrip(spark, "/root/testdata/sf0.001")
    df.count()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("c_acctbal"),
      s"expected c_acctbal filter pushed to the ORC reader:\n$plan")
    assert(!plan.contains("c_nationkey"),
      s"expected unused columns pruned from the ORC ReadSchema:\n$plan")
  }

  test("bucketed co-located join runs without a shuffle exchange") {
    val facts = (1L to 5000L).map(k => (k % 97, k, k * 2.0)).toDF("key", "id", "v")
    val dims = (0L until 97L).map(k => (k, s"name_$k")).toDF("key", "name")
    // unique names: the managed-table location in /tmp survives across JVMs
    // while the in-memory catalog does not
    val run = java.util.UUID.randomUUID().toString.take(8)
    val (tf, td) = (s"graft_facts_$run", s"graft_dims_$run")
    Bucketing.writeBucketed(facts, tf, "key", 8)
    Bucketing.writeBucketed(dims, td, "key", 8)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Bucketing.colocatedJoin(spark, tf, td, "key")
      assert(joined.count() === 5000L)
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"expected shuffle-free plan, got:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      Seq(tf, td).foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }

  test("deterministic shuffle shards via range partitioning, not a global sort") {
    // The 100 TB shape of Corpus.detShuffle: hash-keyed rows range-partitioned
    // into shards, each shard locally sorted — a sampled RangePartitioning
    // exchange + per-partition sort, never a single-partition global sort.
    val docs = (1L to 10000L).map(i => (i, s"text_$i")).toDF("doc_id", "text")
    val sharded = docs
      .withColumn("shuffle_key", md5($"doc_id".cast("string")))
      .repartitionByRange(8, $"shuffle_key")
      .sortWithinPartitions("shuffle_key")
    val plan = sharded.queryExecution.executedPlan.toString
    assert(plan.contains("rangepartitioning"), s"expected range exchange:\n$plan")
    val globalSorts = sharded.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.SortExec if s.global => s
    }
    assert(globalSorts.isEmpty, s"expected no global sort:\n$plan")
    // shards are disjoint, ordered ranges: max(shard i) < min(shard i+1)
    val bounds = sharded
      .mapPartitions(it => { val s = it.map(_.getAs[String]("shuffle_key")).toSeq
        if (s.isEmpty) Iterator.empty else Iterator((s.min, s.max, s.size)) })
      .collect().sortBy(_._1)
    assert(bounds.map(_._3).sum === 10000)
    bounds.sliding(2).foreach { case Array((_, hi, _), (lo, _, _)) => assert(hi < lo); case _ => }
  }

  test("asof join: latest-wins, inclusive ties, left-outer nulls, key isolation") {
    val trades = Seq(
      (1L, 10L, "t10"), (1L, 20L, "t20"), (1L, 5L, "t5"),
      (2L, 10L, "u10")).toDF("key", "t", "trade")
    val quotes = Seq(
      (1L, 8L, 1.0), (1L, 10L, 2.0), (1L, 15L, 3.0),
      (2L, 99L, 9.0)).toDF("key", "qt", "px")
    val out = AsofJoin.asofJoin(trades, quotes, Seq("key"), "t", "qt", Seq("px"))
      .collect().map(r => r.getAs[String]("trade") ->
        ((Option(r.getAs[Any]("asof_time")), Option(r.getAs[Any]("asof_px"))))).toMap
    assert(out("t10") === (Some(10L), Some(2.0))) // inclusive: equal time matches
    assert(out("t20") === (Some(15L), Some(3.0))) // latest preceding wins
    assert(out("t5") === ((None, None))) // nothing precedes → null
    assert(out("u10") === ((None, None))) // other key's quotes invisible
    // exactly one output row per left row
    assert(AsofJoin.asofJoin(trades, quotes, Seq("key"), "t", "qt", Seq("px")).count() === 4L)
  }

  test("interval join matches the naive inequality join and avoids nested-loop plans") {
    import java.sql.Timestamp
    def t(ms: Long) = new Timestamp(1700000000000L + ms)
    val W = 1000L
    val lefts = Seq((1L, t(0)), (1L, t(1500)), (1L, t(2000)), (2L, t(1500)))
      .toDF("key", "lt")
    val rights = Seq(
      (1L, t(-1), 0.0), (1L, t(0), 1.0), (1L, t(500), 2.0), (1L, t(1000), 3.0),
      (1L, t(1500), 4.0), (1L, t(2500), 5.0), (2L, t(700), 6.0)).toDF("key", "rt", "v")
    val binned = RangeJoin.intervalJoin(lefts, rights, Seq("key"), "lt", "rt", W)
    val naive = lefts.join(rights, Seq("key"))
      .filter($"rt" <= $"lt" && $"rt" > $"lt" - expr("INTERVAL 1 SECOND"))
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("key", "lt", "rt", "v").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getTimestamp(2).getTime,
          r.getDouble(3))).sorted.toSeq
    assert(canon(binned) === canon(naive))
    // boundary semantics: rt == lt included, rt == lt - W excluded
    assert(canon(binned).contains((1L, 1700000000000L, 1700000000000L, 1.0)))
    assert(!canon(binned).exists { case (k, lt, rt, _) => k == 1L && lt == 1700000001500L && rt == 1700000000500L })
    // the binned plan is an equi-join, not a broadcast nested loop
    val plan = binned.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"nested loop in plan:\n$plan")
  }

  test("AQE splits the skewed side of a sort-merge join at runtime") {
    // The join side of the UK ≈ 86% skew hazard (SURVEY §4.3): saltedAgg
    // covers aggregation, AQE's skew-join handles joins — demonstrated here
    // by asserting the final adaptive plan actually split the hot partition.
    val pad = "x" * 200
    val hot = (1 to 60000).map(i => (0L, s"$pad$i"))
    val cold = (1 to 2000).map(i => ((i % 50) + 1L, s"v$i"))
    val left = spark.createDataFrame(hot ++ cold).toDF("key", "payload")
    val right = spark.createDataFrame((0L to 50L).map(k => (k, s"dim_$k"))).toDF("key", "name")
    val prev = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes")
      .map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.0")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
      // keep payload in the output: column pruning would otherwise strip the
      // bytes that make the hot partition skewed
      val joined = left.join(right, Seq("key")).select("key", "payload", "name")
      // run THIS DataFrame's own query so its adaptive plan finalizes
      // (count() would plan a separate aggregate query)
      assert(joined.collect().length === 62000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"), s"expected AQE skew-join split in plan:\n$plan")
    } finally prev.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _))
    }
  }

  test("salted aggregation composes with Exact decimal sums (order-independent)") {
    val df = (1 to 5000).map(i => ("HOT", i * 0.01)).toDF("key", "v")
    val plain = df.groupBy("key").agg(Exact.dsum($"v").as("s")).head.getDouble(1)
    val salted = Skew.saltedAgg(df, Seq("key"),
      Seq((Exact.dsum($"v").as("s"), Exact.dsum(col("s")).as("s"))), salts = 8)
      .head.getDouble(1)
    assert(salted === plain)
  }

  test("mergeUpsert applies updates, inserts, and deletes via a broadcast anti join") {
    val base = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0), (4L, "d", 40.0))
      .toDF("k", "name", "bal")
    val changes = Seq(
      (2L, "b2", 99.0, false), // update
      (3L, "c", 30.0, true),   // delete
      (9L, "new", 1.0, false)) // insert
      .toDF("k", "name", "bal", "del")
    val merged = Output.mergeUpsert(base, changes, Seq("k"), Some("del"))
    val got = merged.collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
      .sortBy(_._1).toSeq
    assert(got === Seq((1L, "a", 10.0), (2L, "b2", 99.0), (4L, "d", 40.0), (9L, "new", 1.0)))
    // the scale contract: the base side is never shuffled — the changeset
    // broadcasts into a LeftAnti BroadcastHashJoin (a full-outer merge
    // could never do this; BHJ does not support full outer)
    val plan = merged.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"expected broadcast anti join in plan:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"base side was shuffled:\n$plan")
  }

  test("runtime bloom filter from a filtered dim prunes the fact scan rows") {
    // DPP (q_s9) prunes whole partitions; this is its row-level sibling —
    // Spark injects a bloom filter built from the filtered dim side into
    // the fact side's scan filter, so fact rows that cannot join are
    // dropped at the scan instead of riding the shuffle. At 100 TB this is
    // the difference between shuffling the table and shuffling the match.
    val dir = java.nio.file.Files.createTempDirectory("bloom").toString
    (1L to 200000L).map(i => (i % 1000, s"payload_$i")).toDF("fk", "payload")
      .write.mode("overwrite").parquet(s"$dir/fact")
    (0L until 1000L).map(i => (i, s"dim_$i", i % 100)).toDF("pk", "name", "cat")
      .write.mode("overwrite").parquet(s"$dir/dim")
    val prev = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")
      // keep the join a shuffle join: broadcast joins skip runtime filters
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val fact = spark.read.parquet(s"$dir/fact")
      val dim = spark.read.parquet(s"$dir/dim").filter($"cat" === 7)
      val joined = fact.join(dim, $"fk" === $"pk").select("fk", "payload", "name")
      assert(joined.count() === 2000L) // 10 surviving pks × 200 fact rows
      // prints as might_contain(scalar-subquery …) over bloom_filter_agg
      // of the dim keys, applied on the fact side before the exchange
      val plan = joined.queryExecution.optimizedPlan.toString
      assert(plan.contains("might_contain") && plan.contains("bloom_filter_agg"),
        s"no runtime bloom filter injected into the fact side:\n$plan")
    } finally prev.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _))
    }
  }

  test("exactRank equals the fully-sorted rank element, duplicates and extremes included") {
    // 20k values with heavy duplication and a skewed tail; cutoff forced
    // tiny so the histogram loop actually runs multiple levels
    val vals = (1 to 20000).map(i => ((i % 137).toDouble / 7.0) + (if (i % 997 == 0) 1e6 else 0.0))
    val df = vals.toDF("x").repartition(16)
    val sorted = vals.sorted
    for (rank <- Seq(1L, 17L, 10000L, 19999L, 20000L)) {
      val got = OrderStats.exactRank(df, "x", rank, bins = 32, cutoff = 50)
      assert(got === sorted(rank.toInt - 1), s"rank $rank: $got != ${sorted(rank.toInt - 1)}")
    }
  }

  test("Misra-Gries candidates form a superset of true heavy hitters, any partitioning") {
    // skewed stream: token h0..h4 get 500 each (heavy), 5000 singletons
    val heavy = (0 until 5).flatMap(h => Seq.fill(500)(s"h$h"))
    val noise = (0 until 5000).map(i => s"n$i")
    val toks = scala.util.Random.shuffle(heavy ++ noise)
    val n = toks.size.toDouble
    for (parts <- Seq(1, 3, 16)) {
      val ds = spark.createDataset(toks)(org.apache.spark.sql.Encoders.STRING)
        .repartition(parts)
      for (k <- Seq(20, 100)) {
        val cand = HeavyHitters.candidates(ds, k).collect().toSet
        val truth = toks.groupBy(identity).view.mapValues(_.size)
          .collect { case (t, c) if c > n / k => t }.toSet
        assert(truth.subsetOf(cand),
          s"parts=$parts k=$k lost heavy hitters: ${truth -- cand}")
        // and phase one is bounded: at most k survivors per partition
        assert(cand.size <= k * parts, s"candidate set exceeds k×partitions")
      }
    }
  }

  test("mergeUpsert without a delete flag upserts only") {
    val base = Seq((1L, 1.0), (2L, 2.0)).toDF("k", "v")
    val changes = Seq((2L, 5.0), (3L, 3.0)).toDF("k", "v")
    val got = Output.mergeUpsert(base, changes, Seq("k"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1).toSeq
    assert(got === Seq((1L, 1.0), (2L, 5.0), (3L, 3.0)))
  }

  test("saltedTopK equals the direct window on planted skew, phase 1 spreads the hot key") {
    import org.apache.spark.sql.expressions.Window
    // one hot key (80% of rows) + a long tail
    val rows = (0 until 4000).map { i =>
      val k = if (i % 5 != 0) "hot" else s"k${i % 37}"
      (k, i.toLong)
    }
    val df = rows.toDF("key", "id")
    val direct = df
      .withColumn("rk", row_number().over(
        Window.partitionBy("key").orderBy(md5(col("id").cast("string")), col("id"))))
      .filter(col("rk") <= 7)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    val salted = Skew.saltedTopK(df, Seq("key"),
        Seq(md5(col("id").cast("string")), col("id")), k = 7, salts = 8)
    val got = salted.collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    assert(got === direct)
    // the plan really runs two windows, the first over (key, _salt)
    val plan = salted.queryExecution.executedPlan.toString
    assert("(?s)Window.*Window".r.findFirstIn(plan).isDefined, s"expected two windows:\n$plan")
    assert(plan.contains("_salt"), s"phase 1 must partition by the salt:\n$plan")
  }

  test("salted url dedup (q_t25b) equals the window form; both phases key on _salt") {
    val d = "/root/testdata/sf0.001"
    val direct = graft.queries.Corpus.all("q_t25_url_canonical")(spark, d)
      .collect().map(_.toSeq).toSet
    val saltedDf = graft.queries.Corpus.all("q_t25b_salted_urls")(spark, d)
    val salted = saltedDf.collect().map(_.toSeq).toSet
    assert(salted === direct)
    // the plan is the two-phase aggregate shape: a (url_canon, _salt)
    // partial aggregate, a url_canon combine, and NO window over the raw
    // rows (the single-partition hot-key funnel q_t25b exists to avoid)
    val plan = saltedDf.queryExecution.executedPlan.toString
    assert(plan.contains("_salt"), s"phase 1 must key on the salt:\n$plan")
    assert(!plan.contains("Window"), s"salted form must not fall back to a window:\n$plan")
  }

  test("saltedTopK saltOn spreads exact-duplicate rows across salts") {
    import org.apache.spark.sql.expressions.Window
    // a hot key whose rows are IDENTICAL except for a unique id column:
    // salting on the all-columns hash would put the payload-identical rows
    // in few buckets; saltOn(id) spreads them uniformly
    val rows = (0 until 1000).map(i => ("hot", "same-payload", i.toLong))
    val df = rows.toDF("key", "payload", "id")
    val salted = Skew.saltedTopK(df, Seq("key"), Seq(col("id")), k = 5,
      salts = 8, saltOn = Some(col("id")))
    // still result-identical to the direct window (ord is total via id)
    val direct = df
      .withColumn("rk", row_number().over(
        Window.partitionBy("key").orderBy(col("id"))))
      .filter(col("rk") <= 5)
      .collect().map(r => (r.getString(0), r.getLong(2), r.getInt(3))).toSet
    val got = salted.collect().map(r => (r.getString(0), r.getLong(2), r.getInt(3))).toSet
    assert(got === direct)
    // and the salt really keys off id: all 8 salt values are populated
    val nSalts = df.withColumn("_salt", pmod(hash(col("id")), lit(8)))
      .select("_salt").distinct().count()
    assert(nSalts === 8L)
  }
}
