package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DateType, TimestampNTZType, TimestampType}

import scala.collection.concurrent.TrieMap

import graft.Lineage.TruncateOps
import graft.Tables
import graft.dedup.Dedup
import graft.forecast.Forecast
import graft.functions.{Exact, GraftFunctions}
import graft.multimodal.Multimodal
import graft.similarity.{Ann, Ivf}
import graft.text.TextFunctions

/** The operator corpus: one named query per implemented operator from
  * SURVEY.md §2, each runnable on a testdata scale-factor directory and (for
  * the SQL-expressible ones) hash-checked against DuckDB via
  * [[graft.queries.Oracle]].
  *
  * Every query ends in a deterministic total order so results are
  * reproducible row-for-row across engines and partitionings.
  */
object Corpus {
  type Q = (SparkSession, String) => DataFrame

  /** The daily grain is the shared input of ~half the corpus; cache it per
    * (session, sfDir) so a Verify/Bench sweep materializes the
    * scan→join→aggregate lineage once — the same cache()+count() idiom the
    * reference uses for its feature frame (Sales_forecast_pyspark.py:649-651). */
  private val dailyCache = TrieMap.empty[(SparkSession, String), DataFrame]

  private def daily(s: SparkSession, d: String): DataFrame =
    dailyCache.getOrElseUpdate((s, d), {
      val df = Forecast.dailySales(Tables.salesLines(s, d)).cache()
      df.count()
      df
    })

  /** Pre-materializes the shared daily cache. Bench calls this before the
    * timed sweep so the scan→join→aggregate cache build (3-12s at sf0.1 per
    * PERF.md) can never land inside an arbitrary query's timing — the
    * mechanism behind the unexplained q_w6/q_w7 regressions in BENCH_r02. */
  def warmShared(s: SparkSession, d: String): Unit = daily(s, d)

  private val dailyKeys = Seq("Country", "StockCode", "InvoiceDate")

  private def keyCols: Seq[Column] = dailyKeys.map(col)

  // ---- scans / aggregations -------------------------------------------------

  /** A1: global count. */
  def scanCount(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d).agg(count(lit(1)).as("n"))

  /** A2: (Year, Month) date-range profile of orders. */
  def dateProfile(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select(
        year(col("o_orderdate")).as("Year"),
        month(col("o_orderdate")).as("Month"),
        col("o_orderkey"),
        to_date(col("o_orderdate")).as("odate"))
      .groupBy("Year", "Month")
      .agg(
        min("o_orderkey").as("min_orderkey"),
        max("o_orderkey").as("max_orderkey"),
        min("odate").as("min_date"),
        max("odate").as("max_date"),
        count(lit(1)).as("n_orders"))
      .orderBy("Year", "Month")

  /** A3: the core daily aggregation (flagship). */
  def dailySales(s: SparkSession, d: String): DataFrame =
    daily(s, d).orderBy(keyCols: _*)

  /** A4: monthly rollup over the daily grain. */
  def monthlyRollup(s: SparkSession, d: String): DataFrame =
    daily(s, d)
      .groupBy("Year", "Month")
      .agg(
        sum("NetDailyQuantity").as("total_qty"),
        Exact.dsum(col("NetDailyRevenue")).as("total_revenue"))
      .orderBy("Year", "Month")

  /** A5 + O2/O3: country rollup, top-15 by quantity (TakeOrderedAndProject). */
  def countryTopK(s: SparkSession, d: String): DataFrame =
    daily(s, d)
      .groupBy("Country")
      .agg(sum("NetDailyQuantity").as("total_qty"))
      .orderBy(col("total_qty").desc, col("Country").asc)
      .limit(15)

  /** A6: day-of-week rollup. */
  def dowRollup(s: SparkSession, d: String): DataFrame =
    daily(s, d)
      .groupBy("DayOfWeek")
      .agg(sum("NetDailyQuantity").as("total_qty"), count(lit(1)).as("n_days"))
      .orderBy("DayOfWeek")

  /** A7: daily totals across all series. */
  def dailyTotals(s: SparkSession, d: String): DataFrame =
    daily(s, d)
      .groupBy("InvoiceDate")
      .agg(sum("NetDailyQuantity").as("total_qty"))
      .orderBy("InvoiceDate")

  /** A11: exact median per group (grouped percentile). */
  def percentileByPart(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy("l_partkey")
      .agg(percentile(col("l_quantity"), lit(0.5)).as("med_qty"), count(lit(1)).as("n"))
      .orderBy("l_partkey")

  /** Hierarchical ROLLUP totals (grouping-sets family; beyond the reference
    * surface, which used flat groupBy only). Uses the spark.sql surface: the
    * Dataset rollup() API trips Spark 4's ambiguous-self-join detector when
    * the child's lineage contains a join (grouping sets duplicate the
    * grouping attributes); SQL-path resolution is unaffected. */
  def rollupTotals(s: SparkSession, d: String): DataFrame = {
    daily(s, d).createOrReplaceTempView("graft_daily")
    s.sql(
      """SELECT Year, Month,
        |       SUM(NetDailyQuantity) AS total_qty,
        |       COUNT(1) AS n_days
        |FROM graft_daily GROUP BY ROLLUP(Year, Month)
        |ORDER BY Year ASC NULLS FIRST, Month ASC NULLS FIRST""".stripMargin)
  }

  /** A19: explicit GROUPING SETS — per-country totals, per-year totals, and
    * the grand total in one pass with grouping flags (completes the
    * grouping-sets family next to ROLLUP/CUBE). SQL path for the same
    * Spark-4 self-join-detector reason as rollupTotals. One shuffle: Expand
    * replicates each row once per set before the hash aggregate, so the cost
    * is (#sets × input) map-side, never a second exchange. */
  def groupingSetsTotals(s: SparkSession, d: String): DataFrame = {
    daily(s, d).createOrReplaceTempView("graft_daily_gs")
    s.sql(
      """SELECT Country, Year,
        |       SUM(NetDailyQuantity) AS total_qty,
        |       COUNT(1) AS n_rows,
        |       CAST(grouping(Country) AS INT) AS g_country,
        |       CAST(grouping(Year) AS INT) AS g_year
        |FROM graft_daily_gs
        |GROUP BY GROUPING SETS ((Country), (Year), ())
        |ORDER BY g_country ASC, g_year ASC,
        |         Country ASC NULLS FIRST, Year ASC NULLS FIRST""".stripMargin)
  }

  /** A20: bivariate statistics (corr / covariance / variance / OLS slope +
    * intercept) of extended price vs quantity per return flag, derived from
    * EXACT integer moments: quantities are integral and prices 2-dp by data
    * contract, so (x, y·100) are lossless BIGINTs whose DECIMAL(38,0) sums
    * are order-independent — the moment pass is one map-side-combinable
    * aggregate that is bit-reproducible on any partitioning (the property
    * float-accumulating corr/covar_samp built-ins cannot give at 100 TB),
    * and the closed-form stats are a few IEEE ops on identical inputs. */
  def momentStats(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val dec = DecimalType(38, 0)
    val x = col("l_quantity").cast("long")
    val y = round(col("l_extendedprice") * 100).cast("long")
    val m = Tables.lineitem(s, d)
      .select(col("l_returnflag"), x.as("x"), y.as("y"))
      .groupBy("l_returnflag")
      .agg(
        count(lit(1)).as("n"),
        sum(col("x").cast(dec)).as("sx"),
        sum(col("y").cast(dec)).as("sy"),
        sum((col("x") * col("x")).cast(dec)).as("sxx"),
        sum((col("x") * col("y")).cast(dec)).as("sxy"),
        sum((col("y") * col("y")).cast(dec)).as("syy"))
    val (n, sx, sy, sxx, sxy, syy) = (
      col("n").cast("double"), col("sx").cast("double"), col("sy").cast("double"),
      col("sxx").cast("double"), col("sxy").cast("double"), col("syy").cast("double"))
    m.select(
      col("l_returnflag"),
      col("n"),
      ((n * sxy - sx * sy) / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)))
        .as("corr_qty_price"),
      ((sxy - sx * sy / n) / (n - lit(1.0)) / lit(100.0)).as("covar_samp"),
      ((sxx - sx * sx / n) / n).as("var_pop_qty"),
      ((n * sxy - sx * sy) / (n * sxx - sx * sx) / lit(100.0)).as("slope"),
      (sy / n / lit(100.0) - (n * sxy - sx * sy) / (n * sxx - sx * sx) / lit(100.0) * (sx / n))
        .as("intercept"))
      .orderBy("l_returnflag")
  }

  /** A21: custom typed Aggregator (the udaf extension point) — quantity-
    * weighted mean unit price per return flag through
    * [[graft.functions.TypedAggs.WeightedMeanPrice]]'s exact scaled-Long
    * state. The oracle recomputes the same integer moments in SQL, so the
    * custom aggregate's partial/merge/finish path is hash-gated, not just
    * spec-checked. */
  def typedWeightedMean(s: SparkSession, d: String): DataFrame = {
    val wm = udaf(graft.functions.TypedAggs.WeightedMeanPrice)
    Tables.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(
        wm(col("l_extendedprice"), col("l_quantity")).as("wmean_price"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag")
  }

  /** Distinct-count aggregation (exact). */
  def countDistinctParts(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        count(lit(1)).as("n_rows"))
      .orderBy("l_returnflag")

  /** Approximate distinct (HLL sketch — engine-specific, rows-only check). */
  def approxDistinct(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(approx_count_distinct(col("l_partkey")).as("approx_parts"))
      .orderBy("l_returnflag")

  /** A25: COUNT-MIN SKETCH point queries — build the fixed 4×64 grid over
    * event user_ids, then estimate the top-20 heaviest users against their
    * exact counts. Every estimate must satisfy cms_n ≥ exact_n (CMS never
    * undercounts); with literal hash coefficients the whole grid is
    * bit-reproducible in SQL, so the oracle checks the sketch itself, not
    * just the inequality. */
  /** The q_a25/q_e12 probe set: events plus the top-20 exact-heaviest
    * users — one definition so both sketches answer the same questions. */
  private def cmsProbes(s: SparkSession, d: String): (DataFrame, DataFrame) = {
    val ev = Tables.events(s, d).select("user_id")
    (ev, ev.groupBy("user_id").agg(count(lit(1)).as("exact_n"))
      .orderBy(col("exact_n").desc, col("user_id")).limit(20))
  }

  def countMinUsers(s: SparkSession, d: String): DataFrame = {
    val (ev, probes) = cmsProbes(s, d)
    val sketch = graft.operators.Sketches.countMin(ev, "user_id")
    graft.operators.Sketches.cmsEstimate(sketch, probes, "user_id")
      .orderBy("user_id")
  }

  /** A26: DATASET CARD — the per-source summary a corpus release ships:
    * doc/char/token totals, language spread, exact-duplicate rate
    * (fingerprint groups), and mean quality (floor-quantized exact mean).
    * One aggregate pass; every stat is integer or IEEE-exact. */
  def datasetCard(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(
        col("source"), col("lang"), col("n_chars"), col("doc_id"),
        TextFunctions.bpeTokenCount(col("text")).cast("long").as("n_tokens"),
        TextFunctions.fingerprintMd5(col("text")).as("fp"),
        TextFunctions.qualityScore(col("text")).as("quality"))
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"),
        sum(col("n_tokens")).as("total_tokens"),
        countDistinct(col("lang")).as("n_langs"),
        sum(when(col("lang") === "en", 1L).otherwise(0L)).as("en_docs"),
        (count(lit(1)) - countDistinct(col("fp"))).as("n_exact_dups"),
        Exact.floorAvg(col("quality"), 9).as("avg_quality"))
      .orderBy("source")

  /** Ranking / navigation / cumulative windows over the daily series:
    * row_number, lead, running sum (beyond the reference surface, which used
    * only lag + trailing frames). */
  def rankingWindows(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("Country", "StockCode").orderBy("InvoiceDate")
    val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cw = Window.partitionBy("Country").orderBy(col("InvoiceDate"))
    daily(s, d)
      .select(
        keyCols ++ Seq(
          row_number().over(w).as("rn"),
          lead(col("NetDailyQuantity"), 1).over(w).as("next_qty"),
          sum(col("NetDailyQuantity")).over(cum).as("cum_qty"),
          rank().over(cw).as("date_rank"),
          dense_rank().over(cw).as("date_dense_rank"),
          ntile(4).over(w).as("quartile")): _*)
      .orderBy(keyCols: _*)
  }

  // ---- projections / filters ------------------------------------------------

  /** P1 + P3: projection with a pushed-down ship-date range predicate. */
  def projFilter(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(
        col("l_shipdate") >= to_timestamp(lit("1998-01-01 00:00:00")) &&
          col("l_shipdate") < to_timestamp(lit("1998-04-01 00:00:00")))
      .select(
        col("l_orderkey"), col("l_linenumber"), col("l_partkey"), col("l_quantity"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
      .orderBy("l_orderkey", "l_linenumber")

  /** P4: string equality filter. */
  def segmentFilter(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .filter(col("c_mktsegment") === "BUILDING")
      .select("c_custkey", "c_name", "c_acctbal")
      .orderBy("c_custkey")

  /** P5: boolean train/test split flag cast to int. */
  def splitFlag(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select(
        col("o_orderkey"),
        (col("o_orderdate") <= to_timestamp(lit("1998-06-30 00:00:00"))).cast("int").as("is_train"))
      .orderBy("o_orderkey")

  /** P8: seeded Bernoulli sample (no SQL oracle — engine-specific RNG). */
  def sampleCount(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d).sample(withReplacement = false, 0.2, 42).agg(count(lit(1)).as("n"))

  // ---- dedup ----------------------------------------------------------------

  /** D1: distinct full-row count. */
  def distinctCount(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d).distinct().agg(count(lit(1)).as("n"))

  /** D2: exact dedup of documents — keep min doc_id per identical text. */
  def dedupExact(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .groupBy("text")
      .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_copies"))
      .select("keep_id", "n_copies")
      .orderBy("keep_id")

  // ---- joins ----------------------------------------------------------------

  /** J1: left join on a single key with null repair (P7). */
  def joinLeft(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
    val c = Tables.customer(s, d).select("c_custkey", "c_name")
    o.join(broadcast(c), o("o_custkey") === c("c_custkey"), "left")
      .select(
        col("o_orderkey"), col("o_totalprice"),
        coalesce(col("c_name"), lit("UNKNOWN")).as("cust_name"))
      .orderBy("o_orderkey")
  }

  /** J2: 3-column composite-key left join — daily grain joined to its MA
    * baseline frame (the evaluation-join shape). */
  def joinComposite(s: SparkSession, d: String): DataFrame = {
    val dl = daily(s, d)
    val base = Forecast.maBaseline(dl).select(
      col("Country"), col("StockCode"), col("InvoiceDate"), col("baseline_qty"))
    dl.select(keyCols :+ col("NetDailyQuantity"): _*)
      .join(base, dailyKeys, "left")
      .orderBy(keyCols: _*)
  }

  /** J3: inner join rollup. */
  def joinInner(s: SparkSession, d: String): DataFrame = {
    val n = Tables.nation(s, d)
    val r = Tables.region(s, d)
    n.join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy("r_name")
      .agg(count(lit(1)).as("n_nations"))
      .orderBy("r_name")
  }

  /** J9: explicit join-strategy control — the SHUFFLE_HASH hint forces a
    * ShuffledHashJoin where the planner would default to sort-merge
    * (plan-asserted in OperatorsSpec). At 100 TB this is the knob that
    * matters when one side fits per-partition memory but not the broadcast
    * threshold: hash-build beats sorting both sides. The hint cannot change
    * semantics — the oracle is the plain join. */
  def joinShuffleHash(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d).select("l_orderkey", "l_extendedprice")
    val o = Tables.orders(s, d).select(col("o_orderkey"), col("o_orderdate"))
    li.join(o.hint("shuffle_hash"), col("l_orderkey") === col("o_orderkey"))
      .groupBy(year(col("o_orderdate")).as("Year"))
      .agg(Exact.dsum(col("l_extendedprice")).as("total_price"), count(lit(1)).as("n"))
      .orderBy("Year")
  }

  /** J13: BLOOM-PRUNED JOIN — a selective dimension (urgent 1997 orders)
    * builds a bloom filter over its keys; the lineitem scan is pre-filtered
    * with the codegen'd might_contain probe BEFORE the shuffle, then the
    * exact join removes false positives. The result is bit-identical to the
    * plain join (the oracle IS the plain join) — what changes is the
    * physical shape: at scale, only might-match fact rows reach the
    * exchange. Plan-asserted in BloomPruneSpec. */
  def bloomPrunedJoin(s: SparkSession, d: String): DataFrame = {
    val dim = Tables.orders(s, d)
      .filter(col("o_orderpriority") === "1-URGENT" && year(col("o_orderdate")) === 1997)
      .select("o_orderkey", "o_orderdate")
    val fact = Tables.lineitem(s, d).select("l_orderkey", "l_quantity", "l_extendedprice")
    val pruned = graft.operators.BloomPrune.pruneFact(fact, "l_orderkey", dim, "o_orderkey")
    pruned.join(dim, col("l_orderkey") === col("o_orderkey"))
      .groupBy(month(col("o_orderdate")).as("Month"))
      .agg(
        sum(col("l_quantity").cast("long")).as("total_qty"),
        Exact.dsum(col("l_extendedprice")).as("total_price"),
        count(lit(1)).as("n_lines"))
      .orderBy("Month")
  }

  /** Left-semi join (EXISTS). */
  def joinSemi(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
    val o = Tables.orders(s, d).select("o_custkey")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")
  }

  /** Left-anti join (NOT EXISTS). */
  def joinAnti(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
    val o = Tables.orders(s, d).select("o_custkey")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")
  }

  // ---- set ops --------------------------------------------------------------

  /** U1: segment split recombined with unionByName. */
  def unionSegments(s: SparkSession, d: String): DataFrame = {
    val dl = daily(s, d)
    def seg(p: Column, label: String): DataFrame =
      dl.filter(p)
        .groupBy("Country")
        .agg(sum("NetDailyQuantity").as("total_qty"))
        .withColumn("segment", lit(label))
    seg(col("Country") === "NATION_0", "uk")
      .unionByName(seg(col("Country") =!= "NATION_0", "others"))
      .orderBy("segment", "Country")
  }

  /** U2: INTERSECT / EXCEPT set operations (absent from the reference, which
    * used only unionByName): countries selling part 1 vs part 2 — both ops
    * in one result, distinct-set semantics. */
  def setOps(s: SparkSession, d: String): DataFrame = {
    val dl = daily(s, d)
    def countries(stock: String) =
      dl.filter(col("StockCode") === stock).select("Country")
    val both = countries("1").intersect(countries("2"))
      .withColumn("op", lit("intersect"))
    val only1 = countries("1").except(countries("2"))
      .withColumn("op", lit("except"))
    both.unionByName(only1).orderBy("op", "Country")
  }

  /** J10: FULL OUTER join — per-country totals of two parts whose seller
    * sets only partially overlap, so nulls appear on BOTH sides (completes
    * the join-type family: inner/left/semi/anti/asof/interval/bucketed/
    * hinted/full). */
  def joinFull(s: SparkSession, d: String): DataFrame = {
    val dl = daily(s, d)
    def tot(stock: String, alias: String) =
      dl.filter(col("StockCode") === stock)
        .groupBy("Country")
        .agg(sum("NetDailyQuantity").as(alias))
    tot("1", "qty_p1")
      .join(tot("2", "qty_p2"), Seq("Country"), "full_outer")
      .orderBy("Country")
  }

  /** O7: pagination — global sort + OFFSET/LIMIT (the page-k fetch an
    * engine user needs beyond top-k; Spark's GlobalLimit/Offset composition
    * ships only the page across the final exchange). */
  def sortOffset(s: SparkSession, d: String): DataFrame =
    daily(s, d)
      .select(keyCols :+ col("NetDailyQuantity"): _*)
      .orderBy(keyCols: _*)
      .offset(100)
      .limit(200)

  /** F8: cryptographic content hashes (md5 / sha2-256) — the
    * content-addressing primitives (dedup keys, cache keys, provenance ids)
    * every corpus pipeline leans on; both produce lowercase hex identically
    * across engines. */
  def hashFunctions(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(
        col("doc_id"),
        md5(col("text").cast("binary")).as("md5_hex"),
        sha2(col("text").cast("binary"), 256).as("sha256_hex"))
      .orderBy("doc_id")

  /** U3: UNPIVOT (wide → long melt) of the per-country KPI frame — three
    * metric columns become (metric, value) rows. The Unpivot node is pure
    * map-side Expand (3× fan-out, no shuffle); at 100 TB melting is free
    * relative to the aggregate that feeds it. */
  def unpivotKpis(s: SparkSession, d: String): DataFrame = {
    val wide = daily(s, d)
      .groupBy("Country")
      .agg(
        sum("NetDailyQuantity").cast("double").as("total_qty"),
        Exact.dsum(col("NetDailyRevenue")).as("total_rev"),
        count(lit(1)).cast("double").as("n_days"))
    wide.unpivot(
      Array(col("Country")),
      Array(col("total_qty"), col("total_rev"), col("n_days")),
      "metric", "value")
      .orderBy("Country", "metric")
  }

  /** J6: as-of join (extension — Spark has no native ASOF): each purchase
    * event paired with the same user's most recent prior-or-simultaneous
    * click, via the union+window composition in [[AsofJoin]] (one shuffle,
    * no range-join pair expansion). Clicks are pre-aggregated to unique
    * (user, ts) per the operator's contract. */
  def asofClicks(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts", "value")
    val clicks = ev.filter(col("event_type") === "click")
      .groupBy("user_id", "ts").agg(max("value").as("click_value"))
    graft.operators.AsofJoin
      .asofJoin(purchases, clicks, Seq("user_id"), "ts", "ts", Seq("click_value"))
      .withColumnRenamed("asof_time", "click_ts")
      .withColumnRenamed("asof_click_value", "click_value")
      .orderBy("event_id")
  }

  /** J7: bounded-interval range join (binned equi-join, [[graft.operators.RangeJoin]])
    * — every click within the 30 minutes preceding each purchase; the batch
    * twin of the watermarked stream-stream interval join in graft.streaming. */
  def intervalClicks(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("click_ts"), col("value").as("click_value"))
    graft.operators.RangeJoin
      .intervalJoin(purchases, clicks, Seq("user_id"), "ts", "click_ts", 30L * 60 * 1000)
      .orderBy("event_id", "click_ts")
  }

  /** A15: single-pass column profiler, unpivoted with stack() — the data
    * validation sweep run before any 100 TB training job (one scan computes
    * every column's stats; stack reshapes wide→long without a join). */
  def columnProfile(s: SparkSession, d: String): DataFrame = {
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount")
    val aggs = cols.flatMap { c =>
      Seq(
        min(col(c)).cast("double").as(s"min_$c"),
        max(col(c)).cast("double").as(s"max_$c"),
        (count(lit(1)) - count(col(c))).as(s"nulls_$c"))
    } :+ count(lit(1)).as("n_rows")
    val stackArgs = cols
      .map(c => s"'$c', min_$c, max_$c, nulls_$c")
      .mkString(s"stack(${cols.size}, ", ", ", ")")
    Tables.lineitem(s, d)
      .agg(aggs.head, aggs.tail: _*)
      .selectExpr(s"$stackArgs AS (column_name, min_val, max_val, n_nulls)", "n_rows")
      .orderBy("column_name")
  }

  /** T6: BM25 retrieval top-k for a literal term query (map-side postings
    * pruning + broadcast stats — see graft.text.Bm25). */
  def bm25TopK(s: SparkSession, d: String): DataFrame =
    graft.text.Bm25.topK(Tables.documents(s, d), "doc_id", "text",
      terms = Seq("spark", "merge", "window", "stream"), k = 25)

  // ---- training-data curation ----------------------------------------------

  /** P9: deterministic stratified sampling — the reproducible 100 TB
    * alternative to seeded RNG `sample()` (whose output depends on partition
    * layout): keep a doc iff the first hex byte of md5(doc_id) clears a
    * per-stratum threshold (en ≈ 50%, other languages ≈ 12.5%). The
    * decision is a pure per-row function of the key, so the sample is
    * identical on any cluster, any partitioning, any engine — which is what
    * makes it oracle-checkable, and what makes training mixes reproducible. */
  def hashSample(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .filter(
        substring(md5(col("doc_id").cast("string")), 1, 2) <
          when(col("lang") === "en", lit("80")).otherwise(lit("20")))
      .select("doc_id", "lang", "source")
      .orderBy("doc_id")

  /** P11: deterministic WEIGHTED sampling (Efraimidis–Spirakis exponential
    * race): each doc gets a hash-derived uniform u = hex32(md5(id))/2³²
    * and race key ln(u)/weight; the top-k by key IS a weighted sample
    * without replacement (longer docs proportionally likelier). Everything
    * is a pure per-row function of the key — no RNG, no partition
    * dependence. ln() is the one step engines may differ on (JVM's log
    * intrinsic vs C libm disagree by 1 ulp on some inputs — observed at
    * doc 264), so the race key is quantized to integer nanos: a 1-ulp
    * input wobble (~5e-20) moves the ×1e9 floor only if the key sits
    * within 5e-11 of a grid line, and ordering ties on the grid resolve
    * by doc_id identically in both engines. Scale shape: map-side keys +
    * TakeOrderedAndProject; no global sort, only k winners move. */
  def weightedSample(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .withColumn("u",
        conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
          .cast("long").cast("double") / lit(4294967296.0))
      .withColumn("wkey_nanos",
        floor(log(col("u")) / col("n_chars").cast("double") * lit(1e9)).cast("long"))
      .select("doc_id", "lang", "n_chars", "wkey_nanos")
      .orderBy(col("wkey_nanos").desc, col("doc_id"))
      .limit(50)

  /** P12: K-FOLD ASSIGNMENT — the deterministic cross-validation split:
    * fold = hex32(md5(doc_id)) mod 5, a pure function of the key (no RNG,
    * no partition dependence — the q_p9 discipline), reported as per-(fold,
    * lang) stratification counts so imbalance is visible. Map-side fold
    * derivation + one hash aggregate; folds are disjoint and exhaustive by
    * construction. */
  def kfoldSplit(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .withColumn("fold",
        (conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
          .cast("long") % 5).cast("int"))
      .groupBy("fold", "lang")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars"))
      .orderBy("fold", "lang")

  /** T17: HASHED TF-IDF FEATURES — the vocabulary-free text vectorizer
    * (hashing trick): tokens hash into 256 fixed buckets (hex16(md5) mod
    * 256 — engine-identical, unlike murmur), per-(doc, bucket) tf, smoothed
    * idf = ln((N+1)/(df+1)), and each doc keeps its top-3 buckets by
    * weight. No vocab table, no fit step — the property that makes feature
    * hashing THE text vectorizer at 100 TB (a vocabulary would itself be a
    * giant shuffle + dictionary broadcast). Weights are floor-scaled to
    * integer micros (the q_t6 ln discipline) so the oracle matches
    * bit-for-bit. */
  def hashedTfidf(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tf = Tables.documents(s, d)
      .select(col("doc_id"),
        explode(TextFunctions.tokens(TextFunctions.normText(col("text")))).as("term"))
      .withColumn("bucket",
        (conv(substring(md5(col("term")), 1, 4), 16, 10).cast("long") % 256).cast("int"))
      .groupBy("doc_id", "bucket").agg(count(lit(1)).as("tf"))
    val nDocs = Tables.documents(s, d).agg(count(lit(1)).as("n_docs"))
    val dfreq = tf.groupBy("bucket").agg(count(lit(1)).as("df"))
    tf.join(broadcast(dfreq), Seq("bucket"))
      .crossJoin(broadcast(nDocs))
      .withColumn("w_micro",
        floor(col("tf").cast("double") *
          log((col("n_docs") + 1).cast("double") / (col("df") + 1).cast("double")) *
          lit(1e6)).cast("long"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("doc_id").orderBy(col("w_micro").desc, col("bucket"))))
      .filter(col("rk") <= 3)
      .select("doc_id", "rk", "bucket", "tf", "w_micro")
      .orderBy("doc_id", "rk")
  }

  /** Score formula text shared verbatim with the DuckDB oracle: fixed-order
    * IEEE arithmetic over the broadcast betas and integer features, so the
    * predicted score is bit-identical in both engines (the NormalEq
    * discipline applied at inference time). */
  private val ClassifierScoreExpr: String =
    "beta_0 + beta_1 * CAST(x1 AS DOUBLE) + beta_2 * CAST(x2 AS DOUBLE) + beta_3 * CAST(x3 AS DOUBLE)"

  /** T21: TRAINED QUALITY CLASSIFIER — the fastText-classifier step of
    * CCNet/FineWeb-style pipelines, deterministic end to end: hashed-TF-IDF
    * features (q_t17's vocabulary-free construction collapsed to three
    * integer per-doc statistics), labels from the heuristic quality score
    * on a 20% md5-fold slice (standing in for human labels), a closed-form
    * ridge fit on DECIMAL sufficient statistics (q_ml3's hash-gateable
    * solver), and a broadcast-betas scoring pass over every doc. Fit AND
    * inference are oracle-exact: the oracle recomputes the same features,
    * the same exact-integer normal equations, the same generated
    * elimination text, and the same fixed-order score expression. Scale
    * shape: two corpus scans (features, scoring), one tiny stats shuffle,
    * betas broadcast — no iteration, no driver-side data. */
  def qualityClassifier(s: SparkSession, d: String): DataFrame =
    classifierScores(s, d)
      .select(col("doc_id"), col("score"),
        (col("score") >= lit(450.0)).as("kept"))
      .orderBy("doc_id")

  /** ML6: CLASSIFIER OPERATING-POINT SWEEP — the threshold-selection step
    * that follows every trained quality gate: confusion counts (tp/fp/fn/tn)
    * and precision/recall/F1 at five score thresholds, evaluated against
    * the heuristic-quality labels on the HELD-OUT 80% (the md5 folds the
    * fit never saw — q_t21 trains on fold 0 only). Counts are exact
    * integers; the ratios are single fixed-order IEEE expressions shared
    * verbatim with the oracle, so the whole curve is hash-gateable. Scale
    * shape: one scored scan × a 5-literal threshold explode → a 5-row
    * aggregate (map-side partials); nothing but the curve crosses the
    * shuffle. */
  def classifierThresholdSweep(s: SparkSession, d: String): DataFrame = {
    val heldOut = Tables.documents(s, d)
      .select(col("doc_id"),
        (TextFunctions.qualityScore(col("text")) >= lit(0.35)).as("is_pos"))
      .filter(conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long") % 5 =!= 0)
    classifierScores(s, d)
      .join(heldOut, Seq("doc_id"))
      .withColumn("thr", explode(array(Seq(350, 400, 450, 500, 550).map(lit): _*)))
      .groupBy("thr")
      .agg(
        sum(when(col("score") >= col("thr").cast("double") && col("is_pos"), 1L).otherwise(0L)).as("tp"),
        sum(when(col("score") >= col("thr").cast("double") && !col("is_pos"), 1L).otherwise(0L)).as("fp"),
        sum(when(col("score") < col("thr").cast("double") && col("is_pos"), 1L).otherwise(0L)).as("fn"),
        sum(when(col("score") < col("thr").cast("double") && !col("is_pos"), 1L).otherwise(0L)).as("tn"))
      .withColumn("prec", when(col("tp") + col("fp") === 0L, lit(0.0))
        .otherwise(col("tp").cast("double") / (col("tp") + col("fp")).cast("double")))
      .withColumn("rec", when(col("tp") + col("fn") === 0L, lit(0.0))
        .otherwise(col("tp").cast("double") / (col("tp") + col("fn")).cast("double")))
      .withColumn("f1", when(col("prec") + col("rec") === 0.0, lit(0.0))
        .otherwise(lit(2.0) * col("prec") * col("rec") / (col("prec") + col("rec"))))
      .orderBy("thr")
  }

  /** TP7: the tp1 cleaning chain with the TRAINED classifier as the stage-1
    * gate (score ≥ 450 instead of the heuristic quality ≥ 0.35) — the shape
    * CCNet/FineWeb run in production: fit a model, gate on its score, then
    * dedup. Composed entirely from oracle-proven parts and hash-gated end
    * to end by one SQL replay. */
  def cleanCorpusClassified(s: SparkSession, d: String): DataFrame =
    graft.pipeline.CorpusCleaner.cleanClassified(
      s, Tables.documents(s, d), classifierScores(s, d), minScore = 450.0)

  /** The FROZEN classifier model: betas + the corpus-wide df table (256
    * rows) + n_docs. This is what production ships to the scoring tier —
    * per-doc features depend only on the doc's own tokens plus these
    * frozen statistics, so any slice (a micro-batch, a new shard) scores
    * identically to a full-corpus pass. */
  private case class DocClassifier(betas: Seq[Double], dfreq: Seq[(Int, Long)], nDocs: Long)

  /** Fit once per (session, sf) — the trainedMerges discipline: the model
    * IS driver state (4 betas + 256 df rows + 1 count), so repeat scorings
    * (q_t21, q_tp7, q_e13, bench re-runs) skip the label scan + stats
    * aggregate entirely. */
  private def classifierModel(s: SparkSession, d: String): DocClassifier =
    modelCache.getOrElseUpdate((s, d), {
      val docs = Tables.documents(s, d)
      val tf = bucketTf(docs)
      val nDocs = docs.count()
      val dfreq = tf.groupBy("bucket").agg(count(lit(1)).as("df"))
        .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
      val feats = docFeatures(s, docs, dfreq, nDocs).truncateLineage()
      val labeled = docs
        .select(col("doc_id"),
          floor(TextFunctions.qualityScore(col("text")) * 1000).cast("long").as("label_milli"))
        .filter((conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
          .cast("long") % 5) === 0)
        .join(feats, Seq("doc_id"))
      val row = graft.ml.NormalEq.ridgeFit(
        labeled, Seq.empty, Seq(col("x1"), col("x2"), col("x3")),
        col("label_milli"), lambda = 10L)
        .select("beta_0", "beta_1", "beta_2", "beta_3").head()
      DocClassifier((0 until 4).map(row.getDouble), dfreq, nDocs)
    })

  private def bucketTf(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"),
        explode(TextFunctions.tokens(TextFunctions.normText(col("text")))).as("term"))
      .withColumn("bucket",
        (conv(substring(md5(col("term")), 1, 4), 16, 10).cast("long") % 256).cast("int"))
      .groupBy("doc_id", "bucket").agg(count(lit(1)).as("tf"))

  /** (x1, x2, x3) per doc from the doc's own tokens + the frozen stats. */
  private def docFeatures(
      s: SparkSession, docs: DataFrame, dfreq: Seq[(Int, Long)], nDocs: Long): DataFrame = {
    import s.implicits._
    val dfTable = dfreq.toDF("bucket", "df")
    bucketTf(docs).join(broadcast(dfTable), Seq("bucket"))
      .withColumn("w_micro",
        floor(col("tf").cast("double") *
          log(lit(nDocs + 1).cast("double") / (col("df") + 1).cast("double")) *
          lit(1e6)).cast("long"))
      .groupBy("doc_id")
      .agg(sum(col("w_micro")).as("x1"),
        count(lit(1)).as("x2"),
        max(col("w_micro")).as("x3"))
  }

  /** Score any doc slice with the frozen model (stateless — the q_e13
    * streaming scorer applies this per micro-batch). */
  private def scoreWithModel(s: SparkSession, docs: DataFrame, m: DocClassifier): DataFrame =
    docs.select("doc_id")
      .join(docFeatures(s, docs, m.dfreq, m.nDocs), Seq("doc_id"), "left")
      .na.fill(0L, Seq("x1", "x2", "x3"))
      .withColumns(Map(
        "beta_0" -> lit(m.betas(0)), "beta_1" -> lit(m.betas(1)),
        "beta_2" -> lit(m.betas(2)), "beta_3" -> lit(m.betas(3))))
      .selectExpr("doc_id", s"$ClassifierScoreExpr AS score")

  /** The classifier's (doc_id, score) surface shared by q_t21 and q_tp7. */
  private def classifierScores(s: SparkSession, d: String): DataFrame =
    scoreWithModel(s, Tables.documents(s, d), classifierModel(s, d))

  private val modelCache = TrieMap.empty[(SparkSession, String), DocClassifier]

  /** E13: STREAMING CLASSIFIER SCORING — train offline, score the ingest
    * stream: the frozen q_t21 model (betas + df table + n_docs, pure
    * driver state) scores ordered single-file document micro-batches
    * STATELESSLY in foreachBatch, with the batchId-derived idempotent sink
    * (q_e8's exactly-once recipe). Because per-doc features depend only on
    * the doc's own tokens plus the frozen statistics, incremental ≡ batch
    * bit-for-bit — the query shares q_t21's oracle verbatim. This is the
    * deployment shape of every quality gate at 100 TB: the model never
    * re-fits on the serving path, and scoring parallelizes per batch with
    * no cross-batch state at all. */
  def streamedClassifierScores(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.{Dataset, Row}
    val model = classifierModel(s, d)
    val docs = Tables.documents(s, d).select("doc_id", "text")
    val root = java.nio.file.Files.createTempDirectory("graft_stream_cls").toString
    val parts = (0 until 3).map(k => docs.filter(col("doc_id") % 3 === k))
    val t0 = java.lang.System.currentTimeMillis() - 600000
    parts.zipWithIndex.foreach { case (df, i) =>
      val dir = s"$root/in/p$i"
      df.coalesce(1).write.parquet(dir)
      new java.io.File(dir).listFiles().foreach(_.setLastModified(t0 + i * 60000L))
    }
    val applyBatch: (Dataset[Row], Long) => Unit = (batch, id) => {
      if (!batch.isEmpty) {
        scoreWithModel(s, batch.toDF(), model)
          .select(col("doc_id"), col("score"),
            (col("score") >= lit(450.0)).as("kept"))
          .write.mode("overwrite").parquet(s"$root/out/b$id")
      }
    }
    val q = s.readStream
      .schema("doc_id BIGINT, text STRING")
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$root/in/p*")
      .writeStream
      .option("checkpointLocation", s"$root/ckpt")
      .foreachBatch(applyBatch)
      .start()
    try q.processAllAvailable()
    finally q.stop()
    s.read.parquet(s"$root/out/b*").orderBy("doc_id")
  }

  /** P13: TEMPERATURE-BASED SOURCE MIXING — the multilingual/multi-source
    * balancing stage (α-sampling): per-source sampling weights w_s ∝
    * tokens_s^α (α = 0.5 flattens the head), a 100k-token budget split by
    * weight into per-source quotas, and a deterministic hash-ordered
    * selection filling each quota (a doc is in iff its cumulative tokens
    * fit — no partial docs). Every arithmetic step is IEEE-exact on
    * identical inputs (sqrt, divide, floor), the order key is the q_p9 md5
    * discipline, and the cumsum is an exact integer window — so the full
    * mixture plan is oracle-checked. Scale shape: one token-count pass,
    * a 4-row weight table, and a per-source window — no global sort. */
  def temperatureMix(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val budget = 100000L
    val toks = Tables.documents(s, d).select(
      col("doc_id"), col("source"),
      TextFunctions.bpeTokenCount(col("text")).cast("long").as("n_tokens"))
    val bySource = toks.groupBy("source").agg(sum(col("n_tokens")).as("src_tokens"))
    val weighted = bySource.withColumn("w", sqrt(col("src_tokens").cast("double")))
    // order-independent total (floor-quantized exact sum — doubles summed
    // in partition order would not be reproducible)
    val totalW = weighted.agg(Exact.floorSum(col("w"), 9).as("total_w"))
    val quotas = weighted.crossJoin(broadcast(totalW))
      .select(col("source"), col("src_tokens"),
        floor(lit(budget.toDouble) * col("w") / col("total_w")).cast("long").as("quota"))
    val w = Window.partitionBy("source")
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    toks
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .join(broadcast(quotas), Seq("source"))
      .filter(col("cum_tokens") <= col("quota"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs_selected"), sum(col("n_tokens")).as("tokens_selected"))
      .join(quotas, Seq("source"))
      .select("source", "src_tokens", "quota", "n_docs_selected", "tokens_selected")
      .orderBy("source")
  }

  /** W8: group-wise top-k curation — keep the 3 largest docs per source
    * (row_number over a per-source window; one hash-shuffle on source, no
    * global sort — the "best k per domain" selection every corpus-quality
    * pipeline runs). */
  def groupTopK(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    Tables.documents(s, d)
      .withColumn("rk", row_number().over(
        Window.partitionBy("source").orderBy(col("n_chars").desc, col("doc_id"))))
      .filter(col("rk") <= 3)
      .select("source", "doc_id", "n_chars", "rk")
      .orderBy("source", "rk")
  }

  /** O5: deterministic corpus shuffle — a content-derived shuffle key
    * (md5 of the id) instead of an RNG, so the "randomized" training order
    * is reproducible and resumable. At scale the key feeds
    * repartitionByRange + write (shard files in shuffled order, no global
    * sort bottleneck — asserted in OperatorsSpec); here the key mapping
    * itself is the verified output. */
  def detShuffle(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), md5(col("doc_id").cast("string")).as("shuffle_key"))
      .orderBy("shuffle_key", "doc_id")

  /** O6: skew-salted country KPI — the aggregation-side mitigation for the
    * reference's UK ≈ 86% skew hazard (SURVEY §4.3,
    * Sales_forecast_pyspark.ipynb:3152): two-phase aggregation through
    * [[graft.operators.Skew.saltedAgg]], spreading the hot country over 16
    * deterministic salt buckets before combining. Algebraic aggregates are
    * salt-invariant (the revenue sum stays DECIMAL across both phases —
    * decimal addition is exact and associative — and is cast to double once
    * at the end), so the oracle is the plain one-phase GROUP BY: the
    * correctness claim IS that invariance. */
  def saltedCountryKpi(s: SparkSession, d: String): DataFrame = {
    import graft.operators.Skew
    Skew.saltedAgg(
      daily(s, d).select("Country", "NetDailyQuantity", "NetDailyRevenue"),
      Seq("Country"),
      Seq(
        Skew.sumLong("NetDailyQuantity", "total_qty"),
        (sum(Exact.dec6(col("NetDailyRevenue"))).as("rev_dec"),
          sum(col("rev_dec")).as("rev_dec")),
        Skew.countAll("n_days"),
        Skew.maxOf("NetDailyQuantity", "max_qty")))
      .select(
        col("Country"), col("total_qty"),
        col("rev_dec").cast("double").as("total_revenue"),
        col("n_days"), col("max_qty"))
      .orderBy("Country")
  }

  /** DD6: duplicate-cluster resolution — connected components over the
    * Jaccard near-dup pair graph via [[Dedup.dupClusters]] min-label
    * propagation. The corpus has no natural jaccard ≥ 0.8 pairs at test
    * scale, so clone chains are injected (doc, doc+1M for doc < 30; plus
    * doc+2M for doc < 15), giving 2- and 3-member clusters whose canonical
    * keeper is the original id; any natural pair the threshold does admit is
    * mirrored identically by the oracle's recursive-CTE closure. */
  private def clonePairGraph(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select("doc_id", "text")
    val clones1 = docs.filter(col("doc_id") < 30)
      .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
    val clones2 = docs.filter(col("doc_id") < 15)
      .select((col("doc_id") + 2000000L).as("doc_id"), col("text"))
    Dedup
      .jaccardPairs(docs.unionByName(clones1).unionByName(clones2), "doc_id", "text", 3)
      .filter(col("jaccard") >= 0.8)
  }

  def dupClusterLabels(s: SparkSession, d: String): DataFrame =
    Dedup.dupClusters(clonePairGraph(s, d)).orderBy("id")

  /** DD8: the same component resolution through the large-star/small-star
    * contraction ([[Dedup.dupClustersStar]]) — the algorithm a 100 TB corpus
    * with DEEP duplicate chains needs (log-round convergence vs diameter-
    * round label propagation). Same pair graph and the same recursive-CTE
    * oracle as q_dd6: two independent algorithms, one hash-gated answer. */
  def dupClusterLabelsStar(s: SparkSession, d: String): DataFrame =
    Dedup.dupClustersStar(clonePairGraph(s, d)).orderBy("id")

  /** Bucketed-layout tables for [[bucketedOrdersJoin]], written once per
    * (session, sf): the shuffle is paid at write time, every later join on
    * the bucket key is Exchange-free (plan-asserted in OperatorsSpec). */
  private val bucketedCache = TrieMap.empty[(SparkSession, String), (String, String)]

  /** J8: co-located join over bucketed tables — orders ⋈ customer on the
    * bucket key through [[graft.operators.Bucketing]]. The layout changes the
    * physical plan only, so the oracle is the plain inner join. */
  def bucketedOrdersJoin(s: SparkSession, d: String): DataFrame = {
    import graft.operators.Bucketing
    val (ot, ct) = bucketedCache.getOrElseUpdate((s, d), {
      // unique per JVM: the managed-table location in the warehouse dir
      // survives across runs while the in-memory catalog does not
      val tag = java.util.UUID.randomUUID().toString.take(8)
      val (a, b) = (s"graft_orders_bkt_$tag", s"graft_customer_bkt_$tag")
      Bucketing.writeBucketed(
        Tables.orders(s, d).select("o_orderkey", "o_custkey", "o_totalprice"),
        a, "o_custkey", 16)
      Bucketing.writeBucketed(
        Tables.customer(s, d).select(col("c_custkey").as("o_custkey"), col("c_name")),
        b, "o_custkey", 16)
      (a, b)
    })
    Bucketing.colocatedJoin(s, ot, ct, "o_custkey")
      .orderBy("o_orderkey")
  }

  private val partitionedCache = TrieMap.empty[(SparkSession, String), String]

  /** S7: hive-partitioned layout + partition-pruned scan — the daily grain
    * written `partitionBy(Year)`, read back with a Year predicate. At 100 TB
    * the partition column turns the predicate into directory pruning: the
    * scan's PartitionFilters eliminate whole files before any I/O (asserted
    * in OperatorsSpec), which is the cheapest filter an engine has. Result
    * equals the plain filtered query, so the oracle is trivial; the layout
    * write is paid once per (session, sf) like the bucketed tables. */
  /** Year-partitioned daily layout shared by q_s7 (static pruning) and q_s9
    * (dynamic pruning), written once per (session, sf). */
  private def partitionedDailyPath(s: SparkSession, d: String): String =
    partitionedCache.getOrElseUpdate((s, d), {
      val dir = java.nio.file.Files.createTempDirectory("graft-part-daily").toString
      daily(s, d)
        .select("Country", "StockCode", "InvoiceDate", "NetDailyQuantity", "Year")
        .write.mode("overwrite").partitionBy("Year").parquet(dir)
      dir
    })

  def partitionedScan(s: SparkSession, d: String): DataFrame =
    s.read.parquet(partitionedDailyPath(s, d))
      .filter(col("Year") === 1997)
      .select("Country", "StockCode", "InvoiceDate", "Year", "NetDailyQuantity")
      .orderBy("Country", "StockCode", "InvoiceDate")

  /** S9: join-driven DYNAMIC partition pruning over the same Year-partitioned
    * layout — the fact side carries no literal Year predicate; the filter
    * lives on the dimension (an orders date range), and Catalyst plants a
    * `dynamicpruning` subquery in the fact scan's PartitionFilters that is
    * fed by the dim side's broadcast at runtime (plan-asserted in
    * OperatorsSpec). This is THE pruning mechanism that keeps a 100 TB star
    * join from scanning every partition: static pruning (q_s7) only helps
    * when the user filters the partition column directly; real star queries
    * filter the dimension, and without DPP the fact scan reads all years.
    * The layout changes only the physical plan, so the oracle is the plain
    * daily ⋈ filtered-dim join. */
  def dppJoin(s: SparkSession, d: String): DataFrame = {
    val fact = s.read.parquet(partitionedDailyPath(s, d))
    val dim = Tables.orders(s, d)
      .filter(col("o_orderdate").between("1996-01-01", "1997-12-31"))
      .select(year(col("o_orderdate")).as("Year"))
      .distinct()
    fact.join(broadcast(dim), "Year")
      .groupBy("Year")
      .agg(
        sum("NetDailyQuantity").as("total_qty"),
        count(lit(1)).as("n_rows"))
      .orderBy("Year")
  }

  /** U4: MERGE/upsert maintenance ([[graft.operators.Output.mergeUpsert]]) —
    * a CDC changeset (updates to every 10th customer, half of them deletes,
    * plus brand-new keys) applied to the customer table as a broadcast
    * anti-join + union (NOT a full-outer join: that shape can never
    * broadcast, so it would shuffle the whole base for a tiny changeset).
    * The changeset is derived deterministically from the table itself so
    * the oracle replays the identical merge in SQL: lost updates, ghost
    * deletes, or dropped inserts all hash-mismatch. */
  def mergeUpsertCustomers(s: SparkSession, d: String): DataFrame = {
    import graft.operators.Output
    val base = Tables.customer(s, d)
      .select(col("c_custkey").cast("long").as("c_custkey"), col("c_name"), col("c_acctbal"))
    val upd = base.filter(col("c_custkey") % 10 === 0)
      .select(col("c_custkey"), col("c_name"), (col("c_acctbal") + 1000.0).as("c_acctbal"))
      .withColumn("is_delete", col("c_custkey") % 20 === 0)
    val ins = base.filter(col("c_custkey") % 7 === 3)
      .select((col("c_custkey") + 900000L).as("c_custkey"), col("c_name"), col("c_acctbal"))
      .withColumn("is_delete", lit(false))
    Output.mergeUpsert(base, upd.unionByName(ins), Seq("c_custkey"), Some("is_delete"))
      .orderBy("c_custkey")
  }

  /** J11: the canonical star join — THE 100 TB analytics plan: one
    * co-partitioned fact-fact join (lineitem ⋈ filtered orders, both huge
    * ⇒ shuffle on the key is the honest minimum, and AQE may split skewed
    * partitions), customer joined at its natural size, and the two true
    * dimensions (nation, region) explicitly broadcast so four of the five
    * tables never shuffle. Revenue rides the Exact decimal accumulator;
    * the per-row price×(1−discount) product is IEEE-exact in both
    * engines. One aggregate shuffle at (region, year) grain ends the
    * plan. */
  def starJoin(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
      .select(col("l_orderkey"), (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("rev"))
    val o = Tables.orders(s, d)
      .filter(year(col("o_orderdate")).between(1996, 1997))
      .select(col("o_orderkey"), col("o_custkey"), year(col("o_orderdate")).as("o_year"))
    val c = Tables.customer(s, d).select(col("c_custkey"), col("c_nationkey"))
    val n = Tables.nation(s, d).select(col("n_nationkey"), col("n_regionkey"))
    val r = Tables.region(s, d).select(col("r_regionkey"), col("r_name"))
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("o_year"))
      .agg(
        Exact.dsum(col("rev")).as("revenue"),
        countDistinct(col("o_custkey")).as("n_customers"),
        count(lit(1)).as("n_lines"))
      .orderBy("r_name", "o_year")
  }

  /** U5: SCD Type 2 dimension build ([[graft.operators.Cdc.scd2]]) — the
    * orders changelog (latest order per customer-day, by max orderkey)
    * compressed into distinct consecutive (status, priority) versions with
    * effective_from/effective_to validity stitched by one per-key window.
    * The no-op-change collapse (LAG compare) and the validity stitch
    * (LEAD) share one partitioning, so the whole dimension build is a
    * single shuffle regardless of table size. */
  def scd2Orders(s: SparkSession, d: String): DataFrame = {
    import graft.operators.Cdc
    import org.apache.spark.sql.expressions.Window
    val perDay = Tables.orders(s, d)
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("o_custkey"), col("o_orderdate"))
          .orderBy(col("o_orderkey").desc)))
      .where(col("rn") === 1)
      .select("o_custkey", "o_orderdate", "o_orderstatus", "o_orderpriority")
    Cdc.scd2(perDay, Seq("o_custkey"), "o_orderdate",
      Seq("o_orderstatus", "o_orderpriority"))
      .orderBy("o_custkey", "effective_from")
  }

  /** U6: snapshot diff ([[graft.operators.Cdc.snapshotDiff]]) — the q_u4
    * merged state diffed against the original customer table; every
    * changeset row must resurface with the right change_type (update /
    * delete / insert) and old/new payloads, and every untouched key must
    * vanish from the diff. One co-partitioned full-outer join — the
    * honest minimum when both snapshots are large. */
  def snapshotDiffCustomers(s: SparkSession, d: String): DataFrame = {
    import graft.operators.Cdc
    val base = Tables.customer(s, d)
      .select(col("c_custkey").cast("long").as("c_custkey"), col("c_name"), col("c_acctbal"))
    Cdc.snapshotDiff(base, mergeUpsertCustomers(s, d), Seq("c_custkey"))
      .orderBy("c_custkey")
  }

  /** J12: temporal SCD2 lookup — the consumer side of q_u5: every
    * lineitem priced against the order-status version IN EFFECT at its
    * ship date (key equi-join + covering-interval filter). Scale shape:
    * the join is a plain equi-join on the business key — versions per key
    * are few, so the interval predicate is a bounded post-filter, never a
    * pair expansion; at 100 TB the dimension side is the small one and
    * broadcasts. Exactly-one-version coverage is guaranteed by scd2's
    * gapless validity stitch (PropertySpec proves it); here the aggregate
    * per matched status is oracle-gated. */
  def scd2Lookup(s: SparkSession, d: String): DataFrame = {
    val dim = scd2Orders(s, d)
      .select(col("o_custkey").as("d_custkey"), col("o_orderstatus"),
        col("effective_from"), col("effective_to"))
    val facts = Tables.lineitem(s, d)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey"), col("l_shipdate"), col("l_extendedprice"))
    facts
      .join(broadcast(dim),
        col("o_custkey") === col("d_custkey") &&
          col("l_shipdate") >= col("effective_from") &&
          (col("effective_to").isNull || col("l_shipdate") < col("effective_to")))
      .groupBy("o_orderstatus")
      .agg(
        count(lit(1)).as("n_lines"),
        Exact.dsum(col("l_extendedprice")).as("total_price"))
      .orderBy("o_orderstatus")
  }

  /** A22: incremental aggregate maintenance ([[graft.operators.Cdc.applyDelta]])
    * — the per-nation (sum acctbal, customer count) rollup updated under the
    * q_u4 CDC changeset by applying SIGNED deltas (−before-image, +after-image)
    * to the materialized aggregate: cost |groups| + |changeset|, never a base
    * rescan. Sums ride DECIMAL end-to-end so the incremental path is
    * bit-identical to the oracle's from-scratch aggregate over the merged
    * table — any delta-sign or double-count bug hash-mismatches. (The
    * before-image here is derived via a broadcast semi-join for the fixture;
    * a real CDC feed carries before-images in the changelog.) */
  def incrementalRollup(s: SparkSession, d: String): DataFrame = {
    import graft.operators.Cdc
    val base = Tables.customer(s, d).select(
      col("c_custkey").cast("long").as("c_custkey"),
      col("c_nationkey"), col("c_acctbal"))
    val upd = base.filter(col("c_custkey") % 10 === 0)
      .select(col("c_custkey"), col("c_nationkey"),
        (col("c_acctbal") + 1000.0).as("c_acctbal"))
      .withColumn("is_delete", col("c_custkey") % 20 === 0)
    val ins = base.filter(col("c_custkey") % 7 === 3)
      .select((col("c_custkey") + 900000L).as("c_custkey"),
        col("c_nationkey"), col("c_acctbal"))
      .withColumn("is_delete", lit(false))
    val changes = upd.unionByName(ins)
    val dec38 = org.apache.spark.sql.types.DecimalType(38, 6)
    val oldAgg = base.groupBy("c_nationkey").agg(
      sum(Exact.dec6(col("c_acctbal"))).cast(dec38).as("bal"),
      count(lit(1)).as("n"))
    val minus = base
      .join(broadcast(changes.select("c_custkey")), Seq("c_custkey"), "left_semi")
      .select(col("c_nationkey"),
        (-Exact.dec6(col("c_acctbal"))).cast(dec38).as("bal"),
        lit(-1L).as("n"))
    val plus = changes.where(!col("is_delete"))
      .select(col("c_nationkey"),
        Exact.dec6(col("c_acctbal")).cast(dec38).as("bal"),
        lit(1L).as("n"))
    Cdc.applyDelta(oldAgg, minus.unionByName(plus), Seq("c_nationkey"))
      .select(col("c_nationkey"),
        col("bal").cast("double").as("total_bal"),
        col("n").as("n_customers"))
      .orderBy("c_nationkey")
  }

  /** S11: z-order (Morton) clustering key ([[graft.operators.ZOrder]]) —
    * the multi-dimensional data-skipping layout: interleaving (customer
    * bucket, day-of-year) bits bounds every file of a z-sorted write to a
    * rectangle in BOTH dimensions, so 2-D box filters skip by parquet
    * zone maps (the mechanism behind OPTIMIZE ZORDER BY). The interleave
    * arithmetic runs in exact-in-double powers of two, so the oracle
    * replays it bit-for-bit; the file-skipping win itself is asserted in
    * ZOrderSpec (bounding-box intersection counts vs a linear sort). */
  def zorderKeys(s: SparkSession, d: String): DataFrame = {
    import graft.operators.ZOrder
    Tables.orders(s, d)
      .select(
        col("o_orderkey"),
        (col("o_custkey") % 1024).cast("int").as("zx"),
        (dayofyear(col("o_orderdate")) - 1).cast("int").as("zy"))
      .withColumn("zval", ZOrder.zValue(col("zx"), col("zy"), 10))
      .orderBy("o_orderkey")
  }

  private val rebalancedCache = TrieMap.empty[(SparkSession, String), String]

  /** S10: sized-output write + read-back — the daily grain written through
    * [[graft.operators.Output.sizedParquetWrite]] (AQE REBALANCE hint +
    * maxRecordsPerFile) and read back. The layout mechanisms act on file
    * boundaries only, so the oracle is the plain query: any row lost,
    * duplicated, or mutated by the rebalance exchange would hash-mismatch.
    * File-count and per-file-bound assertions live in OperatorsSpec. */
  def rebalancedRoundtrip(s: SparkSession, d: String): DataFrame = {
    val path = rebalancedCache.getOrElseUpdate((s, d), {
      val dir = java.nio.file.Files.createTempDirectory("graft-rebalanced").toString
      graft.operators.Output.sizedParquetWrite(
        daily(s, d).select("Country", "StockCode", "InvoiceDate", "NetDailyQuantity"),
        dir, maxRecordsPerFile = 20000L)
    })
    s.read.parquet(path).orderBy("Country", "StockCode", "InvoiceDate")
  }

  private val orcCache = TrieMap.empty[(SparkSession, String), String]

  /** S8: columnar-format interop — the customer table written once to ORC
    * (Spark's second first-class columnar format) and read back through a
    * predicate + projection. The scan must behave exactly like parquet's:
    * PushedFilters at the reader, pruned ReadSchema (spec-asserted). Result
    * equals the same query over the original parquet, so the oracle is the
    * plain filtered table. */
  def orcRoundtrip(s: SparkSession, d: String): DataFrame = {
    val path = orcCache.getOrElseUpdate((s, d), {
      val dir = java.nio.file.Files.createTempDirectory("graft-orc-customer").toString
      Tables.customer(s, d).write.mode("overwrite").orc(dir)
      dir
    })
    s.read.orc(path)
      .filter(col("c_acctbal") > 5000.0)
      .select("c_custkey", "c_name", "c_mktsegment", "c_acctbal")
      .orderBy("c_custkey")
  }

  // ---- sorts ----------------------------------------------------------------

  /** O1: multi-column sort + limit. */
  def sortLimit(s: SparkSession, d: String): DataFrame =
    daily(s, d)
      .select(keyCols :+ col("NetDailyQuantity"): _*)
      .orderBy(keyCols: _*)
      .limit(500)

  // ---- scalar functions -----------------------------------------------------

  /** F4/F7/F8/F9 + conditional: per-row scalar math. */
  def scalarMath(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") < to_timestamp(lit("1995-07-01 00:00:00")))
      .select(
        col("l_orderkey"), col("l_linenumber"),
        round(log1p(col("l_quantity")), 6).as("log_qty"),
        abs(col("l_extendedprice") - lit(50000.0)).as("abs_dev"),
        (col("l_quantity") * lit(2.0) + lit(1.0)).as("qty_affine"),
        when(col("l_discount") > 0.05, lit("H")).otherwise(lit("L")).as("disc_band"))
      .orderBy("l_orderkey", "l_linenumber")

  /** F3: string-function batch over customer names — the everyday string
    * surface (case, substring, padding, search, split, concat) the reference
    * never touched but any engine user needs. All deterministic and
    * ANSI-mirrorable. */
  def stringFunctions(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .select(
        col("c_custkey"),
        upper(col("c_name")).as("name_upper"),
        substring(col("c_name"), 1, 8).as("name_prefix"),
        lpad(col("c_custkey").cast("string"), 10, "0").as("key_padded"),
        instr(col("c_name"), "0").as("first_zero_pos"),
        concat_ws("|", col("c_mktsegment"), col("c_name")).as("seg_name"),
        element_at(split(col("c_name"), "#"), -1).as("name_suffix"))
      .orderBy("c_custkey")

  /** F4: conditional & arg-extremum aggregates per segment — count_if,
    * bool_or/bool_and, and max_by/min_by keyed on the unique custkey (ties
    * impossible ⇒ deterministic). */
  def conditionalAggs(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .groupBy("c_mktsegment")
      .agg(
        count_if(col("c_acctbal") > 0).as("n_positive"),
        bool_or(col("c_acctbal") < 0).as("any_negative"),
        bool_and(col("c_acctbal") > -1000).as("all_above_floor"),
        max_by(col("c_name"), col("c_custkey")).as("latest_customer"),
        min_by(col("c_name"), col("c_custkey")).as("earliest_customer"))
      .orderBy("c_mktsegment")

  /** F6: date/time function batch over the ship date — quarter, day-of-year,
    * month boundaries (last_day / trunc / make_date), date arithmetic
    * (date_add, datediff), and epoch seconds. Covers the calendar surface an
    * engine user needs beyond the reference's year/month/week extracts; all
    * values are exact integers/dates in both engines. */
  def datetimeFunctions(s: SparkSession, d: String): DataFrame = {
    val dt = to_date(col("l_shipdate"))
    Tables.lineitem(s, d)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        dt.as("ship_date"),
        quarter(dt).as("qtr"),
        dayofyear(dt).as("doy"),
        last_day(dt).as("month_end"),
        date_add(dt, 7).as("week_later"),
        datediff(lit("1999-01-01").cast(DateType), dt).as("days_to_1999"),
        trunc(dt, "month").as("month_start"),
        make_date(year(dt), month(dt), lit(1)).as("month_first"),
        unix_timestamp(col("l_shipdate")).as("epoch_s"))
      .orderBy("l_orderkey", "l_linenumber")
  }

  /** F5: array / higher-order functions over document tokens — size,
    * distinct, lambda filter, lambda aggregate (fold), membership, min, and
    * slice+join. Everything stays a per-row expression (no explode ⇒ no row
    * multiplication, no shuffle): the whole query is one codegen'd scan at
    * any corpus size. Outputs are scalars so the cross-engine hash compare
    * stays well-defined. */
  def arrayFunctions(s: SparkSession, d: String): DataFrame = {
    val toks = TextFunctions.tokens(TextFunctions.normText(col("text")))
    Tables.documents(s, d)
      .select(col("doc_id"), toks.as("toks"))
      .select(
        col("doc_id"),
        size(col("toks")).as("n_tokens"),
        size(array_distinct(col("toks"))).as("n_distinct"),
        size(filter(col("toks"), t => length(t) >= 5)).as("n_long"),
        aggregate(col("toks"), lit(0L), (acc, t) => acc + length(t)).as("total_chars"),
        array_contains(col("toks"), "spark").as("has_spark"),
        array_min(col("toks")).as("min_token"),
        array_join(slice(col("toks"), 1, 3), "-").as("first3_joined"))
      .orderBy("doc_id")
  }

  /** JSON field extraction from the events props column. */
  def jsonExtract(s: SparkSession, d: String): DataFrame = {
    val k = regexp_extract(col("props"), "\"k\":\\s*(\\d+)", 1)
    Tables.events(s, d)
      .select(col("event_id"), when(k =!= "", k).cast("int").as("k_val"))
      .orderBy("event_id")
  }

  /** F7: structured JSON parsing — from_json with an explicit schema over
    * the props column (plus injected malformed/missing/mistyped/null rows
    * under ids 5000000+), nested-field extraction, and a validity flag from
    * the PERMISSIVE corrupt-record column (Spark 4's from_json never returns
    * a null struct — malformed input surfaces through
    * columnNameOfCorruptRecord, the same quarantine contract as the CSV
    * source). One codegen'd scan; the schema makes the parse a typed
    * projection instead of per-row regex. */
  def fromJsonParse(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}
    val samples = Seq(
      (5000000L, """{"k": 42}"""),
      (5000001L, """{"x": 1}"""),
      (5000002L, """{"k": "abc"}"""),
      (5000003L, "not json at all"),
      (5000004L, """{"k": null}"""))
      .toDF("event_id", "props")
    val schema = StructType(Seq(
      StructField("k", IntegerType), StructField("_corrupt", StringType)))
    val parsed = from_json(
      col("props"), schema, Map("columnNameOfCorruptRecord" -> "_corrupt"))
    Tables.events(s, d).select(col("event_id"), col("props"))
      .unionByName(samples)
      .select(
        col("event_id"),
        parsed.getField("k").as("k_val"),
        parsed.getField("_corrupt").isNull.as("json_ok"))
      .orderBy("event_id")
  }

  /** Tumbling-window (hourly) event aggregation — the batch shape of the
    * streaming query in graft.streaming. */
  def hourlyEvents(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), Exact.dsum(col("value")).as("total_value"))
      .orderBy("hour", "event_type")

  /** A24: A/B experiment analysis — deterministic hash assignment (md5
    * bucket of user_id, the q_p9 idiom: reproducible on any cluster, no
    * assignment table) and a Welch t-statistic computed from exact
    * DECIMAL(38,0) moment sums of the cent-scaled metric (the q_a20
    * pattern). Count/sum/sum-of-squares are one map-side-combined
    * aggregate; the two variant rows pivot via conditional max; the final
    * t is fixed-order IEEE arithmetic (sqrt is correctly rounded), so the
    * whole experiment readout is bit-reproducible under any partitioning
    * — the property that makes experiment results auditable. */
  def abTest(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val dec = DecimalType(38, 0)
    val ev = Tables.events(s, d)
      .filter(col("event_type") === "purchase")
      .select(
        when(substring(md5(col("user_id").cast("string")), 1, 1) < "8", "A")
          .otherwise("B").as("variant"),
        round(col("value") * 100).cast("long").as("v"))
    val m = ev.groupBy("variant").agg(
      count(lit(1)).as("n"),
      sum(col("v").cast(dec)).as("sv"),
      sum((col("v") * col("v")).cast(dec)).as("svv"))
    def side(s0: String, c: String) = max(when(col("variant") === s0, col(c)))
    val p = m.agg(
      side("A", "n").as("na0"), side("A", "sv").as("sva0"), side("A", "svv").as("svva0"),
      side("B", "n").as("nb0"), side("B", "sv").as("svb0"), side("B", "svv").as("svvb0"))
    val (na, sva, svva) = (col("na0").cast("double"), col("sva0").cast("double"), col("svva0").cast("double"))
    val (nb, svb, svvb) = (col("nb0").cast("double"), col("svb0").cast("double"), col("svvb0").cast("double"))
    p.select(
      col("na0").as("n_a"), col("nb0").as("n_b"),
      (sva / na / lit(100.0)).as("mean_a"),
      (svb / nb / lit(100.0)).as("mean_b"),
      ((sva / na - svb / nb) /
        sqrt((svva - sva * sva / na) / (na - lit(1.0)) / na +
          (svvb - svb * svb / nb) / (nb - lit(1.0)) / nb)).as("t_stat"))
  }

  /** E9: ordered funnel analysis — signup → view → click → purchase, each
    * stage's timestamp = first qualifying event AT OR AFTER the previous
    * stage (the strict-ordering funnel, not mere event presence). Four
    * chained whole-partition windows share ONE user-keyed shuffle; the
    * final stage counts collapse in a single aggregate and unpivot via
    * `stack` (map-side Expand). Conversion rates are exact-integer
    * divisions. */
  def eventFunnel(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id")
    def stageTs(tpe: String, after: Column): Column =
      min(when(col("event_type") === tpe && col("ts") >= after, col("ts"))).over(w)
    val staged = Tables.events(s, d)
      .withColumn("t1", min(when(col("event_type") === "signup", col("ts"))).over(w))
      .withColumn("t2", stageTs("view", col("t1")))
      .withColumn("t3", stageTs("click", col("t2")))
      .withColumn("t4", stageTs("purchase", col("t3")))
    val agg = staged.agg(
      countDistinct(when(col("t1").isNotNull, col("user_id"))).as("u1"),
      countDistinct(when(col("t2").isNotNull, col("user_id"))).as("u2"),
      countDistinct(when(col("t3").isNotNull, col("user_id"))).as("u3"),
      countDistinct(when(col("t4").isNotNull, col("user_id"))).as("u4"))
    agg.selectExpr(
      """stack(4,
        |  1, 'signup',   u1,
        |  2, 'view',     u2,
        |  3, 'click',    u3,
        |  4, 'purchase', u4) AS (stage, stage_name, n_users)""".stripMargin,
      "u1 AS base")
      .select(col("stage"), col("stage_name"), col("n_users"),
        (col("n_users").cast("double") / col("base").cast("double")).as("conversion"))
      .orderBy("stage")
  }

  /** E10: cohort retention — users grouped by the week of their FIRST
    * event; for each (cohort week, week offset) the distinct active users
    * and the retention rate vs the cohort's size (its offset-0 count,
    * pulled by a first_value window over the already-tiny cohort×offset
    * aggregate). One user-keyed window + one aggregate — the standard
    * retention triangle at any scale. */
  def cohortRetention(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(s, d)
      .select(col("user_id"), date_trunc("week", col("ts")).as("aw"))
    val cohorted = ev.withColumn("cw",
      min(col("aw")).over(Window.partitionBy("user_id")))
    val tri = cohorted
      .groupBy(col("cw").as("cohort_week"),
        (datediff(col("aw"), col("cw")) / 7).cast("int").as("week_offset"))
      .agg(countDistinct(col("user_id")).as("n_active"))
    val w0 = Window.partitionBy("cohort_week").orderBy("week_offset")
    tri
      .withColumn("cohort_size", first(col("n_active")).over(w0))
      .select(col("cohort_week"), col("week_offset"), col("n_active"),
        (col("n_active").cast("double") / col("cohort_size").cast("double")).as("retention"))
      .orderBy("cohort_week", "week_offset")
  }

  /** File-source streams read directories; stage the events parquet into a
    * temp dir ONCE per (session, sf, copies) — `copies` > 1 simulates
    * duplicate delivery for the dedup query. Cached so repeated Verify/Bench
    * invocations neither re-copy nor leak temp dirs. */
  private val stageCache =
    TrieMap.empty[(SparkSession, String, Int), (String, org.apache.spark.sql.types.StructType)]

  /** Stages the events parquet and sniffs its file schema (footer-only batch
    * read) ONCE per (session, sf, copies); repeated Verify/Bench invocations
    * reuse both the copy and the schema. */
  private def stagedEvents(
      s: SparkSession, d: String, copies: Int = 1): (String, org.apache.spark.sql.types.StructType) =
    stageCache.getOrElseUpdate((s, d, copies), {
      import java.nio.file.{Files, Paths}
      val dir = Files.createTempDirectory("graft-stream-events")
      // events.parquet may be a single file (the driver testdata layout) or
      // a Spark-written DIRECTORY of part files (any real deployment's
      // layout, incl. the 10x staging) — stage whichever form is present.
      val src = Paths.get(s"$d/events.parquet")
      val parts: Seq[java.nio.file.Path] =
        if (Files.isDirectory(src)) {
          val stream = Files.list(src)
          try stream.toArray.toSeq.map(_.asInstanceOf[java.nio.file.Path])
            .filter(_.getFileName.toString.endsWith(".parquet")).sortBy(_.toString)
          finally stream.close()
        } else Seq(src)
      require(parts.nonEmpty, s"no parquet files under $src")
      (1 to copies).foreach { i =>
        parts.zipWithIndex.foreach { case (p, j) =>
          Files.copy(p, dir.resolve(s"events_${i}_$j.parquet"))
        }
      }
      (dir.toString, s.read.parquet(dir.toString).schema)
    })

  /** The staged-events stream with the ts normalization applied. The cached
    * file schema makes both historical physical forms of events.ts work —
    * TIMESTAMP(NANOS) read as legacy long nanos, and TIMESTAMP(MICROS) read
    * natively — with the same rebuild as Tables.events /
    * Tables.normalizeEventsTs. */
  private def eventStream(s: SparkSession, d: String, copies: Int = 1): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val (staged, fileSchema) = stagedEvents(s, d, copies)
    Tables.normalizeEventsTs(s.readStream.schema(fileSchema).parquet(staged))
  }

  /** E3: the SAME hourly aggregation as q_e1, executed by Structured
    * Streaming — a run-to-completion micro-batch file-source stream over the
    * events parquet, Complete-mode into a memory sink. The per-hour sums go
    * through the exact DECIMAL accumulator, which is order-independent, so
    * the incremental result is bit-identical to the batch plan and shares
    * q_e1's oracle — a correctness gate on the streaming execution path
    * itself, not just its batch shape. */
  def streamedHourlyEvents(s: SparkSession, d: String): DataFrame = {
    val stream = eventStream(s, d)
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), Exact.dsum(col("value")).as("total_value"))
    val sink = "graft_stream_hourly_" + java.util.UUID.randomUUID().toString.take(8).replace("-", "")
    val q = stream.writeStream.format("memory").queryName(sink)
      .outputMode("complete").start()
    try q.processAllAvailable()
    finally q.stop()
    s.table(sink).orderBy("hour", "event_type")
  }

  /** E12: STREAMING COUNT-MIN — the q_a25 sketch maintained as an
    * incremental Structured Streaming aggregate: the 4×64 grid is exactly
    * the bounded per-key state a stream can hold forever (cells only add),
    * Complete-mode output is the final grid, and the same top-20 point
    * queries probe it — so the streaming execution path shares q_a25's
    * oracle verbatim (incremental ≡ batch, the q_e3/q_e11 discipline). */
  def streamedCountMin(s: SparkSession, d: String): DataFrame = {
    val grid = graft.operators.Sketches.countMin(
      eventStream(s, d).select("user_id"), "user_id")
    val sink = "graft_stream_cms_" + java.util.UUID.randomUUID().toString.take(8).replace("-", "")
    val q = grid.writeStream.format("memory").queryName(sink)
      .outputMode("complete").start()
    try q.processAllAvailable()
    finally q.stop()
    val (_, probes) = cmsProbes(s, d)
    graft.operators.Sketches.cmsEstimate(s.table(sink), probes, "user_id")
      .orderBy("user_id")
  }

  /** E7: ONLINE MODEL FITTING — the NormalEq sufficient statistics
    * maintained as an incremental Structured Streaming aggregate (per-key
    * state = the fixed-size statistics vector: 8 decimal sums + count for
    * the 3-variable design), then solved by the shared elimination text
    * once the stream drains. The scale story: a perpetual stream keeps a
    * per-key REGRESSION MODEL continuously up to date for the state cost
    * of ~10 numbers per key — no retraining scans, no solver iterations —
    * and because decimal sums are exact and order-independent, the
    * incremental fit is bit-identical to the batch fit, which is the
    * oracle (same stats SQL, same elimination CTEs). y is floor(value·100)
    * (floor, not round: IEEE floor is engine-identical; round's half-case
    * convention is not). */
  def streamedRidge(s: SparkSession, d: String): DataFrame = {
    import graft.ml.NormalEq
    val ev = eventStream(s, d).select(
      col("event_type"),
      hour(col("ts")).as("h"),
      dayofweek(col("ts")).as("dw"),
      floor(col("value") * 100).cast("long").as("y100"))
    val stats = NormalEq.ridgeStats(
      ev, Seq("event_type"), Seq(col("h"), col("dw")), col("y100"), lambda = 10L)
    val sink = "graft_stream_ridge_" + java.util.UUID.randomUUID().toString.take(8)
    val q = stats.writeStream.format("memory").queryName(sink)
      .outputMode("complete").start()
    try q.processAllAvailable()
    finally q.stop()
    NormalEq.solveStats(s.table(sink), 3, Seq("event_type"), 10L)
      .orderBy("event_type")
  }

  /** E2: batch sessionization via session_window (same operator Structured
    * Streaming incrementalizes; new session when the event-to-event gap
    * ≥ 30 min). SQL-mirrorable as classic gaps-and-islands, so the dynamic
    * session assignment itself is oracle-verified. */
  def eventSessions(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"), Exact.dsum(col("value")).as("total_value"))
      .select(
        col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"), col("total_value"))
      .orderBy("user_id", "session_start")

  /** E4: the q_e2 sessionization executed by Structured Streaming — the
    * stateful session_window operator run incrementally (file-source
    * micro-batches, Complete mode) with exact DECIMAL sums, sharing q_e2's
    * gaps-and-islands oracle: the dynamic session merge itself is gated
    * against SQL, on the streaming path. */
  def streamedSessions(s: SparkSession, d: String): DataFrame = {
    val stream = eventStream(s, d)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"), Exact.dsum(col("value")).as("total_value"))
      .select(
        col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"), col("total_value"))
    val sink = "graft_stream_sess_" + java.util.UUID.randomUUID().toString.take(8).replace("-", "")
    val q = stream.writeStream.format("memory").queryName(sink)
      .outputMode("complete").start()
    try q.processAllAvailable()
    finally q.stop()
    s.table(sink).orderBy("user_id", "session_start")
  }

  /** E5: streaming exact dedup under duplicate delivery — the events file is
    * staged TWICE into the stream source (the at-least-once redelivery every
    * real pipeline must absorb) and
    * [[graft.streaming.EventStreams.dedupStream]] drops the replays by
    * event_id; per-type counts over the deduped stream must equal the batch
    * aggregate over the ORIGINAL table (event ids are unique by fixture
    * contract). State is keyed by id and bounded by the watermark horizon at
    * steady state. */
  def streamedDedup(s: SparkSession, d: String): DataFrame = {
    val deduped = graft.streaming.EventStreams.dedupStream(
      eventStream(s, d, copies = 2), Seq("event_id"))
    val sink = "graft_stream_dedup_" + java.util.UUID.randomUUID().toString.take(8)
    val q = deduped.writeStream.format("memory").queryName(sink)
      .outputMode("append").start()
    try q.processAllAvailable()
    finally q.stop()
    s.table(sink)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"), Exact.dsum(col("value")).as("total_value"))
      .orderBy("event_type")
  }

  /** E6: stream-stream interval join on the driver surface — each purchase
    * joined to the same user's clicks in the preceding 30 minutes, executed
    * by Structured Streaming with watermarked state on BOTH sides (the
    * time-range predicate is what lets Spark expire join state — the
    * difference between bounded and unbounded memory on a perpetual
    * stream). Run-to-completion micro-batch ⇒ no late-data drops, so the
    * incremental result must equal the batch SQL join exactly. Completes
    * the streaming family on the gated surface: aggregation (q_e3),
    * sessionization (q_e4), dedup (q_e5), join (this). */
  def streamedIntervalJoin(s: SparkSession, d: String): DataFrame = {
    val joined = graft.streaming.EventStreams.purchasesWithRecentClicks(eventStream(s, d))
    val sink = "graft_stream_join_" + java.util.UUID.randomUUID().toString.take(8)
    val q = joined.writeStream.format("memory").queryName(sink)
      .outputMode("append").start()
    try q.processAllAvailable()
    finally q.stop()
    s.table(sink).orderBy("user_id", "purchase_ts", "click_ts")
  }

  /** E8: STREAMING CDC apply — the q_u4 changeset delivered as one-file
    * micro-batches (maxFilesPerTrigger=1) and folded into a parquet-backed
    * table state by `foreachBatch` + [[graft.operators.Output.mergeUpsert]]:
    * the standard Structured-Streaming upsert-sink pattern for table
    * formats without a streaming MERGE. Changeset keys are disjoint across
    * batches, so the final state is batch-order-independent and must equal
    * the one-shot batch merge — q_u4's own oracle gates the whole
    * streaming apply path (a dropped batch, re-applied delete, or
    * out-of-order clobber all hash-mismatch). Each micro-batch costs one
    * broadcast anti-join against the current state; state lives in
    * parquet, not driver memory. */
  def streamedMerge(s: SparkSession, d: String): DataFrame = {
    import graft.operators.Output
    import org.apache.spark.sql.Dataset
    import org.apache.spark.sql.Row
    val base = Tables.customer(s, d)
      .select(col("c_custkey").cast("long").as("c_custkey"), col("c_name"), col("c_acctbal"))
    val upd = base.filter(col("c_custkey") % 10 === 0)
      .select(col("c_custkey"), col("c_name"), (col("c_acctbal") + 1000.0).as("c_acctbal"))
      .withColumn("is_delete", col("c_custkey") % 20 === 0)
    val ins = base.filter(col("c_custkey") % 7 === 3)
      .select((col("c_custkey") + 900000L).as("c_custkey"), col("c_name"), col("c_acctbal"))
      .withColumn("is_delete", lit(false))
    val changes = upd.unionByName(ins)
    val root = java.nio.file.Files.createTempDirectory("graft_stream_merge").toString
    // stage the changeset as 3 single-file micro-batches (disjoint key ranges)
    for (p <- 0 to 2)
      changes.filter(pmod(col("c_custkey"), lit(3)) === p)
        .coalesce(1).write.parquet(s"$root/changes/p$p")
    val changeFiles = s"$root/changes/p*"
    var cur = s"$root/state0"
    base.write.parquet(cur)
    val applyBatch: (Dataset[Row], Long) => Unit = (batch, id) => {
      if (!batch.isEmpty) {
        // batchId-derived path + overwrite = idempotent under micro-batch
        // retry (the standard exactly-once sink recipe: a replayed batch
        // rewrites its own output instead of erroring or double-applying)
        val next = s"$root/state${id + 1}"
        Output.mergeUpsert(s.read.parquet(cur), batch, Seq("c_custkey"), Some("is_delete"))
          .write.mode("overwrite").parquet(next)
        cur = next
      }
    }
    val q = s.readStream
      .schema("c_custkey BIGINT, c_name STRING, c_acctbal DOUBLE, is_delete BOOLEAN")
      .option("maxFilesPerTrigger", 1)
      .parquet(changeFiles)
      .writeStream
      .option("checkpointLocation", s"$root/ckpt")
      .foreachBatch(applyBatch)
      .start()
    try q.processAllAvailable()
    finally q.stop()
    s.read.parquet(cur).orderBy("c_custkey")
  }

  /** E11: STREAMING INGEST DEDUP — the q_dd9 batch delivered as ordered
    * single-file micro-batches and classified incrementally: each batch is
    * deduped against the STATIC signature store (tier 1, broadcast-batch
    * discipline), then against a parquet-backed store of signatures kept by
    * EARLIER micro-batches (tier 2a — the cross-micro-batch state the
    * foreachBatch upsert pattern of q_e8 maintains), then within itself
    * (tier 2b); kept docs append their signatures to the state. Because the
    * staged files arrive in doc_id order (ascending mtimes pin the file
    * source's processing order), first-seen-wins equals min-id-wins, so the
    * final classification must EQUAL the one-shot q_dd9 batch run and
    * shares its DuckDB oracle — the whole incremental state machine is
    * hash-gated. Per-micro-batch cost: one broadcast join against each
    * store; no driver-held state (signatures live in parquet). */
  /** The q_e11 fixture pieces, shared with StreamingSpec's crash-recovery
    * cases: the signature store of the even docs, plus the three arrival
    * waves — natural odd docs, then store clones (+1M), then batch clones
    * (+2M), so class minima always arrive first. */
  private[graft] def dedupStreamWaves(
      s: SparkSession, d: String): (DataFrame, Seq[DataFrame]) = {
    val docs = Tables.documents(s, d).select("doc_id", "text")
    val storeSig = Dedup.signatureStore(
      docs.filter(col("doc_id") % 2 === 0), "doc_id", "text").truncateLineage()
    val waves = Seq(
      docs.filter(col("doc_id") % 2 === 1),
      docs.filter(col("doc_id") % 2 === 0 && col("doc_id") < 50)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text")),
      docs.filter(col("doc_id") % 2 === 1 && col("doc_id") < 50)
        .select((col("doc_id") + 2000000L).as("doc_id"), col("text")))
    (storeSig, waves)
  }

  /** Writes arrival wave i as one parquet file under `root/in/p<i>` with an
    * mtime staggered a minute per wave (well past any write-clock drift
    * between calls), so maxFilesPerTrigger=1 replays waves as ordered
    * micro-batches — including waves added AFTER a stream was killed. */
  private[graft] def writeWave(root: String, i: Int, df: DataFrame): Unit = {
    val dir = s"$root/in/p$i"
    df.coalesce(1).write.parquet(dir)
    val t0 = java.lang.System.currentTimeMillis() - 600000
    new java.io.File(dir).listFiles().foreach(_.setLastModified(t0 + i * 60000L))
  }

  /** One foreachBatch application of the cross-batch dedup store. State
    * recovery is DISK-derived ([[graft.streaming.BatchState]] — never a
    * closure var, which dies with the driver): each batch reads the newest
    * committed `state<id>` snapshot below its own id, so a RESTARTED
    * stream resumes from exactly the committed state, and a RE-DELIVERED
    * batchId (crash after the sink write, before the checkpoint commit)
    * reads the state before itself — never its own half-write, which
    * carries no _SUCCESS — and overwrites its own out/state paths with
    * identical content. Both properties are exercised across a real
    * kill/restart in StreamingSpec. */
  private[graft] def dedupStoreBatch(
      s: SparkSession, storeSig: DataFrame, root: String)(
      batch: DataFrame, id: Long): Unit =
    if (!batch.isEmpty) {
      val sigB = Dedup.signatureStore(batch, "doc_id", "text").truncateLineage()
      val vsStore = Dedup.incrementalDedup(storeSig, sigB)
      val dupStore = vsStore.filter(col("status") === "dup_of_store").truncateLineage()
      val restSig = sigB.join(dupStore.select("doc_id"), Seq("doc_id"), "left_anti")
      val keptState = graft.streaming.BatchState.latestState(root, id)
        .map(s.read.parquet(_)).getOrElse(storeSig.limit(0))
      val vsState = Dedup.incrementalDedup(keptState, restSig).truncateLineage()
      // batchId-derived output path + overwrite = idempotent under retry
      // (q_e8's exactly-once sink recipe).
      dupStore.select(col("doc_id"), col("status"), col("match_id"))
        .unionByName(vsState.select(
          col("doc_id"),
          when(col("status") === "kept", lit("kept"))
            .otherwise(lit("dup_in_batch")).as("status"),
          col("match_id")))
        .write.mode("overwrite").parquet(s"$root/out/b$id")
      keptState.unionByName(
        restSig.join(vsState.filter(col("status") === "kept").select("doc_id"),
          Seq("doc_id"), "left_semi"))
        .write.mode("overwrite").parquet(s"$root/state$id")
    }

  def streamedIncrementalDedup(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.{Dataset, Row}
    val (storeSig, waves) = dedupStreamWaves(s, d)
    val root = java.nio.file.Files.createTempDirectory("graft_stream_dd9").toString
    waves.zipWithIndex.foreach { case (df, i) => writeWave(root, i, df) }
    val applyBatch: (Dataset[Row], Long) => Unit =
      (batch, id) => dedupStoreBatch(s, storeSig, root)(batch.toDF(), id)
    val q = s.readStream
      .schema("doc_id BIGINT, text STRING")
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$root/in/p*")
      .writeStream
      .option("checkpointLocation", s"$root/ckpt")
      .foreachBatch(applyBatch)
      .start()
    try q.processAllAvailable()
    finally q.stop()
    s.read.parquet(s"$root/out/b*").orderBy("doc_id")
  }

  /** S12: schema-evolution read — older files lack a column added later
    * (the unavoidable lakehouse reality at 100 TB: a table is rewritten
    * never, appended forever). `mergeSchema` unifies the footers and
    * back-fills the missing column with NULL; the oracle replays the
    * union with an explicit NULL cast. Missing-column pruning still
    * works: scanning only v1 columns never touches the added one. */
  def schemaEvolutionRead(s: SparkSession, d: String): DataFrame = {
    val dir = schemaEvoCache.getOrElseUpdate((s, d), {
      val path = java.nio.file.Files.createTempDirectory("graft_schema_evo").toString
      val o = Tables.orders(s, d)
      o.filter(col("o_orderkey") % 2 === 0)
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .write.parquet(s"$path/v1")
      o.filter(col("o_orderkey") % 2 === 1)
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority")
        .write.parquet(s"$path/v2")
      path
    })
    s.read.option("mergeSchema", "true").parquet(s"$dir/v1", s"$dir/v2")
      .orderBy("o_orderkey")
  }

  private val schemaEvoCache = TrieMap.empty[(SparkSession, String), String]

  /** A18: CUBE grouping sets over (Year, DayOfWeek) — all four aggregation
    * granularities in one pass (beyond the reference's flat groupBy and
    * q_a14's ROLLUP). SQL path for the same self-join-ambiguity reason as
    * rollupTotals. */
  def cubeTotals(s: SparkSession, d: String): DataFrame = {
    daily(s, d).createOrReplaceTempView("graft_daily_cube")
    s.sql(
      """SELECT Year, DayOfWeek,
        |       SUM(NetDailyQuantity) AS total_qty,
        |       COUNT(1) AS n_days
        |FROM graft_daily_cube GROUP BY CUBE(Year, DayOfWeek)
        |ORDER BY Year ASC NULLS FIRST, DayOfWeek ASC NULLS FIRST""".stripMargin)
  }

  /** W9: calendar-aware trailing window — a RANGE frame over epoch-day, so
    * the trailing week is 6 *calendar* days, not 6 observed rows (the
    * reference's ROWS frames silently span gaps in sparse series; a range
    * frame is the honest trailing-week at 100 TB where series are sparse).
    * Epoch-day ordering keys are exact integers in both engines. */
  def rangeFrameWeek(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("Country", "StockCode")
      .orderBy(datediff(col("InvoiceDate"), lit("1970-01-01")))
      .rangeBetween(-6, -1)
    daily(s, d)
      .select(keyCols ++ Seq(
        col("NetDailyQuantity"),
        (sum("NetDailyQuantity").over(w).cast("double")
          / count("NetDailyQuantity").over(w).cast("double")).as("week_mean_qty")): _*)
      .orderBy(keyCols: _*)
  }

  /** W14: trailing 7-day Country-grain sum through
    * [[graft.operators.Skew.saltedTrailingSum]] — the window-side answer to
    * the UK-skew hazard (SURVEY §4.3): the heavy row stream is reduced to
    * the (Country, date) grain by SALTED two-phase aggregation (hot country
    * spread over 16 reducers), and the trailing RANGE frame runs over the
    * compact calendar-bounded series. The oracle is the plain GROUP BY +
    * window — the correctness claim is that salting and the two-level shape
    * change nothing. */
  def saltedTrailing(s: SparkSession, d: String): DataFrame = {
    import graft.operators.Skew
    Skew.saltedTrailingSum(
      daily(s, d).select("Country", "InvoiceDate", "NetDailyQuantity"),
      Seq("Country"), "InvoiceDate", "NetDailyQuantity",
      days = 7, salts = 16, out = "trail7")
      .orderBy("Country", "InvoiceDate")
  }

  /** W15: per-country running total via
    * [[graft.operators.Skew.blockCumSum]] — the hierarchical prefix sum that
    * replaces a whole-partition `rowsBetween(unboundedPreceding, 0)` window
    * (which funnels every row of the hot country through one reducer) with
    * calendar-month blocks: intra-month running sums in parallel, an
    * 84-row-per-country month-offset window, one equi-join. Integer sums →
    * bit-identical to the single-partition window, which is the oracle. */
  def blockCumsumDaily(s: SparkSession, d: String): DataFrame = {
    import graft.operators.Skew
    Skew.blockCumSum(
      daily(s, d).select(
        "Country", "StockCode", "InvoiceDate", "Year", "Month", "NetDailyQuantity"),
      keys = Seq("Country"),
      blockCols = Seq("Year", "Month"),
      orderCols = Seq("InvoiceDate", "StockCode"),
      valueCol = "NetDailyQuantity",
      out = "run_total")
      .select("Country", "StockCode", "InvoiceDate", "NetDailyQuantity", "run_total")
      .orderBy("Country", "InvoiceDate", "StockCode")
  }

  /** A16: fixed-bounds histogram — floor-binning into literal [0,100)/10
    * buckets with clamp (one scan, one small agg; the profiling sweep's
    * distribution view). */
  def valueHistogram(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(
        least(greatest(floor(col("value") / 10.0), lit(0.0)), lit(9.0))
          .cast("int").as("bucket"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"))
      .orderBy("bucket")

  /** A17: pivot (long→wide, the inverse of A15's stack): per-country daily
    * quantity totals spread across the 7 weekday columns. */
  def dowPivot(s: SparkSession, d: String): DataFrame =
    daily(s, d)
      .groupBy("Country")
      .pivot("DayOfWeek", 1 to 7)
      .agg(sum("NetDailyQuantity"))
      .toDF("Country" +: (1 to 7).map(i => s"dow_$i"): _*)
      .orderBy("Country")

  // ---- windows --------------------------------------------------------------

  /** W1: lag features over series / 6-cycle / same-weekday windows. */
  def lagFeatures(s: SparkSession, d: String): DataFrame =
    Forecast.lagFeatures(daily(s, d), 1 to 3)
      .select(keyCols ++ Seq(
        col("lag_qty_1_day"), col("lag_qty_2_day"), col("lag_qty_3_day"),
        col("lag_price_1_day"), col("lag_qty_1_6cycle"), col("lag_qty_1_dow")): _*)
      .orderBy(keyCols: _*)

  private def rolled(s: SparkSession, d: String): DataFrame =
    Forecast.rollingFeatures(daily(s, d), Seq(3, 6), Seq(3))

  /** W2/W3: rolling mean/std over trailing frames, both window families. */
  def rollingStats(s: SparkSession, d: String): DataFrame =
    rolled(s, d)
      .select(keyCols ++ Seq(
        col("roll_mean_3d"), col("roll_std_3d"),
        col("roll_mean_6d"), col("roll_std_6d"),
        col("roll_mean_3_dow")): _*)
      .orderBy(keyCols: _*)

  /** W4: rolling exact median over trailing frames. */
  def rollingMedian(s: SparkSession, d: String): DataFrame =
    rolled(s, d)
      .select(keyCols ++ Seq(
        col("roll_median_3d"), col("roll_median_6d"), col("roll_median_3_dow")): _*)
      .orderBy(keyCols: _*)

  /** W5: diff-vs-rolling features. */
  def diffFeatures(s: SparkSession, d: String): DataFrame =
    Forecast.diffFeatures(Forecast.rollingFeatures(daily(s, d), Seq(3), Seq()), Seq(3))
      .select(keyCols ++ Seq(col("diff_qty_mean_3d"), col("diff_qty_median_3d")): _*)
      .orderBy(keyCols: _*)

  /** W6: the 6-day moving-average baseline. */
  def maBaseline(s: SparkSession, d: String): DataFrame =
    Forecast.maBaseline(daily(s, d))
      .select(keyCols ++ Seq(col("NetDailyQuantity"), col("baseline_qty")): _*)
      .orderBy(keyCols: _*)

  /** W4-literal: percentile_approx(qty, 0.5, 10000) as a WINDOW aggregate
    * over the trailing frames — the reference's exact rolling-median form
    * (Sales_forecast_pyspark.py:920-922, 943-945), both window families.
    * Every frame holds ≤ 6 values ≪ accuracy, so ApproximatePercentile runs
    * its exact path and DuckDB's quantile_disc OVER the same frame is an
    * exact mirror (the repo's percentile_approx exactness rule). */
  def percentileApproxWindow(s: SparkSession, d: String): DataFrame = {
    val qty = col("NetDailyQuantity")
    val f3 = Forecast.seriesW.rowsBetween(-3, -1)
    val f6 = Forecast.seriesW.rowsBetween(-6, -1)
    val fd3 = Forecast.dowW.rowsBetween(-3, -1)
    val pa = (f: org.apache.spark.sql.expressions.WindowSpec) =>
      percentile_approx(qty, lit(0.5), lit(10000)).over(f)
    daily(s, d)
      .select(keyCols ++ Seq(
        pa(f3).as("approx_median_3d"),
        pa(f6).as("approx_median_6d"),
        pa(fd3).as("approx_median_3_dow")): _*)
      .orderBy(keyCols: _*)
  }

  /** W10: navigation window functions (first/last/nth value) over the series
    * window — series start, running latest, and second observation
    * (completes the navigation family beyond lag/lead). */
  def navWindows(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("Country", "StockCode").orderBy("InvoiceDate")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily(s, d)
      .select(keyCols ++ Seq(
        first(col("NetDailyQuantity")).over(w).as("series_first_qty"),
        last(col("NetDailyQuantity")).over(w).as("running_last_qty"),
        nth_value(col("NetDailyQuantity"), 2).over(w).as("second_qty")): _*)
      .orderBy(keyCols: _*)
  }

  /** W11: distribution windows (percent_rank, cume_dist) plus IGNORE NULLS
    * navigation — the last observed weekday quantity carried across weekend
    * rows. percent_rank/cume_dist are single divisions of exact ranks, so
    * they hash-match across engines; the running ignore-nulls last is the
    * standard gap-filling idiom for sparse series. Within a country the
    * (InvoiceDate, StockCode) pair is unique, so the ordering is total and
    * the ranks deterministic. */
  def distWindows(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wc = Window.partitionBy("Country")
      .orderBy(col("InvoiceDate"), col("StockCode"))
    val running = wc.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val weekdayQty =
      when(!col("DayOfWeek").isin(1, 7), col("NetDailyQuantity"))
    daily(s, d)
      .select(keyCols ++ Seq(
        percent_rank().over(wc).as("pct_rank"),
        cume_dist().over(wc).as("cume"),
        last(weekdayQty, ignoreNulls = true).over(running).as("last_weekday_qty")): _*)
      .orderBy(keyCols: _*)
  }

  /** W13: ratio-to-report — each day's share of its country's total via a
    * whole-partition window (no ORDER BY ⇒ the unbounded frame, a different
    * WindowExec path than every ordered window in the corpus: one pass, no
    * sort needed beyond the partition shuffle). Integer sums ⇒ the share is
    * one exact division. */
  def ratioToReport(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("Country")
    daily(s, d)
      .select(keyCols ++ Seq(
        col("NetDailyQuantity"),
        (col("NetDailyQuantity").cast("double")
          / sum("NetDailyQuantity").over(w).cast("double")).as("share_of_country")): _*)
      .orderBy(keyCols: _*)
  }

  /** W12: calendar densification — the reference's lag/rolling features are
    * over *observed* days only (SURVEY §1.1: "lag 1" = previous day WITH
    * sales); this operator materializes the missing calendar days
    * (sequence + explode + zero-fill) so trailing frames become
    * calendar-true. Scale note: densification multiplies rows by
    * span/observations, so it must run at a grain where that product is
    * bounded — here country-level totals (25 series × ~2,500 days); on this
    * data a per-SKU densify would be a measured 286× row blowup, the kind
    * of silent explosion a 100 TB pipeline cannot absorb. */
  def densifiedDailyTotals(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val totals = daily(s, d)
      .groupBy("Country", "InvoiceDate")
      .agg(sum("NetDailyQuantity").as("qty"))
    val span = totals.groupBy("Country")
      .agg(min("InvoiceDate").as("d0"), max("InvoiceDate").as("d1"))
    val cal = span.select(col("Country"),
      explode(sequence(col("d0"), col("d1"), expr("interval 1 day"))).as("InvoiceDate"))
    val joined = cal.join(totals, Seq("Country", "InvoiceDate"), "left")
    val w = Window.partitionBy("Country").orderBy("InvoiceDate").rowsBetween(-7, -1)
    val filled = coalesce(col("qty"), lit(0L))
    joined
      .select(
        col("Country"), col("InvoiceDate"),
        filled.as("qty"),
        col("qty").isNotNull.as("observed"))
      .select(col("Country"), col("InvoiceDate"), col("qty"), col("observed"),
        (sum("qty").over(w).cast("double") / count("qty").over(w).cast("double"))
          .as("ma7_calendar"))
      .orderBy("Country", "InvoiceDate")
  }

  /** O8: order-independent content checksum — the replica-validation /
    * anti-entropy primitive: two copies of a 100 TB table are compared by
    * exchanging ONE row per partition-key instead of any data. Each row
    * contributes hex32(md5(canonical row text)); the per-group SUM of
    * those 32-bit values is commutative, so the checksum is identical
    * under any partitioning or row order — and md5 is the one hash both
    * engines share, so the oracle recomputes the identical fingerprint
    * (row count guards the sum against cancellation coincidences). */
  def contentChecksum(s: SparkSession, d: String): DataFrame =
    daily(s, d)
      .select(col("Year"),
        conv(substring(md5(concat_ws("|",
          col("Country"), col("StockCode"),
          date_format(col("InvoiceDate"), "yyyy-MM-dd"),
          col("NetDailyQuantity").cast("string"))), 1, 8), 16, 10)
          .cast("long").as("h"))
      .groupBy("Year")
      .agg(sum(col("h")).as("checksum"), count(lit(1)).as("n_rows"))
      .orderBy("Year")

  /** A23: exact global median WITHOUT a global sort
    * ([[graft.operators.OrderStats.exactRank]]) — histogram narrowing
    * finds the exact rank-⌈n/2⌉ element in O(log₁₀₂₄ n) aggregate passes
    * (one pass at this scale, four at 10¹² rows), each shipping 1024
    * histogram rows to the driver. q_a11's `percentile()` sorts whole
    * groups; this is the shape that survives a single 100 TB column. The
    * oracle full-sorts and picks the same rank — values must agree bit
    * for bit. */
  def exactMedianNosort(s: SparkSession, d: String): DataFrame = {
    import graft.operators.OrderStats
    import s.implicits._
    val li = Tables.lineitem(s, d)
    val n = li.count()
    val median = OrderStats.exactRank(li, "l_extendedprice", (n + 1) / 2)
    Seq((median, n)).toDF("median", "n_rows")
  }

  /** W16: linear gap interpolation — the time-series repair step between
    * q_w12's zero-fill and a model-based impute: unobserved calendar days
    * get the line between the surrounding observations,
    * prev + (next−prev)·Δ. Both endpoints come from RUNNING IGNORE-NULLS
    * frames — forward for prev, and for next a DESCENDING-order running
    * frame rather than `CURRENT ROW … UNBOUNDED FOLLOWING`: Spark's
    * unbounded-following frame re-aggregates current-row→end for every
    * row (O(n²) per partition; measured 12.3s on this grid), while the
    * reversed running frame is O(n) and reuses the same exchange with one
    * extra sort (measured ~1s). The grid is bounded by each country's
    * observed span so every gap has both endpoints. All arithmetic is
    * integer diffs + one IEEE divide/multiply — no transcendentals, so
    * the oracle is bit-exact. */
  def interpolatedDailyTotals(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val totals = daily(s, d)
      .groupBy("Country", "InvoiceDate")
      .agg(sum("NetDailyQuantity").as("qty"))
    val span = totals.groupBy("Country")
      .agg(min("InvoiceDate").as("d0"), max("InvoiceDate").as("d1"))
    val cal = span.select(col("Country"),
      explode(sequence(col("d0"), col("d1"), expr("interval 1 day"))).as("InvoiceDate"))
    val joined = cal.join(totals, Seq("Country", "InvoiceDate"), "left")
    val wb = Window.partitionBy("Country").orderBy("InvoiceDate")
      .rowsBetween(Window.unboundedPreceding, 0)
    val wr = Window.partitionBy("Country").orderBy(col("InvoiceDate").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val obsDay = when(col("qty").isNotNull, col("InvoiceDate"))
    val prevDay = last(obsDay, ignoreNulls = true).over(wb)
    val prevQty = last(col("qty"), ignoreNulls = true).over(wb)
    val nextDay = last(obsDay, ignoreNulls = true).over(wr)
    val nextQty = last(col("qty"), ignoreNulls = true).over(wr)
    joined
      .select(col("Country"), col("InvoiceDate"), col("qty"),
        when(col("qty").isNotNull, col("qty").cast("double"))
          .otherwise(
            prevQty.cast("double") + (nextQty - prevQty).cast("double") *
              (datediff(col("InvoiceDate"), prevDay).cast("double") /
                datediff(nextDay, prevDay).cast("double")))
          .as("qty_interp"))
      .orderBy("Country", "InvoiceDate")
  }

  // ---- KPIs -----------------------------------------------------------------

  /** A8: global KPI aggregate (MAE/MAPE/bias, model vs baseline). */
  def kpiGlobal(s: SparkSession, d: String): DataFrame =
    Forecast.kpiGlobal(Forecast.evalFrame(daily(s, d)))

  /** A9: per-country KPI. */
  def kpiByCountry(s: SparkSession, d: String): DataFrame =
    Forecast.kpiByCountry(Forecast.evalFrame(daily(s, d))).orderBy("Country")

  /** A10: value-weighted error totals + % reduction. */
  def valueWeighted(s: SparkSession, d: String): DataFrame =
    Forecast.valueWeighted(Forecast.evalFrame(daily(s, d)))

  // ---- text analysis --------------------------------------------------------

  /** Token counting + content fingerprint per document. */
  def textTokens(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(
        col("doc_id"),
        TextFunctions.tokenCount(col("text")).as("n_tokens"),
        size(array_distinct(TextFunctions.tokens(col("text")))).as("n_distinct_tokens"),
        TextFunctions.fingerprintMd5(col("text")).as("fingerprint"))
      .orderBy("doc_id")

  /** T16: BIGRAM LM SCORING — the KenLM-style perplexity filter: every doc's
    * average log P(w_i | w_{i-1}) under an add-one-smoothed bigram model
    * trained on the corpus itself. Low scorers are the noise candidates a
    * quality gate drops. Exactly mirrored in SQL via integer counts +
    * floor-scaled ln terms (the q_t6 construction). */
  def ngramLmScores(s: SparkSession, d: String): DataFrame =
    graft.text.NgramLm.scoreDocs(Tables.documents(s, d), "doc_id", "text")
      .orderBy("doc_id")

  /** P14: PERPLEXITY-BUCKETED SAMPLING — the CCNet head/middle/tail
    * discipline: every doc's bigram-LM score (q_t16) is bucketed at FIXED
    * thresholds (precomputed from a reference slice, exactly as CCNet ships
    * them — a map-side CASE, no global sort or percentile pass), then each
    * bucket keeps a deterministic md5-hash fraction (head 100%, middle 50%,
    * tail 10%) — the q_p9 key-function sampling, so the whole mixture is
    * oracle-exact. Scale shape: the LM score's skinny count joins (q_t16)
    * plus one projection; the bucket decision and keep decision never
    * shuffle. */
  def perplexityMix(s: SparkSession, d: String): DataFrame = {
    val h = conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
      .cast("long") % 100
    graft.text.NgramLm.scoreDocs(Tables.documents(s, d), "doc_id", "text")
      .withColumn("bucket",
        when(col("avg_logp") >= lit(-3.39), lit("head"))
          .when(col("avg_logp") >= lit(-3.42), lit("middle"))
          .otherwise(lit("tail")))
      .withColumn("kept",
        when(col("bucket") === "head", lit(true))
          .when(col("bucket") === "middle", h < 50)
          .otherwise(h < 10))
      .select("doc_id", "bucket", "kept")
      .orderBy("doc_id")
  }

  /** T18: BPE TOKENIZER TRAINING — learn the corpus's first 8 merge rules
    * (the [[graft.text.BpeTrain]] loop): word-type collapse, per-round
    * weighted pair counts, deterministic argmax, greedy merge apply. The
    * oracle replays the identical 8 rounds in SQL (wrapped-symbol string
    * replace ≡ the greedy leftmost kernel), so rule choice, tie-breaks, AND
    * counts are all gated. */
  def bpeTrainMerges(s: SparkSession, d: String): DataFrame =
    graft.text.BpeTrain.train(Tables.documents(s, d), "text", rounds = 8)
      .orderBy("merge_rank")

  /** T18b: SCALABLE BPE TRAINING — the batched-disjoint round rule
    * ([[graft.text.BpeTrain.trainBatched]]): each round counts pairs ONCE,
    * accepts every top-16 candidate whose symbol set is disjoint from all
    * higher-ranked candidates, and applies the whole batch in one stacked
    * projection — 16 rounds learn 60+ merges in ~17 cluster jobs where the
    * q_t18 loop would need one job per merge (the path to a real 32k
    * vocabulary). The oracle replays every round in SQL: the pool is one
    * window, the disjointness rule one NOT EXISTS, and the batch apply a
    * recursive CTE stepping through the accepted ranks — so rule choice,
    * tie-breaks, round boundaries AND counts are all hash-gated. */
  def bpeTrainBatchedMerges(s: SparkSession, d: String): DataFrame =
    graft.text.BpeTrain.trainBatched(Tables.documents(s, d), "text",
        rounds = 16, poolK = 16)
      .orderBy("merge_rank")

  /** The trained merge table per (session, sf) — train once, encode many
    * (the pqCache discipline; driver state = 8 rules). */
  private val bpeMergeCache = TrieMap.empty[(SparkSession, String), Seq[(String, String)]]

  /** tp5's merges are trained on the CLEANED corpus — a different model
    * than q_t18's, cached separately. */
  private val tp5MergeCache = TrieMap.empty[(SparkSession, String), Seq[(String, String)]]

  /** Train-once accessor: the 8 learned merge pairs for `docs`, memoized in
    * `cache` — ONE definition of the rank order and pair extraction so
    * q_t19/q_t20/q_tp5 can never drift apart. */
  private def trainedMerges(
      cache: TrieMap[(SparkSession, String), Seq[(String, String)]],
      key: (SparkSession, String),
      docs: => DataFrame): Seq[(String, String)] =
    cache.getOrElseUpdate(key,
      graft.text.BpeTrain.train(docs, "text", rounds = 8)
        .orderBy("merge_rank").collect()
        .map(r => (r.getString(1), r.getString(2))).toSeq)

  /** TP5: the TRAINING-DATASET CAPSTONE — the full preprocessing pipeline
    * as one declarative flow: tp1's clean (quality gate → exact dedup →
    * near-dup removal) → BPE tokenizer TRAINED ON THE SURVIVORS (the order
    * production pipelines use: never fit the tokenizer on junk) → encode →
    * pack into 2048-token sequences per source. Every stage is the already-
    * oracle-proven construction; the composition is gated end-to-end by one
    * SQL replay, so a drift in ANY stage (a quality threshold, a merge
    * tie-break, a cumsum frame) hash-mismatches the final dataset map. */
  def trainingDataset(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(s, d)
    val cleaned = docs.select("doc_id", "text", "source")
      .join(graft.pipeline.CorpusCleaner.clean(s, docs).select("doc_id"),
        Seq("doc_id"), "left_semi")
    val merges = trainedMerges(tp5MergeCache, (s, d), cleaned)
    val counts = graft.text.BpeTrain.encodeCounts(cleaned, "doc_id", "text", merges)
    val w = Window.partitionBy("source").orderBy("doc_id")
    counts
      .join(cleaned.select("doc_id", "source"), Seq("doc_id"))
      .withColumn("end_off", sum(col("n_bpe_tokens")).over(w))
      .select(
        col("doc_id"), col("source"), col("n_ws_tokens"), col("n_bpe_tokens"),
        (col("end_off") - col("n_bpe_tokens")).as("start_off"),
        floor((col("end_off") - col("n_bpe_tokens")) / 2048).cast("long").as("first_seq"),
        floor((col("end_off") - 1) / 2048).cast("long").as("last_seq"))
      .orderBy("source", "doc_id")
  }

  /** T19: BPE ENCODE — tokenize every doc with the q_t18-trained merges:
    * per-doc whitespace vs trained-BPE token counts. The 8 merge rules
    * stack as codegen'd expressions over the DISTINCT-word table (vocab-
    * bounded), then join token instances — the corpus scans once. */
  def bpeEncodeCounts(s: SparkSession, d: String): DataFrame = {
    val merges = trainedMerges(bpeMergeCache, (s, d), Tables.documents(s, d))
    graft.text.BpeTrain.encodeCounts(Tables.documents(s, d), "doc_id", "text", merges)
      .orderBy("doc_id")
  }

  /** T20: the trained BPE VOCABULARY — symbols after the 8 merge rounds
    * with weighted occurrence totals and word-type counts (the vocab file
    * a shipped tokenizer pairs with its merges file). */
  def bpeVocab(s: SparkSession, d: String): DataFrame = {
    val merges = trainedMerges(bpeMergeCache, (s, d), Tables.documents(s, d))
    graft.text.BpeTrain.vocab(Tables.documents(s, d), "text", merges)
      .orderBy("symbol")
  }

  /** T27: BPE TOKEN-ID SEQUENCES — the artifact a training run actually
    * consumes: vocabulary symbols get dense ids (rank in byte order — the
    * vocab table is bounded, so the single ranking window is over ~50k
    * rows at any corpus size, never corpus-sized), every document's words
    * expand to their trained symbol sequences, and each doc ships its id
    * count plus an ORDER-SENSITIVE checksum (Σ id·position) proving the
    * exact sequence, not just the multiset. Corpus cost: the distinct-word
    * table expands once (the q_t19 decomposition); per-doc sequence order
    * comes from one (doc, word-pos, sym-pos) window. */
  def bpeTokenIds(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val merges = trainedMerges(bpeMergeCache, (s, d), Tables.documents(s, d))
    val symsFinal = merges.foldLeft(
      array_remove(split(col("word"), "(?!^)"), ""): Column) {
      case (c, (a, b)) => graft.functions.GraftFunctions.bpeMerge(c, a, b)
    }
    val docw = Tables.documents(s, d)
      .select(col("doc_id"),
        posexplode(TextFunctions.tokens(TextFunctions.normText(col("text")))))
      .select(col("doc_id"), col("pos").as("wpos"), col("col").as("word"))
    // The word→symbols table is VOCABULARY-sized, so: materialize it once
    // (the 8-merge expression stack never runs twice, the corpus is
    // re-tokenized once instead of thrice) and BROADCAST it plus the id
    // table — the only shuffle left in the whole query is the per-doc
    // sequence window. (Pre-fix this was 3 corpus scans + a shuffled
    // word join: 23 s at 10x sf0.1 vs 3.7 s after.)
    val wordSyms = docw.select("word").distinct()
      .select(col("word"), symsFinal.as("syms"))
      .truncateLineage()
    val vid = wordSyms.select(explode(col("syms")).as("symbol")).distinct()
      .withColumn("id", row_number().over(Window.orderBy("symbol")).cast("long"))
    val seq0 = docw.join(broadcast(wordSyms), Seq("word"))
      .select(col("doc_id"), col("wpos"), posexplode(col("syms")))
      .select(col("doc_id"), col("wpos"), col("pos").as("spos"), col("col").as("symbol"))
      .join(broadcast(vid), Seq("symbol"))
    val wSeq = Window.partitionBy("doc_id").orderBy("wpos", "spos")
    seq0
      .withColumn("tok_idx", row_number().over(wSeq).cast("long"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_ids"),
        sum(col("id") * col("tok_idx")).as("ids_checksum"))
      .orderBy("doc_id")
  }

  /** T14: BPE-ish token budget — whitespace tokens vs GPT-2-style pre-token
    * counts plus the chars-per-pretoken compression ratio (the number a
    * pipeline sizes context windows with). Same regex text in both engines
    * ([[TextFunctions.BpePattern]] is RE2-compatible by construction). */
  def textBpeTokens(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(
        col("doc_id"),
        TextFunctions.tokenCount(col("text")).as("n_ws_tokens"),
        TextFunctions.bpeTokenCount(col("text")).as("n_bpe_tokens"),
        coalesce(
          length(col("text")).cast("double") /
            greatest(TextFunctions.bpeTokenCount(col("text")), lit(1)).cast("double"),
          lit(0.0)).as("chars_per_token"))
      .orderBy("doc_id")

  /** T15: SEQUENCE PACKING — the concat-then-chunk assignment every LLM
    * training pipeline runs: documents are laid end-to-end in (source,
    * doc_id) order and split into fixed 2048-token sequences; each doc
    * reports its global token offset, first/last sequence id, and how many
    * sequence boundaries it straddles. Pure exact-integer window cumsum at
    * the per-source grain (sources pack independently, so the windows
    * distribute across sources; a single giant source would use the
    * [[graft.operators.Skew.blockCumSum]] two-phase form, q_w15). Token
    * counts use the BPE-ish pre-tokenizer (q_t14), so the budget is the
    * one a subword pipeline actually sees. */
  def sequencePack(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val budget = 2048
    val w = Window.partitionBy("source").orderBy("doc_id")
    Tables.documents(s, d)
      .select(
        col("doc_id"), col("source"),
        TextFunctions.bpeTokenCount(col("text")).cast("long").as("n_tokens"))
      .withColumn("end_off", sum(col("n_tokens")).over(w))
      .select(
        col("doc_id"), col("source"), col("n_tokens"),
        (col("end_off") - col("n_tokens")).as("start_off"),
        floor((col("end_off") - col("n_tokens")) / budget).cast("long").as("first_seq"),
        floor((col("end_off") - 1) / budget).cast("long").as("last_seq"))
      .withColumn("n_boundaries",
        greatest(col("last_seq") - col("first_seq"), lit(0L)))
      .orderBy("source", "doc_id")
  }

  /** T31: CONTEXT-WINDOW CHUNKING WITH OVERLAP — the retrieval-side
    * sibling of q_t15's packing: every doc splits into fixed-width token
    * windows (W = 64) advancing by a stride (48, i.e. 16-token overlap —
    * the standard RAG/embedding-index preprocessing, where overlap keeps
    * boundary-spanning facts retrievable). Chunk COUNT and offsets are
    * pure integer arithmetic (`(n − W + stride − 1) DIV stride + 1` for
    * n > W, else 1), the per-chunk text is one array slice, and its md5
    * is the integrity key an index stores. The CHUNKING COMPUTE is
    * entirely map-side (the explode multiplies rows ~n/stride-fold,
    * which IS the output); the only exchange in the plan is the final
    * deterministic-output orderBy — a consumer that doesn't need global
    * order (an index writer partitioned by doc) drops it and the query
    * is genuinely shuffle-free. Short docs yield one whole-doc chunk;
    * empty docs yield none. */
  def chunkWithOverlap(s: SparkSession, d: String): DataFrame = {
    val (w, stride) = (64, 48)
    val toks = TextFunctions.tokens(TextFunctions.normText(col("text")))
    val n = size(col("toks"))
    val nChunks = when(n <= w, lit(1))
      .otherwise(expr(s"((size(toks) - $w + $stride - 1) DIV $stride) + 1").cast("int"))
    Tables.documents(s, d)
      .select(col("doc_id"), toks.as("toks"))
      .filter(size(col("toks")) > 0)
      .select(col("doc_id"), col("toks"),
        posexplode(transform(sequence(lit(0), nChunks - 1), i => i * stride)))
      .select(col("doc_id"),
        col("pos").cast("long").as("chunk_idx"),
        col("col").cast("long").as("start_tok"),
        least(col("col") + w, size(col("toks"))).cast("long").as("end_tok"),
        md5(array_join(
          slice(col("toks"), col("col") + 1,
            least(lit(w), size(col("toks")) - col("col"))), " ")).as("chunk_md5"))
      .withColumn("n_tokens", col("end_tok") - col("start_tok"))
      .orderBy("doc_id", "chunk_idx")
  }

  /** T32: ZIPF-LAW FIT — the corpus-health telemetry every pretraining
    * dataset report carries: the least-squares slope of ln(frequency) vs
    * ln(rank) over the top-1000 vocabulary (natural text sits near −1;
    * template/generated corpora flatten, boilerplate-heavy ones steepen).
    * Numerics follow the q_t6/q_t16 discipline: ln values floor-scale to
    * integer micro-logs, all five regression sums are EXACT int64 (the
    * magnitudes are bounded by the fixed N=1000, documented below), the
    * closed-form slope assembles in DECIMAL(38,0) (n·Σxy − Σx·Σy crosses
    * 2^63) and converts to double only for the final division — so both
    * engines divide the identical exact integers. The rank window runs
    * over a CONSTANT-bounded 1000-row frame (TakeOrderedAndProject feeds
    * it), never over data-sized input. */
  def zipfFit(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.DecimalType
    val topN = 1000
    val tf = Tables.documents(s, d)
      .select(explode(TextFunctions.tokens(TextFunctions.normText(col("text")))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token")).limit(topN)
    val ranked = tf.withColumn("rk",
      row_number().over(Window.orderBy(col("cnt").desc, col("token"))))
    val xy = ranked.select(
      floor(log(col("rk").cast("double")) * lit(1e6)).cast("long").as("x"),
      floor(log(col("cnt").cast("double")) * lit(1e6)).cast("long").as("y"))
    // bounds at N=1000: x,y ≤ ~1.4e7; x·y ≤ 2e14; Σ ≤ 2e17 — all int64
    val sums = xy.agg(
      count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
      sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("x")).as("sxx"))
    def dec(c: Column) = c.cast(DecimalType(38, 0))
    sums
      .withColumn("slope",
        (dec(col("n")) * dec(col("sxy")) - dec(col("sx")) * dec(col("sy"))).cast("double")
          / (dec(col("n")) * dec(col("sxx")) - dec(col("sx")) * dec(col("sx"))).cast("double"))
      .select(
        col("n").as("n_ranks"),
        col("slope"),
        ((col("sy").cast("double") / col("n").cast("double"))
          - col("slope") * (col("sx").cast("double") / col("n").cast("double")))
          .as("intercept_micro"))
  }

  /** Quality scoring: length/punctuation/stopword signals + composite. */
  def textQuality(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(
        col("doc_id"),
        length(col("text")).as("n_chars"),
        TextFunctions.punctCount(col("text")).as("n_punct"),
        TextFunctions.stopwordRatio(TextFunctions.tokens(col("text"))).as("stop_ratio"),
        TextFunctions.qualityScore(col("text")).as("quality"))
      .orderBy("doc_id")

  /** Five-language ID (en/de/fr/es/it function-word + accent-char profiles,
    * [[TextFunctions.langId5]]). The fixture's text is synthetic English-ish
    * vocabulary regardless of its `lang` label, so genuine sentences in each
    * supported language are injected under ids 3000000+ — the classifier must
    * separate them by profile, and the oracle mirrors the scoring over the
    * same union. */
  def textLangId(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val samples = Seq(
      (3000000L, "the quick brown fox and the lazy dog are in the garden and it is a fine day"),
      (3000001L, "der hund und die katze sind nicht in dem haus aber ich bin mit den kindern auf den feldern"),
      (3000002L, "ich habe das buch von dem mann mit der großen tür und es ist schön für die übung"),
      (3000003L, "le chat est dans la maison et je ne pense pas que les enfants vont jouer avec le chien"),
      (3000004L, "nous avons mangé le dîner à côté de la fenêtre et c est une belle journée pour les amis"),
      (3000005L, "el perro y el gato no están en la casa pero es un buen día para jugar con los niños en el jardín"),
      (3000006L, "il cane e il gatto non sono nella casa ma è un bel giorno per giocare con i bambini più piccoli nel giardino"))
      .toDF("doc_id", "text")
    val scoreCols = TextFunctions.langScores5(col("text"))
      .map { case (lang, c) => c.as(s"score_$lang") }
    Tables.documents(s, d).select("doc_id", "text")
      .unionByName(samples)
      .select(
        col("doc_id") +: scoreCols :+
          TextFunctions.langId5(col("text")).as("lang_pred"): _*)
      .orderBy("doc_id")
  }

  /** Shingling: distinct char-5-gram and word-3-shingle counts. */
  def textShingles(s: SparkSession, d: String): DataFrame = {
    val norm = TextFunctions.normText(col("text"))
    Tables.documents(s, d)
      .select(
        col("doc_id"),
        TextFunctions.charShingleCount(norm, 5).as("n_char5"),
        size(TextFunctions.wordShingles(TextFunctions.tokens(norm), 3)).as("n_word3"))
      .orderBy("doc_id")
  }

  /** T11: corpus length histogram — documents bucketed by token count in
    * 20-token bands (capped decile style, mirroring q_a16) — the standard
    * length-distribution diagnostic run before choosing min/max-length
    * filters. One scan, one tiny aggregate. */
  def tokenHistogram(s: SparkSession, d: String): DataFrame = {
    val n = TextFunctions.tokenCount(TextFunctions.normText(col("text")))
    Tables.documents(s, d)
      .select(least(greatest(floor(n / 20.0), lit(0.0)), lit(9.0)).cast("int").as("bucket"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_docs"))
      .orderBy("bucket")
  }

  /** T12: corpus vocabulary table — per-token document frequency, total
    * occurrences, and corpus share; top-50 by (tf desc, token). The most
    * basic corpus statistic (vocab curves, stopword lists, tokenizer
    * audits). Shape: explode to skinny (doc, token) rows → one hash
    * aggregate (map-side combined, token keys are bounded) →
    * TakeOrderedAndProject; the global total rides along via a window-free
    * broadcast-friendly scalar join. */
  def vocabulary(s: SparkSession, d: String): DataFrame = {
    val toks = Tables.documents(s, d)
      .select(col("doc_id"),
        explode(TextFunctions.tokens(TextFunctions.normText(col("text")))).as("token"))
    val counts = toks.groupBy("token")
      .agg(countDistinct(col("doc_id")).as("df"), count(lit(1)).as("tf"))
    val total = toks.agg(count(lit(1)).as("total_tf"))
    counts.crossJoin(broadcast(total))
      .select(col("token"), col("df"), col("tf"),
        (col("tf").cast("double") / col("total_tf").cast("double")).as("share"))
      .orderBy(col("tf").desc, col("token").asc)
      .limit(50)
  }

  /** T13: exact heavy hitters by two-phase Misra–Gries
    * ([[graft.operators.HeavyHitters]]) — tokens with share > 1/200 of
    * the corpus, found with k bounded counters per partition (never one
    * shuffle record per distinct token) and an exact broadcast-semi-join
    * recount of the candidate superset. The candidate set is
    * partitioning-dependent; the OUTPUT is partitioning-invariant and
    * equals the direct global `count > N/k` filter — which is exactly
    * what the oracle computes. */
  def heavyHitters(s: SparkSession, d: String): DataFrame = {
    import graft.operators.HeavyHitters
    import s.implicits._
    val K = 200
    val toks = Tables.documents(s, d)
      .select(explode(TextFunctions.tokens(TextFunctions.normText(col("text")))).as("tok"))
    val cand = HeavyHitters.candidates(toks.as[String], K).toDF("tok").distinct()
    val total = toks.agg(count(lit(1)).as("total_tf"))
    toks.join(broadcast(cand), Seq("tok"), "left_semi")
      .groupBy("tok").agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(total))
      .filter(col("cnt").cast("double") > col("total_tf").cast("double") / lit(K.toDouble))
      .select(col("tok"), col("cnt"),
        (col("cnt").cast("double") / col("total_tf").cast("double")).as("share"))
      .orderBy(col("cnt").desc, col("tok").asc)
  }

  /** T9: benchmark-contamination check — the decontamination pass every
    * pre-training pipeline runs: what fraction of each corpus document's
    * distinct word-3-grams also appear in a held-out benchmark set (here the
    * deterministic doc_id % 17 == 0 slice)? Shape is the scale-correct one:
    * skinny (doc, gram) rows, the benchmark gram set deduplicated then
    * BROADCAST into the probe (benchmarks are tiny next to a 100 TB corpus),
    * so the scan never shuffles — one hash aggregate at the end. */
  def contamination(s: SparkSession, d: String): DataFrame = {
    val grams = Tables.documents(s, d)
      .select(col("doc_id"),
        explode(TextFunctions.wordShingles(
          TextFunctions.tokens(TextFunctions.normText(col("text"))), 3)).as("gram"))
    val bench = grams.filter(col("doc_id") % 17 === 0)
      .select("gram").distinct()
    val ratio = col("n_hit").cast("double") / col("n_grams").cast("double")
    grams.filter(col("doc_id") % 17 =!= 0)
      .join(broadcast(bench.withColumn("hit", lit(1))), Seq("gram"), "left")
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_grams"),
        sum(coalesce(col("hit"), lit(0))).as("n_hit"))
      .select(col("doc_id"), col("n_grams"), col("n_hit"),
        ratio.as("contamination"),
        (ratio >= 0.5).as("flagged"))
      .orderBy("doc_id")
  }

  /** T10: boilerplate n-gram mining — word-3-grams shared by ≥2 documents,
    * top-50 by document frequency (the C4/RefinedWeb-style repeated-content
    * detector that feeds line/passage removal). Skinny distinct (gram, doc)
    * rows → one hash aggregate → TakeOrderedAndProject; the gram key is
    * bounded so the aggregate stays map-side-combinable at any corpus
    * size. */
  def boilerplateGrams(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"),
        explode(TextFunctions.wordShingles(
          TextFunctions.tokens(TextFunctions.normText(col("text"))), 3)).as("gram"))
      .groupBy("gram")
      .agg(countDistinct(col("doc_id")).as("df"))
      .filter(col("df") >= 2)
      .orderBy(col("df").desc, col("gram").asc)
      .limit(50)

  /** Email/phone patterns shared by the scrub query and its oracle —
    * RE2-compatible (no lookarounds), so Java regex and DuckDB agree. */
  private val EmailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  private val PhoneRe = "\\b\\d{3}[-. ]\\d{3}[-. ]\\d{4}\\b"

  /** T7: PII scrubbing — emails and phone numbers masked with typed tokens,
    * plus per-row match counts (the redaction pass every training-data
    * pipeline runs before tokenization; pure regexp expressions, one scan).
    * The fixture has no PII, so rows with genuine emails/phones are injected
    * under ids 4000000+; the oracle applies the same RE2-compatible
    * patterns. */
  def piiScrub(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val samples = Seq(
      (4000000L, "contact me at john.doe@example.com or call 555-123-4567 today"),
      (4000001L, "emails alice@foo.org bob@bar.net and phone 800 555 1212 plus 123-456-7890"),
      (4000002L, "no personal data here just plain text"))
      .toDF("doc_id", "text")
    Tables.documents(s, d).select("doc_id", "text")
      .unionByName(samples)
      .select(
        col("doc_id"),
        regexp_replace(
          regexp_replace(col("text"), EmailRe, "<EMAIL>"),
          PhoneRe, "<PHONE>").as("scrubbed"),
        size(regexp_extract_all(col("text"), lit(EmailRe), lit(0))).as("n_emails"),
        size(regexp_extract_all(col("text"), lit(PhoneRe), lit(0))).as("n_phones"))
      .orderBy("doc_id")
  }

  /** The injected markup fixtures (the corpus has no HTML — the q_t7
    * injection construction): ids 4100000+ carry tags, entities, attribute
    * quotes, and one plain-text control row. */
  private def markupSamples(s: SparkSession): DataFrame = {
    import s.implicits._
    Seq(
      (4100000L, "<html><body><h1>Hello &amp; welcome</h1><p>A &lt;tag&gt; isn&#39;t text.</p></body></html>"),
      (4100001L, "plain text stays untouched"),
      (4100002L, "<div class=\"x\">nested <b>bold</b>&nbsp;text</div> tail &quot;quoted&quot;"))
      .toDF("doc_id", "text")
  }

  /** T22: MARKUP STRIPPING — tag removal + entity decoding + whitespace
    * collapse ([[TextFunctions.stripMarkup]]), the pass a crawled corpus
    * needs before every downstream gate (tags pollute token counts,
    * shingles, and fingerprints). Injected HTML docs prove the strip;
    * RE2-compatible patterns make it oracle-exact like q_t7. */
  def markupStrip(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select("doc_id", "text")
      .unionByName(markupSamples(s))
      .select(
        col("doc_id"),
        TextFunctions.stripMarkup(col("text")).as("clean_text"),
        length(col("text")).as("n_chars_raw"),
        length(TextFunctions.stripMarkup(col("text"))).as("n_chars_clean"),
        TextFunctions.tagCount(col("text")).as("n_tags"))
      .orderBy("doc_id")

  /** TP8: the tp1 cleaning chain over the MARKUP-STRIPPED corpus (with the
    * HTML fixtures injected): strip → quality gate → exact dedup → near-dup
    * removal — the real front half of a crawl pipeline, hash-gated end to
    * end. */
  def cleanCorpusStripped(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select("doc_id", "text")
      .unionByName(markupSamples(s))
      .select(col("doc_id"), TextFunctions.stripMarkup(col("text")).as("text"))
    graft.pipeline.CorpusCleaner.clean(s, docs)
  }

  /** T23: DOMAIN-LEVEL CURATION — the per-domain caps + blocklist stage of
    * crawl pipelines (C4's badlist, RefinedWeb's per-domain quotas): a
    * deterministic URL column is synthesized (the corpus has none), the
    * domain is regexp-extracted (the real operator under test), blocklisted
    * domains drop via a broadcast anti-join (the q_t9 shape — the list is
    * tiny next to the corpus, so the filter is map-side), and each
    * surviving domain keeps its first 5 docs in md5-hash order (the q_p9
    * reproducible-sample discipline; a per-domain window, never a global
    * sort). Oracle-exact: URL synthesis, extraction, blocklist, and cap
    * rank all replay in SQL. */
  def domainCuration(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import s.implicits._
    val url = concat(lit("https://www."), col("source"), lit("-"),
      (col("doc_id") % 3).cast("string"),
      lit(".example.com/doc/"), col("doc_id").cast("string"))
    val withDomain = Tables.documents(s, d)
      .select(col("doc_id"), url.as("url"))
      .withColumn("domain", regexp_extract(col("url"), "https?://([^/]+)/", 1))
    val blocklist = Seq("www.src0-0.example.com", "www.src5-2.example.com").toDF("domain")
    val w = Window.partitionBy("domain")
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    withDomain
      .join(broadcast(blocklist), Seq("domain"), "left_anti")
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 5)
      .select("doc_id", "domain", "rk")
      .orderBy("doc_id")
  }

  /** T23b: the q_t23 domain cap through [[graft.operators.Skew.saltedTopK]]
    * — RESULT-IDENTICAL to the direct window (it shares q_t23's oracle
    * verbatim) but skew-safe: a domain with 10⁹ pages spreads over the
    * salt fan-out in phase 1 and only ≤ k·salts candidates per domain
    * reach the phase-2 rank. The shape the cap stage actually ships at
    * crawl scale. */
  def domainCurationSalted(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val url = concat(lit("https://www."), col("source"), lit("-"),
      (col("doc_id") % 3).cast("string"),
      lit(".example.com/doc/"), col("doc_id").cast("string"))
    val blocklist = Seq("www.src0-0.example.com", "www.src5-2.example.com").toDF("domain")
    val withDomain = Tables.documents(s, d)
      .select(col("doc_id"), url.as("url"))
      .withColumn("domain", regexp_extract(col("url"), "https?://([^/]+)/", 1))
      .join(broadcast(blocklist), Seq("domain"), "left_anti")
    graft.operators.Skew.saltedTopK(
        withDomain, Seq("domain"),
        Seq(md5(col("doc_id").cast("string")), col("doc_id")), k = 5)
      .select("doc_id", "domain", "rk")
      .orderBy("doc_id")
  }

  /** P15: LEAKAGE-FREE GROUP SPLIT — train/validation folds keyed by
    * DOMAIN, not document: fold = hex32(md5(domain)) mod 5, so every page
    * from a site lands in the same fold and near-duplicate boilerplate can
    * never straddle the split (the contamination channel a doc-keyed fold
    * leaves open — the q_p12 k-fold's group-aware sibling). Pure key
    * function: no RNG, no shuffle beyond the output sort; the no-straddle
    * guarantee is structural (fold is a function of the group key). */
  def groupSplit(s: SparkSession, d: String): DataFrame = {
    val url = concat(lit("https://www."), col("source"), lit("-"),
      (col("doc_id") % 3).cast("string"),
      lit(".example.com/doc/"), col("doc_id").cast("string"))
    Tables.documents(s, d)
      .select(col("doc_id"), url.as("url"))
      .withColumn("domain", regexp_extract(col("url"), "https?://([^/]+)/", 1))
      .withColumn("fold",
        (conv(substring(md5(col("domain")), 1, 8), 16, 10).cast("long") % 5).cast("int"))
      .select("doc_id", "domain", "fold")
      .orderBy("doc_id")
  }

  /** The injected crawl-shape fixtures for the Gopher rule set (the
    * synthetic corpus is single-line word streams, so bullet lists,
    * ellipsis endings, symbol spam, and short/numeric/long-word
    * pathologies are planted — the q_t7/q_t22 injection construction):
    * ids 4200000+ cover one pass-everything prose doc and one targeted
    * violation per rule. */
  private def gopherSamples(s: SparkSession): DataFrame = {
    import s.implicits._
    Seq(
      (4200000L, "the quick brown fox jumps over the lazy dog and then walks " +
        "to the river of glass that shines have you seen it with your own " +
        "eyes before the morning light fades away and the water runs clear " +
        "beneath the old stone bridge where children play their games during " +
        "long summer days that seem to last forever until dusk settles in"),
      (4200001L, "intro line\n- alpha item one\n- beta item two\n- gamma item three\n" +
        "- delta item four\n- epsilon item five\n- zeta item six\n- eta item seven\n" +
        "- theta item eight\n- iota item nine"),
      (4200002L, "first thought trails off ...\nsecond line is fine here\n" +
        "third one also ends ...\nfourth stays normal"),
      (4200003L, "# header # tag # more # hash # series # of # markers " +
        "# everywhere # in # this # doc"),
      (4200004L, "too short to pass"),
      (4200005L, "12345 67890 11111 22222 33333 44444 55555 66666 77777 88888 99999 00000"),
      (4200006L, "extraordinarily incomprehensibilities institutionalization " +
        "internationalization characteristically disproportionately"))
      .toDF("doc_id", "text")
  }

  /** The injected mojibake fixtures (ids 4950000+): classic UTF-8-as-
    * Latin-1 artifacts plus one clean control row. */
  private def mojibakeSamples(s: SparkSession): DataFrame = {
    import s.implicits._
    Seq(
      (4950000L, "CafÃ© rÃ©sumÃ© â€“ itâ€™s naÃ¯ve"),
      (4950001L, "â€œquotedâ€“dashâ€¦ and Ã¼ber Ã¶l Ã± Ã¨"),
      (4950002L, "perfectly clean ascii text here"))
      .toDF("doc_id", "text")
  }

  /** T28: MOJIBAKE DETECTION + REPAIR — the ftfy pass of crawl cleaning:
    * UTF-8 text decoded as Latin-1 somewhere upstream leaves artifact
    * sequences ("Ã©" for "é", "â€™" for "’") that poison tokenization,
    * language ID, and dedup keys. One ordered literal replacement chain
    * ([[TextFunctions.fixMojibake]]) repairs them; the artifact count is
    * the detection signal. Map-side only; oracle applies the identical
    * byte-level replaces. */
  def mojibakeRepair(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select("doc_id", "text")
      .unionByName(mojibakeSamples(s))
      .select(
        col("doc_id"),
        TextFunctions.fixMojibake(col("text")).as("fixed_text"),
        TextFunctions.mojibakeCount(col("text")).cast("long").as("n_artifacts"),
        (TextFunctions.mojibakeCount(col("text")) > 0).as("had_mojibake"))
      .orderBy("doc_id")

  /** The injected NFC fixtures: 4960000 is the DECOMPOSED spelling of
    * 4960001's composed text (combining acute/ring/diaeresis vs
    * precomposed é/Å/ö — the pair MUST collide after NFC), 4960002 is
    * pure ASCII (byte-identical through the fast path). */
  private def nfcSamples(s: SparkSession): DataFrame = {
    import s.implicits._
    Seq(
      (4960000L, "Cafe\u0301 au lait and A\u030Angstro\u0308m units"),
      (4960001L, "Caf\u00e9 au lait and \u00c5ngstr\u00f6m units"),
      (4960002L, "ascii only stays byte identical"))
      .toDF("doc_id", "text")
  }

  /** T29: UNICODE NFC NORMALIZATION + CANONICAL-FORM DEDUP — the
    * normalization pass every tokenizer pipeline runs before hashing:
    * decomposed ("Cafe" + combining U+0301) and composed ("Café")
    * spellings are byte-distinct but name the same text, so every
    * hash-keyed stage downstream (exact dedup, fingerprints, frequency
    * features) silently splits them unless NFC runs first. The custom
    * codegen'd [[TextFunctions.nfc]] expression (Spark has no built-in
    * normalizer; ASCII rows take a byte-scan fast path — the overwhelming
    * common case costs one scan, no String round-trip) feeds an
    * md5(nfc)-keyed dup group; the oracle cross-checks against the other
    * engine's independent normalizer implementation (utf8proc), which the
    * Unicode stabilization policy guarantees agrees. */
  def nfcNormalizeDocs(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(md5(col("text_nfc")))
    Tables.documents(s, d).select("doc_id", "text")
      .unionByName(nfcSamples(s))
      .withColumn("text_nfc", TextFunctions.nfc(col("text")))
      .withColumn("changed", col("text_nfc") =!= col("text"))
      .withColumn("keep", col("doc_id") === min("doc_id").over(w))
      .withColumn("n_forms", count(lit(1)).over(w))
      .select("doc_id", "text_nfc", "changed", "keep", "n_forms")
      .orderBy("doc_id")
  }

  /** The injected code-detection fixtures: 4980000 Python-shaped
    * (indent + keywords), 4980001 C-shaped (braces/semicolons), 4980002
    * plain prose that mentions the word "return" once (must NOT trip). */
  private def codeSamples(s: SparkSession): DataFrame = {
    import s.implicits._
    Seq(
      (4980000L, "def main(args):\n    x = load(args)\n    for row in x:\n        print(row)\n    return x"),
      (4980001L, "int main() {\n  int x = 0;\n  while (x < 10) { x = x + 1; }\n  return x;\n}"),
      (4980002L, "the traveler chose to return home before dark and wrote a long letter about the journey across the hills and the quiet villages that lined the road"),
      // CRLF sample: pins the \r?$ anchor — Java MULTILINE $ matches
      // before \r\n, RE2 only before \n, so without the optional \r this
      // document's n_punct_lines (4) would diverge between engines.
      (4980003L, "struct point {\r\n  int x;\r\n  int y;\r\n};\r\nstruct point origin\r\n"))
      .toDF("doc_id", "text")
  }

  /** Keyword list for the code gate — STRUCTURAL keywords only: common
    * English homographs ("if", "for", "while", "return") would let
    * ordinary prose trip the 5% token floor, so the list carries only
    * tokens that essentially never appear in natural text. */
  private[queries] val CodeKeywords: Seq[String] = Seq(
    "def", "class", "import", "function", "var", "const",
    "int", "void", "lambda", "elif", "printf", "struct", "typedef")

  /** T30: CODE-DOCUMENT DETECTION — the mix-routing gate every pretraining
    * pipeline runs (code goes to the code corpus with its own cleaning
    * and tokenizer budget; prose pipelines that keep code inflate symbol
    * ratios and poison LM-quality scores). Three integer signals from one
    * scan — indented-line count, code-punctuation line endings
    * (;/{/}-terminated), keyword token hits ([[CodeKeywords]], one fused
    * [[graft.functions.GraftFunctions.listHits]] pass) — and a
    * cross-multiplied disjunction gate: ≥30% indented lines OR ≥40%
    * punctuation-terminated lines OR ≥5% keyword tokens. No IEEE
    * arithmetic anywhere; the oracle replays the identical counts. */
  def codeDetect(s: SparkSession, d: String): DataFrame = {
    val toks = TextFunctions.tokens(TextFunctions.normText(col("text")))
    Tables.documents(s, d).select("doc_id", "text")
      .unionByName(codeSamples(s))
      .select(col("doc_id"),
        size(split(col("text"), "\n")).cast("long").as("n_lines"),
        size(regexp_extract_all(col("text"), lit("(?m)^(    |\\t)"), lit(0)))
          .cast("long").as("n_indent_lines"),
        // \r? before the anchor: Java MULTILINE $ matches before \r\n but
        // RE2 (the DuckDB oracle) only before \n — the optional \r makes
        // the line anchor engine-invariant on CRLF text (mirrored in SQL).
        size(regexp_extract_all(col("text"), lit("(?m)[;{}][ \\t]*\\r?$"), lit(0)))
          .cast("long").as("n_punct_lines"),
        element_at(graft.functions.GraftFunctions.listHits(toks, Seq(CodeKeywords)), 1)
          .cast("long").as("n_kw"),
        size(toks).cast("long").as("n_words"))
      .withColumn("code_like",
        (col("n_indent_lines") * 10 >= col("n_lines") * 3) ||
          (col("n_punct_lines") * 10 >= col("n_lines") * 4) ||
          // n_kw > 0 guards the empty/zero-token doc (0 >= 0 would trip)
          (col("n_kw") > 0 && col("n_kw") * 20 >= col("n_words")))
      .orderBy("doc_id")
  }

  /** T24: GOPHER QUALITY RULES (Rae et al. 2021, Appendix A) — the
    * heuristic document gate every pre-training pipeline runs before the
    * model-based filters: word-count bounds, mean-word-length bounds,
    * symbol-to-word ratio, bullet-line and ellipsis-line fractions,
    * alpha-word fraction, and a minimum-distinct-stopword requirement.
    * Every rule is evaluated as an INTEGER cross-multiplication
    * (3·n ≤ Σlen ≤ 10·n instead of a float mean), so the gate involves no
    * IEEE arithmetic at all and replays bit-exactly in any engine; counts
    * come from one codegen'd regexp/token scan per signal (no UDFs, no
    * higher-order lambdas). Threshold orientation: the paper removes
    * documents strictly BEYOND each ratio cap (symbol ratio > 0.1,
    * bullet fraction > 0.9, ellipsis fraction > 0.3, alpha-word fraction
    * < 0.8), so a document sitting exactly AT a threshold is KEPT —
    * hence `<=`/`>=` in the integer cross-multiplied forms. */
  /** The eight Gopher signal expressions over a raw text column — THE
    * single source both q_t24 (named columns) and the composed gates
    * (q_tp12/q_tp15/q_tp16 via [[gopherPassCol]]) evaluate, so a
    * rule/regex fix can never diverge the standalone query from the
    * pipelines. Σ word length needs no per-token lambda: every
    * non-whitespace char belongs to exactly one token. */
  private def gopherSignalCols(txt: Column): Seq[(String, Column)] = {
    val toks = TextFunctions.tokens(txt)
    val lt = TextFunctions.tokens(lower(txt))
    Seq(
      "n_words" -> size(toks).cast("long"),
      "sum_wlen" -> length(regexp_replace(txt, "\\s+", "")).cast("long"),
      "n_symbols" -> size(regexp_extract_all(txt, lit("#|\\.\\.\\."), lit(0))).cast("long"),
      "n_lines" -> size(split(txt, "\n")).cast("long"),
      "n_bullet_lines" ->
        size(regexp_extract_all(txt, lit("(?m)^[ \\t]*[-*] "), lit(0))).cast("long"),
      "n_ellipsis_lines" ->
        size(regexp_extract_all(txt, lit("(?m)\\.\\.\\.$"), lit(0))).cast("long"),
      "n_alpha_words" ->
        size(regexp_extract_all(txt, lit("[^\\s]*\\p{L}[^\\s]*"), lit(0))).cast("long"),
      "n_stopword_kinds" -> GopherStopwords
        .map(w => array_contains(lt, w).cast("int"))
        .reduce(_ + _).cast("long"))
  }

  /** The rule conjunction over the (named or inline) signal columns. */
  private def gopherRuleSet(c: String => Column, stopMin: Int): Column =
    c("n_words").between(50L, 100000L) &&
      (c("sum_wlen") >= c("n_words") * 3) && (c("sum_wlen") <= c("n_words") * 10) &&
      (c("n_symbols") * 10 <= c("n_words")) &&
      (c("n_bullet_lines") * 10 <= c("n_lines") * 9) &&
      (c("n_ellipsis_lines") * 10 <= c("n_lines") * 3) &&
      (c("n_alpha_words") * 10 >= c("n_words") * 8) &&
      (c("n_stopword_kinds") >= stopMin)

  def gopherRules(s: SparkSession, d: String): DataFrame = {
    val sig = Tables.documents(s, d).select("doc_id", "text")
      .unionByName(gopherSamples(s))
      .select(col("doc_id") +:
        gopherSignalCols(col("text")).map { case (n, c) => c.as(n) }: _*)
    sig.withColumn("pass_gopher", gopherRuleSet(col, stopMin = 2))
      .orderBy("doc_id")
  }

  /** Gopher's stopword-presence list (the paper's 8 words; distinct-kind
    * presence, not token frequency). */
  private[queries] val GopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** The q_t24 rule set as ONE boolean gate expression over a text column
    * (for pipeline composition). `stopMin` parameterizes the
    * distinct-stopword floor: the paper's 2 suits English prose; the
    * synthetic corpus carries only "the" from the list, so q_tp12 gates
    * at 1 — the knob a real pipeline tunes per-language. */
  private def gopherPassCol(txt: Column, stopMin: Int): Column = {
    val sigs = gopherSignalCols(txt).toMap
    gopherRuleSet(sigs, stopMin)
  }

  /** TP12: CRAWL-FRONT CAPSTONE — the full pre-content half of a crawl
    * pipeline as ONE composed, oracle-gated chain, in production order:
    *   1. canonical-URL dedup (q_t25; refetches die before any text work),
    *   2. markup strip (q_t22),
    *   3. Gopher heuristic gate (q_t24 rules at stopMin=1) on the
    *      STRIPPED text,
    *   4. per-domain cap of 5 in md5 order (q_t23; domain from the
    *      CANONICAL host, not the raw URL),
    *   5. exact content dedup on the stripped fingerprint.
    * Inputs are documents plus BOTH fixture families (markup + gopher),
    * so every stage has planted rows proving it fires; fixture URLs key
    * off doc_id itself (each fixture is its own resource) while corpus
    * URLs keep the q_t25 DIV-2 pairing, so stage-1 halves the corpus by
    * construction. Every stage is a hash shuffle or a bounded window —
    * the same shapes as its stand-alone query — and the whole chain is
    * replayed by ONE SQL oracle (the tp5 composition discipline). */
  def crawlPipeline(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val id = col("doc_id")
    val base = Tables.documents(s, d).select("doc_id", "text")
      .unionByName(markupSamples(s))
      .unionByName(gopherSamples(s))
    val key = expr("CASE WHEN doc_id >= 4000000 THEN doc_id ELSE doc_id DIV 2 END")
    val wUrl = Window.partitionBy("url_canon")
    val afterUrl = base
      .withColumn("url_raw", messyUrl(id, key))
      .withColumn("url_canon", TextFunctions.canonicalUrl(col("url_raw")))
      .withColumn("u_min", min("doc_id").over(wUrl))
      .filter(id === col("u_min"))
    val gated = afterUrl
      .withColumn("text_clean", TextFunctions.stripMarkup(col("text")))
      .filter(gopherPassCol(col("text_clean"), stopMin = 1))
      .withColumn("domain", regexp_extract(col("url_canon"), "https?://([^/:]+)", 1))
    val wDom = Window.partitionBy("domain")
      .orderBy(md5(id.cast("string")), id)
    val wFp = Window.partitionBy("fp")
    gated
      .withColumn("rk", row_number().over(wDom))
      .filter(col("rk") <= 5)
      .withColumn("fp", md5(TextFunctions.normText(col("text_clean"))))
      .withColumn("fp_min", min("doc_id").over(wFp))
      .filter(id === col("fp_min"))
      .select(id, col("domain"), col("rk"),
        size(TextFunctions.tokens(col("text_clean"))).cast("long").as("n_words"))
      .orderBy("doc_id")
  }

  /** The injected messy-URL fixtures (hand-built case/port/param/slash
    * pathologies; 4300003 canonicalizes INTO 4300000's URL so a
    * cross-fixture dup group exists; 4300004/4300005 are PATH-LESS URLs
    * with a query — host lowercasing must stop at `?`, the query's case
    * must survive, and the default-port strip must still anchor): ids
    * 4300000+. */
  private def urlSamples(s: SparkSession): DataFrame = {
    import s.implicits._
    Seq(
      (4300000L, "HTTPS://Site.Example.COM:443//a//b/?utm_source=x&utm_medium=y#frag"),
      (4300001L, "https://site.example.com/a/b?id=2&utm_campaign=z"),
      (4300002L, "http://host.example.com:80/x/"),
      (4300003L, "https://site.example.com//a/b/"),
      (4300004L, "https://Path-Less.Example.com?id=AbC&utm_source=x"),
      (4300005L, "https://path-less.example.com:443?id=AbC"),
      // query values are OPAQUE: slash-distinct queries must NOT collide
      (4300006L, "https://qv.example.com/p?next=//x/"),
      (4300007L, "https://qv.example.com/p?next=/x"))
      .toDF("doc_id", "url_raw")
  }

  /** T25: URL CANONICALIZATION + CANONICAL-URL DEDUP — the crawl
    * front-door pass before any content fetch or text dedup: raw crawl
    * URLs that differ only in case, default ports, `utm_*` tracking
    * params, fragments, or duplicate/trailing slashes name the SAME
    * resource, and deduping on the canonical form removes refetches at
    * zero content cost. Messy raw URLs are synthesized deterministically
    * from doc_id (the corpus has none): host keys off doc_id DIV 2, so
    * each even/odd pair names one resource through two differently-messy
    * URLs — the canonical group structure is known by construction.
    * Canonicalization is [[TextFunctions.canonicalUrl]] (pure regexp,
    * oracle-mirrored); dedup is one window over the canonical key (a
    * single hash shuffle; group sizes are bounded by construction — at
    * crawl scale canonical-URL groups are small, so no skew handling is
    * needed where content-hash dedup would salt). */
  /** Deterministic messy-URL synthesis shared by q_t25/q_tp12: `key` names
    * the RESOURCE (equal keys collide after canonicalization), `id` keys
    * the messiness pattern (case, port, duplicate slash, trailing slash,
    * tracking param, fragment). Integer division callers must pass DIV
    * expressions, NOT (x/2).cast("long"): Spark's double-cast truncates
    * but DuckDB's rounds — DIV is exact in both engines. */
  private def messyUrl(id: Column, key: Column): Column = {
    val schemeHost = when(id % 5 === 0,
      concat(lit("HTTPS://WWW.SITE"), (key % 40).cast("string"),
        lit(".EXAMPLE.COM")))
      .otherwise(concat(lit("https://www.site"), (key % 40).cast("string"),
        lit(".example.com")))
    concat(
      schemeHost,
      when(id % 4 === 0, lit(":443")).otherwise(lit("")),
      when(id % 2 === 1, lit("/doc//")).otherwise(lit("/doc/")),
      key.cast("string"),
      when(id % 11 === 0, lit("/")).otherwise(lit("")),
      when(id % 3 === 0, lit("?utm_source=feed")).otherwise(lit("")),
      when(id % 7 === 0, lit("#sec2")).otherwise(lit("")))
  }

  /** The q_t25/q_e14 input: corpus URLs (DIV-2 resource key) plus the
    * messy fixtures. */
  private def urlRawFrame(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), messyUrl(col("doc_id"), expr("doc_id DIV 2")).as("url_raw"))
      .unionByName(urlSamples(s))

  def urlCanonicalDedup(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("url_canon")
    urlRawFrame(s, d)
      .withColumn("url_canon", TextFunctions.canonicalUrl(col("url_raw")))
      .withColumn("keep", col("doc_id") === min("doc_id").over(w))
      .withColumn("group_size", count(lit(1)).over(w))
      .select("doc_id", "url_raw", "url_canon", "keep", "group_size")
      .orderBy("doc_id")
  }

  /** T25b: SKEW-SAFE CANONICAL-URL DEDUP — q_t25's window re-expressed as
    * salted aggregate + salted hash-join recombine, each piece chosen
    * against a measured failure mode (20M rows, one canonical URL holding
    * 80% — the crawl-loop shape):
    *   1. group stats (keep_id = min doc_id, group_size = count) come
    *      from a per-(key, salt) partial aggregate: ALGEBRAIC aggregates
    *      partial-combine map-side, so the stats shuffle is skinny no
    *      matter how hot the key — where q_t25's window must BUFFER the
    *      hot key's entire row set in one task;
    *   2. the recombine join back to rows is keyed on (url_canon, _salt),
    *      so the hot key's rows spread over 16 reducers BY CONSTRUCTION.
    *      Relying on AQE's skew-join instead does NOT work here, for a
    *      reason worth recording: AQE detects skew on COMPRESSED BYTES,
    *      and a hot key's near-identical rows compress so well (measured:
    *      the 16M-row hot partition and the 130k-row tail partitions both
    *      read ~18MB) that the skewed partition is byte-invisible while
    *      still carrying 100x the rows through sorting and downstream
    *      operators;
    *   3. the recombine is hinted SHUFFLE_HASH: a sort-merge join would
    *      SORT the full raw frame — measured 2x the window's own cost,
    *      spending exactly what the salting saved.
    * min and count are algebraic, so the result is EXACTLY q_t25's (this
    * query shares q_t25's oracle verbatim). */
  def urlCanonicalDedupSalted(s: SparkSession, d: String): DataFrame =
    skewSplitUrlDedup(
      urlRawFrame(s, d)
        .withColumn("url_canon", TextFunctions.canonicalUrl(col("url_raw"))))
      .orderBy("doc_id")

  /** The q_t25b kernel over any (doc_id, url_raw, url_canon) frame —
    * shared by the query surface and the Scratch hot-key experiment.
    * Joins are NULL-SAFE on url_canon: groupBy places NULL keys in one
    * group, and a plain equi-join would silently DROP those rows where
    * the q_t25 window form (whose oracle this query shares) keeps them
    * in a NULL partition — the two forms must agree on every input. */
  private[graft] def skewSplitUrlDedup(rawIn: DataFrame): DataFrame = {
    val raw = rawIn.withColumn("_salt", pmod(hash(col("doc_id")), lit(16)))
    val g1 = raw.groupBy("url_canon", "_salt")
      .agg(min("doc_id").as("pmin"), count(lit(1)).as("pcnt"))
    val g2 = g1.groupBy("url_canon")
      .agg(min("pmin").as("keep_id"), sum("pcnt").as("group_size"))
    val stats = g1.select(col("url_canon").as("c1"), col("_salt").as("s1"))
      .join(g2.withColumnRenamed("url_canon", "c2"),
        col("c1") <=> col("c2"))
      .select(col("c1"), col("s1"), col("keep_id"), col("group_size"))
      .hint("SHUFFLE_HASH")
    raw.join(stats,
      raw("url_canon") <=> stats("c1") && raw("_salt") === stats("s1"))
      .select(col("doc_id"), col("url_raw"), col("url_canon"),
        (col("doc_id") === col("keep_id")).as("keep"), col("group_size"))
  }

  /** E14: STREAMING URL FRONTIER — the crawl frontier's "have we seen this
    * URL?" check as a Structured Streaming pipeline: canonical-URL
    * batches (ascending doc_id ranges — a crawl queue drains roughly in
    * discovery order) are classified against a parquet-backed frontier
    * store of every canonical URL already kept. Within a batch the q_t25
    * min rule applies; across batches the store decides — and because
    * batches arrive in ascending ranges, the composition is EXACTLY the
    * one-shot q_t25 min rule, so this query shares q_t25's oracle (minus
    * group_size, which needs future knowledge no frontier has).
    *
    * Scale shape (the q_dd9/q_e11 discipline): the frontier store is only
    * ever probed by a BROADCAST of the current batch's canonical keys —
    * the store itself never shuffles; per-batch state updates append only
    * kept keys; outputs are batchId-keyed + overwrite = idempotent under
    * retry. */
  def streamedUrlFrontier(s: SparkSession, d: String): DataFrame = {
    val root = java.nio.file.Files.createTempDirectory("graft_stream_e14").toString
    urlFrontierWaves(s, d).zipWithIndex.foreach { case (df, i) => writeWave(root, i, df) }
    runUrlFrontierStream(s, root)
    s.read.parquet(s"$root/out/b*").orderBy("doc_id")
  }

  /** The q_e14 arrival waves: ascending doc_id thirds of the raw-URL frame
    * (a crawl queue drains roughly in discovery order). */
  private[graft] def urlFrontierWaves(s: SparkSession, d: String): Seq[DataFrame] = {
    val all = urlRawFrame(s, d).truncateLineage()
    val n = Tables.documents(s, d).count()
    Seq(
      all.filter(col("doc_id") < n / 3),
      all.filter(col("doc_id") >= n / 3 && col("doc_id") < 2 * n / 3),
      all.filter(col("doc_id") >= 2 * n / 3))
  }

  /** One foreachBatch application of the URL frontier — state recovery is
    * disk-derived ([[graft.streaming.BatchState]]), so the maintainer is
    * restart-correct and retry-idempotent (the q_e11 discipline;
    * kill/restart exercised in StreamingSpec). */
  private[graft] def urlFrontierBatch(s: SparkSession, root: String)(
      batch: DataFrame, id: Long): Unit =
    if (!batch.isEmpty) {
      import org.apache.spark.sql.expressions.Window
      val stateDir = graft.streaming.BatchState.latestState(root, id)
      val withCanon = batch
        .withColumn("url_canon", TextFunctions.canonicalUrl(col("url_raw")))
        .truncateLineage()
      // the store is probed by a broadcast semi-join of the BATCH's keys
      // — the (unboundedly growing) store side never shuffles
      val seen = stateDir
        .map(p => s.read.parquet(p).join(
          broadcast(withCanon.select("url_canon").distinct()),
          Seq("url_canon"), "left_semi"))
        .getOrElse(withCanon.select("url_canon").limit(0))
        .withColumn("in_store", lit(1))
      val wc = Window.partitionBy("url_canon")
      val marked = withCanon
        .withColumn("b_min", min("doc_id").over(wc))
        .join(broadcast(seen), Seq("url_canon"), "left")
        .withColumn("keep",
          col("in_store").isNull && col("doc_id") === col("b_min"))
      marked.select("doc_id", "url_raw", "url_canon", "keep")
        .write.mode("overwrite").parquet(s"$root/out/b$id")
      stateDir.map(s.read.parquet(_)).getOrElse(withCanon.select("url_canon").limit(0))
        .unionByName(marked.filter(col("keep")).select("url_canon"))
        .write.mode("overwrite").parquet(s"$root/state$id")
    }

  /** Runs the q_e14 frontier stream over `root` until every currently
    * available wave is classified, then stops. Safe to call repeatedly —
    * the checkpoint skips seen files — which is how StreamingSpec drives
    * a kill/restart. */
  private[graft] def runUrlFrontierStream(s: SparkSession, root: String): Unit = {
    import org.apache.spark.sql.{Dataset, Row}
    val q = s.readStream
      .schema("doc_id BIGINT, url_raw STRING")
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$root/in/p*")
      .writeStream
      .option("checkpointLocation", s"$root/ckpt")
      .foreachBatch((batch: Dataset[Row], id: Long) =>
        urlFrontierBatch(s, root)(batch.toDF(), id))
      .start()
    try q.processAllAvailable()
    finally q.stop()
  }

  /** S13: SHARD MANIFEST — the dataset-publishing step after packing: docs
    * are assigned to shards by a pure hash key (hex32(md5(doc_id)) mod 8 —
    * the q_p12 k-fold function, so assignment is reproducible on any
    * cluster and never needs a shuffle beyond the manifest aggregate
    * itself), and each shard's manifest row carries the counts a consumer
    * validates against after download: docs, chars, whitespace tokens,
    * id range, and an ORDER-INDEPENDENT content checksum (commutative
    * int64 sum of per-doc md5 fingerprints — the q_o8 anti-entropy
    * primitive, so two replicas can be compared without sorting either
    * side). One aggregate pass, map-side partials, 8 output rows. */
  private def manifestOf(docs: DataFrame): DataFrame = {
    val shard = (conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
      .cast("long") % 8).cast("int")
    docs
      .withColumn("shard", shard)
      .groupBy("shard")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(length(col("text"))).as("n_chars"),
        sum(TextFunctions.tokenCount(col("text")).cast("long")).as("n_tokens"),
        min("doc_id").as("min_doc_id"),
        max("doc_id").as("max_doc_id"),
        sum(conv(substring(md5(concat_ws("|",
          col("doc_id").cast("string"), md5(col("text")))), 1, 8), 16, 10)
          .cast("long")).as("checksum"))
  }

  def shardManifest(s: SparkSession, d: String): DataFrame =
    manifestOf(Tables.documents(s, d)).orderBy("shard")

  /** S15: MANIFEST DIFF BETWEEN DATASET VERSIONS — the consumer-side
    * validation of publishing: given v1's manifest and v2's (v2
    * synthesized deterministically: every doc_id % 97 == 0 gets an
    * ' updated-v2' suffix, and the first 10 docs arrive again as new ids
    * +5000000), report per shard what changed — doc/char/token deltas
    * and whether the content checksum moved. The checksums make the diff
    * TRUSTWORTHY without any row comparison: a shard whose counts match
    * but whose checksum differs still flags (content edits that preserve
    * sizes — the case count-only validation silently passes). Cost: two
    * manifest aggregates + an 8x8 join, independent of dataset size. */
  def manifestDiff(s: SparkSession, d: String): DataFrame = {
    val v1 = Tables.documents(s, d).select("doc_id", "text")
    val v2 = v1
      .withColumn("text",
        when(col("doc_id") % 97 === 0, concat(col("text"), lit(" updated-v2")))
          .otherwise(col("text")))
      .unionByName(v1.filter(col("doc_id") < 10)
        .select((col("doc_id") + 5000000L).as("doc_id"), col("text")))
    val m1 = manifestOf(v1)
    val m2 = manifestOf(v2)
    m1.as("a").join(m2.as("b"), col("a.shard") === col("b.shard"), "full")
      .select(
        coalesce(col("a.shard"), col("b.shard")).as("shard"),
        coalesce(col("a.n_docs"), lit(0L)).as("n_docs_v1"),
        coalesce(col("b.n_docs"), lit(0L)).as("n_docs_v2"),
        (coalesce(col("b.n_docs"), lit(0L)) - coalesce(col("a.n_docs"), lit(0L)))
          .as("delta_docs"),
        (coalesce(col("b.n_chars"), lit(0L)) - coalesce(col("a.n_chars"), lit(0L)))
          .as("delta_chars"),
        (coalesce(col("b.n_tokens"), lit(0L)) - coalesce(col("a.n_tokens"), lit(0L)))
          .as("delta_tokens"),
        (!(col("a.checksum") <=> col("b.checksum"))).as("changed"))
      .orderBy("shard")
  }

  /** S14: INCREMENTAL MANIFEST MAINTENANCE — when a new batch lands, the
    * published manifest updates by MERGING the batch's partial manifest
    * into the existing one (sums add, id ranges min/max-combine, the
    * commutative checksum adds) instead of rescanning the whole dataset —
    * the q_a22 incremental-rollup discipline applied to the publishing
    * metadata. Every manifest column is an algebraic aggregate, so
    * incremental ≡ from-scratch EXACTLY: this query merges a 90% base
    * with a 10% delta and shares q_s13's from-scratch oracle verbatim.
    * Merge cost is 8+8 rows — independent of data size. */
  /** The algebraic manifest merge shared by q_s14 and q_e15: sums add, id
    * ranges min/max-combine, the commutative checksum adds. */
  private def mergeManifests(base: DataFrame, delta: DataFrame): DataFrame = {
    def m(c: String, how: (Column, Column) => Column) =
      how(col(s"b.$c"), col(s"d.$c")).as(c)
    def addL(a: Column, b: Column) = coalesce(a, lit(0L)) + coalesce(b, lit(0L))
    base.as("b").join(delta.as("d"), col("b.shard") === col("d.shard"), "full")
      .select(
        coalesce(col("b.shard"), col("d.shard")).as("shard"),
        m("n_docs", addL), m("n_chars", addL), m("n_tokens", addL),
        m("min_doc_id", (a, b) => least(a, b)),
        m("max_doc_id", (a, b) => greatest(a, b)),
        m("checksum", addL))
  }

  def incrementalManifest(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    mergeManifests(
      manifestOf(docs.filter(col("doc_id") % 10 =!= 0)),
      manifestOf(docs.filter(col("doc_id") % 10 === 0)))
      .orderBy("shard")
  }

  /** E15: STREAMING MANIFEST MAINTENANCE — the publishing metadata kept
    * current BY the ingest stream: each micro-batch's partial manifest
    * merges into the parquet-backed running manifest (8 rows of state,
    * [[mergeManifests]] algebra), so after the last batch the maintained
    * manifest IS the from-scratch one — this query shares q_s13's oracle
    * verbatim (the q_e11/q_e12 incremental ≡ batch discipline, applied
    * to the q_s14 merge). batchId-keyed output + overwrite = idempotent
    * under retry. */
  def streamedManifest(s: SparkSession, d: String): DataFrame = {
    val root = java.nio.file.Files.createTempDirectory("graft_stream_e15").toString
    manifestStreamWaves(s, d).zipWithIndex.foreach { case (df, i) => writeWave(root, i, df) }
    runManifestStream(s, root)
    s.read.parquet(graft.streaming.BatchState.latestState(root, Long.MaxValue)
        .getOrElse(sys.error("no batches arrived")))
      .orderBy("shard")
  }

  /** The q_e15 arrival waves: ascending doc_id thirds of the documents
    * table. */
  private[graft] def manifestStreamWaves(s: SparkSession, d: String): Seq[DataFrame] = {
    val docs = Tables.documents(s, d).select("doc_id", "text").truncateLineage()
    val n = docs.count()
    Seq(
      docs.filter(col("doc_id") < n / 3),
      docs.filter(col("doc_id") >= n / 3 && col("doc_id") < 2 * n / 3),
      docs.filter(col("doc_id") >= 2 * n / 3))
  }

  /** One foreachBatch application of the manifest maintainer — state
    * recovery is disk-derived ([[graft.streaming.BatchState]]), so the
    * maintainer is restart-correct and retry-idempotent (the q_e11
    * discipline; kill/restart exercised in StreamingSpec). */
  private[graft] def manifestStreamBatch(s: SparkSession, root: String)(
      batch: DataFrame, id: Long): Unit =
    if (!batch.isEmpty) {
      val partial = manifestOf(batch).truncateLineage()
      val merged = graft.streaming.BatchState.latestState(root, id)
        .map(p => mergeManifests(s.read.parquet(p), partial))
        .getOrElse(partial)
      merged.write.mode("overwrite").parquet(s"$root/state$id")
    }

  /** Runs the q_e15 manifest stream over `root` until every currently
    * available wave is merged, then stops. Safe to call repeatedly — the
    * checkpoint skips seen files — which is how StreamingSpec drives a
    * kill/restart. */
  private[graft] def runManifestStream(s: SparkSession, root: String): Unit = {
    import org.apache.spark.sql.{Dataset, Row}
    val q = s.readStream
      .schema("doc_id BIGINT, text STRING")
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$root/in/p*")
      .writeStream
      .option("checkpointLocation", s"$root/ckpt")
      .foreachBatch((batch: Dataset[Row], id: Long) =>
        manifestStreamBatch(s, root)(batch.toDF(), id))
      .start()
    try q.processAllAvailable()
    finally q.stop()
  }

  /** TP15: ENSEMBLE QUALITY GATE — the FineWeb-Edu-style decision layer:
    * a document survives only if the TRAINED classifier (q_t21 score ≥
    * its operating point), the heuristic Gopher rule set (q_t24 at
    * stopMin=1), and the repetition cap (q_t8, integer form) all agree.
    * Signals that fail ship as per-rule booleans, not just a verdict —
    * the per-rule rejection attribution production filters log. One
    * corpus scan computes both heuristic signals; the classifier join
    * reuses the cached per-(session, sf) model. */
  def ensembleGate(s: SparkSession, d: String): DataFrame = {
    val norm = TextFunctions.normText(col("text"))
    val toks = TextFunctions.tokens(norm)
    val nTok = size(toks)
    val nDist = size(array_distinct(toks))
    val sigs = Tables.documents(s, d).select(
      col("doc_id"),
      gopherPassCol(col("text"), stopMin = 1).as("pass_gopher"),
      // cap 0.9, not q_t8's 0.3: the synthetic corpus is a 40-word
      // vocabulary, so natural long docs all carry ~0.85 dup-token ratio
      // — the cap is the per-corpus operating point, like stopMin
      ((nTok - nDist) * 10 <= nTok * 9).as("pass_repetition"))
    classifierScores(s, d).join(sigs, Seq("doc_id"))
      .select(col("doc_id"), col("score"),
        (col("score") >= lit(450.0)).as("pass_classifier"),
        col("pass_gopher"), col("pass_repetition"))
      .withColumn("keep",
        col("pass_classifier") && col("pass_gopher") && col("pass_repetition"))
      .orderBy("doc_id")
  }

  /** P16: EPOCH REPETITION MIX — materialized per-source up/down-sampling
    * (the "repeat Wikipedia 3×, subsample CommonCrawl to 75%" step of
    * every pre-training mix): a broadcast config maps each source to an
    * integer epoch count plus a fractional md5-threshold extra epoch, and
    * docs explode into (doc_id, copy) instances — epochs=0 + fractional
    * expresses pure subsampling with the same rule. Deterministic (no
    * RNG: the fractional epoch is the q_p9 hash-threshold), so the
    * instance multiset is reproducible on any cluster; the output gates
    * it with an order-independent instance checksum (the q_o8 primitive).
    * Scale shape: config broadcasts, the explode is map-side, and only
    * the per-source aggregate shuffles. */
  /** The q_p16 instance generator over any (doc_id, source) frame —
    * shared with the q_tp16 publish capstone. */
  private def epochInstances(s: SparkSession, docs: DataFrame): DataFrame = {
    import s.implicits._
    val cfg = ((0 to 4).map(i => (s"src$i", 3, "80")) ++
      (5 to 9).map(i => (s"src$i", 1, "40")) ++
      (10 to 19).map(i => (s"src$i", 0, "c0")))
      .toDF("source", "epochs", "fthr")
    docs.join(broadcast(cfg), Seq("source"))
      .withColumn("extra",
        (substring(md5(concat(col("doc_id").cast("string"), lit("epoch"))), 1, 2)
          < col("fthr")).cast("int"))
      .withColumn("n_copies", col("epochs") + col("extra"))
      .filter(col("n_copies") > 0)
      .select(col("source"), col("doc_id"),
        explode(sequence(lit(1), col("n_copies"))).as("copy"))
  }

  def epochRepeat(s: SparkSession, d: String): DataFrame = {
    epochInstances(s, Tables.documents(s, d))
      .groupBy("source")
      .agg(
        countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_instances"),
        sum(conv(substring(md5(concat_ws("#",
          col("doc_id").cast("string"), col("copy").cast("string"))), 1, 8), 16, 10)
          .cast("long")).as("instance_checksum"))
      .orderBy("source")
  }

  /** P17: DSIR-STYLE IMPORTANCE RESAMPLING (Xie et al. 2023) — the
    * data-SELECTION method production pretraining uses to tilt a raw
    * crawl toward a target distribution:
    *   1. hashed bag-of-ngrams features (unigrams + word bigrams →
    *      md5-hash buckets, K = 1024 — the q_t17 hashing discipline);
    *   2. per-bucket log importance ratios between the TARGET slice
    *      (sources src0–src4, the curated half of the mix config) and
    *      the RAW corpus, Laplace-smoothed, floor-scaled to integer
    *      micro-logs (the q_t6/q_t16 construction — ln ulps collapse
    *      under floor(·1e6), and everything after is exact int64);
    *   3. per-doc log-weight = Σ micro-λ over its grams (one broadcast
    *      join of the 1024-row ratio table + a map-side-combined sum);
    *   4. GUMBEL TOP-K resampling — sampling ∝ exp(weight) without
    *      replacement ≡ taking the k largest (log-weight + Gumbel) keys,
    *      with the Gumbel noise derived deterministically from
    *      md5(doc_id): g = floor(−1e6·ln(−ln(u))), u = (hex32+0.5)/2^32.
    *      Selection uses the distributed top-k THRESHOLD (TakeOrdered of
    *      the k-th key, broadcast back) — no global single-partition
    *      window at any scale.
    * Scale shape: two skinny K-bucket aggregates, one broadcast of 1024
    * rows, one map-side-combined per-doc sum, one distributed top-k; the
    * corpus text is scanned once. */
  def importanceResample(s: SparkSession, d: String): DataFrame = {
    val kBuckets = 1024
    val target = (0 to 4).map(i => s"src$i")
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), col("source"),
        TextFunctions.tokens(TextFunctions.normText(col("text"))).as("toks"))
    // bag-of-ngrams = the token MULTISET plus every adjacent bigram
    // (TextFunctions.wordShingles dedups — wrong for count features)
    val bigrams = when(size(col("toks")) >= 2,
      transform(sequence(lit(1), size(col("toks")) - 1), i =>
        concat(element_at(col("toks"), i), lit(" "),
          element_at(col("toks"), i + 1))))
      .otherwise(typedlit(Seq.empty[String]))
    val grams = docs.select(col("doc_id"), col("source"),
      explode(concat(col("toks"), bigrams)).as("gram"))
      .withColumn("bucket",
        (conv(substring(md5(col("gram")), 1, 8), 16, 10).cast("long")
          % kBuckets).cast("int"))
    // Corpus-wide and target-slice bucket counts FUSED into one
    // conditional aggregate: previously `raw` and `tgt` were separate
    // groupBys over the same gram stream, i.e. two full tokenize+explode
    // passes where one suffices (a count over a slice is a conditional
    // count over the whole — guide §2.3, aggregate before you shuffle).
    // `ct` is 0 instead of absent for target-free buckets; the lam formula
    // already coalesced NULL ct to 0, so every number is bit-identical.
    // (A (doc, bucket) count-matrix single-pass variant was measured WORSE
    // at 100x — fixture docs are short, so per-doc counts are ~1 and the
    // matrix is as big as the gram stream plus a materialization:
    // 36.1 s vs 25.8 s. Negative result recorded in OPTIMIZATION_r15.md.)
    val bucketCounts = grams.groupBy("bucket").agg(
      count(lit(1)).as("cr"),
      sum(when(col("source").isin(target: _*), 1L).otherwise(0L)).as("ct"))
      .truncateTransientLineage() // tiny (≤ kBuckets rows); read 3x below
    val raw = bucketCounts.select("bucket", "cr")
    val tgt = bucketCounts.select("bucket", "ct")
    val totals = raw.agg(sum("cr").as("rtot")).crossJoin(tgt.agg(sum("ct").as("ttot")))
    // λ[k] = floor(1e6 · ln( (ct+1)/(T+K) · (R+K)/(cr+1) )), evaluated as
    // one double ratio with an identical operation order in the oracle
    val lam = s.range(kBuckets).select(col("id").cast("int").as("bucket"))
      .join(raw, Seq("bucket"), "left")
      .join(tgt, Seq("bucket"), "left")
      .crossJoin(broadcast(totals))
      .select(col("bucket"),
        floor(log(
          ((coalesce(col("ct"), lit(0L)) + 1).cast("double") *
            (col("rtot") + kBuckets).cast("double")) /
            ((coalesce(col("cr"), lit(0L)) + 1).cast("double") *
              (col("ttot") + kBuckets).cast("double"))) * lit(1e6))
          .cast("long").as("lam_micro"))
    val scored = grams
      .join(broadcast(lam), Seq("bucket"))
      .groupBy("doc_id")
      .agg(sum("lam_micro").as("w_micro"), count(lit(1)).as("n_grams"))
    val u = (conv(substring(md5(concat(col("doc_id").cast("string"), lit("gum"))),
      1, 8), 16, 10).cast("double") + lit(0.5)) / lit(4294967296.0)
    // materialized at the narrow per-doc grain: both consumers below (the
    // k-th-key threshold and the output join) would otherwise re-run the
    // entire gram scan + feature chain (observed as twin plan subtrees)
    val keyed = docs.select("doc_id")
      .join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("w_micro"), lit(0L)).as("w_micro"),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"))
      .withColumn("gumbel_key",
        col("w_micro") + floor(-log(-log(u)) * lit(1e6)).cast("long"))
      .truncateLineage()
    // one row per document by construction, already materialized — no
    // extra documents-table scan to size k
    val k = (keyed.count() / 4L).toInt
    // the k-th (gumbel_key desc, doc_id asc) pair — distributed
    // TakeOrderedAndProject, then ONE broadcast threshold row; the kept
    // set is everything lexicographically <= the k-th key (ties split by
    // doc_id, so exactly k rows select at any scale)
    val kth = keyed.orderBy(col("gumbel_key").desc, col("doc_id"))
      .limit(k)
      .agg(max(struct((-col("gumbel_key")).as("ng"), col("doc_id").as("kd")))
        .as("th"))
    keyed.crossJoin(broadcast(kth))
      .select(col("doc_id"), col("n_grams"), col("w_micro"), col("gumbel_key"),
        // coalesce: with k = 0 (corpus < 4 docs) the threshold aggregate
        // is NULL and the comparison would propagate NULL where the
        // oracle's rank form yields false
        coalesce(
          struct((-col("gumbel_key")).as("ng"), col("doc_id").as("kd"))
            <= col("th"), lit(false)).as("selected"))
      .orderBy("doc_id")
  }

  /** TP16: PUBLISH CAPSTONE — the back half of the pipeline as ONE
    * composed, oracle-gated chain: decide (q_tp15 ensemble gate) → mix
    * (q_p16 epoch repetition over the SURVIVORS) → publish (per-shard
    * manifest over the instance multiset, sharded by md5(doc_id#copy) so
    * repeated instances spread across shards instead of clustering).
    * Pairs with q_tp12 (the crawl FRONT half) to close the loop:
    * raw crawl → clean → gate → mix → published shards, every stage
    * hash-gated. The manifest checksum commits to the exact instance
    * multiset the gate and mix produced — one wrong survivor or one
    * wrong repeat count and the hash moves. */
  def publishPipeline(s: SparkSession, d: String): DataFrame = {
    val kept = ensembleGate(s, d).filter(col("keep")).select("doc_id")
    val survivors = Tables.documents(s, d)
      .join(kept, Seq("doc_id"), "left_semi")
    val inst = epochInstances(s, survivors)
      .withColumn("ikey", concat_ws("#",
        col("doc_id").cast("string"), col("copy").cast("string")))
    inst
      .withColumn("shard",
        (conv(substring(md5(col("ikey")), 1, 8), 16, 10).cast("long") % 8).cast("int"))
      .groupBy("shard")
      .agg(
        countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_instances"),
        sum(conv(substring(md5(concat(lit("i|"), col("ikey"))), 1, 8), 16, 10)
          .cast("long")).as("checksum"))
      .orderBy("shard")
  }

  /** T26: FILTER FUNNEL — the per-stage rejection report every production
    * cleaning pipeline ships (how many docs each gate kills, in order):
    * length floor → repetition cap (integer cross-multiplied, the q_t8
    * signal) → language evidence → the tp1 quality gate. ONE corpus scan
    * computes every gate flag; the funnel is a 1-row aggregate exploded
    * into ordered stage rows — at any corpus size the report costs one
    * pass and ships 4 rows. */
  def filterFunnel(s: SparkSession, d: String): DataFrame = {
    val norm = TextFunctions.normText(col("text"))
    val toks = TextFunctions.tokens(norm)
    val nTok = size(toks)
    val nDist = size(array_distinct(toks))
    val g1 = nTok >= 20
    val g2 = (nTok - nDist) * 10 <= nTok * 3
    val g3 = array_contains(toks, "the")
    val g4 = TextFunctions.qualityScore(col("text")) >= 0.5
    val agg = Tables.documents(s, d)
      .select(g1.as("g1"), (g1 && g2).as("s2"), (g1 && g2 && g3).as("s3"),
        (g1 && g2 && g3 && g4).as("s4"))
      .agg(
        count(lit(1)).as("n0"),
        sum(col("g1").cast("long")).as("s1"),
        sum(col("s2").cast("long")).as("s2"),
        sum(col("s3").cast("long")).as("s3"),
        sum(col("s4").cast("long")).as("s4"))
    agg.selectExpr(
      """stack(4,
        |  '1_length',     n0, s1,
        |  '2_repetition', s1, s2,
        |  '3_language',   s2, s3,
        |  '4_quality',    s3, s4) AS (stage, docs_in, docs_out)""".stripMargin)
      .withColumn("dropped", col("docs_in") - col("docs_out"))
      .orderBy("stage")
  }

  /** G1: HOST-GRAPH PAGERANK ([[graft.operators.Graph.pageRank]]) — the
    * link-analysis quality prior of crawl curation (Common Crawl's host
    * ranks; per-domain weights in CCNet/RefinedWeb-style pipelines). The
    * corpus has no hyperlinks, so a deterministic host graph is
    * synthesized: each doc's own domain (the q_t23 synthesis) links to a
    * target domain keyed off hex32(md5(doc_id||"link")) in the same
    * namespace; edge weight = link count. Three integer-exact damped
    * rounds; the oracle unrolls the identical rounds as SQL CTEs (the
    * q_t18/q_dd10b round-replay discipline lifted to rank propagation). */
  /** A doc's own domain (the q_t23 synthesis). */
  private def docDomain: Column =
    concat(lit("www."), col("source"), lit("-"),
      (col("doc_id") % 3).cast("string"), lit(".example.com"))

  /** The synthesized host link graph shared by q_g1/q_g2. */
  private[graft] def hostGraphEdges(s: SparkSession, d: String): DataFrame = {
    val h = conv(substring(md5(concat(col("doc_id").cast("string"), lit("link"))), 1, 8), 16, 10)
      .cast("long")
    val dstDom = concat(lit("www.src"), (col("h") % 20).cast("string"), lit("-"),
      expr("(h DIV 20) % 3").cast("string"), lit(".example.com"))
    Tables.documents(s, d)
      .withColumn("h", h)
      .select(docDomain.as("src"), dstDom.as("dst"))
      .filter(col("src") =!= col("dst"))
      .groupBy("src", "dst").agg(count(lit(1)).as("w"))
  }

  def hostPageRank(s: SparkSession, d: String): DataFrame =
    graft.operators.Graph.pageRank(hostGraphEdges(s, d), "src", "dst", "w", rounds = 3)
      .withColumnRenamed("node", "domain")
      .orderBy("domain")

  /** The q_g1b graph: [[hostGraphEdges]] plus one external link per doc to
    * a `www.extN` host that never appears as a source — genuine sinks, the
    * shape of a real crawl graph (pages link out to hosts never fetched).
    * Namespaces are disjoint (srcX-Y vs extN), so the union stays one row
    * per (src, dst). */
  private def hostGraphEdgesWithSinks(s: SparkSession, d: String): DataFrame = {
    val h2 = conv(substring(md5(concat(col("doc_id").cast("string"), lit("extlink"))), 1, 8), 16, 10)
      .cast("long")
    val extDom = concat(lit("www.ext"), (col("h2") % 25).cast("string"),
      lit(".example.com"))
    hostGraphEdges(s, d).unionByName(
      Tables.documents(s, d)
        .withColumn("h2", h2)
        .select(docDomain.as("src"), extDom.as("dst"))
        .groupBy("src", "dst").agg(count(lit(1)).as("w")))
  }

  /** G1b: PAGERANK WITH DANGLING-MASS REDISTRIBUTION — the sink-aware
    * variant of q_g1 ([[graft.operators.Graph.pageRank]] with
    * `redistributeDangling = true`) over a sink-HEAVY graph (every doc
    * also links to an external host that is never crawled — ~30% of
    * nodes are pure sinks here). Each round measures the rank mass
    * sitting on sinks (one scalar aggregate over the sink anti-join set)
    * and shares it back uniformly before damping, so total mass no longer
    * evaporates through sinks — the variant real host-graph curation
    * wants, since crawl graphs are sink-heavy by construction. Same
    * integer arithmetic; the oracle unrolls the identical rounds with a
    * per-round dangling-mass scalar CTE. */
  def hostPageRankRedistributed(s: SparkSession, d: String): DataFrame =
    graft.operators.Graph.pageRank(hostGraphEdgesWithSinks(s, d), "src", "dst", "w",
      rounds = 3, redistributeDangling = true)
      .withColumnRenamed("node", "domain")
      .orderBy("domain")

  /** G4: HITS HUB/AUTHORITY SCORES ([[graft.operators.Graph.hits]]) over
    * the q_g1 host graph — the second classic link-analysis prior:
    * authority marks domains good hubs point at (a quality-source
    * signal), hub marks domains that point at good authorities (frontier
    * seeds). Two integer-exact L1-normalized rounds; the oracle unrolls
    * the identical authority/hub alternation as SQL CTEs with per-round
    * scalar-sum rescale CTEs. */
  def hostHits(s: SparkSession, d: String): DataFrame =
    graft.operators.Graph.hits(hostGraphEdges(s, d), "src", "dst", "w", rounds = 2)
      .withColumnRenamed("node", "domain")
      .orderBy("domain")

  /** G3: PAGERANK CONVERGENCE SERIES — the per-round L1 rank movement of
    * the q_g1 iteration ([[graft.operators.Graph.pageRankDeltas]]): the
    * telemetry that picks a round budget and detects a plateau without
    * materializing intermediate rank tables for inspection. Driver state:
    * one Long per round. */
  def pageRankConvergence(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    graft.operators.Graph
      .pageRankDeltas(hostGraphEdges(s, d), "src", "dst", "w", rounds = 3)
      .toDF("round", "l1_delta")
      .orderBy("round")
  }

  /** G2: RANK-GATED CURATION — the link-analysis prior APPLIED: every doc
    * joins its domain's PageRank (the 60-row rank table broadcasts — the
    * per-domain-prior join is always a broadcast at any corpus scale,
    * because the domain table is ~10⁷ rows when the doc table is 10¹¹)
    * and keeps iff its domain holds an above-uniform rank share
    * (rank·n > scale — integer cross-multiplication, no division). The
    * CCNet/RefinedWeb pattern of consuming Common Crawl host ranks as a
    * per-domain quality weight. */
  def rankGatedDocs(s: SparkSession, d: String): DataFrame = {
    val ranks = graft.operators.Graph
      .pageRank(hostGraphEdges(s, d), "src", "dst", "w", rounds = 3)
      .select(col("node").as("domain"), col("rank"))
    val n = ranks.count()
    Tables.documents(s, d)
      .select(col("doc_id"), docDomain.as("domain"))
      .join(broadcast(ranks), Seq("domain"))
      .select(col("doc_id"), col("domain"), col("rank"),
        (col("rank") * n > 1000000000000L).as("keep"))
      .orderBy("doc_id")
  }

  /** T8: repetition signals (the Gopher-style quality filters): duplicate-
    * token fraction and duplicate-char-5-gram fraction, plus the gate flag.
    * High repetition marks boilerplate/generated text — the standard
    * pre-training removal signal, computed in one scan as pure
    * expressions. */
  def textRepetition(s: SparkSession, d: String): DataFrame = {
    val norm = TextFunctions.normText(col("text"))
    val toks = TextFunctions.tokens(norm)
    val nTok = size(toks)
    val dupTok = when(nTok > 0,
      lit(1.0) - size(array_distinct(toks)).cast("double") / nTok.cast("double"))
      .otherwise(lit(0.0))
    val total5 = greatest(length(norm) - 4, lit(0))
    val dup5 = when(total5 > 0,
      lit(1.0) - TextFunctions.charShingleCount(norm, 5).cast("double") / total5.cast("double"))
      .otherwise(lit(0.0))
    Tables.documents(s, d)
      .select(
        col("doc_id"),
        dupTok.as("dup_token_ratio"),
        dup5.as("dup_char5_ratio"),
        (dupTok > 0.3).as("is_repetitive"))
      .orderBy("doc_id")
  }

  /** P10: data-driven training-mix sampler — per-source sampling rates come
    * from a broadcast config TABLE (not hard-coded predicates), applied as
    * the same md5-prefix threshold as q_p9, so the mix is reproducible on
    * any cluster and re-weightable without code changes. Output = realized
    * per-source sample counts. */
  def mixSample(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val rates = ((0 to 4).map(i => (s"src$i", "cc")) ++
      (5 to 9).map(i => (s"src$i", "80")) ++
      (10 to 19).map(i => (s"src$i", "1a")))
      .toDF("source", "threshold")
    Tables.documents(s, d)
      .join(broadcast(rates), Seq("source"))
      .filter(substring(md5(col("doc_id").cast("string")), 1, 2) < col("threshold"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_sampled"))
      .orderBy("source")
  }

  /** Custom codegen'd fingerprints (rolling hash + simhash) — no SQL oracle
    * (engine-specific hash functions); rows-only check. */
  def textFingerprints(s: SparkSession, d: String): DataFrame = {
    val norm = TextFunctions.normText(col("text"))
    Tables.documents(s, d)
      .select(
        col("doc_id"),
        GraftFunctions.rollingHash(s, norm).as("rolling_hash"),
        GraftFunctions.simHash(s, TextFunctions.tokens(norm)).as("simhash"))
      .orderBy("doc_id")
  }

  // ---- dedup (training-data pipeline) --------------------------------------

  /** Exact dedup groups keyed by content fingerprint. */
  def dedupFingerprint(s: SparkSession, d: String): DataFrame =
    Dedup.exactGroups(Tables.documents(s, d), "text", "doc_id").orderBy("keep_id")

  /** Top-50 most similar doc pairs by word-3-shingle Jaccard over the
    * frequency-capped shingle inverted index (default cap — the 100 TB skew
    * guard stays ON; scores are the self-consistent pruned-universe Jaccard,
    * see Dedup.jaccardPairs). The cap is a deterministic filter mirrored
    * verbatim in the DuckDB oracle, so the query stays hash-exact with
    * pruning enabled. */
  def jaccardTop(s: SparkSession, d: String): DataFrame =
    Dedup.jaccardPairs(Tables.documents(s, d), "doc_id", "text", 3)
      .orderBy(col("jaccard").desc, col("id1"), col("id2"))
      .limit(50)

  /** Same query with an aggressively low cap (5) that actually prunes at
    * test scale (max shingle df is 7 at sf0.01 / 25 at sf0.1), so the capped
    * candidate path itself — not just the cap-inactive plan — is
    * oracle-verified end to end. */
  def jaccardTopCapped(s: SparkSession, d: String): DataFrame =
    Dedup.jaccardPairs(Tables.documents(s, d), "doc_id", "text", 3, maxShingleDf = 5)
      .orderBy(col("jaccard").desc, col("id1"), col("id2"))
      .limit(50)

  /** DD7: exact edit-distance verification of the sketch candidates — the
    * second tier of the standard fuzzy-dedup pipeline (cheap sketch
    * candidates → exact verify on the tiny survivor set). Candidates are
    * the q_dd1 top pairs; each gets the classic Levenshtein distance plus a
    * length-normalized ratio. At scale the candidate set is bounded by the
    * capped inverted index, so the verify tier joins a small frame back to
    * the corpus by id (broadcast) and runs O(len²) DP on pairs only — never
    * on the corpus cross product. */
  def editDistanceVerify(s: SparkSession, d: String): DataFrame = {
    val pairs = jaccardTop(s, d)
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), TextFunctions.normText(col("text")).as("norm"))
    val dist = levenshtein(col("norm1"), col("norm2"))
    pairs
      .join(docs.select(col("doc_id").as("id1"), col("norm").as("norm1")), Seq("id1"))
      .join(docs.select(col("doc_id").as("id2"), col("norm").as("norm2")), Seq("id2"))
      .select(col("id1"), col("id2"), col("jaccard"),
        dist.as("edit_dist"),
        (dist.cast("double")
          / greatest(length(col("norm1")), length(col("norm2"))).cast("double"))
          .as("edit_ratio"))
      .orderBy("id1", "id2")
  }

  /** DD11: THE PRODUCTION FUZZY-DEDUP PAIRING — banded MinHash candidate
    * generation ([[Dedup.portableMinhashCandidates]]: the tier that scales,
    * linear shingle-hash mass + bucket-capped band self-join, never
    * all-pairs) feeding the EXACT verify tier (full-set Jaccard + classic
    * Levenshtein + length-normalized ratio) — the composition a real
    * pipeline runs, where q_dd7 verified behind the q_dd1 Jaccard index
    * instead. The md5-based signature replays bit-exactly in SQL, so the
    * oracle mirrors BOTH tiers (not just a threshold-1.0 degenerate
    * construction): whatever candidate set the banding yields, the oracle
    * yields the identical set. Near-clones of the first 60 docs (planted
    * under ids +3000000 with a 5-word suffix) guarantee the verify tier
    * sees nonzero edit distances with high-but-sub-1.0 Jaccard. */
  /** The q_dd11/q_dd12 input universe: the corpus plus suffix-perturbed
    * near-clones of the first 60 docs under ids +3000000. */
  private def fuzzyDocs(s: SparkSession, d: String): DataFrame = {
    val base = Tables.documents(s, d).select("doc_id", "text")
    base.unionByName(base.filter(col("doc_id") < 60)
      .select((col("doc_id") + 3000000L).as("doc_id"),
        concat(col("text"), lit(" qq zz qq zz qq")).as("text")))
  }

  def fuzzyDedupPipeline(s: SparkSession, d: String): DataFrame = {
    val docs = fuzzyDocs(s, d)
    // shingle + normalize ONCE; both tiers read the checkpointed frame
    val prepped = docs
      .withColumn("norm", TextFunctions.normText(col("text")))
      .withColumn("shingles",
        TextFunctions.wordShingles(TextFunctions.tokens(col("norm")), 3))
      .select("doc_id", "norm", "shingles")
      .truncateLineage()
    val cands = Dedup.portableMinhashCandidatesShingled(
      prepped.select(col("doc_id").as("doc"), col("shingles")),
      numHashes = 16, bands = 4, maxBucket = 100)
    val sets = prepped.select(col("doc_id"), col("shingles"))
    val norms = prepped.select(col("doc_id"), col("norm"))
    val dist = levenshtein(col("norm1"), col("norm2"))
    val jac = col("n_common").cast("double") / col("n_union").cast("double")
    val ratio = dist.cast("double") /
      greatest(length(col("norm1")), length(col("norm2"))).cast("double")
    cands
      .join(sets.select(col("doc_id").as("id1"), col("shingles").as("sh1")), "id1")
      .join(sets.select(col("doc_id").as("id2"), col("shingles").as("sh2")), "id2")
      .join(norms.select(col("doc_id").as("id1"), col("norm").as("norm1")), "id1")
      .join(norms.select(col("doc_id").as("id2"), col("norm").as("norm2")), "id2")
      .withColumn("n_common", size(array_intersect(col("sh1"), col("sh2"))).cast("long"))
      .withColumn("n_union", size(array_union(col("sh1"), col("sh2"))).cast("long"))
      .select(col("id1"), col("id2"), col("n_common"), col("n_union"),
        jac.as("jaccard"),
        dist.as("edit_dist"),
        ratio.as("edit_ratio"),
        (jac >= 0.5 && ratio <= 0.2).as("is_dup"))
      .orderBy("id1", "id2")
  }

  /** DD12: FUZZY-DEDUP CAPSTONE — the complete production chain as ONE
    * oracle-gated query: banded portable-MinHash candidates → exact
    * Jaccard + edit-distance verify (q_dd11's two tiers) → verified dup
    * pairs resolved to clusters by min-label-propagation connected
    * components ([[Dedup.dupClusters]], the q_dd6 iterative operator) →
    * the per-doc KEEP LIST (keeper = minimum id reachable through
    * verified-dup edges; singletons keep themselves). The oracle replays
    * the candidate+verify chain and closes the pair graph with a
    * recursive CTE — the engine's iterative CC and the oracle's
    * transitive closure must land on identical labels. Cluster sizes come
    * from a map-side-combined groupBy joined back (no window over the
    * keeper key — dup families are exactly the keys that go hot). */
  def fuzzyDedupClusters(s: SparkSession, d: String): DataFrame = {
    val pairs = fuzzyDedupPipeline(s, d)
      .filter(col("is_dup")).select("id1", "id2")
    val labels = Dedup.dupClusters(pairs)
    val kl = fuzzyDocs(s, d).select(col("doc_id"))
      .join(labels.select(col("id").as("doc_id"), col("label")),
        Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("label"), col("doc_id")).as("keeper"))
    val sizes = kl.groupBy("keeper").agg(count(lit(1)).as("cluster_size"))
    kl.join(sizes, Seq("keeper"))
      .select(col("doc_id"), col("keeper"),
        (col("doc_id") === col("keeper")).as("keep"), col("cluster_size"))
      .orderBy("doc_id")
  }

  /** DD13: LSH RECALL/PRECISION EVALUATION — the measurement every
    * banded-sketch deployment owes its operators: ground truth = the
    * pairs with exact Jaccard ≥ 0.5 over the DF-CAPPED shingle universe
    * (the integer cross-multiplied form 3·n_common ≥ n1 + n2, computed
    * over a document-frequency-capped inverted index — never all-pairs),
    * candidates = the portable MinHash banding (q_dd11's generator), and
    * one metrics row: truth/candidate/hit counts plus recall and
    * precision as IEEE divisions of exact integers.
    *
    * The df cap (the [[Dedup.jaccardPairs]] guard, same default 1000) is
    * what makes a recall BASELINE computable at scale: an uncapped
    * shingle self-join expands a shingle shared by m docs into m² pairs —
    * a stopword 3-gram with df in the millions is quadratic death on
    * natural text. Dropping shingles hotter than the cap before the pair
    * expansion bounds every posting list at df≤cap, so index work is
    * O(Σ df²) with df capped — linear-ish in corpus size. The truth set
    * is then "Jaccard of the informative (sub-cap) shingles ≥ 0.5":
    * dropped shingles vanish from numerator and denominator alike, so the
    * score is self-consistent, and since hot shingles are precisely the
    * ones carrying no pair-discriminating signal, the capped truth set is
    * the meaningful recall denominator (at web scale, the only computable
    * one). At this fixture's scale no shingle reaches the cap, so the
    * capped truth set ≡ the full-set truth set and the measured
    * 96.7%/100% quality is unchanged. Both sides replay in SQL, so the
    * sketch's QUALITY — not just its candidate set — is oracle-gated;
    * tune bands/hashes and this row moves hash-exactly in both engines. */
  def lshRecallEval(s: SparkSession, d: String): DataFrame = {
    val maxShingleDf = 1000
    val prepped = fuzzyDocs(s, d)
      .withColumn("shingles",
        TextFunctions.wordShingles(
          TextFunctions.tokens(TextFunctions.normText(col("text"))), 3))
      .select("doc_id", "shingles")
      .truncateLineage()
    val cand = Dedup.portableMinhashCandidatesShingled(
      prepped.select(col("doc_id").as("doc"), col("shingles")),
      numHashes = 16, bands = 4, maxBucket = 100)
      .truncateLineage()
    val shAll = prepped.select(col("doc_id").as("doc"), explode(col("shingles")).as("shingle"))
    val hot = shAll.groupBy("shingle").count()
      .filter(col("count") > maxShingleDf).select("shingle")
    val sh = shAll.join(hot, Seq("shingle"), "left_anti").truncateLineage()
    val cnt = sh.groupBy("doc").agg(count(lit(1)).as("nsh"))
    val base = sh.select("doc", "shingle")
    val ip = base.toDF("id1", "shingle")
      .join(base.toDF("id2", "shingle_r"),
        col("shingle") === col("shingle_r") && col("id1") < col("id2"))
      .groupBy("id1", "id2").agg(count(lit(1)).as("nc"))
    val truth = ip
      .join(cnt.toDF("id1", "n1"), "id1")
      .join(cnt.toDF("id2", "n2"), "id2")
      .filter(col("nc") * 3 >= col("n1") + col("n2"))
      .select("id1", "id2")
      .truncateLineage()
    val hits = truth.join(cand, Seq("id1", "id2"), "left_semi")
    val agg = truth.agg(count(lit(1)).as("n_truth"))
      .crossJoin(cand.agg(count(lit(1)).as("n_candidates")))
      .crossJoin(hits.agg(count(lit(1)).as("n_hits")))
    agg.select(
      col("n_truth"), col("n_candidates"), col("n_hits"),
      (col("n_hits").cast("double") / col("n_truth").cast("double")).as("recall"),
      (col("n_hits").cast("double") / col("n_candidates").cast("double")).as("precision"))
  }

  /** MinHash+LSH near-dup pairs (murmur3 signatures — rows-only check). */
  def minhashPairs(s: SparkSession, d: String): DataFrame =
    Dedup.minhashNearDups(Tables.documents(s, d), "doc_id", "text",
      k = 3, numHashes = 16, bands = 4, maxBucket = 200, threshold = 0.3)
      .orderBy("id1", "id2")

  /** MinHash-LSH recall oracle (the q_dd4 construction for text): clones of
    * the first 50 docs injected under shifted ids, threshold = 1.0. At that
    * threshold the result is EXACTLY the identical-shingle-set pairs —
    * identical sets ⇒ identical minhash signatures ⇒ same band buckets ⇒
    * guaranteed candidates, and the exact-Jaccard scoring keeps only
    * jaccard = 1 — so the LSH path is SQL-mirrorable without porting any
    * hash function. */
  def minhashRecall(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select("doc_id", "text")
    val clones = docs.filter(col("doc_id") < 50)
      .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
    Dedup.minhashNearDups(docs.unionByName(clones), "doc_id", "text",
      k = 3, numHashes = 16, bands = 4, maxBucket = 200, threshold = 1.0)
      .orderBy("id1", "id2")
  }

  /** SimHash near-dup pairs within Hamming 7 — banded on 8 disjoint 8-bit
    * blocks, which pigeonholes one block equal for every within-radius
    * pair (rows-only check). The band-bucket cap is passed EXPLICITLY
    * (the operator default is uncapped/exact): at gate scales the mass
    * probe stays under its linear budget and the plan is the exact band
    * join; from the 10x staging up the probe engages and recall is
    * BOUNDED, not exact — the shed fringe (measured 1.1%/2.5% at 10x/
    * 100x, all at hamming 5-7; full measurement in PERF.md round 10) is
    * surfaced by [[Dedup.simhashNearDupsWithTelemetry]]. */
  def simhashPairs(s: SparkSession, d: String): DataFrame =
    Dedup.simhashNearDups(s, Tables.documents(s, d), "doc_id", "text",
        maxHamming = 7, maxBandBucket = 1000)
      .orderBy("id1", "id2")

  /** Cross-batch incremental dedup ([[Dedup.incrementalDedup]]): the even
    * docs are the already-ingested history (present only as a signature
    * store — no text), the odd docs plus two planted clone families are the
    * arriving batch: clones of store docs under ids +1000000 (must come back
    * `dup_of_store` matching the original) and clones of batch docs under
    * +2000000 (must come back `dup_in_batch` matching the kept original).
    * Threshold 1.0 makes signature matching exact set-equality, so the
    * whole classification is SQL-mirrorable via the q_dd2b sorted-shingle-
    * list construction — a real oracle over both tiers, including natural
    * odd/even duplicate collisions in the fixture. */
  def incrementalDedupBatch(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select("doc_id", "text")
    val store = docs.filter(col("doc_id") % 2 === 0)
    val batch = docs.filter(col("doc_id") % 2 === 1)
      .unionByName(docs.filter(col("doc_id") % 2 === 0 && col("doc_id") < 50)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
      .unionByName(docs.filter(col("doc_id") % 2 === 1 && col("doc_id") < 50)
        .select((col("doc_id") + 2000000L).as("doc_id"), col("text")))
    Dedup.incrementalDedup(
      Dedup.signatureStore(store, "doc_id", "text"),
      Dedup.signatureStore(batch, "doc_id", "text"))
      .orderBy("doc_id")
  }

  /** SimHash recall oracle (the clone-injection construction): clones of the
    * first 50 docs are planted under ids +1000000; identical text ⇒ identical
    * 64-bit sketch ⇒ Hamming 0, and hamming-0 pairs are NEVER shed — even
    * under the explicit band-bucket cap, identical sketches collapse to one
    * group row before banding and pair in the within-group tier — so each
    * planted pair MUST appear at every scale. Restricting output to the
    * planted id range makes the result SQL-expressible without porting the
    * hash: ids ≥ 1000000 exist only as clones, so (d, d+1000000) pairs are
    * exactly the planted set. */
  def simhashRecall(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select("doc_id", "text")
    val clones = docs.filter(col("doc_id") < 50)
      .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
    Dedup.simhashNearDups(s, docs.unionByName(clones), "doc_id", "text",
        maxHamming = 7, maxBandBucket = 1000)
      .filter(col("id2") === col("id1") + 1000000L && col("id1") < 50)
      .select("id1", "id2", "hamming")
      .orderBy("id1")
  }

  /** DD3c: SIMHASH SHED TELEMETRY UNDER A FORCED CAP — the band-bucket
    * cap's APPROXIMATION CONTRACT itself under the hash gate (VERDICT r13
    * #5), the way q_r2 put the IVF cell prune under it. A deliberately
    * small cap (8) forces the mass probe to engage at every gate scale
    * (measured Σ bucket² = 24.6× the linear budget at sf0.01 — the
    * 40-word vocabulary concentrates block values, and the ratio only
    * grows with n), so the run exercises ALL THREE tiers: under-cap cold
    * band join, hot-bucket sub-band refinement, and over-cap sub-bucket
    * shedding. The output commits to the probe's both sides (Σ c² vs
    * cap·rows), the engaged-bucket and shed-sub-bucket counts, the shed
    * candidate mass, AND an order-independent checksum of the surviving
    * pair set — one mis-shed or mis-kept bucket anywhere and either a
    * telemetry count or the pair checksum moves. The DuckDB mirror
    * replays the ENTIRE pipeline from raw text: FNV-1a token hashes
    * (exact 64-bit wrap via HUGEINT mod 2^64), bit votes, sketch
    * assembly, 8×8-bit banding, the probe arithmetic, the remaining-bit
    * sub-band split, and both join tiers — so the hash function, the
    * sketch, and the shed rule are all pinned bit-for-bit, not just the
    * planted-clone recall (q_dd3b). */
  def simhashTelemetry(s: SparkSession, d: String): DataFrame = {
    val (pairs, tel) = Dedup.simhashNearDupsWithTelemetry(
      s, Tables.documents(s, d), "doc_id", "text",
      maxHamming = 7, maxBandBucket = 8)
    pairs
      .agg(
        count(lit(1)).as("n_pairs"),
        coalesce(sum(conv(substring(md5(concat_ws("#",
          col("id1").cast("string"), col("id2").cast("string"),
          col("hamming").cast("string"))), 1, 8), 16, 10).cast("long")), lit(0L))
          .as("pair_checksum"))
      .select(
        lit(if (tel.engaged) 1 else 0).as("engaged"),
        lit(tel.bandMass).as("band_mass"),
        lit(tel.linearBudget).as("linear_budget"),
        lit(tel.hotBuckets).as("hot_buckets"),
        lit(tel.shedSubBuckets).as("shed_sub_buckets"),
        lit(tel.shedSubMass).as("shed_sub_mass"),
        col("n_pairs"), col("pair_checksum"))
  }

  /** Embedding-cosine near-dup pairs via hyperplane LSH (rows-only check). */
  /** Embedding near-dup detection against injected ground truth. The
    * synthetic corpus has NO natural near-dups (max pairwise cosine ≈ 0.51
    * at sf0.01 / 0.60 at sf0.1), so the operator alone would emit zero rows
    * at any sane threshold; instead the first 50 vectors are cloned under
    * shifted ids and the LSH must recover exactly those pairs — identical
    * vectors hash to identical signatures (guaranteed candidate) and cosine
    * ≈ 1 clears the threshold, while every natural pair is far below it.
    * That makes the result SQL-mirrorable: the expected pairs are just
    * (vec_id, vec_id + 1000000) for vec_id < 50 — a real oracle for an LSH
    * query (recall proof), not a rows-only smoke check. */
  def embedNearDup(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d).select("vec_id", "embedding")
    val clones = emb.filter(col("vec_id") < 50)
      .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding"))
    Dedup.embeddingNearDups(s, emb.unionByName(clones), "vec_id", "embedding",
      threshold = 0.9)
      .select("id1", "id2") // cosine ≈ 1 ± ulp is engine-internal → dropped
      .orderBy("id1", "id2")
  }

  /** DD10: SEMANTIC DEDUP (SemDeDup) — cluster embeddings around the 8
    * lowest-id seed vectors, then drop any vector whose cluster holds a
    * lower-id vector at cosine ≥ 0.9. Clones of the first 40 vectors are
    * injected under shifted ids (the q_dd4 construction): a clone lands in
    * its original's cluster (identical vector ⇒ identical argmax) at cosine
    * ≈ 1, so exactly the clones must come back `dropped` — while the
    * assignment of every NATURAL vector is also oracle-checked, because the
    * floor-quantized cosine makes the argmax bit-reproducible in SQL. */
  def semanticDedup(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d).select("vec_id", "embedding")
    val clones = emb.filter(col("vec_id") < 40)
      .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding"))
    Dedup.semanticDedup(emb.unionByName(clones), "vec_id", "embedding",
        numSeeds = 8, threshold = 0.9)
      .withColumnRenamed("id", "vec_id")
      .orderBy("vec_id")
  }

  /** DD10b: SEMANTIC DEDUP WITH A REAL K-MEANS TIER — the SemDeDup paper's
    * actual quantizer: lowest-id seed init, then bounded Lloyd rounds
    * (assign → floor-quantized per-dimension mean → assign) before the
    * within-cluster prune. Every Lloyd step is bit-reproducible — the
    * assignment argmax uses the quantized cosine, the centroid update the
    * Exact.floorAvg mean with a float round-trip at the kernel boundary —
    * so the oracle replays BOTH rounds in SQL (the q_t18 replay discipline
    * lifted from merge rules to centroid fits) and gates assignments AND
    * the dropped set. */
  def semanticDedupKmeans(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d).select("vec_id", "embedding")
    val clones = emb.filter(col("vec_id") < 40)
      .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding"))
    Dedup.semanticDedupKmeans(emb.unionByName(clones), "vec_id", "embedding",
        numSeeds = 8, assignRounds = 2, threshold = 0.9)
      .withColumnRenamed("id", "vec_id")
      .orderBy("vec_id")
  }

  /** Exact all-pairs embedding similarity, top-100 most similar pairs
    * (bit-reproducible fused cosine — oracle-checked). The all-pairs
    * GROUND-TRUTH tier is input-bounded ([[Dedup.embeddingPairsExact]]
    * truthCap=2048, mirrored in the oracle's base CTE): never binds at
    * the gates (≤2000 vectors), caps pair mass at ~2M at any staged
    * scale — the q_dd13 discipline applied to the last all-pairs plan. */
  def embedPairsTop(s: SparkSession, d: String): DataFrame =
    Dedup.embeddingPairsExact(s, Tables.embeddings(s, d), "vec_id", "embedding")
      .orderBy(col("cosine").desc, col("id1"), col("id2"))
      .limit(100)

  /** Composed cleaning pipeline: quality gate → exact dedup → near-dup
    * removal (full SQL oracle). */
  def cleanCorpus(s: SparkSession, d: String): DataFrame =
    graft.pipeline.CorpusCleaner.clean(s, Tables.documents(s, d))

  /** TP4: PASSAGE-level dedup (the Lee-et-al-style "repeated substring"
    * cleanup at chunk granularity): the corpus is exploded into fixed
    * 16-token chunks, each distinct chunk keeps only its FIRST occurrence
    * (global (doc_id, position) order), and documents are reassembled from
    * their surviving chunks — injected clone docs (ids 3000000+) lose every
    * chunk to the originals and vanish. Scale shape: skinny (chunk, doc,
    * pos) rows; the first-occurrence resolution is one hash aggregate on
    * the chunk key (min-struct, map-side combinable) + one equi-join; the
    * reassembly is a per-doc sort_array — no window over the corpus, no
    * arrays across the dedup shuffle except the ≤16-token chunk text
    * itself. The oracle mirrors chunking, first-occurrence, and reassembly
    * in SQL, so drop/keep/reorder bugs all hash-mismatch. */
  def passageDedup(s: SparkSession, d: String): DataFrame = {
    val w = 16
    val docs = Tables.documents(s, d).select("doc_id", "text")
    val clones = docs.filter(col("doc_id") < 20)
      .select((col("doc_id") + 3000000L).as("doc_id"), col("text"))
    val toks = TextFunctions.tokens(TextFunctions.normText(col("text")))
    val nChunks = floor((size(toks) + lit(w - 1)) / lit(w.toDouble)).cast("int")
    val chunked = docs.unionByName(clones)
      .select(
        col("doc_id"),
        when(size(toks) > 0,
          transform(sequence(lit(0), nChunks - 1),
            i => array_join(slice(toks, i * w + 1, lit(w)), " ")))
          .otherwise(array().cast("array<string>")).as("chunks"))
      .select(col("doc_id"), posexplode(col("chunks")))
      .withColumnsRenamed(Map("pos" -> "idx", "col" -> "chunk"))
    val first = chunked.groupBy("chunk")
      .agg(min(struct(col("doc_id"), col("idx"))).as("first"))
    val kept = chunked.join(first, "chunk")
      .where(struct(col("doc_id"), col("idx")) === col("first"))
    kept.groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_kept"),
        array_join(
          transform(
            array_sort(collect_list(struct(col("idx"), col("chunk")))),
            c => c.getField("chunk")),
          " ").as("clean_text"))
      .orderBy("doc_id")
  }

  /** TP6: CONTENT-DEFINED passage dedup — chunk boundaries come from the
    * CONTENT (a boundary closes after any token whose 3-token shingle
    * hashes ≡ 0 mod 16 → ~16-token expected chunks), so an inserted prefix
    * only perturbs chunks until the first surviving boundary and the
    * chunking RE-SYNCHRONIZES — the property fixed-width chunking (q_tp4)
    * lacks: clones with 2 junk tokens prepended shift every fixed chunk
    * but lose all their post-sync CDC chunks to the originals. The
    * boundary hash is hex16(md5(shingle)) — engine-identical, so the whole
    * variable-length chunking, first-occurrence resolution, and reassembly
    * are oracle-exact (no recall-only hedge). Scale shape: windows are
    * PER-DOC (bounded partitions), the first-occurrence resolve is one
    * hash aggregate on chunk content + an equi-join, same as q_tp4. */
  def cdcPassageDedup(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(s, d).select("doc_id", "text")
    val clones = docs.filter(col("doc_id") < 20)
      .select((col("doc_id") + 3000000L).as("doc_id"),
        concat(lit("xshift yshift "), col("text")).as("text"))
    val toks = TextFunctions.tokens(TextFunctions.normText(col("text")))
    val tokRows = docs.unionByName(clones)
      .select(col("doc_id"), posexplode(toks))
      .withColumnsRenamed(Map("pos" -> "p", "col" -> "tok"))
    val w = Window.partitionBy("doc_id").orderBy("p")
    val sh = concat_ws(" ",
      lag(col("tok"), 2).over(w), lag(col("tok"), 1).over(w), col("tok"))
    val marker = when(col("p") >= 2 &&
      conv(substring(md5(sh), 1, 4), 16, 10).cast("long") % 16 === 0, 1).otherwise(0)
    val chunked = tokRows
      .withColumn("marker", marker)
      .withColumn("chunk_idx", coalesce(
        sum(col("marker")).over(w.rowsBetween(Window.unboundedPreceding, -1)),
        lit(0)).cast("long"))
    val chunks = chunked.groupBy("doc_id", "chunk_idx")
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("p"), col("tok")))),
          c => c.getField("tok")), " ").as("chunk"))
    val first = chunks.groupBy("chunk")
      .agg(min(struct(col("doc_id"), col("chunk_idx"))).as("first"))
    chunks.join(first, "chunk")
      .where(struct(col("doc_id"), col("chunk_idx")) === col("first"))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_kept"),
        array_join(
          transform(array_sort(collect_list(struct(col("chunk_idx"), col("chunk")))),
            c => c.getField("chunk")), " ").as("clean_text"))
      .orderBy("doc_id")
  }

  /** TP9: EXACT DUPLICATED-SPAN detection — the Lee-et-al "deduplicating
    * training data" primitive at its native granularity: every MAXIMAL token
    * span of length ≥ L that occurs at more than one (doc, position) in the
    * corpus, reported as per-doc (span_start, span_end) intervals. Unlike
    * q_tp4/q_tp6 (which chunk first, then dedup chunks), this finds the
    * true repeated-substring boundaries: every length-L sliding shingle is
    * hashed map-side from the token array (no window — one projection), a
    * shingle is "duplicated" iff its hash occurs at > 1 positions globally,
    * and per-doc runs of duplicated starts merge into maximal spans via the
    * gaps-and-islands rule (starts p1 < p2 merge iff p2 ≤ p1 + L, i.e. the
    * covered intervals [p, p+L-1] overlap or adjoin). Injected clone docs
    * carrying a 30-token interior slice of an original light up as one
    * exact span on both sides. Scale shape: the only corpus-wide exchange
    * is the skinny (hash, doc, pos) aggregate + semi-join back (same
    * profile as q_tp4's first-occurrence resolve); the island window is
    * per-doc over only the duplicated positions. The md5 shingle hash makes
    * the whole span geometry oracle-exact — no recall hedge. */
  /** The planted interior-slice clones shared by q_tp9 and q_tp10 (and
    * hard-coded identically in both oracles): a 30-token slice (tokens
    * 11..40) of long-enough originals under id+4000000 — a guaranteed
    * cross-doc duplicated span, interior so the island merge has real
    * boundaries to find. ONE definition keeps the two span queries and
    * their SQL mirrors in lockstep. */
  private def spanCloneFrame(docs: DataFrame): DataFrame = {
    val srcToks = TextFunctions.tokens(TextFunctions.normText(col("text")))
    docs
      .filter(col("doc_id") < 60 && size(srcToks) >= 40)
      .select((col("doc_id") + 4000000L).as("doc_id"),
        array_join(slice(srcToks, 11, 30), " ").as("text"))
  }

  def spanDedup(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val L = 8
    val docs = Tables.documents(s, d).select("doc_id", "text")
    val clones = spanCloneFrame(docs)
    val toks = TextFunctions.tokens(TextFunctions.normText(col("text")))
    val starts = docs.unionByName(clones)
      .select(col("doc_id"),
        graft.functions.GraftFunctions.shingleHashes(toks, L).as("hs"))
      .select(col("doc_id"), posexplode(col("hs")))
      .select(col("doc_id"), (col("pos") + 1).as("p"), col("col").as("h"))
    val dupHashes = starts.groupBy("h").agg(count(lit(1)).as("n")).filter(col("n") > 1)
    val dupStarts = starts.join(dupHashes.select("h"), Seq("h"), "left_semi")
    val w = Window.partitionBy("doc_id").orderBy("p")
    val spans = dupStarts
      .withColumn("brk",
        when(col("p") > coalesce(lag(col("p"), 1).over(w), lit(Int.MinValue)) + L, 1)
          .otherwise(0))
      .withColumn("span_id", sum(col("brk")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("doc_id", "span_id")
      .agg(min(col("p")).as("span_start"),
        (max(col("p")) + lit(L - 1)).as("span_end"))
    spans
      .select(col("doc_id"), col("span_start").cast("int").as("span_start"),
        col("span_end").cast("int").as("span_end"),
        (col("span_end") - col("span_start") + 1).cast("int").as("dup_tokens"))
      .orderBy("doc_id", "span_start")
  }

  /** TP10: DUPLICATED-SPAN SCRUBBING — the removal stage that completes
    * q_tp9's detection (what Lee et al. actually ship): later occurrences
    * of duplicated text are cut out while the globally-first copy survives.
    * Policy, exact and order-free: a shingle occurrence is `scrub` iff its
    * hash occurs elsewhere AND it is not the (doc_id, p)-minimal
    * occurrence; a TOKEN is dropped iff it is covered by ≥1 scrub window
    * and by NO novel window (unique or first-occurrence) — i.e. it
    * survives iff some L-window containing it is novel. Coverage is
    * computed with a difference array (+1 at p, −1 at p+L) cumulated by
    * one per-doc window — two running sums share one shuffle+sort — so
    * there is no token×span range join. The injected clones (pure copied
    * slices) lose every token; their originals keep every token. Scale
    * shape: the only corpus-wide exchange is the (hash → first, count)
    * aggregate joined back (q_tp9's profile); everything after is per-doc.
    * md5 shingle hashes make the scrub geometry oracle-exact. */
  def spanScrub(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select("doc_id", "text")
    spanScrubCore(docs.unionByName(spanCloneFrame(docs)))
  }

  /** The q_tp10 scrub over any (doc_id, text) frame — also the stage-0 of
    * the q_tp11 composition. */
  private def spanScrubCore(base: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val L = 8
    val toks = TextFunctions.tokens(TextFunctions.normText(col("text")))
    val tokRows = base.select(col("doc_id"), posexplode(toks))
      .select(col("doc_id"), (col("pos") + 1).as("t"), col("col").as("tok"))
    val starts = base
      .select(col("doc_id"),
        posexplode(graft.functions.GraftFunctions.shingleHashes(toks, L)))
      .select(col("doc_id"), (col("pos") + 1).as("p"), col("col").as("h"))
    // Both `firsts` (one row per distinct shingle hash) and `deltas` (the
    // span boundary events) SCALE WITH THE CORPUS — they must never become
    // a broadcast side. AQE's runtime conversion sizes by compressed
    // shuffle bytes and happily broadcast a 10x `deltas` whose deserialized
    // hash relation then OOMed 8-16 GiB executors (measured,
    // local-cluster[2,16,*] at /tmp/sf10full); at 100 TB any broadcast of
    // a corpus-scaled side is guaranteed death. The merge hints survive
    // AQE replanning and pin both joins to sort-merge.
    val firsts = starts.groupBy("h").agg(
      count(lit(1)).as("n"), min(struct(col("doc_id"), col("p"))).as("first"))
    val flagged = starts.join(firsts.hint("merge"), "h")
      .withColumn("scrub",
        col("n") > 1 && struct(col("doc_id"), col("p")) =!= col("first"))
    val deltas = flagged.select(col("doc_id"), col("p").as("t"),
        when(col("scrub"), 1).otherwise(0).as("ds"),
        when(col("scrub"), 0).otherwise(1).as("dn"))
      .unionByName(flagged.select(col("doc_id"), (col("p") + L).as("t"),
        when(col("scrub"), -1).otherwise(0).as("ds"),
        when(col("scrub"), 0).otherwise(-1).as("dn")))
      .groupBy("doc_id", "t").agg(sum("ds").as("ds"), sum("dn").as("dn"))
    val w = Window.partitionBy("doc_id").orderBy("t")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val covered = tokRows.join(deltas.hint("merge"), Seq("doc_id", "t"), "left")
      .select(col("doc_id"), col("t"), col("tok"),
        coalesce(col("ds"), lit(0)).as("ds"), coalesce(col("dn"), lit(0)).as("dn"))
      .withColumn("cs", sum(col("ds")).over(w))
      .withColumn("cn", sum(col("dn")).over(w))
      .withColumn("dropped", col("cs") > 0 && col("cn") === 0)
    covered.groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(when(col("dropped"), 1L).otherwise(0L)).as("n_dropped"),
        array_join(
          transform(
            array_sort(collect_list(
              when(!col("dropped"), struct(col("t"), col("tok"))))),
            c => c.getField("tok")),
          " ").as("clean_text"))
      .orderBy("doc_id")
  }

  /** TP13: BENCHMARK SPAN DECONTAMINATION — the span-grain sibling of
    * q_tp3 (which drops WHOLE contaminated docs): any L-token window that
    * exactly matches a window of the benchmark set is cut out of the
    * training text, keeping the rest of the document — the GPT-3/PaLM
    * n-gram decontamination method. The benchmark is the q_t9 convention
    * (doc_id % 17 == 0 held out as eval suites); planted rows
    * (id+4500000: fresh prefix + a 20-token benchmark slice + fresh
    * suffix) prove interior spans are excised while novel text survives.
    *
    * Scale shape: the benchmark shingle set BROADCASTS (eval suites are
    * millions of n-grams where the corpus is trillions of tokens) and the
    * probe is one left-semi join against it — the corpus-side windows
    * never shuffle on the hash key at all, unlike q_tp9/q_tp10 whose
    * global first-occurrence requires it. Coverage is the tp10
    * difference-array cumsum (one per-doc window), with the simpler
    * policy "dropped iff ANY covering window matches" — benchmark text
    * has no novel-window amnesty. */
  def decontamScrub(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val L = 8
    val toks = TextFunctions.tokens(TextFunctions.normText(col("text")))
    val docsAll = Tables.documents(s, d).select("doc_id", "text")
    val bench = docsAll.filter(col("doc_id") % 17 === 0)
    val planted = bench
      .filter(size(toks) >= 40 && col("doc_id") < 120)
      .select((col("doc_id") + 4500000L).as("doc_id"),
        concat(lit("fresh opening words "), array_join(slice(toks, 5, 20), " "),
          lit(" fresh closing words")).as("text"))
    val corpus = docsAll.filter(col("doc_id") % 17 =!= 0).unionByName(planted)
    val benchH = bench
      .select(explode(graft.functions.GraftFunctions.shingleHashes(toks, L)).as("h"))
      .distinct()
    val tokRows = corpus.select(col("doc_id"), posexplode(toks))
      .select(col("doc_id"), (col("pos") + 1).as("t"), col("col").as("tok"))
    val starts = corpus
      .select(col("doc_id"), posexplode(graft.functions.GraftFunctions.shingleHashes(toks, L)))
      .select(col("doc_id"), (col("pos") + 1).as("p"), col("col").as("h"))
    val hits = starts.join(broadcast(benchH), Seq("h"), "left_semi")
    val deltas = hits.select(col("doc_id"), col("p").as("t"), lit(1).as("ds"))
      .unionByName(hits.select(col("doc_id"), (col("p") + L).as("t"), lit(-1).as("ds")))
      .groupBy("doc_id", "t").agg(sum("ds").as("ds"))
    val w = Window.partitionBy("doc_id").orderBy("t")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tokRows.join(deltas, Seq("doc_id", "t"), "left")
      .withColumn("cs", sum(coalesce(col("ds"), lit(0))).over(w))
      .withColumn("dropped", col("cs") > 0)
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(when(col("dropped"), 1L).otherwise(0L)).as("n_dropped"),
        array_join(
          transform(
            array_sort(collect_list(
              when(!col("dropped"), struct(col("t"), col("tok"))))),
            c => c.getField("tok")),
          " ").as("clean_text"))
      .orderBy("doc_id")
  }

  /** The injected multi-line fixtures for line dedup (the corpus is
    * single-line; three docs share boilerplate footer lines, one is
    * boilerplate-free): ids 4600000+. */
  private def lineSamples(s: SparkSession): DataFrame = {
    import s.implicits._
    Seq(
      (4600000L, "Breaking news about mountain weather\nSubscribe to our newsletter\nAll rights reserved"),
      (4600001L, "Local sports results from yesterday\nSubscribe to our newsletter\nAll rights reserved"),
      (4600002L, "Recipes for the summer season\nSubscribe to our newsletter\nAll rights reserved"),
      (4600003L, "A unique essay with no boilerplate at all"))
      .toDF("doc_id", "text")
  }

  /** TP14: LINE-LEVEL BOILERPLATE DEDUP — C4's "discard any line that
    * occurs 3+ times in the corpus" rule (nav bars, cookie banners,
    * subscribe footers repeat across pages of a site; they dominate
    * naive token counts and poison LM training). Lines key on the md5 of
    * their normalized form; ONE line-key window (count over the hash
    * partition — the 32-char key is the only thing that crosses the
    * wire, never the line text twice) classifies every occurrence, and
    * per-doc reassembly preserves original line order. Single-line
    * corpus docs make the rule degenerate to whole-doc boilerplate
    * detection (a doc text repeated 3+ times vanishes entirely) — the
    * planted multi-line fixtures prove the line-grain path. */
  def lineDedup(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val lines = Tables.documents(s, d).select("doc_id", "text")
      .unionByName(lineSamples(s))
      .select(col("doc_id"), posexplode(split(col("text"), "\n")))
      .select(col("doc_id"), (col("pos") + 1).as("ln"), col("col").as("line"))
      .withColumn("lkey", md5(TextFunctions.normText(col("line"))))
    val wKey = Window.partitionBy("lkey")
    lines
      .withColumn("n", count(lit(1)).over(wKey))
      .withColumn("dropped", col("n") >= 3)
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_lines"),
        sum(when(col("dropped"), 1L).otherwise(0L)).as("n_dropped"),
        array_join(
          transform(
            array_sort(collect_list(
              when(!col("dropped"), struct(col("ln"), col("line"))))),
            c => c.getField("line")),
          "\n").as("clean_text"))
      .orderBy("doc_id")
  }

  /** TP11: SCRUB-THEN-CLEAN — the q_tp10 span scrub (first copy survives,
    * later copies cut) run as stage 0 of the tp1 cleaning chain: quality
    * gate → exact dedup → near-dup removal over the SCRUBBED text. This is
    * the order real pipelines use — substring-level dedup first, so the
    * doc-level quality and near-dup signals are computed on text that no
    * longer carries boilerplate copies. One composed SQL oracle gates the
    * whole lineage (the scrub CTEs feed the shared clean chain). */
  def cleanCorpusScrubbed(s: SparkSession, d: String): DataFrame = {
    val scrubbed = spanScrubCore(Tables.documents(s, d).select("doc_id", "text"))
      .select(col("doc_id"), col("clean_text").as("text"))
    graft.pipeline.CorpusCleaner.clean(s, scrubbed)
  }

  /** TP2: the cluster-resolved cleaning pipeline — near-dups collapsed to
    * one representative per connected component (quality gate → exact dedup
    * → Jaccard pair graph → dupClusters → keep cluster minima). Full SQL
    * oracle: the tp1 CTE chain composed with the dd6 recursive-CTE closure. */
  def cleanCorpusClustered(s: SparkSession, d: String): DataFrame =
    graft.pipeline.CorpusCleaner.cleanClustered(s, Tables.documents(s, d))

  /** TP3: the full pre-training flow — quality gate → exact dedup → near-dup
    * removal → benchmark decontamination, in one declarative lineage. The
    * benchmark is the q_t9 doc_id % 17 slice (external-suite semantics: its
    * grams come from the RAW benchmark text); the corpus is everything else.
    * Full SQL oracle: the tp1 CTE chain composed with the q_t9 broadcast
    * gram probe. */
  def cleanCorpusDecontaminated(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    graft.pipeline.CorpusCleaner.cleanDecontaminated(
      s,
      docs.filter(col("doc_id") % 17 =!= 0),
      docs.filter(col("doc_id") % 17 === 0))
  }

  /** ANN4: per-label embedding centroids by per-dimension partial
    * aggregation — posexplode to skinny (label, pos, v) rows, one hash
    * aggregate over (label, pos), floor-scaled exact means. This is how
    * centroids are computed at 100 TB: each executor partially sums its
    * shard per dimension and only (labels × dims) tiny partials cross the
    * shuffle — no vector ever reaches the driver (contrast a collect-based
    * mean, which cannot scale past driver memory). */
  def labelCentroids(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d)
      .select(col("label"), posexplode(col("embedding")))
      .select(col("label"), col("pos"), col("col").cast("double").as("v"))
      .groupBy("label", "pos")
      .agg(Exact.floorAvg(col("v"), 9).as("centroid_v"), count(lit(1)).as("n"))
      .orderBy("label", "pos")

  // ---- similarity search ----------------------------------------------------

  private[graft] def queryVector(s: SparkSession, d: String): Array[Float] =
    Tables.embeddings(s, d).filter(col("vec_id") === 0)
      .select("embedding").head.getSeq[Float](0).toArray

  /** Exact cosine top-20 against the vec_id=0 query vector, reproducible
    * scoring (oracle-checked). */
  def annCosineTopK(s: SparkSession, d: String): DataFrame =
    Ann.exactTopKReproducible(
      Tables.embeddings(s, d), "vec_id", "embedding",
      queryVector(s, d).map(_.toDouble), 20)

  /** ANN7: INT8-QUANTIZED cosine top-20 — the serving-time compression tier:
    * every vector is symmetrically quantized to the int8 domain per row
    * (q_i = floor(x_i·127/amax + 0.5)), the query is quantized once on the
    * driver with the identical arithmetic, and scoring is an exact integer
    * dot/norm with one fixed-order IEEE divide — so the approximate scores
    * themselves are bit-reproducible and the whole ranking is oracle-exact
    * (the oracle replays quantization AND scoring in SQL). Scale story: a
    * 4× smaller vector representation (int8 vs float32) with SIMD integer
    * dot products — what a 100 TB embedding store actually serves from —
    * while the fused codegen kernel keeps the scan map-side with no shuffle
    * before the final TakeOrdered(20). */
  def annInt8TopK(s: SparkSession, d: String): DataFrame = {
    val q = graft.functions.HashUtil.int8Quantize(queryVector(s, d))
    val qNorm = q.map(x => x * x).sum
    Tables.embeddings(s, d)
      .select(col("vec_id"),
        graft.functions.GraftFunctions.int8Cosine(col("embedding"), q, qNorm).as("q_cos"))
      .orderBy(col("q_cos").desc, col("vec_id"))
      .limit(20)
  }

  /** 25 exact clones of the query vector (vec_id 0) under ids 1000000+ — the
    * recall ground truth for the ANN queries (the q_dd4 construction):
    * identical vectors are guaranteed candidates on any LSH/IVF path (same
    * signature / same cell as the query) and score cosine ≈ 1, while the
    * corpus's best natural cosine is ≈ 0.51 (sf0.01) / 0.60 (sf0.1) — so the
    * (cosine DESC, vec_id ASC) top-20 is exactly {0} ∪ {1000000..1000018}.
    * The cosine value itself is engine-internal fp → dropped from outputs. */
  private def queryClones(emb: DataFrame): DataFrame =
    emb.filter(col("vec_id") === 0)
      .select(explode(sequence(lit(1000000L), lit(1000024L))).as("vec_id"),
        col("embedding"))

  private def withQueryClones(emb: DataFrame): DataFrame =
    emb.unionByName(queryClones(emb))

  /** LSH-bucketed ANN top-20 over the clone-injected corpus (fused-loop
    * cosine rerank) — a real recall oracle, not a rows-only check: the LSH
    * path must surface every planted perfect match or rows go missing. */
  def annLshTopK(s: SparkSession, d: String): DataFrame =
    Ann.lshTopK(s,
      withQueryClones(Tables.embeddings(s, d).select("vec_id", "embedding")),
      "vec_id", "embedding", queryVector(s, d), 20, bits = 16, probes = 5)
      .select("vec_id")

  /** The IVF serving state per (session, sf): quantizer fit once (on the
    * natural corpus — deterministic keyed-order sample) and the cell-
    * partitioned layout written once; every probe after that is a
    * partition-pruned scan + rerank (the 100 TB serving shape, and the fix
    * for BENCH_r02's q_ann3 re-fitting the quantizer per invocation). */
  private val ivfCache = TrieMap.empty[(SparkSession, String), (Ivf.Index, String)]

  /** IVF-cell ANN top-20 served from the partitioned inverted-file layout
    * over the clone-injected corpus — recall-oracled like q_ann2, and the
    * probe reads only its nprobe cell directories (plan-asserted in
    * AnnSpec). */
  def annIvfTopK(s: SparkSession, d: String): DataFrame = {
    val (index, path) = ivfCache.getOrElseUpdate((s, d), {
      val emb = Tables.embeddings(s, d).select("vec_id", "embedding")
      val idx = Ivf.fit(emb, "embedding", nlist = 16)
      val dir = java.nio.file.Files.createTempDirectory("graft-ivf").toString
      Ivf.writePartitioned(withQueryClones(emb), "embedding", idx, dir)
      (idx, dir)
    })
    Ivf.topKPartitioned(s, path, "vec_id", "embedding", index,
      queryVector(s, d), 20, nprobe = 6)
      .select("vec_id")
  }

  /** ANN9: INCREMENTAL IVF MAINTENANCE — closes the index-serving story
    * the cross-batch dedup store (q_dd9) opened: the corpus arrives in TWO
    * batches. The quantizer is fit ONCE on the base batch and then FROZEN;
    * the delta batch (a third of the natural corpus + all 25 planted query
    * clones) is assigned to the frozen centroids map-side and APPENDED
    * into the existing cell-partitioned layout ([[Ivf.appendPartitioned]])
    * — no refit, no shuffle of the resident corpus, no rebuild. The probe
    * then serves from the merged layout exactly as q_ann3 does (partition-
    * pruned nprobe scan + exact rerank) and must surface every planted
    * clone even though ALL of them arrived in the delta — recall through
    * the incremental path is the oracle. Cell identity is a pure function
    * of (vector, frozen centroids), so incremental ≡ from-scratch over the
    * union; AnnSpec asserts the per-cell row sets are identical. */
  def annIvfIncrementalTopK(s: SparkSession, d: String): DataFrame = {
    val (index, path) = ivfIncCache.getOrElseUpdate((s, d), {
      val emb = Tables.embeddings(s, d).select("vec_id", "embedding")
      val base = emb.filter(pmod(col("vec_id"), lit(3)) =!= 1)
      val delta = emb.filter(pmod(col("vec_id"), lit(3)) === 1)
        .unionByName(queryClones(emb))
      val idx = Ivf.fit(base, "embedding", nlist = 16)
      val dir = java.nio.file.Files.createTempDirectory("graft-ivf-inc").toString
      Ivf.writePartitioned(base, "embedding", idx, dir)
      Ivf.appendPartitioned(delta, "embedding", idx, dir)
      (idx, dir)
    })
    Ivf.topKPartitioned(s, path, "vec_id", "embedding", index,
      queryVector(s, d), 20, nprobe = 6)
      .select("vec_id")
  }

  private val ivfIncCache = TrieMap.empty[(SparkSession, String), (Ivf.Index, String)]

  /** ANN10: IVF RECALL OPERATING CURVE — recall@10 as a function of nprobe,
    * the measurement the planted-clone contracts can't give (clones prove
    * recall=1 at cosine≈1; a user tunes nprobe in the 0.7–0.9 cosine
    * regime). Ground truth is the EXACT quantized-cosine top-10 per query
    * (a truth tier — expensive by design, the q_dd13 discipline); the index
    * under test is the SQL-REPLAYABLE IVF fit ([[Ivf.fitReplayable]]:
    * lowest-id seeds + one floor-quantized Lloyd update, the q_dd10b
    * construction), so the ENTIRE curve — fit, assignment, per-query cell
    * ranking, candidate sets, hits — is oracle-gated in DuckDB, not
    * self-reported. Counts are exact integers; recall/scan_frac are single
    * fixed-order IEEE divides.
    *
    * Scale shape: the fit is rounds-not-data on the driver (one
    * (cluster, dim)-keyed aggregate per round, nlist×dim collected);
    * assignment is one fused map-side argmax; the Q query vectors are
    * bounded driver state shipped into ONE corpus scan (Q cosines per row,
    * exploded); ranks come from per-(query[, nprobe]) windows. The
    * evaluation harness scans the corpus — exact ground truth is inherently
    * a scan — while the SERVING path it measures stays partition-pruned
    * (q_ann3/q_ann8); at staged scales the same query runs with the same
    * bounded Q (Scratch `annrecall`). */
  def annIvfRecallCurve(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import s.implicits._
    val emb = Tables.embeddings(s, d).select("vec_id", "embedding")
    val nVec = emb.count()
    val cents = Ivf.fitReplayable(emb, "vec_id", "embedding", nlist = 16)
    // final assignment vs the updated centroids — the argmax the oracle
    // replays (max quantized cosine, ties to the smaller cluster index)
    val scored = array(cents.zipWithIndex.map { case (cv, j) =>
      struct(GraftFunctions.cosineFloor(col("embedding"), typedLit(cv)).as("c"),
        lit(-j).as("neg_j"))
    }: _*)
    val assigned = emb.select(col("vec_id"), col("embedding"),
      (-array_max(scored).getField("neg_j")).cast("int").as("cluster"))
    // Q bounded queries: deterministic id predicate + keyed LIMIT, so Q
    // stays 10 at EVERY scale (the staged 100x/1000x runs included — the
    // truth tier's cost is Q × corpus, and Q must not grow with the corpus)
    val queries: Array[(Long, Array[Float])] =
      emb.filter(pmod(col("vec_id"), lit(50)) === 7).orderBy("vec_id").limit(10)
        .collect()
        .map(r => (r.getLong(0), r.getSeq[Number](1).map(_.floatValue()).toArray))
    // per-(query, cluster) probe ranks: nlist×Q rows of bounded driver
    // state via the scalar twin of the quantized-cosine kernel
    val cranks = queries.toSeq.flatMap { case (qid, qv) =>
      cents.zipWithIndex
        .map { case (cv, j) => (j, graft.functions.HashUtil.cosineFloor(qv, cv)) }
        .sortBy { case (j, c) => (-c, j) }
        .zipWithIndex.map { case ((j, _), r) => (qid, j, r + 1) }
    }.toDF("qid", "cluster", "crank")
    val qCos = array(queries.map { case (qid, qv) =>
      struct(lit(qid).as("qid"),
        GraftFunctions.cosineFloor(col("embedding"), typedLit(qv)).as("c"))
    }: _*)
    val perQ = assigned
      .select(col("vec_id"), col("cluster"), explode(qCos).as("q"))
      .select(col("q.qid").as("qid"), col("q.c").as("c"),
        col("vec_id"), col("cluster"))
      .withColumn("r_true", row_number().over(
        Window.partitionBy("qid").orderBy(col("c").desc, col("vec_id"))))
      .join(broadcast(cranks), Seq("qid", "cluster"))
    val probes = Seq(1, 2, 4, 8, 16)
    val nTruth = 10L * queries.length
    perQ
      .withColumn("nprobe", explode(
        filter(array(probes.map(lit): _*), p => p >= col("crank"))))
      .withColumn("r_ivf", row_number().over(
        Window.partitionBy("qid", "nprobe").orderBy(col("c").desc, col("vec_id"))))
      .groupBy("nprobe")
      .agg(count(lit(1)).as("n_candidates"),
        sum(when(col("r_ivf") <= 10 && col("r_true") <= 10, 1L)
          .otherwise(0L)).as("n_hits"))
      .select(
        col("nprobe").cast("int").as("nprobe"),
        lit(nTruth).as("n_truth"),
        col("n_candidates"), col("n_hits"),
        (col("n_hits").cast("double") / lit(nTruth.toDouble)).as("recall"),
        (col("n_candidates").cast("double")
          / lit((queries.length * nVec).toDouble)).as("scan_frac"))
      .orderBy("nprobe")
  }

  /** R2: HYBRID RETRIEVAL SERVED FROM THE IVF INDEX — q_r1 with the vector
    * leg swapped from the exact scan to the PRODUCTION serving path: the
    * SQL-replayable IVF quantizer ([[Ivf.fitReplayable]]) assigns every
    * doc's embedding to a cell, the query probes its nprobe=4 nearest
    * cells (quantized-cosine centroid ranking, ties to the smaller cell),
    * and only the probed cells' docs are reranked exactly — the
    * partition-pruned shape q_ann3 serves at scale, here composed into the
    * RAG-serving capstone. BECAUSE the fit is replayable, the ENTIRE
    * hybrid result — BM25 leg, quantizer, cell assignment, probe set, IVF
    * top-50, RRF fusion — is one DuckDB-oracle-gated answer: the composed
    * query's approximation (what the cell prune dropped) is pinned
    * bit-for-bit, not waved at.
    *
    * Scale shape: the lexical leg is the postings-pruned BM25 scan; the
    * vector leg reads nprobe/nlist of the corpus (a partition filter
    * against the q_ann3 cell layout in production; the cell-membership
    * filter here computes the same candidate set); both legs end in
    * TakeOrderedAndProject(50); fusion joins two 50-row frames. */
  def hybridRrfIvf(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val emb = Tables.embeddings(s, d)
      .select(col("vec_id").as("doc_id"), col("embedding"))
    val corpus = Tables.documents(s, d).select("doc_id", "text").join(emb, "doc_id")
    val corpusEmb = corpus.select("doc_id", "embedding")
    val cents = Ivf.fitReplayable(corpusEmb, "doc_id", "embedding", nlist = 16)
    val scored = array(cents.zipWithIndex.map { case (cv, j) =>
      struct(GraftFunctions.cosineFloor(col("embedding"), typedLit(cv)).as("c"),
        lit(-j).as("neg_j"))
    }: _*)
    val q = queryVector(s, d)
    // probe set: nprobe=4 cells by quantized centroid cosine, ties to the
    // smaller cell index (bounded driver state, the q_ann10 construction)
    val probed: Seq[Int] = cents.zipWithIndex
      .map { case (cv, j) => (j, graft.functions.HashUtil.cosineFloor(q, cv)) }
      .sortBy { case (j, c) => (-c, j) }.take(4).map(_._1).toSeq
    val vec = corpusEmb
      .withColumn("cluster", (-array_max(scored).getField("neg_j")).cast("int"))
      .filter(col("cluster").isin(probed: _*))
      .select(col("doc_id"),
        GraftFunctions.cosineFloor(col("embedding"), typedLit(q)).as("cosine"))
      .orderBy(col("cosine").desc, col("doc_id"))
      .limit(50)
      .withColumn("r_vec", row_number().over(
        Window.orderBy(col("cosine").desc, col("doc_id"))).cast("int"))
    val lex = graft.text.Bm25.topK(corpus, "doc_id", "text",
        Seq("spark", "merge", "window", "stream"), k = 50)
      .withColumn("r_lex", row_number().over(
        Window.orderBy(col("bm25").desc, col("doc_id"))).cast("int"))
    def rrfTerm(r: Column): Column =
      coalesce(floor(lit(1000000.0) / (lit(60.0) + r.cast("double"))).cast("long"),
        lit(0L))
    lex.select("doc_id", "r_lex")
      .join(vec.select("doc_id", "r_vec"), Seq("doc_id"), "full_outer")
      .withColumn("rrf_micro", rrfTerm(col("r_lex")) + rrfTerm(col("r_vec")))
      .orderBy(col("rrf_micro").desc, col("doc_id"))
      .limit(20)
      .select("doc_id", "r_lex", "r_vec", "rrf_micro")
  }

  /** R1: HYBRID RETRIEVAL (BM25 + VECTOR) WITH RECIPROCAL-RANK FUSION —
    * the standard RAG serving shape, composed from the two proven
    * retrieval tiers: the lexical leg is q_t6's Okapi BM25 top-50, the
    * semantic leg is q_ann1's reproducible exact-cosine top-50 over each
    * document's embedding (vec_id = doc_id), and the fusion is RRF
    * (Cormack et al., SIGIR 2009): score(d) = Σ_legs 1/(60 + rank_leg(d)).
    * Determinism: leg ranks are integers from fully tie-broken
    * (score DESC, id) orders; each RRF contribution is
    * floor(1e6/(60+rank)) — one IEEE divide + floor on integer inputs,
    * bit-identical in any engine — summed as a long, so the fused top-20
    * is oracle-exact end to end (integer rank arithmetic is what makes
    * RRF exactly SQL-mirrorable where raw-score fusion would not be).
    *
    * Scale shape: each leg ends in TakeOrderedAndProject(50) — bounded
    * lists; the legs themselves are the postings-pruned BM25 scan and (in
    * production serving) the partition-pruned IVF probe, each measured
    * separately — and the fusion is a join of two 50-row frames plus a
    * top-20. Nothing grows with corpus size except the legs. */
  def hybridRrf(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val emb = Tables.embeddings(s, d)
      .select(col("vec_id").as("doc_id"), col("embedding"))
    // documents carrying their embedding — the "corpus with an embedding
    // column" shape both legs rank
    val corpus = Tables.documents(s, d).select("doc_id", "text").join(emb, "doc_id")
    val lex = graft.text.Bm25.topK(corpus, "doc_id", "text",
        Seq("spark", "merge", "window", "stream"), k = 50)
      .withColumn("r_lex", row_number().over(
        Window.orderBy(col("bm25").desc, col("doc_id"))).cast("int"))
    val vec = Ann.exactTopKReproducible(corpus, "doc_id", "embedding",
        queryVector(s, d).map(_.toDouble), 50)
      .withColumn("r_vec", row_number().over(
        Window.orderBy(col("cosine").desc, col("doc_id"))).cast("int"))
    def rrfTerm(r: Column): Column =
      coalesce(floor(lit(1000000.0) / (lit(60.0) + r.cast("double"))).cast("long"),
        lit(0L))
    lex.select("doc_id", "r_lex")
      .join(vec.select("doc_id", "r_vec"), Seq("doc_id"), "full_outer")
      .withColumn("rrf_micro", rrfTerm(col("r_lex")) + rrfTerm(col("r_vec")))
      .orderBy(col("rrf_micro").desc, col("doc_id"))
      .limit(20)
      .select("doc_id", "r_lex", "r_vec", "rrf_micro")
  }

  /** E16: STREAMING ANN INDEX MAINTENANCE — q_ann9's incremental IVF
    * maintained BY the ingest stream (the q_e15 foreachBatch discipline
    * applied to ANN serving): arriving embedding micro-batches are
    * assigned MAP-SIDE to the FROZEN centroids and appended into the
    * live cell-partitioned layout — no refit, no rebuild, no shuffle of
    * the resident corpus, and probes stay partition-pruned at nprobe
    * throughout, so serving never blocks on ingest. Cell identity is a
    * pure function of (vector, frozen centroids), so after the last batch
    * the maintained layout holds exactly the rows a from-scratch build
    * would (asserted per cell in AnnSpec); the query therefore shares
    * q_ann3/q_ann9's planted-clone recall oracle verbatim — every clone
    * arrives THROUGH the stream. The sink is
    * [[Ivf.appendPartitionedBatch]]: each batch lands under its own
    * batch=<id> partitions inside the cell dirs and commits a batchId
    * marker — a re-delivered batch is skipped, a crashed half-write is
    * overwritten by its retry — so the stream survives kill/restart
    * (exercised across a real restart in StreamingSpec). The fixture
    * layout lives at a DETERMINISTIC per-dataset path under the JVM temp
    * dir with the _DONE-marker discipline the Scratch stagings use: a
    * finished build is REUSED across JVM runs instead of littering fresh
    * temp dirs, and a crash-interrupted half-build (no _DONE) is wiped
    * and rebuilt cleanly. */
  /** The q_e16 fixture pieces, shared with StreamingSpec's crash-recovery
    * case: the base corpus, the quantizer frozen on it, and the three
    * arrival waves (natural-id split + the clone wave). */
  private[graft] def ivfStreamWaves(
      s: SparkSession, d: String): (DataFrame, Ivf.Index, Seq[DataFrame]) = {
    val emb = Tables.embeddings(s, d).select("vec_id", "embedding")
    val base = emb.filter(pmod(col("vec_id"), lit(3)) =!= 1)
    val delta = emb.filter(pmod(col("vec_id"), lit(3)) === 1)
      .unionByName(queryClones(emb)).truncateLineage()
    val idx = Ivf.fit(base, "embedding", nlist = 16)
    val waves = Seq(
      delta.filter(col("vec_id") < 170),
      delta.filter(col("vec_id") >= 170 && col("vec_id") < 1000000L),
      delta.filter(col("vec_id") >= 1000000L))
    (base, idx, waves)
  }

  /** Runs the q_e16 maintenance stream over `root` (input waves under
    * `root/in`, base layout under `root/ivf`) until every currently
    * available wave is ingested, then stops. Safe to call repeatedly —
    * the checkpoint skips seen files and [[Ivf.appendPartitionedBatch]]
    * skips committed batchIds — which is exactly how StreamingSpec
    * drives a kill/restart. */
  private[graft] def runIvfIngestStream(
      s: SparkSession, idx: Ivf.Index, root: String): Unit = {
    import org.apache.spark.sql.{Dataset, Row}
    val applyBatch: (Dataset[Row], Long) => Unit = (batch, id) =>
      if (!batch.isEmpty) {
        Ivf.appendPartitionedBatch(batch.toDF(), "embedding", idx, s"$root/ivf", id)
        ()
      }
    val q = s.readStream
      .schema("vec_id BIGINT, embedding ARRAY<FLOAT>")
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$root/in/p*")
      .writeStream
      .option("checkpointLocation", s"$root/ckpt")
      .foreachBatch(applyBatch)
      .start()
    try q.processAllAvailable()
    finally q.stop()
  }

  def streamIvfIngest(s: SparkSession, d: String): DataFrame = {
    val (index, layout) = streamIvfCache.getOrElseUpdate((s, d), {
      val (base, idx, waves) = ivfStreamWaves(s, d)
      // deterministic per-dataset root + _DONE marker (the Scratch staging
      // discipline): a finished build is reused across JVM runs instead of
      // littering fresh temp dirs; a half-build (no _DONE) is wiped first.
      // Keyed on a CONTENT fingerprint of the embeddings source (file
      // names + sizes + mtimes), not just the path string: regenerated
      // testdata at the same path gets a fresh fixture instead of silently
      // serving a layout built from the old bytes.
      val srcEmb = new java.io.File(s"$d/embeddings.parquet")
      val srcFiles =
        if (srcEmb.isDirectory) srcEmb.listFiles().sortBy(_.getName).toSeq
        else Seq(srcEmb)
      val fingerprint = srcFiles
        .map(f => s"${f.getName}:${f.length}:${f.lastModified}").mkString("|")
      val root = s"${System.getProperty("java.io.tmpdir")}/graft_e16_${
        Integer.toHexString(d.hashCode)}_${
        Integer.toHexString(fingerprint.hashCode)}"
      val done = new java.io.File(root, "_DONE")
      if (!done.exists()) {
        val rootF = new java.io.File(root)
        if (rootF.exists()) org.apache.commons.io.FileUtils.deleteDirectory(rootF)
        rootF.mkdirs()
        Ivf.writePartitionedBatched(base, "embedding", idx, s"$root/ivf")
        waves.zipWithIndex.foreach { case (df, i) => writeWave(root, i, df) }
        runIvfIngestStream(s, idx, root)
        new java.io.FileOutputStream(done).close()
      }
      (idx, s"$root/ivf")
    })
    Ivf.topKPartitioned(s, layout, "vec_id", "embedding", index,
      queryVector(s, d), 20, nprobe = 6)
      .select("vec_id")
  }

  // package-private: AnnSpec reads the maintained layout back to assert
  // per-cell equivalence with a from-scratch build
  private[graft] val streamIvfCache = TrieMap.empty[(SparkSession, String), (Ivf.Index, String)]

  /** ANN6: HARD-NEGATIVE MINING — for each of the first 100 anchors, the
    * most similar same-label vector (the positive) and the most similar
    * DIFFERENT-label vector (the hard negative): the pair-construction
    * stage of contrastive / metric-learning training data. Brute-force
    * scored here (anchors broadcast against one full scan — the exact tier
    * every ANN variant reranks with); at 100 TB the candidate set per
    * anchor comes from the IVF/LSH indexes (q_ann2/q_ann3) and this same
    * top-1-per-anchor aggregate runs on candidates only. The per-anchor
    * argmax is a map-side-combinable max-struct aggregate — no window, no
    * per-anchor sort. Quantized cosine ⇒ oracle-exact pair choices. */
  def annHardNegatives(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d).select("vec_id", "embedding", "label")
    val anchors = emb.filter(col("vec_id") < 100).select(
      col("vec_id").as("anchor_id"), col("embedding").as("avec"), col("label").as("albl"))
    val scored = emb.join(broadcast(anchors), col("vec_id") =!= col("anchor_id"))
      .select(col("anchor_id"), col("albl"), col("vec_id"), col("label"),
        GraftFunctions.cosineFloor(col("embedding"), col("avec")).as("c"))
    // ONE pass over the scored pairs: conditional max-struct aggregates
    // compute both argmaxes together (max ignores the null branch), instead
    // of re-running the broadcast join + cosines per filter.
    val best = struct(col("c"), (-col("vec_id")).as("neg_id"))
    scored.groupBy("anchor_id")
      .agg(
        max(when(col("label") === col("albl"), best)).as("pos"),
        max(when(col("label") =!= col("albl"), best)).as("neg"))
      .filter(col("pos").isNotNull && col("neg").isNotNull)
      .select(col("anchor_id"),
        (-col("pos.neg_id")).as("pos_id"), col("pos.c").as("pos_cos"),
        (-col("neg.neg_id")).as("neg_id"), col("neg.c").as("neg_cos"))
      .orderBy("anchor_id")
  }

  /** The PQ codebooks per (session, sf): trained once on the natural corpus
    * (deterministic keyed-order sample), like the IVF quantizer. */
  private val pqCache = TrieMap.empty[(SparkSession, String), graft.similarity.Pq.Codebooks]

  /** ANN5: product-quantized top-20 over the clone-injected corpus — the
    * COMPRESSION tier of the ANN family (codes are ~64× smaller than the
    * vectors; the candidate scan is table lookups over the code column,
    * [[graft.similarity.Pq]]). Recall-oracled like q_ann2/q_ann3: every
    * planted exact match must survive the ADC scan + exact rerank or rows
    * go missing from the literal expected set. */
  def annPqTopK(s: SparkSession, d: String): DataFrame = {
    import graft.similarity.Pq
    val emb = Tables.embeddings(s, d).select("vec_id", "embedding")
    val cb = pqCache.getOrElseUpdate((s, d), Pq.fit(emb, "embedding"))
    Pq.topK(s, withQueryClones(emb), "vec_id", "embedding", cb,
      queryVector(s, d), 20)
      .select("vec_id")
  }

  /** ANN8: THE FULL SERVING STACK — IVF + PQ + exact rerank composed the
    * way a production vector store actually answers a query (the FAISS
    * IVFPQ shape): (1) the partition-pruned IVF probe touches only the
    * nprobe/nlist cell directories; (2) within the probed cells a PQ ADC
    * scan ranks candidates from the compact code column (table lookups, no
    * float loops) down to a 100-candidate shortlist; (3) only the
    * shortlist's full vectors are read for the exact rerank to top-20.
    * At 100 TB: stage 1 prunes bytes by nprobe/nlist, stage 2 scans ~1/60th
    * of the remaining bytes (codes vs floats), stage 3 touches 100 vectors
    * — the multiplicative byte math that makes ANN serving feasible. The
    * planted-clone recall oracle gates the whole composition: all 19 clones
    * + the query must survive every tier or rows vanish from the literal
    * expected set. (In a persisted deployment the `code` column is written
    * next to `cell` at index-build time; here it is computed on the probed
    * slice, which is the same plan shape after the prune.) */
  def annIvfPqTopK(s: SparkSession, d: String): DataFrame = {
    import graft.similarity.Pq
    val emb = Tables.embeddings(s, d).select("vec_id", "embedding")
    val (index, path) = ivfCache.getOrElseUpdate((s, d), {
      val idx = Ivf.fit(emb, "embedding", nlist = 16)
      val dir = java.nio.file.Files.createTempDirectory("graft-ivf").toString
      Ivf.writePartitioned(withQueryClones(emb), "embedding", idx, dir)
      (idx, dir)
    })
    val cb = pqCache.getOrElseUpdate((s, d), Pq.fit(emb, "embedding"))
    val q = queryVector(s, d)
    val probed = s.read.parquet(path)
      .filter(col("cell").isin(Ivf.probeCells(index, q, 6): _*))
    val shortlist = Pq.encode(probed, "embedding", cb)
      .withColumn("adc", Pq.adcCosineCol(cb, q))
      .orderBy(col("adc").desc, col("vec_id"))
      .limit(100)
    shortlist
      .select(col("vec_id"),
        Ann.reproducibleCosine(col("embedding"), q.map(_.toDouble)).as("c"))
      .orderBy(col("c").desc, col("vec_id"))
      .limit(20)
      .select("vec_id")
  }

  // ---- multimodal -----------------------------------------------------------

  /** Media fixture blobs cached per (session, sf): generating the payloads
    * is fixture setup, not the operator under test — caching makes repeated
    * runs (and the bench's min-of-two) measure the DECODE stage. */
  private val blobCache = TrieMap.empty[(SparkSession, String, String), DataFrame]

  private def cachedBlobs(s: SparkSession, d: String, kind: String)(
      build: => DataFrame): DataFrame =
    blobCache.getOrElseUpdate((s, d, kind), build.truncateLineage())

  /** Binary-column pipeline with REAL image decode: deterministic tiny PNGs
    * (one per document, dimensions derived from doc_id) are encoded and then
    * decoded back with javax.imageio inside the mapPartitions batch stage.
    * The oracle mirrors the fixture's dimension formulas — the decoder must
    * actually parse the PNG bytes to reproduce them. PNG byte length is
    * encoder-internal → dropped from the output. */
  def blobMeta(s: SparkSession, d: String): DataFrame =
    Multimodal.decodeImages(s,
      cachedBlobs(s, d, "png")(Multimodal.toPngBlobs(s, Tables.documents(s, d))))
      .orderBy("doc_id").toDF()
      .select("doc_id", "width", "height", "channels")

  /** MM4: real resize + feature extraction — decode, nearest-neighbor
    * downsample by 2, mean red channel of the result. The oracle recomputes
    * the same values from the fixture's pixel formula, gating the whole
    * decode → resample → reduce chain, not just header parsing. */
  def resizeFeatures(s: SparkSession, d: String): DataFrame =
    Multimodal.resizeFeatures(s,
      cachedBlobs(s, d, "png")(Multimodal.toPngBlobs(s, Tables.documents(s, d))))
      .orderBy("doc_id").toDF()

  /** MM7: IMAGE PERCEPTUAL DEDUP — dedup crosses into the image modality:
    * every PNG is REALLY decoded (javax.imageio in the mapPartitions batch
    * stage) and reduced to a 64-bit average-hash
    * ([[Multimodal.imageAHash]]); images sharing a hash collapse to the
    * lowest doc_id (the q_t25 window rule). Planted clones (ids +4700000
    * reuse the ORIGINAL id as pixel seed, so the blob bytes are identical
    * under a new id) guarantee non-trivial groups. The oracle recomputes
    * each hash from the fixture pixel FORMULA — the engine must actually
    * decode pixels to match it. Scale shape: hash extraction is the
    * embarrassing-parallel decode pass; dedup shuffles only (doc_id,
    * 64-char hash) — never image bytes. */
  def imageHashDedup(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import s.implicits._
    val ids = Tables.documents(s, d)
      .select(col("doc_id"), col("doc_id").as("seed"))
      .unionByName(Tables.documents(s, d).filter(col("doc_id") < 50)
        .select((col("doc_id") + 4700000L).as("doc_id"), col("doc_id").as("seed")))
    val blobs = cachedBlobs(s, d, "png_clone")(Multimodal.toPngBlobsSeeded(s, ids))
    val w = Window.partitionBy("ahash")
    Multimodal.imageAHash(s, blobs).toDF()
      .withColumn("keep", col("doc_id") === min("doc_id").over(w))
      .withColumn("group_size", count(lit(1)).over(w))
      .orderBy("doc_id")
  }

  /** MM8: AUDIO CONTENT DEDUP — the audio sibling of q_mm7: every WAV is
    * really decoded (javax.sound.sampled) and reduced to a 4-window
    * integer energy fingerprint ([[Multimodal.audioFingerprint]]); blobs
    * sharing the profile collapse to the lowest doc_id. Clones (ids
    * +4800000, original id as seed → byte-identical audio) plant the
    * groups; the oracle recomputes each window energy from the PCM sample
    * FORMULA, so header-only parsing cannot fake the fingerprint. */
  def audioHashDedup(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ids = Tables.documents(s, d)
      .select(col("doc_id"), col("doc_id").as("seed"))
      .unionByName(Tables.documents(s, d).filter(col("doc_id") < 50)
        .select((col("doc_id") + 4800000L).as("doc_id"), col("doc_id").as("seed")))
    val blobs = cachedBlobs(s, d, "wav_clone")(Multimodal.toWavBlobsSeeded(s, ids))
    val w = Window.partitionBy("sig")
    Multimodal.audioFingerprint(s, blobs).toDF()
      .withColumn("keep", col("doc_id") === min("doc_id").over(w))
      .withColumn("group_size", count(lit(1)).over(w))
      .orderBy("doc_id")
  }

  /** MM9: IMAGE–TEXT PAIR CURATION — the LAION-style multimodal gate:
    * every (caption, image) pair joins the REAL decoded dimensions with
    * caption token stats and keeps only pairs whose image is big enough
    * (area ≥ 400 px), not degenerate in aspect (longest side ≤ 3× the
    * shortest — integer cross-multiplied), and whose caption is neither
    * empty nor a document (5..60 tokens). The decode runs in the
    * mapPartitions batch stage; everything after is one map-side
    * projection — no shuffle beyond the output sort. */
  def imageTextPairs(s: SparkSession, d: String): DataFrame = {
    val meta = Multimodal.decodeImages(s,
      cachedBlobs(s, d, "png")(Multimodal.toPngBlobs(s, Tables.documents(s, d))))
      .toDF().select("doc_id", "width", "height")
    val caps = Tables.documents(s, d)
      .select(col("doc_id"),
        size(TextFunctions.tokens(col("text"))).cast("long").as("n_caption_tokens"))
    meta.join(caps, Seq("doc_id"))
      .withColumn("keep",
        (col("width") * col("height") >= 400) &&
        (greatest(col("width"), col("height")) <= least(col("width"), col("height")) * 3) &&
        col("n_caption_tokens").between(5L, 60L))
      .orderBy("doc_id")
  }

  /** MM10: IMAGE NEAR-DUP PAIRS — the hamming tier above q_mm7's exact
    * match: re-encoded/slightly-retouched copies land within a few aHash
    * bits of each other. Candidates come from a 4×16-bit band join
    * (pigeonhole: distance ≤ 3 GUARANTEES an exact band match, so recall
    * at the threshold is structural, not probabilistic — the q_dd3
    * SimHash discipline on decoded-pixel signatures); the exact distance
    * is bit_count(xor) over the band integers — codegen'd, no lambda.
    * Output: all pairs at distance 1..3 (0 = q_mm7's exact tier). */
  def imageNearDups(s: SparkSession, d: String): DataFrame = {
    val blobs = cachedBlobs(s, d, "png")(Multimodal.toPngBlobs(s, Tables.documents(s, d)))
    val bandCols = (0 until 4).map(b =>
      conv(substring(col("ahash"), b * 16 + 1, 16), 2, 10).cast("long").as(s"b$b"))
    // Collapse identical signatures FIRST (r10): band-bucket join work is
    // per DISTINCT signature, not per doc — real image corpora carry heavy
    // exact-duplicate populations (this fixture: 50k docs -> 1.8k distinct
    // hashes at 10x), and a doc-level band self-join squares the group
    // sizes inside every bucket (measured 1.3e9 join rows / 133 s at 10x;
    // 1.3 s after the collapse). sid = min doc id (distinct groups have
    // distinct mins) canonicalizes sig pairs; doc-level pairs are recovered
    // by a final cross-expansion, which is OUTPUT-bound — it materializes
    // exactly the pairs the query returns. Mega-group caveat: a group with
    // millions of members would make both the collect_list row and the
    // output quadratic — at that size the exact tier (q_mm7) must collapse
    // the group before near-dup pairing, which is the production order.
    val sigs = Multimodal.imageAHash(s, blobs).toDF()
      .select(col("doc_id") +: bandCols: _*)
      .groupBy("b0", "b1", "b2", "b3")
      .agg(min("doc_id").as("sid"), collect_list("doc_id").as("docs"))
      .truncateLineage()
    val cand = (0 until 4).map { b =>
        sigs.select(col("sid").as("si"), col(s"b$b").as("bk"), lit(b).as("bi"))
          .join(sigs.select(col("sid").as("sj"), col(s"b$b").as("bk"), lit(b).as("bi")),
            Seq("bk", "bi"))
          .filter(col("si") < col("sj"))
          .select("si", "sj")
      }.reduce(_ unionByName _).distinct()
    val si = (0 until 4).map(b => col(s"b$b").as(s"b${b}_i"))
    val sj = (0 until 4).map(b => col(s"b$b").as(s"b${b}_j"))
    val dist = (0 until 4).map(b =>
      bit_count(expr(s"b${b}_i ^ b${b}_j"))).reduce(_ + _)
    cand
      .join(sigs.select(col("sid").as("si") +: col("docs").as("docs_i") +: si: _*), Seq("si"))
      .join(sigs.select(col("sid").as("sj") +: col("docs").as("docs_j") +: sj: _*), Seq("sj"))
      .withColumn("dist", dist.cast("int"))
      .filter(col("dist").between(1, 3))
      .select(explode(col("docs_i")).as("a"), col("docs_j"), col("dist"))
      // repartition BETWEEN the two explodes: without it one hot sig pair
      // (3k x 3k docs) expands entirely inside a single task — the first
      // explode fans a pair out to |docs_i| rows, spreading the second
      // explode across the cluster
      .repartition(col("a"))
      .select(col("a"), explode(col("docs_j")).as("b"), col("dist"))
      .select(least(col("a"), col("b")).as("i"), greatest(col("a"), col("b")).as("j"), col("dist"))
      .orderBy("i", "j")
  }

  /** MM5: REAL video demux — bespoke GVID container (length-prefixed real
    * PNG frames) parsed byte-by-byte, evenly-spaced frames decoded and
    * reduced to mean red. Replaces the last declared stub in the multimodal
    * family: container parse, bounded frame sampling, and per-frame decode
    * are all genuine; the oracle recomputes every value from the fixture
    * formulas. */
  def videoDemux(s: SparkSession, d: String): DataFrame =
    Multimodal.demuxVideo(s,
      cachedBlobs(s, d, "gvid")(Multimodal.toVideoBlobs(s, Tables.documents(s, d))))
      .orderBy("doc_id", "frame_idx").toDF()

  /** MM11: VIDEO CONTENT DEDUP — completes the image (q_mm7) / audio
    * (q_mm8) / video modality triple: every GVID clip is REALLY demuxed
    * (container parse + length-prefixed frame seeks) and its sampled
    * frames REALLY decoded (javax.imageio), each reduced to the q_mm7
    * 64-bit average-hash; the per-clip signature is frame count + the
    * frame hashes in sample order ([[Multimodal.videoFingerprint]]).
    * Clips sharing the signature collapse to the lowest doc_id (the
    * q_t25 window rule). Planted clones (ids +4900000 reuse the ORIGINAL
    * id as the container seed, so the clip bytes are identical under a
    * new id) guarantee non-trivial groups; the oracle recomputes every
    * frame hash from the fixture pixel FORMULAS — header-only parsing
    * cannot fake the signature. Scale shape: fingerprinting is the
    * embarrassing-parallel demux/decode pass with per-row fan-out capped
    * at maxFrames; dedup shuffles only (doc_id, ~200-byte sig) — never
    * video bytes. */
  def videoHashDedup(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ids = Tables.documents(s, d)
      .select(col("doc_id"), col("doc_id").as("seed"))
      .unionByName(Tables.documents(s, d).filter(col("doc_id") < 50)
        .select((col("doc_id") + 4900000L).as("doc_id"), col("doc_id").as("seed")))
    val blobs = cachedBlobs(s, d, "gvid_clone")(Multimodal.toVideoBlobsSeeded(s, ids))
    val w = Window.partitionBy("sig")
    Multimodal.videoFingerprint(s, blobs).toDF()
      .withColumn("keep", col("doc_id") === min("doc_id").over(w))
      .withColumn("group_size", count(lit(1)).over(w))
      .orderBy("doc_id")
  }

  /** MM3: real audio decode — deterministic PCM WAV payloads parsed back
    * through javax.sound.sampled in the mapPartitions stage; the oracle
    * mirrors the fixture's format formulas, so the decoder must actually
    * walk the RIFF structure. */
  def audioMeta(s: SparkSession, d: String): DataFrame =
    Multimodal.decodeAudio(s,
      cachedBlobs(s, d, "wav")(Multimodal.toWavBlobs(s, Tables.documents(s, d))))
      .orderBy("doc_id").toDF()

  /** MM6: signal-level audio features — PCM decoded sample-by-sample, peak
    * amplitude and RMS energy reduced per doc; the oracle recomputes both
    * from the fixture's sample formula, so the decoder must really read the
    * waveform (integer peak/square-sum, one IEEE division + sqrt). */
  def audioFeatures(s: SparkSession, d: String): DataFrame =
    Multimodal.audioFeatures(s,
      cachedBlobs(s, d, "wav")(Multimodal.toWavBlobs(s, Tables.documents(s, d))))
      .orderBy("doc_id").toDF()

  /** Frame sampling over blobs — the bounded 1→N video stage (stub demuxer,
    * deterministic arithmetic mirrored in the oracle). */
  def frameSample(s: SparkSession, d: String): DataFrame =
    Multimodal.frameSampleStub(s, Multimodal.toBlobs(Tables.documents(s, d)))
      .orderBy("doc_id", "frame_idx").toDF()

  /** W4-faithful percentile_approx as a grouped aggregate, at the per-series
    * grain. Grain matters for the oracle: the sketch's exact behavior must
    * survive the distributed MERGE of partial summaries, whose rank error
    * grows with group size — a Country-level grouping hash-matched
    * quantile_disc at sf0.01 but drifted off-by-one at sf0.1 (found by the
    * r3 sf0.1 robustness sweep). Per-(Country, StockCode) groups stay orders
    * of magnitude below accuracy at any plausible scale factor, so the
    * exact-path rule holds robustly, not incidentally. */
  def percentileApprox(s: SparkSession, d: String): DataFrame =
    daily(s, d)
      .groupBy("Country", "StockCode")
      .agg(
        percentile_approx(col("NetDailyQuantity"), lit(0.5), lit(10000)).as("approx_median_qty"),
        count(lit(1)).as("n"))
      .orderBy("Country", "StockCode")

  // ---- ML surface -----------------------------------------------------------

  /** Lasso forecast trained on lag features, evaluated per country against
    * the MA baseline (M1-M9 end-to-end on the driver surface; model fits are
    * seed-fixed but solver-dependent → rows-only check). */
  def mlForecastKpi(s: SparkSession, d: String): DataFrame = {
    import graft.ml.ForecastModels
    val dl = daily(s, d)
    // Profiled restructure (PERF.md round 4): the indexers fit on the CACHED
    // pre-feature daily grain in one multi-column pass (identical indices,
    // no lag-lineage replay); the window + assembly lineage is materialized
    // ONCE over the full history into a slim pin (keys, label, price,
    // vector) from which both the solver's train filter and the prediction's
    // test filter read; the three-metric evaluation — whose output this
    // query discards — is skipped entirely. Assemble-then-split equals
    // split-then-assemble: the time filter is row-local and the assembler's
    // handleInvalid=skip drops the same null rows either way.
    val features = Forecast.lagFeatures(dl, 1 to 3)
    val featureCols = ForecastModels.numericFeatureCols(features)
    val (trainDaily, _) = ForecastModels.timeSplit(dl, "1999-09-01")
    val fp = ForecastModels.featurePipelineOn(featureCols, trainDaily, features)
    val assembled = fp.transform(features)
      .select(
        col("Country"), col("StockCode"), col("InvoiceDate"),
        col(ForecastModels.LabelCol), col("AvgUnitPrice"), col("features"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val (train, test) = ForecastModels.timeSplit(assembled, "1999-09-01")
    val model = ForecastModels.lasso(0.05).fit(
      train.select(ForecastModels.LabelCol, "features"))
    val pred = model.transform(test)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    pred.count() // materialize before dropping the assembled pin
    assembled.unpersist(false)
    Forecast.kpiByCountry(Forecast.evalAgainstBaseline(dl, pred)).orderBy("Country")
  }

  /** ML2: closed-form per-country OLS fit (y = NetDailyQuantity on
    * x = DayOfWeek) as ONE distributed aggregate — beta and intercept from
    * the sufficient statistics (n, Σx, Σy, Σxy, Σx²), all exact integer
    * sums, so the fit is deterministic at any parallelism and DuckDB-
    * mirrorable bit-for-bit. The 100 TB story: a single-feature baseline
    * model needs no iterative solver — sufficient statistics are one
    * map-side-combined hash aggregate, the same shuffle cost as a GROUP BY,
    * and the closed form is exact where L-BFGS is convergence-dependent
    * (contrast: q_ml1's Lasso fit is rows-only for exactly that reason). */
  def olsFit(s: SparkSession, d: String): DataFrame = {
    val stats = daily(s, d)
      .select(
        col("Country"),
        col("DayOfWeek").cast("long").as("x"),
        col("NetDailyQuantity").as("y"))
      .groupBy("Country")
      .agg(
        count(lit(1)).as("n"),
        sum("x").as("sx"), sum("y").as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"))
    val denom = col("n") * col("sxx") - col("sx") * col("sx")
    stats
      .withColumn("beta",
        when(denom =!= 0,
          (col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
            / denom.cast("double")))
      .select(
        col("Country"), col("n"), col("beta"),
        when(col("beta").isNotNull,
          (col("sy").cast("double") - col("beta") * col("sx").cast("double"))
            / col("n").cast("double")).as("alpha"))
      .orderBy("Country")
  }

  /** ML3: multi-feature closed-form RIDGE fit per country — y =
    * NetDailyQuantity on (DayOfWeek, Month, Week, Day) + intercept, λ = 10 —
    * via [[graft.ml.NormalEq]]: exact DECIMAL sufficient statistics in one
    * map-side-combined aggregate, then pivot-free Gaussian elimination whose
    * generated formula text is shared verbatim with the DuckDB oracle, so a
    * genuinely multi-feature FIT is hash-gated bit-for-bit (q_ml2 could only
    * do single-feature; q_ml1's MLlib solver is rows-only by nature). */
  def ridgeMultiFit(s: SparkSession, d: String): DataFrame =
    graft.ml.NormalEq.ridgeFit(
      daily(s, d),
      Seq("Country"),
      Seq(col("DayOfWeek"), col("Month"), col("Week"), col("Day")),
      col("NetDailyQuantity"),
      lambda = 10L)
      .orderBy("Country")

  /** ML5: the q_ml3 fit WITH its scorecard — per-country SSE/SST/R²/RMSE
    * derived from the SAME sufficient statistics (one extra Σy² column in
    * the aggregate, zero extra data passes; NormalEq.diagnosticsFormulas).
    * The reference evaluates every model with a three-pass
    * RegressionEvaluator (M7); at 100 TB this shape trains AND evaluates
    * 25 per-country models for the shuffle price of one GROUP BY, and the
    * whole scorecard — not just the fit — is hash-gated against DuckDB. */
  def ridgeScorecard(s: SparkSession, d: String): DataFrame =
    graft.ml.NormalEq.ridgeFit(
      daily(s, d),
      Seq("Country"),
      Seq(col("DayOfWeek"), col("Month"), col("Week"), col("Day")),
      col("NetDailyQuantity"),
      lambda = 10L,
      diagnostics = true)
      .orderBy("Country")

  /** ML4: the reference's model SHAPE under the hash oracle — a GLOBAL
    * multi-feature fit on lag features (the reference's headline Lasso
    * trains on exactly this kind of design, Sales_forecast_pyspark.py:
    * 1160-1169; its OWL-QN path is convergence-dependent, so q_ml1 is
    * rows-only) as a closed-form ridge: y = NetDailyQuantity on (lag1,
    * lag2, lag3, DayOfWeek) + intercept, λ = 10. One window pass builds the
    * integer lag design, one map-side-combined aggregate produces the exact
    * sufficient statistics, and the shared elimination text solves the 5×5
    * system — at 100 TB this is a baseline autoregressive model for the
    * price of a GROUP BY. */
  def ridgeLagFit(s: SparkSession, d: String): DataFrame = {
    val qty = col("NetDailyQuantity")
    val lagged = daily(s, d).select(
      qty,
      col("DayOfWeek"),
      coalesce(lag(qty, 1).over(Forecast.seriesW), lit(0L)).as("lag1"),
      coalesce(lag(qty, 2).over(Forecast.seriesW), lit(0L)).as("lag2"),
      coalesce(lag(qty, 3).over(Forecast.seriesW), lit(0L)).as("lag3"))
    graft.ml.NormalEq.ridgeFit(
      lagged, Nil,
      Seq(col("lag1"), col("lag2"), col("lag3"), col("DayOfWeek")),
      qty, lambda = 10L)
  }

  /** T5b: exact-dedup groups keyed by the custom 64-bit rolling-hash
    * fingerprint instead of md5. The oracle groups by the canonical text
    * itself: the query is hash-exact iff RollingHash64 partitions the corpus
    * identically to content equality (deterministic across partitions,
    * collision-free at corpus scale) — an oracle for the custom expression
    * family that q_t5 could only rows-only-check. */
  def hash64Groups(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .groupBy(GraftFunctions.rollingHash(s, TextFunctions.normText(col("text"))).as("fp64"))
      .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_copies"))
      .select("keep_id", "n_copies")
      .orderBy("keep_id")

  // ---- registry -------------------------------------------------------------

  /** Output-boundary normalization: date and (instant) timestamp columns are
    * cast to TIMESTAMP_NTZ so the parquet the driver reads back carries the
    * same tz-naive physical type DuckDB produces for its result frame —
    * otherwise tz-aware µs timestamps vs naive dates can't hash-compare.
    * Session tz is UTC everywhere, so values are unchanged wall-clock. */
  private def normalizeTemporal(df: DataFrame): DataFrame = {
    val cols = df.schema.fields.map { f =>
      f.dataType match {
        case DateType | TimestampType => col(f.name).cast(TimestampNTZType).as(f.name)
        case _ => col(f.name)
      }
    }
    df.select(cols.toSeq: _*)
  }

  private val raw: Map[String, Q] = Map(
    "q_a1_scan_count" -> (scanCount _),
    "q_a2_date_profile" -> (dateProfile _),
    "q_a3_daily_sales" -> (dailySales _),
    "q_a4_monthly_rollup" -> (monthlyRollup _),
    "q_a5_country_topk" -> (countryTopK _),
    "q_a6_dow_rollup" -> (dowRollup _),
    "q_a7_daily_totals" -> (dailyTotals _),
    "q_a8_kpi_global" -> (kpiGlobal _),
    "q_a9_kpi_by_country" -> (kpiByCountry _),
    "q_a10_value_weighted" -> (valueWeighted _),
    "q_a11_percentile" -> (percentileByPart _),
    "q_a12_count_distinct" -> (countDistinctParts _),
    "q_a13_approx_distinct" -> (approxDistinct _),
    "q_a14_rollup" -> (rollupTotals _),
    "q_w7_ranking" -> (rankingWindows _),
    "q_p1_proj_filter" -> (projFilter _),
    "q_p4_segment_filter" -> (segmentFilter _),
    "q_p5_split_flag" -> (splitFlag _),
    "q_p8_sample" -> (sampleCount _),
    "q_d1_distinct_count" -> (distinctCount _),
    "q_d2_dedup_exact" -> (dedupExact _),
    "q_j1_join_left" -> (joinLeft _),
    "q_j2_join_composite" -> (joinComposite _),
    "q_j3_join_inner" -> (joinInner _),
    "q_j4_join_semi" -> (joinSemi _),
    "q_j5_join_anti" -> (joinAnti _),
    "q_u1_union_segments" -> (unionSegments _),
    "q_u2_set_ops" -> (setOps _),
    "q_o1_sort_limit" -> (sortLimit _),
    "q_f1_scalar_math" -> (scalarMath _),
    "q_f2_json_extract" -> (jsonExtract _),
    "q_f3_strings" -> (stringFunctions _),
    "q_f4_cond_aggs" -> (conditionalAggs _),
    "q_w10_nav" -> (navWindows _),
    "q_e1_hourly_events" -> (hourlyEvents _),
    "q_e3_stream_hourly" -> (streamedHourlyEvents _),
    "q_e4_stream_sessions" -> (streamedSessions _),
    "q_a18_cube" -> (cubeTotals _),
    "q_a19_grouping_sets" -> (groupingSetsTotals _),
    "q_a20_moment_stats" -> (momentStats _),
    "q_a21_typed_agg" -> (typedWeightedMean _),
    "q_f7_from_json" -> (fromJsonParse _),
    "q_f5_arrays" -> (arrayFunctions _),
    "q_u3_unpivot" -> (unpivotKpis _),
    "q_u4_merge_upsert" -> (mergeUpsertCustomers _),
    "q_j11_star_join" -> (starJoin _),
    "q_j12_scd2_lookup" -> (scd2Lookup _),
    "q_u5_scd2" -> (scd2Orders _),
    "q_u6_snapshot_diff" -> (snapshotDiffCustomers _),
    "q_a22_incremental_rollup" -> (incrementalRollup _),
    "q_w11_dist" -> (distWindows _),
    "q_w12_densify" -> (densifiedDailyTotals _),
    "q_w16_interpolate" -> (interpolatedDailyTotals _),
    "q_w13_ratio_to_report" -> (ratioToReport _),
    "q_t9_contamination" -> (contamination _),
    "q_t10_boilerplate" -> (boilerplateGrams _),
    "q_t11_length_hist" -> (tokenHistogram _),
    "q_t12_vocabulary" -> (vocabulary _),
    "q_t13_heavy_hitters" -> (heavyHitters _),
    "q_t14_bpe_tokens" -> (textBpeTokens _),
    "q_t15_sequence_pack" -> (sequencePack _),
    "q_t16_ngram_lm" -> (ngramLmScores _),
    "q_t17_hashed_tfidf" -> (hashedTfidf _),
    "q_t18_bpe_train" -> (bpeTrainMerges _),
    "q_t18b_bpe_train_batched" -> (bpeTrainBatchedMerges _),
    "q_t21_quality_classifier" -> (qualityClassifier _),
    "q_ml6_threshold_sweep" -> (classifierThresholdSweep _),
    "q_tp7_clean_classified" -> (cleanCorpusClassified _),
    "q_t22_markup_strip" -> (markupStrip _),
    "q_t23_domain_curation" -> (domainCuration _),
    "q_t23b_salted_cap" -> (domainCurationSalted _),
    "q_t24_gopher_rules" -> (gopherRules _),
    "q_t25_url_canonical" -> (urlCanonicalDedup _),
    "q_t25b_salted_urls" -> (urlCanonicalDedupSalted _),
    "q_t26_filter_funnel" -> (filterFunnel _),
    "q_t28_mojibake" -> (mojibakeRepair _),
    "q_t29_nfc_normalize" -> (nfcNormalizeDocs _),
    "q_t30_code_detect" -> (codeDetect _),
    "q_t31_chunk_overlap" -> (chunkWithOverlap _),
    "q_t32_zipf_fit" -> (zipfFit _),
    "q_p16_epoch_repeat" -> (epochRepeat _),
    "q_p17_importance_resample" -> (importanceResample _),
    "q_tp15_ensemble_gate" -> (ensembleGate _),
    "q_tp16_publish" -> (publishPipeline _),
    "q_g1_pagerank" -> (hostPageRank _),
    "q_g1b_pagerank_redist" -> (hostPageRankRedistributed _),
    "q_g2_rank_gate" -> (rankGatedDocs _),
    "q_g4_hits" -> (hostHits _),
    "q_g3_rank_convergence" -> (pageRankConvergence _),
    "q_s13_shard_manifest" -> (shardManifest _),
    "q_s14_incr_manifest" -> (incrementalManifest _),
    "q_s15_manifest_diff" -> (manifestDiff _),
    "q_e15_stream_manifest" -> (streamedManifest _),
    "q_e16_stream_ivf" -> (streamIvfIngest _),
    "q_tp12_crawl_pipeline" -> (crawlPipeline _),
    "q_tp13_decontam_scrub" -> (decontamScrub _),
    "q_tp14_line_dedup" -> (lineDedup _),
    "q_e14_stream_urls" -> (streamedUrlFrontier _),
    "q_tp8_clean_stripped" -> (cleanCorpusStripped _),
    "q_t19_bpe_encode" -> (bpeEncodeCounts _),
    "q_t20_bpe_vocab" -> (bpeVocab _),
    "q_t27_bpe_token_ids" -> (bpeTokenIds _),
    "q_f6_datetime" -> (datetimeFunctions _),
    "q_s7_partitioned_scan" -> (partitionedScan _),
    "q_s9_dpp_join" -> (dppJoin _),
    "q_s10_rebalanced_write" -> (rebalancedRoundtrip _),
    "q_s11_zorder" -> (zorderKeys _),
    "q_s8_orc_roundtrip" -> (orcRoundtrip _),
    "q_e5_stream_dedup" -> (streamedDedup _),
    "q_e8_stream_merge" -> (streamedMerge _),
    "q_e11_stream_dedup_store" -> (streamedIncrementalDedup _),
    "q_e12_stream_countmin" -> (streamedCountMin _),
    "q_e13_stream_classify" -> (streamedClassifierScores _),
    "q_e9_funnel" -> (eventFunnel _),
    "q_a24_ab_test" -> (abTest _),
    "q_a25_countmin" -> (countMinUsers _),
    "q_a26_dataset_card" -> (datasetCard _),
    "q_e10_cohort_retention" -> (cohortRetention _),
    "q_s12_schema_evolution" -> (schemaEvolutionRead _),
    "q_e6_stream_join" -> (streamedIntervalJoin _),
    "q_e7_stream_ridge" -> (streamedRidge _),
    "q_w9_range_frame" -> (rangeFrameWeek _),
    "q_w14_salted_trailing" -> (saltedTrailing _),
    "q_w15_block_cumsum" -> (blockCumsumDaily _),
    "q_w1_lag_features" -> (lagFeatures _),
    "q_w2_rolling_stats" -> (rollingStats _),
    "q_w4_rolling_median" -> (rollingMedian _),
    "q_w5_diff_features" -> (diffFeatures _),
    "q_w6_ma_baseline" -> (maBaseline _),
    "q_w4b_percentile_approx" -> (percentileApprox _),
    "q_w4c_papprox_window" -> (percentileApproxWindow _),
    "q_t1_tokens" -> (textTokens _),
    "q_t2_quality" -> (textQuality _),
    "q_t3_langid" -> (textLangId _),
    "q_t4_shingles" -> (textShingles _),
    "q_t5_fingerprints" -> (textFingerprints _),
    "q_d3_dedup_fingerprint" -> (dedupFingerprint _),
    "q_dd1_jaccard_top" -> (jaccardTop _),
    "q_dd1b_jaccard_capped" -> (jaccardTopCapped _),
    "q_dd2_minhash_pairs" -> (minhashPairs _),
    "q_dd2b_minhash_recall" -> (minhashRecall _),
    "q_dd9_incremental_dedup" -> (incrementalDedupBatch _),
    "q_dd10_semantic_dedup" -> (semanticDedup _),
    "q_dd10b_semantic_kmeans" -> (semanticDedupKmeans _),
    "q_dd3_simhash_pairs" -> (simhashPairs _),
    "q_dd3b_simhash_recall" -> (simhashRecall _),
    "q_dd3c_simhash_telemetry" -> (simhashTelemetry _),
    "q_dd4_embed_neardup" -> (embedNearDup _),
    "q_j6_asof_clicks" -> (asofClicks _),
    "q_j7_interval_clicks" -> (intervalClicks _),
    "q_a15_profile" -> (columnProfile _),
    "q_a16_histogram" -> (valueHistogram _),
    "q_a17_pivot" -> (dowPivot _),
    "q_e2_sessions" -> (eventSessions _),
    "q_t6_bm25" -> (bm25TopK _),
    "q_p9_hash_sample" -> (hashSample _),
    "q_p11_weighted_sample" -> (weightedSample _),
    "q_p12_kfold" -> (kfoldSplit _),
    "q_p13_temperature_mix" -> (temperatureMix _),
    "q_p14_perplexity_mix" -> (perplexityMix _),
    "q_p15_group_split" -> (groupSplit _),
    "q_w8_group_topk" -> (groupTopK _),
    "q_o5_det_shuffle" -> (detShuffle _),
    "q_o6_salted_agg" -> (saltedCountryKpi _),
    "q_dd6_dup_clusters" -> (dupClusterLabels _),
    "q_dd8_star_clusters" -> (dupClusterLabelsStar _),
    "q_dd7_edit_verify" -> (editDistanceVerify _),
    "q_dd11_fuzzy_pipeline" -> (fuzzyDedupPipeline _),
    "q_dd12_fuzzy_clusters" -> (fuzzyDedupClusters _),
    "q_dd13_lsh_recall" -> (lshRecallEval _),
    "q_j8_bucketed_join" -> (bucketedOrdersJoin _),
    "q_j9_shuffle_hash" -> (joinShuffleHash _),
    "q_j13_bloom_join" -> (bloomPrunedJoin _),
    "q_j10_join_full" -> (joinFull _),
    "q_o7_sort_offset" -> (sortOffset _),
    "q_o8_content_checksum" -> (contentChecksum _),
    "q_a23_exact_median" -> (exactMedianNosort _),
    "q_f8_hashes" -> (hashFunctions _),
    "q_dd5_embed_pairs_top" -> (embedPairsTop _),
    "q_tp1_clean_corpus" -> (cleanCorpus _),
    "q_tp2_clean_clustered" -> (cleanCorpusClustered _),
    "q_tp3_clean_decontaminated" -> (cleanCorpusDecontaminated _),
    "q_tp4_passage_dedup" -> (passageDedup _),
    "q_tp9_span_dedup" -> (spanDedup _),
    "q_tp10_span_scrub" -> (spanScrub _),
    "q_tp11_clean_scrubbed" -> (cleanCorpusScrubbed _),
    "q_tp5_training_dataset" -> (trainingDataset _),
    "q_tp6_cdc_passage_dedup" -> (cdcPassageDedup _),
    "q_ml1_forecast_kpi" -> (mlForecastKpi _),
    "q_ml2_ols_fit" -> (olsFit _),
    "q_ml3_ridge_fit" -> (ridgeMultiFit _),
    "q_ml4_ridge_lags" -> (ridgeLagFit _),
    "q_ml5_ridge_scorecard" -> (ridgeScorecard _),
    "q_t5b_hash64_groups" -> (hash64Groups _),
    "q_t7_pii_scrub" -> (piiScrub _),
    "q_t8_repetition" -> (textRepetition _),
    "q_p10_mix_sample" -> (mixSample _),
    "q_ann1_cosine_topk" -> (annCosineTopK _),
    "q_ann2_lsh_topk" -> (annLshTopK _),
    "q_ann3_ivf_topk" -> (annIvfTopK _),
    "q_ann4_centroids" -> (labelCentroids _),
    "q_ann5_pq_topk" -> (annPqTopK _),
    "q_ann6_hard_negatives" -> (annHardNegatives _),
    "q_ann7_int8_topk" -> (annInt8TopK _),
    "q_ann8_ivfpq_topk" -> (annIvfPqTopK _),
    "q_ann9_ivf_incremental" -> (annIvfIncrementalTopK _),
    "q_ann10_recall_curve" -> (annIvfRecallCurve _),
    "q_r1_hybrid_rrf" -> (hybridRrf _),
    "q_r2_hybrid_ivf" -> (hybridRrfIvf _),
    "q_mm1_blob_meta" -> (blobMeta _),
    "q_mm2_frame_sample" -> (frameSample _),
    "q_mm3_audio_meta" -> (audioMeta _),
    "q_mm6_audio_features" -> (audioFeatures _),
    "q_mm4_resize_features" -> (resizeFeatures _),
    "q_mm5_video_demux" -> (videoDemux _),
    "q_mm7_image_dedup" -> (imageHashDedup _),
    "q_mm8_audio_dedup" -> (audioHashDedup _),
    "q_mm9_pair_curation" -> (imageTextPairs _),
    "q_mm10_image_neardup" -> (imageNearDups _),
    "q_mm11_video_dedup" -> (videoHashDedup _)
  )

  val all: Map[String, Q] = raw.map { case (name, fn) =>
    name -> ((s: SparkSession, d: String) => normalizeTemporal(fn(s, d)))
  }
}
