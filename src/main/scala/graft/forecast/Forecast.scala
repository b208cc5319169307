package graft.forecast

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import graft.functions.Exact

/** The reference's time-series feature/KPI operators, re-expressed as
  * composable DataFrame transforms.
  *
  * A "series" is the rows of one (Country, StockCode) partition ordered by
  * InvoiceDate (Sales_forecast_pyspark.py:607-608). The calendar is irregular:
  * lag 1 means the previous *observed* day, not the previous calendar day
  * (Sales_forecast_pyspark.py:613-625).
  *
  * Scale notes:
  *  - every window family with a distinct partitionBy forces one
  *    shuffle+sort; we use exactly two partitionings (series, series+DayOfWeek)
  *    and generate all columns of a family in ONE select so the plan stays
  *    flat (the reference does the same for its 72 lag columns,
  *    Sales_forecast_pyspark.py:610-647);
  *  - window partitions are (Country, StockCode) — fine-grained keys, so the
  *    shuffle spreads evenly and no single partition can exceed one series;
  *    country-level skew (the reference's UK ≈ 86% hazard, SURVEY §4.3) does
  *    not concentrate on one task because StockCode is part of the key.
  */
object Forecast {

  val SeriesKeys: Seq[String] = Seq("Country", "StockCode")

  def seriesW: WindowSpec =
    Window.partitionBy(SeriesKeys.map(col): _*).orderBy(col("InvoiceDate"))

  def dowW: WindowSpec =
    Window.partitionBy((SeriesKeys :+ "DayOfWeek").map(col): _*).orderBy(col("InvoiceDate"))

  /** Calendar features (Sales_forecast_pyspark.py:107-114). Spark's dayofweek
    * is 1=Sunday..7=Saturday. */
  def withCalendar(df: DataFrame): DataFrame =
    df.select(
      col("*"),
      year(col("InvoiceDate")).as("Year"),
      month(col("InvoiceDate")).as("Month"),
      dayofmonth(col("InvoiceDate")).as("Day"),
      weekofyear(col("InvoiceDate")).as("Week"),
      dayofweek(col("InvoiceDate")).as("DayOfWeek"))

  /** The defining daily aggregation (A3, Sales_forecast_pyspark.py:147-164):
    * one row per (Country, StockCode, day) with net quantity, revenue and mean
    * unit price. Grouping keys include the calendar columns (functionally
    * dependent on InvoiceDate, kept for downstream feature use). */
  def dailySales(sales: DataFrame): DataFrame = {
    val keys = Seq("Country", "StockCode", "InvoiceDate",
      "Year", "Month", "Day", "Week", "DayOfWeek")
    withCalendar(sales)
      .groupBy(keys.map(col): _*)
      .agg(
        sum(col("Quantity")).as("NetDailyQuantity"),
        Exact.dsum(col("LineRevenue")).as("NetDailyRevenue"),
        Exact.davg(col("UnitPrice")).as("AvgUnitPrice"))
  }

  /** Lag features (W1, Sales_forecast_pyspark.py:605-647): for each lag i,
    * quantity and price lags over the plain series order, the 6-day cycle
    * (offset 6i), and the same-weekday series. Nulls (insufficient history)
    * are coalesced to 0 as in the reference. All columns in ONE select. */
  def lagFeatures(daily: DataFrame, lags: Seq[Int] = 1 to 6): DataFrame = {
    val qty = col("NetDailyQuantity")
    val price = col("AvgUnitPrice")
    val lagCols = lags.flatMap { i =>
      Seq(
        coalesce(lag(qty, i).over(seriesW), lit(0L)).as(s"lag_qty_${i}_day"),
        coalesce(lag(price, i).over(seriesW), lit(0.0)).as(s"lag_price_${i}_day"),
        coalesce(lag(qty, 6 * i).over(seriesW), lit(0L)).as(s"lag_qty_${i}_6cycle"),
        coalesce(lag(price, 6 * i).over(seriesW), lit(0.0)).as(s"lag_price_${i}_6cycle"),
        coalesce(lag(qty, i).over(dowW), lit(0L)).as(s"lag_qty_${i}_dow"),
        coalesce(lag(price, i).over(dowW), lit(0.0)).as(s"lag_price_${i}_dow"))
    }
    daily.select(daily.columns.map(col).toSeq ++ lagCols: _*)
  }

  /** Rolling mean/std/median over the trailing frame [-n, -1] (current row
    * excluded), per W2/W3/W4 (Sales_forecast_pyspark.py:900-946).
    *
    * std uses the explicit sample formula over exact integer sums rather than
    * stddev_samp so the result is bit-reproducible regardless of partition
    * merge order (quantities are longs: sum and sum-of-squares are exact).
    * median uses exact `percentile` — on integer inputs interpolation is
    * exact in double, unlike percentile_approx which the reference used
    * (Sales_forecast_pyspark.py:922) and which we expose separately. */
  def rollStats(w: WindowSpec, frame: Int, suffix: String): Seq[Column] = {
    val qty = col("NetDailyQuantity")
    val f = w.rowsBetween(-frame, -1)
    val n = count(qty).over(f).cast(DoubleType)
    val s1 = sum(qty).over(f).cast(DoubleType)
    val s2 = sum(qty * qty).over(f).cast(DoubleType)
    val mean = s1 / n
    val std = when(n >= 2, sqrt((s2 - s1 * s1 / n) / (n - lit(1.0))))
    val med = percentile(qty, lit(0.5)).over(f)
    Seq(mean.as(s"roll_mean_$suffix"), std.as(s"roll_std_$suffix"), med.as(s"roll_median_$suffix"))
  }

  def rollingFeatures(
      daily: DataFrame,
      dayFrames: Seq[Int] = Seq(3, 6, 12),
      dowFrames: Seq[Int] = Seq(3, 4, 5)): DataFrame = {
    val cols = daily.columns.map(col).toSeq ++
      dayFrames.flatMap(n => rollStats(seriesW, n, s"${n}d")) ++
      dowFrames.flatMap(n => rollStats(dowW, n, s"${n}_dow"))
    daily.select(cols: _*)
  }

  /** Diff-vs-rolling features (W5, Sales_forecast_pyspark.py:948-966):
    * current value minus the rolling mean/median, for the series frames and
    * (py:961-966) the same-weekday frames. */
  def diffFeatures(
      rolled: DataFrame,
      dayFrames: Seq[Int] = Seq(3, 6, 12),
      dowFrames: Seq[Int] = Seq()): DataFrame = {
    val qty = col("NetDailyQuantity").cast(DoubleType)
    val diffs = dayFrames.flatMap { n =>
      Seq(
        (qty - col(s"roll_mean_${n}d")).as(s"diff_qty_mean_${n}d"),
        (qty - col(s"roll_median_${n}d")).as(s"diff_qty_median_${n}d"))
    } ++ dowFrames.flatMap { n =>
      Seq(
        (qty - col(s"roll_mean_${n}_dow")).as(s"diff_qty_mean_${n}_dow"),
        (qty - col(s"roll_median_${n}_dow")).as(s"diff_qty_median_${n}_dow"))
    }
    rolled.select(rolled.columns.map(col).toSeq ++ diffs: _*)
  }

  // ---- referenceCompat: the reference's literal numeric surface -------------
  //
  // The default operators above substitute bit-reproducible constructions
  // (exact decimal sums, explicit sample-std, exact percentile) for oracle
  // parity. These compat variants reproduce the reference's LITERAL
  // arithmetic instead — its roundings, stddev_samp, percentile_approx and
  // column names — so the end-to-end replay is faithful to what a reference
  // user's frame actually contains.

  /** A3 with the reference's 2-decimal rounding of revenue and mean price in
    * the aggregate (round(sum(...), 2) / round(avg(...), 2),
    * Sales_forecast_pyspark.py:161-163). */
  def dailySalesCompat(sales: DataFrame): DataFrame = {
    val keys = Seq("Country", "StockCode", "InvoiceDate",
      "Year", "Month", "Day", "Week", "DayOfWeek")
    withCalendar(sales)
      .groupBy(keys.map(col): _*)
      .agg(
        sum(col("Quantity")).as("NetDailyQuantity"),
        round(sum(col("LineRevenue")), 2).as("NetDailyRevenue"),
        round(avg(col("UnitPrice")), 2).as("AvgUnitPrice"))
  }

  /** The reference's complete 36-column lag batch with its literal
    * round(coalesce(lag(...), 0), 0) wrap and column names
    * (lag_quantity_N and lag_price_N over day/6daycycle/dow families,
    * Sales_forecast_pyspark.py:611-647). All 36 columns in one select —
    * still exactly two window partitionings. */
  def lagFeaturesCompat(daily: DataFrame): DataFrame = {
    val qty = col("NetDailyQuantity")
    val price = col("AvgUnitPrice")
    val lagCols = (1 to 6).flatMap { i =>
      Seq(
        round(coalesce(lag(qty, i).over(seriesW), lit(0)), 0).as(s"lag_quantity_${i}_day"),
        round(coalesce(lag(price, i).over(seriesW), lit(0)), 0).as(s"lag_price_${i}_day"),
        round(coalesce(lag(qty, 6 * i).over(seriesW), lit(0)), 0).as(s"lag_quantity_${i}_6daycycle"),
        round(coalesce(lag(price, 6 * i).over(seriesW), lit(0)), 0).as(s"lag_price_${i}_6daycycle"),
        round(coalesce(lag(qty, i).over(dowW), lit(0)), 0).as(s"lag_quantity_${i}_dow"),
        round(coalesce(lag(price, i).over(dowW), lit(0)), 0).as(s"lag_price_${i}_dow"))
    }
    daily.select(daily.columns.map(col).toSeq ++ lagCols: _*)
  }

  /** The reference's literal rolling stats: avg / stddev_samp /
    * percentile_approx(0.5) over the trailing frame
    * (Sales_forecast_pyspark.py:900-946). */
  def rollStatsCompat(w: WindowSpec, frame: Int, suffix: String): Seq[Column] = {
    val qty = col("NetDailyQuantity")
    val f = w.rowsBetween(-frame, -1)
    Seq(
      avg(qty).over(f).as(s"roll_mean_$suffix"),
      stddev_samp(qty).over(f).as(s"roll_std_$suffix"),
      percentile_approx(qty, lit(0.5), lit(10000)).over(f).as(s"roll_median_$suffix"))
  }

  def rollingFeaturesCompat(
      daily: DataFrame,
      dayFrames: Seq[Int] = Seq(3, 6, 12),
      dowFrames: Seq[Int] = Seq(3, 4, 5)): DataFrame = {
    val cols = daily.columns.map(col).toSeq ++
      dayFrames.flatMap(n => rollStatsCompat(seriesW, n, s"${n}d")) ++
      dowFrames.flatMap(n => rollStatsCompat(dowW, n, s"${n}_dow"))
    daily.select(cols: _*)
  }

  /** 6-day moving-average baseline with last-value fallback (W6,
    * Sales_forecast_pyspark.py:1270-1294) — the forecast every model is
    * judged against. */
  def maBaseline(daily: DataFrame, window: Int = 6): DataFrame = {
    val qty = col("NetDailyQuantity")
    val f = seriesW.rowsBetween(-window, -1)
    val ma = sum(qty).over(f).cast(DoubleType) / count(qty).over(f).cast(DoubleType)
    daily.withColumn(
      "baseline_qty",
      coalesce(ma, lag(qty, 1).over(seriesW).cast(DoubleType)))
  }

  /** The six error columns over a frame that already carries `prediction`,
    * `baseline_qty` and the actual (Sales_forecast_pyspark.py:1339-1345).
    * APE divides by the actual — null-guarded at zero (the reference's
    * non-ANSI run yields Infinity there; we exclude instead, SURVEY §5.3). */
  def withErrorColumns(df: DataFrame): DataFrame = {
    val actual = col("NetDailyQuantity").cast(DoubleType)
    val safeActual = when(col("NetDailyQuantity") === 0, lit(null)).otherwise(actual)
    df
      .withColumn("err_model", col("prediction") - actual)
      .withColumn("err_baseline", col("baseline_qty") - actual)
      .withColumn("abs_err_model", abs(col("err_model")))
      .withColumn("abs_err_baseline", abs(col("err_baseline")))
      .withColumn("ape_model", abs(col("err_model")) / safeActual)
      .withColumn("ape_baseline", abs(col("err_baseline")) / safeActual)
  }

  /** Evaluation frame (Sales_forecast_pyspark.py:1296-1345): a prediction
    * column, the MA baseline, and the six error columns. `prediction`
    * defaults to the naive last-value forecast so the frame is fully
    * deterministic; ML models plug their own prediction column in via
    * [[evalAgainstBaseline]]. */
  def evalFrame(daily: DataFrame): DataFrame =
    withErrorColumns(
      maBaseline(daily)
        .withColumn("prediction", lag(col("NetDailyQuantity"), 1).over(seriesW).cast(DoubleType)))

  /** Evaluation join (J2 + error columns): model predictions ⟕ the MA
    * baseline on the composite (Country, StockCode, InvoiceDate) key, over
    * the full history (a test row's trailing baseline window legitimately
    * reaches into train days, as in the reference). */
  def evalAgainstBaseline(dailyAll: DataFrame, predictions: DataFrame): DataFrame = {
    val keys = Seq("Country", "StockCode", "InvoiceDate")
    val base = maBaseline(dailyAll)
      .select((keys :+ "baseline_qty").map(col): _*)
    val pred = predictions.select(
      (keys ++ Seq("NetDailyQuantity", "AvgUnitPrice", "prediction")).map(col): _*)
    withErrorColumns(pred.join(base, keys, "left"))
  }

  private def kpiAggs: Seq[Column] = Seq(
    Exact.floorAvg(col("abs_err_model"), 9).as("mae_model"),
    Exact.floorAvg(col("abs_err_baseline"), 9).as("mae_baseline"),
    Exact.floorAvg(col("ape_model"), 9).as("mape_model"),
    Exact.floorAvg(col("ape_baseline"), 9).as("mape_baseline"),
    Exact.floorAvg(col("err_model"), 9).as("bias_model"),
    Exact.floorAvg(col("err_baseline"), 9).as("bias_baseline"))

  /** Global KPI aggregate (A8, Sales_forecast_pyspark.py:1347-1359). */
  def kpiGlobal(eval_ : DataFrame): DataFrame =
    eval_.agg(kpiAggs.head, kpiAggs.tail: _*)

  /** Per-country KPI (A9, Sales_forecast_pyspark.py:1363-1375). */
  def kpiByCountry(eval_ : DataFrame): DataFrame =
    eval_.groupBy(col("Country")).agg(kpiAggs.head, kpiAggs.tail: _*)

  /** Value-weighted error totals (A10, Sales_forecast_pyspark.py:1792-1838):
    * abs error weighted by unit value, plus % reduction of model vs baseline. */
  def valueWeighted(eval_ : DataFrame): DataFrame =
    eval_
      .agg(
        Exact.floorSum(col("abs_err_model") * col("AvgUnitPrice"), 4).as("total_err_value_model"),
        Exact.floorSum(col("abs_err_baseline") * col("AvgUnitPrice"), 4).as("total_err_value_baseline"),
        count(lit(1)).as("n_rows"))
      .withColumn(
        "pct_reduction",
        (lit(1.0) - col("total_err_value_model") / col("total_err_value_baseline")) * lit(100.0))
}
