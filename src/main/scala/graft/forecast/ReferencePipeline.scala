package graft.forecast

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{GraftSession, Tables}
import graft.ml.ForecastModels
import graft.ml.ForecastModels.RegMetrics

/** End-to-end replay of the reference pipeline (SURVEY §3.1-§3.3) on a
  * testdata scale-factor directory: daily aggregation → 105-column feature
  * build (lags + rolling + diffs, null-filled) → cache barrier → time split →
  * feature pipeline + regressors → three-metric scorecards → KPI evaluation
  * against the 6-day MA baseline (global, per-country, value-weighted).
  *
  * A user of the reference runs exactly this flow; `main` prints the same
  * scorecard shape the reference's README publishes.
  */
object ReferencePipeline {

  case class Report(
      trainRows: Long,
      testRows: Long,
      scorecards: Seq[RegMetrics],
      maeModel: Double,
      maeBaseline: Double,
      valueWeightedReductionPct: Double)

  /** Feature frame: calendar + 36 lag cols + 18 rolling + 6 diff, rolling
    * nulls filled with 0 (Sales_forecast_pyspark.py:968-982). */
  def featureFrame(daily: DataFrame): DataFrame = {
    val built = Forecast.diffFeatures(
      Forecast.rollingFeatures(Forecast.lagFeatures(daily)))
    val fillCols = built.columns.filter(c => c.startsWith("roll_") || c.startsWith("diff_"))
    built.na.fill(0.0, fillCols)
  }

  /** The reference's LITERAL full-width frame: its 36 rounded lag columns,
    * avg/stddev_samp/percentile_approx rolling stats over both window
    * families, and diffs against both families (12 diff cols) — 71 numeric
    * features which, with the two category indexers, form exactly the
    * 73-column assembler set of feature_columns_v3
    * (Sales_forecast_pyspark.py:611-647, 900-982, 1006-1061). */
  def featureFrameCompat(daily: DataFrame): DataFrame = {
    val built = Forecast.diffFeatures(
      Forecast.rollingFeaturesCompat(Forecast.lagFeaturesCompat(daily)),
      dayFrames = Seq(3, 6, 12),
      dowFrames = Seq(3, 4, 5))
    val fillCols = built.columns.filter(c => c.startsWith("roll_") || c.startsWith("diff_"))
    built.na.fill(0.0, fillCols)
  }

  def run(
      spark: SparkSession,
      dir: String,
      cutoff: String,
      models: Seq[String],
      referenceCompat: Boolean = false): Report =
    runOnSales(Tables.salesLines(spark, dir), cutoff, models, referenceCompat)

  /** Same replay on an already-ingested invoice-line frame (columns Country,
    * StockCode, InvoiceDate, Quantity, UnitPrice, LineRevenue) — the entry
    * point for the Online-Retail-shaped fixture (CsvSource → here is exactly
    * the reference's flow). */
  def runOnSales(
      sales: DataFrame,
      cutoff: String,
      models: Seq[String],
      referenceCompat: Boolean = false): Report = {
    val daily =
      if (referenceCompat) Forecast.dailySalesCompat(sales)
      else Forecast.dailySales(sales)
    val features =
      (if (referenceCompat) featureFrameCompat(daily) else featureFrame(daily)).cache()
    features.count() // cache barrier before the model fits (C1)

    val (train, test) = ForecastModels.timeSplit(features, cutoff)
    val (trainRows, testRows) = (train.count(), test.count())

    val featureCols = ForecastModels.numericFeatureCols(features)
    val fp = ForecastModels.featurePipeline(featureCols).fit(train)

    val fitted = models.map {
      case "lr" => ForecastModels.trainAndEval("lr_v2", ForecastModels.lasso(0.05), fp, train, test)
      case "rf" => ForecastModels.trainAndEval("rf_v3", ForecastModels.randomForest(100), fp, train, test)
      case "gbt" => ForecastModels.trainAndEval("gbt_v2", ForecastModels.gbt(100, 0.05), fp, train, test)
      case other => throw new IllegalArgumentException(s"unknown model: $other")
    }

    // KPI for the first model (the reference uses its best LR for the KPI cut)
    val evalDf = Forecast.evalAgainstBaseline(daily, fitted.head._1)
    val kpi = Forecast.kpiGlobal(evalDf).head()
    val vw = Forecast.valueWeighted(evalDf).head()
    features.unpersist() // every consumer above has materialized

    Report(
      trainRows, testRows,
      fitted.map(_._2),
      kpi.getAs[Double]("mae_model"),
      kpi.getAs[Double]("mae_baseline"),
      vw.getAs[Double]("pct_reduction"))
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001"))
    val models = if (args.length > 1) args(1).split(",").toSeq else Seq("lr")
    val cutoff = if (args.length > 2) args(2) else "1999-09-01"
    val spark = GraftSession.local(appName = "graft-pipeline")
    val r = run(spark, dir, cutoff, models)
    println(f"rows train=${r.trainRows} test=${r.testRows}")
    r.scorecards.foreach(m =>
      println(f"${m.name}%-8s MAE=${m.mae}%.4f RMSE=${m.rmse}%.4f R2=${m.r2}%.4f"))
    println(f"KPI MAE model=${r.maeModel}%.4f baseline=${r.maeBaseline}%.4f " +
      f"value-weighted reduction=${r.valueWeightedReductionPct}%.2f%%")
    spark.stop()
  }
}
