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

  def run(
      spark: SparkSession,
      dir: String,
      cutoff: String,
      models: Seq[String]): Report = {
    val daily = Forecast.dailySales(Tables.salesLines(spark, dir))
    val features = featureFrame(daily).cache()
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
