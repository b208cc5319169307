package graft.ml

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MlSpec extends SparkSpec {
  import spark.implicits._

  /** Synthetic daily frame with a known linear signal:
    * qty = 3*lag_qty_1_day + noiseless. */
  private lazy val frame = {
    val rows = for {
      c <- Seq("A", "B"); p <- Seq("X", "Y"); i <- 1 to 40
    } yield (c, p, java.sql.Date.valueOf(f"2024-01-${(i % 28) + 1}%02d"),
      (i + 1).toLong * 3, i.toLong)
    rows.toDF("Country", "StockCode", "InvoiceDate", "NetDailyQuantity", "lag_qty_1_day")
  }

  test("feature pipeline indexes categoricals and assembles vectors; skip drops null rows") {
    val extra = Seq(("C", "Z", "2024-02-01", 5L))
      .toDF("Country", "StockCode", "d", "NetDailyQuantity")
      .withColumn("InvoiceDate", to_date(col("d"))).drop("d")
      .withColumn("lag_qty_1_day", lit(null).cast("long"))
      .select(frame.columns.map(col): _*)
    val withNull = frame.union(extra)
    val fitted = ForecastModels.featurePipeline(Seq("lag_qty_1_day")).fit(withNull)
    val out = fitted.transform(withNull)
    assert(out.columns.contains("features"))
    // handleInvalid=skip silently drops the null-feature row (reference behavior)
    assert(out.count() === frame.count())
  }

  test("featurePipelineOn (multi-col indexer, foreign fit frame) matches featurePipeline exactly") {
    // the fast path must produce bit-identical indices + vectors: one
    // multi-column indexer pass over the pre-feature frame vs the two
    // reference-literal single-column fits over the feature frame
    val literal = ForecastModels.featurePipeline(Seq("lag_qty_1_day")).fit(frame)
    val fast = ForecastModels.featurePipelineOn(
      Seq("lag_qty_1_day"), frame.drop("lag_qty_1_day"), frame)
    val key = Seq("Country", "StockCode", "InvoiceDate").map(col)
    val a = literal.transform(frame)
      .select(key :+ col("CountryIndex") :+ col("StockCodeIndex") :+ col("features").cast("string"): _*)
      .orderBy(key: _*).collect().map(_.toSeq)
    val b = fast.transform(frame)
      .select(key :+ col("CountryIndex") :+ col("StockCodeIndex") :+ col("features").cast("string"): _*)
      .orderBy(key: _*).collect().map(_.toSeq)
    assert(a.toSeq === b.toSeq)
  }

  test("fitPredict returns the same predictions as trainAndEval without the eval passes") {
    val features = ForecastModels.featurePipeline(Seq("lag_qty_1_day")).fit(frame)
    val (predEval, _) = ForecastModels.trainAndEval(
      "lr_test", ForecastModels.lasso(0.0), features, frame, frame)
    val pred = ForecastModels.fitPredict(ForecastModels.lasso(0.0), features, frame, frame)
    val key = Seq("Country", "StockCode", "InvoiceDate").map(col)
    val a = predEval.select(key :+ col("prediction"): _*).orderBy(key: _*).collect().map(_.toSeq)
    val b = pred.select(key :+ col("prediction"): _*).orderBy(key: _*).collect().map(_.toSeq)
    assert(a.toSeq === b.toSeq)
  }

  test("lasso recovers a noiseless linear relation and evaluates near-perfect") {
    val features = ForecastModels.featurePipeline(Seq("lag_qty_1_day")).fit(frame)
    val (pred, metrics) = ForecastModels.trainAndEval(
      "lr_test", ForecastModels.lasso(0.0), features, frame, frame)
    assert(metrics.r2 > 0.999, s"r2 was ${metrics.r2}")
    assert(metrics.mae < 1.0)
    assert(pred.columns.contains("prediction"))
  }

  test("segmented harness trains per segment and recombines with unionByName") {
    val (pred, metrics) = ForecastModels.segmented(
      Seq(
        "seg_a" -> ((df: org.apache.spark.sql.DataFrame) => df.filter(col("Country") === "A")),
        "seg_rest" -> ((df: org.apache.spark.sql.DataFrame) => df.filter(col("Country") =!= "A"))),
      () => ForecastModels.lasso(0.0),
      Seq("lag_qty_1_day"),
      frame, frame)
    assert(metrics.map(_.name) === Seq("seg_a", "seg_rest"))
    assert(pred.count() === frame.count())
    metrics.foreach(m => assert(m.r2 > 0.99))
  }

  test("coefficient ranking orders features by absolute weight") {
    val features = ForecastModels.featurePipeline(Seq("lag_qty_1_day")).fit(frame)
    val model = ForecastModels.lasso(0.0).fit(features.transform(frame))
    val ranked = ForecastModels.coefficientRanking(
      model, Seq("lag_qty_1_day", "CountryIndex", "StockCodeIndex"))
    assert(ranked.head._1 === "lag_qty_1_day")
    assert(math.abs(ranked.head._2 - 3.0) < 0.05)
  }

  test("reference model presets carry the documented hyperparameters") {
    val lr = ForecastModels.lasso(0.05)
    assert(lr.getMaxIter === 20 && lr.getElasticNetParam === 1.0 && lr.getRegParam === 0.05)
    val rf = ForecastModels.randomForest(100)
    assert(rf.getNumTrees === 100 && rf.getMaxDepth === 5 &&
      rf.getMaxBins === 10000 && rf.getSeed === 42)
    val g = ForecastModels.gbt(100, 0.05)
    assert(g.getLossType === "absolute" && g.getMaxIter === 100 && g.getStepSize === 0.05)
  }
}
