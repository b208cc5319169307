package graft.forecast

import graft.SparkSpec

/** E2E replay on sf0.001: the full reference flow must run and produce a
  * coherent scorecard (finite metrics, sensible split, KPI columns). */
class ReferencePipelineSpec extends SparkSpec {

  test("full pipeline replays end-to-end on sf0.001 with LR") {
    val r = ReferencePipeline.run(
      spark, "/root/testdata/sf0.001", cutoff = "1999-09-01", models = Seq("lr"))
    assert(r.trainRows > 0 && r.testRows > 0)
    // ~64/36 style time split (reference proportions are cutoff-dependent;
    // just require both sides substantial)
    assert(r.testRows.toDouble / (r.trainRows + r.testRows) > 0.2)
    val lr = r.scorecards.head
    assert(lr.name === "lr_v2")
    assert(!lr.mae.isNaN && lr.mae > 0)
    assert(!lr.rmse.isNaN && lr.rmse >= lr.mae)
    assert(!r.maeModel.isNaN && !r.maeBaseline.isNaN)
    assert(!r.valueWeightedReductionPct.isNaN)
  }
}
