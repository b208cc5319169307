package graft.queries

import graft.SparkSpec

class CorpusSpec extends SparkSpec {

  test("every oracle SQL entry has a matching query") {
    val missing = Oracle.sql.keySet -- Corpus.all.keySet
    assert(missing.isEmpty, s"oracle entries without queries: $missing")
  }

  test("rows-only queries (no oracle) are the documented non-SQL-expressible set") {
    val rowsOnly = Corpus.all.keySet -- Oracle.sql.keySet
    val expected = Set(
      "q_p8_sample",            // engine-specific RNG
      "q_a13_approx_distinct",  // HLL sketch
      "q_ml1_forecast_kpi",     // model fit (solver-dependent floats)
      "q_t5_fingerprints",      // custom hash exprs
      "q_dd2_minhash_pairs", "q_dd3_simhash_pairs") // hash/band internals
    // (q_dd4, q_dd2b, q_ann2, q_ann3 are oracle-checked: injected clones
    // make each LSH/IVF result exactly SQL-expressible — recall oracles, see
    // Corpus.embedNearDup / minhashRecall / withQueryClones)
    assert(rowsOnly === expected, s"unexpected rows-only set: $rowsOnly")
  }

  test("flagship entry query returns rows on sf0.001") {
    val df = graft.SparkEntry.entry(spark)
    assert(df.count() > 0)
  }

  test("trained quality classifier tracks the heuristic label it was fit on") {
    import org.apache.spark.sql.functions._
    val d = "/root/testdata/sf0.001"
    val scored = Corpus.all("q_t21_quality_classifier")(spark, d)
    val withLabel = scored.join(
      graft.Tables.documents(spark, d).select(
        col("doc_id"),
        graft.text.TextFunctions.qualityScore(col("text")).as("q")),
      Seq("doc_id"))
    // The ridge fit must carry real signal: docs the model keeps average a
    // clearly higher heuristic quality than docs it drops (the label proxy
    // it was trained toward on the 20% fold).
    val m = withLabel.groupBy("kept").agg(avg("q").as("mq"))
      .collect().map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    assert(m(true) > m(false) + 0.1, s"kept=${m(true)} vs dropped=${m(false)}")
    // And both gate outcomes actually occur.
    assert(m.size === 2)
  }
}
