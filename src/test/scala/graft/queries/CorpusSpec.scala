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
      "q_dd2_minhash_pairs", "q_dd3_simhash_pairs",
      "q_ann2_lsh_topk", "q_ann3_ivf_topk") // hash/LSH/quantizer internals
    // (q_dd4_embed_neardup is oracle-checked: injected clone pairs make the
    // LSH result exactly SQL-expressible — see Corpus.embedNearDup)
    assert(rowsOnly === expected, s"unexpected rows-only set: $rowsOnly")
  }

  test("flagship entry query returns rows on sf0.001") {
    val df = graft.SparkEntry.entry(spark)
    assert(df.count() > 0)
  }
}
