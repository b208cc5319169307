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
}
