package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BloomPruneSpec extends SparkSpec {
  import spark.implicits._

  private lazy val fact = (0L until 10000L).map(k => (k, k % 97)).toDF("fk", "payload")
  private lazy val dim = (0L until 10000L by 200L).toDF("dk") // 50 keys

  test("pruned fact is a superset of matches and (far) smaller than the input") {
    val pruned = BloomPrune.pruneFact(fact, "fk", dim, "dk")
    val exact = fact.join(dim, col("fk") === col("dk"), "left_semi")
    val nPruned = pruned.count()
    val nExact = exact.count()
    assert(nExact === 50L)
    assert(nPruned >= nExact, "bloom must never drop a true match")
    // fpp=0.01 over 10k probes ⇒ ~100 false positives expected; 10x slack.
    assert(nPruned <= nExact + 1000, s"pruned $nPruned — filter not selective")
    // No true match lost: semi-join of pruned == semi-join of full.
    assert(pruned.join(dim, col("fk") === col("dk"), "left_semi")
      .exceptAll(exact).isEmpty)
  }

  test("probe compiles to the native might_contain predicate, not a UDF") {
    // Parquet-backed input: a LocalRelation would let the optimizer fold
    // the probe away before the physical plan exists.
    val plan = graft.queries.Corpus.bloomPrunedJoin(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), s"expected might_contain in:\n$plan")
    assert(!plan.contains("BatchEvalPython") && !plan.contains("UDF"),
      s"probe fell out of codegen:\n$plan")
  }

  test("bloom-pruned exact join equals the plain join on the corpus query") {
    val d = "/root/testdata/sf0.001"
    val viaBloom = graft.queries.Corpus.bloomPrunedJoin(spark, d).collect()
    val li = graft.Tables.lineitem(spark, d)
    val o = graft.Tables.orders(spark, d)
      .filter(col("o_orderpriority") === "1-URGENT" && year(col("o_orderdate")) === 1997)
    val plain = li.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(month(col("o_orderdate")).as("Month"))
      .agg(
        sum(col("l_quantity").cast("long")).as("total_qty"),
        graft.functions.Exact.dsum(col("l_extendedprice")).as("total_price"),
        count(lit(1)).as("n_lines"))
      .orderBy("Month").collect()
    assert(viaBloom.toSeq === plain.toSeq)
  }
}
