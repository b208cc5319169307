package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  private lazy val keys =
    (Seq.fill(100)(7L) ++ Seq.fill(40)(13L) ++ (100L until 160L)).toDF("k")

  test("count-min never undercounts, and heavy keys stay near-exact") {
    val sketch = Sketches.countMin(keys, "k")
    val exact = keys.groupBy("k").agg(count(lit(1)).as("exact_n"))
    val est = Sketches.cmsEstimate(sketch, exact, "k")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(est.nonEmpty)
    est.foreach { case (k, ex, cms) => assert(cms >= ex, s"undercount for key $k") }
    val heavy = est.find(_._1 == 7L).get
    assert(heavy._2 === 100L)
    assert(heavy._3 >= 100L)
  }

  test("probing a key absent from the build set estimates 0 via its empty cells") {
    import spark.implicits._
    val sketch = Sketches.countMin(Seq(1L, 2L, 3L).toDF("k"), "k")
    // 3 keys fill at most 3 of 64 buckets per row — an unseen key almost
    // surely hits an empty cell in at least one of the 4 rows.
    val est = Sketches.cmsEstimate(sketch, Seq(999999L).toDF("k"), "k").collect()
    assert(est.length === 1, "absent keys must not vanish from the output")
    assert(est.head.getLong(1) === 0L)
  }

  test("sketch is bounded by depth x width cells and mergeable by cell-wise addition") {
    val a = (0L until 500L).toDF("k")
    val b = (250L until 750L).toDF("k")
    val sa = Sketches.countMin(a, "k")
    val sb = Sketches.countMin(b, "k")
    assert(sa.count() <= 4 * 64)
    // merged sketch (cell-wise sum of partials) == sketch of the union: the
    // algebraic property that lets partitions/days/streams combine.
    val merged = sa.unionByName(sb).groupBy("j", "bucket").agg(sum("c").as("c"))
    val direct = Sketches.countMin(a.unionByName(b), "k")
    assert(merged.exceptAll(direct).isEmpty && direct.exceptAll(merged).isEmpty)
  }

  test("keys outside [0, 2^31) raise loudly instead of silently wrapping") {
    // Negative keys and keys >= 2^31 are where Spark's int64 multiply
    // wraps while the DuckDB oracle errors — the guard must surface the
    // divergence as an error, not a wrong bucket.
    for (bad <- Seq(-1L, 1L << 31)) {
      val ex = intercept[Exception] {
        Sketches.countMin(Seq(bad).toDF("k"), "k").collect()
      }
      def msgs(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ msgs(e.getCause))
      assert(msgs(ex).exists(_.contains("count-min key outside")), s"key $bad: $ex")
    }
    // boundary values still hash normally
    val ok = Sketches.countMin(Seq(0L, (1L << 31) - 1).toDF("k"), "k")
    assert(ok.agg(sum("c")).head.getLong(0) === 2L * 4)
  }

  test("cmsEstimate tolerates probe columns named j/bucket/c") {
    val sketch = Sketches.countMin(keys, "k")
    val probes = Seq((7L, 1, 2, 3)).toDF("k", "j", "bucket", "c")
    val out = Sketches.cmsEstimate(sketch, probes, "k").collect()
    assert(out.length === 1 && out.head.schema.fieldNames.contains("cms_n"))
  }

  test("cmsEstimate broadcasts the sketch: probe side plans no sketch-side shuffle") {
    val sketch = Sketches.countMin(keys, "k")
    val plan = Sketches.cmsEstimate(sketch, keys.distinct(), "k")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join in:\n$plan")
  }
}
