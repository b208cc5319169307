package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The Exact helpers' whole point is partition-order independence: the same
  * values in any partitioning must aggregate to the same double bits. */
class ExactSpec extends SparkSpec {
  import spark.implicits._

  private val samples: Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(42)
    Seq.fill(10)(Seq.fill(40)(math.rint((rnd.nextDouble() - 0.5) * 2e8) / 100))
  }

  test("dsum equals the BigDecimal reference and is partition-invariant") {
    samples.foreach { xs =>
      val expected = xs.map(x => BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP))
        .sum.toDouble
      val one = xs.toDF("x").repartition(1).agg(Exact.dsum(col("x"))).head.getDouble(0)
      val many = xs.toDF("x").repartition(7).agg(Exact.dsum(col("x"))).head.getDouble(0)
      assert(one === expected)
      assert(many === expected)
    }
  }

  test("floorAvg is partition-invariant and within 10^-scale of the true mean") {
    samples.foreach { xs =>
      val one = xs.toDF("x").repartition(1).agg(Exact.floorAvg(col("x"), 9)).head.getDouble(0)
      val many = xs.toDF("x").repartition(7).agg(Exact.floorAvg(col("x"), 9)).head.getDouble(0)
      assert(one === many) // bit-identical across partitionings
      val truth = xs.sum / xs.size
      assert(math.abs(one - truth) < 1e-6)
    }
  }
}
