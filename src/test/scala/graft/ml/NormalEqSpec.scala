package graft.ml

import org.apache.spark.sql.functions._

import graft.SparkSpec

class NormalEqSpec extends SparkSpec {
  import spark.implicits._

  // Exact planted model: y = 7 + 3*x1 - 2*x2 + x3 over an integer grid whose
  // design matrix is well-conditioned and whose label is integral — OLS
  // (λ = 0) must recover the coefficients up to IEEE rounding of the solve.
  private lazy val planted = (for {
    x1 <- 0 to 9; x2 <- 0 to 6; x3 <- 0 to 4
  } yield ("g", x1, x2, x3, 7L + 3L * x1 - 2L * x2 + x3))
    .toDF("grp", "x1", "x2", "x3", "y")

  test("OLS (lambda=0) recovers a planted integer-linear model") {
    val fit = NormalEq.ridgeFit(
      planted, Seq("grp"), Seq(col("x1"), col("x2"), col("x3")), col("y"), lambda = 0L)
      .head()
    val betas = (0 to 3).map(i => fit.getDouble(fit.fieldIndex(s"beta_$i")))
    val expected = Seq(7.0, 3.0, -2.0, 1.0)
    betas.zip(expected).foreach { case (b, e) =>
      assert(math.abs(b - e) < 1e-9, s"beta $b vs $e")
    }
    assert(fit.getLong(fit.fieldIndex("n")) === 10L * 7L * 5L)
  }

  test("fit is bit-identical under repartitioning (exact sufficient statistics)") {
    def run(df: org.apache.spark.sql.DataFrame): Seq[Double] = {
      val r = NormalEq.ridgeFit(
        df, Seq("grp"), Seq(col("x1"), col("x2"), col("x3")), col("y"), lambda = 10L)
        .head()
      (0 to 3).map(i => r.getDouble(r.fieldIndex(s"beta_$i")))
    }
    val a = run(planted)
    val b = run(planted.repartition(13))
    val c = run(planted.repartition(3))
    assert(a === b)
    assert(a === c)
  }

  test("ridge penalty shrinks coefficients toward zero, never flips the sign structure") {
    def run(lambda: Long): Seq[Double] = {
      val r = NormalEq.ridgeFit(
        planted, Seq("grp"), Seq(col("x1"), col("x2"), col("x3")), col("y"), lambda)
        .head()
      (1 to 3).map(i => r.getDouble(r.fieldIndex(s"beta_$i")))
    }
    val ols = run(0L)
    val ridge = run(10000L)
    ols.zip(ridge).foreach { case (o, r) =>
      assert(math.abs(r) < math.abs(o), s"ridge $r not shrunk vs OLS $o")
      assert(o * r > 0, "sign flipped under ridge")
    }
  }

  test("elimination formula text is engine-neutral arithmetic on named columns") {
    // Guard the oracle contract: formulas may only reference m-stage / beta
    // columns with -, /, *, parentheses — no function calls, no literals
    // except the names themselves (any drift here would silently break the
    // DuckDB mirror's parse-identity with Spark).
    val stages = NormalEq.eliminationStages(5)
    val allNames = stages.flatten.map(_._1)
    assert(allNames.distinct.size === allNames.size, "duplicate intermediate names")
    stages.flatten.foreach { case (_, e) =>
      assert(e.matches("[a-z0-9_\\s\\-/*()]+"), s"non-neutral token in: $e")
    }
    assert(allNames.takeRight(5) === Seq("beta_4", "beta_3", "beta_2", "beta_1", "beta_0"))
  }
}
