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

  test("global fit (no group keys) solves the same system and emits no key columns") {
    val global = NormalEq.ridgeFit(
      planted, Nil, Seq(col("x1"), col("x2"), col("x3")), col("y"), lambda = 0L)
    assert(global.columns.toSeq === Seq("n", "beta_0", "beta_1", "beta_2", "beta_3"))
    val r = global.head()
    // single group "g" covers all rows, so the grouped and global fits agree
    val grouped = NormalEq.ridgeFit(
      planted, Seq("grp"), Seq(col("x1"), col("x2"), col("x3")), col("y"), lambda = 0L)
      .head()
    (0 to 3).foreach { i =>
      assert(r.getDouble(r.fieldIndex(s"beta_$i")) ===
        grouped.getDouble(grouped.fieldIndex(s"beta_$i")))
    }
    // and the oracle text for the global case carries no dangling commas
    val sql = NormalEq.oracleSolveSql(4, Nil)
    assert(!sql.contains("SELECT ,") && !sql.contains("ORDER BY"))
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

  test("diagnostics: perfect planted fit has SSE ~ 0 and R2 ~ 1; noisy fit degrades them") {
    val fit = NormalEq.ridgeFit(
      planted, Seq("grp"), Seq(col("x1"), col("x2"), col("x3")), col("y"),
      lambda = 0L, diagnostics = true).head()
    def g(c: String) = fit.getDouble(fit.fieldIndex(c))
    assert(math.abs(g("sse")) < 1e-6, s"sse ${g("sse")}")
    assert(math.abs(g("r2") - 1.0) < 1e-9, s"r2 ${g("r2")}")
    assert(g("sst") > 0)
    assert(g("rmse") < 1e-4)
    // corrupt half the labels: R² must drop below 1, SSE/RMSE grow positive
    val noisy = planted.withColumn(
      "y", when(col("x1") % 2 === 0, col("y") * 3 + 17).otherwise(col("y")))
    val nf = NormalEq.ridgeFit(
      noisy, Seq("grp"), Seq(col("x1"), col("x2"), col("x3")), col("y"),
      lambda = 0L, diagnostics = true).head()
    def ng(c: String) = nf.getDouble(nf.fieldIndex(c))
    assert(ng("sse") > 1.0 && ng("rmse") > 0.1)
    assert(ng("r2") < 0.999 && ng("r2") > 0.0)
  }

  test("diagnostics formulas subtract the ridge penalty back out of the quadratic term") {
    // with heavy lambda the betas shrink, but SSE must still measure the
    // TRUE residual of those betas (not the penalized objective): recompute
    // SSE row-wise from the fitted betas and compare
    val fit = NormalEq.ridgeFit(
      planted, Seq("grp"), Seq(col("x1"), col("x2"), col("x3")), col("y"),
      lambda = 5000L, diagnostics = true).head()
    def g(c: String) = fit.getDouble(fit.fieldIndex(c))
    val (b0, b1, b2, b3) = (g("beta_0"), g("beta_1"), g("beta_2"), g("beta_3"))
    val rows = planted.select("x1", "x2", "x3", "y").collect()
    val sse = rows.map { r =>
      val pred = b0 + b1 * r.getInt(0) + b2 * r.getInt(1) + b3 * r.getInt(2)
      val e = r.getLong(3) - pred
      e * e
    }.sum
    assert(math.abs(g("sse") - sse) / sse < 1e-9, s"${g("sse")} vs row-wise $sse")
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
