package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Closed-form multi-feature ridge regression via exact normal equations —
  * the deterministic counterpart to MLlib's iterative solvers (the
  * reference's headline model is a multi-feature Lasso fit,
  * Sales_forecast_pyspark.py:1159-1169, whose OWL-QN path is
  * convergence-dependent and therefore not oracle-checkable bit-for-bit).
  *
  * The design: with integer-valued features x and an integer label y, every
  * entry of XᵀX and Xᵀy is an exact DECIMAL(38,0) sum of long products —
  * order-independent, so ONE map-side-combinable hash aggregate per group
  * (the same shuffle cost as a GROUP BY) yields bit-identical sufficient
  * statistics at any parallelism. The (k+1)×(k+1) ridge system
  * (XᵀX + λ·diag(0,1,…,1))β = Xᵀy is then solved by Gaussian elimination
  * WITHOUT pivoting — valid because the ridge matrix is symmetric positive
  * definite, whose leading principal minors are all positive, so every pivot
  * is nonzero and the elimination is numerically stable (this is the
  * LDLᵀ/Cholesky stability argument; pivot-free matters because a data-
  * dependent pivot ORDER would break cross-engine determinism).
  *
  * Both the Spark side and the DuckDB oracle evaluate THE SAME generated
  * formula text ([[eliminationStages]]) over the same exact-integer inputs:
  * fixed-order IEEE +,-,*,/ on identical doubles is bit-identical in any
  * engine, so a multi-feature FIT becomes hash-oracle-checkable — the
  * momentStats pattern (Corpus.scala q_a20) lifted from scalar statistics to
  * a linear system.
  *
  * 100 TB story: the only non-map-side work is the per-group stats shuffle;
  * the solve runs on the aggregated frame (one row per group) as plain
  * column arithmetic — no driver collect, no iteration, no extra scan.
  */
object NormalEq {

  private val dec = DecimalType(38, 0)

  /** Name of the augmented-matrix entry (row i, column j, elimination stage
    * s); j == k+1 columns index the RHS. Stage 0 is symmetric by
    * construction, so lower-triangle references resolve to the stored upper
    * triangle. (Later stages materialize both triangles explicitly: Gaussian
    * updates preserve symmetry only in exact arithmetic — a - (b/c)*d and
    * a - (d/c)*b round differently in IEEE.) */
  private def nm(s: Int, i: Int, j: Int): String =
    if (s == 0 && j < i) s"m0_${j}_$i" else s"m${s}_${i}_$j"

  /** Ordered stages of (columnName, formulaText) pairs solving the k-variable
    * augmented system m0_i_j (0 ≤ i < k rows, 0 ≤ j ≤ k columns, j = k is
    * the RHS) for beta_0 … beta_{k-1}. Formula text is valid — and parses to
    * the same fixed-order arithmetic — in both Spark SQL and DuckDB:
    * `a - b / c * d` is (a − ((b/c)·d)) in both, and every referenced column
    * is DOUBLE, so evaluation is pure IEEE-754 and engine-independent.
    * Within a stage, formulas only reference columns of EARLIER stages
    * (DuckDB consumes each stage as one CTE; Spark as one projection). */
  def eliminationStages(k: Int): Seq[Seq[(String, String)]] = {
    val elim = (0 until k - 1).map { p => // pivot row p produces stage p+1
      for {
        i <- (p + 1) until k
        j <- (p + 1) to k
      } yield s"m${p + 1}_${i}_$j" ->
        s"${nm(p, i, j)} - ${nm(p, i, p)} / ${nm(p, p, p)} * ${nm(p, p, j)}"
    }
    // Back-substitution, one stage per beta (each references later betas):
    // row i is final after its last update at stage i.
    val backsub = ((k - 1) to 0 by -1).map { i =>
      val terms = ((i + 1) until k).map(j => s" - ${nm(i, i, j)} * beta_$j").mkString
      Seq(s"beta_$i" -> s"(${nm(i, i, k)}$terms) / ${nm(i, i, i)}")
    }
    elim ++ backsub
  }

  /** Per-group exact sufficient statistics for the ridge system, already
    * cast to the DOUBLE inputs of [[eliminationStages]]: m0_i_j = Σ zᵢzⱼ
    * (+ λ on non-intercept diagonals), m0_i_k = Σ zᵢ·y, with z = (1,
    * features…). All sums are DECIMAL(38,0) over long products — exact and
    * order-independent; doubles are taken only at the boundary (every sum
    * here is ≪ 2⁵³ at any plausible scale, so the cast is value-exact and
    * identical to DuckDB's HUGEINT→DOUBLE cast). */
  def ridgeStats(
      df: DataFrame,
      groupKeys: Seq[String],
      features: Seq[Column],
      y: Column,
      lambda: Long): DataFrame = {
    val z: Seq[Column] = lit(1L) +: features.map(_.cast("long"))
    val k = z.size
    val yl = y.cast("long")
    val sums =
      (for { i <- 0 until k; j <- i to k } yield {
        val prod = if (j == k) z(i) * yl else z(i) * z(j)
        sum(prod.cast(dec)).as(s"s_${i}_$j")
      }) ++ Seq(sum((yl * yl).cast(dec)).as("s_yy"), count(lit(1)).as("n"))
    val stats = df.groupBy(groupKeys.map(col): _*).agg(sums.head, sums.tail: _*)
    val doubles =
      (for { i <- 0 until k; j <- i to k } yield {
        val base = col(s"s_${i}_$j")
        val entry = if (i == j && i > 0) base + lit(lambda) else base
        entry.cast("double").as(s"m0_${i}_$j")
      }) :+ col("s_yy").cast("double").as("m_yy")
    stats.select(groupKeys.map(col) ++ Seq(col("n")) ++ doubles: _*)
  }

  /** Fit-quality diagnostics from the SAME sufficient statistics — no
    * second data pass: SSE = yᵀy − 2βᵀXᵀy + βᵀXᵀXβ (the ridge diagonal's λ
    * is subtracted back out of the quadratic term so the error is the true
    * residual), SST about the mean, R², RMSE. Like [[eliminationStages]],
    * the text is engine-neutral fixed-order arithmetic (plus CAST and sqrt,
    * both IEEE-identical in Spark and DuckDB), so a per-group model
    * SCORECARD — fit AND evaluation — is hash-oracle-checkable for the
    * shuffle price of one aggregate. */
  def diagnosticsFormulas(k: Int, lambda: Long): Seq[(String, String)] = {
    val xty = (0 until k).map(i => s"beta_$i * ${nm(0, i, k)}").mkString(" + ")
    val quad = (for { i <- 0 until k; j <- i until k } yield {
      if (i == j && i == 0) s"beta_0 * beta_0 * m0_0_0"
      else if (i == j) s"beta_$i * beta_$i * (m0_${i}_$i - $lambda)"
      else s"2 * beta_$i * beta_$j * ${nm(0, i, j)}"
    }).mkString(" + ")
    Seq(
      "sse" -> s"m_yy - 2 * ($xty) + ($quad)",
      "sst" -> s"m_yy - ${nm(0, 0, k)} / CAST(n AS DOUBLE) * ${nm(0, 0, k)}",
      "r2" -> "1 - sse / sst",
      "rmse" -> "sqrt(sse / CAST(n AS DOUBLE))")
  }

  /** The solve half alone: applies the generated elimination (and optional
    * diagnostics) to a frame that already carries the n/m0_i_j[/m_yy]
    * columns. Separate from [[ridgeFit]] so the stats half can run
    * elsewhere — e.g. as an INCREMENTAL Structured Streaming aggregate
    * whose per-key state is exactly the fixed-size statistics vector. */
  def solveStats(
      stats: DataFrame,
      k: Int,
      groupKeys: Seq[String],
      lambda: Long,
      diagnostics: Boolean = false): DataFrame = {
    val diag =
      if (diagnostics) diagnosticsFormulas(k, lambda).map(Seq(_)) else Nil
    val stages = eliminationStages(k) ++ diag
    val solved = stages.foldLeft(stats) {
      (acc, stage) => acc.selectExpr("*" +: stage.map { case (n, e) => s"$e AS $n" }: _*)
    }
    val extra = if (diagnostics) diagnosticsFormulas(k, lambda).map(_._1) else Nil
    solved.select(
      (groupKeys :+ "n").map(col) ++ (0 until k).map(i => col(s"beta_$i"))
        ++ extra.map(col): _*)
  }

  /** Full fit: exact stats → generated elimination → one beta column per
    * design coordinate (beta_0 is the intercept). With `diagnostics`, the
    * scorecard columns (sse, sst, r2, rmse) ride along — still zero extra
    * passes over the data. */
  def ridgeFit(
      df: DataFrame,
      groupKeys: Seq[String],
      features: Seq[Column],
      y: Column,
      lambda: Long,
      diagnostics: Boolean = false): DataFrame =
    solveStats(
      ridgeStats(df, groupKeys, features, y, lambda),
      features.size + 1, groupKeys, lambda, diagnostics)

  /** DuckDB mirror of the solve: one CTE per elimination stage over a stats
    * CTE named `stats` that must expose the same `n` and `m0_i_j` DOUBLE
    * columns (plus the group keys). Returns the full `WITH`-suffix text:
    * ",e1 AS (…), e2 AS (…) SELECT keys, n, betas FROM eN ORDER BY keys". */
  def oracleSolveSql(
      k: Int,
      groupKeys: Seq[String],
      lambda: Long = 10L,
      diagnostics: Boolean = false): String = {
    val diag =
      if (diagnostics) diagnosticsFormulas(k, lambda).map(Seq(_)) else Nil
    val stages = eliminationStages(k) ++ diag
    val ctes = stages.zipWithIndex.map { case (stage, idx) =>
      val from = if (idx == 0) "stats" else s"e$idx"
      val cols = stage.map { case (n, e) => s"$e AS $n" }.mkString(",\n         ")
      s"e${idx + 1} AS (\n  SELECT *,\n         $cols\n  FROM $from)"
    }
    val keyPrefix = if (groupKeys.isEmpty) "" else groupKeys.mkString(", ") + ", "
    val orderBy = if (groupKeys.isEmpty) "" else s" ORDER BY ${groupKeys.mkString(", ")}"
    val outCols = (0 until k).map(i => s"beta_$i") ++
      (if (diagnostics) diagnosticsFormulas(k, lambda).map(_._1) else Nil)
    s""",${ctes.mkString(",\n")}
       |SELECT ${keyPrefix}n, ${outCols.mkString(", ")}
       |FROM e${stages.size}$orderBy""".stripMargin
  }
}
