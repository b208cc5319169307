package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for heavy aggregation keys (SURVEY §4.3: UK ≈ 86% of the
  * reference's rows — the #1 hazard when one grouping key dominates).
  *
  * [[saltedAgg]] is the classic two-phase shape: explode each input row's key
  * with a deterministic salt (hash-based, so re-runs agree), pre-aggregate on
  * (key, salt) — spreading a hot key over `salts` reducers — then combine the
  * partials on the bare key. With algebraic aggregates (sum/count/min/max and
  * the Exact decimal sums) the result is exactly the single-phase answer;
  * AQE's skew handling covers joins, this covers the aggregation side.
  */
object Skew {

  case class SaltedAggSpec(
      partial: Seq[Column], // phase-1 aggregates over (keys :+ salt)
      merge: Seq[Column]) // phase-2 combiners over keys

  /** sum/count/min/max pairs for common cases: (partial, merge) both keyed by
    * the output name. */
  def sumLong(c: String, out: String): (Column, Column) =
    (sum(col(c)).as(out), sum(col(out)).as(out))
  def countAll(out: String): (Column, Column) =
    (count(lit(1)).as(out), sum(col(out)).as(out))
  def minOf(c: String, out: String): (Column, Column) =
    (min(col(c)).as(out), min(col(out)).as(out))
  def maxOf(c: String, out: String): (Column, Column) =
    (max(col(c)).as(out), max(col(out)).as(out))

  def saltedAgg(
      df: DataFrame,
      keys: Seq[String],
      aggs: Seq[(Column, Column)],
      salts: Int = 16): DataFrame = {
    require(aggs.nonEmpty)
    // deterministic salt from the full row's hash — no RNG, re-runs identical
    val salted = df.withColumn(
      "_salt", pmod(hash(df.columns.map(col): _*), lit(salts)))
    val phase1 = salted
      .groupBy((keys :+ "_salt").map(col): _*)
      .agg(aggs.head._1, aggs.tail.map(_._1): _*)
    phase1
      .groupBy(keys.map(col): _*)
      .agg(aggs.head._2, aggs.tail.map(_._2): _*)
  }
}
