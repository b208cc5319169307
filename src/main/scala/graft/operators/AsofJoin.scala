package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, the single most recent right row with
  * `rightTime <= leftTime` on the same key — the operator behind
  * "state as of event time" lookups (latest price at trade time, last click
  * before purchase). Spark has no native ASOF; the naive formulations are a
  * range join (quadratic blow-up on hot keys) or a per-key collect. This is
  * the scalable composition: tag both sides, union, and take a running
  * `last(_, ignoreNulls)` over a (key)-partitioned window ordered by
  * (time, tag) — ONE hash shuffle + per-key sort, state O(1) per row, no
  * pair expansion, AQE-skew-splittable like any window. Ties
  * (rightTime == leftTime) are inclusive: the right row sorts first.
  *
  * `right` must be unique per (key, rightTime) — pre-aggregate if not —
  * otherwise "the" most recent row is ill-defined (same contract as
  * DuckDB/kdb ASOF).
  *
  * Output: every left column, plus for each payload column `p` a column
  * `asof_p` carrying the matched right row's value (null when no right row
  * precedes the left row — left-outer semantics), plus `asof_time` = the
  * matched rightTime.
  */
object AsofJoin {

  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      payload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    require(!leftCols.contains("asof_time"), "left already has asof_time")

    val l = left
      .withColumn("__t", col(leftTime))
      .withColumn("__tag", lit(1))
      .withColumn("__rt", lit(null).cast(right.schema(rightTime).dataType))
      .select(
        (keys.map(col) :+ col("__t") :+ col("__tag") :+ col("__rt")) ++
          leftCols.filterNot(keys.contains).map(col) ++
          payload.map(p => lit(null).cast(right.schema(p).dataType).as(s"__p_$p")): _*)
    val r = right
      .withColumn("__t", col(rightTime))
      .withColumn("__tag", lit(0))
      .withColumn("__rt", col(rightTime))
      .select(
        (keys.map(col) :+ col("__t") :+ col("__tag") :+ col("__rt")) ++
          leftCols.filterNot(keys.contains)
            .map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
          payload.map(p => col(p).as(s"__p_$p")): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t"), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried: Seq[Column] =
      last(col("__rt"), ignoreNulls = true).over(w).as("asof_time") +:
        payload.map(p => last(col(s"__p_$p"), ignoreNulls = true).over(w).as(s"asof_$p"))

    l.unionByName(r)
      .select(col("*") +: carried: _*)
      .filter(col("__tag") === 1)
      .select(leftCols.map(col) ++
        (col("asof_time") +: payload.map(p => col(s"asof_$p"))): _*)
  }
}
