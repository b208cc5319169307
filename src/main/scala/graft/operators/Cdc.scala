package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-data-capture / warehouse-maintenance operators.
  *
  * The 100 TB framing: a table of that size is never rebuilt — it is
  * *maintained*. The primitives a maintenance pipeline needs beyond
  * [[Output.mergeUpsert]] are (1) versioned-dimension construction from a
  * changelog (SCD Type 2), (2) snapshot diffing (what changed between two
  * table states), and (3) incremental aggregate maintenance (apply a
  * changeset to a materialized rollup without rescanning the base). All
  * three are declarative single-shuffle shapes — windows partitioned by
  * the business key, one co-partitioned join, or a union + re-aggregate
  * over |groups| + |delta| rows.
  */
object Cdc {

  /** Builds a Type-2 slowly-changing dimension from a changelog.
    *
    * Input: one row per observed state `(keys, orderCol, attrs…)`. Output:
    * one row per *distinct consecutive version* with `effective_from` /
    * `effective_to` / `is_current` validity columns — consecutive rows
    * whose tracked attributes are unchanged are compressed into the
    * earlier version (the standard SCD2 no-op-change collapse).
    *
    * Scale shape: both windows (the LAG change-compression and the LEAD
    * validity stitch) share the same `partitionBy(keys)` ordering, so
    * Catalyst plans ONE shuffle + sort and evaluates both frames on it;
    * partitions are per-business-key and tiny. No self-join, no collect.
    */
  def scd2(
      log: DataFrame,
      keys: Seq[String],
      orderCol: String,
      attrs: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(orderCol))
    val changed = attrs
      .map(a => !(col(a) <=> lag(col(a), 1).over(w)))
      .reduce(_ || _)
    val out = keys.map(col) ++ attrs.map(col) ++ Seq(
      col(orderCol).as("effective_from"),
      lead(col(orderCol), 1).over(w).as("effective_to"))
    log
      .withColumn("__chg", changed)
      .where(col("__chg"))
      .select(out: _*)
      .withColumn("is_current", col("effective_to").isNull)
  }

  /** Diffs two snapshots of the same table: emits one row per key whose
    * payload changed, with `change_type` ∈ insert / delete / update and
    * the old/new payload side by side. Keys present in both snapshots
    * with bit-identical payloads are dropped.
    *
    * Scale shape: one co-partitioned full-outer equi-join — the honest
    * minimum for a diff where both sides are large (neither side can
    * broadcast, unlike the mergeUpsert changeset). Writing both
    * snapshots bucketed on the key ([[Bucketing]]) makes it
    * shuffle-free. Null-safe comparison (`<=>`) so null payloads diff
    * correctly.
    */
  def snapshotDiff(
      oldDf: DataFrame,
      newDf: DataFrame,
      keys: Seq[String]): DataFrame = {
    val payload = oldDf.columns.filterNot(keys.contains).toSeq
    val o = payload.foldLeft(oldDf)((df, c) => df.withColumnRenamed(c, s"old_$c"))
      .withColumn("__old", lit(true))
    val n = payload.foldLeft(newDf)((df, c) => df.withColumnRenamed(c, s"new_$c"))
      .withColumn("__new", lit(true))
    val same = payload
      .map(c => col(s"old_$c") <=> col(s"new_$c"))
      .reduceOption(_ && _).getOrElse(lit(true))
    o.join(n, keys, "full_outer")
      .withColumn("change_type",
        when(col("__old").isNull, "insert")
          .when(col("__new").isNull, "delete")
          .otherwise("update"))
      .where(col("__old").isNull || col("__new").isNull || !same)
      .select(keys.map(col) ++ Seq(col("change_type")) ++
        payload.flatMap(c => Seq(col(s"old_$c"), col(s"new_$c"))): _*)
  }

  /** Applies a delta to a materialized additive rollup without touching
    * the base table: `newAgg = reAgg(oldAgg ∪ delta)`. The delta carries
    * signed contributions (negative before-images for updated/deleted
    * rows, positive after-images for updated/inserted rows); every
    * aggregate must be additive (SUM / COUNT as SUM(±1)). Cost is
    * |groups| + |delta| rows — independent of the base table size, which
    * is the entire point at 100 TB.
    *
    * Columns: `oldAgg` and `delta` must both be `(groupCols…, valueCols…)`
    * with identical names; the result re-sums every value column.
    */
  def applyDelta(
      oldAgg: DataFrame,
      delta: DataFrame,
      groupCols: Seq[String]): DataFrame = {
    val vals = oldAgg.columns.filterNot(groupCols.contains).toSeq
    oldAgg.unionByName(delta.select(oldAgg.columns.map(col): _*))
      .groupBy(groupCols.map(col): _*)
      .agg(vals.map(c => sum(col(c)).as(c)).head,
        vals.tail.map(c => sum(col(c)).as(c)): _*)
  }
}
