package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bounded-interval range join: pairs rows with equal keys where
  * `rightTime ∈ (leftTime - window, leftTime]` — the batch form of the
  * watermarked stream-stream interval join in graft.streaming.
  *
  * A raw inequality join has no equi-key, so Spark plans a broadcast
  * nested-loop (quadratic — the classic range-join scale failure). Binning
  * by the window width restores an equi-key: a right row in time-bin b can
  * only match left rows in bins {b, b+1}, so probing each left row against
  * its own and the previous bin — a constant fan-out of 2 — turns the join
  * into a shuffle hash join on (key, bin), linear at 100 TB, with the exact
  * interval predicate applied as a post-filter. Bins are assigned on
  * millisecond truncation, which keeps the {b-1, b} containment guarantee
  * for any window that is a whole number of milliseconds.
  *
  * Column names of `left` and `right` must be disjoint apart from `keys`
  * (rename before calling, as with any join).
  */
object RangeJoin {

  def intervalJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      windowMs: Long): DataFrame = {
    require(windowMs > 0, s"windowMs must be positive: $windowMs")
    // integer `div`, not FP division: an epsilon below an exact multiple
    // would floor into the wrong bin and silently drop a matching pair
    val bl = expr(s"unix_millis(`$leftTime`) div $windowMs")
    val br = expr(s"unix_millis(`$rightTime`) div $windowMs")
    val lb = left.withColumn("__bin", explode(array(bl - 1, bl)))
    val rb = right.withColumn("__bin", br)
    lb.join(rb, keys :+ "__bin", "inner")
      .filter(
        col(rightTime) <= col(leftTime) &&
          col(rightTime) > col(leftTime) - expr(s"INTERVAL $windowMs MILLISECOND"))
      .drop("__bin")
  }
}
