package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact order statistics without a global sort.
  *
  * `percentile()` / ORDER BY materialize and sort the whole column — at
  * 100 TB that is the one shuffle you cannot pay for a single number.
  * Histogram narrowing finds the EXACT rank-r element in O(log_bins(n))
  * passes: bin the current candidate range into 1024 buckets (one
  * map-side-combined aggregate, 1024 rows to the driver), descend into
  * the bucket containing rank r, repeat until ≤ `cutoff` candidates
  * remain, then resolve those exactly. Driver state is one 1024-row
  * histogram per pass — the IVF-quantizer-style bounded exception to the
  * no-collect rule. 600k rows need one pass; 10¹² rows need four.
  *
  * Bucket membership is re-derived from the SAME floor expression each
  * pass (a predicate stack, not a float range filter), so boundary
  * rounding cannot misclassify a value between passes, and the result is
  * bit-identical to a full sort's rank-r element — which is what the
  * DuckDB oracle computes.
  */
object OrderStats {

  /** The exact `rank`-th smallest (1-based) value of column `c`. */
  def exactRank(
      df: DataFrame,
      c: String,
      rank: Long,
      bins: Int = 1024,
      cutoff: Long = 4096): Double = {
    val x = col(c).cast("double")
    var pred: Column = col(c).isNotNull
    var r = rank
    // each pass recomputes the TRUE min/max/count of the surviving
    // population (piggybacked on the histogram job's filter): a bin full
    // of one duplicated value collapses to lo == hi and exits, instead of
    // shrinking width toward underflow forever
    var stats = df.filter(pred).agg(min(x), max(x), count(lit(1))).head()
    var lo = stats.getDouble(0)
    var hi = stats.getDouble(1)
    var cnt = stats.getLong(2)
    require(rank >= 1 && rank <= cnt, s"rank $rank out of [1, $cnt]")
    while (cnt > cutoff && lo < hi && (hi - lo) / bins > 0.0) {
      val width = (hi - lo) / bins
      val idx = least(floor((x - lit(lo)) / lit(width)), lit((bins - 1).toDouble))
      val hist = df.filter(pred)
        .groupBy(idx.as("b")).agg(count(lit(1)).as("n"))
        .collect()
        .map(row => row.getDouble(0) -> row.getLong(1))
        .sortBy(_._1)
      var cum = 0L
      var chosen = -1.0
      for ((b, nb) <- hist if chosen < 0) {
        if (cum + nb >= r) { chosen = b; r -= cum }
        else cum += nb
      }
      pred = pred && (idx === lit(chosen))
      stats = df.filter(pred).agg(min(x), max(x), count(lit(1))).head()
      lo = stats.getDouble(0)
      hi = stats.getDouble(1)
      cnt = stats.getLong(2)
    }
    if (lo == hi) lo
    else {
      val vals = df.filter(pred).select(x.as("v")).orderBy(col("v")).take(r.toInt)
      vals(r.toInt - 1).getDouble(0)
    }
  }
}
