package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) layout clustering — multi-dimensional data skipping.
  *
  * A 100 TB table is pruned by per-file zone maps (parquet column min/max):
  * a scan skips a file when the filter range misses the file's bounding
  * box. Sorting by one column gives perfect skipping on THAT column and
  * none on any other; interleaving the bits of two columns (the Morton /
  * Z-curve) bounds every file to a small rectangle in BOTH dimensions, so
  * a 2-D box filter touches only the files whose rectangle intersects the
  * box — the mechanism behind Delta/Iceberg `OPTIMIZE ZORDER BY`.
  *
  * The z-value is computed with built-in expressions only — the per-bit
  * terms are UNROLLED at plan-build time into plain arithmetic (a
  * higher-order `aggregate` lambda would be evaluated interpreted;
  * unrolled expressions stay inside whole-stage codegen — measured 3.3s →
  * sub-second on 150k rows). Bit k of x lands at position 2k, bit k of y
  * at 2k+1. Power-of-two arithmetic is done in double (exact for the
  * ≤20-bit inputs used here: doubles are exact to 2^53), which keeps the
  * identical formula expressible in the DuckDB oracle — any interleave
  * bug hash-mismatches.
  */
object ZOrder {

  /** Morton code of two non-negative int columns, `bits` bits each
    * (bits ≤ 26 keeps every intermediate exact in double). */
  def zValue(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 26, s"bits must be in [1,26], got $bits")
    val xd = x.cast("double")
    val yd = y.cast("double")
    (0 until bits).map { k =>
      val p2 = lit(math.pow(2.0, k.toDouble))
      val p4 = lit(math.pow(4.0, k.toDouble))
      pmod(floor(xd / p2), lit(2.0)) * p4 +
        pmod(floor(yd / p2), lit(2.0)) * p4 * lit(2.0)
    }.reduce(_ + _).cast("long")
  }

  /** Writes `df` clustered on the z-curve of `(xCol, yCol)`: range-
    * partitioned and sorted within partitions by z-value, so each output
    * file covers one contiguous z-range ⇒ a bounded rectangle in (x, y).
    * `numFiles` controls layout granularity (more files = tighter
    * rectangles = better skipping, versus file-count overhead). */
  def writeZOrdered(
      df: DataFrame,
      xCol: String,
      yCol: String,
      bits: Int,
      path: String,
      numFiles: Int): String = {
    df.withColumn("__z", zValue(col(xCol), col(yCol), bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
    path
  }
}
