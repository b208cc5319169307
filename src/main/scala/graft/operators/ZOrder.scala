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
  * The z-value is computed with built-in expressions only (sequence +
  * aggregate lambda — fully codegen'd, no UDF): bit k of x lands at
  * position 2k, bit k of y at 2k+1. Power-of-two arithmetic is done in
  * double (exact for the ≤20-bit inputs used here: doubles are exact to
  * 2^53), which keeps the identical formula expressible in the DuckDB
  * oracle — any interleave bug hash-mismatches.
  */
object ZOrder {

  /** Morton code of two non-negative int columns, `bits` bits each
    * (bits ≤ 26 keeps every intermediate exact in double). */
  def zValue(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 26, s"bits must be in [1,26], got $bits")
    aggregate(
      sequence(lit(0), lit(bits - 1)),
      lit(0.0),
      (acc, k) => {
        val p2 = pow(lit(2.0), k)
        val p4 = pow(lit(4.0), k)
        val xb = pmod(floor(x.cast("double") / p2), lit(2.0))
        val yb = pmod(floor(y.cast("double") / p2), lit(2.0))
        acc + xb * p4 + yb * p4 * lit(2.0)
      }).cast("long")
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
