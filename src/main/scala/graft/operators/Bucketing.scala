package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table layout for repeated co-located joins (SURVEY §7.5: prefer
  * bucketing on the hot join keys at scale).
  *
  * Writing both sides bucketed (and sorted) by the join key means every
  * subsequent join on that key is Exchange-free: each task zips bucket i of
  * both tables — the shuffle is paid once at write time instead of on every
  * query. At 100 TB this converts the dominant recurring cost (re-shuffling
  * a fact table per join) into a one-time layout decision.
  */
object Bucketing {

  def writeBucketed(
      df: DataFrame,
      table: String,
      key: String,
      buckets: Int): Unit =
    df.write
      .mode("overwrite")
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)

  /** Join two bucketed tables on their bucket key — planner sees matching
    * hash-distributions and elides both Exchanges. */
  def colocatedJoin(
      spark: SparkSession,
      left: String,
      right: String,
      key: String): DataFrame =
    spark.table(left).join(spark.table(right), Seq(key))
}
