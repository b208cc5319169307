package graft.report

import org.apache.spark.sql.DataFrame

/** Report sinks replacing the reference's matplotlib PNGs (S5, SURVEY §2.1):
  * the same aggregate tables, written as partitioned parquet or single-file
  * CSV. Plots are presentation; the query semantics end here.
  */
object ReportSink {

  /** Columnar sink for downstream analytics; optional partition columns
    * (e.g. Country) so per-segment readers prune at the directory level. */
  def parquet(df: DataFrame, path: String, partitionBy: Seq[String] = Seq.empty): Unit = {
    val w = df.write.mode("overwrite")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path)
  }

  /** Small human-readable exports (KPI scorecards): a single CSV with header.
    * coalesce(1) is deliberate — these frames are tiny aggregates. */
  def csv(df: DataFrame, path: String): Unit =
    df.coalesce(1).write.mode("overwrite").option("header", "true").csv(path)
}
