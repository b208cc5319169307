package graft

import org.apache.spark.sql.DataFrame

/** Lineage truncation policy for every operator-internal materialization
  * point in the library.
  *
  * Operators cut lineage where a frame is reused by later stages or an
  * iterative loop would otherwise stack plans (shingle tables, signature
  * stores, CC iterations, k-means rounds, BPE merge rounds, ...). The
  * default cut is `localCheckpoint` — cheapest, no external storage — but
  * its blocks live on the executors that computed them, and a LOST executor
  * takes them along unrecoverably. Loss includes SOFT loss: at the 1000x
  * local-cluster tier an executor's full-GC pause outran the heartbeat
  * timeout, the driver declared it dead, and the q_dd6 pair-graph build
  * died with CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND even though the JVM never
  * crashed (PERF.md round-14). That failure cannot be fixed at one call
  * site: ANY of the library's truncation points is a landmine once
  * executor loss is live.
  *
  * So the policy is session-level: set [[Lineage.CheckpointDirConf]] to a
  * fault-tolerant path (HDFS/object store on a real cluster) and EVERY
  * truncation point in the library switches to a RELIABLE `checkpoint`
  * there — recomputable through executor loss, identical results
  * (spec-asserted). Leave it unset (the default, and the gate/bench shape)
  * and truncation stays `localCheckpoint`. Operators that take an explicit
  * `checkpointDir` argument (the CC loops, PageRank/HITS) honor the
  * argument first and fall back to this conf.
  */
object Lineage {

  /** Session conf key: a fault-tolerant directory for reliable lineage
    * truncation. Unset = localCheckpoint (executor-local blocks). */
  val CheckpointDirConf = "spark.graft.checkpointDir"

  /** The conf'd reliable dir, if any. */
  def confDir(df: DataFrame): Option[String] =
    Option(df.sparkSession.conf.get(CheckpointDirConf, null)).filter(_.nonEmpty)

  /** Cut `df`'s lineage and materialize it eagerly under the session's
    * truncation policy. */
  def truncate(df: DataFrame): DataFrame =
    confDir(df) match {
      case Some(dir) =>
        df.sparkSession.sparkContext.setCheckpointDir(dir)
        df.checkpoint(true)
      case None =>
        df.localCheckpoint(true)
    }

  /** Chained form: `frame.join(...).truncateLineage()`. */
  implicit class TruncateOps(private val df: DataFrame) extends AnyVal {
    def truncateLineage(): DataFrame = Lineage.truncate(df)
  }
}
