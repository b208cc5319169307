package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

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
  *
  * Storage story for reliable mode: the SparkContext checkpoint dir is
  * pointed at the conf'd path AT MOST ONCE per (session, value) — Spark
  * mints one UUID subdir per `setCheckpointDir` call, so re-pointing on
  * every truncation (the round-14 shape) would scatter files across one
  * subdir per call and silently re-target a dir the user set themselves.
  * Checkpoint files accumulate for the session's lifetime by default;
  * long-running reliable-mode sessions should either set
  * `spark.cleaner.referenceTracking.cleanCheckpoints=true` (the Spark
  * cleaner then deletes a checkpoint's files when its RDD is GC'd) or
  * clean the directory between pipeline runs.
  */
object Lineage {

  /** Session conf key: a fault-tolerant directory for reliable lineage
    * truncation. Unset = localCheckpoint (executor-local blocks). */
  val CheckpointDirConf = "spark.graft.checkpointDir"

  /** The conf'd reliable dir, if any. */
  def confDir(df: DataFrame): Option[String] =
    Option(df.sparkSession.conf.get(CheckpointDirConf, null)).filter(_.nonEmpty)

  // applicationId -> the dir this object last applied, so repeated
  // truncations never re-call setCheckpointDir (one UUID subdir per call)
  private val applied = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Point the context's checkpoint dir at `dir`, at most once per
    * (session, dir). In conf mode (`force = false`) a checkpoint dir that
    * is already set and was NOT set by this object (a user's own
    * `setCheckpointDir`) is left alone — reliable checkpoints then land
    * where the user pointed them. An operator's explicit `checkpointDir`
    * ARGUMENT passes `force = true`: the caller named a dir for this very
    * call, so it wins over any prior dir — but repeated calls with the
    * same dir still re-point only once. A CHANGED graft dir (conf
    * rewritten mid-session, or a different explicit argument) re-points:
    * the most recent graft-level request wins, one `setCheckpointDir`
    * call per switch. */
  private[graft] def ensureCheckpointDir(
      spark: SparkSession, dir: String, force: Boolean = false): Unit = {
    val sc = spark.sparkContext
    val prev = applied.put(sc.applicationId, dir)
    if (prev != dir && (force || prev != null || sc.getCheckpointDir.isEmpty))
      sc.setCheckpointDir(dir)
  }

  /** Cut `df`'s lineage and materialize it eagerly under the session's
    * truncation policy. */
  def truncate(df: DataFrame): DataFrame =
    confDir(df) match {
      case Some(dir) =>
        ensureCheckpointDir(df.sparkSession, dir)
        df.checkpoint(true)
      case None =>
        df.localCheckpoint(true)
    }

  /** Truncation for a frame whose blocks only need to outlive a SINGLE
    * query — intra-query reuse points (e.g. BM25's per-doc term
    * statistics) — always `localCheckpoint`, even under a reliable-mode
    * session. Losing such blocks fails just that query, and a plain job
    * retry recomputes them from source; writing them to the fault-tolerant
    * store would buy durability for data that is garbage the moment the
    * query returns. Reliable mode exists for frames that feed ITERATIVE
    * loops or multi-stage pipelines, where a mid-chain loss strands
    * minutes of upstream work — use [[truncate]] for those. */
  def truncateTransient(df: DataFrame): DataFrame = df.localCheckpoint(true)

  /** Chained form: `frame.join(...).truncateLineage()`. */
  implicit class TruncateOps(private val df: DataFrame) extends AnyVal {
    def truncateLineage(): DataFrame = Lineage.truncate(df)
    def truncateTransientLineage(): DataFrame = Lineage.truncateTransient(df)
  }
}
