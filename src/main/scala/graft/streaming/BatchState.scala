package graft.streaming

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Disk-derived state recovery for foreachBatch state maintainers (the
  * q_e11/q_e14/q_e15 pattern: per-batch `state<id>` parquet snapshots next
  * to batchId-named outputs).
  *
  * Why disk-derived: a closure `var stateDir` dies with the driver — after
  * a crash the restarted stream would silently rebuild state from nothing.
  * Deriving each batch's input state from the NEWEST `_SUCCESS`-committed
  * `state<id>` dir with id < batchId makes the maintainer both
  * restart-correct (the resumed run picks up exactly where the committed
  * state left off) and retry-idempotent (a re-delivered batchId reads the
  * state BEFORE itself — never its own crashed half-write, which carries
  * no `_SUCCESS` — and overwrites its own outputs deterministically).
  * StreamingSpec kills a stream between batches, restarts it from the
  * checkpoint, and replays a committed batchId to prove both properties.
  *
  * All listing/existence checks go through the Hadoop FileSystem resolved
  * from the root path itself, so the recovery semantics hold on any
  * supported store (local, HDFS, object stores with an FS connector) —
  * the state root and the stream checkpoint should live on the same
  * fault-tolerant store in a cluster deployment.
  */
object BatchState {

  private def hadoopConf: Configuration =
    SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
      .map(_.sessionState.newHadoopConf())
      .getOrElse(new Configuration())

  /** The newest committed state dir under `root` with id < `beforeId`
    * (parquet commit marker `_SUCCESS` required — a crashed half-written
    * snapshot is invisible). Returns a fully-qualified path string
    * readable by `spark.read.parquet`. */
  def latestState(root: String, beforeId: Long): Option[String] = {
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(hadoopConf)
    if (!fs.exists(rootPath)) None
    else fs.listStatus(rootPath).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("state"))
      .flatMap { st =>
        scala.util.Try(st.getPath.getName.stripPrefix("state").toLong).toOption
          .map(id => (id, st.getPath))
      }
      .filter { case (id, p) =>
        id < beforeId && fs.exists(new Path(p, "_SUCCESS"))
      }
      .sortBy(_._1)
      .lastOption
      .map(_._2.toString)
  }
}
