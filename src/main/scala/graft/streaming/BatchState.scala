package graft.streaming

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
  */
object BatchState {

  /** The newest committed state dir under `root` with id < `beforeId`
    * (parquet commit marker `_SUCCESS` required — a crashed half-written
    * snapshot is invisible). */
  def latestState(root: String, beforeId: Long): Option[String] = {
    val dirs = Option(new java.io.File(root).listFiles()).toSeq.flatten
    dirs
      .filter(f => f.isDirectory && f.getName.startsWith("state"))
      .flatMap { f =>
        scala.util.Try(f.getName.stripPrefix("state").toLong).toOption
          .map(id => (id, f))
      }
      .filter { case (id, f) =>
        id < beforeId && new java.io.File(f, "_SUCCESS").exists()
      }
      .sortBy(_._1)
      .lastOption
      .map(_._2.getAbsolutePath)
  }
}
