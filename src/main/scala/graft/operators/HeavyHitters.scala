package graft.operators

import org.apache.spark.sql.Dataset

/** Exact heavy hitters by two-phase Misra–Gries.
  *
  * A plain `groupBy(token).count()` shuffles one record per DISTINCT
  * token — at 100 TB of text that is billions of keys crossing the wire
  * to find the handful that matter. Misra–Gries bounds phase one to k
  * counters per partition (`mapPartitions` — genuine per-partition
  * imperative state, the documented last-resort case): any token with
  * global count > N/k must exceed its partition share n_p/k somewhere
  * (pigeonhole), and MG guarantees such a token ends phase one with a
  * live counter there. The candidate union (≤ k × partitions keys,
  * partitioning-DEPENDENT) is then recounted EXACTLY via a broadcast
  * semi-join — only candidate tokens cross the shuffle — and the final
  * `count > N/k` filter makes the result partitioning-INVARIANT: extra
  * candidates are counted and discarded, and no true heavy hitter can be
  * missing. Output equals the direct global filter bit for bit, which is
  * what the DuckDB oracle checks.
  */
object HeavyHitters {

  /** Phase one: per-partition Misra–Gries summaries, k counters each.
    * Returns a candidate SUPERSET of every token with global count >
    * N/k (with duplicates across partitions; distinct downstream). */
  def candidates(toks: Dataset[String], k: Int): Dataset[String] = {
    import toks.sparkSession.implicits._
    toks.mapPartitions { it =>
      val m = scala.collection.mutable.HashMap.empty[String, Long]
      it.foreach { t =>
        m.get(t) match {
          case Some(c) => m.update(t, c + 1)
          case None if m.size < k => m.update(t, 1L)
          case None =>
            // decrement-all: the new token and one unit of every counter
            // cancel (k+1 distinct tokens ate one unit each)
            val kept = m.iterator
              .collect { case (key, c) if c > 1 => key -> (c - 1) }
              .toArray
            m.clear()
            m ++= kept
        }
      }
      m.keysIterator
    }
  }
}
