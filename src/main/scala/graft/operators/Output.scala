package graft.operators

import org.apache.spark.sql.DataFrame

/** Output-layout control — the writer-side half of the scale story.
  *
  * At 100 TB the failure mode is rarely the query: it is the WRITE — a
  * shuffle with one hot reducer emits one 50 GB file next to ten thousand
  * 2 KB ones, and every downstream scan (and the object store's listing)
  * pays for it forever. Two mechanisms fix the distribution:
  *
  *  - the AQE `REBALANCE` hint re-plans the final exchange at runtime into
  *    even-sized partitions (splitting skewed ones, coalescing tiny ones —
  *    unlike `repartition(n)`, there is no magic constant to mis-tune, and
  *    unlike `coalesce(n)` it does not collapse upstream parallelism);
  *  - `maxRecordsPerFile` bounds any file a single task writes, so even a
  *    partition AQE could not split (one giant key) cannot produce an
  *    unsplittable file.
  *
  * Both act on the physical layout only — row content is untouched, which
  * is what makes the operator oracle-checkable (q_s10: read-back equals the
  * plain query bit for bit).
  */
object Output {

  /** Writes `df` as parquet with an even, bounded file layout; returns the
    * directory. */
  def sizedParquetWrite(
      df: DataFrame,
      dir: String,
      maxRecordsPerFile: Long,
      rebalance: Boolean = true): String = {
    val shaped = if (rebalance) df.hint("rebalance") else df
    shaped.write
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .mode("overwrite")
      .parquet(dir)
    dir
  }

  /** MERGE/upsert as a join (the CDC maintenance primitive OSS parquet
    * lacks a native MERGE INTO for): rows of `updates` replace same-key
    * rows of `base`, new keys append, optional `deleteFlag` column in
    * `updates` drops the key.
    *
    * Shape: `base ANTI JOIN updates ∪ (updates WHERE NOT delete)` — NOT a
    * full-outer join, deliberately. A full-outer merge can never broadcast
    * (Spark's BroadcastHashJoin does not support full outer), so it would
    * shuffle the entire 100 TB base for a 1 MB changeset. The anti join
    * *does* broadcast its right side, so untouched base rows stream through
    * map-side with zero shuffle, and the changeset (which carries the full
    * payload — both frames must share the non-key column set) supplies the
    * updated and inserted rows by union. Semantically identical to the
    * full-outer formulation because updates are whole-row. */
  def mergeUpsert(
      base: DataFrame,
      updates: DataFrame,
      keys: Seq[String],
      deleteFlag: Option[String] = None): DataFrame = {
    import org.apache.spark.sql.functions._
    val payload = base.columns.filterNot(keys.contains)
    val cols = keys.map(col) ++ payload.map(col)
    val untouched = base.join(broadcast(updates.select(keys.map(col): _*)),
      keys, "left_anti")
    val applied = deleteFlag match {
      case Some(f) => updates.where(coalesce(col(f), lit(false)) === false)
      case None => updates
    }
    untouched.select(cols: _*).unionByName(applied.select(cols: _*))
  }
}
