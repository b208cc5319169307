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
    * `updates` drops the key. One full-outer equi-join on the key — the
    * shape every table-format MERGE compiles to underneath; with a small
    * changeset the join side broadcasts and the base is never shuffled.
    * Both frames must share the non-key column set. */
  def mergeUpsert(
      base: DataFrame,
      updates: DataFrame,
      keys: Seq[String],
      deleteFlag: Option[String] = None): DataFrame = {
    import org.apache.spark.sql.functions._
    val payload = base.columns.filterNot(keys.contains)
    val u = deleteFlag.foldLeft(updates)((df, f) =>
      df.withColumnRenamed(f, "__delete"))
    val b = payload.foldLeft(base)((df, c) => df.withColumnRenamed(c, s"__b_$c"))
    val joined = b.join(
      u.withColumn("__upd", lit(true)),
      keys, "full_outer")
    val merged = payload.foldLeft(joined)((df, c) =>
      df.withColumn(c,
        when(col("__upd").isNotNull, col(c)).otherwise(col(s"__b_$c"))))
    val alive = deleteFlag match {
      case Some(_) => merged.where(coalesce(col("__delete"), lit(false)) === false)
      case None => merged
    }
    alive.select(keys.map(col) ++ payload.map(col): _*)
  }
}
