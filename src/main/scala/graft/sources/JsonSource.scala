package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** JSON-lines ingest — the format sibling of [[CsvSource]] (the reference
  * reads only CSV; any real deployment of this engine also lands newline-
  * delimited JSON from event collectors and API exports).
  *
  * Same schema discipline as CSV: explicit StructType by default (one pass,
  * stable types — JSON inference samples the data and can flip long/double
  * between days at scale), inference as an opt-in compat flag. Malformed
  * lines are preserved, not dropped: PERMISSIVE mode routes them into a
  * corrupt-record column so a 100 TB ingest can quarantine bad lines with a
  * filter instead of failing the job (or silently losing data).
  */
object JsonSource {

  val CorruptCol = "_corrupt_record"

  def read(
      spark: SparkSession,
      path: String,
      schema: StructType,
      inferSchema: Boolean = false): DataFrame = {
    val reader = spark.read
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
    if (inferSchema) reader.json(path)
    else reader.schema(schema.add(CorruptCol, "string")).json(path)
  }

  /** Rows that parsed cleanly (corrupt column dropped). */
  def valid(df: DataFrame): DataFrame =
    df.filter(df.col(CorruptCol).isNull).drop(CorruptCol)

  /** The quarantine stream: full rows for every malformed line (the raw
    * text is in [[CorruptCol]]). Spark refuses corrupt-column predicates
    * directly over a raw file scan (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_
    * RECORD_COLUMN) — per its guidance the input must be materialized first,
    * so callers pass a cached/checkpointed frame; a 100 TB ingest lands the
    * parsed frame once and forks valid/corrupt from that materialization
    * anyway. */
  def corrupt(df: DataFrame): DataFrame =
    df.filter(df.col(CorruptCol).isNotNull)
}
