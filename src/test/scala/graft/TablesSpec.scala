package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Tables.normalizeEventsTs contract: every physical form of events.ts must
  * land on the same instants, independent of the session time zone. */
class TablesSpec extends SparkSpec {

  private def ntzFrame = {
    // A TIMESTAMP_NTZ column whose wall-clock is authored as UTC — the shape
    // Spark 4 reads from TIMESTAMP(MICROS, isAdjustedToUTC=false) parquet.
    spark.range(1).select(
      lit("2024-03-10 06:30:00").cast(TimestampNTZType).as("ts"))
  }

  test("normalizeEventsTs reads NTZ wall-clock as UTC under a non-UTC session zone") {
    // Both DST edge cases: 2024-03-10 06:30 UTC sits in the US spring-
    // forward morning (gap), 2024-11-03 06:30 UTC maps to the AMBIGUOUS
    // 01:30 New-York wall-clock of the fall-back hour — a session-zone
    // cast resolves the latter to the earlier offset and lands one hour
    // early (the bug this pins down).
    val frames = Seq(
      ntzFrame,
      spark.range(1).select(
        lit("2024-11-03 06:30:00").cast(TimestampNTZType).as("ts")))
    val utc = frames.map(f =>
      Tables.normalizeEventsTs(f).select(unix_micros(col("ts"))).head().getLong(0))
    val prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try {
      val ny = frames.map(f =>
        Tables.normalizeEventsTs(f).select(unix_micros(col("ts"))).head().getLong(0))
      assert(ny === utc)
    } finally spark.conf.set("spark.sql.session.timeZone", prev)
  }

  test("normalizeEventsTs: legacy long nanos divide exactly; TimestampType passes through") {
    val nanos = 1710052200123456789L // not microsecond-aligned
    val fromLong = Tables.normalizeEventsTs(
        spark.range(1).select(lit(nanos).as("ts")))
      .select(unix_micros(col("ts"))).head().getLong(0)
    assert(fromLong === nanos / 1000)

    val tsFrame = spark.range(1).select(timestamp_micros(lit(nanos / 1000)).as("ts"))
    assert(Tables.normalizeEventsTs(tsFrame) eq tsFrame)
  }

  test("normalizeEventsTs rejects unexpected ts types loudly") {
    val bad = spark.range(1).select(lit("2024-01-01").as("ts"))
    val e = intercept[IllegalArgumentException](Tables.normalizeEventsTs(bad))
    assert(e.getMessage.contains("events.ts"))
  }
}
