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
    val utcMicros = Tables.normalizeEventsTs(ntzFrame)
      .select(unix_micros(col("ts"))).head().getLong(0)
    val prev = spark.conf.get("spark.sql.session.timeZone")
    // 2024-03-10 06:30 UTC is inside the US DST spring-forward morning — the
    // worst case for wall-clock reinterpretation bugs.
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try {
      val nyMicros = Tables.normalizeEventsTs(ntzFrame)
        .select(unix_micros(col("ts"))).head().getLong(0)
      assert(nyMicros === utcMicros)
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
