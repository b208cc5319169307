package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CdcSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s + " 00:00:00")

  test("scd2 compresses no-op changes and stitches contiguous validity") {
    // key 1: A, A, B, A  -> three versions (the repeat A is collapsed,
    // the later return to A is a NEW version — SCD2, not dedup)
    val log = Seq(
      (1L, ts("2024-01-01"), "A"), (1L, ts("2024-01-05"), "A"),
      (1L, ts("2024-02-01"), "B"), (1L, ts("2024-03-01"), "A"),
      (2L, ts("2024-01-10"), "X"))
      .toDF("k", "at", "v")
    val dim = Cdc.scd2(log, Seq("k"), "at", Seq("v"))
      .orderBy("k", "effective_from").collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getTimestamp(2), Option(r.getTimestamp(3)), r.getBoolean(4)))
    assert(dim.toSeq === Seq(
      (1L, "A", ts("2024-01-01"), Some(ts("2024-02-01")), false),
      (1L, "B", ts("2024-02-01"), Some(ts("2024-03-01")), false),
      (1L, "A", ts("2024-03-01"), None, true),
      (2L, "X", ts("2024-01-10"), None, true)))
    // validity is gapless per key: each effective_to equals the next
    // version's effective_from, and exactly one current row per key
    assert(dim.count(_._5) === 2)
  }

  test("snapshotDiff classifies insert/delete/update and drops unchanged keys") {
    val old = Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0)).toDF("k", "name", "v")
    val neu = Seq((1L, "a", 1.0), (2L, "b", 9.0), (4L, "d", 4.0)).toDF("k", "name", "v")
    val got = Cdc.snapshotDiff(old, neu, Seq("k"))
      .select("k", "change_type").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
    assert(got === Seq((2L, "update"), (3L, "delete"), (4L, "insert")))
  }

  test("snapshotDiff is null-safe: null payload vs value is an update, null vs null is not") {
    val old = Seq((1L, Option.empty[String]), (2L, Some("x"))).toDF("k", "name")
    val neu = Seq((1L, Option.empty[String]), (2L, Option.empty[String])).toDF("k", "name")
    val got = Cdc.snapshotDiff(old, neu, Seq("k"))
      .select("k", "change_type").as[(Long, String)].collect().toSeq
    assert(got === Seq((2L, "update")))
  }

  test("applyDelta equals a from-scratch re-aggregate under signed deltas") {
    val base = (1 to 100).map(i => (i.toLong, i % 5, i.toLong)).toDF("k", "g", "v")
    val oldAgg = base.groupBy("g").agg(sum("v").as("v"), count(lit(1)).as("n"))
    // delete keys %10==0, update keys %7==0 to v+1000, insert 3 new rows in g=0
    val delKeys = base.filter($"k" % 10 === 0)
    val updKeys = base.filter($"k" % 7 === 0 && $"k" % 10 =!= 0)
    val inserts = Seq((101L, 0, 5L), (102L, 0, 6L), (103L, 0, 7L)).toDF("k", "g", "v")
    val minus = delKeys.unionByName(updKeys).select($"g", (-$"v").as("v"), lit(-1L).as("n"))
    val plus = updKeys.select($"g", ($"v" + 1000L).as("v"), lit(1L).as("n"))
      .unionByName(inserts.select($"g", $"v", lit(1L).as("n")))
    val incremental = Cdc.applyDelta(oldAgg, minus.unionByName(plus), Seq("g"))
      .orderBy("g").collect().map(_.toSeq).toSeq
    val merged = base.filter($"k" % 10 =!= 0 && !($"k" % 7 === 0 && $"k" % 10 =!= 0))
      .unionByName(updKeys.select($"k", $"g", ($"v" + 1000L).as("v")))
      .unionByName(inserts)
    val scratch = merged.groupBy("g").agg(sum("v").as("v"), count(lit(1)).as("n"))
      .orderBy("g").collect().map(_.toSeq).toSeq
    assert(incremental === scratch)
  }
}
