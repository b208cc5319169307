package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.dedup.Dedup

/** Cross-batch incremental dedup: a new batch classified against a persisted
  * signature store (no text retained) and then within itself. */
class IncrementalDedupSpec extends SparkSpec {
  import spark.implicits._

  private val storeDocs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog"),
    (2L, "pack my box with five dozen liquor jugs"),
    (4L, "how vexingly quick daft zebras jump today")).toDF("doc_id", "text")

  // 1 clones store doc 0; 3 is new; 5 and 9 clone 3 (in-batch dups);
  // 7 is under the shingle width (k=3) and must always be kept.
  private val batchDocs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (3L, "sphinx of black quartz judge my vow now"),
    (5L, "sphinx of black quartz judge my vow now"),
    (7L, "too short"),
    (9L, "sphinx of black quartz judge my vow now")).toDF("doc_id", "text")

  private lazy val result = Dedup.incrementalDedup(
    Dedup.signatureStore(storeDocs, "doc_id", "text"),
    Dedup.signatureStore(batchDocs, "doc_id", "text"))
    .orderBy("doc_id")
    .collect()
    .map(r => (r.getLong(0), r.getString(1), if (r.isNullAt(2)) -1L else r.getLong(2)))

  test("store clones, in-batch clones, short docs, and new docs classify correctly") {
    assert(result === Array(
      (1L, "dup_of_store", 0L),
      (3L, "kept", -1L),
      (5L, "dup_in_batch", 3L),
      (7L, "kept", -1L),
      (9L, "dup_in_batch", 3L)))
  }

  test("near-identical (but unequal) shingle sets are NOT dups at threshold 1.0") {
    // One appended word changes the shingle set; the minhash signature may
    // or may not collide, but set_sig verification must reject the pair.
    val batch = Seq(
      (11L, "the quick brown fox jumps over the lazy dog indeed")).toDF("doc_id", "text")
    val out = Dedup.incrementalDedup(
      Dedup.signatureStore(storeDocs, "doc_id", "text"),
      Dedup.signatureStore(batch, "doc_id", "text"))
      .collect()
    assert(out.length === 1 && out.head.getString(1) === "kept")
  }

  test("sub-1.0 threshold takes the slot-estimate path: clones match, disjoint docs don't") {
    // Exact clones have all 16 slots equal (estimate 1.0 >= 0.5); the
    // disjoint doc shares no band, so it is never even a candidate.
    val batch = Seq(
      (21L, "the quick brown fox jumps over the lazy dog"),
      (23L, "completely different words about gardens and rivers flowing"))
      .toDF("doc_id", "text")
    val out = Dedup.incrementalDedup(
      Dedup.signatureStore(storeDocs, "doc_id", "text"),
      Dedup.signatureStore(batch, "doc_id", "text"),
      threshold = 0.5)
      .orderBy("doc_id").collect()
    assert(out(0).getString(1) === "dup_of_store" && out(0).getLong(2) === 0L)
    assert(out(1).getString(1) === "kept")
  }

  test("signature store carries the exact-dup fingerprint tier") {
    import graft.text.TextFunctions
    val sig = Dedup.signatureStore(storeDocs, "doc_id", "text")
    assert(sig.columns.toSeq ===
      Seq("doc_id", "fingerprint", "n_shingles", "set_sig", "minhash"))
    val expected = storeDocs
      .select(col("doc_id"), TextFunctions.fingerprintMd5(col("text")).as("fp"))
    assert(sig.select("doc_id", "fingerprint").except(expected).count() === 0)
  }

  test("the store side streams past a broadcast of the batch (no store shuffle)") {
    val plan = Dedup.incrementalDedup(
      Dedup.signatureStore(storeDocs, "doc_id", "text"),
      Dedup.signatureStore(batchDocs, "doc_id", "text"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"))
  }
}
