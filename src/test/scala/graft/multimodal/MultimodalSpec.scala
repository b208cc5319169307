package graft.multimodal

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("blob projection carries payload bytes + mime; stub decode is deterministic") {
    val docs = Seq((7L, "hello world"), (8L, "")).toDF("doc_id", "text")
    val blobs = Multimodal.toBlobs(docs)
    assert(blobs.schema("content").dataType.typeName === "binary")

    val metas = Multimodal.decodeStub(spark, blobs)
      .collect().map(m => m.doc_id -> m).toMap
    assert(metas(7L).n_bytes === 11L)
    assert(metas(7L).width === 64 + ('h'.toInt * 7) % 512)
    assert(metas(7L).height === 64 + ((11 % 512) * 3) % 512)
    assert(metas(8L).n_bytes === 0L)
    assert(metas(8L).width === 64)
    // deterministic: second run bit-identical
    val again = Multimodal.decodeStub(spark, blobs).collect().map(m => m.doc_id -> m).toMap
    assert(again === metas)
  }
}
