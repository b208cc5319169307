package graft.text

import graft.SparkSpec

class Bm25Spec extends SparkSpec {
  import spark.implicits._

  test("bm25 ranks term-dense docs first, ignores non-query terms, respects k") {
    val docs = Seq(
      (1L, "spark spark spark filler filler"),
      (2L, "spark filler filler filler filler"),
      (3L, "filler filler filler filler filler"),
      (4L, "spark stream filler filler filler")).toDF("doc_id", "text")
    val top = Bm25.topK(docs, "doc_id", "text", Seq("spark", "stream"), k = 3)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(top.length === 3)
    // doc 4 matches two distinct terms (one rare) → beats tf-heavy doc 1
    assert(top.head._1 === 4L)
    assert(top.map(_._1).toSet === Set(1L, 2L, 4L)) // doc 3 matches nothing
    assert(top.forall(_._2 > 0))
    // higher tf beats lower tf at equal dl
    val byId = top.toMap
    assert(byId(1L) > byId(2L))
  }

  test("bm25 is deterministic under repartitioning (exact-sum scores)") {
    val docs = (1L to 200L)
      .map(i => (i, s"spark merge window stream filler_$i token token"))
      .toDF("doc_id", "text")
    val a = Bm25.topK(docs, "doc_id", "text", Seq("spark", "merge"), k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val b = Bm25.topK(docs.repartition(13), "doc_id", "text", Seq("spark", "merge"), k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(a === b)
  }
}
