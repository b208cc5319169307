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

  test("columnar and exploded shapes are bit-equal (incl. absent terms and dup terms)") {
    // varied tf/dl so the floor-scaled weights exercise real arithmetic,
    // plus a term no document contains (df=0: absent from the exploded
    // postings, a zero column in the columnar shape — same score either way)
    val docs = (1L to 300L).map { i =>
      val spark = "spark " * (i % 7).toInt
      val merge = "merge " * (i % 3).toInt
      (i, s"$spark$merge window filler_$i pad pad pad")
    }.toDF("doc_id", "text")
    val terms = Seq("spark", "merge", "window", "ghost_term", "spark")
    val viaCol = Bm25.topKColumnar(docs, "doc_id", "text", terms.distinct, 1.2, 0.75, 40)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val viaExp = Bm25.topKExploded(docs, "doc_id", "text", terms.distinct, 1.2, 0.75, 40)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(viaCol === viaExp)
    // public API (duplicate term collapsed) agrees with both
    val viaApi = Bm25.topK(docs, "doc_id", "text", terms, k = 40)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(viaApi === viaCol)
  }

  test("a term set past MaxColumnarTerms falls back to the explode shape, same scores") {
    val docs = (1L to 100L)
      .map(i => (i, s"alpha beta gamma pad_$i pad pad"))
      .toDF("doc_id", "text")
    // 3 present + enough absent fillers to cross the columnar budget
    val wide = Seq("alpha", "beta", "gamma") ++
      (1 to Bm25.MaxColumnarTerms + 5).map(i => s"absent_$i")
    assert(wide.distinct.length > Bm25.MaxColumnarTerms)
    val viaApi = Bm25.topK(docs, "doc_id", "text", wide, k = 15)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val viaCol = Bm25.topKColumnar(docs, "doc_id", "text", wide.distinct, 1.2, 0.75, 15)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(viaApi === viaCol)
  }
}
