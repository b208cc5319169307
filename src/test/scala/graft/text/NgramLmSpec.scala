package graft.text

import graft.SparkSpec

class NgramLmSpec extends SparkSpec {
  import spark.implicits._

  // uni: a=3 b=3 c=1, V=3; bigram counts: (a,b)=3, (b,a)=1.
  // P(b|a) = (3+1)/(3+3); P(a|b) = (1+1)/(3+3).
  private lazy val docs = Seq(
    (0L, "a b a b"),
    (1L, "a b"),
    (2L, "c") // single token — no bigrams, excluded from output
  ).toDF("doc_id", "text")

  private def t(p: Double): Double = math.floor(math.log(p) * 1e6)

  test("add-one-smoothed bigram scores match the hand computation") {
    val rows = NgramLm.scoreDocs(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(rows.keySet === Set(0L, 1L))
    assert(rows(0L)._1 === 3L)
    assert(rows(1L)._1 === 1L)
    val pAB = 4.0 / 6.0
    val pBA = 2.0 / 6.0
    assert(rows(0L)._2 === (t(pAB) * 2 + t(pBA)) / 1e6 / 3.0)
    assert(rows(1L)._2 === t(pAB) / 1e6 / 1.0)
  }

  test("repeated-bigram docs score higher than unseen-transition docs") {
    // Self-trained LM: a doc made of the corpus's dominant transition (a,b)
    // must outscore one whose transitions are rare.
    val big = Seq(
      (0L, "x y x y x y x y"),
      (1L, "x y"),
      (2L, "q r") // (q,r) occurs once; (x,y) occurs 5 times
    ).toDF("doc_id", "text")
    val scores = NgramLm.scoreDocs(big, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(scores(1L) > scores(2L))
  }
}
