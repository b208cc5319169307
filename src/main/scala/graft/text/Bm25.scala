package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Exact

/** Okapi BM25 scoring of a literal query-term set against the corpus — the
  * retrieval primitive behind quality-aware corpus selection ("find the docs
  * most about X") in training-data pipelines.
  *
  * Scale shape: tokens are projected once, then exploded to skinny
  * (doc, term) rows which are filtered to the query terms BEFORE any shuffle
  * — the per-term postings a real inverted index would serve, built on the
  * fly at map side. Corpus stats (N, avgdl) and per-term document
  * frequencies are single-row/tiny aggregates joined back by broadcast, so
  * the whole query costs one shuffle for the tf aggregate plus broadcasts —
  * no full-corpus inverted index is materialized for ad-hoc scoring.
  *
  * Determinism: tf/df/dl are integers; avgdl is an exact integer-sum
  * quotient; the only per-row transcendental is ln(), identical-input across
  * engines; the final per-doc sum uses the floor-scaled exact-sum trick
  * (order-independent, engine-identical) — which is what lets a BM25 top-k
  * be oracle-checked bit-exactly.
  */
object Bm25 {

  def topK(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      terms: Seq[String],
      k1: Double = 1.2,
      b: Double = 0.75,
      k: Int = 25): DataFrame = {
    require(terms.nonEmpty, "empty query")
    val tok = docs.select(
      col(idCol).as("doc_id"),
      TextFunctions.tokens(TextFunctions.normText(col(textCol))).as("toks"))
    val withLen = tok.select(
      col("doc_id"), col("toks"), size(col("toks")).cast("double").as("dl"))
    val stats = withLen.agg(
      count(lit(1)).cast("double").as("n_docs"),
      (sum(col("dl").cast("long")).cast("double") /
        count(lit(1)).cast("double")).as("avgdl"))
    val tf = withLen
      .select(col("doc_id"), col("dl"), explode(col("toks")).as("term"))
      .filter(col("term").isin(terms: _*)) // postings pruned at map side
      .groupBy("doc_id", "dl", "term")
      .agg(count(lit(1)).cast("double").as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).cast("double").as("df"))
    tf.join(broadcast(dfreq), "term")
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1.0))
      .withColumn("w",
        col("idf") * (col("tf") * (k1 + 1.0)) /
          (col("tf") + (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl")) * k1))
      .groupBy("doc_id")
      .agg(Exact.floorSum(col("w"), 6).as("bm25"))
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(k)
  }
}
