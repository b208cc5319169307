package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bigram language-model scoring of the corpus against itself — the
  * KenLM-style perplexity filter of training-data pipelines (CCNet / Gopher
  * discipline: docs whose token transitions are improbable under a reference
  * LM are noise candidates), built from counts so it is exactly mirrorable.
  *
  * Model: add-one-smoothed bigram conditional
  * P(w2|w1) = (c2(w1,w2) + 1) / (c1(w1) + V), trained on the SAME corpus it
  * scores (a self-scoring pass; a production pipeline would persist the
  * count tables from a reference slice and join them here unchanged).
  * Per doc: n_bigrams and the average log-probability.
  *
  * Scale shape: the model is two skinny count aggregates — (w1,w2,c2) and
  * (w,c1) — built with map-side combine and joined back by their token
  * keys; V (vocabulary size) is a broadcast single row. Per-doc bigram
  * instances collapse to (doc, w1, w2, tf) BEFORE the model joins, so join
  * input is bounded by distinct-bigrams-per-doc, not token count. No
  * windows, no driver state.
  *
  * Determinism (the Bm25 construction): counts are exact integers, the ln()
  * input is a double quotient of exact integers (identical in any engine),
  * each term is floor-scaled to 1e-6 before the exact integer-valued sum,
  * and the final divides are IEEE-exact on identical inputs. */
object NgramLm {

  def scoreDocs(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = docs.select(
      col(idCol).as("doc_id"),
      TextFunctions.tokens(TextFunctions.normText(col(textCol))).as("toks"))

    val uni = tok.select(explode(col("toks")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c1"))
    val vocab = uni.agg(count(lit(1)).as("v"))

    val bigrams = tok.filter(size(col("toks")) >= 2)
      .select(col("doc_id"), explode(transform(
        sequence(lit(1), size(col("toks")) - 1),
        i => struct(
          element_at(col("toks"), i).as("w1"),
          element_at(col("toks"), i + 1).as("w2")))).as("bg"))
      .select(col("doc_id"), col("bg.w1"), col("bg.w2"))
    val btf = bigrams.groupBy("doc_id", "w1", "w2").agg(count(lit(1)).as("tf"))
    val big = btf.groupBy("w1", "w2").agg(sum(col("tf")).as("c2"))

    btf
      .join(big, Seq("w1", "w2"))
      .join(uni.withColumnRenamed("w", "w1"), Seq("w1"))
      .crossJoin(broadcast(vocab))
      .groupBy("doc_id")
      .agg(
        sum(col("tf")).as("n_bigrams"),
        (sum(floor(log((col("c2") + 1).cast("double") /
            (col("c1") + col("v")).cast("double")) * lit(1e6)) * col("tf"))
          .cast("double") / lit(1e6) / sum(col("tf")).cast("double")).as("avg_logp"))
  }
}
