package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale training-data pipelines:
  * normalization, tokenization, shingling, quality scoring, language ID.
  *
  * Everything here is built from codegen'd Catalyst built-ins (regexp, array
  * lambdas) — no Scala UDFs — so the whole pipeline stays inside whole-stage
  * codegen and scales linearly with input. All formulas are also expressible
  * in ANSI SQL for the DuckDB oracle.
  */
object TextFunctions {

  /** Canonical form for exact / near dedup: lowercase, trim, collapse
    * whitespace runs to single spaces. */
  def normText(c: Column): Column =
    regexp_replace(lower(trim(c)), "\\s+", " ")

  /** Content fingerprint: md5 of the canonical form (exact-dup key). */
  def fingerprintMd5(c: Column): Column = md5(normText(c))

  /** Whitespace-delimited tokens (\\S+ runs — stable across engines).
    * Fused byte-scan expression with exactly regexp_extract_all(c,'\\S+')
    * semantics (the regex path costs ~0.5ms/row on long docs). */
  def tokens(c: Column): Column = graft.functions.GraftFunctions.tokenize(c)

  def tokenCount(c: Column): Column = size(tokens(c))

  /** Common-English stopwords used by the language-ID heuristic. */
  val Stopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "that", "for", "on", "with", "as")

  /** Fraction of tokens that are stopwords (0 when no tokens). */
  def stopwordRatio(toks: Column): Column = {
    val hits = size(filter(toks, t => array_contains(typedLit(Stopwords), t)))
    when(size(toks) > 0, hits.cast("double") / size(toks).cast("double"))
      .otherwise(lit(0.0))
  }

  /** Count of sentence punctuation characters. */
  def punctCount(c: Column): Column =
    size(regexp_extract_all(c, lit("[.!?,;:]"), lit(0)))

  /** n-gram-heuristic language ID: texts whose stopword ratio clears the
    * threshold classify as "en". (A real system would score character
    * n-gram profiles per language; the plumbing — pure-expression scoring
    * over tokens — is identical.) */
  def langId(toks: Column, threshold: Double = 0.05): Column =
    when(stopwordRatio(toks) >= threshold, lit("en")).otherwise(lit("other"))

  /** Composite quality score in [0,1]: length saturation, stopword share,
    * mean token length saturation. Deterministic double arithmetic. */
  def qualityScore(text: Column): Column = {
    val toks = tokens(text)
    val nTok = size(toks).cast("double")
    val lenScore = least(lit(1.0), nTok / lit(100.0))
    val meanTokLen =
      when(size(toks) > 0,
        aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") / nTok)
        .otherwise(lit(0.0))
    val tokLenScore = least(lit(1.0), meanTokLen / lit(8.0))
    lenScore * lit(0.5) + stopwordRatio(toks) * lit(0.3) + tokLenScore * lit(0.2)
  }

  /** Distinct character k-grams of a string (shingle count); 0 for strings
    * shorter than k. Fused codegen'd expression — the lambda composition
    * (transform+substr+array_distinct) runs interpreted at ~ms/row. */
  def charShingleCount(c: Column, k: Int): Column =
    graft.functions.GraftFunctions.charShingleCount(c, k)

  /** Distinct word k-shingles (space-joined token windows), first-occurrence
    * order; empty for fewer than k tokens. Fused codegen'd expression. */
  def wordShingles(toks: Column, k: Int): Column =
    graft.functions.GraftFunctions.wordShingles(toks, k)
}
