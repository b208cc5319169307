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

  /** Fraction of tokens that are stopwords (0 when no tokens). Fused
    * single-pass hit count (HashUtil.listHits) — the filter/array_contains
    * lambda runs interpreted and was the q_t3 hot spot. */
  def stopwordRatio(toks: Column): Column = {
    val hits = element_at(graft.functions.GraftFunctions.listHits(toks, Seq(Stopwords)), 1)
    when(size(toks) > 0, hits.cast("double") / size(toks).cast("double"))
      .otherwise(lit(0.0))
  }

  /** Count of sentence punctuation characters. */
  def punctCount(c: Column): Column =
    size(regexp_extract_all(c, lit("[.!?,;:]"), lit(0)))

  /** Binary en/other heuristic (superseded by [[langId3]] for real language
    * ID; kept as the cheap single-list gate). */
  def langId(toks: Column, threshold: Double = 0.05): Column =
    when(stopwordRatio(toks) >= threshold, lit("en")).otherwise(lit("other"))

  // --- multi-language ID -----------------------------------------------------
  // Per-language profiles: function words (word-level n-gram profile, n = 1)
  // plus the accented-character classes that separate de/fr from en when the
  // function-word signal is thin. Pure expressions — ANSI-SQL-mirrorable and
  // inside whole-stage codegen.

  /** German function words. */
  val StopwordsDe: Seq[String] = Seq(
    "der", "die", "und", "das", "ist", "nicht", "ein", "ich", "mit",
    "auf", "den", "sich", "von", "dem", "aber")

  /** French function words. */
  val StopwordsFr: Seq[String] = Seq(
    "le", "la", "les", "des", "et", "est", "une", "un", "je", "pas",
    "que", "pour", "dans", "avec", "sur")

  /** Spanish function words. */
  val StopwordsEs: Seq[String] = Seq(
    "el", "los", "las", "de", "que", "y", "en", "un", "una", "es",
    "no", "por", "con", "para", "su")

  /** Italian function words. */
  val StopwordsIt: Seq[String] = Seq(
    "il", "di", "che", "e", "la", "per", "un", "una", "non", "sono",
    "con", "si", "nel", "della", "più")

  /** Characters (as a regex class body) distinctive of each language. */
  val AccentsDe: String = "äöüß"
  val AccentsFr: String = "éèêëàâçîïôùû"
  val AccentsEs: String = "áéíóúñ"
  val AccentsIt: String = "àèéìòù"

  /** Fraction of tokens found in `words` (0 when no tokens). */
  def ratioIn(toks: Column, words: Seq[String]): Column = {
    val hits = size(filter(toks, t => array_contains(typedLit(words), t)))
    when(size(toks) > 0, hits.cast("double") / size(toks).cast("double"))
      .otherwise(lit(0.0))
  }

  /** Fraction of characters in the accent class (0 for empty strings). */
  def accentRatio(text: Column, accentClass: String): Column = {
    val n = length(text)
    when(n > 0,
      (n - length(regexp_replace(text, s"[$accentClass]", ""))).cast("double")
        / n.cast("double"))
      .otherwise(lit(0.0))
  }

  /** Per-language scores over the canonical text: function-word hit ratio,
    * plus 5× the accented-char ratio for de/fr (an accent char is rarer and
    * far more discriminative than one more stopword hit). */
  def langScores(text: Column): (Column, Column, Column) = {
    val norm = normText(text)
    val toks = tokens(norm)
    (ratioIn(toks, Stopwords),
      ratioIn(toks, StopwordsDe) + lit(5.0) * accentRatio(norm, AccentsDe),
      ratioIn(toks, StopwordsFr) + lit(5.0) * accentRatio(norm, AccentsFr))
  }

  /** Three-language ID: argmax of the en/de/fr profile scores, "other" when
    * no profile clears the threshold; ties break en > de > fr. */
  def langId3(text: Column, threshold: Double = 0.05): Column = {
    val (en, de, fr) = langScores(text)
    when(greatest(en, de, fr) < threshold, lit("other"))
      .when(en >= de && en >= fr, lit("en"))
      .when(de >= fr, lit("de"))
      .otherwise(lit("fr"))
  }

  /** Per-language profile scores (same formula as [[langScores]]) for the
    * five supported languages, in tie-break order. English carries no accent
    * class, so its accent term is identically zero — kept explicit so every
    * language evaluates the same expression shape. */
  def langScores5(text: Column): Seq[(String, Column)] = {
    val norm = normText(text)
    val toks = tokens(norm)
    def score(words: Seq[String], accents: String): Column =
      if (accents.isEmpty) ratioIn(toks, words)
      else ratioIn(toks, words) + lit(5.0) * accentRatio(norm, accents)
    Seq(
      "en" -> score(Stopwords, ""),
      "de" -> score(StopwordsDe, AccentsDe),
      "fr" -> score(StopwordsFr, AccentsFr),
      "es" -> score(StopwordsEs, AccentsEs),
      "it" -> score(StopwordsIt, AccentsIt))
  }

  /** Five-language ID: argmax of the en/de/fr/es/it profile scores, "other"
    * when no profile clears the threshold; ties break in list order
    * (en > de > fr > es > it). The cascade compares each language against
    * every LATER one with >=, so the first maximal score wins — the same
    * shape [[langId3]] uses, extended mechanically. */
  def langId5(text: Column, threshold: Double = 0.05): Column = {
    val scores = langScores5(text)
    val best = greatest(scores.map(_._2): _*)
    val cascade = scores.init.zipWithIndex.foldLeft(when(best < threshold, lit("other"))) {
      case (acc, ((lang, s), i)) =>
        val laters = scores.drop(i + 1).map(_._2)
        acc.when(laters.map(s >= _).reduce(_ && _), lit(lang))
    }
    cascade.otherwise(lit(scores.last._1))
  }

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
