package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Lineage.TruncateOps
import graft.dedup.Dedup
import graft.text.TextFunctions

/** Composed training-data cleaning pipeline: the shape every large-scale
  * corpus build runs — quality gate → exact dedup → near-dup removal —
  * expressed as one declarative DataFrame flow so Catalyst fuses the scan,
  * and each stage's survivors feed the next without materialization.
  *
  * Near-dup removal rule (deterministic and SQL-mirrorable): among each
  * qualifying pair (id1 < id2, Jaccard ≥ threshold) the larger id is
  * dropped. For transitive canonical keepers over deep clusters, use
  * [[Dedup.dupClusters]] on the pair set instead.
  */
object CorpusCleaner {

  case class Config(
      minQuality: Double = 0.35,
      shingleK: Int = 3,
      jaccardThreshold: Double = 0.1,
      maxShingleDf: Int = 1000)

  /** Survivors (id + quality score), smallest-id-wins at every stage. */
  def clean(
      spark: SparkSession,
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      config: Config = Config()): DataFrame = {
    // stage 1: quality gate
    val scored = docs.select(
      col(idCol), col(textCol),
      TextFunctions.qualityScore(col(textCol)).as("quality"))
    val qualified = scored.filter(col("quality") >= config.minQuality)

    // stage 2: exact dedup — keep the minimum id per canonical fingerprint
    val keepers = qualified
      .groupBy(TextFunctions.fingerprintMd5(col(textCol)).as("fp"))
      .agg(min(col(idCol)).as(idCol))
      .select(idCol)
    // Materialize the stage boundary: the exact-dedup survivors feed the pair
    // index AND both sides of the final anti-join — without it the
    // scan+score+dedup lineage re-executes per reference. localCheckpoint
    // (not persist) so the blocks are released by the ContextCleaner once the
    // result frame is garbage-collected; a persist would pin a copy in the
    // CacheManager on every invocation for the session lifetime.
    val exact = qualified.join(keepers, Seq(idCol), "left_semi").truncateLineage()

    // stage 3: near-dup removal — drop the larger id of each high-Jaccard
    // pair. The shingle-frequency cap is live here (self-consistent
    // pruned-universe scores, see Dedup.jaccardPairs) and is mirrored
    // deterministically in the DuckDB oracle (Oracle.q_tp1).
    val pairs = Dedup.jaccardPairs(exact, idCol, textCol, config.shingleK, config.maxShingleDf)
      .filter(col("jaccard") >= config.jaccardThreshold)
    val removed = pairs.select(col("id2").as(idCol)).distinct()
    exact.join(removed, Seq(idCol), "left_anti")
      .select(col(idCol), col("quality"))
      .orderBy(idCol)
  }

  /** [[clean]] with a TRAINED quality gate: stage 1 keeps docs whose
    * model score (any (idCol, score) frame — e.g. the q_t21 ridge
    * classifier) clears `minScore`, replacing the heuristic threshold; the
    * exact-dedup and near-dup stages are unchanged. Survivors carry the
    * model score. The scores frame joins by id — at 100 TB it is the
    * output of one scoring pass, co-partitioned on the id key, so the gate
    * adds one equi-join and no new corpus scan. */
  def cleanClassified(
      spark: SparkSession,
      docs: DataFrame,
      scores: DataFrame,
      minScore: Double,
      idCol: String = "doc_id",
      textCol: String = "text",
      config: Config = Config()): DataFrame = {
    // Materialize the gate: unlike [[clean]]'s cheap heuristic, the score
    // frame carries the whole fit+inference lineage — without a boundary it
    // re-executes in the fingerprint agg, the semi join, AND the pair
    // index.
    val qualified = docs.select(col(idCol), col(textCol))
      .join(scores, Seq(idCol))
      .filter(col("score") >= minScore)
      .truncateLineage()
    val keepers = qualified
      .groupBy(TextFunctions.fingerprintMd5(col(textCol)).as("fp"))
      .agg(min(col(idCol)).as(idCol))
      .select(idCol)
    val exact = qualified.join(keepers, Seq(idCol), "left_semi").truncateLineage()
    val pairs = Dedup.jaccardPairs(exact, idCol, textCol, config.shingleK, config.maxShingleDf)
      .filter(col("jaccard") >= config.jaccardThreshold)
    val removed = pairs.select(col("id2").as(idCol)).distinct()
    exact.join(removed, Seq(idCol), "left_anti")
      .select(col(idCol), col("score"))
      .orderBy(idCol)
  }

  /** Cluster-based variant of [[clean]]: near-dups are resolved through
    * [[Dedup.dupClusters]] connected components, keeping exactly ONE
    * representative (the minimum id) per duplicate cluster. Pairwise
    * larger-id removal can drop every member of a chain a→b→c where only
    * adjacent pairs clear the threshold (b and c both appear as an id2);
    * transitive resolution is the semantically right rule for a 100 TB
    * dedup, at the cost of the label-propagation rounds. */
  def cleanClustered(
      spark: SparkSession,
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      config: Config = Config()): DataFrame = {
    val scored = docs.select(
      col(idCol), col(textCol),
      TextFunctions.qualityScore(col(textCol)).as("quality"))
    val qualified = scored.filter(col("quality") >= config.minQuality)
    val keepers = qualified
      .groupBy(TextFunctions.fingerprintMd5(col(textCol)).as("fp"))
      .agg(min(col(idCol)).as(idCol))
      .select(idCol)
    val exact = qualified.join(keepers, Seq(idCol), "left_semi").truncateLineage()
    val pairs = Dedup.jaccardPairs(exact, idCol, textCol, config.shingleK, config.maxShingleDf)
      .filter(col("jaccard") >= config.jaccardThreshold)
    // every clustered doc whose label is NOT itself is a non-representative
    val dropped = Dedup.dupClusters(pairs)
      .filter(col("label") =!= col("id"))
      .select(col("id").as(idCol))
    exact.join(dropped, Seq(idCol), "left_anti")
      .select(col(idCol), col("quality"))
      .orderBy(idCol)
  }

  /** [[clean]] composed with the decontamination stage: survivors whose
    * distinct word-shingle overlap with the `benchmark` documents reaches
    * `maxContamination` are dropped (the eval-leakage guard every
    * pre-training build runs last, after dedup has already shrunk the
    * corpus). The benchmark gram set is deduplicated and broadcast — at
    * 100 TB the benchmark suite is tiny next to the corpus, so the probe
    * adds one map-side join + one doc-keyed aggregate, never a gram-keyed
    * shuffle of the corpus. Documents too short to shingle carry
    * contamination 0. */
  def cleanDecontaminated(
      spark: SparkSession,
      docs: DataFrame,
      benchmark: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      config: Config = Config(),
      maxContamination: Double = 0.5): DataFrame = {
    def grams(df: DataFrame, cols: Column*): DataFrame =
      df.select(cols :+ explode(TextFunctions.wordShingles(
        TextFunctions.tokens(TextFunctions.normText(col(textCol))), config.shingleK)).as("gram"): _*)

    val cleaned = clean(spark, docs, idCol, textCol, config)
    val survivorText = docs.select(col(idCol), col(textCol))
      .join(cleaned.select(idCol), Seq(idCol), "left_semi")
    val benchGrams = grams(benchmark).distinct()
    val ratio = col("n_hit").cast("double") / col("n_grams").cast("double")
    val contam = grams(survivorText, col(idCol))
      .join(broadcast(benchGrams.withColumn("hit", lit(1))), Seq("gram"), "left")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_grams"), sum(coalesce(col("hit"), lit(0))).as("n_hit"))
      .select(col(idCol), ratio.as("contamination"))
    cleaned.join(contam, Seq(idCol), "left")
      .select(col(idCol), col("quality"),
        coalesce(col("contamination"), lit(0.0)).as("contamination"))
      .filter(col("contamination") < maxContamination)
      .orderBy(idCol)
  }

  /** Per-stage survivor counts (single row). */
  def stats(
      spark: SparkSession,
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      config: Config = Config()): DataFrame = {
    import spark.implicits._
    val nInput = docs.count()
    val scored = docs.select(
      col(idCol), col(textCol),
      TextFunctions.qualityScore(col(textCol)).as("quality"))
    val qualified = scored.filter(col("quality") >= config.minQuality).cache()
    val nQuality = qualified.count()
    val nExact = qualified
      .groupBy(TextFunctions.fingerprintMd5(col(textCol))).agg(min(col(idCol)))
      .count()
    val nFinal = clean(spark, docs, idCol, textCol, config).count()
    qualified.unpersist()
    Seq((nInput, nQuality, nExact, nFinal))
      .toDF("n_input", "n_quality", "n_exact_dedup", "n_final")
  }
}
