package graft.text

import org.apache.spark.sql.DataFrame

import graft.Lineage.TruncateOps
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** BPE tokenizer TRAINING (Sennrich et al. 2016) at corpus scale: learn the
  * first k merge rules from the data — the artifact an LLM pipeline ships to
  * its tokenizer.
  *
  * Scale shape (the HuggingFace-trainer decomposition, distributed):
  *   - the raw corpus first collapses to WORD TYPES with counts — one hash
  *     aggregate; every later round works on the (bounded-vocabulary) type
  *     table, never the corpus again, with pair counts weighted by `n`;
  *   - each round is one map-side pair explode + a tiny (pair-key) hash
  *     aggregate + a 1-row argmax `collect` — per-round driver state is ONE
  *     merge rule (the q_dd6/q_dd8 CC-loop discipline: rounds, not data, on
  *     the driver);
  *   - applying the merge is a map-side [[graft.functions.expressions.BpeMergeExpr]]
  *     pass (greedy leftmost, codegen'd); the symbol table is persisted per
  *     round and replaced, so round r never recomputes rounds 1..r-1.
  *
  * Determinism: pair counts are exact integers; the argmax breaks ties by
  * (count desc, left asc, right asc) — byte-wise string order in both
  * engines. Symbols are split per UTF-16 code unit (ASCII-safe; the
  * corpus-side contract for the synthetic fixtures). */
object BpeTrain {

  /** Learn `rounds` merges; returns (merge_rank, left_sym, right_sym,
    * pair_count) in learning order. */
  def train(docs: DataFrame, textCol: String, rounds: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val words = docs
      .select(explode(TextFunctions.tokens(TextFunctions.normText(col(textCol)))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("n"))
    // split(_, "(?!^)") under Spark's limit=-1 keeps the trailing empty
    // element (the lookahead also matches at end-of-string) — strip it.
    var syms = words
      .select(array_remove(split(col("word"), "(?!^)"), "").as("syms"), col("n"))
      .persist()
    // The parent stays persisted until AFTER the next round's argmax job —
    // that job materializes the (lazily) persisted child from the cached
    // parent, so each round costs exactly ONE job instead of a separate
    // count() materialization pass.
    var prev: Option[DataFrame] = None
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var r = 1
    var exhausted = false
    while (r <= rounds && !exhausted) {
      val best = syms
        .select(col("n"), explode(arrays_zip(
          slice(col("syms"), lit(1), size(col("syms")) - 1).as("a"),
          slice(col("syms"), lit(2), size(col("syms")) - 1).as("b"))).as("p"))
        .select(col("n"), col("p.a").as("a"), col("p.b").as("b"))
        .groupBy("a", "b").agg(sum(col("n")).as("cnt"))
        .orderBy(col("cnt").desc, col("a"), col("b"))
        .limit(1).collect()
      prev.foreach(_.unpersist())
      prev = Some(syms)
      if (best.isEmpty) exhausted = true
      else {
        val (a, b, cnt) = (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        merges += ((r, a, b, cnt))
        syms = syms
          .select(GraftFunctions.bpeMerge(col("syms"), a, b).as("syms"), col("n"))
          .persist()
        r += 1
      }
    }
    prev.foreach(_.unpersist())
    syms.unpersist()
    merges.toSeq.toDF("merge_rank", "left_sym", "right_sym", "pair_count")
  }

  /** Batched-disjoint candidate selection (the scalable-BPE round rule):
    * from the top-`poolK` pairs (ranked by count desc, then left asc, right
    * asc), accept a candidate iff its symbol set {left, right, left+right}
    * is disjoint from the symbol sets of ALL higher-ranked pool candidates
    * — accepted or not. Declarative (a pure rank-window predicate, no
    * sequential accumulator), so the identical rule is one NOT EXISTS in
    * the SQL oracle. Rank-1 is always accepted, so every non-empty round
    * makes progress.
    *
    * Why symbol-set disjointness makes the batch exact: a merge (a,b)→ab
    * never deletes a symbol outright (two become one) and never creates a
    * symbol outside {ab}, so for any other accepted (c,d) with
    * {c,d,cd} ∩ {a,b,ab} = ∅ the c–d adjacencies — and hence (c,d)'s
    * snapshot count and greedy application — are invariant under applying
    * (a,b). The accepted set therefore commutes: one stacked projection
    * applies the whole round, and the reported pair_count is the exact
    * round-start count for every accepted rule. */
  private[text] def disjointAccept(
      pool: Seq[(String, String, Long)]): Seq[(String, String, Long)] =
    pool.zipWithIndex.collect {
      case ((a, b, cnt), i) if pool.take(i).forall { case (ha, hb, _) =>
        val hs = Set(ha, hb, ha + hb)
        !hs(a) && !hs(b) && !hs(a + b)
      } => (a, b, cnt)
    }

  /** Scalable BPE training: `rounds` rounds, each counting pairs ONCE and
    * applying every accepted merge from the top-`poolK` candidates in one
    * stacked projection — so the cluster-job count is O(rounds), not
    * O(merges) (the [[train]] loop is one job PER merge; a real 32k-merge
    * vocabulary needs merges ≫ jobs). Acceptance is [[disjointAccept]]
    * (declarative, SQL-replayable — the q_t18b oracle rule) or, with
    * `greedy = true`, the denser [[greedyAccept]] packing for production
    * vocabulary runs. Lineage is cut with an eager `localCheckpoint` every
    * `checkpointEvery` rounds (the q_dd6 CC discipline), so the symbol
    * table's plan depth stays bounded at any round count. Driver state per
    * round: the `poolK`-row candidate pool.
    *
    * Returns (merge_rank, round, left_sym, right_sym, pair_count) in
    * learning order; pair_count is the round-start snapshot count. */
  /** Greedy batched selection (the production-density variant): walk the
    * pool in rank order, accept a candidate iff its symbol set is disjoint
    * from the symbols of candidates ACCEPTED so far. Accepts a superset of
    * [[disjointAccept]] per pool (a candidate blocked only by a REJECTED
    * higher candidate gets in), so rounds pack denser — the rule real
    * 32k-vocab training wants. Sequential by construction (the
    * accumulating used-set), so its SQL replay would need a recursive
    * scan; the oracle-gated q_t18b uses [[disjointAccept]] instead, and
    * the spec pins greedy's invariants (pairwise disjoint, ⊇ density). */
  private[text] def greedyAccept(
      pool: Seq[(String, String, Long)]): Seq[(String, String, Long)] = {
    val used = scala.collection.mutable.Set.empty[String]
    pool.flatMap { case c @ (a, b, _) =>
      val s = Set(a, b, a + b)
      if (s.exists(used)) None else { used ++= s; Some(c) }
    }
  }

  def trainBatched(
      docs: DataFrame,
      textCol: String,
      rounds: Int,
      poolK: Int = 16,
      checkpointEvery: Int = 4,
      greedy: Boolean = false): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val accept: Seq[(String, String, Long)] => Seq[(String, String, Long)] =
      if (greedy) greedyAccept else disjointAccept
    val words = docs
      .select(explode(TextFunctions.tokens(TextFunctions.normText(col(textCol)))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("n"))
    var syms = words
      .select(array_remove(split(col("word"), "(?!^)"), "").as("syms"), col("n"))
      .persist()
    var prev: Option[DataFrame] = None
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, String, String, Long)]
    var rank = 0
    var r = 1
    var exhausted = false
    while (r <= rounds && !exhausted) {
      // ONE job per round: the poolK-row candidate pool (bounded driver
      // state; TakeOrderedAndProject, no full sort).
      val pool = syms
        .select(col("n"), explode(arrays_zip(
          slice(col("syms"), lit(1), size(col("syms")) - 1).as("a"),
          slice(col("syms"), lit(2), size(col("syms")) - 1).as("b"))).as("p"))
        .select(col("n"), col("p.a").as("a"), col("p.b").as("b"))
        .groupBy("a", "b").agg(sum(col("n")).as("cnt"))
        .orderBy(col("cnt").desc, col("a"), col("b"))
        .limit(poolK).collect()
        .map(row => (row.getString(0), row.getString(1), row.getLong(2))).toSeq
      prev.foreach(_.unpersist())
      prev = Some(syms)
      if (pool.isEmpty) exhausted = true
      else {
        val accepted = accept(pool)
        accepted.foreach { case (a, b, cnt) =>
          rank += 1
          merges += ((rank, r, a, b, cnt))
        }
        val applied = accepted.foldLeft(col("syms")) {
          case (c, (a, b, _)) => GraftFunctions.bpeMerge(c, a, b)
        }
        val next = syms.select(applied.as("syms"), col("n"))
        syms =
          if (r % checkpointEvery == 0) next.truncateLineage()
          else next.persist()
        r += 1
      }
    }
    prev.foreach(_.unpersist())
    syms.unpersist()
    merges.toSeq.toDF("merge_rank", "round", "left_sym", "right_sym", "pair_count")
  }

  /** ENCODE with a trained tokenizer: apply `merges` (learning order) to
    * every distinct word — the k merge passes stack as k codegen'd
    * [[graft.functions.expressions.BpeMergeExpr]] nodes in ONE map-side
    * projection over the vocabulary-bounded distinct-word table — then join
    * the per-word BPE length back to token instances. At 100 TB the
    * (word, n_bpe) table is the broadcast vocabulary of the classic encode;
    * the corpus is touched exactly once. Returns per-doc whitespace vs
    * trained-BPE token counts. */
  def encodeCounts(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val tok = docs.select(
      col(idCol).as("doc_id"),
      explode(TextFunctions.tokens(TextFunctions.normText(col(textCol)))).as("word"))
    val symsFinal = merges.foldLeft(
      array_remove(split(col("word"), "(?!^)"), ""): org.apache.spark.sql.Column) {
      case (c, (a, b)) => GraftFunctions.bpeMerge(c, a, b)
    }
    val nb = tok.select("word").distinct()
      .select(col("word"), size(symsFinal).as("n_bpe"))
    tok.join(nb, Seq("word"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_ws_tokens"), sum(col("n_bpe")).as("n_bpe_tokens"))
  }

  /** The trained VOCABULARY: every symbol surviving the merge rounds, with
    * its corpus occurrence total (weighted by word counts) and the number
    * of word types containing it — the vocab file next to the merges file
    * in a shipped tokenizer. Same decomposition as [[encodeCounts]]: one
    * corpus pass for word counts, merges stacked in one projection. */
  def vocab(
      docs: DataFrame,
      textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val words = docs
      .select(explode(TextFunctions.tokens(TextFunctions.normText(col(textCol)))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("n"))
    val symsFinal = merges.foldLeft(
      array_remove(split(col("word"), "(?!^)"), ""): org.apache.spark.sql.Column) {
      case (c, (a, b)) => GraftFunctions.bpeMerge(c, a, b)
    }
    words.select(col("word"), col("n"), explode(symsFinal).as("symbol"))
      .groupBy("symbol")
      .agg(sum(col("n")).as("total_occurrences"),
        countDistinct(col("word")).as("n_word_types"))
  }
}
