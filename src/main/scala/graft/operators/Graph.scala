package graft.operators

import org.apache.spark.sql.DataFrame

import graft.Lineage.TruncateOps
import org.apache.spark.sql.functions._

/** Iterative graph computation over edge tables — the link-analysis tier of
  * a crawl curation pipeline (host-level PageRank is the classic quality
  * prior: Common Crawl publishes host ranks, and CCNet/RefinedWeb-style
  * pipelines consume them as per-domain weights).
  *
  * Scale shape (the q_dd6 connected-components discipline applied to rank
  * propagation):
  *   - the graph lives as a distributed (src, dst, w) edge table keyed by
  *     src; each round is ONE rank⋈edges join + one dst-keyed aggregate —
  *     both co-partitioned hash shuffles whose size is |edges|, never
  *     node²;
  *   - the driver holds ROUNDS, not data: per-round state is nothing but
  *     the loop counter (plus one Long per round when delta telemetry is
  *     requested); the rank table is localCheckpoint'ed every round so
  *     plan depth stays O(1) at any round count;
  *   - all arithmetic is int64 (mass-scaled integer division), so ranks
  *     are bit-identical on any engine, partitioning, or round order —
  *     the whole iteration replays as unrolled SQL CTEs in the oracle.
  */
object Graph {

  /** The prepared graph state shared by every entry point: the cleaned
    * edge table, the node set, and the out-weight-joined edges, all
    * persisted for the round loop. */
  private case class Prepared(
      e: DataFrame, nodes: DataFrame, eo: DataFrame,
      n: Long, init: Long, base: Long) {
    def release(): Unit = { e.unpersist(); nodes.unpersist(); eo.unpersist() }
  }

  private def prepare(
      edges: DataFrame, srcCol: String, dstCol: String, wCol: String,
      scale: Long): Prepared = {
    val e = edges
      .select(col(srcCol).as("src"), col(dstCol).as("dst"),
        col(wCol).cast("long").as("w"))
      .filter(col("src") =!= col("dst"))
      .persist()
    val nodesDf = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct().persist()
    val n = nodesDf.count()
    require(n > 0, "pageRank needs a non-empty edge set")
    val eo = e.join(e.groupBy("src").agg(sum("w").as("outw")), "src")
      .select("src", "dst", "w", "outw").persist()
    Prepared(e, nodesDf, eo, n, scale / n, 15L * (scale / n) / 100L)
  }

  /** THE round body (one definition — [[pageRank]] and [[pageRankDeltas]]
    * iterate the identical rule): returns the final rank table, plus the
    * per-round L1 movement when `trackDeltas` (one extra co-partitioned
    * join+aggregate per tracked round). */
  /** Lineage-truncation mode shared by the iterative entry points (the
    * [[graft.dedup.Dedup.dupClusters]] discipline): `localCheckpoint` by
    * default — cheapest, but its blocks live on executors, so an executor
    * loss mid-loop kills the job; with a `checkpointDir` (an HDFS/object-
    * store path on a real cluster) every truncation point becomes a
    * RELIABLE `checkpoint` and the loop survives executor loss — the mode
    * a 100 TB run should use. Identical results either way. */
  private def truncate(df: DataFrame, checkpointDir: Option[String]): DataFrame =
    if (checkpointDir.isDefined) df.checkpoint(true) else df.truncateLineage()

  private def iterate(
      p: Prepared, rounds: Int, trackDeltas: Boolean,
      redistribute: Boolean = false,
      checkpointDir: Option[String] = None): (DataFrame, Seq[(Int, Long)]) = {
    // sink (dangling) node set — only materialized for the redistribute
    // variant; an anti-join of nodes against distinct edge sources
    val dang =
      if (redistribute)
        p.nodes.join(p.e.select(col("src").as("node")).distinct(),
          Seq("node"), "left_anti").persist()
      else null
    var r = p.nodes.select(col("node"), lit(p.init).as("rank"))
    val deltas = scala.collection.mutable.ArrayBuffer.empty[(Int, Long)]
    for (k <- 1 to rounds) {
      val inflow = r.join(p.eo, r("node") === p.eo("src"))
        .select(col("dst").as("node"), expr("(rank * w) DIV outw").as("c"))
        .groupBy("node").agg(sum("c").as("inflow"))
      val next = (if (redistribute) {
        // one extra SCALAR aggregate per round: the rank mass sitting on
        // sinks this round, shared back uniformly (dm DIV n per node) and
        // damped exactly like edge inflow — the standard dangling-mass
        // redistribution rule in the same integer arithmetic
        val dm = r.join(dang, Seq("node")) // sinks' current rank mass
          .agg(coalesce(sum("rank"), lit(0L)).as("dm"))
        p.nodes.join(inflow, Seq("node"), "left").crossJoin(broadcast(dm))
          .select(col("node"),
            (lit(p.base) +
              expr(s"(85 * (coalesce(inflow, 0L) + dm DIV ${p.n}L)) DIV 100")).as("rank"))
      } else {
        p.nodes.join(inflow, Seq("node"), "left")
          .select(col("node"),
            (lit(p.base) + expr("(85 * coalesce(inflow, 0L)) DIV 100")).as("rank"))
      })
      val nextT = truncate(next, checkpointDir)
      if (trackDeltas) {
        deltas += ((k, nextT.as("a").join(r.as("b"), col("a.node") === col("b.node"))
          .agg(sum(abs(col("a.rank") - col("b.rank"))).as("d"))
          .head().getLong(0)))
      }
      r = nextT
    }
    if (dang != null) dang.unpersist()
    (r, deltas.toSeq)
  }

  /** Damped PageRank with integer mass arithmetic. `edges` must carry one
    * row per directed edge with a positive integer weight. Total rank mass
    * is `scale` (default 10^12): every node starts at `scale DIV n`, each
    * round a node keeps `(15 * (scale DIV n)) DIV 100` base mass and
    * receives `(85 * Σ inflow) DIV 100` where an edge's inflow is
    * `(rank_src * w) DIV outw_src`. Dangling-node mass evaporates by
    * default (the sink-loss PageRank variant — documented,
    * deterministic); with `redistributeDangling = true` each round
    * instead measures the rank mass sitting on sinks (one scalar
    * aggregate over the sink anti-join set) and shares it back uniformly
    * — `dm DIV n` joins each node's inflow before damping, the standard
    * redistribution rule. Real host graphs are sink-heavy (crawls link
    * out to hosts never fetched), so the redistribute variant is the one
    * production curation wants; both replay exactly in SQL. Floor
    * division loses < 1 unit per edge per round; at the default scale
    * that is a 1e-12 relative error — and, unlike float summation, the
    * SAME error in every engine.
    *
    * Overflow headroom: rank ≤ scale, so rank*w needs scale·max(w) <
    * 2^63. The default scale leaves room for per-edge weights up to ~9e6;
    * shrink `scale` (or pre-normalize weights) for heavier multigraphs.
    *
    * Returns (node, rank, out_w, in_w) — rank after `rounds` rounds,
    * plus total out/in edge weight (0 for pure sinks/sources).
    *
    * EAGER: the round loop runs on call, and the result is materialized
    * (localCheckpoint / checkpoint) before the per-round tables are
    * released — so the returned frame is a computed table, not a lazy
    * plan. This is intentional: an iterative operator's lineage is
    * rounds deep, and a lazy return would recompute the whole iteration
    * from source on the caller's first action after `release()`. Callers
    * composing further plans pay the result's (bounded, node-count-sized)
    * storage, never a re-iteration. */
  def pageRank(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      wCol: String,
      rounds: Int,
      scale: Long = 1000000000000L,
      redistributeDangling: Boolean = false,
      checkpointDir: Option[String] = None): DataFrame = {
    checkpointDir.foreach(
      graft.Lineage.ensureCheckpointDir(edges.sparkSession, _, force = true))
    val p = prepare(edges, srcCol, dstCol, wCol, scale)
    val (r, _) = iterate(p, rounds, trackDeltas = false,
      redistribute = redistributeDangling, checkpointDir = checkpointDir)
    val outw = p.e.groupBy(col("src").as("node")).agg(sum("w").as("out_w"))
    val inw = p.e.groupBy(col("dst").as("node")).agg(sum("w").as("in_w"))
    val res = r.join(outw, Seq("node"), "left").join(inw, Seq("node"), "left")
      .select(col("node"), col("rank"),
        coalesce(col("out_w"), lit(0L)).as("out_w"),
        coalesce(col("in_w"), lit(0L)).as("in_w"))      // materialize BEFORE releasing the prepared tables — otherwise the
      // caller's first action recomputes the edge lineage from source and
      // the round-loop persists bought nothing for the final plan
    val resT = truncate(res, checkpointDir)
    p.release()
    resT
  }

  /** HITS (Kleinberg): hub and authority scores over a directed weighted
    * edge table — the OTHER classic link-analysis prior (a good hub links
    * to good authorities; crawl curation uses authority as a
    * quality-source signal and hub scores to seed frontier expansion).
    *
    * Same integer discipline as [[pageRank]], with L1 (sum) normalization
    * replacing the float L2 of the textbook formulation: every round,
    * raw authority ra(v) = Σ_{(u,v)∈E} hub(u)·w, rescaled to
    * a(v) = (ra(v)·scale) DIV Σra — so scores always lie in [0, scale],
    * sum to ~scale (floor loss < 1 unit per node), and replay bit-exactly
    * as unrolled SQL CTEs; hubs symmetrically from the new authorities.
    * Each round: two co-partitioned join+aggregates + two 1-row scalar
    * sums (broadcast), rank tables localCheckpoint'ed — rounds-not-data
    * on the driver, plan depth O(1) in rounds.
    *
    * Overflow headroom: values ≤ scale and ra ≤ scale·Σw, so the rescale
    * product needs scale²·Σw < 2^63 — the default 10^6 leaves room for
    * total edge weight up to ~9·10^6; shrink `scale` for heavier graphs
    * (precision is 1/scale of the score mass, ample for gating). The
    * bound is ENFORCED at entry (one scalar aggregate over the persisted
    * edge table): Spark's long sums wrap silently with ANSI off while
    * DuckDB's SUM promotes to HUGEINT, so an oversized graph would
    * otherwise diverge from the oracle without an error — this is the
    * exact int64-vs-HUGEINT failure class the round-8 dtype gate exists
    * for, made loud instead of silent. */
  def hits(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      wCol: String,
      rounds: Int,
      scale: Long = 1000000L,
      checkpointDir: Option[String] = None): DataFrame = {
    require(rounds >= 1, s"hits needs rounds >= 1 (got $rounds)")
    checkpointDir.foreach(
      graft.Lineage.ensureCheckpointDir(edges.sparkSession, _, force = true))
    val e = edges
      .select(col(srcCol).as("src"), col(dstCol).as("dst"),
        col(wCol).cast("long").as("w"))
      .filter(col("src") =!= col("dst"))
      .persist()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct().persist()
    require(!nodes.isEmpty, "hits needs a non-empty edge set")
    // Enforce the documented scale²·Σw < 2^63 headroom (scaladoc above) —
    // one cheap agg over the already-persisted edges; fail loudly rather
    // than let the per-round hub·w sums wrap.
    val totalW = e.agg(coalesce(sum("w"), lit(0L))).head.getLong(0)
    require(totalW <= Long.MaxValue / scale / scale,
      s"hits overflow: total edge weight $totalW exceeds 2^63/scale² = " +
        s"${Long.MaxValue / scale / scale} at scale=$scale — pass a smaller " +
        "scale (precision 1/scale) or pre-normalize weights")
    var h = nodes.select(col("node"), lit(scale).as("hub"))
    var a: DataFrame = null
    for (_ <- 1 to rounds) {
      val ra = h.join(e, h("node") === e("src"))
        .select(col("dst").as("node"), (col("hub") * col("w")).as("c"))
        .groupBy("node").agg(sum("c").as("ra"))
      val sa = ra.agg(coalesce(sum("ra"), lit(1L)).as("sa"))
      a = truncate(
        nodes.join(ra, Seq("node"), "left").crossJoin(broadcast(sa))
          .select(col("node"),
            expr(s"(coalesce(ra, 0L) * ${scale}L) DIV sa").as("authority")),
        checkpointDir)
      val rh = a.join(e, a("node") === e("dst"))
        .select(col("src").as("node"), (col("authority") * col("w")).as("c"))
        .groupBy("node").agg(sum("c").as("rh"))
      val sh = rh.agg(coalesce(sum("rh"), lit(1L)).as("sh"))
      h = truncate(
        nodes.join(rh, Seq("node"), "left").crossJoin(broadcast(sh))
          .select(col("node"),
            expr(s"(coalesce(rh, 0L) * ${scale}L) DIV sh").as("hub")),
        checkpointDir)
    }
    val res = truncate(
      h.join(a, Seq("node"))
        .select(col("node"), col("hub"), col("authority")),
      checkpointDir)
    e.unpersist(); nodes.unpersist()
    res
  }

  /** [[pageRank]]'s convergence telemetry: the L1 rank movement
    * Σ|r_k − r_{k−1}| per round — the number an iterative-operator owner
    * watches to pick the round budget (and to stop early at a plateau).
    * Same [[iterate]] body as the ranks themselves, so the telemetry can
    * never describe a different iteration than the one ranked. */
  def pageRankDeltas(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      wCol: String,
      rounds: Int,
      scale: Long = 1000000000000L,
      checkpointDir: Option[String] = None): Seq[(Int, Long)] = {
    checkpointDir.foreach(
      graft.Lineage.ensureCheckpointDir(edges.sparkSession, _, force = true))
    val p = prepare(edges, srcCol, dstCol, wCol, scale)
    val (_, deltas) = iterate(p, rounds, trackDeltas = true,
      checkpointDir = checkpointDir)
    p.release()
    deltas
  }
}
