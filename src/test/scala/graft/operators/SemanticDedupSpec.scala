package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.dedup.Dedup

/** Dedup.semanticDedup (SemDeDup): seed assignment, within-cluster-only
  * pruning, and min-id keeper discipline on a hand-built vector set. */
class SemanticDedupSpec extends SparkSpec {
  import spark.implicits._

  // Two orthogonal directions (clusters) plus near/far members:
  //   0: e_x seed        1: e_y seed
  //   2: ≈e_x (cos≈1)    3: ≈e_y (cos≈1)    4: e_x again (dup of 0 and 2)
  //   5: 45° between     — lands in cluster 0 by the sid tie-break at equal
  //      cosine, far (cos≈0.707) from both seeds, so it must be kept.
  private def vec(xs: Float*): Array[Float] = xs.toArray
  private lazy val vecs = Seq(
    (0L, vec(1f, 0f)),
    (1L, vec(0f, 1f)),
    (2L, vec(0.999f, 0.001f)),
    (3L, vec(0.001f, 0.999f)),
    (4L, vec(2f, 0f)), // scaled copy of 0 — cosine is scale-invariant
    (5L, vec(1f, 1f))
  ).toDF("id", "v")

  private lazy val result =
    Dedup.semanticDedup(vecs, "id", "v", numSeeds = 2, threshold = 0.9)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap

  test("vectors assign to the nearest seed; equal-cosine ties break to the lower seed id") {
    assert(result(0L)._1 === 0L)
    assert(result(1L)._1 === 1L)
    assert(result(2L)._1 === 0L)
    assert(result(3L)._1 === 1L)
    assert(result(4L)._1 === 0L)
    assert(result(5L)._1 === 0L) // cos 45° to both seeds — tie → seed 0
  }

  test("within-cluster near-dups drop against the lowest id; distant members survive") {
    assert(result(0L)._2 === "kept")    // cluster keeper
    assert(result(2L)._2 === "dropped") // ≈ vector 0
    assert(result(4L)._2 === "dropped") // scaled copy of 0
    assert(result(1L)._2 === "kept")
    assert(result(3L)._2 === "dropped") // ≈ vector 1
    assert(result(5L)._2 === "kept")    // in cluster 0 but cos≈0.707 < 0.9
  }

  test("runaway cluster: guard bounds candidate pairs linearly and still drops all clones") {
    // 400 near-identical 64-dim vectors — ONE degenerate cluster. The
    // all-pairs prune would compare 400·399/2 = 79 800 pairs; the banded
    // anchor guard must stay ≤ tables·anchors·n = 2·8·400 = 6 400 while
    // still dropping every member except the minimum id.
    val n = 400
    val base = Array.tabulate(64)(i => 1f / (i + 1))
    val mega = (0 until n).map { i =>
      (i.toLong, base.clone())
    }.toDF("id", "v")
    val out = Dedup.semanticDedup(mega, "id", "v",
        numSeeds = 2, threshold = 0.9, maxClusterSize = 100)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(out(0L) === "kept")
    assert((1L until n.toLong).forall(out(_) === "dropped"))

    // The candidate frame itself is linear in the cluster, not quadratic.
    val members = mega.select(col("id"), col("v").as("vec"), lit(0L).as("cluster"))
    val nCand = Dedup.cappedClusterCandidates(members, anchorsPerBucket = 8)
      .count()
    assert(nCand <= 2L * 8L * n, s"$nCand candidates for $n members")
    assert(nCand < n.toLong * (n - 1) / 4, "guard must beat all-pairs by far")
  }

  test("guard path is inert below the cap: small-cluster results are identical") {
    val r1 = Dedup.semanticDedup(vecs, "id", "v", numSeeds = 2, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sortBy(_._1)
    val r2 = Dedup.semanticDedup(vecs, "id", "v", numSeeds = 2, threshold = 0.9,
        maxClusterSize = 1000000)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sortBy(_._1)
    assert(r1 === r2)
  }

  test("k-means tier: one Lloyd round separates groups the seed init conflates") {
    // Both seeds (two lowest ids) sit in group A; group B (ids 2-4, near
    // e_y) initially crowds into seed 1's cluster. The Lloyd update drags
    // centroid 1 toward B, so the final assignment gives each group its own
    // cluster — and the prune then keeps exactly one representative per
    // group. Pure seed-init semanticDedup on the same data keeps id 1 too
    // (its cluster-mates are all far), proving the centroid fit did the
    // separating.
    val pts = Seq(
      (0L, vec(1f, 0f)),
      (1L, vec(0.99f, 0.01f)),
      (2L, vec(0f, 1f)),
      (3L, vec(0.01f, 0.99f)),
      (4L, vec(0.02f, 0.98f))
    ).toDF("id", "v")
    val km = Dedup.semanticDedupKmeans(pts, "id", "v",
        numSeeds = 2, assignRounds = 2, threshold = 0.9)
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getString(2)))).toMap
    assert(km(0L) === ((0, "kept")))
    assert(km(1L) === ((0, "dropped"))) // rejoined group A, pruned vs id 0
    assert(km(2L) === ((1, "kept")))
    assert(km(3L) === ((1, "dropped")))
    assert(km(4L) === ((1, "dropped")))
    val seedOnly = Dedup.semanticDedup(pts, "id", "v", numSeeds = 2, threshold = 0.9)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(seedOnly(1L) === "kept") // seed-init leaves id 1 stranded alone
  }

  test("pruning never crosses clusters even at cosine above the threshold") {
    // 3 is nearly identical to 1 but in a different cluster than 0/2/4;
    // if pruning compared across clusters, 5 (cos≈0.707 vs everything in
    // cluster 0) would still be kept but 3's keeper would become ambiguous.
    // The direct claim: every drop's keeper shares its cluster.
    val rows = Dedup.semanticDedup(vecs, "id", "v", numSeeds = 2, threshold = 0.9)
    val byCluster = rows.groupBy("cluster")
      .agg(sum(when(col("status") === "kept", 1).otherwise(0)).as("n_kept"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byCluster(0L) === 2L) // vectors 0 and 5
    assert(byCluster(1L) === 1L) // vector 1
  }
}
