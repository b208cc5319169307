package graft.operators

import graft.SparkSpec

class GraphSpec extends SparkSpec {
  import spark.implicits._

  private def ranks(edges: Seq[(String, String, Long)], rounds: Int): Map[String, (Long, Long, Long)] =
    Graph.pageRank(edges.toDF("src", "dst", "w"), "src", "dst", "w", rounds)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap

  test("one round matches hand-computed integer mass arithmetic") {
    // A<->B plus C->A; n=3, init = 10^12 DIV 3 = 333333333333,
    // base = (15*init) DIV 100 = 49999999999
    val r = ranks(Seq(("A", "B", 1L), ("B", "A", 1L), ("C", "A", 1L)), rounds = 1)
    // inflow(A) = rank(B) + rank(C) = 666666666666 -> 85% = 566666666666
    assert(r("A")._1 === 49999999999L + 566666666666L)
    // inflow(B) = rank(A) = 333333333333 -> 85% floor = 283333333333
    assert(r("B")._1 === 49999999999L + 283333333333L)
    // C has no inbound links: base mass only
    assert(r("C")._1 === 49999999999L)
    // degree diagnostics
    assert(r("A")._2 === 1L && r("A")._3 === 2L)
    assert(r("C")._2 === 1L && r("C")._3 === 0L)
  }

  test("mass is conserved up to floor loss and dangling leakage") {
    val edges = Seq(("A", "B", 3L), ("B", "A", 1L), ("C", "A", 2L),
      ("C", "D", 1L), ("A", "C", 1L))
    val r = ranks(edges, rounds = 3)
    val total = r.values.map(_._1).sum
    // floor division and the dangling sink D only ever LOSE mass (D
    // re-emits nothing, so ~a quarter of the mass evaporates per round);
    // the total can never exceed the scale
    assert(total <= 1000000000000L)
    assert(total > 500000000000L, s"unexpectedly large mass loss: $total")
    // D is a pure sink (no out-edges): receives mass but re-emits none
    assert(r("D")._2 === 0L && r("D")._3 === 1L)
    assert(r("D")._1 > 49999999999L / 2)
  }

  test("rank gate joins the domain prior as a broadcast and splits the corpus") {
    val df = graft.queries.Corpus.all("q_g2_rank_gate")(spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"domain-prior join must broadcast the rank table:\n$plan")
    val rows = df.collect()
    assert(rows.length === graft.Tables.documents(spark, "/root/testdata/sf0.001").count())
    // the gate genuinely splits: some domains above, some below uniform share
    val keeps = rows.map(_.getBoolean(3)).toSet
    assert(keeps === Set(true, false))
  }

  test("convergence deltas: hand-computed round 1, shrinking tail") {
    import spark.implicits._
    val edges = Seq(("A", "B", 1L), ("B", "A", 1L), ("C", "A", 1L))
      .toDF("src", "dst", "w")
    val ds = Graph.pageRankDeltas(edges, "src", "dst", "w", rounds = 3)
    assert(ds.map(_._1) === Seq(1, 2, 3))
    // round 1 against the hand-computed ranks of the first test:
    // |616666666665-init| + |333333333332-init| + |49999999999-init|
    assert(ds.head._2 === 283333333332L + 1L + 283333333334L)
    // the damped iteration settles: movement shrinks from round 1 to 3
    assert(ds.last._2 < ds.head._2 && ds.forall(_._2 >= 0L))
  }

  test("redistributeDangling: hand-computed round, mass conserved up to floor loss") {
    import org.apache.spark.sql.functions.sum
    // B->A, A->D; D is a pure sink. n=3, init = 10^12 DIV 3 = 333333333333,
    // base = 49999999999, per-round sink share = dm DIV 3
    val edges = Seq(("B", "A", 1L), ("A", "D", 1L)).toDF("src", "dst", "w")
    val r = Graph.pageRank(edges, "src", "dst", "w", rounds = 1,
        redistributeDangling = true)
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    // dm = rank(D) = init; share = 111111111111
    // A: base + (85*(333333333333 + 111111111111)) DIV 100 = 427777777776
    assert(r("A") === 427777777776L)
    // B: base + (85*111111111111) DIV 100 = 49999999999 + 94444444444
    assert(r("B") === 144444444443L)
    // D: inflow = rank(A) = init, same as A
    assert(r("D") === 427777777776L)
    // no evaporation: total within floor loss (a few units/node/round)
    val total = r.values.sum
    assert(total > 1000000000000L - 100L && total <= 1000000000000L,
      s"mass not conserved: $total")
    // whereas the evaporate default LOSES D's 85% share
    val ev = Graph.pageRank(edges, "src", "dst", "w", rounds = 1)
      .agg(sum("rank")).head().getLong(0)
    assert(ev < total - 100000000000L, s"evaporate variant should lose mass: $ev")
  }

  test("hits: one round matches hand-computed L1-normalized integer arithmetic") {
    // A<->B plus C->A, scale 10^6, every hub starts at 10^6.
    // ra: A<-{B,C}=2e6, B<-A=1e6; Sa=3e6
    //   a(A) = 2e12 DIV 3e6 = 666666; a(B) = 1e12 DIV 3e6 = 333333; a(C)=0
    // rh: A->B: a(B)=333333; B->A: a(A)=666666; C->A: 666666; Sh=1666665
    //   h(A) = 333333e6 DIV 1666665 = 200000 (exact)
    //   h(B) = h(C) = 666666e6 DIV 1666665 = 400000 (exact)
    val edges = Seq(("A", "B", 1L), ("B", "A", 1L), ("C", "A", 1L))
      .toDF("src", "dst", "w")
    val r = Graph.hits(edges, "src", "dst", "w", rounds = 1)
      .collect().map(x => x.getString(0) -> ((x.getLong(1), x.getLong(2)))).toMap
    assert(r("A") === ((200000L, 666666L)))
    assert(r("B") === ((400000L, 333333L)))
    assert(r("C") === ((400000L, 0L)))
    // L1 mass conserved up to floor loss on both score families
    assert(r.values.map(_._1).sum > 999990L && r.values.map(_._1).sum <= 1000000L)
    assert(r.values.map(_._2).sum > 999990L && r.values.map(_._2).sum <= 1000000L)
  }

  test("hits is deterministic across repartitionings") {
    val edges = (0 until 200).map(i =>
      (s"n${i % 17}", s"n${(i * 7 + 3) % 17}", (i % 5 + 1).toLong))
      .filter { case (a, b, _) => a != b }
    val df = edges.toDF("src", "dst", "w")
      .groupBy("src", "dst").agg(org.apache.spark.sql.functions.sum("w").as("w"))
    val r1 = Graph.hits(df, "src", "dst", "w", 3).collect().map(_.toSeq).toSet
    val r2 = Graph.hits(df.repartition(13), "src", "dst", "w", 3)
      .collect().map(_.toSeq).toSet
    assert(r1 === r2)
  }

  test("redistributeDangling is a no-op on sink-free graphs") {
    val edges = Seq(("A", "B", 1L), ("B", "C", 2L), ("C", "A", 1L))
      .toDF("src", "dst", "w")
    val a = Graph.pageRank(edges, "src", "dst", "w", 3).collect().map(_.toSeq).toSet
    val b = Graph.pageRank(edges, "src", "dst", "w", 3, redistributeDangling = true)
      .collect().map(_.toSeq).toSet
    assert(a === b)
  }

  test("reliable-checkpoint mode computes identical ranks and scores") {
    val dir = java.nio.file.Files.createTempDirectory("graft_g_ckpt").toString
    val edges = Seq(("A", "B", 1L), ("B", "A", 1L), ("C", "A", 1L), ("A", "D", 2L))
      .toDF("src", "dst", "w")
    val prLocal = Graph.pageRank(edges, "src", "dst", "w", 3)
      .collect().map(_.toSeq).toSet
    val prRel = Graph.pageRank(edges, "src", "dst", "w", 3,
      checkpointDir = Some(dir)).collect().map(_.toSeq).toSet
    assert(prLocal === prRel)
    val hLocal = Graph.hits(edges, "src", "dst", "w", 2)
      .collect().map(_.toSeq).toSet
    val hRel = Graph.hits(edges, "src", "dst", "w", 2,
      checkpointDir = Some(dir)).collect().map(_.toSeq).toSet
    assert(hLocal === hRel)
    // the reliable mode really wrote checkpoint files
    assert(new java.io.File(dir).listFiles().nonEmpty)
  }

  test("deterministic across runs and repartitionings") {
    val edges = (0 until 200).map(i =>
      (s"n${i % 17}", s"n${(i * 7 + 3) % 17}", (i % 5 + 1).toLong))
      .filter { case (a, b, _) => a != b }
    val df = edges.toDF("src", "dst", "w")
      .groupBy("src", "dst").agg(org.apache.spark.sql.functions.sum("w").as("w"))
    val r1 = Graph.pageRank(df, "src", "dst", "w", 4).collect().map(_.toSeq).toSet
    val r2 = Graph.pageRank(df.repartition(13), "src", "dst", "w", 4)
      .collect().map(_.toSeq).toSet
    assert(r1 === r2)
  }
}
