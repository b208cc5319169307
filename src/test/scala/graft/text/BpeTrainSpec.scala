package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.GraftFunctions

/** BPE training on the classic Sennrich toy corpus + merge-kernel edge
  * cases. */
class BpeTrainSpec extends SparkSpec {
  import spark.implicits._

  test("learns (w,e) then the (l,o)-vs-(s,t) tie broken lexicographically") {
    // low:3 lower:2 newest:4 widest:1 — round 1: (w,e)=6 wins; round 2:
    // (l,o)=5 ties (s,t)=5 and 'l' < 's' takes it.
    val docs = Seq(
      (0L, "low low low newest newest"),
      (1L, "lower lower newest newest widest")
    ).toDF("doc_id", "text")
    val merges = BpeTrain.train(docs, "text", rounds = 2)
      .orderBy("merge_rank")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(merges(0) === ((1, "w", "e", 6L)))
    assert(merges(1) === ((2, "l", "o", 5L)))
  }

  test("merge kernel is greedy leftmost non-overlapping") {
    val f = (syms: Seq[String], a: String, b: String) =>
      Seq(Tuple1(syms)).toDF("syms")
        .select(GraftFunctions.bpeMerge(col("syms"), a, b).as("m"))
        .head().getSeq[String](0).toSeq
    assert(f(Seq("a", "a", "a"), "a", "a") === Seq("aa", "a"))
    assert(f(Seq("a", "b", "a", "b"), "a", "b") === Seq("ab", "ab"))
    assert(f(Seq("x"), "a", "b") === Seq("x"))
    assert(f(Seq(), "a", "b") === Seq())
    // merged symbols are atomic: (a,ba) does not fire inside (a,b,a)
    assert(f(Seq("a", "b", "a"), "a", "ba") === Seq("a", "b", "a"))
  }

  test("encode with trained merges yields the hand-computed per-doc counts") {
    val docs = Seq(
      (0L, "low low low newest newest"),
      (1L, "lower lower newest newest widest")
    ).toDF("doc_id", "text")
    // merges (w,e) then (l,o): low→[lo,w]=2, lower→[lo,we,r]=3,
    // newest→[n,e,we,s,t]=5, widest→[w,i,d,e,s,t]=6
    val rows = BpeTrain.encodeCounts(docs, "doc_id", "text", Seq(("w", "e"), ("l", "o")))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(rows(0L) === ((5L, 2L + 2L + 2L + 5L + 5L)))
    assert(rows(1L) === ((5L, 3L + 3L + 5L + 5L + 6L)))
  }

  test("vocab aggregates the final symbol multiset with weighted totals") {
    val docs = Seq(
      (0L, "low low low newest newest"),
      (1L, "lower lower newest newest widest")
    ).toDF("doc_id", "text")
    val v = BpeTrain.vocab(docs, "text", Seq(("w", "e"), ("l", "o")))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(v("lo") === ((5L, 2L))) // low x3 + lower x2, in 2 word types
    assert(v("we") === ((6L, 2L))) // lower x2 + newest x4
    assert(v("w") === ((4L, 2L)))  // low x3 + widest x1 (not merged there)
    assert(!v.contains("ne"))      // unlearned pairs never appear
  }

  test("merge kernel matches a reference implementation on random symbol arrays") {
    def reference(syms: Seq[String], a: String, b: String): Seq[String] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      var i = 0
      while (i < syms.length) {
        if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) {
          out += (a + b); i += 2
        } else { out += syms(i); i += 1 }
      }
      out.toSeq
    }
    val rnd = new scala.util.Random(7)
    val alphabet = Vector("a", "b", "ab", "c")
    val cases = Seq.fill(200)(
      Seq.fill(rnd.nextInt(12))(alphabet(rnd.nextInt(alphabet.length))))
    val df = cases.zipWithIndex.map { case (c, i) => (i.toLong, c) }.toDF("id", "syms")
    val got = df.select($"id", GraftFunctions.bpeMerge($"syms", "a", "b").as("m"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSeq).toMap
    cases.zipWithIndex.foreach { case (c, i) =>
      assert(got(i.toLong) === reference(c, "a", "b"), s"case $i: $c")
    }
  }

  test("merge kernel: codegen and interpreted paths agree, survives executor serialization") {
    val df = (1 to 100).map(i => (i.toLong, Seq("a", "b", "a", "a", "c")))
      .toDF("id", "syms").repartition(7)
    def run(codegen: String): Seq[Seq[String]] = {
      spark.conf.set("spark.sql.codegen.factoryMode", codegen)
      try df.select(GraftFunctions.bpeMerge($"syms", "a", "b").as("m"))
        .collect().toSeq.map(_.getSeq[String](0).toSeq)
      finally spark.conf.unset("spark.sql.codegen.factoryMode")
    }
    val cg = run("CODEGEN_ONLY")
    assert(cg === run("NO_CODEGEN"))
    assert(cg.forall(_ === Seq("ab", "a", "a", "c")))
  }

  test("exhausting the pair space stops early instead of looping") {
    val docs = Seq((0L, "ab cd")).toDF("doc_id", "text")
    // 2 words of 2 symbols each: rounds 1-2 merge them; round 3+ has no
    // pairs left — train must return only the learnable merges.
    val merges = BpeTrain.train(docs, "text", rounds = 10).collect()
    assert(merges.length === 2)
  }

  test("disjointAccept: rank-1 always accepted; blocked-by-blocked still blocks") {
    // (e,s) blocks (s,t) [shares s] and (w,e) [shares e]; (l,o) is disjoint
    // from ALL THREE higher candidates (accepted or not), so it passes;
    // (o,w) shares o with the accepted (l,o) — blocked.
    val pool = Seq(
      ("e", "s", 10L), ("s", "t", 9L), ("w", "e", 8L), ("l", "o", 7L), ("o", "w", 6L))
    assert(BpeTrain.disjointAccept(pool) === Seq(("e", "s", 10L), ("l", "o", 7L)))
    // produced-symbol collisions block too: ("a","b") produces "ab", so a
    // candidate consuming symbol "ab" — or re-producing it from another
    // split — conflicts even with {a,b} untouched.
    assert(BpeTrain.disjointAccept(Seq(("a", "b", 5L), ("ab", "c", 4L)))
      === Seq(("a", "b", 5L)))
    assert(BpeTrain.disjointAccept(Seq(("x", "yz", 5L), ("xy", "z", 4L)))
      === Seq(("x", "yz", 5L)))
  }

  test("disjointAccept properties on random pools: rank-1 in, result pairwise disjoint, order preserved") {
    val rnd = new scala.util.Random(11)
    val syms = Vector("a", "b", "c", "d", "e", "ab", "cd")
    for (_ <- 1 to 200) {
      val pool = Seq.fill(1 + rnd.nextInt(12))(
        (syms(rnd.nextInt(syms.length)), syms(rnd.nextInt(syms.length)), rnd.nextInt(100).toLong))
      val acc = BpeTrain.disjointAccept(pool)
      assert(acc.headOption === pool.headOption) // rank-1 always accepted
      // accepted set is pairwise symbol-disjoint (incl. produced symbols)
      val sets = acc.map { case (a, b, _) => Set(a, b, a + b) }
      for (i <- sets.indices; j <- 0 until i)
        assert((sets(i) & sets(j)).isEmpty, s"pool=$pool acc=$acc")
      // acceptance preserves pool order
      assert(acc.map(pool.indexOf) === acc.map(pool.indexOf).sorted)
    }
  }

  test("greedyAccept: superset density of disjointAccept, still pairwise disjoint") {
    // (s,t) is blocked by the REJECTED (e,s)? No — greedy: (e,s) accepted,
    // (s,t) shares s -> blocked; (w,e) shares e -> blocked; (l,o) in;
    // (o,w) shares o -> blocked. On a pool where a mid candidate is
    // rejected, greedy lets later ones through that declarative blocks:
    val pool = Seq(
      ("a", "b", 10L), // in
      ("b", "c", 9L),  // blocked by accepted (a,b)
      ("c", "d", 8L))  // greedy: in (only blocked-by-blocked); declarative: out
    assert(BpeTrain.greedyAccept(pool) === Seq(("a", "b", 10L), ("c", "d", 8L)))
    assert(BpeTrain.disjointAccept(pool) === Seq(("a", "b", 10L)))
    // random pools: greedy ⊇ declarative in count, both pairwise disjoint
    val rnd = new scala.util.Random(23)
    val syms = Vector("a", "b", "c", "d", "e", "f", "ab", "cd")
    for (_ <- 1 to 200) {
      val p = Seq.fill(1 + rnd.nextInt(12))(
        (syms(rnd.nextInt(syms.length)), syms(rnd.nextInt(syms.length)), rnd.nextInt(100).toLong))
      val g = BpeTrain.greedyAccept(p)
      assert(g.length >= BpeTrain.disjointAccept(p).length)
      val sets = g.map { case (a, b, _) => Set(a, b, a + b) }
      for (i <- sets.indices; j <- 0 until i)
        assert((sets(i) & sets(j)).isEmpty, s"pool=$p greedy=$g")
    }
  }

  test("trainBatched greedy packs rounds at least as densely, same kernel invariants") {
    val docs = Seq(
      (0L, "low low low newest newest"),
      (1L, "lower lower newest newest widest")
    ).toDF("doc_id", "text")
    val decl = BpeTrain.trainBatched(docs, "text", rounds = 3, poolK = 8).collect()
    val greedy = BpeTrain.trainBatched(docs, "text", rounds = 3, poolK = 8, greedy = true).collect()
    assert(greedy.length >= decl.length)
    greedy.groupBy(_.getInt(1)).foreach { case (_, g) =>
      val sets = g.map(r => Set(r.getString(2), r.getString(3), r.getString(2) + r.getString(3)))
      for (i <- sets.indices; j <- 0 until i)
        assert((sets(i) & sets(j)).isEmpty)
    }
  }

  test("trainBatched with poolK=1 degenerates to the sequential trainer") {
    val docs = Seq(
      (0L, "low low low newest newest"),
      (1L, "lower lower newest newest widest")
    ).toDF("doc_id", "text")
    val seq = BpeTrain.train(docs, "text", rounds = 4)
      .orderBy("merge_rank")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    val bat = BpeTrain.trainBatched(docs, "text", rounds = 4, poolK = 1)
      .orderBy("merge_rank")
      .collect().map(r => (r.getInt(0), r.getString(2), r.getString(3), r.getLong(4)))
    assert(bat === seq)
  }

  test("trainBatched learns multiple merges per round in far fewer jobs than merges") {
    // A corpus wide enough that each round's top-16 pool holds several
    // disjoint pairs — the scalable-vocabulary scenario.
    val words = Seq("alpha", "bravo", "chard", "delta", "echos", "fight",
      "golfs", "hotel", "index", "juk", "kilos", "limas", "mango", "night",
      "ocean", "pivot", "quake", "rusty")
    val docs = (0 until 40).map(i => (i.toLong, words.mkString(" "))).toDF("doc_id", "text")
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    val merges =
      try {
        val m = BpeTrain.trainBatched(docs, "text", rounds = 8, poolK = 32).collect()
        Thread.sleep(500) // let the async listener bus drain job-start events
        m
      } finally spark.sparkContext.removeSparkListener(listener)
    // Jobs are O(rounds), never O(merges): one pool collect per round (AQE
    // splits its shuffle stages into up to ~3 jobs on local) + eager
    // localCheckpoints + the final toDF collect. The sequential trainer
    // would pay the same ~3-job round cost PER MERGE.
    assert(merges.length > 30, s"only ${merges.length} merges learned")
    assert(jobs.get() <= 4 * 8 + 4, s"${jobs.get()} jobs for ${merges.length} merges")
    assert(jobs.get() < merges.length, "jobs must stay well below merges")
    // batched rounds really batch: at least one round accepted >1 merge
    val byRound = merges.groupBy(_.getInt(1)).map { case (_, g) => g.length }
    assert(byRound.exists(_ > 1))
    // accepted merges within a round are pairwise symbol-disjoint
    merges.groupBy(_.getInt(1)).foreach { case (_, g) =>
      val sets = g.map(r => Set(r.getString(2), r.getString(3), r.getString(2) + r.getString(3)))
      for (i <- sets.indices; j <- 0 until i)
        assert((sets(i) & sets(j)).isEmpty)
    }
  }

  test("token-id sequences agree with encode counts doc for doc") {
    val d = "/root/testdata/sf0.001"
    val ids = graft.queries.Corpus.all("q_t27_bpe_token_ids")(spark, d)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val counts = graft.queries.Corpus.all("q_t19_bpe_encode")(spark, d)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(ids.keySet === counts.keySet)
    ids.foreach { case (doc, n) =>
      assert(n === counts(doc), s"doc $doc: id-sequence length $n != encode count ${counts(doc)}")
    }
  }

  test("decode round-trip: concatenating final symbols reproduces every word") {
    import org.apache.spark.sql.functions._
    // merges only ever concatenate adjacent symbols, so the decode
    // (join the symbol sequence with no separator) must be lossless for
    // EVERY word in the corpus — the tokenizer-shipping guarantee
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val merges = BpeTrain.train(docs, "text", rounds = 8)
      .orderBy("merge_rank").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val words = docs
      .select(explode(TextFunctions.tokens(TextFunctions.normText(col("text")))).as("word"))
      .distinct()
    val symsFinal = merges.foldLeft(
      array_remove(split(col("word"), "(?!^)"), ""): org.apache.spark.sql.Column) {
      case (c, (a, b)) => graft.functions.GraftFunctions.bpeMerge(c, a, b)
    }
    val broken = words
      .select(col("word"), array_join(symsFinal, "").as("decoded"),
        size(symsFinal).as("n_sym"))
      .filter(col("decoded") =!= col("word") || col("n_sym") < 1)
    assert(broken.count() === 0L)
    // and the merges genuinely compress: some word ends with fewer symbols
    // than characters
    val compressed = words
      .select((size(symsFinal) < length(col("word"))).as("c"))
      .filter(col("c")).count()
    assert(compressed > 0L)
  }
}
