package graft.queries

import graft.SparkSpec

/** q_tp9: exact duplicated-span geometry — the Lee-et-al repeated-substring
  * primitive at token-span granularity. */
class SpanDedupSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"
  private val L = 8

  private lazy val spans = Corpus.spanDedup(spark, d).collect()
    .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3)))

  test("every span is at least L tokens and internally consistent") {
    assert(spans.nonEmpty)
    spans.foreach { case (id, s, e, n) =>
      assert(n == e - s + 1, s"doc $id span [$s,$e] claims $n tokens")
      assert(n >= L, s"doc $id span [$s,$e] shorter than a single shingle")
      assert(s >= 1)
    }
  }

  test("per-doc spans are maximal: disjoint and never mergeable") {
    spans.groupBy(_._1).foreach { case (id, ss) =>
      val sorted = ss.sortBy(_._2)
      sorted.sliding(2).foreach {
        case Array((_, _, e1, _), (_, s2, _, _)) =>
          // a start at p2 merges into the previous island iff
          // p2 <= prevMaxStart + L, i.e. s2 - 1 <= e1 + 1 ⇒ kept spans
          // must begin at least 2 tokens past the previous end
          assert(s2 >= e1 + 2, s"doc $id spans [..,$e1] and [$s2,..] should have merged")
        case _ => ()
      }
    }
  }

  test("interior-slice clones are one full-coverage span, originals get [11,40]") {
    val cloneSpans = spans.filter(_._1 >= 4000000L).groupBy(_._1)
    assert(cloneSpans.nonEmpty, "no clone docs detected — injection broken")
    cloneSpans.foreach { case (id, ss) =>
      // the clone IS a copied 30-token slice: every shingle duplicates the
      // original, so exactly one span covering tokens 1..30
      assert(ss.length == 1, s"clone $id split into ${ss.length} spans")
      val (_, s, e, _) = ss.head
      assert(s == 1 && e == 30, s"clone $id span [$s,$e] != [1,30]")
      // and the original carries the mirrored interior span (possibly wider
      // if natural duplication extends it, but it must cover [11,40])
      val orig = spans.filter(t => t._1 == id - 4000000L)
      assert(orig.exists(t => t._2 <= 11 && t._3 >= 40),
        s"original ${id - 4000000L} has no span covering tokens 11..40")
    }
  }

  test("span scrub: clones fully dropped, kept set equals a driver-side replay") {
    val rows = Corpus.spanScrub(spark, d).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    val cloneIds = rows.keys.filter(_ >= 4000000L)
    assert(cloneIds.nonEmpty)
    cloneIds.foreach { id =>
      val (n, dropped, text) = rows(id)
      // a clone is ALWAYS a later occurrence (its original's doc_id
      // precedes), so every covering window is scrub → all tokens dropped
      assert(dropped === n && text.isEmpty, s"clone $id kept ${n - dropped} tokens")
    }
    // reassembly conservation
    rows.foreach { case (id, (n, dropped, text)) =>
      val keptTokens = if (text.isEmpty) 0 else text.split(" ").length
      assert(keptTokens === (n - dropped).toInt, s"doc $id reassembly mismatch")
    }
    // full independent replay in plain Scala: first-occurrence flags +
    // difference-array coverage, token kept iff some covering window is
    // novel. (Note: "originals keep everything" would be false — fixture
    // docs can themselves be partial later copies of earlier docs.)
    val toks = graft.Tables.documents(spark, d)
      .selectExpr("doc_id", "regexp_replace(lower(trim(text)), '\\\\s+', ' ') AS n")
      .collect().map(r => r.getLong(0) -> r.getString(1).split(" ").toSeq).toMap
    val cloneToks = toks.collect {
      case (id, ts) if id < 60 && ts.length >= 40 => (id + 4000000L) -> ts.slice(10, 40)
    }
    val all = (toks ++ cloneToks).toSeq.sortBy(_._1)
    val occ = scala.collection.mutable.Map.empty[String, List[(Long, Int)]]
    all.foreach { case (id, ts) =>
      if (ts.length >= L) ts.sliding(L).zipWithIndex.foreach { case (sh, i) =>
        val k = sh.mkString(" ")
        occ(k) = (id, i + 1) :: occ.getOrElse(k, Nil)
      }
    }
    val firstOf = occ.view.mapValues(v => (v.map(_._1).min, v.filter(_._1 == v.map(_._1).min).map(_._2).min)).toMap
    val counts = occ.view.mapValues(_.size).toMap
    val expected = all.map { case (id, ts) =>
      val cs = new Array[Int](ts.length + L + 2)
      val cn = new Array[Int](ts.length + L + 2)
      if (ts.length >= L) ts.sliding(L).zipWithIndex.foreach { case (sh, i0) =>
        val k = sh.mkString(" ")
        val p = i0 + 1
        val scrub = counts(k) > 1 && firstOf(k) != ((id, p))
        val (a, b) = if (scrub) (cs, cn) else (cn, cs)
        a(p) += 1; a(p + L) -= 1; val _ = b
      }
      var s = 0; var nvl = 0; var droppedN = 0
      (1 to ts.length).foreach { t =>
        s += cs(t); nvl += cn(t)
        if (s > 0 && nvl == 0) droppedN += 1
      }
      id -> droppedN.toLong
    }.toMap
    rows.foreach { case (id, (_, dropped, _)) =>
      assert(dropped === expected(id), s"doc $id dropped $dropped, replay says ${expected(id)}")
    }
  }

  test("fused shingle-hash kernel equals the naive md5-of-joined-slice path") {
    import org.apache.spark.sql.functions._
    val base = graft.Tables.documents(spark, d).limit(50)
      .select(col("doc_id"),
        graft.text.TextFunctions.tokens(
          graft.text.TextFunctions.normText(col("text"))).as("toks"))
    def collect(c: org.apache.spark.sql.Column): Map[Long, Seq[String]] =
      base.select(col("doc_id"), c.as("hs")).collect()
        .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val naive = collect(
      when(size(col("toks")) >= L,
        transform(sequence(lit(1), size(col("toks")) - lit(L - 1)),
          i => md5(array_join(slice(col("toks"), i, lit(L)), " "))))
        .otherwise(array().cast("array<string>")))
    val fused = collect(graft.functions.GraftFunctions.shingleHashes(col("toks"), L))
    assert(fused === naive)
    // and codegen vs interpreted agree
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    val interp =
      try collect(graft.functions.GraftFunctions.shingleHashes(col("toks"), L))
      finally spark.conf.unset("spark.sql.codegen.factoryMode")
    assert(interp === fused)
  }

  test("non-array<string> input to the shingle kernel fails at analysis") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val bad = Seq((1L, Seq(1, 2, 3))).toDF("doc_id", "toks") // array<int>
    val ex = intercept[org.apache.spark.sql.AnalysisException] {
      bad.select(graft.functions.GraftFunctions.shingleHashes(col("toks"), L)).collect()
    }
    assert(ex.getMessage.contains("graft_shingle_hashes requires array<string>"))
  }

  test("independent driver-side replay reproduces the exact span set") {
    // recompute shingle multiplicity and island merging from raw normalized
    // text (plain Scala, a completely different construction than the
    // query's transform/sequence + window path) and require the identical
    // (doc, start, end) set
    val toks = graft.Tables.documents(spark, d)
      .selectExpr("doc_id", "regexp_replace(lower(trim(text)), '\\\\s+', ' ') AS n")
      .collect().map(r => r.getLong(0) -> r.getString(1).split(" ").toSeq).toMap
    val cloneToks = toks.collect {
      case (id, ts) if id < 60 && ts.length >= 40 => (id + 4000000L) -> ts.slice(10, 40)
    }
    val all = toks ++ cloneToks
    val counts = all.values.flatMap(ts => ts.sliding(L).map(_.mkString(" ")))
      .foldLeft(Map.empty[String, Int]) { (m, sh) => m.updated(sh, m.getOrElse(sh, 0) + 1) }
    val expected = all.toSeq.flatMap { case (id, ts) =>
      val dupStarts = (1 to (ts.length - L + 1))
        .filter(p => counts(ts.slice(p - 1, p - 1 + L).mkString(" ")) > 1)
      dupStarts.foldLeft(List.empty[(Int, Int)]) {
        case ((s0, p0) :: rest, p) if p <= p0 + L => (s0, p) :: rest
        case (acc, p) => (p, p) :: acc
      }.map { case (s, pMax) => (id, s, pMax + L - 1) }
    }.toSet
    assert(spans.map(t => (t._1, t._2, t._3)).toSet == expected)
  }

  test("tp13 decontamination: planted benchmark slices are excised exactly") {
    val df = Corpus.all("q_tp13_decontam_scrub")(spark, "/root/testdata/sf0.001")
    // the benchmark probe must broadcast (the corpus side never shuffles
    // on the shingle key)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftSemi"),
      s"benchmark probe should be a broadcast left-semi join:\n$plan")
    val rows = df.collect()
    // no benchmark docs in the output; planted rows present
    assert(rows.forall(_.getLong(0) % 17 != 0 || rows.isEmpty))
    val planted = rows.filter(_.getLong(0) >= 4500000L)
    assert(planted.nonEmpty, "no planted contaminated rows")
    planted.foreach { r =>
      // 3 fresh prefix + 20 benchmark + 3 fresh suffix tokens: exactly the
      // 20 benchmark-slice tokens are cut, the fresh framing survives
      assert(r.getLong(1) === 26L, s"doc ${r.getLong(0)}: n_tokens ${r.getLong(1)}")
      assert(r.getLong(2) === 20L, s"doc ${r.getLong(0)}: n_dropped ${r.getLong(2)}")
      assert(r.getString(3) === "fresh opening words fresh closing words")
    }
    // clean corpus docs with no benchmark overlap pass through untouched
    assert(rows.exists(r => r.getLong(2) === 0L && r.getLong(1) > 0L))
  }
}
