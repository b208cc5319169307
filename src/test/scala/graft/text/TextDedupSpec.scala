package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.dedup.Dedup
import graft.functions.{GraftFunctions, HashUtil}

class TextDedupSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (0L, "The quick brown fox jumps over the lazy dog"),
    (1L, "the  quick Brown fox jumps over the lazy dog"), // same after normalization
    (2L, "The quick brown fox jumps over the lazy cat"),  // near-dup of 0
    (3L, "completely different words entirely here now"),
    (4L, "")
  ).toDF("doc_id", "text")

  test("normText canonicalizes case and whitespace; fingerprints of dups collide") {
    val fps = docs.select($"doc_id", TextFunctions.fingerprintMd5($"text").as("fp"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(fps(0L) === fps(1L))
    assert(fps(0L) !== fps(2L))
  }

  test("tokenCount counts \\S+ runs; empty string has 0 tokens") {
    val counts = docs.select($"doc_id", TextFunctions.tokenCount($"text").as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(counts(0L) === 9)
    assert(counts(4L) === 0)
  }

  test("bpeTokenCount splits contractions, digits, and punctuation separately") {
    val rows = Seq(
      (0L, "don't stop"),          // "don" + "'t" + " stop"
      (1L, "I have 42 apples!"),   // "I" " have" " 42" " apples" "!"
      (2L, ""),
      (3L, "a,b")                  // "a" "," "b"
      ).toDF("doc_id", "text")
      .select($"doc_id", TextFunctions.bpeTokenCount($"text").as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(rows(0L) === 3)
    assert(rows(1L) === 5)
    assert(rows(2L) === 0)
    assert(rows(3L) === 3)
  }

  test("stopword ratio and language heuristic") {
    val r = docs.select(
      $"doc_id",
      TextFunctions.stopwordRatio(TextFunctions.tokens(lower($"text"))).as("ratio"))
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(math.abs(r(0L) - 2.0 / 9.0) < 1e-12) // "the" twice
    assert(r(3L) === 0.0)
    assert(r(4L) === 0.0) // guarded division
  }

  test("char shingles: distinct k-gram count; short strings yield 0") {
    val r = docs.select(
      $"doc_id", TextFunctions.charShingleCount(lit("abcabc"), 3).as("n")).head()
    assert(r.getInt(1) === 3) // abc, bca, cab, abc → 3 distinct
    val short = docs.sparkSession.range(1)
      .select(TextFunctions.charShingleCount(lit("ab"), 3).as("n")).head()
    assert(short.getInt(0) === 0)
    // multi-byte path: windows must be char-indexed, not byte-indexed
    // ("großgroß" is 8 chars / 10 bytes); expected count from JVM string
    // sliding-window semantics
    val text = "großgroß"
    val expected = text.sliding(3).toSeq.distinct.length
    val multi = docs.sparkSession.range(1)
      .select(TextFunctions.charShingleCount(lit(text), 3).as("n")).head()
    assert(multi.getInt(0) === expected)
    // umlauts in the middle must not shift window boundaries
    val mixed = "aüböaübö"
    val expectedMixed = mixed.sliding(3).toSeq.distinct.length
    val m2 = docs.sparkSession.range(1)
      .select(TextFunctions.charShingleCount(lit(mixed), 3).as("n")).head()
    assert(m2.getInt(0) === expectedMixed)
  }

  test("exact dedup groups identical canonical content") {
    val groups = Dedup.exactGroups(docs, "text", "doc_id")
      .orderBy("keep_id").collect()
    assert(groups.length === 4) // 0+1 merge
    val merged = groups.find(_.getAs[Long]("keep_id") == 0L).get
    assert(merged.getAs[Long]("n_copies") === 2L)
  }

  test("jaccard pairs rank the near-dup pair first") {
    val top = Dedup.jaccardPairs(docs, "doc_id", "text", 3, Int.MaxValue)
      .orderBy(desc("jaccard")).head()
    assert(Set(top.getAs[Long]("id1"), top.getAs[Long]("id2")) === Set(0L, 1L))
    assert(top.getAs[Double]("jaccard") === 1.0)
  }

  test("minhash LSH surfaces the planted near-dups and verifies with exact jaccard") {
    val pairs = Dedup.minhashNearDups(docs, "doc_id", "text",
      k = 3, numHashes = 16, bands = 8, maxBucket = 100, threshold = 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("simhash: identical-after-norm texts share a sketch; near-dups are close") {
    val sk = Dedup.withSimhash(spark, docs, "text")
      .select("doc_id", "simhash").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sk(0L) === sk(1L))
    assert(HashUtil.hamming64(sk(0L), sk(2L)) < HashUtil.hamming64(sk(0L), sk(3L)))
  }

  test("simhash hot-bucket sub-band refinement: pair set identical to the uncapped join") {
    val corpus = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    def pairSet(cap: Int) =
      Dedup.simhashNearDups(spark, corpus, "doc_id", "text", maxBandBucket = cap)
        .select("id1", "id2", "hamming")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // premise: cap 3 actually engages the refinement on this corpus (the
    // mass probe Σ bucket² > cap · rows must fire) — recomputed here so
    // the test fails loudly if a fixture change ever de-skews the sketches
    val sk = Dedup.withSimhash(spark, corpus, "text").select("simhash").distinct()
    val (mass, rows) = (0 until 4).map { i =>
      val h = sk.select((shiftrightunsigned($"simhash", i * 16) % 65536).as("v"))
        .groupBy("v").count()
        .agg(sum($"count" * $"count"), sum($"count")).head
      (h.getLong(0), h.getLong(1))
    }.reduce((a, b) => (a._1 + b._1, a._2 + b._2))
    assert(mass > 3L * rows, s"fixture de-skewed: mass $mass <= 3x$rows")
    // exactness: every pair found at block grain is re-found through the
    // remaining-bits sub-banding when its buckets go hot
    assert(pairSet(3) === pairSet(1000000))
  }

  test("simhash telemetry: forced engagement is self-describing; uncapped default never engages") {
    val corpus = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    // cap 1 makes every ≥2 bucket hot and every ≥2 sub-bucket shed: any
    // hamming 1..3 pair of distinct sketches agrees on ≥1 block (hot at
    // cap 1) and, within it, on ≥1 remaining-bits sub-piece (pigeonhole)
    // — so shed mass is guaranteed nonzero and the run must say so
    val (pairs, tel) = Dedup.simhashNearDupsWithTelemetry(
      spark, corpus, "doc_id", "text", maxHamming = 3, maxBandBucket = 1)
    assert(tel.engaged, s"cap 1 must engage on this corpus: $tel")
    assert(tel.bandMass > tel.linearBudget, s"$tel")
    assert(tel.hotBuckets > 0, s"$tel")
    assert(tel.shedSubBuckets > 0 && tel.shedSubMass > 0, s"$tel")
    // bounded, not broken: capped output is a subset of the exact set, and
    // the hamming-0 tier (identical sketches) is immune to shedding
    val exact = Dedup.simhashNearDups(spark, corpus, "doc_id", "text", maxHamming = 3)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val capped = pairs.select("id1", "id2", "hamming")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(capped.map(p => (p._1, p._2)).toSet.subsetOf(exact))
    val exactH0 = Dedup.simhashNearDups(spark, corpus, "doc_id", "text", maxHamming = 3)
      .filter(col("hamming") === 0).select("id1", "id2")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped.filter(_._3 == 0).map(p => (p._1, p._2)).toSet === exactH0)
    // the uncapped DEFAULT is exact: no probe, no engagement, no shed
    val (_, telDefault) = Dedup.simhashNearDupsWithTelemetry(
      spark, corpus, "doc_id", "text", maxHamming = 3)
    assert(!telDefault.engaged && telDefault.bandMass === -1L &&
      telDefault.shedSubBuckets === 0L && telDefault.shedSubMass === 0L)
  }

  test("langId3 separates genuine English, German, and French text") {
    val samples = Seq(
      (1L, "the cat and the dog sat on the mat in the house for a while", "en"),
      (2L, "der mann und die frau sind nicht mit dem hund in das haus gegangen", "de"),
      (3L, "die übung ist schön aber ich möchte größere häuser sehen", "de"), // accents carry it
      (4L, "le garçon et la fille vont dans les rues de la ville avec un ami", "fr"),
      (5L, "nous avons mangé à côté de la fenêtre une belle journée", "fr"), // accents carry it
      (6L, "zzz qqq xxx www", "other") // no profile clears the threshold
    ).toDF("doc_id", "text", "expected")
    val got = samples
      .select($"doc_id", $"expected", TextFunctions.langId3($"text").as("pred"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    got.foreach { case (id, expected, pred) =>
      assert(pred === expected, s"doc $id")
    }
  }

  test("langId5 separates all five supported languages and falls back to other") {
    val samples = Seq(
      (1L, "the cat and the dog sat on the mat in the house for a while", "en"),
      (2L, "der mann und die frau sind nicht mit dem hund in das haus gegangen", "de"),
      (3L, "le garçon et la fille vont dans les rues de la ville avec un ami", "fr"),
      (4L, "el perro y el gato no están en la casa pero es un buen día para los niños", "es"),
      (5L, "il cane e il gatto non sono nella casa ma è un bel giorno per i bambini più piccoli", "it"),
      (6L, "zzz qqq xxx www", "other")
    ).toDF("doc_id", "text", "expected")
    val got = samples
      .select($"doc_id", $"expected", TextFunctions.langId5($"text").as("pred"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    got.foreach { case (id, expected, pred) =>
      assert(pred === expected, s"doc $id")
    }
  }

  test("stripMarkup: tags out, entities decoded, &amp; decoded last, whitespace collapsed") {
    val cases = Seq(
      (0L, "<html><b>Hi</b> &amp; bye</html>", "Hi & bye"),
      // &amp;lt; must decode to literal "&lt;" (one pass), never to "<"
      (1L, "a &amp;lt;b&amp;gt; c", "a &lt;b&gt; c"),
      (2L, "<div class=\"x\">isn&#39;t&nbsp;&quot;quoted&quot;</div>", "isn't \"quoted\""),
      (3L, "no markup at all", "no markup at all"),
      (4L, "spaced   <p>  out  </p>  text", "spaced out text")
    ).toDF("id", "text", "expected")
    cases.select($"id", $"expected", TextFunctions.stripMarkup($"text").as("got"))
      .collect().foreach(r => assert(r.getString(2) === r.getString(1), s"case ${r.getLong(0)}"))
  }

  test("custom expressions: codegen result equals direct scala computation") {
    val row = docs.filter($"doc_id" === 0L).select(
      GraftFunctions.rollingHash(spark, $"text").as("rh"),
      GraftFunctions.simHash(spark, TextFunctions.tokens($"text")).as("sh"))
      .head()
    val text = "The quick brown fox jumps over the lazy dog"
    val expectedRh = HashUtil.rollingHash(
      org.apache.spark.unsafe.types.UTF8String.fromString(text))
    assert(row.getLong(0) === expectedRh)
  }

  test("mojibake repair: planted artifacts fix to the intended characters") {
    val rows = graft.queries.Corpus.all("q_t28_mojibake")(spark, "/root/testdata/sf0.001")
      .filter($"doc_id" >= 4950000L)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getBoolean(3))))
      .toMap
    assert(rows(4950000L) === (("Café résumé – it’s naïve", 6L, true)))
    assert(rows(4950001L) === (("“quoted–dash… and über öl ñ è", 7L, true)))
    assert(rows(4950002L) === (("perfectly clean ascii text here", 0L, false)))
  }

  test("canonicalUrl normalizes case, ports, params, slashes, fragments") {
    val cases = Seq(
      "HTTPS://Site.Example.COM:443//a//b/?utm_source=x&utm_medium=y#frag" ->
        "https://site.example.com/a/b",
      "https://site.example.com/a/b?id=2&utm_campaign=z" ->
        "https://site.example.com/a/b?id=2",
      "http://host.example.com:80/x/" -> "http://host.example.com/x",
      "https://site.example.com//a/b/" -> "https://site.example.com/a/b",
      // non-default port survives; params other than utm_* survive in order
      "https://h.example.com:8080/p?b=2&a=1" -> "https://h.example.com:8080/p?b=2&a=1",
      // utm in the middle of the query repairs separators
      "https://h.example.com/p?id=2&utm_a=1&x=3" -> "https://h.example.com/p?id=2&x=3",
      // "utm_" inside another param's VALUE or name is NOT a tracking
      // param — boundary anchoring must leave these alone
      "https://h.example.com/p?a=1xutm_p=1" -> "https://h.example.com/p?a=1xutm_p=1",
      "https://h.example.com/p?latitude_utm_zone=31" -> "https://h.example.com/p?latitude_utm_zone=31",
      // leading utm followed by a real param; several utms stacked
      "https://h.example.com/p?utm_a=1&id=2" -> "https://h.example.com/p?id=2",
      "https://h.example.com/p?utm_a=1&utm_b=2&id=3" -> "https://h.example.com/p?id=3",
      // PATH-LESS URLs: host lowercasing must stop at '?' — the query's
      // case survives (case-distinct resources must NOT collide), and
      // the default-port strip still anchors without a path
      "https://Path-Less.Example.com?id=AbC&utm_source=x" -> "https://path-less.example.com?id=AbC",
      "https://path-less.example.com:443?id=AbC" -> "https://path-less.example.com?id=AbC",
      "http://Host.Example.com:80?q=MiXeD" -> "http://host.example.com?q=MiXeD",
      "https://host.example.com:8443?q=X" -> "https://host.example.com:8443?q=X",
      // query values are opaque: slashes inside them survive untouched
      // (collapsing would falsely collide '?next=//x/' with '?next=/x')
      "https://h.example.com/p?next=//x/" -> "https://h.example.com/p?next=//x/",
      "https://h.example.com/p?next=/x" -> "https://h.example.com/p?next=/x",
      // ...while the PATH still collapses/strips with a query present
      "https://h.example.com//a//b/?id=1" -> "https://h.example.com/a/b?id=1")
    val got = cases.map(_._1).toDF("url")
      .select(TextFunctions.canonicalUrl($"url")).as[String].collect()
    got.zip(cases.map(_._2)).foreach { case (g, e) => assert(g === e) }
  }

  test("canonical-url dedup: every even/odd doc pair collapses to one resource") {
    val df = graft.queries.Corpus.all("q_t25_url_canonical")(spark, "/root/testdata/sf0.001")
    val rows = df.collect().map(r => (r.getLong(0), r.getString(2), r.getBoolean(3), r.getLong(4)))
    val corpus = rows.filter(_._1 < 4300000L)
    // pairs (2k, 2k+1) synthesize differently-messy URLs for the same
    // resource: every corpus group has exactly 2 members, keeper = even id
    assert(corpus.nonEmpty && corpus.forall(_._4 === 2L))
    corpus.foreach { case (id, _, keep, _) => assert(keep === (id % 2 == 0)) }
    // the planted cross-fixture dup group: 4300003 canonicalizes into
    // 4300000's URL; 4300000 (lower id) is the keeper
    val fx = rows.filter(_._1 >= 4300000L).map(r => r._1 -> r).toMap
    assert(fx(4300000L)._2 === fx(4300003L)._2)
    assert(fx(4300000L)._3 && !fx(4300003L)._3)
    assert(fx(4300001L)._3 && fx(4300002L)._3)
  }

  test("nfc: composes decomposed forms, ASCII fast path returns input unchanged") {
    val rows = Seq(
      (0L, "Cafe\u0301"),            // e + combining acute -> é
      (1L, "Caf\u00e9"),             // already composed
      (2L, "A\u030Angstro\u0308m"),  // ring + diaeresis decomposed
      (3L, "plain ascii"),
      (4L, "")
    ).toDF("doc_id", "text")
      .select($"doc_id", TextFunctions.nfc($"text").as("nfc"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows(0L) === "Caf\u00e9")
    assert(rows(1L) === "Caf\u00e9")
    assert(rows(2L) === "\u00c5ngstr\u00f6m")
    assert(rows(3L) === "plain ascii")
    assert(rows(4L) === "")
    // q_t29: the planted decomposed/composed pair collides into one group
    val q = graft.queries.Corpus.all("q_t29_nfc_normalize")(spark, "/root/testdata/sf0.001")
      .filter(col("doc_id") >= 4960000L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getBoolean(2),
        r.getBoolean(3), r.getLong(4)))
    val byId = q.map(r => r._1 -> r).toMap
    assert(byId(4960000L)._2 === byId(4960001L)._2) // identical after NFC
    assert(byId(4960000L)._3 && !byId(4960001L)._3) // only the decomposed row changed
    assert(byId(4960000L)._4 && !byId(4960001L)._4) // min id keeps
    assert(byId(4960000L)._5 === 2L && byId(4960002L)._5 === 1L)
  }

  test("portableMinhashCandidates: exact clones always collide, disjoint docs never") {
    // 30 distinct base docs of 12 unique words each + an exact clone of
    // every doc under id+100: identical shingle sets => identical
    // signatures => every band collides => every clone pair MUST appear
    // (the deterministic recall floor); disjoint-vocabulary docs share no
    // shingle, so a pair of them can only appear via a 4-slot band
    // collision of a bijective family — assert none at this tiny scale
    val words = (0 until 500).map(i => s"w$i")
    val base = (0L until 30L).map { d =>
      (d, (0 until 12).map(j => words((d * 12 + j).toInt)).mkString(" "))
    }
    val all = (base ++ base.map { case (d, t) => (d + 100L, t) }).toDF("doc_id", "text")
    val pairs = Dedup.portableMinhashCandidates(all, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    (0L until 30L).foreach { d =>
      assert(pairs.contains((d, d + 100L)), s"clone pair $d missing")
    }
    assert(pairs.size === 30, s"spurious cross-doc candidates: ${pairs.size - 30}")
  }

  test("fuzzy pipeline q_dd11: planted near-clones surface as is_dup with small edit_ratio") {
    val df = graft.queries.Corpus.all("q_dd11_fuzzy_pipeline")(spark, "/root/testdata/sf0.001")
    val rows = df.collect().map(r => (r.getLong(0), r.getLong(1),
      r.getDouble(4), r.getInt(5), r.getDouble(6), r.getBoolean(7)))
    // the planted (d, d+3000000) suffix-perturbed clones: high-but-sub-1
    // jaccard, nonzero edit distance = exactly the suffix length, and the
    // is_dup gate must be the (jaccard, edit_ratio) conjunction (on the
    // shortest sf0.001 docs the 15-char suffix legitimately pushes
    // edit_ratio past the 0.2 cap — the verify tier REJECTING a
    // high-jaccard candidate is the tier doing its job)
    val planted = rows.filter { case (a, b, _, _, _, _) => b === a + 3000000L }
    assert(planted.nonEmpty, "no planted clone pair survived banding")
    planted.foreach { case (_, _, j, ed, er, dup) =>
      assert(j > 0.5 && j < 1.0)
      assert(ed > 0 && ed <= " qq zz qq zz qq".length)
      assert(er > 0.0 && er < 0.5)
      assert(dup === (j >= 0.5 && er <= 0.2))
    }
    assert(planted.exists(_._6), "no planted pair passed the verify gate")
  }

  test("lsh recall eval q_dd13: consistent counts, high recall on planted structure") {
    val r = graft.queries.Corpus.all("q_dd13_lsh_recall")(spark, "/root/testdata/sf0.001")
      .head()
    val (nTruth, nCand, nHits) = (r.getLong(0), r.getLong(1), r.getLong(2))
    val (recall, precision) = (r.getDouble(3), r.getDouble(4))
    assert(nHits <= math.min(nTruth, nCand))
    assert(recall === nHits.toDouble / nTruth)
    assert(precision === nHits.toDouble / nCand)
    // the planted near-clones guarantee a populated truth set, and a
    // 16-hash/4-band sketch at Jaccard >= 0.5 must catch most of it
    assert(nTruth >= 60L, s"truth set too small: $nTruth")
    assert(recall > 0.8, s"recall $recall")
  }

  test("fuzzy capstone q_dd12: clone clusters resolve to the base keeper") {
    val d = "/root/testdata/sf0.001"
    val pairs = graft.queries.Corpus.all("q_dd11_fuzzy_pipeline")(spark, d)
      .filter(col("is_dup"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val rows = graft.queries.Corpus.all("q_dd12_fuzzy_clusters")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2), r.getLong(3)))
    val byId = rows.map(r => r._1 -> r).toMap
    // every universe doc appears exactly once; keepers keep themselves
    rows.foreach { case (id, keeper, keep, size) =>
      assert(keeper <= id && size >= 1L)
      assert(keep === (id === keeper))
      assert(byId(keeper)._3, s"keeper $keeper of $id must itself be kept")
    }
    // every verified dup pair landed in one cluster, keeper = min reachable
    pairs.foreach { case (a, b) =>
      assert(byId(a)._2 === byId(b)._2, s"pair ($a,$b) split across clusters")
      assert(byId(a)._2 <= math.min(a, b))
    }
    // singletons (no verified pair) keep themselves with cluster_size 1
    val inPairs = pairs.flatMap(p => Seq(p._1, p._2))
    rows.filter(r => !inPairs.contains(r._1)).foreach { case (id, keeper, keep, size) =>
      assert(keeper === id && keep && size === 1L)
    }
  }
}
