package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSpec

/** The property tests SURVEY §5.2(5) declares, driven by ScalaCheck
  * generators (plain Prop + Test.check — no scalatest bridge needed).
  * Few-iteration parameters keep the Spark-job count sane. */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private val params = SCTest.Parameters.default
    .withMinSuccessfulTests(6)
    .withInitialSeed(org.scalacheck.rng.Seed(42L))

  private def check(prop: Prop): Unit = {
    val res = SCTest.check(params, prop)
    assert(res.passed, res.status.toString)
  }

  private val rowsGen: Gen[List[(String, Int, Double)]] =
    Gen.nonEmptyListOf(for {
      k <- Gen.oneOf("a", "b", "c")
      t <- Gen.choose(0, 20)
      v <- Gen.choose(-100, 100).map(_ / 4.0)
    } yield (k, t, v))

  test("lag(1) then lead(1) is the identity on interior rows of every series") {
    check(Prop.forAll(rowsGen) { rows =>
      // unique (key, t) grain — lag/lead need a total per-key order
      val df = rows.distinctBy(r => (r._1, r._2)).toDF("k", "t", "v")
      val w = Window.partitionBy("k").orderBy("t")
      val roundTrip = df
        .withColumn("lagged", lag($"v", 1).over(w))
        .withColumn("back", lead($"lagged", 1).over(w))
      // rows with both neighbours defined must round-trip exactly
      roundTrip.filter($"back".isNotNull).filter($"back" =!= $"v").count() == 0L
    })
  }

  test("unionByName is invariant to column permutation of the right side") {
    check(Prop.forAll(rowsGen) { rows =>
      val df = rows.toDF("k", "t", "v")
      val permuted = df.select($"v", $"k", $"t") // scrambled order
      val a = df.unionByName(permuted).collect().map(_.toSeq).sortBy(_.toString)
      val b = df.union(df).collect().map(_.toSeq).sortBy(_.toString)
      a.toSeq == b.toSeq
    })
  }

  test("dropDuplicates is idempotent and reaches the distinct count") {
    check(Prop.forAll(rowsGen) { rows =>
      val withDups = rows ++ rows.take(rows.size / 2)
      val df = withDups.toDF("k", "t", "v")
      val once = df.dropDuplicates()
      once.count() == rows.distinct.size.toLong &&
        once.dropDuplicates().count() == once.count()
    })
  }

  test("salted aggregation equals the plain aggregation for any salt count") {
    import graft.operators.Skew
    val saltsGen = Gen.choose(1, 64)
    check(Prop.forAll(rowsGen, saltsGen) { (rows, salts) =>
      val df = rows.toDF("k", "t", "v")
      val plain = df.groupBy("k")
        .agg(sum($"t").as("s"), count(lit(1)).as("n"), max($"t").as("mx"))
        .collect().map(_.toSeq).sortBy(_.toString)
      val salted = Skew.saltedAgg(df, Seq("k"), Seq(
        Skew.sumLong("t", "s"), Skew.countAll("n"), Skew.maxOf("t", "mx")), salts)
        .collect().map(_.toSeq).sortBy(_.toString)
      plain.toSeq == salted.toSeq
    })
  }

  test("langId3 is total and deterministic over arbitrary strings") {
    import graft.text.TextFunctions
    val textGen = Gen.listOf(Gen.oneOf(
      "the", "der", "le", "und", "et", "zzz", "x1", "", " ", "über", "à",
      "data!", "12.5", "\t")).map(_.mkString(" "))
    check(Prop.forAll(Gen.nonEmptyListOf(textGen)) { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
      val out = df.select($"id", TextFunctions.langId3($"text").as("p"))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      val again = df.repartition(7).select($"id", TextFunctions.langId3($"text").as("p"))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      val valid = Set("en", "de", "fr", "other")
      out.values.forall(valid.contains) && out == again
    })
  }

  test("charShingleCount equals JVM sliding-window distinct on arbitrary unicode text") {
    import org.apache.spark.unsafe.types.UTF8String
    // pure-JVM kernel calls — thousands of samples cost nothing
    val fastParams = SCTest.Parameters.default
      .withMinSuccessfulTests(2000)
      .withInitialSeed(org.scalacheck.rng.Seed(42L))
    val charGen = Gen.frequency(
      (8, Gen.alphaNumChar.map(_.toString)),
      (2, Gen.oneOf(" ", "\t")),
      (3, Gen.oneOf("ä", "ß", "é", "ü", "中", "文", "🙂")))
    val textGen = Gen.listOf(charGen).map(_.mkString)
    val prop = Prop.forAll(textGen, Gen.choose(1, 6)) { (s, k) =>
      // reference model over CODE POINTS (the kernel's char unit) — Java's
      // String.sliding counts UTF-16 units and would miscount emoji
      val cps = s.codePoints().toArray.map(cp => new String(Character.toChars(cp)))
      val expected = cps.sliding(k).filter(_.length == k).map(_.mkString).toSeq.distinct.length
      graft.functions.HashUtil.charShingleCount(UTF8String.fromString(s), k) == expected
    }
    val res = SCTest.check(fastParams, prop)
    assert(res.passed, res.status.toString)
  }

  test("tokenize equals \\S+ run splitting on arbitrary unicode text") {
    import org.apache.spark.unsafe.types.UTF8String
    val fastParams = SCTest.Parameters.default
      .withMinSuccessfulTests(2000)
      .withInitialSeed(org.scalacheck.rng.Seed(43L))
    val charGen = Gen.frequency(
      (6, Gen.alphaNumChar),
      (3, Gen.oneOf(' ', '\t', '\n', '\r', '\f')),
      (2, Gen.oneOf('ä', 'ß', 'é', '中')))
    val textGen = Gen.listOf(charGen).map(_.mkString)
    val prop = Prop.forAll(textGen) { s =>
      val expected = s.split("\\s+").filter(_.nonEmpty).toSeq
      val got = {
        val arr = graft.functions.HashUtil.tokenize(UTF8String.fromString(s))
        (0 until arr.numElements()).map(i => arr.getUTF8String(i).toString)
      }
      got == expected
    }
    val res = SCTest.check(fastParams, prop)
    assert(res.passed, res.status.toString)
  }

  test("aggregation to the daily grain preserves the quantity total") {
    val linesGen = Gen.nonEmptyListOf(for {
      c <- Gen.oneOf("UK", "FR")
      s <- Gen.oneOf("s1", "s2", "s3")
      d <- Gen.choose(1, 9)
      q <- Gen.choose(-5, 40)
    } yield (c, s, f"1999-01-0$d", q.toLong))
    check(Prop.forAll(linesGen) { rows =>
      val lines = rows.toDF("Country", "StockCode", "d", "Quantity")
        .withColumn("InvoiceDate", to_date($"d"))
        .withColumn("UnitPrice", lit(1.0))
        .withColumn("LineRevenue", $"Quantity" * 1.0)
      val daily = graft.forecast.Forecast.dailySales(lines)
      val lineTotal = rows.map(_._4).sum
      val grainTotal = daily.agg(sum($"NetDailyQuantity")).head.getLong(0)
      grainTotal == lineTotal
    })
  }

  private val cdcGen: Gen[(List[(Long, Double)], List[(Long, Double, Boolean)])] =
    for {
      base <- Gen.nonEmptyListOf(for {
        k <- Gen.choose(1L, 30L); v <- Gen.choose(-50, 50).map(_ / 2.0)
      } yield (k, v)).map(_.distinctBy(_._1))
      cs <- Gen.listOf(for {
        k <- Gen.choose(1L, 40L); v <- Gen.choose(-50, 50).map(_ / 2.0)
        del <- Gen.oneOf(true, false)
      } yield (k, v, del)).map(_.distinctBy(_._1))
    } yield (base, cs)

  test("mergeUpsert is idempotent: re-applying a changeset changes nothing") {
    import graft.operators.Output
    check(Prop.forAll(cdcGen) { case (base, cs) =>
      val b = base.toDF("k", "v")
      val c = cs.toDF("k", "v", "del")
      def canon(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1).toSeq
      val once = Output.mergeUpsert(b, c, Seq("k"), Some("del"))
      val twice = Output.mergeUpsert(once, c, Seq("k"), Some("del"))
      canon(once) == canon(twice)
    })
  }

  test("snapshotDiff of a table against itself is empty; against the merge it inverts the changeset") {
    import graft.operators.{Cdc, Output}
    check(Prop.forAll(cdcGen) { case (base, cs) =>
      val b = base.toDF("k", "v")
      val c = cs.toDF("k", "v", "del")
      val merged = Output.mergeUpsert(b, c, Seq("k"), Some("del"))
      val self = Cdc.snapshotDiff(b, b, Seq("k")).count() == 0L
      // every diff row's key must be a changeset key (untouched keys vanish)
      val diffKeys = Cdc.snapshotDiff(b, merged, Seq("k"))
        .select("k").collect().map(_.getLong(0)).toSet
      val csKeys = cs.map(_._1).toSet
      self && diffKeys.subsetOf(csKeys)
    })
  }

  test("scd2 is lossless compression: each log event is covered by exactly one matching version") {
    import graft.operators.Cdc
    val logGen = Gen.nonEmptyListOf(for {
      k <- Gen.choose(1L, 5L); t <- Gen.choose(1, 50); a <- Gen.oneOf("A", "B", "C")
    } yield (k, t, a)).map(_.distinctBy(r => (r._1, r._2)))
    check(Prop.forAll(logGen) { rows =>
      val log = rows.toDF("k", "t", "attr")
      val dim = Cdc.scd2(log, Seq("k"), "t", Seq("attr"))
      // as-of lookup of every original event into the dimension: exactly
      // one covering version, and its attribute matches the event's
      val covered = log.as("l").join(dim.as("d"),
        $"l.k" === $"d.k" && $"l.t" >= $"d.effective_from" &&
          ($"d.effective_to".isNull || $"l.t" < $"d.effective_to"))
      covered.count() == log.count() &&
        covered.filter($"l.attr" =!= $"d.attr").count() == 0L
    })
  }

  test("zValue is a bijection on the [0,2^b)² grid") {
    import graft.operators.ZOrder
    val pts = for (x <- 0 until 16; y <- 0 until 16) yield (x, y)
    val zs = pts.toDF("x", "y")
      .select(ZOrder.zValue($"x", $"y", 4).as("z"))
      .collect().map(_.getLong(0))
    assert(zs.distinct.length === 256 && zs.min === 0L && zs.max === 255L)
  }
}
