package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.text.TextFunctions

/** Direct unit coverage for the fused multi-list / multi-class counting
  * expressions (ListHitsExpr, CharClassCountsExpr): agreement with the
  * reference filter/array_contains and regexp_replace formulations, bitmask
  * overlap, null/empty inputs, codegen vs interpreted parity, and executor
  * serialization of the driver-built lookup maps. */
class ListHitsSpec extends SparkSpec {
  import spark.implicits._

  private val lists = Seq(
    TextFunctions.Stopwords, TextFunctions.StopwordsDe, TextFunctions.StopwordsFr,
    TextFunctions.StopwordsEs, TextFunctions.StopwordsIt)
  private val classes = Seq(
    TextFunctions.AccentsDe, TextFunctions.AccentsFr,
    TextFunctions.AccentsEs, TextFunctions.AccentsIt)

  private val texts = Seq(
    "the quick brown fox and the lazy dog",
    "der hund und die katze sind nicht in dem haus",
    "le chat est dans la maison et je ne pense pas",
    "el perro y el gato no están en la casa",
    "il cane e il gatto non sono nella casa più",
    "große tür schön für die übung émigré çà où",
    "no stop words here whatsoever",
    "",
    "   ",
    "the the the der der le el il e y und")

  test("listHits matches the per-list filter/array_contains counts") {
    val df = texts.toDF("text")
      .select(TextFunctions.tokens(TextFunctions.normText(col("text"))).as("toks"))
      .select(
        col("toks"),
        GraftFunctions.listHits(col("toks"), lists).as("fused"),
        array(lists.map(ws =>
          size(filter(col("toks"), t => array_contains(typedLit(ws), t)))): _*).as("ref"))
    df.collect().foreach { r =>
      assert(r.getSeq[Int](1) === r.getSeq[Int](2), s"toks=${r.getSeq[String](0)}")
    }
  }

  test("charClassCounts matches the regexp_replace length-diff counts") {
    val df = texts.toDF("text")
      .select(lower(col("text")).as("norm"))
      .select(
        col("norm"),
        GraftFunctions.charClassCounts(col("norm"), classes).as("fused"),
        array(classes.map(cls =>
          length(col("norm")) - length(regexp_replace(col("norm"), s"[$cls]", ""))): _*)
          .as("ref"))
    df.collect().foreach { r =>
      assert(r.getSeq[Int](1) === r.getSeq[Int](2), s"norm=${r.getString(0)}")
    }
  }

  test("bitmask overlap: a token/char in several lists counts once per list") {
    // "la" is in both the French and Italian lists; "e" is Italian-only;
    // "en" is Spanish-only ("in" is the English form).
    val row = Seq(Seq("la", "e", "en", "zzz")).toDF("toks")
      .select(GraftFunctions.listHits(col("toks"), lists).as("h"))
      .head.getSeq[Int](0)
    assert(row === Seq(0, 0, 1, 1, 2))
    // 'é' is in the fr, es and it accent classes; 'ß' de-only.
    val ch = Seq("éß").toDF("s")
      .select(GraftFunctions.charClassCounts(col("s"), classes).as("c"))
      .head.getSeq[Int](0)
    assert(ch === Seq(1, 1, 1, 1))
  }

  test("null and empty inputs") {
    val df = Seq[Option[Seq[String]]](None, Some(Seq.empty), Some(Seq("the")))
      .toDF("toks")
      .select(GraftFunctions.listHits(col("toks"), Seq(TextFunctions.Stopwords)).as("h"))
    val rows = df.collect()
    assert(rows(0).isNullAt(0)) // null array -> null (nullSafeEval)
    assert(rows(1).getSeq[Int](0) === Seq(0))
    assert(rows(2).getSeq[Int](0) === Seq(1))

    val sdf = Seq[Option[String]](None, Some(""), Some("ä"))
      .toDF("s")
      .select(GraftFunctions.charClassCounts(col("s"), Seq("äö")).as("c"))
    val srows = sdf.collect()
    assert(srows(0).isNullAt(0))
    assert(srows(1).getSeq[Int](0) === Seq(0))
    assert(srows(2).getSeq[Int](0) === Seq(1))
  }

  test("null tokens inside the array are skipped") {
    val df = Seq(1).toDF("i")
      .select(array(lit("the"), lit(null).cast("string"), lit("fox")).as("toks"))
      .select(GraftFunctions.listHits(col("toks"), Seq(TextFunctions.Stopwords)).as("h"))
    assert(df.head.getSeq[Int](0) === Seq(1))
  }

  test("codegen and interpreted paths agree") {
    val base = texts.toDF("text")
      .select(TextFunctions.tokens(lower(col("text"))).as("toks"), lower(col("text")).as("norm"))
    def run(codegen: String): Seq[(Seq[Int], Seq[Int])] = {
      spark.conf.set("spark.sql.codegen.factoryMode", codegen)
      try base.select(
          GraftFunctions.listHits(col("toks"), lists).as("h"),
          GraftFunctions.charClassCounts(col("norm"), classes).as("c"))
        .collect().toSeq.map(r => (r.getSeq[Int](0), r.getSeq[Int](1)))
      finally spark.conf.unset("spark.sql.codegen.factoryMode")
    }
    assert(run("CODEGEN_ONLY") === run("NO_CODEGEN"))
  }

  test("lookup maps survive executor serialization (repartitioned frame)") {
    val df = (1 to 200).map(i => s"the der le el il doc $i").toDF("text")
      .repartition(7)
      .select(GraftFunctions.listHits(
        TextFunctions.tokens(col("text")), lists).as("h"))
    val rows = df.collect()
    assert(rows.length === 200)
    assert(rows.forall(_.getSeq[Int](0) === Seq(1, 1, 1, 1, 1)))
  }

  test("more than 32 lists is rejected eagerly") {
    val tooMany = Seq.fill(33)(Seq("x"))
    intercept[IllegalArgumentException] {
      GraftFunctions.listHits(col("toks"), tooMany)
    }
    intercept[IllegalArgumentException] {
      GraftFunctions.charClassCounts(col("s"), Seq.fill(33)("a"))
    }
  }

  test("fused langScores5 is bit-identical to the per-list reference formulas") {
    val df = texts.toDF("text")
    val norm = TextFunctions.normText(col("text"))
    val toks = TextFunctions.tokens(norm)
    val fused = TextFunctions.langScores5(col("text")).map(_._2)
    val ref = Seq(
      TextFunctions.ratioIn(toks, TextFunctions.Stopwords),
      TextFunctions.ratioIn(toks, TextFunctions.StopwordsDe) +
        lit(5.0) * TextFunctions.accentRatio(norm, TextFunctions.AccentsDe),
      TextFunctions.ratioIn(toks, TextFunctions.StopwordsFr) +
        lit(5.0) * TextFunctions.accentRatio(norm, TextFunctions.AccentsFr),
      TextFunctions.ratioIn(toks, TextFunctions.StopwordsEs) +
        lit(5.0) * TextFunctions.accentRatio(norm, TextFunctions.AccentsEs),
      TextFunctions.ratioIn(toks, TextFunctions.StopwordsIt) +
        lit(5.0) * TextFunctions.accentRatio(norm, TextFunctions.AccentsIt))
    val rows = df.select((fused ++ ref).map(c => c.cast("double")): _*).collect()
    rows.foreach { r =>
      (0 until 5).foreach { i =>
        assert(java.lang.Double.doubleToLongBits(r.getDouble(i)) ===
          java.lang.Double.doubleToLongBits(r.getDouble(i + 5)),
          s"lang slot $i differs: ${r.getDouble(i)} vs ${r.getDouble(i + 5)}")
      }
    }
  }
}
