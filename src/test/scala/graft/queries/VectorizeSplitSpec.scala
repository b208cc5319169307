package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** q_p12 k-fold split + q_t17 hashed TF-IDF invariants at sf0.001. */
class VectorizeSplitSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  test("k-fold assignment is disjoint, exhaustive, and deterministic") {
    val rows = Corpus.kfoldSplit(spark, d).collect()
    val folds = rows.map(_.getInt(0)).toSet
    assert(folds.subsetOf((0 until 5).toSet))
    val totalDocs = rows.map(_.getLong(2)).sum
    assert(totalDocs === graft.Tables.documents(spark, d).count())
    // pure function of the key: a re-run assigns identically
    assert(Corpus.kfoldSplit(spark, d).collect().toSeq === rows.toSeq)
  }

  test("hashed TF-IDF keeps at most 3 buckets per doc, weight-descending, buckets in range") {
    val rows = Corpus.hashedTfidf(spark, d)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(4)))
    val byDoc = rows.groupBy(_._1)
    assert(byDoc.values.forall(_.length <= 3))
    byDoc.values.foreach { rs =>
      val sorted = rs.sortBy(_._2) // by rk
      assert(sorted.map(_._2) === (1 to sorted.length))
      // rk order must be weight-descending (ties broken by bucket asc)
      assert(sorted.map(_._4).zip(sorted.map(_._4).drop(1)).forall { case (a, b) => a >= b })
    }
    assert(rows.forall(r => r._3 >= 0 && r._3 < 256))
  }

  test("temperature mix: quotas sum within budget and selections respect them") {
    val rows = Corpus.temperatureMix(spark, d).collect()
    assert(rows.nonEmpty)
    // α=0.5 flattens: no source's quota exceeds the 100k budget, and the
    // selected tokens never exceed the quota
    rows.foreach { r =>
      val (quota, sel) = (r.getLong(2), r.getLong(4))
      assert(quota <= 100000L)
      assert(sel <= quota, s"source ${r.getString(0)}: selected $sel > quota $quota")
    }
    assert(rows.map(_.getLong(2)).sum <= 100000L)
    // flattening: the biggest source's token share shrinks vs its raw share
    val raw = rows.map(r => r.getString(0) -> r.getLong(1)).toMap
    val sel = rows.map(r => r.getString(0) -> r.getLong(2)).toMap
    val big = raw.maxBy(_._2)._1
    val rawShare = raw(big).toDouble / raw.values.sum
    val quotaShare = sel(big).toDouble / sel.values.sum
    assert(quotaShare < rawShare, "temperature sampling must flatten the head")
  }

  test("dataset card: totals are consistent and dup counts non-negative") {
    val rows = Corpus.datasetCard(spark, d).collect()
    assert(rows.nonEmpty)
    val totalDocs = rows.map(_.getLong(1)).sum
    assert(totalDocs === graft.Tables.documents(spark, d).count())
    rows.foreach { r =>
      assert(r.getLong(6) >= 0L)       // n_exact_dups
      assert(r.getLong(5) <= r.getLong(1)) // en_docs <= n_docs
      assert(r.getDouble(7) >= 0.0 && r.getDouble(7) <= 1.0)
    }
  }

  test("hashing is vocabulary-free: same token always lands in the same bucket") {
    import spark.implicits._
    val twice = Seq((1L, "alpha beta"), (2L, "alpha beta")).toDF("doc_id", "text")
    val buckets = twice
      .select(col("doc_id"),
        explode(graft.text.TextFunctions.tokens(
          graft.text.TextFunctions.normText(col("text")))).as("term"))
      .withColumn("bucket",
        (conv(substring(md5(col("term")), 1, 4), 16, 10).cast("long") % 256).cast("int"))
      .groupBy("term").agg(countDistinct(col("bucket")).as("n"))
      .collect().map(_.getLong(1))
    assert(buckets.forall(_ === 1L))
  }

  test("perplexity mix: all buckets live, keep rates follow the bucket policy") {
    val rows = Corpus.perplexityMix(spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getString(1), r.getBoolean(2)))
    val byBucket = rows.groupBy(_._1).map { case (b, g) =>
      b -> ((g.count(_._2), g.length))
    }
    assert(byBucket.keySet === Set("head", "middle", "tail"))
    val (headKept, headN) = byBucket("head")
    assert(headKept === headN, "head bucket must keep everything")
    val (midKept, midN) = byBucket("middle")
    val midRate = midKept.toDouble / midN
    assert(midRate > 0.3 && midRate < 0.7, s"middle keep rate $midRate far from 0.5")
    val (tailKept, tailN) = byBucket("tail")
    val tailRate = tailKept.toDouble / tailN
    assert(tailRate < 0.25, s"tail keep rate $tailRate far above 0.1")
    assert(tailKept > 0 || tailN < 10, "tail sampling never fires")
  }

  test("group split: no domain straddles folds, all folds populated") {
    val rows = Corpus.groupSplit(spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    // structural leakage guarantee: fold is a function of domain
    rows.groupBy(_._2).foreach { case (dom, g) =>
      assert(g.map(_._3).distinct.length === 1, s"domain $dom straddles folds")
    }
    val folds = rows.map(_._3).distinct.sorted
    assert(folds.forall(f => f >= 0 && f <= 4))
    assert(folds.length >= 4, s"only folds $folds populated — bad dispersion")
    // every doc got assigned exactly once
    assert(rows.length === 500 && rows.map(_._1).distinct.length === 500)
  }

  test("epoch repeat: upsampled sources multiply, downsampled shrink, deterministic") {
    import org.apache.spark.sql.functions._
    val d = "/root/testdata/sf0.001"
    val erows = Corpus.all("q_p16_epoch_repeat")(spark, d)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val perSrc = graft.Tables.documents(spark, d)
      .groupBy("source").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    erows.foreach { case (src, (nDocs, nInst, _)) =>
      val base = perSrc(src)
      val idx = src.stripPrefix("src").toInt
      if (idx <= 4) {
        // 3 guaranteed epochs + ~50% fractional: instances in [3n, 4n]
        assert(nDocs === base)
        assert(nInst >= 3 * base && nInst <= 4 * base)
      } else if (idx <= 9) {
        assert(nDocs === base)
        assert(nInst >= base && nInst <= 2 * base)
      } else {
        // epochs=0: pure subsample — docs shrink, one instance each
        assert(nDocs <= base && nInst === nDocs)
      }
    }
    // determinism: identical run, identical checksums
    val again = Corpus.all("q_p16_epoch_repeat")(spark, d)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    erows.foreach { case (src, (_, _, ck)) => assert(again(src) === ck) }
  }
}
