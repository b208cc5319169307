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
}
