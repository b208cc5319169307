package graft.similarity

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PqSpec extends SparkSpec {
  import spark.implicits._

  // 8-dim vectors around two well-separated directions + noise axes, enough
  // rows for 2 subspaces × 4 centroids to be meaningful
  private lazy val emb = {
    val rows = (0 until 64).map { i =>
      val base = if (i % 2 == 0) Array(1.0, 0, 0, 0, 0.5, 0, 0, 0)
      else Array(0.0, 1, 0, 0, 0, 0.5, 0, 0)
      // id-injective noise (0.0001*i on a pure-noise axis) so no two corpus
      // vectors are exact duplicates — only the planted copies may tie
      val v = base.zipWithIndex.map { case (x, d) =>
        x + 0.01 * ((i * 7 + d) % 5) + (if (d == 2) 0.0001 * i else 0.0)
      }
      (i.toLong, v.map(_.toFloat))
    }
    rows.toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
  }

  private lazy val cb = Pq.fit(emb, "embedding", m = 2, k = 4, maxSample = 64)

  test("codebooks have the requested geometry and codes stay in range") {
    assert(cb.m === 2 && cb.k === 4 && cb.subDim === 4)
    val codes = Pq.encode(emb, "embedding", cb)
      .select(col("code")).as[Seq[Int]].collect()
    assert(codes.forall(c => c.length == 2 && c.forall(x => x >= 0 && x < 4)))
  }

  test("encoding is deterministic under repartitioning (keyed sample + fixed kernels)") {
    def run(df: org.apache.spark.sql.DataFrame) =
      Pq.encode(df, "embedding", cb)
        .select(col("vec_id"), col("code")).as[(Long, Seq[Int])]
        .collect().sortBy(_._1).toSeq
    assert(run(emb) === run(emb.repartition(7)))
  }

  test("encoded code is the true L2-argmin subspace centroid (augmented-dot trick)") {
    val vecs = emb.select(col("vec_id"), col("embedding")).as[(Long, Seq[Float])]
      .collect().toMap
    val codes = Pq.encode(emb, "embedding", cb)
      .select(col("vec_id"), col("code")).as[(Long, Seq[Int])].collect()
    codes.foreach { case (id, code) =>
      val v = vecs(id).map(_.toDouble).toArray
      (0 until cb.m).foreach { j =>
        val sub = v.slice(j * cb.subDim, (j + 1) * cb.subDim)
        val dists = cb.centroids(j).map(c =>
          sub.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum)
        assert(dists(code(j)) === dists.min, s"vec $id subspace $j")
      }
    }
  }

  test("ADC + exact rerank recovers planted exact duplicates as top hits") {
    val query = emb.filter(col("vec_id") === 0L)
      .select("embedding").as[Seq[Float]].head().toArray
    val withDups = emb.union(
      Seq((1000L, query.toSeq), (1001L, query.toSeq)).toDF("vec_id", "embedding")
        .withColumn("embedding", col("embedding").cast("array<float>")))
    val top = Pq.topK(spark, withDups, "vec_id", "embedding", cb, query, 3)
      .select("vec_id").as[Long].collect().toSet
    assert(top === Set(0L, 1000L, 1001L))
  }
}
