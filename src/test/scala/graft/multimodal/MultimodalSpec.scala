package graft.multimodal

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("blob projection carries payload bytes + mime; stub decode is deterministic") {
    val docs = Seq((7L, "hello world"), (8L, "")).toDF("doc_id", "text")
    val blobs = Multimodal.toBlobs(docs)
    assert(blobs.schema("content").dataType.typeName === "binary")

    val metas = Multimodal.decodeStub(spark, blobs)
      .collect().map(m => m.doc_id -> m).toMap
    assert(metas(7L).n_bytes === 11L)
    assert(metas(7L).width === 64 + ('h'.toInt * 7) % 512)
    assert(metas(7L).height === 64 + ((11 % 512) * 3) % 512)
    assert(metas(8L).n_bytes === 0L)
    assert(metas(8L).width === 64)
    // deterministic: second run bit-identical
    val again = Multimodal.decodeStub(spark, blobs).collect().map(m => m.doc_id -> m).toMap
    assert(again === metas)
  }

  test("real PNG decode round-trips the fixture dimensions through javax.imageio") {
    val docs = Seq((0L, "a"), (5L, "b"), (40L, "c"), (99L, "d")).toDF("doc_id", "text")
    val blobs = Multimodal.toPngBlobs(spark, docs)
    assert(blobs.schema("content").dataType.typeName === "binary")
    // payloads are genuine PNGs (magic bytes), not derived arithmetic
    val raw = blobs.collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Array[Byte]]("content")).toMap
    val pngMagic = Array(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte)
    assert(raw.values.forall(_.take(4).sameElements(pngMagic)))

    val metas = Multimodal.decodeImages(spark, blobs).collect().map(m => m.doc_id -> m).toMap
    for (id <- Seq(0L, 5L, 40L, 99L)) {
      assert(metas(id).width === 8 + (id % 32).toInt, s"width of $id")
      assert(metas(id).height === 8 + ((id / 7) % 32).toInt, s"height of $id")
      assert(metas(id).channels === 3)
      assert(metas(id).n_bytes === raw(id).length.toLong)
    }
    // decoded pixels, not header tricks: decode a payload driver-side and
    // compare one pixel against the generator formula
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(raw(5L)))
    val w = 8 + (5 % 32)
    assert((img.getRGB(2, 1) & 0xffffff) === ((5L * 31 + 1 * w + 2) & 0xffffff).toInt)
  }

  test("real WAV decode recovers format fields through javax.sound.sampled") {
    val docs = Seq((0L, "a"), (1L, "b"), (399L, "c"), (400L, "d")).toDF("doc_id", "text")
    val blobs = Multimodal.toWavBlobs(spark, docs)
    val raw = blobs.collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Array[Byte]]("content")).toMap
    assert(raw.values.forall(b => new String(b.take(4), "US-ASCII") == "RIFF"))

    val metas = Multimodal.decodeAudio(spark, blobs).collect().map(m => m.doc_id -> m).toMap
    for (id <- Seq(0L, 1L, 399L, 400L)) {
      assert(metas(id).sample_rate === 8000)
      assert(metas(id).channels === 1 + (id % 2).toInt, s"channels of $id")
      assert(metas(id).n_frames === 100 + (id % 400), s"frames of $id")
      assert(metas(id).duration_ms === (100 + (id % 400)) * 1000 / 8000)
    }
  }

  test("audio features: PCM peak and RMS match the sample formula") {
    val docs = Seq((0L, "a"), (1L, "b"), (7L, "c"), (400L, "d")).toDF("doc_id", "text")
    val feats = Multimodal.audioFeatures(spark, Multimodal.toWavBlobs(spark, docs))
      .collect().map(f => f.doc_id -> f).toMap
    for (id <- Seq(0L, 1L, 7L, 400L)) {
      val n = (100 + (id % 400).toInt) * (1 + (id % 2).toInt)
      var peak = 0
      var sumSq = 0L
      (0 until n).foreach { i =>
        val s = ((id * 131 + i * 7919) & 0xffff).toShort.toInt
        peak = math.max(peak, math.abs(s))
        sumSq += s.toLong * s
      }
      assert(feats(id).n_samples === n.toLong, s"n_samples of $id")
      assert(feats(id).peak === peak, s"peak of $id")
      assert(java.lang.Double.doubleToLongBits(feats(id).rms) ===
        java.lang.Double.doubleToLongBits(math.sqrt(sumSq.toDouble / n.toDouble)),
        s"rms of $id")
    }
  }

  test("resize features: nearest-neighbor halving matches the pixel formula") {
    import org.apache.spark.sql.functions.col
    val docs = Seq(0L, 5L, 37L).toDF("doc_id")
    val blobs = Multimodal.toPngBlobs(spark, docs)
    val feats = Multimodal.resizeFeatures(spark, blobs)
      .collect().map(f => f.doc_id -> f).toMap
    for (id <- Seq(0L, 5L, 37L)) {
      val w = 8 + (id % 32).toInt
      val h = 8 + ((id / 7) % 32).toInt
      val (nw, nh) = ((w + 1) / 2, (h + 1) / 2)
      val f = feats(id)
      assert((f.width, f.height, f.rs_width, f.rs_height) === ((w, h, nw, nh)))
      // recompute the expected mean straight from the generator formula
      val reds = for (y <- 0 until nh; x <- 0 until nw)
        yield ((id * 31 + (2 * y).toLong * w + 2 * x) & 0xffffff) >> 16
      assert(f.mean_red === reds.sum.toDouble / reds.length.toDouble)
    }
  }

  test("video demux parses the GVID container and decodes evenly-spaced real frames") {
    val docs = Seq(0L, 4L, 9L).toDF("doc_id") // 1, 5, and 5 frames
    val blobs = Multimodal.toVideoBlobs(spark, docs)
    val frames = Multimodal.demuxVideo(spark, blobs).collect().groupBy(_.doc_id)
    // id 0: n=1 → one frame, idx 0; id 4: n=5, k=3 → idx 0,1,3
    assert(frames(0L).map(_.frame_idx).sorted.toSeq === Seq(0))
    assert(frames(4L).map(_.frame_idx).sorted.toSeq === Seq(0, 1, 3))
    assert(frames.values.flatten.forall(f => f.pts_ms === f.frame_idx * 40L))
    for (f <- frames(4L)) {
      val (w, h) = (8 + (4L % 8).toInt, 8 + ((4L / 3) % 8).toInt)
      assert((f.width, f.height) === ((w, h)))
      val seed = 4L * 1000 + f.frame_idx
      val reds = for (y <- 0 until h; x <- 0 until w)
        yield ((seed * 31 + y.toLong * w + x) & 0xffffff) >> 16
      assert(f.mean_red === reds.sum.toDouble / reds.length.toDouble)
    }
  }

  test("frame sampling fans out boundedly with even 25fps timestamps") {
    // "hello world" = 11 bytes → 1 + 11%5 = 2 frames of 5 bytes;
    // "" → 1 frame of 0 bytes; fan-out is always within [1, 5]
    val docs = Seq((7L, "hello world"), (8L, ""), (9L, "abcdefg")).toDF("doc_id", "text")
    val frames = Multimodal.frameSampleStub(spark, Multimodal.toBlobs(docs))
      .collect().groupBy(_.doc_id)
    assert(frames(7L).map(f => (f.frame_idx, f.pts_ms, f.frame_bytes)).sorted.toSeq ===
      Seq((0, 0L, 5L), (1, 40L, 5L)))
    assert(frames(8L).toSeq.map(f => (f.frame_idx, f.pts_ms, f.frame_bytes)) === Seq((0, 0L, 0L)))
    // 7 bytes → 3 frames, 2 bytes each
    assert(frames(9L).length === 3 && frames(9L).forall(_.frame_bytes === 2L))
    assert(frames.values.forall(fs => fs.length >= 1 && fs.length <= 5))
  }

  test("image perceptual dedup: byte-identical clones share the aHash and lose the keep race") {
    val rows = graft.queries.Corpus.all("q_mm7_image_dedup")(
      spark, "/root/testdata/sf0.001").collect()
    val byId = rows.map(r => r.getLong(0) ->
      ((r.getString(3), r.getBoolean(4), r.getLong(5)))).toMap
    val cloneIds = byId.keySet.filter(_ >= 4700000L)
    assert(cloneIds.nonEmpty)
    cloneIds.foreach { c =>
      val orig = c - 4700000L
      // the clone decodes to the same 64-bit signature as its original...
      assert(byId(c)._1 === byId(orig)._1, s"clone $c hash != original")
      // ...and never wins the keep race against the lower id
      assert(!byId(c)._2, s"clone $c unexpectedly kept")
      assert(byId(c)._3 >= 2L)
    }
    // hashes are well-formed 64-bit strings
    rows.foreach(r => assert(r.getString(3).length === 64 &&
      r.getString(3).forall(ch => ch == '0' || ch == '1')))
  }

  test("pair curation: keep recomputes from decoded dims and caption stats") {
    val rows = graft.queries.Corpus.all("q_mm9_pair_curation")(
      spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (w, h, n, keep) = (r.getInt(1), r.getInt(2), r.getLong(3), r.getBoolean(4))
      val expect = w * h >= 400 && math.max(w, h) <= math.min(w, h) * 3 &&
        n >= 5 && n <= 60
      assert(keep === expect, s"doc ${r.getLong(0)}: keep $keep != $expect ($w x $h, $n toks)")
    }
    assert(rows.exists(_.getBoolean(4)) && rows.exists(!_.getBoolean(4)))
  }

  test("image near-dup pairs: banded candidates reproduce the all-pairs truth") {
    val d = "/root/testdata/sf0.001"
    val got = graft.queries.Corpus.all("q_mm10_image_neardup")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // driver-side all-pairs replay over the decoded hashes
    val hashes = Multimodal.imageAHash(spark,
      Multimodal.toPngBlobs(spark, graft.Tables.documents(spark, d)))
      .collect().map(h => h.doc_id -> h.ahash)
    val truth = (for {
      (i, ha) <- hashes; (j, hb) <- hashes if i < j
      dist = ha.zip(hb).count { case (x, y) => x != y }
      if dist >= 1 && dist <= 3
    } yield (i, j, dist)).toSet
    assert(got === truth)
    assert(got.nonEmpty && got.forall(p => p._3 >= 1 && p._3 <= 3 && p._1 < p._2))
  }

  test("audio content dedup: cloned PCM shares the energy fingerprint") {
    val rows = graft.queries.Corpus.all("q_mm8_audio_dedup")(
      spark, "/root/testdata/sf0.001").collect()
    val byId = rows.map(r => r.getLong(0) ->
      ((r.getString(2), r.getBoolean(3), r.getLong(4)))).toMap
    val cloneIds = byId.keySet.filter(_ >= 4800000L)
    assert(cloneIds.nonEmpty)
    cloneIds.foreach { c =>
      val orig = c - 4800000L
      assert(byId(c)._1 === byId(orig)._1, s"clone $c fingerprint != original")
      assert(!byId(c)._2, s"clone $c unexpectedly kept")
      assert(byId(c)._3 >= 2L)
    }
    // fingerprints are 4 window energies and discriminate across signals
    rows.foreach(r => assert(r.getString(2).split(":").length === 4))
    assert(rows.map(_.getString(2)).distinct.length > rows.length / 2)
  }
}
