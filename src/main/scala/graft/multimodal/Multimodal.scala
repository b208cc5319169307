package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media payloads as opaque `binary` columns with
  * typed metadata structs, plus a partition-wise decode/feature-extract stage.
  *
  * Image decode is REAL: [[decodeImages]] parses actual PNG payloads with the
  * JDK's javax.imageio inside the mapPartitions loop ([[toPngBlobs]] builds
  * the deterministic PNG fixture). Audio decode is REAL (RIFF/WAVE via
  * javax.sound.sampled). Video demux is REAL at the byte level via the
  * bespoke GVID container ([[gvidBytes]] / [[demuxVideo]] — the JDK ships no
  * video codec, so the container format is ours, but the header parse,
  * length-prefixed frame seeks, bounded sampling, and per-frame PNG decode
  * are genuine). [[frameSampleStub]] is kept as the minimal fan-out-shape
  * reference.
  */
object Multimodal {

  case class Blob(doc_id: Long, content: Array[Byte], mime: String)

  case class MediaMeta(
      doc_id: Long,
      n_bytes: Long,
      width: Int,
      height: Int,
      channels: Int)

  /** Projects a text table into a blob table (payload = UTF-8 bytes). With
    * real media the payload column would come straight from parquet/object
    * storage; downstream plumbing is identical. */
  def toBlobs(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.select(
      col(idCol).cast("long").as("doc_id"),
      col(textCol).cast("binary").as("content"),
      lit("text/plain").as("mime"))

  /** STUB decoder: a real implementation would call an image codec here
    * (e.g. libjpeg via JNI) inside the per-partition loop. Deterministic
    * fake: dimensions derived from payload length and first byte. */
  private def decodeOne(b: Blob): MediaMeta = {
    val first = if (b.content.nonEmpty) b.content(0) & 0xff else 0
    MediaMeta(
      doc_id = b.doc_id,
      n_bytes = b.content.length.toLong,
      width = 64 + (first * 7) % 512,
      height = 64 + ((b.content.length % 512) * 3) % 512,
      channels = 3)
  }

  /** Partition-wise decode: one "codec handle" per partition, streamed rows.
    * This is the Scala analogue of a pandas-UDF/mapInPandas batch stage. */
  def decodeStub(spark: SparkSession, blobs: DataFrame): Dataset[MediaMeta] = {
    import spark.implicits._
    blobs.as[Blob].mapPartitions { it =>
      // real code: val codec = Codec.open(); closed via task-completion listener
      it.map(decodeOne)
    }
  }

  /** Deterministic tiny-PNG fixture: REAL PNG payloads (encoded with the
    * JDK's javax.imageio — no external dep) whose dimensions derive from the
    * doc id, so decode results are predictable without shipping media files.
    * Pixels are a deterministic function of (id, x, y) — every byte of the
    * blob is reproducible across runs and partitionings. */
  def pngBytes(width: Int, height: Int, seed: Long): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val v = (seed * 31 + y * width + x) & 0xffffff
        img.setRGB(x, y, v.toInt)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** One PNG blob per document: width = 8 + id % 32, height = 8 + (id/7) % 32
    * (the formulas the decode oracle mirrors). */
  def toPngBlobs(spark: SparkSession, docs: DataFrame, idCol: String = "doc_id"): DataFrame = {
    import spark.implicits._
    docs.select(col(idCol).cast("long")).as[Long].mapPartitions { it =>
      it.map { id =>
        val w = 8 + (id % 32).toInt
        val h = 8 + ((id / 7) % 32).toInt
        Blob(id, pngBytes(w, h, id), "image/png")
      }
    }.toDF()
  }

  /** Seeded PNG blobs: like [[toPngBlobs]] but dimensions AND pixels come
    * from a `seed` column instead of the doc id — two rows sharing a seed
    * carry byte-identical images under different ids (the planted-clone
    * construction for perceptual dedup). */
  def toPngBlobsSeeded(spark: SparkSession, idSeed: DataFrame): DataFrame = {
    import spark.implicits._
    idSeed.select(col("doc_id").cast("long"), col("seed").cast("long"))
      .as[(Long, Long)].mapPartitions { it =>
        it.map { case (id, seed) =>
          val w = 8 + (seed % 32).toInt
          val h = 8 + ((seed / 7) % 32).toInt
          Blob(id, pngBytes(w, h, seed), "image/png")
        }
      }.toDF()
  }

  case class ImageHash(doc_id: Long, width: Int, height: Int, ahash: String)

  /** Perceptual average-hash from the DECODED pixels (the pHash-family
    * image-dedup signature): sample an 8×8 grid (nearest-neighbor at
    * (gx·w/8, gy·h/8)), integer gray = (r+g+b)/3, threshold each cell
    * against the floor mean — 64 bits, carried as a '0'/'1' string so the
    * key is engine-neutral (a packed int64 would overflow BIGINT at bit
    * 63 in the SQL mirror). Integer-only arithmetic end to end: the hash
    * is bit-reproducible on any engine that can see the pixels. */
  def imageAHash(spark: SparkSession, blobs: DataFrame): Dataset[ImageHash] = {
    import spark.implicits._
    blobs.as[Blob].mapPartitions { it =>
      it.map { b =>
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b.content))
        require(img != null, s"undecodable payload for doc ${b.doc_id}")
        val (w, h) = (img.getWidth, img.getHeight)
        val grays = for (gy <- 0 until 8; gx <- 0 until 8) yield {
          val v = img.getRGB(gx * w / 8, gy * h / 8)
          (((v >> 16) & 0xff) + ((v >> 8) & 0xff) + (v & 0xff)) / 3
        }
        val mean = grays.sum / 64
        ImageHash(b.doc_id, w, h, grays.map(g => if (g > mean) '1' else '0').mkString)
      }
    }
  }

  /** REAL image decode: javax.imageio parses the PNG header + pixel data
    * inside the per-partition loop (the reader is the "codec handle" a JNI
    * codec would be). Same mapPartitions batch shape as [[decodeStub]];
    * width/height/channels come from the actual decoded image. */
  def decodeImages(spark: SparkSession, blobs: DataFrame): Dataset[MediaMeta] = {
    import spark.implicits._
    blobs.as[Blob].mapPartitions { it =>
      it.map { b =>
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b.content))
        require(img != null, s"undecodable payload for doc ${b.doc_id}")
        MediaMeta(
          doc_id = b.doc_id,
          n_bytes = b.content.length.toLong,
          width = img.getWidth,
          height = img.getHeight,
          channels = img.getColorModel.getNumComponents)
      }
    }
  }

  case class AudioMeta(
      doc_id: Long,
      sample_rate: Int,
      channels: Int,
      n_frames: Long,
      duration_ms: Long)

  /** Deterministic PCM WAV payload: standard 44-byte RIFF header + 16-bit
    * samples that are a pure function of (seed, frame). Real WAV bytes —
    * [[decodeAudio]] must parse the RIFF structure to recover the format. */
  def wavBytes(sampleRate: Int, channels: Int, nFrames: Int, seed: Long): Array[Byte] = {
    val dataSize = nFrames * channels * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(channels.toShort)
      .putInt(sampleRate)
      .putInt(sampleRate * channels * 2) // byte rate
      .putShort((channels * 2).toShort) // block align
      .putShort(16) // bits per sample
      .put("data".getBytes("US-ASCII")).putInt(dataSize)
    var i = 0
    while (i < nFrames * channels) {
      bb.putShort(((seed * 131 + i * 7919) & 0xffff).toShort)
      i += 1
    }
    bb.array()
  }

  /** One WAV blob per document: mono/stereo alternating by id, frame count
    * derived from the id (the formulas the decode oracle mirrors). */
  def toWavBlobs(spark: SparkSession, docs: DataFrame, idCol: String = "doc_id"): DataFrame = {
    import spark.implicits._
    docs.select(col(idCol).cast("long")).as[Long].mapPartitions { it =>
      it.map { id =>
        val channels = 1 + (id % 2).toInt
        val nFrames = 100 + (id % 400).toInt
        Blob(id, wavBytes(8000, channels, nFrames, id), "audio/wav")
      }
    }.toDF()
  }

  /** Seeded WAV blobs: like [[toWavBlobs]] but format AND samples key off a
    * `seed` column — rows sharing a seed are byte-identical audio under
    * different ids (the planted-clone construction for audio dedup). */
  def toWavBlobsSeeded(spark: SparkSession, idSeed: DataFrame): DataFrame = {
    import spark.implicits._
    idSeed.select(col("doc_id").cast("long"), col("seed").cast("long"))
      .as[(Long, Long)].mapPartitions { it =>
        it.map { case (id, seed) =>
          val channels = 1 + (seed % 2).toInt
          val nFrames = 100 + (seed % 400).toInt
          Blob(id, wavBytes(8000, channels, nFrames, seed), "audio/wav")
        }
      }.toDF()
  }

  case class AudioFingerprint(doc_id: Long, n_samples: Long, sig: String)

  /** Acoustic content fingerprint from the DECODED PCM stream: the sample
    * sequence splits into 4 equal windows (window of sample i =
    * (i·4) DIV n — deterministic boundaries at any length) and each
    * window reduces to its integer mean-square energy (Σ s² DIV count).
    * The 4-number profile joined as a string is the dedup key: integer
    * end to end, so re-encoded copies of the same signal collide on any
    * engine. The windowed-energy shape (not one global number) is the
    * skeleton real audio fingerprints (Chromaprint-style) hang their
    * spectral features on. */
  def audioFingerprint(spark: SparkSession, blobs: DataFrame): Dataset[AudioFingerprint] = {
    import spark.implicits._
    blobs.as[Blob].mapPartitions { it =>
      it.map { b =>
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(b.content))
        try {
          val fmt = in.getFormat
          require(fmt.getSampleSizeInBits == 16 && !fmt.isBigEndian,
            s"expected 16-bit LE PCM for doc ${b.doc_id}")
          val bytes = in.readAllBytes()
          val bb = java.nio.ByteBuffer.wrap(bytes)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          val n = bytes.length / 2
          // 4 windows need >= 4 samples or a window is empty and the
          // mean-square division would throw a bare / by zero
          require(n >= 4, s"need >= 4 PCM samples for a 4-window fingerprint, " +
            s"got $n for doc ${b.doc_id}")
          val sums = new Array[Long](4)
          val counts = new Array[Long](4)
          var i = 0
          while (bb.remaining() >= 2) {
            val s = bb.getShort.toLong
            val w = ((i.toLong * 4) / n).toInt
            sums(w) += s * s
            counts(w) += 1
            i += 1
          }
          val sig = (0 until 4).map(k => (sums(k) / counts(k)).toString).mkString(":")
          AudioFingerprint(b.doc_id, n.toLong, sig)
        } finally in.close()
      }
    }
  }

  /** REAL audio decode: javax.sound.sampled parses the RIFF/WAVE structure
    * inside the per-partition loop. duration_ms is integer math on decoded
    * fields (frames * 1000 / rate) — deterministic and oracle-mirrorable. */
  def decodeAudio(spark: SparkSession, blobs: DataFrame): Dataset[AudioMeta] = {
    import spark.implicits._
    blobs.as[Blob].mapPartitions { it =>
      it.map { b =>
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(b.content))
        try {
          val fmt = in.getFormat
          val frames = in.getFrameLength
          AudioMeta(
            doc_id = b.doc_id,
            sample_rate = fmt.getSampleRate.toInt,
            channels = fmt.getChannels,
            n_frames = frames,
            duration_ms = frames * 1000L / fmt.getSampleRate.toLong)
        } finally in.close()
      }
    }
  }

  case class AudioFeatures(
      doc_id: Long,
      n_samples: Long,
      peak: Int,
      rms: Double)

  /** REAL signal-level audio features: decode the PCM payload (not just the
    * RIFF header) and reduce it to peak amplitude and RMS energy — the
    * audio analogue of [[resizeFeatures]]' pixel tier. Peak and the square
    * sum are exact integers, so the only float op is one IEEE division +
    * sqrt, which the oracle mirrors bit-for-bit from the fixture's sample
    * formula. Interleaved channels are reduced together (peak/RMS over all
    * samples), matching the oracle's definition. */
  def audioFeatures(spark: SparkSession, blobs: DataFrame): Dataset[AudioFeatures] = {
    import spark.implicits._
    blobs.as[Blob].mapPartitions { it =>
      it.map { b =>
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(b.content))
        try {
          val fmt = in.getFormat
          require(fmt.getSampleSizeInBits == 16 && !fmt.isBigEndian,
            s"expected 16-bit LE PCM for doc ${b.doc_id}")
          val bytes = in.readAllBytes()
          val bb = java.nio.ByteBuffer.wrap(bytes)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          var n = 0L
          var peak = 0
          var sumSq = 0L
          while (bb.remaining() >= 2) {
            val s = bb.getShort.toInt
            val a = if (s < 0) -s else s
            if (a > peak) peak = a
            sumSq += s.toLong * s
            n += 1
          }
          require(n > 0, s"empty PCM payload for doc ${b.doc_id}")
          AudioFeatures(b.doc_id, n, peak, math.sqrt(sumSq.toDouble / n.toDouble))
        } finally in.close()
      }
    }
  }

  case class ImageFeatures(
      doc_id: Long,
      width: Int,
      height: Int,
      rs_width: Int,
      rs_height: Int,
      mean_red: Double)

  /** REAL resize + feature extraction: decode the PNG, nearest-neighbor
    * downsample by 2 (out(x,y) = in(2x, 2y) — deterministic, unlike
    * area-averaging resamplers whose float kernels vary by implementation),
    * and extract the mean red channel of the resized image. Same
    * partition-wise batch shape as [[decodeImages]]; the oracle recomputes
    * the identical numbers from the fixture's pixel formula, so the whole
    * decode → resample → reduce chain is hash-gated. The channel sum is an
    * exact integer; the mean is one IEEE division. */
  def resizeFeatures(spark: SparkSession, blobs: DataFrame): Dataset[ImageFeatures] = {
    import spark.implicits._
    blobs.as[Blob].mapPartitions { it =>
      it.map { b =>
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b.content))
        require(img != null, s"undecodable payload for doc ${b.doc_id}")
        val (w, h) = (img.getWidth, img.getHeight)
        val (nw, nh) = ((w + 1) / 2, (h + 1) / 2)
        var sum = 0L
        var y = 0
        while (y < nh) {
          var x = 0
          while (x < nw) {
            sum += (img.getRGB(2 * x, 2 * y) >> 16) & 0xff
            x += 1
          }
          y += 1
        }
        ImageFeatures(b.doc_id, w, h, nw, nh,
          sum.toDouble / (nw.toLong * nh).toDouble)
      }
    }
  }

  case class VideoFrame(
      doc_id: Long,
      frame_idx: Int,
      pts_ms: Long,
      width: Int,
      height: Int,
      mean_red: Double)

  /** Bespoke-but-real video container ("GVID"): 4-byte magic, fps, frame
    * count, then length-prefixed REAL PNG frames. The JDK ships no video
    * codec, so the container format is ours — but everything downstream is
    * genuine: [[demuxVideo]] parses the header, walks the length-prefixed
    * frame table, and runs a real PNG decode per sampled frame. Frame
    * pixels follow the same deterministic formula as [[pngBytes]] with a
    * per-frame seed, so the oracle can recompute every output. */
  def gvidBytes(id: Long): Array[Byte] = {
    val nFrames = 1 + (id % 5).toInt
    val w = 8 + (id % 8).toInt
    val h = 8 + ((id / 3) % 8).toInt
    val frames = (0 until nFrames).map(i => pngBytes(w, h, id * 1000 + i))
    val bb = java.nio.ByteBuffer
      .allocate(12 + frames.map(4 + _.length).sum)
      .order(java.nio.ByteOrder.BIG_ENDIAN)
    bb.put("GVID".getBytes("US-ASCII")).putInt(25).putInt(nFrames)
    frames.foreach(f => bb.putInt(f.length).put(f))
    bb.array()
  }

  /** One GVID clip per document (1-5 frames, dimensions derived from the
    * id — the formulas the demux oracle mirrors). */
  def toVideoBlobs(spark: SparkSession, docs: DataFrame, idCol: String = "doc_id"): DataFrame = {
    import spark.implicits._
    docs.select(col(idCol).cast("long")).as[Long].mapPartitions { it =>
      it.map(id => Blob(id, gvidBytes(id), "video/x-gvid"))
    }.toDF()
  }

  /** Clip fixture keyed by an EXPLICIT (doc_id, seed) frame — the video
    * sibling of [[toPngBlobsSeeded]]: different rows carrying the same seed
    * carry byte-identical clips under different ids (the planted-clone
    * construction for video content dedup). */
  def toVideoBlobsSeeded(spark: SparkSession, idSeed: DataFrame): DataFrame = {
    import spark.implicits._
    idSeed.select(col("doc_id").cast("long"), col("seed").cast("long"))
      .as[(Long, Long)].mapPartitions { it =>
        it.map { case (id, seed) => Blob(id, gvidBytes(seed), "video/x-gvid") }
      }.toDF()
  }

  case class VideoSig(doc_id: Long, n_frames: Int, sig: String)

  /** Video CONTENT fingerprint: demux the container, decode the ≤`maxFrames`
    * evenly-spaced sampled frames (the [[demuxVideo]] sampling rule, indices
    * i·n/k with k = min(n, maxFrames)), reduce each frame to its 64-bit
    * average-hash (the [[imageAHash]] grid: 8×8 nearest-neighbor sample,
    * integer gray = (r+g+b)/3, floor-mean threshold), and concatenate
    * "n:hash|hash|…" in frame order. Integer-only arithmetic end to end, so
    * the signature is bit-reproducible from the fixture pixel formulas —
    * re-encoded copies of the same content collapse to one key. The per-row
    * decode cost is bounded by maxFrames (one long clip cannot blow up a
    * task), and everything downstream shuffles only (doc_id, sig) — never
    * frame bytes. */
  def videoFingerprint(
      spark: SparkSession,
      blobs: DataFrame,
      maxFrames: Int = 3): Dataset[VideoSig] = {
    import spark.implicits._
    blobs.as[Blob].mapPartitions { it =>
      it.map { b =>
        val bb = java.nio.ByteBuffer.wrap(b.content).order(java.nio.ByteOrder.BIG_ENDIAN)
        val magic = new Array[Byte](4)
        bb.get(magic)
        require(new String(magic, "US-ASCII") == "GVID", s"bad container for doc ${b.doc_id}")
        bb.getInt // fps — timing is irrelevant to content identity
        val n = bb.getInt
        val offsets = new Array[(Int, Int)](n)
        var i = 0
        while (i < n) {
          val len = bb.getInt
          offsets(i) = (bb.position(), len)
          bb.position(bb.position() + len)
          i += 1
        }
        val k = math.min(n, maxFrames)
        val hashes = (0 until k).map { j =>
          val (off, len) = offsets(j * n / k)
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(b.content, off, len))
          require(img != null, s"undecodable frame ${j * n / k} of doc ${b.doc_id}")
          val (w, h) = (img.getWidth, img.getHeight)
          val grays = for (gy <- 0 until 8; gx <- 0 until 8) yield {
            val v = img.getRGB(gx * w / 8, gy * h / 8)
            (((v >> 16) & 0xff) + ((v >> 8) & 0xff) + (v & 0xff)) / 3
          }
          val mean = grays.sum / 64
          grays.map(g => if (g > mean) '1' else '0').mkString
        }
        VideoSig(b.doc_id, n, s"$n:${hashes.mkString("|")}")
      }
    }
  }

  /** REAL video demux + frame decode: parse the container header, seek
    * through the length-prefixed frame table, decode at most `maxFrames`
    * evenly-spaced frames (indices i·n/k, k = min(n, maxFrames)) and reduce
    * each to its mean red channel. The per-row fan-out is bounded by
    * maxFrames — one long clip cannot blow up a task, the same cap a real
    * sampler uses at 100 TB. */
  def demuxVideo(
      spark: SparkSession,
      blobs: DataFrame,
      maxFrames: Int = 3): Dataset[VideoFrame] = {
    import spark.implicits._
    blobs.as[Blob].mapPartitions { it =>
      it.flatMap { b =>
        val bb = java.nio.ByteBuffer.wrap(b.content).order(java.nio.ByteOrder.BIG_ENDIAN)
        val magic = new Array[Byte](4)
        bb.get(magic)
        require(new String(magic, "US-ASCII") == "GVID", s"bad container for doc ${b.doc_id}")
        val fps = bb.getInt
        val n = bb.getInt
        // frame offset table from the length prefixes (one forward walk)
        val offsets = new Array[(Int, Int)](n)
        var i = 0
        while (i < n) {
          val len = bb.getInt
          offsets(i) = (bb.position(), len)
          bb.position(bb.position() + len)
          i += 1
        }
        val k = math.min(n, maxFrames)
        (0 until k).iterator.map { j =>
          val idx = j * n / k
          val (off, len) = offsets(idx)
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(b.content, off, len))
          require(img != null, s"undecodable frame $idx of doc ${b.doc_id}")
          val (w, h) = (img.getWidth, img.getHeight)
          var sum = 0L
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              sum += (img.getRGB(x, y) >> 16) & 0xff
              x += 1
            }
            y += 1
          }
          VideoFrame(b.doc_id, idx, idx * 1000L / fps, w, h,
            sum.toDouble / (w.toLong * h).toDouble)
        }
      }
    }
  }

  case class Frame(doc_id: Long, frame_idx: Int, pts_ms: Long, frame_bytes: Long)

  /** Frame sampling — the 1→N stage of a video pipeline (each payload emits
    * a bounded set of evenly-spaced frames). The demuxer is a STUB (frame
    * count and sizes derived deterministically from the payload), but the
    * Spark shape is the real one: a partition-wise flatMap whose fan-out is
    * bounded per row (≤ 5 here; a real sampler caps frames-per-clip the same
    * way so one long video cannot blow up a task), keeping output partitions
    * within memory budget at 100 TB without a repartition. 40 ms step = 25
    * fps timestamps. */
  def frameSampleStub(spark: SparkSession, blobs: DataFrame): Dataset[Frame] = {
    import spark.implicits._
    blobs.as[Blob].mapPartitions { it =>
      // real code: demuxer handle opened once per partition, as in decodeStub
      it.flatMap { b =>
        val nFrames = 1 + (b.content.length % 5)
        val frameBytes = (b.content.length / nFrames).toLong
        (0 until nFrames).iterator.map(i => Frame(b.doc_id, i, i * 40L, frameBytes))
      }
    }
  }
}
