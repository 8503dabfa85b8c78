package graft.ext

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, processed by partition-batched functions (the Scala
  * analogue of arrow-batched python UDFs: `Dataset.mapPartitions` over a
  * typed record, one iterator per partition — amortized per-batch setup,
  * streaming through executors without materializing a partition).
  *
  * Codecs: IMAGE (PNG/JPEG/BMP/GIF via `javax.imageio`) and AUDIO
  * (WAV/AIFF/AU via `javax.sound.sampled`) are REAL — both ship inside the
  * JDK, no external dependency ([[JdkCodec]]). Only VIDEO has no JDK
  * decoder; it keeps the deterministic stub seam (`FakeCodec`) — at
  * production, an ffmpeg-backed decoder drops into the same
  * partition-batched boundary without touching the plan. Undecodable
  * payloads are skipped per-row (U7's error-isolation discipline), never
  * task failures.
  */
object Multimodal {

  final case class MediaRecord(
      doc_id: Long, media_type: String, content: Array[Byte])

  final case class MediaFeatures(
      doc_id: Long, media_type: String, n_bytes: Long, checksum: String,
      width: Int, height: Int, byte_mean: Double)

  final case class FrameSample(
      doc_id: Long, frame_no: Int, frame: Array[Byte])

  final case class ImageFeatures(
      doc_id: Long, width: Int, height: Int, mean_luma: Double)

  final case class AudioFeatures(
      doc_id: Long, sample_rate: Double, channels: Int, n_frames: Long,
      duration_s: Double)

  /** REAL codecs, JDK-native (zero added dependencies): `javax.imageio`
    * decodes/encodes PNG, JPEG, BMP and GIF; `javax.sound.sampled` parses
    * WAV, AIFF and AU headers/frames. Every entry point returns Option —
    * a corrupt or foreign payload is a skipped row, not an exception. */
  object JdkCodec {
    // ImageIO defaults to a disk-backed stream cache — a temp file per
    // decode. Everything here is byte arrays in memory; at executor scale
    // that's pure IO churn. Once per JVM (object init is lazy + per-VM).
    javax.imageio.ImageIO.setUseCache(false)

    /** Decode an image: (width, height, mean ITU-R 601 luminance 0–255). */
    def decodeImage(bytes: Array[Byte]): Option[(Int, Int, Double)] =
      try {
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        if (img == null) None
        else {
          val (w, h) = (img.getWidth, img.getHeight)
          var sum = 0.0
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y)
              sum += 0.299 * ((rgb >> 16) & 0xff) +
                0.587 * ((rgb >> 8) & 0xff) + 0.114 * (rgb & 0xff)
              x += 1
            }
            y += 1
          }
          Some((w, h, sum / (w.toDouble * h)))
        }
      } catch { case scala.util.control.NonFatal(_) => None }

    /** Re-encode an image resized to exactly w×h (bilinear), PNG bytes. */
    def resizeImage(bytes: Array[Byte], w: Int, h: Int): Option[Array[Byte]] =
      try {
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        if (img == null) None
        else {
          val out = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          val g = out.createGraphics()
          g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g.drawImage(img, 0, 0, w, h, null)
          g.dispose()
          val buf = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(out, "png", buf)
          Some(buf.toByteArray)
        }
      } catch { case scala.util.control.NonFatal(_) => None }

    /** Average-hash (aHash) perceptual fingerprint: decode → resize to 8×8
      * (bilinear, the same real resize path) → luminance grid → threshold
      * at the grid mean → 64 bits, rendered as 16 hex chars (row-major;
      * within a row byte, bit 7−c is column c). Near-duplicate images
      * differ in few bits — hamming distance on these hashes is the image
      * twin of SimHash text dedup, and `bit_count(xor(...))` composes with
      * the exact same pairing machinery. */
    def aHash(bytes: Array[Byte]): Option[String] =
      try {
        val src = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        if (src == null) None
        else {
          val img = new java.awt.image.BufferedImage(
            8, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
          val g = img.createGraphics()
          g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g.drawImage(src, 0, 0, 8, 8, null)
          g.dispose()
          val luma = Array.tabulate(64) { i =>
            val rgb = img.getRGB(i % 8, i / 8)
            0.299 * ((rgb >> 16) & 0xff) + 0.587 * ((rgb >> 8) & 0xff) +
              0.114 * (rgb & 0xff)
          }
          val mean = luma.sum / 64.0
          val rowBytes = Array.tabulate(8) { r =>
            var b = 0
            var c = 0
            while (c < 8) {
              if (luma(r * 8 + c) >= mean) b |= 1 << (7 - c)
              c += 1
            }
            b
          }
          Some(rowBytes.map("%02x".format(_)).mkString)
        }
      } catch { case scala.util.control.NonFatal(_) => None }

    /** Parse an audio payload's format: (sampleRate, channels, frames). */
    def decodeAudio(bytes: Array[Byte]): Option[(Float, Int, Long)] =
      try {
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(bytes))
        try Some((in.getFormat.getSampleRate, in.getFormat.getChannels,
          in.getFrameLength))
        finally in.close()
      } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Deterministic stand-in where no JDK codec exists (video), and the
    * fallback for payloads no real codec accepts. At production scale this
    * is the only seam that changes: swap these bodies for an actual
    * decoder; the Spark plan around them is already correct. */
  object FakeCodec {
    /** STUB decode: fake dimensions derived from the payload bytes. */
    def decode(bytes: Array[Byte]): (Int, Int) = {
      val w = 16 + (if (bytes.isEmpty) 0 else (bytes(0) & 0x3f))
      val h = 16 + (if (bytes.length < 2) 0 else (bytes(1) & 0x3f))
      (w, h)
    }
    /** STUB resize: crop/pad the payload to w*h bytes. */
    def resize(bytes: Array[Byte], w: Int, h: Int): Array[Byte] =
      java.util.Arrays.copyOf(bytes, w * h)
    /** STUB frame sampling: every `stride`-th byte starts a "frame". */
    def sampleFrames(bytes: Array[Byte], stride: Int, frameLen: Int): Seq[Array[Byte]] =
      bytes.indices.by(stride).take(8).map { off =>
        bytes.slice(off, math.min(off + frameLen, bytes.length))
      }

    /** STUB video container (the ffmpeg seam): "GVID" magic, big-endian
      * frame count and frame length, then `nFrames` fixed-length frames.
      * A real decoder replaces exactly this pair of functions; the Spark
      * plumbing around them (schema, partition batching, explode shape)
      * is the production code path. */
    def encodeVideo(nFrames: Int, frameLen: Int, fill: Int => Int): Array[Byte] = {
      val buf = java.nio.ByteBuffer.allocate(12 + nFrames * frameLen)
      buf.put("GVID".getBytes("US-ASCII")).putInt(nFrames).putInt(frameLen)
      var k = 0
      while (k < nFrames) {
        val b = fill(k).toByte
        var i = 0
        while (i < frameLen) { buf.put(b); i += 1 }
        k += 1
      }
      buf.array()
    }

    /** Parse the stub container back: (n_frames, frame_len, frames).
      * Corrupt or foreign payloads → None (skipped row, never a task
      * failure — U7's error-isolation discipline). */
    def parseVideo(bytes: Array[Byte]): Option[(Int, Int, IndexedSeq[Array[Byte]])] =
      if (bytes.length < 12 || new String(bytes, 0, 4, "US-ASCII") != "GVID") None
      else {
        val buf = java.nio.ByteBuffer.wrap(bytes)
        buf.position(4)
        val nf = buf.getInt
        val fl = buf.getInt
        if (nf < 0 || fl <= 0 || bytes.length < 12L + nf.toLong * fl) None
        else Some((nf, fl,
          (0 until nf).map(k => bytes.slice(12 + k * fl, 12 + (k + 1) * fl))))
      }
  }

  /** Synthesize a media table from `documents` (no binary fixture exists in
    * the testdata): payload = UTF-8 bytes of the text, modality by doc_id. */
  def synthesize(docs: DataFrame): Dataset[MediaRecord] = {
    val s = docs.sparkSession
    import s.implicits._
    docs.select(
      col("doc_id"),
      expr("CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END")
        .as("media_type"),
      col("text").cast("binary").as("content"))
      .as[MediaRecord]
  }

  /** Partition-batched decode + feature extraction (the mapInPandas shape):
    * one iterator per partition, records streamed through the stub codec. */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    val s = media.sparkSession
    import s.implicits._
    media.mapPartitions { batch =>
      val md = java.security.MessageDigest.getInstance("MD5")
      batch.map { r =>
        // Real decode first (JDK imageio); deterministic fake for payloads
        // no real codec accepts (synthesized text bytes, video).
        val (w, h) = JdkCodec.decodeImage(r.content)
          .map(t => (t._1, t._2)).getOrElse(FakeCodec.decode(r.content))
        md.reset()
        val sum = md.digest(r.content).map("%02x".format(_)).mkString
        val mean =
          if (r.content.isEmpty) 0.0
          else r.content.map(b => (b & 0xff).toLong).sum.toDouble / r.content.length
        MediaFeatures(r.doc_id, r.media_type, r.content.length.toLong, sum, w, h, mean)
      }
    }
  }

  /** REAL image decode + feature extraction: one row per decodable image
    * payload (width, height, mean luminance). Partition-batched; rows the
    * codec rejects are skipped, not failed. */
  def decodeImages(media: Dataset[MediaRecord]): Dataset[ImageFeatures] = {
    val s = media.sparkSession
    import s.implicits._
    media.mapPartitions(_.flatMap { r =>
      JdkCodec.decodeImage(r.content).map { case (w, h, luma) =>
        ImageFeatures(r.doc_id, w, h, luma)
      }
    })
  }

  /** REAL audio header/frame parse: sample rate, channels, frame count and
    * duration per decodable payload. */
  def decodeAudio(media: Dataset[MediaRecord]): Dataset[AudioFeatures] = {
    val s = media.sparkSession
    import s.implicits._
    media.mapPartitions(_.flatMap { r =>
      JdkCodec.decodeAudio(r.content).map { case (rate, ch, frames) =>
        AudioFeatures(r.doc_id, rate.toDouble, ch, frames,
          if (rate > 0) frames.toDouble / rate else 0.0)
      }
    })
  }

  final case class ImageHash(doc_id: Long, ahash: String)

  /** Perceptual fingerprints for every decodable image — the input to
    * image near-dup pairing (hamming distance over the hash, exactly the
    * SimHash block-join shape from `ops.Dedup`). */
  def imageHashes(media: Dataset[MediaRecord]): Dataset[ImageHash] = {
    val s = media.sparkSession
    import s.implicits._
    media.mapPartitions(_.flatMap { r =>
      JdkCodec.aHash(r.content).map(ImageHash(r.doc_id, _))
    })
  }

  /** REAL thumbnail pipeline: re-encode every decodable image at w×h (PNG).
    * The output is again a media table — composable with [[decodeImages]]. */
  def resizeImages(media: Dataset[MediaRecord], w: Int, h: Int): Dataset[MediaRecord] = {
    val s = media.sparkSession
    import s.implicits._
    media.mapPartitions(_.flatMap { r =>
      JdkCodec.resizeImage(r.content, w, h)
        .map(bytes => MediaRecord(r.doc_id, r.media_type, bytes))
    })
  }

  /** Frame sampling for video payloads (flatMap shape — one row per frame). */
  def sampleFrames(media: Dataset[MediaRecord]): Dataset[FrameSample] = {
    val s = media.sparkSession
    import s.implicits._
    media.filter(_.media_type == "video").flatMap { r =>
      FakeCodec.sampleFrames(r.content, stride = 64, frameLen = 32)
        .zipWithIndex.map { case (f, i) => FrameSample(r.doc_id, i, f) }
    }
  }

  /** Binary metadata under the DuckDB-oracle gate: modality split with byte
    * lengths and first-codepoint sums — the oracle-checkable part of the
    * pipeline (codec outputs are stub-only and tested in ScalaTest instead). */
  val q41BinaryMeta: Q = Q(
    "q41_binary_meta",
    """SELECT CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END
      |         AS media_type,
      |       count(*) AS n,
      |       CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
      |       CAST(sum(ascii(text)) AS BIGINT) AS sum_first_cp
      |FROM documents GROUP BY 1 ORDER BY media_type""".stripMargin) { (s, dir) =>
    Tables(s, dir, "documents")
      .groupBy(expr(
        "CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END")
        .as("media_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(length(col("text").cast("binary")).cast("long")).as("total_bytes"),
        sum(ascii(col("text")).cast("long")).as("sum_first_cp"))
      .orderBy(col("media_type"))
  }

  /** q101: the REAL image codec under the DuckDB-oracle gate. Each document
    * deterministically renders a solid-gray PNG whose width/height/gray are
    * integer functions of its text (computed by Spark SQL expressions, the
    * same functions the oracle evaluates), and the decoded
    * (width, height, round(mean_luma)) must reproduce them exactly — PNG is
    * lossless and ITU-R 601 luma of gray g is g, so the only step that can
    * break the equality is the encode→decode itself. DuckDB cannot decode
    * PNGs; it doesn't need to — it checks the round-trip's fixed point. */
  val q101ImageRoundtrip: Q = Q(
    "q101_image_roundtrip",
    """SELECT doc_id,
      |       CAST(8 + length(text) % 24 AS BIGINT) AS width,
      |       CAST(8 + (length(text) * 7) % 24 AS BIGINT) AS height,
      |       CAST(ascii(text) % 200 + 20 AS BIGINT) AS gray
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
    import s.implicits._
    val prepped = Tables(s, dir, "documents")
      .select(col("doc_id"),
        (lit(8) + length(col("text")) % 24).cast("int").as("w"),
        (lit(8) + (length(col("text")) * 7) % 24).cast("int").as("h"),
        (ascii(col("text")) % 200 + 20).cast("int").as("g"))
      .as[(Long, Int, Int, Int)]
    prepped.mapPartitions(_.map { case (id, w, h, g) =>
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val rgb = (g << 16) | (g << 8) | g
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { img.setRGB(x, y, rgb); x += 1 }
        y += 1
      }
      val buf = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", buf)
      val (dw, dh, luma) = JdkCodec.decodeImage(buf.toByteArray)
        .getOrElse(sys.error(s"round-trip decode failed for doc $id"))
      (id, dw.toLong, dh.toLong, math.round(luma))
    }).toDF("doc_id", "width", "height", "gray")
      .orderBy(col("doc_id"))
  }

  /** q102: the perceptual hash under the oracle gate. Each document
    * renders an 8×8 two-tone PNG — the first p = 1 + length(text) % 7
    * columns dark (40), the rest bright (200) — so the aHash is exactly
    * p zero-bits then ones per row: every row byte is 2^(8−p) − 1, and
    * the 16-hex-char hash is that byte repeated 8 times. The oracle
    * computes the fixed point from length(text) alone; decode, resize,
    * luma, mean-threshold and bit packing are all on the Spark side of
    * the equality. */
  val q102ImageAhash: Q = Q(
    "q102_image_ahash",
    """SELECT doc_id,
      |       repeat(lower(lpad(to_hex((1 << (8 - (1 + length(text) % 7))) - 1), 2, '0')),
      |              8) AS ahash
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
    import s.implicits._
    val prepped = Tables(s, dir, "documents")
      .select(col("doc_id"),
        (lit(1) + length(col("text")) % 7).cast("int").as("p"))
      .as[(Long, Int)]
    prepped.mapPartitions(_.map { case (id, p) =>
      val img = new java.awt.image.BufferedImage(
        8, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 8; x <- 0 until 8) {
        val g = if (x < p) 40 else 200
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
      }
      val buf = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", buf)
      val hash = JdkCodec.aHash(buf.toByteArray)
        .getOrElse(sys.error(s"aHash failed for doc $id"))
      (id, hash)
    }).toDF("doc_id", "ahash")
      .orderBy(col("doc_id"))
  }

  /** q274: perceptual-hash IMAGE DEDUP — the multimodal dedup operator
    * built ON q102's hash: every document's (real, executor-encoded)
    * PNG goes through the actual JDK decode → resize → luma →
    * mean-threshold aHash, and images sharing a hash form a duplicate
    * group with q154's keeper election (min doc_id survives). The
    * rollup is per hash: group size, keeper, duplicates to drop — the
    * image-side analog of q34's exact text dedup, with the hash
    * equality standing where near-dup thresholds would at production
    * scale (hamming-block joins are q65's machinery, ready to compose).
    * Oracle: the aHash fixed point from length(text) alone (q102's
    * closed form) and the same rollup — decode/resize/threshold/pack
    * all sit on the Spark side of the equality.
    *
    * Scale: hashes are 16 chars/image; the dedup is one
    * map-side-combined groupBy over them — the shuffle carries hashes
    * and counts, never pixels. */
  val q274ImageDedup: Q = Q(
    "q274_image_dedup",
    """WITH h AS (
      |  SELECT doc_id,
      |         repeat(lower(lpad(to_hex((1 << (8 - (1 + length(text) % 7))) - 1), 2, '0')),
      |                8) AS ahash
      |  FROM documents)
      |SELECT ahash, count(*) AS n_images,
      |       CAST(min(doc_id) AS BIGINT) AS keeper,
      |       count(*) - 1 AS n_dupes
      |FROM h GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    import s.implicits._
    val prepped = Tables(s, dir, "documents")
      .select(col("doc_id"),
        (lit(1) + length(col("text")) % 7).cast("int").as("p"))
      .as[(Long, Int)]
    prepped.mapPartitions(_.map { case (id, p) =>
      val img = new java.awt.image.BufferedImage(
        8, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 8; x <- 0 until 8) {
        val g = if (x < p) 40 else 200
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
      }
      val buf = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", buf)
      val hash = JdkCodec.aHash(buf.toByteArray)
        .getOrElse(sys.error(s"aHash failed for doc $id"))
      (id, hash)
    }).toDF("doc_id", "ahash")
      .groupBy(col("ahash"))
      .agg(count(lit(1)).as("n_images"),
        min(col("doc_id")).as("keeper"),
        (count(lit(1)) - 1).as("n_dupes"))
      .orderBy(col("ahash"))
  }

  /** q132: the AUDIO codec under the oracle gate (q101's pattern for the
    * other real JDK codec): each document synthesizes a PCM WAV whose
    * format parameters are pure arithmetic over its text length, the
    * executor encodes it with `javax.sound.sampled` and re-parses it with
    * [[JdkCodec.decodeAudio]], and the gate holds iff the decoded
    * (sample_rate, channels, frames, duration) round-trip EXACTLY to the
    * oracle's closed form. Synthesis, encode and decode all run
    * per-partition on executors (the mapInPandas shape — no binary ever
    * reaches the driver); duration is BIGINT floor-division millis, exact
    * in both engines. */
  val q132AudioRoundtrip: Q = Q(
    "q132_audio_roundtrip",
    """SELECT doc_id,
      |       CAST(8000 + (length(text) % 3) * 4000 AS BIGINT) AS sample_rate,
      |       CAST(1 + length(text) % 2 AS BIGINT) AS channels,
      |       CAST(100 + (length(text) * 3) % 500 AS BIGINT) AS frames,
      |       CAST((100 + (length(text) * 3) % 500) * 1000
      |            // (8000 + (length(text) % 3) * 4000) AS BIGINT) AS duration_ms
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
    import s.implicits._
    val prepped = Tables(s, dir, "documents")
      .select(col("doc_id"),
        (lit(8000) + (length(col("text")) % 3) * 4000).cast("int").as("rate"),
        (lit(1) + length(col("text")) % 2).cast("int").as("ch"),
        (lit(100) + (length(col("text")) * 3) % 500).cast("int").as("n"))
      .as[(Long, Int, Int, Int)]
    prepped.mapPartitions(_.map { case (id, rate, ch, n) =>
      val fmt = new javax.sound.sampled.AudioFormat(rate.toFloat, 16, ch, true, false)
      val pcm = new Array[Byte](n * fmt.getFrameSize)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
      val buf = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(
        ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, buf)
      val (dRate, dCh, dFrames) = JdkCodec.decodeAudio(buf.toByteArray)
        .getOrElse(sys.error(s"round-trip audio decode failed for doc $id"))
      (id, dRate.toLong, dCh.toLong, dFrames, dFrames * 1000L / dRate.toLong)
    }).toDF("doc_id", "sample_rate", "channels", "frames", "duration_ms")
      .orderBy(col("doc_id"))
  }

  /** q138: the VIDEO seam under the oracle gate — executors synthesize a
    * stub-container payload per doc (frame count / frame length / per-frame
    * fill byte all closed-form arithmetic over (doc_id, text length)),
    * parse it back through `FakeCodec.parseVideo`, stride-sample every 3rd
    * frame, and emit what the DECODED bytes say. The gate holds iff the
    * encode→parse→sample round trip reproduces the closed forms exactly —
    * same device as q132's audio gate, so all three modalities now carry a
    * CORRECTNESS row. The fill byte is read from the frame (uniformity
    * asserted), not recomputed — a slicing bug cannot pass.
    *
    * Scale shape: pure per-row flatMap between the scan and the
    * presentation sort — no shuffle, no driver binaries, frames stream
    * through executors partition-batched. A real ffmpeg decoder replaces
    * the two FakeCodec calls without touching the plan. */
  val q138VideoFrames: Q = Q(
    "q138_video_frames",
    """WITH d AS (
      |  SELECT doc_id, 8 + (length(text) % 23) AS nf, 16 + (doc_id % 17) AS fl
      |  FROM documents),
      |f AS (SELECT doc_id, nf, fl, unnest(range(0, nf, 3)) AS k FROM d)
      |SELECT doc_id, CAST(k AS BIGINT) AS frame_no,
      |       CAST(nf AS BIGINT) AS n_frames, CAST(fl AS BIGINT) AS frame_len,
      |       CAST((doc_id * 31 + k * 7) % 256 AS BIGINT) AS fill
      |FROM f ORDER BY doc_id, frame_no""".stripMargin) { (s, dir) =>
    import s.implicits._
    val prepped = Tables(s, dir, "documents")
      .select(col("doc_id"),
        (lit(8) + length(col("text")) % 23).cast("int").as("nf"),
        (lit(16) + col("doc_id") % 17).cast("int").as("fl"))
      .as[(Long, Int, Int)]
    prepped.mapPartitions(_.flatMap { case (id, nf, fl) =>
      val bytes = FakeCodec.encodeVideo(nf, fl, k => ((id * 31 + k * 7) % 256).toInt)
      val (dnf, dfl, frames) = FakeCodec.parseVideo(bytes)
        .getOrElse(sys.error(s"video container parse failed for doc $id"))
      frames.zipWithIndex.collect { case (frame, k) if k % 3 == 0 =>
        require(frame.nonEmpty && frame.forall(_ == frame(0)),
          s"non-uniform frame $k for doc $id")
        (id, k.toLong, dnf.toLong, dfl.toLong, (frame(0) & 0xff).toLong)
      }
    }).toDF("doc_id", "frame_no", "n_frames", "frame_len", "fill")
      .orderBy(col("doc_id"), col("frame_no"))
  }

  /** q284: audio CONTENT features through the real codec — the
    * feature-extract step q132's header round-trip stops short of: each
    * document synthesizes a deterministic 16-bit mono PCM waveform
    * (sample s(k) = (doc_id·31 + k·17) mod 2001 − 1000, a closed form
    * both engines can state), the executor encodes it as a real WAV
    * (`javax.sound.sampled`), DECODES it back, and computes the
    * standard audio-quality features FROM THE DECODED BYTES: frame
    * count, peak amplitude, integer sum-of-|s| (the RMS-proxy a
    * loudness filter thresholds on), strict zero-crossing count
    * (s(k−1)·s(k) < 0 — the cheap voiced/unvoiced & noisiness signal),
    * and mean |s| in integer milli-units. The gate holds iff the full
    * encode → WAV → decode → DSP loop reproduces the oracle's closed
    * forms exactly — a sample-grain guarantee (any byte-order, header
    * or truncation bug lands in the features), where q132 only proved
    * the header.
    *
    * Scale shape: pure per-row mapPartitions between scan and
    * presentation sort — no shuffle, no driver binaries; the oracle's
    * window-free closed forms mean the Spark side carries no window at
    * all. */
  val q284AudioFeatures: Q = Q(
    "q284_audio_features",
    """WITH d AS (SELECT doc_id, 100 + doc_id % 400 AS n FROM documents),
      |sam AS (SELECT doc_id, n, k,
      |               (doc_id * 31 + k * 17) % 2001 - 1000 AS s
      |        FROM (SELECT doc_id, n, unnest(generate_series(0, n - 1)) AS k
      |              FROM d)),
      |agg AS (SELECT doc_id, CAST(max(n) AS BIGINT) AS n_frames,
      |               CAST(max(abs(s)) AS BIGINT) AS peak,
      |               CAST(sum(abs(s)) AS BIGINT) AS sum_abs
      |        FROM sam GROUP BY 1),
      |zc AS (SELECT a.doc_id,
      |              CAST(count(*) FILTER (WHERE a.s * b.s < 0) AS BIGINT)
      |                AS zero_crossings
      |       FROM sam a JOIN sam b
      |         ON b.doc_id = a.doc_id AND b.k = a.k - 1
      |       GROUP BY 1)
      |SELECT agg.doc_id, n_frames, peak, sum_abs, zero_crossings,
      |       1000 * sum_abs // n_frames AS mean_abs_milli
      |FROM agg JOIN zc USING (doc_id) ORDER BY doc_id""".stripMargin) { (s, dir) =>
    import s.implicits._
    val prepped = Tables(s, dir, "documents")
      .select(col("doc_id"), (lit(100) + col("doc_id") % 400).cast("int").as("n"))
      .as[(Long, Int)]
    prepped.mapPartitions(_.map { case (id, n) =>
      // Synthesize the closed-form waveform and write REAL WAV bytes.
      val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
      val pcm = new Array[Byte](n * 2)
      var k = 0
      while (k < n) {
        val v = ((id * 31 + k * 17) % 2001 - 1000).toShort
        pcm(2 * k) = (v & 0xff).toByte
        pcm(2 * k + 1) = ((v >> 8) & 0xff).toByte
        k += 1
      }
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
      val buf = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(
        ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, buf)
      // Decode the WAV back and compute every feature from the DECODED
      // sample stream — not from the synthesis parameters.
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(buf.toByteArray))
      val raw = try in.readAllBytes() finally in.close()
      val nf = raw.length / 2
      var i = 0
      var sumAbs = 0L
      var peak = 0L
      var zc = 0L
      var prev = 0
      while (i < nf) {
        val v = ((raw(2 * i) & 0xff) | (raw(2 * i + 1) << 8)).toShort.toInt
        sumAbs += math.abs(v)
        if (math.abs(v) > peak) peak = math.abs(v)
        if (i > 0 && prev.toLong * v < 0) zc += 1
        prev = v
        i += 1
      }
      (id, nf.toLong, peak, sumAbs, zc, 1000L * sumAbs / nf)
    }).toDF("doc_id", "n_frames", "peak", "sum_abs", "zero_crossings",
      "mean_abs_milli")
      .orderBy(col("doc_id"))
  }

  /** q351: video SCENE-CUT detection through the decoded frames — the
    * shot-boundary step a video curation pipeline runs after q138's
    * sampling: decode ALL frames, compute the per-frame intensity delta,
    * and call a cut where |Δ| ≥ 64 (the classic frame-difference
    * detector; a real pipeline swaps fill-byte intensity for a per-frame
    * histogram distance at the same seam). The synthetic container
    * carries a genuine two-segment signal — fill (doc·31) mod 256 for
    * the first half, (doc·53+128) mod 256 for the second — so whether a
    * cut EXISTS is data-dependent (|Δ| ≥ 64 holds for some docs, not
    * others) and the gate verifies detection, not just parsing. Cut
    * intensities are read from the DECODED bytes (uniformity asserted);
    * the oracle states the closed forms.
    *
    * Scale shape: q138's — pure per-row flatMap/aggregate between scan
    * and presentation sort, no shuffle beyond the final rollup; frames
    * stream partition-batched through executors. */
  val q351VideoSceneCuts: Q = Q(
    "q351_video_scene_cuts",
    """WITH d AS (
      |  SELECT doc_id, 8 + (length(text) % 23) AS nf FROM documents),
      |f AS (SELECT doc_id, nf, k,
      |             CASE WHEN k < nf // 2 THEN (doc_id * 31) % 256
      |                  ELSE (doc_id * 53 + 128) % 256 END AS fill
      |      FROM (SELECT doc_id, nf, unnest(generate_series(0, nf - 1)) AS k
      |            FROM d)),
      |dl AS (SELECT a.doc_id, a.nf, a.k,
      |              abs(a.fill - b.fill) AS delta
      |       FROM f a JOIN f b ON b.doc_id = a.doc_id AND b.k = a.k - 1)
      |SELECT doc_id, CAST(max(nf) AS BIGINT) AS n_frames,
      |       CAST(count(*) FILTER (WHERE delta >= 64) AS BIGINT) AS n_cuts,
      |       CAST(coalesce(min(k) FILTER (WHERE delta >= 64), 0) AS BIGINT)
      |         AS first_cut
      |FROM dl GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    import s.implicits._
    val prepped = Tables(s, dir, "documents")
      .select(col("doc_id"),
        (lit(8) + length(col("text")) % 23).cast("int").as("nf"))
      .as[(Long, Int)]
    prepped.mapPartitions(_.map { case (id, nf) =>
      val bytes = FakeCodec.encodeVideo(nf, 16, k =>
        (if (k < nf / 2) (id * 31) % 256 else (id * 53 + 128) % 256).toInt)
      val (dnf, _, frames) = FakeCodec.parseVideo(bytes)
        .getOrElse(sys.error(s"video container parse failed for doc $id"))
      val fills = frames.map { fr =>
        require(fr.nonEmpty && fr.forall(_ == fr(0)),
          s"non-uniform frame for doc $id")
        fr(0) & 0xff
      }
      val deltas = fills.sliding(2).zipWithIndex.collect {
        case (Seq(p, c), i) if math.abs(c - p) >= 64 => i + 1
      }.toSeq
      (id, dnf.toLong, deltas.size.toLong,
        deltas.headOption.map(_.toLong).getOrElse(0L))
    }).toDF("doc_id", "n_frames", "n_cuts", "first_cut")
      .orderBy(col("doc_id"))
  }

  val all: Seq[Q] = Seq(q41BinaryMeta, q101ImageRoundtrip, q102ImageAhash,
    q132AudioRoundtrip, q138VideoFrames, q274ImageDedup, q284AudioFeatures,
    q351VideoSceneCuts)
}
