package graft.ext

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (0L, "abcdef"), (1L, "hello world"), (2L, "x" * 200))
    .toDF("doc_id", "text")

  test("synthesize assigns modality and carries UTF-8 payload") {
    val m = Multimodal.synthesize(docs).collect().sortBy(_.doc_id)
    assert(m.map(_.media_type).toSeq == Seq("image", "audio", "video"))
    assert(new String(m(0).content, "UTF-8") == "abcdef")
  }

  test("partition-batched feature extraction is deterministic") {
    val f = Multimodal.extractFeatures(Multimodal.synthesize(docs))
      .collect().sortBy(_.doc_id)
    assert(f(0).n_bytes == 6L)
    assert(f(0).checksum == "e80b5017098950fc58aad83c8c14978e") // md5("abcdef")
    assert(f(0).width == 16 + ('a' & 0x3f) && f(0).height == 16 + ('b' & 0x3f))
    assert(f(2).byte_mean == 'x'.toDouble)
  }

  test("frame sampling emits bounded frames for video only") {
    val fr = Multimodal.sampleFrames(Multimodal.synthesize(docs)).collect()
    assert(fr.nonEmpty && fr.forall(_.doc_id == 2L))
    assert(fr.forall(_.frame.length <= 32))
  }

  test("resize stub crops/pads to target size") {
    assert(Multimodal.FakeCodec.resize("abc".getBytes, 2, 3).length == 6)
  }

  /** A real w×h PNG: left half black, right half white → mean luma ≈ 127.5
    * for even widths. */
  private def pngBytes(w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, if (x < w / 2) 0x000000 else 0xffffff)
    val buf = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", buf)
    buf.toByteArray
  }

  /** A real mono 16-bit PCM WAV with `frames` frames at `rate` Hz. */
  private def wavBytes(rate: Float, frames: Int): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(rate, 16, 1, true, false)
    val pcm = new Array[Byte](frames * 2)
    val in = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, frames.toLong)
    val buf = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      in, javax.sound.sampled.AudioFileFormat.Type.WAVE, buf)
    buf.toByteArray
  }

  test("REAL image codec: decode, luma, resize round-trip; corrupt rows skipped") {
    val media = Seq(
      Multimodal.MediaRecord(10L, "image", pngBytes(32, 20)),
      Multimodal.MediaRecord(11L, "image", pngBytes(8, 8)),
      Multimodal.MediaRecord(12L, "image", Array[Byte](1, 2, 3))) // corrupt
      .toDS()
    val f = Multimodal.decodeImages(media).collect().sortBy(_.doc_id)
    assert(f.map(_.doc_id).toSeq == Seq(10L, 11L), "corrupt payload must be skipped")
    assert(f(0).width == 32 && f(0).height == 20)
    assert(math.abs(f(0).mean_luma - 127.5) < 0.5)
    // Resize 32×20 → 16×10, then decode the re-encoded PNG: exact new dims.
    val small = Multimodal.resizeImages(media, 16, 10)
    val f2 = Multimodal.decodeImages(small).collect().sortBy(_.doc_id)
    assert(f2.length == 2 && f2.forall(r => r.width == 16 && r.height == 10))
  }

  test("REAL audio codec: WAV format and duration; corrupt rows skipped") {
    val media = Seq(
      Multimodal.MediaRecord(20L, "audio", wavBytes(16000f, 8000)),
      Multimodal.MediaRecord(21L, "audio", "not audio".getBytes))
      .toDS()
    val f = Multimodal.decodeAudio(media).collect()
    assert(f.map(_.doc_id).toSeq == Seq(20L))
    assert(f(0).sample_rate == 16000.0 && f(0).channels == 1)
    assert(f(0).n_frames == 8000L && math.abs(f(0).duration_s - 0.5) < 1e-9)
  }

  test("perceptual hash: noise-robust for near-dups, discriminative across images") {
    def gradient(horizontal: Boolean, noiseSeed: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        64, 64, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val rnd = new scala.util.Random(noiseSeed)
      for (y <- 0 until 64; x <- 0 until 64) {
        val base = if (horizontal) x * 4 else y * 4
        val g = math.max(0, math.min(255,
          base + (if (noiseSeed == 0) 0 else rnd.nextInt(21) - 10)))
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
      }
      val buf = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", buf)
      buf.toByteArray
    }
    val media = Seq(
      Multimodal.MediaRecord(1L, "image", gradient(horizontal = true, 0)),
      Multimodal.MediaRecord(2L, "image", gradient(horizontal = true, 7)), // near-dup
      Multimodal.MediaRecord(3L, "image", gradient(horizontal = false, 0))) // different
      .toDS()
    val h = Multimodal.imageHashes(media).collect()
      .map(r => r.doc_id -> BigInt(r.ahash, 16)).toMap
    def ham(a: Long, b: Long) = (h(a) ^ h(b)).bitCount
    assert(ham(1L, 2L) <= 12, s"noised near-dup too far: ${ham(1L, 2L)} bits")
    assert(ham(1L, 3L) >= 16, s"different images too close: ${ham(1L, 3L)} bits")
  }

  test("extractFeatures uses the REAL decoder when the payload is an image") {
    val media = Seq(Multimodal.MediaRecord(30L, "image", pngBytes(24, 12))).toDS()
    val f = Multimodal.extractFeatures(media).collect()
    assert(f(0).width == 24 && f(0).height == 12)
  }

  test("video container: encode/parse round-trips; corrupt payloads → None") {
    val bytes = Multimodal.FakeCodec.encodeVideo(3, 4, k => 10 * k + 1)
    val Some((nf, fl, frames)) = Multimodal.FakeCodec.parseVideo(bytes)
    assert(nf == 3 && fl == 4)
    assert(frames.map(_.toSeq) == Seq(
      Seq[Byte](1, 1, 1, 1), Seq[Byte](11, 11, 11, 11), Seq[Byte](21, 21, 21, 21)))
    // Wrong magic, truncated body, short header: all skipped rows.
    assert(Multimodal.FakeCodec.parseVideo("XVIDxxxxxxxxyy".getBytes).isEmpty)
    assert(Multimodal.FakeCodec.parseVideo(bytes.dropRight(1)).isEmpty)
    assert(Multimodal.FakeCodec.parseVideo(Array[Byte](1, 2, 3)).isEmpty)
    // Fill bytes wrap mod 256 like the query's (id·31 + 7k) arithmetic.
    val wrap = Multimodal.FakeCodec.encodeVideo(1, 2, _ => 300)
    assert(Multimodal.FakeCodec.parseVideo(wrap).get._3.head.toSeq ==
      Seq[Byte](44, 44))
  }
}
