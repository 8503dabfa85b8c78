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
  * The actual byte decoding is a STUB (`FakeCodec`) — no image/audio codecs
  * ship in this container — with a deterministic fake implementation. The
  * Spark-side plumbing is real and tested: schema, binary payloads, batch
  * iterator shape, partitioning, and the feature-extraction/resize/
  * frame-sampling operator signatures.
  */
object Multimodal {

  final case class MediaRecord(
      doc_id: Long, media_type: String, content: Array[Byte])

  final case class MediaFeatures(
      doc_id: Long, media_type: String, n_bytes: Long, checksum: String,
      width: Int, height: Int, byte_mean: Double)

  final case class FrameSample(
      doc_id: Long, frame_no: Int, frame: Array[Byte])

  /** Deterministic stand-in for a real codec. At production scale this is the
    * only seam that changes: swap these bodies for an actual decoder; the
    * Spark plan around them is already correct. */
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
        val (w, h) = FakeCodec.decode(r.content)
        md.reset()
        val sum = md.digest(r.content).map("%02x".format(_)).mkString
        val mean =
          if (r.content.isEmpty) 0.0
          else r.content.map(b => (b & 0xff).toLong).sum.toDouble / r.content.length
        MediaFeatures(r.doc_id, r.media_type, r.content.length.toLong, sum, w, h, mean)
      }
    }
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

  val all: Seq[Q] = Seq(q41BinaryMeta)
}
