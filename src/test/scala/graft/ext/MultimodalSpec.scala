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
}
