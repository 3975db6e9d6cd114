package graft.operators

import graft.SparkSpecBase

class MultimodalSpec extends SparkSpecBase {
  import spark.implicits._

  test("native expression path and mapPartitions decoder agree exactly") {
    val df = Seq((1L, "hello world"), (2L, ""), (3L, "binary-ish é")).toDF("id", "text")
    val media = Multimodal.attachFakeMedia(df, "id", "text")
    val native = Multimodal.withNativeFeatures(media).collect()
      .map(r => r.getLong(0) -> r.toSeq).toMap
    val decoded = Multimodal.decodeFeatures(media).collect()
      .map(r => r.getLong(0) -> r.toSeq).toMap
    assert(native.keySet == decoded.keySet)
    native.keySet.foreach { id => assert(native(id) == decoded(id), s"id=$id") }
  }

  test("resize keeps the media schema, output size tracks target dims") {
    val media = Multimodal.attachFakeMedia(
      Seq((1L, "x" * 5000), (2L, "y")).toDF("id", "text"), "id", "text")
    val out = Multimodal.resize(media, targetW = 64, targetH = 64)
    assert(out.schema == Multimodal.mediaSchema)
    val sizes = out.collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1).length).toMap
    assert(sizes(1L) == 64 * 64 / 64) // folded to target-derived size
    assert(sizes(2L) == 64 * 64 / 64) // padded small input too
    // deterministic: same input -> same bytes
    val again = Multimodal.resize(media, 64, 64).collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1).toSeq).toMap
    val first = out.collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1).toSeq).toMap
    assert(again == first)
  }

  test("frame sampling: bounded fan-out, indexed frames, empty payload ok") {
    val media = Multimodal.attachFakeMedia(
      Seq((1L, "abcdefghij"), (2L, "")).toDF("id", "text"), "id", "text")
    val frames = Multimodal.sampleFrames(media, n = 4).collect()
    val byId = frames.groupBy(_.getLong(0))
    assert(byId(1L).map(_.getInt(1)).sorted.sameElements(Array(0, 1, 2, 3)))
    assert(!byId.contains(2L)) // empty payload -> no frames, no crash
    // frames reassemble the payload prefix in order
    val joined = byId(1L).sortBy(_.getInt(1))
      .flatMap(_.getAs[Array[Byte]](2)).map(_.toChar).mkString
    assert(joined == "abcdefgh") // 4 frames x step 2 of a 10-byte payload
  }
}
