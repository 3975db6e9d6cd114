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
}
