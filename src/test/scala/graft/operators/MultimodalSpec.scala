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

  test("generatePng round-trips through a REAL ImageIO decode: exact dims and pixels") {
    // Direct fixture check, no Spark: decode the PNG bytes and verify the
    // gradient/solid channels pixel by pixel against the closed form.
    for (id <- Seq(0L, 1L, 17L, 255L, 499L)) {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(Multimodal.generatePng(id)))
      val (w, h) = ((1 + id % 16).toInt, (1 + (id / 16) % 16).toInt)
      assert(img.getWidth == w && img.getHeight == h, s"id=$id dims")
      val (baseR, g, b) = ((id % 240).toInt, (id % 256).toInt, (id * 7 % 256).toInt)
      for (y <- 0 until h; x <- 0 until w) {
        val rgb = img.getRGB(x, y)
        assert(((rgb >> 16) & 0xff) == baseR + x, s"id=$id r($x,$y)")
        assert(((rgb >> 8) & 0xff) == g && (rgb & 0xff) == b, s"id=$id gb($x,$y)")
      }
    }
  }

  test("decodeImageFeatures: real decode matches closed-form channel sums") {
    val ids = (0L to 40L).map(Tuple1(_)).toDF("doc_id")
    val feats = Multimodal.decodeImageFeatures(
      Multimodal.attachGeneratedImages(ids, "doc_id")).collect()
    assert(feats.length == 41)
    feats.foreach { r =>
      val id = r.getLong(0)
      val (w, h) = ((1 + id % 16).toInt, (1 + (id / 16) % 16).toInt)
      assert(r.getInt(1) == w && r.getInt(2) == h, s"id=$id dims")
      val baseR = id % 240
      assert(r.getLong(3) == h * (w * baseR + w.toLong * (w - 1) / 2), s"id=$id sum_r")
      assert(r.getLong(4) == w.toLong * h * (id % 256), s"id=$id sum_g")
      assert(r.getLong(5) == w.toLong * h * (id * 7 % 256), s"id=$id sum_b")
    }
  }

  test("decodeImageFeatures isolates undecodable payloads as null features") {
    val media = Multimodal.attachFakeMedia( // UTF-8 text bytes: not an image
      Seq((1L, "not a png"), (2L, "")).toDF("id", "text"), "id", "text")
    val good = Multimodal.attachGeneratedImages(Seq(Tuple1(3L)).toDF("id"), "id")
    val feats = Multimodal.decodeImageFeatures(media.unionAll(good)).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(feats(1L).isNullAt(1) && feats(2L).isNullAt(1))
    assert(feats(3L).getInt(1) == 4) // 1 + 3 % 16: real decode still works
  }

  test("resizeImage: real Graphics2D scale — output decodes at target dims") {
    val media = Multimodal.attachGeneratedImages(
      Seq(15L, 255L).map(Tuple1(_)).toDF("id"), "id") // 16x1 and 16x16 inputs
    val out = Multimodal.resizeImage(media, targetW = 8, targetH = 5)
    assert(out.schema == Multimodal.mediaSchema)
    out.collect().foreach { r =>
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](1)))
      assert(img.getWidth == 8 && img.getHeight == 5, s"id=${r.getLong(0)}")
    }
    // a solid-color input stays that color after any resample
    val solid = Multimodal.attachGeneratedImages(Seq(Tuple1(0L)).toDF("id"), "id")
    val rgb0 = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(
      Multimodal.resizeImage(solid, 3, 3).collect().head.getAs[Array[Byte]](1)))
    for (y <- 0 until 3; x <- 0 until 3)
      assert((rgb0.getRGB(x, y) & 0xffffff) == 0) // id=0 -> all channels 0
    // undecodable input -> null payload, not a crash
    val bad = Multimodal.attachFakeMedia(
      Seq((9L, "nope")).toDF("id", "text"), "id", "text")
    assert(Multimodal.resizeImage(bad, 4, 4).collect().head.isNullAt(1))
  }

  test("native byte tier cross-checks the byte decoder on REAL PNG payloads") {
    val media = Multimodal.attachGeneratedImages(
      (0L to 10L).map(Tuple1(_)).toDF("id"), "id")
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
