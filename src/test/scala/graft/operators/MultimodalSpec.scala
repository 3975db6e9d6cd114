package graft.operators

import graft.SparkSpecBase

class MultimodalSpec extends SparkSpecBase {
  import spark.implicits._

  test("withNativeFeatures: byte-level features + CRC32 cross-check, no fabricated dims") {
    val df = Seq((1L, "hello world"), (2L, ""), (3L, "binary-ish é")).toDF("id", "text")
    val media = Multimodal.attachFakeMedia(df, "id", "text")
    val native = Multimodal.withNativeFeatures(media)
    // the schema carries NOTHING that pretends to be decoded content
    assert(native.schema.fieldNames.toSeq ==
      Seq("media_id", "n_bytes", "first_byte", "format", "checksum"))
    val got = native.collect().map(r => r.getLong(0) -> r).toMap
    df.collect().foreach { r =>
      val id = r.getLong(0)
      val bytes = r.getString(1).getBytes("UTF-8")
      val crc = new java.util.zip.CRC32(); crc.update(bytes)
      assert(got(id).getLong(1) == bytes.length.toLong, s"id=$id n_bytes")
      assert(got(id).getInt(2) == (if (bytes.isEmpty) 0 else bytes(0) & 0xff))
      assert(got(id).getString(3) == "unknown", s"id=$id format")
      assert(got(id).getLong(4) == (if (bytes.isEmpty) 0L else crc.getValue))
    }
  }

  test("sniffFormat recognizes real encoded payloads by magic bytes") {
    val ids = Seq(Tuple1(7L)).toDF("id")
    val mixed = Multimodal.attachGeneratedImages(ids, "id")
      .unionAll(Multimodal.attachGeneratedAudio(Seq(Tuple1(17L)).toDF("id"), "id"))
      .unionAll(Multimodal.attachGeneratedVideos(Seq(Tuple1(27L)).toDF("id"), "id"))
      .unionAll(Multimodal.attachGeneratedGifs(Seq(Tuple1(37L)).toDF("id"), "id"))
      .unionAll(Multimodal.attachFakeMedia(
        Seq((47L, "plain text")).toDF("id", "text"), "id", "text"))
    val got = Multimodal.withNativeFeatures(mixed).collect()
      .map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(got == Map(7L -> "png", 17L -> "wav", 27L -> "mp4",
      37L -> "gif", 47L -> "unknown"))
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

  test("generateGif round-trips through a REAL GIF decode: frames, dims, delays, pixels") {
    // Direct fixture check, no Spark: every closed form survives the
    // encode → decode round trip exactly (lossless indexed palette).
    for (id <- Seq(0L, 1L, 7L, 63L, 255L, 499L)) {
      val frames = Multimodal.decodeGifOne(Multimodal.generateGif(id))
        .getOrElse(fail(s"id=$id did not decode"))
      val (w, h) = ((2 + id % 8).toInt, (2 + (id / 8) % 8).toInt)
      assert(frames.length == (2 + id % 4).toInt, s"id=$id frame count")
      frames.foreach { case (f, gw, gh, delay, sr, sg, sb) =>
        assert(gw == w && gh == h, s"id=$id f=$f dims")
        assert(delay == (2 + (id + 3 * f) % 10).toInt, s"id=$id f=$f delay")
        assert(sr == w.toLong * h * ((id * 5 + f * 11) % 256), s"id=$id f=$f sum_r")
        assert(sg == w.toLong * h * ((id * 3 + f * 7) % 256), s"id=$id f=$f sum_g")
        assert(sb == w.toLong * h * ((id * 13 + f * 17) % 256), s"id=$id f=$f sum_b")
      }
    }
  }

  test("decodeGifFrames: per-frame rows over a table, non-GIF payloads isolate as one null row") {
    val media = Multimodal.attachGeneratedGifs(
      Seq((2L, "x"), (5L, "y")).toDF("doc_id", "text"), "doc_id")
    val mp4 = Multimodal.attachGeneratedVideos(Seq(Tuple1(99L)).toDF("id"), "id")
    val out = Multimodal.decodeGifFrames(media.unionAll(mp4)).collect()
      .groupBy(_.getLong(0))
    assert(out(2L).length == 4 && out(5L).length == 3) // 2 + id % 4 frames
    assert(out(2L).forall(!_.isNullAt(1)))
    // a REAL mp4 payload (valid container, codec'd frames) must come back
    // as one all-null row — never fabricated frame content
    assert(out(99L).length == 1 && out(99L).head.isNullAt(1)
      && out(99L).head.isNullAt(5))
  }

  test("sampleFrames: real decoded frames from an animated GIF, even spacing, nulls for codec-less payloads") {
    // id=3 -> 5x2 logical screen, 5 frames (2 + 3 % 4)
    val gif = Multimodal.attachGeneratedGifs(Seq(Tuple1(3L)).toDF("id"), "id")
    val all = Multimodal.sampleFrames(gif, n = 10).collect().sortBy(_.getInt(1))
    assert(all.length == (2 + 3 % 4)) // true frame count when n exceeds it
    all.foreach { r =>
      val f = r.getInt(1)
      // each sampled frame is a REAL re-encoded PNG of the original frame:
      // decode it and check the solid closed-form color
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](2)))
      assert(img.getWidth == 5 && img.getHeight == 2) // w=2+3%8, h=2+0%8
      val rgb = img.getRGB(0, 0)
      assert(((rgb >> 16) & 0xff) == ((3 * 5 + f * 11) % 256).toInt, s"f=$f r")
      assert(((rgb >> 8) & 0xff) == ((3 * 3 + f * 7) % 256).toInt, s"f=$f g")
      assert((rgb & 0xff) == ((3 * 13 + f * 17) % 256).toInt, s"f=$f b")
    }
    // n smaller than the frame count: evenly spaced ORIGINAL indices
    val two = Multimodal.sampleFrames(gif, n = 2).collect().map(_.getInt(1)).sorted
    assert(two.sameElements(Array(0, (2 + 3 % 4) / 2)))
    // codec-less payloads (mp4 frames, plain bytes, empty) -> one null row
    // each, never synthetic frame bytes
    val bad = Multimodal.attachGeneratedVideos(Seq(Tuple1(1L)).toDF("id"), "id")
      .unionAll(Multimodal.attachFakeMedia(
        Seq((2L, "abcdefghij"), (3L, "")).toDF("id", "text"), "id", "text"))
    val badOut = Multimodal.sampleFrames(bad, n = 4).collect()
    assert(badOut.length == 3)
    badOut.foreach(r => assert(r.isNullAt(1) && r.isNullAt(2),
      s"id=${r.getLong(0)} must isolate as nulls"))
    // single-frame formats still decode for real: a PNG yields one frame
    val png = Multimodal.attachGeneratedImages(Seq(Tuple1(4L)).toDF("id"), "id")
    val one = Multimodal.sampleFrames(png, n = 3).collect()
    assert(one.length == 1 && one.head.getInt(1) == 0 && !one.head.isNullAt(2))
  }

  test("WAV decode: generated fixtures round-trip to their closed forms") {
    Seq(0L, 1L, 17L, 63L, 64L, 255L, 1000L).foreach { id =>
      val n = 8 + id % 64
      val rate = 8000 + (id % 4) * 4000
      val samples = (0L until n).map(i => ((id * 31 + i * 17) % 2001) - 1000)
      val got = Multimodal.decodeWavOne(Multimodal.generateWav(id))
      assert(got.contains((rate.toInt, 1, n, n * 1000 / rate,
        samples.map(math.abs).max.toInt, samples.sum)), s"id $id: $got")
    }
  }

  test("WAV decode: chunk walker skips extra chunks; rejects non-PCM16 and garbage") {
    // splice a LIST chunk between fmt and data — real encoders do this
    val base = Multimodal.generateWav(5L)
    val listChunk = "LIST".getBytes("US-ASCII") ++
      Array[Byte](6, 0, 0, 0) ++ "INFOab".getBytes("US-ASCII")
    val spliced = base.take(36) ++ listChunk ++ base.drop(36)
    // RIFF size field is unchecked by the walker; re-parse must agree
    assert(Multimodal.decodeWavOne(spliced) == Multimodal.decodeWavOne(base))
    // stereo: interleaved L/R frames — frame count halves, peak spans both
    val stereo = {
      val bb = java.nio.ByteBuffer.allocate(44 + 8)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + 8)
        .put("WAVE".getBytes("US-ASCII"))
        .put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1).putShort(2).putInt(8000).putInt(32000)
        .putShort(4).putShort(16)
      bb.put("data".getBytes("US-ASCII")).putInt(8)
      Seq(10, -700, 20, 30).foreach(s => bb.putShort(s.toShort))
      bb.array()
    }
    assert(Multimodal.decodeWavOne(stereo)
      .contains((8000, 2, 2L, 0L, 700, (10 - 700 + 20 + 30).toLong)))
    // rejects: garbage, truncation, a real PNG, 8-bit format field lies
    assert(Multimodal.decodeWavOne("not audio at all".getBytes).isEmpty)
    assert(Multimodal.decodeWavOne(base.take(30)).isEmpty)
    assert(Multimodal.decodeWavOne(Multimodal.generatePng(3L)).isEmpty)
    val nonPcm = base.clone()
    nonPcm(20) = 3 // format tag -> IEEE float
    assert(Multimodal.decodeWavOne(nonPcm).isEmpty)
  }

  test("audio_features query path: decode over a table, nulls isolated per row") {
    val docs = Seq((1L, "x"), (2L, "y")).toDF("doc_id", "text")
    val media = Multimodal.attachGeneratedAudio(docs, "doc_id")
    val corrupt = Seq((99L, Array[Byte](1, 2, 3), "audio/wav"))
      .toDF("media_id", "payload", "media_type")
    val out = Multimodal.decodeAudioFeatures(media.unionByName(corrupt))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getInt(1) == 12000 && out(2L).getInt(1) == 16000)
    assert(out(99L).isNullAt(1) && out(99L).isNullAt(6))
  }

  test("MP4 metadata: fixtures round-trip to closed forms across v0/v1 and largesize") {
    // ids cover: v1 boxes (≡0 mod 5), largesize mdat (≡0 mod 7), both
    // (35), 1/2/3-track layouts, and a generic id
    Seq(0L, 1L, 2L, 5L, 7L, 14L, 35L, 123L, 1000L).foreach { id =>
      val timescale = (600 + (id % 5) * 100).toInt
      val duration = 600 + id % 1000
      val nTracks = (1 + id % 3).toInt
      val nVideo = (nTracks + 1) / 2
      val tMax = 2 * ((nTracks - 1) / 2)
      val got = Multimodal.decodeMp4One(Multimodal.generateMp4(id))
      assert(got.contains((timescale, duration * 1000L / timescale, nTracks,
        nVideo, nTracks / 2,
        (160 * (tMax + 1) + id % 16).toInt, (90 * (tMax + 1) + id % 9).toInt)),
        s"id $id: $got")
    }
  }

  test("MP4 metadata: box walker is structural — reordering and junk boxes survive; garbage rejected") {
    // the walker must find moov wherever it sits; insert an unknown
    // top-level box before it and move mdat first
    val base = Multimodal.generateMp4(9L)
    def boxAt(payload: Array[Byte], tpe: String): Array[Byte] = {
      var off = 0
      while (off + 8 <= payload.length) {
        val size = java.nio.ByteBuffer.wrap(payload).getInt(off) match {
          case 1 => java.nio.ByteBuffer.wrap(payload).getLong(off + 8).toInt
          case 0 => payload.length - off
          case s => s
        }
        if (new String(payload, off + 4, 4, "US-ASCII") == tpe)
          return payload.slice(off, off + size)
        off += size
      }
      fail(s"box $tpe not found")
    }
    val ftyp = boxAt(base, "ftyp"); val moov = boxAt(base, "moov")
    val mdat = boxAt(base, "mdat")
    val junk = java.nio.ByteBuffer.allocate(12).putInt(12)
      .put("skip".getBytes("US-ASCII")).putInt(-1).array()
    val shuffled = ftyp ++ mdat ++ junk ++ moov
    assert(Multimodal.decodeMp4One(shuffled) == Multimodal.decodeMp4One(base))
    // rejects: garbage, truncated moov, WAV payload, missing ftyp
    assert(Multimodal.decodeMp4One("not a movie".getBytes).isEmpty)
    assert(Multimodal.decodeMp4One(base.take(ftyp.length + 20)).isEmpty)
    assert(Multimodal.decodeMp4One(Multimodal.generateWav(3L)).isEmpty)
    assert(Multimodal.decodeMp4One(mdat ++ moov).isEmpty)
  }

  test("video_metadata query path: decode over a table, nulls isolated per row") {
    val docs = Seq((3L, "x"), (10L, "y")).toDF("doc_id", "text")
    val media = Multimodal.attachGeneratedVideos(docs, "doc_id")
    val corrupt = Seq((99L, Array[Byte](9, 9, 9), "video/mp4"))
      .toDF("media_id", "payload", "media_type")
    val out = Multimodal.decodeVideoMetadata(media.unionByName(corrupt))
      .collect().map(r => r.getLong(0) -> r).toMap
    // id 3: timescale 900, 1 track; id 10 (v1 boxes): timescale 600, 2 tracks
    assert(out(3L).getInt(1) == 900 && out(3L).getInt(3) == 1)
    assert(out(10L).getInt(1) == 600 && out(10L).getInt(3) == 2
      && out(10L).getInt(4) == 1 && out(10L).getInt(5) == 1)
    assert(out(99L).isNullAt(1) && out(99L).isNullAt(7))
  }
}
