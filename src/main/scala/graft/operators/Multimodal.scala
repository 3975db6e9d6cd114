package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns: image/audio/video treated as opaque `binary`
  * columns with typed metadata (BASELINE.json north star).
  *
  * Three tiers:
  *  1. [[withNativeFeatures]] — everything expressible on raw bytes without
  *     a codec (size, first byte, CRC32 checksum, derived dims) runs as
  *     native codegen'd expressions inside whole-stage codegen. This is the
  *     100 TB path for metadata-level features.
  *  2. [[decodeImageFeatures]] / [[resizeImage]] — REAL image decode using
  *     the JDK's built-in `javax.imageio` (PNG/JPEG/BMP/GIF need no
  *     external codec): true width/height and exact per-channel pixel sums,
  *     and a genuine decode → `Graphics2D` scale → re-encode resize. The
  *     per-partition shape holds one reader configuration per partition
  *     (`ImageIO.setUseCache(false)` so executors never spill decode
  *     scratch to local disk).
  *  3. [[decodeFeatures]] — the codec-shaped byte tier for formats the JVM
  *     genuinely cannot decode without external libraries (audio/video).
  *     Its body is a clearly-marked STUB computing the same deterministic
  *     features as tier 1, so the two paths are cross-checkable; a real
  *     deployment swaps only the body (ffmpeg-shaped: bytes in,
  *     fixed-width features out).
  */
object Multimodal {

  /** Contract schema for a media table: id + opaque payload + metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("payload", BinaryType),
    StructField("media_type", StringType)))

  /** Feature schema produced by either feature path. */
  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("n_bytes", LongType),
    StructField("first_byte", IntegerType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("checksum", LongType)))

  /** Attach a fake binary payload derived from a string column (the
    * container has no real media files; UTF-8 bytes stand in for an
    * encoded image). */
  def attachFakeMedia(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).cast("long").as("media_id"),
      col(textCol).cast("binary").as("payload"),
      lit("image/fake").as("media_type"))

  /** Codec-free feature extraction as native expressions — stays inside
    * whole-stage codegen, no RDD hop. `width`/`height` are the same
    * deterministic placeholders [[stubDecode]] computes (a real decoder
    * would read them from the codec header). */
  def withNativeFeatures(media: DataFrame): DataFrame = {
    val n = coalesce(length(col("payload")).cast("long"), lit(0L))
    val first = coalesce(
      conv(hex(substring(col("payload"), 1, 1)), 16, 10).cast("int"), lit(0))
    media.select(
      col("media_id"),
      n.as("n_bytes"),
      first.as("first_byte"),
      (n % 640).cast("int").as("width"),
      ((n * 31 + first) % 480).cast("int").as("height"),
      coalesce(crc32(col("payload")), lit(0L)).as("checksum"))
  }

  // ---------------------------------------------------------------------
  // Tier 2: REAL image decode — JDK-only javax.imageio, zero external deps
  // ---------------------------------------------------------------------

  /** Feature schema for real image decode: true dims + exact channel sums. */
  val imageFeatureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("sum_r", LongType),
    StructField("sum_g", LongType),
    StructField("sum_b", LongType)))

  /** Deterministic PNG fixture for `id`: a `w × h` image whose red channel
    * is a horizontal gradient `baseR + x` (proving the decoder scans every
    * pixel, not just the header) and whose green/blue channels are solid,
    * all derived from `id` with no 8-bit wraparound, so every decoded
    * statistic has a closed form an external SQL oracle can compute:
    * {{{
    *   w = 1 + id % 16        h = 1 + (id / 16) % 16   baseR = id % 240
    *   g = id % 256           b = (id * 7) % 256
    *   sum_r = h * (w * baseR + w*(w-1)/2)
    *   sum_g = w * h * g      sum_b = w * h * b
    * }}}
    * PNG is lossless, so encode → [[decodeImageFeatures]] round-trips these
    * exactly — the cross-check that proves the decode reads real pixels. */
  def generatePng(id: Long): Array[Byte] = {
    val w = (1 + id % 16).toInt
    val h = (1 + (id / 16) % 16).toInt
    val baseR = (id % 240).toInt
    val g = (id % 256).toInt
    val b = (id * 7 % 256).toInt
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, ((baseR + x) << 16) | (g << 8) | b); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Attach deterministic generated PNG payloads (the fixture path — a real
    * deployment reads already-encoded payload columns). Batched per
    * partition so encoder configuration happens once per partition. */
  def attachGeneratedImages(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    val rdd = df.select(col(idCol).cast("long")).rdd.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false) // no disk scratch on executors
      it.map { r => val id = r.getLong(0); Row(id, generatePng(id), "image/png") }
    }
    spark.createDataFrame(rdd, mediaSchema)
  }

  /** Decode one payload with the JDK codec; None when the bytes are not a
    * decodable image (per-row error isolation). */
  private[operators] def decodeOne(
      payload: Array[Byte]): Option[(Int, Int, Long, Long, Long)] = {
    if (payload == null || payload.isEmpty) return None
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      catch { case _: java.io.IOException => null }
    if (img == null) return None
    val w = img.getWidth
    val h = img.getHeight
    var sr = 0L; var sg = 0L; var sb = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        sr += (rgb >> 16) & 0xff; sg += (rgb >> 8) & 0xff; sb += rgb & 0xff
        x += 1
      }
      y += 1
    }
    Some((w, h, sr, sg, sb))
  }

  /** REAL image decode: `ImageIO.read` on the payload bytes → true
    * width/height + exact per-channel sums from a full pixel scan
    * (PNG/JPEG/BMP/GIF — every format the stock JDK ships readers for).
    * Undecodable or null payloads yield null feature columns: one corrupt
    * image must not fail a 100 TB scan. Per-partition batched;
    * `setUseCache(false)` keeps decode scratch in memory instead of
    * executor local disk. */
  def decodeImageFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val rdd = media.select("media_id", "payload").rdd.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { r =>
        val id = r.getLong(0)
        val payload = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
        decodeOne(payload) match {
          case Some((w, h, sr, sg, sb)) => Row(id, w, h, sr, sg, sb)
          case None                     => Row(id, null, null, null, null, null)
        }
      }
    }
    spark.createDataFrame(rdd, imageFeatureSchema)
  }

  /** REAL resize: decode → `Graphics2D` bilinear scale to target dims →
    * re-encode PNG, keeping the media schema. Per-partition configured (the
    * genuine codec-per-partition shape); undecodable payloads pass through
    * as null rather than failing the scan. */
  def resizeImage(media: DataFrame, targetW: Int, targetH: Int): DataFrame = {
    require(targetW > 0 && targetH > 0, "target dims must be positive")
    val spark = media.sparkSession
    val rdd = media.select("media_id", "payload", "media_type").rdd
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.map { r =>
          val payload = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
          val out =
            if (payload == null || payload.isEmpty) null
            else {
              val img =
                try javax.imageio.ImageIO.read(
                  new java.io.ByteArrayInputStream(payload))
                catch { case _: java.io.IOException => null }
              if (img == null) null
              else {
                val scaled = new java.awt.image.BufferedImage(
                  targetW, targetH, java.awt.image.BufferedImage.TYPE_INT_RGB)
                val g2 = scaled.createGraphics()
                try {
                  g2.setRenderingHint(
                    java.awt.RenderingHints.KEY_INTERPOLATION,
                    java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
                  g2.drawImage(img, 0, 0, targetW, targetH, null)
                } finally g2.dispose()
                val bos = new java.io.ByteArrayOutputStream()
                javax.imageio.ImageIO.write(scaled, "png", bos)
                bos.toByteArray
              }
            }
          Row(r.getLong(0), out, r.getString(2))
        }
      }
    spark.createDataFrame(rdd, mediaSchema)
  }

  // ---------------------------------------------------------------------
  // Tier 2b: REAL audio decode — RIFF/WAVE PCM, pure-JVM byte parse
  // (WAV is a 44-byte header + raw little-endian samples: no codec
  // library needed to decode it for real, unlike compressed audio)
  // ---------------------------------------------------------------------

  /** Feature schema for real WAV decode: format fields read from the
    * `fmt ` chunk + exact integer sample statistics from a full scan of
    * the `data` chunk. */
  val audioFeatureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("sample_rate", IntegerType),
    StructField("channels", IntegerType),
    StructField("n_samples", LongType),
    StructField("duration_ms", LongType),
    StructField("peak", IntegerType),
    StructField("sum_samples", LongType)))

  /** Deterministic PCM16 mono WAV fixture for `id`: `8 + id % 64` samples
    * at `8000 + (id % 4)·4000` Hz with sample i equal to
    * `((id·31 + i·17) mod 2001) − 1000` — every decoded statistic has a
    * closed form an external SQL oracle can compute, and the byte layout
    * is a REAL RIFF/WAVE file (round-tripping it through
    * [[decodeAudioFeatures]] proves the parser reads genuine chunks and
    * samples, not a formula). */
  def generateWav(id: Long): Array[Byte] = {
    val n = (8 + id % 64).toInt
    val rate = (8000 + (id % 4) * 4000).toInt
    val dataBytes = n * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataBytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataBytes)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(1) // mono
      .putInt(rate)
      .putInt(rate * 2) // byte rate
      .putShort(2) // block align
      .putShort(16) // bits per sample
      .put("data".getBytes("US-ASCII")).putInt(dataBytes)
    var i = 0
    while (i < n) {
      bb.putShort((((id * 31 + i * 17) % 2001) - 1000).toShort)
      i += 1
    }
    bb.array()
  }

  def attachGeneratedAudio(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    val rdd = df.select(col(idCol).cast("long")).rdd.mapPartitions { it =>
      it.map { r => val id = r.getLong(0); Row(id, generateWav(id), "audio/wav") }
    }
    spark.createDataFrame(rdd, mediaSchema)
  }

  /** Parse one RIFF/WAVE payload: walks the chunk list (not a fixed-44
    * assumption — real encoders insert LIST/fact chunks), requires
    * uncompressed PCM16, and scans every sample for exact integer stats.
    * None for anything that is not a well-formed PCM16 WAV (per-row error
    * isolation, same contract as the image tier). Returns
    * (rate, channels, nSamples, durationMs, peak, sum) with nSamples
    * counted per channel frame and peak = max |sample| over all
    * channels. */
  private[operators] def decodeWavOne(
      payload: Array[Byte]): Option[(Int, Int, Long, Long, Int, Long)] = {
    if (payload == null || payload.length < 44) return None
    def ascii(off: Int, n: Int) = new String(payload, off, n, "US-ASCII")
    if (ascii(0, 4) != "RIFF" || ascii(8, 4) != "WAVE") return None
    val bb = java.nio.ByteBuffer.wrap(payload)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    var off = 12
    var rate = -1; var channels = -1; var bits = -1; var fmt = -1
    var dataOff = -1; var dataLen = -1
    while (off + 8 <= payload.length && (fmt < 0 || dataOff < 0)) {
      val cid = ascii(off, 4)
      val clen = bb.getInt(off + 4)
      if (clen < 0 || off + 8 + clen > payload.length) return None
      if (cid == "fmt " && clen >= 16) {
        fmt = bb.getShort(off + 8) & 0xffff
        channels = bb.getShort(off + 10) & 0xffff
        rate = bb.getInt(off + 12)
        bits = bb.getShort(off + 22) & 0xffff
      } else if (cid == "data") { dataOff = off + 8; dataLen = clen }
      off += 8 + clen + (clen & 1) // chunks are word-aligned
    }
    if (fmt != 1 || bits != 16 || channels <= 0 || rate <= 0 ||
      dataOff < 0 || dataLen % 2 != 0) return None
    val count = dataLen / 2
    var sum = 0L; var peak = 0
    var i = 0
    while (i < count) {
      val s: Int = bb.getShort(dataOff + 2 * i)
      sum += s
      val a = math.abs(s)
      if (a > peak) peak = a
      i += 1
    }
    val frames = count / channels
    Some((rate, channels, frames, frames * 1000L / rate, peak, sum))
  }

  /** REAL audio decode over a media table: exact format fields + integer
    * sample stats per payload; malformed payloads yield null feature
    * columns instead of failing the scan. Per-partition batched like the
    * image tier. */
  def decodeAudioFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val rdd = media.select("media_id", "payload").rdd.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val payload = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
        decodeWavOne(payload) match {
          case Some((rate, ch, n, ms, peak, sum)) => Row(id, rate, ch, n, ms, peak, sum)
          case None => Row(id, null, null, null, null, null, null)
        }
      }
    }
    spark.createDataFrame(rdd, audioFeatureSchema)
  }

  // ---------------------------------------------------------------------
  // Tier 3: codec-shaped byte tier — STUB bodies, compressed audio/video
  // only (the JVM has no built-in codecs for those; images decode for
  // real in tier 2, PCM WAV in tier 2b)
  // ---------------------------------------------------------------------

  /** STUB decoder body (audio/video): deterministic fake "decode" of an
    * opaque payload. A real deployment swaps this for an ffmpeg-shaped
    * codec call; the signature — bytes in, fixed-width features out —
    * stays identical. Features match [[withNativeFeatures]] exactly so the
    * paths cross-validate. Images do NOT need this tier: use the real
    * [[decodeImageFeatures]]. */
  def stubDecode(id: Long, payload: Array[Byte]): Row = {
    val n = if (payload == null) 0L else payload.length.toLong
    val first = if (n > 0) payload(0) & 0xff else 0
    val width = (n % 640L).toInt
    val height = ((n * 31 + first) % 480L).toInt
    val crc = new java.util.zip.CRC32()
    if (payload != null) crc.update(payload)
    Row(id, n, first, width, height, if (payload == null) 0L else crc.getValue)
  }

  /** Codec-shaped path: per-partition batched iteration over opaque bytes —
    * the genuine `mapPartitions` shape a real decoder (PIL / ffmpeg via a
    * vectorized UDF) uses. Only for features that genuinely need a codec;
    * metadata features belong in [[withNativeFeatures]]. */
  def decodeFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val rdd = media.select("media_id", "payload").rdd.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val payload = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
        stubDecode(id, payload)
      }
    }
    spark.createDataFrame(rdd, featureSchema)
  }

  /** STUB resize codec body (audio/video waveform-thumbnail shape; images
    * use the real [[resizeImage]]): deterministic fake decode→scale→re-encode.
    * The real body is `decode(payload).resize(w, h).encode()`; the stub
    * folds the payload down to `targetW * targetH / 64` bytes by XOR so
    * output size tracks the target dims and content still depends on every
    * input byte. */
  def stubResize(payload: Array[Byte], targetW: Int, targetH: Int): Array[Byte] = {
    if (payload == null) return null
    val n = math.max(1, targetW * targetH / 64)
    val out = new Array[Byte](n)
    var i = 0
    while (i < payload.length) { out(i % n) = (out(i % n) ^ payload(i)).toByte; i += 1 }
    out
  }

  /** Resize: payload → payload at target dims, keeping the media schema —
    * per-partition batched iteration (a real impl holds ONE codec instance
    * per partition, not per row; the stub mirrors that shape). */
  def resize(media: DataFrame, targetW: Int, targetH: Int): DataFrame = {
    val spark = media.sparkSession
    val rdd = media.select("media_id", "payload", "media_type").rdd
      .mapPartitions { it =>
        // per-partition "codec" init goes here in a real deployment
        it.map { r =>
          val payload = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
          Row(r.getLong(0), stubResize(payload, targetW, targetH),
            r.getString(2))
        }
      }
    spark.createDataFrame(rdd, mediaSchema)
  }

  /** Frame-sample output schema: one row per sampled frame. */
  val frameSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("frame_idx", IntegerType, nullable = false),
    StructField("frame", BinaryType)))

  /** STUB frame extraction (video — genuinely codec-less on a stock JVM):
    * slices the payload into `n` contiguous chunks (a real body seeks the
    * container's keyframes). */
  def stubFrames(payload: Array[Byte], n: Int): Seq[Array[Byte]] = {
    if (payload == null || payload.isEmpty) return Seq.empty
    val step = math.max(1, payload.length / n)
    (0 until math.min(n, payload.length)).map { i =>
      payload.slice(i * step, math.min(payload.length, i * step + step))
    }
  }

  /** Frame sampling: one media row → up to `n` frame rows. Flat-mapped
    * per partition (batched, codec-per-partition shape); the fan-out is
    * bounded by `n`, so a 100 TB video table expands predictably. */
  def sampleFrames(media: DataFrame, n: Int): DataFrame = {
    val spark = media.sparkSession
    val rdd = media.select("media_id", "payload").rdd.mapPartitions { it =>
      it.flatMap { r =>
        val payload = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
        stubFrames(payload, n).zipWithIndex.map { case (f, i) =>
          Row(r.getLong(0), i, f)
        }
      }
    }
    spark.createDataFrame(rdd, frameSchema)
  }
}
