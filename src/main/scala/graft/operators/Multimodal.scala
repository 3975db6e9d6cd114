package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns: image/audio/video treated as opaque `binary`
  * columns with typed metadata (BASELINE.json north star).
  *
  * Two tiers:
  *  1. [[withNativeFeatures]] — everything expressible on raw bytes without
  *     a codec (size, first byte, CRC32 checksum, derived dims) runs as
  *     native codegen'd expressions inside whole-stage codegen. This is the
  *     100 TB path for metadata-level features.
  *  2. [[decodeFeatures]] — the per-partition batched iteration a real
  *     codec needs (PIL/ffmpeg-shaped: bytes in, fixed-width features out).
  *     The decode body is a clearly-marked STUB (no codec libraries in this
  *     container) computing the same deterministic features as tier 1, so
  *     the two paths are cross-checkable; a real deployment swaps only the
  *     body.
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

  /** STUB decoder body: deterministic fake "decode" of an opaque payload.
    * A real deployment swaps this for an actual codec call; the signature
    * — bytes in, fixed-width features out — stays identical. Features match
    * [[withNativeFeatures]] exactly so the paths cross-validate. */
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

  /** STUB resize codec body: deterministic fake decode→scale→re-encode.
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

  /** STUB frame extraction: slices the payload into `n` contiguous chunks
    * (a real body seeks the container's keyframes). */
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
