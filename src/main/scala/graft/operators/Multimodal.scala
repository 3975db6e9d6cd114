package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns: image/audio/video treated as opaque `binary`
  * columns with typed metadata (BASELINE.json north star).
  *
  * The decode step is a clearly-marked STUB — the image/audio codec
  * libraries are not in this container — but the Spark-side plumbing is
  * real and tested: schema contract, per-partition batched iteration (the
  * same shape a Pandas-UDF / `mapInPandas` batch has), and a deterministic
  * fake decoder so results are verifiable.
  */
object Multimodal {

  /** Contract schema for a media table: id + opaque payload + metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("payload", BinaryType),
    StructField("media_type", StringType)))

  /** Feature schema produced by the decoder. */
  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("n_bytes", LongType),
    StructField("first_byte", IntegerType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("checksum", LongType)))

  /** STUB decoder: deterministic fake "decode" of an opaque payload.
    * A real deployment swaps this body for an actual codec call (PIL /
    * ffmpeg via Pandas UDF); the signature — bytes in, fixed-width features
    * out — and everything around it stays identical. */
  def stubDecode(id: Long, payload: Array[Byte]): Row = {
    val n = if (payload == null) 0L else payload.length.toLong
    val first = if (n > 0) payload(0) & 0xff else 0
    // fake dimensions derived from the byte stream, stable across runs
    val width = (n % 640L).toInt
    val height = ((n * 31 + first) % 480L).toInt
    var crc = 0L
    if (payload != null) {
      var i = 0
      while (i < payload.length) { crc = (crc * 131 + (payload(i) & 0xff)) % 1000000007L; i += 1 }
    }
    Row(id, n, first, width, height, crc)
  }

  /** Attach a fake binary payload derived from a string column (the
    * container has no real media files; UTF-8 bytes stand in for an
    * encoded image). */
  def attachFakeMedia(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).cast("long").as("media_id"),
      col(textCol).cast("binary").as("payload"),
      lit("image/fake").as("media_type"))

  /** Decode features per partition — batched imperative iteration, the
    * genuine `mapPartitions` path a real codec would use (RDD zone is
    * justified here per SURVEY.md: per-partition imperative logic over
    * opaque bytes). */
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
}
