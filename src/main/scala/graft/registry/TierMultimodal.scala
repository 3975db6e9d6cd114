package graft

import java.sql.Timestamp

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.F
import graft.operators.{Anomaly, Correlate, DailyCounts, Experiment, Hnsw, IndexStore, TextIndex, TimeSeries, Web, Bpe, Cardinality, Clustering, Cooccur, Decontaminate, Dedup, EditDistance, Embeddings, Extract, Frequencies, Funnel, Graph, Ivf, Joins, Multimodal, Pq, Quantiles, Sampling, Scd2, Sessionize, Similarity, Sketch, TextAnalysis, Upsert, Validate}
import graft.streaming.IncrementalStream
import graft.SparkEntry._

/** Opaque-binary multimodal columns: format sniffing, image/audio/
  * video/GIF feature extraction.
  *
  * One registry tier of [[SparkEntry]]'s driver contract (split from the
  * single 7k-line object in round 14): `queries` and `oracles` compose into
  * [[SparkEntry.queries]] / [[SparkEntry.oracleSql]] unchanged — entry text
  * is byte-identical to the pre-split map literals. Shared helpers (ts6,
  * shared builds, oracle CTE builders) stay on [[SparkEntry]] and arrive via
  * the wildcard import. */
private[graft] object TierMultimodal extends Registry {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Multimodal: opaque-binary byte-level feature extraction as native
    // expressions — size, first byte, magic-byte format sniff. No decoded
    // or fabricated content; dims/pixel stats come from the decode tiers.
    "multimodal_features" -> ((s, dir) =>
      Multimodal.withNativeFeatures(
          Multimodal.attachFakeMedia(Tables.documents(s, dir), "doc_id", "text"))
        .select("media_id", "n_bytes", "first_byte", "format")),

    // Format sniff over REAL encoded payloads: each doc id gets a payload
    // of one genuine format by id % 4 (PNG / WAV / MP4 / animated GIF) and
    // the codegen'd magic-byte sniffer must identify every one; the oracle
    // is the generator's id % 4 closed form.
    "media_format_sniff" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      def part(m: Long, attach: DataFrame => DataFrame) =
        attach(docs.where(col("doc_id") % 4 === m))
      val mixed = part(0, Multimodal.attachGeneratedImages(_, "doc_id"))
        .unionAll(part(1, Multimodal.attachGeneratedAudio(_, "doc_id")))
        .unionAll(part(2, Multimodal.attachGeneratedVideos(_, "doc_id")))
        .unionAll(part(3, Multimodal.attachGeneratedGifs(_, "doc_id")))
      Multimodal.withNativeFeatures(mixed).select("media_id", "format")
    }),

    // REAL image decode (JDK javax.imageio): deterministic generated PNGs
    // round-trip through an actual encode → decode → pixel scan; the oracle
    // recomputes the closed-form dims/channel sums the fixtures guarantee.
    "image_features" -> ((s, dir) =>
      Multimodal.decodeImageFeatures(
        Multimodal.attachGeneratedImages(Tables.documents(s, dir), "doc_id"))),

    // REAL audio decode (RIFF/WAVE PCM16 byte parse, no codec library):
    // generated fixtures round-trip through the genuine chunk walker, and
    // the oracle recomputes every stat from the generator's closed forms.
    "audio_features" -> ((s, dir) =>
      Multimodal.decodeAudioFeatures(
        Multimodal.attachGeneratedAudio(Tables.documents(s, dir), "doc_id"))),

    // REAL video-container metadata: generated ISO-BMFF payloads (genuine
    // nested box structures, version-0/1 mvhd+tkhd mix, a 64-bit-largesize
    // mdat every 7th id) round-tripped through the pure-JVM box walker;
    // the oracle recomputes the fixtures' closed forms.
    "video_metadata" -> ((s, dir) =>
      Multimodal.decodeVideoMetadata(
        Multimodal.attachGeneratedVideos(Tables.documents(s, dir), "doc_id"))),

    // REAL animated-GIF frame decode (JDK GIF codec): generated multi-frame
    // fixtures round-trip through an actual frame walk — true frame count,
    // dims, Graphic Control Extension delays, exact per-frame channel sums;
    // the oracle replays the generator's closed forms per (id, frame).
    "gif_frames" -> ((s, dir) =>
      Multimodal.decodeGifFrames(
        Multimodal.attachGeneratedGifs(Tables.documents(s, dir), "doc_id")))
  )

  val oracles: Map[String, String] = Map(

    // encode(text) mirrors Spark's string->binary cast (UTF-8 bytes);
    // text payloads can never carry a media magic number, so format is
    // the sniffer's CASE over the byte prefix (ASCII magics expressible
    // on text; PNG/JPEG magic bytes are not valid UTF-8 prefixes).
    "multimodal_features" ->
      """SELECT doc_id AS media_id,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  CAST(CASE WHEN strlen(text) = 0 THEN 0
        |            ELSE ascii(text[1:1]) END AS INTEGER) AS first_byte,
        |  CASE WHEN text LIKE 'GIF8%' THEN 'gif'
        |       WHEN text LIKE 'RIFF%' AND text[9:4] = 'WAVE' THEN 'wav'
        |       WHEN text[5:4] = 'ftyp' THEN 'mp4'
        |       ELSE 'unknown' END AS format
        |FROM documents""".stripMargin,

    // Closed form of the media_format_sniff generator: payload format is
    // chosen by id % 4 (PNG / WAV / MP4 / GIF) and the Spark side must
    // recover it from REAL encoded bytes.
    "media_format_sniff" ->
      """SELECT doc_id AS media_id,
        |  CASE doc_id % 4 WHEN 0 THEN 'png' WHEN 1 THEN 'wav'
        |       WHEN 2 THEN 'mp4' ELSE 'gif' END AS format
        |FROM documents""".stripMargin,

    // Closed forms of Multimodal.generatePng's fixture geometry: the Spark
    // side gets these numbers from a REAL ImageIO decode + pixel scan.
    "image_features" ->
      """SELECT doc_id AS media_id,
        |  CAST(1 + doc_id % 16 AS INTEGER) AS width,
        |  CAST(1 + (doc_id // 16) % 16 AS INTEGER) AS height,
        |  CAST((1 + (doc_id // 16) % 16)
        |       * ((1 + doc_id % 16) * (doc_id % 240)
        |          + ((1 + doc_id % 16) * (doc_id % 16)) // 2) AS BIGINT) AS sum_r,
        |  CAST((1 + doc_id % 16) * (1 + (doc_id // 16) % 16)
        |       * (doc_id % 256) AS BIGINT) AS sum_g,
        |  CAST((1 + doc_id % 16) * (1 + (doc_id // 16) % 16)
        |       * ((doc_id * 7) % 256) AS BIGINT) AS sum_b
        |FROM documents""".stripMargin,

    // Closed forms of Multimodal.generateWav: n = 8 + id%64 samples at
    // 8000 + (id%4)*4000 Hz, sample i = ((id*31 + i*17) % 2001) - 1000.
    "audio_features" ->
      """SELECT doc_id AS media_id,
        |  CAST(8000 + (doc_id % 4) * 4000 AS INTEGER) AS sample_rate,
        |  CAST(1 AS INTEGER) AS channels,
        |  CAST(8 + doc_id % 64 AS BIGINT) AS n_samples,
        |  CAST((8 + doc_id % 64) * 1000
        |       // (8000 + (doc_id % 4) * 4000) AS BIGINT) AS duration_ms,
        |  CAST(list_max([abs(((doc_id * 31 + i * 17) % 2001) - 1000)
        |                 for i in range(8 + doc_id % 64)]) AS INTEGER) AS peak,
        |  CAST(list_sum([((doc_id * 31 + i * 17) % 2001) - 1000
        |                 for i in range(8 + doc_id % 64)]) AS BIGINT) AS sum_samples
        |FROM documents""".stripMargin,

    "video_metadata" ->
      """WITH p AS (SELECT doc_id,
        |    600 + (doc_id % 5) * 100 AS timescale,
        |    600 + doc_id % 1000 AS duration,
        |    1 + doc_id % 3 AS n_tracks
        |  FROM documents)
        |SELECT doc_id AS media_id,
        |  CAST(timescale AS INTEGER) AS timescale,
        |  CAST(duration * 1000 // timescale AS BIGINT) AS duration_ms,
        |  CAST(n_tracks AS INTEGER) AS n_tracks,
        |  CAST((n_tracks + 1) // 2 AS INTEGER) AS n_video,
        |  CAST(n_tracks // 2 AS INTEGER) AS n_audio,
        |  CAST(160 * (2 * ((n_tracks - 1) // 2) + 1) + doc_id % 16
        |       AS INTEGER) AS max_width,
        |  CAST(90 * (2 * ((n_tracks - 1) // 2) + 1) + doc_id % 9
        |       AS INTEGER) AS max_height
        |FROM p""".stripMargin,

    // Closed forms of Multimodal.generateGif: w = 2 + id%8,
    // h = 2 + (id//8)%8, 2 + id%4 frames, frame f solid color
    // (5id+11f, 3id+7f, 13id+17f) % 256 with delay 2 + (id+3f) % 10 cs.
    "gif_frames" ->
      """WITH f AS (SELECT doc_id, unnest(range(2 + doc_id % 4)) AS fi
        |           FROM documents)
        |SELECT doc_id AS media_id,
        |  CAST(fi AS INTEGER) AS frame_idx,
        |  CAST(2 + doc_id % 8 AS INTEGER) AS width,
        |  CAST(2 + (doc_id // 8) % 8 AS INTEGER) AS height,
        |  CAST(2 + (doc_id + 3 * fi) % 10 AS INTEGER) AS delay_cs,
        |  CAST((2 + doc_id % 8) * (2 + (doc_id // 8) % 8)
        |       * ((doc_id * 5 + fi * 11) % 256) AS BIGINT) AS sum_r,
        |  CAST((2 + doc_id % 8) * (2 + (doc_id // 8) % 8)
        |       * ((doc_id * 3 + fi * 7) % 256) AS BIGINT) AS sum_g,
        |  CAST((2 + doc_id % 8) * (2 + (doc_id // 8) % 8)
        |       * ((doc_id * 13 + fi * 17) % 256) AS BIGINT) AS sum_b
        |FROM f""".stripMargin
  )
}
