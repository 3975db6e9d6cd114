package graft

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Extract, Upsert}
import graft.sources.WatermarkStore

/** End-to-end incremental pipeline — the whole reference DAG as ONE Spark
  * job (SURVEY.md §3.1): read → watermark filter → transform → window
  * dedup → dimension join → merge upsert → advance watermarks.
  *
  * Airflow's per-source dynamic task fan-out becomes partition parallelism
  * (`Window.partitionBy("source")`-style keying); XCom becomes in-job
  * DataFrames; state persists only after the merge succeeds, preserving
  * the reference's at-least-once + idempotent-upsert ordering
  * (`embeddings-pipeline.py:480`).
  */
object Pipeline {

  /** Config mirrored from the reference's Airflow Variables
    * (`CONFIGURATION.md:8-53`). */
  case class Config(
      sourcePath: String,
      targetPath: String,
      statePath: String,
      sourcesConfigPath: Option[String] = None,
      fallbackDate: Timestamp = Timestamp.valueOf("2024-01-01 00:00:00"),
      mainRefcoMaxLength: Int = graft.schema.Schemas.MainRefcoMaxLength)

  case class RunStats(
      recordsProcessed: Long,
      uniqueRecords: Long,
      sources: Long,
      newWatermarks: Map[String, Timestamp])

  def run(spark: SparkSession, conf: Config): RunStats = {
    val docs = spark.read.schema(graft.schema.Schemas.sourceDoc)
      .parquet(conf.sourcePath)

    // S3: watermark state (missing file => full backfill from fallback)
    val prior = WatermarkStore.read(spark, conf.statePath)
    import spark.implicits._
    val wmDf = prior.toSeq.toDF("source", "wm")

    // F2 + F3/F4 + P1..P8 — one declarative plan
    val filtered = Extract.incrementalFilter(
      Extract.nonEmptyEmbeddings(docs), wmDf, conf.fallbackDate)
    val incoming = Extract.deriveRecord(filtered)

    val recordsProcessed = incoming.count()

    // W1: keep-latest per merge key, ordering lexicographic on ISO string
    val deduped = Dedup.latestPerKey(incoming, Seq("main_refco"),
      Seq(col("original_timestamp").desc))

    // J1: broadcast dimension join (inner — unmatched rows drop silently)
    val withDim = conf.sourcesConfigPath match {
      case Some(p) =>
        val dim = spark.read.parquet(p).select("display_name", "display_name_id")
        deduped.join(broadcast(dim), Seq("display_name"), "inner")
      case None => deduped.withColumn("display_name_id", lit(null).cast("long"))
    }

    val uniqueRecords = withDim.count()

    // J3: idempotent merge (cleaned_ref inserted but never updated)
    Upsert.mergeIntoParquet(spark, conf.targetPath, withDim,
      keys = Seq("main_refco"),
      insertOnlyCols = Set("cleaned_ref"),
      refreshExprs = Map("embedding_inserted_at" -> current_timestamp()))

    // A2/A4: advance watermarks — only after successful merge
    val maxima = filtered
      .groupBy("source").agg(max("timestamp").as("wm"))
      .collect().map(r => r.getString(0) -> r.getTimestamp(1)).toMap
    val advanced = WatermarkStore.advance(prior, maxima)
    WatermarkStore.write(spark, conf.statePath, advanced)

    RunStats(recordsProcessed, uniqueRecords, maxima.size.toLong, advanced)
  }
}
