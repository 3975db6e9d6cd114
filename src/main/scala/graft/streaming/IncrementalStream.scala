package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.{Dedup, Extract, Upsert}

/** Structured-Streaming variant of the incremental pipeline (SURVEY.md
  * §2.9 design 2): `readStream` on the source directory replaces the daily
  * schedule, the engine checkpoint replaces the JSON watermark file, and
  * `foreachBatch` performs exactly the per-micro-batch MERGE the reference
  * does per day.
  */
object IncrementalStream {

  /** Start the streaming upsert. Each micro-batch runs
    * filter → transform → dedup → merge, identical to the batch path. */
  def start(spark: SparkSession, sourceDir: String, targetPath: String,
      checkpointDir: String): StreamingQuery = {
    val docs = spark.readStream
      .schema(graft.schema.Schemas.sourceDoc)
      .parquet(sourceDir)

    val records = Extract.deriveRecord(Extract.nonEmptyEmbeddings(docs))

    records.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val deduped = Dedup.latestPerKey(batch, Seq("main_refco"),
          Seq(col("original_timestamp").desc))
        Upsert.mergeIntoParquet(batch.sparkSession, targetPath, deduped,
          keys = Seq("main_refco"),
          insertOnlyCols = Set("cleaned_ref"),
          refreshExprs = Map("embedding_inserted_at" -> current_timestamp()))
      }
      .start()
  }

  /** Streaming exact dedup with BOUNDED state: re-deliveries of the same
    * key arriving within the watermark window are dropped, and the
    * engine evicts key state once the watermark passes — unlike plain
    * `dropDuplicates`, whose state grows without bound on an infinite
    * stream. This is the at-least-once-source → exactly-once-sink dedup
    * for the incremental pipeline's redelivery case. */
  def dedupWithinWatermark(df: DataFrame, keyCols: Seq[String],
      tsCol: String, lateness: String): DataFrame =
    df.withWatermark(tsCol, lateness)
      .dropDuplicatesWithinWatermark(keyCols.head, keyCols.tail: _*)

  /** Event-time windowed aggregation with a watermark — the idiomatic
    * replacement for the reference's batch watermark bookkeeping when the
    * source is a true stream. */
  def windowedCounts(events: DataFrame, tsCol: String = "ts",
      keyCol: String = "event_type", window_ : String = "1 hour",
      lateness: String = "30 minutes"): DataFrame =
    events
      .withWatermark(tsCol, lateness)
      .groupBy(window(col(tsCol), window_), col(keyCol))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))
}
