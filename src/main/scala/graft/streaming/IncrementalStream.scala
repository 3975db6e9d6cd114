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
    * filter → transform → dedup → merge, identical to the batch path.
    *
    * @param nearDupTextCol when set, each batch is additionally filtered
    *   against the ACCUMULATED target (not just within the batch): rows
    *   whose text is a MinHash-LSH near-duplicate of an already-merged row
    *   under a different key are dropped before the merge. Candidate
    *   generation is the bucketed LSH join — never a batch × target
    *   cartesian — so the cost scales with colliding buckets, and the
    *   check survives restarts because the target itself is the state.
    */
  def start(spark: SparkSession, sourceDir: String, targetPath: String,
      checkpointDir: String, nearDupTextCol: Option[String] = None,
      nearDupThreshold: Double = 0.8, nearDupShingle: Int = 3): StreamingQuery = {
    val docs = spark.readStream
      .schema(graft.schema.Schemas.sourceDoc)
      .parquet(sourceDir)

    val records = Extract.deriveRecord(Extract.nonEmptyEmbeddings(docs))

    records.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val s = batch.sparkSession
        val within = Dedup.latestPerKey(batch, Seq("main_refco"),
          Seq(col("original_timestamp").desc))
        val deduped = nearDupTextCol match {
          case Some(tc) =>
            val tgt = Upsert.currentSnapshot(s, targetPath)
              .map(_ => Upsert.readTarget(s, targetPath))
            dropNearDups(within, tgt, tc, nearDupThreshold, nearDupShingle)
          case None => within
        }
        Upsert.mergeIntoParquet(s, targetPath, deduped,
          keys = Seq("main_refco"),
          insertOnlyCols = Set("cleaned_ref"),
          refreshExprs = Map("embedding_inserted_at" -> current_timestamp()))
      }
      .start()
  }

  /** Drop batch rows whose `textCol` is a MinHash-LSH near-duplicate
    * (Jaccard >= threshold) of a target row or of a smaller-keyed batch
    * row. Same-key pairs are exempt: an update to an existing key is the
    * merge's job, not a duplicate. */
  private[streaming] def dropNearDups(batch: DataFrame,
      target: Option[DataFrame], textCol: String, threshold: Double,
      n: Int): DataFrame = {
    val tag = (origin: String, df: DataFrame) => df.select(
      concat(lit(origin), col("main_refco")).as("__id"),
      col(textCol).as("__text"))
    val all = target.foldLeft(tag("b:", batch))((acc, t) =>
      acc.unionByName(tag("t:", t)))
    val pairs = Dedup.minHashLshPairs(all, "__id", "__text",
      n = n, threshold = threshold)
    val key = (c: org.apache.spark.sql.Column) => regexp_replace(c, "^[bt]:", "")
    // "b:" < "t:", so a batch-vs-target pair always has the batch row as
    // a_id; batch-vs-batch keeps the smaller key; target-internal pairs
    // fall out of the startsWith filter.
    val drops = pairs
      .where(key(col("a_id")) =!= key(col("b_id")))
      .select(when(col("b_id").startsWith("t:"), col("a_id"))
        .otherwise(col("b_id")).as("__drop"))
      .where(col("__drop").startsWith("b:"))
      .select(regexp_replace(col("__drop"), "^b:", "").as("main_refco"))
      .distinct()
    batch.join(drops, Seq("main_refco"), "left_anti")
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
