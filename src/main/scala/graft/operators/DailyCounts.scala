package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted per-(key, day) event-count profile — the incremental
  * substrate of the daily-series monitor family
  * ([[TimeSeries.fanoFactorFromDaily]] burstiness,
  * [[TimeSeries.autocorrMilliFromDaily]] seasonality,
  * [[TimeSeries.changepointFromDaily]] level shifts): at 100 TB a
  * monitor must NEVER rescan the event history, and daily counts are the
  * minimal sufficient statistic for all three — additive under
  * micro-batch folding, kilobytes per key however large the stream.
  *
  * Storage rides the [[ProfileStore]] schema `(key, sketch, n_rows)`
  * exactly like the HLL/KLL/Misra–Gries profiles — the composite
  * `key = <key> U+001F <epoch-day>` and a null sketch make the count
  * profile the blob-free member of the family, reusing the store's
  * replay guard and commit choreography unchanged (count addition is NOT
  * replay-idempotent, so the last merged micro-batch id rides in the
  * atomic metadata row and a replayed batch is a no-op). Keys must not
  * contain U+001F (the ASCII unit separator) — [[read]] splits on its
  * LAST occurrence, so a key containing it would mis-decode.
  *
  * Scale shape: each fold is one map-side-combined (key, day) count of
  * the BATCH plus a merge against the bounded profile table; the
  * monitors then run entirely on `|keys| · |days|` rows.
  */
object DailyCounts {

  private val Sep = "\u001f"

  /** One micro-batch's `(key, sketch=null, n_rows)` count rows. `tsCol`
    * may be a timestamp or an ISO-8601 string (the pipeline's
    * `original_timestamp`) — both route through a timestamp cast; day =
    * `unix_seconds div 86400`, the integer-calendar discipline. NULL
    * keys fold under the sentinel level `"(null)"` — a VOLUME monitor
    * must count every arrival, and silently dropping untyped rows would
    * hide exactly the ingest anomalies it watches for. */
  private[operators] def fresh(batch: DataFrame, keyCol: String,
      tsCol: String): DataFrame =
    batch
      .where(col(tsCol).isNotNull)
      .select(coalesce(col(keyCol).cast("string"), lit("(null)")).as("__k"),
        expr(TimeSeries.epochDaySql(s"cast(cast($tsCol as timestamp) as long)")).as("__day"))
      .where(col("__day").isNotNull)
      .groupBy("__k", "__day").agg(count(lit(1)).as("n_rows"))
      .select(concat(col("__k"), lit(Sep), col("__day")).as("key"),
        lit(null).cast("binary").as("sketch"), col("n_rows"))

  /** Fold one batch into the profile at `root` (created on first use)
    * under [[IndexStore.rewriteWith]]'s optimistic commit; with
    * `batchId` set (the streaming path), a batch id ≤ the recorded
    * last-merged id is a no-op. */
  def update(spark: SparkSession, root: String, batch: DataFrame,
      keyCol: String, tsCol: String, batchId: Option[Long] = None): Unit =
    ProfileStore.update(spark, root, batchId)(
      () => fresh(batch, keyCol, tsCol))(
      (cur, f) => cur.unionByName(f).groupBy("key")
        .agg(sum("n_rows").as("n_rows"))
        .select(col("key"), lit(null).cast("binary").as("sketch"),
          col("n_rows")))

  /** The profile's current `(key, day, n)` rows (metadata row excluded,
    * composite key decoded). The key part is everything before the LAST
    * `U+001F` (the day suffix never contains the separator, so a user
    * key that itself contains `U+001F` round-trips exactly — decoding
    * before the FIRST occurrence, the round-12 behavior, truncated such
    * keys and disagreed with this doc). */
  def read(spark: SparkSession, root: String): DataFrame =
    IndexStore.read(spark, root)
      .where(!(col("key") <=> lit(ProfileStore.MetaKey)))
      .select(
        expr(s"substring(key, 1, length(key) -" +
          s" length(substring_index(key, '$Sep', -1)) - 1)").as("key"),
        substring_index(col("key"), Sep, -1).cast("long").as("day"),
        col("n_rows").as("n"))
}
