package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted, mergeable per-key cardinality profiles — Datasketches HLL
  * (Spark's native `hll_sketch_agg` / `hll_union_agg` / `hll_sketch_
  * estimate`, all codegen-able aggregates) committed through
  * [[IndexStore]]'s snapshot protocol.
  *
  * The 100 TB shape this exists for: "distinct X per source" over a
  * growing corpus. Recounting is a full-history scan per batch;
  * `approx_count_distinct` inside one job can't be SAVED and extended.
  * A sketch table can: each incremental batch computes its own tiny
  * per-key sketches (map-side partial aggregation, one shuffle of
  * kilobyte blobs), merges them into the persisted profile by register-
  * wise max, and commits atomically — cost per batch is O(batch), never
  * O(history). HLL union is associative/commutative/idempotent, so batch
  * boundaries, replays of an already-merged batch's rows, and merge order
  * never distort the profile — it stays within the sketch's error bound
  * of a single-pass sketch of the whole corpus (see below for why not
  * bit-for-bit).
  *
  * At small cardinalities the Datasketches sketch is in its coupon
  * regime — it stores compressed HASHES of the values, so estimates are
  * exact up to coupon-hash collisions (P ≈ n²/2²⁶; deterministic for a
  * fixed dataset), which is what lets the `vocab_cardinality` driver
  * query carry a full count(DISTINCT) oracle at test scale (~31 distinct
  * per source). At 100 TB cardinalities the same code degrades gracefully
  * to the ~1.6% (lgK=12) RSE regime; incremental-merge and single-pass
  * builds then agree to within the error bound, not bit-for-bit (their
  * LIST→SET→HLL promotion paths differ).
  */
object Cardinality {

  /** Per-key batch sketches: `(key, sketch, n_rows)` — one hash shuffle
    * with map-side partial sketch merge; the exchanged payload is the
    * 2^lgK-register sketch, not the values. */
  def sketch(df: DataFrame, keyCol: String, valueCol: String,
      lgK: Int = 12): DataFrame =
    df.groupBy(col(keyCol).as("key"))
      .agg(hll_sketch_agg(col(valueCol), lit(lgK)).as("sketch"),
        count(lit(1)).as("n_rows"))

  /** Merge one batch into the persisted profile at `root` (creates it on
    * first use). Runs inside [[IndexStore.rewriteWith]]'s optimistic
    * commit loop (via the shared [[ProfileStore]] skeleton), so a
    * conflicting concurrent update triggers a full recompute against the
    * winner's snapshot — no lost registers — and a crash at any point
    * leaves the previous profile readable. HLL union is idempotent, so
    * no replay-guard batch id is needed. */
  def update(spark: SparkSession, root: String, batch: DataFrame,
      keyCol: String, valueCol: String, lgK: Int = 12): Unit =
    ProfileStore.update(spark, root, batchId = None)(
      () => sketch(batch, keyCol, valueCol, lgK))(
      (cur, fresh) => cur.unionByName(fresh)
        .groupBy("key")
        .agg(hll_union_agg(col("sketch"), lit(true)).as("sketch"),
          sum("n_rows").as("n_rows")))

  /** Decode a sketch frame (from [[sketch]] or [[read]]) to
    * `(key, estimate, n_rows)`. */
  def estimate(sketches: DataFrame): DataFrame =
    sketches.select(col("key"),
      hll_sketch_estimate(col("sketch")).as("estimate"), col("n_rows"))

  /** NOVELTY of a batch against a historical sketch frame — the
    * incremental-crawl coverage monitor: per key, how many of the
    * batch's distinct values the history has never seen, from sketches
    * alone. `new_distinct = est(old ∪ batch) − est(old)` (HLL union is
    * lossless over the per-value coupons, so in the coupon-exact regime
    * this IS the true new-distinct count — the driver oracle's basis —
    * and at 100 TB cardinalities it degrades to the union's error
    * bound); `novelty_permille` is integer arithmetic over the two
    * estimates. A key absent from history is fully novel; history keys
    * absent from the batch are omitted (novelty of nothing). The frames
    * join per KEY (profile-sized, tiny), never per value — history is
    * never rescanned, which is the point of profiling it. */
  def novelty(history: DataFrame, batch: DataFrame, keyCol: String,
      valueCol: String, lgK: Int = 12): DataFrame = {
    val fresh = sketch(batch, keyCol, valueCol, lgK)
      .select(col("key"), col("sketch").as("__bs"))
    fresh.join(history.select(col("key"), col("sketch").as("__hs")),
        Seq("key"), "left")
      .select(col("key"),
        hll_sketch_estimate(col("__bs")).as("batch_distinct"),
        when(col("__hs").isNull, hll_sketch_estimate(col("__bs")))
          .otherwise(hll_sketch_estimate(hll_union(col("__hs"), col("__bs"))) -
            hll_sketch_estimate(col("__hs"))).as("new_distinct"))
      .withColumn("novelty_permille",
        when(col("batch_distinct") > 0,
          expr("new_distinct * 1000 div batch_distinct")).otherwise(lit(0L)))
  }

  /** [[novelty]] against the persisted profile at `root` (empty profile
    * ⇒ everything is novel). */
  def noveltyVsProfile(spark: SparkSession, root: String, batch: DataFrame,
      keyCol: String, valueCol: String, lgK: Int = 12): DataFrame = {
    val hist =
      if (IndexStore.exists(spark, root)) IndexStore.read(spark, root)
      else sketch(batch.limit(0), keyCol, valueCol, lgK)
    novelty(hist, batch, keyCol, valueCol, lgK)
  }

  /** The persisted profile's current estimates. */
  def estimates(spark: SparkSession, root: String): DataFrame =
    estimate(IndexStore.read(spark, root))
}
