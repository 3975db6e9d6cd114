package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted, mergeable per-key FREQUENT-ITEMS (heavy hitters) profiles —
  * Datasketches `ItemsSketch` through the custom
  * [[graft.functions.FreqSketchAgg]] aggregates, committed through
  * [[IndexStore]]'s snapshot protocol. The third member of the profile
  * family, completing cardinality ([[Cardinality]], HLL) and quantiles
  * ([[Quantiles]], KLL): "which tokens/domains/ids dominate each source,
  * and how hard" over a growing corpus, without ever re-scanning history.
  *
  * The 100 TB shape: per-batch per-key sketches fold map-side (the one
  * shuffle carries bounded ≤ maxMapSize item maps, never the token
  * stream), the persisted profile absorbs them by sketch merge, and the
  * commit is atomic with recompute-on-retry under concurrent writers.
  * A vocabulary-pruning or stopword-discovery job then reads the profile
  * instead of the corpus.
  *
  * Exact regime (what the driver oracle checks): while a key's distinct
  * item count stays under the sketch's purge threshold (0.75 ·
  * maxMapSize), estimates are exact counts — plain GROUP BY counts in
  * SQL. Past it, the Misra–Gries bound: no item whose true count exceeds
  * the sketch's maximum error is ever lost, estimates overshoot by at
  * most that error. Merge is NOT idempotent (a replayed batch
  * double-counts), so the streaming path carries the same atomically-
  * committed last-batch-id replay guard as [[Quantiles]]. */
object Frequencies {

  /** Per-key batch sketches: `(key, sketch, n_rows)` — one hash shuffle
    * with map-side partial sketch fold. */
  def sketch(df: DataFrame, keyCol: String, itemCol: String,
      maxMapSize: Int = 256): DataFrame =
    df.groupBy(col(keyCol).as("key"))
      .agg(graft.functions.F
          .freqSketchAgg(col(itemCol).cast("string"), maxMapSize).as("sketch"),
        count(lit(1)).as("n_rows"))

  /** Sentinel key of the replay-guard metadata row (see [[Quantiles.MetaKey]]
    * — same non-idempotent-merge rationale). */
  val MetaKey: String = ProfileStore.MetaKey

  /** Merge one batch into the persisted profile at `root` (created on
    * first use) under [[IndexStore.rewriteWith]]'s optimistic commit.
    * With `batchId` set (the streaming path), a batch id ≤ the recorded
    * last-merged id is a no-op. */
  def update(spark: SparkSession, root: String, batch: DataFrame,
      keyCol: String, itemCol: String, maxMapSize: Int = 256,
      batchId: Option[Long] = None): Unit =
    ProfileStore.update(spark, root, batchId)(
      () => sketch(batch, keyCol, itemCol, maxMapSize))(
      (cur, fresh) => cur.unionByName(fresh)
        .groupBy("key")
        .agg(graft.functions.F.freqUnionAgg(col("sketch"), maxMapSize)
          .as("sketch"), sum("n_rows").as("n_rows")))

  /** Decode a sketch frame (from [[sketch]], or an [[IndexStore.read]]
    * of the profile — null-sketch metadata rows decode to null and are
    * dropped by the explode) to one row per frequent item at `minCount`:
    * `(key, item, estimate, lb, ub)`, deterministic order within a key
    * by (estimate DESC, item ASC). */
  def topItems(sketches: DataFrame, minCount: Long): DataFrame =
    sketches.select(col("key"),
        explode(graft.functions.F.freqTopItems(col("sketch"), minCount))
          .as("fi"))
      .select(col("key"), col("fi.item").as("item"),
        col("fi.estimate").as("estimate"),
        col("fi.lb").as("lb"), col("fi.ub").as("ub"))

  /** The persisted profile's current frequent items (metadata row
    * excluded). */
  def estimates(spark: SparkSession, root: String, minCount: Long): DataFrame =
    topItems(IndexStore.read(spark, root)
      .where(!(col("key") <=> lit(MetaKey))), minCount)

  /** EXACT top-k key-skew census — the diagnostic behind every
    * partition-skew decision in this library (salting, degree caps,
    * chunked windows): the k heaviest values of a key with their row
    * counts and integer-permille share of the table. The exact
    * single-shot twin of the [[sketch]] Misra–Gries stream: run this
    * before choosing a shuffle key, page when the top share crosses a
    * bound. Deterministic (count DESC, key ASC).
    *
    * Scale shape: one map-side-combined count per distinct key (hot
    * keys arrive at the reducer as partials), a bounded TakeOrdered k,
    * and a one-row total broadcast for the share — no full sort, no
    * row-level exchange. */
  def keySkewCensus(df: DataFrame, keyCol: String, k: Int = 20): DataFrame = {
    require(k > 0, "k must be positive")
    val counts = df.groupBy(col(keyCol).as("key"))
      .agg(count(lit(1)).as("n"))
    val total = df.agg(count(lit(1)).as("__t"))
    counts
      .orderBy(col("n").desc, col("key").asc).limit(k)
      .crossJoin(broadcast(total))
      .selectExpr("key", "CAST(n AS BIGINT) AS n",
        "CAST(1000 * n div __t AS BIGINT) AS permille")
  }
}
