package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted, mergeable per-key COUNT-MIN point-frequency profiles —
  * the [[graft.functions.CmSketchAgg]] family committed through
  * [[IndexStore]]'s snapshot protocol: the fourth member of the profile
  * family, completing cardinality ([[Cardinality]], HLL), quantiles
  * ([[Quantiles]], KLL) and heavy hitters ([[Frequencies]], Misra–Gries).
  * "How often has THIS item been seen per source, over the whole growing
  * corpus" in bounded memory, answerable without rescanning history —
  * the frequency-floor side of curation rules (Misra–Gries enumerates
  * the dominant items; Count-Min answers point probes for ARBITRARY
  * items, including ones far below the heavy-hitter threshold).
  *
  * The 100 TB shape: per-batch per-key sketches fold map-side (the one
  * shuffle carries ≈ 8·depth·width-byte counter blobs, never the token
  * stream), the persisted profile absorbs them by elementwise counter
  * addition, and the commit is atomic with recompute-on-retry under
  * concurrent writers. Buckets come from the portable
  * [[graft.functions.PortableHash.mix64]] — the SAME function as the
  * batch [[Sketch.countMinEstimates]] — so every counter is a
  * deterministic integer and the DuckDB oracle replays the sketch
  * exactly: the gate measures the estimate's overestimate, never assumes
  * the bound (`exact ≤ estimate ≤ exact + ε·N` w.h.p. at width ≈ e/ε).
  *
  * Counter addition is NOT idempotent (a replayed batch double-counts),
  * so the streaming path carries the same atomically committed
  * last-batch-id replay guard as [[Quantiles]] and [[Frequencies]]. */
object CountMin {

  /** Per-key batch sketches: `(key, sketch, n_rows)` — one hash shuffle
    * with map-side partial counter fold. */
  def sketch(df: DataFrame, keyCol: String, itemCol: String,
      depth: Int = 4, width: Int = 256): DataFrame =
    df.groupBy(col(keyCol).as("key"))
      .agg(graft.functions.F
          .cmSketchAgg(col(itemCol).cast("string"), depth, width).as("sketch"),
        count(lit(1)).as("n_rows"))

  /** Sentinel key of the replay-guard metadata row. */
  val MetaKey: String = ProfileStore.MetaKey

  /** Merge one batch into the persisted profile at `root` (created on
    * first use) under [[IndexStore.rewriteWith]]'s optimistic commit.
    * With `batchId` set (the streaming path), a batch id ≤ the recorded
    * last-merged id is a no-op. */
  def update(spark: SparkSession, root: String, batch: DataFrame,
      keyCol: String, itemCol: String, depth: Int = 4, width: Int = 256,
      batchId: Option[Long] = None): Unit =
    ProfileStore.update(spark, root, batchId)(
      () => sketch(batch, keyCol, itemCol, depth, width))(
      (cur, fresh) => merge(cur.unionByName(fresh), depth, width))

  /** Fold a frame of per-key sketches down to one sketch per key —
    * elementwise counter addition (exactly associative/commutative, the
    * mergeability contract the whole profile family rides). */
  def merge(sketches: DataFrame, depth: Int = 4, width: Int = 256): DataFrame =
    sketches.groupBy("key")
      .agg(graft.functions.F.cmUnionAgg(col("sketch"), depth, width)
        .as("sketch"), sum("n_rows").as("n_rows"))

  /** Probe a sketch frame (from [[sketch]]/[[merge]], or an
    * [[IndexStore.read]] of the profile) with `(key, item)` rows:
    * one row per probe with the item's estimate. The sketch side is
    * key-bounded (one blob per key) — broadcast it, never the probes. */
  def estimates(sketches: DataFrame, probes: DataFrame): DataFrame =
    probes.join(broadcast(sketches.select("key", "sketch")), Seq("key"))
      .select(col("key"), col("item"),
        graft.functions.F.cmQuery(col("sketch"), col("item").cast("string"))
          .as("cm_estimate"))

  /** The persisted profile's estimates for a probe frame (metadata row
    * excluded). */
  def estimatesAt(spark: SparkSession, root: String,
      probes: DataFrame): DataFrame =
    estimates(IndexStore.read(spark, root)
      .where(!(col("key") <=> lit(MetaKey))), probes)
}
