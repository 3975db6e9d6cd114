package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted, mergeable per-key QUANTILE profiles — Datasketches KLL
  * through the custom [[graft.functions.KllSketchAgg]] aggregates
  * (Spark ships sketch aggregates for cardinality but not quantiles),
  * committed through [[IndexStore]]'s snapshot protocol. The quantile
  * companion to [[Cardinality]]: same batch→merge→commit lifecycle, same
  * recompute-on-retry concurrency behavior, same graceful exact→bounded
  * degradation.
  *
  * The 100 TB shape: "p50/p99 of X per source" over a growing corpus
  * without re-scanning history. Each batch folds its values into per-key
  * ~KB sketches map-side (ONE shuffle of blobs, never values), the
  * persisted profile absorbs them by sketch merge, and the commit is
  * atomic. KLL merge is associative and commutative, so batch boundaries
  * and merge order never distort the profile; rank error is ~1.65% at
  * the default k = 200 regardless of n.
  *
  * Exact regime (what the driver oracle checks): while a key's value
  * count stays ≤ k the sketch retains every value, and INCLUSIVE
  * quantiles are plain order statistics — the sorted value at 1-based
  * index ⌈r·n⌉ — reproducible in SQL. The `quantile_profile` query runs
  * there by construction (25 docs per source at sf0.01). */
object Quantiles {

  /** Per-key batch sketches: `(key, sketch, n_rows)`. */
  def sketch(df: DataFrame, keyCol: String, valueCol: String,
      k: Int = 200): DataFrame =
    df.groupBy(col(keyCol).as("key"))
      .agg(graft.functions.F
          .kllSketchAgg(col(valueCol).cast("double"), k).as("sketch"),
        count(lit(1)).as("n_rows"))

  /** Sentinel key of the replay-guard metadata row: KLL merge — unlike
    * HLL union — is NOT idempotent (re-merging a batch double-counts its
    * values), so the at-least-once streaming path records the last merged
    * micro-batch id in a metadata row committed ATOMICALLY with the
    * sketches, and a replayed id leaves the profile untouched. */
  val MetaKey: String = ProfileStore.MetaKey

  /** Merge one batch into the persisted profile at `root` (created on
    * first use) under [[IndexStore.rewriteWith]]'s optimistic commit.
    * With `batchId` set (the streaming path), a batch id ≤ the recorded
    * last-merged id is a no-op — exactly-once folding per micro-batch on
    * top of at-least-once delivery. */
  def update(spark: SparkSession, root: String, batch: DataFrame,
      keyCol: String, valueCol: String, k: Int = 200,
      batchId: Option[Long] = None): Unit =
    ProfileStore.update(spark, root, batchId)(
      () => sketch(batch, keyCol, valueCol, k))(
      (cur, fresh) => cur.unionByName(fresh)
        .groupBy("key")
        .agg(graft.functions.F.kllUnionAgg(col("sketch"), k).as("sketch"),
          sum("n_rows").as("n_rows")))

  /** Decode a sketch frame to one column per requested rank
    * (`"q" + rank-in-permille`, e.g. q500, q900, q990). */
  def quantiles(sketches: DataFrame, ranks: Seq[Double]): DataFrame = {
    val qs = graft.functions.F.kllQuantiles(col("sketch"), ranks)
    ranks.zipWithIndex.foldLeft(sketches) { case (df, (r, i)) =>
      df.withColumn(s"q${math.round(r * 1000)}", qs.getItem(i))
    }.drop("sketch")
  }

  /** The persisted profile's current quantiles (metadata row excluded). */
  def estimates(spark: SparkSession, root: String,
      ranks: Seq[Double]): DataFrame =
    quantiles(IndexStore.read(spark, root)
      .where(!(col("key") <=> lit(MetaKey))), ranks)
}
