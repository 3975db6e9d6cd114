package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared update skeleton of the persisted sketch-profile family
  * ([[Cardinality]] HLL, [[Quantiles]] KLL, [[Frequencies]] Misra–Gries):
  * one place owns the replay guard and commit choreography —
  *
  *  - profiles live as `(key, sketch, n_rows)` frames committed through
  *    [[IndexStore.rewriteWith]] (recompute-on-retry under concurrent
  *    writers, crash leaves the previous profile readable);
  *  - families whose merge is NOT idempotent pass `batchId`: the last
  *    merged micro-batch id rides in a [[MetaKey]] metadata row committed
  *    ATOMICALLY with the sketches, and a batch id ≤ the recorded one is
  *    a no-op — exactly-once folding on at-least-once delivery;
  *  - idempotent families (HLL union) pass `batchId = None` and carry no
  *    guard row.
  *
  * The subtle parts (meta-row exclusion before merge, guard comparison,
  * meta re-append on unguarded updates) previously lived copy-pasted in
  * each family; a divergence there would silently corrupt one profile's
  * replay behavior.
  */
private[operators] object ProfileStore {

  /** Sentinel key of the replay-guard metadata row. */
  val MetaKey = "__meta:last_batch"

  /** Merge one batch into the profile at `root` (created on first use).
    * `fresh` builds the batch's own per-key sketch frame; `merge` folds
    * the existing profile rows (meta row already excluded) with it —
    * both run INSIDE the optimistic commit loop, so a conflict retry
    * recomputes against the winner's snapshot. */
  def update(spark: SparkSession, root: String, batchId: Option[Long])(
      fresh: () => DataFrame)(
      merge: (DataFrame, DataFrame) => DataFrame): Unit =
    IndexStore.rewriteWith(spark, root)(() => {
      val existing =
        if (IndexStore.exists(spark, root)) Some(IndexStore.read(spark, root))
        else None
      val lastApplied = existing.flatMap(
        _.where(col("key") === MetaKey).select("n_rows")
          .collect().headOption.map(_.getLong(0)))
      if (batchId.exists(id => lastApplied.exists(id <= _))) (existing.get, None)
      else {
        val f = fresh()
        val data = existing match {
          case None => f
          case Some(cur) => merge(cur.where(!(col("key") <=> lit(MetaKey))), f)
        }
        val sess = f.sparkSession
        import sess.implicits._
        val meta = batchId
          .map(id => Seq((MetaKey, id)).toDF("key", "n_rows")
            .select(col("key"), lit(null).cast("binary").as("sketch"),
              col("n_rows")))
          .orElse(existing.map(_.where(col("key") === MetaKey)))
        (meta.fold(data)(m => data.unionByName(m)), None)
      }
    })
}
