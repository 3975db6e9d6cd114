package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (type 2) history from an append-only
  * attribute-change log — the warehouse-side MERGE pattern the reference's
  * Snowflake deployment pairs with its upsert (`embeddings-pipeline.py`
  * keeps only current rows via MERGE; SCD2 is the standard variant users
  * layer on the same staging flow when history must be queryable).
  *
  * Semantics: per key, ordered by event time, collapse consecutive equal
  * attribute values; each surviving change point becomes one dimension row
  * `(key, attr, valid_from, valid_to, is_current, version)` with
  * `valid_to` = the NEXT change's time (null while current) and `version`
  * counting change points from 1.
  *
  * Scale shape: ONE exchange on the key — both windows (change-point lag
  * and interval lead) share the `(key, order)` partitioning, so Catalyst
  * reuses the sort, and the second window's input is change points only.
  * Per-key skew behaves like sessionize's: a key owning a task-sized share
  * of the LOG serializes its sort (the time-chunk escape of
  * [[Sessionize.sessionsChunked]] applies in principle — collapse within
  * (key, chunk), then merge boundary runs); after collapse, downstream
  * cost is per-CHANGE, typically orders of magnitude below per-event.
  */
object Scd2 {

  /** Derive the full SCD2 dimension from a change log. `orderCols` break
    * event-time ties into a total order (determinism contract); `attrCol`
    * comparisons are null-safe (a null attribute is a value, distinct from
    * any non-null one). */
  def fromLog(df: DataFrame, keyCol: String, attrCol: String, tsCol: String,
      orderCols: Seq[String] = Nil): DataFrame = {
    val order = (col(tsCol) +: orderCols.map(col)).map(_.asc)
    val w = Window.partitionBy(keyCol).orderBy(order: _*)
    val changes = df
      .withColumn("__prev", lag(col(attrCol), 1).over(w))
      .withColumn("__rn", row_number().over(w))
      // first row of the key, or a null-safe attribute change
      .where(col("__rn") === 1 || !(col("__prev") <=> col(attrCol)))
    val w2 = Window.partitionBy(keyCol).orderBy(order: _*)
    changes
      .withColumn("valid_to", lead(col(tsCol), 1).over(w2))
      .withColumn("version", row_number().over(w2).cast("long"))
      .select(col(keyCol), col(attrCol), col(tsCol).as("valid_from"),
        col("valid_to"), col("valid_to").isNull.as("is_current"),
        col("version"))
  }

  /** Incrementally fold a new log batch into an existing SCD2 dimension.
    *
    * Contract (the pipeline's watermark guarantees it): every batch event
    * is strictly later than every already-folded event FOR ITS KEY.
    * Under it, closed history rows can never change — only each affected
    * key's OPEN row can close, and new rows append — so the fold touches
    * `O(affected keys + batch)` rows, never the history:
    * `applyBatch(fromLog(log <= t), log > t) == fromLog(log)` exactly
    * (property-tested in Scd2Spec across split points).
    *
    * Shape: dimension rows split by an equi-join against the DISTINCT
    * batch keys (broadcast-able — batches are small next to the dim);
    * affected keys replay open-row-as-synthetic-event + batch through
    * [[fromLog]] and shift versions by the open row's version − 1. */
  /** Skew-proof twin of [[fromLog]] — the `Sessionize.sessionsChunked`
    * treatment: the change-point collapse windows within
    * `(key, time chunk)` so a key owning a task-sized share of the LOG
    * parallelizes across its time range, then a second per-key pass over
    * CHANGE POINTS ONLY (≤ changes + chunks-per-key rows) removes the
    * boundary duplicates and assigns intervals/versions.
    *
    * Output is PROVABLY identical to [[fromLog]], versions included:
    * run-collapse is associative — collapsing within chunks preserves
    * each chunk's sequence of distinct-run first events, so after
    * concatenation consecutive duplicates can only sit at chunk
    * boundaries, and the second collapse removes exactly those — leaving
    * the global run-firsts verbatim (equality property-tested across
    * random logs with boundary-straddling runs in Scd2Spec).
    *
    * Trade: one extra exchange over the (small) change-point set — pay it
    * when a key can own a task-sized share of events, keep [[fromLog]]
    * for benign distributions. */
  def fromLogChunked(df: DataFrame, keyCol: String, attrCol: String,
      tsCol: String, orderCols: Seq[String] = Nil,
      chunkSeconds: Long = 7200L): DataFrame = {
    require(chunkSeconds > 0, "chunkSeconds must be positive")
    val order = (col(tsCol) +: orderCols.map(col)).map(_.asc)
    // integer chunk id (floor, matching Sessionize.sessionsChunked) — plain
    // Column./ is double division, which would give every distinct
    // epoch-microsecond its own fractional chunk and turn the per-chunk
    // collapse into a no-op
    val chunk = floor(unix_micros(col(tsCol)) / lit(chunkSeconds * 1000000L))
      .cast("long").as("__chunk")
    // order columns that ARE the key/attr/ts columns are already in the
    // projection — don't repeat (mirrors applyBatch's extraOrder)
    val extraOrder = orderCols.filterNot(
      c => c == keyCol || c == attrCol || c == tsCol)
    val wc = Window.partitionBy(col(keyCol), col("__chunk")).orderBy(order: _*)
    val perChunk = df.withColumn("__chunk", chunk)
      .withColumn("__prev", lag(col(attrCol), 1).over(wc))
      .withColumn("__rn", row_number().over(wc))
      .where(col("__rn") === 1 || !(col("__prev") <=> col(attrCol)))
      .select((col(keyCol) +: col(attrCol) +: col(tsCol) +: extraOrder.map(col)): _*)
    // boundary merge + intervals on change points only — both windows
    // share one (key, order) exchange, exactly fromLog's tail
    fromLog(perChunk, keyCol, attrCol, tsCol, orderCols)
  }

  /** Sentinel key of the replay-guard metadata row (ProfileStore's
    * convention; the batch id rides in `version`). */
  val MetaKey = "__meta:last_batch"

  /** Maintain a PERSISTED SCD2 dimension at `root`: fold one micro-batch
    * via [[applyBatch]] (first batch bootstraps via [[fromLog]]) inside an
    * [[IndexStore.rewriteWith]] commit — recompute-on-retry under
    * concurrent writers, crash leaves the previous dimension readable.
    *
    * [[applyBatch]] is NOT replay-idempotent (a replayed batch violates
    * the strictly-later contract against the dimension it already
    * produced), so streaming callers pass `batchId`: the last folded
    * micro-batch id rides in a sentinel row committed ATOMICALLY with the
    * dimension, and a batch id ≤ the recorded one is a no-op — checked
    * BEFORE the commit loop (a replay costs one metadata read, not a
    * store rewrite) and again inside it (a concurrent writer may commit
    * between the two reads) — exactly-once folding on at-least-once
    * delivery, the KLL-profile posture. The sentinel keys on [[MetaKey]],
    * so the guarded path requires a string `keyCol`.
    *
    * LATE-DATA POLICY: nothing upstream enforces applyBatch's strictly-
    * later contract (the file stream is unwatermarked), so the fold
    * enforces the standard warehouse rule here — "apply only if newer
    * than the open row": batch events at-or-before their key's OPEN
    * `valid_from` are DROPPED from the dimension fold (deterministically;
    * the merge/CDC path still carries them). This guarantees STRUCTURAL
    * integrity under arbitrary late arrivals — the replay input is
    * always open-row + strictly-later events, so intervals never overlap
    * and versions stay monotone (without it one late event silently
    * corrupts the history). Stragglers landing inside the open interval
    * but after its change point apply as changes at their own timestamp —
    * recovering their exact interleaving against already-folded
    * same-value events would need per-key last-event state a dimension
    * does not keep.
    *
    * I/O honesty: each fold COMMITS a full store rewrite (the dimension
    * is change points, orders of magnitude below the event log, so this
    * is the compact-store posture of the profile family — not O(batch);
    * a log whose dimension itself outgrows single-store rewrites wants
    * the manifest-bucketed layout underneath). */
  def update(spark: org.apache.spark.sql.SparkSession, root: String,
      batch: DataFrame, keyCol: String, attrCol: String, tsCol: String,
      orderCols: Seq[String] = Nil, batchId: Option[Long] = None): Unit = {
    require(batchId.isEmpty ||
      batch.schema(keyCol).dataType == org.apache.spark.sql.types.StringType,
      "replay-guarded SCD2 stores need a string key (sentinel row)")
    def lastApplied(df: DataFrame): Option[Long] =
      df.where(col(keyCol) === MetaKey).select("version")
        .collect().headOption.map(_.getLong(0))
    // cheap replay pre-check: one metadata-row read, no rewrite
    if (batchId.isDefined && IndexStore.exists(spark, root) &&
        lastApplied(IndexStore.read(spark, root)).exists(batchId.get <= _))
      return
    IndexStore.rewriteWith(spark, root)(() => {
      val existing =
        if (IndexStore.exists(spark, root)) Some(IndexStore.read(spark, root))
        else None
      val last = existing.flatMap(lastApplied)
      if (batchId.exists(id => last.exists(id <= _))) (existing.get, None)
      else {
        val data = existing match {
          case None => fromLog(batch, keyCol, attrCol, tsCol, orderCols)
          case Some(cur) =>
            val dim = cur.where(!(col(keyCol) <=> lit(MetaKey)))
            // late-data guard (see scaladoc): drop events at-or-before
            // the key's open valid_from. Semi-join open rows down to the
            // BATCH's keys first so the broadcast is bounded by batch
            // size, not dimension size.
            val openVf = dim.where(col("is_current"))
              .join(broadcast(batch.select(col(keyCol)).distinct()),
                Seq(keyCol), "left_semi")
              .select(col(keyCol), col("valid_from").as("__open_vf"))
            val onTime = batch.join(broadcast(openVf), Seq(keyCol), "left")
              .where(col("__open_vf").isNull || col(tsCol) > col("__open_vf"))
              .drop("__open_vf")
            applyBatch(dim, onTime, keyCol, attrCol, tsCol, orderCols)
        }
        val meta = batchId
          .map(id => spark.range(1).select(
            lit(MetaKey).as(keyCol),
            lit(null).cast(batch.schema(attrCol).dataType).as(attrCol),
            lit(null).cast(batch.schema(tsCol).dataType).as("valid_from"),
            lit(null).cast(batch.schema(tsCol).dataType).as("valid_to"),
            lit(null).cast("boolean").as("is_current"),
            lit(id).as("version")))
          .orElse(existing.map(_.where(col(keyCol) === MetaKey)))
        (meta.fold(data)(m => data.unionByName(m)), None)
      }
    })
  }

  def applyBatch(dim: DataFrame, batch: DataFrame, keyCol: String,
      attrCol: String, tsCol: String, orderCols: Seq[String] = Nil): DataFrame = {
    val keys = batch.select(col(keyCol)).distinct()
    val touched = dim.join(broadcast(keys), Seq(keyCol), "left_semi")
    val untouched = dim.join(broadcast(keys), Seq(keyCol), "left_anti")
    val closed = touched.where(!col("is_current"))
    val open = touched.where(col("is_current"))
    // the open row replays as a synthetic event at its own valid_from, so
    // the recomputed first interval starts where the stored one did; extra
    // order columns sort it FIRST among same-instant rows (nulls first).
    // Order columns that ARE the key/attr/ts columns (e.g. tie-breaking on
    // the attribute itself) are already in the projection — don't repeat.
    val extraOrder = orderCols.filterNot(
      c => c == keyCol || c == attrCol || c == tsCol)
    val openAsLog = open.select(
      (col(keyCol) +: col(attrCol) +: col("valid_from").as(tsCol) +:
        extraOrder.map(c => lit(null).cast(batch.schema(c).dataType).as(c))): _*)
    val batchLog = batch.select(
      (col(keyCol) +: col(attrCol) +: col(tsCol) +: extraOrder.map(col)): _*)
    val replayed = fromLog(openAsLog.unionByName(batchLog),
      keyCol, attrCol, tsCol, orderCols)
      .join(broadcast(open.select(col(keyCol), (col("version") - 1)
        .as("__base"))), Seq(keyCol), "left")
      .withColumn("version", col("version") + coalesce(col("__base"), lit(0L)))
      .drop("__base")
    untouched.unionByName(closed).unionByName(replayed)
  }
}
