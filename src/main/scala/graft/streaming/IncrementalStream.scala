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

  /** A composable stream-stream enrichment stage for [[start]] (the
    * left-outer twin of the curation hook): a second streaming source is
    * time-bounded-joined onto the record stream BEFORE dedup/merge via
    * [[joinWithinWatermark]], so the merged target carries the
    * enrichment columns. `left_outer` (the default) lets an unenriched
    * record through with NULL enrichment once the watermark proves no
    * match can still arrive — records are delayed, never lost.
    *
    * @param sourceDir streaming parquet dir of the enrichment side
    * @param schema    its schema (streaming reads need one up front)
    * @param keyCols   equi-join keys, present on both sides
    *                  (the record stream exposes `main_refco`)
    * @param rightTs   the enrichment side's event-time column
    * @param lateness  watermark delay on both sides
    * @param within    max |record.ts − enrichment.ts| that still joins —
    *                  the time bound that makes the join state finite */
  final case class EnrichSpec(
      sourceDir: String,
      schema: org.apache.spark.sql.types.StructType,
      keyCols: Seq[String],
      rightTs: String,
      lateness: String = "10 minutes",
      within: String = "1 hour",
      joinType: String = "left_outer")

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
    * @param enrich optional stream-stream enrichment stage ([[EnrichSpec]]):
    *   runs INSIDE the streaming plan (checkpointed join state, so a
    *   buffered record joins an enrichment row arriving in a later run),
    *   upstream of the per-batch dedup + merge.
    * @param cardinalityProfilePath when set, each micro-batch folds its
    *   merged keys into a persisted HLL profile ([[graft.operators
    *   .Cardinality]]) of distinct `main_refco` per `embeddings_type` —
    *   "how many distinct entities has this stream ever merged", O(batch)
    *   per batch. HLL union is idempotent, so an at-least-once replayed
    *   batch leaves the profile unchanged — the same posture as the merge.
    * @param quantileProfilePath when set, each micro-batch folds
    *   `length(cleaned_ref)` per `embeddings_type` into a persisted KLL
    *   quantile profile ([[graft.operators.Quantiles]]) — field-size
    *   drift per type without rescanning history. KLL merge is NOT
    *   idempotent, so the profile records the last merged micro-batch id
    *   atomically with the sketches and a replayed batch is a no-op.
    * @param freqProfilePath when set, each micro-batch folds
    *   `display_name` per `embeddings_type` into a persisted
    *   frequent-items profile ([[graft.operators.Frequencies]]) — which
    *   entities dominate each type's stream, without rescanning history.
    *   Misra–Gries merge is NOT idempotent, so the same last-batch-id
    *   replay guard as the quantile profile applies.
    * @param cmProfilePath when set, each micro-batch folds
    *   `display_name` per `embeddings_type` into a persisted Count-Min
    *   point-frequency profile ([[graft.operators.CountMin]]) — "how
    *   often has THIS entity been seen" probes for arbitrary items,
    *   including ones below the heavy-hitter threshold the freq profile
    *   enumerates. Counter addition is NOT idempotent, so the same
    *   last-batch-id replay guard as the quantile/freq profiles applies.
    * @param dailyCountsPath when set, each micro-batch folds its RAW
    *   per-(embeddings_type, epoch-day) row counts into a persisted
    *   [[graft.operators.DailyCounts]] profile — the minimal sufficient
    *   statistic for the daily-series monitors (Fano burstiness,
    *   autocorrelation, CUSUM changepoint), maintained without ever
    *   rescanning event history. Pre-dedup on purpose: ingest-volume
    *   monitors watch what ARRIVES, not what survives. Count addition is
    *   NOT replay-idempotent, so the profile carries the last-batch-id
    *   replay guard.
    * @param componentsPath when set (with the INDEXED near-dup filter),
    *   each micro-batch folds its ids and verified near-dup pairs into
    *   the persisted duplicate-component mapping
    *   ([[graft.operators.Graph.updateComponents]]) — duplicate LINEAGE:
    *   which earlier key a dropped row duplicated stays answerable after
    *   the row is gone. Set-minima folding is replay-idempotent.
    */
  def start(spark: SparkSession, sourceDir: String, targetPath: String,
      checkpointDir: String, nearDupTextCol: Option[String] = None,
      nearDupThreshold: Double = 0.8, nearDupShingle: Int = 3,
      nearDupIndexPath: Option[String] = None,
      curate: Option[DataFrame => DataFrame] = None,
      ivfIndexPath: Option[String] = None,
      ivfNlist: Int = 16,
      hnswIndexPath: Option[String] = None,
      vectorDim: Int = graft.schema.Schemas.EmbeddingDim,
      enrich: Option[EnrichSpec] = None,
      cardinalityProfilePath: Option[String] = None,
      quantileProfilePath: Option[String] = None,
      freqProfilePath: Option[String] = None,
      cmProfilePath: Option[String] = None,
      dailyCountsPath: Option[String] = None,
      componentsPath: Option[String] = None,
      scd2Path: Option[String] = None,
      textIndexPath: Option[String] = None,
      textIndexCol: String = "display_name",
      textIndexShards: Int = 16,
      mergeBuckets: Option[Int] = None,
      keepSnapshots: Int = 1,
      maxFilesPerTrigger: Option[Int] = None): StreamingQuery = {
    // mergeBuckets = Some(n): merge each micro-batch into the
    // manifest-bucketed layout instead of the plain snapshot dir — the
    // 100 TB posture (a plain-layout merge rewrites the whole table per
    // micro-batch; the manifest merge rewrites only touched buckets) and
    // the layout the batch-side maintenance verbs (table-compact,
    // erasure, CDC reads) operate on, so a stream and those jobs can
    // share one target. maxFilesPerTrigger throttles micro-batch size
    // (AvailableNow still drains everything, in more, smaller batches).
    val reader = spark.readStream
      .schema(graft.schema.Schemas.sourceDoc)
    maxFilesPerTrigger.foreach(m => reader.option("maxFilesPerTrigger", m))
    val docs = reader.parquet(sourceDir)

    // the enrichment join needs a true event-time column on the left:
    // carry the source `timestamp` through the projection, drop it after
    val base = Extract.deriveRecord(Extract.nonEmptyEmbeddings(docs),
      keep = if (enrich.isDefined) Seq("timestamp") else Nil)
    val records = enrich match {
      case None => base
      case Some(e) =>
        val right = spark.readStream.schema(e.schema).parquet(e.sourceDir)
        val joined = joinWithinWatermark(base, right, e.keyCols,
          leftTs = "timestamp", rightTs = e.rightTs,
          lateness = e.lateness, within = e.within, joinType = e.joinType)
        // left record columns + the enrichment payload (keys/ts already
        // represented on the left); drop the carried event-time column
        val payload = e.schema.fieldNames
          .filterNot(c => e.keyCols.contains(c) || c == e.rightTs)
        joined.select(
          base.columns.toIndexedSeq.filterNot(_ == "timestamp")
            .map(c => col(s"l.$c")) ++ payload.map(c => col(s"r.$c")): _*)
    }

    records.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val s = batch.sparkSession
        val within = Dedup.latestPerKey(batch, Seq("main_refco"),
          Seq(col("original_timestamp").desc))
        val deduped = (nearDupTextCol, nearDupIndexPath) match {
          case (Some(tc), Some(idx)) =>
            dropNearDupsIndexed(s, within, idx, tc,
              nearDupThreshold, nearDupShingle,
              componentsPath = componentsPath)
          case (Some(tc), None) =>
            val tgt = Upsert.currentSnapshot(s, targetPath)
              .map(_ => Upsert.readTarget(s, targetPath))
            dropNearDups(within, tgt, tc, nearDupThreshold, nearDupShingle)
          case _ => within
        }
        // Streaming twin of Pipeline.Config.curate: compose library
        // curation (quality gates, redaction, caps) over each micro-batch
        // AFTER dedup, BEFORE merge — same contract as the batch hook.
        val curated = curate.fold(deduped)(f => f(deduped))
        val insertOnly = Set("cleaned_ref")
        mergeBuckets match {
          case Some(n) =>
            Upsert.mergeIntoManifestBucketedParquet(s, targetPath, curated,
              keys = Seq("main_refco"), nBuckets = n,
              insertOnlyCols = insertOnly,
              refreshExprs = Map("embedding_inserted_at" -> current_timestamp()),
              keepSnapshots = keepSnapshots)
          case None =>
            Upsert.mergeIntoParquet(s, targetPath, curated,
              keys = Seq("main_refco"),
              insertOnlyCols = insertOnly,
              refreshExprs = Map("embedding_inserted_at" -> current_timestamp()),
              keepSnapshots = keepSnapshots)
        }
        // Streaming twin of Pipeline.Config.ivfIndexPath: the first batch
        // trains and builds, later batches are assigned against the
        // FROZEN centroids and appended — probes stay available between
        // micro-batches and across restarts. addToIndex is idempotent on
        // replayed keys, matching the merge's at-least-once posture.
        cardinalityProfilePath.foreach { p =>
          graft.operators.Cardinality.update(s, p, curated,
            keyCol = "embeddings_type", valueCol = "main_refco")
        }
        quantileProfilePath.foreach { p =>
          graft.operators.Quantiles.update(s, p,
            curated.select(col("embeddings_type"),
              length(col("cleaned_ref")).cast("double").as("v")),
            keyCol = "embeddings_type", valueCol = "v",
            batchId = Some(batchId))
        }
        // SCD2 attribute-history dimension (display_name per key): folds
        // the RAW micro-batch — pre-dedup, since the history dim wants
        // every change, not just the batch's survivor — with the batch-id
        // replay guard (applyBatch is not replay-idempotent; Scd2.update).
        scd2Path.foreach { p =>
          // tie-break on the attribute itself: same-instant events apply
          // in attr order — a deterministic total order (equal (ts, attr)
          // duplicates collapse anyway), where ts-only ordering would let
          // a shuffle decide which same-instant value wins
          graft.operators.Scd2.update(s, p,
            batch.select(col("main_refco"), col("display_name"),
              col("original_timestamp")),
            keyCol = "main_refco", attrCol = "display_name",
            tsCol = "original_timestamp", orderCols = Seq("display_name"),
            batchId = Some(batchId))
        }
        freqProfilePath.foreach { p =>
          graft.operators.Frequencies.update(s, p,
            curated.select(col("embeddings_type"), col("display_name")),
            keyCol = "embeddings_type", itemCol = "display_name",
            batchId = Some(batchId))
        }
        cmProfilePath.foreach { p =>
          graft.operators.CountMin.update(s, p,
            curated.select(col("embeddings_type"), col("display_name")),
            keyCol = "embeddings_type", itemCol = "display_name",
            batchId = Some(batchId))
        }
        // daily ingest-volume profile folds the RAW batch (pre-dedup:
        // volume monitors watch arrivals, not survivors)
        dailyCountsPath.foreach { p =>
          graft.operators.DailyCounts.update(s, p,
            batch.select(col("embeddings_type"), col("original_timestamp")),
            keyCol = "embeddings_type", tsCol = "original_timestamp",
            batchId = Some(batchId))
        }
        ivfIndexPath.foreach { idx =>
          val vecs = curated.select(col("main_refco"), col("embedding_vector"))
          if (graft.operators.IndexStore.exists(s, s"$idx/centroids"))
            graft.operators.Ivf.addToIndex(s, idx, vecs,
              idCol = "main_refco", vecCol = "embedding_vector")
          else
            graft.operators.Ivf.buildIndex(s, idx, vecs, trainOn = vecs,
              nlist = ivfNlist, iters = 1,
              idCol = "main_refco", vecCol = "embedding_vector")
        }
        // Graph-family twin of ivfIndexPath: first batch builds the
        // layered graph, later batches fold in rebuild-equivalently;
        // addToIndex's left-anti replay guard matches the merge's
        // at-least-once posture.
        hnswIndexPath.foreach { idx =>
          val vecs = curated.select(col("main_refco"), col("embedding_vector"))
          if (graft.operators.IndexStore.exists(s, s"$idx/meta"))
            graft.operators.Hnsw.addToIndex(s, idx, vecs,
              idCol = "main_refco", vecCol = "embedding_vector")
          else
            // `vectorDim` (not the schema constant): SrpBucket silently
            // truncates to min(vector length, dim), so a stream carrying a
            // non-default vector width would get mis-sized hyperplanes
            // rather than an error if the dim were hardcoded (ADVICE r13).
            graft.operators.Hnsw.buildIndex(s, idx, vecs,
              idCol = "main_refco", vecCol = "embedding_vector",
              dim = vectorDim)
        }
        // Persisted BM25 index maintained by the stream, indexing what
        // the TABLE serves. For an insert-only column the merge keeps
        // the FIRST observed value, so an existing key's served text
        // never changes: index only keys not yet present (anti-join
        // against the slim doclen — no delete pass touching the
        // corpus-sized tables), and a replayed batch is a natural
        // no-op. For a refreshed column the served text follows the
        // batch: delete old postings for the keys already indexed
        // (semi-joined against doclen, so a pure-insert batch pays no
        // delete) then add — replay-idempotent and update-correct.
        // Freshness keys on doclen, which commits AFTER postings in an
        // add: a crash exactly between the two appends leaves that
        // batch's keys "fresh", and the replay re-appends their
        // postings — run TextIndex.deleteFromIndex for the batch keys
        // (or rebuild) to heal a torn add, per addToIndex's documented
        // repair contract.
        textIndexPath.foreach { idx =>
          val docsB = curated.select(col("main_refco").as("doc_id"),
            col(textIndexCol).cast("string").as("text"))
          def indexedIds = graft.operators.IndexStore
            .read(s, s"$idx/doclen").select("doc_id")
          if (!graft.operators.TextIndex.isComplete(s, idx)) {
            // Bootstrap from the MERGED TARGET, not the first batch: if
            // the index flag is enabled on a target that already holds
            // rows from earlier runs, a batch-only build would silently
            // serve an incomplete corpus (pre-existing keys would never
            // backfill — the insert-only branch anti-joins doclen). The
            // merge above already folded this batch in, so the target IS
            // batch ∪ history; on a genuinely fresh target it equals the
            // batch and this is the same build.
            val served = Upsert.readTarget(s, targetPath)
              .select(col("main_refco").as("doc_id"),
                col(textIndexCol).cast("string").as("text"))
            graft.operators.TextIndex.buildIndex(s, idx, served,
              nShards = textIndexShards)
          } else if (insertOnly.contains(textIndexCol)) {
            val fresh = docsB.join(indexedIds, Seq("doc_id"), "left_anti")
            if (!fresh.isEmpty)
              graft.operators.TextIndex.addToIndex(s, idx, fresh)
          } else {
            val existing = docsB.select("doc_id")
              .join(indexedIds, Seq("doc_id"), "left_semi")
            if (!existing.isEmpty)
              graft.operators.TextIndex.deleteFromIndex(s, idx, existing)
            graft.operators.TextIndex.addToIndex(s, idx, docsB)
          }
        }
      }
      .start()
  }

  /** Index-backed near-dup filter — the 100 TB shape of [[dropNearDups]]:
    * instead of rescanning the accumulated target's TEXT every batch to
    * recompute signatures, the stream maintains a persisted MinHash index
    * (sigs + slim band rows, [[Dedup.minHashIndex]]) and each batch (a)
    * drops within-batch near-dups, (b) drops rows whose estimated
    * signature Jaccard against an indexed row (different key) clears the
    * threshold, then (c) appends only the SURVIVORS' index rows. Per-batch
    * cost scales with the batch and its band collisions, not the corpus.
    * Same-key matches are exempt (updates are the merge's job). A key
    * update leaves its old signature in the index; rebuild periodically
    * with [[rebuildNearDupIndex]] (maintenance job, like IVF compaction). */
  private[streaming] def dropNearDupsIndexed(spark: SparkSession,
      batch: DataFrame, indexPath: String, textCol: String,
      threshold: Double, n: Int, numHashes: Int = 128,
      bands: Int = 32, componentsPath: Option[String] = None): DataFrame = {
    // (a) within-batch: exact-verified LSH pairs, keep the smaller key.
    // The pair OUTPUT is persisted: both the anti-join and the optional
    // lineage fold consume it, and its lineage is the expensive
    // shingle+signature+verify chain that must run once per batch.
    val selfPairs = Dedup.minHashLshPairs(batch, "main_refco", textCol,
      n = n, numHashes = numHashes, bands = bands, threshold = threshold)
      .persist()
    val withinKept = batch.join(
      selfPairs.select(col("b_id").as("main_refco")).distinct(),
      Seq("main_refco"), "left_anti")

    val hasIndex = graft.operators.IndexStore.exists(spark, s"$indexPath/sigs")
    // ONE signature pass over the batch text per micro-batch: the sigs
    // are persisted, the band rows derive from the cached sigs, and the
    // survivors' index rows are semi-joins on the kept keys — without the
    // cache, the candidate join plus the two index writes would each
    // re-run the shingle+128-perm lineage.
    val (rawSigs, _) = Dedup.minHashIndex(withinKept,
      "main_refco", textCol, n = n, numHashes = numHashes, bands = bands)
    val batchSigs = rawSigs.persist()
    val batchBands = Dedup.bandRows(batchSigs, bands)
    try {
      val indexPairs = if (!hasIndex) None else
        // same-key pairs are already excluded inside the candidate join —
        // an update to an existing key passes through to the merge.
        // Persisted for the same two-consumer reason as selfPairs: the
        // index-candidate join + exact verify is the dominant cost and
        // the lineage fold must not re-execute it.
        Some(Dedup.minHashPairsAgainstIndex(batchSigs, batchBands,
          Dedup.readNearDupIndexTable(spark, indexPath, "sigs"),
          Dedup.readNearDupIndexTable(spark, indexPath, "bands"),
          numHashes, threshold).persist())
      val keptLazy = indexPairs.fold(withinKept) { ip =>
        withinKept.join(ip.select(col("batch_id").as("main_refco")).distinct(),
          Seq("main_refco"), "left_anti")
      }
      // Duplicate LINEAGE: fold this batch's ids and ALL its verified
      // pairs (within-batch + batch-vs-index) into the persisted
      // component mapping — "which earlier key did that dropped row
      // duplicate" stays answerable after the row itself is gone. The
      // fold is replay-idempotent (set-minima), matching the merge's
      // at-least-once posture; a crash between index append and this
      // commit re-folds on replay.
      componentsPath.foreach { root =>
        val selfEdges = selfPairs.select(col("a_id").as("a"), col("b_id").as("b"))
        val edges = indexPairs.fold(selfEdges)(ip => selfEdges.unionByName(
          ip.select(col("batch_id").as("a"), col("index_id").as("b"))))
        graft.operators.Graph.updateComponents(spark, root,
          batch.select(col("main_refco").as("id")), "id", edges, "a", "b")
      }
      // Materialize the survivors ONCE (eager checkpoint) before anything
      // reads them: the index-side candidate anti-join is the expensive
      // step, and without this the keptSigs write, the keptBands write
      // and the returned frame would each re-execute it.
      val kept = keptLazy.localCheckpoint()
      // both pair consumers (anti-joins, lineage fold) have materialized
      indexPairs.foreach(_.unpersist())
      // (c) index only the survivors: filter the already-computed rows
      val keptKeys = kept.select(col("main_refco").as("id"))
      val keptSigs = batchSigs.join(keptKeys, Seq("id"), "left_semi")
      val keptBands = batchBands.join(keptKeys, Seq("id"), "left_semi")
      // IndexStore append: new files extend the manifest atomically — a
      // crash between the two table writes leaves both readable (the
      // replayed micro-batch re-appends; minHashPairsAgainstIndex
      // tolerates the duplicate signature rows it may create).
      if (hasIndex) {
        graft.operators.IndexStore.append(spark, s"$indexPath/sigs", keptSigs)
        graft.operators.IndexStore.append(spark, s"$indexPath/bands", keptBands)
      } else {
        graft.operators.IndexStore.rewrite(spark, s"$indexPath/sigs", keptSigs)
        graft.operators.IndexStore.rewrite(spark, s"$indexPath/bands", keptBands)
      }
      kept
    } finally {
      batchSigs.unpersist()
      selfPairs.unpersist()
    }
  }

  /** Rebuild the near-dup index from the CURRENT target contents —
    * drops signatures of overwritten/old rows that accumulate as the
    * append-only index ages. */
  def rebuildNearDupIndex(spark: SparkSession, targetPath: String,
      indexPath: String, textCol: String, n: Int = 3,
      numHashes: Int = 128, bands: Int = 32): Unit = {
    val (sigs, bandRows) = Dedup.minHashIndex(
      Upsert.readTarget(spark, targetPath), "main_refco", textCol,
      n = n, numHashes = numHashes, bands = bands)
    // full-rebuild rewrites commit atomically; a reader mid-rebuild keeps
    // the previous snapshot
    graft.operators.IndexStore.rewrite(spark, s"$indexPath/sigs", sigs)
    graft.operators.IndexStore.rewrite(spark, s"$indexPath/bands", bandRows)
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

  /** Stream-stream equi-join bounded by event time: a left row joins
    * right rows with the same key whose timestamps lie within `within`
    * of its own (the canonical clicks-to-impressions enrichment). Both
    * sides carry watermarks AND the join condition bounds the time gap,
    * so the engine can size and EVICT the buffered join state — without
    * the time bound a stream-stream join must buffer one side forever.
    * State survives restarts via the checkpoint: a right row arriving in
    * a later micro-batch (or run) still joins a buffered left row until
    * the watermark passes it. */
  /** @param joinType `"inner"` or `"left_outer"` — outer emits an
    *   unmatched left row (right columns NULL) once the watermark passes
    *   the end of its match window, i.e. the engine has PROVEN no match
    *   can still arrive; until then the row stays buffered, so outer
    *   results are delayed by `lateness + within`, not dropped. */
  def joinWithinWatermark(left: DataFrame, right: DataFrame,
      keyCols: Seq[String], leftTs: String, rightTs: String,
      lateness: String, within: String,
      joinType: String = "inner"): DataFrame = {
    require(Set("inner", "left_outer").contains(joinType),
      s"unsupported joinType $joinType (inner | left_outer)")
    val l = left.withWatermark(leftTs, lateness).as("l")
    val r = right.withWatermark(rightTs, lateness).as("r")
    val keyCond = keyCols.map(k => col(s"l.$k") === col(s"r.$k")).reduce(_ && _)
    val timeCond =
      col(s"r.$rightTs") >= col(s"l.$leftTs") - expr(s"INTERVAL $within") &&
      col(s"r.$rightTs") <= col(s"l.$leftTs") + expr(s"INTERVAL $within")
    l.join(r, keyCond && timeCond, joinType)
  }

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
