package graft

import java.sql.Timestamp

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.F
import graft.operators.{Anomaly, Correlate, DailyCounts, Experiment, Hnsw, IndexStore, TextIndex, TimeSeries, Web, Bpe, Cardinality, Clustering, Cooccur, Decontaminate, Dedup, EditDistance, Embeddings, Extract, Frequencies, Funnel, Graph, Ivf, Joins, Multimodal, Pq, Quantiles, Sampling, Scd2, Sessionize, Similarity, Sketch, TextAnalysis, Upsert, Validate}
import graft.streaming.IncrementalStream
import graft.SparkEntry._

/** Reference-pipeline surface + relational core: scans, watermark
  * filters, the merge family, windows/sessionization/SCD2, streaming-shaped
  * windowed counts.
  *
  * One registry tier of [[SparkEntry]]'s driver contract (split from the
  * single 7k-line object in round 14): `queries` and `oracles` compose into
  * [[SparkEntry.queries]] / [[SparkEntry.oracleSql]] unchanged — entry text
  * is byte-identical to the pre-split map literals. Shared helpers (ts6,
  * shared builds, oracle CTE builders) stay on [[SparkEntry]] and arrive via
  * the wildcard import. */
private[graft] object TierCore extends Registry {

  /** merge_upsert's two batches (target, updates) — shared by the merge,
    * catalog, and CDC-stream twins so one oracle SQL covers them all. */
  private def upsertBatches(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val docs = Tables.documents(s, dir)
    val target = docs.where(col("doc_id") % 3 === 0).select(
      col("doc_id"), col("source").as("cleaned_ref"),
      col("lang").as("category"), col("n_chars").as("val"))
    val updates = docs.where(col("doc_id") % 2 === 0).select(
      col("doc_id"), concat(lit("u_"), col("source")).as("cleaned_ref"),
      when(col("doc_id") % 5 =!= 0, concat(lit("u_"), col("lang"))).as("category"),
      (col("n_chars") + 1).as("val"))
    (target, updates)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // S1/F: filtered+projected scan with parquet pushdown.
    "pushdown_scan" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .where(col("l_returnflag") === "R" &&
          col("l_shipdate") >= to_timestamp(lit("1996-01-01 00:00:00")) &&
          col("l_shipdate") < to_timestamp(lit("1997-01-01 00:00:00")))
        .select("l_orderkey", "l_linenumber", "l_quantity")),

    // S2/A1: distinct-key scan.
    "distinct_scan" -> ((s, dir) => Tables.documents(s, dir).select("source").distinct()),

    // A2/A3-family: the classic pricing-summary aggregate, decimal-exact.
    "q1_agg" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
        .where(col("l_shipdate") <= to_timestamp(lit("1998-09-01 00:00:00")))
      val ep = col("l_extendedprice").cast("decimal(18,2)")
      val disc = col("l_discount").cast("decimal(12,2)")
      li.groupBy("l_returnflag", "l_linestatus").agg(
        sum(col("l_quantity").cast("decimal(12,2)")).cast("double").as("sum_qty"),
        sum(ep).cast("double").as("sum_base_price"),
        sum(ep * (lit(1).cast("decimal(12,2)") - disc)).cast("double").as("sum_disc_price"),
        count(lit(1)).as("count_order"))
    }),

    // J1-family: star-schema join, broadcast dims, exact decimal revenue.
    "star_join" -> ((s, dir) => {
      val cust = Tables.customer(s, dir).where(col("c_mktsegment") === "BUILDING")
      val ord = Tables.orders(s, dir)
        .where(col("o_orderdate") < to_timestamp(lit("1997-01-01 00:00:00")))
      val li = Tables.lineitem(s, dir)
        .where(col("l_shipdate") >= to_timestamp(lit("1997-01-01 00:00:00")))
      val rev = col("l_extendedprice").cast("decimal(18,2)") *
        (lit(1).cast("decimal(12,2)") - col("l_discount").cast("decimal(12,2)"))
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .groupBy("l_orderkey").agg(sum(rev).as("rev"))
        .orderBy(col("rev").desc, col("l_orderkey"))
        .limit(10)
        .select(col("l_orderkey"), col("rev").cast("double").as("revenue"))
    }),

    // F3/F4: per-source incremental watermark filter (strict > vs >=).
    "incremental_filter" -> ((s, dir) => {
      import s.implicits._
      val wm = Seq(
        ("click", Timestamp.valueOf("2024-01-20 00:00:00")),
        ("view", Timestamp.valueOf("2024-01-10 00:00:00"))).toDF("event_type", "wm")
      Extract.incrementalFilter(Tables.events(s, dir), wm,
          Timestamp.valueOf("2024-01-15 00:00:00"), tsCol = "ts", srcCol = "event_type")
        .select(col("event_id"), col("event_type"), ts6(col("ts")).as("ts_str"))
    }),

    // F2: non-null non-empty embeddings.
    "non_empty_embeddings" -> ((s, dir) =>
      Extract.nonEmptyEmbeddings(Tables.embeddings(s, dir), "embedding")
        .select(col("vec_id"), col("label"), size(col("embedding")).as("dim"))),

    // W1: keep-latest per key.
    "latest_per_key" -> ((s, dir) =>
      Dedup.latestPerKey(Tables.events(s, dir), Seq("user_id"),
          Seq(col("ts").desc, col("event_id").desc))
        .select(col("user_id"), col("event_id"), col("event_type"), ts6(col("ts")).as("ts_str"))),

    // §2.7: generalized top-k per key.
    "topk_per_key" -> ((s, dir) =>
      Dedup.topKPerKey(Tables.events(s, dir), 3, Seq("user_id"),
          Seq(col("value").desc, col("event_id")))
        .select("user_id", "event_id", "value")),

    // A2/A4: per-source max watermark.
    "max_watermark" -> ((s, dir) =>
      Tables.events(s, dir).groupBy("event_type")
        .agg(max(col("ts")).as("wm"))
        .select(col("event_type"), ts6(col("wm")).as("wm_str"))),

    // P2–P4: normalized, truncated merge key (custom ascii_fold expression).
    "main_refco" -> ((s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"),
          Extract.mainRefco(col("text"), col("lang")).as("main_refco"))),

    // P1–P8 + F7 composite: the full per-document transform (deriveRecord)
    // over a document-shaped source derived deterministically from the
    // documents table — exercises field defaults, the empty-color branch of
    // main_refco, the "(None)" display name, nullable embeddings_type,
    // for_matching default, ISO timestamps with and without micros, and the
    // null-timestamp row drop.
    "derive_record" -> ((s, dir) => {
      val src = Tables.documents(s, dir).select(
        col("doc_id"),
        col("source"),
        when(col("doc_id") % 97 =!= 0,
          timestamp_micros(lit(1704067200000000L) +
            col("doc_id") * 1000000L + (col("doc_id") % 2) * 123456L))
          .as("timestamp"),
        when(col("doc_id") % 13 =!= 0,
          array(col("doc_id").cast("float"), col("n_chars").cast("float")))
          .as("embeddings"),
        col("source").as("cleaned_ref"),
        when(col("lang") =!= "en", col("lang")).otherwise(lit("")).as("color"),
        when(col("doc_id") % 7 =!= 0, col("lang")).as("category"),
        when(col("lang") =!= "en", array(col("lang"))).as("country"),
        when(col("doc_id") % 5 =!= 0, lit("dense")).as("embeddings_type"),
        when(col("doc_id") % 3 === 0, lit(true)).as("for_matching"))
      Extract.deriveRecord(Extract.nonEmptyEmbeddings(src))
        .withColumn("emb_dim", size(col("embedding_vector")))
        .drop("embedding_vector")
    }),

    // P5 incl. scalar coercion: a scalar-string country column normalized
    // at ingest (coerceCountry), then first-element extraction.
    "country_code" -> ((s, dir) => {
      val scalar = Tables.documents(s, dir).select(
        col("doc_id"),
        when(col("doc_id") % 11 === 0, lit(null).cast("string"))
          .when(col("lang") === "en", lit(""))
          .otherwise(col("lang")).as("country"))
      Extract.coerceCountry(scalar)
        .select(col("doc_id"),
          Extract.countryCode(col("country")).as("country_code"))
    }),

    // P10: per-row error isolation — malformed rows land in the quarantine
    // side output with their failed checks (incl. the VECTOR(FLOAT, dim)
    // width gate), the batch continues.
    "quarantine" -> ((s, dir) => {
      val src = Tables.embeddings(s, dir).select(
        col("vec_id"),
        when(col("vec_id") % 10 === 1, array().cast("array<float>"))
          .when(col("vec_id") % 13 === 2, slice(col("embedding"), 1, 32))
          .when(col("vec_id") % 10 =!= 0, col("embedding")).as("embeddings"),
        when(col("vec_id") % 7 =!= 0,
          timestamp_micros(lit(1704067200000000L) + col("vec_id") * 1000000L))
          .as("timestamp"))
      val (_, bad) = Extract.quarantine(src, dim = 64, enforceDim = true)
      bad.select(col("vec_id"), array_join(col("__errors"), ",").as("errors"))
    }),

    // P6: display name incl. the "(None)" quirk.
    "display_name" -> ((s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"),
          Extract.displayName(col("source"), docCountry).as("display_name"))),

    // P7: Python-isoformat timestamp strings (no fraction when micros==0).
    "iso_timestamp" -> ((s, dir) =>
      Tables.events(s, dir)
        .select(col("event_id"), Extract.isoTimestamp(col("ts")).as("iso_ts"))),

    // Flagship: cast projection → window dedup → broadcast dim join
    // (reference merge-source, `embeddings-pipeline.py:297-326`).
    "merge_source" -> ((s, dir) => {
      val rec = docRecord(Tables.documents(s, dir))
      val deduped = Dedup.latestPerKey(rec, Seq("main_refco"), Seq(col("doc_id").desc))
      // Sort-free surrogate id: a deterministic polynomial hash of the name
      // (engine-portable, oracle recomputes it in SQL). A global
      // `row_number().over(Window.orderBy(...))` would serialize the dim
      // build onto one partition — fine for a bounded dim, a scale wart in
      // the flagship plan (and it logged WindowExec single-partition
      // warnings). Hashing keeps the dim build embarrassingly parallel.
      val dim = rec.select("display_name").distinct()
        .where(!col("display_name").endsWith("(None)"))
        .withColumn("display_name_id",
          F.polyFingerprint(array(col("display_name"))))
      deduped.join(broadcast(dim), Seq("display_name"), "inner")
        .select("main_refco", "display_name", "display_name_id", "doc_id", "n_chars")
    }),

    // J3: MERGE semantics — NULL-carrying updates overwrite, cleaned_ref is
    // insert-only, target-only rows pass through untouched.
    "merge_upsert" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val target = docs.where(col("doc_id") % 3 === 0).select(
        col("doc_id"), col("source").as("cleaned_ref"),
        col("lang").as("category"), col("n_chars").as("val"))
      val updates = docs.where(col("doc_id") % 2 === 0).select(
        col("doc_id"), concat(lit("u_"), col("source")).as("cleaned_ref"),
        when(col("doc_id") % 5 =!= 0, concat(lit("u_"), col("lang"))).as("category"),
        (col("n_chars") + 1).as("val"))
      Upsert.merge(target, updates, Seq("doc_id"), insertOnlyCols = Set("cleaned_ref"))
    }),

    // DSv2 connector round-trip (VERDICT r15 #1): the merge_upsert batch
    // MERGEd into an on-disk manifest-bucketed table, read back through
    // plain `spark.read.format("graft")` — same oracle as merge_upsert,
    // so the hash gate proves the connector serves exactly the committed
    // MERGE state a plain-SQL consumer would see. The table build is
    // cached on the testdata fingerprint (the ann-index posture); the
    // graded plan is the connector scan itself. File-stats pruning and
    // snapshot time travel are pinned in GraftSourceSpec.
    "dsv2_read" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val target = docs.where(col("doc_id") % 3 === 0).select(
        col("doc_id"), col("source").as("cleaned_ref"),
        col("lang").as("category"), col("n_chars").as("val"))
      val updates = docs.where(col("doc_id") % 2 === 0).select(
        col("doc_id"), concat(lit("u_"), col("source")).as("cleaned_ref"),
        when(col("doc_id") % 5 =!= 0, concat(lit("u_"), col("lang"))).as("category"),
        (col("n_chars") + 1).as("val"))
      val src = new java.io.File(s"$dir/documents.parquet")
      // params bumped r17: the r16-built cache predates the manifest's
      // bucket_keys recording, so it could never engage the bucket-aware
      // scan — rebuild once under the current format
      val tbl = Ivf.cachedIndexDir(src, root = "/tmp/graft-dsv2",
        params = "merge_upsert:nBuckets=8:v2")
      if (Upsert.manifestBody(s, tbl, None).isEmpty) {
        Ivf.gcSupersededIndexes(tbl)
        Upsert.mergeIntoManifestBucketedParquet(s, tbl,
          Upsert.merge(target, updates, Seq("doc_id"),
            insertOnlyCols = Set("cleaned_ref")),
          Seq("doc_id"), nBuckets = 8, statsCols = Seq("doc_id"))
      }
      s.read.format("graft").load(tbl)
        .select("doc_id", "cleaned_ref", "category", "val")
    }),

    // r17 (VERDICT r16 #6): the same committed MERGE served through the
    // SQL CATALOG face — `SELECT … FROM graftcat17.<table>` with zero
    // `.load()` anywhere. The ident resolves by zero-DDL adoption under
    // the catalog warehouse (the cache root), so the graded statement is
    // exactly what a SQL-only consumer types. Same oracle as
    // merge_upsert: the hash gate proves catalog resolution serves the
    // identical committed state.
    "dsv2_catalog_sql" -> ((s, dir) => {
      val (target, updates) = upsertBatches(s, dir)
      val root = "/tmp/graft-cat17"
      val src = new java.io.File(s"$dir/documents.parquet")
      val tbl = Ivf.cachedIndexDir(src, root = root,
        params = "merge_upsert:nBuckets=8:catalog")
      if (Upsert.manifestBody(s, tbl, None).isEmpty) {
        Ivf.gcSupersededIndexes(tbl)
        Upsert.mergeIntoManifestBucketedParquet(s, tbl,
          Upsert.merge(target, updates, Seq("doc_id"),
            insertOnlyCols = Set("cleaned_ref")),
          Seq("doc_id"), nBuckets = 8, statsCols = Seq("doc_id"))
      }
      s.conf.set("spark.sql.catalog.graftcat17", "graft.sources.GraftCatalog")
      s.conf.set("spark.sql.catalog.graftcat17.warehouse", root)
      s.sql("SELECT doc_id, cleaned_ref, category, val " +
        s"FROM graftcat17.`${new java.io.File(tbl).getName}`")
    }),

    // r17 (VERDICT r16 #1): STORAGE-PARTITIONED JOIN — two graft tables
    // co-bucketed on doc_id joined through the catalog with the shuffle
    // ELIDED on both sides (each scan reports KeyGroupedPartitioning
    // over bucket(8, doc_id); the catalog's bucket function is the
    // compatibility identity). The MERGE hint forces the sort-merge
    // family so a broadcast can never mask the property; PlanSpec pins
    // zero Exchange below the join. At 100 TB this is the difference
    // between a metadata decision and re-shuffling two tables.
    "spj_join" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val src = new java.io.File(s"$dir/documents.parquet")
      // ONE fingerprint-keyed base holds both sides (sibling cache dirs
      // share the src prefix, so per-side dirs would GC each other); the
      // base doubles as the catalog warehouse → idents are just `l`/`r`
      val base = Ivf.cachedIndexDir(src, root = "/tmp/graft-spj17",
        params = "spj:nBuckets=8:v1")
      if (Upsert.manifestBody(s, s"$base/l", None).isEmpty ||
          Upsert.manifestBody(s, s"$base/r", None).isEmpty) {
        Ivf.gcSupersededIndexes(base)
        Upsert.mergeIntoManifestBucketedParquet(s, s"$base/l",
          docs.where(col("doc_id") % 3 === 0)
            .select(col("doc_id"), col("n_chars").as("lchars")),
          Seq("doc_id"), nBuckets = 8)
        Upsert.mergeIntoManifestBucketedParquet(s, s"$base/r",
          docs.where(col("doc_id") % 2 === 0)
            .select(col("doc_id"), col("source").as("rsource")),
          Seq("doc_id"), nBuckets = 8)
      }
      s.conf.set("spark.sql.catalog.graftspj17", "graft.sources.GraftCatalog")
      s.conf.set("spark.sql.catalog.graftspj17.warehouse", base)
      s.sql("""SELECT /*+ MERGE(a) */ a.doc_id, a.lchars, b.rsource
              |FROM graftspj17.l a JOIN graftspj17.r b
              |  ON a.doc_id = b.doc_id""".stripMargin)
    }),

    // r17 (VERDICT r16 #3): the CDC STREAM end to end — build the merge
    // target in two commits (target batch, then the upsert batch), drain
    // `readStream.format("graft").option("cdc","true")` after EACH with
    // one shared checkpoint (bootstrap feed, then the incremental net
    // diff), and fold every micro-batch into a parquet mirror with
    // applyChanges. The returned frame is the mirror; hash-matching
    // merge_upsert's oracle proves bootstrap + incremental diff + fold
    // reproduce MERGE semantics exactly — the streaming twin of
    // CdcSpec's polling contract, under the driver's gate.
    "cdc_stream_fold" -> ((s, dir) => {
      val (target, updates) = upsertBatches(s, dir)
      val root = "/tmp/graft-cdcs17"
      val src = new java.io.File(s"$dir/documents.parquet")
      val base = Ivf.cachedIndexDir(src, root = root, params = "cdc_stream:v1")
      val tbl = s"$base/table"
      val mirror = s"$base/mirror"
      val done = new java.io.File(s"$base/_fold_done")
      if (!done.exists()) {
        Ivf.gcSupersededIndexes(base)
        val fs = new org.apache.hadoop.fs.Path(base)
          .getFileSystem(s.sparkContext.hadoopConfiguration)
        def drain(): Unit = {
          val q = s.readStream.format("graft")
            .option("cdc", "true").option("keys", "doc_id").load(tbl)
            .writeStream
            .foreachBatch {
              (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
                  _: Long) =>
                val next = new org.apache.hadoop.fs.Path(s"$mirror.next")
                val cur = new org.apache.hadoop.fs.Path(mirror)
                val folded =
                  if (!fs.exists(cur)) batch.drop("change_type")
                  else Upsert.applyChanges(
                    s.read.parquet(mirror), batch, Seq("doc_id"))
                folded.write.mode("overwrite").parquet(next.toString)
                fs.delete(cur, true)
                fs.rename(next, cur)
                ()
            }
            .option("checkpointLocation", s"$base/ckpt")
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .start()
          q.awaitTermination()
        }
        Upsert.mergeIntoManifestBucketedParquet(s, tbl, target,
          Seq("doc_id"), nBuckets = 8, keepSnapshots = 4)
        drain() // bootstrap: full snapshot as inserts
        Upsert.mergeIntoManifestBucketedParquet(s, tbl, updates,
          Seq("doc_id"), nBuckets = 8, keepSnapshots = 4,
          insertOnlyCols = Set("cleaned_ref"))
        drain() // incremental: the net diff of the second merge
        done.createNewFile()
      }
      s.read.parquet(mirror).select("doc_id", "cleaned_ref", "category", "val")
    }),

    // r18 (VERDICT r17 #1): SQL predicate DELETE through the catalog —
    // compliance erasure as `DELETE FROM cat.t WHERE doc_id IN (…)`,
    // exactly what the reference's users run against Snowflake. Routes
    // to the bucket-pruned manifest erasure (untouched buckets' files
    // carried verbatim — GraftSqlWriteSpec pins that); the oracle is the
    // anti-selection on the source table.
    "sql_delete" -> ((s, dir) => {
      val src = new java.io.File(s"$dir/documents.parquet")
      val base = Ivf.cachedIndexDir(src, root = "/tmp/graft-sqld18",
        params = "sql_delete:nBuckets=8:v1")
      val done = new java.io.File(s"$base/_delete_done")
      s.conf.set("spark.sql.catalog.graftsqld18", "graft.sources.GraftCatalog")
      s.conf.set("spark.sql.catalog.graftsqld18.warehouse", base)
      if (!done.exists()) {
        Ivf.gcSupersededIndexes(base)
        Upsert.mergeIntoManifestBucketedParquet(s, s"$base/table",
          Tables.documents(s, dir)
            .select("doc_id", "source", "lang", "n_chars"),
          Seq("doc_id"), nBuckets = 8, keepSnapshots = 4)
        s.sql("DELETE FROM graftsqld18.table " +
          "WHERE doc_id IN (3, 42, 97, 123, 555)")
        done.createNewFile()
      }
      s.sql("SELECT doc_id, source, lang, n_chars FROM graftsqld18.table")
    }),

    // r18 (VERDICT r17 #3): SQL INSERT INTO as append-as-upsert on the
    // table's recorded merge keys — the reference's MERGE semantics
    // reached from a pure-SQL session (`embeddings-pipeline.py:294-352`
    // is a SQL statement its users run). Matched keys take the incoming
    // row (update-wins), new keys insert; the oracle is the full-outer
    // merge of the two batches.
    "sql_insert" -> ((s, dir) => {
      val src = new java.io.File(s"$dir/documents.parquet")
      val base = Ivf.cachedIndexDir(src, root = "/tmp/graft-sqli18",
        params = "sql_insert:nBuckets=8:v1")
      val done = new java.io.File(s"$base/_insert_done")
      s.conf.set("spark.sql.catalog.graftsqli18", "graft.sources.GraftCatalog")
      s.conf.set("spark.sql.catalog.graftsqli18.warehouse", base)
      if (!done.exists()) {
        Ivf.gcSupersededIndexes(base)
        val docs = Tables.documents(s, dir)
        Upsert.mergeIntoManifestBucketedParquet(s, s"$base/table",
          docs.where(col("doc_id") % 3 === 0).select(
            col("doc_id"), col("source").as("ref"),
            col("lang").as("category"), col("n_chars").as("val")),
          Seq("doc_id"), nBuckets = 8, keepSnapshots = 4)
        s.sql(s"""INSERT INTO graftsqli18.table
                 |SELECT doc_id, concat('u_', source), concat('u_', lang),
                 |       n_chars + 1
                 |FROM parquet.`$dir/documents.parquet`
                 |WHERE doc_id % 2 = 0""".stripMargin)
        done.createNewFile()
      }
      s.sql("SELECT doc_id, ref, category, val FROM graftsqli18.table")
    }),

    // r18: SQL MERGE INTO with full clause semantics — the reference's
    // headline statement (`embeddings-pipeline.py:294-352` IS a Snowflake
    // MERGE) executed verbatim through the catalog: Spark's own
    // RewriteMergeIntoTable plans the clauses (conditional DELETE,
    // partial-assignment UPDATE, conditional INSERT) and the connector's
    // group-based copy-on-write operation (GraftRowLevelOperation)
    // rewrites only the buckets the runtime group filter proves affected.
    // The oracle is the clause semantics spelled out as a full-outer
    // join. GraftRowLevelSpec pins the physical invariants (untouched
    // buckets verbatim, key-moving updates re-bucketed, the
    // all-rows-deleted-file trap).
    "sql_merge" -> ((s, dir) => {
      val src = new java.io.File(s"$dir/documents.parquet")
      val base = Ivf.cachedIndexDir(src, root = "/tmp/graft-sqlm18",
        params = "sql_merge:nBuckets=8:v1")
      val done = new java.io.File(s"$base/_merge_done")
      s.conf.set("spark.sql.catalog.graftsqlm18", "graft.sources.GraftCatalog")
      s.conf.set("spark.sql.catalog.graftsqlm18.warehouse", base)
      if (!done.exists()) {
        Ivf.gcSupersededIndexes(base)
        val docs = Tables.documents(s, dir)
        Upsert.mergeIntoManifestBucketedParquet(s, s"$base/table",
          docs.where(col("doc_id") % 3 === 0).select(
            col("doc_id"), col("source").as("ref"),
            col("lang").as("category"), col("n_chars").as("val")),
          Seq("doc_id"), nBuckets = 8, keepSnapshots = 4)
        s.sql(
          s"""MERGE INTO graftsqlm18.table t
             |USING (SELECT doc_id, concat('u_', source) AS ref,
             |              concat('u_', lang) AS category,
             |              n_chars + 1 AS val
             |       FROM parquet.`$dir/documents.parquet`
             |       WHERE doc_id % 2 = 0) s
             |ON t.doc_id = s.doc_id
             |WHEN MATCHED AND s.val % 5 = 0 THEN DELETE
             |WHEN MATCHED THEN UPDATE SET ref = s.ref, val = s.val
             |WHEN NOT MATCHED AND s.val % 7 != 0 THEN INSERT *""".stripMargin)
        done.createNewFile()
      }
      s.sql("SELECT doc_id, ref, category, val FROM graftsqlm18.table")
    }),

    // r18: SQL UPDATE with a non-key predicate — the RewriteUpdateTable
    // path of the same row-level operation (carryover ∪ updated rows of
    // affected buckets, everything else untouched).
    "sql_update" -> ((s, dir) => {
      val src = new java.io.File(s"$dir/documents.parquet")
      // v2: the v1 predicate (`LIKE 'c%'`) matched zero rows of the
      // generated corpus — a vacuous UPDATE gates nothing
      val base = Ivf.cachedIndexDir(src, root = "/tmp/graft-sqlu18",
        params = "sql_update:nBuckets=8:v2")
      val done = new java.io.File(s"$base/_update_done")
      s.conf.set("spark.sql.catalog.graftsqlu18", "graft.sources.GraftCatalog")
      s.conf.set("spark.sql.catalog.graftsqlu18.warehouse", base)
      if (!done.exists()) {
        Ivf.gcSupersededIndexes(base)
        Upsert.mergeIntoManifestBucketedParquet(s, s"$base/table",
          Tables.documents(s, dir).where(col("doc_id") % 3 === 0).select(
            col("doc_id"), col("source").as("ref"), col("n_chars").as("val")),
          Seq("doc_id"), nBuckets = 8, keepSnapshots = 4)
        s.sql("UPDATE graftsqlu18.table SET val = val + 100 " +
          "WHERE ref LIKE 'src1%'")
        done.createNewFile()
      }
      s.sql("SELECT doc_id, ref, val FROM graftsqlu18.table")
    }),

    // r18: SQL DELETE with a NON-key predicate — the shape r17 REFUSED
    // (key-only deletes take the metadata fast path, everything else
    // errored). Now it executes as the explicit copy-on-write rewrite:
    // the runtime group filter narrows to buckets holding matching rows,
    // those buckets rewrite minus the victims. The oracle is the
    // anti-selection.
    "sql_delete_rewrite" -> ((s, dir) => {
      val src = new java.io.File(s"$dir/documents.parquet")
      val base = Ivf.cachedIndexDir(src, root = "/tmp/graft-sqldr18",
        params = "sql_delete_rewrite:nBuckets=8:v1")
      val done = new java.io.File(s"$base/_delete_done")
      s.conf.set("spark.sql.catalog.graftsqldr18", "graft.sources.GraftCatalog")
      s.conf.set("spark.sql.catalog.graftsqldr18.warehouse", base)
      if (!done.exists()) {
        Ivf.gcSupersededIndexes(base)
        Upsert.mergeIntoManifestBucketedParquet(s, s"$base/table",
          Tables.documents(s, dir)
            .select("doc_id", "source", "lang", "n_chars"),
          Seq("doc_id"), nBuckets = 8, keepSnapshots = 4)
        s.sql("DELETE FROM graftsqldr18.table WHERE n_chars % 11 = 3")
        done.createNewFile()
      }
      s.sql("SELECT doc_id, source, lang, n_chars FROM graftsqldr18.table")
    }),

    // r18: SQL maintenance lifecycle — `CALL cat.system.compact(…)`
    // (Iceberg/Delta's OPTIMIZE, via ProcedureCatalog) over a table
    // built from small-file appends, then read back. The hash gate
    // proves compaction is content-preserving through the SQL face; the
    // shrink itself (one file per bucket after) is asserted in
    // GraftProceduresSpec. Oracle = union of the appended batches.
    "sql_maintenance" -> ((s, dir) => {
      val src = new java.io.File(s"$dir/documents.parquet")
      val base = Ivf.cachedIndexDir(src, root = "/tmp/graft-sqlp18",
        params = "sql_maintenance:nBuckets=8:v1")
      val done = new java.io.File(s"$base/_compact_done")
      s.conf.set("spark.sql.catalog.graftsqlp18", "graft.sources.GraftCatalog")
      s.conf.set("spark.sql.catalog.graftsqlp18.warehouse", base)
      if (!done.exists()) {
        Ivf.gcSupersededIndexes(base)
        val docs = Tables.documents(s, dir)
        Seq(0, 1, 2).foreach { m =>
          Upsert.appendToManifestBucketedParquet(s, s"$base/table",
            docs.where(col("doc_id") % 3 === m)
              .select("doc_id", "source", "n_chars"),
            Seq("doc_id"), nBuckets = 8, keepSnapshots = 4)
        }
        s.sql("CALL graftsqlp18.system.compact(`table` => 'table', " +
          "target_file_rows => 1000000)")
        done.createNewFile()
      }
      s.sql("SELECT doc_id, source, n_chars FROM graftsqlp18.table")
    }),

    // r18: STREAMING WRITE — writeStream.format("graft"): a graft→graft
    // streaming pipeline (appends read face → native sink) drained
    // twice over one checkpoint. Each micro-batch lands as new
    // per-bucket files appended under the optimistic commit protocol,
    // exactly once per (query, epoch) — the epoch marker rides in the
    // same manifest create as the data, so a crash-replayed batch
    // retires itself (GraftStreamSinkSpec pins replay + restart + the
    // marker surviving interleaved batch merges). Hash gate: the sink
    // table equals the union of the appended source batches.
    "stream_sink" -> ((s, dir) => {
      val src = new java.io.File(s"$dir/documents.parquet")
      val base = Ivf.cachedIndexDir(src, root = "/tmp/graft-sink18",
        params = "stream_sink:nBuckets=8:v1")
      val done = new java.io.File(s"$base/_sink_done")
      if (!done.exists()) {
        Ivf.gcSupersededIndexes(base)
        val docs = Tables.documents(s, dir)
        def batch(m: Int) = docs.where(col("doc_id") % 3 === m)
          .select("doc_id", "source", "n_chars")
        // pre-create the sink target: an empty merge commits schema+layout
        Upsert.mergeIntoManifestBucketedParquet(s, s"$base/sink",
          batch(0).limit(0), Seq("doc_id"), nBuckets = 8, keepSnapshots = 4)
        def drain(): Unit = {
          val q = s.readStream.format("graft").load(s"$base/table")
            .writeStream.format("graft").option("path", s"$base/sink")
            .option("checkpointLocation", s"$base/ckpt")
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .start()
          q.awaitTermination()
        }
        Upsert.appendToManifestBucketedParquet(s, s"$base/table", batch(0),
          Seq("doc_id"), nBuckets = 8, keepSnapshots = 4)
        drain()
        Upsert.appendToManifestBucketedParquet(s, s"$base/table", batch(1),
          Seq("doc_id"), nBuckets = 8, keepSnapshots = 4)
        drain()
        done.createNewFile()
      }
      s.read.format("graft").load(s"$base/sink")
        .select("doc_id", "source", "n_chars")
    }),

    // r18 (VERDICT r17 #6): STREAMING READ of the plain table face —
    // appends-per-snapshot over an insert-only table. Two insert-only
    // commits (appendToManifestBucketedParquet: O(batch) ingest, no merge
    // join, no rewrite) drained through readStream with one shared
    // checkpoint; every micro-batch appends into a parquet mirror. The
    // mirror hash-matching the two batches' union proves bootstrap +
    // incremental appends deliver each row exactly once.
    "append_stream" -> ((s, dir) => {
      val src = new java.io.File(s"$dir/documents.parquet")
      val base = Ivf.cachedIndexDir(src, root = "/tmp/graft-apps18",
        params = "append_stream:nBuckets=8:v1")
      val tbl = s"$base/table"
      val mirror = s"$base/mirror"
      val done = new java.io.File(s"$base/_stream_done")
      if (!done.exists()) {
        Ivf.gcSupersededIndexes(base)
        val docs = Tables.documents(s, dir)
        def batch(m: Int) = docs.where(col("doc_id") % 3 === m)
          .select("doc_id", "source", "n_chars")
        def drain(): Unit = {
          val q = s.readStream.format("graft").load(tbl)
            .writeStream
            .foreachBatch {
              (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
                  _: Long) =>
                b.write.mode("append").parquet(mirror)
                ()
            }
            .option("checkpointLocation", s"$base/ckpt")
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .start()
          q.awaitTermination()
        }
        Upsert.appendToManifestBucketedParquet(s, tbl, batch(0),
          Seq("doc_id"), nBuckets = 8, keepSnapshots = 4)
        drain() // bootstrap: the full snapshot
        Upsert.appendToManifestBucketedParquet(s, tbl, batch(1),
          Seq("doc_id"), nBuckets = 8, keepSnapshots = 4)
        drain() // incremental: exactly the appended files
        done.createNewFile()
      }
      s.read.parquet(mirror).select("doc_id", "source", "n_chars")
    }),

    // r18 (VERDICT r17 #4): GROUPED aggregate pushdown — a GROUP BY over
    // a file-constant column (every file single-valued, null-free in it:
    // the one-shot build bucketed BY grp makes each bucket's files so)
    // is answered from manifest stats with ZERO data files opened; the
    // stderr marker + GraftSourceSpec's LocalTableScan assertion pin the
    // plan shape, this entry pins the values against DuckDB.
    "agg_group_pushdown" -> ((s, dir) => {
      val src = new java.io.File(s"$dir/documents.parquet")
      val base = Ivf.cachedIndexDir(src, root = "/tmp/graft-aggg18",
        params = "agg_group:nBuckets=64:v1")
      val tbl = s"$base/table"
      if (Upsert.manifestBody(s, tbl, None).isEmpty) {
        Ivf.gcSupersededIndexes(base)
        Upsert.mergeIntoManifestBucketedParquet(s, tbl,
          Tables.documents(s, dir).select(
            (col("doc_id") % 6).as("grp"), col("doc_id"), col("n_chars")),
          Seq("grp"), nBuckets = 64, statsCols = Seq("doc_id", "n_chars"))
      }
      s.read.format("graft").load(tbl)
        .groupBy("grp")
        .agg(count(lit(1)).as("n"),
          min(col("n_chars")).as("min_chars"),
          max(col("n_chars")).as("max_chars"),
          min(col("doc_id")).as("min_id"))
    }),

    // Per-key corpus cap (training-data curation): at most 10 docs per
    // source, picked by a deterministic engine-portable hash.
    "cap_per_key" -> ((s, dir) =>
      Dedup.capPerKey(Tables.documents(s, dir), 10, Seq("source"), "doc_id")
        .select("doc_id", "source")),

    // Semi-structured JSON column access (the other face of the
    // reference's Snowflake `$1:field::TYPE` staged-scan semantics,
    // SURVEY §1.2): extract a typed field from the events.props JSON
    // string and aggregate on it — scan-stage extraction, exact sums.
    "json_props" -> ((s, dir) =>
      Tables.events(s, dir)
        .select(get_json_object(col("props"), "$.k").cast("long").as("k"),
          col("value"))
        .groupBy(expr("k div 10").as("k_decade"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,6)")).cast("double").as("sum_value"))),

    // Z-order (Morton) clustering key over (user_id, event_type-bucket):
    // the multi-dimensional layout key that makes row-group stats
    // selective on every interleaved column at once.
    "zorder_key" -> ((s, dir) =>
      Tables.events(s, dir)
        .select(col("event_id"),
          pmod(col("user_id"), lit(1L << 16)).as("u16"),
          pmod(col("event_id"), lit(1L << 16)).as("e16"))
        .withColumn("z",
          operators.Layout.zorderKey(Seq(col("u16"), col("e16")), 16))),

    // Data-quality gate report: every rule evaluated in ONE scan, exact
    // violation counts per rule (the go/no-go input before merge).
    "data_quality" -> ((s, dir) =>
      Validate.report(Tables.documents(s, dir), Seq(
        "empty_text" -> (length(col("text")) === 0),
        "short_text" -> (col("n_chars") < 200),
        "chars_mismatch" -> (col("n_chars") =!= length(col("text"))),
        "unknown_lang" -> !col("lang").isin("en", "de", "fr", "es")))),

    // Continuous per-type day axis with zero-filled counts,
    // forward-filled last observation and gap age — the regular-grid
    // repair every trend model assumes.
    "gap_fill" -> ((s, dir) =>
      TimeSeries.gapFill(Tables.events(s, dir), "ts", "event_type")),

    // Set operations at (user, day) grain: days a user clicked AND viewed
    // but did not purchase.
    "set_ops" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      def userDays(t: String) =
        ev.where(col("event_type") === t)
          .select(col("user_id"), to_date(col("ts")).cast("string").as("day"))
      userDays("click").intersect(userDays("view")).except(userDays("purchase"))
    }),

    // Window-function surface: lag/lead/row_number/ntile over a totally
    // ordered per-user frame.
    "window_funcs" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      Tables.events(s, dir).select(
        col("user_id"), col("event_id"),
        lag(col("value"), 1).over(w).as("prev_value"),
        lead(col("value"), 1).over(w).as("next_value"),
        row_number().over(w).cast("long").as("rn"),
        ntile(4).over(w).cast("long").as("quartile"))
    }),

    // ROLLUP aggregate with grouping indicators, decimal-exact sums.
    "rollup_agg" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(grouping(col("l_returnflag")).cast("long").as("g_rf"),
          grouping(col("l_linestatus")).cast("long").as("g_ls"),
          count(lit(1)).as("n"),
          sum(col("l_quantity").cast("decimal(12,2)")).cast("double").as("sum_qty"))),

    // Pivot: per-user event-type value sums as columns (decimal-exact).
    "pivot_agg" -> ((s, dir) =>
      Tables.events(s, dir)
        .withColumn("value", col("value").cast("decimal(18,6)"))
        .groupBy("user_id")
        .pivot("event_type", Seq("click", "view", "purchase"))
        .agg(sum(col("value")))
        .select(col("user_id"),
          col("click").cast("double").as("click"),
          col("view").cast("double").as("view"),
          col("purchase").cast("double").as("purchase"))),

    // AS-OF join (merge formulation — one shuffle, no theta-join blow-up):
    // each click picks up the latest view at-or-before it per user.
    "asof_join" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val clicks = ev.where(col("event_type") === "click")
        .select("event_id", "user_id", "ts")
      val views = Dedup.latestPerKey(
          ev.where(col("event_type") === "view"),
          Seq("user_id", "ts"), Seq(col("event_id").desc))
        .select(col("user_id"), col("ts"), col("event_id").as("view_id"),
          col("value"))
      Joins.asofJoin(clicks, views, Seq("user_id"), "ts", Seq("view_id", "value"))
        .select(col("event_id"), col("user_id"), ts6(col("ts")).as("ts_str"),
          col("asof_view_id"), col("asof_value"))
    }),

    // Time-BAND join (bucketed formulation — (key, Δ-bucket) equi-join
    // with a 3-bucket left explode, never a per-key quadratic candidate
    // set): clicks within ±15 min of each purchase, zero-preserving.
    "band_join" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val purchases = ev.where(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts")
      val clicks = ev.where(col("event_type") === "click")
        .select(col("user_id"), col("ts"),
          col("value").cast("decimal(18,6)").as("value"))
      val nearby = Joins.bandJoin(purchases, clicks, Seq("user_id"),
          "ts", "ts", bandSeconds = 900, Seq("value"))
        .groupBy("event_id")
        .agg(count(lit(1)).as("n_nearby"), sum(col("band_value")).as("v"))
      purchases.join(nearby, Seq("event_id"), "left")
        .select(col("event_id"), col("user_id"), ts6(col("ts")).as("ts_str"),
          coalesce(col("n_nearby"), lit(0L)).as("n_nearby"),
          coalesce(col("v"), lit(0).cast("decimal(18,6)"))
            .cast("double").as("click_value"))
    }),

    // Range join into CONTAINING intervals (one shuffle via the as-of
    // merge formulation): each purchase lands in its enclosing session.
    "range_join" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val sessions = Sessionize.sessions(ev, gapSeconds = 1800)
        .select(col("user_id"), col("session_id"), col("session_start"),
          // sessions close ON their last event; rangeJoin is end-exclusive
          (col("session_end") + expr("interval 1 microsecond")).as("session_close"))
      val purchases = ev.where(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts")
      Joins.rangeJoin(purchases, sessions, Seq("user_id"), "ts",
          "session_start", "session_close", Seq("session_id"))
        .select(col("event_id"), col("user_id"), ts6(col("ts")).as("ts_str"),
          col("asof_session_id").as("session_id"))
    }),

    // Gap-based sessionization (custom-state operator family): batch
    // gaps-and-islands plan; the streaming twin (flatMapGroupsWithState)
    // is equivalence-tested in SessionizeSpec.
    "sessionize" -> ((s, dir) =>
      Sessionize.sessions(Tables.events(s, dir), gapSeconds = 1800)
        .select(col("user_id"), col("session_id"),
          ts6(col("session_start")).as("s_start"),
          ts6(col("session_end")).as("s_end"),
          col("n_events"))),

    // Top navigation paths over the same 30-min sessions: per-session
    // event-type sequence (deterministic (ts, event_id) order, first 8
    // steps) -> the 20 most common paths — the sankey/flow census, with
    // the step cap bounding both bot sessions and the path domain.
    "session_paths" -> ((s, dir) =>
      Sessionize.topPaths(Tables.events(s, dir), gapSeconds = 1800,
        k = 20, maxSteps = 8)),

    // Skew-proof twin of sessionize: shuffles on (key, 2h time chunk) so a
    // hot key parallelizes across its time range, then merges boundary
    // islands in a session-count-sized second pass. Output is provably
    // identical (scaladoc on sessionsChunked), so it shares the oracle.
    "sessionize_chunked" -> ((s, dir) =>
      Sessionize.sessionsChunked(Tables.events(s, dir),
          gapSeconds = 1800, chunkSeconds = 7200)
        .select(col("user_id"), col("session_id"),
          ts6(col("session_start")).as("s_start"),
          ts6(col("session_end")).as("s_end"),
          col("n_events"))),

    // Engagement stickiness: per epoch-day, DAU and the day's epoch-week
    // WAU with the DAU/WAU ratio in exact integer permille — the
    // engagement-intensity twin of retention_cohorts (same locale-free
    // integer calendar: day = floor(sec/86400), week = floor(sec/604800)).
    // Two distinct-count aggs + a day->week join; both map-side combined.
    "stickiness" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .select(col("user_id"),
          expr(TimeSeries.epochDaySql("cast(ts as long)")).as("d"),
          expr(TimeSeries.epochBucketSql("cast(ts as long)", 604800L)).as("w"))
      val dau = ev.groupBy("d", "w")
        .agg(countDistinct(col("user_id")).as("dau"))
      val wau = ev.groupBy("w")
        .agg(countDistinct(col("user_id")).as("wau"))
      dau.join(wau, "w")
        .select(col("d").as("epoch_day"), col("dau"), col("wau"),
          expr("dau * 1000 div wau").as("stickiness_permille"))
    }),

    // SCD2 dimension history from the event log: per user, consecutive
    // equal event_type runs collapse into validity intervals with
    // versions — the warehouse history pattern next to the MERGE upsert.
    // Incremental fold (applyBatch == full recompute) is property-tested
    // in Scd2Spec; this registers the full derivation with a windowed
    // SQL mirror.
    "scd2_history" -> ((s, dir) =>
      Scd2.fromLog(Tables.events(s, dir), "user_id", "event_type", "ts",
          orderCols = Seq("event_id"))
        .select(col("user_id"), col("event_type"),
          ts6(col("valid_from")).as("valid_from"),
          ts6(col("valid_to")).as("valid_to"),
          col("is_current"), col("version"))),

    // Skew-proof twin of scd2_history: change-point collapse within
    // (key, 2h chunk) so a hot key parallelizes across its time range,
    // boundary duplicates removed in a change-point-sized second pass.
    // Output provably identical (Scd2.fromLogChunked scaladoc), so it
    // shares the oracle.
    "scd2_chunked" -> ((s, dir) =>
      Scd2.fromLogChunked(Tables.events(s, dir), "user_id", "event_type",
          "ts", orderCols = Seq("event_id"), chunkSeconds = 7200L)
        .select(col("user_id"), col("event_type"),
          ts6(col("valid_from")).as("valid_from"),
          ts6(col("valid_to")).as("valid_to"),
          col("is_current"), col("version"))),

    // Streaming-shaped windowed aggregation (event-time tumbling window),
    // run on the batch path; value summed in exact decimal.
    "windowed_counts" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .withColumn("value", col("value").cast("decimal(18,6)"))
      IncrementalStream.windowedCounts(ev)
        .select(
          date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("w_start"),
          date_format(col("window.end"), "yyyy-MM-dd HH:mm:ss").as("w_end"),
          col("event_type"), col("n"), col("total_value").cast("double").as("total_value"))
    })
  )

  val oracles: Map[String, String] = Map(
    "pushdown_scan" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        | WHERE l_returnflag = 'R' AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |   AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'""".stripMargin,

    "distinct_scan" -> "SELECT DISTINCT source FROM documents",

    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |           (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE)
        |    AS sum_disc_price,
        |  COUNT(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,

    "star_join" ->
      """SELECT l_orderkey, CAST(rev AS DOUBLE) AS revenue FROM (
        |  SELECT l_orderkey,
        |    SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |        (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS rev
        |  FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  WHERE c_mktsegment = 'BUILDING'
        |    AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |    AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  GROUP BY l_orderkey
        |  ORDER BY rev DESC, l_orderkey LIMIT 10)""".stripMargin,

    "incremental_filter" ->
      """SELECT event_id, event_type,
        |  strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S.%f') AS ts_str
        |FROM events
        |WHERE CASE WHEN event_type = 'click' THEN ts > TIMESTAMP '2024-01-20 00:00:00'
        |           WHEN event_type = 'view' THEN ts > TIMESTAMP '2024-01-10 00:00:00'
        |           ELSE ts >= TIMESTAMP '2024-01-15 00:00:00' END""".stripMargin,

    "non_empty_embeddings" ->
      """SELECT vec_id, label, CAST(len(embedding) AS INTEGER) AS dim
        |FROM embeddings WHERE embedding IS NOT NULL AND len(embedding) > 0""".stripMargin,

    "latest_per_key" ->
      """SELECT user_id, event_id, event_type,
        |  strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S.%f') AS ts_str
        |FROM events
        |QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1""".stripMargin,

    "topk_per_key" ->
      """SELECT user_id, event_id, value FROM events
        |QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) <= 3""".stripMargin,

    "max_watermark" ->
      """SELECT event_type,
        |  strftime(CAST(MAX(ts) AS TIMESTAMP), '%Y-%m-%d %H:%M:%S.%f') AS wm_str
        |FROM events GROUP BY event_type""".stripMargin,

    "main_refco" ->
      s"""SELECT doc_id, ${NormalizedKey.format("text || '_' || lang")} AS main_refco
         |FROM documents""".stripMargin,

    "derive_record" ->
      s"""WITH src AS (
         |  SELECT doc_id, source, lang, n_chars,
         |    make_timestamp(1704067200000000 + doc_id * 1000000 + (doc_id % 2) * 123456) AS ts
         |  FROM documents)
         |SELECT source AS cleaned_ref,
         |  CASE WHEN doc_id % 7 <> 0 THEN lang ELSE '' END AS category,
         |  ${NormalizedKey.format(
             "source || CASE WHEN lang <> 'en' THEN '_' || lang ELSE '' END")} AS main_refco,
         |  source || ' (' || CASE WHEN lang <> 'en' THEN lang ELSE 'None' END || ')'
         |    AS display_name,
         |  CASE WHEN doc_id % 5 <> 0 THEN 'dense' END AS embeddings_type,
         |  doc_id % 3 = 0 AS for_matching,
         |  CASE WHEN doc_id % 2 = 0 THEN strftime(ts, '%Y-%m-%dT%H:%M:%S')
         |       ELSE strftime(ts, '%Y-%m-%dT%H:%M:%S.%f') END AS original_timestamp,
         |  CAST(2 AS INTEGER) AS emb_dim
         |FROM src WHERE doc_id % 13 <> 0 AND doc_id % 97 <> 0""".stripMargin,

    "country_code" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id % 11 <> 0 AND lang <> 'en' THEN lang END AS country_code
        |FROM documents""".stripMargin,

    "quarantine" ->
      """SELECT vec_id,
        |  concat_ws(',',
        |    CASE WHEN vec_id % 7 = 0 THEN 'null_timestamp' END,
        |    CASE WHEN vec_id % 10 = 1
        |           OR (vec_id % 10 = 0 AND vec_id % 13 <> 2) THEN 'empty_embedding' END,
        |    CASE WHEN vec_id % 10 = 1 OR vec_id % 13 = 2 THEN 'bad_vector_dim' END)
        |    AS errors
        |FROM embeddings
        |WHERE vec_id % 7 = 0 OR vec_id % 10 IN (0, 1) OR vec_id % 13 = 2""".stripMargin,

    "display_name" ->
      """SELECT doc_id,
        |  source || ' (' || coalesce(CASE WHEN lang <> 'en' THEN lang END, 'None') || ')'
        |    AS display_name
        |FROM documents""".stripMargin,

    "iso_timestamp" ->
      """SELECT event_id,
        |  CASE WHEN microsecond(CAST(ts AS TIMESTAMP)) % 1000000 = 0
        |       THEN strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%dT%H:%M:%S')
        |       ELSE strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%dT%H:%M:%S.%f') END AS iso_ts
        |FROM events""".stripMargin,

    "merge_source" ->
      s"""WITH rec AS (
         |  SELECT doc_id, ${NormalizedKey.format("source || '_' || lang")} AS main_refco,
         |    source || ' (' || coalesce(CASE WHEN lang <> 'en' THEN lang END, 'None') || ')'
         |      AS display_name,
         |    n_chars
         |  FROM documents),
         |deduped AS (
         |  SELECT * FROM rec
         |  QUALIFY row_number() OVER (PARTITION BY main_refco ORDER BY doc_id DESC) = 1),
         |dim AS (
         |  SELECT display_name,
         |    list_reduce(
         |      [CAST(ascii(display_name[i:i]) AS BIGINT)
         |       for i in range(1, len(display_name) + 1)],
         |      (acc, c) -> (acc * 31 + c) % ${TextAnalysis.FingerprintMod})
         |      AS display_name_id
         |  FROM (SELECT DISTINCT display_name FROM rec
         |        WHERE display_name NOT LIKE '%(None)'))
         |SELECT d.main_refco, d.display_name, dim.display_name_id, d.doc_id, d.n_chars
         |FROM deduped d JOIN dim USING (display_name)""".stripMargin,

    "merge_upsert" ->
      """WITH t AS (
        |  SELECT doc_id, source AS cleaned_ref, lang AS category, n_chars AS val
        |  FROM documents WHERE doc_id % 3 = 0),
        |u AS (
        |  SELECT doc_id, 'u_' || source AS cleaned_ref,
        |    CASE WHEN doc_id % 5 <> 0 THEN 'u_' || lang END AS category,
        |    n_chars + 1 AS val
        |  FROM documents WHERE doc_id % 2 = 0)
        |SELECT coalesce(t.doc_id, u.doc_id) AS doc_id,
        |  coalesce(t.cleaned_ref, u.cleaned_ref) AS cleaned_ref,
        |  CASE WHEN u.doc_id IS NOT NULL THEN u.category ELSE t.category END AS category,
        |  CASE WHEN u.doc_id IS NOT NULL THEN u.val ELSE t.val END AS val
        |FROM t FULL OUTER JOIN u ON t.doc_id = u.doc_id""".stripMargin,

    // identical semantics served through the DSv2 connector: the table on
    // disk IS the committed merge, so the oracle is merge_upsert's
    "dsv2_read" ->
      """WITH t AS (
        |  SELECT doc_id, source AS cleaned_ref, lang AS category, n_chars AS val
        |  FROM documents WHERE doc_id % 3 = 0),
        |u AS (
        |  SELECT doc_id, 'u_' || source AS cleaned_ref,
        |    CASE WHEN doc_id % 5 <> 0 THEN 'u_' || lang END AS category,
        |    n_chars + 1 AS val
        |  FROM documents WHERE doc_id % 2 = 0)
        |SELECT coalesce(t.doc_id, u.doc_id) AS doc_id,
        |  coalesce(t.cleaned_ref, u.cleaned_ref) AS cleaned_ref,
        |  CASE WHEN u.doc_id IS NOT NULL THEN u.category ELSE t.category END AS category,
        |  CASE WHEN u.doc_id IS NOT NULL THEN u.val ELSE t.val END AS val
        |FROM t FULL OUTER JOIN u ON t.doc_id = u.doc_id""".stripMargin,

    // identical semantics through the SQL catalog face (and the CDC
    // stream fold): catalog resolution / bootstrap+incremental CDC must
    // serve exactly the committed MERGE state
    "dsv2_catalog_sql" ->
      """WITH t AS (
        |  SELECT doc_id, source AS cleaned_ref, lang AS category, n_chars AS val
        |  FROM documents WHERE doc_id % 3 = 0),
        |u AS (
        |  SELECT doc_id, 'u_' || source AS cleaned_ref,
        |    CASE WHEN doc_id % 5 <> 0 THEN 'u_' || lang END AS category,
        |    n_chars + 1 AS val
        |  FROM documents WHERE doc_id % 2 = 0)
        |SELECT coalesce(t.doc_id, u.doc_id) AS doc_id,
        |  coalesce(t.cleaned_ref, u.cleaned_ref) AS cleaned_ref,
        |  CASE WHEN u.doc_id IS NOT NULL THEN u.category ELSE t.category END AS category,
        |  CASE WHEN u.doc_id IS NOT NULL THEN u.val ELSE t.val END AS val
        |FROM t FULL OUTER JOIN u ON t.doc_id = u.doc_id""".stripMargin,

    "cdc_stream_fold" ->
      """WITH t AS (
        |  SELECT doc_id, source AS cleaned_ref, lang AS category, n_chars AS val
        |  FROM documents WHERE doc_id % 3 = 0),
        |u AS (
        |  SELECT doc_id, 'u_' || source AS cleaned_ref,
        |    CASE WHEN doc_id % 5 <> 0 THEN 'u_' || lang END AS category,
        |    n_chars + 1 AS val
        |  FROM documents WHERE doc_id % 2 = 0)
        |SELECT coalesce(t.doc_id, u.doc_id) AS doc_id,
        |  coalesce(t.cleaned_ref, u.cleaned_ref) AS cleaned_ref,
        |  CASE WHEN u.doc_id IS NOT NULL THEN u.category ELSE t.category END AS category,
        |  CASE WHEN u.doc_id IS NOT NULL THEN u.val ELSE t.val END AS val
        |FROM t FULL OUTER JOIN u ON t.doc_id = u.doc_id""".stripMargin,

    // the storage-partitioned join's VALUES are an ordinary equi-join —
    // the zero-exchange property is pinned by PlanSpec, the plan map, and
    // GraftCatalogSpec; the oracle pins the semantics
    "spj_join" ->
      """WITH a AS (
        |  SELECT doc_id, n_chars AS lchars FROM documents WHERE doc_id % 3 = 0),
        |b AS (
        |  SELECT doc_id, source AS rsource FROM documents WHERE doc_id % 2 = 0)
        |SELECT a.doc_id, a.lchars, b.rsource
        |FROM a JOIN b ON a.doc_id = b.doc_id""".stripMargin,

    // the SQL DELETE's surviving rows are the anti-selection — the hash
    // gate proves the catalog DELETE removed exactly the named keys and
    // nothing else
    "sql_delete" ->
      """SELECT doc_id, source, lang, n_chars FROM documents
        |WHERE doc_id NOT IN (3, 42, 97, 123, 555)""".stripMargin,

    // INSERT-as-merge: update-wins-on-match full-outer merge of the two
    // batches (unlike merge_upsert there is no insert-only column — SQL
    // INSERT carries no per-column override surface)
    "sql_insert" ->
      """WITH t AS (
        |  SELECT doc_id, source AS ref, lang AS category, n_chars AS val
        |  FROM documents WHERE doc_id % 3 = 0),
        |u AS (
        |  SELECT doc_id, 'u_' || source AS ref, 'u_' || lang AS category,
        |    n_chars + 1 AS val
        |  FROM documents WHERE doc_id % 2 = 0)
        |SELECT coalesce(t.doc_id, u.doc_id) AS doc_id,
        |  CASE WHEN u.doc_id IS NOT NULL THEN u.ref ELSE t.ref END AS ref,
        |  CASE WHEN u.doc_id IS NOT NULL THEN u.category ELSE t.category END AS category,
        |  CASE WHEN u.doc_id IS NOT NULL THEN u.val ELSE t.val END AS val
        |FROM t FULL OUTER JOIN u ON t.doc_id = u.doc_id""".stripMargin,

    // MERGE clause semantics spelled out: matched ∧ val%5=0 deleted;
    // matched else updated (ref/val from source, category KEPT — the
    // partial assignment); unmatched target carried; unmatched source
    // inserted unless val%7=0 (the conditional insert)
    "sql_merge" ->
      """WITH t AS (
        |  SELECT doc_id, source AS ref, lang AS category, n_chars AS val
        |  FROM documents WHERE doc_id % 3 = 0),
        |u AS (
        |  SELECT doc_id, 'u_' || source AS ref, 'u_' || lang AS category,
        |    n_chars + 1 AS val
        |  FROM documents WHERE doc_id % 2 = 0)
        |SELECT coalesce(t.doc_id, u.doc_id) AS doc_id,
        |  CASE WHEN u.doc_id IS NOT NULL THEN u.ref ELSE t.ref END AS ref,
        |  CASE WHEN t.doc_id IS NOT NULL THEN t.category ELSE u.category END AS category,
        |  CASE WHEN u.doc_id IS NOT NULL THEN u.val ELSE t.val END AS val
        |FROM t FULL OUTER JOIN u ON t.doc_id = u.doc_id
        |WHERE NOT (t.doc_id IS NOT NULL AND u.doc_id IS NOT NULL AND u.val % 5 = 0)
        |  AND NOT (t.doc_id IS NULL AND u.val % 7 = 0)""".stripMargin,

    // UPDATE = CASE over the predicate
    "sql_update" ->
      """SELECT doc_id, source AS ref,
        |  CASE WHEN source LIKE 'src1%' THEN n_chars + 100 ELSE n_chars END AS val
        |FROM documents WHERE doc_id % 3 = 0""".stripMargin,

    // non-key DELETE = anti-selection on the predicate
    "sql_delete_rewrite" ->
      """SELECT doc_id, source, lang, n_chars FROM documents
        |WHERE n_chars % 11 != 3""".stripMargin,

    // compaction is content-preserving: the compacted table is the
    // union of the three appended (disjoint) batches
    "sql_maintenance" ->
      "SELECT doc_id, source, n_chars FROM documents",

    // the sink delivers each appended row exactly once, so the sink
    // table is the union of the two source batches
    "stream_sink" ->
      """SELECT doc_id, source, n_chars FROM documents
        |WHERE doc_id % 3 = 0 OR doc_id % 3 = 1""".stripMargin,

    // the appends stream delivers each inserted row exactly once, so the
    // mirror is just the union of the two insert-only batches
    "append_stream" ->
      """SELECT doc_id, source, n_chars FROM documents
        |WHERE doc_id % 3 = 0 OR doc_id % 3 = 1""".stripMargin,

    // the grouped stats answer must equal the real per-group aggregate
    "agg_group_pushdown" ->
      """SELECT doc_id % 6 AS grp, count(*) AS n,
        |  min(n_chars) AS min_chars, max(n_chars) AS max_chars,
        |  min(doc_id) AS min_id
        |FROM documents GROUP BY 1""".stripMargin,

    // Knuth hash in the same overflow-free split form as Dedup.capPerKey
    // (equal values wherever the naive multiply doesn't overflow).
    "cap_per_key" ->
      """SELECT doc_id, source FROM documents
        |QUALIFY row_number() OVER (PARTITION BY source
        |  ORDER BY ((doc_id % 4294967296 % 65536) * 2654435761
        |            + ((doc_id % 4294967296 // 65536) * 2654435761 % 65536) * 65536)
        |           % 4294967296, doc_id) <= 10""".stripMargin,

    "json_props" ->
      """SELECT CAST(json_extract(props, '$.k') AS BIGINT) // 10 AS k_decade,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1""".stripMargin,

    // Same static term expansion, generated by the library itself.
    "zorder_key" -> {
      val terms = operators.Layout.zorderKeySql(Seq("u16", "e16"), 16)
      s"""WITH m AS (SELECT event_id,
         |    event_id % 65536 AS e16_raw, user_id % 65536 AS u16
         |  FROM events),
         |n AS (SELECT event_id, u16, e16_raw AS e16 FROM m)
         |SELECT event_id, CAST(u16 AS BIGINT) AS u16, CAST(e16 AS BIGINT) AS e16,
         |  CAST($terms AS BIGINT) AS z
         |FROM n""".stripMargin
    },

    "data_quality" ->
      """WITH m AS (SELECT
        |    CASE WHEN len(text) = 0 THEN 1 ELSE 0 END AS empty_text,
        |    CASE WHEN n_chars < 200 THEN 1 ELSE 0 END AS short_text,
        |    CASE WHEN n_chars <> len(text) THEN 1 ELSE 0 END AS chars_mismatch,
        |    CASE WHEN lang NOT IN ('en', 'de', 'fr', 'es') THEN 1 ELSE 0 END AS unknown_lang
        |  FROM documents)
        |SELECT 'empty_text' AS rule, CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(sum(empty_text) AS BIGINT) AS n_violations,
        |  CAST(sum(empty_text) * 1000 // count(*) AS BIGINT) AS violation_permille FROM m
        |UNION ALL SELECT 'short_text', CAST(count(*) AS BIGINT),
        |  CAST(sum(short_text) AS BIGINT),
        |  CAST(sum(short_text) * 1000 // count(*) AS BIGINT) FROM m
        |UNION ALL SELECT 'chars_mismatch', CAST(count(*) AS BIGINT),
        |  CAST(sum(chars_mismatch) AS BIGINT),
        |  CAST(sum(chars_mismatch) * 1000 // count(*) AS BIGINT) FROM m
        |UNION ALL SELECT 'unknown_lang', CAST(count(*) AS BIGINT),
        |  CAST(sum(unknown_lang) AS BIGINT),
        |  CAST(sum(unknown_lang) * 1000 // count(*) AS BIGINT) FROM m""".stripMargin,

    // range() day axis per key + IGNORE NULLS forward-fill windows —
    // both engines' last_value frames default to unbounded..current.
    "gap_fill" ->
      """WITH d AS (SELECT event_type AS key,
        |    (epoch_us(ts) - ((epoch_us(ts) % 86400000000 + 86400000000) % 86400000000)) // 86400000000 AS day, COUNT(*) AS n
        |  FROM events GROUP BY 1, 2),
        |span AS (SELECT key, MIN(day) AS d0, MAX(day) AS d1 FROM d GROUP BY 1),
        |axis AS (SELECT key, unnest(range(d0, d1 + 1)) AS day FROM span),
        |j AS (SELECT axis.key, axis.day, d.n AS obs_n
        |      FROM axis LEFT JOIN d ON d.key = axis.key AND d.day = axis.day)
        |SELECT key, CAST(day AS BIGINT) AS day,
        |  CAST(COALESCE(obs_n, 0) AS BIGINT) AS n,
        |  CAST(last_value(obs_n IGNORE NULLS)
        |    OVER (PARTITION BY key ORDER BY day) AS BIGINT) AS last_n,
        |  CAST(day - last_value(CASE WHEN obs_n IS NOT NULL THEN day END
        |      IGNORE NULLS)
        |    OVER (PARTITION BY key ORDER BY day) AS BIGINT) AS gap_age
        |FROM j""".stripMargin,

    "set_ops" ->
      """SELECT user_id, strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day
        |FROM events WHERE event_type = 'click'
        |INTERSECT
        |SELECT user_id, strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day
        |FROM events WHERE event_type = 'view'
        |EXCEPT
        |SELECT user_id, strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day
        |FROM events WHERE event_type = 'purchase'""".stripMargin,

    "window_funcs" ->
      """SELECT user_id, event_id,
        |  lag(value) OVER w AS prev_value,
        |  lead(value) OVER w AS next_value,
        |  row_number() OVER w AS rn,
        |  CAST(ntile(4) OVER w AS BIGINT) AS quartile
        |FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""".stripMargin,

    "rollup_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(grouping(l_returnflag) AS BIGINT) AS g_rf,
        |  CAST(grouping(l_linestatus) AS BIGINT) AS g_ls,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""".stripMargin,

    "pivot_agg" ->
      """SELECT user_id,
        |  CAST(SUM(CASE WHEN event_type = 'click' THEN CAST(value AS DECIMAL(18,6)) END) AS DOUBLE) AS click,
        |  CAST(SUM(CASE WHEN event_type = 'view' THEN CAST(value AS DECIMAL(18,6)) END) AS DOUBLE) AS view,
        |  CAST(SUM(CASE WHEN event_type = 'purchase' THEN CAST(value AS DECIMAL(18,6)) END) AS DOUBLE) AS purchase
        |FROM events GROUP BY user_id""".stripMargin,

    "asof_join" ->
      """WITH clicks AS (
        |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
        |views AS (
        |  SELECT user_id, ts, event_id AS view_id, value FROM events
        |  WHERE event_type = 'view'
        |  QUALIFY row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) = 1)
        |SELECT l.event_id, l.user_id,
        |  strftime(l.ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_str,
        |  r.view_id AS asof_view_id, r.value AS asof_value
        |FROM clicks l ASOF LEFT JOIN views r
        |  ON l.user_id = r.user_id AND r.ts <= l.ts""".stripMargin,

    "band_join" ->
      """WITH p AS (
        |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
        |c AS (
        |  SELECT user_id, ts, value FROM events WHERE event_type = 'click')
        |SELECT p.event_id, p.user_id,
        |  strftime(p.ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_str,
        |  COUNT(c.user_id) AS n_nearby,
        |  CAST(COALESCE(SUM(CAST(c.value AS DECIMAL(18,6))), 0) AS DOUBLE)
        |    AS click_value
        |FROM p LEFT JOIN c ON p.user_id = c.user_id
        |  AND abs(epoch_us(p.ts) - epoch_us(c.ts)) <= 900000000
        |GROUP BY 1, 2, 3""".stripMargin,

    "range_join" ->
      """WITH g AS (
        |  SELECT user_id, ts,
        |    CASE WHEN epoch(ts) - epoch(lag(ts) OVER w) > 1800 THEN 1 ELSE 0 END AS ns
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |s AS (
        |  SELECT user_id, ts,
        |    1 + SUM(ns) OVER (PARTITION BY user_id ORDER BY ts) AS sid
        |  FROM g),
        |sess AS (
        |  SELECT user_id, CAST(sid AS BIGINT) AS session_id,
        |    MIN(ts) AS s_start, MAX(ts) AS s_end
        |  FROM s GROUP BY user_id, sid),
        |p AS (
        |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase')
        |SELECT p.event_id, p.user_id,
        |  strftime(p.ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_str, sess.session_id
        |FROM p JOIN sess ON p.user_id = sess.user_id
        |  AND p.ts BETWEEN sess.s_start AND sess.s_end""".stripMargin,

    "sessionize" ->
      """WITH g AS (
        |  SELECT user_id, ts,
        |    CASE WHEN epoch(ts) - epoch(lag(ts) OVER w) > 1800 THEN 1 ELSE 0 END AS ns
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |s AS (
        |  SELECT user_id, ts,
        |    1 + SUM(ns) OVER (PARTITION BY user_id ORDER BY ts) AS sid
        |  FROM g)
        |SELECT user_id, CAST(sid AS BIGINT) AS session_id,
        |  strftime(MIN(ts), '%Y-%m-%d %H:%M:%S.%f') AS s_start,
        |  strftime(MAX(ts), '%Y-%m-%d %H:%M:%S.%f') AS s_end,
        |  COUNT(*) AS n_events
        |FROM s GROUP BY user_id, sid""".stripMargin,

    // Same gaps-and-islands session ids, then per-session ordered
    // string_agg truncated to 8 steps and the bounded top-20.
    "session_paths" ->
      """WITH g AS (
        |  SELECT user_id, ts, event_id, event_type,
        |    CASE WHEN epoch(ts) - epoch(lag(ts) OVER w) > 1800 THEN 1 ELSE 0 END AS ns
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |s AS (
        |  SELECT user_id, ts, event_id, event_type,
        |    1 + SUM(ns) OVER (PARTITION BY user_id ORDER BY ts) AS sid
        |  FROM g),
        |r AS (SELECT user_id, sid, event_type,
        |    row_number() OVER (PARTITION BY user_id, sid
        |                       ORDER BY epoch_us(ts), event_id) AS rn
        |  FROM s),
        |p AS (SELECT string_agg(event_type, '>' ORDER BY rn) AS path
        |      FROM r WHERE rn <= 8 GROUP BY user_id, sid)
        |SELECT path, COUNT(*) AS n_sessions
        |FROM p GROUP BY path
        |ORDER BY n_sessions DESC, path LIMIT 20""".stripMargin,

    // sessionize_chunked is output-identical to sessionize by construction
    // (Sessionize.sessionsChunked scaladoc) — the oracle is the same
    // single-pass gaps-and-islands SQL.
    "sessionize_chunked" ->
      """WITH g AS (
        |  SELECT user_id, ts,
        |    CASE WHEN epoch(ts) - epoch(lag(ts) OVER w) > 1800 THEN 1 ELSE 0 END AS ns
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |s AS (
        |  SELECT user_id, ts,
        |    1 + SUM(ns) OVER (PARTITION BY user_id ORDER BY ts) AS sid
        |  FROM g)
        |SELECT user_id, CAST(sid AS BIGINT) AS session_id,
        |  strftime(MIN(ts), '%Y-%m-%d %H:%M:%S.%f') AS s_start,
        |  strftime(MAX(ts), '%Y-%m-%d %H:%M:%S.%f') AS s_end,
        |  COUNT(*) AS n_events
        |FROM s GROUP BY user_id, sid""".stripMargin,

    // explicit floor-division mirrors Spark's FLOORING cast(ts AS LONG);
    // integer day/week arithmetic matches the retention convention.
    "stickiness" ->
      """WITH e AS (SELECT user_id,
        |    (epoch_us(ts) - ((epoch_us(ts) % 86400000000 + 86400000000) % 86400000000)) // 86400000000 AS d,
        |    (epoch_us(ts) - ((epoch_us(ts) % 604800000000 + 604800000000) % 604800000000)) // 604800000000 AS w
        |  FROM events),
        |dau AS (SELECT d, w, count(DISTINCT user_id) AS dau FROM e GROUP BY 1, 2),
        |wau AS (SELECT w, count(DISTINCT user_id) AS wau FROM e GROUP BY 1)
        |SELECT CAST(d AS BIGINT) AS epoch_day, dau, wau,
        |  CAST(dau * 1000 // wau AS BIGINT) AS stickiness_permille
        |FROM dau JOIN wau USING (w)""".stripMargin,

    "scd2_history" ->
      """WITH o AS (
        |  SELECT user_id, event_type, ts, event_id,
        |    lag(event_type) OVER w AS prev, row_number() OVER w AS rn
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |c AS (
        |  SELECT user_id, event_type, ts, event_id FROM o
        |  WHERE rn = 1 OR prev IS DISTINCT FROM event_type),
        |v AS (
        |  SELECT user_id, event_type, ts AS vf, lead(ts) OVER w2 AS vt,
        |    row_number() OVER w2 AS version
        |  FROM c WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT user_id, event_type,
        |  strftime(vf, '%Y-%m-%d %H:%M:%S.%f') AS valid_from,
        |  strftime(vt, '%Y-%m-%d %H:%M:%S.%f') AS valid_to,
        |  vt IS NULL AS is_current, CAST(version AS BIGINT) AS version
        |FROM v""".stripMargin,

    // scd2_chunked is output-identical to scd2_history by construction
    // (Scd2.fromLogChunked scaladoc) — same windowed mirror.
    "scd2_chunked" ->
      """WITH o AS (
        |  SELECT user_id, event_type, ts, event_id,
        |    lag(event_type) OVER w AS prev, row_number() OVER w AS rn
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |c AS (
        |  SELECT user_id, event_type, ts, event_id FROM o
        |  WHERE rn = 1 OR prev IS DISTINCT FROM event_type),
        |v AS (
        |  SELECT user_id, event_type, ts AS vf, lead(ts) OVER w2 AS vt,
        |    row_number() OVER w2 AS version
        |  FROM c WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT user_id, event_type,
        |  strftime(vf, '%Y-%m-%d %H:%M:%S.%f') AS valid_from,
        |  strftime(vt, '%Y-%m-%d %H:%M:%S.%f') AS valid_to,
        |  vt IS NULL AS is_current, CAST(version AS BIGINT) AS version
        |FROM v""".stripMargin,

    "windowed_counts" ->
      """SELECT
        |  strftime(time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)), '%Y-%m-%d %H:%M:%S')
        |    AS w_start,
        |  strftime(time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)) + INTERVAL '1 hour',
        |           '%Y-%m-%d %H:%M:%S') AS w_end,
        |  event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
        |FROM events GROUP BY 1, 2, 3""".stripMargin
  )
}
