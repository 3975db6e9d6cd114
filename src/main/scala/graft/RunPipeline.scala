package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession

/** CLI entry point for the daily incremental run — the piece an external
  * scheduler (cron/Airflow) invokes via `spark-submit`, replacing the
  * reference's DAG schedule (`embeddings-pipeline.py:89`, `0 8 * * *`):
  *
  * {{{
  *   spark-submit --class graft.RunPipeline <jar> \
  *     <sourcePath> <targetPath> <statePath> <stagingPath> \
  *     [--dims <sourcesConfigPath>] [--fallback '2024-01-01 00:00:00'] \
  *     [--merge-buckets 256] [--manifest-commit true] [--format json] \
  *     [--ivf-index <indexPath>] [--ivf-nlist 16] [--retries 3] \
  *     [--quality 'rule:sql_predicate;...'] [--quality-budgets 'rule=5;...']
  * }}}
  *
  * Master/executor sizing come from spark-submit; the session gets the
  * [[GraftConf]] scale profile. Exit code 0 only after merge + watermark
  * advance succeed (state is written last — the reference's
  * at-least-once + idempotent-merge ordering, `:480`).
  *
  * `--retries N` re-invokes the whole run up to N extra times on failure,
  * matching the reference's task-level retry posture (extract ×2, merge
  * ×3, `embeddings-pipeline.py:80-81,132,275`). Safe because the merge is
  * idempotent (UpsertSpec property) and watermarks advance only after a
  * successful merge — a retried run re-reads the same increment.
  */
object RunPipeline {
  def main(args: Array[String]): Unit = {
    require(args.length >= 4,
      "usage: RunPipeline <source> <target> <state> <staging> " +
        "[--dims p] [--fallback ts] [--merge-buckets n] [--format f] " +
        "[--retries n] [--stream ckptDir [--enrich spec] " +
        "[--cardinality-profile dir] [--quantile-profile dir] " +
        "[--freq-profile dir] [--daily-counts dir] " +
        "[--components dir] [--scd2 dir] " +
        "[--text-index dir [--text-index-col c] [--text-index-shards n]]]")
    val Array(source, target, state, staging) = args.take(4)
    val opts = args.drop(4).sliding(2, 2).collect {
      case Array(k, v) => k -> v
    }.toMap

    val spark = SparkSession.builder().appName("graft-pipeline").getOrCreate()
    GraftConf.applyScaleProfile(spark)
    try {
      // --stream <checkpointDir>: run the Structured-Streaming pipeline
      // (AvailableNow — drains what's there, then exits 0; a scheduler
      // invokes it exactly like the batch mode) instead of the batch run.
      // <state>/<staging> are unused: the engine checkpoint IS the state.
      opts.get("--stream").foreach { ckpt =>
        startStream(spark, source, target, ckpt, opts).awaitTermination()
        val n = graft.operators.Upsert.readTarget(spark, target).count()
        println(s"""{"streamed": true, "target_rows": $n}""")
        return
      }
      val conf = Pipeline.Config(
        sourcePath = source,
        targetPath = target,
        statePath = state,
        stagingPath = staging,
        sourcesConfigPath = opts.get("--dims"),
        fallbackDate = opts.get("--fallback").map(Timestamp.valueOf)
          .getOrElse(Timestamp.valueOf("2024-01-01 00:00:00")),
        mergeBuckets = opts.get("--merge-buckets").map(_.toInt).getOrElse(0),
        manifestCommit = opts.get("--manifest-commit").exists(_.toBoolean),
        sourceFormat = opts.getOrElse("--format", "parquet"),
        ivfIndexPath = opts.get("--ivf-index"),
        ivfNlist = opts.get("--ivf-nlist").map(_.toInt).getOrElse(16),
        hnswIndexPath = opts.get("--hnsw-index"),
        // --quality 'name:sqlPredicate;name2:pred2' — predicates parsed
        // with expr(), TRUE = violation; --quality-budgets 'name=5;...'
        qualityRules = opts.get("--quality").map(_.split(";").toSeq.map { r =>
          val Array(n, p) = r.split(":", 2)
          n -> org.apache.spark.sql.functions.expr(p)
        }).getOrElse(Nil),
        qualityBudgets = opts.get("--quality-budgets").map(_.split(";").map { b =>
          val Array(n, v) = b.split("=", 2)
          n -> v.toLong
        }.toMap).getOrElse(Map.empty))
      val stats = runWithRetries(spark, conf,
        opts.get("--retries").map(_.toInt).getOrElse(0))
      // one parseable summary line, mirroring the reference's run metrics
      // log (`embeddings-pipeline.py:420-432`)
      println(s"""{"records":${stats.recordsProcessed},""" +
        s""""unique":${stats.uniqueRecords},""" +
        s""""quarantined":${stats.quarantined},""" +
        s""""sources":${stats.sources},""" +
        s""""staged_files":${stats.stagedFiles},""" +
        s""""staged_bytes":${stats.stagedBytes}}""")
    } finally spark.stop()
  }

  /** Parse the `--enrich` flag (VERDICT r8 #7 — the streaming enrichment
    * stage was start()-only, unreachable from the CLI):
    * `dir;schemaDDL;key1,key2;rightTs[;lateness[;within[;joinType]]]`
    * mirroring `--quality`'s `;`-separated shape. Example:
    * `--enrich '/data/scores;main_refco STRING, ets TIMESTAMP, score
    * DOUBLE;main_refco;ets;10 minutes;1 hour'`. */
  private[graft] def parseEnrich(v: String)
      : graft.streaming.IncrementalStream.EnrichSpec = {
    val p = v.split(";").map(_.trim)
    require(p.length >= 4,
      "--enrich 'dir;schemaDDL;keys;rightTs[;lateness[;within[;joinType]]]'")
    graft.streaming.IncrementalStream.EnrichSpec(
      sourceDir = p(0),
      schema = org.apache.spark.sql.types.StructType.fromDDL(p(1)),
      keyCols = p(2).split(",").map(_.trim).toIndexedSeq,
      rightTs = p(3),
      lateness = if (p.length > 4) p(4) else "10 minutes",
      within = if (p.length > 5) p(5) else "1 hour",
      joinType = if (p.length > 6) p(6) else "left_outer")
  }

  /** The `--stream` mode: every streaming option of
    * [[graft.streaming.IncrementalStream.start]] mapped from CLI flags
    * (near-dup filter, persisted indexes, enrichment join). Factored out
    * of main so the e2e CLI test drives exactly this path. */
  private[graft] def startStream(spark: SparkSession, source: String,
      target: String, checkpoint: String, opts: Map[String, String])
      : org.apache.spark.sql.streaming.StreamingQuery =
    graft.streaming.IncrementalStream.start(spark, source, target, checkpoint,
      nearDupTextCol = opts.get("--neardup-text"),
      nearDupThreshold =
        opts.get("--neardup-threshold").map(_.toDouble).getOrElse(0.8),
      nearDupShingle = opts.get("--neardup-shingle").map(_.toInt).getOrElse(3),
      nearDupIndexPath = opts.get("--neardup-index"),
      ivfIndexPath = opts.get("--ivf-index"),
      ivfNlist = opts.get("--ivf-nlist").map(_.toInt).getOrElse(16),
      hnswIndexPath = opts.get("--hnsw-index"),
      enrich = opts.get("--enrich").map(parseEnrich),
      cardinalityProfilePath = opts.get("--cardinality-profile"),
      quantileProfilePath = opts.get("--quantile-profile"),
      freqProfilePath = opts.get("--freq-profile"),
      dailyCountsPath = opts.get("--daily-counts"),
      componentsPath = opts.get("--components"),
      scd2Path = opts.get("--scd2"),
      textIndexPath = opts.get("--text-index"),
      textIndexCol = opts.getOrElse("--text-index-col", "display_name"),
      textIndexShards = opts.get("--text-index-shards").map(_.toInt).getOrElse(16),
      mergeBuckets = opts.get("--merge-buckets").map(_.toInt),
      keepSnapshots = opts.get("--keep-snapshots").map(_.toInt).getOrElse(1),
      maxFilesPerTrigger = opts.get("--max-files-per-trigger").map(_.toInt))

  /** Run the pipeline, retrying the WHOLE run on failure up to `retries`
    * extra attempts. Each retry starts from the persisted state: the
    * watermarks of a failed run were never advanced, and a half-written
    * merge is invisible behind the snapshot/manifest pointer (the retry
    * simply re-merges); the bucketed dynamic-overwrite path detects torn
    * runs via `_merge_manifest` and is idempotently rewritten. */
  def runWithRetries(spark: SparkSession, conf: Pipeline.Config,
      retries: Int,
      runFn: (SparkSession, Pipeline.Config) => Pipeline.RunStats = Pipeline.run)
      : Pipeline.RunStats = {
    var attempt = 0
    var lastError: Throwable = null
    while (attempt <= retries) {
      try return runFn(spark, conf)
      catch {
        case scala.util.control.NonFatal(e) =>
          lastError = e
          attempt += 1
          if (attempt <= retries)
            System.err.println(
              s"[pipeline] attempt $attempt failed (${e.getMessage}); retrying")
      }
    }
    throw lastError
  }
}
