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
        "[--dims p] [--fallback ts] [--merge-buckets n] [--format f] [--retries n]")
    val Array(source, target, state, staging) = args.take(4)
    val opts = args.drop(4).sliding(2, 2).collect {
      case Array(k, v) => k -> v
    }.toMap

    val spark = SparkSession.builder().appName("graft-pipeline").getOrCreate()
    GraftConf.applyScaleProfile(spark)
    try {
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
