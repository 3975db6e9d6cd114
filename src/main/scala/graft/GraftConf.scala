package graft

import org.apache.spark.sql.SparkSession

/** Recommended session configuration for the 100 TB deployment profile.
  *
  * Every entry is a runtime (non-static) SQL conf, so the helper works on
  * a builder or a live session. Values encode the engine's scale
  * assumptions; override per job where measurements say otherwise.
  */
object GraftConf {

  val scaleDefaults: Map[String, String] = Map(
    // AQE re-plans with runtime statistics: coalesces tiny post-shuffle
    // partitions, converts to broadcast when a side turns out small, and
    // splits skewed partitions — the backstop for the power-law keys the
    // dedup/sessionize operators shuffle on.
    "spark.sql.adaptive.enabled" -> "true",
    "spark.sql.adaptive.skewJoin.enabled" -> "true",
    "spark.sql.adaptive.coalescePartitions.enabled" -> "true",
    // 128 MB scan splits keep a 100 TB table at ~800k tasks — large enough
    // to amortize task overhead, small enough that one split's rows +
    // shuffle state fit executor memory comfortably.
    "spark.sql.files.maxPartitionBytes" -> (128L * 1024 * 1024).toString,
    // Dynamic partition overwrite: partitioned sinks (the hash-bucketed
    // merge target) replace only written partitions.
    "spark.sql.sources.partitionOverwriteMode" -> "dynamic",
    // Parquet writers: snappy matches the reference's staging compression
    // (embeddings-pipeline.py:255).
    "spark.sql.parquet.compression.codec" -> "snappy",
    // Storage-partitioned joins (round 17): DSv2 scans reporting
    // KeyGroupedPartitioning (the graft connector's hash-bucket layout)
    // join co-partitioned tables with ZERO exchange; pushPartValues
    // aligns sides whose bucket populations differ (empty buckets).
    // Only graft scans report a partitioning, so the flags are inert for
    // every other relation in the plan.
    "spark.sql.sources.v2.bucketing.enabled" -> "true",
    "spark.sql.sources.v2.bucketing.pushPartValues.enabled" -> "true",
    // Runtime bloom-filter join pruning: a selective dimension-side
    // predicate (merge batch ⋈ huge target, probe ⋈ cell table) injects a
    // bloom filter into the fact-side SCAN, skipping row groups whose
    // join keys can't match — the runtime companion to static partition
    // pruning, and exactly the shape of this engine's batch-vs-corpus
    // joins.
    "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true")

  /** V2 parquet reader experiment (SURVEY §7.6.4): the V2 scan supports
    * MIN/MAX/COUNT aggregate pushdown into parquet footers — free scan
    * speed for count/distinct-shaped queries at 100 TB. Flipping
    * `useV1SourceList` is an engine-wide plan-shape change, so it ships
    * behind this env toggle until a full plan diff signs it off.
    * Gated confs: V2 for parquet reads + footer aggregate pushdown. */
  val v2ParquetExperiment: Map[String, String] = Map(
    "spark.sql.sources.useV1SourceList" ->
      "avro,csv,json,kafka,orc,text", // everything BUT parquet stays V1
    "spark.sql.parquet.aggregatePushdown" -> "true")

  /** Apply [[v2ParquetExperiment]] when `SPARK_GRAFT_V2_PARQUET=1`. */
  def applyV2ExperimentIfRequested(spark: SparkSession): Unit =
    if (sys.env.get("SPARK_GRAFT_V2_PARQUET").contains("1"))
      v2ParquetExperiment.foreach { case (k, v) => spark.conf.set(k, v) }

  /** Shuffle partition count sized to the cluster: ~2 waves per shuffle
    * keeps stragglers bounded without drowning the scheduler. */
  def shufflePartitionsFor(totalCores: Int): Int = math.max(1, totalCores * 2)

  /** Apply the scale profile to a live session (runtime confs only). */
  def applyScaleProfile(spark: SparkSession): Unit = {
    scaleDefaults.foreach { case (k, v) => spark.conf.set(k, v) }
    spark.conf.set("spark.sql.shuffle.partitions",
      shufflePartitionsFor(spark.sparkContext.defaultParallelism))
  }
}
