package graft.operators

import org.apache.spark.sql.DataFrame

/** Parallelism guard for CPU-heavy map-side operators. */
private[graft] object Par {

  /** Round-robin the rows across the cluster's cores when the input plan
    * has fewer partitions than `defaultParallelism`.
    *
    * A staged incremental batch often arrives as ONE small parquet file —
    * one input split — while signature/shingle computation is minutes of
    * CPU: without this, the whole job serializes on a single core. The
    * repartition only fires when the scan is narrower than the cluster
    * (by definition the data is small in that case — a 100 TB input has
    * ~10^6 splits and passes through untouched), so the extra shuffle
    * moves at most a few partitions' worth of rows.
    */
  /** Split estimation is pure driver-side metadata — file count plus
    * catalog size over `maxPartitionBytes` — NOT `df.rdd.getNumPartitions`,
    * which would force a physical-plan conversion (and bypass AQE) at
    * plan-construction time. Non-file-backed plans (in-memory relations,
    * post-shuffle stages) pass through: their parallelism follows
    * `spark.sql.shuffle.partitions` already. */
  def spread(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val target = spark.sparkContext.defaultParallelism
    val files = df.inputFiles.length
    if (files == 0) return df
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val maxPart = BigInt(spark.sessionState.conf.filesMaxPartitionBytes).max(BigInt(1))
    val estSplits = BigInt(files).max(bytes / maxPart)
    if (estSplits >= target) df else df.repartition(target)
  }
}
