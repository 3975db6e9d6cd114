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
  def spread(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= target) df else df.repartition(target)
  }
}
