package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic bottom-k sampling sketch — the quantile member of the
  * approximate-aggregate family (`SketchSpec` covers the HLL / count-min /
  * Bloom built-ins). The k rows with the smallest [[Sampling.knuthRank]]
  * are a uniform row sample that is
  *
  *  - '''one-pass, bounded''': `TakeOrderedAndProject` keeps k rows per
  *    partition and merges — no shuffle of the corpus, O(k) memory;
  *  - '''mergeable''': bottom-k of a union = bottom-k of the parts'
  *    bottom-k's (ranks are a fixed total order — exact associativity,
  *    not an error bound), so per-shard sketches combine losslessly;
  *  - '''deterministic''': same seed → same sample → same estimates, in
  *    any engine (the rank is exact integer arithmetic), which is what
  *    makes an EXACT differential oracle possible for an approximate
  *    sketch — the oracle mirrors the sample, not just the bound.
  *
  * Rank-space error for quantiles from a k-sample is O(n/√k) w.h.p. —
  * the classical bound the accuracy spec checks.
  */
object Sketch {

  /** The k rows with the smallest seeded Knuth rank of `idCol` (ties
    * broken by id) — a uniform, mergeable, deterministic row sample. */
  def bottomK(df: DataFrame, idCol: String, k: Int, seed: Long = 0L): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    df.withColumn("__rank", Sampling.knuthRank(col(idCol), seed))
      .orderBy(col("__rank"), col(idCol)).limit(k)
      .drop("__rank")
  }

  /** Percentile estimates (`qs` in percent) of an integer metric from a
    * bottom-k sample: one output row, one `p<q>` column per requested
    * percentile, value = the sample's `1 + ⌊q·(cnt−1)/100⌋`-th smallest
    * (nearest-rank, integer-exact). The in-sample window runs over k rows
    * — driver-scale — after the bounded one-pass sample of the corpus. */
  def bottomKQuantiles(df: DataFrame, idCol: String, value: Column, k: Int,
      qs: Seq[Int], seed: Long = 0L): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q >= 0 && q <= 100),
      s"percentiles must be in [0,100], got $qs")
    val s = bottomK(
      df.select(col(idCol).as("__id"), value.cast("long").as("__v")),
      "__id", k, seed)
    val ranked = s
      .withColumn("__i", row_number().over(Window.orderBy(col("__v"), col("__id"))))
      .withColumn("__cnt", count(lit(1)).over(Window.partitionBy(lit(1))))
    ranked.agg(quantileAgg(qs.head), qs.tail.map(quantileAgg): _*)
  }

  private def quantileAgg(q: Int): Column =
    max(when(col("__i") === expr(s"1 + (($q * (__cnt - 1)) div 100)"),
      col("__v"))).as(s"p$q")
}
