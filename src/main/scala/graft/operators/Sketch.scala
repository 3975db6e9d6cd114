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

  /** Count-Min point-frequency estimates (Cormode & Muthukrishnan 2005)
    * — the classic bounded-memory frequency sketch next to the persisted
    * HLL (cardinality), KLL (quantiles), and Misra–Gries (heavy hitters)
    * profiles. `depth × width` counters: row r's bucket for an item is
    * the portable `mix64(item || ":cm:" || r) mod width`, so every
    * counter is a deterministic integer and the DuckDB oracle replays
    * the sketch exactly (no probabilistic assumption enters the gate —
    * the ERROR of the estimate is what's measured, not assumed).
    *
    * Input: an exact `(itemCol, cntCol)` frequency table (e.g.
    * `Bpe.wordFrequencies`); output: one row per item with its exact
    * count, the sketch estimate (min over rows of the item's counter),
    * and the overestimate. CM guarantees `estimate ≥ exact` always, and
    * `estimate ≤ exact + ε·N` w.h.p. at width ≈ e/ε — the harness
    * surfaces the measured overestimate per item the way
    * `lsh_calibration` surfaces bucket occupancy.
    *
    * Scale shape: ONE pass over the (bounded) frequency table exploded
    * ×depth, map-side-combined into the depth·width counter table (the
    * exchange carries ≤ depth·width rows per map partition), counters
    * broadcast back, min per item. Counters are pure sums, so sketches
    * merge by addition — the same mergeability contract the profile
    * family rides. */
  def countMinEstimates(freqs: DataFrame, itemCol: String, cntCol: String,
      depth: Int = 4, width: Int = 256): DataFrame = {
    require(depth >= 1 && width >= 1, s"bad sketch shape: $depth x $width")
    // pin the exploded rows: they feed BOTH the counter aggregate and the
    // probe join — unpinned, the upstream frequency table (a corpus-linear
    // scan for cm_estimate) would be computed twice (ADVICE r14)
    val rows = Ckpt.pin(freqs
      .select(col(itemCol).as("item"), col(cntCol).cast("long").as("exact_cnt"))
      .select(col("item"), col("exact_cnt"),
        explode(sequence(lit(0), lit(depth - 1))).as("r"))
      .withColumn("b", pmod(
        graft.functions.F.mix64(
          concat(col("item"), lit(":cm:"), col("r").cast("string"))),
        lit(width.toLong))))
    val counters = rows.groupBy("r", "b").agg(sum("exact_cnt").as("c"))
    rows.join(broadcast(counters), Seq("r", "b"))
      .groupBy("item", "exact_cnt")
      .agg(min("c").as("cm_estimate"))
      .select(col("item"), col("exact_cnt"), col("cm_estimate"),
        (col("cm_estimate") - col("exact_cnt")).as("overestimate"))
  }
}
