package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.Ckpt.PinOps

/** Data-quality gates (Deequ-style, reduced to the single-pass shape a
  * 100 TB ingest wants): declare named violation predicates, get back one
  * report row per rule with exact violation counts — the go/no-go input
  * for promoting a batch into the merge target.
  *
  * Scale shape: every rule is evaluated in the SAME scan — rows explode
  * to (rule, 0|1) markers (|rules| per row, slim structs) and a map-side
  * partially-aggregated groupBy(rule) sums them, so the exchange carries
  * |rules| rows per map partition regardless of corpus size. NULL
  * predicate results count as non-violations (match SQL WHERE semantics;
  * write an explicit `isNull` rule to gate nulls).
  */
object Validate {

  /** Report: (rule, n_rows, n_violations, violation_permille), one row
    * per rule; permille in integer arithmetic. */
  def report(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "need at least one rule")
    require(rules.map(_._1).distinct.size == rules.size, "rule names must be unique")
    val marked = df.select(explode(array(rules.map { case (name, pred) =>
      struct(lit(name).as("rule"),
        when(coalesce(pred, lit(false)), 1L).otherwise(0L).as("v"))
    }: _*)).as("r"))
    marked.groupBy(col("r.rule").as("rule"))
      .agg(count(lit(1)).as("n_rows"), sum(col("r.v")).as("n_violations"))
      .withColumn("violation_permille",
        expr("n_violations * 1000 div n_rows"))
  }

  /** Distribution-DRIFT report between two slices of the same frame
    * (reference vs current — the train/serve-skew and
    * yesterday-vs-today monitor a continuously-ingesting pipeline runs
    * next to [[report]]'s per-row gates): per key, the total-variation
    * distance between the two slices' `valueCol` histograms over
    * `nBins` fixed-width bins on `[lo, hi)` (outliers clamp into the
    * edge bins).
    *
    * TV rather than PSI/KL on purpose: those need `ln`, whose last-bit
    * rounding is libm-dependent and would break the exact differential
    * oracle. TV = ½·Σ|p̂ᵢ−q̂ᵢ| carries the same decision signal
    * (PSI-style alerts just re-threshold), and here it is computed in
    * EXACT integer arithmetic — Σ|pᵢ·Nq − qᵢ·Np| over raw counts — with
    * one final division of exact integers, so every engine rounds the
    * one double identically. TV = 0 ⇔ identical histograms, 1 ⇔
    * disjoint; keys with an empty slice report null.
    *
    * Scale shape: one scan (both slices in the same pass — `sliceCol`
    * tags rows, no second read), one map-side-combined shuffle on
    * (key, bin) bounded by |keys|·nBins, then a key-level window over
    * nBins-row groups. Nothing scales with the corpus but the scan.
    * The cross-product `pᵢ·Nq` stays inside a long while both slice
    * counts per key are ≤ ~2·10⁹; past that, widen the `p*nq − q*np`
    * terms to decimal(38,0) (same plan, wider integers). */
  def driftTv(df: DataFrame, keyCol: String, valueCol: String,
      currentSlice: Column, lo: Double, hi: Double, nBins: Int): DataFrame = {
    require(nBins > 0 && hi > lo, s"need hi > lo and nBins > 0")
    val width = (hi - lo) / nBins
    val bin = least(greatest(floor((col(valueCol) - lit(lo)) / lit(width)),
      lit(0.0)), lit((nBins - 1).toDouble)).cast("long")
    // Null values are EXCLUDED (they'd otherwise form their own silent
    // (key, null) bin and count toward np/nq); out-of-range values clamp
    // to the edge bins per the docstring.
    val counts = df
      .where(col(valueCol).isNotNull)
      .select(col(keyCol).as("key"), bin.as("__bin"),
        currentSlice.cast("boolean").as("__cur"))
      .groupBy("key", "__bin")
      .agg(sum(when(col("__cur"), 1L).otherwise(0L)).as("p"),
        sum(when(!col("__cur"), 1L).otherwise(0L)).as("q"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("key")
    counts
      .withColumn("np", sum("p").over(w))
      .withColumn("nq", sum("q").over(w))
      .groupBy("key", "np", "nq")
      .agg(sum(abs(col("p") * col("nq") - col("q") * col("np"))).as("num"))
      .select(col("key"), col("np").as("n_cur"), col("nq").as("n_ref"),
        when(col("np") > 0 && col("nq") > 0,
          col("num").cast("double") /
            (lit(2.0) * col("np") * col("nq"))).as("tv"))
  }

  /** Distinct-value ceiling for the KS/rank-sum/median monitors'
    * histograms (2^18). Every registered domain (doc lengths ~530
    * distinct, cent amounts ~56k span) sits far below it, so the guard
    * is the identity there; a caller passing an unbounded domain (ids,
    * raw timestamps) gets deterministic fixed-width coarsening instead
    * of a single-partition window over millions of rows. */
  val DefaultMaxBins: Int = 1 << 18

  /** Domain guard shared by the value-distribution monitors: re-bin a
    * `(keys…, __v, __counts…)` histogram so the distinct-`__v` table
    * holds ≤ `maxBins` values. Width = ceil(span / maxBins) from a
    * broadcast one-row min/max aggregate over the histogram (lazy — the
    * repo's alternative to a plan-time driver action); when the domain
    * span already fits, width is 1 and the rebin is the IDENTITY — every
    * registered monitor keeps bit-identical results and its oracle needs
    * no mirror. Wider domains coarsen values to their bin floor
    * deterministically: the monitor reports the exact statistic of the
    * binned distribution (a bounded-by-construction guard in the
    * [[driftTv]] spirit, replacing the round-12 scaladoc caveat). All
    * span arithmetic widens through DECIMAL(38,0) so Long.MIN/MAX
    * domains can't overflow (ANSI mode would throw, not wrap). */
  private[operators] def boundedHistogram(h: DataFrame, maxBins: Int): DataFrame = {
    require(maxBins > 1, "maxBins must be > 1")
    val keyCols = h.columns.filter(c => c != "__v" && !c.startsWith("__"))
    val countCols = h.columns.filter(c => c != "__v" && c.startsWith("__"))
    val rng = h.agg(min("__v").as("__lo"), max("__v").as("__hi"))
    val sums = countCols.map(c => sum(col(c)).as(c))
    h.crossJoin(broadcast(rng))
      .withColumn("__w", expr(
        s"CAST((CAST(__hi AS DECIMAL(38,0)) - __lo + $maxBins) div $maxBins AS BIGINT)"))
      .withColumn("__vb", expr(
        "CAST(CAST(__lo AS DECIMAL(38,0)) + " +
          "CAST((CAST(__v AS DECIMAL(38,0)) - __lo) div __w AS DECIMAL(38,0))" +
          " * __w AS BIGINT)"))
      .groupBy((keyCols :+ "__vb").map(col): _*)
      .agg(sums.head, sums.tail: _*)
      .withColumnRenamed("__vb", "__v")
  }

  /** Exact two-sample Kolmogorov–Smirnov distance of each key's integral
    * `valueCol` distribution against the WHOLE corpus — "which source's
    * length/score distribution deviates most", the shape-sensitive drift
    * gate next to [[driftTv]] (TV reads bin-mass differences; KS reads
    * the worst CDF gap, so it catches location/scale shifts TV dilutes
    * across bins, and needs no binning choice for integral values).
    *
    * Exactness: `D = max_x |F_key(x) − F_corpus(x)|` is reported as
    * `ks_permille = max|cum_k·N − cum_g·n_k|·1000 div (n_k·N)` — one
    * floor-division of exact non-negative integers (products in
    * DECIMAL(38,0): `cum·N` overflows long past ~3·10⁹ rows).
    *
    * The sup needs no dense grid: both step CDFs change only at corpus
    * value points and the key's points are a subset, so per key-point
    * row two candidates cover every x — the gap AT the point
    * (`|cum_k·N − cum_g·n_k|`) and the gap on the open segment BEFORE it
    * (`|prev_cum_k·N − (cum_g − gc)·n_k|`, prev = cum − c, 0 for the
    * first row); after the key's last point both CDFs head to 1 and the
    * gap only shrinks from candidate (a). Keys holding the whole corpus
    * read 0 by construction.
    *
    * Scale shape: one scan → one map-side-combined (key, value)
    * histogram; the global CDF is a window over the DISTINCT-value
    * table, which [[boundedHistogram]] guarantees holds ≤ `maxBins`
    * rows REGARDLESS of the value domain (wide domains auto-coarsen to
    * fixed-width bins; spans ≤ maxBins — every registered domain — pass
    * through bit-identically); the per-key CDF windows run over each
    * key's histogram rows, bounded the same way. Nothing scales with
    * the corpus but the scan. */
  def ksVsCorpus(df: DataFrame, keyCol: String, value: Column,
      maxBins: Int = DefaultMaxBins): DataFrame = {
    // The histogram feeds THREE consumers (global CDF, corpus total,
    // the per-key join) — localCheckpoint pins the corpus scan to ONE
    // execution (the Cooccur precedent; without it the plan audit read
    // 3 parquet scans, zero ReusedExchange)
    val h0 = df.where(value.isNotNull)
      .select(col(keyCol).as("key"), value.cast("long").as("__v"))
      .groupBy("key", "__v").agg(count(lit(1)).as("__c"))
      .pin()
    val h = boundedHistogram(h0, maxBins).pin()
    // bounded: one row per distinct value in the corpus
    val g = h.groupBy("__v").agg(sum("__c").as("__gc"))
    val wg = org.apache.spark.sql.expressions.Window.orderBy("__v")
    val gcum = g.withColumn("__gcum", sum("__gc").over(wg))
    val wk = org.apache.spark.sql.expressions.Window
      .partitionBy("key").orderBy("__v")
    val wkAll = org.apache.spark.sql.expressions.Window.partitionBy("key")
    // corpus total rides as a broadcast one-row aggregate (the repo's
    // lazy alternative to a plan-time driver action)
    val nTot = h.agg(sum("__c").as("__n"))
    h.join(gcum, Seq("__v"))
      .crossJoin(broadcast(nTot))
      .withColumn("__cum", sum("__c").over(wk))
      .withColumn("__nk", sum("__c").over(wkAll))
      .withColumn("__at", abs(
        col("__cum").cast("decimal(38,0)") * col("__n") -
          col("__gcum").cast("decimal(38,0)") * col("__nk")))
      .withColumn("__before", abs(
        (col("__cum") - col("__c")).cast("decimal(38,0)") * col("__n") -
          (col("__gcum") - col("__gc")).cast("decimal(38,0)") * col("__nk")))
      .groupBy("key")
      .agg(max("__nk").as("n_rows"), max("__n").as("__ntot"),
        max(greatest(col("__at"), col("__before"))).as("__d"))
      .withColumn("ks_permille", expr(
        "CAST(__d * 1000 div (CAST(n_rows AS DECIMAL(38,0)) * __ntot) AS BIGINT)"))
      .select("key", "n_rows", "ks_permille")
  }

  /** Exact two-sample KS distance between two SLICES of the same frame
    * per key (current vs reference — [[driftTv]]'s slice contract with
    * [[ksVsCorpus]]'s exactness): `D = sup|F_cur − F_ref|` in integer
    * permille, the binning-free "did this week's value distribution
    * shift" monitor. Every step point of either CDF is a point of the
    * per-key UNION histogram, and on the open segment between union
    * points both CDFs are constant — so the at-point gap
    * `|cumA·nB − cumB·nA|` and the before-point gap over left limits
    * (`cum − mass-at-point`, 0 for a slice absent at that value) cover
    * the sup exactly. Products in DECIMAL(38,0); keys with an empty
    * slice report NULL (no distribution to compare).
    *
    * Scale shape: ONE scan tags both slices (no second read), one
    * map-side-combined (key, value) histogram carrying both slices'
    * counts, per-key cum windows over histogram-sized partitions, one
    * rollup. For unbounded value domains pre-bin first (the driftTv
    * treatment). */
  /** The shared first stage of the two-slice monitors ([[ksTwoSlice]],
    * [[rankSumAuc]], [[medianShift]]): ONE scan tags both slices, one
    * map-side-combined (key, value) histogram carries both slices'
    * counts (`__ca`/`__cb`), then the [[boundedHistogram]] domain guard
    * caps distinct values at `maxBins` (identity for every registered
    * domain). Null values and null slice tags are excluded. The raw
    * histogram is localCheckpointed (the [[ksVsCorpus]] discipline): the
    * guard's broadcast min/max aggregate is a second consumer, and
    * without the pin each monitor re-scanned the corpus once per
    * consumer (measured: 4 parquet scans, zero ReusedExchange — AQE did
    * not dedupe the shared subtree). */
  /** Public since round 18 so the three monitor consumers can build the
    * histogram ONCE and pass it to the `*FromHistogram` variants — the
    * registered ks_value_shift / ranksum_shift / median_shift entries
    * run over the identical (df, key, value, slice) arguments, and each
    * building its own pinned histogram tripled the corpus scans across
    * the family. */
  def twoSliceHistogram(df: DataFrame, keyCol: String,
      value: Column, currentSlice: Column,
      maxBins: Int = DefaultMaxBins): DataFrame =
    // one copy of the pre-pin stage (ADVICE r18): the bench fingerprints
    // [[twoSliceHistogramFrame]], so histogram and fingerprint cannot drift
    boundedHistogram(
      twoSliceHistogramFrame(df, keyCol, value, currentSlice).pin(), maxBins)

  /** The lazily-constructible pre-pin stage of [[twoSliceHistogram]] —
    * what the bench fingerprints for the shared build (the pin runs
    * jobs at construction; this frame does not). */
  def twoSliceHistogramFrame(df: DataFrame, keyCol: String,
      value: Column, currentSlice: Column): DataFrame =
    df.where(value.isNotNull)
      .select(col(keyCol).as("key"), value.cast("long").as("__v"),
        currentSlice.cast("boolean").as("__cur"))
      .where(col("__cur").isNotNull)
      .groupBy("key", "__v")
      .agg(sum(when(col("__cur"), 1L).otherwise(0L)).as("__ca"),
        sum(when(!col("__cur"), 1L).otherwise(0L)).as("__cb"))

  /** [[twoSliceHistogram]] where "current" is the final `windowDays`-day
    * window ending at the maximum observed `day` — with the anchor FOLDED
    * INTO the histogram pass (r19, VERDICT r18 #3). The naive wiring
    * (compute max(day) over the frame, tag rows, histogram) scans the
    * corpus twice: once for the anchor aggregate, once for the
    * histogram. This variant aggregates ONE (key, value, day) histogram
    * — bounded by (distinct key-values) × (distinct days), still
    * histogram-sized — and derives both the anchor max and the two-slice
    * collapse from that tiny pinned table: one corpus scan for the whole
    * value-shift monitor family. Exact: summing per-day counts inside /
    * outside the window equals tagging rows first, and rows with a null
    * `day` are excluded exactly as the null-slice-tag filter excluded
    * them. */
  def twoSliceHistogramByDay(df: DataFrame, keyCol: String, value: Column,
      day: Column, windowDays: Int = 7,
      maxBins: Int = DefaultMaxBins): DataFrame = {
    require(windowDays >= 1, "windowDays must be >= 1")
    // the anchor max rides the day-histogram's own pin job (the kCore
    // Observation pattern — unnamed Observation, so repeated builds in
    // one session never collide), and the window cut is then a LITERAL:
    // the collapse and the boundedHistogram guard are lazy tiny
    // aggregates over the pinned day histogram — no anchor scan, no
    // second pin, no broadcast
    val obs = org.apache.spark.sql.Observation()
    val dayHist = twoSliceHistogramByDayFrame(df, keyCol, value, day,
        windowDays)
      .observe(obs, max(col("__day")).as("m"))
      .pin()
    val cut = (obs.get("m") match {
      case d: Long => d
      case _ => 0L // empty frame: any cut collapses an empty histogram
    }) - (windowDays - 1)
    // the collapsed (key, value) histogram is pinned like
    // [[twoSliceHistogram]]'s: the three monitor consumers reference the
    // shared histogram several times each (cur/ref CDF windows, rollups)
    // and must read a flat scan, not re-run the day collapse per
    // reference — this pin is a cheap job over the pinned day histogram,
    // never a corpus scan
    boundedHistogram(
      dayHist.groupBy("key", "__v")
        .agg(
          sum(when(col("__day") >= cut, col("__n")).otherwise(0L)).as("__ca"),
          sum(when(col("__day") < cut, col("__n")).otherwise(0L)).as("__cb"))
        .pin(),
      maxBins)
  }

  /** The lazily-constructible corpus-facing stage of
    * [[twoSliceHistogramByDay]] — the bench-fingerprint frame for
    * shared builds using the day-folded anchor. */
  def twoSliceHistogramByDayFrame(df: DataFrame, keyCol: String,
      value: Column, day: Column, windowDays: Int): DataFrame =
    df.where(value.isNotNull)
      .select(col(keyCol).as("key"), value.cast("long").as("__v"),
        day.cast("long").as("__day"))
      .where(col("__day").isNotNull)
      .groupBy("key", "__v", "__day")
      .agg(count(lit(1)).as("__n"))

  def ksTwoSlice(df: DataFrame, keyCol: String, value: Column,
      currentSlice: Column, maxBins: Int = DefaultMaxBins): DataFrame =
    ksTwoSliceFromHistogram(
      twoSliceHistogram(df, keyCol, value, currentSlice, maxBins))

  /** [[ksTwoSlice]] over a prebuilt [[twoSliceHistogram]]. */
  def ksTwoSliceFromHistogram(histogram: DataFrame): DataFrame = {
    val h = histogram
    val wk = org.apache.spark.sql.expressions.Window
      .partitionBy("key").orderBy("__v")
    val wkAll = org.apache.spark.sql.expressions.Window.partitionBy("key")
    h
      .withColumn("__cuma", sum("__ca").over(wk))
      .withColumn("__cumb", sum("__cb").over(wk))
      .withColumn("__na", sum("__ca").over(wkAll))
      .withColumn("__nb", sum("__cb").over(wkAll))
      .withColumn("__at", abs(
        col("__cuma").cast("decimal(38,0)") * col("__nb") -
          col("__cumb").cast("decimal(38,0)") * col("__na")))
      .withColumn("__before", abs(
        (col("__cuma") - col("__ca")).cast("decimal(38,0)") * col("__nb") -
          (col("__cumb") - col("__cb")).cast("decimal(38,0)") * col("__na")))
      .groupBy("key")
      .agg(max("__na").as("n_cur"), max("__nb").as("n_ref"),
        max(greatest(col("__at"), col("__before"))).as("__d"))
      .withColumn("ks_permille", expr(
        "CASE WHEN n_cur > 0 AND n_ref > 0 THEN " +
          "CAST(__d * 1000 div (CAST(n_cur AS DECIMAL(38,0)) * n_ref) " +
          "AS BIGINT) END"))
      .select("key", "n_cur", "n_ref", "ks_permille")
  }

  /** Exact Mann–Whitney U as the common-language effect size per key —
    * the DIRECTION companion to [[ksTwoSlice]]'s magnitude: `auc_permille
    * = P(random current value > random reference value) + ½·P(tie)`, in
    * integer permille (500 = no shift, >500 = current runs higher). The
    * probability is computed over the SAME one-scan two-slice histogram
    * as the KS: for each current value, reference mass strictly below
    * counts twice and tied mass once —
    * `U₂ = Σ_v ca(v)·(2·(cumb(v) − cb(v)) + cb(v))`, and
    * `auc_permille = U₂·1000 div (2·na·nb)` — one floor-division of
    * exact non-negative integers (products in DECIMAL(38,0)). This IS
    * the Wilcoxon rank-sum statistic with midrank tie handling, and
    * numerically equals ROC-AUC of "is current" against the value.
    * Keys with an empty slice report NULL.
    *
    * Scale shape: identical to [[ksTwoSlice]] — one tagged scan, one
    * map-side-combined (key, value) histogram, per-key cum windows over
    * histogram-sized partitions, one rollup. */
  def rankSumAuc(df: DataFrame, keyCol: String, value: Column,
      currentSlice: Column, maxBins: Int = DefaultMaxBins): DataFrame =
    rankSumAucFromHistogram(
      twoSliceHistogram(df, keyCol, value, currentSlice, maxBins))

  /** [[rankSumAuc]] over a prebuilt [[twoSliceHistogram]]. */
  def rankSumAucFromHistogram(histogram: DataFrame): DataFrame = {
    val h = histogram
    val wk = org.apache.spark.sql.expressions.Window
      .partitionBy("key").orderBy("__v")
    val wkAll = org.apache.spark.sql.expressions.Window.partitionBy("key")
    h
      .withColumn("__cumb", sum("__cb").over(wk))
      .withColumn("__na", sum("__ca").over(wkAll))
      .withColumn("__nb", sum("__cb").over(wkAll))
      .withColumn("__u2", col("__ca").cast("decimal(38,0)") *
        (lit(2) * (col("__cumb") - col("__cb")) + col("__cb")))
      .groupBy("key")
      .agg(max("__na").as("n_cur"), max("__nb").as("n_ref"),
        sum("__u2").as("__u2s"))
      .withColumn("auc_permille", expr(
        "CASE WHEN n_cur > 0 AND n_ref > 0 THEN " +
          "CAST(__u2s * 1000 div (CAST(2 AS DECIMAL(38,0)) * n_cur * n_ref) " +
          "AS BIGINT) END"))
      .select("key", "n_cur", "n_ref", "auc_permille")
  }

  /** Exact per-slice medians and their difference — the VALUE-UNIT
    * magnitude read-out next to [[ksTwoSlice]]'s scale-free distance and
    * [[rankSumAuc]]'s direction probability: "the median moved by X
    * cents" is the number a human acts on. Lower-median convention
    * (rank `(n+1) div 2` — the [[Anomaly]] discipline: no averaging, so
    * integral values stay integral and the oracle mirrors exactly);
    * empty slices report NULL median and NULL shift.
    *
    * Scale shape: the shared [[twoSliceHistogram]] (one tagged scan, one
    * map-side-combined (key, value) histogram), per-key cum windows over
    * histogram-sized partitions, one conditional-min rollup. */
  def medianShift(df: DataFrame, keyCol: String, value: Column,
      currentSlice: Column, maxBins: Int = DefaultMaxBins): DataFrame =
    medianShiftFromHistogram(
      twoSliceHistogram(df, keyCol, value, currentSlice, maxBins))

  /** [[medianShift]] over a prebuilt [[twoSliceHistogram]]. */
  def medianShiftFromHistogram(histogram: DataFrame): DataFrame = {
    val h = histogram
    val wk = org.apache.spark.sql.expressions.Window
      .partitionBy("key").orderBy("__v")
    val wkAll = org.apache.spark.sql.expressions.Window.partitionBy("key")
    h
      .withColumn("__cuma", sum("__ca").over(wk))
      .withColumn("__cumb", sum("__cb").over(wk))
      .withColumn("__na", sum("__ca").over(wkAll))
      .withColumn("__nb", sum("__cb").over(wkAll))
      .groupBy("key")
      .agg(max("__na").as("n_cur"), max("__nb").as("n_ref"),
        min(when(col("__cuma") >= expr("(__na + 1) div 2") &&
          col("__na") > 0, col("__v"))).as("p50_cur"),
        min(when(col("__cumb") >= expr("(__nb + 1) div 2") &&
          col("__nb") > 0, col("__v"))).as("p50_ref"))
      .withColumn("median_shift",
        when(col("p50_cur").isNotNull && col("p50_ref").isNotNull,
          col("p50_cur") - col("p50_ref")))
  }

  /** Classifier calibration / reliability report in exact integers —
    * "when the model says 800‰ confident, is it right 800‰ of the
    * time": rows bucket into `nBins` equal-width confidence bins
    * (permille confidence, out-of-range clamps to the edge bins), each
    * bin reports exact count / correct-count / accuracy / mean stated
    * confidence, and every row carries the expected calibration error
    * `ece_milli = Σ_b |1000·correct_b − Σconf_b| div N` — the standard
    * ECE, but accumulated as exact integer milli-row gaps BEFORE the one
    * final floor-division (per-bin `|acc−conf|` would floor twice and
    * drift off any SQL mirror). The gate a curation pipeline runs before
    * trusting a quality/language classifier's scores as sampling
    * weights: high ECE means the scores are rankings, not
    * probabilities. Null confidence/correctness rows are excluded;
    * empty bins are absent (their gap is 0 by definition). Sums widen
    * through DECIMAL(38,0) (the census-tier overflow discipline).
    *
    * Scale shape: one scan → one map-side-combined ≤nBins-key aggregate
    * → a broadcast one-row ECE join. Nothing scales with the corpus but
    * the scan. */
  def calibrationReport(df: DataFrame, conf: Column, correct: Column,
      nBins: Int = 10): DataFrame = {
    require(nBins >= 2, "need at least 2 bins")
    val perBin = df
      .select(conf.cast("long").as("__c"), correct.cast("boolean").as("__ok"))
      .where(col("__c").isNotNull && col("__ok").isNotNull)
      .withColumn("__bin", expr(
        s"greatest(least(__c * $nBins div 1000, ${nBins - 1}), 0)"))
      .groupBy("__bin")
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("__ok"), 1L).otherwise(0L)).as("n_correct"),
        sum(col("__c").cast("decimal(38,0)")).as("__sconf"))
    val ece = perBin.agg(expr(
      "CAST(sum(abs(CAST(n_correct AS DECIMAL(38,0)) * 1000 - __sconf))" +
        " div sum(n_rows) AS BIGINT)").as("ece_milli"))
    perBin
      .withColumn("acc_permille", expr(
        "CAST(CAST(n_correct AS DECIMAL(38,0)) * 1000 div n_rows AS BIGINT)"))
      .withColumn("conf_permille",
        expr("CAST(__sconf div n_rows AS BIGINT)"))
      .crossJoin(broadcast(ece))
      .select(col("__bin").as("bin"), col("n_rows"), col("n_correct"),
        col("acc_permille"), col("conf_permille"), col("ece_milli"))
  }

  /** Benford's-law first-digit permille, `P(d) = log₁₀(1 + 1/d)·1000`
    * rounded to integers (they sum to 1001 — the usual rounding artifact;
    * kept as the published constants rather than re-normalized). */
  val BenfordPermille: Seq[Long] =
    Seq(301L, 176L, 125L, 97L, 79L, 67L, 58L, 51L, 46L)

  /** Benford first-digit audit over a positive amount column — the
    * classic fabricated-/synthetic-data smell test a pipeline runs over
    * monetary and count-like fields before trusting a new source. Each
    * value's first significant digit comes from its exact cent
    * representation (`DECIMAL(18,2)·100 → long → leading digit of the
    * base-10 string` — string-leading-digit rather than `log10`, whose
    * last-bit rounding at exact powers of ten is libm-dependent), and
    * the report carries one row per digit 1–9 with exact integer
    * columns: observed count, observed permille, the Benford expectation
    * permille, and the absolute gap. Null and non-positive values are
    * excluded (Benford is only defined over positive magnitudes).
    * Digits with zero observations still report (the gap against their
    * expectation is the signal).
    *
    * Scale shape: one scan → map-side-combined groupBy over ≤9 keys →
    * a broadcast of the one-row total; nothing scales with the input
    * but the scan. */
  def benford(df: DataFrame, amount: Column): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val cents = (amount.cast("decimal(18,2)") * 100).cast("long")
    val obs = df.select(cents.as("__c")).where(col("__c") > 0)
      .select(substring(col("__c").cast("string"), 1, 1).cast("int").as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("n_obs"))
    val digits = BenfordPermille.zipWithIndex
      .map { case (p, i) => (i + 1, p) }.toDF("digit", "benford_permille")
    val total = obs.agg(sum("n_obs").as("__t"))
    // the ≤9-row observed side broadcasts (a broadcast hint on the
    // left/preserved side of a left-outer is unsupported and ignored)
    digits.join(broadcast(obs), Seq("digit"), "left")
      .na.fill(0L, Seq("n_obs"))
      .crossJoin(broadcast(total))
      .select(col("digit"), col("n_obs"),
        expr("n_obs * 1000 div __t").as("obs_permille"),
        col("benford_permille"),
        abs(expr("n_obs * 1000 div __t") - col("benford_permille"))
          .as("gap_permille"))
  }

  /** Count of key tuples appearing more than once — the uniqueness check
    * [[report]]'s per-row rules can't express. One shuffle on the key
    * (map-side combined). */
  def duplicateKeyCount(df: DataFrame, keys: Seq[String]): Long =
    df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("__c"))
      .where(col("__c") > 1).count()

  /** Gate: throw if any rule's violation count exceeds its budget
    * (default 0). Returns the report for logging on success. */
  def enforce(df: DataFrame, rules: Seq[(String, Column)],
      budgets: Map[String, Long] = Map.empty): DataFrame = {
    val rep = report(df, rules)
    val bad = rep.where(col("n_violations") >
        coalesce(element_at(
          map(budgets.toSeq.flatMap { case (k, v) =>
            Seq(lit(k), lit(v)) }: _*), col("rule")), lit(0L)))
      .select("rule", "n_violations").collect()
    if (bad.nonEmpty)
      throw new IllegalStateException("data-quality gate failed: " +
        bad.map(r => s"${r.getString(0)}=${r.getLong(1)}").mkString(", "))
    rep
  }
}
