package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.Ckpt.PinOps

/** Event-sequence analytics over the interaction log: ordered-step funnel
  * conversion and cohort retention — the measurement queries an
  * event-driven training-data pipeline runs next to curation (which
  * sources/flows convert into kept documents; how long a source stays
  * active after onboarding). Both are exact integer/timestamp arithmetic,
  * so the DuckDB oracles match bit-for-bit.
  */
object Funnel {

  /** Ordered-step funnel: for each key, the earliest time each step is
    * reached, where step i+1 must occur STRICTLY after the key's step-i
    * time and within `horizonSeconds` of its step-1 time. Returns one row
    * per key that reached step 1: (key, stage, ts_1 … ts_n) with `stage` =
    * number of steps reached and unreached steps null.
    *
    * Semantics note: each step's time is the MINIMUM valid one (the
    * classic "earliest conversion" funnel). Greedy-earliest is optimal
    * here: taking the earliest valid step-i time never excludes a later
    * step — any sequence proving stage k also validates the greedy one,
    * because min choices only widen every subsequent strictly-after
    * window while the horizon is anchored at step 1 regardless.
    *
    * 100 TB shape: one chained aggregation per step, each shuffling ONLY
    * that step's events (filtered at the scan) keyed by `keyCol`, joined
    * key-to-key against the previous stage's (key, ts) table — never the
    * full log, never a per-key sort. `n` steps = `n` slim exchanges over
    * strictly shrinking tables (stage tables only lose keys as stages
    * advance). A hot key costs map-side partial min, not a fan-out. */
  def funnel(events: DataFrame, steps: Seq[String], horizonSeconds: Long,
      keyCol: String = "user_id", typeCol: String = "event_type",
      tsCol: String = "ts"): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(steps.distinct == steps, "funnel steps must be distinct")
    def stepEvents(s: String) =
      events.where(col(typeCol) === s).select(col(keyCol), col(tsCol))
    // stage 1: earliest occurrence of the first step.
    // (r18 note: per-step localCheckpoint pins were measured here and
    // REVERTED — the step chain's duplicated subtrees are exchange-
    // identical, so runtime exchange reuse already evaluates each stage
    // once, and the pin jobs only added latency: 0.78 → 0.86 s at
    // sf0.1.)
    var reached = stepEvents(steps.head)
      .groupBy(col(keyCol)).agg(min(col(tsCol)).as("ts_1"))
    var i = 2
    while (i <= steps.length) {
      val prev = s"ts_${i - 1}"
      val cur = s"ts_$i"
      val next = stepEvents(steps(i - 1))
        .join(reached.select(Seq(keyCol, "ts_1", prev).distinct.map(col): _*),
          Seq(keyCol))
        .where(col(tsCol) > col(prev) &&
          col(tsCol).cast("long") - col("ts_1").cast("long") <= horizonSeconds)
        .groupBy(col(keyCol)).agg(min(col(tsCol)).as(cur))
      reached = reached.join(next, Seq(keyCol), "left")
      i += 1
    }
    val tsCols = (1 to steps.length).map(j => col(s"ts_$j"))
    val stage = tsCols.map(c => when(c.isNotNull, 1).otherwise(0))
      .reduce(_ + _)
    reached.select(col(keyCol) +: stage.as("stage") +: tsCols: _*)
  }

  /** Weekly cohort retention: each key's cohort is the integer epoch-week
    * (`epoch_days div 7` — engine-portable, no locale week rules) of its
    * FIRST event; for every (cohort_week, offset_weeks) cell, the number
    * of distinct keys from that cohort active that many weeks later.
    * Offset 0 is the cohort's own week, so `n_active` at offset 0 is the
    * cohort size.
    *
    * 100 TB shape: one keyCol-keyed min-aggregation for the cohort table
    * (map-side combined), one keyCol join of events against it (both
    * sides key-partitioned; the cohort table is |keys|-sized), then the
    * distinct + count collapse onto (cohort, offset) — bounded by
    * |keys|·|weeks|, with map-side partial distinct. No window, no
    * per-key sort. */
  def retentionCohorts(events: DataFrame, keyCol: String = "user_id",
      tsCol: String = "ts"): DataFrame = {
    // floor-division weeks (TimeSeries.epochBucketSql), the module's
    // locale-free integer-calendar discipline — no double arithmetic
    val secs = events.select(col(keyCol), col(tsCol).cast("long").as("__es"))
    val cohort = secs.groupBy(col(keyCol))
      .agg(min(col("__es")).as("__min_es"))
      .select(col(keyCol), expr(TimeSeries.epochBucketSql("__min_es", 604800L)).as("cohort_week"))
    secs.select(col(keyCol), expr(TimeSeries.epochBucketSql("__es", 604800L)).as("event_week"))
      .join(cohort, Seq(keyCol))
      .select(col("cohort_week"),
        (col("event_week") - col("cohort_week")).as("offset_weeks"),
        col(keyCol))
      .distinct()
      .groupBy("cohort_week", "offset_weeks")
      .agg(count(lit(1)).as("n_active"))
  }

  /** First/last-touch conversion attribution — which interaction gets
    * credit for each conversion. Per key, events order by
    * `(ts, tieCol)`; a SEGMENT is the run of events up to and including
    * a conversion (touches reset after every conversion — the standard
    * non-overlapping attribution window). For each conversion: the
    * segment's first touch (first-touch credit), its last touch before
    * the conversion (last-touch credit), and the touch count. Both
    * credits are null for a direct conversion (no touch in segment);
    * trailing touches after a key's final conversion attribute nothing.
    *
    * 100 TB shape: ONE key exchange — the running prior-conversion
    * count (the segment id) rides a per-key sort window, and the
    * per-(key, segment) aggregate reuses that partitioning (Spark's
    * clustered-distribution subset rule, the [[Sessionize.sessions]]
    * shape), with min/max-of-struct credits map-side combined. A hot
    * key serializes its sort exactly like sessionize's (same
    * chunked-twin escape applies if needed). */
  def attribution(events: DataFrame, conversionType: String,
      keyCol: String = "user_id", tsCol: String = "ts",
      typeCol: String = "event_type", tieCol: String = "event_id"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCol).orderBy(col(tsCol), col(tieCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val isConv = col(typeCol) === conversionType
    val touch = struct(col(tsCol), col(tieCol), col(typeCol))
    events
      .withColumn("__seg",
        coalesce(sum(isConv.cast("long")).over(w), lit(0L)))
      .groupBy(col(keyCol), col("__seg"))
      .agg(
        max(when(isConv, struct(col(tsCol), col(tieCol)))).as("__conv"),
        min(when(!isConv, touch)).as("__first"),
        max(when(!isConv, touch)).as("__last"),
        sum((!isConv).cast("long")).as("n_touches"))
      .where(col("__conv").isNotNull)
      .select(col(keyCol),
        col(s"__conv.$tsCol").as("conv_ts"),
        col(s"__conv.$tieCol").as("conv_id"),
        col(s"__first.$typeCol").as("first_type"),
        col(s"__first.$tieCol").as("first_id"),
        col(s"__last.$typeCol").as("last_type"),
        col(s"__last.$tieCol").as("last_id"),
        col("n_touches"))
  }
}
