package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}

/** Round-19 audit (VERDICT r18 #6): every registered query whose plan
  * carries an UNPARTITIONED window (empty partitionSpec → "Moving all
  * data to a single partition" at runtime) must be on the documented
  * allowlist below, each entry naming the bounded frame that makes the
  * single partition safe. A new unpartitioned window fails this suite
  * naming the query — a genuinely unbounded single-partition window is
  * a driver/executor OOM at 100 TB, so it must be a reviewed decision,
  * never an accident. */
class GlobalWindowAuditSpec extends SparkSpecBase {

  private val sfDir = "/root/testdata/sf0.001"

  /** query → why its single-partition window is bounded (the proof
    * lives as a comment at the operator site). */
  private val bounded: Map[String, String] = Map(
    "bottomk_quantiles" -> ("Sketch.bottomKQuantiles: window over the " +
      "bottom-k sample — ≤ k rows by the sketch's contract"),
    "curriculum_order" -> ("Correlate dense-offset window over the " +
      "per-value histogram — ≤ distinct metric values (KB-class); " +
      "row-level ranking stays partitioned by value"),
    "quality_blend" -> ("Correlate Borda rank window over the per-value " +
      "histogram — ≤ distinct metric values per blended column"),
    "quality_deciles" -> ("Correlate decile window over the per-value " +
      "histogram — ≤ distinct metric values"),
    "quantile_filter" -> ("Sampling.quantileFilter: cumulative window " +
      "over the per-value count table — ≤ distinct metric values " +
      "(token counts / permille scores), never corpus rows"),
    "dsir_scores" -> ("Sampling DSIR model totals: all-rows window over " +
      "the ≤ `buckets`-row hashed-feature count table (r18 restructure)"),
    "dsir_select" -> ("same DSIR model window — ≤ `buckets` rows"),
    "ks_drift" -> ("Validate.ksVsCorpus: corpus-CDF window over the " +
      "boundedHistogram output — ≤ maxBins distinct values after the " +
      "domain guard"),
    "vocab_growth" -> ("TextAnalysis.vocabGrowth: bucket-offset window " +
      "over one row per id-range bucket (corpus ids / bucketWidth)"),
    "zipf_bands" -> ("TextAnalysis.zipfBands: rank-span window over one " +
      "row per distinct token-frequency value (log-scale domain)"))

  private def flatten(p: SparkPlan): Seq[SparkPlan] = {
    val self = p match {
      case a: AdaptiveSparkPlanExec => flatten(a.executedPlan)
      case o => Seq(o)
    }
    self ++ p.children.flatMap(flatten)
  }

  test("unpartitioned windows are exactly the documented bounded set") {
    assume(new java.io.File(sfDir).isDirectory, s"$sfDir not present")
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try {
          val nodes = flatten(fn(spark, sfDir).queryExecution.executedPlan)
          val global = nodes.exists {
            case w: WindowExec => w.partitionSpec.isEmpty
            case w: WindowGroupLimitExec => w.partitionSpec.isEmpty
            case _ => false
          }
          if (global) Some(name) else None
        } catch { case _: Throwable => None } // builder failures are Verify's job
    }
    val unexpected = offenders.filterNot(bounded.contains)
    val stale = (bounded.keySet -- offenders).toSeq.sorted
    assert(unexpected.isEmpty,
      s"UNDOCUMENTED single-partition window in: ${unexpected.mkString(", ")} — " +
        "either partition it or add a bounded-rows justification here")
    assert(stale.isEmpty,
      s"allowlist entries no longer hold a global window: ${stale.mkString(", ")}")
  }
}
