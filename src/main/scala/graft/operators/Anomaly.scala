package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Robust volume-anomaly detection — the monitor that pages when a
  * source's daily volume departs from its own history (cf. the
  * reference's run metrics, `embeddings-pipeline.py:356-368`, which log
  * counts but leave thresholding to the operator). Median/MAD instead
  * of mean/stddev: one bad day contaminates a mean-based threshold into
  * missing the NEXT bad day, while the median absorbs it — and both
  * statistics stay in the engine's exact-integer discipline. */
object Anomaly {

  /** Days where the per-key daily event count deviates from that key's
    * median by more than `kMad`·MAD (median absolute deviation).
    * "Median" is the LOWER median throughout — the element at sorted
    * position `(n+1) div 2`, integer-exact and engine-portable (no
    * even-count averaging, no floats); a key whose volume is perfectly
    * stable has MAD 0 and then ANY deviation flags, the strictest
    * honest reading of the rule. Day = `unix_seconds div 86400`, the
    * module family's locale-free integer calendar.
    *
    * Output: `(key, day, n, med, mad)` for flagged days only.
    *
    * Scale shape: one (key, day) count aggregation collapses the event
    * stream to at most |keys|·|days| rows; everything after — two
    * per-key rank windows for the medians and the deviation join — runs
    * on that tiny table. The corpus shuffles once. */
  def madOutlierDays(events: DataFrame, tsCol: String, keyCol: String,
      kMad: Long = 3L): DataFrame = {
    require(kMad >= 0)
    val daily = events
      .select(col(keyCol).as("key"),
        expr(TimeSeries.epochDaySql(s"cast($tsCol as long)")).as("day"))
      .groupBy("key", "day").agg(count(lit(1)).as("n"))
    def lowerMedian(df: DataFrame, valueCol: String, out: String): DataFrame = {
      val w = Window.partitionBy("key").orderBy(col(valueCol), col("day"))
      df.withColumn("__rn", row_number().over(w))
        .withColumn("__c", count(lit(1)).over(Window.partitionBy("key")))
        // integer div, NOT Column./ (double): with an even count the
        // fractional (c+1)/2 would match no row_number and the key
        // would silently lose its median row
        .where(col("__rn") === expr("(__c + 1) div 2"))
        .select(col("key"), col(valueCol).as(out))
    }
    val med = lowerMedian(daily, "n", "med")
    val dev = daily.join(med, Seq("key"))
      .withColumn("dev", abs(col("n") - col("med")))
    val mad = lowerMedian(dev.select(col("key"), col("day"), col("dev")),
      "dev", "mad")
    dev.join(mad, Seq("key"))
      .where(col("dev") > lit(kMad) * col("mad"))
      .select(col("key"), col("day"), col("n"), col("med"), col("mad"))
  }
}
