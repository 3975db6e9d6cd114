package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** A/B experiment analysis over an event log — the "did the variant
  * move the metric" read-out every product analytics stack runs on the
  * `events` stream. Exact integer arithmetic end to end (micro-unit
  * rates, a BigInt chi-square) so the SQL oracle mirrors bit for bit —
  * the [[Correlate.spearmanMicro]] convention. */
object Experiment {

  /** Two-variant conversion analysis with an exact Pearson chi-square:
    * users are collapsed to one row each (variant = the user's single
    * assignment, converted = whether ANY of their events converts),
    * the 2×2 contingency table `(a,b;c,d)` = (A converted, A not; B
    * converted, B not) is aggregated, and the statistic
    * `χ²·10⁶ = 10⁶·N·(ad−bc)² div ((a+b)(c+d)(a+c)(b+d))` runs in
    * BigInt on the driver (the 2×2 is four bounded counts — the
    * [[Correlate.spearmanMicro]] driver-math posture; no overflow at
    * any corpus size). For a 2×2 table χ² is exactly the square of the
    * two-proportion z statistic, so this IS the standard significance
    * test — χ²·10⁶ ≥ 3 841 459 ⇔ p < 0.05 — without ever needing a
    * square root to leave integer arithmetic. Conversion rates and
    * their lift are micro-unit integer divisions of non-negative
    * values (floor = truncate, so `div` and `//` agree across
    * engines). Any zero margin (no users in a variant, nobody/everyone
    * converting) → NULL chi-square, the undefined case.
    *
    * A user appearing under BOTH variants (a broken assignment) is
    * counted under their smallest variant label — deterministic, and a
    * diagnostic the caller should gate on upstream.
    *
    * Scale shape: one user-keyed map-side-combined aggregate over the
    * event log (the heavy exchange — slim `(user, variant, conv)`
    * partials), one 2-row variant aggregate, a 4-count collect.
    * Returns one row: `(users_a, conv_a, users_b, conv_b, rate_a_micro,
    * rate_b_micro, lift_micro, chi2_micro)`. */
  def abChi2(events: DataFrame, userCol: Column, variantCol: Column,
      convertedCol: Column): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val perUser = events
      .select(userCol.as("__u"), variantCol.as("__v"),
        convertedCol.cast("boolean").as("__c"))
      .where(col("__u").isNotNull && col("__v").isNotNull)
      .groupBy("__u")
      .agg(min("__v").as("__v"), max(coalesce(col("__c"), lit(false))).as("__c"))
    val table = perUser.groupBy("__v")
      .agg(count(lit(1)).as("n"), sum(when(col("__c"), 1L).otherwise(0L)).as("k"))
      .orderBy("__v")
      .collect()
    require(table.length == 2,
      s"abChi2 expects exactly two variants, got ${table.length}")
    val (na, ka) = (table(0).getLong(1), table(0).getLong(2))
    val (nb, kb) = (table(1).getLong(1), table(1).getLong(2))
    val (a, b, c, d) = (BigInt(ka), BigInt(na - ka), BigInt(kb), BigInt(nb - kb))
    val margins = Seq(a + b, c + d, a + c, b + d)
    val chi2: Option[Long] =
      if (margins.exists(_ == 0)) None
      else {
        val det = a * d - b * c
        Some(((BigInt(1000000) * (a + b + c + d) * det * det) /
          margins.product).toLong)
      }
    val rateA = if (na > 0) 1000000L * ka / na else 0L
    val rateB = if (nb > 0) 1000000L * kb / nb else 0L
    Seq((na, ka, nb, kb, rateA, rateB, rateA - rateB, chi2))
      .toDF("users_a", "conv_a", "users_b", "conv_b",
        "rate_a_micro", "rate_b_micro", "lift_micro", "chi2_micro")
  }

  /** Half-sample replication stability interval for a per-key mean — the
    * deterministic resampling answer to "how much would this metric move
    * on a different sample": `b` pseudo-replicates, each keeping a row
    * iff bit *i* of the row's engine-portable
    * [[graft.functions.PortableHash.mix64]] hash of `id:salt` is set
    * (ONE 64-bit hash per row; splitmix64's finalizer makes each bit an
    * independent fair coin — fully deterministic, so the SQL oracle
    * recomputes every replicate bit for bit), each replicate's exact
    * integer mean ×1000, and the sorted replicate means' p10/p90 order
    * statistics as the reported band. A monitor alert whose metric shift
    * is inside this band is sampling noise, not signal. Values must be
    * non-negative integral (the `div`/`//` contract); NULL values are
    * excluded; replicates that catch no rows (tiny keys) are dropped
    * from the band.
    *
    * Scale shape: ONE map-side-combined per-key aggregation carrying
    * 2·b+2 sums — no explode, no row multiplication; replicate
    * membership is one codegen'd hash per row, not b md5s (the round-12
    * version paid 32 full md5+concat evaluations per input row in the
    * scan stage). Band extraction is array arithmetic on a b-element
    * column. The ×1000 mean products widen through DECIMAL(38,0): per-key
    * LongType value sums above ~9.2e15 would silently wrap the x1000
    * product at corpus scale (same widening discipline as the census
    * tier; the oracle mirrors it in HUGEINT). */
  def halfSampleCi(df: DataFrame, keyCol: String, idCol: Column,
      value: Column, b: Int = 32, salt: String = "hsci"): DataFrame = {
    require(b >= 2 && b <= 63, "need 2..63 replicates (one hash bit each)")
    val base = df
      .select(col(keyCol).as("key"),
        graft.functions.F.mix64(concat(idCol.cast("string"), lit(s":$salt")))
          .as("__h"),
        value.cast("long").as("__x"))
      .where(col("__x").isNotNull)
    // bit i of the signed Long: arithmetic shift then mask — identical to
    // the unsigned bit, so the oracle's UBIGINT formulation matches.
    def member(i: Int): Column =
      shiftright(col("__h"), i).bitwiseAND(lit(1L)) === lit(1L)
    val aggs = count(lit(1)).as("__n") +: sum("__x").as("__s") +:
      (0 until b).flatMap(i => Seq(
        sum(when(member(i), col("__x"))).as(s"__s$i"),
        sum(when(member(i), 1L)).as(s"__n$i")))
    val means = array((0 until b).map(i =>
      expr(s"CASE WHEN __n$i > 0 THEN CAST(CAST(__s$i AS DECIMAL(38,0))" +
        s" * 1000 div __n$i AS BIGINT) END")): _*)
    base.groupBy("key").agg(aggs.head, aggs.tail: _*)
      .withColumn("__means", sort_array(filter(means, m => m.isNotNull)))
      .withColumn("n_replicates", size(col("__means")).cast("long"))
      .withColumn("mean_milli",
        expr("CAST(CAST(__s AS DECIMAL(38,0)) * 1000 div __n AS BIGINT)"))
      .withColumn("rep_lo_milli", expr(
        "CASE WHEN n_replicates > 0 THEN element_at(__means, " +
          "CAST(n_replicates * 100 div 1000 + 1 AS INT)) END"))
      .withColumn("rep_hi_milli", expr(
        "CASE WHEN n_replicates > 0 THEN element_at(__means, " +
          "CAST(n_replicates - n_replicates * 100 div 1000 AS INT)) END"))
      .select(col("key"), col("__n").as("n_rows"), col("n_replicates"),
        col("mean_milli"), col("rep_lo_milli"), col("rep_hi_milli"))
  }
}
