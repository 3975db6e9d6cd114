package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact rank statistics over per-row metrics — the "are these two
  * quality signals measuring the same thing" question a curation
  * pipeline asks before gating on both. Integer-exact end to end so the
  * oracle mirrors bit for bit. */
object Correlate {

  /** Exact global ranks by `(value, tie)` WITHOUT a single-partition
    * window: a value histogram (small — metric values, not rows) gets
    * prefix-summed and broadcast back, and within-value row_numbers run
    * per value partition — the distributed two-phase ranking of
    * `Sampling.mixSources`. Ranks are 1-based and total-ordered (ties
    * broken by `tie`), so they are a permutation of 1..n. */
  private[operators] def exactRank(df: DataFrame, value: Column, tie: Column,
      out: String): DataFrame = {
    val v = df.withColumn("__v", value)
    val hist = v.groupBy("__v").agg(count(lit(1)).as("__c"))
    // histogram-sized window (distinct metric values, KB-class) — the
    // row-level work stays partitioned by value below
    val starts = hist
      .withColumn("__start",
        sum("__c").over(Window.orderBy("__v")) - col("__c"))
      .select("__v", "__start")
    v.join(broadcast(starts), Seq("__v"))
      .withColumn(out, col("__start") +
        row_number().over(Window.partitionBy("__v").orderBy(tie)))
      .drop("__v", "__start")
  }

  /** Borda rank-average quality blend: each metric column is converted
    * to its exact global rank (1-based, ascending — "higher raw value =
    * higher rank = better"; flip a metric's sign to invert), and a
    * document's blend score is the SUM of its ranks. Rank-averaging is
    * the standard way to ensemble quality signals on incomparable
    * scales (a length score in chars, a fluency score in millibits, a
    * repetition ratio in ppm) without calibrating any of them — each
    * signal contributes exactly its ordering, so one signal's fat tail
    * can't drown the others the way z-score averaging lets it.
    * Documents with ANY metric null are excluded up front (a null rank
    * would poison the sum); ties break by `idCol` (the deterministic
    * total order [[spearmanMicro]] documents). Output:
    * `(idCol, rank_1..rank_k, rank_sum)` — `rank_sum` spans [k, k·n]
    * and the caller gates on its quantiles or top-N.
    *
    * Scale shape: one two-phase distributed ranking per metric (value
    * histogram → prefix sum → broadcast; row-level row_numbers run
    * partitioned BY VALUE — see [[exactRank]], no single-partition
    * window anywhere) plus k−1 id-keyed equi-joins of slim
    * (id, rank) tables. */
  def rankBlend(df: DataFrame, idCol: String, metrics: Seq[Column]): DataFrame = {
    require(metrics.nonEmpty, "rankBlend needs at least one metric")
    val ms = metrics.zipWithIndex.map { case (m, i) => (m, s"rank_${i + 1}") }
    val base = df.select(col(idCol) +: ms.map { case (m, n) =>
        m.as(s"__m_$n") }: _*)
      .where(ms.map(m => col(s"__m_${m._2}").isNotNull).reduce(_ && _))
    // each metric ranks over its own SLIM (id, metric) projection — the
    // spearman shape: independent ranking subtrees over 2-column frames
    // instead of a serial fold re-exchanging the full width k times
    val ranked = ms.map { case (_, n) =>
      exactRank(base.select(col(idCol), col(s"__m_$n")),
        col(s"__m_$n"), col(idCol), n).select(col(idCol), col(n))
    }
    ranked.reduce(_.join(_, Seq(idCol)))
      .withColumn("rank_sum",
        ms.map(m => col(m._2).cast("long")).reduce(_ + _))
  }

  /** Exact quantile-bucket assignment: every row gets its global rank
    * under (metric, id) — the [[exactRank]] two-phase distributed
    * ranking, no single-partition window — and the bucket
    * `(rank−1)·buckets div n + 1` (1-based, sizes differing by at most
    * one). The per-document percentile feature a curation gate
    * thresholds ("keep the top 3 deciles by fluency") when the
    * sketch-based [[graft.operators.Quantiles]] cuts aren't enough —
    * this one is EXACT and ties break deterministically, so the bucket
    * boundary never splits differently between runs or engines. Rows
    * with a null metric are excluded. */
  def rankBuckets(df: DataFrame, idCol: String, metric: Column,
      buckets: Int = 10): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    val base = df.select(col(idCol), metric.as("__m"))
      .where(col("__m").isNotNull)
    val total = base.agg(count(lit(1)).as("__n"))
    exactRank(base, col("__m"), col(idCol), "rank")
      .crossJoin(broadcast(total))
      .selectExpr(idCol, "CAST(rank AS BIGINT) AS rank",
        s"CAST((rank - 1) * $buckets div __n + 1 AS BIGINT) AS bucket")
  }

  /** Gini concentration coefficient of a non-negative value column, in
    * exact integer permille: with values ranked ascending (1-based ranks
    * `r_i`, total-ordered by `(value, tie)` — tie ORDER is irrelevant to
    * the statistic, since equal values contribute the same `Σ r_i·x_i`
    * over any permutation of their consecutive ranks),
    * `G·1000 = (2·Σ r_i·x_i − (n+1)·Σx) · 1000 div (n·Σx)`.
    * The inequality read-out a curation pipeline runs over its domain /
    * publisher / user distributions ("how concentrated is the corpus in
    * its top contributors") — 0 = uniform, →1000 = one key owns
    * everything. Returns one row `(n_keys, total, gini_permille)`;
    * degenerate inputs (n = 0 or Σx = 0) return gini 0.
    *
    * Scale shape: one distributed two-phase ranking (see [[exactRank]] —
    * the histogram window is over distinct VALUES, kilobyte-class for
    * count-like inputs) + one scalar aggregate; `Σ r_i·x_i` accumulates
    * in DECIMAL(38,0) and the final division runs driver-side in BigInt
    * (the [[spearmanMicro]] convention). */
  def giniPermille(df: DataFrame, value: Column, tie: Column): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val base = df.select(value.cast("long").as("__x"), tie.as("__t"))
      .where(col("__x").isNotNull && col("__x") >= 0)
    val agg = exactRank(base, col("__x"), col("__t"), "__r")
      .select((col("__r").cast("decimal(38,0)") *
        col("__x").cast("decimal(38,0)")).as("__rx"),
        col("__x").cast("decimal(38,0)").as("__xd"))
      .agg(count(lit(1)).as("n"), sum("__rx").as("srx"), sum("__xd").as("sx"))
      .head()
    val n = agg.getLong(0)
    val (total, gini) =
      if (n == 0L) (0L, 0L)
      else {
        val srx = BigInt(agg.getDecimal(1).toBigInteger)
        val sx = BigInt(agg.getDecimal(2).toBigInteger)
        if (sx == 0) (0L, 0L)
        else ((sx.toLong,
          ((BigInt(2) * srx - (BigInt(n) + 1) * sx) * 1000 /
            (BigInt(n) * sx)).toLong))
      }
    Seq((n, total, gini)).toDF("n_keys", "total", "gini_permille")
  }

  /** Exact trimmed mean per key over a NON-NEGATIVE integral value
    * column (monetary cents, counts; shift signed metrics first — the
    * integral `div`/`//` pair truncates/floors differently below zero):
    * per key, rows ranked ascending keep only rank positions in
    * `(n·loPermille div 1000, n·hiPermille div 1000]` and the kept
    * band's mean is emitted ×1000 (`trimmed_mean_milli`), with the
    * band's boundary values (`lo_val`/`hi_val` ≈ the p-lo/p-hi order
    * statistics) for free. The robust location estimate a quality gate
    * wants when a metric has fat tails a plain mean would chase — and
    * unlike the KLL-sketch path it is EXACT, so the oracle mirrors bit
    * for bit. Null values are excluded; keys whose kept band is empty
    * (tiny groups) report a null mean.
    *
    * Scale shape: NO row-level window — the trim runs on the per-key
    * VALUE HISTOGRAM (a `(key, value)` map-side-combined aggregation,
    * bounded by distinct values per key, not rows): each value-run
    * occupies rank interval `(start, start+c]`, and its overlap with
    * the kept band is closed-form. Hot keys cost histogram-width work,
    * never row-count work (the [[exactRank]] argument, per key). */
  def trimmedMeanPerKey(df: DataFrame, keyCol: String, value: Column,
      loPermille: Int = 50, hiPermille: Int = 950): DataFrame = {
    require(0 <= loPermille && loPermille < hiPermille && hiPermille <= 1000,
      s"need 0 <= lo < hi <= 1000, got ($loPermille, $hiPermille)")
    val h = df.select(col(keyCol).as("key"), value.cast("long").as("__x"))
      .where(col("__x").isNotNull)
      .groupBy("key", "__x").agg(count(lit(1)).as("__c"))
    val wOrd = Window.partitionBy("key").orderBy("__x")
    val wAll = Window.partitionBy("key")
    h.withColumn("__start", sum("__c").over(wOrd) - col("__c"))
      .withColumn("__nk", sum("__c").over(wAll))
      .withColumn("__kept", greatest(lit(0L),
        least(col("__start") + col("__c"),
          expr(s"__nk * $hiPermille div 1000")) -
        greatest(col("__start"), expr(s"__nk * $loPermille div 1000"))))
      .groupBy(col("key").as(keyCol))
      .agg(max("__nk").as("n_rows"),
        sum("__kept").as("n_kept"),
        min(when(col("__kept") > 0, col("__x"))).as("lo_val"),
        max(when(col("__kept") > 0, col("__x"))).as("hi_val"),
        sum((col("__kept") * col("__x")).cast("decimal(38,0)")).as("__sum"))
      .withColumn("trimmed_mean_milli",
        when(col("n_kept") > 0,
          expr("CAST(__sum * 1000 div n_kept AS BIGINT)")))
      .drop("__sum")
  }

  /** Winsorization TRANSFORM over [[trimmedMeanPerKey]]'s boundary order
    * statistics: every row comes back with its value CLAMPED into the
    * key's kept band `[lo_val, hi_val]` — the fat-tail repair that keeps
    * the row (a bot's million-unit purchase becomes the p95 value)
    * where the trim only reports statistics. Rows of keys whose kept
    * band is empty (tiny groups) pass through unchanged — no data is
    * invented. Same non-negative-integral contract as the trim.
    *
    * Scale shape: the bounds table is one histogram-sized aggregation
    * (|keys| rows out), broadcast back onto the corpus — the clamp
    * itself is a scan-stage projection; no row-level window, no second
    * key exchange. */
  def winsorizePerKey(df: DataFrame, keyCol: String, idCol: Column,
      value: Column, loPermille: Int = 50,
      hiPermille: Int = 950): DataFrame = {
    val bounds = trimmedMeanPerKey(df, keyCol, value, loPermille, hiPermille)
      .select(col(keyCol), col("lo_val"), col("hi_val"))
    df.select(col(keyCol), idCol.as("id"), value.cast("long").as("value_raw"))
      .where(col("value_raw").isNotNull)
      .join(broadcast(bounds), Seq(keyCol))
      .select(col(keyCol), col("id"), col("value_raw"),
        coalesce(
          greatest(col("lo_val"), least(col("hi_val"), col("value_raw"))),
          col("value_raw")).as("value_winsor"))
  }

  /** Spearman rank correlation between two metric columns, in exact
    * integer micro-units: `ρ·10⁶ = 10⁶ − (6·10⁶·Σd²) div (n(n²−1))`
    * with `d = rank_a − rank_b` under the deterministic total order
    * `(value, idCol)` (row-number ranks, ties broken by id — the
    * documented convention, mirrored by the oracle; classic
    * average-rank tie handling would leave integer arithmetic).
    * Rows with EITHER metric null are excluded up front
    * (pairwise-complete). Returns one row `(n_docs, rho_micro)`;
    * `rho_micro` spans [−1000000, 1000000]. Σd² accumulates in DECIMAL(38,0) (exact to
    * 10³⁸) and the final division runs driver-side in BigInt, so no
    * overflow up to n ≈ 2·10⁶ per the n³ denominator — sample larger
    * corpora (the eval-op convention).
    *
    * Scale shape: two distributed two-phase rankings (see
    * [[exactRank]]) + one id-keyed join + one scalar aggregate — no
    * single-partition row-level window anywhere. */
  def spearmanMicro(df: DataFrame, aCol: Column, bCol: Column,
      idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // pairwise-complete contract: a row with EITHER metric null leaves
    // the correlation entirely BEFORE ranking — ranking one side and
    // dropping the row at the join would leave the other side's ranks
    // no longer a permutation of 1..n and push rho outside [-1, 1]
    val base = df.select(col(idCol).as("__id"), aCol.as("__a"), bCol.as("__b"))
      .where(col("__a").isNotNull && col("__b").isNotNull)
    val ra = exactRank(base.select("__id", "__a"), col("__a"), col("__id"), "__ra")
      .select("__id", "__ra")
    val rb = exactRank(base.select("__id", "__b"), col("__b"), col("__id"), "__rb")
      .select("__id", "__rb")
    val agg = ra.join(rb, Seq("__id"))
      .select(((col("__ra") - col("__rb")) * (col("__ra") - col("__rb")))
        .cast("decimal(38,0)").as("__d2"))
      .agg(count(lit(1)).as("n"), sum("__d2").as("sd2"))
      .head()
    val n = agg.getLong(0)
    val rho =
      if (n < 2) BigInt(1000000) // degenerate: perfectly self-consistent
      else {
        val sd2 = BigInt(agg.getDecimal(1).toBigInteger)
        BigInt(1000000) -
          (BigInt(6000000) * sd2) / (BigInt(n) * (BigInt(n) * BigInt(n) - 1))
      }
    Seq((n, rho.toLong)).toDF("n_docs", "rho_micro")
  }

  /** Exact Pearson chi-square + Cramér's V between two categorical
    * columns — "are these attributes associated, and how strongly",
    * chance-corrected where a raw crosstab or purity number is not:
    * the source↔language / variant↔outcome / cluster↔label audit.
    * Reported as `chi2_micro = Σ_cells ⌊(o·N − r·c)²·10⁶ div (N·r·c)⌋`
    * over the FULL r×c grid (empty cells contribute their expected
    * mass — omitting them understates χ²) and
    * `v2_micro = chi2_micro div (N·(min(r,c)−1))` — V² rather than V so
    * no square root leaves integer arithmetic (V²·10⁶: 0 = independent,
    * 10⁶ = perfectly associated). Per-cell floors in a deterministic
    * cell set make the SQL mirror exact term for term; the statistic
    * reads at most #cells micro-units below the real χ²·10⁶ —
    * irrelevant at any decision threshold. Single-level columns report
    * NULL v2 (dof 0).
    *
    * Scale shape: ONE map-side-combined (a, b) count over the corpus;
    * the contingency table is bounded by the level-pair count, so the
    * grid completion, margins, and BigInt cell terms run driver-side on
    * that bounded table (the [[Experiment.abChi2]] posture — BigInt,
    * so no overflow ceiling at any corpus size, where a DECIMAL(38,0)
    * plan column would cap near N ≈ 10⁸). The bounded-levels assumption
    * is ENFORCED, not assumed (round-13 ADVICE fix): the collect is
    * `limit(maxCells + 1)`-capped and a table past `maxCells` observed
    * cells — or a completed r×c grid past 10·maxCells — fails fast with
    * a clear message instead of OOMing the driver on an id-like column.
    */
  /** Exact Cohen's kappa between two categorical columns — the
    * chance-corrected agreement the raw accuracy number overstates
    * (predict-the-majority scores high accuracy on skewed labels;
    * kappa reads it as ~0): `κ = (p_o − p_e)/(1 − p_e)` with
    * `p_e = Σ_k rowM_k·colM_k / N²`, reported as
    * `kappa_micro = ⌊10⁶·(N·agree − S) / (N² − S)⌋` (S = Σ rowM·colM)
    * in FLOOR division — kappa is negative for worse-than-chance
    * agreement, and floor (not truncate-toward-zero) is what the
    * oracle's `//` computes. Alongside: exact `n_agree`,
    * `po_micro = 10⁶·agree div N`, `pe_micro = ⌊10⁶·S / N²⌋`.
    * Degenerate marginals (p_e = 1: both columns single-level) report
    * NULL kappa. The classifier-eval completion next to the confusion
    * matrix ([[graft.SparkEntry]] `langid_confusion`) and the
    * calibration report ([[Validate.calibrationReport]]).
    *
    * Scale shape: the [[cramersV]] posture — ONE map-side-combined
    * (a, b) count, the bounded (and `maxCells`-ENFORCED) contingency
    * table collected, margins + BigInt arithmetic driver-side (no
    * overflow ceiling at any corpus size). */
  def cohensKappa(df: DataFrame, aCol: Column, bCol: Column,
      maxCells: Int = 100000): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val cells = df
      .select(aCol.cast("string").as("__a"), bCol.cast("string").as("__b"))
      .where(col("__a").isNotNull && col("__b").isNotNull)
      .groupBy("__a", "__b").agg(count(lit(1)).as("__o"))
      .limit(maxCells + 1)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    require(cells.length <= maxCells,
      s"cohensKappa: more than $maxCells distinct (a,b) cells — an " +
        "id-like column does not belong in an agreement statistic")
    val n = BigInt(cells.map(_._3).sum)
    val agree = BigInt(cells.collect { case (a, b, o) if a == b => o }.sum)
    val rowM = cells.groupBy(_._1).view.mapValues(cs =>
      BigInt(cs.map(_._3).sum)).toMap
    val colM = cells.groupBy(_._2).view.mapValues(cs =>
      BigInt(cs.map(_._3).sum)).toMap
    // S sums over the UNION of level sets (a level absent from one side
    // contributes 0 — its margin there is 0)
    val s = (rowM.keySet ++ colM.keySet).toSeq.map(k =>
      rowM.getOrElse(k, BigInt(0)) * colM.getOrElse(k, BigInt(0))).sum
    def floorDiv(a: BigInt, b: BigInt): BigInt = {
      val q = a / b
      if (a % b != 0 && (a < 0) != (b < 0)) q - 1 else q
    }
    val m = BigInt(1000000)
    val (po, pe, kappa) =
      if (n == 0) (None, None, None)
      else {
        val den = n * n - s
        (Some((m * agree / n).toLong), Some(floorDiv(m * s, n * n).toLong),
          if (den == 0) None
          else Some(floorDiv(m * (n * agree - s), den).toLong))
      }
    Seq((n.toLong, agree.toLong, po, pe, kappa))
      .toDF("n_rows", "n_agree", "po_micro", "pe_micro", "kappa_micro")
  }

  def cramersV(df: DataFrame, aCol: Column, bCol: Column,
      maxCells: Int = 100000): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val cells = df
      .select(aCol.cast("string").as("__a"), bCol.cast("string").as("__b"))
      .where(col("__a").isNotNull && col("__b").isNotNull)
      .groupBy("__a", "__b").agg(count(lit(1)).as("__o"))
      .limit(maxCells + 1)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    require(cells.length <= maxCells,
      s"cramersV: more than $maxCells distinct (a,b) cells — this is a " +
        "categorical-association statistic; an id-like column does not " +
        "belong here (raise maxCells only for genuinely bounded levels)")
    val obs = cells.map { case (a, b, o) => (a, b) -> BigInt(o) }.toMap
    val rowM = cells.groupBy(_._1).view.mapValues(cs =>
      BigInt(cs.map(_._3).sum)).toMap
    val colM = cells.groupBy(_._2).view.mapValues(cs =>
      BigInt(cs.map(_._3).sum)).toMap
    val n = BigInt(cells.map(_._3).sum)
    require(rowM.size.toLong * colM.size <= 10L * maxCells,
      s"cramersV: completed grid ${rowM.size}x${colM.size} exceeds " +
        s"${10L * maxCells} cells — levels too sparse/wide for the " +
        "driver-side grid completion")
    val chi2 =
      if (n == 0) BigInt(0)
      else (for {
        (a, r) <- rowM.toSeq
        (b, c) <- colM.toSeq
      } yield {
        val dev = obs.getOrElse((a, b), BigInt(0)) * n - r * c
        dev * dev * 1000000 / (n * r * c)
      }).sum
    val minDim = BigInt(math.min(rowM.size, colM.size))
    val v2 =
      if (n == 0 || minDim < 2) None
      else Some((chi2 / (n * (minDim - 1))).toLong)
    Seq((n.toLong, rowM.size.toLong, colM.size.toLong,
      (rowM.size - 1).toLong * (colM.size - 1).toLong, chi2.toLong, v2))
      .toDF("n_rows", "n_a_levels", "n_b_levels", "dof",
        "chi2_micro", "v2_micro")
  }
}
