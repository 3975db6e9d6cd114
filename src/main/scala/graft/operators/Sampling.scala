package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.Ckpt.PinOps

/** Reproducible sampling and sequence packing for training-data curation
  * (BASELINE.json north star: data-mixture construction at 100 TB).
  *
  * Sampling here is DETERMINISTIC — membership is a pure function of the
  * row id and a salt, not of `rand()` — so a sample is (a) reproducible
  * across runs/retries (a re-run of a failed partition keeps the same
  * rows: exactly-once semantics without coordination), (b) consistent
  * across tables (joining two tables sampled with the same salt keeps
  * matching keys), (c) mirrorable bit-for-bit by a SQL oracle. That is
  * the standard trick web-scale corpora use (hash-mod sharding in CCNet /
  * RefinedWeb); `df.sample()` can give none of those.
  */
object Sampling {

  /** Keep-predicate of a deterministic Bernoulli sample at `rate`:
    * the first 8 hex chars of `md5(id ++ ":" ++ salt)` — a uniform 32-bit
    * value in hex — compared lexicographically against the rate threshold.
    * Pure per-row expression: no shuffle, no join, pushes into the scan. */
  def hashKeep(idCol: Column, rate: Double, salt: String): Column =
    if (rate >= 1.0) lit(true)
    else if (rate <= 0.0) lit(false)
    else substring(md5(concat(idCol.cast("string"), lit(":" + salt))), 1, 8) <
      lit(hexThreshold(rate))

  /** The 8-hex-digit threshold string for `rate` (shared with oracles):
    * keep iff hex32(hash) < hex32(rate·2^32). */
  def hexThreshold(rate: Double): String =
    f"${math.min((rate * 4294967296.0).toLong, 4294967295L)}%08x"

  /** Stratified sample: a per-stratum rate map over `keyCol` (strata
    * absent from the map get `defaultRate`). Deterministic per `salt`.
    *
    * 100 TB shape: the rate lookup is a literal CASE chain (strata are
    * few — sources, languages, quality buckets), so the whole operator is
    * a single scan-stage filter; partition pruning on `keyCol` still
    * applies, and a `rate == 0` stratum prunes entirely. */
  def stratified(df: DataFrame, keyCol: String, idCol: String,
      rates: Map[String, Double], defaultRate: Double = 0.0,
      salt: String = "graft"): DataFrame = {
    val keep = rates.foldLeft(when(lit(false), lit(false))) {
      case (acc, (k, r)) => acc.when(col(keyCol) === k, hashKeep(col(idCol), r, salt))
    }.otherwise(hashKeep(col(idCol), defaultRate, salt))
    df.where(keep)
  }

  /** Deterministic named train/val/test split assignment keyed on a GROUP
    * column — the leakage-safe split a training pipeline needs: splitting
    * on `doc_id` puts near-identical documents (same site, same template,
    * near-dups) on both sides of the train/eval boundary, so the split key
    * must be the leakage unit (domain, source, or a duplicate-cluster
    * representative — see the `split_by_component` query). Every row with
    * the same key lands in the same split, by construction.
    *
    * Mechanics mirror [[hashKeep]]: the first 8 md5 hex chars of
    * `key ++ ":" ++ salt` are a uniform 32-bit draw, compared against the
    * cumulative weight thresholds — a pure per-row CASE expression: no
    * shuffle, no join, survives repartitioning, identical across runs and
    * engines. Weights are normalized; the last split takes the remainder,
    * so coverage is total. */
  def splitAssign(key: Column, splits: Seq[(String, Double)],
      salt: String = "graft"): Column = {
    require(splits.nonEmpty && splits.forall(_._2 > 0.0),
      "splitAssign needs at least one split, all weights > 0")
    val total = splits.map(_._2).sum
    val h = substring(md5(concat(key.cast("string"), lit(":" + salt))), 1, 8)
    val cum = splits.init.map(_._2).scanLeft(0.0)(_ + _).tail
    val cases = splits.init.zip(cum).map { case ((name, _), c) =>
      (name, hexThreshold(c / total))
    }
    cases.reverse.foldLeft(lit(splits.last._1): Column) {
      case (els, (name, thr)) => when(h < lit(thr), lit(name)).otherwise(els)
    }
  }

  /** Exact-`k` uniform sample per stratum: the k rows with the SMALLEST
    * `md5(id ++ ":" ++ salt)` in each `keyCol` group (id as final
    * tie-break). Deterministic like [[hashKeep]], but with a guaranteed
    * per-stratum count — the distributed equivalent of per-key reservoir
    * sampling, without the sequential reservoir. Growing k keeps the
    * previous sample as a prefix (nested samples, same property as
    * rate-nesting in [[hashKeep]]).
    *
    * One shuffle on `keyCol`; for heavy-hitter strata the same order
    * works under [[Dedup.topKPerKeySalted]]. */
  def exactKPerKey(df: DataFrame, k: Int, keyCol: String, idCol: String,
      salt: String = "graft"): DataFrame =
    Dedup.topKPerKey(df, k, Seq(keyCol),
      Seq(md5(concat(col(idCol).cast("string"), lit(":" + salt))), col(idCol)))

  /** Pack documents into fixed-budget training sequences: within each
    * `keyCol` group, order by `idCol`, and cut a new bin every time the
    * running token total crosses a multiple of `capTokens` (a document
    * whose START offset lies in bin b belongs to bin b). Returns one row
    * per (key, bin) with document count and token totals.
    *
    * This is offset-chunking, not best-fit bin packing — deliberately:
    * it is deterministic, order-preserving, single-pass, and expressible
    * as a prefix sum (bin = (cumsum − tokens) ÷ cap), so it scales as ONE
    * shuffle on `keyCol` (the window and the groupBy share the hash
    * partitioning — Catalyst reuses the exchange) where true bin packing
    * is NP-hard and sequential. Over-cap single documents get a bin of
    * their own rather than being split: splitting is the tokenizer's job.
    */
  def packSequences(df: DataFrame, keyCol: String, idCol: String,
      tokens: Column, capTokens: Long): DataFrame = {
    require(capTokens > 0, s"capTokens must be positive, got $capTokens")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCol).orderBy(idCol)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    df.withColumn("__tok", tokens.cast("long"))
      .withColumn("__bin", ((sum(col("__tok")).over(w) - col("__tok")) / capTokens)
        .cast("long"))
      .groupBy(col(keyCol), col("__bin").as("bin"))
      .agg(count(lit(1)).as("n_docs"), sum(col("__tok")).as("total_tokens"))
  }

  /** Deterministic global shuffle + sharding — the reproducible training
    * order every run of a data pipeline must agree on. Each row gets a
    * pseudo-random rank from the overflow-free Knuth multiplicative hash
    * of `id + seed` (exact integer arithmetic — no `rand()`, identical in
    * any engine; change `seed` for a fresh permutation), a shard
    * `rank mod numShards`, and a position within its shard.
    *
    * Scale shape: NO global sort. The plan is one shuffle on `shard` plus
    * an in-shard sort for the `row_number` — each shard orders
    * independently, which is exactly how shard files are written; a total
    * order across 100 TB would range-partition and serialize on the
    * biggest shard instead. Rank ties are broken by id, so positions are
    * unique and stable. One shard = one window partition = one writer
    * task BY DESIGN (the shard file is the unit of sequential output), so
    * size `numShards` to the corpus: 100 TB runs use tens of thousands of
    * shards, keeping every partition task-sized. */
  def globalShuffle(df: DataFrame, idCol: String, numShards: Int,
      seed: Long = 0L): DataFrame = {
    require(numShards > 0, s"numShards must be positive, got $numShards")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("__rank"), col(idCol))
    df.withColumn("__rank", knuthRank(col(idCol), seed))
      .withColumn("shard", pmod(col("__rank"), lit(numShards.toLong)).cast("int"))
      .withColumn("pos", row_number().over(w).cast("long"))
      .drop("__rank")
  }

  /** Deterministic curriculum layout: documents ordered easy→hard by
    * their EXACT difficulty bucket ([[Correlate.rankBuckets]] — the
    * two-phase ranking, deterministic boundaries) and shuffled WITHIN
    * each bucket by the Knuth rank, laid out as `numShards` shards with
    * a per-shard position ([[globalShuffle]]'s layout) — a training
    * reader walking shards round-robin sees an approximately
    * bucket-ordered, within-bucket-shuffled stream, reproducible
    * across runs and engines (no `rand()` anywhere). Output:
    * `(id, bucket, shard, pos)`.
    *
    * Scale shape: the ranking's value-histogram exchanges + one
    * shard-keyed window ordered by (bucket, rank, id) — per-shard row
    * counts are n/shards by construction, so the window never sees a
    * skewed partition. */
  def curriculumOrder(df: DataFrame, idCol: String, difficulty: Column,
      buckets: Int = 10, numShards: Int = 8, seed: Long = 0L): DataFrame = {
    require(numShards > 0, s"numShards must be positive, got $numShards")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard"))
      .orderBy(col("bucket"), col("__rank"), col(idCol))
    Correlate.rankBuckets(df, idCol, difficulty, buckets)
      .withColumn("__rank", knuthRank(col(idCol), seed))
      .withColumn("shard", pmod(col("__rank"), lit(numShards.toLong)).cast("int"))
      .withColumn("pos", row_number().over(w).cast("long"))
      .select(col(idCol), col("bucket"), col("shard"), col("pos"))
  }

  /** Overflow-free Knuth multiplicative hash of `id + seed` (same form as
    * [[Dedup.capPerKey]]'s rank): exact integer arithmetic, identical in
    * any engine, ANSI-safe for the full Long id range. */
  def knuthRank(id: Column, seed: Long): Column = {
    val A = lit(2654435761L)
    val seedLow = lit(java.lang.Math.floorMod(seed, 4294967296L))
    val m = pmod(pmod(id, lit(4294967296L)) + seedLow, lit(4294967296L))
    val l0 = m.bitwiseAND(lit(65535L))
    val l1 = shiftright(m, 16)
    pmod(l0 * A + pmod(l1 * A, lit(65536L)) * lit(65536L), lit(4294967296L))
  }

  /** Weighted Bernoulli sampling: keep each row with probability
    * `expectK · w / totalW` (truncated at 1) — importance sampling of a
    * corpus by an integer weight (token count, quality score), expected
    * sample size `expectK`, every arithmetic step integer-exact and
    * engine-portable (no `rand()`, no floats): row kept iff
    * `knuthRank(id, seed) < (expectK · 2³² · w) div totalW`.
    *
    * Scale shape: `totalW` is one map-side-combined aggregate broadcast
    * back as a literal-sized row; the keep decision is then a pure
    * scan-stage predicate — no shuffle of the corpus at all.
    *
    * Overflow bound: `expectK · 2³² · w` must stay under 2⁶³, i.e.
    * `expectK · w < 2³¹` — guarded at the driver for the weights the
    * caller supplies via `maxWeight`. */
  def weightedSample(df: DataFrame, idCol: String, weight: Column,
      expectK: Long, maxWeight: Long, seed: Long = 0L): DataFrame = {
    require(expectK > 0, s"expectK must be positive, got $expectK")
    require(maxWeight > 0 && expectK * maxWeight < (1L << 31),
      s"expectK * maxWeight must stay below 2^31 (got $expectK * $maxWeight)")
    // weights are CLAMPED to maxWeight (an over-heavy row caps at the
    // guarded probability instead of silently vanishing); non-positive
    // weights never sample
    val m = df.withColumn("__w", least(weight.cast("long"), lit(maxWeight)))
    val total = m.where(col("__w") > 0).agg(sum(col("__w")).as("__totalW"))
    m.crossJoin(broadcast(total))
      .where(col("__w") > 0)
      .where(knuthRank(col(idCol), seed) <
        expr(s"(${expectK}L * 4294967296L * __w) div __totalW"))
      .drop("__totalW")
  }

  /** Quantile-threshold filter: drop rows whose integer quality metric
    * falls below the corpus's q-quantile (`qNum/qDen`) — the Gopher-style
    * "drop the shortest 10%" gate, integer-exact and engine-portable.
    *
    * Scale shape: NO global sort and no giant window. The quantile comes
    * from a HISTOGRAM — groupBy the metric value (distinct values ≪ rows:
    * token counts, permille scores…), cumulative-sum that tiny table, and
    * broadcast the single threshold row back. The corpus is touched by
    * one map-side-combined aggregation and one broadcast-filtered scan.
    * Ties at the threshold are kept, so at most ⌈q·n⌉ rows drop. */
  def quantileFilter(df: DataFrame, metric: Column, qNum: Int, qDen: Int,
      out: String = "metric"): DataFrame = {
    require(qDen > 0 && qNum >= 0 && qNum <= qDen,
      s"quantile $qNum/$qDen out of range")
    val m = df.withColumn(out, metric.cast("long"))
    val counts = m.groupBy(out).agg(count(lit(1)).as("__c"))
    val w = org.apache.spark.sql.expressions.Window.orderBy(out)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val thr = counts
      .withColumn("__cum", sum(col("__c")).over(w))
      .crossJoin(broadcast(counts.agg(sum(col("__c")).as("__n"))))
      .where(col("__cum") * qDen >= col("__n") * qNum)
      .agg(min(col(out)).as("__thr"))
    m.crossJoin(broadcast(thr)).where(col(out) >= col("__thr")).drop("__thr")
  }

  /** Per-key (per-source) variant of [[quantileFilter]]: drop each KEY's
    * bottom `qNum/qDen` by the metric — the form production quality gates
    * take, because quality-metric distributions differ per source (a
    * permille score that is median for web crawl may be top-decile for
    * code) and a global cut would gut the lower-scoring sources.
    *
    * Same histogram shape, one level down: counts groupBy (key, metric)
    * — map-side-combined, bounded by |keys|·|distinct metric values| —
    * cumulative window over that tiny table (partitioned by key, so no
    * single-partition warning and no skew: partitions hold distinct
    * VALUES, not rows), per-key threshold row broadcast back. Ties at the
    * threshold are kept. Corpus cost: one aggregation + one
    * broadcast-joined scan-stage filter; corpus rows never shuffle. */
  def quantileFilterPerKey(df: DataFrame, keyCol: String, metric: Column,
      qNum: Int, qDen: Int, out: String = "metric"): DataFrame = {
    require(qDen > 0 && qNum >= 0 && qNum <= qDen,
      s"quantile $qNum/$qDen out of range")
    val m = df.withColumn(out, metric.cast("long"))
    val counts = m.groupBy(col(keyCol), col(out)).agg(count(lit(1)).as("__c"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCol).orderBy(out)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy(keyCol)
    val thr = counts
      .withColumn("__cum", sum(col("__c")).over(w))
      .withColumn("__n", sum(col("__c")).over(wAll))
      .where(col("__cum") * qDen >= col("__n") * qNum)
      .groupBy(col(keyCol)).agg(min(col(out)).as("__thr"))
    m.join(broadcast(thr), Seq(keyCol)).where(col(out) >= col("__thr"))
      .drop("__thr")
  }

  /** Data-mixture sampling: realize per-source target weights as a
    * deterministic document selection under a global token budget (the
    * "mix web 50% / books 30% / code 20% into this training run" op).
    * Each listed source gets an integer budget `⌊weight · totalTokens⌋`;
    * its documents are ordered by the reproducible [[knuthRank]] and kept
    * GREEDILY while their prefix-sum START offset is under the budget —
    * so each source lands in `[budget, budget + max_doc_tokens)` selected
    * tokens, every run and every engine picking the identical set.
    * Sources absent from `weights` are excluded (weight 0).
    *
    * Scale shape: a DISTRIBUTED prefix sum, because a plain
    * `SUM() OVER (PARTITION BY source)` window puts an entire source on
    * one task — and at 100 TB one source (web crawl) can be most of the
    * corpus. Two phases, bit-identical result: (1) coarse sums per
    * (source, rank-bucket) — map-side-combined aggregation, hot sources
    * crushed before the shuffle; cumulative-sum the ≤`sources × 8192`
    * bucket table and broadcast the bucket start offsets back; (2) exact
    * within-bucket windows, whose partitions hold ~1/8192 of a source
    * (ranks are pseudo-uniform) — bounded, no straggler. The weights
    * table broadcasts; the corpus shuffles once, on the fine-grained
    * (source, bucket) key. Changing the mixture or budget re-selects
    * WITHOUT re-reading text: inputs are (id, key, token count) — run it
    * over the slim stats projection, not the corpus. */
  def mixSources(df: DataFrame, idCol: String, keyCol: String,
      tokens: Column, weights: Map[String, Double], totalTokens: Long,
      seed: Long = 0L): DataFrame = {
    require(totalTokens > 0, s"totalTokens must be positive, got $totalTokens")
    require(weights.values.forall(w => w >= 0 && w.isFinite),
      "weights must be non-negative and finite")
    val spark = df.sparkSession
    import spark.implicits._
    val budgets = weights.toSeq
      .map { case (k, w) => (k, math.floor(w * totalTokens).toLong) }
      .toDF(keyCol, "__budget")
    // bucket = rank div 2^19: 8192 order-aligned buckets over the 2^32
    // rank space (ties share a rank, hence a bucket — order is exact)
    val base = df.withColumn("__tok", tokens.cast("long"))
      .withColumn("__rank", knuthRank(col(idCol), seed))
      .join(broadcast(budgets), Seq(keyCol))
      .withColumn("__bucket", shiftright(col("__rank"), 19))
    val wB = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCol).orderBy(col("__bucket"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val bucketStarts = base.groupBy(keyCol, "__bucket")
      .agg(sum(col("__tok")).as("__bsum"))
      .withColumn("__bstart", sum(col("__bsum")).over(wB) - col("__bsum"))
      .select(col(keyCol), col("__bucket"), col("__bstart"))
    val wIn = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCol, "__bucket").orderBy(col("__rank"), col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    base.join(broadcast(bucketStarts), Seq(keyCol, "__bucket"))
      .withColumn("__start",
        col("__bstart") + sum(col("__tok")).over(wIn) - col("__tok"))
      .where(col("__start") < col("__budget"))
      .select(col(idCol), col(keyCol), col("__tok").as("tokens"),
        col("__start").as("tok_start"))
  }

  /** Capped proportional budget allocation (waterfilling) — the mixture
    * PLANNER that runs before [[mixSources]]: given each source's
    * AVAILABLE token mass and target weights, split a total budget
    * proportionally, except that a source cannot contribute more than
    * it has — its shortfall redistributes over the still-open sources
    * (the UniMax/epoch-cap problem: "web gets 60% of the budget" is
    * unsatisfiable when web is only 10% of the lake).
    *
    * Synchronous fixed-round semantics (the [[Graph.kCore]] discipline):
    * each round computes every open source's proportional share
    * `R·w div W` in exact integer arithmetic and caps EVERY source
    * whose share covers its availability at once; `rounds` rounds, then
    * the final proportional split of what remains. Engine and an
    * unrolled-CTE oracle agree bit for bit, converged or not (each
    * round caps ≥1 source or is terminal, so `rounds ≥` the number of
    * cap cascades — ≥ |sources| always suffices).
    *
    * Output: `(key, avail, weight, allocated, capped)`. Zero-weight
    * sources allocate 0 (uncapped). `Σ allocated ≤ budget` always;
    * equality up to `div` flooring whenever the open sources can absorb
    * the remainder. `allocated ≤ avail` holds UNCONDITIONALLY: shares
    * compute in BigInt (a budget × weight product wraps a Long silently
    * at realistic token budgets) and the final split clamps each open
    * source at `min(share, avail)`, so even an under-provisioned
    * `rounds` (cap cascades deeper than rounds) can only UNDER-allocate,
    * never hand a source more than it has.
    *
    * Scale shape: `avail` is a ≤|sources|-row aggregate (the corpus
    * collapses once, upstream); the waterfill itself runs on the driver
    * over that bounded list — the broadcast-build-side boundedness
    * precedent — and returns a |sources|-row DataFrame for the
    * downstream broadcast join. */
  def waterfillBudgets(avail: DataFrame, weights: Map[String, Long],
      budget: Long, rounds: Int = 8): DataFrame = {
    require(budget >= 0 && rounds >= 0)
    require(weights.values.forall(_ >= 0), "weights must be non-negative")
    val spark = avail.sparkSession
    import spark.implicits._
    val av = avail.select(col("key").cast("string"), col("avail").cast("long"))
      .as[(String, Long)].collect().toMap
    var capped = Map.empty[String, Long] // key -> allocated (= avail)
    var open = av.keySet.filter(k => weights.getOrElse(k, 0L) > 0L)
    var r = 0
    while (r < rounds) {
      // shares in BigInt: budget × weight products wrap a Long silently
      // at realistic token budgets (the oracle's HUGEINT arithmetic —
      // DuckDB would error, the JVM would just be wrong)
      val w = open.toSeq.map(k => BigInt(weights(k))).sum
      val rem = BigInt(budget) - capped.values.sum
      val caps = if (w == 0) Set.empty[String]
        else open.filter(k => rem * weights(k) / w >= av(k))
      capped ++= caps.map(k => k -> av(k))
      open --= caps
      r = if (caps.isEmpty) rounds else r + 1 // converged: later rounds no-op
    }
    val wFin = open.toSeq.map(k => BigInt(weights(k))).sum
    val remFin = BigInt(budget) - capped.values.sum
    av.keys.toSeq.sorted.map { k =>
      val wk = weights.getOrElse(k, 0L)
      val alloc =
        if (capped.contains(k)) capped(k)
        else if (wk == 0L || wFin == 0) 0L
        // min(share, avail): if the cap cascade did NOT converge within
        // `rounds` (> rounds sources capping one per round), an open
        // source's final share can exceed its availability — the clamp
        // keeps the headline `allocated <= avail` invariant
        // unconditionally (the oracle's LEAST mirrors it)
        else (remFin * wk / wFin).min(BigInt(av(k))).toLong
      (k, av(k), wk, alloc, capped.contains(k))
    }.toDF("key", "avail", "weight", "allocated", "capped")
  }

  /** Epoch/repetition budgeting — the data-constrained-scaling
    * diagnostic [[waterfillBudgets]]'s capped allocator deliberately
    * hides: hold the mixture FIXED (each source gets
    * `budget·w ÷ Σw` tokens regardless of availability) and report
    * what that costs in repetition — `repeat_micro` (allocated/available
    * in micro-units; >10⁶ means the source repeats) and `n_epochs`
    * (ceil of passes over the source). The table a mixture designer
    * reads against the known repetition-harm curves before deciding
    * which sources to cap (and then hands the capped set to waterfill).
    * All arithmetic in DECIMAL(38,0)/HUGEINT — `budget × weight`
    * products wrap a Long at realistic token budgets (the waterfill
    * lesson). Sources without a weight allocate 0. Declarative over the
    * bounded per-source table: Σw is driver-known from the weights map,
    * baked in as a literal — no collect, no cross-join. */
  def epochBudget(sources: DataFrame, weights: Map[String, Long],
      budget: Long): DataFrame = {
    require(budget >= 0)
    require(weights.values.forall(_ >= 0), "weights must be non-negative")
    val sumW = weights.values.map(BigInt(_)).sum.max(BigInt(1))
    val wCol = weights.toSeq.sortBy(_._1).foldLeft(Option.empty[Column]) {
      case (acc, (k, w)) =>
        val c = when(col("key") === k, lit(w))
        Some(acc.fold(c)(_.when(col("key") === k, lit(w))))
    }.fold(lit(0L))(_.otherwise(lit(0L)))
    sources
      .select(col("key").cast("string").as("key"),
        col("avail").cast("long").as("avail"))
      .withColumn("weight", wCol.cast("long"))
      // integral `div`, never decimal `/`: Spark decimal division
      // rounds HALF_UP where DuckDB `//` floors — `div` truncates in
      // both (identical on these non-negative values)
      .withColumn("__a", expr(
        s"(CAST($budget AS DECIMAL(38,0)) * weight) div " +
          s"CAST('$sumW' AS DECIMAL(38,0))"))
      .selectExpr("key", "avail", "weight",
        "CAST(__a AS BIGINT) AS allocated",
        // repeat factor and epoch count are 0 for empty sources (a
        // weighted-but-empty source is upstream breakage the mixture
        // table surfaces as avail = 0, not a division crash)
        """CAST(CASE WHEN avail > 0
          |  THEN CAST(1000000 AS DECIMAL(38,0)) * __a div avail
          |  ELSE 0 END AS BIGINT) AS repeat_micro""".stripMargin,
        """CAST(CASE WHEN avail > 0
          |  THEN (__a + avail - 1) div avail
          |  ELSE 0 END AS BIGINT) AS n_epochs""".stripMargin)
  }

  /** Hashed unigram+bigram feature stream of a document table: one row
    * per n-gram OCCURRENCE, bucketed to `[0, buckets)` via the portable
    * [[graft.functions.F.mix64]] string hash (the shingle family's
    * engine-mirrorable hash — an oracle can replay the bucketing).
    * Pure scan-stage explode: split, adjacent-pair zip, hash — no
    * shuffle, no UDF. */
  private def hashedGramFeatures(df: DataFrame, textCol: String,
      buckets: Int, carry: Seq[Column]): DataFrame = {
    val ws = filter(split(col(textCol), " "), w => w =!= "")
    // zip_with pads the shorter side with null and concat propagates it,
    // so the trailing (last-word, null) pseudo-pair self-filters
    val bi = filter(zip_with(ws, slice(ws, lit(2), greatest(size(ws), lit(1))),
      (a, b) => concat(a, lit(" "), b)), x => x.isNotNull)
    df.select(carry :+ explode(concat(ws, bi)).as("__g"): _*)
      .select(carry :+ pmod(graft.functions.F.mix64(col("__g")),
        lit(buckets.toLong)).as("b"): _*)
  }

  /** DSIR-style importance scores for targeted data selection (the
    * importance-resampling idea of Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling", quantized to this
    * engine's integer-bits discipline): score every corpus document by
    * how much likelier its hashed unigram+bigram features are under a
    * TARGET domain's bucket model than under the raw corpus's own —
    * `dsir_bits = Σ_occurrences (bits_raw(b) − bits_target(b))` where
    * `bits_m(b) = ⌊log₂((N_m + B) div (c_m(b) + 1))⌋` is the add-1-
    * smoothed quantized surprisal of bucket `b` under model `m`
    * ([[graft.functions.IntLog2]], no libm — the exact-oracle stance of
    * the surprisal family). Positive = looks like the target, ~0 =
    * generic, negative = unlike it; select by ranking on the score.
    * Documents with no tokens produce no features and are absent, like
    * [[TextAnalysis.surprisal]]'s contract.
    *
    * 100 TB shape: the corpus is touched by ONE scan-stage featurize +
    * ONE doc-keyed aggregation (map-side partial sums); both bucket
    * models are ≤ `buckets` rows — built by a B-bounded aggregation each
    * and BROADCAST back onto the feature stream; the target set (a
    * domain sample / benchmark) is normally corpus-dwarfed. Nothing
    * shuffles document content. */
  def dsirScores(corpus: DataFrame, target: DataFrame, idCol: String,
      textCol: String, buckets: Int = 1024): DataFrame = {
    require(buckets > 1, "buckets must be > 1")
    val corpusFeat = hashedGramFeatures(corpus, textCol,
      buckets, Seq(col(idCol)))
    val targetFeat = hashedGramFeatures(target, textCol, buckets, Nil)
    val rawCounts = corpusFeat.groupBy("b").agg(count(lit(1)).as("c_r"))
    val tgtCounts = targetFeat.groupBy("b").agg(count(lit(1)).as("c_t"))
    // model totals via an all-rows window over each count table instead
    // of a crossJoined re-aggregation (r18): the crossJoin form
    // referenced each count table twice, and each reference re-ran the
    // corpus/target feature explode — the corpus was tokenized 3× and
    // the target 2× per query (plan audit: 5 source scans; runtime
    // exchange reuse did not recover the differently-shaped consumers).
    // The window runs on the ≤ `buckets`-row aggregate — a single
    // trivial partition — so each feature explode now runs exactly
    // once for the model, and the corpus pays the algorithm's two
    // inherent passes (counts, then scoring under the broadcast model).
    val wAll = org.apache.spark.sql.expressions.Window
      .partitionBy(lit(1)).rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    // full outer so n_t still counts target buckets absent from the
    // corpus (the general contract — registered queries use a subset
    // target, but the totals must not depend on that); rows kept are
    // exactly the old left join's (c_r defined).
    val model = rawCounts.join(tgtCounts, Seq("b"), "full_outer")
      .withColumn("n_r", coalesce(sum("c_r").over(wAll), lit(0L)))
      .withColumn("n_t", coalesce(sum("c_t").over(wAll), lit(0L)))
      .where(col("c_r").isNotNull)
      .na.fill(0L, Seq("c_t"))
      .select(col("b"),
        graft.functions.F.intLog2(
          expr(s"(n_r + $buckets) div (c_r + 1)")).as("bits_r"),
        graft.functions.F.intLog2(
          expr(s"(n_t + $buckets) div (c_t + 1)")).as("bits_t"))
    corpusFeat.join(broadcast(model), Seq("b"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_feats"),
        sum(col("bits_r") - col("bits_t")).as("dsir_bits"))
  }

  /** The selection step over [[dsirScores]]: the `k` most target-like
    * documents, deterministically ranked `(dsir_bits DESC, id)` — DSIR's
    * resampling collapsed to its deterministic top-k limit (the paper's
    * Gumbel noise exists to diversify repeated draws; a one-shot
    * selection wants reproducibility, this engine's sampling stance).
    * One bounded TakeOrdered over the score table — no extra corpus
    * pass. */
  def dsirSelect(corpus: DataFrame, target: DataFrame, idCol: String,
      textCol: String, k: Int, buckets: Int = 1024): DataFrame = {
    require(k > 0, "k must be positive")
    dsirScores(corpus, target, idCol, textCol, buckets)
      .orderBy(col("dsir_bits").desc, col(idCol))
      .limit(k)
  }
}
