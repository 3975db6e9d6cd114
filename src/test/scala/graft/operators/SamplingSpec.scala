package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

class SamplingSpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val ids = (0L until 2000L).toDF("id")

  test("splitAssign: total coverage, weight-accurate, group-atomic, deterministic") {
    val splits = Seq(("train", 0.8), ("val", 0.1), ("test", 0.1))
    val assigned = ids.select(col("id"),
      Sampling.splitAssign(col("id"), splits, "s42").as("split"))
    val counts = assigned.groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // every row lands in exactly one split
    assert(counts.values.sum == 2000L)
    assert(counts.keySet == Set("train", "val", "test"))
    // 2000 uniform draws: train ~1600 (σ≈17.9, ±5σ), val/test ~200 (σ≈13.4)
    assert(math.abs(counts("train") - 1600) < 90, s"train=${counts("train")}")
    assert(math.abs(counts("val") - 200) < 67, s"val=${counts("val")}")
    // keyed assignment: every row with the same key gets the same split
    val byGroup = ids.withColumn("g", col("id") % 7)
      .select(col("g"), Sampling.splitAssign(col("g"), splits, "s42").as("split"))
      .distinct().groupBy("g").count().where(col("count") > 1).count()
    assert(byGroup == 0, "a group straddled two splits")
    // stable across evaluation
    assert(assigned.collect().toSeq == assigned.collect().toSeq)
  }

  test("splitAssign: weights normalize; single split takes everything") {
    val two = ids.select(Sampling.splitAssign(col("id"),
      Seq(("a", 2.0), ("b", 2.0)), "s").as("split"))
      .groupBy("split").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(two("a") - 1000) < 112) // rate 0.5, σ≈22.4, ±5σ
    val one = ids.select(Sampling.splitAssign(col("id"),
      Seq(("all", 3.0)), "s").as("split")).distinct().collect()
    assert(one.map(_.getString(0)).toSeq == Seq("all"))
  }

  test("hashKeep: deterministic, rate-accurate, and nested by rate") {
    val at = Map(0.1 -> ids.where(Sampling.hashKeep(col("id"), 0.1, "s")),
      0.5 -> ids.where(Sampling.hashKeep(col("id"), 0.5, "s")))
    val n10 = at(0.1).count()
    // md5 is uniform: 2000 draws at rate 0.1 → ~200 ± 5σ (σ≈13.4)
    assert(math.abs(n10 - 200) < 67, s"rate 0.1 kept $n10 of 2000")
    // re-evaluation is identical (no rand() anywhere)
    assert(at(0.1).collect().toSeq == at(0.1).collect().toSeq)
    // a lower-rate sample is a SUBSET of a higher-rate one (same salt):
    // hash < t1 < t2 — the property that makes samples shrinkable/growable
    // without resampling
    val s10 = at(0.1).as[Long].collect().toSet
    val s50 = at(0.5).as[Long].collect().toSet
    assert(s10.subsetOf(s50))
    // degenerate rates short-circuit
    assert(ids.where(Sampling.hashKeep(col("id"), 0.0, "s")).count() == 0)
    assert(ids.where(Sampling.hashKeep(col("id"), 1.0, "s")).count() == 2000)
    // different salt → a different (independent) sample
    val sOther = ids.where(Sampling.hashKeep(col("id"), 0.1, "t"))
      .as[Long].collect().toSet
    assert(sOther != s10)
  }

  test("hashKeep: consistent across tables (join-preserving)") {
    val other = ids.withColumn("v", col("id") * 2)
    val a = ids.where(Sampling.hashKeep(col("id"), 0.3, "s")).as[Long].collect().toSet
    val b = other.where(Sampling.hashKeep(col("id"), 0.3, "s"))
      .select("id").as[Long].collect().toSet
    assert(a == b, "same id+salt must sample identically in every table")
  }

  test("stratified: per-stratum rates with default") {
    val df = (0L until 3000L).map(i => (i, s"k${i % 3}")).toDF("id", "key")
    val out = Sampling.stratified(df, "key", "id",
      rates = Map("k0" -> 0.0, "k1" -> 1.0), defaultRate = 0.5)
    val byKey = out.groupBy("key").count().as[(String, Long)].collect().toMap
    assert(!byKey.contains("k0"))
    assert(byKey("k1") == 1000L)
    assert(math.abs(byKey("k2") - 500L) < 80, s"default-rate stratum: $byKey")
  }

  test("packSequences: prefix-sum binning, conservation, over-cap docs") {
    // key a: tokens 300,300,300 with cap 512 → starts at 0,300,600 →
    // bins 0,0,1. key b: a single 2000-token doc → its own bin 0.
    val df = Seq(("a", 1L, 300L), ("a", 2L, 300L), ("a", 3L, 300L),
      ("b", 9L, 2000L)).toDF("key", "id", "tok")
    val out = Sampling.packSequences(df, "key", "id", col("tok"), 512L)
      .as[(String, Long, Long, Long)].collect().toSet
    assert(out == Set(("a", 0L, 2L, 600L), ("a", 1L, 1L, 300L),
      ("b", 0L, 1L, 2000L)))
    // conservation: every doc lands in exactly one bin
    val packed = Sampling.packSequences(df, "key", "id", col("tok"), 512L)
    assert(packed.agg(sum("n_docs"), sum("total_tokens"))
      .as[(Long, Long)].head() == ((4L, 2900L)))
  }

  test("exactKPerKey: exactly k per stratum, deterministic, nested in k") {
    val df = (0L until 900L).map(i => (i, s"k${i % 3}")).toDF("id", "key")
    val s5 = Sampling.exactKPerKey(df, 5, "key", "id")
    val byKey = s5.groupBy("key").count().as[(String, Long)].collect().toMap
    assert(byKey == Map("k0" -> 5L, "k1" -> 5L, "k2" -> 5L))
    // deterministic re-evaluation
    assert(s5.select("id").as[Long].collect().toSet ==
      Sampling.exactKPerKey(df, 5, "key", "id").select("id").as[Long].collect().toSet)
    // growing k keeps the k=5 sample as a subset
    val s9 = Sampling.exactKPerKey(df, 9, "key", "id").select("id").as[Long].collect().toSet
    assert(s5.select("id").as[Long].collect().toSet.subsetOf(s9))
    // k larger than the stratum returns the whole stratum
    val tiny = Seq((1L, "a"), (2L, "a")).toDF("id", "key")
    assert(Sampling.exactKPerKey(tiny, 5, "key", "id").count() == 2)
  }

  test("globalShuffle: deterministic permutation, contiguous shard positions") {
    val df = (0L until 500L).map(i => (i, s"doc$i")).toDF("id", "payload")
    val out = Sampling.globalShuffle(df, "id", numShards = 8, seed = 42L)
      .select("id", "shard", "pos").as[(Long, Int, Long)].collect()
    assert(out.length == 500)
    // same seed → identical assignment
    val again = Sampling.globalShuffle(df, "id", numShards = 8, seed = 42L)
      .select("id", "shard", "pos").as[(Long, Int, Long)].collect()
    assert(out.sortBy(_._1).sameElements(again.sortBy(_._1)))
    // different seed → a different permutation
    val other = Sampling.globalShuffle(df, "id", numShards = 8, seed = 7L)
      .select("id", "shard", "pos").as[(Long, Int, Long)].collect()
    assert(!out.sortBy(_._1).sameElements(other.sortBy(_._1)))
    // every shard used; positions within a shard are exactly 1..n
    val byShard = out.groupBy(_._2)
    assert(byShard.keySet == (0 until 8).toSet)
    byShard.values.foreach { rows =>
      assert(rows.map(_._3).sorted.toSeq == (1L to rows.length).toSeq)
    }
    // the order is not the identity (it actually shuffles)
    val shard0 = out.filter(_._2 == 0).sortBy(_._3).map(_._1).toSeq
    assert(shard0 != shard0.sorted)
  }

  test("mixSources: budgets realized greedily, unlisted sources excluded") {
    val df = (0L until 300L).map(i => (i, s"s${i % 3}", "x " * 20))
      .toDF("id", "src", "text")
    val tok = lit(20L)
    val out = Sampling.mixSources(df, "id", "src", tok,
      weights = Map("s0" -> 0.6, "s1" -> 0.4), totalTokens = 1000L, seed = 1L)
      .select("id", "src", "tokens", "tok_start")
      .as[(Long, String, Long, Long)].collect()
    // s2 unlisted -> absent
    assert(out.forall(_._2 != "s2"))
    val bySrc = out.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    // budgets 600/400, docs of 20 tokens: selection covers the budget
    // exactly (20 | 600 and 20 | 400)
    assert(bySrc == Map("s0" -> 600L, "s1" -> 400L))
    // determinism and seed sensitivity
    val again = Sampling.mixSources(df, "id", "src", tok,
      Map("s0" -> 0.6, "s1" -> 0.4), 1000L, seed = 1L)
      .select("id").as[Long].collect().toSet
    assert(again == out.map(_._1).toSet)
    val other = Sampling.mixSources(df, "id", "src", tok,
      Map("s0" -> 0.6, "s1" -> 0.4), 1000L, seed = 2L)
      .select("id").as[Long].collect().toSet
    assert(other != again)
  }

  test("mixSources: distributed prefix sum equals the naive global window") {
    import org.apache.spark.sql.expressions.Window
    // random-ish ragged weights across skewed sources (s0 has 10x the docs)
    val rows = (0L until 900L).map(i => (i, "s0", 3L + i % 17)) ++
      (900L until 1000L).map(i => (i, "s1", 5L + i % 7))
    val df = rows.toDF("id", "src", "tok")
    val weights = Map("s0" -> 0.7, "s1" -> 0.3)
    val dist = Sampling.mixSources(df, "id", "src", col("tok"),
      weights, totalTokens = 2500L, seed = 11L)
      .select("id", "tok_start").as[(Long, Long)].collect().toMap
    // naive reference: one SUM() OVER (PARTITION BY src) global window
    val naive = df
      .withColumn("__rank", Sampling.knuthRank(col("id"), 11L))
      .withColumn("__budget",
        when(col("src") === "s0", 1750L).otherwise(750L))
      .withColumn("__start",
        sum(col("tok")).over(Window.partitionBy("src")
          .orderBy(col("__rank"), col("id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
          - col("tok"))
      .where(col("__start") < col("__budget"))
      .select("id", "__start").as[(Long, Long)].collect().toMap
    assert(dist == naive)
  }

  test("mixSources: ragged doc sizes overshoot by less than one document") {
    val df = (0L until 100L).map(i => (i, "s0", 7L + (i % 13))).toDF("id", "src", "tok")
    val out = Sampling.mixSources(df, "id", "src", col("tok"),
      Map("s0" -> 1.0), totalTokens = 200L, seed = 5L)
      .select("tokens", "tok_start").as[(Long, Long)].collect()
    val total = out.map(_._1).sum
    val maxDoc = 19L
    assert(total >= 200L && total < 200L + maxDoc)
    // starts are strictly below the budget
    assert(out.forall(_._2 < 200L))
  }

  test("weightedSample: inclusion tracks weight; deterministic; K-accurate") {
    // two weight classes: w=90 rows should be sampled ~9x as often as w=10
    val df = ((0L until 2000L).map(i => (i, 10L)) ++
      (2000L until 4000L).map(i => (i, 90L))).toDF("id", "w")
    val out = Sampling.weightedSample(df, "id", col("w"),
      expectK = 400L, maxWeight = 100L, seed = 3L)
      .select("id").as[Long].collect().toSet
    val light = out.count(_ < 2000L).toDouble
    val heavy = out.count(_ >= 2000L).toDouble
    // expected: light 400*10/100000*2000 = 40? totalW = 2000*10+2000*90 =
    // 200000; p_light = 400*10/200000 = 2% -> 40; p_heavy = 18% -> 360
    assert(out.size > 300 && out.size < 500, s"got ${out.size}")
    assert(heavy / light > 5.0, s"heavy=$heavy light=$light")
    // deterministic
    val again = Sampling.weightedSample(df, "id", col("w"), 400L, 100L, seed = 3L)
      .select("id").as[Long].collect().toSet
    assert(again == out)
    // zero/negative weights never sample; clamping keeps over-heavy rows
    val edge = Seq((1L, 0L), (2L, -5L), (3L, 1000000L)).toDF("id", "w")
    val kept = Sampling.weightedSample(edge, "id", col("w"), 10L, 100L, seed = 1L)
      .select("id").as[Long].collect().toSet
    assert(!kept.contains(1L) && !kept.contains(2L))
  }

  test("quantileFilter: drops below the exact histogram quantile, keeps ties") {
    // metric values 1..100, one row each: 10% quantile threshold = 10
    val df = (1L to 100L).map(i => (i, i)).toDF("id", "m")
    val kept = Sampling.quantileFilter(df, col("m"), 1, 10)
      .select("id").as[Long].collect().toSet
    assert(kept == (10L to 100L).toSet)
    // heavy ties AT the threshold are kept: 50 rows of 5, 50 rows of 9
    val ties = ((1L to 50L).map(i => (i, 5L)) ++ (51L to 100L).map(i => (i, 9L)))
      .toDF("id", "m")
    val keptT = Sampling.quantileFilter(ties, col("m"), 1, 10)
      .select("id").as[Long].collect().toSet
    // cum(5)=50 >= 10 -> threshold 5 -> nothing drops
    assert(keptT.size == 100)
    // q=0 keeps everything; q=1 keeps only the max-metric rows
    assert(Sampling.quantileFilter(df, col("m"), 0, 10).count() == 100)
    assert(Sampling.quantileFilter(df, col("m"), 10, 10)
      .select("id").as[Long].collect().toSet == Set(100L))
  }

  test("quantileFilterPerKey: each key cuts at its OWN quantile") {
    // key a: values 1..100 -> q25 threshold 25; key b: values 1001..1100
    // -> threshold 1025. A global cut at q25 would drop all of a's low
    // half and none of b's.
    val df = ((1L to 100L).map(i => ("a", i, i)) ++
      (1L to 100L).map(i => ("b", i, 1000L + i))).toDF("k", "id", "m")
    val kept = Sampling.quantileFilterPerKey(df, "k", col("m"), 1, 4)
      .select("k", "id").as[(String, Long)].collect().toSet
    assert(kept == ((25L to 100L).map("a" -> _) ++
      (25L to 100L).map("b" -> _)).toSet)
    // single-key input degenerates to the global filter
    val one = (1L to 100L).map(i => ("only", i, i)).toDF("k", "id", "m")
    val perKey = Sampling.quantileFilterPerKey(one, "k", col("m"), 1, 10)
      .select("id").as[Long].collect().toSet
    val global = Sampling.quantileFilter(one, col("m"), 1, 10)
      .select("id").as[Long].collect().toSet
    assert(perKey == global)
    // a constant-valued key keeps everything at any q < 1
    val const = (1L to 20L).map(i => ("c", i, 7L)).toDF("k", "id", "m")
    assert(Sampling.quantileFilterPerKey(const, "k", col("m"), 3, 4)
      .count() == 20)
  }

  test("packSequences: bins are contiguous id ranges in input order") {
    val df = (0L until 100L).map(i => ("k", i, 37L)).toDF("key", "id", "tok")
    // 37 tokens/doc, cap 512: floor(37i/512) must be non-decreasing and
    // each bin's doc count within ceil(512/37)=14 of each other
    val bins = Sampling.packSequences(df, "key", "id", col("tok"), 512L)
      .orderBy("bin").as[(String, Long, Long, Long)].collect()
    assert(bins.map(_._2).toSeq == bins.indices.map(_.toLong))
    assert(bins.forall { case (_, _, n, tok) => tok == n * 37 && n <= 14 })
  }

  private def fill(av: Seq[(String, Long)], w: Map[String, Long], b: Long) =
    Sampling.waterfillBudgets(av.toDF("key", "avail"), w, b)
      .as[(String, Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._4, r._5))).toMap

  test("waterfillBudgets: caps cascade and the shortfall redistributes") {
    // W=4: a's share 500 ≥ 100 and c's 1000 ≥ 1000 cap in round 1;
    // round 2 gives b the remaining 900 (< its 1000) — converged.
    val out = fill(Seq(("a", 100L), ("b", 1000L), ("c", 1000L)),
      Map("a" -> 1L, "b" -> 1L, "c" -> 2L), b = 2000L)
    assert(out == Map("a" -> ((100L, true)), "b" -> ((900L, false)),
      "c" -> ((1000L, true))))
  }

  test("waterfillBudgets: zero weight allocates zero; over-budget caps everything") {
    val z = fill(Seq(("a", 500L), ("d", 500L)),
      Map("a" -> 1L, "d" -> 0L), b = 300L)
    assert(z == Map("a" -> ((300L, false)), "d" -> ((0L, false))))
    val all = fill(Seq(("a", 10L), ("b", 20L)),
      Map("a" -> 1L, "b" -> 1L), b = 10000L)
    assert(all == Map("a" -> ((10L, true)), "b" -> ((20L, true))))
  }

  test("curriculumOrder: bucket-major per-shard order, within-bucket hash shuffle") {
    val docs = (1L to 40L).map(i => (i, i * 13 % 41)).toDF("doc_id", "m")
    val out = Sampling.curriculumOrder(docs, "doc_id", col("m"),
        buckets = 4, numShards = 3, seed = 7L)
      .as[(Long, Long, Int, Long)].collect()
    assert(out.length == 40)
    // per shard: positions are 1..count and bucket never decreases
    out.groupBy(_._3).values.foreach { sh =>
      val ordered = sh.sortBy(_._4)
      assert(ordered.map(_._4).toSeq == (1L to sh.length).toSeq)
      assert(ordered.map(_._2).sliding(2).forall(p =>
        p.length < 2 || p(0) <= p(1)))
    }
    // buckets are the exact quartiles of the metric order
    val byBucket = out.groupBy(_._2).view.mapValues(_.length).toMap
    assert(byBucket == Map(1L -> 10, 2L -> 10, 3L -> 10, 4L -> 10))
  }

  test("epochBudget: fixed-mixture repetition table; empty/unweighted sources") {
    val out = Sampling.epochBudget(
        Seq(("a", 10L), ("b", 100L), ("c", 5L), ("d", 0L))
          .toDF("key", "avail"),
        Map("a" -> 1L, "b" -> 3L, "d" -> 4L), budget = 80L)
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._4, r._5, r._6))).toMap
    assert(out == Map(
      "a" -> ((10L, 1000000L, 1L)), // exactly one epoch
      "b" -> ((30L, 300000L, 1L)), // under-used: 0.3 epochs, ceil 1
      "c" -> ((0L, 0L, 0L)), // no weight → no allocation
      "d" -> ((40L, 0L, 0L)))) // weighted but EMPTY: surfaced, no crash
    // repetition: a 25-token demand against 10 available = 2.5 epochs
    val rep = Sampling.epochBudget(
        Seq(("a", 10L)).toDF("key", "avail"), Map("a" -> 1L), budget = 25L)
      .as[(String, Long, Long, Long, Long, Long)].collect().head
    assert((rep._4, rep._5, rep._6) == ((25L, 2500000L, 3L)))
  }

  test("waterfillBudgets: uncapped split floors by integer div") {
    val out = fill(Seq(("a", 1000000L), ("b", 1000000L)),
      Map("a" -> 3L, "b" -> 7L), b = 10L)
    assert(out == Map("a" -> ((3L, false)), "b" -> ((7L, false))))
  }

  test("waterfillBudgets: budget x weight products do not wrap a Long") {
    // budget ~ 4.6e18 with weight 3: rem * w overflows Int64 (~9.2e18)
    // — BigInt shares must still split proportionally, not go negative
    val b = 4_600_000_000_000_000_000L
    val out = fill(Seq(("a", b), ("b", b)), Map("a" -> 3L, "b" -> 1L), b)
    assert(out("a")._1 == b / 4 * 3 && out("b")._1 == b / 4)
    assert(out.values.map(_._1).sum <= b)
  }

  test("waterfillBudgets: allocated <= avail even when rounds under-provision") {
    // rounds=0 skips the cap cascade entirely — the most extreme
    // under-provisioned case: the final split's raw share for the
    // heavy-weight scarce source (1000*9/10 = 900) exceeds its avail
    // (10). The clamp must hold allocated <= avail unconditionally.
    val out = Sampling.waterfillBudgets(
        Seq(("a", 10L), ("b", 1000L)).toDF("key", "avail"),
        Map("a" -> 9L, "b" -> 1L), budget = 1000L, rounds = 0)
      .as[(String, Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> r._4).toMap
    assert(out("a") == 10L) // clamped at avail, not the 900 raw share
    assert(out("b") == 100L)
    assert(out.values.sum <= 1000L)
  }

  test("dsirScores: target-vocabulary docs outrank disjoint-vocabulary docs") {
    // corpus = 10 "medical" docs (target domain), 10 "legal" docs, plus
    // one held-out medical-like doc and one gibberish doc; the target
    // model is the medical half. The medical-like doc must score strictly
    // above every legal doc and the gibberish doc.
    val med = (0L until 10L).map(i =>
      (i, s"patient dose trial symptom therapy patient dose trial"))
    val leg = (10L until 20L).map(i =>
      (i, s"plaintiff court statute verdict appeal plaintiff court statute"))
    val probe = Seq((100L, "patient therapy dose symptom trial"),
      (101L, "zxq qqv wvx xyzzy plugh"))
    val corpus = (med ++ leg ++ probe).toDF("doc_id", "text")
    val target = med.toDF("doc_id", "text")
    val scores = Sampling.dsirScores(corpus, target, "doc_id", "text",
        buckets = 256)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    val legalMax = (10L until 20L).map(scores).max
    assert(scores(100L) > legalMax,
      s"medical probe ${scores(100L)} vs legal max $legalMax")
    assert(scores(100L) > scores(101L), "gibberish must score below target-like")
    // every in-target doc also outranks every legal doc
    assert((0L until 10L).map(scores).min > legalMax)
    // n_feats = unigrams + bigrams = 8 + 7 for the 8-token docs
    val nf = Sampling.dsirScores(corpus, target, "doc_id", "text", 256)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r._2).toMap
    assert(nf(0L) == 15L, nf(0L).toString)
  }

  test("dsirScores edge contract: 1-word and empty docs; empty target is uniform") {
    val corpus = Seq((1L, "solo"), (2L, ""), (3L, "a b")).toDF("doc_id", "text")
    val target = Seq((9L, "a b")).toDF("doc_id", "text")
    val got = Sampling.dsirScores(corpus, target, "doc_id", "text", 64)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(!got.contains(2L)) // token-less docs have no features
    assert(got(1L)._1 == 1L)  // one unigram, no bigram
    assert(got(3L)._1 == 3L)  // a, b, "a b"
    assert(got(3L)._2 > got(1L)._2) // matches the target exactly
    // empty target: every bucket gets the same uniform bits_t, so the
    // score reduces to Σ bits_r − n_feats·log2-ish constant — well-defined
    val uni = Sampling.dsirScores(corpus, target.where(lit(false)),
      "doc_id", "text", 64).as[(Long, Long, Long)].collect()
    assert(uni.length == 2)
  }

  test("dsirSelect: deterministic top-k by (score desc, id)") {
    val med = (0L until 5L).map(i => (i, "patient dose trial"))
    val other = (5L until 15L).map(i => (i, s"misc$i filler$i noise$i"))
    val corpus = (med ++ other).toDF("doc_id", "text")
    val target = med.toDF("doc_id", "text")
    val sel = Sampling.dsirSelect(corpus, target, "doc_id", "text",
      k = 5, buckets = 128).select("doc_id").as[Long].collect()
    assert(sel.toSet == (0L until 5L).toSet, sel.toSeq.toString)
    // ranked output is ordered by (dsir_bits desc, doc_id)
    val full = Sampling.dsirSelect(corpus, target, "doc_id", "text",
      k = 15, buckets = 128).as[(Long, Long, Long)].collect()
    assert(full.sliding(2).forall { case Array(a, b) =>
      a._3 > b._3 || (a._3 == b._3 && a._1 < b._1) })
  }
}
