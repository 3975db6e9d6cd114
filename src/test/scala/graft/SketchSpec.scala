package graft

import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.CountMinSketch

/** The approximate-aggregate surface a 100 TB profile leans on (one pass,
  * mergeable, bounded memory) — property-tested against exact answers on
  * the events table: HLL cardinality within its error bound, count-min
  * estimates always over (never under), Bloom filters with no false
  * negatives. */
class SketchSpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val events = Tables.events(spark, "/root/testdata/sf0.01")

  test("approx_count_distinct (HLL) is within 5% of exact per group") {
    val rows = events.groupBy("event_type").agg(
      countDistinct(col("user_id")).as("exact"),
      approx_count_distinct(col("user_id"), 0.02).as("approx"))
      .as[(String, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (t, exact, approx) =>
      assert(math.abs(approx - exact).toDouble / exact <= 0.05,
        s"$t: exact=$exact approx=$approx")
    }
  }

  test("count-min sketch never underestimates a key's frequency") {
    val eps = 0.001; val conf = 0.99
    val bytes = events.select(col("event_type"))
      .stat.countMinSketch("event_type", eps, conf, seed = 42)
    val truth = events.groupBy("event_type").count()
      .as[(String, Long)].collect().toMap
    val total = truth.values.sum
    truth.foreach { case (k, n) =>
      val est = bytes.estimateCount(k)
      assert(est >= n, s"$k: est=$est < true=$n")
      assert(est <= n + (eps * total).ceil.toLong + 1,
        s"$k: est=$est exceeds bound for true=$n")
    }
  }

  test("bottom-k sample merges losslessly and estimates quantiles in bound") {
    import graft.operators.Sketch
    val df = (0L until 10000L).map(i => (i, i % 1000)).toDF("id", "v")
    // mergeability is EXACT: bottom-k(whole) == bottom-k(bottom-k(half1) ∪ bottom-k(half2))
    val whole = Sketch.bottomK(df, "id", 200, seed = 9L)
      .select("id").as[Long].collect().toSet
    val h1 = Sketch.bottomK(df.where(col("id") < 5000), "id", 200, seed = 9L)
    val h2 = Sketch.bottomK(df.where(col("id") >= 5000), "id", 200, seed = 9L)
    val merged = Sketch.bottomK(h1.unionByName(h2), "id", 200, seed = 9L)
      .select("id").as[Long].collect().toSet
    assert(merged == whole)
    // quantile accuracy: v uniform over 0..999 -> p50 near 500, p90 near
    // 900; rank error O(n/sqrt(k)) ~ 7% of range at k=200 (3 sigma)
    val est = Sketch.bottomKQuantiles(df, "id", col("v"), k = 200,
      qs = Seq(10, 50, 90), seed = 9L)
      .as[(Long, Long, Long)].head()
    assert(math.abs(est._1 - 100) < 120, s"p10=${est._1}")
    assert(math.abs(est._2 - 500) < 120, s"p50=${est._2}")
    assert(math.abs(est._3 - 900) < 120, s"p90=${est._3}")
    // deterministic
    val again = Sketch.bottomKQuantiles(df, "id", col("v"), 200,
      Seq(10, 50, 90), seed = 9L).as[(Long, Long, Long)].head()
    assert(again == est)
  }

  test("bloom filter has no false negatives on inserted keys") {
    val bf = events.stat.bloomFilter("user_id", expectedNumItems = 1000, fpp = 0.03)
    val users = events.select("user_id").distinct().as[Long].collect()
    users.foreach(u => assert(bf.mightContain(u), s"false negative for $u"))
    // fpp sanity: absent keys mostly rejected
    val absent = (1000000L to 1000500L).count(bf.mightContain)
    assert(absent < 100, s"$absent/500 false positives at fpp=0.03")
  }

  test("countMinEstimates: never under; exact at ample width; collisions only overestimate") {
    val freqs = Seq(("a", 100L), ("b", 50L), ("c", 10L), ("d", 7L),
      ("e", 3L), ("f", 1L)).toDF("item", "cnt")
    // ample width: 6 items over 4x256 counters collide with negligible
    // probability under the fixed hash — estimates are exact
    val wide = graft.operators.Sketch
      .countMinEstimates(freqs, "item", "cnt", depth = 4, width = 256)
      .as[(String, Long, Long, Long)].collect()
    assert(wide.forall { case (_, exact, est, over) =>
      est == exact && over == 0L }, wide.toSeq.toString)
    // forced collisions: width 2 packs 6 items into 2 buckets per row —
    // the CM guarantee (never under) must hold, and SOMETHING must
    // overestimate (6 items cannot be collision-free in 2 buckets)
    val narrow = graft.operators.Sketch
      .countMinEstimates(freqs, "item", "cnt", depth = 2, width = 2)
      .as[(String, Long, Long, Long)].collect()
    assert(narrow.forall { case (_, exact, est, _) => est >= exact },
      s"CM under-estimated: ${narrow.toSeq}")
    assert(narrow.exists(_._4 > 0L),
      s"width 2 produced no collisions: ${narrow.toSeq}")
    // mergeability: counters are sums, so sketching a union equals
    // summing per-half exact tables first — estimates over the union
    // input match a single-pass sketch of the combined frequencies
    val h1 = Seq(("a", 60L), ("b", 20L)).toDF("item", "cnt")
    val h2 = Seq(("a", 40L), ("b", 30L), ("c", 10L)).toDF("item", "cnt")
    val merged = h1.unionByName(h2).groupBy("item")
      .agg(sum("cnt").as("cnt"))
    val viaUnion = graft.operators.Sketch
      .countMinEstimates(merged, "item", "cnt", depth = 4, width = 64)
      .as[(String, Long, Long, Long)].collect().toSet
    val direct = graft.operators.Sketch
      .countMinEstimates(
        Seq(("a", 100L), ("b", 50L), ("c", 10L)).toDF("item", "cnt"),
        "item", "cnt", depth = 4, width = 64)
      .as[(String, Long, Long, Long)].collect().toSet
    assert(viaUnion == direct)
  }
}
