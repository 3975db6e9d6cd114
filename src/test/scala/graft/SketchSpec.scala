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

  test("bloom filter has no false negatives on inserted keys") {
    val bf = events.stat.bloomFilter("user_id", expectedNumItems = 1000, fpp = 0.03)
    val users = events.select("user_id").distinct().as[Long].collect()
    users.foreach(u => assert(bf.mightContain(u), s"false negative for $u"))
    // fpp sanity: absent keys mostly rejected
    val absent = (1000000L to 1000500L).count(bf.mightContain)
    assert(absent < 100, s"$absent/500 false positives at fpp=0.03")
  }
}
