package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions.col

import graft.SparkSpecBase

class AnomalySpec extends SparkSpecBase {
  import spark.implicits._

  private def ev(key: String, day: Long, n: Int): Seq[(Timestamp, String)] =
    (1 to n).map(_ => (new Timestamp(day * 86400L * 1000L), key))

  private def flagged(rows: Seq[(Timestamp, String)]) =
    Anomaly.madOutlierDays(rows.toDF("ts", "event_type"), "ts", "event_type")
      .as[(String, Long, Long, Long, Long)].collect().toSet

  test("madOutlierDays: spike flags against a stable history (MAD 0 path)") {
    // key a: [5,5,5,5,50] → med 5, every dev 0 except the spike, MAD 0 —
    // the strictest reading: any deviation flags. key b never flags.
    val rows =
      (0L to 3L).flatMap(d => ev("a", d, 5)) ++ ev("a", 4L, 50) ++
      (0L to 2L).flatMap(d => ev("b", d, 3))
    assert(flagged(rows) == Set(("a", 4L, 50L, 5L, 0L)))
  }

  test("madOutlierDays: lower median with an even day count; in-band days pass") {
    // key c: [1,2,3,4] → lower med = 2, devs [1,0,1,2] → lower MAD = 1;
    // no dev exceeds 3·1. (A double-division median bug would lose the
    // median row entirely for even counts — this pins the div path.)
    val rows = Seq(1, 2, 3, 4).zipWithIndex.flatMap { case (n, d) =>
      ev("c", d.toLong, n)
    }
    assert(flagged(rows).isEmpty)
  }

  test("gapFill: zero-filled axis, forward-filled last_n, gap ages") {
    // key g observed on days 10 (2 events) and 13 (1): axis 10..13,
    // silent days 11-12 carry n=0, last_n=2, gap_age 1 then 2.
    val rows = ev("g", 10L, 2) ++ ev("g", 13L, 1) ++ ev("h", 5L, 4)
    val out = TimeSeries.gapFill(rows.toDF("ts", "event_type"), "ts", "event_type")
      .as[(String, Long, Long, Long, Long)].collect().toSet
    assert(out == Set(
      ("g", 10L, 2L, 2L, 0L), ("g", 11L, 0L, 2L, 1L),
      ("g", 12L, 0L, 2L, 2L), ("g", 13L, 1L, 1L, 0L),
      ("h", 5L, 4L, 4L, 0L)))
  }

  test("rollingActive: cover-exploded WAU matches hand-counted windows; clipped tail") {
    // u1 active days 0 and 3, u2 active day 1, window 3:
    // day0 {u1}, day1 {u1,u2}, day2 {u1,u2}, day3 {u1,u2}; dau day2 = 0
    val rows = ev("u1", 0L, 1) ++ ev("u1", 3L, 2) ++ ev("u2", 1L, 1)
    val out = TimeSeries.rollingActive(
        rows.toDF("ts", "user_id"), "ts", keyCol = "user_id", windowDays = 3)
      .as[(Long, Long, Long)].collect().toSet
    assert(out == Set((0L, 1L, 1L), (1L, 1L, 2L), (2L, 0L, 2L), (3L, 1L, 2L)))
    // a total outage longer than the window reads as explicit zero rows
    // (the days a monitor pages on), not as missing rows
    val gap = TimeSeries.rollingActive(
        (ev("u1", 0L, 1) ++ ev("u1", 6L, 1)).toDF("ts", "user_id"),
        "ts", keyCol = "user_id", windowDays = 3)
      .as[(Long, Long, Long)].collect().toSet
    assert(gap == Set((0L, 1L, 1L), (1L, 0L, 1L), (2L, 0L, 1L),
      (3L, 0L, 0L), (4L, 0L, 0L), (5L, 0L, 0L), (6L, 1L, 1L)))
  }

  test("spearmanMicro: perfect, inverse, partial, and monotone invariance") {
    def rho(pairs: Seq[(Long, Long)]): Long =
      Correlate.spearmanMicro(
        pairs.zipWithIndex.map { case ((a, b), i) => (i.toLong, a, b) }
          .toDF("doc_id", "a", "b"),
        col("a"), col("b"), "doc_id")
        .select("rho_micro").as[Long].head()
    assert(rho(Seq((1L, 10L), (2L, 20L), (3L, 30L))) == 1000000L)
    assert(rho(Seq((1L, 3L), (2L, 2L), (3L, 1L))) == -1000000L)
    // d^2 = 4 at n=4: 1e6 - 6e6*4 div (4*15) = 600000
    assert(rho(Seq((1L, 2L), (2L, 1L), (3L, 4L), (4L, 3L))) == 600000L)
    // ranks are order statistics: scaling one side can't change rho
    assert(rho(Seq((1L, 9L), (5L, 2L), (3L, 4L), (8L, 1L))) ==
      rho(Seq((1L, 900L), (5L, 200L), (3L, 400L), (8L, 100L))))
  }

  test("rankBuckets: exact floor buckets over 10 rows into quartiles; null drops") {
    val docs = ((1L to 10L).map(i => (i, Some(i * 7 % 11))) :+
      (99L, Option.empty[Long])).toDF("doc_id", "m")
    val got = Correlate.rankBuckets(docs, "doc_id", col("m"), buckets = 4)
      .as[(Long, Long, Long)].collect()
    assert(got.length == 10) // the null-metric row is excluded
    val byBucket = got.groupBy(_._3).view.mapValues(_.length).toMap
    // (rank-1)*4 div 10 + 1 over ranks 1..10 → sizes 3, 2, 3, 2
    assert(byBucket == Map(1L -> 3, 2L -> 2, 3L -> 3, 4L -> 2))
    // ranks are the (value, id) permutation: smallest m gets rank 1
    val minId = (1L to 10L).minBy(i => (i * 7 % 11, i))
    assert(got.find(_._1 == minId).get._2 == 1L)
  }

  test("rankBlend: hand ranks, id tie-break, null metric excludes the row") {
    val docs = Seq(
      (1L, Some(10L), Some(5L)),
      (2L, Some(20L), Some(1L)),
      (3L, Some(15L), Some(9L)),
      (5L, Some(10L), Some(7L)), // m1 ties doc 1 → id breaks it
      (4L, None, Some(2L))) // null metric: excluded entirely
      .toDF("doc_id", "m1", "m2")
    val got = Correlate.rankBlend(docs, "doc_id", Seq(col("m1"), col("m2")))
      .as[(Long, Long, Long, Long)].collect().toSet
    // m1 asc: 10@1→1, 10@5→2, 15@3→3, 20@2→4
    // m2 asc: 1@2→1, 5@1→2, 7@5→3, 9@3→4
    assert(got == Set((1L, 1L, 2L, 3L), (2L, 4L, 1L, 5L),
      (3L, 3L, 4L, 7L), (5L, 2L, 3L, 5L)))
  }

  test("madOutlierDays: noisy history raises the bar (MAD > 0 suppresses)") {
    // key d: [10,14,10,14,10,22]: sorted [10,10,10,14,14,22] → lower med
    // (pos 3) = 10; devs [0,4,0,4,0,12] sorted → lower MAD (pos 3) = 0...
    // devs sorted: [0,0,0,4,4,12], pos (6+1) div 2 = 3 → MAD 0 → the
    // 4-deviation days DO flag under the strict rule along with 22.
    val rows = Seq(10, 14, 10, 14, 10, 22).zipWithIndex.flatMap {
      case (n, d) => ev("d", d.toLong, n)
    }
    val f = flagged(rows)
    assert(f.map(_._2) == Set(1L, 3L, 5L))
    assert(f.forall { case (_, _, _, med, mad) => med == 10L && mad == 0L })
  }

  test("fanoFactor: hand-computed dispersion; constant series reads 0") {
    // key e: day counts [3,1] → d=2 Σx=4 Σx²=10,
    //   F = (2·10 − 16)·1000 // (2·4) = 500
    // key f: day counts [2,2] → variance 0 → F = 0
    val rows = ev("e", 0L, 3) ++ ev("e", 1L, 1) ++
      ev("f", 0L, 2) ++ ev("f", 3L, 2)
    val got = TimeSeries.fanoFactor(rows.toDF("ts", "event_type"),
        "ts", "event_type")
      .as[(String, Long, Long, Long, Long)].collect().toSet
    assert(got == Set(("e", 2L, 4L, 10L, 500L), ("f", 2L, 4L, 8L, 0L)))
  }

  test("autocorrMilli: period-2 series reads strongly negative at lag 1") {
    // key p, days 0..3, x = [3,1,3,1]: d=4 S=8 dev=[4,−4,4,−4] den=64
    // lag1 num = −48 → −750; lag7 has no pairs on a 4-day axis → NULL
    val rows = ev("p", 0L, 3) ++ ev("p", 1L, 1) ++
      ev("p", 2L, 3) ++ ev("p", 3L, 1)
    val got = autocorr(rows)
    assert(got == Set(("p", 1L, 4L, Some(-750L)), ("p", 7L, 4L, None)))
  }

  test("autocorrMilli: silent days zero-fill; constant series reads NULL") {
    // key q observed days 0 and 2 (3 each): series [3,0,3], dev=[3,−6,3],
    // den=54, lag1 num = −36 → −666 (toward-zero == floor via sign/abs)
    // key r constant [5,5]: den = 0 → NULL at every lag
    val rows = ev("q", 0L, 3) ++ ev("q", 2L, 3) ++
      ev("r", 0L, 5) ++ ev("r", 1L, 5)
    val got = autocorr(rows)
    assert(got == Set(
      ("q", 1L, 3L, Some(-666L)), ("q", 7L, 3L, None),
      ("r", 1L, 2L, None), ("r", 7L, 2L, None)))
  }

  test("autocorrMilli: hard weekly cycle dominates lag 7 on a 21-day axis") {
    // spike of 8 events every 7th day over days 0..20, else 1 event:
    // x_{t+7} = x_t for every pair, so the lag-7 products are pure dev²
    // over days 0..13 — num = 2·126² + 12·21² = 37044 against
    // den = 3·126² + 18·21² = 55566 (all 21 days): r7 = 666 exactly,
    // the standard (d−ℓ)/d-style shrinkage of a perfect cycle
    val rows = (0L to 20L).flatMap(d =>
      ev("w", d, if (d % 7 == 0) 8 else 1))
    val got = autocorr(rows)
    assert(got.contains(("w", 7L, 21L, Some(666L))))
  }

  test("changepointDay: step shift peaks at the last low day; flanking rates") {
    // key s, days 0..3, x = [1,1,5,5]: d=4 S=12, C = 4·cumx − idx·12 =
    // [−8,−16,−8,0] → peak |16| at day 1; cusum = 16000 // 48 = 333;
    // before = 2/2 days = 1000 milli, after = 10/2 = 5000 milli
    val rows = ev("s", 0L, 1) ++ ev("s", 1L, 1) ++
      ev("s", 2L, 5) ++ ev("s", 3L, 5)
    assert(changepoint(rows) ==
      Set(("s", 4L, 12L, 1L, 333L, Some(1000L), Some(5000L))))
  }

  test("changepointDay: steady rate reads 0 at the earliest day; 1-day axis") {
    // key u [2,2,2]: every C_t = 0 → earliest-day tie-break, permille 0,
    // both rates the true 2000 milli. key v: single day → after = NULL
    val rows = (0L to 2L).flatMap(d => ev("u", d, 2)) ++ ev("v", 5L, 3)
    assert(changepoint(rows) == Set(
      ("u", 3L, 6L, 0L, 0L, Some(2000L), Some(2000L)),
      ("v", 1L, 3L, 5L, 0L, Some(3000L), None)))
  }

  test("trendSlopeMilli: hand OLS slopes; zero-filled symmetry; 1-day NULL") {
    // t1 [1,2,3] → slope exactly +1.0/day; t2 [3,1] → −2.0/day;
    // t3 observed days 0 and 2 (3 each, silent middle zero-fills) →
    // symmetric series [3,0,3] → slope 0; t4 single day → NULL
    val rows = ev("t1", 0L, 1) ++ ev("t1", 1L, 2) ++ ev("t1", 2L, 3) ++
      ev("t2", 0L, 3) ++ ev("t2", 1L, 1) ++
      ev("t3", 0L, 3) ++ ev("t3", 2L, 3) ++ ev("t4", 9L, 5)
    val got = TimeSeries.trendSlopeMilli(rows.toDF("ts", "event_type"),
        "ts", "event_type")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)))).toSet
    assert(got == Set(("t1", 3L, 6L, Some(1000L)),
      ("t2", 2L, 4L, Some(-2000L)),
      ("t3", 3L, 6L, Some(0L)), ("t4", 1L, 5L, None)))
  }

  test("dowProfile: zero-filled weekday means and shares; silent day counts") {
    // key w, days 0..8 (dow 0,1,2,0,1,2,0,1,2 mod 7 → 0..6,0,1):
    // observed only days 0 (4 events) and 7 (2): axis 0..7 zero-fills
    // days 1-6. dow0 = days {0, 7}: 2 axis days, 6 events, mean 3000,
    // share 1000; dow1..6: 1 axis day each, 0 events
    val rows = ev("w", 0L, 4) ++ ev("w", 7L, 2)
    val got = TimeSeries.dowProfile(rows.toDF("ts", "event_type"),
        "ts", "event_type")
      .as[(String, Long, Long, Long, Long, Long)].collect().toSet
    val silent = (1L to 6L).map(d => ("w", d, 1L, 0L, 0L, 0L)).toSet
    assert(got == silent + (("w", 0L, 2L, 6L, 3000L, 1000L)))
  }

  private def changepoint(rows: Seq[(Timestamp, String)]) =
    TimeSeries.changepointDay(rows.toDF("ts", "event_type"),
        "ts", "event_type")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4),
        if (r.isNullAt(5)) None else Some(r.getLong(5)),
        if (r.isNullAt(6)) None else Some(r.getLong(6)))).toSet

  private def autocorr(rows: Seq[(Timestamp, String)]) =
    TimeSeries.autocorrMilli(rows.toDF("ts", "event_type"),
        "ts", "event_type")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)))).toSet

  test("fanoFactor: bursty key reads far above the Poisson line") {
    // key g: [10, 0-silent, 10, 1] over observed days [10,10,1]:
    // d=3 Σx=21 Σx²=201, F = (603 − 441)·1000 // 63 = 2571
    val rows = ev("g", 0L, 10) ++ ev("g", 2L, 10) ++ ev("g", 3L, 1)
    val got = TimeSeries.fanoFactor(rows.toDF("ts", "event_type"),
        "ts", "event_type")
      .as[(String, Long, Long, Long, Long)].collect().toSet
    assert(got == Set(("g", 3L, 21L, 201L, 2571L)))
  }
}
