package graft.operators

import java.nio.file.Files
import java.sql.Timestamp

import graft.SparkSpecBase

/** The persisted daily-count profile: additive cross-batch folding,
  * replay guard, and the contract that matters — every daily-series
  * monitor reads the SAME numbers from the fold as from a full event
  * scan. */
class DailyCountsSpec extends SparkSpecBase {
  import spark.implicits._

  private def tmp(name: String): String =
    Files.createTempDirectory(name).toString + "/profile"

  private def ev(key: String, day: Long, n: Int): Seq[(Timestamp, String, Long)] =
    (1 to n).map(i => (new Timestamp(day * 86400L * 1000L + i * 1000L), key,
      day * 1000 + i))

  private val rows =
    ev("a", 10L, 3) ++ ev("a", 11L, 1) ++ ev("a", 13L, 5) ++ ev("b", 11L, 2)
  private def events = rows.toDF("ts", "event_type", "event_id")

  test("two disjoint folds reconstruct the exact (key, day) census; replay is a no-op") {
    val root = tmp("dc")
    // split by event-id parity: both halves hit the SAME (key, day)
    // cells, so the merge exercises cross-batch addition, not disjoint
    // union
    DailyCounts.update(spark, root,
      events.where($"event_id" % 2 === 0), "event_type", "ts",
      batchId = Some(1L))
    DailyCounts.update(spark, root,
      events.where($"event_id" % 2 === 1), "event_type", "ts",
      batchId = Some(2L))
    val got = DailyCounts.read(spark, root)
      .as[(String, Long, Long)].collect().toSet
    assert(got == Set(("a", 10L, 3L), ("a", 11L, 1L), ("a", 13L, 5L),
      ("b", 11L, 2L)))

    // a replayed batch id leaves the profile untouched
    DailyCounts.update(spark, root,
      events.limit(2), "event_type", "ts", batchId = Some(2L))
    assert(DailyCounts.read(spark, root)
      .as[(String, Long, Long)].collect().toSet == got)
  }

  test("every monitor reads the same numbers from the fold as from the scan") {
    val root = tmp("dc-mon")
    DailyCounts.update(spark, root, events, "event_type", "ts",
      batchId = Some(1L))
    val daily = DailyCounts.read(spark, root)
    def rowsOf(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq.toList).toSet
    assert(rowsOf(TimeSeries.fanoFactorFromDaily(daily)) ==
      rowsOf(TimeSeries.fanoFactor(events, "ts", "event_type")))
    assert(rowsOf(TimeSeries.changepointFromDaily(daily)) ==
      rowsOf(TimeSeries.changepointDay(events, "ts", "event_type")))
    assert(rowsOf(TimeSeries.autocorrMilliFromDaily(daily)) ==
      rowsOf(TimeSeries.autocorrMilli(events, "ts", "event_type")))
  }

  test("null keys fold under the '(null)' sentinel — arrivals are never dropped") {
    val root = tmp("dc-null")
    val rows = Seq((new Timestamp(86400000L), null.asInstanceOf[String]),
      (new Timestamp(86400000L), "t"))
    DailyCounts.update(spark, root, rows.toDF("ts", "k"), "k", "ts",
      batchId = Some(1L))
    val got = DailyCounts.read(spark, root)
      .as[(String, Long, Long)].collect().toSet
    assert(got == Set(("(null)", 1L, 1L), ("t", 1L, 1L)))
  }

  test("a key containing the U+001F separator round-trips exactly") {
    // the composite key is key + U+001F + day; decoding must split on the
    // LAST separator (the day never contains one) — the round-12 decode
    // split on the FIRST and truncated such keys
    val root = tmp("dc-sep")
    val evil = "a\u001fb\u001fc"
    val rows = Seq((new Timestamp(86400000L), evil),
      (new Timestamp(86400000L), "plain"))
    DailyCounts.update(spark, root, rows.toDF("ts", "k"), "k", "ts",
      batchId = Some(1L))
    val got = DailyCounts.read(spark, root)
      .as[(String, Long, Long)].collect().toSet
    assert(got == Set((evil, 1L, 1L), ("plain", 1L, 1L)))
  }

  test("pre-1970 timestamps land on the floor epoch day (oracle's // semantics)") {
    // 1969-12-31T23:59:59 = −1 s → day −1 under floor division; the
    // round-12 `div` truncation put it on day 0 while every oracle floors
    val root = tmp("dc-pre1970")
    val rows = Seq((new Timestamp(-1000L), "t"),
      (new Timestamp(-86400000L), "t"))
    DailyCounts.update(spark, root, rows.toDF("ts", "k"), "k", "ts",
      batchId = Some(1L))
    val got = DailyCounts.read(spark, root)
      .as[(String, Long, Long)].collect().toSet
    assert(got == Set(("t", -1L, 2L)))
  }

  test("ISO-8601 string timestamps fold like native timestamps; null ts drops") {
    val root = tmp("dc-iso")
    val iso = Seq(("2024-01-05T10:00:00", "t1"), ("2024-01-05T23:59:59", "t1"),
      (null.asInstanceOf[String], "t1"))
      .toDF("original_timestamp", "embeddings_type")
    DailyCounts.update(spark, root, iso,
      "embeddings_type", "original_timestamp", batchId = Some(1L))
    val got = DailyCounts.read(spark, root)
      .as[(String, Long, Long)].collect().toSet
    // 2024-01-05 = epoch day 19727 (UTC session timezone)
    assert(got == Set(("t1", 19727L, 2L)))
  }
}
