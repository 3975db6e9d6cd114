package graft.operators

import java.sql.Timestamp

import graft.SparkSpecBase

class FunnelSpec extends SparkSpecBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("funnel: strictly-after, earliest-valid, horizon anchored at step 1") {
    val ev = Seq(
      // user 1: full conversion. The 10:00:00 click ties the view (NOT
      // strictly after → invalid); 10:30 is the earliest valid click; the
      // 10:20 purchase precedes ts_2 (invalid); 10:45 converts.
      (1L, "view", ts("2024-01-01 10:00:00")),
      (1L, "click", ts("2024-01-01 10:00:00")),
      (1L, "click", ts("2024-01-01 10:30:00")),
      (1L, "click", ts("2024-01-01 10:40:00")), // later valid click ignored
      (1L, "purchase", ts("2024-01-01 10:20:00")),
      (1L, "purchase", ts("2024-01-01 10:45:00")),
      // user 2: click 90 min after view — outside the 1h horizon
      (2L, "view", ts("2024-01-01 10:00:00")),
      (2L, "click", ts("2024-01-01 11:30:00")),
      // user 3: click precedes the first view; never reaches step 2
      (3L, "click", ts("2024-01-01 09:00:00")),
      (3L, "view", ts("2024-01-01 12:00:00")),
      // user 4: converts to click, purchase beyond the step-1 horizon
      (4L, "view", ts("2024-01-01 10:00:00")),
      (4L, "click", ts("2024-01-01 10:10:00")),
      (4L, "purchase", ts("2024-01-01 11:30:00")),
      // user 5: no view at all — absent from the funnel
      (5L, "click", ts("2024-01-01 10:00:00"))).toDF("user_id", "event_type", "ts")
    val out = Funnel.funnel(ev, Seq("view", "click", "purchase"),
        horizonSeconds = 3600L)
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getTimestamp(2), r.getTimestamp(3), r.getTimestamp(4))))
      .toMap
    assert(out.keySet == Set(1L, 2L, 3L, 4L))
    assert(out(1L) == ((3, ts("2024-01-01 10:00:00"),
      ts("2024-01-01 10:30:00"), ts("2024-01-01 10:45:00"))))
    assert(out(2L) == ((1, ts("2024-01-01 10:00:00"), null, null)))
    assert(out(3L) == ((1, ts("2024-01-01 12:00:00"), null, null)))
    assert(out(4L) == ((2, ts("2024-01-01 10:00:00"),
      ts("2024-01-01 10:10:00"), null)))
  }

  test("funnel: rejects empty and duplicate step lists") {
    val ev = Seq((1L, "view", ts("2024-01-01 10:00:00")))
      .toDF("user_id", "event_type", "ts")
    intercept[IllegalArgumentException] { Funnel.funnel(ev, Seq(), 10L) }
    intercept[IllegalArgumentException] {
      Funnel.funnel(ev, Seq("view", "view"), 10L)
    }
  }

  test("retentionCohorts: epoch-week cohorts, distinct users per offset") {
    def at(week: Long, off: Long) = new Timestamp((week * 604800L + off) * 1000L)
    val ev = Seq(
      (1L, at(100, 5)), (1L, at(100, 9000)),   // same week: dedup to one cell
      (1L, at(101, 3)),                        // offset 1
      (2L, at(100, 604799)),                   // last second of week 100
      (3L, at(101, 0))                         // later cohort, boundary start
    ).toDF("user_id", "ts")
    val out = Funnel.retentionCohorts(ev)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out == Map((100L, 0L) -> 2L, (100L, 1L) -> 1L, (101L, 0L) -> 1L),
      out.toString)
  }

  test("attribution: segments reset on conversion; direct and trailing edges") {
    def t(s: Long) = new Timestamp(s * 1000L)
    val events = Seq(
      // user 1: view,click → purchase | view → purchase | trailing click
      (1L, t(1), 1L, "view"), (1L, t(2), 2L, "click"),
      (1L, t(3), 3L, "purchase"),
      (1L, t(4), 4L, "view"), (1L, t(5), 5L, "purchase"),
      (1L, t(6), 6L, "click"),
      // user 2: direct conversion, no touches
      (2L, t(1), 10L, "purchase"),
      // user 3: touches but never converts
      (3L, t(1), 20L, "click")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val out = Funnel.attribution(events, "purchase")
      .select("user_id", "conv_id", "first_type", "first_id",
        "last_type", "last_id", "n_touches")
      .as[(Long, Long, Option[String], Option[Long], Option[String],
        Option[Long], Long)].collect().toSet
    assert(out == Set(
      (1L, 3L, Some("view"), Some(1L), Some("click"), Some(2L), 2L),
      (1L, 5L, Some("view"), Some(4L), Some("view"), Some(4L), 1L),
      (2L, 10L, None, None, None, None, 0L)))
  }
}
