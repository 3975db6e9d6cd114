package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

class JoinsSpec extends SparkSpecBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asofJoin: latest right at-or-before each left row; ties match") {
    val trades = Seq(
      (1L, ts("2024-01-01 10:00:05"), "t1"),
      (1L, ts("2024-01-01 10:00:10"), "t2"), // exact tie with a quote
      (1L, ts("2024-01-01 09:00:00"), "t0"), // before any quote -> null
      (2L, ts("2024-01-01 10:00:07"), "t3"))
      .toDF("key", "ts", "trade")
    val quotes = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100.0),
      (1L, ts("2024-01-01 10:00:10"), 101.0),
      (2L, ts("2024-01-01 10:00:06"), 200.0))
      .toDF("key", "ts", "px")
    val out = Joins.asofJoin(trades, quotes, Seq("key"), "ts", Seq("px"))
      .select("trade", "asof_px").as[(String, Option[Double])]
      .collect().toMap
    assert(out == Map(
      "t0" -> None, "t1" -> Some(100.0), "t2" -> Some(101.0),
      "t3" -> Some(200.0)))
  }

  test("asofJoin: a matched right row's genuine NULL is surfaced, not skipped") {
    val trades = Seq((1L, ts("2024-01-01 10:00:20"), "t1"))
      .toDF("key", "ts", "trade")
    val quotes = Seq(
      (1L, ts("2024-01-01 10:00:00"), Some(100.0), "m0"),
      // the matched (latest at-or-before) quote carries a NULL px: true
      // ASOF semantics return that NULL, never the older 100.0
      (1L, ts("2024-01-01 10:00:10"), Option.empty[Double], "m1"))
      .toDF("key", "ts", "px", "mkt")
    val out = Joins.asofJoin(trades, quotes, Seq("key"), "ts", Seq("px", "mkt"))
      .select("trade", "asof_px", "asof_mkt")
      .as[(String, Option[Double], String)].collect().toSeq
    assert(out == Seq(("t1", None, "m1")))
  }

  test("rangeJoin: facts land in their containing interval, end exclusive") {
    val facts = Seq(
      (1L, ts("2024-01-01 10:30:00"), "a"),
      (1L, ts("2024-01-01 11:00:00"), "b"), // == end of v1 -> v2
      (1L, ts("2024-01-01 12:30:00"), "c"), // past all intervals -> dropped
      (1L, ts("2024-01-01 09:00:00"), "d")) // before all intervals -> dropped
      .toDF("key", "ts", "f")
    val dims = Seq(
      (1L, ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00"), "v1"),
      (1L, ts("2024-01-01 11:00:00"), ts("2024-01-01 12:00:00"), "v2"))
      .toDF("key", "start", "end", "version")
    val out = Joins.rangeJoin(facts, dims, Seq("key"), "ts", "start", "end",
      Seq("version"))
      .select("f", "asof_version").as[(String, String)].collect().toMap
    assert(out == Map("a" -> "v1", "b" -> "v2"))
  }
}
