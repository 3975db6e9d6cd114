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

  test("bandJoin: pairs within ±band, inclusive ends, exactly once") {
    val anchors = Seq(
      (1L, ts("2024-01-01 10:00:00"), "a1"),
      (2L, ts("2024-01-01 10:00:00"), "a2")) // other key: no cross-key pair
      .toDF("key", "ts", "a")
    val others = Seq(
      (1L, ts("2024-01-01 09:59:00"), "in-before"),
      (1L, ts("2024-01-01 09:58:00"), "edge-before"), // exactly -band
      (1L, ts("2024-01-01 10:02:00"), "edge-after"), // exactly +band
      (1L, ts("2024-01-01 10:02:00.000001"), "out-after"), // band + 1µs
      (1L, ts("2024-01-01 09:57:59.999999"), "out-before"),
      (2L, ts("2024-01-01 10:00:30"), "other-key"))
      .toDF("key", "ts", "o")
    val out = Joins.bandJoin(anchors, others, Seq("key"), "ts", "ts",
        bandSeconds = 120, Seq("o"))
      .select("a", "band_o").as[(String, String)].collect().toSeq
    assert(out.groupBy(identity).values.forall(_.size == 1),
      s"pair emitted twice: $out")
    assert(out.toSet == Set(
      ("a1", "in-before"), ("a1", "edge-before"), ("a1", "edge-after"),
      ("a2", "other-key")))
  }

  test("bandJoin: equals the naive theta-join on a random frame") {
    val rnd = new scala.util.Random(7)
    def frame(n: Int) = (0 until n).map { i =>
      (rnd.nextInt(3).toLong,
        new Timestamp(1700000000000L + rnd.nextInt(2000) * 500L), i.toLong)
    }.toDF("key", "ts", "id")
    val l = frame(80)
    val r = frame(120).withColumnRenamed("id", "rid")
    val band = Joins.bandJoin(l, r, Seq("key"), "ts", "ts",
        bandSeconds = 300, Seq("rid"))
      .select("id", "band_rid").as[(Long, Long)].collect().toSeq.sorted
    val naive = l.as("l").join(r.as("r"),
        col("l.key") === col("r.key") &&
          abs(unix_micros(col("l.ts")) - unix_micros(col("r.ts"))) <= 300000000L)
      .select(col("l.id"), col("r.rid")).as[(Long, Long)].collect().toSeq.sorted
    assert(band == naive)
  }
}
