package graft.operators

import java.sql.Timestamp

import graft.SparkSpecBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class Scd2Spec extends SparkSpecBase {
  import spark.implicits._

  private def ts(s: Long): Timestamp = new Timestamp(s * 1000L)

  private def log(rows: (String, String, Long, Long)*): DataFrame =
    rows.map { case (k, a, t, id) => (k, a, ts(t), id) }
      .toDF("k", "attr", "ts", "event_id")

  private def snap(df: DataFrame): Set[(String, String, Long, Option[Long], Boolean, Long)] =
    df.collect().map { r =>
      (r.getString(0), r.getString(1), r.getTimestamp(2).getTime / 1000,
        Option(r.getTimestamp(3)).map(_.getTime / 1000),
        r.getBoolean(4), r.getLong(5))
    }.toSet

  test("fromLog: collapse, intervals, versions, is_current") {
    val d = Scd2.fromLog(
      log(("u1", "a", 10, 1), ("u1", "a", 20, 2), ("u1", "b", 30, 3),
        ("u1", "b", 40, 4), ("u1", "a", 50, 5), ("u2", "x", 15, 6)),
      "k", "attr", "ts", Seq("event_id"))
    assert(snap(d) == Set(
      ("u1", "a", 10L, Some(30L), false, 1L),
      ("u1", "b", 30L, Some(50L), false, 2L),
      ("u1", "a", 50L, None, true, 3L),
      ("u2", "x", 15L, None, true, 1L)))
  }

  test("fromLog: null attribute is a value, null-safe change detection") {
    val rows = Seq(("u", Option("a"), ts(1), 1L), ("u", None, ts(2), 2L),
      ("u", None, ts(3), 3L), ("u", Option("a"), ts(4), 4L))
      .toDF("k", "attr", "ts", "event_id")
    val d = Scd2.fromLog(rows, "k", "attr", "ts", Seq("event_id"))
    val got = d.orderBy("version").collect()
      .map(r => (Option(r.getString(1)), r.getLong(5))).toSeq
    assert(got == Seq((Some("a"), 1L), (None, 2L), (Some("a"), 3L)))
  }

  test("fromLog: same-instant events resolved by the tie-break column") {
    val d = Scd2.fromLog(
      log(("u", "a", 10, 2), ("u", "b", 10, 1)), "k", "attr", "ts", Seq("event_id"))
    // event_id 1 ("b") sorts first, then "a" at the same instant
    assert(snap(d) == Set(
      ("u", "b", 10L, Some(10L), false, 1L),
      ("u", "a", 10L, None, true, 2L)))
  }

  test("fromLogChunked == fromLog across chunk widths, boundary runs included") {
    val rnd = new scala.util.Random(23)
    // 30s event spacing vs 50s/100s chunks: plenty of runs straddle
    // chunk boundaries, which is exactly what the merge pass must heal
    val rows = (1 to 400).map { i =>
      (s"u${rnd.nextInt(4)}", Seq("a", "b")(rnd.nextInt(2)), 1000L + i * 30L, i.toLong)
    }
    val plain = snap(Scd2.fromLog(log(rows: _*), "k", "attr", "ts", Seq("event_id")))
    for (chunk <- Seq(50L, 100L, 1000L, 7200L)) {
      val chunked = snap(Scd2.fromLogChunked(log(rows: _*), "k", "attr", "ts",
        Seq("event_id"), chunkSeconds = chunk))
      assert(chunked == plain, s"chunkSeconds=$chunk diverged")
    }
  }

  test("fromLogChunked: chunk ids are integers and the per-chunk collapse is real") {
    // 10 same-value events inside one 100s chunk must collapse to ONE row
    // in the per-chunk pass — if the chunk id were fractional (double
    // division), every distinct ts would be its own chunk and all 10 rows
    // would survive to the merge pass
    val rows = (1 to 10).map(i => ("u", "a", 1000L + i, i.toLong))
    val df = log(rows: _*)
    import org.apache.spark.sql.expressions.Window
    val chunkCol = floor(unix_micros(col("ts")) / lit(100L * 1000000L)).cast("long")
    val perChunkSurvivors = df.withColumn("__chunk", chunkCol)
      .withColumn("__prev", lag(col("attr"), 1)
        .over(Window.partitionBy(col("k"), col("__chunk"))
          .orderBy(col("ts").asc, col("event_id").asc)))
      .withColumn("__rn", row_number()
        .over(Window.partitionBy(col("k"), col("__chunk"))
          .orderBy(col("ts").asc, col("event_id").asc)))
      .where(col("__rn") === 1 || !(col("__prev") <=> col("attr")))
    // all 10 events share chunk id 10 (1001..1010 div 100), so exactly one
    // change-point survives the per-chunk collapse
    assert(df.select(chunkCol).distinct().count() == 1L)
    assert(perChunkSurvivors.count() == 1L)
    // and the operator output still equals fromLog
    assert(snap(Scd2.fromLogChunked(df, "k", "attr", "ts", Seq("event_id"),
      chunkSeconds = 100L)) ==
      snap(Scd2.fromLog(df, "k", "attr", "ts", Seq("event_id"))))
  }

  test("fromLogChunked: order column repeating the attr column analyzes fine") {
    // tie-breaking on the attribute itself (the streaming path's idiom)
    // must not produce a duplicate-column projection
    val rows = log(("u", "b", 10, 1), ("u", "a", 10, 2), ("u", "a", 20, 3))
    val chunked = Scd2.fromLogChunked(rows, "k", "attr", "ts", Seq("attr"),
      chunkSeconds = 100L)
    val plain = Scd2.fromLog(rows, "k", "attr", "ts", Seq("attr"))
    assert(snap(chunked) == snap(plain))
  }

  test("applyBatch == full recompute across every split point") {
    val rnd = new scala.util.Random(11)
    val attrs = Seq("a", "b", "c")
    val full = (1 to 120).map { i =>
      (s"u${rnd.nextInt(6)}", attrs(rnd.nextInt(3)), 100L + i, i.toLong)
    }
    // the watermark contract is per-key strictly-later; a global time
    // split satisfies it
    for (split <- Seq(1, 40, 60, 100, 119)) {
      val (before, after) = full.partition(_._3 <= 100L + split)
      val dim = Scd2.fromLog(log(before: _*), "k", "attr", "ts", Seq("event_id"))
      val inc = Scd2.applyBatch(dim, log(after: _*), "k", "attr", "ts", Seq("event_id"))
      val fullDim = Scd2.fromLog(log(full: _*), "k", "attr", "ts", Seq("event_id"))
      assert(snap(inc) == snap(fullDim), s"split at $split diverged")
    }
  }

  test("applyBatch: unchanged attribute extends the open row, no new version") {
    val dim = Scd2.fromLog(log(("u", "a", 10, 1)), "k", "attr", "ts", Seq("event_id"))
    val inc = Scd2.applyBatch(dim, log(("u", "a", 20, 2)), "k", "attr", "ts", Seq("event_id"))
    assert(snap(inc) == Set(("u", "a", 10L, None, true, 1L)))
  }

  test("update: late events (at-or-before the open valid_from) are dropped, not folded") {
    val root = java.nio.file.Files.createTempDirectory("scd2-late").toString + "/dim"
    Scd2.update(spark, root, log(("u", "a", 10, 1)), "k", "attr", "ts",
      Seq("event_id"), batchId = Some(0L))
    // batch 1 carries a LATE event (ts=5 < open valid_from 10) plus an
    // on-time change; the late one must not corrupt the history
    Scd2.update(spark, root, log(("u", "b", 5, 2), ("u", "b", 20, 3)),
      "k", "attr", "ts", Seq("event_id"), batchId = Some(1L))
    val got = IndexStore.read(spark, root)
      .where(!(org.apache.spark.sql.functions.col("k") <=> Scd2.MetaKey))
    assert(snap(got) == Set(
      ("u", "a", 10L, Some(20L), false, 1L),
      ("u", "b", 20L, None, true, 2L)), snap(got).toString)
  }

  test("applyBatch: brand-new keys start at version 1") {
    val dim = Scd2.fromLog(log(("u", "a", 10, 1)), "k", "attr", "ts", Seq("event_id"))
    val inc = Scd2.applyBatch(dim, log(("v", "z", 20, 2), ("v", "y", 30, 3)),
      "k", "attr", "ts", Seq("event_id"))
    assert(snap(inc) == Set(
      ("u", "a", 10L, None, true, 1L),
      ("v", "z", 20L, Some(30L), false, 1L),
      ("v", "y", 30L, None, true, 2L)))
  }
}
