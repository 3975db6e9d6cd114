package graft.operators

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpecBase
import graft.operators.Sessionize.{Session, SessionEvent}

class SessionizeSpec extends SparkSpecBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("batch sessions: gap splits, ids increase in time order") {
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00")),
      (1L, ts("2024-01-01 10:10:00")), // same session (gap 10 min)
      (1L, ts("2024-01-01 12:00:00")), // new session (gap > 30 min)
      (2L, ts("2024-01-01 10:05:00"))).toDF("user_id", "ts")
    val out = Sessionize.sessions(ev, gapSeconds = 1800)
      .select("user_id", "session_id", "n_events").as[(Long, Long, Long)]
      .collect().toSet
    assert(out == Set((1L, 1L, 2L), (1L, 2L, 1L), (2L, 1L, 1L)))
  }

  test("topPaths: ordered per-session sequences, step truncation, gap splits") {
    val ev = Seq(
      // user 1, session 1: view > click > buy (ordering by ts, tie by id)
      (1L, ts("2024-01-01 10:00:00"), 1L, "view"),
      (1L, ts("2024-01-01 10:01:00"), 3L, "buy"),
      (1L, ts("2024-01-01 10:01:00"), 2L, "click"), // same ts as buy, id first
      // user 1, session 2 (gap > 30 min): view > click > buy again
      (1L, ts("2024-01-01 12:00:00"), 4L, "view"),
      (1L, ts("2024-01-01 12:02:00"), 5L, "click"),
      (1L, ts("2024-01-01 12:03:00"), 6L, "buy"),
      // user 2: a single-event session
      (2L, ts("2024-01-01 10:00:00"), 7L, "view"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val out = Sessionize.topPaths(ev, gapSeconds = 1800, k = 10, maxSteps = 8)
      .as[(String, Long)].collect().toMap
    assert(out == Map("view>click>buy" -> 2L, "view" -> 1L), out.toString)
    // truncation: maxSteps=2 cuts the paths after two steps
    val cut = Sessionize.topPaths(ev, 1800, 10, maxSteps = 2)
      .as[(String, Long)].collect().toMap
    assert(cut == Map("view>click" -> 2L, "view" -> 1L), cut.toString)
    // ranking is (n DESC, path ASC) and k limits
    val top1 = Sessionize.topPaths(ev, 1800, 1, 8).as[(String, Long)].collect()
    assert(top1.toSeq == Seq(("view>click>buy", 2L)))
  }

  private def asRows(df: org.apache.spark.sql.DataFrame) = df
    .select("user_id", "session_id", "session_start", "session_end", "n_events")
    .as[(Long, Long, Timestamp, Timestamp, Long)].collect().toSet

  test("chunked sessions equal plain across chunk-boundary adversaries") {
    // chunk = 1h (3600s), gap = 30min. Adversaries: a session straddling a
    // chunk boundary with its events 1s apart across it; a session whose
    // chain has exactly-gap links at the boundary (gap is strict >, so they
    // merge); one event per chunk spanning four chunks; a split exactly one
    // second past the gap at a boundary.
    val ev = Seq(
      // user 1: straddle 10:59:59.5 | 11:00:00.5 — the fractional seconds
      // also pin the truncated-second gap arithmetic both paths share
      (1L, ts("2024-01-01 10:59:59.5")), (1L, ts("2024-01-01 11:00:00.5")),
      // user 2: exact-gap chain across the 12:00 boundary (1800s is NOT > gap)
      (2L, ts("2024-01-01 11:45:00")), (2L, ts("2024-01-01 12:15:00")),
      (2L, ts("2024-01-01 12:45:00")),
      // user 3: one event per chunk, each 1500s apart → one 4-chunk session
      (3L, ts("2024-01-01 00:55:00")), (3L, ts("2024-01-01 01:20:00")),
      (3L, ts("2024-01-01 01:45:00")), (3L, ts("2024-01-01 02:10:00")),
      (3L, ts("2024-01-01 03:10:00")), // wait: 02:10→03:10 is 3600s > gap → split
      // user 4: split exactly gap+1 at a boundary
      (4L, ts("2024-01-01 13:59:59")), (4L, ts("2024-01-01 14:30:00")),
      // user 5: duplicate timestamps inside one session
      (5L, ts("2024-01-01 09:00:00")), (5L, ts("2024-01-01 09:00:00")),
      (5L, ts("2024-01-01 09:10:00"))).toDF("user_id", "ts")
    val plain = asRows(Sessionize.sessions(ev, gapSeconds = 1800))
    val chunked = asRows(
      Sessionize.sessionsChunked(ev, gapSeconds = 1800, chunkSeconds = 3600))
    assert(chunked == plain)
    // sanity on the adversaries themselves
    assert(plain.count(_._1 == 1L) == 1) // straddle did not split
    assert(plain.count(_._1 == 2L) == 1) // exact-gap chain merged
    assert(plain.count(_._1 == 3L) == 2) // 4-chunk session + the late split
  }

  test("chunked sessions equal plain on a randomized hot-key corpus") {
    val rnd = new scala.util.Random(42)
    val base = ts("2024-03-01 00:00:00").getTime
    // key 1 is hot (60% of rows); timestamps over ~3 days, μs jitter
    val rows = (0 until 4000).map { _ =>
      val key = if (rnd.nextInt(10) < 6) 1L else 2L + rnd.nextInt(8)
      val t = new Timestamp(base + rnd.nextLong() % (3L * 86400 * 1000))
      (key, t)
    }
    val ev = rows.toDF("user_id", "ts")
    val plain = asRows(Sessionize.sessions(ev, gapSeconds = 900))
    for (chunk <- Seq(901L, 3600L, 86400L)) {
      val chunked = asRows(
        Sessionize.sessionsChunked(ev, gapSeconds = 900, chunkSeconds = chunk))
      assert(chunked == plain, s"chunkSeconds=$chunk diverged")
    }
  }

  test("chunked sessions reject a chunk that a session could skip over") {
    val ev = Seq((1L, ts("2024-01-01 10:00:00"))).toDF("user_id", "ts")
    intercept[IllegalArgumentException] {
      Sessionize.sessionsChunked(ev, gapSeconds = 1800, chunkSeconds = 1800)
    }
  }

  test("streaming sessions match batch across checkpointed restarts") {
    val src = Files.createTempDirectory("sess-src").toString
    val ckpt = Files.createTempDirectory("sess-ckpt").toString
    val outDir = Files.createTempDirectory("sess-out").toString + "/out"

    def writeBatch(part: String, rows: Seq[(Long, Timestamp)]): Unit = {
      val staging = Files.createTempDirectory(s"sess-stage-$part").toString
      rows.toDF("key", "ts").coalesce(1).write.mode("overwrite").parquet(staging)
      val f = new java.io.File(staging).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.copy(f.toPath, java.nio.file.Paths.get(s"$src/$part.parquet"))
    }

    def runPass(): Unit = {
      val events = spark.readStream
        .schema("key long, ts timestamp").parquet(src)
        .withWatermark("ts", "0 seconds")
        .as[SessionEvent]
      Sessionize.sessionsStreaming(events, gapSeconds = 1800)
        .writeStream
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[Session], _: Long) =>
          batch.write.mode("append").parquet(outDir)
        }
        .start().awaitTermination()
    }

    // pass 1: an open session per key; nothing closes (watermark at max ts)
    writeBatch("b0", Seq(
      1L -> ts("2024-01-01 10:00:00"),
      1L -> ts("2024-01-01 10:10:00"),
      2L -> ts("2024-01-01 10:05:00")))
    runPass()

    // pass 2 (restart from checkpoint): key 1 gets a gap-breaking event —
    // its first session closes inline; the far-future key-99 event pushes
    // the watermark past every open session's timeout
    writeBatch("b1", Seq(
      1L -> ts("2024-01-01 12:00:00"),
      99L -> ts("2024-01-01 20:00:00")))
    runPass()

    // pass 3: one more event so the timeout fires under the advanced
    // watermark, closing key 1's second session, key 2's and key 99's
    writeBatch("b2", Seq(99L -> ts("2024-01-01 20:31:00")))
    runPass()
    writeBatch("b3", Seq(99L -> ts("2024-01-01 21:30:00")))
    runPass()

    val closed = spark.read.parquet(outDir)
      .select("key", "sessionId", "start", "end", "nEvents")
      .as[(Long, Long, Timestamp, Timestamp, Long)].collect().toSet
    // batch reference on the same closed-session subset
    assert(closed.contains(
      (1L, 1L, ts("2024-01-01 10:00:00"), ts("2024-01-01 10:10:00"), 2L)))
    assert(closed.contains(
      (1L, 2L, ts("2024-01-01 12:00:00"), ts("2024-01-01 12:00:00"), 1L)))
    assert(closed.contains(
      (2L, 1L, ts("2024-01-01 10:05:00"), ts("2024-01-01 10:05:00"), 1L)))
    // 20:31 - 20:00 = 31 min > the 30-min gap: two singleton sessions
    assert(closed.contains(
      (99L, 1L, ts("2024-01-01 20:00:00"), ts("2024-01-01 20:00:00"), 1L)))
    assert(closed.contains(
      (99L, 2L, ts("2024-01-01 20:31:00"), ts("2024-01-01 20:31:00"), 1L)))

    // equivalence with the batch plan over the full event set
    val allEvents = spark.read.schema("key long, ts timestamp").parquet(src)
      .withColumnRenamed("key", "user_id")
    val batchSessions = Sessionize.sessions(allEvents, 1800)
      .select("user_id", "session_id", "n_events")
      .as[(Long, Long, Long)].collect().toSet
    val closedIds = closed.map(c => (c._1, c._2, c._5))
    assert(closedIds.subsetOf(batchSessions),
      s"streaming emitted a session batch disagrees with: ${closedIds -- batchSessions}")
  }

  test("idle key state is evicted after the TTL (ids restart from 1)") {
    val src = Files.createTempDirectory("sesst-src").toString
    val ckpt = Files.createTempDirectory("sesst-ckpt").toString
    val outDir = Files.createTempDirectory("sesst-out").toString + "/out"

    def writeBatch(part: String, rows: Seq[(Long, Timestamp)]): Unit = {
      val staging = Files.createTempDirectory(s"sesst-stage-$part").toString
      rows.toDF("key", "ts").coalesce(1).write.mode("overwrite").parquet(staging)
      val f = new java.io.File(staging).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.copy(f.toPath, java.nio.file.Paths.get(s"$src/$part.parquet"))
    }
    def runPass(): Unit = {
      val events = spark.readStream
        .schema("key long, ts timestamp").parquet(src)
        .withWatermark("ts", "0 seconds")
        .as[SessionEvent]
      Sessionize.sessionsStreaming(events, gapSeconds = 1800,
          idleTtlSeconds = 600)
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (b: org.apache.spark.sql.Dataset[Session], _: Long) =>
          b.write.mode("append").parquet(outDir)
        }.start().awaitTermination()
    }

    writeBatch("b0", Seq(5L -> ts("2024-01-01 10:00:00")))
    runPass()
    // wm -> 11:00 closes key 5's session (id 1); cleanup armed for 11:10
    writeBatch("b1", Seq(99L -> ts("2024-01-01 11:00:00")))
    runPass()
    // wm -> 11:20 > cleanup timeout: key 5's counter state is evicted
    writeBatch("b2", Seq(99L -> ts("2024-01-01 11:20:00")))
    runPass()
    // key 5 returns after eviction: its ids restart at 1
    writeBatch("b3", Seq(5L -> ts("2024-01-01 12:00:00")))
    runPass()
    writeBatch("b4", Seq(99L -> ts("2024-01-01 23:00:00"))) // close it
    runPass()

    val k5 = spark.read.parquet(outDir).where($"key" === 5L)
      .select("sessionId", "start").as[(Long, Timestamp)].collect().toSet
    assert(k5 == Set(
      (1L, ts("2024-01-01 10:00:00")),
      (1L, ts("2024-01-01 12:00:00"))), // id restarted: state was evicted
      s"expected id restart after TTL eviction, got $k5")
  }

  test("out-of-order arrival within the watermark extends a session backwards") {
    val src = Files.createTempDirectory("sessb-src").toString
    val ckpt = Files.createTempDirectory("sessb-ckpt").toString
    val outDir = Files.createTempDirectory("sessb-out").toString + "/out"

    def writeBatch(part: String, rows: Seq[(Long, Timestamp)]): Unit = {
      val staging = Files.createTempDirectory(s"sessb-stage-$part").toString
      rows.toDF("key", "ts").coalesce(1).write.mode("overwrite").parquet(staging)
      val f = new java.io.File(staging).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.copy(f.toPath, java.nio.file.Paths.get(s"$src/$part.parquet"))
    }
    def runPass(): Unit = {
      val events = spark.readStream
        .schema("key long, ts timestamp").parquet(src)
        // delay must exceed the source's max disorder for backward extension
        .withWatermark("ts", "2 hours")
        .as[SessionEvent]
      Sessionize.sessionsStreaming(events, gapSeconds = 1800)
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (b: org.apache.spark.sql.Dataset[Session], _: Long) =>
          b.write.mode("append").parquet(outDir)
        }.start().awaitTermination()
    }

    writeBatch("b0", Seq(7L -> ts("2024-01-01 21:00:00")))
    runPass()
    // arrives a batch later but only 10 min disordered — within the delay
    writeBatch("b1", Seq(7L -> ts("2024-01-01 20:50:00")))
    runPass()
    writeBatch("b2", Seq(8L -> ts("2024-01-02 02:00:00"))) // wm -> 00:00
    runPass()
    writeBatch("b3", Seq(8L -> ts("2024-01-02 02:05:00"))) // fire timeout
    runPass()

    val k7 = spark.read.parquet(outDir).where($"key" === 7L)
      .select("start", "end", "nEvents")
      .as[(Timestamp, Timestamp, Long)].collect().toSet
    assert(k7 == Set((ts("2024-01-01 20:50:00"), ts("2024-01-01 21:00:00"), 2L)),
      s"late event did not extend the session backwards: $k7")
  }

  test("transitionStationary: period-2 chain settles uniform; gap excludes pairs") {
    import spark.implicits._
    def ev(id: Long, u: Long, t: String, ty: String) =
      (id, u, Timestamp.valueOf(t), ty)
    // A->B->A->B within gap: deterministic 2-cycle, stationary = 50/50
    val events = Seq(
      ev(1, 1, "2024-01-01 10:00:00", "A"),
      ev(2, 1, "2024-01-01 10:01:00", "B"),
      ev(3, 1, "2024-01-01 10:02:00", "A"),
      ev(4, 1, "2024-01-01 10:03:00", "B"),
      // a pair separated by > gap contributes NO transition
      ev(5, 2, "2024-01-01 10:00:00", "A"),
      ev(6, 2, "2024-01-01 12:00:00", "B"))
      .toDF("event_id", "user_id", "ts", "event_type")
    val got = Sessionize.transitionStationary(events, gapSeconds = 1800)
      .as[(String, Long)].collect().toMap
    assert(got == Map("A" -> 500000L, "B" -> 500000L))
  }

  test("transitionStationary: dangling target redistributes, does not drain the chain") {
    import spark.implicits._
    // A -> B -> C, C has no outgoing: without the dangling treatment all
    // mass funnels into C and then vanishes; with it the chain keeps
    // cycling (C's mass respawns uniformly).
    val events = Seq(
      (1L, 1L, Timestamp.valueOf("2024-01-01 10:00:00"), "A"),
      (2L, 1L, Timestamp.valueOf("2024-01-01 10:01:00"), "B"),
      (3L, 1L, Timestamp.valueOf("2024-01-01 10:02:00"), "C"))
      .toDF("event_id", "user_id", "ts", "event_type")
    val got = Sessionize.transitionStationary(events, gapSeconds = 1800)
      .as[(String, Long)].collect().toMap
    assert(got.keySet == Set("A", "B", "C"))
    val total = got.values.sum
    // mass survives (floors shave at most a few ppm per round)
    assert(total > 990000L, s"chain drained to $got")
    // the funnel shape orders the masses: C (sink) >= B >= A
    assert(got("C") >= got("B") && got("B") >= got("A"), got.toString)
  }
}
