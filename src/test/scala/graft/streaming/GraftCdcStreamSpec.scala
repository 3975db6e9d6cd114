package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpecBase
import graft.operators.Upsert

/** CDC as a Structured Streaming source (VERDICT r16 #3):
  * `spark.readStream.format("graft").option("cdc","true")` — the
  * streaming twin of CdcSpec's three-merge poll test. A foreachBatch
  * mirror fold over the stream must equal the table's final snapshot,
  * across stream RESTARTS sharing one checkpoint, and a vacuumed cursor
  * must fail loud, not serve a partial diff. */
class GraftCdcStreamSpec extends SparkSpecBase {
  import spark.implicits._

  private def mkDirs(tag: String): (String, String) = {
    val base = Files.createTempDirectory(s"graft-cdcstream-$tag").toString
    (s"$base/table", s"$base/ckpt")
  }

  /** Run the CDC stream to drain (AvailableNow) folding every batch into
    * a driver-held mirror; returns the mirror after termination. */
  private def drain(path: String, ckpt: String,
      mirror0: Seq[(Long, String)]): Seq[(Long, String)] = {
    @volatile var mirror = mirror0
    @volatile var batches = 0
    val q = spark.readStream.format("graft")
      .option("cdc", "true").option("keys", "key").load(path)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], _: Long) =>
        val state = mirror.toDF("key", "v")
        mirror = Upsert.applyChanges(state, batch, Seq("key"))
          .select("key", "v").as[(Long, String)].collect().toSeq
        batches += 1
        ()
      }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000L)
    assert(!q.isActive, "stream did not drain")
    mirror
  }

  test("streamed mirror fold equals the final snapshot, across restarts and merges") {
    val (path, ckpt) = mkDirs("fold")
    def table: Map[Long, String] = Upsert.readTarget(spark, path)
      .select("key", "v").as[(Long, String)].collect().toMap

    // merge 1: bootstrap batch — full table as inserts
    Upsert.mergeIntoManifestBucketedParquet(spark, path,
      (0L until 30L).map(k => (k, s"v$k")).toDF("key", "v"),
      Seq("key"), nBuckets = 4, keepSnapshots = 10)
    val m1 = drain(path, ckpt, Nil)
    assert(m1.toMap == table, "bootstrap mirror != snapshot 0")

    // merges 2+3 while the stream is DOWN; restart from the checkpoint
    // must deliver exactly the net diff since the recorded cursor
    Upsert.mergeIntoManifestBucketedParquet(spark, path,
      Seq((7L, "UPDATED"), (100L, "NEW")).toDF("key", "v"),
      Seq("key"), nBuckets = 4, keepSnapshots = 10)
    Upsert.mergeIntoManifestBucketedParquet(spark, path,
      Seq((100L, "NEWER"), (200L, "ALSO")).toDF("key", "v"),
      Seq("key"), nBuckets = 4, keepSnapshots = 10)
    val m2 = drain(path, ckpt, m1)
    assert(m2.toMap == table, "restarted mirror != final snapshot")
    assert(m2.toMap.get(7L).contains("UPDATED"))
    assert(m2.toMap.get(100L).contains("NEWER"))

    // an idle restart (no new merges) delivers nothing and changes nothing
    val m3 = drain(path, ckpt, m2)
    assert(m3.toMap == table)
  }

  test("vacuumed cursor fails LOUD on restart instead of serving a partial diff") {
    val (path, ckpt) = mkDirs("vac")
    Upsert.mergeIntoManifestBucketedParquet(spark, path,
      (0L until 10L).map(k => (k, s"v$k")).toDF("key", "v"),
      Seq("key"), nBuckets = 2, keepSnapshots = 10)
    val m1 = drain(path, ckpt, Nil)
    assert(m1.size == 10)
    // advance the table PAST retention: the stream's cursor (snap 0) is
    // vacuumed away by keepSnapshots=1 on the later merges
    Upsert.mergeIntoManifestBucketedParquet(spark, path,
      Seq((1L, "u1")).toDF("key", "v"), Seq("key"),
      nBuckets = 2, keepSnapshots = 1)
    Upsert.mergeIntoManifestBucketedParquet(spark, path,
      Seq((2L, "u2")).toDF("key", "v"), Seq("key"),
      nBuckets = 2, keepSnapshots = 1)
    assert(!Upsert.snapshots(spark, path).contains("snap-000000000"))
    val e = intercept[Exception] { drain(path, ckpt, m1) }
    def messages(t: Throwable): String =
      if (t == null) "" else t.getMessage + "\n" + messages(t.getCause)
    assert(messages(e).contains("re-bootstrap"),
      s"expected the loud vacuumed-cursor refusal, got: ${messages(e).take(600)}")
  }

  test("catalog changelog table: readStream.table(\"cat.t__changes\") serves the feed") {
    val (path, ckpt) = mkDirs("cat")
    Upsert.mergeIntoManifestBucketedParquet(spark, path,
      (0L until 12L).map(k => (k, s"v$k")).toDF("key", "v"),
      Seq("key"), nBuckets = 2)
    val wh = java.nio.file.Files.createTempDirectory("graft-cdccat-wh").toString
    spark.conf.set("spark.sql.catalog.cdccat17",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.cdccat17.warehouse", wh)
    spark.sql(s"CREATE TABLE cdccat17.db.t USING graft LOCATION '$path'")
    @volatile var mirror: Seq[(Long, String)] = Nil
    val q = spark.readStream.table("cdccat17.db.t__changes")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], _: Long) =>
        mirror = Upsert.applyChanges(mirror.toDF("key", "v"), batch, Seq("key"))
          .select("key", "v").as[(Long, String)].collect().toSeq
        ()
      }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000L)
    assert(mirror.toMap == Upsert.readTarget(spark, path)
      .select("key", "v").as[(Long, String)].collect().toMap)
    // batch SELECT of the changelog ident is refused with a clear message
    val e = intercept[Exception] {
      spark.sql("SELECT * FROM cdccat17.db.t__changes").collect()
    }
    assert(e.getMessage != null)
  }

  test("cdc schema and batch projection match readChangeFeed's") {
    val (path, _) = mkDirs("schema")
    Upsert.mergeIntoManifestBucketedParquet(spark, path,
      Seq((1L, "a", 10L)).toDF("key", "v", "w"), Seq("key"), nBuckets = 2)
    val streamDf = spark.readStream.format("graft")
      .option("cdc", "true").load(path) // keys default to bucket_keys
    assert(streamDf.schema.fieldNames.toSeq ==
      Seq("change_type", "key", "v", "w"))
    val (feed, _) = Upsert.readChangeFeed(spark, path, None, Seq("key"))
    assert(feed.columns.toSeq == streamDf.schema.fieldNames.toSeq)
  }
}
