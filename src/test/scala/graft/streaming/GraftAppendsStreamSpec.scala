package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpecBase
import graft.operators.Upsert

/** Streaming read of the plain table face (VERDICT r17 #6): appends per
  * snapshot over insert-only tables, driven end to end through
  * `readStream.format("graft").load(path)` with `Trigger.AvailableNow`.
  * Also covers the new insert-only commit
  * ([[Upsert.appendToManifestBucketedParquet]]) the stream pairs with. */
class GraftAppendsStreamSpec extends SparkSpecBase {
  import spark.implicits._

  private def mkDirs(tag: String): (String, String) = {
    val base = Files.createTempDirectory(s"graft-appstream-$tag").toString
    (s"$base/table", s"$base/ckpt")
  }

  /** Drain the appends stream (AvailableNow) collecting every batch's
    * rows; returns (all rows collected this drain, batch count). */
  private def drain(path: String, ckpt: String): (Seq[(Long, String)], Int) = {
    @volatile var rows = Vector.empty[(Long, String)]
    @volatile var batches = 0
    val q = spark.readStream.format("graft").load(path)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], _: Long) =>
        rows = rows ++ batch.select("key", "v").as[(Long, String)].collect()
        batches += 1
        ()
      }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000L)
    assert(!q.isActive, "stream did not drain")
    (rows, batches)
  }

  test("append-only commits stream as appends-per-snapshot, restart-safe") {
    val (path, ckpt) = mkDirs("fold")
    // snapshot 0: insert-only commit of 30 rows
    Upsert.appendToManifestBucketedParquet(spark, path,
      (0L until 30L).map(k => (k, s"v$k")).toDF("key", "v"),
      Seq("key"), nBuckets = 4, keepSnapshots = 10)
    val (r1, _) = drain(path, ckpt)
    assert(r1.toSet == (0L until 30L).map(k => (k, s"v$k")).toSet,
      "bootstrap must serve the full table as of the pinned snapshot")

    // snapshots 1+2 while the stream is down; restart from the
    // checkpoint serves exactly the appended rows, nothing re-delivered
    Upsert.appendToManifestBucketedParquet(spark, path,
      (100L until 110L).map(k => (k, s"a$k")).toDF("key", "v"),
      Seq("key"), nBuckets = 4, keepSnapshots = 10)
    Upsert.appendToManifestBucketedParquet(spark, path,
      (200L until 205L).map(k => (k, s"b$k")).toDF("key", "v"),
      Seq("key"), nBuckets = 4, keepSnapshots = 10)
    val (r2, _) = drain(path, ckpt)
    assert(r2.toSet ==
      ((100L until 110L).map(k => (k, s"a$k")) ++
        (200L until 205L).map(k => (k, s"b$k"))).toSet,
      s"incremental drain must serve ONLY the appended rows, got ${r2.size}")

    // idle restart: nothing
    val (r3, _) = drain(path, ckpt)
    assert(r3.isEmpty)

    // the whole feed reassembles the table exactly
    val table = Upsert.readTarget(spark, path).select("key", "v")
      .as[(Long, String)].collect().toSet
    assert((r1 ++ r2).toSet == table)
  }

  test("a rewriting merge breaks the insert-only contract LOUDLY, pointing at cdc") {
    val (path, ckpt) = mkDirs("rewrite")
    Upsert.appendToManifestBucketedParquet(spark, path,
      (0L until 20L).map(k => (k, s"v$k")).toDF("key", "v"),
      Seq("key"), nBuckets = 2, keepSnapshots = 10)
    val (r1, _) = drain(path, ckpt)
    assert(r1.size == 20)
    // a MERGE rewrites the touched bucket's files
    Upsert.mergeIntoManifestBucketedParquet(spark, path,
      Seq((7L, "UPDATED")).toDF("key", "v"), Seq("key"),
      nBuckets = 2, keepSnapshots = 10)
    val e = intercept[Exception] { drain(path, ckpt) }
    def messages(t: Throwable): String =
      if (t == null) "" else t.getMessage + "\n" + messages(t.getCause)
    assert(messages(e).contains("cdc"),
      s"expected the loud insert-only refusal pointing at the cdc feed, " +
        s"got: ${messages(e).take(600)}")
  }

  test("insert-only commit never rewrites shared files and records the layout") {
    val (path, _) = mkDirs("files")
    Upsert.appendToManifestBucketedParquet(spark, path,
      (0L until 40L).map(k => (k, s"v$k")).toDF("key", "v"),
      Seq("key"), nBuckets = 4, keepSnapshots = 10)
    val m0 = Upsert.parseManifestEntries(
      Upsert.manifestBody(spark, path, None).get)
    Upsert.appendToManifestBucketedParquet(spark, path,
      (40L until 80L).map(k => (k, s"v$k")).toDF("key", "v"),
      Seq("key"), nBuckets = 4, keepSnapshots = 10)
    val body1 = Upsert.manifestBody(spark, path, None).get
    val m1 = Upsert.parseManifestEntries(body1)
    m0.foreach { case (b, files) =>
      assert(files.forall(m1.getOrElse(b, Nil).contains),
        s"append rewrote bucket $b's existing files")
    }
    // layout metadata recorded like the merge path records it
    assert(Upsert.parseManifestString(body1, "bucket_keys").contains("key"))
    assert(Upsert.parseManifestLong(body1, "nBuckets").contains(4L))
    // duplicate keys COEXIST (insert-only contract: uniqueness is the
    // caller's) — and the merge path stays available to reconcile
    Upsert.appendToManifestBucketedParquet(spark, path,
      Seq((0L, "dup")).toDF("key", "v"), Seq("key"),
      nBuckets = 4, keepSnapshots = 10)
    assert(Upsert.readTarget(spark, path).where($"key" === 0L).count() == 2L)
  }

  test("catalog face: readStream.table streams a bucketed graft table") {
    val (path, ckpt) = mkDirs("cat")
    Upsert.appendToManifestBucketedParquet(spark, path,
      (0L until 12L).map(k => (k, s"v$k")).toDF("key", "v"),
      Seq("key"), nBuckets = 2, keepSnapshots = 10)
    val wh = Files.createTempDirectory("graft-appcat-wh").toString
    spark.conf.set("spark.sql.catalog.appcat18",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.appcat18.warehouse", wh)
    spark.sql(s"CREATE TABLE appcat18.db.t USING graft LOCATION '$path'")
    @volatile var rows = Vector.empty[(Long, String)]
    val q = spark.readStream.table("appcat18.db.t")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], _: Long) =>
        rows = rows ++ batch.select("key", "v").as[(Long, String)].collect()
        ()
      }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000L)
    assert(rows.toSet == (0L until 12L).map(k => (k, s"v$k")).toSet)
  }
}
