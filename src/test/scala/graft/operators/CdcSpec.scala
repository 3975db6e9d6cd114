package graft.operators

import java.nio.file.Files

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Change-data-feed diff between retained snapshots (Upsert.changesBetween):
  * row classification, no-op exclusion, delete before-images, and the
  * manifest-level bucket pruning that keeps CDC off a table scan. */
class CdcSpec extends SparkSpecBase {
  import spark.implicits._

  private def mkTarget(): String =
    Files.createTempDirectory("graft-cdc").toString + "/table"

  private def changes(path: String, from: String, to: String) =
    Upsert.changesBetween(spark, path, from, to, Seq("key"))
      .select("change_type", "key", "v")
      .as[(String, Long, String)].collect().toSet

  test("insert/update/delete classified; cohabitant rewrites excluded") {
    val path = mkTarget()
    Upsert.mergeIntoManifestBucketedParquet(spark, path,
      (0L until 40L).map(k => (k, s"v$k")).toDF("key", "v"),
      Seq("key"), nBuckets = 4, keepSnapshots = 4)
    val s1 = Upsert.snapshots(spark, path).last

    // 7 updated, 1007 inserted, 8 "updated" to its existing value (no-op)
    Upsert.mergeIntoManifestBucketedParquet(spark, path,
      Seq((7L, "UPDATED"), (1007L, "NEW"), (8L, "v8")).toDF("key", "v"),
      Seq("key"), nBuckets = 4, keepSnapshots = 4)
    val s2 = Upsert.snapshots(spark, path).last
    assert(changes(path, s1, s2) == Set(
      ("update", 7L, "UPDATED"), ("insert", 1007L, "NEW")))

    // delete two keys: before-images come back as delete rows
    Upsert.deleteKeysFromManifestBucketedParquet(spark, path,
      Seq(7L, 9L).toDF("key"), Seq("key"), nBuckets = 4, keepSnapshots = 4)
    val s3 = Upsert.snapshots(spark, path).last
    assert(changes(path, s2, s3) == Set(
      ("delete", 7L, "UPDATED"), ("delete", 9L, "v9")))

    // transitive diff composes: s1 -> s3 sees the net effect
    assert(changes(path, s1, s3) == Set(
      ("insert", 1007L, "NEW"), ("delete", 7L, "v7"), ("delete", 9L, "v9")))
  }

  test("manifest diff prunes untouched buckets from both read sides") {
    val path = mkTarget()
    Upsert.mergeIntoManifestBucketedParquet(spark, path,
      (0L until 40L).map(k => (k, s"v$k")).toDF("key", "v"),
      Seq("key"), nBuckets = 4, keepSnapshots = 4)
    val s1 = Upsert.snapshots(spark, path).last
    val m1 = Upsert.readBucketManifest(spark, path)

    Upsert.mergeIntoManifestBucketedParquet(spark, path,
      Seq((7L, "UPDATED")).toDF("key", "v"), Seq("key"), nBuckets = 4, keepSnapshots = 4)
    val s2 = Upsert.snapshots(spark, path).last
    val m2 = Upsert.readBucketManifest(spark, path)
    val untouched = m2.keySet.filter(b => m1.getOrElse(b, Nil) == m2(b))
    assert(untouched.nonEmpty, "test needs at least one untouched bucket")

    // compare bucket-qualified path tails: partitioned writes reuse the
    // same part-file basename across bucket directories
    def tail(f: String): String = f.split('/').takeRight(2).mkString("/")
    val diff = Upsert.changesBetween(spark, path, s1, s2, Seq("key"))
    val readFiles = diff.inputFiles.map(tail).toSet
    val untouchedFiles = untouched.flatMap(b => m2(b)).map(tail)
    assert(untouchedFiles.nonEmpty)
    untouchedFiles.foreach(f =>
      assert(!readFiles.contains(f), s"untouched-bucket file $f was read by CDC"))
    assert(diff.select("change_type", "key", "v").as[(String, Long, String)]
      .collect().toSet == Set(("update", 7L, "UPDATED")))
  }

  test("rebucketing compaction between snapshots is NOT a change; __bucket never leaks") {
    val path = mkTarget()
    Upsert.mergeIntoManifestBucketedParquet(spark, path,
      (0L until 40L).map(k => (k, s"v$k")).toDF("key", "v"),
      Seq("key"), nBuckets = 4, keepSnapshots = 4)
    val s1 = Upsert.snapshots(spark, path).last
    // physical rewrite only: every file replaced, every row re-placed
    Upsert.compactManifestBucketedParquet(spark, path, keys = Seq("key"),
      newNBuckets = Some(8), keepSnapshots = 4)
    val s2 = Upsert.snapshots(spark, path).last
    val diff = Upsert.changesBetween(spark, path, s1, s2, Seq("key"))
    assert(!diff.columns.contains("__bucket"),
      s"internal layout column leaked into CDC output: ${diff.columns.toSeq}")
    assert(diff.count() == 0,
      "a pure re-placement (rebucket) must produce an empty change feed")
  }

  test("plain snapshot layout falls back to a full two-sided diff") {
    val path = mkTarget()
    Upsert.mergeIntoParquet(spark, path,
      Seq((1L, "a"), (2L, "b")).toDF("key", "v"), Seq("key"), keepSnapshots = 3)
    val s1 = Upsert.snapshots(spark, path).last
    Upsert.mergeIntoParquet(spark, path,
      Seq((2L, "B2"), (3L, "c")).toDF("key", "v"), Seq("key"), keepSnapshots = 3)
    val s2 = Upsert.snapshots(spark, path).last
    assert(changes(path, s1, s2) == Set(
      ("update", 2L, "B2"), ("insert", 3L, "c")))
  }

  test("readChangeFeed cross-run: a consumer folding three polls equals the final snapshot") {
    val path = mkTarget()
    def merge(rows: Seq[(Long, String)]): Unit =
      Upsert.mergeIntoManifestBucketedParquet(spark, path,
        rows.toDF("key", "v"), Seq("key"), nBuckets = 4, keepSnapshots = 8)
    def mirrorSet(df: org.apache.spark.sql.DataFrame) =
      df.select("key", "v").as[(Long, String)].collect().toSet

    // merge 1 -> bootstrap poll: every row arrives as an insert
    merge((0L until 30L).map(k => (k, s"v$k")))
    val (feed1, c1) = Upsert.readChangeFeed(spark, path, None, Seq("key"))
    assert(feed1.select("change_type").distinct()
      .as[String].collect().toSeq == Seq("insert"))
    var mirror = feed1.drop("change_type").localCheckpoint()

    // merge 2, merge 3 (update + insert + delete mix), one poll each
    merge(Seq((3L, "U3"), (100L, "N100")))
    val (feed2, c2) = Upsert.readChangeFeed(spark, path, Some(c1), Seq("key"))
    mirror = Upsert.applyChanges(mirror, feed2, Seq("key")).localCheckpoint()
    Upsert.deleteKeysFromManifestBucketedParquet(spark, path,
      Seq(5L, 100L).toDF("key"), Seq("key"), nBuckets = 4, keepSnapshots = 8)
    merge(Seq((3L, "U3b"), (101L, "N101")))
    val (feed3, c3) = Upsert.readChangeFeed(spark, path, Some(c2), Seq("key"))
    mirror = Upsert.applyChanges(mirror, feed3, Seq("key")).localCheckpoint()

    // the folded mirror IS the final snapshot, and the cursor names it
    assert(c3 == Upsert.snapshots(spark, path).last)
    assert(mirrorSet(mirror) ==
      mirrorSet(Upsert.readTargetAt(spark, path, c3)))
    // a caught-up consumer polls into an empty feed, cursor stable
    val (feed4, c4) = Upsert.readChangeFeed(spark, path, Some(c3), Seq("key"))
    assert(feed4.count() == 0 && c4 == c3)
  }

  test("readChangeFeed: a vacuumed cursor fails loud, never a partial diff") {
    val path = mkTarget()
    Upsert.mergeIntoManifestBucketedParquet(spark, path,
      Seq((1L, "a")).toDF("key", "v"), Seq("key"), nBuckets = 2, keepSnapshots = 1)
    val (_, c1) = Upsert.readChangeFeed(spark, path, None, Seq("key"))
    Upsert.mergeIntoManifestBucketedParquet(spark, path,
      Seq((2L, "b")).toDF("key", "v"), Seq("key"), nBuckets = 2, keepSnapshots = 1)
    // keepSnapshots=1 expired c1
    val e = intercept[IllegalArgumentException] {
      Upsert.readChangeFeed(spark, path, Some(c1), Seq("key"))
    }
    assert(e.getMessage.contains("re-bootstrap"))
  }

  test("syncMirror: cursor-managed mirror tracks the target across merges; crash replay idempotent") {
    val path = mkTarget()
    val mirror = Files.createTempDirectory("graft-cdc-mirror").toString + "/m"
    def merge(rows: Seq[(Long, String)]): Unit =
      Upsert.mergeIntoManifestBucketedParquet(spark, path,
        rows.toDF("key", "v"), Seq("key"), nBuckets = 4, keepSnapshots = 8)
    def mirrorSet() = Upsert.readMirror(spark, mirror)
      .select("key", "v").as[(Long, String)].collect().toSet
    def targetSet() = Upsert.readTarget(spark, path)
      .select("key", "v").as[(Long, String)].collect().toSet

    merge((0L until 20L).map(k => (k, s"v$k")))
    val c1 = Upsert.syncMirror(spark, path, mirror, Seq("key")) // bootstrap
    assert(mirrorSet() == targetSet())
    assert(c1 == Upsert.snapshots(spark, path).last)

    merge(Seq((3L, "U3"), (50L, "N50")))
    Upsert.deleteKeysFromManifestBucketedParquet(spark, path,
      Seq(7L).toDF("key"), Seq("key"), nBuckets = 4, keepSnapshots = 8)
    val c2 = Upsert.syncMirror(spark, path, mirror, Seq("key")) // incremental
    assert(mirrorSet() == targetSet())
    assert(c2 != c1)
    // caught up: a third sync is a no-op with a stable cursor
    assert(Upsert.syncMirror(spark, path, mirror, Seq("key")) == c2)
    // crash sim: cursor file lost AFTER the data commit — the next sync
    // re-bootstraps (feed = full inserts) and the mirror still equals
    // the target (idempotent replay, never duplication)
    val fs = new org.apache.hadoop.fs.Path(mirror, "_cursor")
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(mirror, "_cursor"), false)
    Upsert.syncMirror(spark, path, mirror, Seq("key"))
    assert(mirrorSet() == targetSet())
    // and the CLI face advances it after one more merge
    merge(Seq((51L, "N51")))
    graft.RunMaintain.run(spark, Array("mirror", path,
      "--keys", "key", "--to", mirror))
    assert(mirrorSet() == targetSet())
  }

  test("CLI 'changes' verb: bootstrap + incremental poll through RunMaintain") {
    val path = mkTarget()
    val outDir = Files.createTempDirectory("graft-cdc-out").toString
    Upsert.mergeIntoManifestBucketedParquet(spark, path,
      Seq((1L, "a"), (2L, "b")).toDF("key", "v"), Seq("key"),
      nBuckets = 2, keepSnapshots = 4)
    graft.RunMaintain.run(spark, Array("changes", path,
      "--keys", "key", "--out", s"$outDir/boot"))
    assert(spark.read.parquet(s"$outDir/boot").count() == 2)
    val cursor = Upsert.snapshots(spark, path).last
    Upsert.mergeIntoManifestBucketedParquet(spark, path,
      Seq((2L, "B2")).toDF("key", "v"), Seq("key"), nBuckets = 2, keepSnapshots = 4)
    graft.RunMaintain.run(spark, Array("changes", path,
      "--keys", "key", "--since", cursor, "--out", s"$outDir/inc"))
    assert(spark.read.parquet(s"$outDir/inc")
      .select("change_type", "key", "v").as[(String, Long, String)]
      .collect().toSet == Set(("update", 2L, "B2")))
  }
}
