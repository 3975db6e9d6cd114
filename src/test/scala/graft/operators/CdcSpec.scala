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
}
