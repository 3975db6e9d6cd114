package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** Table compaction of a manifest-bucketed target — re-bucketing and
  * Z-ordered rewrites ([[Layout.zorderKey]] is the curve; its own math is
  * covered in `LayoutSpec`) (round 10). */
class CompactSpec extends SparkSpecBase {
  import spark.implicits._

  private def mkTarget(): String =
    Files.createTempDirectory("graft-compact").toString + "/table"

  test("rebucket compact collapses a tiny-file layout; content exact; merge adopts the new count") {
    val path = mkTarget()
    // a bucket count that no longer fits the data: 16 near-empty files
    (0 until 2).foreach { r =>
      val rows = (0L until 60L).map(k => (k, s"v$r-$k")).toDF("key", "v")
      Upsert.mergeIntoManifestBucketedParquet(spark, path, rows,
        Seq("key"), nBuckets = 16)
    }
    val filesBefore =
      Upsert.readBucketManifest(spark, path).values.map(_.size).sum
    assert(filesBefore >= 10) // ~one near-empty file per populated bucket
    val want = Upsert.readManifestTable(spark, path)
      .select("key", "v").as[(Long, String)].collect().toMap
    Upsert.compactManifestBucketedParquet(spark, path, keys = Seq("key"),
      newNBuckets = Some(2))
    val after = Upsert.readBucketManifest(spark, path)
    assert(after.keySet == Set(0, 1), after.keySet.toString)
    val filesAfter = after.values.map(_.size).sum
    assert(filesAfter < filesBefore,
      s"compaction did not reduce files: $filesBefore -> $filesAfter")
    val got = Upsert.readManifestTable(spark, path)
      .select("key", "v").as[(Long, String)].collect().toMap
    assert(got == want)
    // later merges adopt the stored re-bucketed count (the mismatched
    // argument is ignored) and the table stays exact
    Upsert.mergeIntoManifestBucketedParquet(spark, path,
      Seq((7L, "POST")).toDF("key", "v"), Seq("key"), nBuckets = 16)
    assert(Upsert.storedNBuckets(spark, path).contains(2))
    assert(Upsert.readManifestTable(spark, path).where($"key" === 7L)
      .select("v").as[String].head() == "POST")
  }

  test("zorder compact: every file gets a narrow range of BOTH dimensions; pruning fires") {
    val path = mkTarget()
    // two independent uniform dims; pre-compaction every file spans ~all
    // of both (keys are hash-scattered into buckets)
    val rows = (0L until 4000L).map { k =>
      (k, (k * 2654435761L) % 1000L, (k * 40503L) % 1000L)
    }.toDF("key", "a", "b")
    Upsert.mergeIntoManifestBucketedParquet(spark, path, rows,
      Seq("key"), nBuckets = 4, statsCols = Seq("a", "b"))
    val bodyBefore = Upsert.manifestBody(spark, path, None).get
    val allBefore = Upsert.parseManifestEntries(bodyBefore).values.flatten.toSeq
    val rangeA = FileStats.ColRange.between("a", 100L, 150L)
    val rangeB = FileStats.ColRange.between("b", 100L, 150L)
    val (keptBefore, _) = FileStats.split(FileStats.parse(bodyBefore),
      allBefore, Seq(rangeA, rangeB))
    assert(keptBefore.size == allBefore.size,
      "precondition: unclustered files should all overlap a mid range")

    Upsert.compactManifestBucketedParquet(spark, path, keys = Seq("key"),
      zorderCols = Seq("a", "b"), targetFileRows = 250L)
    val body = Upsert.manifestBody(spark, path, None).get
    val all = Upsert.parseManifestEntries(body).values.flatten.toSeq
    assert(all.size >= 8, s"expected a multi-file layout, got ${all.size}")
    val (kept, pruned) = FileStats.split(FileStats.parse(body), all,
      Seq(rangeA, rangeB))
    // a 50x50 cell of a 1000x1000 domain: a meaningful share of the
    // z-clustered files must drop (range-boundary files straddle
    // subsquares, so "all but one per bucket" is not achievable — a
    // third is the robust floor; the unclustered layout pruned ZERO)
    assert(pruned.size * 3 >= all.size,
      s"z-ordered layout pruned only ${pruned.size}/${all.size} files")
    // correctness: pruned read + filter == full read + filter
    val q = Upsert.readManifestTable(spark, path, ranges = Seq(rangeA, rangeB))
      .where($"a".between(100L, 150L) && $"b".between(100L, 150L))
      .select("key").as[Long].collect().toSet
    val full = Upsert.readManifestTable(spark, path)
      .where($"a".between(100L, 150L) && $"b".between(100L, 150L))
      .select("key").as[Long].collect().toSet
    assert(q == full && full.nonEmpty)
  }

  test("table-compact CLI: zorder flags parse and the job runs end-to-end") {
    val path = mkTarget()
    val rows = (0L until 500L).map(k => (k, k % 100L, k / 100L, s"v$k"))
      .toDF("key", "a", "b", "v")
    Upsert.mergeIntoManifestBucketedParquet(spark, path, rows,
      Seq("key"), nBuckets = 2)
    graft.RunMaintain.run(spark, Array("table-compact", path,
      "--keys", "key", "--zorder", "a,b", "--target-file-rows", "100"))
    val got = Upsert.readManifestTable(spark, path)
      .select("key").as[Long].collect().toSet
    assert(got == (0L until 500L).toSet)
  }

  test("compact on an empty or never-committed table is a safe no-op") {
    val path = mkTarget()
    intercept[IllegalStateException] {
      Upsert.readManifestTable(spark, path)
    }
    // never committed: nothing to do, no crash
    Upsert.compactManifestBucketedParquet(spark, path, keys = Seq("key"))
    // committed then fully deleted: entries empty → no-op
    val rows = Seq((1L, "a")).toDF("key", "v")
    Upsert.mergeIntoManifestBucketedParquet(spark, path, rows,
      Seq("key"), nBuckets = 2)
    Upsert.deleteKeysFromManifestBucketedParquet(spark, path,
      Seq(1L).toDF("key"), Seq("key"), nBuckets = 2)
    Upsert.compactManifestBucketedParquet(spark, path, keys = Seq("key"))
    assert(Upsert.readManifestTable(spark, path).count() == 0L)
  }
}
