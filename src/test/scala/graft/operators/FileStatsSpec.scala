package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** Per-file min/max stats in the manifest + file-level data skipping
  * (round 10): the commit records footer stats for key/stats columns,
  * untouched buckets carry theirs forward, and `readManifestTable` with
  * [[FileStats.ColRange]]s drops files that cannot match — without ever
  * opening them. */
class FileStatsSpec extends SparkSpecBase {
  import spark.implicits._

  private def mkTarget(): String =
    Files.createTempDirectory("graft-filestats").toString + "/table"

  private def statsOf(path: String): Map[String, Map[String, FileStats.ColStats]] =
    FileStats.parse(Upsert.manifestBody(spark, path, None).get)

  test("commit records exact per-file min/max for keys and statsCols") {
    val path = mkTarget()
    val rows = (0L until 40L).map(k => (k, k * 100L, s"v$k")).toDF("key", "ts", "v")
    Upsert.mergeIntoManifestBucketedParquet(spark, path, rows,
      Seq("key"), nBuckets = 4, statsCols = Seq("ts"))
    val stats = statsOf(path)
    val manifest = Upsert.readBucketManifest(spark, path)
    val rel = stats.keySet
    // every referenced file carries stats for both columns
    manifest.values.flatten.foreach { abs =>
      val matching = rel.filter(r => abs.endsWith(r))
      assert(matching.size == 1, s"no stats entry for $abs")
      val byCol = stats(matching.head)
      assert(byCol.contains("key") && byCol.contains("ts"), byCol.keySet.toString)
      // recorded bounds are EXACT: re-read the file and compare
      val a = spark.read.parquet(abs)
        .agg(min("key"), max("key"), min("ts"), max("ts")).head()
      assert(byCol("key").min.get == BigDecimal(a.getLong(0)))
      assert(byCol("key").max.get == BigDecimal(a.getLong(1)))
      assert(byCol("ts").min.get == BigDecimal(a.getLong(2)))
      assert(byCol("ts").max.get == BigDecimal(a.getLong(3)))
      assert(byCol("ts").nulls == 0L)
    }
  }

  test("range read prunes files and returns exactly the matching rows") {
    val path = mkTarget()
    // ts correlates with key so files (bucketed by key hash) get distinct
    // ts ranges only after we partition by a ts-aligned key: use 4 batches
    // with disjoint ts ranges, one bucket each via a constant batch key
    val rows = (0L until 400L).map(k => (k, k * 10L, s"v$k")).toDF("key", "ts", "v")
    Upsert.mergeIntoManifestBucketedParquet(spark, path, rows,
      Seq("key"), nBuckets = 8, statsCols = Seq("ts"))
    val body = Upsert.manifestBody(spark, path, None).get
    val all = Upsert.parseManifestEntries(body).values.flatten.toSeq
    // a range that covers nothing: everything must prune
    val (keepNone, pruneAll) = FileStats.split(FileStats.parse(body), all,
      Seq(FileStats.ColRange.between("ts", 100000L, 200000L)))
    assert(keepNone.isEmpty && pruneAll.size == all.size)
    val emptyRead = Upsert.readManifestTable(spark, path,
      ranges = Seq(FileStats.ColRange.between("ts", 100000L, 200000L)))
    assert(emptyRead.count() == 0L)
    assert(emptyRead.columns.toSet == Set("key", "ts", "v", "__bucket"))
    // a live range returns exactly what a full-scan filter returns
    val pruned = Upsert.readManifestTable(spark, path,
        ranges = Seq(FileStats.ColRange.between("ts", 500L, 900L)))
      .where($"ts".between(500L, 900L))
      .select("key").as[Long].collect().toSet
    val full = Upsert.readManifestTable(spark, path)
      .where($"ts".between(500L, 900L))
      .select("key").as[Long].collect().toSet
    assert(pruned == full && full.nonEmpty)
  }

  test("key-range pruning: point lookup opens a strict file subset") {
    val path = mkTarget()
    val rows = (0L until 400L).map(k => (k, s"v$k")).toDF("key", "v")
    Upsert.mergeIntoManifestBucketedParquet(spark, path, rows,
      Seq("key"), nBuckets = 8)
    val body = Upsert.manifestBody(spark, path, None).get
    val all = Upsert.parseManifestEntries(body).values.flatten.toSeq
    // keys are hash-scattered, so a NARROW range still overlaps most
    // files — but a point PAST the domain must prune everything
    val (k1, p1) = FileStats.split(FileStats.parse(body), all,
      Seq(FileStats.ColRange.eqTo("key", 999999L)))
    assert(k1.isEmpty && p1.size == all.size)
  }

  test("untouched buckets carry their stats forward across commits") {
    val path = mkTarget()
    val first = (0L until 40L).map(k => (k, k * 100L, s"v$k")).toDF("key", "ts", "v")
    Upsert.mergeIntoManifestBucketedParquet(spark, path, first,
      Seq("key"), nBuckets = 4, statsCols = Seq("ts"))
    val m1 = Upsert.readBucketManifest(spark, path)
    Upsert.mergeIntoManifestBucketedParquet(spark, path,
      Seq((7L, 700000L, "UPD")).toDF("key", "ts", "v"),
      Seq("key"), nBuckets = 4, statsCols = Seq("ts"))
    val stats2 = statsOf(path)
    val m2 = Upsert.readBucketManifest(spark, path)
    val untouched = m2.keySet.filter(b => m2(b) == m1.getOrElse(b, Nil))
    assert(untouched.nonEmpty)
    untouched.flatMap(m2(_)).foreach { abs =>
      assert(stats2.keys.exists(r => abs.endsWith(r)),
        s"carried file lost its stats: $abs")
    }
    // the touched bucket's new file records the new ts domain
    val touched = (m2.keySet -- untouched).flatMap(m2(_))
    val newStats = touched.flatMap(abs =>
      stats2.collect { case (r, s) if abs.endsWith(r) => s })
    assert(newStats.exists(_("ts").max.get == BigDecimal(700000L)))
  }

  test("all-null stats column: file prunes under any range; nulls counted") {
    val path = mkTarget()
    val rows = Seq((1L, Option.empty[Long], "a"),
      (2L, Option.empty[Long], "b")).toDF("key", "ts", "v")
    Upsert.mergeIntoManifestBucketedParquet(spark, path, rows,
      Seq("key"), nBuckets = 1, statsCols = Seq("ts"))
    val body = Upsert.manifestBody(spark, path, None).get
    val stats = FileStats.parse(body)
    val ts = stats.values.head("ts")
    assert(ts.min.isEmpty && ts.max.isEmpty && ts.nulls == 2L)
    val all = Upsert.parseManifestEntries(body).values.flatten.toSeq
    val (kept, pruned) = FileStats.split(stats, all,
      Seq(FileStats.ColRange.atLeast("ts", Long.MinValue)))
    assert(kept.isEmpty && pruned.size == all.size)
  }

  test("string columns record no stats; absent stats never prune") {
    val path = mkTarget()
    val rows = (0L until 10L).map(k => (k, s"v$k")).toDF("key", "v")
    Upsert.mergeIntoManifestBucketedParquet(spark, path, rows,
      Seq("key"), nBuckets = 1, statsCols = Seq("v"))
    val body = Upsert.manifestBody(spark, path, None).get
    val stats = FileStats.parse(body)
    assert(stats.values.forall(byCol => !byCol.contains("v")), stats.toString)
    // a range on the stats-less column keeps every file (sound, not fast)
    val all = Upsert.parseManifestEntries(body).values.flatten.toSeq
    val (kept, pruned) = FileStats.split(stats, all,
      Seq(FileStats.ColRange(col = "v", lo = Some(BigDecimal(0)))))
    assert(pruned.isEmpty && kept.size == all.size)
  }

  test("parse tolerates manifests without file_stats (legacy)") {
    assert(FileStats.parse("""{"attempt": "x", "0": ["data/f.parquet"]}""").isEmpty)
  }
}
