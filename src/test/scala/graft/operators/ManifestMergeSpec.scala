package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** Manifest-bucketed target: incremental bucket rewrite + atomic
  * pointer commit together (the object-store-safe upgrade over dynamic
  * partition overwrite's torn window). */
class ManifestMergeSpec extends SparkSpecBase {
  import spark.implicits._

  private def mkTarget(): String =
    Files.createTempDirectory("graft-manifest").toString + "/table"

  test("incremental merge rewrites only touched buckets; content is exact") {
    val path = mkTarget()
    val first = (0L until 40L).map(k => (k, s"v$k")).toDF("key", "v")
    Upsert.mergeIntoManifestBucketedParquet(spark, path, first,
      Seq("key"), nBuckets = 4)
    val m1 = Upsert.readBucketManifest(spark, path)
    assert(m1.keySet == Set(0, 1, 2, 3))

    // one key -> one touched bucket; the other 3 buckets must keep their
    // file entries verbatim (no rewrite, no copy)
    val upd = Seq((7L, "UPDATED"), (1007L, "NEW")).toDF("key", "v")
    Upsert.mergeIntoManifestBucketedParquet(spark, path, upd,
      Seq("key"), nBuckets = 4)
    val m2 = Upsert.readBucketManifest(spark, path)
    val touched = m2.keySet.filter(b => m1.getOrElse(b, Nil) != m2(b))
    assert(touched.size <= 2, s"too many buckets rewritten: $touched")
    (m2.keySet -- touched).foreach(b => assert(m2(b) == m1(b)))

    val out = Upsert.readManifestTable(spark, path)
      .select("key", "v").as[(Long, String)].collect().toMap
    assert(out.size == 41)
    assert(out(7L) == "UPDATED" && out(1007L) == "NEW" && out(8L) == "v8")
  }

  test("deleteKeys rewrites only the keys' buckets; emptied bucket -> empty entry") {
    val path = mkTarget()
    val rows = (0L until 40L).map(k => (k, s"v$k")).toDF("key", "v")
    Upsert.mergeIntoManifestBucketedParquet(spark, path, rows,
      Seq("key"), nBuckets = 4)
    val m1 = Upsert.readBucketManifest(spark, path)
    // keys of bucket 0, computed with the merge's own hash
    val bucketOf = rows.select($"key",
      pmod(xxhash64($"key"), lit(4)).cast("int").as("b"))
      .as[(Long, Int)].collect().toMap
    val b0Keys = bucketOf.filter(_._2 == 0).keys.toSeq
    assert(b0Keys.nonEmpty)

    // partial delete: two bucket-0 keys go, everything else untouched
    val twoKeys = b0Keys.take(2)
    Upsert.deleteKeysFromManifestBucketedParquet(spark, path,
      twoKeys.toDF("key"), Seq("key"), nBuckets = 4)
    val m2 = Upsert.readBucketManifest(spark, path)
    (1 to 3).foreach(b => assert(m2(b) == m1(b), s"bucket $b was rewritten"))
    assert(m2(0) != m1(0))
    val out = Upsert.readManifestTable(spark, path)
      .select("key").as[Long].collect().toSet
    assert(out == (0L until 40L).toSet -- twoKeys)

    // full-bucket delete: bucket 0's entry becomes EMPTY; table readable
    Upsert.deleteKeysFromManifestBucketedParquet(spark, path,
      b0Keys.toDF("key"), Seq("key"), nBuckets = 4)
    val m3 = Upsert.readBucketManifest(spark, path)
    assert(m3(0).isEmpty, s"expected empty bucket-0 entry: ${m3(0)}")
    assert(Upsert.readManifestTable(spark, path)
      .select("key").as[Long].collect().toSet ==
      (0L until 40L).toSet -- b0Keys)

    // a later merge repopulates the emptied bucket
    Upsert.mergeIntoManifestBucketedParquet(spark, path,
      Seq((b0Keys.head, "BACK")).toDF("key", "v"), Seq("key"), nBuckets = 4)
    assert(Upsert.readManifestTable(spark, path)
      .where($"key" === b0Keys.head).select("v").as[String].head() == "BACK")
  }

  test("vacuum on a manifest target keeps only the live manifest's files") {
    val path = mkTarget()
    def mergeKeep3(rows: Seq[(Long, String)]): Unit =
      Upsert.mergeIntoManifestBucketedParquet(spark, path,
        rows.toDF("key", "v"), Seq("key"), nBuckets = 2, keepSnapshots = 3)
    mergeKeep3((0L until 10L).map(k => (k, s"v$k")))
    mergeKeep3(Seq((3L, "u3")))
    Upsert.deleteKeysFromManifestBucketedParquet(spark, path,
      Seq(7L).toDF("key"), Seq("key"), nBuckets = 2, keepSnapshots = 3)
    assert(Upsert.snapshots(spark, path).size == 3)
    Upsert.vacuum(spark, path)
    assert(Upsert.snapshots(spark, path).size == 1)
    // table reads exactly the post-delete content; every manifest entry
    // resolves to a file that still exists, and no dead files remain
    val t = Upsert.readManifestTable(spark, path)
    assert(t.select("key").as[Long].collect().toSet ==
      (0L until 10L).toSet - 7L)
    val live = Upsert.readBucketManifest(spark, path).values.flatten
      .map(p => new org.apache.hadoop.fs.Path(p).toUri.getPath).toSet
    val onDisk = new java.io.File(s"$path/data").listFiles()
      .filter(_.isDirectory).flatMap(_.listFiles())
      .filter(_.isDirectory).flatMap(_.listFiles())
      .filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath).toSet
    assert(onDisk == live, s"dead files survive vacuum: ${onDisk -- live}")
  }

  test("bucket pruning reads only the asked-for buckets' files") {
    val path = mkTarget()
    val rows = (0L until 40L).map(k => (k, k * 10)).toDF("key", "v")
    Upsert.mergeIntoManifestBucketedParquet(spark, path, rows,
      Seq("key"), nBuckets = 4)
    val manifest = Upsert.readBucketManifest(spark, path)
    val b0 = Upsert.readManifestTable(spark, path, buckets = Some(Seq(0)))
    assert(b0.select("__bucket").distinct().collect().map(_.getInt(0)).toSeq == Seq(0))
    assert(b0.count() ==
      Upsert.readManifestTable(spark, path).where("__bucket = 0").count())
    def norm(p: String) = new org.apache.hadoop.fs.Path(p).toUri.getPath
    assert(b0.inputFiles.map(norm).toSet == manifest(0).map(norm).toSet)
  }

  test("keepSnapshots=2 retains the previous manifest and its files") {
    val path = mkTarget()
    def mergeKeep2(rows: Seq[(Long, String)]): Unit =
      Upsert.mergeIntoManifestBucketedParquet(spark, path,
        rows.toDF("key", "v"), Seq("key"), nBuckets = 2, keepSnapshots = 2)
    mergeKeep2((0L until 10L).map(k => (k, s"v$k")))
    mergeKeep2(Seq((3L, "u3")))
    mergeKeep2(Seq((4L, "u4")))
    val manifests = new java.io.File(path).listFiles()
      .map(_.getName).filter(_.endsWith(".manifest.json")).sorted.toSeq
    assert(manifests == Seq("snap-000000001.manifest.json",
      "snap-000000002.manifest.json"))
    // every file the retained previous manifest references still exists
    val prev = java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$path/snap-000000001.manifest.json"))
    // entries are root-relative (legacy manifests may hold absolute URIs)
    "\"([^\"]+\\.parquet)\"".r.findAllMatchIn(prev).map(_.group(1)).foreach { f =>
      val resolved =
        if (f.contains("://") || f.startsWith("/"))
          new java.io.File(new java.net.URI(f).getPath)
        else new java.io.File(path, f)
      assert(resolved.isFile, s"GC ate $f")
    }
    val out = Upsert.readManifestTable(spark, path)
      .select("key", "v").as[(Long, String)].collect().toMap
    assert(out(3L) == "u3" && out(4L) == "u4" && out(5L) == "v5")
  }

  test("crash after data+manifest write but before publish is invisible") {
    val path = mkTarget()
    Upsert.mergeIntoManifestBucketedParquet(spark, path,
      Seq((1L, "a"), (2L, "b")).toDF("key", "v"), Seq("key"), nBuckets = 2)

    // simulate the crashed run: orphan run dir + orphan manifest, no
    // pointer advance
    Seq((1L, "TORN")).toDF("key", "v").withColumn("__bucket",
        org.apache.spark.sql.functions.lit(0))
      .withColumn("__bucket_p", org.apache.spark.sql.functions.lit(0))
      .write.partitionBy("__bucket_p").parquet(s"$path/data/run-000000001")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$path/snap-000000001.manifest.json"),
      """{"0": ["/nonexistent"]}""")

    val seen = Upsert.readManifestTable(spark, path)
      .select("key", "v").as[(String, String)].collect()
    assert(seen.map(_._2).toSet == Set("a", "b"), "reader saw the torn run")

    // the retry converges and GCs the orphans
    Upsert.mergeIntoManifestBucketedParquet(spark, path,
      Seq((1L, "a2")).toDF("key", "v"), Seq("key"), nBuckets = 2)
    val out = Upsert.readManifestTable(spark, path)
      .select("key", "v").as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "a2", 2L -> "b"))
    val manifests = new java.io.File(path).listFiles()
      .map(_.getName).filter(_.endsWith(".manifest.json")).toSeq
    assert(manifests == Seq("snap-000000001.manifest.json"))
  }
}
