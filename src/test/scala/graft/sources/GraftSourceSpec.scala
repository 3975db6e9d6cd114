package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan
import org.apache.spark.sql.functions._

import graft.SparkSpecBase
import graft.operators.Upsert

/** DSv2 read connector (VERDICT r15 #1): `spark.read.format("graft")`
  * over every merge-target layout, with snapshot time travel and
  * file-stats range pruning AT the DSv2 layer. */
class GraftSourceSpec extends SparkSpecBase {
  import spark.implicits._

  private def tmp(tag: String): String =
    Files.createTempDirectory(s"graft-dsv2-$tag").toString + "/table"

  private def load(path: String, snapshot: Option[String] = None): DataFrame = {
    val r = spark.read.format("graft")
    snapshot.fold(r)(s => r.option("snapshot", s)).load(path)
  }

  /** The delegate ParquetScan serving a connector read — how many files
    * survived the DSv2-layer pruning. */
  private def scannedFiles(df: DataFrame): Int =
    df.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec => b.scan
    } match {
      case Some(p: ParquetScan) => p.fileIndex.inputFiles.length
      case Some(g: GraftBucketedScan) => g.currentFiles.size
      case Some(_: GraftEmptyScan) => 0
      case other => fail(s"no DSv2 scan in plan: $other")
    }

  test("manifest layout: connector read equals readTarget, row for row") {
    val path = tmp("mb")
    val rows = (0L until 200L).map(k => (k, k * 10L, s"v$k")).toDF("key", "ts", "v")
    Upsert.mergeIntoManifestBucketedParquet(spark, path, rows,
      Seq("key"), nBuckets = 4, statsCols = Seq("ts"))
    val viaConnector = load(path).drop("__bucket")
      .orderBy("key").as[(Long, Long, String)].collect().toSeq
    val viaLibrary = Upsert.readTarget(spark, path).drop("__bucket")
      .orderBy("key").as[(Long, Long, String)].collect().toSeq
    assert(viaConnector == viaLibrary && viaConnector.size == 200)
  }

  test("snapshot option: time travel by name and by bare id") {
    val path = tmp("tt")
    Upsert.mergeIntoManifestBucketedParquet(spark, path,
      Seq((1L, "old")).toDF("key", "v"), Seq("key"),
      nBuckets = 2, keepSnapshots = 2)
    Upsert.mergeIntoManifestBucketedParquet(spark, path,
      Seq((1L, "new")).toDF("key", "v"), Seq("key"),
      nBuckets = 2, keepSnapshots = 2)
    assert(load(path).select("v").as[String].head() == "new")
    assert(load(path, Some("snap-000000000"))
      .select("v").as[String].head() == "old")
    assert(load(path, Some("0")).select("v").as[String].head() == "old")
    assert(load(path, Some("1")).select("v").as[String].head() == "new")
  }

  test("range predicate prunes files at the DSv2 layer; results stay exact") {
    val path = tmp("prune")
    // ts aligned with the table's OWN bucket assignment so each file
    // covers a disjoint ts range — the clustered layout stats pruning is
    // for (a hash-scattered column never prunes, correctly)
    val rows = (0L until 400L).toDF("key")
      .withColumn("ts",
        pmod(xxhash64($"key"), lit(8)) * 1000L + $"key")
      .withColumn("v", concat(lit("v"), $"key"))
    Upsert.mergeIntoManifestBucketedParquet(spark, path, rows,
      Seq("key"), nBuckets = 8, statsCols = Seq("ts"))
    val total = scannedFiles(load(path))
    assert(total == 8, s"expected one file per bucket, saw $total")
    val filtered = load(path).where($"ts" >= 1000L && $"ts" <= 1999L)
    val kept = scannedFiles(filtered)
    assert(kept == 1, s"range predicate did not prune ($kept of $total)")
    // exactness: pruned read == full-scan filter
    val viaConnector = filtered.select("key").as[Long].collect().toSet
    val full = Upsert.readTarget(spark, path)
      .where($"ts".between(1000L, 1999L)).select("key").as[Long].collect().toSet
    assert(viaConnector == full && full.nonEmpty)
    // a range beyond every file serves the zero-partition empty scan
    val none = load(path).where($"ts" > 1000000L)
    assert(scannedFiles(none) == 0 && none.count() == 0L)
    assert(none.schema.fieldNames.contains("key")) // schema survives
  }

  test("key-equality predicate prunes to ONE bucket at the DSv2 layer") {
    val path = tmp("bucketprune")
    Upsert.mergeIntoManifestBucketedParquet(spark, path,
      (0L until 400L).map(k => (k, s"v$k")).toDF("key", "v"),
      Seq("key"), nBuckets = 8)
    assert(scannedFiles(load(path)) == 8)
    val point = load(path).where($"key" === 5L)
    assert(scannedFiles(point) == 1,
      "point lookup did not prune to the key's bucket")
    assert(point.select("v").as[String].collect().toSeq == Seq("v5"))
    // a non-key predicate must NOT bucket-prune (and stays correct)
    val nonKey = load(path).where($"v" === "v7")
    assert(scannedFiles(nonKey) == 8)
    assert(nonKey.select("key").as[Long].head() == 7L)
    // composite keys prune only when EVERY key column has an equality
    val path2 = tmp("bucketprune2")
    Upsert.mergeIntoManifestBucketedParquet(spark, path2,
      (0L until 100L).map(k => (k, k % 3, s"v$k")).toDF("a", "b", "v"),
      Seq("a", "b"), nBuckets = 8)
    // partial key: NO bucket prune (file-stats pruning on the key's
    // recorded min/max may still drop some files — that's the other axis)
    assert(scannedFiles(load(path2).where($"a" === 5L)) > 1)
    val both = load(path2).where($"a" === 5L && $"b" === 2L)
    assert(scannedFiles(both) == 1)
    assert(both.select("v").as[String].head() == "v5")
  }

  test("column pruning flows through to the delegate parquet scan") {
    val path = tmp("prunecol")
    Upsert.mergeIntoManifestBucketedParquet(spark, path,
      (0L until 50L).map(k => (k, s"v$k", s"w$k")).toDF("key", "v", "w"),
      Seq("key"), nBuckets = 2)
    val df = load(path).select("v")
    val read = df.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec => b.scan.readSchema()
    }.get
    assert(read.fieldNames.toSeq == Seq("v"), read.treeString)
    assert(df.as[String].collect().length == 50)
  }

  test("STRING-keyed table: point lookup bucket-prunes; string stats range-prune (r17)") {
    val path = tmp("strkey")
    // string keys with a shared long prefix: bucket pruning comes from
    // the hash, file-stats pruning from the truncated bounds
    val rows = (0L until 400L)
      .map(k => (f"user-$k%04d", k, s"v$k")).toDF("name", "ts", "v")
    Upsert.mergeIntoManifestBucketedParquet(spark, path, rows,
      Seq("name"), nBuckets = 8)
    assert(scannedFiles(load(path)) == 8)
    // equality on the string KEY prunes to one bucket (ADVICE r16: the
    // equality is mined from ALL pushed filters, not just numeric ones)
    val point = load(path).where($"name" === "user-0005")
    assert(scannedFiles(point) == 1,
      "string-key point lookup did not prune to one bucket")
    assert(point.select("v").as[String].collect().toSeq == Seq("v5"))
    // a string range over the KEY column: files are hash-scattered on
    // name, so every file's [min,max] covers most of the domain — stats
    // stay SOUND (no wrong prune) and the result exact
    val range = load(path).where($"name" >= "user-0100" && $"name" < "user-0200")
    assert(range.count() == 100L)
    // a range beyond every recorded bound prunes ALL files at the stats
    // layer (no bucket equality involved)
    val none = load(path).where($"name" > "zzzz")
    assert(scannedFiles(none) == 0 && none.count() == 0L)
    // prefix predicate: in-domain prefix keeps files and stays exact
    val pfx = load(path).where($"name".startsWith("user-01"))
    assert(pfx.count() == 100L)
    val nopfx = load(path).where($"name".startsWith("zzz"))
    assert(scannedFiles(nopfx) == 0 && nopfx.count() == 0L)
  }

  test("string file-stats prune files when the layout clusters the string column (r17)") {
    val path = tmp("strstats")
    // cluster ts-aligned with the bucket hash so each file covers a
    // DISJOINT name range (same construction as the numeric prune test)
    val rows = (0L until 400L).toDF("key")
      .withColumn("name", concat(
        lpad(pmod(xxhash64($"key"), lit(8)).cast("string"), 2, "0"),
        lit("-prefix-that-is-long-"), lpad($"key".cast("string"), 4, "0")))
      .withColumn("v", concat(lit("v"), $"key"))
    Upsert.mergeIntoManifestBucketedParquet(spark, path, rows,
      Seq("key"), nBuckets = 8, statsCols = Seq("name"))
    assert(scannedFiles(load(path)) == 8)
    // each bucket's file holds names sharing its 2-digit hash prefix —
    // an equality under ONE prefix must open exactly one file
    val one = load(path).where($"name" === "03-prefix-that-is-long-0007")
    assert(scannedFiles(one) <= 1, "string stats did not prune disjoint files")
    // exactness against the library read
    val viaLib = Upsert.readTarget(spark, path)
      .where($"name" === "03-prefix-that-is-long-0007").count()
    assert(one.count() == viaLib)
  }

  test("corrupted bucket_keys recording fails LOUD on a point lookup (r17 #5)") {
    val path = tmp("corrupt")
    Upsert.mergeIntoManifestBucketedParquet(spark, path,
      (0L until 100L).map(k => (k, s"w${k % 7}", s"v$k")).toDF("key", "w", "v"),
      Seq("key"), nBuckets = 8)
    // corrupt the manifest: claim the table is bucketed by a column
    // whose values do NOT reproduce the recorded placement. Pick (from
    // two candidates) one whose SAMPLED row provably mismatches, so the
    // test never rides a 1-in-8 hash coincidence.
    val mf = new org.apache.hadoop.fs.Path(path, "snap-000000000.manifest.json")
    val fs = mf.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val orig = Upsert.manifestBody(spark, path, None).get
    val (b0, files0) = Upsert.parseManifestEntries(orig)
      .toSeq.sortBy(_._1).find(_._2.nonEmpty).get
    val sampleRow = spark.read.parquet(Upsert.resolveEntry(path, files0.head))
    val corruptCol = Seq("w", "v").find { c =>
      sampleRow.select(pmod(xxhash64(col(c)), lit(8L)).cast("int"))
        .limit(1).as[Int].head() != b0
    }.getOrElse(fail("both candidate columns hash-coincide — adjust data"))
    val body = orig.replace(""""bucket_keys": "key"""",
      s""""bucket_keys": "$corruptCol"""")
    fs.delete(mf, false)
    val out = fs.create(mf, true)
    try out.write(body.getBytes("UTF-8")) finally out.close()
    // an equality on the CLAIMED key would point-prune into the wrong
    // bucket and silently return a partial/empty result — the read-time
    // sample verification must refuse instead
    val e = intercept[Exception] {
      load(path).where(col(corruptCol) === "w3").collect()
    }
    def messages(t: Throwable): String =
      if (t == null) "" else t.getMessage + "\n" + messages(t.getCause)
    assert(messages(e).contains("bucket_keys"),
      s"expected the loud layout-corruption refusal, got: ${messages(e)}")
    // a full scan (no point lookup) of the same table still serves
    assert(load(path).count() == 100L)
  }

  test("aggregate pushdown: COUNT/MIN/MAX answered from manifest stats, zero data files (r17 #8)") {
    val path = tmp("aggpush")
    val rows = (0L until 300L).map(k =>
      (k, k * 7L, if (k % 10 == 0) None else Some(k * 2L), s"v$k"))
      .toDF("key", "ts", "maybe", "v")
    Upsert.mergeIntoManifestBucketedParquet(spark, path, rows,
      Seq("key"), nBuckets = 4, statsCols = Seq("ts", "maybe"))
    val agg = load(path).agg(
      count(lit(1)).as("n"), min($"ts").as("mn"), max($"ts").as("mx"),
      count($"maybe").as("nm"))
    // served as a LocalTableScan — no batch scan, no files opened
    val plan = agg.queryExecution.executedPlan.toString
    assert(plan.contains("LocalTableScan") && !plan.contains("BatchScan"),
      s"aggregate was not answered from stats:\n$plan")
    val r = agg.head()
    assert(r.getLong(0) == 300L && r.getLong(1) == 0L &&
      r.getLong(2) == 299L * 7L && r.getLong(3) == 270L, r.toString)
    // exactness against the normal scan path
    val full = Upsert.readTarget(spark, path).agg(
      count(lit(1)), min($"ts"), max($"ts"), count($"maybe")).head()
    assert(r.toSeq == full.toSeq)
    // declines soundly: a FILTERED aggregate takes the normal scan path
    val filtered = load(path).where($"ts" > 100L).agg(count(lit(1)))
    assert(filtered.queryExecution.executedPlan.toString.contains("Scan"))
    assert(filtered.head().getLong(0) ==
      Upsert.readTarget(spark, path).where($"ts" > 100L).count())
    // declines soundly: string min/max (truncated bounds) stays a scan
    val strAgg = load(path).agg(min($"v"))
    assert(!strAgg.queryExecution.executedPlan.toString.contains("LocalTableScan"))
    assert(strAgg.head().getString(0) ==
      Upsert.readTarget(spark, path).agg(min($"v")).head().getString(0))
  }

  test("GROUPED aggregate pushdown: file-constant grouping columns answered from stats (r18)") {
    val path = tmp("agggroup")
    val rows = (0L until 240L).map(k =>
      (k % 6L, k, if (k % 7 == 0) None else Some(k * 3L)))
      .toDF("grp", "key", "maybe")
    // one-shot build bucketed BY grp: each bucket — hence each file — is
    // single-valued in grp (6 values spread over 64 buckets; the merge
    // into an EMPTY target passes duplicate keys straight through)
    Upsert.mergeIntoManifestBucketedParquet(spark, path, rows,
      Seq("grp"), nBuckets = 64, statsCols = Seq("key", "maybe"))
    val agg = load(path).groupBy($"grp").agg(
      count(lit(1)).as("n"), min($"key").as("mn"), max($"key").as("mx"),
      count($"maybe").as("nm"))
    val plan = agg.queryExecution.executedPlan.toString
    assert(plan.contains("LocalTableScan") && !plan.contains("BatchScan"),
      s"grouped aggregate was not answered from stats:\n$plan")
    val got = agg.orderBy("grp").collect().map(_.toSeq).toSeq
    val expect = Upsert.readTarget(spark, path).groupBy($"grp").agg(
        count(lit(1)).as("n"), min($"key").as("mn"), max($"key").as("mx"),
        count($"maybe").as("nm"))
      .orderBy("grp").collect().map(_.toSeq).toSeq
    assert(got == expect && got.size == 6, s"got $got")

    // string grouping column with exact (untruncated) bounds
    val pathS = tmp("agggroupstr")
    Upsert.mergeIntoManifestBucketedParquet(spark, pathS,
      (0L until 120L).map(k => (s"g${k % 4}", k)).toDF("cat", "key"),
      Seq("cat"), nBuckets = 32, statsCols = Seq("key"))
    val aggS = load(pathS).groupBy($"cat").agg(count(lit(1)).as("n"))
    assert(aggS.queryExecution.executedPlan.toString.contains("LocalTableScan"),
      s"string-grouped aggregate was not answered from stats:\n" +
        aggS.queryExecution.executedPlan)
    assert(aggS.orderBy("cat").as[(String, Long)].collect().toSeq ==
      Seq(("g0", 30L), ("g1", 30L), ("g2", 30L), ("g3", 30L)))

    // declines soundly: grouping by a MULTI-VALUED column stays a scan
    val byKey = load(path).groupBy($"key").agg(count(lit(1)).as("n"))
    assert(!byKey.queryExecution.executedPlan.toString.contains("LocalTableScan"))
    assert(byKey.count() == 240L)
  }

  test("plain snapshot-pointer layout reads the live snapshot; plain dirs read directly") {
    val snapPath = tmp("snap")
    Upsert.mergeIntoParquet(spark, snapPath,
      Seq(("k1", 1L)).toDF("key", "v"), Seq("key"))
    Upsert.mergeIntoParquet(spark, snapPath,
      Seq(("k1", 2L)).toDF("key", "v"), Seq("key"))
    assert(load(snapPath).as[(String, Long)].head() == (("k1", 2L)))

    val plain = tmp("plaindir")
    Seq((1L, "a"), (2L, "b")).toDF("key", "v").write.parquet(plain)
    assert(load(plain).count() == 2L)
  }

  test("connector read heals a lagging pointer (manifestBody roll-forward)") {
    val path = tmp("lag")
    Upsert.mergeIntoManifestBucketedParquet(spark, path,
      Seq((1L, "v1")).toDF("key", "v"), Seq("key"),
      nBuckets = 2, keepSnapshots = 2)
    Upsert.mergeIntoManifestBucketedParquet(spark, path,
      Seq((1L, "v2")).toDF("key", "v"), Seq("key"),
      nBuckets = 2, keepSnapshots = 2)
    val cur = new org.apache.hadoop.fs.Path(path, "_current")
    val fs = cur.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(cur, true)
    try out.write("snap-000000000".getBytes("UTF-8")) finally out.close()
    assert(load(path).select("v").as[String].head() == "v2")
  }
}
