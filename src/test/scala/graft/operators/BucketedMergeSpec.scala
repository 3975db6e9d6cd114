package graft.operators

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.exchange.Exchange
import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** Bucketed-table merge: correctness of repeated upserts plus the plan
  * property that pays for bucketing — the target side of the merge join
  * has NO Exchange (only the incremental batch shuffles). */
class BucketedMergeSpec extends SparkSpecBase {
  import spark.implicits._

  private def collectAll(p: SparkPlan): Seq[SparkPlan] = {
    val self = p match {
      case a: AdaptiveSparkPlanExec => collectAll(a.executedPlan)
      case other => Seq(other)
    }
    self ++ p.children.flatMap(collectAll)
  }

  test("merge into bucketed table: upsert semantics + no target-side shuffle") {
    val table = "bucketed_merge_spec"
    spark.sql(s"DROP TABLE IF EXISTS $table")
    spark.sql(s"DROP TABLE IF EXISTS ${table}_swap")

    val base = Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L))
      .toDF("id", "ref", "v")
    Upsert.mergeIntoBucketedTable(spark, table, base, Seq("id"), numBuckets = 4)

    // the bucketed scan side of a key join must not shuffle
    val joined = spark.table(table)
      .join(Seq((2L, 99L)).toDF("id", "v2"), Seq("id"))
    val exchanges = collectAll(joined.queryExecution.executedPlan)
      .collect { case e: Exchange => e }
    assert(!exchanges.exists(_.toString.contains("FileScan parquet")),
      "bucketed target was shuffled for a key join")

    val updates = Seq((2L, "B", 21L), (4L, "d", 40L)).toDF("id", "ref", "v")
    Upsert.mergeIntoBucketedTable(spark, table, updates, Seq("id"),
      numBuckets = 4, insertOnlyCols = Set("ref"))

    val after = spark.table(table).orderBy("id")
      .as[(Long, String, Long)].collect().toSeq
    assert(after == Seq(
      (1L, "a", 10L),
      (2L, "b", 21L), // v updated, ref insert-only -> kept
      (3L, "c", 30L),
      (4L, "d", 40L))) // inserted

    // bucketing survived the swap rewrite
    val desc = spark.sql(s"DESCRIBE EXTENDED $table").collect().map(_.toString)
    assert(desc.exists(r => r.contains("Num Buckets") || r.contains("4 buckets")),
      s"table lost its bucketing:\n${desc.mkString("\n")}")

    spark.sql(s"DROP TABLE IF EXISTS $table")
  }

  test("hash-bucketed merge rewrites only the touched partitions") {
    val dir = java.nio.file.Files.createTempDirectory("hb-merge").toString + "/t"
    val base = (1L to 40L).map(i => (i, s"r$i", i * 10)).toDF("id", "ref", "v")
    Upsert.mergeIntoHashBucketedParquet(spark, dir, base, Seq("id"), nBuckets = 4)

    def bucketFiles(b: Int): Map[String, Long] = {
      val d = new java.io.File(s"$dir/__bucket=$b")
      if (!d.exists) Map.empty
      else d.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(f => f.getName -> f.lastModified()).toMap
    }
    // bucket of id=1 under the same hash the operator uses
    val touchedBucket = spark.range(1).select(
      pmod(xxhash64(lit(1L)), lit(4)).cast("int")).collect().head.getInt(0)
    val untouchedBucket = (0 until 4).find { b =>
      b != touchedBucket && bucketFiles(b).nonEmpty
    }.get
    val before = bucketFiles(untouchedBucket)

    val updates = Seq((1L, "R1", 999L), (100L, "r100", 1000L))
      .toDF("id", "ref", "v")
      // keep the second update in the same bucket as id=1 so exactly one
      // partition is touched
      .where(pmod(xxhash64(col("id")), lit(4)).cast("int") === touchedBucket)
    Upsert.mergeIntoHashBucketedParquet(spark, dir, updates, Seq("id"), nBuckets = 4)

    val after = spark.read.parquet(dir)
    assert(after.where(col("id") === 1).select("v").as[Long].head() == 999L)
    assert(after.where(col("id") === 2).select("v").as[Long].head() == 20L)
    assert(bucketFiles(untouchedBucket) == before,
      "untouched partition was rewritten")
  }

  test("hash-bucketed layout: bucket filter prunes partitions at the scan") {
    val dir = java.nio.file.Files.createTempDirectory("hb-prune").toString + "/t"
    val base = (1L to 40L).map(i => (i, i * 10)).toDF("id", "v")
    Upsert.mergeIntoHashBucketedParquet(spark, dir, base, Seq("id"), nBuckets = 4)
    val scan = spark.read.parquet(dir).where(col("__bucket") === 1)
    val s = scan.queryExecution.executedPlan.toString
    assert(s.contains("PartitionFilters") && s.contains("__bucket"),
      s"bucket predicate did not reach partition pruning:\n$s")
    // only one directory's files are read
    val files = scan.select(input_file_name()).distinct().collect()
      .map(_.getString(0))
    assert(files.nonEmpty && files.forall(_.contains("__bucket=1")), files.mkString("\n"))
  }

  test("bucketed-table swap crash: merged data restored from the swap table") {
    val table = "bucketed_swap_crash_spec"
    spark.sql(s"DROP TABLE IF EXISTS $table")
    spark.sql(s"DROP TABLE IF EXISTS ${table}_swap")

    val base = Seq((1L, 10L), (2L, 20L)).toDF("id", "v")
    Upsert.mergeIntoBucketedTable(spark, table, base, Seq("id"), numBuckets = 2)
    Upsert.mergeIntoBucketedTable(spark, table,
      Seq((3L, 30L)).toDF("id", "v"), Seq("id"), numBuckets = 2)

    // Simulate a crash between `DROP TABLE t` and `RENAME t_swap TO t`:
    // the canonical name is gone, the fully-merged snapshot is in the swap.
    spark.sql(s"ALTER TABLE $table RENAME TO ${table}_swap")

    Upsert.mergeIntoBucketedTable(spark, table,
      Seq((2L, 99L), (4L, 40L)).toDF("id", "v"), Seq("id"), numBuckets = 2)
    val after = spark.table(table).orderBy("id").as[(Long, Long)].collect().toSeq
    // without the recovery rename this would be just the last batch
    assert(after == Seq((1L, 10L), (2L, 99L), (3L, 30L), (4L, 40L)))

    spark.sql(s"DROP TABLE IF EXISTS $table")
    spark.sql(s"DROP TABLE IF EXISTS ${table}_swap")
  }

  test("hash-bucketed merge: pending manifest detects a torn batch") {
    val dir = java.nio.file.Files.createTempDirectory("hb-manifest").toString + "/t"
    val base = (1L to 20L).map(i => (i, i * 10)).toDF("id", "v")
    Upsert.mergeIntoHashBucketedParquet(spark, dir, base, Seq("id"),
      nBuckets = 4, batchId = "b1")
    // successful run clears its manifest
    assert(Upsert.pendingManifest(spark, dir).isEmpty)

    // simulate a crash: manifest of batch b2 written, overwrite incomplete
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val m = new org.apache.hadoop.fs.Path(dir + "._merge_manifest.json")
    val out = fs.create(m, true)
    out.write("""{"batch_id":"b2","buckets":[0,2]}""".getBytes("UTF-8"))
    out.close()
    assert(Upsert.pendingManifest(spark, dir).contains(("b2", Seq(0, 2))))

    // a different batch must refuse to run over the torn window
    val next = Seq((21L, 210L)).toDF("id", "v")
    val e = intercept[IllegalArgumentException] {
      Upsert.mergeIntoHashBucketedParquet(spark, dir, next, Seq("id"),
        nBuckets = 4, batchId = "b3")
    }
    assert(e.getMessage.contains("torn run"))

    // re-running the pending batch is the recovery: converges + clears
    val b2 = Seq((1L, 111L)).toDF("id", "v")
    Upsert.mergeIntoHashBucketedParquet(spark, dir, b2, Seq("id"),
      nBuckets = 4, batchId = "b2")
    assert(Upsert.pendingManifest(spark, dir).isEmpty)
    assert(spark.read.parquet(dir).where(col("id") === 1)
      .select("v").as[Long].head() == 111L)
  }

  test("hash-bucketed delete rewrites only the keys' buckets; empties drop dirs") {
    val dir = java.nio.file.Files.createTempDirectory("graft-hb-del").toString
    val path = s"$dir/table"
    val rows = (0L until 40L).map(k => (k, s"v$k")).toDF("key", "v")
    Upsert.mergeIntoHashBucketedParquet(spark, path, rows, Seq("key"),
      nBuckets = 4)
    val bucketOf = rows.select($"key",
      pmod(xxhash64($"key"), lit(4)).cast("int").as("b"))
      .as[(Long, Int)].collect().toMap
    val b0Keys = bucketOf.filter(_._2 == 0).keys.toSeq
    def dirMtime(b: Int): Long = new java.io.File(s"$path/__bucket=$b")
      .listFiles().map(_.lastModified()).max

    val untouchedBefore = (1 to 3).map(b => b -> dirMtime(b)).toMap
    Upsert.deleteKeysFromHashBucketedParquet(spark, path,
      b0Keys.take(2).toDF("key"), Seq("key"), nBuckets = 4)
    val left = spark.read.parquet(path).select("key").as[Long].collect().toSet
    assert(left == (0L until 40L).toSet -- b0Keys.take(2))
    (1 to 3).foreach(b =>
      assert(dirMtime(b) == untouchedBefore(b), s"bucket $b rewritten"))

    // delete the rest of bucket 0: its partition dir must disappear
    Upsert.deleteKeysFromHashBucketedParquet(spark, path,
      b0Keys.toDF("key"), Seq("key"), nBuckets = 4)
    assert(!new java.io.File(s"$path/__bucket=0").exists(),
      "emptied bucket dir survives (stale data)")
    assert(spark.read.parquet(path).select("key").as[Long].collect().toSet ==
      (0L until 40L).toSet -- b0Keys)
  }

  test("legacy hash-bucketed target: a too-LARGE wrong nBuckets is rejected, correct one re-pins") {
    // ADVICE r8: `observed.forall(_ < passed)` only rejected a too-SMALL
    // count; a too-large one (e.g. 64 against a table bucketed with 8)
    // passes it, computes delete buckets with the wrong modulus, prunes
    // to the wrong dirs, and silently leaves keys unerased.
    val dir = java.nio.file.Files.createTempDirectory("graft-legacy-nb").toString
    val path = s"$dir/table"
    val rows = (0L until 40L).map(k => (k, s"v$k")).toDF("key", "v")
    Upsert.mergeIntoHashBucketedParquet(spark, path, rows, Seq("key"), nBuckets = 8)
    // forge a pre-round-8 target: no _nbuckets pin
    new java.io.File(path, "_nbuckets").delete()
    new java.io.File(path, "._nbuckets.crc").delete()
    val e = intercept[IllegalArgumentException] {
      Upsert.deleteKeysFromHashBucketedParquet(spark, path,
        Seq(3L).toDF("key"), Seq("key"), nBuckets = 64)
    }
    assert(e.getMessage.contains("reproduce"), s"wrong failure mode: $e")
    assert(spark.read.parquet(path).where($"key" === 3L).count() == 1,
      "the rejected erasure still mutated the target")
    // the CORRECT count sample-validates, erases, and re-pins _nbuckets
    Upsert.deleteKeysFromHashBucketedParquet(spark, path,
      Seq(3L).toDF("key"), Seq("key"), nBuckets = 8)
    assert(spark.read.parquet(path).where($"key" === 3L).count() == 0)
    assert(new java.io.File(path, "_nbuckets").exists,
      "validated bucket count was not pinned")
  }

  test("salted top-k equals plain top-k, including on a hot key") {
    val hot = (1 to 500).map(i => (1L, i.toLong))
    val cold = Seq((2L, 7L), (2L, 3L), (3L, 9L))
    val df = (hot ++ cold).toDF("k", "v")
    val plain = Dedup.topKPerKey(df, 3, Seq("k"), Seq(col("v").desc))
      .as[(Long, Long)].collect().toSet
    val salted = Dedup.topKPerKeySalted(df, 3, Seq("k"), Seq(col("v").desc),
      saltOn = Seq(col("v")), saltBuckets = 8)
      .as[(Long, Long)].collect().toSet
    assert(salted == plain)
  }
}
