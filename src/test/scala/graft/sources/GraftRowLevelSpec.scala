package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpecBase
import graft.operators.Upsert

/** SQL row-level mutation face (round 18): `MERGE INTO` / `UPDATE` /
  * arbitrary-predicate `DELETE` through the catalog as a group-based
  * copy-on-write rewrite at bucket granularity
  * ([[GraftRowLevelOperation]] + [[Upsert.commitFileReplacement]]).
  *
  * The load-bearing invariants:
  *  - clause semantics are Spark's own (RewriteMergeIntoTable) — the
  *    spec checks final state against independently-computed expectation;
  *  - only buckets with matching rows are rewritten (runtime group
  *    filtering) — untouched buckets carry their file entries VERBATIM;
  *  - a rewritten row whose KEY changed moves to its new hash bucket —
  *    proven by a point-lookup (which trusts bucket placement) finding it;
  *  - a file whose EVERY row matches a DELETE predicate is still
  *    replaced (the static-pushdown trap the row-level scan's
  *    decline-all-filters contract exists to prevent);
  *  - commits race safely: disjoint-bucket concurrent commits rebase,
  *    same-bucket drift surfaces as CommitConflictException. */
class GraftRowLevelSpec extends SparkSpecBase {
  import spark.implicits._

  private val warehouse =
    Files.createTempDirectory("graft-rowlevel-wh").toString
  private val cat = "g18rl"

  spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
  spark.conf.set(s"spark.sql.catalog.$cat.warehouse", warehouse)

  private var tableSeq = 0

  /** Fresh bucketed table registered in the catalog; returns (sql name,
    * fs path). */
  private def mkTable(rows: DataFrame, keys: Seq[String], nBuckets: Int,
      keep: Int = 5): (String, String) = {
    tableSeq += 1
    val name = s"$cat.db.rl$tableSeq"
    val path = Files.createTempDirectory(s"graft-rl$tableSeq").toString + "/t"
    Upsert.mergeIntoManifestBucketedParquet(spark, path, rows, keys,
      nBuckets = nBuckets, keepSnapshots = keep)
    spark.sql(s"CREATE TABLE $name USING graft LOCATION '$path'")
    (name, path)
  }

  private def bucketOfKey(k: Long, nb: Int): Int = spark.range(1)
    .select(pmod(xxhash64(lit(k)), lit(nb)).cast("int")).head.getInt(0)

  private def entriesOf(path: String): Map[Int, Seq[String]] =
    Upsert.parseManifestEntries(Upsert.manifestBody(spark, path, None).get)

  test("MERGE INTO: update+insert+delete clauses match computed expectation; untouched buckets carried verbatim; pre-merge snapshot time-travels") {
    val base = (0L until 200L).map(k => (k, s"v$k", (k % 7).toInt))
    val (t, path) = mkTable(base.toDF("key", "v", "grp"), Seq("key"), 8)
    val before = entriesOf(path)
    val preSnap = Upsert.snapshots(spark, path).last.stripPrefix("snap-").toLong

    Seq((3L, "upd3", 100), (11L, "DELETE_ME", -1), (1000L, "new1000", 100))
      .toDF("key", "v", "grp").createOrReplaceTempView("rl_src")
    spark.sql(
      s"""MERGE INTO $t t USING rl_src s ON t.key = s.key
         |WHEN MATCHED AND s.grp < 0 THEN DELETE
         |WHEN MATCHED THEN UPDATE SET v = s.v, grp = s.grp
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)

    val expect = (base.filterNot(_._1 == 11L).map {
      case (3L, _, _) => (3L, "upd3", 100)
      case r => r
    } :+ ((1000L, "new1000", 100))).sortBy(_._1)
    val got = spark.sql(s"SELECT key, v, grp FROM $t ORDER BY key")
      .as[(Long, String, Int)].collect().toSeq
    assert(got == expect)

    // runtime group filtering held: only the buckets of keys 3/11/1000
    // were rewritten — every other bucket's entry list is VERBATIM
    val after = entriesOf(path)
    val touched = Seq(3L, 11L, 1000L).map(bucketOfKey(_, 8)).toSet
    val untouched = before.keySet -- touched
    assert(untouched.nonEmpty)
    untouched.foreach(b => assert(before(b) == after.getOrElse(b, Nil),
      s"bucket $b was rewritten by a 3-key MERGE"))

    // the pinned pre-merge version still serves (retention keeps it)
    val old = spark.sql(
      s"SELECT key, v FROM $t VERSION AS OF $preSnap WHERE key IN (3, 11)")
      .as[(Long, String)].collect().toSeq.sorted
    assert(old == Seq((3L, "v3"), (11L, "v11")))
    // and the library read face agrees with the SQL face
    assert(Upsert.readTarget(spark, path).count() == expect.size)
  }

  test("UPDATE that rewrites a KEY column moves the row to its new bucket (point lookup finds it)") {
    val (t, _) = mkTable((0L until 100L).map(k => (k, s"v$k"))
      .toDF("key", "v"), Seq("key"), 8)
    spark.sql(s"UPDATE $t SET key = 5000 WHERE key = 7")
    // a key-equality SELECT point-prunes to pmod(xxhash64(5000), 8) —
    // it can only find the row if the writer re-derived placement from
    // the UPDATED key (carrying the old bucket id would lose the row)
    val got = spark.sql(s"SELECT v FROM $t WHERE key = 5000")
      .as[String].collect().toSeq
    assert(got == Seq("v7"))
    assert(spark.sql(s"SELECT * FROM $t WHERE key = 7").isEmpty)
    assert(spark.sql(s"SELECT count(*) FROM $t").head.getLong(0) == 100L)
  }

  test("DELETE whose predicate matches EVERY row of a bucket still replaces that bucket's files (static-pushdown trap)") {
    val nb = 4
    // marker = the row's own bucket id, so `marker = b` matches EXACTLY
    // the full content of bucket b's files — the shape where pushing the
    // remaining-rows filter (`NOT marker = b`) into the file index would
    // prune those files out of the replacement set and resurrect them
    val rows = (0L until 100L).map(k => (k, bucketOfKey(k, nb)))
    val (t, path) = mkTable(rows.toDF("key", "marker"), Seq("key"), nb)
    val target = rows.groupBy(_._2).maxBy(_._2.size)._1
    spark.sql(s"DELETE FROM $t WHERE marker = $target")
    assert(spark.sql(s"SELECT count(*) FROM $t WHERE marker = $target")
      .head.getLong(0) == 0L, "all-matching files escaped the rewrite")
    val expectLeft = rows.count(_._2 != target)
    assert(spark.sql(s"SELECT count(*) FROM $t").head.getLong(0) == expectLeft)
    // the emptied bucket's manifest entry is now an empty list
    assert(entriesOf(path).getOrElse(target, Nil).isEmpty)
  }

  test("DELETE with a tautological predicate truncates; UPDATE/MERGE that match nothing are no-ops that burn no snapshot id") {
    val (t, path) = mkTable((0L until 50L).map(k => (k, s"v$k"))
      .toDF("key", "v"), Seq("key"), 4)
    // no-op UPDATE: runtime-filtered to zero groups → commit skipped
    val snapsBefore = Upsert.snapshots(spark, path)
    spark.sql(s"UPDATE $t SET v = 'x' WHERE key = -1")
    assert(Upsert.snapshots(spark, path) == snapsBefore,
      "a no-match UPDATE must not commit a snapshot")
    // no-op MERGE with a statically-empty source (scan optimized away)
    spark.range(0).selectExpr("id AS key", "'s' AS v")
      .createOrReplaceTempView("rl_empty_src")
    spark.sql(
      s"""MERGE INTO $t t USING rl_empty_src s ON t.key = s.key
         |WHEN MATCHED THEN UPDATE SET v = s.v
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(Upsert.snapshots(spark, path) == snapsBefore,
      "an empty-source MERGE must not commit (and must NOT truncate)")
    assert(spark.sql(s"SELECT count(*) FROM $t").head.getLong(0) == 50L)
    // tautology: the optimizer proves the remaining-rows plan empty and
    // eliminates the scan — for DELETE that is a whole-table truncate
    spark.sql(s"DELETE FROM $t WHERE key >= 0 OR key < 0 OR key IS NULL")
    assert(spark.sql(s"SELECT count(*) FROM $t").head.getLong(0) == 0L)
    assert(entriesOf(path).values.forall(_.isEmpty))
  }

  test("TRUNCATE TABLE is metadata-only; time travel still serves the pre-truncate state") {
    val (t, path) = mkTable((0L until 50L).map(k => (k, s"v$k"))
      .toDF("key", "v"), Seq("key"), 4)
    val preSnap = Upsert.snapshots(spark, path).last.stripPrefix("snap-").toLong
    spark.sql(s"TRUNCATE TABLE $t")
    assert(spark.sql(s"SELECT count(*) FROM $t").head.getLong(0) == 0L)
    assert(entriesOf(path).values.forall(_.isEmpty))
    assert(spark.sql(s"SELECT count(*) FROM $t VERSION AS OF $preSnap")
      .head.getLong(0) == 50L)
  }

  test("DataFrame.mergeInto API drives the same row-level operation") {
    val (t, _) = mkTable((0L until 60L).map(k => (k, s"v$k"))
      .toDF("key", "v"), Seq("key"), 4)
    Seq((3L, "api3"), (700L, "api700")).toDF("key", "v").alias("s")
      .mergeInto(t, col(s"${t.split("\\.").last}.key") === col("s.key"))
      .whenMatched().updateAll()
      .whenNotMatched().insertAll()
      .merge()
    val got = spark.sql(s"SELECT v FROM $t WHERE key IN (3, 700) ORDER BY key")
      .as[String].collect().toSeq
    assert(got == Seq("api3", "api700"), got.toString)
    assert(spark.sql(s"SELECT count(*) FROM $t").head.getLong(0) == 61L)
  }

  test("commitFileReplacement: disjoint-bucket concurrent commit rebases; same-bucket drift conflicts") {
    val nb = 4
    val rows = (0L until 80L).map(k => (k, s"v$k"))
    val path = Files.createTempDirectory("graft-rl-race").toString + "/t"
    Upsert.mergeIntoManifestBucketedParquet(spark, path,
      rows.toDF("key", "v"), Seq("key"), nBuckets = nb, keepSnapshots = 5)
    val (_, pinned) = Upsert.pinLive(spark, path).get
    val entries = Upsert.parseManifestEntries(pinned)
    val targetBucket = entries.keys.min
    val otherBucket = entries.keys.max
    assert(targetBucket != otherBucket)

    // a concurrent library merge lands in OTHER buckets only (keys
    // chosen to hash elsewhere): the replacement rebases over it
    val disjointKey = (200L until 400L)
      .find(k => bucketOfKey(k, nb) != targetBucket).get
    Upsert.mergeIntoManifestBucketedParquet(spark, path,
      Seq((disjointKey, "zz")).toDF("key", "v"), Seq("key"),
      nBuckets = nb, keepSnapshots = 5)

    // replacement: drop one scanned file of targetBucket, add nothing
    val victim = entries(targetBucket).head
    val snap = Upsert.commitFileReplacement(spark, path, pinned,
      scannedRels = Set(victim), newByBucket = Map.empty, keepSnapshots = 5)
    val after = entriesOf(path)
    assert(!after(targetBucket).contains(victim))
    // the concurrent merge's row survived the rebase
    assert(Upsert.readTarget(spark, path)
      .where(col("key") === disjointKey).count() == 1L)

    // now pin, let a concurrent merge REWRITE the target bucket, commit
    // → drift in a touched bucket must conflict, not silently publish
    val (_, pinned2) = Upsert.pinLive(spark, path).get
    val entries2 = Upsert.parseManifestEntries(pinned2)
    val clashKey = (0L until 80L).find(k => bucketOfKey(k, nb) == otherBucket).get
    Upsert.mergeIntoManifestBucketedParquet(spark, path,
      Seq((clashKey, "clash")).toDF("key", "v"), Seq("key"),
      nBuckets = nb, keepSnapshots = 5)
    val stale = entries2(otherBucket).head
    val e = intercept[Upsert.CommitConflictException] {
      Upsert.commitFileReplacement(spark, path, pinned2,
        scannedRels = Set(stale), newByBucket = Map.empty, keepSnapshots = 5)
    }
    assert(e.getMessage.contains("changed concurrently"), e.getMessage)
    assert(snap.startsWith("snap-"))
  }
}
