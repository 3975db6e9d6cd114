package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpecBase
import graft.operators.Upsert

/** SQL maintenance procedures (round 18): `CALL cat.system.compact /
  * vacuum / snapshots` routing to the library's maintenance entry
  * points under the optimistic commit protocol. */
class GraftProceduresSpec extends SparkSpecBase {
  import spark.implicits._

  private val warehouse =
    Files.createTempDirectory("graft-proc-wh").toString
  private val cat = "g18p"

  spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
  spark.conf.set(s"spark.sql.catalog.$cat.warehouse", warehouse)

  private var n = 0
  private def mkTable(merges: Int, keep: Int = 10): (String, String) = {
    n += 1
    val name = s"$cat.db.p$n"
    val path = Files.createTempDirectory(s"graft-proc$n").toString + "/t"
    (0 until merges).foreach { m =>
      Upsert.mergeIntoManifestBucketedParquet(spark, path,
        (0L until 50L).map(k => (k + m * 100L, s"v$m-$k"))
          .toDF("key", "v"),
        Seq("key"), nBuckets = 4, keepSnapshots = keep)
    }
    spark.sql(s"CREATE TABLE $name USING graft LOCATION '$path'")
    (name, path)
  }

  test("snapshots: lists retrievable versions oldest-first, flags the current one") {
    val (name, path) = mkTable(merges = 3)
    val rows = spark.sql(s"CALL $cat.system.snapshots(`table` => 'db.p$n')")
      .as[(String, Long, Boolean)].collect().toSeq
    assert(rows.map(_._2) == Seq(0L, 1L, 2L), rows.toString)
    assert(rows.map(_._3) == Seq(false, false, true))
    assert(rows.map(_._1) == Upsert.snapshots(spark, path))
  }

  test("compact: bin-packs small files; data identical; result row reports the shrink") {
    // merges REWRITE touched buckets (file count stays ~1/bucket), so
    // the small-file buildup compaction exists for comes from the
    // insert-only append path: each append lands NEW files per bucket
    n += 1
    val name = s"$cat.db.p$n"
    val path = Files.createTempDirectory(s"graft-procc").toString + "/t"
    (0 until 4).foreach { m =>
      Upsert.appendToManifestBucketedParquet(spark, path,
        (0L until 50L).map(k => (k + m * 100L, s"v$m-$k")).toDF("key", "v"),
        Seq("key"), nBuckets = 4, keepSnapshots = 10)
    }
    spark.sql(s"CREATE TABLE $name USING graft LOCATION '$path'")
    val before = spark.sql(s"SELECT * FROM $name ORDER BY key")
      .as[(Long, String)].collect().toSeq
    val res = spark.sql(
      s"CALL $cat.system.compact(`table` => 'db.p$n', target_file_rows => 1000000)")
      .as[(Long, Long, String)].head()
    assert(res._1 > 4L, s"fixture built no small files: $res")
    assert(res._2 == 4L, s"expected one file per bucket, got $res")
    val after = spark.sql(s"SELECT * FROM $name ORDER BY key")
      .as[(Long, String)].collect().toSeq
    assert(after == before)
  }

  test("compact with zorder clusters on the named columns") {
    n += 1
    val name = s"$cat.db.p$n"
    val path = Files.createTempDirectory(s"graft-procz").toString + "/t"
    Upsert.mergeIntoManifestBucketedParquet(spark, path,
      (0L until 400L).map(k => (k, k % 20, (k / 20) % 20))
        .toDF("key", "x", "y"),
      Seq("key"), nBuckets = 2, keepSnapshots = 5)
    spark.sql(s"CREATE TABLE $name USING graft LOCATION '$path'")
    val before = spark.sql(s"SELECT * FROM $name ORDER BY key")
      .as[(Long, Long, Long)].collect().toSeq
    spark.sql(s"CALL $cat.system.compact(`table` => 'db.p$n', " +
      "target_file_rows => 100, zorder => 'x,y')")
    val after = spark.sql(s"SELECT * FROM $name ORDER BY key")
      .as[(Long, Long, Long)].collect().toSeq
    assert(after == before)
  }

  test("vacuum: shrinks retention to keep_snapshots and reports what is left") {
    val (name, path) = mkTable(merges = 3)
    assert(Upsert.snapshots(spark, path).size == 3)
    val res = spark.sql(
      s"CALL $cat.system.vacuum(`table` => 'db.p$n', keep_snapshots => 1)")
      .as[(Int, String)].head()
    assert(res._1 == 1, res.toString)
    assert(Upsert.snapshots(spark, path).size == 1)
    // the survivor is the live head and still reads fully
    assert(spark.sql(s"SELECT count(*) FROM $name").head.getLong(0) == 150L)
  }

  test("unknown procedure and unknown table fail loud") {
    val (_, _) = mkTable(merges = 1)
    val e1 = intercept[Exception](
      spark.sql(s"CALL $cat.system.frobnicate(`table` => 'db.p$n')"))
    assert(e1.getMessage.contains("frobnicate"), e1.getMessage)
    val e2 = intercept[Exception](
      spark.sql(s"CALL $cat.system.snapshots(`table` => 'db.nope')").collect())
    assert(e2.getMessage.toLowerCase.contains("nope"), e2.getMessage)
  }
}
