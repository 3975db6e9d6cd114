package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.{AnalysisException, DataFrame}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

import graft.SparkSpecBase
import graft.operators.Upsert

/** SQL write path through the catalog (VERDICT r17 #1/#2/#3):
  *
  *  - `DELETE FROM cat.t WHERE key IN (…)` routes to the bucket-pruned
  *    manifest erasure — same snapshot state as the library path,
  *    untouched buckets' files carried verbatim, pre-delete snapshot
  *    still time-travel-readable;
  *  - non-key DELETE shapes execute as the group-filtered row-level
  *    rewrite (refusal was the pre-row-level-ops contract; narrowness
  *    is now enforced by the plan — see GraftRowLevelSpec);
  *  - `INSERT INTO cat.t SELECT …` is append-as-upsert on the recorded
  *    merge keys, matching `Upsert.merge` semantics through a pure-SQL
  *    session; `INSERT OVERWRITE` is refused;
  *  - reported scan statistics make an UNHINTED join of a small graft
  *    dim table plan a BroadcastHashJoin (before r18 the V2 relation
  *    sized at defaultSizeInBytes and always sort-merged). */
class GraftSqlWriteSpec extends SparkSpecBase {
  import spark.implicits._

  private val warehouse =
    Files.createTempDirectory("graft-sqlwrite-wh").toString
  private val cat = "g18w"

  spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
  spark.conf.set(s"spark.sql.catalog.$cat.warehouse", warehouse)

  private def mkTable(tag: String, rows: DataFrame, keys: Seq[String],
      nBuckets: Int, keep: Int = 5): String = {
    val path = Files.createTempDirectory(s"graft-sqlw-$tag").toString + "/table"
    Upsert.mergeIntoManifestBucketedParquet(spark, path, rows, keys,
      nBuckets = nBuckets, keepSnapshots = keep)
    path
  }

  private def collectAll(p: SparkPlan): Seq[SparkPlan] = {
    val self = p match {
      case a: AdaptiveSparkPlanExec => collectAll(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        collectAll(q.plan)
      case other => Seq(other)
    }
    self ++ p.children.flatMap(collectAll)
  }

  test("SQL DELETE by key = bucket-pruned erasure; time travel keeps the pre-delete state") {
    val path = mkTable("del",
      (0L until 200L).map(k => (k, s"v$k")).toDF("key", "v"), Seq("key"), 8)
    spark.sql(s"CREATE TABLE $cat.db.del_t USING graft LOCATION '$path'")
    val beforeManifest = Upsert.manifestBody(spark, path, None).get
    val beforeEntries = Upsert.parseManifestEntries(beforeManifest)

    spark.sql(s"DELETE FROM $cat.db.del_t WHERE key IN (3, 11, 42)")

    // state matches the library-path expectation exactly
    val got = spark.sql(s"SELECT key, v FROM $cat.db.del_t ORDER BY key")
      .as[(Long, String)].collect().toSeq
    val expect = (0L until 200L).filterNot(Set(3L, 11L, 42L))
      .map(k => (k, s"v$k"))
    assert(got == expect)

    // bucket-pruned: buckets no deleted key hashes to carry their file
    // entries VERBATIM into the new manifest (no full-table rewrite)
    val afterEntries =
      Upsert.parseManifestEntries(Upsert.manifestBody(spark, path, None).get)
    val touched = Seq(3L, 11L, 42L).map(k =>
      spark.range(1).select(
        pmod(xxhash64(lit(k)), lit(8)).cast("int")).head.getInt(0)).toSet
    val untouched = beforeEntries.keySet -- touched
    assert(untouched.nonEmpty, "test needs at least one untouched bucket")
    untouched.foreach { b =>
      assert(afterEntries(b) == beforeEntries(b),
        s"untouched bucket $b was rewritten by a key-pruned DELETE")
    }

    // pre-delete snapshot remains readable through SQL time travel
    val old = spark.sql(s"SELECT count(*) FROM $cat.db.del_t VERSION AS OF 0")
      .as[Long].head()
    assert(old == 200L, "pre-delete snapshot must stay time-travel-readable")
    spark.sql(s"DROP TABLE $cat.db.del_t")
  }

  test("SQL DELETE equals the library erasure path, snapshot for snapshot") {
    val rows = (0L until 100L).map(k => (k, k % 7, s"v$k")).toDF("key", "grp", "v")
    val sqlPath = mkTable("delsql", rows, Seq("key"), 4)
    val libPath = mkTable("dellib", rows, Seq("key"), 4)
    spark.sql(s"CREATE TABLE $cat.db.del_eq USING graft LOCATION '$sqlPath'")
    spark.sql(s"DELETE FROM $cat.db.del_eq WHERE key = 17 OR key = 18")

    Upsert.deleteKeysFromManifestBucketedParquet(spark, libPath,
      Seq(17L, 18L).toDF("key"), Seq("key"), nBuckets = 4, keepSnapshots = 2)
    val viaSql = Upsert.readTarget(spark, sqlPath).select("key", "grp", "v")
      .orderBy("key").collect().toSeq
    val viaLib = Upsert.readTarget(spark, libPath).select("key", "grp", "v")
      .orderBy("key").collect().toSeq
    assert(viaSql == viaLib && viaSql.size == 98)
    spark.sql(s"DROP TABLE $cat.db.del_eq")
  }

  test("non-key DELETE executes as an explicit group-filtered rewrite (was refused pre-row-level-ops)") {
    // Before the row-level operations landed (same round, later commit),
    // these shapes were REFUSED because the only executor was the
    // key-tuple metadata delete. Now they run as the group-based
    // copy-on-write rewrite: the runtime group filter narrows the scan
    // to buckets holding matching rows, only those buckets' files are
    // replaced — the "never an implicit FULL-TABLE rewrite" contract is
    // kept by the plan, not by refusal. GraftRowLevelSpec owns the
    // deeper invariants; here we pin that the SQL statement works and
    // stays narrow.
    val path = mkTable("delref",
      (0L until 50L).map(k => (k, s"v$k")).toDF("key", "v"), Seq("key"), 4)
    spark.sql(s"CREATE TABLE $cat.db.del_no USING graft LOCATION '$path'")
    val before =
      Upsert.parseManifestEntries(Upsert.manifestBody(spark, path, None).get)
    // predicate over a NON-key column: one row matches → one bucket
    // rewrites, every other bucket's entries carry verbatim
    spark.sql(s"DELETE FROM $cat.db.del_no WHERE v = 'v3'")
    assert(spark.sql(s"SELECT count(*) FROM $cat.db.del_no").as[Long].head() == 49L)
    assert(spark.sql(s"SELECT * FROM $cat.db.del_no WHERE key = 3").isEmpty)
    val after =
      Upsert.parseManifestEntries(Upsert.manifestBody(spark, path, None).get)
    val rewritten = before.keySet.count(b =>
      before(b) != after.getOrElse(b, Nil))
    assert(rewritten == 1,
      s"a one-row non-key DELETE rewrote $rewritten buckets (want 1)")
    // key-range delete (not a key-tuple shape either) — same machinery
    spark.sql(s"DELETE FROM $cat.db.del_no WHERE key < 10")
    assert(spark.sql(s"SELECT count(*) FROM $cat.db.del_no").as[Long].head() == 40L)
    spark.sql(s"DROP TABLE $cat.db.del_no")
  }

  test("contradictory key conjunction deletes nothing, soundly") {
    val path = mkTable("delcontra",
      (0L until 20L).map(k => (k, s"v$k")).toDF("key", "v"), Seq("key"), 2)
    spark.sql(s"CREATE TABLE $cat.db.del_c USING graft LOCATION '$path'")
    spark.sql(s"DELETE FROM $cat.db.del_c WHERE key = 1 AND key = 2")
    assert(spark.sql(s"SELECT count(*) FROM $cat.db.del_c").as[Long].head() == 20L)
    spark.sql(s"DROP TABLE $cat.db.del_c")
  }

  test("INSERT INTO is append-as-upsert on the recorded merge keys") {
    val target = (0L until 30L).map(k => (k, s"old$k", k * 10L))
      .toDF("key", "v", "w")
    val path = mkTable("ins", target, Seq("key"), 4)
    spark.sql(s"CREATE TABLE $cat.db.ins_t USING graft LOCATION '$path'")
    // 10 updates (keys 20..29) + 10 inserts (keys 30..39), pure SQL
    spark.sql(
      s"""INSERT INTO $cat.db.ins_t
         |SELECT id AS key, concat('new', id) AS v, id * 100 AS w
         |FROM range(20, 40)""".stripMargin)
    val got = spark.sql(s"SELECT key, v, w FROM $cat.db.ins_t ORDER BY key")
      .as[(Long, String, Long)].collect().toSeq
    val expect = (0L until 20L).map(k => (k, s"old$k", k * 10L)) ++
      (20L until 40L).map(k => (k, s"new$k", k * 100L))
    assert(got == expect, s"merge semantics mismatch: ${got.take(5)}…")
    // idempotent re-insert of the same batch changes nothing but the snapshot
    spark.sql(
      s"""INSERT INTO $cat.db.ins_t
         |SELECT id AS key, concat('new', id) AS v, id * 100 AS w
         |FROM range(20, 40)""".stripMargin)
    assert(spark.sql(s"SELECT key, v, w FROM $cat.db.ins_t ORDER BY key")
      .as[(Long, String, Long)].collect().toSeq == expect)
    // INSERT OVERWRITE is refused
    val e = intercept[Exception] {
      spark.sql(s"INSERT OVERWRITE $cat.db.ins_t SELECT id, 'x', id FROM range(5)")
    }
    assert(e.getMessage != null)
    spark.sql(s"DROP TABLE $cat.db.ins_t")
  }

  test("internal __bucket layout column is hidden from the SQL face, served to the library") {
    val path = mkTable("hide",
      (0L until 10L).map(k => (k, s"v$k")).toDF("key", "v"), Seq("key"), 2)
    spark.sql(s"CREATE TABLE $cat.db.hide_t USING graft LOCATION '$path'")
    val sqlCols = spark.sql(s"SELECT * FROM $cat.db.hide_t").columns.toSeq
    assert(sqlCols == Seq("key", "v"), s"SQL face leaked layout columns: $sqlCols")
    assert(Upsert.readTarget(spark, path).columns.contains("__bucket"),
      "library face must keep serving the physical layout")
    spark.sql(s"DROP TABLE $cat.db.hide_t")
  }

  test("UNHINTED join of a small graft dim table broadcasts (reported statistics)") {
    val dim = (0L until 50L).map(k => (k, s"name$k")).toDF("key", "name")
    val fact = (0L until 5000L).map(k => (k % 50L, k, s"p$k"))
      .toDF("key", "fid", "payload")
    val pd = mkTable("statsDim", dim, Seq("key"), 4)
    val pf = mkTable("statsFact", fact, Seq("fid"), 8)
    spark.sql(s"CREATE TABLE $cat.db.st_dim USING graft LOCATION '$pd'")
    spark.sql(s"CREATE TABLE $cat.db.st_fact USING graft LOCATION '$pf'")
    val joined = spark.sql(
      s"""SELECT f.fid, f.payload, d.name
         |FROM $cat.db.st_fact f JOIN $cat.db.st_dim d ON f.key = d.key""".stripMargin)
    assert(joined.count() == 5000L)
    val nodes = collectAll(joined.queryExecution.executedPlan)
    assert(nodes.exists(_.nodeName.contains("BroadcastHashJoin")),
      s"small graft dim side did not broadcast:\n${joined.queryExecution.executedPlan}")
    spark.sql(s"DROP TABLE $cat.db.st_dim")
    spark.sql(s"DROP TABLE $cat.db.st_fact")
  }
}
