package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** Derived-index snapshot store: the recompute-on-retry contract
  * (ADVICE r8 — a conflicted commit must rebuild its transformation from
  * the winner's snapshot, never replay a plan pinned to stale files). */
class IndexStoreSpec extends SparkSpecBase {
  import spark.implicits._

  private def mkRoot(): String =
    java.nio.file.Files.createTempDirectory("graft-ixstore").toString + "/idx"

  test("conflicted rewrite recomputes from the winner's snapshot — concurrent append not lost") {
    val root = mkRoot()
    IndexStore.rewrite(spark, root, (0L until 10L).toDF("id"))
    // a delete whose first commit attempt races a concurrent append of
    // ids 100..104: the hook fires right before the victim's manifest
    // create and commits the append first, so the victim's create
    // conflicts and its retry must re-read (old ∪ appended) state
    var fired = false
    Upsert.beforeManifestCreateHook = Some { (tp, _) =>
      if (!fired && tp == root) {
        fired = true
        Upsert.beforeManifestCreateHook = None
        IndexStore.append(spark, root, (100L until 105L).toDF("id"))
      }
    }
    try
      IndexStore.rewriteWith(spark, root)(() =>
        (IndexStore.read(spark, root).where(!col("id").isin(3L, 4L)), None))
    finally Upsert.beforeManifestCreateHook = None
    assert(fired, "race hook never fired")
    val out = IndexStore.read(spark, root).select("id").as[Long].collect().toSet
    assert(out == ((0L until 10L).toSet -- Set(3L, 4L)) ++ (100L until 105L).toSet,
      s"retry replayed a stale plan (the winner's append vanished): $out")
  }

  test("append during delete on a PARTITIONED store: retry re-derives touched partitions") {
    val root = mkRoot()
    def rows(ids: Range) = ids.map(i => (i.toLong, (i % 3).toInt)).toDF("id", "part")
    IndexStore.rewrite(spark, root, rows(0 until 12), None, Some("part"))
    var fired = false
    Upsert.beforeManifestCreateHook = Some { (tp, _) =>
      if (!fired && tp == root) {
        fired = true
        Upsert.beforeManifestCreateHook = None
        IndexStore.append(spark, root, rows(100 until 103), Some("part"))
      }
    }
    // delete ids 0 and 1 (parts 0 and 1) with per-attempt recompute of
    // both the remaining rows AND the touched partition list
    try
      IndexStore.rewriteWith(spark, root, Some("part"))(() => {
        val del = Seq(0L, 1L)
        val touched = IndexStore.read(spark, root)
          .where(col("id").isin(del.map(Long.box): _*))
          .select(col("part").cast("int")).distinct()
          .collect().map(_.getInt(0)).sorted.toIndexedSeq
        (IndexStore.read(spark, root, Some("part"), Some(touched))
          .where(!col("id").isin(del.map(Long.box): _*)), Some(touched))
      })
    finally Upsert.beforeManifestCreateHook = None
    assert(fired)
    val out = IndexStore.read(spark, root).select("id").as[Long].collect().toSet
    assert(out == ((2L until 12L).toSet ++ (100L until 103L).toSet), s"got $out")
  }
}
