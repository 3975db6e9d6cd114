package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.Row

import graft.SparkSpecBase
import graft.schema.Schemas

/** Three-process concurrent soak: ONE manifest-bucketed target shared by
  * (1) the streaming pipeline (merge + near-dup index + component store,
  * many micro-batches), (2) a batch `RunMaintain table-compact`, and
  * (3) a batch `RunErasure` — all interleaving. Every per-API race is
  * stress-tested elsewhere; this pins the COMPOSED scenario: whatever the
  * interleaving, the final table, near-dup index, and component store
  * are exactly the deterministic expected state.
  *
  * Determinism argument: erased keys appear only in the first source
  * file and never again, so erasure commutes with later merges;
  * compaction is a pure re-placement (CdcSpec pins it produces zero
  * logical changes); the planted near-dup duplicates a NON-erased
  * earlier key, so its drop is interleaving-independent too. */
class ConcurrentSoakSpec extends SparkSpecBase {
  import spark.implicits._

  private def tmp(name: String): String =
    Files.createTempDirectory(name).toString

  private def doc(ts: String, text: String, category: String): Row =
    Row("s1", Timestamp.valueOf(ts), Seq(1f, 2f), text, "", category,
      null, null, null)

  private def writeBatch(dir: String, rows: Seq[Row], part: String): Unit = {
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), Schemas.sourceDoc)
    val staging = tmp(s"stage-$part")
    df.coalesce(1).write.mode("overwrite").parquet(staging)
    val f = new java.io.File(staging).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    Files.copy(f.toPath, java.nio.file.Paths.get(s"$dir/$part.parquet"))
  }

  test("stream merges + table-compact + erasure interleave on one target; final state exact") {
    val src = tmp("soak-src"); val ckpt = tmp("soak-ckpt")
    val base = tmp("soak-target")
    val target = base + "/out"; val idx = base + "/lsh-index"
    val cc = base + "/components"; val ti = base + "/text-index"

    // keys are the texts themselves (empty color -> main_refco = text);
    // all texts word-disjoint except the planted near-dup of e3
    def words(tag: String) = (1 to 5).map(i => s"$tag$i").mkString(" ")
    val (e1, e2, e3, e4) = (words("ea"), words("eb"), words("ec"), words("ed"))
    val ks = (1 to 8).map(i => words(s"k$i"))
    val dup = e3 + " ecextra" // jaccard 5/6 vs e3 > 0.6 threshold

    writeBatch(src, Seq(doc("2024-01-01 10:00:00", e1, "c-e1"),
      doc("2024-01-01 10:01:00", e2, "c-e2"),
      doc("2024-01-01 10:02:00", e3, "c-e3"),
      doc("2024-01-01 10:03:00", e4, "c-e4")), "batch0")
    ks.zipWithIndex.foreach { case (k, i) =>
      val rows = Seq(doc(s"2024-01-02 10:0$i:00", k, s"c-$k")) ++
        (if (i == 4) Seq(doc("2024-01-02 11:00:00", dup, "c-dup")) else Nil)
      writeBatch(src, rows, s"batch${i + 1}")
    }
    val keysPath = base + "/erase-keys"
    Seq(e1, e2).toDF("main_refco").write.parquet(keysPath)

    def startStream() = IncrementalStream.start(spark, src, target, ckpt,
      nearDupTextCol = Some("cleaned_ref"), nearDupThreshold = 0.6,
      nearDupShingle = 1, nearDupIndexPath = Some(idx),
      componentsPath = Some(cc), mergeBuckets = Some(4),
      textIndexPath = Some(ti), textIndexCol = "cleaned_ref",
      textIndexShards = 4,
      keepSnapshots = 4, maxFilesPerTrigger = Some(1))

    def hasKey(k: String): Boolean =
      try graft.operators.Upsert.currentSnapshot(spark, target).isDefined &&
        graft.operators.Upsert.readTarget(spark, target)
          .where(org.apache.spark.sql.functions.col("main_refco") === k)
          .limit(1).count() > 0
      catch { case _: Throwable => false } // transient mid-commit reads

    def compact(): Unit = graft.RunMaintain.run(spark, Array(
      "table-compact", target, "--keys", "main_refco",
      "--keep-snapshots", "4"))
    def erase(): Unit = graft.RunErasure.run(spark, Array(target, keysPath,
      "--key-col", "main_refco", "--merge-buckets", "4",
      "--keep-snapshots", "4", "--neardup-index", idx, "--components", cc,
      "--text-index", ti))

    // launch the stream, then interleave maintenance from this thread
    // while it drains its 9 micro-batches
    @volatile var streamErr: Option[Throwable] = None
    val runner = new Thread(() => {
      var attempts = 0
      var done = false
      while (!done && attempts < 3) { // at-least-once: restart on a lost race
        attempts += 1
        try { startStream().awaitTermination(); done = true }
        catch { case t: Throwable => streamErr = Some(t) }
      }
      if (done) streamErr = None
    })
    runner.start()
    // erasure must observe batch0 merged (its keys never recur, so once
    // erased they stay gone); then keep compacting while the stream runs
    val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
    // wait for the merge AND the batch-0 text-index build (meta commits
    // last) — an erasure racing a not-yet-built index would read a
    // store with no committed snapshot
    def ready = hasKey(e1) &&
      graft.operators.TextIndex.isComplete(spark, ti)
    while (!ready && System.nanoTime() < deadline) Thread.sleep(50)
    assert(ready, "stream never merged+indexed batch0 within the deadline")
    erase()
    var compactions = 0
    while (runner.isAlive && compactions < 3) {
      compact(); compactions += 1; Thread.sleep(100)
    }
    runner.join(180000)
    assert(!runner.isAlive, "stream did not terminate")
    streamErr.foreach(t => fail(s"stream failed after retries: $t"))
    // post-stream: one more erasure (idempotent) + compaction, so the
    // composed scenario always includes both even on a fast stream
    erase(); compact()

    // final TABLE: e1/e2 erased, dup dropped, everything else exact
    val table = graft.operators.Upsert.readTarget(spark, target)
      .select("main_refco", "category").as[(String, String)].collect().toMap
    val expected = (Seq(e3 -> "c-e3", e4 -> "c-e4") ++
      ks.map(k => k -> s"c-$k")).toMap
    assert(table == expected, s"table mismatch: got ${table.keySet}")

    // final near-dup INDEX: exactly the surviving keys (erased scrubbed
    // from sigs AND bands; the dropped dup was never appended)
    for (t <- Seq("sigs", "bands")) {
      val ids = graft.operators.Dedup.readNearDupIndexTable(spark, idx, t)
        .select("id").as[String].collect().toSet
      assert(ids == expected.keySet, s"$t ids mismatch: $ids")
    }

    // final TEXT INDEX: exactly the surviving keys in postings AND
    // doclen (erased scrubbed by --text-index; the dropped dup was
    // curated out before indexing)
    for (t <- Seq("postings", "doclen")) {
      val ids = graft.operators.IndexStore.read(spark, s"$ti/$t")
        .select("doc_id").distinct().as[String].collect().toSet
      assert(ids == expected.keySet, s"text-index $t ids mismatch: $ids")
    }

    // final COMPONENT store: the dup's lineage survives (maps to e3);
    // erased keys are scrubbed
    val comp = graft.operators.Graph.readComponents(spark, cc)
      .as[(String, String)].collect().toMap
    assert(comp(dup) == e3, comp.toString)
    assert(!comp.contains(e1) && !comp.contains(e2), comp.keySet.toString)

    // and the manifest protocol held end to end: current snapshot is
    // readable and equals a fresh full read (no torn files)
    assert(graft.operators.Upsert.readTarget(spark, target).count() ==
      expected.size)
  }
}
