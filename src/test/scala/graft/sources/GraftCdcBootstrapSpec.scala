package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.execution.datasources.FilePartition

import graft.SparkSpecBase
import graft.operators.Upsert

/** The CDC stream's bootstrap contract after ADVICE r17:
  *
  *  - (medium) the bootstrap batch is a PURE FUNCTION of the pinned
  *    `(−1, e]` offset pair — a merge landing between offset pinning and
  *    batch planning (the wide window `Trigger.AvailableNow` opens) must
  *    not leak into the batch, or the next batch's `(e, e']` diff
  *    re-delivers its rows and replays diverge from the offset log;
  *  - (low) the bootstrap serves snapshot `e`'s immutable data files
  *    DIRECTLY — zero-copy, nothing materialized under the checkpoint
  *    (the old path duplicated the whole table into checkpoint storage);
  *  - a vacuumed bootstrap snapshot fails LOUD with the re-bootstrap
  *    instruction, mirroring the diff-side retention contract. */
class GraftCdcBootstrapSpec extends SparkSpecBase {
  import spark.implicits._

  private def mkDirs(tag: String): (String, String) = {
    val base = Files.createTempDirectory(s"graft-cdcboot-$tag").toString
    (s"$base/table", s"$base/ckpt")
  }

  private def mkStream(path: String, ckpt: String): GraftCdcMicroBatchStream =
    new GraftCdcMicroBatchStream(
      GraftCdcStream.cdcSchema(
        Upsert.readTarget(spark, path).schema, Seq("key")),
      path, Seq("key"), ckpt)

  test("bootstrap batch is a pure function of the PINNED end offset, not the live table") {
    val (path, ckpt) = mkDirs("pin")
    Upsert.mergeIntoManifestBucketedParquet(spark, path,
      (0L until 20L).map(k => (k, s"v$k")).toDF("key", "v"),
      Seq("key"), nBuckets = 4, keepSnapshots = 10)
    val snap0Files = Upsert.readTargetAt(spark, path, "snap-000000000")
      .inputFiles.toSet
    val stream = mkStream(path, ckpt)
    stream.prepareForTriggerAvailableNow() // pins e = snap 0
    val end = stream.latestOffset(stream.initialOffset(), null)
    // a merge lands AFTER pinning, BEFORE planning
    Upsert.mergeIntoManifestBucketedParquet(spark, path,
      Seq((7L, "LATE"), (500L, "LATE_NEW")).toDF("key", "v"),
      Seq("key"), nBuckets = 4, keepSnapshots = 10)
    val parts = stream.planInputPartitions(stream.initialOffset(), end)
    assert(parts.nonEmpty && parts.forall(_.isInstanceOf[GraftCdcBootstrapPartition]))
    val planned = parts.collect {
      case GraftCdcBootstrapPartition(inner: FilePartition) =>
        inner.files.map(_.filePath.toString).toSeq
    }.flatten.toSet
    assert(planned == snap0Files,
      s"bootstrap must plan exactly snapshot 0's immutable files:\n" +
        s"planned=${planned.mkString(", ")}\nsnap0=${snap0Files.mkString(", ")}")
    // zero-copy: nothing was materialized under the checkpoint
    val ckptCdc = new java.io.File(s"$ckpt/_graft_cdc")
    assert(!ckptCdc.exists() || ckptCdc.listFiles().isEmpty,
      "bootstrap must not materialize the table under the checkpoint")
  }

  test("bootstrap rows carry change_type='insert' and CDC column order, read from files") {
    val (path, ckpt) = mkDirs("rows")
    Upsert.mergeIntoManifestBucketedParquet(spark, path,
      Seq((1L, "a", 10L), (2L, "b", 20L)).toDF("key", "v", "w"),
      Seq("key"), nBuckets = 2)
    val stream = new GraftCdcMicroBatchStream(
      GraftCdcStream.cdcSchema(
        Upsert.readTarget(spark, path).schema, Seq("key")),
      path, Seq("key"), ckpt)
    stream.prepareForTriggerAvailableNow()
    val end = stream.latestOffset(stream.initialOffset(), null)
    val parts = stream.planInputPartitions(stream.initialOffset(), end)
    val factory = stream.createReaderFactory()
    val schema = GraftCdcStream.cdcSchema(
      Upsert.readTarget(spark, path).schema, Seq("key"))
    assert(schema.fieldNames.toSeq == Seq("change_type", "key", "v", "w"))
    val proj = org.apache.spark.sql.catalyst.expressions.UnsafeProjection
      .create(schema.fields.map(_.dataType))
    val rows = parts.flatMap { p =>
      val r = factory.createReader(p)
      val buf = scala.collection.mutable.ArrayBuffer[(String, Long, String, Long)]()
      while (r.next()) {
        val row = proj(r.get())
        buf += ((row.getUTF8String(0).toString, row.getLong(1),
          row.getUTF8String(2).toString, row.getLong(3)))
      }
      r.close()
      buf
    }.toSet
    assert(rows == Set(("insert", 1L, "a", 10L), ("insert", 2L, "b", 20L)))
  }

  test("vacuumed bootstrap snapshot fails LOUD with the re-bootstrap instruction") {
    val (path, ckpt) = mkDirs("vac")
    Upsert.mergeIntoManifestBucketedParquet(spark, path,
      (0L until 6L).map(k => (k, s"v$k")).toDF("key", "v"),
      Seq("key"), nBuckets = 2, keepSnapshots = 10)
    val stream = mkStream(path, ckpt)
    stream.prepareForTriggerAvailableNow() // pins e = snap 0
    val end = stream.latestOffset(stream.initialOffset(), null)
    // advance past retention: snap 0's manifest is gone
    Upsert.mergeIntoManifestBucketedParquet(spark, path,
      Seq((1L, "u")).toDF("key", "v"), Seq("key"),
      nBuckets = 2, keepSnapshots = 1)
    Upsert.mergeIntoManifestBucketedParquet(spark, path,
      Seq((2L, "u")).toDF("key", "v"), Seq("key"),
      nBuckets = 2, keepSnapshots = 1)
    assert(!Upsert.snapshots(spark, path).contains("snap-000000000"))
    val e = intercept[IllegalStateException] {
      stream.planInputPartitions(stream.initialOffset(), end)
    }
    assert(e.getMessage.contains("re-bootstrap"))
  }
}
