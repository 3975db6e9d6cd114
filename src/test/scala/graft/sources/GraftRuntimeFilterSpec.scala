package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

import graft.SparkSpecBase
import graft.operators.Upsert

/** Runtime filtering at the DSv2 layer (VERDICT r16 #2): a selective
  * broadcast dim-side predicate prunes the graft fact scan's buckets and
  * files AT EXECUTION TIME — without it, `fact JOIN dim WHERE dim.x=…`
  * through the connector lists every statically-surviving file, which at
  * 100 TB is the whole table. */
class GraftRuntimeFilterSpec extends SparkSpecBase {
  import spark.implicits._

  private def tmp(tag: String): String =
    Files.createTempDirectory(s"graft-rtf-$tag").toString + "/table"

  private def collectAll(p: SparkPlan): Seq[SparkPlan] = {
    val self = p match {
      case a: AdaptiveSparkPlanExec => collectAll(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        collectAll(q.plan) // AQE stages are leaves; descend explicitly
      case other => Seq(other)
    }
    self ++ p.children.flatMap(collectAll)
  }

  private def graftScan(df: DataFrame): GraftBucketedScan =
    collectAll(df.queryExecution.executedPlan).collectFirst {
      case b: BatchScanExec if b.scan.isInstanceOf[GraftBucketedScan] =>
        b.scan.asInstanceOf[GraftBucketedScan]
    }.getOrElse(fail(
      s"no GraftBucketedScan in plan:\n${df.queryExecution.executedPlan}"))

  test("broadcast dim filter prunes fact buckets at runtime; results exact") {
    val path = tmp("dpp")
    Upsert.mergeIntoManifestBucketedParquet(spark, path,
      (0L until 400L).map(k => (k, s"v$k")).toDF("key", "v"),
      Seq("key"), nBuckets = 8)
    // dim must be a REAL source relation (a local Seq constant-folds to
    // a LocalRelation and the pruning rule sees no selective filter)
    val dimPath = Files.createTempDirectory("graft-rtf-dim").toString + "/dim"
    (0L until 400L).map(k => (k, if (k == 5L || k == 7L) "hot" else "cold"))
      .toDF("key", "flag").write.parquet(dimPath)
    val dim = spark.read.parquet(dimPath)
    // fact ⋈ dim with a selective dim predicate; dim is broadcast-sized,
    // so dynamic pruning reuses its broadcast to runtime-filter the scan
    val joined = spark.read.format("graft").load(path).select("key", "v")
      .join(dim.where($"flag" === "hot"), Seq("key"))
    // collect() THIS dataset: the runtime-filtered scan instance lives in
    // its own query execution (a derived .select would plan a fresh one)
    val rows = joined.collect()
      .map(r => (r.getLong(r.fieldIndex("key")), r.getString(r.fieldIndex("v"))))
      .toSet
    assert(rows == Set((5L, "v5"), (7L, "v7")))
    val scan = graftScan(joined)
    // 2 keys → at most 2 buckets' files actually read (8 statically)
    assert(scan.currentFiles.size <= 2,
      s"runtime filtering did not prune: ${scan.currentFiles.size} files read")
  }

  test("runtime filter preserves the reported partitioning: groups survive empty") {
    val path = tmp("groups")
    Upsert.mergeIntoManifestBucketedParquet(spark, path,
      (0L until 200L).map(k => (k, k * 2)).toDF("key", "w"),
      Seq("key"), nBuckets = 4)
    val dimPath = Files.createTempDirectory("graft-rtf-dim2").toString + "/dim"
    Seq((3L, "x"), (999L, "y")).toDF("key", "tag").write.parquet(dimPath)
    val joined = spark.read.format("graft").load(path)
      .join(spark.read.parquet(dimPath).where($"tag" === "x"), Seq("key"))
    assert(joined.collect().map(r => r.getLong(r.fieldIndex("w"))).toSeq == Seq(6L))
    // partitions were planned for every statically non-empty bucket even
    // after pruning (empty splits, not dropped groups)
    val scan = graftScan(joined)
    val parts = scan.planInputPartitions()
    val keys = parts.collect { case p: GraftBucketPartition =>
      p.partitionKey().getInt(0) }.toSet
    assert(keys.size == 4, s"groups dropped under runtime filtering: $keys")
  }
}
