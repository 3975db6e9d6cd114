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
