package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class CountMinSpec extends SparkSpecBase {
  import spark.implicits._

  private def estMap(sketches: org.apache.spark.sql.DataFrame,
      probes: org.apache.spark.sql.DataFrame): Map[(String, String), Long] =
    CountMin.estimates(sketches, probes)
      .select("key", "item", "cm_estimate").as[(String, String, Long)]
      .collect().map { case (k, i, e) => (k, i) -> e }.toMap

  private def probesOf(rows: Seq[(String, String)]) =
    rows.distinct.toDF("key", "item")

  test("estimates never undercount; exact when no buckets collide") {
    val rows = Seq.fill(7)(("a", "x")) ++ Seq.fill(3)(("a", "y")) ++
      Seq(("a", "z")) ++ Seq.fill(5)(("b", "x"))
    val exact = rows.groupBy(identity).map { case (r, g) => r -> g.size.toLong }
    val out = estMap(CountMin.sketch(rows.toDF("key", "item"), "key", "item",
      depth = 4, width = 256), probesOf(rows))
    exact.foreach { case (r, n) =>
      assert(out(r) >= n, s"CM undercounted $r: ${out(r)} < $n")
    }
    // at width 256 with 3 items, the portable buckets are collision-free
    // in at least one row — estimates are exactly the counts (the hash is
    // deterministic, so this is a fixed property of these strings, not a
    // probabilistic hope; it failing would mean the bucket fn changed)
    assert(out == exact, s"expected exact estimates, got $out vs $exact")
  }

  test("forced total collision at width 1: every estimate is the key's row count") {
    val rows = Seq(("k", "x"), ("k", "x"), ("k", "y"), ("k", "z"))
    val out = estMap(CountMin.sketch(rows.toDF("key", "item"), "key", "item",
      depth = 3, width = 1), probesOf(rows))
    assert(out == Map(("k", "x") -> 4L, ("k", "y") -> 4L, ("k", "z") -> 4L))
  }

  test("two-batch union equals the single-pass sketch, blob for blob") {
    val all = (0 until 200).map(i => (s"s${i % 3}", s"tok${i % 9}"))
    val (b1, b2) = all.splitAt(87)
    def blobs(df: org.apache.spark.sql.DataFrame): Map[String, Seq[Byte]] =
      df.select("key", "sketch").as[(String, Array[Byte])]
        .collect().map { case (k, b) => k -> b.toSeq }.toMap
    val single = blobs(CountMin.sketch(all.toDF("key", "item"), "key", "item"))
    val merged = blobs(CountMin.merge(
      CountMin.sketch(b1.toDF("key", "item"), "key", "item")
        .unionByName(CountMin.sketch(b2.toDF("key", "item"), "key", "item"))))
    assert(single == merged, "counter addition is not associative?!")
  }

  test("persisted profile: accumulates; a replayed batch id is a no-op") {
    val root = java.nio.file.Files.createTempDirectory("graft-cm").toString + "/profile"
    val b1 = Seq(("a", "x"), ("a", "x"), ("b", "y")).toDF("key", "item")
    val b2 = Seq(("a", "x"), ("a", "z")).toDF("key", "item")
    CountMin.update(spark, root, b1, "key", "item", batchId = Some(0L))
    CountMin.update(spark, root, b2, "key", "item", batchId = Some(1L))
    // at-least-once delivery replays batch 1: must not double-count
    CountMin.update(spark, root, b2, "key", "item", batchId = Some(1L))
    val out = CountMin.estimatesAt(spark, root,
        probesOf(Seq(("a", "x"), ("a", "z"), ("b", "y"))))
      .select("key", "item", "cm_estimate").as[(String, String, Long)]
      .collect().map { case (k, i, e) => (k, i) -> e }.toMap
    assert(out == Map(("a", "x") -> 3L, ("a", "z") -> 1L, ("b", "y") -> 1L))
    // n_rows excludes the meta row and sums both batches
    val n = IndexStore.read(spark, root)
      .where(!(col("key") <=> lit(CountMin.MetaKey)))
      .agg(sum("n_rows")).as[Long].collect().head
    assert(n == 5L, s"n_rows=$n")
  }

  test("mixed-shape merge is an error, not silent corruption") {
    val a = CountMin.sketch(Seq(("k", "x")).toDF("key", "item"),
      "key", "item", depth = 4, width = 256)
    val b = CountMin.sketch(Seq(("k", "x")).toDF("key", "item"),
      "key", "item", depth = 2, width = 64)
    val e = intercept[Exception] {
      CountMin.merge(a.unionByName(b), depth = 4, width = 256).collect()
    }
    assert(e.getMessage != null)
  }

  test("sketch shape bounds are an analysis-time failure, not an executor crash") {
    val df = Seq(("k", "x")).toDF("key", "item")
    val e = intercept[Exception] {
      df.groupBy("key")
        .agg(graft.functions.F.cmSketchAgg(col("item"), depth = 0, width = 8))
        .collect()
    }
    assert(e.getMessage.toLowerCase.contains("depth"), e.getMessage)
  }
}
