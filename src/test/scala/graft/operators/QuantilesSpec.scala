package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class QuantilesSpec extends SparkSpecBase {
  import spark.implicits._

  private val Ranks = Seq(0.5, 0.9, 0.99)

  /** The order-statistics rule the oracle mirrors: INCLUSIVE quantile at
    * rank r over n ≤ k retained values = sorted value at 1-based index
    * ⌈r·n⌉ (r = 0 → index 1). */
  private def expected(values: Seq[Double], r: Double): Double = {
    val sorted = values.sorted
    sorted(math.max(1, math.ceil(r * sorted.length).toInt) - 1)
  }

  test("exact regime: sketch quantiles equal order statistics for n <= k") {
    val values = Seq(5.0, 1.0, 9.0, 3.0, 3.0, 7.0, 2.0, 8.0, 4.0, 6.0, 0.0)
    val df = values.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    val out = Quantiles.quantiles(
        Quantiles.sketch(df.withColumn("key", lit("k")), "key", "v"), Ranks)
      .collect().head
    Ranks.zipWithIndex.foreach { case (r, i) =>
      assert(out.getDouble(out.fieldIndex(s"q${math.round(r * 1000)}")) ==
        expected(values, r), s"rank $r")
    }
    assert(out.getLong(out.fieldIndex("n_rows")) == values.length)
  }

  test("property: per-key sketch quantiles equal order statistics on a seeded frame") {
    val rows = (0 until 400).map { i =>
      (s"src${i % 7}", ((i * 2654435761L) % 997).toDouble)
    }
    val df = rows.toDF("key", "v")
    val got = Quantiles.quantiles(Quantiles.sketch(df, "key", "v"), Ranks)
      .collect().map(r => r.getString(0) -> r).toMap
    rows.groupBy(_._1).foreach { case (k, vs) =>
      Ranks.foreach { r =>
        assert(got(k).getDouble(got(k).fieldIndex(s"q${math.round(r * 1000)}")) ==
          expected(vs.map(_._2), r), s"key $k rank $r")
      }
    }
  }

  test("incremental union equals a single-pass sketch in the exact regime") {
    val all = (0 until 120).map(i => (s"s${i % 3}", (i * 37 % 101).toDouble))
    val (b1, b2) = all.splitAt(53)
    val single = Quantiles.quantiles(Quantiles.sketch(all.toDF("key", "v"), "key", "v"), Ranks)
      .collect().map(r => r.getString(0) -> r.toSeq.drop(2)).toMap
    val merged = Quantiles.quantiles(
        Quantiles.sketch(b1.toDF("key", "v"), "key", "v")
          .unionByName(Quantiles.sketch(b2.toDF("key", "v"), "key", "v"))
          .groupBy("key")
          .agg(graft.functions.F.kllUnionAgg(col("sketch")).as("sketch"),
            sum("n_rows").as("n_rows")),
        Ranks)
      .collect().map(r => r.getString(0) -> r.toSeq.drop(2)).toMap
    assert(single == merged)
  }

  test("persisted profile: accumulates across updates; readable after each commit") {
    val root = java.nio.file.Files.createTempDirectory("graft-kll").toString + "/profile"
    Quantiles.update(spark, root, Seq(("a", 1.0), ("a", 9.0)).toDF("key", "v"), "key", "v")
    Quantiles.update(spark, root, Seq(("a", 5.0), ("b", 2.0)).toDF("key", "v"), "key", "v")
    val out = Quantiles.estimates(spark, root, Seq(0.5))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out("a") == ((3L, 5.0)), out.toString) // median of {1, 9, 5}
    assert(out("b") == ((1L, 2.0)))
  }

  test("SQL surface: kll_sketch_agg / kll_quantile registered and usable") {
    graft.functions.F.registerAll(spark)
    Seq((1L, 2.0), (1L, 4.0), (1L, 6.0)).toDF("k", "v").createOrReplaceTempView("kllt")
    val v = spark.sql(
      "SELECT kll_quantile(kll_sketch_agg(v), 0.5) FROM kllt GROUP BY k")
      .collect().head.getDouble(0)
    assert(v == 4.0)
  }
}
