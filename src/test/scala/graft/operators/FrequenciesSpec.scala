package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class FrequenciesSpec extends SparkSpecBase {
  import spark.implicits._

  private def topMap(df: org.apache.spark.sql.DataFrame): Map[(String, String), Long] =
    df.select("key", "item", "estimate").as[(String, String, Long)]
      .collect().map { case (k, i, e) => (k, i) -> e }.toMap

  test("exact regime: estimates are plain counts; threshold = HAVING") {
    val rows = Seq.fill(7)(("a", "x")) ++ Seq.fill(3)(("a", "y")) ++
      Seq(("a", "z")) ++ Seq.fill(5)(("b", "x"))
    val out = topMap(Frequencies.topItems(
      Frequencies.sketch(rows.toDF("key", "item"), "key", "item",
        maxMapSize = 64), minCount = 2))
    assert(out == Map(("a", "x") -> 7L, ("a", "y") -> 3L, ("b", "x") -> 5L))
    // lb == estimate == ub in the exact regime
    val bounds = Frequencies.topItems(
      Frequencies.sketch(rows.toDF("key", "item"), "key", "item", 64), 2)
      .select("estimate", "lb", "ub").as[(Long, Long, Long)].collect()
    assert(bounds.forall { case (e, l, u) => l == e && u == e })
  }

  test("purge regime: a dominant item survives with bounds containing its true count") {
    // 3000 distinct light items blow far past 0.75·64; 'heavy' has 500
    val rows = (0 until 3000).map(i => ("k", s"light-$i")) ++
      Seq.fill(500)(("k", "heavy"))
    val out = Frequencies.topItems(
        Frequencies.sketch(rows.toDF("key", "item"), "key", "item",
          maxMapSize = 64), minCount = 300)
      .select("item", "estimate", "lb", "ub")
      .as[(String, Long, Long, Long)].collect()
    val heavy = out.find(_._1 == "heavy")
    assert(heavy.nonEmpty, s"heavy hitter purged: ${out.toSeq}")
    val (_, est, lb, ub) = heavy.get
    assert(lb <= 500L && 500L <= ub, s"bounds [$lb,$ub] exclude true 500")
    assert(est >= 500L, "Misra-Gries estimates never undercount")
  }

  test("incremental union equals a single-pass sketch in the exact regime") {
    val all = (0 until 200).map(i => (s"s${i % 3}", s"tok${i % 9}"))
    val (b1, b2) = all.splitAt(87)
    val single = topMap(Frequencies.topItems(
      Frequencies.sketch(all.toDF("key", "item"), "key", "item"), 1))
    val merged = topMap(Frequencies.topItems(
      Frequencies.sketch(b1.toDF("key", "item"), "key", "item")
        .unionByName(Frequencies.sketch(b2.toDF("key", "item"), "key", "item"))
        .groupBy("key")
        .agg(graft.functions.F.freqUnionAgg(col("sketch")).as("sketch"),
          sum("n_rows").as("n_rows")), 1))
    assert(single == merged)
  }

  test("persisted profile: accumulates; a replayed batch id is a no-op") {
    val root = java.nio.file.Files.createTempDirectory("graft-freq").toString + "/profile"
    val b1 = Seq(("a", "x"), ("a", "x"), ("b", "y")).toDF("key", "item")
    val b2 = Seq(("a", "x"), ("a", "z")).toDF("key", "item")
    Frequencies.update(spark, root, b1, "key", "item", batchId = Some(0L))
    Frequencies.update(spark, root, b2, "key", "item", batchId = Some(1L))
    // at-least-once delivery replays batch 1: must not double-count
    Frequencies.update(spark, root, b2, "key", "item", batchId = Some(1L))
    val out = Frequencies.estimates(spark, root, minCount = 1)
      .select("key", "item", "estimate").as[(String, String, Long)]
      .collect().map { case (k, i, e) => (k, i) -> e }.toMap
    assert(out == Map(("a", "x") -> 3L, ("a", "z") -> 1L, ("b", "y") -> 1L))
  }

  test("topItems over a raw profile read: the null-sketch meta row decodes to null, no NPE") {
    val root = java.nio.file.Files.createTempDirectory("graft-freq-meta").toString + "/profile"
    Frequencies.update(spark, root,
      Seq(("a", "x")).toDF("key", "item"), "key", "item", batchId = Some(0L))
    // the guarded profile carries a (MetaKey, null-sketch) row; decoding
    // the RAW read (no meta filter) must not call compute(null)
    val out = Frequencies.topItems(IndexStore.read(spark, root), minCount = 1)
      .select("key", "item", "estimate").as[(String, String, Long)]
      .collect().toSet
    assert(out == Set(("a", "x", 1L)))
  }

  test("maxMapSize must be a power of 2 >= 8 — analysis-time failure, not executor crash") {
    val df = Seq(("k", "a")).toDF("g", "item")
    for (bad <- Seq(0, -4, 4, 100)) {
      val e = intercept[org.apache.spark.sql.AnalysisException] {
        df.groupBy("g")
          .agg(graft.functions.F.freqSketchAgg(col("item"), bad))
          .collect()
      }
      assert(e.getMessage.contains("power of 2"), s"maxMapSize=$bad: ${e.getMessage}")
    }
    // the union agg enforces the same bound
    val e2 = intercept[org.apache.spark.sql.AnalysisException] {
      Seq(("k", Array[Byte]())).toDF("g", "sketch").groupBy("g")
        .agg(graft.functions.F.freqUnionAgg(col("sketch"), 12)).collect()
    }
    assert(e2.getMessage.contains("power of 2"))
    // valid sizes still pass analysis
    df.groupBy("g").agg(graft.functions.F.freqSketchAgg(col("item"), 8)).collect()
  }

  test("SQL surface: freq_sketch_agg / freq_top_items registered and usable") {
    graft.functions.F.registerAll(spark)
    Seq(("k", "a"), ("k", "a"), ("k", "b")).toDF("g", "item")
      .createOrReplaceTempView("freqt")
    val rows = spark.sql(
      """SELECT fi.item, fi.estimate
        |FROM (SELECT freq_top_items(freq_sketch_agg(item), 2) AS xs
        |      FROM freqt GROUP BY g)
        |LATERAL VIEW explode(xs) AS fi""".stripMargin)
      .as[(String, Long)].collect().toSeq
    assert(rows == Seq(("a", 2L)))
  }

  test("keySkewCensus: exact counts, floor permille, (count DESC, key ASC) cut") {
    val rows = Seq.fill(5)("hot") ++ Seq.fill(3)("b") ++ Seq.fill(3)("a") ++
      Seq("cold")
    val got = Frequencies.keySkewCensus(rows.toDF("k"), "k", k = 3)
      .as[(String, Long, Long)].collect().toSeq
    // 12 rows total: hot 5/12 → 416‰ (floor), ties a/b at 3 break by key
    assert(got == Seq(("hot", 5L, 416L), ("a", 3L, 250L), ("b", 3L, 250L)))
  }
}
