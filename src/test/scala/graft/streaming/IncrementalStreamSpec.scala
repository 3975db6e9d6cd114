package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.sql.types.{ArrayType, FloatType, StructField, StructType}

import graft.SparkSpecBase
import graft.schema.Schemas

/** End-to-end Structured Streaming execution: two AvailableNow passes over
  * a growing source directory, checkpoint-tracked, each micro-batch merged
  * into the parquet target (SURVEY.md §2.9 design 2). */
class IncrementalStreamSpec extends SparkSpecBase {
  import spark.implicits._

  private def tmp(name: String): String =
    Files.createTempDirectory(name).toString

  private def doc(source: String, ts: String, emb: Seq[Float], ref: String,
      color: String, category: String): Row =
    Row(source, Timestamp.valueOf(ts), emb, ref, color, category,
      null, null, null)

  private def writeBatch(dir: String, rows: Seq[Row], part: String): Unit = {
    // the file stream source lists the directory non-recursively — land
    // each batch as a single flat file
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), Schemas.sourceDoc)
    val staging = tmp(s"stage-$part")
    df.coalesce(1).write.mode("overwrite").parquet(staging)
    val f = new java.io.File(staging).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    Files.copy(f.toPath, java.nio.file.Paths.get(s"$dir/$part.parquet"))
  }

  test("streaming upsert: two AvailableNow passes, checkpointed, merged") {
    val src = tmp("stream-src"); val ckpt = tmp("stream-ckpt")
    val target = tmp("stream-target") + "/out"

    writeBatch(src, Seq(
      doc("s1", "2024-01-01 10:00:00", Seq(1f, 2f), "a", "", "c1"),
      doc("s1", "2024-01-02 10:00:00", Seq(3f, 4f), "a", "", "c2"), // newer a
      doc("s2", "2024-01-01 11:00:00", Seq(5f, 6f), "b", "red", "c3")),
      "batch0")

    IncrementalStream.start(spark, src, target, ckpt).awaitTermination()

    val after1 = graft.operators.Upsert.readTarget(spark, target)
      .select("main_refco", "category").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    // keep-latest dedup within the batch: key "a" took the newer category
    assert(after1 == Map("a" -> "c2", "b_red" -> "c3"))

    // second file: an update for key "a" and a brand-new key — the
    // checkpoint must skip batch0 (no duplicate processing) and the merge
    // must update + insert.
    writeBatch(src, Seq(
      doc("s1", "2024-01-03 10:00:00", Seq(7f, 8f), "a", "", "c9"),
      doc("s3", "2024-01-03 12:00:00", Seq(9f, 1f), "c", "", "c4")),
      "batch1")

    IncrementalStream.start(spark, src, target, ckpt).awaitTermination()

    val after2 = graft.operators.Upsert.readTarget(spark, target)
      .select("main_refco", "category", "original_timestamp").collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getString(2))).toMap
    assert(after2.keySet == Set("a", "b_red", "c"))
    assert(after2("a")._1 == "c9") // updated on match
    assert(after2("a")._2 == "2024-01-03T10:00:00")
    assert(after2("b_red")._1 == "c3") // untouched row survives
  }

  test("streaming IVF maintenance: build on first pass, frozen-add on later ones") {
    val src = tmp("ivf-src"); val ckpt = tmp("ivf-ckpt")
    val target = tmp("ivf-target") + "/out"
    val idx = tmp("ivf-idx") + "/index"

    writeBatch(src, Seq(
      doc("s1", "2024-01-01 10:00:00", Seq(1f, 0f), "a", "", "c1"),
      doc("s1", "2024-01-01 11:00:00", Seq(0f, 1f), "b", "", "c2")),
      "batch0")
    IncrementalStream.start(spark, src, target, ckpt,
      ivfIndexPath = Some(idx), ivfNlist = 2).awaitTermination()
    val frozen = graft.operators.Ivf.loadCentroids(spark, idx)
    assert(graft.operators.Ivf.readCells(spark, idx).count() == 2)

    writeBatch(src, Seq(
      doc("s2", "2024-01-02 10:00:00", Seq(1f, 1f), "c", "", "c3")),
      "batch1")
    IncrementalStream.start(spark, src, target, ckpt,
      ivfIndexPath = Some(idx), ivfNlist = 2).awaitTermination()
    // centroids frozen, new vector appended, probes see all keys
    assert(graft.operators.Ivf.loadCentroids(spark, idx) == frozen)
    assert(graft.operators.Ivf.readCells(spark, idx).count() == 3)
    assert(graft.operators.Ivf.readCells(spark, idx).select("main_refco")
      .as[String].collect().toSet == Set("a", "b", "c"))
  }

  test("streaming HNSW maintenance: build on first pass, rebuild-equivalent fold after") {
    val src = tmp("hnsw-src"); val ckpt = tmp("hnsw-ckpt")
    val target = tmp("hnsw-target") + "/out"
    val idx = tmp("hnsw-idx") + "/index"

    writeBatch(src, Seq(
      doc("s1", "2024-01-01 10:00:00", Seq(1f, 0f), "a", "", "c1"),
      doc("s1", "2024-01-01 11:00:00", Seq(0f, 1f), "b", "", "c2")),
      "batch0")
    IncrementalStream.start(spark, src, target, ckpt,
      hnswIndexPath = Some(idx)).awaitTermination()
    assert(graft.operators.IndexStore.read(spark, s"$idx/nodes").count() == 2)

    writeBatch(src, Seq(
      doc("s2", "2024-01-02 10:00:00", Seq(1f, 1f), "c", "", "c3")),
      "batch1")
    IncrementalStream.start(spark, src, target, ckpt,
      hnswIndexPath = Some(idx)).awaitTermination()
    val nodes = graft.operators.IndexStore.read(spark, s"$idx/nodes")
    assert(nodes.select("node_id").as[String].collect().toSet ==
      Set("a", "b", "c"))
    // the stream-folded graph equals a from-scratch build over the same
    // vectors (the addToIndex re-cut theorem, through the stream path)
    val fresh = tmp("hnsw-fresh") + "/index"
    graft.operators.Hnsw.buildIndex(spark, fresh,
      nodes.select(nodes("node_id").as("main_refco"),
        nodes("embedding").as("embedding_vector")),
      idCol = "main_refco", vecCol = "embedding_vector",
      dim = graft.schema.Schemas.EmbeddingDim)
    def edges(r: String) = graft.operators.IndexStore
      .read(spark, s"$r/edges").select("layer", "src", "dst", "cos")
      .collect().map(_.toSeq).toSet
    assert(edges(idx) == edges(fresh))
  }

  test("streaming text-index maintenance: build, update-correct delete-then-add") {
    val src = tmp("ti-src"); val ckpt = tmp("ti-ckpt")
    val target = tmp("ti-target") + "/out"
    val idx = tmp("ti-idx") + "/index"
    def hits(term: String): Set[String] =
      graft.operators.TextIndex.query(spark, idx, Seq(1L -> Seq(term)), k = 10)
        .select("doc_id").as[String].collect().toSet

    writeBatch(src, Seq(
      doc("s1", "2024-01-01 10:00:00", Seq(1f, 0f), "a", "", "red fish"),
      doc("s1", "2024-01-01 11:00:00", Seq(0f, 1f), "b", "", "blue fish")),
      "batch0")
    IncrementalStream.start(spark, src, target, ckpt,
      textIndexPath = Some(idx), textIndexCol = "category",
      textIndexShards = 4).awaitTermination()
    assert(hits("red") == Set("a") && hits("blue") == Set("b"))

    // batch 1 UPDATES key a (red→green) and inserts c (red): the old
    // "red" posting of a must leave, not linger beside the new ones
    writeBatch(src, Seq(
      doc("s1", "2024-01-02 10:00:00", Seq(1f, 1f), "a", "", "green fish"),
      doc("s2", "2024-01-02 11:00:00", Seq(2f, 1f), "c", "", "red crab")),
      "batch1")
    IncrementalStream.start(spark, src, target, ckpt,
      textIndexPath = Some(idx), textIndexCol = "category",
      textIndexShards = 4).awaitTermination()
    assert(hits("red") == Set("c"), "stale posting survived the update")
    assert(hits("green") == Set("a"))
    assert(graft.operators.IndexStore.read(spark, s"$idx/doclen").count() == 3)
  }

  test("streaming cardinality profile: accumulates across runs; replay-safe") {
    val src = tmp("card-src"); val ckpt = tmp("card-ckpt")
    val target = tmp("card-target") + "/out"
    val prof = tmp("card-prof") + "/profile"

    writeBatch(src, Seq(
      doc("s1", "2024-01-01 10:00:00", Seq(1f, 0f), "a", "", "c1"),
      doc("s1", "2024-01-01 11:00:00", Seq(0f, 1f), "b", "", "c2")),
      "batch0")
    IncrementalStream.start(spark, src, target, ckpt,
      cardinalityProfilePath = Some(prof)).awaitTermination()
    val est1 = graft.operators.Cardinality.estimates(spark, prof)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est1.values.sum == 2L, s"first run profiled $est1")

    // second run: one repeated key (an update — no new entity) and one new
    writeBatch(src, Seq(
      doc("s1", "2024-01-02 10:00:00", Seq(2f, 0f), "a", "", "c9"),
      doc("s2", "2024-01-02 11:00:00", Seq(0f, 2f), "c", "", "c3")),
      "batch1")
    // second run through the CLI flag path (RunPipeline --cardinality-profile)
    graft.RunPipeline.startStream(spark, src, target, ckpt,
      Map("--cardinality-profile" -> prof)).awaitTermination()
    val est2 = graft.operators.Cardinality.estimates(spark, prof)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // distinct entities ever merged = {a, b, c}; the replayed "a" adds 0
    assert(est2.values.sum == 3L, s"after run 2 profiled $est2")
  }

  test("streaming quantile profile: accumulates across runs; replayed batch id is a no-op") {
    val src = tmp("kll-src"); val ckpt = tmp("kll-ckpt")
    val target = tmp("kll-target") + "/out"
    val prof = tmp("kll-prof") + "/profile"

    writeBatch(src, Seq(
      doc("s1", "2024-01-01 10:00:00", Seq(1f, 0f), "ab", "", "c1"),
      doc("s1", "2024-01-01 11:00:00", Seq(0f, 1f), "wxyz", "", "c2")),
      "batch0")
    IncrementalStream.start(spark, src, target, ckpt,
      quantileProfilePath = Some(prof)).awaitTermination()
    val est1 = graft.operators.Quantiles.estimates(spark, prof, Seq(0.5))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // cleaned_ref lengths {2, 4} -> n = 2, median (index ceil(0.5*2)=1) = 2
    assert(est1.values.toSeq == Seq((2L, 2.0)), est1.toString)

    // second run via the CLI flag path; new lengths {6}
    writeBatch(src, Seq(
      doc("s2", "2024-01-02 10:00:00", Seq(2f, 0f), "abcdef", "", "c3")),
      "batch1")
    graft.RunPipeline.startStream(spark, src, target, ckpt,
      Map("--quantile-profile" -> prof)).awaitTermination()
    val est2 = graft.operators.Quantiles.estimates(spark, prof, Seq(0.5))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // lengths {2, 4, 6}: n = 3, median 4
    assert(est2.values.toSeq == Seq((3L, 4.0)), est2.toString)

    // a replayed micro-batch id must leave the profile untouched (KLL
    // merge is not idempotent — the guard row is what protects replays)
    graft.operators.Quantiles.update(spark, prof,
      Seq(("t", 999.0)).toDF("k", "v"), "k", "v", batchId = Some(1L))
    val est3 = graft.operators.Quantiles.estimates(spark, prof, Seq(0.5))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(est3 == est2, s"replayed batch mutated the profile: $est3")
  }

  test("ALL maintenance surfaces together: one stream feeds merge + index + profiles + components + scd2") {
    // each flag is exercised alone elsewhere; this pins the composition —
    // every per-batch fold runs off the same micro-batch without
    // interfering (shared session state, commit protocols, replay guards)
    val src = tmp("all-src"); val ckpt = tmp("all-ckpt")
    val target = tmp("all-target") + "/out"
    val base = tmp("all-stores")
    val ndx = s"$base/neardup"; val ivf = s"$base/ivf"
    val card = s"$base/card"; val kll = s"$base/kll"; val freq = s"$base/freq"
    val comp = s"$base/comp"; val dim = s"$base/dim"
    val dc = s"$base/dailycounts"

    // multi-word refs: the near-dup filter shingles on 3-word windows,
    // so degenerate one-word texts would never index
    val refA = "the quick brown fox jumps high"
    val refB = "pack my box with five dozen jugs"
    val refC = "sphinx of black quartz judge my vow"
    writeBatch(src, Seq(
      doc("s1", "2024-01-01 10:00:00", Seq(1f, 0f), refA, "", "c1"),
      doc("s1", "2024-01-01 11:00:00", Seq(0f, 1f), refB, "", "c2")),
      "batch0")
    def run(): Unit = IncrementalStream.start(spark, src, target, ckpt,
      nearDupTextCol = Some("cleaned_ref"), nearDupIndexPath = Some(ndx),
      ivfIndexPath = Some(ivf), ivfNlist = 2,
      cardinalityProfilePath = Some(card), quantileProfilePath = Some(kll),
      freqProfilePath = Some(freq), componentsPath = Some(comp),
      scd2Path = Some(dim), dailyCountsPath = Some(dc)).awaitTermination()
    run()

    writeBatch(src, Seq(
      doc("s2", "2024-01-02 10:00:00", Seq(2f, 0f), refA, "", "c9"), // same-key update
      doc("s2", "2024-01-02 11:00:00", Seq(0f, 2f), refC, "", "c3")),
      "batch1")
    run()

    // merge target: 3 live keys, refA's row refreshed by the newer batch
    val tgt = graft.operators.Upsert.readTarget(spark, target)
      .select("cleaned_ref", "category", "main_refco").collect()
      .map(r => r.getString(0) -> ((r.getString(1), r.getString(2)))).toMap
    assert(tgt.keySet == Set(refA, refB, refC), tgt.keySet.toString)
    assert(tgt(refA)._1 == "c9" && tgt(refB)._1 == "c2" && tgt(refC)._1 == "c3")
    // every persisted store committed and is readable
    assert(graft.operators.Cardinality.estimates(spark, card).count() > 0)
    assert(graft.operators.Quantiles.estimates(spark, kll, Seq(0.5)).count() > 0)
    assert(graft.operators.Frequencies.estimates(spark, freq, 1L).count() > 0)
    assert(graft.operators.IndexStore.exists(spark, s"$ivf/centroids"))
    assert(graft.operators.IndexStore.exists(spark, comp))
    // daily-count profile: 2 arrivals on Jan 1 + 2 on Jan 2 (raw batches)
    assert(graft.operators.DailyCounts.read(spark, dc)
      .as[(String, Long, Long)].collect().map(_._3).sum == 4L)
    // scd2 dimension: refA's key renamed "s1 (None)" -> "s2 (None)", so
    // it carries a closed v1 and an open v2
    val keyA = tgt(refA)._2
    val dimRows = graft.operators.IndexStore.read(spark, dim)
      .where(org.apache.spark.sql.functions.col("main_refco") === keyA)
      .collect().map(r => (r.getString(1), r.getBoolean(4), r.getLong(5))).toSet
    assert(dimRows == Set(("s1 (None)", false, 1L), ("s2 (None)", true, 2L)),
      dimRows.toString)
  }

  test("streaming SCD2 dimension: versions accumulate across runs; replay-guarded") {
    val src = tmp("scd2-src"); val ckpt = tmp("scd2-ckpt")
    val target = tmp("scd2-target") + "/out"
    val dim = tmp("scd2-dim") + "/dim"

    // run 1: one key, display_name "s1 (None)"
    writeBatch(src, Seq(
      doc("s1", "2024-01-01 10:00:00", Seq(1f, 0f), "a", "", "c1")), "batch0")
    IncrementalStream.start(spark, src, target, ckpt,
      scd2Path = Some(dim)).awaitTermination()
    def rows() = graft.operators.IndexStore.read(spark, dim)
      .where(org.apache.spark.sql.functions.col("main_refco") =!=
        graft.operators.Scd2.MetaKey)
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getBoolean(4), r.getLong(5))).toSet
    val r1 = rows()
    assert(r1.size == 1 && r1.head._2 == "s1 (None)" && r1.head._3, r1.toString)

    // run 2 via the CLI flag path: same key arrives from a new source →
    // display_name changes → the open row closes, version 2 opens; a
    // second, unchanged key event for the new name collapses (no v3)
    writeBatch(src, Seq(
      doc("s2", "2024-01-02 10:00:00", Seq(2f, 0f), "a", "", "c1"),
      doc("s2", "2024-01-02 11:00:00", Seq(3f, 0f), "a", "", "c1")), "batch1")
    graft.RunPipeline.startStream(spark, src, target, ckpt,
      Map("--scd2" -> dim)).awaitTermination()
    val r2 = rows()
    assert(r2.map(t => (t._2, t._3, t._4)) == Set(
      ("s1 (None)", false, 1L), ("s2 (None)", true, 2L)), r2.toString)

    // a replayed micro-batch id must leave the dimension untouched
    // (applyBatch is not replay-idempotent — the guard row protects it)
    graft.operators.Scd2.update(spark, dim,
      Seq(("zzz", "ghost", "2024-01-03T00:00:00"))
        .toDF("main_refco", "display_name", "original_timestamp"),
      keyCol = "main_refco", attrCol = "display_name",
      tsCol = "original_timestamp", batchId = Some(0L))
    assert(rows() == r2, "replayed batch mutated the dimension")
  }

  test("streaming frequent-items profile: accumulates across runs; replay-guarded") {
    val src = tmp("freq-src"); val ckpt = tmp("freq-ckpt")
    val target = tmp("freq-target") + "/out"
    val prof = tmp("freq-prof") + "/profile"
    def typedDoc(source: String, ts: String, ref: String, etype: String): Row =
      Row(source, Timestamp.valueOf(ts), Seq(1f, 0f), ref, "", "c1",
        null, etype, null)

    writeBatch(src, Seq(
      typedDoc("s1", "2024-01-01 10:00:00", "a", "t1"),
      typedDoc("s1", "2024-01-01 11:00:00", "b", "t1"),
      typedDoc("s2", "2024-01-01 12:00:00", "c", "t2")),
      "batch0")
    IncrementalStream.start(spark, src, target, ckpt,
      freqProfilePath = Some(prof)).awaitTermination()
    val est1 = graft.operators.Frequencies.estimates(spark, prof, minCount = 1)
      .select("key", "item", "estimate").as[(String, String, Long)]
      .collect().map { case (k, i, e) => (k, i) -> e }.toMap
    // display_name derives as "<source> ((None))"-style from null country;
    // only the per-type multiset shape matters here
    assert(est1.keys.map(_._1).toSet == Set("t1", "t2"), est1.toString)
    assert(est1.collect { case ((k, _), e) if k == "t1" => e }.sum == 2L)

    // second run via the CLI flag path: two more t1 rows from s1
    writeBatch(src, Seq(
      typedDoc("s1", "2024-01-02 10:00:00", "d", "t1"),
      typedDoc("s1", "2024-01-02 11:00:00", "e", "t1")),
      "batch1")
    graft.RunPipeline.startStream(spark, src, target, ckpt,
      Map("--freq-profile" -> prof)).awaitTermination()
    val est2 = graft.operators.Frequencies.estimates(spark, prof, minCount = 1)
      .select("key", "item", "estimate").as[(String, String, Long)]
      .collect().map { case (k, i, e) => (k, i) -> e }.toMap
    assert(est2.collect { case ((k, _), e) if k == "t1" => e }.sum == 4L,
      est2.toString)

    // a replayed micro-batch id leaves the profile untouched
    graft.operators.Frequencies.update(spark, prof,
      Seq(("t9", "ghost")).toDF("k", "i"), "k", "i", batchId = Some(1L))
    val est3 = graft.operators.Frequencies.estimates(spark, prof, minCount = 1)
      .select("key", "item", "estimate").as[(String, String, Long)]
      .collect().map { case (k, i, e) => (k, i) -> e }.toMap
    assert(est3 == est2, s"replayed batch mutated the profile: $est3")
  }

  test("streaming Count-Min profile: accumulates across runs; replay-guarded") {
    val src = tmp("cm-src"); val ckpt = tmp("cm-ckpt")
    val target = tmp("cm-target") + "/out"
    val prof = tmp("cm-prof") + "/profile"
    def typedDoc(source: String, ts: String, ref: String, etype: String): Row =
      Row(source, Timestamp.valueOf(ts), Seq(1f, 0f), ref, "", "c1",
        null, etype, null)

    writeBatch(src, Seq(
      typedDoc("s1", "2024-01-01 10:00:00", "a", "t1"),
      typedDoc("s1", "2024-01-01 11:00:00", "b", "t1"),
      typedDoc("s2", "2024-01-01 12:00:00", "c", "t2")),
      "batch0")
    IncrementalStream.start(spark, src, target, ckpt,
      cmProfilePath = Some(prof)).awaitTermination()
    // the maintained profile must answer point probes exactly like a
    // GROUP BY over the merged target (exact regime at this width)
    def exactVsProbe(): (Map[(String, String), Long], Map[(String, String), Long]) = {
      val tgt = graft.operators.Upsert.readTarget(spark, target)
        .selectExpr("embeddings_type AS key", "display_name AS item")
      val exact = tgt.groupBy("key", "item").count()
        .as[(String, String, Long)].collect()
        .map { case (k, i, n) => (k, i) -> n }.toMap
      val probes = tgt.distinct()
      val est = graft.operators.CountMin.estimatesAt(spark, prof, probes)
        .select("key", "item", "cm_estimate").as[(String, String, Long)]
        .collect().map { case (k, i, e) => (k, i) -> e }.toMap
      (exact, est)
    }
    val (ex1, est1) = exactVsProbe()
    assert(est1 == ex1, s"profile probes diverged from target counts: $est1 vs $ex1")

    // second run folds two more t1 rows into the SAME profile
    writeBatch(src, Seq(
      typedDoc("s1", "2024-01-02 10:00:00", "d", "t1"),
      typedDoc("s1", "2024-01-02 11:00:00", "e", "t1")),
      "batch1")
    IncrementalStream.start(spark, src, target, ckpt,
      cmProfilePath = Some(prof)).awaitTermination()
    val (ex2, est2) = exactVsProbe()
    assert(est2 == ex2, s"post-run-2 probes diverged: $est2 vs $ex2")
    assert(ex2.values.sum == ex1.values.sum + 2,
      "second run did not add two rows")

    // a replayed micro-batch id leaves the profile untouched
    graft.operators.CountMin.update(spark, prof,
      Seq(("t9", "ghost")).toDF("k", "i"), "k", "i", batchId = Some(1L))
    val (_, est3) = exactVsProbe()
    assert(est3 == est2, s"replayed batch mutated the profile: $est3")
  }

  test("streaming daily-counts profile: folds arrivals across runs; replay-guarded") {
    val src = tmp("dc-src"); val ckpt = tmp("dc-ckpt")
    val target = tmp("dc-target") + "/out"
    val prof = tmp("dc-prof") + "/profile"
    def typedDoc(source: String, ts: String, ref: String, etype: String): Row =
      Row(source, Timestamp.valueOf(ts), Seq(1f, 0f), ref, "", "c1",
        null, etype, null)

    writeBatch(src, Seq(
      typedDoc("s1", "2024-01-01 10:00:00", "a", "t1"),
      typedDoc("s1", "2024-01-01 11:00:00", "b", "t1"),
      typedDoc("s2", "2024-01-01 12:00:00", "c", "t2")),
      "batch0")
    IncrementalStream.start(spark, src, target, ckpt,
      dailyCountsPath = Some(prof)).awaitTermination()
    def census() = graft.operators.DailyCounts.read(spark, prof)
      .as[(String, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(rs =>
        (rs.map(_._2).distinct.length, rs.map(_._3).sum)).toMap
    // per type: (distinct days, total arrivals)
    assert(census() == Map("t1" -> ((1, 2L)), "t2" -> ((1, 1L))))

    // second run via the CLI flag path: a later day for t1
    writeBatch(src, Seq(
      typedDoc("s1", "2024-01-02 10:00:00", "d", "t1"),
      typedDoc("s1", "2024-01-02 11:00:00", "e", "t1")),
      "batch1")
    graft.RunPipeline.startStream(spark, src, target, ckpt,
      Map("--daily-counts" -> prof)).awaitTermination()
    assert(census() == Map("t1" -> ((2, 4L)), "t2" -> ((1, 1L))))

    // the folded profile feeds the monitors directly
    val fano = graft.operators.TimeSeries.fanoFactorFromDaily(
        graft.operators.DailyCounts.read(spark, prof))
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r._3).toMap
    assert(fano == Map("t1" -> 4L, "t2" -> 1L))

    // a replayed micro-batch id leaves the profile untouched
    graft.operators.DailyCounts.update(spark, prof,
      Seq(("2024-01-09T00:00:00", "t9")).toDF("original_timestamp", "k"),
      keyCol = "k", tsCol = "original_timestamp", batchId = Some(1L))
    assert(census() == Map("t1" -> ((2, 4L)), "t2" -> ((1, 1L))))
  }

  test("streaming curate hook gates each micro-batch before merge") {
    val src = tmp("cur-src"); val ckpt = tmp("cur-ckpt")
    val target = tmp("cur-target") + "/out"
    // curation: per-batch quality gate from the library — drop category c0
    val gate: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame =
      df => df.where(org.apache.spark.sql.functions.col("category") =!= "c0")

    writeBatch(src, Seq(
      doc("s1", "2024-01-01 10:00:00", Seq(1f, 2f), "a", "", "c0"), // gated
      doc("s1", "2024-01-01 11:00:00", Seq(3f, 4f), "b", "", "c1")),
      "batch0")
    IncrementalStream.start(spark, src, target, ckpt, curate = Some(gate))
      .awaitTermination()
    writeBatch(src, Seq(
      doc("s1", "2024-01-02 10:00:00", Seq(5f, 6f), "c", "", "c0"), // gated
      doc("s1", "2024-01-02 11:00:00", Seq(7f, 8f), "d", "", "c2")),
      "batch1")
    IncrementalStream.start(spark, src, target, ckpt, curate = Some(gate))
      .awaitTermination()

    val keys = graft.operators.Upsert.readTarget(spark, target)
      .select("main_refco").as[String].collect().toSet
    assert(keys == Set("b", "d"), s"curation leaked: $keys")
  }

  test("near-dup in batch 2 of a restarted stream is dropped vs the target") {
    val src = tmp("neardup-src"); val ckpt = tmp("neardup-ckpt")
    val target = tmp("neardup-target") + "/out"
    val run = () => IncrementalStream.start(spark, src, target, ckpt,
      nearDupTextCol = Some("cleaned_ref"), nearDupShingle = 1)
      .awaitTermination()

    writeBatch(src, Seq(
      doc("s1", "2024-01-01 10:00:00", Seq(1f, 2f),
        "alpha beta gamma delta epsilon", "", "c1")), "batch0")
    run()

    // Restarted stream, new batch: one near-duplicate of the ALREADY-MERGED
    // row under a different key (unigram Jaccard 5/6 >= 0.8), one novel row.
    writeBatch(src, Seq(
      doc("s1", "2024-01-02 10:00:00", Seq(3f, 4f),
        "alpha beta gamma delta epsilon zeta", "", "c2"),
      doc("s1", "2024-01-02 11:00:00", Seq(5f, 6f),
        "totally different thing", "", "c3")), "batch1")
    run()

    val keys = graft.operators.Upsert.readTarget(spark, target)
      .select("main_refco", "category").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(keys == Map(
      "alpha beta gamma delta epsilon" -> "c1",
      "totally different thing" -> "c3"), keys.toString)
  }

  test("indexed near-dup filter: no target text rescan, survives restarts") {
    val src = tmp("idx-neardup-src"); val ckpt = tmp("idx-neardup-ckpt")
    val base = tmp("idx-neardup-target")
    val target = base + "/out"; val idx = base + "/lsh-index"
    val run = () => IncrementalStream.start(spark, src, target, ckpt,
      nearDupTextCol = Some("cleaned_ref"), nearDupShingle = 1,
      nearDupThreshold = 0.6, nearDupIndexPath = Some(idx))
      .awaitTermination()

    writeBatch(src, Seq(
      doc("s1", "2024-01-01 10:00:00", Seq(1f, 2f),
        "alpha beta gamma delta epsilon", "", "c1")), "batch0")
    run()
    assert(graft.operators.Dedup.readNearDupIndexTable(spark, idx, "sigs").count() == 1)

    // restart: a near-dup of the INDEXED row (est Jaccard ~0.83 >= 0.6)
    // under a new key, and a novel row — only the novel row merges and
    // only it is appended to the index.
    writeBatch(src, Seq(
      doc("s1", "2024-01-02 10:00:00", Seq(3f, 4f),
        "alpha beta gamma delta epsilon zeta", "", "c2"),
      doc("s1", "2024-01-02 11:00:00", Seq(5f, 6f),
        "totally different thing", "", "c3")), "batch1")
    run()

    val keys = graft.operators.Upsert.readTarget(spark, target)
      .select("main_refco", "category").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(keys == Map(
      "alpha beta gamma delta epsilon" -> "c1",
      "totally different thing" -> "c3"), keys.toString)
    assert(graft.operators.Dedup.readNearDupIndexTable(spark, idx, "sigs").count() == 2)

    // same-key update still passes (exempt in the candidate join)
    writeBatch(src, Seq(
      doc("s1", "2024-01-03 10:00:00", Seq(7f, 8f),
        "alpha beta gamma delta epsilon", "", "c9")), "batch2")
    run()
    val cat = graft.operators.Upsert.readTarget(spark, target)
      .where("main_refco = 'alpha beta gamma delta epsilon'")
      .select("category").collect().head.getString(0)
    assert(cat == "c9")
  }

  test("streaming duplicate lineage: dropped rows stay answerable via the component store") {
    val src = tmp("cc-lineage-src"); val ckpt = tmp("cc-lineage-ckpt")
    val base = tmp("cc-lineage-target")
    val target = base + "/out"; val idx = base + "/lsh-index"
    val cc = base + "/components"
    val run = () => graft.RunPipeline.startStream(spark, src, target, ckpt,
      Map("--neardup-text" -> "cleaned_ref", "--neardup-shingle" -> "1",
        "--neardup-threshold" -> "0.6", "--neardup-index" -> idx,
        "--components" -> cc)).awaitTermination()

    writeBatch(src, Seq(
      doc("s1", "2024-01-01 10:00:00", Seq(1f, 2f),
        "alpha beta gamma delta epsilon", "", "c1")), "batch0")
    run()
    // a later near-dup under a NEW key is dropped from the merge — but
    // the component store records which earlier key it duplicated
    writeBatch(src, Seq(
      doc("s1", "2024-01-02 10:00:00", Seq(3f, 4f),
        "alpha beta gamma delta epsilon zeta", "", "c2"),
      doc("s1", "2024-01-02 11:00:00", Seq(5f, 6f),
        "totally different thing", "", "c3")), "batch1")
    run()

    val merged = graft.operators.Upsert.readTarget(spark, target)
      .select("main_refco").as[String].collect().toSet
    assert(!merged.contains("alpha beta gamma delta epsilon zeta"))
    val m = graft.operators.Graph.readComponents(spark, cc)
      .as[(String, String)].collect().toMap
    assert(m("alpha beta gamma delta epsilon zeta") ==
      "alpha beta gamma delta epsilon", m.toString)
    assert(m("totally different thing") == "totally different thing")
    assert(m("alpha beta gamma delta epsilon") ==
      "alpha beta gamma delta epsilon")
  }

  test("near-dup filter exempts same-key updates") {
    val src = tmp("samekey-src"); val ckpt = tmp("samekey-ckpt")
    val target = tmp("samekey-target") + "/out"
    val run = () => IncrementalStream.start(spark, src, target, ckpt,
      nearDupTextCol = Some("cleaned_ref"), nearDupShingle = 1)
      .awaitTermination()

    writeBatch(src, Seq(
      doc("s1", "2024-01-01 10:00:00", Seq(1f, 2f),
        "alpha beta gamma delta epsilon", "", "c1")), "batch0")
    run()
    // identical text = identical key: that is an UPDATE, not a duplicate
    writeBatch(src, Seq(
      doc("s1", "2024-01-02 10:00:00", Seq(3f, 4f),
        "alpha beta gamma delta epsilon", "", "c9")), "batch1")
    run()

    val keys = graft.operators.Upsert.readTarget(spark, target)
      .select("main_refco", "category").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(keys == Map("alpha beta gamma delta epsilon" -> "c9"), keys.toString)
  }

  test("stream-stream join within time bound; buffered state joins across runs") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val lSrc = tmp("ssj-l"); val rSrc = tmp("ssj-r")
    val ckpt = tmp("ssj-ckpt"); val outDir = tmp("ssj-out") + "/out"
    val lSchema = StructType(Seq(StructField("k", LongType),
      StructField("l_id", StringType), StructField("lts", TimestampType)))
    val rSchema = StructType(Seq(StructField("k", LongType),
      StructField("r_id", StringType), StructField("rts", TimestampType)))

    def write(src: String, schema: StructType, part: String, rows: Seq[Row]): Unit = {
      val staging = tmp(s"ssj-stage-$part")
      spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
        .coalesce(1).write.mode("overwrite").parquet(staging)
      val f = new java.io.File(staging).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.copy(f.toPath, java.nio.file.Paths.get(s"$src/$part.parquet"))
    }

    def runPass(): Unit = {
      val l = spark.readStream.schema(lSchema).parquet(lSrc)
      val r = spark.readStream.schema(rSchema).parquet(rSrc)
      IncrementalStream.joinWithinWatermark(l, r, Seq("k"), "lts", "rts",
          lateness = "1 hour", within = "10 minutes")
        .select(org.apache.spark.sql.functions.col("l_id"),
          org.apache.spark.sql.functions.col("r_id"))
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.write.mode("append").parquet(outDir)
        }.start().awaitTermination()
    }

    write(lSrc, lSchema, "b0", Seq(
      Row(1L, "L1", Timestamp.valueOf("2024-01-01 10:00:00")),
      Row(2L, "L2", Timestamp.valueOf("2024-01-01 10:00:00"))))
    write(rSrc, rSchema, "b0", Seq(
      Row(1L, "R1", Timestamp.valueOf("2024-01-01 10:05:00")), // in window
      Row(2L, "R2", Timestamp.valueOf("2024-01-01 10:30:00")), // out of window
      Row(3L, "R3", Timestamp.valueOf("2024-01-01 10:06:00")))) // no left
    runPass()
    // second run: a late right row for k=1 still joins the buffered left
    write(rSrc, rSchema, "b1", Seq(
      Row(1L, "R4", Timestamp.valueOf("2024-01-01 10:08:00"))))
    runPass()

    val got = spark.read.parquet(outDir)
      .as[(String, String)].collect().toSet
    assert(got == Set(("L1", "R1"), ("L1", "R4")), got.mkString(","))
  }

  test("left-outer stream-stream join emits unmatched lefts after watermark proof") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val lSrc = tmp("ssjo-l"); val rSrc = tmp("ssjo-r")
    val ckpt = tmp("ssjo-ckpt"); val outDir = tmp("ssjo-out") + "/out"
    val lSchema = StructType(Seq(StructField("k", LongType),
      StructField("l_id", StringType), StructField("lts", TimestampType)))
    val rSchema = StructType(Seq(StructField("k", LongType),
      StructField("r_id", StringType), StructField("rts", TimestampType)))

    def write(src: String, schema: StructType, part: String, rows: Seq[Row]): Unit = {
      val staging = tmp(s"ssjo-stage-$part")
      spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
        .coalesce(1).write.mode("overwrite").parquet(staging)
      val f = new java.io.File(staging).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.copy(f.toPath, java.nio.file.Paths.get(s"$src/$part.parquet"))
    }

    def runPass(): Unit = {
      val l = spark.readStream.schema(lSchema).parquet(lSrc)
      val r = spark.readStream.schema(rSchema).parquet(rSrc)
      IncrementalStream.joinWithinWatermark(l, r, Seq("k"), "lts", "rts",
          lateness = "10 minutes", within = "10 minutes",
          joinType = "left_outer")
        .select(org.apache.spark.sql.functions.col("l_id"),
          org.apache.spark.sql.functions.col("r_id"))
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.write.mode("append").parquet(outDir)
        }.start().awaitTermination()
    }

    write(lSrc, lSchema, "b0", Seq(
      Row(1L, "L1", Timestamp.valueOf("2024-01-01 10:00:00")), // will match
      Row(2L, "L2", Timestamp.valueOf("2024-01-01 10:00:00")))) // never matches
    write(rSrc, rSchema, "b0", Seq(
      Row(1L, "R1", Timestamp.valueOf("2024-01-01 10:05:00"))))
    runPass()
    // advance the watermark far past L2's match window on BOTH sides,
    // proving no R row for k=2 can still arrive
    write(lSrc, lSchema, "b1", Seq(
      Row(9L, "L9", Timestamp.valueOf("2024-01-01 12:00:00"))))
    write(rSrc, rSchema, "b1", Seq(
      Row(8L, "R8", Timestamp.valueOf("2024-01-01 12:00:00"))))
    runPass()
    runPass() // outer emission lands once the restored watermark is applied

    val got = spark.read.parquet(outDir)
      .as[(String, Option[String])].collect().toSet
    assert(got.contains(("L1", Some("R1"))), s"matched pair missing: $got")
    assert(got.contains(("L2", None)), s"unmatched left not emitted: $got")
  }

  test("enrich stage through start: left-outer join lands enrichment in the target") {
    import org.apache.spark.sql.types._
    val src = tmp("enrich-src"); val eSrc = tmp("enrich-es")
    val ckpt = tmp("enrich-ckpt"); val target = tmp("enrich-target") + "/out"
    val eSchema = StructType(Seq(
      StructField("main_refco", StringType),
      StructField("ets", TimestampType),
      StructField("score", DoubleType)))

    def writeEnrich(part: String, rows: Seq[Row]): Unit = {
      val staging = tmp(s"enrich-stage-$part")
      spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), eSchema)
        .coalesce(1).write.mode("overwrite").parquet(staging)
      val f = new java.io.File(staging).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.copy(f.toPath, java.nio.file.Paths.get(s"$eSrc/$part.parquet"))
    }
    val spec = IncrementalStream.EnrichSpec(eSrc, eSchema,
      keyCols = Seq("main_refco"), rightTs = "ets",
      lateness = "10 minutes", within = "10 minutes")
    def runPass(): Unit =
      IncrementalStream.start(spark, src, target, ckpt, enrich = Some(spec))
        .awaitTermination()

    // record "a" has a within-window enrichment row; record "b" has none
    writeBatch(src, Seq(
      doc("s1", "2024-01-01 10:00:00", Seq(1f, 2f), "a", "", "c1"),
      doc("s1", "2024-01-01 10:00:00", Seq(3f, 4f), "b", "", "c2")), "batch0")
    writeEnrich("batch0", Seq(
      Row("a", Timestamp.valueOf("2024-01-01 10:05:00"), 0.9)))
    runPass()
    val t1 = graft.operators.Upsert.readTarget(spark, target)
      .select("main_refco", "score").collect()
      .map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(t1("a") == Some(0.9), s"enrichment column missing: $t1")

    // advance the watermark on both sides past b's window: the outer side
    // must emit b with NULL enrichment — delayed, never lost
    writeBatch(src, Seq(
      doc("s1", "2024-01-01 12:00:00", Seq(9f, 9f), "z", "", "c9")), "batch1")
    writeEnrich("batch1", Seq(
      Row("z", Timestamp.valueOf("2024-01-01 12:00:00"), 0.1)))
    runPass()
    runPass() // outer emission lands once the restored watermark applies

    val t2 = graft.operators.Upsert.readTarget(spark, target)
      .select("main_refco", "score").collect()
      .map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(t2("a") == Some(0.9))
    assert(t2.contains("b") && t2("b").isEmpty,
      s"unmatched record never emitted or carried phantom enrichment: $t2")
    assert(t2("z") == Some(0.1))
  }

  test("CLI --stream/--enrich: RunPipeline flag syntax drives the enrichment join e2e") {
    import org.apache.spark.sql.types._
    val src = tmp("cli-enrich-src"); val eSrc = tmp("cli-enrich-es")
    val ckpt = tmp("cli-enrich-ckpt"); val target = tmp("cli-enrich-target") + "/out"
    val eSchema = StructType(Seq(
      StructField("main_refco", StringType),
      StructField("ets", TimestampType),
      StructField("score", DoubleType)))
    def writeEnrich(part: String, rows: Seq[Row]): Unit = {
      val staging = tmp(s"cli-enrich-stage-$part")
      spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), eSchema)
        .coalesce(1).write.mode("overwrite").parquet(staging)
      val f = new java.io.File(staging).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.copy(f.toPath, java.nio.file.Paths.get(s"$eSrc/$part.parquet"))
    }
    writeBatch(src, Seq(
      doc("s1", "2024-01-01 10:00:00", Seq(1f, 2f), "a", "", "c1")), "batch0")
    writeEnrich("batch0", Seq(
      Row("a", Timestamp.valueOf("2024-01-01 10:05:00"), 0.9)))

    // exactly the CLI surface: the flag string parses to an EnrichSpec
    // and --stream starts the same plan RunPipeline.main would; the
    // --text-index flags ride along and must build the index
    val ti = tmp("cli-enrich-ti") + "/index"
    val opts = Map(
      "--enrich" ->
        s"$eSrc;main_refco STRING, ets TIMESTAMP, score DOUBLE;main_refco;ets;10 minutes;10 minutes",
      "--text-index" -> ti, "--text-index-col" -> "category",
      "--text-index-shards" -> "2")
    graft.RunPipeline.startStream(spark, src, target, ckpt, opts)
      .awaitTermination()
    val t1 = graft.operators.Upsert.readTarget(spark, target)
      .select("main_refco", "score").collect()
      .map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(t1("a") == Some(0.9),
      s"CLI-configured enrichment column missing: $t1")
    assert(graft.operators.TextIndex.isComplete(spark, ti),
      "CLI --text-index flags did not reach the stream")
    assert(graft.operators.IndexStore.read(spark, s"$ti/doclen")
      .select("doc_id").as[String].collect().toSeq == Seq("a"))
  }

  test("streaming dedup within watermark drops cross-batch re-deliveries") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val src = tmp("dedup-src"); val ckpt = tmp("dedup-ckpt")
    val outDir = tmp("dedup-out") + "/out"
    val schema = StructType(Seq(
      StructField("k", LongType), StructField("ts", TimestampType)))

    def write(part: String, rows: Seq[(Long, String)]): Unit = {
      val staging = tmp(s"dedup-stage-$part")
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(
          rows.map { case (k, t) => Row(k, Timestamp.valueOf(t)) }, 1), schema)
      df.coalesce(1).write.mode("overwrite").parquet(staging)
      val f = new java.io.File(staging).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.copy(f.toPath, java.nio.file.Paths.get(s"$src/$part.parquet"))
    }

    def runPass(): Unit = {
      val in = spark.readStream.schema(schema).parquet(src)
      IncrementalStream.dedupWithinWatermark(in, Seq("k"), "ts", "1 hour")
        .writeStream
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.write.mode("append").parquet(outDir)
        }.start().awaitTermination()
    }

    write("b0", Seq(
      1L -> "2024-01-01 10:00:00",
      1L -> "2024-01-01 10:00:05", // in-batch re-delivery
      2L -> "2024-01-01 10:01:00"))
    runPass()
    write("b1", Seq(
      1L -> "2024-01-01 10:10:00", // cross-batch re-delivery, in watermark
      3L -> "2024-01-01 10:20:00"))
    runPass()

    val out = spark.read.parquet(outDir).select("k")
      .as[Long].collect().sorted
    assert(out.sameElements(Array(1L, 2L, 3L)), out.mkString(","))
  }
}
