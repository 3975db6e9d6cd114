package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

class IvfSpec extends SparkSpecBase {

  private val emb = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("ivfTopK with nprobe == nlist is exactly brute force") {
    val centroids = Ivf.trainCentroids(emb, "embedding", nlist = 4, iters = 1)
    val queries = emb.where(col("vec_id") < 5)
    val ivf = Ivf.ivfTopK(queries, emb, k = 3, centroids, nprobe = 4)
      .select("query_id", "rank", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val brute = Similarity.bruteForceTopK(queries, emb, k = 3)
      .select("query_id", "rank", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(ivf == brute)
  }

  test("binaryRerankTopK: candidates = corpus gives exactly brute force") {
    val queries = emb.where(col("vec_id") < 5)
    val n = emb.count().toInt
    val bin = Similarity.binaryRerankTopK(queries, emb, k = 3, dim = 64,
        candidates = n)
      .select("query_id", "rank", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val brute = Similarity.bruteForceTopK(queries, emb, k = 3)
      .select("query_id", "rank", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(bin == brute)
  }

  test("binaryRerankTopK: Hamming prefilter keeps the planted twin at top") {
    import spark.implicits._
    val base = (1 to 64).map(i => (if (i % 3 == 0) -1f else 1f) * i / 64f)
    val twin = base.map(_ * 2f) // same signs -> hamming 0, cosine 1
    val noise = (1 to 64).map(i => (if (i % 2 == 0) -1f else 1f) * i / 64f)
    val corpus = Seq((1L, base), (2L, twin), (3L, noise))
      .toDF("vec_id", "embedding")
    val out = Similarity.binaryRerankTopK(
        corpus.where(col("vec_id") === 1), corpus, k = 1, dim = 64,
        candidates = 1)
      .select("neighbor_id").as[Long].head()
    assert(out == 2L)
  }

  test("ivfTopK with nprobe < nlist returns a bounded candidate subset") {
    val centroids = Ivf.trainCentroids(emb, "embedding", nlist = 8, iters = 2)
    val queries = emb.where(col("vec_id") < 5)
    val out = Ivf.ivfTopK(queries, emb, k = 3, centroids, nprobe = 2)
    // every query still gets answers, ranked correctly
    val byQuery = out.groupBy("query_id").agg(count(lit(1)).as("n"),
      max("rank").as("maxr")).collect()
    assert(byQuery.length == 5)
    byQuery.foreach { r =>
      assert(r.getLong(1) <= 3 && r.getLong(1) == r.getLong(2))
    }
    // a probed-cell neighbor's cosine ordering is preserved
    val ranks = out.where(col("query_id") === 0)
      .orderBy("rank").select("cos").collect().map(_.getDouble(0))
    assert(ranks.sameElements(ranks.sorted(Ordering[Double].reverse)))
  }

  test("persisted index: incremental add without retrain; probe stays exact") {
    val idx = java.nio.file.Files.createTempDirectory("graft-ivf-idx").toString
    val base = emb.where(col("vec_id") < 400)
    val rest = emb.where(col("vec_id") >= 400)
    Ivf.buildIndex(spark, idx, base, trainOn = base, nlist = 4, iters = 1)
    val frozen = Ivf.loadCentroids(spark, idx)

    // merge-path maintenance: new vectors are assigned against the FROZEN
    // centroids and appended — no retrain, no rewrite of existing cells.
    Ivf.addToIndex(spark, idx, rest)
    assert(Ivf.loadCentroids(spark, idx) == frozen, "add retrained centroids")
    assert(Ivf.readCells(spark, idx).count() == emb.count())

    // nprobe == nlist probe over the grown index is exactly brute force
    // over the full corpus — added vectors are first-class index members.
    val queries = emb.where(col("vec_id") < 5)
    val viaIndex = Ivf.probeIndex(spark, idx, queries, k = 3, nprobe = 4)
      .select("query_id", "rank", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val brute = Similarity.bruteForceTopK(queries, emb, k = 3)
      .select("query_id", "rank", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(viaIndex == brute)
  }

  test("persisted-index recall is monotone in nprobe and exact at full probe") {
    // The recall number the ivf_recall driver query pins for seed
    // centroids, asserted here on the REAL persisted path (trained
    // centroids): an exact-top-k member found in the probed cells always
    // survives the re-rank (nothing in the corpus outranks it), so hits
    // grow with the probed candidate set — recall(2) <= recall(4) <=
    // recall(8), and nprobe = nlist is exactly brute force.
    val idx = java.nio.file.Files.createTempDirectory("graft-ivf-rec").toString
    Ivf.buildIndex(spark, idx, emb, trainOn = emb, nlist = 8, iters = 1)
    val queries = emb.where(col("vec_id") < 10)
    val exact = Similarity.bruteForceTopK(queries, emb, k = 3)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def recall(nprobe: Int): Double = {
      val got = Ivf.probeIndex(spark, idx, queries, k = 3, nprobe = nprobe)
        .select("query_id", "neighbor_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      got.intersect(exact).size.toDouble / exact.size
    }
    val r2 = recall(2); val r4 = recall(4); val r8 = recall(8)
    assert(r2 <= r4 && r4 <= r8, s"recall not monotone: $r2, $r4, $r8")
    assert(r8 == 1.0, s"full probe must be exact, got $r8")
    assert(r2 > 0.0, "nprobe=2 found nothing — degenerate index")
  }

  test("deleteFromIndex: erased ids vanish; only their cells are rewritten") {
    import spark.implicits._
    val idx = java.nio.file.Files.createTempDirectory("graft-ivf-del").toString
    Ivf.buildIndex(spark, idx, emb, trainOn = emb, nlist = 4, iters = 1)
    // manifest entries per cell stand in for the old per-cell dir listing
    def entries(): Map[Int, Seq[String]] =
      Upsert.readBucketManifest(spark, s"$idx/cells")
    val before = entries()

    val victims = Seq(3L, 17L, 42L)
    val victimCells = Ivf.readCells(spark, idx)
      .where(col("vec_id").isin(victims.map(Long.box): _*))
      .select("__cell").distinct().as[Int].collect().toSet
    Ivf.deleteFromIndex(spark, idx, victims.toDF("vec_id"))

    // erased ids are gone from storage and never probed back
    val left = Ivf.readCells(spark, idx)
    assert(left.where(col("vec_id").isin(victims.map(Long.box): _*)).count() == 0)
    assert(left.count() == emb.count() - victims.size)
    val probed = Ivf.probeIndex(spark, idx, emb.where(col("vec_id") < 5),
      k = 10, nprobe = 4).select("neighbor_id").as[Long].collect().toSet
    assert(victims.forall(!probed.contains(_)))
    // untouched cells keep their exact manifest entries (no rewrite, no copy)
    val after = entries()
    (before.keySet -- victimCells).foreach { c =>
      assert(after(c) == before(c), s"untouched cell $c was rewritten")
    }
    // deleting unknown ids is a no-op
    Ivf.deleteFromIndex(spark, idx, Seq(999999L).toDF("vec_id"))
    assert(Ivf.readCells(spark, idx).count() == emb.count() - victims.size)
  }

  test("addToIndex is idempotent: retried batch and key updates never duplicate ids") {
    val idx = java.nio.file.Files.createTempDirectory("graft-ivf-idem").toString
    val base = emb.where(col("vec_id") < 400)
    val batch = emb.where(col("vec_id") >= 400)
    Ivf.buildIndex(spark, idx, base, trainOn = base, nlist = 4, iters = 1)
    Ivf.addToIndex(spark, idx, batch)
    val n = Ivf.readCells(spark, idx).count()
    // at-least-once retry: same batch again appends nothing
    Ivf.addToIndex(spark, idx, batch)
    assert(Ivf.readCells(spark, idx).count() == n, "retry double-appended")
    // update to existing keys: no second row per id (probe would return
    // the same neighbor twice); the new vector waits for the rebuild job
    val updated = batch.withColumn("embedding",
      expr("transform(embedding, x -> -x)"))
    Ivf.addToIndex(spark, idx, updated)
    val cells = Ivf.readCells(spark, idx)
    assert(cells.count() == n)
    assert(cells.groupBy("vec_id").count().where(col("count") > 1).isEmpty,
      "duplicate ids in cells")
  }

  test("compactIndex collapses per-add small files; probe results unchanged") {
    val idx = java.nio.file.Files.createTempDirectory("graft-ivf-compact").toString
    Ivf.buildIndex(spark, idx, emb.where(col("vec_id") < 200),
      trainOn = emb.where(col("vec_id") < 200), nlist = 2, iters = 1)
    (0 until 3).foreach { i =>
      Ivf.addToIndex(spark, idx,
        emb.where(col("vec_id") >= 200 + i * 100 && col("vec_id") < 300 + i * 100))
    }
    def filesPerCell: Map[Int, Int] =
      Upsert.readBucketManifest(spark, s"$idx/cells")
        .map { case (c, files) => c -> files.size }
    val queries = emb.where(col("vec_id") < 5)
    val before = Ivf.probeIndex(spark, idx, queries, k = 3, nprobe = 2)
      .collect().map(_.toString).sorted
    assert(filesPerCell.values.exists(_ > 1), "appends did not fragment")

    Ivf.compactIndex(spark, idx)
    assert(filesPerCell.values.forall(_ == 1), s"still fragmented: $filesPerCell")
    val after = Ivf.probeIndex(spark, idx, queries, k = 3, nprobe = 2)
      .collect().map(_.toString).sorted
    assert(before.sameElements(after))
  }

  test("index maintenance crash: committed snapshot stays readable at every step") {
    import spark.implicits._
    val idx = java.nio.file.Files.createTempDirectory("graft-ivf-crash").toString
    // the forged orphan below is freshly written; grace-aged GC (round 9)
    // would rightly defer it — this test asserts eventual collection
    val savedGrace = Upsert.gcGraceMs
    Upsert.gcGraceMs = 0L
    try {
    Ivf.buildIndex(spark, idx, emb.where(col("vec_id") < 300),
      trainOn = emb.where(col("vec_id") < 300), nlist = 4, iters = 1)
    val committed = Ivf.readCells(spark, idx)
      .select("vec_id").as[Long].collect().toSet

    // simulate a delete/compact attempt that crashed AFTER writing its
    // data files but BEFORE the manifest commit: orphan attempt run dir
    emb.where(col("vec_id") < 10)
      .withColumn("__cell", org.apache.spark.sql.functions.lit(0))
      .withColumn("__cell_p", org.apache.spark.sql.functions.lit(0))
      .write.partitionBy("__cell_p")
      .parquet(s"$idx/cells/data/run-000000001-dead0000")

    // the committed snapshot is untouched — readers never see the orphan
    assert(Ivf.readCells(spark, idx)
      .select("vec_id").as[Long].collect().toSet == committed,
      "crashed attempt leaked into reads")

    // the retried maintenance job converges and GCs the orphan files
    Ivf.deleteFromIndex(spark, idx, Seq(5L).toDF("vec_id"))
    assert(Ivf.readCells(spark, idx)
      .select("vec_id").as[Long].collect().toSet == committed - 5L)
    assert(!new java.io.File(s"$idx/cells/data/run-000000001-dead0000").exists(),
      "orphan attempt files survived GC")
    // and no commit path ever renamed a directory: the pre-delete manifest
    // was superseded, not swapped — the live one lists only surviving files
    val manifests = new java.io.File(s"$idx/cells").listFiles()
      .map(_.getName).filter(_.endsWith(".manifest.json"))
    assert(manifests.length == 1)
    } finally Upsert.gcGraceMs = savedGrace
  }

  test("idmap reverse lookup stays consistent across build/add/delete/compact") {
    import spark.implicits._
    val idx = java.nio.file.Files.createTempDirectory("graft-ivf-idmap").toString
    def idmapIds = graft.operators.IndexStore.read(spark, s"$idx/idmap")
      .select("vec_id").as[Long].collect().toSet
    def cellIds = Ivf.readCells(spark, idx)
      .select("vec_id").as[Long].collect().toSet

    Ivf.buildIndex(spark, idx, emb.where(col("vec_id") < 200),
      trainOn = emb.where(col("vec_id") < 200), nlist = 4, iters = 1)
    assert(idmapIds == cellIds && cellIds.size == 200)

    Ivf.addToIndex(spark, idx,
      emb.where(col("vec_id") >= 200 && col("vec_id") < 250))
    assert(idmapIds == cellIds && cellIds.size == 250)

    // erasure locates through the idmap and retires its rows too
    Ivf.deleteFromIndex(spark, idx, Seq(5L, 210L).toDF("vec_id"))
    assert(idmapIds == cellIds)
    assert(!cellIds.contains(5L) && !cellIds.contains(210L))

    Ivf.compactIndex(spark, idx)
    assert(idmapIds == cellIds && cellIds.size == 248)
    // every idmap row records the id's ACTUAL cell (probe pruning + the
    // erasure's touched-cell derivation both depend on this)
    val disagree = Ivf.readCells(spark, idx)
      .select(col("vec_id"), col("__cell").as("actual"))
      .join(graft.operators.IndexStore.read(spark, s"$idx/idmap"), Seq("vec_id"))
      .where(col("actual") =!= col("__cell")).count()
    assert(disagree == 0L)
  }

  test("pre-idmap index: first addToIndex backfills the map before appending") {
    import spark.implicits._
    val idx = java.nio.file.Files.createTempDirectory("graft-ivf-premap").toString
    Ivf.buildIndex(spark, idx, emb.where(col("vec_id") < 100),
      trainOn = emb.where(col("vec_id") < 100), nlist = 2, iters = 1)
    // simulate a round-8 index: the idmap table never existed
    def rmrf(f: java.io.File): Unit = {
      Option(f.listFiles()).getOrElse(Array.empty).foreach(rmrf); f.delete()
    }
    rmrf(new java.io.File(s"$idx/idmap"))
    Ivf.addToIndex(spark, idx,
      emb.where(col("vec_id") >= 100 && col("vec_id") < 120))
    // old ids MUST be locatable: erase one pre-map id and one appended id
    Ivf.deleteFromIndex(spark, idx, Seq(7L, 110L).toDF("vec_id"))
    val left = Ivf.readCells(spark, idx).select("vec_id").as[Long].collect().toSet
    assert(!left.contains(7L) && !left.contains(110L) && left.size == 118,
      "pre-idmap ids were not locatable after backfill")
  }

  test("legacy plain-dir index is adopted on first delete; reads work throughout") {
    import spark.implicits._
    val idx = java.nio.file.Files.createTempDirectory("graft-ivf-legacy").toString
    // hand-write the pre-round-8 layout: hive __cell= partition dirs
    val centroids = Ivf.trainCentroids(emb.where(col("vec_id") < 100),
      "embedding", nlist = 2, iters = 1)
    centroids.zipWithIndex.map { case (c, i) => (i, c) }.toDF("cell", "centroid")
      .coalesce(1).write.parquet(s"$idx/centroids")
    emb.where(col("vec_id") < 100)
      .withColumn("__cell", org.apache.spark.sql.functions
        .element_at(graft.functions.F.nearestCentroids(col("embedding"),
          centroids, 1), 1))
      .write.partitionBy("__cell").parquet(s"$idx/cells")

    assert(Ivf.readCells(spark, idx).count() == 100) // legacy passthrough
    Ivf.deleteFromIndex(spark, idx, Seq(7L).toDF("vec_id"))
    assert(Ivf.readCells(spark, idx).count() == 99)
    assert(Upsert.currentSnapshot(spark, s"$idx/cells").isDefined,
      "delete did not adopt the legacy dir into the store")
    // legacy hive dirs were swept after adoption
    assert(!new java.io.File(s"$idx/cells").listFiles()
      .exists(_.getName.startsWith("__cell=")), "legacy dirs linger")
    val probed = Ivf.probeIndex(spark, idx, emb.where(col("vec_id") < 3),
      k = 5, nprobe = 2).select("neighbor_id").as[Long].collect().toSet
    assert(!probed.contains(7L))
  }

  test("trainer is deterministic") {
    val a = Ivf.trainCentroids(emb, "embedding", nlist = 4, iters = 2)
    val b = Ivf.trainCentroids(emb, "embedding", nlist = 4, iters = 2)
    assert(a == b)
  }

  test("cachedIndexDir: distinct corpora never share a dir; data change rekeys") {
    val root = java.nio.file.Files.createTempDirectory("ivf-key").toFile
    def mk(name: String, content: String): java.io.File = {
      val f = new java.io.File(root, name)
      java.nio.file.Files.writeString(f.toPath, content)
      f
    }
    val a = mk("corpus_a.parquet", "aaaa")
    val b = mk("corpus_b.parquet", "bbbb")
    assert(Ivf.cachedIndexDir(a, root.getPath) != Ivf.cachedIndexDir(b, root.getPath))
    val before = Ivf.cachedIndexDir(a, root.getPath)
    // same path, changed data (mtime and/or length) → different snapshot dir
    java.nio.file.Files.writeString(a.toPath, "aaaa-changed")
    a.setLastModified(a.lastModified + 10000)
    assert(Ivf.cachedIndexDir(a, root.getPath) != before)
  }

  test("gcSupersededIndexes removes only stale snapshots of the same source") {
    val root = java.nio.file.Files.createTempDirectory("ivf-gc").toFile
    val src = new java.io.File(root, "corpus.parquet")
    java.nio.file.Files.writeString(src.toPath, "v1")
    val keep = Ivf.cachedIndexDir(src, root.getPath)
    val keepName = new java.io.File(keep).getName
    val srcPrefix = keepName.substring(0, keepName.lastIndexOf('-') + 1)
    val stale = new java.io.File(root, srcPrefix + "deadbeef")
    new java.io.File(stale, "centroids").mkdirs()
    val other = new java.io.File(root, "graft-ivf-index-ffff0000-cafebabe")
    new java.io.File(other, "centroids").mkdirs()
    new java.io.File(keep).mkdirs()
    Ivf.gcSupersededIndexes(keep)
    assert(!stale.exists(), "stale snapshot of same source must be removed")
    assert(other.exists(), "other sources' indexes must survive")
    assert(new java.io.File(keep).exists())
  }

  test("IVF-PQ: full probe + full candidates is exactly brute force; adds encode") {
    val idx = java.nio.file.Files.createTempDirectory("graft-ivfpq").toString
    val base = emb.where(col("vec_id") < 400)
    val rest = emb.where(col("vec_id") >= 400)
    Ivf.buildIndex(spark, idx, base, trainOn = base, nlist = 4, iters = 1)
    Ivf.attachPq(spark, idx, trainOn = base, m = 8, ksub = 16)
    assert(Ivf.loadPqCodebooks(spark, idx).size == 8)
    // every stored row carries m codes after the attach rewrite
    val cells = Ivf.readCells(spark, idx)
    assert(cells.columns.contains("__codes"))
    assert(cells.where(size(col("__codes")) =!= 8).count() == 0L)
    // incremental add encodes against the FROZEN codebooks
    Ivf.addToIndex(spark, idx, rest)
    val grown = Ivf.readCells(spark, idx)
    assert(grown.count() == emb.count())
    assert(grown.where(col("__codes").isNull).count() == 0L)
    // degenerate knobs = exact brute force over the whole corpus
    val queries = emb.where(col("vec_id") < 5)
    val viaPq = Ivf.probeIndexAdc(spark, idx, queries, k = 3, nprobe = 4,
        candidates = emb.count().toInt)
      .select("query_id", "rank", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val brute = Similarity.bruteForceTopK(queries, emb, k = 3)
      .select("query_id", "rank", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(viaPq == brute)
    // a tight ADC budget still returns k rows per query (approximate path)
    val tight = Ivf.probeIndexAdc(spark, idx, queries, k = 3, nprobe = 2,
      candidates = 10)
    assert(tight.groupBy("query_id").count()
      .where(col("count") =!= 3).count() == 0L)
  }

  test("IVF-PQ: delete carries codes through; probe excludes erased ids") {
    import spark.implicits._
    val idx = java.nio.file.Files.createTempDirectory("graft-ivfpq-del").toString
    Ivf.buildIndex(spark, idx, emb, trainOn = emb, nlist = 4, iters = 1)
    Ivf.attachPq(spark, idx, trainOn = emb, m = 8, ksub = 16)
    val victims = Seq(3L, 17L)
    Ivf.deleteFromIndex(spark, idx, victims.toDF("vec_id"))
    val after = Ivf.readCells(spark, idx)
    assert(after.where(col("vec_id").isin(victims: _*)).count() == 0L)
    assert(after.where(col("__codes").isNull).count() == 0L, "codes lost in rewrite")
    val out = Ivf.probeIndexAdc(spark, idx,
      emb.where(col("vec_id") < 5), k = 5, nprobe = 4, candidates = 50)
    assert(out.where(col("neighbor_id").isin(victims: _*)).count() == 0L)
  }

  test("residual IVF-PQ: degenerate knobs exact; adds and deletes encode residuals") {
    import spark.implicits._
    val idx = java.nio.file.Files.createTempDirectory("graft-ivfpqr").toString
    val base = emb.where(col("vec_id") < 400)
    val rest = emb.where(col("vec_id") >= 400)
    Ivf.buildIndex(spark, idx, base, trainOn = base, nlist = 4, iters = 1)
    Ivf.attachPq(spark, idx, trainOn = base, m = 8, ksub = 16, residual = true)
    assert(Ivf.pqIsResidual(spark, idx), "residual flag not persisted")
    assert(Ivf.loadPqCodebooks(spark, idx).size == 8)

    // incremental add encodes RESIDUALS against the frozen codebooks: the
    // appended rows' codes must equal what an attach-time rewrite of the
    // same rows produces (same __cell assignment, same residual input)
    Ivf.addToIndex(spark, idx, rest)
    val cents = Ivf.loadCentroids(spark, idx)
    val cb = Ivf.loadPqCodebooks(spark, idx)
    val stored = Ivf.readCells(spark, idx)
      .where(col("vec_id") >= 400)
      .select(col("vec_id"),
        col("__codes"),
        graft.functions.F.pqCodes(
          Ivf.residualOf(col("embedding"), col("__cell"), cents),
          cb).as("expect"))
    assert(stored.where(col("__codes") =!= col("expect")).count() == 0L,
      "appended rows not residual-encoded")

    // degenerate knobs = exact brute force, like the raw-PQ twin
    val queries = emb.where(col("vec_id") < 5)
    val viaPq = Ivf.probeIndexAdc(spark, idx, queries, k = 3, nprobe = 4,
        candidates = emb.count().toInt)
      .select("query_id", "rank", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val brute = Similarity.bruteForceTopK(queries, emb, k = 3)
      .select("query_id", "rank", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(viaPq == brute)

    // erasure carries residual codes through the rewrite untouched
    Ivf.deleteFromIndex(spark, idx, Seq(3L, 17L).toDF("vec_id"))
    val after = Ivf.readCells(spark, idx)
    assert(after.where(col("__codes").isNull).count() == 0L)
    assert(Ivf.pqIsResidual(spark, idx), "flag lost after maintenance")
  }

  test("residual IVF-PQ: recall at a lossy budget beats raw PQ on a clustered corpus") {
    import spark.implicits._
    // Planted corpus where the residual is the whole signal: 4 orthogonal
    // cluster centers (the coarse quantizer's job) + per-row noise drawn
    // from 4 DISCRETE patterns shared across clusters. Residual codebooks
    // see ONLY the 4 patterns — exactly encodable at ksub = 4, and the
    // id-prefix seeds (rows 0..3 = patterns 0..3) are the patterns
    // themselves — while raw PQ must cover {center 0, center 10} × 4
    // patterns = 8 distinct subspace values with 4 codewords, so
    // within-cluster candidates collapse and the tight ADC budget picks
    // near-arbitrary cluster members. Coarse centroids are SEEDED with
    // the true centers (the ivf_recall convention): this pins the
    // encoding property, not Lloyd initialization luck — the trained
    // coarse path is covered by the monotone-recall test above.
    // Noise patterns are zero-sum per 4-dim block (orthogonal to every
    // center) and equal-norm, so ⟨q, v⟩ ranking ≡ cosine ranking and the
    // ONLY variable between the two probes is code quality — without
    // this, the ⟨c, n⟩ cross term dominates the (exact!) IP estimate and
    // the candidate stage ranks by center projection instead of twin-ness.
    val dim = 16
    val patterns = Seq(
      Seq(1f, -1f, 0.5f, -0.5f), Seq(-1f, 1f, -0.5f, 0.5f),
      Seq(0.5f, -0.5f, 1f, -1f), Seq(-0.5f, 0.5f, -1f, 1f))
    def vec(i: Int): Seq[Float] = {
      val g = i / 50 // cluster
      val p = i % 4  // noise pattern
      (0 until dim).map(d => (if (d / 4 == g) 10f else 0f) + patterns(p)(d % 4))
    }
    val corpus = (0 until 200).map(i => (i.toLong, vec(i))).toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val centers = (0 until 4).map(g =>
      (g, Seq.tabulate(dim)(d => if (d / 4 == g) 10.0 else 0.0)))
    val queries = corpus.where(col("vec_id").isin((0L until 8L).map(Long.box): _*))
    val exact = Similarity.bruteForceTopK(queries, corpus, k = 5)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    def recall(residual: Boolean): Double = {
      val idx = java.nio.file.Files.createTempDirectory(
        s"graft-pqr-$residual").toString
      IndexStore.rewrite(spark, s"$idx/centroids",
        centers.toDF("cell", "centroid").coalesce(1))
      Ivf.addToIndex(spark, idx, corpus) // assigns against the seeded centers
      Ivf.attachPq(spark, idx, trainOn = corpus, m = 4, ksub = 4, iters = 2,
        residual = residual)
      val got = Ivf.probeIndexAdc(spark, idx, queries, k = 5, nprobe = 1,
          candidates = 5)
        .select("query_id", "neighbor_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      got.intersect(exact).size.toDouble / exact.size
    }
    val raw = recall(residual = false)
    val res = recall(residual = true)
    info(s"recall@5: raw=$raw residual=$res")
    // the floor is BINDING, not vacuous: raw must actually fail it on
    // this corpus (flip the res branch to residual = false and the test
    // fails twice over)
    assert(raw < 0.9, s"corpus no longer separates the variants: raw=$raw")
    assert(res >= raw, s"residual recall $res < raw $raw")
    assert(res >= 0.9, s"residual recall floor broken: $res (raw $raw)")
  }

  test("OPQ: learned rotation rescues a basis-scrambled corpus raw PQ provably fails") {
    import spark.implicits._
    // A corpus that PQ encodes EXACTLY in its natural basis (4 distinct
    // subvectors per subspace = ksub), then scrambled by three 45°
    // plane rotations that each straddle a subspace BOUNDARY — the
    // textbook OPQ failure mode: after scrambling, every subspace sees
    // its neighbor block's pattern too (16 distinct subvectors > ksub),
    // so raw PQ's codes collide across classes. OPQ's Procrustes
    // alternation must learn a rotation good enough to separate them
    // again. All vectors are equal-norm (each uses the same 4 equal-norm
    // patterns, permuted), so dot ranking ≡ cosine ranking and code
    // quality is the only variable.
    val dim = 16
    val m = 4
    val patterns = Seq(
      Seq(1.0, -1.0, 0.5, -0.5), Seq(-1.0, 1.0, -0.5, 0.5),
      Seq(0.5, -0.5, 1.0, -1.0), Seq(-0.5, 0.5, -1.0, 1.0))
    // INDEPENDENT base-4 digits per subspace (i's digit s picks the
    // pattern) — correlated digits would leave only 4 distinct full
    // vectors and PQ would survive any rotation. Subspace weights make
    // every query's true top-5 TIE-FREE (the pattern-pair dot map is
    // injective per subspace, so distinct neighbors get distinct
    // weighted sums): without them the corpus is a lattice of massive
    // cosine ties and the candidate cut measures float tie-ordering
    // noise instead of code quality.
    def baseVec(i: Int): Array[Double] =
      (0 until m).flatMap { s =>
        val scale = 1.0 + 0.3 * s
        patterns((i >> (2 * s)) & 3).map(_ * scale)
      }.toArray
    // scramble: 45° rotations in planes straddling every subspace
    // boundary, two per boundary
    val w = Array.tabulate(dim, dim)((a, b) => if (a == b) 1.0 else 0.0)
    Seq(3, 7, 11).flatMap(p => Seq(p, p - 1)).foreach { p =>
      val c = math.cos(math.Pi / 4); val s = math.sin(math.Pi / 4)
      (0 until dim).foreach { i =>
        val vp = w(i)(p); val vq = w(i)(p + 2)
        w(i)(p) = c * vp - s * vq
        w(i)(p + 2) = s * vp + c * vq
      }
    }
    def scrambled(i: Int): Seq[Float] = {
      val x = baseVec(i)
      (0 until dim).map { r =>
        var acc = 0.0; var cIdx = 0
        while (cIdx < dim) { acc += w(r)(cIdx) * x(cIdx); cIdx += 1 }
        acc.toFloat
      }
    }
    val corpus = (0 until 200).map(i => (i.toLong, scrambled(i)))
      .toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val queries = corpus.where(col("vec_id").isin((0L until 8L).map(Long.box): _*))
    val exact = Similarity.bruteForceTopK(queries, corpus, k = 5)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    def recall(opq: Boolean): Double = {
      val idx = java.nio.file.Files.createTempDirectory(
        s"graft-opq-$opq").toString
      // single coarse cell: lossiness comes purely from the ADC
      // candidate cut, never from cell pruning
      IndexStore.rewrite(spark, s"$idx/centroids",
        Seq((0, Seq.fill(dim)(1.0))).toDF("cell", "centroid").coalesce(1))
      Ivf.addToIndex(spark, idx, corpus)
      if (opq) Ivf.attachOpq(spark, idx, trainOn = corpus, m = m, ksub = 4,
        iters = 2, opqIters = 30)
      else Ivf.attachPq(spark, idx, trainOn = corpus, m = m, ksub = 4,
        iters = 2)
      val got = Ivf.probeIndexAdc(spark, idx, queries, k = 5, nprobe = 1,
          candidates = 5)
        .select("query_id", "neighbor_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      got.intersect(exact).size.toDouble / exact.size
    }
    val raw = recall(opq = false)
    val rot = recall(opq = true)
    info(s"recall@5: raw=$raw opq=$rot (binding floor 0.9)")
    // binding: raw PQ must actually fail the floor on this corpus
    assert(raw < 0.9, s"corpus no longer defeats raw PQ: raw=$raw")
    assert(rot >= raw, s"OPQ recall $rot < raw $raw")
    assert(rot >= 0.9, s"OPQ recall floor broken: $rot (raw $raw)")
  }

  test("OPQ: incremental adds encode through the frozen rotation; degenerate knobs exact") {
    import spark.implicits._
    val base = emb.where(col("vec_id") < 400)
    val rest = emb.where(col("vec_id") >= 400)
    val idx = java.nio.file.Files.createTempDirectory("graft-opq-inc").toString
    Ivf.buildIndex(spark, idx, base, trainOn = base, nlist = 4, iters = 1)
    Ivf.attachOpq(spark, idx, trainOn = base, m = 8, ksub = 16, opqIters = 4)
    // the persisted rotation is orthonormal: R·Rᵀ = I
    val r = Ivf.loadOpq(spark, idx)
    val d = r.length
    (0 until d).foreach { i =>
      (0 until d).foreach { j =>
        val dot = (0 until d).map(k => r(i)(k) * r(j)(k)).sum
        assert(math.abs(dot - (if (i == j) 1.0 else 0.0)) < 1e-8,
          s"rotation not orthonormal at ($i,$j): $dot")
      }
    }
    // appended vectors encode through the frozen rotation automatically
    Ivf.addToIndex(spark, idx, rest)
    assert(Ivf.readCells(spark, idx)
      .where(col("__codes").isNull).count() == 0L)
    // degenerate knobs (full probe, full candidates) are exact brute force
    val queries = emb.where(col("vec_id") < 10)
    val brute = Similarity.bruteForceTopK(queries, emb, k = 3)
      .select("query_id", "rank", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val got = Ivf.probeIndexAdc(spark, idx, queries, k = 3, nprobe = 4,
        candidates = emb.count().toInt)
      .select("query_id", "rank", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == brute)
  }

  test("SQ8: recall on the planted corpus >= the residual-PQ twin's, floors binding") {
    import spark.implicits._
    // Same planted corpus as the residual test: 4 orthogonal cluster
    // centers + 4 discrete zero-sum noise patterns. SQ8 stores dim = 16
    // uint8 codes per vector (4x residual-PQ's m = 4 bytes) and must buy
    // accuracy with that memory: at the SAME lossy budget (nprobe = 1,
    // candidates = 5) its recall floor must be at least the residual
    // twin's 0.9 floor — and the floor is BINDING (raw PQ fails it on
    // this corpus, pinned in the residual test).
    val dim = 16
    val patterns = Seq(
      Seq(1f, -1f, 0.5f, -0.5f), Seq(-1f, 1f, -0.5f, 0.5f),
      Seq(0.5f, -0.5f, 1f, -1f), Seq(-0.5f, 0.5f, -1f, 1f))
    def vec(i: Int): Seq[Float] = {
      val g = i / 50
      val p = i % 4
      (0 until dim).map(d => (if (d / 4 == g) 10f else 0f) + patterns(p)(d % 4))
    }
    val corpus = (0 until 200).map(i => (i.toLong, vec(i))).toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val centers = (0 until 4).map(g =>
      (g, Seq.tabulate(dim)(d => if (d / 4 == g) 10.0 else 0.0)))
    val queries = corpus.where(col("vec_id").isin((0L until 8L).map(Long.box): _*))
    val exact = Similarity.bruteForceTopK(queries, corpus, k = 5)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val idx = java.nio.file.Files.createTempDirectory("graft-sq8r").toString
    IndexStore.rewrite(spark, s"$idx/centroids",
      centers.toDF("cell", "centroid").coalesce(1))
    Ivf.addToIndex(spark, idx, corpus)
    Ivf.attachSq8(spark, idx, trainOn = corpus)
    val got = Ivf.probeIndexSq8(spark, idx, queries, k = 5, nprobe = 1,
        candidates = 5)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sq8 = got.intersect(exact).size.toDouble / exact.size
    info(s"recall@5: sq8=$sq8 (residual twin's binding floor: 0.9)")
    assert(sq8 >= 0.9, s"SQ8 recall floor broken: $sq8")

    // incremental adds encode automatically with the frozen bounds
    val extra = Seq((500L, vec(1))).toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    Ivf.addToIndex(spark, idx, extra)
    val cells = Ivf.readCells(spark, idx)
    assert(cells.where(col("vec_id") === 500L && col("__sq8").isNotNull)
      .count() == 1L, "appended row not SQ8-encoded")
    // degenerate knobs are exactly brute force on the grown corpus
    val grown = corpus.unionByName(extra)
    val bf = Similarity.bruteForceTopK(queries, grown, k = 5)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val full = Ivf.probeIndexSq8(spark, idx, queries, k = 5, nprobe = 4,
        candidates = 201)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(full == bf, "degenerate-knob SQ8 probe is not brute force")
  }

  test("probeIndexAdc without an attached PQ fails with a clear contract error") {
    val idx = java.nio.file.Files.createTempDirectory("graft-ivfpq-no").toString
    Ivf.buildIndex(spark, idx, emb.where(col("vec_id") < 100),
      trainOn = emb.where(col("vec_id") < 100), nlist = 2, iters = 0)
    val e = intercept[IllegalArgumentException] {
      Ivf.probeIndexAdc(spark, idx, emb.where(col("vec_id") < 2), k = 1,
        nprobe = 1)
    }
    assert(e.getMessage.contains("attachPq"))
  }
}
