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
    assert(spark.read.parquet(s"$idx/cells").count() == emb.count())

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

  test("deleteFromIndex: erased ids vanish; only their cells are rewritten") {
    import spark.implicits._
    val idx = java.nio.file.Files.createTempDirectory("graft-ivf-del").toString
    Ivf.buildIndex(spark, idx, emb, trainOn = emb, nlist = 4, iters = 1)
    val cellsDir = new java.io.File(s"$idx/cells")
    def fileSet(): Map[String, Set[String]] = cellsDir.listFiles()
      .filter(_.isDirectory).map(d => d.getName ->
        d.listFiles().map(_.getName).toSet).toMap
    val before = fileSet()

    val victims = Seq(3L, 17L, 42L)
    val victimCells = spark.read.parquet(s"$idx/cells")
      .where(col("vec_id").isin(victims.map(Long.box): _*))
      .select("__cell").distinct().as[Int].collect()
      .map(c => s"__cell=$c").toSet
    Ivf.deleteFromIndex(spark, idx, victims.toDF("vec_id"))

    // erased ids are gone from storage and never probed back
    val left = spark.read.parquet(s"$idx/cells")
    assert(left.where(col("vec_id").isin(victims.map(Long.box): _*)).count() == 0)
    assert(left.count() == emb.count() - victims.size)
    val probed = Ivf.probeIndex(spark, idx, emb.where(col("vec_id") < 5),
      k = 10, nprobe = 4).select("neighbor_id").as[Long].collect().toSet
    assert(victims.forall(!probed.contains(_)))
    // untouched cell dirs keep their exact files
    val after = fileSet()
    (before.keySet -- victimCells).foreach { c =>
      assert(after(c) == before(c), s"untouched $c was rewritten")
    }
    // deleting unknown ids is a no-op
    Ivf.deleteFromIndex(spark, idx, Seq(999999L).toDF("vec_id"))
    assert(spark.read.parquet(s"$idx/cells").count() == emb.count() - victims.size)
  }

  test("addToIndex is idempotent: retried batch and key updates never duplicate ids") {
    val idx = java.nio.file.Files.createTempDirectory("graft-ivf-idem").toString
    val base = emb.where(col("vec_id") < 400)
    val batch = emb.where(col("vec_id") >= 400)
    Ivf.buildIndex(spark, idx, base, trainOn = base, nlist = 4, iters = 1)
    Ivf.addToIndex(spark, idx, batch)
    val n = spark.read.parquet(s"$idx/cells").count()
    // at-least-once retry: same batch again appends nothing
    Ivf.addToIndex(spark, idx, batch)
    assert(spark.read.parquet(s"$idx/cells").count() == n, "retry double-appended")
    // update to existing keys: no second row per id (probe would return
    // the same neighbor twice); the new vector waits for the rebuild job
    val updated = batch.withColumn("embedding",
      expr("transform(embedding, x -> -x)"))
    Ivf.addToIndex(spark, idx, updated)
    val cells = spark.read.parquet(s"$idx/cells")
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
    def filesPerCell: Map[String, Int] = {
      val cellDirs = new java.io.File(s"$idx/cells").listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("__cell="))
      cellDirs.map(d => d.getName ->
        d.listFiles().count(_.getName.endsWith(".parquet"))).toMap
    }
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
}
