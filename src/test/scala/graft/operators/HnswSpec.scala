package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** The HNSW-style layered-graph ANN: geometric level law, per-layer
  * edge bounds, planted-neighbor search, and the persisted-index path
  * serving the same results as the in-plan build. */
class HnswSpec extends SparkSpecBase {
  import spark.implicits._

  private def randCorpus(n: Int, dim: Int, seed: Int = 7) = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map(i =>
      (i.toLong, Array.fill(dim)(rnd.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding")
  }

  test("withLevel: trailing-zero geometric law — exact vs a naive bit reference") {
    val df = (0L until 4096L).map(i => Tuple1(i)).toDF("vec_id")
    val got = Hnsw.withLevel(df, "vec_id", maxLevel = 3)
      .select("vec_id", "level").as[(Long, Long)].collect().toMap
    def hash(s: String): Long = graft.functions.PortableHash.mix64(
      org.apache.spark.unsafe.types.UTF8String.fromString(s))
    got.foreach { case (id, lvl) =>
      val h = hash(s"$id:hnsw")
      val want = (0 until 3).find(i => ((h >> i) & 1L) == 1L)
        .map(_.toLong).getOrElse(3L)
      assert(lvl == want, s"id=$id")
    }
    // the geometric shape: each level holds roughly half the previous
    val byLevel = got.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(byLevel(0L) > 1600 && byLevel(0L) < 2500, byLevel.toString)
    assert(byLevel(1L) > 800 && byLevel(1L) < 1300, byLevel.toString)
  }

  test("knnEdges: per-(layer, src) outdegree <= m; layers respect both endpoints' levels") {
    val df = randCorpus(200, 16)
    val edges = Hnsw.knnEdges(df, "vec_id", "embedding", dim = 16, m = 4,
      maxLevel = 3, planes = 3, tables = 2)
    val rows = edges.select("layer", "src", "dst")
      .as[(Int, Long, Long)].collect()
    val deg = rows.groupBy(r => (r._1, r._2)).view.mapValues(_.size)
    assert(deg.values.forall(_ <= 4), s"max outdegree ${deg.values.max}")
    val lvls = Hnsw.withLevel(df, "vec_id", 3)
      .select("vec_id", "level").as[(Long, Long)].collect().toMap
    rows.foreach { case (layer, src, dst) =>
      assert(layer <= lvls(src) && layer <= lvls(dst),
        s"edge ($src,$dst) above an endpoint's level at layer $layer")
    }
  }

  test("topK finds a planted near-duplicate and never returns the query itself") {
    val rnd = new scala.util.Random(3)
    val base = Array.fill(16)(rnd.nextGaussian().toFloat)
    val rows = Seq((0L, base), (1L, base.map(_ * 1.0001f))) ++
      (2L until 120L).map(i => (i, Array.fill(16)(rnd.nextGaussian().toFloat)))
    val df = rows.toDF("vec_id", "embedding")
    val got = Hnsw.topK(df.where(col("vec_id") === 0L), df, k = 3, dim = 16,
      m = 6, maxLevel = 3, planes = 3, tables = 3, beam = 8, rounds = 3)
      .select("rank", "neighbor_id").as[(Long, Long)].collect().toMap
    assert(got(1L) == 1L, s"planted twin not rank 1: $got")
    assert(!got.values.exists(_ == 0L), "query returned itself")
  }

  test("recall@5 clears a measured floor; degenerate knobs fall below it") {
    // VERDICT r13 #3: the hnsw_recall gate hash-matches an oracle that
    // replays the same algorithm, so recall 0.1 would also "pass" it.
    // This pins QUALITY itself on a seeded corpus: production-ish knobs
    // must clear the floor, and the floor is proven BINDING — the
    // degenerate mutation (beam = k, zero layer-0 rounds: greedy descent
    // only) lands far below it, so an (m, beam, rounds) regression fails
    // this suite instead of just changing a hash the oracle mirrors.
    // Deterministic seeds; measured: full knobs 0.90, degenerate 0.08.
    val df = randCorpus(300, 16).localCheckpoint()
    val queries = df.where(col("vec_id") < 20)
    val exact = Similarity.bruteForceTopK(queries, df, k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    def recall(beam: Int, rounds: Int): Double = {
      val got = Hnsw.topK(queries, df, k = 5, dim = 16, m = 8,
        maxLevel = 3, planes = 3, tables = 3, beam = beam, rounds = rounds)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
      got.intersect(exact).size.toDouble / exact.size
    }
    val full = recall(beam = 16, rounds = 3)
    assert(full >= 0.8, s"recall@5 regressed below the 0.8 floor: $full")
    val degenerate = recall(beam = 5, rounds = 0)
    assert(degenerate < 0.8,
      s"floor is not binding — degenerate knobs read $degenerate")
  }

  test("persisted index serves bit-identical results to the in-plan build") {
    val root = java.nio.file.Files.createTempDirectory("hnsw-idx").toString
    val df = randCorpus(150, 16)
    val queries = df.where(col("vec_id") < 5)
    Hnsw.buildIndex(spark, root, df, dim = 16, m = 4, maxLevel = 3,
      planes = 3, tables = 2)
    // self-contained: the search never touches the corpus
    val served = Hnsw.searchIndex(spark, root, queries, k = 3,
      beam = 8, rounds = 2)
      .collect().map(_.toSeq).toSet
    val inPlan = Hnsw.topK(queries, df, k = 3, dim = 16, m = 4,
      maxLevel = 3, planes = 3, tables = 2, beam = 8, rounds = 2)
      .collect().map(_.toSeq).toSet
    assert(served == inPlan)
    // the persisted layout partitions edges by layer (prunable files)
    val edges = IndexStore.read(spark, s"$root/edges")
    assert(edges.columns.contains("layer") && edges.count() > 0)
  }

  test("addToIndex is EXACTLY rebuild-equivalent and replay-idempotent") {
    // split a corpus, build on the first part, fold the rest in — the
    // incremental index must equal the from-scratch build bit for bit:
    // edges, and therefore every search result. The equivalence theorem:
    // re-cutting a stored top-m against the new candidates equals
    // cutting the full candidate set, because anything the old cut
    // dropped is still dominated by m surviving edges.
    val root = java.nio.file.Files.createTempDirectory("hnsw-add").toString
    val rebuilt = java.nio.file.Files.createTempDirectory("hnsw-full").toString
    val df = randCorpus(200, 16, seed = 5)
    val part1 = df.where(col("vec_id") < 120)
    val part2 = df.where(col("vec_id") >= 120)
    Hnsw.buildIndex(spark, root, part1, dim = 16, m = 4, maxLevel = 3,
      planes = 3, tables = 2)
    Hnsw.addToIndex(spark, root, part2)
    Hnsw.buildIndex(spark, rebuilt, df, dim = 16, m = 4, maxLevel = 3,
      planes = 3, tables = 2)
    def edgeSet(r: String) = IndexStore.read(spark, s"$r/edges")
      .select("layer", "src", "dst", "cos")
      .collect().map(_.toSeq).toSet
    assert(edgeSet(root) == edgeSet(rebuilt))
    val queries = df.where(col("vec_id") < 5)
    def res(r: String) = Hnsw.searchIndex(spark, r, queries, k = 3,
      beam = 8, rounds = 2).collect().map(_.toSeq).toSet
    assert(res(root) == res(rebuilt))
    // replaying the same batch is a no-op (ids already indexed)
    val before = edgeSet(root)
    Hnsw.addToIndex(spark, root, part2)
    assert(edgeSet(root) == before)
    assert(IndexStore.read(spark, s"$root/nodes").count() == 200L)
  }

  test("deleteFromIndex heals exactly: erased graph equals a build over the survivors") {
    // delete a third of the corpus — including, by construction, nodes
    // that appear in other nodes' stored top-m (the heal path) — and
    // require bit-for-bit equality with a from-scratch build over the
    // survivors: edges AND search results. This is the no-degraded-
    // recall-window erasure contract.
    val root = java.nio.file.Files.createTempDirectory("hnsw-del").toString
    val rebuilt = java.nio.file.Files.createTempDirectory("hnsw-surv").toString
    val df = randCorpus(180, 16, seed = 9)
    Hnsw.buildIndex(spark, root, df, dim = 16, m = 4, maxLevel = 3,
      planes = 3, tables = 2)
    val doomed = df.where(col("vec_id") % 3 === 0).select("vec_id")
    Hnsw.deleteFromIndex(spark, root, doomed)
    val survivors = df.where(col("vec_id") % 3 =!= 0)
    Hnsw.buildIndex(spark, rebuilt, survivors, dim = 16, m = 4,
      maxLevel = 3, planes = 3, tables = 2)
    def edgeSet(r: String) = IndexStore.read(spark, s"$r/edges")
      .select("layer", "src", "dst", "cos")
      .collect().map(_.toSeq).toSet
    assert(edgeSet(root) == edgeSet(rebuilt))
    // no erased id survives anywhere in the index
    val remaining = IndexStore.read(spark, s"$root/nodes")
      .select("node_id").as[Long].collect().toSet
    assert(remaining.forall(_ % 3 != 0) && remaining.size == 120)
    val queries = survivors.where(col("vec_id") < 10)
    def res(r: String) = Hnsw.searchIndex(spark, r, queries, k = 3,
      beam = 8, rounds = 2).collect().map(_.toSeq).toSet
    assert(res(root) == res(rebuilt))
    // deleting ids not present is a no-op
    val before = edgeSet(root)
    Hnsw.deleteFromIndex(spark, root,
      Seq(100000L, 100001L).toDF("vec_id"))
    assert(edgeSet(root) == before)
  }

  test("compactIndex collapses per-add node files; search results unchanged") {
    val root = java.nio.file.Files.createTempDirectory("hnsw-cmp").toString
    val df = randCorpus(150, 16, seed = 13)
    Hnsw.buildIndex(spark, root, df.where(col("vec_id") < 100), dim = 16,
      m = 4, maxLevel = 3, planes = 3, tables = 2)
    // several small appends fragment the node table
    for (lo <- 100 to 140 by 10)
      Hnsw.addToIndex(spark, root,
        df.where(col("vec_id") >= lo && col("vec_id") < lo + 10))
    val queries = df.where(col("vec_id") < 5)
    def res() = Hnsw.searchIndex(spark, root, queries, k = 3,
      beam = 8, rounds = 2).collect().map(_.toSeq).toSet
    val before = res()
    Hnsw.compactIndex(spark, root)
    assert(res() == before)
    assert(IndexStore.read(spark, s"$root/nodes").count() == 150L)
    // the CLI face drives the same verb
    graft.RunMaintain.run(spark, Array("hnsw-compact", root))
    assert(res() == before)
  }

  test("search is deterministic: two runs return identical rows") {
    val df = randCorpus(150, 16, seed = 11)
    val q = df.where(col("vec_id") < 10)
    def run() = Hnsw.topK(q, df, k = 5, dim = 16, m = 6, maxLevel = 3,
      planes = 3, tables = 2, beam = 8, rounds = 2)
      .collect().map(_.toSeq).toSet
    assert(run() == run())
  }
}
