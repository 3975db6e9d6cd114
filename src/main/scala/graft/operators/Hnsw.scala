package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.F

/** HNSW-style layered-graph ANN (Malkov & Yashunin 2016, arXiv:1603.09320)
  * re-shaped for BATCH construction on Spark — the graph-based member of
  * the ANN family next to LSH buckets, IVF cells, PQ codes, and binary
  * signatures (SURVEY §7.5). The literature's insert-one-point-at-a-time
  * algorithm is inherently sequential; what survives the translation to a
  * 1000-executor batch build is the STRUCTURE that makes HNSW work:
  *
  *  - **geometric layer assignment** — node level = trailing-zero count
  *    of an engine-portable [[graft.functions.PortableHash.mix64]] hash
  *    of the id (P(level ≥ l) = 2^-l, the paper's exponential decay),
  *    capped at `maxLevel`. Deterministic, so the SQL oracle recomputes
  *    every level bit for bit — no RNG state anywhere.
  *  - **a near-neighbor graph per layer** — edges at layer l connect
  *    nodes of level ≥ l to their top-`m` cosine neighbors among
  *    SRP-LSH bucket mates (the repo's standard candidate generator:
  *    banded, never all-pairs), so layer 0 is the dense navigable graph
  *    and upper layers are sparse expressways over the same metric.
  *  - **coarse-to-fine search** — greedy descent through the upper
  *    layers (beam 1) to a good entry region, then a bounded beam search
  *    (`beam`, `rounds`) over layer 0. Rounds are FIXED, not
  *    convergence-tested: every step is one broadcast-frontier join, and
  *    the whole search is (maxLevel + rounds) joins regardless of corpus
  *    size — which is also what makes the DuckDB oracle able to replay
  *    the search as a finite CTE chain.
  *
  * Scale shape: the build is one bucket-bounded candidate join + one
  * per-(layer, src) top-m window over candidate-sized partitions; the
  * graph is |corpus|·m·(avg level+1) rows, persistable via [[IndexStore]]
  * partitioned by layer (search prunes to the layers it touches). Search
  * broadcasts only the frontier (|queries|·beam rows) against the edge
  * table — the corpus is never rescanned after the entry-point
  * aggregate. Recall follows (m, beam, rounds) exactly as HNSW's
  * (M, efSearch); `hnsw_recall` measures it against brute force.
  */
object Hnsw {

  /** Geometric layer assignment: `level = min(maxLevel, ntz(mix64(id:salt)))`
    * — bit i of the splitmix64-finalized hash is a fair coin, so the
    * trailing-zero count is Geometric(1/2), the HNSW layer law. */
  def withLevel(df: DataFrame, idCol: String, maxLevel: Int,
      salt: String = "hnsw"): DataFrame = {
    require(maxLevel >= 1 && maxLevel <= 62, "maxLevel must be in 1..62")
    val h = F.mix64(concat(col(idCol).cast("string"), lit(s":$salt")))
    val level = (0 until maxLevel).foldRight(lit(maxLevel.toLong)) {
      case (i, rest) =>
        when(h.bitwiseAND(lit(1L << i)) =!= 0L, lit(i.toLong)).otherwise(rest)
    }
    df.withColumn("level", level)
  }

  /** The layered near-neighbor graph: `(layer, src, dst, cos)`, top-`m`
    * outgoing edges per node per layer, candidates from SRP-LSH bucket
    * mates across `tables` bucketings (both directions of every bucket
    * pair, so the graph is as symmetric as the top-m cut allows). A pair
    * appears at every layer 0..min(level(src), level(dst)) — upper
    * layers thin out by the geometric level law, not by a separate
    * parameter. Ties in the top-m cut break by (cos DESC, dst ASC). */
  def knnEdges(corpus: DataFrame, idCol: String, vecCol: String, dim: Int,
      m: Int = 6, maxLevel: Int = 3, planes: Int = 4, tables: Int = 4,
      seed: Long = 42L, salt: String = "hnsw"): DataFrame = {
    require(m >= 1, "m must be positive")
    val b = Dedup.withSrpBuckets(
        Par.spread(withLevel(corpus, idCol, maxLevel, salt)),
        vecCol, planes, seed, dim, tables)
      .select(col(idCol).as("id"), col(vecCol).as("v"), col("level"),
        posexplode(col("__buckets")).as(Seq("__table", "__bucket")))
    val a = b.select(col("id").as("src"), col("v").as("src_v"),
      col("level").as("__slv"), col("__table"), col("__bucket"))
    val c = b.select(col("id").as("dst"), col("v").as("dst_v"),
      col("level").as("__dlv"), col("__table"), col("__bucket"))
    // score before the cross-table dedup (the cosineNearDupPairsLsh
    // posture): the dedup exchange moves scalars, not two vectors
    val pairs = a.join(c, Seq("__table", "__bucket"))
      .where(col("src") =!= col("dst"))
      .withColumn("cos", F.cosineSim(col("src_v"), col("dst_v")))
      .groupBy("src", "dst")
      .agg(max("cos").as("cos"), first("__slv").as("__slv"),
        first("__dlv").as("__dlv"))
    val w = Window.partitionBy("layer", "src")
      .orderBy(col("cos").desc, col("dst").asc)
    pairs
      .select(col("src"), col("dst"), col("cos"),
        explode(sequence(lit(0L), least(col("__slv"), col("__dlv"))))
          .as("layer"))
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= m)
      .select(col("layer").cast("int").as("layer"), col("src"), col("dst"),
        col("cos"))
  }

  /** Coarse-to-fine search over a prebuilt edge table. Entry point =
    * the (level DESC, id ASC)-first corpus node — the deterministic
    * stand-in for HNSW's top-layer entry. Upper layers run greedy
    * (beam 1) steps; layer 0 runs `rounds` beam-`beam` expansions; the
    * answer is the final beam's top-`k` (beam ≥ k required), excluding
    * the query's own id. Output: (query_id, rank, neighbor_id, cos). */
  def searchTopK(queries: DataFrame, corpus: DataFrame, edges: DataFrame,
      k: Int, idCol: String = "vec_id", vecCol: String = "embedding",
      maxLevel: Int = 3, beam: Int = 8, rounds: Int = 2,
      salt: String = "hnsw"): DataFrame = {
    require(beam >= k, s"beam ($beam) must be >= k ($k)")
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_v"))
    val vecs = corpus.select(col(idCol).as("node_id"), col(vecCol).as("n_v"))
    val entry = withLevel(corpus, idCol, maxLevel, salt)
      .select(col(idCol).as("node_id"), col("level"))
      .orderBy(col("level").desc, col("node_id").asc).limit(1)
      .select("node_id")
    // (query_id, node_id) beams. Every step: expand the frontier's
    // outgoing edges at the step's layer, union the frontier itself
    // (greedy never moves to a worse node), re-score, keep the best b.
    // The frontier is the BROADCAST side of both joins — the edge and
    // vector tables are corpus-scale, the frontier is |queries|·beam.
    // Each step's result is localCheckpointed (the Graph-loop lineage
    // discipline): a step references its predecessor TWICE (union +
    // expand), so without the pin the plan tree doubles per step — the
    // first cut's static plan carried 2^steps copies of the early
    // stages (379 exchanges in the audit) and re-executed the frontier
    // per reference, the same exponential-inlining failure the oracle's
    // MATERIALIZED CTEs fix on the SQL side.
    def topB(fr: DataFrame, b: Int): DataFrame =
      vecs.join(broadcast(fr.distinct()), "node_id")
        .join(broadcast(q), "query_id")
        .withColumn("__cos", F.cosineSim(col("q_v"), col("n_v")))
        .withColumn("__rn", row_number().over(Window.partitionBy("query_id")
          .orderBy(col("__cos").desc, col("node_id").asc)))
        .where(col("__rn") <= b)
        .select("query_id", "node_id")
        .localCheckpoint()
    def expand(fr: DataFrame, layer: Int): DataFrame =
      edges.where(col("layer") === layer)
        .join(broadcast(fr), col("src") === col("node_id"))
        .select(col("query_id"), col("dst").as("node_id"))
    var frontier = q.select("query_id").crossJoin(broadcast(entry))
    for (l <- maxLevel to 1 by -1)
      frontier = topB(frontier.union(expand(frontier, l)), 1)
    for (_ <- 1 to rounds)
      frontier = topB(frontier.union(expand(frontier, 0)), beam)
    vecs.join(broadcast(frontier), "node_id")
      .join(broadcast(q), "query_id")
      .where(col("node_id") =!= col("query_id"))
      .withColumn("cos", F.cosineSim(col("q_v"), col("n_v")))
      .withColumn("rank", row_number().over(Window.partitionBy("query_id")
        .orderBy(col("cos").desc, col("node_id").asc)).cast("long"))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("node_id").as("neighbor_id"),
        col("cos"))
  }

  /** Build + search in one plan — the registered-query shape (the
    * persisted path below is the 100 TB deployment shape). */
  def topK(queries: DataFrame, corpus: DataFrame, k: Int, dim: Int,
      idCol: String = "vec_id", vecCol: String = "embedding", m: Int = 6,
      maxLevel: Int = 3, planes: Int = 4, tables: Int = 4, beam: Int = 8,
      rounds: Int = 2, seed: Long = 42L): DataFrame =
    searchTopK(queries, corpus,
      knnEdges(corpus, idCol, vecCol, dim, m, maxLevel, planes, tables, seed),
      k, idCol, vecCol, maxLevel, beam, rounds)

  /** Persist the layered graph under `root` via [[IndexStore]]'s
    * snapshot-committed layout, partitioned by layer so a probe's reads
    * prune to the layers it actually touches (upper layers are a few
    * percent of the files by the geometric law). Build once, serve many
    * — the IVF/TextIndex posture. */
  def buildIndex(spark: SparkSession, root: String, corpus: DataFrame,
      idCol: String = "vec_id", vecCol: String = "embedding", dim: Int = 64,
      m: Int = 6, maxLevel: Int = 3, planes: Int = 4, tables: Int = 4,
      seed: Long = 42L): Unit =
    IndexStore.rewriteWith(spark, root, partCol = Some("layer"))(
      () => (knnEdges(corpus, idCol, vecCol, dim, m, maxLevel, planes,
        tables, seed), Some(0 to maxLevel)))

  /** Search against a persisted graph: reads the committed edge
    * snapshot (all layers — the search touches every layer by
    * construction) and runs [[searchTopK]] over it. */
  def searchIndex(spark: SparkSession, root: String, queries: DataFrame,
      corpus: DataFrame, k: Int, idCol: String = "vec_id",
      vecCol: String = "embedding", maxLevel: Int = 3, beam: Int = 8,
      rounds: Int = 2): DataFrame =
    searchTopK(queries, corpus, IndexStore.read(spark, root), k, idCol,
      vecCol, maxLevel, beam, rounds)
}
