package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoders}
import org.apache.spark.sql.functions._

import graft.functions.{F, ScoredId, TopKByScore}

/** Approximate-nearest-neighbor search over an embedding column
  * (BASELINE.json north star; SURVEY.md §7.5).
  *
  * Baseline: brute-force cosine top-k — the *scalable* brute force: the
  * small query set is broadcast, the corpus is scanned once in parallel
  * (BroadcastNestedLoopJoin), and per-query top-k uses a bounded-buffer
  * aggregate ([[graft.functions.TopKByScore]]) whose map-side partial
  * keeps only O(k) candidates per query per partition — the shuffle moves
  * ~k·|queries|·|partitions| rows, never the full |corpus|×|queries|
  * scored set (a `row_number` window would shuffle everything).
  * Scale path: sign-random-projection LSH bucketing so each query only
  * scores its bucket's candidates.
  */
object Similarity {

  /** groupBy(query_id) top-k over (neighbor_id, score) with bounded
    * partial aggregation; emits (query_id, rank, neighbor_id, cos). */
  private[operators] def perQueryTopK(scored: DataFrame, k: Int): DataFrame = {
    val topk = udaf(new TopKByScore(k), Encoders.product[ScoredId])
    scored.groupBy("query_id")
      .agg(topk(col("neighbor_id"), col("cos")).as("nbrs"))
      .select(col("query_id"), posexplode(col("nbrs")).as(Seq("pos", "nbr")))
      .select(col("query_id"), (col("pos") + 1).cast("long").as("rank"),
        col("nbr.id").as("neighbor_id"), col("nbr.score").as("cos"))
  }

  /** Exact top-k neighbors per query vector by cosine similarity.
    * Output: (query_id, rank, neighbor_id, cos); ties broken by id for
    * determinism. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_v"))
    // spread: scan parallelism of the broadcast-nested-loop join equals the
    // corpus partition count — a single-split corpus would score on one core.
    val c = Par.spread(corpus).select(col(idCol).as("neighbor_id"), col(vecCol).as("c_v"))
    val scored = c.crossJoin(broadcast(q))
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", F.cosineSim(col("q_v"), col("c_v")))
      .select("query_id", "neighbor_id", "cos")
    perQueryTopK(scored, k)
  }

  /** LSH-bucketed ANN top-k: queries only score corpus vectors sharing
    * their sign-random-projection bucket in at least one of `tables`
    * independent bucketings. Recall < 1 by construction; `planes` trades
    * candidate-set size for recall, `tables` buys recall back.
    *
    * @param dim embedding width (schema constant — no data sniffing). */
  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int, dim: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      planes: Int = 16, tables: Int = 2, seed: Long = 42L): DataFrame = {
    // ONE corpus scan: every table's bucket comes from one projection (an
    // array of per-table SrpBucket values, posexploded to (table, bucket)),
    // and the broadcast bucket join runs once on (table, bucket). A
    // per-table loop would rescan + re-bucket the corpus `tables` times —
    // the scans are the cost at 100 TB, not the hashes.
    def exploded(df: DataFrame, id: String, vec: String): DataFrame =
      Dedup.withSrpBuckets(df, vecCol, planes, seed, dim, tables)
        .select(col(idCol).as(id), col(vecCol).as(vec),
          posexplode(col("__buckets")).as(Seq("__table", "__bucket")))
    val qb = exploded(queries, "query_id", "q_v")
    val cb = exploded(Par.spread(corpus), "neighbor_id", "c_v")
    // score BEFORE the cross-table dedup: cosine is map-side and identical
    // for a pair in every table, so max() dedups while the exchange moves
    // (query, neighbor, cos) scalars — not two vectors per candidate row.
    val scored = cb.join(broadcast(qb), Seq("__table", "__bucket"))
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", F.cosineSim(col("q_v"), col("c_v")))
      .groupBy("query_id", "neighbor_id").agg(max(col("cos")).as("cos"))
    perQueryTopK(scored, k)
  }
}
