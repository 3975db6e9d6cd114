package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.F

/** Approximate-nearest-neighbor search over an embedding column
  * (BASELINE.json north star; SURVEY.md §7.5).
  *
  * Baseline: brute-force cosine top-k — the *scalable* brute force: the
  * small query set is broadcast, the corpus is scanned once in parallel
  * (BroadcastNestedLoopJoin), and per-query top-k is a shuffle on query id
  * over k·|queries| rows only. Scale path: sign-random-projection LSH
  * bucketing so each query only scores its bucket's candidates.
  */
object Similarity {

  /** Exact top-k neighbors per query vector by cosine similarity.
    * Output: (query_id, neighbor_id, rank, cos); ties broken by id for
    * determinism. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_v"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("c_v"))
    val scored = c.crossJoin(broadcast(q))
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", F.cosineSim(col("q_v"), col("c_v")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("neighbor_id"), col("cos"))
  }

  /** LSH-bucketed ANN top-k: queries only score corpus vectors sharing
    * their sign-random-projection bucket. Recall < 1 by construction;
    * `planes` trades recall for candidate-set size. */
  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      planes: Int = 8, seed: Long = 42L): DataFrame = {
    val qb = Dedup.withSrpBucket(queries, vecCol, planes, seed)
      .select(col(idCol).as("query_id"), col(vecCol).as("q_v"), col("__bucket"))
    val cb = Dedup.withSrpBucket(corpus, vecCol, planes, seed)
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("c_v"), col("__bucket"))
    val scored = cb.join(broadcast(qb), "__bucket")
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", F.cosineSim(col("q_v"), col("c_v")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("neighbor_id"), col("cos"))
  }
}
