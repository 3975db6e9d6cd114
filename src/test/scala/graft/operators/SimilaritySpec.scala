package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** Reciprocal-rank fusion (Similarity.rrfFuse): hand-computed integer
  * contributions, the null-rank (absent-from-one-list) path, tie
  * determinism, and the bounded top-k. The retrieval legs themselves
  * (bruteForceTopK, bm25TopK) are covered by IvfSpec/PqSpec and the
  * driver oracle gate. */
class SimilaritySpec extends SparkSpecBase {
  import spark.implicits._

  private def fused(bm: Seq[(Long, Long, Long)], an: Seq[(Long, Long, Long)],
      k: Int = 10) =
    Similarity.rrfFuse(Seq(
        "bm25" -> bm.toDF("query_id", "id", "rank"),
        "ann" -> an.toDF("query_id", "id", "rank")), k)
      .orderBy("query_id", "rrf_micro")

  private def randCorpus(n: Int, dim: Int, seed: Int = 7) = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map(i =>
      (i.toLong, Array.fill(dim)(rnd.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding")
  }

  test("lshTopK / binaryRerankTopK recall floors are met and binding") {
    // VERDICT r13 #3 twin audit: the ann_lsh / ann_binary gates mirror
    // the algorithm in SQL, so they cannot catch a recall regression.
    // Measured on the deterministic seeded corpus: LSH (planes=4,
    // tables=4) 0.66 vs degenerate (planes=12, tables=1) 0.0; binary
    // rerank (candidates=100 of 300) 0.94 vs candidates=10 0.34. The
    // degenerate assertions prove the floors bind.
    val df = randCorpus(300, 16).localCheckpoint()
    val queries = df.where(col("vec_id") < 20)
    val exact = Similarity.bruteForceTopK(queries, df, k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    def recall(got: org.apache.spark.sql.DataFrame): Double =
      got.select("query_id", "neighbor_id").as[(Long, Long)].collect()
        .toSet.intersect(exact).size.toDouble / exact.size
    val lsh = recall(Similarity.lshTopK(queries, df, k = 5, dim = 16,
      planes = 4, tables = 4))
    assert(lsh >= 0.55, s"LSH recall@5 regressed below the 0.55 floor: $lsh")
    val lshDegenerate = recall(Similarity.lshTopK(queries, df, k = 5,
      dim = 16, planes = 12, tables = 1))
    assert(lshDegenerate < 0.55,
      s"LSH floor not binding — degenerate knobs read $lshDegenerate")
    val bin = recall(Similarity.binaryRerankTopK(queries, df, k = 5,
      dim = 16, candidates = 100))
    assert(bin >= 0.85, s"binary recall@5 regressed below 0.85: $bin")
    val binDegenerate = recall(Similarity.binaryRerankTopK(queries, df,
      k = 5, dim = 16, candidates = 10))
    assert(binDegenerate < 0.85,
      s"binary floor not binding — degenerate knobs read $binDegenerate")
  }

  test("rrfFuse: hand-computed integer contributions and overlap ranking") {
    // q1: bm25 = [A, B], ann = [B, C]. With k=60, scale=1e6:
    //   A = 1000000 div 61 = 16393
    //   B = 1000000 div 62 + 1000000 div 61 = 16129 + 16393 = 32522
    //   C = 1000000 div 62 = 16129
    val rows = fused(
        bm = Seq((1L, 100L, 1L), (1L, 101L, 2L)),
        an = Seq((1L, 101L, 1L), (1L, 102L, 2L)))
      .select("doc_id", "rank_bm25", "rank_ann", "rrf_micro")
      .as[(Long, Option[Long], Option[Long], Long)].collect().toSet
    assert(rows == Set(
      (100L, Some(1L), None, 16393L),
      (101L, Some(2L), Some(1L), 32522L),
      (102L, None, Some(2L), 16129L)))
  }

  test("rrfFuse: a query present in only one list fuses rank-preserving") {
    // q3 has no bm25 rows at all (the all-common-terms query): its fused
    // order must equal the ann order, every rank_bm25 null.
    val out = fused(
        bm = Seq((1L, 100L, 1L)),
        an = Seq((3L, 7L, 1L), (3L, 8L, 2L), (3L, 9L, 3L)))
      .where(col("query_id") === 3L)
      .orderBy(col("rrf_micro").desc)
      .select("doc_id", "rank_bm25")
      .as[(Long, Option[Long])].collect().toSeq
    assert(out == Seq((7L, None), (8L, None), (9L, None)))
  }

  test("rrfFuse: equal-contribution ties break by doc_id and k bounds output") {
    // Two docs in mirror positions get identical sums; the cut at k=1
    // must keep the smaller doc_id deterministically.
    val out = fused(
        bm = Seq((1L, 200L, 1L), (1L, 105L, 2L)),
        an = Seq((1L, 105L, 1L), (1L, 200L, 2L)), k = 1)
      .select("doc_id").as[Long].collect().toSeq
    assert(out == Seq(105L))
  }

  test("retrievalEval: hand-computed MRR/hits/recall incl. the no-relevant path") {
    val emb = Seq(
      (0L, Array(1.0f, 0.0f), 1),   // query: label 1
      (1L, Array(0.9f, 0.1f), 2),   // nearest, irrelevant
      (2L, Array(0.8f, 0.2f), 1),   // 2nd, relevant
      (3L, Array(0.0f, 1.0f), 1),   // cos 0 — outside top-3
      (4L, Array(-1.0f, 0.0f), 2),  // outside top-3
      (5L, Array(0.5f, 0.5f), 9)    // query: singleton label; 3rd for q0 (cos .707)
    ).toDF("vec_id", "embedding", "label")
    val out = Similarity.retrievalEval(
        emb.where(col("vec_id").isin(0L, 5L)), emb, k = 3)
      .select("query_id", "first_rel", "rr_micro", "hits", "n_rel", "recall_permille")
      .as[(Long, Option[Long], Long, Long, Long, Long)].collect().toSet
    assert(out == Set(
      // q0: top-3 = [1, 2, 5]; first relevant at rank 2, 1 hit,
      // n_rel = 2 ⇒ recall = 1000·1 div min(3,2) = 500
      (0L, Some(2L), 500000L, 1L, 2L, 500L),
      // q5: singleton label — nothing relevant anywhere
      (5L, None, 0L, 0L, 0L, 0L)))
  }

  test("rrfFuse: three lists sum all contributions") {
    val l = Seq((1L, 5L, 1L)).toDF("query_id", "id", "rank")
    val out = Similarity.rrfFuse(Seq("a" -> l, "b" -> l, "c" -> l), k = 5)
      .select("rrf_micro").as[Long].collect().toSeq
    assert(out == Seq(3L * (1000000L / 61L)))
  }
}
