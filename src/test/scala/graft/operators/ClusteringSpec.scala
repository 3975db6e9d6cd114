package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

class ClusteringSpec extends SparkSpecBase {
  import spark.implicits._

  private val seeds = Seq(
    (0L, Seq(1.0f, 0.0f)),   // x axis
    (1L, Seq(0.0f, 1.0f)))   // y axis

  test("assignToSeeds: cosine argmax with ascending-id tie-break") {
    val corpus = Seq(
      (10L, Seq(0.9f, 0.1f)),   // → seed 0
      (11L, Seq(0.1f, 0.9f)),   // → seed 1
      (12L, Seq(0.5f, 0.5f)),   // equidistant → smaller seed id (0)
      (13L, Seq(-1.0f, -0.9f))  // both negative; -0.9 > -1.0 → seed 1
    ).toDF("vec_id", "embedding")
    val out = Clustering.assignToSeeds(corpus, seeds, "embedding")
      .select("vec_id", "cluster_id").as[(Long, Long)].collect().toMap
    assert(out == Map(10L -> 0L, 11L -> 1L, 12L -> 0L, 13L -> 1L))
  }

  test("labelPurity: counts, majority label, integer permille, label tie-break") {
    val assigned = Seq(
      (0L, 1), (0L, 1), (0L, 2),          // cluster 0: 2x label 1, 1x label 2
      (1L, 5), (1L, 7)                    // cluster 1: tie → smaller label 5
    ).toDF("cluster_id", "label")
    val out = Clustering.labelPurity(assigned, "cluster_id", "label")
      .select("cluster_id", "n_vecs", "top_label", "top_n", "purity_permille")
      .as[(Long, Long, Int, Long, Long)].collect().sortBy(_._1).toSeq
    assert(out == Seq(
      (0L, 3L, 1, 2L, 666L),  // 2*1000 div 3
      (1L, 2L, 5, 1L, 500L)))
  }

  test("clusterOutliers: planted far point ranks as its cluster's worst") {
    val corpus = Seq(
      (10L, Seq(1.0f, 0.0f)),    // on the seed: cos 1
      (11L, Seq(0.9f, 0.1f)),    // near
      (12L, Seq(0.5f, 0.45f)),   // still seed 0, but far
      (13L, Seq(0.0f, 1.0f))     // seed 1 exactly
    ).toDF("vec_id", "embedding")
    val out = Clustering.clusterOutliers(corpus, seeds, "embedding",
        "vec_id", k = 1)
      .select("cluster_id", "vec_id").as[(Long, Long)].collect().toMap
    assert(out(0L) == 12L) // lowest cosine within cluster 0
    assert(out(1L) == 13L) // only member
    // k larger than the cluster returns the whole cluster
    val all = Clustering.clusterOutliers(corpus, seeds, "embedding",
      "vec_id", k = 10)
    assert(all.count() == 4)
  }

  test("every corpus vector lands in exactly one cluster") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val seedRows = emb.where(col("vec_id") < 4).orderBy("vec_id")
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1))).toSeq
    val assigned = Clustering.assignToSeeds(emb, seedRows, "embedding")
    assert(assigned.count() == emb.count())
    assert(assigned.where(col("cluster_id").isNull).count() == 0)
    // seeds assign to themselves (cos = 1 is the max)
    val self = assigned.where(col("vec_id") < 4)
      .select("vec_id", "cluster_id").as[(Long, Long)].collect()
    self.foreach { case (v, c) => assert(v == c, s"seed $v landed in $c") }
  }
}
