package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.F

/** Cluster-based corpus analytics (SemDeDup/DataComp-style curation works
  * per cluster: prune near-duplicates within clusters, balance mixtures
  * across them, grade cluster coherence before keeping it).
  *
  * Assignment here is nearest-SEED: cluster centers are literal vectors
  * chosen deterministically (sampled corpus members, or a trained
  * [[Ivf]] centroid table) and compiled INTO the assignment expression —
  * so assignment is a per-row argmax in one projection: zero shuffle,
  * zero join, scan-stage only at 100 TB. The seed set is driver metadata
  * (nSeeds×dim doubles), the same bounded-collect contract as the IVF
  * centroid table.
  */
object Clustering {

  /** Append `cluster_id`: the seed with the highest cosine similarity to
    * `vecCol` (ties broken by ascending seed id — a total order, so
    * assignment is deterministic and engine-reproducible given the
    * bit-exact cosine kernel of [[graft.functions.F.cosineSim]]). */
  def assignToSeeds(corpus: DataFrame, seeds: Seq[(Long, Seq[Float])],
      vecCol: String, out: String = "cluster_id",
      scoreOut: String = ""): DataFrame = {
    require(seeds.nonEmpty, "need at least one seed vector")
    // array_min over (negated cosine, seed id) structs = lexicographic
    // argmax with ascending-id tie-break; negation is a sign flip (exact).
    val cands = seeds.map { case (cid, vec) =>
      struct((-F.cosineSim(col(vecCol), typedlit(vec))).as("__neg_cos"),
        lit(cid).as("__cid"))
    }
    val best = array_min(array(cands: _*))
    val assigned = corpus.withColumn(out, best.getField("__cid"))
    if (scoreOut.isEmpty) assigned
    else assigned.withColumn(scoreOut, -best.getField("__neg_cos"))
  }

  /** Per-cluster outliers: the `k` members FARTHEST from their own seed
    * (lowest cosine; ties on ascending id) — what cluster-level curation
    * prunes (noise, mislabeled points, mode mixtures) before trusting a
    * cluster. Assignment stays scan-stage; the per-cluster top-k is one
    * bounded window over the (cluster, score) rows. Output:
    * (idCol, clusterCol, cos_to_seed). */
  def clusterOutliers(corpus: DataFrame, seeds: Seq[(Long, Seq[Float])],
      vecCol: String, idCol: String, k: Int): DataFrame = {
    val assigned = assignToSeeds(corpus, seeds, vecCol,
      scoreOut = "cos_to_seed")
    Dedup.topKPerKey(assigned, k, Seq("cluster_id"),
        Seq(col("cos_to_seed").asc, col(idCol).asc))
      .select(col(idCol), col("cluster_id"), col("cos_to_seed"))
  }

  /** Per-cluster label-purity stats over an assigned corpus:
    * (cluster_id, n_vecs, top_label, top_n, purity_permille) — the
    * coherence signal cluster-level curation filters on. Integer-exact
    * (permille via integer div); top label ties break on the smaller
    * label. Two slim partial-aggregable aggregates — corpus rows are
    * reduced to (cluster, label) counts map-side before any exchange. */
  def labelPurity(assigned: DataFrame, clusterCol: String,
      labelCol: String): DataFrame = {
    val counts = assigned.groupBy(col(clusterCol), col(labelCol).as("__label"))
      .agg(count(lit(1)).as("__n"))
    counts.groupBy(col(clusterCol))
      .agg(sum("__n").as("n_vecs"),
        min(struct((-col("__n")).as("__neg_n"), col("__label"))).as("__top"))
      .select(col(clusterCol), col("n_vecs"),
        col("__top.__label").as("top_label"),
        (-col("__top.__neg_n")).as("top_n"))
      .withColumn("purity_permille", expr("top_n * 1000 div n_vecs"))
  }
}
