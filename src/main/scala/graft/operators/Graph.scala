package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph operators for dedup pipelines: near-duplicate PAIRS (MinHash /
  * SimHash / Jaccard output) become duplicate GROUPS via weakly-connected
  * components, and each group keeps one representative.
  */
object Graph {

  /** Weakly-connected components by min-label propagation: every node ends
    * labeled with the smallest node id reachable from it. Returns
    * (id, component) for every node incident to an edge.
    *
    * Each round is one join + one min-aggregate (both shuffle on the node
    * id, so AQE handles skewed hubs); rounds needed = graph diameter,
    * which for near-dup graphs is tiny (duplicate clusters are dense and
    * small). For adversarial long-chain graphs the large-star/small-star
    * variant (alternating conditional joins, O(log n) rounds) is the
    * upgrade path; min-label keeps the per-round plan simpler and each
    * round's state is just (id, label).
    */
  def connectedComponents(edges: DataFrame, aCol: String, bCol: String,
      maxIters: Int = 50): DataFrame = {
    val sym = edges.select(col(aCol).as("src"), col(bCol).as("dst"))
      .unionByName(edges.select(col(bCol).as("src"), col(aCol).as("dst")))
      .distinct().persist()
    var labels = sym.select(col("src").as("id")).distinct()
      .withColumn("label", col("id")).persist()
    labels.count() // materialize before the loop re-reads it
    var changed = 1L
    var i = 0
    while (changed > 0 && i < maxIters) {
      val prop = sym.join(labels, sym("dst") === labels("id"))
        .select(sym("src").as("id"), col("label"))
      val next = labels.unionByName(prop)
        .groupBy("id").agg(min("label").as("label")).persist()
      changed = next.join(labels.withColumnRenamed("label", "__old"), "id")
        .where(col("label") =!= col("__old")).count()
      labels.unpersist()
      labels = next
      i += 1
    }
    sym.unpersist()
    labels
  }

  /** Collapse near-dup pairs into keep/drop decisions: every node incident
    * to a pair maps to its component's representative (the smallest id);
    * rows where `id != representative` are the drops. */
  def dedupByPairs(pairs: DataFrame, aCol: String, bCol: String): DataFrame =
    connectedComponents(pairs, aCol, bCol)
      .select(col("id"), col("label").as("representative"))
      .withColumn("keep", col("id") === col("representative"))
}
