package graft.operators

import graft.SparkSpecBase

class GraphSpec extends SparkSpecBase {
  import spark.implicits._

  test("connected components: chains, stars, and isolated pairs") {
    // components: {1,2,3,4} (chain), {10,11,12} (star on 10), {20,21}
    val edges = Seq(
      (2L, 1L), (2L, 3L), (3L, 4L),
      (10L, 11L), (10L, 12L),
      (21L, 20L)).toDF("a", "b")
    val cc = Graph.connectedComponents(edges, "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(cc == Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L, 21L -> 20L))
  }

  test("dedupByPairs keeps exactly one representative per component") {
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 8L)).toDF("a", "b")
    val out = Graph.dedupByPairs(pairs, "a", "b")
      .as[(Long, Long, Boolean)].collect()
    assert(out.count(_._3) == 2) // one keeper per component
    assert(out.filter(_._3).map(_._1).toSet == Set(1L, 7L))
    // every row's representative is itself a kept row
    out.foreach { case (_, rep, _) =>
      assert(out.exists(r => r._1 == rep && r._3))
    }
  }
}
