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

  test("large-star/small-star matches min-label on a long chain") {
    // a 30-node chain: diameter 29 — the shape that punishes min-label
    val chain = (1L until 30L).map(i => (i, i + 1)).toDF("a", "b")
    val star = Graph.connectedComponentsStar(chain, "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(star.keySet == (1L to 30L).toSet)
    assert(star.values.toSet == Set(1L))
  }

  test("property: star and min-label variants agree on random graphs") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val edgeGen = Gen.listOfN(12,
      Gen.zip(Gen.choose(0L, 19L), Gen.choose(0L, 19L)))
      .map(_.filter(e => e._1 != e._2)).suchThat(_.nonEmpty)
    val prop = Prop.forAll(edgeGen) { es =>
      val df = es.toDF("a", "b")
      val a = Graph.connectedComponents(df, "a", "b")
        .as[(Long, Long)].collect().toMap
      val b = Graph.connectedComponentsStar(df, "a", "b")
        .as[(Long, Long)].collect().toMap
      a == b
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
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
