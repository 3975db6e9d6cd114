package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** The bounded-buffer top-k aggregator must agree with global sort-take
  * regardless of how the input is split across partial buffers
  * (property-style over seeded random inputs). */
class TopKSpec extends AnyFunSuite {

  private def reference(xs: Seq[ScoredId], k: Int): Seq[ScoredId] =
    xs.sortBy(n => (-n.score, n.id)).take(k)

  test("reduce+merge+finish == sort-take for any split") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 200) {
      val n = rnd.nextInt(60)
      val xs = Seq.fill(n)(ScoredId(rnd.nextInt(50).toLong, rnd.nextInt(200) - 100.0))
      val k = 1 + rnd.nextInt(8)
      val cut = if (n == 0) 0 else rnd.nextInt(n + 1)
      val agg = new TopKByScore(k)
      val (l, r) = xs.splitAt(cut)
      val bl = l.foldLeft(agg.zero)(agg.reduce)
      val br = r.foldLeft(agg.zero)(agg.reduce)
      assert(agg.finish(agg.merge(bl, br)) == reference(xs, k),
        s"n=$n k=$k cut=$cut")
    }
  }

  test("buffer stays bounded at O(k)") {
    val agg = new TopKByScore(3)
    val big = (1 to 1000).map(i => ScoredId(i.toLong, i.toDouble))
    val buf = big.foldLeft(agg.zero)(agg.reduce)
    assert(buf.items.length < 12) // compacts at 4k
    assert(agg.finish(buf) == reference(big, 3))
  }
}
