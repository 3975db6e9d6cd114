package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

class CorrelateSpec extends SparkSpecBase {
  import spark.implicits._

  private def gini(xs: Seq[Long]): (Long, Long, Long) =
    Correlate.giniPermille(
        xs.zipWithIndex.map { case (x, i) => (i.toLong, x) }.toDF("k", "x"),
        col("x"), col("k"))
      .as[(Long, Long, Long)].head()

  test("giniPermille: uniform distribution scores 0") {
    assert(gini(Seq(5L, 5L, 5L, 5L)) == ((4L, 20L, 0L)))
  }

  test("giniPermille: total concentration scores (n-1)/n") {
    // one key owns everything: G = (n-1)/n = 3/4 -> 750 permille
    assert(gini(Seq(0L, 0L, 0L, 10L)) == ((4L, 10L, 750L)))
  }

  test("giniPermille: hand case 1,2,3,4") {
    // ranks 1..4 ascending: sum(r*x) = 1+4+9+16 = 30
    // (2*30 - 5*10) * 1000 div (4*10) = 10000 div 40 = 250
    assert(gini(Seq(1L, 2L, 3L, 4L)) == ((4L, 10L, 250L)))
  }

  test("giniPermille: tie order among equal values cannot move the statistic") {
    // equal values take consecutive ranks whatever the tie column says;
    // sum(rank*x) over the tie group is invariant
    val a = Correlate.giniPermille(
      Seq((9L, 3L), (1L, 3L), (5L, 3L), (2L, 7L)).toDF("k", "x"),
      col("x"), col("k")).as[(Long, Long, Long)].head()
    val b = Correlate.giniPermille(
      Seq((1L, 3L), (5L, 3L), (9L, 3L), (2L, 7L)).toDF("k", "x"),
      col("x"), col("k")).as[(Long, Long, Long)].head()
    assert(a == b)
  }

  test("giniPermille: degenerate inputs (empty, all-zero) report 0") {
    assert(gini(Seq.empty) == ((0L, 0L, 0L)))
    assert(gini(Seq(0L, 0L)) == ((2L, 0L, 0L)))
  }
}
