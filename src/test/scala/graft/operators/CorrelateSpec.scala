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

  private def trimmed(rows: Seq[(String, Long)]) =
    Correlate.trimmedMeanPerKey(rows.toDF("k", "v"), "k", col("v"))
      .as[(String, Long, Long, Option[Long], Option[Long], Option[Long])]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap

  test("trimmedMeanPerKey: 5/95 band over 1..20 keeps ranks 2..19") {
    val got = trimmed((1L to 20L).map(v => ("a", v)))
    // lo = 20*50 div 1000 = 1, hi = 20*950 div 1000 = 19 -> values 2..19
    // sum 189, mean*1000 = 189000 div 18 = 10500
    assert(got("a") == ((20L, 18L, Some(2L), Some(19L), Some(10500L))))
  }

  test("trimmedMeanPerKey: one outlier in ten is fully trimmed") {
    val got = trimmed(Seq.fill(9)(("a", 1L)) :+ (("a", 1000L)))
    // lo = 0, hi = 9 -> the nine 1s stay, the 1000 drops
    assert(got("a") == ((10L, 9L, Some(1L), Some(1L), Some(1000L))))
  }

  test("trimmedMeanPerKey: a value run partially overlapping the band") {
    val got = trimmed(Seq.fill(5)(("a", 5L)) ++ Seq.fill(5)(("a", 7L)))
    // band (0, 9]: all five 5s kept, four of five 7s kept
    // sum = 25 + 28 = 53; 53000 div 9 = 5888
    assert(got("a") == ((10L, 9L, Some(5L), Some(7L), Some(5888L))))
  }

  test("trimmedMeanPerKey: groups too small for the band report null mean") {
    val got = trimmed(Seq(("solo", 42L)))
    // n=1: lo = 0, hi = 0 -> empty band
    assert(got("solo") == ((1L, 0L, None, None, None)))
  }

  test("winsorizePerKey: outlier clamps to the band edge; tiny groups pass through") {
    // key a: nine 1s + one 1000 — the band keeps the nine 1s, so the
    // outlier clamps to hi_val = 1; key solo's band is empty → unchanged
    val rows = (1L to 9L).map(i => ("a", i, 1L)) ++
      Seq(("a", 10L, 1000L), ("solo", 1L, 42L))
    val got = Correlate.winsorizePerKey(rows.toDF("k", "id", "v"),
        "k", col("id"), col("v"))
      .as[(String, Long, Long, Long)].collect().toSet
    val want = (1L to 9L).map(i => ("a", i, 1L, 1L)).toSet ++
      Set(("a", 10L, 1000L, 1L), ("solo", 1L, 42L, 42L))
    assert(got == want)
  }

  test("winsorizePerKey: interior values untouched, both tails clamp") {
    // 20 values 1..20: band ranks (1, 19] → lo_val 2, hi_val 19
    val rows = (1L to 20L).map(i => ("b", i, i))
    val got = Correlate.winsorizePerKey(rows.toDF("k", "id", "v"),
        "k", col("id"), col("v"))
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._2 -> r._4).toMap
    assert(got(1L) == 2L && got(20L) == 19L && got(10L) == 10L &&
      got(2L) == 2L && got(19L) == 19L)
  }

  private def cramers(rows: Seq[(String, String)]) =
    Correlate.cramersV(rows.toDF("a", "b"), col("a"), col("b"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4),
        if (r.isNullAt(5)) None else Some(r.getLong(5)))).head

  test("cramersV: hand 2x2 chi-square; phi-squared matches") {
    // (x,p)x3 (x,q)x1 (y,p)x1 (y,q)x3: chi2 = 8*(9-1)^2/256 = 2 exactly,
    // V^2 = 2/8 = 0.25
    val rows = Seq.fill(3)(("x", "p")) ++ Seq(("x", "q")) ++
      Seq(("y", "p")) ++ Seq.fill(3)(("y", "q"))
    assert(cramers(rows) == ((8L, 2L, 2L, 1L, 2000000L, Some(250000L))))
  }

  test("cramersV: exact independence reads 0; single-level column reads NULL V") {
    val indep = Seq(("x", "p"), ("x", "q"), ("y", "p"), ("y", "q"))
    assert(cramers(indep) == ((4L, 2L, 2L, 1L, 0L, Some(0L))))
    val mono = Seq(("x", "p"), ("y", "p"), ("y", "p"))
    assert(cramers(mono) == ((3L, 2L, 1L, 0L, 0L, None)))
  }

  private def kappa(rows: Seq[(String, String)]) =
    Correlate.cohensKappa(rows.toDF("a", "b"), col("a"), col("b"))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        if (r.isNullAt(4)) None else Some(r.getLong(4)))).head

  test("cohensKappa: hand case, perfect, worse-than-chance floor, degenerate NULL") {
    // a=(x,x,y,y), b=(x,y,y,y): agree 3/4, pe = (2·1+2·3)/16 = 1/2,
    // kappa = (3/4 − 1/2)/(1/2) = 0.5
    assert(kappa(Seq(("x", "x"), ("x", "y"), ("y", "y"), ("y", "y"))) ==
      ((4L, 3L, Some(750000L), Some(500000L), Some(500000L))))
    // perfect agreement
    assert(kappa(Seq(("x", "x"), ("y", "y"))) ==
      ((2L, 2L, Some(1000000L), Some(500000L), Some(1000000L))))
    // total disagreement on symmetric margins: kappa = −1 exactly —
    // FLOOR division must carry the sign (truncation would read −999999
    // on a near-miss; here the division is exact either way, the
    // three-row case below is the floor-sensitive one)
    assert(kappa(Seq(("x", "y"), ("y", "x"))) ==
      ((2L, 0L, Some(0L), Some(500000L), Some(-1000000L))))
    // floor-sensitive negative: a=(x,x,y), b=(y,x,x) → agree 1, N=3,
    // S = 2·2+1·1 = 5, kappa = (3−5)/(9−5) = −0.5 → −500000 exact;
    // a=(x,y,y), b=(y,y,x) → agree 1, S = 1·1+2·2 = 5, same; make it
    // inexact: a=(x,x,x,y), b=(y,x,x,x): agree 2, N=4, S = 3·3+1·1 = 10,
    // kappa = (8−10)/(16−10) = −1/3 → floor(−333333.33) = −333334
    assert(kappa(Seq(("x", "y"), ("x", "x"), ("x", "x"), ("y", "x")))._5 ==
      Some(-333334L))
    // both single-level: pe = 1 → NULL kappa
    assert(kappa(Seq(("x", "x"), ("x", "x"))) ==
      ((2L, 2L, Some(1000000L), Some(1000000L), None)))
  }

  test("cramersV: an id-like column fails fast instead of OOMing the driver") {
    // 12 distinct (a,b) cells against maxCells=10: the limit-capped
    // collect trips the guard with a clear message — the round-12
    // version collected the full table unguarded
    val idLike = (1 to 12).map(i => (s"id$i", "x"))
    val e = intercept[IllegalArgumentException] {
      Correlate.cramersV(idLike.toDF("a", "b"), col("a"), col("b"),
        maxCells = 10)
    }
    assert(e.getMessage.contains("distinct (a,b) cells"))
    // a bounded table under the same cap still computes
    val ok = Correlate.cramersV(
      Seq(("x", "p"), ("y", "q")).toDF("a", "b"), col("a"), col("b"),
      maxCells = 10).collect()
    assert(ok.length == 1)
  }
}
