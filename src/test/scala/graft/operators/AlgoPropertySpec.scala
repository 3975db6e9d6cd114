package graft.operators

import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSpecBase

/** Property tests for the round-11 driver-algorithm operators: the
  * invariants hold for ANY input, not just the hand cases. Spark work
  * inside forAll is kept tiny (collected inputs, small graphs). */
class AlgoPropertySpec extends SparkSpecBase {
  import spark.implicits._

  private def run(prop: Prop, n: Int = 25): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(res.passed, res.status.toString)
  }

  // --- waterfillBudgets -------------------------------------------------

  private val availGen: Gen[List[(String, Long, Long)]] =
    Gen.choose(1, 7).flatMap(n => Gen.listOfN(n, for {
      a <- Gen.choose(0L, 5000L)
      w <- Gen.choose(0L, 9L)
    } yield (a, w))).map(_.zipWithIndex.map { case ((a, w), i) =>
      (s"s$i", a, w)
    })

  test("property: waterfill never over-allocates, caps exactly, respects zero weight") {
    run(Prop.forAll(availGen, Gen.choose(0L, 20000L)) { (rows, budget) =>
      val out = Sampling.waterfillBudgets(
          rows.map(r => (r._1, r._2)).toDF("key", "avail"),
          rows.map(r => r._1 -> r._3).toMap, budget)
        .as[(String, Long, Long, Long, Boolean)].collect()
      val byKey = out.map(r => r._1 -> r).toMap
      val total = out.map(_._4).sum
      (total <= budget) &&
        out.forall { case (_, avail, w, alloc, capped) =>
          alloc >= 0 && alloc <= avail &&
            (!capped || alloc == avail) &&      // capped = filled exactly
            (w != 0L || alloc == 0L)            // zero weight gets zero
        } &&
        // if every positive-weight source capped, total = what they hold
        (out.exists(r => r._3 > 0 && !r._5) ||
          total == out.filter(_._3 > 0).map(_._2).sum.min(budget) ||
          out.forall(_._3 == 0L)) &&
        byKey.size == rows.size
    })
  }

  test("property: waterfill with ample budget fills every weighted source") {
    run(Prop.forAll(availGen) { rows =>
      val out = Sampling.waterfillBudgets(
          rows.map(r => (r._1, r._2)).toDF("key", "avail"),
          rows.map(r => r._1 -> r._3).toMap,
          budget = rows.map(_._2).sum * 10 + 1)
        .as[(String, Long, Long, Long, Boolean)].collect()
      out.forall { case (_, avail, w, alloc, _) =>
        if (w > 0) alloc == avail else alloc == 0L
      }
    }, n = 15)
  }

  // --- kCore ------------------------------------------------------------

  private val graphGen: Gen[List[(Long, Long)]] =
    Gen.choose(0, 40).flatMap(m => Gen.listOfN(m, for {
      a <- Gen.choose(0L, 11L)
      b <- Gen.choose(0L, 11L)
    } yield (a, b)))

  test("property: a converged k-core is a fixpoint with every degree >= k") {
    run(Prop.forAll(graphGen, Gen.choose(2, 4)) { (edges, k) =>
      val df = edges.toDF("a", "b")
      // 12 nodes converge well within 12 rounds
      val core = Graph.kCore(df, "a", "b", k, rounds = 12)
        .as[(Long, Long)].collect().toMap
      val canon = edges.map(e => (math.min(e._1, e._2), math.max(e._1, e._2)))
        .filter(e => e._1 != e._2).toSet
      // recompute degrees within the surviving node set: must equal the
      // reported degrees and all clear k (fixpoint witness)
      val within = canon.filter(e => core.contains(e._1) && core.contains(e._2))
      val deg = within.toSeq.flatMap(e => Seq(e._1, e._2))
        .groupBy(identity).map { case (n, xs) => n -> xs.size.toLong }
      core.forall { case (n, d) => deg.getOrElse(n, 0L) == d && d >= k }
    }, n = 20)
  }

  // --- triangleCount ----------------------------------------------------

  test("property: degree-ordered triangle count equals the naive census") {
    run(Prop.forAll(graphGen) { edges =>
      val canon = edges.map(e => (math.min(e._1, e._2), math.max(e._1, e._2)))
        .filter(e => e._1 != e._2).toSet
      val naive = (for {
        (a, b) <- canon; c <- 0L to 11L
        if b < c && canon.contains((b, c)) && canon.contains((a, c))
      } yield (a, b, c)).size.toLong
      Graph.triangleCount(edges.toDF("a", "b"), "a", "b")
        .as[Long].head() == naive
    }, n = 20)
  }
}
