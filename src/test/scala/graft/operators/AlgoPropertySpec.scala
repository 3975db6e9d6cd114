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

  // --- round-12 ops -----------------------------------------------------

  import org.apache.spark.sql.functions.col

  private def luhnRef(s: String): Boolean = {
    val sum = s.reverse.map(_ - '0').zipWithIndex.map { case (d, i) =>
      if (i % 2 == 1) { val t = d * 2; if (t > 9) t - 9 else t } else d
    }.sum
    sum % 10 == 0
  }

  test("property: luhnValid matches a reference mod-10 fold") {
    val numGen = Gen.choose(13, 19).flatMap(n =>
      Gen.listOfN(n, Gen.choose(0, 9)).map(_.mkString))
    run(Prop.forAll(Gen.listOfN(8, numGen)) { nums =>
      val got = nums.toDF("n")
        .select(col("n"), TextAnalysis.luhnValid(col("n")))
        .as[(String, Boolean)].collect().toMap
      nums.forall(n => got(n) == luhnRef(n))
    }, n = 15)
  }

  test("property: robotsAllowed implements RFC 9309 precedence (no wildcards)") {
    // wildcard/$ interplay is pinned by hand cases in WebSpec; the
    // property sweeps plain prefixes + the end anchor against a direct
    // reference: longest matching pattern wins, Allow wins length ties.
    val seg = Gen.oneOf("a", "b", "ab", "c")
    val patGen = for {
      n <- Gen.choose(1, 3)
      segs <- Gen.listOfN(n, seg)
      anchor <- Gen.oneOf("", "$")
    } yield "/" + segs.mkString("/") + anchor
    val ruleGen = for {
      allow <- Gen.oneOf(true, false); p <- patGen
    } yield Web.RobotRule(allow, p)
    val pathGen = Gen.choose(1, 4).flatMap(n =>
      Gen.listOfN(n, seg).map("/" + _.mkString("/")))
    def ref(path: String, rules: Seq[Web.RobotRule]): Boolean = {
      val ms = rules.filter { r =>
        if (r.pattern.endsWith("$")) path == r.pattern.dropRight(1)
        else path.startsWith(r.pattern)
      }
      ms.isEmpty || ms.maxBy(r => (r.pattern.length, r.allow)).allow
    }
    run(Prop.forAll(Gen.listOf(ruleGen), Gen.listOfN(6, pathGen)) {
      (rules, paths) =>
        val got = paths.toDF("p")
          .select(col("p"), Web.robotsAllowed(col("p"), rules))
          .as[(String, Boolean)].collect().toMap
        paths.forall(p => got(p) == ref(p, rules))
    }, n = 20)
  }

  test("property: rankBlend ranks are permutations ordered by (value, id)") {
    val rowsGen = Gen.choose(1, 12).flatMap(n => Gen.listOfN(n, for {
      a <- Gen.choose(0L, 5L); b <- Gen.choose(0L, 5L)
    } yield (a, b))).map(_.zipWithIndex.map { case ((a, b), i) =>
      (i.toLong, a, b) })
    run(Prop.forAll(rowsGen) { rows =>
      val out = Correlate.rankBlend(rows.toDF("id", "a", "b"), "id",
          Seq(col("a"), col("b")))
        .as[(Long, Long, Long, Long)].collect()
      val n = rows.size.toLong
      val perm = (1L to n).toSet
      out.map(_._2).toSet == perm && out.map(_._3).toSet == perm &&
        out.map(_._4).sum == n * (n + 1) &&
        // the rank-1..n assignment follows the documented total order
        out.sortBy(_._2).map(_._1).sameElements(
          rows.sortBy(r => (r._2, r._1)).map(_._1))
    }, n = 20)
  }

  test("property: topicClassify equals the reference linear scorer") {
    val terms = Vector("cat", "dog", "tax", "ox")
    val lexGen = Gen.choose(1, 6).flatMap(k => Gen.listOfN(k, for {
      t <- Gen.oneOf(terms); p <- Gen.oneOf("p1", "p2", "p3")
      w <- Gen.choose(1L, 9L)
    } yield (t, p, w)))
    val docGen = Gen.choose(0, 6)
      .flatMap(n => Gen.listOfN(n, Gen.oneOf(terms ++ Vector("zz", "q"))))
      .map(_.mkString(" "))
    run(Prop.forAll(lexGen, Gen.listOfN(4, docGen)) { (lex, texts) =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val got = TextAnalysis
        .topicClassify(docs.toDF("doc_id", "text"), "doc_id", "text", lex)
        .as[(Long, String, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      docs.forall { case (id, text) =>
        val toks = text.split(" ").filter(_.nonEmpty)
        val scores = lex.map(_._2).distinct.map { p =>
          p -> toks.map(tok =>
            lex.filter(e => e._1 == tok && e._2 == p).map(_._3).sum).sum
        }.filter(_._2 > 0)
        val exp =
          if (scores.isEmpty) ("other", 0L)
          else scores.sortBy { case (p, sc) => (-sc, p) }.head
        got(id) == exp
      }
    }, n = 20)
  }

  test("property: contrastivePairs matches the ring-rotation reference") {
    val tableGen = for {
      nd <- Gen.choose(1, 6)
      sizes <- Gen.listOfN(nd, Gen.choose(1, 4))
    } yield sizes.zipWithIndex.flatMap { case (sz, d) =>
      (0 until sz).map(c => (d.toLong, c.toLong, s"t${d}_$c"))
    }
    run(Prop.forAll(tableGen, Gen.choose(1, 4)) { (rows, buckets) =>
      val got = TextAnalysis.contrastivePairs(
          rows.toDF("doc_id", "chunk_id", "chunk_text"), buckets = buckets)
        .as[(Long, Long, String, String, Long, String)].collect().toSet
      val text = rows.map(r => (r._1, r._2) -> r._3).toMap
      val docs = rows.filter(_._2 == 0L).map(_._1).distinct
      val ring = docs.groupBy(d => (d * 31 + 17) % buckets)
        .values.flatMap { ds =>
          val s = ds.sorted
          s.zip(s.tail :+ s.head) // next-in-bucket, wrapping
        }.filter(p => p._1 != p._2).toMap
      val exp = (for {
        (d, c, t) <- rows
        pos <- text.get((d, c + 1))
        nd <- ring.get(d)
      } yield (d, c, t, pos, nd, text((nd, 0L)))).toSet
      got == exp
    }, n = 20)
  }
}
