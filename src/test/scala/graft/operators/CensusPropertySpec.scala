package graft.operators

import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSpecBase

/** Property tests for the round-12 census/monitor tier: each operator's
  * distributed formulation equals a naive in-memory BigInt reference on
  * ANY input — in particular, zipf_bands' run-interval arithmetic equals
  * per-type rank materialization, and ksVsCorpus's two-candidate sup
  * equals the full-grid CDF sweep it avoids. Spark work inside forAll is
  * kept tiny (a few rows per sample). */
class CensusPropertySpec extends SparkSpecBase {
  import spark.implicits._

  private def run(prop: Prop, n: Int = 15): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(res.passed, res.status.toString)
  }

  private val word: Gen[String] =
    Gen.oneOf("a", "b", "c", "d", "e", "aa", "bb")

  private val corpusGen: Gen[List[(String, String)]] =
    Gen.choose(1, 6).flatMap(nd => Gen.listOfN(nd, for {
      src <- Gen.oneOf("s0", "s1", "s2")
      ws <- Gen.choose(0, 10).flatMap(k => Gen.listOfN(k, word))
    } yield (src, ws.mkString(" "))))

  // --- yuleK ------------------------------------------------------------

  test("property: yuleK equals the naive BigInt spectrum computation") {
    run(Prop.forAll(corpusGen) { docs =>
      val got = TextAnalysis.yuleK(docs.toDF("source", "text"),
          "source", "text")
        .as[(String, Long, Long, Long, Long)].collect().toSet
      val want = docs.groupBy(_._1).flatMap { case (k, ds) =>
        val toks = ds.flatMap(_._2.split(" ", -1)).filter(_.nonEmpty)
        if (toks.isEmpty) None
        else {
          val c = toks.groupBy(identity).map { case (_, g) => g.size.toLong }
          val n = toks.size.toLong
          val s2 = c.map(x => BigInt(x) * x).sum
          Some((k, n, c.size.toLong, s2.toLong,
            ((s2 - n) * 10000 / (BigInt(n) * n)).toLong))
        }
      }.toSet
      got == want
    })
  }

  // --- zipfBands --------------------------------------------------------

  test("property: zipfBands run-interval arithmetic equals per-type ranks") {
    run(Prop.forAll(corpusGen) { docs =>
      val got = TextAnalysis.zipfBands(docs.map(_._2).toDF("text"), "text")
        .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
      val toks = docs.flatMap(_._2.split(" ", -1)).filter(_.nonEmpty)
      val want =
        if (toks.isEmpty) Set.empty[(Long, Long, Long, Long, Long, Long)]
        else {
          val freq = toks.groupBy(identity).map { case (w, g) =>
            (w, g.size.toLong)
          }.toList
          val ranked = freq.sortBy { case (w, c) => (-c, w) }.zipWithIndex
            .map { case ((_, c), i) =>
              val rank = i + 1L
              (63 - java.lang.Long.numberOfLeadingZeros(rank), c)
            }
          ranked.groupBy(_._1).map { case (band, g) =>
            (band.toLong, 1L << band, g.size.toLong, g.map(_._2).sum,
              g.map(_._2).max, g.map(_._2).min)
          }.toSet
        }
      got == want
    })
  }

  // --- ksVsCorpus -------------------------------------------------------

  private val ksGen: Gen[List[(String, Long)]] =
    Gen.choose(1, 12).flatMap(n => Gen.listOfN(n, for {
      k <- Gen.oneOf("A", "B", "C")
      v <- Gen.choose(0L, 6L)
    } yield (k, v)))

  test("property: ksVsCorpus two-candidate sup equals the full-grid sweep") {
    run(Prop.forAll(ksGen) { rows =>
      val got = Validate.ksVsCorpus(rows.toDF("src", "v"),
          "src", org.apache.spark.sql.functions.col("v"))
        .as[(String, Long, Long)].collect().toSet
      val n = rows.size.toLong
      val grid = rows.map(_._2).distinct.sorted
      val want = rows.groupBy(_._1).map { case (k, rs) =>
        val nk = rs.size.toLong
        val gap = grid.map { x =>
          val cumK = rs.count(_._2 <= x).toLong
          val g = rows.count(_._2 <= x).toLong
          (BigInt(cumK) * n - BigInt(g) * nk).abs
        }.max
        (k, nk, (gap * 1000 / (BigInt(nk) * n)).toLong)
      }.toSet
      got == want
    })
  }

  // --- two-slice monitors -----------------------------------------------

  private val sliceGen: Gen[List[(String, Long, Boolean)]] =
    Gen.choose(1, 14).flatMap(n => Gen.listOfN(n, for {
      k <- Gen.oneOf("A", "B")
      v <- Gen.choose(0L, 5L)
      cur <- Gen.oneOf(true, false)
    } yield (k, v, cur)))

  test("property: ksTwoSlice equals the brute-force sup over a dense grid") {
    run(Prop.forAll(sliceGen) { rows =>
      val got = Validate.ksTwoSlice(rows.toDF("k", "v", "cur"), "k",
          org.apache.spark.sql.functions.col("v"),
          org.apache.spark.sql.functions.col("cur"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getLong(3)))).toSet
      val want = rows.groupBy(_._1).map { case (k, rs) =>
        val cur = rs.filter(_._3).map(_._2)
        val ref = rs.filterNot(_._3).map(_._2)
        val (na, nb) = (cur.size.toLong, ref.size.toLong)
        val ks = if (na == 0 || nb == 0) None
        else Some(((0L to 6L).map { x =>
          (BigInt(cur.count(_ <= x)) * nb - BigInt(ref.count(_ <= x)) * na).abs
        }.max * 1000 / (BigInt(na) * nb)).toLong)
        (k, na, nb, ks)
      }.toSet
      got == want
    })
  }

  test("property: rankSumAuc equals the all-pairs comparison count") {
    run(Prop.forAll(sliceGen) { rows =>
      val got = Validate.rankSumAuc(rows.toDF("k", "v", "cur"), "k",
          org.apache.spark.sql.functions.col("v"),
          org.apache.spark.sql.functions.col("cur"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getLong(3)))).toSet
      val want = rows.groupBy(_._1).map { case (k, rs) =>
        val cur = rs.filter(_._3).map(_._2)
        val ref = rs.filterNot(_._3).map(_._2)
        val (na, nb) = (cur.size.toLong, ref.size.toLong)
        val auc = if (na == 0 || nb == 0) None
        else {
          val u2 = (for (a <- cur; b <- ref)
            yield if (a > b) 2L else if (a == b) 1L else 0L).sum
          Some((BigInt(u2) * 1000 / (2 * BigInt(na) * nb)).toLong)
        }
        (k, na, nb, auc)
      }.toSet
      got == want
    })
  }

  test("property: medianShift equals naive per-slice lower medians") {
    run(Prop.forAll(sliceGen) { rows =>
      val got = Validate.medianShift(rows.toDF("k", "v", "cur"), "k",
          org.apache.spark.sql.functions.col("v"),
          org.apache.spark.sql.functions.col("cur"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getLong(3)),
          if (r.isNullAt(4)) None else Some(r.getLong(4)),
          if (r.isNullAt(5)) None else Some(r.getLong(5)))).toSet
      def lowerMedian(vs: Seq[Long]): Option[Long] =
        if (vs.isEmpty) None else Some(vs.sorted.apply((vs.size + 1) / 2 - 1))
      val want = rows.groupBy(_._1).map { case (k, rs) =>
        val cur = lowerMedian(rs.filter(_._3).map(_._2))
        val ref = lowerMedian(rs.filterNot(_._3).map(_._2))
        (k, rs.count(_._3).toLong, rs.count(!_._3).toLong, cur, ref,
          for (a <- cur; b <- ref) yield a - b)
      }.toSet
      got == want
    })
  }

  private val winsorGen: Gen[List[(String, Long, Long)]] =
    Gen.choose(1, 25).flatMap(n => Gen.listOfN(n, for {
      k <- Gen.oneOf("A", "B")
      v <- Gen.choose(0L, 50L)
    } yield (k, v)).map(_.zipWithIndex.map { case ((k, v), i) =>
      (k, i.toLong, v)
    }))

  test("property: winsorizePerKey equals the naive rank-band clamp") {
    run(Prop.forAll(winsorGen) { rows =>
      val got = Correlate.winsorizePerKey(rows.toDF("k", "id", "v"),
          "k", org.apache.spark.sql.functions.col("id"),
          org.apache.spark.sql.functions.col("v"))
        .as[(String, Long, Long, Long)].collect().toSet
      val want = rows.groupBy(_._1).flatMap { case (k, rs) =>
        val sorted = rs.map(_._3).sorted
        val n = sorted.size.toLong
        // kept ranks (n*50 div 1000, n*950 div 1000] — the trim band
        val (lo, hi) = (n * 50 / 1000, n * 950 / 1000)
        val kept = sorted.slice(lo.toInt, hi.toInt)
        rs.map { case (_, id, v) =>
          val w = if (kept.isEmpty) v
          else math.max(kept.head, math.min(kept.last, v))
          (k, id, v, w)
        }
      }.toSet
      got == want
    })
  }

  // --- cramersV ---------------------------------------------------------

  private val catGen: Gen[List[(String, String)]] =
    Gen.choose(1, 15).flatMap(n => Gen.listOfN(n, for {
      a <- Gen.oneOf("x", "y", "z")
      b <- Gen.oneOf("p", "q")
    } yield (a, b)))

  test("property: cramersV equals the naive full-grid BigInt chi-square") {
    run(Prop.forAll(catGen) { rows =>
      val got = Correlate.cramersV(rows.toDF("a", "b"),
          org.apache.spark.sql.functions.col("a"),
          org.apache.spark.sql.functions.col("b"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4),
          if (r.isNullAt(5)) None else Some(r.getLong(5)))).head
      val n = BigInt(rows.size)
      val ra = rows.groupBy(_._1).view.mapValues(g => BigInt(g.size)).toMap
      val cb = rows.groupBy(_._2).view.mapValues(g => BigInt(g.size)).toMap
      val chi2 = (for { (a, r) <- ra.toSeq; (b, c) <- cb.toSeq } yield {
        val dev = BigInt(rows.count(t => t._1 == a && t._2 == b)) * n - r * c
        dev * dev * 1000000 / (n * r * c)
      }).sum
      val minDim = math.min(ra.size, cb.size)
      val v2 = if (minDim < 2) None
      else Some((chi2 / (n * (minDim - 1))).toLong)
      got == ((rows.size.toLong, ra.size.toLong, cb.size.toLong,
        (ra.size - 1).toLong * (cb.size - 1).toLong, chi2.toLong, v2))
    })
  }

  // --- daily monitors ---------------------------------------------------

  private val seriesGen: Gen[List[(String, Long, Int)]] =
    Gen.choose(1, 8).flatMap(m => Gen.listOfN(m, for {
      k <- Gen.oneOf("x", "y")
      d <- Gen.choose(0L, 8L)
      c <- Gen.choose(1, 4)
    } yield (k, d, c)))

  test("property: fano/changepoint/autocorr equal naive BigInt references") {
    run(Prop.forAll(seriesGen) { cells =>
      val rows = cells.flatMap { case (k, d, c) =>
        (1 to c).map(i =>
          (new java.sql.Timestamp(d * 86400000L + i * 1000L), k))
      }
      val df = rows.toDF("ts", "event_type")
      val byKey = cells.groupBy(_._1).map { case (k, cs) =>
        k -> cs.groupBy(_._2).map { case (d, g) => d -> g.map(_._3).sum.toLong }
      }

      // fano over OBSERVED days
      val fanoGot = TimeSeries.fanoFactor(df, "ts", "event_type")
        .as[(String, Long, Long, Long, Long)].collect().toSet
      val fanoWant = byKey.map { case (k, m) =>
        val d = m.size.toLong; val s = m.values.sum
        val s2 = m.values.map(x => BigInt(x) * x).sum
        (k, d, s, s2.toLong,
          ((BigInt(d) * s2 - BigInt(s) * s) * 1000 / (BigInt(d) * s)).toLong)
      }.toSet

      // zero-filled axis per key
      def axis(m: Map[Long, Long]): Vector[Long] = {
        val d0 = m.keys.min; val d1 = m.keys.max
        (d0 to d1).map(d => m.getOrElse(d, 0L)).toVector
      }

      val cpGot = TimeSeries.changepointDay(df, "ts", "event_type")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4),
          if (r.isNullAt(5)) None else Some(r.getLong(5)),
          if (r.isNullAt(6)) None else Some(r.getLong(6)))).toSet
      val cpWant = byKey.map { case (k, m) =>
        val xs = axis(m); val d = xs.size.toLong; val s = xs.sum
        val cands = xs.scanLeft(0L)(_ + _).tail.zipWithIndex.map {
          case (cumx, i) =>
            ((BigInt(d) * cumx - BigInt(i + 1) * s).abs, i + 1L, cumx)
        }
        val (cab, idx, cumx) = cands.minBy { case (g, i, _) => (-g, i) }
        (k, d, s, m.keys.min + idx - 1,
          (cab * 1000 / (BigInt(d) * s)).toLong,
          Some(BigInt(cumx) * 1000 / idx).map(_.toLong),
          if (d > idx) Some((BigInt(s - cumx) * 1000 / (d - idx)).toLong)
          else None)
      }.toSet

      val acGot = TimeSeries.autocorrMilli(df, "ts", "event_type")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getLong(3)))).toSet
      val acWant = byKey.flatMap { case (k, m) =>
        val xs = axis(m); val d = xs.size.toLong; val s = xs.sum
        val dev = xs.map(x => BigInt(d) * x - s)
        val den = dev.map(v => v * v).sum
        Seq(1, 7).map { l =>
          val pairs = dev.dropRight(l).zip(dev.drop(l))
          val num = pairs.map { case (a, b) => a * b }.sum
          val r = if (den == 0 || pairs.isEmpty) None
          else Some((num.signum * (num.abs * 1000 / den)).toLong)
          (k, l.toLong, d, r)
        }
      }.toSet

      val tsGot = TimeSeries.trendSlopeMilli(df, "ts", "event_type")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getLong(3)))).toSet
      val tsWant = byKey.map { case (k, m) =>
        val xs = axis(m); val d = BigInt(xs.size); val s = BigInt(xs.sum)
        val stx = xs.zipWithIndex.map { case (x, i) => BigInt(i + 1) * x }.sum
        val st = d * (d + 1) / 2
        val stt = (1 to xs.size).map(i => BigInt(i) * i).sum
        val num = d * stx - st * s
        val den = d * stt - st * st
        val slope = if (den <= 0) None
        else Some((num.signum * (num.abs * 1000 / den)).toLong)
        (k, d.toLong, s.toLong, slope)
      }.toSet

      fanoGot == fanoWant && cpGot == cpWant && acGot == acWant &&
        tsGot == tsWant
    }, n = 10)
  }
}
