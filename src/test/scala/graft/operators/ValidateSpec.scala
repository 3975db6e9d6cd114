package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

class ValidateSpec extends SparkSpecBase {
  import spark.implicits._

  private def docs = Seq(
    (1L, "hello world", "en"),
    (2L, "", "en"),
    (3L, "bonjour", null.asInstanceOf[String]),
    (4L, "ok", "xx")).toDF("id", "text", "lang")

  test("report: exact per-rule counts in one pass; NULL predicate = no violation") {
    val rep = Validate.report(docs, Seq(
      "empty_text" -> (length(col("text")) === 0),
      // lang =!= 'en' is NULL for row 3 -> not a violation under SQL WHERE
      "not_en" -> (col("lang") =!= "en"),
      "null_lang" -> col("lang").isNull))
      .select("rule", "n_rows", "n_violations", "violation_permille")
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(rep("empty_text") == ((4L, 1L, 250L)))
    assert(rep("not_en") == ((4L, 1L, 250L))) // only 'xx'; NULL doesn't count
    assert(rep("null_lang") == ((4L, 1L, 250L)))
  }

  test("benford: exact digit census, zero-obs digits report, non-positives excluded") {
    val amounts = Seq(1.00, 25.50, 19.99, 0.05, -3.00, 0.0)
      .toDF("amt")
    val rep = Validate.benford(amounts, col("amt"))
      .as[(Int, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(rep.size == 9) // every digit reports, observed or not
    // digits: 100->1, 2550->2, 1999->1, 5->5; -3 and 0 excluded; total 4
    assert(rep(1) == ((2L, 500L, 301L, 199L)))
    assert(rep(2) == ((1L, 250L, 176L, 74L)))
    assert(rep(5) == ((1L, 250L, 79L, 171L)))
    assert(rep(3) == ((0L, 0L, 125L, 125L))) // zero-obs: gap IS the signal
  }

  test("duplicateKeyCount counts key tuples occurring more than once") {
    val df = Seq((1L, "a"), (1L, "a"), (2L, "b"), (1L, "b")).toDF("k", "s")
    assert(Validate.duplicateKeyCount(df, Seq("k")) == 1L)      // k=1 x3
    assert(Validate.duplicateKeyCount(df, Seq("k", "s")) == 1L) // (1,a) x2
    assert(Validate.duplicateKeyCount(df.distinct(), Seq("k", "s")) == 0L)
  }

  test("driftTv: hand-computed distance; identical=0, disjoint=1, clamping") {
    // key "same": both slices {bin0: 2, bin1: 2} -> tv 0
    // key "shift": ref {bin0: 2}, cur {bin1: 2} -> tv 1
    // key "half": ref {bin0: 1, bin1: 1}, cur {bin0: 2} -> tv 1/2
    def rows(key: String, v: Double, cur: Boolean, n: Int) =
      Seq.fill(n)((key, v, cur))
    val df = (rows("same", 1.0, false, 2) ++ rows("same", 11.0, false, 2) ++
      rows("same", 1.0, true, 2) ++ rows("same", 11.0, true, 2) ++
      rows("shift", 1.0, false, 2) ++ rows("shift", 11.0, true, 2) ++
      rows("half", 1.0, false, 1) ++ rows("half", 11.0, false, 1) ++
      rows("half", 1.0, true, 2) ++
      // outliers clamp into edge bins: -5 -> bin 0, 999 -> last bin
      rows("clamp", -5.0, false, 1) ++ rows("clamp", 1.0, true, 1))
      .toDF("k", "v", "cur")
    val out = Validate.driftTv(df, "k", "v", col("cur"),
        lo = 0.0, hi = 20.0, nBins = 2)
      .select("key", "tv").as[(String, Option[Double])].collect().toMap
    assert(out("same").contains(0.0))
    assert(out("shift").contains(1.0))
    assert(out("half").contains(0.5))
    assert(out("clamp").contains(0.0), "both landed in bin 0 after clamping")
  }

  test("driftTv: null values are excluded from both slices, not a silent null bin") {
    // without the filter, the two nulls would form a (k, null) bin and
    // count toward np/nq — here the non-null rows are identical across
    // slices, so tv must be exactly 0 and the totals must say 2/2
    val df = Seq(
      ("k", Some(1.0), false), ("k", Some(11.0), false), ("k", None, false),
      ("k", Some(1.0), true), ("k", Some(11.0), true), ("k", None, true))
      .toDF("k", "v", "cur")
    val out = Validate.driftTv(df, "k", "v", col("cur"), 0.0, 20.0, 2)
      .select("key", "n_cur", "n_ref", "tv")
      .as[(String, Long, Long, Option[Double])].collect()
    assert(out.toSeq == Seq(("k", 2L, 2L, Some(0.0))))
  }

  test("driftTv: an empty slice reports null, not a crash") {
    val df = Seq(("k", 1.0, false), ("k", 2.0, false)).toDF("k", "v", "cur")
    val out = Validate.driftTv(df, "k", "v", col("cur"), 0.0, 10.0, 4)
      .select("key", "n_cur", "n_ref", "tv")
      .as[(String, Long, Long, Option[Double])].collect()
    assert(out.toSeq == Seq(("k", 0L, 2L, None)))
  }

  test("ksVsCorpus: hand-computed CDF gaps incl. the before-point candidate") {
    // corpus: A = [1, 1, 2], B = [3]; N = 4
    // F_A: 1→2/3, 2→1; F_g: 1→1/2, 2→3/4, 3→1 → sup |F_A−F_g| = 1/4 @2
    // F_B jumps only at 3; just BEFORE it F_B = 0 vs F_g = 3/4 → 750‰
    // (the open-segment candidate — an at-point-only sup would read 0)
    val df = Seq(("A", 1L), ("A", 1L), ("A", 2L), ("B", 3L))
      .toDF("src", "v")
    val got = Validate.ksVsCorpus(df, "src", col("v"))
      .as[(String, Long, Long)].collect().toSet
    assert(got == Set(("A", 3L, 250L), ("B", 1L, 750L)))
  }

  test("ksVsCorpus: a key holding the whole corpus reads 0; nulls drop") {
    val df = Seq(("A", Some(1L)), ("A", Some(5L)), ("A", Some(9L)),
      ("A", None)).toDF("src", "v")
    val got = Validate.ksVsCorpus(df, "src", col("v"))
      .as[(String, Long, Long)].collect().toSet
    assert(got == Set(("A", 3L, 0L)))
  }

  test("calibrationReport: hand bins, edge clamping, null exclusion, one-division ECE") {
    // nBins=4 (250-wide): conf 100/100/-50 land in bin 0 (clamp),
    // 600 in bin 2, 999 and 1200 (clamp) in bin 3; ECE accumulates the
    // exact milli-row gaps |1000·nc_b − Σconf_b| then divides ONCE:
    // (|2000−150| + |1000−600| + |1000−2199|) div 6 = 3449 div 6 = 574
    val rows = Seq(
      (Some(100L), Some(true)), (Some(100L), Some(false)),
      (Some(-50L), Some(true)), (Some(600L), Some(true)),
      (Some(999L), Some(false)), (Some(1200L), Some(true)),
      (None, Some(true)), (Some(5L), None)) // excluded
      .toDF("conf", "ok")
    val got = Validate.calibrationReport(rows, col("conf"), col("ok"), 4)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(got(0L) == ((0L, 3L, 2L, 666L, 50L, 574L)), got.toString)
    assert(got(2L) == ((2L, 1L, 1L, 1000L, 600L, 574L)), got.toString)
    assert(got(3L) == ((3L, 2L, 1L, 500L, 1099L, 574L)), got.toString)
    assert(got.size == 3) // empty bins absent
    // perfectly calibrated constant bin: acc == conf, ece == 0
    val perfect = (1 to 10).map(i => (500L, i <= 5)).toDF("conf", "ok")
    val p = Validate.calibrationReport(perfect, col("conf"), col("ok"), 4)
      .as[(Long, Long, Long, Long, Long, Long)].collect().head
    assert(p == ((2L, 10L, 5L, 500L, 500L, 0L)))
  }

  test("boundedHistogram: identity when the span fits; caps distinct values when it doesn't") {
    // identity: span 9 ≤ maxBins 16 → width 1, values bit-identical
    val h = Seq(("a", 1L, 2L), ("a", 9L, 1L), ("b", 4L, 3L))
      .toDF("key", "__v", "__c")
    val id = Validate.boundedHistogram(h, 16)
      .as[(String, Long, Long)].collect().toSet
    assert(id == Set(("a", 1L, 2L), ("a", 9L, 1L), ("b", 4L, 3L)))
    // coarsening: 1000 distinct values, maxBins 16 → ≤16 bins, counts
    // conserved, bin floors are lo + k·w for w = ceil(span/16)
    val wide = (0L until 1000L).map(v => ("k", v, 1L))
      .toDF("key", "__v", "__c")
    val binned = Validate.boundedHistogram(wide, 16)
      .as[(String, Long, Long)].collect()
    assert(binned.map(_._2).distinct.length <= 16)
    assert(binned.map(_._3).sum == 1000L)
    val w = math.ceil(1000.0 / 16).toLong
    assert(binned.forall(r => r._2 % w == 0))
    // extreme domain: Long.MIN/MAX span can't overflow (ANSI would throw)
    val extreme = Seq(("k", Long.MinValue, 1L), ("k", Long.MaxValue, 1L))
      .toDF("key", "__v", "__c")
    val eb = Validate.boundedHistogram(extreme, 16)
      .as[(String, Long, Long)].collect()
    assert(eb.map(_._3).sum == 2L && eb.map(_._2).distinct.length <= 16)
  }

  test("ksVsCorpus: high-cardinality domain auto-coarsens to the binned-exact statistic") {
    // 10k distinct values; with maxBins=8 the result must equal the
    // exact KS computed over explicitly pre-binned values (the guard is
    // deterministic coarsening, not approximation of the binned stat)
    val rows = (0L until 10000L).map(v =>
      (if (v % 3 == 0) "A" else "B", v))
    val df = rows.toDF("src", "v")
    val got = Validate.ksVsCorpus(df, "src", col("v"), maxBins = 8)
      .as[(String, Long, Long)].collect().toSet
    val w = math.ceil(10000.0 / 8).toLong
    val pre = rows.map { case (s, v) => (s, (v / w) * w) }.toDF("src", "v")
    val want = Validate.ksVsCorpus(pre, "src", col("v"))
      .as[(String, Long, Long)].collect().toSet
    assert(got == want, s"got $got want $want")
  }

  test("ksTwoSlice/rankSumAuc/medianShift: wide domains stay bounded and agree with pre-binned exact") {
    val rows = (0L until 5000L).map(v => ("k", v, v % 2 == 0))
    val df = rows.toDF("k", "v", "cur")
    val w = math.ceil(5000.0 / 8).toLong
    val pre = rows.map { case (k, v, c) => (k, (v / w) * w, c) }
      .toDF("k", "v", "cur")
    def rs(d: org.apache.spark.sql.DataFrame) = d.collect().map(_.toSeq).toSeq
    assert(rs(Validate.ksTwoSlice(df, "k", col("v"), col("cur"), maxBins = 8))
      == rs(Validate.ksTwoSlice(pre, "k", col("v"), col("cur"))))
    assert(rs(Validate.rankSumAuc(df, "k", col("v"), col("cur"), maxBins = 8))
      == rs(Validate.rankSumAuc(pre, "k", col("v"), col("cur"))))
    assert(rs(Validate.medianShift(df, "k", col("v"), col("cur"), maxBins = 8))
      == rs(Validate.medianShift(pre, "k", col("v"), col("cur"))))
  }

  private def ks2(rows: Seq[(String, Long, Boolean)]) =
    Validate.ksTwoSlice(rows.toDF("k", "v", "cur"), "k", col("v"), col("cur"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)))).toSet

  test("ksTwoSlice: identical slices read 0; disjoint slices read 1000") {
    val rows = Seq(("k", 1L, true), ("k", 2L, true),
      ("k", 1L, false), ("k", 2L, false),
      ("m", 5L, true), ("m", 5L, true), ("m", 1L, false), ("m", 1L, false))
    assert(ks2(rows) == Set(("k", 2L, 2L, Some(0L)),
      ("m", 2L, 2L, Some(1000L))))
  }

  test("ksTwoSlice: sup at a reference-only union point; empty slice is NULL") {
    // cur = {10}, ref = {1, 20}: the sup (1/2) is attained on the
    // segment [1,10) — visible only at ref's point v=1, which the
    // union-point candidates cover
    val rows = Seq(("p", 10L, true), ("p", 1L, false), ("p", 20L, false),
      ("e", 3L, true))
    assert(ks2(rows) == Set(("p", 1L, 2L, Some(500L)),
      ("e", 1L, 0L, None)))
  }

  private def auc(rows: Seq[(String, Long, Boolean)]) =
    Validate.rankSumAuc(rows.toDF("k", "v", "cur"), "k", col("v"), col("cur"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)))).toSet

  test("rankSumAuc: dominance reads 1000, ties read 500, inversion reads 0") {
    val rows = Seq(("a", 2L, true), ("a", 1L, false),
      ("b", 1L, true), ("b", 1L, false),
      ("c", 1L, true), ("c", 2L, false))
    assert(auc(rows) == Set(("a", 1L, 1L, Some(1000L)),
      ("b", 1L, 1L, Some(500L)), ("c", 1L, 1L, Some(0L))))
  }

  test("rankSumAuc: hand pair count with mixed order; empty slice is NULL") {
    // cur {1,3} vs ref {2,2}: 3 beats both, 1 beats none → 2/4 = 500
    val rows = Seq(("p", 1L, true), ("p", 3L, true),
      ("p", 2L, false), ("p", 2L, false), ("e", 7L, false))
    assert(auc(rows) == Set(("p", 2L, 2L, Some(500L)),
      ("e", 0L, 1L, None)))
  }

  test("medianShift: lower-median convention per slice; empty slice NULLs") {
    // key k: cur [1,2,3,4] → lower median rank (4+1) div 2 = 2 → 2;
    //        ref [10,20] → rank 1 → 10; shift = −8
    // key e: no ref rows → p50_ref and shift NULL
    val rows = Seq(("k", 1L, true), ("k", 2L, true), ("k", 3L, true),
      ("k", 4L, true), ("k", 10L, false), ("k", 20L, false),
      ("e", 5L, true))
    val got = Validate.medianShift(rows.toDF("k", "v", "cur"),
        "k", col("v"), col("cur"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        if (r.isNullAt(4)) None else Some(r.getLong(4)),
        if (r.isNullAt(5)) None else Some(r.getLong(5)))).toSet
    assert(got == Set(
      ("k", 4L, 2L, Some(2L), Some(10L), Some(-8L)),
      ("e", 1L, 0L, Some(5L), None, None)))
  }

  test("twoSliceHistogramByDay: day-folded anchor equals tag-first histogram (r19)") {
    // days 3..12; window 7 → current = days 6..12; one null-day row and
    // one null-value row must be excluded by BOTH paths
    val rows = Seq[(String, java.lang.Long, java.lang.Long)](
      ("k", 1L, 3L), ("k", 1L, 6L), ("k", 1L, 12L), ("k", 2L, 5L),
      ("k", 2L, 12L), ("j", 7L, 4L), ("j", 7L, 11L), ("j", 9L, 12L),
      ("k", 5L, null), ("k", null, 12L))
    val df = rows.toDF("k", "v", "d")
    val maxd = df.where(col("v").isNotNull).agg(max("d")).head.getLong(0)
    val tagged = Validate.twoSliceHistogram(
      df.withColumn("cur",
        when(col("d").isNotNull, col("d") >= maxd - 6)),
      "k", col("v"), col("cur"))
    val folded = Validate.twoSliceHistogramByDay(df, "k", col("v"), col("d"))
    def rowsOf(h: org.apache.spark.sql.DataFrame) =
      h.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(rowsOf(folded) == rowsOf(tagged))
    assert(rowsOf(folded) == Set(
      ("k", 1L, 2L, 1L), ("k", 2L, 1L, 1L),
      ("j", 7L, 1L, 1L), ("j", 9L, 1L, 0L)))
  }

  test("enforce: passes under budget, throws over it, names the rule") {
    val rules = Seq("empty_text" -> (length(col("text")) === 0))
    // budget 1 tolerates the single empty doc
    assert(Validate.enforce(docs, rules, Map("empty_text" -> 1L)).count() == 1)
    val e = intercept[IllegalStateException] {
      Validate.enforce(docs, rules) // default budget 0
    }
    assert(e.getMessage.contains("empty_text=1"))
  }
}
