package graft.operators

import org.apache.spark.sql.functions.col

import graft.SparkSpecBase

class ExperimentSpec extends SparkSpecBase {
  import spark.implicits._

  private def run(rows: Seq[(Long, String, Boolean)]) =
    Experiment.abChi2(rows.toDF("u", "v", "c"),
      col("u"), col("v"), col("c"))
      .as[(Long, Long, Long, Long, Long, Long, Long, Option[Long])]
      .collect().head

  test("abChi2: hand 2x2 — rates, lift, chi-square micro-units") {
    // A: 100 users, 30 convert; B: 100 users, 20 convert
    // chi2 = 200*(30*80 - 70*20)^2 / (100*100*50*150) = 8/3
    val rows =
      (1L to 100L).map(u => (u, "A", u <= 30)) ++
      (101L to 200L).map(u => (u, "B", u <= 120)) ++
      // a second, non-converting event for a converting user must not
      // flip them back: conversion is ANY converting event
      Seq((1L, "A", false))
    val (na, ka, nb, kb, ra, rb, lift, chi2) = run(rows)
    assert((na, ka, nb, kb) == (100L, 30L, 100L, 20L))
    assert((ra, rb, lift) == (300000L, 200000L, 100000L))
    assert(chi2.contains(2666666L)) // 8/3 in micro-units, floored
  }

  test("abChi2: zero margin (everyone converts) yields NULL chi-square") {
    val rows = Seq((1L, "A", true), (2L, "B", true))
    val r = run(rows)
    assert(r == ((1L, 1L, 1L, 1L, 1000000L, 1000000L, 0L, None)))
  }

  test("abChi2: a cross-variant user counts once, under the min variant") {
    val rows = Seq((1L, "A", false), (1L, "B", true), (2L, "B", false))
    val (na, ka, nb, kb, _, _, _, _) = run(rows)
    // user 1 lands in A (min label) and IS converted (any event)
    assert((na, ka, nb, kb) == (1L, 1L, 1L, 0L))
  }

  test("halfSampleCi: exact agreement with a naive mix64-bit reference") {
    // replicate-i membership is bit i of ONE portable mix64 hash per row
    // (round 13 — one hash instead of b md5s); the same bits recomputed
    // naively make the operator checkable bit for bit, replicate by
    // replicate
    val b = 8; val salt = "hsci"
    def hash(s: String): Long = graft.functions.PortableHash.mix64(
      org.apache.spark.unsafe.types.UTF8String.fromString(s))
    val rows = (1L to 40L).map(i => ("k", i, i * 3 % 17))
    val got = Experiment.halfSampleCi(rows.toDF("key", "id", "v"),
        "key", col("id"), col("v"), b = b, salt = salt)
      .as[(String, Long, Long, Long, Long, Long)].collect().head
    val means = (0 until b).flatMap { r =>
      val kept = rows.filter(t => ((hash(s"${t._2}:$salt") >> r) & 1L) == 1L)
      if (kept.isEmpty) None
      else Some(kept.map(_._3).sum * 1000L / kept.size)
    }.sorted
    val m = means.size
    val want = ("k", 40L, m.toLong,
      rows.map(_._3).sum * 1000L / 40L,
      means(m * 100 / 1000), means(m - m * 100 / 1000 - 1))
    assert(got == want, s"got $got want $want (means=$means)")
  }

  test("halfSampleCi: per-key sums past the long x1000 ceiling don't wrap") {
    // 3 rows of 4e15 sum to 1.2e16; the x1000 product (1.2e19) exceeds
    // Long.MaxValue — the round-12 LongType arithmetic wrapped (or threw
    // under ANSI); the DECIMAL(38,0) widening reports the exact mean
    val big = 4_000_000_000_000_000L
    val rows = (1L to 3L).map(i => ("k", i, big))
    val r = Experiment.halfSampleCi(rows.toDF("key", "id", "v"),
        "key", col("id"), col("v"), b = 4)
      .as[(String, Long, Long, Long, Long, Long)].collect().head
    assert(r._4 == big * 1000L, s"mean_milli wrapped: ${r._4}")
  }

  test("halfSampleCi: band is ordered and replicates never exceed b") {
    val rows = (1L to 9L).map(i => ("x", i, 5L))
    val r = Experiment.halfSampleCi(rows.toDF("key", "id", "v"),
        "key", col("id"), col("v"), b = 4)
      .as[(String, Long, Long, Long, Long, Long)].collect().head
    // constant values: every replicate mean is exactly 5000
    assert(r._3 <= 4L && r._4 == 5000L && r._5 == 5000L && r._6 == 5000L)
  }
}
