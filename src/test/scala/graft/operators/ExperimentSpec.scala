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
}
