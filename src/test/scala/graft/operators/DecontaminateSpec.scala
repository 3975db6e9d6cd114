package graft.operators

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.BroadcastExchangeExec

import graft.SparkSpecBase

class DecontaminateSpec extends SparkSpecBase {
  import spark.implicits._

  private val bench = Seq(
    (100L, "the secret benchmark answer is forty two exactly"),
    (101L, "another held out evaluation question entirely")).toDF("doc_id", "text")

  private val corpus = Seq(
    (1L, "the secret benchmark answer is forty two exactly plus padding"), // leaks
    (2L, "forty two exactly what the answer should be"),                   // leaks one 3-gram
    (3L, "totally clean training document with original words only"),
    (4L, "short doc")).toDF("doc_id", "text")                              // < n words

  test("flag counts distinct overlapping n-grams per doc") {
    val out = Decontaminate.flag(corpus, "doc_id", "text", bench, "text", n = 3)
      .select("doc_id", "n_overlap", "contaminated")
      .as[(Long, Long, Boolean)].collect()
      .map { case (id, n, c) => id -> ((n, c)) }.toMap
    // doc 1 contains all 6 benchmark 3-grams of the first bench doc
    assert(out(1L) == (6L, true))
    // doc 2 shares exactly "forty two exactly"
    assert(out(2L) == (1L, true))
    assert(out(3L) == (0L, false))
    assert(out(4L) == (0L, false))
  }

  test("clean removes exactly the flagged docs") {
    val kept = Decontaminate.clean(corpus, "doc_id", "text", bench, "text", n = 3)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(3L, 4L))
  }

  test("a benchmark doc used as corpus is fully contaminated") {
    val out = Decontaminate.flag(bench, "doc_id", "text", bench, "text", n = 3)
      .select("doc_id", "contaminated").as[(Long, Boolean)].collect().toMap
    assert(out.values.forall(identity))
  }

  test("benchmark shingle set is broadcast (corpus never shuffled on text)") {
    val plan = Decontaminate.flag(corpus, "doc_id", "text", bench, "text", n = 3)
      .queryExecution.executedPlan
    val resolved = plan.collectFirst { case a: AdaptiveSparkPlanExec => a.executedPlan }
      .getOrElse(plan)
    assert(resolved.collect { case b: BroadcastExchangeExec => b }.nonEmpty,
      s"expected a broadcast exchange in:\n$resolved")
  }
}
