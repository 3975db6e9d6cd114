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

  // --- Bloom-prefiltered path ---

  test("flagBloom / cleanBloom equal the exact plan on hand-built docs") {
    val exact = Decontaminate.flag(corpus, "doc_id", "text", bench, "text", n = 3)
      .select("doc_id", "n_overlap", "contaminated")
      .as[(Long, Long, Boolean)].collect().toSet
    val bloomed = Decontaminate.flagBloom(corpus, "doc_id", "text", bench, "text",
        n = 3, fpp = 0.01)
      .select("doc_id", "n_overlap", "contaminated")
      .as[(Long, Long, Boolean)].collect().toSet
    assert(bloomed == exact)
    val keptExact = Decontaminate.clean(corpus, "doc_id", "text", bench, "text", n = 3)
      .select("doc_id").as[Long].collect().toSet
    val keptBloom = Decontaminate.cleanBloom(corpus, "doc_id", "text", bench, "text", n = 3)
      .select("doc_id").as[Long].collect().toSet
    assert(keptBloom == keptExact)
  }

  test("bloom path equals exact path on the sf0.001 documents table") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val b = docs.where(org.apache.spark.sql.functions.pmod(
      org.apache.spark.sql.functions.col("doc_id"),
      org.apache.spark.sql.functions.lit(50)) === 0)
    val c = docs.except(b)
    val exact = Decontaminate.clean(c, "doc_id", "text", b, "text", n = 3)
      .select("doc_id").as[Long].collect().toSet
    // a deliberately loose fpp: false positives must still die in verify
    val bloomed = Decontaminate.cleanBloom(c, "doc_id", "text", b, "text",
        n = 3, fpp = 0.2)
      .select("doc_id").as[Long].collect().toSet
    assert(bloomed == exact)
  }

  test("bloom_might_contain: no false negatives; SQL-callable; codegen plan") {
    import org.apache.spark.sql.functions._
    val hashes = (1L to 500L).toDF("v").select(graft.functions.F.mix64(
      concat(lit("item-"), col("v"))).as("h"))
    val bloomBytes = {
      val bf = hashes.stat.bloomFilter("h", 500, 0.03)
      val bos = new java.io.ByteArrayOutputStream(); bf.writeTo(bos); bos.toByteArray
    }
    // every inserted hash probes true
    val misses = hashes.where(!graft.functions.F.bloomMightContain(lit(bloomBytes), col("h")))
      .count()
    assert(misses == 0L, "bloom false negative")
    // SQL surface via the registered function
    graft.functions.F.registerAll(spark)
    hashes.createOrReplaceTempView("bloom_probe_t")
    spark.sql("SELECT h FROM bloom_probe_t").createOrReplaceTempView("bloom_probe_t2")
    val viaSql = spark.sql(
      s"SELECT count(*) FROM bloom_probe_t WHERE NOT bloom_might_contain(" +
        s"unbase64('${java.util.Base64.getEncoder.encodeToString(bloomBytes)}'), h)")
      .head().getLong(0)
    assert(viaSql == 0L)
  }

  // --- semantic (embedding) decontamination ---

  private val dim = 4
  private def vec(xs: Double*): Array[Float] = xs.map(_.toFloat).toArray

  private lazy val benchEmb = Seq(
    (100L, vec(1, 0, 0, 0)),
    (101L, vec(0, 1, 0, 0))).toDF("bid", "bvec")

  private lazy val corpusEmb = Seq(
    (1L, vec(0.99, 0.1, 0, 0)),   // paraphrase of bench 100
    (2L, vec(0, 0, 1, 0)),        // clean (orthogonal)
    (3L, vec(0.7, 0.7, 0, 0)),    // near BOTH benchmark vectors
    (100L, vec(1, 0, 0, 0))       // IS bench 100 — same id ⇒ exempt
  ).toDF("id", "v")

  test("flagSemantic: cosine leakage found, same-id exempt, n_bench exact") {
    // planes=1, tables=4 ⇒ 2^1 buckets/table over 4 seeds: collision
    // probability 1-(cos⁻¹ρ/π)^... — with 4 tables every high-cos pair
    // collides in at least one (verified: output matches brute force)
    val out = Decontaminate.flagSemantic(corpusEmb, "id", "v",
        benchEmb, "bid", "bvec", threshold = 0.6, dim = dim,
        planes = 1, tables = 4)
      .as[(Long, Double, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out.contains(1L) && out(1L)._2 == 1L)
    assert(out(1L)._1 > 0.98)
    assert(out.contains(3L) && out(3L)._2 == 2L) // matched both bench rows
    assert(!out.contains(2L), "orthogonal vector flagged")
    assert(!out.contains(100L), "same-id benchmark row must be exempt")
  }

  test("cleanSemantic removes exactly the flagged ids") {
    val kept = Decontaminate.cleanSemantic(corpusEmb, "id", "v",
        benchEmb, "bid", "bvec", threshold = 0.6, dim = dim,
        planes = 1, tables = 4)
      .select("id").as[Long].collect().toSet
    assert(kept == Set(2L, 100L))
  }

  test("flagSemantic: benchmark side is broadcast (corpus probed map-side)") {
    val plan = Decontaminate.flagSemantic(corpusEmb, "id", "v",
        benchEmb, "bid", "bvec", threshold = 0.6, dim = dim)
      .queryExecution.executedPlan
    val resolved = plan.collectFirst { case a: AdaptiveSparkPlanExec => a.executedPlan }
      .getOrElse(plan)
    assert(resolved.collect { case b: BroadcastExchangeExec => b }.nonEmpty,
      s"expected a broadcast exchange in:\n$resolved")
  }

  test("contaminatedSpans: planted verbatim quote located as one exact char span") {
    val quote = "to be or not to be that is"  // 8 tokens
    val prefix = "my essay opens boldly quoting"
    val suffix = "and then moves on"
    val corpus = Seq(
      (1L, s"$prefix $quote $suffix"),        // quote mid-doc
      (2L, s"$quote $suffix"),                // quote at doc start
      (3L, "entirely original thoughts here no overlap at all with anything"))
      .toDF("doc_id", "text")
    val bench = Seq((100L, s"some framing $quote more framing")).toDF("doc_id", "text")
    val spans = Decontaminate.contaminatedSpans(corpus, "doc_id", "text",
        bench, "doc_id", "text", w = 4)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // doc 1: span covers exactly the quote — windows of the quote's 8
    // tokens merge into [start of quote, end of quote)
    val s1 = prefix.length + 1L
    assert(spans(1L) == ((s1, s1 + quote.length)), spans.toString)
    assert(spans(2L) == ((0L, quote.length.toLong)), spans.toString)
    assert(!spans.contains(3L), "clean doc must carry no span")
    // splice: cutting the span removes the quote and keeps the rest
    val cleaned = corpus.where($"doc_id" === 1L)
      .select(Dedup.removeSpans($"text",
        org.apache.spark.sql.functions.array(
          org.apache.spark.sql.functions.struct(
            org.apache.spark.sql.functions.lit(s1).as("span_start"),
            org.apache.spark.sql.functions.lit(s1 + quote.length).as("span_end"))))
        .as("t")).head().getString(0)
    assert(!cleaned.contains("to be or not"), cleaned)
    assert(cleaned.contains(prefix) && cleaned.contains(suffix), cleaned)
  }

  test("contaminatedSpans: benchmark items shorter than w are invisible (flag's job)") {
    val corpus = Seq((1L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    val bench = Seq((9L, "beta gamma")).toDF("doc_id", "text") // 2 tokens < w=4
    assert(Decontaminate.contaminatedSpans(corpus, "doc_id", "text",
      bench, "doc_id", "text", w = 4).count() == 0)
    // ...while the n-gram flag still catches it at n=2
    val flagged = Decontaminate.flag(corpus, "doc_id", "text", bench, "text", n = 2)
      .where($"contaminated").count()
    assert(flagged == 1L)
  }
}
