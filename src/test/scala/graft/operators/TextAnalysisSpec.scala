package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

class TextAnalysisSpec extends SparkSpecBase {
  import spark.implicits._

  test("quality stats: counts and ratios on a known sentence") {
    val df = Seq("the cat sat on a mat.").toDF("text")
    val r = TextAnalysis.withQualityStats(df, "text").head()
    assert(r.getAs[Long]("n_tokens") == 6L)
    assert(r.getAs[Long]("n_stopwords") == 3L) // the, on, a
    assert(r.getAs[Long]("n_punct") == 1L)
    assert(r.getAs[Double]("stopword_ratio") == 3.0 / 6.0)
  }

  test("quality bucket thresholds") {
    val df = Seq(
      ("short one two", "too_short"),         // < 5 tokens
      ("the a an and or of to in is it", "boilerplate"), // all stopwords
      ("quantum flux harmonics resonate deeply today", "no_stopwords"),
      ("the quantum flux harmonics resonate deeply", "ok")).toDF("text", "want")
    val out = TextAnalysis.qualityBucket(df, "text")
      .select("want", "quality").as[(String, String)].collect()
    out.foreach { case (want, got) => assert(got == want, s"want=$want got=$got") }
  }

  test("lang-id argmax with deterministic first-wins ties") {
    val df = Seq(
      "der hund ist nicht hier",  // de markers dominate
      "el perro es que la casa",  // es markers
      "xyzzy plugh").toDF("text") // all scores 0 -> first lang (de)
    val out = TextAnalysis.withLangId(df, "text")
      .select("lang_pred").as[String].collect()
    assert(out.sameElements(Array("de", "es", "de")))
  }

  test("fingerprint is order-sensitive and stable") {
    val df = Seq("a b", "b a", "a b").toDF("text")
    val fp = df.select(TextAnalysis.fingerprint(col("text")).as("f"))
      .as[Long].collect()
    assert(fp(0) == fp(2))
    assert(fp(0) != fp(1))
    // known value: 'a'=97, 'b'=98; doc = (97*131 + 98) mod p
    assert(fp(0) == (97L * 131 + 98) % TextAnalysis.FingerprintMod)
  }
}
