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

  test("duplicateKeyCount counts key tuples occurring more than once") {
    val df = Seq((1L, "a"), (1L, "a"), (2L, "b"), (1L, "b")).toDF("k", "s")
    assert(Validate.duplicateKeyCount(df, Seq("k")) == 1L)      // k=1 x3
    assert(Validate.duplicateKeyCount(df, Seq("k", "s")) == 1L) // (1,a) x2
    assert(Validate.duplicateKeyCount(df.distinct(), Seq("k", "s")) == 0L)
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
