package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** P3 `mimic_utf8_general_ci` (reference `embeddings-pipeline.py:63-72`):
  * transliterate → strip `.`/`$` → rtrim → lower. */
class AsciiFoldSpec extends SparkSpecBase {

  test("fold: latin accents decompose") {
    assert(AsciiFold.fold("café") == "cafe")
    assert(AsciiFold.fold("Üñîçödé") == "Unicode")
    assert(AsciiFold.fold("àéîõü") == "aeiou")
  }

  test("fold: direct-map letters that do not decompose") {
    assert(AsciiFold.fold("ßØÆœł") == "ssOAEoel")
  }

  test("fold: pure-ASCII fast path is identity") {
    val s = "plain ASCII text_123"
    assert(AsciiFold.fold(s) eq s)
  }

  test("fold: unmappable codepoints are dropped (unidecode-style)") {
    assert(AsciiFold.fold("a中b") == "ab")
  }

  test("normalizeKey matches the reference transform end-to-end") {
    import spark.implicits._
    val df = Seq("Café.Güell$ ", "A.B$C  ", "ok").toDF("s")
    val out = df.select(F.normalizeKey(col("s")).as("k")).as[String].collect()
    assert(out.sameElements(Array("cafeguell", "abc", "ok")))
  }

  test("ascii_fold runs inside codegen as a SQL function") {
    F.registerAll(spark)
    val r = spark.sql("SELECT ascii_fold('Dvořák') AS f").collect().head.getString(0)
    assert(r == "Dvorak")
  }
}
