package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftglue.Glue

/** Public Column-level function surface of the engine.
  *
  * Everything here compiles to native Catalyst expressions (either Spark
  * built-ins or the codegen-enabled expressions in this package) — no Scala
  * UDF closures on the hot path.
  */
object F {

  /** Unicode→ASCII transliteration (see [[AsciiFold]]). */
  def asciiFold(c: Column): Column = Glue.column(AsciiFold(Glue.expression(c)))

  /** The reference's `mimic_utf8_general_ci` key normalization
    * (reference `embeddings-pipeline.py:63-72`): transliterate to ASCII,
    * strip `.` and `$`, right-trim, lowercase. */
  def normalizeKey(c: Column): Column =
    lower(rtrim(translate(asciiFold(c), ".$", "")))

  /** Cosine similarity between two array<float|double> columns. */
  def cosineSim(a: Column, b: Column): Column =
    Glue.column(CosineSim(Glue.expression(a), Glue.expression(b)))

  /** Dot product between two array<float|double> columns. */
  def dotProduct(a: Column, b: Column): Column =
    Glue.column(DotProduct(Glue.expression(a), Glue.expression(b)))

  /** L2 norm of an array<float|double> column. */
  def l2Norm(a: Column): Column = Glue.column(L2Norm(Glue.expression(a)))

  /** Empty string → null (used to reproduce the reference's
    * "suffix only when color is non-empty" semantics, `:198-199`). */
  def emptyToNull(c: Column): Column = when(c === lit(""), lit(null)).otherwise(c)

  /** Register the custom expressions for SQL usage
    * (`SELECT ascii_fold(x), cosine_sim(a, b) ...`). */
  def registerAll(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("ascii_fold", es => AsciiFold(es.head), "built-in")
    reg.createOrReplaceTempFunction("cosine_sim", es => CosineSim(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction("dot_product", es => DotProduct(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction("l2_norm", es => L2Norm(es.head), "built-in")
  }
}
