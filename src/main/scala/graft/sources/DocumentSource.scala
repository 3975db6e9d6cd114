package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema-on-read ingestion of schemaless JSON documents — the
  * document-DB-shaped source contract (the reference scans Mongo documents
  * defensively, `embeddings-pipeline.py:170-177,210-214`; Parquet is the
  * columnar stand-in, this is the loose path for JSON exports / change
  * streams).
  *
  * An EXPLICIT read schema (never inference — schema inference is an extra
  * full pass over the source, a non-starter at 100 TB): unambiguous fields
  * are typed directly; fields whose type varies document-to-document
  * (`country` is a scalar OR an array in the wild) are declared `STRING`,
  * which makes the JSON parser capture non-string tokens as their raw JSON
  * text, re-parsed with `from_json` in one projection. Malformed documents
  * surface via PERMISSIVE mode's corrupt-record column as a `__malformed`
  * flag so the pipeline can quarantine-count them (the reference's
  * log-and-skip, `:233-235`) instead of silently dropping.
  */
object DocumentSource {

  /** Read schema: [[graft.schema.Schemas.sourceDoc]] with defensive
    * loosenings — `timestamp` as ISO-8601 text, `country` as raw text. */
  val jsonReadSchema: StructType = StructType(Seq(
    StructField("source", StringType),
    StructField("timestamp", StringType),
    StructField("embeddings", ArrayType(FloatType)),
    StructField("cleaned_ref", StringType),
    StructField("color", StringType),
    StructField("category", StringType),
    StructField("country", StringType),
    StructField("embeddings_type", StringType),
    StructField("for_matching", BooleanType),
    StructField("_corrupt_record", StringType)))

  /** Documents in the [[graft.schema.Schemas.sourceDoc]] contract shape
    * plus a `__malformed` flag (true ⇔ the JSON line did not parse; all
    * contract fields are null on such rows). */
  def readJson(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(jsonReadSchema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)
      .select(
        col("source"),
        to_timestamp(col("timestamp")).as("timestamp"),
        col("embeddings"),
        col("cleaned_ref"),
        col("color"),
        col("category"),
        countryFromRawJson(col("country")).as("country"),
        col("embeddings_type"),
        col("for_matching"),
        col("_corrupt_record").isNotNull.as("__malformed"))

  /** The scalar-or-array coercion over raw JSON text (the isinstance
    * checks of `embeddings-pipeline.py:211-214`): `'["US"]'` parses as an
    * array, `'FR'` wraps into one, empty/null stays null. */
  private def countryFromRawJson(c: Column): Column =
    when(c.isNull || c === "", lit(null).cast(ArrayType(StringType)))
      .when(ltrim(c).startsWith("["), from_json(c, ArrayType(StringType)))
      .otherwise(array(c))
}
