package graft.schema

import org.apache.spark.sql.types._

/** Contract schemas derived from the reference (SURVEY.md §1.4).
  *
  * The reference reads schemaless Mongo documents defensively and emits a
  * fixed relational schema; we declare both ends as `StructType` once and
  * read loosely / emit strictly.
  */
object Schemas {

  /** Embedding vector width from the target DDL `VECTOR(FLOAT, 128)`
    * (reference `CONFIGURATION.md:109`). */
  val EmbeddingDim = 128

  /** Merge-key length cap (reference `embeddings-pipeline.py:205`,
    * `CONFIGURATION.md:52`). */
  val MainRefcoMaxLength = 100

  /** Source document contract — fields actually read at
    * `embeddings-pipeline.py:185-226` (FIXTURES.md §A.1). */
  val sourceDoc: StructType = StructType(Seq(
    StructField("source", StringType),
    StructField("timestamp", TimestampType),
    StructField("embeddings", ArrayType(FloatType)),
    StructField("cleaned_ref", StringType),
    StructField("color", StringType),
    StructField("category", StringType),
    StructField("country", ArrayType(StringType)),
    StructField("embeddings_type", StringType),
    StructField("for_matching", BooleanType)))

  /** Transformed record staged to Parquet — built at
    * `embeddings-pipeline.py:219-228` (FIXTURES.md §A.2). */
  val stagedRecord: StructType = StructType(Seq(
    StructField("cleaned_ref", StringType),
    StructField("category", StringType),
    StructField("main_refco", StringType),
    StructField("display_name", StringType),
    StructField("embeddings_type", StringType),
    StructField("for_matching", BooleanType),
    StructField("embedding_vector", ArrayType(FloatType)),
    StructField("original_timestamp", StringType)))

  /** Target table — DDL at `CONFIGURATION.md:101-112` (FIXTURES.md §A.3). */
  val target: StructType = StructType(Seq(
    StructField("cleaned_ref", StringType),
    StructField("category", StringType),
    StructField("main_refco", StringType, nullable = false),
    StructField("display_name", StringType),
    StructField("display_name_id", LongType),
    StructField("embeddings_type", StringType),
    StructField("for_matching", BooleanType),
    StructField("embedding_vector", ArrayType(FloatType)),
    StructField("original_timestamp", StringType),
    StructField("embedding_inserted_at", TimestampType)))

  /** Dimension table `sources_config`
    * (reference `embeddings-pipeline.py:287,302,325-326`, FIXTURES.md §A.4). */
  val sourcesConfig: StructType = StructType(Seq(
    StructField("display_name", StringType, nullable = false),
    StructField("display_name_id", LongType, nullable = false)))
}
