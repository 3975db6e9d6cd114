package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

class EmbeddingsSpec extends SparkSpecBase {
  import spark.implicits._

  test("int8 quantization roundtrip error is bounded by scale/254") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = Embeddings.quantizeInt8(emb, "embedding")
    val err = q.select(
      array_max(
        zip_with(Embeddings.dequantize(col("q8"), col("q8_scale")),
          col("embedding"), (dq, x) => abs(dq - x.cast("double")))).as("max_err"),
      (col("q8_scale") / 254 + lit(1e-9)).as("bound"))
    assert(err.where(col("max_err") > col("bound")).count() == 0)
  }

  test("zero and empty vectors quantize safely") {
    val df = Seq(
      (1L, Seq(0f, 0f)),
      (2L, Seq.empty[Float])).toDF("vec_id", "embedding")
    val q = Embeddings.quantizeInt8(df, "embedding")
      .select("vec_id", "q8_scale", "q8").collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getSeq[Byte](2))).toMap
    assert(q(1L) == ((0.0, Seq(0: Byte, 0: Byte))))
    assert(q(2L) == ((0.0, Seq.empty[Byte])))
  }

  test("capPerKey: deterministic, bounded per key, subset of input") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val a = Dedup.capPerKey(docs, 5, Seq("source"), "doc_id")
    val counts = a.groupBy("source").count().select("count").as[Long].collect()
    assert(counts.forall(_ <= 5))
    val b = Dedup.capPerKey(docs, 5, Seq("source"), "doc_id")
    assert(a.select("doc_id").as[Long].collect().sorted
      .sameElements(b.select("doc_id").as[Long].collect().sorted))
  }
}
