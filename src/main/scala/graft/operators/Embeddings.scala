package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding storage operators: scalar int8 quantization with a per-vector
  * scale — the standard 4× storage/bandwidth reduction for a 100 TB
  * embedding corpus (floats dominate the bytes; ANN candidate generation
  * tolerates quantization error, exact re-scoring uses the originals).
  *
  * Exact integer/float contract (engine-reproducible, no UDFs):
  * `scale = max(|v|)`, `q_i = round(v_i / scale * 127)` (int8 range),
  * `dq_i = q_i * scale / 127`. Zero vectors quantize to all-zero with
  * scale 0.
  */
object Embeddings {

  /** max(|v_i|) as double; 0.0 for empty/all-zero vectors. */
  def maxAbs(vec: Column): Column =
    coalesce(array_max(transform(vec, x => abs(x.cast("double")))), lit(0.0))

  /** Add `<out>` (array<tinyint>) and `<out>_scale` (double). */
  def quantizeInt8(df: DataFrame, vecCol: String,
      out: String = "q8"): DataFrame = {
    val scale = maxAbs(col(vecCol))
    val q = when(scale > 0,
      transform(col(vecCol),
        x => round(x.cast("double") / scale * 127).cast("tinyint")))
      .otherwise(transform(col(vecCol), _ => lit(0).cast("tinyint")))
    df.withColumn(s"${out}_scale", scale).withColumn(out, q)
  }

  /** Reconstruct array<double> from the int8 codes + scale. */
  def dequantize(qCol: Column, scaleCol: Column): Column =
    transform(qCol, q => q.cast("double") * scaleCol / 127)
}
