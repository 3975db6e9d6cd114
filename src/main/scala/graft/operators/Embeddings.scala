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

  /** Johnson–Lindenstrauss dimensionality reduction: project `vecCol` to
    * `outDim` integer components with a deterministic ±1 matrix
    * ([[graft.functions.RandomProject]]) — 4× (64→16) storage/bandwidth
    * cut for coarse candidate scoring; inner products are preserved in
    * expectation (JL), exact re-rank reads the original vectors. Per-row
    * codegen'd expression: scan-stage, zero shuffle. */
  def randomProject(df: DataFrame, vecCol: String, outDim: Int,
      seed: Long, dim: Int, out: String = "projected"): DataFrame =
    df.withColumn(out,
      graft.functions.F.randomProject(col(vecCol), outDim, seed, dim))

  /** Chunk→document embedding pooling: element-wise SUM of each group's
    * vectors plus the group count (mean pooling = sum / n downstream; we
    * emit the sum because it is the mergeable quantity — pooling pooled
    * groups works, and integer division conventions differ per consumer).
    *
    * Exactness contract: float elements are scaled to longs
    * (`round(x * 2^20)`) BEFORE summation, so the result is
    * order-independent and engine-exact — float accumulation order across
    * partitions would otherwise make the pooled vector nondeterministic
    * run-to-run (the same property the repo's DECIMAL aggregates rely on,
    * in fixed-point form). 2^20 keeps |x| ≤ 8e12 per element away from
    * Long overflow for any realistic group size.
    *
    * Scale shape: [[graft.functions.VectorSumLong]] is a partially
    * aggregable Aggregator — the exchange carries one dim-width array per
    * group per map partition (groups×dim), never the rows×dim blow-up of
    * the posexplode/groupBy-position shape.
    *
    * Output: (groupCols*, n_vecs, pool_sum_q: array<long>) with elements
    * in units of 2^-20.
    */
  val PoolScaleBits = 20

  def poolEmbeddings(df: DataFrame, vecCol: String,
      groupCols: Seq[String]): DataFrame = {
    val toQ = transform(col(vecCol),
      x => round(x.cast("double") * (1L << PoolScaleBits)).cast("long"))
    val vsum = org.apache.spark.sql.functions.udaf(
      new graft.functions.VectorSumLong,
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]())
    df.select(groupCols.map(col) :+ toQ.as("__q"): _*)
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_vecs"), vsum(col("__q")).as("pool_sum_q"))
  }

  /** Per-group embedding-centroid DRIFT between two corpus slices — the
    * embedding-space twin of the token-distribution `drift_tv` monitor:
    * when an upstream encoder is retrained or a crawl's content shifts,
    * the per-group mean vector moves before any scalar statistic does.
    * For each group present in BOTH slices: each side's centroid is the
    * elementwise integer `div` of its 2^-20-quantized pool sum by its
    * count (exact, order-independent — [[poolEmbeddings]]' guarantee),
    * and `drift_l1 = Σ_d |c_a[d] − c_b[d]|` in 2^-20 units; `drift_max`
    * is the worst single dimension. Groups on one side only are
    * structural (new/vanished), not drift — callers catch those with an
    * anti join, and this operator's inner join keeps the score exact.
    *
    * Scale shape: two [[poolEmbeddings]] passes (one exchange each,
    * groups×dim partial arrays) + a groups-sized join — the corpora are
    * never joined row-to-row. */
  def centroidDrift(a: DataFrame, b: DataFrame, vecCol: String,
      groupCols: Seq[String]): DataFrame = {
    val pa = poolEmbeddings(a, vecCol, groupCols)
      .withColumnRenamed("n_vecs", "a_n").withColumnRenamed("pool_sum_q", "a_sum")
    val pb = poolEmbeddings(b, vecCol, groupCols)
      .withColumnRenamed("n_vecs", "b_n").withColumnRenamed("pool_sum_q", "b_sum")
    pa.join(pb, groupCols)
      .withColumn("__ca", expr("transform(a_sum, v -> v div a_n)"))
      .withColumn("__cb", expr("transform(b_sum, v -> v div b_n)"))
      .select(groupCols.map(col) ++ Seq(
        col("a_n"), col("b_n"),
        expr("aggregate(zip_with(__ca, __cb, (x, y) -> abs(x - y)), 0L, (s, v) -> s + v)")
          .as("drift_l1"),
        expr("aggregate(zip_with(__ca, __cb, (x, y) -> abs(x - y)), 0L, (s, v) -> greatest(s, v))")
          .as("drift_max")): _*)
  }

  /** Embedding-norm health: the `k` vectors at each norm extreme — the
    * near-zero tail (collapsed/degenerate outputs an encoder bug or a
    * zero-padded ingest produces) and the exploding tail (unnormalized
    * or corrupt rows that dominate any dot-product retrieval). Norms in
    * the engine's exact fixed-point discipline: `q = round(x·2²⁰)` per
    * element ([[poolEmbeddings]]'s quantizer), `norm2_q = Σ q²` — order-
    * independent integer arithmetic, oracle-mirrorable. Output
    * `(tail ∈ {high, low}, vec_id, norm2_q)`, ties broken by id.
    *
    * Scale shape: one scan-stage map + two bounded TakeOrdereds (map-
    * side k-row buffers) — no full sort, no shuffle beyond the k-row
    * collect. */
  def normOutliers(df: DataFrame, idCol: String = "vec_id",
      vecCol: String = "embedding", k: Int = 10): DataFrame = {
    require(k >= 1)
    val q = transform(col(vecCol),
      x => round(x.cast("double") * (1L << PoolScaleBits)).cast("long"))
    val w = df.select(col(idCol).as("vec_id"),
      aggregate(q, lit(0L), (acc, v) => acc + v * v).as("norm2_q"))
    val hi = w.orderBy(col("norm2_q").desc, col("vec_id")).limit(k)
      .withColumn("tail", lit("high"))
    val lo = w.orderBy(col("norm2_q").asc, col("vec_id")).limit(k)
      .withColumn("tail", lit("low"))
    hi.unionByName(lo).select("tail", "vec_id", "norm2_q")
  }
}
