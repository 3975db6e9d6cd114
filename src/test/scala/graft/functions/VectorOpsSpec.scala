package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

class VectorOpsSpec extends SparkSpecBase {
  import spark.implicits._

  test("cosine/dot/norm match manual math on float arrays") {
    val a = Seq(1.0f, 2.0f, 3.0f)
    val b = Seq(-1.0f, 0.5f, 2.0f)
    val df = Seq((a, b)).toDF("a", "b")
    val Array(row) = df.select(
      F.dotProduct(col("a"), col("b")).as("dot"),
      F.l2Norm(col("a")).as("na"),
      F.cosineSim(col("a"), col("b")).as("cos")).collect()
    val dot = 1.0 * -1.0 + 2.0 * 0.5 + 3.0 * 2.0
    val na = math.sqrt(1.0 + 4.0 + 9.0)
    val nb = math.sqrt(1.0 + 0.25 + 4.0)
    assert(row.getDouble(0) == dot)
    assert(row.getDouble(1) == na)
    assert(row.getDouble(2) == dot / (na * nb))
  }

  test("zero-norm vectors yield cosine 0.0, and nulls propagate") {
    val df = Seq((Seq(0.0f, 0.0f), Seq(1.0f, 1.0f))).toDF("a", "b")
    assert(df.select(F.cosineSim(col("a"), col("b"))).head().getDouble(0) == 0.0)
    val withNull = df.select(F.cosineSim(lit(null).cast("array<float>"), col("b")))
    assert(withNull.head().isNullAt(0))
  }

  test("double arrays are accepted without widening loss") {
    val df = Seq((Seq(1.5, 2.5), Seq(2.0, 4.0))).toDF("a", "b")
    assert(df.select(F.dotProduct(col("a"), col("b"))).head().getDouble(0) == 13.0)
  }
}
