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

  test("poolEmbeddings: element-wise fixed-point sum per group") {
    val df = Seq(
      (1, Seq(1.0f, -2.0f)),
      (1, Seq(0.5f, 0.25f)),
      (2, Seq(3.0f, 0.0f))).toDF("label", "embedding")
    val out = Embeddings.poolEmbeddings(df, "embedding", Seq("label"))
      .orderBy("label")
      .select("label", "n_vecs", "pool_sum_q")
      .as[(Int, Long, Seq[Long])].collect().toSeq
    val s = 1L << Embeddings.PoolScaleBits
    assert(out == Seq(
      (1, 2L, Seq((1.5 * s).toLong, (-1.75 * s).toLong)),
      (2, 1L, Seq(3 * s, 0L))))
  }

  test("centroidDrift: planted shift measured exactly; identical slices drift 0") {
    val s = 1L << Embeddings.PoolScaleBits
    // group "same": identical vectors on both sides -> drift 0
    // group "shifted": side B moved +0.5 on dim 1, -0.25 on dim 2
    //   -> drift_l1 = 0.75*s, drift_max = 0.5*s (exactly representable)
    val a = Seq(("same", Seq(1.0f, 2.0f)), ("same", Seq(3.0f, 4.0f)),
      ("shifted", Seq(1.0f, 1.0f)), ("shifted", Seq(2.0f, 2.0f)),
      ("gone", Seq(9.0f, 9.0f))).toDF("label", "embedding")
    val b = Seq(("same", Seq(1.0f, 2.0f)), ("same", Seq(3.0f, 4.0f)),
      ("shifted", Seq(1.5f, 0.75f)), ("shifted", Seq(2.5f, 1.75f)),
      ("new", Seq(7.0f, 7.0f))).toDF("label", "embedding")
    val out = Embeddings.centroidDrift(a, b, "embedding", Seq("label"))
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    // one-sided groups are structural, not drift: excluded
    assert(out.keySet == Set("same", "shifted"))
    assert(out("same") == ((2L, 2L, 0L, 0L)))
    assert(out("shifted") == ((2L, 2L, (0.75 * s).toLong, (0.5 * s).toLong)),
      out("shifted").toString)
  }

  test("poolEmbeddings: mergeable — pooling the pools equals pooling the whole") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .withColumn("half", (col("vec_id") % 2).cast("int"))
    val whole = Embeddings.poolEmbeddings(emb, "embedding", Seq("label"))
      .select(col("label"), col("n_vecs"), col("pool_sum_q"))
    // pool each half separately, then merge by summing counts and vectors
    val halves = Embeddings.poolEmbeddings(emb, "embedding", Seq("label", "half"))
    val merged = halves.groupBy("label").agg(
      sum("n_vecs").as("n_vecs"),
      aggregate(collect_list(col("pool_sum_q")),
        transform(first(col("pool_sum_q")), _ => lit(0L)),
        (acc, v) => zip_with(acc, v, (a, b) => a + b)).as("pool_sum_q"))
    assert(whole.exceptAll(merged).isEmpty && merged.exceptAll(whole).isEmpty)
  }

  test("poolEmbeddings: ragged vectors sum up to the longest, missing = 0") {
    val df = Seq(
      (1, Seq(1.0f, 1.0f, 1.0f)),
      (1, Seq(2.0f))).toDF("label", "embedding")
    val s = 1L << Embeddings.PoolScaleBits
    val out = Embeddings.poolEmbeddings(df, "embedding", Seq("label"))
      .select("pool_sum_q").as[Seq[Long]].head()
    assert(out == Seq(3 * s, s, s))
  }

  test("randomProject: hand-checked fixed-point projection") {
    // dim=2, outDim=2: recompute the expected values from the same sign
    // matrix the expression uses
    val signs = graft.functions.RandomProject.signs(2, 2, 123L)
    val s = 1L << 20
    val df = Seq((1L, Seq(1.0f, -0.5f))).toDF("vec_id", "embedding")
    val got = Embeddings.randomProject(df, "embedding", outDim = 2,
      seed = 123L, dim = 2).select("projected").as[Seq[Long]].head()
    val q = Seq(s, -s / 2)
    val want = Seq(
      signs(0) * q(0) + signs(1) * q(1),
      signs(2) * q(0) + signs(3) * q(1))
    assert(got == want)
  }

  test("randomProject: linear on exactly-representable inputs; short vectors ok") {
    // multiples of 2^-20 are exact in float for these magnitudes, so
    // round(x*2^20) is linear and proj(a + b) == proj(a) + proj(b)
    val a = Seq(0.25f, -1.5f, 0.125f, 2.0f)
    val b = Seq(1.0f, 0.5f, -0.75f, 0.0f)
    val ab = a.zip(b).map { case (x, y) => x + y }
    val df = Seq((1L, a), (2L, b), (3L, ab)).toDF("vec_id", "embedding")
    val pr = Embeddings.randomProject(df, "embedding", outDim = 8,
        seed = 9L, dim = 4)
      .select("vec_id", "projected").as[(Long, Seq[Long])].collect().toMap
    assert(pr(3L) == pr(1L).zip(pr(2L)).map { case (x, y) => x + y })
    // a vector shorter than dim contributes only its present components:
    // equal to the zero-padded twin
    val short = Seq((1L, Seq(1.0f, -2.0f)), (2L, Seq(1.0f, -2.0f, 0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val ps = Embeddings.randomProject(short, "embedding", outDim = 8,
        seed = 9L, dim = 4)
      .select("projected").as[Seq[Long]].collect()
    assert(ps(0) == ps(1))
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

  test("normOutliers: planted zero and exploding vectors land in the right tails") {
    val vecs = Seq(
      (1L, Array(0f, 0f)),          // collapsed — low tail, norm 0
      (2L, Array(100f, 0f)),        // exploding — high tail
      (3L, Array(1f, 0f)),
      (4L, Array(0f, 2f))).toDF("vec_id", "embedding")
    val out = Embeddings.normOutliers(vecs, k = 1)
      .as[(String, Long, Long)].collect().toSet
    val q = 1048576L
    assert(out == Set(
      ("low", 1L, 0L),
      ("high", 2L, (100L * q) * (100L * q))))
    // ties break by id: two identical-norm vectors, k=1 keeps smaller id
    val tie = Seq((7L, Array(1f)), (5L, Array(1f))).toDF("vec_id", "embedding")
    assert(Embeddings.normOutliers(tie, k = 1)
      .where($"tail" === "low").select("vec_id").as[Long].head() == 5L)
  }
}
