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

  /** CJK ideographs [[asciiFold]] would silently drop (see
    * [[CjkUnmappedCount]]) — sum it in an `Observation` to make the
    * bounded-pinyin-table divergence measurable per run. */
  def cjkUnmapped(c: Column): Column =
    Glue.column(CjkUnmappedCount(Glue.expression(c)))

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

  /** Probe a 64-bit hash against a serialized Bloom filter literal
    * (see [[BloomMightContain]]). */
  def bloomMightContain(bloomBytes: Column, hash64: Column): Column =
    Glue.column(BloomMightContain(Glue.expression(bloomBytes), Glue.expression(hash64)))

  /** MinHash signature of an array<string> shingle column
    * (see [[MinHashSig]]). */
  def minHashSig(shingles: Column, numHashes: Int, seed: Long = 42L): Column =
    Glue.column(MinHashSig(Glue.expression(shingles), numHashes, seed))

  /** 64-bit SimHash of an array<string> word column (see [[SimHash64]]). */
  def mix64(s: Column): Column = Glue.column(Mix64Str(Glue.expression(s)))

  /** Exact collocation lift (permille) — big-integer arithmetic, immune to
    * the DECIMAL(38,0) ceiling (see [[LiftPermille]]). */
  def liftPermille(cab: Column, ca: Column, cb: Column, n: Long, m: Long): Column =
    Glue.column(LiftPermille(Glue.expression(cab), Glue.expression(ca),
      Glue.expression(cb), n, m))

  def kllSketchAgg(v: Column, k: Int = 200): Column =
    Glue.column(KllSketchAgg(Glue.expression(v), k).toAggregateExpression())

  def kllUnionAgg(sketch: Column, k: Int = 200): Column =
    Glue.column(KllUnionAgg(Glue.expression(sketch), k).toAggregateExpression())

  def kllQuantiles(sketch: Column, ranks: Seq[Double]): Column =
    Glue.column(KllQuantiles(Glue.expression(sketch), ranks))

  def freqSketchAgg(item: Column, maxMapSize: Int = 256): Column =
    Glue.column(FreqSketchAgg(Glue.expression(item), maxMapSize)
      .toAggregateExpression())

  def freqUnionAgg(sketch: Column, maxMapSize: Int = 256): Column =
    Glue.column(FreqUnionAgg(Glue.expression(sketch), maxMapSize)
      .toAggregateExpression())

  def freqTopItems(sketch: Column, minCount: Long): Column =
    Glue.column(FreqTopItems(Glue.expression(sketch), minCount))

  def cmSketchAgg(item: Column, depth: Int = 4, width: Int = 256): Column =
    Glue.column(CmSketchAgg(Glue.expression(item), depth, width)
      .toAggregateExpression())

  def cmUnionAgg(sketch: Column, depth: Int = 4, width: Int = 256): Column =
    Glue.column(CmUnionAgg(Glue.expression(sketch), depth, width)
      .toAggregateExpression())

  def cmQuery(sketch: Column, item: Column): Column =
    Glue.column(CmQuery(Glue.expression(sketch), Glue.expression(item)))

  def simHash64(words: Column): Column =
    Glue.column(SimHash64(Glue.expression(words)))

  /** LSH band hashes of a MinHash signature (see [[MinHashBands]]). */
  def minHashBands(sig: Column, bands: Int): Column =
    Glue.column(MinHashBands(Glue.expression(sig), bands))

  /** Count of array<string> elements in a fixed vocabulary
    * (see [[CountInSet]]). */
  def countInSet(words: Column, vocab: Seq[String]): Column =
    Glue.column(CountInSet(Glue.expression(words), vocab))

  /** Distinct word n-gram shingles of an array<string> column
    * (see [[WordShingles]]). */
  def wordShingles(words: Column, n: Int): Column =
    Glue.column(WordShingles(Glue.expression(words), n))

  /** Intra-document repetition counters over an array<string> word column
    * (see [[RepetitionStats]]). */
  def repetitionStats(words: Column): Column =
    Glue.column(RepetitionStats(Glue.expression(words)))

  /** Single-pass ASCII character-class counters over a string column
    * (see [[CharClassCensus]]). */
  def charClassCensus(s: Column): Column =
    Glue.column(CharClassCensus(Glue.expression(s)))

  /** Sign-random-projection LSH bucket id of an array<float|double> column
    * (see [[SrpBucket]]). */
  def srpBucket(vec: Column, planes: Int, seed: Long, dim: Int): Column =
    Glue.column(SrpBucket(Glue.expression(vec), planes, seed, dim))

  /** Achlioptas ±1 fixed-point random projection of an array<float|double>
    * column to `outDim` integer components (see [[RandomProject]]). */
  def randomProject(vec: Column, outDim: Int, seed: Long, dim: Int): Column =
    Glue.column(RandomProject(Glue.expression(vec), outDim, seed, dim))

  /** Dense literal-matrix × vector (the OPQ rotation; see [[MatVec]]). */
  def matVec(vec: Column, matrix: Seq[Seq[Double]]): Column =
    Glue.column(MatVec(Glue.expression(vec), matrix))

  /** 1-based product-quantization codes of a vector column (argmin-L2 per
    * subspace over literal codebooks; see [[PqCodes]]). */
  def pqCodes(vec: Column, codebooks: Seq[Seq[Seq[Double]]]): Column =
    Glue.column(PqCodes(Glue.expression(vec), codebooks))

  /** Asymmetric-distance PQ score of a full-precision query against a
    * codes column (see [[PqAdc]]). */
  def pqAdc(queryVec: Column, codes: Column,
      codebooks: Seq[Seq[Seq[Double]]]): Column =
    Glue.column(PqAdc(Glue.expression(queryVec), Glue.expression(codes), codebooks))

  /** Per-query flat ADC lookup table (see [[PqLut]]; r19). */
  def pqLut(queryVec: Column, codebooks: Seq[Seq[Seq[Double]]]): Column =
    Glue.column(PqLut(Glue.expression(queryVec), codebooks))

  /** ADC score from a precomputed [[pqLut]] table (see [[PqAdcLut]]);
    * `ksub` is the flat table's per-subspace stride. */
  def pqAdcLut(lut: Column, codes: Column, ksub: Int): Column =
    Glue.column(PqAdcLut(Glue.expression(lut), Glue.expression(codes), ksub))

  /** Dot of a vector against int codes (see [[DotCodes]]; r19). */
  def dotCodes(vec: Column, codes: Column): Column =
    Glue.column(DotCodes(Glue.expression(vec), Glue.expression(codes)))

  /** Ids of the `nprobe` nearest (cosine) centroids for a vector column
    * (see [[NearestCentroids]]). */
  def nearestCentroids(vec: Column, centroids: Seq[Seq[Double]], nprobe: Int): Column =
    Glue.column(NearestCentroids(Glue.expression(vec), centroids, nprobe))

  /** Polynomial rolling-hash fingerprint of an array<string> word column
    * (see [[PolyFingerprint]]). */
  def polyFingerprint(words: Column, wordMul: Long = 31L, docMul: Long = 131L,
      mod: Long = 1000000007L): Column =
    Glue.column(PolyFingerprint(Glue.expression(words), wordMul, docMul, mod))

  /** `floor(log2(x))` of a positive bigint in pure integer arithmetic —
    * NULL for x ≤ 0 (see [[IntLog2]]). */
  def intLog2(c: Column): Column = Glue.column(IntLog2(Glue.expression(c)))


  /** Empty string → null (used to reproduce the reference's
    * "suffix only when color is non-empty" semantics, `:198-199`). */
  def emptyToNull(c: Column): Column = when(c === lit(""), lit(null)).otherwise(c)

  /** Register the full custom-expression SQL surface on a live session
    * (`SELECT ascii_fold(x), minhash_sig(sh, 128), srp_bucket(v, ...)`) —
    * the same [[FunctionDefs]] set GraftExtensions injects cluster-wide. */
  def registerAll(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    FunctionDefs.all.foreach { case (name, _, builder) =>
      reg.createOrReplaceTempFunction(name, builder, "built-in")
    }
    // Typed aggregators register through the UDF registry (they are not
    // Expression builders): vector_sum_long is the pooling kernel —
    // partial-aggregable element-wise sum over array<long>.
    spark.udf.register("vector_sum_long",
      org.apache.spark.sql.functions.udaf(new VectorSumLong,
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()))
    // table functions (round 18): `SELECT * FROM graft_ann_topk(…)`
    val treg = spark.sessionState.tableFunctionRegistry
    TableFunctionDefs.all.foreach { case (name, _, builder) =>
      treg.createOrReplaceTempFunction(name, builder, "built-in")
    }
  }
}
