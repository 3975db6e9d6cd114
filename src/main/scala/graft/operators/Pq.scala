package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.F

/** Product-quantized ANN (Jégou et al. 2011) — the memory-bandwidth tier
  * of the ANN family between the 1-bit [[Similarity.binaryRerankTopK]]
  * signatures and the full-vector [[Ivf]] cells: each corpus vector
  * compresses to `m` small integers (codes into per-subspace codebooks),
  * candidate generation scores those codes ASYMMETRICALLY against the
  * full-precision query (ADC), and the survivors get an exact-cosine
  * re-rank. At 100 TB the candidate scan reads `m` ints/vector instead of
  * `4·dim` bytes — like the binary tier but with a tunable
  * accuracy/size knob (`ksub`, `m`) instead of a fixed sign bit, the
  * reason FAISS's workhorse index is IVF-PQ.
  *
  * Reference anchor: the reference pipeline stores raw embeddings and
  * delegates search to its warehouse (`embeddings-pipeline.py` merge
  * target); the ANN family is this engine's north-star extension surface.
  */
object Pq {

  /** Deterministic untrained codebooks: the first `ksub` corpus vectors
    * (by id) sliced per subspace — the SQL-mirrorable seeding that lets
    * `pq_recall` carry a full-algorithm oracle (the same trick as
    * `ivf_recall`'s seed centroids). Bounded collect: ksub rows. */
  def seedCodebooks(corpus: DataFrame, m: Int, ksub: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): Seq[Seq[Seq[Double]]] = {
    // numeric-agnostic element read: the raw corpus column is
    // array<float>, but residual training (Ivf.attachPq residual=true)
    // seeds from a computed array<double> column
    val rows = corpus.orderBy(col(idCol)).limit(ksub)
      .select(col(vecCol)).collect()
      .map(_.getSeq[Number](0).map(_.doubleValue).toIndexedSeq)
    require(rows.nonEmpty, "empty corpus")
    val dim = rows.head.size
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val dsub = dim / m
    (0 until m).map(mi => rows.toIndexedSeq.map(v =>
      v.slice(mi * dsub, (mi + 1) * dsub)))
  }

  /** Per-subspace k-means refinement of `init` (Lloyd iterations on each
    * subspace independently — PQ training exactly as published). A
    * codeword that loses all members keeps its previous value. Same
    * distributed shape as [[Ivf.trainCentroids]]: per iteration ONE
    * assignment pass (scan-stage [[graft.functions.PqCodes]]) and one
    * (subspace, code, dim) mean aggregate — map-side combined, bounded by
    * m·ksub·dsub cells; train on a sample at 100 TB, like every
    * quantizer. */
  def trainCodebooks(corpus: DataFrame, init: Seq[Seq[Seq[Double]]],
      iters: Int = 2, vecCol: String = "embedding"): Seq[Seq[Seq[Double]]] = {
    val m = init.size
    val dsub = init.head.head.size
    val spread = Par.spread(corpus).persist()
    try {
      var cb = init
      var it = 0
      while (it < iters) {
        val assigned = spread
          .select(col(vecCol).as("__v"), F.pqCodes(col(vecCol), cb).as("__codes"))
          .select(col("__v"), posexplode(col("__codes")).as(Seq("__m", "__code")))
          .select(col("__m"), col("__code"),
            posexplode(slice(col("__v"), col("__m") * lit(dsub) + lit(1),
              lit(dsub))).as(Seq("__dim", "__x")))
          .groupBy("__m", "__code", "__dim")
          .agg(avg(col("__x").cast("double")).as("__mean"))
          .collect()
          .map(r => (r.getInt(0), r.getInt(1), r.getInt(2)) -> r.getDouble(3))
          .toMap // bounded: m * ksub * dsub entries
        cb = cb.zipWithIndex.map { case (words, mi) =>
          words.zipWithIndex.map { case (w, j) =>
            w.indices.map(d => assigned.getOrElse((mi, j + 1, d), w(d)))
          }
        }
        it += 1
      }
      cb
    } finally { spread.unpersist(); () }
  }

  /** PQ-ADC ANN: encode the corpus (scan-stage), rank per query by the
    * asymmetric score, keep `candidates`, exact-cosine re-rank to top-k.
    * Output (query_id, rank, neighbor_id, cos) like the other tiers;
    * `candidates == |corpus|` degenerates to exact brute force (the
    * re-rank sees everything).
    *
    * Scale shape mirrors [[Similarity.binaryRerankTopK]]: candidate
    * generation is a bandwidth-cheap codes scan against broadcast
    * queries, per-query top-C rides the bounded partial aggregate, and
    * full vectors join back only for the C·|queries| survivors. */
  def pqRerankTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      codebooks: Seq[Seq[Seq[Double]]], candidates: Int = 100,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(candidates >= k, s"candidates ($candidates) must be >= k ($k)")
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_v"))
    val c = Par.spread(corpus).select(col(idCol).as("neighbor_id"),
      F.pqCodes(col(vecCol), codebooks).as("__codes"))
    val scored = c.crossJoin(broadcast(q))
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        F.pqAdc(col("q_v"), col("__codes"), codebooks).as("cos"))
    val cand = Similarity.perQueryTopK(scored, candidates)
      .select("query_id", "neighbor_id")
    val cv = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("c_v"))
    val rescored = cand.join(cv, "neighbor_id").join(broadcast(q), "query_id")
      .withColumn("cos", F.cosineSim(col("q_v"), col("c_v")))
      .select("query_id", "neighbor_id", "cos")
    Similarity.perQueryTopK(rescored, k)
  }

  /** The DuckDB mirror of the seed-codebook PQ path, for the `pq_recall`
    * oracle: assignment = `list_distance` per subspace (same ascending
    * fold + sqrt as [[graft.functions.PqOps.codes]], ties to the lower
    * codeword via `ORDER BY d, j`), ADC = `list_inner_product` terms
    * summed in ascending subspace order — the exact computation the
    * expressions run, in SQL. `nQueries`/`ksub` select the same id
    * prefixes the Spark query uses; recall tail matches `recallVsExact`. */
  def pqRecallSql(m: Int, dsub: Int, ksub: Int, nQueries: Int,
      candidates: Int, k: Int): String = {
    val adcTerms = (0 until m).map { mi =>
      val lo = mi * dsub + 1
      val hi = (mi + 1) * dsub
      s"list_inner_product(q.qv[$lo:$hi], s$mi.sv[$lo:$hi])"
    }.mkString("\n    + ")
    val seedJoins = (0 until m)
      .map(mi => s"JOIN seeds s$mi ON s$mi.j = c.cs[${mi + 1}]").mkString("\n  ")
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |seeds AS (SELECT vec_id AS j, v AS sv FROM e WHERE vec_id < $ksub),
       |sub AS (SELECT m, 1 + m*$dsub AS lo, (m+1)*$dsub AS hi FROM range($m) t(m)),
       |a AS (SELECT c.vec_id, sub.m, s.j,
       |        list_distance(c.v[sub.lo:sub.hi], s.sv[sub.lo:sub.hi]) AS d
       |      FROM e c, sub, seeds s),
       |codes AS (SELECT vec_id, m, j FROM (
       |    SELECT vec_id, m, j,
       |      row_number() OVER (PARTITION BY vec_id, m ORDER BY d, j) AS rn
       |    FROM a) WHERE rn = 1),
       |carr AS (SELECT vec_id, list(j ORDER BY m) AS cs FROM codes GROUP BY vec_id),
       |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < $nQueries),
       |adc AS (SELECT q.query_id, c.vec_id AS neighbor_id,
       |    $adcTerms AS score
       |  FROM carr c
       |  $seedJoins
       |  CROSS JOIN q
       |  WHERE c.vec_id <> q.query_id),
       |cand AS (SELECT query_id, neighbor_id FROM (
       |    SELECT query_id, neighbor_id,
       |      row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rn
       |    FROM adc) WHERE rn <= $candidates),
       |ap AS (SELECT query_id, neighbor_id FROM (
       |    SELECT c.query_id, c.neighbor_id,
       |      row_number() OVER (PARTITION BY c.query_id
       |        ORDER BY list_cosine_similarity(eq.v, ec.v) DESC, c.neighbor_id) AS rn
       |    FROM cand c JOIN e eq ON eq.vec_id = c.query_id
       |                JOIN e ec ON ec.vec_id = c.neighbor_id) WHERE rn <= $k),
       |ex AS (SELECT query_id, neighbor_id FROM (
       |    SELECT q.query_id, e2.vec_id AS neighbor_id,
       |      row_number() OVER (PARTITION BY q.query_id
       |        ORDER BY list_cosine_similarity(q.qv, e2.v) DESC, e2.vec_id) AS rn
       |    FROM q, e e2 WHERE e2.vec_id <> q.query_id) WHERE rn <= $k)
       |SELECT (SELECT count(*) FROM ex) AS n_exact,
       |  (SELECT count(*) FROM ap) AS n_approx,
       |  (SELECT count(*) FROM ex JOIN ap USING (query_id, neighbor_id)) AS n_hit,
       |  CAST((SELECT count(*) FROM ex JOIN ap USING (query_id, neighbor_id)) * 1000
       |       // (SELECT count(*) FROM ex) AS BIGINT) AS recall_permille""".stripMargin
  }
}
