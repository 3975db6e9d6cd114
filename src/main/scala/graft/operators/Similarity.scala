package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoders}
import org.apache.spark.sql.functions._

import graft.functions.{F, ScoredId, TopKByScore}

/** Approximate-nearest-neighbor search over an embedding column
  * (BASELINE.json north star; SURVEY.md §7.5).
  *
  * Baseline: brute-force cosine top-k — the *scalable* brute force: the
  * small query set is broadcast, the corpus is scanned once in parallel
  * (BroadcastNestedLoopJoin), and per-query top-k uses a bounded-buffer
  * aggregate ([[graft.functions.TopKByScore]]) whose map-side partial
  * keeps only O(k) candidates per query per partition — the shuffle moves
  * ~k·|queries|·|partitions| rows, never the full |corpus|×|queries|
  * scored set (a `row_number` window would shuffle everything).
  * Scale path: sign-random-projection LSH bucketing so each query only
  * scores its bucket's candidates.
  */
object Similarity {

  /** groupBy(query_id) top-k over (neighbor_id, score) with bounded
    * partial aggregation; emits (query_id, rank, neighbor_id, cos). */
  private[operators] def perQueryTopK(scored: DataFrame, k: Int): DataFrame = {
    val topk = udaf(new TopKByScore(k), Encoders.product[ScoredId])
    scored.groupBy("query_id")
      .agg(topk(col("neighbor_id"), col("cos")).as("nbrs"))
      .select(col("query_id"), posexplode(col("nbrs")).as(Seq("pos", "nbr")))
      .select(col("query_id"), (col("pos") + 1).cast("long").as("rank"),
        col("nbr.id").as("neighbor_id"), col("nbr.score").as("cos"))
  }

  /** Exact top-k neighbors per query vector by cosine similarity.
    * Output: (query_id, rank, neighbor_id, cos); ties broken by id for
    * determinism. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_v"))
    // spread: scan parallelism of the broadcast-nested-loop join equals the
    // corpus partition count — a single-split corpus would score on one core.
    val c = Par.spread(corpus).select(col(idCol).as("neighbor_id"), col(vecCol).as("c_v"))
    val scored = c.crossJoin(broadcast(q))
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", F.cosineSim(col("q_v"), col("c_v")))
      .select("query_id", "neighbor_id", "cos")
    perQueryTopK(scored, k)
  }

  /** Hard-negative mining for contrastive/embedding training: per query,
    * `kHard` HARD negatives (the exact cosine top-k non-self neighbors —
    * the near-misses a contrastive loss learns most from) plus `kRandom`
    * RANDOM negatives (deterministic hash-ranked sample of everything
    * else — the easy-negative floor that keeps the batch calibrated).
    * The standard two-tier negative mix of a retrieval-training pipeline
    * (the BM25 scaladoc's other half). Fully deterministic: hard ties
    * break by id, the random tier ranks by `mix64(query:candidate)` so
    * reruns and engines agree bit for bit.
    *
    * Output `(query_id, neg_type, rank, neighbor_id, cos)` — `cos` null
    * on the random tier (scoring it would defeat its purpose).
    *
    * Scale shape: the hard tier is [[bruteForceTopK]]'s broadcast-queries
    * corpus scan with the bounded top-k aggregate (swap in [[lshTopK]] /
    * `Ivf.probeIndex` for corpus-scale query batches — same contract);
    * the random tier is a second broadcast pass over the slim id column:
    * candidate ranking shuffles (query_id, id, hash) only, the hard-set
    * exclusion is a broadcast anti join of `kHard·|queries|` rows. */
  def hardNegatives(queries: DataFrame, corpus: DataFrame, kHard: Int,
      kRandom: Int, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val hard = bruteForceTopK(queries, corpus, kHard, idCol, vecCol)
    val q = queries.select(col(idCol).as("query_id"))
    val c = Par.spread(corpus).select(col(idCol).as("neighbor_id"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("query_id")
      .orderBy(col("__h").asc, col("neighbor_id").asc)
    val rnd = c.crossJoin(broadcast(q))
      .where(col("query_id") =!= col("neighbor_id"))
      .join(broadcast(hard.select("query_id", "neighbor_id")),
        Seq("query_id", "neighbor_id"), "left_anti")
      .withColumn("__h", graft.functions.F.mix64(concat(
        col("query_id").cast("string"), lit(":"),
        col("neighbor_id").cast("string"))))
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= kRandom)
    hard.select(col("query_id"), lit("hard").as("neg_type"),
        col("rank").cast("long").as("rank"), col("neighbor_id"), col("cos"))
      .unionByName(rnd.select(col("query_id"), lit("random").as("neg_type"),
        col("rank"), col("neighbor_id"),
        lit(null).cast("double").as("cos")))
  }

  /** LSH-bucketed ANN top-k: queries only score corpus vectors sharing
    * their sign-random-projection bucket in at least one of `tables`
    * independent bucketings. Recall < 1 by construction; `planes` trades
    * candidate-set size for recall, `tables` buys recall back.
    *
    * @param dim embedding width (schema constant — no data sniffing). */
  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int, dim: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      planes: Int = 16, tables: Int = 2, seed: Long = 42L): DataFrame = {
    // ONE corpus scan: every table's bucket comes from one projection (an
    // array of per-table SrpBucket values, posexploded to (table, bucket)),
    // and the broadcast bucket join runs once on (table, bucket). A
    // per-table loop would rescan + re-bucket the corpus `tables` times —
    // the scans are the cost at 100 TB, not the hashes.
    def exploded(df: DataFrame, id: String, vec: String): DataFrame =
      Dedup.withSrpBuckets(df, vecCol, planes, seed, dim, tables)
        .select(col(idCol).as(id), col(vecCol).as(vec),
          posexplode(col("__buckets")).as(Seq("__table", "__bucket")))
    val qb = exploded(queries, "query_id", "q_v")
    val cb = exploded(Par.spread(corpus), "neighbor_id", "c_v")
    // score BEFORE the cross-table dedup: cosine is map-side and identical
    // for a pair in every table, so max() dedups while the exchange moves
    // (query, neighbor, cos) scalars — not two vectors per candidate row.
    val scored = cb.join(broadcast(qb), Seq("__table", "__bucket"))
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", F.cosineSim(col("q_v"), col("c_v")))
      .groupBy("query_id", "neighbor_id").agg(max(col("cos")).as("cos"))
    perQueryTopK(scored, k)
  }

  /** Sign-bit (1-bit-per-dimension) binary signature of the first `dim`
    * components, packed into two 32-bit halves (two BIGINTs — 63-bit
    * shifts would overflow a signed mirror). Hamming distance between
    * signatures approximates angular distance: 32 bytes of signature per
    * vector instead of `4·dim`, so a signature scan is memory-bandwidth
    * cheap — the FAISS-style binary prefilter. */
  private[operators] def withBinarySig(df: DataFrame, vecCol: String,
      dim: Int): DataFrame = {
    require(dim <= 64, s"binary signature packs <= 64 dims, got $dim")
    def half(lo: Int, hi: Int): Column =
      (lo until hi).map(i =>
        when(element_at(col(vecCol), i + 1) >= 0f,
          lit(1L << (i % 32))).otherwise(lit(0L)))
        .reduce(_ + _)
    df.withColumn("__sig_lo", half(0, math.min(32, dim)))
      .withColumn("__sig_hi", if (dim > 32) half(32, dim) else lit(0L))
  }

  /** Binary-quantized ANN: rank the corpus per query by HAMMING distance
    * over sign-bit signatures (integer, deterministic, tie-broken by id),
    * keep `candidates` per query, then exact-cosine re-rank to top-k —
    * approximate recall, exact arithmetic at every step.
    *
    * Scale shape: the signature pass scans 32 bytes/vector instead of the
    * full embedding (the candidate generation is bandwidth-bound, not
    * FLOP-bound), per-query Hamming top-C uses the bounded partial
    * aggregate (shuffle ≈ C·|queries|·|partitions| scalar rows), and full
    * vectors are joined back ONLY for the C·|queries| survivors. */
  def binaryRerankTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      dim: Int, candidates: Int = 100,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(candidates >= k, s"candidates ($candidates) must be >= k ($k)")
    val q = withBinarySig(queries, vecCol, dim)
      .select(col(idCol).as("query_id"), col("__sig_lo").as("__q_lo"),
        col("__sig_hi").as("__q_hi"))
    val c = withBinarySig(Par.spread(corpus), vecCol, dim)
      .select(col(idCol).as("neighbor_id"), col("__sig_lo"), col("__sig_hi"))
    // Hamming rank rides the bounded top-k aggregate (score = −ham, and
    // TopKByScore's (score desc, id asc) order makes selection
    // deterministic) — a row_number window here would shuffle the whole
    // |corpus|×|queries| scored set instead of O(C) rows per partition.
    val ham = c.crossJoin(broadcast(q))
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("__ham",
        bit_count(col("__sig_lo").bitwiseXOR(col("__q_lo"))) +
        bit_count(col("__sig_hi").bitwiseXOR(col("__q_hi"))))
    val cand = perQueryTopK(
      ham.select(col("query_id"), col("neighbor_id"),
        (-col("__ham")).cast("double").as("cos")), candidates)
      .select("query_id", "neighbor_id")
    // vectors join back only for the surviving candidate ids
    val qv = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_v"))
    val cv = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("c_v"))
    val scored = cand.join(cv, "neighbor_id").join(broadcast(qv), "query_id")
      .withColumn("cos", F.cosineSim(col("q_v"), col("c_v")))
      .select("query_id", "neighbor_id", "cos")
    perQueryTopK(scored, k)
  }

  /** Labeled retrieval evaluation — the metric harness an embedding-
    * model pipeline runs per checkpoint: per query, exact cosine top-k
    * over the corpus, relevance = same `labelCol` value, and the
    * standard rank metrics in the engine's integer discipline:
    * `first_rel` (rank of the first relevant hit, null if none),
    * `rr_micro` = 1000000 div first_rel (MRR's summand; 0 if none),
    * `hits` (relevant in the top k), `n_rel` (relevant in the whole
    * corpus, self excluded — queries are assumed drawn from the corpus,
    * matching bruteForceTopK's self-exclusion), and `recall_permille` =
    * 1000·hits div min(k, n_rel) (R-capped recall@k, 0 when a label is
    * a singleton). Means over queries are one trivial agg away; the
    * per-query rows are the artifact worth keeping (per-slice drill-
    * down).
    *
    * An EVAL op by contract (the recall-harness family): the exact
    * top-k is the labeled quadratic ground truth, run at sample scale;
    * swap in lshTopK/Ivf.probeIndex for corpus-scale sweeps. The label
    * histogram is a broadcast (|labels| rows); the top-k table joins
    * the corpus labels as a broadcast of |queries|·k rows — the corpus
    * itself is scanned once. */
  def retrievalEval(queries: DataFrame, corpus: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      labelCol: String = "label"): DataFrame = {
    val topk = bruteForceTopK(queries, corpus, k, idCol, vecCol)
    val qLab = queries.select(col(idCol).as("query_id"), col(labelCol).as("__ql"))
    val cLab = corpus.select(col(idCol).as("neighbor_id"), col(labelCol).as("__cl"))
    val hist = corpus.groupBy(col(labelCol).as("__ql"))
      .agg(count(lit(1)).as("__n_lab"))
    val marked = cLab
      .join(broadcast(topk.join(broadcast(qLab), Seq("query_id"))),
        Seq("neighbor_id"))
      .withColumn("__rel", (col("__ql") === col("__cl")).cast("long"))
    marked.groupBy("query_id")
      .agg(min(when(col("__rel") === 1L, col("rank"))).as("first_rel"),
        sum("__rel").as("hits"), max("__ql").as("__ql"))
      .join(broadcast(hist), Seq("__ql"), "left")
      .select(col("query_id"), col("first_rel"),
        coalesce(expr("1000000L div first_rel"), lit(0L)).as("rr_micro"),
        col("hits"),
        (coalesce(col("__n_lab"), lit(1L)) - 1L).as("n_rel"),
        expr(s"case when least(${k}L, coalesce(__n_lab, 1L) - 1L) > 0 " +
          s"then 1000L * hits div least(${k}L, coalesce(__n_lab, 1L) - 1L) " +
          "else 0L end").as("recall_permille"))
  }

  /** Reciprocal-rank fusion (Cormack/Clarke/Buettcher 2009) — the
    * standard hybrid-retrieval combiner: each input list contributes
    * `scale div (kRrf + rank)` per (query, doc) and documents are
    * re-ranked by the summed contribution. Score-free by design (ranks
    * only), so a lexical BM25 list and a vector ANN list fuse without
    * any score calibration; kept in the engine's integer discipline
    * (`div`, micro-scale) so the oracle mirrors it bit for bit.
    *
    * Inputs: `(name, df)` pairs where each df has columns
    * `(query_id, id, rank)` with rank 1-based within query. Output:
    * `(query_id, doc_id, rank_<name>..., rrf_micro)`, top `k` per query
    * by (rrf desc, doc_id asc); a doc absent from a list carries a null
    * rank there and contributes 0.
    *
    * Scale shape: every input is already a bounded per-query top-k, so
    * the fusion joins |queries|·k-row tables on (query_id, doc_id) —
    * slim exchanges whatever the corpus size; the corpus itself never
    * reaches this operator. */
  def rrfFuse(lists: Seq[(String, DataFrame)], k: Int,
      kRrf: Long = 60L, scale: Long = 1000000L): DataFrame = {
    require(lists.nonEmpty, "rrfFuse needs at least one ranked list")
    // names become rank_<name> columns and are interpolated into expr()
    // SQL — a dash would parse as subtraction, a duplicate as an
    // ambiguous reference, both failing far from the bad argument
    require(lists.map(_._1).distinct.size == lists.size,
      s"duplicate list names: ${lists.map(_._1).mkString(", ")}")
    lists.foreach { case (name, _) =>
      require(name.matches("[A-Za-z][A-Za-z0-9_]*"),
        s"list name '$name' is not a plain identifier")
    }
    val tagged = lists.map { case (name, df) =>
      df.select(col("query_id"), col("id").as("doc_id"),
        col("rank").cast("long").as(s"rank_$name"))
    }
    val joined = tagged.reduce(_.join(_, Seq("query_id", "doc_id"), "full_outer"))
    val contrib = lists.map { case (name, _) =>
      coalesce(expr(s"${scale}L div (${kRrf}L + rank_$name)"), lit(0L))
    }.reduce(_ + _)
    Dedup.topKPerKey(joined.withColumn("rrf_micro", contrib), k,
      Seq("query_id"), Seq(col("rrf_micro").desc, col("doc_id").asc))
  }
}
