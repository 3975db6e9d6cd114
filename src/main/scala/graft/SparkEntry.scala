package graft

import java.sql.Timestamp

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.F
import graft.operators.{Anomaly, Correlate, DailyCounts, Experiment, Hnsw, IndexStore, TextIndex, TimeSeries, Web, Bpe, Cardinality, Clustering, Cooccur, Decontaminate, Dedup, EditDistance, Embeddings, Extract, Frequencies, Funnel, Graph, Ivf, Joins, Multimodal, Pq, Quantiles, Sampling, Scd2, Sessionize, Similarity, Sketch, TextAnalysis, Upsert, Validate}
import graft.streaming.IncrementalStream

/** Driver contract — one named query per implemented operator from
  * SURVEY.md §2 (+ the LLM-pipeline extension operators), each with an
  * equivalent DuckDB oracle in [[oracleSql]].
  *
  * Determinism rules applied throughout (the driver hash-compares values):
  *  - aggregates over doubles go through exact DECIMAL arithmetic and are
  *    cast to double only at the very end (float summation order would
  *    otherwise diverge between engines);
  *  - timestamps are emitted as formatted strings (Spark writes
  *    UTC-adjusted parquet timestamps, DuckDB reads naive ones — strings
  *    sidestep the logical-type mismatch);
  *  - every ranking has a total order (explicit tie-break columns);
  *  - cosine scores are bit-identical by construction: the Spark kernel
  *    widens float elements to double and accumulates ascending
  *    (VectorExprs.scala), exactly like DuckDB's
  *    `list_cosine_similarity(CAST(... AS DOUBLE[]), ...)`.
  */
object SparkEntry {

  /** Flagship query (reference merge-source, `embeddings-pipeline.py:297-326`)
    * on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("merge_source")(spark, "/root/testdata/sf0.001")

  // ---------------------------------------------------------------- helpers

  private def ts6(c: Column): Column = date_format(c, "yyyy-MM-dd HH:mm:ss.SSSSSS")

  /** Stand-in country_code on the documents table: null for "en" docs so the
    * reference's `"(None)"` display-name quirk (P6) is exercised. */
  private def docCountry: Column = when(col("lang") =!= "en", col("lang"))

  /** The documents table re-cast as the reference's source-document shape:
    * source→cleaned_ref-ish key parts, lang→color, doc_id→recency. */
  private def docRecord(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      Extract.mainRefco(col("source"), col("lang")).as("main_refco"),
      Extract.displayName(col("source"), docCountry).as("display_name"),
      col("n_chars"))

  // ---------------------------------------------------------------- queries

  /** ONE pair→connected-components materialization shared by the
    * text-survivor query family: `dedup_survivors` and
    * `dedup_survivors_best` run the identical n-gram-Jaccard pair stage
    * and CC (only the survivor rank differs), so each policy paying the
    * CC driver loop's fixed per-round cost separately is pure waste
    * (VERDICT r7 #3). Keyed by (session, dir); `localCheckpoint`
    * truncates the iterative lineage so reuse is a flat file-backed scan.
    * The testdata dirs are immutable, so no invalidation is needed. */
  private val ccCache =
    new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()
  // sessions whose application already carries the eviction listener —
  // the cache must not outlive its session (VERDICT r8 #4: dead sessions'
  // cached frames and localCheckpoint files were never released)
  private val ccListenerInstalled =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  private def installEvictionListener(s: SparkSession): String = {
    val sessKey = System.identityHashCode(s).toString
    if (ccListenerInstalled.add(sessKey))
      s.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          override def onApplicationEnd(
              e: org.apache.spark.scheduler.SparkListenerApplicationEnd): Unit =
            evictSharedCc(sessKey)
        })
    sessKey
  }

  private def sharedJaccardComponents(s: SparkSession, dir: String): DataFrame = {
    val sessKey = installEvictionListener(s)
    ccCache.computeIfAbsent(s"$sessKey#$dir", _ => {
      val pairs = graft.operators.Dedup.ngramJaccardPairs(
        Tables.documents(s, dir), "doc_id", "text", blockCol = "source",
        n = 3, thresholdNum = 1, thresholdDen = 50)
      graft.operators.Graph.connectedComponents(pairs, "a_id", "b_id")
        .localCheckpoint()
    })
  }

  /** ONE token-window span materialization shared by the passage query
    * family: `dup_passages` returns it and `dup_passage_clean` splices
    * by it — the w-token window exchange + census is the family's whole
    * cost, identical in both (same reuse argument as the CC cache). */
  private val spansCache =
    new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()
  private def sharedPassageSpans(s: SparkSession, dir: String): DataFrame = {
    val sessKey = installEvictionListener(s)
    spansCache.computeIfAbsent(s"$sessKey#$dir", _ =>
      graft.operators.Dedup.duplicatedPassageSpans(
        Tables.documents(s, dir), "doc_id", "text", w = 8).localCheckpoint())
  }

  /** ONE trained BPE merge list shared by the tokenizer query family:
    * training is fully deterministic, so `bpe_encode` reusing the merges
    * `bpe_train` computes changes nothing semantically — and the
    * realistic shape is train-once / encode-per-pass anyway. The train
    * cost stays VISIBLE in the suite as `bpe_train`'s own number (unlike
    * the CC/spans caches, no extra bench entry is needed); `bpe_encode`
    * reads as encode-only. Driver-side Seq, same eviction lifecycle. */
  private val bpeCache =
    new java.util.concurrent.ConcurrentHashMap[String, Seq[(String, String)]]()
  private def sharedBpeMerges(s: SparkSession, dir: String): Seq[(String, String)] = {
    val sessKey = installEvictionListener(s)
    bpeCache.computeIfAbsent(s"$sessKey#$dir", _ =>
      graft.operators.Bpe.train(Tables.documents(s, dir), "text", numMerges = 10)
        .collect().map(r => (r.getString(1), r.getString(2))).toSeq)
  }

  /** The fertility monitor's EVEN-doc-half training pass, cached with the
    * same session-keyed lifecycle (it cannot reuse the full-corpus merges
    * above — held-out scoring requires training to never see the odd
    * half). Bench bills the build as its own `bpe_fertility_train` entry
    * so `tokenizer_fertility` reads score-only. */
  private def sharedBpeMergesEven(s: SparkSession, dir: String): Seq[(String, String)] = {
    val sessKey = installEvictionListener(s)
    bpeCache.computeIfAbsent(s"$sessKey#$dir#even", _ =>
      graft.operators.Bpe.train(
          Tables.documents(s, dir).where(col("doc_id") % 2 === 0),
          "text", numMerges = 10)
        .collect().map(r => (r.getString(1), r.getString(2))).toSeq)
  }

  /** Bench hooks: drop + rebuild the even-half merge cache so its train
    * cost lands in exactly one labeled bench entry (the shared-CC/spans
    * honesty pattern). */
  private[graft] def resetSharedBpeEven(): Unit =
    bpeCache.keySet.removeIf(_.endsWith("#even"))
  private[graft] def buildSharedBpeEven(s: SparkSession, dir: String): Unit = {
    sharedBpeMergesEven(s, dir); ()
  }

  /** ONE layered-edge materialization shared by the graph-ANN family:
    * `ann_hnsw` and `hnsw_recall` search the IDENTICAL graph (same
    * corpus, same knobs — the recall harness measures the same search
    * brute force is compared against), so each paying the bucket-join +
    * top-m edge build separately is pure waste (the CC/spans reuse
    * argument). Keyed by (session, dir); `localCheckpoint` truncates the
    * build so reuse is a flat scan; Bench bills the build once as the
    * labeled `hnsw_edges_shared` entry. */
  private val hnswEdgeCache =
    new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()
  private def sharedHnswEdges(s: SparkSession, dir: String): DataFrame = {
    val sessKey = installEvictionListener(s)
    hnswEdgeCache.computeIfAbsent(s"$sessKey#$dir", _ =>
      Hnsw.knnEdges(Tables.embeddings(s, dir), "vec_id", "embedding",
        dim = 64, m = 8, maxLevel = 3, planes = 4, tables = 4)
        .localCheckpoint())
  }
  private[graft] def resetSharedHnswEdges(): Unit = hnswEdgeCache.clear()
  private[graft] def buildSharedHnswEdges(s: SparkSession, dir: String): Unit = {
    sharedHnswEdges(s, dir); ()
  }

  /** Drop one session's cached shared-stage frames (the listener's
    * target; checkpoint blocks die with the session's context). */
  private[graft] def evictSharedCc(sessKey: String): Unit = {
    ccCache.keySet.removeIf(_.startsWith(sessKey + "#"))
    spansCache.keySet.removeIf(_.startsWith(sessKey + "#"))
    bpeCache.keySet.removeIf(_.startsWith(sessKey + "#"))
    hnswEdgeCache.keySet.removeIf(_.startsWith(sessKey + "#"))
    ccListenerInstalled.remove(sessKey)
  }

  private[graft] def sharedCcKeyOf(s: SparkSession): String =
    System.identityHashCode(s).toString
  private[graft] def sharedCcSize: Int = ccCache.size

  /** Bench hook (VERDICT r8 #3): clear the cache, then time the shared
    * pair→CC build EXPLICITLY — `localCheckpoint` is eager, so the cost
    * lands here, making the survivor queries' own numbers interpretable
    * as incremental cost over one visible `cc_shared_build` entry. */
  private[graft] def resetSharedCc(): Unit = ccCache.clear()
  private[graft] def buildSharedCc(s: SparkSession, dir: String): Unit = {
    sharedJaccardComponents(s, dir); ()
  }
  private[graft] def sharedSpansSize: Int = spansCache.size
  private[graft] def resetSharedSpans(): Unit = spansCache.clear()
  private[graft] def sharedBpeSize: Int = bpeCache.size
  private[graft] def buildSharedBpe(s: SparkSession, dir: String): Unit = {
    sharedBpeMerges(s, dir); ()
  }
  private[graft] def buildSharedSpans(s: SparkSession, dir: String): Unit = {
    sharedPassageSpans(s, dir); ()
  }

  /** Recall combinator shared by the ANN recall harnesses
    * (`ivf_recall` / `binary_recall`): permille of the exact top-k pairs
    * the approximate ranking recovered. Pair sets are tiny (queries × k)
    * — the cost lives in the two rankings, not here. */
  private def recallVsExact(exact: DataFrame, approx: DataFrame): DataFrame = {
    val ex = exact.select("query_id", "neighbor_id")
    val ap = approx.select("query_id", "neighbor_id")
    val hit = ex.join(ap, Seq("query_id", "neighbor_id"), "left_semi")
    ex.agg(count(lit(1)).as("n_exact"))
      .crossJoin(ap.agg(count(lit(1)).as("n_approx")))
      .crossJoin(hit.agg(count(lit(1)).as("n_hit")))
      .withColumn("recall_permille", expr("n_hit * 1000 div n_exact"))
  }

  /** The registered demo lexicon for `topic_classify`: terms drawn from
    * the synthetic corpus vocabulary so every topic actually wins on
    * some documents; ONE definition feeds both the Spark query and the
    * generated VALUES clause of its oracle — no drift. */
  private val GraftLexicon: Seq[(String, String, Long)] = Seq(
    ("spark", "compute", 1000000L), ("query", "compute", 800000L),
    ("join", "compute", 600000L), ("scan", "compute", 500000L),
    ("customer", "commerce", 1000000L), ("order", "commerce", 800000L),
    ("part", "commerce", 500000L), ("line", "commerce", 400000L),
    ("window", "analytics", 700000L), ("data", "analytics", 500000L),
    ("row", "analytics", 400000L), ("table", "analytics", 300000L))

  /** Deterministic synthetic URL per doc id, shared by domain_census
    * and domain_cap (and mirrored closed-form by both oracles — one
    * definition, no drift): scheme-less for id%7=0, `:8080` port for
    * id%5=0, always a subdomain, `co.uk` multi-label suffix for
    * id%4=3. */
  private def syntheticUrl(id: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = {
    val tld = element_at(
      array(lit("com"), lit("org"), lit("io"), lit("co.uk")),
      (pmod(id, lit(4)) + 1).cast("int"))
    concat(
      when(pmod(id, lit(7)) === 0, lit("")).otherwise(lit("https://")),
      lit("sub"), pmod(id, lit(3)),
      lit(".site"), pmod(id, lit(97)), lit("."), tld,
      when(pmod(id, lit(5)) === 0, lit(":8080")).otherwise(lit("")),
      lit("/p/"), id)
  }

  /** Deterministic MESSY synthetic URL per doc id for the
    * canonicalization gates — every alias class the canonicalizer
    * handles, keyed off id arithmetic so the oracle can emit the
    * expected canonical closed-form: mixed-case scheme+host (id%2),
    * default `:443` port (id%5=0) vs real `:8080` (id%5=1), tracking
    * params in unsorted company (id%4=0), tracking-only query (id%4=1),
    * unsorted clean params (id%4=2), fragment (id%6=0), empty path
    * (id%9=0). */
  private def syntheticTrackedUrl(id: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = {
    val scheme = when(pmod(id, lit(2)) === 0, lit("HTTPS://"))
      .otherwise(lit("https://"))
    val host = concat(
      when(pmod(id, lit(2)) === 0, lit("SITE")).otherwise(lit("site")),
      pmod(id, lit(97)), lit(".com"))
    val port = when(pmod(id, lit(5)) === 0, lit(":443"))
      .when(pmod(id, lit(5)) === 1, lit(":8080")).otherwise(lit(""))
    val path = when(pmod(id, lit(9)) === 0, lit(""))
      .otherwise(concat(lit("/p/"), id))
    val query = when(pmod(id, lit(4)) === 0, lit("?utm_source=x&b=2&a=1"))
      .when(pmod(id, lit(4)) === 1, lit("?gclid=z"))
      .when(pmod(id, lit(4)) === 2, lit("?z=9&y=8"))
      .otherwise(lit(""))
    val frag = when(pmod(id, lit(6)) === 0, lit("#frag")).otherwise(lit(""))
    concat(scheme, host, port, path, query, frag)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // S1/F: filtered+projected scan with parquet pushdown.
    "pushdown_scan" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .where(col("l_returnflag") === "R" &&
          col("l_shipdate") >= to_timestamp(lit("1996-01-01 00:00:00")) &&
          col("l_shipdate") < to_timestamp(lit("1997-01-01 00:00:00")))
        .select("l_orderkey", "l_linenumber", "l_quantity")),

    // S2/A1: distinct-key scan.
    "distinct_scan" -> ((s, dir) => Tables.documents(s, dir).select("source").distinct()),

    // A2/A3-family: the classic pricing-summary aggregate, decimal-exact.
    "q1_agg" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
        .where(col("l_shipdate") <= to_timestamp(lit("1998-09-01 00:00:00")))
      val ep = col("l_extendedprice").cast("decimal(18,2)")
      val disc = col("l_discount").cast("decimal(12,2)")
      li.groupBy("l_returnflag", "l_linestatus").agg(
        sum(col("l_quantity").cast("decimal(12,2)")).cast("double").as("sum_qty"),
        sum(ep).cast("double").as("sum_base_price"),
        sum(ep * (lit(1).cast("decimal(12,2)") - disc)).cast("double").as("sum_disc_price"),
        count(lit(1)).as("count_order"))
    }),

    // J1-family: star-schema join, broadcast dims, exact decimal revenue.
    "star_join" -> ((s, dir) => {
      val cust = Tables.customer(s, dir).where(col("c_mktsegment") === "BUILDING")
      val ord = Tables.orders(s, dir)
        .where(col("o_orderdate") < to_timestamp(lit("1997-01-01 00:00:00")))
      val li = Tables.lineitem(s, dir)
        .where(col("l_shipdate") >= to_timestamp(lit("1997-01-01 00:00:00")))
      val rev = col("l_extendedprice").cast("decimal(18,2)") *
        (lit(1).cast("decimal(12,2)") - col("l_discount").cast("decimal(12,2)"))
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .groupBy("l_orderkey").agg(sum(rev).as("rev"))
        .orderBy(col("rev").desc, col("l_orderkey"))
        .limit(10)
        .select(col("l_orderkey"), col("rev").cast("double").as("revenue"))
    }),

    // F3/F4: per-source incremental watermark filter (strict > vs >=).
    "incremental_filter" -> ((s, dir) => {
      import s.implicits._
      val wm = Seq(
        ("click", Timestamp.valueOf("2024-01-20 00:00:00")),
        ("view", Timestamp.valueOf("2024-01-10 00:00:00"))).toDF("event_type", "wm")
      Extract.incrementalFilter(Tables.events(s, dir), wm,
          Timestamp.valueOf("2024-01-15 00:00:00"), tsCol = "ts", srcCol = "event_type")
        .select(col("event_id"), col("event_type"), ts6(col("ts")).as("ts_str"))
    }),

    // F2: non-null non-empty embeddings.
    "non_empty_embeddings" -> ((s, dir) =>
      Extract.nonEmptyEmbeddings(Tables.embeddings(s, dir), "embedding")
        .select(col("vec_id"), col("label"), size(col("embedding")).as("dim"))),

    // W1: keep-latest per key.
    "latest_per_key" -> ((s, dir) =>
      Dedup.latestPerKey(Tables.events(s, dir), Seq("user_id"),
          Seq(col("ts").desc, col("event_id").desc))
        .select(col("user_id"), col("event_id"), col("event_type"), ts6(col("ts")).as("ts_str"))),

    // §2.7: generalized top-k per key.
    "topk_per_key" -> ((s, dir) =>
      Dedup.topKPerKey(Tables.events(s, dir), 3, Seq("user_id"),
          Seq(col("value").desc, col("event_id")))
        .select("user_id", "event_id", "value")),

    // A2/A4: per-source max watermark.
    "max_watermark" -> ((s, dir) =>
      Tables.events(s, dir).groupBy("event_type")
        .agg(max(col("ts")).as("wm"))
        .select(col("event_type"), ts6(col("wm")).as("wm_str"))),

    // P2–P4: normalized, truncated merge key (custom ascii_fold expression).
    "main_refco" -> ((s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"),
          Extract.mainRefco(col("text"), col("lang")).as("main_refco"))),

    // P1–P8 + F7 composite: the full per-document transform (deriveRecord)
    // over a document-shaped source derived deterministically from the
    // documents table — exercises field defaults, the empty-color branch of
    // main_refco, the "(None)" display name, nullable embeddings_type,
    // for_matching default, ISO timestamps with and without micros, and the
    // null-timestamp row drop.
    "derive_record" -> ((s, dir) => {
      val src = Tables.documents(s, dir).select(
        col("doc_id"),
        col("source"),
        when(col("doc_id") % 97 =!= 0,
          timestamp_micros(lit(1704067200000000L) +
            col("doc_id") * 1000000L + (col("doc_id") % 2) * 123456L))
          .as("timestamp"),
        when(col("doc_id") % 13 =!= 0,
          array(col("doc_id").cast("float"), col("n_chars").cast("float")))
          .as("embeddings"),
        col("source").as("cleaned_ref"),
        when(col("lang") =!= "en", col("lang")).otherwise(lit("")).as("color"),
        when(col("doc_id") % 7 =!= 0, col("lang")).as("category"),
        when(col("lang") =!= "en", array(col("lang"))).as("country"),
        when(col("doc_id") % 5 =!= 0, lit("dense")).as("embeddings_type"),
        when(col("doc_id") % 3 === 0, lit(true)).as("for_matching"))
      Extract.deriveRecord(Extract.nonEmptyEmbeddings(src))
        .withColumn("emb_dim", size(col("embedding_vector")))
        .drop("embedding_vector")
    }),

    // P5 incl. scalar coercion: a scalar-string country column normalized
    // at ingest (coerceCountry), then first-element extraction.
    "country_code" -> ((s, dir) => {
      val scalar = Tables.documents(s, dir).select(
        col("doc_id"),
        when(col("doc_id") % 11 === 0, lit(null).cast("string"))
          .when(col("lang") === "en", lit(""))
          .otherwise(col("lang")).as("country"))
      Extract.coerceCountry(scalar)
        .select(col("doc_id"),
          Extract.countryCode(col("country")).as("country_code"))
    }),

    // P10: per-row error isolation — malformed rows land in the quarantine
    // side output with their failed checks (incl. the VECTOR(FLOAT, dim)
    // width gate), the batch continues.
    "quarantine" -> ((s, dir) => {
      val src = Tables.embeddings(s, dir).select(
        col("vec_id"),
        when(col("vec_id") % 10 === 1, array().cast("array<float>"))
          .when(col("vec_id") % 13 === 2, slice(col("embedding"), 1, 32))
          .when(col("vec_id") % 10 =!= 0, col("embedding")).as("embeddings"),
        when(col("vec_id") % 7 =!= 0,
          timestamp_micros(lit(1704067200000000L) + col("vec_id") * 1000000L))
          .as("timestamp"))
      val (_, bad) = Extract.quarantine(src, dim = 64, enforceDim = true)
      bad.select(col("vec_id"), array_join(col("__errors"), ",").as("errors"))
    }),

    // P6: display name incl. the "(None)" quirk.
    "display_name" -> ((s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"),
          Extract.displayName(col("source"), docCountry).as("display_name"))),

    // P7: Python-isoformat timestamp strings (no fraction when micros==0).
    "iso_timestamp" -> ((s, dir) =>
      Tables.events(s, dir)
        .select(col("event_id"), Extract.isoTimestamp(col("ts")).as("iso_ts"))),

    // Flagship: cast projection → window dedup → broadcast dim join
    // (reference merge-source, `embeddings-pipeline.py:297-326`).
    "merge_source" -> ((s, dir) => {
      val rec = docRecord(Tables.documents(s, dir))
      val deduped = Dedup.latestPerKey(rec, Seq("main_refco"), Seq(col("doc_id").desc))
      // Sort-free surrogate id: a deterministic polynomial hash of the name
      // (engine-portable, oracle recomputes it in SQL). A global
      // `row_number().over(Window.orderBy(...))` would serialize the dim
      // build onto one partition — fine for a bounded dim, a scale wart in
      // the flagship plan (and it logged WindowExec single-partition
      // warnings). Hashing keeps the dim build embarrassingly parallel.
      val dim = rec.select("display_name").distinct()
        .where(!col("display_name").endsWith("(None)"))
        .withColumn("display_name_id",
          F.polyFingerprint(array(col("display_name"))))
      deduped.join(broadcast(dim), Seq("display_name"), "inner")
        .select("main_refco", "display_name", "display_name_id", "doc_id", "n_chars")
    }),

    // J3: MERGE semantics — NULL-carrying updates overwrite, cleaned_ref is
    // insert-only, target-only rows pass through untouched.
    "merge_upsert" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val target = docs.where(col("doc_id") % 3 === 0).select(
        col("doc_id"), col("source").as("cleaned_ref"),
        col("lang").as("category"), col("n_chars").as("val"))
      val updates = docs.where(col("doc_id") % 2 === 0).select(
        col("doc_id"), concat(lit("u_"), col("source")).as("cleaned_ref"),
        when(col("doc_id") % 5 =!= 0, concat(lit("u_"), col("lang"))).as("category"),
        (col("n_chars") + 1).as("val"))
      Upsert.merge(target, updates, Seq("doc_id"), insertOnlyCols = Set("cleaned_ref"))
    }),

    // Near-dup pairs → duplicate groups: weakly-connected components by
    // min-label propagation over a deterministic edge set.
    // Edge shape mirrors real near-dup output: small dense clusters
    // (5-blocks chained to their block leader) — min-label converges in
    // ~2 rounds. Long-chain graphs are the documented large-star/small-star
    // upgrade path, not the dedup regime.
    "connected_components" -> ((s, dir) => {
      val edges = Tables.documents(s, dir)
        .select(col("doc_id").as("a"),
          (col("doc_id") - pmod(col("doc_id"), lit(5))).as("b"))
        .where(col("a") =!= col("b"))
      Graph.connectedComponents(edges, "a", "b")
        .select(col("id"), col("label").as("component"))
    }),

    // Persisted INCREMENTAL components: the same edge family folded in
    // TWO batches (even ids, then odd — whose edges land on even heads,
    // forcing cross-batch merges and relabels) through the IndexStore-
    // committed mapping. The final mapping must equal one-shot CC over
    // the full edge stream plus self-labeled singletons — per-batch cost
    // is O(ids + batch pairs), never O(history pairs).
    "cc_incremental" -> ((s, dir) => {
      val docs = Tables.documents(s, dir).select("doc_id")
      val root = java.nio.file.Files
        .createTempDirectory("graft-ccinc").toString + "/cc"
      Seq(0, 1).foreach { par =>
        val batch = docs.where(pmod(col("doc_id"), lit(2)) === par)
        val edges = batch
          .select(col("doc_id").as("a"),
            (col("doc_id") - pmod(col("doc_id"), lit(5))).as("b"))
          .where(col("a") =!= col("b"))
        Graph.updateComponents(s, root, batch, "doc_id", edges, "a", "b")
      }
      // eager checkpoint, then drop the per-invocation store — repeated
      // bench/verify runs must not accumulate temp snapshots
      val out = Graph.readComponents(s, root)
        .select(col("id").as("doc_id"), col("component")).localCheckpoint()
      org.apache.commons.io.FileUtils.deleteDirectory(
        new java.io.File(root).getParentFile)
      out
    }),

    // Per-key corpus cap (training-data curation): at most 10 docs per
    // source, picked by a deterministic engine-portable hash.
    "cap_per_key" -> ((s, dir) =>
      Dedup.capPerKey(Tables.documents(s, dir), 10, Seq("source"), "doc_id")
        .select("doc_id", "source")),

    // Int8 embedding quantization with per-vector scale; codes emitted as
    // an order-sensitive integer checksum (exact in both engines).
    "quantize_embeddings" -> ((s, dir) => {
      val q = Embeddings.quantizeInt8(Tables.embeddings(s, dir), "embedding")
      q.select(col("vec_id"), col("q8_scale"),
        aggregate(
          zip_with(col("q8"), sequence(lit(1), size(col("q8"))),
            (qv, i) => qv.cast("long") * i),
          lit(0L), (a, b) => a + b).as("q_checksum"))
    }),

    // Chunk→document embedding pooling: element-wise sum of fixed-point-
    // scaled vectors per label via the partial-aggregable VectorSumLong
    // (exchange = groups×dim, not rows×dim). Emitted as integer checksums.
    "pool_embeddings" -> ((s, dir) => {
      val pooled = Embeddings.poolEmbeddings(
        Tables.embeddings(s, dir), "embedding", Seq("label"))
      val seqIdx = sequence(lit(1), size(col("pool_sum_q")))
      pooled.select(col("label"), col("n_vecs"),
        size(col("pool_sum_q")).cast("long").as("dim"),
        when(size(col("pool_sum_q")) > 0,
          aggregate(zip_with(col("pool_sum_q"), seqIdx, (v, i) => v * i),
            lit(0L), (a, b) => a + b)).otherwise(0L).as("pool_checksum"),
        aggregate(transform(col("pool_sum_q"), v => abs(v)),
          lit(0L), (a, b) => a + b).as("pool_l1"))
    }),

    // Fixed-token sliding-window chunking with stride (the op that
    // produces the chunks an embeddings pipeline embeds); pure scan-stage.
    "chunk_documents" -> ((s, dir) =>
      TextAnalysis.chunkDocuments(Tables.documents(s, dir), "doc_id", "text",
        chunkTokens = 32, stride = 24)),

    // Sentence-boundary-aware RAG chunking: whole sentences pack
    // greedily into ~24-token chunks by starting offset — no sentence
    // ever splits mid-way; the synthetic enders give every doc a
    // multi-sentence page plus an ender-less trailing fragment.
    "sentence_chunks" -> ((s, dir) =>
      TextAnalysis.sentenceChunks(
        Tables.documents(s, dir).select(col("doc_id"),
          concat(col("text"), lit(". End of doc "), col("doc_id"),
            lit("? Yes! trailing bit")).as("page")),
        "doc_id", "page", budgetTokens = 24)),

    // Contrastive embedding-training triplets over the chunk table:
    // adjacent-window positives, deterministic bucket-rotation
    // negatives — replayable training-pair prep (random in-batch
    // negatives belong to training time, not data prep).
    "contrastive_pairs" -> ((s, dir) =>
      TextAnalysis.contrastivePairs(
        TextAnalysis.chunkDocuments(Tables.documents(s, dir), "doc_id",
          "text", chunkTokens = 32, stride = 24), buckets = 32)),

    // C4-style cross-document boilerplate-line removal. The synthetic
    // corpus is single-line, so the query builds a 3-line page per doc
    // (header/text/footer) whose header+footer lines repeat across docs —
    // real cross-doc removal, exactly mirrored by the oracle.
    "boilerplate_lines" -> ((s, dir) => {
      val pages = Tables.documents(s, dir).select(col("doc_id"),
        concat_ws("\n", concat(lit("src: "), col("source")), col("text"),
          concat(lit("lang: "), col("lang"))).as("page"))
      TextAnalysis.removeBoilerplateLines(pages, "doc_id", "page", minDocs = 3)
    }),

    // JL random projection 64→16 dims (±1 matrix, fixed-point): emitted
    // as order-sensitive integer checksums, exact in both engines.
    "random_projection" -> ((s, dir) => {
      val pr = Embeddings.randomProject(Tables.embeddings(s, dir),
        "embedding", outDim = 16, seed = 77L, dim = 64)
      pr.select(col("vec_id"),
        aggregate(zip_with(col("projected"),
            sequence(lit(1), size(col("projected"))), (v, i) => v * i),
          lit(0L), (a, b) => a + b).as("pr_checksum"),
        aggregate(transform(col("projected"), v => abs(v)),
          lit(0L), (a, b) => a + b).as("pr_l1"))
    }),

    // Exact dedup with deterministic tie-break.
    "exact_dedup" -> ((s, dir) =>
      Dedup.exact(Tables.documents(s, dir), Seq("source", "lang"), col("doc_id"))
        .select("doc_id", "source", "lang", "n_chars")),

    // n-gram Jaccard near-dup pairs (integer-exact threshold), blocked by source.
    "ngram_jaccard" -> ((s, dir) =>
      Dedup.ngramJaccardPairs(Tables.documents(s, dir), "doc_id", "text",
        blockCol = "source", n = 3, thresholdNum = 1, thresholdDen = 10)),

    // Prefix-filtered Jaccard (PPJoin-style) at a high threshold — same
    // exact semantics as the exhaustive join, ~25x fewer candidates.
    "ngram_jaccard_prefix" -> ((s, dir) =>
      Dedup.ngramJaccardPairsPrefix(Tables.documents(s, dir), "doc_id", "text",
        blockCol = "source", n = 3, thresholdNum = 4, thresholdDen = 5)),

    // Exact repeated-span stats (aggregate-form exact-substring dedup):
    // per doc, distinct 3-token spans and how many appear in other docs.
    "repeated_spans" -> ((s, dir) =>
      Dedup.repeatedSpanStats(Tables.documents(s, dir), "doc_id", "text", k = 3)),

    // Mojibake repair (ftfy-lite): corrupt a unicode-bearing text into
    // its UTF-8-read-as-cp1252 artifacts, then repair through the
    // TextAnalysis.MojibakeTable replace chain — both directions mirrored
    // in the oracle, so the driver checks the full corrupt→repair
    // pipeline char-for-char. (The corpus itself is ASCII; the appended
    // suffix carries the unicode the table exists for. Roundtrip
    // inversion is asserted separately in TextAnalysisSpec.)
    "mojibake_fix" -> ((s, dir) => {
      val corrupted = TextAnalysis.corruptToMojibake(
        concat(col("text"), lit(MojibakeSuffix)))
      Tables.documents(s, dir).select(col("doc_id"),
        TextAnalysis.fixMojibake(corrupted).as("repaired"),
        (length(corrupted) - length(TextAnalysis.fixMojibake(corrupted)))
          .cast("long").as("chars_recovered"))
    }),

    // Per-source vocabulary cardinality via Datasketches HLL — the
    // mergeable-sketch profile (Cardinality.update maintains it
    // incrementally through IndexStore; spec-tested). At this
    // cardinality (~31/source) the sketch is in its coupon regime —
    // exact up to coupon-hash collisions, deterministic on fixed data —
    // so the estimate carries a full count(DISTINCT) oracle.
    "vocab_cardinality" -> ((s, dir) => {
      val toks = Tables.documents(s, dir)
        .select(col("source"), explode(split(col("text"), " ")).as("tok"))
      Cardinality.estimate(Cardinality.sketch(toks, "source", "tok"))
        .select(col("key").as("source"), col("estimate").cast("long").as("vocab"),
          col("n_rows").as("n_tokens"))
    }),

    // Asymmetric containment pairs: |A∩B| / min(|A|,|B|) ≥ 0.8 — the
    // quote/subset near-dup Jaccard structurally misses (a fragment
    // contained in a long doc has low union overlap but containment ~1).
    "containment_pairs" -> ((s, dir) =>
      Dedup.ngramContainmentPairs(Tables.documents(s, dir), "doc_id", "text",
        blockCol = "lang", n = 3, thresholdNum = 4, thresholdDen = 5)),

    // Exact duplicated-PASSAGE spans (Lee et al. suffix-window form of
    // exact-substring dedup): merged character ranges covered by 8-token
    // windows occurring ≥2× corpus-wide — the locate/merge transform the
    // aggregate-only repeated_spans can't do.
    "dup_passages" -> ((s, dir) => sharedPassageSpans(s, dir)),

    // End-to-end passage REMOVAL: splice the merged spans out with the
    // codegen'd aggregate-HOF (Dedup.removeSpans). The oracle derives the
    // cleaned length INDEPENDENTLY (original length − Σ span widths), so
    // the driver cross-checks the splice against arithmetic it never ran.
    "dup_passage_clean" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val spans = sharedPassageSpans(s, dir)
        .groupBy("doc_id")
        .agg(sort_array(collect_list(struct(col("span_start"), col("span_end"))))
            .as("spans"),
          count(lit(1)).as("n_spans"))
      docs.join(spans, Seq("doc_id"), "left")
        .select(col("doc_id"), coalesce(col("n_spans"), lit(0L)).as("n_spans"),
          length(Dedup.removeSpans(col("text"), col("spans")))
            .cast("long").as("clean_len"))
    }),

    // End-to-end dedup: Jaccard pairs -> connected components -> keep the
    // minimum id per duplicate cluster; unpaired docs pass through. The
    // component table is SHARED with dedup_survivors_best (the pair stage
    // and CC are identical — only the survivor rank differs), so the
    // family pays the iterative CC driver loop once, not per policy.
    "dedup_survivors" -> ((s, dir) =>
      Dedup.survivorsFromComponents(Tables.documents(s, dir), "doc_id",
          sharedJaccardComponents(s, dir))
        .select("doc_id", "source", "lang", "n_chars")),

    // Quality-policy dedup: same clusters as dedup_survivors, but the
    // LONGEST member (n_chars, tie: min id) survives each cluster.
    "dedup_survivors_best" -> ((s, dir) =>
      Dedup.survivorsFromComponentsBest(Tables.documents(s, dir), "doc_id",
          "n_chars", sharedJaccardComponents(s, dir))
        .select("doc_id", "source", "lang", "n_chars")),

    // Crawl-refresh census: per source, how many of the "new" (odd-id)
    // docs near-duplicate some "old" (even-id) doc at the survivors
    // family's Jaccard threshold — the snapshot-overlap number a crawl
    // pipeline reads first. New-vs-new dups don't count.
    "cross_dup_rate" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      Dedup.crossDupRate(docs.where(col("doc_id") % 2 === 0),
        docs.where(col("doc_id") % 2 === 1), "doc_id", "text",
        blockCol = "source", rateKeyCol = "source",
        n = 3, thresholdNum = 1, thresholdDen = 50)
    }),

    // Duplicate-cluster census over the REAL near-dup clusters (rides
    // the family's one shared CC materialization): how many clusters of
    // each size, singletons included — the dedup-rate dashboard number
    // that tells a curation team whether duplication mass sits in a few
    // mega-clusters or a long tail. Two component-keyed aggregations
    // over the |docs|-sized label table; the corpus is never rescanned.
    "dup_cluster_sizes" -> ((s, dir) => {
      val docs = Tables.documents(s, dir).select(col("doc_id"))
      val cc = sharedJaccardComponents(s, dir)
      docs.join(cc, col("doc_id") === col("id"), "left")
        .select(coalesce(col("label"), col("doc_id")).as("component"))
        .groupBy("component").agg(count(lit(1)).as("cluster_size"))
        .groupBy("cluster_size").agg(count(lit(1)).as("n_clusters"))
    }),

    // Benchmark decontamination: per-doc count of n-grams shared with a
    // held-out eval set (docs where doc_id % 50 == 0 stand in for the
    // benchmark). The eval shingle set is broadcast — the corpus is never
    // shuffled on text.
    "decontaminate" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val bench = docs.where(pmod(col("doc_id"), lit(50)) === 0)
      val corpus = docs.where(pmod(col("doc_id"), lit(50)) =!= 0)
      Decontaminate.flag(corpus, "doc_id", "text", bench, "text", n = 3)
        .select("doc_id", "source", "n_overlap", "contaminated")
    }),

    // Span-level exact-substring decontamination: verbatim benchmark
    // overlaps located as merged char spans (Lee-style windows pointed
    // across sets) so the leaked passage can be cut and the rest of the
    // doc kept. w=4 because the synthetic corpus's verbatim overlaps are
    // short; production uses w~8-13 (the operator is w-agnostic, and the
    // sub-w tail stays `decontaminate`'s n-gram job).
    "decon_spans" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val bench = docs.where(pmod(col("doc_id"), lit(50)) === 0)
      val corpus = docs.where(pmod(col("doc_id"), lit(50)) =!= 0)
      Decontaminate.contaminatedSpans(corpus, "doc_id", "text",
        bench, "doc_id", "text", w = 4)
    }),

    // End-to-end span REMOVAL for the contaminated passages: splice the
    // located spans out with the codegen'd aggregate-HOF (removeSpans).
    // The oracle derives the cleaned length INDEPENDENTLY (original
    // length - sum of span widths), cross-checking the splice against
    // arithmetic it never ran — the dup_passage_clean pattern.
    "decon_span_clean" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val bench = docs.where(pmod(col("doc_id"), lit(50)) === 0)
      val corpus = docs.where(pmod(col("doc_id"), lit(50)) =!= 0)
      val spans = Decontaminate.contaminatedSpans(corpus, "doc_id", "text",
          bench, "doc_id", "text", w = 4)
        .groupBy("doc_id")
        .agg(sort_array(collect_list(struct(col("span_start"), col("span_end"))))
            .as("spans"),
          count(lit(1)).as("n_spans"))
      corpus.join(spans, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_spans"), lit(0L)).as("n_spans"),
          length(when(col("spans").isNotNull,
              Dedup.removeSpans(col("text"), col("spans")))
            .otherwise(col("text"))).cast("long").as("clean_len"))
    }),

    // Bloom-prefiltered decontamination (the scale path for a benchmark
    // too big to broadcast as an exact hash set): ~10-bit/shingle Bloom
    // broadcast + codegen'd map-side probe, then an exact verify join —
    // no false negatives, so the CLEANED corpus equals the exact plan's
    // and the oracle needs no Bloom replay.
    "decon_bloom" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val bench = docs.where(pmod(col("doc_id"), lit(50)) === 0)
      val corpus = docs.where(pmod(col("doc_id"), lit(50)) =!= 0)
      Decontaminate.cleanBloom(corpus, "doc_id", "text", bench, "text",
          n = 3, fpp = 0.01)
        .select("doc_id", "source", "n_chars")
    }),

    // MinHash-LSH near-dup pairs. The portable shingle hash + seed-derived
    // permutation coefficients make the signature (and so the band
    // collisions) exactly recomputable in SQL — the oracle mirrors the
    // whole LSH algorithm, candidates and all, so the match is exact
    // regardless of recall.
    "minhash_lsh" -> ((s, dir) =>
      Dedup.minHashLshPairs(Tables.documents(s, dir), "doc_id", "text",
        n = 3, numHashes = 128, bands = 32, threshold = 0.1)),

    // Index-verified MinHash pairs: the same LSH candidate machinery, but
    // verification is the ESTIMATED Jaccard (fraction of agreeing
    // signature components) — the math the streaming near-dup index uses
    // (Dedup.minHashPairsAgainstIndex) so the corpus text is read once to
    // build the index and never again. Self-indexed here, ordered a < b.
    // agreement/128 is a dyadic rational, so the double compares exactly
    // against the SQL mirror.
    "minhash_lsh_est" -> ((s, dir) => {
      val (sigs, bandRows) = Dedup.minHashIndex(Tables.documents(s, dir),
        "doc_id", "text", n = 3, numHashes = 128, bands = 32)
      Dedup.minHashPairsAgainstIndex(sigs, bandRows, sigs, bandRows,
          numHashes = 128, threshold = 0.1)
        .where(col("batch_id") < col("index_id"))
        .select(col("batch_id").as("a_id"), col("index_id").as("b_id"),
          col("est_jaccard"))
    }),

    // SimHash near-dup pairs. Banding has GUARANTEED recall at Hamming<=3
    // (pigeonhole), so with the portable word hash the oracle is simply
    // the exact all-pairs Hamming join over mirrored signatures.
    "simhash_pairs" -> ((s, dir) =>
      Dedup.simHashPairs(Tables.documents(s, dir), "doc_id", "text", maxHamming = 3)),

    // ANN brute-force cosine top-k (bounded partial-aggregate top-k).
    "cosine_topk" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Similarity.bruteForceTopK(emb.where(col("vec_id") < 20), emb, k = 5)
    }),

    // Hard-negative mining (contrastive training): per query 5 exact
    // cosine near-misses + 5 deterministic hash-ranked random negatives
    // excluding the hard set — the standard two-tier negative mix.
    "hard_negatives" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Similarity.hardNegatives(emb.where(col("vec_id") < 8), emb,
        kHard = 5, kRandom = 5)
    }),

    // Labeled retrieval eval (MRR summand / hits@10 / R-capped
    // recall@10 by embedding label) over 50 queries drawn from the
    // corpus — the per-checkpoint metric harness; exact top-k ground
    // truth by the eval-op contract.
    "retrieval_eval" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Similarity.retrievalEval(emb.where(col("vec_id") < 50), emb, k = 10)
    }),

    // Exact cosine near-duplicate pairs — crossJoin, quadratic BY DESIGN:
    // the verification-scale ground truth. The registered scale path is
    // cosine_neardup_lsh below.
    "cosine_neardup_exact" -> ((s, dir) =>
      Dedup.cosineNearDupPairs(Tables.embeddings(s, dir), "vec_id", "embedding", 0.4)),

    // SRP-LSH cosine near-dup — the 100 TB path: bucketed candidates, no
    // cartesian product anywhere in the plan. The hyperplanes are a pure
    // function of the seed, so the oracle interpolates them as literals
    // and mirrors bucketing + verification exactly (recall does not need
    // to be 1 for the oracle to match — it recomputes the same buckets).
    // planes/tables are sized for the sf corpus (wider corpora take more
    // planes: bucket occupancy ~ n / 2^planes per table).
    "cosine_neardup_lsh" -> ((s, dir) =>
      Dedup.cosineNearDupPairsLsh(Tables.embeddings(s, dir), "vec_id", "embedding",
        threshold = 0.4, dim = 64, planes = 4, tables = 4)),

    // Empirical SRP-LSH calibration: bucket occupancy + candidate
    // volume per plane count on the ACTUAL corpus geometry — the
    // measured "what does doubling planes buy" table next to the
    // recall harnesses; one scan emits all three configs.
    "lsh_calibration" -> ((s, dir) =>
      Dedup.lshCalibration(Tables.embeddings(s, dir), "embedding",
        planesOptions = Seq(4, 8, 12))),

    // Classifier evaluation in-engine: confusion matrix of the lang-ID
    // heuristic against the table's labels (+ integer accuracy signal).
    "langid_confusion" -> ((s, dir) =>
      TextAnalysis.withLangId(Tables.documents(s, dir), "text")
        .groupBy("lang", "lang_pred").agg(count(lit(1)).as("n"))
        .withColumn("correct", col("lang") === col("lang_pred"))),

    // Calibration of the lang-ID classifier's stated confidence against
    // its actual accuracy: confidence = best marker score over total
    // marker mass (permille), binned reliability report + exact ECE —
    // the "are these scores probabilities or just rankings" gate before
    // anyone uses classifier scores as sampling weights.
    "langid_calibration" -> ((s, dir) => {
      val ws = split(col("text"), " ")
      val scores = TextAnalysis.LangMarkers.map { case (lang, ms) =>
        F.countInSet(ws, ms).as(s"s_$lang") }
      val withScores = TextAnalysis.withLangId(Tables.documents(s, dir), "text")
        .select(col("lang") +: col("lang_pred") +: scores: _*)
      val sCols = TextAnalysis.LangMarkers.map(m => s"s_${m._1}")
      val base = withScores
        .withColumn("__tot", sCols.map(col).reduce(_ + _))
        .withColumn("__best", greatest(sCols.map(col): _*))
        .withColumn("__conf", expr(
          "CASE WHEN __tot > 0 THEN CAST(__best AS BIGINT) * 1000 div __tot" +
            " ELSE 0 END"))
      Validate.calibrationReport(base, col("__conf"),
        col("lang_pred") === col("lang"), nBins = 10)
    }),

    // Chance-corrected agreement of the lang-ID heuristic vs labels:
    // kappa reads predict-the-majority as ~0 where raw accuracy looks
    // fine — the third leg of the classifier-eval tier next to the
    // confusion matrix and the calibration report.
    "langid_kappa" -> ((s, dir) =>
      Correlate.cohensKappa(
        TextAnalysis.withLangId(Tables.documents(s, dir), "text"),
        col("lang"), col("lang_pred"))),

    // In-engine recall evaluation of the LSH near-dup path against the
    // exact ground truth — the tuning harness for planes/tables (run at
    // sample scale: the exact side is the labeled quadratic operator).
    "lsh_recall" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val exact = Dedup.cosineNearDupPairs(emb, "vec_id", "embedding", 0.4)
        .select("a_id", "b_id")
      val lsh = Dedup.cosineNearDupPairsLsh(emb, "vec_id", "embedding",
        threshold = 0.4, dim = 64, planes = 4, tables = 4)
        .select("a_id", "b_id")
      val hit = exact.join(lsh, Seq("a_id", "b_id"), "left_semi")
      exact.agg(count(lit(1)).as("n_exact"))
        .crossJoin(lsh.agg(count(lit(1)).as("n_lsh")))
        .crossJoin(hit.agg(count(lit(1)).as("n_hit")))
        .withColumn("recall_permille", expr("n_hit * 1000 div n_exact"))
    }),

    // SemDeDup-style semantic dedup: LSH cosine pairs -> components ->
    // keep min id per semantic cluster; the corpus minus the drop list.
    "semdedup_survivors" -> ((s, dir) =>
      Dedup.semanticDedupSurvivors(Tables.embeddings(s, dir), "vec_id",
          "embedding", threshold = 0.4, dim = 64, planes = 4, tables = 4)
        .select("vec_id", "label")),

    // ANN via a PERSISTED IVF index: build (train on a deterministic 25%
    // sample + write centroid table + cell-partitioned assignments) is a
    // separate job from probe — the 100 TB shape, where the index is built
    // once and maintained incrementally by the merge (Ivf.addToIndex;
    // no-retrain property in IvfSpec). Probing all cells makes the result
    // exactly brute force — that is what the oracle checks; the
    // nprobe < nlist recall + partition-pruned probe paths are tested in
    // IvfSpec.
    "ann_ivf" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      // Build-once / probe-many: the index dir is keyed by Ivf
      // .cachedIndexDir's 64-bit (path, mtime, length) fingerprint, so
      // repeated invocations probe the already-built index while a data
      // change forces a rebuild (and GCs the superseded snapshot dirs).
      val src = new java.io.File(s"$dir/embeddings.parquet")
      val idx = Ivf.cachedIndexDir(src, params = "nlist=8:iters=1")
      if (!graft.operators.IndexStore.exists(s, s"$idx/centroids")) {
        Ivf.gcSupersededIndexes(idx)
        val sample = emb.where(pmod(col("vec_id"), lit(4)) === 0)
        Ivf.buildIndex(s, idx, emb, trainOn = sample, nlist = 8, iters = 1)
      }
      Ivf.probeIndex(s, idx, emb.where(col("vec_id") < 20), k = 5, nprobe = 8)
    }),

    // Persisted IVF-PQ probe (FAISS's workhorse composition): candidates
    // come from a column-pruned codes read + ADC, vectors join back only
    // for survivors. Degenerate knobs (full probe, full candidate budget)
    // make the result exactly brute force — the same oracle convention as
    // ann_ivf; pq_recall pins the lossy regime. Separate cache root so a
    // concurrent ann_ivf build never races this index's rewrites.
    "ann_ivfpq" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val src = new java.io.File(s"$dir/embeddings.parquet")
      val idx = Ivf.cachedIndexDir(src, root = "/tmp/graft-ivfpq",
        params = "nlist=8:iters=1:m=8:ksub=16")
      if (!graft.operators.IndexStore.exists(s, s"$idx/pq")) {
        Ivf.gcSupersededIndexes(idx)
        val sample = emb.where(pmod(col("vec_id"), lit(4)) === 0)
        if (!graft.operators.IndexStore.exists(s, s"$idx/centroids"))
          Ivf.buildIndex(s, idx, emb, trainOn = sample, nlist = 8, iters = 1)
        Ivf.attachPq(s, idx, trainOn = sample, m = 8, ksub = 16)
      }
      Ivf.probeIndexAdc(s, idx, emb.where(col("vec_id") < 20), k = 5,
        nprobe = 8, candidates = emb.count().toInt)
    }),

    // Recall harness for the IVF probe, mirroring lsh_recall: nprobe = 2
    // of nlist = 8 makes cell pruning actually lossy, and the measured
    // recall_permille pins the nprobe knob the probe scaladoc justifies
    // analytically. Centroids here are the first 8 corpus vectors (the
    // cluster_purity seed convention) so the ENTIRE pipeline — assignment
    // argmax, probe-cell ranking, candidate top-k — is exactly
    // SQL-mirrorable; the persisted ann_ivf index shares this exact probe
    // math (F.nearestCentroids), differing only in how centroids were
    // trained. IvfSpec pins the persisted path's recall monotonicity.
    "ivf_recall" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val queries = emb.where(col("vec_id") < 20)
      val seeds = emb.where(col("vec_id") < 8).orderBy("vec_id")
        .select("embedding").collect()
        .map(_.getSeq[Float](0).map(_.toDouble).toSeq).toSeq
      recallVsExact(
        Similarity.bruteForceTopK(queries, emb, k = 5),
        Ivf.ivfTopK(queries, emb, k = 5, centroids = seeds, nprobe = 2))
    }),

    // Cluster-based curation analytics: nearest-seed assignment (seeds =
    // the first 8 corpus vectors — deterministic and SQL-mirrorable) then
    // per-cluster label purity. Assignment is a per-row argmax compiled
    // from literal seed vectors: zero shuffle until the slim count agg.
    "cluster_purity" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val seeds = emb.where(col("vec_id") < 8).orderBy("vec_id")
        .select("vec_id", "embedding").collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1))).toSeq
      Clustering.labelPurity(
        Clustering.assignToSeeds(emb, seeds, "embedding"),
        "cluster_id", "label")
    }),

    // Per-cluster outliers: the 5 members farthest from their seed —
    // the prune-before-trusting-a-cluster curation signal.
    "cluster_outliers" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val seeds = emb.where(col("vec_id") < 8).orderBy("vec_id")
        .select("vec_id", "embedding").collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1))).toSeq
      Clustering.clusterOutliers(emb, seeds, "embedding", "vec_id", k = 5)
    }),

    // ANN via SRP-LSH buckets. Recall < 1 by construction, but the oracle
    // needs no recall assumption: it mirrors the bucketing with the same
    // literal hyperplanes and ranks the same candidate set.
    "ann_lsh" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Similarity.lshTopK(emb.where(col("vec_id") < 20), emb, k = 5, dim = 64,
        planes = 8, tables = 4)
    }),

    // ANN via the HNSW-style layered neighbor graph (round 13): portable
    // mix64-trailing-zero levels, bucket-bounded top-m edges per layer,
    // greedy upper-layer descent + fixed-round beam search on layer 0.
    // Every stage is deterministic, so the oracle replays levels, graph,
    // and the whole search as a finite CTE chain — recall needs no
    // assumption, the same approximate answer is recomputed exactly.
    "ann_hnsw" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Hnsw.searchTopK(emb.where(col("vec_id") < 20), emb,
        sharedHnswEdges(s, dir), k = 5, maxLevel = 3, beam = 16, rounds = 3)
    }),

    // The same search served from a PERSISTED layer-partitioned graph
    // (built once per corpus fingerprint — the bm25_indexed posture):
    // identical oracle, so the gate proves index-served results equal
    // scan-computed ones bit for bit.
    "ann_hnsw_indexed" -> ((s, dir) => {
      val src = new java.io.File(s"$dir/embeddings.parquet")
      val idx = Ivf.cachedIndexDir(src, root = "/tmp/graft-hnswidx",
        params = "dim=64:m=8:maxLevel=3:planes=4:tables=4")
      if (!IndexStore.exists(s, idx)) {
        Ivf.gcSupersededIndexes(idx)
        Hnsw.buildIndex(s, idx, Tables.embeddings(s, dir), dim = 64,
          m = 8, maxLevel = 3, planes = 4, tables = 4)
      }
      val emb = Tables.embeddings(s, dir)
      Hnsw.searchIndex(s, idx, emb.where(col("vec_id") < 20), k = 5,
        beam = 16, rounds = 3)
    }),

    // In-engine recall of the graph search against exact brute force —
    // the (m, beam, rounds) tuning harness, the lsh/ivf/pq_recall twin.
    "hnsw_recall" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val queries = emb.where(col("vec_id") < 20)
      recallVsExact(
        Similarity.bruteForceTopK(queries, emb, k = 5),
        Hnsw.searchTopK(queries, emb, sharedHnswEdges(s, dir), k = 5,
          maxLevel = 3, beam = 16, rounds = 3))
    }),

    // Text quality stats (token counts, ratios) — integer-exact inputs.
    "token_stats" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      TextAnalysis.withQualityStats(docs, "text")
        .withColumn("n_subwords", TextAnalysis.subwordCount(col("text")))
        .select("doc_id", "n_tokens", "mean_token_len", "n_stopwords",
          "stopword_ratio", "n_punct", "punct_ratio", "n_subwords")
    }),

    // BPE tokenizer training: the corpus collapses to the distinct
    // (word, freq) table in ONE linear pass, then the merge loop runs on
    // that bounded table (driver-exact under the vocab threshold,
    // distributed pair-count rounds above — same adaptive split as
    // connected components). Oracle replays every round in SQL.
    "bpe_train" -> ((s, dir) =>
      Bpe.train(Tables.documents(s, dir), "text", numMerges = 10)),

    // Per-doc token stats under the trained tokenizer: encode is a
    // broadcast vocab join (the training artifact already holds every
    // in-corpus word's segmentation), never a per-doc merge replay.
    "bpe_encode" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      Bpe.encodeViaVocab(docs, "doc_id", "text",
        Bpe.vocabulary(docs, "text", sharedBpeMerges(s, dir)))
    }),

    // Held-out tokenizer quality: train BPE on the even-doc half, score
    // the odd half — fertility (subword tokens per word, millitokens)
    // and word-level OOV rate per source, THE pair of metrics a
    // tokenizer-drift monitor watches. Unseen words segment through the
    // same codegen'd merge replay (Bpe.vocabulary re-segments whatever
    // words the scored half has); the oracle replays training on the
    // train half AND the greedy application on held-out words in SQL.
    "tokenizer_fertility" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val train = docs.where(col("doc_id") % 2 === 0)
      val test = docs.where(col("doc_id") % 2 === 1)
      val merges = sharedBpeMergesEven(s, dir)
      val segmented = Bpe.vocabulary(test, "text", merges)
      val trainWords = Bpe.wordFrequencies(train, "text").select(col("w"))
        .withColumn("__seen", lit(true))
      test.select(col("source"), explode(split(col("text"), " ")).as("w"))
        .where(col("w") =!= "")
        .join(broadcast(segmented.select(col("w"), col("syms"))), "w")
        .join(broadcast(trainWords), Seq("w"), "left")
        .groupBy("source")
        .agg(count(lit(1)).as("n_words"),
          sum(size(col("syms"))).as("n_tokens"),
          expr("sum(size(syms)) * 1000 div count(1)").as("fertility_milli"),
          expr("sum(case when __seen is null then 1 else 0 end) * 1000 div count(1)")
            .as("oov_permille"))
    }),

    // Persisted-profile quantile surface: per-source token-count
    // p50/p90/p99 via the custom KLL TypedImperativeAggregate (Spark has
    // HLL sketch aggs but no quantile ones). Map-side sketch fold — the
    // one shuffle carries ~KB blobs, never values; the driver query runs
    // in the sketch's exact regime (n per source ≤ k), where INCLUSIVE
    // quantiles are order statistics the oracle recomputes in SQL.
    "quantile_profile" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
        .select(col("source"), TextAnalysis.tokenCount(col("text"))
          .cast("double").as("v"))
      Quantiles.quantiles(Quantiles.sketch(docs, "source", "v"),
          Seq(0.5, 0.9, 0.99))
        .select(col("key").as("source"), col("n_rows"),
          col("q500"), col("q900"), col("q990"))
    }),

    // Batch NOVELTY against a historical vocabulary profile (incremental-
    // crawl coverage monitor): new-distinct per source from HLL sketches
    // alone — per-KEY profile join, history never rescanned. Driver
    // query runs in the coupon-exact regime where union-minus-old IS the
    // true new-distinct count the oracle recomputes.
    "novelty_rate" -> ((s, dir) => {
      val toks = Tables.documents(s, dir)
        .select(col("doc_id"), col("source"),
          explode(split(col("text"), " ")).as("tok"))
        .where(col("tok") =!= "")
      val hist = Cardinality.sketch(
        toks.where(pmod(col("doc_id"), lit(2)) === 0), "source", "tok")
      Cardinality.novelty(hist,
          toks.where(pmod(col("doc_id"), lit(2)) === 1), "source", "tok")
        .select(col("key").as("source"), col("batch_distinct"),
          col("new_distinct"), col("novelty_permille"))
    }),

    // Persisted-profile heavy-hitters surface: per-source frequent tokens
    // via the custom Misra-Gries TypedImperativeAggregate (Spark has no
    // mergeable heavy-hitters aggregate; count_min can't enumerate).
    // Map-side sketch fold — the one shuffle carries bounded item maps.
    // The driver query runs in the sketch's exact regime (31 distinct
    // tokens per source < 0.75·maxMapSize), where estimates are plain
    // GROUP BY counts the oracle recomputes in SQL.
    "freq_profile" -> ((s, dir) => {
      val toks = Tables.documents(s, dir)
        .select(col("source"), explode(split(col("text"), " ")).as("item"))
        .where(col("item") =!= "")
      Frequencies.topItems(
          Frequencies.sketch(toks, "source", "item", maxMapSize = 64),
          minCount = 10)
        .select(col("key").as("source"), col("item"), col("estimate").as("n"))
    }),

    // Composed corpus-health gate: the operational read-path the profile
    // family exists to serve — ONE per-source report joining the three
    // mergeable profiles (HLL vocabulary, KLL length quantiles,
    // Misra-Gries top heavy hitter) with the TV length-drift monitor.
    // The drift slices alternate by WITHIN-SOURCE batch parity
    // ((doc_id div 20) % 2 — the table's source cycle length), because
    // plain doc_id parity is constant inside a source here and would
    // leave one slice empty for every key. Every
    // component runs in its sketch's exact regime at this sf, so the
    // oracle is a splice of the four components' exact mirrors. The joins
    // are |sources|-sized — the cost lives in the profile folds, each one
    // map-side-combined shuffle carrying sketch blobs or bin counts.
    "corpus_health" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val toks = docs.select(col("source"),
        explode(split(col("text"), " ")).as("tok"))
      val vocab = Cardinality.estimate(Cardinality.sketch(toks, "source", "tok"))
        .select(col("key").as("source"), col("estimate").cast("long").as("vocab"),
          col("n_rows").as("n_tokens"))
      val lens = docs.select(col("source"), col("doc_id"),
        TextAnalysis.tokenCount(col("text")).cast("double").as("v"))
      val quant = Quantiles.quantiles(
          Quantiles.sketch(lens, "source", "v"), Seq(0.5, 0.99))
        .select(col("key").as("source"), col("q500").as("len_p50"),
          col("q990").as("len_p99"))
      val items = docs.select(col("source"),
          explode(split(col("text"), " ")).as("item"))
        .where(col("item") =!= "")
      val rankW = Window.partitionBy("key")
        .orderBy(col("estimate").desc, col("item"))
      val top1 = Frequencies.topItems(
          Frequencies.sketch(items, "source", "item", maxMapSize = 64),
          minCount = 1)
        .withColumn("__rn", row_number().over(rankW)).where(col("__rn") === 1)
        .select(col("key").as("source"), col("item").as("top_token"),
          col("estimate").as("top_n"))
      val drift = Validate.driftTv(
          lens.withColumn("cur", expr("(doc_id div 20) % 2 = 1")),
          "source", "v", col("cur"), lo = 0.0, hi = 200.0, nBins = 20)
        .select(col("key").as("source"), col("tv").as("len_drift_tv"))
      vocab.join(quant, "source").join(top1, "source").join(drift, "source")
        .select(col("source"), col("n_tokens"), col("vocab"),
          col("len_p50"), col("len_p99"), col("top_token"), col("top_n"),
          expr("top_n * 1000 div n_tokens").as("top_share_permille"),
          col("len_drift_tv"))
    }),

    // Composite quality bucketing, aggregated.
    "quality_bucket" -> ((s, dir) =>
      TextAnalysis.qualityBucket(Tables.documents(s, dir), "text")
        .groupBy("quality").agg(count(lit(1)).as("n"))),

    // PII redaction over text carrying synthetic emails/URLs (derived
    // deterministically from doc_id so the oracle can rebuild them).
    "redact_pii" -> ((s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"),
          TextAnalysis.redact(
            concat(col("text"), lit(" user"), col("doc_id"),
              lit("@example.com via http://site"), col("doc_id"),
              lit(".org/x call +1-555-"), (col("doc_id") + 1000000),
              lit(" from 10.0."), pmod(col("doc_id"), lit(256)),
              lit(".7 then done"))).as("clean"))),

    // Collocation mining (phrase discovery): adjacent pairs >= 5
    // occurrences scored by integer-exact LIFT (PMI without the
    // libm-dependent log) — pair + token counts, vocab-sized broadcast.
    "collocations" -> ((s, dir) =>
      TextAnalysis.collocations(Tables.documents(s, dir), "text", minCount = 5)),

    // Quantized unigram surprisal (CCNet-style LM-quality signal, exact
    // integer log2 — see TextAnalysis.surprisal).
    "surprisal_score" -> ((s, dir) =>
      TextAnalysis.surprisal(Tables.documents(s, dir), "doc_id", "text")),

    // Bigram conditional surprisal — rare CONTINUATIONS, not rare words:
    // the quantized -log2 P(b|a) mean that separates fluent-but-unusual
    // text from shuffled-word gibberish (see TextAnalysis.bigramSurprisal).
    "bigram_surprisal" -> ((s, dir) =>
      TextAnalysis.bigramSurprisal(Tables.documents(s, dir), "doc_id", "text")),

    // Held-out stupid-backoff LM score: train the bigram+unigram counts
    // on the even docs, score the odd half — unseen continuations back
    // off (2 bits + smoothed unigram), the web-scale LM-quality filter
    // with a REAL backoff path (self-scored corpora contain all their
    // own bigrams; held-out is what makes the else-branch live).
    "stupid_backoff" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      TextAnalysis.stupidBackoff(docs.where(col("doc_id") % 2 === 1),
        docs.where(col("doc_id") % 2 === 0), "doc_id", "text")
    }),

    // Link-centrality source weighting: exact fixed-point PageRank over
    // the bipartite user <-> item interaction graph (item nodes offset by
    // 1e6; both arc directions so mass circulates). Top 50 central nodes.
    "pagerank" -> ((s, dir) => {
      val ev = Tables.events(s, dir).select(col("user_id"),
        (get_json_object(col("props"), "$.k").cast("long") + lit(1000000L))
          .as("item"))
      val edges = ev.select(col("user_id").as("src"), col("item").as("dst"))
        .union(ev.select(col("item").as("src"), col("user_id").as("dst")))
      Graph.pageRank(edges, "src", "dst", iterations = 8)
        .orderBy(col("rank").desc, col("node")).limit(50)
    }),

    // TrustRank: the seed-biased twin of pagerank — teleport mass flows
    // only to trusted seed users (<10), so rank measures proximity to
    // vetted sources instead of raw link volume (spam-farm demotion).
    // Same exact fixed-point arithmetic, same unrolled-CTE oracle.
    "trustrank" -> ((s, dir) => {
      val ev = Tables.events(s, dir).select(col("user_id"),
        (get_json_object(col("props"), "$.k").cast("long") + lit(1000000L))
          .as("item"))
      val edges = ev.select(col("user_id").as("src"), col("item").as("dst"))
        .union(ev.select(col("item").as("src"), col("user_id").as("dst")))
      val seeds = Tables.events(s, dir)
        .select(col("user_id").as("node")).where(col("node") < 10)
      Graph.trustRank(edges, "src", "dst", seeds, "node", iterations = 8)
        .orderBy(col("rank").desc, col("node")).limit(50)
    }),

    // Entity-resolution fuzzy join: edit-distance <= 2 pairs over the
    // distinct part names via FastSS deletion-neighborhood blocking +
    // exact Levenshtein verify — the record-linkage step of a metadata
    // dedup, as a blocked equi-join on 8-byte variant hashes, never
    // all-pairs (the oracle IS all-pairs: same semantics, naive shape).
    "editdist_pairs" -> ((s, dir) =>
      EditDistance.pairs(
        Tables.part(s, dir).select(col("p_name")).distinct()
          .withColumn("id", col("p_name")),
        "id", "p_name", maxDist = 2)
        .select(col("a_id").as("a_name"), col("b_id").as("b_name"),
          col("dist"))),

    // Composed entity resolution: fuzzy pairs -> connected components ->
    // canonical form (lexicographic component minimum) — the survivorship
    // step that turns pairwise typo matches into one canonical entity per
    // cluster (rides the string-keyed adaptive CC).
    "entity_canonical" -> ((s, dir) => {
      // same scoping filter as EditDistance.pairs' maxLen: out-of-scope
      // strings (null / >64 chars) are excluded from the OUTPUT too, so
      // the engine and the oracle agree on the row set, not just pairs
      val names = Tables.part(s, dir).select(col("p_name")).distinct()
        .where(col("p_name").isNotNull && length(col("p_name")) <= 64)
        .withColumn("id", col("p_name"))
      val pairs = EditDistance.pairs(names, "id", "p_name", maxDist = 2)
      val comp = Graph.connectedComponents(pairs, "a_id", "b_id")
        .select(col("id").as("__cid"), col("label"))
      names.select("p_name").join(comp, names("p_name") === comp("__cid"), "left")
        .select(col("p_name").as("name"),
          coalesce(col("label"), col("p_name")).as("canonical"))
    }),

    // Corpus vocabulary stats: top 20 terms by document frequency
    // (stopword discovery / vocabulary pruning for tokenizer training).
    "top_terms" -> ((s, dir) =>
      Tables.documents(s, dir)
        .select(explode(array_distinct(split(col("text"), " "))).as("term"))
        .where(col("term") =!= "")
        .groupBy("term").agg(count(lit(1)).as("df"))
        .orderBy(col("df").desc, col("term"))
        .limit(20)),

    // Language-ID heuristic (marker-word argmax, deterministic ties).
    "lang_id" -> ((s, dir) =>
      TextAnalysis.withLangId(Tables.documents(s, dir), "text")
        .select("doc_id", "lang_pred")),

    // Rolling-hash document fingerprint (pure integer arithmetic).
    "fingerprint" -> ((s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"),
          TextAnalysis.fingerprint(col("text")).as("fingerprint"))),

    // C4-style line cleaning. The synthetic corpus is single-line,
    // punctuation-free text, so the registered rules are the ones that
    // vary here (min words per line + a blocklist word present in ~half
    // the docs); the terminal-punctuation rule and multi-line re-join are
    // covered by TextAnalysisSpec on crafted documents.
    "line_clean" -> ((s, dir) =>
      TextAnalysis.lineClean(Tables.documents(s, dir), "doc_id", "text",
        lineSep = "\n", minWordsPerLine = 30, requireTerminalPunct = false,
        blockWords = Seq("customer"))),

    // Gopher-style intra-document repetition counters (native one-pass
    // expression, no shuffle) + integer-exact duplicate-word /
    // top-bigram-coverage ratios in permille.
    "repetition_stats" -> ((s, dir) =>
      TextAnalysis.withRepetitionStats(Tables.documents(s, dir), "text")
        .select(col("doc_id"), col("n_words"), col("n_distinct_words"),
          col("top_word_count"), col("n_bigrams"), col("n_distinct_bigrams"),
          col("top_bigram_count"),
          expr("(n_words - n_distinct_words) * 1000 div n_words")
            .as("dup_word_permille"),
          expr("CASE WHEN n_bigrams = 0 THEN 0 " +
            "ELSE top_bigram_count * 1000 div n_bigrams END")
            .as("top_bigram_permille"))),

    // Per-document distinctive terms: TF-IDF's ordering in pure integers
    // (tf DESC, df ASC) — vocabulary df table broadcast, one doc-keyed
    // shuffle shared by the tf agg and the top-k window.
    "tfidf_topk" -> ((s, dir) =>
      TextAnalysis.tfIdfTopK(Tables.documents(s, dir), "doc_id", "text", k = 3)),

    // Quantized BM25 ranked retrieval (RAG / hard-negative mining): exact
    // integer Robertson saturation (k1=6/5, b=3/4 as rationals over the
    // quantized avgdl) × int_log2 idf. Query 2 adds only common terms to
    // query 1 (they carry 0 idf bits and change nothing — the Lucene-clamp
    // semantics); query 3 is all-common and returns no rows.
    "bm25_topk" -> ((s, dir) =>
      TextAnalysis.bm25TopK(Tables.documents(s, dir), "doc_id", "text",
        queries = Seq(
          1L -> Seq("dup", "merge", "scan"),
          2L -> Seq("dup", "spark"),
          3L -> Seq("window", "column")),
        k = 5)),

    // Hybrid retrieval: BM25 lexical top-20 and brute-cosine vector
    // top-20 over the same id space (doc i's embedding is vec i — the
    // two-index-one-corpus deployment), fused by integer reciprocal-rank
    // fusion (k=60). Query 3's term list is all-common (BM25 returns no
    // rows — Lucene-clamp semantics), so its fused list is vector-only:
    // the null-rank path is live in the registered query.
    "hybrid_rrf" -> ((s, dir) => {
      val text = TextAnalysis.bm25TopK(Tables.documents(s, dir), "doc_id", "text",
          queries = Seq(
            1L -> Seq("dup", "merge", "scan"),
            2L -> Seq("dup", "spark"),
            3L -> Seq("window", "column")),
          k = 20)
        .withColumn("rank", row_number().over(Window.partitionBy("query_id")
          .orderBy(col("score_milli").desc, col("doc_id"))))
        .select(col("query_id"), col("doc_id").as("id"), col("rank"))
      val emb = Tables.embeddings(s, dir)
      val vec = Similarity.bruteForceTopK(
          emb.where(col("vec_id").isin(1L, 2L, 3L)), emb, k = 20)
        .select(col("query_id"), col("neighbor_id").as("id"), col("rank"))
      Similarity.rrfFuse(Seq("bm25" -> text, "ann" -> vec), k = 10)
    }),

    // The SERVING face of BM25: same queries/arithmetic as bm25_topk but
    // answered from the persisted term-sharded inverted index (build
    // once per corpus fingerprint, probe forever; probes read only the
    // query terms' shards). Oracle identical to bm25_topk's — the gate
    // proves index-served scores equal scan-computed ones bit for bit.
    "bm25_indexed" -> ((s, dir) => {
      val src = new java.io.File(s"$dir/documents.parquet")
      val idx = Ivf.cachedIndexDir(src, root = "/tmp/graft-textidx",
        params = "nShards=16")
      if (!TextIndex.isComplete(s, idx)) {
        Ivf.gcSupersededIndexes(idx)
        TextIndex.buildIndex(s, idx, Tables.documents(s, dir), nShards = 16)
      }
      TextIndex.query(s, idx, queries = Seq(
          1L -> Seq("dup", "merge", "scan"),
          2L -> Seq("dup", "spark"),
          3L -> Seq("window", "column")),
        k = 5)
    }),

    // Deterministic stratified sample: per-source rates, membership a pure
    // hash function of (doc_id, salt) — reproducible across runs and
    // mirrorable bit-for-bit by the oracle. Scan-stage filter, no shuffle.
    "stratified_sample" -> ((s, dir) =>
      Sampling.stratified(Tables.documents(s, dir), "source", "doc_id",
          rates = Map("src0" -> 0.05, "src1" -> 0.9, "src2" -> 0.5),
          defaultRate = 0.25, salt = "graft")
        .select("doc_id", "source")),

    // Sequence packing: cut fixed-token-budget training bins per source by
    // prefix sum (ONE shuffle; the window and the per-bin agg share the
    // source-hash exchange).
    "pack_sequences" -> ((s, dir) =>
      Sampling.packSequences(Tables.documents(s, dir), "source", "doc_id",
        TextAnalysis.tokenCount(col("text")), capTokens = 512)),

    // Deterministic global shuffle into training shards (engine-portable
    // Knuth hash rank; one shuffle on shard, per-shard positions).
    "global_shuffle" -> ((s, dir) =>
      Sampling.globalShuffle(Tables.documents(s, dir), "doc_id",
          numShards = 8, seed = 42L)
        .select("doc_id", "shard", "pos")),

    // Binary-quantized ANN: Hamming prefilter over packed sign bits, then
    // exact cosine re-rank of the surviving candidates.
    "ann_binary" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Similarity.binaryRerankTopK(emb.where(col("vec_id") < 20), emb,
        k = 5, dim = 64, candidates = 100)
    }),

    // Recall harness for the binary-quantized path, mirroring lsh_recall:
    // a deliberately TIGHT candidate budget (30, vs ann_binary's 100)
    // makes the Hamming prefilter actually lossy, and the measured
    // recall_permille pins the knob's cost — the number the scaladoc's
    // analytic argument rides on. Run at sample scale by contract (the
    // exact side is the labeled quadratic ground-truth operator).
    "binary_recall" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val queries = emb.where(col("vec_id") < 20)
      recallVsExact(
        Similarity.bruteForceTopK(queries, emb, k = 5),
        Similarity.binaryRerankTopK(queries, emb, k = 5, dim = 64,
          candidates = 30))
    }),

    // PQ-ADC recall at the same tight 30-candidate budget as the binary
    // tier — seed codebooks (first-16 subvectors) keep assignment + ADC
    // SQL-mirrorable; the trained-codebook path is covered in PqSpec.
    "pq_recall" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val queries = emb.where(col("vec_id") < 20)
      val cb = Pq.seedCodebooks(emb, m = 8, ksub = 16)
      recallVsExact(
        Similarity.bruteForceTopK(queries, emb, k = 5),
        Pq.pqRerankTopK(queries, emb, k = 5, codebooks = cb,
          candidates = 30))
    }),

    // Corpus analytics: cross-source shared-shingle matrix (mixture
    // design / leak tracing) — no shingle self-join, set-bounded pairs.
    "source_overlap" -> ((s, dir) =>
      TextAnalysis.sourceOverlapMatrix(Tables.documents(s, dir), "source",
        "text", n = 3)),

    // Corpus analytics: per-source lexical diversity (type-token ratio).
    "source_diversity" -> ((s, dir) =>
      TextAnalysis.sourceDiversity(Tables.documents(s, dir), "source",
        "doc_id", "text", n = 3)),

    // Quantile sketch: p10/p50/p90 of token count from a deterministic
    // bottom-256 sample (mergeable, one bounded pass; exact oracle
    // because the sample itself is hash-deterministic).
    "bottomk_quantiles" -> ((s, dir) =>
      Sketch.bottomKQuantiles(Tables.documents(s, dir), "doc_id",
        TextAnalysis.tokenCount(col("text")), k = 256,
        qs = Seq(10, 50, 90), seed = 42L)),

    // Importance sampling by token count: expected-100-doc weighted
    // Bernoulli, pure integer arithmetic, scan-stage predicate.
    "weighted_sample" -> ((s, dir) =>
      Sampling.weightedSample(Tables.documents(s, dir), "doc_id",
          TextAnalysis.tokenCount(col("text")), expectK = 100L,
          maxWeight = 1000L, seed = 42L)
        .select(col("doc_id"), col("__w").as("weight"))),

    // Quantile gate: drop the shortest ~10% of documents by token count
    // (integer-exact histogram quantile, ties kept).
    "quantile_filter" -> ((s, dir) =>
      Sampling.quantileFilter(Tables.documents(s, dir),
          TextAnalysis.tokenCount(col("text")), qNum = 1, qDen = 10,
          out = "n_tokens")
        .select("doc_id", "n_tokens")),

    // Semi-structured JSON column access (the other face of the
    // reference's Snowflake `$1:field::TYPE` staged-scan semantics,
    // SURVEY §1.2): extract a typed field from the events.props JSON
    // string and aggregate on it — scan-stage extraction, exact sums.
    "json_props" -> ((s, dir) =>
      Tables.events(s, dir)
        .select(get_json_object(col("props"), "$.k").cast("long").as("k"),
          col("value"))
        .groupBy(expr("k div 10").as("k_decade"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,6)")).cast("double").as("sum_value"))),

    // TPC-H Q5 shape: six-way snowflake join (region→nation→customer→
    // orders→lineitem→supplier) with the local-supplier condition and
    // exact decimal revenue — the dims broadcast, the two fact joins
    // shuffle on their keys.
    "q5_local_supplier" -> ((s, dir) => {
      val rev = col("l_extendedprice").cast("decimal(18,2)") *
        (lit(1).cast("decimal(12,2)") - col("l_discount").cast("decimal(12,2)"))
      Tables.region(s, dir).where(col("r_name") === "ASIA")
        .join(Tables.nation(s, dir), col("n_regionkey") === col("r_regionkey"))
        .join(Tables.customer(s, dir), col("c_nationkey") === col("n_nationkey"))
        .join(Tables.orders(s, dir)
          .where(col("o_orderdate") >= to_timestamp(lit("1996-01-01 00:00:00")) &&
            col("o_orderdate") < to_timestamp(lit("1998-01-01 00:00:00"))),
          col("o_custkey") === col("c_custkey"))
        .join(Tables.lineitem(s, dir), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.supplier(s, dir),
          col("l_suppkey") === col("s_suppkey") &&
            col("s_nationkey") === col("c_nationkey"))
        .groupBy("n_name").agg(sum(rev).cast("double").as("revenue"))
    }),

    // TPC-H Q3 shape: shipping priority — segment-filtered customer ⋈
    // date-bounded orders ⋈ shipdate-bounded lineitem, exact-decimal
    // revenue, deterministic top 10 (revenue DESC on the EXACT decimal,
    // then key — ordering decided before the double cast).
    "q3_shipping_priority" -> ((s, dir) => {
      val rev = col("l_extendedprice").cast("decimal(18,2)") *
        (lit(1).cast("decimal(12,2)") - col("l_discount").cast("decimal(12,2)"))
      Tables.customer(s, dir).where(col("c_mktsegment") === "BUILDING")
        .join(Tables.orders(s, dir)
          .where(col("o_orderdate") < to_timestamp(lit("1998-07-01 00:00:00"))),
          col("o_custkey") === col("c_custkey"))
        .join(Tables.lineitem(s, dir)
          .where(col("l_shipdate") > to_timestamp(lit("1998-07-01 00:00:00"))),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"))
        .agg(sum(rev).as("rev_exact"))
        .orderBy(col("rev_exact").desc, col("l_orderkey"))
        .limit(10)
        .select(col("l_orderkey"),
          col("rev_exact").cast("double").as("revenue"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"))
    }),

    // TPC-H Q7 shape: volume shipping between two nations — the
    // nation filters are applied to the supplier/customer DIMS first
    // and broadcast onto the facts, so most of lineitem/orders prunes
    // at the join instead of surviving to a post-filter.
    "q7_nation_volume" -> ((s, dir) => {
      val rev = col("l_extendedprice").cast("decimal(18,2)") *
        (lit(1).cast("decimal(12,2)") - col("l_discount").cast("decimal(12,2)"))
      val pair = Seq("NATION_1", "NATION_2")
      val supp = Tables.supplier(s, dir)
        .join(Tables.nation(s, dir).where(col("n_name").isin(pair: _*)),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("supp_nation"))
      val cust = Tables.customer(s, dir)
        .join(Tables.nation(s, dir).where(col("n_name").isin(pair: _*)),
          col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("n_name").as("cust_nation"))
      Tables.lineitem(s, dir)
        .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
        .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .where(col("supp_nation") =!= col("cust_nation"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).cast("long").as("l_year"))
        .agg(sum(rev).cast("double").as("revenue"))
    }),

    // TPC-H Q8 shape: national market share — one supplier nation's
    // permille of part-type revenue sold into one region's customers,
    // per order year. The last TPC-H query expressible over the
    // driver's table subset (Q2/Q9/Q11/Q16/Q20 need partsupp, Q12
    // needs l_shipmode/commitdate/receiptdate — absent columns).
    // Dims broadcast (part filter, supplier→nation), the region's
    // customer set applies as a shuffled left-semi join, and the share
    // divides exact e4-integer twins (the q14 convention).
    "q8_market_share" -> ((s, dir) => {
      val rev = col("l_extendedprice").cast("decimal(18,2)") *
        (lit(1).cast("decimal(12,2)") - col("l_discount").cast("decimal(12,2)"))
      val revE4 = (col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long") *
        (lit(100L) - (col("l_discount").cast("decimal(12,2)") * 100).cast("long"))
      val amerCust = Tables.customer(s, dir)
        .join(broadcast(Tables.nation(s, dir)
            .join(broadcast(Tables.region(s, dir)
              .where(col("r_name") === "AMERICA")),
              col("n_regionkey") === col("r_regionkey"))
            .select("n_nationkey")),
          col("c_nationkey") === col("n_nationkey"))
        .select("c_custkey")
      val suppNat = Tables.supplier(s, dir)
        .join(broadcast(Tables.nation(s, dir)
            .select(col("n_nationkey"), col("n_name"))),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("supp_nation"))
      Tables.lineitem(s, dir)
        .join(broadcast(Tables.part(s, dir).where(col("p_type") === "STANDARD")
          .select("p_partkey")), col("l_partkey") === col("p_partkey"))
        .join(Tables.orders(s, dir)
          .where(col("o_orderdate") >= to_timestamp(lit("1995-01-01 00:00:00")) &&
            col("o_orderdate") < to_timestamp(lit("1997-01-01 00:00:00"))),
          col("l_orderkey") === col("o_orderkey"))
        .join(amerCust, col("o_custkey") === col("c_custkey"), "left_semi")
        .join(broadcast(suppNat), col("l_suppkey") === col("s_suppkey"))
        .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
        .agg(
          sum(when(col("supp_nation") === "NATION_3", rev)
            .otherwise(lit(0).cast("decimal(18,2)"))).cast("double")
            .as("nation_revenue"),
          sum(rev).cast("double").as("total_revenue"),
          sum(when(col("supp_nation") === "NATION_3", revE4).otherwise(0L))
            .as("__n"),
          sum(revE4).as("__t"))
        .select(col("o_year"), col("nation_revenue"), col("total_revenue"),
          expr("__n * 1000 div __t").as("mkt_share_permille"))
    }),

    // TPC-H Q10 shape: returned-item revenue per customer for one
    // quarter, top 20 — date-filtered orders join the R-flagged
    // lineitems, customer + nation dims broadcast on at the end.
    "q10_returned_items" -> ((s, dir) => {
      val rev = col("l_extendedprice").cast("decimal(18,2)") *
        (lit(1).cast("decimal(12,2)") - col("l_discount").cast("decimal(12,2)"))
      Tables.orders(s, dir)
        .where(col("o_orderdate") >= to_timestamp(lit("1996-01-01 00:00:00")) &&
          col("o_orderdate") < to_timestamp(lit("1996-04-01 00:00:00")))
        .join(Tables.lineitem(s, dir).where(col("l_returnflag") === "R"),
          col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, dir)),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
        .agg(sum(rev).as("rev_exact"))
        .orderBy(col("rev_exact").desc, col("c_custkey"))
        .limit(20)
        .select(col("c_custkey"), col("c_name"),
          col("rev_exact").cast("double").as("revenue"),
          col("c_acctbal"), col("n_name"))
    }),

    // TPC-H Q4 shape: order-priority census over orders with at least
    // one late-shipped line (EXISTS = left-semi join; the classic
    // decorrelated-subquery plan) in one quarter.
    "q4_priority_exists" -> ((s, dir) => {
      Tables.orders(s, dir)
        .where(col("o_orderdate") >= to_timestamp(lit("1996-01-01 00:00:00")) &&
          col("o_orderdate") < to_timestamp(lit("1996-04-01 00:00:00")))
        .join(Tables.lineitem(s, dir),
          col("l_orderkey") === col("o_orderkey") &&
            col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS"),
          "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_orders"))
    }),

    // TPC-H Q13 shape: customer order-count distribution — LEFT OUTER
    // join so zero-order customers land in the 0 bucket, then the
    // count-of-counts double aggregation.
    "q13_order_histogram" -> ((s, dir) => {
      val perCust = Tables.customer(s, dir)
        .join(Tables.orders(s, dir), col("o_custkey") === col("c_custkey"),
          "left_outer")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("c_count"))
      perCust.groupBy("c_count")
        .agg(count(lit(1)).as("custdist"))
    }),

    // TPC-H Q18 shape: large-volume customers — the HAVING-filtered
    // order-quantity rollup semi-joins the fact table back; quantities
    // summed as LONGs (integral doubles) so both engines are exact.
    "q18_big_orders" -> ((s, dir) => {
      val big = Tables.lineitem(s, dir)
        .groupBy("l_orderkey")
        .agg(sum(col("l_quantity").cast("long")).as("sum_qty"))
        .where(col("sum_qty") > 300)
      Tables.customer(s, dir)
        .join(Tables.orders(s, dir), col("o_custkey") === col("c_custkey"))
        .join(big, col("o_orderkey") === col("l_orderkey"))
        .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
          col("o_totalprice"), col("sum_qty"))
    }),

    // TPC-H Q14 shape: promo-revenue share — lineitem ⋈ broadcast part,
    // conditional aggregation, exact decimal arithmetic; permille avoids
    // the float division.
    "q14_promo_revenue" -> ((s, dir) => {
      val rev = col("l_extendedprice").cast("decimal(18,2)") *
        (lit(1).cast("decimal(12,2)") - col("l_discount").cast("decimal(12,2)"))
      // integer twin of rev (price-cents × discount-complement-percent):
      // the permille share divides LONGs, immune to decimal-division
      // rounding-convention differences between engines
      val revE4 = (col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long") *
        (lit(100L) - (col("l_discount").cast("decimal(12,2)") * 100).cast("long"))
      val isPromo = col("p_type") === "ECONOMY"
      Tables.lineitem(s, dir)
        .where(col("l_shipdate") >= to_timestamp(lit("1997-01-01 00:00:00")) &&
          col("l_shipdate") < to_timestamp(lit("1998-01-01 00:00:00")))
        .join(broadcast(Tables.part(s, dir)),
          col("l_partkey") === col("p_partkey"))
        .agg(
          sum(when(isPromo, rev).otherwise(lit(0).cast("decimal(18,2)")))
            .cast("double").as("promo_revenue"),
          sum(rev).cast("double").as("total_revenue"),
          sum(when(isPromo, revE4).otherwise(0L)).as("__p"),
          sum(revE4).as("__t"))
        .select(col("promo_revenue"), col("total_revenue"),
          expr("__p * 1000 div __t").as("promo_permille"))
    }),

    // TPC-H Q6 shape: the forecasting-revenue one-scan aggregate — a
    // tight multi-predicate band (date range + decimal discount band +
    // quantity cap) that must reach the parquet scan as pushed filters,
    // then a single partial-aggregable sum. The canonical "is pushdown
    // working" query.
    "q6_forecast_revenue" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .where(col("l_shipdate") >= to_timestamp(lit("1997-01-01 00:00:00")) &&
          col("l_shipdate") < to_timestamp(lit("1998-01-01 00:00:00")) &&
          col("l_discount").cast("decimal(12,2)").between(0.05, 0.07) &&
          col("l_quantity").cast("long") < 24)
        .agg(sum(col("l_extendedprice").cast("decimal(18,2)") *
            col("l_discount").cast("decimal(12,2)")).cast("double").as("revenue"),
          count(lit(1)).as("n_lines"))),

    // TPC-H Q15 shape: top supplier by quarter revenue — a scalar-max
    // subquery decorrelated into a supplier-keyed aggregate plus a
    // one-row broadcast max joined back on exact decimal equality.
    "q15_top_supplier" -> ((s, dir) => {
      val rev = Tables.lineitem(s, dir)
        .where(col("l_shipdate") >= to_timestamp(lit("1997-01-01 00:00:00")) &&
          col("l_shipdate") < to_timestamp(lit("1997-04-01 00:00:00")))
        .groupBy(col("l_suppkey"))
        .agg(sum(col("l_extendedprice").cast("decimal(18,2)") *
          (lit(1).cast("decimal(12,2)") - col("l_discount").cast("decimal(12,2)")))
          .as("total_rev"))
      val mx = rev.agg(max(col("total_rev")).as("max_rev"))
      Tables.supplier(s, dir)
        .join(rev, col("s_suppkey") === col("l_suppkey"))
        .join(broadcast(mx), col("total_rev") === col("max_rev"))
        .select(col("s_suppkey"), col("s_name"),
          col("total_rev").cast("double").as("total_revenue"))
    }),

    // TPC-H Q17 shape: the correlated per-part average ("quantity below
    // 20% of this part's average") decorrelated into ONE part-keyed
    // aggregate joined back — and the float threshold turned into the
    // exact integer twin `5·qty·count < sum(qty)` so both engines
    // decide each line identically. The brand filter semi-restricts the
    // aggregate's input via a broadcast of the qualifying part keys.
    "q17_small_qty_revenue" -> ((s, dir) => {
      val brandParts = Tables.part(s, dir)
        .where(col("p_brand") === "Brand#13").select("p_partkey")
      val li = Tables.lineitem(s, dir)
        .join(broadcast(brandParts), col("l_partkey") === col("p_partkey"))
      val perPart = li.groupBy(col("l_partkey").as("pp"))
        .agg(sum(col("l_quantity").cast("long")).as("sq"),
          count(lit(1)).as("cq"))
      li.join(perPart, col("l_partkey") === col("pp"))
        .where(col("l_quantity").cast("long") * 5 * col("cq") < col("sq"))
        .agg(sum(col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double").as("small_rev"),
          count(lit(1)).as("n_lines"))
    }),

    // TPC-H Q19 shape: the disjunctive join predicate — three
    // brand/size/quantity bands OR'd together over lineitem ⋈ broadcast
    // part (adapted to the columns this corpus carries: no
    // shipmode/shipinstruct). The equi-join key stays clean; the
    // disjunction rides as a post-join filter the optimizer can split.
    "q19_discounted_revenue" -> ((s, dir) => {
      val q = col("l_quantity").cast("long")
      val cond =
        (col("p_brand") === "Brand#1" && col("p_size").between(1, 15) &&
          q.between(1, 11)) ||
        (col("p_brand") === "Brand#10" && col("p_size").between(1, 25) &&
          q.between(10, 20)) ||
        (col("p_brand") === "Brand#20" && col("p_size").between(1, 35) &&
          q.between(20, 30))
      Tables.lineitem(s, dir)
        .join(broadcast(Tables.part(s, dir)),
          col("l_partkey") === col("p_partkey"))
        .where(cond)
        .agg(sum(col("l_extendedprice").cast("decimal(18,2)") *
            (lit(1).cast("decimal(12,2)") -
              col("l_discount").cast("decimal(12,2)")))
            .cast("double").as("revenue"),
          count(lit(1)).as("n_lines"))
    }),

    // TPC-H Q21 shape (adapted: "late" = returnflag R — this corpus has
    // no commit/receipt dates): suppliers who were the ONLY supplier
    // with a returned line in a multi-supplier finished order. The
    // classic EXISTS (another supplier) + NOT EXISTS (another R
    // supplier) pair decorrelates into ONE order-keyed supplier census
    // (nsupp ≥ 2 ∧ nsupp_r = 1) — one exchange instead of two
    // self-joins; the ORACLE deliberately runs the textbook correlated
    // form, so the decorrelation is verified against an independent
    // formulation, not a mirror.
    "q21_waiting_supplier" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
      val perOrder = li.groupBy(col("l_orderkey").as("ok"))
        .agg(countDistinct(col("l_suppkey")).as("nsupp"),
          countDistinct(when(col("l_returnflag") === "R", col("l_suppkey")))
            .as("nsupp_r"))
      li.where(col("l_returnflag") === "R")
        .join(Tables.orders(s, dir).where(col("o_orderstatus") === "F"),
          col("l_orderkey") === col("o_orderkey"))
        .join(perOrder, col("l_orderkey") === col("ok"))
        .where(col("nsupp") >= 2 && col("nsupp_r") === 1)
        .join(broadcast(Tables.supplier(s, dir)),
          col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("s_name"))
        .agg(count(lit(1)).as("numwait"))
    }),

    // TPC-H Q22 shape (adapted: country code = nation key, dormancy =
    // no URGENT-priority order): customers above the positive-balance
    // average with no urgent orders, grouped by country. The scalar avg
    // subquery stays EXACT by comparing cross-multiplied cents
    // (`bal·n_pos > sum_pos` ⇔ bal > avg) instead of dividing; the
    // NOT EXISTS runs as a left-anti join against the distinct urgent
    // customer keys. Oracle again runs the correlated textbook form.
    "q22_dormant_customers" -> ((s, dir) => {
      val nations = Seq(1, 3, 5, 7, 9)
      val cust = Tables.customer(s, dir)
        .where(col("c_nationkey").isin(nations: _*))
      val pos = cust.where(col("c_acctbal") > 0)
        .agg(sum((col("c_acctbal").cast("decimal(18,2)") * 100).cast("long"))
            .as("sum_pos_cents"),
          count(lit(1)).as("n_pos"))
      val urgent = Tables.orders(s, dir)
        .where(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey")).distinct()
      cust.join(urgent, col("c_custkey") === col("o_custkey"), "left_anti")
        .crossJoin(broadcast(pos))
        .where((col("c_acctbal").cast("decimal(18,2)") * 100).cast("long") *
          col("n_pos") > col("sum_pos_cents"))
        .groupBy(col("c_nationkey").as("cntry"))
        .agg(count(lit(1)).as("numcust"),
          sum(col("c_acctbal").cast("decimal(18,2)")).cast("double")
            .as("totacctbal"))
    }),

    // Z-order (Morton) clustering key over (user_id, event_type-bucket):
    // the multi-dimensional layout key that makes row-group stats
    // selective on every interleaved column at once.
    "zorder_key" -> ((s, dir) =>
      Tables.events(s, dir)
        .select(col("event_id"),
          pmod(col("user_id"), lit(1L << 16)).as("u16"),
          pmod(col("event_id"), lit(1L << 16)).as("e16"))
        .withColumn("z",
          operators.Layout.zorderKey(Seq(col("u16"), col("e16")), 16))),

    // Data-quality gate report: every rule evaluated in ONE scan, exact
    // violation counts per rule (the go/no-go input before merge).
    "data_quality" -> ((s, dir) =>
      Validate.report(Tables.documents(s, dir), Seq(
        "empty_text" -> (length(col("text")) === 0),
        "short_text" -> (col("n_chars") < 200),
        "chars_mismatch" -> (col("n_chars") =!= length(col("text"))),
        "unknown_lang" -> !col("lang").isin("en", "de", "fr", "es")))),

    // Distribution-drift monitor (train/serve skew): total-variation
    // distance between the first and second half-month's value
    // histograms per event type — exact integer arithmetic (TV, not
    // PSI: no ln), one scan + one (key, bin) shuffle.
    "drift_tv" -> ((s, dir) =>
      Validate.driftTv(Tables.events(s, dir), "event_type", "value",
          currentSlice = col("ts") >= lit("2024-01-16").cast("timestamp"),
          lo = 0.0, hi = 500.0, nBins = 20)
        .select(col("key").as("event_type"), col("n_cur"), col("n_ref"),
          col("tv"))),

    // Per-source quantile gate: each source drops ITS bottom quartile by
    // token count (a global cut would gut the lower-scoring sources).
    "quantile_filter_by_source" -> ((s, dir) =>
      Sampling.quantileFilterPerKey(Tables.documents(s, dir), "source",
          TextAnalysis.tokenCount(col("text")), qNum = 1, qDen = 4,
          out = "n_tokens")
        .select("doc_id", "source", "n_tokens")),

    // Data-mixture sampling: 50/30/20 across three sources under a 2000-
    // token budget; greedy deterministic selection, unlisted sources out.
    "mix_sources" -> ((s, dir) =>
      Sampling.mixSources(Tables.documents(s, dir), "doc_id", "source",
        TextAnalysis.tokenCount(col("text")),
        weights = Map("src0" -> 0.5, "src1" -> 0.3, "src2" -> 0.2),
        totalTokens = 2000L, seed = 42L)),

    // Embedding-space drift monitor: per-label centroid L1/max movement
    // between the even- and odd-id corpus halves (standing in for two
    // crawl snapshots / encoder versions) — exact quantized integer
    // centroids, the drift_tv companion for the vector column.
    "centroid_drift" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Embeddings.centroidDrift(emb.where(col("vec_id") % 2 === 0),
        emb.where(col("vec_id") % 2 === 1), "embedding", Seq("label"))
    }),

    // DSIR-style targeted-selection scores: hashed unigram+bigram bucket
    // models (portable mix64 → 512 buckets), target = the English docs,
    // score = Σ quantized (bits_raw − bits_target) per feature occurrence
    // — positive looks-like-target, negative unlike it. Both models are
    // ≤512-row broadcasts; the corpus pays one scan + one doc-keyed agg.
    "dsir_scores" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      Sampling.dsirScores(docs, docs.where(col("lang") === "en"),
        "doc_id", "text", buckets = 512)
    }),

    // The selection step: 50 most-target-like docs, deterministic rank
    // (dsir_bits DESC, doc_id) — DSIR resampling as a reproducible top-k.
    "dsir_select" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      Sampling.dsirSelect(docs, docs.where(col("lang") === "en"),
        "doc_id", "text", k = 50, buckets = 512)
    }),

    // Corpus-adaptive fluency proxy: distinct-bigram overlap with the
    // corpus's own top-K bigram vocabulary (integer permille — no LM, no
    // float logprobs; broadcast vocab probe).
    "fluency_score" -> ((s, dir) =>
      TextAnalysis.bigramFamiliarity(Tables.documents(s, dir), "doc_id",
        "text", vocabK = 500)),

    // Exact-k deterministic uniform sample per stratum (k smallest md5
    // per source — distributed reservoir sampling, reproducible).
    "sample_k_per_key" -> ((s, dir) =>
      Sampling.exactKPerKey(Tables.documents(s, dir), k = 5, "source", "doc_id")
        .select("doc_id", "source")),

    // Leakage-safe train/val/test split: assignment keyed on the GROUP
    // (source), not the document — near-identical docs from one source
    // can never straddle the train/eval boundary. Pure scan-stage CASE
    // over md5 thresholds; deterministic across runs, engines, and
    // repartitioning.
    "group_split" -> ((s, dir) =>
      Tables.documents(s, dir).select(col("doc_id"), col("source"),
        Sampling.splitAssign(col("source"),
          Seq(("train", 0.8), ("val", 0.1), ("test", 0.1)), "split42")
          .as("split"))),

    // Near-dup-aware split: the split key is the duplicate-CLUSTER
    // representative (shared CC table; singletons key on themselves), so
    // every member of a near-dup cluster lands in the same split — the
    // contamination channel a per-doc split leaves open even after
    // source-level splitting.
    "split_by_component" -> ((s, dir) => {
      val comp = sharedJaccardComponents(s, dir)
        .select(col("id").as("doc_id"), col("label"))
      Tables.documents(s, dir).join(comp, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("label"), col("doc_id")).as("split_key"),
          Sampling.splitAssign(coalesce(col("label"), col("doc_id")),
            Seq(("train", 0.8), ("val", 0.1), ("test", 0.1)), "split42")
            .as("split"))
    }),

    // Semantic decontamination: corpus embeddings near-duplicate of any
    // benchmark embedding (SRP-bucketed broadcast probe — the paraphrase
    // leakage the n-gram `decontaminate` query can't see).
    "decon_semantic" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Decontaminate.flagSemantic(emb, "vec_id", "embedding",
        emb.where(col("vec_id") < 20), "vec_id", "embedding",
        threshold = 0.4, dim = 64, planes = 4, tables = 4)
    }),

    // Multimodal: opaque-binary byte-level feature extraction as native
    // expressions — size, first byte, magic-byte format sniff. No decoded
    // or fabricated content; dims/pixel stats come from the decode tiers.
    "multimodal_features" -> ((s, dir) =>
      Multimodal.withNativeFeatures(
          Multimodal.attachFakeMedia(Tables.documents(s, dir), "doc_id", "text"))
        .select("media_id", "n_bytes", "first_byte", "format")),

    // Format sniff over REAL encoded payloads: each doc id gets a payload
    // of one genuine format by id % 4 (PNG / WAV / MP4 / animated GIF) and
    // the codegen'd magic-byte sniffer must identify every one; the oracle
    // is the generator's id % 4 closed form.
    "media_format_sniff" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      def part(m: Long, attach: DataFrame => DataFrame) =
        attach(docs.where(col("doc_id") % 4 === m))
      val mixed = part(0, Multimodal.attachGeneratedImages(_, "doc_id"))
        .unionAll(part(1, Multimodal.attachGeneratedAudio(_, "doc_id")))
        .unionAll(part(2, Multimodal.attachGeneratedVideos(_, "doc_id")))
        .unionAll(part(3, Multimodal.attachGeneratedGifs(_, "doc_id")))
      Multimodal.withNativeFeatures(mixed).select("media_id", "format")
    }),

    // REAL image decode (JDK javax.imageio): deterministic generated PNGs
    // round-trip through an actual encode → decode → pixel scan; the oracle
    // recomputes the closed-form dims/channel sums the fixtures guarantee.
    "image_features" -> ((s, dir) =>
      Multimodal.decodeImageFeatures(
        Multimodal.attachGeneratedImages(Tables.documents(s, dir), "doc_id"))),

    // REAL audio decode (RIFF/WAVE PCM16 byte parse, no codec library):
    // generated fixtures round-trip through the genuine chunk walker, and
    // the oracle recomputes every stat from the generator's closed forms.
    "audio_features" -> ((s, dir) =>
      Multimodal.decodeAudioFeatures(
        Multimodal.attachGeneratedAudio(Tables.documents(s, dir), "doc_id"))),

    // REAL video-container metadata: generated ISO-BMFF payloads (genuine
    // nested box structures, version-0/1 mvhd+tkhd mix, a 64-bit-largesize
    // mdat every 7th id) round-tripped through the pure-JVM box walker;
    // the oracle recomputes the fixtures' closed forms.
    "video_metadata" -> ((s, dir) =>
      Multimodal.decodeVideoMetadata(
        Multimodal.attachGeneratedVideos(Tables.documents(s, dir), "doc_id"))),

    // REAL animated-GIF frame decode (JDK GIF codec): generated multi-frame
    // fixtures round-trip through an actual frame walk — true frame count,
    // dims, Graphic Control Extension delays, exact per-frame channel sums;
    // the oracle replays the generator's closed forms per (id, frame).
    "gif_frames" -> ((s, dir) =>
      Multimodal.decodeGifFrames(
        Multimodal.attachGeneratedGifs(Tables.documents(s, dir), "doc_id"))),

    // First/last-touch conversion attribution: touches reset after each
    // purchase; per conversion the segment's first touch, the touch
    // right before it, and the touch count — one key exchange.
    "attribution" -> ((s, dir) =>
      Funnel.attribution(Tables.events(s, dir), "purchase")),

    // Mixture budget planning under availability caps: 8-round integer
    // waterfill of a 20k-token budget over the 20 sources with weights
    // (N mod 7)+1 — heavy-weight sources cap at their availability and
    // their shortfall cascades onto the open ones.
    "mixture_alloc" -> ((s, dir) => {
      val stats = Tables.documents(s, dir)
        .groupBy(col("source").as("key"))
        .agg(sum(TextAnalysis.tokenCount(col("text"))).as("avail"))
      val weights = (0 until 20)
        .map(i => s"src$i" -> ((i % 7) + 1).toLong).toMap
      Sampling.waterfillBudgets(stats, weights, budget = 20000L)
    }),

    // Zipf coverage curve: what permille of token occurrences do the
    // top-N words cover — the tokenizer-vocab budget planner. Bounded
    // TakeOrdered of max(N) rows, no vocab-wide window.
    "vocab_coverage" -> ((s, dir) =>
      TextAnalysis.vocabCoverage(Tables.documents(s, dir), "text")),

    // Robust daily-volume anomaly days per event type: |n − med| >
    // 3·MAD with exact integer lower-medians — the volume monitor.
    "anomaly_days" -> ((s, dir) =>
      Anomaly.madOutlierDays(Tables.events(s, dir), "ts", "event_type")),

    // Continuous per-type day axis with zero-filled counts,
    // forward-filled last observation and gap age — the regular-grid
    // repair every trend model assumes.
    "gap_fill" -> ((s, dir) =>
      TimeSeries.gapFill(Tables.events(s, dir), "ts", "event_type")),

    // Registrable-domain census over deterministic synthetic URLs
    // (scheme-less for id%7=0, :8080 port for id%5=0, subdomain always,
    // co.uk multi-label suffix for id%4=3): the engine PARSES host →
    // registrable domain; the oracle recomputes the construction's
    // closed form — real parsing vs independent expectation, the
    // multimodal-fixture pattern.
    "domain_census" -> ((s, dir) =>
      Tables.documents(s, dir)
        // staged projections — §7.4 item 0: hostOf multiply-references
        // the URL and registrableDomain the host; composing them inline
        // re-evaluates the upstream expression per reference
        .select(col("n_chars"), syntheticUrl(col("doc_id")).as("__url"))
        .select(col("n_chars"), Web.hostOf(col("__url")).as("__host"))
        .groupBy(Web.registrableDomain(col("__host")).as("domain"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars").cast("long")).as("total_chars"))),

    // Domain-level quality prior joined back to every doc: the
    // URL-prior trick — noisy per-page signals borrow strength from
    // the publisher mean (token count here), with the domain's doc
    // count as the downstream confidence weight.
    "domain_prior" -> ((s, dir) =>
      Web.domainPrior(
        Tables.documents(s, dir)
          .select(col("doc_id"), col("text"),
            syntheticUrl(col("doc_id")).as("url")),
        "doc_id", "url",
        size(filter(split(col("text"), " "), w => w =!= "")).cast("long"))),

    // Trending terms: top-20 week-over-week term-frequency spikes over
    // the ingestion-order week axis (doc_id div 250 — the crawl-
    // snapshot time a static corpus carries), floored at 5 prior
    // occurrences and requiring truly consecutive weeks — the
    // vocabulary-drift monitor next to drift_tv's distribution view.
    "trending_terms" -> ((s, dir) => {
      val tw = Tables.documents(s, dir)
        .select(expr("doc_id div 250").as("w"),
          explode(split(col("text"), " ")).as("t"))
        .where(col("t") =!= "")
        .groupBy("t", "w").agg(count(lit(1)).as("n"))
      val win = Window.partitionBy("t").orderBy("w")
      tw.withColumn("pn", lag("n", 1).over(win))
        .withColumn("pw", lag("w", 1).over(win))
        .where(col("pw") === col("w") - 1 && col("pn") >= 5)
        .withColumn("ratio_permille", expr("1000 * n div pn"))
        .orderBy(col("ratio_permille").desc, col("t"), col("w")).limit(20)
        .select(col("t").as("term"), col("w").as("week"), col("n"),
          col("pn").as("n_prev"), col("ratio_permille"))
    }),

    // Safety-blocklist census per source: denylist hits counted by the
    // native codegen'd CountInSet in the scan stage, aggregated to
    // flagged-doc rates — the filter audit a safety pipeline reports.
    "blocklist_hits" -> ((s, dir) =>
      Tables.documents(s, dir)
        .select(col("source"),
          graft.functions.F.countInSet(split(col("text"), " "),
            Seq("slow", "crash", "leak")).as("__h"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum((col("__h") > 0).cast("long")).as("flagged"),
          sum(col("__h")).as("total_hits"))
        .withColumn("flagged_permille", expr("1000 * flagged div n_docs"))),

    // Market-basket lift between event types over 30-min sessions:
    // per-session distinct presence, exact integer lift permille —
    // which actions travel together beyond chance.
    "basket_lift" -> ((s, dir) =>
      Cooccur.basketLift(Tables.events(s, dir), gapSeconds = 1800)),

    // Per-PUBLISHER document cap (C4's per-domain cap): the registrable
    // domain keys a deterministic-rank cap — ≤3 docs per domain
    // whatever a crawl dumped; composes Web parsing with the capPerKey
    // Knuth-rank discipline.
    "domain_cap" -> ((s, dir) =>
      Dedup.capPerKey(
        Tables.documents(s, dir)
          .select(col("doc_id"), syntheticUrl(col("doc_id")).as("__url"))
          .select(col("doc_id"), Web.hostOf(col("__url")).as("__host"))
          .select(col("doc_id"),
            Web.registrableDomain(col("__host")).as("domain")),
        k = 3, keys = Seq("domain"), idCol = "doc_id")),

    // URL canonicalization — crawl-frontier alias collapse: mixed-case
    // scheme/host, default-port strip, tracking-param removal,
    // query-param sort, fragment drop, empty path → "/" (the messy
    // input covers every branch by id arithmetic; the oracle emits the
    // expected canonical closed-form from the same arithmetic).
    "url_canonical" -> ((s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"),
          syntheticTrackedUrl(col("doc_id")).as("__url"))
        .select(col("doc_id"),
          Web.canonicalizeUrl(col("__url")).as("url_canon"))),

    // The use-case: alias pairs (clean even twin, tracked+upper-case
    // odd twin of the same gid) collapse to ONE canonical URL — the
    // frontier-dedup census a crawler runs before fetch.
    "url_dup_census" -> ((s, dir) =>
      Tables.documents(s, dir)
        .select(expr("doc_id div 2").as("gid"), col("doc_id"))
        .withColumn("__u", concat(
          when(pmod(col("doc_id"), lit(2)) === 0,
            lit("https://site")).otherwise(lit("HTTPS://SITE")),
          pmod(col("gid"), lit(97)), lit(".com"),
          lit("/p/"), col("gid"),
          when(pmod(col("doc_id"), lit(2)) === 0, lit(""))
            .otherwise(lit("?utm_source=x#top"))))
        .groupBy(Web.canonicalizeUrl(col("__u")).as("url_canon"))
        .agg(count(lit(1)).as("n_aliases"),
          min(col("doc_id")).as("first_doc"))),

    // HTML → visible text: script/style subtrees and comments drop,
    // tags become separators, the six ubiquitous entities decode
    // (&amp; last), whitespace collapses — the extraction step between
    // a raw crawl and every text-quality operator. Closed-form oracle
    // from the synthetic page construction (the domain_census posture:
    // parsing happens only on the engine side).
    "html_strip" -> ((s, dir) =>
      Tables.documents(s, dir).select(col("doc_id"),
        Web.stripHtml(concat(
          lit("<html><head><title>Doc "), col("doc_id"),
          lit("</title><style type=\"text/css\">body{color:red}</style>"),
          lit("</head><body><!-- header --><h1>Source &amp; "),
          col("source"), lit("</h1><p class=\"main\">"), col("text"),
          lit("</p><script>var n = 1 < 2;</script></body></html>")))
          .as("text_vis"))
        .withColumn("n_chars_vis", length(col("text_vis")).cast("long"))),

    // HTML outlink extraction → canonicalize → registrable-domain
    // census: the crawl outlink graph's domain-level aggregation (what
    // seeds PageRank/TrustRank); fragment-only hrefs excluded.
    "html_links" -> ((s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"), explode(Web.extractLinks(concat(
          lit("<a href=\"https://site"), pmod(col("doc_id"), lit(97)),
          lit(".com/a/"), col("doc_id"), lit("\">x</a>"),
          lit("<a HREF='HTTP://Sub.site"),
          pmod(col("doc_id") + 1, lit(97)),
          lit(".ORG:80/b?utm_source=z'>y</a>"),
          lit("<a href=\"#frag\">skip</a>")))).as("link"))
        // STAGED projections, not one composed expression: each Web
        // function references its input many times, so composing
        // canonicalize∘hostOf∘registrableDomain inline re-evaluates the
        // whole upstream chain per reference (CollapseProject keeps the
        // stages apart only when they are separate selects) — the
        // composed form benched 14.5 s where the staged one runs ~0.5 s
        .select(Web.canonicalizeUrl(col("link")).as("__canon"))
        .select(Web.hostOf(col("__canon")).as("__host"))
        .groupBy(Web.registrableDomain(col("__host")).as("domain"))
        .agg(count(lit(1)).as("n_links"))),

    // Corpus-global exact line dedup (Lee et al. line tier): every
    // non-blank line keeps only its first (doc_id, pos) occurrence —
    // the syndicated-content counterpart of boilerplate_lines (which
    // drops frequent lines from EVERY doc). Full-algorithm oracle: the
    // engine's 64-bit portable line hash recomputed in SQL.
    "line_dedup" -> ((s, dir) =>
      TextAnalysis.dedupLinesGlobal(
        Tables.documents(s, dir).select(col("doc_id"),
          concat_ws("\n", concat(lit("src: "), col("source")), col("text"),
            concat(lit("lang: "), col("lang"))).as("page")),
        "doc_id", "page")),

    // Synchronous label-propagation communities over the user↔item
    // interaction graph (pagerank's bipartite edges): dense regions of
    // one connected blob get distinct labels — topic/community
    // structure where CC only answers reachability. Deterministic
    // (count DESC, label ASC argmax; fixed 5 rounds) → full unrolled
    // SQL oracle, the pagerank posture.
    "communities" -> ((s, dir) => {
      val ev = Tables.events(s, dir).select(col("user_id"),
        (get_json_object(col("props"), "$.k").cast("long") + lit(1000000L))
          .as("item"))
      Graph.labelPropagation(
        ev.select(col("user_id").as("u"), col("item").as("v")),
        "u", "v", rounds = 5)
    }),

    // Multi-source BFS over the user↔item interaction graph: exact hop
    // distance from 5 seed users within 3 hops — the crisp "hops from
    // trusted" label TrustRank smooths into a score.
    "bfs_layers" -> ((s, dir) => {
      val ev = Tables.events(s, dir).select(col("user_id"),
        (get_json_object(col("props"), "$.k").cast("long") + lit(1000000L))
          .as("item"))
      Graph.bfsLayers(
        ev.select(col("user_id").as("u"), col("item").as("v")),
        "u", "v", seeds = Seq(1L, 2L, 3L, 4L, 5L), maxHops = 3)
    }),

    // Luhn-validated payment-card redaction: of the two 16-digit
    // candidates planted per doc, the constant one always passes the
    // checksum and the id-varying one passes only when its tail makes
    // the mod-10 sum land — the oracle replays the SAME Luhn fold in
    // SQL, so validity decisions mirror bit for bit. A 12-digit run
    // stays (below the card length band).
    "card_redact" -> ((s, dir) =>
      Tables.documents(s, dir).select(col("doc_id"),
        TextAnalysis.redactCards(concat(
          lit("order 41111111111111"),
          lpad(pmod(col("doc_id"), lit(100)).cast("string"), 2, "0"),
          lit(" paid 4242424242424242 ref 123456789012 "),
          col("text"))).as("text_red"))),

    // Flesch reading-ease in exact integer micro-units over a page with
    // synthetic sentence enders — the fluency-adjacent readability
    // filter (ordering is the signal; grade is calibration).
    "readability" -> ((s, dir) =>
      TextAnalysis.readability(
        Tables.documents(s, dir).select(col("doc_id"),
          concat(col("text"), lit(". End of doc "), col("doc_id"),
            lit("? Yes!")).as("page")),
        "doc_id", "page")),

    // Epoch/repetition budgeting at a FIXED mixture: per source, the
    // tokens the mixture demands vs what it holds — repeat factor and
    // epoch count, the data-constrained-scaling table read before
    // deciding which sources to cap (waterfill's complement). Weights
    // (i%5)+1 by source index; the oracle derives the same weight from
    // the source NAME — independent formulations.
    "epoch_budget" -> ((s, dir) =>
      Sampling.epochBudget(
        Tables.documents(s, dir)
          .groupBy(col("source").as("key"))
          .agg(sum(size(filter(split(col("text"), " "), w => w =!= ""))
            .cast("long")).as("avail")),
        weights = (0 until 20).map(i => s"src$i" -> ((i % 5) + 1L)).toMap,
        budget = 1000000L)),

    // Exact decile assignment for a per-doc quality metric via the
    // two-phase distributed ranking — the percentile feature a gate
    // thresholds, with deterministic tie handling at every boundary.
    "quality_deciles" -> ((s, dir) =>
      Correlate.rankBuckets(Tables.documents(s, dir), "doc_id",
        col("n_chars").cast("long"), buckets = 10)),

    // Deterministic curriculum layout: exact difficulty deciles
    // (n_chars), within-bucket Knuth shuffle, sharded positions — the
    // easy→hard training order a reader replays round-robin, no
    // rand() anywhere.
    "curriculum_order" -> ((s, dir) =>
      Sampling.curriculumOrder(Tables.documents(s, dir), "doc_id",
        col("n_chars").cast("long"), buckets = 10, numShards = 8,
        seed = 7L)),

    // Exact top-20 key-skew census over the event log's user key — the
    // "should this shuffle key be salted" diagnostic, map-side-combined
    // counts + bounded TakeOrdered, no full sort.
    "skew_census" -> ((s, dir) =>
      Frequencies.keySkewCensus(
        Tables.events(s, dir).select(col("user_id")), "user_id", k = 20)),

    // Weighted-keyword topic classification over the corpus vocabulary:
    // broadcast lexicon join → (doc, topic) sum → deterministic argmax;
    // docs with no lexicon hit tag "other".
    "topic_classify" -> ((s, dir) =>
      TextAnalysis.topicClassify(Tables.documents(s, dir), "doc_id", "text",
        GraftLexicon)),

    // Embedding-norm health: the 10 vectors at each norm extreme in
    // exact fixed-point — collapsed outputs and exploding rows, the
    // encoder-bug tripwires.
    "embedding_norm_outliers" -> ((s, dir) =>
      Embeddings.normOutliers(Tables.embeddings(s, dir))),

    // DAU + exact trailing-7-day WAU per day — the engagement series
    // (stickiness is the scalar ratio): cover-explode of the slim
    // (user, day) table, no sliding distinct.
    "rolling_active" -> ((s, dir) =>
      TimeSeries.rollingActive(Tables.events(s, dir), "ts")),

    // Exact Spearman rank correlation (integer micro-units) between two
    // doc quality signals — token count vs distinct-token count — via
    // the distributed two-phase ranking (no single-partition window).
    "rank_correlation" -> ((s, dir) =>
      Correlate.spearmanMicro(Tables.documents(s, dir),
        size(split(col("text"), " ")).cast("long"),
        size(array_distinct(split(col("text"), " "))).cast("long"),
        "doc_id")),

    // Borda rank-average quality blend: three incomparable signals
    // (chars, tokens, distinct tokens) each contribute exactly their
    // ORDERING via an exact distributed rank; rank_sum is the ensemble
    // score a curation gate thresholds — no calibration, no fat-tail
    // domination. Two-phase histogram ranking per metric, no
    // single-partition window.
    "quality_blend" -> ((s, dir) =>
      Correlate.rankBlend(Tables.documents(s, dir), "doc_id", Seq(
        col("n_chars"),
        size(split(col("text"), " ")),
        size(array_distinct(split(col("text"), " ")))))),

    // Two-variant conversion experiment with an exact chi-square (for a
    // 2×2 table χ² = z², so this is the significance read-out in pure
    // integer arithmetic): variant by user-id parity, conversion = any
    // 'purchase' event. One user-keyed agg → 2-row table → BigInt
    // driver math (the spearman convention).
    "ab_lift" -> ((s, dir) =>
      Experiment.abChi2(Tables.events(s, dir), col("user_id"),
        when(pmod(col("user_id"), lit(2)) === 0, "A").otherwise("B"),
        col("event_type") === "purchase")),

    // Benford first-digit audit over order totals — the synthetic-data /
    // fabricated-source smell test, exact integer permilles per digit.
    "benford_digits" -> ((s, dir) =>
      Validate.benford(Tables.orders(s, dir), col("o_totalprice"))),

    // Gini concentration of events per user — "how much of the traffic
    // do the top contributors own", the inequality read-out a sampling /
    // caps policy is calibrated against. Exact integer permille.
    "gini_concentration" -> ((s, dir) =>
      Correlate.giniPermille(
        Tables.events(s, dir).groupBy("user_id")
          .agg(count(lit(1)).as("n_events")),
        col("n_events"), col("user_id"))),

    // Hapax-legomena profile per source: vocabulary size, single-
    // occurrence type count (Good–Turing n₁), and the hapax share —
    // the noisy-source / boilerplate-source gate next to vocab_coverage.
    "hapax_rate" -> ((s, dir) =>
      TextAnalysis.hapaxProfile(Tables.documents(s, dir), "source", "text")
        .withColumnRenamed("key", "source")),

    // Politeness-scheduled crawl frontier: per-host fetch waves under a
    // quality-priority order (longer docs first), with per-host
    // crawl-delay tiers folded into each URL's earliest start time.
    "crawl_schedule" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"), col("n_chars"),
          syntheticUrl(col("doc_id")).as("__url"))
        .select(col("doc_id"), col("n_chars"),
          Web.hostOf(col("__url")).as("host"))
      Web.politenessWaves(docs, col("host"), col("n_chars").desc,
          col("doc_id"), lit(1L) + pmod(pmod(col("doc_id"), lit(97)), lit(3)))
        .select("doc_id", "host", "wave", "eta_sec")
    }),

    // Cross-split contamination census: near-dup clusters (the shared
    // CC table) whose members land in DIFFERENT doc-keyed train/val/test
    // splits — the leakage channel a per-doc split leaves open and
    // split_by_component closes. Reports component and member-pair
    // counts per split pair.
    "split_leakage" -> ((s, dir) => {
      val comp = sharedJaccardComponents(s, dir)
        .select(col("id").as("doc_id"), col("label"))
      val assigned = Tables.documents(s, dir).select(col("doc_id"))
        .join(comp, Seq("doc_id"), "left")
        .select(
          coalesce(col("label"), col("doc_id")).as("component"),
          Sampling.splitAssign(col("doc_id"),
            Seq(("train", 0.8), ("val", 0.1), ("test", 0.1)), "leak42")
            .as("split"))
      val m = assigned.groupBy("component", "split")
        .agg(count(lit(1)).as("m"))
      val a = m.select(col("component"), col("split").as("split_a"),
        col("m").as("m_a"))
      val b = m.select(col("component"), col("split").as("split_b"),
        col("m").as("m_b"))
      a.join(b, Seq("component"))
        .where(col("split_a") < col("split_b"))
        .groupBy("split_a", "split_b")
        .agg(count(lit(1)).as("n_components"),
          sum(col("m_a") * col("m_b")).as("n_leaked_pairs"))
    }),

    // Exact robust location per event type: trim the bottom/top 5% by
    // rank ON THE VALUE HISTOGRAM (no row-level window) and average the
    // kept band — the fat-tail-immune stream-health metric, with the
    // band's boundary order statistics for free.
    "trimmed_stats" -> ((s, dir) =>
      Correlate.trimmedMeanPerKey(Tables.events(s, dir), "event_type",
        (col("value").cast("decimal(18,2)") * 100).cast("long"))),

    // Within-session event-type Markov chain → stationary distribution
    // in exact integer ppm: one key exchange collapses the corpus to a
    // |types|²-bounded transition matrix; 20 fixed-point power
    // iterations run driver-side in BigInt, mirrored term for term by
    // the oracle's unrolled HUGEINT CTEs (the bfs_layers precedent).
    "markov_stationary" -> ((s, dir) =>
      Sessionize.transitionStationary(Tables.events(s, dir),
        gapSeconds = 1800)),

    // Vocabulary-growth curve (empirical Heaps law): distinct types
    // born within the first N corpus token positions, positions from a
    // two-phase distributed prefix sum — no corpus-wide window.
    "vocab_growth" -> ((s, dir) =>
      TextAnalysis.vocabGrowth(Tables.documents(s, dir), "doc_id", "text")),

    // Yule's K lexical diversity per source (exact ×10⁴ integer units):
    // the length-invariant repetitiveness constant — high K = templated
    // or boilerplate vocabulary — next to hapax_rate's tail read-out.
    "yule_k" -> ((s, dir) =>
      TextAnalysis.yuleK(Tables.documents(s, dir), "source", "text")
        .withColumnRenamed("key", "source")),

    // Zipf rank-band profile of the corpus frequency spectrum: types and
    // token mass per ⌊log₂(rank)⌋ band from run-interval arithmetic —
    // the exact rank/frequency curve with no corpus-sized sort or
    // per-type rank materialization.
    "zipf_bands" -> ((s, dir) =>
      TextAnalysis.zipfBands(Tables.documents(s, dir), "text")),

    // Character-class composition per source (single-pass codegen'd
    // census): letters/digits/spaces/punct/other totals + letter share —
    // the "is this prose" encoding audit at scan cost.
    "char_class_census" -> ((s, dir) =>
      TextAnalysis.charClassProfile(Tables.documents(s, dir), "source", "text")
        .withColumnRenamed("key", "source")),

    // Daily-count burstiness (Fano factor, exact milli-units) per event
    // type: Poisson reads ~1000, crawl waves / batch re-ingests read ≫ —
    // the dispersion monitor next to anomaly_days' point alerts.
    "fano_factor" -> ((s, dir) =>
      TimeSeries.fanoFactor(Tables.events(s, dir), "ts", "event_type")
        .withColumnRenamed("key", "event_type")),

    // Exact two-sample KS distance of each source's doc-length
    // distribution vs the whole corpus (integer permille, no binning):
    // the shape-sensitive drift gate next to drift_tv's binned TV.
    "ks_drift" -> ((s, dir) =>
      Validate.ksVsCorpus(Tables.documents(s, dir), "source", col("n_chars"))
        .withColumnRenamed("key", "source")),

    // Exact chi-square + Cramér's V between source and language — the
    // chance-corrected association audit ("do sources differ in language
    // mix beyond what margins explain"), full-grid, integer micro-units.
    "assoc_cramers" -> ((s, dir) =>
      Correlate.cramersV(Tables.documents(s, dir), col("source"), col("lang"))),

    // Exact two-slice KS per event type: the final observed week's value
    // distribution vs all earlier days — the binning-free "did this
    // week's values shift" monitor (drift_tv's slice contract with
    // ks_drift's exactness).
    "ks_value_shift" -> ((s, dir) => {
      val (ev, cur) = weekSlicedEvents(s, dir)
      Validate.ksTwoSlice(ev, "event_type", col("cents"), cur)
        .withColumnRenamed("key", "event_type")
    }),

    // Mann–Whitney common-language effect size on the same slice split:
    // the DIRECTION companion to ks_value_shift's magnitude — permille
    // probability this week's values run higher (500 = no shift).
    "ranksum_shift" -> ((s, dir) => {
      val (ev, cur) = weekSlicedEvents(s, dir)
      Validate.rankSumAuc(ev, "event_type", col("cents"), cur)
        .withColumnRenamed("key", "event_type")
    }),

    // Exact lower-median per slice and the shift in raw cents — the
    // value-unit magnitude a human acts on, completing the two-slice
    // triad (KS distance, AUC direction, median shift).
    "median_shift" -> ((s, dir) => {
      val (ev, cur) = weekSlicedEvents(s, dir)
      Validate.medianShift(ev, "event_type", col("cents"), cur)
        .withColumnRenamed("key", "event_type")
    }),

    // Exact OLS trend of daily event volume per type (milli events/day
    // per day): the gradual-drift monitor next to changepoint_day's step
    // detector and weekly_trend's WoW ratio.
    "trend_slope" -> ((s, dir) =>
      TimeSeries.trendSlopeMilli(Tables.events(s, dir), "ts", "event_type")
        .withColumnRenamed("key", "event_type")),

    // Day-of-week traffic profile per type over the zero-filled axis:
    // WHICH days carry the weekly cycle autocorr detects — exact mean
    // daily events and weekday share (epoch weekday: 0 = Thu).
    "dow_profile" -> ((s, dir) =>
      TimeSeries.dowProfile(Tables.events(s, dir), "ts", "event_type")
        .withColumnRenamed("key", "event_type")),

    // Winsorization transform: every event value clamped into its
    // type's exact p5–p95 band — the fat-tail repair that KEEPS the row
    // where trimmed_stats only reports; boundaries from the same
    // histogram-band arithmetic, broadcast back as a scan-stage clamp.
    "winsorize" -> ((s, dir) =>
      Correlate.winsorizePerKey(Tables.events(s, dir), "event_type",
        col("event_id"),
        (col("value").cast("decimal(18,2)") * 100).cast("long"))),

    // Half-sample replication stability band for the per-type mean
    // value: 32 deterministic hash replicates, exact integer replicate
    // means, p10/p90 of the sorted means — "is the shift sampling noise"
    // for every monitor above, fully oracle-recomputable.
    "halfsample_ci" -> ((s, dir) =>
      Experiment.halfSampleCi(Tables.events(s, dir), "event_type",
          col("event_id"),
          (col("value").cast("decimal(18,2)") * 100).cast("long"))
        .withColumnRenamed("key", "event_type")),

    // Exact daily-count autocorrelation at lags 1 and 7 (integer
    // milli-units, zero-filled axis): the seasonality detector — r₇
    // near 1000 is a hard weekly cycle, r₁ is day-over-day momentum.
    "autocorr_daily" -> ((s, dir) =>
      TimeSeries.autocorrMilli(Tables.events(s, dir), "ts", "event_type")
        .withColumnRenamed("key", "event_type")),

    // CUSUM single-changepoint per event type over the zero-filled day
    // axis: the day the level shifted, with the scale-free uniformity
    // deviation and the exact per-day rates either side of the split.
    "changepoint_day" -> ((s, dir) =>
      TimeSeries.changepointDay(Tables.events(s, dir), "ts", "event_type")
        .withColumnRenamed("key", "event_type")),

    // The Fano monitor served from the PERSISTED DailyCounts profile:
    // the event log folds into the store in two disjoint halves (by
    // event-id parity — the cross-batch additive merge on the same
    // (key, day) cells a micro-batch stream exercises), and the monitor
    // reads only the fold. Reuses fano_factor's oracle verbatim —
    // the gate proves profile-served ≡ scan-computed bit for bit for
    // null-free (key, ts) streams, which the events table is; on
    // null-bearing streams the profile's documented null contract
    // (keys fold under the "(null)" sentinel, null-ts rows drop —
    // DailyCounts scaladoc, spec-pinned) deliberately diverges from a
    // raw scan's NULL grouping.
    "fano_profiled" -> ((s, dir) => {
      val src = new java.io.File(s"$dir/events.parquet")
      val store = Ivf.cachedIndexDir(src, root = "/tmp/graft-dailycounts")
      // completeness guard = the recorded last-merged batch id, not bare
      // existence (review find: a crash between the two folds leaves a
      // committed half-profile a bare-exists guard would serve forever);
      // re-running both updates self-heals — already-applied batch ids
      // are replay-guarded no-ops
      val lastBatch: Long =
        if (!IndexStore.exists(s, store)) -1L
        else IndexStore.read(s, store)
          .where(col("key") === Frequencies.MetaKey)
          .select("n_rows").collect()
          .headOption.map(_.getLong(0)).getOrElse(-1L)
      if (lastBatch < 2L) {
        Ivf.gcSupersededIndexes(store)
        val ev = Tables.events(s, dir)
        DailyCounts.update(s, store,
          ev.where(pmod(col("event_id"), lit(2)) === 0),
          keyCol = "event_type", tsCol = "ts", batchId = Some(1L))
        DailyCounts.update(s, store,
          ev.where(pmod(col("event_id"), lit(2)) === 1),
          keyCol = "event_type", tsCol = "ts", batchId = Some(2L))
      }
      TimeSeries.fanoFactorFromDaily(DailyCounts.read(s, store))
        .withColumnRenamed("key", "event_type")
    }),

    // robots.txt fetchability under RFC 9309 precedence (longest
    // pattern wins, Allow on ties, wildcard + $-anchor patterns): the
    // crawl-side gate before any URL enters the frontier. The rule set
    // parses driver-side and bakes into the plan as a sorted chain of
    // codegen'd anchored-regex probes; the oracle replays the SAME
    // sorted chain, so precedence decisions mirror rule for rule.
    "robots_filter" -> ((s, dir) => {
      val rules = Web.parseRobots(Seq(
        "User-agent: *",
        "Disallow: /private/",
        "Allow: /private/stats/",
        "Disallow: /*.pdf$",
        "Disallow: /tmp"))
      val m = pmod(col("doc_id"), lit(5))
      Tables.documents(s, dir)
        .select(col("doc_id"),
          when(m === 0, concat(lit("/private/page"), col("doc_id")))
            .when(m === 1, concat(lit("/public/doc"), col("doc_id"), lit(".html")))
            .when(m === 2, concat(lit("/files/report"), col("doc_id"), lit(".pdf")))
            .when(m === 3, concat(lit("/private/stats/day"), col("doc_id")))
            .otherwise(concat(lit("/tmp/cache"), col("doc_id"))).as("path"))
        .withColumn("allowed", Web.robotsAllowed(col("path"), rules))
    }),

    // Week-over-week event-volume trend per type (integer permille;
    // floor weeks, the integer-calendar discipline) — the drop/spike
    // monitor a pipeline pages on.
    "weekly_trend" -> ((s, dir) => {
      val counts = Tables.events(s, dir)
        .select(col("event_type"), expr(TimeSeries.epochBucketSql("cast(ts as long)", 604800L)).as("w"))
        .groupBy("event_type", "w").agg(count(lit(1)).as("n"))
      counts
        .withColumn("n_prev", lag(col("n"), 1)
          .over(Window.partitionBy("event_type").orderBy("w")))
        .withColumn("wow_permille",
          expr("case when n_prev is null then null " +
            "else (n - n_prev) * 1000 div n_prev end"))
    }),

    // Exact triangle count over a deterministic 5-block clique graph —
    // the degree-ordered wedge join (Cohen), the formulation whose
    // per-node fan-out is arboricity-bounded (no hub blow-up). Each
    // complete id block of 5 contributes C(5,3) = 10 triangles.
    "triangle_count" -> ((s, dir) => {
      val ids = Tables.documents(s, dir).select(col("doc_id").as("id"),
        (col("doc_id") - pmod(col("doc_id"), lit(5))).as("blk"))
      val edges = ids.select(col("id").as("ea"), col("blk"))
        .join(ids.select(col("id").as("eb"), col("blk")), Seq("blk"))
        .where(col("ea") < col("eb"))
      Graph.triangleCount(edges, "ea", "eb")
    }),

    // Local clustering coefficient over the block-clique graph plus a
    // chain between block leaders (ids ≡ 0 mod 5): clique members read
    // 1000 permille, leaders dilute to 400/600 — the node-level
    // density/quality feature next to pagerank's centrality.
    "clustering_coeff" -> ((s, dir) => {
      val ids = Tables.documents(s, dir).select(col("doc_id").as("id"),
        (col("doc_id") - pmod(col("doc_id"), lit(5))).as("blk"))
      val cliques = ids.select(col("id").as("ea"), col("blk"))
        .join(ids.select(col("id").as("eb"), col("blk")), Seq("blk"))
        .where(col("ea") < col("eb")).select("ea", "eb")
      val leaders = Tables.documents(s, dir).select(col("doc_id").as("l"))
        .where(pmod(col("l"), lit(5)) === 0)
      val chain = leaders.select(col("l").as("ea"), (col("l") + 5).as("eb"))
        .join(leaders.select(col("l").as("eb")), Seq("eb"), "left_semi")
      Graph.clusteringCoefficient(cliques.unionByName(chain), "ea", "eb")
    }),

    // k-core of the order–part bipartite graph (node = 2·orderkey even /
    // 2·partkey+1 odd): 8 synchronous peel rounds at k=4 — thin orders
    // peel away, which thins part degrees, which can cascade; the
    // graph-level density filter. Exactly-8-rounds semantics mirrored by
    // an unrolled CTE chain.
    "kcore" -> ((s, dir) => {
      val bip = Tables.lineitem(s, dir)
        .select((col("l_orderkey") * 2).as("o"), (col("l_partkey") * 2 + 1).as("p"))
      Graph.kCore(bip, "o", "p", k = 4, rounds = 8)
    }),

    // Item co-occurrence with the standard hot-user mitigation built in:
    // per-user degree cap (deterministic mix64 rank, ≤12 items) bounds
    // the within-user pair fan-out; overlap coefficient in exact integer
    // permille over capped degrees.
    "item_cooccurrence" -> ((s, dir) => {
      val ev = Tables.events(s, dir).select(col("user_id"),
        get_json_object(col("props"), "$.k").cast("long").as("item"))
      Cooccur.itemCooccurrence(ev, "user_id", "item",
        maxItemsPerUser = 12, minCo = 2L)
    }),

    // Ordered-step funnel (view → click → purchase within 7 days of the
    // first view, each step strictly after the previous): chained per-step
    // min-aggregations, each shuffling only that step's events.
    "funnel_steps" -> ((s, dir) => {
      val f = Funnel.funnel(Tables.events(s, dir),
        steps = Seq("view", "click", "purchase"), horizonSeconds = 604800L)
      f.select(col("user_id"), col("stage"),
        ts6(col("ts_1")).as("t1"), ts6(col("ts_2")).as("t2"),
        ts6(col("ts_3")).as("t3"))
    }),

    // Weekly cohort retention over the event log: cohort = epoch-week of a
    // user's first event; distinct active users per (cohort, week offset).
    "retention_cohorts" -> ((s, dir) =>
      Funnel.retentionCohorts(Tables.events(s, dir))),

    // Set operations at (user, day) grain: days a user clicked AND viewed
    // but did not purchase.
    "set_ops" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      def userDays(t: String) =
        ev.where(col("event_type") === t)
          .select(col("user_id"), to_date(col("ts")).cast("string").as("day"))
      userDays("click").intersect(userDays("view")).except(userDays("purchase"))
    }),

    // Window-function surface: lag/lead/row_number/ntile over a totally
    // ordered per-user frame.
    "window_funcs" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      Tables.events(s, dir).select(
        col("user_id"), col("event_id"),
        lag(col("value"), 1).over(w).as("prev_value"),
        lead(col("value"), 1).over(w).as("next_value"),
        row_number().over(w).cast("long").as("rn"),
        ntile(4).over(w).cast("long").as("quartile"))
    }),

    // ROLLUP aggregate with grouping indicators, decimal-exact sums.
    "rollup_agg" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(grouping(col("l_returnflag")).cast("long").as("g_rf"),
          grouping(col("l_linestatus")).cast("long").as("g_ls"),
          count(lit(1)).as("n"),
          sum(col("l_quantity").cast("decimal(12,2)")).cast("double").as("sum_qty"))),

    // Pivot: per-user event-type value sums as columns (decimal-exact).
    "pivot_agg" -> ((s, dir) =>
      Tables.events(s, dir)
        .withColumn("value", col("value").cast("decimal(18,6)"))
        .groupBy("user_id")
        .pivot("event_type", Seq("click", "view", "purchase"))
        .agg(sum(col("value")))
        .select(col("user_id"),
          col("click").cast("double").as("click"),
          col("view").cast("double").as("view"),
          col("purchase").cast("double").as("purchase"))),

    // AS-OF join (merge formulation — one shuffle, no theta-join blow-up):
    // each click picks up the latest view at-or-before it per user.
    "asof_join" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val clicks = ev.where(col("event_type") === "click")
        .select("event_id", "user_id", "ts")
      val views = Dedup.latestPerKey(
          ev.where(col("event_type") === "view"),
          Seq("user_id", "ts"), Seq(col("event_id").desc))
        .select(col("user_id"), col("ts"), col("event_id").as("view_id"),
          col("value"))
      Joins.asofJoin(clicks, views, Seq("user_id"), "ts", Seq("view_id", "value"))
        .select(col("event_id"), col("user_id"), ts6(col("ts")).as("ts_str"),
          col("asof_view_id"), col("asof_value"))
    }),

    // Time-BAND join (bucketed formulation — (key, Δ-bucket) equi-join
    // with a 3-bucket left explode, never a per-key quadratic candidate
    // set): clicks within ±15 min of each purchase, zero-preserving.
    "band_join" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val purchases = ev.where(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts")
      val clicks = ev.where(col("event_type") === "click")
        .select(col("user_id"), col("ts"),
          col("value").cast("decimal(18,6)").as("value"))
      val nearby = Joins.bandJoin(purchases, clicks, Seq("user_id"),
          "ts", "ts", bandSeconds = 900, Seq("value"))
        .groupBy("event_id")
        .agg(count(lit(1)).as("n_nearby"), sum(col("band_value")).as("v"))
      purchases.join(nearby, Seq("event_id"), "left")
        .select(col("event_id"), col("user_id"), ts6(col("ts")).as("ts_str"),
          coalesce(col("n_nearby"), lit(0L)).as("n_nearby"),
          coalesce(col("v"), lit(0).cast("decimal(18,6)"))
            .cast("double").as("click_value"))
    }),

    // Range join into CONTAINING intervals (one shuffle via the as-of
    // merge formulation): each purchase lands in its enclosing session.
    "range_join" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val sessions = Sessionize.sessions(ev, gapSeconds = 1800)
        .select(col("user_id"), col("session_id"), col("session_start"),
          // sessions close ON their last event; rangeJoin is end-exclusive
          (col("session_end") + expr("interval 1 microsecond")).as("session_close"))
      val purchases = ev.where(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts")
      Joins.rangeJoin(purchases, sessions, Seq("user_id"), "ts",
          "session_start", "session_close", Seq("session_id"))
        .select(col("event_id"), col("user_id"), ts6(col("ts")).as("ts_str"),
          col("asof_session_id").as("session_id"))
    }),

    // Gap-based sessionization (custom-state operator family): batch
    // gaps-and-islands plan; the streaming twin (flatMapGroupsWithState)
    // is equivalence-tested in SessionizeSpec.
    "sessionize" -> ((s, dir) =>
      Sessionize.sessions(Tables.events(s, dir), gapSeconds = 1800)
        .select(col("user_id"), col("session_id"),
          ts6(col("session_start")).as("s_start"),
          ts6(col("session_end")).as("s_end"),
          col("n_events"))),

    // Top navigation paths over the same 30-min sessions: per-session
    // event-type sequence (deterministic (ts, event_id) order, first 8
    // steps) -> the 20 most common paths — the sankey/flow census, with
    // the step cap bounding both bot sessions and the path domain.
    "session_paths" -> ((s, dir) =>
      Sessionize.topPaths(Tables.events(s, dir), gapSeconds = 1800,
        k = 20, maxSteps = 8)),

    // Skew-proof twin of sessionize: shuffles on (key, 2h time chunk) so a
    // hot key parallelizes across its time range, then merges boundary
    // islands in a session-count-sized second pass. Output is provably
    // identical (scaladoc on sessionsChunked), so it shares the oracle.
    "sessionize_chunked" -> ((s, dir) =>
      Sessionize.sessionsChunked(Tables.events(s, dir),
          gapSeconds = 1800, chunkSeconds = 7200)
        .select(col("user_id"), col("session_id"),
          ts6(col("session_start")).as("s_start"),
          ts6(col("session_end")).as("s_end"),
          col("n_events"))),

    // Engagement stickiness: per epoch-day, DAU and the day's epoch-week
    // WAU with the DAU/WAU ratio in exact integer permille — the
    // engagement-intensity twin of retention_cohorts (same locale-free
    // integer calendar: day = floor(sec/86400), week = floor(sec/604800)).
    // Two distinct-count aggs + a day->week join; both map-side combined.
    "stickiness" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .select(col("user_id"),
          expr(TimeSeries.epochDaySql("cast(ts as long)")).as("d"),
          expr(TimeSeries.epochBucketSql("cast(ts as long)", 604800L)).as("w"))
      val dau = ev.groupBy("d", "w")
        .agg(countDistinct(col("user_id")).as("dau"))
      val wau = ev.groupBy("w")
        .agg(countDistinct(col("user_id")).as("wau"))
      dau.join(wau, "w")
        .select(col("d").as("epoch_day"), col("dau"), col("wau"),
          expr("dau * 1000 div wau").as("stickiness_permille"))
    }),

    // SCD2 dimension history from the event log: per user, consecutive
    // equal event_type runs collapse into validity intervals with
    // versions — the warehouse history pattern next to the MERGE upsert.
    // Incremental fold (applyBatch == full recompute) is property-tested
    // in Scd2Spec; this registers the full derivation with a windowed
    // SQL mirror.
    "scd2_history" -> ((s, dir) =>
      Scd2.fromLog(Tables.events(s, dir), "user_id", "event_type", "ts",
          orderCols = Seq("event_id"))
        .select(col("user_id"), col("event_type"),
          ts6(col("valid_from")).as("valid_from"),
          ts6(col("valid_to")).as("valid_to"),
          col("is_current"), col("version"))),

    // Skew-proof twin of scd2_history: change-point collapse within
    // (key, 2h chunk) so a hot key parallelizes across its time range,
    // boundary duplicates removed in a change-point-sized second pass.
    // Output provably identical (Scd2.fromLogChunked scaladoc), so it
    // shares the oracle.
    "scd2_chunked" -> ((s, dir) =>
      Scd2.fromLogChunked(Tables.events(s, dir), "user_id", "event_type",
          "ts", orderCols = Seq("event_id"), chunkSeconds = 7200L)
        .select(col("user_id"), col("event_type"),
          ts6(col("valid_from")).as("valid_from"),
          ts6(col("valid_to")).as("valid_to"),
          col("is_current"), col("version"))),

    // Streaming-shaped windowed aggregation (event-time tumbling window),
    // run on the batch path; value summed in exact decimal.
    "windowed_counts" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .withColumn("value", col("value").cast("decimal(18,6)"))
      IncrementalStream.windowedCounts(ev)
        .select(
          date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("w_start"),
          date_format(col("window.end"), "yyyy-MM-dd HH:mm:ss").as("w_end"),
          col("event_type"), col("n"), col("total_value").cast("double").as("total_value"))
    }))

  // ------------------------------------------------------------- oracle SQL

  private val NormalizedKey =
    "substring(lower(rtrim(translate(strip_accents(%s), '.$', ''))), 1, 100)"
  private val Stop =
    TextAnalysis.Stopwords.map(w => s"'$w'").mkString("(", ",", ")")
  /** DuckDB rendering of `z * c mod 2^64` for `z` held in UBIGINT: HUGEINT
    * is signed-128 so `z·c` can overflow it — split `z` at 2^32 and
    * recombine (`lo·c + ((hi·c) mod 2^32)·2^32`, all < 2^97). Mirrors the
    * wrapping Long multiply in [[graft.functions.PortableHash.mix64]]. */
  private def sqlMulMod64(z: String, c: String): String =
    s"CAST(((CAST($z AS HUGEINT) % 4294967296) * $c" +
      s" + ((CAST($z AS HUGEINT) // 4294967296) * $c % 4294967296) * 4294967296)" +
      s" % 18446744073709551616 AS UBIGINT)"

  /** VALUES rows `(table, plane, hyperplane_vector)` for the SRP-LSH
    * oracle — the exact doubles the Spark expression uses
    * ([[graft.functions.SrpBucket.hyperplanes]]), shortest-roundtrip
    * formatted so SQL parses back the identical bits. */
  private def srpPlanesValues(planes: Int, dim: Int, seed: Long, tables: Int): String =
    (0 until tables).flatMap { t =>
      val h = graft.functions.SrpBucket.hyperplanes(planes, dim, seed + t)
      (0 until planes).map { p =>
        val vec = h.slice(p * dim, (p + 1) * dim).mkString("[", ",", "]")
        s"($t, $p, CAST($vec AS DOUBLE[]))"
      }
    }.mkString(",\n")

  /** Full-algorithm mirror of [[graft.operators.Hnsw]] as a CTE chain
    * ending in the final layer-0 beam `s${3 + rounds}` (query_id, node):
    * SRP buckets from the interpolated hyperplane literals,
    * mix64-trailing-zero levels (the halfSampleCi hash chain),
    * bucket-candidate top-`m` edges per layer, deterministic entry
    * point, three greedy upper-layer steps (layers 3→1, beam 1), then
    * `rounds` beam-`beam` layer-0 rounds (both registered oracles call
    * it with beam = 16, rounds = 3 and read from `s6`). Every step is a
    * finite join, so the approximate search replays EXACTLY — no recall
    * assumption. */
  private def hnswSearchCtes(m: Int, beam: Int, rounds: Int): String = {
    // one search step: expand the frontier's layer-`layer` edges, union
    // the frontier, dedup, re-score against the query vector, keep `b`
    def step(prev: String, out: String, layer: Int, b: Int): String =
      s"""$out AS MATERIALIZED (SELECT query_id, node FROM (
         |  SELECT d.query_id, d.node,
         |    row_number() OVER (PARTITION BY d.query_id
         |      ORDER BY list_cosine_similarity(q.qv, ev.v) DESC, d.node) AS rn
         |  FROM (SELECT DISTINCT query_id, node FROM (
         |          SELECT query_id, node FROM $prev
         |          UNION ALL
         |          SELECT f.query_id, g.dst AS node
         |          FROM $prev f JOIN edg g ON g.layer = $layer AND g.src = f.node
         |        ) u) d
         |  JOIN qs q ON q.query_id = d.query_id
         |  JOIN e ev ON ev.vec_id = d.node) r
         |WHERE rn <= $b)""".stripMargin
    s"""hp AS (SELECT * FROM (VALUES
       |${srpPlanesValues(planes = 4, dim = 64, seed = 42L, tables = 4)}
       |) AS t(t, p, pv)),
       |bits AS (SELECT e.vec_id, hp.t, hp.p,
       |    CASE WHEN list_reduce(
       |           list_transform(generate_series(1, 64), i -> v[i] * pv[i]),
       |           (a, b) -> a + b) >= 0
       |         THEN 1 << hp.p ELSE 0 END AS bit
       |  FROM e CROSS JOIN hp),
       |buck AS MATERIALIZED (SELECT vec_id, t, sum(bit) AS bucket FROM bits GROUP BY vec_id, t),
       |lz0 AS (SELECT vec_id,
       |  list_reduce([CAST(ascii(s[i:i]) AS HUGEINT) for i in range(1, len(s) + 1)],
       |    (acc, c) -> (acc * 31 + c) % 18446744073709551616) AS z
       |  FROM (SELECT vec_id, CAST(vec_id AS VARCHAR) || ':hnsw' AS s FROM e) t0),
       |lz1 AS (SELECT vec_id, xor(CAST(z AS UBIGINT), CAST(z AS UBIGINT) >> 30) AS z FROM lz0),
       |lz2 AS (SELECT vec_id, ${sqlMulMod64("z", "13787848793156543929")} AS z FROM lz1),
       |lz3 AS (SELECT vec_id, xor(z, z >> 27) AS z FROM lz2),
       |lz4 AS (SELECT vec_id, ${sqlMulMod64("z", "10723151780598845931")} AS z FROM lz3),
       |lvl AS (SELECT vec_id,
       |    CASE WHEN (h & 1) <> 0 THEN 0 WHEN (h & 2) <> 0 THEN 1
       |         WHEN (h & 4) <> 0 THEN 2 ELSE 3 END AS level
       |  FROM (SELECT vec_id, xor(z, z >> 31) AS h FROM lz4) t1),
       |cand AS (SELECT DISTINCT a.vec_id AS src, b.vec_id AS dst
       |         FROM buck a JOIN buck b
       |           ON a.t = b.t AND a.bucket = b.bucket AND a.vec_id <> b.vec_id),
       |sc AS (SELECT src, dst, list_cosine_similarity(ea.v, eb.v) AS cos,
       |         least(la.level, lb.level) AS plv
       |       FROM cand JOIN e ea ON ea.vec_id = src JOIN e eb ON eb.vec_id = dst
       |                 JOIN lvl la ON la.vec_id = src JOIN lvl lb ON lb.vec_id = dst),
       |edg AS MATERIALIZED (SELECT layer, src, dst, cos FROM (
       |          SELECT src, dst, cos, unnest(generate_series(0, plv)) AS layer
       |          FROM sc) x
       |        QUALIFY row_number() OVER (PARTITION BY layer, src
       |          ORDER BY cos DESC, dst) <= $m),
       |ent AS (SELECT vec_id AS node FROM lvl ORDER BY level DESC, vec_id LIMIT 1),
       |qs AS MATERIALIZED (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 20),
       |s0 AS MATERIALIZED (SELECT query_id, node FROM qs CROSS JOIN ent),
       |${step("s0", "s1", 3, 1)},
       |${step("s1", "s2", 2, 1)},
       |${step("s2", "s3", 1, 1)},
       |${(1 to rounds).map(r => step(s"s${2 + r}", s"s${3 + r}", 0, beam))
          .mkString(",\n")}""".stripMargin
  }

  /** Shared CTE chain of the duplicated-passage oracles (from a `toks`
    * (doc_id, tok, i) CTE to the merged-span groups `g2`): per-doc char
    * prefix sums, 8-token window frames, the ≥2-occurrence census, and
    * the overlapping/adjacent span merge — mirroring
    * [[graft.operators.Dedup.duplicatedPassageSpans]] step for step. */
  private def dupPassageWindowCtes: String =
    s"""w0 AS (SELECT doc_id, i,
      |        CAST(coalesce(sum(length(tok) + 1) OVER (PARTITION BY doc_id ORDER BY i
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_char,
      |        string_agg(tok, ' ') OVER (PARTITION BY doc_id ORDER BY i
      |          ROWS BETWEEN CURRENT ROW AND 7 FOLLOWING) AS win,
      |        count(tok) OVER (PARTITION BY doc_id ORDER BY i
      |          ROWS BETWEEN CURRENT ROW AND 7 FOLLOWING) AS wn
      |      FROM toks),
      |v AS (SELECT doc_id, start_char, start_char + length(win) AS end_char, win
      |      FROM w0 WHERE wn = 8 AND trim(win) <> ''),
      |vz AS (SELECT doc_id, start_char, end_char,
      |        list_reduce([CAST(ascii(win[i:i]) AS HUGEINT) for i in range(1, len(win) + 1)],
      |                    (acc, c) -> (acc * 31 + c) % 18446744073709551616) AS z
      |      FROM v),
      |vz1 AS (SELECT doc_id, start_char, end_char, xor(CAST(z AS UBIGINT), CAST(z AS UBIGINT) >> 30) AS z FROM vz),
      |vz2 AS (SELECT doc_id, start_char, end_char, ${sqlMulMod64("z", "13787848793156543929")} AS z FROM vz1),
      |vz3 AS (SELECT doc_id, start_char, end_char, xor(z, z >> 27) AS z FROM vz2),
      |vz4 AS (SELECT doc_id, start_char, end_char, ${sqlMulMod64("z", "10723151780598845931")} AS z FROM vz3),
      |vh AS (SELECT doc_id, start_char, end_char, xor(z, z >> 31) AS winh FROM vz4),
      |dup AS (SELECT winh FROM vh GROUP BY winh HAVING count(*) >= 2),
      |h AS (SELECT doc_id, start_char, end_char FROM vh JOIN dup USING (winh)),
      |g AS (SELECT doc_id, start_char, end_char,
      |        CASE WHEN start_char > coalesce(max(end_char) OVER (PARTITION BY doc_id
      |          ORDER BY start_char, end_char ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
      |          THEN 1 ELSE 0 END AS ng
      |      FROM h),
      |g2 AS (SELECT doc_id, start_char, end_char,
      |        sum(ng) OVER (PARTITION BY doc_id ORDER BY start_char, end_char
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
      |      FROM g)""".stripMargin

  /** CTE chain computing the engine-portable signed-64-bit `mix64` hash of
    * `strCol` for every row of `from` (same fold the Spark side's
    * [[graft.functions.Mix64Str]] codegen runs): poly-31 codepoint fold in
    * mod-2^64 arithmetic, splitmix64 finalizer, then a two's-complement
    * reinterpret so the BIGINT value (and its sort order) matches Spark's
    * signed Long exactly. Emits `<name>0..<name>4` and a final
    * MATERIALIZED `<name>` holding `carry` + `sh64` — materialized because
    * the hash table is always joined against itself or probed twice, and
    * DuckDB would otherwise inline (= recompute) the whole chain per
    * reference. */
  /** Shared CTE chain of the decon-span oracles: corpus windows with
    * char offsets + portable hash, benchmark distinct window hashes,
    * hit join, span-merge grouping (final CTE `g2`). w=4 throughout. */
  private def deconSpanCtes: String =
    s"""cbase AS (SELECT doc_id, string_split(text, ' ') AS ts
         |  FROM documents WHERE doc_id % 50 <> 0),
         |ctoks AS (SELECT doc_id, unnest(ts) AS tok,
         |  unnest(generate_series(1, len(ts))) AS i FROM cbase),
         |cw0 AS (SELECT doc_id, i,
         |  CAST(coalesce(sum(length(tok) + 1) OVER (PARTITION BY doc_id ORDER BY i
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_char,
         |  string_agg(tok, ' ') OVER (PARTITION BY doc_id ORDER BY i
         |    ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS win,
         |  count(tok) OVER (PARTITION BY doc_id ORDER BY i
         |    ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wn
         |  FROM ctoks),
         |cv AS (SELECT doc_id, start_char, start_char + length(win) AS end_char, win
         |  FROM cw0 WHERE wn = 4 AND trim(win) <> ''),
         |cz0 AS (SELECT doc_id, start_char, end_char,
         |  list_reduce([CAST(ascii(win[i:i]) AS HUGEINT) for i in range(1, len(win) + 1)],
         |    (acc, c) -> (acc * 31 + c) % 18446744073709551616) AS z FROM cv),
         |cz1 AS (SELECT doc_id, start_char, end_char,
         |  xor(CAST(z AS UBIGINT), CAST(z AS UBIGINT) >> 30) AS z FROM cz0),
         |cz2 AS (SELECT doc_id, start_char, end_char, ${sqlMulMod64("z", "13787848793156543929")} AS z FROM cz1),
         |cz3 AS (SELECT doc_id, start_char, end_char, xor(z, z >> 27) AS z FROM cz2),
         |cz4 AS (SELECT doc_id, start_char, end_char, ${sqlMulMod64("z", "10723151780598845931")} AS z FROM cz3),
         |ch AS (SELECT doc_id, start_char, end_char, xor(z, z >> 31) AS winh FROM cz4),
         |bbase AS (SELECT doc_id, string_split(text, ' ') AS ts
         |  FROM documents WHERE doc_id % 50 = 0),
         |btoks AS (SELECT doc_id, unnest(ts) AS tok,
         |  unnest(generate_series(1, len(ts))) AS i FROM bbase),
         |bw0 AS (SELECT doc_id, i,
         |  string_agg(tok, ' ') OVER (PARTITION BY doc_id ORDER BY i
         |    ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS win,
         |  count(tok) OVER (PARTITION BY doc_id ORDER BY i
         |    ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wn
         |  FROM btoks),
         |bv AS (SELECT win FROM bw0 WHERE wn = 4 AND trim(win) <> ''),
         |bz0 AS (SELECT win,
         |  list_reduce([CAST(ascii(win[i:i]) AS HUGEINT) for i in range(1, len(win) + 1)],
         |    (acc, c) -> (acc * 31 + c) % 18446744073709551616) AS z FROM bv),
         |bz1 AS (SELECT win, xor(CAST(z AS UBIGINT), CAST(z AS UBIGINT) >> 30) AS z FROM bz0),
         |bz2 AS (SELECT win, ${sqlMulMod64("z", "13787848793156543929")} AS z FROM bz1),
         |bz3 AS (SELECT win, xor(z, z >> 27) AS z FROM bz2),
         |bz4 AS (SELECT win, ${sqlMulMod64("z", "10723151780598845931")} AS z FROM bz3),
         |bw AS (SELECT DISTINCT xor(z, z >> 31) AS winh FROM bz4),
         |h AS (SELECT doc_id, start_char, end_char FROM ch JOIN bw USING (winh)),
         |g AS (SELECT doc_id, start_char, end_char,
         |  CASE WHEN start_char > coalesce(max(end_char) OVER (PARTITION BY doc_id
         |    ORDER BY start_char, end_char ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
         |    THEN 1 ELSE 0 END AS ng
         |  FROM h),
         |g2 AS (SELECT doc_id, start_char, end_char,
         |  sum(ng) OVER (PARTITION BY doc_id ORDER BY start_char, end_char
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
         |  FROM g)""".stripMargin

  /** Full-algorithm DSIR mirror (shared by `dsir_scores` and the ranked
    * `dsir_select`): gram explode (unigrams + adjacent bigrams), the
    * portable mix64 chain for the bucket hash, add-1 bucket models over
    * raw/target, bits via the length(bin(..))-1 integer log2, per-doc
    * bit-difference sums. No division anywhere, so negative scores carry
    * no rounding-convention risk. */
  private lazy val dsirScoresSql: String =
    s"""WITH ws AS (SELECT doc_id, lang,
       |    list_filter(string_split(text, ' '), w -> w <> '') AS ws
       |  FROM documents),
       |uni AS (SELECT doc_id, lang, unnest(ws) AS g FROM ws),
       |bi AS (SELECT doc_id, lang,
       |    unnest([ws[i] || ' ' || ws[i + 1] for i in range(1, len(ws))]) AS g
       |  FROM ws),
       |grams AS (SELECT doc_id, lang, g FROM uni
       |          UNION ALL SELECT doc_id, lang, g FROM bi),
       |${sqlMix64Ctes("h", "grams", "g", "doc_id, lang")},
       |feat AS (SELECT doc_id, lang, ((sh64 % 512) + 512) % 512 AS b FROM h),
       |raw AS (SELECT b, COUNT(*) AS c_r FROM feat GROUP BY b),
       |tgt AS (SELECT b, COUNT(*) AS c_t FROM feat WHERE lang = 'en' GROUP BY b),
       |nr AS (SELECT COUNT(*) AS n_r FROM feat),
       |nt AS (SELECT COUNT(*) AS n_t FROM feat WHERE lang = 'en'),
       |model AS (SELECT raw.b,
       |    length(bin((n_r + 512) // (c_r + 1))) - 1 AS bits_r,
       |    length(bin((n_t + 512) // (COALESCE(c_t, 0) + 1))) - 1 AS bits_t
       |  FROM raw LEFT JOIN tgt ON raw.b = tgt.b
       |  CROSS JOIN nr CROSS JOIN nt)
       |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_feats,
       |  CAST(SUM(bits_r - bits_t) AS BIGINT) AS dsir_bits
       |FROM feat JOIN model USING (b)
       |GROUP BY doc_id""".stripMargin

  private def sqlMix64Ctes(name: String, from: String, strCol: String,
      carry: String): String =
    s"""${name}0 AS (SELECT $carry, CAST(list_reduce(
       |          [CAST(ascii(($strCol)[i:i]) AS HUGEINT) for i in range(1, len($strCol) + 1)],
       |          (acc, c) -> (acc * 31 + c) % 18446744073709551616) AS UBIGINT) AS z FROM $from),
       |${name}1 AS (SELECT $carry, xor(z, z >> 30) AS z FROM ${name}0),
       |${name}2 AS (SELECT $carry, ${sqlMulMod64("z", "13787848793156543929")} AS z FROM ${name}1),
       |${name}3 AS (SELECT $carry, xor(z, z >> 27) AS z FROM ${name}2),
       |${name}3b AS (SELECT $carry, ${sqlMulMod64("z", "10723151780598845931")} AS z FROM ${name}3),
       |${name}4 AS (SELECT $carry, CAST(xor(z, z >> 31) AS HUGEINT) AS z FROM ${name}3b),
       |$name AS MATERIALIZED (SELECT $carry,
       |  CAST(CASE WHEN z > 9223372036854775807 THEN z - 18446744073709551616
       |       ELSE z END AS BIGINT) AS sh64 FROM ${name}4)""".stripMargin

  /** Shared CTE prefix of the blocked-Jaccard oracles: shingle explode,
    * the [[sqlMix64Ctes]] portable-hash chain, then pair intersection
    * counts joined on the HASH — mirroring `ngramJaccardPairs`' hashed
    * equi-join key bit for bit. `block` is the blocking column. */
  private def jaccardPairCtes(block: String, nonEmpty: Boolean = false): String =
    s"""w AS (SELECT doc_id, $block, string_split(text, ' ') AS ws FROM documents),
       |sh AS (SELECT doc_id, $block,
       |         list_distinct([array_to_string(ws[i:i+2], ' ') for i in range(1, len(ws) - 1)]) AS sh
       |       FROM w),
       |ex AS (SELECT doc_id, $block, len(sh) AS n, unnest(sh) AS shingle FROM sh${if (nonEmpty) " WHERE len(sh) > 0" else ""}),
       |${sqlMix64Ctes("e", "ex", "shingle", s"doc_id, $block, n")},
       |p AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id,
       |        any_value(a.n) AS a_n, any_value(b.n) AS b_n, count(*) AS inter
       |      FROM e a JOIN e b ON a.sh64 = b.sh64 AND a.$block = b.$block
       |                       AND a.doc_id < b.doc_id
       |      GROUP BY 1, 2)""".stripMargin

  /** CTE chain replaying [[graft.operators.Bpe.train]] round for round in
    * SQL: `wf` (word frequencies) → `r0` (char segmentation) → per round r
    * the pair census (`p$r`, every adjacent occurrence weighted by word
    * freq), the argmax with the operator's exact tie-break (`b$r`: count
    * DESC, left ASC, right ASC), and the greedy left-to-right application
    * as gaps-and-islands over symbol positions (`x/o/s/t/f$r` → `r${r+1}`):
    * occurrence runs (only possible when left = right) select every other
    * member, the position after a selected one is consumed. A round with
    * no pairs leaves the segmentation unchanged (LEFT JOIN against the
    * empty argmax), mirroring the operator's exhaustion stop. */
  private def bpeTrainCtes(k: Int, from: String = "documents"): String = {
    val head =
      s"""wf AS MATERIALIZED (SELECT w, count(*) AS freq
        |       FROM (SELECT unnest(string_split(text, ' ')) AS w FROM $from)
        |       WHERE w <> '' GROUP BY w),
        |r0 AS MATERIALIZED (SELECT w, freq, [w[i:i] for i in range(1, len(w) + 1)] AS syms FROM wf)""".stripMargin
    val rounds = (0 until k).map { r =>
      s"""x$r AS MATERIALIZED (SELECT w, freq, len(syms) AS n, unnest(syms) AS s,
         |        unnest(range(1, len(syms) + 1)) AS i FROM r$r),
         |p$r AS MATERIALIZED (SELECT l, r, sum(freq) AS cnt FROM (
         |          SELECT w, freq, i, n, s AS l,
         |                 lead(s) OVER (PARTITION BY w ORDER BY i) AS r
         |          FROM x$r) WHERE i < n AND r IS NOT NULL GROUP BY 1, 2),
         |b$r AS MATERIALIZED (SELECT l, r FROM p$r ORDER BY cnt DESC, l ASC, r ASC LIMIT 1),
         |o$r AS MATERIALIZED (SELECT x.w, x.freq, x.i, x.n, x.s, b.l AS bl, b.r AS br,
         |          CASE WHEN x.i < x.n AND x.s = b.l
         |                AND lead(x.s) OVER (PARTITION BY x.w ORDER BY x.i) = b.r
         |               THEN 1 ELSE 0 END AS occ
         |        FROM x$r x LEFT JOIN b$r b ON true),
         |s$r AS MATERIALIZED (SELECT *, CASE WHEN occ = 1
         |          THEN i - row_number() OVER (PARTITION BY w, occ ORDER BY i)
         |          ELSE NULL END AS isl FROM o$r),
         |t$r AS MATERIALIZED (SELECT *, CASE WHEN occ = 1
         |          AND row_number() OVER (PARTITION BY w, isl ORDER BY i) % 2 = 1
         |          THEN 1 ELSE 0 END AS sel FROM s$r),
         |f$r AS MATERIALIZED (SELECT w, freq, i,
         |          CASE WHEN sel = 1 THEN bl || br ELSE s END AS tok,
         |          coalesce(lag(sel) OVER (PARTITION BY w ORDER BY i), 0) AS consumed
         |        FROM t$r),
         |r${r + 1} AS MATERIALIZED (SELECT w, any_value(freq) AS freq,
         |          list(tok ORDER BY i) AS syms
         |        FROM f$r WHERE consumed = 0 GROUP BY w)""".stripMargin
    }.mkString(",\n")
    s"$head,\n$rounds"
  }

  /** Apply the [[bpeTrainCtes]] merge sequence (`b0..b{k-1}`) to a
    * DIFFERENT word set — the inference-time greedy replay on held-out
    * words, the SQL twin of `Bpe.udfFreeEncode`. `src` selects a `w`
    * column of distinct words; the final CTE `tw$k` holds (w, syms).
    * Each round reuses the train chain's application pattern (occurrence
    * flag → island grouping → odd-position greedy selection → pairwise
    * fold), so overlap semantics match the engine's left-to-right
    * non-overlapping fold exactly. An early-stopped empty `b$r` leaves
    * the round a no-op via the LEFT JOIN, like the train chain. */
  private def bpeApplyCtes(k: Int, src: String): String = {
    val head =
      s"""tw0 AS MATERIALIZED (SELECT w,
         |  [w[i:i] for i in range(1, len(w) + 1)] AS syms FROM ($src))""".stripMargin
    val rounds = (0 until k).map { r =>
      s"""twx$r AS MATERIALIZED (SELECT w, len(syms) AS n, unnest(syms) AS s,
         |        unnest(range(1, len(syms) + 1)) AS i FROM tw$r),
         |two$r AS MATERIALIZED (SELECT x.w, x.i, x.n, x.s, b.l AS bl, b.r AS br,
         |          CASE WHEN x.i < x.n AND x.s = b.l
         |                AND lead(x.s) OVER (PARTITION BY x.w ORDER BY x.i) = b.r
         |               THEN 1 ELSE 0 END AS occ
         |        FROM twx$r x LEFT JOIN b$r b ON true),
         |tws$r AS MATERIALIZED (SELECT *, CASE WHEN occ = 1
         |          THEN i - row_number() OVER (PARTITION BY w, occ ORDER BY i)
         |          ELSE NULL END AS isl FROM two$r),
         |twt$r AS MATERIALIZED (SELECT *, CASE WHEN occ = 1
         |          AND row_number() OVER (PARTITION BY w, isl ORDER BY i) % 2 = 1
         |          THEN 1 ELSE 0 END AS sel FROM tws$r),
         |twf$r AS MATERIALIZED (SELECT w, i,
         |          CASE WHEN sel = 1 THEN bl || br ELSE s END AS tok,
         |          coalesce(lag(sel) OVER (PARTITION BY w ORDER BY i), 0) AS consumed
         |        FROM twt$r),
         |tw${r + 1} AS MATERIALIZED (SELECT w, list(tok ORDER BY i) AS syms
         |        FROM twf$r WHERE consumed = 0 GROUP BY w)""".stripMargin
    }.mkString(",\n")
    s"$head,\n$rounds"
  }

  /** The learned merge table from [[bpeTrainCtes]]'s per-round argmaxes —
    * rounds the vocabulary exhausted contribute no row, like the
    * operator's early stop. */
  private def bpeMergesSelect(k: Int): String =
    (0 until k).map { r =>
      if (r == 0) s"SELECT $r AS rank, l AS left_sym, r AS right_sym FROM b$r"
      else s"SELECT $r, l, r FROM b$r"
    }.mkString("\nUNION ALL ")

  /** Unicode-bearing suffix the mojibake query appends to the (ASCII)
    * corpus text before the corrupt→repair roundtrip. */
  private val MojibakeSuffix = " – “smart quotes” café… naïve touché"

  /** SQL string literal with C0/C1 control characters routed through
    * chr() — the mojibake artifacts contain U+009D, which must not land
    * raw inside oracle_sql.json. */
  private def sqlStr(s: String): String = {
    val b = s.flatMap {
      case '\'' => "''"
      case c if c.toInt < 0x20 || (c.toInt >= 0x7f && c.toInt <= 0x9f) =>
        s"' || chr(${c.toInt}) || '"
      case c => c.toString
    }
    s"'$b'"
  }

  /** The [[graft.operators.TextAnalysis.MojibakeTable]] replace chains as
    * SQL — generated from the SAME table the Spark expressions fold over,
    * so both engines apply identical pairs in identical order. */
  private def mojibakeFixSql(inner: String): String =
    TextAnalysis.MojibakeTable.foldLeft(inner) { case (acc, (bad, good)) =>
      s"replace($acc, ${sqlStr(bad)}, ${sqlStr(good)})"
    }
  private def mojibakeCorruptSql(inner: String): String =
    TextAnalysis.CorruptOrder.foldLeft(inner) { case (acc, (bad, good)) =>
      s"replace($acc, ${sqlStr(good)}, ${sqlStr(bad)})"
    }

  /** Cumulative md5 thresholds of the 80/10/10 split — computed with the
    * SAME double arithmetic `Sampling.splitAssign` uses internally, so the
    * oracle CASE compares against bit-identical hex strings (0.8 + 0.1 is
    * not exactly 0.9 in doubles). */
  /** Unrolled power-iteration mirror of
    * [[graft.operators.Sessionize.transitionStationary]]: the transition
    * census under the same (ts, event_id) order and gap criterion, then
    * `iters` CTEs each computing
    * `v'(j) = Σ (v(i)·c_ij) // r_i + (Σ_dangling v(d)) // n` in
    * HUGEINT — term-for-term the operator's BigInt arithmetic (all
    * quantities non-negative, so floor ≡ truncation). */
  private def markovStationaryOracle(iters: Int, gap: Long): String = {
    // MATERIALIZED throughout: inlined CTEs would re-expand the whole
    // v-chain at every reference (exponential in iters — the
    // bpeTrainCtes lesson)
    val rounds = (0 until iters).map { k =>
      s"""v${k + 1} AS MATERIALIZED (SELECT s.a,
         |  COALESCE(tr.tv, 0) + dk.ds // n.n AS v
         |  FROM states s
         |  LEFT JOIN (SELECT t.b AS bb, SUM((v$k.v * t.c) // r.rs) AS tv
         |             FROM v$k JOIN t ON v$k.a = t.a JOIN r ON t.a = r.a
         |             GROUP BY 1) tr ON s.a = tr.bb
         |  CROSS JOIN (SELECT COALESCE(SUM(v$k.v), 0) AS ds
         |              FROM v$k JOIN dang ON v$k.a = dang.a) dk
         |  CROSS JOIN n)""".stripMargin
    }.mkString(",\n")
    s"""WITH x AS MATERIALIZED (SELECT event_type AS a, lead(event_type) OVER w AS b,
       |    epoch(lead(ts) OVER w) - epoch(ts) AS g
       |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
       |t AS MATERIALIZED (SELECT a, b, count(*) AS c FROM x
       |       WHERE b IS NOT NULL AND g <= $gap GROUP BY 1, 2),
       |states AS MATERIALIZED (SELECT a FROM t UNION SELECT b FROM t),
       |r AS MATERIALIZED (SELECT a, SUM(c) AS rs FROM t GROUP BY 1),
       |n AS MATERIALIZED (SELECT count(*) AS n FROM states),
       |dang AS MATERIALIZED (SELECT s.a FROM states s
       |       WHERE s.a NOT IN (SELECT a FROM t)),
       |v0 AS MATERIALIZED (SELECT a, CAST(1000000000000 AS HUGEINT) // n AS v
       |       FROM states CROSS JOIN n),
       |$rounds
       |SELECT a AS event_type,
       |  CAST(v // 1000000 AS BIGINT) AS stationary_ppm
       |FROM v$iters""".stripMargin
  }

  /** Shared slice construction of the two-slice value monitors
    * (`ks_value_shift`, `ranksum_shift`): event values in cents and the
    * "current = final observed week" tag. The week anchor (max day) is
    * computed over VALUE-BEARING rows only — the oracles' value-filtered
    * frame — so a trailing day holding only null-valued rows cannot
    * shift the engine's window off the oracle's (review find). */
  private def weekSlicedEvents(s: SparkSession, dir: String)
      : (DataFrame, Column) = {
    val ev = Tables.events(s, dir)
      .select(col("event_type"),
        (col("value").cast("decimal(18,2)") * 100).cast("long").as("cents"),
        expr(TimeSeries.epochDaySql("cast(ts as long)")).as("__day"))
      .where(col("cents").isNotNull)
    val maxd = ev.agg(max("__day").as("__maxd"))
    (ev.crossJoin(broadcast(maxd)), col("__day") >= col("__maxd") - 6)
  }

  /** Mirror of [[graft.operators.Experiment.halfSampleCi]]: the portable
    * mix64 chain over `id:salt` recomputed in UBIGINT (same fold as the
    * SimHash/DSIR oracles), replicate-i membership as bit i of that one
    * hash, every sum/count recomputed, the means list filtered/sorted
    * identically (HUGEINT products mirroring the engine's DECIMAL(38,0)
    * widening), the same 1-based p10/p90 index arithmetic. */
  private def halfSampleCiOracle(b: Int, salt: String): String = {
    val reps = (0 until b).map { i =>
      val m = s"((h >> $i) & 1) = 1"
      s"SUM(CASE WHEN $m THEN x END) AS s$i, " +
        s"SUM(CASE WHEN $m THEN 1 END) AS n$i"
    }.mkString(",\n")
    val meanList = (0 until b)
      .map(i => s"CASE WHEN n$i > 0 THEN CAST(s$i AS HUGEINT) * 1000 // n$i END")
      .mkString("list_value(", ", ", ")")
    s"""WITH v AS (SELECT event_type AS k,
       |    CAST(event_id AS VARCHAR) || ':$salt' AS s,
       |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS x
       |  FROM events WHERE value IS NOT NULL),
       |z0 AS (SELECT k, x,
       |  list_reduce([CAST(ascii(s[i:i]) AS HUGEINT) for i in range(1, len(s) + 1)],
       |    (acc, c) -> (acc * 31 + c) % 18446744073709551616) AS z FROM v),
       |z1 AS (SELECT k, x, xor(CAST(z AS UBIGINT), CAST(z AS UBIGINT) >> 30) AS z FROM z0),
       |z2 AS (SELECT k, x, ${sqlMulMod64("z", "13787848793156543929")} AS z FROM z1),
       |z3 AS (SELECT k, x, xor(z, z >> 27) AS z FROM z2),
       |z4 AS (SELECT k, x, ${sqlMulMod64("z", "10723151780598845931")} AS z FROM z3),
       |hv AS (SELECT k, x, xor(z, z >> 31) AS h FROM z4),
       |a AS (SELECT k, COUNT(*) AS n, SUM(x) AS s,
       |$reps
       |  FROM hv GROUP BY 1),
       |m AS (SELECT k, n, s,
       |    list_sort(list_filter($meanList, y -> y IS NOT NULL)) AS ms
       |  FROM a)
       |SELECT k AS event_type, CAST(n AS BIGINT) AS n_rows,
       |  CAST(len(ms) AS BIGINT) AS n_replicates,
       |  CAST(CAST(s AS HUGEINT) * 1000 // n AS BIGINT) AS mean_milli,
       |  CAST(ms[CAST(len(ms) * 100 // 1000 + 1 AS INT)] AS BIGINT)
       |    AS rep_lo_milli,
       |  CAST(ms[CAST(len(ms) - len(ms) * 100 // 1000 AS INT)] AS BIGINT)
       |    AS rep_hi_milli
       |FROM m""".stripMargin
  }

  private val splitThresholds: Seq[String] = {
    val ws = Seq(0.8, 0.1, 0.1)
    val total = ws.sum
    ws.init.map(_.toDouble).scanLeft(0.0)(_ + _).tail
      .map(c => Sampling.hexThreshold(c / total))
  }

  private def langScore(markers: Seq[String]): String =
    s"len(list_filter(ws, w -> w IN ${markers.map(m => s"'$m'").mkString("(", ",", ")")}))"

  // bm25_indexed serves the same queries from the persisted inverted
  // index; identical oracle = the gate proves index-served results equal
  // scan-computed ones bit for bit.
  // fano_profiled serves the same dispersion read-out from the persisted
  // DailyCounts fold; identical oracle = the gate proves profile-served
  // results equal scan-computed ones bit for bit.
  def oracleSql: Map[String, String] =
    oracleSqlBase +
      ("bm25_indexed" -> oracleSqlBase("bm25_topk")) +
      ("fano_profiled" -> oracleSqlBase("fano_factor")) +
      ("ann_hnsw_indexed" -> oracleSqlBase("ann_hnsw"))

  private lazy val oracleSqlBase: Map[String, String] = Map(
    "pushdown_scan" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        | WHERE l_returnflag = 'R' AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |   AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'""".stripMargin,

    "distinct_scan" -> "SELECT DISTINCT source FROM documents",

    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |           (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE)
        |    AS sum_disc_price,
        |  COUNT(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,

    "star_join" ->
      """SELECT l_orderkey, CAST(rev AS DOUBLE) AS revenue FROM (
        |  SELECT l_orderkey,
        |    SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |        (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS rev
        |  FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  WHERE c_mktsegment = 'BUILDING'
        |    AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |    AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  GROUP BY l_orderkey
        |  ORDER BY rev DESC, l_orderkey LIMIT 10)""".stripMargin,

    "incremental_filter" ->
      """SELECT event_id, event_type,
        |  strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S.%f') AS ts_str
        |FROM events
        |WHERE CASE WHEN event_type = 'click' THEN ts > TIMESTAMP '2024-01-20 00:00:00'
        |           WHEN event_type = 'view' THEN ts > TIMESTAMP '2024-01-10 00:00:00'
        |           ELSE ts >= TIMESTAMP '2024-01-15 00:00:00' END""".stripMargin,

    "non_empty_embeddings" ->
      """SELECT vec_id, label, CAST(len(embedding) AS INTEGER) AS dim
        |FROM embeddings WHERE embedding IS NOT NULL AND len(embedding) > 0""".stripMargin,

    "latest_per_key" ->
      """SELECT user_id, event_id, event_type,
        |  strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S.%f') AS ts_str
        |FROM events
        |QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1""".stripMargin,

    "topk_per_key" ->
      """SELECT user_id, event_id, value FROM events
        |QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) <= 3""".stripMargin,

    "max_watermark" ->
      """SELECT event_type,
        |  strftime(CAST(MAX(ts) AS TIMESTAMP), '%Y-%m-%d %H:%M:%S.%f') AS wm_str
        |FROM events GROUP BY event_type""".stripMargin,

    "main_refco" ->
      s"""SELECT doc_id, ${NormalizedKey.format("text || '_' || lang")} AS main_refco
         |FROM documents""".stripMargin,

    "derive_record" ->
      s"""WITH src AS (
         |  SELECT doc_id, source, lang, n_chars,
         |    make_timestamp(1704067200000000 + doc_id * 1000000 + (doc_id % 2) * 123456) AS ts
         |  FROM documents)
         |SELECT source AS cleaned_ref,
         |  CASE WHEN doc_id % 7 <> 0 THEN lang ELSE '' END AS category,
         |  ${NormalizedKey.format(
             "source || CASE WHEN lang <> 'en' THEN '_' || lang ELSE '' END")} AS main_refco,
         |  source || ' (' || CASE WHEN lang <> 'en' THEN lang ELSE 'None' END || ')'
         |    AS display_name,
         |  CASE WHEN doc_id % 5 <> 0 THEN 'dense' END AS embeddings_type,
         |  doc_id % 3 = 0 AS for_matching,
         |  CASE WHEN doc_id % 2 = 0 THEN strftime(ts, '%Y-%m-%dT%H:%M:%S')
         |       ELSE strftime(ts, '%Y-%m-%dT%H:%M:%S.%f') END AS original_timestamp,
         |  CAST(2 AS INTEGER) AS emb_dim
         |FROM src WHERE doc_id % 13 <> 0 AND doc_id % 97 <> 0""".stripMargin,

    "country_code" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id % 11 <> 0 AND lang <> 'en' THEN lang END AS country_code
        |FROM documents""".stripMargin,

    "quarantine" ->
      """SELECT vec_id,
        |  concat_ws(',',
        |    CASE WHEN vec_id % 7 = 0 THEN 'null_timestamp' END,
        |    CASE WHEN vec_id % 10 = 1
        |           OR (vec_id % 10 = 0 AND vec_id % 13 <> 2) THEN 'empty_embedding' END,
        |    CASE WHEN vec_id % 10 = 1 OR vec_id % 13 = 2 THEN 'bad_vector_dim' END)
        |    AS errors
        |FROM embeddings
        |WHERE vec_id % 7 = 0 OR vec_id % 10 IN (0, 1) OR vec_id % 13 = 2""".stripMargin,

    "display_name" ->
      """SELECT doc_id,
        |  source || ' (' || coalesce(CASE WHEN lang <> 'en' THEN lang END, 'None') || ')'
        |    AS display_name
        |FROM documents""".stripMargin,

    "iso_timestamp" ->
      """SELECT event_id,
        |  CASE WHEN microsecond(CAST(ts AS TIMESTAMP)) % 1000000 = 0
        |       THEN strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%dT%H:%M:%S')
        |       ELSE strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%dT%H:%M:%S.%f') END AS iso_ts
        |FROM events""".stripMargin,

    "merge_source" ->
      s"""WITH rec AS (
         |  SELECT doc_id, ${NormalizedKey.format("source || '_' || lang")} AS main_refco,
         |    source || ' (' || coalesce(CASE WHEN lang <> 'en' THEN lang END, 'None') || ')'
         |      AS display_name,
         |    n_chars
         |  FROM documents),
         |deduped AS (
         |  SELECT * FROM rec
         |  QUALIFY row_number() OVER (PARTITION BY main_refco ORDER BY doc_id DESC) = 1),
         |dim AS (
         |  SELECT display_name,
         |    list_reduce(
         |      [CAST(ascii(display_name[i:i]) AS BIGINT)
         |       for i in range(1, len(display_name) + 1)],
         |      (acc, c) -> (acc * 31 + c) % ${TextAnalysis.FingerprintMod})
         |      AS display_name_id
         |  FROM (SELECT DISTINCT display_name FROM rec
         |        WHERE display_name NOT LIKE '%(None)'))
         |SELECT d.main_refco, d.display_name, dim.display_name_id, d.doc_id, d.n_chars
         |FROM deduped d JOIN dim USING (display_name)""".stripMargin,

    "merge_upsert" ->
      """WITH t AS (
        |  SELECT doc_id, source AS cleaned_ref, lang AS category, n_chars AS val
        |  FROM documents WHERE doc_id % 3 = 0),
        |u AS (
        |  SELECT doc_id, 'u_' || source AS cleaned_ref,
        |    CASE WHEN doc_id % 5 <> 0 THEN 'u_' || lang END AS category,
        |    n_chars + 1 AS val
        |  FROM documents WHERE doc_id % 2 = 0)
        |SELECT coalesce(t.doc_id, u.doc_id) AS doc_id,
        |  coalesce(t.cleaned_ref, u.cleaned_ref) AS cleaned_ref,
        |  CASE WHEN u.doc_id IS NOT NULL THEN u.category ELSE t.category END AS category,
        |  CASE WHEN u.doc_id IS NOT NULL THEN u.val ELSE t.val END AS val
        |FROM t FULL OUTER JOIN u ON t.doc_id = u.doc_id""".stripMargin,

    "connected_components" ->
      """WITH RECURSIVE e AS (
        |  SELECT doc_id AS a, doc_id - (doc_id % 5) AS b FROM documents
        |  WHERE doc_id <> doc_id - (doc_id % 5)),
        |sym AS (SELECT a, b FROM e UNION SELECT b, a FROM e),
        |reach(id, r) AS (
        |  SELECT a, b FROM sym
        |  UNION
        |  SELECT reach.id, sym.b FROM reach JOIN sym ON reach.r = sym.a)
        |SELECT id, LEAST(id, MIN(r)) AS component FROM reach GROUP BY id""".stripMargin,

    // One-shot mirror of the two-batch incremental fold: same recursive
    // CC over the full edge stream, singletons self-labeled via the
    // left-join coalesce.
    "cc_incremental" ->
      """WITH RECURSIVE e AS (
        |  SELECT doc_id AS a, doc_id - (doc_id % 5) AS b FROM documents
        |  WHERE doc_id <> doc_id - (doc_id % 5)),
        |sym AS (SELECT a, b FROM e UNION SELECT b, a FROM e),
        |reach(id, r) AS (
        |  SELECT a, b FROM sym
        |  UNION
        |  SELECT reach.id, sym.b FROM reach JOIN sym ON reach.r = sym.a),
        |comp AS (SELECT id, LEAST(id, MIN(r)) AS component FROM reach GROUP BY id)
        |SELECT d.doc_id, coalesce(c.component, d.doc_id) AS component
        |FROM documents d LEFT JOIN comp c ON d.doc_id = c.id""".stripMargin,

    // Knuth hash in the same overflow-free split form as Dedup.capPerKey
    // (equal values wherever the naive multiply doesn't overflow).
    "cap_per_key" ->
      """SELECT doc_id, source FROM documents
        |QUALIFY row_number() OVER (PARTITION BY source
        |  ORDER BY ((doc_id % 4294967296 % 65536) * 2654435761
        |            + ((doc_id % 4294967296 // 65536) * 2654435761 % 65536) * 65536)
        |           % 4294967296, doc_id) <= 10""".stripMargin,

    "quantize_embeddings" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |s AS (SELECT vec_id, v,
        |        coalesce(list_max(list_transform(v, x -> abs(x))), 0.0) AS q8_scale
        |      FROM e),
        |q AS (SELECT vec_id, q8_scale,
        |        CASE WHEN q8_scale > 0
        |             THEN list_transform(v, x -> CAST(round(x / q8_scale * 127) AS BIGINT))
        |             ELSE list_transform(v, x -> CAST(0 AS BIGINT)) END AS qv
        |      FROM s)
        |SELECT vec_id, q8_scale,
        |  CAST(list_sum([qv[i] * i for i in range(1, len(qv) + 1)]) AS BIGINT) AS q_checksum
        |FROM q""".stripMargin,

    "exact_dedup" ->
      """SELECT doc_id, source, lang, n_chars FROM documents
        |QUALIFY row_number() OVER (PARTITION BY source, lang ORDER BY doc_id) = 1""".stripMargin,

    // Full-algorithm mirror: the SAME ±1 sign matrix (integer literals
    // from RandomProject.signs) over the same fixed-point inputs —
    // relational join form, no nested list lambdas (round-5 DuckDB cost
    // lesson).
    "random_projection" -> {
      val signsLit = graft.functions.RandomProject.signs(16, 64, 77L)
        .mkString("[", ",", "]")
      s"""WITH e AS (SELECT vec_id,
         |        list_transform(CAST(embedding AS DOUBLE[]),
         |          x -> CAST(round(x * 1048576) AS BIGINT)) AS q
         |      FROM embeddings),
         |u AS (SELECT vec_id, unnest(range(1, least(len(q), 64) + 1)) AS i,
         |             unnest(q[1:64]) AS v FROM e),
         |m AS (SELECT unnest(range(0, 1024)) AS k, unnest($signsLit) AS sgn),
         |d AS (SELECT u.vec_id, m.k // 64 AS j, sum(m.sgn * u.v) AS s
         |      FROM u JOIN m ON m.k % 64 = u.i - 1
         |      GROUP BY 1, 2),
         |p AS (SELECT vec_id, CAST(sum(s * (j + 1)) AS BIGINT) AS pr_checksum,
         |             CAST(sum(abs(s)) AS BIGINT) AS pr_l1 FROM d GROUP BY 1)
         |SELECT e.vec_id, coalesce(p.pr_checksum, 0) AS pr_checksum,
         |  coalesce(p.pr_l1, 0) AS pr_l1
         |FROM e LEFT JOIN p USING (vec_id)""".stripMargin
    },

    "pool_embeddings" ->
      """WITH e AS (SELECT label,
        |        list_transform(CAST(embedding AS DOUBLE[]),
        |          x -> CAST(round(x * 1048576) AS BIGINT)) AS q
        |      FROM embeddings),
        |n AS (SELECT label, count(*) AS n_vecs FROM e GROUP BY label),
        |u AS (SELECT label, unnest(range(1, len(q) + 1)) AS pos, unnest(q) AS v FROM e),
        |s AS (SELECT label, pos, CAST(sum(v) AS BIGINT) AS sv FROM u GROUP BY label, pos),
        |p AS (SELECT label, CAST(max(pos) AS BIGINT) AS dim,
        |        CAST(sum(sv * pos) AS BIGINT) AS pool_checksum,
        |        CAST(sum(abs(sv)) AS BIGINT) AS pool_l1
        |      FROM s GROUP BY label)
        |SELECT n.label, n.n_vecs, coalesce(p.dim, 0) AS dim,
        |  coalesce(p.pool_checksum, 0) AS pool_checksum,
        |  coalesce(p.pool_l1, 0) AS pool_l1
        |FROM n LEFT JOIN p USING (label)""".stripMargin,

    "chunk_documents" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |c AS (SELECT doc_id, ws, unnest(range(0, len(ws), 24)) AS st FROM w)
        |SELECT doc_id, CAST(st // 24 AS BIGINT) AS chunk_id,
        |  CAST(least(len(ws) - st, 32) AS BIGINT) AS n_tokens,
        |  array_to_string(ws[st + 1 : st + 32], ' ') AS chunk_text
        |FROM c""".stripMargin,

    // Full mirror: same sentence regex, parallel-unnest positions, same
    // prefix-sum chunk assignment and ordered re-assembly.
    "sentence_chunks" ->
      """WITH t AS (SELECT doc_id,
        |    text || '. End of doc ' || doc_id || '? Yes! trailing bit' AS page
        |  FROM documents),
        |w AS (SELECT doc_id,
        |    regexp_extract_all(page, '[^.!?]+[.!?]*') AS ss FROM t),
        |x AS (SELECT doc_id, unnest(range(0, len(ss))) AS sent_id,
        |        unnest(ss) AS s0 FROM w),
        |s AS (SELECT doc_id, CAST(sent_id AS BIGINT) AS sent_id,
        |        trim(s0) AS sentence,
        |        CAST(len([y for y in string_split(trim(s0), ' ') if y <> ''])
        |          AS BIGINT) AS n
        |      FROM x WHERE trim(s0) <> ''),
        |c AS (SELECT doc_id, sent_id, sentence, n,
        |        SUM(n) OVER (PARTITION BY doc_id ORDER BY sent_id) AS cum
        |      FROM s)
        |SELECT doc_id, CAST((cum - n) // 24 AS BIGINT) AS chunk_id,
        |  COUNT(*) AS n_sentences, CAST(SUM(n) AS BIGINT) AS n_tokens,
        |  string_agg(sentence, ' ' ORDER BY sent_id) AS chunk_text
        |FROM c GROUP BY doc_id, (cum - n) // 24""".stripMargin,

    // Full mirror: the chunk CTEs (the chunk_documents mirror), the
    // shifted self-join positive, and the same bucket-rotation negative
    // (lead + first_value wrap) over chunk-0 rows.
    "contrastive_pairs" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |c AS (SELECT doc_id, ws, unnest(range(0, len(ws), 24)) AS st FROM w),
        |ch AS (SELECT doc_id, CAST(st // 24 AS BIGINT) AS chunk_id,
        |         array_to_string(ws[st + 1 : st + 32], ' ') AS chunk_text
        |       FROM c),
        |p AS (SELECT a.doc_id, a.chunk_id, a.chunk_text AS anchor_text,
        |        b.chunk_text AS positive_text
        |      FROM ch a JOIN ch b ON b.doc_id = a.doc_id
        |        AND b.chunk_id = a.chunk_id + 1),
        |f AS (SELECT doc_id, chunk_text AS t, (doc_id * 31 + 17) % 32 AS b
        |      FROM ch WHERE chunk_id = 0),
        |n AS (SELECT doc_id,
        |        coalesce(lead(doc_id) OVER wo, first_value(doc_id) OVER wa)
        |          AS neg_doc_id,
        |        coalesce(lead(t) OVER wo, first_value(t) OVER wa)
        |          AS negative_text
        |      FROM f WINDOW
        |        wo AS (PARTITION BY b ORDER BY doc_id),
        |        wa AS (PARTITION BY b ORDER BY doc_id
        |               ROWS BETWEEN UNBOUNDED PRECEDING
        |               AND UNBOUNDED FOLLOWING))
        |SELECT p.doc_id, p.chunk_id, p.anchor_text, p.positive_text,
        |  n.neg_doc_id, n.negative_text
        |FROM p JOIN n USING (doc_id) WHERE neg_doc_id <> doc_id""".stripMargin,

    "boilerplate_lines" ->
      """WITH d AS (SELECT doc_id,
        |        'src: ' || source || chr(10) || text || chr(10) || 'lang: ' || lang AS page
        |      FROM documents),
        |w AS (SELECT doc_id, string_split(page, chr(10)) AS ls FROM d),
        |l AS (SELECT doc_id, unnest(range(1, len(ls) + 1)) AS pos, unnest(ls) AS line FROM w),
        |f AS (SELECT line FROM l GROUP BY line HAVING count(DISTINCT doc_id) >= 3),
        |k AS (SELECT doc_id, count(*) AS n_kept,
        |        string_agg(line, chr(10) ORDER BY pos) AS text_clean
        |      FROM l ANTI JOIN f USING (line) GROUP BY doc_id)
        |SELECT w.doc_id, CAST(len(w.ls) AS BIGINT) AS n_lines,
        |  coalesce(k.n_kept, 0) AS n_kept, coalesce(k.text_clean, '') AS text_clean
        |FROM w LEFT JOIN k USING (doc_id)""".stripMargin,

    "ngram_jaccard" ->
      s"""WITH ${jaccardPairCtes("source")}
        |SELECT a_id, b_id,
        |  CAST(inter AS DOUBLE) / CAST(a_n + b_n - inter AS DOUBLE) AS jaccard
        |FROM p WHERE 10 * inter >= 1 * (a_n + b_n - inter)""".stripMargin,

    "repeated_spans" ->
      s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |sh AS (SELECT doc_id,
        |         list_distinct([array_to_string(ws[i:i+2], ' ') for i in range(1, len(ws) - 1)]) AS sh
        |       FROM w),
        |ex AS (SELECT doc_id, unnest(sh) AS span FROM sh),
        |${sqlMix64Ctes("e", "ex", "span", "doc_id")},
        |f AS (SELECT sh64, count(*) AS n_docs FROM e GROUP BY 1),
        |d AS (SELECT e.doc_id, count(*) AS n_shared
        |      FROM e JOIN f USING (sh64) WHERE f.n_docs > 1 GROUP BY 1)
        |SELECT s.doc_id, CAST(len(s.sh) AS BIGINT) AS n_spans,
        |  coalesce(d.n_shared, 0) AS n_shared,
        |  len(s.sh) > 0 AND 2 * coalesce(d.n_shared, 0) >= len(s.sh) AS mostly_duplicated
        |FROM sh s LEFT JOIN d USING (doc_id)""".stripMargin,

    // Generated from the SAME MojibakeTable as the Spark chain: corrupt
    // the suffixed text, then repair; control chars ride through chr().
    "mojibake_fix" ->
      s"""WITH c AS (SELECT doc_id,
         |  ${mojibakeCorruptSql(s"(text || ${sqlStr(MojibakeSuffix)})")} AS ctext
         |  FROM documents)
         |SELECT doc_id, ${mojibakeFixSql("ctext")} AS repaired,
         |  CAST(length(ctext) - length(${mojibakeFixSql("ctext")}) AS BIGINT)
         |    AS chars_recovered
         |FROM c""".stripMargin,

    // Exact mirror: at ~31 distinct tokens/source the HLL sketch is in
    // its coupon regime (collision-free here, deterministically), so
    // count(DISTINCT) reproduces the estimate.
    "vocab_cardinality" ->
      """SELECT source, count(DISTINCT tok) AS vocab, count(*) AS n_tokens
        |FROM (SELECT source, unnest(string_split(text, ' ')) AS tok
        |      FROM documents)
        |GROUP BY source""".stripMargin,

    // The ngram_jaccard CTEs with the containment threshold/score.
    "containment_pairs" ->
      s"""WITH ${jaccardPairCtes("lang", nonEmpty = true)}
        |SELECT a_id, b_id,
        |  CAST(inter AS DOUBLE) / CAST(least(a_n, b_n) AS DOUBLE) AS containment
        |FROM p WHERE 5 * inter >= 4 * least(a_n, b_n)""".stripMargin,

    // Full mirror of the windowed passage pipeline: token prefix-sum
    // offsets, 8-token frame aggregates, duplicate census, span merge.
    "dup_passages" ->
      s"""WITH base AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
         |toks AS (SELECT doc_id, unnest(ts) AS tok,
         |           unnest(generate_series(1, len(ts))) AS i FROM base),
         |$dupPassageWindowCtes
         |SELECT doc_id, min(start_char) AS span_start,
         |  CAST(max(end_char) AS BIGINT) AS span_end, count(*) AS n_windows
         |FROM g2 GROUP BY doc_id, grp""".stripMargin,

    // Cleaned length derived WITHOUT the splice: original − Σ span widths.
    "dup_passage_clean" ->
      s"""WITH base AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
         |toks AS (SELECT doc_id, unnest(ts) AS tok,
         |           unnest(generate_series(1, len(ts))) AS i FROM base),
         |$dupPassageWindowCtes,
         |sp AS (SELECT doc_id, min(start_char) AS s, max(end_char) AS e
         |       FROM g2 GROUP BY doc_id, grp),
         |agg AS (SELECT doc_id, count(*) AS n_spans, sum(e - s) AS removed
         |        FROM sp GROUP BY 1)
         |SELECT d.doc_id, coalesce(a.n_spans, 0) AS n_spans,
         |  CAST(length(d.text) - coalesce(a.removed, 0) AS BIGINT) AS clean_len
         |FROM documents d LEFT JOIN agg a USING (doc_id)""".stripMargin,

    // md5-threshold CASE — the exact expression splitAssign builds.
    "group_split" ->
      s"""SELECT doc_id, source,
         |  CASE WHEN substr(md5(source || ':split42'), 1, 8) < '${splitThresholds(0)}' THEN 'train'
         |       WHEN substr(md5(source || ':split42'), 1, 8) < '${splitThresholds(1)}' THEN 'val'
         |       ELSE 'test' END AS split
         |FROM documents""".stripMargin,

    // The jaccard-pair + recursive-CC CTEs (as in dedup_survivors), then
    // the md5 split keyed on the component representative.
    "split_by_component" ->
      s"""WITH RECURSIVE ${jaccardPairCtes("source")},
         |pr AS (SELECT a_id, b_id FROM p WHERE 50 * inter >= 1 * (a_n + b_n - inter)),
         |sym AS (SELECT a_id AS a, b_id AS b FROM pr UNION SELECT b_id, a_id FROM pr),
         |reach(id, r) AS (
         |  SELECT a, b FROM sym
         |  UNION
         |  SELECT reach.id, sym.b FROM reach JOIN sym ON reach.r = sym.a),
         |comp AS (SELECT id, LEAST(id, MIN(r)) AS component FROM reach GROUP BY id)
         |SELECT d.doc_id, coalesce(c.component, d.doc_id) AS split_key,
         |  CASE WHEN substr(md5(CAST(coalesce(c.component, d.doc_id) AS VARCHAR) || ':split42'), 1, 8) < '${splitThresholds(0)}' THEN 'train'
         |       WHEN substr(md5(CAST(coalesce(c.component, d.doc_id) AS VARCHAR) || ':split42'), 1, 8) < '${splitThresholds(1)}' THEN 'val'
         |       ELSE 'test' END AS split
         |FROM documents d LEFT JOIN comp c ON d.doc_id = c.id""".stripMargin,

    // Full-pipeline mirror: the ngram_jaccard pair CTEs at 1/50, the
    // connected_components recursive CTE, then the anti-joined survivors.
    "dedup_survivors" ->
      s"""WITH RECURSIVE ${jaccardPairCtes("source")},
        |pr AS (SELECT a_id, b_id FROM p WHERE 50 * inter >= 1 * (a_n + b_n - inter)),
        |sym AS (SELECT a_id AS a, b_id AS b FROM pr UNION SELECT b_id, a_id FROM pr),
        |reach(id, r) AS (
        |  SELECT a, b FROM sym
        |  UNION
        |  SELECT reach.id, sym.b FROM reach JOIN sym ON reach.r = sym.a),
        |drops AS (SELECT id FROM (SELECT id, LEAST(id, MIN(r)) AS component
        |                          FROM reach GROUP BY id) WHERE id <> component)
        |SELECT d.doc_id, d.source, d.lang, d.n_chars FROM documents d
        |WHERE d.doc_id NOT IN (SELECT id FROM drops)""".stripMargin,

    // Same jaccard-pair CTEs over the whole table (old ∪ new IS
    // documents); a new doc is dup iff some pair endpoint pairs it with
    // an even id. LEFT JOIN + COUNT(col) keeps zero-dup sources.
    "cross_dup_rate" ->
      s"""WITH ${jaccardPairCtes("source")},
        |pr AS (SELECT a_id, b_id FROM p WHERE 50 * inter >= 1 * (a_n + b_n - inter)),
        |de AS (SELECT a_id AS x, b_id AS y FROM pr
        |       UNION ALL SELECT b_id, a_id FROM pr),
        |dup AS (SELECT DISTINCT x AS doc_id FROM de
        |        WHERE x % 2 = 1 AND y % 2 = 0)
        |SELECT d.source, COUNT(*) AS n_new,
        |  CAST(COUNT(dup.doc_id) AS BIGINT) AS n_dup,
        |  CAST(COUNT(dup.doc_id) * 1000 // COUNT(*) AS BIGINT) AS dup_permille
        |FROM documents d LEFT JOIN dup USING (doc_id)
        |WHERE d.doc_id % 2 = 1
        |GROUP BY d.source""".stripMargin,

    // Same jaccard-pair + recursive-CC CTEs; singletons self-label via
    // the left-join coalesce, then two size aggregations.
    "dup_cluster_sizes" ->
      s"""WITH RECURSIVE ${jaccardPairCtes("source")},
        |pr AS (SELECT a_id, b_id FROM p WHERE 50 * inter >= 1 * (a_n + b_n - inter)),
        |sym AS (SELECT a_id AS a, b_id AS b FROM pr UNION SELECT b_id, a_id FROM pr),
        |reach(id, r) AS (
        |  SELECT a, b FROM sym
        |  UNION
        |  SELECT reach.id, sym.b FROM reach JOIN sym ON reach.r = sym.a),
        |comp AS (SELECT id, LEAST(id, MIN(r)) AS component FROM reach GROUP BY id),
        |lab AS (SELECT COALESCE(c.component, d.doc_id) AS component
        |        FROM documents d LEFT JOIN comp c ON d.doc_id = c.id),
        |sz AS (SELECT component, COUNT(*) AS cluster_size FROM lab GROUP BY component)
        |SELECT CAST(cluster_size AS BIGINT) AS cluster_size,
        |  CAST(COUNT(*) AS BIGINT) AS n_clusters
        |FROM sz GROUP BY cluster_size""".stripMargin,

    // Same recursive-CC tail as dedup_survivors; the survivor rank swaps
    // min-id for (n_chars DESC, id).
    "dedup_survivors_best" ->
      s"""WITH RECURSIVE ${jaccardPairCtes("source")},
        |pr AS (SELECT a_id, b_id FROM p WHERE 50 * inter >= 1 * (a_n + b_n - inter)),
        |sym AS (SELECT a_id AS a, b_id AS b FROM pr UNION SELECT b_id, a_id FROM pr),
        |reach(id, r) AS (
        |  SELECT a, b FROM sym
        |  UNION
        |  SELECT reach.id, sym.b FROM reach JOIN sym ON reach.r = sym.a),
        |comp AS (SELECT id, LEAST(id, MIN(r)) AS component FROM reach GROUP BY id),
        |m AS (SELECT comp.id, comp.component, d.n_chars
        |      FROM comp JOIN documents d ON comp.id = d.doc_id),
        |drops AS (SELECT id FROM (
        |    SELECT id, row_number() OVER (PARTITION BY component
        |      ORDER BY n_chars DESC, id) AS rn FROM m) WHERE rn > 1)
        |SELECT d.doc_id, d.source, d.lang, d.n_chars FROM documents d
        |WHERE d.doc_id NOT IN (SELECT id FROM drops)""".stripMargin,

    "decontaminate" ->
      s"""WITH w AS (SELECT doc_id, source, string_split(text, ' ') AS ws FROM documents),
        |sh AS (SELECT doc_id, source,
        |         list_distinct([array_to_string(ws[i:i+2], ' ') for i in range(1, len(ws) - 1)]) AS sh
        |       FROM w),
        |ex AS (SELECT doc_id, unnest(sh) AS shingle FROM sh),
        |${sqlMix64Ctes("eh", "ex", "shingle", "doc_id")},
        |bench AS (SELECT DISTINCT sh64 FROM eh WHERE doc_id % 50 = 0),
        |corp AS (SELECT doc_id, sh64 FROM eh WHERE doc_id % 50 <> 0),
        |ov AS (SELECT doc_id, count(*) AS n_overlap
        |       FROM corp JOIN bench USING (sh64) GROUP BY 1)
        |SELECT d.doc_id, d.source,
        |  coalesce(ov.n_overlap, 0) AS n_overlap,
        |  coalesce(ov.n_overlap, 0) > 0 AS contaminated
        |FROM documents d LEFT JOIN ov USING (doc_id)
        |WHERE d.doc_id % 50 <> 0""".stripMargin,

    // The Bloom path's verified result is exactly the exact-plan clean:
    // corpus minus every doc sharing any shingle hash with the benchmark.
    // Full mirror of the cross-set window pipeline (shared deconSpanCtes).
    "decon_spans" ->
      s"""WITH $deconSpanCtes
         |SELECT doc_id, min(start_char) AS span_start,
         |  CAST(max(end_char) AS BIGINT) AS span_end, count(*) AS n_windows
         |FROM g2 GROUP BY doc_id, grp""".stripMargin,

    // Cleaned length derived WITHOUT the splice: original - sum of span
    // widths over the same shared CTE chain.
    "decon_span_clean" ->
      s"""WITH $deconSpanCtes,
         |sp AS (SELECT doc_id, min(start_char) AS s, max(end_char) AS e
         |       FROM g2 GROUP BY doc_id, grp),
         |agg AS (SELECT doc_id, count(*) AS n_spans, sum(e - s) AS removed
         |        FROM sp GROUP BY 1)
         |SELECT d.doc_id, coalesce(a.n_spans, 0) AS n_spans,
         |  CAST(length(d.text) - coalesce(a.removed, 0) AS BIGINT) AS clean_len
         |FROM (SELECT doc_id, text FROM documents WHERE doc_id % 50 <> 0) d
         |LEFT JOIN agg a USING (doc_id)""".stripMargin,

    "decon_bloom" ->
      s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |sh AS (SELECT doc_id,
        |         list_distinct([array_to_string(ws[i:i+2], ' ') for i in range(1, len(ws) - 1)]) AS sh
        |       FROM w),
        |ex AS (SELECT doc_id, unnest(sh) AS shingle FROM sh),
        |${sqlMix64Ctes("eh", "ex", "shingle", "doc_id")},
        |bench AS (SELECT DISTINCT sh64 FROM eh WHERE doc_id % 50 = 0),
        |bad AS (SELECT DISTINCT doc_id FROM eh
        |        WHERE doc_id % 50 <> 0 AND sh64 IN (SELECT sh64 FROM bench))
        |SELECT d.doc_id, d.source, d.n_chars FROM documents d
        |WHERE d.doc_id % 50 <> 0
        |  AND d.doc_id NOT IN (SELECT doc_id FROM bad)""".stripMargin,

    // Same assignment mirror as cluster_purity, then per-cluster bottom-k
    // by the assigned cosine (ascending, tie on id).
    "cluster_outliers" ->
      """WITH seeds AS (SELECT vec_id AS cluster_id, CAST(embedding AS DOUBLE[]) AS sv
        |               FROM embeddings WHERE vec_id < 8),
        |a AS (SELECT e.vec_id, s.cluster_id,
        |        list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), s.sv) AS cos_to_seed,
        |        row_number() OVER (PARTITION BY e.vec_id
        |          ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), s.sv) DESC,
        |                   s.cluster_id) AS rn
        |      FROM embeddings e, seeds s)
        |SELECT vec_id, cluster_id, cos_to_seed FROM a WHERE rn = 1
        |QUALIFY row_number() OVER (PARTITION BY cluster_id
        |  ORDER BY cos_to_seed ASC, vec_id) <= 5""".stripMargin,

    // Full-algorithm mirror: same seed set (vec_id < 8), same argmax
    // (cosine DESC, seed ASC), same purity arithmetic in integers.
    "cluster_purity" ->
      """WITH seeds AS (SELECT vec_id AS cluster_id, CAST(embedding AS DOUBLE[]) AS sv
        |               FROM embeddings WHERE vec_id < 8),
        |a AS (SELECT e.vec_id, e.label, s.cluster_id,
        |        row_number() OVER (PARTITION BY e.vec_id
        |          ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), s.sv) DESC,
        |                   s.cluster_id) AS rn
        |      FROM embeddings e, seeds s),
        |b AS (SELECT vec_id, label, cluster_id FROM a WHERE rn = 1),
        |cl AS (SELECT cluster_id, label, count(*) AS n FROM b GROUP BY 1, 2),
        |t AS (SELECT cluster_id, n, label,
        |        row_number() OVER (PARTITION BY cluster_id ORDER BY n DESC, label) AS rn,
        |        sum(n) OVER (PARTITION BY cluster_id) AS tot
        |      FROM cl)
        |SELECT cluster_id, CAST(tot AS BIGINT) AS n_vecs, label AS top_label,
        |  CAST(n AS BIGINT) AS top_n, CAST(n * 1000 // tot AS BIGINT) AS purity_permille
        |FROM t WHERE rn = 1""".stripMargin,

    // ann_ivf probes every cell, so its result is exactly brute force —
    // same oracle as cosine_topk.
    "ann_ivf" ->
      """WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
        |           FROM embeddings WHERE vec_id < 20),
        |c AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv FROM embeddings),
        |s AS (SELECT query_id, neighbor_id, list_cosine_similarity(qv, cv) AS cos
        |      FROM q, c WHERE query_id <> neighbor_id)
        |SELECT query_id,
        |  CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS BIGINT)
        |    AS rank,
        |  neighbor_id, cos
        |FROM s
        |QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) <= 5""".stripMargin,

    // Exact-degenerate IVF-PQ probe (full probe + full candidates ⇒ the
    // re-rank sees everything): oracle = brute-force top-5, like ann_ivf.
    "ann_ivfpq" ->
      """WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
        |           FROM embeddings WHERE vec_id < 20),
        |c AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv FROM embeddings),
        |s AS (SELECT query_id, neighbor_id, list_cosine_similarity(qv, cv) AS cos
        |      FROM q, c WHERE query_id <> neighbor_id)
        |SELECT query_id,
        |  CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS BIGINT)
        |    AS rank,
        |  neighbor_id, cos
        |FROM s
        |QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) <= 5""".stripMargin,

    // Full-algorithm mirror of the lossy IVF probe (seed centroids =
    // first 8 corpus vectors): corpus cell assignment by cosine argmax
    // (tie: lowest cell), per-query top-2 probed cells, candidate top-5
    // re-rank, then recall vs the exact brute-force top-5. Ordering by
    // list_cosine_similarity matches F.nearestCentroids' normalized-dot
    // argmax because the per-row norm factor is order-preserving.
    "ivf_recall" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |seeds AS (SELECT vec_id AS cell, v AS sv FROM e WHERE vec_id < 8),
        |ca AS (SELECT vec_id, cell FROM (
        |    SELECT e.vec_id, s.cell,
        |      row_number() OVER (PARTITION BY e.vec_id
        |        ORDER BY list_cosine_similarity(e.v, s.sv) DESC, s.cell) AS rn
        |    FROM e, seeds s) WHERE rn = 1),
        |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 20),
        |probe AS (SELECT query_id, cell FROM (
        |    SELECT q.query_id, s.cell,
        |      row_number() OVER (PARTITION BY q.query_id
        |        ORDER BY list_cosine_similarity(q.qv, s.sv) DESC, s.cell) AS rn
        |    FROM q, seeds s) WHERE rn <= 2),
        |cand AS (SELECT p.query_id, ca.vec_id AS neighbor_id
        |  FROM probe p JOIN ca ON ca.cell = p.cell
        |  WHERE ca.vec_id <> p.query_id),
        |ap AS (SELECT query_id, neighbor_id FROM (
        |    SELECT c.query_id, c.neighbor_id,
        |      row_number() OVER (PARTITION BY c.query_id
        |        ORDER BY list_cosine_similarity(eq.v, ec.v) DESC, c.neighbor_id) AS rn
        |    FROM cand c JOIN e eq ON eq.vec_id = c.query_id
        |                JOIN e ec ON ec.vec_id = c.neighbor_id) WHERE rn <= 5),
        |ex AS (SELECT query_id, neighbor_id FROM (
        |    SELECT q.query_id, e2.vec_id AS neighbor_id,
        |      row_number() OVER (PARTITION BY q.query_id
        |        ORDER BY list_cosine_similarity(q.qv, e2.v) DESC, e2.vec_id) AS rn
        |    FROM q, e e2 WHERE e2.vec_id <> q.query_id) WHERE rn <= 5)
        |SELECT (SELECT count(*) FROM ex) AS n_exact,
        |  (SELECT count(*) FROM ap) AS n_approx,
        |  (SELECT count(*) FROM ex JOIN ap USING (query_id, neighbor_id)) AS n_hit,
        |  CAST((SELECT count(*) FROM ex JOIN ap USING (query_id, neighbor_id)) * 1000
        |       // (SELECT count(*) FROM ex) AS BIGINT) AS recall_permille""".stripMargin,

    "ngram_jaccard_prefix" ->
      s"""WITH ${jaccardPairCtes("source")}
        |SELECT a_id, b_id,
        |  CAST(inter AS DOUBLE) / CAST(a_n + b_n - inter AS DOUBLE) AS jaccard
        |FROM p WHERE 5 * inter >= 4 * (a_n + b_n - inter)""".stripMargin,

    // Full MinHash-LSH mirror: portable shingle hash, literal-interpolated
    // permutation coefficients, band collisions re-derived by comparing the
    // signature slices themselves (band-hash equality <=> slice equality up
    // to a 2^-64 collision), then exact-Jaccard verification — so the
    // match is exact regardless of LSH recall. Two DuckDB cost lessons are
    // baked in (round-5 gate timeout, >10 CPU-min): (1) CTEs referenced
    // more than once are MATERIALIZED — DuckDB inlines plain CTEs, so the
    // signature pass would otherwise run once per reference; (2) the
    // signature itself is RELATIONAL (unnest shingle hashes × a 128-row
    // perm series → vectorized min + list(ORDER BY) reassembly) instead of
    // nested list lambdas — lambda evaluation is row-at-a-time AND a
    // 500-row table is one row group, i.e. single-threaded (105 s → <1 s).
    "minhash_lsh" -> {
      val (a, b) = graft.functions.MinHashSig.coeffs(128, 42L)
      val aLit = a.mkString("[", ",", "]")
      val bLit = b.mkString("[", ",", "]")
      s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
         |sh AS MATERIALIZED (SELECT doc_id,
         |         list_distinct([array_to_string(ws[i:i+2], ' ') for i in range(1, len(ws) - 1)]) AS sh
         |       FROM w),
         |hs AS (SELECT doc_id,
         |         list_transform(sh, s ->
         |           list_reduce([CAST(ascii(s[i:i]) AS BIGINT) for i in range(1, len(s) + 1)],
         |                       (acc, c) -> (acc * 31 + c) % ${graft.functions.MinHashSig.HashMod})) AS hv
         |       FROM sh),
         |hrows AS (SELECT doc_id, unnest(hv) AS h FROM hs),
         |perms AS (SELECT unnest(generate_series(1, 128)) AS j),
         |sigrows AS (SELECT doc_id, j,
         |              min(($aLit[j] * h + $bLit[j]) % ${graft.functions.MinHashSig.P}) AS m
         |            FROM hrows CROSS JOIN perms GROUP BY doc_id, j),
         |sgl AS (SELECT doc_id, list(m ORDER BY j) AS sig FROM sigrows GROUP BY doc_id),
         |sg AS MATERIALIZED (SELECT sh.doc_id,
         |        coalesce(sgl.sig,
         |                 list_transform(generate_series(1, 128), j -> 9223372036854775807)) AS sig
         |      FROM sh LEFT JOIN sgl ON sh.doc_id = sgl.doc_id),
         |bands AS MATERIALIZED (
         |          SELECT doc_id, bs.b, list_slice(sig, bs.b * 4 + 1, bs.b * 4 + 4) AS slice
         |          FROM sg CROSS JOIN (SELECT unnest(generate_series(0, 31)) AS b) bs),
         |cand AS (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
         |         FROM bands a JOIN bands b
         |           ON a.b = b.b AND a.slice = b.slice AND a.doc_id < b.doc_id),
         |v AS (SELECT a_id, b_id,
         |        CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE) AS inter,
         |        CAST(len(sa.sh) + len(sb.sh) AS DOUBLE) AS tot
         |      FROM cand JOIN sh sa ON sa.doc_id = cand.a_id
         |                JOIN sh sb ON sb.doc_id = cand.b_id)
         |SELECT a_id, b_id, inter / (tot - inter) AS jaccard
         |FROM v WHERE tot - inter > 0 AND inter / (tot - inter) >= 0.1""".stripMargin
    },

    // minhash_lsh_est: same signature + band pipeline, but verification is
    // the estimated Jaccard — the agreeing-component fraction of the two
    // 128-long signatures (the streaming index's verification math).
    "minhash_lsh_est" -> {
      val (a, b) = graft.functions.MinHashSig.coeffs(128, 42L)
      val aLit = a.mkString("[", ",", "]")
      val bLit = b.mkString("[", ",", "]")
      s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
         |sh AS MATERIALIZED (SELECT doc_id,
         |         list_distinct([array_to_string(ws[i:i+2], ' ') for i in range(1, len(ws) - 1)]) AS sh
         |       FROM w),
         |hs AS (SELECT doc_id,
         |         list_transform(sh, s ->
         |           list_reduce([CAST(ascii(s[i:i]) AS BIGINT) for i in range(1, len(s) + 1)],
         |                       (acc, c) -> (acc * 31 + c) % ${graft.functions.MinHashSig.HashMod})) AS hv
         |       FROM sh),
         |hrows AS (SELECT doc_id, unnest(hv) AS h FROM hs),
         |perms AS (SELECT unnest(generate_series(1, 128)) AS j),
         |sigrows AS (SELECT doc_id, j,
         |              min(($aLit[j] * h + $bLit[j]) % ${graft.functions.MinHashSig.P}) AS m
         |            FROM hrows CROSS JOIN perms GROUP BY doc_id, j),
         |sgl AS (SELECT doc_id, list(m ORDER BY j) AS sig FROM sigrows GROUP BY doc_id),
         |sg AS MATERIALIZED (SELECT sh.doc_id,
         |        coalesce(sgl.sig,
         |                 list_transform(generate_series(1, 128), j -> 9223372036854775807)) AS sig
         |      FROM sh LEFT JOIN sgl ON sh.doc_id = sgl.doc_id),
         |bands AS MATERIALIZED (
         |          SELECT doc_id, bs.b, list_slice(sig, bs.b * 4 + 1, bs.b * 4 + 4) AS slice
         |          FROM sg CROSS JOIN (SELECT unnest(generate_series(0, 31)) AS b) bs),
         |cand AS (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
         |         FROM bands a JOIN bands b
         |           ON a.b = b.b AND a.slice = b.slice AND a.doc_id < b.doc_id),
         |v AS (SELECT a_id, b_id,
         |        CAST(list_sum(list_transform(list_zip(sa.sig, sb.sig),
         |               p -> CASE WHEN p[1] = p[2] THEN 1 ELSE 0 END)) AS DOUBLE) / 128 AS est_jaccard
         |      FROM cand JOIN sg sa ON sa.doc_id = cand.a_id
         |                JOIN sg sb ON sb.doc_id = cand.b_id)
         |SELECT a_id, b_id, est_jaccard FROM v WHERE est_jaccard >= 0.1""".stripMargin
    },

    // Exact SimHash mirror (portable word hash splitmix-finalized in
    // HUGEINT/UBIGINT arithmetic). No banding needed here: the Spark
    // operator's 16-bit-chunk candidates have guaranteed recall at
    // Hamming<=3 (pigeonhole), so its output IS the all-pairs answer.
    "simhash_pairs" ->
      s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
         |h0 AS (SELECT doc_id, list_transform(ws, s ->
         |        CAST((CASE WHEN len(s) = 0 THEN 0 ELSE
         |          list_reduce([CAST(ascii(s[i:i]) AS HUGEINT) for i in range(1, len(s) + 1)],
         |                      (acc, c) -> (acc * 31 + c) % 18446744073709551616) END) AS UBIGINT)) AS z
         |       FROM w),
         |h1 AS (SELECT doc_id, list_transform(z, x -> xor(x, x >> 30)) AS z FROM h0),
         |h2 AS (SELECT doc_id, list_transform(z, x -> ${sqlMulMod64("x", "13787848793156543929")}) AS z FROM h1),
         |h3 AS (SELECT doc_id, list_transform(z, x -> xor(x, x >> 27)) AS z FROM h2),
         |h4 AS (SELECT doc_id, list_transform(z, x -> ${sqlMulMod64("x", "10723151780598845931")}) AS z FROM h3),
         |h5 AS (SELECT doc_id, list_transform(z, x -> xor(x, x >> 31)) AS wh FROM h4),
         |sig AS (SELECT doc_id,
         |  list_reduce(list_transform(generate_series(0, 63), j ->
         |    CASE WHEN list_sum(list_transform(wh,
         |           x -> CASE WHEN (x >> j) & 1 = 1 THEN 1 ELSE -1 END)) > 0
         |         THEN (CAST(1 AS UBIGINT) << j) ELSE CAST(0 AS UBIGINT) END),
         |    (a, b) -> a | b) AS sig
         |  FROM h5)
         |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
         |  CAST(bit_count(xor(a.sig, b.sig)) AS INTEGER) AS hamming
         |FROM sig a JOIN sig b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.sig, b.sig)) <= 3""".stripMargin,

    "cosine_topk" ->
      """WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
        |           FROM embeddings WHERE vec_id < 20),
        |c AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv FROM embeddings),
        |s AS (SELECT query_id, neighbor_id, list_cosine_similarity(qv, cv) AS cos
        |      FROM q, c WHERE query_id <> neighbor_id)
        |SELECT query_id,
        |  CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS BIGINT)
        |    AS rank,
        |  neighbor_id, cos
        |FROM s
        |QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) <= 5""".stripMargin,

    // Exact top-10 by cosine + label-match metrics; n_rel excludes self,
    // recall@10 is R-capped (min(k, n_rel) denominator), integer div.
    "retrieval_eval" ->
      """WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS v,
        |           label AS ql FROM embeddings WHERE vec_id < 50),
        |c AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS v,
        |      label AS cl FROM embeddings),
        |s AS (SELECT query_id, ql, neighbor_id, cl,
        |        list_cosine_similarity(q.v, c.v) AS cos
        |      FROM q, c WHERE query_id <> neighbor_id),
        |t AS (SELECT query_id, ql, cl,
        |        ROW_NUMBER() OVER (PARTITION BY query_id
        |          ORDER BY cos DESC, neighbor_id) AS rnk
        |      FROM s
        |      QUALIFY ROW_NUMBER() OVER (PARTITION BY query_id
        |        ORDER BY cos DESC, neighbor_id) <= 10),
        |hist AS (SELECT label AS ql, COUNT(*) AS n_lab FROM embeddings GROUP BY 1),
        |a AS (SELECT query_id, MIN(CASE WHEN ql = cl THEN rnk END) AS first_rel,
        |        SUM(CASE WHEN ql = cl THEN 1 ELSE 0 END) AS hits,
        |        MAX(ql) AS ql
        |      FROM t GROUP BY 1)
        |SELECT query_id, CAST(first_rel AS BIGINT) AS first_rel,
        |  CAST(COALESCE(1000000 // first_rel, 0) AS BIGINT) AS rr_micro,
        |  CAST(hits AS BIGINT) AS hits,
        |  CAST(n_lab - 1 AS BIGINT) AS n_rel,
        |  CAST(CASE WHEN LEAST(10, n_lab - 1) > 0
        |       THEN (1000 * hits) // LEAST(10, n_lab - 1) ELSE 0 END AS BIGINT)
        |    AS recall_permille
        |FROM a JOIN hist USING (ql)""".stripMargin,

    // Hard tier mirrors cosine_topk; random tier recomputes the identical
    // mix64 pair hash and ranks it, excluding the hard set.
    "hard_negatives" ->
      s"""WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
        |           FROM embeddings WHERE vec_id < 8),
        |c AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv FROM embeddings),
        |s AS (SELECT query_id, neighbor_id, list_cosine_similarity(qv, cv) AS cos
        |      FROM q, c WHERE query_id <> neighbor_id),
        |hard AS (SELECT query_id, neighbor_id, cos,
        |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
        |  FROM s
        |  QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) <= 5),
        |p AS (SELECT s.query_id, s.neighbor_id,
        |    CAST(s.query_id AS VARCHAR) || ':' || CAST(s.neighbor_id AS VARCHAR) AS pair
        |  FROM s ANTI JOIN hard USING (query_id, neighbor_id)),
        |${sqlMix64Ctes("hh", "p", "pair", "query_id, neighbor_id")},
        |rnd AS (SELECT query_id, neighbor_id,
        |    row_number() OVER (PARTITION BY query_id ORDER BY sh64, neighbor_id) AS rank
        |  FROM hh
        |  QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY sh64, neighbor_id) <= 5)
        |SELECT query_id, 'hard' AS neg_type, CAST(rank AS BIGINT) AS rank,
        |  neighbor_id, cos FROM hard
        |UNION ALL
        |SELECT query_id, 'random', CAST(rank AS BIGINT), neighbor_id, NULL FROM rnd""".stripMargin,

    "cosine_neardup_exact" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
        |SELECT a.vec_id AS a_id, b.vec_id AS b_id,
        |  list_cosine_similarity(a.v, b.v) AS cos
        |FROM e a JOIN e b ON a.vec_id < b.vec_id
        |WHERE list_cosine_similarity(a.v, b.v) >= 0.4""".stripMargin,

    // SRP-LSH ANN mirror: same literal-hyperplane bucketing as
    // cosine_neardup_lsh, then per-query ranking over the candidate set
    // (rank order identical to cosine_topk's proven tie-break).
    "ann_lsh" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |hp AS (SELECT * FROM (VALUES
         |${srpPlanesValues(planes = 8, dim = 64, seed = 42L, tables = 4)}
         |) AS t(t, p, pv)),
         |bits AS (SELECT e.vec_id, hp.t, hp.p,
         |    CASE WHEN list_reduce(
         |           list_transform(generate_series(1, 64), i -> v[i] * pv[i]),
         |           (a, b) -> a + b) >= 0
         |         THEN 1 << hp.p ELSE 0 END AS bit
         |  FROM e CROSS JOIN hp),
         |buck AS (SELECT vec_id, t, sum(bit) AS bucket FROM bits GROUP BY vec_id, t),
         |cand AS (SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
         |         FROM buck q JOIN buck c ON q.t = c.t AND q.bucket = c.bucket
         |         WHERE q.vec_id < 20 AND q.vec_id <> c.vec_id),
         |s AS (SELECT query_id, neighbor_id,
         |        list_cosine_similarity(eq.v, ec.v) AS cos
         |      FROM cand JOIN e eq ON eq.vec_id = query_id
         |                JOIN e ec ON ec.vec_id = neighbor_id)
         |SELECT query_id,
         |  CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS BIGINT)
         |    AS rank,
         |  neighbor_id, cos
         |FROM s
         |QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) <= 5""".stripMargin,

    // Full HNSW-style mirror: levels, per-layer graph, greedy descent and
    // the layer-0 beam all replayed as CTEs; the final top-k excludes the
    // query's own node exactly like the engine.
    "ann_hnsw" ->
      s"""WITH e AS MATERIALIZED (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |${hnswSearchCtes(m = 8, beam = 16, rounds = 3)}
         |SELECT d.query_id,
         |  CAST(row_number() OVER (PARTITION BY d.query_id
         |    ORDER BY list_cosine_similarity(q.qv, ev.v) DESC, d.node) AS BIGINT)
         |    AS rank,
         |  d.node AS neighbor_id, list_cosine_similarity(q.qv, ev.v) AS cos
         |FROM s6 d JOIN qs q ON q.query_id = d.query_id
         |          JOIN e ev ON ev.vec_id = d.node
         |WHERE d.node <> d.query_id
         |QUALIFY row_number() OVER (PARTITION BY d.query_id
         |  ORDER BY list_cosine_similarity(q.qv, ev.v) DESC, d.node) <= 5""".stripMargin,

    // The recall harness's oracle recomputes BOTH sides (brute-force
    // exact and the full graph search) and the hit join.
    "hnsw_recall" ->
      s"""WITH e AS MATERIALIZED (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |${hnswSearchCtes(m = 8, beam = 16, rounds = 3)},
         |hn AS MATERIALIZED (SELECT d.query_id, d.node AS neighbor_id
         |       FROM s6 d JOIN qs q ON q.query_id = d.query_id
         |                 JOIN e ev ON ev.vec_id = d.node
         |       WHERE d.node <> d.query_id
         |       QUALIFY row_number() OVER (PARTITION BY d.query_id
         |         ORDER BY list_cosine_similarity(q.qv, ev.v) DESC, d.node) <= 5),
         |bf AS MATERIALIZED (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id
         |       FROM e q JOIN e c ON c.vec_id <> q.vec_id
         |       WHERE q.vec_id < 20
         |       QUALIFY row_number() OVER (PARTITION BY q.vec_id
         |         ORDER BY list_cosine_similarity(q.v, c.v) DESC, c.vec_id) <= 5)
         |SELECT (SELECT COUNT(*) FROM bf) AS n_exact,
         |  (SELECT COUNT(*) FROM hn) AS n_approx,
         |  (SELECT COUNT(*) FROM bf JOIN hn USING (query_id, neighbor_id)) AS n_hit,
         |  CAST((SELECT COUNT(*) FROM bf JOIN hn USING (query_id, neighbor_id))
         |    * 1000 // (SELECT COUNT(*) FROM bf) AS BIGINT) AS recall_permille""".stripMargin,

    // Full algorithm mirror: the seed-derived hyperplanes are interpolated
    // as literals, bucketing + sign rule + verification recomputed in SQL —
    // so the oracle matches the LSH output exactly whatever its recall.
    "cosine_neardup_lsh" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |hp AS (SELECT * FROM (VALUES
         |${srpPlanesValues(planes = 4, dim = 64, seed = 42L, tables = 4)}
         |) AS t(t, p, pv)),
         |bits AS (SELECT e.vec_id, hp.t, hp.p,
         |    CASE WHEN list_reduce(
         |           list_transform(generate_series(1, 64), i -> v[i] * pv[i]),
         |           (a, b) -> a + b) >= 0
         |         THEN 1 << hp.p ELSE 0 END AS bit
         |  FROM e CROSS JOIN hp),
         |buck AS (SELECT vec_id, t, sum(bit) AS bucket FROM bits GROUP BY vec_id, t),
         |cand AS (SELECT DISTINCT a.vec_id AS a_id, b.vec_id AS b_id
         |         FROM buck a JOIN buck b
         |           ON a.t = b.t AND a.bucket = b.bucket AND a.vec_id < b.vec_id)
         |SELECT a_id, b_id, list_cosine_similarity(ea.v, eb.v) AS cos
         |FROM cand JOIN e ea ON ea.vec_id = a_id JOIN e eb ON eb.vec_id = b_id
         |WHERE list_cosine_similarity(ea.v, eb.v) >= 0.4""".stripMargin,

    // Per-option replay of the SAME hyperplane doubles (generated
    // VALUES), bit-sum buckets, occupancy census, UNION ALL.
    "lsh_calibration" -> {
      def one(p: Int): String =
        s"""SELECT CAST($p AS BIGINT) AS planes, COUNT(*) AS n_buckets,
           |  CAST(SUM(c) AS BIGINT) AS n_vectors,
           |  CAST(MAX(c) AS BIGINT) AS max_bucket,
           |  CAST(SUM(c * (c - 1) // 2) AS BIGINT) AS cand_pairs,
           |  CAST(1000 * SUM(c * (c - 1) // 2) // greatest(SUM(c), 1)
           |    AS BIGINT) AS probes_per_kvec
           |FROM (SELECT bucket, COUNT(*) AS c FROM (
           |  SELECT vec_id,
           |    SUM(CASE WHEN dot >= 0 THEN 1 << p ELSE 0 END) AS bucket
           |  FROM (SELECT e.vec_id, hp.p,
           |          list_reduce(list_transform(generate_series(1, 64),
           |            i -> v[i] * pv[i]), (a, b) -> a + b) AS dot
           |        FROM e CROSS JOIN (VALUES
           |          ${srpPlanesValues(p, 64, 42L, 1)}) hp(t, p, pv))
           |  GROUP BY vec_id) GROUP BY bucket)""".stripMargin
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
         |           FROM embeddings)
         |${Seq(4, 8, 12).map(one).mkString("\nUNION ALL\n")}""".stripMargin
    },

    // The lang_id argmax mirror grouped against the labels.
    "langid_confusion" -> {
      val scores = TextAnalysis.LangMarkers
        .map { case (lang, ms) => s"${langScore(ms)} AS s_$lang" }.mkString(",\n    ")
      s"""WITH w AS (SELECT doc_id, lang, string_split(text, ' ') AS ws FROM documents),
         |s AS (SELECT doc_id, lang,
         |    $scores
         |  FROM w),
         |p AS (SELECT doc_id, lang,
         |  CASE WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr AND s_de >= s_zh THEN 'de'
         |       WHEN s_en >= s_es AND s_en >= s_fr AND s_en >= s_zh THEN 'en'
         |       WHEN s_es >= s_fr AND s_es >= s_zh THEN 'es'
         |       WHEN s_fr >= s_zh THEN 'fr'
         |       ELSE 'zh' END AS lang_pred
         |FROM s)
         |SELECT lang, lang_pred, CAST(count(*) AS BIGINT) AS n,
         |  lang = lang_pred AS correct
         |FROM p GROUP BY lang, lang_pred""".stripMargin
    },

    // Kappa mirror: the argmax CTE, margin products in HUGEINT, and
    // DuckDB's floor `//` matching the engine's explicit BigInt floorDiv
    // (kappa can be negative; truncate-toward-zero would diverge).
    "langid_kappa" -> {
      val scores = TextAnalysis.LangMarkers
        .map { case (lang, ms) => s"${langScore(ms)} AS s_$lang" }.mkString(",\n    ")
      s"""WITH w AS (SELECT doc_id, lang, string_split(text, ' ') AS ws FROM documents),
         |s AS (SELECT doc_id, lang,
         |    $scores
         |  FROM w),
         |p AS (SELECT lang,
         |  CASE WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr AND s_de >= s_zh THEN 'de'
         |       WHEN s_en >= s_es AND s_en >= s_fr AND s_en >= s_zh THEN 'en'
         |       WHEN s_es >= s_fr AND s_es >= s_zh THEN 'es'
         |       WHEN s_fr >= s_zh THEN 'fr'
         |       ELSE 'zh' END AS lang_pred
         |FROM s),
         |g AS (SELECT lang AS a, lang_pred AS b, COUNT(*) AS o FROM p GROUP BY 1, 2),
         |t AS (SELECT SUM(o) AS n, SUM(CASE WHEN a = b THEN o ELSE 0 END) AS agree FROM g),
         |rm AS (SELECT a AS k, SUM(o) AS r FROM g GROUP BY 1),
         |cm AS (SELECT b AS k, SUM(o) AS c FROM g GROUP BY 1),
         |sv AS (SELECT SUM(CAST(coalesce(r, 0) AS HUGEINT) * coalesce(c, 0)) AS sm
         |       FROM rm FULL OUTER JOIN cm USING (k)),
         |x AS (SELECT n, agree, sm,
         |    1000000 * (CAST(n AS HUGEINT) * agree - sm) AS ka,
         |    CAST(n AS HUGEINT) * n - sm AS kd
         |  FROM t, sv)
         |SELECT CAST(n AS BIGINT) AS n_rows, CAST(agree AS BIGINT) AS n_agree,
         |  CAST(1000000 * agree // n AS BIGINT) AS po_micro,
         |  CAST(1000000 * sm // (CAST(n AS HUGEINT) * n) AS BIGINT) AS pe_micro,
         |  CASE WHEN kd <> 0 THEN
         |    CAST((ka - ((ka % kd + kd) % kd)) // kd AS BIGINT)
         |  END AS kappa_micro
         |FROM x""".stripMargin
    },

    // Calibration mirror: the same marker scores, argmax tie rule,
    // best/total confidence, bin clamp, and the one-division ECE.
    "langid_calibration" -> {
      val scores = TextAnalysis.LangMarkers
        .map { case (lang, ms) => s"${langScore(ms)} AS s_$lang" }.mkString(",\n    ")
      val sSum = TextAnalysis.LangMarkers.map(m => s"s_${m._1}").mkString(" + ")
      val sGreatest = TextAnalysis.LangMarkers.map(m => s"s_${m._1}").mkString("greatest(", ", ", ")")
      s"""WITH w AS (SELECT doc_id, lang, string_split(text, ' ') AS ws FROM documents),
         |s AS (SELECT doc_id, lang,
         |    $scores
         |  FROM w),
         |p AS (SELECT lang,
         |  CASE WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr AND s_de >= s_zh THEN 'de'
         |       WHEN s_en >= s_es AND s_en >= s_fr AND s_en >= s_zh THEN 'en'
         |       WHEN s_es >= s_fr AND s_es >= s_zh THEN 'es'
         |       WHEN s_fr >= s_zh THEN 'fr'
         |       ELSE 'zh' END AS lang_pred,
         |  CASE WHEN ($sSum) > 0
         |       THEN CAST($sGreatest AS BIGINT) * 1000 // ($sSum)
         |       ELSE 0 END AS conf
         |FROM s),
         |g AS (SELECT greatest(least(conf * 10 // 1000, 9), 0) AS bin,
         |    COUNT(*) AS n_rows,
         |    SUM(CASE WHEN lang_pred = lang THEN 1 ELSE 0 END) AS n_correct,
         |    SUM(conf) AS sconf
         |  FROM p GROUP BY 1),
         |e AS (SELECT CAST(SUM(ABS(CAST(n_correct AS HUGEINT) * 1000 - sconf))
         |    // SUM(n_rows) AS BIGINT) AS ece_milli FROM g)
         |SELECT CAST(bin AS BIGINT) AS bin, CAST(n_rows AS BIGINT) AS n_rows,
         |  CAST(n_correct AS BIGINT) AS n_correct,
         |  CAST(CAST(n_correct AS HUGEINT) * 1000 // n_rows AS BIGINT) AS acc_permille,
         |  CAST(sconf // n_rows AS BIGINT) AS conf_permille,
         |  (SELECT ece_milli FROM e) AS ece_milli
         |FROM g""".stripMargin
    },

    // Splice of the exact ground-truth CTE and the literal-hyperplane LSH
    // mirror, counted: recall is exactly reproducible because both sides
    // run the full algorithms.
    "lsh_recall" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |ex AS (SELECT a.vec_id AS a_id, b.vec_id AS b_id
         |       FROM e a JOIN e b ON a.vec_id < b.vec_id
         |       WHERE list_cosine_similarity(a.v, b.v) >= 0.4),
         |hp AS (SELECT * FROM (VALUES
         |${srpPlanesValues(planes = 4, dim = 64, seed = 42L, tables = 4)}
         |) AS t(t, p, pv)),
         |bits AS (SELECT e.vec_id, hp.t, hp.p,
         |    CASE WHEN list_reduce(
         |           list_transform(generate_series(1, 64), i -> v[i] * pv[i]),
         |           (a, b) -> a + b) >= 0
         |         THEN 1 << hp.p ELSE 0 END AS bit
         |  FROM e CROSS JOIN hp),
         |buck AS (SELECT vec_id, t, sum(bit) AS bucket FROM bits GROUP BY vec_id, t),
         |cand AS (SELECT DISTINCT a.vec_id AS a_id, b.vec_id AS b_id
         |         FROM buck a JOIN buck b
         |           ON a.t = b.t AND a.bucket = b.bucket AND a.vec_id < b.vec_id),
         |ls AS (SELECT a_id, b_id
         |       FROM cand JOIN e ea ON ea.vec_id = a_id JOIN e eb ON eb.vec_id = b_id
         |       WHERE list_cosine_similarity(ea.v, eb.v) >= 0.4),
         |hit AS (SELECT * FROM ex SEMI JOIN ls USING (a_id, b_id))
         |SELECT CAST((SELECT count(*) FROM ex) AS BIGINT) AS n_exact,
         |  CAST((SELECT count(*) FROM ls) AS BIGINT) AS n_lsh,
         |  CAST((SELECT count(*) FROM hit) AS BIGINT) AS n_hit,
         |  CAST((SELECT count(*) FROM hit) * 1000 //
         |       (SELECT count(*) FROM ex) AS BIGINT) AS recall_permille""".stripMargin,

    // The cosine_neardup_lsh pair mirror (literal hyperplanes) + the
    // recursive-CC survivor tail from dedup_survivors.
    "semdedup_survivors" ->
      s"""WITH RECURSIVE e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |hp AS (SELECT * FROM (VALUES
         |${srpPlanesValues(planes = 4, dim = 64, seed = 42L, tables = 4)}
         |) AS t(t, p, pv)),
         |bits AS (SELECT e.vec_id, hp.t, hp.p,
         |    CASE WHEN list_reduce(
         |           list_transform(generate_series(1, 64), i -> v[i] * pv[i]),
         |           (a, b) -> a + b) >= 0
         |         THEN 1 << hp.p ELSE 0 END AS bit
         |  FROM e CROSS JOIN hp),
         |buck AS (SELECT vec_id, t, sum(bit) AS bucket FROM bits GROUP BY vec_id, t),
         |cand AS (SELECT DISTINCT a.vec_id AS a_id, b.vec_id AS b_id
         |         FROM buck a JOIN buck b
         |           ON a.t = b.t AND a.bucket = b.bucket AND a.vec_id < b.vec_id),
         |pr AS (SELECT a_id, b_id
         |       FROM cand JOIN e ea ON ea.vec_id = a_id JOIN e eb ON eb.vec_id = b_id
         |       WHERE list_cosine_similarity(ea.v, eb.v) >= 0.4),
         |sym AS (SELECT a_id AS a, b_id AS b FROM pr UNION SELECT b_id, a_id FROM pr),
         |reach(id, r) AS (
         |  SELECT a, b FROM sym
         |  UNION
         |  SELECT reach.id, sym.b FROM reach JOIN sym ON reach.r = sym.a),
         |drops AS (SELECT id FROM (SELECT id, LEAST(id, MIN(r)) AS component
         |                          FROM reach GROUP BY id) WHERE id <> component)
         |SELECT vec_id, label FROM embeddings
         |WHERE vec_id NOT IN (SELECT id FROM drops)""".stripMargin,

    "token_stats" ->
      s"""SELECT doc_id,
         |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         |  CAST(length(text) - len(string_split(text, ' ')) + 1 AS DOUBLE) /
         |    CAST(len(string_split(text, ' ')) AS DOUBLE) AS mean_token_len,
         |  CAST(len(list_filter(string_split(text, ' '), w -> w IN $Stop)) AS BIGINT)
         |    AS n_stopwords,
         |  CAST(len(list_filter(string_split(text, ' '), w -> w IN $Stop)) AS DOUBLE) /
         |    CAST(len(string_split(text, ' ')) AS DOUBLE) AS stopword_ratio,
         |  CAST(length(text) - length(regexp_replace(text, '[.,;:!?''"()\\[\\]]', '', 'g')) AS BIGINT)
         |    AS n_punct,
         |  CAST(length(text) - length(regexp_replace(text, '[.,;:!?''"()\\[\\]]', '', 'g')) AS DOUBLE) /
         |    CAST(length(text) AS DOUBLE) AS punct_ratio,
         |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_subwords
         |FROM documents""".stripMargin,

    // Full BPE-training replay: ten merge rounds of pair census → argmax
    // → greedy application, generated CTE chain (see bpeTrainCtes).
    "bpe_train" ->
      s"""WITH ${bpeTrainCtes(10)}
         |SELECT * FROM (
         |${bpeMergesSelect(10)}
         |) ORDER BY rank""".stripMargin,

    // Encode = join against the round-10 segmentation of the vocabulary
    // (training already segmented every in-corpus word).
    "bpe_encode" ->
      s"""WITH ${bpeTrainCtes(10)}
         |SELECT doc_id, count(*) AS n_words,
         |  CAST(sum(len(syms)) AS BIGINT) AS n_tokens,
         |  CAST(sum(len(w)) AS BIGINT) AS n_chars
         |FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
         |JOIN r10 USING (w) WHERE w <> '' GROUP BY 1""".stripMargin,

    // Train replay on the even half + greedy-application replay on the
    // odd half's distinct words (bpeApplyCtes), then the per-source
    // fertility/OOV aggregate; OOV = absence from the train word table.
    "tokenizer_fertility" ->
      s"""WITH ${bpeTrainCtes(10, "(SELECT * FROM documents WHERE doc_id % 2 = 0)")},
         |${bpeApplyCtes(10,
             """SELECT DISTINCT w FROM (
               |  SELECT unnest(string_split(text, ' ')) AS w
               |  FROM documents WHERE doc_id % 2 = 1) WHERE w <> ''""".stripMargin)},
         |tok AS (SELECT source, w FROM (
         |    SELECT source, unnest(string_split(text, ' ')) AS w
         |    FROM documents WHERE doc_id % 2 = 1) WHERE w <> '')
         |SELECT source, count(*) AS n_words,
         |  CAST(sum(len(tw.syms)) AS BIGINT) AS n_tokens,
         |  CAST((sum(len(tw.syms)) * 1000) // count(*) AS BIGINT) AS fertility_milli,
         |  CAST((count(*) FILTER (wf.w IS NULL) * 1000) // count(*) AS BIGINT)
         |    AS oov_permille
         |FROM tok JOIN tw10 tw USING (w) LEFT JOIN wf ON wf.w = tok.w
         |GROUP BY source""".stripMargin,

    // KLL exact-regime mirror: INCLUSIVE quantile at rank r over n <= k
    // retained values = the sorted value at 1-based index ceil(r*n).
    "quantile_profile" ->
      """WITH s AS (SELECT source,
        |    CAST(len(string_split(text, ' ')) AS DOUBLE) AS v FROM documents),
        |r AS (SELECT source, v,
        |    row_number() OVER (PARTITION BY source ORDER BY v) AS i,
        |    count(*) OVER (PARTITION BY source) AS n FROM s)
        |SELECT source, CAST(any_value(n) AS BIGINT) AS n_rows,
        |  max(CASE WHEN i = greatest(1, CAST(ceil(0.50 * n) AS BIGINT)) THEN v END) AS q500,
        |  max(CASE WHEN i = greatest(1, CAST(ceil(0.90 * n) AS BIGINT)) THEN v END) AS q900,
        |  max(CASE WHEN i = greatest(1, CAST(ceil(0.99 * n) AS BIGINT)) THEN v END) AS q990
        |FROM r GROUP BY source""".stripMargin,

    // Coupon-exact mirror: union-minus-old = true new-distinct; permille
    // in floor integer division over non-negative longs.
    "novelty_rate" ->
      """WITH t AS (SELECT doc_id, source, unnest(string_split(text, ' ')) AS tok
        |           FROM documents),
        |tt AS (SELECT * FROM t WHERE tok <> ''),
        |b0 AS (SELECT DISTINCT source, tok FROM tt WHERE doc_id % 2 = 0),
        |b1 AS (SELECT DISTINCT source, tok FROM tt WHERE doc_id % 2 = 1)
        |SELECT b1.source,
        |  CAST(COUNT(*) AS BIGINT) AS batch_distinct,
        |  CAST(SUM(CASE WHEN b0.tok IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS new_distinct,
        |  CAST(SUM(CASE WHEN b0.tok IS NULL THEN 1 ELSE 0 END) * 1000
        |       // COUNT(*) AS BIGINT) AS novelty_permille
        |FROM b1 LEFT JOIN b0 USING (source, tok) GROUP BY 1""".stripMargin,

    // Exact-regime mirror: under the purge threshold the Misra-Gries
    // estimates ARE the counts; NO_FALSE_NEGATIVES at minCount = HAVING.
    "freq_profile" ->
      """WITH t AS (SELECT source, unnest(string_split(text, ' ')) AS item
        |           FROM documents)
        |SELECT source, item, COUNT(*) AS n FROM t
        |WHERE item <> ''
        |GROUP BY 1, 2 HAVING COUNT(*) >= 10""".stripMargin,

    // Splice of the four components' exact-regime mirrors: vocabulary =
    // vocab_cardinality's, quantiles = quantile_profile's ceil-rank order
    // statistic, top hitter = freq_profile's GROUP BY counts (top-1 by
    // count desc, item asc), drift = drift_tv's integer-exact TV over
    // 20 bins of width 10 on [0, 200).
    "corpus_health" ->
      """WITH toks AS (SELECT source, unnest(string_split(text, ' ')) AS tok
        |              FROM documents),
        |vocab AS (SELECT source, count(DISTINCT tok) AS vocab,
        |    count(*) AS n_tokens FROM toks GROUP BY source),
        |lens AS (SELECT source, doc_id,
        |    CAST(len(string_split(text, ' ')) AS DOUBLE) AS v FROM documents),
        |r AS (SELECT source, v,
        |    row_number() OVER (PARTITION BY source ORDER BY v) AS i,
        |    count(*) OVER (PARTITION BY source) AS n FROM lens),
        |quant AS (SELECT source,
        |    max(CASE WHEN i = greatest(1, CAST(ceil(0.50 * n) AS BIGINT)) THEN v END) AS len_p50,
        |    max(CASE WHEN i = greatest(1, CAST(ceil(0.99 * n) AS BIGINT)) THEN v END) AS len_p99
        |  FROM r GROUP BY source),
        |cnt AS (SELECT source, tok AS item, COUNT(*) AS n FROM toks
        |  WHERE tok <> '' GROUP BY 1, 2),
        |top1 AS (SELECT source, item AS top_token, n AS top_n FROM (
        |    SELECT source, item, n,
        |      row_number() OVER (PARTITION BY source ORDER BY n DESC, item) AS rn
        |    FROM cnt) WHERE rn = 1),
        |b AS (SELECT source,
        |    CAST(least(greatest(floor(v / 10.0), 0), 19) AS BIGINT) AS bin,
        |    ((doc_id // 20) % 2 = 1) AS cur FROM lens),
        |c AS (SELECT source, bin,
        |    SUM(CASE WHEN cur THEN 1 ELSE 0 END) AS p,
        |    SUM(CASE WHEN NOT cur THEN 1 ELSE 0 END) AS q
        |  FROM b GROUP BY 1, 2),
        |t AS (SELECT source, p, q,
        |    SUM(p) OVER (PARTITION BY source) AS np,
        |    SUM(q) OVER (PARTITION BY source) AS nq FROM c),
        |drift AS (SELECT source,
        |    CASE WHEN np > 0 AND nq > 0 THEN
        |      CAST(SUM(abs(p * nq - q * np)) AS DOUBLE) / (2.0 * np * nq)
        |    END AS len_drift_tv
        |  FROM t GROUP BY source, np, nq)
        |SELECT v.source, CAST(v.n_tokens AS BIGINT) AS n_tokens,
        |  CAST(v.vocab AS BIGINT) AS vocab,
        |  q2.len_p50, q2.len_p99, top1.top_token,
        |  CAST(top1.top_n AS BIGINT) AS top_n,
        |  CAST(top1.top_n * 1000 // v.n_tokens AS BIGINT) AS top_share_permille,
        |  drift.len_drift_tv
        |FROM vocab v JOIN quant q2 USING (source) JOIN top1 USING (source)
        |     JOIN drift USING (source)""".stripMargin,

    "quality_bucket" ->
      s"""WITH s AS (SELECT
         |    len(string_split(text, ' ')) AS n_tok,
         |    len(list_filter(string_split(text, ' '), w -> w IN $Stop)) AS n_stop
         |  FROM documents)
         |SELECT CASE WHEN n_tok < 5 THEN 'too_short'
         |            WHEN n_stop * 10 > n_tok * 8 THEN 'boilerplate'
         |            WHEN n_stop = 0 THEN 'no_stopwords'
         |            ELSE 'ok' END AS quality,
         |  COUNT(*) AS n
         |FROM s GROUP BY 1""".stripMargin,

    "redact_pii" ->
      """SELECT doc_id,
        |  regexp_replace(
        |    regexp_replace(
        |      regexp_replace(
        |        regexp_replace(
        |          text || ' user' || doc_id || '@example.com via http://site' || doc_id
        |               || '.org/x call +1-555-' || (doc_id + 1000000)
        |               || ' from 10.0.' || (doc_id % 256) || '.7 then done',
        |          'https?://[^ ]+', '<URL>', 'g'),
        |        '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |      '\+\d{1,3}-\d{3}-\d{3,10}', '<PHONE>', 'g'),
        |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g') AS clean
        |FROM documents""".stripMargin,

    // Same exact-integer lift: HUGEINT products mirror decimal(38,0),
    // floor integral division over non-negatives equals Spark's div.
    "collocations" ->
      """WITH w AS (SELECT string_split(text, ' ') AS ws FROM documents),
        |tok AS (SELECT unnest(ws) AS tok FROM w),
        |uni AS (SELECT tok, COUNT(*) AS c FROM tok WHERE tok <> '' GROUP BY 1),
        |tots AS (SELECT SUM(c) AS n FROM uni),
        |big AS (SELECT unnest([struct_pack(a := ws[i], b := ws[i+1])
        |                      for i in range(1, len(ws))]) AS p FROM w),
        |bi AS (SELECT p.a AS a, p.b AS b, COUNT(*) AS c_ab FROM big
        |       WHERE p.a <> '' AND p.b <> '' GROUP BY 1, 2),
        |mt AS (SELECT SUM(c_ab) AS m FROM bi)
        |SELECT bi.a, bi.b, bi.c_ab,
        |  CAST((CAST(bi.c_ab AS HUGEINT) * tots.n * tots.n * 1000)
        |       // (CAST(mt.m AS HUGEINT) * ua.c * ub.c) AS BIGINT)
        |    AS lift_permille
        |FROM bi
        |JOIN uni ua ON ua.tok = bi.a
        |JOIN uni ub ON ub.tok = bi.b
        |CROSS JOIN tots CROSS JOIN mt
        |WHERE bi.c_ab >= 5""".stripMargin,

    // Full-algorithm mirror: Graph.pageRankSql unrolls the same 8
    // fixed-point iterations as chained CTEs — identical integer
    // truncation points give bit-identical ranks.
    "pagerank" ->
      (Graph.pageRankSql(
        """SELECT user_id AS src,
          |  1000000 + CAST(json_extract(props, '$.k') AS BIGINT) AS dst
          |FROM events
          |UNION
          |SELECT 1000000 + CAST(json_extract(props, '$.k') AS BIGINT),
          |  user_id
          |FROM events""".stripMargin, iterations = 8) +
        "\nORDER BY rank DESC, node LIMIT 50"),

    "trustrank" ->
      (Graph.trustRankSql(
        """SELECT user_id AS src,
          |  1000000 + CAST(json_extract(props, '$.k') AS BIGINT) AS dst
          |FROM events
          |UNION
          |SELECT 1000000 + CAST(json_extract(props, '$.k') AS BIGINT),
          |  user_id
          |FROM events""".stripMargin,
        "SELECT user_id AS node FROM events WHERE user_id < 10",
        iterations = 8) +
        "\nORDER BY rank DESC, node LIMIT 50"),

    // Mirrors TextAnalysis.surprisal exactly: per-token floor(log2(N // c))
    // = length(bin(N // c)) - 1 (pure integers — the quantization is what
    // makes the score engine-portable); per-doc mean in millibits/token.
    "surprisal_score" ->
      """WITH tok AS (
        |  SELECT doc_id, t FROM (
        |    SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents)
        |  WHERE t <> ''),
        |vocab AS (SELECT t, COUNT(*) AS c FROM tok GROUP BY t),
        |tot AS (SELECT COUNT(*) AS n FROM tok)
        |SELECT doc_id, COUNT(*) AS n_tok,
        |  CAST((SUM(length(bin(n // c)) - 1) * 1000) // COUNT(*) AS BIGINT)
        |    AS surprisal_milli
        |FROM tok JOIN vocab USING (t) CROSS JOIN tot
        |GROUP BY doc_id""".stripMargin,

    // Mirrors TextAnalysis.bigramSurprisal: zipped adjacent-pair unnest,
    // bigram + left-context counts, bits = length(bin(c_a // c_ab)) - 1.
    "bigram_surprisal" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |bg AS (SELECT doc_id, unnest(ws[1:len(ws)-1]) AS a,
        |         unnest(ws[2:len(ws)]) AS b
        |       FROM w WHERE len(ws) >= 2),
        |b2 AS (SELECT doc_id, a, b FROM bg WHERE a <> '' AND b <> ''),
        |model AS (SELECT a, b, count(*) AS c_ab FROM b2 GROUP BY 1, 2),
        |lc AS (SELECT a, CAST(sum(c_ab) AS BIGINT) AS c_a FROM model GROUP BY 1)
        |SELECT doc_id, count(*) AS n_bigrams,
        |  CAST((sum(length(bin(c_a // c_ab)) - 1) * 1000) // count(*) AS BIGINT)
        |    AS surprisal2_milli
        |FROM b2 JOIN model USING (a, b) JOIN lc USING (a)
        |GROUP BY doc_id""".stripMargin,

    // Full stupid-backoff mirror: even-half models (parallel-unnest
    // zipped bigrams, filtered tokens), odd-half scoring with the
    // prepend-NULL trick giving each token its left context (NULL at doc
    // start -> no backoff penalty), bits via length(bin(..))-1. All
    // sums non-negative, so the one division carries no convention risk.
    "stupid_backoff" ->
      """WITH w AS (SELECT doc_id,
        |    list_filter(string_split(text, ' '), x -> x <> '') AS ws
        |  FROM documents),
        |ttok AS (SELECT unnest(ws) AS t FROM w WHERE doc_id % 2 = 0),
        |uni AS (SELECT t, COUNT(*) AS c_w FROM ttok GROUP BY t),
        |nr AS (SELECT COUNT(*) AS n FROM ttok),
        |tbg AS (SELECT unnest(ws[1:len(ws)-1]) AS a, unnest(ws[2:len(ws)]) AS b
        |        FROM w WHERE doc_id % 2 = 0 AND len(ws) >= 2),
        |model AS (SELECT a, b, COUNT(*) AS c_ab FROM tbg GROUP BY 1, 2),
        |lc AS (SELECT a, CAST(SUM(c_ab) AS BIGINT) AS c_a FROM model GROUP BY 1),
        |st AS (SELECT doc_id,
        |    unnest(list_prepend(CAST(NULL AS VARCHAR), ws[1:len(ws)-1])) AS a,
        |    unnest(ws) AS b
        |  FROM w WHERE doc_id % 2 = 1 AND len(ws) >= 1),
        |bits AS (SELECT doc_id,
        |    CASE WHEN m.c_ab IS NOT NULL
        |         THEN length(bin(lc.c_a // m.c_ab)) - 1
        |         ELSE (CASE WHEN st.a IS NULL THEN 0 ELSE 2 END)
        |              + length(bin((nr.n + 1) // (COALESCE(u.c_w, 0) + 1))) - 1
        |    END AS bits
        |  FROM st
        |  LEFT JOIN uni u ON st.b = u.t
        |  LEFT JOIN model m ON st.a = m.a AND st.b = m.b
        |  LEFT JOIN lc ON st.a = lc.a
        |  CROSS JOIN nr)
        |SELECT doc_id, COUNT(*) AS n_tok,
        |  CAST(SUM(bits) * 1000 // COUNT(*) AS BIGINT) AS backoff_milli
        |FROM bits GROUP BY doc_id""".stripMargin,

    // Semantics-only mirror (deliberately naive all-pairs — the blocked
    // FastSS candidate generation is what the Spark side adds; both must
    // produce the identical verified pair set). maxLen=64 filter mirrored.
    "editdist_pairs" ->
      """WITH d AS (SELECT DISTINCT p_name FROM part
        |           WHERE p_name IS NOT NULL AND length(p_name) <= 64)
        |SELECT a.p_name AS a_name, b.p_name AS b_name,
        |  CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
        |FROM d a JOIN d b ON a.p_name < b.p_name
        |WHERE levenshtein(a.p_name, b.p_name) <= 2""".stripMargin,

    // Naive-pairs + recursive-CC mirror of the composed ER pipeline;
    // singleton names canonicalize to themselves via the left join.
    "entity_canonical" ->
      """WITH RECURSIVE d AS (SELECT DISTINCT p_name FROM part
        |  WHERE p_name IS NOT NULL AND length(p_name) <= 64),
        |p AS (SELECT a.p_name AS a, b.p_name AS b
        |      FROM d a JOIN d b ON a.p_name < b.p_name
        |      WHERE levenshtein(a.p_name, b.p_name) <= 2),
        |sym AS (SELECT a, b FROM p UNION SELECT b, a FROM p),
        |reach(id, r) AS (
        |  SELECT a, b FROM sym
        |  UNION
        |  SELECT reach.id, sym.b FROM reach JOIN sym ON reach.r = sym.a),
        |comp AS (SELECT id, LEAST(id, MIN(r)) AS component FROM reach GROUP BY id)
        |SELECT d.p_name AS name, coalesce(c.component, d.p_name) AS canonical
        |FROM d LEFT JOIN comp c ON d.p_name = c.id""".stripMargin,

    "top_terms" ->
      """SELECT term, COUNT(*) AS df FROM (
        |  SELECT unnest(list_distinct(string_split(text, ' '))) AS term
        |  FROM documents)
        |WHERE term <> ''
        |GROUP BY term ORDER BY df DESC, term LIMIT 20""".stripMargin,

    "line_clean" ->
      """WITH l AS (SELECT doc_id, string_split(text, chr(10)) AS lines FROM documents),
        |k AS (SELECT doc_id, lines,
        |        list_filter(lines, x ->
        |          len(string_split(trim(x), ' ')) >= 30
        |          AND NOT contains(lower(trim(x)), 'customer')) AS kept
        |      FROM l)
        |SELECT doc_id,
        |  CAST(len(lines) AS BIGINT) AS n_lines,
        |  CAST(len(kept) AS BIGINT) AS n_kept,
        |  coalesce(array_to_string(kept, chr(10)), '') AS text_clean
        |FROM k""".stripMargin,

    // Full mirror of the native one-pass expression: word and adjacent-
    // bigram count maps as unnest+GROUP BY; ratios use // (floor div) to
    // match Spark's `div` on the same non-negative integers.
    "repetition_stats" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |wc AS (SELECT doc_id, word, COUNT(*) AS c
        |       FROM (SELECT doc_id, unnest(ws) AS word FROM w) GROUP BY 1, 2),
        |wa AS (SELECT doc_id, COUNT(*) AS n_distinct_words,
        |              MAX(c) AS top_word_count FROM wc GROUP BY 1),
        |bc AS (SELECT doc_id, b, COUNT(*) AS c
        |       FROM (SELECT doc_id,
        |               unnest([ws[i] || ' ' || ws[i+1] for i in range(1, len(ws))]) AS b
        |             FROM w) GROUP BY 1, 2),
        |ba AS (SELECT doc_id, COUNT(*) AS n_distinct_bigrams,
        |              MAX(c) AS top_bigram_count FROM bc GROUP BY 1)
        |SELECT w.doc_id,
        |  CAST(len(ws) AS BIGINT) AS n_words,
        |  CAST(wa.n_distinct_words AS BIGINT) AS n_distinct_words,
        |  CAST(wa.top_word_count AS BIGINT) AS top_word_count,
        |  CAST(greatest(len(ws) - 1, 0) AS BIGINT) AS n_bigrams,
        |  CAST(COALESCE(ba.n_distinct_bigrams, 0) AS BIGINT) AS n_distinct_bigrams,
        |  CAST(COALESCE(ba.top_bigram_count, 0) AS BIGINT) AS top_bigram_count,
        |  CAST((len(ws) - wa.n_distinct_words) * 1000 // len(ws) AS BIGINT)
        |    AS dup_word_permille,
        |  CAST(CASE WHEN len(ws) <= 1 THEN 0
        |            ELSE COALESCE(ba.top_bigram_count, 0) * 1000 // (len(ws) - 1)
        |       END AS BIGINT) AS top_bigram_permille
        |FROM w JOIN wa USING (doc_id) LEFT JOIN ba USING (doc_id)""".stripMargin,

    "bm25_topk" ->
      """WITH q(query_id, term) AS (VALUES
        |  (1, 'dup'), (1, 'merge'), (1, 'scan'),
        |  (2, 'dup'), (2, 'spark'),
        |  (3, 'window'), (3, 'column')),
        |tok AS (SELECT doc_id, t AS term FROM (
        |    SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents)
        |  WHERE t <> ''),
        |dl AS (SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY 1),
        |scal AS (SELECT COUNT(*) AS n, (1000 * SUM(dl)) // COUNT(*) AS a FROM dl),
        |tf AS (SELECT doc_id, term, COUNT(*) AS tf
        |       FROM tok JOIN (SELECT DISTINCT term FROM q) qt USING (term)
        |       GROUP BY 1, 2),
        |dfq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
        |sc AS (SELECT query_id, doc_id,
        |         (length(bin(n // df)) - 1) *
        |         ((1000 * 44 * tf * a) // (20 * tf * a + 6 * a + 18000 * dl)) AS s
        |       FROM q JOIN tf USING (term) JOIN dfq USING (term)
        |         JOIN dl USING (doc_id) CROSS JOIN scal),
        |agg AS (SELECT query_id, doc_id, SUM(s) AS score FROM sc
        |        GROUP BY 1, 2 HAVING SUM(s) > 0),
        |r AS (SELECT query_id, doc_id, score,
        |        ROW_NUMBER() OVER (PARTITION BY query_id
        |          ORDER BY score DESC, doc_id) AS rn
        |      FROM agg)
        |SELECT CAST(query_id AS BIGINT) AS query_id, doc_id,
        |  CAST(score AS BIGINT) AS score_milli
        |FROM r WHERE rn <= 5""".stripMargin,

    // Full mirror of both retrieval legs (bm25_topk's CTE chain at k=20,
    // cosine_topk's at k=20 over queries 1-3) + the integer RRF combine.
    "hybrid_rrf" ->
      """WITH q(query_id, term) AS (VALUES
        |  (1, 'dup'), (1, 'merge'), (1, 'scan'),
        |  (2, 'dup'), (2, 'spark'),
        |  (3, 'window'), (3, 'column')),
        |tok AS (SELECT doc_id, t AS term FROM (
        |    SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents)
        |  WHERE t <> ''),
        |dl AS (SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY 1),
        |scal AS (SELECT COUNT(*) AS n, (1000 * SUM(dl)) // COUNT(*) AS a FROM dl),
        |tf AS (SELECT doc_id, term, COUNT(*) AS tf
        |       FROM tok JOIN (SELECT DISTINCT term FROM q) qt USING (term)
        |       GROUP BY 1, 2),
        |dfq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
        |sc AS (SELECT query_id, doc_id,
        |         (length(bin(n // df)) - 1) *
        |         ((1000 * 44 * tf * a) // (20 * tf * a + 6 * a + 18000 * dl)) AS s
        |       FROM q JOIN tf USING (term) JOIN dfq USING (term)
        |         JOIN dl USING (doc_id) CROSS JOIN scal),
        |agg AS (SELECT query_id, doc_id, SUM(s) AS score FROM sc
        |        GROUP BY 1, 2 HAVING SUM(s) > 0),
        |bm AS (SELECT CAST(query_id AS BIGINT) AS query_id, doc_id,
        |         ROW_NUMBER() OVER (PARTITION BY query_id
        |           ORDER BY score DESC, doc_id) AS rank_bm25
        |       FROM agg
        |       QUALIFY ROW_NUMBER() OVER (PARTITION BY query_id
        |         ORDER BY score DESC, doc_id) <= 20),
        |qv AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS v
        |       FROM embeddings WHERE vec_id IN (1, 2, 3)),
        |cv AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS v
        |       FROM embeddings),
        |cs AS (SELECT query_id, neighbor_id,
        |         list_cosine_similarity(qv.v, cv.v) AS cos
        |       FROM qv, cv WHERE query_id <> neighbor_id),
        |an AS (SELECT query_id, neighbor_id AS doc_id,
        |         ROW_NUMBER() OVER (PARTITION BY query_id
        |           ORDER BY cos DESC, neighbor_id) AS rank_ann
        |       FROM cs
        |       QUALIFY ROW_NUMBER() OVER (PARTITION BY query_id
        |         ORDER BY cos DESC, neighbor_id) <= 20),
        |f AS (SELECT COALESCE(bm.query_id, an.query_id) AS query_id,
        |        COALESCE(bm.doc_id, an.doc_id) AS doc_id,
        |        rank_bm25, rank_ann
        |      FROM bm FULL OUTER JOIN an
        |        ON bm.query_id = an.query_id AND bm.doc_id = an.doc_id),
        |r AS (SELECT query_id, doc_id, rank_bm25, rank_ann,
        |        COALESCE(1000000 // (60 + rank_bm25), 0) +
        |        COALESCE(1000000 // (60 + rank_ann), 0) AS rrf
        |      FROM f)
        |SELECT query_id, doc_id, CAST(rank_bm25 AS BIGINT) AS rank_bm25,
        |  CAST(rank_ann AS BIGINT) AS rank_ann, CAST(rrf AS BIGINT) AS rrf_micro
        |FROM r
        |QUALIFY ROW_NUMBER() OVER (PARTITION BY query_id
        |  ORDER BY rrf DESC, doc_id) <= 10""".stripMargin,

    "tfidf_topk" ->
      """WITH tf AS (
        |  SELECT doc_id, term, COUNT(*) AS tf
        |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term
        |        FROM documents)
        |  WHERE term <> '' GROUP BY 1, 2),
        |dfq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
        |r AS (SELECT tf.doc_id, tf.term, tf.tf, dfq.df,
        |        ROW_NUMBER() OVER (PARTITION BY tf.doc_id
        |          ORDER BY tf.tf DESC, dfq.df ASC, tf.term ASC) AS rn
        |      FROM tf JOIN dfq USING (term))
        |SELECT doc_id, term, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df
        |FROM r WHERE rn <= 3""".stripMargin,

    // Same md5-hex threshold literals the Spark predicate uses
    // (Sampling.hexThreshold), so membership matches bit-for-bit.
    "stratified_sample" ->
      s"""SELECT doc_id, source FROM documents
         |WHERE substr(md5(CAST(doc_id AS VARCHAR) || ':graft'), 1, 8) <
         |  CASE source
         |    WHEN 'src0' THEN '${graft.operators.Sampling.hexThreshold(0.05)}'
         |    WHEN 'src1' THEN '${graft.operators.Sampling.hexThreshold(0.9)}'
         |    WHEN 'src2' THEN '${graft.operators.Sampling.hexThreshold(0.5)}'
         |    ELSE '${graft.operators.Sampling.hexThreshold(0.25)}' END""".stripMargin,

    "fluency_score" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |bg AS (SELECT doc_id,
        |    unnest(list_distinct([ws[i] || ' ' || ws[i+1] for i in range(1, len(ws))])) AS b
        |  FROM w),
        |vocab AS (SELECT b FROM (SELECT b, COUNT(*) AS df FROM bg GROUP BY 1)
        |          ORDER BY df DESC, b LIMIT 500),
        |fam AS (SELECT doc_id, COUNT(*) AS n_familiar
        |        FROM bg JOIN vocab USING (b) GROUP BY 1),
        |base AS (SELECT doc_id,
        |    len(list_distinct([ws[i] || ' ' || ws[i+1] for i in range(1, len(ws))]))
        |      AS n_bigrams_distinct
        |  FROM w)
        |SELECT base.doc_id,
        |  CAST(n_bigrams_distinct AS BIGINT) AS n_bigrams_distinct,
        |  CAST(COALESCE(n_familiar, 0) AS BIGINT) AS n_familiar,
        |  CAST(CASE WHEN n_bigrams_distinct = 0 THEN 0
        |            ELSE COALESCE(n_familiar, 0) * 1000 // n_bigrams_distinct
        |       END AS BIGINT) AS familiar_permille
        |FROM base LEFT JOIN fam USING (doc_id)""".stripMargin,

    "sample_k_per_key" ->
      """SELECT doc_id, source FROM (
        |  SELECT doc_id, source, ROW_NUMBER() OVER (PARTITION BY source
        |    ORDER BY md5(CAST(doc_id AS VARCHAR) || ':graft'), doc_id) AS rn
        |  FROM documents) WHERE rn <= 5""".stripMargin,

    // Same literal-hyperplane mirror as cosine_neardup_lsh, restricted to
    // corpus-vs-benchmark candidates with per-pair table dedup.
    "decon_semantic" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |hp AS (SELECT * FROM (VALUES
         |${srpPlanesValues(planes = 4, dim = 64, seed = 42L, tables = 4)}
         |) AS t(t, p, pv)),
         |bits AS (SELECT e.vec_id, hp.t, hp.p,
         |    CASE WHEN list_reduce(
         |           list_transform(generate_series(1, 64), i -> v[i] * pv[i]),
         |           (a, b) -> a + b) >= 0
         |         THEN 1 << hp.p ELSE 0 END AS bit
         |  FROM e CROSS JOIN hp),
         |buck AS (SELECT vec_id, t, sum(bit) AS bucket FROM bits GROUP BY vec_id, t),
         |bench AS (SELECT vec_id AS bid, t, bucket FROM buck WHERE vec_id < 20),
         |cand AS (SELECT DISTINCT c.vec_id AS id, b.bid
         |         FROM buck c JOIN bench b
         |           ON c.t = b.t AND c.bucket = b.bucket AND c.vec_id <> b.bid),
         |sc AS (SELECT id, bid, list_cosine_similarity(ec.v, eb.v) AS cos
         |       FROM cand JOIN e ec ON ec.vec_id = id JOIN e eb ON eb.vec_id = bid
         |       WHERE list_cosine_similarity(ec.v, eb.v) >= 0.4)
         |SELECT id AS vec_id, max(cos) AS max_cos, count(*) AS n_bench
         |FROM sc GROUP BY 1""".stripMargin,

    "pack_sequences" ->
      """WITH t AS (SELECT source, doc_id,
        |    len(string_split(text, ' ')) AS tok FROM documents),
        |c AS (SELECT source, doc_id, tok,
        |    SUM(tok) OVER (PARTITION BY source ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM t)
        |SELECT source, CAST((cum - tok) // 512 AS BIGINT) AS bin,
        |  COUNT(*) AS n_docs, CAST(SUM(tok) AS BIGINT) AS total_tokens
        |FROM c GROUP BY 1, 2""".stripMargin,

    // Signatures, Hamming candidate ranks, and both tiebreaks mirrored
    // exactly (sign bits packed into two 32-bit halves in BIGINTs).
    "ann_binary" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |sig AS (SELECT vec_id,
        |    list_sum([CASE WHEN v[i+1] >= 0 THEN CAST(1 AS BIGINT) << (i % 32) ELSE 0 END
        |              for i in range(0, 32)]) AS lo,
        |    list_sum([CASE WHEN v[i+1] >= 0 THEN CAST(1 AS BIGINT) << (i % 32) ELSE 0 END
        |              for i in range(32, 64)]) AS hi
        |  FROM e),
        |q AS (SELECT vec_id AS query_id, lo AS ql, hi AS qh FROM sig WHERE vec_id < 20),
        |h AS (SELECT query_id, s.vec_id AS neighbor_id,
        |    bit_count(xor(s.lo, ql)) + bit_count(xor(s.hi, qh)) AS ham
        |  FROM sig s, q WHERE s.vec_id <> query_id),
        |cand AS (SELECT query_id, neighbor_id FROM h
        |  QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY ham, neighbor_id) <= 100),
        |s2 AS (SELECT query_id, neighbor_id,
        |    list_cosine_similarity(eq.v, ec.v) AS cos
        |  FROM cand JOIN e eq ON eq.vec_id = query_id
        |            JOIN e ec ON ec.vec_id = neighbor_id)
        |SELECT query_id,
        |  CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS BIGINT)
        |    AS rank,
        |  neighbor_id, cos
        |FROM s2
        |QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) <= 5""".stripMargin,

    // ann_binary's Hamming-prefilter mirror at the TIGHT candidate budget
    // (30), spliced with the exact brute-force ranking into the recall
    // combinator — same shape as lsh_recall's splice-of-mirrors.
    // Full-algorithm PQ mirror (see Pq.pqRecallSql): list_distance
    // assignment with ties to the lower codeword, list_inner_product ADC
    // summed in subspace order — the expressions' exact computation.
    "pq_recall" ->
      Pq.pqRecallSql(m = 8, dsub = 8, ksub = 16, nQueries = 20,
        candidates = 30, k = 5),

    "binary_recall" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |sig AS (SELECT vec_id,
        |    list_sum([CASE WHEN v[i+1] >= 0 THEN CAST(1 AS BIGINT) << (i % 32) ELSE 0 END
        |              for i in range(0, 32)]) AS lo,
        |    list_sum([CASE WHEN v[i+1] >= 0 THEN CAST(1 AS BIGINT) << (i % 32) ELSE 0 END
        |              for i in range(32, 64)]) AS hi
        |  FROM e),
        |q AS (SELECT vec_id AS query_id, lo AS ql, hi AS qh FROM sig WHERE vec_id < 20),
        |h AS (SELECT query_id, s.vec_id AS neighbor_id,
        |    bit_count(xor(s.lo, ql)) + bit_count(xor(s.hi, qh)) AS ham
        |  FROM sig s, q WHERE s.vec_id <> query_id),
        |cand AS (SELECT query_id, neighbor_id FROM h
        |  QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY ham, neighbor_id) <= 30),
        |ap AS (SELECT query_id, neighbor_id FROM (
        |    SELECT c.query_id, c.neighbor_id,
        |      row_number() OVER (PARTITION BY c.query_id
        |        ORDER BY list_cosine_similarity(eq.v, ec.v) DESC, c.neighbor_id) AS rn
        |    FROM cand c JOIN e eq ON eq.vec_id = c.query_id
        |                JOIN e ec ON ec.vec_id = c.neighbor_id) WHERE rn <= 5),
        |qv AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 20),
        |ex AS (SELECT query_id, neighbor_id FROM (
        |    SELECT q2.query_id, e2.vec_id AS neighbor_id,
        |      row_number() OVER (PARTITION BY q2.query_id
        |        ORDER BY list_cosine_similarity(q2.qv, e2.v) DESC, e2.vec_id) AS rn
        |    FROM qv q2, e e2 WHERE e2.vec_id <> q2.query_id) WHERE rn <= 5)
        |SELECT (SELECT count(*) FROM ex) AS n_exact,
        |  (SELECT count(*) FROM ap) AS n_approx,
        |  (SELECT count(*) FROM ex JOIN ap USING (query_id, neighbor_id)) AS n_hit,
        |  CAST((SELECT count(*) FROM ex JOIN ap USING (query_id, neighbor_id)) * 1000
        |       // (SELECT count(*) FROM ex) AS BIGINT) AS recall_permille""".stripMargin,

    "source_overlap" ->
      s"""WITH w AS (SELECT doc_id, source, string_split(text, ' ') AS ws FROM documents),
        |sh AS (SELECT source, doc_id,
        |         list_distinct([array_to_string(ws[i:i+2], ' ') for i in range(1, len(ws) - 1)]) AS sh
        |       FROM w),
        |ex AS (SELECT source, unnest(sh) AS shingle FROM sh),
        |${sqlMix64Ctes("eh", "ex", "shingle", "source")},
        |d AS (SELECT DISTINCT source, sh64 FROM eh),
        |p AS (SELECT a.source AS sa, b.source AS sb
        |      FROM d a JOIN d b ON a.sh64 = b.sh64 AND a.source < b.source)
        |SELECT sa AS source_a, sb AS source_b,
        |  count(*) AS n_shared_shingles
        |FROM p GROUP BY 1, 2""".stripMargin,

    "source_diversity" ->
      s"""WITH w AS (SELECT doc_id, source, string_split(text, ' ') AS ws FROM documents),
        |sh AS (SELECT source, doc_id,
        |         list_distinct([array_to_string(ws[i:i+2], ' ') for i in range(1, len(ws) - 1)]) AS sh
        |       FROM w),
        |ex AS (SELECT source, doc_id, unnest(sh) AS shingle FROM sh),
        |${sqlMix64Ctes("e", "ex", "shingle", "source, doc_id")}
        |SELECT source,
        |  CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
        |  CAST(count(*) AS BIGINT) AS n_shingles,
        |  CAST(count(DISTINCT sh64) AS BIGINT) AS n_distinct_shingles,
        |  CAST(count(DISTINCT sh64) * 1000 // count(*) AS BIGINT) AS ttr_permille
        |FROM e GROUP BY 1""".stripMargin,

    // The bottom-256 sample is deterministic (same Knuth ranks), so the
    // oracle rebuilds the identical sample and nearest-rank positions.
    "bottomk_quantiles" ->
      """WITH s AS (SELECT doc_id AS id, len(string_split(text, ' ')) AS v,
        |    (((doc_id % 4294967296 + 42) % 4294967296 % 65536) * 2654435761
        |     + (((doc_id % 4294967296 + 42) % 4294967296 // 65536) * 2654435761 % 65536) * 65536)
        |    % 4294967296 AS rank
        |  FROM documents ORDER BY rank, id LIMIT 256),
        |r AS (SELECT v, row_number() OVER (ORDER BY v, id) AS i,
        |             count(*) OVER () AS cnt FROM s)
        |SELECT
        |  CAST(max(CASE WHEN i = 1 + (10 * (cnt - 1)) // 100 THEN v END) AS BIGINT) AS p10,
        |  CAST(max(CASE WHEN i = 1 + (50 * (cnt - 1)) // 100 THEN v END) AS BIGINT) AS p50,
        |  CAST(max(CASE WHEN i = 1 + (90 * (cnt - 1)) // 100 THEN v END) AS BIGINT) AS p90
        |FROM r""".stripMargin,

    // Same seeded Knuth rank; threshold in exact integer // arithmetic.
    "weighted_sample" ->
      """WITH m AS (SELECT doc_id,
        |    least(len(string_split(text, ' ')), 1000) AS w FROM documents),
        |t AS (SELECT SUM(w) AS totalW FROM m WHERE w > 0)
        |SELECT doc_id, CAST(w AS BIGINT) AS weight FROM m, t
        |WHERE w > 0 AND
        |  (((doc_id % 4294967296 + 42) % 4294967296 % 65536) * 2654435761
        |   + (((doc_id % 4294967296 + 42) % 4294967296 // 65536) * 2654435761 % 65536) * 65536)
        |  % 4294967296 < (100 * 4294967296 * w) // totalW""".stripMargin,

    "quantile_filter" ->
      """WITH m AS (SELECT doc_id, len(string_split(text, ' ')) AS n_tokens FROM documents),
        |c AS (SELECT n_tokens, count(*) AS c FROM m GROUP BY 1),
        |cu AS (SELECT n_tokens, SUM(c) OVER (ORDER BY n_tokens
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM c),
        |t AS (SELECT min(n_tokens) AS thr FROM cu
        |      WHERE cum * 10 >= (SELECT count(*) FROM m) * 1)
        |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens
        |FROM m, t WHERE m.n_tokens >= t.thr""".stripMargin,

    "json_props" ->
      """SELECT CAST(json_extract(props, '$.k') AS BIGINT) // 10 AS k_decade,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1""".stripMargin,

    "q3_shipping_priority" ->
      """SELECT l_orderkey,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |           * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue,
        |  strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate
        |FROM customer
        |JOIN orders ON o_custkey = c_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-07-01'
        |  AND l_shipdate > TIMESTAMP '1998-07-01'
        |GROUP BY l_orderkey, o_orderdate
        |ORDER BY SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |             * (1 - CAST(l_discount AS DECIMAL(12,2)))) DESC, l_orderkey
        |LIMIT 10""".stripMargin,

    "q13_order_histogram" ->
      """WITH pc AS (SELECT c_custkey, COUNT(o_orderkey) AS c_count
        |  FROM customer LEFT OUTER JOIN orders ON o_custkey = c_custkey
        |  GROUP BY c_custkey)
        |SELECT CAST(c_count AS BIGINT) AS c_count,
        |  CAST(COUNT(*) AS BIGINT) AS custdist
        |FROM pc GROUP BY c_count""".stripMargin,

    "q4_priority_exists" ->
      """SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1996-04-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey
        |                AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
        |GROUP BY o_orderpriority""".stripMargin,

    "q7_nation_volume" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |  CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS l_year,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |           * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |WHERE n1.n_name IN ('NATION_1', 'NATION_2')
        |  AND n2.n_name IN ('NATION_1', 'NATION_2')
        |  AND n1.n_name <> n2.n_name
        |GROUP BY 1, 2, 3""".stripMargin,

    "q8_market_share" ->
      """WITH amer AS (SELECT c_custkey FROM customer
        |    JOIN nation ON c_nationkey = n_nationkey
        |    JOIN region ON n_regionkey = r_regionkey
        |    WHERE r_name = 'AMERICA'),
        |l AS (SELECT EXTRACT(year FROM o_orderdate) AS o_year,
        |    CAST(l_extendedprice AS DECIMAL(18,2))
        |      * (1 - CAST(l_discount AS DECIMAL(12,2))) AS rev,
        |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) *
        |      (100 - CAST(CAST(l_discount AS DECIMAL(12,2)) * 100 AS BIGINT)) AS rev_e4,
        |    n_name AS supp_nation
        |  FROM lineitem
        |  JOIN part ON l_partkey = p_partkey
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  WHERE p_type = 'STANDARD'
        |    AND o_orderdate >= TIMESTAMP '1995-01-01'
        |    AND o_orderdate < TIMESTAMP '1997-01-01'
        |    AND o_custkey IN (SELECT c_custkey FROM amer))
        |SELECT CAST(o_year AS BIGINT) AS o_year,
        |  CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN rev ELSE 0 END)
        |    AS DOUBLE) AS nation_revenue,
        |  CAST(SUM(rev) AS DOUBLE) AS total_revenue,
        |  CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN rev_e4 ELSE 0 END)
        |    * 1000 // SUM(rev_e4) AS BIGINT) AS mkt_share_permille
        |FROM l GROUP BY 1""".stripMargin,

    "q10_returned_items" ->
      """SELECT c_custkey, c_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |           * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue,
        |  c_acctbal, n_name
        |FROM orders
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1996-04-01'
        |  AND l_returnflag = 'R'
        |GROUP BY c_custkey, c_name, c_acctbal, n_name
        |ORDER BY SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |             * (1 - CAST(l_discount AS DECIMAL(12,2)))) DESC, c_custkey
        |LIMIT 20""".stripMargin,

    "q18_big_orders" ->
      """WITH big AS (
        |  SELECT l_orderkey, SUM(CAST(l_quantity AS BIGINT)) AS sum_qty
        |  FROM lineitem GROUP BY 1
        |  HAVING SUM(CAST(l_quantity AS BIGINT)) > 300)
        |SELECT c_name, c_custkey, o_orderkey,
        |  strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
        |  o_totalprice, CAST(sum_qty AS BIGINT) AS sum_qty
        |FROM customer
        |JOIN orders ON o_custkey = c_custkey
        |JOIN big ON o_orderkey = l_orderkey""".stripMargin,

    "q14_promo_revenue" ->
      """WITH l AS (SELECT *,
        |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) *
        |      (100 - CAST(CAST(l_discount AS DECIMAL(12,2)) * 100 AS BIGINT)) AS rev_e4,
        |    CAST(l_extendedprice AS DECIMAL(18,2)) *
        |      (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2))) AS rev
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00')
        |SELECT
        |  CAST(SUM(CASE WHEN p_type = 'ECONOMY' THEN rev ELSE 0 END) AS DOUBLE) AS promo_revenue,
        |  CAST(SUM(rev) AS DOUBLE) AS total_revenue,
        |  CAST(SUM(CASE WHEN p_type = 'ECONOMY' THEN rev_e4 ELSE 0 END) * 1000
        |       // SUM(rev_e4) AS BIGINT) AS promo_permille
        |FROM l""".stripMargin,

    "q6_forecast_revenue" ->
      """SELECT
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |           CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_lines
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        |  AND CAST(l_discount AS DECIMAL(12,2)) BETWEEN 0.05 AND 0.07
        |  AND CAST(l_quantity AS BIGINT) < 24""".stripMargin,

    "q15_top_supplier" ->
      """WITH rev AS (SELECT l_suppkey,
        |    SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |        (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2))))
        |      AS total_rev
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
        |  GROUP BY 1)
        |SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_revenue
        |FROM supplier JOIN rev ON s_suppkey = l_suppkey
        |WHERE total_rev = (SELECT MAX(total_rev) FROM rev)""".stripMargin,

    // The same integer-exact threshold twin (5·qty·count < sum), so the
    // per-line decision mirrors bit for bit.
    "q17_small_qty_revenue" ->
      """WITH bp AS (SELECT p_partkey FROM part WHERE p_brand = 'Brand#13'),
        |li AS (SELECT l.* FROM lineitem l JOIN bp ON l_partkey = p_partkey),
        |pp AS (SELECT l_partkey AS pk, SUM(CAST(l_quantity AS BIGINT)) AS sq,
        |         COUNT(*) AS cq FROM li GROUP BY 1)
        |SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        |    AS small_rev,
        |  COUNT(*) AS n_lines
        |FROM li JOIN pp ON l_partkey = pk
        |WHERE CAST(l_quantity AS BIGINT) * 5 * cq < sq""".stripMargin,

    "q19_discounted_revenue" ->
      """SELECT
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |       (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2))))
        |    AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_lines
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
        |       AND CAST(l_quantity AS BIGINT) BETWEEN 1 AND 11)
        |   OR (p_brand = 'Brand#10' AND p_size BETWEEN 1 AND 25
        |       AND CAST(l_quantity AS BIGINT) BETWEEN 10 AND 20)
        |   OR (p_brand = 'Brand#20' AND p_size BETWEEN 1 AND 35
        |       AND CAST(l_quantity AS BIGINT) BETWEEN 20 AND 30)""".stripMargin,

    // Deliberately the textbook CORRELATED form — the engine's
    // aggregate decorrelation is checked against an independent
    // formulation, not a mirror of itself.
    "q21_waiting_supplier" ->
      """SELECT s_name, COUNT(*) AS numwait
        |FROM lineitem l1
        |  JOIN orders ON o_orderkey = l1.l_orderkey AND o_orderstatus = 'F'
        |  JOIN supplier ON s_suppkey = l1.l_suppkey
        |WHERE l1.l_returnflag = 'R'
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey
        |                    AND l3.l_returnflag = 'R')
        |GROUP BY s_name""".stripMargin,

    // Correlated NOT EXISTS + the cross-multiplied exact average
    // threshold (bal·n_pos > sum_pos in cents).
    "q22_dormant_customers" ->
      """WITH cust AS (SELECT * FROM customer
        |    WHERE c_nationkey IN (1, 3, 5, 7, 9)),
        |pos AS (SELECT
        |    SUM(CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)) AS spc,
        |    COUNT(*) AS np
        |  FROM cust WHERE c_acctbal > 0)
        |SELECT c_nationkey AS cntry, COUNT(*) AS numcust,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
        |FROM cust, pos
        |WHERE CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) * np > spc
        |  AND NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey
        |                    AND o_orderpriority = '1-URGENT')
        |GROUP BY 1""".stripMargin,

    "q5_local_supplier" ->
      """SELECT n_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |           (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE)
        |    AS revenue
        |FROM region
        |  JOIN nation ON n_regionkey = r_regionkey
        |  JOIN customer ON c_nationkey = n_nationkey
        |  JOIN orders ON o_custkey = c_custkey
        |  JOIN lineitem ON l_orderkey = o_orderkey
        |  JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY n_name""".stripMargin,

    // Same static term expansion, generated by the library itself.
    "zorder_key" -> {
      val terms = operators.Layout.zorderKeySql(Seq("u16", "e16"), 16)
      s"""WITH m AS (SELECT event_id,
         |    event_id % 65536 AS e16_raw, user_id % 65536 AS u16
         |  FROM events),
         |n AS (SELECT event_id, u16, e16_raw AS e16 FROM m)
         |SELECT event_id, CAST(u16 AS BIGINT) AS u16, CAST(e16 AS BIGINT) AS e16,
         |  CAST($terms AS BIGINT) AS z
         |FROM n""".stripMargin
    },

    // Same clamp-bin + exact-integer TV arithmetic; the one double is a
    // single division of exact integers, rounded identically everywhere.
    "drift_tv" ->
      """WITH b AS (SELECT event_type,
        |    CAST(least(greatest(floor((value - 0.0) / 25.0), 0), 19) AS BIGINT) AS bin,
        |    (ts >= TIMESTAMP '2024-01-16') AS cur
        |  FROM events WHERE value IS NOT NULL),
        |c AS (SELECT event_type, bin,
        |    SUM(CASE WHEN cur THEN 1 ELSE 0 END) AS p,
        |    SUM(CASE WHEN NOT cur THEN 1 ELSE 0 END) AS q
        |  FROM b GROUP BY 1, 2),
        |t AS (SELECT event_type, p, q,
        |    SUM(p) OVER (PARTITION BY event_type) AS np,
        |    SUM(q) OVER (PARTITION BY event_type) AS nq
        |  FROM c)
        |SELECT event_type, CAST(np AS BIGINT) AS n_cur, CAST(nq AS BIGINT) AS n_ref,
        |  CASE WHEN np > 0 AND nq > 0 THEN
        |    CAST(SUM(abs(p * nq - q * np)) AS DOUBLE) / (2.0 * np * nq)
        |  END AS tv
        |FROM t GROUP BY event_type, np, nq""".stripMargin,

    "data_quality" ->
      """WITH m AS (SELECT
        |    CASE WHEN len(text) = 0 THEN 1 ELSE 0 END AS empty_text,
        |    CASE WHEN n_chars < 200 THEN 1 ELSE 0 END AS short_text,
        |    CASE WHEN n_chars <> len(text) THEN 1 ELSE 0 END AS chars_mismatch,
        |    CASE WHEN lang NOT IN ('en', 'de', 'fr', 'es') THEN 1 ELSE 0 END AS unknown_lang
        |  FROM documents)
        |SELECT 'empty_text' AS rule, CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(sum(empty_text) AS BIGINT) AS n_violations,
        |  CAST(sum(empty_text) * 1000 // count(*) AS BIGINT) AS violation_permille FROM m
        |UNION ALL SELECT 'short_text', CAST(count(*) AS BIGINT),
        |  CAST(sum(short_text) AS BIGINT),
        |  CAST(sum(short_text) * 1000 // count(*) AS BIGINT) FROM m
        |UNION ALL SELECT 'chars_mismatch', CAST(count(*) AS BIGINT),
        |  CAST(sum(chars_mismatch) AS BIGINT),
        |  CAST(sum(chars_mismatch) * 1000 // count(*) AS BIGINT) FROM m
        |UNION ALL SELECT 'unknown_lang', CAST(count(*) AS BIGINT),
        |  CAST(sum(unknown_lang) AS BIGINT),
        |  CAST(sum(unknown_lang) * 1000 // count(*) AS BIGINT) FROM m""".stripMargin,

    "quantile_filter_by_source" ->
      """WITH m AS (SELECT doc_id, source, len(string_split(text, ' ')) AS n_tokens FROM documents),
        |c AS (SELECT source, n_tokens, count(*) AS c FROM m GROUP BY 1, 2),
        |cu AS (SELECT source, n_tokens,
        |         SUM(c) OVER (PARTITION BY source ORDER BY n_tokens
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |         SUM(c) OVER (PARTITION BY source) AS n FROM c),
        |t AS (SELECT source, min(n_tokens) AS thr FROM cu
        |      WHERE cum * 4 >= n * 1 GROUP BY source)
        |SELECT m.doc_id, m.source, CAST(m.n_tokens AS BIGINT) AS n_tokens
        |FROM m JOIN t USING (source) WHERE m.n_tokens >= t.thr""".stripMargin,

    // Budgets are integer literals (⌊w·2000⌋ precomputed) so the oracle
    // never touches a float; rank = the same seeded Knuth-hash form.
    "mix_sources" ->
      """WITH b AS (SELECT * FROM (VALUES ('src0', 1000), ('src1', 600),
        |                                 ('src2', 400)) AS t(source, budget)),
        |r AS (SELECT doc_id, source, len(string_split(text, ' ')) AS tok,
        |    (((doc_id % 4294967296 + 42) % 4294967296 % 65536) * 2654435761
        |     + (((doc_id % 4294967296 + 42) % 4294967296 // 65536) * 2654435761 % 65536) * 65536)
        |    % 4294967296 AS rank
        |  FROM documents),
        |c AS (SELECT r.doc_id, r.source, r.tok, b.budget,
        |    SUM(tok) OVER (PARTITION BY r.source ORDER BY rank, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - tok AS strt
        |  FROM r JOIN b USING (source))
        |SELECT doc_id, source, CAST(tok AS BIGINT) AS tokens,
        |  CAST(strt AS BIGINT) AS tok_start
        |FROM c WHERE strt < budget""".stripMargin,

    // Two pool mirrors keyed by corpus half, truncating // centroids
    // (DuckDB // and Spark div both truncate toward zero), per-dim
    // |difference| folded to L1 and max.
    "centroid_drift" ->
      """WITH e AS (SELECT vec_id % 2 AS side, label,
        |    list_transform(CAST(embedding AS DOUBLE[]),
        |      x -> CAST(round(x * 1048576) AS BIGINT)) AS q
        |  FROM embeddings),
        |n AS (SELECT side, label, count(*) AS n_vecs FROM e GROUP BY side, label),
        |u AS (SELECT side, label, unnest(range(1, len(q) + 1)) AS pos,
        |        unnest(q) AS v FROM e),
        |s AS (SELECT side, label, pos, CAST(sum(v) AS BIGINT) AS sv
        |      FROM u GROUP BY side, label, pos),
        |c AS (SELECT s.side, s.label, s.pos, sv // n_vecs AS cv
        |      FROM s JOIN n USING (side, label)),
        |d AS (SELECT a.label, abs(a.cv - b.cv) AS ad
        |      FROM c a JOIN c b ON a.label = b.label AND a.pos = b.pos
        |      WHERE a.side = 0 AND b.side = 1)
        |SELECT d.label, na.n_vecs AS a_n, nb.n_vecs AS b_n,
        |  CAST(SUM(ad) AS BIGINT) AS drift_l1,
        |  CAST(MAX(ad) AS BIGINT) AS drift_max
        |FROM d JOIN n na ON na.label = d.label AND na.side = 0
        |       JOIN n nb ON nb.label = d.label AND nb.side = 1
        |GROUP BY d.label, na.n_vecs, nb.n_vecs""".stripMargin,

    "dsir_scores" -> dsirScoresSql,

    // The same pipeline ranked + limited: deterministic (score, id) order.
    "dsir_select" ->
      s"""SELECT * FROM ($dsirScoresSql)
         |ORDER BY dsir_bits DESC, doc_id LIMIT 50""".stripMargin,

    // Same overflow-free Knuth-hash form as cap_per_key, seed folded in.
    "global_shuffle" ->
      """WITH r AS (SELECT doc_id,
        |    (((doc_id % 4294967296 + 42) % 4294967296 % 65536) * 2654435761
        |     + (((doc_id % 4294967296 + 42) % 4294967296 // 65536) * 2654435761 % 65536) * 65536)
        |    % 4294967296 AS rank
        |  FROM documents)
        |SELECT doc_id, CAST(rank % 8 AS INT) AS shard,
        |  CAST(row_number() OVER (PARTITION BY rank % 8 ORDER BY rank, doc_id)
        |       AS BIGINT) AS pos
        |FROM r""".stripMargin,

    "lang_id" -> {
      val scores = TextAnalysis.LangMarkers
        .map { case (lang, ms) => s"${langScore(ms)} AS s_$lang" }.mkString(",\n    ")
      // First language (list order de,en,es,fr,zh) >= all later ones ==
      // the running strict-max argmax the Spark reduce computes.
      s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
         |s AS (SELECT doc_id,
         |    $scores
         |  FROM w)
         |SELECT doc_id,
         |  CASE WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr AND s_de >= s_zh THEN 'de'
         |       WHEN s_en >= s_es AND s_en >= s_fr AND s_en >= s_zh THEN 'en'
         |       WHEN s_es >= s_fr AND s_es >= s_zh THEN 'es'
         |       WHEN s_fr >= s_zh THEN 'fr'
         |       ELSE 'zh' END AS lang_pred
         |FROM s""".stripMargin
    },

    "fingerprint" ->
      s"""SELECT doc_id,
         |  list_reduce(
         |    list_transform(string_split(text, ' '),
         |      w -> list_reduce([CAST(ascii(w[i:i]) AS BIGINT) for i in range(1, len(w) + 1)],
         |                       (acc, c) -> (acc * 31 + c) % ${TextAnalysis.FingerprintMod})),
         |    (acc, wv) -> (acc * 131 + wv) % ${TextAnalysis.FingerprintMod}) AS fingerprint
         |FROM documents""".stripMargin,

    // encode(text) mirrors Spark's string->binary cast (UTF-8 bytes);
    // text payloads can never carry a media magic number, so format is
    // the sniffer's CASE over the byte prefix (ASCII magics expressible
    // on text; PNG/JPEG magic bytes are not valid UTF-8 prefixes).
    "multimodal_features" ->
      """SELECT doc_id AS media_id,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  CAST(CASE WHEN strlen(text) = 0 THEN 0
        |            ELSE ascii(text[1:1]) END AS INTEGER) AS first_byte,
        |  CASE WHEN text LIKE 'GIF8%' THEN 'gif'
        |       WHEN text LIKE 'RIFF%' AND text[9:4] = 'WAVE' THEN 'wav'
        |       WHEN text[5:4] = 'ftyp' THEN 'mp4'
        |       ELSE 'unknown' END AS format
        |FROM documents""".stripMargin,

    // Closed form of the media_format_sniff generator: payload format is
    // chosen by id % 4 (PNG / WAV / MP4 / GIF) and the Spark side must
    // recover it from REAL encoded bytes.
    "media_format_sniff" ->
      """SELECT doc_id AS media_id,
        |  CASE doc_id % 4 WHEN 0 THEN 'png' WHEN 1 THEN 'wav'
        |       WHEN 2 THEN 'mp4' ELSE 'gif' END AS format
        |FROM documents""".stripMargin,

    // Closed forms of Multimodal.generatePng's fixture geometry: the Spark
    // side gets these numbers from a REAL ImageIO decode + pixel scan.
    "image_features" ->
      """SELECT doc_id AS media_id,
        |  CAST(1 + doc_id % 16 AS INTEGER) AS width,
        |  CAST(1 + (doc_id // 16) % 16 AS INTEGER) AS height,
        |  CAST((1 + (doc_id // 16) % 16)
        |       * ((1 + doc_id % 16) * (doc_id % 240)
        |          + ((1 + doc_id % 16) * (doc_id % 16)) // 2) AS BIGINT) AS sum_r,
        |  CAST((1 + doc_id % 16) * (1 + (doc_id // 16) % 16)
        |       * (doc_id % 256) AS BIGINT) AS sum_g,
        |  CAST((1 + doc_id % 16) * (1 + (doc_id // 16) % 16)
        |       * ((doc_id * 7) % 256) AS BIGINT) AS sum_b
        |FROM documents""".stripMargin,

    // Closed forms of Multimodal.generateWav: n = 8 + id%64 samples at
    // 8000 + (id%4)*4000 Hz, sample i = ((id*31 + i*17) % 2001) - 1000.
    "audio_features" ->
      """SELECT doc_id AS media_id,
        |  CAST(8000 + (doc_id % 4) * 4000 AS INTEGER) AS sample_rate,
        |  CAST(1 AS INTEGER) AS channels,
        |  CAST(8 + doc_id % 64 AS BIGINT) AS n_samples,
        |  CAST((8 + doc_id % 64) * 1000
        |       // (8000 + (doc_id % 4) * 4000) AS BIGINT) AS duration_ms,
        |  CAST(list_max([abs(((doc_id * 31 + i * 17) % 2001) - 1000)
        |                 for i in range(8 + doc_id % 64)]) AS INTEGER) AS peak,
        |  CAST(list_sum([((doc_id * 31 + i * 17) % 2001) - 1000
        |                 for i in range(8 + doc_id % 64)]) AS BIGINT) AS sum_samples
        |FROM documents""".stripMargin,

    "video_metadata" ->
      """WITH p AS (SELECT doc_id,
        |    600 + (doc_id % 5) * 100 AS timescale,
        |    600 + doc_id % 1000 AS duration,
        |    1 + doc_id % 3 AS n_tracks
        |  FROM documents)
        |SELECT doc_id AS media_id,
        |  CAST(timescale AS INTEGER) AS timescale,
        |  CAST(duration * 1000 // timescale AS BIGINT) AS duration_ms,
        |  CAST(n_tracks AS INTEGER) AS n_tracks,
        |  CAST((n_tracks + 1) // 2 AS INTEGER) AS n_video,
        |  CAST(n_tracks // 2 AS INTEGER) AS n_audio,
        |  CAST(160 * (2 * ((n_tracks - 1) // 2) + 1) + doc_id % 16
        |       AS INTEGER) AS max_width,
        |  CAST(90 * (2 * ((n_tracks - 1) // 2) + 1) + doc_id % 9
        |       AS INTEGER) AS max_height
        |FROM p""".stripMargin,

    // Closed forms of Multimodal.generateGif: w = 2 + id%8,
    // h = 2 + (id//8)%8, 2 + id%4 frames, frame f solid color
    // (5id+11f, 3id+7f, 13id+17f) % 256 with delay 2 + (id+3f) % 10 cs.
    "gif_frames" ->
      """WITH f AS (SELECT doc_id, unnest(range(2 + doc_id % 4)) AS fi
        |           FROM documents)
        |SELECT doc_id AS media_id,
        |  CAST(fi AS INTEGER) AS frame_idx,
        |  CAST(2 + doc_id % 8 AS INTEGER) AS width,
        |  CAST(2 + (doc_id // 8) % 8 AS INTEGER) AS height,
        |  CAST(2 + (doc_id + 3 * fi) % 10 AS INTEGER) AS delay_cs,
        |  CAST((2 + doc_id % 8) * (2 + (doc_id // 8) % 8)
        |       * ((doc_id * 5 + fi * 11) % 256) AS BIGINT) AS sum_r,
        |  CAST((2 + doc_id % 8) * (2 + (doc_id // 8) % 8)
        |       * ((doc_id * 3 + fi * 7) % 256) AS BIGINT) AS sum_g,
        |  CAST((2 + doc_id % 8) * (2 + (doc_id // 8) % 8)
        |       * ((doc_id * 13 + fi * 17) % 256) AS BIGINT) AS sum_b
        |FROM f""".stripMargin,

    // Segment = running count of PRIOR conversions; the conversion ends
    // its segment, touch credits by row_number within (user, seg).
    "attribution" ->
      """WITH e AS (SELECT user_id, ts, event_id, event_type,
        |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS c
        |  FROM events),
        |s AS (SELECT *, COALESCE(SUM(c) OVER (
        |    PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS seg
        |  FROM e),
        |conv AS (SELECT user_id, seg, ts AS conv_ts, event_id AS conv_id
        |         FROM s WHERE c = 1),
        |tch AS (SELECT user_id, seg, event_type, event_id,
        |    ROW_NUMBER() OVER (PARTITION BY user_id, seg
        |      ORDER BY ts, event_id) AS ra,
        |    ROW_NUMBER() OVER (PARTITION BY user_id, seg
        |      ORDER BY ts DESC, event_id DESC) AS rd,
        |    COUNT(*) OVER (PARTITION BY user_id, seg) AS nt
        |  FROM s WHERE c = 0),
        |f AS (SELECT user_id, seg, event_type AS first_type,
        |        event_id AS first_id, nt FROM tch WHERE ra = 1),
        |l AS (SELECT user_id, seg, event_type AS last_type,
        |        event_id AS last_id FROM tch WHERE rd = 1)
        |SELECT conv.user_id, conv_ts, conv_id, first_type, first_id,
        |  last_type, last_id, CAST(COALESCE(nt, 0) AS BIGINT) AS n_touches
        |FROM conv LEFT JOIN f USING (user_id, seg)
        |          LEFT JOIN l USING (user_id, seg)""".stripMargin,

    // Unrolled 8-round waterfill: each round caps every open source
    // whose proportional share R*w // W covers its availability; open
    // rows carry alloc NULL until capped; final split over what's left.
    "mixture_alloc" -> {
      val (budget, rounds) = (20000L, 8)
      val values = (0 until 20)
        .map(i => s"('src$i', ${(i % 7) + 1})").mkString(", ")
      val peel = (1 to rounds).map { r =>
        val p = s"s${r - 1}"
        s"""s$r AS MATERIALIZED (SELECT key, avail, w,
           |  CASE WHEN alloc IS NOT NULL THEN alloc
           |       WHEN w > 0
           |        AND (SELECT COALESCE(SUM(w), 0) FROM $p
           |             WHERE alloc IS NULL AND w > 0) > 0
           |        AND ((CAST($budget AS HUGEINT)
           |              - (SELECT COALESCE(SUM(alloc), 0) FROM $p
           |                 WHERE alloc IS NOT NULL)) * w)
           |            // (SELECT SUM(w) FROM $p WHERE alloc IS NULL AND w > 0)
           |            >= avail
           |       THEN avail ELSE NULL END AS alloc
           |  FROM $p)""".stripMargin
      }.mkString(",\n")
      s"""WITH stats AS MATERIALIZED (SELECT source AS key,
         |    SUM(length(string_split(text, ' '))) AS avail
         |  FROM documents GROUP BY 1),
         |wt(key, w) AS (VALUES $values),
         |s0 AS MATERIALIZED (SELECT key, avail, w,
         |  CAST(NULL AS BIGINT) AS alloc FROM stats JOIN wt USING (key)),
         |$peel,
         |fin AS (SELECT
         |    COALESCE(SUM(CASE WHEN alloc IS NULL AND w > 0 THEN w END), 0)
         |      AS wfin,
         |    $budget - COALESCE(SUM(alloc), 0) AS rfin
         |  FROM s$rounds)
         |SELECT key, CAST(avail AS BIGINT) AS avail,
         |  CAST(w AS BIGINT) AS weight,
         |  CAST(CASE WHEN alloc IS NOT NULL THEN alloc
         |       WHEN w = 0 OR wfin = 0 THEN 0
         |       ELSE LEAST((CAST(rfin AS HUGEINT) * w) // wfin, avail)
         |       END AS BIGINT) AS allocated,
         |  alloc IS NOT NULL AS capped
         |FROM s$rounds CROSS JOIN fin""".stripMargin
    },

    // Closed-form mirror from syntheticTrackedUrl's id arithmetic —
    // every alias class maps to its expected canonical (the
    // domain_census posture: URL parsing happens only engine-side).
    "url_canonical" ->
      """SELECT doc_id,
        |  'https://site' || CAST(doc_id % 97 AS VARCHAR) || '.com' ||
        |  CASE WHEN doc_id % 5 = 1 THEN ':8080' ELSE '' END ||
        |  CASE WHEN doc_id % 9 = 0 THEN '/'
        |       ELSE '/p/' || CAST(doc_id AS VARCHAR) END ||
        |  CASE WHEN doc_id % 4 = 0 THEN '?a=1&b=2'
        |       WHEN doc_id % 4 = 2 THEN '?y=8&z=9' ELSE '' END AS url_canon
        |FROM documents""".stripMargin,

    // Both alias twins of a gid collapse to one canonical — closed form.
    "url_dup_census" ->
      """SELECT 'https://site' || CAST((doc_id // 2) % 97 AS VARCHAR) ||
        |    '.com/p/' || CAST(doc_id // 2 AS VARCHAR) AS url_canon,
        |  count(*) AS n_aliases, min(doc_id) AS first_doc
        |FROM documents GROUP BY 1""".stripMargin,

    // Closed-form visible text of the synthetic page: title + h1
    // (entity-decoded) + paragraph, whitespace-collapsed like the
    // engine's final normalization.
    "html_strip" ->
      """WITH v AS (SELECT doc_id,
        |    trim(regexp_replace(
        |      'Doc ' || CAST(doc_id AS VARCHAR) || ' Source & ' ||
        |        source || ' ' || text,
        |      '\s+', ' ', 'g')) AS text_vis
        |  FROM documents)
        |SELECT doc_id, text_vis,
        |  CAST(length(text_vis) AS BIGINT) AS n_chars_vis FROM v""".stripMargin,

    // Each doc contributes its .com self-link and the tracked .org
    // link's registrable domain — closed form.
    "html_links" ->
      """WITH l AS (
        |  SELECT 'site' || CAST(doc_id % 97 AS VARCHAR) || '.com' AS domain
        |  FROM documents
        |  UNION ALL
        |  SELECT 'site' || CAST((doc_id + 1) % 97 AS VARCHAR) || '.org'
        |  FROM documents)
        |SELECT domain, count(*) AS n_links FROM l GROUP BY 1""".stripMargin,

    // Full-algorithm mirror: the engine's portable 64-bit line hash
    // recomputed in SQL (sqlMix64Ctes), first occurrence by
    // (doc_id, pos) per hash, blank lines exempt, positional re-join.
    "line_dedup" ->
      s"""WITH d AS (SELECT doc_id,
        |    'src: ' || source || chr(10) || text || chr(10) || 'lang: ' || lang AS page
        |  FROM documents),
        |w AS (SELECT doc_id, string_split(page, chr(10)) AS ls FROM d),
        |l AS (SELECT doc_id, unnest(range(1, len(ls) + 1)) AS pos, unnest(ls) AS line FROM w),
        |nb AS (SELECT doc_id, pos, line FROM l WHERE trim(line) <> ''),
        |${sqlMix64Ctes("lh", "nb", "line", "doc_id, pos, line")},
        |rw AS (SELECT doc_id, pos, line,
        |        row_number() OVER (PARTITION BY sh64 ORDER BY doc_id, pos) AS rn
        |      FROM lh),
        |kept AS (SELECT doc_id, pos, line FROM l WHERE trim(line) = ''
        |         UNION ALL
        |         SELECT doc_id, pos, line FROM rw WHERE rn = 1),
        |k AS (SELECT doc_id, count(*) AS n_kept,
        |        string_agg(line, chr(10) ORDER BY pos) AS text_clean
        |      FROM kept GROUP BY doc_id)
        |SELECT w.doc_id, CAST(len(w.ls) AS BIGINT) AS n_lines,
        |  coalesce(k.n_kept, 0) AS n_kept, coalesce(k.text_clean, '') AS text_clean
        |FROM w LEFT JOIN k USING (doc_id)""".stripMargin,

    // Full unrolled mirror of the synchronous LPA rounds (the pagerank
    // posture): per round a (node, label) count + row_number argmax with
    // the engine's exact tie-break.
    "communities" -> {
      val edgesSql =
        """SELECT user_id AS u,
          |  1000000 + CAST(json_extract(props, '$.k') AS BIGINT) AS v
          |FROM events""".stripMargin
      s"""WITH ${graft.operators.Graph.labelPropagationSql(edgesSql, rounds = 5)}
         |SELECT node, CAST(label AS BIGINT) AS label FROM lp5""".stripMargin
    },

    // Full unrolled mirror of the BFS hop rounds (the pagerank/LPA
    // posture).
    "bfs_layers" -> {
      val edgesSql =
        """SELECT user_id AS u,
          |  1000000 + CAST(json_extract(props, '$.k') AS BIGINT) AS v
          |FROM events""".stripMargin
      s"""WITH ${graft.operators.Graph.bfsLayersSql(edgesSql,
            Seq(1L, 2L, 3L, 4L, 5L), maxHops = 3)}
         |SELECT node, hops FROM bfs3""".stripMargin
    },

    // Full mirror: same candidate regex, the SAME Luhn fold as a SQL
    // list comprehension, sorted-distinct replace order.
    "card_redact" ->
      """WITH t AS (SELECT doc_id,
        |    'order 41111111111111' ||
        |      lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0') ||
        |      ' paid 4242424242424242 ref 123456789012 ' || text AS txt
        |  FROM documents),
        |c AS (SELECT doc_id, txt,
        |    regexp_extract_all(txt, '\b\d{13,19}\b') AS cands FROM t),
        |x AS (SELECT doc_id, unnest(cands) AS cand FROM c),
        |lv AS (SELECT doc_id, cand FROM x WHERE
        |  list_sum([CASE WHEN i % 2 = 0 THEN
        |      CASE WHEN 2 * CAST(reverse(cand)[i:i] AS BIGINT) > 9
        |           THEN 2 * CAST(reverse(cand)[i:i] AS BIGINT) - 9
        |           ELSE 2 * CAST(reverse(cand)[i:i] AS BIGINT) END
        |      ELSE CAST(reverse(cand)[i:i] AS BIGINT) END
        |    for i in range(1, len(cand) + 1)]) % 10 = 0),
        |a AS (SELECT doc_id, list(DISTINCT cand ORDER BY cand) AS vc
        |      FROM lv GROUP BY doc_id)
        |SELECT t.doc_id, CASE WHEN a.vc IS NULL THEN t.txt
        |  ELSE list_reduce(list_prepend(t.txt, a.vc),
        |         (acc, x) -> replace(acc, x, '<CARD>')) END AS text_red
        |FROM t LEFT JOIN a USING (doc_id)""".stripMargin,

    // Full mirror: same tokenization, sentence-ender and vowel-group
    // regexes, same integer truncation points.
    "readability" ->
      """WITH t AS (SELECT doc_id,
        |    text || '. End of doc ' || CAST(doc_id AS VARCHAR) || '? Yes!'
        |      AS page
        |  FROM documents),
        |w AS (SELECT doc_id, page,
        |    [x for x in string_split(page, ' ') if x <> ''] AS ws FROM t),
        |m AS (SELECT doc_id,
        |    CAST(len(ws) AS BIGINT) AS n_words,
        |    CAST(greatest(1, len(regexp_extract_all(page, '[.!?]+'))) AS BIGINT)
        |      AS n_sentences,
        |    CAST(coalesce(list_sum([greatest(1,
        |        len(regexp_extract_all(lower(x), '[aeiouy]+'))) for x in ws]), 0)
        |      AS BIGINT) AS n_syllables
        |  FROM w)
        |SELECT doc_id, n_words, n_sentences, n_syllables,
        |  CAST(CASE WHEN n_words > 0 THEN 206835000
        |      - (1015000 * n_words) // n_sentences
        |      - (84600000 * n_syllables) // n_words END AS BIGINT)
        |    AS flesch_micro
        |FROM m""".stripMargin,

    // Weight recomputed from the source NAME (substr → index → (i%5)+1)
    // instead of the engine's weights map; Σw = 60 from the same map.
    "epoch_budget" ->
      """WITH s AS (SELECT source AS key,
        |    CAST(SUM(len([x for x in string_split(text, ' ') if x <> '']))
        |      AS BIGINT) AS avail
        |  FROM documents GROUP BY 1),
        |w AS (SELECT key, avail,
        |    CAST(CAST(substr(key, 4) AS BIGINT) % 5 + 1 AS BIGINT) AS weight,
        |    (CAST(1000000 AS HUGEINT) *
        |     (CAST(substr(key, 4) AS BIGINT) % 5 + 1)) // 60 AS a
        |  FROM s)
        |SELECT key, avail, weight, CAST(a AS BIGINT) AS allocated,
        |  CAST(CASE WHEN avail > 0
        |    THEN CAST(1000000 AS HUGEINT) * a // avail ELSE 0 END AS BIGINT)
        |    AS repeat_micro,
        |  CAST(CASE WHEN avail > 0
        |    THEN (a + avail - 1) // avail ELSE 0 END AS BIGINT) AS n_epochs
        |FROM w""".stripMargin,

    // Same (value, id) total order, same integer-floor bucket formula.
    "quality_deciles" ->
      """WITH r AS (SELECT doc_id,
        |    ROW_NUMBER() OVER (ORDER BY n_chars, doc_id) AS rank,
        |    COUNT(*) OVER () AS n
        |  FROM documents)
        |SELECT doc_id, rank,
        |  CAST((rank - 1) * 10 // n + 1 AS BIGINT) AS bucket
        |FROM r""".stripMargin,

    // The rankBuckets mirror composed with the knuthRank closed form
    // (the global_shuffle mirror, seed 7) and the same sharded window.
    "curriculum_order" ->
      """WITH b AS (SELECT doc_id,
        |    ROW_NUMBER() OVER (ORDER BY n_chars, doc_id) AS rk,
        |    COUNT(*) OVER () AS n
        |  FROM documents),
        |r AS (SELECT doc_id,
        |    CAST((rk - 1) * 10 // n + 1 AS BIGINT) AS bucket,
        |    (((doc_id % 4294967296 + 7) % 4294967296 % 65536) * 2654435761
        |     + (((doc_id % 4294967296 + 7) % 4294967296 // 65536)
        |        * 2654435761 % 65536) * 65536)
        |    % 4294967296 AS rank
        |  FROM b)
        |SELECT doc_id, bucket, CAST(rank % 8 AS INT) AS shard,
        |  CAST(row_number() OVER (PARTITION BY rank % 8
        |         ORDER BY bucket, rank, doc_id) AS BIGINT) AS pos
        |FROM r""".stripMargin,

    // Exact census mirror: group-count, share, deterministic top-20.
    "skew_census" ->
      """WITH c AS (SELECT user_id AS key, COUNT(*) AS n
        |           FROM events GROUP BY 1),
        |t AS (SELECT COUNT(*) AS tt FROM events)
        |SELECT key, n, CAST(1000 * n // tt AS BIGINT) AS permille
        |FROM c, t ORDER BY n DESC, key LIMIT 20""".stripMargin,

    // Full mirror from the SAME lexicon definition (generated VALUES
    // clause): unnest-join-sum, row_number argmax with the engine's
    // exact (score DESC, topic ASC) tie-break, "other"/0 via left join.
    "topic_classify" -> {
      val vals = GraftLexicon
        .map { case (t, p, w) => s"('$t', '$p', $w)" }.mkString(", ")
      s"""WITH lex(term, topic, w) AS (VALUES $vals),
         |t AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
         |      FROM documents),
         |sc AS (SELECT doc_id, topic, SUM(w) AS score
         |       FROM t JOIN lex USING (term) WHERE term <> '' GROUP BY 1, 2),
         |b AS (SELECT doc_id, topic, score, row_number() OVER (
         |        PARTITION BY doc_id ORDER BY score DESC, topic) AS rn
         |      FROM sc)
         |SELECT d.doc_id, coalesce(b.topic, 'other') AS topic,
         |  CAST(coalesce(b.score, 0) AS BIGINT) AS score_micro
         |FROM documents d
         |LEFT JOIN (SELECT * FROM b WHERE rn = 1) b USING (doc_id)""".stripMargin
    },

    // Closed-form mirror: the registrable domain follows directly from
    // the synthetic construction — scheme/port/path/subdomain parsing
    // happens only on the engine side.
    "domain_census" ->
      """WITH u AS (SELECT doc_id, n_chars,
        |    'site' || CAST(doc_id % 97 AS VARCHAR) || '.' ||
        |    CASE doc_id % 4 WHEN 0 THEN 'com' WHEN 1 THEN 'org'
        |         WHEN 2 THEN 'io' ELSE 'co.uk' END AS dom
        |  FROM documents)
        |SELECT dom AS domain, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(n_chars) AS BIGINT) AS total_chars
        |FROM u GROUP BY 1""".stripMargin,

    // Closed-form domain from the construction (the domain_census
    // posture), same exact-micro mean and join-back.
    "domain_prior" ->
      """WITH u AS (SELECT doc_id,
        |    CAST(len([y for y in string_split(text, ' ') if y <> ''])
        |      AS BIGINT) AS m,
        |    'site' || CAST(doc_id % 97 AS VARCHAR) || '.' ||
        |    CASE doc_id % 4 WHEN 0 THEN 'com' WHEN 1 THEN 'org'
        |         WHEN 2 THEN 'io' ELSE 'co.uk' END AS domain
        |  FROM documents),
        |p AS (SELECT domain, CAST(COUNT(*) AS BIGINT) AS n_docs_domain,
        |    CAST(CASE WHEN COUNT(m) > 0
        |      THEN CAST(1000000 AS HUGEINT) * SUM(m) // COUNT(m)
        |      ELSE 0 END AS BIGINT) AS prior_micro
        |  FROM u GROUP BY 1)
        |SELECT u.doc_id, u.domain, p.n_docs_domain, p.prior_micro
        |FROM u JOIN p ON u.domain = p.domain""".stripMargin,

    // Same (term, week) counts + consecutive-week lag + bounded top-20.
    "trending_terms" ->
      """WITH tw AS (SELECT t, w, COUNT(*) AS n FROM (
        |    SELECT doc_id // 250 AS w,
        |           unnest(string_split(text, ' ')) AS t FROM documents)
        |  WHERE t <> '' GROUP BY 1, 2),
        |l AS (SELECT t, w, n,
        |    lag(n) OVER (PARTITION BY t ORDER BY w) AS pn,
        |    lag(w) OVER (PARTITION BY t ORDER BY w) AS pw
        |  FROM tw)
        |SELECT t AS term, CAST(w AS BIGINT) AS week, n,
        |  pn AS n_prev, CAST(1000 * n // pn AS BIGINT) AS ratio_permille
        |FROM l WHERE pw = w - 1 AND pn >= 5
        |ORDER BY ratio_permille DESC, t, w LIMIT 20""".stripMargin,

    // list_filter IN mirror of the CountInSet scan.
    "blocklist_hits" ->
      """WITH d AS (SELECT source,
        |    len(list_filter(string_split(text, ' '),
        |        w -> w IN ('slow', 'crash', 'leak'))) AS h
        |  FROM documents)
        |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(CASE WHEN h > 0 THEN 1 ELSE 0 END) AS BIGINT) AS flagged,
        |  CAST(SUM(h) AS BIGINT) AS total_hits,
        |  CAST((1000 * SUM(CASE WHEN h > 0 THEN 1 ELSE 0 END)) // COUNT(*)
        |    AS BIGINT) AS flagged_permille
        |FROM d GROUP BY 1""".stripMargin,

    // sessionize's island CTE carrying event_type; per-session DISTINCT
    // presence; lift over the session total.
    "basket_lift" ->
      """WITH g AS (SELECT user_id, ts, event_type,
        |    CASE WHEN epoch(ts) - epoch(lag(ts) OVER w) > 1800
        |         THEN 1 ELSE 0 END AS ns
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |s AS (SELECT user_id, event_type,
        |    1 + SUM(ns) OVER (PARTITION BY user_id ORDER BY ts) AS sid
        |  FROM g),
        |st AS (SELECT DISTINCT user_id, sid, event_type AS t FROM s),
        |tot AS (SELECT COUNT(*) AS n FROM
        |  (SELECT DISTINCT user_id, sid FROM st)),
        |singles AS (SELECT t, COUNT(*) AS n_t FROM st GROUP BY 1),
        |pc AS (SELECT x.t AS a, y.t AS b, COUNT(*) AS n_ab
        |       FROM st x JOIN st y
        |         ON x.user_id = y.user_id AND x.sid = y.sid AND x.t < y.t
        |       GROUP BY 1, 2 HAVING COUNT(*) >= 5)
        |SELECT a, b, CAST(n_ab AS BIGINT) AS n_ab,
        |  CAST((1000 * CAST(n_ab AS HUGEINT) * n)
        |       // (CAST(sa.n_t AS HUGEINT) * sb.n_t) AS BIGINT)
        |    AS lift_permille
        |FROM pc JOIN singles sa ON sa.t = pc.a
        |        JOIN singles sb ON sb.t = pc.b CROSS JOIN tot""".stripMargin,

    // Closed-form domain + cap_per_key's Knuth-rank row_number cut.
    "domain_cap" ->
      """WITH u AS (SELECT doc_id,
        |    'site' || CAST(doc_id % 97 AS VARCHAR) || '.' ||
        |    CASE doc_id % 4 WHEN 0 THEN 'com' WHEN 1 THEN 'org'
        |         WHEN 2 THEN 'io' ELSE 'co.uk' END AS domain
        |  FROM documents)
        |SELECT doc_id, domain FROM u
        |QUALIFY row_number() OVER (PARTITION BY domain
        |  ORDER BY ((doc_id % 4294967296 % 65536) * 2654435761
        |            + ((doc_id % 4294967296 // 65536) * 2654435761 % 65536) * 65536)
        |           % 4294967296, doc_id) <= 3""".stripMargin,

    // Same round(x*2^20) quantizer as pool_embeddings; HUGEINT list_sum
    // cast back to BIGINT.
    "embedding_norm_outliers" ->
      """WITH w AS (SELECT vec_id,
        |    list_sum(list_transform(CAST(embedding AS DOUBLE[]),
        |      x -> CAST(round(x * 1048576) AS BIGINT)
        |           * CAST(round(x * 1048576) AS BIGINT))) AS norm2_q
        |  FROM embeddings),
        |hi AS (SELECT 'high' AS tail, vec_id, norm2_q FROM w
        |  QUALIFY ROW_NUMBER() OVER (ORDER BY norm2_q DESC, vec_id) <= 10),
        |lo AS (SELECT 'low' AS tail, vec_id, norm2_q FROM w
        |  QUALIFY ROW_NUMBER() OVER (ORDER BY norm2_q ASC, vec_id) <= 10)
        |SELECT tail, vec_id, CAST(norm2_q AS BIGINT) AS norm2_q FROM hi
        |UNION ALL
        |SELECT tail, vec_id, CAST(norm2_q AS BIGINT) AS norm2_q FROM lo""".stripMargin,

    // Cover-explode mirror: each (user, day) covers days day..day+6
    // clipped at the last observed day; the full min..max day axis
    // keeps total-outage gaps as explicit zeros.
    "rolling_active" ->
      """WITH ud AS (SELECT DISTINCT user_id,
        |    (epoch_us(ts) - ((epoch_us(ts) % 86400000000 + 86400000000) % 86400000000)) // 86400000000 AS day FROM events),
        |bounds AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM ud),
        |axis AS (SELECT unnest(range(d0, d1 + 1)) AS day FROM bounds),
        |cov AS (SELECT DISTINCT user_id, day + o AS day2
        |        FROM ud CROSS JOIN bounds CROSS JOIN range(0, 7) t(o)
        |        WHERE day + o <= d1),
        |wau AS (SELECT day2 AS day, COUNT(*) AS wau_7d FROM cov GROUP BY 1),
        |dau AS (SELECT day, COUNT(*) AS dau FROM ud GROUP BY 1)
        |SELECT CAST(axis.day AS BIGINT) AS day,
        |  CAST(COALESCE(dau, 0) AS BIGINT) AS dau,
        |  CAST(COALESCE(wau_7d, 0) AS BIGINT) AS wau_7d
        |FROM axis LEFT JOIN wau USING (day) LEFT JOIN dau USING (day)""".stripMargin,

    // Row-number ranks under (value, doc_id); HUGEINT sum keeps the
    // d-squared total exact; floor-div on positives matches BigInt.
    "rank_correlation" ->
      """WITH m AS (SELECT doc_id, len(string_split(text, ' ')) AS a,
        |             len(list_distinct(string_split(text, ' '))) AS b
        |           FROM documents),
        |r AS (SELECT doc_id,
        |        ROW_NUMBER() OVER (ORDER BY a, doc_id) AS ra,
        |        ROW_NUMBER() OVER (ORDER BY b, doc_id) AS rb FROM m),
        |s AS (SELECT COUNT(*) AS n,
        |        SUM(CAST((ra - rb) * (ra - rb) AS HUGEINT)) AS sd2 FROM r)
        |SELECT CAST(n AS BIGINT) AS n_docs,
        |  CAST(CASE WHEN n < 2 THEN 1000000
        |       ELSE 1000000 - (6000000 * sd2)
        |            // (CAST(n AS HUGEINT) * (CAST(n AS HUGEINT) * n - 1))
        |       END AS BIGINT) AS rho_micro
        |FROM s""".stripMargin,

    // Same three metrics, row_number ranks under the same (value, id)
    // total order, summed.
    "quality_blend" ->
      """WITH m AS (SELECT doc_id, n_chars AS m1,
        |    len(string_split(text, ' ')) AS m2,
        |    len(list_distinct(string_split(text, ' '))) AS m3
        |  FROM documents),
        |r AS (SELECT doc_id,
        |    ROW_NUMBER() OVER (ORDER BY m1, doc_id) AS rank_1,
        |    ROW_NUMBER() OVER (ORDER BY m2, doc_id) AS rank_2,
        |    ROW_NUMBER() OVER (ORDER BY m3, doc_id) AS rank_3 FROM m)
        |SELECT doc_id, rank_1, rank_2, rank_3,
        |  rank_1 + rank_2 + rank_3 AS rank_sum FROM r""".stripMargin,

    // Same per-user collapse, 2×2 margins, and exact integer chi-square
    // in HUGEINT (the engine side runs BigInt — unbounded; the HUGEINT
    // mirror is exact to ~10³⁸, far past any test scale).
    "ab_lift" ->
      """WITH u AS (SELECT user_id,
        |    CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS v,
        |    MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS c
        |  FROM events WHERE user_id IS NOT NULL GROUP BY 1, 2),
        |t AS (SELECT
        |    SUM(CASE WHEN v = 'A' THEN 1 ELSE 0 END) AS na,
        |    SUM(CASE WHEN v = 'A' AND c = 1 THEN 1 ELSE 0 END) AS ka,
        |    SUM(CASE WHEN v = 'B' THEN 1 ELSE 0 END) AS nb,
        |    SUM(CASE WHEN v = 'B' AND c = 1 THEN 1 ELSE 0 END) AS kb
        |  FROM u),
        |x AS (SELECT na, ka, nb, kb,
        |    CAST(ka AS HUGEINT) AS a, CAST(na - ka AS HUGEINT) AS b,
        |    CAST(kb AS HUGEINT) AS cc, CAST(nb - kb AS HUGEINT) AS d
        |  FROM t)
        |SELECT CAST(na AS BIGINT) AS users_a, CAST(ka AS BIGINT) AS conv_a,
        |  CAST(nb AS BIGINT) AS users_b, CAST(kb AS BIGINT) AS conv_b,
        |  CAST((1000000 * ka) // na AS BIGINT) AS rate_a_micro,
        |  CAST((1000000 * kb) // nb AS BIGINT) AS rate_b_micro,
        |  CAST((1000000 * ka) // na - (1000000 * kb) // nb AS BIGINT)
        |    AS lift_micro,
        |  CAST(CASE WHEN a + b = 0 OR cc + d = 0 OR a + cc = 0 OR b + d = 0
        |    THEN NULL
        |    ELSE (1000000 * (a + b + cc + d) * (a * d - b * cc) * (a * d - b * cc))
        |         // ((a + b) * (cc + d) * (a + cc) * (b + d)) END AS BIGINT)
        |    AS chi2_micro
        |FROM x""".stripMargin,

    // Published Benford permille constants inline; string-leading-digit
    // of the exact cent integer, like the operator.
    "benford_digits" ->
      """WITH c AS (SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |             AS cents FROM orders),
        |o AS (SELECT CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS INT) AS digit,
        |        count(*) AS n_obs
        |      FROM c WHERE cents > 0 GROUP BY 1),
        |d AS (SELECT * FROM (VALUES (1, 301), (2, 176), (3, 125), (4, 97),
        |        (5, 79), (6, 67), (7, 58), (8, 51), (9, 46))
        |        AS t(digit, benford_permille)),
        |t AS (SELECT CAST(SUM(n_obs) AS BIGINT) AS tot FROM o)
        |SELECT d.digit, CAST(COALESCE(o.n_obs, 0) AS BIGINT) AS n_obs,
        |  CAST(COALESCE(o.n_obs, 0) * 1000 // tot AS BIGINT) AS obs_permille,
        |  CAST(d.benford_permille AS BIGINT) AS benford_permille,
        |  CAST(abs(COALESCE(o.n_obs, 0) * 1000 // tot - d.benford_permille)
        |    AS BIGINT) AS gap_permille
        |FROM d LEFT JOIN o ON d.digit = o.digit CROSS JOIN t""".stripMargin,

    // Rank ties may order differently than the operator's (value, tie)
    // window, but Σ rank·x is tie-order invariant — same statistic.
    "gini_concentration" ->
      """WITH c AS (SELECT user_id, count(*) AS x FROM events GROUP BY 1),
        |r AS (SELECT x, row_number() OVER (ORDER BY x, user_id) AS rk FROM c),
        |a AS (SELECT count(*) AS n, SUM(CAST(rk AS HUGEINT) * x) AS srx,
        |        SUM(CAST(x AS HUGEINT)) AS sx FROM r)
        |SELECT CAST(n AS BIGINT) AS n_keys, CAST(sx AS BIGINT) AS total,
        |  CAST((2 * srx - (n + 1) * sx) * 1000 // (n * sx) AS BIGINT)
        |    AS gini_permille
        |FROM a""".stripMargin,

    "hapax_rate" ->
      """WITH t AS (SELECT source, unnest(string_split(text, ' ')) AS w
        |           FROM documents),
        |c AS (SELECT source, w, count(*) AS c FROM t WHERE w <> ''
        |      GROUP BY 1, 2)
        |SELECT source, CAST(count(*) AS BIGINT) AS vocab_size,
        |  CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax_count,
        |  CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) * 1000 // count(*)
        |    AS BIGINT) AS hapax_permille
        |FROM c GROUP BY 1""".stripMargin,

    // Host reconstructed from the same id arithmetic as syntheticUrl
    // (the domain_cap precedent); the same (n_chars DESC, doc_id)
    // priority order and per-host delay tier.
    "crawl_schedule" ->
      """WITH u AS (SELECT doc_id, n_chars,
        |    'sub' || CAST(doc_id % 3 AS VARCHAR) ||
        |    '.site' || CAST(doc_id % 97 AS VARCHAR) || '.' ||
        |    CASE doc_id % 4 WHEN 0 THEN 'com' WHEN 1 THEN 'org'
        |         WHEN 2 THEN 'io' ELSE 'co.uk' END AS host
        |  FROM documents)
        |SELECT doc_id, host,
        |  CAST(row_number() OVER (PARTITION BY host
        |    ORDER BY n_chars DESC, doc_id) AS BIGINT) AS wave,
        |  CAST((row_number() OVER (PARTITION BY host
        |      ORDER BY n_chars DESC, doc_id) - 1)
        |    * (1 + (doc_id % 97) % 3) AS BIGINT) AS eta_sec
        |FROM u""".stripMargin,

    // The near-dup CC CTEs (as in split_by_component), a doc-keyed md5
    // split, then the per-split-pair cross counts within components.
    "split_leakage" ->
      s"""WITH RECURSIVE ${jaccardPairCtes("source")},
         |pr AS (SELECT a_id, b_id FROM p WHERE 50 * inter >= 1 * (a_n + b_n - inter)),
         |sym AS (SELECT a_id AS a, b_id AS b FROM pr UNION SELECT b_id, a_id FROM pr),
         |reach(id, r) AS (
         |  SELECT a, b FROM sym
         |  UNION
         |  SELECT reach.id, sym.b FROM reach JOIN sym ON reach.r = sym.a),
         |comp AS (SELECT id, LEAST(id, MIN(r)) AS component FROM reach GROUP BY id),
         |asg AS (SELECT coalesce(c.component, d.doc_id) AS component,
         |  CASE WHEN substr(md5(CAST(d.doc_id AS VARCHAR) || ':leak42'), 1, 8) < '${splitThresholds(0)}' THEN 'train'
         |       WHEN substr(md5(CAST(d.doc_id AS VARCHAR) || ':leak42'), 1, 8) < '${splitThresholds(1)}' THEN 'val'
         |       ELSE 'test' END AS split
         |  FROM documents d LEFT JOIN comp c ON d.doc_id = c.id),
         |m AS (SELECT component, split, count(*) AS m FROM asg GROUP BY 1, 2)
         |SELECT a.split AS split_a, b.split AS split_b,
         |  CAST(count(*) AS BIGINT) AS n_components,
         |  CAST(SUM(a.m * b.m) AS BIGINT) AS n_leaked_pairs
         |FROM m a JOIN m b ON a.component = b.component AND a.split < b.split
         |GROUP BY 1, 2""".stripMargin,

    // The same histogram-band overlap arithmetic: each value-run's rank
    // interval intersected with the kept permille band.
    "trimmed_stats" ->
      """WITH v AS (SELECT event_type,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS x
        |  FROM events WHERE value IS NOT NULL),
        |h AS (SELECT event_type, x, count(*) AS c FROM v GROUP BY 1, 2),
        |s AS (SELECT event_type, x, c,
        |        SUM(c) OVER (PARTITION BY event_type ORDER BY x) - c AS strt,
        |        SUM(c) OVER (PARTITION BY event_type) AS nk
        |      FROM h),
        |k AS (SELECT event_type, x, nk,
        |        GREATEST(0, LEAST(strt + c, nk * 950 // 1000)
        |                  - GREATEST(strt, nk * 50 // 1000)) AS kept
        |      FROM s)
        |SELECT event_type, CAST(MAX(nk) AS BIGINT) AS n_rows,
        |  CAST(SUM(kept) AS BIGINT) AS n_kept,
        |  CAST(MIN(CASE WHEN kept > 0 THEN x END) AS BIGINT) AS lo_val,
        |  CAST(MAX(CASE WHEN kept > 0 THEN x END) AS BIGINT) AS hi_val,
        |  CAST(CASE WHEN SUM(kept) > 0
        |    THEN (SUM(CAST(kept AS HUGEINT) * x) * 1000) // SUM(kept) END
        |    AS BIGINT) AS trimmed_mean_milli
        |FROM k GROUP BY 1""".stripMargin,

    // trimmed_stats' histogram-band boundaries, joined back and clamped;
    // band-empty keys pass values through via COALESCE.
    "winsorize" ->
      """WITH v AS (SELECT event_type, event_id,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS x
        |  FROM events WHERE value IS NOT NULL),
        |h AS (SELECT event_type, x, count(*) AS c FROM v GROUP BY 1, 2),
        |s AS (SELECT event_type, x, c,
        |        SUM(c) OVER (PARTITION BY event_type ORDER BY x) - c AS strt,
        |        SUM(c) OVER (PARTITION BY event_type) AS nk FROM h),
        |k AS (SELECT event_type, x,
        |        GREATEST(0, LEAST(strt + c, nk * 950 // 1000)
        |                  - GREATEST(strt, nk * 50 // 1000)) AS kept FROM s),
        |b AS (SELECT event_type, MIN(CASE WHEN kept > 0 THEN x END) AS lo,
        |        MAX(CASE WHEN kept > 0 THEN x END) AS hi FROM k GROUP BY 1)
        |SELECT v.event_type, v.event_id AS id, v.x AS value_raw,
        |  COALESCE(GREATEST(b.lo, LEAST(b.hi, v.x)), v.x) AS value_winsor
        |FROM v JOIN b USING (event_type)""".stripMargin,

    // Zero-filled axis, epoch weekday = day % 7 (pmod on non-negative
    // epoch days ≡ %); the same decimal-widened means and shares.
    "dow_profile" ->
      """WITH dc AS (SELECT event_type AS k,
        |    (epoch_us(ts) - ((epoch_us(ts) % 86400000000 + 86400000000) % 86400000000)) // 86400000000 AS day, count(*) AS x
        |  FROM events GROUP BY 1, 2),
        |b AS (SELECT k, MIN(day) AS dd0, MAX(day) AS dd1 FROM dc GROUP BY 1),
        |axis AS (SELECT k, unnest(range(dd0, dd1 + 1)) AS day FROM b),
        |f AS (SELECT axis.k, axis.day, COALESCE(dc.x, 0) AS x
        |      FROM axis LEFT JOIN dc ON axis.k = dc.k AND axis.day = dc.day),
        |t AS (SELECT k, day % 7 AS dow, x,
        |        SUM(x) OVER (PARTITION BY k) AS tot FROM f)
        |SELECT k AS event_type, CAST(dow AS BIGINT) AS weekday,
        |  CAST(count(*) AS BIGINT) AS n_days,
        |  CAST(SUM(x) AS BIGINT) AS n_events,
        |  CAST(SUM(CAST(x AS HUGEINT)) * 1000 // count(*) AS BIGINT)
        |    AS mean_daily_milli,
        |  CASE WHEN MAX(tot) > 0 THEN
        |    CAST(SUM(CAST(x AS HUGEINT)) * 1000 // MAX(tot) AS BIGINT)
        |  ELSE 0 END AS share_permille
        |FROM t GROUP BY 1, 2""".stripMargin,

    "halfsample_ci" -> halfSampleCiOracle(32, "hsci"),

    "markov_stationary" -> markovStationaryOracle(20, 1800L),

    // Parallel-unnest positions (the bpeTrainCtes alignment idiom) over
    // the same whitespace split; birth position = MIN global position.
    "vocab_growth" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |o AS (SELECT doc_id, ws,
        |        SUM(len(ws)) OVER (ORDER BY doc_id) - len(ws) AS off FROM w),
        |ex AS (SELECT off, unnest(ws) AS tok,
        |         unnest(range(1, len(ws) + 1)) AS i FROM o),
        |f AS (SELECT tok, MIN(off + i) AS fp FROM ex WHERE tok <> '' GROUP BY 1)
        |SELECT c.cut AS first_n_tokens,
        |  CAST(SUM(CASE WHEN f.fp <= c.cut THEN 1 ELSE 0 END) AS BIGINT)
        |    AS vocab_size
        |FROM (VALUES (CAST(1000 AS BIGINT)), (5000), (20000), (100000))
        |  c(cut) CROSS JOIN f
        |GROUP BY 1""".stripMargin,

    // The same frequency spectrum; HUGEINT keeps Σc² and the ×10⁴
    // product exact, `//` on non-negatives matches the engine's
    // decimal floor-div.
    "yule_k" ->
      """WITH t AS (SELECT source, unnest(string_split(text, ' ')) AS w
        |           FROM documents),
        |c AS (SELECT source, w, count(*) AS c FROM t WHERE w <> ''
        |      GROUP BY 1, 2)
        |SELECT source, CAST(SUM(c) AS BIGINT) AS n_tokens,
        |  CAST(count(*) AS BIGINT) AS vocab_size,
        |  CAST(SUM(CAST(c AS HUGEINT) * c) AS BIGINT) AS sum_c2,
        |  CAST((SUM(CAST(c AS HUGEINT) * c) - SUM(c)) * 10000
        |    // (SUM(CAST(c AS HUGEINT)) * SUM(c)) AS BIGINT) AS yule_k_x10k
        |FROM c GROUP BY 1""".stripMargin,

    // Count runs → rank intervals → band overlap (the trimmed_stats
    // histogram-band idiom); floor(log₂) via bin-string length, bands
    // per run via range() exactly like the engine's intLog2 sequence.
    "zipf_bands" ->
      """WITH t AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents),
        |c AS (SELECT w, count(*) AS c FROM t WHERE w <> '' GROUP BY 1),
        |runs AS (SELECT c, count(*) AS v FROM c GROUP BY 1),
        |s AS (SELECT c, v, SUM(v) OVER (ORDER BY c DESC) - v AS strt FROM runs),
        |b AS (SELECT c, v, strt,
        |        unnest(range(length(bin(strt + 1)) - 1,
        |                     length(bin(strt + v)))) AS band FROM s),
        |k AS (SELECT band, c,
        |        LEAST(strt + v, (CAST(1 AS BIGINT) << (band + 1)) - 1)
        |        - GREATEST(strt + 1, CAST(1 AS BIGINT) << band) + 1 AS kept
        |      FROM b)
        |SELECT CAST(band AS BIGINT) AS band,
        |  CAST(CAST(1 AS BIGINT) << band AS BIGINT) AS rank_lo,
        |  CAST(SUM(kept) AS BIGINT) AS n_types,
        |  CAST(SUM(CAST(kept AS HUGEINT) * c) AS BIGINT) AS token_mass,
        |  CAST(MAX(c) AS BIGINT) AS max_freq,
        |  CAST(MIN(c) AS BIGINT) AS min_freq
        |FROM k GROUP BY band""".stripMargin,

    // Four regex class counts + subtraction for punct mirror the
    // expression's fixed ASCII-anchored classes; length() counts
    // codepoints on both engines.
    "char_class_census" ->
      """WITH c AS (SELECT source, length(text) AS t,
        |    length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS l,
        |    length(regexp_replace(text, '[^0-9]', '', 'g')) AS d,
        |    length(regexp_replace(text, '[^ \t\n\r]', '', 'g')) AS s,
        |    length(regexp_replace(text, '[\t\n\r -~]', '', 'g')) AS o
        |  FROM documents)
        |SELECT source, CAST(SUM(t) AS BIGINT) AS n_chars,
        |  CAST(SUM(l) AS BIGINT) AS n_letters,
        |  CAST(SUM(d) AS BIGINT) AS n_digits,
        |  CAST(SUM(s) AS BIGINT) AS n_spaces,
        |  CAST(SUM(t - l - d - s - o) AS BIGINT) AS n_punct,
        |  CAST(SUM(o) AS BIGINT) AS n_other,
        |  CASE WHEN SUM(t) = 0 THEN NULL ELSE
        |    CAST(SUM(CAST(l AS HUGEINT)) * 1000 // SUM(t) AS BIGINT)
        |  END AS letter_permille
        |FROM c GROUP BY 1""".stripMargin,

    // epoch-day census per type; the Cauchy–Schwarz-non-negative
    // numerator keeps HUGEINT floor-div ≡ decimal truncation.
    "fano_factor" ->
      """WITH d AS (SELECT event_type,
        |    (epoch_us(ts) - ((epoch_us(ts) % 86400000000 + 86400000000) % 86400000000)) // 86400000000 AS day, count(*) AS x
        |  FROM events GROUP BY 1, 2)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
        |  CAST(SUM(x) AS BIGINT) AS n_events,
        |  CAST(SUM(CAST(x AS HUGEINT) * x) AS BIGINT) AS sum_x2,
        |  CAST((count(*) * SUM(CAST(x AS HUGEINT) * x)
        |        - SUM(CAST(x AS HUGEINT)) * SUM(x)) * 1000
        |    // (count(*) * SUM(CAST(x AS HUGEINT))) AS BIGINT) AS fano_milli
        |FROM d GROUP BY 1""".stripMargin,

    // The same two-candidate sup (at-point and open-segment-before
    // gaps over the key's histogram rows); HUGEINT products, one
    // non-negative floor-div at the end.
    "ks_drift" ->
      """WITH h AS (SELECT source AS k, n_chars AS v, count(*) AS c
        |           FROM documents GROUP BY 1, 2),
        |g AS (SELECT v, SUM(c) AS gc FROM h GROUP BY 1),
        |g2 AS (SELECT v, gc, SUM(gc) OVER (ORDER BY v) AS gcum FROM g),
        |n AS (SELECT SUM(c) AS n FROM h),
        |j AS (SELECT h.k, h.c, g2.gc, g2.gcum,
        |        SUM(h.c) OVER (PARTITION BY h.k ORDER BY h.v) AS cum,
        |        SUM(h.c) OVER (PARTITION BY h.k) AS nk
        |      FROM h JOIN g2 USING (v)),
        |d AS (SELECT k, nk, GREATEST(
        |        ABS(CAST(cum AS HUGEINT) * n.n - CAST(gcum AS HUGEINT) * nk),
        |        ABS(CAST(cum - c AS HUGEINT) * n.n
        |            - CAST(gcum - gc AS HUGEINT) * nk)) AS gap
        |      FROM j CROSS JOIN n)
        |SELECT k AS source, CAST(MAX(nk) AS BIGINT) AS n_rows,
        |  CAST(MAX(gap) * 1000 // (MAX(nk) * (SELECT n FROM n)) AS BIGINT)
        |    AS ks_permille
        |FROM d GROUP BY 1""".stripMargin,

    // The same union-point two-candidate sup, both slices' cums from
    // one histogram; HUGEINT products, one floor-div per key.
    "ks_value_shift" ->
      """WITH e AS (SELECT event_type AS k,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v,
        |    (epoch_us(ts) - ((epoch_us(ts) % 86400000000 + 86400000000) % 86400000000)) // 86400000000 AS day
        |  FROM events WHERE value IS NOT NULL),
        |m AS (SELECT MAX(day) AS maxd FROM e),
        |h AS (SELECT k, v,
        |    SUM(CASE WHEN day >= maxd - 6 THEN 1 ELSE 0 END) AS ca,
        |    SUM(CASE WHEN day < maxd - 6 THEN 1 ELSE 0 END) AS cb
        |  FROM e CROSS JOIN m GROUP BY 1, 2),
        |j AS (SELECT k, ca, cb,
        |    SUM(ca) OVER (PARTITION BY k ORDER BY v) AS cuma,
        |    SUM(cb) OVER (PARTITION BY k ORDER BY v) AS cumb,
        |    SUM(ca) OVER (PARTITION BY k) AS na,
        |    SUM(cb) OVER (PARTITION BY k) AS nb FROM h),
        |d AS (SELECT k, na, nb, GREATEST(
        |    ABS(CAST(cuma AS HUGEINT) * nb - CAST(cumb AS HUGEINT) * na),
        |    ABS(CAST(cuma - ca AS HUGEINT) * nb
        |        - CAST(cumb - cb AS HUGEINT) * na)) AS gap
        |  FROM j)
        |SELECT k AS event_type, CAST(MAX(na) AS BIGINT) AS n_cur,
        |  CAST(MAX(nb) AS BIGINT) AS n_ref,
        |  CASE WHEN MAX(na) > 0 AND MAX(nb) > 0 THEN
        |    CAST(MAX(gap) * 1000
        |      // (CAST(MAX(na) AS HUGEINT) * MAX(nb)) AS BIGINT)
        |  END AS ks_permille
        |FROM d GROUP BY 1""".stripMargin,

    // The same one-histogram construction: reference mass strictly
    // below counts twice, tied mass once; one floor-div per key.
    "ranksum_shift" ->
      """WITH e AS (SELECT event_type AS k,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v,
        |    (epoch_us(ts) - ((epoch_us(ts) % 86400000000 + 86400000000) % 86400000000)) // 86400000000 AS day
        |  FROM events WHERE value IS NOT NULL),
        |m AS (SELECT MAX(day) AS maxd FROM e),
        |h AS (SELECT k, v,
        |    SUM(CASE WHEN day >= maxd - 6 THEN 1 ELSE 0 END) AS ca,
        |    SUM(CASE WHEN day < maxd - 6 THEN 1 ELSE 0 END) AS cb
        |  FROM e CROSS JOIN m GROUP BY 1, 2),
        |j AS (SELECT k, ca, cb,
        |    SUM(cb) OVER (PARTITION BY k ORDER BY v) AS cumb,
        |    SUM(ca) OVER (PARTITION BY k) AS na,
        |    SUM(cb) OVER (PARTITION BY k) AS nb FROM h),
        |u AS (SELECT k, na, nb,
        |    SUM(CAST(ca AS HUGEINT) * (2 * (cumb - cb) + cb)) AS u2
        |  FROM j GROUP BY 1, 2, 3)
        |SELECT k AS event_type, CAST(na AS BIGINT) AS n_cur,
        |  CAST(nb AS BIGINT) AS n_ref,
        |  CASE WHEN na > 0 AND nb > 0 THEN
        |    CAST(u2 * 1000 // (2 * CAST(na AS HUGEINT) * nb) AS BIGINT)
        |  END AS auc_permille
        |FROM u""".stripMargin,

    // Same histogram; lower-median rank (n+1)//2 via conditional MIN
    // over the per-slice cums.
    "median_shift" ->
      """WITH e AS (SELECT event_type AS k,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v,
        |    (epoch_us(ts) - ((epoch_us(ts) % 86400000000 + 86400000000) % 86400000000)) // 86400000000 AS day
        |  FROM events WHERE value IS NOT NULL),
        |m AS (SELECT MAX(day) AS maxd FROM e),
        |h AS (SELECT k, v,
        |    SUM(CASE WHEN day >= maxd - 6 THEN 1 ELSE 0 END) AS ca,
        |    SUM(CASE WHEN day < maxd - 6 THEN 1 ELSE 0 END) AS cb
        |  FROM e CROSS JOIN m GROUP BY 1, 2),
        |j AS (SELECT k, v,
        |    SUM(ca) OVER (PARTITION BY k ORDER BY v) AS cuma,
        |    SUM(cb) OVER (PARTITION BY k ORDER BY v) AS cumb,
        |    SUM(ca) OVER (PARTITION BY k) AS na,
        |    SUM(cb) OVER (PARTITION BY k) AS nb FROM h),
        |a AS (SELECT k, MAX(na) AS n_cur, MAX(nb) AS n_ref,
        |    MIN(CASE WHEN cuma >= (na + 1) // 2 AND na > 0 THEN v END)
        |      AS p50_cur,
        |    MIN(CASE WHEN cumb >= (nb + 1) // 2 AND nb > 0 THEN v END)
        |      AS p50_ref
        |  FROM j GROUP BY 1)
        |SELECT k AS event_type, CAST(n_cur AS BIGINT) AS n_cur,
        |  CAST(n_ref AS BIGINT) AS n_ref,
        |  CAST(p50_cur AS BIGINT) AS p50_cur,
        |  CAST(p50_ref AS BIGINT) AS p50_ref,
        |  CASE WHEN p50_cur IS NOT NULL AND p50_ref IS NOT NULL
        |    THEN CAST(p50_cur - p50_ref AS BIGINT) END AS median_shift
        |FROM a""".stripMargin,

    // Zero-filled axis, 1-based positions, the same three sums; the
    // sign-routed floor-div convention on the possibly-negative slope.
    "trend_slope" ->
      """WITH dc AS (SELECT event_type AS k,
        |    (epoch_us(ts) - ((epoch_us(ts) % 86400000000 + 86400000000) % 86400000000)) // 86400000000 AS day, count(*) AS x
        |  FROM events GROUP BY 1, 2),
        |b AS (SELECT k, MIN(day) AS dd0, MAX(day) AS dd1 FROM dc GROUP BY 1),
        |axis AS (SELECT k, unnest(range(dd0, dd1 + 1)) AS day FROM b),
        |f AS (SELECT axis.k, axis.day, COALESCE(dc.x, 0) AS x
        |      FROM axis LEFT JOIN dc ON axis.k = dc.k AND axis.day = dc.day),
        |t AS (SELECT k, x,
        |        row_number() OVER (PARTITION BY k ORDER BY day) AS tt
        |      FROM f),
        |a AS (SELECT k, count(*) AS d, SUM(x) AS s,
        |        SUM(CAST(tt AS HUGEINT) * x) AS stx,
        |        SUM(CAST(tt AS HUGEINT) * tt) AS stt,
        |        SUM(tt) AS st FROM t GROUP BY 1),
        |r AS (SELECT k, d, s, d * stx - CAST(st AS HUGEINT) * s AS num,
        |        d * stt - CAST(st AS HUGEINT) * st AS den FROM a)
        |SELECT k AS event_type, CAST(d AS BIGINT) AS n_days,
        |  CAST(s AS BIGINT) AS n_events,
        |  CASE WHEN den > 0 THEN
        |    CAST(CASE WHEN num < 0 THEN -((-num) * 1000 // den)
        |         ELSE num * 1000 // den END AS BIGINT) END AS slope_milli
        |FROM r""".stripMargin,

    // Same full-grid per-cell floors (empty cells contribute expected
    // mass); HUGEINT casts keep dev² · 10⁶ exact at the test scale.
    "assoc_cramers" ->
      """WITH c AS (SELECT CAST(source AS VARCHAR) AS a,
        |    CAST(lang AS VARCHAR) AS b, count(*) AS o
        |  FROM documents WHERE source IS NOT NULL AND lang IS NOT NULL
        |  GROUP BY 1, 2),
        |ra AS (SELECT a, SUM(o) AS r FROM c GROUP BY 1),
        |cb AS (SELECT b, SUM(o) AS cc FROM c GROUP BY 1),
        |n AS (SELECT SUM(o) AS n FROM c),
        |g AS (SELECT ra.a, cb.b, ra.r, cb.cc FROM ra CROSS JOIN cb),
        |t AS (SELECT (CAST(COALESCE(c.o, 0) AS HUGEINT) * n.n
        |          - CAST(g.r AS HUGEINT) * g.cc)
        |        * (CAST(COALESCE(c.o, 0) AS HUGEINT) * n.n
        |          - CAST(g.r AS HUGEINT) * g.cc) * 1000000
        |        // (CAST(n.n AS HUGEINT) * g.r * g.cc) AS term
        |      FROM g LEFT JOIN c ON g.a = c.a AND g.b = c.b CROSS JOIN n)
        |SELECT CAST((SELECT n FROM n) AS BIGINT) AS n_rows,
        |  CAST((SELECT count(*) FROM ra) AS BIGINT) AS n_a_levels,
        |  CAST((SELECT count(*) FROM cb) AS BIGINT) AS n_b_levels,
        |  CAST(((SELECT count(*) FROM ra) - 1)
        |    * ((SELECT count(*) FROM cb) - 1) AS BIGINT) AS dof,
        |  CAST(SUM(term) AS BIGINT) AS chi2_micro,
        |  CASE WHEN LEAST((SELECT count(*) FROM ra),
        |                  (SELECT count(*) FROM cb)) >= 2
        |    THEN CAST(SUM(term) // ((SELECT n FROM n)
        |      * (LEAST((SELECT count(*) FROM ra),
        |               (SELECT count(*) FROM cb)) - 1)) AS BIGINT)
        |  END AS v2_micro
        |FROM t""".stripMargin,

    // Zero-filled axis via range(), whole-partition sums, the same
    // mean-cleared deviations; sign/abs routing keeps `//` (floor) and
    // Spark's toward-zero `div` on non-negative operands only.
    "autocorr_daily" ->
      """WITH dc AS (SELECT event_type AS k,
        |    (epoch_us(ts) - ((epoch_us(ts) % 86400000000 + 86400000000) % 86400000000)) // 86400000000 AS day, count(*) AS x
        |  FROM events GROUP BY 1, 2),
        |b AS (SELECT k, MIN(day) AS dd0, MAX(day) AS dd1 FROM dc GROUP BY 1),
        |axis AS (SELECT k, unnest(range(dd0, dd1 + 1)) AS day FROM b),
        |f AS (SELECT axis.k, axis.day, COALESCE(dc.x, 0) AS x
        |      FROM axis LEFT JOIN dc ON axis.k = dc.k AND axis.day = dc.day),
        |t AS (SELECT k, day, x, COUNT(*) OVER (PARTITION BY k) AS d,
        |        SUM(x) OVER (PARTITION BY k) AS s FROM f),
        |v AS (SELECT k, d, CAST(d * x - s AS HUGEINT) AS dev,
        |        lead(CAST(d * x - s AS HUGEINT), 1)
        |          OVER (PARTITION BY k ORDER BY day) AS l1,
        |        lead(CAST(d * x - s AS HUGEINT), 7)
        |          OVER (PARTITION BY k ORDER BY day) AS l7
        |      FROM t),
        |a AS (SELECT k, MAX(d) AS n_days, SUM(dev * dev) AS den,
        |        SUM(dev * l1) AS n1, SUM(dev * l7) AS n7 FROM v GROUP BY 1),
        |u AS (SELECT k, n_days, CAST(1 AS BIGINT) AS lag, n1 AS num, den
        |      FROM a
        |      UNION ALL SELECT k, n_days, 7, n7, den FROM a)
        |SELECT k AS event_type, lag, CAST(n_days AS BIGINT) AS n_days,
        |  CASE WHEN den > 0 AND num IS NOT NULL THEN
        |    CAST(CASE WHEN num < 0 THEN -((-num) * 1000 // den)
        |         ELSE num * 1000 // den END AS BIGINT) END AS r_milli
        |FROM u""".stripMargin,

    // Same zero-filled axis and prefix sums; argmax replayed as a
    // row_number over (|C| DESC, day ASC) — the engine's earliest-day
    // tie-break; every division floors non-negatives.
    "changepoint_day" ->
      """WITH dc AS (SELECT event_type AS k,
        |    (epoch_us(ts) - ((epoch_us(ts) % 86400000000 + 86400000000) % 86400000000)) // 86400000000 AS day, count(*) AS x
        |  FROM events GROUP BY 1, 2),
        |b AS (SELECT k, MIN(day) AS dd0, MAX(day) AS dd1 FROM dc GROUP BY 1),
        |axis AS (SELECT k, unnest(range(dd0, dd1 + 1)) AS day FROM b),
        |f AS (SELECT axis.k, axis.day, COALESCE(dc.x, 0) AS x
        |      FROM axis LEFT JOIN dc ON axis.k = dc.k AND axis.day = dc.day),
        |t AS (SELECT k, day, x, COUNT(*) OVER (PARTITION BY k) AS d,
        |        SUM(x) OVER (PARTITION BY k) AS s,
        |        SUM(x) OVER (PARTITION BY k ORDER BY day) AS cumx,
        |        row_number() OVER (PARTITION BY k ORDER BY day) AS idx
        |      FROM f),
        |c AS (SELECT k, day, d, s, cumx, idx,
        |        ABS(CAST(d AS HUGEINT) * cumx - CAST(idx AS HUGEINT) * s)
        |          AS cab,
        |        row_number() OVER (PARTITION BY k ORDER BY
        |          ABS(CAST(d AS HUGEINT) * cumx - CAST(idx AS HUGEINT) * s)
        |            DESC, day ASC) AS rn
        |      FROM t)
        |SELECT k AS event_type, CAST(d AS BIGINT) AS n_days,
        |  CAST(s AS BIGINT) AS n_events, day AS cp_day,
        |  CASE WHEN s > 0 THEN
        |    CAST(cab * 1000 // (CAST(d AS HUGEINT) * s) AS BIGINT)
        |  ELSE 0 END AS cusum_permille,
        |  CAST(CAST(cumx AS HUGEINT) * 1000 // idx AS BIGINT)
        |    AS mean_before_milli,
        |  CASE WHEN d > idx THEN
        |    CAST(CAST(s - cumx AS HUGEINT) * 1000 // (d - idx) AS BIGINT)
        |  END AS mean_after_milli
        |FROM c WHERE rn = 1""".stripMargin,

    // Same path construction; the decision chain replayed in the SAME
    // (length DESC, Allow-first) order with the same anchored regexes.
    "robots_filter" ->
      """WITH p AS (SELECT doc_id, CASE doc_id % 5
        |    WHEN 0 THEN '/private/page' || doc_id
        |    WHEN 1 THEN '/public/doc' || doc_id || '.html'
        |    WHEN 2 THEN '/files/report' || doc_id || '.pdf'
        |    WHEN 3 THEN '/private/stats/day' || doc_id
        |    ELSE '/tmp/cache' || doc_id END AS path
        |  FROM documents)
        |SELECT doc_id, path,
        |  CASE WHEN regexp_matches(path, '^/private/stats/') THEN TRUE
        |       WHEN regexp_matches(path, '^/private/') THEN FALSE
        |       WHEN regexp_matches(path, '^/.*\.pdf$') THEN FALSE
        |       WHEN regexp_matches(path, '^/tmp') THEN FALSE
        |       ELSE TRUE END AS allowed
        |FROM p""".stripMargin,

    // Rank words by (count desc, word asc), sum the top-N mass per cut.
    "vocab_coverage" ->
      """WITH t AS (SELECT w, COUNT(*) AS n FROM (
        |    SELECT unnest(string_split(text, ' ')) AS w FROM documents)
        |  WHERE w <> '' GROUP BY 1),
        |r AS (SELECT n, ROW_NUMBER() OVER (ORDER BY n DESC, w ASC) AS rn FROM t),
        |tot AS (SELECT SUM(n) AS total FROM t),
        |cuts(top_n) AS (VALUES (10), (100), (1000), (10000))
        |SELECT CAST(top_n AS BIGINT) AS top_n,
        |  CAST(SUM(CASE WHEN rn <= top_n THEN n ELSE 0 END) AS BIGINT) AS covered,
        |  CAST(total AS BIGINT) AS total,
        |  CAST((1000 * SUM(CASE WHEN rn <= top_n THEN n ELSE 0 END)) // total
        |    AS BIGINT) AS coverage_permille
        |FROM cuts CROSS JOIN r CROSS JOIN tot
        |GROUP BY top_n, total""".stripMargin,

    // range() day axis per key + IGNORE NULLS forward-fill windows —
    // both engines' last_value frames default to unbounded..current.
    "gap_fill" ->
      """WITH d AS (SELECT event_type AS key,
        |    (epoch_us(ts) - ((epoch_us(ts) % 86400000000 + 86400000000) % 86400000000)) // 86400000000 AS day, COUNT(*) AS n
        |  FROM events GROUP BY 1, 2),
        |span AS (SELECT key, MIN(day) AS d0, MAX(day) AS d1 FROM d GROUP BY 1),
        |axis AS (SELECT key, unnest(range(d0, d1 + 1)) AS day FROM span),
        |j AS (SELECT axis.key, axis.day, d.n AS obs_n
        |      FROM axis LEFT JOIN d ON d.key = axis.key AND d.day = axis.day)
        |SELECT key, CAST(day AS BIGINT) AS day,
        |  CAST(COALESCE(obs_n, 0) AS BIGINT) AS n,
        |  CAST(last_value(obs_n IGNORE NULLS)
        |    OVER (PARTITION BY key ORDER BY day) AS BIGINT) AS last_n,
        |  CAST(day - last_value(CASE WHEN obs_n IS NOT NULL THEN day END
        |      IGNORE NULLS)
        |    OVER (PARTITION BY key ORDER BY day) AS BIGINT) AS gap_age
        |FROM j""".stripMargin,

    // Lower medians by row_number at position (c+1)//2 — the integer-
    // exact median both engines reproduce; flag |n-med| > 3*mad.
    "anomaly_days" ->
      """WITH d AS (SELECT event_type AS key,
        |    (epoch_us(ts) - ((epoch_us(ts) % 86400000000 + 86400000000) % 86400000000)) // 86400000000 AS day, COUNT(*) AS n
        |  FROM events GROUP BY 1, 2),
        |m AS (SELECT key, n AS med FROM (
        |    SELECT key, n, day,
        |      ROW_NUMBER() OVER (PARTITION BY key ORDER BY n, day) AS rn,
        |      COUNT(*) OVER (PARTITION BY key) AS c FROM d)
        |  WHERE rn = (c + 1) // 2),
        |dev AS (SELECT d.key, day, n, med, ABS(n - med) AS dev
        |        FROM d JOIN m USING (key)),
        |md AS (SELECT key, dev AS mad FROM (
        |    SELECT key, dev, day,
        |      ROW_NUMBER() OVER (PARTITION BY key ORDER BY dev, day) AS rn,
        |      COUNT(*) OVER (PARTITION BY key) AS c FROM dev)
        |  WHERE rn = (c + 1) // 2)
        |SELECT dev.key, CAST(day AS BIGINT) AS day, n, med, mad
        |FROM dev JOIN md USING (key)
        |WHERE dev > 3 * mad""".stripMargin,

    // explicit floor-division weeks, mirroring the engine's
    // epochBucketSql (Spark's cast(ts AS long) floors; DuckDB's bare //
    // truncates — the subtract-remainder form is exact floor in both).
    "weekly_trend" ->
      """WITH c AS (SELECT event_type,
        |    (epoch_us(ts) - ((epoch_us(ts) % 604800000000 + 604800000000) % 604800000000)) // 604800000000 AS w, COUNT(*) AS n
        |  FROM events GROUP BY 1, 2),
        |l AS (SELECT event_type, w, n,
        |    lag(n) OVER (PARTITION BY event_type ORDER BY w) AS n_prev FROM c)
        |SELECT event_type, CAST(w AS BIGINT) AS w, n, n_prev,
        |  CAST(CASE WHEN n_prev IS NULL THEN NULL
        |       ELSE (n - n_prev) * 1000 // n_prev END AS BIGINT) AS wow_permille
        |FROM l""".stripMargin,

    // Naive mirror: DISTINCT canonical edges, three-way triangle join,
    // per-node incidence counts, integer-permille coefficient.
    "clustering_coeff" ->
      """WITH ids AS (SELECT doc_id AS id, doc_id - (doc_id % 5) AS blk
        |             FROM documents),
        |cl AS (SELECT a.id AS u, b.id AS v FROM ids a
        |       JOIN ids b ON a.blk = b.blk AND a.id < b.id),
        |ld AS (SELECT doc_id AS l FROM documents WHERE doc_id % 5 = 0),
        |ch AS (SELECT a.l AS u, a.l + 5 AS v FROM ld a
        |       JOIN ld b ON b.l = a.l + 5),
        |e AS MATERIALIZED (SELECT DISTINCT u, v FROM
        |  (SELECT * FROM cl UNION ALL SELECT * FROM ch)),
        |tri AS MATERIALIZED (SELECT ab.u AS a, ab.v AS b, bc.v AS c
        |  FROM e ab JOIN e bc ON ab.v = bc.u
        |            JOIN e ac ON ac.u = ab.u AND ac.v = bc.v),
        |tn AS (SELECT n, COUNT(*) AS t FROM (
        |    SELECT a AS n FROM tri UNION ALL SELECT b FROM tri
        |    UNION ALL SELECT c FROM tri) GROUP BY 1),
        |dg AS (SELECT n, COUNT(*) AS deg FROM (
        |    SELECT u AS n FROM e UNION ALL SELECT v FROM e) GROUP BY 1)
        |SELECT CAST(n AS BIGINT) AS node, CAST(deg AS BIGINT) AS deg,
        |  CAST(COALESCE(t, 0) AS BIGINT) AS n_tri,
        |  CAST((2000 * COALESCE(t, 0)) // (deg * (deg - 1)) AS BIGINT)
        |    AS coeff_permille
        |FROM dg LEFT JOIN tn USING (n) WHERE deg >= 2""".stripMargin,

    // Unrolled 8-round peel: each round recomputes degrees over the
    // surviving edge set and keeps both-ends-survive edges — the exact
    // fixed-round semantics of Graph.kCore.
    "kcore" -> {
      val (k, rounds) = (4, 8)
      // AS MATERIALIZED is load-bearing: each round references the
      // previous edge set three times, so inlined CTEs expand 3^rounds
      // scans of the base table (observed: DuckDB exhausting file
      // handles re-opening the parquet); materialization makes the
      // chain compute each round once, like the engine does.
      val peel = (1 to rounds).map { r =>
        s"""d$r AS MATERIALIZED (SELECT n, COUNT(*) AS d FROM (
           |    SELECT u AS n FROM e${r - 1} UNION ALL SELECT v FROM e${r - 1}) GROUP BY 1),
           |k$r AS MATERIALIZED (SELECT n FROM d$r WHERE d >= $k),
           |e$r AS MATERIALIZED (SELECT u, v FROM e${r - 1}
           |  WHERE u IN (SELECT n FROM k$r) AND v IN (SELECT n FROM k$r))""".stripMargin
      }.mkString(",\n")
      s"""WITH e0 AS MATERIALIZED (SELECT DISTINCT 2 * l_orderkey AS u,
         |    2 * l_partkey + 1 AS v FROM lineitem),
         |$peel
         |SELECT CAST(n AS BIGINT) AS node, CAST(COUNT(*) AS BIGINT) AS deg FROM (
         |  SELECT u AS n FROM e$rounds UNION ALL SELECT v FROM e$rounds)
         |GROUP BY 1""".stripMargin
    },

    // Count-only mirror: the naive three-way id-ordered join — same
    // total whatever the Spark side's degree orientation.
    "triangle_count" ->
      """WITH ids AS (SELECT doc_id, doc_id - (doc_id % 5) AS blk FROM documents),
        |e AS (SELECT a.doc_id AS a, b.doc_id AS b FROM ids a
        |      JOIN ids b ON a.blk = b.blk AND a.doc_id < b.doc_id)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
        |FROM e ab JOIN e bc ON ab.b = bc.a
        |          JOIN e ac ON ac.a = ab.a AND ac.b = bc.b""".stripMargin,

    // Full mirror incl. the deterministic degree cap: same mix64 rank
    // over 'user:item', same row_number tie-break, capped degrees feed
    // both the pair counts and the overlap denominator.
    "item_cooccurrence" ->
      s"""WITH ui AS (SELECT DISTINCT user_id AS u,
         |    CAST(json_extract(props, '$$.k') AS BIGINT) AS item
         |  FROM events
         |  WHERE user_id IS NOT NULL AND json_extract(props, '$$.k') IS NOT NULL),
         |key AS (SELECT u, item,
         |    CAST(u AS VARCHAR) || ':' || CAST(item AS VARCHAR) AS s FROM ui),
         |${sqlMix64Ctes("h", "key", "s", "u, item")},
         |capped AS (SELECT u, item FROM (
         |    SELECT u, item,
         |      row_number() OVER (PARTITION BY u ORDER BY sh64, item) AS rn
         |    FROM h) WHERE rn <= 12),
         |p AS (SELECT a.item AS item_a, b.item AS item_b, COUNT(*) AS co
         |      FROM capped a JOIN capped b ON a.u = b.u AND a.item < b.item
         |      GROUP BY 1, 2 HAVING COUNT(*) >= 2),
         |d AS (SELECT item, COUNT(*) AS deg FROM capped GROUP BY item)
         |SELECT item_a, item_b, CAST(co AS BIGINT) AS co,
         |  CAST(co * 1000 // LEAST(da.deg, db.deg) AS BIGINT) AS overlap_permille
         |FROM p JOIN d da ON da.item = p.item_a
         |       JOIN d db ON db.item = p.item_b""".stripMargin,

    // explicit floor-division mirrors Spark's FLOORING cast(ts AS LONG)
    // (DuckDB's integer // truncates: -7 // 2 = -3 — a bare // diverges pre-1970)
    // exactly (DuckDB's epoch() returns fractional seconds; a double
    // boundary case would split where Spark's integer seconds don't).
    "funnel_steps" ->
      """WITH sec AS (SELECT user_id, event_type, ts,
        |    (epoch_us(ts) - ((epoch_us(ts) % 1000000 + 1000000) % 1000000)) // 1000000 AS es FROM events),
        |s1 AS (SELECT user_id, MIN(ts) AS ts_1 FROM sec
        |       WHERE event_type = 'view' GROUP BY 1),
        |s2 AS (SELECT sec.user_id, MIN(sec.ts) AS ts_2
        |       FROM sec JOIN s1 USING (user_id)
        |       WHERE sec.event_type = 'click' AND sec.ts > s1.ts_1
        |         AND sec.es - ((epoch_us(s1.ts_1) - ((epoch_us(s1.ts_1) % 1000000 + 1000000) % 1000000)) // 1000000) <= 604800
        |       GROUP BY 1),
        |s3 AS (SELECT sec.user_id, MIN(sec.ts) AS ts_3
        |       FROM sec JOIN s1 USING (user_id) JOIN s2 USING (user_id)
        |       WHERE sec.event_type = 'purchase' AND sec.ts > s2.ts_2
        |         AND sec.es - ((epoch_us(s1.ts_1) - ((epoch_us(s1.ts_1) % 1000000 + 1000000) % 1000000)) // 1000000) <= 604800
        |       GROUP BY 1)
        |SELECT s1.user_id,
        |  CAST(1 + (ts_2 IS NOT NULL)::INT + (ts_3 IS NOT NULL)::INT
        |       AS INTEGER) AS stage,
        |  strftime(ts_1, '%Y-%m-%d %H:%M:%S.%f') AS t1,
        |  strftime(ts_2, '%Y-%m-%d %H:%M:%S.%f') AS t2,
        |  strftime(ts_3, '%Y-%m-%d %H:%M:%S.%f') AS t3
        |FROM s1 LEFT JOIN s2 USING (user_id)
        |  LEFT JOIN s3 USING (user_id)""".stripMargin,

    "retention_cohorts" ->
      """WITH e AS (SELECT user_id, (epoch_us(ts) - ((epoch_us(ts) % 1000000 + 1000000) % 1000000)) // 1000000 AS es FROM events),
        |c AS (SELECT user_id, ((MIN(es) - ((MIN(es) % 604800 + 604800) % 604800)) // 604800) AS cohort_week
        |      FROM e GROUP BY 1),
        |a AS (SELECT DISTINCT cohort_week,
        |        ((es - ((es % 604800 + 604800) % 604800)) // 604800) - cohort_week AS offset_weeks, user_id
        |      FROM e JOIN c USING (user_id))
        |SELECT cohort_week, offset_weeks, COUNT(*) AS n_active
        |FROM a GROUP BY 1, 2""".stripMargin,

    "set_ops" ->
      """SELECT user_id, strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day
        |FROM events WHERE event_type = 'click'
        |INTERSECT
        |SELECT user_id, strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day
        |FROM events WHERE event_type = 'view'
        |EXCEPT
        |SELECT user_id, strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day
        |FROM events WHERE event_type = 'purchase'""".stripMargin,

    "window_funcs" ->
      """SELECT user_id, event_id,
        |  lag(value) OVER w AS prev_value,
        |  lead(value) OVER w AS next_value,
        |  row_number() OVER w AS rn,
        |  CAST(ntile(4) OVER w AS BIGINT) AS quartile
        |FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""".stripMargin,

    "rollup_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(grouping(l_returnflag) AS BIGINT) AS g_rf,
        |  CAST(grouping(l_linestatus) AS BIGINT) AS g_ls,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""".stripMargin,

    "pivot_agg" ->
      """SELECT user_id,
        |  CAST(SUM(CASE WHEN event_type = 'click' THEN CAST(value AS DECIMAL(18,6)) END) AS DOUBLE) AS click,
        |  CAST(SUM(CASE WHEN event_type = 'view' THEN CAST(value AS DECIMAL(18,6)) END) AS DOUBLE) AS view,
        |  CAST(SUM(CASE WHEN event_type = 'purchase' THEN CAST(value AS DECIMAL(18,6)) END) AS DOUBLE) AS purchase
        |FROM events GROUP BY user_id""".stripMargin,

    "asof_join" ->
      """WITH clicks AS (
        |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
        |views AS (
        |  SELECT user_id, ts, event_id AS view_id, value FROM events
        |  WHERE event_type = 'view'
        |  QUALIFY row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) = 1)
        |SELECT l.event_id, l.user_id,
        |  strftime(l.ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_str,
        |  r.view_id AS asof_view_id, r.value AS asof_value
        |FROM clicks l ASOF LEFT JOIN views r
        |  ON l.user_id = r.user_id AND r.ts <= l.ts""".stripMargin,

    "band_join" ->
      """WITH p AS (
        |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
        |c AS (
        |  SELECT user_id, ts, value FROM events WHERE event_type = 'click')
        |SELECT p.event_id, p.user_id,
        |  strftime(p.ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_str,
        |  COUNT(c.user_id) AS n_nearby,
        |  CAST(COALESCE(SUM(CAST(c.value AS DECIMAL(18,6))), 0) AS DOUBLE)
        |    AS click_value
        |FROM p LEFT JOIN c ON p.user_id = c.user_id
        |  AND abs(epoch_us(p.ts) - epoch_us(c.ts)) <= 900000000
        |GROUP BY 1, 2, 3""".stripMargin,

    "range_join" ->
      """WITH g AS (
        |  SELECT user_id, ts,
        |    CASE WHEN epoch(ts) - epoch(lag(ts) OVER w) > 1800 THEN 1 ELSE 0 END AS ns
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |s AS (
        |  SELECT user_id, ts,
        |    1 + SUM(ns) OVER (PARTITION BY user_id ORDER BY ts) AS sid
        |  FROM g),
        |sess AS (
        |  SELECT user_id, CAST(sid AS BIGINT) AS session_id,
        |    MIN(ts) AS s_start, MAX(ts) AS s_end
        |  FROM s GROUP BY user_id, sid),
        |p AS (
        |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase')
        |SELECT p.event_id, p.user_id,
        |  strftime(p.ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_str, sess.session_id
        |FROM p JOIN sess ON p.user_id = sess.user_id
        |  AND p.ts BETWEEN sess.s_start AND sess.s_end""".stripMargin,

    "sessionize" ->
      """WITH g AS (
        |  SELECT user_id, ts,
        |    CASE WHEN epoch(ts) - epoch(lag(ts) OVER w) > 1800 THEN 1 ELSE 0 END AS ns
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |s AS (
        |  SELECT user_id, ts,
        |    1 + SUM(ns) OVER (PARTITION BY user_id ORDER BY ts) AS sid
        |  FROM g)
        |SELECT user_id, CAST(sid AS BIGINT) AS session_id,
        |  strftime(MIN(ts), '%Y-%m-%d %H:%M:%S.%f') AS s_start,
        |  strftime(MAX(ts), '%Y-%m-%d %H:%M:%S.%f') AS s_end,
        |  COUNT(*) AS n_events
        |FROM s GROUP BY user_id, sid""".stripMargin,

    // Same gaps-and-islands session ids, then per-session ordered
    // string_agg truncated to 8 steps and the bounded top-20.
    "session_paths" ->
      """WITH g AS (
        |  SELECT user_id, ts, event_id, event_type,
        |    CASE WHEN epoch(ts) - epoch(lag(ts) OVER w) > 1800 THEN 1 ELSE 0 END AS ns
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |s AS (
        |  SELECT user_id, ts, event_id, event_type,
        |    1 + SUM(ns) OVER (PARTITION BY user_id ORDER BY ts) AS sid
        |  FROM g),
        |r AS (SELECT user_id, sid, event_type,
        |    row_number() OVER (PARTITION BY user_id, sid
        |                       ORDER BY epoch_us(ts), event_id) AS rn
        |  FROM s),
        |p AS (SELECT string_agg(event_type, '>' ORDER BY rn) AS path
        |      FROM r WHERE rn <= 8 GROUP BY user_id, sid)
        |SELECT path, COUNT(*) AS n_sessions
        |FROM p GROUP BY path
        |ORDER BY n_sessions DESC, path LIMIT 20""".stripMargin,

    // sessionize_chunked is output-identical to sessionize by construction
    // (Sessionize.sessionsChunked scaladoc) — the oracle is the same
    // single-pass gaps-and-islands SQL.
    "sessionize_chunked" ->
      """WITH g AS (
        |  SELECT user_id, ts,
        |    CASE WHEN epoch(ts) - epoch(lag(ts) OVER w) > 1800 THEN 1 ELSE 0 END AS ns
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |s AS (
        |  SELECT user_id, ts,
        |    1 + SUM(ns) OVER (PARTITION BY user_id ORDER BY ts) AS sid
        |  FROM g)
        |SELECT user_id, CAST(sid AS BIGINT) AS session_id,
        |  strftime(MIN(ts), '%Y-%m-%d %H:%M:%S.%f') AS s_start,
        |  strftime(MAX(ts), '%Y-%m-%d %H:%M:%S.%f') AS s_end,
        |  COUNT(*) AS n_events
        |FROM s GROUP BY user_id, sid""".stripMargin,

    // explicit floor-division mirrors Spark's FLOORING cast(ts AS LONG);
    // integer day/week arithmetic matches the retention convention.
    "stickiness" ->
      """WITH e AS (SELECT user_id,
        |    (epoch_us(ts) - ((epoch_us(ts) % 86400000000 + 86400000000) % 86400000000)) // 86400000000 AS d,
        |    (epoch_us(ts) - ((epoch_us(ts) % 604800000000 + 604800000000) % 604800000000)) // 604800000000 AS w
        |  FROM events),
        |dau AS (SELECT d, w, count(DISTINCT user_id) AS dau FROM e GROUP BY 1, 2),
        |wau AS (SELECT w, count(DISTINCT user_id) AS wau FROM e GROUP BY 1)
        |SELECT CAST(d AS BIGINT) AS epoch_day, dau, wau,
        |  CAST(dau * 1000 // wau AS BIGINT) AS stickiness_permille
        |FROM dau JOIN wau USING (w)""".stripMargin,

    "scd2_history" ->
      """WITH o AS (
        |  SELECT user_id, event_type, ts, event_id,
        |    lag(event_type) OVER w AS prev, row_number() OVER w AS rn
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |c AS (
        |  SELECT user_id, event_type, ts, event_id FROM o
        |  WHERE rn = 1 OR prev IS DISTINCT FROM event_type),
        |v AS (
        |  SELECT user_id, event_type, ts AS vf, lead(ts) OVER w2 AS vt,
        |    row_number() OVER w2 AS version
        |  FROM c WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT user_id, event_type,
        |  strftime(vf, '%Y-%m-%d %H:%M:%S.%f') AS valid_from,
        |  strftime(vt, '%Y-%m-%d %H:%M:%S.%f') AS valid_to,
        |  vt IS NULL AS is_current, CAST(version AS BIGINT) AS version
        |FROM v""".stripMargin,

    // scd2_chunked is output-identical to scd2_history by construction
    // (Scd2.fromLogChunked scaladoc) — same windowed mirror.
    "scd2_chunked" ->
      """WITH o AS (
        |  SELECT user_id, event_type, ts, event_id,
        |    lag(event_type) OVER w AS prev, row_number() OVER w AS rn
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |c AS (
        |  SELECT user_id, event_type, ts, event_id FROM o
        |  WHERE rn = 1 OR prev IS DISTINCT FROM event_type),
        |v AS (
        |  SELECT user_id, event_type, ts AS vf, lead(ts) OVER w2 AS vt,
        |    row_number() OVER w2 AS version
        |  FROM c WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT user_id, event_type,
        |  strftime(vf, '%Y-%m-%d %H:%M:%S.%f') AS valid_from,
        |  strftime(vt, '%Y-%m-%d %H:%M:%S.%f') AS valid_to,
        |  vt IS NULL AS is_current, CAST(version AS BIGINT) AS version
        |FROM v""".stripMargin,

    "windowed_counts" ->
      """SELECT
        |  strftime(time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)), '%Y-%m-%d %H:%M:%S')
        |    AS w_start,
        |  strftime(time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)) + INTERVAL '1 hour',
        |           '%Y-%m-%d %H:%M:%S') AS w_end,
        |  event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
        |FROM events GROUP BY 1, 2, 3""".stripMargin)
}

