package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.F

/** Persisted BM25 inverted index — the text-retrieval analog of the
  * persisted IVF index ([[Ivf]]): pay the corpus tokenization once,
  * serve ranked queries from term-sharded postings forever after.
  * [[TextAnalysis.bm25TopK]] is the from-scratch scorer (one corpus
  * scan per query batch — right for ad-hoc analysis); this is the
  * serving shape: at 100 TB a query batch must not re-tokenize the
  * lake, and an incremental doc batch must not rebuild the index.
  *
  * Layout under `<root>` (both tables [[IndexStore]]-committed — atomic
  * snapshot protocol, crash-safe, optimistic concurrency):
  * {{{
  *   <root>/postings/   (__shard, term, doc_id, tf)  partitioned __shard
  *   <root>/doclen/     (doc_id, dl)
  * }}}
  * `__shard = mix64(term) mod nShards` with the engine-portable string
  * hash, so a QUERY knows its terms' shards without touching the store:
  * [[query]] reads only those shards' files (manifest-pruned, the
  * `__cell`-probe pattern) — the postings scan is O(query terms'
  * postings), never O(index).
  *
  * Scoring is bit-identical to [[TextAnalysis.bm25TopK]] (same integer
  * Robertson saturation, same `int_log2` idf, same tie-break), proven
  * by the driver gate: `bm25_indexed` reuses `bm25_topk`'s oracle
  * verbatim. Exactness holds because a term's postings live ENTIRELY in
  * its shard — df, tf and dl are whole-corpus values whichever shards
  * load. */
object TextIndex {

  private def words(c: Column): Column = split(c, " ")

  /** The shard modulus is part of the index's identity and MUST be read
    * back exactly — inferring it from the max observed shard id breaks
    * the moment the top shards happen to be empty (adds would assign
    * new postings under a different modulus and probes would prune to
    * the wrong shard). Written once at build, immutable until the next
    * full rebuild. */
  private def writeMeta(spark: SparkSession, root: String, nShards: Int): Unit = {
    val p = new org.apache.hadoop.fs.Path(root, "textindex.json")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(s"""{"n_shards": $nShards}""".getBytes("UTF-8"))
    finally out.close()
  }

  private def nShardsOf(spark: SparkSession, root: String): Int = {
    val p = new org.apache.hadoop.fs.Path(root, "textindex.json")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(p), s"no text index at $root (textindex.json missing)")
    val in = fs.open(p)
    val body = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    """"n_shards"\s*:\s*(\d+)""".r.findFirstMatchIn(body)
      .map(_.group(1).toInt)
      .getOrElse(throw new IllegalStateException(s"unparseable $p: $body"))
  }

  private def postingsOf(docs: DataFrame, idCol: String, textCol: String,
      nShards: Int): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        explode(words(col(textCol))).as("term"))
      .where(col("term") =!= "")
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      .withColumn("__shard",
        pmod(F.mix64(col("term")), lit(nShards.toLong)).cast("int"))

  /** `true` iff a COMPLETE index lives at `root` — the build-once probe.
    * Keyed on the meta file, which [[buildIndex]] deletes first and
    * rewrites LAST: a crash anywhere mid-(re)build leaves the probe
    * false (and [[query]]/[[addToIndex]] failing loud on the missing
    * meta) instead of serving a mixed old/new index silently. */
  def isComplete(spark: SparkSession, root: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(root, "textindex.json")
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Full build (replaces any prior index at `root`). The corpus is
    * tokenized ONCE: the postings aggregate is persisted across both
    * table commits and doclen derives from it (`dl = Σ tf`). Prefer a
    * fresh fingerprinted root per corpus snapshot (the
    * `Ivf.cachedIndexDir` pattern); an in-place rebuild is crash-safe
    * only in the fail-loud sense — meta is deleted first and rewritten
    * last, so a crash mid-rebuild makes every reader/probe fail loudly
    * until the rebuild is re-run, never serve mixed tables. */
  def buildIndex(spark: SparkSession, root: String, docs: DataFrame,
      idCol: String = "doc_id", textCol: String = "text",
      nShards: Int = 16): Unit = {
    require(nShards >= 1)
    val metaPath = new org.apache.hadoop.fs.Path(root, "textindex.json")
    val fs = metaPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(metaPath)) fs.delete(metaPath, false)
    val post = postingsOf(docs, idCol, textCol, nShards).persist()
    try {
      IndexStore.rewrite(spark, s"$root/postings", post,
        partCol = Some("__shard"), sortCols = Seq("term", "doc_id"))
      IndexStore.rewrite(spark, s"$root/doclen",
        post.groupBy("doc_id").agg(sum("tf").as("dl")))
    } finally post.unpersist()
    writeMeta(spark, root, nShards)
  }

  /** Incrementally index a new doc batch WITHOUT rebuilding: append the
    * batch's postings to their shards and its lengths to doclen (the
    * [[Ivf.addToIndex]] contract — ids must be new; re-adding an id
    * double-counts it, dedup upstream). The batch is tokenized once
    * (persisted postings aggregate, doclen = Σ tf). Appends extend the
    * touched shards' manifest entries only. A crash BETWEEN the two
    * appends leaves the batch in postings but not doclen (its docs
    * drop from scoring rather than mis-score — the dl join is inner);
    * repair by `deleteFromIndex(batch ids)` then re-adding. */
  def addToIndex(spark: SparkSession, root: String, docs: DataFrame,
      idCol: String = "doc_id", textCol: String = "text"): Unit = {
    val n = nShardsOf(spark, root)
    val post = postingsOf(docs, idCol, textCol, n).persist()
    try {
      IndexStore.append(spark, s"$root/postings", post,
        partCol = Some("__shard"), sortCols = Seq("term", "doc_id"))
      IndexStore.append(spark, s"$root/doclen",
        post.groupBy("doc_id").agg(sum("tf").as("dl")))
    } finally post.unpersist()
  }

  /** Erase documents from the index (compliance path): anti-join both
    * tables, rewriting only the shards that actually held the ids —
    * recompute-on-retry via [[IndexStore.rewriteWith]], so a concurrent
    * add/delete conflict re-derives against the winner. */
  def deleteFromIndex(spark: SparkSession, root: String, ids: DataFrame,
      idCol: String = "doc_id"): Unit = {
    val del = ids.select(col(idCol).as("doc_id")).distinct()
    IndexStore.rewriteWith(spark, s"$root/postings",
      partCol = Some("__shard"), sortCols = Seq("term", "doc_id")) { () =>
      val cur = IndexStore.read(spark, s"$root/postings")
      val touched = cur.join(del, Seq("doc_id"), "left_semi")
        .select("__shard").distinct()
        .collect().map(_.getInt(0)).toSeq
      val kept = cur.where(col("__shard").isin(touched.map(Int.box): _*))
        .join(del, Seq("doc_id"), "left_anti")
      (kept, Some(touched))
    }
    IndexStore.rewriteWith(spark, s"$root/doclen") { () =>
      (IndexStore.read(spark, s"$root/doclen")
        .join(del, Seq("doc_id"), "left_anti"), None)
    }
  }

  /** Collapse per-add small files: one rewrite per table folding every
    * appended fragment into one file per occupied shard (postings) /
    * one file (doclen). Contents unchanged — the [[Ivf.compactIndex]]
    * maintenance hook for this index. */
  def compactIndex(spark: SparkSession, root: String): Unit = {
    IndexStore.rewriteWith(spark, s"$root/postings",
      partCol = Some("__shard"), sortCols = Seq("term", "doc_id")) { () =>
      (IndexStore.read(spark, s"$root/postings"), None)
    }
    IndexStore.rewriteWith(spark, s"$root/doclen") { () =>
      (IndexStore.read(spark, s"$root/doclen").coalesce(1), None)
    }
  }

  /** Ranked BM25 retrieval from the persisted index. Reads ONLY the
    * query terms' shards (manifest-level file pruning via the portable
    * term hash); corpus statistics (N, avgdl) come from one slim doclen
    * aggregate. Output and arithmetic exactly match
    * [[TextAnalysis.bm25TopK]]: `(query_id, doc_id, score_milli)`. */
  def query(spark: SparkSession, root: String,
      queries: Seq[(Long, Seq[String])], k: Int): DataFrame = {
    import spark.implicits._
    val n = nShardsOf(spark, root)
    val q = queries.flatMap { case (qid, ts) => ts.distinct.map((qid, _)) }
      .toDF("query_id", "term")
    val shards = queries.flatMap(_._2).distinct
      .map(t => (math.floorMod(graft.functions.PortableHash.mix64(
        org.apache.spark.unsafe.types.UTF8String.fromString(t)), n.toLong)).toInt)
      .distinct
    val dl = IndexStore.read(spark, s"$root/doclen").persist()
    try {
      val tot = dl.agg(count(lit(1)), sum("dl")).head()
      val nDocs = tot.getLong(0)
      val totTok = if (tot.isNullAt(1)) 0L else tot.getLong(1)
      val avgdlMilli = if (nDocs == 0) 1L else (1000L * totTok) / nDocs
      val post = IndexStore.read(spark, s"$root/postings",
          partCol = Some("__shard"), parts = Some(shards))
        .join(broadcast(q.select("term").distinct()), Seq("term"))
      val dfreq = post.groupBy("term").agg(count(lit(1)).as("df"))
      val scored = post
        .join(broadcast(dfreq), Seq("term"))
        .join(dl, Seq("doc_id"))
        .join(broadcast(q), Seq("term"))
        .select(col("query_id"), col("doc_id"),
          (F.intLog2(expr(s"${nDocs}L div df")) *
            expr(s"(1000L * 44 * tf * $avgdlMilli) div " +
              s"(20 * tf * $avgdlMilli + 6 * $avgdlMilli + 18000 * dl)"))
            .as("s_term"))
        .groupBy("query_id", "doc_id")
        .agg(sum("s_term").as("score_milli"))
        .where(col("score_milli") > 0)
      Dedup.topKPerKey(scored, k, Seq("query_id"),
          Seq(col("score_milli").desc, col("doc_id").asc))
        .select("query_id", "doc_id", "score_milli")
    } finally dl.unpersist()
  }
}
