package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Ckpt.PinOps

/** Deduplication operators: the reference's keep-latest window dedup (W1,
  * `embeddings-pipeline.py:323`) generalized to top-k, plus the
  * LLM-data-pipeline near-duplicate family (exact, MinHash-LSH, SimHash,
  * n-gram Jaccard, embedding-cosine).
  *
  * Scale notes: every operator here shuffles at most once on its natural
  * key (the dedup key / the LSH bucket), never materializes a quadratic
  * candidate set, and does map-side partial work via higher-order functions
  * on arrays rather than exploding rows where possible.
  */
object Dedup {

  /** W1: keep the newest record per key — `ROW_NUMBER() OVER (PARTITION BY
    * key ORDER BY ord DESC) = 1` (reference `embeddings-pipeline.py:323`;
    * ordering on the ISO-8601 *string* is preserved by callers passing a
    * string column). */
  def latestPerKey(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame =
    topKPerKey(df, 1, keys, order)

  /** Generalized per-key top-k (SURVEY.md §2.7). */
  def topKPerKey(df: DataFrame, k: Int, keys: Seq[String], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= k)
      .drop("__rn")
  }

  /** Exact dedup on a set of columns, keeping the row with the smallest
    * tie-break column (deterministic, unlike `dropDuplicates`). */
  def exact(df: DataFrame, keys: Seq[String], tieBreak: Column): DataFrame =
    topKPerKey(df, 1, keys, Seq(tieBreak.asc))

  /** Per-key document cap with a deterministic pseudo-random pick — the
    * training-data curation op that bounds any one domain/source's share
    * of the corpus. Rows are ranked by a Knuth multiplicative hash of
    * `idCol` (exact integer arithmetic, reproducible in any engine — no
    * `rand()`, no engine-specific hash), so the kept sample is stable
    * across runs and engines. One shuffle on the key.
    *
    * The hash `(id · 2654435761) mod 2^32` is computed overflow-free: a
    * naive Long multiply overflows for ids ≥ ~3.5e9 (throws under ANSI
    * mode — exactly the large-id regime this op targets), so the low
    * 32 bits of the id are split at 2^16 and recombined
    * (`l0·A + ((l1·A) mod 2^16)·2^16, mod 2^32` — every term < 2^48).
    * Identical values to the naive form wherever that form doesn't
    * overflow. */
  def capPerKey(df: DataFrame, k: Int, keys: Seq[String], idCol: String): DataFrame = {
    val A = lit(2654435761L)
    val m = pmod(col(idCol), lit(4294967296L)) // low 32 bits, non-negative
    val l0 = m.bitwiseAND(lit(65535L))
    val l1 = shiftright(m, 16)
    val rank = pmod(l0 * A + pmod(l1 * A, lit(65536L)) * lit(65536L),
      lit(4294967296L))
    topKPerKey(df, k, keys, Seq(rank.asc, col(idCol).asc))
  }

  /** Skew-safe two-phase top-k: identical result to [[topKPerKey]], but a
    * hot key never lands on one reducer. Phase 1 shuffles on
    * (keys, salt) — `saltBuckets` reducers share each key's rows and keep
    * only k each — so phase 2's per-key sort sees at most k·saltBuckets
    * rows per key instead of the key's full row count. Use when a key can
    * hold a disproportionate share of the input (the 100 TB power-law
    * case); plain [[topKPerKey]] is one shuffle cheaper when keys are
    * balanced.
    *
    * @param saltOn plain columns whose hash spreads a key's rows across
    *   buckets (e.g. the row id / timestamp) — deterministic, no `rand()`,
    *   so reruns produce identical results. */
  def topKPerKeySalted(df: DataFrame, k: Int, keys: Seq[String],
      order: Seq[Column], saltOn: Seq[Column], saltBuckets: Int = 32): DataFrame = {
    val salt = pmod(xxhash64(saltOn: _*), lit(saltBuckets))
    val local = topKPerKey(df.withColumn("__salt", salt), k,
      keys :+ "__salt", order).drop("__salt")
    topKPerKey(local, k, keys, order)
  }

  // --------------------------------------------------------------------
  // Text shingles (shared by MinHash / Jaccard)
  // --------------------------------------------------------------------

  /** Distinct word n-gram shingles per document as an array column — one
    * native codegen'd expression ([[graft.functions.WordShingles]]): no
    * explode, no shuffle, no interpreted lambda evals. */
  def withShingles(df: DataFrame, textCol: String, n: Int,
      out: String = "shingles"): DataFrame =
    df.withColumn(out,
      graft.functions.F.wordShingles(split(col(textCol), " "), n))

  /** Exact n-gram Jaccard near-duplicate pairs within a blocking column.
    *
    * Pairs (a, b), a < b, sharing at least one shingle, whose Jaccard
    * similarity >= thresholdNum/thresholdDen. The threshold test is done in
    * *integer* arithmetic (`den*inter >= num*union`), so results are exact
    * and engine-independent. The shingle equi-join is the only shuffle; the
    * blocking column bounds the candidate set (at 100 TB you block by
    * source/partition and run LSH for the unblocked case).
    */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
      blockCol: String, n: Int = 3,
      thresholdNum: Int = 4, thresholdDen: Int = 5): DataFrame = {
    // Blocking is mandatory: without it a common shingle is a hot join key
    // and the equi-join explodes quadratically at scale. For unblocked
    // near-dup detection use minHashLshPairs.
    val sh = withShingles(Par.spread(df), textCol, n)
      .select(col(idCol).as("id"), col(blockCol).as("block"), col("shingles"))
      .withColumn("n_sh", size(col("shingles")))
    // the equi-join key is the engine-portable 64-bit shingle hash, not the
    // shingle text: the exploded join sides exchange 8 bytes per shingle
    // instead of ~n words (the family's dominant shuffle), and the oracle
    // recomputes the identical hash in SQL so the mirror stays bit-exact
    val ex = sh.select(col("id"), col("block"), col("n_sh"),
      explode(transform(col("shingles"), s => graft.functions.F.mix64(s))).as("sh64"))
    val a = ex.toDF("a_id", "block", "a_n", "sh64")
    val b = ex.toDF("b_id", "block", "b_n", "sh64")
    a.join(b, Seq("sh64", "block"))
      .where(col("a_id") < col("b_id"))
      // size-ratio prefilter (AllPairs): J ≥ t ⟹ t·max(|A|,|B|) ≤
      // min(|A|,|B|) — a mismatched-size pair can never clear the
      // threshold, so its matched-shingle rows are dropped BEFORE the
      // intersection count, shrinking the aggregation's input for free
      // (exact integer arithmetic; output unchanged)
      .where(lit(thresholdDen) * least(col("a_n"), col("b_n")) >=
        lit(thresholdNum) * greatest(col("a_n"), col("b_n")))
      .groupBy(col("a_id"), col("b_id"), col("a_n"), col("b_n"))
      .agg(count(lit(1)).as("inter"))
      .where(lit(thresholdDen) * col("inter") >=
        lit(thresholdNum) * (col("a_n") + col("b_n") - col("inter")))
      .select(col("a_id"), col("b_id"),
        (col("inter").cast("double") /
          (col("a_n") + col("b_n") - col("inter")).cast("double")).as("jaccard"))
  }

  /** Crawl-refresh cross-duplication census: per `rateKeyCol` group of
    * the NEW corpus, how many documents are n-gram-Jaccard near-dups of
    * some OLD-corpus document — the first number a crawl pipeline reads
    * after a refresh ("how much of this snapshot is already in the
    * lake"). Ids must be unique ACROSS both inputs (the pipeline's key
    * contract). Output `(rateKey, n_new, n_dup, dup_permille)` with the
    * rate in exact integer permille; new-vs-new duplication is NOT
    * counted (that is [[dedupSurvivors]]'s job on the new half alone).
    *
    * Shape: one [[ngramJaccardPairs]] over the union (the family's
    * blocked equi-join on 8-byte hashes — never all-pairs), the
    * endpoints split by two id-table semi joins, one group-keyed count.
    * Cost is the pair stage's; the census adds |pairs| + |new| rows of
    * work. */
  def crossDupRate(oldDf: DataFrame, newDf: DataFrame, idCol: String,
      textCol: String, blockCol: String, rateKeyCol: String, n: Int = 3,
      thresholdNum: Int = 4, thresholdDen: Int = 5): DataFrame = {
    def side(df: DataFrame) = df.select(col(idCol), col(textCol), col(blockCol))
    val pairs = ngramJaccardPairs(side(oldDf).unionByName(side(newDf)),
      idCol, textCol, blockCol, n, thresholdNum, thresholdDen)
    val oldIds = oldDf.select(col(idCol).as("__oid"))
    val newIds = newDf.select(col(idCol).as("__nid"))
    // (r18 note, measured and kept as-is: the double reference of
    // `pairs` below is cheap at runtime — the pair stage ends in an
    // exchange-bounded aggregate, so exchange reuse evaluates the
    // shingle self-join once and only the final agg re-runs per branch.
    // Both a localCheckpoint of `pairs` (1.11 → 1.84 s) and a
    // single-reference explode-both-orientations rewrite (→ 1.26 s)
    // benched SLOWER than this form at sf0.1.)
    val ends = pairs.select(col("a_id").as("x"), col("b_id").as("y"))
      .unionAll(pairs.select(col("b_id").as("x"), col("a_id").as("y")))
    val dupNew = ends
      .join(broadcast(oldIds), col("y") === col("__oid"), "left_semi")
      .join(newIds, col("x") === col("__nid"), "left_semi")
      .select(col("x").as("__dup_id")).distinct()
    newDf.join(dupNew, col(idCol) === col("__dup_id"), "left")
      .groupBy(col(rateKeyCol))
      .agg(count(lit(1)).as("n_new"),
        count(col("__dup_id")).as("n_dup"),
        expr("count(__dup_id) * 1000 div count(1)").as("dup_permille"))
  }

  /** Asymmetric CONTAINMENT pairs: C(A,B) = |A∩B| / min(|A|,|B|) ≥ t.
    * Jaccard misses the quote/subset case — a short document wholly
    * contained in a long one has tiny |A∩B|/|A∪B| but containment 1.0
    * (boilerplate inclusions, quoted replies, article + pull-quote).
    * Same blocked shingle equi-join shape as [[ngramJaccardPairs]] (one
    * shuffle on (shingle, block), map-side partial counts, never
    * all-pairs); the threshold is exact integer arithmetic and the
    * reported score divides by the SMALLER set so the pair survives
    * whichever side is the fragment. */
  def ngramContainmentPairs(df: DataFrame, idCol: String, textCol: String,
      blockCol: String, n: Int = 3,
      thresholdNum: Int = 9, thresholdDen: Int = 10): DataFrame = {
    val sh = withShingles(Par.spread(df), textCol, n)
      .select(col(idCol).as("id"), col(blockCol).as("block"), col("shingles"))
      .withColumn("n_sh", size(col("shingles")))
      .where(col("n_sh") > 0)
    // hashed join key — see ngramJaccardPairs
    val ex = sh.select(col("id"), col("block"), col("n_sh"),
      explode(transform(col("shingles"), s => graft.functions.F.mix64(s))).as("sh64"))
    val a = ex.toDF("a_id", "block", "a_n", "sh64")
    val b = ex.toDF("b_id", "block", "b_n", "sh64")
    a.join(b, Seq("sh64", "block"))
      .where(col("a_id") < col("b_id"))
      .groupBy(col("a_id"), col("b_id"), col("a_n"), col("b_n"))
      .agg(count(lit(1)).as("inter"))
      .where(lit(thresholdDen) * col("inter") >=
        lit(thresholdNum) * least(col("a_n"), col("b_n")))
      .select(col("a_id"), col("b_id"),
        (col("inter").cast("double") /
          least(col("a_n"), col("b_n")).cast("double")).as("containment"))
  }

  /** [[ngramJaccardPairs]] with PPJoin-style prefix filtering — same exact
    * output, far fewer candidates at high thresholds.
    *
    * Theorem (AllPairs/PPJoin): under any GLOBAL total order of shingles,
    * two sets with Jaccard ≥ t must share an element within each other's
    * first `|S| − ⌈t·|S|⌉ + 1` shingles. Ordering by ascending corpus
    * frequency (rarest first) makes those prefixes maximally selective, so
    * the candidate join explodes only on rare shingles. At t = 0.8 the
    * prefix is ~20% of each document's shingles — a ~25× cut in join
    * pairs vs the exhaustive shared-shingle join. Verification computes
    * exact Jaccard on the FULL shingle sets, so results are identical to
    * the exhaustive operator.
    */
  def ngramJaccardPairsPrefix(df: DataFrame, idCol: String, textCol: String,
      blockCol: String, n: Int = 3,
      thresholdNum: Int = 4, thresholdDen: Int = 5): DataFrame = {
    // pin: the shingle table feeds the frequency census, the ranked
    // prefix, AND both verification sides — unpinned, the tokenize +
    // shingle pass over the corpus ran for every reference (r18 plan
    // audit: 6 copies of the source scan). One materialization; the
    // shingle arrays are the same order of bytes as the text itself.
    val sh = withShingles(Par.spread(df), textCol, n)
      .select(col(idCol).as("id"), col(blockCol).as("block"), col("shingles"))
      .withColumn("n_sh", size(col("shingles")))
      .where(col("n_sh") > 0)
      .pin()
    // the census and candidate join key on the portable 64-bit shingle
    // hash (slim exchanges); the rank tie-break keeps the string — that
    // column rides the per-doc rank exchange anyway — so the global order
    // is total even under a hash collision, and a collision can only ADD
    // candidates (same-hash prefixes join), which exact verification on
    // the full string sets then discards: output is collision-proof
    val ex = sh.select(col("id"), col("block"), col("n_sh"),
      explode(col("shingles")).as("shingle"))
      .withColumn("sh64", graft.functions.F.mix64(col("shingle")))
    // global shingle frequency → rank each doc's shingles rarest-first
    val freq = ex.groupBy("sh64").agg(count(lit(1)).as("__freq"))
    val ranked = ex.join(freq, "sh64")
      .withColumn("__rn", row_number().over(
        Window.partitionBy("id").orderBy(col("__freq"), col("shingle"))))
    // prefix length = n_sh − ⌈t·n_sh⌉ + 1, in exact integer arithmetic
    val prefLen = col("n_sh") -
      ((lit(thresholdNum) * col("n_sh") + lit(thresholdDen - 1))
        .divide(lit(thresholdDen))).cast("long") + 1
    val pref = ranked.where(col("__rn") <= prefLen)
      .select(col("id"), col("block"), col("sh64"))
    val cand = pref.toDF("a_id", "block", "sh64")
      .join(pref.toDF("b_id", "block", "sh64"), Seq("sh64", "block"))
      .where(col("a_id") < col("b_id"))
      .select("a_id", "b_id").dropDuplicates("a_id", "b_id")
    // exact verification on full shingle sets
    val full = sh.select(col("id"), col("shingles"))
    val verified = cand
      .join(full.select(col("id").as("a_id"), col("shingles").as("a_sh")), "a_id")
      .join(full.select(col("id").as("b_id"), col("shingles").as("b_sh")), "b_id")
    val inter = size(array_intersect(col("a_sh"), col("b_sh")))
    val union = size(col("a_sh")) + size(col("b_sh")) - inter
    verified
      .where(lit(thresholdDen) * inter >= lit(thresholdNum) * union)
      .select(col("a_id"), col("b_id"),
        (inter.cast("double") / union.cast("double")).as("jaccard"))
  }

  // --------------------------------------------------------------------
  // MinHash + LSH
  /** End-to-end near-duplicate REMOVAL: pairs → duplicate clusters →
    * one canonical survivor per cluster — the composed operation a
    * training-data pipeline actually runs (the pair/component queries are
    * its observable stages). Clusters come from
    * [[graft.operators.Graph.connectedComponents]] over the exact
    * blocked-Jaccard pairs; the survivor is the cluster's minimum id
    * (deterministic), and documents in no pair pass through untouched.
    *
    * Scale shape: the drop list is only the duplicate cluster members —
    * a small fraction of the corpus — so the final LEFT ANTI join
    * broadcasts under AQE; the corpus is never shuffled on anything but
    * the pair machinery's own keys. Swap the pair stage for
    * [[minHashLshPairs]] when blocking keys aren't available. */
  def dedupSurvivors(df: DataFrame, idCol: String, textCol: String,
      blockCol: String, n: Int = 3, thresholdNum: Int = 4,
      thresholdDen: Int = 5): DataFrame = {
    val pairs = ngramJaccardPairs(df, idCol, textCol, blockCol,
      n, thresholdNum, thresholdDen)
    survivorsFromComponents(df, idCol,
      Graph.connectedComponents(pairs, "a_id", "b_id"))
  }

  /** Min-id survivor filter over a PRE-COMPUTED component table — the
    * shape to use when several survivor policies share one pair set: run
    * the pair + CC stages ONCE (checkpoint the components), then each
    * policy is a slim decision join instead of its own CC driver loop. */
  def survivorsFromComponents(df: DataFrame, idCol: String,
      comp: DataFrame): DataFrame = {
    val drops = Graph.decisionsFromComponents(comp)
      .where(!col("keep")).select(col("id").as("__drop_id"))
    df.join(drops, col(idCol) === col("__drop_id"), "left_anti")
  }

  /** Quality-policy twin of [[survivorsFromComponents]] (highest
    * `qualityCol` survives each cluster; ties → smallest id). */
  def survivorsFromComponentsBest(df: DataFrame, idCol: String,
      qualityCol: String, comp: DataFrame): DataFrame = {
    val drops = Graph.decisionsFromComponentsBest(comp, df, idCol, qualityCol)
      .where(!col("keep")).select(col("id").as("__drop_id"))
    df.join(drops, col(idCol) === col("__drop_id"), "left_anti")
  }

  /** [[dedupSurvivors]] with a quality-based survivor policy: per duplicate
    * cluster the row with the highest `qualityCol` survives (ties: smallest
    * id) — keep-the-best-copy, the policy production dedup wants when
    * copies differ in completeness. Same pair/component machinery; only
    * the representative choice changes ([[Graph.dedupByPairsBest]]). */
  def dedupSurvivorsBest(df: DataFrame, idCol: String, textCol: String,
      blockCol: String, qualityCol: String, n: Int = 3,
      thresholdNum: Int = 4, thresholdDen: Int = 5): DataFrame = {
    val pairs = ngramJaccardPairs(df, idCol, textCol, blockCol,
      n, thresholdNum, thresholdDen)
    survivorsFromComponentsBest(df, idCol, qualityCol,
      Graph.connectedComponents(pairs, "a_id", "b_id"))
  }

  /** Per-document repeated-span statistics — the aggregate form of
    * exact-substring dedup (spans of k consecutive tokens appearing
    * verbatim in more than one document mark boilerplate / mirrored /
    * templated text that near-dup measures at the whole-document level
    * miss). For each document: its number of DISTINCT k-token spans and
    * how many of those also occur in at least one OTHER document, plus an
    * integer-exact `mostly_duplicated` flag (shared spans ≥ half).
    *
    * Scale shape: span rows ≈ token count (linear), and the span
    * frequency table is an AGGREGATION with map-side combine — no
    * blocking needed, no quadratic candidate set, and (see the in-body
    * note) no plan node that co-locates a hot span's occurrences, unlike
    * pairwise n-gram Jaccard. Spans are distinct per doc (via
    * [[withShingles]]), so a span's occurrence count IS its
    * distinct-document count, and within-doc self-repetition never
    * inflates the shared count. At 100 TB, shuffle the 64-bit portable
    * span hash instead of the span text to slim the exchange (collisions
    * only ever over-count by hash-collision probability).
    */
  def repeatedSpanStats(df: DataFrame, idCol: String, textCol: String,
      k: Int = 3): DataFrame = {
    // Skew-safe two-pass shape. A hot span (a universal k-gram) can occur
    // in a large fraction of ALL documents, so any plan that co-locates a
    // span's occurrences — a COUNT() OVER (PARTITION BY span) window, or
    // a join back on span — puts an unbounded row group on one task. This
    // shape never moves hot-span rows after the map side:
    //   pass 1: explode spans (the one Generate, asserted in PlanSpec) →
    //     groupBy(span){count, min(doc)} — partial aggregation crushes a
    //     hot span to one row per map task; spans with count 1 are owned
    //     by exactly the doc min() names, so per-doc UNIQUE-span counts
    //     need no join back on span at all.
    //   pass 2: map-only (doc_id, size(shingles)) projection — re-reads
    //     text but shuffles nothing.
    // n_shared = n_spans − n_unique, identical output to the direct form.
    val sh = withShingles(Par.spread(df), textCol, k)
      .select(col(idCol).as("doc_id"), col("shingles"))
    // census key = the portable 64-bit span hash (8-byte exchange rows;
    // the oracle hashes identically — see ngramJaccardPairs)
    val ex = sh.select(col("doc_id"),
      explode(transform(col("shingles"), s => graft.functions.F.mix64(s))).as("span"))
    val uniq = ex.groupBy("span")
      .agg(count(lit(1)).as("__n"), min(col("doc_id")).as("__owner"))
      .where(col("__n") === 1)
      .groupBy(col("__owner").as("doc_id"))
      .agg(count(lit(1)).as("n_unique"))
    sh.select(col("doc_id"), size(col("shingles")).cast("long").as("n_spans"))
      .join(uniq, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_spans"),
        (col("n_spans") - coalesce(col("n_unique"), lit(0L))).as("n_shared"))
      .withColumn("mostly_duplicated",
        col("n_spans") > 0 && lit(2) * col("n_shared") >= col("n_spans"))
  }

  /** Exact duplicated-PASSAGE detection (the transform `repeatedSpanStats`
    * only counts): every w-token window whose exact text occurs at least
    * `minOccurrences` times in the corpus marks a character span in each
    * document it occurs in; overlapping/adjacent marked spans merge into
    * maximal passages. Output: one row per (document, merged passage) —
    * `doc_id, span_start, span_end, n_windows` with `[span_start,
    * span_end)` character offsets into the original text ready for
    * [[removeSpans]]. This is the suffix-window form of exact-substring
    * dedup (Lee et al. 2021, "Deduplicating Training Data Makes Language
    * Models Better"): a duplicated passage of L ≥ w tokens is covered by
    * its L − w + 1 duplicated windows, which merge back into the full
    * passage here.
    *
    * Scale shape (100 TB): tokenization + windowing is ONE shuffle on
    * `doc_id` (the window functions share a single partitioning — token
    * prefix-sum offsets, the w-token frame aggregate, and the final span
    * merge all run per-doc); the duplicate-window census is one more
    * shuffle on the window text with map-side partial counts. The
    * join-back of the duplicated-window set rides the SAME window-keyed
    * exchange as the census (sort-merge on `win`; a boilerplate window hot
    * enough to skew a task is exactly what AQE skew-join splits). Nothing
    * quadratic: the census/join key is the engine-portable 64-bit window
    * HASH (`winh` below), so the exchange carries 8 bytes per window, not
    * w tokens of text — the oracle recomputes the identical hash in SQL,
    * and a collision can only merge census counts upward (strictly more
    * windows marked duplicated; sound for a ≥-threshold census). */
  def duplicatedPassageSpans(df: DataFrame, idCol: String, textCol: String,
      w: Int = 8, minOccurrences: Int = 2): DataFrame = {
    // pin (r18): the window table feeds the census AND the hits join —
    // the doc-keyed exchange below it is reused at runtime, but the
    // window COMPUTE above it (per-token frame concat + prefix sums,
    // the family's dominant CPU) re-ran once per consumer. The pinned
    // rows are (doc_id, 2 offsets, 8-byte hash) — far slimmer than the
    // window text they summarize.
    val wins = windowHashes(df, idCol, textCol, w).pin()
    val dup = wins.groupBy("winh").agg(count(lit(1)).as("__n"))
      .where(col("__n") >= minOccurrences).select("winh")
    mergeSpans(wins.join(dup, "winh"))
  }

  /** The passage family's shared window builder: every full `w`-token
    * window of each document as `(doc_id, start_char, end_char, winh)` —
    * exact char offsets into the original text and the engine-portable
    * 64-bit window hash. One doc-keyed exchange; all three window
    * functions (prefix-sum offsets, frame concat, frame count) share it. */
  private[operators] def windowHashes(df: DataFrame, idCol: String,
      textCol: String, w: Int): DataFrame = {
    val toks = Par.spread(df)
      .select(col(idCol).as("doc_id"), posexplode(split(col(textCol), " ")))
      .toDF("doc_id", "i", "tok")
    val byDoc = Window.partitionBy("doc_id").orderBy("i")
    val frame = byDoc.rowsBetween(0, w - 1)
    val before = byDoc.rowsBetween(Window.unboundedPreceding, -1)
    toks
      // char offset of token i = Σ_{j<i} (len(tok_j) + 1 joiner char) —
      // exact for the single-space tokenization split() inverts
      .withColumn("start_char",
        coalesce(sum(length(col("tok")).cast("long") + 1L).over(before), lit(0L)))
      .withColumn("win", concat_ws(" ", collect_list(col("tok")).over(frame)))
      .withColumn("__wn", count(lit(1)).over(frame))
      // all-blank windows (runs of empty tokens from consecutive spaces)
      // carry no content and would cross-match every whitespace run in the
      // corpus — drop them before the census
      .where(col("__wn") === w && trim(col("win")) =!= "")
      // census + join key = the engine-portable 64-bit hash of the window,
      // not the window text: the census exchange and the hits join carry
      // 8 bytes per window instead of ~w tokens of text (the passage
      // family's dominant shuffle at corpus scale). The oracle recomputes
      // the same hash in SQL, so this stays exactly mirrorable.
      .select(col("doc_id"), col("start_char"),
        (col("start_char") + length(col("win"))).as("end_char"),
        graft.functions.F.mix64(col("win")).as("winh"))
  }

  /** Merge overlapping/adjacent marked windows into maximal per-doc
    * passages: a window starts a new passage iff it begins past the
    * running max end of everything before it. */
  private[operators] def mergeSpans(hits: DataFrame): DataFrame = {
    val order = Window.partitionBy("doc_id").orderBy("start_char", "end_char")
    val runMax = order.rowsBetween(Window.unboundedPreceding, -1)
    hits
      .withColumn("__newgrp",
        when(col("start_char") > coalesce(max(col("end_char")).over(runMax),
          lit(-1L)), 1L).otherwise(0L))
      .withColumn("__grp",
        sum(col("__newgrp")).over(order.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("doc_id"), col("__grp"))
      .agg(min("start_char").as("span_start"), max("end_char").as("span_end"),
        count(lit(1)).as("n_windows"))
      .select("doc_id", "span_start", "span_end", "n_windows")
  }

  /** One-call passage dedup: the corpus back with every duplicated
    * passage spliced out of `textCol` ([[duplicatedPassageSpans]] →
    * per-doc span collection → [[removeSpans]]); untouched documents pass
    * through unchanged. The span table is tiny relative to the corpus
    * (only docs with duplicated windows appear), so the join broadcasts
    * at any realistic duplication rate. */
  def removeDuplicatedPassages(df: DataFrame, idCol: String, textCol: String,
      w: Int = 8, minOccurrences: Int = 2): DataFrame = {
    val spans = duplicatedPassageSpans(df, idCol, textCol, w, minOccurrences)
      .groupBy(col("doc_id").as(idCol))
      .agg(sort_array(collect_list(struct(col("span_start"), col("span_end"))))
        .as("__spans"))
    df.join(spans, Seq(idCol), "left")
      .withColumn(textCol, removeSpans(col(textCol), col("__spans")))
      .drop("__spans")
  }

  /** Cut an ascending, non-overlapping `array<struct<span_start, span_end>>`
    * of character ranges (i.e. [[duplicatedPassageSpans]] output collected
    * per doc) out of `text`. Pure codegen'd higher-order `aggregate` — the
    * accumulator carries (kept-so-far, resume-position); no UDF, no
    * explode, no shuffle. */
  def removeSpans(text: Column, spans: Column): Column = {
    val spliced = aggregate(spans,
      struct(lit("").as("sb"), lit(0L).as("pos")),
      (acc, s) => struct(
        concat(acc("sb"), text.substr((acc("pos") + 1L).cast("int"),
          (s("span_start") - acc("pos")).cast("int"))).as("sb"),
        s("span_end").as("pos")),
      acc => concat(acc("sb"),
        text.substr((acc("pos") + 1L).cast("int"), length(text))))
    when(spans.isNull || size(spans) === 0, text).otherwise(spliced)
  }

  // --------------------------------------------------------------------

  /** Per-document MinHash signature (numHashes universal-hash permutations
    * over engine-portable [[graft.functions.PortableHash]] shingle
    * hashes) — a single native codegen'd expression
    * ([[graft.functions.MinHashSig]]): one tight loop per row, no explode,
    * no extra shuffle, no interpreted lambda evals. */
  def withMinHashSignature(df: DataFrame, shinglesCol: String,
      numHashes: Int, seed: Long = 42L, out: String = "minhash"): DataFrame =
    df.withColumn(out, graft.functions.F.minHashSig(col(shinglesCol), numHashes, seed))

  /** MinHash-LSH near-duplicate candidate pairs, verified with exact
    * Jaccard over the shingle sets.
    *
    * Pipeline: shingle → signature (map-side) → explode into `bands`
    * (id, band, band_hash) rows — the shingle arrays do NOT ride through
    * the explode (at 32 bands that would be ~32× the shuffle volume);
    * they are joined back only for the candidate pairs that survive the
    * bucket join. Band/row counts tune the S-curve; candidates are deduped
    * before verification.
    */
  def minHashLshPairs(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, numHashes: Int = 128, bands: Int = 32,
      threshold: Double = 0.8, seed: Long = 42L): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val sig = withMinHashSignature(
      withShingles(Par.spread(df), textCol, n), "shingles", numHashes, seed)
      .select(col(idCol).as("id"), col("shingles"), col("minhash"))

    // Slim band rows: 3 fixed-width columns per row, nothing else. Band
    // hashing is a native expression over the materialized signature — an
    // HOF lambda here would re-inline (and re-compute) the signature per
    // band via CollapseProject.
    val banded = sig.select(col("id"),
      posexplode(graft.functions.F.minHashBands(col("minhash"), bands))
        .as(Seq("band", "band_hash")))

    val l = banded.select(col("id").as("a_id"), col("band"), col("band_hash"))
    val r = banded.select(col("id").as("b_id"), col("band"), col("band_hash"))
    val cand = l.join(r, Seq("band", "band_hash"))
      .where(col("a_id") < col("b_id"))
      .select("a_id", "b_id")
      .dropDuplicates("a_id", "b_id")

    // Verification join: shingle sets fetched once per surviving candidate.
    val shin = sig.select(col("id"), col("shingles"))
    val verified = cand
      .join(shin.select(col("id").as("a_id"), col("shingles").as("a_sh")), "a_id")
      .join(shin.select(col("id").as("b_id"), col("shingles").as("b_sh")), "b_id")

    val inter = size(array_intersect(col("a_sh"), col("b_sh"))).cast("double")
    val union = (size(col("a_sh")) + size(col("b_sh"))).cast("double") - inter
    verified.withColumn("jaccard", when(union > 0, inter / union).otherwise(lit(0.0)))
      .where(col("jaccard") >= threshold)
      .select("a_id", "b_id", "jaccard")
  }

  /** The two persistable MinHash index tables for `df`:
    * sigs (id, minhash ARRAY<LONG>) and bands (id, band, band_hash) —
    * what an incremental/streaming dedup stores so later batches join
    * against stored bands instead of recomputing signatures over the
    * whole accumulated corpus. Bands are slim on purpose (storing the
    * signature on the exploded band rows would be a `bands`× blowup). */
  def minHashIndex(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, numHashes: Int = 128, bands: Int = 32,
      seed: Long = 42L): (DataFrame, DataFrame) = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val sig = withMinHashSignature(
      withShingles(Par.spread(df), textCol, n), "shingles", numHashes, seed)
      .select(col(idCol).as("id"), col("minhash"))
    (sig, bandRows(sig, bands))
  }

  /** One stored table of a persisted MinHash near-dup index (`"sigs"` or
    * `"bands"`, [[minHashIndex]] layout) — resolves the [[IndexStore]]
    * snapshot, or reads a legacy plain dir as-is. */
  def readNearDupIndexTable(spark: org.apache.spark.sql.SparkSession,
      indexPath: String, table: String): DataFrame =
    IndexStore.read(spark, s"$indexPath/$table")

  /** Erase keys from a persisted MinHash near-dup index (sigs + band
    * rows, [[minHashIndex]] layout) — the index-side half of a compliance
    * delete: signatures are content-derived, so an index still holding
    * them is not an erasure. Both tables are slim scalar rows (no text),
    * so the anti-join rewrite costs index-size, not corpus-size; each
    * table's rewrite commits atomically through [[IndexStore]] (manifest
    * + pointer — round 8), so a crash mid-erasure leaves the previous
    * index fully readable and no commit path renames a directory. */
  def deleteFromNearDupIndex(spark: org.apache.spark.sql.SparkSession,
      indexPath: String, keys: DataFrame, keyCol: String = "id"): Unit = {
    val ks = keys.select(col(keyCol).as("id")).distinct()
    Seq("sigs", "bands").foreach { t =>
      val root = s"$indexPath/$t"
      if (IndexStore.exists(spark, root))
        // compute-in-loop: a conflict with a concurrent index append
        // re-reads the winner's snapshot instead of recommitting an
        // anti-join pinned to pre-conflict files (ADVICE r8)
        IndexStore.rewriteWith(spark, root)(() =>
          (IndexStore.read(spark, root).join(ks, Seq("id"), "left_anti"), None))
    }
  }

  /** Compact a persisted MinHash near-dup index: every streaming
    * micro-batch APPENDS its survivors' rows ([[minHashPairsAgainstIndex]]
    * maintenance in `IncrementalStream`), so sigs/bands accumulate one
    * file set per batch — the same streaming-ingest tax
    * [[Ivf.compactIndex]] pays for IVF cells; candidate-join cost
    * becomes file-count-bound instead of row-bound. Rewrites each table
    * to ~`spark.sql.shuffle.partitions` files in one [[IndexStore]]
    * snapshot commit (compute-in-loop: a conflict with a concurrent
    * batch append retries against the winner's rows). Run it on the
    * [[Ivf.compactIndex]] cadence — a periodic maintenance job. */
  def compactNearDupIndex(spark: org.apache.spark.sql.SparkSession,
      indexPath: String): Unit =
    Seq("sigs", "bands").foreach { t =>
      val root = s"$indexPath/$t"
      if (IndexStore.exists(spark, root))
        IndexStore.rewriteWith(spark, root)(() =>
          (IndexStore.read(spark, root).repartition(
            spark.sessionState.conf.numShufflePartitions), None))
    }

  /** Slim (id, band, band_hash) rows derived from an (id, minhash)
    * signature frame — split out so a caller that persists the signatures
    * (one pass over the text per micro-batch) can derive the band rows
    * from the CACHED sigs instead of re-running the signature lineage. */
  def bandRows(sigs: DataFrame, bands: Int): DataFrame =
    sigs.select(col("id"),
      posexplode(graft.functions.F.minHashBands(col("minhash"), bands))
        .as(Seq("band", "band_hash")))

  /** Near-duplicate pairs of a (small) batch AGAINST a persisted MinHash
    * index — the incremental twin of [[minHashLshPairs]]: candidates come
    * from the batch-bands × stored-bands equi-join, and verification is
    * the ESTIMATED Jaccard (fraction of agreeing signature components —
    * unbiased, σ = √(J(1−J)/numHashes) ≈ 0.03 at 128 hashes), so the
    * accumulated corpus is never rescanned and its text never reread.
    * Output: (batch_id, index_id, est_jaccard). */
  def minHashPairsAgainstIndex(batchSigs: DataFrame, batchBands: DataFrame,
      storedSigs: DataFrame, storedBands: DataFrame,
      numHashes: Int, threshold: Double): DataFrame = {
    val cand = batchBands.select(col("id").as("batch_id"), col("band"), col("band_hash"))
      .join(storedBands.select(col("id").as("index_id"), col("band"), col("band_hash")),
        Seq("band", "band_hash"))
      .where(col("batch_id") =!= col("index_id"))
      .select("batch_id", "index_id").dropDuplicates("batch_id", "index_id")
    val verified = cand
      .join(batchSigs.select(col("id").as("batch_id"), col("minhash").as("b_sig")),
        "batch_id")
      .join(storedSigs.select(col("id").as("index_id"), col("minhash").as("t_sig")),
        "index_id")
    val agreeing = aggregate(
      zip_with(col("b_sig"), col("t_sig"), (x, y) => when(x === y, 1).otherwise(0)),
      lit(0), (acc, v) => acc + v)
    verified.withColumn("est_jaccard", agreeing.cast("double") / numHashes)
      .where(col("est_jaccard") >= threshold)
      .select("batch_id", "index_id", "est_jaccard")
  }

  // --------------------------------------------------------------------
  // SimHash
  // --------------------------------------------------------------------

  /** 64-bit SimHash over engine-portable word hashes — a single native
    * codegen'd expression ([[graft.functions.SimHash64]]): for each bit j,
    * sum +1/-1 weighted by bit j of each word's
    * [[graft.functions.PortableHash.mix64]]; sign becomes the signature
    * bit. */
  def withSimHash(df: DataFrame, textCol: String, out: String = "simhash"): DataFrame =
    df.withColumn(out, graft.functions.F.simHash64(split(col(textCol), " ")))

  /** SimHash near-duplicate pairs with Hamming distance <= maxHamming,
    * found by banding the 64-bit signature into 16-bit chunks (pigeonhole:
    * any pair within Hamming 3 shares at least one of 4 exact chunks) —
    * one shuffle on (band, chunk), then exact `bit_count(xor)` verify. */
  def simHashPairs(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3): DataFrame = {
    // 4 fixed 16-bit chunks give a pigeonhole recall guarantee only for
    // Hamming distance <= 3; larger radii would silently lose pairs.
    require(maxHamming <= 3,
      s"simHashPairs guarantees recall only for maxHamming <= 3 (got $maxHamming)")
    val sig = withSimHash(Par.spread(df), textCol)
      .select(col(idCol).as("id"), col("simhash"))
    val banded = sig.select(col("id"), col("simhash"),
      posexplode(transform(sequence(lit(0), lit(3)),
        b => call_function("shiftrightunsigned", col("simhash"), (b * 16).cast("int"))
          .bitwiseAND(0xFFFFL)))
        .as(Seq("band", "chunk")))
    val l = banded.select(col("id").as("a_id"), col("simhash").as("a_sig"),
      col("band"), col("chunk"))
    val r = banded.select(col("id").as("b_id"), col("simhash").as("b_sig"),
      col("band"), col("chunk"))
    l.join(r, Seq("band", "chunk"))
      .where(col("a_id") < col("b_id"))
      .dropDuplicates("a_id", "b_id")
      .withColumn("hamming", bit_count(col("a_sig").bitwiseXOR(col("b_sig"))))
      .where(col("hamming") <= maxHamming)
      .select(col("a_id"), col("b_id"), col("hamming").cast("int").as("hamming"))
  }

  // --------------------------------------------------------------------
  // Embedding cosine near-dup
  // --------------------------------------------------------------------

  /** Exact cosine near-duplicate pairs via self-join — quadratic, for
    * bounded inputs / verification. The scale path is
    * [[cosineNearDupPairsLsh]]. */
  def cosineNearDupPairs(emb: DataFrame, idCol: String, vecCol: String,
      threshold: Double): DataFrame = {
    // spread: the cross join's parallelism is the stream side's partition
    // count — a single-split embedding table would score on one core.
    val a = Par.spread(emb).select(col(idCol).as("a_id"), col(vecCol).as("a_v"))
    val b = emb.select(col(idCol).as("b_id"), col(vecCol).as("b_v"))
    a.crossJoin(b).where(col("a_id") < col("b_id"))
      .withColumn("cos", graft.functions.F.cosineSim(col("a_v"), col("b_v")))
      .where(col("cos") >= threshold)
      .select("a_id", "b_id", "cos")
  }

  /** Occupancy-matched SRP plane count: `planes = ceil(log₂(n /
    * targetBucketRows))`, clamped to [4, 30]. Expected bucket occupancy
    * `n / 2^planes` then sits in `(targetBucketRows/2, targetBucketRows]`
    * whatever the corpus size, so the within-bucket QUADRATIC candidate
    * volume per bucket stays ~constant as the corpus grows — the
    * `planes ~ log₂(n)` scaling law measured in SURVEY §6.-1, now the
    * default instead of tribal knowledge. */
  def autoPlanes(nRows: Long, targetBucketRows: Int = 64): Int = {
    require(targetBucketRows > 0, "targetBucketRows must be positive")
    val raw = math.ceil(
      math.log(math.max(1.0, nRows.toDouble / targetBucketRows)) / math.log(2.0))
    math.max(4, math.min(30, raw.toInt))
  }

  /** Sentinel `planes` value: size the plane count from the corpus via
    * [[autoPlanesFor]]'s plan-statistics estimate. Zero Spark jobs fire
    * at plan construction (DedupSpec asserts this) — pass an explicit
    * positive `planes` when the caller wants a specific granularity. */
  val AutoPlanes: Int = 0

  /** Row-count estimate for [[autoPlanes]] from the OPTIMIZER'S plan
    * statistics — no Spark job at plan construction (the round-12 version
    * ran an eager `df.count()`, a hidden job inside what reads as lazy
    * DataFrame construction). Local relations carry an exact `rowCount`;
    * file scans fall back to `sizeInBytes / (4·dim + 24)` (float32 vector
    * + id/offset overhead — embeddings are near-incompressible, so disk
    * bytes ≈ in-memory bytes). autoPlanes only consumes log2 of the
    * estimate, so even a 2x size-estimate error moves the result by ±1
    * plane — an occupancy knob, never a correctness knob. */
  def autoPlanesFor(df: DataFrame, dim: Int, targetBucketRows: Int = 64): Int = {
    val stats = df.queryExecution.optimizedPlan.stats
    val est = stats.rowCount match {
      case Some(rc) => rc.min(BigInt(Long.MaxValue)).toLong.max(1L)
      case None =>
        val rowBytes = 4L * dim + 24L
        (stats.sizeInBytes / rowBytes).min(BigInt(Long.MaxValue)).toLong.max(1L)
    }
    autoPlanes(est, targetBucketRows)
  }

  /** Sign-random-projection LSH cosine near-dup: bucket on the bit pattern
    * of `planes` random hyperplane signs, candidate pairs within buckets,
    * exact cosine verify. `tables` independent bucketings (different random
    * hyperplanes) are unioned before verification — the standard multi-table
    * LSH recall boost: a near pair is found if it collides in ANY table.
    * More planes → smaller buckets (quadratic within-bucket pairing stays
    * bounded); more tables → recall back up. One shuffle per table on the
    * bucket key.
    *
    * `planes` defaults to [[AutoPlanes]]: occupancy-matched to the corpus
    * row count via [[autoPlanesFor]]'s plan-statistics estimate — zero
    * Spark jobs at plan construction (round 13; the round-11/12 default
    * ran an eager `count()` here) — so doubling the corpus adds one plane
    * and per-bucket candidate volume stays flat (property-tested in
    * DedupSpec). An explicit positive value overrides.
    *
    * BEHAVIOR CHANGE (round 11): the default was a fixed `planes = 16`
    * before auto-sizing landed. Callers that relied on 16-plane bucket
    * granularity (recall/candidate-volume trade) should pass an explicit
    * value — the auto default favors flat occupancy over call-site
    * stability.
    *
    * @param dim embedding width — a schema constant (e.g.
    *   `Schemas.EmbeddingDim`), never sniffed from the data: reading the
    *   first row would launch a driver-side job at plan construction.
    */
  def cosineNearDupPairsLsh(emb: DataFrame, idCol: String, vecCol: String,
      threshold: Double, dim: Int, planes: Int = AutoPlanes, tables: Int = 2,
      seed: Long = 42L): DataFrame = {
    require(planes >= 0, "planes must be positive, or AutoPlanes (0) to auto-size")
    val effPlanes = if (planes > 0) planes else autoPlanesFor(emb, dim)
    // ALL table buckets come from ONE projection over ONE scan (an array of
    // per-table SrpBucket values, posexploded to (table, bucket) rows) —
    // a per-table loop would rescan and re-shuffle the corpus `tables`
    // times for hash values that cost nanoseconds to compute.
    val bucketed = withSrpBuckets(Par.spread(emb), vecCol, effPlanes, seed, dim, tables)
      .select(col(idCol).as("id"), col(vecCol).as("v"),
        posexplode(col("__buckets")).as(Seq("__table", "__bucket")))
    val a = bucketed.select(col("id").as("a_id"), col("v").as("a_v"),
      col("__table"), col("__bucket"))
    val b = bucketed.select(col("id").as("b_id"), col("v").as("b_v"),
      col("__table"), col("__bucket"))
    // score before the cross-table dedup — the dedup exchange then moves
    // (a, b, cos) scalars instead of two vectors per candidate row.
    a.join(b, Seq("__table", "__bucket")).where(col("a_id") < col("b_id"))
      .withColumn("cos", graft.functions.F.cosineSim(col("a_v"), col("b_v")))
      .where(col("cos") >= threshold)
      .groupBy("a_id", "b_id").agg(max(col("cos")).as("cos"))
  }

  /** SemDeDup-style semantic dedup of an embedding corpus: SRP-LSH
    * cosine near-dup pairs → connected components → keep the minimum id
    * per semantic cluster (same survivor policy as [[dedupSurvivors]],
    * over vectors instead of shingles). Catches paraphrases and
    * re-encodings that exact/text dedup misses; recall follows the LSH
    * table/plane knobs (the scale trade SemDeDup makes — the pair stage
    * never forms a quadratic candidate set).
    */
  def semanticDedupSurvivors(emb: DataFrame, idCol: String, vecCol: String,
      threshold: Double, dim: Int, planes: Int = AutoPlanes, tables: Int = 2,
      seed: Long = 42L): DataFrame = {
    val pairs = cosineNearDupPairsLsh(emb, idCol, vecCol, threshold, dim,
      planes, tables, seed)
    val drops = Graph.dedupByPairs(pairs, "a_id", "b_id")
      .where(!col("keep")).select(col("id").as("__drop_id"))
    emb.join(drops, col(idCol) === col("__drop_id"), "left_anti")
  }

  /** All `tables` independent SRP buckets as one array column `__buckets`
    * (table t uses seed + t; each element is one native codegen'd
    * [[graft.functions.SrpBucket]], `dim` from the schema contract — no
    * data-sniffing job; vectors shorter than `dim` contribute only their
    * present components). One projection, one scan: multi-table LSH
    * recall without multi-scan cost. */
  private[operators] def withSrpBuckets(emb: DataFrame, vecCol: String,
      planes: Int, seed: Long, dim: Int, tables: Int): DataFrame =
    emb.withColumn("__buckets", array((0 until tables).map(t =>
      graft.functions.F.srpBucket(col(vecCol), planes, seed + t, dim)): _*))

  /** Empirical SRP-LSH calibration: for each candidate plane count,
    * the bucket-occupancy census the [[autoPlanes]] law predicts —
    * bucket count, max occupancy, total candidate pairs `Σ c(c−1)/2`,
    * and candidate probes per 1000 vectors. This is the measured
    * answer to "what does doubling planes buy me" on the ACTUAL corpus
    * geometry (correlated embeddings crowd buckets far beyond the
    * uniform-hash estimate), read next to the recall harnesses before
    * pinning a production plane count.
    *
    * Scale shape: ONE corpus scan emits (planes, bucket) pairs for
    * every option at once (the ann_lsh single-scan discipline), then
    * two map-side-combined aggregations over slim integer pairs — per
    * option the exchange carries one row per OCCUPIED bucket, never
    * vectors. */
  def lshCalibration(emb: DataFrame, vecCol: String,
      planesOptions: Seq[Int], seed: Long = 42L, dim: Int = 64): DataFrame = {
    require(planesOptions.nonEmpty, "need at least one planes option")
    val pairs = emb.select(explode(array(planesOptions.distinct.map(p =>
        struct(lit(p.toLong).as("planes"),
          graft.functions.F.srpBucket(col(vecCol), p, seed, dim)
            .cast("long").as("bucket"))): _*)).as("x"))
      .select(col("x.planes").as("planes"), col("x.bucket").as("bucket"))
    pairs.groupBy("planes", "bucket")
      .agg(count(lit(1)).as("c"))
      .groupBy("planes")
      .agg(count(lit(1)).as("n_buckets"),
        sum("c").as("n_vectors"),
        max("c").as("max_bucket"),
        sum(expr("c * (c - 1) div 2")).as("cand_pairs"))
      .selectExpr("planes", "CAST(n_buckets AS BIGINT) AS n_buckets",
        "CAST(n_vectors AS BIGINT) AS n_vectors",
        "CAST(max_bucket AS BIGINT) AS max_bucket",
        "CAST(cand_pairs AS BIGINT) AS cand_pairs",
        "CAST(1000 * cand_pairs div greatest(n_vectors, 1) AS BIGINT) " +
          "AS probes_per_kvec")
  }
}

