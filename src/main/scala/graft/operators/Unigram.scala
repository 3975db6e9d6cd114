package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.Ckpt.PinOps

/** Unigram-LM (SentencePiece-style) tokenizer TRAINING and application —
  * the second widely-used subword family next to [[Bpe]] (Kudo 2018,
  * "Subword Regularization", arXiv:1804.10959 — the public algorithm;
  * beyond-reference scope like the rest of the LLM-pipeline family).
  *
  * The literature's trainer is soft-EM (forward–backward expected counts)
  * with loss-based pruning; floats and libm `ln` would make a cross-engine
  * oracle impossible (the exact-TV precedent, Validate.driftTv). This is
  * the deterministic VITERBI-EM variant — hard counts from the single best
  * segmentation per round — with an integer fixed-point log:
  *
  *  - **score arithmetic**: `ilogQ10(c) = m·1024 + ((c − 2^m)·1024 div 2^m)`
  *    where `m = floor(log₂ c)` — a Q10 log-linear interpolation between
  *    powers of two. Monotone in `c`, pure integer ops, bit-identical in
  *    Spark and DuckDB (`length(bin(c))` gives `m+1` in both). A piece's
  *    Viterbi score is `ilogQ10(cnt) − ilogQ10(total)` (≤ 0), so maximizing
  *    the path sum trades piece likelihood against piece COUNT exactly like
  *    the real unigram objective, in exact integers.
  *  - **seed**: every substring of length ≤ [[MaxPieceLen]] of the distinct
  *    (word, freq) table ([[Bpe.wordFrequencies]] — the same corpus-linear
  *    reduction), weighted by word freq (overlaps included); ALL single
  *    chars survive (coverage guarantee) + the top `seedSize` multi-char
  *    pieces by (cnt DESC, piece ASC).
  *  - **EM round**: Viterbi-segment every distinct word under the current
  *    counts (DP over ≤ |word| positions, candidates bounded by
  *    [[MaxPieceLen]]; ties prefer the smaller start — the longer last
  *    piece), count pieces used weighted by word freq; multi-char pieces
  *    with zero usage are pruned, chars floor at count 1.
  *  - **final vocab**: all chars ∪ top multi-char pieces up to `vocabSize`
  *    total, ranked by (cnt DESC, piece ASC).
  *
  * Every step is deterministic integer arithmetic, so the DuckDB oracle
  * replays the WHOLE training run — seed, every round's DP (a
  * `list_reduce` whose accumulator is the growing best-score table), the
  * pointer-walk backtrack, the usage fold — and matches bit for bit
  * (`SparkEntry.unigramTrainCtes`).
  *
  * Scale shape, the [[Bpe.train]] adaptive split: under `maxDriverWords`
  * distinct words the collected table runs the exact loop on the driver
  * (microseconds — the broadcast-build-side justification); above it the
  * distributed loop runs the SAME algorithm as DataFrame rounds — per
  * round one spans⋈scores broadcast join, one `groupBy(w)` building each
  * word's span-score map, the per-row DP/backtrack EXPRESSION (HOF
  * `aggregate`, no UDF, parallel over words), and one piece-usage
  * aggregate bounded by the piece table. Rounds pin through [[Ckpt.pin]]
  * like every other iterative loop. Words longer than [[MaxWordLen]]
  * fall back to single-char segmentation deterministically (both paths,
  * and the oracle, apply the same rule).
  */
object Unigram {

  /** Longest candidate piece (SentencePiece's default neighborhood). */
  val MaxPieceLen = 8

  /** DP-path word-length bound: the span-key encoding and the unrolled
    * oracle both rely on it; longer words segment to single chars. */
  val MaxWordLen = 60

  /** Exact integer Q10 log2 (driver). */
  def ilogQ10(c: Long): Long = {
    require(c >= 1, s"ilogQ10 needs c >= 1, got $c")
    val m = 63 - java.lang.Long.numberOfLeadingZeros(c)
    m.toLong * 1024L + ((c - (1L << m)) * 1024L) / (1L << m)
  }

  /** The same log as a SQL fragment over a BIGINT column/expression. */
  private def ilogQ10Sql(c: String): String = {
    val m = s"(length(bin($c)) - 1)"
    val p2 = s"shiftleft(CAST(1 AS BIGINT), $m)"
    s"($m * 1024 + (($c - $p2) * 1024 div $p2))"
  }

  // ------------------------------------------------------------- plumbing

  /** (w, freq, j, p, piece) spans: every substring start/end of every
    * distinct word — length ≤ [[MaxPieceLen]] for DP-eligible words,
    * single chars only (p = j+1) for words past [[MaxWordLen]], so the
    * char coverage guarantee extends to the fallback tier. */
  private def spans(wf: DataFrame): DataFrame = {
    val n = length(col("w"))
    val jp = flatten(transform(sequence(lit(0), n - 1), j =>
      transform(
        sequence(j + 1,
          when(n <= lit(MaxWordLen), least(j + lit(MaxPieceLen), n))
            .otherwise(j + 1)),
        p => struct(j.cast("int").as("j"), p.cast("int").as("p")))))
    wf.select(col("w"), col("freq"), explode(jp).as("jp"))
      .select(col("w"), col("freq"), col("jp.j").as("j"), col("jp.p").as("p"),
        expr("substring(w, j + 1, p - j)").as("piece"))
  }

  /** Seed counts: all chars + top `seedSize` multi-char substrings. */
  private def seedCounts(sp: DataFrame, seedSize: Int): DataFrame = {
    val seed = sp.groupBy("piece").agg(sum("freq").as("cnt"))
    val chars = seed.where(length(col("piece")) === 1)
    val multi = seed.where(length(col("piece")) > 1)
      .orderBy(col("cnt").desc, col("piece").asc).limit(seedSize)
    chars.unionByName(multi)
  }

  /** Per-word Viterbi under a broadcast (piece → score) table: returns
    * (w, freq, pieces array). The DP is ONE expression per row — the
    * accumulator is the growing best-(score, argj) table, the inner fold
    * scans the ≤ [[MaxPieceLen]] candidate starts, the backtrack walks
    * the argj pointers, all HOF `aggregate`/`transform` (no UDF, no
    * shuffle beyond the span map build). */
  private def segmented(sp: DataFrame, scored: DataFrame): DataFrame = {
    val mapped = sp.where(length(col("w")) <= MaxWordLen)
      .join(broadcast(scored), "piece")
      .groupBy("w", "freq")
      .agg(map_from_entries(collect_list(
        struct((col("j") * 64 + col("p")).as("k"), col("pscore").as("v"))))
        .as("m"))
    val sType = "struct<s:bigint,j:int>"
    val dp = aggregate(
      sequence(lit(1), length(col("w"))),
      array(struct(lit(0L).as("s"), lit(-1).as("j"))),
      (acc, p) => {
        val best = aggregate(
          sequence(greatest(lit(1), p - (MaxPieceLen - 1)), p),
          lit(null).cast(sType),
          (b, jj) => {
            val score = element_at(col("m"), ((jj - 1) * 64 + p).cast("int"))
            val cand = when(score.isNotNull,
              struct((element_at(acc, jj.cast("int")).getField("s") + score).as("s"),
                (jj - 1).cast("int").as("j")))
            when(cand.isNull, b).when(b.isNull, cand)
              .when(cand.getField("s") > b.getField("s") ||
                (cand.getField("s") === b.getField("s") &&
                  cand.getField("j") < b.getField("j")), cand)
              .otherwise(b)
          })
        concat(acc, array(best))
      })
    val vis = aggregate(
      sequence(lit(1), length(col("w"))),
      array(length(col("w")).cast("int")),
      (v, _) => {
        val last = element_at(v, size(v))
        when(last <= 0, v).otherwise(concat(v,
          array(element_at(col("d"), (last + 1).cast("int")).getField("j"))))
      })
    val pieces = reverse(transform(sequence(lit(1), size(col("vis")) - 1),
      i => col("w").substr(
        element_at(col("vis"), (i + 1).cast("int")) + 1,
        element_at(col("vis"), i.cast("int")) -
          element_at(col("vis"), (i + 1).cast("int")))))
    mapped
      .withColumn("d", dp)
      .withColumn("vis", vis)
      .select(col("w"), col("freq"), pieces.as("pieces"))
  }

  /** (piece → pscore) under the current counts, total folded in lazily
    * (broadcast one-row aggregate — no driver action at construction). */
  private def scoresOf(counts: DataFrame): DataFrame =
    counts.crossJoin(broadcast(counts.agg(sum("cnt").as("__t"))))
      .select(col("piece"),
        (expr(ilogQ10Sql("cnt")) - expr(ilogQ10Sql("__t"))).as("pscore"))

  /** One EM round: Viterbi usage under `counts`, then floor/prune. */
  private def emRound(wf: DataFrame, sp: DataFrame, counts: DataFrame): DataFrame = {
    val seg = segmented(sp, scoresOf(counts))
    val usage = seg.select(col("freq"), explode(col("pieces")).as("piece"))
      .unionByName(
        // char fallback for past-MaxWordLen words — same rule as the
        // driver path and the oracle
        wf.where(length(col("w")) > MaxWordLen)
          .select(col("freq"),
            explode(transform(sequence(lit(1), length(col("w"))),
              i => col("w").substr(i, lit(1)))).as("piece")))
      .groupBy("piece").agg(sum("freq").as("usage"))
    counts.join(usage, Seq("piece"), "left")
      .select(col("piece"),
        when(length(col("piece")) === 1,
          greatest(coalesce(col("usage"), lit(0L)), lit(1L)))
          .otherwise(coalesce(col("usage"), lit(0L))).as("cnt"))
      .where(length(col("piece")) === 1 || col("cnt") > 0)
  }

  /** Chars ∪ top multi-char pieces up to `vocabSize` total, ranked by
    * (cnt DESC, piece ASC) — the final vocabulary REPORT shape. Chars are
    * never cut (the coverage guarantee encode relies on). */
  private def finalVocab(counts: DataFrame, vocabSize: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("cnt").desc, col("piece").asc)
    val chars = counts.where(length(col("piece")) === 1)
    val multi = counts.where(length(col("piece")) > 1)
      .withColumn("__r", row_number().over(w))
    val nChars = chars.agg(count(lit(1)).as("__nc"))
    val kept = multi.crossJoin(broadcast(nChars))
      .where(col("__r") <= greatest(lit(vocabSize) - col("__nc"), lit(0)))
      .drop("__r", "__nc")
    chars.unionByName(kept)
      .withColumn("rank", row_number().over(w).cast("long"))
      .select("rank", "piece", "cnt")
  }

  // ------------------------------------------------------------- training

  /** Train the unigram vocabulary: (rank, piece, cnt). Adaptive split on
    * distinct words, the [[Bpe.train]] posture — identical output on both
    * paths (spec-pinned). */
  def train(df: DataFrame, textCol: String, rounds: Int, seedSize: Int,
      vocabSize: Int, maxDriverWords: Long = 1L << 22): DataFrame = {
    require(rounds >= 0 && seedSize >= 0 && vocabSize >= 1)
    val spark = df.sparkSession
    import spark.implicits._
    val wf = Bpe.wordFrequencies(df, textCol)
    if (maxDriverWords > 0 && wf.count() <= maxDriverWords) {
      val words = wf.collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      trainLocal(words, rounds, seedSize, vocabSize)
        .toDF("rank", "piece", "cnt")
    } else {
      val wfp = wf.pin() // loop-invariant: outlives every round
      val sp = spans(wfp).pin()
      val rot = Ckpt.rotator() // bounds reliable-checkpoint storage to 2 rounds
      var counts = rot.pin(seedCounts(sp, seedSize))
      for (_ <- 1 to rounds)
        counts = rot.pin(emRound(wfp, sp, counts))
      finalVocab(counts, vocabSize)
    }
  }

  /** Exact in-memory EM loop over the collected vocab (driver path). */
  private[operators] def trainLocal(words: Seq[(String, Long)], rounds: Int,
      seedSize: Int, vocabSize: Int): Seq[(Long, String, Long)] = {
    var counts = seedLocal(words, seedSize)
    for (_ <- 1 to rounds) counts = emLocal(words, counts)
    finalVocabLocal(counts, vocabSize)
  }

  private[operators] def seedLocal(words: Seq[(String, Long)],
      seedSize: Int): Map[String, Long] = {
    val cnt = scala.collection.mutable.HashMap.empty[String, Long]
    words.foreach { case (w, f) =>
      var j = 0
      while (j < w.length) {
        val hi = if (w.length <= MaxWordLen) math.min(j + MaxPieceLen, w.length)
                 else j + 1
        var p = j + 1
        while (p <= hi) {
          val piece = w.substring(j, p)
          cnt.update(piece, cnt.getOrElse(piece, 0L) + f)
          p += 1
        }
        j += 1
      }
    }
    val chars = cnt.filter(_._1.length == 1)
    val multi = cnt.toSeq.filter(_._1.length > 1)
      .sortBy { case (k, v) => (-v, k) }.take(seedSize)
    (chars ++ multi).toMap
  }

  /** Driver Viterbi — the reference the distributed expression and the
    * oracle both mirror; also the inference-time single-word encoder. */
  def segmentWord(w: String, scores: Map[String, Long]): Seq[String] = {
    if (w.length > MaxWordLen) return w.map(_.toString)
    val n = w.length
    // best(p) = (score, argj); -1 sentinel argj for position 0
    val best = new Array[(Long, Int)](n + 1)
    best(0) = (0L, -1)
    var p = 1
    while (p <= n) {
      var cand: (Long, Int) = null
      var j = math.max(0, p - MaxPieceLen)
      while (j < p) {
        scores.get(w.substring(j, p)) match {
          case Some(sc) if best(j) != null =>
            val s = best(j)._1 + sc
            if (cand == null || s > cand._1 || (s == cand._1 && j < cand._2))
              cand = (s, j)
          case _ =>
        }
        j += 1
      }
      best(p) = cand
      p += 1
    }
    val out = List.newBuilder[String]
    var pos = n
    val rev = scala.collection.mutable.ListBuffer.empty[String]
    while (pos > 0) {
      val j = best(pos)._2
      rev.prepend(w.substring(j, pos))
      pos = j
    }
    out ++= rev
    out.result()
  }

  private def scoreMap(counts: Map[String, Long]): Map[String, Long] = {
    val t = counts.values.sum
    counts.map { case (k, v) => k -> (ilogQ10(v) - ilogQ10(t)) }
  }

  private def emLocal(words: Seq[(String, Long)],
      counts: Map[String, Long]): Map[String, Long] = {
    val sc = scoreMap(counts)
    val usage = scala.collection.mutable.HashMap.empty[String, Long]
    words.foreach { case (w, f) =>
      segmentWord(w, sc).foreach(pc =>
        usage.update(pc, usage.getOrElse(pc, 0L) + f))
    }
    counts.flatMap { case (k, _) =>
      val u = usage.getOrElse(k, 0L)
      if (k.length == 1) Some(k -> math.max(u, 1L))
      else if (u > 0L) Some(k -> u)
      else None
    }
  }

  private def finalVocabLocal(counts: Map[String, Long],
      vocabSize: Int): Seq[(Long, String, Long)] = {
    val chars = counts.filter(_._1.length == 1).toSeq
    val multi = counts.toSeq.filter(_._1.length > 1)
      .sortBy { case (k, v) => (-v, k) }
      .take(math.max(vocabSize - chars.size, 0))
    (chars ++ multi).sortBy { case (k, v) => (-v, k) }
      .zipWithIndex
      .map { case ((k, v), i) => ((i + 1).toLong, k, v) }
  }

  // -------------------------------------------------------------- encode

  /** The trained final vocab as a counts map, for [[encodeViaVocab]] /
    * [[segmentWord]] — collect of the bounded (rank, piece, cnt) table. */
  def vocabCounts(trained: DataFrame): Map[String, Long] =
    trained.select("piece", "cnt").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

  /** (w, n_pieces) over the DISTINCT words of `df` under a trained final
    * vocab, HELD-OUT-safe: a word whose every char is in the vocab (and
    * fits [[MaxWordLen]]) Viterbi-segments; a word carrying an UNKNOWN
    * char — possible when the vocab was trained on a different corpus
    * half — cannot be covered by any piece path, so it deterministically
    * falls back to per-char tokens with unknowns as singleton tokens:
    * `n_pieces = len(w)` (the SentencePiece ⟨unk⟩-per-char posture,
    * mirrored by the oracle's coverage gate). */
  def tokenCounts(df: DataFrame, textCol: String,
      finalCounts: Map[String, Long]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val sc = scoreMap(finalCounts)
    val scored = sc.toSeq.toDF("piece", "pscore")
    val vocabChars = finalCounts.keys.filter(_.length == 1).toSeq.sorted
    val wf = Bpe.wordFrequencies(df, textCol).pin()
    val chars = transform(sequence(lit(1), length(col("w"))),
      i => col("w").substr(i, lit(1)))
    val covered = size(array_except(chars, typedLit(vocabChars))) === 0
    val eligible = wf.where(covered && length(col("w")) <= MaxWordLen)
    val viaDp = segmented(spans(eligible), scored)
      .select(col("w"), size(col("pieces")).cast("long").as("n_pieces"))
    val fallback = wf.where(!covered || length(col("w")) > MaxWordLen)
      .select(col("w"), length(col("w")).cast("long").as("n_pieces"))
    viaDp.unionByName(fallback)
  }

  /** Held-out tokenizer quality per source — the BPE fertility monitor's
    * unigram twin: fertility (subword tokens per word, millitokens) and
    * word-level OOV rate (absence from the TRAIN half's word table) over
    * `test`, under a vocab trained elsewhere. */
  def fertilityReport(test: DataFrame, textCol: String, srcCol: String,
      trainWords: DataFrame, finalCounts: Map[String, Long]): DataFrame = {
    val counts = tokenCounts(test, textCol, finalCounts)
    val seen = trainWords.select(col("w")).distinct()
      .withColumn("__seen", lit(true))
    Par.spread(test)
      .select(col(srcCol), explode(split(col(textCol), " ")).as("w"))
      .where(col("w") =!= "")
      .join(broadcast(counts), "w")
      .join(broadcast(seen), Seq("w"), "left")
      .groupBy(col(srcCol))
      .agg(count(lit(1)).as("n_words"),
        sum(col("n_pieces")).as("n_tokens"),
        expr("sum(n_pieces) * 1000 div count(1)").as("fertility_milli"),
        expr("sum(case when __seen is null then 1 else 0 end) * 1000 div count(1)")
          .as("oov_permille"))
  }

  /** Per-document unigram token stats under a trained final vocab:
    * (idCol, n_words, n_tokens, n_chars) — the [[Bpe.encodeViaVocab]]
    * twin. One corpus scan; the (word → n_pieces) artifact is built once
    * over the DISTINCT words by [[tokenCounts]] (which pins the shared
    * word-frequency table and carries the coverage gate), then broadcast
    * back. When the vocab was trained on (a superset of) `df`, every
    * word is in-coverage by construction and segments via the DP; a word
    * carrying an out-of-vocab char — a violated precondition the old
    * path let flow NULL scores through the DP struct comparisons
    * (ADVICE r14) — now deterministically takes the unk-per-char
    * fallback (`n_pieces = len(w)`) instead of corrupting or silently
    * dropping the word from the inner vocab join. */
  def encodeViaVocab(df: DataFrame, idCol: String, textCol: String,
      finalCounts: Map[String, Long]): DataFrame = {
    val vocab = tokenCounts(df, textCol, finalCounts)
    val words = Par.spread(df)
      .select(col(idCol), explode(split(col(textCol), " ")).as("w"))
      .where(col("w") =!= "")
    words.join(broadcast(vocab), "w")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_words"),
        sum(col("n_pieces")).as("n_tokens"),
        sum(length(col("w"))).cast("long").as("n_chars"))
  }
}
