package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.Ckpt.PinOps

/** Text-analysis operators for training-data pipelines: token counting,
  * quality scoring, language-ID heuristic, document fingerprinting
  * (BASELINE.json north star).
  *
  * Everything is built from codegen'd built-ins and higher-order functions
  * — one narrow projection per operator, no UDFs, no shuffles.
  */
object TextAnalysis {

  val Stopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "for", "on", "with", "as", "at", "by", "be", "this", "that")

  private def words(textCol: Column): Column = split(textCol, " ")

  /** Whitespace token count. */
  def tokenCount(textCol: Column): Column = size(words(textCol)).cast("long")

  /** Mojibake artifact table: the high-frequency UTF-8-bytes-read-as-
    * cp1252/Latin-1 corruptions (ftfy's bread and butter) → the intended
    * character. Each left side is the cp1252 rendering of the right
    * side's UTF-8 bytes (e.g. U+2019 ’ = E2 80 99 → "â€™"); no entry is
    * a substring of another — with ONE deliberate exception: U+201D ”
    * encodes to E2 80 9D whose 0x9D is an unmapped C1 control (invisible
    * in the exact-artifact entry here) that downstream pipelines
    * routinely strip, leaving a bare "â€" — a PREFIX of every other
    * "â€x" artifact. That bare variant therefore sits LAST, firing only
    * after the longer artifacts are consumed. The chain is idempotent on
    * its own output. Curated & bounded by design: an offline table can't
    * cover all of ftfy, and a wrong mapping corrupts silently — the same
    * stance as the CJK fold (SURVEY §7.6.3). */
  val MojibakeTable: Seq[(String, String)] = Seq(
    "â€™" -> "’", "â€˜" -> "‘", "â€œ" -> "“",
    "â€" -> "”", "â€“" -> "–", "â€”" -> "—",
    "â€¢" -> "•", "â€¦" -> "…",
    "Ã©" -> "é", "Ã¨" -> "è", "Ãª" -> "ê", "Ã«" -> "ë",
    "Ã¡" -> "á", "Ã¢" -> "â", "Ã¤" -> "ä", "Ã " -> "à",
    "Ã³" -> "ó", "Ã´" -> "ô", "Ã¶" -> "ö", "Ãº" -> "ú", "Ã¼" -> "ü",
    "Ã­" -> "í", "Ã®" -> "î", "Ã¯" -> "ï",
    "Ã§" -> "ç", "Ã±" -> "ñ", "ÃŸ" -> "ß",
    "Â«" -> "«", "Â»" -> "»", "Â°" -> "°", "Â©" -> "©", "Â®" -> "®",
    "â€" -> "”") // bare stripped-0x9D variant of ” — MUST stay last

  /** Repair mojibake: one codegen'd `replace` chain over [[MojibakeTable]]
    * — a single scan-stage projection, no UDF, engine-portable (the
    * oracle mirrors the chain in SQL). Idempotent: fixed text contains no
    * left-side artifact. */
  def fixMojibake(textCol: Column): Column =
    MojibakeTable.foldLeft(textCol) { case (acc, (bad, good)) =>
      replace(acc, lit(bad), lit(good))
    }

  /** Corruption order for [[corruptToMojibake]]: in the corrupt
    * direction a rule's OUTPUT may contain a LATER rule's input, which
    * would cascade (corrupting – inserts the artifact "â€" + cp1252(93)
    * = "â€" + “, and a later “-rule would re-corrupt that “). This order
    * makes every rule's artifact inert against everything after it:
    * â/©/«/® first (they appear inside other artifacts), the double
    * quotes before the dashes whose artifacts embed them, then the rest
    * (whose artifact second-bytes map to no rule). Derived from
    * [[MojibakeTable]].init — the bare stripped-0x9D ” duplicate would
    * shadow the exact artifact and is excluded. */
  private[graft] val CorruptOrder: Seq[(String, String)] = {
    val byGood = MojibakeTable.init.map { case (b, g) => g -> b }.toMap
    val first = Seq("â", "©", "«", "®", "“", "”", "–", "—")
    val rest = MojibakeTable.init.map(_._2).filterNot(first.contains)
    (first ++ rest).map(g => byGood(g) -> g)
  }

  /** Inverse of [[fixMojibake]] on artifact-free input (corrupt intended
    * chars INTO their cp1252 artifacts) — the roundtrip generator for
    * tests and the oracle. Applies [[CorruptOrder]]; fix∘corrupt is the
    * identity on text that contains no artifact already (a string like a
    * literal "Ã" adjacent to an accented char is indistinguishable from
    * real mojibake — no fixer can roundtrip that). */
  def corruptToMojibake(textCol: Column): Column =
    CorruptOrder.foldLeft(textCol) { case (acc, (bad, good)) =>
      replace(acc, lit(good), lit(bad))
    }

  /** BPE-ish subword count estimate: words are split on a regex of letter
    * runs / digit runs / punctuation, approximating byte-pair tokenizer
    * granularity without a vocab. */
  def subwordCount(textCol: Column): Column =
    size(filter(
      split(textCol, """(?<=[a-zA-Z])(?=[^a-zA-Z\s])|(?<=[^a-zA-Z\s])(?=[a-zA-Z])|\s+"""),
      w => length(w) > 0)).cast("long")

  /** Quality stats: token count, mean token length, stopword count/ratio,
    * punctuation count/ratio — the classic C4-style quality signals. */
  def withQualityStats(df: DataFrame, textCol: String): DataFrame = {
    val ws = words(col(textCol))
    val nTok = size(ws).cast("long")
    val nStop = graft.functions.F.countInSet(ws, Stopwords)
    val nPunct = (length(col(textCol)) -
      length(regexp_replace(col(textCol), """[.,;:!?'"()\[\]]""", ""))).cast("long")
    df.withColumn("n_tokens", nTok)
      .withColumn("mean_token_len",
        (length(col(textCol)) - nTok + 1).cast("double") / nTok.cast("double"))
      .withColumn("n_stopwords", nStop)
      .withColumn("stopword_ratio", nStop.cast("double") / nTok.cast("double"))
      .withColumn("n_punct", nPunct)
      .withColumn("punct_ratio", nPunct.cast("double") / length(col(textCol)).cast("double"))
  }

  /** Intra-document repetition counters (Gopher-style quality signals):
    * appends the six long fields of
    * [[graft.functions.RepetitionStats]] — `n_words`,
    * `n_distinct_words`, `top_word_count`, `n_bigrams`,
    * `n_distinct_bigrams`, `top_bigram_count`. One-pass native
    * expression, per-row ⇒ no shuffle; the six struct-field reads share
    * the underlying expression via whole-stage-codegen subexpression
    * elimination. Ratios (duplicate-word fraction, top-bigram coverage)
    * are integer arithmetic on these counters — see the
    * `repetition_stats` query for the `div`-based engine-exact form. */
  def withRepetitionStats(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("__rep", graft.functions.F.repetitionStats(words(col(textCol))))
      .select((df.columns.map(col) :+ col("__rep.*")).toIndexedSeq: _*)

  /** Per-document top-`k` distinctive terms, ranked by
    * `(tf DESC, df ASC, term ASC)` — term frequency favors what the
    * document repeats, document frequency penalizes corpus-common words.
    * This is TF-IDF's ordering expressed in pure integers (for a fixed
    * tf, TF·IDF is monotone decreasing in df), so results are exact
    * across engines — no float log in sight.
    *
    * 100 TB shape: the (doc, term) counts aggregate partially map-side;
    * the vocabulary table (distinct terms) is orders of magnitude smaller
    * than the corpus, so the df lookup is a broadcast join; the final
    * top-k is one window over the same doc-keyed shuffle as the tf
    * aggregation. */
  def tfIdfTopK(docs: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame = {
    val tf = docs
      .select(col(idCol), explode(words(col(textCol))).as("term"))
      .where(col("term") =!= "")
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    Dedup.topKPerKey(tf.join(broadcast(dfreq), Seq("term")), k, Seq(idCol),
        Seq(col("tf").desc, col("df").asc, col("term").asc))
      .select(col(idCol), col("term"), col("tf"), col("df"))
  }

  /** Corpus-adaptive fluency score — an LM-free perplexity proxy: how
    * many of a document's distinct word bigrams appear in the corpus's
    * own top-`vocabK` bigram vocabulary (ranked by document frequency,
    * ties broken by the bigram string). Fluent text is built from common
    * transitions; word salad and mangled extractions are not. The score
    * is pure integer arithmetic (`familiar_permille`), so the oracle
    * matches exactly — no float log-probabilities.
    *
    * 100 TB shape: two corpus passes, which is inherent (the vocabulary
    * must exist before scoring): (1) bigram df aggregation — map-side
    * partial agg, top-K via TakeOrdered (never a global sort); (2) score
    * pass — the K-row vocabulary is broadcast, the probe is map-side,
    * and the only shuffle carries (id, n_familiar) pairs. */
  def bigramFamiliarity(docs: DataFrame, idCol: String, textCol: String,
      vocabK: Int = 1000): DataFrame = {
    def bigrams(df: DataFrame) = df.select(col(idCol),
      explode(graft.functions.F.wordShingles(words(col(textCol)), 2)).as("b"))
    val vocab = bigrams(Par.spread(docs))
      .groupBy("b").agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("b")).limit(vocabK).select("b")
    val fam = bigrams(Par.spread(docs)).join(broadcast(vocab), "b")
      .groupBy(idCol).agg(count(lit(1)).as("n_familiar"))
    docs.select(col(idCol),
        size(graft.functions.F.wordShingles(words(col(textCol)), 2))
          .cast("long").as("n_bigrams_distinct"))
      .join(fam, Seq(idCol), "left")
      .withColumn("n_familiar", coalesce(col("n_familiar"), lit(0L)))
      .withColumn("familiar_permille",
        expr("CASE WHEN n_bigrams_distinct = 0 THEN 0 " +
          "ELSE n_familiar * 1000 div n_bigrams_distinct END"))
  }

  /** Composite quality bucket from integer-exact threshold tests (engine-
    * independent: no float comparisons). */
  def qualityBucket(df: DataFrame, textCol: String): DataFrame = {
    val ws = words(col(textCol))
    val nTok = size(ws).cast("long")
    val nStop = graft.functions.F.countInSet(ws, Stopwords)
    df.withColumn("quality",
      when(nTok < 5, "too_short")
        .when(nStop * 10 > nTok * 8, "boilerplate") // stopword ratio > 0.8
        .when(nStop === 0, "no_stopwords")
        .otherwise("ok"))
  }

  /** Language-ID heuristic: count marker-word hits per language, pick the
    * argmax with deterministic tie-break on language code. N-gram-free but
    * the same shape as a real n-gram scorer (the markers are the model). */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht"),
    "en" -> Seq("the", "and", "is", "of", "to", "it"),
    "es" -> Seq("el", "la", "los", "es", "y", "que"),
    "fr" -> Seq("le", "la", "les", "et", "est", "que"),
    "zh" -> Seq("de5", "shi4", "bu4", "le5", "wo3", "ni3"))

  def withLangId(df: DataFrame, textCol: String, out: String = "lang_pred"): DataFrame = {
    val ws = words(col(textCol))
    val scored = LangMarkers.map { case (lang, markers) =>
      struct(graft.functions.F.countInSet(ws, markers).as("score"),
        lit(lang).as("lang"))
    }
    // argmax: max over (score, reversed-lang) structs => highest score,
    // ties -> lexicographically smallest language code.
    val best = scored.reduce((a, b) =>
      when(b.getField("score") > a.getField("score"), b).otherwise(a))
    df.withColumn(out, best.getField("lang"))
  }

  /** PII scrubbing for training corpora: emails and URLs replaced by
    * placeholder tokens. Patterns stay within the common subset of Java
    * regex and RE2 (no lookaround), so behavior is engine-portable;
    * `regexp_replace` is codegen'd — one projection, no UDF. */
  val EmailPattern = """[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"""
  val UrlPattern = """https?://[^ ]+"""
  /** +CC-AAA-NNN… international-dialing shape: strict enough to dodge
    * dates/ids, loose enough for real numbers. Portable Java/RE2 subset. */
  val PhonePattern = """\+\d{1,3}-\d{3}-\d{3,10}"""
  val Ipv4Pattern = """\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"""

  /** PII scrub: URL first (so addresses inside URLs redact as the URL),
    * then email, phone, IPv4. Every pattern is in the portable
    * Java-regex/RE2 intersection (no lookaround, no backrefs) with
    * leftmost-first semantics in both engines — codegen'd
    * `regexp_replace`s, no UDF. */
  def redact(textCol: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(textCol, UrlPattern, "<URL>"),
          EmailPattern, "<EMAIL>"),
        PhonePattern, "<PHONE>"),
      Ipv4Pattern, "<IP>")

  /** Luhn checksum validity of a non-empty digit string — the mod-10
    * double-every-second-from-the-right check every real payment-card
    * number passes. Pure codegen'd collection fold (reverse + indexed
    * aggregate), no UDF; exact integer arithmetic mirrors in SQL. The
    * caller guarantees `num` is 1+ ASCII digits (the candidate regex
    * below does). */
  def luhnValid(num: Column): Column = {
    val rev = reverse(num)
    val total = aggregate(sequence(lit(1), length(rev)), lit(0L),
      (acc, i) => {
        val d = rev.substr(i, lit(1)).cast("long")
        acc + when(pmod(i, lit(2)) === 0,
          when(d * 2 > 9, d * 2 - 9).otherwise(d * 2)).otherwise(d)
      })
    pmod(total, lit(10)) === 0
  }

  /** Contiguous 13–19 digit runs — the payment-card length band (Visa
    * 13/16, Amex 15, Maestro up to 19); word boundaries keep runs
    * embedded in longer digit strings or identifiers out. Portable
    * Java/RE2 subset. */
  val CardCandidatePattern = """\b\d{13,19}\b"""

  /** Redact payment-card numbers VALIDATED by Luhn — the checksum cuts
    * the false-positive space of "any 16-digit number" (order ids,
    * timestamps in micros, EAN-like codes) by 10×, which is what makes
    * card redaction usable on real text where [[redact]]'s shape-only
    * patterns would mangle identifiers. Candidates come from one
    * `regexp_extract_all` pass; the Luhn-valid ones (deduped + sorted —
    * a deterministic replace order both engines share) splice out via a
    * codegen'd `aggregate` of `replace`s. Caveat: `replace` hits every
    * occurrence of a valid number, including one embedded in a longer
    * NON-digit context; digit-run candidates can't overlap each other
    * by construction (maximal runs). */
  def redactCards(textCol: Column): Column = {
    val cands = regexp_extract_all(textCol, lit(CardCandidatePattern), lit(0))
    val valid = array_sort(array_distinct(filter(cands, c => luhnValid(c))))
    aggregate(valid, textCol, (acc, c) => replace(acc, c, lit("<CARD>")))
  }

  /** Flesch reading-ease per document in exact integer MICRO-units:
    * `206.835 − 1.015·(words/sentences) − 84.6·(syllables/words)`, each
    * division a fixed integer-truncation point (`div`) so engine and SQL
    * mirror agree bit for bit. Sentences = `[.!?]+` runs, floored at 1
    * (headline-only docs). Syllables = vowel-group count per word
    * (`[aeiouy]+` on the lowercased word), floored at 1 — the standard
    * no-dictionary heuristic (±1 syllable on silent-e words; consistent
    * across engines, which is what a corpus-level readability FILTER
    * needs — the absolute grade is calibration, the ordering is signal).
    * Token-less documents emit NULL score (no 0/0). One scan-stage
    * projection: split, two regexp passes, a collection fold — no
    * shuffle, no UDF. */
  def readability(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val ws = filter(split(col(textCol), " "), w => w =!= "")
    val syl = aggregate(ws, lit(0L), (acc, w) =>
      acc + greatest(lit(1L),
        size(regexp_extract_all(lower(w), lit("[aeiouy]+"), lit(0))).cast("long")))
    df.select(col(idCol).as("doc_id"),
        size(ws).cast("long").as("n_words"),
        greatest(lit(1L),
          size(regexp_extract_all(col(textCol), lit("[.!?]+"), lit(0)))
            .cast("long")).as("n_sentences"),
        syl.as("n_syllables"))
      .withColumn("flesch_micro",
        when(col("n_words") > 0,
          lit(206835000L) -
            expr("1015000 * n_words div n_sentences") -
            expr("84600000 * n_syllables div n_words")))
  }

  /** Weighted-keyword topic classification — the domain-tagging pass a
    * mixture designer runs before per-domain sampling weights exist: a
    * LEXICON of (term, topic, weight) rows scores each document as
    * `score(doc, topic) = Σ_tokens weight(token, topic)` and the doc
    * takes the argmax topic (score DESC, topic ASC — deterministic),
    * `"other"`/0 when nothing matches. The linear-scorer shape of a
    * fastText-style classifier with the embedding table replaced by an
    * explicit lexicon — auditable, and exact in integer micro-unit
    * weights so the SQL mirror agrees bit for bit.
    *
    * Scale shape: tokenize-explode → broadcast lexicon equi-join (the
    * lexicon is the small side at any corpus scale; 100k-term lexicons
    * are still broadcast-class) → (doc, topic)-keyed map-side-combined
    * sum → per-doc min-struct argmax. Non-matching tokens drop AT the
    * join, so the exchange carries only lexicon hits; a when-chain
    * scorer would avoid the exchange but pays O(|lexicon|) per token —
    * the join shape is what survives a real lexicon. */
  def topicClassify(df: DataFrame, idCol: String, textCol: String,
      lexicon: Seq[(String, String, Long)]): DataFrame = {
    require(lexicon.nonEmpty, "topicClassify needs a non-empty lexicon")
    val spark = df.sparkSession
    import spark.implicits._
    val lex = broadcast(lexicon.toDF("__term", "__topic", "__w"))
    val toks = df.select(col(idCol),
        explode(split(lower(col(textCol)), " ")).as("__term"))
      .where(col("__term") =!= "")
    val best = toks.join(lex, Seq("__term"))
      .groupBy(col(idCol), col("__topic"))
      .agg(sum(col("__w")).as("__s"))
      .groupBy(col(idCol))
      .agg(min(struct((-col("__s")).as("ns"), col("__topic").as("t"))).as("__m"))
      .select(col(idCol), col("__m.t").as("__topic"),
        (-col("__m.ns")).as("__score"))
    df.select(col(idCol))
      .join(best, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("__topic"), lit("other")).as("topic"),
        coalesce(col("__score"), lit(0L)).as("score_micro"))
  }

  /** Cross-source content-overlap matrix: for every source pair, how many
    * distinct word n-gram shingles they share — the corpus diagnostic
    * behind mixture design (two "different" sources sharing most of their
    * shingles are one source for training purposes) and leak tracing.
    *
    * Scale shape: NEVER a shingle self-join (a hot shingle would go
    * quadratic in documents). Instead groupBy(shingle) with a
    * `collect_set(source)` — partially aggregable, and the set is bounded
    * by the SOURCE count, not the document count — then pairs explode
    * within each ≤|sources| set, so the worst shingle costs
    * |sources|²/2 rows, independent of corpus size. */
  def sourceOverlapMatrix(df: DataFrame, keyCol: String, textCol: String,
      n: Int = 3): DataFrame = {
    // group key = the portable 64-bit shingle hash (8-byte exchange rows;
    // the oracle hashes identically, so the census stays bit-exact)
    val sh = graft.operators.Dedup
      .withShingles(Par.spread(df), textCol, n)
      .select(col(keyCol).as("__k"),
        explode(transform(col("shingles"), s => graft.functions.F.mix64(s))).as("__s"))
    sh.groupBy("__s").agg(collect_set(col("__k")).as("__ks"))
      .select(col("__s"), explode(col("__ks")).as("source_a"), col("__ks"))
      .select(col("__s"), col("source_a"), explode(col("__ks")).as("source_b"))
      .where(col("source_a") < col("source_b"))
      .groupBy("source_a", "source_b")
      .agg(count(lit(1)).as("n_shared_shingles"))
  }

  /** Per-source lexical-diversity profile: document count, shingle
    * occurrences, distinct shingles, and a type-token ratio in permille
    * (integer-exact). A source whose TTR collapses is template spam.
    * One aggregation; the distinct count two-phases on (source, shingle)
    * so hot sources stay partial-aggregated. */
  def sourceDiversity(df: DataFrame, keyCol: String, idCol: String,
      textCol: String, n: Int = 3): DataFrame = {
    val sh = graft.operators.Dedup
      .withShingles(Par.spread(df), textCol, n)
      .select(col(keyCol).as("source"), col(idCol).as("__id"),
        explode(transform(col("shingles"), s => graft.functions.F.mix64(s))).as("__s"))
    sh.groupBy("source").agg(
        countDistinct(col("__id")).as("n_docs"),
        count(lit(1)).as("n_shingles"),
        countDistinct(col("__s")).as("n_distinct_shingles"))
      .withColumn("ttr_permille",
        expr("n_distinct_shingles * 1000 div n_shingles"))
  }

  /** C4-style line-level cleaning (the rule family behind the C4/mC4 web
    * corpora): split a document into lines, keep only lines that (a) have
    * at least `minWordsPerLine` whitespace words, (b) end in a terminal
    * punctuation mark (when `requireTerminalPunct`), and (c) contain no
    * blocklisted substring (case-insensitive) — then re-join survivors.
    * Output keeps the per-doc counters (`n_lines`, `n_kept`) so a page
    * gate (e.g. C4's "≥ 5 kept sentences") is a downstream filter.
    *
    * Scale shape: pure per-row array work — split / higher-order filter /
    * re-join in ONE projection, no explode, no shuffle, no UDF. At 100 TB
    * this runs entirely inside the scan stage.
    */
  def lineClean(df: DataFrame, idCol: String, textCol: String,
      lineSep: String = "\n", minWordsPerLine: Int = 3,
      requireTerminalPunct: Boolean = true,
      blockWords: Seq[String] = Seq("javascript", "lorem ipsum", "{")): DataFrame = {
    val lines = split(col(textCol), java.util.regex.Pattern.quote(lineSep))
    def keep(l: Column): Column = {
      val t = trim(l)
      val wordsOk = size(split(t, " ")) >= minWordsPerLine
      val termOk =
        if (requireTerminalPunct) substring(t, -1, 1).isin(".", "!", "?", "\"")
        else lit(true)
      val blockOk = blockWords
        .map(b => !lower(t).contains(lit(b.toLowerCase(java.util.Locale.ROOT))))
        .foldLeft(lit(true))(_ && _)
      wordsOk && termOk && blockOk
    }
    df.select(col(idCol).as("doc_id"), lines.as("__lines"))
      .withColumn("__kept", filter(col("__lines"), keep _))
      .select(col("doc_id"),
        size(col("__lines")).cast("long").as("n_lines"),
        size(col("__kept")).cast("long").as("n_kept"),
        array_join(col("__kept"), lineSep).as("text_clean"))
  }

  /** Fixed-token sliding-window chunking — the upstream operator of every
    * embeddings pipeline (the reference embeds pre-chunked documents;
    * `embeddings-pipeline.py:185-190` reads the resulting vectors): split a
    * document into windows of `chunkTokens` whitespace tokens starting at
    * every multiple of `stride` (stride < chunkTokens ⇒ overlapping
    * context windows; stride == chunkTokens ⇒ disjoint). The final window
    * may be shorter; a document shorter than one window yields exactly one
    * chunk. Output: (doc_id, chunk_id, n_tokens, chunk_text) where
    * chunk_id = start/stride — deterministic, so (doc_id, chunk_id) is a
    * stable key for downstream embedding/pooling joins.
    *
    * Scale shape: one projection + one Generate (posexplode) — no shuffle,
    * no UDF; at 100 TB this runs entirely inside the scan stage, and the
    * output is written partitioned however the embedder wants it.
    */
  def chunkDocuments(df: DataFrame, idCol: String, textCol: String,
      chunkTokens: Int = 64, stride: Int = 48): DataFrame = {
    require(chunkTokens > 0 && stride > 0,
      s"chunkTokens/stride must be positive (got $chunkTokens/$stride)")
    val ws = words(col(textCol))
    // Window starts: multiples of stride below the token count (a doc with
    // n tokens has ceil(n / stride) windows; slice() below handles the
    // short tail window).
    val starts = filter(
      sequence(lit(0), greatest(size(ws) - 1, lit(0)), lit(stride)),
      st => st < size(ws))
    df.select(col(idCol).as("doc_id"), ws.as("__ws"), starts.as("__starts"))
      .select(col("doc_id"),
        explode(transform(col("__starts"), (st, i) => struct(
          i.cast("long").as("chunk_id"),
          least(size(col("__ws")) - st, lit(chunkTokens)).cast("long").as("n_tokens"),
          array_join(slice(col("__ws"), st + 1, lit(chunkTokens)), " ").as("chunk_text")
        ))).as("__c"))
      .select(col("doc_id"), col("__c.chunk_id"), col("__c.n_tokens"),
        col("__c.chunk_text"))
  }

  /** Sentence segments of a document, in order: maximal runs of
    * non-ender characters followed by their `[.!?]+` ender run (a
    * trailing fragment without an ender is its own sentence; empty/
    * whitespace segments drop). One `regexp_extract_all` + posexplode —
    * scan-stage, RE2-compatible, no abbreviation dictionary (the
    * [[readability]] heuristic tier; "Dr." splits — consistent across
    * engines, which is what a chunker needs, and documented). */
  def sentenceSplit(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("doc_id"),
        posexplode(regexp_extract_all(col(textCol),
          lit("[^.!?]+[.!?]*"), lit(0))).as(Seq("sent_id", "__s")))
      .select(col("doc_id"), col("sent_id").cast("long").as("sent_id"),
        trim(col("__s")).as("sentence"))
      .where(col("sentence") =!= "")

  /** Sentence-boundary-aware chunking — the RAG-prep alternative to
    * [[chunkDocuments]]'s fixed token windows: sentences pack greedily
    * into chunks by their STARTING token offset (`(cum − n) div
    * budget`), so no sentence is ever split mid-way and every chunk
    * holds whole sentences summing to ≈`budgetTokens` (a single
    * sentence longer than the budget keeps its own chunk and overflows
    * it — splitting it would defeat the operator's point; documented).
    * Deterministic: prefix sums over the (doc, sent_id) order, ordered
    * re-assembly via sort_array-of-structs (the positional-splice
    * convention).
    *
    * Scale shape: one scan-stage sentence explode, ONE doc-keyed
    * exchange shared by the prefix-sum window and the (doc, chunk)
    * re-assembly aggregate — per-doc row counts bound the window, no
    * corpus-wide ordering anywhere. */
  def sentenceChunks(df: DataFrame, idCol: String, textCol: String,
      budgetTokens: Int = 64): DataFrame = {
    require(budgetTokens > 0, "budgetTokens must be positive")
    import org.apache.spark.sql.expressions.Window
    val sents = sentenceSplit(df, idCol, textCol)
      .withColumn("__n",
        size(filter(split(col("sentence"), " "), w => w =!= ""))
          .cast("long"))
    val w = Window.partitionBy("doc_id").orderBy("sent_id")
    sents
      .withColumn("__cum", sum(col("__n")).over(w))
      .withColumn("chunk_id",
        expr(s"(__cum - __n) div $budgetTokens"))
      .groupBy(col("doc_id"), col("chunk_id"))
      .agg(count(lit(1)).as("n_sentences"), sum(col("__n")).as("n_tokens"),
        array_join(transform(
          array_sort(collect_list(struct(col("sent_id"), col("sentence")))),
          s => s.getField("sentence")), " ").as("chunk_text"))
  }

  /** Contrastive training triplets from a chunk table (the output shape
    * of [[chunkDocuments]]) — the data-prep step for training a text
    * embedding model: anchor = chunk i, positive = chunk i+1 of the
    * SAME document (adjacent-window supervision — overlapping strides
    * share content, the standard weak positive), negative = chunk 0 of
    * a DETERMINISTIC other document. Training-time in-batch negatives
    * are random; a data-prep operator must be replayable, so the
    * negative comes from a fixed permutation: chunk-0 docs hash into
    * `buckets` (a small multiplicative mix — spread, not crypto), and
    * each doc takes the NEXT doc of its bucket in doc-id order,
    * wrapping (lead + first_value — one window pass, no self-join).
    * Singleton buckets would self-pair; those rows drop (documented —
    * shrink `buckets` if the corpus is tiny relative to it).
    *
    * Scale shape: the positive join is one (doc, chunk)-keyed equi-join
    * of the chunk table against itself shifted by one — co-partitioned
    * on the same key. The negative table is SLIM (one row per doc, the
    * chunk-0 text) and its window partitions by bucket — n/buckets rows
    * each, sized by the caller; the final doc-keyed join attaches one
    * negative per doc. No exchange carries more than chunk-table rows. */
  def contrastivePairs(chunks: DataFrame, docCol: String = "doc_id",
      chunkCol: String = "chunk_id", textCol: String = "chunk_text",
      buckets: Int = 256): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    import org.apache.spark.sql.expressions.Window
    val a = chunks.select(col(docCol).as("doc_id"),
      col(chunkCol).as("chunk_id"), col(textCol).as("anchor_text"))
    val pos = chunks.select(col(docCol).as("doc_id"),
      (col(chunkCol) - 1).as("chunk_id"), col(textCol).as("positive_text"))
    val pairs = a.join(pos, Seq("doc_id", "chunk_id"))
    val firsts = chunks.where(col(chunkCol) === 0)
      .select(col(docCol).as("doc_id"), col(textCol).as("__t"))
      // spread mix, not crypto; doc ids above ~3·10¹⁷ would wrap the
      // ×31 in Long (silently here, loudly in a HUGEINT mirror) — far
      // past any real id space, noted for the contract
      .withColumn("__b", pmod(col("doc_id") * 31 + 17, lit(buckets.toLong)))
    val wOrd = Window.partitionBy("__b").orderBy("doc_id")
    val wAll = Window.partitionBy("__b").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val neg = firsts
      .withColumn("neg_doc_id",
        coalesce(lead("doc_id", 1).over(wOrd), first("doc_id").over(wAll)))
      .withColumn("negative_text",
        coalesce(lead("__t", 1).over(wOrd), first("__t").over(wAll)))
      .where(col("neg_doc_id") =!= col("doc_id"))
      .select("doc_id", "neg_doc_id", "negative_text")
    pairs.join(neg, Seq("doc_id"))
      .select(col("doc_id"), col("chunk_id"), col("anchor_text"),
        col("positive_text"), col("neg_doc_id"), col("negative_text"))
  }

  /** C4-style cross-document boilerplate-line removal: a line that occurs
    * in at least `minDocs` DISTINCT documents (navigation menus, cookie
    * banners, license headers) is dropped from every document; survivors
    * are re-joined in original position order. Complements [[lineClean]]
    * (per-doc rules — no corpus context) and
    * [[graft.operators.Dedup.repeatedSpanStats]] (token spans, stats only):
    * this one consults the whole corpus and rewrites the text.
    * Output: (doc_id, n_lines, n_kept, text_clean) — a fully-boilerplate
    * document survives with n_kept = 0 and empty text_clean, so the page
    * gate stays a downstream filter decision.
    *
    * Scale shape: the frequent-line set is computed by a partially-
    * aggregable count-distinct on the line value (map-side combine crushes
    * hot boilerplate lines — millions of copies of a cookie banner arrive
    * at the reducer as per-partition partials, never as raw rows), is tiny
    * relative to the corpus (only lines repeated across ≥ minDocs docs),
    * and joins back BROADCAST as a left-anti — the corpus-side line rows
    * are never shuffled on the line value, so a hot line cannot skew a
    * partition. The only corpus-side exchange is the positional
    * re-assembly, keyed on doc_id (bounded per-doc row counts ⇒ no skew).
    */
  def removeBoilerplateLines(df: DataFrame, idCol: String, textCol: String,
      minDocs: Int = 3, lineSep: String = "\n"): DataFrame = {
    require(minDocs >= 2, s"minDocs must be >= 2 (got $minDocs)")
    val sepLit = java.util.regex.Pattern.quote(lineSep)
    val lines = df
      .select(col(idCol).as("doc_id"),
        posexplode(split(col(textCol), sepLit)).as(Seq("__pos", "__line")))
    val frequent = lines
      .groupBy(col("__line"))
      .agg(count_distinct(col("doc_id")).as("__nd"))
      .where(col("__nd") >= minDocs)
      .select("__line")
    val kept = lines
      .join(broadcast(frequent), Seq("__line"), "left_anti")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_kept"),
        array_join(
          transform(array_sort(collect_list(struct(col("__pos"), col("__line")))),
            s => s.getField("__line")),
          lineSep).as("text_clean"))
    df.select(col(idCol).as("doc_id"),
        size(split(col(textCol), sepLit)).cast("long").as("n_lines"))
      .join(kept, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_lines"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("text_clean"), lit("")).as("text_clean"))
  }

  /** Corpus-global exact LINE dedup (the line-level tier of Lee et al.
    * 2021's exact-substring dedup, and what C4 applies at the
    * three-sentence-span level): every distinct non-blank line keeps only
    * its FIRST occurrence corpus-wide — min (doc_id, position) — and
    * every later copy is dropped from its document. Complements
    * [[removeBoilerplateLines]] (which drops lines from EVERY document
    * once they repeat in ≥ minDocs docs — navigation/banners) — here the
    * first document keeps the line, so unique content that happens to be
    * syndicated survives exactly once. Blank lines are exempt (they carry
    * document structure, not content; deduping them would collapse every
    * paragraph break in the corpus after the first document).
    * Output: (doc_id, n_lines, n_kept, text_clean).
    *
    * Scale shape: one Generate; the first-occurrence census groups on the
    * engine-portable 64-bit line hash — 8-byte exchange rows with
    * map-side-combined `min(struct(doc, pos))` partials, so a hot
    * boilerplate line (millions of copies) arrives at its reducer as
    * per-partition partials. The winner join-back is equi on the hash
    * with EXACTLY ONE build row per key, so a hot line costs one skewed
    * but linear probe task (AQE skew-split territory), never a pair
    * blow-up. Re-assembly is the boilerplate op's doc_id-keyed
    * positional fold. The oracle recomputes the identical hash chain in
    * SQL (the shingle family's portable-hash mirror). */
  def dedupLinesGlobal(df: DataFrame, idCol: String, textCol: String,
      lineSep: String = "\n"): DataFrame = {
    val sepLit = java.util.regex.Pattern.quote(lineSep)
    val lines = df
      .select(col(idCol).as("doc_id"),
        posexplode(split(col(textCol), sepLit)).as(Seq("__pos", "__line")))
      .withColumn("__lh", graft.functions.F.mix64(col("__line")))
    val blank = trim(col("__line")) === ""
    val winners = lines.where(!blank)
      .groupBy("__lh")
      .agg(min(struct(col("doc_id").as("d"), col("__pos").as("p"))).as("__w"))
    val kept = lines
      .join(winners, Seq("__lh"), "left")
      .where(blank ||
        (col("__w.d") === col("doc_id") && col("__w.p") === col("__pos")))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_kept"),
        array_join(
          transform(array_sort(collect_list(struct(col("__pos"), col("__line")))),
            s => s.getField("__line")),
          lineSep).as("text_clean"))
    df.select(col(idCol).as("doc_id"),
        size(split(col(textCol), sepLit)).cast("long").as("n_lines"))
      .join(kept, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_lines"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("text_clean"), lit("")).as("text_clean"))
  }

  /** Polynomial rolling-hash document fingerprint, word-order sensitive:
    * wordVal = fold(chars: acc*31 + codepoint) mod M;
    * doc = fold(words: acc*131 + wordVal) mod M.
    * Pure integer arithmetic in one native codegen'd expression
    * ([[graft.functions.PolyFingerprint]]) — exact, portable, one
    * projection. */
  val FingerprintMod = 1000000007L

  def fingerprint(textCol: Column): Column =
    graft.functions.F.polyFingerprint(words(textCol))

  /** Collocation mining (phrase discovery for tokenizer/vocab work):
    * adjacent token pairs occurring ≥ `minCount` times, scored by LIFT —
    * `P(ab) / (P(a)·P(b)) = c_ab·N² / (M·c_a·c_b)` with `N` total tokens
    * and `M` total bigrams — emitted as `lift_permille` (1000 ≈
    * independent; strong collocations score orders of magnitude higher).
    * Lift rather than PMI deliberately: PMI is `log lift`, and `log`'s
    * last-bit rounding is libm-dependent — lift carries the same ranking
    * and stays in EXACT integer arithmetic (big-integer products via
    * [[graft.functions.LiftPermille]] — no DECIMAL(38,0) ceiling, exact at
    * any corpus size), which is what allows an exact differential oracle.
    * Returns `(a, b, c_ab, lift_permille)`.
    *
    * Scale shape — ONE tokenize pass, ONE corpus-sized shuffle: each doc
    * posexplodes once into (token, successor-or-null) rows, so every token
    * occurrence appears exactly once in the `a` position and ONE pair-keyed
    * map-side-combined aggregate `ab` (bounded by the distinct-bigram
    * vocabulary, hence persistable) yields everything downstream: unigram
    * counts (re-group `ab` by `a`), bigram counts (drop the null/empty
    * successors), and both corpus totals in a single one-row action. The
    * unigram table — vocabulary-sized — broadcasts back onto the surviving
    * (≥ minCount) pairs. Nothing is keyed on anything hotter than a token
    * pair, and the corpus text is never re-read. */
  def collocations(df: DataFrame, textCol: String,
      minCount: Long = 5L): DataFrame = {
    val ab = df.select(split(col(textCol), " ").as("ws"))
      .select(posexplode(col("ws")).as(Seq("i", "a")), col("ws"))
      .withColumn("b", expr("get(ws, i + 1)")) // null past the end, not an error
      .where(col("a") =!= "")
      .groupBy("a", "b").agg(count(lit(1)).as("c"))
      .persist()
    val validB = col("b").isNotNull && col("b") =!= ""
    // Both corpus totals in one action over the persisted aggregate; the
    // sums come back null (not an NPE) on an empty/whitespace-only corpus.
    val totals = ab.agg(sum("c"), sum(when(validB, col("c")))).head()
    val n = if (totals.isNullAt(0)) 0L else totals.getLong(0)
    val m = if (totals.isNullAt(1)) 0L else totals.getLong(1)
    val bi = ab.where(validB).select(col("a"), col("b"), col("c").as("c_ab"))
    if (n == 0L || m == 0L) { // no tokens or no adjacent pairs: empty, typed
      return bi.where(lit(false))
        .select(col("a"), col("b"), col("c_ab"), lit(0L).as("lift_permille"))
    }
    val uni = ab.groupBy("a").agg(sum("c").as("c")) // vocab-sized, from cache
    bi.where(col("c_ab") >= minCount)
      .join(broadcast(uni.select(col("a"), col("c").as("c_a"))), "a")
      .join(broadcast(uni.select(col("a").as("b"), col("c").as("c_b"))), "b")
      .select(col("a"), col("b"), col("c_ab"),
        graft.functions.F.liftPermille(
          col("c_ab"), col("c_a"), col("c_b"), n, m).as("lift_permille"))
  }

  /** Quantized unigram surprisal — the CCNet-style LM-perplexity quality
    * signal approximated with a corpus unigram model, in EXACT integer
    * arithmetic. Per token occurrence the surprisal is
    * `floor(log2(N / c(w)))` bits (`N` total tokens, `c(w)` the token's
    * corpus count, integer division, integer log2 via
    * [[graft.functions.IntLog2]] — no libm); per document the score is the
    * mean in millibits/token: `surprisal_milli = Σbits·1000 div n_tok`.
    * High = rare-token-heavy (noise/gibberish candidates at the filter
    * tail), low = common-token/repetitive — the same two-sided cut CCNet
    * makes on LM perplexity, with the quantization making the score
    * bit-identical across engines (oracle: `length(bin(N // c)) − 1`).
    * Returns `(doc_id, n_tok, surprisal_milli)`; token-less documents are
    * absent (no tokens ⇒ no model support).
    *
    * Scale shape — two corpus passes, the inherent minimum for
    * train-then-score (CCNet trains its LM, then scores with it): pass 1
    * builds the vocabulary aggregate (token-keyed, map-side combined,
    * bounded by vocab size — PERSISTED, and the corpus total is one
    * action over it, same discipline as [[collocations]]); pass 2 streams
    * the token rows through a BROADCAST join against that vocabulary and
    * the doc_id aggregate (map-side combined) is the only non-broadcast
    * shuffle. No token-keyed join of the corpus against itself; a hot
    * token costs one vocab row, not a fan-out (PlanSpec pins the shape:
    * broadcast join, no SortMergeJoin, one parquet scan in the scoring
    * plan). */
  def surprisal(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = df
      .select(col(idCol).as("doc_id"), explode(words(col(textCol))).as("t"))
      .where(col("t") =!= "")
    val vocab = tok.groupBy("t").agg(count(lit(1)).as("c")).persist()
    val totals = vocab.agg(sum("c")).head() // null, not NPE, on empty corpus
    val n = if (totals.isNullAt(0)) 0L else totals.getLong(0)
    // n == 0 ⇒ tok has no rows and the join below is trivially empty —
    // the 0-literal never reaches intLog2 on a live row.
    tok.join(broadcast(vocab), Seq("t"))
      .select(col("doc_id"),
        graft.functions.F.intLog2(expr(s"${n}L div c")).as("bits"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tok"),
        expr("sum(bits) * 1000 div count(1)").as("surprisal_milli"))
  }

  /** Quantized BIGRAM surprisal — [[surprisal]]'s conditional upgrade: the
    * unigram score calls rare WORDS surprising; this scores rare
    * CONTINUATIONS, the signal that separates fluent-but-unusual text from
    * shuffled-word gibberish (every unigram common, every transition rare).
    * Per adjacent pair occurrence the surprisal is
    * `floor(log2(c(a·) / c(a,b)))` bits — the quantized MLE conditional
    * `−log2 P(b|a)` with `c(a·)` = occurrences of `a` as a LEFT context
    * (so the ratio is ≥ 1 and the bits ≥ 0 by construction); per document
    * the mean in millibits/bigram. Exact integer arithmetic end to end
    * ([[graft.functions.IntLog2]], no libm), so the oracle mirrors it
    * bit-for-bit via `length(bin(c_a // c_ab)) − 1`. Returns
    * `(doc_id, n_bigrams, surprisal2_milli)`; documents with no valid
    * adjacent pair (under 2 non-empty tokens) are absent.
    *
    * Scale shape — the same train-then-score two-pass minimum as
    * [[surprisal]]: pass 1 folds the corpus into the distinct-BIGRAM count
    * table (pair-keyed, map-side combined, persisted; left-context counts
    * re-group that table, never the corpus — [[collocations]]' discipline),
    * pass 2 streams the bigram rows through a join against the model and
    * the doc-keyed mean is the only corpus-sized shuffle. The model
    * broadcasts while the bigram vocabulary fits (it does for any corpus
    * whose vocab you'd train a 2-gram scorer on); past that the join
    * degrades to ONE pair-keyed shuffle at identical complexity — never
    * a corpus-vs-corpus fan-out. */
  def bigramSurprisal(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val bg = df
      .select(col(idCol).as("doc_id"), split(col(textCol), " ").as("ws"))
      .select(col("doc_id"), posexplode(col("ws")).as(Seq("i", "a")), col("ws"))
      .withColumn("b", expr("get(ws, i + 1)")) // null past the end, not an error
      .where(col("a") =!= "" && col("b").isNotNull && col("b") =!= "")
      .select("doc_id", "a", "b")
    val model = bg.groupBy("a", "b").agg(count(lit(1)).as("c_ab")).persist()
    // left-context totals from the persisted model (vocab-sized re-group),
    // attached once so the scoring pass makes a single broadcast join
    val withCtx = model.join(
      model.groupBy("a").agg(sum("c_ab").as("c_a")), "a")
    bg.join(broadcast(withCtx), Seq("a", "b"))
      .select(col("doc_id"),
        graft.functions.F.intLog2(expr("c_a div c_ab")).as("bits"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        expr("sum(bits) * 1000 div count(1)").as("surprisal2_milli"))
  }

  /** Held-out stupid-backoff bigram LM score (Brants et al. 2007, "Large
    * Language Models in Machine Translation" — THE web-scale LM smoothing,
    * chosen there precisely because it needs no discounting statistics),
    * quantized to this engine's integer-bits discipline: train bigram +
    * unigram counts on `train`, score each `score` document per token as
    *
    *  - first token, or bigram `(prev, w)` unseen in train:
    *    `penaltyBits·[not first] + ⌊log₂((N+1) div (c(w)+1))⌋` — the
    *    add-1-smoothed unigram backoff (OOV-safe: an unseen word costs
    *    the model's full ⌊log₂(N+1)⌋ bits), with `penaltyBits` the
    *    quantized backoff discount (default 2 ≈ α = 1/4, the paper's 0.4
    *    rounded to a power of two so the arithmetic stays exact);
    *  - bigram seen: `⌊log₂(c(a·) div c(a,b))⌋` — the quantized MLE
    *    conditional, exactly [[bigramSurprisal]]'s per-pair bits.
    *
    * Per document the mean in millibits/token. Unlike the self-scored
    * surprisal pair, the held-out split makes the backoff REAL (a
    * self-scored corpus contains every one of its own bigrams, so the
    * else-branch would never fire); this is the CCNet train-on-clean /
    * score-the-crawl quality-filter shape. Returns
    * `(doc_id, n_tok, backoff_milli)`; token-less documents absent.
    *
    * Scale shape — [[bigramSurprisal]]'s two-pass train-then-score:
    * pass 1 folds TRAIN into the bigram-count table (pair-keyed,
    * map-side combined, persisted; left-context totals re-group that
    * table) and the unigram vocabulary; pass 2 streams the scored
    * corpus's token rows through BROADCAST joins against both models —
    * the only corpus-sized shuffle is the doc-keyed mean. */
  def stupidBackoff(score: DataFrame, train: DataFrame, idCol: String,
      textCol: String, penaltyBits: Int = 2): DataFrame = {
    require(penaltyBits >= 0, "penaltyBits must be non-negative")
    def ws(df: DataFrame) = df.select(col(idCol).as("doc_id"),
      filter(split(col(textCol), " "), w => w =!= "").as("ws"))
    val trainTok = ws(train).select(explode(col("ws")).as("t"))
    val uni = trainTok.groupBy("t").agg(count(lit(1)).as("c_w")).persist()
    val totals = uni.agg(sum("c_w")).head()
    val n = if (totals.isNullAt(0)) 0L else totals.getLong(0)
    val trainBg = ws(train)
      .select(posexplode(col("ws")).as(Seq("i", "b")), col("ws"))
      .withColumn("a", expr("get(ws, i - 1)"))
      .where(col("a").isNotNull)
      .select("a", "b")
    val model = trainBg.groupBy("a", "b").agg(count(lit(1)).as("c_ab")).persist()
    val withCtx = model.join(
      model.groupBy("a").agg(sum("c_ab").as("c_a")), "a")
    val toks = ws(score)
      .select(col("doc_id"), posexplode(col("ws")).as(Seq("i", "b")), col("ws"))
      .withColumn("a", expr("get(ws, i - 1)")) // null at the doc start
      .select("doc_id", "a", "b")
    toks
      .join(broadcast(uni.withColumnRenamed("t", "b")), Seq("b"), "left")
      .join(broadcast(withCtx), Seq("a", "b"), "left")
      .select(col("doc_id"),
        when(col("c_ab").isNotNull,
          graft.functions.F.intLog2(expr("c_a div c_ab")))
          .otherwise(
            when(col("a").isNull, lit(0)).otherwise(lit(penaltyBits)) +
              graft.functions.F.intLog2(
                expr(s"(${n}L + 1L) div (coalesce(c_w, 0L) + 1L)")))
          .as("bits"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tok"),
        expr("sum(bits) * 1000 div count(1)").as("backoff_milli"))
  }

  /** Quantized BM25 ranked retrieval — sparse lexical top-k over the corpus
    * (the retrieval half of a RAG / hard-negative-mining pipeline), in
    * EXACT integer arithmetic so the oracle matches bit-for-bit.
    *
    * Per (query term, doc): `score = idf_bits · tfnorm_milli` with
    *  - `idf_bits = floor(log2(N div df))` ([[graft.functions.IntLog2]],
    *    no libm). Terms in more than half the corpus get 0 bits and
    *    contribute nothing — the same effect as Lucene's clamp of BM25's
    *    (otherwise negative) idf for very common terms, here falling out
    *    of the quantization;
    *  - `tfnorm_milli` is Robertson's saturation with k1 = 6/5 and
    *    b = 3/4 as exact rationals over the quantized corpus constant
    *    `avgdl_milli = (1000·T) div N`: multiplying numerator and
    *    denominator of `tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))` through
    *    by 20·avgdl yields
    *    `(1000·44·tf·A) div (20·tf·A + 6·A + 18000·dl)`, A = avgdl_milli —
    *    every division a fixed truncation point. Long-safe while
    *    `44000·tf·A < 2^63`, i.e. docs to ~10^7 tokens at 10^3 avgdl.
    *
    * Per (query, doc) the term scores sum; docs scoring 0 (no
    * discriminative term) are dropped; top-`k` per query by
    * (score DESC, doc_id ASC) — fully deterministic.
    *
    * 100 TB shape: the token stream is semi-joined map-side against the
    * BROADCAST query-term list before the tf aggregation, so the corpus
    * shuffles only candidate (doc, term) pairs, never its full postings;
    * `df` over those candidates is query-vocabulary-bounded and broadcast
    * back. The one corpus-sized structure is the doc-length table — BM25's
    * norms file, built once per corpus (reusable across query batches,
    * like [[surprisal]]'s vocabulary) and joined doc-keyed against the
    * candidate set. The final per-query ranking runs on candidate rows
    * only ([[Dedup.topKPerKey]] — rank-limit pushdown, no global sort). */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
      queries: Seq[(Long, Seq[String])], k: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val q = queries.flatMap { case (qid, ts) => ts.distinct.map((qid, _)) }
      .toDF("query_id", "term")
    val tok = docs
      .select(col(idCol).as("doc_id"), explode(words(col(textCol))).as("term"))
      .where(col("term") =!= "")
    val dl = tok.groupBy("doc_id").agg(count(lit(1)).as("dl")).persist()
    val tot = dl.agg(count(lit(1)), sum("dl")).head()
    val n = tot.getLong(0)
    val totTok = if (tot.isNullAt(1)) 0L else tot.getLong(1)
    val avgdlMilli = if (n == 0) 1L else (1000L * totTok) / n
    // pin: tf is referenced by the df census AND the scoring join —
    // unpinned, each reference re-ran the corpus tokenize + explode
    // (one extra full scan per query, r18). The pinned frame is tiny:
    // only (doc, query-term) hits survive the broadcast semi filter.
    val tf = tok.join(broadcast(q.select("term").distinct()), Seq("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      .pin()
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val scored = tf
      .join(broadcast(dfreq), Seq("term"))
      .join(dl, Seq("doc_id"))
      .join(broadcast(q), Seq("term"))
      .select(col("query_id"), col("doc_id"),
        (graft.functions.F.intLog2(expr(s"${n}L div df")) *
          expr(s"(1000L * 44 * tf * $avgdlMilli) div " +
            s"(20 * tf * $avgdlMilli + 6 * $avgdlMilli + 18000 * dl)"))
          .as("s_term"))
      .groupBy("query_id", "doc_id")
      .agg(sum("s_term").as("score_milli"))
      .where(col("score_milli") > 0)
    Dedup.topKPerKey(scored, k, Seq("query_id"),
        Seq(col("score_milli").desc, col("doc_id").asc))
      .select("query_id", "doc_id", "score_milli")
  }

  /** Vocabulary coverage curve — the tokenizer-budget planning number:
    * what permille of all token OCCURRENCES do the `cuts` most frequent
    * words cover? (Zipf makes this curve steep; a vocab/budget decision
    * reads it directly.) One row per cut:
    * `(top_n, covered, total, coverage_permille)` with words ranked by
    * (count desc, word asc) — the deterministic rank every engine
    * reproduces.
    *
    * Scale shape: ONE token-count aggregation (corpus → vocab-sized),
    * then a bounded TakeOrdered of max(cuts) (word, count) rows to the
    * driver — the driver-UF/broadcast-build-side boundedness precedent,
    * ~10k rows whatever the corpus — and one total-sum agg. No global
    * sort, no vocab-wide window. */
  def vocabCoverage(docs: DataFrame, textCol: String,
      cuts: Seq[Int] = Seq(10, 100, 1000, 10000)): DataFrame = {
    require(cuts.nonEmpty && cuts.forall(_ > 0))
    val spark = docs.sparkSession
    import spark.implicits._
    // persist: the total-sum and TakeOrdered actions would otherwise
    // each re-run the corpus tokenize+explode+agg (the bm25TopK `dl`
    // pattern — pay the dominant scan once)
    val counts = docs
      .select(explode(words(col(textCol))).as("w"))
      .where(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("n"))
      .persist()
    try {
      val totalRow = counts.agg(sum("n")).head()
      val total = if (totalRow.isNullAt(0)) 0L else totalRow.getLong(0)
      val top = counts.orderBy(col("n").desc, col("w").asc)
        .limit(cuts.max).select("n").as[Long].collect()
      val prefix = top.scanLeft(0L)(_ + _) // prefix(i) = mass of top i words
      cuts.sorted.map { c =>
        val covered = prefix(math.min(c, top.length))
        (c.toLong, covered, total,
          if (total == 0) 0L else 1000L * covered / total)
      }.toDF("top_n", "covered", "total", "coverage_permille")
    } finally counts.unpersist()
  }

  /** Hapax-legomena profile per key — the vocabulary-health read-out
    * next to [[vocabCoverage]]: per `keyCol`, the distinct-vocabulary
    * size, how many of those types occur exactly once (hapaxes), and the
    * hapax share in exact integer permille. A high hapax share flags
    * noisy/OCR-damaged sources (junk tokens inflate the unique tail); a
    * LOW share flags template/boilerplate-heavy ones — both are gating
    * signals before a source feeds tokenizer training, and the hapax
    * count is also Good–Turing's n₁ (the unseen-mass estimate a
    * smoothing layer wants). Empty tokens are excluded.
    *
    * Scale shape: one tokenize scan → one map-side-combined
    * (key, word) aggregation (corpus → per-key-vocab-sized) → one key
    * aggregation of slim count rows. No windows, no driver collect. */
  /** Vocabulary-growth curve (the empirical Heaps'-law read-out): how
    * many distinct word types have appeared after the first N token
    * positions of the corpus, for each cut — the number that says
    * whether more data keeps buying vocabulary or the type inventory
    * has saturated (tokenizer-budget and dedup-health planning both
    * read it). Corpus order is `idCol` ascending; positions are
    * 1-based over the RAW whitespace split (empty tokens occupy
    * positions but never count as types), and a type's birth position
    * is the MIN of its global positions. Cuts beyond the corpus report
    * the full vocabulary. Output: `(first_n_tokens, vocab_size)`.
    *
    * Scale shape: global token positions come from a TWO-PHASE
    * distributed prefix sum over per-doc token counts (the
    * [[graft.operators.Sampling.mixSources]] pattern: coarse sums per
    * id-range bucket → cumulative-sum the bounded bucket table →
    * within-bucket windows), so no corpus-wide single-partition window;
    * then one (token) aggregation for birth positions and ONE row of
    * conditional sums for all cuts. `bucketWidth` assumes roughly dense
    * ids (sparse ids only cost bucket imbalance, never correctness). */
  def vocabGrowth(docs: DataFrame, idCol: String, textCol: String,
      cuts: Seq[Long] = Seq(1000L, 5000L, 20000L, 100000L),
      bucketWidth: Long = 4096L): DataFrame = {
    require(cuts.nonEmpty && cuts.forall(_ > 0), "cuts must be positive")
    require(bucketWidth > 0, "bucketWidth must be positive")
    val base = docs
      .select(col(idCol).as("__id"), words(col(textCol)).as("__ws"))
      .withColumn("__n", size(col("__ws")).cast("long"))
      .withColumn("__bucket", expr(s"__id div $bucketWidth"))
    val wB = org.apache.spark.sql.expressions.Window.orderBy("__bucket")
    // bounded: one row per id-range bucket
    val bucketStarts = base.groupBy("__bucket")
      .agg(sum("__n").as("__bsum"))
      .withColumn("__bstart", sum("__bsum").over(wB) - col("__bsum"))
      .select("__bucket", "__bstart")
    val wIn = org.apache.spark.sql.expressions.Window
      .partitionBy("__bucket").orderBy("__id")
    val first = base.join(broadcast(bucketStarts), Seq("__bucket"))
      .withColumn("__off",
        col("__bstart") + sum("__n").over(wIn) - col("__n"))
      .select(col("__off"), posexplode(col("__ws")).as(Seq("__i", "__tok")))
      .where(col("__tok") =!= "")
      .groupBy("__tok")
      .agg(min(col("__off") + col("__i") + 1L).as("__fp"))
    val sorted = cuts.sorted
    val aggCols = sorted.map(c =>
      sum(when(col("__fp") <= c, 1L).otherwise(0L)).as(s"__v$c"))
    first.agg(aggCols.head, aggCols.tail: _*)
      .selectExpr(s"stack(${sorted.size}, " +
        sorted.map(c => s"CAST($c AS BIGINT), __v$c").mkString(", ") +
        ") AS (first_n_tokens, vocab_size)")
  }

  def hapaxProfile(docs: DataFrame, keyCol: String, textCol: String): DataFrame =
    docs.select(col(keyCol).as("key"), explode(words(col(textCol))).as("w"))
      .where(col("w") =!= "")
      .groupBy("key", "w").agg(count(lit(1)).as("__c"))
      .groupBy("key")
      .agg(count(lit(1)).as("vocab_size"),
        sum(when(col("__c") === 1L, 1L).otherwise(0L)).as("hapax_count"))
      .withColumn("hapax_permille",
        expr("hapax_count * 1000 div vocab_size"))

  /** Yule's characteristic constant K per key — the classic lexical-
    * diversity statistic (Yule 1944), `K = 10⁴·(Σc² − N)/N²` over the
    * word-frequency spectrum (c = each type's count, N = token count):
    * unlike type/token ratio it is nearly length-invariant, so sources of
    * different sizes compare directly. High K = repetitive vocabulary
    * (boilerplate, templated spam); the complement of [[hapaxProfile]]'s
    * tail read-out. Reported in exact integer ×10⁴ units via 128-bit
    * decimal floor-division (both factors non-negative, so truncation ≡
    * floor ≡ the oracle's HUGEINT `//`).
    *
    * Scale shape: one tokenize scan → one map-side-combined (key, word)
    * count → one per-key rollup of slim count rows. `sum_c2` accumulates
    * in DECIMAL(38,0): Σc² reaches long overflow territory at
    * billion-token keys. No windows, no driver collect. */
  def yuleK(docs: DataFrame, keyCol: String, textCol: String): DataFrame =
    docs.select(col(keyCol).as("key"), explode(words(col(textCol))).as("w"))
      .where(col("w") =!= "")
      .groupBy("key", "w").agg(count(lit(1)).as("__c"))
      .groupBy("key")
      .agg(sum("__c").as("n_tokens"),
        count(lit(1)).as("vocab_size"),
        sum(col("__c").cast("decimal(38,0)") * col("__c")).as("__sc2"))
      .withColumn("sum_c2", col("__sc2").cast("long"))
      .withColumn("yule_k_x10k", expr(
        "CAST((__sc2 - n_tokens) * 10000 AS DECIMAL(38,0)) div " +
          "(CAST(n_tokens AS DECIMAL(38,0)) * n_tokens)"))
      .select("key", "n_tokens", "vocab_size", "sum_c2", "yule_k_x10k")

  /** Zipf rank-band table of the corpus word-frequency distribution:
    * types grouped by `⌊log₂(rank)⌋` of their (count DESC, word ASC)
    * rank, each band reporting its type count, total token mass, and
    * frequency extrema — the log-spaced rank/frequency curve whose slope
    * IS the Zipf exponent, read exactly and without a corpus-sized sort.
    * A healthy natural-language corpus loses roughly a constant factor of
    * mass per band; a flat or humped band profile means dedup failure or
    * templated text.
    *
    * Scale shape: ranks are NEVER materialized per type. The frequency
    * table collapses to RUNS `(count c, n_types V)` — one row per
    * distinct count value, O(√N) rows by Erdős' bound on distinct sums —
    * and a run occupies the contiguous rank interval
    * `[start+1, start+V]` regardless of intra-run word order, so each
    * band's membership is interval arithmetic against the run's span
    * (the `trimmed_stats` histogram-band idiom). The only window runs
    * over that bounded run table; bands per run come from an
    * [[graft.functions.F.intLog2]]-bounded `sequence`, not a fixed
    * cross-join. Token mass sums in DECIMAL(38,0) (kept·c can exceed
    * long at web scale). */
  def zipfBands(docs: DataFrame, textCol: String): DataFrame = {
    val runs = docs.select(explode(words(col(textCol))).as("w"))
      .where(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("__c"))
      .groupBy("__c").agg(count(lit(1)).as("__v"))
    // bounded: one row per distinct count value
    val wC = org.apache.spark.sql.expressions.Window.orderBy(col("__c").desc)
    val spans = runs
      .withColumn("__start", sum("__v").over(wC) - col("__v"))
    val F = graft.functions.F
    spans
      .select(col("__c"), col("__v"), col("__start"),
        explode(sequence(F.intLog2(col("__start") + 1),
          F.intLog2(col("__start") + col("__v")))).as("band"))
      .withColumn("__kept",
        least(col("__start") + col("__v"),
          expr("shiftleft(CAST(1 AS BIGINT), CAST(band AS INT) + 1) - 1")) -
          greatest(col("__start") + 1,
            expr("shiftleft(CAST(1 AS BIGINT), CAST(band AS INT))")) + 1)
      .groupBy("band")
      .agg(sum("__kept").as("n_types"),
        sum(col("__kept").cast("decimal(38,0)") * col("__c"))
          .cast("long").as("token_mass"),
        max("__c").as("max_freq"), min("__c").as("min_freq"))
      .withColumn("rank_lo",
        expr("shiftleft(CAST(1 AS BIGINT), CAST(band AS INT))"))
      .select("band", "rank_lo", "n_types", "token_mass",
        "max_freq", "min_freq")
  }

  /** Per-key character-class composition — the encoding/quality audit
    * over [[graft.functions.CharClassCensus]]'s single-pass per-row
    * counters: totals per class plus the letter share in permille (the
    * one-number "is this prose" gate; a digit- or other-heavy source is
    * tables, code, or a charset accident). The permille divides through
    * DECIMAL(38,0) so petabyte-scale character totals cannot overflow the
    * ×1000 product; truncation on non-negatives matches the oracle's
    * floor. Empty-corpus keys report NULL rather than dividing by zero.
    *
    * Scale shape: the census runs map-side inside the scan stage (one
    * codegen'd pass per row); the exchange carries six longs per key. */
  def charClassProfile(docs: DataFrame, keyCol: String,
      textCol: String): DataFrame =
    docs
      .select(col(keyCol).as("key"),
        graft.functions.F.charClassCensus(col(textCol)).as("__cc"))
      .groupBy("key")
      .agg(sum("__cc.n_chars").as("n_chars"),
        sum("__cc.n_letters").as("n_letters"),
        sum("__cc.n_digits").as("n_digits"),
        sum("__cc.n_spaces").as("n_spaces"),
        sum("__cc.n_punct").as("n_punct"),
        sum("__cc.n_other").as("n_other"))
      .withColumn("letter_permille", expr(
        "CASE WHEN n_chars = 0 THEN NULL ELSE " +
          "CAST(n_letters AS DECIMAL(38,0)) * 1000 div n_chars END"))
}
