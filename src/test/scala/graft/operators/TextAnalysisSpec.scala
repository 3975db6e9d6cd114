package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

class TextAnalysisSpec extends SparkSpecBase {
  import spark.implicits._

  test("vocabCoverage: hand-computed Zipf curve with count-then-word ranking") {
    val docs = Seq("a a a b b c", "a b d").toDF("text")
    // counts: a=4 b=3 c=1 d=1, total 9; rank 3 is c (tie broken by word)
    val out = TextAnalysis.vocabCoverage(docs, "text", cuts = Seq(1, 2, 3, 10))
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(out == Set(
      (1L, 4L, 9L, 444L), (2L, 7L, 9L, 777L),
      (3L, 8L, 9L, 888L), (10L, 9L, 9L, 1000L)))
  }

  test("mojibake: corrupt→fix roundtrips; fix is idempotent; ASCII untouched") {
    val clean = "He said – “smart quotes” café… naïve touché 45° «brr» ©"
    val df = Seq(clean).toDF("text")
    val round = df.select(TextAnalysis.fixMojibake(
      TextAnalysis.corruptToMojibake(col("text"))).as("r")).head.getString(0)
    assert(round == clean, s"roundtrip broke: $round")
    // corruption actually did something (the artifacts are multi-char)
    val corruptedLen = df.select(length(TextAnalysis.corruptToMojibake(col("text"))))
      .head.getInt(0)
    assert(corruptedLen > clean.length)
    // idempotent on its own output and on already-clean text
    val twice = df.select(TextAnalysis.fixMojibake(TextAnalysis.fixMojibake(
      TextAnalysis.corruptToMojibake(col("text")))).as("r")).head.getString(0)
    assert(twice == clean)
    val ascii = "plain ascii text, nothing to fix here"
    assert(Seq(ascii).toDF("text")
      .select(TextAnalysis.fixMojibake(col("text"))).head.getString(0) == ascii)
  }

  test("mojibake: bare stripped-0x9D right-quote artifact repairs without eating longer ones") {
    // "â€" (no trailing byte) followed by other artifacts in one string:
    // the bare rule must fire ONLY where no longer artifact matched
    val s0 = "quote ends â€ and a dash â€“ plus ellipsis â€¦ done"
    val fixed = Seq(s0).toDF("t")
      .select(TextAnalysis.fixMojibake(col("t"))).head.getString(0)
    assert(fixed == "quote ends ” and a dash – plus ellipsis … done", fixed)
  }

  test("quality stats: counts and ratios on a known sentence") {
    val df = Seq("the cat sat on a mat.").toDF("text")
    val r = TextAnalysis.withQualityStats(df, "text").head()
    assert(r.getAs[Long]("n_tokens") == 6L)
    assert(r.getAs[Long]("n_stopwords") == 3L) // the, on, a
    assert(r.getAs[Long]("n_punct") == 1L)
    assert(r.getAs[Double]("stopword_ratio") == 3.0 / 6.0)
  }

  test("quality bucket thresholds") {
    val df = Seq(
      ("short one two", "too_short"),         // < 5 tokens
      ("the a an and or of to in is it", "boilerplate"), // all stopwords
      ("quantum flux harmonics resonate deeply today", "no_stopwords"),
      ("the quantum flux harmonics resonate deeply", "ok")).toDF("text", "want")
    val out = TextAnalysis.qualityBucket(df, "text")
      .select("want", "quality").as[(String, String)].collect()
    out.foreach { case (want, got) => assert(got == want, s"want=$want got=$got") }
  }

  test("lang-id argmax with deterministic first-wins ties") {
    val df = Seq(
      "der hund ist nicht hier",  // de markers dominate
      "el perro es que la casa",  // es markers
      "xyzzy plugh").toDF("text") // all scores 0 -> first lang (de)
    val out = TextAnalysis.withLangId(df, "text")
      .select("lang_pred").as[String].collect()
    assert(out.sameElements(Array("de", "es", "de")))
  }

  test("fingerprint is order-sensitive and stable") {
    val df = Seq("a b", "b a", "a b").toDF("text")
    val fp = df.select(TextAnalysis.fingerprint(col("text")).as("f"))
      .as[Long].collect()
    assert(fp(0) == fp(2))
    assert(fp(0) != fp(1))
    // known value: 'a'=97, 'b'=98; doc = (97*131 + 98) mod p
    assert(fp(0) == (97L * 131 + 98) % TextAnalysis.FingerprintMod)
  }

  test("repetition stats: exact counters on crafted docs") {
    val df = Seq("a b a b a", "x", "one two three four").toDF("text")
    val rows = TextAnalysis.withRepetitionStats(df, "text")
      .select("n_words", "n_distinct_words", "top_word_count",
        "n_bigrams", "n_distinct_bigrams", "top_bigram_count")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    // words a,b,a,b,a → top 'a'×3; bigrams "a b"×2, "b a"×2 → top 2
    assert(rows(0) == ((5L, 2L, 3L, 4L, 2L, 2L)))
    assert(rows(1) == ((1L, 1L, 1L, 0L, 0L, 0L))) // single word, no bigrams
    assert(rows(2) == ((4L, 4L, 1L, 3L, 3L, 1L))) // all distinct
  }

  test("repetition stats: null text yields null struct fields") {
    val df = Seq(Some("a a"), None).toDF("text")
    val out = TextAnalysis.withRepetitionStats(df, "text")
      .select("n_words").collect()
    assert(out(0).getLong(0) == 2L && out(1).isNullAt(0))
  }

  test("bigramFamiliarity: common transitions score, salad doesn't") {
    val docs = Seq((1L, "the cat sat"), (2L, "the cat ran"), (3L, "zz qq"))
      .toDF("doc_id", "text")
    // df: "the cat"=2, everything else 1 → vocabK=1 keeps only "the cat"
    val out = TextAnalysis.bigramFamiliarity(docs, "doc_id", "text", vocabK = 1)
      .select("doc_id", "n_bigrams_distinct", "n_familiar", "familiar_permille")
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(out(1L) == ((1L, 2L, 1L, 500L)))
    assert(out(2L) == ((2L, 2L, 1L, 500L)))
    assert(out(3L) == ((3L, 1L, 0L, 0L)))
    // single-word doc: no bigrams, permille 0 (no divide-by-zero)
    val one = TextAnalysis.bigramFamiliarity(
        Seq((9L, "word")).toDF("doc_id", "text"), "doc_id", "text", vocabK = 1)
      .select("familiar_permille").as[Long].head()
    assert(one == 0L)
  }

  test("sourceOverlapMatrix: shared distinct shingles per source pair") {
    val df = Seq(
      (1L, "a b c d", "s1"),   // shingles: "a b c", "b c d"
      (2L, "a b c x", "s2"),   // shares "a b c" with s1
      (3L, "a b c d", "s2"),   // shares both with s1; dup within s2 dedups
      (4L, "p q r s", "s3")    // shares nothing
    ).toDF("doc_id", "text", "source")
    val out = TextAnalysis.sourceOverlapMatrix(df, "source", "text", n = 3)
      .as[(String, String, Long)].collect().toSet
    assert(out == Set(("s1", "s2", 2L)))
  }

  test("sourceDiversity: TTR collapses for a templated source") {
    val df = Seq(
      (1L, "a b c d e", "tpl"), (2L, "a b c d e", "tpl"),
      (3L, "p q r s t", "div"), (4L, "u v w x y", "div")
    ).toDF("doc_id", "text", "source")
    val out = TextAnalysis.sourceDiversity(df, "source", "doc_id", "text", n = 3)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    // tpl: 2 docs x 3 shingles, all duplicated -> 3 distinct / 6 = 500
    assert(out("tpl") == (("tpl", 2L, 6L, 3L, 500L)))
    // div: 6 occurrences, all distinct -> 1000
    assert(out("div") == (("div", 2L, 6L, 6L, 1000L)))
  }

  test("lineClean: C4 rules — terminal punct, min words, blocklist") {
    val doc =
      "This line survives the cleaning pass.\n" +         // kept
      "too short.\n" +                                     // < 3 words
      "No terminal punctuation on this line\n" +           // no . ! ? "
      "Enable JavaScript to view this page.\n" +           // blocklist (ci)
      "Does this one survive the cut?\n" +                 // kept (?)
      "if (x) { return; }\n" +                             // blocklist {
      "He said \"quoted lines also count.\""               // kept (")
    val out = TextAnalysis.lineClean(
        Seq((1L, doc)).toDF("doc_id", "text"), "doc_id", "text")
      .as[(Long, Long, Long, String)].head()
    assert(out._2 == 7L && out._3 == 3L)
    assert(out._4 ==
      "This line survives the cleaning pass.\n" +
      "Does this one survive the cut?\n" +
      "He said \"quoted lines also count.\"")
  }

  test("lineClean: empty and whitespace docs yield zero kept, not errors") {
    val out = TextAnalysis.lineClean(
        Seq((1L, ""), (2L, "   \n  ")).toDF("doc_id", "text"),
        "doc_id", "text")
      .select("doc_id", "n_kept", "text_clean")
      .as[(Long, Long, String)].collect()
      .map { case (k, v, t) => k -> ((v, t)) }.toMap
    assert(out == Map(1L -> ((0L, "")), 2L -> ((0L, ""))))
  }

  test("redact: all four PII families; URLs swallow embedded addresses") {
    val df = Seq(
      ("mail bob.smith+x@corp.io now", "mail <EMAIL> now"),
      ("see https://a.b/10.0.0.1?u=x@y.zz ok", "see <URL> ok"),
      ("dial +44-020-79460000 today", "dial <PHONE> today"),
      ("host 192.168.0.255 down", "host <IP> down"),
      // not PII: version strings (too few octets), bare small numbers
      ("v1.2.3 release 42", "v1.2.3 release 42")
    ).toDF("text", "want")
    val out = df.select(TextAnalysis.redact(col("text")).as("got"), col("want"))
      .as[(String, String)].collect()
    out.foreach { case (got, want) => assert(got == want, s"got=$got") }
  }

  test("chunkDocuments: disjoint + overlapping windows, short tail, tiny doc") {
    val docs = Seq(
      (1L, "a b c d e f g"), // 7 tokens
      (2L, "x y")            // shorter than one window
    ).toDF("doc_id", "text")
    // chunk=3, stride=2 -> doc 1 starts at 0,2,4,6
    val out = TextAnalysis.chunkDocuments(docs, "doc_id", "text",
        chunkTokens = 3, stride = 2)
      .orderBy("doc_id", "chunk_id")
      .select("doc_id", "chunk_id", "n_tokens", "chunk_text")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(out == Seq(
      (1L, 0L, 3L, "a b c"),
      (1L, 1L, 3L, "c d e"),
      (1L, 2L, 3L, "e f g"),
      (1L, 3L, 1L, "g"),
      (2L, 0L, 2L, "x y")))
  }

  test("chunkDocuments: chunks reconstruct the document when stride == chunk") {
    val docs = Seq((1L, (1 to 23).map(i => s"t$i").mkString(" "))).toDF("doc_id", "text")
    val out = TextAnalysis.chunkDocuments(docs, "doc_id", "text",
        chunkTokens = 5, stride = 5)
      .orderBy("chunk_id").select("chunk_text").as[String].collect()
    assert(out.mkString(" ") == docs.select("text").as[String].head())
    assert(out.length == 5) // ceil(23/5)
  }

  test("removeBoilerplateLines: frequent lines drop, position order kept") {
    val header = "COOKIE BANNER"
    val docs = Seq(
      (1L, s"$header\nalpha one\nbeta two"),
      (2L, s"$header\ngamma three\nbeta two"),
      (3L, s"$header\ndelta four"),
      (4L, s"$header\n$header") // fully boilerplate
    ).toDF("doc_id", "text")
    val out = TextAnalysis.removeBoilerplateLines(docs, "doc_id", "text",
        minDocs = 3)
      .orderBy("doc_id")
      .select("doc_id", "n_lines", "n_kept", "text_clean")
      .as[(Long, Long, Long, String)].collect().toSeq
    // header appears in 4 docs (>= 3) -> removed everywhere; "beta two"
    // appears in only 2 docs -> kept.
    assert(out == Seq(
      (1L, 3L, 2L, "alpha one\nbeta two"),
      (2L, 3L, 2L, "gamma three\nbeta two"),
      (3L, 2L, 1L, "delta four"),
      (4L, 2L, 0L, "")))
  }

  test("redactCards: Luhn separates real card numbers from lookalikes") {
    val out = Seq(
      "pay 4242424242424242 and 4242424242424241 " +
        "and 4111111111111111 ref 123456789012")
      .toDF("t").select(TextAnalysis.redactCards(col("t")))
      .as[String].head()
    // 4242…42 and 4111…11 pass the checksum; …41 fails by one digit;
    // the 12-digit run is below the card length band
    assert(out == "pay <CARD> and 4242424242424241 " +
      "and <CARD> ref 123456789012")
  }

  test("readability: hand-computed Flesch micro-units; empty doc is NULL") {
    val out = TextAnalysis.readability(
        Seq((1L, "The cat sat. It ran fast! Did it? yes"), (2L, ""))
          .toDF("doc_id", "text"), "doc_id", "text")
      .orderBy("doc_id")
      .select("n_words", "n_sentences", "n_syllables", "flesch_micro")
      .as[(Long, Long, Long, Option[Long])].collect().toSeq
    // W=9 S=3 Syl=9: 206835000 - 1015000*9 div 3 - 84600000*9 div 9
    assert(out == Seq((9L, 3L, 9L, Some(119190000L)),
      (0L, 1L, 0L, None)))
  }

  test("dedupLinesGlobal: first occurrence survives, later copies drop") {
    val docs = Seq(
      (1L, "shared line\nunique alpha"),
      (2L, "unique beta\nshared line"),   // later copy of "shared line"
      (3L, "shared line\nshared line"),   // both copies drop
      (4L, "unique gamma")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.dedupLinesGlobal(docs, "doc_id", "text")
      .orderBy("doc_id")
      .select("doc_id", "n_lines", "n_kept", "text_clean")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(out == Seq(
      (1L, 2L, 2L, "shared line\nunique alpha"), // doc 1 owns pos-0 first
      (2L, 2L, 1L, "unique beta"),
      (3L, 2L, 0L, ""),
      (4L, 1L, 1L, "unique gamma")))
  }

  test("dedupLinesGlobal: within-doc order decides the winner; blanks exempt") {
    val docs = Seq(
      // "x" first occurs at doc 1 pos 1 (after "a"), so doc 1 keeps it
      // and doc 2's pos-0 copy... doc ORDER outranks position: (1,1) <
      // (2,0), doc 1 wins.
      (1L, "a\nx"),
      (2L, "x\nb"),
      (3L, "\n\nc") // two blank lines both survive (structure, not content)
    ).toDF("doc_id", "text")
    val out = TextAnalysis.dedupLinesGlobal(docs, "doc_id", "text")
      .orderBy("doc_id")
      .select("doc_id", "n_kept", "text_clean")
      .as[(Long, Long, String)].collect().toSeq
    assert(out == Seq(
      (1L, 2L, "a\nx"),
      (2L, 1L, "b"),
      (3L, 3L, "\n\nc")))
  }

  test("removeBoilerplateLines: duplicate lines within ONE doc don't count") {
    // "refrain" repeats 3x inside doc 1 but exists in only 2 DISTINCT docs:
    // below minDocs=3, so it must survive (count is per-document).
    val docs = Seq(
      (1L, "refrain\nrefrain\nrefrain"),
      (2L, "refrain\nsolo line here")).toDF("doc_id", "text")
    val out = TextAnalysis.removeBoilerplateLines(docs, "doc_id", "text",
        minDocs = 3)
      .orderBy("doc_id").select("n_kept").as[Long].collect().toSeq
    assert(out == Seq(3L, 2L))
  }

  test("removeBoilerplateLines: broadcast-anti shape equals a naive reference") {
    // random-ish multi-line corpus with heavy line sharing across docs
    val docs = (0L until 50L).map { i =>
      val lines = (0 until 5).map(j => s"line ${(i * 11 + j * 5) % 17}")
      (i, lines.mkString("\n"))
    }.toDF("doc_id", "text")
    val fast = TextAnalysis.removeBoilerplateLines(docs, "doc_id", "text",
        minDocs = 4)
      .as[(Long, Long, Long, String)].collect().toSet
    // naive reference: explode, distinct-doc frequency, filter, regroup
    val l = docs.select(col("doc_id"),
      posexplode(split(col("text"), "\n")).as(Seq("pos", "line")))
    val freq = l.groupBy("line").agg(countDistinct("doc_id").as("nd"))
    val naive = l.join(freq, "line").where(col("nd") < 4)
      .groupBy("doc_id").agg(count(lit(1)).as("n_kept"),
        concat_ws("\n", transform(
          array_sort(collect_list(struct(col("pos"), col("line")))),
          s => s.getField("line"))).as("text_clean"))
      .join(docs.select(col("doc_id"),
        size(split(col("text"), "\n")).cast("long").as("n_lines")), Seq("doc_id"), "right")
      .select(col("doc_id"), col("n_lines"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("text_clean"), lit("")).as("text_clean"))
      .as[(Long, Long, Long, String)].collect().toSet
    assert(fast == naive)
  }

  test("chunkDocuments: every token is covered; overlap = chunk - stride") {
    val docs = (0L until 30L).map { i =>
      (i, (0 until (5 + (i % 20)).toInt).map(j => s"t${i}_$j").mkString(" "))
    }.toDF("doc_id", "text")
    val chunks = TextAnalysis.chunkDocuments(docs, "doc_id", "text",
      chunkTokens = 6, stride = 4)
    // rebuild each doc from its chunks: drop the (chunk-stride)-token
    // overlap from every non-first chunk, then concatenate in order
    // (a trailing chunk shorter than the overlap contributes no new
    // tokens — its tail slice is empty and flattens away)
    val rebuilt = chunks
      .withColumn("tailArr", when(col("chunk_id") === 0, split(col("chunk_text"), " "))
        .otherwise(slice(split(col("chunk_text"), " "), 3, 1000)))
      .groupBy("doc_id").agg(concat_ws(" ", flatten(transform(
        array_sort(collect_list(struct(col("chunk_id"), col("tailArr")))),
        s => s.getField("tailArr")))).as("re"))
      .join(docs, "doc_id")
    assert(rebuilt.where(col("re") =!= col("text")).count() == 0)
  }

  test("tfIdfTopK: tf desc, then rarity (df asc), then term; k bound") {
    // 'rare' appears in 1 doc, 'common' in all 3: equal tf in doc 1 must
    // rank 'rare' first
    val docs = Seq((1L, "rare common rare common zz"),
      (2L, "common common filler pad pad"),
      (3L, "common filler other words here")).toDF("doc_id", "text")
    val out = TextAnalysis.tfIdfTopK(docs, "doc_id", "text", k = 2)
    val d1 = out.where(col("doc_id") === 1).orderBy(col("tf").desc, col("df"))
      .select("term", "tf", "df").as[(String, Long, Long)].collect().toSeq
    assert(d1 == Seq(("rare", 2L, 1L), ("common", 2L, 3L)))
    val counts = out.groupBy("doc_id").count().as[(Long, Long)].collect().toMap
    assert(counts.values.forall(_ <= 2))
  }

  test("collocations: hand-computed lift; min-count floor; empty tokens excluded") {
    // tokens: N = 10 (c_x=4, c_y=4, c_z=1, c_w=1); bigrams: M = 5
    // (c_xy=3, c_xz=1, c_wy=1); lift(x,y) = 3·10²/(5·4·4) = 3.75 → 3750‰
    val docs = Seq("x y", "x y", "x y", "x z", "w y").toDF("text")
    val out = TextAnalysis.collocations(docs, "text", minCount = 2)
      .as[(String, String, Long, Long)].collect().toSeq
    assert(out == Seq(("x", "y", 3L, 3750L)), out.toString)

    // a double space yields empty tokens: excluded from pairs AND totals
    val messy = Seq("a  b", "a b", "a b").toDF("text")
    // tokens: a×3, b×3 (N=6); bigrams: (a,b)×2 (the "a  b" row pairs
    // a-"" and ""-b, both dropped) → M=2; lift = 2·36/(2·9) = 4 → 4000‰
    val out2 = TextAnalysis.collocations(messy, "text", minCount = 2)
      .as[(String, String, Long, Long)].collect().toSeq
    assert(out2 == Seq(("a", "b", 2L, 4000L)), out2.toString)
  }

  test("collocations: empty and whitespace-only corpora yield a typed empty result") {
    val schema = Seq("a" -> "string", "b" -> "string",
      "c_ab" -> "bigint", "lift_permille" -> "bigint")
    for (docs <- Seq(Seq.empty[String], Seq("", "   ", " "))) {
      val out = TextAnalysis.collocations(docs.toDF("text"), "text")
      assert(out.schema.fields.map(f => f.name -> f.dataType.simpleString).toSeq
        == schema)
      assert(out.count() == 0L)
    }
  }

  test("collocations: ONE tokenize pass — the corpus file is scanned exactly once") {
    // The round-9 shape re-ran the tokenize→explode lineage ~4× (unigram
    // agg, bigram agg, and a scalar action for each total). Count stages
    // whose RDD lineage contains the parquet FileScanRDD across the WHOLE
    // run (internal totals action + final collect): must be exactly 1 —
    // skipped (cache-served) stages never get submitted events.
    val scanStages = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onStageSubmitted(
          ev: org.apache.spark.scheduler.SparkListenerStageSubmitted): Unit =
        if (ev.stageInfo.rddInfos.exists(_.name.contains("FileScanRDD")))
          scanStages.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      // PRIVATE copy of the corpus file: collocations persists its
      // bigram aggregate internally, and its builder runs an eager
      // totals action — so any OTHER suite that merely BUILDS the
      // registered collocations query on the shared session (the
      // global-window audit sweeps all of them on sf0.001)
      // materializes that cache, and this test's identical-lineage run
      // would then read the InMemoryRelation with ZERO file scans. A
      // distinct path keeps the one-scan assertion about THIS run.
      val dir = java.nio.file.Files.createTempDirectory("graft-colloc-scan")
      val src = java.nio.file.Paths.get("/root/testdata/sf0.001/documents.parquet")
      val dst = dir.resolve("documents.parquet")
      java.nio.file.Files.copy(src, dst)
      val docs = spark.read.parquet(dst.toString)
      val out = TextAnalysis.collocations(docs, "text", minCount = 2).collect()
      assert(out.nonEmpty)
      // listener bus is async (and private): first wait for the scan
      // stage's event to arrive AT ALL (a loaded bus can lag past one
      // poll interval — two early polls both reading 0 "settle" wrong),
      // then poll until the count stops moving.
      val deadline = System.nanoTime() + 10_000_000_000L
      while (System.nanoTime() < deadline && scanStages.get() == 0)
        Thread.sleep(200)
      var last = -1
      while (System.nanoTime() < deadline && scanStages.get() != last) {
        last = scanStages.get(); Thread.sleep(200)
      }
      assert(scanStages.get() == 1,
        s"corpus scanned ${scanStages.get()} times; collocations must tokenize once")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("surprisal: hand-computed quantized bits; token-less docs absent") {
    // corpus: N=7 tokens; c(a)=4, c(b)=2, c(c)=1
    // bits: a -> floor(log2(7 div 4)) = 0; b -> floor(log2(3)) = 1;
    //       c -> floor(log2(7)) = 2
    val df = Seq((1L, "a a a b"), (2L, "a b c"), (3L, ""), (4L, "  "))
      .toDF("doc_id", "text")
    val out = TextAnalysis.surprisal(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // doc 1: (0+0+0+1)*1000 div 4 = 250; doc 2: (0+1+2)*1000 div 3 = 1000
    assert(out == Map(1L -> ((4L, 250L)), 2L -> ((3L, 1000L))), out.toString)
  }

  test("bigramSurprisal: hand-computed conditional bits; sub-2-token docs absent") {
    // bigram occurrences: (a,a)x2 (a,b)x2 (b,c)x1 — doc1 "a a a b", doc2 "a b c"
    // left-context totals: c(a·)=4, c(b·)=1
    // bits: (a,a) -> floor(log2(4 div 2)) = 1; (a,b) -> 1; (b,c) -> floor(log2(1)) = 0
    val df = Seq((1L, "a a a b"), (2L, "a b c"), (3L, "solo"), (4L, ""))
      .toDF("doc_id", "text")
    val out = TextAnalysis.bigramSurprisal(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // doc 1 bigrams (a,a)(a,a)(a,b): (1+1+1)*1000 div 3 = 1000
    // doc 2 bigrams (a,b)(b,c): (1+0)*1000 div 2 = 500
    assert(out == Map(1L -> ((3L, 1000L)), 2L -> ((2L, 500L))), out.toString)
  }

  test("stupidBackoff: hand-computed held-out bits; the backoff path is live") {
    // train: "the cat sat" + "the cat ran" -> N=6; uni the:2 cat:2 sat:1
    // ran:1; bigrams (the,cat):2 (cat,sat):1 (cat,ran):1; c(the·)=2 c(cat·)=2
    val train = Seq((0L, "the cat sat"), (2L, "the cat ran")).toDF("doc_id", "text")
    val score = Seq((1L, "the cat sat"), (3L, "the dog sat"), (5L, ""))
      .toDF("doc_id", "text")
    val out = TextAnalysis.stupidBackoff(score, train, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // doc 1: the(first)=log2(7 div 3)=1; cat|the=log2(2 div 2)=0;
    //        sat|cat=log2(2 div 1)=1 -> 2000 div 3 = 666
    // doc 3: the=1; dog|the UNSEEN -> 2 + log2(7 div 1)=2 -> 4;
    //        sat|dog UNSEEN -> 2 + log2(7 div 2)=1 -> 3 -> 8000 div 3 = 2666
    // doc 5: token-less -> absent
    assert(out == Map(1L -> ((3L, 666L)), 3L -> ((3L, 2666L))), out.toString)
  }

  test("stupidBackoff: in-domain text scores below out-of-domain under the same model") {
    val train = (0L until 20L).map(i =>
      (2 * i, "alpha beta gamma delta alpha beta")).toDF("doc_id", "text")
    val score = Seq((1L, "alpha beta gamma delta"),
      (3L, "delta gamma beta alpha"), // same words, unseen transitions
      (5L, "zorp quux flib nark")).toDF("doc_id", "text") // full OOV
    val out = TextAnalysis.stupidBackoff(score, train, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out(1L) < out(3L), out.toString) // fluent < shuffled
    assert(out(3L) < out(5L), out.toString) // shuffled < gibberish
  }

  test("bigramSurprisal: shuffled gibberish scores above fluent text, unigram ties") {
    // same unigram multiset in every doc, but docs 1-3 repeat one fluent
    // transition pattern while doc 4 permutes it: unigram surprisal ties,
    // bigram surprisal separates.
    val df = Seq((1L, "the cat sat the cat sat"), (2L, "the cat sat the cat sat"),
      (3L, "the cat sat the cat sat"), (4L, "cat the sat sat the cat"))
      .toDF("doc_id", "text")
    val uni = TextAnalysis.surprisal(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(uni.values.toSet.size == 1, s"unigram should tie: $uni")
    val bi = TextAnalysis.bigramSurprisal(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(bi(4L) > bi(1L), s"gibberish must out-surprise fluent: $bi")
  }

  test("bm25TopK: hand-computed quantized scores; zero-idf terms contribute nothing") {
    // corpus: N=4 docs, T=13 tokens, avgdl_milli = 13000 div 4 = 3250
    // df: x=2, y=2, z=2 (1 idf bit each: 4 div 2 = 2); c=3 (0 bits: 4 div 3 = 1)
    // tfnorm_milli = (44000·tf·3250) div (65000·tf + 19500 + 18000·dl)
    val docs = Seq(
      (1L, "x x y c"),   // dl=4: x→1291, y→913
      (2L, "x z c"),     // dl=3: x→1032
      (3L, "y y y y c"), // dl=5: y→1548
      (4L, "z")).toDF("doc_id", "text")
    val out = TextAnalysis.bm25TopK(docs, "doc_id", "text",
        queries = Seq(1L -> Seq("x", "y"), 2L -> Seq("c"), 3L -> Seq("x", "c")),
        k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(out == Set(
      (1L, 1L, 2204L), (1L, 3L, 1548L), // d2 at 1032 falls off k=2
      // query 2 (only the 0-bit 'c') scores nothing anywhere → absent
      (3L, 1L, 1291L), (3L, 2L, 1032L)), out.toString)
  }

  test("int_log2: exact integer floor-log2; NULL at and below zero") {
    val vals = Seq(-5L, 0L, 1L, 2L, 3L, 1023L, 1024L, Long.MaxValue).toDF("x")
    val got = vals.select(graft.functions.F.intLog2(col("x")).as("b"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getLong(0))).toSeq
    assert(got == Seq(None, None, Some(0L), Some(1L), Some(1L),
      Some(9L), Some(10L), Some(62L)), got.toString)
  }

  test("sentenceChunks: whole-sentence packing by start offset; fragments; overflow") {
    val docs = Seq(
      (1L, "a b c. d e! f g h i"), // 3+2+4 tokens, starts 0/3/5
      (2L, "...w x y z a b c d"), // leading enders skip; one 8-token fragment
      (3L, "one. two.")).toDF("doc_id", "page")
    val got = TextAnalysis.sentenceChunks(docs, "doc_id", "page",
        budgetTokens = 5)
      .as[(Long, Long, Long, Long, String)].collect().toSet
    assert(got == Set(
      (1L, 0L, 2L, 5L, "a b c. d e!"), // starts 0 and 3 → chunk 0
      (1L, 1L, 1L, 4L, "f g h i"), // start 5 → chunk 1
      (2L, 0L, 1L, 8L, "w x y z a b c d"), // over-budget sentence keeps its chunk
      (3L, 0L, 2L, 2L, "one. two.")))
  }

  test("contrastivePairs: adjacent positives, bucket-rotation negatives, wrap") {
    // chunks for 3 docs; buckets=1 puts all chunk-0 docs in one ring:
    // 1 → 2 → 3 → 1 (wrap). Doc 3 has a single chunk → no positive.
    val chunks = Seq(
      (1L, 0L, "a0"), (1L, 1L, "a1"), (1L, 2L, "a2"),
      (2L, 0L, "b0"), (2L, 1L, "b1"),
      (3L, 0L, "c0")).toDF("doc_id", "chunk_id", "chunk_text")
    val got = TextAnalysis.contrastivePairs(chunks, buckets = 1)
      .as[(Long, Long, String, String, Long, String)].collect().toSet
    assert(got == Set(
      (1L, 0L, "a0", "a1", 2L, "b0"),
      (1L, 1L, "a1", "a2", 2L, "b0"),
      (2L, 0L, "b0", "b1", 3L, "c0")))
    // a singleton bucket would self-pair → its rows drop
    val solo = TextAnalysis.contrastivePairs(
      Seq((7L, 0L, "x0"), (7L, 1L, "x1")).toDF("doc_id", "chunk_id", "chunk_text"),
      buckets = 4)
    assert(solo.count() == 0)
  }

  test("topicClassify: weighted argmax, repeat terms, ties, 'other' fallback") {
    val lex = Seq(
      ("cat", "pets", 10L), ("dog", "pets", 8L),
      ("tax", "finance", 10L), ("cat", "finance", 3L))
    val docs = Seq(
      (1L, "cat dog mouse"), // pets 18, finance 3
      (2L, "tax tax cat"), // finance 23 (repeat counts), pets 10
      (3L, "mouse house"), // no hit → other/0
      (4L, "Cat TAX dog tax")) // case-folds: pets 18, finance 23... recompute
      .toDF("doc_id", "text")
    val got = TextAnalysis.topicClassify(docs, "doc_id", "text", lex)
      .as[(Long, String, Long)].collect().toSet
    // doc 4: cat→pets10+fin3, tax→fin10, dog→pets8, tax→fin10:
    //   pets 18, finance 23
    assert(got == Set((1L, "pets", 18L), (2L, "finance", 23L),
      (3L, "other", 0L), (4L, "finance", 23L)))
    // exact score tie breaks to the lexicographically smaller topic
    val tie = TextAnalysis.topicClassify(
        Seq((9L, "cat tax")).toDF("doc_id", "text"), "doc_id", "text",
        Seq(("cat", "bbb", 5L), ("tax", "aaa", 5L)))
      .as[(Long, String, Long)].collect().toSet
    assert(tie == Set((9L, "aaa", 5L)))
  }

  test("hapaxProfile: per-key vocab, single-occurrence count, empty tokens drop") {
    val docs = Seq(
      ("s1", "a b a c"),
      ("s1", "b d"),
      ("s2", "x x  x")) // double space -> empty token, must not count
      .toDF("source", "text")
    val got = TextAnalysis.hapaxProfile(docs, "source", "text")
      .as[(String, Long, Long, Long)].collect().toSet
    // s1: a=2 b=2 c=1 d=1 -> vocab 4, hapax 2, 500 permille
    // s2: x=3 -> vocab 1, hapax 0, 0 permille
    assert(got == Set(("s1", 4L, 2L, 500L), ("s2", 1L, 0L, 0L)))
  }

  test("vocabGrowth: birth positions follow id order across bucket boundaries") {
    val docs = Seq(
      (0L, "a b"), // positions 1-2
      (1L, "b c c"), // positions 3-5
      (5000L, "d a")) // next bucket (width 4096): positions 6-7
      .toDF("doc_id", "text")
    val got = TextAnalysis.vocabGrowth(docs, "doc_id", "text",
        cuts = Seq(1L, 2L, 4L, 6L, 100L))
      .as[(Long, Long)].collect().toMap
    // births: a@1, b@2, c@4, d@6
    assert(got == Map(1L -> 1L, 2L -> 2L, 4L -> 3L, 6L -> 4L, 100L -> 4L))
  }

  test("vocabGrowth: empty tokens occupy positions but are never types") {
    val docs = Seq((0L, "x  y")).toDF("doc_id", "text") // split: x, "", y
    val got = TextAnalysis.vocabGrowth(docs, "doc_id", "text",
        cuts = Seq(2L, 3L))
      .as[(Long, Long)].collect().toMap
    // y is born at position 3 (the empty token holds position 2)
    assert(got == Map(2L -> 1L, 3L -> 2L))
  }

  test("yuleK: hand-computed spectrum; uniform singletons read K = 0") {
    val docs = Seq(("s", "a a b"), ("s", "b c"), ("u", "p q r"))
      .toDF("source", "text")
    val got = TextAnalysis.yuleK(docs, "source", "text")
      .as[(String, Long, Long, Long, Long)].collect().toSet
    // s: a=2 b=2 c=1 → N=5 V=3 Σc²=9, K = (9−5)·10⁴ // 25 = 1600
    // u: all hapax → Σc² = N → K = 0 (maximal diversity)
    assert(got == Set(("s", 5L, 3L, 9L, 1600L), ("u", 3L, 3L, 3L, 0L)))
  }

  test("zipfBands: run-interval band overlap matches per-type ranks") {
    val docs = Seq("a a a a b b c d").toDF("text")
    // freqs a=4 b=2 c=1 d=1 → ranks a:1 b:2 {c,d}:3,4
    // band0 ranks[1,1]: a → 1 type, mass 4
    // band1 ranks[2,3]: b + one singleton → 2 types, mass 3
    // band2 ranks[4,7]: one singleton → 1 type, mass 1
    val got = TextAnalysis.zipfBands(docs, "text")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
    assert(got == Set(
      (0L, 1L, 1L, 4L, 4L, 4L),
      (1L, 2L, 2L, 3L, 2L, 1L),
      (2L, 4L, 1L, 1L, 1L, 1L)))
  }

  test("zipfBands: bands cover the whole vocabulary exactly once") {
    val docs = Seq("a a a b b c", "b d e a c c f g h").toDF("text")
    val out = TextAnalysis.zipfBands(docs, "text")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(out.map(_._3).sum == 8L) // 8 distinct types
    assert(out.map(_._4).sum == 15L) // 15 tokens
  }

  test("charClassProfile: codepoint classes incl. surrogate pair and accents") {
    // 'A','b' letters; '1' digit; ' ' + '\n' spaces; '.' punct;
    // 'é' and the emoji (one CODEPOINT, two chars) both read "other"
    val docs = Seq(("k", "Ab1 .\né😀")).toDF("source", "text")
    val got = TextAnalysis.charClassProfile(docs, "source", "text")
      .as[(String, Long, Long, Long, Long, Long, Long, Long)]
      .collect().toSet
    assert(got == Set(("k", 8L, 2L, 1L, 2L, 1L, 2L, 250L)))
  }

  test("charClassProfile: empty corpus reports NULL permille, not a crash") {
    val docs = Seq(("k", "")).toDF("source", "text")
    val row = TextAnalysis.charClassProfile(docs, "source", "text").head
    assert(row.getLong(1) == 0L && row.isNullAt(7))
  }
}
