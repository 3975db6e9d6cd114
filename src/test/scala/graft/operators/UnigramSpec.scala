package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** The unigram-LM (Viterbi-EM) tokenizer: integer-log arithmetic,
  * hand-checked segmentations, driver ≡ distributed training, the
  * char-fallback tier, and encode aggregation. */
class UnigramSpec extends SparkSpecBase {
  import spark.implicits._

  private val toyTexts = Seq(
    "the then thesis cat",
    "the cats concatenate the",
    "the the the the the the the the",
    "then then then cat cat cat cat cats cats thesis")

  private def toyDf = toyTexts.map(Tuple1(_)).toDF("text")

  test("ilogQ10: exact Q10 log2 — powers of two and interpolation points") {
    assert(Unigram.ilogQ10(1L) == 0L)
    assert(Unigram.ilogQ10(2L) == 1024L)
    assert(Unigram.ilogQ10(3L) == 1536L) // 1024 + (1*1024)/2
    assert(Unigram.ilogQ10(1024L) == 10L * 1024L)
    assert(Unigram.ilogQ10(1536L) == 10L * 1024L + 512L)
    // monotone over a range
    val xs = (1L to 5000L).map(Unigram.ilogQ10)
    assert(xs.zip(xs.tail).forall { case (a, b) => a <= b })
  }

  test("segmentWord: planted vocab — likely pieces win, ties take the longer piece") {
    // counts: 'the' dominant, chars cheap
    val counts = Map("t" -> 2L, "h" -> 2L, "e" -> 2L, "n" -> 2L,
      "the" -> 100L, "then" -> 50L)
    val t = counts.values.sum
    val sc = counts.map { case (k, v) =>
      k -> (Unigram.ilogQ10(v) - Unigram.ilogQ10(t)) }
    assert(Unigram.segmentWord("the", sc) == Seq("the"))
    assert(Unigram.segmentWord("then", sc) == Seq("then"))
    assert(Unigram.segmentWord("thent", sc) == Seq("then", "t"))
    // a word past MaxWordLen falls back to chars
    val long = "t" * (Unigram.MaxWordLen + 1)
    assert(Unigram.segmentWord(long, sc) == Seq.fill(long.length)("t"))
  }

  test("train: toy corpus fixed point — dominant words become single pieces") {
    val got = Unigram.train(toyDf, "text", rounds = 2, seedSize = 20,
        vocabSize = 16)
      .as[(Long, String, Long)].collect().toSeq.sortBy(_._1)
    // hand-counted: 'the' occurs 1 + 2 + 8 = 11×, 'then' 1 + 3 = 4×,
    // 'cats' 1 + 2 = 3×; each survives EM as a single piece
    val byPiece = got.map(r => r._2 -> r._3).toMap
    assert(byPiece("the") == 11L, got.toString)
    assert(byPiece("then") == 4L)
    assert(byPiece("cats") == 3L)
    assert(got.head._2 == "the") // rank 1 by (cnt DESC, piece)
    // ranks are 1..n dense
    assert(got.map(_._1) == (1L to got.size.toLong))
  }

  test("driver and distributed training paths produce identical vocabularies") {
    val local = Unigram.train(toyDf, "text", rounds = 2, seedSize = 20,
        vocabSize = 16)
      .as[(Long, String, Long)].collect().toSet
    // maxDriverWords = 0 forces the distributed DataFrame loop
    val dist = Unigram.train(toyDf, "text", rounds = 2, seedSize = 20,
        vocabSize = 16, maxDriverWords = 0L)
      .as[(Long, String, Long)].collect().toSet
    assert(dist == local,
      s"paths diverged:\n local=$local\n dist=$dist")
  }

  test("chars survive the vocab cut; every corpus char is encodable") {
    val got = Unigram.train(toyDf, "text", rounds = 1, seedSize = 50,
        vocabSize = 12).as[(Long, String, Long)].collect()
    val chars = toyTexts.flatMap(_.split(" ")).filter(_.nonEmpty)
      .flatMap(_.toSeq).map(_.toString).toSet
    val vocabChars = got.map(_._2).filter(_.length == 1).toSet
    assert(chars.subsetOf(vocabChars),
      s"missing chars: ${chars -- vocabChars}")
  }

  test("fertilityReport: held-out OOV and unknown-char words take the char fallback") {
    // train on texts with a restricted alphabet; hold out words carrying
    // an UNKNOWN char ('z') and an in-alphabet but unseen word
    val train = Seq("the the the cat cat then").map(Tuple1(_)).toDF("text")
    val test = Seq((0L, "s1", "the zebra tact")).toDF("doc_id", "src", "text")
    val counts = Unigram.vocabCounts(
      Unigram.train(train, "text", rounds = 1, seedSize = 20, vocabSize = 16))
    val got = Unigram.fertilityReport(test, "text", "src",
        Bpe.wordFrequencies(train, "text").select("w"), counts)
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(got.size == 1)
    val (_, nWords, nTokens, fertility, oov) = got.head
    assert(nWords == 3L)
    // 'the' = 1 trained piece; 'zebra' carries unknown chars z/b/r → 5
    // char-fallback tokens; 'tact' is covered (t, a, c known) and
    // segments via the DP — exactly the driver segmentation's count
    val t = counts.values.sum
    val sc = counts.map { case (k, v) =>
      k -> (Unigram.ilogQ10(v) - Unigram.ilogQ10(t)) }
    val tactTokens = Unigram.segmentWord("tact", sc).size.toLong
    assert(nTokens == 1L + 5L + tactTokens, s"nTokens=$nTokens tact=$tactTokens")
    assert(fertility == nTokens * 1000L / 3L)
    // 'zebra' and 'tact' are absent from the train word table → OOV 2/3
    assert(oov == 2000L / 3L, s"oov=$oov")
  }

  test("encodeViaVocab: per-doc stats agree with driver segmentation") {
    val docs = toyTexts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val counts = Unigram.vocabCounts(
      Unigram.train(docs, "text", rounds = 2, seedSize = 20, vocabSize = 16))
    val got = Unigram.encodeViaVocab(docs, "doc_id", "text", counts)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    val t = counts.values.sum
    val sc = counts.map { case (k, v) =>
      k -> (Unigram.ilogQ10(v) - Unigram.ilogQ10(t)) }
    toyTexts.zipWithIndex.foreach { case (text, i) =>
      val ws = text.split(" ").filter(_.nonEmpty)
      val want = (ws.length.toLong,
        ws.map(w => Unigram.segmentWord(w, sc).size.toLong).sum,
        ws.map(_.length.toLong).sum)
      assert(got(i.toLong) == want, s"doc $i: got ${got(i.toLong)}, want $want")
    }
  }

  test("encodeViaVocab: out-of-vocab chars take the unk-per-char fallback, never drop") {
    // Violate the 'vocab trained on a superset' precondition: the vocab
    // never saw 'z'. The old path flowed NULL scores through the DP
    // struct (or silently dropped the word from the inner vocab join,
    // undercounting n_words); the coverage gate now routes such words to
    // the deterministic char fallback — n_pieces = len(w) — exactly the
    // tokenCounts / fertilityReport posture (ADVICE r14).
    val train = Seq("the the the cat cat then").map(Tuple1(_)).toDF("text")
    val counts = Unigram.vocabCounts(
      Unigram.train(train, "text", rounds = 1, seedSize = 20, vocabSize = 16))
    val test = Seq((7L, "the zebra")).toDF("doc_id", "text")
    val got = Unigram.encodeViaVocab(test, "doc_id", "text", counts)
      .as[(Long, Long, Long, Long)].collect().toSeq
    val t = counts.values.sum
    val sc = counts.map { case (k, v) =>
      k -> (Unigram.ilogQ10(v) - Unigram.ilogQ10(t)) }
    val theTokens = Unigram.segmentWord("the", sc).size.toLong
    // n_words counts BOTH words (no silent drop); zebra = 5 char tokens
    assert(got == Seq((7L, 2L, theTokens + 5L, 3L + 5L)),
      s"got $got, want (7, 2, ${theTokens + 5L}, 8)")
  }
}
