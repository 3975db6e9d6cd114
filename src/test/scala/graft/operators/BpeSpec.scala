package graft.operators

import graft.SparkSpecBase
import graft.Tables
import org.apache.spark.sql.functions._

class BpeSpec extends SparkSpecBase {
  import spark.implicits._

  test("train: hand-computed merge sequence on a tiny corpus") {
    val df = Seq((1L, "ab ab ab cd cd x")).toDF("doc_id", "text")
    val merges = Bpe.train(df, "text", numMerges = 5)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2))).toSeq
    // (a,b) weight 3 beats (c,d) weight 2; after both merge, every word is
    // one symbol — training exhausts at 2 merges despite numMerges = 5
    assert(merges == Seq((0, "a", "b"), (1, "c", "d")), merges.toString)
  }

  test("train: tie-break is (count desc, left asc, right asc)") {
    val df = Seq((1L, "ba ba dc dc")).toDF("doc_id", "text")
    val merges = Bpe.train(df, "text", numMerges = 1)
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq
    assert(merges == Seq(("b", "a")), merges.toString) // (b,a) < (d,c)
  }

  test("train: greedy overlap parity — a run of identical symbols merges every other") {
    val df = Seq((1L, "aaaa")).toDF("doc_id", "text")
    val merges = Bpe.train(df, "text", numMerges = 5)
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq
    // round 0: (a,a)x3 -> [aa, aa]; round 1: (aa,aa)x1 -> [aaaa]; done
    assert(merges == Seq(("a", "a"), ("aa", "aa")), merges.toString)
    assert(Bpe.encodeWord(merges, "aaaa") == Seq("aaaa"))
    assert(Bpe.encodeWord(merges, "aaa") == Seq("aa", "a"))
    assert(Bpe.encodeWord(merges, "aaaaa") == Seq("aaaa", "a"))
  }

  test("train: degenerate corpora — empty, whitespace-only, single-char words") {
    assert(Bpe.train(Seq((1L, "")).toDF("doc_id", "text"), "text", 3).count() == 0)
    assert(Bpe.train(Seq((1L, "   ")).toDF("doc_id", "text"), "text", 3).count() == 0)
    assert(Bpe.train(Seq((1L, "a b c a")).toDF("doc_id", "text"), "text", 3).count() == 0)
  }

  test("property: distributed loop equals the driver path on real corpus data") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val local = Bpe.train(docs, "text", numMerges = 6)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2))).toSeq
    val dist = Bpe.train(docs, "text", numMerges = 6, maxDriverWords = 0)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2))).toSeq
    assert(local.nonEmpty && local == dist,
      s"driver=$local\ndistributed=$dist")
  }

  test("property: encodeWord equals the trained vocabulary segmentation for every in-vocab word") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val merges = Bpe.train(docs, "text", numMerges = 8)
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq
    val vocab = Bpe.vocabulary(docs, "text", merges)
      .collect().map(r => (r.getString(0), r.getSeq[String](2))).toMap
    assert(vocab.nonEmpty)
    vocab.foreach { case (w, syms) =>
      assert(Bpe.encodeWord(merges, w) == syms,
        s"word '$w': inference ${Bpe.encodeWord(merges, w)} vs trained $syms")
      assert(syms.mkString == w, s"segmentation of '$w' lost characters")
    }
  }

  test("property: UNSEEN words segment exactly like the inference replay (held-out path)") {
    // train on one half of the corpus, segment words from the OTHER half —
    // the tokenizer_fertility path: vocabulary() re-segments whatever
    // words it is given, so out-of-train words ride the same merge fold
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val train = docs.where(org.apache.spark.sql.functions.expr("doc_id % 2 = 0"))
    val test_ = docs.where(org.apache.spark.sql.functions.expr("doc_id % 2 = 1"))
    val merges = Bpe.train(train, "text", numMerges = 8)
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq
    val seg = Bpe.vocabulary(test_, "text", merges)
      .collect().map(r => (r.getString(0), r.getSeq[String](2))).toMap
    assert(seg.nonEmpty)
    seg.foreach { case (w, syms) =>
      assert(Bpe.encodeWord(merges, w) == syms, s"held-out word '$w' diverged")
      assert(syms.mkString == w, s"segmentation of '$w' lost characters")
    }
    // a word with characters the training never saw falls back to chars
    val oov = Bpe.vocabulary(Seq("zq9zq9").toDF("text"), "text", merges)
      .collect().map(r => (r.getString(0), r.getSeq[String](2))).toMap
    assert(oov("zq9zq9") == Seq("z", "q", "9", "z", "q", "9"))
  }

  test("encodeViaVocab: per-doc token stats over the vocab join") {
    val df = Seq((1L, "ab ab x"), (2L, "cd"), (3L, "")).toDF("doc_id", "text")
    val merges = Seq(("a", "b"), ("c", "d"))
    val vocab = Bpe.vocabulary(df, "text", merges)
    val out = Bpe.encodeViaVocab(df, "doc_id", "text", vocab)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out(1L) == ((3L, 3L, 5L))) // 3 words, each one token, 5 chars
    assert(out(2L) == ((1L, 1L, 2L)))
    assert(!out.contains(3L)) // empty text: no words, no row
  }
}
