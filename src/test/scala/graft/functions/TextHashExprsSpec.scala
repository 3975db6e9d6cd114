package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** Direct edge-case coverage for the native text/hash expressions (the
  * operator suites exercise the happy paths). */
class TextHashExprsSpec extends SparkSpecBase {
  import spark.implicits._

  test("MinHashSig: empty shingle set yields the MaxValue seed signature") {
    val out = Seq(Seq.empty[String], Seq("a b c")).toDF("sh")
      .select(F.minHashSig(col("sh"), numHashes = 8).as("sig"))
      .as[Seq[Long]].collect()
    assert(out(0).forall(_ == Long.MaxValue))
    assert(out(1).forall(_ != Long.MaxValue))
    assert(out.forall(_.length == 8))
  }

  test("MinHashBands: equal signatures give equal band hashes, and band " +
    "count matches") {
    val df = Seq(Seq("x y z"), Seq("x y z"), Seq("other words here"))
      .toDF("sh")
      .select(F.minHashBands(F.minHashSig(col("sh"), 32), bands = 4).as("b"))
    val rows = df.as[Seq[Long]].collect()
    assert(rows.forall(_.length == 4))
    assert(rows(0) == rows(1))
    assert(rows(0) != rows(2))
  }

  test("CountInSet ignores null elements and counts duplicates") {
    val out = Seq(1).toDF("i")
      .select(F.countInSet(
        array(lit("the"), lit(null).cast("string"), lit("the"), lit("zzz")),
        Seq("the", "a")).as("n"))
      .as[Long].head()
    assert(out == 2L)
  }

  test("WordShingles: fewer words than n yields empty; order preserved") {
    val out = Seq("a b", "a b c d a b c").toDF("t")
      .select(F.wordShingles(split(col("t"), " "), 3).as("sh"))
      .as[Seq[String]].collect()
    assert(out(0).isEmpty)
    assert(out(1) == Seq("a b c", "b c d", "c d a", "d a b"))
  }

  test("PolyFingerprint: empty and single-word docs are stable") {
    val out = Seq("", "x", "x", "y").toDF("t")
      .select(F.polyFingerprint(split(col("t"), " ")).as("f"))
      .as[Long].collect()
    assert(out(1) == out(2) && out(1) != out(3))
    assert(out(0) == 0L) // "" splits to [""] -> word value 0
  }

  test("PortableHash: pinned reference values (the SQL oracles mirror these)") {
    import org.apache.spark.unsafe.types.UTF8String
    // Cross-validated against an independent SQL/HUGEINT implementation —
    // a change here silently breaks every LSH oracle, so pin the bits.
    def m(s: String) = PortableHash.mix64(UTF8String.fromString(s))
    assert(m("hello") == 3767173640193804509L)
    assert(m("a") == -5836808829438595943L) // 12609935244270955673 as signed
    assert(m("") == 0L)
    assert(m("the quick brown") == -2463379447589441768L)
    assert(m("Ünïcode") == -7614929992301265699L) // codepoint-level, not byte
    def p(s: String) = PortableHash.poly31Mod(UTF8String.fromString(s), 1000000007L)
    assert(p("") == 0L)
    assert(p("a") == 97L)
    assert(p("ab") == 97L * 31 + 98) // 3105
    // supplementary plane: one codepoint, not a surrogate pair
    assert(p(new String(Character.toChars(0x1F600))) == 0x1F600L)
  }

  test("SrpBucket: identical vectors share a bucket; dim mismatch is safe") {
    val out = Seq(Seq(1f, 2f, 3f), Seq(1f, 2f, 3f), Seq(1f, 2f))
      .toDF("v")
      .select(F.srpBucket(col("v"), planes = 8, seed = 1L, dim = 3).as("b"))
      .as[Long].collect()
    assert(out(0) == out(1))
    assert(out.forall(b => b >= 0 && b < 256))
  }
}
