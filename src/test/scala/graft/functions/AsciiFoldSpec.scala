package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** P3 `mimic_utf8_general_ci` (reference `embeddings-pipeline.py:63-72`):
  * transliterate → strip `.`/`$` → rtrim → lower. */
class AsciiFoldSpec extends SparkSpecBase {

  test("fold: latin accents decompose") {
    assert(AsciiFold.fold("café") == "cafe")
    assert(AsciiFold.fold("Üñîçödé") == "Unicode")
    assert(AsciiFold.fold("àéîõü") == "aeiou")
  }

  test("fold: direct-map letters that do not decompose") {
    assert(AsciiFold.fold("ßØÆœł") == "ssOAEoel")
  }

  test("fold: pure-ASCII fast path is identity") {
    val s = "plain ASCII text_123"
    assert(AsciiFold.fold(s) eq s)
  }

  test("fold: unmappable codepoints are dropped (unidecode-style)") {
    assert(AsciiFold.fold("a☃b") == "ab")  // snowman: no transliteration
    assert(AsciiFold.fold("a兙b") == "ab")  // hanzi no tier can read
  }

  test("fold: CJK hanzi romanize to toneless pinyin with syllable spaces") {
    assert(AsciiFold.fold("中国") == "zhong guo ")
    assert(AsciiFold.fold("你好世界") == "ni hao shi jie ")
    assert(AsciiFold.fold("数据处理") == "shu ju chu li ")
    assert(AsciiFold.fold("的了是不在") == "de le shi bu zai ")
  }

  test("fold: Hangul syllables decompose algorithmically (jamo style)") {
    assert(AsciiFold.fold("한국") == "hangug")
    assert(AsciiFold.fold("서울") == "seoul")
    assert(AsciiFold.fold("안녕") == "annyeong")
    // Full block: every one of the 11172 syllables folds to non-empty ASCII
    (0xAC00 to 0xD7A3).foreach { cp =>
      val out = AsciiFold.fold(cp.toChar.toString)
      assert(out.nonEmpty && out.forall(_ < 128), f"U+$cp%04X -> '$out'")
    }
  }

  test("fold: kana romanize via name-derived Hepburn") {
    assert(AsciiFold.fold("カタカナ") == "katakana")
    assert(AsciiFold.fold("しんぶん") == "shinbun")
    assert(AsciiFold.fold("すし") == "sushi")
    assert(AsciiFold.fold("つじ") == "tsuji") // Nihon-shiki names → Hepburn
  }

  test("fold: fullwidth forms fold to their ASCII originals") {
    assert(AsciiFold.fold("ＡＢＣ１２３") == "ABC123")
    assert(AsciiFold.fold("（ｘ＋ｙ）") == "(x+y)")
    assert(AsciiFold.fold("日本。") == "ri ben . ")
  }

  test("fold: round-8 extension-tier hanzi transliterate") {
    // characters from the tier-2 table (outside the original ~2.7k)
    assert(AsciiFold.fold("韬") == "tao ")
    assert(AsciiFold.fold("鲲鹏") == "kun peng ")
    assert(AsciiFold.fold("琥珀") == "hu po ")
    assert(AsciiFold.fold("蟋蟀") == "xi shuai ")
    assert(AsciiFold.fold("涮") == "shuan ")   // spot-corrected polyphone
    assert(AsciiFold.fold("炔") == "que ")     // spot-corrected polyphone
  }

  test("cjk_unmapped_count: dropped ideographs are counted, mapped ones are not") {
    assert(AsciiFold.unmappedCjk("hello") == 0)
    assert(AsciiFold.unmappedCjk("中国") == 0)          // fully mapped
    // pick an unmapped ideograph DYNAMICALLY (the tail-tier spec pins
    // that at least one exists) instead of hard-coding 兙/兡 — whether a
    // specific unit char has an ICU reading is icu4j-version-dependent
    // (ADVICE r15), the counting semantics under test are not
    val gap = (0x4E00 to 0x9FFF).find(cp => CjkFold.fold(cp.toChar).isEmpty)
      .map(_.toChar).get
    assert(AsciiFold.fold(gap.toString) == "")
    assert(AsciiFold.unmappedCjk(s"中${gap}国$gap") == 2)
    // kana/hangul are not ideographs and never count
    assert(AsciiFold.unmappedCjk("かな한국") == 0)
    // agreement property: a string with zero unmapped count never loses
    // ideographs in fold (every ideograph emits pinyin + trailing space)
    val s = "气候变化影响深远"
    assert(AsciiFold.unmappedCjk(s) == 0 && AsciiFold.fold(s).nonEmpty)
  }

  test("ICU Han-Latin tail tier: rare ideographs fold; hand tiers keep priority") {
    // outside the ~6.4k hand tiers, readable via ICU (basic block + ext A).
    // ICU-VERSION SENSITIVITY (ADVICE r15): tail readings come from the
    // classpath icu4j's kMandarin data (77.1 today) and CLDR revisions
    // can change a tail polyphone's reading — so tail characters assert
    // the CONVENTION (readable, lowercase letters + one trailing space),
    // not an exact byte reading. Hand-tier characters below stay exact:
    // their table is repo-pinned and immune to ICU upgrades.
    val conv = "\\A[a-z]+ \\z".r
    for (tail <- Seq("龘", "㐀", "蠿")) { // 㐀 = ext A, the old canonical gap
      val out = AsciiFold.fold(tail)
      assert(conv.findFirstIn(out).isDefined,
        s"ICU tail char $tail broke convention: [$out]")
    }
    // hand-tier + tail composition keeps word separation
    assert(AsciiFold.fold("你好蠿").startsWith("ni hao "))
    // hand-tier polyphone choices (unidecode's most-common reading) are
    // NOT overridden by ICU's kMandarin where the two disagree
    assert(AsciiFold.fold("地") == "di ")    // ICU reads de
    assert(AsciiFold.fold("长") == "chang ") // ICU reads zhang
    // measured coverage drop (VERDICT r14 #7): unmapped ideographs in the
    // basic block fall from ~14.6k (hand tiers only) to the ICU-unreadable
    // tail — still nonzero, so the cjk_unmapped observability is intact
    val basicUnmapped =
      (0x4E00 to 0x9FFF).count(cp => CjkFold.fold(cp.toChar).isEmpty)
    assert(basicUnmapped <= 100, s"basic-block unmapped: $basicUnmapped")
    assert(basicUnmapped > 0, "observability gone: nothing left unmapped")
    val extAUnmapped =
      (0x3400 to 0x4DBF).count(cp => CjkFold.fold(cp.toChar).isEmpty)
    assert(extAUnmapped <= 1000, s"ext-A unmapped: $extAUnmapped")
    // every tier output follows the table convention: lowercase ASCII
    // letters + ONE trailing space (word separation survives concat)
    (0x4E00 to 0x9FFF).flatMap(cp => CjkFold.fold(cp.toChar)).foreach { m =>
      assert(conv.findFirstIn(m).isDefined, s"convention broken: [$m]")
    }
  }

  test("property: CJK blocks fold to pure ASCII") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val charGen = Gen.frequency(
      2 -> Gen.choose(0x4E00.toChar, 0x9FFF.toChar),  // CJK ideographs
      2 -> Gen.choose(0xAC00.toChar, 0xD7A3.toChar),  // Hangul syllables
      1 -> Gen.choose(0x3041.toChar, 0x30FF.toChar),  // kana
      1 -> Gen.choose(0xFF01.toChar, 0xFF5E.toChar))  // fullwidth
    val strGen = Gen.listOf(charGen).map(_.mkString)
    val prop = Prop.forAll(strGen) { s => AsciiFold.fold(s).forall(_ < 128) }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  test("fold: full Latin-Extended-A coverage — every letter folds to ASCII") {
    (0x0100 to 0x017F).foreach { cp =>
      val out = AsciiFold.fold(cp.toChar.toString)
      assert(out.nonEmpty && out.forall(_ < 128),
        f"U+$cp%04X '${cp.toChar}' folded to '$out'")
    }
  }

  test("fold: Latin-Extended-B hooks, digraphs, and long s") {
    assert(AsciiFold.fold("Ɓƈɗ") == "Bcd")   // hook letters (name-derived)
    assert(AsciiFold.fold("Ǆǅǆ") == "DZDzdz") // digraphs (NFKD-derived)
    assert(AsciiFold.fold("ǉǌ") == "ljnj")
    assert(AsciiFold.fold("ſ") == "s")        // long s (NFKD)
    assert(AsciiFold.fold("Ɗʼn") == "Dn")
    assert(AsciiFold.fold("Ƙƙ") == "Kk")
    assert(AsciiFold.fold("Ơơư") == "Oou")    // horn accents via plain NFD
  }

  test("fold: Cyrillic and Greek romanize via name-derived tables") {
    assert(AsciiFold.fold("Москва") == "Moskva")
    assert(AsciiFold.fold("Щи и борщ") == "Shchi i borshch")
    assert(AsciiFold.fold("объём") == "obem") // hard sign dropped, ё → е base
    assert(AsciiFold.fold("Йогурт") == "Iogurt") // Й decomposes to И + breve
    assert(AsciiFold.fold("Αθήνα") == "Athena")
    assert(AsciiFold.fold("ςσ") == "ss")
    assert(AsciiFold.fold("Ψυχή") == "Psuche")
  }

  test("property: fold output is always pure ASCII") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    // bias toward the interesting planes: Latin-1/Ext-A/Ext-B + arbitrary
    val charGen = Gen.frequency(
      3 -> Gen.choose(0x20.toChar, 0x7E.toChar),
      3 -> Gen.choose(0xC0.toChar, 0x24F.toChar),
      1 -> org.scalacheck.Arbitrary.arbitrary[Char])
    val strGen = Gen.listOf(charGen).map(_.mkString)
    val prop = Prop.forAll(strGen) { s =>
      AsciiFold.fold(s).forall(_ < 128)
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  test("normalizeKey matches the reference transform end-to-end") {
    import spark.implicits._
    val df = Seq("Café.Güell$ ", "A.B$C  ", "ok").toDF("s")
    val out = df.select(F.normalizeKey(col("s")).as("k")).as[String].collect()
    assert(out.sameElements(Array("cafeguell", "abc", "ok")))
  }

  test("ascii_fold runs inside codegen as a SQL function") {
    F.registerAll(spark)
    val r = spark.sql("SELECT ascii_fold('Dvořák') AS f").collect().head.getString(0)
    assert(r == "Dvorak")
  }

  test("vector_sum_long aggregates element-wise from SQL") {
    F.registerAll(spark)
    val r = spark.sql(
      """SELECT vector_sum_long(v) AS s FROM VALUES
        |  (array(1L, 2L)), (array(10L, 20L, 30L)) AS t(v)""".stripMargin)
      .collect().head.getSeq[Long](0)
    assert(r == Seq(11L, 22L, 30L))
  }
}
