package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode → ASCII transliteration as a native Catalyst expression.
  *
  * Re-expresses the reference's `unidecode(...)` call inside
  * `mimic_utf8_general_ci` (reference `embeddings-pipeline.py:63-72`): NFD
  * decomposition + combining-mark strip (covers Latin accents) plus a
  * direct map for Latin letters that do not decompose — the Latin-1 set
  * (ß, Ø, Æ, …) hand-typed, the full Latin-Extended-A/B + IPA blocks
  * derived from the JDK's Unicode tables (see `derived`), Greek/Cyrillic
  * romanization name-derived (`romanized`), and CJK via [[CjkFold]]
  * (algorithmic Hangul + name-derived kana + bounded pinyin table +
  * fullwidth offsets). Output is pure ASCII by construction
  * (property-tested). Residual `unidecode` divergences (romanization
  * conventions, hanzi outside the bounded table) documented in
  * SURVEY.md §7.4.1. Codegen-enabled so it stays inside whole-stage
  * codegen on the hot path.
  */
case class AsciiFold(child: Expression) extends UnaryExpression {

  // `ExpectsInputTypes`/`AbstractDataType` are private[sql] in Spark 4.1,
  // so validate the input type directly instead.
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"ascii_fold requires a string argument, got ${child.dataType.catalogString}")

  override def dataType: DataType = StringType
  override def prettyName: String = "ascii_fold"

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(AsciiFold.fold(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.functions.AsciiFold$$.MODULE$$.fold($c.toString()))")

  override protected def withNewChildInternal(newChild: Expression): AsciiFold =
    copy(child = newChild)
}

/** `cjk_unmapped_count(s)` — how many CJK ideographs in `s` would be
  * silently DROPPED by [[AsciiFold]] (outside [[CjkFold]]'s bounded
  * pinyin table): the observability hook for the documented unidecode
  * divergence (SURVEY §7.4.1). A merge key losing characters stops being
  * an invisible failure and becomes a pipeline stat. */
case class CjkUnmappedCount(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cjk_unmapped_count requires a string argument, got ${child.dataType.catalogString}")

  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def prettyName: String = "cjk_unmapped_count"

  override def nullSafeEval(input: Any): Any =
    AsciiFold.unmappedCjk(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.AsciiFold$$.MODULE$$.unmappedCjk($c.toString())")

  override protected def withNewChildInternal(newChild: Expression): CjkUnmappedCount =
    copy(child = newChild)
}

object AsciiFold {
  private val manual: Map[Char, String] = Map(
    'Æ' -> "AE", 'æ' -> "ae", 'Ø' -> "O", 'ø' -> "o",
    'Đ' -> "D", 'đ' -> "d", 'Ð' -> "D", 'ð' -> "d",
    'ß' -> "ss", 'Þ' -> "TH", 'þ' -> "th",
    'Œ' -> "OE", 'œ' -> "oe", 'Ł' -> "L", 'ł' -> "l",
    'ı' -> "i", 'Ħ' -> "H", 'ħ' -> "h", 'Ŧ' -> "T", 'ŧ' -> "t",
    'ĸ' -> "k", 'ŉ' -> "n", 'Ŋ' -> "NG", 'ŋ' -> "ng")

  private def stripMarks(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      if (Character.getType(s.charAt(i)) != Character.NON_SPACING_MARK)
        sb.append(s.charAt(i))
      i += 1
    }
    sb.toString
  }

  private def isAsciiNonEmpty(s: String): Boolean =
    s.nonEmpty && s.forall(_ < 128)

  /** Latin Extended-A/B + IPA Extensions (U+0100–U+02AF) letters that
    * survive NFD with no
    * ASCII base — folded via (a) NFKD compatibility decomposition (long s,
    * the DZ/LJ/NJ digraphs, ŀ) or (b) the base letter named in the Unicode
    * character name ("LATIN CAPITAL LETTER B WITH HOOK" → "B") —
    * unidecode's convention, derived from the JDK's Unicode tables instead
    * of a hand-typed table, so the full block is covered. Letters with no
    * Latin base (tone letters, clicks, ezh…) stay unmapped and are dropped
    * by [[fold]], like unidecode's unmappable codepoints. */
  private val derived: Map[Char, String] = {
    val namePat = "LATIN (CAPITAL|SMALL) LETTER ([A-Z]{1,2})( WITH .+)?".r
    (0x0100 to 0x02AF).flatMap { cp =>
      val ch = cp.toChar
      val viaNfd =
        stripMarks(Normalizer.normalize(ch.toString, Normalizer.Form.NFD))
      if (isAsciiNonEmpty(viaNfd)) None // fold's NFD path already covers it
      else {
        val viaNfkd =
          stripMarks(Normalizer.normalize(ch.toString, Normalizer.Form.NFKD))
        if (isAsciiNonEmpty(viaNfkd)) Some(ch -> viaNfkd)
        else Option(Character.getName(cp)).collect {
          case namePat(kase, base, _) =>
            ch -> (if (kase == "SMALL") base.toLowerCase(java.util.Locale.ROOT)
                   else base)
        }
      }
    }.toMap
  }

  // Standard romanizations keyed by the letter token in the Unicode
  // character name — ~55 tokens unlock BOTH cases of every base letter in
  // the Greek and Cyrillic blocks (accented forms NFD-decompose to these
  // bases at fold time, so they need no entries of their own).
  private val greekTokens = Map(
    "ALPHA" -> "a", "BETA" -> "b", "GAMMA" -> "g", "DELTA" -> "d",
    "EPSILON" -> "e", "ZETA" -> "z", "ETA" -> "e", "THETA" -> "th",
    "IOTA" -> "i", "KAPPA" -> "k", "LAMDA" -> "l", "MU" -> "m",
    "NU" -> "n", "XI" -> "x", "OMICRON" -> "o", "PI" -> "p",
    "RHO" -> "r", "SIGMA" -> "s", "FINAL SIGMA" -> "s", "TAU" -> "t",
    "UPSILON" -> "u", "PHI" -> "ph", "CHI" -> "ch", "PSI" -> "ps",
    "OMEGA" -> "o")
  private val cyrillicTokens = Map(
    "A" -> "a", "BE" -> "b", "VE" -> "v", "GHE" -> "g", "DE" -> "d",
    "IE" -> "e", "ZHE" -> "zh", "ZE" -> "z", "I" -> "i", "SHORT I" -> "i",
    "KA" -> "k", "EL" -> "l", "EM" -> "m", "EN" -> "n", "O" -> "o",
    "PE" -> "p", "ER" -> "r", "ES" -> "s", "TE" -> "t", "U" -> "u",
    "EF" -> "f", "HA" -> "kh", "TSE" -> "ts", "CHE" -> "ch",
    "SHA" -> "sh", "SHCHA" -> "shch", "HARD SIGN" -> "", "YERU" -> "y",
    "SOFT SIGN" -> "", "E" -> "e", "YU" -> "yu", "YA" -> "ya",
    "IO" -> "yo", "GJE" -> "g", "DJE" -> "d", "TSHE" -> "c",
    "KJE" -> "k", "LJE" -> "lj", "NJE" -> "nj", "DZE" -> "dz",
    "DZHE" -> "dz", "YI" -> "yi", "UKRAINIAN IE" -> "ye",
    "BYELORUSSIAN-UKRAINIAN I" -> "i", "GHE WITH UPTURN" -> "g",
    "JE" -> "j")

  /** Greek + Cyrillic (U+0370–U+04FF) romanization, derived like
    * `derived`: the letter token from the Unicode character name looked up
    * in a standard-romanization table, both cases from one entry
    * ("CYRILLIC CAPITAL LETTER SHCHA" → "Shch"). Accented forms decompose
    * under NFD first, so only base letters need mapping. Not a `unidecode`
    * clone (it is a romanization convention choice); divergence documented
    * in SURVEY §7.4 — the merge-key oracle corpus is Latin. */
  private val romanized: Map[Char, String] = {
    val pat = "(GREEK|CYRILLIC) (CAPITAL|SMALL) LETTER ([A-Z \\-]+?)( WITH .+)?".r
    (0x0370 to 0x04FF).flatMap { cp =>
      val ch = cp.toChar
      val nfd = Normalizer.normalize(ch.toString, Normalizer.Form.NFD)
      if (nfd.length > 1) None // accented: folds via its base letter
      else Option(Character.getName(cp)).flatMap {
        case pat(script, kase, token, suffix) =>
          val table = if (script == "GREEK") greekTokens else cyrillicTokens
          // "GHE WITH UPTURN" is its own letter, not an accented GHE
          table.get(token + Option(suffix).getOrElse("")).orElse(table.get(token))
            .map { r =>
              ch -> (if (kase == "CAPITAL" && r.nonEmpty)
                r.substring(0, 1).toUpperCase(java.util.Locale.ROOT) + r.substring(1)
              else r)
            }
        case _ => None
      }
    }.toMap
  }

  private val direct: Map[Char, String] = derived ++ romanized ++ manual

  /** ASCII-fold a string: per character, direct/CJK map lookup first, then
    * NFD decomposition of the single character (so precomposed forms that
    * carry meaning — voiced kana, Hangul syllables — hit their table entry
    * BEFORE decomposition erases it; accented Latin/Greek/Cyrillic reach
    * their base letter through the recursion). Non-decomposable non-ASCII
    * characters are dropped (matching `unidecode`'s behavior of erasing
    * unmappable codepoints). */
  def fold(s: String): String = {
    // Fast path: pure ASCII needs no work (the overwhelmingly common case
    // at 100 TB scale — avoid every allocation).
    var ascii = true
    var j = 0
    while (ascii && j < s.length) { if (s.charAt(j) >= 128) ascii = false; j += 1 }
    if (ascii) return s

    val sb = new java.lang.StringBuilder(s.length)
    foldInto(s, sb)
    sb.toString
  }

  /** Count of CJK ideographs (URO + Extension A) in `s` with no
    * transliteration — the characters [[fold]] drops. Backing for
    * [[CjkUnmappedCount]]. */
  def unmappedCjk(s: String): Int = {
    var n = 0
    var i = 0
    while (i < s.length) {
      val ch = s.charAt(i)
      if (ch >= 0x3400 && ch <= 0x9FFF &&
          !direct.contains(ch) && CjkFold.fold(ch).isEmpty) n += 1
      i += 1
    }
    n
  }

  private def foldInto(s: String, sb: java.lang.StringBuilder): Unit = {
    var i = 0
    while (i < s.length) {
      val ch = s.charAt(i)
      if (ch < 128) sb.append(ch)
      else if (Character.getType(ch) != Character.NON_SPACING_MARK) {
        direct.get(ch).orElse(CjkFold.fold(ch)) match {
          case Some(rep) => sb.append(rep)
          case None =>
            val nfd = Normalizer.normalize(ch.toString, Normalizer.Form.NFD)
            if (nfd.length == 1 && nfd.charAt(0) == ch) {
              // no decomposition and no mapping: drop, like unidecode
            } else foldInto(nfd, sb)
        }
      }
      i += 1
    }
  }
}
