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
  * decomposition + combining-mark strip (covers Latin accents) plus a small
  * direct map for Latin letters that do not decompose (ß, Ø, Æ, …). Full
  * `unidecode` parity (CJK → pinyin etc.) would need its mapping table;
  * divergence documented in SURVEY.md §7.4. Codegen-enabled so it stays
  * inside whole-stage codegen on the hot path.
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

object AsciiFold {
  private val direct: Map[Char, String] = Map(
    'Æ' -> "AE", 'æ' -> "ae", 'Ø' -> "O", 'ø' -> "o",
    'Đ' -> "D", 'đ' -> "d", 'Ð' -> "D", 'ð' -> "d",
    'ß' -> "ss", 'Þ' -> "TH", 'þ' -> "th",
    'Œ' -> "OE", 'œ' -> "oe", 'Ł' -> "L", 'ł' -> "l",
    'ı' -> "i", 'Ħ' -> "H", 'ħ' -> "h", 'Ŧ' -> "T", 'ŧ' -> "t")

  /** ASCII-fold a string: NFD + strip combining marks + direct map.
    * Non-decomposable non-ASCII characters are dropped (matching
    * `unidecode`'s behavior of erasing unmappable codepoints). */
  def fold(s: String): String = {
    // Fast path: pure ASCII needs no normalization (the overwhelmingly
    // common case at 100 TB scale — avoid the NFD allocation).
    var ascii = true
    var j = 0
    while (ascii && j < s.length) { if (s.charAt(j) >= 128) ascii = false; j += 1 }
    if (ascii) return s

    val nfd = Normalizer.normalize(s, Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(nfd.length)
    var i = 0
    while (i < nfd.length) {
      val ch = nfd.charAt(i)
      if (Character.getType(ch) != Character.NON_SPACING_MARK) {
        if (ch < 128) sb.append(ch)
        else direct.get(ch) match {
          case Some(rep) => sb.append(rep)
          case None      => // unmappable: drop, like unidecode
        }
      }
      i += 1
    }
    sb.toString
  }
}
