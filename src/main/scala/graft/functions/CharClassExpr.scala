package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `char_class_census(str)` — per-codepoint character-class counters in
  * ONE pass over the string: the raw material of encoding/quality audits
  * (a source whose digit or "other" share spikes is tables, code, or a
  * charset accident — the census is the cheap scan-stage signal that
  * pages before a model ever sees the batch).
  *
  * Classes are fixed ASCII-anchored sets so a SQL oracle can mirror them
  * with plain regex character classes:
  *
  *  - `n_chars`    — total Unicode CODEPOINTS (surrogate pairs count once,
  *                   matching SQL `length()` semantics)
  *  - `n_letters`  — ASCII `[A-Za-z]`
  *  - `n_digits`   — ASCII `[0-9]`
  *  - `n_spaces`   — space, tab, LF, CR
  *  - `n_punct`    — remaining printable ASCII (33..126)
  *  - `n_other`    — everything else (controls, non-ASCII — accented
  *                   letters land here deliberately: the census reads
  *                   BYTES-on-the-wire composition, not linguistic class)
  *
  * A built-in formulation needs four `regexp_replace` passes plus length
  * arithmetic per row — 4× the scan work and 4 regex engines on the hot
  * path; this is one tight JVM loop inside whole-stage codegen. Per-row
  * expression ⇒ no shuffle; at 100 TB it runs map-side inside the scan
  * stage and the per-key rollup exchanges six longs per key.
  */
case class CharClassCensus(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"char_class_census requires a string argument, got ${child.dataType.catalogString}")

  override def dataType: DataType = CharClassCensus.schema
  override def prettyName: String = "char_class_census"

  def compute(input: UTF8String): InternalRow = {
    val s = input.toString
    val n = s.length
    var i = 0
    var total = 0L; var letters = 0L; var digits = 0L
    var spaces = 0L; var punct = 0L
    while (i < n) {
      val cp = s.codePointAt(i)
      total += 1
      if ((cp >= 'A' && cp <= 'Z') || (cp >= 'a' && cp <= 'z')) letters += 1
      else if (cp >= '0' && cp <= '9') digits += 1
      else if (cp == ' ' || cp == '\t' || cp == '\n' || cp == '\r') spaces += 1
      else if (cp >= 33 && cp <= 126) punct += 1
      i += Character.charCount(cp)
    }
    InternalRow(total, letters, digits, spaces, punct,
      total - letters - digits - spaces - punct)
  }

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("charClassCensus", this,
      classOf[CharClassCensus].getName)
    defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
  }

  override protected def withNewChildInternal(c: Expression): CharClassCensus =
    copy(child = c)
}

object CharClassCensus {
  val schema: StructType = StructType(Seq(
    StructField("n_chars", LongType, nullable = false),
    StructField("n_letters", LongType, nullable = false),
    StructField("n_digits", LongType, nullable = false),
    StructField("n_spaces", LongType, nullable = false),
    StructField("n_punct", LongType, nullable = false),
    StructField("n_other", LongType, nullable = false)))
}
