package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** `int_log2(x)` — `floor(log2(x))` for a positive BIGINT as PURE INTEGER
  * arithmetic (`63 − numberOfLeadingZeros(x)`), deliberately not a libm
  * `log` call: libm's last-bit rounding differs across platforms/engines,
  * while the bit-length formulation is exactly `length(bin(x)) − 1` in any
  * SQL engine — which is what lets quantized-surprisal scoring
  * ([[graft.operators.TextAnalysis.surprisal]]) carry an EXACT DuckDB
  * oracle. Non-positive input yields NULL (log2 undefined), independent of
  * ANSI mode. Codegen'd: stays inside whole-stage codegen, one intrinsic
  * (`Long.numberOfLeadingZeros` compiles to `lzcnt`) per row.
  */
case class IntLog2(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "int_log2"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires bigint, got ${other.catalogString}")
  }

  override def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[Long]
    if (x <= 0L) null else 63L - java.lang.Long.numberOfLeadingZeros(x)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      if ($c <= 0L) {
        ${ev.isNull} = true;
      } else {
        ${ev.value} = 63L - (long) java.lang.Long.numberOfLeadingZeros($c);
      }
    """)

  override protected def withNewChildInternal(c: Expression): IntLog2 =
    copy(child = c)
}
