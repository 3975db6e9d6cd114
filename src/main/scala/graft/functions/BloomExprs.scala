package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/** `bloom_might_contain(bloom, hash64)` — probe a 64-bit hash against a
  * serialized `org.apache.spark.util.sketch.BloomFilter` (the sketch
  * Spark's own runtime join pruning uses, inserted via `putLong` — the
  * build side here is `DataFrameStatFunctions.bloomFilter` over a long
  * column, so build and probe hash identically).
  *
  * The filter argument must be a FOLDABLE binary (a literal carrying the
  * serialized filter): it is deserialized ONCE per expression instance on
  * the driver and shipped to executors as a codegen reference object, so
  * the per-row work is just the Bloom probe — no per-row deserialization,
  * no UDF. Codegen mirrors Spark's internal `BloomFilterMightContain`
  * (which is not constructible from the public API).
  *
  * No false negatives ever; false-positive rate is the build-time `fpp`.
  * The scale role (see `operators.Decontaminate.flagBloom`): a membership
  * prefilter whose broadcast cost is ~10 bits per element where the exact
  * 64-bit hash set costs 64 — the map-side guard in front of an exact
  * verify join when the reference set outgrows the broadcast budget.
  */
case class BloomMightContain(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, LongType) =>
        if (left.foldable) TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure(
          s"$prettyName: the bloom filter must be a foldable binary literal")
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (binary, bigint), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  @transient private lazy val bloom: BloomFilter = {
    val bytes = left.eval().asInstanceOf[Array[Byte]]
    if (bytes == null) null
    else BloomFilter.readFrom(new ByteArrayInputStream(bytes))
  }

  override def eval(input: InternalRow): Any = {
    if (bloom == null) null
    else {
      val v = right.eval(input)
      if (v == null) null else bloom.mightContainLong(v.asInstanceOf[Long])
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    if (bloom == null) {
      ev.copy(code = code"""
        boolean ${ev.isNull} = true;
        boolean ${ev.value} = false;""")
    } else {
      val bloomRef = ctx.addReferenceObj("bloomFilter", bloom,
        classOf[BloomFilter].getName)
      val valueGen = right.genCode(ctx)
      ev.copy(code = code"""
        ${valueGen.code}
        boolean ${ev.isNull} = ${valueGen.isNull};
        boolean ${ev.value} = ${CodeGenerator.defaultValue(dataType)};
        if (!${ev.isNull}) {
          ${ev.value} = $bloomRef.mightContainLong(${valueGen.value});
        }""")
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContain =
    copy(left = newLeft, right = newRight)
}
