package graft.functions

import org.apache.datasketches.common.ArrayOfStringsSerDe
import org.apache.datasketches.frequencies.{ErrorType, ItemsSketch}
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Frequent-items (heavy hitters) sketches — Datasketches `ItemsSketch`
  * (Misra–Gries with purge, a.k.a. space-saving) as Catalyst aggregates:
  * the THIRD member of the persisted-profile sketch family, next to HLL
  * cardinality (Spark-native aggs) and KLL quantiles ([[KllSketchAgg]]).
  * Spark ships `approx_count_distinct` and `approx_percentile` but no
  * mergeable heavy-hitters aggregate at all — `count_min_sketch` gives
  * point frequency estimates but cannot enumerate the frequent items.
  *
  * [[FreqSketchAgg]] folds raw string items into a per-group sketch;
  * [[FreqUnionAgg]] merges serialized sketches (the incremental-profile
  * path — `operators.Frequencies`); [[FreqTopItems]] decodes a sketch to
  * its frequent items at a count threshold. Same
  * `TypedImperativeAggregate` shape as the KLL family: the buffer is the
  * live heap sketch, serialized only at shuffle boundaries, so the
  * exchange carries bounded maps (≤ `maxMapSize` entries), never the
  * token stream.
  *
  * Exactness contract (what the oracle leans on): an ItemsSketch only
  * purges when its internal map exceeds its load threshold (0.75 ·
  * `maxMapSize`); while every group's DISTINCT item count stays under
  * that, `getMaximumError() == 0` and all estimates are exact counts —
  * reproducible as plain GROUP BY counts in SQL. Past it, estimates keep
  * the Misra–Gries guarantee (true count ≤ estimate ≤ true count +
  * n/maxMapSize-ish error, no false negatives above the error bound) —
  * the graceful-degradation stance of the whole profile family. Merge is
  * associative/commutative but NOT idempotent (replay double-counts) —
  * `operators.Frequencies` carries the same last-batch-id replay guard
  * as the KLL profile.
  */

/** Shared argument validation for the frequent-items aggregates:
  * Datasketches' ItemsSketch requires `maxMapSize` to be a power of 2 and
  * at least 8 — reported here as an analysis-time TypeCheckFailure instead
  * of a raw executor-side SketchesArgumentException mid-job. */
object FreqSketchArgs {
  val MinMapSize = 8 // org.apache.datasketches.frequencies minimum
  def checkMaxMapSize(name: String, maxMapSize: Int): TypeCheckResult =
    if (maxMapSize >= MinMapSize && Integer.bitCount(maxMapSize) == 1)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$name requires maxMapSize to be a power of 2 >= $MinMapSize, got $maxMapSize")
}

case class FreqSketchAgg(
    child: Expression,
    maxMapSize: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[ItemsSketch[String]]
    with org.apache.spark.sql.catalyst.trees.UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType =>
      FreqSketchArgs.checkMaxMapSize(prettyName, maxMapSize)
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.catalogString}")
  }
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "freq_sketch_agg"

  override def createAggregationBuffer(): ItemsSketch[String] =
    new ItemsSketch[String](maxMapSize)

  override def update(buf: ItemsSketch[String], input: InternalRow): ItemsSketch[String] = {
    val v = child.eval(input)
    if (v != null) buf.update(v.asInstanceOf[UTF8String].toString)
    buf
  }

  override def merge(buf: ItemsSketch[String],
      other: ItemsSketch[String]): ItemsSketch[String] = {
    buf.merge(other); buf
  }

  override def eval(buf: ItemsSketch[String]): Any =
    buf.toByteArray(new ArrayOfStringsSerDe())

  override def serialize(buf: ItemsSketch[String]): Array[Byte] =
    buf.toByteArray(new ArrayOfStringsSerDe())
  override def deserialize(bytes: Array[Byte]): ItemsSketch[String] =
    ItemsSketch.getInstance(Memory.wrap(bytes), new ArrayOfStringsSerDe())

  override def withNewMutableAggBufferOffset(offset: Int): FreqSketchAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): FreqSketchAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(c: Expression): FreqSketchAgg =
    copy(child = c)
}

/** Merge serialized frequent-items sketches (binary column) into one. */
case class FreqUnionAgg(
    child: Expression,
    maxMapSize: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[ItemsSketch[String]]
    with org.apache.spark.sql.catalyst.trees.UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType =>
      FreqSketchArgs.checkMaxMapSize(prettyName, maxMapSize)
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary sketch, got ${other.catalogString}")
  }
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "freq_union_agg"

  override def createAggregationBuffer(): ItemsSketch[String] =
    new ItemsSketch[String](maxMapSize)

  override def update(buf: ItemsSketch[String], input: InternalRow): ItemsSketch[String] = {
    val v = child.eval(input)
    if (v != null)
      buf.merge(ItemsSketch.getInstance(
        Memory.wrap(v.asInstanceOf[Array[Byte]]), new ArrayOfStringsSerDe()))
    buf
  }

  override def merge(buf: ItemsSketch[String],
      other: ItemsSketch[String]): ItemsSketch[String] = {
    buf.merge(other); buf
  }

  override def eval(buf: ItemsSketch[String]): Any =
    buf.toByteArray(new ArrayOfStringsSerDe())

  override def serialize(buf: ItemsSketch[String]): Array[Byte] =
    buf.toByteArray(new ArrayOfStringsSerDe())
  override def deserialize(bytes: Array[Byte]): ItemsSketch[String] =
    ItemsSketch.getInstance(Memory.wrap(bytes), new ArrayOfStringsSerDe())

  override def withNewMutableAggBufferOffset(offset: Int): FreqUnionAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): FreqUnionAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(c: Expression): FreqUnionAgg =
    copy(child = c)
}

/** `freq_top_items(sketch, minCount)` — decode a serialized sketch to
  * `array<struct<item, estimate, lb, ub>>`: the NO_FALSE_NEGATIVES
  * frequent-item set at the given count threshold (every item whose true
  * count could reach `minCount` is present; in the exact regime the set
  * and the estimates are exact), sorted (estimate DESC, item ASC) so the
  * output is deterministic. Empty sketch ⇒ empty array. */
case class FreqTopItems(child: Expression, minCount: Long)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary sketch, got ${other.catalogString}")
  }

  private val itemStruct = StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("estimate", LongType, nullable = false),
    StructField("lb", LongType, nullable = false),
    StructField("ub", LongType, nullable = false)))
  override def dataType: DataType = ArrayType(itemStruct, containsNull = false)
  // a profile read can carry a null-sketch metadata row
  // (operators.Frequencies.MetaKey) — nullable must track the child or
  // codegen would call compute(null)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "freq_top_items"

  def compute(bytes: Array[Byte]): Any = {
    val sk = ItemsSketch.getInstance(Memory.wrap(bytes), new ArrayOfStringsSerDe())
    val rows = sk.getFrequentItems(minCount, ErrorType.NO_FALSE_NEGATIVES)
      .sortBy(r => (-r.getEstimate, r.getItem))
      .map(r => InternalRow(UTF8String.fromString(r.getItem),
        r.getEstimate, r.getLowerBound, r.getUpperBound))
    new GenericArrayData(rows.asInstanceOf[Array[Any]])
  }

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val ref = ctx.addReferenceObj("freqTopItems", this, classOf[FreqTopItems].getName)
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.compute($c);
    """)
  }

  override protected def withNewChildInternal(c: Expression): FreqTopItems =
    copy(child = c)
}
