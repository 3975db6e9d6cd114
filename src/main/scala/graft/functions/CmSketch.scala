package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Count-Min sketches (Cormode & Muthukrishnan 2005) as Catalyst
  * aggregates — the FOURTH member of the persisted-profile sketch family,
  * next to HLL cardinality (Spark-native aggs), KLL quantiles
  * ([[KllSketchAgg]]) and Misra–Gries heavy hitters ([[FreqSketchAgg]]):
  * bounded-memory POINT-FREQUENCY estimates per group, mergeable by
  * counter addition. Spark ships `count_min_sketch` but its buckets come
  * from non-portable JVM hashing; this family hashes with the engine's
  * portable [[PortableHash.mix64]] over `item || ":cm:" || row`, the SAME
  * bucket function as the batch [[graft.operators.Sketch.countMinEstimates]]
  * — every counter is a deterministic integer the DuckDB oracle replays
  * exactly, so the gate measures the estimate's error rather than
  * assuming it.
  *
  * [[CmSketchAgg]] folds raw string items into a per-group counter table;
  * [[CmUnionAgg]] merges serialized sketches elementwise (the
  * incremental-profile path — `operators.CountMin`); [[CmQuery]] probes a
  * sketch for one item's estimate (min over rows — `estimate ≥ exact`
  * always, `≤ exact + ε·N` w.h.p. at width ≈ e/ε). Same
  * `TypedImperativeAggregate` shape as the siblings: the buffer is the
  * live `long[depth · width]` counter array, serialized only at shuffle
  * boundaries, so the exchange carries one bounded (≈ 8·depth·width B)
  * blob per group, never the token stream. Counter addition is
  * associative/commutative but NOT idempotent (a replayed batch
  * double-counts) — `operators.CountMin` carries the same atomically
  * committed last-batch-id replay guard as the KLL and Misra–Gries
  * profiles.
  */
object CmSketchArgs {
  /** Sane bounds: ≥1 each, ≤ 2^22 counters (32 MiB buffer) — a profile
    * sketch is a bounded summary, not a spill surface. */
  def check(name: String, depth: Int, width: Int): TypeCheckResult =
    if (depth >= 1 && width >= 1 && depth.toLong * width <= (1L << 22))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$name requires 1 <= depth, 1 <= width, depth*width <= 2^22; got $depth x $width")

  /** Bucket of `item` in counter row `r` — the portable replayable hash
    * shared with the batch sketch and the SQL oracle. */
  def bucket(item: String, r: Int, width: Int): Int =
    java.lang.Math.floorMod(
      PortableHash.mix64(UTF8String.fromString(item + ":cm:" + r)),
      width.toLong).toInt

  /** Wire layout: int depth, int width, then depth·width big-endian
    * longs (row-major). */
  def serialize(depth: Int, width: Int, counters: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + 8 * counters.length)
    bb.putInt(depth).putInt(width)
    counters.foreach(bb.putLong)
    bb.array()
  }

  /** Decode; returns (depth, width, counters). */
  def deserialize(bytes: Array[Byte]): (Int, Int, Array[Long]) = {
    val bb = ByteBuffer.wrap(bytes)
    val depth = bb.getInt(); val width = bb.getInt()
    require(bytes.length == 8 + 8L * depth * width,
      s"corrupt cm sketch: $depth x $width in ${bytes.length} bytes")
    val c = Array.ofDim[Long](depth * width)
    var i = 0
    while (i < c.length) { c(i) = bb.getLong(); i += 1 }
    (depth, width, c)
  }
}

/** Fold raw string items (1 count per row) into a `depth × width`
  * Count-Min counter table, serialized binary. */
case class CmSketchAgg(
    child: Expression,
    depth: Int,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]]
    with org.apache.spark.sql.catalyst.trees.UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => CmSketchArgs.check(prettyName, depth, width)
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.catalogString}")
  }
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "cm_sketch_agg"

  override def createAggregationBuffer(): Array[Long] =
    Array.ofDim[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val item = v.asInstanceOf[UTF8String].toString
      var r = 0
      while (r < depth) {
        buf(r * width + CmSketchArgs.bucket(item, r, width)) += 1L
        r += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any =
    CmSketchArgs.serialize(depth, width, buf)

  override def serialize(buf: Array[Long]): Array[Byte] =
    CmSketchArgs.serialize(depth, width, buf)
  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val (d, w, c) = CmSketchArgs.deserialize(bytes)
    require(d == depth && w == width,
      s"cm sketch shape mismatch: agg is $depth x $width, blob is $d x $w")
    c
  }

  override def withNewMutableAggBufferOffset(offset: Int): CmSketchAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): CmSketchAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(c: Expression): CmSketchAgg =
    copy(child = c)
}

/** Merge serialized Count-Min sketches (binary column) elementwise. All
  * inputs must share the aggregate's `depth × width` shape — a silent
  * mixed-shape merge would corrupt every estimate, so it throws. */
case class CmUnionAgg(
    child: Expression,
    depth: Int,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]]
    with org.apache.spark.sql.catalyst.trees.UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => CmSketchArgs.check(prettyName, depth, width)
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary sketch, got ${other.catalogString}")
  }
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "cm_union_agg"

  override def createAggregationBuffer(): Array[Long] =
    Array.ofDim[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) merge(buf, deserialize(v.asInstanceOf[Array[Byte]]))
    else buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any =
    CmSketchArgs.serialize(depth, width, buf)

  override def serialize(buf: Array[Long]): Array[Byte] =
    CmSketchArgs.serialize(depth, width, buf)
  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val (d, w, c) = CmSketchArgs.deserialize(bytes)
    require(d == depth && w == width,
      s"cm sketch shape mismatch: agg is $depth x $width, blob is $d x $w")
    c
  }

  override def withNewMutableAggBufferOffset(offset: Int): CmUnionAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): CmUnionAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(c: Expression): CmUnionAgg =
    copy(child = c)
}

/** `cm_query(sketch, item)` — the item's Count-Min estimate: min over
  * counter rows of the item's bucket. Null sketch (a profile metadata
  * row) or null item ⇒ null. */
case class CmQuery(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (binary, string), got (${l.catalogString}, ${r.catalogString})")
    }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "cm_query"

  def compute(bytes: Array[Byte], item: UTF8String): Long = {
    val (depth, width, c) = CmSketchArgs.deserialize(bytes)
    val s = item.toString
    var best = Long.MaxValue
    var r = 0
    while (r < depth) {
      val v = c(r * width + CmSketchArgs.bucket(s, r, width))
      if (v < best) best = v
      r += 1
    }
    best
  }

  override def nullSafeEval(sk: Any, item: Any): Any =
    compute(sk.asInstanceOf[Array[Byte]], item.asInstanceOf[UTF8String])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val ref = ctx.addReferenceObj("cmQuery", this, classOf[CmQuery].getName)
    nullSafeCodeGen(ctx, ev, (sk, it) => s"""
      ${ev.value} = $ref.compute($sk, $it);
    """)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmQuery =
    copy(left = newLeft, right = newRight)
}
