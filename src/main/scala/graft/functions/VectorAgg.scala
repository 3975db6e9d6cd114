package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Element-wise vector-sum aggregator over long arrays — the kernel of
  * chunk→document embedding pooling (mean pooling = this sum divided by
  * the group count downstream).
  *
  * Why an Aggregator instead of posexplode → groupBy(group, position):
  * the explode shape shuffles rows×dim scalar rows (a 128× exchange
  * blow-up at 100 TB); this aggregator is partially aggregable, so the
  * map side combines all local vectors per group and the exchange carries
  * exactly one dim-width array per (group × partition) — groups×dim, not
  * rows×dim.
  *
  * Totality: vectors of unequal length are summed up to the longer
  * length, missing elements read as 0 (deterministic, order-independent —
  * addition is commutative in Long, and overflow wraps identically in any
  * order). Callers wanting a hard dim contract validate upstream
  * (Pipeline.Config.enforceVectorDim).
  */
class VectorSumLong
    extends Aggregator[Seq[Long], Array[Long], Seq[Long]] {

  // stable plan rendering — see TopKByScore.toString
  override def toString: String = "VectorSumLong"

  private def add(a: Array[Long], b: Seq[Long]): Array[Long] = {
    if (b == null) return a
    val out = if (a.length >= b.length) a else java.util.Arrays.copyOf(a, b.length)
    var i = 0
    while (i < b.length) { out(i) += b(i); i += 1 }
    out
  }

  override def zero: Array[Long] = Array.emptyLongArray

  override def reduce(buf: Array[Long], in: Seq[Long]): Array[Long] = add(buf, in)

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] =
    add(b1, scala.collection.immutable.ArraySeq.unsafeWrapArray(b2))

  override def finish(b: Array[Long]): Seq[Long] =
    scala.collection.immutable.ArraySeq.unsafeWrapArray(b)

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}
