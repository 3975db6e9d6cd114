package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** (id, score) pair flowing into the top-k aggregate. */
case class ScoredId(id: Long, score: Double)

object TopKByScore {
  /** Bounded aggregation buffer: compacted back to k whenever it grows past
    * `4k`, so the map-side partial aggregate never holds more than O(k)
    * entries per group — the property that makes distributed top-k scale
    * (only ~k rows per group per partition cross the shuffle, instead of
    * the whole scored set as with a `row_number` window). */
  case class Buf(items: Seq[ScoredId])
}

/** Typed top-k-by-score aggregator: keeps the k highest-scoring ids,
  * ties broken by ascending id for determinism. Use via
  * `functions.udaf(new TopKByScore(k), Encoders.product[ScoredId])` and
  * `groupBy(queryId).agg(topk(idCol, scoreCol))`.
  */
class TopKByScore(k: Int)
    extends Aggregator[ScoredId, TopKByScore.Buf, Seq[ScoredId]] {
  import TopKByScore.Buf
  require(k > 0, s"k must be positive (got $k)")

  // The default Object.toString prints the JVM identity hash, and
  // Aggregator instances render verbatim inside the canonicalized
  // ObjectHashAggregate plan line — every plan using this UDAF would
  // carry a run-varying token, defeating the bench's plan fingerprints
  // (round 15: 16 ANN-family hashes differed across back-to-back runs on
  // identical code). Identity carries no information here; the knob does.
  override def toString: String = s"TopKByScore($k)"

  private def compact(items: Seq[ScoredId]): Seq[ScoredId] =
    items.sortBy(n => (-n.score, n.id)).take(k)

  override def zero: Buf = Buf(Vector.empty)

  override def reduce(b: Buf, in: ScoredId): Buf = {
    val grown = b.items :+ in
    Buf(if (grown.length >= 4 * k) compact(grown) else grown)
  }

  override def merge(b1: Buf, b2: Buf): Buf = compact(b1.items ++ b2.items) match {
    case c => Buf(c)
  }

  override def finish(b: Buf): Seq[ScoredId] = compact(b.items)

  override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
  override def outputEncoder: Encoder[Seq[ScoredId]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[ScoredId]]()
}
