package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k as a typed `Aggregator` (SURVEY.md §7.2 M6's custom
  * aggregate tier).
  *
  * Why not `row_number().over(Window.partitionBy(q))`? The window form
  * shuffles EVERY candidate row to sort entire partitions; this
  * aggregator keeps a k-bounded buffer that Spark partially aggregates
  * map-side (ObjectHashAggregate), so only ≤ k rows per group per
  * partition cross the wire — at a 10^9-candidate scale that's the
  * difference between shuffling the corpus and shuffling k·|groups|.
  *
  * Deterministic: ordered by (score DESC, id ASC), so ties cannot
  * reorder across partitionings.
  */
final case class ScoredId(score: Double, id: Long)

class TopKAgg(k: Int)
    extends Aggregator[ScoredId, Seq[ScoredId], Seq[ScoredId]] {

  private def ord(s: ScoredId): (Double, Long) = (-s.score, s.id)
  private val tupleOrd = Ordering.Tuple2[Double, Long]

  override def zero: Seq[ScoredId] = Seq.empty

  override def reduce(buf: Seq[ScoredId], a: ScoredId): Seq[ScoredId] =
    if (buf.size >= k && tupleOrd.gteq(ord(a), ord(buf.last))) buf
    else ((buf :+ a).sortBy(ord)).take(k)

  override def merge(x: Seq[ScoredId], y: Seq[ScoredId]): Seq[ScoredId] =
    (x ++ y).sortBy(ord).take(k)

  override def finish(r: Seq[ScoredId]): Seq[ScoredId] = r

  override def bufferEncoder: Encoder[Seq[ScoredId]] =
    ExpressionEncoder[Seq[ScoredId]]()
  override def outputEncoder: Encoder[Seq[ScoredId]] =
    ExpressionEncoder[Seq[ScoredId]]()
}
