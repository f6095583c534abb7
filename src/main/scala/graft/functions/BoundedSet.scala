package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded exact-set collection: gathers ALL values of a group when
  * the group has ≤ `max` values, or a truncated `max + 1`-sized
  * overflow marker otherwise (callers drop groups with
  * `size > max`).
  *
  * The inverted-index pair-generation primitive: `groupBy(shingle)
  * .agg(boundedSet(doc_id))` + in-group pair explosion replaces the
  * classic index self-join `a.s = b.s AND a.id < b.id` — one shuffle
  * of the index instead of three (window df-count + both join sides),
  * and no join hash table of the whole index. The df-cap that makes
  * the self-join tractable (stop-shingles dropped) is exactly the
  * bound that makes this buffer O(max): partial aggregation stops
  * appending at `max + 1` elements, so a stop-shingle appearing in
  * 10^6 documents ships ≤ max+1 ids per partition instead of 10^6 —
  * the same map-side discipline as [[TopKAgg]].
  *
  * Input values must be distinct within the group (true for a
  * `(doc_id, shingle)`-distinct index); the merged result is sorted
  * ascending, so downstream pair order is deterministic under any
  * partitioning.
  */
class BoundedSetAgg(max: Int)
    extends Aggregator[Long, Seq[Long], Seq[Long]] {

  override def zero: Seq[Long] = Seq.empty

  override def reduce(buf: Seq[Long], a: Long): Seq[Long] =
    if (buf.size > max) buf else buf :+ a

  override def merge(x: Seq[Long], y: Seq[Long]): Seq[Long] = {
    val m = x ++ y
    if (m.size > max) m.take(max + 1) else m
  }

  override def finish(r: Seq[Long]): Seq[Long] = r.sorted

  override def bufferEncoder: Encoder[Seq[Long]] =
    ExpressionEncoder[Seq[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    ExpressionEncoder[Seq[Long]]()
}
