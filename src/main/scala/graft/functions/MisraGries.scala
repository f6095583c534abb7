package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries heavy-hitters sketch as a typed `Aggregator`: at most
  * `k` counters per group, mergeable, with the classic guarantee that
  * every item of true frequency > n/(k+1) SURVIVES in the summary
  * (whatever the partitioning/merge order), undercounted by at most
  * n/(k+1).
  *
  * This is the frequent-items complement of the exact vocab build
  * (Curation.vocabulary): the exact form shuffles every distinct
  * token; the sketch's map-side state is k counters regardless of
  * cardinality — the right first pass at 100 TB, followed by an exact
  * recount of the ≤ k·partitions candidates. Counts in the summary are
  * NOT exact (merge-order dependent), so consumers must either use
  * the candidates-then-recount pattern (q60) or accept the bound.
  */
class MisraGries(k: Int)
    extends Aggregator[String, Map[String, Long], Map[String, Long]] {

  override def zero: Map[String, Long] = Map.empty

  override def reduce(buf: Map[String, Long], item: String)
      : Map[String, Long] =
    buf.get(item) match {
      case Some(c) => buf.updated(item, c + 1)
      case None if buf.size < k => buf.updated(item, 1L)
      case None => // decrement-all, drop exhausted counters
        buf.flatMap { case (t, c) =>
          if (c > 1) Some(t -> (c - 1)) else None
        }
    }

  /** Mergeable form: sum counts; if over k entries, subtract the
    * (k+1)-th largest count from all (the merge analog of
    * decrement-all) and drop non-positive counters. */
  override def merge(a: Map[String, Long], b: Map[String, Long])
      : Map[String, Long] = {
    val summed = b.foldLeft(a) { case (m, (t, c)) =>
      m.updated(t, m.getOrElse(t, 0L) + c)
    }
    if (summed.size <= k) summed
    else {
      val cut = summed.values.toSeq.sorted(Ordering[Long].reverse)(k)
      summed.flatMap { case (t, c) =>
        if (c > cut) Some(t -> (c - cut)) else None
      }
    }
  }

  override def finish(r: Map[String, Long]): Map[String, Long] = r

  override def bufferEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
  override def outputEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
}
