package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Stream-stream interval join — the streaming form of the batch
  * binned range join (`Temporal.rangeJoinCandidates` / q59): attribute
  * each purchase to the same user's signals in the trailing window,
  * over two UNBOUNDED feeds.
  *
  * Spark's stream-stream join requires exactly the shape the batch op
  * has: an equality key plus an event-time range constraint, with
  * watermarks on both sides. The range constraint is what BOUNDS the
  * join state: a buffered signal can only match purchases with
  * `pts ∈ (ets, ets + window]`, so once the purchase watermark passes
  * `ets + window` the signal is evicted — state is arrival-rate ×
  * (window + watermark delay), independent of stream lifetime. That
  * eviction bound is the whole 100 TB/day story: without the time
  * constraint the join would buffer both streams forever.
  */
object StreamJoin {

  final case class Purchase(user_id: Long, purchase_id: Long,
      pts: Timestamp)
  final case class Signal(user_id: Long, signal_id: Long, ets: Timestamp,
      kind: String)

  /** Matched (purchase, signal) pairs where the signal precedes the
    * purchase by less than `windowExpr` (e.g. "24 hours"). Inner join:
    * purchases with no signals produce nothing here — the batch q59
    * keeps them via its left join; streaming consumers typically fold
    * these pairs into per-purchase counts downstream. */
  def attribution(purchases: Dataset[Purchase], signals: Dataset[Signal],
      watermarkDelay: String, windowExpr: String): DataFrame = {
    val p = purchases.toDF().withWatermark("pts", watermarkDelay)
    val s = signals.toDF()
      .withColumnRenamed("user_id", "s_user_id")
      .withWatermark("ets", watermarkDelay)
    p.join(s,
      col("user_id") === col("s_user_id") &&
        col("ets") >= col("pts") - expr(s"interval $windowExpr") &&
        col("ets") < col("pts"))
      .select("purchase_id", "user_id", "pts", "signal_id", "ets", "kind")
  }
}
