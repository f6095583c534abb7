package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.streaming.StreamJoin.{Purchase, Signal}

/** Stream-stream interval join: window semantics match the batch range
  * join, and signals beyond the watermark horizon stop matching. */
class StreamJoinSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("pairs match the batch interval join across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val ps = MemoryStream[Purchase]
    val ss = MemoryStream[Signal]
    val query = StreamJoin
      .attribution(ps.toDS(), ss.toDS(), "10 minutes", "1 hour")
      .writeStream.format("memory").queryName("attr_out")
      .outputMode(OutputMode.Append())
      .start()
    try {
      // signals first (buffered as state), purchases in a later batch
      ss.addData(
        Signal(1L, 100L, ts("2024-03-15 10:00:00"), "view"),
        Signal(1L, 101L, ts("2024-03-15 10:30:00"), "click"),
        Signal(2L, 102L, ts("2024-03-15 10:15:00"), "view"))
      query.processAllAvailable()
      ps.addData(
        Purchase(1L, 200L, ts("2024-03-15 10:45:00")), // both in window
        Purchase(2L, 201L, ts("2024-03-15 11:45:00")), // 102 too old (1.5h)
        Purchase(3L, 202L, ts("2024-03-15 10:45:00"))) // no signals
      query.processAllAvailable()

      val pairs = spark.table("attr_out").collect()
        .map(r => r.getAs[Long]("purchase_id") -> r.getAs[Long]("signal_id"))
        .toSet
      assert(pairs == Set(200L -> 100L, 200L -> 101L))
    } finally query.stop()
  }

  test("state is evicted past the horizon: old signals stop matching") {
    implicit val sqlCtx = spark.sqlContext
    val ps = MemoryStream[Purchase]
    val ss = MemoryStream[Signal]
    val query = StreamJoin
      .attribution(ps.toDS(), ss.toDS(), "10 minutes", "1 hour")
      .writeStream.format("memory").queryName("attr_out2")
      .outputMode(OutputMode.Append())
      .start()
    try {
      ss.addData(Signal(1L, 100L, ts("2024-03-15 10:00:00"), "view"))
      ps.addData(Purchase(9L, 290L, ts("2024-03-15 10:00:00")))
      query.processAllAvailable()
      // advance both watermarks far past 10:00 + window + delay
      ss.addData(Signal(8L, 199L, ts("2024-03-15 20:00:00"), "view"))
      ps.addData(Purchase(8L, 299L, ts("2024-03-15 20:00:00")))
      query.processAllAvailable()
      // a purchase inside signal 100's window arrives AFTER eviction:
      // it is late relative to the purchase watermark and cannot match
      ps.addData(Purchase(1L, 300L, ts("2024-03-15 10:30:00")))
      query.processAllAvailable()
      val matched = spark.table("attr_out2").collect()
        .map(_.getAs[Long]("purchase_id")).toSet
      assert(!matched.contains(300L))
    } finally query.stop()
  }
}
