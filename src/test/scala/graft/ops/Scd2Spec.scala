package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class Scd2Spec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val Dir = "/root/testdata/sf0.001"

  test("intervals chain per key: contiguous, one current, delete closes") {
    val rows = Scd2.qScd2Snapshot.build(spark, Dir)
      .collect().groupBy(_.getLong(0))
    assert(rows.nonEmpty)
    rows.foreach { case (_, hist) =>
      val sorted = hist.sortBy(r => (r.getTimestamp(3).getTime,
        r.getLong(1)))
      // only the last interval may be open, and intervals never
      // overlap (a DELETE may leave a gap — that is correct SCD2)
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getTimestamp(4) != null)
          assert(a.getTimestamp(4).compareTo(b.getTimestamp(3)) <= 0)
        case _ =>
      }
      // at most one open (current) interval per key; a key whose final
      // change was a DELETE has zero
      assert(sorted.count(_.isNullAt(4)) <= 1)
      assert(sorted.count(r => r.getBoolean(5)) ==
        sorted.count(_.isNullAt(4)))
    }
  }

  test("SCD1 latest == the current rows of the SCD2 history") {
    val cdc = graft.io.Tables.load(spark, Dir, "events")
      .withColumn("cdc_op",
        when(col("event_type") === "signup", "INSERT")
          .when(col("event_type") === "error", "DELETE")
          .otherwise("UPDATE"))
    val scd1 = CdcDedup.latestByKey(cdc, Seq("user_id"),
        Seq(col("ts").desc, col("event_id").desc))
      .filter(col("cdc_op") =!= "DELETE")
      .select("user_id", "event_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val current = Scd2.qScd2Snapshot.build(spark, Dir)
      .filter(col("is_current"))
      .select("user_id", "event_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(scd1 == current)
  }
}
