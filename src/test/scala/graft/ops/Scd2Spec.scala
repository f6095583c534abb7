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

  test("as-of lookup against SCD2 history == interval-scan lookup") {
    import org.apache.spark.sql.functions._
    // point-in-time question: which version of each user's record was
    // valid at T? Two independent answers must agree:
    //  (a) AsOfJoin against the history's valid_from axis,
    //  (b) the interval scan valid_from <= T < valid_to.
    val hist = Scd2.qScd2Snapshot.build(spark, Dir)
      .select(col("user_id"), col("event_id"), col("valid_from"),
        col("valid_to"))
    val t = java.sql.Timestamp.valueOf("2024-01-15 00:00:00")
    val probes = hist.select(col("user_id")).distinct()
      .withColumn("probe_ts", lit(t))

    val viaAsOf = AsOfJoin.asOf(probes, hist
          .select(col("user_id"), col("valid_from"),
            col("event_id").as("matched_event")),
        key = "user_id", leftTime = "probe_ts", rightTime = "valid_from",
        payload = Seq("matched_event"))
      .collect().map(r => r.getLong(0) ->
        Option(r.get(r.fieldIndex("matched_event"))))
      .toMap
    val viaInterval = hist
      .filter(col("valid_from") <= lit(t) &&
        (col("valid_to").isNull || col("valid_to") > lit(t)))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    // non-vacuity: the probe timestamp must actually be covered by
    // intervals, or every comparison below is skipped and a broken
    // as-of lookup passes on zero comparisons
    assert(viaInterval.nonEmpty,
      "no interval covers the probe ts — agreement check is vacuous")
    viaInterval.foreach { case (u, ev) =>
      assert(viaAsOf(u) == Some(ev), s"user $u")
    }
    // the two differ ONLY on users whose matched interval was closed
    // before T (a DELETE gap): as-of returns the superseded row, the
    // interval scan correctly returns none — assert that every such
    // user's as-of match really was closed at or before T
    val closedBeforeT = viaAsOf.collect {
      case (u, Some(ev)) if !viaInterval.contains(u) => u -> ev
    }
    closedBeforeT.foreach { case (u, ev) =>
      val vt = hist.filter(col("user_id") === u &&
          col("event_id") === ev)
        .collect()(0).getTimestamp(3)
      assert(vt != null && !vt.after(t), s"user $u not actually closed")
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
