package graft.analytics

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class TemporalSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("binned candidates equal the brute-force theta join") {
    val rnd = new scala.util.Random(11)
    val left = Seq.tabulate(300)(i =>
      (rnd.nextInt(10).toLong, ts(rnd.nextInt(5000).toLong), i.toLong))
      .toDF("k", "lt", "lid")
    val right = Seq.tabulate(300)(i =>
      (rnd.nextInt(10).toLong, ts(rnd.nextInt(5000).toLong), i.toLong))
      .toDF("k", "rt", "rid")
    val w = 600L * 1000000 // 10-minute window in micros

    val got = Temporal.rangeJoinCandidates(left, right, "k", "lt", "rt", w)
      .select("lid", "rid")
    val expect = left.join(right.withColumnRenamed("k", "k2"),
        col("k") === col("k2") &&
        unix_micros(col("rt")) >= unix_micros(col("lt")) - w &&
        unix_micros(col("rt")) < unix_micros(col("lt")))
      .select("lid", "rid")
    assert(got.exceptAll(expect).isEmpty && expect.exceptAll(got).isEmpty)
    assert(expect.count() > 0) // non-vacuous
  }

  test("window boundaries: inclusive start, exclusive end, bin edges") {
    val w = 100L * 1000000
    val left = Seq((1L, ts(1000), 0L)).toDF("k", "lt", "lid")
    val right = Seq(
      (1L, ts(900), 1L), // exactly lt - window: included
      (1L, ts(899), 2L), // just outside: excluded
      (1L, ts(1000), 3L), // exactly lt: excluded
      (1L, ts(999), 4L), // inside, same bin
      (1L, ts(901), 5L)) // inside, previous bin
      .toDF("k", "rt", "rid")
    val got = Temporal.rangeJoinCandidates(left, right, "k", "lt", "rt", w)
      .select("rid").collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 4L, 5L))
  }

  test("candidate plan is an equi-join, not a nested-loop theta join") {
    val left = Seq((1L, ts(0), 0L)).toDF("k", "lt", "lid")
    val right = Seq((1L, ts(0), 0L)).toDF("k", "rt", "rid")
    val plan = Temporal
      .rangeJoinCandidates(left, right, "k", "lt", "rt", 1000000L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"))
    assert(!plan.contains("CartesianProduct"))
  }

  test("pit resolve: containment boundaries, delete gaps, same-instant " +
      "ties, keys with no history") {
    // user 1: INSERT@10 (v100) → UPDATE@20 (v101) → DELETE@30 →
    //         INSERT@40 (v103, still current)
    // user 2: two UPDATEs at the SAME instant (v201, v202) — v201's
    //         interval is zero-length, only v202 is ever resolvable
    val changes = Seq(
      (1L, 100L, "INSERT", 10L), (1L, 101L, "UPDATE", 20L),
      (1L, 102L, "DELETE", 30L), (1L, 103L, "INSERT", 40L),
      (2L, 201L, "UPDATE", 10L), (2L, 202L, "UPDATE", 10L))
      .map { case (u, id, op, t) => (u, id, op, ts(t)) }
      .toDF("user_id", "version_id", "cdc_op", "cts")
    val versions = graft.ops.Scd2
      .snapshot(changes, "user_id", col("cts"),
        Seq(col("cts"), col("version_id")))
      .filter(col("cdc_op") =!= "DELETE")
      .select(col("user_id"), col("version_id"),
        col("valid_from").as("v_from"), col("valid_to").as("v_to"))
    val facts = Seq(
      (1L, 1L, 5L),   // before first version → no match
      (1L, 2L, 10L),  // at version start: inclusive → v100
      (1L, 3L, 25L),  // inside second interval → v101
      (1L, 4L, 30L),  // at the DELETE instant: exclusive end → none
      (1L, 5L, 35L),  // inside the deleted gap → none
      (1L, 6L, 40L),  // re-insert boundary → v103
      (1L, 7L, 99L),  // open current interval → v103
      (2L, 8L, 10L),  // same-instant tie: max version id wins → v202
      (2L, 9L, 50L),  // still v202 (open)
      (3L, 10L, 50L)) // key with no history → no match
      .map { case (u, f, t) => (u, f, ts(t)) }
      .toDF("user_id", "fact_id", "fts")
    val got = Temporal
      .pitResolve(facts, versions, key = "user_id", factTime = "fts",
        tieBreak = Seq(col("version_id").desc),
        payload = Seq("version_id"))
      .collect()
      .map(r => r.getLong(1) ->
        (if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    assert(got == Map(
      1L -> None, 2L -> Some(100L), 3L -> Some(101L), 4L -> None,
      5L -> None, 6L -> Some(103L), 7L -> Some(103L), 8L -> Some(202L),
      9L -> Some(202L), 10L -> None))
    // a resolved fact also reports the matched interval start
    val vf = Temporal
      .pitResolve(facts, versions, "user_id", "fts",
        Seq(col("version_id").desc), Seq("version_id"))
      .filter(col("fact_id") === 3L).collect().head
    assert(vf.getTimestamp(4) == ts(20L))
  }
}
