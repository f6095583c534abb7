package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class AsOfJoinSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("matches latest at-or-before row per key; no-match keeps null") {
    val left = Seq(
      (1L, ts(10), "a"), (1L, ts(20), "b"), (1L, ts(5), "c"),
      (2L, ts(10), "d"), // key with no right rows at all
      (3L, ts(10), "e")) // key whose right rows are all in the future
      .toDF("k", "t", "tag")
    val right = Seq(
      (1L, ts(8), 100L), (1L, ts(20), 200L), // ts(20): equal-ts match
      (3L, ts(11), 300L))
      .toDF("k", "rt", "v")

    val out = AsOfJoin.asOf(left, right, "k", "t", "rt", Seq("v"))
      .orderBy("k", "t")
      .select("k", "tag", "v").as[(Long, String, Option[Long])].collect()

    assert(out.toSeq == Seq(
      (1L, "c", None), // t=5 before first right row
      (1L, "a", Some(100L)), // t=10 → rt=8
      (1L, "b", Some(200L)), // t=20 → rt=20 (at-or-before includes equal)
      (2L, "d", None),
      (3L, "e", None))) // rt=11 is in the future
  }

  test("agrees with a brute-force join on random data (incl. NULLs)") {
    val rnd = new scala.util.Random(7)
    val left = Seq.tabulate(400)(i =>
      (rnd.nextInt(20).toLong, ts(rnd.nextInt(1000).toLong), i.toLong))
      .toDF("k", "t", "row_id")
    val right = Seq.tabulate(150)(i =>
      (rnd.nextInt(20).toLong,
        // ~1/8 NULL times: must match NOTHING (the SQL `rt <= t`
        // brute force below is NULL-safe false for them)
        if (rnd.nextInt(8) == 0) None
        else Some(ts(rnd.nextInt(1000).toLong)),
        // ~1/4 NULL payload values: the matched row's NULL must
        // survive verbatim, never backfilled from an older row
        if (rnd.nextInt(4) == 0) None else Some(i.toLong)))
      .toDF("k", "rt", "rv")
      // enforce the one-row-per-(key,time) contract
      .groupBy("k", "rt").agg(max("rv").as("rv"))

    val got = AsOfJoin.asOf(left, right, "k", "t", "rt", Seq("rt", "rv"))
      .select("row_id", "rt", "rv")

    // brute force: all at-or-before candidates, keep max rt per left
    // row (struct max is by rt first; rv rides along untouched)
    val expect = left.join(right.withColumnRenamed("k", "rk"),
        col("k") === col("rk") && col("rt") <= col("t"), "left")
      .groupBy("row_id", "k", "t")
      .agg(max(struct(col("rt"), col("rv"))).as("m"))
      .select(col("row_id"), col("m.rt").as("rt"), col("m.rv").as("rv"))

    assert(got.exceptAll(expect).isEmpty && expect.exceptAll(got).isEmpty)
  }

  test("NULL payload field in the matched row stays NULL (no torn rows)") {
    // Right rows: (t=1, v=5, w=x) then (t=2, v=NULL, w=y). A left row
    // at t=3 matches t=2 — its v must be NULL, not backfilled from
    // t=1 (per-column carry would fabricate a (5, y) row that never
    // existed; DuckDB ASOF JOIN returns the t=2 row verbatim).
    val left = Seq((1L, ts(3), "probe")).toDF("k", "t", "tag")
    val right = Seq(
      (1L, ts(1), Some(5L), "x"),
      (1L, ts(2), None: Option[Long], "y"))
      .toDF("k", "rt", "v", "w")
    val out = AsOfJoin.asOf(left, right, "k", "t", "rt", Seq("v", "w"))
      .select("v", "w").as[(Option[Long], String)].collect().toSeq
    assert(out == Seq((None, "y")))
  }

  test("NULL keys never match: NULL-key left rows keep NULL payload " +
      "(SQL equality semantics, as the DuckDB ASOF oracle)") {
    val left = Seq((Option.empty[Long], ts(10), 1L),
        (Option(5L), ts(10), 2L))
      .toDF("k", "t", "row_id")
    val right = Seq((Option.empty[Long], ts(5), 100L),
        (Option(5L), ts(5), 200L))
      .toDF("k", "rt", "rv")
    val got = AsOfJoin.asOf(left, right, "k", "t", "rt", Seq("rv"))
      .collect().map(r => r.getLong(2) ->
        (if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    // the NULL-key left row must NOT receive the NULL-key right row's
    // payload (window partitionBy groups NULLs; equality never matches)
    assert(got == Map(1L -> None, 2L -> Some(200L)))
  }

  test("NULL-time right rows never match (NULLS-FIRST must not " +
      "back-fill no-match left rows)") {
    // SQL ASOF semantics: `lt >= rt` is NULL for a NULL rt, so a
    // NULL-time right row matches nothing. The window form sorts NULLs
    // first — unfiltered, that row's payload would back-fill every
    // left row BEFORE the key's first real match.
    val left = Seq((1L, ts(10), "a"), (1L, ts(30), "b"))
      .toDF("k", "t", "tag")
    val right = Seq(
      (1L, Option.empty[Timestamp], 999L),   // NULL time: must not match
      (1L, Some(ts(20)), 200L))
      .toDF("k", "rt", "v")
    val out = AsOfJoin.asOf(left, right, "k", "t", "rt", Seq("v"))
      .orderBy("t")
      .select("tag", "v").as[(String, Option[Long])].collect()
    assert(out.toSeq == Seq(
      ("a", None),        // before any real right row — NOT 999
      ("b", Some(200L))))
  }

  test("one shuffle on the key: no range-join or cartesian in the plan") {
    val left = Seq((1L, ts(1), "x")).toDF("k", "t", "tag")
    val right = Seq((1L, ts(1), 1L)).toDF("k", "rt", "v")
    val plan = AsOfJoin.asOf(left, right, "k", "t", "rt", Seq("v"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
    assert(!plan.contains("SortMergeJoin")) // union+window, not a join
  }
}
