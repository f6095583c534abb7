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
}
