package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Plan-shape and semantics checks for the OLAP family. */
class OlapSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val Dir = "/root/testdata/sf0.001"

  test("rollup computes all grouping sets in one aggregation (Expand)") {
    val df = OlapQueries.qRollup.build(spark, Dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("Expand"))
    // detail + per-region subtotal + grand total present
    val gids = df.collect().map(_.getInt(2)).toSet
    assert(gids == Set(0, 1, 3))
    // grand total equals the sum of detail rows (money renders as a
    // fixed 2-decimal string at the output contract)
    val rows = df.collect()
    val detail = rows.filter(_.getInt(2) == 0)
      .map(_.getString(4).toDouble).sum
    val grand = rows.find(_.getInt(2) == 3).get.getString(4).toDouble
    assert(math.abs(detail - grand) < 0.005)
  }

  test("trailing7 window equals a hand-rolled sliding sum") {
    val rows = OlapQueries.qMovingWindow.build(spark, Dir).collect()
    val byRegion = rows.groupBy(_.getString(0))
    byRegion.values.foreach { rs =>
      val seq = rs.sortBy(_.getDate(1).getTime)
      seq.zipWithIndex.foreach { case (r, i) =>
        val expect = seq.slice(math.max(0, i - 6), i + 1)
          .map(_.getString(2).toDouble).sum
        assert(math.abs(r.getString(3).toDouble - expect) < 0.005)
      }
    }
  }

  test("date spine has no calendar holes and flags real gaps") {
    val rows = OlapQueries.qDateSpine.build(spark, Dir).collect()
    rows.groupBy(_.getString(0)).values.foreach { rs =>
      val days = rs.map(_.getDate(1).toLocalDate).sortBy(_.toEpochDay)
      days.sliding(2).foreach { pair =>
        if (pair.length == 2)
          assert(pair(1).toEpochDay - pair(0).toEpochDay == 1L,
            s"hole between ${pair(0)} and ${pair(1)}")
      }
    }
    // gap rows carry exactly zero revenue
    rows.filter(_.getBoolean(3))
      .foreach(r => assert(r.getString(2).toDouble == 0.0))
    assert(rows.exists(_.getBoolean(3)) && rows.exists(!_.getBoolean(3)))
  }

  test("set ops partition the key space") {
    val rows = OlapQueries.qSetOps.build(spark, Dir).collect()
      .map(r => r.getString(0) -> r.getInt(1))
    val both = rows.filter(_._1 == "both").map(_._2).toSet
    val co = rows.filter(_._1 == "customer_only").map(_._2).toSet
    val so = rows.filter(_._1 == "supplier_only").map(_._2).toSet
    assert((both & co).isEmpty && (both & so).isEmpty && (co & so).isEmpty)
  }

  test("window navigation agrees with a hand-rolled per-key walk") {
    val rows = OlapQueries.qWindowNav.build(spark, Dir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).values.foreach { rs =>
      val seq = rs.sortBy(r => (r.getDate(2).getTime, r.getLong(1)))
      seq.zipWithIndex.foreach { case (r, i) =>
        assert(r.getInt(3) == i + 1) // ord_idx
        if (i == 0) assert(r.isNullAt(4))
        else {
          val days = (r.getDate(2).toLocalDate.toEpochDay -
            seq(i - 1).getDate(2).toLocalDate.toEpochDay).toInt
          assert(r.getInt(4) == days)
        }
        assert(r.getDate(5) == seq.head.getDate(2)) // first_order_day
        // full-frame navigations are constant across the key
        assert(r.getString(6) == seq.head.getString(6)) // latest_total
      }
      // second_total: NULL iff the customer has a single order
      if (seq.length == 1) assert(seq.head.isNullAt(7))
      else assert(!seq.head.isNullAt(7))
    }
  }

  test("grouping sets computes exactly the requested sets in one " +
      "Expand aggregation — no detail level") {
    val df = OlapQueries.qGroupingSets.build(spark, Dir)
    assert(df.queryExecution.executedPlan.toString.contains("Expand"))
    val rows = df.collect()
    val gids = rows.map(_.getInt(2)).toSet
    assert(gids == Set(1, 2, 3)) // (region), (nation), () — never (r,n)
    // per-region and per-nation slices both sum to the grand total
    val grand = rows.filter(_.getInt(2) == 3).map(_.getLong(3)).sum
    assert(rows.filter(_.getInt(2) == 1).map(_.getLong(3)).sum == grand)
    assert(rows.filter(_.getInt(2) == 2).map(_.getLong(3)).sum == grand)
  }

  test("listagg output is sorted, distinct, and domain-bounded") {
    val rows = OlapQueries.qStringAgg.build(spark, Dir).collect()
    assert(rows.length > 0)
    rows.foreach { r =>
      val segs = r.getString(2).split('|').toSeq
      assert(segs == segs.sorted && segs.distinct == segs)
      assert(segs.length <= 5) // bounded value domain contract
    }
  }

  test("semi join and anti join partition the customer table") {
    val semi = OlapQueries.qSemiJoin.build(spark, Dir).collect()
      .map(_.getLong(0)).toSet
    val anti = OlapQueries.qAntiJoin.build(spark, Dir).collect()
      .map(_.getLong(0)).toSet
    assert((semi & anti).isEmpty)
    val all = graft.io.Tables.load(spark, Dir, "customer")
      .select("c_custkey").collect().map(_.getLong(0)).toSet
    assert((semi | anti) == all)
    // semi emits each qualifying customer exactly once
    assert(semi.size == OlapQueries.qSemiJoin.build(spark, Dir).count())
  }
}
