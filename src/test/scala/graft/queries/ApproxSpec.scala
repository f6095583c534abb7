package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The explicit-register HLL estimate must track the exact count
  * within its design standard error (~1.04/√m ≈ 2.3% at m = 2^11,
  * asserted with slack). */
class ApproxSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("approx_count_distinct within 5% of exact on testdata") {
    val rows = RefQueries.q33ApproxDistinct
      .build(spark, "/root/testdata/sf0.01").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val approx = r.getAs[Long]("approx_users").toDouble
      val exact = r.getAs[Long]("exact_users").toDouble
      assert(math.abs(approx - exact) / exact <= 0.05,
        s"${r.getAs[String]("event_type")}: approx=$approx exact=$exact")
    }
  }
}
