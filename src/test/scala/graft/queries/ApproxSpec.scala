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

  test("register state is bounded by m per group (the sketch contract)") {
    // the scale property that justifies the explicit-register design:
    // whatever the corpus size, the post-scan state is ≤ m rows per
    // group (register max-merge), so the estimate stage exchanges
    // bounded rows. Also pins the registers' value domain.
    import org.apache.spark.sql.functions._
    val spark2 = spark
    val d = "/root/testdata/sf0.01"
    val h = xxhash64(col("user_id"))
    val wv = h.bitwiseAND(lit((1L << (64 - RefQueries.HllP)) - 1))
    val regs = graft.io.Tables.load(spark2, d, "events")
      .select(col("event_type"),
        shiftrightunsigned(h, 64 - RefQueries.HllP).as("idx"),
        when(wv === 0L, lit(64 - RefQueries.HllP + 1))
          .otherwise(lit(64 - RefQueries.HllP + 1) - length(bin(wv)))
          .as("rho"))
      .groupBy("event_type", "idx").agg(max("rho").as("reg"))
      .collect()
    val perGroup = regs.groupBy(_.getString(0)).view.mapValues(_.length)
    perGroup.foreach { case (g, n) =>
      assert(n <= RefQueries.HllM, s"$g: $n registers > m")
    }
    regs.foreach { r =>
      val idx = r.getLong(1); val reg = r.getInt(2)
      assert(idx >= 0 && idx < RefQueries.HllM, s"idx $idx out of range")
      assert(reg >= 1 && reg <= 64 - RefQueries.HllP + 1,
        s"rho $reg out of range")
    }
  }
}
