package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class BloomJoinSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val Dir = "/root/testdata/sf0.001"
  import spark.implicits._

  test("bloom sketch has no false negatives") {
    val dim = (1L to 1000L).toDF("k")
    val sketch = BloomJoin.buildSketch(dim, col("k"))
    // every inserted key must probe true
    val misses = dim
      .filter(!BloomJoin.mightContain(sketch, col("k"))).count()
    assert(misses == 0)
    // most non-members probe false (FP rate well under 50%)
    val outside = (100001L to 101000L).toDF("k")
    val fps = outside
      .filter(BloomJoin.mightContain(sketch, col("k"))).count()
    assert(fps < 500, s"false-positive count $fps")
  }

  test("the Bloom probe runs scan-side, before the join exchange") {
    val fact = graft.io.Tables.load(spark, Dir, "orders")
    val dim = graft.io.Tables.load(spark, Dir, "customer")
      .filter(col("c_mktsegment") === BloomJoin.Segment)
    val plan = BloomJoin
      .semiJoin(fact, col("o_custkey"), dim, col("c_custkey"))
      .queryExecution.executedPlan.toString
    // the membership filter must appear as a plain Filter expression
    // (codegen-local), not as a join operator
    assert(plan.contains("might_contain"))
  }

  test("semiJoin equals the exact semi-join (verify removes FPs)") {
    val fact = graft.io.Tables.load(spark, Dir, "orders")
    val dim = graft.io.Tables.load(spark, Dir, "customer")
      .filter(col("c_mktsegment") === BloomJoin.Segment)
    val viaBloom = BloomJoin
      .semiJoin(fact, col("o_custkey"), dim, col("c_custkey"))
      .select("o_orderkey").orderBy("o_orderkey")
      .collect().map(_.getLong(0)).toSeq
    val exact = fact.join(dim,
        fact("o_custkey") === dim("c_custkey"), "left_semi")
      .select("o_orderkey").orderBy("o_orderkey")
      .collect().map(_.getLong(0)).toSeq
    assert(viaBloom == exact && exact.nonEmpty)
  }
}
