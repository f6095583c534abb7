package graft.io

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Co-located bucketed joins: same key, same bucket count on both
  * sides → the join plans with zero shuffle exchanges. */
class BucketingSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val Dir = "/root/testdata/sf0.001"

  test("bucketed equi-join runs with zero exchanges and exact results") {
    val root = Files.createTempDirectory("graft-bucketing").toString
    val orders = Tables.load(spark, Dir, "orders")
    val customer = Tables.load(spark, Dir, "customer")
    Bucketing.writeBucketed(orders.withColumnRenamed("o_custkey", "k"),
      "b_orders", s"$root/orders", "k", 4)
    Bucketing.writeBucketed(customer.withColumnRenamed("c_custkey", "k"),
      "b_customer", s"$root/customer", "k", 4)
    // disable broadcast so the planner must pick a partitioned join —
    // the co-location claim is about avoiding the SHUFFLE, and a
    // broadcast would trivially hide it
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = spark.table("b_orders")
        .join(spark.table("b_customer"), "k")
        .groupBy("k").agg(count(lit(1)).as("n"))
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"expected shuffle-free bucketed join, got:\n$plan")

      // results identical to the plain (shuffling) join
      val expect = orders.join(customer,
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("o_custkey").as("k")).agg(count(lit(1)).as("n"))
      assert(j.exceptAll(expect).isEmpty && expect.exceptAll(j).isEmpty)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_customer")
    }
  }

  test("group-by on the bucket key also skips the exchange") {
    val root = Files.createTempDirectory("graft-bucketing2").toString
    Bucketing.writeBucketed(
      Tables.load(spark, Dir, "orders").withColumnRenamed("o_custkey", "k"),
      "b_orders2", s"$root/orders", "k", 4)
    try {
      val agg = spark.table("b_orders2").groupBy("k")
        .agg(count(lit(1)).as("n"))
      val plan = agg.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"expected shuffle-free bucketed aggregation, got:\n$plan")
    } finally spark.sql("DROP TABLE IF EXISTS b_orders2")
  }
}
