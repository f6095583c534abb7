package graft.model

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.io.ModelStore
import graft.ops.Exact

class IncrementalAggSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val Dir = "/root/testdata/sf0.001"

  private def spec = IncrementalAgg.Spec(
    Seq("o_custkey"), Exact.cents(col("o_totalprice")))

  test("batch-by-batch folding equals the full recompute") {
    val store = new ModelStore(
      Files.createTempDirectory("graft-incagg").toString)
    val orders = graft.io.Tables.load(spark, Dir, "orders")
      .withColumn("yr", year(col("o_orderdate")))

    // append-only arrival: one batch per year bucket
    val years = orders.select("yr").distinct()
      .collect().map(_.getInt(0)).sorted
    assert(years.length >= 3, "need several batches for the test")
    var state: org.apache.spark.sql.DataFrame = null
    years.foreach { y =>
      state = IncrementalAgg.applyBatch(spark, store, "agg",
        "cust_totals", orders.filter(col("yr") === y), spec)
    }

    val got = IncrementalAgg
      .present(store.read(spark, "agg", "cust_totals").get, spec)
    val expect = IncrementalAgg.present(
      IncrementalAgg.fold(None, orders, spec), spec)
    assert(got.exceptAll(expect).isEmpty && expect.exceptAll(got).isEmpty)
    // and the fold path agrees with a plain one-shot aggregation
    val direct = orders.groupBy("o_custkey")
      .agg(count(lit(1)).as("cnt"),
        Exact.dec2(sum(Exact.cents(col("o_totalprice")))).as("total"))
      .select("o_custkey", "cnt", "total")
    assert(got.select("o_custkey", "cnt", "total")
      .exceptAll(direct).isEmpty)
  }

  test("each fold reads state + batch only, never history") {
    // structural check: fold's plan contains exactly the two inputs —
    // the state table scan and the batch scan — no union of past batches
    val orders = graft.io.Tables.load(spark, Dir, "orders")
    val s1 = IncrementalAgg.fold(None, orders.limit(100), spec)
    val folded = IncrementalAgg.fold(Some(s1), orders.limit(50), spec)
    val scans = folded.queryExecution.optimizedPlan.collectLeaves()
    assert(scans.length == 2)
  }
}
