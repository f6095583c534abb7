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

  test("applyBatch is a streaming sink: state from a stream equals batch") {
    // applyBatch's (batch, store) shape IS the foreachBatch contract —
    // feed the same rows through a real streaming query and the stored
    // state must equal the one-shot aggregation
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions._
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val store = new graft.io.ModelStore(
      java.nio.file.Files.createTempDirectory("graft-iagg").toString)
    val orders = graft.io.Tables.load(spark, Dir, "orders")
      .select(col("o_custkey"), col("o_totalprice")).limit(300)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))

    val input = MemoryStream[(Long, Double)]
    val query = input.toDS().toDF("o_custkey", "o_totalprice")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        IncrementalAgg.applyBatch(spark, store, "agg", "s", batch, spec)
        ()
      }
      .option("checkpointLocation", java.nio.file.Files
        .createTempDirectory("graft-iagg-ckpt").toString)
      .start()
    try {
      input.addData(orders.take(150).toSeq)
      query.processAllAvailable()
      input.addData(orders.drop(150).toSeq)
      query.processAllAvailable()
    } finally query.stop()

    val streamed = IncrementalAgg
      .present(store.read(spark, "agg", "s").get, spec)
      .orderBy("o_custkey").collect().toSeq
    val oneShot = IncrementalAgg.present(
      IncrementalAgg.fold(None,
        orders.toSeq.toDF("o_custkey", "o_totalprice"), spec), spec)
      .orderBy("o_custkey").collect().toSeq
    assert(streamed == oneShot && streamed.nonEmpty)
  }
}
