package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.io.ModelStore
import graft.model.{Pipeline, RunMode}
import graft.pipeline.{CdcFixtures, Clock, ReferenceModels}

/** The customers_latest MODEL run over a stream, micro-batch by
  * micro-batch, must converge to the same silver table the batch
  * pipeline produces from the same data split. */
class StreamingPipelineSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val clock = Clock(
    java.sql.Date.valueOf("2024-04-01"),
    java.sql.Timestamp.valueOf("2024-04-01 00:00:00"))
  private val models = new ReferenceModels(clock)

  test("streamed customers_latest equals batch bootstrap+incremental") {
    implicit val sqlCtx = spark.sqlContext

    // batch reference: bootstrap batch1, incremental batch2
    val batchStore = new ModelStore(
      Files.createTempDirectory("graft-sp-batch").toString)
    new Pipeline(Seq(models.customersLatest), batchStore,
      (_, _) => CdcFixtures.customersBatch1()).run(spark, RunMode.Bootstrap)
    new Pipeline(Seq(models.customersLatest), batchStore,
      (_, _) => CdcFixtures.customersBatch2())
      .run(spark, RunMode.Incremental)
    val expected = batchStore.read(spark, "silver", "customers_latest")
      .get.collect().map(_.getValuesMap[Any](Seq("customer_id", "email",
        "city", "first_seen_at", "last_updated_at"))).toSet

    // streaming: same two batches as micro-batches through the model
    val streamStore = new ModelStore(
      Files.createTempDirectory("graft-sp-stream").toString)
    val input = MemoryStream[CdcFixtures.CustCdc]
    val query = input.toDS().toDF().writeStream
      .outputMode(OutputMode.Append())
      .foreachBatch(
        StreamingPipeline.modelSink(streamStore, models.customersLatest,
          sourceName = "customers_cdc") _)
      .start()
    try {
      input.addData(CdcFixtures.customersBatch1()
        .as[CdcFixtures.CustCdc].collect().toIndexedSeq: _*)
      query.processAllAvailable()
      input.addData(CdcFixtures.customersBatch2()
        .as[CdcFixtures.CustCdc].collect().toIndexedSeq: _*)
      query.processAllAvailable()
    } finally query.stop()

    val got = streamStore.read(spark, "silver", "customers_latest")
      .get.collect().map(_.getValuesMap[Any](Seq("customer_id", "email",
        "city", "first_seen_at", "last_updated_at"))).toSet
    assert(got == expected)

    // at-least-once replay: re-delivering batch 1 must be a no-op (the
    // committed batch id is newer), not a duplicate merge
    val versionBefore = streamStore
      .currentVersion(spark, "silver", "customers_latest")
    StreamingPipeline.modelSink(streamStore, models.customersLatest,
      sourceName = "customers_cdc")(CdcFixtures.customersBatch1(), 1L)
    assert(streamStore.currentVersion(spark, "silver", "customers_latest")
      == versionBefore)
  }
}
