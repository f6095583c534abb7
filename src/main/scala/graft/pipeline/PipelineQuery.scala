package graft.pipeline

import java.nio.file.Files
import java.sql.{Date, Timestamp}

import org.apache.spark.sql.functions.{col, lit}

import graft.io.ModelStore
import graft.model.{Pipeline, RunMode}
import graft.queries.Q

/** The whole medallion pipeline as one driver-checkable query: bronze
  * CDC feeds synthesized from the testdata (DemoCdc), bootstrap run of
  * customers_latest → orders_cleaned → dim_customer through the real
  * Pipeline/ModelStore/MergeWriter machinery, returning the gold
  * dimension. Deterministic (frozen clock, pure-function CDC
  * synthesis) but not single-SQL-expressible → rows-only driver check;
  * PipelineSpec/ConvergenceSpec carry the semantic assertions.
  *
  * This is also the engine's primary end-to-end benchmark subject: at
  * sf0.1 it cleans 150k CDC order rows, validates them against 15k
  * customers, and rebuilds the dimension — writes included.
  */
object PipelineQuery {

  val clock: Clock = Clock(
    Date.valueOf("2001-09-01"), Timestamp.valueOf("2001-09-01 00:00:00"))

  /** Orders strictly before this date form the bootstrap batch; the
    * rest arrive as the incremental batch (≈⅓ of the data — the
    * watermark gate must prune the bootstrap span from the second
    * run's scan). */
  val IncrementalSplit = "2000-01-01"

  /** Temp store dirs deleted by ONE static hook at JVM exit (the
    * returned DataFrame lazily reads from them, so they can't be
    * deleted earlier; per-invocation hooks would accumulate threads in
    * long-lived JVMs). */
  private val tempDirs =
    new java.util.concurrent.ConcurrentLinkedQueue[java.io.File]()
  locally {
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm))
        f.delete(): Unit
      }
      tempDirs.forEach(rm(_))
    }))
  }
  private[graft] def tempStoreDir(): String = {
    val dir = Files.createTempDirectory("graft-e2e")
    tempDirs.add(dir.toFile)
    dir.toString
  }

  val qPipelineE2e: Q = Q.noOracle("q34_pipeline_e2e") { (s, d) =>
    runPipeline(s, d)
  }.copy(sideEffecting = true)

  private def runPipeline(s: org.apache.spark.sql.SparkSession, d: String)
      : org.apache.spark.sql.DataFrame = {
    val models = new ReferenceModels(clock)
    val store = new ModelStore(tempStoreDir())
    // The synthesized bronze feeds are consumed by BOTH pipeline runs
    // (and by more than one action within a run: watermark scalars,
    // touched-partition discovery, the write itself). Cache them once —
    // the batch-ingestion analog of landing the CDC feed in a staging
    // table instead of re-reading the source per model. The watermark
    // gate still prunes inside the cached relation (in-memory batch
    // stats), and the frames are unpersisted before returning: the
    // result reads from the committed store, not from these plans.
    val custCdc = DemoCdc.customersCdc(s, d).persist()
    val ordCdc = DemoCdc.ordersCdc(s, d).persist()
    try {
      def sources(split: org.apache.spark.sql.DataFrame
          => org.apache.spark.sql.DataFrame) =
        (_: String, name: String) => name match {
          case "customers_cdc" => custCdc
          case "orders_cdc" => split(ordCdc)
          case other => sys.error(s"unknown source $other")
        }
      // bootstrap on the old span…
      new Pipeline(models.all, store,
        sources(df => df.filter(
          col("_cdc_timestamp") <
            lit(java.sql.Date.valueOf(IncrementalSplit)))))
        .run(s, RunMode.Bootstrap)
      // …then an incremental round over the full feed: the watermark gate
      // must scan only rows past the bootstrap high-water mark
      val out = new Pipeline(models.all, store, sources(identity))
        .run(s, RunMode.Incremental)
      out("dim_customer").orderBy(col("customer_id"))
    } finally { custCdc.unpersist(); ordCdc.unpersist(); () }
  }
}
