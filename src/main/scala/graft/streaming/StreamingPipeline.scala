package graft.streaming

import org.apache.spark.sql.DataFrame

import graft.io.ModelStore
import graft.model.{ModelDef, Pipeline, RunMode}

/** Streaming medallion ingestion: run the SAME `ModelDef`s the batch
  * DAG runs, per micro-batch, via `foreachBatch`. Each trigger's data
  * becomes the model's bronze source; the model's own watermark gate,
  * CDC dedup, and merge strategy then apply unchanged — so a CDC
  * stream lands as the identical silver/gold tables the batch pipeline
  * produces (asserted by StreamingPipelineSpec).
  *
  * This is the §2.9 upgrade path at the WHOLE-MODEL level, one step up
  * from the record-level primitives in [[CdcStream]].
  */
object StreamingPipeline {

  /** foreachBatch sink materializing `model` from each micro-batch.
    * `sourceName` is the bronze source the model reads; `refs` resolves
    * its `ref()` dependencies (e.g. stored silver tables). */
  def modelSink(store: ModelStore, model: ModelDef,
      refs: String => DataFrame = n =>
        sys.error(s"unresolved ref('$n') in streaming context"),
      vars: Map[String, String] = Map.empty)
      (batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    Pipeline.materializeModel(spark, store, model, RunMode.Incremental,
      sources = (_, _) => batch, ref = refs, vars = vars)
  }
}
