package graft.streaming

import org.apache.spark.sql.DataFrame

import graft.io.ModelStore
import graft.model.{ModelDef, Pipeline, RunMode}

/** Streaming medallion ingestion: run the SAME `ModelDef`s the batch
  * DAG runs, per micro-batch, via `foreachBatch`. Each trigger's data
  * becomes the model's named bronze source; the model's own watermark
  * gate, CDC dedup, and merge strategy then apply unchanged — so a CDC
  * stream lands as the identical silver/gold tables the batch pipeline
  * produces (asserted by StreamingPipelineSpec).
  *
  * Exactly-once: foreachBatch is at-least-once (a crash between the
  * sink write and the checkpoint commit replays the batch). The batch
  * id is therefore written INSIDE the store's atomic version commit
  * (`ModelStore.write(meta)`), and a replayed id is skipped — data and
  * progress marker can never diverge.
  *
  * This is the §2.9 upgrade path at the WHOLE-MODEL level, one step up
  * from the record-level primitives in [[CdcStream]].
  */
object StreamingPipeline {

  private val BatchKey = "stream_batch_id"

  /** foreachBatch sink materializing `model` from each micro-batch.
    *
    * @param sourceName the one bronze source the micro-batch stands in
    *        for — any other `ctx.source` name is an error rather than
    *        silently receiving the same batch
    * @param refs resolves the model's `ref()` dependencies (e.g. stored
    *        silver tables) */
  def modelSink(store: ModelStore, model: ModelDef, sourceName: String,
      refs: String => DataFrame = n =>
        sys.error(s"unresolved ref('$n') in streaming context"),
      vars: Map[String, String] = Map.empty)
      (batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val alreadyDone = store.meta(spark, model.layer, model.name, BatchKey)
      .exists(_.toLong >= batchId)
    if (!alreadyDone) {
      Pipeline.materializeModel(spark, store, model, RunMode.Incremental,
        sources = (_, name) =>
          if (name == sourceName) batch
          else sys.error(
            s"streaming modelSink only provides '$sourceName', " +
              s"model asked for '$name'"),
        ref = refs, vars = vars,
        meta = Map(BatchKey -> batchId.toString))
    }
  }
}
