package graft.queries

/** All driver-checkable queries, one per implemented operator family
  * (SURVEY.md §2 inventory + north-star LLM-pipeline extensions). */
object Registry {
  import graft.analytics.{Multimodal, NearDup, TextOps, VectorOps}

  val all: Seq[Q] =
    RefQueries.all ++ TextOps.all ++ NearDup.all ++ VectorOps.all ++
      Multimodal.all :+ graft.pipeline.PipelineQuery.qPipelineE2e

  val flagship: Q = RefQueries.q15Flagship
}
