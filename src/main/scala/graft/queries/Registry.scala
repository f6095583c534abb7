package graft.queries

/** All driver-checkable queries, one per implemented operator family
  * (SURVEY.md §2 inventory + north-star LLM-pipeline extensions). */
object Registry {
  import graft.analytics.{Curation, Multimodal, NearDup, Quantiles, Temporal, TextOps, VectorOps}
  import graft.analytics.{Product => ProductOps} // shadows scala.Product

  val all: Seq[Q] =
    RefQueries.all ++ OlapQueries.all ++ TextOps.all ++ NearDup.all ++
      VectorOps.all ++ Multimodal.all ++ Temporal.all ++ Curation.all ++
      Quantiles.all ++ graft.quality.Quality.all ++ ProductOps.all ++
      graft.analytics.NgramOps.all ++ graft.analytics.Bpe.all ++
      graft.analytics.Pq.all :+
      graft.ops.BloomJoin.qBloomSemiJoin :+
      graft.analytics.Compress.qCompressRatio :+
      graft.analytics.Compress.qCompressMeta :+
      graft.ops.Scd2.qScd2Snapshot :+
      graft.model.IncrementalAgg.qIncrementalAgg :+
      graft.analytics.IncrementalDedup.qIncrementalDedup :+
      graft.pipeline.PipelineQuery.qPipelineE2e :+
      graft.analytics.AnnIndex.qAnnIndex :+
      graft.analytics.NearDupIndex.qIncrementalNearDup :+
      graft.analytics.AnnIndex.qPqIndex :+
      graft.analytics.AnnIndex.qPqRerank :+
      graft.analytics.AnnIndex.qAnnRecall :+
      graft.analytics.AnnIndex.qKnnGraph :+
      graft.analytics.AnnIndex.qKnnRefine :+
      graft.analytics.AnnIndex.qRrfFusion :+
      graft.analytics.AnnIndex.qKnnScaled :+
      graft.analytics.AnnIndex.qGraphDiversity :+
      graft.analytics.AnnIndex.qHybridRrf :+
      graft.analytics.AnnIndex.qDescentRecall :+
      graft.analytics.AnnIndex.qKnnRefineScaled :+
      graft.analytics.AnnIndex.qIncrementalKnn :+
      graft.analytics.AnnIndex.qHierAssign :+
      graft.analytics.ImageDedup.qImgDhash :+
      graft.analytics.ImageDedup.qHashNearDup

  val flagship: Q = RefQueries.q15Flagship
}
