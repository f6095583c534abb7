package graft.queries

/** All driver-checkable queries, one per implemented operator family
  * (SURVEY.md §2 inventory + north-star LLM-pipeline extensions). */
object Registry {
  val all: Seq[Q] = RefQueries.all

  val flagship: Q = RefQueries.q15Flagship
}
