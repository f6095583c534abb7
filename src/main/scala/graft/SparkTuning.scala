package graft

import org.apache.spark.sql.SparkSession

/** Engine-wide session tuning shared by every entrypoint (Bench,
  * Verify, tools, tests) so measured behavior is the shipped
  * behavior. */
object SparkTuning {
  def apply(b: SparkSession.Builder): SparkSession.Builder = b
    // One timezone for every entrypoint: correctness is verified under
    // UTC (the oracle compares timestamp/date bucketing values), so the
    // bench must execute the same semantics — a host-local timezone
    // would time DIFFERENT work (different session/day/cohort buckets)
    // than what Verify validated.
    .config("spark.sql.session.timeZone", "UTC")
    // ObjectHashAggregate (TopKAgg / BoundedSetAgg, the bounded
    // per-group buffers behind top-k and inverted-index pair
    // generation) falls back to SORT-based aggregation once the
    // in-memory hash map passes this row count — the 128-row default
    // degenerates every high-cardinality object aggregation into a
    // full sort plus per-merge buffer ser/de. The buffers are k-bounded
    // by construction (that is their point), so a deeper map is safe:
    // 64k entries × a ~51-element boxed buffer ≈ 100 MB worst case per
    // task; the fallback stays on as the safety valve for tasks whose
    // groups all run at the cap.
    .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
      "65536")
}
