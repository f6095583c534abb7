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
    // FileOutputCommitter v2: task outputs rename straight into the
    // destination at TASK commit (parallel, as tasks finish) instead of
    // being re-renamed serially by the driver at JOB commit. The
    // engine's ModelStore materializes many small versioned tables per
    // pipeline run — v1's serial job-commit pass charges every write
    // twice. The v1-vs-v2 failure-visibility trade (a failed job may
    // leave partial files) is immaterial here because every write lands
    // in a fresh version directory that only becomes visible via the
    // _CURRENT pointer commit — the store's own atomicity, not the
    // committer's, is what readers rely on.
    .config(
      "spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
    // AQE partition coalescing stays at the Spark default
    // (`parallelismFirst=true`). The `false`+16 MB-advisory variant —
    // attractive on paper for intermediate-small shuffles, and the
    // right setting on a real cluster where tasks have scheduling
    // cost — was A/B-measured here and collapsed sf-scale CPU-bound
    // post-shuffle stages (shingling, model builds, histogram walks)
    // onto 1–2 threads of the 32 available: q34 63.9→37.3 s,
    // q75 5.0→2.6 s, q24 5.8→4.3 s just by reverting. In local mode
    // task launch is cheap and parallelism is everything; production
    // cluster deploys should re-tune advisoryPartitionSizeInBytes for
    // their shuffle sizes rather than inherit a local-mode setting.
}
