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
    // Let AQE coalesce small shuffles down to data-sized task counts
    // instead of preserving parallelism at all costs (the default
    // `parallelismFirst=true` keeps ~cores-many tiny tasks per stage,
    // which is pure scheduling overhead for the many
    // intermediate-small shuffles a multi-stage pipeline produces —
    // and Spark's own docs recommend false for production). The 16 MB
    // advisory target keeps genuinely large shuffles parallel: a
    // 100 TB stage still fans out to millions of tasks, while a
    // 2 MB histogram walk no longer pays 32 task launches.
    .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
      "false")
    .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16m")
}
