package graft.io

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Bucketed-table co-location: pre-shuffle a table ONCE at write time
  * so every later equi-join/aggregation on the bucket key runs with
  * ZERO exchanges (Spark's bucketed scan reports the hash partitioning
  * to the planner; equal bucket counts on both sides line partitions
  * up 1:1, and `sortBy` lets sort-merge join skip its sorts too).
  *
  * This is the repeated-join amortization lever at 100 TB: the
  * reference leans on Delta partitioning for merge pruning (covered by
  * `ModelStore.writeTouchedPartitions`); bucketing is the complementary
  * layout for high-cardinality JOIN keys, where directory partitioning
  * would explode into millions of dirs. Buckets require the session
  * catalog (bucket metadata lives in the table definition, not the
  * parquet files), so this is a catalog-table layer over the same
  * parquet storage the rest of graft.io uses.
  */
object Bucketing {

  /** Write `df` as a catalog-registered bucketed parquet table at
    * `path`. Choose `buckets` so one bucket of the LARGER table fits
    * an executor's memory at target scale (buckets are the fixed unit
    * of join parallelism — they cannot be split by AQE). */
  def writeBucketed(df: DataFrame, table: String, path: String,
      key: String, buckets: Int): Unit =
    // Repartition to exactly the bucket layout BEFORE the write: the
    // writer otherwise emits one file per (input partition × bucket) —
    // file-count explosion — and Spark only reports the bucketed
    // scan's sort order to the planner when each bucket holds a
    // single file, so the "sort-merge join skips its sorts" promise
    // above requires the one-file-per-bucket discipline enforced here.
    df.repartition(buckets, org.apache.spark.sql.functions.col(key))
      .sortWithinPartitions(key)
      .write.format("parquet")
      .option("path", path)
      .bucketBy(buckets, key)
      .sortBy(key)
      .mode(SaveMode.Overwrite)
      .saveAsTable(table)
}
