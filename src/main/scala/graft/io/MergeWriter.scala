package graft.io

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions.{assert_true, col, count, lit}

/** Delta-MERGE emulation for environments without Delta jars
  * (SURVEY.md §2.1 S3/S6): the reference materializes every model with
  * `incremental_strategy='merge'` + `on_schema_change='sync_all_columns'`
  * (`customers_latest.sql:3–6` etc.) — MERGE matched→update-all,
  * not-matched→insert, target schema synced to the model's SELECT.
  *
  * Plan shape: one anti-join on the merge key. At scale the anti-join
  * shuffles both sides on the key unless `updates` is broadcast-small;
  * with partitioned targets, partition-pruning the `existing` side by
  * the updates' touched partitions bounds the rewrite (the same
  * optimization Delta's MERGE does with file pruning). On
  * Delta-enabled clusters this whole object is replaced by
  * `DeltaTable.merge`.
  */
object MergeWriter {

  /** Upsert `updates` into `existing` on `key`; output schema follows
    * `updates` (sync_all_columns: new columns appear null-backfilled,
    * removed columns are dropped, changed types follow the update).
    *
    * Delta's MERGE raises when one target row matches multiple source
    * rows; `checkUniqueKeys` (default on) enforces the same contract —
    * duplicate keys in `updates` fail the job instead of silently
    * breaking the one-row-per-key SCD-1 invariant. The check is an
    * inline window count on the updates side (no extra job, no
    * recomputation of the updates plan); callers that already reduce
    * to one winner per key (e.g. `CdcStream.scd1Sink` via
    * `CdcDedup.latestByKey`) may pass false to skip the window. */
  def merge(existing: DataFrame, updates: DataFrame, key: String,
      checkUniqueKeys: Boolean = true): DataFrame = {
    val checked =
      if (!checkUniqueKeys) updates
      else {
        val perKey = count(lit(1)).over(Window.partitionBy(col(key)))
        updates
          .withColumn("__merge_dup_chk", assert_true(perKey <= 1,
            lit(s"duplicate merge key '$key' in updates batch " +
              "(MERGE requires one source row per target key)")))
          .filter(col("__merge_dup_chk").isNull)
          .drop("__merge_dup_chk")
      }
    mergeUnique(existing, checked, key)
  }

  private def mergeUnique(existing: DataFrame, updates: DataFrame,
      key: String): DataFrame = {
    // Null-safe (<=>) anti-join: a NULL-key update must REPLACE the
    // stored NULL-key row. Plain equality never matches NULL, so a
    // malformed-envelope row with a null key would append once per
    // incremental run — N duplicate null-key rows after N runs, and
    // the per-batch uniqueness check above can't see it (it only
    // counts within one batch). EqualNullSafe still hash-joins.
    val kept = existing.join(
      updates.select(col(key).as("__merge_k")),
      col(key) <=> col("__merge_k"), "left_anti")
    val target = updates.schema
    val keptSynced = kept.unionByName(updates.limit(0),
      allowMissingColumns = true)   // null-backfill new columns
    val aligned = keptSynced.select(target.fields.map(f =>
      col(f.name).cast(f.dataType)): _*)
    aligned.unionByName(updates)
  }
}
