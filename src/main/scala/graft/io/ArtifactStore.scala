package graft.io

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch [[ModelStore]] roots for corpus-keyed derived artifacts
  * (ANN indexes, cluster decisions): one store per (artifact family,
  * canonical corpus dir), keyed by the FULL canonical path's MD5 so
  * two corpora sharing a basename can never serve each other's
  * artifacts. Staleness is the CALLER's contract: stamp commits with
  * a content fingerprint + hyperparameter signature and rebuild on
  * mismatch (the AnnIndex/NearDup pattern — [[contentFp]] +
  * [[ensure]] are that pattern's shared implementation). These live
  * under /tmp by design — self-contained demo/benchmark queries; a
  * real deployment roots its artifact stores on durable storage. */
object ArtifactStore {
  def forDir(family: String, dir: String): ModelStore = {
    val key = java.security.MessageDigest.getInstance("MD5")
      .digest(new java.io.File(dir).getCanonicalPath.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    new ModelStore(s"/tmp/graft-$family/$key")
  }

  /** The ONE corpus content fingerprint every artifact family keys
    * staleness on: row count + XOR of per-row hashes —
    * order-insensitive, overflow-free under ANSI. Centralized because
    * the formula is staleness-critical: two families disagreeing on
    * what "same corpus" means would rebuild/serve inconsistently for
    * the identical change. */
  def contentFp(df: DataFrame, id: Column, payload: Column): String =
    df.agg(concat_ws(":", count(lit(1)),
        coalesce(bit_xor(xxhash64(id, payload)), lit(0L))).as("fp"))
      .head().getString(0)

  /** Check-then-build-then-vacuum, shared by every stored-artifact
    * helper. `checkTable`'s commit meta carries the signature; the
    * vacuum keeps TWO versions of every listed table (the
    * one-generation concurrent-reader pin, ArtifactStoreSpec).
    *
    * Concurrent-writer fallback: two sessions racing the same stale
    * store both start building; the loser's commit throws the store's
    * optimistic-concurrency error. If the WINNER committed the same
    * signature we wanted, its artifact is byte-equivalent to ours
    * (deterministic builds keyed by content+hyperparameters), so the
    * loser serves it instead of failing the query; any other failure
    * (or a winner with a DIFFERENT signature) still throws. */
  def ensure(spark: SparkSession, store: ModelStore, layer: String,
      checkTable: String, sig: String,
      vacuumTables: Seq[String] = Nil)(build: => Unit): Unit = {
    if (store.meta(spark, layer, checkTable, "corpus_fp").contains(sig))
      return
    try {
      build
      (checkTable +: vacuumTables).distinct.foreach(t =>
        store.vacuum(spark, layer, t, keepLast = 2))
    } catch {
      case e: Throwable =>
        if (!store.meta(spark, layer, checkTable, "corpus_fp")
            .contains(sig)) throw e
    }
  }
}
