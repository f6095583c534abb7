package graft.analytics

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

import graft.io.{ModelStore, Tables}
import graft.ops.BloomJoin
import graft.queries.Q

/** Incremental exact dedup against ALL of history — the batch-tier
  * contract [[graft.streaming.DocStream]] delegates to (the stream
  * only dedups within its watermark horizon): each arriving corpus
  * batch (a crawl, a dump, a day of ingestion) keeps only documents
  * whose content fingerprint has never been seen in ANY prior batch,
  * and the fingerprint history persists in a versioned [[ModelStore]]
  * table.
  *
  * This is the aggregation analog of [[graft.model.IncrementalAgg]]
  * applied to dedup: one-shot q19 re-scans the whole corpus per run;
  * here each run costs O(batch) + one column-pruned history probe —
  * the difference between re-deduping a year of crawls and deduping a
  * day against a fingerprint index.
  *
  * Scale shape (the history side never shuffles):
  *  1. batch-internal first-copy dedup — one shuffle on the
  *     fingerprint, batch-sized;
  *  2. a persisted Bloom sketch of ALL historical fingerprints is
  *     probed scan-locally: definitely-novel fingerprints (the common
  *     case on a mostly-fresh feed) SKIP the history entirely; the
  *     sketch unions incrementally per batch (Bloom OR — fingerprints
  *     are append-only, the one regime where a sketch index never
  *     needs rebuilding);
  *  3. possible-duplicates (true dups + sketch false positives) are
  *     exact-verified: the history table's fingerprint COLUMN is
  *     scanned (column-pruned — ~16 bytes/row of the stored table)
  *     with the candidate set broadcast against it, so history is
  *     never shuffled and never read beyond one column;
  *  4. survivors append as a new `ingest_batch` partition —
  *     `writeTouchedPartitions` links every prior batch's directory,
  *     O(batch) write cost (the [[graft.streaming.QualityStream]]
  *     append discipline).
  *
  * Crash-safety ordering: the sketch merges BEFORE the batch commits.
  * A sketch over-approximating history only costs verify work; an
  * under-approximating one would silently re-admit duplicates. A
  * missing sketch (first batch, or deleted) falls back to verifying
  * every fingerprint — the sketch is an optimization, never a
  * correctness dependency (IncrementalDedupSpec proves the fold with
  * a pathological all-colliding sketch).
  *
  * Contract: batches arrive in keep-priority order (earlier batch
  * wins; within a batch the smallest `orderCol` wins) — the same
  * arrival-order contract as the stream's first-copy-wins.
  */
object IncrementalDedup {

  /** Fold one batch into the fingerprint history at `layer`.`name`;
    * returns the kept (first-copy) rows. `batch` must carry `keyCol`
    * (the content fingerprint) and `orderCol` (the within-batch
    * keep-priority, e.g. doc id). */
  def applyBatch(spark: SparkSession, store: ModelStore, layer: String,
      name: String, batch: DataFrame, batchId: Long,
      keyCol: String = "content_fp", orderCol: String = "doc_id",
      estKeys: Long = BloomJoin.EstKeys,
      numBits: Long = BloomJoin.NumBits): DataFrame = {
    require(batch.columns.contains(keyCol), s"batch lacks $keyCol")
    val sketchTable = s"${name}_sketch"

    // 1. batch-internal first copy per fingerprint (one batch shuffle)
    val w = Window.partitionBy(keyCol).orderBy(col(orderCol))
    val winners = batch
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
      .persist()
    try {
      val history = store.read(spark, layer, name)
      val kept = history match {
        case None => winners // empty history: everything is novel
        case Some(hist) =>
          // 2. scan-local sketch probe: novel fps skip the history
          val sketch = store.read(spark, layer, sketchTable)
            .map(_.head().getAs[Array[Byte]](0))
          val candidates = sketch match {
            case Some(bytes) =>
              winners.filter(BloomJoin.mightContain(bytes, col(keyCol)))
            case None => winners // no sketch: verify everything
          }
          // 3. exact verify — candidate fps broadcast against the
          // column-pruned history scan (history never shuffles)
          val existing = hist.select(keyCol)
            .join(broadcast(candidates.select(keyCol)),
              Seq(keyCol), "left_semi")
          winners.join(broadcast(existing), Seq(keyCol), "left_anti")
      }
      val tagged = kept.withColumn("ingest_batch", lit(batchId))
      // sketch first (over-approximation is safe), then the commit
      val batchSketch =
        BloomJoin.buildSketch(winners, col(keyCol), estKeys, numBits)
      val merged = store.read(spark, layer, sketchTable) match {
        case None => batchSketch
        case Some(prior) =>
          val a = BloomFilter.readFrom(new ByteArrayInputStream(
            prior.head().getAs[Array[Byte]](0)))
          a.mergeInPlace(
            BloomFilter.readFrom(new ByteArrayInputStream(batchSketch)))
          val out = new ByteArrayOutputStream()
          a.writeTo(out)
          out.toByteArray
      }
      import spark.implicits._
      store.write(Seq(merged).toDF("sketch"), layer, sketchTable)
      store.vacuum(spark, layer, sketchTable, keepLast = 2)
      // 4. append as a new batch partition (prior batches link over).
      // An all-duplicates batch writes an empty fresh set and links
      // everything — still a correct commit, no emptiness probe needed.
      store.writeTouchedPartitions(tagged, layer, name,
        partitionBy = Seq("ingest_batch"))
      store.vacuum(spark, layer, name, keepLast = 2)
    } finally { winners.unpersist(); () }
    // read back from the committed version: the returned plan must not
    // re-probe history (a lazy re-evaluation after the commit would see
    // its own batch and return empty)
    store.read(spark, layer, name).get
      .filter(col("ingest_batch") === batchId)
      // partition-dir column inference narrows small ids to int —
      // pin the declared type
      .withColumn("ingest_batch", col("ingest_batch").cast("long"))
  }

  /** foreachBatch sink: forever-dedup at ingest. Where
    * [[graft.streaming.DocStream.curate]] dedups within its watermark
    * horizon (bounded state), this sink dedups against ALL history via
    * the persisted fingerprint store — the two compose: horizon dedup
    * absorbs the hot duplicates cheaply in-stream, this sink catches
    * re-crawls arriving days later. Replays are naturally idempotent:
    * a re-delivered micro-batch's fingerprints are already in history,
    * so nothing new commits (the empty write links existing partitions
    * through) and the call returns the same kept set the original
    * delivery did — no separate exactly-once marker needed
    * (IncrementalDedupSpec proves both properties). */
  def sink(store: ModelStore, layer: String, name: String,
      keyCol: String = "content_fp", orderCol: String = "doc_id")(
      batch: DataFrame, batchId: Long): Unit =
    applyBatch(batch.sparkSession, store, layer, name, batch, batchId,
      keyCol, orderCol): Unit

  // ------------------------------------------- driver-checkable query
  // Documents arrive as two doc_id-range batches (the driver-side
  // loop is batch-arrival orchestration, as in q58; the spec proves
  // longer chains); the surviving corpus must equal the one-shot
  // first-copy dedup over everything — exactly what the oracle
  // computes, with each survivor tagged by the batch introducing it.
  val qIncrementalDedup: Q = Q(
    "q86_incremental_dedup",
    """WITH mx AS (SELECT max(doc_id) AS m FROM documents),
      |fp AS (
      |  SELECT doc_id,
      |    md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))
      |      AS content_fp,
      |    CASE WHEN doc_id <= m // 2 THEN 0 ELSE 1 END AS bid
      |  FROM documents CROSS JOIN mx),
      |keep AS (SELECT content_fp, min(doc_id) AS doc_id FROM fp
      |  GROUP BY 1)
      |SELECT f.doc_id, f.content_fp, CAST(f.bid AS BIGINT) AS batch_id
      |FROM fp f JOIN keep k
      |  ON f.content_fp = k.content_fp AND f.doc_id = k.doc_id
      |ORDER BY f.doc_id""".stripMargin) { (s, d) =>
    val store = new ModelStore(
      graft.pipeline.PipelineQuery.tempStoreDir())
    val docs = Tables.load(s, d, "documents")
      .select(col("doc_id"),
        TextOps.contentHash(col("text")).as("content_fp"))
    // sanctioned scalar (as q58's year list): the batch boundary
    val maxId = docs.agg(max("doc_id")).head().getLong(0)
    val b1 = maxId / 2
    val bounds = Seq(col("doc_id") <= b1, col("doc_id") > b1)
    bounds.zipWithIndex.foreach { case (pred, i) =>
      applyBatch(s, store, "dedup", "doc_fps", docs.filter(pred),
        i.toLong): Unit
    }
    store.read(s, "dedup", "doc_fps").get
      .select(col("doc_id"), col("content_fp"),
        col("ingest_batch").cast("long").as("batch_id"))
      .orderBy("doc_id")
  }.copy(sideEffecting = true)
}
