package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.analytics.TextOps

/** Streaming corpus ingestion for the LLM-data tier: the batch curation
  * operators (fingerprint, quality scoring, PII scrub — q19/q20/q41)
  * applied to an unbounded document feed.
  *
  *  batch primitive                     → streaming primitive
  *  ──────────────────────────────────────────────────────────────
  *  exact dedup: groupBy(fingerprint)   → `dropDuplicatesWithinWatermark`
  *    keep min doc_id                     on the fingerprint (first
  *                                        delivery wins; state bounded
  *                                        by the watermark window)
  *  quality score / scrub (scan-local)  → same Column expressions —
  *                                        stateless, unchanged
  *
  * The dedup state holds one fingerprint hash per UNIQUE document seen
  * within the watermark horizon — bounded by arrival rate × horizon,
  * not corpus size, which is what makes this viable on an unbounded
  * 100 TB/day feed. Cross-horizon exact dedup (forever-uniqueness) is
  * the batch job's contract (q19), not the stream's: the stream
  * guarantees no duplicate within the horizon and at-least-once
  * delivery of the first copy.
  */
object DocStream {

  /** An ingested document: event-time + the raw text payload. */
  final case class IngestedDoc(
      docId: Long,
      ingestTs: Timestamp,
      text: String)

  /** Curated stream: normalized-content fingerprint dedup (first copy
    * wins within the watermark), then stateless quality + scrub
    * columns. Emits one row per unique fingerprint per horizon. */
  def curate(docs: Dataset[IngestedDoc], watermarkDelay: String)
      : DataFrame =
    // fingerprint + band come from TextOps' single definitions — the
    // stream can never drift from the batch q19/q20 semantics
    docs.toDF()
      .withColumn("content_hash", TextOps.contentHash(col("text")))
      .withWatermark("ingestTs", watermarkDelay)
      .dropDuplicatesWithinWatermark("content_hash")
      .withColumn("clean_text", TextOps.scrubPii(col("text")))
      .withColumn("n_words", size(TextOps.tokens(col("text"))).cast("long"))
      .withColumn("quality_band", TextOps.qualityBand(col("text")))
      .select("docId", "ingestTs", "content_hash", "clean_text",
        "n_words", "quality_band")

  /** Decontamination-at-ingest: flag streaming docs sharing any word
    * n-gram with a static eval/benchmark suite.
    *
    * The eval suite's gram set is compiled ONCE (batch side) into a
    * Bloom sketch ([[graft.ops.BloomJoin.buildSketch]] over
    * [[graft.analytics.NgramOps.gramLongHashes]]); the stream probes
    * each doc's grams against the sketch literal — a pure scan-local
    * expression, so the gate is STATELESS (no streaming state, no
    * watermark interaction, works in append mode at any rate). False
    * positives can only over-flag (a clean doc marked contaminated) —
    * the safe direction for decontamination; there are no false
    * negatives. Sketch size is bounded by the eval suite, not the
    * stream. */
  def contaminationGate(docs: DataFrame, evalSketch: Array[Byte],
      gramN: Int): DataFrame = {
    import graft.analytics.NgramOps
    import graft.ops.BloomJoin
    docs
      .withColumn("__t", TextOps.tokens(col("text")))
      // DISTINCT flagged grams, matching batch q66's definition (a doc
      // repeating one eval gram 5× is contaminated ONCE — counting
      // with multiplicity would make stream counts incomparable to
      // the batch n_contaminated they mirror)
      .withColumn("n_flagged_grams",
        size(filter(
          array_distinct(NgramOps.gramLongHashes(col("__t"), gramN)),
          g => BloomJoin.mightContain(evalSketch, g))).cast("long"))
      .withColumn("is_contaminated", col("n_flagged_grams") > 0)
      .drop("__t")
  }

  /** DSIR-at-ingest: score each streaming document's importance
    * against a contrast table compiled ONCE batch-side
    * ([[TextOps.dsirContrastArray]] — the q97 trainer). The scorer is
    * a pure scan-local expression over a B-long literal (bucket the
    * token with the same codegen'd xxhash64, index the array, sum the
    * exact integer micro-nats), so the gate is STATELESS — no
    * streaming state, no watermark interaction, append mode at any
    * rate — and emits bit-identical weights to the batch q97 scorer
    * for the same text (spec-pinned). Artifact size is the design
    * constant B, not the corpus, same as the eval Bloom sketch. */
  def importanceGate(docs: DataFrame, contrast: Array[Long])
      : DataFrame = {
    val b = contrast.length.toLong
    docs
      .withColumn("dsir_weight_q",
        aggregate(
          transform(TextOps.tokens(col("text")), w =>
            element_at(lit(contrast),
              (pmod(xxhash64(w), lit(b)) + 1).cast("int"))),
          lit(0L), (acc, x) => acc + x))
  }
}
