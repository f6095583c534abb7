package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.analytics.NearDup
import graft.analytics.TextOps
import graft.streaming.DocStream.IngestedDoc

/** Streaming NEAR-duplicate detection — the stateful counterpart of
  * batch SimHash dedup (q26/q35). [[DocStream.curate]] already drops
  * exact duplicates within the watermark horizon; this catches
  * near-identical rewrites:
  *
  *  - each doc gets a scan-local 64-bit SimHash
  *    ([[NearDup.simhashExpr]] — no shuffle, no state);
  *  - docs are grouped by ONE 16-bit SimHash band; per band,
  *    `flatMapGroupsWithState` keeps the signatures seen within the
  *    watermark horizon and Hamming-verifies each arrival against
  *    them BEFORE flagging — collisions of genuinely different docs
  *    are kept (no false drops, unlike naive key-dedup on the band);
  *  - state is bounded: signatures expire with the event-time
  *    watermark, and each band stores at most [[NearDup.MaxBucket]]
  *    signatures (the degenerate-bucket cap from the batch path).
  *
  * Recall caveat, documented on purpose: batch blocking uses all 4
  * bands (pigeonhole-lossless at Hamming ≤ 3); a single stateful op
  * can only key one band, so a near-dup pair whose differing bits all
  * fall inside band 0 is missed here and caught by the periodic batch
  * job (q35) — the standard streaming/batch split of a dedup
  * pipeline.
  */
object NearDupStream {

  final case class SigDoc(
      docId: Long, ingestTs: Timestamp, simhash: Long, band: Long)

  final case class SigEntry(docId: Long, sig: Long, tsMs: Long)
  final case class BandState(sigs: List[SigEntry])

  final case class Flagged(
      docId: Long, ingestTs: Timestamp, simhash: Long,
      isNearDup: Boolean, dupOf: Long)

  /** Per-band stateful verify: flag arrivals within Hamming ≤
    * [[NearDup.MaxHamming]] of a signature seen inside the horizon. */
  private[streaming] def verifyBand(
      band: Long, rows: Iterator[SigDoc],
      state: GroupState[BandState]): Iterator[Flagged] = {
    if (state.hasTimedOut) {
      state.remove()
      Iterator.empty
    } else {
      val wm = state.getCurrentWatermarkMs()
      var sigs = state.getOption.map(_.sigs).getOrElse(Nil)
        .filter(_.tsMs >= wm)
      // deterministic within-batch order: event time then id
      val out = rows.toSeq.sortBy(r => (r.ingestTs.getTime, r.docId))
        .map { r =>
          val hit = sigs.find(e =>
            java.lang.Long.bitCount(e.sig ^ r.simhash) <=
              NearDup.MaxHamming)
          // Flagged docs ALSO enter state (their signature differs
          // from the anchor's by up to MaxHamming bits): a later doc
          // near the dup but not the anchor — a transitive chain
          // A~B~C with hamming(A,C) > MaxHamming — is then still
          // flagged, matching batch clusterPairs transitivity.
          if (sigs.size < NearDup.MaxBucket)
            sigs = SigEntry(r.docId, r.simhash,
              r.ingestTs.getTime) :: sigs
          Flagged(r.docId, r.ingestTs, r.simhash,
            hit.isDefined, hit.map(_.docId).getOrElse(-1L))
        }
      state.update(BandState(sigs))
      // expire the band's state one horizon past the newest signature
      val newest = sigs.map(_.tsMs).foldLeft(wm)(math.max)
      state.setTimeoutTimestamp(newest + 1,
        "0 milliseconds") // fires once the watermark passes newest
      out.iterator
    }
  }

  /** Streaming near-dup flags for an ingested doc feed. */
  def nearDedup(docs: Dataset[IngestedDoc], watermarkDelay: String)
      : DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // the signature comes from NearDup's single definition — stream
    // and batch SimHashes can never drift apart
    val sigs = NearDup.withSimhash(docs.toDF(), col("text"))
      .withColumn("band", col("simhash").bitwiseAND(lit(0xffffL)))
      .withWatermark("ingestTs", watermarkDelay)
      .select(col("docId"), col("ingestTs"), col("simhash"), col("band"))
      .as[SigDoc]
    sigs.groupByKey(_.band)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(verifyBand)
      .toDF()
  }
}
