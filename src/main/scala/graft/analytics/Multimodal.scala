package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.Tables
import graft.queries.Q

/** Multimodal-column plumbing: media as opaque `binary` payloads with
  * typed metadata, decoded/feature-extracted per partition.
  *
  * The Spark-side shape is real and tested — binary column + metadata
  * schema, partition-parallel decode (`mapPartitions` over a typed
  * Dataset; the Scala analog of Python's `mapInPandas` batch UDF),
  * aggregation over extracted features. The decode itself is a
  * deterministic STUB (this container ships no image/audio codecs):
  * [[fakeDecode]] stands in for e.g. a JPEG decoder + feature network,
  * keeping the data flow, schema, and batch shape production-true.
  */
object Multimodal {

  /** One media item: payload plus typed metadata. */
  final case class MediaItem(doc_id: Long, source: String,
      payload: Array[Byte], mime: String, n_bytes: Long)

  /** Extracted features per item (stub decoder output). */
  final case class MediaFeatures(doc_id: Long, source: String,
      n_bytes: Long, checksum: Long, feat0: Double)

  /** STUB decoder — deterministic byte-level features standing in for a
    * real image/audio decode (no codecs in this environment). Shape
    * (per-partition batch iteration, bytes → fixed-width features) is
    * exactly what a real decoder plugs into. */
  def fakeDecode(item: MediaItem): MediaFeatures = {
    var sum = 0L
    var i = 0
    while (i < item.payload.length) {
      sum = (sum * 31 + (item.payload(i) & 0xff)) & 0xffffffffL
      i += 1
    }
    MediaFeatures(item.doc_id, item.source, item.n_bytes, sum,
      sum % 1000 / 1000.0)
  }

  /** documents.text → opaque binary payload + metadata (the ingest step
    * a real pipeline does for images/audio blobs). */
  def asMedia(spark: SparkSession, docs: DataFrame): DataFrame = {
    docs.select(col("doc_id"), col("source"),
      encode(col("text"), "UTF-8").as("payload"),
      lit("text/plain").as("mime"),
      octet_length(encode(col("text"), "UTF-8")).cast("long").as("n_bytes"))
  }

  /** Partition-parallel decode: typed Dataset, no driver involvement,
    * codegen-friendly boundaries (only the decode itself is opaque). */
  def decodeFeatures(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.as[MediaItem].mapPartitions(_.map(fakeDecode)).toDF()
  }

  /** Frame sample per item (stub frame-sampler output). */
  final case class MediaFrames(doc_id: Long, source: String,
      n_frames: Int, frame_checksums: Seq[Long])

  /** STUB resize — deterministic byte subsampling to ≤ maxBytes,
    * standing in for an image resize / audio downsample. Keeps the
    * payload-in→payload-out shape a real codec transform has. */
  def resize(item: MediaItem, maxBytes: Int): MediaItem = {
    if (item.payload.length <= maxBytes) item
    else {
      val stride = math.ceil(item.payload.length.toDouble / maxBytes).toInt
      val out = item.payload.indices.collect {
        case i if i % stride == 0 => item.payload(i)
      }.toArray
      item.copy(payload = out, n_bytes = out.length.toLong)
    }
  }

  /** STUB frame sampling — split the payload into `n` equal chunks and
    * checksum each, standing in for video frame extraction (fixed
    * frame count per item, one feature row per item). */
  def sampleFrames(item: MediaItem, n: Int): MediaFrames = {
    val len = item.payload.length
    val checksums = (0 until n).map { f =>
      val from = f * len / n
      val until = (f + 1) * len / n
      var sum = 0L
      var i = from
      while (i < until) {
        sum = (sum * 31 + (item.payload(i) & 0xff)) & 0xffffffffL
        i += 1
      }
      sum
    }
    MediaFrames(item.doc_id, item.source, n, checksums)
  }

  /** Partition-parallel resize → frame-sample chain over the typed
    * Dataset (the multi-step decode pipeline shape). */
  def resizeAndSampleFrames(spark: SparkSession, media: DataFrame,
      maxBytes: Int, nFrames: Int): DataFrame = {
    import spark.implicits._
    media.as[MediaItem]
      .mapPartitions(_.map(m => sampleFrames(resize(m, maxBytes), nFrames)))
      .toDF()
  }

  // Rows-only driver check (binary decode is engine-specific by design);
  // MultimodalSpec asserts determinism + schema + per-item features.
  val qMultimodalPipeline: Q = Q.noOracle("q31_multimodal_features") {
    (s, d) =>
      val media = asMedia(s, Tables.load(s, d, "documents"))
      decodeFeatures(s, media)
        .groupBy("source")
        .agg(count(lit(1)).as("n_items"),
          sum("n_bytes").as("total_bytes"),
          min("checksum").as("min_checksum"),
          max("checksum").as("max_checksum"))
        .orderBy("source")
  }

  val all: Seq[Q] = Seq(qMultimodalPipeline)
}
