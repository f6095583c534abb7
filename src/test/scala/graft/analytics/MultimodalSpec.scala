package graft.analytics

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Multimodal plumbing: ingest schema, partition-parallel decode,
  * determinism of the stub feature extractor. */
class MultimodalSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val docs = Seq(
    (1L, "hello world", "en", "srcA", 11L),
    (2L, "spark engine", "en", "srcA", 12L),
    (3L, "données", "fr", "srcB", 7L))
    .toDF("doc_id", "text", "lang", "source", "n_chars")

  test("asMedia: binary payload + typed metadata schema") {
    val media = Multimodal.asMedia(spark, docs)
    val schema = media.schema.map(f => f.name -> f.dataType.typeName).toMap
    assert(schema("payload") == "binary")
    assert(schema("n_bytes") == "long")
    val r = media.filter($"doc_id" === 1L).head()
    assert(r.getAs[Long]("n_bytes") == 11L)
    // UTF-8 multi-byte payload measured in bytes, not chars
    val fr = media.filter($"doc_id" === 3L).head()
    assert(fr.getAs[Long]("n_bytes") == 8L)   // é is 2 bytes
  }

  test("resize + frame-sample chain: bounded payload, fixed frames") {
    val media = Multimodal.asMedia(spark, docs)
    val frames = Multimodal
      .resizeAndSampleFrames(spark, media, maxBytes = 8, nFrames = 4)
      .collect()
    assert(frames.length == 3)
    def cks(r: org.apache.spark.sql.Row): List[Long] =
      r.getSeq[Long](r.fieldIndex("frame_checksums")).toList
    frames.foreach { r =>
      assert(r.getAs[Int]("n_frames") == 4)
      assert(cks(r).length == 4)
    }
    // resize actually bounds the payload
    val item = Multimodal.MediaItem(9L, "s",
      Array.tabulate(100)(_.toByte), "text/plain", 100L)
    assert(Multimodal.resize(item, 8).payload.length <= 8)
    // determinism
    val again = Multimodal
      .resizeAndSampleFrames(spark, media, maxBytes = 8, nFrames = 4)
      .collect().map(cks).toSet
    assert(again == frames.map(cks).toSet)
  }

  test("decodeFeatures: deterministic, schema stable, per-item correct") {
    val media = Multimodal.asMedia(spark, docs)
    val f1 = Multimodal.decodeFeatures(spark, media).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("checksum")).toMap
    val f2 = Multimodal.decodeFeatures(spark, media).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("checksum")).toMap
    assert(f1 == f2)
    // reference checksum computed in plain Scala
    val expected = Multimodal.fakeDecode(Multimodal.MediaItem(
      1L, "srcA", "hello world".getBytes("UTF-8"), "text/plain", 11L))
    assert(f1(1L) == expected.checksum)
  }
}
