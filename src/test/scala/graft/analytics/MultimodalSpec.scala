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

  test("media metadata aggregate (q110 relational half): per-source " +
      "counts and UTF-8 byte totals") {
    val out = Multimodal.asMedia(spark, docs)
      .groupBy("source", "mime")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n_items"),
        org.apache.spark.sql.functions.sum("n_bytes").as("total_bytes"))
      .collect().map(r => r.getString(0) ->
        (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    assert(out("srcA") == (("text/plain", 2L, 11L + 12L)))
    assert(out("srcB") == (("text/plain", 1L, 8L)))   // bytes, not chars
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

  test("decodeImage: real PNG decodes to dimensions + exact mean luma; " +
      "non-images fall back to the stub") {
    // 3×2 PNG with known pixels, written through the same JDK codec
    // the decoder reads with
    val img = new java.awt.image.BufferedImage(
      3, 2, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val pixels = Seq(                       // (x, y, rgb, luma)
      (0, 0, 0xffffff, 255), (1, 0, 0x000000, 0), (2, 0, 0xff0000, 85),
      (0, 1, 0x00ff00, 85), (1, 1, 0x0000ff, 85), (2, 1, 0x808080, 128))
    pixels.foreach { case (x, y, rgb, _) => img.setRGB(x, y, rgb) }
    val buf = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", buf)
    val png = buf.toByteArray

    val media = Seq(
      (10L, "imgs", png, "image/png", png.length.toLong),
      (11L, "imgs", "not an image".getBytes("UTF-8"), "text/plain", 12L))
      .toDF("doc_id", "source", "payload", "mime", "n_bytes")
    val out = Multimodal.decodeImageFeatures(spark, media)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap

    val decoded = out(10L)
    assert(decoded.getAs[Boolean]("decoded"))
    assert(decoded.getAs[Int]("width") == 3)
    assert(decoded.getAs[Int]("height") == 2)
    val expectedLuma = pixels.map(_._4).sum.toDouble / pixels.size
    assert(math.abs(decoded.getAs[Double]("mean_luma") - expectedLuma)
      < 1e-12)

    val fallback = out(11L)
    assert(!fallback.getAs[Boolean]("decoded"))
    assert(fallback.getAs[Long]("checksum") ==
      Multimodal.fakeDecode(Multimodal.MediaItem(11L, "imgs",
        "not an image".getBytes("UTF-8"), "text/plain", 12L)).checksum)
  }

  test("decodeAudio: real WAV decodes to format + RMS; non-audio falls " +
    "back to the stub") {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    // synthesize 0.1 s of a full-scale 440 Hz sine, 16-bit mono 8 kHz
    val rate = 8000
    val n = 800
    val amp = 0.5
    val pcm = new Array[Byte](n * 2)
    (0 until n).foreach { i =>
      val s = (amp * 32767.0 *
        math.sin(2 * math.Pi * 440.0 * i / rate)).toInt.toShort
      pcm(2 * i) = (s & 0xff).toByte // little-endian
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    val fmt = new AudioFormat(rate.toFloat, 16, 1, true, false)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(
      new AudioInputStream(new java.io.ByteArrayInputStream(pcm), fmt,
        n.toLong),
      AudioFileFormat.Type.WAVE, bos)
    val wav = bos.toByteArray

    import spark.implicits._
    val media = Seq(
      Multimodal.MediaItem(20L, "aud", wav, "audio/wav", wav.length.toLong),
      Multimodal.MediaItem(21L, "aud", "not audio".getBytes("UTF-8"),
        "text/plain", 9L)).toDF()
    val out = Multimodal.decodeAudioFeatures(spark, media)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap

    val a = out(20L)
    assert(a.getAs[Boolean]("decoded"))
    assert(a.getAs[Int]("sample_rate") == rate)
    assert(a.getAs[Int]("channels") == 1)
    assert(a.getAs[Long]("n_frames") == n.toLong)
    // RMS of a sine of amplitude 0.5 is 0.5/√2 ≈ 0.3536
    assert(math.abs(a.getAs[Double]("rms") - amp / math.sqrt(2)) < 0.01)

    val fb = out(21L)
    assert(!fb.getAs[Boolean]("decoded"))
    assert(fb.getAs[Long]("checksum") ==
      Multimodal.fakeDecode(Multimodal.MediaItem(21L, "aud",
        "not audio".getBytes("UTF-8"), "text/plain", 9L)).checksum)
  }

  test("decodeFrames: animated GIF yields per-frame lumas; non-media " +
    "falls back") {
    import java.awt.image.BufferedImage
    import javax.imageio.{IIOImage, ImageIO}
    // 3-frame animated GIF with increasing brightness
    val bos = new java.io.ByteArrayOutputStream()
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    val ios = ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    val levels = Seq(40, 120, 220)
    levels.foreach { lvl =>
      val im = new BufferedImage(8, 8, BufferedImage.TYPE_INT_RGB)
      (0 until 8).foreach(x => (0 until 8).foreach(y =>
        im.setRGB(x, y, (lvl << 16) | (lvl << 8) | lvl)))
      writer.writeToSequence(new IIOImage(im, null, null),
        writer.getDefaultWriteParam)
    }
    writer.endWriteSequence(); ios.close()
    val gif = bos.toByteArray

    import spark.implicits._
    val media = Seq(
      Multimodal.MediaItem(30L, "vid", gif, "image/gif", gif.length.toLong),
      Multimodal.MediaItem(31L, "vid", "not media".getBytes("UTF-8"),
        "text/plain", 9L)).toDF()
    val out = Multimodal.decodeFrameFeatures(spark, media, maxFrames = 8)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap

    val g = out(30L)
    assert(g.getAs[Boolean]("decoded"))
    assert(g.getAs[Int]("n_frames") == 3 && g.getAs[Int]("n_sampled") == 3)
    val lumas = g.getAs[scala.collection.Seq[Double]]("frame_lumas")
    // GIF palette quantization shifts levels slightly — order + rough
    // magnitude is the decode-correctness signal
    assert(lumas.size == 3 && lumas(0) < lumas(1) && lumas(1) < lumas(2))
    assert(math.abs(lumas(0) - 40) < 25 && math.abs(lumas(2) - 220) < 25)

    assert(!out(31L).getAs[Boolean]("decoded"))
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

  test("resizeImage: real thumbnail preserves aspect; small/non-image " +
      "pass through byte-identically") {
    // 64×32 gradient PNG
    val img = new java.awt.image.BufferedImage(
      64, 32, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until 64; y <- 0 until 32)
      img.setRGB(x, y, (x * 4) << 16 | (y * 8) << 8)
    val buf = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", buf)
    val png = buf.toByteArray

    val item = Multimodal.MediaItem(1L, "imgs", png, "image/png",
      png.length.toLong)
    val small = Multimodal.resizeImage(item, 16)
    val back = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(small.payload))
    assert(back.getWidth == 16 && back.getHeight == 8) // aspect kept
    assert(small.n_bytes == small.payload.length.toLong)

    // already within bounds → byte-identical pass-through (idempotent)
    assert(Multimodal.resizeImage(small, 16).payload eq small.payload)
    // non-image → untouched
    val txt = Multimodal.MediaItem(2L, "t", "plain".getBytes, "text/plain", 5L)
    assert(Multimodal.resizeImage(txt, 16).payload eq txt.payload)

    // partition-parallel form keeps schema and decodes end-to-end
    val media = Seq((1L, "imgs", png, "image/png", png.length.toLong))
      .toDF("doc_id", "source", "payload", "mime", "n_bytes")
    val out = Multimodal.resizeImages(spark, media, 16).collect()(0)
    assert(out.getAs[String]("mime") == "image/png")
    assert(out.getAs[Long]("n_bytes") < png.length)
  }
}
