package graft.analytics

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.io.Tables

/** Perceptual image near-dup (q127/q128): the dHash arm on REAL
  * planted images — PNG↔BMP re-encodes and photometric shifts that
  * byte-exact dedup provably misses — plus the shared banded-Hamming
  * clustering invariants. The relational half's cross-engine proof is
  * q128's DuckDB oracle; these specs pin the codec half. */
class ImageDedupSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._
  private val Dir = "/root/testdata/sf0.001"

  /** 64×64 RGB test image: luma ramps `lo → lo+180` left to right when
    * `rising` (all horizontal-gradient bits 1), right to left when
    * not (all bits 0) — maximally distant dHashes by construction. */
  private def ramp(rising: Boolean, lo: Int): java.awt.image.BufferedImage = {
    val im = new java.awt.image.BufferedImage(64, 64,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 64; x <- 0 until 64) {
      val t = if (rising) x else 63 - x
      val v = math.min(255, lo + t * 180 / 63)
      im.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    im
  }

  private def encode(im: java.awt.image.BufferedImage, fmt: String)
      : Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(im, fmt, bos)
    bos.toByteArray
  }

  private def item(id: Long, payload: Array[Byte]) =
    Multimodal.MediaItem(id, "img", payload, "application/octet-stream",
      payload.length.toLong)

  test("dHash: PNG and BMP encodings of the same pixels hash " +
      "identically despite different bytes; a brightness shift is " +
      "within the Hamming radius; a reversed gradient is far outside") {
    val base = ramp(rising = true, lo = 10)
    val png = encode(base, "png")
    val bmp = encode(base, "bmp")
    assert(!java.util.Arrays.equals(png, bmp),
      "re-encodes must differ byte-wise or the test proves nothing")
    val hPng = ImageDedup.dHash(item(0L, png))
    val hBmp = ImageDedup.dHash(item(1L, bmp))
    assert(hPng.decoded && hBmp.decoded)
    assert(hPng.dhash == hBmp.dhash,
      "same pixels must produce the same perceptual hash")
    // photometric shift: +10 luma preserves every gradient comparison
    val bright = encode(ramp(rising = true, lo = 20), "png")
    val hBright = ImageDedup.dHash(item(2L, bright))
    assert(hBright.decoded)
    assert(java.lang.Long.bitCount(hPng.dhash ^ hBright.dhash)
      <= NearDup.MaxHamming)
    // reversed gradient: every comparison flips
    val hRev = ImageDedup.dHash(item(3L, encode(
      ramp(rising = false, lo = 10), "png")))
    assert(hRev.decoded)
    assert(java.lang.Long.bitCount(hPng.dhash ^ hRev.dhash)
      > NearDup.MaxHamming)
  }

  test("planted re-encodes cluster together where byte-exact dedup " +
      "misses them; unrelated images and the byte-level fallback arm " +
      "cluster independently") {
    val a = ramp(rising = true, lo = 10)
    val txt = "the same exact text".getBytes("UTF-8")
    val media = Seq(
      (0L, encode(a, "png")), // anchor
      (1L, encode(a, "bmp")), // re-encode: different bytes, same pixels
      (2L, encode(ramp(rising = true, lo = 20), "png")), // brightened
      (3L, encode(ramp(rising = false, lo = 10), "png")), // unrelated
      (4L, txt), // fallback arm: identical bytes...
      (5L, txt.clone()), // ...cluster at distance 0
      (6L, "an entirely different text payload".getBytes("UTF-8")))
      .toDF("doc_id", "payload")
      .select(col("doc_id"), lit("img").as("source"), col("payload"),
        lit("application/octet-stream").as("mime"),
        octet_length(col("payload")).cast("long").as("n_bytes"))
    // byte-exact dedup misses the re-encode pair (different bytes)
    val payloads = media.select("doc_id", "payload").collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    assert(!java.util.Arrays.equals(payloads(0L), payloads(1L)))
    val hashed = ImageDedup.dHashes(spark, media)
    val decided = ImageDedup.hammingClusters(hashed
        .select(col("doc_id").as("id"), col("dhash").as("hash")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(decided(1L) == 0L, "BMP re-encode must join the PNG anchor")
    assert(decided(2L) == 0L, "brightened variant must join the anchor")
    assert(decided(0L) == 0L)
    assert(decided(3L) == 3L, "unrelated image must stay its own keep")
    assert(decided(5L) == 4L, "identical fallback payloads must cluster")
    assert(decided(6L) == 6L)
  }

  /** sf0.001 documents with byte-level duplicates PLANTED (docs 1 and
    * 2 get doc 0's text — the swapgen fixture's 6-8 group, stated
    * locally so the spec owns its inputs): the corpus-level proof
    * that the fallback arm clusters byte-identical payloads. */
  private lazy val plantedDir: String = {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-imgdedup").toString
    val docs = Tables.load(spark, Dir, "documents")
    val t0 = docs.filter(col("doc_id") === 0L).select("text")
      .head().getString(0)
    docs.withColumn("text",
        when(col("doc_id").isin(1L, 2L), lit(t0))
          .otherwise(col("text")))
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("q127 over a corpus with planted byte-dups: total (one " +
      "decision per document), keep_id ≤ doc_id, byte-identical " +
      "payloads cluster through the fallback arm") {
    val docs = Tables.load(spark, plantedDir, "documents")
    val out = ImageDedup.qImgDhash.build(spark, plantedDir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.length.toLong == docs.count())
    assert(out.forall { case (d, k) => k <= d })
    // byte-identical payloads must share a keep — cross-check against
    // exact text equality over the planted group (and any natural one)
    val texts = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val keep = out.toMap
    val byText = texts.groupBy(_._2).values.filter(_.size > 1)
    assert(byText.exists(_.size >= 3), "planted dup group missing")
    byText.foreach { grp =>
      assert(grp.keys.map(keep).toSet.size == 1,
        "byte-identical payloads landed in different clusters")
    }
    assert(keep(1L) == 0L && keep(2L) == 0L)
  }

  test("q128 ≡ q127's clustering code path: the hammingClusters " +
      "output over xxhash64(text) matches a driver-side recomputation " +
      "(band → bucket-cap → Hamming ≤ radius → transitive closure), " +
      "with planted byte-dups forming a real cluster") {
    val docs = Tables.load(spark, plantedDir, "documents")
    val got = ImageDedup.qHashNearDup.build(spark, plantedDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val hashes = docs.select(col("doc_id"),
        xxhash64(col("text")).as("h")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // driver replica of the banding + cap + verify + closure
    val buckets = scala.collection.mutable.Map
      .empty[(Int, Long), List[Long]].withDefaultValue(Nil)
    hashes.foreach { case (id, h) =>
      (0 until NearDup.SimBands).foreach { b =>
        buckets((b, (h >> (b * 16)) & 0xffffL)) ::= id
      }
    }
    val hm = hashes.toMap
    val pairs = buckets.values.filter(_.size <= NearDup.MaxBucket)
      .flatMap(ids => for {
        a <- ids; b <- ids
        if a < b &&
          java.lang.Long.bitCount(hm(a) ^ hm(b)) <= NearDup.MaxHamming
      } yield (a, b)).toSet
    val parent = scala.collection.mutable.LongMap.empty[Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
      r
    }
    pairs.toSeq.sorted.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    val expected = hashes.map { case (id, _) => id -> find(id) }.toMap
    assert(pairs.nonEmpty, "planted byte-dups must form verify pairs")
    assert(got == expected,
      "engine clustering diverged from the driver replica")
    assert(got(1L) == 0L && got(2L) == 0L,
      "planted duplicate group must collapse to its min label")
  }
}
