package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.TestSpark

/** The full variable-length XXH64 formula behind [[DuckHash.strChain]]
  * / [[DuckHash.longChainSeeded]], validated against Spark's own
  * `xxhash64` — stripes (≥32 bytes), 8/4/1-byte tails, seed chaining
  * through int and long lanes, multi-byte UTF-8. A drift here (wrong
  * stripe merge, wrong tail order, wrong lane width) would silently
  * change every q25/q26/q38 oracle hash and fail the driver gate with
  * an opaque mismatch. The SQL RENDERING of the same formula is
  * exercised by the driver's DuckDB gate itself (q25/q26/q38 oracles,
  * validated at sf0.001 and sf0.01). */
class DuckStrHashSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val P1 = 0x9E3779B185EBCA87L; private val P2 = 0xC2B2AE3D27D4EB4FL
  private val P3 = 0x165667B19E3779F9L; private val P4 = 0x85EBCA77C2B2AE63L
  private val P5 = 0x27D4EB2F165667C5L

  private def rotl(x: Long, r: Int): Long = (x << r) | (x >>> (64 - r))
  private def fmix(h0: Long): Long = {
    var h = h0
    h ^= h >>> 33; h *= P2; h ^= h >>> 29; h *= P3; h ^= h >>> 32
    h
  }
  private def round(acc: Long, w: Long): Long = rotl(acc + w * P2, 31) * P1

  /** XXH64 over a byte run — the formula strChain renders in SQL. */
  private def xxh64Bytes(b: Array[Byte], seed: Long): Long = {
    def w8(off: Int): Long =
      (0 until 8).map(i => (b(off + i).toLong & 0xffL) << (8 * i))
        .reduce(_ | _)
    val n = b.length
    var off = 0
    var h =
      if (n >= 32) {
        var v1 = seed + P1 + P2; var v2 = seed + P2
        var v3 = seed; var v4 = seed - P1
        while (off <= n - 32) {
          v1 = round(v1, w8(off)); v2 = round(v2, w8(off + 8))
          v3 = round(v3, w8(off + 16)); v4 = round(v4, w8(off + 24))
          off += 32
        }
        var m = rotl(v1, 1) + rotl(v2, 7) + rotl(v3, 12) + rotl(v4, 18)
        Seq(v1, v2, v3, v4).foreach { v => m = (m ^ round(0, v)) * P1 + P4 }
        m
      } else seed + P5
    h += n
    while (off <= n - 8) {
      h = rotl(h ^ round(0, w8(off)), 27) * P1 + P4; off += 8
    }
    if (off + 4 <= n) {
      val w4 = (0 until 4).map(i => (b(off + i).toLong & 0xffL) << (8 * i))
        .reduce(_ | _)
      h = rotl(h ^ w4 * P1, 23) * P2 + P3; off += 4
    }
    while (off < n) {
      h = rotl(h ^ (b(off).toLong & 0xffL) * P5, 11) * P1; off += 1
    }
    fmix(h)
  }

  private def xxh64LongSeeded(v: Long, seed: Long): Long =
    fmix(rotl((seed + P5 + 8L) ^ (rotl(v * P2, 31) * P1), 27) * P1 + P4)

  private val edges = Seq("", "a", "ab", "abc", "abcd", "abcde",
    "abcdefg", "abcdefgh", "abcdefghi", "hello world foo",
    "x" * 31, "y" * 32, "z" * 33, "w" * 40, "q" * 63, "r" * 64,
    "s" * 65, "t" * 100, "café naïve 中文",
    "the quick brown fox jumps over the lazy dog again and again")

  test("string formula matches Spark xxhash64 across length classes") {
    val got = edges.toDF("s")
      .select(col("s"), xxhash64(col("s")).as("h"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    edges.foreach { s =>
      val want = xxh64Bytes(s.getBytes("UTF-8"), 42L)
      assert(got(s) == want, s"xxhash64('$s'): spark=${got(s)} formula=$want")
    }
  }

  test("chained int-lane + string seeding matches Spark (the minhash base)") {
    val got = edges.toDF("s")
      .select(col("s"), xxhash64(lit(7), col("s")).as("h"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    edges.foreach { s =>
      val want = xxh64Bytes(s.getBytes("UTF-8"), DuckHash.intLaneConst(7))
      assert(got(s) == want, s"xxhash64(7, '$s') drift")
    }
  }

  test("chained long-lane seeding matches Spark (the rolling-fp step)") {
    val accs = Seq(0L, 5L, -1L, Long.MinValue, Long.MaxValue, 42L)
    val got = accs.flatMap(a => edges.map(s => (a, s))).toDF("acc", "s")
      .select(col("acc"), col("s"), xxhash64(col("acc"), col("s")).as("h"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2))
      .toMap
    accs.foreach { a =>
      edges.foreach { s =>
        val want = xxh64Bytes(s.getBytes("UTF-8"), xxh64LongSeeded(a, 42L))
        assert(got((a, s)) == want, s"xxhash64($a, '$s') drift")
      }
    }
  }

  test("string formula matches Spark on a seeded random sweep " +
    "(every length residue, multibyte, long tails)") {
    // deterministic pseudo-random corpus: every length 0..96 plus a
    // long tail, mixed ASCII / 2-byte / 3-byte code points — exercises
    // every (stripes × 8-byte × 4-byte × 1-byte) tail combination the
    // fixed edge list can't enumerate
    val rnd = new scala.util.Random(0xD5EADBEEFL)
    val alphabet = ('a' to 'z') ++ ('0' to '9') ++ "éüßñ中文日λπΩ"
    val cases = (0 to 96).map { n =>
      (0 until n).map(_ => alphabet(rnd.nextInt(alphabet.length)))
        .mkString
    } ++ (1 to 40).map { _ =>
      val n = 97 + rnd.nextInt(160)
      (0 until n).map(_ => alphabet(rnd.nextInt(alphabet.length)))
        .mkString
    }
    val got = cases.toDF("s")
      .select(col("s"), xxhash64(col("s")).as("h0"),
        xxhash64(lit(3), col("s")).as("h1"),
        xxhash64(lit(-7L), col("s")).as("h2"))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3))).toMap
    cases.foreach { s =>
      val b = s.getBytes("UTF-8")
      assert(got(s)._1 == xxh64Bytes(b, 42L), s"plain len=${b.length}")
      assert(got(s)._2 ==
        xxh64Bytes(b, DuckHash.intLaneConst(3)), s"int-seed len=${b.length}")
      assert(got(s)._3 ==
        xxh64Bytes(b, xxh64LongSeeded(-7L, 42L)), s"long-seed len=${b.length}")
    }
  }

  test("intLaneConst delegates to Spark's own int lane") {
    val got = (0 until 32).toDF("k")
      .select(col("k"), xxhash64(col("k")).as("h"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    (0 until 32).foreach { k =>
      assert(DuckHash.intLaneConst(k) == got(k), s"int lane $k drift")
    }
  }
}
