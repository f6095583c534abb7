package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.TestSpark

/** The XXH64 formula behind [[DuckHash]]'s DuckDB replica, validated
  * against Spark's own `xxhash64` — a drift here (wrong prime, wrong
  * rotation, wrong seed constant) would silently change the q32/q80
  * train sample and fail the oracle gate with an opaque hash
  * mismatch. The SQL RENDERING of the same formula is exercised by
  * the driver's DuckDB gate itself (q32/q80/q91 oracles, validated at
  * sf0.001 / sf0.01 / ≈sf1). */
class DuckHashSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  // the reference formula: XXH64 of one 8-byte little-endian lane,
  // seed 42 (Spark's default), in wrapping unsigned 64-bit arithmetic
  private def xxh64Long(v: Long): Long = {
    val P1 = 0x9E3779B185EBCA87L; val P2 = 0xC2B2AE3D27D4EB4FL
    val P3 = 0x165667B19E3779F9L; val P4 = 0x85EBCA77C2B2AE63L
    val P5 = 0x27D4EB2F165667C5L
    def rotl(x: Long, r: Int): Long = (x << r) | (x >>> (64 - r))
    var h = 42L + P5 + 8L
    var k1 = v * P2; k1 = rotl(k1, 31); k1 *= P1
    h ^= k1
    h = rotl(h, 27) * P1 + P4
    h ^= h >>> 33; h *= P2; h ^= h >>> 29; h *= P3; h ^= h >>> 32
    h
  }

  test("formula matches Spark xxhash64 on edges and a dense range") {
    val edges = Seq(0L, 1L, -1L, 2L, 3L, 7L, 42L, -42L, 999L,
      123456789L, Long.MaxValue, Long.MinValue, Long.MaxValue - 1,
      Long.MinValue + 1)
    val dense = (0L until 2048L) ++ (0L until 64L).map(i => 1L << i)
    val vals = (edges ++ dense).distinct
    val fromSpark = vals.toDF("x")
      .select(col("x"), xxhash64(col("x")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    vals.foreach { v =>
      assert(fromSpark(v) == xxh64Long(v),
        s"xxhash64($v): spark=${fromSpark(v)} formula=${xxh64Long(v)}")
    }
  }
}
