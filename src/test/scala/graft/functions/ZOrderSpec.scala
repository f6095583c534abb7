package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class ZOrderSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("zValue interleaves bits in Morton order") {
    val df = Seq((3L, 1L), (0xFFFFL, 0L), (0L, 0xFFFFL), (0L, 0L))
      .toDF("x", "y")
    val out = df.select(ZOrder.zValue(Seq(col("x"), col("y"))).as("z"))
      .collect().map(_.getLong(0))
    // x=0b11, y=0b01 → y1 x1 y0 x0 = 0 1 1 1 = 7
    assert(out(0) == 7L)
    assert(out(1) == 0x55555555L) // x bits at even positions
    assert(out(2) == 0xAAAAAAAAL) // y bits at odd positions
    assert(out(3) == 0L)
  }

  test("rank16 stays within 16 bits across huge ranges") {
    val lo = 0L
    val hi = 3L * 365 * 86400 * 1000000L // ~3 years of micros
    val df = Seq(lo, hi / 2, hi).toDF("v")
    val ranks = df.select(ZOrder.rank16(col("v"), lo, hi).as("r"))
      .collect().map(_.getLong(0))
    assert(ranks.forall(r => r >= 0 && r <= 65535))
    assert(ranks(0) == 0L && ranks(2) > ranks(1) && ranks(1) > ranks(0))
  }

  test("cluster degrades to a no-op on empty input and all-NULL cols") {
    // Empty incremental batches reach cluster() via partitioned
    // writes; min/max come back NULL and must not NPE.
    val empty = Seq.empty[(Long, Long)].toDF("a", "b")
    assert(ZOrder.cluster(empty, Seq("a", "b")).count() == 0L)
    val allNull = Seq((Option.empty[Long], 1L), (None, 2L)).toDF("a", "b")
    assert(ZOrder.cluster(allNull, Seq("a")).count() == 2L)
  }

  test("z-clustering bounds per-file spans in BOTH dimensions") {
    // uniform 128×128 grid; chunk the clustered order into 16 files
    val grid = (0 until 128).flatMap(x => (0 until 128).map(y =>
      (x.toLong, y.toLong))).toDF("x", "y")
    val nChunks = 16

    def avgSpans(ordered: org.apache.spark.sql.DataFrame)
        : (Double, Double) = {
      val rows = ordered.collect()
      val per = rows.length / nChunks
      val chunks = rows.grouped(per).toSeq.take(nChunks)
      def span(rs: Seq[org.apache.spark.sql.Row], i: Int) = {
        val vs = rs.map(_.getLong(i))
        (vs.max - vs.min).toDouble
      }
      (chunks.map(span(_, 0)).sum / nChunks,
        chunks.map(span(_, 1)).sum / nChunks)
    }

    val (zx, zy) = avgSpans(ZOrder.cluster(grid, Seq("x", "y"))
      .coalesce(1))
    val (lx, ly) = avgSpans(grid.orderBy("x", "y").coalesce(1))

    // lex sort: x-span tiny, y-span = full domain (127). Z-curve: both
    // dimensions bounded — 16 chunks of a 128² grid are 32×64 tiles.
    assert(ly > 120.0, s"lex y-span should be ~full, got $ly")
    assert(zx <= 64.0, s"z x-span $zx")
    assert(zy <= 64.0, s"z y-span $zy")
    assert(math.max(zx, zy) < ly / 1.9)
    assert(lx < 16.0) // sanity: lex is perfect on its prefix column
  }
}
