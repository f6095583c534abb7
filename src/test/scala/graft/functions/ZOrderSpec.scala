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

  test("cluster accepts TIMESTAMP_NTZ keys (micros path, not cast)") {
    // events.ts arrives as TIMESTAMP_NTZ since the testdata regen;
    // the typeName gate used to let NTZ fall through to the numeric
    // cast("long") arm, which throws under ANSI. NTZ must cluster in
    // time order like LTZ does.
    val df = Seq("2021-01-03T00:00:00", "2021-01-01T00:00:00",
        "2021-01-02T00:00:00")
      .toDF("s")
      .select(col("s").cast("timestamp_ntz").as("ts"),
        monotonically_increasing_id().as("id"))
    val out = ZOrder.cluster(df, Seq("ts")).coalesce(1)
      .collect().map(_.getAs[java.time.LocalDateTime]("ts"))
    assert(out.length == 3)
    assert(out.sliding(2).forall(p => !p(0).isAfter(p(1))),
      s"NTZ keys should come out time-ordered: ${out.mkString(", ")}")
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

  test("z-clustered files let min/max pruning skip most of the scan " +
      "for a selective predicate on a NON-PREFIX key") {
    // The ZORDER claim (reference orders_cleaned.sql:15 post-hook) is
    // about the READ side: parquet row-group/file skipping consults
    // per-file min/max stats, so the number of files whose [min,max]
    // envelope intersects the predicate IS the scan cost a pruning
    // reader pays. Structural assertion on that count — not wall time.
    val dir = java.nio.file.Files.createTempDirectory("graft-zskip")
    val grid = (0 until 256).flatMap(x => (0 until 256).map(y =>
      (x.toLong, y.toLong))).toDF("x", "y")
    // cluster() range-partitions on the interleaved value into the
    // session's shuffle-partition count — pin it (and switch off AQE
    // partition coalescing, which would merge this small fixture into
    // one file) so both layouts land a comparable file count
    val nFiles = 16
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    val prevCoalesce = spark.conf
      .get("spark.sql.adaptive.coalescePartitions.enabled", "true")
    spark.conf.set("spark.sql.shuffle.partitions", nFiles.toString)
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try {
      ZOrder.cluster(grid, Seq("x", "y")).write.parquet(s"$dir/z")
      // honest baseline: same file count, lex-sorted (x then y) — the
      // store's default layout this op replaces
      grid.repartitionByRange(nFiles, col("x"))
        .sortWithinPartitions("x", "y").write.parquet(s"$dir/lex")
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", prevParts)
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled",
        prevCoalesce)
    }

    // per-file envelopes of the NON-prefix key y (what footer stats
    // record), then count files a pruning reader must open for a
    // y-window covering ~6% of the domain
    def mustScan(path: String): (Long, Long) = {
      val stats = spark.read.parquet(path)
        .groupBy(input_file_name().as("f"))
        .agg(min("y").as("lo"), max("y").as("hi"))
      (stats.filter(col("hi") >= 100L && col("lo") <= 115L).count(),
        stats.count())
    }
    val (zScan, zTotal) = mustScan(s"$dir/z")
    val (lexScan, lexTotal) = mustScan(s"$dir/lex")
    assert(zTotal >= nFiles - 1 && lexTotal >= nFiles - 1,
      s"layouts produced $zTotal/$lexTotal files, wanted ~$nFiles")
    // lex: every file spans the full y domain → no skipping at all
    assert(lexScan == lexTotal, s"lex should scan all, got $lexScan")
    // z-order: the y-window touches only the curve cells it crosses
    assert(zScan * 2 <= zTotal,
      s"z-order should skip ≥ half the files, scans $zScan of $zTotal")

    // and Spark actually ships the predicate to the scan: pushdown is
    // what turns those envelopes into skipped row-groups at read time
    val plan = spark.read.parquet(s"$dir/z")
      .filter(col("y") >= 100L && col("y") <= 115L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.contains("GreaterThanOrEqual(y,100)"), plan.take(500))
  }
}
