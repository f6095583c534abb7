package graft.io

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Pins [[ParquetStats.columnMax]] — the footer-only column MAX that
  * backs the O(1) incremental watermark lookup — against the scan
  * truth (`df.agg(max)`), per supported type, across multi-file and
  * partitioned layouts, and pins the conservative fallbacks: INT96
  * legacy files, all-NULL columns, and unsupported types must return
  * None (callers scan), never a wrong value. */
class ParquetStatsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def conf = spark.sparkContext.hadoopConfiguration

  private def tmp(): String =
    Files.createTempDirectory("graft-pstats").toString

  private def scanMaxString(dir: String, col: String): Option[String] = {
    val row = spark.read.parquet(dir)
      .agg(max(org.apache.spark.sql.functions.col(col)).cast("string"))
      .head()
    if (row.isNullAt(0)) None else Some(row.getString(0))
  }

  test("timestamp max matches the scan, string-round-trip identical") {
    val dir = tmp()
    spark.range(1000).selectExpr(
        "timestamp'2021-03-04 05:06:07' + make_interval(0,0,0,0,0,0,id) AS ts",
        "id")
      .repartition(4) // multiple files; stats fold across them
      .write.mode("overwrite").parquet(dir)
    val got = ParquetStats.columnMax(conf, new Path(dir), "ts")
    assert(got === scanMaxString(dir, "ts"))
    assert(got.isDefined)
  }

  test("fractional-second timestamps render with micros, like Spark") {
    val dir = tmp()
    Seq("2021-03-04 05:06:07.123456", "2021-03-04 05:06:07.2")
      .toDF("s").selectExpr("cast(s AS timestamp) AS ts")
      .write.mode("overwrite").parquet(dir)
    assert(ParquetStats.columnMax(conf, new Path(dir), "ts") ===
      scanMaxString(dir, "ts"))
  }

  test("date, long, int and string maxima match the scan") {
    val dir = tmp()
    spark.range(500).selectExpr(
        "date'2020-01-01' + cast(id AS int) AS d",
        "id * 1000 AS l",
        "cast(id AS int) - 250 AS i",
        "concat('k', lpad(cast(id AS string), 4, '0')) AS s")
      .repartition(3)
      .write.mode("overwrite").parquet(dir)
    for (c <- Seq("d", "l", "i", "s"))
      assert(ParquetStats.columnMax(conf, new Path(dir), c) ===
        scanMaxString(dir, c), s"column $c")
  }

  test("partitioned layout: the walk covers every partition dir") {
    val dir = tmp()
    spark.range(300).selectExpr("id % 3 AS p", "id AS v")
      .write.mode("overwrite").partitionBy("p").parquet(dir)
    assert(ParquetStats.columnMax(conf, new Path(dir), "v") ===
      Some("299"))
  }

  test("negative and pre-epoch values (floorDiv rendering)") {
    val dir = tmp()
    Seq(-17L, -3L).toDF("v")
      .selectExpr("v", "timestamp'1969-12-31 23:59:58.5' AS ts")
      .write.mode("overwrite").parquet(dir)
    assert(ParquetStats.columnMax(conf, new Path(dir), "v") === Some("-3"))
    assert(ParquetStats.columnMax(conf, new Path(dir), "ts") ===
      scanMaxString(dir, "ts"))
  }

  test("INT96 legacy files yield None (fallback to scan), not a value") {
    val dir = tmp()
    val prior = spark.conf.get("spark.sql.parquet.outputTimestampType")
    spark.conf.set("spark.sql.parquet.outputTimestampType", "INT96")
    try spark.range(10)
      .selectExpr("timestamp'2021-01-01 00:00:00' AS ts")
      .write.mode("overwrite").parquet(dir)
    finally spark.conf.set("spark.sql.parquet.outputTimestampType", prior)
    assert(ParquetStats.columnMax(conf, new Path(dir), "ts") === None)
  }

  test("all-NULL column and missing column yield None") {
    val dir = tmp()
    spark.range(10).selectExpr("cast(null AS timestamp) AS ts", "id")
      .write.mode("overwrite").parquet(dir)
    assert(ParquetStats.columnMax(conf, new Path(dir), "ts") === None)
    assert(ParquetStats.columnMax(conf, new Path(dir), "nope") === None)
  }

  test("unsupported types (double, decimal, nested) yield None") {
    val dir = tmp()
    spark.range(10).selectExpr(
        "cast(id AS double) AS dbl",
        "cast(id AS decimal(10,2)) AS dec",
        "named_struct('a', id) AS st")
      .write.mode("overwrite").parquet(dir)
    for (c <- Seq("dbl", "dec", "st"))
      assert(ParquetStats.columnMax(conf, new Path(dir), c) === None,
        s"column $c")
  }

  test("compare orders time kinds chronologically past 4-digit years") {
    // lexicographic order breaks at year 10000 and for negative years;
    // the kind-aware comparator must not
    assert(ParquetStats.compare("ts",
      "10000-01-01 00:00:00", "9999-12-31 00:00:00") > 0)
    assert(ParquetStats.compare("date", "+10000-01-01", "9999-12-31") > 0)
    assert(ParquetStats.compare("ts",
      "-005-01-01 00:00:00", "0004-01-01 00:00:00") < 0)
    assert(ParquetStats.compare("ts",
      "2024-01-02 03:04:05.2", "2024-01-02 03:04:05.15") > 0)
    assert(ParquetStats.compare("int", "9", "10") < 0)
  }

  test("a NULL-only file among valued files contributes nothing") {
    val dir = tmp()
    spark.range(5).selectExpr("cast(null AS bigint) AS v")
      .write.mode("overwrite").parquet(dir)
    Seq(41L, 7L).toDF("v").write.mode("append").parquet(dir)
    assert(ParquetStats.columnMax(conf, new Path(dir), "v") === Some("41"))
  }

  /** Spark can only write MICROS; NANOS footers need a raw writer. */
  private def writeNanos(dir: String, values: Seq[Long]): Unit = {
    import org.apache.parquet.example.data.simple.SimpleGroupFactory
    import org.apache.parquet.hadoop.example.ExampleParquetWriter
    import org.apache.parquet.hadoop.util.HadoopOutputFile
    import org.apache.parquet.schema.{LogicalTypeAnnotation, Types}
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
    val schema = Types.buildMessage()
      .optional(PrimitiveTypeName.INT64)
      .as(LogicalTypeAnnotation.timestampType(
        true, LogicalTypeAnnotation.TimeUnit.NANOS))
      .named("ts")
      .named("m")
    val w = ExampleParquetWriter
      .builder(HadoopOutputFile.fromPath(
        new Path(dir, s"part-${values.hashCode & 0x7fffffff}.parquet"),
        conf))
      .withType(schema)
      .build()
    try {
      val gf = new SimpleGroupFactory(schema)
      values.foreach { v =>
        val g = gf.newGroup(); g.add("ts", v); w.write(g)
      }
    } finally w.close()
  }

  test("NANOS timestamps floor to micros; never a bare trailing dot") {
    // a sub-microsecond-only fraction used to render "…00:00:00." —
    // which Spark 4's ANSI cast-to-timestamp rejects, killing the
    // watermark gate that consumes the stat — and sub-micro residue
    // must floor away (Spark itself only reads NANOS truncated)
    val d1 = tmp()
    writeNanos(d1, Seq(789L)) // 789 ns: micros remainder is zero
    val got1 = ParquetStats.columnMax(conf, new Path(d1), "ts")
    assert(got1 === Some("1970-01-01 00:00:00"))
    val d2 = tmp()
    writeNanos(d2, Seq(123456789L, 789L)) // max .123456789 → .123456
    val got2 = ParquetStats.columnMax(conf, new Path(d2), "ts")
    assert(got2 === Some("1970-01-01 00:00:00.123456"))
    // both render round-trippable through the ANSI cast
    for (s <- got1.toSeq ++ got2.toSeq)
      assert(!spark.sql(s"SELECT CAST('$s' AS timestamp)")
        .head().isNullAt(0))
  }

  test("unsigned int annotations yield None (signed fold would misrank)") {
    // parquet orders UINT stats unsigned; the signed toString/compare
    // here would rank a UINT64 ≥ 2^63 below every positive value —
    // conservative Unusable, like other non-trivially-renderable types
    import org.apache.parquet.example.data.simple.SimpleGroupFactory
    import org.apache.parquet.hadoop.example.ExampleParquetWriter
    import org.apache.parquet.hadoop.util.HadoopOutputFile
    import org.apache.parquet.schema.{LogicalTypeAnnotation, Types}
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
    val dir = tmp()
    val schema = Types.buildMessage()
      .optional(PrimitiveTypeName.INT64)
      .as(LogicalTypeAnnotation.intType(64, false)) // UINT_64
      .named("u")
      .named("m")
    val w = ExampleParquetWriter
      .builder(HadoopOutputFile.fromPath(
        new Path(dir, "part-0.parquet"), conf))
      .withType(schema).build()
    try {
      val gf = new SimpleGroupFactory(schema)
      Seq(5L, -1L).foreach { v => // -1L bit pattern = 2^64-1 unsigned
        val g = gf.newGroup(); g.add("u", v); w.write(g)
      }
    } finally w.close()
    assert(ParquetStats.columnMax(conf, new Path(dir), "u") === None)
  }

  test("string max folds across files in UTF-8 order, like the scan") {
    // U+FFFD is the largest BMP code unit here (0xFFFD) but U+1F600
    // (surrogate pair 0xD83D 0xDE00) is the larger CODE POINT: UTF-16
    // compareTo picks U+FFFD, parquet/Spark UTF-8 order picks the
    // emoji. One row per file so the cross-file fold decides.
    val dir = tmp()
    Seq("�").toDF("s").write.mode("overwrite").parquet(dir)
    Seq("😀").toDF("s").write.mode("append").parquet(dir)
    assert(ParquetStats.compare("str", "�", "😀") < 0)
    assert(ParquetStats.columnMax(conf, new Path(dir), "s") ===
      scanMaxString(dir, "s"))
    assert(scanMaxString(dir, "s") === Some("😀"))
  }
}
