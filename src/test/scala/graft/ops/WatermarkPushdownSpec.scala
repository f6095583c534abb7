package graft.ops

import java.nio.file.Files
import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The incremental watermark must physically reach the parquet scan as
  * a pushed filter — that pushdown IS the reference's incremental
  * efficiency (row-group min/max skipping on `_cdc_timestamp`), so it
  * gets a plan-level regression test, not just a value test. */
class WatermarkPushdownSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("watermark literal is pushed into the parquet scan") {
    val dir = Files.createTempDirectory("graft-wm").toString
    (1 to 100).map(i =>
      (i.toLong, Timestamp.valueOf(f"2024-03-${i % 28 + 1}%02d 10:00:00")))
      .toDF("id", "_cdc_timestamp")
      .write.mode("overwrite").parquet(s"$dir/src")
    val source = spark.read.parquet(s"$dir/src")
    val target = Seq(Timestamp.valueOf("2024-03-15 10:00:00"))
      .toDF("last_updated_at")

    val gated = Watermark.newerThan(source, Some(target),
      "_cdc_timestamp", "last_updated_at")
    val plan = gated.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters"), plan)
    assert(plan.contains("GreaterThan(_cdc_timestamp"), plan)
    // and it actually filters
    assert(gated.count() ==
      source.filter($"_cdc_timestamp" >
        Timestamp.valueOf("2024-03-15 10:00:00")).count())

    // the stats-meta path (newerThanStat with a recorded high-water
    // mark) must produce the SAME pushed literal — O(1) lookup, same
    // physical plan
    val statGated = Watermark.newerThanStat(source, Some(target),
      c => if (c == "last_updated_at") Some("2024-03-15 10:00:00")
        else None,
      "_cdc_timestamp", "last_updated_at")
    val statPlan = statGated.queryExecution.executedPlan.toString
    assert(statPlan.contains("PushedFilters"), statPlan)
    assert(statPlan.contains("GreaterThan(_cdc_timestamp"), statPlan)
    assert(statGated.count() == gated.count())
    // absent stats fall back to the scan path with identical results
    assert(Watermark.newerThanStat(source, Some(target), _ => None,
      "_cdc_timestamp", "last_updated_at").count() == gated.count())
  }

  test("highWatermark handles DATE-typed watermark columns") {
    // a DATE column renders "1998-08-02" — no time part, which
    // LocalDateTime.parse rejects; the watermark must read it as
    // midnight (Spark's own date→timestamp cast), not throw
    val df = spark.sql(
      "SELECT * FROM VALUES (date'1998-08-02'), (date'1997-01-05') " +
        "AS t(d)")
    assert(Watermark.highWatermark(df, "d") ===
      Timestamp.valueOf("1998-08-02 00:00:00"))
    assert(Watermark.highWatermark(df, "d", shiftDays = 2) ===
      Timestamp.valueOf("1998-07-31 00:00:00"))
    // timestamp columns keep their exact behavior
    val ts = spark.sql(
      "SELECT * FROM VALUES (timestamp'2024-03-15 10:11:12.5') AS t(x)")
    assert(Watermark.highWatermark(ts, "x") ===
      Timestamp.valueOf("2024-03-15 10:11:12.5"))
  }
}
