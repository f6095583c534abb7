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
  }
}
