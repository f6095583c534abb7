package graft.pipeline

import java.nio.file.Files
import java.sql.{Date, Timestamp}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.io.ModelStore
import graft.model.{Pipeline, RunMode}

/** Surgical partition backfill: full-refresh semantics, selected
  * partitions only; untouched partition dirs carry over untouched. */
class BackfillSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val clock = Clock(
    Date.valueOf("2024-04-01"), Timestamp.valueOf("2024-04-01 00:00:00"))
  private val models = new ReferenceModels(clock)

  test("backfill rewrites only the selected month; repairs its content") {
    val store = new ModelStore(
      Files.createTempDirectory("graft-backfill").toString)
    def pipeline(orders: org.apache.spark.sql.DataFrame) =
      new Pipeline(models.all, store,
        (_, name) => name match {
          case "customers_cdc" => CdcFixtures.customersBatch1()
          case "orders_cdc" => orders
        },
        vars = Map("ingest_batch_date" -> "1900-01-01"))

    pipeline(CdcFixtures.ordersBatch1()).run(spark, RunMode.Bootstrap)
    val v1 = store.currentVersion(spark, "silver", "orders_cleaned")
    val before = store.read(spark, "silver", "orders_cleaned").get
      .collect().map(r => r.getString(r.fieldIndex("order_id")) ->
        r.getDouble(r.fieldIndex("order_total"))).toMap

    // source correction lands for the November order (O5) only
    val corrected = CdcFixtures.ordersBatch1()
      .withColumn("order_total",
        when(col("order_id") === "O5", 120.0)
          .otherwise(col("order_total")))
    val after = pipeline(corrected)
      .backfill(spark, "orders_cleaned",
        col("order_year") === 2024 && col("order_month") === 11)
      .collect().map(r => r.getString(r.fieldIndex("order_id")) ->
        r.getDouble(r.fieldIndex("order_total"))).toMap

    // November order repaired; every other order untouched
    assert(after("O5") == 120.0 && before("O5") != 120.0)
    assert((after - "O5") == (before - "O5"))

    // file-level: the untouched March partition carried over by link
    // (identical part-file names across versions), November did not
    val v2 = store.currentVersion(spark, "silver", "orders_cleaned")
    assert(v2 == v1 + 1)
    def partFiles(v: Int, month: Int): Set[String] = {
      val dir = new java.io.File(
        store.versionDir("silver", "orders_cleaned", v) +
          s"/order_year=2024/order_month=$month")
      dir.listFiles().filter(_.getName.startsWith("part-"))
        .map(_.getName).toSet
    }
    assert(partFiles(v2, 3) == partFiles(v1, 3))
    assert(partFiles(v2, 11) != partFiles(v1, 11))
  }

  test("backfill refuses unpartitioned models") {
    val store = new ModelStore(
      Files.createTempDirectory("graft-backfill2").toString)
    val p = new Pipeline(models.all, store,
      (_, name) => name match {
        case "customers_cdc" => CdcFixtures.customersBatch1()
        case "orders_cdc" => CdcFixtures.ordersBatch1()
      },
      vars = Map("ingest_batch_date" -> "1900-01-01"))
    p.run(spark, RunMode.Bootstrap)
    // customers_latest is unpartitioned in the reference
    intercept[IllegalArgumentException] {
      p.backfill(spark, "customers_latest", lit(true))
    }
  }

  test("backfill EMPTIES a selected partition whose rebuild yields no " +
      "rows — an upstream purge must not resurrect via carry-over") {
    val store = new ModelStore(
      Files.createTempDirectory("graft-backfill3").toString)
    def pipeline(orders: org.apache.spark.sql.DataFrame) =
      new Pipeline(models.all, store,
        (_, name) => name match {
          case "customers_cdc" => CdcFixtures.customersBatch1()
          case "orders_cdc" => orders
        },
        vars = Map("ingest_batch_date" -> "1900-01-01"))
    pipeline(CdcFixtures.ordersBatch1()).run(spark, RunMode.Bootstrap)
    val before = store.read(spark, "silver", "orders_cleaned").get
    assert(before.filter(col("order_month") === 11).count() > 0)
    val otherIds = before.filter(col("order_month") =!= 11)
      .collect().map(r => r.getString(r.fieldIndex("order_id"))).toSet

    // upstream purged the November order (O5) entirely
    val purged = CdcFixtures.ordersBatch1()
      .filter(col("order_id") =!= "O5")
    val after = pipeline(purged).backfill(spark, "orders_cleaned",
      col("order_year") === 2024 && col("order_month") === 11)

    assert(after.filter(col("order_month") === 11).count() == 0)
    assert(after.filter(col("order_month") =!= 11)
      .collect().map(r => r.getString(r.fieldIndex("order_id")))
      .toSet == otherIds)
    // the partition dir itself is gone from the new version
    val v = store.currentVersion(spark, "silver", "orders_cleaned")
    val novDir = new java.io.File(
      store.versionDir("silver", "orders_cleaned", v) +
        "/order_year=2024/order_month=11")
    assert(!novDir.exists())
  }
}
