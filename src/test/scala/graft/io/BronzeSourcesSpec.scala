package graft.io

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** File-format bronze ingestion: schema-enforced JSON/CSV reads with
  * corrupt-record quarantine, end-to-end into a model build. */
class BronzeSourcesSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private def write(lines: Seq[String], suffix: String): String = {
    val dir = Files.createTempDirectory("graft-bronze")
    val f = dir.resolve(s"feed$suffix")
    Files.write(f, lines.mkString("\n").getBytes("UTF-8"))
    f.toString
  }

  test("readJson: declared schema enforced, poison line quarantined") {
    val good =
      """{"customer_id":"C1","email":"a@x.com","country":"usa",
        |"_cdc_operation":"INSERT",
        |"_cdc_timestamp":"2024-03-15 10:00:00",
        |"_ingested_at":"2024-03-15 10:00:00"}""".stripMargin
        .replace("\n", "")
    val poison = """{"customer_id": NOT VALID JSON"""
    val path = write(Seq(good, poison), ".jsonl")

    val df = BronzeSources.readJson(spark, "customers_cdc", path)
    // schema is the declared one (no inference) + corrupt column
    assert(df.schema.fieldNames.toSet ==
      (BronzeSources.customersCdc.fieldNames :+
        BronzeSources.CorruptCol).toSet)

    val (clean, bad, release) = BronzeSources.quarantine(df)
    val rows = clean.collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getAs[String]("customer_id") == "C1")
    assert(r.getAs[String]("country") == "usa")
    assert(r.getAs[java.sql.Timestamp]("_cdc_timestamp") ==
      java.sql.Timestamp.valueOf("2024-03-15 10:00:00"))
    // undeclared-in-feed columns null-backfill, not fail
    assert(r.getAs[String]("phone") == null)
    // the poison line is quarantined verbatim, not dropped
    assert(bad.collect().map(_.getString(0)).toSeq == Seq(poison))
    release()
  }

  test("readCsv: headered CSV with declared types (positional)") {
    // CSV maps positionally: header + row follow the declared order
    val fields = BronzeSources.customersCdc.fieldNames
    val values = Map(
      "customer_id" -> "C2", "email" -> "b@x.com",
      "country" -> "Canada", "_cdc_operation" -> "INSERT",
      "_cdc_timestamp" -> "2024-03-15 11:00:00")
    val path = write(Seq(
      fields.mkString(","),
      fields.map(f => values.getOrElse(f, "")).mkString(",")), ".csv")
    val (clean, bad, release) = BronzeSources.quarantine(
      BronzeSources.readCsv(spark, "customers_cdc", path))
    val r = clean.collect().head
    assert(r.getAs[String]("customer_id") == "C2")
    assert(r.getAs[String]("country") == "Canada")
    assert(r.getAs[java.sql.Timestamp]("_cdc_timestamp") ==
      java.sql.Timestamp.valueOf("2024-03-15 11:00:00"))
    assert(bad.isEmpty)
    release()
  }
}
