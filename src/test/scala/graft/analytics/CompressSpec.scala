package graft.analytics

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class CompressSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("ratio orders repetitive < prose < random") {
    val docs = Seq(
      (1L, "spam " * 200),                                   // repetitive
      (2L, ("the quick brown fox jumps over the lazy dog " +
        "while seventeen jubilant zebras quietly observed ") * 10),
      (3L, scala.util.Random.javaRandomToRandom(
        new java.util.Random(42)).alphanumeric.take(1000).mkString)
    ).toDF("doc_id", "text")
    val r = Compress.withDeflateSizes(docs)
      .select(col("doc_id"),
        graft.ops.Exact.halfUpDiv(
          col("n_deflated") * 10000, col("n_bytes")).as("r"))
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r(1L) < r(2L) && r(2L) < r(3L), s"ratios $r")
  }

  test("deterministic across runs and row order; sizes positive") {
    val a = Compress.qCompressRatio.build(spark, "/root/testdata/sf0.001")
      .collect()
    val b = Compress.qCompressRatio.build(spark, "/root/testdata/sf0.001")
      .collect()
    assert(a.toSeq == b.toSeq && a.nonEmpty)
    a.foreach { row =>
      // (doc_id, n_deflated, deflate_ratio-as-dec4-string)
      assert(row.getLong(1) > 0 && row.getString(2).nonEmpty)
    }
  }

  test("relational half (q111) matches octet_length over the text") {
    val out = Compress.qCompressMeta
      .build(spark, "/root/testdata/sf0.001").collect()
    val expect = graft.io.Tables
      .load(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"),
        octet_length(encode(col("text"), "UTF-8")).cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getLong(1) == expect(r.getLong(0)))
      assert(r.getLong(2) == r.getLong(1) / 1024)
    }
  }
}
