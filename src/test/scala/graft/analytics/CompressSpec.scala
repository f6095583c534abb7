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
      assert(row.getLong(1) > 0 && row.getLong(2) > 0)
    }
  }
}
