package graft.analytics

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.TestSpark

/** Rolling-hash fingerprint semantics: order sensitivity, prefix
  * stability, determinism. */
class TextOpsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def fp(texts: String*): Seq[Long] =
    texts.toSeq.toDF("text")
      .select(TextOps.rollingHash(TextOps.tokens(col("text"))))
      .collect().map(_.getLong(0)).toSeq

  test("order-sensitive: permuted tokens hash differently") {
    val Seq(ab, ba) = fp("alpha beta", "beta alpha")
    assert(ab != ba)
  }

  test("deterministic and content-sensitive") {
    val Seq(a1, a2, b) = fp("x y z", "x y z", "x y w")
    assert(a1 == a2)
    assert(a1 != b)
  }

  test("prefix fingerprints of shared prefixes collide") {
    val docs = Seq("p q r s extra tokens here", "p q r s different tail")
      .toDF("text")
      .select(TextOps.rollingHash(
        slice(TextOps.tokens(col("text")), 1, 4)).as("pfp"))
      .collect().map(_.getLong(0))
    assert(docs(0) == docs(1))
  }

  test("scrubPii redacts emails, ids and phones, leaves clean text alone") {
    val out = Seq(
      (1L, "contact ada.lovelace@example.com or 212-555-0101 today"),
      (2L, "no pii here at all"),
      // the unified pattern set: mixed-case email, SSN-shaped id
      // (redacted as <ID>, not half-eaten by the phone pattern)
      (3L, "Upper.Case@Example.COM wrote 123-45-6789 down"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), TextOps.scrubPii(col("text")).as("clean"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "contact <EMAIL> or <PHONE> today")
    assert(out(2L) == "no pii here at all")
    assert(out(3L) == "<EMAIL> wrote <ID> down")
  }

  test("repetition metrics flag degenerate docs") {
    val repetitive = ("spam " * 40).trim          // 40 tokens, 1 distinct
    val varied = (1 to 40).map(i => s"w$i").mkString(" ")
    val rows = Seq((1L, repetitive), (2L, varied))
      .toDF("doc_id", "text")
      .select(col("doc_id"),
        size(array_distinct(TextOps.tokens(col("text")))).as("nd"),
        (size(array_distinct(TextOps.tokens(col("text")))).cast("long")
          * 4 < size(TextOps.tokens(col("text"))).cast("long"))
          .as("is_repetitive"))
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getBoolean(2))).toMap
    assert(rows(1L) == (1, true))
    assert(rows(2L) == (40, false))
  }
}
