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
}
