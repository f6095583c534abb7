package graft.analytics

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class NgramOpsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val Dir = "/root/testdata/sf0.001"
  import spark.implicits._

  test("gramHashes windows correctly and guards short docs") {
    val df = Seq("a b c d", "a b", "").toDF("text")
      .select(NgramOps.gramHashes(TextOps.tokens(col("text")), 3).as("g"))
    val sizes = df.select(size(col("g"))).collect().map(_.getInt(0))
    // 4 tokens → 2 trigrams; 2 tokens → none; "" → 1 token → none
    assert(sizes.toSeq == Seq(2, 0, 0))
    // identical windows hash identically across docs
    val h1 = Seq("x y z w").toDF("text")
      .select(explode(NgramOps.gramHashes(TextOps.tokens(col("text")), 3)))
      .collect().map(_.getString(0))
    val h2 = Seq("q x y z").toDF("text")
      .select(explode(NgramOps.gramHashes(TextOps.tokens(col("text")), 3)))
      .collect().map(_.getString(0))
    assert(h1.head == h2.last) // shared window "x y z"
  }

  test("chunkHashes is non-overlapping and drops the partial tail") {
    val toks = TextOps.tokens(col("text"))
    val n = Seq(("a " * 35).trim).toDF("text")
      .select(size(NgramOps.chunkHashes(toks, 16))).collect()(0).getInt(0)
    assert(n == 2) // 35 words → 2 full 16-word chunks, 3-word tail dropped
    val short = Seq("a b c").toDF("text")
      .select(size(NgramOps.chunkHashes(toks, 16))).collect()(0).getInt(0)
    assert(short == 0)
  }

  test("contamination flags a planted eval-overlapping doc") {
    val rows = NgramOps.qContamination.build(spark, Dir).collect()
    // planted near-dup replicas guarantee eval/train overlap at sf0.001
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nGrams, nHit) = (r.getLong(1), r.getLong(2))
      assert(nHit >= 1 && nHit <= nGrams)
      val ratio = new java.math.BigDecimal(r.getString(3))
      assert(ratio.signum > 0 &&
        ratio.compareTo(new java.math.BigDecimal("1.0001")) < 0)
    }
    // deterministic: same rows on rerun (hash split is a pure function)
    val again = NgramOps.qContamination.build(spark, Dir).collect()
    assert(rows.toSeq == again.toSeq)
  }

  test("chunk dedup counts bound by totals and finds planted dups") {
    val rows = NgramOps.qChunkDedup.build(spark, Dir).collect()
    assert(rows.nonEmpty) // planted duplicate docs share full chunks
    rows.foreach { r =>
      assert(r.getLong(2) >= 1 && r.getLong(2) <= r.getLong(1))
    }
  }

  test("contamination plan broadcasts the eval gram set") {
    val plan = NgramOps.qContamination.build(spark, Dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastExchange"))
    // the probe join must not be a sort-merge join on gram strings
    assert(!plan.contains("SortMergeJoin"))
  }

  test("bigram LM: totals consistent and rare ratio in [0,1]") {
    val rows = NgramOps.qBigramLm.build(spark, Dir).collect()
    val docs = graft.io.Tables.load(spark, Dir, "documents").count()
    assert(rows.length == docs) // every doc has ≥ 2 tokens in testdata
    rows.foreach { r =>
      val (n, totalF, nRare) = (r.getLong(1), r.getLong(2), r.getLong(4))
      assert(totalF >= n) // every bigram has corpus frequency ≥ 1 (itself)
      assert(nRare <= n)
    }
    // a doc's own bigrams contribute to cf: mean_f ≥ 1
    rows.foreach { r =>
      assert(new java.math.BigDecimal(r.getString(3))
        .compareTo(java.math.BigDecimal.ONE) >= 0)
    }
  }
}
