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

  test("lm perplexity: target-vocab probe scores lower NLL than an " +
      "alien-vocab probe; sub-bigram docs are unscoreable") {
    // Three HIGH-band target docs define the LM from the alpha
    // vocabulary; two LOW probes share length and band — only their
    // vocabulary differs, so per-token NLL isolates LM fit.
    val pattern = (1 to 4).map(i => s"alpha$i")
    val targetText =
      (Seq.fill(10)(pattern).flatten.take(39) :+ "the").mkString(" ")
    val docs = Seq(
      (1L, targetText), (2L, targetText), (3L, targetText),
      (4L, Seq.fill(3)(pattern).flatten.take(9).mkString(" ")),
      (5L, (1 to 9).map(i => s"zeta$i").mkString(" ")),
      (6L, "solo"), (7L, ""))
      .toDF("doc_id", "text")
    val out = NgramOps.perplexityBands(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    // docs 6 (one token) and 7 (empty) have no bigram to score
    assert(out.keySet == Set(1L, 2L, 3L, 4L, 5L))
    assert(out(4L) < out(5L),
      s"alpha probe ${out(4L)} must score below alien probe ${out(5L)}")
    // identical docs score identically; determinism across builds
    assert(out(1L) == out(2L))
    val again = NgramOps.perplexityBands(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(again == out)
  }

  test("stored bigram-bucket counts equal the in-memory pass; q99 " +
      "serves the same bands (artifact discipline)") {
    val d = "/root/testdata/sf0.001"
    val docs = graft.io.Tables.load(spark, d, "documents")
    val stored = NgramOps.bigramBucketCountsStored(spark, d, docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    val fresh = NgramOps.bigramBucketCounts(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(stored == fresh && stored.nonEmpty)
    val q99 = NgramOps.qLmPerplexity.build(spark, d)
      .collect().map(_.toString).toSeq
    val mem = NgramOps.perplexityBands(docs).orderBy("doc_id")
      .collect().map(_.toString).toSeq
    assert(q99 == mem && q99.nonEmpty)
  }

  test("stored doc-gram index equals the in-memory pass; q66 serves " +
      "the same contamination report") {
    val d = "/root/testdata/sf0.001"
    val docs = graft.io.Tables.load(spark, d, "documents")
    val stored = NgramOps.docGramsStored(spark, d, docs)
      .collect().map(r => (r.getLong(0), r.getBoolean(1),
        r.getString(2))).toSet
    val fresh = NgramOps.docGrams(docs)
      .collect().map(r => (r.getLong(0), r.getBoolean(1),
        r.getString(2))).toSet
    assert(stored == fresh && stored.nonEmpty)
    // q66 from the artifact ≡ the original in-memory composition
    val q66 = NgramOps.qContamination.build(spark, d)
      .collect().map(_.toString).toSeq
    val dg = NgramOps.docGrams(docs)
    val eg = dg.filter(col("is_eval")).select("g").distinct()
    val tg = dg.filter(!col("is_eval")).select("doc_id", "g")
    val hits = tg.join(broadcast(eg), "g")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_contaminated"))
    val mem = tg.groupBy("doc_id").agg(count(lit(1)).as("n_grams"))
      .join(hits, "doc_id")
      .select(col("doc_id"), col("n_grams"), col("n_contaminated"),
        graft.ops.Exact.dec4(graft.ops.Exact.halfUpDiv(
          col("n_contaminated") * 10000, col("n_grams")))
          .as("contamination_ratio"))
      .orderBy("doc_id").collect().map(_.toString).toSeq
    assert(q66 == mem && q66.nonEmpty)
  }

  test("lm perplexity tertile bands are value-ordered and partition " +
      "the scored corpus") {
    val rows = NgramOps.qLmPerplexity.build(spark, Dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3),
        r.getString(4)))
    assert(rows.nonEmpty)
    val byBand = rows.groupBy(_._4).view.mapValues(_.map(_._3)).toMap
    assert(byBand.keySet.subsetOf(Set("head", "middle", "tail")))
    assert(byBand.contains("head") && byBand("head").nonEmpty)
    // value-based banding: bands are disjoint score ranges
    for {
      h <- byBand.get("head"); m <- byBand.get("middle")
    } assert(h.max < m.min)
    for {
      m <- byBand.get("middle"); t <- byBand.get("tail")
    } assert(m.max < t.min)
    // head holds at least its tertile share (ties can only grow a band)
    assert(byBand("head").size * 3 >= rows.length)
    // scores are positive per-token micro-nats of a proper LM:
    // every conditional prob < 1 so nllpt > 0
    rows.foreach { case (_, nb, nllpt, _) =>
      assert(nb >= 1); assert(nllpt > 0)
    }
  }

  test("q99 oracle margin guard: no LM grid cell within float noise " +
      "of a quantization boundary at any verify scale factor") {
    // The q99 oracle quantizes per-cell ln-probs with the shared
    // sign/floor formula; Math.log vs DuckDB ln can differ by ~1 ulp
    // (≈1e-9 after the 1e6 scale), so the compare is exact only while
    // every |dd·1e6| fractional part stays clear of 0.5. A testdata
    // regeneration that erodes the margin should fail HERE with a
    // named cause, not as an opaque gate hash mismatch.
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1")) {
      val docs = graft.io.Tables.load(spark, dir, "documents")
      val cbg = NgramOps.bigramBucketCounts(
          docs.filter(TextOps.qualityBand(col("text")) === "HIGH"))
        .groupBy("bp", "bc").agg(sum("n").as("cbg")).collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      val cp = cbg.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
      var minDist = Double.MaxValue
      for (bp <- 0L until 256L; bc <- 0L until 256L) {
        val dd = math.log((cbg.getOrElse((bp, bc), 0L) + 1).toDouble /
          (cp.getOrElse(bp, 0L) + 256))
        val y = math.abs(dd * 1000000d)
        minDist = math.min(minDist, math.abs(y - math.floor(y) - 0.5))
      }
      assert(minDist > 1e-6,
        s"$dir: min boundary distance eroded to $minDist — q99's " +
          "ln quantization is no longer float-robust on this " +
          "testdata; rescale LmBuckets or demote q99 to rows-only")
    }
  }

  test("dup spans: cross-doc and within-doc recurrence, island " +
      "merging of overlapping and adjacent windows") {
    val g1 = (1 to 8).map(i => s"c$i").mkString(" ")
    val g2 = (1 to 8).map(i => s"d$i").mkString(" ")
    val fill = (1 to 5).map(i => s"u$i").mkString(" ")
    val e10 = (1 to 10).map(i => s"e$i").mkString(" ")
    val f8 = (1 to 8).map(i => s"f$i").mkString(" ")
    val docs = Seq(
      (1L, s"$g1 $fill $g2"), // two separated spans via docs 2/3
      (2L, g1),
      (3L, g2),
      (4L, e10), (5L, e10),   // 3 overlapping windows → one span
      (6L, s"$f8 $f8"),       // within-doc repeat, adjacent → merged
      (7L, (1 to 20).map(i => s"v$i").mkString(" "))) // no dups
      .toDF("doc_id", "text")
    // run the q100 pipeline on the planted corpus via a temp dir? —
    // no: drive the same operators directly
    val gr = docs.select(col("doc_id"),
      posexplode(NgramOps.gramLongHashes(TextOps.tokens(col("text")),
        NgramOps.DupSpanK)).as(Seq("pos", "g")))
    val dupG = gr.groupBy("g").agg(count(lit(1)).as("f"))
      .filter(col("f") >= 2).select("g")
    import org.apache.spark.sql.expressions.Window
    val wPrev = Window.partitionBy("doc_id").orderBy("s")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wCum = Window.partitionBy("doc_id").orderBy("s")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val spans = gr.join(dupG, "g")
      .select(col("doc_id"), col("pos").as("s"),
        (col("pos") + NgramOps.DupSpanK).as("e"))
      .withColumn("maxe", max("e").over(wPrev))
      .withColumn("nw",
        when(col("maxe").isNull || col("s") > col("maxe"), 1)
          .otherwise(0))
      .withColumn("grp", sum("nw").over(wCum))
      .groupBy("doc_id", "grp")
      .agg(min("s").as("ss"), max("e").as("se"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(2), r.getInt(3)))
      .toSet
    assert(spans == Set(
      (1L, 0, 8), (1L, 13, 21), // the 5-token gap separates islands
      (2L, 0, 8), (3L, 0, 8),
      (4L, 0, 10), (5L, 0, 10), // windows 0/1/2 merged to one span
      (6L, 0, 16)))             // adjacent repeat merged
  }

  test("dup spans on testdata: spans disjoint with gaps, within doc " +
      "bounds, at least gram-width wide") {
    val spans = NgramOps.qDupSpans.build(spark, Dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3)))
    assert(spans.nonEmpty) // planted near-dup docs share 8-gram runs
    val nTok = graft.io.Tables.load(spark, Dir, "documents")
      .select(col("doc_id"), size(TextOps.tokens(col("text"))).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    spans.foreach { case (doc, s, e, w) =>
      assert(s >= 0 && e <= nTok(doc))
      assert(w == e - s && w >= NgramOps.DupSpanK)
    }
    spans.groupBy(_._1).values.foreach { ds =>
      ds.sortBy(_._2).sliding(2).foreach {
        case Array((_, _, e1, _), (_, s2, _, _)) => assert(s2 > e1)
        case _ =>
      }
    }
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
