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

  test("dsirWeights: target-like tokens out-weigh raw-only tokens; " +
      "every doc is scored") {
    // doc 1 is the only HIGH-band (target) doc, built from the alpha
    // vocabulary; doc 2 is a LOW beta-vocab doc. The two probes share
    // a band (both LOW) and a length — only their vocabulary differs,
    // so the weight ordering isolates the importance contrast.
    val aWords = (1 to 45).map(i => s"alpha$i")
    val bWords = (1 to 45).map(i => s"beta$i")
    val docs = Seq(
      (1L, (aWords.take(39) :+ "the").mkString(" ")),  // 40 w + stop → HIGH
      (2L, bWords.take(12).mkString(" ")),
      (3L, aWords.take(8).mkString(" ")),              // alpha probe
      (4L, bWords.take(8).mkString(" ")))              // beta probe
      .toDF("doc_id", "text")
    val w = TextOps.dsirWeights(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(w.keySet == Set(1L, 2L, 3L, 4L))
    assert(w(3L) > w(4L),
      s"alpha probe ${w(3L)} must out-weigh beta probe ${w(4L)}")
    // determinism: exact integer weights reproduce bit-for-bit
    val again = TextOps.dsirWeights(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(again == w)
  }

  test("q97 oracle margin guard: no per-bucket log-ratio within float " +
      "noise of a quantization boundary at either verify scale factor") {
    // The q97 oracle quantizes ln-ratio doubles with the shared
    // sign/floor formula; the engine's Math.log and DuckDB's ln can
    // differ by ~1 ulp (≈1e-9 after the 1e6 scale), so the compare is
    // exact only while every |dd·1e6| fractional part stays clear of
    // the 0.5 boundary. A testdata regeneration that erodes the margin
    // should fail HERE with a named cause, not as an opaque hash
    // mismatch in the gate.
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val docs = graft.io.Tables.load(spark, dir, "documents")
      val tok = docs
        .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("w"))
        .withColumn("b", pmod(xxhash64(col("w")), lit(256L)))
      val db = tok.groupBy("doc_id", "b").agg(count(lit(1)).as("n"))
      val r = db.groupBy("b").agg(sum("n")).collect()
        .map(x => x.getLong(0) -> x.getLong(1)).toMap
      val t = db.join(docs.filter(
          TextOps.qualityBand(col("text")) === "HIGH").select("doc_id"),
          "doc_id")
        .groupBy("b").agg(sum("n")).collect()
        .map(x => x.getLong(0) -> x.getLong(1)).toMap
      val rTot = r.values.sum; val tTot = t.values.sum
      var minDist = Double.MaxValue
      for (b <- 0L until 256L) {
        val dd =
          math.log((t.getOrElse(b, 0L) + 1).toDouble / (tTot + 256)) -
          math.log((r.getOrElse(b, 0L) + 1).toDouble / (rTot + 256))
        val y = math.abs(dd * 1000000d)
        minDist = math.min(minDist, math.abs(y - math.floor(y) - 0.5))
      }
      assert(minDist > 1e-6,
        s"$dir: min boundary distance eroded to $minDist — q97's " +
          "ln-ratio quantization is no longer float-robust on this " +
          "testdata; rescale DsirBuckets or demote q97 to rows-only")
    }
  }

  private def lnq(k: Long): Long =
    math.floor(math.abs(math.log(k.toDouble) * 1000000d) + 0.5).toLong *
      (if (math.log(k.toDouble) < 0) -1 else 1)

  test("token entropy: zero for single-term docs, ln(n) for all-distinct " +
      "docs, exact closed forms in between") {
    val docs = Seq(
      (1L, "x x x x"),     // one term repeated: H = 0
      (2L, "a b c d"),     // uniform distinct: H = ln 4
      (3L, "a a b b"),     // H = ln 4 − ln 2 = ln 2
      (4L, "solo"),        // n = 1: H = 0
      (5L, ""))            // split('') = [''] → n = 1, H = 0
      .toDF("doc_id", "text")
    val out = TextOps.qTokenEntropy
      .build(spark, "/root/testdata/sf0.001") // schema contract only;
    // semantics are checked on a planted frame through the same body:
    val got = run(docs).map(r =>
      r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got(1L) == ((4L, 1L, 0L)))
    assert(got(2L) == ((4L, 4L, lnq(4))))
    // Σ c·lnq(c) = 4·lnq(2); halfUpDiv(4·693147, 4) = 693147
    assert(got(3L) == ((4L, 2L, lnq(4) - lnq(2))))
    assert(got(4L) == ((1L, 1L, 0L)))
    assert(got(5L) == ((1L, 1L, 0L)))
    assert(out.columns.toSeq ==
      Seq("doc_id", "n_tokens", "n_distinct", "entropy_q"))
  }

  /** Drive the q102 operator body over a planted frame. */
  private def run(docs: org.apache.spark.sql.DataFrame) = {
    import graft.ops.Exact
    def lq(x: org.apache.spark.sql.Column) = {
      val dd = log(x.cast("double"))
      (signum(dd) * floor(abs(dd * 1000000d) + 0.5)).cast("long")
    }
    docs.select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("w"))
      .groupBy(col("doc_id"), xxhash64(col("w")).as("wf"))
      .agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(sum("c").as("n_tokens"), count(lit(1)).as("n_distinct"),
        sum(col("c") * lq(col("c"))).as("s_q"))
      .select(col("doc_id"), col("n_tokens"), col("n_distinct"),
        (lq(col("n_tokens")) -
          Exact.halfUpDiv(col("s_q"), col("n_tokens"))).as("entropy_q"))
      .collect()
  }

  test("q102 oracle margin guard: no observed ln(count) within float " +
      "noise of a quantization boundary at any verify scale factor") {
    // Math.log vs DuckDB ln can differ by ~1 ulp; the q102 compare is
    // exact only while |ln(k)·1e6| stays clear of the 0.5 boundary for
    // every OBSERVED per-doc term count k and token total n. A testdata
    // regeneration that erodes the margin should fail here by name.
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1")) {
      val tc = graft.io.Tables.load(spark, dir, "documents")
        .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("w"))
        .groupBy("doc_id", "w").agg(count(lit(1)).as("c"))
      val ks = tc.select(col("c")).distinct()
        .union(tc.groupBy("doc_id").agg(sum("c")).select(col("sum(c)")))
        .distinct().collect().map(_.getLong(0))
      var minDist = Double.MaxValue
      for (k <- ks; if k > 1) {
        val y = math.abs(math.log(k.toDouble) * 1000000d)
        minDist = math.min(minDist, math.abs(y - math.floor(y) - 0.5))
      }
      assert(minDist > 1e-6,
        s"$dir: min boundary distance eroded to $minDist — q102's " +
          "ln quantization is no longer float-robust on this testdata")
    }
  }
}
