package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins [[Bench.combinePasses]] — the fold from per-pass bench samples
  * to the one reported per-query number. Two properties matter:
  * the reported time is the minimum over passes (best-of-N treatment
  * of uncorrelated co-tenant spikes), and the -1 failure sentinel
  * DOMINATES: a query that failed in any pass must report failed,
  * never a surviving good sample — a bench run must not look faster
  * (or greener) than a run in which every pass succeeded. */
class BenchCombineSpec extends AnyFunSuite {

  test("minimum over all-green passes") {
    assert(Bench.combinePasses(Seq(3.2, 1.7, 2.9)) === 1.7)
    assert(Bench.combinePasses(Seq(5.0)) === 5.0)
  }

  test("a failure in any pass dominates every good sample") {
    assert(Bench.combinePasses(Seq(0.4, -1.0)) === -1.0)
    assert(Bench.combinePasses(Seq(-1.0, 0.4)) === -1.0)
    assert(Bench.combinePasses(Seq(-1.0, -1.0)) === -1.0)
  }

  test("zero elapsed is a valid (green) sample, not a failure") {
    assert(Bench.combinePasses(Seq(0.0, 2.0)) === 0.0)
  }

  test("default pass count stays >= 2 (driver-window insurance)") {
    // the driver's bare invocation (env unset) must get min-of-N with
    // N >= 2: the r5 adjudication showed a single cold window landing
    // as the round's committed number
    assert(Bench.passCount(None) >= 2)
    assert(Bench.passCount(None) === Bench.DefaultPasses)
  }

  test("explicit pass count parses; garbage and non-positive fall back") {
    assert(Bench.passCount(Some("1")) === 1)
    assert(Bench.passCount(Some("5")) === 5)
    assert(Bench.passCount(Some("0")) === Bench.DefaultPasses)
    assert(Bench.passCount(Some("-3")) === Bench.DefaultPasses)
    assert(Bench.passCount(Some("two")) === Bench.DefaultPasses)
    assert(Bench.passCount(Some("")) === Bench.DefaultPasses)
  }

  test("pass_totals: one entry per pass, successes only, in the tail " +
      "JSON shape") {
    // the per-pass audit trail must live in the tail JSON itself (the
    // driver drops stderr), summing each pass under the headline
    // total's own rule: -1 failure sentinels excluded
    assert(Bench.passTotalsJson(Seq(
      Map("a" -> 1.0, "b" -> 2.0),
      Map("a" -> 1.5, "b" -> -1.0))) === "[3.0,1.5]")
    assert(Bench.passTotalsJson(Seq(Map("a" -> -1.0))) === "[0.0]")
    assert(Bench.passTotalsJson(Nil) === "[]")
  }

  test("cold_builds: one array per pass in the tail JSON shape") {
    // cold-start visibility: which once-per-snapshot artifacts each
    // measured pass had to BUILD (fresh container) vs serve — the
    // field that makes a cold driver window adjudicable from the
    // committed artifact alone
    assert(Bench.coldBuildsJson(Seq(
      Seq("cluster.postings", "index.emb_postings"), Nil)) ===
      """[["cluster.postings","index.emb_postings"],[]]""")
    assert(Bench.coldBuildsJson(Nil) === "[]")
  }

  test("fmtSec: 4-decimal contract-line rendering, sentinel intact") {
    // the stdout contract line rounds per-query seconds to 0.1 ms to
    // stay inside the driver's bounded tail; the -1 failure sentinel
    // must survive as a negative number, and rendering must be
    // locale-independent plain decimal (no exponent, no grouping)
    assert(Bench.fmtSec(0.205408394) === "0.2054")
    assert(Bench.fmtSec(75.0) === "75")
    assert(Bench.fmtSec(0.20001) === "0.2")
    assert(Bench.fmtSec(-1.0) === "-1")
    assert(Bench.fmtSec(0.00004) === "0")          // rounds, never 4E-5
    assert(Bench.fmtSec(123.456789) === "123.4568") // half-up at 0.1 ms
  }

  test("recordValue parses the committed record's headline; garbage " +
      "reads as no-record (monotone quiet-floor policy)") {
    assert(Bench.recordValue(
      """{"metric":"total_detail","value":65.091206425,"unit":"sec"}""")
      .contains(65.091206425))
    assert(Bench.recordValue("not json").isEmpty)
    assert(Bench.recordValue("").isEmpty)
  }

  test("recordCount reads the record's query-surface size; no query " +
      "keys reads as unknown (falls back to the monotone policy)") {
    assert(Bench.recordCount(
      """{"value":65.0,"queries":{"q01_scan_project":0.1,""" +
        """"q115_ann_recall":1.6,"q34_pipeline_e2e":10.5}}""")
      .contains(3))
    // non-query keys never count, even value-like ones
    assert(Bench.recordCount(
      """{"metric":"total_detail","value":65.0,"pass_totals":[1]}""")
      .isEmpty)
    assert(Bench.recordCount("").isEmpty)
    // anchored to the queries OBJECT: a query-name-shaped key in a
    // sibling field (error detail, nested map) must not drift the
    // surface count
    assert(Bench.recordCount(
      """{"errors":{"q99_lm_perplexity":"boom"},""" +
        """"queries":{"q01_scan_project":0.1,"q02_filter_pred":0.2},""" +
        """"extra":{"q03_case_status":"note"}}""")
      .contains(2))
    // a record with no queries object at all reads as unknown even if
    // query-shaped keys appear elsewhere
    assert(Bench.recordCount(
      """{"errors":{"q99_lm_perplexity":"boom"}}""").isEmpty)
  }
}
