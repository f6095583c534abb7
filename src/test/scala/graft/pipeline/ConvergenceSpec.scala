package graft.pipeline

import java.nio.file.Files
import java.sql.{Date, Timestamp}

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.io.ModelStore
import graft.model.{Pipeline, RunMode}

/** Merge-convergence property (SURVEY.md §5.3b): for inputs with no
  * late rows, bootstrap(batch1) + incremental(batch2) must equal one
  * full refresh over batch1 ∪ batch2 — on every column except
  * `first_seen_at` (and dim's `created_at` derived from it), which by
  * the reference's own rule depends on run boundaries: a full refresh
  * assigns the latest version's timestamp, while incremental preserves
  * the value first materialized (`customers_latest.sql:123–140`). */
class ConvergenceSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val clock = Clock(
    Date.valueOf("2024-04-01"), Timestamp.valueOf("2024-04-01 00:00:00"))
  private val models = new ReferenceModels(clock)

  private def run(paths: String, batches: Map[String, DataFrame],
      incr: Option[Map[String, DataFrame]]): Map[String, DataFrame] = {
    val store = new ModelStore(
      Files.createTempDirectory(paths).toString)
    val p1 = new Pipeline(models.all, store, (_, n) => batches(n))
    val out1 = p1.run(spark, RunMode.Bootstrap)
    incr match {
      case None => out1
      case Some(b2) =>
        val p2 = new Pipeline(models.all, store, (_, n) => b2(n))
        p2.run(spark, RunMode.Incremental)
    }
  }

  private def canon(df: DataFrame, drop: Seq[String])
      : Map[String, Int] = {
    val d = df.drop(drop: _*)
    // column order differs between the merge path (join moves the key
    // first) and the bootstrap path — compare by sorted column name.
    // MULTISET (row → count), not Set: a merge bug that materializes
    // a row in both a carried-over and a rewritten partition yields
    // byte-identical duplicates a Set would collapse; the unit
    // separator keeps distinct rows from colliding when a field value
    // contains the joiner.
    d.select(d.columns.sorted.map(d.col): _*).collect()
      .map(r => r.toSeq.map(String.valueOf).mkString("\u001f"))
      .groupBy(identity).map { case (k, v) => k -> v.length }
  }

  test("bootstrap+incremental ≡ full refresh (modulo first_seen_at)") {
    // batch2 minus the deliberately-late C2 row (late rows are dropped
    // by the watermark, so they would make the two paths differ by
    // design — that semantic is covered in PipelineSpec)
    val custB2 = CdcFixtures.customersBatch2()
      .filter("customer_id <> 'C2'")
    val twoStep = run("graft-conv-a",
      Map("customers_cdc" -> CdcFixtures.customersBatch1(),
        "orders_cdc" -> CdcFixtures.ordersBatch1()),
      Some(Map("customers_cdc" -> custB2,
        "orders_cdc" -> CdcFixtures.ordersBatch2())))
    val fullRefresh = run("graft-conv-b",
      Map(
        "customers_cdc" -> CdcFixtures.customersBatch1()
          .unionByName(custB2),
        "orders_cdc" -> CdcFixtures.ordersBatch1()
          .unionByName(CdcFixtures.ordersBatch2())),
      None)

    // non-vacuity: the convergence claim is only proved on real rows —
    // empty == empty would "pass" after a regression that drops
    // everything in BOTH modes
    Seq("customers_latest", "orders_cleaned", "dim_customer").foreach(m =>
      assert(!twoStep(m).isEmpty && !fullRefresh(m).isEmpty,
        s"$m produced no rows — convergence check is vacuous"))
    assert(canon(twoStep("customers_latest"), Seq("first_seen_at")) ==
      canon(fullRefresh("customers_latest"), Seq("first_seen_at")))
    assert(canon(twoStep("orders_cleaned"), Seq("first_seen_at")) ==
      canon(fullRefresh("orders_cleaned"), Seq("first_seen_at")))
    assert(canon(twoStep("dim_customer"), Seq("created_at")) ==
      canon(fullRefresh("dim_customer"), Seq("created_at")))
  }
}
