package graft.quality

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class ValidateSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("each rule fires on synthesized dirty data") {
    val child = Seq(
      (Some(1L), "F"), (Some(1L), "F"), // duplicate key 1
      (Some(2L), "X"), // bad status, orphan FK
      (None, "O"), (None, "O")) // TWO null keys: not_null's business,
      // NOT a uniqueness violation (dbt unique filters IS NOT NULL)
      .toDF("k", "status")
    val parent = Seq(1L).toDF("pk")

    val report = Validate.report(Seq(
      Validate.unique(child, "c", "k"),
      Validate.notNull(child, "c", "k"),
      Validate.acceptedValues(child, "c", "status", Seq("F", "O", "P")),
      Validate.relationship(child, "c", "k", parent, "pk")))
      .collect().map(r => r.getString(0) -> (r.getLong(3), r.getBoolean(4)))
      .toMap

    assert(report("unique_c_k") == (1L, false)) // only key 1; NULLs exempt
    assert(report("not_null_c_k") == (2L, false))
    assert(report("accepted_c_status") == (1L, false)) // 'X'
    assert(report("ri_c_k") == (1L, false)) // key 2 orphaned; NULL exempt
  }

  test("clean data passes every rule") {
    val child = Seq((1L, "F"), (2L, "O")).toDF("k", "status")
    val parent = Seq(1L, 2L).toDF("pk")
    val report = Validate.report(Seq(
      Validate.unique(child, "c", "k"),
      Validate.notNull(child, "c", "k"),
      Validate.acceptedValues(child, "c", "status", Seq("F", "O", "P")),
      Validate.relationship(child, "c", "k", parent, "pk")))
      .collect()
    assert(report.length == 4 && report.forall(_.getBoolean(4)))
    assert(report.forall(_.getLong(3) == 0L))
  }

  test("profile emits one stats row per column in one scan") {
    val out = Quality.qColumnProfile.build(spark, "/root/testdata/sf0.001")
      .collect()
    assert(out.map(_.getString(0)).toSeq ==
      Seq("l_extendedprice", "l_quantity", "l_returnflag", "l_shipdate"))
    out.foreach { r =>
      assert(r.getLong(1) > 0 && r.getLong(2) <= r.getLong(1))
      assert(r.getLong(3) <= r.getLong(2)) // ndv ≤ non-null count
      assert(r.getString(4) <= r.getString(5) ||
        r.getString(0) != "l_returnflag") // string extrema ordered
    }
  }

  test("failOnViolations gates the DAG like dbt build: model fails, " +
      "dependents skip, the built relation stays") {
    import java.nio.file.Files
    import graft.io.ModelStore
    import graft.model.{BuildCtx, ModelDef, Pipeline, RunMode}
    import org.apache.spark.sql.functions.lit
    val tested = ModelDef(name = "t", layer = "l",
      postHooks = Seq(Validate.failOnViolations(df => Seq(
        Validate.unique(df, "t", "k")))),
      build = (_: BuildCtx) =>
        Seq(1L, 1L, 2L).toDF("k")) // duplicate key -> test fails
    val down = ModelDef(name = "down", layer = "l", deps = Seq("t"),
      build = (ctx: BuildCtx) => ctx.ref("t"))
    val indep = ModelDef(name = "indep", layer = "l",
      build = (_: BuildCtx) => spark.range(2).withColumn("x", lit(1)))
    val store = new ModelStore(
      Files.createTempDirectory("graft-vhook").toString)
    val p = new Pipeline(Seq(tested, down, indep), store,
      (_, n) => sys.error(s"no source $n"))
    val r = p.runReport(spark, RunMode.Bootstrap)
    assert(r.failed == Seq("t"))
    assert(r.status("t").asInstanceOf[Pipeline.Failed]
      .error.getMessage.contains("unique_t_k"))
    assert(r.skipped == Seq("down"))
    assert(r.results.keySet == Set("indep"))
    // dbt parity: the relation IS built (tests run on the committed
    // state); the failure gates DOWNSTREAM, it does not roll back
    assert(store.read(spark, "l", "t").get.count() == 3)
  }

  test("failOnViolations with no declared rules is a pass, not a crash") {
    var ran = false
    Validate.failOnViolations(_ => Seq.empty)(
      spark.range(3).toDF("k"))
    ran = true
    assert(ran)
  }
}
