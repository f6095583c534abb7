package graft.io

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Versioned store semantics: pointer swap, time travel, vacuum. */
class ModelStoreSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("writes create versions; read follows the pointer; time travel") {
    val store = new ModelStore(
      Files.createTempDirectory("graft-store").toString)
    store.write(Seq((1, "a")).toDF("k", "v"), "silver", "t")
    store.write(Seq((1, "b"), (2, "c")).toDF("k", "v"), "silver", "t")

    assert(store.currentVersion(spark, "silver", "t") == 2)
    assert(store.read(spark, "silver", "t").get.count() == 2)
    // time travel to v1
    val v1 = store.readVersion(spark, "silver", "t", 1)
      .collect().map(r => (r.getInt(0), r.getString(1))).toSet
    assert(v1 == Set((1, "a")))
  }

  test("vacuum drops old versions, keeps the current") {
    val store = new ModelStore(
      Files.createTempDirectory("graft-store2").toString)
    (1 to 4).foreach(i =>
      store.write(Seq(i).toDF("v"), "silver", "t"))
    store.vacuum(spark, "silver", "t", keepLast = 1)
    assert(store.read(spark, "silver", "t").get
      .head().getInt(0) == 4)
    intercept[Exception] {
      store.readVersion(spark, "silver", "t", 1).collect()
    }
  }

  test("pipeline retention vacuums old versions automatically") {
    import graft.model.{ModelDef, Pipeline, RunMode}
    val store = new ModelStore(
      Files.createTempDirectory("graft-retain").toString)
    val model = ModelDef(name = "t", layer = "silver",
      build = ctx => ctx.source("bronze", "src"))
    val p = new Pipeline(Seq(model), store, (_, _) => Seq(1).toDF("v"),
      retainVersions = 1)
    (1 to 3).foreach(_ => p.run(spark, RunMode.Incremental))
    assert(store.currentVersion(spark, "silver", "t") == 3)
    intercept[Exception] {
      store.readVersion(spark, "silver", "t", 2).collect()
    }
  }

  test("missing table reads as None, version 0") {
    val store = new ModelStore(
      Files.createTempDirectory("graft-store3").toString)
    assert(store.currentVersion(spark, "silver", "nope") == 0)
    assert(store.read(spark, "silver", "nope").isEmpty)
  }
}
