package graft

import org.scalatest.funsuite.AnyFunSuite

/** Native expressions must be reachable from pure SQL once registered. */
class GraftExtensionsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("registered views make the engine reachable from pure SQL") {
    graft.io.Tables.registerViews(spark, "/root/testdata/sf0.001")
    GraftExtensions.register(spark)
    val n = spark.sql(
      """SELECT count(*) FROM embeddings e
        |WHERE graft_dot_long(
        |  transform(e.embedding, x -> CAST(round(x*1000) AS BIGINT)),
        |  transform(e.embedding, x -> CAST(round(x*1000) AS BIGINT))) > 0
        |""".stripMargin).head().getLong(0)
    assert(n == 500L)
  }

  test("graft_dot_long / graft_dot_double usable from SQL") {
    GraftExtensions.register(spark)
    val l = spark.sql(
      "SELECT graft_dot_long(array(1L, 2L, 3L), array(4L, 5L, 6L))")
      .head().getLong(0)
    assert(l == 32L)
    val d = spark.sql(
      "SELECT graft_dot_double(array(0.5d, 2.0d), array(2.0d, 0.25d))")
      .head().getDouble(0)
    assert(d == 1.5)
  }
}
