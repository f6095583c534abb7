package graft

import org.scalatest.funsuite.AnyFunSuite

/** Native expressions must be reachable from pure SQL once registered. */
class GraftExtensionsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

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
