package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** ArrayDot NULL semantics must match the built-in composed form
  * `aggregate(zip_with(a, b, (x,y) -> x*y), 0D, (acc,x) -> acc+x)`:
  * NULL child, NULL element, or mismatched lengths → NULL — never a
  * silently-wrong dot of a common prefix. */
class VectorExpressionsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def dot(a: Seq[java.lang.Double], b: Seq[java.lang.Double])
      : Option[Double] = {
    val df = Seq((a, b)).toDF("a", "b")
      .select(VectorExpressions.dotDouble(col("a"), col("b")).as("d"))
    val r = df.head()
    if (r.isNullAt(0)) None else Some(r.getDouble(0))
  }

  test("plain dot product, codegen path") {
    assert(dot(Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0)).contains(32.0))
  }

  test("mismatched lengths yield NULL, not the dot of the prefix") {
    assert(dot(Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0)).isEmpty)
  }

  test("a NULL element yields NULL, not element-as-zero") {
    assert(dot(Seq(1.0, null, 3.0), Seq(4.0, 5.0, 6.0)).isEmpty)
  }

  test("NULL array child yields NULL") {
    val df = Seq(Tuple1(Seq(1.0, 2.0))).toDF("a")
      .select(VectorExpressions.dotDouble(
        lit(null).cast("array<double>"), col("a")).as("d"))
    assert(df.head().isNullAt(0))
  }

  test("agrees with the composed built-in form on clean vectors") {
    val df = Seq.tabulate(50) { i =>
      (Seq.tabulate(8)(j => (i * 8 + j) * 0.5),
        Seq.tabulate(8)(j => (j - i) * 0.25))
    }.toDF("a", "b")
    val both = df.select(
      VectorExpressions.dotDouble(col("a"), col("b")).as("fast"),
      expr("aggregate(zip_with(a, b, (x, y) -> x * y), 0D, " +
        "(acc, x) -> acc + x)").as("ref"))
      .collect()
    assert(both.forall(r => r.getDouble(0) == r.getDouble(1)))
  }

  test("wrong element type fails analysis instead of reading garbage") {
    val df = Seq(Tuple1(Seq(1, 2, 3))).toDF("a")
    val ex = intercept[Exception] {
      df.select(VectorExpressions.dotDouble(col("a"), col("a"))).head()
    }
    assert(ex.getMessage.toLowerCase.contains("array"))
  }

  test("long dot: exact integers, same NULL semantics") {
    val df = Seq((Seq(1L, 2L), Seq(3L, 4L))).toDF("a", "b")
    assert(df.select(VectorExpressions.dotLong(col("a"), col("b")))
      .head().getLong(0) == 11L)
    val short = Seq((Seq(1L, 2L), Seq(3L))).toDF("a", "b")
    assert(short.select(VectorExpressions.dotLong(col("a"), col("b")))
      .head().isNullAt(0))
  }
}
