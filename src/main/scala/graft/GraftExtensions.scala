package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{DoubleArrayDot, LongArrayDot}

/** `SparkSessionExtensions` wiring: exposes graft's native expressions
  * to SQL (`SELECT graft_dot_long(a, b)`), so the engine's custom
  * kernels are usable from pure-SQL surfaces too. Activate with
  * `spark.sql.extensions=graft.GraftExtensions` or at runtime via
  * [[GraftExtensions.register]].
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftExtensions {
  private type Builder = Seq[Expression] => Expression

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name,
      usage, "")

  // Arity-checked builder: a wrong-argument-count SQL call must fail
  // analysis with a message naming the function and its signature, not
  // a raw IndexOutOfBoundsException from es(1) — this IS the pure-SQL
  // surface, so its errors must be SQL-user-actionable.
  private def binary(name: String, mk: (Expression, Expression) => Expression)
      : Builder = es => {
    require(es.length == 2,
      s"$name expects exactly 2 arguments (array, array); got ${es.length}")
    mk(es(0), es(1))
  }

  val functions: Seq[(String, ExpressionInfo, Builder)] = Seq(
    ("graft_dot_long", info("graft_dot_long",
      "exact integer dot product of two array<long>"),
      binary("graft_dot_long", LongArrayDot.apply)),
    ("graft_dot_double", info("graft_dot_double",
      "dot product of two array<double>"),
      binary("graft_dot_double", DoubleArrayDot.apply)))

  /** Runtime registration into an existing session. */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (name, i, builder) =>
      spark.sessionState.functionRegistry.registerFunction(
        FunctionIdentifier(name), i, builder)
    }
}
