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

  val functions: Seq[(String, ExpressionInfo, Builder)] = Seq(
    ("graft_dot_long", info("graft_dot_long",
      "exact integer dot product of two array<long>"),
      (es: Seq[Expression]) => LongArrayDot(es(0), es(1))),
    ("graft_dot_double", info("graft_dot_double",
      "dot product of two array<double>"),
      (es: Seq[Expression]) => DoubleArrayDot(es(0), es(1))))

  /** Runtime registration into an existing session. */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (name, i, builder) =>
      spark.sessionState.functionRegistry.registerFunction(
        FunctionIdentifier(name), i, builder)
    }
}
