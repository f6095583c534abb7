package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native Catalyst expressions for the vector-similarity hot path.
  *
  * The composed built-in form — `aggregate(zip_with(a, b, _*_), 0, _+_)`
  * — is evaluated by the interpreted higher-order-function machinery
  * (one closure call per element, boxed lambda variables), which
  * measured ~10× slower than a fused loop at sf0.1. A dot product is a
  * single tight loop over two primitive arrays, so it gets a real
  * `doGenCode`: stays inside whole-stage codegen with zero boxing.
  * This is the SURVEY.md §7.4 "custom Expression" tier — used only
  * where built-ins genuinely can't express the op efficiently.
  *
  * NULL semantics match the built-in form exactly: mismatched lengths
  * (zip_with pads with NULL → product NULL → sum NULL) and NULL
  * elements both yield NULL, never a silently-wrong dot of a prefix —
  * a corrupt embedding row must surface as NULL similarity, not a
  * plausible score. The per-element null test is emitted only when the
  * array type admits null elements, so clean primitive arrays keep the
  * branch-free loop.
  */
abstract class ArrayDotBase extends BinaryExpression {
  protected def elemType: DataType
  override def dataType: DataType = elemType
  // NULL also arises from length mismatch / null elements, not just
  // null children — nullable unconditionally.
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(l, _), ArrayType(r, _))
          if l == elemType && r == elemType =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"${getClass.getSimpleName} expects two array<$elemType> " +
          s"arguments, got ${left.dataType.sql} and ${right.dataType.sql}")
    }

  private def elementsNullable: Boolean = Seq(left, right).exists(
    _.dataType match {
      case ArrayType(_, n) => n
      case _ => true
    })

  protected def jt: String = elemType match {
    case LongType => "long"
    case DoubleType => "double"
    case other => throw new IllegalArgumentException(other.toString)
  }

  protected def getter: String = elemType match {
    case LongType => "getLong"
    case DoubleType => "getDouble"
    case other => throw new IllegalArgumentException(other.toString)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val nullCheck =
        if (elementsNullable)
          s"""if ($a.isNullAt($i) || $b.isNullAt($i)) {
             |    ${ev.isNull} = true; break;
             |  }
             |  """.stripMargin
        else ""
      s"""
        |if ($a.numElements() != $b.numElements()) {
        |  ${ev.isNull} = true;
        |} else {
        |  int $n = $a.numElements();
        |  $jt $acc = 0;
        |  for (int $i = 0; $i < $n; $i++) {
        |    $nullCheck$acc += $a.$getter($i) * $b.$getter($i);
        |  }
        |  if (!${ev.isNull}) ${ev.value} = $acc;
        |}
      """.stripMargin
    })

}

/** Exact integer dot product over two `array<long>` columns. */
case class LongArrayDot(left: Expression, right: Expression)
    extends ArrayDotBase {
  override protected def elemType: DataType = LongType
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    var acc = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getLong(i) * y.getLong(i)
      i += 1
    }
    acc
  }
  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): Expression = copy(l, r)
}

/** Double dot product over two `array<double>` columns (LSH planes). */
case class DoubleArrayDot(left: Expression, right: Expression)
    extends ArrayDotBase {
  override protected def elemType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    acc
  }
  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): Expression = copy(l, r)
}

object VectorExpressions {
  def dotLong(a: Column, b: Column): Column =
    GraftColumnBridge.column(LongArrayDot(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
  def dotDouble(a: Column, b: Column): Column =
    GraftColumnBridge.column(DoubleArrayDot(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
}
