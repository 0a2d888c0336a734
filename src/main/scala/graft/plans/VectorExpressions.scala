package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression for dense-vector dot products over
  * `array<float>` / `array<double>` columns.
  *
  * Why not `zip_with` + `aggregate`: Spark's higher-order functions
  * allocate a lambda frame per element and fall out of tight codegen —
  * profiled 80 s for the 12.5M-pair near-dup scan at sf0.1. This
  * expression emits a primitive `for` loop over `ArrayData` (no
  * allocation, no boxing) via `doGenCode`, exactly the "custom Expression
  * with codegen beats UDF beats everything else" path from SURVEY §3.
  *
  * Element nulls are not expected in embedding columns (parquet float
  * lists); null top-level inputs propagate null via BinaryExpression's
  * null-safe wrapper.
  */
case class DotProduct(left: Expression, right: Expression)
  extends BinaryExpression {

  private def isVector(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType | DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isVector(left.dataType) && isVector(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<float>/array<double> inputs, " +
        s"got ${left.dataType.simpleString} and ${right.dataType.simpleString}")

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_dot"

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    (elemType(left), elemType(right)) match {
      case (FloatType, FloatType) =>
        while (i < n) { s += x.getFloat(i).toDouble * y.getFloat(i).toDouble; i += 1 }
      case (DoubleType, DoubleType) =>
        while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
      case (FloatType, DoubleType) =>
        while (i < n) { s += x.getFloat(i).toDouble * y.getDouble(i); i += 1 }
      case (DoubleType, FloatType) =>
        while (i < n) { s += x.getDouble(i) * y.getFloat(i).toDouble; i += 1 }
      case other => throw new IllegalStateException(s"unexpected $other")
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      def get(arr: String, side: Expression, i: String): String =
        elemType(side) match {
          case FloatType  => s"(double) $arr.getFloat($i)"
          case DoubleType => s"$arr.getDouble($i)"
          case other => throw new IllegalStateException(s"unexpected $other")
        }
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += ${get(a, left, i)} * ${get(b, right, i)};
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}
