package graft.functions.expressions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/**
 * Codegen'd dot product over two numeric arrays — the one hot-path operation
 * the built-in surface cannot express efficiently: `zip_with` + `aggregate`
 * evaluate interpreted (per-element closure dispatch), which dominates
 * wall-clock when the pair space is large (all-pairs embedding dedup, ANN
 * re-ranking, hyperplane projections). This expression compiles to a tight
 * primitive loop inside whole-stage codegen.
 *
 * Typing: Array[Long] × Array[Long] → Long (exact integer path used by the
 * quantized-dot oracle queries); any float/double combination → Double.
 * Arrays of unequal length dot over the common prefix; null elements are
 * treated as 0 (aggregation-skip semantics, SURVEY §2.3 #7).
 */
case class ArrayDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  private lazy val isIntegral =
    elemType(left) == LongType && elemType(right) == LongType

  private val supported: Set[DataType] = Set(LongType, FloatType, DoubleType)

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(lt, _), ArrayType(rt, _))
          if supported.contains(lt) && supported.contains(rt) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"array_dot_product requires arrays of long/float/double, got $l and $r")
    }

  override def dataType: DataType = if (isIntegral) LongType else DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val n = math.min(x.numElements(), y.numElements())
    if (isIntegral) {
      var sum = 0L
      var i = 0
      while (i < n) {
        if (!x.isNullAt(i) && !y.isNullAt(i)) sum += x.getLong(i) * y.getLong(i)
        i += 1
      }
      sum
    } else {
      def get(arr: ArrayData, t: DataType, i: Int): Double = t match {
        case FloatType => arr.getFloat(i).toDouble
        case DoubleType => arr.getDouble(i)
        case LongType => arr.getLong(i).toDouble
        case _ => throw new IllegalStateException(s"unsupported element type $t")
      }
      val (lt, rt) = (elemType(left), elemType(right))
      var sum = 0.0
      var i = 0
      while (i < n) {
        if (!x.isNullAt(i) && !y.isNullAt(i)) sum += get(x, lt, i) * get(y, rt, i)
        i += 1
      }
      sum
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    def getter(t: DataType, arr: String, i: String): String = t match {
      case FloatType => s"(double) $arr.getFloat($i)"
      case DoubleType => s"$arr.getDouble($i)"
      case LongType => if (isIntegral) s"$arr.getLong($i)" else s"(double) $arr.getLong($i)"
      case _ => throw new IllegalStateException(s"unsupported element type $t")
    }
    val (lt, rt) = (elemType(left), elemType(right))
    val (sumT, zero) = if (isIntegral) ("long", "0L") else ("double", "0.0")
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val sum = ctx.freshName("sum")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |$sumT $sum = $zero;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    $sum += ${getter(lt, a, i)} * ${getter(rt, b, i)};
         |  }
         |}
         |${ev.value} = $sum;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object ArrayDotProduct {
  /** Column-API entry point. */
  def apply(a: Column, b: Column): Column =
    GraftBridge.toColumn(ArrayDotProduct(GraftBridge.toExpression(a), GraftBridge.toExpression(b)))
}
