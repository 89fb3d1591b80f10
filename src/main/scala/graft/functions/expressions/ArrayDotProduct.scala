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

/**
 * The exact integer-cosine pair predicate as ONE codegen'd expression:
 * `dot(qa, qb) > 0 && dot² · den² ≥ num² · n2a · n2b` with the dot product
 * computed EXACTLY ONCE per pair. Composed from column arithmetic the same
 * predicate evaluates `arraydotproduct` three times per candidate —
 * Catalyst folds the filter into the join condition (it references both
 * sides), and join-condition evaluation has no common-subexpression
 * elimination, so the broadcast all-pairs regime paid 3 dot loops per pair.
 * Fusing the predicate is worth ~2× on the quadratic path (BNLJ over n²
 * pairs) and also tightens the LSH verify.
 *
 * Overflow contract (same as the column form it replaces): quantities stay
 * < 2⁶² for unit-norm embeddings at quantization scale 10³ with single-digit
 * thresholds — dot ≤ 10⁶, dot²·den² ≤ 4·10¹⁴, num²·n2a·n2b ≤ 10¹⁴.
 */
case class CosineGe(
    qa: Expression, qb: Expression, n2a: Expression, n2b: Expression,
    num: Long, den: Long)
    extends org.apache.spark.sql.catalyst.expressions.QuaternaryExpression {

  override def first: Expression = qa
  override def second: Expression = qb
  override def third: Expression = n2a
  override def fourth: Expression = n2b

  override def checkInputDataTypes(): TypeCheckResult =
    (qa.dataType, qb.dataType, n2a.dataType, n2b.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _), LongType, LongType) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c, d) =>
        TypeCheckResult.TypeCheckFailure(
          s"cosine_ge requires (array<long>, array<long>, long, long), got ($a, $b, $c, $d)")
    }

  override def dataType: DataType = BooleanType

  override def nullSafeEval(a: Any, b: Any, na: Any, nb: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0L
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i)) dot += x.getLong(i) * y.getLong(i)
      i += 1
    }
    dot > 0L &&
      dot * dot * (den * den) >= num * num * na.asInstanceOf[Long] * nb.asInstanceOf[Long]
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, na, nb) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $dot = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    $dot += $a.getLong($i) * $b.getLong($i);
         |  }
         |}
         |${ev.value} = $dot > 0L && $dot * $dot * ${den * den}L >= ${num * num}L * $na * $nb;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression, newFourth: Expression): Expression =
    copy(qa = newFirst, qb = newSecond, n2a = newThird, n2b = newFourth)
}

object CosineGe {
  /** Column-API entry point. */
  def apply(qa: Column, qb: Column, n2a: Column, n2b: Column, num: Long, den: Long): Column =
    GraftBridge.toColumn(CosineGe(
      GraftBridge.toExpression(qa), GraftBridge.toExpression(qb),
      GraftBridge.toExpression(n2a), GraftBridge.toExpression(n2b), num, den))
}
