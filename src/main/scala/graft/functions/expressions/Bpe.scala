package graft.functions.expressions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.operators.BpeModel

/**
 * BPE token count of a text under a trained [[graft.operators.BpeModel]] —
 * whitespace words each encoded by the model's greedy lowest-rank merge
 * loop, lengths summed. The model ships once as a reference object; the
 * generated code is a single call into it, so the projection stays inside
 * whole-stage codegen (the [[NearestCentroids]] arrangement — constant
 * model, per-row loop in compiled code).
 */
case class BpeCount(child: Expression, model: BpeModel) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"bpe_count requires string, got $t")
  }

  override def nullSafeEval(input: Any): Any =
    model.countTokens(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeModel", model, classOf[BpeModel].getName)
    nullSafeCodeGen(ctx, ev, s => s"${ev.value} = $ref.countTokens($s.toString());")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BpeCount {
  def apply(text: Column, model: BpeModel): Column =
    GraftBridge.toColumn(BpeCount(GraftBridge.toExpression(text), model))
}

/** The subword symbols themselves (`array<string>`) — vocabulary
  * inspection / detokenization-parity checks; same codegen arrangement. */
case class BpeEncode(child: Expression, model: BpeModel) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"bpe_encode requires string, got $t")
  }

  override def nullSafeEval(input: Any): Any =
    BpeEncode.toArrayData(model, input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeModel", model, classOf[BpeModel].getName)
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.expressions.BpeEncode.toArrayData($ref, $s);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BpeEncode {
  def apply(text: Column, model: BpeModel): Column =
    GraftBridge.toColumn(BpeEncode(GraftBridge.toExpression(text), model))

  /** Codegen bridge: encode + wrap as catalyst array data. */
  def toArrayData(model: BpeModel, text: UTF8String): GenericArrayData =
    new GenericArrayData(
      model.encodeText(text.toString).map(UTF8String.fromString(_)): Array[AnyRef])
}
