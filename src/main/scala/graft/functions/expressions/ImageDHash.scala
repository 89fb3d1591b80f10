package graft.functions.expressions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._

/**
 * 64-bit perceptual difference hash of an encoded image payload
 * (`binary` → nullable `bigint`) — [[graft.operators.Multimodal.MediaCodec
 * .dHash64]] as a Catalyst expression, so perceptual image identity is a
 * plain SQL projection: `SELECT image_dhash(payload) FROM media`, feeding
 * the same 16-bit-chunk Hamming blocking SimHash uses.
 *
 * Returns NULL for non-image or undecodable payloads — the SQL-native way
 * to say "no perceptual identity exists" (a byte-fold fallback hash would
 * invent one). `CodegenFallback` is deliberate: evaluation cost is the
 * image DECODE (inflate/IDCT), so generated glue code would win nothing —
 * the expression's scale story is being a map-side projection, payload
 * bytes never crossing a shuffle.
 */
case class ImageDHash(child: Expression) extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"image_dhash requires binary, got $t")
  }

  override def nullSafeEval(input: Any): Any =
    graft.operators.Multimodal.MediaCodec.dHash64(input.asInstanceOf[Array[Byte]])
      .map(Long.box).orNull

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ImageDHash {
  def apply(payload: Column): Column =
    GraftBridge.toColumn(ImageDHash(GraftBridge.toExpression(payload)))
}
