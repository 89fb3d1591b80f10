package graft.functions.expressions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

import graft.functions.TextFunctions

/**
 * Single-pass sketch expressions — map-side signature computation with
 * `doGenCode`, replacing the explode → 64-aggregate-column formulation. The
 * aggregation form already kept the *shuffle* small (map-side combine), but
 * still paid explode row expansion and hash-aggregate machinery per shingle;
 * these run one tight loop per document inside whole-stage codegen and need no
 * shuffle at all for signature generation — the signature step becomes a
 * narrow projection, exactly like any other column.
 */

/**
 * MinHash signature of a hashed-shingle array: for permutation i,
 * `min over x of (a_i · (x mod P) + b_i) mod P`, P = 2³¹−1 (ANSI-safe: all
 * intermediates < 2⁶²). Parameters derive from [[TextFunctions.permutations]]
 * (seeded) so results are identical to the aggregation formulation.
 * Null elements are skipped; an all-null/empty array yields sentinel P values.
 */
case class MinHashSignature(child: Expression, numHashes: Int, seed: Long)
    extends UnaryExpression {

  private lazy val (aParams, bParams): (Array[Long], Array[Long]) = {
    val ps = TextFunctions.permutations(numHashes, seed)
    (ps.map(_._1).toArray, ps.map(_._2).toArray)
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"minhash_signature requires array<bigint>, got $t")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val p = TextFunctions.MersenneP
    val sig = Array.fill(numHashes)(p)
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) {
        val x = java.lang.Math.floorMod(arr.getLong(i), p)
        var j = 0
        while (j < numHashes) {
          val v = java.lang.Math.floorMod(aParams(j) * x + bParams(j), p)
          if (v < sig(j)) sig(j) = v
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("minhashA", aParams, "long[]")
    val bRef = ctx.addReferenceObj("minhashB", bParams, "long[]")
    val p = TextFunctions.MersenneP
    nullSafeCodeGen(ctx, ev, arr => {
      val sig = ctx.freshName("sig")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val x = ctx.freshName("x")
      val v = ctx.freshName("v")
      s"""
         |long[] $sig = new long[$numHashes];
         |java.util.Arrays.fill($sig, ${p}L);
         |for (int $i = 0; $i < $arr.numElements(); $i++) {
         |  if (!$arr.isNullAt($i)) {
         |    long $x = java.lang.Math.floorMod($arr.getLong($i), ${p}L);
         |    for (int $j = 0; $j < $numHashes; $j++) {
         |      long $v = java.lang.Math.floorMod($aRef[$j] * $x + $bRef[$j], ${p}L);
         |      if ($v < $sig[$j]) $sig[$j] = $v;
         |    }
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($sig);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSignature {
  def apply(hashes: Column, numHashes: Int = 64, seed: Long = 42L): Column =
    GraftBridge.toColumn(MinHashSignature(GraftBridge.toExpression(hashes), numHashes, seed))
}

/**
 * Packed 64-bit SimHash of a token-hash array, as `array(loWord, hiWord)` —
 * two non-negative 32-bit words (bit b of each hash votes ±1; bit set iff the
 * vote sum is ≥ 0, matching the aggregation formulation's tie rule).
 */
case class SimHashPacked(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"simhash_packed requires array<bigint>, got $t")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val votes = new Array[Long](64)
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) {
        val h = arr.getLong(i)
        var b = 0
        while (b < 64) {
          votes(b) += ((h >>> b) & 1L) * 2L - 1L
          b += 1
        }
      }
      i += 1
    }
    var lo = 0L; var hi = 0L
    var b = 0
    while (b < 32) {
      if (votes(b) >= 0) lo |= 1L << b
      if (votes(b + 32) >= 0) hi |= 1L << b
      b += 1
    }
    new GenericArrayData(Array(lo, hi))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val votes = ctx.freshName("votes")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val h = ctx.freshName("h")
      val lo = ctx.freshName("lo")
      val hi = ctx.freshName("hi")
      s"""
         |long[] $votes = new long[64];
         |for (int $i = 0; $i < $arr.numElements(); $i++) {
         |  if (!$arr.isNullAt($i)) {
         |    long $h = $arr.getLong($i);
         |    for (int $b = 0; $b < 64; $b++) {
         |      $votes[$b] += (($h >>> $b) & 1L) * 2L - 1L;
         |    }
         |  }
         |}
         |long $lo = 0L; long $hi = 0L;
         |for (int $b = 0; $b < 32; $b++) {
         |  if ($votes[$b] >= 0) $lo |= 1L << $b;
         |  if ($votes[$b + 32] >= 0) $hi |= 1L << $b;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(new long[]{$lo, $hi});
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHashPacked {
  def apply(hashes: Column): Column =
    GraftBridge.toColumn(SimHashPacked(GraftBridge.toExpression(hashes)))
}
