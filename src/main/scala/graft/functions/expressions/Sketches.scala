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

/**
 * All `tables` random-hyperplane LSH band keys of a vector in ONE pass:
 * key_t = Σ_pp bit(t·p+pp)·2^(p-1-pp) where bit(plane) = [dot(vec, r_plane) ≥ 0]
 * and r_plane ∈ {−1,+1}^dim comes from a plane-seeded PRNG (identical
 * sign sequences to [[graft.operators.Similarity]]'s original per-plane
 * formulation — `new scala.util.Random(plane · 1315423911 + 7)` drawing one
 * boolean per dimension, so keys are bit-for-bit unchanged).
 *
 * The composed form evaluated one codegen'd dot product per plane — each a
 * full pass over the vector, tables × planes passes per row. This expression
 * walks the sign matrix in one loop nest: for 24 × 2 keys over dim 64 that is
 * 48 fused dot products with zero per-plane expression-tree overhead, and the
 * key array never leaves the generated code until it is complete.
 *
 * Arithmetic parity with [[ArrayDotProduct]] is load-bearing: left-to-right
 * accumulation, per-element widening to double, null elements skipped —
 * asserted in ExpressionSpec against the composed formulation.
 */
case class SrpLshKeys(child: Expression, dim: Int, tables: Int, planesPerTable: Int)
    extends UnaryExpression {
  require(dim > 0 && tables > 0 && planesPerTable > 0 && planesPerTable <= 62,
    s"invalid SRP-LSH shape: dim=$dim tables=$tables planes=$planesPerTable")

  /** Flattened [plane][dim] sign matrix, ±1.0 — same seeds as the composed form. */
  private lazy val signs: Array[Double] = {
    val out = new Array[Double](tables * planesPerTable * dim)
    var plane = 0
    while (plane < tables * planesPerTable) {
      val rnd = new scala.util.Random(plane * 1315423911L + 7)
      var i = 0
      while (i < dim) {
        out(plane * dim + i) = if (rnd.nextBoolean()) 1.0 else -1.0
        i += 1
      }
      plane += 1
    }
    out
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"srp_lsh_keys requires array<float|double>, got $t")
  }

  private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any = {
    val vec = input.asInstanceOf[ArrayData]
    val n = math.min(dim, vec.numElements())
    val keys = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var key = 0L
      var pp = 0
      while (pp < planesPerTable) {
        val base = (t * planesPerTable + pp) * dim
        var dot = 0.0
        var i = 0
        while (i < n) {
          if (!vec.isNullAt(i)) {
            val x = if (isFloat) vec.getFloat(i).toDouble else vec.getDouble(i)
            dot += x * signs(base + i)
          }
          i += 1
        }
        key = key * 2L + (if (dot >= 0) 1L else 0L)
        pp += 1
      }
      keys(t) = key
      t += 1
    }
    new GenericArrayData(keys)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val signsRef = ctx.addReferenceObj("srpSigns", signs, "double[]")
    val getter = if (isFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, vec => {
      val n = ctx.freshName("n")
      val keys = ctx.freshName("keys")
      val t = ctx.freshName("t")
      val pp = ctx.freshName("pp")
      val base = ctx.freshName("base")
      val dot = ctx.freshName("dot")
      val i = ctx.freshName("i")
      val key = ctx.freshName("key")
      s"""
         |int $n = java.lang.Math.min($dim, $vec.numElements());
         |long[] $keys = new long[$tables];
         |for (int $t = 0; $t < $tables; $t++) {
         |  long $key = 0L;
         |  for (int $pp = 0; $pp < $planesPerTable; $pp++) {
         |    int $base = ($t * $planesPerTable + $pp) * $dim;
         |    double $dot = 0.0;
         |    for (int $i = 0; $i < $n; $i++) {
         |      if (!$vec.isNullAt($i)) {
         |        $dot += ((double) $vec.$getter($i)) * $signsRef[$base + $i];
         |      }
         |    }
         |    $key = $key * 2L + ($dot >= 0 ? 1L : 0L);
         |  }
         |  $keys[$t] = $key;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($keys);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SrpLshKeys {
  def apply(vec: Column, dim: Int, tables: Int, planesPerTable: Int): Column =
    GraftBridge.toColumn(
      SrpLshKeys(GraftBridge.toExpression(vec), dim, tables, planesPerTable))
}

/**
 * Winnowing fingerprint selection (Schleimer/Wilkerson/Aiken, the MOSS
 * algorithm): slide a window of `w` consecutive k-gram hashes and record the
 * window minimum, re-recording only when the minimum's position changes.
 * Guarantee: any shared substring of ≥ w+k−1 tokens between two documents
 * shares at least one recorded fingerprint. Expected selection density for
 * well-distributed hashes is ~2/(w+1) (the trade the rolling-hash
 * fingerprinting literature standardizes on); tie-heavy inputs (repeated
 * k-grams hash equal, and ties re-record under the rightmost rule) can
 * record more — density is an expectation, not a bound.
 *
 * Ties select the RIGHTMOST minimal hash (both in rescans and for incoming
 * elements), making the selection fully deterministic. Inputs shorter than
 * the window collapse to one global window. One codegen'd pass per document;
 * null elements are skipped (matching the sibling sketch expressions) —
 * [[graft.functions.TextFunctions.orderedShingleHashes]] never yields them,
 * but `zip_with`-built arrays report nullable elements, so the type check
 * cannot reject them.
 */
case class WinnowFingerprints(child: Expression, window: Int) extends UnaryExpression {
  require(window >= 1, s"window must be >= 1, got $window")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"winnow_fingerprints requires array<bigint>, got $t")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val hs = new Array[Long](n)
    var m = 0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) { hs(m) = arr.getLong(i); m += 1 }
      i += 1
    }
    new GenericArrayData(WinnowFingerprints.select(
      if (m == n) hs else java.util.Arrays.copyOf(hs, m), window))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val n = ctx.freshName("n")
      val hs = ctx.freshName("hs")
      val m = ctx.freshName("m")
      val i = ctx.freshName("i")
      s"""
         |int $n = $arr.numElements();
         |long[] $hs = new long[$n];
         |int $m = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$arr.isNullAt($i)) { $hs[$m++] = $arr.getLong($i); }
         |}
         |if ($m != $n) { $hs = java.util.Arrays.copyOf($hs, $m); }
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.expressions.WinnowFingerprints.select($hs, $window));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WinnowFingerprints {
  def apply(hashes: Column, window: Int): Column =
    GraftBridge.toColumn(WinnowFingerprints(GraftBridge.toExpression(hashes), window))

  /** The selection kernel, shared by interpreted eval and generated code. */
  def select(hs: Array[Long], window: Int): Array[Long] = {
    val n = hs.length
    if (n == 0) return Array.emptyLongArray
    val w = math.min(window, n)
    val out = new scala.collection.mutable.ArrayBuffer[Long](n / (w / 2 + 1) + 1)
    var minPos = -1
    var i = 0
    while (i <= n - w) {
      if (minPos < i) {
        // previous minimum slid out — rescan the window, rightmost min wins
        minPos = i
        var j = i + 1
        while (j < i + w) {
          if (hs(j) <= hs(minPos)) minPos = j
          j += 1
        }
        out += hs(minPos)
      } else if (hs(i + w - 1) <= hs(minPos)) {
        // incoming element is a new (rightmost) minimum
        minPos = i + w - 1
        out += hs(minPos)
      }
      i += 1
    }
    out.toArray
  }
}
