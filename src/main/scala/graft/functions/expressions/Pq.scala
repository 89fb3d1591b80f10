package graft.functions.expressions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/**
 * Product quantization (Jégou, Douze, Schmid, "Product Quantization for
 * Nearest Neighbor Search", TPAMI 2011) — the memory-scale half of an
 * IVFADC index: a `dim`-dimensional vector splits into `m` contiguous
 * sub-vectors of `dsub = dim/m` components; each sub-vector is replaced by
 * the index of its nearest (L2) centroid in that subspace's `ks`-entry
 * codebook. A 64-dim float vector (256 B) becomes m=8 byte codes — 32×
 * smaller — and asymmetric distance computation ([[PqAdc]]) scores a
 * candidate with m table lookups instead of a dim-length dot product.
 *
 * All three expressions are codegen'd plan-time-constant loops in the
 * [[NearestCentroids]] mold: the codebook matrix (m × ks × dsub doubles,
 * ~131 KB at the defaults) ships to executors once as a reference object.
 */
case class PqEncode(child: Expression, codebooks: Array[Double],
    m: Int, dsub: Int, ks: Int) extends UnaryExpression {
  require(m > 0 && dsub > 0 && ks > 0, s"invalid PQ shape: m=$m dsub=$dsub ks=$ks")
  require(codebooks.length == m * ks * dsub,
    s"codebook size ${codebooks.length} != m*ks*dsub ${m * ks * dsub}")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"pq_encode requires array<float|double>, got $t")
  }

  private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any = {
    val vec = input.asInstanceOf[ArrayData]
    Pq.checkVec(vec, m * dsub, "pq_encode")
    val out = new Array[Int](m)
    var j = 0
    while (j < m) {
      var best = 0
      var bestD = Double.PositiveInfinity
      var t = 0
      while (t < ks) {
        var d2 = 0.0
        var i = 0
        while (i < dsub) {
          val p = j * dsub + i
          val x = if (isFloat) vec.getFloat(p).toDouble else vec.getDouble(p)
          val diff = x - codebooks((j * ks + t) * dsub + i)
          d2 += diff * diff
          i += 1
        }
        // NaN distances (Inf components) lose to every finite candidate;
        // strict < keeps ties toward the lower code — deterministic
        if (d2 < bestD) { best = t; bestD = d2 }
        t += 1
      }
      out(j) = best
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("pqCodebooks", codebooks, "double[]")
    val getter = if (isFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, vec => {
      val out = ctx.freshName("out")
      val j = ctx.freshName("j")
      val t = ctx.freshName("t")
      val i = ctx.freshName("i")
      val x = ctx.freshName("x")
      val d2 = ctx.freshName("d2")
      val diff = ctx.freshName("diff")
      val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD")
      s"""
         |graft.functions.expressions.Pq.checkVec($vec, ${m * dsub}, "pq_encode");
         |int[] $out = new int[$m];
         |for (int $j = 0; $j < $m; $j++) {
         |  int $best = 0;
         |  double $bestD = Double.POSITIVE_INFINITY;
         |  for (int $t = 0; $t < $ks; $t++) {
         |    double $d2 = 0.0;
         |    for (int $i = 0; $i < $dsub; $i++) {
         |      double $x = (double) $vec.$getter($j * $dsub + $i);
         |      double $diff = $x - $cRef[($j * $ks + $t) * $dsub + $i];
         |      $d2 += $diff * $diff;
         |    }
         |    if ($d2 < $bestD) { $best = $t; $bestD = $d2; }
         |  }
         |  $out[$j] = $best;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Shared input guard for the PQ expressions: a vector whose length differs
  * from the trained `dim = m × dsub`, or that carries null elements, is a
  * SCHEMA DRIFT between index build and serve — silently zero-padding it
  * (the r10 behavior, ADVICE r10) produced quietly wrong ADC scores; now it
  * errors with the shapes named, matching `checkInputDataTypes`' strictness
  * at the type level. Called from both the interpreted and codegen paths. */
object Pq {
  def checkVec(vec: ArrayData, dim: Int, op: String): Unit = {
    if (vec.numElements() != dim)
      throw new IllegalArgumentException(
        s"$op: vector length ${vec.numElements()} != trained dim $dim — " +
          "the input schema drifted from the index's quantizers")
    var i = 0
    while (i < dim) {
      if (vec.isNullAt(i))
        throw new IllegalArgumentException(
          s"$op: vector has a NULL component at $i — refusing to score " +
            "against implicit zero padding")
      i += 1
    }
  }
}

object PqEncode {
  def apply(vec: Column, codebooks: Array[Double], m: Int, dsub: Int, ks: Int): Column =
    GraftBridge.toColumn(
      PqEncode(GraftBridge.toExpression(vec), codebooks, m, dsub, ks))
}

/**
 * The query-side ADC lookup table: `lut[j*ks + t] = ⟨q_j, codebook_j[t]⟩`
 * (inner products, so [[PqAdc]]'s sum reconstructs `⟨q, v̂⟩` for a PQ-coded
 * candidate v̂). Computed ONCE per query row (m × ks × dsub multiplies) and
 * amortized over every candidate that query meets — the amortization is
 * the entire point of ADC: per-candidate cost drops from a dim-length dot
 * to m adds.
 */
case class PqLut(child: Expression, codebooks: Array[Double],
    m: Int, dsub: Int, ks: Int) extends UnaryExpression {
  require(m > 0 && dsub > 0 && ks > 0, s"invalid PQ shape: m=$m dsub=$dsub ks=$ks")
  require(codebooks.length == m * ks * dsub,
    s"codebook size ${codebooks.length} != m*ks*dsub ${m * ks * dsub}")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"pq_lut requires array<float|double>, got $t")
  }

  private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any = {
    val vec = input.asInstanceOf[ArrayData]
    Pq.checkVec(vec, m * dsub, "pq_lut")
    val out = new Array[Double](m * ks)
    var j = 0
    while (j < m) {
      var t = 0
      while (t < ks) {
        var dot = 0.0
        var i = 0
        while (i < dsub) {
          val p = j * dsub + i
          val x = if (isFloat) vec.getFloat(p).toDouble else vec.getDouble(p)
          dot += x * codebooks((j * ks + t) * dsub + i)
          i += 1
        }
        out(j * ks + t) = dot
        t += 1
      }
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("pqLutBooks", codebooks, "double[]")
    val getter = if (isFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, vec => {
      val out = ctx.freshName("out")
      val j = ctx.freshName("j")
      val t = ctx.freshName("t")
      val i = ctx.freshName("i")
      val x = ctx.freshName("x")
      val dot = ctx.freshName("dot")
      s"""
         |graft.functions.expressions.Pq.checkVec($vec, ${m * dsub}, "pq_lut");
         |double[] $out = new double[$m * $ks];
         |for (int $j = 0; $j < $m; $j++) {
         |  for (int $t = 0; $t < $ks; $t++) {
         |    double $dot = 0.0;
         |    for (int $i = 0; $i < $dsub; $i++) {
         |      double $x = (double) $vec.$getter($j * $dsub + $i);
         |      $dot += $x * $cRef[($j * $ks + $t) * $dsub + $i];
         |    }
         |    $out[$j * $ks + $t] = $dot;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PqLut {
  def apply(vec: Column, codebooks: Array[Double], m: Int, dsub: Int, ks: Int): Column =
    GraftBridge.toColumn(
      PqLut(GraftBridge.toExpression(vec), codebooks, m, dsub, ks))
}

/**
 * Asymmetric distance computation: `Σ_j lut[j*ks + codes[j]]` — the
 * approximate inner product `⟨q, v̂⟩` between the query behind `lut` and
 * the PQ-coded candidate `codes`. m array loads + m adds per candidate —
 * the hot-loop payoff PQ buys (codes are the ONLY per-candidate data; the
 * full vector never travels).
 */
case class PqAdc(left: Expression, right: Expression, ks: Int)
    extends BinaryExpression {
  require(ks > 0, s"ks must be positive: $ks")

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(IntegerType, _), ArrayType(DoubleType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"pq_adc requires (array<int> codes, array<double> lut), got ($l, $r)")
  }

  override def nullSafeEval(codesAny: Any, lutAny: Any): Any = {
    val codes = codesAny.asInstanceOf[ArrayData]
    val lut = lutAny.asInstanceOf[ArrayData]
    var s = 0.0
    var j = 0
    val n = codes.numElements()
    while (j < n) {
      val idx = j * ks + codes.getInt(j)
      if (idx < lut.numElements()) s += lut.getDouble(idx)
      j += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    nullSafeCodeGen(ctx, ev, (codes, lut) => {
      val s = ctx.freshName("s")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val idx = ctx.freshName("idx")
      s"""
         |double $s = 0.0;
         |int $n = $codes.numElements();
         |for (int $j = 0; $j < $n; $j++) {
         |  int $idx = $j * $ks + $codes.getInt($j);
         |  if ($idx < $lut.numElements()) $s += $lut.getDouble($idx);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object PqAdc {
  def apply(codes: Column, lut: Column, ks: Int): Column =
    GraftBridge.toColumn(
      PqAdc(GraftBridge.toExpression(codes), GraftBridge.toExpression(lut), ks))
}
