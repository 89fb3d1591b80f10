package graft.functions.expressions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/**
 * IVF cell assignment: indexes of the `nprobe` centroids with the highest
 * dot product against the vector (for unit-norm data, highest cosine), in
 * descending-score order with ties broken toward the lower index — fully
 * deterministic. One codegen'd pass over the `nlist × dim` centroid matrix
 * per row; with nlist 16–256 this is a narrow projection, the map-side
 * quantization step of an IVF-flat index.
 *
 * The centroid matrix is a plan-time constant (trained driver-side on a
 * sample — [[graft.operators.Similarity.trainIvfCentroids]]), shipped to
 * executors once as a reference object, never per-row.
 */
case class NearestCentroids(child: Expression, centroids: Array[Double],
    nlist: Int, dim: Int, nprobe: Int) extends UnaryExpression {
  require(nlist > 0 && dim > 0 && nprobe > 0 && nprobe <= nlist,
    s"invalid IVF shape: nlist=$nlist dim=$dim nprobe=$nprobe")
  require(centroids.length == nlist * dim,
    s"centroid matrix size ${centroids.length} != nlist*dim ${nlist * dim}")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"nearest_centroids requires array<float|double>, got $t")
  }

  private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any = {
    val vec = input.asInstanceOf[ArrayData]
    val n = math.min(dim, vec.numElements())
    val scores = new Array[Double](nlist)
    var c = 0
    while (c < nlist) {
      var dot = 0.0
      var i = 0
      while (i < n) {
        if (!vec.isNullAt(i)) {
          val x = if (isFloat) vec.getFloat(i).toDouble else vec.getDouble(i)
          dot += x * centroids(c * dim + i)
        }
        i += 1
      }
      // NaN (e.g. Inf·0 against a zero centroid coordinate) sorts BELOW every
      // finite score — mapped to -Inf so the selection loop never compares
      // against NaN (false both ways, which would corrupt the argmax)
      scores(c) = if (java.lang.Double.isNaN(dot)) Double.NegativeInfinity else dot
      c += 1
    }
    val out = new Array[Int](nprobe)
    val taken = new Array[Boolean](nlist)
    var r = 0
    while (r < nprobe) {
      // `best == -1` seeds with the first untaken index so an all(-Inf) score
      // row still probes cells 0..nprobe-1 deterministically
      var best = -1
      var bestScore = Double.NegativeInfinity
      var j = 0
      while (j < nlist) {
        if (!taken(j) && (best == -1 || scores(j) > bestScore)) {
          best = j; bestScore = scores(j)
        }
        j += 1
      }
      taken(best) = true
      out(r) = best
      r += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("ivfCentroids", centroids, "double[]")
    val getter = if (isFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, vec => {
      val n = ctx.freshName("n")
      val scores = ctx.freshName("scores")
      val c = ctx.freshName("c")
      val dot = ctx.freshName("dot")
      val i = ctx.freshName("i")
      val out = ctx.freshName("out")
      val taken = ctx.freshName("taken")
      val r = ctx.freshName("r")
      val best = ctx.freshName("best")
      val bestScore = ctx.freshName("bestScore")
      val j = ctx.freshName("j")
      s"""
         |int $n = java.lang.Math.min($dim, $vec.numElements());
         |double[] $scores = new double[$nlist];
         |for (int $c = 0; $c < $nlist; $c++) {
         |  double $dot = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if (!$vec.isNullAt($i)) {
         |      $dot += ((double) $vec.$getter($i)) * $cRef[$c * $dim + $i];
         |    }
         |  }
         |  $scores[$c] = Double.isNaN($dot) ? Double.NEGATIVE_INFINITY : $dot;
         |}
         |int[] $out = new int[$nprobe];
         |boolean[] $taken = new boolean[$nlist];
         |for (int $r = 0; $r < $nprobe; $r++) {
         |  int $best = -1;
         |  double $bestScore = Double.NEGATIVE_INFINITY;
         |  for (int $j = 0; $j < $nlist; $j++) {
         |    if (!$taken[$j] && ($best == -1 || $scores[$j] > $bestScore)) {
         |      $best = $j; $bestScore = $scores[$j];
         |    }
         |  }
         |  $taken[$best] = true;
         |  $out[$r] = $best;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NearestCentroids {
  def apply(vec: Column, centroids: Array[Double], nlist: Int, dim: Int, nprobe: Int): Column =
    GraftBridge.toColumn(
      NearestCentroids(GraftBridge.toExpression(vec), centroids, nlist, dim, nprobe))
}

/**
 * Integer-exact cell assignment: the indexes of the `nprobe` centroids with
 * the highest EXACT integer dot products against a quantized vector
 * (`array<long>`), descending, ties toward the lower index. The integer twin
 * of [[NearestCentroids]] for operators whose assignment must be
 * bit-reproducible across engines and partition orders (semantic dedup's
 * oracle re-derives the same ranking in DuckDB — float-sum association
 * order can flip an argmax near a cell boundary, integer sums cannot).
 * Centroids are pre-quantized longs (plan-time constant, shipped once);
 * per-term products stay ≪ 2⁶³ for unit-norm data at the default scales
 * (|qv| ≤ ~10³, |qc| ≤ 10⁶, dim ≤ 10⁴).
 */
case class NearestCentroidsQ(child: Expression, centroids: Array[Long],
    nlist: Int, dim: Int, nprobe: Int) extends UnaryExpression {
  require(nlist > 0 && dim > 0 && nprobe > 0 && nprobe <= nlist,
    s"invalid shape: nlist=$nlist dim=$dim nprobe=$nprobe")
  require(centroids.length == nlist * dim,
    s"centroid matrix size ${centroids.length} != nlist*dim ${nlist * dim}")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"nearest_centroids_q requires array<long>, got $t")
  }

  override def nullSafeEval(input: Any): Any = {
    val vec = input.asInstanceOf[ArrayData]
    val n = math.min(dim, vec.numElements())
    val scores = new Array[Long](nlist)
    var c = 0
    while (c < nlist) {
      var dot = 0L
      var i = 0
      while (i < n) {
        if (!vec.isNullAt(i)) dot += vec.getLong(i) * centroids(c * dim + i)
        i += 1
      }
      scores(c) = dot
      c += 1
    }
    val out = new Array[Int](nprobe)
    val taken = new Array[Boolean](nlist)
    var r = 0
    while (r < nprobe) {
      var best = -1
      var bestScore = Long.MinValue
      var j = 0
      while (j < nlist) {
        if (!taken(j) && (best == -1 || scores(j) > bestScore)) {
          best = j; bestScore = scores(j)
        }
        j += 1
      }
      taken(best) = true
      out(r) = best
      r += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("qCentroids", centroids, "long[]")
    nullSafeCodeGen(ctx, ev, vec => {
      val n = ctx.freshName("n")
      val scores = ctx.freshName("scores")
      val c = ctx.freshName("c")
      val dot = ctx.freshName("dot")
      val i = ctx.freshName("i")
      val out = ctx.freshName("out")
      val taken = ctx.freshName("taken")
      val r = ctx.freshName("r")
      val best = ctx.freshName("best")
      val bestScore = ctx.freshName("bestScore")
      val j = ctx.freshName("j")
      s"""
         |int $n = java.lang.Math.min($dim, $vec.numElements());
         |long[] $scores = new long[$nlist];
         |for (int $c = 0; $c < $nlist; $c++) {
         |  long $dot = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if (!$vec.isNullAt($i)) $dot += $vec.getLong($i) * $cRef[$c * $dim + $i];
         |  }
         |  $scores[$c] = $dot;
         |}
         |int[] $out = new int[$nprobe];
         |boolean[] $taken = new boolean[$nlist];
         |for (int $r = 0; $r < $nprobe; $r++) {
         |  int $best = -1;
         |  long $bestScore = Long.MIN_VALUE;
         |  for (int $j = 0; $j < $nlist; $j++) {
         |    if (!$taken[$j] && ($best == -1 || $scores[$j] > $bestScore)) {
         |      $best = $j; $bestScore = $scores[$j];
         |    }
         |  }
         |  $taken[$best] = true;
         |  $out[$r] = $best;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NearestCentroidsQ {
  def apply(vec: Column, centroids: Array[Long], nlist: Int, dim: Int, nprobe: Int): Column =
    GraftBridge.toColumn(
      NearestCentroidsQ(GraftBridge.toExpression(vec), centroids, nlist, dim, nprobe))
}
