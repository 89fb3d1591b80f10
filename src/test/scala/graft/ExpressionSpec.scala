package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextFunctions
import graft.functions.expressions.{ArrayDotProduct, MinHashSignature, SimHashPacked}

/**
 * Custom-expression correctness: the interpreted (`nullSafeEval`) and
 * whole-stage-codegen (`doGenCode`) paths must produce identical results —
 * Spark silently falls back to interpretation in some plan shapes, so a
 * divergence would be a data-dependent heisenbug.
 */
class ExpressionSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  private def withCodegenOff[A](f: => A): A = {
    val conf = spark.conf
    val prevFactory = conf.get("spark.sql.codegen.factoryMode", "FALLBACK")
    val prevWhole = conf.get("spark.sql.codegen.wholeStage", "true")
    conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    conf.set("spark.sql.codegen.wholeStage", "false")
    try f finally {
      conf.set("spark.sql.codegen.factoryMode", prevFactory)
      conf.set("spark.sql.codegen.wholeStage", prevWhole)
    }
  }

  private def rows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(_.toSeq.map {
      case a: scala.collection.Seq[_] => a.toList
      case x => x
    })

  test("ArrayDotProduct: interpreted == codegen, long and double typing, null elements") {
    val df = Seq(
      (Array(1L, 2L, 3L), Array(4L, 5L, 6L)),
      (Array(-7L, 0L, 9L), Array(2L, 100L, -3L))
    ).toDF("a", "b")
    val q = df.select(ArrayDotProduct(col("a"), col("b")).as("d"))
    assert(rows(q) == withCodegenOff(rows(q)))
    assert(q.collect().map(_.getLong(0)).toSeq == Seq(32L, -41L))
    // float arrays → double result
    val fdf = Seq((Array(0.5f, 1.5f), Array(2.0f, 4.0f))).toDF("a", "b")
    val fq = fdf.select(ArrayDotProduct(col("a"), col("b")).as("d"))
    assert(fq.schema("d").dataType == org.apache.spark.sql.types.DoubleType)
    assert(fq.collect().head.getDouble(0) == 7.0)
    // null elements are skipped (treated as 0)
    val ndf = Seq((Array[java.lang.Long](1L, null, 3L), Array[java.lang.Long](5L, 7L, null)))
      .toDF("a", "b")
    assert(ndf.select(ArrayDotProduct(col("a"), col("b"))).collect().head.getLong(0) == 5L)
    // unequal lengths dot over the common prefix
    val udf2 = Seq((Array(2L, 3L, 99L), Array(10L, 10L))).toDF("a", "b")
    assert(udf2.select(ArrayDotProduct(col("a"), col("b"))).collect().head.getLong(0) == 50L)
  }

  test("MinHashSignature: interpreted == codegen == hand-computed model") {
    val df = Seq(Tuple1(Array(123456789L, -987654321L, 42L)), Tuple1(Array(7L))).toDF("h")
    val q = df.select(MinHashSignature(col("h"), 64).as("sig"))
    assert(rows(q) == withCodegenOff(rows(q)))
    // hand-computed model for row 0
    val perms = TextFunctions.permutations(64)
    val p = TextFunctions.MersenneP
    val expected = perms.map { case (a, b) =>
      Seq(123456789L, -987654321L, 42L)
        .map(x => Math.floorMod(a * Math.floorMod(x, p) + b, p)).min
    }
    val got = q.collect().head.getSeq[Long](0)
    assert(got == expected)
  }

  test("SimHashPacked: interpreted == codegen; near-identical docs give close words") {
    val df = Seq(Tuple1(Array(1L, 2L, 3L, 4L, 5L)), Tuple1(Array(1L, 2L, 3L, 4L, 6L))).toDF("h")
    val q = df.select(SimHashPacked(col("h")).as("s"))
    assert(rows(q) == withCodegenOff(rows(q)))
    val Seq(s1, s2) = q.collect().toSeq.map(_.getSeq[Long](0))
    val hamming = java.lang.Long.bitCount(s1(0) ^ s2(0)) + java.lang.Long.bitCount(s1(1) ^ s2(1))
    assert(hamming < 32, s"hamming $hamming") // one token changed of five
    assert(s1.forall(w => w >= 0 && w <= 0xFFFFFFFFL)) // packed 32-bit words
  }

  test("SrpLshKeys: interpreted == codegen == hand-computed sign model") {
    val dim = 8
    val vecs = Seq(
      Array(0.3f, -1.2f, 0.8f, 0.0f, 2.5f, -0.1f, 1.1f, -0.7f),
      Array(-0.9f, 0.4f, -0.4f, 1.7f, -2.2f, 0.6f, 0.0f, 0.2f))
    val df = vecs.map(Tuple1(_)).toDF("v")
    val q = df.select(
      graft.functions.expressions.SrpLshKeys(col("v"), dim, tables = 4, planesPerTable = 3).as("k"))
    assert(rows(q) == withCodegenOff(rows(q)))
    // independent model: same plane-seeded PRNG, same left-to-right fold
    def modelKeys(v: Array[Float]): Seq[Long] = (0 until 4).map { t =>
      (0 until 3).foldLeft(0L) { (key, pp) =>
        val rnd = new scala.util.Random((t * 3 + pp) * 1315423911L + 7)
        val signs = Array.fill(dim)(if (rnd.nextBoolean()) 1.0 else -1.0)
        var dot = 0.0
        for (i <- 0 until dim) dot += v(i).toDouble * signs(i)
        key * 2L + (if (dot >= 0) 1L else 0L)
      }
    }
    val got = q.collect().map(_.getSeq[Long](0).toSeq).toSeq
    assert(got == vecs.map(modelKeys))
  }

  test("WinnowFingerprints: interpreted == codegen == hand-traced model; guarantee holds") {
    import graft.functions.expressions.WinnowFingerprints
    // hand trace, w=3: windows of [9,4,7,4,2,8]:
    //  [9,4,7] min@1=4 → record 4; [4,7,4] min stays? minPos=1 >= i=1: incoming 4 (=min) is <= → rightmost tie wins, record 4@3
    //  [7,4,2]: incoming 2 <= 4 → record 2@4; [4,2,8]: incoming 8 > 2, min@4 in window → no record
    val df = Seq(Tuple1(Array(9L, 4L, 7L, 4L, 2L, 8L))).toDF("h")
    val q = df.select(WinnowFingerprints(col("h"), 3).as("f"))
    assert(rows(q) == withCodegenOff(rows(q)))
    assert(q.collect().head.getSeq[Long](0).toSeq == Seq(4L, 4L, 2L))
    // shorter than window → one global window, rightmost min
    val short = Seq(Tuple1(Array(5L, 3L, 3L))).toDF("h")
    assert(short.select(WinnowFingerprints(col("h"), 10)).collect().head.getSeq[Long](0).toSeq == Seq(3L))
    // the winnowing GUARANTEE: two docs sharing a run of >= w+k-1 tokens share
    // at least one fingerprint (checked on the driver kernel with k-gram runs)
    val a = Array.tabulate(40)(i => (i * 2654435761L) ^ (i << 7))
    val b = Array.tabulate(12)(i => a(20 + i)) // a 12-hash shared run
    val fa = WinnowFingerprints.select(a, 4).toSet
    val fb = WinnowFingerprints.select(b, 4).toSet
    assert((fa intersect fb).nonEmpty)
  }

  test("NearestCentroids: interpreted == codegen, deterministic probe order") {
    val cents = Array(1.0, 0.0, 0.0, 1.0, -1.0, 0.0) // 3 unit centroids, dim 2
    val df = Seq(
      Array(0.9f, 0.1f),   // cells by dot: 0 (.9), 1 (.1), 2 (−.9)
      Array(-0.5f, 0.8f),  // cells: 1 (.8), 2 (.5), 0 (−.5)
      Array(0.0f, 0.0f)    // all dots 0 → ties break toward lower index: 0,1,2
    ).map(Tuple1(_)).toDF("v")
    val q = df.select(
      graft.functions.expressions.NearestCentroids(col("v"), cents, 3, 2, 3).as("cells"))
    assert(rows(q) == withCodegenOff(rows(q)))
    val got = q.collect().map(_.getSeq[Int](0).toSeq).toSeq
    assert(got == Seq(Seq(0, 1, 2), Seq(1, 2, 0), Seq(0, 1, 2)))
  }

  test("PqEncode/PqLut refuse schema drift: wrong length and null components error") {
    import graft.functions.expressions.{PqEncode, PqLut}
    // 1 subspace, 2 centroids of dim 2 — enough to exercise the guard
    val books = Array(0.0, 0.0, 1.0, 1.0)
    def enc(df: DataFrame) = df.select(PqEncode(col("v"), books, 1, 2, 2).as("c"))
    def lut(df: DataFrame) = df.select(PqLut(col("v"), books, 1, 2, 2).as("l"))
    val ok = Seq(Tuple1(Array(0.9, 1.1))).toDF("v")
    assert(enc(ok).collect().head.getSeq[Int](0) == Seq(1))
    // wrong length: ADVICE r10 — zero-padding scored a drifted schema
    // quietly wrong; both paths (codegen and interpreted) must error
    val short = Seq(Tuple1(Array(0.9))).toDF("v")
    for (q <- Seq(enc(short), lut(short))) {
      val e = intercept[Exception](q.collect())
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(e).exists(_.contains("trained dim")), s"wrong error: $e")
      val ei = intercept[Exception](withCodegenOff(q.collect()))
      assert(msgs(ei).exists(_.contains("trained dim")), s"wrong interpreted error: $ei")
    }
    // null component: same refusal
    val withNull = Seq(Tuple1(Array[java.lang.Double](0.9, null))).toDF("v")
    val en = intercept[Exception](enc(withNull).collect())
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(en).exists(_.contains("NULL component")), s"wrong error: $en")
  }

  test("type mismatches fail analysis, not execution") {
    val df = Seq(Tuple1(Array("a", "b"))).toDF("s")
    intercept[org.apache.spark.sql.AnalysisException] {
      df.select(MinHashSignature(col("s"), 64)).collect()
    }
    intercept[org.apache.spark.sql.AnalysisException] {
      df.select(ArrayDotProduct(col("s"), col("s"))).collect()
    }
  }

  test("Tables.events microsecond-timestamp branch applies pushable bounds") {
    import java.nio.file.Files
    val dir = Files.createTempDirectory("graft-events-us").toString
    val t0 = 1704067200000L
    (0 until 100).map(i => (new java.sql.Timestamp(t0 + i * 60000L), i.toDouble))
      .toDF("ts", "value").write.mode("overwrite").parquet(s"$dir/events.parquet")
    // TimestampType branch (testdata uses nanos; this exercises the µs path)
    val bounded = graft.sources.Tables.events(spark, dir, Some((t0, t0 + 600000L)))
    assert(bounded.schema("ts").dataType == org.apache.spark.sql.types.TimestampType)
    assert(bounded.count() == 10)
    assert(graft.sources.Tables.events(spark, dir, None).count() == 100)
  }
}
