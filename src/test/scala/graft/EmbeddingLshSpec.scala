package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/**
 * The LSH-blocked embedding dedup (the registered, plan-clean path) must give
 * the IDENTICAL answer to the all-pairs exact form — on the real test
 * corpora, at the registered threshold. This is the hardest regime for LSH
 * (the 0.45 threshold sits near the random-pair cosine for 64-dim unit
 * vectors, θ ≈ 63°), so the equality here is the strongest recall evidence
 * available: with tables = 24 × 2 planes the per-pair miss probability is
 * ~2·10⁻⁶ and every true pair on these corpora collides in several tables.
 */
class EmbeddingLshSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq

  for (sf <- Seq("sf0.001", "sf0.01")) {
    test(s"LSH-blocked == all-pairs exact on $sf (inline-vector path)") {
      val e = graft.sources.Tables.embeddings(spark, s"/root/testdata/$sf")
      val exact = rows(Dedup.embeddingNearDup(e))
      val lsh = rows(Dedup.embeddingNearDupLsh(e, dim = 64))
      assert(exact.nonEmpty, "corpus should contain near-dup pairs at 0.45")
      assert(lsh == exact)
    }
  }

  test("id-only banding path (100 TB form) gives the same answer on sf0.001") {
    val e = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val exact = rows(Dedup.embeddingNearDup(e))
    val lsh = rows(Dedup.embeddingNearDupLsh(e, dim = 64, inlineVectors = false))
    assert(lsh == exact)
  }

  test("auto dispatch: low threshold routes to the exact broadcast form (r7 #1)") {
    val e = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.01")
    // the registered threshold (0.45) is below the LSH-effective bound —
    // output must be bit-identical to the all-pairs oracle
    assert(rows(Dedup.embeddingNearDupAuto(e, dim = 64)) == rows(Dedup.embeddingNearDup(e)))
  }

  test("broadcast size gate: oversized build side falls back to a partitioned cartesian (ADVICE r8)") {
    // a separate session (own SQLConf, shared context) with auto-broadcast
    // off: at a real over-ceiling corpus the stats would blow the planner's
    // threshold too — the tiny test frame needs the same planner behavior
    // forced, or Spark re-broadcasts the unhinted cross join by size
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val e = graft.sources.Tables.embeddings(s2, "/root/testdata/sf0.001")
    val gated = Dedup.embeddingNearDup(e, broadcastMaxBytes = 0L)
    // the fallback must shuffle the n-row sides, never broadcast them...
    val plan = gated.queryExecution.executedPlan.toString
    assert(plan.contains("CartesianProduct"), s"expected partitioned cartesian:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"gate must disable the broadcast:\n$plan")
    // ...and the answer is the SAME exact all-pairs output
    assert(rows(gated) == rows(Dedup.embeddingNearDup(e)))
  }

  test("auto dispatch: high threshold routes to LSH and recovers planted clones") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // 200 deterministic unit-ish vectors + a planted clone (tiny wobble on
    // one dim) of every 10th — clone cosine ≈ 0.9998, far above the 0.9
    // threshold; random pairs sit near 0. The LSH regime must find exactly
    // the planted pairs (clone-grade recall; boundary pairs are the
    // documented LSH trade).
    val dim = 64
    def v(seed: Long): Array[Float] =
      Array.tabulate(dim)(j => StrictMath.sin(seed * 37.0 + j * 13.0).toFloat)
    val base = (0L until 200L).map(i => (i, v(i)))
    val clones = (0L until 200L by 10L).map { i =>
      val c = v(i); c(0) = c(0) + 0.05f; (1000L + i, c)
    }
    val df = (base ++ clones).toDF("vec_id", "embedding")
    val got = Dedup.embeddingNearDupAuto(df, dim, thresholdNum = 9, thresholdDen = 10)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val want = (0L until 200L by 10L).map(i => (i, 1000L + i)).toSet
    assert(want.subsetOf(got), s"missing planted clone pairs: ${(want -- got).take(5)}")
    // and no hallucinated pairs: every reported pair must clear the exact
    // threshold (the verify step guarantees it — this guards the plumbing)
    val exact = rows(Dedup.embeddingNearDup(df, thresholdNum = 9, thresholdDen = 10))
      .map(t => (t._1, t._2)).toSet
    assert(got.subsetOf(exact), s"reported pair below threshold: ${(got -- exact).take(5)}")
  }
}
