package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/**
 * Incremental semantic tier: the probe against a [[Dedup.SemIndex]] must
 * answer exactly like full-corpus [[Dedup.semanticDedup]] over base ∪ delta
 * (with the index's centroids) restricted to delta rows — the same pinned
 * equality every other incremental tier carries — and the index must
 * round-trip through append and disk.
 */
class IncrementalSemanticSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val dim = 8

  /** unit-ish basis direction d (mod 8), negated for d >= 8, with a small
    * deterministic wobble — distinct directions are orthogonal (cos 0), a
    * wobbled copy of the same direction is cos ≈ 0.999 */
  private def v(d: Int, wobble: Float = 0f): Array[Float] = {
    val sign = if (d >= dim) -1f else 1f
    val ax = d % dim
    Array.tabulate(dim)(i =>
      sign * ((if (i == ax) 1f else 0f) + (if (i == (ax + 1) % dim) wobble else 0f)))
  }
  // centroids pinned to the 16 signed directions → assignment is unambiguous
  // and training flakiness is out of the test
  private val cents: Array[Double] =
    (0 until 16).flatMap(d => v(d).map(_.toDouble)).toArray

  // base covers directions 0..5 (two near-copies per direction); delta has
  // planted near-copies of base directions AND novel directions 6, 7, 14, 15
  private lazy val base = (0 until 12).map(i =>
    (i.toLong, v(i % 6, wobble = 0.02f * (i / 6)))).toDF("vec_id", "embedding")
  private lazy val delta = (
    (0 until 3).map(i => (100L + i, v(i, wobble = 0.01f))) ++  // near-copies of base dirs 0..2
    Seq((110L, v(6)), (111L, v(7)), (112L, v(14)), (113L, v(15))) // novel directions
  ).toDF("vec_id", "embedding")

  test("incrementalSemantic == semanticDedup(base ∪ delta, index centroids) restricted to delta") {
    val idx = Dedup.buildSemIndex(base, dim, nlist = 16, centroids = Some(cents))
    val got = Dedup.incrementalSemantic(delta, idx)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSeq
    val want = Dedup.semanticDedup(
        base.unionByName(delta), dim, nlist = 16, centroids = Some(idx.centroids))
      .filter(col("vec_id") >= 100L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSeq
    assert(got == want)
    // liveness, by planted ground truth: every near-copy falls, every novel
    // direction survives
    val keep = got.map(t => t._1 -> t._3).toMap
    assert((0 until 3).forall(i => !keep(100L + i)), s"planted near-copies must fall: $keep")
    assert(Seq(110L, 111L, 112L, 113L).forall(keep), s"novel directions must survive: $keep")
  }

  test("appendSemIndex: grown index answers like a fresh assignment over base ∪ accepted") {
    val idx = Dedup.buildSemIndex(base, dim, nlist = 16, centroids = Some(cents))
    val accepted = delta // fold the whole delta in
    val grown = Dedup.appendSemIndex(idx, accepted)
    // a re-crawl of the same content under fresh ids must be flagged vs the
    // grown index (every re-crawled vector has an identical lower-id twin)
    val recrawl = delta.select((col("vec_id") + 1000L).as("vec_id"), col("embedding"))
    val probe = Dedup.incrementalSemantic(recrawl, grown)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(probe.nonEmpty && probe.values.forall(_ == false),
      s"every re-crawled vector must fall against the grown index: $probe")
    // and the grown cells table equals building from scratch with the SAME
    // centroids (assignment is deterministic, union order irrelevant)
    val fresh = Dedup.buildSemIndex(base.unionByName(accepted), dim, nlist = 16,
      centroids = Some(idx.centroids))
    assert(grown.cells.collect().map(_.toSeq).toSet == fresh.cells.collect().map(_.toSeq).toSet)
  }

  test("semantic index round-trips through disk") {
    val idx = Dedup.buildSemIndex(base, dim, nlist = 16, centroids = Some(cents))
    val dir = java.nio.file.Files.createTempDirectory("graft_semidx_").toString
    try {
      Dedup.writeSemIndex(idx, dir)
      val back = Dedup.readSemIndex(spark, dir)
      assert(back.dim == idx.dim && back.nlist == idx.nlist && back.nassign == idx.nassign)
      assert(back.centroids.toSeq == idx.centroids.toSeq)
      val a = Dedup.incrementalSemantic(delta, idx).collect().map(_.toSeq).toSeq
      val b = Dedup.incrementalSemantic(delta, back).collect().map(_.toSeq).toSeq
      assert(a == b)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }
}
