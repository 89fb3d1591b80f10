package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/**
 * SemDeDup (semantic dedup) — planted-redundancy ground truth: well-separated
 * direction clusters with exact near-copies inside them. Every near-copy must
 * fall (keep = false, same cell as its original), every original and every
 * isolated vector must survive, and the answer must be invariant under
 * repartitioning (the integer argmax + integer cosine leave nothing to float
 * or order luck).
 */
class SemDedupSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val dim = 8

  /** unit-ish basis direction d with a small deterministic wobble */
  private def vec(d: Int, wobble: Float = 0f): Array[Float] =
    Array.tabulate(dim)(i => (if (i == d) 1f else 0f) + (if (i == (d + 1) % dim) wobble else 0f))

  test("planted near-copies fall, originals and isolates survive, cells agree") {
    // 4 direction clusters; ids 0..3 originals, 10..13 near-copies (cos≈0.999),
    // 20..23 FAR vectors in the same directions but negated (cos = -1: same
    // argmax never, they get their own cells or survive regardless)
    val rows =
      (0 until 4).map(d => (d.toLong, vec(d))) ++
      (0 until 4).map(d => (10L + d, vec(d, wobble = 0.02f))) ++
      (0 until 4).map(d => (20L + d, vec(d).map(-_)))
    val df = rows.toDF("vec_id", "embedding")
    // centroids pinned to the 4 directions + their negations → assignment is
    // unambiguous; threshold 9/10 catches the 0.999 copies, not the isolates
    val cents = ((0 until 4).map(d => vec(d).map(_.toDouble)) ++
      (0 until 4).map(d => vec(d).map(x => -x.toDouble))).flatten.toArray
    val out = Dedup.semanticDedup(df, dim, nlist = 8, centroids = Some(cents))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    val keep = out.map(t => t._1 -> t._3).toMap
    val cell = out.map(t => t._1 -> t._2).toMap
    for (d <- 0 until 4) {
      assert(keep(d.toLong), s"original $d must survive")
      assert(!keep(10L + d), s"near-copy ${10 + d} must fall")
      assert(cell(d.toLong) == cell(10L + d), s"copy must share its original's cell")
      assert(keep(20L + d), s"negated isolate ${20 + d} must survive")
    }
  }

  test("deterministic under repartitioning") {
    val rows = (0 until 40).map { i =>
      (i.toLong, Array.tabulate(dim)(j => math.sin(i * 7 + j * 3).toFloat))
    }
    val df = rows.toDF("vec_id", "embedding")
    val cents = graft.operators.Similarity.trainIvfCentroids(df, dim, nlist = 4)
    val a = Dedup.semanticDedup(df, dim, nlist = 4, centroids = Some(cents))
      .collect().map(_.toSeq)
    val b = Dedup.semanticDedup(df.repartition(7), dim, nlist = 4, centroids = Some(cents))
      .collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq)
  }

  test("FarthestFromCentroid policy keeps the outlier regardless of ids (the paper's rule)") {
    // centroid = e0. id 1 sits EXACTLY on the centroid (cos 1), id 2 is the
    // wobbled outlier (cos < 1). Under keep-lowest-id, 1 survives; under the
    // paper's farthest-from-centroid rule, 2 must survive DESPITE the higher
    // id — diversity beats recency/order.
    val rows = Seq((1L, vec(0)), (2L, vec(0, wobble = 0.05f)))
    val df = rows.toDF("vec_id", "embedding")
    val cents = vec(0).map(_.toDouble) ++ vec(4).map(_.toDouble)
    val far = Dedup.semanticDedup(df, dim, nlist = 2, centroids = Some(cents),
      keep = Dedup.SemKeep.FarthestFromCentroid)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(far == Map(1L -> false, 2L -> true), s"outlier must survive: $far")
    val low = Dedup.semanticDedup(df, dim, nlist = 2, centroids = Some(cents))
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(low == Map(1L -> true, 2L -> false))
    // within a redundant GROUP the order-minimum survives: three copies at
    // increasing distance from the centroid → only the farthest remains
    val trio = Seq((10L, vec(0, 0.01f)), (11L, vec(0, 0.06f)), (12L, vec(0, 0.03f)))
      .toDF("vec_id", "embedding")
    val got = Dedup.semanticDedup(trio, dim, nlist = 2, centroids = Some(cents),
      keep = Dedup.SemKeep.FarthestFromCentroid)
      .collect().filter(_.getBoolean(2)).map(_.getLong(0)).toSeq
    assert(got == Seq(11L), s"only the farthest copy survives: $got")
  }

  test("FarthestFromCentroid is exact for CROSS-CELL (nassign spill) pairs with unequal centroid norms") {
    // The ADVICE r7 regression shape: the pair's two members have DIFFERENT
    // argmax cells (a boundary-straddle pair, visible only through the
    // nassign=2 spill) and the two centroids have different norms (|c0| = 1,
    // |c1| = 0.5). id 1 sits at cos 0.95 to ITS centroid c1, id 2 at cos 0.90
    // to c0 — the paper's rule keeps the farther member, id 2. The old
    // compare (no centroid-norm² term) ranked cos·|centroid| — 0.475 vs
    // 0.90 — and kept id 1; the lowest-id tie fallthrough would ALSO keep
    // id 1, so survivor == 2 discriminates both failure modes.
    val b1 = Array(0.3122f, 0.95f, 0f, 0f, 0f, 0f, 0f, 0f) // argmax cell 1 (dot 0.475 vs 0.312)
    val a2 = Array(0.9f, 0.4359f, 0f, 0f, 0f, 0f, 0f, 0f) // argmax cell 0 (dot 0.90 vs 0.218)
    val df = Seq((1L, b1), (2L, a2)).toDF("vec_id", "embedding")
    val cents = Array(1.0, 0, 0, 0, 0, 0, 0, 0, /* c1 = 0.5·e1 */ 0, 0.5, 0, 0, 0, 0, 0, 0)
    // pair cosine = 0.695, so threshold 1/2 qualifies it; cells differ, so
    // only the nassign=2 spill can generate the pair at all
    val out = Dedup.semanticDedup(df, dim, nlist = 2, centroids = Some(cents),
      thresholdNum = 1, thresholdDen = 2, keep = Dedup.SemKeep.FarthestFromCentroid)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(out.map(t => t._1 -> t._2).toMap == Map(1L -> 1L, 2L -> 0L),
      s"argmax cells must differ (the cross-cell shape): ${out.mkString(",")}")
    assert(out.filter(_._3).map(_._1).toSeq == Seq(2L),
      s"the farther-from-centroid member must survive the cross-cell compare: ${out.mkString(",")}")
  }

  test("keep-lowest-id policy: within a redundant group exactly the minimum id survives") {
    // 5 copies of one direction — one survivor, the smallest id
    val rows = Seq(3L, 9L, 4L, 7L, 5L).map(id => (id, vec(0, wobble = 0.001f * id)))
    val df = rows.toDF("vec_id", "embedding")
    val cents = vec(0).map(_.toDouble) ++ vec(4).map(_.toDouble)
    val out = Dedup.semanticDedup(df, dim, nlist = 2, centroids = Some(cents))
      .collect().map(r => (r.getLong(0), r.getBoolean(2)))
    assert(out.filter(_._2).map(_._1).toSeq == Seq(3L), s"only id 3 survives: ${out.mkString(",")}")
  }
}
