package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal
import graft.operators.Multimodal.MediaRecord

/**
 * The image-tier incremental contract (the fifth key space): probing a
 * delta against a persisted [[Multimodal.MediaIndex]] must equal the full
 * [[Multimodal.imageDHashNearDup]] recompute over base ∪ delta restricted
 * to delta-vs-base pairs — same decoder, same pigeonhole blocking, same
 * exact Hamming verify — and the index must round-trip through parquet and
 * append without drift.
 */
class MediaIndexSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val n = 300
  private lazy val media = Multimodal.syntheticImageDups(spark, n)
  // the planted split: originals (and bystanders) are the base snapshot,
  // the % 10 == 1 near-dup re-renders arrive later as the crawl delta
  private lazy val base = media.filter((r: MediaRecord) => r.media_id % 10 != 1)
  private lazy val delta = media.filter((r: MediaRecord) => r.media_id % 10 == 1)

  test("incremental probe ≡ full recompute restricted to delta-vs-base pairs") {
    val inc = Multimodal.incrementalImageNearDup(delta, Multimodal.buildMediaIndex(base))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val deltaIds = (0L until n.toLong).filter(_ % 10 == 1).toSet
    // full recompute emits id_a < id_b once per pair; re-key on the delta
    // member and keep only cross pairs (intra-delta pairs are out of the
    // incremental operator's contract, exactly like incrementalNearDup)
    val full = Multimodal.imageDHashNearDup(media).collect().flatMap { r =>
      val (a, b, d) = (r.getLong(0), r.getLong(1), r.getLong(2))
      (deltaIds.contains(a), deltaIds.contains(b)) match {
        case (true, false) => Some((a, b, d))
        case (false, true) => Some((b, a, d))
        case _ => None
      }
    }.toSet
    assert(inc == full, s"probe/recompute diverge: only-inc=${(inc -- full).take(5)} " +
      s"only-full=${(full -- inc).take(5)}")
    // the fixture's ground truth, directly: every delta render finds its original
    val planted = deltaIds.map(i => (i, i - 1))
    val got = inc.map(t => (t._1, t._2))
    assert(planted.subsetOf(got), s"planted pairs missed: ${(planted -- got).take(5)}")
  }

  test("index round-trips through parquet (write/read probe parity)") {
    val dir = java.nio.file.Files.createTempDirectory("mediaidx").toString
    Multimodal.writeMediaIndex(Multimodal.buildMediaIndex(base), dir)
    val viaDisk = Multimodal
      .incrementalImageNearDup(delta, Multimodal.readMediaIndex(spark, dir))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val direct = Multimodal.incrementalImageNearDup(delta, Multimodal.buildMediaIndex(base))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(viaDisk == direct)
  }

  test("append ≡ fresh build (no frequency bookkeeping, so unconditionally)") {
    val lim = n / 2L // local: a closure over the spec's fields would drag the suite into the task
    val half = media.filter((r: MediaRecord) => r.media_id % 10 != 1 && r.media_id < lim)
    val rest = media.filter((r: MediaRecord) => r.media_id % 10 != 1 && r.media_id >= lim)
    val appended = Multimodal.appendMediaIndex(Multimodal.buildMediaIndex(half), rest)
      .hashes.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val fresh = Multimodal.buildMediaIndex(base)
      .hashes.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(appended == fresh)
  }

  test("probe plan: delta chunk keys broadcast, index never shuffled") {
    val plan = Multimodal.incrementalImageNearDup(delta, Multimodal.buildMediaIndex(base))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"delta chunks must broadcast into the index join:\n$plan")
    // the only permitted exchange is the delta-sized candidate distinct +
    // the final orderBy's range partitioning; the index side must reach the
    // join through scan → project → explode with no hash exchange before it
    val joinIdx = plan.indexOf("BroadcastHashJoin")
    val beforeJoin = plan.substring(joinIdx)
    assert(!beforeJoin.contains("Exchange hashpartitioning"),
      s"index side must not shuffle below the broadcast join:\n$plan")
  }

  test("dual tier: stripe edits sit beyond the dHash radius yet surface via the column twin") {
    val edits = Multimodal.syntheticImageEdits(spark, n)
    val eBase = edits.filter((r: MediaRecord) => r.media_id % 10 != 1)
    val eDelta = edits.filter((r: MediaRecord) => r.media_id % 10 == 1)
    val idx = Multimodal.buildMediaIndex(eBase)
    val single = Multimodal.incrementalImageNearDup(eDelta, idx)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val dual = Multimodal.incrementalImageNearDupDual(eDelta, idx)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val planted = (0L until n.toLong).filter(_ % 10 == 1).map(i => (i, i - 1)).toSet
    val dualPairs = dual.map(t => (t._1, t._2)).toSet
    assert(planted.subsetOf(dualPairs),
      s"every stripe edit must find its original: ${(planted -- dualPairs).take(5)}")
    assert(single.subsetOf(dualPairs), "the dual probe must never lose a single-hash match")
    val plantedRows = dual.filter(t => t._2 == t._1 - 1)
    assert(plantedRows.forall(_._4 <= 3),
      s"the column twin must hold within radius on every edit: " +
        s"${plantedRows.filter(_._4 > 3).take(5).toSeq}")
    // the tier's reason to exist: for MOST edits the row-gradient hash is
    // damaged beyond the radius (two boundary columns × 8 rows), and those
    // pairs are exactly the single-hash probe's misses
    val beyond = plantedRows.filter(_._3 > 3)
    assert(beyond.length * 2 >= planted.size,
      s"stripe must damage dHash beyond radius for most pairs: ${beyond.length}/${planted.size}")
    assert(beyond.forall(t => !single.contains((t._1, t._2))),
      "pairs beyond the dHash radius must be single-probe misses (else the fixture is weak)")
  }
}
