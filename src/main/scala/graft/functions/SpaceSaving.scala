package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/**
 * SpaceSaving heavy-hitter sketch (Metwally, Agrawal, El Abbadi, "Efficient
 * Computation of Frequent and Top-k Elements in Data Streams", ICDT'05) as a
 * mergeable Spark `Aggregator` — the 100 TB form of per-group top-k by
 * COUNT/weight: where the exact form's first level materializes every
 * (group, key) sum (O(distinct keys) shuffle rows — the honest dominant
 * cost measured in SCALE.md), this sketch holds at most `m` counters per
 * group no matter the key cardinality, and map-side partials cap what
 * leaves each task at O(groups × m).
 *
 * Guarantees (per the paper, preserved by the standard pairwise-sum merge of
 * Agarwal et al., "Mergeable Summaries", PODS'12): with `m` counters over
 * total weight W, every key with true weight > W/m is present; each reported
 * `count` over-estimates its true weight by at most `err` (so
 * `count − err ≤ true ≤ count`). Results depend on observation order — like
 * every counter sketch — so tests bound error and containment, never
 * bit-compare (same treatment as HLL++ / GK elsewhere in this repo).
 *
 * Performance: `reduce` mutates the buffer IN PLACE (the documented
 * `Aggregator` fast path — a fresh immutable buffer per row measured 4×
 * slower at 20M rows) with an id→slot index rebuilt only after an encoder
 * round-trip; the eviction scan is a flat O(m) pass over a small array,
 * allocation-free.
 */
object SpaceSaving {

  case class SSEntry(id: Long, count: Long, err: Long)

  /** One observation: a key with a non-negative weight (1 = plain frequency;
    * 0 = no-op). */
  case class KW(id: Long, w: Long)

  /**
   * Sketch buffer. `entries` is declared `Seq` for the product encoder;
   * at runtime [[SpaceSavingTopK.reduce]] keeps an `ArrayBuffer` there and
   * appends/updates in place. The id index is transient — rebuilt lazily
   * after serialization boundaries, shared by every reduce in between.
   */
  case class SSBuf(var entries: scala.collection.Seq[SSEntry]) {
    @transient private var idx: mutable.LongMap[Int] = _
    private[SpaceSaving] def mutable_! : (mutable.ArrayBuffer[SSEntry], mutable.LongMap[Int]) = {
      entries match {
        case ab: mutable.ArrayBuffer[SSEntry] if idx != null => (ab, idx)
        case other =>
          val ab = mutable.ArrayBuffer.from(other)
          entries = ab
          idx = mutable.LongMap.empty[Int]
          var i = 0
          while (i < ab.length) { idx(ab(i).id) = i; i += 1 }
          (ab, idx)
      }
    }
  }

  // count descending, id ascending — the deterministic output rank
  private val ordOut: Ordering[SSEntry] =
    Ordering.by[SSEntry, Long](_.count).reverse.orElseBy(_.id)

  /** Sketch aggregator: feed `(key, weight > 0)` pairs (weight 1 = plain
    * frequency; a cents column = "top keys by spend"), read top-k
    * `(id, count, err)` where `count` is the estimated weight total. */
  case class SpaceSavingTopK(k: Int, m: Int) extends Aggregator[KW, SSBuf, SSBuf] {
    require(k > 0, s"k must be positive, got $k")
    require(m >= k, s"capacity m ($m) must be >= k ($k); accuracy needs m >> k")

    def zero: SSBuf = SSBuf(mutable.ArrayBuffer.empty[SSEntry])

    def reduce(b: SSBuf, v: KW): SSBuf = {
      require(v.w >= 0, s"SpaceSaving weights must be non-negative, got ${v.w} for id ${v.id}")
      // zero weight adds no mass: a no-op for every count and bound (the one
      // observable difference vs the exact form — a key whose EVERY
      // observation is zero-weight never enters the sketch — is the correct
      // heavy-hitter answer for a key with zero total weight)
      if (v.w == 0) return b
      val (ab, idx) = b.mutable_!
      val at = idx.getOrElse(v.id, -1)
      if (at >= 0) {
        val e = ab(at)
        ab(at) = SSEntry(e.id, e.count + v.w, e.err)
      } else if (ab.length < m) {
        idx(v.id) = ab.length
        ab += SSEntry(v.id, v.w, 0L)
      } else {
        // evict the minimum-count entry (ties: highest id leaves) and adopt
        // its count as the newcomer's over-estimate — the SpaceSaving step
        var vi = 0; var i = 1
        while (i < ab.length) {
          val e = ab(i); val best = ab(vi)
          if (e.count < best.count || (e.count == best.count && e.id > best.id)) vi = i
          i += 1
        }
        val victim = ab(vi)
        idx.remove(victim.id)
        idx(v.id) = vi
        ab(vi) = SSEntry(v.id, victim.count + v.w, victim.count)
      }
      b
    }

    def merge(a: SSBuf, b: SSBuf): SSBuf = {
      if (a.entries.isEmpty) return b
      if (b.entries.isEmpty) return a
      // Parallel SpaceSaving merge (Cafaro, Pulimeno, Tempesta, "A parallel
      // space saving algorithm for frequent items", Inf. Sci. 2016): a key
      // ABSENT from one sketch may still have accrued up to that sketch's
      // minimum count there unseen (min = 0 while the sketch is under
      // capacity — then every observed key is present), so the absent side
      // contributes its minimum to BOTH count and err. Keys present in both
      // simply add counts and error bounds. This keeps the invariants
      // count − err ≤ true ≤ count and "every key with true weight > W/m
      // survives" across distributed / streaming micro-batch merges; the
      // previous plain pairwise-sum-on-the-union dropped the absent-side
      // minimum and could under-estimate after a merge.
      val minA = if (a.entries.size < m) 0L else a.entries.iterator.map(_.count).min
      val minB = if (b.entries.size < m) 0L else b.entries.iterator.map(_.count).min
      val inA = a.entries.iterator.map(e => e.id -> e).toMap
      val inB = b.entries.iterator.map(e => e.id -> e).toMap
      val merged = (inA.keySet ++ inB.keySet).iterator.map { id =>
        (inA.get(id), inB.get(id)) match {
          case (Some(x), Some(y)) => SSEntry(id, x.count + y.count, x.err + y.err)
          case (Some(x), None)    => SSEntry(id, x.count + minB, x.err + minB)
          case (None, Some(y))    => SSEntry(id, y.count + minA, y.err + minA)
          case _                  => throw new IllegalStateException("unreachable")
        }
      }.toSeq
      SSBuf(mutable.ArrayBuffer.from(merged.sorted(ordOut).take(m)))
    }

    /** Top-k by (count desc, id asc); ranks beyond the guarantee are still
      * the sketch's best estimates, flagged by their non-zero `err`. */
    def finish(b: SSBuf): SSBuf = SSBuf(b.entries.sorted(ordOut).take(k).toVector)

    def bufferEncoder: Encoder[SSBuf] = Encoders.product[SSBuf]
    def outputEncoder: Encoder[SSBuf] = Encoders.product[SSBuf]
  }

  def topKByWeight(k: Int, m: Int)(id: Column, weight: Column): Column = {
    AggConf.ensureHashAggHeadroom() // O(m) buffers — same bound as TopK
    udaf(SpaceSavingTopK(k, m)).apply(id, weight)
  }
}
