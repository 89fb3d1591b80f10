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

  /** One observation: a key with a POSITIVE weight (1 = plain frequency). */
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
      require(v.w > 0, s"SpaceSaving weights must be positive, got ${v.w} for id ${v.id}")
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
      // pairwise sum on the id union (counts and error bounds both add),
      // then keep the m largest — the standard mergeable-summary reduction
      val merged = (a.entries ++ b.entries)
        .groupBy(_.id).valuesIterator
        .map(es => SSEntry(es.head.id, es.map(_.count).sum, es.map(_.err).sum))
        .toSeq
      SSBuf(mutable.ArrayBuffer.from(merged.sorted(ordOut).take(m)))
    }

    /** Top-k by (count desc, id asc); ranks beyond the guarantee are still
      * the sketch's best estimates, flagged by their non-zero `err`. */
    def finish(b: SSBuf): SSBuf = SSBuf(b.entries.sorted(ordOut).take(k).toVector)

    def bufferEncoder: Encoder[SSBuf] = Encoders.product[SSBuf]
    def outputEncoder: Encoder[SSBuf] = Encoders.product[SSBuf]
  }

  def topKByWeight(k: Int, m: Int)(id: Column, weight: Column): Column =
    udaf(SpaceSavingTopK(k, m)).apply(id, weight)
}
