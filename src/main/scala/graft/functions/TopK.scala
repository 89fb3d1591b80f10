package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/**
 * Bounded per-group top-k as an AGGREGATE — the 100 TB shape for
 * "top-k neighbors per query".
 *
 * The window formulation (`row_number().over(Window.partitionBy("qid"))`)
 * shuffles EVERY scored candidate into one reducer per query and sorts it:
 * with a billion-row corpus and ten queries, that is ten partitions holding
 * ten billion rows between them. This aggregator keeps a k-entry buffer
 * instead, so partial aggregation bounds what leaves each map task at
 * `queries × k` rows and the merge is O(k) — the same partial/final split
 * every other graft aggregation rides.
 *
 * Ranking is deterministic and identical to the window form: score
 * descending, id ascending on ties. Long- and Double-scored variants keep
 * the score's exact type end-to-end (the integer-dot oracle query hashes a
 * BIGINT score column).
 */
object TopK {

  case class ScoredL(score: Long, id: Long)
  case class ScoredD(score: Double, id: Long)
  case class BufL(entries: Seq[ScoredL])
  case class BufD(entries: Seq[ScoredD])

  // score descending, id ascending — via Ordering (NOT key negation: -score
  // overflows at Long.MinValue and would rank the worst score first).
  // Contract: scores must be non-null and non-NaN — callers filter both
  // (Similarity.topK does) because NaN has no defensible rank.
  private val ordL: Ordering[ScoredL] =
    Ordering.by[ScoredL, Long](_.score).reverse.orElseBy(_.id)
  private val ordD: Ordering[ScoredD] =
    Ordering.by[ScoredD, Double](_.score)(Ordering.Double.TotalOrdering).reverse.orElseBy(_.id)

  private def trimL(s: Seq[ScoredL], k: Int): Seq[ScoredL] = s.sorted(ordL).take(k)
  private def trimD(s: Seq[ScoredD], k: Int): Seq[ScoredD] = s.sorted(ordD).take(k)

  /** Top-k by exact integer score (descending, ties toward lower id). */
  case class TopKLong(k: Int) extends Aggregator[ScoredL, BufL, BufL] {
    require(k > 0, s"k must be positive, got $k")
    def zero: BufL = BufL(Vector.empty)
    def reduce(b: BufL, v: ScoredL): BufL =
      // fast path: buffer full and v can't enter — no sort, no allocation
      // (entries stay sorted, so the last element IS the current k-th)
      if (b.entries.length == k && ordL.lteq(b.entries.last, v)) b
      else BufL(trimL(b.entries :+ v, k))
    def merge(a: BufL, b: BufL): BufL = BufL(trimL(a.entries ++ b.entries, k))
    def finish(b: BufL): BufL = b
    def bufferEncoder: Encoder[BufL] = Encoders.product[BufL]
    def outputEncoder: Encoder[BufL] = Encoders.product[BufL]
  }

  /** Top-k by double score (descending, ties toward lower id). */
  case class TopKDouble(k: Int) extends Aggregator[ScoredD, BufD, BufD] {
    require(k > 0, s"k must be positive, got $k")
    def zero: BufD = BufD(Vector.empty)
    def reduce(b: BufD, v: ScoredD): BufD =
      if (b.entries.length == k && ordD.lteq(b.entries.last, v)) b
      else BufD(trimD(b.entries :+ v, k))
    def merge(a: BufD, b: BufD): BufD = BufD(trimD(a.entries ++ b.entries, k))
    def finish(b: BufD): BufD = b
    def bufferEncoder: Encoder[BufD] = Encoders.product[BufD]
    def outputEncoder: Encoder[BufD] = Encoders.product[BufD]
  }

  /** Column form: `top_k_long(score, id)` → struct(entries: array<struct>).
    * Construction also raises the session's ObjectHashAggregate fallback
    * threshold set-if-unset ([[AggConf]]) — the O(k) buffer bound is what
    * makes that safe. */
  def topKLong(k: Int)(score: Column, id: Column): Column = {
    AggConf.ensureHashAggHeadroom()
    udaf(TopKLong(k)).apply(score, id)
  }

  def topKDouble(k: Int)(score: Column, id: Column): Column = {
    AggConf.ensureHashAggHeadroom()
    udaf(TopKDouble(k)).apply(score, id)
  }

  case class ScoredS(score: String, id: Long)
  case class BufS(entries: Seq[ScoredS])

  // ASCENDING on (score, id) — the "first k in rank order" dual of the top-k
  // aggregators, used for deterministic hash-ranked sampling: the k smallest
  // hashes per group are a uniform sample that any engine can reproduce with
  // `row_number() OVER (ORDER BY score, id)`.
  private val ordS: Ordering[ScoredS] =
    Ordering.by[ScoredS, String](_.score).orElseBy(_.id)
  private def trimS(s: Seq[ScoredS], k: Int): Seq[ScoredS] = s.sorted(ordS).take(k)

  /** Bottom-k by string score (ascending, ties toward lower id) — same
    * bounded partial/final shape as [[TopKLong]]: map tasks emit ≤ groups×k
    * entries, never a per-row window shuffle. Scores must be non-null.
    * Ordering contract: Java `String.compareTo` (UTF-16 code units), which
    * coincides with Spark's/DuckDB's UTF8-binary string order for ASCII
    * scores — the hash-hex use case this exists for. Non-ASCII scores
    * containing both U+E000..U+FFFF and supplementary characters can rank
    * differently from an engine-side ORDER BY; hash the score first. */
  case class BottomKString(k: Int) extends Aggregator[ScoredS, BufS, BufS] {
    require(k > 0, s"k must be positive, got $k")
    def zero: BufS = BufS(Vector.empty)
    def reduce(b: BufS, v: ScoredS): BufS =
      if (b.entries.length == k && ordS.lteq(b.entries.last, v)) b
      else BufS(trimS(b.entries :+ v, k))
    def merge(a: BufS, b: BufS): BufS = BufS(trimS(a.entries ++ b.entries, k))
    def finish(b: BufS): BufS = b
    def bufferEncoder: Encoder[BufS] = Encoders.product[BufS]
    def outputEncoder: Encoder[BufS] = Encoders.product[BufS]
  }

  def bottomKString(k: Int)(score: Column, id: Column): Column = {
    AggConf.ensureHashAggHeadroom()
    udaf(BottomKString(k)).apply(score, id)
  }
}
