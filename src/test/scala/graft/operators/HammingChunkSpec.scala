package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/**
 * Pins [[Dedup.hammingChunkKeys]] — the derived-chunk pigeonhole blocking
 * (VERDICT r8 #1): chunk count = maxHamming + 1, so ANY radius in [0, 63]
 * is complete, and the default radius 3 reproduces the original 4 × 16-bit
 * scheme bit-for-bit (committed goldens must not move).
 */
class HammingChunkSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Collect (chunk, ckey) pairs for one hash at one radius. */
  private def keys(h: Long, maxHamming: Int): Seq[(Int, Long)] = {
    Seq(h).toDF("h")
      .select(explode(Dedup.hammingChunkKeys(col("h"), maxHamming)).as("ck"))
      .select("ck.chunk", "ck.ckey")
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
  }

  test("default radius 3 matches the original 4 x 16-bit chunk keys exactly") {
    val samples = Seq(0L, -1L, 0x0123456789ABCDEFL, 0xFEDCBA9876543210L,
      Long.MinValue, Long.MaxValue, 0xDEADBEEFCAFEF00DL)
    for (h <- samples) {
      val expected = (0 until 4).map(c => (c, (h >>> (c * 16)) & 0xFFFFL))
      assert(keys(h, 3) == expected, f"h=$h%016x")
    }
  }

  test("chunk widths cover all 64 bits exactly once at every radius") {
    // reconstruct the hash from its chunks: shifting each ckey back to its
    // start and OR-ing must give the original for every radius
    val h = 0xA5C3E1F00F1E3C5AL
    for (maxHamming <- 0 until 64) {
      val n = maxHamming + 1
      val base = 64 / n; val rem = 64 % n
      val widths = Seq.tabulate(n)(i => base + (if (i < rem) 1 else 0))
      val starts = widths.scanLeft(0)(_ + _)
      val ks = keys(h, maxHamming)
      assert(ks.map(_._1) == (0 until n))
      val rebuilt = ks.map { case (c, k) => k << starts(c) }.reduce(_ | _)
      assert(rebuilt == h, s"radius $maxHamming")
    }
  }

  test("pigeonhole completeness: every pair within the radius shares a chunk") {
    // deterministic pseudo-random base hashes + worst-case spread-out flips:
    // flipping exactly `d` bits at maximally spread positions stresses the
    // "one flip per chunk" adversary that the old fixed-4 scheme lost
    val rnd = new scala.util.Random(42)
    for (_ <- 0 until 20) {
      val h = rnd.nextLong()
      for (d <- Seq(1, 3, 4, 8, 15, 31, 63)) {
        val positions = (0 until d).map(i => (i.toLong * 64 / d).toInt)
        val flipped = positions.foldLeft(h)((acc, p) => acc ^ (1L << p))
        val shared = keys(h, d).toSet intersect keys(flipped, d).toSet
        assert(shared.nonEmpty, s"radius $d lost a pair at distance $d")
      }
    }
  }

  test("simhashNearDup finds spread-bit pairs beyond the old 4-chunk bound") {
    // the r8 regression shape: radius 8 was forbidden by the old guard; now
    // it must run AND find pairs the fixed 4-chunk blocking could miss
    val base = (1 to 60).map(i => s"tok$i").mkString(" ")
    val perturbed = (1 to 60).map(i => if (i == 30) "changed" else s"tok$i").mkString(" ")
    val other = (100 to 160).map(i => s"other$i").mkString(" ")
    val df = Seq((1L, base), (2L, perturbed), (3L, other)).toDF("doc_id", "text")
    val got = Dedup.simhashNearDup(df, maxHamming = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((1L, 2L)))
  }

  test("radius outside [0, 63] fails loud") {
    val df = Seq((1L, "a b c")).toDF("doc_id", "text")
    intercept[IllegalArgumentException](Dedup.simhashNearDup(df, maxHamming = 64))
    intercept[IllegalArgumentException](Dedup.simhashNearDup(df, maxHamming = -1))
  }
}
