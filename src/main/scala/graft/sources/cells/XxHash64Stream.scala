package graft.sources.cells

/**
 * Streaming xxHash64 (Yann Collet's public-domain XXH64 algorithm) for the
 * region-file integrity footer — VERDICT r17 next #3: region IO bypasses
 * Hadoop's client-side CRC on local paths ([[CellRegionFormat.rawFs]]), so
 * the format's magic + length bounds caught truncation and framing damage
 * but a flipped bit INSIDE an 8-byte value decoded to a silently wrong
 * long/double. This hash restores at-rest detection for ~zero hot-path
 * cost: the writer updates it per buffered flush, the cursor per 1 MiB
 * refill, and the single comparison happens once per file at EOF.
 *
 * Why hand-rolled: Spark ships only ONE-SHOT XXH64
 * (`o.a.s.sql.catalyst.expressions.XXH64.hashUnsafeBytes`) — a region file
 * streams through a fixed 1 MiB window on both sides, and chunk-chained
 * one-shot hashing would force identical chunk boundaries on writer and
 * reader (they differ: the writer flushes at buffer fills, the cursor
 * compacts at cell boundaries). This class keeps the standard XXH64
 * streaming state (4 lane accumulators + a 32-byte carry), so the digest
 * is boundary-independent — RegionIntegritySpec pins it byte-for-byte
 * against Spark's one-shot across lengths and split points.
 *
 * Not thread-safe (one instance per stream, like the cursor itself).
 */
final class XxHash64Stream(seed: Long) {
  import XxHash64Stream._

  private var v1 = seed + P1 + P2
  private var v2 = seed + P2
  private var v3 = seed
  private var v4 = seed - P1
  private var totalLen = 0L
  // carry: input tail that doesn't fill a 32-byte stripe yet
  private val carry = new Array[Byte](32)
  private var carryLen = 0

  def update(b: Array[Byte], off: Int, len: Int): Unit = {
    if (len <= 0) return
    totalLen += len
    var p = off
    val end = off + len
    if (carryLen > 0) {
      val take = math.min(32 - carryLen, len)
      System.arraycopy(b, p, carry, carryLen, take)
      carryLen += take
      p += take
      if (carryLen == 32) { processStripe(carry, 0); carryLen = 0 }
    }
    while (end - p >= 32) { processStripe(b, p); p += 32 }
    if (p < end) {
      System.arraycopy(b, p, carry, 0, end - p)
      carryLen = end - p
    }
  }

  private def processStripe(b: Array[Byte], p: Int): Unit = {
    v1 = round(v1, le64(b, p))
    v2 = round(v2, le64(b, p + 8))
    v3 = round(v3, le64(b, p + 16))
    v4 = round(v4, le64(b, p + 24))
  }

  /** Current digest — non-destructive, so a caller can hash the footer
    * bytes through the same stream after freezing the payload digest. */
  def digest(): Long = {
    var h =
      if (totalLen >= 32)
        mergeRound(mergeRound(mergeRound(mergeRound(
          java.lang.Long.rotateLeft(v1, 1) + java.lang.Long.rotateLeft(v2, 7) +
            java.lang.Long.rotateLeft(v3, 12) + java.lang.Long.rotateLeft(v4, 18),
          v1), v2), v3), v4)
      else seed + P5
    h += totalLen
    // tail (< 32 carried bytes): 8-byte, then 4-byte, then single-byte steps
    var p = 0
    while (carryLen - p >= 8) {
      h ^= round(0L, le64(carry, p))
      h = java.lang.Long.rotateLeft(h, 27) * P1 + P4
      p += 8
    }
    if (carryLen - p >= 4) {
      h ^= (le32(carry, p) & 0xffffffffL) * P1
      h = java.lang.Long.rotateLeft(h, 23) * P2 + P3
      p += 4
    }
    while (p < carryLen) {
      h ^= (carry(p) & 0xffL) * P5
      h = java.lang.Long.rotateLeft(h, 11) * P1
      p += 1
    }
    h ^= h >>> 33; h *= P2
    h ^= h >>> 29; h *= P3
    h ^= h >>> 32
    h
  }

  private def le64(b: Array[Byte], p: Int): Long =
    (b(p) & 0xffL) | ((b(p + 1) & 0xffL) << 8) | ((b(p + 2) & 0xffL) << 16) |
      ((b(p + 3) & 0xffL) << 24) | ((b(p + 4) & 0xffL) << 32) |
      ((b(p + 5) & 0xffL) << 40) | ((b(p + 6) & 0xffL) << 48) |
      ((b(p + 7) & 0xffL) << 56)

  private def le32(b: Array[Byte], p: Int): Int =
    (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8) |
      ((b(p + 2) & 0xff) << 16) | ((b(p + 3) & 0xff) << 24)
}

object XxHash64Stream {
  // the standard XXH64 primes
  private final val P1 = 0x9E3779B185EBCA87L
  private final val P2 = 0xC2B2AE3D27D4EB4FL
  private final val P3 = 0x165667B19E3779F9L
  private final val P4 = 0x85EBCA77C2B2AE63L
  private final val P5 = 0x27D4EB2F165667C5L

  private def round(acc: Long, input: Long): Long =
    java.lang.Long.rotateLeft(acc + input * P2, 31) * P1

  private def mergeRound(h: Long, v: Long): Long =
    (h ^ round(0L, v)) * P1 + P4
}
