package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal
import graft.operators.Multimodal.MediaCodec

/**
 * Perceptual image dedup (dHash). Unit level: the hash's defining
 * invariances on real encoded images — uniform brightness shifts are free,
 * the same pixels render to the same hash through BMP and PNG (bottom-up
 * BMP rows flipped to visual order), JPEG requantization stays within the
 * Hamming budget, distinct images stay far. Operator level: planted
 * near-duplicate re-renders are exactly the recovered pair set.
 */
class ImageDedupSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val w = 32
  private val h = 24
  /** smooth ramp whose gradients are unambiguous at every dHash cell */
  private def ramp(sx: Int, sy: Int, base: Int, bright: Int = 0): Array[Byte] =
    Array.tabulate(w * h * 3) { i =>
      val p = i / 3
      ((p % w * sx + p / w * sy + base + (i % 3) * 5) % 200 + bright).toByte
    }

  test("dHash is exactly invariant to uniform brightness shift (BMP + PNG)") {
    val px = ramp(3, 5, 11)
    val shifted = ramp(3, 5, 11, bright = 7)
    assert(MediaCodec.dHash64(MediaCodec.wrapBmp(w, h, px)) ==
      MediaCodec.dHash64(MediaCodec.wrapBmp(w, h, shifted)))
    assert(MediaCodec.dHash64(MediaCodec.wrapPng(w, h, px)) ==
      MediaCodec.dHash64(MediaCodec.wrapPng(w, h, shifted)))
  }

  test("the same pixels hash identically through BMP and PNG containers") {
    val px = ramp(4, 7, 23)
    // BMP stores rows bottom-up: feed it the row-reversed array so the
    // VISUAL image matches the PNG — dHash must see through the container
    val rowBytes = w * 3
    val flipped = Array.tabulate(px.length) { i =>
      px((h - 1 - i / rowBytes) * rowBytes + i % rowBytes)
    }
    val viaBmp = MediaCodec.dHash64(MediaCodec.wrapBmp(w, h, flipped))
    val viaPng = MediaCodec.dHash64(MediaCodec.wrapPng(w, h, px))
    assert(viaBmp.isDefined && viaBmp == viaPng)
  }

  test("JPEG re-encode of the same pixels stays within the Hamming budget; distinct images far") {
    val px = ramp(3, 5, 11)
    val direct = MediaCodec.dHash64(MediaCodec.wrapPng(w, h, px)).get
    val jpeg = MediaCodec.dHash64(MediaCodec.encodeJpeg(w, h, px)).get
    val requant = java.lang.Long.bitCount(direct ^ jpeg)
    assert(requant <= 3, s"JPEG requantization moved $requant dHash bits")
    val other = MediaCodec.dHash64(MediaCodec.wrapPng(w, h, ramp(7, 2, 151))).get
    assert(java.lang.Long.bitCount(direct ^ other) > 10, "distinct images must stay far")
  }

  test("undecodable and non-image payloads yield no hash") {
    assert(MediaCodec.dHash64(Array.fill(100)(42.toByte)).isEmpty)
    assert(MediaCodec.dHash64(MediaCodec.wrapWav(8000, Array.fill(64)(1.toByte))).isEmpty)
  }

  test("operator recovers exactly the planted near-duplicate renders") {
    val n = 300
    val got = Multimodal.imageDHashNearDup(Multimodal.syntheticImageDups(spark, n))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val planted = (0L until n.toLong).collect { case i if i % 10 == 1 => (i - 1, i) }
    val missed = planted.filterNot(got.contains)
    assert(missed.isEmpty, s"planted pairs missed: $missed")
    // a 64-bit sign hash has a real false-positive floor: two wave combos
    // can agree on ≥61 of 72 grid-cell comparisons by coincidence. Bound it
    // (a blowup here would mean the hash stopped discriminating) instead of
    // asserting zero — production pipelines pass dHash candidates to an
    // exact verify tier for the same reason.
    val extra = got.filterNot(planted.contains)
    assert(extra.length <= n / 50,
      s"too many accidental collisions (${extra.length}): ${extra.take(5).mkString(",")}")
  }
}
