package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.expressions.BinaryCodec

/**
 * ScalaCheck invariants for the big-endian cell codec — the byte layout every
 * rowkey/qualifier/value in the reference's data model rides on
 * (`Bytes.toInt`/`Bytes.toLong` semantics, `AggregationBuilder.java:84-115`).
 * Runs on the shared static kernel ([[BinaryCodec]]), which both the
 * interpreted and generated expression paths call — ExpressionSpec and
 * DecodersClientSpec tie that kernel to the distributed plans.
 */
class BinaryCodecPropertySpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(2000).withInitialSeed(7L), p)
    assert(res.passed, res.status.toString)
  }

  private val genWidth = Gen.choose(1, 8)

  private def signedRange(w: Int): Gen[Long] =
    if (w == 8) Gen.choose(Long.MinValue, Long.MaxValue)
    else Gen.choose(-(1L << (8 * w - 1)), (1L << (8 * w - 1)) - 1)

  private def unsignedRange(w: Int): Gen[Long] =
    Gen.choose(0L, if (w == 8) Long.MaxValue else (1L << (8 * w)) - 1)

  test("signed roundtrip: decode(encode(v)) == v for every width and in-range value") {
    check(Prop.forAll(genWidth) { w =>
      Prop.forAll(signedRange(w)) { v =>
        BinaryCodec.decodeBE(BinaryCodec.be(v, w), w, signed = true) == v
      }
    })
  }

  test("unsigned roundtrip for widths <= 7 over the full unsigned range") {
    check(Prop.forAll(Gen.choose(1, 7)) { w =>
      Prop.forAll(unsignedRange(w)) { v =>
        BinaryCodec.decodeBE(BinaryCodec.be(v, w), w, signed = false) == v
      }
    })
  }

  test("encode matches JDK big-endian reference for ints and longs") {
    check(Prop.forAll(Gen.choose(Int.MinValue, Int.MaxValue)) { v =>
      val jdk = java.nio.ByteBuffer.allocate(4).putInt(v).array()
      java.util.Arrays.equals(BinaryCodec.be(v.toLong, 4), jdk)
    })
    check(Prop.forAll(Gen.choose(Long.MinValue, Long.MaxValue)) { v =>
      val jdk = java.nio.ByteBuffer.allocate(8).putLong(v).array()
      java.util.Arrays.equals(BinaryCodec.be(v, 8), jdk)
    })
  }

  test("byte order is big-endian: more-significant bytes first, values order-preserving") {
    // for non-negative values of equal width, unsigned lexicographic byte
    // order == numeric order — the property HBase rowkey scans depend on.
    // width 8 draws from the full non-negative long range so the MOST
    // significant byte (the fixture's user_id prefix) is exercised too
    check(Prop.forAll(genWidth) { w =>
      val gen = if (w == 8) Gen.choose(0L, Long.MaxValue) else unsignedRange(w)
      Prop.forAll(gen, gen) { (a, b) =>
        val (ba, bb) = (BinaryCodec.be(a, w), BinaryCodec.be(b, w))
        val cmp = graft.functions.RowKeys.unsignedCompare(ba, bb)
        (a.compare(b).sign == cmp.sign): Prop
      }
    })
  }

  test("out-of-range encode is a hard error, never a wrap") {
    check(Prop.forAll(Gen.choose(1, 7)) { w =>
      val over = (1L << (8 * w)) // first value past the unsigned range
      val under = -(1L << (8 * w - 1)) - 1
      Prop.throws(classOf[IllegalArgumentException])(BinaryCodec.be(over, w)) &&
      Prop.throws(classOf[IllegalArgumentException])(BinaryCodec.be(under, w))
    })
  }

  test("wrong-length decode is a hard error") {
    check(Prop.forAll(genWidth, Gen.choose(0, 16)) { (w, len) =>
      len == w || Prop.throws(classOf[IllegalArgumentException])(
        BinaryCodec.decodeBE(new Array[Byte](len), w, signed = true))
    })
  }
}
