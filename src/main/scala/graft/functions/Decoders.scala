package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Value-decode plug point — the Spark-native equivalent of the reference's
 * `ColumnInterpreter` (SURVEY §2.1 X3). The reference ships a class *name* in
 * the request proto and instantiates it server-side via reflection
 * (`TimeseriesAggregate.proto:31,33`, `TimeseriesAggregateImplementation.java:122-139`);
 * here an interpreter is simply a `Column => Column` decode expression, composed
 * into the plan before aggregation — type-safe, codegen'd, no reflection.
 *
 * The interpreter's other duties (compare / add / divideForAvg / proto codec)
 * collapse into Spark's native numeric semantics and encoders (SURVEY §1.5).
 */
object Decoders {

  /** A decoder turns a raw stored column into a typed value column. */
  type Decoder = Column => Column

  /** Identity — value already typed (the common Parquet case). */
  val typed: Decoder = identity

  /** Unsigned 32-bit value → signed two's complement, without a wrapping cast
    * (ANSI mode makes overflow-casts throw rather than wrap). */
  private def signed32(u: Column): Column =
    when(u >= lit(1L << 31), u - lit(1L << 32)).otherwise(u)

  /**
   * `LongColumnInterpreter` equivalent: 8-byte big-endian two's-complement
   * binary → Long (the only interpreter the reference's tests exercise,
   * `TestTimeseriesAggregateProtocol.java:147-148`).
   *
   * Decoded as `signed(hi32) << 32 | lo32` on unsigned halves from the `conv`
   * path — the shift is a bit operation (never overflow-checked) and the sum
   * stays within Long for every input, so the decode is ANSI-safe for the full
   * two's-complement range.
   */
  val longBE: Decoder = bin => {
    val hi = signed32(conv(hex(substring(bin, 1, 4)), 16, 10).cast("long"))
    val lo = conv(hex(substring(bin, 5, 4)), 16, 10).cast("long")
    when(length(bin) =!= lit(8),
      raise_error(concat(lit("longBE: expected 8 bytes, got "), hex(bin))))
      .otherwise(shiftleft(hi, 32) + lo)
  }

  /** 4-byte big-endian two's-complement binary → Int (as Long). */
  val intBE: Decoder = bin =>
    when(length(bin) =!= lit(4),
      raise_error(concat(lit("intBE: expected 4 bytes, got "), hex(bin))))
      .otherwise(signed32(conv(hex(bin), 16, 10).cast("long")))

  /** UTF-8 bytes of a decimal string → Double. */
  val utf8Double: Decoder = bin => bin.cast("string").cast("double")

  /** 8-byte big-endian IEEE-754 bits → Double. `reflect` returns the string
    * rendering (Double.toString — shortest round-trip form), so the cast back
    * to double is exact for every value. */
  val doubleBE: Decoder = bin =>
    java_method(lit("java.lang.Double"), lit("longBitsToDouble"), longBE(bin)).cast("double")
}
