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

  /**
   * `LongColumnInterpreter` equivalent: 8-byte big-endian two's-complement
   * binary → Long (the only interpreter the reference's tests exercise,
   * `TestTimeseriesAggregateProtocol.java:147-148`).
   *
   * Split at the sign byte so the unsigned `conv` path stays exact: for
   * negatives, decode (value - 2^64) via the identity
   * `long = hi32 * 2^32 + lo32` on unsigned halves with hi32 cast back through
   * Int to restore the sign.
   */
  val longBE: Decoder = bin => {
    val hi = conv(hex(substring(bin, 1, 4)), 16, 10).cast("long").cast("int").cast("long")
    val lo = conv(hex(substring(bin, 5, 4)), 16, 10).cast("long")
    when(length(bin) =!= lit(8),
      raise_error(concat(lit("longBE: expected 8 bytes, got "), hex(bin))))
      .otherwise(shiftleft(hi, 32) + lo)
  }

  /** 4-byte big-endian two's-complement binary → Int (as Long). */
  val intBE: Decoder = bin =>
    when(length(bin) =!= lit(4),
      raise_error(concat(lit("intBE: expected 4 bytes, got "), hex(bin))))
      .otherwise(conv(hex(bin), 16, 10).cast("long").cast("int").cast("long"))

  /** UTF-8 bytes of a decimal string → Double. */
  val utf8Double: Decoder = bin => bin.cast("string").cast("double")

  /** 8-byte big-endian IEEE-754 bits → Double. */
  val doubleBE: Decoder = bin => java_method(lit("java.lang.Double"), lit("longBitsToDouble"), longBE(bin))
}
