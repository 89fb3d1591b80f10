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
   * One codegen'd byte loop ([[expressions.BytesBEToLong]]) — no hex/conv
   * string round-trips in the hot decode path. Length mismatch is a hard
   * error ("expected 8 bytes"), never a silent zero.
   */
  val longBE: Decoder = bin => expressions.BytesBEToLong(bin, 8)

  /** 4-byte big-endian two's-complement binary → Int (as Long). */
  val intBE: Decoder = bin => expressions.BytesBEToLong(bin, 4)

  /** UTF-8 bytes of a decimal string → Double. */
  val utf8Double: Decoder = bin => bin.cast("string").cast("double")

  /** 8-byte big-endian IEEE-754 bits → Double (codegen'd bit reinterpret —
    * exact for every value, no per-row reflection). */
  val doubleBE: Decoder = bin => expressions.LongBitsToDouble(longBE(bin))

  /**
   * PARAMETERIZED interpreter — the reference ships per-request interpreter
   * init bytes alongside the class name (`TimeseriesAggregate.proto:31,33`,
   * `specified_filters` deserialized in the coprocessor); here the parameter
   * is a plain Scala argument captured by the returned decoder. 8-byte BE
   * two's-complement fixed-point: stored integer = value × 10^scale (the
   * standard money/sensor encoding), decoded to an EXACT decimal — the
   * division runs in decimal arithmetic, never floating point, so
   * sum-then-decode and decode-then-sum agree to the last cent.
   */
  def fixedPoint(scale: Int, precision: Int = 19): Decoder = {
    require(scale >= 0 && scale < precision,
      s"fixedPoint needs 0 <= scale < precision, got scale=$scale precision=$precision")
    bin =>
      // intermediate cast is decimal(19,0) — every two's-complement long fits
      // (19 digits), so the decode itself is total; only the caller-requested
      // final (precision, scale) can overflow, and under ANSI mode it does so
      // loudly rather than silently nulling
      (expressions.BytesBEToLong(bin, 8).cast("decimal(19,0)") /
        lit(BigDecimal(10).pow(scale)))
        .cast(s"decimal($precision,$scale)")
  }
}
