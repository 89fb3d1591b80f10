package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Add, Expression, Literal, Pmod, Subtract}
import org.apache.spark.sql.types.{BooleanType, IntegerType, LongType}

import graft.functions.expressions._

/**
 * SQL registration surface: exposes the engine's primitives to `spark.sql`,
 * so the library is usable from pure-SQL contexts (the reference has no SQL
 * surface at all — everything rides a Java client API).
 *
 * {{{
 *   GraftFunctions.register(spark)
 *   spark.sql("SELECT ts_bucket(ts_ms, 1704067200000, 900000) b, max(v) FROM t GROUP BY b")
 *   spark.sql("SELECT array_dot_product(a.embedding, b.embedding) FROM ...")
 *   spark.sql("SELECT bytes_be_to_long(value, 8, true) FROM cells")
 * }}}
 *
 * The same builders are injected application-wide by [[graft.GraftExtensions]]
 * (`--conf spark.sql.extensions=graft.GraftExtensions`) for config-only
 * deployments.
 */
object GraftFunctions {

  /** `ts_bucket(tsMs, t0Ms, intervalMs)` → bucket start, exact long arithmetic
    * (same formula as TsAgg.bucketStartExpr). */
  private def tsBucket(args: Seq[Expression]): Expression = {
    require(args.length == 3, s"ts_bucket(tsMs, t0Ms, intervalMs) takes 3 args, got ${args.length}")
    val Seq(ts, t0, iv) = args
    val d = Subtract(ts, t0)
    Add(t0, Subtract(d, Pmod(d, iv)))
  }

  /** Shape parameters (hash counts, widths, seeds) must be literals — they
    * size codegen'd loops and sign matrices at plan time. */
  private def litInt(e: Expression, fn: String, arg: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case Literal(v: Long, LongType) =>
      // no silent wraps (module stance): a long literal outside Int range is
      // an error, not a truncation
      require(v >= Int.MinValue && v <= Int.MaxValue,
        s"$fn: $arg must fit a 32-bit integer, got $v")
      v.toInt
    case other => throw new IllegalArgumentException(
      s"$fn: $arg must be a literal integer, got $other")
  }
  /** Long-typed literal parameters (seeds) take the full 64-bit range. */
  private def litLong(e: Expression, fn: String, arg: String): Long = e match {
    case Literal(v: Int, IntegerType) => v.toLong
    case Literal(v: Long, LongType) => v
    case other => throw new IllegalArgumentException(
      s"$fn: $arg must be a literal integer, got $other")
  }
  private def litBool(e: Expression, fn: String, arg: String): Boolean = e match {
    case Literal(v: Boolean, BooleanType) => v
    case other => throw new IllegalArgumentException(
      s"$fn: $arg must be a literal boolean, got $other")
  }
  private def arity(args: Seq[Expression], fn: String, n: Int): Unit =
    require(args.length == n, s"$fn takes $n args, got ${args.length}")
  /** Constant long-array parameters (centroid matrices): any FOLDABLE
    * integer-array expression qualifies — `array(1, 2, ...)` in SQL folds at
    * plan time — because the values size plan-time reference objects. */
  private def litLongArray(e: Expression, fn: String, arg: String): Array[Long] = {
    import org.apache.spark.sql.types.ArrayType
    e.dataType match {
      case ArrayType(LongType | IntegerType, _) if e.foldable =>
        val ad = e.eval().asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        require(ad != null, s"$fn: $arg must not be null")
        e.dataType.asInstanceOf[ArrayType].elementType match {
          case LongType => ad.toLongArray()
          case _ => ad.toIntArray().map(_.toLong)
        }
      case other => throw new IllegalArgumentException(
        s"$fn: $arg must be a foldable integer-array expression, got $other")
    }
  }

  /** (name, usage, builder) for every injectable expression function. */
  val expressionFunctions: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("ts_bucket",
      "ts_bucket(tsMs, t0Ms, intervalMs) - tumbling-bucket start, exact long arithmetic",
      tsBucket _),
    ("array_dot_product",
      "array_dot_product(a, b) - codegen'd dot product (long arrays -> long, float/double -> double)",
      (args: Seq[Expression]) => { arity(args, "array_dot_product", 2)
        ArrayDotProduct(args(0), args(1)) }),
    ("minhash_signature",
      "minhash_signature(hashes, numHashes, seed) - MinHash signature of a hashed-shingle array",
      (args: Seq[Expression]) => { arity(args, "minhash_signature", 3)
        MinHashSignature(args(0), litInt(args(1), "minhash_signature", "numHashes"),
          litLong(args(2), "minhash_signature", "seed")) }),
    ("simhash_packed",
      "simhash_packed(hashes) - 64-bit SimHash as array(loWord, hiWord)",
      (args: Seq[Expression]) => { arity(args, "simhash_packed", 1)
        SimHashPacked(args(0)) }),
    ("srp_lsh_keys",
      "srp_lsh_keys(vec, dim, tables, planesPerTable) - all random-hyperplane LSH band keys in one pass",
      (args: Seq[Expression]) => { arity(args, "srp_lsh_keys", 4)
        SrpLshKeys(args(0), litInt(args(1), "srp_lsh_keys", "dim"),
          litInt(args(2), "srp_lsh_keys", "tables"),
          litInt(args(3), "srp_lsh_keys", "planesPerTable")) }),
    ("bytes_be_to_long",
      "bytes_be_to_long(bin, width, signed) - big-endian fixed-width binary -> long",
      (args: Seq[Expression]) => { arity(args, "bytes_be_to_long", 3)
        BytesBEToLong(args(0), litInt(args(1), "bytes_be_to_long", "width"),
          litBool(args(2), "bytes_be_to_long", "signed")) }),
    ("long_to_bytes_be",
      "long_to_bytes_be(v, width) - long -> width-byte big-endian binary (hard error on overflow)",
      (args: Seq[Expression]) => { arity(args, "long_to_bytes_be", 2)
        LongToBytesBE(args(0), litInt(args(1), "long_to_bytes_be", "width")) }),
    ("long_bits_to_double",
      "long_bits_to_double(bits) - IEEE-754 bit pattern -> double",
      (args: Seq[Expression]) => { arity(args, "long_bits_to_double", 1)
        LongBitsToDouble(args(0)) }),
    ("winnow_fingerprints",
      "winnow_fingerprints(gramHashes, window) - MOSS winnowing fingerprints of an ordered gram-hash array",
      (args: Seq[Expression]) => { arity(args, "winnow_fingerprints", 2)
        WinnowFingerprints(args(0), litInt(args(1), "winnow_fingerprints", "window")) }),
    ("nearest_centroids_q",
      "nearest_centroids_q(qv, centroids, nlist, dim, nprobe) - integer-exact top-n cell assignment (quantized vector vs foldable centroid array)",
      (args: Seq[Expression]) => { arity(args, "nearest_centroids_q", 5)
        NearestCentroidsQ(args(0),
          litLongArray(args(1), "nearest_centroids_q", "centroids"),
          litInt(args(2), "nearest_centroids_q", "nlist"),
          litInt(args(3), "nearest_centroids_q", "dim"),
          litInt(args(4), "nearest_centroids_q", "nprobe")) }),
    ("image_dhash",
      "image_dhash(payload) - 64-bit perceptual difference hash of an encoded image (NULL when undecodable)",
      (args: Seq[Expression]) => { arity(args, "image_dhash", 1)
        ImageDHash(args(0)) })
  )

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    expressionFunctions.foreach { case (name, _, builder) =>
      reg.createOrReplaceTempFunction(name, builder, "built-in")
    }
    Aggregators.registerAll(spark) // graft_avg / graft_wavg UDAFs
  }
}
