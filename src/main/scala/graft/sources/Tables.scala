package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/**
 * Centralized Parquet source layer (SURVEY §2.1 S1: the reference's only source
 * is an HBase region scan; ours is columnar Parquet, where partition-parallel
 * scanning, predicate pushdown, and column pruning come from the file source).
 *
 * HBase connector seam: against a live cluster these readers would be the one
 * place to swap `spark.read.parquet` for an HBase DataSource (e.g. the
 * `hbase-connectors` Spark module or a TableSnapshotInputFormat scan of HFiles)
 * producing the same (key: binary, qualifier: binary, ts, value: binary)
 * columns — everything downstream ([[graft.functions.RowKeys]] mask extraction,
 * [[graft.functions.Decoders]] value interpreters, TsAgg plans) is agnostic to
 * which source produced the DataFrame. This sandbox has no HBase, so
 * [[Fixtures.keyedEvents]] materializes that exact cell layout from the
 * driver's Parquet testdata instead (FIXTURES.md).
 *
 * Normalization handled here so every operator sees one canonical schema:
 *  - `TIMESTAMP(NANOS)` parquet columns (events.ts) are unsupported by Spark 4's
 *    vectorized reader; we read them as raw Long nanos via the legacy conf and
 *    convert to TimestampType (µs precision) — the same floor DuckDB's
 *    `epoch_ms` sees.
 *  - TimestampNTZ columns are cast to TimestampType; sessions are pinned UTC so
 *    the instant is unchanged.
 */
object Tables {

  private def readNormalized(s: SparkSession, path: String): DataFrame = {
    // Dynamic SQL conf — set defensively so the driver's own session works too.
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = s.read.parquet(path)
    raw.schema.fields.foldLeft(raw) { (df, f) =>
      f.dataType match {
        case TimestampNTZType => df.withColumn(f.name, col(f.name).cast(TimestampType))
        case _ => df
      }
    }
  }

  /** `events`: ts arrives as Long nanos under nanosAsLong — convert to TimestampType. */
  def events(s: SparkSession, dir: String): DataFrame = events(s, dir, None)

  /**
   * `events` with an optional epoch-millis scan range `[t0, end)`.
   *
   * The range predicate is applied to the RAW parquet column *before* the
   * ns→µs conversion: a filter phrased on the converted expression
   * (`unix_millis(timestamp_micros(ts div 1000)) >= t0`) never reaches the
   * scan (`PushedFilters: [IsNotNull(ts)]` only), which at 100 TB forfeits all
   * row-group/min-max pruning. On the raw nanos long the bound is exact
   * (`tMs·10⁶`) and shows up in `PushedFilters`, so Parquet skips every
   * row group outside the window before decoding a single page.
   */
  def events(s: SparkSession, dir: String, boundsMs: Option[(Long, Long)]): DataFrame = {
    val df = readNormalized(s, s"$dir/events.parquet")
    df.schema("ts").dataType match {
      case LongType => // nanos-as-long path
        val bounded = boundsMs match {
          case Some((t0, end)) =>
            df.filter(col("ts") >= lit(t0 * 1000000L) && col("ts") < lit(end * 1000000L))
          case None => df
        }
        bounded.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case _ =>
        boundsMs match {
          case Some((t0, end)) =>
            df.filter(col("ts") >= timestamp_millis(lit(t0)) && col("ts") < timestamp_millis(lit(end)))
          case None => df
        }
    }
  }

  def lineitem(s: SparkSession, dir: String): DataFrame = readNormalized(s, s"$dir/lineitem.parquet")

  /** `lineitem` with an epoch-millis ship-date range pushed down on the raw
    * NTZ column (a filter on the post-cast LTZ column would not prune). */
  def lineitemShipRange(s: SparkSession, dir: String, t0Ms: Long, endMs: Long): DataFrame = {
    val raw = s.read.parquet(s"$dir/lineitem.parquet")
    val bounded = raw.schema("l_shipdate").dataType match {
      case TimestampNTZType =>
        def ntz(ms: Long) = typedLit(
          java.time.LocalDateTime.ofInstant(java.time.Instant.ofEpochMilli(ms), java.time.ZoneOffset.UTC))
        raw.filter(col("l_shipdate") >= ntz(t0Ms) && col("l_shipdate") < ntz(endMs))
      case _ =>
        raw.filter(col("l_shipdate") >= timestamp_millis(lit(t0Ms)) &&
          col("l_shipdate") < timestamp_millis(lit(endMs)))
    }
    bounded.schema.fields.foldLeft(bounded) { (df, f) =>
      f.dataType match {
        case TimestampNTZType => df.withColumn(f.name, col(f.name).cast(TimestampType))
        case _ => df
      }
    }
  }
  def orders(s: SparkSession, dir: String): DataFrame = readNormalized(s, s"$dir/orders.parquet")
  def customer(s: SparkSession, dir: String): DataFrame = readNormalized(s, s"$dir/customer.parquet")
  def supplier(s: SparkSession, dir: String): DataFrame = readNormalized(s, s"$dir/supplier.parquet")
  def part(s: SparkSession, dir: String): DataFrame = readNormalized(s, s"$dir/part.parquet")
  def nation(s: SparkSession, dir: String): DataFrame = readNormalized(s, s"$dir/nation.parquet")
  def region(s: SparkSession, dir: String): DataFrame = readNormalized(s, s"$dir/region.parquet")
  def documents(s: SparkSession, dir: String): DataFrame = readNormalized(s, s"$dir/documents.parquet")
  def embeddings(s: SparkSession, dir: String): DataFrame = readNormalized(s, s"$dir/embeddings.parquet")
}
