package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/**
 * Centralized Parquet source layer (SURVEY §2.1 S1: the reference's only source
 * is an HBase region scan; ours is columnar Parquet, where partition-parallel
 * scanning, predicate pushdown, and column pruning come from the file source).
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
  def events(s: SparkSession, dir: String): DataFrame = {
    val df = readNormalized(s, s"$dir/events.parquet")
    if (df.schema("ts").dataType == LongType)
      df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
    else df
  }

  def lineitem(s: SparkSession, dir: String): DataFrame = readNormalized(s, s"$dir/lineitem.parquet")
  def orders(s: SparkSession, dir: String): DataFrame = readNormalized(s, s"$dir/orders.parquet")
  def customer(s: SparkSession, dir: String): DataFrame = readNormalized(s, s"$dir/customer.parquet")
  def supplier(s: SparkSession, dir: String): DataFrame = readNormalized(s, s"$dir/supplier.parquet")
  def part(s: SparkSession, dir: String): DataFrame = readNormalized(s, s"$dir/part.parquet")
  def nation(s: SparkSession, dir: String): DataFrame = readNormalized(s, s"$dir/nation.parquet")
  def region(s: SparkSession, dir: String): DataFrame = readNormalized(s, s"$dir/region.parquet")
  def documents(s: SparkSession, dir: String): DataFrame = readNormalized(s, s"$dir/documents.parquet")
  def embeddings(s: SparkSession, dir: String): DataFrame = readNormalized(s, s"$dir/embeddings.parquet")
}
