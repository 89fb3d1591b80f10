package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, functions => F}
import org.apache.spark.sql.functions._

import graft.operators.TsAggSpec

/**
 * Structured-Streaming form of the tumbling-bucket aggregation. The reference
 * is strictly batch (SURVEY §2.2: no streaming/watermarks anywhere), but its
 * query — tumbling windows over event time — is exactly what Structured
 * Streaming's windowed aggregation models, so the streaming surface comes
 * almost for free and shares TsAggSpec semantics:
 *
 *  - buckets align to `t0`, not the epoch (SURVEY §2.3 #2): expressed via
 *    `window(..., startTime = t0 mod interval)`, which offsets Spark's
 *    epoch-aligned grid to the same boundaries `t0 + k·interval`;
 *  - the time-range filter bounds the stream to `[t0, scanEnd)` with the
 *    same trailing-bucket rule in key mode;
 *  - empty buckets are never emitted (no rows → no state entry), matching
 *    batch semantics (§2.3 #4).
 *
 * Late data handling (which batch never needed — SURVEY §2.2 note) is the
 * watermark: buckets finalize `watermarkDelay` after their end and state is
 * evicted, bounding memory on an unbounded stream.
 */
object StreamingTsAgg {

  /**
   * Windowed aggregation on a streaming DataFrame whose `spec.tsCol` is a
   * TimestampType event-time column. Returns
   * `(bucket_start: Long millis, <aggs...>)` rows in append mode once the
   * watermark passes each bucket.
   */
  def aggregate(
      stream: DataFrame,
      spec: TsAggSpec,
      aggExprs: Seq[Column],
      watermarkDelay: String = "10 minutes"): DataFrame = {
    val ts = col(spec.tsCol)
    val ivMs = spec.intervalMs
    val startOffsetMs = java.lang.Math.floorMod(spec.mode.t0Ms, ivMs)
    val keys =
      (spec.seriesCols.map(col) :+
        window(ts, s"$ivMs milliseconds", s"$ivMs milliseconds", s"$startOffsetMs milliseconds")
          .as("w"))
    stream
      .filter(ts >= timestamp_millis(lit(spec.mode.t0Ms)) &&
        ts < timestamp_millis(lit(spec.scanEndMs)))
      .withWatermark(spec.tsCol, watermarkDelay)
      .groupBy(keys: _*)
      .agg(aggExprs.head, aggExprs.tail: _*)
      .withColumn("bucket_start", unix_millis(col("w.start")))
      .drop("w")
  }

  def max(stream: DataFrame, spec: TsAggSpec, watermarkDelay: String = "10 minutes"): DataFrame =
    aggregate(stream, spec, Seq(F.max(col(spec.valueCol)).as("max_value")), watermarkDelay)

  def sum(stream: DataFrame, spec: TsAggSpec, watermarkDelay: String = "10 minutes"): DataFrame =
    aggregate(stream, spec, Seq(F.sum(col(spec.valueCol)).as("sum_value")), watermarkDelay)

  def count(stream: DataFrame, spec: TsAggSpec, watermarkDelay: String = "10 minutes"): DataFrame =
    aggregate(stream, spec, Seq(F.count(lit(1)).as("count_value")), watermarkDelay)
}
