package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType, TimestampType}

/**
 * Temporal joins — the two join shapes a time-series store grows the moment
 * its users have more than one table: as-of (each left event matched to the
 * latest right event at-or-before it) and range (points matched to enclosing
 * intervals). The reference engine is strictly single-table
 * (SURVEY §2.2 — `AggregationBuilder.java:74-91` scans exactly one family),
 * so these are beyond-reference operators, built Spark-first:
 *
 *  - [[Joins.asofJoin]] never materializes a join at all: both sides are
 *    UNIONED, shuffled once by key, and the match is a running
 *    `last(_, ignoreNulls)` over the merged time order — O(n log n) within
 *    each key partition, no candidate-pair explosion, no range condition for
 *    the planner to turn into a cartesian. This is the only as-of formulation
 *    that survives a 100 TB fact table: the alternative (join on key + range
 *    filter + per-left-row argmax) shuffles |L|×|R| candidate pairs per key.
 *  - [[Joins.rangeJoin]] turns the interval predicate into an EQUALITY join
 *    on fixed-width time buckets (each interval exploded to the buckets it
 *    overlaps, each point owning exactly one bucket), then verifies exact
 *    containment — the standard interval-binning decomposition. Candidate
 *    fan-out is bounded by interval_len/bucket + 1 per interval, and the
 *    join is a plain hash join on the bucket key (AQE-skew-splittable).
 *    [[Joins.rangeJoinBroadcast]] is the small-interval-table fast path.
 */
object Joins {

  /** `c` normalized to epoch-millis Long regardless of column type. */
  private def tsMs(df: DataFrame, c: String): Column =
    df.schema(c).dataType match {
      case TimestampType => unix_millis(col(c))
      case LongType      => col(c)
      case other =>
        throw new IllegalArgumentException(
          s"ts column '$c' must be TimestampType or LongType epoch millis, got $other")
    }

  /**
   * As-of join: for every left row, the single right row with the greatest
   * `rightTs <= leftTs` (inclusive match) sharing `keyCols`, or nulls when no
   * right row precedes it (left-outer semantics). `rightCols` are the right
   * columns carried into the output; the matched right timestamp is emitted
   * as `asofTsName`.
   *
   * Semantics notes:
   *  - Ties between MULTIPLE right rows at the same (key, ts) are resolved
   *    deterministically (greatest carried struct wins) but callers should
   *    pre-reduce the right side to one row per (key, ts) — e.g. with
   *    [[Versions.latestCells]] or an `arg_max` aggregate — because "which
   *    quote at this exact millisecond" is a data-model question, not a
   *    join-operator one.
   *  - `toleranceMs`, when set, voids matches older than
   *    `leftTs - toleranceMs` (all emitted right columns become null),
   *    mirroring pandas' `merge_asof(tolerance=...)`.
   *
   * Scale: one hash exchange per side (the union repartitions by `keyCols`),
   * one sort within key partitions, zero join nodes. Skew bound: a window
   * partition holds all rows of one key — same bound as any per-key
   * sessionization; salt upstream if one key carries a whole shard.
   */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTsCol: String,
      rightTsCol: String,
      rightCols: Seq[String],
      asofTsName: String = "asof_ts_ms",
      toleranceMs: Option[Long] = None): DataFrame = {
    require(keyCols.nonEmpty, "asofJoin needs at least one equality key")
    require(rightCols.nonEmpty, "asofJoin needs at least one right value column")
    // internal scratch names + output-name disjointness, checked eagerly: a
    // colliding input would otherwise produce ambiguous-reference analysis
    // errors (or silently duplicated output columns) deep inside the plan
    val reserved = Seq("__t", "__side", "__r", "__rts", "__m")
    val colliding = (left.columns ++ right.columns).filter(reserved.contains).distinct
    require(colliding.isEmpty,
      s"asofJoin reserves internal column name(s) ${colliding.mkString(", ")} — rename them in the inputs")

    val leftPayload = left.columns.filterNot(keyCols.contains).toSeq
    val outClash = (rightCols :+ asofTsName).filter(c => keyCols.contains(c) || leftPayload.contains(c)).distinct
    require(outClash.isEmpty,
      s"asofJoin output collision: ${outClash.mkString(", ")} already present in the left output — " +
        "alias the right columns (or asofTsName) before joining")
    // the right row travels as ONE nullable struct: (ts, value columns...)
    val rStruct = struct((col("__rts").as("__ts") +: rightCols.map(col)): _*)
    val rSide = right
      .withColumn("__rts", tsMs(right, rightTsCol))
      .select(keyCols.map(col) :+ col("__rts").as("__t") :+ rStruct.as("__r"): _*)
      .withColumn("__side", lit(0))
      // left payload columns, null on the right side (union needs one schema)
      .select((keyCols.map(col) ++ Seq(col("__t"), col("__side"), col("__r")) ++
        leftPayload.map(c => lit(null).cast(left.schema(c).dataType).as(c))): _*)
    val lSide = left
      .withColumn("__t", tsMs(left, leftTsCol))
      .withColumn("__side", lit(1))
      .withColumn("__r", lit(null).cast(rSide.schema("__r").dataType))
      .select((keyCols.map(col) ++ Seq(col("__t"), col("__side"), col("__r")) ++
        leftPayload.map(col)): _*)

    // Merged time order: right rows sort BEFORE left rows at equal ts, so an
    // exactly-simultaneous quote matches (inclusive >=). `__r` last in the
    // ordering makes multi-right-row ties deterministic (greatest struct wins).
    val w = Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(col("__t").asc, col("__side").asc, col("__r").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = rSide.unionByName(lSide)
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)

    val fresh = toleranceMs match {
      case Some(tol) => col("__m").isNotNull && col("__t") - col("__m")("__ts") <= lit(tol)
      case None      => col("__m").isNotNull
    }
    val outCols = keyCols.map(col) ++ leftPayload.map(col) ++
      (when(fresh, col("__m")("__ts")).as(asofTsName) +:
        rightCols.map(c => when(fresh, col("__m")(c)).as(c)))
    matched.select(outCols: _*)
  }

  /**
   * Range join: `points` matched to every `intervals` row whose
   * `[loCol, hiCol)` half-open window contains `ptCol`. No equality key
   * required — overlapping intervals are fine (a point joins each one).
   *
   * Decomposition: both sides key on `bucketMs`-aligned time buckets; an
   * interval is exploded to every bucket it overlaps, a point owns exactly
   * one bucket, so each qualifying (point, interval) pair meets exactly once
   * and a plain hash join + exact containment filter is complete — no
   * cartesian, no BroadcastNestedLoopJoin (PlanContractSpec pins this).
   * Choose `bucketMs` near the TYPICAL interval length: fan-out per interval
   * is `len/bucketMs + 1` rows of (bucket, interval-bounds), and the hash
   * table carries intervals only — points never duplicate.
   *
   * `maxFanoutPerInterval` makes a mis-sized `bucketMs` fail LOUD instead of
   * slow: an interval spanning more than that many buckets (a 10-year window
   * at a 900 s bucket is ~350k rows *per interval*) raises a runtime error
   * naming the interval and the fix, rather than silently exploding the
   * exchange (or tripping Spark's sequence element limit with a message that
   * points nowhere near the cause).
   */
  def rangeJoin(
      points: DataFrame,
      intervals: DataFrame,
      ptCol: String,
      loCol: String,
      hiCol: String,
      bucketMs: Long,
      maxFanoutPerInterval: Int = 4096): DataFrame = {
    require(bucketMs > 0, s"bucketMs must be positive, got $bucketMs")
    require(maxFanoutPerInterval > 0,
      s"maxFanoutPerInterval must be positive, got $maxFanoutPerInterval")
    val pt = tsMs(points, ptCol)
    val lo = tsMs(intervals, loCol)
    val hi = tsMs(intervals, hiCol)
    def bucketOf(t: Column): Column = t - pmod(t, lit(bucketMs))
    val ptB = points.withColumn("__pt", pt).withColumn("__b", bucketOf(col("__pt")))
    val nBuckets = (bucketOf(col("__hi") - 1) - bucketOf(col("__lo"))) / lit(bucketMs) + lit(1L)
    val ivB = intervals
      .withColumn("__lo", lo).withColumn("__hi", hi)
      .filter(col("__lo") < col("__hi")) // empty intervals match nothing
      .withColumn("__b", explode(
        when(nBuckets <= lit(maxFanoutPerInterval.toLong),
          sequence(bucketOf(col("__lo")), bucketOf(col("__hi") - 1), lit(bucketMs)))
          .otherwise(raise_error(format_string(
            s"rangeJoin: interval [%s, %s) spans %s buckets of $bucketMs ms — over " +
              s"maxFanoutPerInterval=$maxFanoutPerInterval; choose a coarser bucketMs " +
              "(near the typical interval length) or raise the cap explicitly",
            col("__lo"), col("__hi"), nBuckets)))))
    ptB.join(ivB, Seq("__b"))
      .filter(col("__pt") >= col("__lo") && col("__pt") < col("__hi"))
      .drop("__b", "__pt", "__lo", "__hi")
  }

  /**
   * Broadcast variant for a SMALL interval table (dimension-sized: alert
   * windows, maintenance periods, promo calendars): ships the intervals to
   * every task and evaluates containment inline — zero shuffles on the point
   * side, at the cost of a nested-loop probe per point. Interval tables above
   * broadcast size belong in [[rangeJoin]].
   */
  def rangeJoinBroadcast(
      points: DataFrame,
      intervals: DataFrame,
      ptCol: String,
      loCol: String,
      hiCol: String): DataFrame = {
    val pt = tsMs(points, ptCol)
    val lo = tsMs(intervals, loCol)
    val hi = tsMs(intervals, hiCol)
    val ptB = points.withColumn("__pt", pt)
    val ivB = intervals.withColumn("__lo", lo).withColumn("__hi", hi)
    ptB.join(broadcast(ivB), col("__pt") >= col("__lo") && col("__pt") < col("__hi"))
      .drop("__pt", "__lo", "__hi")
  }
}
