package graft

import java.time.Instant

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.RowKeys
import graft.operators.{TimeMode, TsAgg, TsAggSpec}

/** Shared local session for all suites. */
object SparkTestSession {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

/**
 * Port of the reference's golden fixture + expectations
 * (`TestTimeseriesAggregateProtocol.java` — the repo's only test file, SURVEY §5):
 * 100 rows, one per hour from 2014-11-10T00:00Z; rowkey = "testRow" + int32-BE
 * epoch-seconds (mask "00000001111"); 100 qualifiers per row at offset-seconds
 * {0,36,…,3564} with values 0..99; cell ts mirrors rowkey+offset (:84-86,110-128).
 * Every 900 s bucket therefore holds 25 samples: max cycles 24/49/74/99,
 * min 0/25/50/75, sum 300/925/1550/2175, avg 12/37/62/87 (:149-161 etc.).
 */
object RefFixture {
  val Mask = "00000001111"
  val BaseSec: Long = Instant.parse("2014-11-10T00:00:00Z").getEpochSecond // 1415577600
  val BaseMs: Long = BaseSec * 1000L

  case class Cell(key: Array[Byte], offset_s: Int, ts: Long, value: Long)

  private def int32BE(v: Int): Array[Byte] =
    Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte, ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  def df(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val prefix = "testRow".getBytes("UTF-8")
    val cells = for {
      row <- 0 until 100
      q <- 0 until 100
    } yield {
      val rowSec = BaseSec + row * 3600L
      val off = q * 36
      Cell(prefix ++ int32BE(rowSec.toInt), off, (rowSec + off) * 1000L, q.toLong)
    }
    // ≥3 partitions to genuinely exercise partial/final merge like the
    // reference's 3-region split (TestTimeseriesAggregateProtocol.java:73-75)
    cells.toDF().repartition(5)
  }
}

class TsAggGoldenSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  lazy val fixture: DataFrame = RefFixture.df(spark).cache()

  import RefFixture.{BaseMs, Mask}
  private val H = 3600000L

  private def collectMap(df: DataFrame): Map[Long, Any] =
    df.collect().map(r => r.getLong(r.fieldIndex("bucket_start")) -> r.get(1)).toMap

  // --- reference test: 2h range, 900s interval, key-embedded mode → 9 buckets
  // (TestTimeseriesAggregateProtocol.java:149-161; trailing bucket SURVEY §2.3 #3)
  test("key mode 2h/900s MAX: 9 buckets, trailing inclusive, cycle 24/49/74/99") {
    val spec = TsAggSpec(900, TimeMode.KeyEmbedded(BaseMs, BaseMs + 2 * H))
    val got = collectMap(TsAgg.max(fixture, spec))
    val exp = (0 until 9).map { k =>
      (BaseMs + k * 900000L) -> (24L + (k % 4) * 25L)
    }.toMap
    assert(got == exp)
  }

  // --- same range, cell-ts (scanner) mode → 8 buckets, cut at t1
  // (TestTimeseriesAggregateProtocol.java:285-307)
  test("cell-ts mode 2h/900s MAX: 8 buckets, hard cut at t1") {
    val spec = TsAggSpec(900, TimeMode.CellTs(BaseMs, BaseMs + 2 * H))
    val got = collectMap(TsAgg.max(fixture, spec))
    assert(got.size == 8)
    assert(got.keySet == (0 until 8).map(k => BaseMs + k * 900000L).toSet)
  }

  // --- alignment to time_min, not epoch: 02:15 start → buckets at :15/:30/:45/:00
  // (TestTimeseriesAggregateProtocol.java:199-224; SURVEY §2.3 #2)
  test("odd 02:15 start aligns buckets to t0: cycle 49/74/99/24") {
    val t0 = BaseMs + 2 * H + 15 * 60000L
    val spec = TsAggSpec(900, TimeMode.KeyEmbedded(t0, t0 + 2 * H))
    val got = collectMap(TsAgg.max(fixture, spec))
    val cycle = Seq(49L, 74L, 99L, 24L)
    val exp = (0 until 9).map(k => (t0 + k * 900000L) -> cycle(k % 4)).toMap
    assert(got == exp)
  }

  // --- range starting before the data: empty leading buckets omitted
  // (TestTimeseriesAggregateProtocol.java:226-252; SURVEY §2.3 #4)
  test("range starting 23:00 prior day emits no empty leading buckets") {
    val t0 = BaseMs - H
    val spec = TsAggSpec(900, TimeMode.KeyEmbedded(t0, t0 + 3 * H))
    val got = collectMap(TsAgg.max(fixture, spec))
    assert(got.keys.min == BaseMs) // first emitted bucket = first with data
    assert(!got.keySet.exists(_ < BaseMs))
  }

  // --- MIN / SUM / COUNT / AVG goldens over one hour of 900s buckets
  // (TestTimeseriesAggregateProtocol.java:328-341,483-496,638-651; SURVEY §2.3 #5-6)
  test("min/sum/count/avg goldens: 625q+300 sums, 25-cell counts, exact avgs") {
    val spec = TsAggSpec(900, TimeMode.CellTs(BaseMs, BaseMs + H))
    assert(collectMap(TsAgg.min(fixture, spec)) ==
      Map(BaseMs -> 0L, (BaseMs + 900000L) -> 25L, (BaseMs + 1800000L) -> 50L, (BaseMs + 2700000L) -> 75L))
    assert(collectMap(TsAgg.sum(fixture, spec)) ==
      Map(BaseMs -> 300L, (BaseMs + 900000L) -> 925L, (BaseMs + 1800000L) -> 1550L, (BaseMs + 2700000L) -> 2175L))
    assert(collectMap(TsAgg.count(fixture, spec)).values.toSeq == Seq.fill(4)(25L))
    assert(collectMap(TsAgg.avg(fixture, spec)) ==
      Map(BaseMs -> 12.0, (BaseMs + 900000L) -> 37.0, (BaseMs + 1800000L) -> 62.0, (BaseMs + 2700000L) -> 87.0))
  }

  // --- 28800s buckets over 4 days (TestTimeseriesAggregateProtocol.java:176-188)
  test("28800s buckets: max 99, min 0, sum 39600, avg 49.5") {
    // key mode so the trailing bucket (start == t1) captures hours 96..99,
    // mirroring the reference's range-larger-than-table golden (:600-613)
    val spec = TsAggSpec(28800, TimeMode.KeyEmbedded(BaseMs, BaseMs + 4 * 24 * H))
    val sums = collectMap(TsAgg.sum(fixture, spec))
    // 100 hourly rows → buckets 0..11 full (8h × 4950 = 39600), trailing bucket
    // at t1 holds hours 96..99 only
    assert(sums(BaseMs) == 39600L)
    assert(collectMap(TsAgg.max(fixture, spec))(BaseMs) == 99L)
    assert(collectMap(TsAgg.min(fixture, spec))(BaseMs) == 0L)
    assert(collectMap(TsAgg.avg(fixture, spec))(BaseMs) == 49.5)
    assert(sums(BaseMs + 12 * 28800000L) == 4 * 4950L) // partial trailing data
  }

  // --- key-embedded extraction roundtrip (P1/P2, AggregationBuilder.java:84-115)
  test("rowkey mask extraction reproduces the cell timestamp exactly") {
    val extracted = fixture
      .withColumn("ts_ms", RowKeys.keyMillis(col("key"), Mask, col("offset_s")))
      .filter(col("ts_ms") =!= col("ts"))
    assert(extracted.count() == 0)
    val series = fixture.select(RowKeys.seriesPrefix(col("key"), Mask).cast("string")).distinct().collect()
    assert(series.map(_.getString(0)).toSeq == Seq("testRow"))
  }

  // --- hard validation errors (SURVEY §2.3 #8)
  test("malformed specs and masks fail eagerly") {
    intercept[IllegalArgumentException](TsAggSpec(900, TimeMode.CellTs(BaseMs, BaseMs)))
    intercept[IllegalArgumentException](TsAggSpec(0, TimeMode.CellTs(0, 1)))
    intercept[IllegalArgumentException](RowKeys.parseMask("0000"))      // no 1s
    intercept[IllegalArgumentException](RowKeys.parseMask("0101"))      // non-contiguous
    intercept[IllegalArgumentException](RowKeys.parseMask("0111"))      // not 4 bytes
    intercept[IllegalArgumentException](RowKeys.parseMask("002100"))    // bad chars
  }

  // --- key length mismatch is a hard runtime error, not silent ts=0
  // (reference logs + buckets at 0: AggregationBuilder.java:104-108)
  test("rowkey length mismatch raises instead of mis-bucketing") {
    import spark.implicits._
    val bad = Seq(("short".getBytes("UTF-8"), 0)).toDF("key", "offset_s")
    val ex = intercept[Exception] {
      bad.select(RowKeys.keyMillis(col("key"), Mask, col("offset_s"))).collect()
    }
    assert(ex.getMessage.contains("rowkey length"))
  }

  // --- F1 rowkey range filter: start ≤ key < stop, unsigned order, start<stop enforced
  test("rowkey range filter selects the half-open key range and validates bounds") {
    val prefix = "testRow".getBytes("UTF-8")
    def keyOf(rowIdx: Int): Array[Byte] = {
      val sec = (RefFixture.BaseSec + rowIdx * 3600L).toInt
      prefix ++ Array(((sec >> 24) & 0xff).toByte, ((sec >> 16) & 0xff).toByte,
        ((sec >> 8) & 0xff).toByte, (sec & 0xff).toByte)
    }
    val filtered = fixture.filter(RowKeys.keyRangeFilter(col("key"), keyOf(10), keyOf(12)))
    assert(filtered.count() == 200) // rows 10,11 × 100 qualifiers
    intercept[IllegalArgumentException](RowKeys.keyRangeFilter(col("key"), keyOf(12), keyOf(12)))
    intercept[IllegalArgumentException](RowKeys.keyRangeFilter(col("key"), keyOf(12), keyOf(3)))
  }

  // --- S2 sink: day-partitioned parquet layout
  test("day-partitioned sink lays out bucket_date directories") {
    val spec = TsAggSpec(900, TimeMode.CellTs(BaseMs, BaseMs + 48 * H))
    val out = java.nio.file.Files.createTempDirectory("graft-sink").toString
    graft.sources.Sinks.writePartitionedByDay(TsAgg.sum(fixture, spec), out)
    val dirs = new java.io.File(out).list().filter(_.startsWith("bucket_date="))
    assert(dirs.sorted.toSeq == Seq("bucket_date=2014-11-10", "bucket_date=2014-11-11"))
    val back = spark.read.parquet(out)
    assert(back.count() == 2 * 96) // 96 buckets/day
    // a day filter must prune at the directory level (the layout's purpose):
    // the plan carries it as a PartitionFilter, not a post-scan Filter
    val oneDay = back.filter(org.apache.spark.sql.functions.col("bucket_date") === "2014-11-10")
    val plan = oneDay.queryExecution.executedPlan.toString
    // the filter must appear INSIDE the PartitionFilters bracket — the scan
    // always prints "PartitionFilters: [...]" (possibly empty) and always
    // lists bucket_date as an output column, so substring checks are vacuous
    assert("PartitionFilters: \\[[^\\]]*bucket_date".r.findFirstIn(plan).isDefined,
      s"day filter not pushed to partition pruning:\n$plan")
    assert(oneDay.count() == 96)
  }

  // --- null semantics (SURVEY §2.3 #7): SUM skips nulls, COUNT counts cells
  test("null handling: sum skips nulls, count counts all cells, max ignores nulls") {
    import spark.implicits._
    val df = Seq(
      (BaseMs + 100L, Some(5L)), (BaseMs + 200L, None), (BaseMs + 300L, Some(7L)),
      (BaseMs + 900300L, None) // all-null bucket
    ).toDF("ts", "value")
    val spec = TsAggSpec(900, TimeMode.CellTs(BaseMs, BaseMs + 1800000L))
    assert(collectMap(TsAgg.sum(df, spec))(BaseMs) == 12L)
    assert(collectMap(TsAgg.count(df, spec)) == Map(BaseMs -> 3L, (BaseMs + 900000L) -> 1L))
    assert(collectMap(TsAgg.max(df, spec))(BaseMs) == 7L)
    // all-null bucket: aggregate value is null (defined behavior; the reference
    // would NPE in wrapForTransport — untested/undefined there)
    assert(collectMap(TsAgg.sum(df, spec))(BaseMs + 900000L) == null)
  }

  // --- weighted avg + diff (README.md:31-34 planned ops)
  test("weightedAvg and diff") {
    import spark.implicits._
    val df = Seq(
      (BaseMs + 1L, 10.0, 1.0), (BaseMs + 2L, 20.0, 3.0),
      (BaseMs + 900001L, 50.0, 2.0)
    ).toDF("ts", "value", "w")
    val spec = TsAggSpec(900, TimeMode.CellTs(BaseMs, BaseMs + 1800000L))
    val wavg = collectMap(TsAgg.weightedAvg(df, spec, "w"))
    assert(wavg(BaseMs) == (10.0 + 60.0) / 4.0)
    assert(wavg(BaseMs + 900000L) == 50.0)
    val diffRows = TsAgg.diff(df.withColumn("value", col("value").cast("long")), spec).collect()
    assert(diffRows.map(r => Option(r.get(r.fieldIndex("diff_value")))).toSeq == Seq(None, Some(20L)))
  }

  test("distinctCount is exact; the HLL++ sketch form stays within its error bound") {
    import spark.implicits._
    // 2000 cells in bucket 0 over 500 distinct keys, 100 cells in bucket 1
    // over 100 distinct keys — repeats must not inflate either form
    val df = ((0 until 2000).map(i => (BaseMs + 1L + i % 7, (i % 500).toLong)) ++
      (0 until 100).map(i => (BaseMs + 900001L, 10000L + i)))
      .toDF("ts", "user")
    val spec = TsAggSpec(900, TimeMode.CellTs(BaseMs, BaseMs + 1800000L),
      valueCol = "user")
    val exact = collectMap(TsAgg.distinctCount(df, spec, "user"))
      .map { case (k, v) => k -> v.asInstanceOf[Long] }
    assert(exact == Map(BaseMs -> 500L, (BaseMs + 900000L) -> 100L))
    val approx = collectMap(TsAgg.approxDistinctCount(df, spec, "user", rsd = 0.02))
      .map { case (k, v) => k -> v.asInstanceOf[Long] }
    exact.foreach { case (bucket, n) =>
      val a = approx(bucket)
      // 5 standard deviations at rsd=0.02: deterministic sketch, generous slack
      assert(math.abs(a - n) <= math.max(1L, (n * 0.10).toLong),
        s"bucket $bucket: approx $a vs exact $n")
    }
    // the AUTO front door (VERDICT r10 #4): at this cardinality the pair
    // probe picks the exact branch — output equals distinctCount under the
    // form-independent alias
    val auto = collectMap(
      TsAgg.distinctCountAuto(df, spec, "user").withColumnRenamed("n_distinct_est", "v"))
      .map { case (k, v) => k -> v.asInstanceOf[Long] }
    assert(auto == exact, "default dispatch must take the exact branch here")
    // forcing maxExactPairs = 0 pins the sketch branch: same schema, values
    // within the same bound as the standalone sketch form
    val forced = collectMap(
      TsAgg.distinctCountAuto(df, spec, "user", rsd = 0.02, maxExactPairs = 0)
        .withColumnRenamed("n_distinct_est", "v"))
      .map { case (k, v) => k -> v.asInstanceOf[Long] }
    exact.foreach { case (bucket, n) =>
      assert(math.abs(forced(bucket) - n) <= math.max(1L, (n * 0.10).toLong),
        s"bucket $bucket: forced-sketch ${forced(bucket)} vs exact $n")
    }
  }

  test("median/percentile are exact; the GK sketch form stays within accuracy") {
    import spark.implicits._
    // bucket 0: 1..100 (even count: median = (50+51)/2); bucket 1: {3,7,11}
    val df = ((1 to 100).map(i => (BaseMs + 1L + i % 7, i.toLong)) ++
      Seq(3L, 7L, 11L).map(v => (BaseMs + 900001L, v))).toDF("ts", "cents")
    val spec = TsAggSpec(900, TimeMode.CellTs(BaseMs, BaseMs + 1800000L),
      valueCol = "cents")
    val med = collectMap(TsAgg.median(df, spec))
      .map { case (k, v) => k -> v.asInstanceOf[Double] }
    assert(med == Map(BaseMs -> 50.5, (BaseMs + 900000L) -> 7.0))
    // p-interpolation at the (n-1)*p rank: p95 over 1..100 → rank 94.05 →
    // 95 + 0.05*(96-95)
    val p95 = collectMap(TsAgg.percentile(df, spec, 0.95))
      .map { case (k, v) => k -> v.asInstanceOf[Double] }
    assert(math.abs(p95(BaseMs) - 95.05) < 1e-9)
    // GK sketch: within rank error n/accuracy of the exact answer, and
    // always one of the actual values
    val approx = collectMap(TsAgg.approxPercentile(df, spec, 0.5, accuracy = 100))
      .map { case (k, v) => k -> v.asInstanceOf[Long] }
    assert(math.abs(approx(BaseMs) - 50L) <= 2, s"got ${approx(BaseMs)}")
    assert(approx(BaseMs + 900000L) == 7L)
    // the AUTO front door (r13, the distinct dispatch's quantile sibling):
    // at these group sizes the max-group probe picks the exact branch —
    // output equals percentile under the form-independent alias
    val auto = collectMap(
      TsAgg.quantileAuto(df, spec, 0.95).withColumnRenamed("p95_est", "v"))
      .map { case (k, v) => k -> v.asInstanceOf[Double] }
    assert(math.abs(auto(BaseMs) - 95.05) < 1e-9 &&
      auto == collectMap(TsAgg.percentile(df, spec, 0.95))
        .map { case (k, v) => k -> v.asInstanceOf[Double] },
      "default dispatch must take the exact branch here")
    // forcing maxExactGroup = 0 pins the sketch branch: same schema, an
    // actual element within GK rank error of the exact answer
    val forced = collectMap(
      TsAgg.quantileAuto(df, spec, 0.95, maxExactGroup = 0, accuracy = 100)
        .withColumnRenamed("p95_est", "v"))
      .map { case (k, v) => k -> v.asInstanceOf[Long] }
    assert(math.abs(forced(BaseMs) - 95L) <= 2, s"forced sketch: ${forced(BaseMs)}")
    assert(forced(BaseMs + 900000L) == 11L)
  }

  test("pivotCounts: wide per-type columns, NULL absent cells, two bounded exchanges") {
    import spark.implicits._
    val df = Seq(
      (BaseMs + 1L, "click"), (BaseMs + 2L, "click"), (BaseMs + 3L, "view"),
      (BaseMs + 900001L, "view")
    ).toDF("ts", "event_type")
    val spec = TsAggSpec(900, TimeMode.CellTs(BaseMs, BaseMs + 1800000L),
      valueCol = "event_type")
    // plan read BEFORE execution (AQE's final plan duplicates stage text)
    val fresh = TsAgg.pivotCounts(df, spec, "event_type", Seq("click", "view", "purchase"))
    val p = fresh.queryExecution.executedPlan.toString
    def cnt(n: String) = p.sliding(n.length).count(_ == n)
    // two bounded levels: (bucket, type) counts + PivotFirst fold — and the
    // orderBy's range exchange; nothing shuffles raw cells
    assert(cnt("Exchange hashpartitioning") == 2,
      s"pivot must stay two pre-aggregated exchanges:\n$p")
    assert(p.contains("pivotfirst"), s"expected PivotFirst fold:\n$p")
    val rows = fresh.collect().map(r => r.getLong(0) ->
      (Option(r.get(1)), Option(r.get(2)), Option(r.get(3)))).toMap
    assert(rows(BaseMs) == ((Some(2L), Some(1L), None))) // no purchases → NULL
    assert(rows(BaseMs + 900000L) == ((None, Some(1L), None)))
  }

  test("topKPerBucket: k cut, tie toward lower id, null sums excluded, no window exec") {
    import spark.implicits._
    // bucket 0: u1 sums 30, u2 sums 30 (tie → u1 first), u3 sums 10, u4 all-null
    val df = Seq(
      (BaseMs + 1L, 1L, Some(10L)), (BaseMs + 2L, 1L, Some(20L)),
      (BaseMs + 3L, 2L, Some(30L)), (BaseMs + 4L, 3L, Some(10L)),
      (BaseMs + 5L, 4L, None),
      (BaseMs + 900001L, 9L, Some(5L))
    ).toDF("ts", "user", "cents")
    val spec = TsAggSpec(900, TimeMode.CellTs(BaseMs, BaseMs + 1800000L), valueCol = "cents")
    val out = TsAgg.topKPerBucket(df, spec, "user", 2)
    val got = out.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      (BaseMs, 1L, 30L, 1L), (BaseMs, 2L, 30L, 2L),
      (BaseMs + 900000L, 9L, 5L, 1L)))
    val p = out.queryExecution.executedPlan.toString
    assert(!p.contains("Window"), s"heavy hitters must never plan a window:\n$p")
  }

  test("approxTopKPerBucket: SpaceSaving contains every heavy key, bounds its count") {
    import spark.implicits._
    // skewed stream: key 1 ×600, key 2 ×300, key 3 ×100, tail keys 100..599
    // ×1 each (N=1500, m=64 → guarantee threshold N/m ≈ 23.4: keys 1,2,3
    // MUST surface; the tail cannot displace them)
    val obs = Seq.fill(600)(1L) ++ Seq.fill(300)(2L) ++ Seq.fill(100)(3L) ++
      (100L until 600L)
    val df = obs.zipWithIndex
      .map { case (u, i) => (BaseMs + 1L + (i % 800), u) }.toDF("ts", "user")
    val spec = TsAggSpec(900, TimeMode.CellTs(BaseMs, BaseMs + 900000L), valueCol = "user")
    for (parts <- Seq(1, 7)) {
      val got = TsAgg.approxTopKPerBucket(df.repartition(parts), spec, "user", k = 3, m = 64)
        .collect().map(r => r.getLong(1) -> (r.getLong(2), r.getLong(3))).toMap
      assert(got.keySet == Set(1L, 2L, 3L), s"heavy keys must surface: ${got.keySet}")
      for ((id, truth) <- Seq(1L -> 600L, 2L -> 300L, 3L -> 100L)) {
        val (est, err) = got(id)
        assert(est >= truth && est - err <= truth,
          s"key $id: estimate $est err $err must bracket true $truth")
      }
    }
  }

  test("topKAuto: exact branch == topKPerBucket with err 0; forced sketch branch == approx form") {
    import spark.implicits._
    val df = Seq(
      (BaseMs + 1L, 1L, 10L), (BaseMs + 2L, 1L, 20L),
      (BaseMs + 3L, 2L, 30L), (BaseMs + 4L, 3L, 10L),
      (BaseMs + 900001L, 9L, 5L)
    ).toDF("ts", "user", "cents")
    val spec = TsAggSpec(900, TimeMode.CellTs(BaseMs, BaseMs + 1800000L), valueCol = "cents")
    // cardinality far below the threshold → exact branch, err all 0
    val auto = TsAgg.topKAuto(df, spec, "user", 2)
    assert(auto.columns.toSeq == Seq("bucket_start", "user", "est_weight", "err", "rank"))
    val got = auto.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val exact = TsAgg.topKPerBucket(df, spec, "user", 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), 0L, r.getLong(3)))
    assert(got.toSeq == exact.toSeq)
    // maxExactKeys = 1 forces the sketch branch: same schema, same answer
    // here (sketch under capacity is exact), err still 0
    val forced = TsAgg.topKAuto(df, spec, "user", 2, maxExactKeys = 1L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(forced.toSeq == got.toSeq)
  }

  test("trendingAuto: certified skew keeps the sketch; skewless data dispatches to exact") {
    import spark.implicits._
    val spec = TsAggSpec(900, TimeMode.CellTs(BaseMs, BaseMs + 900000L), valueCol = "user")
    // SKEWED: key 1 dominates (600 of 1500 observations ≫ W/m at m=8), a
    // 500-key tail forces evictions — rank-1 certifies (count−err)·m > W,
    // so the dispatch must return the sketch's answer bit-for-bit
    val skewObs = Seq.fill(600)(1L) ++ Seq.fill(300)(2L) ++ Seq.fill(100)(3L) ++
      (100L until 600L)
    val skewDf = skewObs.zipWithIndex
      .map { case (u, i) => (BaseMs + 1L + (i % 800), u) }.toDF("ts", "user")
    val viaAuto = TsAgg.trendingAuto(skewDf, spec, "user", k = 3, m = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val viaSketch = TsAgg.approxTopKPerBucket(skewDf, spec, "user", k = 3, m = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(viaAuto.toSeq == viaSketch.toSeq, "certified skew must keep the sketch's answer")
    assert(viaAuto.exists(_._4 > 0L),
      "fixture sanity: the sketch must have evicted (else the regimes are indistinguishable)")
    // SKEWLESS: 500 keys × 3 observations each — no key comes near W/m, the
    // sketch's top-3 is arbitrary; the dispatch must discard it and return
    // the exact bounded TopK (err ≡ 0, deterministic (count desc, id asc))
    val flatObs = (0 until 3).flatMap(_ => 0L until 500L)
    val flatDf = flatObs.zipWithIndex
      .map { case (u, i) => (BaseMs + 1L + (i % 800), u) }.toDF("ts", "user")
    val flatAuto = TsAgg.trendingAuto(flatDf, spec, "user", k = 3, m = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val flatExact = TsAgg.topKPerBucket(flatDf, spec, "user", k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), 0L, r.getLong(3)))
    assert(flatAuto.toSeq == flatExact.toSeq,
      s"skewless data must dispatch to the exact form: ${flatAuto.toSeq.take(3)}")
    // HEAVY-BUT-UNORDERABLE (the regime the r10 sf1 sweep exposed): six
    // keys at 200 observations each all clear W/m = 162, so the first-cut
    // certificate ((count₁−err₁)·m > W) passes — yet the sketch cannot
    // prove WHICH of the six are top-3 (identical weights, merge error
    // exceeds the zero gaps). The containment certificate must refuse and
    // dispatch to the exact bounded TopK, whose (count desc, id asc) order
    // is deterministic.
    val heavyFlatObs = (1L to 6L).flatMap(u => Seq.fill(200)(u)) ++ (100L until 200L)
    val heavyFlatDf = heavyFlatObs.zipWithIndex
      .map { case (u, i) => (BaseMs + 1L + (i % 800), u) }.toDF("ts", "user")
    val heavyAuto = TsAgg.trendingAuto(heavyFlatDf, spec, "user", k = 3, m = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val heavyExact = TsAgg.topKPerBucket(heavyFlatDf, spec, "user", k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), 0L, r.getLong(3)))
    assert(heavyAuto.toSeq == heavyExact.toSeq,
      "heavy keys with unprovable order must dispatch to the exact form: " +
        s"${heavyAuto.toSeq.take(3)}")
  }

  test("movingAvg: RANGE frame is gap-aware (absent bucket shrinks the window)") {
    import spark.implicits._
    val t0 = BaseMs
    val spec = TsAggSpec(1, TimeMode.CellTs(t0, t0 + 10000), valueCol = "cents")
    // buckets 0, 1, 3 present; bucket 2 EMPTY — the trailing 2-bucket RANGE
    // window at bucket 3 must contain only bucket 3 (a ROWS frame would
    // wrongly reach back to bucket 1 and answer 30.0)
    val df = Seq((t0, 10L), (t0 + 1000L, 20L), (t0 + 3000L, 40L)).toDF("ts", "cents")
      .repartition(3)
    val got = TsAgg.movingAvg(df, spec, nBuckets = 2)
      .collect().map(r => (r.getLong(0) - t0, r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == Seq((0L, 10L, 10.0), (1000L, 20L, 15.0), (3000L, 40L, 40.0)))
  }

  test("anomalies: the exact integer 3σ inequality flags the spike and nothing else") {
    import spark.implicits._
    val t0 = BaseMs
    val spec = TsAggSpec(1, TimeMode.CellTs(t0, t0 + 12000), valueCol = "cents")
    // 11 quiet buckets at 10 + one spike at 1000. Hand-check of
    // (n·x−S)²·(n−1) > 9·n·(n·S2−S²) with n=12, S=1110, S2=1001100:
    // spike: 10890²·11 = 1 304 513 100 > 108·10 781 100 = 1 164 358 800 ✓
    // quiet:   990²·11 =    10 781 100  <                               ✗
    val df = ((0 until 11).map(i => (t0 + i * 1000L, 10L)) :+ (t0 + 11000L, 1000L))
      .toDF("ts", "cents").repartition(3)
    val got = TsAgg.anomalies(df, spec, thresholdSigma = 3)
      .collect().map(r => (r.getLong(0) - t0, r.getLong(1), r.getBoolean(2)))
    assert(got.length == 12)
    assert(got.filter(_._3).toSeq == Seq((11000L, 1000L, true)))
    // a 1-bucket series has no sample variance — never flagged
    val one = Seq((t0, 99L)).toDF("ts", "cents")
    val gotOne = TsAgg.anomalies(one, TsAggSpec(1, TimeMode.CellTs(t0, t0 + 1000),
      valueCol = "cents"), 3).collect()
    assert(gotOne.length == 1 && !gotOne(0).getBoolean(2))
  }

  test("fillGaps: dense spine; prev carries, linear interpolates, edges stay NULL") {
    import spark.implicits._
    val t0 = BaseMs
    val iv = 1000L
    val spec = TsAggSpec(1, TimeMode.CellTs(t0, t0 + 6000), valueCol = "cents")
    // values only in buckets 1 and 4 → spine of 6 with leading/trailing gaps
    val df = Seq((t0 + 1000L, 10L), (t0 + 4000L, 40L)).toDF("ts", "cents").repartition(3)
    def longs(out: Array[org.apache.spark.sql.Row], i: Int): Seq[Option[Long]] =
      out.map(r => if (r.isNullAt(i)) None else Some(r.getLong(i))).toSeq
    val nul = TsAgg.fillGaps(df, spec, "null").orderBy("bucket_start").collect()
    assert(nul.map(_.getLong(0)).toSeq == (0 until 6).map(t0 + _ * iv).toSeq)
    assert(longs(nul, 2) == Seq(None, Some(10L), None, None, Some(40L), None))
    val prev = TsAgg.fillGaps(df, spec, "prev").orderBy("bucket_start").collect()
    assert(longs(prev, 2) == Seq(None, Some(10L), Some(10L), Some(10L), Some(40L), Some(40L)))
    val lin = TsAgg.fillGaps(df, spec, "linear").orderBy("bucket_start").collect()
    // expected values computed by the SAME double expression shape the
    // operator contracts (pv + (nv−pv)·(b−pt)/(nt−pt)) — exact compare
    def interp(b: Long): Double = 10.0 + (40L - 10L).toDouble * ((b - 1000L).toDouble / 3000.0)
    val gotLin = lin.map(r => if (r.isNullAt(2)) None else Some(r.getDouble(2))).toSeq
    assert(gotLin == Seq(None, Some(10.0), Some(interp(2000L)), Some(interp(3000L)),
      Some(40.0), None))
    // mode validation is eager
    intercept[IllegalArgumentException](TsAgg.fillGaps(df, spec, "cubic"))
  }

  test("ewmaTrailing: exact dyadic weights, gap renormalizes, partition-invariant") {
    import spark.implicits._
    val t0 = BaseMs
    val spec = TsAggSpec(1, TimeMode.CellTs(t0, t0 + 10000), valueCol = "cents")
    // buckets 0, 1, 3 present; w=3 → weights 4/2/1 by lag.
    // bucket 0: {0·w4}                → 40/4  = 10.0
    // bucket 1: {0·w2, 1·w4}         → (20+80)/6 = 100/6
    // bucket 3: {1·w1, 3·w4} (2 ABSENT — its weight 2 must NOT enter)
    //                                 → (20+160)/5 = 36.0
    val df = Seq((t0, 10L), (t0 + 1000L, 20L), (t0 + 3000L, 40L)).toDF("ts", "cents")
      .repartition(3)
    val got = TsAgg.ewmaTrailing(df, spec, wBuckets = 3)
      .collect().map(r => (r.getLong(0) - t0, r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == Seq(
      (0L, 10L, 10.0), (1000L, 20L, 100.0 / 6.0), (3000L, 40L, 36.0)))
    val again = TsAgg.ewmaTrailing(df.repartition(7), spec, wBuckets = 3)
      .collect().map(r => (r.getLong(0) - t0, r.getLong(1), r.getDouble(2)))
    assert(again.toSeq == got.toSeq)
    // w=1 degenerates to the bucket value itself
    val w1 = TsAgg.ewmaTrailing(df, spec, wBuckets = 1)
      .collect().map(r => (r.getLong(1), r.getDouble(2)))
    assert(w1.forall { case (s, e) => e == s.toDouble })
    intercept[IllegalArgumentException](TsAgg.ewmaTrailing(df, spec, 0))
    intercept[IllegalArgumentException](TsAgg.ewmaTrailing(df, spec, 33))
  }

  test("cumulative: exact BIGINT running total, sparse buckets, partition-invariant") {
    import spark.implicits._
    val t0 = BaseMs
    val spec = TsAggSpec(1, TimeMode.CellTs(t0, t0 + 10000), valueCol = "cents")
    // buckets 0, 1, 3 present (bucket 2 empty — the running total skips it,
    // the sparse contract: no bucket row, no cum row)
    val df = Seq((t0, 10L), (t0 + 1000L, 20L), (t0 + 3000L, 40L)).toDF("ts", "cents")
      .repartition(3)
    val got = TsAgg.cumulative(df, spec)
      .collect().map(r => (r.getLong(0) - t0, r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((0L, 10L, 10L), (1000L, 20L, 30L), (3000L, 40L, 70L)))
    val again = TsAgg.cumulative(df.repartition(7), spec)
      .collect().map(r => (r.getLong(0) - t0, r.getLong(1), r.getLong(2)))
    assert(again.toSeq == got.toSeq)
  }

  test("sessionWindows: touching windows MERGE (diff == gap), strict excess splits") {
    import spark.implicits._
    val gap = 1000L
    // u1: t0, t0+999 merge; t0+1999 touches the window end EXACTLY → still
    // merges (Spark's rule — the boundary case that distinguishes > from >=);
    // t0+3000 is 1001 past the last event → new session
    // u2: single event, its own session
    val df = Seq(
      (BaseMs, 1L, 10L), (BaseMs + 999L, 1L, 20L), (BaseMs + 1999L, 1L, 40L),
      (BaseMs + 3000L, 1L, 80L),
      (BaseMs + 5L, 2L, 7L)
    ).toDF("ts", "user", "cents")
    val got = TsAgg.sessionWindows(df, gap, Seq("user"),
        aggExprs = Seq(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n_events"),
          org.apache.spark.sql.functions.sum(col("cents")).as("sum_cents")))
      .select("user", "session_start", "session_end", "n_events", "sum_cents")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq == Seq(
      (1L, BaseMs, BaseMs + 1999L + gap, 3L, 70L),
      (1L, BaseMs + 3000L, BaseMs + 3000L + gap, 1L, 80L),
      (2L, BaseMs + 5L, BaseMs + 5L + gap, 1L, 7L)))
  }
}
