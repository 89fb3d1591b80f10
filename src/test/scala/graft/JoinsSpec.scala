package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Joins

/**
 * Temporal joins (`Joins.asofJoin` / `Joins.rangeJoin`) on hand-traced
 * fixtures: inclusive-tie semantics, left-outer nulls, tolerance voiding,
 * interval overlap, half-open bounds, and the plan contracts (no join node
 * at all in as-of; a plain hash join, never a cartesian, in range).
 */
class JoinsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  // trades (left): key, ts, trade id — quotes (right): key, ts, px
  private def trades = Seq(
    ("A", 100L, 1L), // before any quote → null match
    ("A", 200L, 2L), // exactly at quote ts 200 → inclusive match
    ("A", 350L, 3L), // between quotes 200 and 400 → 200
    ("A", 400L, 4L), // at 400 → 400
    ("B", 500L, 5L), // B has one quote at 90
    ("C", 100L, 6L)  // C has no quotes at all
  ).toDF("k", "t", "trade_id")
  private def quotes = Seq(
    ("A", 200L, 10L),
    ("A", 400L, 20L),
    ("B", 90L, 30L)
  ).toDF("k", "t", "px")

  private def runAsof(tol: Option[Long] = None) =
    Joins.asofJoin(trades, quotes, Seq("k"), "t", "t", Seq("px"),
      asofTsName = "quote_t", toleranceMs = tol)
      .orderBy("trade_id")
      .collect()
      .map(r => (r.getLong(r.fieldIndex("trade_id")),
        Option(r.get(r.fieldIndex("quote_t"))).map(_.asInstanceOf[Long]),
        Option(r.get(r.fieldIndex("px"))).map(_.asInstanceOf[Long])))

  test("asof: latest at-or-before match, inclusive ties, left-outer nulls") {
    assert(runAsof().toSeq == Seq(
      (1L, None, None),            // no quote yet
      (2L, Some(200L), Some(10L)), // tie is inclusive
      (3L, Some(200L), Some(10L)),
      (4L, Some(400L), Some(20L)),
      (5L, Some(90L), Some(30L)),  // stale but no tolerance set
      (6L, None, None)))           // key never quoted
  }

  test("asof: tolerance voids stale matches but keeps fresh ones") {
    assert(runAsof(tol = Some(150L)).toSeq == Seq(
      (1L, None, None),
      (2L, Some(200L), Some(10L)),
      (3L, Some(200L), Some(10L)), // 350-200=150 ≤ tol — boundary kept
      (4L, Some(400L), Some(20L)),
      (5L, None, None),            // 500-90=410 > tol — voided
      (6L, None, None)))
  }

  test("asof: multiple right rows at one (key, ts) resolve deterministically") {
    val dupQuotes = Seq(("A", 200L, 10L), ("A", 200L, 99L), ("A", 200L, 50L))
      .toDF("k", "t", "px")
    val out = Joins.asofJoin(trades.filter($"trade_id" === 3), dupQuotes,
      Seq("k"), "t", "t", Seq("px"), asofTsName = "qt")
      .collect()
    assert(out.length == 1 && out(0).getLong(out(0).fieldIndex("px")) == 99L,
      "greatest struct must win the tie")
  }

  test("asof: plan has a window and NO join node") {
    val df = Joins.asofJoin(trades, quotes, Seq("k"), "t", "t", Seq("px"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("Window"), s"expected window:\n$plan")
    assert(!plan.toLowerCase.contains("join"), s"as-of must not plan a join:\n$plan")
  }

  // points at 50..450, intervals [100,300) and [250,400) (overlapping)
  private def pts = Seq(50L, 100L, 200L, 250L, 299L, 300L, 399L, 400L, 450L)
    .toDF("p").withColumn("pid", col("p"))
  private def ivs = Seq((100L, 300L, "i1"), (250L, 400L, "i2"), (500L, 500L, "empty"))
    .toDF("lo", "hi", "iv")

  private def expectPairs = Set(
    (100L, "i1"), (200L, "i1"), (250L, "i1"), (299L, "i1"), // [100,300)
    (250L, "i2"), (299L, "i2"), (300L, "i2"), (399L, "i2")  // [250,400)
  ) // 50 before all; 400 excluded (hi exclusive); 450 after; empty matches none

  test("range: half-open containment, overlap multiplies, empty interval inert") {
    for (bucketMs <- Seq(1L, 64L, 100L, 1000L)) { // grid must not matter
      val got = Joins.rangeJoin(pts, ivs, "p", "lo", "hi", bucketMs)
        .select("p", "iv").collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(got == expectPairs, s"bucketMs=$bucketMs")
    }
  }

  test("range: broadcast variant returns identical pairs") {
    val got = Joins.rangeJoinBroadcast(pts, ivs, "p", "lo", "hi")
      .select("p", "iv").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == expectPairs)
  }

  test("range: bucket form plans an equality join, never a cartesian") {
    val plan = Joins.rangeJoin(pts, ivs, "p", "lo", "hi", 100L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"range join must decompose to an equality join:\n$plan")
  }

  test("asof: reserved internal names and output collisions fail eagerly") {
    val badLeft = trades.withColumn("__t", lit(1L))
    assertThrows[IllegalArgumentException] {
      Joins.asofJoin(badLeft, quotes, Seq("k"), "t", "t", Seq("px"))
    }
    // right column 'px' colliding with a left payload column of the same name
    val leftWithPx = trades.withColumn("px", lit(0L))
    assertThrows[IllegalArgumentException] {
      Joins.asofJoin(leftWithPx, quotes, Seq("k"), "t", "t", Seq("px"))
    }
    // asofTsName colliding with a left column
    assertThrows[IllegalArgumentException] {
      Joins.asofJoin(trades, quotes, Seq("k"), "t", "t", Seq("px"), asofTsName = "trade_id")
    }
  }

  test("range: interval fan-out over the cap fails loud, naming the fix") {
    // [0, 100_000) at bucketMs=1 → 100k buckets, far over the default cap
    val wide = Seq((0L, 100000L, "huge")).toDF("lo", "hi", "iv")
    val e = intercept[Exception] {
      Joins.rangeJoin(pts, wide, "p", "lo", "hi", bucketMs = 1L).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    val msg = messages(e).mkString(" | ")
    assert(msg.contains("maxFanoutPerInterval") && msg.contains("bucketMs"),
      s"error must name the cap and the fix, got: $msg")
    // the same intervals pass when the caller raises the cap explicitly
    val ok = Joins.rangeJoin(pts, wide, "p", "lo", "hi", bucketMs = 1L,
      maxFanoutPerInterval = 200000).select("p").distinct().count()
    assert(ok == pts.count(), "all points fall inside the huge interval")
  }

  test("registered queries run and exercise both match paths at sf0.001") {
    val asof = SparkEntry.queries("asof_join_purchase")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(asof.nonEmpty)
    val matched = asof.count(!_.isNullAt(3))
    assert(matched > 0 && matched < asof.length,
      s"want both matched and unmatched clicks, got $matched of ${asof.length}")
    val rj = SparkEntry.queries("range_join_hot_weeks")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rj.nonEmpty && rj.forall(_.getLong(1) > 0))
  }

  test("broadcast and shuffle hot-weeks queries agree row-for-row at sf0.001") {
    val d = "/root/testdata/sf0.001"
    val shuffle = SparkEntry.queries("range_join_hot_weeks")(spark, d)
      .collect().map(_.toSeq).toSeq
    val bcast = SparkEntry.queries("range_join_broadcast_weeks")(spark, d)
      .collect().map(_.toSeq).toSeq
    assert(shuffle.nonEmpty && shuffle == bcast)
  }

  test("tolerance query exercises fresh, voided, and never-matched paths at sf0.001") {
    val rows = SparkEntry.queries("asof_join_tolerance")(spark, "/root/testdata/sf0.001")
      .collect()
    val base = SparkEntry.queries("asof_join_purchase")(spark, "/root/testdata/sf0.001")
      .collect()
    val msIdx = rows.head.fieldIndex("purchase_ms")
    val matched = rows.count(!_.isNullAt(msIdx))
    val baseMatched = base.count(!_.isNullAt(base.head.fieldIndex("purchase_ms")))
    assert(matched > 0, "tolerance must keep some fresh matches")
    assert(matched < baseMatched,
      s"tolerance must void some stale matches ($matched vs untol $baseMatched)")
  }
}
