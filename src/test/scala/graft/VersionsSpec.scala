package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Versions

/**
 * `Versions.latestCells` — HBase maxVersions=1 semantics on a fixture with
 * PLANTED overwrites: the latest version (by cell timestamp) wins, version
 * counts are reported, and the reduction is a hash aggregate, never a window.
 */
class VersionsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  // (row, qualifier, cell_ts, value): q1 of row A overwritten twice, q2 once;
  // row B has a single version — the mixed shape real migrated data has
  private def cells = Seq(
    ("rowA", "q1", 1000L, 10L),
    ("rowA", "q1", 2000L, 20L), // overwrite
    ("rowA", "q1", 3000L, 30L), // latest — must win
    ("rowA", "q2", 1500L, 7L),
    ("rowA", "q2", 1400L, 6L), // older arrives later in input order
    ("rowB", "q1", 9000L, 99L)
  ).toDF("key", "qual", "cell_ts", "value")

  test("latest version per (key, qualifier) wins; n_versions reported") {
    val out = Versions.latestCells(cells, Seq("key", "qual"), "cell_ts", Seq("value"))
      .orderBy("key", "qual")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.toSeq == Seq(
      ("rowA", "q1", 30L, 3000L, 3L),
      ("rowA", "q2", 7L, 1500L, 2L),
      ("rowB", "q1", 99L, 9000L, 1L)))
  }

  test("aggregating latest cells counts each cell once (no double-count)") {
    val latest = Versions.latestCells(cells, Seq("key", "qual"), "cell_ts", Seq("value"))
    val perRow = latest.groupBy("key")
      .agg(org.apache.spark.sql.functions.sum("value").as("s"),
        org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)).as("n"))
      .orderBy("key").collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(perRow.toSeq == Seq(("rowA", 37L, 2L), ("rowB", 99L, 1L)))
  }

  test("the reduction is a hash aggregate, not a window") {
    val plan = Versions.latestCells(cells, Seq("key", "qual"), "cell_ts", Seq("value"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"latestCells must not use a window:\n$plan")
    assert(plan.contains("HashAggregate") || plan.contains("SortAggregate"),
      s"expected an aggregate-based reduction:\n$plan")
  }

  test("registered latest_cells query: one cell per (user, bucket) in the output") {
    val df = SparkEntry.queries("latest_cells_sum_900")(spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"no window allowed:\n$plan")
    val rows = df.collect()
    assert(rows.nonEmpty)
    // n_cells can never exceed the distinct users in a bucket
    assert(rows.forall(_.getLong(2) <= 200), "n_cells bounded by user count")
  }
}
