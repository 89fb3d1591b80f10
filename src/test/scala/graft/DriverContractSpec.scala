package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/**
 * The driver contract itself, as tests: the correctness gate silently skips
 * an oracle whose key doesn't match a registered query (it would record
 * "no_oracle" instead of failing), so key drift must fail HERE, in CI, not
 * as a quietly weaker round report.
 */
class DriverContractSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("every oracle key names a registered query") {
    val orphaned = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphaned.isEmpty, s"oracles without a query (typo?): $orphaned")
  }

  test("entry() is the driver smoke: rows > 0 at sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every registered query constructs and resolves its schema at sf0.001") {
    // .schema forces analysis: unresolved columns, bad casts, or a broken
    // fixture path fail per-query here instead of mid-Verify in the driver
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try { fn(spark, sf).schema; None }
      catch { case e: Throwable => Some(s"$name: ${e.getMessage.linesIterator.next()}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
