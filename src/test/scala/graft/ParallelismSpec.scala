package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Parallelism

/**
 * Pins the source-parallelism guard's tier-2 decision (ADVICE r8): a
 * broadcast join preserves the stream side's (possibly single) partition,
 * so it must NOT count as proof of shuffle partitioning, while genuinely
 * exchange-forcing frames (groupBy, distinct) must be left untouched.
 */
class ParallelismSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def target = spark.sparkContext.defaultParallelism

  // a genuinely compact source: ONE parquet file -> one input partition
  // (coalesce(1) won't do as a fixture — it IS a RepartitionOperation,
  // which tier 2 rightly treats as partition-defining)
  private lazy val leafPath: String = {
    val p = java.nio.file.Files.createTempDirectory("graft-par-spec").toString + "/t"
    (1 to 100).map(i => (i.toLong, i % 7)).toDF("id", "k")
      .coalesce(1).write.mode("overwrite").parquet(p)
    p
  }
  private def leaf = spark.read.parquet(leafPath)

  test("single-file parquet leaf is rebalanced to the session parallelism") {
    assert(leaf.rdd.getNumPartitions < target, "precondition: compact source")
    assert(Parallelism.ensure(leaf).rdd.getNumPartitions >= target)
  }

  test("broadcast-join-enriched single-partition frame still rebalances") {
    // the r8 bug: any Join in the plan skipped the rebalance, but a
    // broadcast join keeps the stream side's ~1 partition
    val dim = (0 to 6).map(i => (i, s"g$i")).toDF("k", "label")
    val joined = leaf.join(broadcast(dim), Seq("k"))
    assert(joined.rdd.getNumPartitions < target, "precondition: broadcast join stayed narrow")
    assert(Parallelism.ensure(joined).rdd.getNumPartitions >= target)
  }

  test("aggregate and distinct frames are recognized as shuffle-partitioned (no extra repartition)") {
    val agg = leaf.groupBy("k").agg(sum("id").as("s"))
    assert(Parallelism.ensure(agg) eq agg)
    // DataFrame .distinct() yields a Deduplicate node (rewritten to
    // Aggregate during optimization) — the analyzed-plan match missed it
    val dist = leaf.select("k").distinct()
    assert(Parallelism.ensure(dist) eq dist)
  }
}
