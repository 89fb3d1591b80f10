package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Dump the FINAL adaptive executed plan of one registered query with
  * per-node SQL metrics (rows out, aggregate/join/scan times). */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("search_bm25_batch_indexed")
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries(name)(spark, dir)
    df.collect(): Unit
    def walk(p: SparkPlan, depth: Int): Unit = {
      val interesting = p.metrics.filter { case (k, _) =>
        k.contains("numOutputRows") || k.contains("Time") || k.contains("time") }
      val ms = interesting.map { case (k, m) => s"$k=${m.value}" }.mkString(" ")
      println(("  " * depth) + p.nodeName + "  " + ms)
      p match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan, depth + 1)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          walk(q.plan, depth + 1)
        case i: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
          walk(i.relation.cachedPlan, depth + 1)
        case _ => p.children.foreach(walk(_, depth + 1))
      }
      p.subqueries.foreach { sq => println(("  " * depth) + "SUBQUERY:"); walk(sq, depth + 1) }
    }
    println("==== NODE METRICS ====")
    walk(df.queryExecution.executedPlan, 0)
    spark.stop()
  }
}
