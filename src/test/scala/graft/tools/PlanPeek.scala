package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev loop: print executed plans for named SparkEntry queries at sf0.001
  * (`sbt "Test/runMain graft.tools.PlanPeek <query> ..."`) — the raw
  * material the PlanContractSpec assertions are written against. */
object PlanPeek {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", false).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { name =>
      println(s"==== $name ====")
      println(graft.SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
        .queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
