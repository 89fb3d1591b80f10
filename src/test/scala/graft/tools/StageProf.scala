package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev loop: per-stage wall/records breakdown of one batch door run. */
object StageProf {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft-sf1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val i = sc.stageInfo
        val ms = i.completionTime.getOrElse(0L) - i.submissionTime.getOrElse(0L)
        val tm = i.taskMetrics
        if (ms > 300) println(f"[stage] ${ms / 1000.0}%6.1fs tasks=${i.numTasks}%3d " +
          f"in=${tm.inputMetrics.recordsRead}%11d sr=${tm.shuffleReadMetrics.recordsRead}%11d " +
          f"sw=${tm.shuffleWriteMetrics.recordsWritten}%11d cpu=${tm.executorCpuTime / 1e9}%7.1fs " +
          i.name.take(60))
      }
    })
    val docs = graft.sources.Tables.documents(spark, dir)
    val queries = docs.filter(col("doc_id") % 5 === 1)
      .select(col("doc_id").as("query_id"),
        array_join(slice(graft.functions.TextFunctions.tokens(col("text")), 1, 3), " ")
          .as("query"))
    val ix = graft.sources.Fixtures.searchIndex(spark, dir)
    val s = System.nanoTime()
    println("[probe] rows=" + graft.operators.Search
      .bm25TopKAllIndexed(ix, queries, k = 5).count())
    println(f"[probe] indexed door: ${(System.nanoTime() - s) / 1e9}%.2f s")
    spark.stop()
  }
}
