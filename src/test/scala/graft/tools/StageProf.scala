package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev loop: per-STAGE wall/CPU/rows for one registered query — the
  * attribution PruneProf's cumulative phase counts can't give.
  * `sbt "Test/runMain graft.tools.StageProf search_bm25_batch_indexed /root/testdata/sf0.1"`. */
object StageProf {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("search_bm25_batch_indexed")
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    // extra session confs for A/B runs: GRAFT_PROF_CONFS="k1=v1,k2=v2"
    val extra = sys.env.get("GRAFT_PROF_CONFS").toSeq
      .flatMap(_.split(',')).map(_.split('=')).collect { case Array(k, v) => (k, v) }
    val b0 = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      // udaf hash-agg headroom inherited from graft.functions.AggConf (r21)
      .config("spark.ui.enabled", false)
    val spark = extra.foldLeft(b0) { case (b, (k, v)) => b.config(k, v) }.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val rows = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val wall = (si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)) / 1e3
        val m = si.taskMetrics
        val det = si.details.linesIterator
          .filter(l => l.contains("graft") && !l.contains("StageProf"))
          .take(2).mkString(" <- ")
        rows.add(f"[stage] id=${si.stageId}%4d tasks=${si.numTasks}%3d " +
          f"wall=$wall%7.2fs cpu=${m.executorCpuTime / 1e9}%8.2fs " +
          f"run=${m.executorRunTime / 1e3}%8.2fs " +
          f"in=${m.inputMetrics.recordsRead}%12d shIn=${m.shuffleReadMetrics.recordsRead}%12d " +
          f"shOut=${m.shuffleWriteMetrics.recordsWritten}%12d  ${si.name.take(40)} | $det")
      }
    })
    // warm the fixture path outside the measured run
    graft.sources.Fixtures.searchIndex(spark, dir): Unit
    val t0 = System.nanoTime()
    val n = graft.SparkEntry.queries(name)(spark, dir).collect().length
    println(f"[stageprof] $name rows=$n wall=${(System.nanoTime() - t0) / 1e9}%.2f s")
    Thread.sleep(1000) // let listener drain
    rows.forEach(println(_))
    spark.stop()
  }
}
