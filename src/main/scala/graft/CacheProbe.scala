package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import java.util.concurrent.atomic.AtomicInteger
import graft.operators.{Dedup, Corpus, Parallelism}
import graft.sources.{Fixtures, Tables}

/** Throwaway diagnostic: is the persisted `cut`/`scrubbed` cache actually hit? */
object CacheProbe {
  def main(args: Array[String]): Unit = {
    val d = args(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new AtomicInteger(0); val stages = new AtomicInteger(0); val tasks = new AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = jobs.incrementAndGet()
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet(); tasks.addAndGet(sc.stageInfo.numTasks)
      }
    })
    def mark(label: String)(f: => Unit): Unit = {
      Thread.sleep(200) // let listener drain
      val (j0, s0, t0) = (jobs.get, stages.get, tasks.get)
      val n0 = System.nanoTime(); f
      Thread.sleep(300)
      println(f"[probe] $label%-30s ${(System.nanoTime() - n0) / 1e9}%.2f s  jobs=${jobs.get - j0} stages=${stages.get - s0} tasks=${tasks.get - t0}")
    }
    val docs = Tables.documents(spark, d)
    val index = Fixtures.dedupIndex(spark, d)
    val base = docs.filter(col("doc_id") % 20 =!= 0)
    val delta = docs.filter(col("doc_id") % 20 === 0)
    val surv = delta.join(
      Dedup.incrementalExact(delta, index)
        .filter(!col("is_dup")).select(col("doc_id")), Seq("doc_id"), "left_semi")
    val cut = Dedup.incrementalCutSpans(surv, index, base)
    cut.persist()
    mark("cut count 1 (materialize)") { cut.count() }
    mark("cut count 2 (cached?)") { cut.count() }
    val scrubbed = Corpus.piiScrub(cut, "doc_id", "clean_text")
      .join(cut.select(col("doc_id"), col("n_removed")), Seq("doc_id"))
    scrubbed.persist()
    mark("scrub count 1 (materialize)") { scrubbed.count() }
    mark("scrub count 2 (cached?)") { scrubbed.count() }
    val hasIMR = scrubbed.queryExecution.withCachedData.collect {
      case r: org.apache.spark.sql.execution.columnar.InMemoryRelation => r
    }
    println(s"[probe] scrubbed withCachedData has InMemoryRelation: ${hasIMR.nonEmpty}")
    val gate = Corpus.repetitionMetrics(scrubbed, "doc_id", "clean_text")
    mark("gate count 1") { gate.count() }
    mark("gate count 2") { gate.count() }
    Dedup.clearCaches()
    cut.unpersist(true); scrubbed.unpersist(true)
    mark("FULL crawlIncrement collect") {
      graft.operators.TrainingSet.crawlIncrement(delta, index, base)._1
        .orderBy("doc_id").collect()
    }
    Dedup.clearCaches()
    mark("FULL crawlIncrement collect 2") {
      graft.operators.TrainingSet.crawlIncrement(delta, index, base)._1
        .orderBy("doc_id").collect()
    }
    // decompose: the cut alone (collect with text materialized), cold
    Dedup.clearCaches()
    mark("cold cut collect") {
      Dedup.incrementalCutSpans(
        delta.join(Dedup.incrementalExact(delta, index)
          .filter(!col("is_dup")).select(col("doc_id")), Seq("doc_id"), "left_semi"),
        index, base).collect()
    }
    Dedup.clearCaches()
    mark("cold exact probe only") {
      Dedup.incrementalExact(delta, index).filter(!col("is_dup")).count()
    }
    spark.stop()
  }
}
