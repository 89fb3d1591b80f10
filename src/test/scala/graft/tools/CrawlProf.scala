package graft.tools
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Corpus, TrainingSet, TextAnalysis, Parallelism}
import graft.sources.{Fixtures, Tables}

object CrawlProf {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime(); val r = f
    println(f"[prof] $label%-34s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
  }
  def main(args: Array[String]): Unit = {
    val d = args(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(spark, d)
    println(s"[prof] docs=${docs.count()}")
    val index = Fixtures.dedupIndex(spark, d)

    // registered dedup_incremental_cut shape
    val regDelta = docs.filter(col("doc_id") % 5 === 0)
    val regBase  = docs.filter(col("doc_id") % 5 =!= 0)
    def matched(delta: DataFrame): DataFrame = {
      val dFps = TextAnalysis.winnowFps(Parallelism.ensure(delta), 8, 9, "doc_id", "text")
        .select(explode(array_distinct(col("fps"))).as("fp")).distinct()
      index.cutFps.join(broadcast(dFps), Seq("fp")).select(col("id").as("doc_id")).distinct()
    }
    time("registered: matchedIds count") { println(s"  -> ${matched(regDelta).count()}") }
    time("registered: full cut") {
      Dedup.incrementalCutSpans(regDelta, index, regBase).count()
    }

    // crawl shape
    val base = docs.filter(col("doc_id") % 20 =!= 0)
    val dupSrc = docs.select(col("doc_id").as("__src_id"), col("text").as("__src_text"))
    val noPlant = col("doc_id") % 100 =!= 0
    val planted = docs.filter(col("doc_id") % 20 === 0)
      .join(dupSrc, col("doc_id") % 100 === 0 && col("__src_id") === col("doc_id") - 49, "left")
      .select(col("doc_id"),
        concat(
          coalesce(col("__src_text"), col("text")),
          when(noPlant && col("doc_id") % 7 === 0,
            concat(lit(" contact u"), col("doc_id"), lit("@example.com"))).otherwise(lit("")),
          when(noPlant && col("doc_id") % 11 === 0, lit(" from 10.1.2.3")).otherwise(lit("")),
          when(noPlant && col("doc_id") % 13 === 0, lit(" call 555-123-4567")).otherwise(lit("")))
          .as("text"))
    planted.persist(); println(s"[prof] delta=${planted.count()}")
    val surv = planted.join(
      Dedup.incrementalExact(planted, index)
        .filter(!col("is_dup")).select(col("doc_id")), Seq("doc_id"), "left_semi")
    surv.persist(); println(s"[prof] survivors=${surv.count()}")
    time("crawl: matchedIds count") { println(s"  -> ${matched(surv).count()}") }
    time("crawl: full cut") {
      Dedup.incrementalCutSpans(surv, index, base).count()
    }
    val cut = time("crawl: cut materialized") {
      val c = Dedup.incrementalCutSpans(surv, index, base); c.persist(); c.count(); c
    }
    val scrubbed = time("crawl: scrub") {
      val sc = Corpus.piiScrub(cut, "doc_id", "clean_text")
        .join(cut.select(col("doc_id"), col("n_removed")), Seq("doc_id"))
      sc.persist(); sc.count(); sc
    }
    time("crawl: scrub count AGAIN") { scrubbed.count() }
    val gate = Corpus.repetitionMetrics(scrubbed, "doc_id", "clean_text")
      .filter((col("n_tokens") - col("n_distinct_tokens")) * lit(2L) <= col("n_tokens") * lit(1L))
      .filter(col("top_token_count") * lit(10L) <= col("n_tokens") * lit(1L))
    time("crawl: gate run 1") { gate.count() }
    time("crawl: gate run 2") { gate.count() }
    time("crawl: gate planning only") { gate.queryExecution.executedPlan; () }
    time("crawl: repetition gate") {
      Corpus.repetitionMetrics(scrubbed, "doc_id", "clean_text")
        .filter((col("n_tokens") - col("n_distinct_tokens")) * lit(2L) <= col("n_tokens") * lit(1L))
        .filter(col("top_token_count") * lit(10L) <= col("n_tokens") * lit(1L)).count()
    }
    time("full crawlIncrement") {
      TrainingSet.crawlIncrement(planted, index, base)._1.orderBy("doc_id").collect().length
    }
    spark.stop()
  }
}
