package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev loop: where does the pruned batch door's wall-clock go? */
object PruneProf {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t(n: String)(f: => Unit) = {
      val s = System.nanoTime(); f
      println(f"[probe] $n: ${(System.nanoTime() - s) / 1e9}%.2f s")
    }
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val i = sc.stageInfo
        val ms = i.completionTime.getOrElse(0L) - i.submissionTime.getOrElse(0L)
        if (ms > 500) println(f"[stage] ${ms/1000.0}%.1fs tasks=${i.numTasks} ${i.name.take(80)} | ${i.details.linesIterator.toSeq.drop(1).take(2).mkString(" <- ").take(160)}")
      }
    })
    val docs = graft.sources.Tables.documents(spark, dir)
    val queries = docs.filter(col("doc_id") % 5 === 1)
      .select(col("doc_id").as("query_id"),
        array_join(slice(graft.functions.TextFunctions.tokens(col("text")), 1, 3), " ")
          .as("query"))
    val ix = graft.sources.Fixtures.searchIndex(spark, dir)
    val qt = queries
      .select(col("query_id"), explode(graft.functions.TextFunctions.tokens(col("query"))).as("token"))
      .filter(col("token") =!= "").distinct()
    val terms = qt.select("token").distinct().collect().map(_.getString(0)).toSeq
    val matched0 = ix.postings
      .filter(col("token").isin(terms: _*))
      .select(col("doc_id"), col("token"), col("tf"), col("dl"))
    val dft = ix.df.get.filter(col("token").isin(terms: _*))
    val matched = matched0.repartition(spark.sessionState.conf.numShufflePartitions, col("doc_id"))
    def scored = matched
      .join(broadcast(dft), Seq("token"))
      .crossJoin(broadcast(ix.stats))
      .withColumn("idf_d",
        (lit(2).cast("decimal(38,0)") * (col("n_docs") - col("dft")) + 1).cast("double") /
          (lit(2).cast("decimal(38,0)") * col("dft") + 1).cast("double"))
      .withColumn("tf_d",
        (lit(44).cast("decimal(38,0)") * col("total_tokens") * col("tf")).cast("double") /
          (lit(20).cast("decimal(38,0)") * col("total_tokens") * col("tf") +
            lit(6).cast("decimal(38,0)") * col("total_tokens") +
            lit(18).cast("decimal(38,0)") * col("dl") * col("n_docs")).cast("double"))
      .withColumn("s_t", col("idf_d") * col("tf_d"))
      .join(broadcast(qt), Seq("token"))
    t("fanout count") { println("[probe] fanout=" + scored.count()) }
    t("fanout sum(s_t)") { println("[probe] s=" + scored.agg(sum(col("s_t"))).collect()(0)) }
    t("agg count-only") { println("[probe] g=" + scored.groupBy(col("query_id"), col("doc_id"))
      .agg(count(lit(1)).as("nt")).count()) }
    t("agg sum/max/count") { println("[probe] g=" + scored.groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("s_t")).as("apx"), max(col("s_t")).as("mx"), count(lit(1)).as("nt")).count()) }
    def pairs = scored.groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("s_t")).as("apx"), max(col("s_t")).as("mx"), count(lit(1)).as("nt"))
      .withColumn("eps", col("nt").cast("double") * lit(1e-13))
      .select(col("query_id"), col("doc_id"),
        greatest(col("mx"), col("apx") * (lit(1.0) - col("eps"))).as("lo"),
        (col("apx") * (lit(1.0) + col("eps"))).as("hi"))
    t("pairs count") { println("[probe] pairs=" + pairs.count()) }
    val theta = pairs.groupBy(col("query_id"))
      .agg(graft.functions.TopK.topKDouble(5)(col("lo"), col("doc_id")).as("tk"))
      .select(col("query_id"),
        when(size(col("tk.entries")) < 5, lit(Double.NegativeInfinity))
          .otherwise(element_at(col("tk.entries"), 5).getField("score")).as("theta"))
    t("theta count") { println("[probe] theta=" + theta.count()) }
    val surv = pairs.join(broadcast(theta), Seq("query_id"))
      .filter(col("hi") >= col("theta"))
      .select(col("query_id"), col("doc_id"))
    t("surv count") { println("[probe] surv=" + surv.count()) }
    val perDoc = scored.join(broadcast(surv), Seq("query_id", "doc_id"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(collect_list(struct(col("token"), col("s_t"))).as("parts"))
      .withColumn("sorted", transform(array_sort(col("parts")), _.getField("s_t")))
      .select(col("query_id"), col("doc_id"),
        size(col("sorted")).cast("long").as("n_terms"),
        aggregate(col("sorted"), lit(0.0), _ + _).as("score"))
    t("perDoc count") { println("[probe] perDoc=" + perDoc.count()) }
    // the r15-vs-r16 fold-exchange metric: rows the exact order-fixed fold
    // consumes — r15 folded the FULL fanout; r16 folds survivors only
    t("fold input (survivors' term rows)") {
      println("[probe] fold_input=" + scored
        .join(broadcast(surv), Seq("query_id", "doc_id")).count())
    }
    t("full door") {
      println("[probe] rows=" + graft.operators.Search
        .bm25TopKAllIndexed(ix, queries, k = 5).count())
    }
    graft.operators.Dedup.clearCaches()
    spark.stop()
  }
}
