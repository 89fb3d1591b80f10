package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev loop: does dynamic partition pruning fire on the LAZY indexed
  * door's (bucket, token) semi-join against the persisted postings?
  * Prints the plan fragments that decide the scaladoc's claim.
  * `sbt "Test/runMain graft.tools.DppPeek"` */
object DppPeek {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", false).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    import graft.operators.Search
    val docs = (1L to 2000L).map(i => (i, s"w${i % 97} w${i % 31} common"))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-dpp").toString
    Search.writeSearchIndex(Search.buildSearchIndex(docs), dir)
    val ix = Search.readSearchIndex(spark, dir)
    val qs = Seq((1L, "w3 w5"), (2L, "w7 common")).toDF("query_id", "query")
    val plan = Search.bm25TopKAllIndexedLazy(ix, qs, k = 3)
      .queryExecution.executedPlan.toString
    val hits = plan.linesIterator.filter(l =>
      l.contains("dynamicpruning") || l.contains("PartitionFilters")).toSeq
    println("==== dpp/partition-filter lines ====")
    hits.foreach(println)
    println(s"==== dynamicpruning present: ${plan.contains("dynamicpruning")}")
    spark.stop()
  }
}
