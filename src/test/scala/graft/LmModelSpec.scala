package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Corpus, Dedup, TrainingSet}
import graft.sources.{Fixtures, Tables}

/**
 * The persisted LM model (VERDICT r8 #7): train-once/score-many must be
 * indistinguishable from retraining on the same split, and the crawl
 * composition's LM gate must equal scoring the ungated output against the
 * same fixed model.
 */
class LmModelSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val sf = "/root/testdata/sf0.001"
  private def docs = Tables.documents(spark, sf)
  private def train = docs.filter(
    substring(md5(col("text")), 1, 4) < lit(Corpus.splitThresholdHex(0.0625)))

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Long, Boolean)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3))).toSeq

  test("persisted model scores identically to retraining on the same split") {
    val m = Corpus.trainLmModel(train)
    val path = java.nio.file.Files.createTempDirectory("graft-lm").toString + "/m"
    Corpus.writeLmModel(m, path)
    val reread = Corpus.readLmModel(spark, path)
    assert(reread.totalTokens == m.totalTokens)
    val direct = rows(Corpus.lmScore(docs, train))
    assert(direct.nonEmpty)
    assert(rows(Corpus.lmScoreModel(docs, reread)) == direct)
  }

  test("crawl LM gate == scoring the ungated manifest against the same fixed model") {
    val model = Fixtures.lmModel(spark, sf)
    val base = docs.filter(col("doc_id") % 5 =!= 0)
    val delta = docs.filter(col("doc_id") % 20 === 0)
    val index = Fixtures.dedupIndex(spark, sf)
    val ungated = TrainingSet.crawlIncrement(delta, index, base)._1
    val gated = TrainingSet.crawlIncrement(delta, index, base,
      lmModel = Some(model))._1
    val expectKept = Corpus.lmScoreModel(ungated, model, idCol = "doc_id",
        textCol = "clean_text")
      .filter(col("keep")).collect().map(_.getLong(0)).toSet
    val gotKept = gated.collect().map(_.getLong(0)).toSet
    assert(expectKept.nonEmpty && expectKept != ungated.collect().map(_.getLong(0)).toSet,
      "fixture must make the gate bind (some doc above the mean)")
    assert(gotKept == expectKept)
  }
}
