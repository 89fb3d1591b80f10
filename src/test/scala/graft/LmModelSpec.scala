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

  test("binding caps only remove information: a kept bigram with a cut prev word backs off") {
    import spark.implicits._
    // "zz aa" is the ONLY (hence top) bigram — the single-token filler docs
    // produce none — so it survives maxBigrams=1, while "zz" (5 occurrences)
    // is only the 3rd word behind aa (11) and bb (7) and maxVocab=2 CUTS it:
    // exactly the cap-binding state the cprev guard exists for. Pre-guard,
    // the "aa" token after "zz" scored NULL bits (sum silently dropped it —
    // cheaper than the best-known word).
    val train = (Seq.fill(5)("zz aa") ++ Seq.fill(6)("aa") ++ Seq.fill(7)("bb")).toDF("text")
    val m = Corpus.trainLmModel(train, minBigramCount = 1, maxVocab = 2, maxBigrams = 1)
    assert(m.uni.select("w").collect().map(_.getString(0)).toSet == Set("aa", "bb"))
    assert(m.big.select("bg").collect().map(_.getString(0)).toSet == Set("zz aa"),
      "fixture must pin the cap-binding state: bigram kept, its prev word cut")
    val scored = Corpus.lmScoreModel(Seq((1L, "zz aa")).toDF("doc_id", "text"), m)
      .select("lm_bits").head().getLong(0)
    // T = 23 tokens → tBits = 4. "zz" is OOV at doc start → 5 bits. "aa"
    // after the CUT "zz": the kept bigram must NOT apply (its cprev is gone);
    // the token backs off to 1 + tBits − floor(log2(cw=11)) = 2 bits. A
    // dropped (NULL) second token would have read 5 total; the sound ladder
    // reads 7 and NEVER less than the same doc under an uncapped vocab.
    assert(scored == 7L, s"expected 5 (OOV zz) + 2 (backoff aa) = 7 bits, got $scored")
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
