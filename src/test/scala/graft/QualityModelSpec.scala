package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.QualityModel

/**
 * Trained quality classifier: the learning claim on a PLANTED linear
 * concept (the registered queries pin engine parity; this spec pins that
 * the GD machinery actually learns), the partitioning-invariance claim
 * behind the integer-quantized gradient design, and the scoring contract.
 */
class QualityModelSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  /** A linearly separable planted concept over two features: y = 1 iff
    * 2·x1 − x2 > 0.5, on a deterministic grid with margin (no RNG — the
    * grid point nearest the boundary is 0.1 away). */
  private def plantedFeats = {
    val rows = for {
      i <- 0 until 20; j <- 0 until 20
      x1 = i / 10.0 // 0.0 .. 1.9
      x2 = j / 5.0 // 0.0 .. 3.8
      margin = 2.0 * x1 - x2 - 0.5
      if math.abs(margin) > 0.1 // keep a margin band clear
    } yield (i.toLong * 100 + j, if (margin > 0) 1.0 else 0.0, 1.0, x1, x2)
    rows.toDF("doc_id", "y", "x_b", "x_1", "x_2")
  }
  private val cols = Seq("x_b", "x_1", "x_2")

  test("trainLr recovers a planted linear concept (accuracy ≥ 0.95, signs right)") {
    val feats = plantedFeats.persist()
    try {
      val w = QualityModel.trainLr(feats, xCols = cols, iters = 64, lr = 4.0)
      // the concept is +x1, −x2 with a negative offset: signs must match
      assert(w(1) > 0 && w(2) < 0, s"weight signs: ${w.toSeq}")
      val scored = QualityModel.scoreLr(feats, w, cols)
      val acc = scored.join(feats.select("doc_id", "y"), "doc_id")
        .select(avg(when((col("score") >= 0.5) === (col("y") === 1.0), 1.0)
          .otherwise(0.0)))
        .head().getDouble(0)
      assert(acc >= 0.95, s"planted-concept train accuracy $acc")
    } finally feats.unpersist(blocking = false): Unit
  }

  test("trained weights are bit-identical under repartitioning (integer gradient sums)") {
    val feats = plantedFeats
    val w1 = QualityModel.trainLr(feats.repartition(1), xCols = cols, iters = 8)
    val w7 = QualityModel.trainLr(feats.repartition(7, col("doc_id")), xCols = cols, iters = 8)
    val w32 = QualityModel.trainLr(feats.repartition(32), xCols = cols, iters = 8)
    assert(w1.toSeq == w7.toSeq && w1.toSeq == w32.toSeq,
      s"partitioning leaked into the gradient: ${w1.toSeq} / ${w7.toSeq} / ${w32.toSeq}")
  }

  test("featurize: exact surface features on a hand-computed doc") {
    val out = QualityModel.featurize(
      Seq((1L, "The cat, and a dog!")).toDF("doc_id", "text")).head()
    // tokens of lowercase: [the, cat,, and, a, dog!] → 5 tokens; stopwords
    // the/and/a → 3; punct ,,! → 2 of which [.,!?;:] matches ',' ',' '!' = 2
    // (one comma is inside "cat,"): chars 19
    assert(out.getDouble(1) == 1.0)
    assert(out.getDouble(2) == 5.0 / 100.0)
    assert(out.getDouble(3) == 3.0 / 5.0 * 10.0)
    assert(out.getDouble(4) == 2.0 / 5.0)
    assert(out.getDouble(5) == 19.0 / 5.0 / 10.0)
  }

  test("heuristicLabel splits on the documented gate and nothing else") {
    val df = Seq(
      (1L, ("the and a of to in is that it for " * 6).trim), // long, stopword-rich → 1
      (2L, "zz")) // 1 token, no stopwords → low score → 0
      .toDF("doc_id", "text")
    val lab = QualityModel.heuristicLabel(df).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(lab.toSeq == Seq((1L, 1.0), (2L, 0.0)))
  }

  test("scoreLr: zero weights score exactly 0.5 and keep (boundary is ≥)") {
    val feats = QualityModel.featurize(Seq((1L, "a b c")).toDF("doc_id", "text"))
    val r = QualityModel.scoreLr(feats, Array(0.0, 0.0, 0.0, 0.0, 0.0)).head()
    assert(r.getDouble(1) == 0.5 && r.getBoolean(2))
  }

  test("trainLr rejects a non-positive iteration count") {
    intercept[IllegalArgumentException](
      QualityModel.trainLr(plantedFeats, xCols = cols, iters = 0))
  }

  test("scoreFromText ≡ featurize→scoreLr bit-exactly (the inline gate path)") {
    val docs = Seq(
      (1L, "the cat and a dog sat on the mat, mostly."),
      (2L, "zz qq ww"),
      (3L, ("the and a of to in is that it for " * 8).trim))
      .toDF("doc_id", "text")
    val w = Array(-0.3, 1.7, 0.9, -2.1, 0.4)
    val frame = QualityModel.scoreLr(QualityModel.featurize(docs), w)
      .select("doc_id", "score").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val inline = docs.select(col("doc_id"),
      QualityModel.scoreFromText(col("text"), w).as("s")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(frame == inline, s"paths diverge: $frame vs $inline")
    intercept[IllegalArgumentException](
      QualityModel.scoreFromText(col("text"), Array(1.0, 2.0)))
  }

  test("crawlIncrement lrGate: exactly the below-threshold cleaned survivors drop") {
    import graft.operators.{Dedup, TrainingSet}
    val base = Seq((1L, "base corpus doc entirely unrelated words here today")).toDF("doc_id", "text")
    val idx = Dedup.buildIndex(base)
    // two clean delta docs: one stopword-rich (scores high under +stopword
    // weights), one stopword-free (scores low) — all tokens DISTINCT (the
    // repetition gate's top-token ≤ 1/10 bound must not fire), no dups, no
    // PII, so the LR stage is the ONLY discriminator
    val delta = Seq(
      (10L, "the cat of dog in mill at old stone for"), // 4 distinct stopwords / 10 tokens
      (11L, "zebra quartz wobble nimbus kelp vortex prism glyph ember xylem")) // none
      .toDF("doc_id", "text")
    // score = sigmoid(10·stopword_ratio − 1): doc 10 → σ(3) > 0.5,
    // doc 11 → σ(−1) < 0.5 (a zero-z doc would sit exactly ON the ≥ 0.5
    // boundary and keep — the bias keeps the fixture off the edge)
    val w = Array(-1.0, 0.0, 1.0, 0.0, 0.0)
    val (accepted, _) = TrainingSet.crawlIncrement(delta, idx, base, lrGate = Some(w))
    assert(accepted.select("doc_id").collect().map(_.getLong(0)).toSeq == Seq(10L),
      "only the stopword-rich doc clears the planted +stopword model")
    // ungated twin keeps both — the drop is attributable to the LR stage
    val (ungated, _) = TrainingSet.crawlIncrement(delta, idx, base)
    assert(ungated.count() == 2L)
  }

  test("LrModel store: write/read round-trips bit-exactly; fingerprint pins the weights") {
    val tmp = java.nio.file.Files.createTempDirectory("lrmodel").toString
    val m = QualityModel.LrModel(QualityModel.FeatureCols,
      IndexedSeq(-1.0, 0.25, 1.0 / 3.0, -0.1, 4.0e-7))
    QualityModel.writeLrModel(m, spark, s"$tmp/m")
    val back = QualityModel.readLrModel(spark, s"$tmp/m")
    // bit-exact round trip: the fingerprint hashes IEEE bit patterns, so
    // equality of fingerprints IS equality of every weight and its order
    assert(back.xCols == m.xCols)
    assert(back.weights.map(java.lang.Double.doubleToLongBits)
      == m.weights.map(java.lang.Double.doubleToLongBits))
    assert(back.fingerprint == m.fingerprint)
    // any weight change (even 1 ulp) or reorder changes the fingerprint
    val ulp = m.copy(weights = m.weights.updated(1,
      java.lang.Double.longBitsToDouble(
        java.lang.Double.doubleToLongBits(m.weights(1)) + 1L)))
    assert(ulp.fingerprint != m.fingerprint)
  }

  test("scoreLrModel: a retrained-store fingerprint mismatch fails loudly; the pin passes") {
    val feats = QualityModel.featurize(
      Seq((1L, "the cat sat on the mat")).toDF("doc_id", "text"))
    val m = QualityModel.LrModel(QualityModel.FeatureCols,
      IndexedSeq(0.5, 0.0, 0.0, 0.0, 0.0))
    val retrained = m.copy(weights = m.weights.updated(0, 0.75))
    // pinned + matching: serves
    assert(QualityModel.scoreLrModel(feats, m,
      expectFingerprint = Some(m.fingerprint)).count() == 1L)
    // pinned + retrained store: loud contract error, not a silent shift
    val e = intercept[IllegalArgumentException](
      QualityModel.scoreLrModel(feats, retrained,
        expectFingerprint = Some(m.fingerprint)))
    assert(e.getMessage.contains("fingerprint mismatch"))
    val e2 = intercept[IllegalArgumentException](
      QualityModel.scoreFromTextModel(col("text"), retrained,
        expectFingerprint = Some(m.fingerprint)))
    assert(e2.getMessage.contains("fingerprint mismatch"))
  }

  test("trainLrModel ≡ inline featurize+label+trainLr (the store serves the same bits)") {
    val docs = (1 to 60).map { i =>
      (i.toLong,
        if (i % 2 == 0) "the cat and the dog sat on a mat with them all here."
        else "zebra quartz wobble nimbus kelp")
    }.toDF("doc_id", "text")
    val viaStore = QualityModel.trainLrModel(docs, iters = 4)
    val feats = QualityModel.featurize(docs)
      .join(QualityModel.heuristicLabel(docs), "doc_id")
    val inline = QualityModel.trainLr(feats, iters = 4)
    assert(viaStore.weights.map(java.lang.Double.doubleToLongBits).toSeq
      == inline.map(java.lang.Double.doubleToLongBits).toSeq)
  }
}
