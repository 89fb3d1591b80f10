package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup
import graft.streaming.StreamingOps

/**
 * The semantic key space's continuous append loop with the drift lever
 * wired in ([[StreamingOps.semanticIncrementBatchFn]]): per micro-batch the
 * probe must equal the BATCH tier against the snapshot the previous batch
 * left behind, the drift sidecar must stay quiet on base-distributed input,
 * a fully-drifted wave must TRIGGER the rebuild, and the rebuilt snapshot
 * must serve recovered recall to the NEXT batch — the end-to-end story
 * SemDriftSpec pins operator-by-operator, here composed through the store.
 */
class StreamingSemLoopSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  private val dim = 16

  /** SemDriftSpec's deterministic clustered generator: 8 latent dirs blended
    * toward fresh dirs by `f`, per-id noise, optional near-copy jitter. */
  private def clustered(n: Int, idOffset: Long, f: Double,
      copyNoise: Double = 0.0, idBump: Long = 0L): DataFrame = {
    def h(seed: org.apache.spark.sql.Column*): org.apache.spark.sql.Column =
      (pmod(xxhash64(seed: _*), lit(2001L)) - lit(1000L)) / lit(1000.0)
    val s = if (f == 0.0 || f == 1.0) 1.0
      else 1.0 / math.sqrt((1.0 - f) * (1.0 - f) + f * f)
    spark.range(n).withColumn("id", col("id") + lit(idOffset))
      .withColumn("k", pmod(col("id"), lit(8L)))
      .withColumn("embedding",
        transform(sequence(lit(0), lit(dim - 1)), j =>
          (lit((1.0 - f) * s) * h(lit("sl-u"), col("k"), j) +
            lit(f * s) * h(lit("sl-w"), col("k"), j) +
            lit(0.5) * h(lit("sl-n"), col("id"), j) +
            lit(copyNoise) * h(lit("sl-e"), col("id"), j)).cast("double")))
      .select((col("id") + lit(idBump)).as("vec_id"), col("embedding"))
  }

  private def driftMeta(root: String, v: String): (Double, Double, Boolean) = {
    val r = spark.read.parquet(s"$root/$v/drift").collect()(0)
    (r.getAs[Double]("baseline"), r.getAs[Double]("stat"), r.getAs[Boolean]("rebuilt"))
  }

  test("stationary batch stays quiet; drifted batch rebuilds; next batch probes recovered") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("graft-sem-loop").toString
    val (root, out, ckpt) = (s"$tmp/index", s"$tmp/out", s"$tmp/ckpt")

    val base = clustered(1500, 0, 0.0)
    val seedIdx = Dedup.buildSemIndex(base, dim, nlist = 8)
    StreamingOps.seedSemIndex(seedIdx, root)
    val seedBaseline = driftMeta(root, "v-seed")._1

    def collectVecs(df: DataFrame): Seq[(Long, Seq[Double])] = df.collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toSeq)).toSeq

    val ms = MemoryStream[(Long, Seq[Double])]
    // targetCellSize 140: after batch 1 the contents are ~2200 vectors, so a
    // fired rebuild re-sizes nlist 8 → 16 — cells track the corpus's latent
    // modes (8 base dirs + 8 drifted dirs), the SemDeDup sizing rule the
    // batchFn scaladoc documents. rebuildAt 0.3: decisively past the
    // stationary ~0.1 (the baseline's own quantile) and safely under what a
    // fully-drifted wave scores here.
    val q = StreamingOps.semanticIncrementStream(
      ms.toDF().toDF("vec_id", "embedding"), root, out, ckpt,
      rebuildAt = 0.3, targetCellSize = 140)
    try {
      // ---- batch 0: base-distributed wave — parity with the batch tier,
      // no rebuild, baseline carried unchanged ----
      val wave0 = clustered(400, 1500, 0.0)
      ms.addData(collectVecs(wave0): _*)
      q.processAllAvailable()
      val got0 = spark.read.parquet(s"$out/batch=0")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
      val expect0 = Dedup.incrementalSemantic(wave0, seedIdx)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
      assert(got0 == expect0 && got0.nonEmpty,
        "micro-batch 0 must equal the batch tier against the seed snapshot")
      val (b0, stat0, rebuilt0) = driftMeta(root, "v0")
      assert(!rebuilt0 && stat0 <= 0.3,
        s"base-distributed wave must not trip the rebuild: stat $stat0")
      assert(b0 == seedBaseline, "an append-only round must carry the baseline unchanged")
      // the kept rows genuinely entered the snapshot
      val v0Ids = Dedup.readSemIndex(spark, s"$root/v0").cells
        .select("id").distinct().count()
      assert(v0Ids > 1500, s"v0 must hold base + kept wave: $v0Ids")

      // ---- batch 1: fully-drifted wave — the signal must fire and the
      // snapshot must be re-clustered with a re-derived baseline ----
      val wave1 = clustered(300, 1900, 1.0)
      ms.addData(collectVecs(wave1): _*)
      q.processAllAvailable()
      val (b1, stat1, rebuilt1) = driftMeta(root, "v1")
      assert(rebuilt1 && stat1 >= 0.3,
        s"fully-drifted wave must trigger the rebuild: stat $stat1")
      val v1 = Dedup.readSemIndex(spark, s"$root/v1")
      val v1Contents = v1.cells.select("id").distinct().count()
      assert(v1.nlist == math.max(8, math.ceil(v1Contents / 140.0).toInt) && v1.nlist > 8,
        s"the fired rebuild must re-size the cell count to contents/targetCellSize: " +
          s"nlist ${v1.nlist} for $v1Contents vectors")
      assert(b1 != seedBaseline,
        "a rebuilt snapshot must re-derive its baseline from the new cell space")

      // ---- batch 2: near-copies of the drifted wave — the REBUILT snapshot
      // must serve them at fresh-training recall (the lever's whole point;
      // without the rebuild the fixed seed cells measurably miss these —
      // asserted below against the append-only counterfactual) ----
      val probes = clustered(300, 1900, 1.0, copyNoise = 0.45, idBump = 1000000L)
      // TRUTH is defined over the wave vectors the dedup tier actually
      // ACCEPTED into the corpus (batch 1's keep=true rows): a probe whose
      // original was itself pruned as redundant has no in-corpus partner by
      // the tier's own semantics — counting it would test a corpus that
      // deliberately no longer exists
      val kept1 = spark.read.parquet(s"$out/batch=1")
        .filter(col("keep")).select(col("vec_id").as("id_a"))
      val qz = (c: org.apache.spark.sql.Column) =>
        transform(c, x => round(x.cast("double") * lit(1000)).cast("long"))
      import graft.functions.expressions.ArrayDotProduct
      val wq = wave1.select(col("vec_id").as("id_a"), qz(col("embedding")).as("q_a"))
        .join(kept1, Seq("id_a"), "left_semi")
      val pq = probes.select(col("vec_id").as("id_b"), qz(col("embedding")).as("q_b"))
      val truePairs = wq.join(pq, wq("id_a") + 1000000L === pq("id_b"))
        .withColumn("dot", ArrayDotProduct(col("q_a"), col("q_b")))
        .withColumn("n2a", ArrayDotProduct(col("q_a"), col("q_a")))
        .withColumn("n2b", ArrayDotProduct(col("q_b"), col("q_b")))
        .filter(col("dot") > 0 &&
          col("dot") * col("dot") * lit(100L) >= lit(81L) * col("n2a") * col("n2b"))
        .select(col("id_b"))
      val trueClear = truePairs.count()
      assert(trueClear >= 100, s"fixture sanity: enough in-corpus pairs must clear cos 0.9: $trueClear")
      ms.addData(collectVecs(probes): _*)
      q.processAllAvailable()
      // caught = the truth probes the snapshot flagged (a probe may also fall
      // to a different partner — still a true catch under the tier's
      // any-lower-id semantics, but restricting to the planted set keeps the
      // denominator and numerator over the same population)
      val flagged = spark.read.parquet(s"$out/batch=2")
        .filter(!col("keep")).select(col("vec_id").as("id_b"))
      val caught = truePairs.join(flagged, Seq("id_b"), "left_semi").count()
      val recall = caught.toDouble / trueClear
      assert(recall >= 0.95, s"loop-rebuilt snapshot must serve near-full recall: $recall")
      // counterfactual: the same probes against the append-only (no-rebuild)
      // store — SAME corpus contents (the loop's own kept sets), seed cell
      // space — the decay the lever exists to stop
      val kept0Vecs = wave0.join(spark.read.parquet(s"$out/batch=0")
        .filter(col("keep")).select("vec_id"), Seq("vec_id"), "left_semi")
      val kept1Vecs = wave1.join(kept1.withColumnRenamed("id_a", "vec_id"),
        Seq("vec_id"), "left_semi")
      val appendOnly = Dedup.appendSemIndex(
        Dedup.appendSemIndex(seedIdx, kept0Vecs), kept1Vecs)
      val flaggedNR = Dedup.incrementalSemantic(probes, appendOnly)
        .filter(!col("keep")).select(col("vec_id").as("id_b"))
      val caughtNoRebuild = truePairs.join(flaggedNR, Seq("id_b"), "left_semi").count()
      assert(caught >= caughtNoRebuild,
        s"rebuild must not lose to the append-only counterfactual: $caught vs $caughtNoRebuild")
      println(s"[semloop] recall with rebuild ${caught.toDouble / trueClear} vs " +
        s"append-only ${caughtNoRebuild.toDouble / trueClear} ($trueClear true pairs)")
    } finally q.stop()

    // ---- pointer advanced; committed-replay guard is a no-op ----
    assert(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(root, "LATEST")), "UTF-8").trim == "v2")
    val cellsBefore = Dedup.readSemIndex(spark, s"$root/v2").cells.count()
    StreamingOps.semanticIncrementBatchFn(root, out)(
      clustered(10, 5000, 0.0), 2L)
    assert(Dedup.readSemIndex(spark, s"$root/v2").cells.count() == cellsBefore,
      "replaying a committed batch must not append again")
  }
}
