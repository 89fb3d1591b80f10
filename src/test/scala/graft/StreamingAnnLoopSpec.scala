package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity
import graft.streaming.StreamingOps

/**
 * The ANN tier's continuous append-serve loop with the drift lever wired in
 * ([[StreamingOps.annIncrementBatchFn]]) — the [[StreamingSemLoopSpec]]
 * story over the IVF-PQ store: per micro-batch the served neighbors must
 * equal the batch-tier query against the snapshot the previous batch left
 * behind, the drift sidecar must stay quiet on base-distributed input, a
 * fully-drifted wave must TRIGGER the quantizer rebuild (fresh centroids
 * AND fresh PQ codebooks), and the rebuilt snapshot must serve recovered
 * recall to the NEXT batch — beating the append-only (stale-quantizer)
 * counterfactual the lever exists to prevent.
 */
class StreamingAnnLoopSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  private val dim = 16

  /** The SemDriftSpec/StreamingSemLoopSpec deterministic clustered
    * generator: 8 latent dirs blended toward fresh dirs by `f`. */
  private def clustered(n: Int, idOffset: Long, f: Double): DataFrame = {
    def h(seed: org.apache.spark.sql.Column*): org.apache.spark.sql.Column =
      (pmod(xxhash64(seed: _*), lit(2001L)) - lit(1000L)) / lit(1000.0)
    val s = if (f == 0.0 || f == 1.0) 1.0
      else 1.0 / math.sqrt((1.0 - f) * (1.0 - f) + f * f)
    spark.range(n).withColumn("id", col("id") + lit(idOffset))
      .withColumn("k", pmod(col("id"), lit(8L)))
      .withColumn("embedding",
        transform(sequence(lit(0), lit(dim - 1)), j =>
          (lit((1.0 - f) * s) * h(lit("al-u"), col("k"), j) +
            lit(f * s) * h(lit("al-w"), col("k"), j) +
            lit(0.5) * h(lit("al-n"), col("id"), j)).cast("double")))
      .select(col("id").as("vec_id"), col("embedding"))
  }

  private def driftMeta(root: String, v: String): (Double, Double, Boolean) = {
    val r = spark.read.parquet(s"$root/$v/drift").collect()(0)
    (r.getAs[Double]("baseline"), r.getAs[Double]("stat"), r.getAs[Boolean]("rebuilt"))
  }

  /** recall@k of served results vs exact cosine truth over `contents`. */
  private def recallOf(served: DataFrame, contents: DataFrame,
      probes: DataFrame, k: Int): Double = {
    val truth = Similarity.topKCosine(contents, probes, k)
      .select(col("qid"), col("nid")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    if (truth.isEmpty) 1.0
    else {
      val got = served.select(col("qid"), col("nid")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      truth.intersect(got).size.toDouble / truth.size
    }
  }

  test("stationary batch serves at batch parity; drifted batch rebuilds; recall recovers") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("graft-ann-loop").toString
    val (root, out, ckpt) = (s"$tmp/index", s"$tmp/out", s"$tmp/ckpt")
    val k = 5

    val base = clustered(1500, 0, 0.0)
    val seedIx = Similarity.buildAnnIndex(base, dim, nlist = 16, m = 4, ks = 64)
    StreamingOps.seedAnnIndex(seedIx, root)
    val seedBaseline = driftMeta(root, "v-seed")._1

    def collectVecs(df: DataFrame): Seq[(Long, Seq[Double])] = df.collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toSeq)).toSeq

    val ms = MemoryStream[(Long, Seq[Double])]
    // nprobe 2 of nlist 16 probes 1/8 of the cell space — tight enough that
    // stale centroids on drifted vectors measurably cost recall (the decay
    // the lever exists to stop); targetCellSize 100 re-sizes a fired
    // rebuild's nlist to the grown contents (~2200 → 22 cells)
    val q = StreamingOps.annIncrementStream(
      ms.toDF().toDF("vec_id", "embedding"), root, out, ckpt,
      k = k, nprobe = 2, rerank = 32, rebuildAt = 0.3, targetCellSize = 100)
    try {
      // ---- batch 0: base-distributed wave — served neighbors equal the
      // batch tier against the seed snapshot; no rebuild; baseline carried
      val wave0 = clustered(400, 1500, 0.0)
      ms.addData(collectVecs(wave0): _*)
      q.processAllAvailable()
      val got0 = spark.read.parquet(s"$out/batch=0")
        .select("qid", "nid", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val fromDisk = Similarity.readAnnIndex(spark, s"$root/v-seed")
      val expect0 = Similarity.annQueryIndex(fromDisk, wave0, k, nprobe = 2, rerank = 32)
        .select("qid", "nid", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got0 == expect0 && got0.nonEmpty,
        "micro-batch 0 must serve exactly the batch tier's answer")
      val (b0, stat0, rebuilt0) = driftMeta(root, "v0")
      assert(!rebuilt0 && stat0 <= 0.3,
        s"base-distributed wave must not trip the rebuild: stat $stat0")
      assert(b0 == seedBaseline, "an append-only round must carry the baseline unchanged")
      assert(Similarity.readAnnIndex(spark, s"$root/v0").vecs.count() == 1900,
        "v0 must hold base + wave0")

      // ---- batch 1: fully-drifted wave — signal fires, BOTH quantizer
      // stages retrain, nlist re-sizes to the contents, baseline re-derived
      val wave1 = clustered(300, 1900, 1.0)
      ms.addData(collectVecs(wave1): _*)
      q.processAllAvailable()
      val (b1, stat1, rebuilt1) = driftMeta(root, "v1")
      assert(rebuilt1 && stat1 >= 0.3,
        s"fully-drifted wave must trigger the rebuild: stat $stat1")
      val v1 = Similarity.readAnnIndex(spark, s"$root/v1")
      assert(v1.vecs.count() == 2200)
      assert(v1.nlist == 22,
        s"fired rebuild must re-size nlist to contents/targetCellSize: ${v1.nlist}")
      assert(b1 != seedBaseline,
        "a rebuilt snapshot must re-derive its baseline from the new cell space")

      // ---- batch 2: fresh queries from the drifted distribution — the
      // rebuilt snapshot must serve them at near-batch-tier recall and beat
      // the append-only (stale-quantizer) counterfactual
      val probes = clustered(300, 5000000, 1.0)
      ms.addData(collectVecs(probes): _*)
      q.processAllAvailable()
      val served = spark.read.parquet(s"$out/batch=2")
      val contents = v1.vecs.select(col("nid").as("vec_id"), col("vec").as("embedding"))
      val rec = recallOf(served, contents, probes, k)
      val appendOnly = Similarity.growAnnIndex(
        Similarity.growAnnIndex(seedIx, wave0), wave1)
      val recStale = recallOf(
        Similarity.annQueryIndex(appendOnly, probes, k, nprobe = 2, rerank = 32),
        contents, probes, k)
      println(s"[annloop] recall rebuilt $rec vs append-only $recStale")
      assert(rec >= 0.8, s"rebuilt snapshot must serve drifted queries well: $rec")
      assert(rec >= recStale,
        s"rebuild must not lose to the append-only counterfactual: $rec vs $recStale")
    } finally q.stop()

    // ---- pointer advanced; committed-replay guard is a no-op ----
    assert(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(root, "LATEST")), "UTF-8").trim == "v2")
    val before = Similarity.readAnnIndex(spark, s"$root/v2").vecs.count()
    StreamingOps.annIncrementBatchFn(root, out)(clustered(10, 9000000, 0.0), 2L)
    assert(Similarity.readAnnIndex(spark, s"$root/v2").vecs.count() == before,
      "replaying a committed batch must not append again")
  }
}
