package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/**
 * SemIndex drift statistic + rebuild (VERDICT r9 missing #2): the
 * delta-sized signal that tells a crawl loop its appended waves are
 * sliding off the trained cell space, and the rebuild operator that
 * restores the fresh-training regime. ScaleBench's drift section carries
 * the at-scale response curve (recall 0.909 → 0.997 at full drift); this
 * spec pins the small deterministic properties.
 */
class SemDriftSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  private val dim = 16

  /** Deterministic clustered vectors: 8 latent unit-ish dirs (hash-drawn),
    * blended toward fresh dirs by `f`, plus per-id noise. Mirrors
    * ScaleBench's drift generator at toy size. */
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
          (lit((1.0 - f) * s) * h(lit("sd-u"), col("k"), j) +
            lit(f * s) * h(lit("sd-w"), col("k"), j) +
            lit(0.5) * h(lit("sd-n"), col("id"), j) +
            lit(copyNoise) * h(lit("sd-e"), col("id"), j)).cast("double")))
      .select((col("id") + lit(idBump)).as("vec_id"), col("embedding"))
  }

  test("semDriftStat: base-distributed wave scores ~ the quantile, drifted wave is flagged") {
    val idx = Dedup.buildSemIndex(clustered(1500, 0, 0.0), dim, nlist = 8)
    val baseline = Dedup.semDriftBaseline(idx, quantile = 0.1)
    // a fresh wave drawn from the SAME distribution sits at the quantile by
    // definition (fresh noise seeds, same cluster dirs)
    val statBase = Dedup.semDriftStat(clustered(400, 1500, 0.0), idx, baseline)
    // a wave at fully-fresh cluster dirs has no cell built for it
    val statDrift = Dedup.semDriftStat(clustered(400, 1500, 1.0), idx, baseline)
    assert(statBase <= 0.3, s"base-distributed wave must not trip the signal: $statBase")
    assert(statDrift >= statBase + 0.3,
      s"full drift must move the signal decisively: $statBase -> $statDrift")
  }

  test("rebuildSemIndex: contents bit-identical, cell space re-trained, shape overridable") {
    val base = clustered(1200, 0, 0.0)
    val wave = clustered(300, 1200, 1.0)
    val grown = Dedup.appendSemIndex(Dedup.buildSemIndex(base, dim, nlist = 8), wave)
    val rebuilt = Dedup.rebuildSemIndex(grown, nlist = 16)
    assert(rebuilt.nlist == 16 && rebuilt.nassign == grown.nassign && rebuilt.dim == dim)
    // the quantization round-trip is exact: the rebuilt index holds the SAME
    // (id, q, norm2) vectors, only their cell assignments change
    def contents(i: Dedup.SemIndex) = i.cells
      .select(col("id"), col("q"), col("norm2")).distinct()
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1).toList, r.getLong(2))).toSet
    assert(contents(rebuilt) == contents(grown))
    // and the rebuild is exactly buildSemIndex over the reconstructed
    // vectors — same deterministic trainer, bit-equal centroids
    val direct = Dedup.buildSemIndex(
      Dedup.semIndexVectors(grown), dim, nlist = 16, nassign = grown.nassign)
    assert(rebuilt.centroids.toSeq == direct.centroids.toSeq)
  }

  test("rebuild restores probe recall on a fully-drifted wave") {
    val base = clustered(1500, 0, 0.0)
    val idx = Dedup.buildSemIndex(base, dim, nlist = 8)
    val wave = clustered(300, 1500, 1.0)
    // probes: near-threshold copies of the wave (cos ~ 0.9 at copyNoise 0.45
    // on top of the same seeds), id-bumped so they are strictly higher-id
    val probes = clustered(300, 1500, 1.0, copyNoise = 0.45, idBump = 1000000L)
    // truth: which planted pairs REALLY clear cos >= 0.9, by the operator's
    // own integer predicate
    val qz = (c: org.apache.spark.sql.Column) =>
      transform(c, x => round(x.cast("double") * lit(1000)).cast("long"))
    import graft.functions.expressions.ArrayDotProduct
    val wq = wave.select(col("vec_id").as("id_a"), qz(col("embedding")).as("q_a"))
    val pq = probes.select(col("vec_id").as("id_b"), qz(col("embedding")).as("q_b"))
    val trueClear = wq.join(pq, wq("id_a") + 1000000L === pq("id_b"))
      .withColumn("dot", ArrayDotProduct(col("q_a"), col("q_b")))
      .withColumn("n2a", ArrayDotProduct(col("q_a"), col("q_a")))
      .withColumn("n2b", ArrayDotProduct(col("q_b"), col("q_b")))
      .filter(col("dot") > 0 &&
        col("dot") * col("dot") * lit(100L) >= lit(81L) * col("n2a") * col("n2b"))
      .count()
    assert(trueClear >= 250, s"fixture sanity: most pairs must clear the threshold: $trueClear")
    val grown = Dedup.appendSemIndex(idx, wave)
    def recall(i: Dedup.SemIndex): Double =
      Dedup.incrementalSemantic(probes, i).filter(!col("keep")).count().toDouble / trueClear
    val before = recall(grown)
    val after = recall(Dedup.rebuildSemIndex(grown, nlist = 16))
    assert(after >= before, s"rebuild must not lose recall: $before -> $after")
    assert(after >= 0.95, s"rebuild must restore near-full recall: $after")
  }
}
