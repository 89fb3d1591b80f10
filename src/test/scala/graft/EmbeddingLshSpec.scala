package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/**
 * The LSH-blocked embedding dedup (the registered, plan-clean path) must give
 * the IDENTICAL answer to the all-pairs exact form — on the real test
 * corpora, at the registered threshold. This is the hardest regime for LSH
 * (the 0.45 threshold sits near the random-pair cosine for 64-dim unit
 * vectors, θ ≈ 63°), so the equality here is the strongest recall evidence
 * available: with tables = 24 × 2 planes the per-pair miss probability is
 * ~2·10⁻⁶ and every true pair on these corpora collides in several tables.
 */
class EmbeddingLshSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq

  for (sf <- Seq("sf0.001", "sf0.01")) {
    test(s"LSH-blocked == all-pairs exact on $sf (inline-vector path)") {
      val e = graft.sources.Tables.embeddings(spark, s"/root/testdata/$sf")
      val exact = rows(Dedup.embeddingNearDup(e))
      val lsh = rows(Dedup.embeddingNearDupLsh(e, dim = 64))
      assert(exact.nonEmpty, "corpus should contain near-dup pairs at 0.45")
      assert(lsh == exact)
    }
  }

  test("id-only banding path (100 TB form) gives the same answer on sf0.001") {
    val e = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val exact = rows(Dedup.embeddingNearDup(e))
    val lsh = rows(Dedup.embeddingNearDupLsh(e, dim = 64, inlineVectors = false))
    assert(lsh == exact)
  }
}
