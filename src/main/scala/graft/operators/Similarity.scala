package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.expressions.ArrayDotProduct

/**
 * Similarity search over an embedding column (`Array[Float]`).
 *
 * Two tiers, mirroring how ANN is actually deployed on large corpora:
 *  - [[topKDot]] / [[topKCosine]] — exact brute force: broadcast the (small)
 *    query set against the (huge) corpus. The corpus side is a narrow scan —
 *    no shuffle touches corpus rows until the per-query top-k reduction, which
 *    carries only `numQueries × k` candidates per partition.
 *  - [[cosineLshCandidates]] — random-hyperplane LSH blocking: corpus hashed
 *    to sign-bit band keys map-side; only same-band pairs are compared. This
 *    is the 100 TB path (IVF-style bucketing expressed as a Spark equality
 *    join); exact re-ranking runs on the candidate set.
 */
object Similarity {

  /** Exact dot product in double precision (codegen'd custom expression). */
  def dotExpr(a: Column, b: Column): Column = ArrayDotProduct(a, b)

  def cosineExpr(a: Column, b: Column): Column =
    dotExpr(a, b) / (sqrt(dotExpr(a, a)) * sqrt(dotExpr(b, b)))

  /**
   * Quantized integer dot product — bit-exact across engines and partition
   * orders. The float components are widened to double *before* scaling so the
   * arithmetic is the identical IEEE sequence the oracle runs.
   */
  def dotQExpr(a: Column, b: Column, scale: Int): Column =
    ArrayDotProduct(quantize(a, scale), quantize(b, scale))

  /** Float/double array → exact integer array at `scale` (identical IEEE path to the oracle). */
  def quantize(a: Column, scale: Int): Column =
    transform(a, x => round(x.cast("double") * lit(scale)).cast("long"))

  private def topK(scored: DataFrame, k: Int, orderCols: Seq[Column]): DataFrame =
    scored
      .withColumn("rank",
        row_number().over(Window.partitionBy("qid").orderBy(orderCols: _*)).cast("long"))
      .filter(col("rank") <= k)
      .orderBy(col("qid"), col("rank"))

  /**
   * Exact top-k by quantized integer dot product (scale 10⁴). Deterministic
   * ranking: score descending, neighbor id ascending — integer scores make tie
   * order reproducible on any cluster.
   */
  def topKDot(
      corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      scale: Int = 10000): DataFrame = {
    // quantize each side ONCE map-side; the per-pair work is a single
    // codegen'd integer loop
    val c = corpus.select(col(idCol).as("nid"), quantize(col(vecCol), scale).as("cq"))
    val q = queries.select(col(idCol).as("qid"), quantize(col(vecCol), scale).as("qq"))
    val scored = c
      .join(broadcast(q), col("qid") =!= col("nid")) // broadcast: corpus never shuffles
      .withColumn("dot_q", ArrayDotProduct(col("qq"), col("cq")))
      .select("qid", "nid", "dot_q")
    topK(scored, k, Seq(col("dot_q").desc, col("nid").asc))
  }

  /** Exact top-k by cosine (double precision; baseline for recall measurement). */
  def topKCosine(
      corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    // norms precomputed per side so the per-pair work is one dot + one divide
    val c = corpus.select(col(idCol).as("nid"), col(vecCol).as("cvec"),
      sqrt(ArrayDotProduct(col(vecCol), col(vecCol))).as("cnorm"))
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("qvec"),
      sqrt(ArrayDotProduct(col(vecCol), col(vecCol))).as("qnorm"))
    val scored = c
      .join(broadcast(q), col("qid") =!= col("nid"))
      .withColumn("cosine",
        ArrayDotProduct(col("qvec"), col("cvec")) / (col("qnorm") * col("cnorm")))
      .select("qid", "nid", "cosine")
    topK(scored, k, Seq(col("cosine").desc, col("nid").asc))
  }

  /**
   * Random-hyperplane LSH band keys: `tables` keys per vector, each from
   * `planesPerTable` sign bits (r ∈ {−1,+1}^dim, plane-seeded PRNG — the
   * classic SRP-LSH binary-projection simplification). Collision probability
   * for angle θ: (1 − θ/π)^planes per table. Map-side only — ONE codegen'd
   * pass per vector ([[SrpLshKeys]] computes every table key in a single
   * loop nest; the composed one-dot-per-plane form paid tables × planes
   * vector passes).
   */
  def withLshKeys(
      df: DataFrame, dim: Int, tables: Int = 8, planesPerTable: Int = 8,
      vecCol: String = "embedding"): DataFrame =
    df.select(col("*"),
      posexplode(graft.functions.expressions.SrpLshKeys(col(vecCol), dim, tables, planesPerTable))
        .as(Seq("ltable", "lkey")))

  /**
   * ANN via LSH blocking + exact cosine re-rank within buckets, returning the
   * top-k approximate neighbors per query vector. Recall is tunable with
   * (tables × planes); candidates scale with bucket occupancy, never n².
   */
  def annCosineLsh(
      corpus: DataFrame, queries: DataFrame, k: Int, dim: Int,
      tables: Int = 8, planesPerTable: Int = 8,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    // The candidate dedup shuffles only (qid, nid) id pairs — vectors and
    // norms rejoin afterwards, so no float array ever rides the distinct.
    val cKeys = withLshKeys(corpus, dim, tables, planesPerTable, vecCol)
      .select(col("ltable"), col("lkey"), col(idCol).as("nid"))
    val qKeys = withLshKeys(queries, dim, tables, planesPerTable, vecCol)
      .select(col("ltable"), col("lkey"), col(idCol).as("qid"))
    val candidates = cKeys.join(broadcast(qKeys), Seq("ltable", "lkey"))
      .filter(col("qid") =!= col("nid"))
      .select("qid", "nid").distinct()
    val cSide = corpus.select(col(idCol).as("nid"), col(vecCol).as("cvec"),
      sqrt(ArrayDotProduct(col(vecCol), col(vecCol))).as("cnorm"))
    val qSide = queries.select(col(idCol).as("qid"), col(vecCol).as("qvec"),
      sqrt(ArrayDotProduct(col(vecCol), col(vecCol))).as("qnorm"))
    val scored = candidates
      .join(cSide, Seq("nid"))
      .join(broadcast(qSide), Seq("qid"))
      .withColumn("cosine",
        ArrayDotProduct(col("qvec"), col("cvec")) / (col("qnorm") * col("cnorm")))
      .select("qid", "nid", "cosine")
    topK(scored, k, Seq(col("cosine").desc, col("nid").asc))
  }
}
