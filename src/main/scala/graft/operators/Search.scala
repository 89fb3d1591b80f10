package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.tokens

/**
 * Lexical retrieval over the document corpus — the BM25 ranking function
 * (Robertson & Zaragoza 2009, "The Probabilistic Relevance Framework: BM25
 * and Beyond", §3.3) as one declarative plan. A training-data pipeline runs
 * this constantly: mining eval-set neighbors, pulling topical slices out of
 * a web corpus, seeding retrieval-augmented generation indexes, and auditing
 * "what does the corpus say about X" before a data cut ships.
 *
 * Every arithmetic step is engine-replayable bit-for-bit, the same
 * discipline as the rest of this library's hash-gated surface:
 *
 *  - `k1 = 6/5` and `b = 3/4` are RATIONAL plan constants, so both BM25
 *    factors reduce to a ratio of two exact integers. With `T` = total
 *    corpus tokens, `N` = corpus docs, `dl` = doc length, `tf` = term
 *    frequency and `df` = matched-doc count, multiplying the classic form
 *    through by `20·T` gives
 *      tf-part  = 44·T·tf / (20·T·tf + 6·T + 18·dl·N)
 *      idf-part = (2·(N − df) + 1) / (2·df + 1)
 *    (the +1-inside-the-log-free "raw" Robertson idf — monotone in df, and
 *    exactly representable; both engines compute the identical two integer
 *    ratios). Each factor is ONE IEEE double division of exact decimal(38)
 *    integers, the per-term score is one multiply, and the per-doc score
 *    folds the per-term doubles LEFT-TO-RIGHT in token order — the same
 *    fixed-order fold contract as ArrayDotProduct, which DuckDB's
 *    `list_sum(list(x ORDER BY token))` replays exactly.
 *
 * Scale shape: the query is a plan literal, so the token explode filters to
 * the query's terms IMMEDIATELY above the scan — only (matching doc, term)
 * rows ever reach an exchange, O(postings for the query), not O(corpus
 * tokens). Corpus statistics (N, T) are one partial/final aggregate to a
 * single broadcast row; per-term document frequencies are O(terms) rows
 * joined back by broadcast; the final top-k is a TakeOrderedAndProject
 * (per-partition heads of size k), so nothing corpus-sized is ever sorted.
 */
object Search {

  /**
   * Top-`k` documents for a whitespace query under exact-arithmetic BM25.
   * Output: `(doc_id, n_terms, score)` — matched distinct query terms and
   * the folded score — ordered by score descending, `idCol` ascending (a
   * total order, so the cut is deterministic under the hash gate). Documents
   * matching no query term never appear (their BM25 score is 0).
   */
  def bm25TopK(docs: DataFrame, query: String, k: Int = 10,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val terms = query.toLowerCase.trim.split("\\s+").filter(_.nonEmpty).distinct.toSeq
    require(terms.nonEmpty, s"query must contain at least one term, got '$query'")
    require(k >= 1, s"k must be >= 1, got $k")
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val toked = Parallelism.ensure(docs)
      .select(col(idCol), tokens(col(textCol)).as("tk"))
      .withColumn("dl", size(col("tk")).cast("long"))
    // N and T: one partial/final aggregate to a single row, broadcast onto
    // the O(postings) matched frame below
    val stats = toked.agg(
      count(lit(1)).as("n_docs"), sum(col("dl")).as("total_tokens"))
    // the postings the query actually touches: filter BEFORE any exchange
    val matched = toked
      .select(col(idCol), col("dl"), explode(col("tk")).as("token"))
      .filter(col("token").isin(terms: _*))
      .groupBy(col(idCol), col("token"))
      .agg(count(lit(1)).as("tf"), max(col("dl")).as("dl"))
    val dft = matched.groupBy("token").agg(count(lit(1)).as("dft"))
    val scored = matched
      .join(broadcast(dft), Seq("token"))
      .crossJoin(broadcast(stats))
      .withColumn("idf_d",
        (dec(lit(2)) * (col("n_docs") - col("dft")) + 1).cast("double") /
          (dec(lit(2)) * col("dft") + 1).cast("double"))
      .withColumn("tf_d",
        (dec(lit(44)) * col("total_tokens") * col("tf")).cast("double") /
          (dec(lit(20)) * col("total_tokens") * col("tf") +
            dec(lit(6)) * col("total_tokens") +
            dec(lit(18)) * col("dl") * col("n_docs")).cast("double"))
      .withColumn("s_t", col("idf_d") * col("tf_d"))
    scored
      .groupBy(col(idCol))
      .agg(collect_list(struct(col("token"), col("s_t"))).as("parts"))
      .withColumn("sorted",
        transform(array_sort(col("parts")), _.getField("s_t")))
      .select(
        col(idCol),
        size(col("sorted")).cast("long").as("n_terms"),
        aggregate(col("sorted"), lit(0.0), _ + _).as("score"))
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(k)
  }
}
