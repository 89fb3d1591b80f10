package graft.operators

import org.apache.spark.sql.DataFrame

/** Source-parallelism guard shared by the corpus operators. */
object Parallelism {

  /**
   * Rebalance a source that delivers fewer partitions than the session's
   * parallelism. A compact corpus (one small parquet file → one input
   * partition, since parquet cannot split below a row group) would otherwise
   * run every map-side pass — MinHash signatures, shingle hashing, SimHash
   * votes — on a single core, no matter how many sit idle. On a
   * cluster-scale input (partitions ≥ cores) this is a no-op: the check reads
   * only the planned partition count, so the 100 TB path never pays the
   * rebalance shuffle it doesn't need.
   */
  def ensure(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
