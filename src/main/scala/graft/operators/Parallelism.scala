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
    // Two-tier decision. Tier 1 is a pure file listing (no physical
    // planning): ≥ target files always yields ≥ target parallel units, so
    // the guard is a FREE no-op on the many-files production path. Tier 2 —
    // few/no files — asks the planner for the real partition count; that
    // pays a throwaway planning pass, but only in exactly the cases where
    // it's cheap (a compact corpus) or unavoidable (non-file test frames).
    // Crucially the planner answer stays authoritative there: one LARGE file
    // splits into many partitions (maxPartitionBytes), and blindly
    // repartitioning it to `target` would both shuffle the corpus and REDUCE
    // its parallelism.
    if (df.inputFiles.length >= target) df
    else if (df.rdd.getNumPartitions < target) df.repartition(target)
    else df
  }
}
