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
    // Cheap decision first: for file-backed frames (the production path)
    // inputFiles is a pure listing — no physical planning. The df.rdd
    // fallback (non-file sources: test frames, in-memory relations) plans the
    // frame's own QueryExecution, which the previous code paid on EVERY
    // operator construction even for parquet sources; that throwaway planning
    // pass was measurable inside the bench's timed region.
    val files = df.inputFiles.length
    // file count is a conservative stand-in for the scan's partition count:
    // exact for the motivating case (one compact parquet file → one
    // partition), and at real scale many/large files ⇒ enough partitions
    // that the guard is a no-op anyway
    val planned =
      if (files > 0) files
      else df.rdd.getNumPartitions
    if (planned < target) df.repartition(target) else df
  }
}
