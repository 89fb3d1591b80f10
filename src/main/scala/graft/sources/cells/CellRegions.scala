package graft.sources.cells

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Fixtures

/**
 * Build-if-absent region-file directory for [[GraftCellsProvider]], derived
 * from the binary-cell fixture ([[graft.sources.Fixtures.keyedEvents]]): the
 * same cells, re-materialized in the row-major region format so the V2 source
 * exercises a genuinely foreign storage layout (not Parquet wearing a hat).
 *
 * Region layout mirrors an HBase table split: cells range-partitioned by key
 * into `numRegions` files, sorted within each, file names carrying the
 * first/last key for planning-time pruning. Written once per sf dir under
 * /tmp (same promote-under-file-lock protocol as Fixtures, so concurrent
 * bench/test JVMs serialize); on a real cluster these files would live on
 * shared storage and the writer would be the ingest job.
 */
object CellRegions {

  private val Version = "v2" // v2: +value_long (typed cents for pushed aggregation)
  private val NumRegions = 8
  private val lock = new Object

  /** Cache path keyed by source fingerprint (length+mtime of events.parquet),
    * so regenerated testdata can never serve a stale region dir. */
  private def cachePath(dir: String): String = {
    val f = new java.io.File(s"$dir/events.parquet")
    val fp = {
      val md = java.security.MessageDigest.getInstance("MD5")
      md.update(s"${f.length}:${f.lastModified}".getBytes("UTF-8"))
      md.digest().map("%02x".format(_)).mkString.take(16)
    }
    s"/tmp/graft-fixtures/cells-$Version/${dir.replaceAll("[^A-Za-z0-9.]", "_")}-$fp"
  }

  /** The cells read through the V2 connector API (`format("graft-cells")`). */
  def read(s: SparkSession, dir: String): DataFrame =
    s.read.format("graft-cells").load(path(s, dir))

  def path(s: SparkSession, dir: String): String = {
    val out = cachePath(dir)
    lock.synchronized {
      if (!new java.io.File(s"$out/_SUCCESS").exists()) build(s, dir, out)
    }
    out
  }

  /**
   * Write a cell frame — columns `(key, qual, value: binary, value_long,
   * value_double, event_type)` — as a complete region directory: cells
   * range-partitioned by key into `numRegions` files, sorted within each,
   * file names carrying the first/last key, `_SUCCESS` last. Public so
   * stress harnesses can materialize synthetic region dirs through the same
   * writer the fixture path uses.
   */
  def writeRegionDir(cells: DataFrame, out: String, numRegions: Int = NumRegions): Unit = {
    new java.io.File(out).mkdirs()
    val sorted = cells
      .repartitionByRange(numRegions, col("key"))
      .sortWithinPartitions("key", "qual")
    // each task writes its region file: cells stream through DataOutputStream,
    // first/last key tracked for the range-carrying file name
    sorted.foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
      if (it.hasNext) {
        val pid = org.apache.spark.TaskContext.getPartitionId()
        val tmpFile = new java.io.File(out, f"part-$pid%05d.inprogress")
        val dos = new java.io.DataOutputStream(new java.io.BufferedOutputStream(
          new java.io.FileOutputStream(tmpFile), 1 << 20))
        var first: Array[Byte] = null
        var last: Array[Byte] = null
        try {
          CellRegionFormat.writeHeader(dos)
          it.foreach { r =>
            val key = r.getAs[Array[Byte]](0)
            if (first == null) first = key
            last = key
            CellRegionFormat.writeCell(dos, CellRegionFormat.Cell(
              key, r.getAs[Array[Byte]](1), r.getAs[Array[Byte]](2),
              r.getLong(3), r.getDouble(4), r.getString(5)))
          }
        } finally dos.close()
        val target = new java.io.File(out, CellRegionFormat.regionFileName(pid, first, last))
        if (!tmpFile.renameTo(target)) throw new java.io.IOException(s"rename failed: $target")
      }
    }
    new java.io.FileOutputStream(new java.io.File(out, "_SUCCESS")).close()
  }

  private def build(s: SparkSession, dir: String, out: String): Unit = {
    val tmp = s"$out.tmp.${java.lang.ProcessHandle.current.pid}"
    writeRegionDir(
      Fixtures.keyedEvents(s, dir)
        .select(col("key"), col("qual"), col("value"),
          // the interpreter-decoded cents, stored typed alongside the raw bytes
          // (HBase connectors expose typed column mappings the same way)
          graft.functions.expressions.BytesBEToLong(col("value"), 8).as("value_long"),
          col("value_double"), col("event_type")),
      tmp)

    // promote under an OS file lock (same protocol as Fixtures.build: a dir
    // containing _SUCCESS is complete and immutable; losers discard their copy)
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm))
      f.delete(): Unit
    }
    val tmpDir = new java.io.File(tmp)
    val outDir = new java.io.File(out)
    outDir.getParentFile.mkdirs()
    val ch = java.nio.channels.FileChannel.open(
      java.nio.file.Paths.get(s"$out.lock"),
      java.nio.file.StandardOpenOption.CREATE, java.nio.file.StandardOpenOption.WRITE)
    try {
      val fl = ch.lock()
      try {
        if (new java.io.File(s"$out/_SUCCESS").exists()) rm(tmpDir)
        else {
          if (outDir.exists()) rm(outDir)
          if (!tmpDir.renameTo(outDir)) throw new java.io.IOException(s"promote failed: $out")
        }
      } finally fl.release()
    } finally ch.close()
  }
}
