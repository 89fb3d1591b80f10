package graft.sources.cells

import java.io.{DataInputStream, DataOutputStream, EOFException}

import org.apache.spark.sql.types._

/**
 * On-disk layout of a "region file" — the stand-in for an HBase region/HFile
 * in this sandbox, and the storage [[GraftCellsProvider]] serves.
 *
 * A region file is a key-sorted, row-major run of cells (HBase KeyValue
 * analogue: `README.md:42-54`'s one-row-per-period layout), length-prefixed:
 *
 * {{{
 *   magic "GCEL2\n"
 *   cell*: keyLen:int32 key qualLen:int32 qual valLen:int32 value
 *          valueLong:int64 valueDouble:float64
 *          etLen:int32 eventTypeUtf8   (etLen −1 = null)
 * }}}
 *
 * `value_long` is the interpreter-decoded integer (cents) of the binary
 * `value` — stored typed so pushed-down aggregation ([[GraftCellsScanBuilder]]
 * `SupportsPushDownAggregates`) can SUM it exactly (integer arithmetic is
 * order-independent; a pushed double sum would make results depend on region
 * merge order).
 *
 * The file NAME carries the region's key range —
 * `region-<nnnnn>-<firstKeyHex>-<lastKeyHex>.gcell` (lastKey inclusive) — so
 * planning can prune whole regions against a pushed `[start, stop)` bound
 * without opening a single file, exactly like the HBase client skipping
 * regions outside `Scan.setStartRow/setStopRow`.
 */
object CellRegionFormat {

  val Magic = "GCEL2\n"

  val Schema: StructType = StructType(Seq(
    StructField("key", BinaryType, nullable = false),
    StructField("qual", BinaryType, nullable = false),
    StructField("value", BinaryType, nullable = false),
    StructField("value_long", LongType, nullable = false),
    StructField("value_double", DoubleType, nullable = false),
    StructField("event_type", StringType, nullable = true)))

  final case class Cell(
      key: Array[Byte], qual: Array[Byte], value: Array[Byte],
      valueLong: Long, valueDouble: Double, eventType: String)

  final case class Region(file: String, firstKey: Array[Byte], lastKey: Array[Byte])

  private val NamePattern = """region-\d+-([0-9a-f]*)-([0-9a-f]*)\.gcell""".r

  def listRegions(dir: String): Seq[Region] = {
    require(new java.io.File(dir, "_SUCCESS").exists(), s"not a complete region dir: $dir")
    listRegionsUnchecked(dir)
  }

  /** Region listing WITHOUT the `_SUCCESS` completeness gate — for the
    * streaming reader, which tails a LIVE directory. Safe because region
    * files are only ever created by atomic rename from an `.inprogress`
    * name the pattern doesn't match: a listed file is a complete file. */
  def listRegionsUnchecked(dir: String): Seq[Region] =
    Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty).toSeq
      .sortBy(_.getName)
      .flatMap { f =>
        f.getName match {
          case NamePattern(firstHex, lastHex) =>
            Some(Region(f.getAbsolutePath, unhex(firstHex), unhex(lastHex)))
          case _ => None
        }
      }

  def regionFileName(partitionId: Int, firstKey: Array[Byte], lastKey: Array[Byte]): String =
    f"region-$partitionId%05d-${hex(firstKey)}-${hex(lastKey)}.gcell"

  def hex(b: Array[Byte]): String = b.map("%02x".format(_)).mkString
  private def unhex(s: String): Array[Byte] =
    s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  def writeHeader(out: DataOutputStream): Unit =
    out.write(Magic.getBytes("US-ASCII"))

  def readHeader(in: DataInputStream, file: String): Unit = {
    val m = new Array[Byte](Magic.length)
    in.readFully(m)
    require(new String(m, "US-ASCII") == Magic, s"bad region-file magic in $file")
  }

  def writeCell(out: DataOutputStream, c: Cell): Unit = {
    out.writeInt(c.key.length); out.write(c.key)
    out.writeInt(c.qual.length); out.write(c.qual)
    out.writeInt(c.value.length); out.write(c.value)
    out.writeLong(c.valueLong)
    out.writeDouble(c.valueDouble)
    if (c.eventType == null) out.writeInt(-1)
    else {
      val b = c.eventType.getBytes("UTF-8")
      out.writeInt(b.length); out.write(b)
    }
  }

  /** Next cell, or null at end-of-file (the only clean termination). */
  def readCell(in: DataInputStream): Cell = {
    val keyLen = try in.readInt() catch { case _: EOFException => return null }
    def bytes(n: Int): Array[Byte] = { val b = new Array[Byte](n); in.readFully(b); b }
    val key = bytes(keyLen)
    val qual = bytes(in.readInt())
    val value = bytes(in.readInt())
    val vl = in.readLong()
    val vd = in.readDouble()
    val etLen = in.readInt()
    val et = if (etLen < 0) null else new String(bytes(etLen), "UTF-8")
    Cell(key, qual, value, vl, vd, et)
  }
}
