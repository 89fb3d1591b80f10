package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.cells.{CellRegionFormat, CellRegionPartition, GraftCellsPartitionReader, XxHash64Stream}
import graft.sources.cells.CellRegionFormat.Cell

/**
 * The v3 region-file integrity footer (VERDICT r17 next #3): region IO
 * bypasses Hadoop's client-side CRC on local paths, so a flipped bit inside
 * a fixed-width value field used to decode to a silently wrong long/double.
 * These tests pin (1) the streaming xxhash64 against Spark's one-shot
 * implementation — same algorithm, boundary-independent; (2) loud failure
 * on every single-bit flip across a whole file; (3) loud failure on
 * footer-less truncation, including the clean-cell-boundary cut the length
 * bounds alone could never see.
 */
class RegionIntegritySpec extends AnyFunSuite {

  // ---- the hash itself --------------------------------------------------

  test("streaming xxhash64 matches Spark's one-shot across lengths and split points") {
    val rnd = new scala.util.Random(42)
    val seeds = Seq(0L, CellRegionFormat.FooterSeed, -1L, 0x123456789abcdefL)
    // lengths straddle every code path: empty, sub-stripe tails (1..31),
    // exact stripes, stripe+tail, buffer-sized
    val lengths = Seq(0, 1, 3, 4, 7, 8, 15, 31, 32, 33, 63, 64, 100, 1024, 65537)
    for (seed <- seeds; len <- lengths) {
      val data = new Array[Byte](len)
      rnd.nextBytes(data)
      val expected = org.apache.spark.sql.catalyst.expressions.XXH64
        .hashUnsafeBytes(data, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, len, seed)
      // one-shot update
      val h1 = new XxHash64Stream(seed)
      h1.update(data, 0, len)
      assert(h1.digest() == expected, s"one-shot len=$len seed=$seed")
      // every-which-way splits (including empty updates)
      val h2 = new XxHash64Stream(seed)
      var p = 0
      while (p < len) {
        val chunk = math.min(1 + rnd.nextInt(40), len - p)
        h2.update(data, p, chunk)
        p += chunk
      }
      h2.update(data, 0, 0)
      assert(h2.digest() == expected, s"split len=$len seed=$seed")
      // digest() must be non-destructive (the cursor freezes the payload
      // digest, then keeps reading the footer through the same buffer path)
      assert(h2.digest() == expected)
    }
  }

  // ---- the footer in the file -------------------------------------------

  private def cell(i: Int): Cell = Cell(
    Array[Byte](0, 0, 0, i.toByte), Array[Byte](1), Array[Byte](2, 2),
    1000L + i, (1000L + i) / 100.0, if (i % 7 == 0) null else s"et${i % 3}")

  private def regionBytes(n: Int): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val w = new CellRegionFormat.RegionFileWriter(bos)
    (0 until n).foreach(i => w.write(cell(i)))
    w.finish()
    bos.toByteArray
  }

  private def toFile(bytes: Array[Byte]): java.io.File = {
    val f = java.io.File.createTempFile("region-integrity-", ".gcell")
    f.deleteOnExit()
    java.nio.file.Files.write(f.toPath, bytes)
    f
  }

  private def readAll(f: java.io.File): Long = {
    val cur = new CellRegionFormat.CellCursor(f.getAbsolutePath)
    try {
      var sum = 0L
      while (cur.advance()) sum += cur.valueLong
      sum
    } finally cur.close()
  }

  test("a clean file reads fully and ends exactly at the verified footer") {
    val f = toFile(regionBytes(200))
    assert(readAll(f) == (0 until 200).map(1000L + _).sum)
  }

  test("EVERY single-bit flip in the payload fails loudly as a hash mismatch") {
    val bytes = regionBytes(5)
    // flip each bit of every payload byte (skip the magic — that fails its
    // own check — and the footer, covered below); every flip must throw.
    // Length-prefix flips may fail structurally first; value-field flips
    // are the silent class the footer exists for — assert ALL throw.
    for (off <- CellRegionFormat.Magic.length until bytes.length - 12; bit <- 0 until 8) {
      val mutated = bytes.clone()
      mutated(off) = (mutated(off) ^ (1 << bit)).toByte
      val f = toFile(mutated)
      val e = intercept[java.io.IOException](readAll(f))
      assert(e.getMessage.contains(f.getName), s"off=$off bit=$bit: ${e.getMessage}")
    }
  }

  test("a flipped bit in a value field reports specifically a hash mismatch") {
    val bytes = regionBytes(3)
    // first cell: magic(6) + keyLen(4) + key(4) + qualLen(4) + qual(1) +
    // valLen(4) + val(2) => value_long's int64 starts at offset 25
    val mutated = bytes.clone()
    mutated(29) = (mutated(29) ^ 0x10).toByte // low half of value_long
    val e = intercept[java.io.IOException](readAll(toFile(mutated)))
    assert(e.getMessage.contains("integrity hash mismatch"), e.getMessage)
  }

  test("a flipped bit in the stored footer hash itself fails loudly") {
    val bytes = regionBytes(3)
    val mutated = bytes.clone()
    mutated(bytes.length - 1) = (mutated(bytes.length - 1) ^ 1).toByte
    val e = intercept[java.io.IOException](readAll(toFile(mutated)))
    assert(e.getMessage.contains("integrity hash mismatch"), e.getMessage)
  }

  test("footer-less truncation fails loudly — including at a clean cell boundary") {
    val bytes = regionBytes(3)
    // cut exactly before the 12-byte footer: pre-v3 this read as a clean EOF
    val atBoundary = java.util.Arrays.copyOf(bytes, bytes.length - 12)
    val e1 = intercept[java.io.EOFException](readAll(toFile(atBoundary)))
    assert(e1.getMessage.contains("without the integrity footer"), e1.getMessage)
    // cut inside the footer: sentinel visible, hash missing
    val midFooter = java.util.Arrays.copyOf(bytes, bytes.length - 8)
    val e2 = intercept[java.io.EOFException](readAll(toFile(midFooter)))
    assert(e2.getMessage.contains("hash missing"), e2.getMessage)
    // cut mid-cell: the existing truncation class still reports
    val midCell = java.util.Arrays.copyOf(bytes, 20)
    intercept[java.io.EOFException](readAll(toFile(midCell)))
  }

  test("trailing garbage after the footer fails loudly") {
    val bytes = regionBytes(3)
    val padded = java.util.Arrays.copyOf(bytes, bytes.length + 3)
    val e = intercept[java.io.IOException](readAll(toFile(padded)))
    assert(e.getMessage.contains("trailing byte"), e.getMessage)
  }

  test("an aborted writer (close without finish) leaves a file every reader rejects") {
    val bos = new java.io.ByteArrayOutputStream()
    val w = new CellRegionFormat.RegionFileWriter(bos)
    w.write(cell(0))
    w.close() // abort path — no footer
    intercept[java.io.EOFException](readAll(toFile(bos.toByteArray)))
  }

  test("footer verification survives cells larger than the cursor's refill buffer") {
    // a >1 MiB value forces mid-cell buffer growth + multiple compactions —
    // the hash must still cover every byte exactly once
    val big = new Array[Byte](3 << 20)
    new scala.util.Random(7).nextBytes(big)
    val bos = new java.io.ByteArrayOutputStream()
    val w = new CellRegionFormat.RegionFileWriter(bos)
    w.write(Cell(Array[Byte](1), Array[Byte](2), big, 5L, 0.5, "big"))
    w.write(cell(1))
    w.finish()
    assert(readAll(toFile(bos.toByteArray)) == 5L + 1001L)
  }

  test("a key-bounded scan over a small region drains and verifies the footer (r19)") {
    // Flip a bit inside the LAST cell's valueLong — it parses fine as a
    // silently wrong value, so only the footer hash can catch it — and
    // bound the scan at cell 3: before r19 the bounded readers exited at
    // the stop key and never reached the footer (the ADVICE r18 gap).
    val b = regionBytes(8)
    b(b.length - 30) = (b(b.length - 30) ^ 1).toByte
    val f = toFile(b)
    // cursor-level drain: the primitive the readers gate on fileLength
    val cur = new CellRegionFormat.CellCursor(f.getAbsolutePath)
    assert(cur.advance())
    val e = intercept[java.io.IOException](cur.drainAndVerify())
    assert(e.getMessage.contains("integrity hash mismatch"), e.getMessage)
    cur.close()
    // reader-level: the V2 plain reader with a stop bound now fails loudly
    def reader(file: String) = new GraftCellsPartitionReader(
      CellRegionPartition(file, None, Some(Array[Byte](0, 0, 0, 3))),
      CellRegionFormat.Schema,
      new graft.sources.SerializableHadoopConf(
        new org.apache.hadoop.conf.Configuration()))
    val bad = reader(f.getAbsolutePath)
    val e2 = intercept[java.io.IOException] { while (bad.next()) () }
    assert(e2.getMessage.contains("integrity hash mismatch"), e2.getMessage)
    bad.close()
    // a CLEAN bounded read returns exactly the bounded rows (the drain is
    // parse-only: no extra rows, no behavior change)
    val ok = reader(toFile(regionBytes(8)).getAbsolutePath)
    var n = 0
    while (ok.next()) n += 1
    assert(n == 3)
    ok.close()
  }
}
