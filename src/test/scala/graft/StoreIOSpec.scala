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

  test("writePointer/readPointer: rename mode on local paths — plain file, atomic flip") {
    spark
    val local = java.nio.file.Files.createTempDirectory("graft-storeio-ptr").toString
    // a distinct store per path FORM (the two forms alias one directory)
    for (dir <- Seq(s"$local/bare", s"file://$local/uri")) {
      assert(!StoreIO.pointerExists(dir, "CURRENT"))
      StoreIO.writePointer(dir, "CURRENT", "v0")
      // local scheme is rename-atomic → the plain file layout, so existing
      // stores written by r16 keep resolving byte-identically
      assert(StoreIO.exists(s"$dir/CURRENT"), "local pointers stay plain files")
      assert(StoreIO.pointerExists(dir, "CURRENT"))
      assert(StoreIO.readPointer(dir, "CURRENT") == "v0")
      StoreIO.writePointer(dir, "CURRENT", "v1")
      assert(StoreIO.readPointer(dir, "CURRENT") == "v1")
    }
  }

  test("writePointer log mode: put-once entries, highest-complete wins, GC, crash & race safety") {
    spark
    // force the manifest-log protocol on the local FS — the same code path
    // an s3a:// root would take (graft.store.commit=auto dispatches on the
    // filesystem scheme; the conf key is the test's scheme stand-in)
    spark.conf.set("spark.hadoop.graft.store.commit", "log")
    try {
      val local = java.nio.file.Files.createTempDirectory("graft-storeio-log").toString
      val dir = s"file://$local"
      assert(!StoreIO.pointerExists(dir, "CURRENT"))
      StoreIO.writePointer(dir, "CURRENT", "v0")
      assert(StoreIO.pointerExists(dir, "CURRENT"))
      assert(StoreIO.readPointer(dir, "CURRENT") == "v0")
      // the pointer is a LOG, not a plain file: nothing to rename over
      assert(!StoreIO.exists(s"$dir/CURRENT"))
      assert(StoreIO.list(dir, "CURRENT.mlog").nonEmpty)
      StoreIO.writePointer(dir, "CURRENT", "v1")
      assert(StoreIO.readPointer(dir, "CURRENT") == "v1")
      // CRASHED WRITER: a torn entry upload is a `.tmp.` file the entry
      // pattern can't match — the old pointer keeps serving
      StoreIO.createMarker(s"$dir/CURRENT.mlog/.tmp.99999-7")
      assert(StoreIO.readPointer(dir, "CURRENT") == "v1")
      // CONCURRENT WRITERS racing the same sequence number: two complete
      // entries, every reader resolves the same deterministic winner
      // (highest name within the sequence), and the pointer never vanishes
      java.nio.file.Files.write(
        java.nio.file.Paths.get(local, "CURRENT.mlog", s"c${"0" * 18}02.00001-1"),
        "v2a".getBytes("UTF-8"))
      java.nio.file.Files.write(
        java.nio.file.Paths.get(local, "CURRENT.mlog", s"c${"0" * 18}02.00002-1"),
        "v2b".getBytes("UTF-8"))
      assert(StoreIO.readPointer(dir, "CURRENT") == "v2b",
        "same-sequence race must resolve to the highest entry name for every reader")
      // GC: a long history keeps a bounded retention window of entries
      (3 to 30).foreach(i => StoreIO.writePointer(dir, "CURRENT", s"v$i"))
      assert(StoreIO.readPointer(dir, "CURRENT") == "v30")
      val entries = StoreIO.list(s"$dir/CURRENT.mlog", "c")
      assert(entries.size <= 10, s"log must stay bounded, got ${entries.size}: $entries")
      // LAYOUT STICKINESS: a rename-mode writer appends to an existing log
      // instead of forking a second history into the plain file
      spark.conf.set("spark.hadoop.graft.store.commit", "rename")
      StoreIO.writePointer(dir, "CURRENT", "v31")
      assert(!StoreIO.exists(s"$dir/CURRENT"))
      assert(StoreIO.readPointer(dir, "CURRENT") == "v31")
    } finally spark.conf.unset("spark.hadoop.graft.store.commit")
  }

  test("SerializableHadoopConf: java round-trip preserves session FS settings") {
    // the carrier ships the driver session's Hadoop conf to executor-side
    // region cursors/writers (r17 cell-store FS port) — a silent drop of
    // settings here would make executors resolve a DIFFERENT filesystem
    // than the planner listed regions on
    spark.conf.set("spark.hadoop.graft.test.marker", "carried-42")
    try {
      val c = graft.sources.SerializableHadoopConf.fromSession()
      val bytes = new java.io.ByteArrayOutputStream()
      val oos = new java.io.ObjectOutputStream(bytes)
      oos.writeObject(c); oos.close()
      val back = new java.io.ObjectInputStream(
        new java.io.ByteArrayInputStream(bytes.toByteArray))
        .readObject().asInstanceOf[graft.sources.SerializableHadoopConf]
      assert(back.value.get("spark.hadoop.graft.test.marker") == "carried-42",
        "session conf entries must survive the executor round-trip")
      assert(back.value.get("fs.defaultFS", "") == c.value.get("fs.defaultFS", ""))
    } finally spark.conf.unset("spark.hadoop.graft.test.marker")
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
