package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.Search
import graft.sources.StoreIO

/**
 * The manifest-log commit protocol under INJECTED object-store failure
 * semantics (VERDICT r17 next #1) — every test runs through [[FaultyFs]]
 * (`faulty://`): rename is visible copy-then-delete with kill points,
 * create can die mid-write leaving torn visible bytes, listings can lag
 * and serve phantoms. The protocol's scaladoc argument
 * (StoreIO.scala) becomes a regression test here: a writer killed at
 * every commit step never torns or loses the pointer, and a reader
 * racing every listing always resolves a committed value.
 */
class FaultInjectionSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def freshStore(tag: String): String = {
    spark // init session
    FaultyFs.register(spark)
    FaultyFs.reset()
    s"faulty://${java.nio.file.Files.createTempDirectory(s"graft-faulty-$tag")}"
  }

  test("auto mode selects the manifest log on the faulty scheme — no forcing needed") {
    val dir = freshStore("auto")
    StoreIO.writePointer(dir, "CURRENT", "v0")
    assert(!StoreIO.exists(s"$dir/CURRENT"),
      "an object-store scheme must never commit through a plain-file rename flip")
    assert(StoreIO.list(dir, "CURRENT.mlog").nonEmpty)
    assert(StoreIO.readPointer(dir, "CURRENT") == "v0")
  }

  test("a writer killed at EVERY commit step never torns or loses the pointer") {
    val dir = freshStore("kill")
    StoreIO.writePointer(dir, "CURRENT", "committed")

    // Steps where the new commit must NOT be visible after the crash:
    // nothing durable happened, or only invisible debris did.
    for (point <- Seq("create:before", "create:torn", "rename:before")) {
      FaultyFs.arm(point)
      val e = intercept[FaultyFs.Killed](StoreIO.writePointer(dir, "CURRENT", s"lost-$point"))
      assert(e.getMessage.contains(point))
      assert(StoreIO.readPointer(dir, "CURRENT") == "committed",
        s"after a crash at $point the old pointer must keep serving")
    }
    // torn debris is present but invisible by construction
    assert(StoreIO.list(s"$dir/CURRENT.mlog", ".tmp.").nonEmpty,
      "the torn-upload crash should have stranded a .tmp file (the test's premise)")

    // Steps where the entry IS durably committed before the writer dies:
    // every reader must see the NEW value even though the writer saw a crash.
    FaultyFs.arm("rename:after-put")
    intercept[FaultyFs.Killed](StoreIO.writePointer(dir, "CURRENT", "landed-a"))
    assert(StoreIO.readPointer(dir, "CURRENT") == "landed-a",
      "after-put: the entry is complete — the commit happened, the writer just never learned")
    FaultyFs.arm("rename:after-delete")
    intercept[FaultyFs.Killed](StoreIO.writePointer(dir, "CURRENT", "landed-b"))
    assert(StoreIO.readPointer(dir, "CURRENT") == "landed-b")

    // the store remains fully writable after every crash class
    StoreIO.writePointer(dir, "CURRENT", "after")
    assert(StoreIO.readPointer(dir, "CURRENT") == "after")
  }

  test("a reader behind a LAGGING listing resolves the previous committed value, then catches up") {
    val dir = freshStore("lag")
    StoreIO.writePointer(dir, "CURRENT", "v0")
    StoreIO.writePointer(dir, "CURRENT", "v1")
    val newest = StoreIO.list(s"$dir/CURRENT.mlog", "c").max
    val local = dir.stripPrefix("faulty://")
    FaultyFs.hidden = Set(s"$local/CURRENT.mlog/$newest")
    assert(StoreIO.readPointer(dir, "CURRENT") == "v0",
      "a lagging listing must resolve the PREVIOUS committed value — never throw, never tear")
    FaultyFs.hidden = Set.empty
    assert(StoreIO.readPointer(dir, "CURRENT") == "v1")
  }

  test("a listing that hides every entry of a live log reports 'not committed yet'") {
    val dir = freshStore("dark")
    StoreIO.writePointer(dir, "CURRENT", "v0")
    val local = dir.stripPrefix("faulty://")
    FaultyFs.hidden = StoreIO.list(s"$dir/CURRENT.mlog", "c")
      .map(n => s"$local/CURRENT.mlog/$n").toSet
    val e = intercept[java.io.IOException](StoreIO.readPointer(dir, "CURRENT"))
    assert(e.getMessage.contains("not committed yet"), e.getMessage)
    FaultyFs.hidden = Set.empty
    assert(StoreIO.readPointer(dir, "CURRENT") == "v0")
  }

  test("a reader racing log GC (phantom listings of deleted entries) retries to a live winner") {
    val dir = freshStore("gc")
    (0 to 4).foreach(i => StoreIO.writePointer(dir, "CURRENT", s"v$i"))
    val local = dir.stripPrefix("faulty://")
    // fabricate the race: the next listings still show an already-deleted
    // entry whose (seq, name) OUTRANKS every live one — the reader must
    // fail its read, re-list, and converge on the live winner
    val ghost = s"$local/CURRENT.mlog/c0${"8" * 19}.zzz-ghost"
    FaultyFs.armPhantoms(Set(ghost), listings = 3)
    assert(StoreIO.readPointer(dir, "CURRENT") == "v4")
  }

  test("phantom listings that NEVER clear surface the broken-filesystem error, not a hang") {
    val dir = freshStore("gcstorm")
    StoreIO.writePointer(dir, "CURRENT", "v0")
    val local = dir.stripPrefix("faulty://")
    val ghost = s"$local/CURRENT.mlog/c0${"8" * 19}.zzz-ghost"
    FaultyFs.armPhantoms(Set(ghost), listings = 1000)
    try {
      val e = intercept[java.io.IOException](StoreIO.readPointer(dir, "CURRENT"))
      assert(e.getMessage.contains("kept vanishing"), e.getMessage)
    } finally FaultyFs.reset()
  }

  test("concurrent writers + a racing reader over non-atomic renames: no torn or vanished reads") {
    val dir = freshStore("race")
    StoreIO.writePointer(dir, "CURRENT", "w-init-0")
    val valid = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    valid.add("w-init-0")
    FaultyFs.renameDelayMs = 2 // widen the put→delete window
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val writers = (1 to 4).map { w =>
      new Thread(() => {
        try (0 until 8).foreach { i =>
          val v = s"w$w-$i"
          valid.add(v) // registered BEFORE the commit: a read may see it mid-flight
          StoreIO.writePointer(dir, "CURRENT", v)
        } catch { case t: Throwable => errs.add(t) }
      })
    }
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val reader = new Thread(() => {
      try while (!stop.get()) {
        val got = StoreIO.readPointer(dir, "CURRENT")
        if (!valid.contains(got)) errs.add(new AssertionError(s"torn/unknown read: '$got'"))
      } catch { case t: Throwable => errs.add(t) }
    })
    reader.start(); writers.foreach(_.start()); writers.foreach(_.join())
    stop.set(true); reader.join()
    FaultyFs.renameDelayMs = 0
    assert(errs.isEmpty, s"race produced failures: ${errs.toArray.mkString("; ")}")
    assert(valid.contains(StoreIO.readPointer(dir, "CURRENT")))
  }

  test("search-store lifecycle end-to-end on the faulty filesystem: serve == scan, soak appends") {
    val dir = freshStore("lifecycle")
    val base = Seq((1L, "a b a"), (2L, "a c"), (3L, "c c c c")).toDF("doc_id", "text")
    Search.writeSearchIndex(Search.buildSearchIndex(base), dir, tag = Some("r0"))
    assert(Search.searchIndexExists(dir))
    assert(StoreIO.list(dir, "CURRENT.mlog").nonEmpty, "faulty:// must auto-select the log")
    // soak: repeated append rounds (the crawl loop's store step) — every
    // parquet write, manifest, and pointer flip rides copy+delete renames
    var corpus = base
    for (r <- 1 to 3) {
      val delta = Seq((10L * r, s"a round$r d"), (10L * r + 1, s"c round$r")).toDF("doc_id", "text")
      corpus = corpus.unionByName(delta)
      Search.appendSearchIndex(dir, delta, tag = Some(s"r$r")): Unit
      assert(Search.currentSearchTag(dir).contains(s"r$r"))
    }
    val idx = Search.readSearchIndex(spark, dir)
    for (q <- Seq("a c", "d", "round2 c"))
      assert(Search.bm25TopKIndexed(idx, q, k = 10).collect().toSeq ==
        Search.bm25TopK(corpus, q, k = 10).collect().toSeq,
        s"faulty-store serve != scan for '$q'")
    // compact + prune still converge over non-atomic renames
    Search.compactSearchIndex(spark, dir): Unit
    assert(Search.currentSearchTag(dir).contains("r3"))
    val (pv, ps) = Search.pruneSearchIndex(spark, dir, keepVersions = 1)
    assert(pv >= 1 && ps >= 1, s"prune collected ($pv, $ps)")
    assert(Search.bm25TopKIndexed(
      Search.readSearchIndex(spark, dir), "a c", k = 10).collect().toSeq ==
      Search.bm25TopK(corpus, "a c", k = 10).collect().toSeq)
  }
}
