package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, QualityModel, Search, Similarity, Tokenizer}
import graft.sources.StoreIO
import graft.streaming.StreamingOps

/**
 * The lifecycle × kill-point FAULT MATRIX over every StoreIO-backed
 * versioned store (VERDICT r18 next #2): FaultInjectionSpec demonstrated
 * the commit protocol and ONE lifecycle (the search store) under injected
 * object-store semantics; the other loops that ride the same
 * LATEST-pointer protocol never ran theirs. Four lifecycles here, all on
 * `faulty://` (copy-then-delete renames, torn creates, lagging listings):
 *
 *  - the CRAWL loop's store — the incremental-dedup index snapshots,
 *    carrying the quality-LR model (`v<N>/lr_model`), the BPE tokenizer
 *    model+baseline (`v<N>/bpe_model`), and the search tier — four of the
 *    named stores inside the one loop that owns their versioning;
 *  - the SEMANTIC index loop, the ANN index loop, the PACK-STATE loop.
 *
 * Matrix per lifecycle, driven through the loops' REAL batch functions
 * (the `(DataFrame, Long) => Unit` foreachBatch bodies, no stream needed):
 * a writer killed at EVERY pointer-commit step — `create:before` /
 * `create:torn` / `rename:before` (nothing durable: the OLD snapshot must
 * keep serving and the documented replay must complete) and
 * `rename:after-put` / `rename:after-delete` (the entry IS durable: every
 * reader sees the NEW version even though the writer died) — then (r20,
 * VERDICT r19 next #7) a writer killed MID-PARQUET on a DATA file under
 * the next version directory (the orphaned partial batch must be
 * invisible and reclaimed by the replay) — then a reader behind a
 * LAGGING listing resolving the previous committed version before
 * catching up.
 *
 * Kill points are PATH-SCOPED to the LATEST pointer log: the lifecycles
 * do plenty of unrelated parquet IO on the same scheme, and an unscoped
 * kill there fires inside a Spark task — a task failure Spark retries and
 * survives, not the writer crash under test. The data-plane crash classes
 * (a writer dying between its parquet writes and the flip) are exactly
 * the "lost" pointer cases: every loop writes data first and flips last,
 * so killing the flip IS the worst data-plane crash a reader can observe.
 */
class StoreFaultMatrixSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  private val dim = 16

  /** Deterministic clustered embeddings (the StreamingSemLoopSpec /
    * StreamingAnnLoopSpec generator, f = 0: stationary — no rebuild
    * trips, every round is a pure append+serve commit). */
  private def emb(n: Int, idOffset: Long): DataFrame = {
    def h(seed: org.apache.spark.sql.Column*): org.apache.spark.sql.Column =
      (pmod(xxhash64(seed: _*), lit(2001L)) - lit(1000L)) / lit(1000.0)
    spark.range(n).withColumn("id", col("id") + lit(idOffset))
      .withColumn("k", pmod(col("id"), lit(8L)))
      .withColumn("embedding",
        transform(sequence(lit(0), lit(dim - 1)), j =>
          (h(lit("fm-u"), col("k"), j) + lit(0.5) * h(lit("fm-n"), col("id"), j))
            .cast("double")))
      .select(col("id").as("vec_id"), col("embedding"))
  }

  /** 18 distinct tokens per doc — passes the crawl loop's repetition and
    * top-token gates (the StreamingCrawlSpec fixture shape). */
  private def txt(tag: String): String = (0 until 18).map(i => s"$tag$i").mkString(" ")
  private def docs(rows: (Long, String)*): DataFrame = rows.toDF("doc_id", "text")

  /** One versioned-store lifecycle: seed the store at `root`, run the
    * loop's real batch function for `batchId`, and produce a canonical
    * SERVE signature (pointer-resolved snapshot content) a fault must
    * never tear. */
  private case class Lifecycle(
      name: String,
      seed: String => Unit,
      round: (String, String, Long) => Unit,
      serve: String => String)

  private def pointerOf(root: String): String =
    StoreIO.readPointer(root, "LATEST").trim

  private def crawlLifecycle: Lifecycle = {
    val base = docs((1L, txt("basea")), (2L, txt("baseb")), (3L, txt("basec")))
    val lr = QualityModel.trainLrModel(
      docs((1L to 12L).map(i => (i, txt(s"lr$i"))): _*), iters = 2)
    val bpe = Tokenizer.trainBpe(base, numMerges = 8)
    val bpeBase = Tokenizer.bpeBaseline(base, bpe, k = 20)
    Lifecycle(
      name = "crawl",
      seed = root => StreamingOps.seedCrawlIndex(Dedup.buildIndex(base), root),
      round = (root, out, bid) => StreamingOps.crawlIncrementBatchFn(
        root, base, out,
        lrGate = Some(lr),
        bpeMonitor = Some((bpe, bpeBase)),
        searchTier = true)(
        docs((100L * bid, txt(s"r${bid}a")), (100L * bid + 1, txt(s"r${bid}b"))), bid),
      serve = root => {
        val ptr = pointerOf(root)
        val idx = Dedup.readIndex(spark, s"$root/$ptr")
        // a probe mixing a base duplicate and fresh content, resolved
        // against the POINTED-AT snapshot
        val probe = Dedup.incrementalExact(
          docs((900L, txt("basea")), (901L, txt("fresh"))), idx)
          .orderBy("doc_id").collect()
          .map(r => s"${r.getLong(0)}=${r.getBoolean(2)}").mkString(",")
        val lrFp =
          if (StoreIO.isDirectory(s"$root/$ptr/lr_model"))
            QualityModel.readLrModel(spark, s"$root/$ptr/lr_model").fingerprint
          else "seed"
        val bpeFp =
          if (StoreIO.isDirectory(s"$root/$ptr/bpe_model"))
            Tokenizer.readBpeModel(spark, s"$root/$ptr/bpe_model").fingerprint
          else "seed"
        s"$ptr|${idx.exact.count()}|$probe|$lrFp|$bpeFp"
      })
  }

  private def semLifecycle: Lifecycle = {
    val base = emb(200, 0)
    Lifecycle(
      name = "semantic-index",
      seed = root => StreamingOps.seedSemIndex(
        Dedup.buildSemIndex(base, dim, nlist = 4), root),
      round = (root, out, bid) => StreamingOps.semanticIncrementBatchFn(
        root, out)(emb(25, 1000L * bid), bid),
      serve = root => {
        val ptr = pointerOf(root)
        val ix = Dedup.readSemIndex(spark, s"$root/$ptr")
        val n = ix.cells.select(col("id")).distinct().count()
        val b = spark.read.parquet(s"$root/$ptr/drift").collect()(0)
          .getAs[Double]("baseline")
        s"$ptr|$n|$b"
      })
  }

  private def annLifecycle: Lifecycle = {
    val base = emb(400, 0)
    Lifecycle(
      name = "ann-index",
      seed = root => StreamingOps.seedAnnIndex(
        Similarity.buildAnnIndex(base, dim, nlist = 8, m = 4, ks = 32), root),
      round = (root, out, bid) => StreamingOps.annIncrementBatchFn(
        root, out, k = 3)(emb(25, 1000L * bid), bid),
      serve = root => {
        val ptr = pointerOf(root)
        val ix = Similarity.readAnnIndex(spark, s"$root/$ptr")
        s"$ptr|${ix.vecs.count()}|${ix.coded.count()}"
      })
  }

  private def packLifecycle: Lifecycle = Lifecycle(
    name = "pack-state",
    seed = root => StreamingOps.seedPackState(root),
    round = (root, out, bid) => StreamingOps.packWholeBatchFn(
      root, out, capTokens = 40)(
      docs((10L * bid, txt(s"p${bid}a")), (10L * bid + 1, txt(s"p${bid}b"))), bid),
    serve = root => {
      val ptr = pointerOf(root)
      s"$ptr|${StoreIO.readString(s"$root/$ptr").trim}"
    })

  /** The matrix body: every pointer-commit kill point, the documented
    * replay after each, then the lagging-listing reader. Returns the
    * faulty (root, out) pair for lifecycle-specific epilogue assertions. */
  private def runMatrix(lc: Lifecycle): (String, String) = {
    FaultyFs.register(spark)
    FaultyFs.reset()
    val tmp = java.nio.file.Files
      .createTempDirectory(s"graft-fault-${lc.name}").toString
    val root = s"faulty://$tmp/index"
    val out = s"faulty://$tmp/out"
    lc.seed(root)
    assert(StoreIO.list(root, "LATEST.mlog").nonEmpty,
      s"${lc.name}: faulty:// must auto-select the manifest log")
    var bid = 0L
    // LOST points: the writer dies with nothing durable at the pointer —
    // the old snapshot must keep serving, and the loop's replay contract
    // (re-run the same batchId) must complete the round byte-identically.
    for (point <- Seq("create:before", "create:torn", "rename:before")) {
      bid += 1
      val before = lc.serve(root)
      FaultyFs.arm(point, "LATEST")
      val e = intercept[FaultyFs.Killed](lc.round(root, out, bid))
      assert(e.getMessage.contains(point))
      FaultyFs.reset()
      assert(lc.serve(root) == before,
        s"${lc.name}: pointed-at snapshot changed after a $point crash")
      lc.round(root, out, bid) // the documented replay
      assert(pointerOf(root) == s"v$bid",
        s"${lc.name}: replay after $point did not complete the commit")
    }
    // LANDED points: the put-once entry is durable before the writer dies
    // — every reader sees the NEW version; the replay is a no-op.
    for (point <- Seq("rename:after-put", "rename:after-delete")) {
      bid += 1
      FaultyFs.arm(point, "LATEST")
      intercept[FaultyFs.Killed](lc.round(root, out, bid))
      FaultyFs.reset()
      assert(pointerOf(root) == s"v$bid",
        s"${lc.name}: $point is past the commit point — the flip must be visible")
      val committed = lc.serve(root)
      lc.round(root, out, bid) // committed-but-uncheckpointed replay: no-op
      assert(lc.serve(root) == committed,
        s"${lc.name}: replay of a committed round must change nothing")
    }
    // DATA-PLANE kill (VERDICT r19 next #7): the writer dies MID-PARQUET —
    // a torn create on a DATA file under the NEXT version directory, not
    // the pointer. The matrix above kills at the pointer because every
    // loop writes data first and flips last; this case pins the reasoning
    // that leans on: in local mode a task failure is terminal (no
    // retries), so the armed torn create kills the whole round exactly
    // like a writer crashing mid-write (driver-side data files — the pack
    // state string — die in the create itself). Post-conditions: the
    // orphaned partial version is INVISIBLE to readers (the pointer never
    // moved; serve is byte-identical), and the documented replay reclaims
    // it — the retry OVERWRITES its own orphan and commits, the same
    // self-heal contract every store's writer documents.
    locally {
      bid += 1
      val before = lc.serve(root)
      FaultyFs.arm("create:torn", s"/index/v$bid")
      val e = intercept[Throwable](lc.round(root, out, bid))
      // the Killed may be swallowed from the cause/suppressed chains by
      // intermediate layers (parquet's close path replaces it with the
      // torn stream's "Stream Closed") — the one-shot arm being CONSUMED
      // is the robust witness that OUR kill, not an unrelated failure,
      // took the writer down
      assert(!FaultyFs.armed,
        s"${lc.name}: the round failed before the mid-data kill fired: $e")
      FaultyFs.reset()
      assert(pointerOf(root) != s"v$bid",
        s"${lc.name}: a mid-data crash must never advance the pointer")
      assert(lc.serve(root) == before,
        s"${lc.name}: pointed-at snapshot changed after a mid-data crash")
      lc.round(root, out, bid) // the replay overwrites the orphan, commits
      assert(pointerOf(root) == s"v$bid",
        s"${lc.name}: replay after the mid-data kill did not complete")
    }
    // a reader behind a LAGGING listing resolves the PREVIOUS committed
    // version — never a torn state — then catches up
    val prev = lc.serve(root)
    bid += 1
    lc.round(root, out, bid)
    val cur = lc.serve(root)
    val newest = StoreIO.list(s"$root/LATEST.mlog", "c").max
    FaultyFs.hidden = Set(s"$tmp/index/LATEST.mlog/$newest")
    assert(lc.serve(root) == prev,
      s"${lc.name}: a lagging reader must serve the previous version coherently")
    FaultyFs.hidden = Set.empty
    assert(lc.serve(root) == cur)
    (root, out)
  }

  test("crawl store (dedup index + LR model + BPE model + search tier): kill-point matrix") {
    val (root, out) = runMatrix(crawlLifecycle)
    // the search tier rides its own CURRENT commit inside each round with
    // the TAG as its replay-idempotency witness — after seven rounds (four
    // of them killed and replayed: three at the pointer, one mid-data) the
    // store must serve BIT-EQUAL to a scan over base ∪ every accepted
    // batch: a replayed round that double-appended, or a torn commit,
    // breaks this equality
    val base = docs((1L, txt("basea")), (2L, txt("baseb")), (3L, txt("basec")))
    val corpus = StoreIO.list(out, "batch=").foldLeft(base) { (acc, b) =>
      acc.unionByName(spark.read.parquet(s"$out/$b")
        .select(col("doc_id"), col("clean_text").as("text")))
    }
    val ix = Search.readSearchIndex(spark, s"$root/search_index")
    for (q <- Seq("basea0 baseb1", "r1a0", "r6b5", "r7a0"))
      assert(Search.bm25TopKIndexed(ix, q, k = 5).collect().toSeq ==
        Search.bm25TopK(corpus, q, k = 5).collect().toSeq,
        s"faulty crawl store: serve != scan for '$q'")
  }

  test("semantic index store: kill-point matrix") {
    runMatrix(semLifecycle): Unit
  }

  test("ANN index store: kill-point matrix") {
    runMatrix(annLifecycle): Unit
  }

  test("pack-state store: kill-point matrix") {
    val (root, out) = runMatrix(packLifecycle)
    // the pack manifests are the store's data plane: after seven rounds
    // the concatenated per-batch manifests must chain bins exactly (the
    // byte-identical-replay contract) — every batch exists and the state
    // the pointer serves reflects the LAST committed round
    assert(StoreIO.list(out, "batch=").size == 7)
    assert(StoreIO.readString(s"$root/${pointerOf(root)}").trim.split(' ').length == 2)
  }
}
