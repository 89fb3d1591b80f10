package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup
import graft.sources.Tables

/**
 * Incremental (delta-vs-index) dedup — VERDICT r6 missing #2. The defining
 * property under test: probing a delta against the base corpus's persistent
 * index must give EXACTLY the answer full-corpus dedup gives when restricted
 * to delta rows (exact tier) / delta×base pairs (near tier), while the probe
 * plan never shuffles the index side.
 */
class IncrementalDedupSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"
  private def docs = Tables.documents(spark, sfDir)
  private def delta = docs.filter(col("doc_id") % 5 === 0)
  private def base = docs.filter(col("doc_id") % 5 =!= 0)

  test("incrementalExact == full-corpus exact dedup restricted to delta rows") {
    val idx = Dedup.buildIndex(base)
    val got = Dedup.incrementalExact(delta, idx)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    // independent derivation: global min doc_id per content hash over ALL docs
    val keep = docs.select(md5(col("text")).as("h"), col("doc_id"))
      .groupBy("h").agg(min("doc_id").as("keep_id"))
    val want = docs.filter(col("doc_id") % 5 === 0)
      .select(md5(col("text")).as("h"), col("doc_id"))
      .join(keep, Seq("h"))
      .select(col("doc_id"), col("keep_id"), (col("keep_id") < col("doc_id")).as("is_dup"))
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(got.toSeq == want.toSeq)
    assert(got.nonEmpty)
  }

  test("incrementalNearDup == full-corpus minhashNearDup restricted to delta×base pairs") {
    val idx = Dedup.buildIndex(base)
    val got = Dedup.incrementalNearDup(delta, idx)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val full = Dedup.minhashNearDup(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // full emits id_a < id_b over the whole corpus; keep only cross pairs,
    // re-keyed as (delta_id, base_id)
    val want = full.flatMap { case (a, b, j) =>
      val (aDelta, bDelta) = (a % 5 == 0, b % 5 == 0)
      if (aDelta && !bDelta) Some((a, b, j))
      else if (!aDelta && bDelta) Some((b, a, j))
      else None
    }.toSet
    assert(got == want, s"incremental pairs ${got.size} != restricted full pairs ${want.size}")
    assert(got.nonEmpty, "fixture must exercise the near tier")
  }

  test("incrementalSpanNearDup == full-corpus spanNearDup restricted to delta×base pairs") {
    val idx = Dedup.buildIndex(base)
    val got = Dedup.incrementalSpanNearDup(delta, idx)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val full = Dedup.spanNearDup(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val want = full.flatMap { case (a, b, n) =>
      val (aDelta, bDelta) = (a % 5 == 0, b % 5 == 0)
      if (aDelta && !bDelta) Some((a, b, n))
      else if (!aDelta && bDelta) Some((b, a, n))
      else None
    }.toSet
    assert(got == want, s"incremental span pairs ${got.size} != restricted full ${want.size}")
    assert(got.nonEmpty, "fixture must exercise the span tier")
  }

  test("appendIndex == rebuilding from the union: the next crawl probes base ∪ delta") {
    // crawl 1 (doc_id % 5 == 0) is probed, accepted, APPENDED; crawl 2
    // (doc_id % 10 == 1) then probes the grown index. Every tier must
    // answer exactly as an index rebuilt from base ∪ crawl1 would (caps
    // never bind at this corpus size — the documented equivalence regime).
    val crawl1 = delta
    val crawl2 = docs.filter(col("doc_id") % 10 === 1)
    val grown = Dedup.appendIndex(Dedup.buildIndex(base), crawl1)
    // base ∪ crawl1 = (%5 != 0) ∪ (%5 == 0) = the whole corpus
    val rebuiltFull = Dedup.buildIndex(docs)
    for ((probe, name) <- Seq(
        (Dedup.incrementalExact(crawl2, grown), "exact"),
        (Dedup.incrementalNearDup(crawl2, grown), "near"),
        (Dedup.incrementalSpanNearDup(crawl2, grown), "spans"))) {
      val want = name match {
        case "exact" => Dedup.incrementalExact(crawl2, rebuiltFull)
        case "near" => Dedup.incrementalNearDup(crawl2, rebuiltFull)
        case _ => Dedup.incrementalSpanNearDup(crawl2, rebuiltFull)
      }
      assert(probe.collect().map(_.toSeq).toSeq == want.collect().map(_.toSeq).toSeq,
        s"$name tier diverged after append")
    }
  }

  test("incrementalCutSpans == full-corpus uncapped exactSpans+cutSpans restricted to delta rows") {
    val idx = Dedup.buildIndex(base)
    val got = Dedup.incrementalCutSpans(delta, idx, base)
      .orderBy("doc_id").collect().map(_.toSeq)
    // independent full-corpus derivation: uncapped spans over ALL docs, cut
    // everything, read off the delta rows
    val fullSpans = Dedup.exactSpans(docs, maxGramFreq = None)
    val want = Dedup.cutSpans(docs, fullSpans)
      .filter(col("doc_id") % 5 === 0)
      .orderBy("doc_id").collect().map(_.toSeq)
    assert(got.toSeq == want.toSeq)
    // the fixture must exercise the cut path (some delta doc loses tokens)
    assert(got.exists(r => r(2).asInstanceOf[Long] > 0L),
      "fixture must contain at least one cut delta doc")
  }

  test("compactIndex: append + compact == fresh buildIndex even when caps bind only ACROSS snapshots") {
    // A fingerprint/band bucket can cross a probe's cap only when both
    // snapshots' occurrences are summed — the exact regime append-only
    // frequencies get wrong (each union side carries per-build counts).
    // Construction: one boilerplate sentence shared by 4 base docs and
    // 4 delta docs + a unique tail per doc. With maxFpFreq/maxBandBucket
    // = 6 the shared keys sit under the cap in each snapshot (4 ≤ 6) but
    // over it globally (8 > 6), so a fresh build over the union and the
    // compacted append must agree — and the UN-compacted append must not.
    val boiler = "the quick brown fox jumps over the lazy dog again and again"
    def mk(ids: Range) = ids.map(i => (i.toLong, s"$boiler unique tail $i " +
      s"alpha${i}a beta${i}b gamma${i}c delta${i}d epsilon${i}e zeta${i}f")).toDF("doc_id", "text")
    val baseC = mk(0 until 4)
    val deltaC = mk(100 until 104)
    val appended = Dedup.appendIndex(Dedup.buildIndex(baseC), deltaC)
    val compacted = Dedup.compactIndex(appended)
    val fresh = Dedup.buildIndex(baseC.unionByName(deltaC))
    def normFps(idx: Dedup.DedupIndex) =
      idx.fps.select("fp", "id", "fp_freq").collect().map(_.toSeq).toSet
    def normBands(idx: Dedup.DedupIndex) =
      idx.bands.select("band", "bkey", "id", "bucket_n").collect().map(_.toSeq).toSet
    def normExact(idx: Dedup.DedupIndex) =
      idx.exact.collect().map(_.toSeq).toSet
    def normCutFps(idx: Dedup.DedupIndex) =
      idx.cutFps.select("fp", "id", "fp_freq").collect().map(_.toSeq).toSet
    assert(normFps(compacted) == normFps(fresh), "compacted fps must equal fresh build")
    assert(normCutFps(compacted) == normCutFps(fresh), "compacted cutFps must equal fresh build")
    assert(normBands(compacted) == normBands(fresh), "compacted bands must equal fresh build")
    assert(normExact(compacted) == normExact(fresh), "compacted exact tier must equal fresh build")
    assert(normFps(appended) != normFps(fresh),
      "fixture must actually exercise cross-snapshot frequencies (per-build counts differ)")
    // and the thing the counts are FOR: a probe capping at 6 sees the
    // boilerplate fingerprints only through the compacted index's global
    // frequencies — same pairs as probing a fresh full build
    val probe = mk(200 until 202)
    val gotCompacted = Dedup.incrementalSpanNearDup(probe, compacted, maxFpFreq = 6)
      .collect().map(_.toSeq).toSeq
    val gotFresh = Dedup.incrementalSpanNearDup(probe, fresh, maxFpFreq = 6)
      .collect().map(_.toSeq).toSeq
    assert(gotCompacted == gotFresh)
  }

  test("crawlIncrement round-trip: accepted output re-crawled against the grown index is all exact dups") {
    val idx = Dedup.buildIndex(base)
    val (accepted, grown) = graft.operators.TrainingSet.crawlIncrement(delta, idx, base)
    val out = accepted.collect()
    assert(out.nonEmpty, "fixture must accept some delta docs")
    // collective stage liveness at this sf: the gates dropped something
    // (per-stage liveness — planted dups, cuts, PII — is the registered
    // pipeline_crawl_increment query's job at the oracle sf)
    assert(out.length < delta.count(), "the pipeline must filter some delta docs")
    // the round-trip property appendIndex exists for: the SAME content
    // arriving in the NEXT crawl (fresh ids) is flagged as already-present
    // by the exact tier of the grown index
    val spark2 = spark
    import spark2.implicits._
    val recrawl = accepted.select(
      (col("doc_id") + 1000000L).as("doc_id"), col("clean_text").as("text"))
    val probe = Dedup.incrementalExact(recrawl, grown).collect()
    assert(probe.nonEmpty && probe.forall(_.getAs[Boolean]("is_dup")),
      s"every re-crawled accepted doc must be an exact dup of the grown index " +
        s"(${probe.count(!_.getAs[Boolean]("is_dup"))} of ${probe.length} were not)")
    // and the grown index answers like a fresh build over base ∪ accepted
    val freshFull = Dedup.buildIndex(
      base.select(col("doc_id"), col("text"))
        .unionByName(accepted.select(col("doc_id"), col("clean_text").as("text"))))
    val got = Dedup.incrementalExact(recrawl, grown).collect().map(_.toSeq).toSeq
    val want = Dedup.incrementalExact(recrawl, freshFull).collect().map(_.toSeq).toSeq
    assert(got == want)
  }

  test("persisted index round-trips and the probe never shuffles the index side") {
    val dir = java.nio.file.Files.createTempDirectory("graft_idx_").toString
    try {
      Dedup.writeIndex(Dedup.buildIndex(base), dir)
      val idx = Dedup.readIndex(spark, dir)
      val inMem = Dedup.incrementalExact(delta, Dedup.buildIndex(base))
        .collect().map(_.toSeq)
      val fromDisk = Dedup.incrementalExact(delta, idx)
      assert(fromDisk.collect().map(_.toSeq).toSeq == inMem.toSeq)
      // with the index on parquet, the probe joins must broadcast the delta:
      // no sort-merge join, so the index side is scanned, never exchanged
      val plans = Seq(
        Dedup.incrementalExact(delta, idx),
        Dedup.incrementalNearDup(delta, idx))
        .map(_.queryExecution.executedPlan.toString)
      for (p <- plans) {
        assert(p.contains("BroadcastHashJoin"), s"probe must broadcast the delta:\n$p")
        assert(!p.contains("SortMergeJoin"), s"index side must never sort-merge:\n$p")
      }
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }
}
