package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, TextAnalysis, TimeMode, TsAgg, TsAggClient, TsAggSpec}

/** Degenerate-input behavior: empty frames, sub-shingle docs, unicode. */
class EdgeCaseSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  private val t0 = RefFixture.BaseMs
  private val spec = TsAggSpec(900, TimeMode.CellTs(t0, t0 + 3600000L))

  test("aggregation over a range with no data yields an empty result, not an error") {
    val df = Seq((t0 - 5000L, 1L)).toDF("ts", "value") // all data before range
    assert(TsAgg.max(df, spec).count() == 0)
    assert(TsAggClient.max(df, spec).isEmpty)
  }

  test("distinctCountAuto: empty input probes to 0 pairs and returns empty via the exact branch") {
    val df = Seq.empty[(Long, Long)].toDF("ts", "user")
    val out = TsAgg.distinctCountAuto(df, spec.copy(valueCol = "user"), "user")
    assert(out.columns.contains("n_distinct_est") && out.count() == 0)
    // degenerate data outside the range behaves the same
    val before = Seq((t0 - 5000L, 7L)).toDF("ts", "user")
    assert(TsAgg.distinctCountAuto(before, spec.copy(valueCol = "user"), "user").count() == 0)
  }

  test("quantileAuto: empty input probes to a null max-group and returns empty, exact branch") {
    val df = Seq.empty[(Long, Long)].toDF("ts", "value")
    val out = TsAgg.quantileAuto(df, spec, 0.95)
    assert(out.columns.contains("p95_est") && out.count() == 0)
    val before = Seq((t0 - 5000L, 7L)).toDF("ts", "value")
    assert(TsAgg.quantileAuto(before, spec, 0.95).count() == 0)
  }

  test("bpeDrift degenerate corpora: empty vs empty is quiet, not a crash") {
    import graft.operators.{BpeModel, Tokenizer}
    val m = BpeModel(IndexedSeq(("a", "b")))
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val d = Tokenizer.bpeDrift(empty, empty, m, k = 10)
    assert(d.headDistance == 0.0 && d.fertilityTrained == 0.0 && d.fertilityFresh == 0.0)
    // one-sided empty: the head distance saturates (nothing shared), no error
    val docs = Seq((1L, "ab ab")).toDF("doc_id", "text")
    val d2 = Tokenizer.bpeDrift(docs, empty, m, k = 10)
    assert(d2.headDistance == 1.0 && d2.fertilityFresh == 0.0)
  }

  test("empty input frames flow through every dedup variant") {
    val docs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Dedup.exact(docs).count() == 0)
    assert(Dedup.ngramJaccard(docs).count() == 0)
    assert(Dedup.minhashNearDup(docs).count() == 0)
    assert(Dedup.simhashNearDup(docs).count() == 0)
    val vecs = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    assert(Dedup.embeddingNearDup(vecs).count() == 0)
  }

  test("documents shorter than the shingle width are excluded, not errors") {
    val docs = Seq((1L, "one two"), (2L, "a b c d e"), (3L, "")).toDF("doc_id", "text")
    assert(Dedup.ngramJaccard(docs).count() == 0) // only doc 2 shingles; no pair
    assert(Dedup.minhashNearDup(docs).count() == 0)
    assert(TextAnalysis.fingerprints(docs).count() == 1)
  }

  test("unicode text survives tokenization and metrics") {
    val docs = Seq((1L, "héllo wörld 你好 мир"), (2L, "  ")).toDF("doc_id", "text")
    val m = TextAnalysis.qualityMetrics(docs).collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(m(1L) == 4) // four tokens
    val langs = TextAnalysis.languageId(docs).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(langs(1L) == "zh") // CJK presence dominates
  }

  test("single-bucket range and interval larger than range") {
    val df = Seq((t0 + 1L, 5L), (t0 + 2L, 9L)).toDF("ts", "value")
    val wide = TsAggSpec(86400, TimeMode.CellTs(t0, t0 + 60000L)) // 1-day bucket, 1-min range
    assert(TsAggClient.max(df, wide) == scala.collection.SortedMap(t0 -> 9L))
  }

  test("empty and degenerate inputs flow through the corpus-curation operators") {
    import graft.operators.Corpus
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Corpus.repetitionMetrics(empty).count() == 0)
    assert(Corpus.splitAssign(empty).count() == 0)
    assert(Corpus.vocabTopK(empty, 5).count() == 0)
    assert(Corpus.mixtureStats(empty.withColumn("source", lit("s"))
      .withColumn("lang", lit("l"))).count() == 0)
    // drift against an empty side: every token of the non-empty side ranks
    val a = Seq((1L, "x y")).toDF("doc_id", "text")
    val shift = Corpus.tokenShift(a, empty, 5).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(shift == Set(("x", 1L, 0L), ("y", 1L, 0L)))
    // null text: splitAssign coalesces to "" — both docs get a side
    val nulls = Seq((1L, null.asInstanceOf[String]), (2L, "a b")).toDF("doc_id", "text")
    assert(Corpus.splitAssign(nulls).count() == 2)
  }

  test("empty and degenerate inputs flow through the round-7 dedup operators") {
    val docs = Seq((1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "eta theta iota kappa lambda mu")).toDF("doc_id", "text")
    val emptyDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val idx = Dedup.buildIndex(docs)
    // empty delta: every probe tier yields empty, not an error
    assert(Dedup.incrementalExact(emptyDocs, idx).count() == 0)
    assert(Dedup.incrementalNearDup(emptyDocs, idx).count() == 0)
    assert(Dedup.incrementalSpanNearDup(emptyDocs, idx).count() == 0)
    // empty BASE: delta docs are all fresh (keep themselves, no matches)
    val emptyIdx = Dedup.buildIndex(emptyDocs)
    val fresh = Dedup.incrementalExact(docs, emptyIdx).collect()
    assert(fresh.length == 2 && fresh.forall(r => !r.getBoolean(2) && r.getLong(0) == r.getLong(1)))
    assert(Dedup.incrementalNearDup(docs, emptyIdx).count() == 0)
    // semantic dedup: empty input, and a single vector (no pairs, keeps itself)
    val emptyVecs = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    val one = Seq((7L, Array.tabulate(4)(i => 0.5f))).toDF("vec_id", "embedding")
    val cents = Array.fill(8)(0.25) // 2 cells × dim 4
    assert(Dedup.semanticDedup(emptyVecs, dim = 4, nlist = 2, centroids = Some(cents)).count() == 0)
    val kept = Dedup.semanticDedup(one, dim = 4, nlist = 2, centroids = Some(cents)).collect()
    assert(kept.length == 1 && kept.head.getBoolean(2))
  }

  test("dHash handles degenerate image geometry (tiny, narrow, 1-pixel-tall)") {
    import graft.operators.Multimodal.MediaCodec
    // 2×1: the minimum the grid accepts — cells repeat pixels, hash defined
    val tiny = MediaCodec.dHash64(MediaCodec.wrapPng(2, 1, Array[Byte](10, 10, 10, 120, 120, 120)))
    assert(tiny.isDefined)
    // width 1 is below the 2-column minimum: no hash, no exception
    assert(MediaCodec.dHash64(MediaCodec.wrapPng(1, 4, Array.fill(12)(7.toByte))).isEmpty)
    // narrow-but-tall and wide-but-flat stay defined and differ for
    // differing content
    val a = MediaCodec.dHash64(MediaCodec.wrapPng(3, 40, Array.tabulate(360)(i => (i % 97).toByte)))
    val b = MediaCodec.dHash64(MediaCodec.wrapPng(40, 3, Array.tabulate(360)(i => (i % 89).toByte)))
    assert(a.isDefined && b.isDefined && a != b)
  }

  test("empty inputs flow through spans, cut, sessions, and heavy hitters") {
    val docs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Dedup.exactSpans(docs).count() == 0)
    val noSpans = Seq.empty[(Long, Long, Long, Long, Long)]
      .toDF("id_a", "id_b", "a_start", "b_start", "len")
    val d = Seq((7L, "a b c")).toDF("doc_id", "text")
    val cut = Dedup.cutSpans(d, noSpans).collect().head
    assert(cut.getString(1) == "a b c" && cut.getLong(2) == 0L)
    val ev = Seq.empty[(Long, Long)].toDF("ts", "user")
    assert(TsAgg.sessionWindows(ev, 1000L, Seq("user")).count() == 0)
    assert(TsAgg.topKPerBucket(ev.withColumnRenamed("user", "value")
      .withColumn("user", col("value")), spec, "user", 3).count() == 0)
    assert(TsAgg.approxTopKPerBucket(ev.withColumn("value", col("user")),
      spec, "user", 3).count() == 0)
  }
}
