package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TrainingSet
import graft.sources.{Fixtures, Tables}
import graft.streaming.StreamingOps

/**
 * The continuous crawl loop ([[StreamingOps.crawlIncrementBatchFn]]):
 * micro-batch N must equal the BATCH composition against the index state
 * batch N−1 left behind — so the oracle-checked `pipeline_crawl_increment`
 * semantics transfer to the stream — and the index must genuinely grow
 * between batches (a doc re-crawled from an earlier batch's ACCEPTED output
 * falls, which no static-index probe could know). The committed-replay
 * guard is pinned too: re-running an already-committed batch id is a no-op,
 * not a second index append.
 */
class StreamingCrawlSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private val Sf = "/root/testdata/sf0.001"

  private def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, String, Long, Long, Long, Long, Long)] =
    df.select("doc_id", "clean_text", "n_removed", "n_emails", "n_ips", "n_phones", "n_tokens")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSet

  test("two micro-batches: per-batch batch-parity, cross-batch index growth, replay no-op") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("graft-crawl-stream").toString
    val (root, out, ckpt) = (s"$tmp/index", s"$tmp/accepted", s"$tmp/ckpt")

    val docs = Tables.documents(spark, Sf)
    val base = docs.filter(col("doc_id") % 5 =!= 0).select("doc_id", "text")
    val delta1 = docs.filter(col("doc_id") % 20 === 0).select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    StreamingOps.seedCrawlIndex(Fixtures.dedupIndex(spark, Sf), root)

    val ms = MemoryStream[(Long, String)]
    val q = StreamingOps.crawlIncrementStream(
      ms.toDF().toDF("doc_id", "text"), root, base, out, ckpt)
    try {
      // ---- batch 0: the registered pipeline's own delta ----
      ms.addData(delta1: _*)
      q.processAllAvailable()
      val got0 = rows(spark.read.parquet(s"$out/batch=0"))
      val expect0 = rows(TrainingSet.crawlIncrement(
        delta1.toDF("doc_id", "text"), Fixtures.dedupIndex(spark, Sf), base)._1)
      assert(got0 == expect0 && got0.nonEmpty,
        "micro-batch 0 must equal the batch composition against the seed index")

      // ---- batch 1: a re-crawl of batch 0's accepted output + one fresh doc ----
      val recrawled = got0.find(_._3 == 0L).getOrElse(fail("need an untouched survivor"))
      val fresh = (0 until 20).map(i => s"streamfresh${i}x").mkString(" ")
      ms.addData((900001L, recrawled._2), (900002L, fresh))
      q.processAllAvailable()
      val got1 = rows(spark.read.parquet(s"$out/batch=1"))
      assert(!got1.exists(_._1 == 900001L),
        "an exact copy of an earlier batch's ACCEPTED doc must fall — only the " +
          "grown index knows that text")
      assert(got1.exists(r => r._1 == 900002L && r._3 == 0L && r._7 == 20L),
        s"the fresh doc must survive untouched: $got1")
    } finally q.stop()

    // ---- pointer advanced; committed-replay guard is a no-op ----
    assert(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(root, "LATEST")), "UTF-8").trim == "v1")
    val exactRowsBefore = graft.operators.Dedup.readIndex(spark, s"$root/v1").exact.count()
    StreamingOps.crawlIncrementBatchFn(root, base, out)(
      Seq((900001L, "anything")).toDF("doc_id", "text"), 1L)
    assert(graft.operators.Dedup.readIndex(spark, s"$root/v1").exact.count()
      == exactRowsBefore, "replaying a committed batch must not append again")
  }

  test("domain quota rides the loop: cross-batch lockout, post-quota index growth") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("graft-crawl-quota").toString
    val (root, out, ckpt) = (s"$tmp/index", s"$tmp/accepted", s"$tmp/ckpt")

    def txt(tag: String) = (0 until 18).map(i => s"$tag$i").mkString(" ")
    val base = Seq((1L, txt("baseword"))).toDF("doc_id", "text")
    StreamingOps.seedCrawlIndex(graft.operators.Dedup.buildIndex(base), root)

    val ms = MemoryStream[(Long, String, String)]
    // through the public wiring helper — domainQuota is forwarded since
    // ADVICE r9 (hand-building foreachBatch is no longer required)
    val q = StreamingOps.crawlIncrementStream(
      ms.toDF().toDF("doc_id", "text", "domain"), root, base, out, ckpt,
      domainQuota = Some(("domain", 1)))
    try {
      // batch 0: two clean farm docs — quota 1 keeps exactly one
      ms.addData((10L, txt("alpha"), "farm.com"), (11L, txt("beta"), "farm.com"))
      q.processAllAvailable()
      val b0 = rows(spark.read.parquet(s"$out/batch=0"))
      assert(b0.map(_._1).subsetOf(Set(10L, 11L)) && b0.size == 1,
        s"quota 1 must keep exactly one farm doc: $b0")
      val rejected = (Set(10L, 11L) -- b0.map(_._1)).head
      val rejectedText = Map(10L -> txt("alpha"), 11L -> txt("beta"))(rejected)

      // batch 1: the domain is LOCKED OUT across batches (the case a
      // per-round quota can never express); other domains unaffected
      ms.addData((12L, txt("gamma"), "farm.com"), (13L, txt("delta"), "other.org"))
      q.processAllAvailable()
      val b1 = rows(spark.read.parquet(s"$out/batch=1"))
      assert(b1.map(_._1) == Set(13L), s"farm.com must be exhausted: $b1")

      // batch 2: the quota-REJECTED text re-crawled under a fresh domain
      // must be ACCEPTED — i.e. the index grew with post-quota keeps only
      ms.addData((14L, rejectedText, "fresh.net"))
      q.processAllAvailable()
      val b2 = rows(spark.read.parquet(s"$out/batch=2"))
      assert(b2.map(_._1) == Set(14L),
        s"a quota-rejected doc's content is not in the corpus — its re-crawl " +
          s"from an under-quota domain must survive: $b2")
    } finally q.stop()
  }

  test("token budget rides the loop: ledger carries, stratum lockout, untargeted strata rejected") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("graft-crawl-budget").toString
    val (root, out, ckpt) = (s"$tmp/index", s"$tmp/accepted", s"$tmp/ckpt")

    def txt(tag: String) = (0 until 18).map(i => s"$tag$i").mkString(" ")
    val base = Seq((1L, txt("baseword"))).toDF("doc_id", "text")
    StreamingOps.seedCrawlIndex(graft.operators.Dedup.buildIndex(base), root)
    val targets = Seq(("a", 30L), ("b", 25L)).toDF("lang", "target_tokens")

    def ledger(v: String) = spark.read.parquet(s"$root/$v/budget_ledger")
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    def ids(b: Int) = spark.read.parquet(s"$out/batch=$b")
      .select("doc_id").collect().map(_.getLong(0)).toSet

    val ms = MemoryStream[(Long, String, String)]
    val q = StreamingOps.crawlIncrementStream(
      ms.toDF().toDF("doc_id", "text", "lang"), root, base, out, ckpt,
      tokenBudget = Some(targets))
    try {
      // batch 0: two 18-token 'a' docs (36 ≥ target 30 — the second is the
      // ≤-1-doc overshoot), one 'b' doc, one untargeted 'c' doc
      ms.addData((10L, txt("alpha"), "a"), (11L, txt("beta"), "a"),
        (12L, txt("gamma"), "b"), (13L, txt("delta"), "c"))
      q.processAllAvailable()
      assert(ids(0) == Set(10L, 11L, 12L),
        s"a fills with overshoot ≤ 1 doc, b accepts, untargeted c rejected: ${ids(0)}")
      assert(ledger("v0") == Map("a" -> 36L, "b" -> 18L), ledger("v0").toString)

      // batch 1: 'a' is LOCKED OUT across batches (36 ≥ 30); 'b' accepts
      // its crossing doc (consumed 18 < 25)
      ms.addData((14L, txt("eps"), "a"), (15L, txt("zeta"), "b"))
      q.processAllAvailable()
      assert(ids(1) == Set(15L), s"a exhausted, b crossing doc accepted: ${ids(1)}")
      assert(ledger("v1") == Map("a" -> 36L, "b" -> 36L), ledger("v1").toString)

      // batch 2: both strata over budget — the campaign accepts nothing
      ms.addData((16L, txt("eta"), "b"))
      q.processAllAvailable()
      assert(ids(2).isEmpty, s"b exhausted too: ${ids(2)}")
      assert(ledger("v2") == Map("a" -> 36L, "b" -> 36L))
    } finally q.stop()
  }

  test("eTLD+1 default quota key: a subdomain link farm is cut that host keys would pass") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def txt(tag: String) = (0 until 18).map(i => s"$tag$i").mkString(" ")
    // farm: one registrant (github.io is a PSL private suffix, so
    // farm.github.io is the registrable domain) spread over DISTINCT hosts;
    // plus one independent doc
    val farm = Seq(
      (10L, txt("alpha"), "a1.farm.github.io"),
      (11L, txt("beta"), "a2.farm.github.io"),
      (12L, txt("gamma"), "www.other.net"))
    def run(etld: Boolean): Set[Long] = {
      val tmp = java.nio.file.Files.createTempDirectory(s"graft-crawl-etld-$etld").toString
      val base = Seq((1L, txt("baseword"))).toDF("doc_id", "text")
      StreamingOps.seedCrawlIndex(graft.operators.Dedup.buildIndex(base), s"$tmp/index")
      val ms = MemoryStream[(Long, String, String)]
      val q = StreamingOps.crawlIncrementStream(
        ms.toDF().toDF("doc_id", "text", "domain"), s"$tmp/index", base,
        s"$tmp/accepted", s"$tmp/ckpt",
        domainQuota = Some(("domain", 1)), quotaKeyEtld = etld)
      try {
        ms.addData(farm: _*)
        q.processAllAvailable()
        spark.read.parquet(s"$tmp/accepted/batch=0")
          .select("doc_id").collect().map(_.getLong(0)).toSet
      } finally q.stop()
    }
    val underEtld = run(etld = true)
    // the registrant's three hosts share ONE quota slot; the independent
    // doc keeps its own
    assert(underEtld.contains(12L) && (underEtld - 12L).size == 1 &&
      (underEtld - 12L).subsetOf(Set(10L, 11L)),
      s"farm must collapse to one eTLD+1 slot: $underEtld")
    // the control: raw host keys see three distinct domains — the farm
    // passes whole, which is exactly the evasion the default closes
    assert(run(etld = false) == Set(10L, 11L, 12L),
      "host-keyed quota must pass every farm host (the blind spot)")
  }

  test("DSIR steering rides the loop: stream == batch ∘ dsirSelect, junk vocab cut") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import graft.operators.{Corpus, Dedup}
    // target model speaks g*, raw model the g*/j* mix — junk-vocab docs pay
    // ~9 unseen-token bits each and are cut at ~2^tok_bits; good-vocab docs
    // sit at tok_bits ≥ -1 (DsirSpec pins the selection semantics; THIS
    // test pins the streaming wiring against the batch composition)
    // 18 tokens stepping through a 40-word vocab: distinct within each doc
    // (step 3 and 11 both have period 40 mod 40), so the crawl's top-token
    // repetition gate passes and only the DSIR gate separates the halves
    def gDoc(s: Int) = (0 until 18).map(i => s"g${(s * 7 + i * 3) % 40}").mkString(" ")
    def jDoc(s: Int) = (0 until 18).map(i => s"j${(s * 5 + i * 11) % 40}").mkString(" ")
    val tm = Corpus.trainLmModel((1 to 40).map(i => (100L + i, gDoc(i))).toDF("doc_id", "text"))
    val rm = Corpus.trainLmModel(((1 to 40).map(i => (200L + i, gDoc(i + 13))) ++
      (1 to 40).map(i => (300L + i, jDoc(i)))).toDF("doc_id", "text"))
    val delta = (1 to 10).map(i => (i.toLong, gDoc(i + 29))) ++
      (1 to 10).map(i => (20L + i, jDoc(i + 17)))
    val tmp = java.nio.file.Files.createTempDirectory("graft-crawl-dsir").toString
    val base = Seq((900L, (0 until 18).map(i => s"basew$i").mkString(" ")))
      .toDF("doc_id", "text")
    StreamingOps.seedCrawlIndex(Dedup.buildIndex(base), s"$tmp/index")
    val ms = MemoryStream[(Long, String)]
    val q = StreamingOps.crawlIncrementStream(
      ms.toDF().toDF("doc_id", "text"), s"$tmp/index", base,
      s"$tmp/accepted", s"$tmp/ckpt", dsir = Some((tm, rm)))
    try {
      ms.addData(delta: _*)
      q.processAllAvailable()
      val got = spark.read.parquet(s"$tmp/accepted/batch=0")
        .select("doc_id").collect().map(_.getLong(0)).toSet
      // parity: the stream must equal the batch composition followed by the
      // dsirSelect keep filter — same frames, same models, same seed
      val batchAcc = TrainingSet.crawlIncrement(
        delta.toDF("doc_id", "text"), Dedup.buildIndex(base), base)._1
      val expect = batchAcc.join(
        Corpus.dsirSelect(batchAcc, tm, rm, textCol = "clean_text")
          .filter(col("keep")).select("doc_id"), Seq("doc_id"), "left_semi")
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(got == expect, s"stream $got must equal batch∘dsir $expect")
      // fixture sanity: the steering must BITE (some junk cut) and must not
      // wipe the target-vocab half
      assert((1L to 10L).count(got) >= 8, s"target-vocab docs must survive: $got")
      assert((21L to 30L).count(got) <= 5, s"junk vocab must be steered out: $got")
    } finally q.stop()
  }

  test("tokenizer-health sidecar rides the loop: quiet round stays quiet, drifted round is loud") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import graft.operators.{Dedup, Tokenizer}
    def gDoc(s: Int) = (0 until 18).map(i => s"gw${(s * 7 + i * 3) % 40}").mkString(" ")
    def zDoc(s: Int) = (0 until 18).map(i => s"zq${(s * 5 + i * 11) % 40}yx").mkString(" ")
    val trained = (1 to 60).map(i => (500L + i, gDoc(i))).toDF("doc_id", "text")
    val model = Tokenizer.trainBpe(trained, numMerges = 60)
    val baseline = Tokenizer.bpeBaseline(trained, model, k = 20)
    val tmp = java.nio.file.Files.createTempDirectory("graft-crawl-bpe").toString
    val base = Seq((900L, (0 until 18).map(i => s"basew$i").mkString(" ")))
      .toDF("doc_id", "text")
    StreamingOps.seedCrawlIndex(Dedup.buildIndex(base), s"$tmp/index")
    val ms = MemoryStream[(Long, String)]
    val q = StreamingOps.crawlIncrementStream(
      ms.toDF().toDF("doc_id", "text"), s"$tmp/index", base,
      s"$tmp/accepted", s"$tmp/ckpt", bpeMonitor = Some((model, baseline)))
    try {
      def sidecar(v: Int): (Double, Double, Double, String) = {
        val r = spark.read.parquet(s"$tmp/index/v$v/bpe_drift").collect()(0)
        (r.getAs[Double]("head_distance"), r.getAs[Double]("baseline_fertility"),
          r.getAs[Double]("fertility"), r.getAs[String]("bpe_model_md5"))
      }
      // round 0: stationary vocabulary — signal quiet, fertility flat
      ms.addData((1 to 15).map(i => (i.toLong, gDoc(i + 19))): _*)
      q.processAllAvailable()
      val (h0, bf0, f0, md0) = sidecar(0)
      assert(md0 == model.fingerprint, "sidecar must name the model it measured")
      assert(bf0 == baseline.fertility)
      assert(h0 <= 0.2 && math.abs(f0 - bf0) <= 0.3,
        s"stationary round must stay quiet: head $h0, fertility $bf0 -> $f0")
      // round 1: unseen vocabulary — head turns over, words fragment
      ms.addData((1 to 15).map(i => (50L + i, zDoc(i))): _*)
      q.processAllAvailable()
      val (h1, _, f1, _) = sidecar(1)
      assert(h1 >= 0.5, s"drifted round must turn the head over: $h1")
      assert(f1 >= bf0 + 0.5, s"unseen words must fragment: $bf0 -> $f1")
    } finally q.stop()
  }

  test("retrain-on-trip closes the tokenizer loop: drifted wave retrains, fertility recovers, old pin fails loudly") {
    // VERDICT r11 next #3 — the Sem/Ann rebuild shape applied to the BPE
    // tier: the active model rides the versioned store, a fertility trip
    // retrains on the grown corpus, and the old fingerprint pin downstream
    // refuses the silently-swapped pricing.
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import graft.operators.{Dedup, Tokenizer, TrainingSet}
    def gDoc(s: Int) = (0 until 18).map(i => s"gw${(s * 7 + i * 3) % 40}").mkString(" ")
    def zDoc(s: Int) = (0 until 18).map(i => s"zq${(s * 5 + i * 11) % 40}yx").mkString(" ")
    val trained = (1 to 60).map(i => (500L + i, gDoc(i))).toDF("doc_id", "text")
    val model = Tokenizer.trainBpe(trained, numMerges = 60)
    val baseline = Tokenizer.bpeBaseline(trained, model, k = 20)
    val tmp = java.nio.file.Files.createTempDirectory("graft-crawl-bpe-rt").toString
    val base = Seq((900L, (0 until 18).map(i => s"basew$i").mkString(" ")))
      .toDF("doc_id", "text")
    StreamingOps.seedCrawlIndex(Dedup.buildIndex(base), s"$tmp/index")
    val ms = MemoryStream[(Long, String)]
    // retrain when the increment's fertility reaches 1.3× the active
    // baseline; budget large enough to re-cover the full grown vocabulary
    val q = StreamingOps.crawlIncrementStream(
      ms.toDF().toDF("doc_id", "text"), s"$tmp/index", base,
      s"$tmp/accepted", s"$tmp/ckpt", bpeMonitor = Some((model, baseline)),
      bpeRetrainAt = 1.3, bpeNumMerges = 400)
    try {
      def sidecar(v: Int): (Double, Double, String, Boolean, String) = {
        val r = spark.read.parquet(s"$tmp/index/v$v/bpe_drift").collect()(0)
        (r.getAs[Double]("baseline_fertility"), r.getAs[Double]("fertility"),
          r.getAs[String]("bpe_model_md5"), r.getAs[Boolean]("retrained"),
          r.getAs[String]("active_model_md5"))
      }
      // round 0: stationary — no trip; the seed model is written forward so
      // the store is self-describing from the first snapshot on
      ms.addData((1 to 15).map(i => (i.toLong, gDoc(i + 19))): _*)
      q.processAllAvailable()
      val (bf0, f0, md0, rt0, act0) = sidecar(0)
      assert(!rt0 && md0 == model.fingerprint && act0 == model.fingerprint)
      assert(f0 < 1.3 * bf0, s"stationary round must not trip: $bf0 -> $f0")
      assert(Tokenizer.readBpeModel(spark, s"$tmp/index/v0/bpe_model")
        .fingerprint == model.fingerprint, "quiet round forwards the active model")
      // round 1: vocabulary-swapped wave — fertility spikes past the trip,
      // the loop retrains on the grown corpus and re-pins the store
      ms.addData((1 to 15).map(i => (50L + i, zDoc(i))): _*)
      q.processAllAvailable()
      val (_, f1, md1, rt1, act1) = sidecar(1)
      assert(md1 == model.fingerprint, "round 1 is MEASURED under the old model")
      assert(rt1, s"swapped vocabulary must trip the retrain: fertility $f1")
      assert(act1 != model.fingerprint, "retrain must produce a new identity")
      val model2 = Tokenizer.readBpeModel(spark, s"$tmp/index/v1/bpe_model")
      val base2 = Tokenizer.readBpeBaseline(spark, s"$tmp/index/v1/bpe_baseline")
      assert(model2.fingerprint == act1)
      // fertility recovers toward the fresh-train level: the new model
      // prices the SAME drifted wave near its re-derived baseline, far
      // below the old model's fragmented rate
      val zWave = (1 to 15).map(i => (50L + i, zDoc(i))).toDF("doc_id", "text")
      val fRecovered = Tokenizer.bpeFertility(zWave, model2)
      assert(fRecovered <= f1 - 1.0 && fRecovered < 1.3 * base2.fertility,
        s"retrain must recover fertility: old $f1, new $fRecovered, baseline ${base2.fertility}")
      // round 2: more of the new distribution — measured under the NEW
      // model now (the store advanced), and quiet again
      ms.addData((1 to 15).map(i => (70L + i, zDoc(i + 9))): _*)
      q.processAllAvailable()
      val (bf2, f2, md2, rt2, _) = sidecar(2)
      assert(md2 == model2.fingerprint, "round 2 must measure under the retrained model")
      assert(!rt2 && f2 < 1.3 * bf2, s"post-retrain round must be quiet: $bf2 -> $f2")
      // the manifest pin: a consumer still holding the OLD fingerprint must
      // fail LOUDLY against the store's new model — the swap is acknowledged,
      // never silent (TokenizerSpec's pin test, now through the loop)
      val e = intercept[IllegalArgumentException](
        TrainingSet.packSequencesBpe(zWave, model2, capTokens = 64,
          expectFingerprint = Some(model.fingerprint)))
      assert(e.getMessage.contains("fingerprint mismatch"))
    } finally q.stop()
  }

  test("active-model chain survives a monitor-only round after a retrain (ADVICE r12)") {
    // A retrained model followed by a bpeRetrainAt=0 (monitor-only) round
    // used to fall back to the SEED model: resolution and the forward-write
    // were both gated on bpeRetrainAt > 0. Every monitored round now
    // resolves the pointed-at snapshot's pair and re-pins it forward.
    import spark.implicits._
    import graft.operators.{Dedup, Tokenizer}
    def gDoc(s: Int) = (0 until 18).map(i => s"gw${(s * 7 + i * 3) % 40}").mkString(" ")
    def zDoc(s: Int) = (0 until 18).map(i => s"zq${(s * 5 + i * 11) % 40}yx").mkString(" ")
    val trained = (1 to 60).map(i => (500L + i, gDoc(i))).toDF("doc_id", "text")
    val model = Tokenizer.trainBpe(trained, numMerges = 60)
    val baseline = Tokenizer.bpeBaseline(trained, model, k = 20)
    val tmp = java.nio.file.Files.createTempDirectory("graft-crawl-bpe-chain").toString
    val base = Seq((900L, (0 until 18).map(i => s"basew$i").mkString(" ")))
      .toDF("doc_id", "text")
    StreamingOps.seedCrawlIndex(Dedup.buildIndex(base), s"$tmp/index")
    def md5At(v: Int): String = spark.read.parquet(s"$tmp/index/v$v/bpe_drift")
      .collect()(0).getAs[String]("bpe_model_md5")
    // rounds 0-1 under the retraining loop: round 1's swapped vocabulary trips
    val fnRetrain = StreamingOps.crawlIncrementBatchFn(s"$tmp/index", base,
      s"$tmp/accepted", bpeMonitor = Some((model, baseline)),
      bpeRetrainAt = 1.3, bpeNumMerges = 400)
    fnRetrain((1 to 15).map(i => (i.toLong, gDoc(i + 19))).toDF("doc_id", "text"), 0L)
    fnRetrain((1 to 15).map(i => (50L + i, zDoc(i))).toDF("doc_id", "text"), 1L)
    val model2 = Tokenizer.readBpeModel(spark, s"$tmp/index/v1/bpe_model")
    assert(model2.fingerprint != model.fingerprint, "round 1 must have retrained")
    // round 2: a MONITOR-ONLY loop (bpeRetrainAt = 0) over the same store —
    // it must measure under the RETRAINED model resolved from the pointer,
    // not the seed pair it was constructed with
    val fnMonitor = StreamingOps.crawlIncrementBatchFn(s"$tmp/index", base,
      s"$tmp/accepted", bpeMonitor = Some((model, baseline)), bpeRetrainAt = 0.0)
    fnMonitor((1 to 15).map(i => (70L + i, zDoc(i + 9))).toDF("doc_id", "text"), 2L)
    assert(md5At(2) == model2.fingerprint,
      "monitor-only round must measure under the store's active model, not the seed")
    // ...and it forwards the pair, so the chain holds for the round after it
    assert(Tokenizer.readBpeModel(spark, s"$tmp/index/v2/bpe_model")
      .fingerprint == model2.fingerprint, "monitor-only round must re-pin the active pair")
    fnMonitor((1 to 15).map(i => (90L + i, zDoc(i + 21))).toDF("doc_id", "text"), 3L)
    assert(md5At(3) == model2.fingerprint)
  }

  test("LR pre-gate rides the loop: active model resolves from the pointer, re-pins forward") {
    // the BPE pair's resolution rule applied to the fourth learned tier
    // (VERDICT r13 next #3): the seed serves until a snapshot carries
    // lr_model; after an operator re-train is written into the pointed
    // snapshot, every later round scores under the STORE's weights, not
    // the seed the loop was constructed with — and each round re-pins the
    // active model forward so the chain never breaks.
    import spark.implicits._
    import graft.operators.{Dedup, QualityModel}
    val tmp = java.nio.file.Files.createTempDirectory("graft-crawl-lr").toString
    val base = Seq((900L, "base corpus doc entirely unrelated words here today"))
      .toDF("doc_id", "text")
    StreamingOps.seedCrawlIndex(Dedup.buildIndex(base), s"$tmp/index")
    // z = −1 + 10·stopword_ratio: keeps stopword-rich prose, drops the rest
    val seed = QualityModel.LrModel(QualityModel.FeatureCols,
      IndexedSeq(-1.0, 0.0, 1.0, 0.0, 0.0))
    val fn = StreamingOps.crawlIncrementBatchFn(s"$tmp/index", base,
      s"$tmp/accepted", lrGate = Some(seed))
    // round 0 under the seed: 4/10 stopwords → σ(3) keeps; 0/10 → σ(−1) drops
    fn(Seq(
      (10L, "the cat of dog in mill at old stone for"),
      (11L, "zebra quartz wobble nimbus kelp vortex prism glyph ember xylem"))
      .toDF("doc_id", "text"), 0L)
    assert(spark.read.parquet(s"$tmp/accepted/batch=0")
      .select("doc_id").collect().map(_.getLong(0)).toSeq == Seq(10L))
    // the seed rode forward onto the round's snapshot
    assert(QualityModel.readLrModel(spark, s"$tmp/index/v0/lr_model")
      .fingerprint == seed.fingerprint)
    // operator re-train: sign-flipped gate written INTO the pointed snapshot
    val retrained = seed.copy(weights = IndexedSeq(1.0, 0.0, -1.0, 0.0, 0.0))
    QualityModel.writeLrModel(retrained, spark, s"$tmp/index/v0/lr_model")
    // round 1 must gate under the ACTIVE (retrained) model: now the
    // stopword-rich doc drops (σ(1−4) < 0.5) and the stopword-free keeps
    fn(Seq(
      (20L, "and hawk to crow that lynx it fox pine moss"),
      (21L, "falcon onyx timber raven maple cedar birch walnut aspen alder"))
      .toDF("doc_id", "text"), 1L)
    assert(spark.read.parquet(s"$tmp/accepted/batch=1")
      .select("doc_id").collect().map(_.getLong(0)).toSeq == Seq(21L),
      "round 1 must score under the store's retrained model, not the seed")
    // ...and the retrained model re-pins forward for the round after
    assert(QualityModel.readLrModel(spark, s"$tmp/index/v1/lr_model")
      .fingerprint == retrained.fingerprint)
  }

  test("search tier rides the loop: one shared store, O(delta) appends, round history via versions") {
    import spark.implicits._
    import graft.operators.Search
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("graft-crawl-search").toString
    val (root, out, ckpt) = (s"$tmp/index", s"$tmp/accepted", s"$tmp/ckpt")

    val docs = Tables.documents(spark, Sf)
    val base = docs.filter(col("doc_id") % 5 =!= 0).select("doc_id", "text")
    val delta1 = docs.filter(col("doc_id") % 20 === 0).select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    StreamingOps.seedCrawlIndex(Fixtures.dedupIndex(spark, Sf), root)

    val ms = MemoryStream[(Long, String)]
    val q = StreamingOps.crawlIncrementStream(
      ms.toDF().toDF("doc_id", "text"), root, base, out, ckpt, searchTier = true)
    try {
      // batch 0: tier enabled from the start -> one-time backfill of
      // base ∪ accepted; batch 1: a fresh doc carrying a marker token,
      // so the serve proof below must see THROUGH the grown postings
      ms.addData(delta1: _*)
      q.processAllAvailable()
      val fresh = ((0 until 19).map(i => s"streamfresh${i}x") :+ "needletok").mkString(" ")
      ms.addData((900002L, fresh))
      q.processAllAvailable()
    } finally q.stop()

    assert(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(root, "LATEST")), "UTF-8").trim == "v1")
    // ONE shared store (r16): batch 0 backfilled it, batch 1 APPENDED the
    // delta's postings (O(delta), never a second O(corpus) rewrite); the
    // committed version is tagged with the crawl round that wrote it
    val store = s"$root/search_index"
    assert(Search.currentSearchTag(store).contains("v1"))
    // the searchable corpus at the store's head IS base ∪ every accepted
    // clean_text — serve == a fresh scan of that union, bit-for-bit
    val acceptedAll = spark.read.parquet(s"$out/batch=0", s"$out/batch=1")
      .select(col("doc_id"), col("clean_text").as("text"))
    val corpus = base.unionByName(acceptedAll)
    val ix = Search.readSearchIndex(spark, store)
    for (qq <- Seq("needletok", "the data table", "streamfresh0x zz")) {
      val served = Search.bm25TopKIndexed(ix, qq, k = 10).collect().toSeq
      val scan = Search.bm25TopK(corpus, qq, k = 10).collect().toSeq
      assert(served == scan, s"store-head serve != corpus scan for '$qq'")
    }
    // the marker doc is findable exactly once, through the head postings
    val hit = Search.bm25TopKIndexed(ix, "needletok", k = 10).collect()
    assert(hit.length == 1 && hit(0).getLong(0) == 900002L)
    // round-0 history is the store's OWN retained version (keepVersions=2
    // keeps it): a reader pinned to crawl round 0 time-travels to v0,
    // which must NOT know the batch-1 marker
    val ix0 = Search.readSearchIndexAt(spark, store, "v0")
    assert(Search.bm25TopKIndexed(ix0, "needletok", k = 10).collect().isEmpty)
  }

  test("search tier soak: segments bounded by compactAt, dead versions collected, serve stays exact") {
    // VERDICT r15 next #3's done-criterion: a long-running crawl must keep
    // the store's live-segment count <= compactAt and collect superseded
    // versions WITHOUT operator intervention, while every round's serve
    // stays bit-identical to a fresh scan of the accepted corpus.
    import spark.implicits._
    import graft.operators.Search
    val tmp = java.nio.file.Files.createTempDirectory("graft-crawl-soak").toString
    val (root, out) = (s"$tmp/index", s"$tmp/accepted")
    val docs = Tables.documents(spark, Sf)
    val base = docs.filter(col("doc_id") % 5 =!= 0).select("doc_id", "text")
    StreamingOps.seedCrawlIndex(Fixtures.dedupIndex(spark, Sf), root)
    val fn = StreamingOps.crawlIncrementBatchFn(root, base, out,
      searchTier = true, searchCompactAt = 3)
    val store = s"$root/search_index"
    def segDirs = new java.io.File(store).list().toSeq.count(_.startsWith("seg-"))
    def verDirs = new java.io.File(store).list().toSeq.count(_.startsWith("v"))
    var corpus = base
    for (b <- 0 to 5) {
      // 12 distinct tokens: past the loop's 1/10 top-token repetition gate
      val fresh = (0 until 12).map(i => s"soak${b}tok$i").mkString(" ")
      val delta = Seq((900100L + b, fresh)).toDF("doc_id", "text")
      fn(delta, b.toLong)
      corpus = corpus.unionByName(delta) // PII-clean tokens: clean_text == text
      // live segments bounded by compactAt — the auto-trip keeps read
      // plans O(1) segments however long the loop runs
      assert(Search.searchIndexSegments(spark, store) <= 3,
        s"round $b: live segments past the compactAt bound")
      // prune(keepVersions=2) ran in-loop: at most 2 version dirs remain,
      // and on-disk segments are only those the kept manifests reference
      // (+ nothing orphaned): the store cannot grow with round count
      assert(verDirs <= 2, s"round $b: dead versions not collected ($verDirs)")
      assert(segDirs <= 4, s"round $b: dead segments not collected ($segDirs)")
      // serve == scan of base ∪ accepted-so-far, bit-for-bit, every round
      val served = Search.bm25TopKIndexed(
        Search.readSearchIndex(spark, store), s"soak${b}tok0 soak${b}tok11", k = 5)
        .collect().toSeq
      assert(served == Search.bm25TopK(corpus, s"soak${b}tok0 soak${b}tok11", k = 5)
        .collect().toSeq, s"round $b: soak serve != scan")
      assert(Search.currentSearchTag(store).contains(s"v$b"))
    }
  }

  test("search tier replay: a crash after the store commit but before the pointer flip cannot double-append") {
    // the TAG is the commit witness: rewinding the crawl pointer (the
    // crash window's state) and re-running the batch must see the append
    // already applied and skip it — without the guard the delta's postings
    // and the corpus stats would double, shifting every BM25 score.
    import spark.implicits._
    import graft.operators.Search
    val tmp = java.nio.file.Files.createTempDirectory("graft-crawl-replay").toString
    val (root, out) = (s"$tmp/index", s"$tmp/accepted")
    val docs = Tables.documents(spark, Sf)
    val base = docs.filter(col("doc_id") % 5 =!= 0).select("doc_id", "text")
    StreamingOps.seedCrawlIndex(Fixtures.dedupIndex(spark, Sf), root)
    val fn = StreamingOps.crawlIncrementBatchFn(root, base, out, searchTier = true)
    val store = s"$root/search_index"
    def doc(tag: String) = (0 until 11).map(i => s"$tag$i").mkString(" ") + " " + tag
    fn(Seq((900200L, doc("replaybase"))).toDF("doc_id", "text"), 0L)
    fn(Seq((900201L, doc("replayneedle"))).toDF("doc_id", "text"), 1L)
    val stats = Search.readSearchIndex(spark, store).stats.collect()(0)
    val served = Search.bm25TopKIndexed(
      Search.readSearchIndex(spark, store), "replayneedle replayneedle3", k = 10).collect().toSeq
    // simulate the crash window: the store committed batch 1 (tag v1) but
    // the crawl pointer still reads v0 — the checkpoint will replay batch 1
    graft.sources.StoreIO.writeStringAtomic(root, "LATEST", "v0")
    fn(Seq((900201L, doc("replayneedle"))).toDF("doc_id", "text"), 1L)
    val statsAfter = Search.readSearchIndex(spark, store).stats.collect()(0)
    assert(statsAfter.getLong(0) == stats.getLong(0) &&
      statsAfter.getLong(1) == stats.getLong(1),
      "replay doubled the corpus stats — the tag guard failed")
    assert(Search.bm25TopKIndexed(Search.readSearchIndex(spark, store),
      "replayneedle replayneedle3", k = 10).collect().toSeq == served,
      "replay changed the served scores")
    assert(Search.currentSearchTag(store).contains("v1"))
  }
}
