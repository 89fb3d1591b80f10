package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TrainingSet

/**
 * Training-set assembly operators: benchmark decontamination, context-window
 * packing, per-stratum quota sampling. Semantics on crafted corpora
 * (hand-traceable), invariance under partitioning (the distributed prefix
 * sum must not depend on where range boundaries fall), and the plan shapes
 * that carry the 100 TB claims.
 */
class TrainingSetSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  // ---- decontaminate ---------------------------------------------------------

  test("decontaminate flags exactly the docs sharing an n-gram with the benchmark") {
    val train = docs(
      1L -> "the quick brown fox jumps over the lazy dog",
      2L -> "completely unrelated text about spark catalyst internals",
      3L -> "a b c quick brown fox d e f") // shares "quick brown fox"
    val eval = docs(
      100L -> "quick brown fox trivia",
      101L -> "benchmark questions only")
    val out = TrainingSet.decontaminate(train, eval).orderBy("doc_id").collect()
    // eval's 3-grams: {"quick brown fox", "brown fox trivia", "fox trivia …",
    // "benchmark questions only"}; docs 1 and 3 each share exactly
    // "quick brown fox"; doc 2 shares nothing and must not appear
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 1L), (3L, 1L)))
  }

  test("decontaminate counts distinct shared n-grams per training doc") {
    val train = docs(1L -> "x quick brown fox trivia y")
    val eval = docs(100L -> "quick brown fox trivia")
    // train doc contains BOTH eval 3-grams: "quick brown fox", "brown fox trivia"
    val out = TrainingSet.decontaminate(train, eval).collect()
    assert(out.length == 1 && out.head.getLong(1) == 2L)
  }

  test("decontaminate: clean corpus and empty benchmark both yield zero rows") {
    val train = docs(1L -> "alpha beta gamma delta")
    assert(TrainingSet.decontaminate(train, docs(100L -> "one two three")).count() == 0)
    assert(TrainingSet.decontaminate(train, docs()).count() == 0)
    // sub-shingle-width docs can't participate on either side
    assert(TrainingSet.decontaminate(docs(1L -> "alpha beta"), docs(2L -> "alpha beta")).count() == 0)
  }

  test("decontaminate plan: benchmark side broadcasts, no cartesian") {
    val train = docs(1L -> "a b c d")
    val eval = docs(2L -> "b c d e")
    val p = TrainingSet.decontaminate(train, eval).queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast semi/inner join:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  // ---- packSequences ---------------------------------------------------------

  test("packSequences lays docs end-to-end with exact offsets and bins") {
    // token counts: 3, 5, 4, 2 — cap 4 → stream length 14, bins 0..3
    val d = docs(
      10L -> "a b c",          // [0,3)  bins 0..0
      20L -> "d e f g h",      // [3,8)  bins 0..1 (straddles)
      30L -> "i j k l",        // [8,12) bins 2..2
      40L -> "m n")            // [12,14) bins 3..3
    val out = TrainingSet.packSequences(d, capTokens = 4).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(out.toSeq == Seq(
      (10L, 3L, 0L, 0L, 0L, 1L),
      (20L, 5L, 3L, 0L, 1L, 2L),
      (30L, 4L, 8L, 2L, 2L, 1L),
      (40L, 2L, 12L, 3L, 3L, 1L)))
  }

  test("packSequences is invariant to input partitioning") {
    val base = (1L to 200L).map(i => (i, Seq.fill((i % 7 + 1).toInt)("tok").mkString(" ")))
    val expected = TrainingSet.packSequences(base.toDF("doc_id", "text").coalesce(1), 32)
      .orderBy("doc_id").collect().map(_.toSeq)
    for (parts <- Seq(3, 16)) {
      // adversarial layout: shuffled input order AND different partition counts
      val shuffled = scala.util.Random.shuffle(base).toDF("doc_id", "text").repartition(parts)
      val got = TrainingSet.packSequences(shuffled, 32)
        .orderBy("doc_id").collect().map(_.toSeq)
      assert(got.sameElements(expected), s"offsets changed under $parts partitions")
    }
  }

  test("packSequences totals: last doc's end offset equals the global token count") {
    val d = docs((1L to 50L).map(i => (i, ("w " * (i % 5 + 1).toInt).trim)): _*)
    val rows = TrainingSet.packSequences(d, 16).orderBy("doc_id").collect()
    val total = rows.map(_.getLong(1)).sum
    val last = rows.last
    assert(last.getLong(2) + last.getLong(1) == total)
    // offsets are dense: each start = previous start + previous n_tokens
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b.getLong(2) == a.getLong(2) + a.getLong(1))
    case _ => ()
    }
  }

  // ---- quotaSample -----------------------------------------------------------

  test("quotaSample equals the window-form rank on the same corpus") {
    val d = (1L to 120L).map(i => (i, s"text body number $i", s"lang${i % 3}"))
      .toDF("doc_id", "text", "lang")
    val got = TrainingSet.quotaSample(d, quota = 7).orderBy("lang", "rk").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy("lang").orderBy(md5(col("text")), col("doc_id"))
    val exp = d.withColumn("rk", row_number().over(win).cast("long"))
      .filter(col("rk") <= 7).select("lang", "rk", "doc_id").orderBy("lang", "rk")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.sameElements(exp))
    assert(got.length == 21 && got.count(_._1 == "lang0") == 7)
  }

  test("temperatureSample: quotas are ceil(scale·n^(q/4)), cuts match quotaSample's ranks") {
    // skewed mixture: 100 / 16 / 2 docs per lang
    val d = ((1L to 100L).map(i => (i, s"head doc $i", "en")) ++
      (201L to 216L).map(i => (i, s"mid doc $i", "de")) ++
      (301L to 302L).map(i => (i, s"tail doc $i", "zh")))
      .toDF("doc_id", "text", "lang")
    // α = 1/2: quotas by the operator's own nested-sqrt spelling —
    // sqrt(sqrt(100))² = 10.000000000000002 → ceil 11 (NOT 10: the spelled
    // arithmetic is the contract precisely so both engines agree on the
    // same integer), sqrt(sqrt(16))² = 4 exactly, and the 2-doc tail keeps
    // everything: the head is cut ~9×, the flattening property
    val got = TrainingSet.temperatureSample(d, alphaQuarters = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val sizes = got.groupBy(_._1).view.mapValues(_.length).toMap
    assert(sizes == Map("en" -> 11, "de" -> 4, "zh" -> 2), s"got $sizes")
    // the kept ids are exactly quotaSample's smallest-md5 ranks per stratum
    val viaQuota = TrainingSet.quotaSample(d, quota = 11)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .filter { case (l, rk, _) => rk <= Map("en" -> 11L, "de" -> 4L, "zh" -> 2L)(l) }
    assert(got.sorted.toSeq == viaQuota.sorted.toSeq)
    // α = 1/4 flattens harder: ceil(n^0.25) = 4 / 2 / 2
    val harder = TrainingSet.temperatureSample(d, alphaQuarters = 1)
      .collect().groupBy(_.getString(0)).view.mapValues(_.length).toMap
    assert(harder == Map("en" -> 4, "de" -> 2, "zh" -> 2), s"got $harder")
    // α = 1 (q=4) with scale 1 is the identity mixture
    val id = TrainingSet.temperatureSample(d, alphaQuarters = 4)
      .collect().groupBy(_.getString(0)).view.mapValues(_.length).toMap
    assert(id == Map("en" -> 100, "de" -> 16, "zh" -> 2), s"got $id")
  }

  test("temperatureSample: null strata ride the null-safe quota join; quota boundary guards") {
    // ADVICE r10: quotaSample RANKS a null stratum, but the quota equi-join
    // silently dropped it — the null-lang docs vanished while their quota
    // row sat unused. The null-safe join keeps them bounded like any other
    // stratum.
    val d = (Seq((1L, "a"), (2L, "b"), (3L, "c")).map { case (i, t) => (i, t, "en") } ++
      Seq((10L, "x", null), (11L, "y", null), (12L, "z", null), (13L, "w", null)))
      .toDF("doc_id", "text", "lang")
    val got = TrainingSet.temperatureSample(d, alphaQuarters = 2)
      .collect().map(r => (Option(r.getString(0)), r.getLong(2)))
    // quotas by the spelled nested-sqrt arithmetic: en n=3 →
    // ceil(sqrt(sqrt(3))²) = ceil(1.7320508…) = 2; null n=4 →
    // ceil(sqrt(sqrt(4))²) = ceil(2.0000000000000004) = 3 (the IEEE product
    // overshoots the exact 2 by one ulp — the spelling IS the contract)
    assert(got.count(_._1.isEmpty) == 3, s"null stratum must keep its quota: ${got.toSeq}")
    assert(got.count(_._1.contains("en")) == 2)
    // the Int boundary guard (ADVICE r10): a > 2^31 quota cannot seat a
    // bounded bottom-k buffer — refuse with the threshold-form pointer
    // instead of overflowing to a negative quota
    val e = intercept[IllegalArgumentException](
      TrainingSet.boundedQuota(Int.MaxValue.toLong + 1))
    assert(e.getMessage.contains("hash-threshold"))
    assert(TrainingSet.boundedQuota(Int.MaxValue.toLong) == Int.MaxValue)
    assert(TrainingSet.boundedQuota(7L) == 7)
  }

  test("quotaSample: quota above stratum size returns the whole stratum, ranked") {
    val d = docs(1L -> "aa", 2L -> "bb", 3L -> "cc").withColumn("lang", lit("en"))
    val out = TrainingSet.quotaSample(d, quota = 50).collect()
    assert(out.length == 3 && out.map(_.getLong(1)).sorted.sameElements(Array(1L, 2L, 3L)))
  }

  test("quotaSample: duplicate texts tie-break by ascending id, deterministically") {
    val d = docs(5L -> "same text", 3L -> "same text", 9L -> "same text")
      .withColumn("lang", lit("en"))
    val out = TrainingSet.quotaSample(d, quota = 2).orderBy("rk").collect()
    assert(out.map(_.getLong(2)).toSeq == Seq(3L, 5L))
  }

  test("null text: packing treats it as empty, sampling ranks it, dedup drops it") {
    val d = Seq((1L, "a b c"), (2L, null), (3L, "d e")).toDF("doc_id", "text")
    val packed = TrainingSet.packSequences(d, 4).orderBy("doc_id").collect()
    // null → tokens("") = [""] → 1 token; later docs' offsets stay exact
    assert(packed.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq((1L, 3L, 0L), (2L, 1L, 3L), (3L, 2L, 4L)))
    val sampled = TrainingSet.quotaSample(d.withColumn("lang", lit("en")), 10).collect()
    assert(sampled.length == 3) // the null-text doc is ranked, not dropped
    // decontaminate: nulls fail the size(tokens) >= n guard on either side
    assert(TrainingSet.decontaminate(d, d.filter(col("doc_id") === 2L)).count() == 0)
  }

  test("packSequences invariants hold on random corpora at random parallelism") {
    // randomized corpus shapes (sizes, token counts, partition counts) — the
    // invariants, not examples: offsets are a dense chain in id order, every
    // bin interval is consistent, and the stream total matches
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 5) {
      val n = 1 + rnd.nextInt(300)
      val cap = 1 + rnd.nextInt(64)
      val parts = 1 + rnd.nextInt(8)
      val corpus = (1 to n).map { i =>
        (i.toLong, Seq.fill(1 + rnd.nextInt(20))("w" + rnd.nextInt(50)).mkString(" "))
      }
      val rows = TrainingSet.packSequences(
        rnd.shuffle(corpus).toDF("doc_id", "text").repartition(parts), cap)
        .orderBy("doc_id").collect()
      assert(rows.length == n, s"trial $trial")
      var expectStart = 0L
      rows.foreach { r =>
        val (nTok, start, binS, binE, nBins) =
          (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
        assert(start == expectStart, s"trial $trial: offset chain broken at ${r.getLong(0)}")
        assert(binS == start / cap && binE == (start + nTok - 1) / cap &&
          nBins == binE - binS + 1, s"trial $trial: bin arithmetic")
        expectStart += nTok
      }
    }
  }

  test("buildTrainingSet: every stage drops exactly its targets, survivors pack densely") {
    def doc(id: Long, text: String) =
      (id, text, text.length.toLong, "en")
    val long = (tag: String) => // 12 distinct tokens, > minTokens and > decon width
      (1 to 12).map(i => s"$tag$i").mkString(" ")
    // doc 6 shares exactly tokens e1..e5 with the benchmark doc: one shared
    // 5-gram (contaminated) but 3-gram jaccard 3/17 < 1/2 (NOT a near-dup
    // pair), so doc 20 reaches stage 4 and ONLY the benchmark anti-join can
    // exclude it — deleting that stage fails this test
    val partial = (1 to 5).map(i => s"e$i").mkString(" ") + " " +
      (6 to 12).map(i => s"f$i").mkString(" ")
    val corpus = Seq(
      doc(1L, long("a")),            // survivor
      doc(2L, long("a")),            // exact dup of 1 → dropped (stage 1)
      doc(3L, long("b")),            // survivor
      doc(4L, long("b").replace("b12", "zz")), // near-dup of 3 (11/12 tokens) → dropped (stage 2)
      doc(5L, "tiny"),               // fails quality gate → dropped (stage 3)
      doc(20L, long("e")),           // benchmark id (20 % 20 == 0) → excluded (stage 4)
      doc(6L, partial),              // shares a benchmark 5-gram → dropped (stage 4)
      doc(7L, long("g"))             // survivor
    ).toDF("doc_id", "text", "n_chars", "lang")
    val bench = corpus.filter(col("doc_id") % 20 === 0)
    val out = TrainingSet.buildTrainingSet(corpus, bench, capTokens = 8)
      .orderBy("doc_id").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 3L, 7L), out.mkString(", "))
    // packing: 12 tokens per survivor, laid end-to-end, cap 8
    assert(out.map(r => (r.getLong(2), r.getLong(3), r.getLong(4))).toSeq ==
      Seq((12L, 0L, 0L), (12L, 12L, 1L), (12L, 24L, 3L)))
  }

  test("buildTrainingSetV2: DSIR, mixture, quota cap and BPE pricing each bite; model pinned") {
    import graft.operators.{BpeModel, Corpus}
    def doc(id: Long, text: String, lang: String = "en") =
      (id, text, text.length.toLong, lang)
    val long = (tag: String) => (1 to 12).map(i => s"$tag$i").mkString(" ")
    val partial = (1 to 5).map(i => s"e$i").mkString(" ") + " " +
      (6 to 12).map(i => s"f$i").mkString(" ")
    // stages 1–4 planted exactly as the V1 test; PLUS a raw-vocab junk doc
    // (stage 5's target) and a 30-doc "xx" herd (stage 6's target: mixture
    // t = ceil(sqrt(sqrt(30))²) = 6, then the hard cap 4 < 6 bites on top)
    val junkId = 9L
    val herd = (101L to 130L).map(i => doc(i, long(s"h${i}x"), lang = "xx"))
    val corpus = (Seq(
      doc(1L, long("a")), doc(2L, long("a")), // exact dup → stage 1
      doc(3L, long("b")),
      doc(4L, long("b").replace("b12", "zz")), // near-dup → stage 2
      doc(5L, "tiny"), // quality gate → stage 3
      doc(20L, long("e")), doc(6L, partial), // benchmark + contaminated → stage 4
      doc(7L, long("g")),
      doc(junkId, long("j")) // target-unseen vocabulary → DSIR (stage 5)
    ) ++ herd).toDF("doc_id", "text", "n_chars", "lang")
    val bench = corpus.filter(col("doc_id") % 20 === 0)
    // frozen models: TARGET speaks the clean vocabulary (junk words unseen
    // → every token scores the unseen ladder), RAW speaks everything
    val target = Corpus.trainLmModel(corpus.filter(col("doc_id") =!= junkId))
    val raw = Corpus.trainLmModel(corpus)
    // empty-merge BPE: every word prices at (codepoints + 1) subwords — the
    // BPE count visibly diverges from the whitespace count
    val bpe = BpeModel(IndexedSeq())
    val out = TrainingSet.buildTrainingSetV2(corpus, bench, target, raw, bpe,
      capTokens = 16, quotaPerStratum = 4,
      bpeFingerprint = Some(bpe.fingerprint))
      .orderBy("doc_id").collect()
    val ids = out.map(_.getLong(0)).toSeq
    // stage 5: the junk doc survives stages 1–4 by construction but its
    // negative per-token advantage fails the md5 acceptance draw
    val d4 = corpus.filter(col("doc_id").isin((Seq(1L, 3L, 7L, junkId) ++
      herd.map(_._1)): _*))
    val keep5 = Corpus.dsirSelect(d4, target, raw)
      .filter(col("keep")).collect().map(_.getLong(0)).toSet
    assert(!keep5.contains(junkId), "target-unseen junk must fail DSIR steering")
    assert(!ids.contains(junkId))
    // stage 6 over the DSIR survivors: en (n=3 → t=2 < cap: the MIXTURE
    // bites), xx (t=6 > cap 4: the CAP bites) — expected set via the
    // standalone sampler at min(t, cap) per stratum
    val d5 = d4.join(keep5.toSeq.toDF("doc_id"), Seq("doc_id"), "left_semi")
    val expected = TrainingSet.temperatureSample(d5, alphaQuarters = 2)
      .filter(col("rk") <= 4).collect().map(_.getLong(2)).sorted.toSeq
    assert(ids == expected, s"got $ids, want $expected")
    assert(ids.count(_ >= 101L) == 4, "the hard cap must cut the herd to 4")
    assert(ids.count(_ < 101L) == 2, "the mixture must cut en from 3 to 2")
    // stage 7: offsets chain by the BPE counts in id order (NOT whitespace)
    val texts = corpus.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    var off = 0L
    out.foreach { r =>
      val nBpe = bpe.countTokens(texts(r.getLong(0)))
      assert(r.getLong(2) == nBpe && r.getLong(3) == off,
        s"doc ${r.getLong(0)}: (${r.getLong(2)}, ${r.getLong(3)}) vs ($nBpe, $off)")
      assert(nBpe > texts(r.getLong(0)).split("\\s+").length,
        "BPE pricing must differ from the whitespace count here")
      off += nBpe
    }
    // the model pin: a swapped model against the recorded fingerprint fails
    val other = BpeModel(IndexedSeq(("a", "1")))
    val e = intercept[IllegalArgumentException](
      TrainingSet.buildTrainingSetV2(corpus, bench, target, raw, other,
        capTokens = 16, bpeFingerprint = Some(bpe.fingerprint)))
    assert(e.getMessage.contains("fingerprint mismatch"))
  }

  test("buildTrainingSetV2 wholeDoc: same selection, fold placement, no straddles, stamp rides") {
    import graft.operators.{BpeModel, Corpus}
    def doc(id: Long, text: String, lang: String = "en") =
      (id, text, text.length.toLong, lang)
    val long = (tag: String) => (1 to 12).map(i => s"$tag$i").mkString(" ")
    val corpus = ((1L to 8L).map(i => doc(i, long(s"w$i"))) ++
      (101L to 110L).map(i => doc(i, long(s"h${i}x"), lang = "xx")))
      .toDF("doc_id", "text", "n_chars", "lang")
    val bench = corpus.filter(col("doc_id") % 20 === 0)
    val target = Corpus.trainLmModel(corpus)
    val bpe = BpeModel(IndexedSeq())
    // empty-merge BPE prices each 12-word doc at (codepoints+1)/word ≈ 60-90
    // tokens; the cap seats every doc but never two herd docs — rollovers fire
    val cap = 128L
    val chunk = TrainingSet.buildTrainingSetV2(corpus, bench, target, target, bpe,
      capTokens = cap, quotaPerStratum = 4).orderBy("doc_id").collect()
    val whole = TrainingSet.buildTrainingSetV2(corpus, bench, target, target, bpe,
      capTokens = cap, quotaPerStratum = 4, wholeDoc = true).orderBy("doc_id")
    // the twin stamps the model identity on its n_tokens like the chunk form
    assert(graft.operators.Tokenizer.stampedFingerprint(whole, "n_tokens")
      .contains(bpe.fingerprint))
    val w = whole.collect()
    // stages 1-6 are shared: identical selection, strata and BPE pricing
    assert(w.map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq ==
      chunk.map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq)
    // the placement IS the sequential no-straddle fold over those counts
    val counts = w.map(r => (r.getLong(0), r.getLong(2))).toSeq
    assert(w.map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq ==
      wholeFold(counts, cap))
    w.foreach(r => assert(r.getLong(4) + r.getLong(2) <= cap,
      s"doc ${r.getLong(0)} straddles the bin boundary"))
    // the fold genuinely rolls over at this cap (the invariant bites)
    assert(w.map(_.getLong(3)).distinct.length > 1, "expected multiple bins")
  }

  test("buildTrainingSet: empty and sub-threshold corpora return empty, never crash") {
    val empty = Seq.empty[(Long, String, Long, String)]
      .toDF("doc_id", "text", "n_chars", "lang")
    assert(TrainingSet.buildTrainingSet(empty, empty).count() == 0)
    // every doc fails the quality gate → empty survivors through all stages
    val tiny = Seq((1L, "a b", 3L, "en"), (2L, "c d", 3L, "en"))
      .toDF("doc_id", "text", "n_chars", "lang")
    assert(TrainingSet.buildTrainingSet(tiny, tiny.limit(0)).count() == 0)
  }

  test("quotaSample plan: bounded aggregate, no window exchange-and-sort per row") {
    val d = docs(1L -> "a", 2L -> "b").withColumn("lang", lit("en"))
    val p = TrainingSet.quotaSample(d, 5).queryExecution.executedPlan.toString
    assert(!p.contains("Window"), s"quota sampling must not use a window:\n$p")
    assert(p.contains("ObjectHashAggregate") || p.contains("SortAggregate"),
      s"expected a (partial/final) aggregate carrying the bottom-k buffer:\n$p")
  }

  // ---- packSequencesWhole ------------------------------------------------------

  /** The operator's spec in four lines: the single-threaded fold it must equal. */
  private def wholeFold(byId: Seq[(Long, Long)], cap: Long): Seq[(Long, Long, Long, Long)] = {
    var bin = 0L; var f = 0L
    byId.sortBy(_._1).map { case (id, n) =>
      if (f + n > cap) { bin += 1L; f = 0L }
      val off = f; f += n; (id, n, bin, off)
    }
  }

  /** Run `body` with AQE partition coalescing off and `parts` shuffle
   * partitions, so repartitionByRange genuinely produces `parts` sorted
   * ranges — tiny test frames must not collapse to one partition and hide
   * a broken cross-partition fold. */
  private def atParallelism[T](parts: Int)(body: => T): T = {
    val conf = spark.conf
    val oldP = conf.get("spark.sql.shuffle.partitions")
    val oldC = conf.get("spark.sql.adaptive.coalescePartitions.enabled", "true")
    conf.set("spark.sql.shuffle.partitions", parts.toString)
    conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try body finally {
      conf.set("spark.sql.shuffle.partitions", oldP)
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", oldC)
    }
  }

  test("packSequencesWhole: no doc straddles, remainder is padding, hand-traceable") {
    // counts 3, 5, 4, 2 — cap 6: doc10 → bin0@0; doc20 (3+5>6) rolls → bin1@0;
    // doc30 (5+4>6) rolls → bin2@0; doc40 (4+2=6 fits EXACTLY) → bin2@4
    val d = docs(10L -> "a b c", 20L -> "d e f g h", 30L -> "i j k l", 40L -> "m n")
    val out = TrainingSet.packSequencesWhole(d, capTokens = 6).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq((10L, 3L, 0L, 0L), (20L, 5L, 1L, 0L),
      (30L, 4L, 2L, 0L), (40L, 2L, 2L, 4L)))
  }

  test("packSequencesWhole: ADVICE r11 regression — rollover trajectory re-counts the rolling doc") {
    // the exact counterexample from the finding: cap=16, id-ordered counts
    // [5,7,2, 16,15,10,14, 2,3,16,13] split across 3 range partitions; the
    // buggy binsFrom(x) = binsFromAll(x+1)+1 made partition 3 reuse bin ids
    // 3–4 and two bins then exceeded capTokens
    val ns = Seq(5L, 7L, 2L, 16L, 15L, 10L, 14L, 2L, 3L, 16L, 13L)
    val rows = ns.zipWithIndex.map { case (n, i) => (i.toLong, n) }
    val expected = wholeFold(rows, 16L)
    for (parts <- Seq(1, 2, 3, 4)) {
      val got = atParallelism(parts) {
        TrainingSet.packSequencesWhole(
          scala.util.Random.shuffle(rows).toDF("doc_id", "n"),
          capTokens = 16L, tokenCount = Some(col("n")))
          .orderBy("doc_id").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
      }
      assert(got == expected, s"parts=$parts")
    }
  }

  test("packSequencesWhole equals the sequential fold on random corpora at random parallelism") {
    val rnd = new scala.util.Random(1708)
    for (trial <- 1 to 12) {
      val n = 1 + rnd.nextInt(300)
      val cap = 4L + rnd.nextInt(60)
      val parts = 1 + rnd.nextInt(7)
      // counts in [0, cap] — includes exact-fit and zero-token edge cases
      val rows = (0 until n).map(i => (i.toLong, rnd.nextLong(cap + 1)))
      val expected = wholeFold(rows, cap)
      val got = atParallelism(parts) {
        TrainingSet.packSequencesWhole(
          rnd.shuffle(rows).toDF("doc_id", "n"), cap, tokenCount = Some(col("n")))
          .orderBy("doc_id").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
      }
      assert(got == expected, s"trial $trial: n=$n cap=$cap parts=$parts")
      // the core invariants, independently of the fold: never straddles,
      // bins fill densely in id order
      got.foreach { case (id, nt, _, off) =>
        assert(off + nt <= cap, s"trial $trial: doc $id straddles") }
      got.groupBy(_._3).foreach { case (b, ds) =>
        assert(ds.map(_._2).sum <= cap, s"trial $trial: bin $b overfull") }
    }
  }

  test("packSequencesBpe wholeDoc: no-straddle under the model's own counts, identity stamped, pin enforced") {
    import graft.operators.Tokenizer
    val d = docs(1L -> "aa ab aa ab aa", 2L -> "aa aa ab", 3L -> "zz yy xx ww aa",
      4L -> "aa zz", 5L -> "ab ab zz yy")
    val model = Tokenizer.trainBpe(d, numMerges = 8)
    val counts = Tokenizer.bpeTokenCounts(d, model)
      .select("doc_id", "n_bpe_tokens").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val cap = counts.map(_._2).max + 1 // forces several rollovers, every doc fits
    val out = TrainingSet.packSequencesBpe(d, model, cap, wholeDoc = true)
      .orderBy("doc_id")
    assert(Tokenizer.stampedFingerprint(out, "n_tokens") == Some(model.fingerprint),
      "whole-doc form must stamp the model identity like the chunk form")
    assert(Tokenizer.stampedFingerprint(out) == None,
      "missing count column means no stamp, not an analyzer error")
    val got = out.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == wholeFold(counts, cap),
      "whole-doc BPE packing must equal the sequential fold over the model's counts")
    val e = intercept[IllegalArgumentException](
      TrainingSet.packSequencesBpe(d, model, cap, wholeDoc = true,
        expectFingerprint = Some("not-the-model")))
    assert(e.getMessage.contains("fingerprint mismatch"))
  }

  test("packSequencesWhole: zero-count docs pack in place at any partitioning (ADVICE r12)") {
    // zeros can never roll a bin over (f + 0 > cap is impossible), so they
    // seat at the current fill; the pass-1 summary skips them to keep its
    // O(min(positive docs, cap)) bound — leading zero runs in a partition
    // are exactly the shape that used to degrade it
    val cap = 10L
    val rows = Seq(1L -> 0L, 2L -> 4L, 3L -> 0L, 4L -> 7L, 5L -> 0L,
      6L -> 0L, 7L -> 3L, 8L -> 6L, 9L -> 0L, 10L -> 2L)
    val expected = wholeFold(rows, cap)
    for (parts <- Seq(1, 3, 5)) {
      val got = atParallelism(parts) {
        TrainingSet.packSequencesWhole(rows.toDF("doc_id", "n"), cap,
            tokenCount = Some(col("n")))
          .orderBy("doc_id").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
      }
      assert(got == expected, s"parts=$parts: $got")
    }
  }

  test("packingStats: bin report equals the hand-computed fold summary") {
    // counts 4,7,3,6,2 at cap 10 fold to bins [4+3+2=9... ] — trace:
    // 4 → bin0(4); 7 rolls → bin1(7); 3 fits → bin1(10); 6 rolls → bin2(6);
    // 2 fits → bin2(8). Bins: fills 4, 10, 8 — 3 bins, 22 tokens, 8 wasted.
    val d = Seq(1L -> 4L, 2L -> 7L, 3L -> 3L, 4L -> 6L, 5L -> 2L)
      .toDF("doc_id", "n")
    val packed = TrainingSet.packSequencesWhole(d, 10L, tokenCount = Some(col("n")))
    val r = TrainingSet.packingStats(packed, 10L).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5)) == ((3L, 5L, 22L, 4L, 10L, 8L)))
    // invariant at any input: wasted = n_bins × cap − total
    assert(r.getLong(5) == 3L * 10L - r.getLong(2))
  }

  test("assignShards: documented mix formula, bin-constancy, range, determinism") {
    val d = Seq((1L, 5L, 0L, 0L), (2L, 4L, 0L, 5L), (3L, 9L, 1L, 0L),
      (4L, 2L, 2L, 0L), (5L, 7L, 2L, 2L))
      .toDF("doc_id", "n_tokens", "bin_id", "bin_offset")
    val out = TrainingSet.assignShards(d, nShards = 16, seed = 42L)
      .orderBy("doc_id").collect()
    // the documented formula, replayed in plain Long arithmetic (every
    // intermediate < 2^63 by construction — this is the same claim the
    // DuckDB oracle relies on)
    def expect(bin: Long): Long = {
      val h1 = ((bin % 2147483648L) * 2654435761L + 42L) % 4294967296L
      val h2 = ((h1 % 2147483648L) * 2246822519L + (h1 >> 16)) % 4294967296L
      h2 % 16L
    }
    out.foreach { r =>
      assert(r.getAs[Long]("shard_id") == expect(r.getAs[Long]("bin_id")))
      assert(r.getAs[Long]("shard_id") >= 0L && r.getAs[Long]("shard_id") < 16L)
    }
    // docs 4 and 5 share bin 2 → same shard; determinism; seed sensitivity
    assert(out(3).getAs[Long]("shard_id") == out(4).getAs[Long]("shard_id"))
    val again = TrainingSet.assignShards(d, 16, 42L).orderBy("doc_id")
      .select("shard_id").collect().map(_.getLong(0)).toSeq
    assert(again == out.map(_.getAs[Long]("shard_id")).toSeq)
    val other = TrainingSet.assignShards(d, 16, 43L).orderBy("doc_id")
      .select("shard_id").collect().map(_.getLong(0)).toSeq
    assert(other != again, "a different seed must move at least one bin")
  }

  test("assignShards scatters id-adjacent bins: 1000 bins cover all 16 shards") {
    val bins = (0L until 1000L).map(b => (b, b, 100L, 0L))
      .toDF("doc_id", "bin_id", "n_tokens", "bin_offset")
    val fills = TrainingSet.assignShards(bins, nShards = 16, seed = 42L)
      .groupBy("shard_id").count().collect()
      .map(r => r.getAs[Long]("shard_id") -> r.getAs[Long]("count")).toMap
    assert(fills.keySet == (0L until 16L).toSet, "every shard must be hit")
    // deterministic input + deterministic hash: uniformity here is a fixed
    // fact, pinned loosely (mean 62.5 bins/shard; a broken mixer that
    // stripes or collapses violates this immediately)
    assert(fills.values.max <= 2 * fills.values.min,
      s"shard fills too skewed: $fills")
  }

  test("shardManifest conserves docs and tokens and counts distinct bins") {
    val d = Seq(1L -> 4L, 2L -> 7L, 3L -> 3L, 4L -> 6L, 5L -> 2L)
      .toDF("doc_id", "n")
    val packed = TrainingSet.packSequencesWhole(d, 10L, tokenCount = Some(col("n")))
    val m = TrainingSet.shardManifest(TrainingSet.assignShards(packed, 4, 7L))
    val rows = m.collect()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == 5L)
    assert(rows.map(_.getAs[Long]("n_tokens")).sum == 22L)
    // the fold makes 3 bins (fills 4, 10, 8) — distinct-bin counts add to 3
    assert(rows.map(_.getAs[Long]("n_bins")).sum == 3L)
  }

  test("writeShards: shard-partitioned layout prunes at the directory level") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-shards").toString
    val d = (1L to 40L).map(i => (i, 5L, i / 2, 0L))
      .toDF("doc_id", "n_tokens", "bin_id", "bin_offset")
    val assigned = TrainingSet.assignShards(d, nShards = 4, seed = 42L)
    graft.sources.Sinks.writeShards(assigned, tmp)
    // a worker's read of its own shard: identical rows, and the scan's
    // partition filter prunes the other directories before any IO
    // partition-column read-back infers int — compare through a long cast
    val mine = spark.read.parquet(tmp)
      .withColumn("shard_id", col("shard_id").cast("long"))
      .filter(col("shard_id") === 2L)
    val expect = assigned.filter(col("shard_id") === 2L)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(mine.collect().map(_.getAs[Long]("shard_id")).forall(_ == 2L))
    assert(mine.collect().map(r => (r.getLong(0), r.getLong(2))).toSet == expect)
    val plan = mine.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("shard_id"),
      s"shard read must prune partitions:\n$plan")
    // the launcher's sidecar equals a fresh rollup
    val manifest = spark.read.parquet(s"$tmp/_manifest")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val fresh = TrainingSet.shardManifest(assigned)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(manifest == fresh && manifest.toSeq.map(_._3).sum == 40L)
  }

  test("mixtureBudget: integer targets, ceil epochs, null on an empty stratum") {
    val report = Seq(("en", 100L), ("fr", 50L), ("emptylang", 0L))
      .toDF("lang", "total_tokens")
    val weights = Seq(("en", 3L), ("fr", 1L), ("emptylang", 4L)).toDF("lang", "weight")
    val out = TrainingSet.mixtureBudget(report, weights, budgetTokens = 1000L)
      .orderBy("lang").collect()
    // Σw = 8: en target 1000·3/8 = 375, epochs ceil(375/100) = 4 (the
    // over-repetition flag); fr target 125, epochs 3; empty stratum gets its
    // target but null epochs (nothing to repeat)
    val m = out.map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) -1L else r.getLong(4))).toMap
    assert(m("en") == ((100L, 3L, 375L, 4L)))
    assert(m("fr") == ((50L, 1L, 125L, 3L)))
    assert(m("emptylang") == ((0L, 4L, 500L, -1L)))
    // conservation: targets never exceed the budget in total
    assert(out.map(_.getLong(3)).sum <= 1000L)
  }

  test("budgetedSample equals the window-form prefix on random corpora") {
    val rnd = new scala.util.Random(4242)
    for (trial <- 1 to 3) {
      val n = 200 + rnd.nextInt(200)
      val rows = (1L to n).map { i =>
        val k = 1 + rnd.nextInt(12)
        (i, s"l${rnd.nextInt(3)}", (1 to k).map(j => s"t${rnd.nextInt(40)}").mkString(" "))
      }
      val docs = rows.toDF("doc_id", "lang", "text").repartition(1 + rnd.nextInt(7))
      val targets = Seq(("l0", 120L), ("l1", 60L), ("l2", 1L)).toDF("lang", "target_tokens")
      val got = TrainingSet.budgetedSample(docs, targets, bucketChars = 1)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      // reference: the definition, as one window per stratum
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("lang").orderBy("rk", "doc_id")
      val expect = docs.select(col("lang"), col("doc_id"),
          md5(col("text")).as("rk"),
          size(split(lower(trim(col("text"))), "\\s+")).cast("long").as("n"))
        .withColumn("cum", sum("n").over(w))
        .join(targets, "lang")
        .filter(col("cum") - col("n") < col("target_tokens"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      assert(got == expect, s"trial $trial: two-level cut must equal the window form")
      assert(got.nonEmpty)
    }
  }

  test("budgetedSample: overshoot ≤ 1 doc, target ≥ avail keeps all, absent stratum drops") {
    val docs = (1L to 30L).map(i => (i, if (i <= 20) "a" else "b",
      Seq.fill(5)("w").mkString(" "))).toDF("doc_id", "lang", "text")
    // a: avail 100, target 23 → minimal prefix = 5 docs (25 tokens, last doc
    // crosses); b: target 9999 ≥ avail 50 → all 10 docs; "c" has no target
    val targets = Seq(("a", 23L), ("b", 9999L)).toDF("lang", "target_tokens")
    val out = TrainingSet.budgetedSample(docs, targets)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val a = out.filter(_._1 == "a")
    assert(a.length == 5 && a.map(_._3).sum == 25L, s"minimal crossing prefix: $a")
    assert(out.count(_._1 == "b") == 10)
    // zero-target stratum: nothing qualifies (cum_before < 0 is impossible)
    val zt = TrainingSet.budgetedSample(docs,
      Seq(("a", 0L)).toDF("lang", "target_tokens")).count()
    assert(zt == 0L)
  }

  test("budgetIncrement: two rounds equal the sequential window replay; ledger exact") {
    val rnd = new scala.util.Random(1313)
    val rows = (1L to 300L).map { i =>
      val k = 1 + rnd.nextInt(9)
      (i, s"l${rnd.nextInt(3)}", (1 to k).map(_ => s"t${rnd.nextInt(30)}").mkString(" "))
    }
    val docs = rows.toDF("doc_id", "lang", "text").repartition(5)
    val targets = Seq(("l0", 150L), ("l1", 90L), ("l2", 40L)).toDF("lang", "target_tokens")
    val (d1, d2) = (docs.filter($"doc_id" % 2 === 0), docs.filter($"doc_id" % 2 =!= 0))
    val (s1, c1) = TrainingSet.budgetIncrement(d1, targets,
      TrainingSet.emptyBudgetConsumed(spark))
    val (s2, c2) = TrainingSet.budgetIncrement(d2, targets, c1)
    // reference: the definition — per-round md5-rank running sums, round 2
    // cut at target minus round 1's acceptance
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("lang").orderBy("rk", "doc_id")
    def ranked(d: org.apache.spark.sql.DataFrame) = d.select(col("lang"), col("doc_id"),
        md5(col("text")).as("rk"),
        size(split(lower(trim(col("text"))), "\\s+")).cast("long").as("n"))
      .withColumn("cum", sum("n").over(w))
    val e1 = ranked(d1).join(targets, "lang")
      .filter(col("cum") - col("n") < col("target_tokens"))
    val used = e1.groupBy("lang").agg(sum("n").as("used"))
    val e2 = ranked(d2).join(targets, "lang").join(used, Seq("lang"), "left")
      .filter(col("cum") - col("n") < col("target_tokens") - coalesce(col("used"), lit(0L)))
    def ids(d: org.apache.spark.sql.DataFrame) =
      d.select("lang", "doc_id").collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(ids(s1) == ids(e1) && ids(s2) == ids(e2),
      "each round must equal its window-form cut at the remaining budget")
    // the ledger is the exact acceptance sum, both rounds
    val led = c2.collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val sums = (s1.unionByName(s2)).groupBy("lang").agg(sum("n_tokens"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(led == sums, s"ledger $led vs acceptance $sums")
  }

  test("budgetIncrement: exhausted stratum accepts nothing; overshoot bounded per round") {
    val docs = (1L to 20L).map(i => (i, "a", Seq.fill(10)("w").mkString(" ")))
      .toDF("doc_id", "lang", "text")
    val targets = Seq(("a", 25L)).toDF("lang", "target_tokens")
    val (s1, c1) = TrainingSet.budgetIncrement(
      docs.filter($"doc_id" <= 10), targets, TrainingSet.emptyBudgetConsumed(spark))
    // 10-token docs vs target 25: minimal crossing prefix = 3 docs (30 tokens)
    assert(s1.count() == 3L)
    assert(c1.collect().head.getLong(1) == 30L)
    // consumed 30 ≥ 25: round 2 must accept zero and leave the ledger alone
    val (s2, c2) = TrainingSet.budgetIncrement(
      docs.filter($"doc_id" > 10), targets, c1)
    assert(s2.count() == 0L)
    assert(c2.collect().head.getLong(1) == 30L)
  }

  test("materializeEpochs: full epochs + fractional prefix, hand-computed") {
    // a: 4 docs × 5 tokens = 20 avail, target 52 → 2 full epochs + rem 12
    //    → partial epoch 3 keeps the 3-doc minimal prefix (15 tokens)
    // b: 3 docs × 4 tokens = 12 avail, target 9 < avail → epoch 1 only,
    //    and it must equal budgetedSample at the same target
    val docs = ((1L to 4L).map(i => (i, "a", Seq.fill(5)("w").mkString(" "))) ++
      (5L to 7L).map(i => (i, "b", Seq.fill(4)("w").mkString(" "))))
      .toDF("doc_id", "lang", "text")
    val targets = Seq(("a", 52L), ("b", 9L)).toDF("lang", "target_tokens")
    val out = TrainingSet.materializeEpochs(docs, targets)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val a = out.filter(_._1 == "a")
    assert(a.count(_._3 == 1L) == 4 && a.count(_._3 == 2L) == 4)
    val a3 = a.filter(_._3 == 3L)
    assert(a3.length == 3 && a3.map(_._4).sum == 15L, s"fractional epoch: ${a3.toSeq}")
    val b = out.filter(_._1 == "b")
    assert(b.forall(_._3 == 1L))
    val bs = TrainingSet.budgetedSample(docs, Seq(("b", 9L)).toDF("lang", "target_tokens"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(b.map(t => (t._1, t._2)).toSet == bs,
      "target < avail must degenerate to budgetedSample tagged epoch 1")
    // repetition is by reference rank, not doc id: every epoch ≤ full is the
    // WHOLE stratum
    assert(a.filter(_._3 == 2L).map(_._2).toSet == Set(1L, 2L, 3L, 4L))
  }

  test("materializeEpochs: maxEpochs trips loudly, zero-target emits nothing") {
    val docs = Seq((1L, "a", "w w")).toDF("doc_id", "lang", "text")
    val e = intercept[IllegalArgumentException](
      TrainingSet.materializeEpochs(docs,
        Seq(("a", 1000L)).toDF("lang", "target_tokens"), maxEpochs = 3L))
    assert(e.getMessage.contains("maxEpochs") && e.getMessage.contains("a=500"))
    assert(TrainingSet.materializeEpochs(docs,
      Seq(("a", 0L)).toDF("lang", "target_tokens")).count() == 0L)
  }

  test("packSequencesWhole: oversized doc fails loudly, naming the doc") {
    val d = Seq((7L, 9L)).toDF("doc_id", "n")
    val e = intercept[org.apache.spark.SparkException](
      TrainingSet.packSequencesWhole(d, 4L, tokenCount = Some(col("n"))).collect())
    assert(e.getMessage.contains("doc 7") && e.getMessage.contains("capTokens"))
  }

  // ---- chunkSliding ----------------------------------------------------------

  test("chunkSliding: hand-traced windows — starts, lengths, text, stop-at-end") {
    // 7 tokens, chunk 4, stride 2 → starts 1, 3 (covers tokens 3-6), 5
    // (reaches token 7 = the end → generation stops; no start 7)
    val out = TrainingSet.chunkSliding(
      docs(1L -> "t1 t2 t3 t4 t5 t6 t7"), chunkTokens = 4, stride = 2)
      .orderBy("chunk_idx")
      .collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
    assert(out.toSeq == Seq(
      (0L, 1L, 4L, "t1 t2 t3 t4"),
      (1L, 3L, 4L, "t3 t4 t5 t6"),
      (2L, 5L, 3L, "t5 t6 t7")))
  }

  test("chunkSliding: short doc yields one chunk; exact-cap doc too") {
    val out = TrainingSet.chunkSliding(
      docs(1L -> "a b", 2L -> "a b c d"), chunkTokens = 4, stride = 2)
      .orderBy("doc_id", "chunk_idx").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3), r.getString(4)))
    assert(out.toSeq == Seq((1L, 0L, 2L, "a b"), (2L, 0L, 4L, "a b c d")))
  }

  test("chunkSliding: every token covered, overlap = chunk − stride, bounds hold") {
    val words = (1 to 137).map(i => s"w$i")
    val out = TrainingSet.chunkSliding(
      docs(9L -> words.mkString(" ")), chunkTokens = 32, stride = 16)
      .orderBy("chunk_idx").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    // ceil((137-32)/16)+1 = 8 windows; all but the last are full
    assert(out.length == 8)
    assert(out.init.forall(_._3 == 32L))
    // coverage: consecutive starts differ by stride < chunk → no gap, and
    // the last window reaches the end exactly once
    assert(out.map(_._2).toSeq == (0 until 8).map(i => 16L * i + 1))
    assert(out.last._2 + out.last._3 - 1 == 137L)
    // no window past the end: second-to-last must NOT already reach it
    assert(out.init.last._2 + 32 - 1 < 137L)
  }

  test("chunkSliding: stride = chunk degenerates to disjoint tiling") {
    val words = (1 to 10).map(i => s"w$i")
    val out = TrainingSet.chunkSliding(
      docs(1L -> words.mkString(" ")), chunkTokens = 4, stride = 4)
      .orderBy("chunk_idx").collect()
      .map(r => (r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq((1L, 4L), (5L, 4L), (9L, 2L)))
    assert(out.map(_._2).sum == 10L, "disjoint tiling covers every token once")
  }

  test("chunkSliding: invalid stride/chunk rejected eagerly") {
    val d = docs(1L -> "a b c")
    intercept[IllegalArgumentException](TrainingSet.chunkSliding(d, 0, 1))
    intercept[IllegalArgumentException](TrainingSet.chunkSliding(d, 4, 0))
    intercept[IllegalArgumentException](TrainingSet.chunkSliding(d, 4, 5))
  }
}
