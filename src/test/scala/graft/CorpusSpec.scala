package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Corpus

/** Corpus-curation operators: repetition metrics, hash split, mixture, vocab. */
class CorpusSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private def docs: DataFrame = graft.sources.Tables.documents(spark, sf)

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("repetitionMetrics: hand-computed counts, bigram multiplicity, 1-token doc") {
    val df = Seq(
      (1L, "a b a b a"), // toks: a×3 b×2; bigrams: "a b"×2 "b a"×2
      (2L, "x"), //          1 token → zero bigrams, null top_2gram_count
      (3L, "c c c c") //     bigrams: "c c"×3
    ).toDF("doc_id", "text")
    val got = Corpus.repetitionMetrics(df).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), if (r.isNullAt(6)) -1L else r.getLong(6))).toMap
    assert(got(1L) == ((5L, 2L, 3L, 4L, 2L, 2L)))
    assert(got(2L) == ((1L, 1L, 1L, 0L, 0L, -1L)))
    assert(got(3L) == ((4L, 1L, 4L, 3L, 1L, 3L)))
  }

  test("piiScrub: hand-written detections, redaction order, untouched text passes through") {
    val df = Seq(
      (1L, "write to alice.b+test@sub.example.co.uk today"),
      (2L, "server 192.168.0.1 and backup 10.0.0.2"),
      (3L, "call 555-123-4567 or 555.987.6543"),
      (4L, "mixed bob@x.io at 8.8.8.8 phone 111-222-3333"),
      (5L, "nothing to see here"),
      // an IP-like fragment INSIDE an email's host must not be double-cut:
      // the email pass runs first and swallows the whole address
      (6L, "edge a@1.2.3.4ab.com end")
    ).toDF("doc_id", "text")
    val got = Corpus.piiScrub(df).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got(0) == ((1L, "write to <EMAIL> today", 1L, 0L, 0L)))
    assert(got(1) == ((2L, "server <IP> and backup <IP>", 0L, 2L, 0L)))
    assert(got(2) == ((3L, "call <PHONE> or <PHONE>", 0L, 0L, 2L)))
    assert(got(3) == ((4L, "mixed <EMAIL> at <IP> phone <PHONE>", 1L, 1L, 1L)))
    assert(got(4) == ((5L, "nothing to see here", 0L, 0L, 0L)))
    assert(got(5) == ((6L, "edge <EMAIL> end", 1L, 0L, 0L)))
  }

  test("piiScrub plan: pure projection — no exchange") {
    val p = Corpus.piiScrub(docs).queryExecution.executedPlan.toString
    assert(!p.contains("Exchange hashpartitioning"), s"unexpected shuffle:\n$p")
  }

  test("repetitionMetrics plan: pure projection — no exchange, pruned scan") {
    val p = plan("text_repetition")
    assert(!p.contains("Exchange hashpartitioning"), s"unexpected shuffle:\n$p")
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"), s"over-read:\n$p")
  }

  test("splitAssign: exhaustive, deterministic, duplicate texts co-assigned") {
    val a = Corpus.splitAssign(docs).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = Corpus.splitAssign(docs.repartition(7)).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a == b, "assignment must not depend on partitioning")
    assert(a.values.forall(s => s == "train" || s == "val"))
    // duplicate texts land on the same side — no leakage through copies
    val dup = Seq((1L, "same text"), (2L, "same text")).toDF("doc_id", "text")
    assert(Corpus.splitAssign(dup).select("split").distinct().count() == 1)
  }

  test("splitAssign: val share tracks valFrac, seed re-rolls the assignment") {
    val n = docs.count().toDouble
    val nVal = Corpus.splitAssign(docs, valFrac = 0.25)
      .filter(col("split") === "val").count().toDouble
    assert(nVal / n > 0.10 && nVal / n < 0.40, s"val share ${nVal / n} far from 0.25")
    val s0 = Corpus.splitAssign(docs, valFrac = 0.25).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val s1 = Corpus.splitAssign(docs, valFrac = 0.25, seed = "roll-2").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(s0 != s1, "a new seed must re-roll the split")
  }

  test("splitThresholdHex edges: 0 → all-train sentinel, 1 → all-val") {
    assert(Corpus.splitThresholdHex(0.0) == "g") // no hex prefix reaches it
    assert(Corpus.splitThresholdHex(1.0) == "0000") // every prefix does
    assert(Corpus.splitThresholdHex(0.0625) == "f000")
    val allTrain = Corpus.splitAssign(docs, valFrac = 0.0)
    assert(allTrain.filter(col("split") === "val").count() == 0)
    val allVal = Corpus.splitAssign(docs, valFrac = 1.0)
    assert(allVal.filter(col("split") === "train").count() == 0)
  }

  test("mixtureStats: exact doc/char/token mass per stratum") {
    val df = Seq(
      ("web", "en", 101L, "aa bb"),
      ("web", "en", 102L, "cc"),
      ("web", "de", 103L, "dd ee ff"),
      ("book", "en", 104L, "x")
    ).toDF("source", "lang", "doc_id", "text")
    val got = Corpus.mixtureStats(df).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got(("web", "en")) == ((2L, 7L, 3L)))
    assert(got(("web", "de")) == ((1L, 8L, 3L)))
    assert(got(("book", "en")) == ((1L, 1L, 1L)))
  }

  test("vocabTopK: (count desc, token asc) total order, deterministic tie cut") {
    val df = Seq("b b b a a c", "a d d").map(t => (1L, t)).toDF("doc_id", "text")
    // counts: a×3 b×3 d×2 c×1 — k=3 cuts inside the d/c tail; the a/b tie
    // at the top resolves by token asc
    val got = Corpus.vocabTopK(df, 3).orderBy(col("cnt").desc, col("token").asc)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("a", 3L), ("b", 3L), ("d", 2L)))
  }

  test("vocabTopK plan: per-partition top-k merge, never a global sort") {
    val p = plan("vocab_top20")
    assert(p.contains("TakeOrderedAndProject"), s"expected top-k operator:\n$p")
  }

  test("tokenShift: exact cross-product ranking, absent tokens count zero") {
    // a: x×2 y×1 (ta=3);  b: y×1 z×1 (tb=2)
    // shift: x |2·2−0·3|=4,  z |0·2−1·3|=3,  y |1·2−1·3|=1  → top2 = x, z
    val a = Seq((1L, "x x y")).toDF("doc_id", "text")
    val b = Seq((2L, "y z")).toDF("doc_id", "text")
    val got = Corpus.tokenShift(a, b, 2).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set(("x", 2L, 0L), ("z", 0L, 1L)))
  }

  test("repetitionFilter: exact rational gates, boundary docs kept at equality") {
    val df = Seq(
      (1L, "a b c d e f g h i j"), // 10 tokens, 10 distinct, top 1 → passes
      (2L, "a a b c d e f g h i"), // dup frac 1/10 ok, top 2/10 > 1/10 → cut
      (3L, "a b a b c d e f g h"), // top 2/10 → cut by the top-token gate
      (4L, "a b c d e a b c d e") // dup 5/10 = 1/2 boundary ok; top 2/10 → cut
    ).toDF("doc_id", "text")
    val got = Corpus.repetitionFilter(df).collect().map(_.getLong(0)).toSet
    assert(got == Set(1L))
    // relax the top-token gate to 1/5: equality holds (2*5 == 10*1), docs
    // 2-4 all pass — the ≤ boundary is inclusive on both gates
    val relaxed = Corpus.repetitionFilter(df, maxTopTokenFrac = (1, 5))
      .collect().map(_.getLong(0)).toSet
    assert(relaxed == Set(1L, 2L, 3L, 4L))
  }

  test("mixtureCube: gid separates a NULL-valued stratum from a rolled-up one") {
    val df = Seq(
      ("web", "en", 1L, "a b"),
      ("web", null.asInstanceOf[String], 2L, "c"), // real NULL lang
      ("book", "en", 3L, "d e f")
    ).toDF("source", "lang", "doc_id", "text")
    val got = Corpus.mixtureCube(df).collect()
      .map(r => (Option(r.getString(0)), Option(r.getString(1)), r.getLong(2)) -> r.getLong(3))
      .toMap
    // cell rows (gid 0): the real-NULL lang keeps gid 0
    assert(got((Some("web"), Some("en"), 0L)) == 1L)
    assert(got((Some("web"), None, 0L)) == 1L) // NULL datum, NOT a rollup
    // lang rolled up (gid 1): web covers both its docs
    assert(got((Some("web"), None, 1L)) == 2L)
    // grand total (gid 3)
    assert(got((None, None, 3L)) == 3L)
  }

  test("tokenShift plan: top-k cut, totals broadcast, no wide row beyond vocab") {
    val p = plan("token_shift_top20")
    assert(p.contains("TakeOrderedAndProject"), s"expected top-k cut:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"totals must broadcast:\n$p")
  }

  // ---- domain / URL curation ----

  private def norm(url: String): String = {
    val out = Seq(url).toDF("url")
      .select(Corpus.urlNormalize(col("url")).as("n")).collect()
    out(0).getString(0)
  }

  test("urlNormalize: hand-written edge cases for every step") {
    // case, default port, fragment, mid-position tracking param
    assert(norm("HTTPS://WWW.Site.COM:443/Path/A?id=4&utm_source=x#frag")
      == "https://www.site.com/Path/A?id=4")
    // http default port; path/query case preserved
    assert(norm("Http://Site.org:80/CaseKept?Q=Mixed") == "http://site.org/CaseKept?Q=Mixed")
    // non-default port survives
    assert(norm("http://site.org:8080/a") == "http://site.org:8080/a")
    // tracking param FIRST: the '&' of the next param is promoted to '?'
    assert(norm("http://s.io/p?utm_campaign=X&id=4&gclid=z") == "http://s.io/p?id=4")
    // tracking param FIRST with TWO surviving params (ADVICE r8): the FIRST
    // '&' must be promoted — a greedy prefix promoted the LAST one, yielding
    // the malformed 'p&id=22?page=2' whose id migrates into the path
    assert(norm("http://s.io/p?utm_campaign=X&id=22&page=2") == "http://s.io/p?id=22&page=2")
    // both forms of the same resource land on the SAME canonical key
    assert(norm("http://s.io/p?utm_campaign=X&id=22&page=2") == norm("http://s.io/p?id=22&page=2"))
    // tracking param ONLY: no dangling '?'
    assert(norm("http://s.io/p?ref=rss") == "http://s.io/p")
    // 'ref=' inside an innocent 'href=' param is NOT eaten (separator is
    // part of the match)
    assert(norm("http://s.io/p?href=ref=keep&ref=drop") == "http://s.io/p?href=ref=keep")
    // ':80' on https (not the scheme's default) survives
    assert(norm("https://s.io:80/p") == "https://s.io:80/p")
  }

  test("urlDomain: host key, www stripped, port/path/query ignored") {
    val got = Seq(
      "https://www.site.co.uk/a?b=1", "http://site.org:8080/x", "https://sub.www.site.io/")
      .toDF("u").select(Corpus.urlDomain(col("u")).as("d")).collect().map(_.getString(0)).toSeq
    // only a LEADING www. label is stripped; an interior one is part of the host
    assert(got == Seq("site.co.uk", "site.org", "sub.www.site.io"))
  }

  test("blocklistFilter: exact-or-subdomain semantics, hand-checked") {
    val d = Seq(
      (1L, "bad.com"), (2L, "a.bad.com"), (3L, "notbad.com"),
      (4L, "good.org"), (5L, "bad.com.evil.net")).toDF("doc_id", "domain")
    val bl = Seq("bad.com").toDF("pattern")
    val kept = Corpus.blocklistFilter(d, bl).collect().map(_.getLong(0)).toSet
    // bad.com and its subdomain fall; notbad.com (suffix without dot
    // boundary) and bad.com.evil.net (prefix, not suffix) survive
    assert(kept == Set(3L, 4L, 5L))
  }

  test("lmScore: hand-computed backoff bigram surprisal, pruning, relative keep") {
    // train: unigrams a:3 b:2 c:1 (T=6); bigram 'a b':2 kept, 'a c':1 pruned
    // fl(6)=2 fl(3)=1 fl(2)=1 fl(1)=0
    val train = Seq((10L, "a b"), (11L, "a b"), (12L, "a c")).toDF("doc_id", "text")
    val score = Seq(
      (1L, "a b"), // 'a' first: fl(T)-fl(3)=1; 'a b' seen: fl(cprev 3)-fl(2)=0 → 1
      (2L, "a c"), // 'a'=1; 'a c' PRUNED → backoff 1+fl(T)-fl(c 1)=3       → 4
      (3L, "z a")  // 'z' unseen: fl(T)+1=3; 'z a' unseen, 'a' seen: 1+2-1=2 → 5
    ).toDF("doc_id", "text")
    val got = Corpus.lmScore(score, train)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3))).toSeq
    // totals: tot_tok=6, tot_bits=10 → keep ⇔ lm_bits·6 ≤ n_tokens·10
    assert(got == Seq((1L, 2L, 1L, true), (2L, 2L, 4L, false), (3L, 2L, 5L, false)))
  }

  test("lmScore model caps: capped-out unigrams score unseen, zero bigrams = pure backoff") {
    // train: uni a:3 b:2 c:1, T=6 (UNCAPPED — the normalization constant
    // must survive the cut); maxVocab=2 keeps {a,b}, drops c; maxBigrams=0
    // removes the bigram table entirely
    val train = Seq((10L, "a b"), (11L, "a b"), (12L, "a c")).toDF("doc_id", "text")
    val score = Seq(
      (1L, "a b"), // 'a' first: fl(6)-fl(3)=1; 'b' backoff: 1+fl(6)-fl(2)=2 → 3
      (2L, "a c"), // 'a'=1; 'c' CAPPED OUT → unseen fl(6)+1=3             → 4
      (3L, "z a")  // 'z' unseen: 3; 'a' backoff: 1+fl(6)-fl(3)=2          → 5
    ).toDF("doc_id", "text")
    val got = Corpus.lmScore(score, train, maxVocab = 2, maxBigrams = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3))).toSeq
    // totals: tot_tok=6, tot_bits=12 → keep ⇔ lm_bits·6 ≤ n_tokens·12
    assert(got == Seq((1L, 2L, 3L, true), (2L, 2L, 4L, true), (3L, 2L, 5L, false)))
  }

  test("lmScore plan: model broadcast to the scoring side, no sort-merge join") {
    val p = plan("filter_lm_score")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      s"count tables must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"token rows must never shuffle for a join:\n$p")
  }

  test("registrableDomain: PSL algorithm hand-checked across every rule class") {
    val d = Seq(
      (1L, "example.com"),            // no rule → implicit * default
      (2L, "a.b.example.com"),        // deep subdomain collapses
      (3L, "example.co.uk"),          // multi-label ICANN suffix
      (4L, "x.example.co.uk"),
      (5L, "co.uk"),                  // host IS a public suffix → NULL
      (6L, "alice.github.io"),        // private-section suffix
      (7L, "github.io"),              // the suffix itself → NULL
      (8L, "foo.bar.ck"),             // wildcard *.ck: ps = bar.ck
      (9L, "bar.ck"),                 // bare wildcard match → NULL
      (10L, "www.ck"),                // exception !www.ck → itself
      (11L, "sub.www.ck"),            // under the exception
      (12L, "ck"),                    // bare TLD → NULL
      (13L, "localhost"),             // single label → NULL
      (14L, "b.s3.amazonaws.com"),    // 3-label private rule
      (15L, "thing.example.zz")       // unknown TLD → default rule
    ).toDF("doc_id", "domain")
    val got = Corpus.registrableDomain(d, graft.sources.PslSnapshot.df(spark))
      .collect().map(r => r.getLong(0) -> Option(r.getString(2))).toMap
    assert(got == Map(
      1L -> Some("example.com"), 2L -> Some("example.com"),
      3L -> Some("example.co.uk"), 4L -> Some("example.co.uk"), 5L -> None,
      6L -> Some("alice.github.io"), 7L -> None,
      8L -> Some("foo.bar.ck"), 9L -> None,
      10L -> Some("www.ck"), 11L -> Some("www.ck"), 12L -> None, 13L -> None,
      14L -> Some("b.s3.amazonaws.com"), 15L -> Some("example.zz")))
  }

  test("registrableDomainJoin: bit-equal to the probe path on every rule class") {
    val d = Seq(
      (1L, "example.com"), (2L, "a.b.example.com"), (3L, "example.co.uk"),
      (4L, "x.example.co.uk"), (5L, "co.uk"), (6L, "alice.github.io"),
      (7L, "github.io"), (8L, "foo.bar.ck"), (9L, "bar.ck"), (10L, "www.ck"),
      (11L, "sub.www.ck"), (12L, "ck"), (13L, "localhost"),
      (14L, "b.s3.amazonaws.com"), (15L, "thing.example.zz")
    ).toDF("doc_id", "domain")
    val psl = graft.sources.PslSnapshot.df(spark)
    def res(df: DataFrame) =
      df.collect().map(r => r.getLong(0) -> Option(r.getString(2))).toMap
    assert(res(Corpus.registrableDomainJoin(d, psl))
      == res(Corpus.registrableDomainProbe(d, psl)))
    // forced through the join path via a zero threshold, the AUTO front
    // door must give the same answers too
    assert(res(Corpus.registrableDomain(d, psl, joinMinRules = 0))
      == res(Corpus.registrableDomainProbe(d, psl)))
  }

  test("registrableDomainJoin: bit-equal on a synthetic multi-thousand-rule list") {
    // ~3k rules over synthetic TLDs, every class represented, including
    // wildcard+exception pairs and keys that are simultaneously a normal
    // rule AND a wildcard base (t17: "s17.z17" and "*.s17.z17")
    val rules = (0 until 1000).flatMap { i =>
      val base = s"s$i.z${i % 40}"
      Seq(base) ++
        (if (i % 3 == 0) Seq(s"*.$base") else Nil) ++
        (if (i % 9 == 0) Seq(s"!exc.$base") else Nil)
    }
    val psl = rules.toDF("rule")
    assert(rules.size > 1000)
    val rnd = new scala.util.Random(42)
    val hosts = (0 until 2000).map { j =>
      val i = rnd.nextInt(1100) // some hosts miss every rule
      val base = s"s$i.z${i % 40}"
      val host = rnd.nextInt(5) match {
        case 0 => base                       // host IS a suffix
        case 1 => s"reg.$base"               // one registrant label
        case 2 => s"deep.sub.reg.$base"      // deep subdomain
        case 3 => s"exc.$base"               // exception hit (when present)
        case _ => s"x.exc.$base"             // under the exception
      }
      (j.toLong, host)
    }.toDF("doc_id", "domain")
    def res(df: DataFrame) =
      df.collect().map(r => r.getLong(0) -> Option(r.getString(2))).toMap
    // maxRuleLabels must cover the longest rule (4 labels incl. wildcard +1)
    assert(res(Corpus.registrableDomainJoin(hosts, psl))
      == res(Corpus.registrableDomainProbe(hosts, psl, maxRuleLabels = 4)))
  }

  test("registrableDomain auto-dispatch: trivial list → probe chain, snapshot → hash join") {
    val d = Seq((1L, "a.example.com")).toDF("doc_id", "domain")
    // ≤ PslJoinMinRules (16): the lazy one-row-broadcast probe chain
    val tiny = Seq("co.uk", "github.io").toDF("rule")
    val tinyP = Corpus.registrableDomain(d, tiny, maxRuleLabels = 2)
      .queryExecution.executedPlan.toString
    assert(tinyP.contains("BroadcastNestedLoopJoin") && !tinyP.contains("BroadcastHashJoin"),
      s"a trivial rule list must keep the one-row-broadcast probe chain:\n$tinyP")
    // the shipped 90-rule snapshot is already past the measured crossover
    // (ScaleBench psl section: join 0.64 s vs probe 12.2 s on 100k hosts)
    val joinP = Corpus.registrableDomain(d, graft.sources.PslSnapshot.df(spark))
      .queryExecution.executedPlan.toString
    assert(joinP.contains("BroadcastHashJoin") && !joinP.contains("BroadcastNestedLoopJoin"),
      s"the snapshot must dispatch to the label-suffix hash join:\n$joinP")
    // the join path must not shuffle anything — rules enter as a
    // LocalRelation (driver-prepared), docs stay in their input partitions
    assert(!joinP.contains("Exchange hashpartitioning"),
      s"join path must be exchange-free:\n$joinP")
    assert(!joinP.contains("SortMergeJoin"), s"docs must never shuffle for a join:\n$joinP")
  }

  test("PslSnapshot.parseList: official publicsuffix.org format, fixture file") {
    // the fixture mimics the real public_suffix_list.dat: header comments,
    // blank lines, ===SECTION=== markers inside comments, mixed-case rules,
    // and content past the first whitespace (read-up-to-whitespace rule)
    val parsed = graft.sources.PslSnapshot.parseList(
      scala.io.Source.fromFile("src/test/resources/psl-official-fixture.dat").getLines())
    assert(parsed == Seq("co.uk", "org.uk", "*.ck", "!www.ck",
      "co.jp", "ne.jp", "github.io"))
    // round-trip: the shipped snapshot serialized the way upstream ships
    // rules (one per line, comments interleaved) parses back to itself
    val official = "// header\n\n" +
      graft.sources.PslSnapshot.rules.map(r => s"$r\n").mkString("// sect\n", "", "")
    assert(graft.sources.PslSnapshot.parseList(official.linesIterator)
      == graft.sources.PslSnapshot.rules)
  }

  test("PslSnapshot.fromFile → registrableDomain: the production swap path end-to-end") {
    val psl = graft.sources.PslSnapshot.fromFile(
      spark, "src/test/resources/psl-official-fixture.dat")
    assert(psl.columns.toSeq == Seq("rule") && psl.count() == 7)
    val d = Seq(
      (1L, "a.example.co.uk"),   // fixture ICANN rule
      (2L, "alice.github.io"),   // fixture private-section rule
      (3L, "foo.bar.ck"),        // fixture wildcard
      (4L, "www.ck"),            // fixture exception
      (5L, "x.example.zz")       // implicit * default
    ).toDF("doc_id", "domain")
    val got = Corpus.registrableDomain(d, psl)
      .collect().map(r => r.getLong(0) -> Option(r.getString(2))).toMap
    assert(got == Map(1L -> Some("example.co.uk"), 2L -> Some("alice.github.io"),
      3L -> Some("foo.bar.ck"), 4L -> Some("www.ck"), 5L -> Some("example.zz")))
  }

  test("registrableDomain plan: PSL rides broadcasts, docs never shuffle") {
    val p = plan("curate_reg_domain")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
      s"PSL rules must ride a broadcast (hash join post-r10 dispatch):\n$p")
    assert(!p.contains("Exchange hashpartitioning"), s"docs must not shuffle:\n$p")
    assert(!p.contains("SortMergeJoin"), s"docs must never shuffle for a join:\n$p")
  }

  test("domainQuotaIncrement: empty prior == single-corpus domainQuota") {
    val docs = graft.sources.Tables.documents(spark, sf)
      .withColumn("domain", concat(lit("d"), col("doc_id") % 7))
    val single = Corpus.domainQuota(docs, quota = 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val (inc, counts) = Corpus.domainQuotaIncrement(
      docs, Corpus.emptyDomainCounts(spark), quota = 3)
    assert(inc.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      == single)
    // counts' = exactly the kept sizes
    assert(counts.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      == single.groupBy(_._1).view.mapValues(_.size.toLong).toMap)
  }

  test("domainQuotaIncrement: prior counts bind across rounds, ranks cumulative") {
    import spark.implicits._
    // md5 order within farm.com round 2: computed below, not assumed
    val r1 = Seq((1L, "farm.com", "a a"), (2L, "farm.com", "b b"),
      (10L, "lone.org", "x x")).toDF("doc_id", "domain", "text")
    val r2 = Seq((3L, "farm.com", "c c"), (4L, "farm.com", "d d"),
      (5L, "farm.com", "e e"), (11L, "lone.org", "y y"))
      .toDF("doc_id", "domain", "text")
    val (kept1, c1) = Corpus.domainQuotaIncrement(
      r1, Corpus.emptyDomainCounts(spark), quota = 3)
    assert(kept1.count() == 3) // under quota everywhere: all kept
    val (kept2, c2) = Corpus.domainQuotaIncrement(r2, c1, quota = 3)
    val got = kept2.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // farm.com enters round 2 with prior=2 → exactly ONE slot left, and it
    // goes to the smallest (md5(text), id) — the same doc a full-corpus
    // row_number replay would pick
    val farmOrder = r2.filter(col("domain") === "farm.com")
      .select(col("doc_id"), md5(col("text")).as("h")).collect()
      .sortBy(r => (r.getString(1), r.getLong(0))).map(_.getLong(0))
    assert(got.count(_._1 == "farm.com") == 1)
    assert(got.contains(("farm.com", 3L, farmOrder.head)))
    // lone.org had prior=1 → two slots, the round-2 doc ranks 2nd overall
    assert(got.contains(("lone.org", 2L, 11L)))
    // a third round at full farm quota keeps nothing for that domain
    val (kept3, _) = Corpus.domainQuotaIncrement(
      Seq((6L, "farm.com", "f f")).toDF("doc_id", "domain", "text"), c2, quota = 3)
    assert(kept3.count() == 0)
  }

  test("domainQuotaIncrement round-trips its counts through parquet") {
    import spark.implicits._
    val (_, c1) = Corpus.domainQuotaIncrement(
      Seq((1L, "a.com", "t t")).toDF("doc_id", "domain", "text"),
      Corpus.emptyDomainCounts(spark), quota = 2)
    val path = java.nio.file.Files.createTempDirectory("graft-dq").toString + "/counts"
    Corpus.writeDomainCounts(c1, path)
    val (kept, _) = Corpus.domainQuotaIncrement(
      Seq((2L, "a.com", "u u"), (3L, "a.com", "v v")).toDF("doc_id", "domain", "text"),
      Corpus.readDomainCounts(spark, path), quota = 2)
    assert(kept.collect().map(r => (r.getLong(1), r.getLong(2))).toSet
      == Set((2L, kept.collect().head.getLong(2))) && kept.count() == 1,
      "one slot must remain after the persisted round-1 count")
  }

  test("curate_quota_increment plan: bounded aggregate ranking, never a window") {
    val p = plan("curate_quota_increment")
    assert(!p.contains("Window"),
      s"cross-increment quota must rank via the bounded bottom-k aggregate:\n$p")
    assert(p.contains("ObjectHashAggregate"), s"expected the TopK aggregate:\n$p")
  }

  test("curate plans: normalize is a pure projection; blocklist broadcasts one row, docs never shuffle") {
    val pn = plan("curate_url_normalize")
    assert(!pn.contains("Exchange hashpartitioning"), s"unexpected shuffle:\n$pn")
    val pb = plan("curate_blocklist")
    assert(pb.contains("BroadcastNestedLoopJoin") || pb.contains("BroadcastExchange"),
      s"blocklist must broadcast:\n$pb")
    // the docs side is filtered map-side: the only hash exchange allowed is
    // none (sort for orderBy is a range exchange)
    assert(!pb.contains("Exchange hashpartitioning"), s"docs must not shuffle:\n$pb")
  }

  test("splitAssignByGroup: one side per group, frac extremes, null group, zero shuffle") {
    val df = Seq(
      (1L, "s1", "text a"), (2L, "s1", "text b"), (3L, "s1", "text c"),
      (4L, "s2", "text d"), (5L, "s2", "text e"),
      (6L, null.asInstanceOf[String], "text f")
    ).toDF("doc_id", "source", "text").repartition(3)
    val got = Corpus.splitAssignByGroup(df, "source", valFrac = 0.5)
      .collect().map(r => (r.getLong(0), Option(r.getString(1)), r.getString(2)))
    // EVERY doc of a group lands on one side — the leakage guarantee
    got.groupBy(_._2).foreach { case (g, rows) =>
      assert(rows.map(_._3).distinct.length == 1, s"group $g split across sides")
    }
    // the assignment is the md5 cut on the GROUP key, replayed here
    def side(g: String): String = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(g.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(4)
      if (hex >= Corpus.splitThresholdHex(0.5)) "val" else "train"
    }
    assert(got.filter(_._2.contains("s1")).head._3 == side("s1"))
    assert(got.filter(_._2.contains("s2")).head._3 == side("s2"))
    // NULL group hashes as the empty string — one deterministic side
    assert(got.filter(_._2.isEmpty).head._3 == side(""))
    // frac extremes: 0 → all train, 1 → all val
    assert(Corpus.splitAssignByGroup(df, "source", valFrac = 0.0)
      .collect().forall(_.getString(2) == "train"))
    assert(Corpus.splitAssignByGroup(df, "source", valFrac = 1.0)
      .collect().forall(_.getString(2) == "val"))
    // pure projection: no exchange of any kind in the assignment itself
    val p = Corpus.splitAssignByGroup(docs, "source")
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange hashpartitioning"), s"split must not shuffle:\n$p")
  }

  test("snapshotDiff: all four statuses, hand-built snapshots; summary rolls up") {
    val v1 = Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma"), (4L, "delta"))
      .toDF("doc_id", "text").repartition(3)
    val v2 = Seq((1L, "alpha"), (3L, "GAMMA2"), (4L, "delta"), (5L, "epsilon"))
      .toDF("doc_id", "text").repartition(2)
    val got = Corpus.snapshotDiff(v1, v2).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toSeq
    assert(got == Seq(1L -> "unchanged", 2L -> "removed", 3L -> "modified",
      4L -> "unchanged", 5L -> "added"))
    val sum = Corpus.snapshotDiffSummary(v1, v2).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toSeq
    assert(sum == Seq("added" -> 1L, "modified" -> 1L, "removed" -> 1L,
      "unchanged" -> 2L))
    // identical snapshots: everything unchanged, nothing invented
    val same = Corpus.snapshotDiffSummary(v1, v1).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toSeq
    assert(same == Seq("unchanged" -> 4L))
  }

  test("snapshotDiff plan: the corpus crosses one id-keyed join, digests not text") {
    val p = SparkEntry.queries("corpus_snapshot_diff")(spark, sf)
      .queryExecution.executedPlan.toString
    // full-outer hash join on the id — text columns must be pruned before
    // the exchange (only doc_id + the 32-char md5 projection survive)
    assert(p.contains("FullOuter"), s"expected full-outer join:\n$p")
    assert(p.contains("md5"), s"expected digest projection:\n$p")
  }
}
