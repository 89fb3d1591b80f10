package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{BpeModel, Tokenizer}

/**
 * BPE tokenizer: hand-traced training on a corpus small enough to verify
 * every merge by hand, encode semantics (greedy lowest-rank, every
 * occurrence merged), determinism under partitioning, round-trip through
 * the persisted merge table, and the count projection's plan shape.
 */
class TokenizerSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  test("trainBpe: every merge hand-verified on a 2-word corpus") {
    // corpus: "ab ab ac" → words ab×2, ac×1; symbol pairs per round:
    //   r0: (a,b)=2 (b,</w>)=2 (a,c)=1 (c,</w>)=1 → tie at 2 → lexicographic
    //       smallest pair (a,b)
    //   r1: (ab,</w>)=2 (a,c)=1 (c,</w>)=1        → (ab,</w>)
    //   r2: (a,c)=1 (c,</w>)=1                    → tie at 1 → (a,c)
    //   r3: (ac,</w>)=1                           → (ac,</w>)
    //   r4: nothing left — trainer stops early
    val docs = Seq((1L, "ab ab"), (2L, "ac")).toDF("doc_id", "text")
    val m = Tokenizer.trainBpe(docs, numMerges = 10)
    assert(m.merges == IndexedSeq(
      ("a", "b"), ("ab", "</w>"), ("a", "c"), ("ac", "</w>")))
  }

  test("encode: greedy lowest-rank merges, every occurrence, unseen chars survive") {
    val m = BpeModel(IndexedSeq(("a", "b"), ("ab", "</w>")))
    assert(m.encodeWord("ab").toSeq == Seq("ab</w>"))
    // rank-0 fires on BOTH occurrences in one round, then rank-1 closes
    // the final subword — the loop runs to fixpoint
    assert(m.encodeWord("abab").toSeq == Seq("ab", "ab</w>"))
    // no applicable merges: characters + end marker survive
    assert(m.encodeWord("xyz").toSeq == Seq("x", "y", "z", "</w>"))
    // interior pair merges even when the end-of-word merge can't follow
    assert(m.encodeWord("abc").toSeq == Seq("ab", "c", "</w>"))
    assert(m.countTokens("ab abab xyz") == 1 + 2 + 4)
    // empty text: one empty "word" = the bare end marker (mirrors the
    // engine's tokens('') = [''] convention)
    assert(m.countTokens("") == 1)
    // surrogate-pair safety: a non-BMP code point is ONE symbol (a charAt
    // split would leave two invalid UTF-16 halves), and training/encoding
    // agree on it
    val emoji = new String(Character.toChars(0x1F600))
    // pairs (e,e) and (e,</w>) tie at count 2; "</w>" sorts before the
    // emoji's surrogates, so the lexicographic tie-break picks (e,</w>)
    val m2 = graft.operators.Tokenizer.trainBpe(
      Seq((1L, s"$emoji$emoji $emoji$emoji")).toDF("doc_id", "text"), numMerges = 1)
    assert(m2.merges == IndexedSeq((emoji, "</w>")))
    assert(m2.encodeWord(emoji + emoji).toSeq == Seq(emoji, emoji + "</w>"))
  }

  test("training is partition-invariant and the frequency cap rule is the LM vocab's") {
    val base = (1 to 300).map(i => (i.toLong,
      s"word${i % 7} word${i % 7} filler${i % 31}")).toDF("doc_id", "text")
    val a = Tokenizer.trainBpe(base.coalesce(1), numMerges = 40)
    val b = Tokenizer.trainBpe(base.repartition(13), numMerges = 40)
    assert(a.merges == b.merges, "any partitioning must train the identical model")
    // frequent words fully merge into single tokens before rare ones:
    // 'word0' (seen ~86×) must encode shorter than an equally-long
    // rare word unseen in training
    assert(a.encodeWord("word0").length < a.encodeWord("zzzzz").length)
  }

  test("persisted merge table round-trips; subwords reassemble the word exactly") {
    val docs = (1 to 50).map(i => (i.toLong, s"alpha beta gamma tok$i")).toDF("doc_id", "text")
    val m = Tokenizer.trainBpe(docs, numMerges = 30)
    val dir = java.nio.file.Files.createTempDirectory("bpe").toString
    Tokenizer.writeBpeModel(m, spark, dir)
    val m2 = Tokenizer.readBpeModel(spark, dir)
    assert(m2.merges == m.merges)
    for (w <- Seq("alpha", "beta", "unseenword")) {
      val syms = m2.encodeWord(w)
      assert(syms.mkString("").stripSuffix("</w>").replace("</w>", "") == w,
        s"subwords must reassemble '$w': ${syms.toSeq}")
    }
  }

  test("bpeVocabTopK: hand-computed subword counts, deterministic order") {
    val docs = Seq((1L, "ab ab"), (2L, "ac")).toDF("doc_id", "text")
    // 1 merge (a,b): ab → [ab, </w>] ×2; ac → [a, c, </w>]
    val m = BpeModel(IndexedSeq(("a", "b")))
    val got = Tokenizer.bpeVocabTopK(docs, m, k = 10)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("</w>", 3L), ("ab", 2L), ("a", 1L), ("c", 1L)))
    // k cuts the tail deterministically (cnt desc, subword asc)
    assert(Tokenizer.bpeVocabTopK(docs, m, k = 2)
      .collect().map(_.getString(0)).toSeq == Seq("</w>", "ab"))
  }

  test("bpeTokenCounts: counts match driver-side encode; plan is a pure projection") {
    val docs = Seq((1L, "ab ab"), (2L, "ac"), (3L, "abc xyz")).toDF("doc_id", "text")
    val m = Tokenizer.trainBpe(docs, numMerges = 10)
    val got = Tokenizer.bpeTokenCounts(docs, m).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val expect = docs.collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
      .map { case (id, t) =>
        (id, t.split("\\s+").length.toLong, m.countTokens(t)) }
    assert(got.toSeq == expect.toSeq)
    val p = Tokenizer.bpeTokenCounts(docs, m).queryExecution.executedPlan.toString
    // Parallelism.ensure may round-robin a tiny input; the claim is that no
    // KEYED shuffle exists — counting is per-row work
    assert(!p.contains("Exchange hashpartitioning"), s"BPE counting must be map-side only:\n$p")
  }

  test("countTokens splits on tokens()'s exact boundary: tab/newline edges, null text") {
    // ADVICE r10 (medium): String.trim strips every char <= 0x20 while
    // Spark's trim strips only ' ' — a leading tab / trailing newline yields
    // an extra empty-string token under tokens() that countTokens used to
    // drop, so n_bpe_tokens could undercut n_tokens when head words fully
    // merge. The model below fully merges both corpus words (the stated
    // regime of the 40-merge fixture).
    val m = BpeModel(IndexedSeq(("a", "b"), ("ab", "</w>")))
    val edge = "\tab ab\n" // Spark trim keeps the tab and newline
    val docs = Seq((1L, edge), (2L, " ab ab "), (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val got = Tokenizer.bpeTokenCounts(docs, m).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // doc 1: tokens = ["", ab, ab, ""] (4) — BPE: 1 + 1 + 1 + 1 = 4
    // doc 2: spaces DO trim → [ab, ab] (2) — BPE: 2
    // doc 3: null coalesces to '' on BOTH columns (ADVICE r10 low) → 1, 1
    assert(got == Seq((1L, 4L, 4L), (2L, 2L, 2L), (3L, 1L, 1L)))
    // the invariant the fix restores: n_bpe_tokens >= n_tokens, every row
    got.foreach { case (id, nt, nb) =>
      assert(nb >= nt, s"doc $id: BPE total $nb undercuts word count $nt")
    }
    // driver-side encodeText agrees with the Spark-side counts symbol-wise
    assert(m.encodeText(edge).toSeq ==
      Seq("</w>", "ab</w>", "ab</w>", "</w>"))
  }

  test("model fingerprint: order-sensitive identity, stamped into consumers, pin catches a swap") {
    val m1 = BpeModel(IndexedSeq(("a", "b"), ("ab", "</w>")))
    val m2 = BpeModel(IndexedSeq(("ab", "</w>"), ("a", "b"))) // same pairs, other ORDER
    val m3 = BpeModel(IndexedSeq(("a", "b"), ("ab", "</w>")))
    assert(m1.fingerprint != m2.fingerprint, "merge order is semantic — it must change identity")
    assert(m1.fingerprint == m3.fingerprint)
    // round-trip through the persisted merge table preserves identity
    val tmp = java.nio.file.Files.createTempDirectory("graft-bpe-fp").toString
    Tokenizer.writeBpeModel(m1, spark, s"$tmp/m")
    assert(Tokenizer.readBpeModel(spark, s"$tmp/m").fingerprint == m1.fingerprint)
    // the stamp rides the output schema of both consumers
    val docs = Seq((1L, "ab ab")).toDF("doc_id", "text")
    assert(Tokenizer.stampedFingerprint(
      Tokenizer.bpeTokenCounts(docs, m1)).contains(m1.fingerprint))
    val packed = graft.operators.TrainingSet.packSequencesBpe(docs, m1, capTokens = 4,
      expectFingerprint = Some(m1.fingerprint))
    assert(Tokenizer.stampedFingerprint(packed, "n_tokens").contains(m1.fingerprint))
    // ...and survives a parquet round-trip (manifest readers verify it later)
    packed.write.mode("overwrite").parquet(s"$tmp/packed")
    assert(Tokenizer.stampedFingerprint(
      spark.read.parquet(s"$tmp/packed"), "n_tokens").contains(m1.fingerprint))
    // the pin: packing against a RETRAINED model with the manifest's old
    // fingerprint fails loudly instead of shifting every boundary silently
    val e = intercept[IllegalArgumentException](
      graft.operators.TrainingSet.packSequencesBpe(docs, m2, capTokens = 4,
        expectFingerprint = Some(m1.fingerprint)))
    assert(e.getMessage.contains("fingerprint mismatch"))
  }

  test("stampedFingerprint is total: None for non-stamping producers and missing columns") {
    // a frame with no such column at all — the documented None, not FIELD_NOT_FOUND
    assert(Tokenizer.stampedFingerprint(Seq((1L, "x")).toDF("doc_id", "text")) == None)
    // the column exists but carries no stamp (plain producer)
    assert(Tokenizer.stampedFingerprint(
      Seq((1L, 3L)).toDF("doc_id", "n_bpe_tokens")) == None)
    // a stamped frame queried under the WRONG column name: None, not a throw
    val m = BpeModel(IndexedSeq(("a", "b")))
    val counts = Tokenizer.bpeTokenCounts(Seq((1L, "ab")).toDF("doc_id", "text"), m)
    assert(Tokenizer.stampedFingerprint(counts, "no_such_column") == None)
    assert(Tokenizer.stampedFingerprint(counts).contains(m.fingerprint))
  }

  test("bpeDrift: quiet on the trained distribution, loud on a swapped vocabulary") {
    // trained corpus: words the model fully absorbs after training
    val trained = (1 to 200).map(i =>
      (i.toLong, s"alpha beta gamma delta word${i % 5}")).toDF("doc_id", "text")
    val m = Tokenizer.trainBpe(trained, numMerges = 60)
    // stationary fresh wave: same distribution → heads agree, fertility flat
    val fresh0 = (201 to 300).map(i =>
      (i.toLong, s"alpha beta gamma delta word${i % 5}")).toDF("doc_id", "text")
    val d0 = Tokenizer.bpeDrift(trained, fresh0, m, k = 20)
    assert(d0.headDistance <= 0.1, s"stationary wave must keep the head: $d0")
    assert(math.abs(d0.fertilityFresh - d0.fertilityTrained) < 0.1, s"$d0")
    // drifted wave: an unseen vocabulary → the trained merges never fire,
    // words fragment to characters — head turns over AND fertility jumps
    val fresh1 = (301 to 400).map(i =>
      (i.toLong, s"zzyx qwvk jjpu mmnn xx${i % 5}yy")).toDF("doc_id", "text")
    val d1 = Tokenizer.bpeDrift(trained, fresh1, m, k = 20)
    assert(d1.headDistance >= 0.5, s"swapped vocabulary must turn the head over: $d1")
    assert(d1.fertilityFresh > d1.fertilityTrained + 0.5,
      s"unseen words must fragment (fertility rise): $d1")
  }
}
