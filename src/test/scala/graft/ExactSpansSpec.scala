package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/**
 * Exact substring-level span dedup ([[Dedup.exactSpans]]) on hand-traced
 * fixtures: exact boundaries and lengths, maximality, multiple runs per
 * pair, sub-threshold runs suppressed, repeated-substring occurrences, the
 * lossless winnowing prefilter, and the no-cartesian plan contract.
 */
class ExactSpansSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  private def tok(range: Range, prefix: String = "w"): Seq[String] =
    range.map(i => s"$prefix$i")

  // doc 1: tokens w0..w19 (20 tokens)
  // doc 2: x0 x1 x2 ++ w2..w17 ++ y0 y1   → shares the 16-token run w2..w17
  //        (a_start=2, b_start=3, len=16; neighbors differ → maximal)
  // doc 3: unrelated
  private def docs = Seq(
    (1L, tok(0 until 20).mkString(" ")),
    (2L, (tok(0 until 3, "x") ++ tok(2 until 18) ++ tok(0 until 2, "y")).mkString(" ")),
    (3L, tok(100 until 130, "z").mkString(" "))
  ).toDF("doc_id", "text")

  private def spans(df: org.apache.spark.sql.DataFrame,
                    gramK: Int = 8, minLen: Int = 16, prefilter: Boolean = true) =
    Dedup.exactSpans(df, gramK = gramK, minLen = minLen, winnowPrefilter = prefilter)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq

  test("exact boundaries and length of a single maximal shared run") {
    assert(spans(docs) == Seq((1L, 2L, 2L, 3L, 16L)))
  }

  test("runs shorter than minLen are suppressed; minLen is inclusive") {
    assert(spans(docs, minLen = 17).isEmpty)   // run is exactly 16 tokens
    assert(spans(docs, minLen = 16).nonEmpty)
  }

  test("two disjoint shared runs in one pair emit two rows with exact extents") {
    // doc 5 shares w0..w9 (10 tokens, at b=0) and w12..w23 (12 tokens, at b=11)
    // with doc 4; the single gap token g0 breaks the diagonal
    val d = Seq(
      (4L, tok(0 until 24).mkString(" ")),
      (5L, (tok(0 until 10) ++ Seq("g0") ++ tok(12 until 24)).mkString(" "))
    ).toDF("doc_id", "text")
    assert(spans(d, gramK = 6, minLen = 10) ==
      Seq((4L, 5L, 0L, 0L, 10L), (4L, 5L, 12L, 11L, 12L)))
  }

  test("a run repeated inside one doc emits one span per occurrence (per diagonal)") {
    // doc 7 contains doc 6's 12-token run TWICE at different offsets
    val run = tok(0 until 12)
    val d = Seq(
      (6L, run.mkString(" ")),
      (7L, (tok(0 until 2, "p") ++ run ++ tok(0 until 3, "q") ++ run).mkString(" "))
    ).toDF("doc_id", "text")
    val got = spans(d, gramK = 6, minLen = 12)
    assert(got == Seq((6L, 7L, 0L, 2L, 12L), (6L, 7L, 0L, 17L, 12L)))
  }

  test("winnowing prefilter is lossless on the sf0.001 documents corpus") {
    val corpus = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val withPre = spans(corpus, prefilter = true)
    val without = spans(corpus, prefilter = false)
    assert(withPre == without, s"prefilter dropped ${without.size - withPre.size} spans")
    assert(withPre.nonEmpty, "fixture corpus must contain qualifying shared spans")
  }

  test("plan contains no cartesian and no broadcast nested loop") {
    val plan = Dedup.exactSpans(docs).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"span extraction must stay an equality join:\n$plan")
  }

  test("cutSpans: higher-id doc loses the covered tokens, lower-id and bystanders keep theirs") {
    val got = Dedup.cutSpans(docs, Dedup.exactSpans(docs)).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    // doc 2 loses b_start=3 .. 3+16-1 (its copy of w2..w17), keeps x0 x1 x2 y0 y1
    assert(got(2L) == (("x0 x1 x2 y0 y1", 16L)))
    // doc 1 (lowest id of the pair) and doc 3 (no span) keep original bytes
    assert(got(1L) == ((tok(0 until 20).mkString(" "), 0L)))
    assert(got(3L) == ((tok(100 until 130, "z").mkString(" "), 0L)))
  }

  test("cutSpans: overlapping spans on one doc remove the position UNION, once") {
    // synthetic span frame: doc 9 covered by [2,6) and [4,9) → union [2,9), 7 tokens
    val d = Seq((9L, tok(0 until 12).mkString(" "))).toDF("doc_id", "text")
    val sp = Seq((1L, 9L, 0L, 2L, 4L), (1L, 9L, 0L, 4L, 5L))
      .toDF("id_a", "id_b", "a_start", "b_start", "len")
    val got = Dedup.cutSpans(d, sp).collect()
      .map(r => (r.getString(1), r.getLong(2))).head
    assert(got == (("w0 w1 w9 w10 w11", 7L)))
  }

  test("cutSpans: a doc cut to nothing yields empty text, full token count removed") {
    val d = Seq((1L, tok(0 until 16).mkString(" ")),
      (2L, tok(0 until 16).mkString(" "))).toDF("doc_id", "text")
    val got = Dedup.cutSpans(d, Dedup.exactSpans(d)).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(got(1L)._2 == 0L)
    assert(got(2L) == (("", 16L)))
  }

  test("cutSpans: transitive triple keeps exactly the minimum-id copy intact") {
    val t = tok(0 until 18).mkString(" ")
    val d = Seq((5L, t), (6L, t), (7L, t)).toDF("doc_id", "text")
    val got = Dedup.cutSpans(d, Dedup.exactSpans(d)).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got == Map(5L -> 0L, 6L -> 18L, 7L -> 18L))
  }
}
