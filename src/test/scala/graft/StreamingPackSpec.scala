package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TrainingSet
import graft.streaming.StreamingOps

/**
 * Continuous whole-doc packing ([[StreamingOps.packWholeBatchFn]]): the
 * concatenated per-batch manifests must be byte-identical to packing the
 * whole stream in one batch pass — bins must CONTINUE across micro-batch
 * boundaries through the two-long `(bin, fill)` state, and a replayed
 * committed batch must be a no-op.
 */
class StreamingPackSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  private def doc(id: Long, k: Int): (Long, String) = (id, Seq.fill(k)("w").mkString(" "))

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Long, Long)] =
    df.select("doc_id", "n_tokens", "bin_id", "bin_offset").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq.sorted

  test("three micro-batches splice into the batch fold: bins continue across triggers") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("graft-pack-stream").toString
    val (root, out, ckpt) = (s"$tmp/state", s"$tmp/packed", s"$tmp/ckpt")
    StreamingOps.seedPackState(root)

    val ms = MemoryStream[(Long, String)]
    val q = StreamingOps.packSequencesWholeStream(
      ms.toDF().toDF("doc_id", "text"), root, out, ckpt, capTokens = 10L)
    try {
      ms.addData(doc(1, 4), doc(2, 7)); q.processAllAvailable()
      ms.addData(doc(3, 3)); q.processAllAvailable()
      ms.addData(doc(4, 6), doc(5, 2)); q.processAllAvailable()
    } finally q.stop()

    // hand trace at cap 10: 4→bin0; 7 rolls→bin1; 3 fits bin1@7 (ACROSS the
    // batch boundary — only carried state can know bin1 holds 7); 6
    // rolls→bin2; 2 fits bin2@6
    val got = rows(spark.read.parquet(s"$out/batch=*"))
    assert(got == Seq((1L, 4L, 0L, 0L), (2L, 7L, 1L, 0L), (3L, 3L, 1L, 7L),
      (4L, 6L, 2L, 0L), (5L, 2L, 2L, 6L)))
    // parity with the one-pass batch operator on the concatenation
    val batch = rows(TrainingSet.packSequencesWhole(
      Seq(doc(1, 4), doc(2, 7), doc(3, 3), doc(4, 6), doc(5, 2))
        .toDF("doc_id", "text"), 10L))
    assert(got == batch)
    // the store committed v2 and its state equals the batch fold's leaving state
    assert(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(root, "LATEST")), "UTF-8").trim == "v2")
    assert(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(root, "v2")), "UTF-8").trim == "2 8")

    // ---- committed-replay guard: re-running batch 2 with OTHER data is a
    // no-op (the manifest on disk is already v2's output) ----
    StreamingOps.packWholeBatchFn(root, out, 10L)(
      Seq(doc(99, 9)).toDF("doc_id", "text"), 2L)
    assert(rows(spark.read.parquet(s"$out/batch=2"))
      == Seq((4L, 6L, 2L, 0L), (5L, 2L, 2L, 6L)))
  }

  test("non-zero seed state continues an existing layout") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-pack-seed").toString
    val (root, out) = (s"$tmp/state", s"$tmp/packed")
    // an existing layout left bin 7 filled to 9 of 10
    StreamingOps.seedPackState(root, (7L, 9L))
    StreamingOps.packWholeBatchFn(root, out, 10L)(
      Seq(doc(50, 1), doc(51, 2)).toDF("doc_id", "text"), 0L)
    // 1 fits bin7@9 exactly; 2 rolls to bin 8
    assert(rows(spark.read.parquet(s"$out/batch=0"))
      == Seq((50L, 1L, 7L, 9L), (51L, 2L, 8L, 0L)))
  }
}
