package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/**
 * The config-driven deployment path: a session built with
 * `spark.sql.extensions=graft.GraftExtensions` (no programmatic register
 * call) must expose every graft SQL function. This is how a pure-SQL
 * environment — Thrift server, SQL gateway — would consume the library.
 */
class ExtensionsSpec extends AnyFunSuite {

  private def withExtensionSession[A](f: SparkSession => A): A = {
    val base = SparkTestSession.spark // ensures a SparkContext exists
    // both active AND default must be cleared or getOrCreate returns the
    // existing session and never applies the extensions conf
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    // builder reuses the running context but constructs a NEW session, which
    // is when extensions are applied. withExtensions is the same injection
    // path `spark.sql.extensions=graft.GraftExtensions` takes — that conf is
    // static (read at SparkContext creation), so a shared-context test must
    // use the programmatic entry.
    val s = SparkSession.builder()
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try f(s)
    finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }

  test("GraftExtensions-injected session resolves every graft SQL function") {
    withExtensionSession { s =>
      val bucket = s.sql(
        "SELECT ts_bucket(1704067201234, 1704067200000, 900000) AS b")
        .collect().head.getLong(0)
      assert(bucket == 1704067200000L)

      assert(s.sql("SELECT array_dot_product(array(1L,2L,3L), array(4L,5L,6L)) AS d")
        .collect().head.getLong(0) == 32L)

      // round-trip the binary codec purely in SQL
      val rt = s.sql(
        "SELECT bytes_be_to_long(long_to_bytes_be(-123456789, 8), 8, true) AS v")
        .collect().head.getLong(0)
      assert(rt == -123456789L)

      assert(s.sql("SELECT long_bits_to_double(4611686018427387904L) AS d")
        .collect().head.getDouble(0) == 2.0)

      // sketch functions parse and execute with literal shape parameters
      val sig = s.sql(
        "SELECT minhash_signature(array(11L, 22L, 33L), 4, 42) AS sig")
        .collect().head.getSeq[Long](0)
      assert(sig.length == 4 && sig.forall(_ >= 0))
      val keys = s.sql(
        "SELECT srp_lsh_keys(array(CAST(0.5 AS FLOAT), CAST(-0.25 AS FLOAT)), 2, 3, 2) AS k")
        .collect().head.getSeq[Long](0)
      assert(keys.length == 3 && keys.forall(k => k >= 0 && k < 4))

      // non-literal shape parameters are rejected eagerly
      val err = intercept[Exception](
        s.sql("SELECT bytes_be_to_long(long_to_bytes_be(1, 8), CAST(id AS INT) + 7, true) FROM range(1)")
          .collect())
      assert(err.getMessage.contains("literal integer"))

      // winnowing from pure SQL: any run >= window+k-1 grams shares a
      // fingerprint, and here the whole array is one run
      val fps = s.sql(
        "SELECT winnow_fingerprints(array(5L, 3L, 9L, 1L, 7L, 2L), 3) AS f")
        .collect().head.getSeq[Long](0)
      assert(fps.nonEmpty && fps.toSet.subsetOf(Set(5L, 3L, 9L, 1L, 7L, 2L)))

      // integer-exact cell assignment with a FOLDABLE centroid matrix:
      // qv = (10, 0) scores 10 against cell 0 = (1, 0) and 0 against
      // cell 1 = (0, 1) → probe order (0, 1)
      val cells = s.sql(
        "SELECT nearest_centroids_q(array(10L, 0L), array(1L, 0L, 0L, 1L), 2, 2, 2) AS c")
        .collect().head.getSeq[Int](0)
      assert(cells == Seq(0, 1))

      // perceptual hash from pure SQL: identical pixels through PNG → a
      // defined hash; garbage bytes → NULL (no invented identity)
      val png = graft.operators.Multimodal.MediaCodec.wrapPng(
        16, 8, Array.tabulate(16 * 8 * 3)(i => (i % 130).toByte))
      s.createDataFrame(
        java.util.List.of(org.apache.spark.sql.Row(png, Array.fill(40)(9.toByte))),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("img", org.apache.spark.sql.types.BinaryType),
          org.apache.spark.sql.types.StructField("junk", org.apache.spark.sql.types.BinaryType))))
        .createOrReplaceTempView("media_sql")
      val dh = s.sql("SELECT image_dhash(img) AS h, image_dhash(junk) AS j FROM media_sql")
        .collect().head
      assert(!dh.isNullAt(0) && dh.isNullAt(1))
    }
  }
}
