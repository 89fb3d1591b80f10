package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * sf1-sweep input builder (VERDICT r6 #7): the driver ships testdata up to
 * sf0.1; this tool writes a `factor`×-scaled copy (default 10× ⇒ "sf1") so
 * the WHOLE registered query suite can be swept one decade past the graded
 * scale and SCALE.md can record which plans actually grow. Replica 0 is the
 * original corpus byte-for-byte; replicas r ≥ 1 are transformed so the
 * scaled corpus behaves like MORE data, not 10 copies of the same data:
 *
 *  - ids shift by r·10¹¹ — residues mod 5/10/20/50 are preserved, so every
 *    registered split (delta crawls, benchmark splits) scales in place;
 *  - document tokens get a per-replica suffix — no shingle, fingerprint or
 *    hash collides across replicas, so dedup candidate volume grows
 *    linearly (10 verbatim copies would grow it quadratically and measure
 *    a different operator);
 *  - embeddings rotate by r·7 components — unit norms and intra-replica
 *    geometry survive, cross-replica vectors decorrelate, and the ANN
 *    query set (vec_id < 10) stays the original 10 queries against a 10×
 *    corpus;
 *  - events/orders/lineitem keep their timestamps (10× rows per bucket —
 *    the actual scaling a busier stream produces), keys shift.
 *
 * Timestamps are written NORMALIZED (µs / LTZ): `Tables` branches on the
 * physical type, so the scaled dir loads through the same code path the
 * driver's nanos parquet does (the branch is spec-tested).
 *
 *   sbt "runMain graft.MakeScaled /root/testdata/sf0.1 /tmp/graft-sf1 10"
 *   SPARK_GRAFT_SF_DIR=/tmp/graft-sf1 sbt "runMain graft.Bench"
 */
object MakeScaled {
  private val Shift = 100000000000L // per-replica id offset; ≡ 0 mod every split divisor

  def main(args: Array[String]): Unit = {
    val src = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val dst = if (args.length > 1) args(1) else "/tmp/graft-sf1"
    val factor = if (args.length > 2) args(2).toInt else 10
    require(factor >= 1, s"factor must be >= 1: $factor")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.sources.Tables

    def write(name: String, df: DataFrame): Unit = {
      df.write.mode("overwrite").parquet(s"$dst/$name.parquet")
      println(s"[scaled] $name: ${spark.read.parquet(s"$dst/$name.parquet").count()} rows")
    }
    def replicate(base: DataFrame)(f: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until factor).map(r => f(base, r)).reduce(_ unionAll _)

    write("events", replicate(Tables.events(spark, src)) { (d, r) =>
      d.withColumn("event_id", col("event_id") + lit(r * Shift))
        .withColumn("user_id", col("user_id") + lit(r * Shift))
    })
    write("documents", replicate(Tables.documents(spark, src)) { (d, r) =>
      val salted =
        if (r == 0) d
        else d.withColumn("text",
            concat_ws(" ", transform(split(col("text"), "\\s+"), t => concat(t, lit(s"q$r")))))
          .withColumn("n_chars", length(col("text")))
      salted.withColumn("doc_id", col("doc_id") + lit(r * Shift))
    })
    write("embeddings", replicate(Tables.embeddings(spark, src)) { (d, r) =>
      val k = (r * 7) % 64
      val rotated =
        if (k == 0) d
        else d.withColumn("embedding",
          concat(slice(col("embedding"), k + 1, 64 - k), slice(col("embedding"), 1, k)))
      rotated.withColumn("vec_id", col("vec_id") + lit(r * Shift))
    })
    write("orders", replicate(Tables.orders(spark, src)) { (d, r) =>
      d.withColumn("o_orderkey", col("o_orderkey") + lit(r * Shift))
        .withColumn("o_custkey", col("o_custkey") + lit(r * Shift))
    })
    write("lineitem", replicate(
      Tables.lineitemShipRange(spark, src, Long.MinValue / 2000, Long.MaxValue / 2000)) { (d, r) =>
      d.withColumn("l_orderkey", col("l_orderkey") + lit(r * Shift))
        .withColumn("l_partkey", col("l_partkey") + lit(r * Shift))
        .withColumn("l_suppkey", col("l_suppkey") + lit(r * Shift))
    })
    for (t <- Seq("region", "nation", "customer", "supplier", "part"))
      write(t, spark.read.parquet(s"$src/$t.parquet"))
    spark.stop()
  }
}
