package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal column plumbing: image/audio/video payloads as opaque `binary`
 * columns with typed metadata, processed batch-at-a-time inside partitions.
 *
 * The Spark-side architecture is the real deliverable here — schema,
 * partition-local batching, and feature extraction shape are production-real
 * and tested; the codec itself is a stub (this container has no image/audio
 * libraries), clearly marked at [[MediaCodec.decodeStub]]. Swapping in a real
 * decoder (JNI/FFI or an external service) touches exactly that one function:
 * everything else — the `mapPartitions` batching, the feature schema, the
 * downstream ANN compatibility — is unchanged.
 *
 * Scale design: payloads never pass through a shuffle. Decode/featurize are
 * narrow per-partition maps; only the (small) feature vectors and metadata
 * continue into joins/aggregations. At 100 TB of media this is the difference
 * between shuffling terabytes of pixels and shuffling kilobytes of floats.
 */
object Multimodal {

  case class MediaMeta(width: Int, height: Int, sampleRate: Int, durationMs: Long, codec: String)
  case class MediaRecord(media_id: Long, kind: String, payload: Array[Byte], meta: MediaMeta)
  case class MediaFeatures(media_id: Long, kind: String, n_bytes: Long, features: Array[Float])

  object MediaCodec {
    val FeatureDim = 16

    /**
     * STUB — deterministic fake decode/featurize. A real implementation would
     * decode the payload (JPEG/PNG/PCM/container format) and run a feature
     * extractor here; the container has no media libraries, so features are a
     * seeded hash-fold of the payload bytes: deterministic, content-sensitive,
     * and unit-norm — shape-compatible with [[Similarity]] consumers.
     */
    def decodeStub(payload: Array[Byte]): Array[Float] = {
      val raw = Array.tabulate(FeatureDim) { i =>
        var h = 1125899906842597L + i * 2654435761L
        var j = 0
        while (j < payload.length) { h = 31 * h + payload(j); j += 1 }
        (h % 10007).toFloat / 10007.0f
      }
      val norm = math.sqrt(raw.map(x => x.toDouble * x).sum).toFloat max 1e-9f
      raw.map(_ / norm)
    }

    /** STUB — "resize": a real decoder would rescale pixels; we re-window bytes. */
    def resizeStub(payload: Array[Byte], maxBytes: Int): Array[Byte] =
      payload.take(maxBytes)

    /** STUB — frame sampling: every `stride`-th chunk of the payload. */
    def frameSampleStub(payload: Array[Byte], frameSize: Int, stride: Int): Seq[Array[Byte]] =
      payload.grouped(frameSize).zipWithIndex.collect { case (f, i) if i % stride == 0 => f }.toSeq
  }

  /**
   * Featurize a media table partition-locally. `mapPartitions` (not `map`) so
   * a real codec can amortize per-batch setup (model load, JNI context) across
   * the partition — the same batching contract a vectorized UDF would give.
   */
  def featurize(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition codec setup would happen HERE, once per task
      it.map { r =>
        MediaFeatures(r.media_id, r.kind, r.payload.length.toLong,
          MediaCodec.decodeStub(r.payload))
      }
    }
  }

  /** Frame-sampled featurization for video-kind records: one row per sampled frame. */
  def frameFeatures(media: Dataset[MediaRecord], frameSize: Int = 256, stride: Int = 2): DataFrame = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      MediaCodec.frameSampleStub(r.payload, frameSize, stride).zipWithIndex.map {
        case (frame, idx) => (r.media_id, idx, MediaCodec.decodeStub(frame))
      }
    }.toDF("media_id", "frame_idx", "features")
  }

  /**
   * Deterministic synthetic media table (payload bytes derived from the id) —
   * the fixture generator for tests and the demo query; stands in for a real
   * binary-payload source.
   */
  def syntheticMedia(spark: SparkSession, n: Int, partitions: Int = 4): Dataset[MediaRecord] = {
    import spark.implicits._
    spark.range(n).repartition(partitions).map { r =>
      val id = r.longValue()
      val kind = Seq("image", "audio", "video")((id % 3).toInt)
      val len = 64 + (id % 64).toInt * 8
      val payload = Array.tabulate(len)(i => ((id * 31 + i * 7) % 251).toByte)
      MediaRecord(id, kind, payload,
        MediaMeta(width = 16 + (id % 16).toInt, height = 16, sampleRate = 16000,
          durationMs = 1000 + id % 5000, codec = "stub"))
    }
  }

  /** Demo pipeline: synthesize → featurize → per-kind stats (the demo query). */
  def mediaPipeline(spark: SparkSession, n: Int): DataFrame = {
    val feats = featurize(syntheticMedia(spark, n))
    feats.groupBy(col("kind"))
      .agg(
        count(lit(1)).as("n_media"),
        sum(col("n_bytes")).as("total_bytes"),
        round(avg(element_at(col("features"), 1)), 6).as("avg_f0"))
      .orderBy("kind")
  }
}
