package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Aggregators
import graft.operators.{Multimodal, TimeMode, TsAggSpec}
import graft.streaming.StreamingTsAgg

class MultimodalStreamingSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  // shared by the binary-cell streaming tests: the fixture's mask/epoch and
  // the decode projection (mask extraction + qualifier offset + longBE value)
  private val FixtureSf = "/root/testdata/sf0.001"
  private val FixtureT0 = 1704067200000L
  private val FixtureMask = "000000001111"
  private def decodeCells(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import graft.functions.{Decoders, RowKeys}
    df.withColumn("ts", timestamp_millis(
        RowKeys.keyMillis(col("key"), FixtureMask, Decoders.intBE(col("qual")))))
      .withColumn("v", Decoders.longBE(col("value")))
  }

  test("media featurization: deterministic, content-sensitive, partition-invariant") {
    val recs = Multimodal.featurize(Multimodal.syntheticMedia(spark, 100, partitions = 2))
      .collect()
    val a = recs.map(f => f.media_id -> f.features.toSeq).toMap
    val b = Multimodal.featurize(Multimodal.syntheticMedia(spark, 100, partitions = 7))
      .collect().map(f => f.media_id -> f.features.toSeq).toMap
    assert(a == b)
    // stub-path features (raw video blobs only, now) stay unit-norm;
    // content-derived features (bmp/jpeg/png pixels / wav samples / mjpeg
    // frame means) carry real statistics instead
    val stubbed = recs.filter(f => f.kind == "video" && f.codec == "raw")
    assert(stubbed.nonEmpty &&
      stubbed.forall(f => math.abs(f.features.map(x => x * x).sum - 1.0) < 1e-3))
    val mjpegs = recs.filter(_.codec == "mjpeg")
    assert(mjpegs.nonEmpty && mjpegs.forall(f =>
      f.width == 16 && f.duration_ms >= 80L && f.features(0) > 0.2f && f.features(0) < 0.8f))
    val content = recs.filter(f =>
      f.codec == "bmp" || f.codec == "png" || f.codec.startsWith("jpeg") ||
        f.codec.startsWith("pcm_"))
    assert(content.nonEmpty && content.forall(_.features.exists(_ != 0f)))
    // the fixture's PNGs/JPEGs roundtrip real encoders: their channel means
    // are real pixel stats (content bytes mod 251 → mean well inside (0,1)),
    // not the stub's unit-norm hash
    val decoded = recs.filter(f => f.codec == "png" || f.codec.startsWith("jpeg"))
    assert(decoded.nonEmpty &&
      decoded.forall(f => f.features(0) > 0.2f && f.features(0) < 0.8f))
    assert(a(0L) != a(1L)) // content-sensitive
  }

  test("BMP features respect 4-byte row padding on conforming files") {
    import Multimodal.MediaCodec
    // width 17 → 51 pixel bytes + 1 pad byte per row (stride 52), height 2;
    // pads are 0xFF garbage that must not leak into any statistic
    val rows = Array.fill(2)(Array.fill[Byte](51)(100.toByte) :+ 0xFF.toByte).flatten
    val f = MediaCodec.contentFeatures(MediaCodec.wrapBmp(17, 2, rows)).get
    assert(f(0) == (100 / 255.0).toFloat && f(0) == f(1) && f(1) == f(2),
      s"channel means polluted by row padding: ${f.take(3).toSeq}")
    assert(f(6) == 100 / 255.0f && f(7) == 100 / 255.0f,
      s"min/max saw pad bytes: ${f(6)} / ${f(7)}")
  }

  test("JPEG probe skips fill bytes and TEM markers (T.81 B.1.1.2)") {
    import Multimodal.MediaCodec
    val j = MediaCodec.wrapJpeg(320, 240, Array.fill[Byte](32)(7))
    // splice an optional fill byte and a standalone TEM right after SOI:
    // FF D8 | FF(fill) | FF 01(TEM) | original segments
    val spliced = j.take(2) ++ Array(0xFF.toByte, 0xFF.toByte, 0x01.toByte) ++ j.drop(2)
    val m = MediaCodec.probe(spliced)
    assert(m.exists(x => x.width == 320 && x.height == 240 && x.codec == "jpeg"),
      s"valid-but-padded JPEG not probed: $m")
  }

  test("BMP/WAV header probe extracts real container fields; others fall back") {
    import Multimodal.MediaCodec
    val bmp = MediaCodec.wrapBmp(640, 480, Array.fill[Byte](16)(3))
    val pb = MediaCodec.probe(bmp)
    assert(pb.exists(m => m.width == 640 && m.height == 480 && m.codec == "bmp"))
    // 16000 Hz, 16-bit mono → byteRate 32000; 8000 data bytes = 250 ms
    val wav = MediaCodec.wrapWav(16000, Array.fill[Byte](8000)(1))
    val pw = MediaCodec.probe(wav)
    assert(pw.exists(m =>
      m.sampleRate == 16000 && m.durationMs == 250L && m.codec == "pcm_s16le"))
    assert(MediaCodec.probe(Array[Byte](1, 2, 3)).isEmpty)
    assert(MediaCodec.probe("RIFFxxxxJUNK".getBytes("US-ASCII") ++ new Array[Byte](40)).isEmpty)

    // probed metadata flows through featurize: synthetic images/audio carry
    // real containers, so width/sample_rate in the output are header-derived
    import spark.implicits._
    val feats = Multimodal.featurize(Multimodal.syntheticMedia(spark, 30)).collect()
    val images = feats.filter(_.kind == "image")
    assert(images.forall(f => f.width >= 16 &&
      Set("bmp", "jpeg", "jpeg-progressive", "png").contains(f.codec)))
    // the synthetic corpus rotates image containers so every probe is live
    assert(images.map(_.codec).toSet == Set("bmp", "jpeg", "png"))
    assert(feats.filter(_.kind == "audio").forall(f => f.sample_rate >= 8000 && f.codec.startsWith("pcm_")))
    // video alternates: MJPG containers probe (first-frame geometry), raw
    // blobs fall back to the record's claimed meta
    val vids = feats.filter(_.kind == "video")
    assert(vids.map(_.codec).toSet == Set("raw", "mjpeg"))
    assert(vids.forall(f =>
      (f.codec == "raw" && f.width == 0) || (f.codec == "mjpeg" && f.width == 16)))
  }

  test("JPEG SOF and PNG IHDR probes read crafted dimensions") {
    import Multimodal.MediaCodec
    val jpeg = MediaCodec.wrapJpeg(123, 45, Array.fill[Byte](32)(7))
    assert(MediaCodec.probe(jpeg).exists(m =>
      m.width == 123 && m.height == 45 && m.codec == "jpeg"))
    val png = MediaCodec.wrapPng(300, 200, Array.fill[Byte](300 * 200 * 3)(7))
    assert(MediaCodec.probe(png).exists(m =>
      m.width == 300 && m.height == 200 && m.codec == "png"))
    // truncated / garbage JPEG bodies don't probe
    assert(MediaCodec.probe(Array(0xff.toByte, 0xd8.toByte, 0x01, 0x02)).isEmpty)
  }

  test("WAV content features: known values on a crafted square wave") {
    import Multimodal.MediaCodec
    // ±16384 alternating: RMS = 0.5, every step crosses zero (ZCR = 1),
    // peak = 0.5, DC mean = 0, every energy window = 0.5
    val n = 480
    val samples = new Array[Byte](n * 2)
    for (i <- 0 until n) {
      val v = if (i % 2 == 0) 16384 else -16384
      samples(2 * i) = (v & 0xff).toByte
      samples(2 * i + 1) = ((v >> 8) & 0xff).toByte
    }
    val f = MediaCodec.contentFeatures(MediaCodec.wrapWav(8000, samples))
      .getOrElse(fail("wav payload must take the content path"))
    assert(math.abs(f(0) - 0.5f) < 1e-4, s"rms ${f(0)}")
    assert(math.abs(f(1) - 1.0f) < 1e-4, s"zcr ${f(1)}")
    assert(math.abs(f(2) - 0.5f) < 1e-4, s"peak ${f(2)}")
    assert(math.abs(f(3)) < 1e-4, s"mean ${f(3)}")
    (4 until 16).foreach(i => assert(math.abs(f(i) - 0.5f) < 1e-4, s"window rms $i ${f(i)}"))
  }

  test("BMP content features: known values on solid-color pixels") {
    import Multimodal.MediaCodec
    // 4 px of BGR (10, 100, 200): channel means exact, stds 0, min/max known,
    // intensity histogram = 1/3 in bins 0 (10), 3 (100), 6 (200)
    val pixels = Array.fill(4)(Array[Byte](10, 100.toByte, 200.toByte)).flatten
    val f = MediaCodec.contentFeatures(MediaCodec.wrapBmp(2, 2, pixels))
      .getOrElse(fail("bmp payload must take the content path"))
    assert(math.abs(f(0) - 10f / 255) < 1e-4 && math.abs(f(1) - 100f / 255) < 1e-4 &&
      math.abs(f(2) - 200f / 255) < 1e-4, "channel means")
    assert(f(3) == 0f && f(4) == 0f && f(5) == 0f, "solid color → zero std")
    assert(math.abs(f(6) - 10f / 255) < 1e-4 && math.abs(f(7) - 200f / 255) < 1e-4, "min/max")
    assert(math.abs(f(8) - 1f / 3) < 1e-4 && math.abs(f(11) - 1f / 3) < 1e-4 &&
      math.abs(f(14) - 1f / 3) < 1e-4, "histogram bins")
    assert(f(9) == 0f && f(10) == 0f && f(12) == 0f && f(13) == 0f && f(15) == 0f)
  }

  test("PNG pixel decode: every filter type reconstructs the same image") {
    import Multimodal.MediaCodec
    // a deterministic RGB gradient; whatever per-row filter the encoder
    // picks, inflate+unfilter must reconstruct identical pixels → identical
    // features (and they must equal the stats of the same pixels as a BMP,
    // up to channel order — here all three channels share the distribution)
    val (w, h) = (16, 10)
    val pixels = Array.tabulate(w * h * 3)(i => ((i * 13) % 251).toByte)
    val byFilter = (0 to 4).map { ft =>
      val png = MediaCodec.wrapPng(w, h, pixels, rowFilter = _ => ft)
      MediaCodec.contentFeatures(png)
        .getOrElse(fail(s"png with filter $ft must take the content path")).toSeq
    }
    assert(byFilter.distinct.size == 1, "filter types disagree after unfilter")
    // mixed filters too (the synthetic corpus rotates them per row)
    val mixed = MediaCodec.contentFeatures(
      MediaCodec.wrapPng(w, h, pixels, rowFilter = y => y % 5)).get.toSeq
    assert(mixed == byFilter.head)
  }

  test("PNG decode: solid color yields exact channel stats") {
    import Multimodal.MediaCodec
    val pixels = Array.fill(6)(Array[Byte](10, 100.toByte, 200.toByte)).flatten // 2x3 RGB
    val f = MediaCodec.contentFeatures(MediaCodec.wrapPng(2, 3, pixels, _ => 4)).get
    assert(math.abs(f(0) - 10f / 255) < 1e-4 && math.abs(f(1) - 100f / 255) < 1e-4 &&
      math.abs(f(2) - 200f / 255) < 1e-4, "RGB channel means")
    assert(f(3) == 0f && f(4) == 0f && f(5) == 0f, "solid color → zero std")
    assert(math.abs(f(6) - 10f / 255) < 1e-4 && math.abs(f(7) - 200f / 255) < 1e-4)
  }

  test("PNG decode: corrupt or foreign IDAT falls back to the stub path") {
    import Multimodal.MediaCodec
    val good = MediaCodec.wrapPng(8, 8, Array.fill[Byte](8 * 8 * 3)(42), _ => 1)
    // corrupt the IDAT payload in place (skip sig+IHDR = 8 + 25 bytes, then
    // past the IDAT len+tag): the zlib stream no longer inflates
    val bad = good.clone()
    for (i <- 45 until math.min(60, bad.length)) bad(i) = 0x55
    assert(MediaCodec.probe(bad).exists(_.codec == "png"), "header still probes")
    assert(MediaCodec.contentFeatures(bad).isEmpty, "corrupt IDAT must not decode")
    // truncated-but-valid-zlib: declared geometry larger than the pixel data
    val short = MediaCodec.wrapPng(8, 8, Array.fill[Byte](8 * 8 * 3)(42))
    val patched = short.clone()
    patched(20) = 1 // IHDR height 8 → 264 (BE byte 2): inflate can't fill it
    assert(MediaCodec.contentFeatures(patched).isEmpty)
  }

  test("JPEG content features: JDK encode→decode roundtrip preserves pixel stats") {
    import Multimodal.MediaCodec
    // solid mid-gray survives JPEG's lossy pipeline essentially exactly
    val (w, h) = (32, 24)
    val solid = Array.fill(w * h * 3)(128.toByte)
    val jpeg = MediaCodec.encodeJpeg(w, h, solid)
    assert(MediaCodec.probe(jpeg).exists(m =>
      m.width == w && m.height == h && m.codec.startsWith("jpeg")),
      "hand-rolled SOF probe must read the JDK encoder's output")
    val f = MediaCodec.contentFeatures(jpeg)
      .getOrElse(fail("JDK-encoded jpeg must take the content path"))
    for (c <- 0 to 2)
      assert(math.abs(f(c) - 128f / 255) < 0.02, s"channel $c mean ${f(c)}")
    assert(f(3) < 0.02 && f(4) < 0.02 && f(5) < 0.02, "solid color → ~zero std")
    // determinism: same pixels → same bytes → same features
    assert(MediaCodec.contentFeatures(MediaCodec.encodeJpeg(w, h, solid)).get.toSeq == f.toSeq)
    // an opaque-body container (wrapJpeg) probes but cannot decode → stub path
    assert(MediaCodec.contentFeatures(
      MediaCodec.wrapJpeg(32, 24, Array.fill[Byte](64)(9))).isEmpty)
  }

  test("PNG decode: adversarial headers fail fast, never crash or hang") {
    import Multimodal.MediaCodec
    def be32(v: Int) = Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def chunk(tag: String, data: Array[Byte]) = // dummy CRC: the decoder doesn't verify
      be32(data.length) ++ tag.getBytes("US-ASCII") ++ data ++ be32(0)
    val sig = Array(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte,
      0x0d.toByte, 0x0a.toByte, 0x1a.toByte, 0x0a.toByte)
    val ihdr = (w: Int, h: Int) => chunk("IHDR", be32(w) ++ be32(h) ++ Array[Byte](8, 2, 0, 0, 0))
    // (1) header truncated between probe's 24-byte guarantee and the full
    // IHDR: probes as png, must fall back instead of AIOOBE-ing the task
    val truncated = (sig ++ chunk("IHDR", be32(4) ++ be32(4))).take(26)
    assert(MediaCodec.probe(truncated).exists(_.codec == "png"))
    assert(MediaCodec.contentFeatures(truncated).isEmpty)
    // (2) FDICT zlib stream (preset dictionary): inflate() yields 0 with
    // needsInput()==false forever — must return None, not busy-spin
    // (0x78 0x20: valid zlib check bits, dictionary flag set)
    val fdict = Array(0x78.toByte, 0x20.toByte) ++ be32(12345) ++ Array.fill[Byte](16)(3)
    val withDict = sig ++ ihdr(4, 4) ++ chunk("IDAT", fdict) ++ chunk("IEND", Array.empty)
    assert(MediaCodec.contentFeatures(withDict).isEmpty)
    // (3) tiny payload declaring a huge image: rejected by the expansion
    // bound BEFORE any scanline buffer is allocated
    val huge = sig ++ ihdr(9000, 9000) ++ chunk("IDAT", Array.fill[Byte](32)(1)) ++
      chunk("IEND", Array.empty)
    assert(MediaCodec.contentFeatures(huge).isEmpty)
  }

  test("thumbnails: real decode→scale→re-encode for images, stub for raw blobs") {
    import Multimodal.MediaCodec
    // a 64x48 gradient shrinks to fit 16 on the long side → 16x12
    val big = MediaCodec.encodeJpeg(64, 48, Array.tabulate(64 * 48 * 3)(i => (i % 251).toByte))
    val thumb = MediaCodec.resizeImage(big, 16).getOrElse(fail("jpeg must resize"))
    assert(MediaCodec.probe(thumb).exists(m =>
      m.width == 16 && m.height == 12 && m.codec.startsWith("jpeg")))
    assert(thumb.length < big.length)
    // PNG input resizes too (ImageIO reads it; output normalized to JPEG)
    val png = MediaCodec.wrapPng(20, 10, Array.fill(20 * 10 * 3)(99.toByte))
    assert(MediaCodec.resizeImage(png, 8).flatMap(MediaCodec.probe)
      .exists(m => m.width == 8 && m.height == 4))
    // already-small stays at its size; garbage returns None
    assert(MediaCodec.resizeImage(MediaCodec.encodeJpeg(4, 4, Array.fill(48)(7.toByte)), 16)
      .flatMap(MediaCodec.probe).exists(m => m.width == 4 && m.height == 4))
    assert(MediaCodec.resizeImage(Array.fill[Byte](100)(3), 16).isEmpty)
    // the Dataset operator: images resize, raw video blobs fall back
    val rows = Multimodal.thumbnails(Multimodal.syntheticMedia(spark, 30), maxDim = 8)
      .collect()
    assert(rows.length == 30)
    val byKind = rows.groupBy(_.getString(1))
    assert(byKind("image").forall(_.getBoolean(2)), "all images must really resize")
    assert(byKind("video").exists(!_.getBoolean(2)), "raw blobs take the stub")
    assert(rows.forall(r => r.getInt(5) <= math.max(r.getInt(4), 1000)))
  }

  test("streaming featurize: the media pipeline runs on an unbounded stream") {
    import spark.implicits._
    import java.nio.file.Files
    val dir = Files.createTempDirectory("graft-smedia").toFile.getAbsolutePath
    Multimodal.syntheticMedia(spark, 30).write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(spark.read.parquet(dir).schema)
      .parquet(dir).as[Multimodal.MediaRecord]
    val q = Multimodal.featurize(stream)
      .writeStream.outputMode("append").format("memory").queryName("smedia_out").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("smedia_out")
      .collect().map(r => r.getAs[Long]("media_id") -> r.getAs[Seq[Float]]("features")).toMap
    val batch = Multimodal.featurize(Multimodal.syntheticMedia(spark, 30))
      .collect().map(f => f.media_id -> f.features.toSeq).toMap
    assert(streamed.size == 30 && streamed == batch)
  }

  test("media pipeline aggregates per kind with payload accounting") {
    val rows = Multimodal.mediaPipeline(spark, 300).collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("audio", "image", "video"))
    assert(rows.map(_.getLong(1)).sum == 300)
    assert(rows.forall(_.getLong(2) > 0))
  }

  test("frame sampling emits every stride-th frame with features") {
    val df = Multimodal.frameFeatures(Multimodal.syntheticMedia(spark, 10), frameSize = 64, stride = 2)
    val counts = df.groupBy("media_id").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // id 0 is a (now fully pixel-backed) BMP: 822 payload bytes → 13
    // byte-window chunks → every 2nd = 7 rows
    assert(counts(0L) == 7)
    // id 8 is an MJPG video with 2 + ((8/3) % 3) = 4 REAL frames → idx 0 and 2
    assert(counts(8L) == 2)
    assert(counts(9L) >= 1)
    assert(df.filter(size(col("features")) =!= Multimodal.MediaCodec.FeatureDim).count() == 0)
  }

  test("MJPG container: probe, per-frame decode, pooled features, corruption fallback") {
    import Multimodal.MediaCodec
    val frameA = MediaCodec.encodeJpeg(16, 12, Array.fill(16 * 12 * 3)(60.toByte))
    val frameB = MediaCodec.encodeJpeg(16, 12, Array.fill(16 * 12 * 3)(180.toByte))
    val video = MediaCodec.wrapMjpeg(Seq(frameA, frameB))
    // probe: first-frame geometry, 25 fps nominal duration
    assert(MediaCodec.probe(video).exists(m =>
      m.codec == "mjpeg" && m.width == 16 && m.height == 12 && m.durationMs == 80L))
    // pooled features = mean of the two frames' content features
    val pooled = MediaCodec.contentFeatures(video).getOrElse(fail("mjpeg must decode"))
    val (fa, fb) = (MediaCodec.contentFeatures(frameA).get, MediaCodec.contentFeatures(frameB).get)
    for (i <- 0 until MediaCodec.FeatureDim)
      assert(math.abs(pooled(i) - (fa(i) + fb(i)) / 2) < 1e-6, s"feature $i not pooled")
    // frameFeatures: one row per frame (stride 1), each the REAL image descriptor
    import spark.implicits._
    val rows = Multimodal.frameFeatures(
      Seq(Multimodal.MediaRecord(7L, "video", video,
        Multimodal.MediaMeta(0, 0, 0, 0L, "raw"))).toDS(), stride = 1)
      .orderBy("frame_idx").collect()
    assert(rows.length == 2)
    assert(rows(0).getSeq[Float](2) == fa.toSeq && rows(1).getSeq[Float](2) == fb.toSeq)
    // a corrupt length prefix falls back cleanly (no crash, stub features)
    val corrupt = video.clone(); corrupt(4) = 0x7f
    assert(MediaCodec.mjpegFrames(corrupt).isEmpty)
    assert(MediaCodec.contentFeatures(corrupt).isEmpty)
    // length prefix near 2^31: `off + 4 + len` overflows int — the guard
    // must reject it, not attempt a ~2 GB copyOfRange
    val overflow = MediaCodec.MjpegMagic ++
      Array(0x7f.toByte, 0xff.toByte, 0xff.toByte, 0xff.toByte) ++ Array.fill[Byte](4)(1)
    assert(MediaCodec.mjpegFrames(overflow).isEmpty)
    assert(MediaCodec.probe(overflow).isEmpty)
    // nested containers are rejected (depth-1 contract: no crafted payload
    // can drive unbounded probe/decode recursion)
    val nested = MediaCodec.wrapMjpeg(Seq(MediaCodec.wrapMjpeg(Seq(frameA))))
    assert(MediaCodec.mjpegFrames(nested).isEmpty)
    assert(MediaCodec.contentFeatures(nested).isEmpty)
  }

  test("media features compose with similarity search end-to-end") {
    // the multimodal pipeline's output is ANN-ready: featurize → top-k search
    val feats = Multimodal.featurize(Multimodal.syntheticMedia(spark, 200))
      .toDF().withColumnRenamed("media_id", "vec_id").withColumnRenamed("features", "embedding")
    val queries = feats.filter(col("vec_id") < 3)
    val topk = graft.operators.Similarity.topKCosine(feats, queries, 5)
    val byQ = topk.collect().groupBy(_.getLong(0))
    assert(byQ.keySet == Set(0L, 1L, 2L) && byQ.values.forall(_.length == 5))
  }

  test("streaming tumbling agg matches batch TsAgg on the same data") {
    import spark.implicits._
    val t0 = RefFixture.BaseMs
    // write a small event set to parquet and stream it back
    val dir = Files.createTempDirectory("graft-stream").toFile
    val data = (0 until 1000).map(i => (t0 + i * 7200L, (i % 50).toLong)) // 2h of data
    data.toDF("ts_ms", "value")
      .withColumn("ts", timestamp_millis(col("ts_ms"))).drop("ts_ms")
      .write.mode("overwrite").parquet(dir.getAbsolutePath)

    val spec = TsAggSpec(900, TimeMode.CellTs(t0, t0 + 7200000L))
    val schema = spark.read.parquet(dir.getAbsolutePath).schema
    val stream = spark.readStream.schema(schema).parquet(dir.getAbsolutePath)
    // complete mode: append would hold back the final window until a later
    // event advances the watermark past it — correct unbounded-stream
    // behavior, but this test drains a finite fixture
    val q = StreamingTsAgg.sum(stream, spec, watermarkDelay = "0 seconds")
      .writeStream.outputMode("complete").format("memory").queryName("stream_out").start()
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.table("stream_out")
      .select("bucket_start", "sum_value")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val batch = graft.operators.TsAgg
      .sum(spark.read.parquet(dir.getAbsolutePath), spec)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(batch.nonEmpty && streamed == batch)
  }

  test("streaming binary-cell decode + windowed agg matches batch (full reference model on a stream)") {
    import graft.sources.Fixtures
    val spec = TsAggSpec(900, TimeMode.CellTs(FixtureT0, FixtureT0 + 2 * 86400000L),
      tsCol = "ts", valueCol = "v")
    val path = Fixtures.keyedEventsPath(spark, FixtureSf)
    val schema = spark.read.parquet(path).schema
    val stream = decodeCells(spark.readStream.schema(schema).parquet(path))
    val q = StreamingTsAgg.sum(stream, spec, watermarkDelay = "0 seconds")
      .writeStream.outputMode("complete").format("memory").queryName("cell_stream").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("cell_stream")
      .select("bucket_start", "sum_value")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val batch = graft.operators.TsAgg
      .sum(decodeCells(spark.read.parquet(path)), spec)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(batch.nonEmpty && streamed == batch)
  }

  test("streaming parquet sink emits finalized buckets that match batch") {
    import graft.sources.{Fixtures, Sinks}
    val spec = TsAggSpec(900, TimeMode.CellTs(FixtureT0, FixtureT0 + 86400000L),
      tsCol = "ts", valueCol = "v")
    val path = Fixtures.keyedEventsPath(spark, FixtureSf)
    val schema = spark.read.parquet(path).schema
    val out = Files.createTempDirectory("graft-sink-out").toFile.getAbsolutePath
    val cp = Files.createTempDirectory("graft-sink-cp").toFile.getAbsolutePath
    val q = Sinks.startParquetStream(
      StreamingTsAgg.sum(decodeCells(spark.readStream.schema(schema).parquet(path)),
        spec, watermarkDelay = "0 seconds"),
      out, cp)
    try q.processAllAvailable() finally q.stop()
    val emitted = spark.read.parquet(out).select("bucket_start", "sum_value")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val batch = graft.operators.TsAgg.sum(decodeCells(spark.read.parquet(path)), spec)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // append mode: every emitted bucket is final and must equal batch, and
    // ALL buckets except the trailing window(s) the watermark hasn't passed
    // must have been emitted — a regression that finalizes almost nothing
    // must fail, not slide by on a nonempty subset
    assert(batch.nonEmpty) // guards the bound below against a both-empty regression
    assert(emitted.size >= batch.size - 2, s"only ${emitted.size} of ${batch.size} buckets emitted")
    assert(emitted.forall { case (b, v) => batch.get(b).contains(v) })
  }

  test("SQL surface: ts_bucket and array_dot_product usable from spark.sql") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    Seq((1704067201234L, 5L), (1704068000000L, 7L), (1704068100000L, 9L))
      .toDF("ts_ms", "v").createOrReplaceTempView("sql_events")
    val rows = spark.sql(
      "SELECT ts_bucket(ts_ms, 1704067200000, 900000) AS b, max(v) AS m FROM sql_events GROUP BY b ORDER BY b")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // first two rows fall in bucket 0 (offsets 1234 ms and 800 s < 900 s)
    assert(rows.toSeq == Seq((1704067200000L, 7L), (1704067200000L + 900000, 9L)))
    Seq((Array(1L, 2L, 3L), Array(4L, 5L, 6L))).toDF("a", "b").createOrReplaceTempView("sql_vecs")
    assert(spark.sql("SELECT array_dot_product(a, b) AS d FROM sql_vecs")
      .collect().head.getLong(0) == 32L)
  }

  test("streaming exact dedup keeps first occurrence within the watermark") {
    import spark.implicits._
    import java.nio.file.Files
    val dir = Files.createTempDirectory("graft-sdedup").toFile.getAbsolutePath
    val t0 = RefFixture.BaseMs
    Seq(
      (new java.sql.Timestamp(t0), "alpha"), (new java.sql.Timestamp(t0 + 1000), "beta"),
      (new java.sql.Timestamp(t0 + 2000), "alpha"), (new java.sql.Timestamp(t0 + 3000), "gamma"),
      (new java.sql.Timestamp(t0 + 4000), "beta")
    ).toDF("ts", "text").write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(spark.read.parquet(dir).schema).parquet(dir)
    val q = graft.streaming.StreamingOps.dedupExact(stream)
      .writeStream.outputMode("append").format("memory").queryName("sdedup_out").start()
    try q.processAllAvailable() finally q.stop()
    val texts = spark.table("sdedup_out").select("text").collect().map(_.getString(0)).sorted
    assert(texts.toSeq == Seq("alpha", "beta", "gamma"))
  }

  test("streaming decontamination flags the same docs as the batch operator") {
    import spark.implicits._
    import java.nio.file.Files
    val evalDf = Seq((100L, "quick brown fox trivia"), (101L, "unrelated benchmark prose"))
      .toDF("doc_id", "text")
    val train = Seq(
      (1L, "the quick brown fox jumps"),        // shares "quick brown fox"
      (2L, "completely clean training text"),   // clean
      (3L, "x quick brown fox trivia y"),       // shares two eval shingles
      (4L, "ab"))                               // sub-shingle-width
    val dir = Files.createTempDirectory("graft-sdecon").toFile.getAbsolutePath
    train.toDF("doc_id", "text").write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(spark.read.parquet(dir).schema).parquet(dir)
    val q = graft.streaming.StreamingOps.decontaminateStream(stream, evalDf)
      .writeStream.outputMode("append").format("memory").queryName("sdecon_out").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("sdecon_out").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(streamed == Map(1L -> 1L, 3L -> 2L))
    // exact agreement with the batch operator on the same inputs
    val batch = graft.operators.TrainingSet.decontaminate(train.toDF("doc_id", "text"), evalDf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(streamed == batch)
    // an EMPTY benchmark flags nothing (the empty InSet matches no shingle)
    val none = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val q2 = graft.streaming.StreamingOps.decontaminateStream(stream, none)
      .writeStream.outputMode("append").format("memory").queryName("sdecon_none").start()
    try q2.processAllAvailable() finally q2.stop()
    assert(spark.table("sdecon_none").isEmpty)
  }

  test("streaming IVF ANN matches the batch index on the same query set") {
    val corpus = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val queries = corpus.filter(col("vec_id") < 10)
    import java.nio.file.Files
    val dir = Files.createTempDirectory("graft-sann").toFile.getAbsolutePath
    queries.write.mode("overwrite").parquet(dir)
    val qStream = spark.readStream.schema(spark.read.parquet(dir).schema).parquet(dir)
    val q = graft.streaming.StreamingOps
      .annCosineIvfStream(qStream, corpus, k = 5, dim = 64, nlist = 16, nprobe = 8)
      .writeStream.outputMode("complete").format("memory").queryName("sann_out").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("sann_out").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
    val batch = graft.operators.Similarity
      .annCosineIvf(corpus, queries, k = 5, dim = 64, nlist = 16, nprobe = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
    assert(batch.nonEmpty && streamed == batch,
      s"stream ${streamed.size} vs batch ${batch.size}")
  }

  test("streaming latest-cells compaction: overwrites advance, stale versions never regress") {
    import spark.implicits._
    import graft.streaming.StreamingOps
    import StreamingOps.CellVersion
    import java.nio.file.Files
    val dir = Files.createTempDirectory("graft-slatest").toFile.getAbsolutePath
    // batch 1: k1 overwritten within the batch (out of order), k2 single version
    Seq(CellVersion("k1", 2000L, 5L), CellVersion("k1", 1000L, 3L), CellVersion("k2", 1000L, 7L))
      .toDS().write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(spark.read.parquet(dir).schema).parquet(dir)
      .as[CellVersion]
    val q = StreamingOps.latestCellsStream(stream)
      .writeStream.outputMode("append").format("memory").queryName("slatest_out").start()
    try {
      q.processAllAvailable()
      // sorted Seq, not Set: duplicate emission of an identical row (the
      // exact bug the emit gate prevents) must fail the comparison
      def rows() = spark.table("slatest_out").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq.sorted
      assert(rows() == Seq(("k1", 2000L, 5L, 2L), ("k2", 1000L, 7L, 1L)))
      // batch 2: a STALE k1 version (must not emit or regress) and a real k2 advance
      Seq(CellVersion("k1", 500L, 9L), CellVersion("k2", 5000L, 8L))
        .toDS().write.mode("append").parquet(dir)
      q.processAllAvailable()
      assert(rows() == Seq(
        ("k1", 2000L, 5L, 2L), // unchanged: no new row for the stale overwrite
        ("k2", 1000L, 7L, 1L), ("k2", 5000L, 8L, 2L)))
    } finally q.stop()
  }

  test("flatMapGroupsWithState running sum per series") {
    import spark.implicits._
    import graft.streaming.StreamingOps
    import java.nio.file.Files
    val dir = Files.createTempDirectory("graft-srun").toFile.getAbsolutePath
    Seq(
      StreamingOps.SeriesEvent("a", 1000L, 5L), StreamingOps.SeriesEvent("a", 2000L, 7L),
      StreamingOps.SeriesEvent("b", 1500L, 10L), StreamingOps.SeriesEvent("a", 3000L, 1L)
    ).toDS().write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(spark.read.parquet(dir).schema).parquet(dir)
      .as[StreamingOps.SeriesEvent]
    val q = StreamingOps.runningSumPerSeries(stream)
      .writeStream.outputMode("append").format("memory").queryName("srun_out").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("srun_out").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(3))).toSet
    assert(got == Set(("a", 1000L, 5L), ("a", 2000L, 12L), ("a", 3000L, 13L), ("b", 1500L, 10L)))
  }

  test("typed Aggregators match built-ins and register for SQL") {
    import spark.implicits._
    Aggregators.registerAll(spark)
    val df = Seq((1.0, 2.0), (3.0, 1.0), (5.0, 1.0)).toDF("v", "w")
    df.createOrReplaceTempView("wavg_in")
    // product-typed Aggregator input surfaces as one SQL arg per field
    val wavg = spark.sql("SELECT graft_wavg(v, w) AS x FROM wavg_in")
      .collect().head.getDouble(0)
    assert(math.abs(wavg - (2.0 + 3.0 + 5.0) / 4.0) < 1e-12)
    val av = spark.sql("SELECT graft_avg(v) AS x FROM wavg_in").collect().head.getDouble(0)
    assert(av == 3.0)
  }
}
