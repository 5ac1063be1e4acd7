package graft

import graft.operators.Multimodal
import graft.streaming.Streaming
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StreamMultimodalSpec extends AnyFunSuite {
  import TestSession._

  test("streaming sessionization equals batch gaps-and-islands minus open sessions") {
    import spark.implicits._
    val streamed = Streaming.sessionStream(spark, sf)
      .select($"user_id", $"start_us", $"n_events", $"sum_value")
      .as[(Long, Long, Long, Double)].collect().toSet
    val batch = Streaming.sessionBatch(spark, sf)
      .select($"user_id", $"start_us", $"n_events", $"sum_value")
      .as[(Long, Long, Long, Double)].collect()
    // each user's last (open) session never emits from the stream
    val lastPerUser = batch.groupBy(_._1).view.mapValues(_.maxBy(_._2)).values.toSet
    val expected = batch.toSet -- lastPerUser
    assert(streamed.map(t => (t._1, t._2, t._3)) == expected.map(t => (t._1, t._2, t._3)),
      "streamed closed sessions must match batch sessions minus open tails")
    // sums: double accumulation order differs (stream folds event-by-
    // event, batch sums a decimal) — compare to 1e-9
    val bMap = expected.map(t => (t._1, t._2) -> t._4).toMap
    streamed.foreach { case (u, st, _, sv) =>
      bMap.get((u, st)).foreach(bv => assert(math.abs(bv - sv) < 1e-9))
    }
  }

  test("sessionization state carries across micro-batches (time-sliced files)") {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{OutputMode, Trigger}
    val dir = new java.io.File("/tmp/graft_spec/stream_slices")
    if (dir.exists()) {
      java.nio.file.Files.walk(dir.toPath).sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.delete(p))
    }
    val ev = Tables.events(spark, sf).select($"user_id", $"ts_ns", $"value")
    val (mn, mx) = ev.agg(min($"ts_ns"), max($"ts_ns")).as[(Long, Long)].collect()(0)
    val step = (mx - mn) / 4 + 1
    (0 until 4).foreach { i =>
      ev.filter($"ts_ns" >= mn + i * step && $"ts_ns" < mn + (i + 1) * step)
        .coalesce(1).write.mode("append").parquet(dir.getPath)
      Thread.sleep(100) // distinct mtimes → deterministic oldest-first file order
    }
    val stream = spark.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", "1").parquet(dir.getPath)
      .as[Streaming.Ev]
    val q = Streaming.sessionizeDs(stream)
      .writeStream.format("memory").queryName("graft_multibatch_sessions")
      .outputMode(OutputMode.Append()).trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(q.recentProgress.count(_.numInputRows > 0) == 4,
      "each time-sliced file should form its own micro-batch")
    val streamed = spark.table("graft_multibatch_sessions")
      .select($"user_id", $"start_us", $"n_events")
      .as[(Long, Long, Long)].collect().toSet
    val batch = Streaming.sessionBatch(spark, sf)
      .select($"user_id", $"start_us", $"n_events")
      .as[(Long, Long, Long)].collect()
    val lastPerUser = batch.groupBy(_._1).view.mapValues(_.maxBy(_._2)).values.toSet
    assert(streamed == batch.toSet -- lastPerUser,
      "sessions spanning micro-batch boundaries must merge via carried state")
  }

  test("stream-stream interval join equals its batch twin") {
    import spark.implicits._
    val streamed = SparkEntry.queries("stream_range_join")(spark, sf)
      .collect().map(_.toSeq).toSeq
    val batch = SparkEntry.queries("q_range_join")(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(streamed == batch,
      "watermarked stream-stream join must produce the batch join's rows")
  }

  test("watermarked windowed agg covers every event exactly once") {
    val agg = SparkEntry.queries("stream_windowed_agg")(spark, sf)
    val total = agg.agg(sum("n_events")).collect()(0).getLong(0)
    assert(total == Tables.events(spark, sf).count())
    // the heartbeat punctuation row advances the watermark but must
    // never surface in the output (as a group of its own or otherwise)
    assert(agg.filter(col("event_type") === "__heartbeat").isEmpty,
      "heartbeat row leaked into the windowed aggregate output")
  }

  test("streaming dedup suppresses later copies across micro-batches") {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{OutputMode, Trigger}
    val dir = new java.io.File("/tmp/graft_spec/dedup_slices")
    if (dir.exists()) {
      java.nio.file.Files.walk(dir.toPath).sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.delete(p))
    }
    // fingerprinted docs, sliced by doc_id so duplicate pairs can span
    // batch boundaries (seeded near-dups have nearby ids; exact dups too)
    val corpus = Tables.documents(spark, sf)
      .select($"doc_id",
        graft.functions.GraftFunctions.fingerprint128(
          graft.operators.TextPrep.norm($"text")).as("fp"))
      .select($"doc_id", $"fp.h0", $"fp.h1")
    // the corpus has near-dups but no byte-identical ones — inject
    // "re-crawled" exact copies under new ids so suppression is real
    val fp = corpus.union(
      corpus.filter($"doc_id" < 60).withColumn("doc_id", $"doc_id" + 10000))
    val n = fp.count()
    (0 until 3).foreach { i =>
      fp.filter($"doc_id" % 3 === i) // interleaved slices: dups split across batches
        .coalesce(1).write.mode("append").parquet(dir.getPath)
      Thread.sleep(100)
    }
    val q = Streaming.dedupDs(
        spark.readStream.schema(fp.schema).option("maxFilesPerTrigger", "1")
          .parquet(dir.getPath).as[Streaming.Doc])
      .writeStream.format("memory").queryName("graft_dedup_slices")
      .outputMode(OutputMode.Append()).trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(q.recentProgress.count(_.numInputRows > 0) == 3, "3 micro-batches expected")
    val kept = spark.table("graft_dedup_slices").as[Long].collect().toSet
    // each fingerprint admitted exactly once — never once per batch
    val distinctFps = fp.select($"h0", $"h1").distinct().count()
    assert(kept.size == distinctFps,
      s"one admit per fingerprint: kept ${kept.size}, distinct $distinctFps")
    assert(kept.size < n, "corpus contains duplicates, some docs must be dropped")
    // the admitted doc for each fp is from the EARLIEST batch containing
    // it (mod-3 slicing → that's min doc_id's batch; min within batch)
    val expected = fp.as[(Long, Long, Long)].collect()
      .groupBy(t => (t._2, t._3)).values.map { g =>
        val firstBatch = g.map(_._1 % 3).min
        g.filter(_._1 % 3 == firstBatch).map(_._1).min
      }.toSet
    assert(kept == expected, "first-seen must respect arrival order + min-in-batch")
  }

  test("incremental upsert merged across micro-batches equals the batch aggregate") {
    import spark.implicits._
    val dir = new java.io.File("/tmp/graft_spec/upsert_slices")
    if (dir.exists()) {
      java.nio.file.Files.walk(dir.toPath).sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.delete(p))
    }
    val ev = Tables.events(spark, sf)
      .select($"user_id", $"ts_ns", $"event_id", $"event_type", $"value")
    // slice by event_id mod 4 — OUT of time order, so the merge's
    // max-by-struct and decimal-sum must be genuinely order-insensitive
    (0 until 4).foreach { i =>
      ev.filter($"event_id" % 4 === i)
        .coalesce(1).write.mode("append").parquet(dir.getPath)
      Thread.sleep(100)
    }
    val streamed = Streaming.runUpsert(
        spark.readStream.schema(ev.schema).option("maxFilesPerTrigger", "1")
          .parquet(dir.getPath))
      .as[(Long, Long, Double, Long, String, Double)].collect().toSeq
    // batch truth: count + exact decimal sum + latest event per user
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"ts_ns".desc, $"event_id".desc)
    val batch = ev
      .withColumn("rn", row_number().over(w))
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_events"),
        OracleMath.dsum($"value").as("sum_value"),
        max(when($"rn" === 1,
          struct(expr("ts_ns div 1000").as("us"), $"event_type", $"value"))).as("last"))
      .select($"user_id", $"n_events", $"sum_value",
        $"last.us", $"last.event_type", $"last.value")
      .orderBy($"user_id")
      .as[(Long, Long, Double, Long, String, Double)].collect().toSeq
    assert(streamed == batch,
      "per-user (count, exact sum, latest event) must be slice-independent")
  }

  test("native session_window agrees with the gaps-and-islands twin") {
    import spark.implicits._
    val native = SparkEntry.queries("q_session_window_native")(spark, sf)
      .as[(Long, Long, Long, Double)].collect().toSeq
    val manual = Streaming.sessionBatch(spark, sf)
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(native == manual,
      "session_window interval-merge must equal the lag-based formulation")
  }

  test("sliding windows cover every event exactly dur/slide times") {
    import spark.implicits._
    val agg = SparkEntry.queries("stream_sliding_agg")(spark, sf)
    val total = agg.agg(sum($"n_events")).collect()(0).getLong(0)
    assert(total == 2 * Tables.events(spark, sf).count(),
      "2h windows sliding 1h: each event must land in exactly 2 windows")
    assert(agg.filter($"event_type" === "__heartbeat").isEmpty)
  }

  test("z-score anomalies are identical under time-sliced multi-batch replay") {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{OutputMode, Trigger}
    val dir = new java.io.File("/tmp/graft_spec/zscore_slices")
    if (dir.exists()) {
      java.nio.file.Files.walk(dir.toPath).sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.delete(p))
    }
    val ev = Tables.events(spark, sf).select($"user_id", $"ts_ns", $"event_id", $"value")
    // slice by TIME (state folds in event order, so batches must arrive
    // in time order — the file-source contract a replay provides)
    val (mn, mx) = ev.agg(min($"ts_ns"), max($"ts_ns")).as[(Long, Long)].collect()(0)
    val step = (mx - mn) / 4 + 1
    (0 until 4).foreach { i =>
      ev.filter($"ts_ns" >= mn + i * step && $"ts_ns" < mn + (i + 1) * step)
        .coalesce(1).write.mode("append").parquet(dir.getPath)
      Thread.sleep(100)
    }
    val q = spark.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", "1").parquet(dir.getPath).as[Streaming.ZEv]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(),
        org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout())(Streaming.zscoreFold)
      .toDF()
      .writeStream.format("memory").queryName("graft_zscore_slices")
      .outputMode(OutputMode.Append()).trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(q.recentProgress.count(_.numInputRows > 0) == 4, "4 micro-batches expected")
    val sliced = spark.table("graft_zscore_slices")
      .as[(Long, Long, Double, Long)].collect().toSet
    val single = SparkEntry.queries("stream_zscore")(spark, sf)
      .as[(Long, Long, Double, Long)].collect().toSet
    assert(sliced == single,
      "anomaly set must be independent of micro-batch slicing (exact integer state)")
    assert(single.nonEmpty, "corpus should contain 3-sigma events")
  }

  test("sessionization runs on the RocksDB state store with state metrics") {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{OutputMode, Trigger}
    import scala.jdk.CollectionConverters._
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.option("pathGlobFilter", "events.parquet").parquet(sf).schema
    val stream = Tables.withEventTime(
        spark.readStream.schema(schema)
          .option("pathGlobFilter", "events.parquet").parquet(sf))
      .select($"user_id", $"ts_ns", $"value").as[Streaming.Ev]
    val q = Streaming.withRocksDBStateStore(spark) {
      assert(spark.conf.get("spark.sql.streaming.stateStore.providerClass")
        == Streaming.RocksDBProvider)
      Streaming.sessionizeDs(stream)
        .writeStream.format("memory").queryName("graft_rocksdb_sessions")
        .outputMode(OutputMode.Append()).trigger(Trigger.AvailableNow()).start()
    }
    q.awaitTermination()
    // the conf is restored afterwards (provider choice is per-query)
    assert(spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
      != Some(Streaming.RocksDBProvider))
    // state really lives in RocksDB: the operator reports rocksdb
    // custom metrics and processed state rows
    val ops = q.recentProgress.flatMap(_.stateOperators)
    assert(ops.nonEmpty, "expected a stateful operator in the progress log")
    val metricKeys = ops.flatMap(_.customMetrics.asScala.keys).toSet
    assert(metricKeys.exists(_.toLowerCase.contains("rocksdb")),
      s"expected RocksDB state-store metrics, got: $metricKeys")
    assert(ops.map(_.numRowsUpdated).sum > 0, "state rows must have been written")
    // and the result is the same sessions the default provider produces
    val streamed = spark.table("graft_rocksdb_sessions")
      .select($"user_id", $"start_us", $"n_events")
      .as[(Long, Long, Long)].collect().toSet
    val batch = Streaming.sessionBatch(spark, sf)
      .select($"user_id", $"start_us", $"n_events")
      .as[(Long, Long, Long)].collect()
    val lastPerUser = batch.groupBy(_._1).view.mapValues(_.maxBy(_._2)).values.toSet
    assert(streamed == batch.toSet -- lastPerUser,
      "RocksDB-backed sessionization must emit the same closed sessions")
  }

  test("append-mode windowed agg evicts all window state once the watermark passes") {
    import org.apache.spark.sql.streaming.{OutputMode, Trigger}
    val q = Streaming.windowedAggStream(spark, sf)
      .writeStream.format("memory").queryName("graft_eviction_probe")
      .outputMode(OutputMode.Append()).trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val stateRows = q.recentProgress.flatMap(_.stateOperators.map(_.numRowsTotal))
    assert(stateRows.nonEmpty, "expected a stateful operator in the progress log")
    // state grows while windows are open, then the heartbeat-advanced
    // watermark closes every window: Append emits each exactly once and
    // the store ends EMPTY — the bounded-state property Complete mode
    // (which never evicts) cannot provide
    assert(stateRows.last == 0,
      s"all window state must be evicted at end of replay, got ${stateRows.toSeq}")
    val emitted = spark.table("graft_eviction_probe").count()
    val expected = Tables.events(spark, sf)
      .select(date_trunc("hour", col("ts")), col("event_type")).distinct().count()
    assert(emitted == expected, "each closed window emitted exactly once")
  }

  test("multimodal decode: real PNG codec measures pixels, not metadata") {
    import Multimodal.{JdkCodec, MediaMeta, MediaRow}
    // crafted 2x2 image with known pixels: brightness is exact
    val img = new java.awt.image.BufferedImage(2, 2, java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0xFFFFFF) // 255,255,255
    img.setRGB(1, 0, 0x000000) // 0,0,0
    img.setRGB(0, 1, 0x808080) // 128,128,128
    img.setRGB(1, 1, 0x402000) // 64,32,0
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val f = JdkCodec.decodeImage(
      MediaRow(1L, bos.toByteArray, MediaMeta("image/png", 999, 999, 0L)))
    // (3*255 + 0 + 3*128 + 64+32+0) / 12 — from DECODED pixels; the
    // bogus declared 999x999 must be ignored
    assert(f.brightness == (3 * 255 + 3 * 128 + 96).toDouble / 12, f.brightness)
    assert(f.resizedW == 1 && f.resizedH == 1)

    // generated gradient PNGs round-trip: resize really halves measured dims
    val gen = JdkCodec.decodeImage(
      MediaRow(6L, JdkCodec.pngBytes(6L, 40, 24), MediaMeta("image/png", 40, 24, 0L)))
    assert(gen.resizedW == 20 && gen.resizedH == 12)
    assert(gen.brightness > 0 && gen.brightness < 255)
  }

  test("multimodal decode: real WAV codec derives duration and level from PCM") {
    import Multimodal.{JdkCodec, MediaMeta, MediaRow}
    val wav = JdkCodec.wavBytes(7L, 200L) // 200 ms @ 8 kHz mono 16-bit
    val f = JdkCodec.decodeAudio(MediaRow(7L, wav, MediaMeta("audio/wav", 0, 0, 999999L)))
    // duration comes from the DECODED stream (1600 frames), not the
    // declared 999999 ms: 0.2 s * 10 frames/s = 2 sampled frames
    assert(f.framesSampled == 2, f.framesSampled)
    // a triangle wave's RMS is amplitude/sqrt(3): 12000/1.732/32768*255 ≈ 54
    assert(math.abs(f.brightness - 12000.0 / math.sqrt(3) / 32768.0 * 255.0) < 1.5,
      f.brightness)
    // and the decoded PCM must replay the integer generator sample-exact
    // (the property the mm_decode_features oracle rests on)
    val exact = JdkCodec.decodeExact(MediaRow(7L, wav, MediaMeta("audio/wav", 0, 0, 0L)))
    val expected = (0 until 1600).map(i => JdkCodec.triSample(227L, i.toLong))
      .map(v => v.toLong * v).sum
    assert(exact.energy == expected && exact.ns == 1600,
      s"PCM energy ${exact.energy} != $expected")
  }

  test("multimodal pipeline: decode is deterministic and batch plumbing holds") {
    import spark.implicits._
    val media = Multimodal.mediaTable(spark, sf)
    val feats = Multimodal.decodeFeatures(media, batchSize = 7) // odd size: exercises ragged tail
    val n = feats.count()
    assert(n == Tables.documents(spark, sf).count())
    val twice = Multimodal.decodeFeatures(media, batchSize = 64)
      .select($"doc_id", $"brightness").as[(Long, Double)].collect().toMap
    val once = feats.select($"doc_id", $"brightness").as[(Long, Double)].collect().toMap
    assert(once == twice, "decode must not depend on batch size/partitioning")
    assert(once.values.forall(b => b >= 0 && b < 255))
    // image rows: resize halves the REAL decoded dimensions
    val img6 = feats.filter($"doc_id" === 6).collect()(0) // 6 % 3 == 0 -> png
    assert(img6.mime == "image/png")
    assert(img6.resizedW == (32 + (6 % 16) * 8) / 2 && img6.resizedH == (32 + (6 % 9) * 8) / 2)
    // audio rows: sampled frames follow the decoded duration
    val wav7 = feats.filter($"doc_id" === 7).collect()(0) // 7 % 3 == 1 -> wav
    assert(wav7.mime == "audio/wav")
    assert(wav7.framesSampled == ((7 % 5) * 100 + 100) / 100)
    // video rows: real container parse — sampling follows mvhd duration
    val vid5 = feats.filter($"doc_id" === 5).collect()(0) // 5 % 3 == 2 -> mp4
    assert(vid5.mime == "video/mp4")
    assert(vid5.framesSampled == 5) // (5%20)*1000ms -> 5 frames
    // mm query returns one row per mime
    val q = SparkEntry.queries("mm_binary_pipeline")(spark, sf)
    assert(q.count() == 3)
  }

  test("multimodal decode: real MP4 parse + motion-PNG frame PIXEL decode") {
    import Multimodal.{JdkCodec, MediaMeta, MediaRow}
    import graft.operators.IsoBmff
    // writer↔parser roundtrip: every sample-table quantity is recovered
    val bytes = IsoBmff.mp4Bytes(9L, w = 64, h = 48, durationMs = 3000, fps = 4)
    val info = IsoBmff.parse(bytes)
    assert(info.durationMs == 3000 && info.width == 64 && info.height == 48)
    assert(info.sampleSizes == (0 until 12).map(i => IsoBmff.pngFrame(9L, i, 64, 48).length))
    // every indexed sample byte range is a complete PNG stream
    val pngSig = Array(0x89, 0x50, 0x4e, 0x47).map(_.toByte)
    (0 until 12).foreach { i =>
      val (off, len) = info.frameRange(i)
      assert((0 until 4).forall(j => bytes(off.toInt + j) == pngSig(j)),
        s"frame $i does not start with the PNG signature")
      assert(len == info.sampleSizes(i))
    }
    // decode uses the CONTAINER, never the declared metadata: bogus
    // declared 999×999 / 999999 ms must all be ignored
    val f = JdkCodec.decodeVideo(
      MediaRow(9L, bytes, MediaMeta("video/mp4", 999, 999, 999999L)))
    assert(f.resizedW == 32 && f.resizedH == 24, s"${f.resizedW}x${f.resizedH}")
    assert(f.framesSampled == 3, f.framesSampled)
    // PNG frames are LOSSLESS: decoded luminance must equal the
    // pre-encode source gradient's mean EXACTLY (the property that
    // graduated mm_binary_pipeline's video column to a value oracle)
    val picks = (0 until 3).map(k => k * 12 / 3)
    val (srcSum, srcPx) = {
      var sum = 0L
      picks.foreach { i =>
        val img = IsoBmff.frameImage(9L, i, 64, 48)
        for (y <- 0 until 48; x <- 0 until 64) {
          val p = img.getRGB(x, y)
          sum += ((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)
        }
      }
      (sum, 3L * 64 * 48)
    }
    assert(f.brightness == srcSum.toDouble / (3L * srcPx),
      s"${f.brightness} != lossless source mean")
    // the exact-integer path used by mm_binary_pipeline agrees bit-level
    val ex = JdkCodec.decodeExact(
      MediaRow(9L, bytes, MediaMeta("video/mp4", 999, 999, 999999L)))
    assert(ex.lum == srcSum && ex.px == srcPx && ex.fs == 3,
      s"(${ex.lum}, ${ex.px}, ${ex.fs}) != ($srcSum, $srcPx, 3)")
    // malformed container fails loudly, not with garbage features
    intercept[IllegalArgumentException] {
      IsoBmff.parse("not an mp4 at all".getBytes("UTF-8"))
    }
  }

  test("multimodal decode: lossy motion-JPEG variant still decodes end-to-end") {
    import Multimodal.{JdkCodec, MediaMeta, MediaRow}
    import graft.operators.IsoBmff
    // the robustness case: same container, lossy frame codec — the
    // pipeline must survive codec-dependent pixels (brightness lands
    // NEAR the source mean, never exactly on it)
    val bytes = IsoBmff.mp4Bytes(9L, w = 64, h = 48, durationMs = 3000,
      fps = 4, codec = "jpeg")
    val info = IsoBmff.parse(bytes)
    assert(info.sampleSizes == (0 until 12).map(i => IsoBmff.jpegFrame(9L, i, 64, 48).length))
    // every indexed sample byte range is a complete JPEG: SOI … EOI
    (0 until 12).foreach { i =>
      val (off, len) = info.frameRange(i)
      assert(bytes(off.toInt) == 0xff.toByte && bytes(off.toInt + 1) == 0xd8.toByte,
        s"frame $i does not start with a JPEG SOI marker")
      assert(bytes(off.toInt + len - 2) == 0xff.toByte &&
        bytes(off.toInt + len - 1) == 0xd9.toByte,
        s"frame $i does not end with a JPEG EOI marker")
    }
    val f = JdkCodec.decodeVideo(
      MediaRow(9L, bytes, MediaMeta("video/mp4", 999, 999, 999999L)))
    assert(f.framesSampled == 3, f.framesSampled)
    val picks = (0 until 3).map(k => k * 12 / 3)
    val sourceMean = {
      var sum = 0L
      picks.foreach { i =>
        val img = IsoBmff.frameImage(9L, i, 64, 48)
        for (y <- 0 until 48; x <- 0 until 64) {
          val p = img.getRGB(x, y)
          sum += ((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)
        }
      }
      sum.toDouble / (3L * 3 * 64 * 48)
    }
    assert(math.abs(f.brightness - sourceMean) < 4.0,
      s"decoded luma ${f.brightness} too far from source ${sourceMean}")
  }

  test("mm_phash_dedup: decoded-pixel aHash groups match a formula replay") {
    import TestSession._
    def ahash(id: Long): (Long, Long) = {
      val w = (32 + (id % 16) * 8).toInt
      val h = (32 + (id % 9) * 8).toInt
      val bs = Array.ofDim[Long](8, 8); val cnt = Array.ofDim[Long](8, 8)
      var tot = 0L
      for (y <- 0 until h; x <- 0 until w) {
        val lum = ((id + x) % 256) + ((id * 31 + y) % 256) + (x + y) % 256
        val (bi, bj) = (math.min(y * 8 / h, 7), math.min(x * 8 / w, 7))
        bs(bi)(bj) += lum; cnt(bi)(bj) += 1; tot += lum
      }
      val npx = w.toLong * h
      var hi = 0L; var lo = 0L
      for (i <- 0 until 64) {
        val bit =
          if (bs(i / 8)(i % 8) * npx >= tot * cnt(i / 8)(i % 8)) 1L else 0L
        if (i < 32) hi |= bit << (31 - i) else lo |= bit << (63 - i)
      }
      (hi, lo)
    }
    val ids = Tables.documents(spark, sf).select("doc_id").collect()
      .map(_.getLong(0)).filter(_ % 3 == 0)
    val groups = ids.map(id => ahash(id) -> id).groupBy(_._1)
      .filter(_._2.length >= 2)
      .map { case (hash, g) => (g.map(_._2).min, g.length.toLong, hash) }
      .toSeq.sortBy(_._1)
    val got = SparkEntry.queries("mm_phash_dedup")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), (r.getLong(2), r.getLong(3))))
      .toSeq
    assert(got == groups,
      "ImageIO-decoded hash must equal the generator-formula hash")
    assert(got.nonEmpty, "the gradient family must collide at least once")
  }
}
