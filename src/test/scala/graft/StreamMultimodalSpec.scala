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

  test("sessionization runs on the RocksDB state store with state metrics") {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{OutputMode, Trigger}
    import scala.jdk.CollectionConverters._
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.option("pathGlobFilter", "events.parquet").parquet(sf).schema
    val stream = spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet").parquet(sf)
      .withColumnRenamed("ts", "ts_ns")
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

  test("multimodal pipeline: stubbed decode is deterministic and batch plumbing holds") {
    import spark.implicits._
    val media = Multimodal.mediaTable(spark, sf)
    val feats = Multimodal.decodeFeatures(media, batchSize = 7) // odd size: exercises ragged tail
    val n = feats.count()
    assert(n == Tables.documents(spark, sf).count())
    // payload is the utf-8 text; brightness = mean byte must be
    // strictly inside (0, 255) and identical across runs
    val twice = Multimodal.decodeFeatures(media, batchSize = 64)
      .select($"doc_id", $"brightness").as[(Long, Double)].collect().toMap
    val once = feats.select($"doc_id", $"brightness").as[(Long, Double)].collect().toMap
    assert(once == twice, "decode must not depend on batch size/partitioning")
    assert(once.values.forall(b => b > 0 && b < 255))
    // metadata drives the stub deterministically
    val r = feats.filter($"doc_id" === 5).collect()(0)
    assert(r.mime == "video/mp4")    // 5 % 3 == 2 -> third mime
    assert(r.framesSampled == 5)     // (5%20)*1000ms -> 5 frames
    // mm query returns one row per mime
    val q = SparkEntry.queries("mm_binary_pipeline")(spark, sf)
    assert(q.count() == 3)
  }
}
