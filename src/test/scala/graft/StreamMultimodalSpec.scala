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

  test("watermarked windowed agg covers every event exactly once") {
    val agg = SparkEntry.queries("stream_windowed_agg")(spark, sf)
    val total = agg.agg(sum("n_events")).collect()(0).getLong(0)
    assert(total == Tables.events(spark, sf).count())
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
