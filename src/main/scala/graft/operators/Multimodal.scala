package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column handling (SURVEY.md §2.3 #41).
  *
  * Media rides through the engine as an opaque `binary` payload column
  * plus a typed metadata struct — the schema pattern that keeps 100 TB
  * of media scannable with column pruning (a query that never touches
  * `payload` never reads those parquet pages).
  *
  * Decode/resize/frame-sample run per-partition over Iterator batches
  * (the Scala analog of `mapInPandas` batch plumbing: explicit batch
  * size, one codec init per partition, vectorizable inner loop). The
  * actual codec call is STUBBED deterministically (`FakeCodec`) — the
  * image/audio libraries are not in this container — but everything
  * Spark-side (schema, encoders, partitioning, batch shape) is real.
  */
object Multimodal {

  final case class MediaMeta(mime: String, width: Int, height: Int, durationMs: Long)
  final case class MediaRow(doc_id: Long, payload: Array[Byte], meta: MediaMeta)
  final case class MediaFeatures(
      doc_id: Long, mime: String, payloadBytes: Int,
      brightness: Double,       // stub: mean byte value of the payload
      resizedW: Int, resizedH: Int,
      framesSampled: Int)

  /** STUB decode — a real build links an image/audio codec here. The
    * fake is pure + deterministic so the pipeline is testable: feature
    * = mean payload byte; "resize" halves dimensions; frame sampling
    * takes 1 frame per second of fake duration, capped at 8. */
  object FakeCodec {
    def decode(r: MediaRow): MediaFeatures = {
      var sum = 0L
      var i = 0
      while (i < r.payload.length) { sum += r.payload(i) & 0xff; i += 1 }
      val brightness = if (r.payload.isEmpty) 0.0 else sum.toDouble / r.payload.length
      MediaFeatures(r.doc_id, r.meta.mime, r.payload.length, brightness,
        r.meta.width / 2, r.meta.height / 2,
        math.min((r.meta.durationMs / 1000).toInt, 8))
    }
  }

  /** Deterministic media table derived from documents: payload = UTF-8
    * text bytes; mime/dimensions keyed off doc_id. */
  def mediaTable(s: SparkSession, d: String): Dataset[MediaRow] = {
    import s.implicits._
    Tables.documents(s, d)
      .select($"doc_id", encode($"text", "UTF-8").as("payload"),
        struct(
          element_at(typedlit(Seq("image/jpeg", "audio/wav", "video/mp4")),
            ($"doc_id" % 3 + 1).cast("int")).as("mime"),
          (lit(64) + ($"doc_id" % 16) * 16).cast("int").as("width"),
          (lit(64) + ($"doc_id" % 9) * 16).cast("int").as("height"),
          (($"doc_id" % 20) * 1000).as("durationMs")).as("meta"))
      .as[MediaRow]
  }

  /** Batch decode: one codec per partition, fixed-size batches through
    * the stub (the shape a vectorized decoder needs). */
  def decodeFeatures(media: Dataset[MediaRow], batchSize: Int = 32): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition "codec init" happens here in a real build
      rows.grouped(batchSize).flatMap { batch => batch.map(FakeCodec.decode) }
    }
  }

  private def pipeline(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    decodeFeatures(mediaTable(s, d))
      .groupBy($"mime")
      .agg(count(lit(1)).as("n"),
        round(avg($"brightness"), 4).as("avg_brightness"),
        sum($"framesSampled").as("frames_sampled"),
        sum($"payloadBytes").as("total_bytes"))
      .orderBy($"mime")
  }

  // DuckDB can't replay the mapPartitions stub → rows-only check;
  // MultimodalSpec pins the exact values instead.
  val defs: Seq[QueryDef] = Seq(
    QueryDef("mm_binary_pipeline", pipeline, None),
  )
}
