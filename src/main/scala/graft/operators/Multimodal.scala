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
  * Decode/resize/sample run per-partition over Iterator batches (the
  * Scala analog of `mapInPandas` batch plumbing: explicit batch size,
  * one codec init per partition, vectorizable inner loop). The codecs
  * are REAL for all three modalities — the JDK ships them:
  *  - `image/png`: `javax.imageio` decode → mean-luminance feature →
  *    genuine half-size resize through `Graphics2D`;
  *  - `audio/wav`: `javax.sound.sampled` parse → PCM RMS level + true
  *    decoded duration → 10 Hz frame sampling;
  *  - `video/mp4`: real ISO BMFF container parse ([[IsoBmff]]) —
  *    duration/dimensions measured from mvhd/tkhd, frame sampling
  *    indexes genuine sample byte ranges via stsz/stco, and each sample
  *    is a motion-PNG frame whose pixels `javax.imageio` decodes, so
  *    the video feature is computed from decoded pixels like the image
  *    leg's — and, PNG being lossless, replays closed-form in the SQL
  *    oracle (the lossy motion-JPEG variant stays spec-exercised).
  */
object Multimodal {

  final case class MediaMeta(mime: String, width: Int, height: Int, durationMs: Long)
  final case class MediaRow(doc_id: Long, payload: Array[Byte], meta: MediaMeta)
  final case class MediaFeatures(
      doc_id: Long, mime: String, payloadBytes: Int,
      brightness: Double,       // image/video: mean RGB luminance of decoded pixels; audio: RMS scaled to 0..255
      resizedW: Int, resizedH: Int,
      framesSampled: Int)

  /** JDK-native encode + decode. Everything here is deterministic (only
    * integer math, IEEE +,*,sqrt and the PNG/WAV formats themselves),
    * so features are bit-identical across partitionings and reruns. */
  object JdkCodec {
    import java.awt.image.BufferedImage
    import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
    import javax.imageio.ImageIO
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

    val SampleRate = 8000

    /** Deterministic gradient PNG keyed by doc_id — a REAL png byte
      * stream; the decoder round-trips it through ImageIO. */
    def pngBytes(docId: Long, w: Int, h: Int): Array[Byte] = {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val r = ((docId + x) % 256).toInt
          val g = ((docId * 31 + y) % 256).toInt
          val b = (x + y) % 256
          img.setRGB(x, y, (r << 16) | (g << 8) | b)
          x += 1
        }
        y += 1
      }
      // IsoBmff.PngCodec, not ImageIO.write: the JDK writer leaves the
      // gradient nearly raw (see PngCodec's scaladoc); decode stays ImageIO
      PngCodec.encode(img)
    }

    /** Deterministic 16-bit mono PCM WAV: triangle wave at
      * (220 + docId%220) Hz, amplitude 12000. INTEGER arithmetic only —
      * a sine's `Math.sin` is JVM-intrinsic and NOT bit-identical to a
      * SQL engine's libm sin (a 1-ulp flip at a truncation boundary
      * silently diverges the PCM), so the waveform every engine must
      * agree on is piecewise-linear integer: t = (f·i) mod 8000, one
      * period = rise/fall/rise over 2000-sample quarters at slope 6. */
    def triSample(freq: Long, i: Long): Int = {
      val t = ((freq * i) % 8000).toInt
      if (t < 2000) t * 6
      else if (t < 6000) (4000 - t) * 6
      else (t - 8000) * 6
    }
    def wavBytes(docId: Long, durationMs: Long): Array[Byte] = {
      val n = (SampleRate * durationMs / 1000).toInt
      val fmt = new AudioFormat(SampleRate.toFloat, 16, 1, true, false)
      val pcm = new Array[Byte](n * 2)
      val freq = 220 + docId % 220
      var i = 0
      while (i < n) {
        val v = triSample(freq, i)
        pcm(2 * i) = (v & 0xff).toByte
        pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
        i += 1
      }
      val bos = new ByteArrayOutputStream()
      AudioSystem.write(new AudioInputStream(new ByteArrayInputStream(pcm), fmt, n.toLong),
        AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }

    /** Real PNG decode: measured (not declared) dimensions, mean RGB
      * luminance, and a genuine half-size resize. */
    def decodeImage(r: MediaRow): MediaFeatures = {
      val img = ImageIO.read(new ByteArrayInputStream(r.payload))
      val (w, h) = (img.getWidth, img.getHeight)
      var sum = 0L
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val p = img.getRGB(x, y)
          sum += ((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)
          x += 1
        }
        y += 1
      }
      val brightness = sum.toDouble / (3L * w * h)
      val rw = math.max(1, w / 2)
      val rh = math.max(1, h / 2)
      val resized = new BufferedImage(rw, rh, BufferedImage.TYPE_INT_RGB)
      val g2 = resized.createGraphics()
      g2.drawImage(img, 0, 0, rw, rh, null)
      g2.dispose()
      MediaFeatures(r.doc_id, r.meta.mime, r.payload.length, brightness,
        resized.getWidth, resized.getHeight, 0)
    }

    /** Real WAV parse: frame count and duration come from the decoded
      * stream, not the metadata; level = PCM RMS scaled to 0..255. */
    def decodeAudio(r: MediaRow): MediaFeatures = {
      val ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(r.payload))
      val frames = ais.getFrameLength.toInt
      val bytes = ais.readAllBytes()
      var sumSq = 0.0
      var i = 0
      while (i < frames) {
        val v = (((bytes(2 * i + 1) & 0xff) << 8) | (bytes(2 * i) & 0xff)).toShort.toDouble
        sumSq += v * v
        i += 1
      }
      val rms = if (frames == 0) 0.0 else math.sqrt(sumSq / frames)
      val durSec = frames.toDouble / ais.getFormat.getFrameRate
      MediaFeatures(r.doc_id, r.meta.mime, r.payload.length,
        rms / 32768.0 * 255.0, 0, 0,
        math.min((durSec * 10).round.toInt, 8)) // 1 sampled frame / 100 ms, capped
    }

    /** Real MP4 decode end-to-end via [[IsoBmff]]: duration/dimensions
      * come from mvhd/tkhd (measured, never the declared metadata),
      * frame SAMPLING indexes actual sample byte ranges through
      * stsz/stco — 1 frame/second capped at 8 — and each sampled frame
      * is a complete frame sample (PNG by default) whose PIXELS ImageIO decodes.
      * brightness = mean RGB luminance over the decoded pixels of
      * exactly the sampled frames (same feature as the image leg). */
    def decodeVideo(r: MediaRow): MediaFeatures = {
      val info = IsoBmff.parse(r.payload)
      val nFrames = info.sampleSizes.length
      val sampled = math.min(math.min((info.durationMs / 1000).toInt, 8), nFrames)
      var sum = 0L
      var pixels = 0L
      var k = 0
      while (k < sampled) {
        val (off, len) = info.frameRange(k * nFrames / math.max(1, sampled))
        val img = ImageIO.read(new ByteArrayInputStream(r.payload, off.toInt, len))
        var y = 0
        while (y < img.getHeight) {
          var x = 0
          while (x < img.getWidth) {
            val p = img.getRGB(x, y)
            sum += ((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)
            x += 1
          }
          y += 1
        }
        pixels += img.getWidth.toLong * img.getHeight
        k += 1
      }
      val brightness = if (pixels == 0) 0.0 else sum.toDouble / (3L * pixels)
      MediaFeatures(r.doc_id, r.meta.mime, r.payload.length, brightness,
        info.width / 2, info.height / 2, sampled)
    }

    def decode(r: MediaRow): MediaFeatures = r.meta.mime match {
      case "image/png" => decodeImage(r)
      case "audio/wav" => decodeAudio(r)
      case _ => decodeVideo(r)
    }

    /** 64-bit average-hash over the DECODED pixels: 8×8 block means of
      * the 3-channel luminance, each bit = (block mean >= global mean)
      * as the exact integer cross-multiplication bs·npx >= tot·cnt
      * (values bounded ~2.5e9 — LONG-safe at the generator's <=152×96
      * sizes). Packed as two nonnegative 32-bit halves so the oracle
      * never fights two's-complement sign. */
    def aHash(payload: Array[Byte]): (Long, Long) = {
      val img = ImageIO.read(new ByteArrayInputStream(payload))
      val (w, h) = (img.getWidth, img.getHeight)
      val bs = Array.ofDim[Long](8, 8)
      val cnt = Array.ofDim[Long](8, 8)
      var tot = 0L
      var y = 0
      while (y < h) {
        val bi = math.min(y * 8 / h, 7)
        var x = 0
        while (x < w) {
          val bj = math.min(x * 8 / w, 7)
          val p = img.getRGB(x, y)
          val lum = ((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)
          bs(bi)(bj) += lum
          cnt(bi)(bj) += 1
          tot += lum
          x += 1
        }
        y += 1
      }
      val npx = w.toLong * h
      var hi = 0L
      var lo = 0L
      var i = 0
      while (i < 64) {
        val bit =
          if (bs(i / 8)(i % 8) * npx >= tot * cnt(i / 8)(i % 8)) 1L else 0L
        if (i < 32) hi |= bit << (31 - i) else lo |= bit << (63 - i)
        i += 1
      }
      (hi, lo)
    }

    /** EXACT-INTEGER decode features for ALL THREE modalities: PNG
      * luminance channel-sum + pixel count (PNG is lossless, so the
      * decoded pixels ARE the generator formula's), WAV PCM energy Σv²
      * + sample count (the PCM rides uncompressed), and — since the
      * generator's video track moved to motion-PNG frames — the video
      * leg's sampled-frame luminance sum + pixel count end-to-end
      * through the REAL path (ISO BMFF box walk → stsz/stco byte-range
      * frame sampling → ImageIO pixel decode), with `fs` = frames
      * actually sampled. These are the quantities a SQL oracle can
      * replay closed-form from the generator arithmetic — the float
      * surface (mean, RMS) derives from them OUTSIDE the aggregation,
      * as one IEEE expression over exact integers. (The lossy JPEG
      * frame variant survives as a spec-exercised robustness case:
      * `IsoBmff.mp4Bytes(codec = "jpeg")`.) */
    def decodeExact(r: MediaRow): ExactDecode = r.meta.mime match {
      case "video/mp4" =>
        val info = IsoBmff.parse(r.payload)
        val nFrames = info.sampleSizes.length
        val sampled = math.min(math.min((info.durationMs / 1000).toInt, 8), nFrames)
        var sum = 0L
        var pixels = 0L
        var k = 0
        while (k < sampled) {
          val (off, len) = info.frameRange(k * nFrames / math.max(1, sampled))
          val img = ImageIO.read(new ByteArrayInputStream(r.payload, off.toInt, len))
          var y = 0
          while (y < img.getHeight) {
            var x = 0
            while (x < img.getWidth) {
              val p = img.getRGB(x, y)
              sum += ((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)
              x += 1
            }
            y += 1
          }
          pixels += img.getWidth.toLong * img.getHeight
          k += 1
        }
        ExactDecode(r.doc_id, r.meta.mime, sum, pixels, 0L, 0L, sampled.toLong)
      case "image/png" =>
        val img = ImageIO.read(new ByteArrayInputStream(r.payload))
        var sum = 0L
        var y = 0
        while (y < img.getHeight) {
          var x = 0
          while (x < img.getWidth) {
            val p = img.getRGB(x, y)
            sum += ((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)
            x += 1
          }
          y += 1
        }
        ExactDecode(r.doc_id, r.meta.mime, sum,
          img.getWidth.toLong * img.getHeight, 0L, 0L, 0L)
      case _ => // audio/wav
        val ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(r.payload))
        val frames = ais.getFrameLength.toInt
        val bytes = ais.readAllBytes()
        var energy = 0L
        var i = 0
        while (i < frames) {
          val v = (((bytes(2 * i + 1) & 0xff) << 8) | (bytes(2 * i) & 0xff)).toShort.toLong
          energy += v * v
          i += 1
        }
        // fs mirrors decodeAudio's sampled-frame count: 1 per 100 ms of
        // MEASURED PCM (frames/frameRate), capped at 8 — replayable as
        // least(durMs/100, 8) since the generator writes durMs·8 samples
        val durSec = frames.toDouble / ais.getFormat.getFrameRate
        val fs = math.min((durSec * 10).round, 8L)
        ExactDecode(r.doc_id, r.meta.mime, 0L, 0L, energy, frames.toLong, fs)
    }
  }

  final case class ExactDecode(doc_id: Long, mime: String,
      lum: Long, px: Long, energy: Long, ns: Long, fs: Long)

  /** Deterministic media table derived from documents: REAL png/wav/mp4
    * payloads (JDK-encoded; mp4 = motion-PNG in ISO BMFF) keyed off
    * doc_id. */
  def mediaTable(s: SparkSession, d: String): Dataset[MediaRow] = {
    import s.implicits._
    // codec work is CPU-bound per ROW, but the id list arrives sized by
    // input BYTES (one small parquet split ⇒ one partition ⇒ serial
    // encode/decode); repartitioning the 8-byte ids costs nothing and
    // spreads the codec across every core. The same rule at 100 TB:
    // size binary-decode stages by row/frame count (repartition or a
    // small files.maxPartitionBytes), never by compressed input bytes.
    Tables.documents(s, d).select($"doc_id").as[Long]
      .repartition(s.sparkContext.defaultParallelism)
      .map { id =>
      val w = (32 + (id % 16) * 8).toInt
      val h = (32 + (id % 9) * 8).toInt
      id % 3 match {
        case 0 =>
          MediaRow(id, JdkCodec.pngBytes(id, w, h), MediaMeta("image/png", w, h, 0L))
        case 1 =>
          val durMs = (id % 5) * 100 + 100 // 100..500 ms
          MediaRow(id, JdkCodec.wavBytes(id, durMs), MediaMeta("audio/wav", 0, 0, durMs))
        case _ =>
          val durMs = (id % 20) * 1000
          MediaRow(id, IsoBmff.mp4Bytes(id, w, h, durMs, fps = 1),
            MediaMeta("video/mp4", w, h, durMs))
      }
    }
  }

  /** Batch decode: one codec init per partition, fixed-size batches
    * (the shape a vectorized decoder needs). */
  def decodeFeatures(media: Dataset[MediaRow], batchSize: Int = 32): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition codec init: keep ImageIO off its temp-file cache
      javax.imageio.ImageIO.setUseCache(false)
      rows.grouped(batchSize).flatMap { batch => batch.map(JdkCodec.decode) }
    }
  }

  /** The media table STAGED as parquet — binary payload column + typed
    * metadata struct made literal on disk, exactly the layout the
    * Scaladoc above argues for. Encoding (PNG/WAV/motion-PNG-MP4 byte
    * generation) runs once per dataset; every media query reads the
    * staged bytes. Same [[graft.Staging]] lifecycle as the ANN/BM25
    * indexes. The read path re-sizes partitions by ROW count: payload
    * splits are byte-sized, and codec work is CPU-per-row. */
  private[graft] def mediaRoot(s: SparkSession, d: String): String = {
    import s.implicits._
    val (dirKey, fp) = graft.Tables.stagingKey(d, "documents")
    val root = s"/tmp/graft_q/mm_$dirKey"
    val marker = java.nio.file.Paths.get(root, "staging_format.txt")
    val fmt = s"v5-media-parquet|$fp" // v4 moved video to motion-PNG at 1 fps
    // (PNG frames barely compress the gradient, so 4 fps bloated the staged
    // store ~6x and every media query paid the read; 1 fps restores r11-parity
    // payload bytes while the sampler math is fps-independent: sampled =
    // min(dur_s, 8)); v5 switched the PNG encoder to Sub filtering, which
    // shrank the staged store ~85x — bump the prefix again on the next
    // byte-layout change
    if (java.nio.file.Files.exists(marker) &&
        new String(java.nio.file.Files.readAllBytes(marker), "UTF-8") == fmt) {
      if (!new java.io.File(root, "staging_source.txt").exists())
        graft.Staging.recordSource(root, d, "documents", fp)
      return root
    }
    graft.Staging.vacuum()
    val tmp = graft.Staging.tempBuildDir()
    mediaTable(s, d).write.mode("overwrite").parquet(s"$tmp/media")
    java.nio.file.Files.write(tmp.toPath.resolve("staging_format.txt"),
      fmt.getBytes("UTF-8"))
    graft.Staging.publish(tmp, root, d, "documents", fp)
    root
  }

  private def stagedMedia(s: SparkSession, d: String): Dataset[MediaRow] = {
    import s.implicits._
    // repartition is the right tool at this data size; at real media
    // scale you would lower spark.sql.files.maxPartitionBytes on the
    // scan instead — re-splitting at the source beats shuffling payload
    // bytes once the payload column dominates the row
    s.read.parquet(s"${mediaRoot(s, d)}/media").as[MediaRow]
      .repartition(s.sparkContext.defaultParallelism)
  }

  // The flagship end-to-end readout over all three modalities — image
  // pixel decode, audio PCM decode, video container walk → byte-range
  // frame sampling → pixel decode — aggregated per mime as EXACT
  // integers (lum/pixel sums, PCM energy/samples, frames sampled), the
  // floats derived in one IEEE expression after aggregation: the
  // mm_decode_features discipline, now covering video because the
  // generator's frames are lossless motion-PNG. This is what graduated
  // mm_binary_pipeline from rows-only to a full value oracle (the last
  // no_oracle row in CORRECTNESS_r11).
  private def pipeline(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    stagedMedia(s, d)
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false)
        rows.map(JdkCodec.decodeExact)
      }
      .groupBy($"mime")
      .agg(count(lit(1)).as("n"),
        sum($"fs").as("frames_sampled"),
        sum($"lum".cast("decimal(38,0)")).cast("long").as("lum_sum"),
        sum($"px".cast("decimal(38,0)")).cast("long").as("pixels"),
        sum($"energy".cast("decimal(38,0)")).cast("long").as("pcm_energy"),
        sum($"ns".cast("decimal(38,0)")).cast("long").as("pcm_samples"))
      .withColumn("brightness",
        when($"pixels" > 0,
          $"lum_sum" / ($"pixels" * lit(3.0))).otherwise(lit(0.0)))
      .withColumn("rms_level",
        when($"pcm_samples" > 0,
          sqrt($"pcm_energy" / ($"pcm_samples" * lit(1.0))) / 32768.0 * 255.0)
          .otherwise(lit(0.0)))
      .orderBy($"mime")
  }
  // Closed-form replay of the video leg: per sampled frame i of video
  // doc_id (w×h), the gradient is separable with single-wrap mods —
  // r = ((id+5i)%256 + x)%256 row-invariant, g = ((31·id+11i)%256+y)%256
  // column-invariant, b = ((y+3i)%256 + x)%256 — so each frame's
  // channel sum assembles from three arithmetic series of the form
  // Σ_{x<w}(c+x)%256 = w·c + w(w−1)/2 − 256·max(0, c+w−256) (w ≤ 152,
  // h ≤ 96 < 256 ⇒ at most one wrap), with only the b term needing a
  // y-unnest (≤ 96 rows/frame). Frame indices replay the Scala
  // sampler: k·nFrames // sampled, sampled = least(id%20, 8).
  private val pipelineSql =
    """WITH m AS (
      |  SELECT doc_id,
      |    CASE doc_id % 3 WHEN 0 THEN 'image/png' WHEN 1 THEN 'audio/wav'
      |         ELSE 'video/mp4' END AS mime,
      |    32 + (doc_id % 16) * 8 AS w,
      |    32 + (doc_id % 9) * 8 AS h,
      |    CASE doc_id % 3 WHEN 1 THEN (doc_id % 5) * 100 + 100 ELSE 0 END AS dur,
      |    220 + doc_id % 220 AS freq
      |  FROM documents),
      |sx AS (SELECT doc_id, SUM((doc_id + x.x) % 256) AS v
      |       FROM m, unnest(range(0, m.w)) x(x)
      |       WHERE mime = 'image/png' GROUP BY doc_id),
      |sy AS (SELECT doc_id, SUM((doc_id * 31 + y.y) % 256) AS v
      |       FROM m, unnest(range(0, m.h)) y(y)
      |       WHERE mime = 'image/png' GROUP BY doc_id),
      |img AS (SELECT m.doc_id,
      |    m.h * sx.v + m.w * sy.v
      |      + m.h * (m.w * (m.w - 1) // 2) + m.w * (m.h * (m.h - 1) // 2) AS lum,
      |    m.w * m.h AS px
      |  FROM m JOIN sx USING (doc_id) JOIN sy USING (doc_id)),
      |pcm AS (SELECT doc_id, SUM(CAST(v AS HUGEINT) * v) AS energy, COUNT(*) AS ns,
      |    least(MAX(dur) // 100, 8) AS fs
      |  FROM (SELECT doc_id, dur,
      |      CASE WHEN t < 2000 THEN t * 6
      |           WHEN t < 6000 THEN (4000 - t) * 6
      |           ELSE (t - 8000) * 6 END AS v
      |    FROM (SELECT doc_id, dur, (freq * i.i) % 8000 AS t
      |          FROM m, unnest(range(0, m.dur * 8)) i(i)
      |          WHERE mime = 'audio/wav'))
      |  GROUP BY doc_id),
      |vid AS (SELECT doc_id, w, h,
      |    greatest(1, (doc_id % 20) * 1) AS nf, least(doc_id % 20, 8) AS samp
      |  FROM m WHERE mime = 'video/mp4'),
      |vframes AS (SELECT doc_id, w, h, samp, (k.k * nf) // samp AS i
      |  FROM vid, unnest(range(0, vid.samp)) k(k)),
      |vframe_rg AS (SELECT doc_id, w, h, samp, i,
      |    -- r: row-invariant series, times h rows
      |    h * (w * ((doc_id + i * 5) % 256) + w * (w - 1) // 2
      |         - 256 * greatest(0, (doc_id + i * 5) % 256 + w - 256)) AS rsum,
      |    -- g: column-invariant series, times w columns
      |    w * (h * ((doc_id * 31 + i * 11) % 256) + h * (h - 1) // 2
      |         - 256 * greatest(0, (doc_id * 31 + i * 11) % 256 + h - 256)) AS gsum
      |  FROM vframes),
      |vframe_b AS (SELECT doc_id, i,
      |    SUM(w * ((y.y + i * 3) % 256) + w * (w - 1) // 2
      |        - 256 * greatest(0, (y.y + i * 3) % 256 + w - 256)) AS bsum
      |  FROM vframes, unnest(range(0, vframes.h)) y(y) GROUP BY doc_id, i),
      |vdoc AS (SELECT f.doc_id,
      |    SUM(f.rsum + f.gsum + b.bsum) AS lum,
      |    MAX(f.samp) * MAX(f.w) * MAX(f.h) AS px, MAX(f.samp) AS fs
      |  FROM vframe_rg f JOIN vframe_b b ON b.doc_id = f.doc_id AND b.i = f.i
      |  GROUP BY f.doc_id),
      |agg AS (
      |  SELECT 'image/png' AS mime, COUNT(*) AS n, CAST(0 AS BIGINT) AS fs,
      |    CAST(SUM(lum) AS BIGINT) AS lum_sum, CAST(SUM(px) AS BIGINT) AS pixels,
      |    CAST(0 AS BIGINT) AS pcm_energy, CAST(0 AS BIGINT) AS pcm_samples
      |  FROM img
      |  UNION ALL
      |  SELECT 'audio/wav', COUNT(*), CAST(SUM(fs) AS BIGINT),
      |    CAST(0 AS BIGINT), CAST(0 AS BIGINT),
      |    CAST(SUM(energy) AS BIGINT), CAST(SUM(ns) AS BIGINT)
      |  FROM pcm
      |  UNION ALL
      |  SELECT 'video/mp4', COUNT(*) AS n, CAST(SUM(v.fs) AS BIGINT),
      |    CAST(SUM(v.lum) AS BIGINT), CAST(SUM(v.px) AS BIGINT),
      |    CAST(0 AS BIGINT), CAST(0 AS BIGINT)
      |  FROM vid LEFT JOIN vdoc v USING (doc_id))
      |SELECT mime, n, fs AS frames_sampled, lum_sum, pixels,
      |  pcm_energy, pcm_samples,
      |  CASE WHEN pixels > 0 THEN lum_sum / (pixels * 3.0) ELSE 0.0 END AS brightness,
      |  CASE WHEN pcm_samples > 0
      |       THEN sqrt(pcm_energy / (pcm_samples * 1.0)) / 32768.0 * 255.0
      |       ELSE 0.0 END AS rms_level
      |FROM agg ORDER BY mime""".stripMargin

  // -- mm_metadata: the value-oracled container-level half ------------------
  // Everything below is MEASURED from the real payload bytes — PNG IHDR
  // fields, the canonical 44-byte WAV header arithmetic, the ISO BMFF
  // box walk — but involves no pixel/PCM decode, so a SQL engine can
  // replay the identical quantities from the generator's arithmetic.
  // (Historically this carved the oracle-able half out of a rows-only
  // mm_binary_pipeline; since the video track moved to lossless
  // motion-PNG frames, the pipeline itself is value-oracled too.)

  final case class ContainerMeta(
      doc_id: Long, mime: String, duration_ms: Long, frames: Long,
      frames_sampled: Long, width: Long, height: Long,
      wav_bytes: Long, box_count: Long)

  /** Container-level parse of one media row (header/box/sample-table
    * arithmetic only; never decodes a pixel or a PCM sample). The
    * frames_sampled rule matches [[JdkCodec.decodeAudio]] /
    * [[JdkCodec.decodeVideo]] exactly. */
  def containerMeta(r: MediaRow): ContainerMeta = r.meta.mime match {
    case "image/png" =>
      val p = r.payload
      require(p(1) == 'P'.toByte && p(2) == 'N'.toByte && p(3) == 'G'.toByte,
        s"doc ${r.doc_id}: not a PNG stream")
      // IHDR is mandated first: width/height big-endian at offsets 16/20
      def be32(o: Int): Long =
        ((p(o) & 0xffL) << 24) | ((p(o + 1) & 0xffL) << 16) |
          ((p(o + 2) & 0xffL) << 8) | (p(o + 3) & 0xffL)
      ContainerMeta(r.doc_id, r.meta.mime, 0L, 1L, 0L, be32(16), be32(20), 0L, 0L)
    case "audio/wav" =>
      val total = r.payload.length.toLong
      val frames = (total - 44) / 2 // canonical RIFF+fmt+data header is 44 bytes
      val durMs = frames / (JdkCodec.SampleRate / 1000) // 8 frames per ms
      val sampled = math.min(durMs / 100, 8L) // 10 Hz frame sampling, capped
      ContainerMeta(r.doc_id, r.meta.mime, durMs, frames, sampled, 0L, 0L, total, 0L)
    case _ =>
      val info = IsoBmff.parse(r.payload)
      val frames = info.sampleSizes.length.toLong
      val sampled = math.min(math.min(info.durationMs / 1000, 8L), frames)
      ContainerMeta(r.doc_id, r.meta.mime, info.durationMs, frames, sampled,
        info.width.toLong, info.height.toLong, 0L,
        IsoBmff.topLevelBoxes(r.payload).toLong)
  }

  private def metadata(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    stagedMedia(s, d).map(containerMeta)
      .groupBy($"mime")
      .agg(count(lit(1)).as("n"),
        sum($"duration_ms").as("total_duration_ms"),
        sum($"frames").as("total_frames"),
        sum($"frames_sampled").as("frames_sampled"),
        sum($"width").as("total_width"),
        sum($"height").as("total_height"),
        sum($"wav_bytes").as("wav_bytes"),
        sum($"box_count").as("box_count"))
      .orderBy($"mime")
  }

  /** DuckDB replay of the generator arithmetic the container parse must
    * land on: mime/dims/duration from doc_id, WAV bytes = 44 + 16·durMs
    * (8 kHz, 16-bit mono), video frame count = max(1, durMs/1000),
    * 3 top-level BMFF boxes. */
  private val metadataSql =
    """WITH m AS (
      |  SELECT doc_id,
      |    CASE doc_id % 3 WHEN 0 THEN 'image/png' WHEN 1 THEN 'audio/wav'
      |         ELSE 'video/mp4' END AS mime,
      |    32 + (doc_id % 16) * 8 AS w,
      |    32 + (doc_id % 9) * 8 AS h,
      |    CASE doc_id % 3 WHEN 1 THEN (doc_id % 5) * 100 + 100
      |         WHEN 2 THEN (doc_id % 20) * 1000 ELSE 0 END AS dur
      |  FROM documents),
      |f AS (
      |  SELECT mime, dur,
      |    CASE mime WHEN 'image/png' THEN 1 WHEN 'audio/wav' THEN dur * 8
      |         ELSE GREATEST(1, dur * 1 // 1000) END AS frames,
      |    CASE mime WHEN 'image/png' THEN 0
      |         WHEN 'audio/wav' THEN LEAST(dur // 100, 8)
      |         ELSE LEAST(LEAST(dur // 1000, 8), GREATEST(1, dur * 1 // 1000)) END AS sampled,
      |    CASE WHEN mime = 'audio/wav' THEN 0 ELSE w END AS w2,
      |    CASE WHEN mime = 'audio/wav' THEN 0 ELSE h END AS h2,
      |    CASE WHEN mime = 'audio/wav' THEN 44 + dur * 16 ELSE 0 END AS wav_bytes,
      |    CASE WHEN mime = 'video/mp4' THEN 3 ELSE 0 END AS box_count
      |  FROM m)
      |SELECT mime, CAST(COUNT(*) AS BIGINT) AS n,
      |  CAST(SUM(dur) AS BIGINT) AS total_duration_ms,
      |  CAST(SUM(frames) AS BIGINT) AS total_frames,
      |  CAST(SUM(sampled) AS BIGINT) AS frames_sampled,
      |  CAST(SUM(w2) AS BIGINT) AS total_width,
      |  CAST(SUM(h2) AS BIGINT) AS total_height,
      |  CAST(SUM(wav_bytes) AS BIGINT) AS wav_bytes,
      |  CAST(SUM(box_count) AS BIGINT) AS box_count
      |FROM f GROUP BY mime ORDER BY mime""".stripMargin

  // -- mm_decode_features: the value-oracled DECODE half ---------------------
  // Real codec decode (ImageIO pixels, AudioSystem PCM) reduced to
  // exact integers a SQL engine can replay from the generator
  // arithmetic: PNG is lossless, so the decoded channel sum per image
  // is h·Σ_x(id+x)%256 + w·Σ_y(id·31+y)%256 + h·w(w−1)/2 + w·h(h−1)/2
  // (x+y < 256 always, so its mod is the identity); WAV PCM is the
  // uncompressed integer triangle wave, so Σv² replays sample-exact.
  // The float columns (mean brightness, RMS level) are ONE IEEE
  // expression over the exact aggregate integers on both engines —
  // no engine-ordered float accumulation anywhere.
  private def decodeExactQ(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    stagedMedia(s, d).filter(r => r.meta.mime != "video/mp4")
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false)
        rows.map(JdkCodec.decodeExact)
      }
      .groupBy($"mime")
      .agg(count(lit(1)).as("n"),
        sum($"lum".cast("decimal(38,0)")).cast("long").as("lum_sum"),
        sum($"px".cast("decimal(38,0)")).cast("long").as("pixels"),
        sum($"energy".cast("decimal(38,0)")).cast("long").as("pcm_energy"),
        sum($"ns".cast("decimal(38,0)")).cast("long").as("pcm_samples"))
      .withColumn("brightness",
        when($"pixels" > 0,
          $"lum_sum" / ($"pixels" * lit(3.0))).otherwise(lit(0.0)))
      .withColumn("rms_level",
        when($"pcm_samples" > 0,
          sqrt($"pcm_energy" / ($"pcm_samples" * lit(1.0))) / 32768.0 * 255.0)
          .otherwise(lit(0.0)))
      .orderBy($"mime")
  }
  private val decodeExactSql =
    """WITH m AS (
      |  SELECT doc_id,
      |    CASE doc_id % 3 WHEN 0 THEN 'image/png' ELSE 'audio/wav' END AS mime,
      |    32 + (doc_id % 16) * 8 AS w,
      |    32 + (doc_id % 9) * 8 AS h,
      |    CASE doc_id % 3 WHEN 1 THEN (doc_id % 5) * 100 + 100 ELSE 0 END AS dur,
      |    220 + doc_id % 220 AS freq
      |  FROM documents WHERE doc_id % 3 < 2),
      |sx AS (SELECT doc_id, SUM((doc_id + x.x) % 256) AS v
      |       FROM m, unnest(range(0, m.w)) x(x)
      |       WHERE mime = 'image/png' GROUP BY doc_id),
      |sy AS (SELECT doc_id, SUM((doc_id * 31 + y.y) % 256) AS v
      |       FROM m, unnest(range(0, m.h)) y(y)
      |       WHERE mime = 'image/png' GROUP BY doc_id),
      |img AS (SELECT m.doc_id,
      |    m.h * sx.v + m.w * sy.v
      |      + m.h * (m.w * (m.w - 1) // 2) + m.w * (m.h * (m.h - 1) // 2) AS lum,
      |    m.w * m.h AS px
      |  FROM m JOIN sx USING (doc_id) JOIN sy USING (doc_id)),
      |pcm AS (SELECT doc_id, SUM(CAST(v AS HUGEINT) * v) AS energy, COUNT(*) AS ns
      |  FROM (SELECT doc_id,
      |      CASE WHEN t < 2000 THEN t * 6
      |           WHEN t < 6000 THEN (4000 - t) * 6
      |           ELSE (t - 8000) * 6 END AS v
      |    FROM (SELECT doc_id, (freq * i.i) % 8000 AS t
      |          FROM m, unnest(range(0, m.dur * 8)) i(i)
      |          WHERE mime = 'audio/wav'))
      |  GROUP BY doc_id),
      |agg AS (
      |  SELECT 'image/png' AS mime, COUNT(*) AS n,
      |    CAST(SUM(lum) AS BIGINT) AS lum_sum, CAST(SUM(px) AS BIGINT) AS pixels,
      |    CAST(0 AS BIGINT) AS pcm_energy, CAST(0 AS BIGINT) AS pcm_samples
      |  FROM img
      |  UNION ALL
      |  SELECT 'audio/wav', COUNT(*), CAST(0 AS BIGINT), CAST(0 AS BIGINT),
      |    CAST(SUM(energy) AS BIGINT), CAST(SUM(ns) AS BIGINT)
      |  FROM pcm)
      |SELECT mime, n, lum_sum, pixels, pcm_energy, pcm_samples,
      |  CASE WHEN pixels > 0 THEN lum_sum / (pixels * 3.0) ELSE 0.0 END AS brightness,
      |  CASE WHEN pcm_samples > 0
      |       THEN sqrt(pcm_energy / (pcm_samples * 1.0)) / 32768.0 * 255.0
      |       ELSE 0.0 END AS rms_level
      |FROM agg ORDER BY mime""".stripMargin

  // -- mm_phash_dedup: perceptual image dedup via average hash --------------
  // Image near-dup the way production media pipelines do it: a 64-bit
  // aHash over the REAL ImageIO-decoded pixels (8×8 block means vs the
  // global mean — byte-identical crops/re-encodes collapse; here the
  // generator's gradient family collides across sizes, which is the
  // point: the hash sees structure, not bytes), then dup groups by
  // exact hash equality — one 16-byte-key groupBy, the dedup_exact
  // shape, scalable to any corpus. The ORACLE replays the whole hash
  // closed-form: the pixel field is separable (r depends on x, g on y,
  // and b = (x+y)%256 = x+y since max 246 < 256), so every 8×8 block
  // sum assembles from two 1-D prefix aggregates per image —
  // ny·(Σr+Σx) + nx·(Σg+Σy) — never a pixel grid; bits use the same
  // integer cross-multiplication as the Scala decoder. Equality proves
  // decode + hash == generator arithmetic bit-for-bit.
  private def phashDedup(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val hashes = stagedMedia(s, d)
      .filter(_.meta.mime == "image/png")
      .map { r =>
        val (hi, lo) = JdkCodec.aHash(r.payload)
        (r.doc_id, hi, lo)
      }
      .toDF("doc_id", "h_hi", "h_lo")
    hashes.groupBy($"h_hi", $"h_lo")
      .agg(count(lit(1)).as("n_images"), min($"doc_id").as("keep_id"))
      .filter($"n_images" >= 2)
      .select($"keep_id", $"n_images", $"h_hi", $"h_lo")
      .orderBy($"keep_id")
  }
  private val phashDedupSql =
    """WITH imgs AS (SELECT doc_id AS id,
      |    32 + (doc_id % 16) * 8 AS w, 32 + (doc_id % 9) * 8 AS h
      |  FROM documents WHERE doc_id % 3 = 0),
      |xs AS (SELECT id, w, h, x.x AS x, least((x.x * 8) // w, 7) AS bj,
      |    (id + x.x) % 256 AS r
      |  FROM imgs, unnest(range(0, w)) x(x)),
      |ys AS (SELECT id, w, h, y.y AS y, least((y.y * 8) // h, 7) AS bi,
      |    (id * 31 + y.y) % 256 AS g
      |  FROM imgs, unnest(range(0, h)) y(y)),
      |bx AS (SELECT id, bj, COUNT(*) AS nx, SUM(r) AS sr, SUM(x) AS sx
      |  FROM xs GROUP BY 1, 2),
      |byy AS (SELECT id, bi, COUNT(*) AS ny, SUM(g) AS sg, SUM(y) AS sy
      |  FROM ys GROUP BY 1, 2),
      |blocks AS (SELECT bx.id, byy.bi, bx.bj,
      |    byy.ny * (bx.sr + bx.sx) + bx.nx * (byy.sg + byy.sy) AS bs,
      |    byy.ny * bx.nx AS cnt
      |  FROM bx JOIN byy ON byy.id = bx.id),
      |tot AS (SELECT id, SUM(bs) AS tot, SUM(cnt) AS npx
      |  FROM blocks GROUP BY 1),
      |bits AS (SELECT b.id, b.bi * 8 + b.bj AS idx,
      |    CASE WHEN b.bs * t.npx >= t.tot * b.cnt THEN 1 ELSE 0 END AS bit
      |  FROM blocks b JOIN tot t ON t.id = b.id),
      |hashes AS (SELECT id,
      |    CAST(SUM(CASE WHEN idx < 32
      |      THEN CAST(bit AS BIGINT) << (31 - idx) ELSE 0 END) AS BIGINT)
      |      AS h_hi,
      |    CAST(SUM(CASE WHEN idx >= 32
      |      THEN CAST(bit AS BIGINT) << (63 - idx) ELSE 0 END) AS BIGINT)
      |      AS h_lo
      |  FROM bits GROUP BY 1)
      |SELECT MIN(id) AS keep_id, COUNT(*) AS n_images, h_hi, h_lo
      |FROM hashes GROUP BY h_hi, h_lo HAVING COUNT(*) >= 2
      |ORDER BY keep_id""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("mm_phash_dedup", phashDedup, Some(phashDedupSql)),
    QueryDef("mm_binary_pipeline", pipeline, Some(pipelineSql)),
    QueryDef("mm_metadata", metadata, Some(metadataSql)),
    QueryDef("mm_decode_features", decodeExactQ, Some(decodeExactSql)),
  )
}
