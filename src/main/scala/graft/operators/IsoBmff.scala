package graft.operators

/** Minimal ISO BMFF (MP4) container support in pure JDK — the piece the
  * multimodal pipeline was missing a real third format for. Two halves:
  *
  *  - a WRITER that emits a structurally-valid single-video-track file
  *    (ftyp + mdat + moov with the full sample-table chain
  *    mvhd/tkhd/mdhd/hdlr/vmhd/dinf/stsd/stts/stsc/stsz/stco), used by
  *    the media generator so the decode path runs on genuine container
  *    bytes rather than an opaque blob;
  *  - a PARSER that walks the box tree and reads the sample TABLES:
  *    movie timescale/duration from mvhd, track dimensions from tkhd
  *    (16.16 fixed point), per-frame sizes from stsz and the chunk
  *    offset from stco — which is exactly what frame SAMPLING needs
  *    (byte ranges of the k-th frames).
  *
  * Frames are MOTION-JPEG (sample entry `jpeg`): each stsz/stco-indexed
  * sample is a complete JPEG, which `javax.imageio` decodes — so frame
  * PIXEL decode needs no codec outside the JDK and the video leg of the
  * multimodal pipeline is real end-to-end (container parse → byte-range
  * sampling → pixel decode → pixel features).
  *
  * Layout constants follow the public ISO/IEC 14496-12 box definitions.
  */
object IsoBmff {

  // -- byte helpers ---------------------------------------------------------
  private def be32(v: Long): Array[Byte] = Array(
    ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
    ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def be16(v: Int): Array[Byte] =
    Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def cat(parts: Array[Byte]*): Array[Byte] = {
    val out = new Array[Byte](parts.map(_.length).sum)
    var o = 0
    parts.foreach { p => System.arraycopy(p, 0, out, o, p.length); o += p.length }
    out
  }
  private def box(typ: String, parts: Array[Byte]*): Array[Byte] = {
    val payload = cat(parts: _*)
    cat(be32(8L + payload.length), typ.getBytes("US-ASCII"), payload)
  }

  // -- writer ---------------------------------------------------------------
  val Timescale = 1000L // movie ticks per second → duration ticks = ms

  /** Deterministic per-frame source image: a gradient keyed by docId
    * that SHIFTS with the frame index (so consecutive frames differ, as
    * real video does). Public so specs can recompute the pre-encode
    * pixel ground truth the decoded features must approximate. */
  def frameImage(docId: Long, i: Int, w: Int, h: Int): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r = ((docId + x + i * 5) % 256).toInt
        val g = ((docId * 31 + y + i * 11) % 256).toInt
        val b = (x + y + i * 3) % 256
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    img
  }

  /** One motion-JPEG sample: the frame image ImageIO-encoded as a
    * complete JPEG byte stream. */
  def jpegFrame(docId: Long, i: Int, w: Int, h: Int): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(frameImage(docId, i, w, h), "jpg", bos)
    bos.toByteArray
  }

  /** One motion-PNG sample: the frame image as a complete PNG byte
    * stream. LOSSLESS — decoded pixels are exactly [[frameImage]]'s
    * formula, which is what lets the video leg of the multimodal
    * pipeline carry a closed-form SQL value oracle (JPEG's DCT
    * quantization is codec-specific; deflate is not lossy). Encoded by
    * [[PngCodec]], not `ImageIO.write`: the JDK writer leaves these
    * gradient frames nearly raw (~14 KB for 44 KB of pixels), which at
    * 4 fps bloated the staged media store ~6× over the JPEG era and
    * taxed every media query's scan; Sub-filtered rows of the gradient
    * are constant deltas, so a proper filter + max deflate crushes a
    * frame to a few hundred bytes. `ImageIO.read` decodes it like any
    * other PNG — the read path stays the real JDK codec. */
  def pngFrame(docId: Long, i: Int, w: Int, h: Int): Array[Byte] =
    PngCodec.encode(frameImage(docId, i, w, h))

  /** A structurally-valid one-track MP4: `frames` samples in one chunk,
    * sample tables consistent with the payload layout. `codec` picks
    * the frame encoding — "png" (default; lossless, oracle-replayable
    * pixels) or "jpeg" (the lossy robustness variant the specs keep
    * exercising). */
  def mp4Bytes(docId: Long, w: Int, h: Int, durationMs: Long, fps: Int = 4,
      codec: String = "png"): Array[Byte] = {
    val frames = math.max(1, durationMs * fps / 1000).toInt
    val frameOf: Int => Array[Byte] =
      if (codec == "jpeg") jpegFrame(docId, _, w, h)
      else pngFrame(docId, _, w, h)
    val framePayloads = (0 until frames).map(frameOf)
    val sizes = framePayloads.map(_.length)
    val frameData = cat(framePayloads: _*)
    val ftyp = box("ftyp", "isom".getBytes("US-ASCII"), be32(0x200),
      "isom".getBytes("US-ASCII"), "iso2".getBytes("US-ASCII"),
      "mp41".getBytes("US-ASCII"))
    val mdat = box("mdat", frameData)
    val mdatDataOffset = ftyp.length + 8
    val identityMatrix = cat(be32(0x00010000L), be32(0), be32(0),
      be32(0), be32(0x00010000L), be32(0), be32(0), be32(0), be32(0x40000000L))
    val mvhd = box("mvhd", be32(0), be32(0), be32(0), be32(Timescale),
      be32(durationMs), be32(0x00010000L), be16(0x0100), be16(0),
      be32(0), be32(0), identityMatrix,
      cat((0 until 6).map(_ => be32(0)): _*), be32(2))
    val tkhd = box("tkhd", be32(7), be32(0), be32(0), be32(1), be32(0),
      be32(durationMs), be32(0), be32(0), be16(0), be16(0), be16(0), be16(0),
      identityMatrix, be32(w.toLong << 16), be32(h.toLong << 16))
    val mdhd = box("mdhd", be32(0), be32(0), be32(0), be32(Timescale),
      be32(durationMs), be16(0x55c4), be16(0))
    val hdlr = box("hdlr", be32(0), be32(0), "vide".getBytes("US-ASCII"),
      be32(0), be32(0), be32(0), Array[Byte](0))
    val vmhd = box("vmhd", be32(1), be16(0), be16(0), be16(0), be16(0))
    val dinf = box("dinf", box("dref", be32(0), be32(1), box("url ", be32(1))))
    val sampleEntry = box(if (codec == "jpeg") "jpeg" else "png ",
      new Array[Byte](6), be16(1),
      new Array[Byte](16), be16(w), be16(h), be32(0x00480000L), be32(0x00480000L),
      be32(0), be16(1), new Array[Byte](32), be16(24), be16(0xffff))
    val stsd = box("stsd", be32(0), be32(1), sampleEntry)
    val stts = box("stts", be32(0), be32(1), be32(frames),
      be32(Timescale / fps))
    val stsc = box("stsc", be32(0), be32(1), be32(1), be32(frames), be32(1))
    val stsz = box("stsz", be32(0), be32(0), be32(frames),
      cat(sizes.map(s => be32(s)): _*))
    val stco = box("stco", be32(0), be32(1), be32(mdatDataOffset))
    val stbl = box("stbl", stsd, stts, stsc, stsz, stco)
    val minf = box("minf", vmhd, dinf, stbl)
    val mdia = box("mdia", mdhd, hdlr, minf)
    val trak = box("trak", tkhd, mdia)
    val moov = box("moov", mvhd, trak)
    cat(ftyp, mdat, moov)
  }

  // -- parser ---------------------------------------------------------------
  private def u32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
      ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
  private def typ4(b: Array[Byte], o: Int): String =
    new String(b, o, 4, "US-ASCII")

  /** (type, payloadStart, payloadEnd) for each box in [start, end). */
  def children(b: Array[Byte], start: Int, end: Int): Seq[(String, Int, Int)] = {
    val out = Seq.newBuilder[(String, Int, Int)]
    var p = start
    while (p + 8 <= end) {
      val size = u32(b, p)
      if (size < 8 || p + size > end)
        throw new IllegalArgumentException(
          s"malformed box at offset $p: size=$size within [$start, $end)")
      out += ((typ4(b, p + 4), p + 8, p + size.toInt))
      p += size.toInt
    }
    out.result()
  }

  /** Payload range of the first box at a nested container path. */
  def find(b: Array[Byte], path: Seq[String]): Option[(Int, Int)] = {
    var range = (0, b.length)
    path.foreach { t =>
      children(b, range._1, range._2).find(_._1 == t) match {
        case Some((_, s, e)) => range = (s, e)
        case None => return None
      }
    }
    Some(range)
  }

  final case class Mp4Info(durationMs: Long, width: Int, height: Int,
      sampleSizes: Seq[Int], chunkOffset: Long) {
    def frameRange(i: Int): (Long, Int) =
      (chunkOffset + sampleSizes.take(i).map(_.toLong).sum, sampleSizes(i))
  }

  /** Number of top-level boxes — pure size-walk container arithmetic
    * (the writer emits ftyp + mdat + moov = 3). */
  def topLevelBoxes(b: Array[Byte]): Int = {
    var off = 0L
    var n = 0
    while (off + 8 <= b.length) {
      val size = u32(b, off.toInt)
      if (size < 8) return n
      off += size
      n += 1
    }
    n
  }

  /** Parse the container structure — everything frame sampling needs,
    * all MEASURED from the box tree, nothing taken from caller metadata. */
  def parse(b: Array[Byte]): Mp4Info = {
    def req(path: Seq[String]): (Int, Int) = find(b, path).getOrElse(
      throw new IllegalArgumentException(s"missing box ${path.mkString("/")}"))
    val (mvhd, _) = req(Seq("moov", "mvhd"))
    val timescale = u32(b, mvhd + 12)
    val duration = u32(b, mvhd + 16)
    val (tkhd, _) = req(Seq("moov", "trak", "tkhd"))
    val width = (u32(b, tkhd + 76) >> 16).toInt
    val height = (u32(b, tkhd + 80) >> 16).toInt
    val stblPath = Seq("moov", "trak", "mdia", "minf", "stbl")
    val (stsz, _) = req(stblPath :+ "stsz")
    val n = u32(b, stsz + 8).toInt
    val fixed = u32(b, stsz + 4)
    val sizes = if (fixed != 0) Seq.fill(n)(fixed.toInt)
      else (0 until n).map(i => u32(b, stsz + 12 + 4 * i).toInt)
    val (stco, _) = req(stblPath :+ "stco")
    val off0 = u32(b, stco + 8)
    Mp4Info(duration * 1000L / timescale, width, height, sizes, off0)
  }
}
