package graft.operators

import java.util.zip.{CRC32, Deflater}

/** Minimal deterministic PNG ENCODER (ISO/IEC 15948: signature + IHDR +
  * one IDAT + IEND; 8-bit RGB, color type 2; every scanline Sub-filtered).
  *
  * Exists because `ImageIO.write(img, "png", …)`'s filter selection
  * leaves the synthetic gradient media nearly uncompressed (~14 KB for a
  * 152×96 frame), which multiplied across motion-PNG video frames
  * bloated the staged media store enough to tax every multimodal
  * query's payload scan. The generator's gradients are affine in x for
  * every channel, so the Sub filter (delta vs the pixel to the left)
  * turns each scanline into a near-constant byte run and max-level
  * deflate emits a few hundred bytes per frame.
  *
  * Encoding only — decoding stays `javax.imageio` (the multimodal specs
  * pin decoded pixels == generator formula, so format validity is
  * continuously proven). Deterministic: fixed filter choice, fixed
  * `Deflater(BEST_COMPRESSION)` with the default strategy, no ancillary
  * chunks, no timestamps.
  */
object PngCodec {

  private val Signature =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  private def be32(v: Int): Array[Byte] = Array(
    ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
    ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  private def chunk(typ: String, payload: Array[Byte]): Array[Byte] = {
    val t = typ.getBytes("US-ASCII")
    val crc = new CRC32()
    crc.update(t)
    crc.update(payload)
    be32(payload.length) ++ t ++ payload ++ be32(crc.getValue.toInt)
  }

  /** Encode an RGB image as a complete PNG byte stream. */
  def encode(img: java.awt.image.BufferedImage): Array[Byte] = {
    val (w, h) = (img.getWidth, img.getHeight)
    // scanlines: [filter=1 (Sub)] + per-pixel RGB deltas vs left pixel
    val raw = new Array[Byte](h * (1 + 3 * w))
    var o = 0
    var y = 0
    while (y < h) {
      raw(o) = 1 // Sub
      o += 1
      var pr = 0; var pg = 0; var pb = 0
      var x = 0
      while (x < w) {
        val p = img.getRGB(x, y)
        val r = (p >> 16) & 0xff; val g = (p >> 8) & 0xff; val b = p & 0xff
        raw(o) = ((r - pr) & 0xff).toByte
        raw(o + 1) = ((g - pg) & 0xff).toByte
        raw(o + 2) = ((b - pb) & 0xff).toByte
        pr = r; pg = g; pb = b
        o += 3
        x += 1
      }
      y += 1
    }
    val d = new Deflater(Deflater.BEST_COMPRESSION)
    d.setInput(raw)
    d.finish()
    val out = new java.io.ByteArrayOutputStream(raw.length / 8 + 64)
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    val ihdr = be32(w) ++ be32(h) ++
      Array[Byte](8 /*bit depth*/ , 2 /*RGB*/ , 0, 0, 0)
    Signature ++ chunk("IHDR", ihdr) ++ chunk("IDAT", out.toByteArray) ++
      chunk("IEND", Array.empty[Byte])
  }
}
