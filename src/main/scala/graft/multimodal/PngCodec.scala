package graft.multimodal

import java.util.zip.{CRC32, Deflater, Inflater}

/** Minimal pure-JVM PNG codec — enough of the public PNG spec (RFC 2083 /
  * ISO 15948) to make pixel-level image operators REAL in a container with
  * no image libraries:
  *
  *  - decode: non-interlaced 8-bit-depth PNGs, color types 0 (gray),
  *    2 (RGB) and 6 (RGBA), all five scanline filters (None/Sub/Up/
  *    Average/Paeth) reconstructed per spec §6; IDAT chunks concatenated
  *    and inflated with `java.util.zip.Inflater`. Anything else (16-bit,
  *    palette, interlaced, truncated, or non-PNG bytes) returns None —
  *    adversarial payloads must never throw out of an executor task.
  *  - encode: same subset, one filter type for the whole image (0 or 1 is
  *    all the fixtures need; decode handles every filter), configurable
  *    deflate level — which is exactly how "the same pixels, re-encoded"
  *    duplicates arise in a real crawl.
  *
  * Grayscale conversion is integer-exact ((299r + 587g + 114b) / 1000,
  * floor) so perceptual hashes computed from decoded pixels are
  * reproducible by ANY engine from the same pixel definition — the
  * mm_phash_dedup oracle contract.
  */
object PngCodec {

  private val Signature = Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)

  private def u32(d: Array[Byte], o: Int): Int =
    ((d(o) & 0xFF) << 24) | ((d(o + 1) & 0xFF) << 16) | ((d(o + 2) & 0xFF) << 8) | (d(o + 3) & 0xFF)

  // ---- encode --------------------------------------------------------------

  private def chunk(tag: String, data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def w32(v: Long): Unit = {
      out.write(((v >> 24) & 0xFF).toInt); out.write(((v >> 16) & 0xFF).toInt)
      out.write(((v >> 8) & 0xFF).toInt); out.write((v & 0xFF).toInt)
    }
    w32(data.length.toLong)
    val tagBytes = tag.getBytes("US-ASCII")
    out.write(tagBytes); out.write(data)
    val crc = new CRC32()
    crc.update(tagBytes); crc.update(data)
    w32(crc.getValue)
    out.toByteArray
  }

  /** Encode an 8-bit grayscale image. `filterType` 0 (None) or 1 (Sub)
    * applies to every scanline; `level` is the Deflater level — varying
    * either produces byte-different files with identical pixels.
    */
  def encodeGray(pixels: Array[Int], w: Int, h: Int,
      filterType: Int = 0, level: Int = Deflater.DEFAULT_COMPRESSION): Array[Byte] = {
    require(pixels.length == w * h, "pixel count must be w*h")
    require(filterType == 0 || filterType == 1, "encoder supports filters 0/1")
    val raw = new Array[Byte]((w + 1) * h)
    for (y <- 0 until h) {
      raw(y * (w + 1)) = filterType.toByte
      for (x <- 0 until w) {
        val v = pixels(y * w + x) & 0xFF
        val filtered =
          if (filterType == 1 && x > 0) (v - (pixels(y * w + x - 1) & 0xFF)) & 0xFF
          else v
        raw(y * (w + 1) + 1 + x) = filtered.toByte
      }
    }
    val deflater = new Deflater(level)
    deflater.setInput(raw); deflater.finish()
    val buf = new Array[Byte](raw.length + 64)
    val compressed = new java.io.ByteArrayOutputStream()
    while (!deflater.finished()) {
      val n = deflater.deflate(buf)
      compressed.write(buf, 0, n)
    }
    deflater.end()
    val ihdr = new Array[Byte](13)
    def put32(o: Int, v: Int): Unit = {
      ihdr(o) = ((v >> 24) & 0xFF).toByte; ihdr(o + 1) = ((v >> 16) & 0xFF).toByte
      ihdr(o + 2) = ((v >> 8) & 0xFF).toByte; ihdr(o + 3) = (v & 0xFF).toByte
    }
    put32(0, w); put32(4, h)
    ihdr(8) = 8 // bit depth
    ihdr(9) = 0 // color type: grayscale
    ihdr(10) = 0; ihdr(11) = 0; ihdr(12) = 0 // deflate, adaptive filters, no interlace
    val out = new java.io.ByteArrayOutputStream()
    out.write(Signature)
    out.write(chunk("IHDR", ihdr))
    out.write(chunk("IDAT", compressed.toByteArray))
    out.write(chunk("IEND", Array.empty[Byte]))
    out.toByteArray
  }

  // ---- decode --------------------------------------------------------------

  /** Decode to 8-bit grayscale pixels (row-major). None on anything outside
    * the supported subset or on malformed/truncated bytes — never throws.
    */
  def decodeGray(data: Array[Byte]): Option[(Int, Int, Array[Int])] =
    try decodeGrayUnsafe(data) catch { case scala.util.control.NonFatal(_) => None }

  private def decodeGrayUnsafe(data: Array[Byte]): Option[(Int, Int, Array[Int])] = {
    if (data.length < 8 || !data.take(8).sameElements(Signature)) return None
    var i = 8
    var w = 0; var h = 0; var colorType = -1
    var ok = false
    val idat = new java.io.ByteArrayOutputStream()
    var done = false
    while (!done && i + 8 <= data.length) {
      val len = u32(data, i)
      if (len < 0 || i + 12 + len > data.length) return None
      val tag = new String(data, i + 4, 4, "US-ASCII")
      tag match {
        case "IHDR" =>
          if (len != 13) return None
          w = u32(data, i + 8); h = u32(data, i + 12)
          val depth = data(i + 16) & 0xFF
          colorType = data(i + 17) & 0xFF
          val interlace = data(i + 20) & 0xFF
          ok = depth == 8 && interlace == 0 &&
            (colorType == 0 || colorType == 2 || colorType == 6) &&
            w > 0 && h > 0 && w.toLong * h <= 64L * 1024 * 1024
          if (!ok) return None
        case "IDAT" => idat.write(data, i + 8, len)
        case "IEND" => done = true
        case _ => // ancillary chunk — skip
      }
      i += 12 + len
    }
    if (!ok || idat.size() == 0) return None
    val bpp = colorType match { case 0 => 1; case 2 => 3; case 6 => 4 }
    val stride = w * bpp
    val raw = new Array[Byte]((stride + 1) * h)
    val inflater = new Inflater()
    inflater.setInput(idat.toByteArray)
    var off = 0
    while (!inflater.finished() && off < raw.length) {
      val n = inflater.inflate(raw, off, raw.length - off)
      if (n == 0 && inflater.needsInput()) return None // truncated stream
      off += n
    }
    inflater.end()
    if (off != raw.length) return None
    // undo scanline filters (PNG spec §6.1): a = left, b = up, c = up-left
    val img = new Array[Int](stride * h) // reconstructed bytes, 0..255
    for (y <- 0 until h) {
      val ft = raw(y * (stride + 1)) & 0xFF
      for (x <- 0 until stride) {
        val v = raw(y * (stride + 1) + 1 + x) & 0xFF
        val a = if (x >= bpp) img(y * stride + x - bpp) else 0
        val b = if (y > 0) img((y - 1) * stride + x) else 0
        val c = if (x >= bpp && y > 0) img((y - 1) * stride + x - bpp) else 0
        val recon = ft match {
          case 0 => v
          case 1 => v + a
          case 2 => v + b
          case 3 => v + (a + b) / 2
          case 4 => // Paeth predictor
            val p = a + b - c
            val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
            v + (if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c)
          case _ => return None
        }
        img(y * stride + x) = recon & 0xFF
      }
    }
    val gray = new Array[Int](w * h)
    colorType match {
      case 0 =>
        System.arraycopy(img, 0, gray, 0, w * h)
      case _ =>
        for (p <- 0 until w * h) {
          val o = p * bpp
          gray(p) = (299 * img(o) + 587 * img(o + 1) + 114 * img(o + 2)) / 1000
        }
    }
    Some((w, h, gray))
  }
}
