package graft.multimodal

/** Pure-JVM baseline-sequential JPEG codec (ITU-T T.81) — the decoder the
  * perceptual tier needs for the dominant crawl image format, with no image
  * library in this sandbox (the JDK's own reader routes through a native
  * plugin — not something a determinism spec can pin).
  *
  * Decoder: full baseline path — segment walk, 8-bit DQT, canonical DHT,
  * SOF0 with arbitrary 1/2 sampling factors, SOS, restart markers, byte
  * unstuffing, Huffman + EXTEND, dequantization, IDCT, level shift, clamp.
  * Output is the LUMA (Y) plane as grayscale — exactly the channel the
  * perceptual hashes consume (PNG RGB decode reduces to integer luma the
  * same way); chroma blocks are entropy-decoded to keep the bitstream in
  * sync and then dropped. Subsampled-luma layouts (rare) upscale by pixel
  * replication. Progressive (SOF2) and arithmetic coding return None —
  * undecodable payloads drop out of the tier, the PNG contract.
  *
  * Determinism: the IDCT is the textbook separable double-precision form
  * over a StrictMath cosine table with a fixed summation order, then one
  * round + clamp — bit-identical on every JVM (StrictMath is specified;
  * IEEE double ops are exact per operation). It does NOT bit-match libjpeg
  * on arbitrary images (different IDCT approximations are explicitly
  * allowed by T.81); what the oracle relies on is narrower and provable:
  * a block that is FLAT with an even level-shifted value has only a DC
  * coefficient, DC = 8·(v−128) quantizes exactly under q₀₀=16, and the
  * DC-only IDCT is v at every pixel in ANY conformant decoder — so the
  * registered mixed-corpus fixtures use per-8×8-flat even-valued images,
  * whose decoded pixels equal the generator definition exactly
  * (`MultimodalSpec` pins the roundtrip bitwise).
  *
  * Encoder: baseline grayscale with the Annex-K luminance tables — enough
  * to mint real container bytes for fixtures and tests.
  */
object JpegCodec {

  // ---- shared tables --------------------------------------------------------

  /** Annex K.1 luminance quantization table, natural (row-major) order. */
  private val QLum: Array[Int] = Array(
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99)

  /** Zigzag scan: zigzag index → natural index. */
  private val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63)

  /** Annex K.3 luminance DC Huffman spec: code-length counts + symbols. */
  private val DcLumBits = Array(0, 0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val DcLumVals = (0 to 11).toArray

  /** Annex K.3 luminance AC Huffman spec. */
  private val AcLumBits = Array(0, 0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
  private val AcLumVals = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
    0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3a, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3,
    0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
    0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9,
    0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
    0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2, 0xf3, 0xf4,
    0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa)

  /** cos((2x+1)·u·π/16) via StrictMath — specified, JVM-independent. */
  private val Cos: Array[Array[Double]] = Array.tabulate(8, 8) { (x, u) =>
    StrictMath.cos((2 * x + 1) * u * StrictMath.PI / 16.0)
  }
  private def cNorm(u: Int): Double = if (u == 0) 1.0 / StrictMath.sqrt(2.0) else 1.0

  // ---- encoder --------------------------------------------------------------

  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0
    private var nBits = 0
    def put(value: Int, length: Int): Unit = {
      var i = length - 1
      while (i >= 0) {
        acc = (acc << 1) | ((value >> i) & 1)
        nBits += 1
        if (nBits == 8) {
          out.write(acc)
          if (acc == 0xFF) out.write(0x00) // byte stuffing
          acc = 0; nBits = 0
        }
        i -= 1
      }
    }
    def flush(): Unit = if (nBits > 0) { // pad with 1s (T.81 F.1.2.3)
      acc = (acc << (8 - nBits)) | ((1 << (8 - nBits)) - 1)
      out.write(acc)
      if (acc == 0xFF) out.write(0x00)
      acc = 0; nBits = 0
    }
  }

  private def huffCodes(bits: Array[Int], vals: Array[Int]): Map[Int, (Int, Int)] = {
    // canonical code assignment (T.81 C.2): (value -> (code, length))
    var code = 0
    var k = 0
    val m = scala.collection.mutable.Map.empty[Int, (Int, Int)]
    for (len <- 1 to 16) {
      var i = 0
      while (i < bits(len)) { m(vals(k)) = (code, len); code += 1; k += 1; i += 1 }
      code <<= 1
    }
    m.toMap
  }

  private def category(v: Int): Int = {
    var a = math.abs(v); var s = 0
    while (a != 0) { a >>= 1; s += 1 }
    s
  }

  /** Encode 8-bit grayscale pixels (row-major) as baseline JPEG. */
  def encodeGray(pixels: Array[Int], w: Int, h: Int): Array[Byte] = {
    require(pixels.length == w * h, "pixel buffer must be w*h")
    require(pixels.forall(p => p >= 0 && p <= 255), "8-bit gray")
    val out = new java.io.ByteArrayOutputStream()
    def marker(m: Int): Unit = { out.write(0xFF); out.write(m) }
    def seg(m: Int, payload: Array[Int]): Unit = {
      marker(m); val len = payload.length + 2
      out.write((len >> 8) & 0xFF); out.write(len & 0xFF)
      payload.foreach(out.write)
    }
    marker(0xD8) // SOI
    seg(0xDB, 0 +: Zigzag.map(QLum(_))) // DQT table 0, zigzag order
    seg(0xC0, Array(8, (h >> 8) & 0xFF, h & 0xFF, (w >> 8) & 0xFF, w & 0xFF,
      1, 1, 0x11, 0)) // SOF0: 1 component, 1x1 sampling, qtable 0
    seg(0xC4, (0 +: DcLumBits.drop(1)) ++ DcLumVals) // DHT DC 0
    seg(0xC4, (0x10 +: AcLumBits.drop(1)) ++ AcLumVals) // DHT AC 0
    seg(0xDA, Array(1, 1, 0x00, 0, 63, 0)) // SOS
    val dcH = huffCodes(DcLumBits, DcLumVals)
    val acH = huffCodes(AcLumBits, AcLumVals)
    val bw = new BitWriter(out)
    val blocksX = (w + 7) / 8
    val blocksY = (h + 7) / 8
    var prevDc = 0
    for (by <- 0 until blocksY; bx <- 0 until blocksX) {
      // block extract with edge replication
      val blk = Array.tabulate(64) { p =>
        val x = math.min(bx * 8 + p % 8, w - 1)
        val y = math.min(by * 8 + p / 8, h - 1)
        pixels(y * w + x) - 128
      }
      // FDCT (separable would be faster; direct form keeps it obvious)
      val coef = new Array[Int](64)
      for (v <- 0 until 8; u <- 0 until 8) {
        var s = 0.0
        for (y <- 0 until 8; x <- 0 until 8)
          s += blk(y * 8 + x) * Cos(x)(u) * Cos(y)(v)
        val f = 0.25 * cNorm(u) * cNorm(v) * s
        coef(v * 8 + u) = Math.round(f / QLum(v * 8 + u)).toInt
      }
      // DC
      val diff = coef(0) - prevDc
      prevDc = coef(0)
      val s = category(diff)
      val (dcCode, dcLen) = dcH(s)
      bw.put(dcCode, dcLen)
      if (s > 0) bw.put(if (diff < 0) diff + (1 << s) - 1 else diff, s)
      // AC in zigzag
      var run = 0
      var lastNz = 0
      for (zi <- 1 until 64) if (coef(Zigzag(zi)) != 0) lastNz = zi
      for (zi <- 1 to lastNz) {
        val v = coef(Zigzag(zi))
        if (v == 0) run += 1
        else {
          while (run >= 16) { val (c, l) = acH(0xF0); bw.put(c, l); run -= 16 }
          val sz = category(v)
          val (c, l) = acH((run << 4) | sz)
          bw.put(c, l)
          bw.put(if (v < 0) v + (1 << sz) - 1 else v, sz)
          run = 0
        }
      }
      if (lastNz < 63) { val (c, l) = acH(0x00); bw.put(c, l) } // EOB
    }
    bw.flush()
    marker(0xD9) // EOI
    out.toByteArray
  }

  // ---- decoder --------------------------------------------------------------

  private final class Huff(bits: Array[Int], vals: Array[Int]) {
    // canonical decode tables: min/max code and value offset per length
    val minCode = new Array[Int](17)
    val maxCode = Array.fill(17)(-1)
    val valPtr = new Array[Int](17)
    locally {
      var code = 0; var k = 0
      for (len <- 1 to 16) {
        if (bits(len) > 0) {
          valPtr(len) = k
          minCode(len) = code
          code += bits(len); k += bits(len)
          maxCode(len) = code - 1
        }
        code <<= 1
      }
    }
    val values: Array[Int] = vals
  }

  private final class BitReader(d: Array[Byte], var pos: Int) {
    private var acc = 0
    private var nBits = 0
    var sawMarker = false
    /** Next bit; -1 on exhausted/marker-terminated stream. */
    def bit(): Int = {
      if (nBits == 0) {
        if (pos >= d.length) return -1
        var b = d(pos) & 0xFF
        pos += 1
        if (b == 0xFF) {
          if (pos >= d.length) { sawMarker = true; return -1 }
          val m = d(pos) & 0xFF
          if (m == 0x00) pos += 1 // stuffed FF
          else { sawMarker = true; pos -= 1; return -1 }
          b = 0xFF
        }
        acc = b; nBits = 8
      }
      nBits -= 1
      (acc >> nBits) & 1
    }
    def bits(n: Int): Int = {
      var v = 0; var i = 0
      while (i < n) { val b = bit(); if (b < 0) return -1 << 20; v = (v << 1) | b; i += 1 }
      v
    }
    def alignAndSkipRst(): Boolean = { // true if an RSTn was consumed
      nBits = 0
      if (pos + 1 < d.length && (d(pos) & 0xFF) == 0xFF) {
        val m = d(pos + 1) & 0xFF
        if (m >= 0xD0 && m <= 0xD7) { pos += 2; sawMarker = false; return true }
      }
      false
    }
    def decode(h: Huff): Int = {
      var code = 0
      var len = 0
      while (len < 16) {
        val b = bit(); if (b < 0) return -1
        code = (code << 1) | b
        len += 1
        if (h.maxCode(len) >= 0 && code <= h.maxCode(len))
          return h.values(h.valPtr(len) + code - h.minCode(len))
      }
      -1
    }
  }

  private def extend(v: Int, t: Int): Int =
    if (t == 0) 0 else if (v < (1 << (t - 1))) v - (1 << t) + 1 else v

  private case class Comp(id: Int, hSamp: Int, vSamp: Int, qId: Int,
      var dcId: Int = 0, var acId: Int = 0, var pred: Int = 0)

  /** Decode a baseline JPEG's LUMA plane as (width, height, gray pixels).
    * None for anything that isn't decodable baseline-sequential content
    * (wrong magic, progressive, arithmetic, truncation mid-header,
    * unsupported sampling). Entropy-stream truncation mid-scan yields the
    * blocks decoded so far (remaining pixels stay mid-gray) — the clamped
    * prefix contract the WAV/PNG decoders follow.
    */
  def decodeGray(d: Array[Byte]): Option[(Int, Int, Array[Int])] = {
    if (d.length < 4 || (d(0) & 0xFF) != 0xFF || (d(1) & 0xFF) != 0xD8) return None
    val quant = new Array[Array[Int]](4)
    val dcTabs = new Array[Huff](4)
    val acTabs = new Array[Huff](4)
    var comps: Array[Comp] = null
    var w = 0; var h = 0
    var restartInterval = 0
    var i = 2
    def u16(o: Int): Int = ((d(o) & 0xFF) << 8) | (d(o + 1) & 0xFF)
    while (i + 3 < d.length) {
      if ((d(i) & 0xFF) != 0xFF) return None
      val m = d(i + 1) & 0xFF
      if (m == 0x01 || (m >= 0xD0 && m <= 0xD9)) { i += 2 }
      else {
        val segLen = u16(i + 2)
        if (i + 2 + segLen > d.length) return None
        val o = i + 4
        m match {
          case 0xDB => // DQT: possibly several tables per segment
            var p = o
            while (p < i + 2 + segLen) {
              val pq = (d(p) & 0xF0) >> 4
              val tq = d(p) & 0x0F
              if (pq != 0) return None // 8-bit tables only in baseline
              if (p + 1 + 64 > i + 2 + segLen) return None
              val t = new Array[Int](64)
              for (zi <- 0 until 64) t(Zigzag(zi)) = d(p + 1 + zi) & 0xFF
              quant(tq) = t
              p += 65
            }
          case 0xC4 => // DHT: possibly several tables
            var p = o
            while (p < i + 2 + segLen) {
              val tc = (d(p) & 0xF0) >> 4
              val th = d(p) & 0x0F
              val bits = new Array[Int](17)
              var total = 0
              for (l <- 1 to 16) { bits(l) = d(p + l) & 0xFF; total += bits(l) }
              if (p + 17 + total > i + 2 + segLen) return None
              val vals = Array.tabulate(total)(k => d(p + 17 + k) & 0xFF)
              val tab = new Huff(bits, vals)
              if (tc == 0) dcTabs(th) = tab else acTabs(th) = tab
              p += 17 + total
            }
          case 0xC0 | 0xC1 => // SOF0/1: baseline(-ish) sequential
            if ((d(o) & 0xFF) != 8) return None
            h = u16(o + 1); w = u16(o + 3)
            val n = d(o + 5) & 0xFF
            if (w <= 0 || h <= 0 || n < 1 || n > 4) return None
            comps = Array.tabulate(n) { c =>
              val b = o + 6 + c * 3
              Comp(d(b) & 0xFF, (d(b + 1) & 0xF0) >> 4, d(b + 1) & 0x0F, d(b + 2) & 0xFF)
            }
            if (comps.exists(c => c.hSamp < 1 || c.hSamp > 2 || c.vSamp < 1 || c.vSamp > 2))
              return None
          case 0xC2 => return None // progressive — out of baseline scope
          case x if x >= 0xC3 && x <= 0xCF && x != 0xC4 && x != 0xC8 && x != 0xCC =>
            return None // other frame types (arithmetic, lossless…)
          case 0xDD => restartInterval = u16(o)
          case 0xDA => // SOS → entropy scan
            if (comps == null) return None
            val ns = d(o) & 0xFF
            if (ns != comps.length) return None
            for (c <- 0 until ns) {
              val cid = d(o + 1 + c * 2) & 0xFF
              val tt = d(o + 2 + c * 2) & 0xFF
              comps.find(_.id == cid) match {
                case Some(comp) => comp.dcId = (tt & 0xF0) >> 4; comp.acId = tt & 0x0F
                case None => return None
              }
            }
            return decodeScan(d, i + 2 + segLen, comps, quant, dcTabs, acTabs,
              w, h, restartInterval)
          case _ => () // APPn/COM/etc: skip
        }
        i += 2 + segLen
      }
    }
    None
  }

  private def decodeScan(d: Array[Byte], scanStart: Int, comps: Array[Comp],
      quant: Array[Array[Int]], dcTabs: Array[Huff], acTabs: Array[Huff],
      w: Int, h: Int, restartInterval: Int): Option[(Int, Int, Array[Int])] = {
    val hMax = comps.map(_.hSamp).max
    val vMax = comps.map(_.vSamp).max
    val luma = comps(0) // first component is Y in JFIF/EXIF layouts
    if (quant(luma.qId) == null) return None
    if (comps.exists(c => dcTabs(c.dcId) == null || acTabs(c.acId) == null)) return None
    val mcusX = (w + 8 * hMax - 1) / (8 * hMax)
    val mcusY = (h + 8 * vMax - 1) / (8 * vMax)
    // Y plane at the luma component's own resolution, mid-gray initialized
    // (truncated streams leave the tail at 128 rather than black).
    val yW = mcusX * luma.hSamp * 8
    val yH = mcusY * luma.vSamp * 8
    val yPlane = Array.fill(yW * yH)(128)
    val br = new BitReader(d, scanStart)
    val coef = new Array[Int](64)
    var mcu = 0
    val totalMcus = mcusX * mcusY
    var truncated = false
    while (mcu < totalMcus && !truncated) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        br.alignAndSkipRst()
        comps.foreach(_.pred = 0)
      }
      val mx = mcu % mcusX
      val my = mcu / mcusX
      var ci = 0
      while (ci < comps.length && !truncated) {
        val c = comps(ci)
        val q = quant(c.qId)
        if (q == null) return None
        var by = 0
        while (by < c.vSamp && !truncated) {
          var bx = 0
          while (bx < c.hSamp && !truncated) {
            java.util.Arrays.fill(coef, 0)
            val t = br.decode(dcTabs(c.dcId))
            if (t < 0) truncated = true
            else {
              val diffBits = if (t == 0) 0 else br.bits(t)
              if (diffBits <= -(1 << 19)) truncated = true
              else {
                c.pred += extend(diffBits, t)
                coef(0) = c.pred * q(0)
                var zi = 1
                var eob = false
                while (zi < 64 && !eob && !truncated) {
                  val rs = br.decode(acTabs(c.acId))
                  if (rs < 0) truncated = true
                  else if (rs == 0x00) eob = true
                  else if (rs == 0xF0) zi += 16
                  else {
                    zi += (rs >> 4)
                    val sz = rs & 0x0F
                    if (zi > 63) truncated = true
                    else {
                      val vb = br.bits(sz)
                      if (vb <= -(1 << 19)) truncated = true
                      else { coef(Zigzag(zi)) = extend(vb, sz) * q(Zigzag(zi)); zi += 1 }
                    }
                  }
                }
                if (!truncated && (c eq luma)) {
                  // IDCT into the Y plane (chroma blocks decode + drop)
                  val px0 = (mx * luma.hSamp + bx) * 8
                  val py0 = (my * luma.vSamp + by) * 8
                  var y = 0
                  while (y < 8) {
                    var x = 0
                    while (x < 8) {
                      var s = 0.0
                      var v = 0
                      while (v < 8) {
                        var u = 0
                        while (u < 8) {
                          val cc = coef(v * 8 + u)
                          if (cc != 0) s += cNorm(u) * cNorm(v) * cc * Cos(x)(u) * Cos(y)(v)
                          u += 1
                        }
                        v += 1
                      }
                      val pix = Math.round(s / 4.0).toInt + 128
                      yPlane((py0 + y) * yW + px0 + x) =
                        if (pix < 0) 0 else if (pix > 255) 255 else pix
                      x += 1
                    }
                    y += 1
                  }
                }
              }
            }
            bx += 1
          }
          by += 1
        }
        ci += 1
      }
      mcu += 1
    }
    // crop/replicate the luma plane to image dimensions
    val sx = hMax / luma.hSamp // replication factor (1 for full-res luma)
    val sy = vMax / luma.vSamp
    val out = Array.tabulate(w * h) { p =>
      val x = (p % w) / sx
      val y = (p / w) / sy
      yPlane(math.min(y, yH - 1) * yW + math.min(x, yW - 1))
    }
    Some((w, h, out))
  }
}
