package graft.multimodal

/** Pure-JVM AVI (RIFF) uncompressed-DIB video codec — the video sibling of
  * [[WavCodec]] and [[PngCodec]]: real container bytes for the perceptual
  * VIDEO tier, with no codec library in this sandbox. The encoded subset is
  * a real public format (`ffmpeg -c:v rawvideo -pix_fmt bgr24 out.avi`
  * produces exactly this shape): `RIFF('AVI ')` with an `hdrl` header list
  * (`avih` + one `vids/DIB ` stream's `strh`/`strf`) and a `movi` list of
  * `00db` frame chunks holding BI_RGB device-independent bitmaps.
  *
  * Encode supports the container degrees of freedom a crawl re-encode
  * exercises WITHOUT touching the signal — 24-bit BGR vs 8-bit palettized
  * (identity gray palette), bottom-up vs top-down row order (the
  * BITMAPINFOHEADER height sign), and an optional JUNK chunk — so tests and
  * the registered fixture can plant byte-different containers of identical
  * pixels (the "re-encoded twin"). Decode walks the nested RIFF lists with
  * the same untrusted-size discipline as `WavCodec.decodePcm16`, normalizes
  * either variant back to row-major top-down grayscale via integer
  * `floorDiv(b+g+r, 3)` luma, and returns the decoded PREFIX of a truncated
  * stream (complete frame chunks decode; a torn trailing frame drops) —
  * every step integer, so the SQL oracle reproduces fingerprints from the
  * frame-pixel definition while Spark derives them from real bytes.
  */
object AviCodec {

  private def le16(v: Int): Array[Byte] =
    Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)
  private def le32(v: Int): Array[Byte] =
    Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
      ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)
  private def cc(s: String): Array[Byte] = s.getBytes("US-ASCII")

  /** RIFF chunk: tag + u32le size + data (+ pad byte to word-align). */
  private def chunk(tag: String, data: Array[Byte]): Array[Byte] = {
    val pad = if ((data.length & 1) == 1) Array[Byte](0) else Array.emptyByteArray
    Array.concat(cc(tag), le32(data.length), data, pad)
  }
  private def list(listType: String, body: Array[Byte]): Array[Byte] =
    Array.concat(cc("LIST"), le32(4 + body.length), cc(listType), body)

  private def rowStride(w: Int, bits: Int): Int = ((w * (bits / 8)) + 3) & ~3

  /** Encode grayscale frames (each `w*h` ints 0..255, row-major TOP-DOWN —
    * the [[PngCodec.encodeGray]] pixel convention) as an AVI of
    * uncompressed DIB `00db` chunks at 24 fps.
    *
    * @param bits 24 (BGR triplets, b=g=r=gray) or 8 (palette indices over
    *   the 256-entry identity gray palette) — same pixels, very different
    *   bytes.
    * @param topDown negative-height BITMAPINFOHEADER (rows stored
    *   first-row-first) vs the classic bottom-up layout.
    * @param extraChunk inserts a JUNK chunk before `movi` — semantically
    *   void, byte-visible: the re-encode twin.
    */
  def encodeGray(frames: Array[Array[Int]], w: Int, h: Int, bits: Int = 24,
      topDown: Boolean = false, extraChunk: Boolean = false): Array[Byte] = {
    require(bits == 24 || bits == 8, "BI_RGB DIB at 24-bit or palettized 8-bit")
    require(w > 0 && h > 0 && frames.forall(_.length == w * h),
      "every frame must carry w*h pixels")
    require(frames.forall(_.forall(v => v >= 0 && v <= 255)), "8-bit gray range")
    val stride = rowStride(w, bits)
    val frameBytes = stride * h

    val avih = chunk("avih", Array.concat(
      le32(41667), le32(0), le32(0), le32(0), // usec/frame (24fps), bps, pad, flags
      le32(frames.length), le32(0), le32(1), le32(frameBytes),
      le32(w), le32(h), le32(0), le32(0), le32(0), le32(0)))
    val strh = chunk("strh", Array.concat(
      cc("vids"), cc("DIB "), le32(0), le16(0), le16(0), le32(0),
      le32(1), le32(24), le32(0), le32(frames.length), // scale=1, rate=24fps
      le32(frameBytes), le32(0), le32(0),
      le16(0), le16(0), le16(w), le16(h)))
    val palette =
      if (bits == 8) Array.tabulate[Byte](256 * 4) { i =>
        if (i % 4 == 3) 0 else (i / 4).toByte // BGRA entries, b=g=r=index
      } else Array.emptyByteArray
    val strf = chunk("strf", Array.concat(
      le32(40), le32(w), le32(if (topDown) -h else h), le16(1), le16(bits),
      le32(0), le32(frameBytes), le32(0), le32(0), // BI_RGB
      le32(if (bits == 8) 256 else 0), le32(0), palette))
    val hdrl = list("hdrl", Array.concat(avih, list("strl", Array.concat(strh, strf))))

    val junk = if (extraChunk) chunk("JUNK", cc("graft-reencode-marker")) else Array.emptyByteArray
    val movi = list("movi", frames.flatMap { f =>
      val dib = new Array[Byte](frameBytes)
      var y = 0
      while (y < h) {
        val srcRow = if (topDown) y else h - 1 - y // DIB row y reads source row
        var x = 0
        while (x < w) {
          val v = f(srcRow * w + x).toByte
          if (bits == 24) {
            val o = y * stride + x * 3
            dib(o) = v; dib(o + 1) = v; dib(o + 2) = v
          } else dib(y * stride + x) = v
          x += 1
        }
        y += 1
      }
      chunk("00db", dib)
    })
    val body = Array.concat(cc("AVI "), hdrl, junk, movi)
    Array.concat(cc("RIFF"), le32(body.length), body)
  }

  private def tag(d: Array[Byte], o: Long, s: String): Boolean =
    o >= 0 && o + 4 <= d.length &&
      (0 until 4).forall(i => d(o.toInt + i) == s.charAt(i).toByte)
  private def u16le(d: Array[Byte], o: Int): Int =
    (d(o) & 0xFF) | ((d(o + 1) & 0xFF) << 8)
  private def u32le(d: Array[Byte], o: Int): Long =
    (d(o) & 0xFFL) | ((d(o + 1) & 0xFFL) << 8) |
      ((d(o + 2) & 0xFFL) << 16) | ((d(o + 3) & 0xFFL) << 24)
  private def s32le(d: Array[Byte], o: Int): Int = u32le(d, o).toInt

  /** Walk the chunks of a RIFF list body `[from, until)`, calling `f` with
    * (chunkTag offset, payload offset, payload size clamped to the bytes
    * actually present). Sizes are UNTRUSTED u32s: widened to Long, clamped,
    * and the cursor always advances (the WavCodec discipline).
    */
  private def walk(d: Array[Byte], from: Long, until: Long)(
      f: (Int, Int, Int) => Boolean): Unit = {
    var i = from
    var go = true
    while (go && i + 8 <= until) {
      val o = i.toInt
      val size = u32le(d, o + 4)
      val avail = math.min(size, (until - i - 8).max(0L)).toInt
      go = f(o, o + 8, avail)
      i += 8 + size + (size & 1L)
    }
  }

  private def findList(d: Array[Byte], from: Long, until: Long,
      listType: String): Option[(Int, Int)] = {
    var found: Option[(Int, Int)] = None
    walk(d, from, until) { (o, payload, avail) =>
      if (tag(d, o, "LIST") && tag(d, payload, listType) && avail >= 4)
        found = Some((payload + 4, payload + avail))
      found.isEmpty
    }
    found
  }

  /** Header-only metadata: (width, height, totalFrames) from the `avih`
    * chunk — the cheap audit path ([[Multimodal.HeaderDecoder]]'s video
    * modality), no pixel decode.
    */
  def aviMeta(d: Array[Byte]): Option[(Int, Int, Int)] = {
    if (d.length < 24 || !tag(d, 0, "RIFF") || !tag(d, 8, "AVI ")) return None
    findList(d, 12L, d.length.toLong, "hdrl").flatMap { case (from, until) =>
      var meta: Option[(Int, Int, Int)] = None
      walk(d, from.toLong, until.toLong) { (o, payload, avail) =>
        if (tag(d, o, "avih") && avail >= 40)
          meta = Some((s32le(d, payload + 32), s32le(d, payload + 36),
            s32le(d, payload + 16)))
        meta.isEmpty
      }
      meta
    }
  }

  private case class Fmt(w: Int, h: Int, topDown: Boolean, bits: Int,
      palette: Array[Int]) // palette(i) = integer gray of entry i

  private def parseStrf(d: Array[Byte], payload: Int, avail: Int): Option[Fmt] = {
    if (avail < 40) return None
    val w = s32le(d, payload + 4)
    val rawH = s32le(d, payload + 8)
    val bits = u16le(d, payload + 14)
    val compression = u32le(d, payload + 16)
    val h = math.abs(rawH)
    // reject absurd dimensions before allocating frame buffers: the size
    // fields are untrusted container bytes running inside an executor task
    if (compression != 0L || (bits != 24 && bits != 8) ||
        w <= 0 || h <= 0 || rawH == Int.MinValue ||
        w.toLong * h > (1 << 22)) return None
    val palette =
      if (bits == 8) {
        val declared = s32le(d, payload + 32)
        val n = if (declared > 0 && declared <= 256) declared else 256
        if (avail < 40 + n * 4) return None
        Array.tabulate(n) { i =>
          val o = payload + 40 + i * 4
          val b = d(o) & 0xFF; val g = d(o + 1) & 0xFF; val r = d(o + 2) & 0xFF
          Math.floorDiv(b + g + r, 3)
        }
      } else Array.emptyIntArray
    Some(Fmt(w, h, rawH < 0, bits, palette))
  }

  /** Decode an uncompressed-DIB AVI to (width, height, frames of row-major
    * TOP-DOWN grayscale). Either encode variant (8/24-bit, either row
    * order, extra chunks) of the same pixels decodes to the identical
    * arrays — which is what lets the perceptual tier see through container
    * re-encodes. None for anything that isn't a BI_RGB 8/24-bit AVI; a
    * truncated stream yields its complete-frame prefix (torn trailing
    * frames drop — the PngCodec truncation contract). Luma is integer
    * `floorDiv(b+g+r, 3)`, exact on gray content.
    */
  def decodeGray(d: Array[Byte]): Option[(Int, Int, Array[Array[Int]])] = {
    if (d.length < 24 || !tag(d, 0, "RIFF") || !tag(d, 8, "AVI ")) return None
    // walk EVERY strl list in hdrl and take the first video stream — a
    // muxed file may list its audio stream first
    val fmt = findList(d, 12L, d.length.toLong, "hdrl").flatMap {
      case (hFrom, hUntil) =>
        var parsed: Option[Fmt] = None
        walk(d, hFrom.toLong, hUntil.toLong) { (o, payload, avail) =>
          if (tag(d, o, "LIST") && tag(d, payload, "strl") && avail >= 4) {
            var vids = false
            walk(d, payload.toLong + 4, payload.toLong + avail) { (so, sp, sAvail) =>
              if (tag(d, so, "strh") && sAvail >= 4) vids = tag(d, sp, "vids")
              else if (tag(d, so, "strf") && vids) parsed = parseStrf(d, sp, sAvail)
              parsed.isEmpty
            }
          }
          parsed.isEmpty
        }
        parsed
    }
    fmt.flatMap { f =>
      findList(d, 12L, d.length.toLong, "movi").map { case (mFrom, mUntil) =>
        val stride = rowStride(f.w, f.bits)
        val need = stride * f.h
        val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Int]]
        walk(d, mFrom.toLong, mUntil.toLong) { (o, payload, avail) =>
          // '##db' (uncompressed DIB) / '##dc' (BI_RGB "compressed" = same)
          val isFrame = d(o) >= '0'.toByte && d(o) <= '9'.toByte &&
            d(o + 1) >= '0'.toByte && d(o + 1) <= '9'.toByte &&
            d(o + 2) == 'd'.toByte &&
            (d(o + 3) == 'b'.toByte || d(o + 3) == 'c'.toByte)
          if (isFrame) {
            if (avail < need) false // torn trailing frame: stop, keep the prefix
            else {
              val px = new Array[Int](f.w * f.h)
              var y = 0
              while (y < f.h) {
                val dibRow = if (f.topDown) y else f.h - 1 - y
                var x = 0
                while (x < f.w) {
                  val v =
                    if (f.bits == 24) {
                      val p = payload + dibRow * stride + x * 3
                      Math.floorDiv((d(p) & 0xFF) + (d(p + 1) & 0xFF) + (d(p + 2) & 0xFF), 3)
                    } else {
                      val idx = d(payload + dibRow * stride + x) & 0xFF
                      if (idx < f.palette.length) f.palette(idx) else 0
                    }
                  px(y * f.w + x) = v
                  x += 1
                }
                y += 1
              }
              frames += px
              true
            }
          } else true
        }
        (f.w, f.h, frames.toArray)
      }
    }
  }
}
