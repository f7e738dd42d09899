package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata (builder-prompt scale extension).
  *
  * The Spark-side structure is real — binary columns, case-class batch
  * shapes, `mapPartitions` with a per-partition decoder instance (the Scala
  * analog of `mapInPandas`: one decoder init per partition, streamed
  * batches, no per-row setup cost). Decode is REAL where the container
  * format allows pure-JVM parsing: PNG IHDR / JPEG SOF frame headers for
  * images, WAV RIFF chunks (sample rate, channels, PCM frame count) for
  * audio; compressed audio/video and unrecognized payloads fall back to
  * the deterministic `StubDecoder` pseudo-metadata (this container has no
  * av codec libraries). Swapping in a full codec is one trait
  * implementation; nothing in the plan changes.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, media_type: String, data: Array[Byte])
  case class MediaMeta(doc_id: Long, media_type: String, n_bytes: Long,
      width: Int, height: Int, frames: Int)

  /** Pluggable decode boundary — a real implementation would wrap e.g.
    * javacv/ffmpeg; init cost is paid once per partition in extractMeta.
    */
  trait MediaDecoder extends Serializable {
    def decode(mediaType: String, data: Array[Byte]): MediaMeta
  }

  /** Deterministic stand-in for the absent codec libraries: metadata is a
    * pure function of payload size/id so tests and the SQL oracle can pin
    * exact outputs.
    */
  class StubDecoder extends MediaDecoder {
    override def decode(mediaType: String, data: Array[Byte]): MediaMeta = {
      val n = data.length.toLong
      MediaMeta(-1L, mediaType, n,
        width = (320 + n % 1280).toInt,
        height = (240 + n % 720).toInt,
        frames = if (mediaType == "image") 1 else (24 + n % 240).toInt)
    }
  }

  /** Real pure-JVM header decode for the image modality: PNG IHDR and JPEG
    * SOF frame headers parsed directly from the bytes — no codec library
    * needed for dimensions, which is all the metadata stage extracts.
    * Payloads that aren't recognizably PNG/JPEG (and all audio/video, which
    * WOULD need a codec) fall back to the deterministic stub, so the
    * decoder is a strict upgrade: real where the format allows, pinned
    * pseudo-metadata elsewhere, and the SQL oracle stays exact on the
    * derived (text-bytes) corpus.
    */
  class HeaderDecoder extends MediaDecoder {
    private val stub = new StubDecoder

    override def decode(mediaType: String, data: Array[Byte]): MediaMeta =
      if (mediaType == "image") {
        pngDims(data).orElse(jpegDims(data)) match {
          case Some((w, h)) => MediaMeta(-1L, mediaType, data.length.toLong, w, h, frames = 1)
          case None => stub.decode(mediaType, data)
        }
      } else if (mediaType == "audio") {
        wavMeta(data) match {
          // Audio packs into the fixed meta shape as: width = sample rate,
          // height = channel count, frames = PCM sample-frame count — the
          // three numbers the pipeline's duration/resample stages need.
          case Some((rate, channels, sampleFrames)) =>
            MediaMeta(-1L, mediaType, data.length.toLong, rate, channels, sampleFrames)
          case None => stub.decode(mediaType, data)
        }
      } else if (mediaType == "video") {
        AviCodec.aviMeta(data) match {
          // header-only: the avih chunk carries (width, height, frames)
          // without touching a single pixel
          case Some((w, h, frames)) =>
            MediaMeta(-1L, mediaType, data.length.toLong, w, h, frames)
          case None => stub.decode(mediaType, data)
        }
      } else stub.decode(mediaType, data)

    private def u16(d: Array[Byte], o: Int): Int = ((d(o) & 0xFF) << 8) | (d(o + 1) & 0xFF)
    private def u32(d: Array[Byte], o: Int): Int =
      ((d(o) & 0xFF) << 24) | ((d(o + 1) & 0xFF) << 16) | ((d(o + 2) & 0xFF) << 8) | (d(o + 3) & 0xFF)

    /** PNG: 8-byte signature, then the IHDR chunk — width at offset 16,
      * height at offset 20, both big-endian u32.
      */
    private def pngDims(d: Array[Byte]): Option[(Int, Int)] = {
      val sig = Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)
      if (d.length >= 24 && d.take(8).sameElements(sig) &&
          d(12) == 'I' && d(13) == 'H' && d(14) == 'D' && d(15) == 'R')
        Some((u32(d, 16), u32(d, 20)))
      else None
    }

    private def u16le(d: Array[Byte], o: Int): Int = (d(o) & 0xFF) | ((d(o + 1) & 0xFF) << 8)
    private def u32le(d: Array[Byte], o: Int): Int =
      (d(o) & 0xFF) | ((d(o + 1) & 0xFF) << 8) | ((d(o + 2) & 0xFF) << 16) | ((d(o + 3) & 0xFF) << 24)

    /** WAV (RIFF): "RIFF"…"WAVE", then a chunk walk — the `fmt ` chunk
      * carries channels (u16 LE @+2), sample rate (u32 LE @+4), block align
      * (u16 LE @+12); the `data` chunk's size / blockAlign is the PCM
      * sample-frame count. Little-endian throughout, unlike PNG/JPEG.
      */
    private def wavMeta(d: Array[Byte]): Option[(Int, Int, Int)] = {
      def tag(o: Int, s: String): Boolean =
        o + 4 <= d.length && (0 until 4).forall(i => d(o + i) == s.charAt(i).toByte)
      if (d.length < 44 || !tag(0, "RIFF") || !tag(8, "WAVE")) return None
      // The chunk-size field is an UNTRUSTED u32: read signed it can go
      // negative and stall (or reverse) the walk inside an executor task.
      // Widen to Long, and since sizes beyond the payload are equally
      // bogus, clamp the data chunk to the bytes actually present.
      var i = 12L
      var fmt: Option[(Int, Int, Int)] = None // (rate, channels, blockAlign)
      var dataSize: Option[Long] = None
      while (i + 8 <= d.length && (fmt.isEmpty || dataSize.isEmpty)) {
        val o = i.toInt
        val size = u32le(d, o + 4).toLong & 0xFFFFFFFFL
        if (tag(o, "fmt ") && i + 8 + 16 <= d.length)
          fmt = Some((u32le(d, o + 12), u16le(d, o + 10), u16le(d, o + 20)))
        else if (tag(o, "data")) dataSize = Some(math.min(size, (d.length - i - 8).max(0L)))
        i += 8 + size + (size & 1L) // chunks are word-aligned; always advances (size >= 0)
      }
      for ((rate, ch, ba) <- fmt; ds <- dataSize if ba > 0)
        yield (rate, ch, (ds / ba).toInt)
    }

    /** JPEG: walk the marker segments from SOI to the first SOF frame header
      * (C0-CF except the non-frame C4/C8/CC): height then width, big-endian
      * u16, after the 2-byte length + 1-byte precision.
      */
    private def jpegDims(d: Array[Byte]): Option[(Int, Int)] = {
      if (d.length < 4 || (d(0) & 0xFF) != 0xFF || (d(1) & 0xFF) != 0xD8) return None
      var i = 2
      while (i + 3 < d.length) {
        if ((d(i) & 0xFF) != 0xFF) return None
        val marker = d(i + 1) & 0xFF
        val standalone = marker == 0x01 || (marker >= 0xD0 && marker <= 0xD9)
        if (standalone) i += 2
        else {
          val isSof = marker >= 0xC0 && marker <= 0xCF &&
            marker != 0xC4 && marker != 0xC8 && marker != 0xCC
          if (isSof) {
            if (i + 8 >= d.length) return None
            return Some((u16(d, i + 7), u16(d, i + 5))) // (width, height)
          }
          i += 2 + u16(d, i + 2)
        }
      }
      None
    }
  }

  /** Derive a media table from documents: payload = utf8 bytes, modality by
    * id. Stands in for a real (path, binary) ingest; the binary column and
    * its parquet representation are the real thing.
    */
  def deriveMedia(docs: DataFrame): Dataset[MediaRow] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id"),
        when(col("doc_id") % 3 === 0, "image")
          .when(col("doc_id") % 3 === 1, "audio").otherwise("video").as("media_type"),
        encode(col("text"), "UTF-8").as("data"))
      .as[MediaRow]
  }

  /** The batch decode stage: one decoder per partition, streamed rows —
    * distributed, no driver collect, binary never leaves the executor.
    */
  def extractMeta(media: Dataset[MediaRow],
      decoder: MediaDecoder = new HeaderDecoder): Dataset[MediaMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r => decoder.decode(r.media_type, r.data).copy(doc_id = r.doc_id) }
    }
  }

  case class FrameSample(doc_id: Long, media_type: String, frame_no: Long,
      frame_ts_ms: Long, byte_off: Long)

  /** Evenly-spaced frame sampling through the decoder boundary — the
    * training-pipeline "sample k frames per video" stage. One decoder per
    * partition; each media row fans out to min(k, frames) frame rows with
    * the frame's index, a 24fps-derived timestamp, and its byte offset
    * (all integer arithmetic so the SQL oracle pins exact outputs). A real
    * decoder would also attach the frame bytes; the row shape and the
    * distributed fan-out are the load-bearing parts.
    */
  def sampleFrames(media: Dataset[MediaRow], k: Int = 8,
      decoder: MediaDecoder = new StubDecoder): Dataset[FrameSample] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        val meta = decoder.decode(r.media_type, r.data)
        val frames = meta.frames.toLong
        val n = meta.n_bytes
        val nSamples = math.min(k.toLong, frames)
        (0L until nSamples).iterator.map { i =>
          val fno = i * frames / nSamples
          // Offset is proportional (multiply before divide): a per-frame
          // byte step of n/frames would truncate to 0 for payloads with
          // more frames than bytes.
          FrameSample(r.doc_id, r.media_type, fno, fno * 1000 / 24, fno * n / frames)
        }
      }
    }
  }

  /** Oracle-checkable frame-sample query over the derived media table. */
  def frameSamples(docs: DataFrame, k: Int = 8): DataFrame =
    sampleFrames(deriveMedia(docs), k).toDF()
      .orderBy(col("doc_id"), col("frame_no"))

  /** Oracle-checkable end-to-end: derive → decode → project, ordered. */
  def mediaMeta(docs: DataFrame): DataFrame =
    extractMeta(deriveMedia(docs)).toDF()
      .select(col("doc_id"), col("media_type"), col("n_bytes"),
        col("width").cast("long").as("width"), col("height").cast("long").as("height"),
        col("frames").cast("long").as("frames"))
      .orderBy(col("doc_id"))

  // ---- perceptual image near-dup ------------------------------------------

  /** Average hash over decoded grayscale pixels, as a 64-char '0'/'1'
    * string (engine-portable; a BIGINT would lose bit 63 to the sign).
    * Area-downsample to an 8×8 grid with integer floor boundaries
    * (cell (cx,cy) covers x ∈ [cx·w/8, (cx+1)·w/8), same for y), cell
    * value = floor(pixel sum / pixel count), then bit = cell > floor(mean
    * of the 64 cells). Every step is integer arithmetic, so any engine
    * computing from the same pixel definition produces the identical
    * string — the mm_phash_dedup oracle recomputes it in SQL.
    */
  def aHashBits(pixels: Array[Int], w: Int, h: Int): String = {
    val cells = new Array[Long](64)
    for (cy <- 0 until 8; cx <- 0 until 8) {
      val x0 = cx * w / 8; val x1 = (cx + 1) * w / 8
      val y0 = cy * h / 8; val y1 = (cy + 1) * h / 8
      var sum = 0L; var n = 0L
      for (y <- y0 until y1; x <- x0 until x1) { sum += pixels(y * w + x); n += 1 }
      cells(cy * 8 + cx) = if (n > 0) sum / n else 0L
    }
    val mean = cells.sum / 64
    cells.map(c => if (c > mean) '1' else '0').mkString
  }

  /** Difference hash (horizontal-gradient variant): 9×8 grid with the same
    * floor-boundary area downsample; bit (cy, cx) = cell(cx+1) > cell(cx).
    * More robust than aHash to global brightness shifts; spec-level (the
    * oracle binds aHash, which already pins the decode + downsample path).
    */
  def dHashBits(pixels: Array[Int], w: Int, h: Int): String = {
    val grid = Array.ofDim[Long](8, 9)
    for (cy <- 0 until 8; cx <- 0 until 9) {
      val x0 = cx * w / 9; val x1 = (cx + 1) * w / 9
      val y0 = cy * h / 8; val y1 = (cy + 1) * h / 8
      var sum = 0L; var n = 0L
      for (y <- y0 until y1; x <- x0 until x1) { sum += pixels(y * w + x); n += 1 }
      grid(cy)(cx) = if (n > 0) sum / n else 0L
    }
    (for (cy <- 0 until 8; cx <- 0 until 8)
      yield if (grid(cy)(cx + 1) > grid(cy)(cx)) '1' else '0').mkString
  }

  case class ImageHash(doc_id: Long, ahash: String, dhash: String)

  /** Perceptual hashes for every decodable image payload — the pixel-level
    * dedup tier `dedupStats`' byte-exact hashing misses: a crawl
    * re-delivers the same picture re-encoded (different PNG filter bytes,
    * different deflate level, stripped ancillary chunks), with distinct
    * content hashes but identical pixels. Decode + hash is map-only (one
    * decoder pass per partition, binary never leaves the executor);
    * undecodable payloads drop out (the header-metadata path still audits
    * them).
    */
  def imageHashes(media: Dataset[MediaRow]): Dataset[ImageHash] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        if (r.media_type == "image")
          PngCodec.decodeGray(r.data)
            .orElse(JpegCodec.decodeGray(r.data)) // mixed crawls: PNG or JPEG
            .map { case (w, h, px) =>
              ImageHash(r.doc_id, aHashBits(px, w, h), dHashBits(px, w, h))
            }
        else None
      }
    }
  }

  /** Perceptual duplicate groups: images whose aHash collides. Scale shape:
    * map-only decode/hash, then ONE shuffle keyed on the 64-bit hash with
    * 8-byte-class rows — the exact-dedup hash-groupBy shape, pixels never
    * shuffle. (A Hamming-radius pair tier would ride the SimHash
    * probe-key construction; exact-collision grouping is the re-encode
    * detector.)
    */
  def phashDupGroups(media: Dataset[MediaRow]): DataFrame =
    imageHashes(media).toDF()
      .groupBy(col("ahash"))
      .agg(count(lit(1)).as("n_copies"),
        min(col("doc_id")).as("min_doc_id"), max(col("doc_id")).as("max_doc_id"))
      .filter(col("n_copies") > 1)
      .orderBy(col("ahash"))

  /** One row per DISTINCT aHash with its sorted member ids — the
    * identical-hash collapse that makes the near-pair probe join safe on
    * real crawls: flat/black renders form enormous byte-identical-pixel
    * groups, and joining the raw per-image table pairs those quadratically
    * on a single shuffle key (65 probes per image compounding it). After
    * the collapse the probe join's input is one row per distinct hash;
    * identical-hash pairs are reconstructed from the group's own id list,
    * never through the join.
    */
  def phashHashGroups(media: Dataset[MediaRow]): DataFrame =
    imageHashes(media).toDF()
      .groupBy(col("ahash"))
      .agg(sort_array(collect_list(col("doc_id"))).as("ids"))

  /** Perceptual NEAR-duplicate pairs within Hamming radius ≤ 2 of the
    * aHash — catches re-encodes that also shifted a few pixels (resample
    * ringing, mild recompression), which exact-collision grouping misses.
    * The Manku et al. (WWW'07) probe construction from the text SimHash
    * tier, re-applied to image hashes: each side emits its hash plus all
    * 64 one-bit flips; any pair within Hamming 2 shares ≥1 probe (0 diffs:
    * self=self; 1: one side's flip lands on the other; 2: each flips one
    * of the two differing bits), so candidacy is PROVABLY total within the
    * radius and the exact Hamming verify only discards.
    *
    * Scale shape: the join runs over `phashHashGroups` — ONE row per
    * distinct hash — so identical-hash groups (a crawl's flat images)
    * cost one probe fan-out regardless of group size. Hamming-0 pairs
    * expand row-locally from each group's own sorted id list; cross-hash
    * pairs expand from the two matched groups' lists AFTER the Hamming
    * verify. The expansions are output-volume work (the pair list itself
    * is quadratic in group size — by definition of the query), but no
    * quadratic volume ever crosses the probe join's shuffle.
    */
  def phashNearPairs(media: Dataset[MediaRow], maxHamming: Int = 2): DataFrame =
    nearPairs64(imageHashes(media).toDF()
      .select(col("doc_id"), col("ahash").as("h")), maxHamming)

  /** The Manku probe construction over ANY (doc_id, 64-char bit string)
    * table — shared by the image ([[phashNearPairs]]) and audio
    * ([[audioNearPairs]]) perceptual tiers. Collapses to one row per
    * DISTINCT hash before the join (the identical-hash groups a real crawl
    * produces never pair quadratically across the shuffle); Hamming-0
    * pairs expand row-locally from each group's own sorted id list.
    */
  private[multimodal] def nearPairs64(hashed: DataFrame, maxHamming: Int): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 2,
      "the self+one-bit-flip probe family covers Hamming radius ≤ 2")
    // hash once; one tiny (h, ids) row per distinct hash feeds the
    // within-group expansion and both probe-join sides
    val groups = hashed
      .groupBy(col("h"))
      .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
      .localCheckpoint(true)

    // Hamming 0: pairs within one identical-hash group, expanded from the
    // sorted id list (i < j gives doc_id_a < doc_id_b for free).
    val within = groups
      .filter(size(col("ids")) > 1)
      .select(explode(expr(
        """flatten(transform(ids, (x, i) ->
          |  transform(slice(ids, i + 2, size(ids)), y -> struct(x AS a, y AS b))))""".stripMargin))
        .as("p"))
      .select(col("p.a").as("doc_id_a"), col("p.b").as("doc_id_b"),
        lit(0).as("hamming"))

    val flips = (0 until 64).map { i =>
      concat(substring(col("h"), 1, i),
        when(substring(col("h"), i + 1, 1) === "1", lit("0")).otherwise(lit("1")),
        substring(col("h"), i + 2, 63 - i))
    }
    // probes carry only the hash (not the id list): the 65× fan-out stays
    // 8-byte-class rows; ids re-join after the verify, one row per group
    val probed = groups.select(col("h"),
      explode(array((col("h") +: flips): _*)).as("probe"))
    val hashPairs = probed.as("a").join(probed.as("b"),
        col("a.probe") === col("b.probe") && col("a.h") < col("b.h"))
      .select(col("a.h").as("h_a"), col("b.h").as("h_b"))
      .distinct() // a close hash pair shares several probes
    // Hamming distance as codegen'd integer ops, not a per-character HOF
    // loop (higher-order functions evaluate interpreted — measured 40×
    // slower here): each 64-char bit string parses as two 32-bit halves,
    // XOR + popcount. conv() stays within 32 bits so the signed-long cast
    // is exact.
    def half(c: org.apache.spark.sql.Column, off: Int) =
      conv(substring(c, off, 32), 2, 10).cast("long")
    val hamming =
      (bit_count(half(col("h_a"), 1).bitwiseXOR(half(col("h_b"), 1))) +
        bit_count(half(col("h_a"), 33).bitwiseXOR(half(col("h_b"), 33))))
        .cast("int")
    val cross = hashPairs
      .withColumn("hamming", hamming)
      .filter(col("hamming") <= maxHamming) // distinct hashes: hamming >= 1
      .join(groups.select(col("h").as("h_a"), col("ids").as("ids_a")), "h_a")
      .join(groups.select(col("h").as("h_b"), col("ids").as("ids_b")), "h_b")
      .select(explode(col("ids_a")).as("x"), col("ids_b"), col("hamming"))
      .select(col("x"), explode(col("ids_b")).as("y"), col("hamming"))
      .select(least(col("x"), col("y")).as("doc_id_a"),
        greatest(col("x"), col("y")).as("doc_id_b"), col("hamming"))

    within.unionByName(cross)
      .orderBy(col("doc_id_a"), col("doc_id_b"))
  }

  // ---- perceptual audio near-dup -------------------------------------------

  /** Audio fingerprint over decoded mono PCM, as a 64-char '0'/'1' string —
    * the Haitsma–Kalker construction (ISMIR'02: sign of the time-frequency
    * difference of band energies) with integer lag-comb filters standing in
    * for FFT bands (no DSP library here, and exactness wants integers):
    *
    *   grid: 9 time frames (floor boundaries, the aHash convention) ×
    *         lag bands b = 1..9;
    *   E(f,b) = Σ_{i∈frame f, i≥b} |s[i] − s[i−b]| — a lag-b comb
    *            high-pass energy, long arithmetic;
    *   bit(f,b) for f=1..8, b=1..8:
    *     (E(f,b)−E(f,b+1)) − (E(f−1,b)−E(f−1,b+1)) > 0, ordered by (f,b).
    *
    * Every step is integer, so the SQL oracle reproduces the identical
    * string from the sample definition while Spark computes it from real
    * container bytes. Robust to exactly what a crawl re-encode changes
    * (container layout, channel duplication — the decode normalizes both)
    * and sensitive to the signal itself.
    */
  def audioHashBits(samples: Array[Int]): String = {
    val frames = 9; val bands = 9
    val n = samples.length
    val e = Array.ofDim[Long](frames, bands + 1) // e(f)(b), b in 1..9
    var i = 0
    while (i < n) {
      val f = ((i.toLong * frames) / n).toInt
      var b = 1
      while (b <= bands) {
        if (i >= b) e(f)(b) += math.abs(samples(i).toLong - samples(i - b).toLong)
        b += 1
      }
      i += 1
    }
    val sb = new StringBuilder(64)
    for (f <- 1 until frames; b <- 1 until bands) {
      val d = (e(f)(b) - e(f)(b + 1)) - (e(f - 1)(b) - e(f - 1)(b + 1))
      sb.append(if (d > 0) '1' else '0')
    }
    sb.toString
  }

  case class AudioHash(doc_id: Long, hash: String, sample_rate: Int,
      channels: Int, n_samples: Int)

  /** Perceptual fingerprints for every decodable PCM16 WAV payload —
    * map-only decode+hash per partition, bytes never leave the executor
    * (the imageHashes contract on the audio modality). Undecodable or
    * empty audio drops out; the header-metadata path still audits it.
    */
  def audioHashes(media: Dataset[MediaRow]): Dataset[AudioHash] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        if (r.media_type == "audio")
          WavCodec.decodePcm16(r.data).collect {
            case (rate, ch, mono) if mono.nonEmpty =>
              AudioHash(r.doc_id, audioHashBits(mono), rate, ch, mono.length)
          }
        else None
      }
    }
  }

  /** Perceptual audio NEAR-duplicate pairs at Hamming ≤ `maxHamming` —
    * the re-encode/re-master detector: byte-different containers of the
    * same signal collide at Hamming 0, slightly perturbed signals land
    * within the radius. Same probe family, same collapse, same verify as
    * the image tier ([[nearPairs64]]).
    */
  def audioNearPairs(media: Dataset[MediaRow], maxHamming: Int = 2): DataFrame =
    nearPairs64(audioHashes(media).toDF()
      .select(col("doc_id"), col("hash").as("h")), maxHamming)

  // ---- perceptual video near-dup -------------------------------------------

  /** Video fingerprint over decoded grayscale frames, as a 64-char '0'/'1'
    * string — the Haitsma–Kalker sign construction ([[audioHashBits]])
    * applied on the spatio-temporal block-luminance grid their video work
    * (and the TIRI family) uses:
    *
    *   grid: 9 time segments t = ⌊i·9/nFrames⌋ over the frame index ×
    *         9 spatial cells c = ⌊y·3/h⌋·3 + ⌊x·3/w⌋ (a 3×3 block grid,
    *         index-map convention like the audio frames);
    *   E(t,c) = Σ pixel values in cell c over the segment's frames (long);
    *   bit(t,c) for t=1..8, c=0..7:
    *     (E(t,c)−E(t,c+1)) − (E(t−1,c)−E(t−1,c+1)) > 0, ordered by (t,c).
    *
    * Every step is integer, so the SQL oracle reproduces the identical
    * string from the frame-pixel definition while Spark computes it from
    * real AVI bytes. Invariant to exactly what a container re-encode
    * changes (8 vs 24-bit DIB, row order, junk chunks — the decode
    * normalizes all of them) and to global brightness shifts (differences
    * of differences), sensitive to the signal itself.
    */
  def videoHashBits(frames: Array[Array[Int]], w: Int, h: Int): String = {
    val segs = 9; val cells = 9
    val n = frames.length
    val e = Array.ofDim[Long](segs, cells)
    var i = 0
    while (i < n) {
      val t = ((i.toLong * segs) / n).toInt
      val f = frames(i)
      var p = 0
      while (p < f.length) {
        val x = p % w; val y = p / w
        e(t)((y * 3 / h) * 3 + (x * 3 / w)) += f(p)
        p += 1
      }
      i += 1
    }
    val sb = new StringBuilder(64)
    for (t <- 1 until segs; c <- 0 until cells - 1) {
      val d = (e(t)(c) - e(t)(c + 1)) - (e(t - 1)(c) - e(t - 1)(c + 1))
      sb.append(if (d > 0) '1' else '0')
    }
    sb.toString
  }

  case class VideoHash(doc_id: Long, hash: String, width: Int, height: Int,
      n_frames: Int)

  /** Perceptual fingerprints for every decodable uncompressed-DIB AVI
    * payload — map-only decode+hash per partition, bytes never leave the
    * executor (the imageHashes contract on the video modality).
    * Undecodable or frame-less video drops out; the header-metadata path
    * still audits it.
    */
  def videoHashes(media: Dataset[MediaRow]): Dataset[VideoHash] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        if (r.media_type == "video")
          AviCodec.decodeGray(r.data).collect {
            case (w, h, frames) if frames.nonEmpty =>
              VideoHash(r.doc_id, videoHashBits(frames, w, h), w, h, frames.length)
          }
        else None
      }
    }
  }

  /** Perceptual video NEAR-duplicate pairs at Hamming ≤ `maxHamming` —
    * the re-encode detector for the third media modality: byte-different
    * containers of the same frames collide at Hamming 0, lightly perturbed
    * content lands within the radius. Same probe family, same
    * identical-hash collapse, same verify as the image and audio tiers
    * ([[nearPairs64]]).
    */
  def videoNearPairs(media: Dataset[MediaRow], maxHamming: Int = 2): DataFrame =
    nearPairs64(videoHashes(media).toDF()
      .select(col("doc_id"), col("hash").as("h")), maxHamming)

  case class VideoShot(doc_id: Long, shot_no: Long, start_frame: Long,
      end_frame: Long, n_frames: Long)

  /** Shot-boundary detection / keyframe segmentation — the video-pipeline
    * stage between decode and frame sampling (a vision-LM corpus samples
    * per SHOT, not per fixed stride, or a hard cut lands twice and a long
    * still scene floods the batch): per-frame aHash over the decoded
    * frames, a boundary wherever consecutive frames' hashes differ by more
    * than `minHamming` bits (a cut changes most of the 64 cells; within a
    * scene the mean-relative hash shrugs off global brightness drift), and
    * one row per resulting shot with its frame span. The first frame of
    * each shot is the canonical keyframe.
    *
    * Scale shape: a video's frames arrive in ONE row, so the whole
    * segmentation is row-local inside the decode pass — map-only, no
    * shuffle, bytes never leave the executor; only shot rows (bounded by
    * the cut count) come out. Undecodable or frame-less payloads drop out.
    */
  def videoShots(media: Dataset[MediaRow], minHamming: Int = 16): Dataset[VideoShot] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        if (r.media_type == "video")
          AviCodec.decodeGray(r.data).toSeq.flatMap {
            case (w, h, frames) if frames.nonEmpty =>
              val hashes = frames.map(f => aHashBits(f, w, h))
              val cuts = (1 until frames.length).filter { i =>
                hashes(i - 1).zip(hashes(i)).count { case (a, b) => a != b } > minHamming
              }
              val starts = 0 +: cuts
              val ends = cuts.map(_ - 1) :+ (frames.length - 1)
              starts.zip(ends).zipWithIndex.map { case ((s, e), i) =>
                VideoShot(r.doc_id, i + 1L, s.toLong, e.toLong, (e - s + 1).toLong)
              }
            case _ => Seq.empty
          }
        else Seq.empty
      }
    }
  }

  case class KeyframeHash(doc_id: Long, shot_no: Long, start_frame: Long,
      ahash: String)

  /** Per-shot keyframe perceptual hashes: [[videoShots]]' segmentation with
    * each shot represented by its first frame's aHash — the rows a
    * vision-LM sampling stage or a cross-modal dedup joins on. Same
    * row-local map-only shape as videoShots (the per-frame hashes are
    * already in hand when the cuts are found).
    */
  def videoKeyframes(media: Dataset[MediaRow], minHamming: Int = 16): Dataset[KeyframeHash] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        if (r.media_type == "video")
          AviCodec.decodeGray(r.data).toSeq.flatMap {
            case (w, h, frames) if frames.nonEmpty =>
              val hashes = frames.map(f => aHashBits(f, w, h))
              val cuts = (1 until frames.length).filter { i =>
                hashes(i - 1).zip(hashes(i)).count { case (a, b) => a != b } > minHamming
              }
              (0 +: cuts).zipWithIndex.map { case (s, i) =>
                KeyframeHash(r.doc_id, i + 1L, s.toLong, hashes(s))
              }
            case _ => Seq.empty
          }
        else Seq.empty
      }
    }
  }

  /** Cross-MODAL still search: which videos contain a known image as a
    * still shot? Image aHashes and per-shot keyframe aHashes ride ONE
    * probe join ([[nearPairs64]], same identical-hash collapse), so a
    * video whose shot renders a corpus image collides at Hamming 0 and
    * light re-encodes land within the radius — the dedup/compliance query
    * a mixed image+video corpus needs (a takedown image must also
    * surface the videos embedding it). Keyframes enter the shared id
    * space as 5·10⁸ + doc_id·1000 + shot_no (callers' media ids must stay
    * below 5·10⁸ and shots-per-video below 1000 — ENFORCED fail-loud
    * below, the ingest-family posture: an hour-long video past 1000 cuts
    * or an id ≥ the base would otherwise silently misdecode in a
    * takedown/compliance answer); pairs that don't cross the modality
    * boundary are dropped, and the packing is decoded back to
    * (image_doc_id, video_doc_id, shot_no).
    */
  def videoStillOfImagePairs(media: Dataset[MediaRow], maxHamming: Int = 2,
      minHamming: Int = 16): DataFrame = {
    val kfBase = 500000000L
    val imgs = imageHashes(media).toDF()
      .select(
        when(col("doc_id") >= kfBase, raise_error(concat(
          lit("videoStillOfImagePairs: image doc_id "), col("doc_id"),
          lit(s" >= keyframe id base $kfBase — packed-id space violated"))))
          .otherwise(col("doc_id")).as("doc_id"),
        col("ahash").as("h"))
    val kfs = videoKeyframes(media, minHamming).toDF()
      .select(
        when(col("shot_no") >= 1000L, raise_error(concat(
          lit("videoStillOfImagePairs: video "), col("doc_id"),
          lit(" shot_no "), col("shot_no"),
          lit(" >= 1000 — packed-id space violated"))))
          .when(col("doc_id") >= kfBase, raise_error(concat(
            lit("videoStillOfImagePairs: video doc_id "), col("doc_id"),
            lit(s" >= keyframe id base $kfBase — packed-id space violated"))))
          .otherwise(lit(kfBase) + col("doc_id") * 1000 + col("shot_no")).as("doc_id"),
        col("ahash").as("h"))
    nearPairs64(imgs.unionByName(kfs), maxHamming)
      .filter(col("doc_id_a") < kfBase && col("doc_id_b") >= kfBase)
      .select(col("doc_id_a").as("image_doc_id"),
        ((col("doc_id_b") - kfBase) / 1000).cast("long").as("video_doc_id"),
        pmod(col("doc_id_b") - kfBase, lit(1000L)).as("shot_no"),
        col("hamming"))
      .orderBy(col("image_doc_id"), col("video_doc_id"), col("shot_no"))
  }

  /** Content-addressed storage audit per modality: media blobs group by
    * content hash (the CAS/dedup-store model — a crawl re-delivers the
    * same image under many pages), yielding copy counts and the byte
    * savings a dedup store realizes. Hash-groupBy over the binary column
    * only — the blob bytes never shuffle twice: the first aggregation
    * carries (hash, byte-length), the second is blob-count-sized.
    */
  def dedupStats(docs: DataFrame): DataFrame = {
    val perBlob = deriveMedia(docs).toDF()
      .select(col("media_type"), md5(col("data")).as("h"),
        length(col("data")).cast("long").as("nb"))
      .groupBy(col("media_type"), col("h"))
      .agg(count(lit(1)).as("copies"), min(col("nb")).as("nb"))
    perBlob.groupBy(col("media_type"))
      .agg(sum(col("copies")).as("n_media"),
        count(lit(1)).as("n_unique"),
        sum(col("copies") * col("nb")).as("bytes_total"),
        sum(col("nb")).as("bytes_unique"))
      .withColumn("dedup_ratio",
        col("bytes_unique").cast("double") / col("bytes_total").cast("double"))
      .orderBy(col("media_type"))
  }
}
