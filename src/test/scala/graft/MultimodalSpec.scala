package graft

import graft.multimodal.Multimodal

class MultimodalSpec extends SparkSpec {

  test("binary plumbing: payload bytes survive the parquet round trip") {
    val media = Multimodal.deriveMedia(Tables.documents(spark, sf))
    val dir = java.nio.file.Files.createTempDirectory("graft-media").toString + "/media"
    media.write.parquet(dir)
    import spark.implicits._
    val back = spark.read.parquet(dir).as[Multimodal.MediaRow]
    val a = media.collect().map(r => (r.doc_id, r.data.toSeq)).toMap
    val b = back.collect().map(r => (r.doc_id, r.data.toSeq)).toMap
    assert(a == b)
  }

  test("frame sampling: min(k, frames) rows per doc, strictly increasing offsets") {
    val media = Multimodal.deriveMedia(Tables.documents(spark, sf))
    val meta = Multimodal.extractMeta(media).collect().map(m => m.doc_id -> m).toMap
    val byDoc = Multimodal.sampleFrames(media, k = 8).collect().groupBy(_.doc_id)
    assert(byDoc.size == meta.size)
    byDoc.foreach { case (id, fs) =>
      val m = meta(id)
      assert(fs.length == math.min(8, m.frames), s"doc $id expected min(8, ${m.frames}) samples")
      val nos = fs.map(_.frame_no).sorted
      assert(nos.distinct.length == nos.length, s"doc $id sampled a frame twice")
      assert(nos.forall(f => f >= 0 && f < m.frames))
      if (m.media_type == "image") assert(fs.map(_.frame_no).toSeq == Seq(0L))
      val offs = fs.sortBy(_.frame_no).map(_.byte_off)
      assert(offs.zip(offs.drop(1)).forall { case (a, b) => a <= b }, s"doc $id offsets decrease")
      assert(offs.forall(o => o >= 0 && o < math.max(m.n_bytes, 1)), s"doc $id offset out of payload")
    }
  }

  test("header decode: hand-built PNG and JPEG bytes yield true dimensions through extractMeta") {
    import spark.implicits._
    // Minimal PNG: signature + IHDR length/type + width=640, height=480.
    def be32(v: Int): Array[Byte] =
      Array((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
    val png: Array[Byte] =
      Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte) ++
        be32(13) ++ "IHDR".getBytes ++ be32(640) ++ be32(480) ++
        Array[Byte](8, 6, 0, 0, 0)
    // Minimal JPEG: SOI, an APP0 segment (must be skipped by length), then
    // SOF0 with height=123, width=456.
    def seg(marker: Int, payload: Array[Byte]): Array[Byte] =
      Array(0xFF.toByte, marker.toByte,
        ((payload.length + 2) >> 8).toByte, ((payload.length + 2) & 0xFF).toByte) ++ payload
    val jpeg: Array[Byte] =
      Array(0xFF, 0xD8).map(_.toByte) ++
        seg(0xE0, "JFIF".getBytes ++ Array.fill[Byte](9)(0)) ++
        seg(0xC0, Array[Byte](8, 0, 123.toByte, (456 >> 8).toByte, (456 & 0xFF).toByte, 3))
    val rows = Seq(
      Multimodal.MediaRow(1L, "image", png),
      Multimodal.MediaRow(2L, "image", jpeg),
      Multimodal.MediaRow(3L, "image", "not an image".getBytes), // → stub fallback
      Multimodal.MediaRow(4L, "audio", png)) // wrong modality → stub, even for real PNG bytes
    val meta = Multimodal.extractMeta(rows.toDS()).collect().map(m => m.doc_id -> m).toMap
    assert(meta(1L).width == 640 && meta(1L).height == 480 && meta(1L).frames == 1)
    assert(meta(2L).width == 456 && meta(2L).height == 123 && meta(2L).frames == 1)
    val stub = new Multimodal.StubDecoder
    val s3 = stub.decode("image", "not an image".getBytes)
    assert(meta(3L).width == s3.width && meta(3L).height == s3.height)
    val s4 = stub.decode("audio", png)
    assert(meta(4L).width == s4.width && meta(4L).frames == s4.frames)
  }

  test("header decode: hand-built WAV bytes yield rate/channels/frames through extractMeta") {
    import spark.implicits._
    def le16(v: Int): Array[Byte] = Array(v.toByte, (v >> 8).toByte)
    def le32(v: Int): Array[Byte] =
      Array(v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
    // 44.1kHz stereo 16-bit PCM, 1000 sample frames (blockAlign 4, data 4000B).
    val fmt = le16(1) ++ le16(2) ++ le32(44100) ++ le32(44100 * 4) ++ le16(4) ++ le16(16)
    val data = Array.fill[Byte](4000)(0)
    val wav: Array[Byte] =
      "RIFF".getBytes ++ le32(36 + data.length) ++ "WAVE".getBytes ++
        "fmt ".getBytes ++ le32(fmt.length) ++ fmt ++
        "data".getBytes ++ le32(data.length) ++ data
    val rows = Seq(
      Multimodal.MediaRow(1L, "audio", wav),
      Multimodal.MediaRow(2L, "audio", "just noise".getBytes), // → stub fallback
      Multimodal.MediaRow(3L, "video", wav)) // wrong modality → stub
    val meta = Multimodal.extractMeta(rows.toDS()).collect().map(m => m.doc_id -> m).toMap
    assert(meta(1L).width == 44100, "width carries the sample rate")
    assert(meta(1L).height == 2, "height carries the channel count")
    assert(meta(1L).frames == 1000, "frames carries the PCM sample-frame count")
    val stub = new Multimodal.StubDecoder
    val s2 = stub.decode("audio", "just noise".getBytes)
    assert(meta(2L).width == s2.width && meta(2L).frames == s2.frames)
    val s3 = stub.decode("video", wav)
    assert(meta(3L).width == s3.width && meta(3L).frames == s3.frames)
  }

  test("WAV decode survives adversarial chunk sizes (unsigned u32, no stalls)") {
    import spark.implicits._
    def le16(v: Int): Array[Byte] = Array(v.toByte, (v >> 8).toByte)
    def le32(v: Int): Array[Byte] =
      Array(v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
    val fmt = le16(1) ++ le16(2) ++ le32(44100) ++ le32(44100 * 4) ++ le16(4) ++ le16(16)
    // A leading junk chunk whose u32 size has the high bit set (signed -8):
    // the old signed read made the walk advance by 0 bytes — forever.
    val junkThenFmt: Array[Byte] =
      "RIFF".getBytes ++ le32(100) ++ "WAVE".getBytes ++
        "junk".getBytes ++ le32(0xFFFFFFF8) ++
        "fmt ".getBytes ++ le32(fmt.length) ++ fmt ++
        "data".getBytes ++ le32(4000) ++ Array.fill[Byte](40)(0)
    // A data chunk claiming 4000 bytes with only 40 present: the declared
    // size is clamped to the bytes on hand (40 / blockAlign 4 = 10 frames).
    val shortData: Array[Byte] =
      "RIFF".getBytes ++ le32(100) ++ "WAVE".getBytes ++
        "fmt ".getBytes ++ le32(fmt.length) ++ fmt ++
        "data".getBytes ++ le32(4000) ++ Array.fill[Byte](40)(0)
    val rows = Seq(
      Multimodal.MediaRow(1L, "audio", junkThenFmt),
      Multimodal.MediaRow(2L, "audio", shortData))
    val meta = Multimodal.extractMeta(rows.toDS()).collect().map(m => m.doc_id -> m).toMap
    // Bogus chunk size skips past the end → stub fallback, not a hang.
    val stub = new Multimodal.StubDecoder
    val s1 = stub.decode("audio", junkThenFmt)
    assert(meta(1L).width == s1.width && meta(1L).frames == s1.frames)
    assert(meta(2L).width == 44100 && meta(2L).height == 2 && meta(2L).frames == 10)
  }

  test("stub decode is deterministic and metadata matches payload size") {
    val meta = Multimodal.extractMeta(Multimodal.deriveMedia(Tables.documents(spark, sf)))
      .collect()
    meta.foreach { m =>
      assert(m.width == 320 + (m.n_bytes % 1280).toInt)
      assert(m.height == 240 + (m.n_bytes % 720).toInt)
      if (m.media_type == "image") assert(m.frames == 1)
    }
    val again = Multimodal.extractMeta(Multimodal.deriveMedia(Tables.documents(spark, sf)))
      .collect()
    assert(meta.map(_.doc_id).sorted.sameElements(again.map(_.doc_id).sorted))
  }

  test("dedup stats: planted copies collapse to one stored blob per content hash") {
    import spark.implicits._
    // ids 0,3,6 → image modality; 0 and 6 carry IDENTICAL payloads
    val docs = Seq(
      (0L, "same bytes"), (6L, "same bytes"), (3L, "different bytes"),
      (1L, "audio one"), (4L, "audio one"), // audio copies
      (2L, "video only")
    ).toDF("doc_id", "text")
    val got = Multimodal.dedupStats(docs).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got("image") == ((3L, 2L, 10L + 10L + 15L, 10L + 15L)))
    assert(got("audio") == ((2L, 1L, 18L, 9L)))
    assert(got("video") == ((1L, 1L, 10L, 10L)))
  }

  test("PNG codec: every scanline filter reconstructs the exact pixels") {
    import graft.multimodal.PngCodec
    val w = 7; val h = 5
    val px = Array.tabulate(w * h)(p => (p * 37 + 11) % 256)
    for (ft <- Seq(0, 1)) {
      val bytes = PngCodec.encodeGray(px, w, h, filterType = ft)
      val Some((dw, dh, got)) = PngCodec.decodeGray(bytes)
      assert((dw, dh) == ((w, h)) && got.sameElements(px), s"filter $ft round trip")
    }
    // Up/Average/Paeth (2/3/4): hand-filter the scanlines, deflate, wrap in
    // chunks via the encoder's own framing by splicing the raw stream
    for (ft <- Seq(2, 3, 4)) {
      val raw = new Array[Byte]((w + 1) * h)
      for (y <- 0 until h) {
        raw(y * (w + 1)) = ft.toByte
        for (x <- 0 until w) {
          val v = px(y * w + x)
          val a = if (x > 0) px(y * w + x - 1) else 0
          val b = if (y > 0) px((y - 1) * w + x) else 0
          val c = if (x > 0 && y > 0) px((y - 1) * w + x - 1) else 0
          val pred = ft match {
            case 2 => b
            case 3 => (a + b) / 2
            case 4 =>
              val p = a + b - c
              val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
              if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
          }
          raw(y * (w + 1) + 1 + x) = ((v - pred) & 0xFF).toByte
        }
      }
      // reuse encoder output as a template: swap its IDAT payload
      val filt0 = PngCodec.encodeGray(px, w, h, filterType = 0)
      val deflater = new java.util.zip.Deflater()
      deflater.setInput(raw); deflater.finish()
      val buf = new Array[Byte](raw.length + 64)
      val out = new java.io.ByteArrayOutputStream()
      while (!deflater.finished()) out.write(buf, 0, deflater.deflate(buf))
      val idat = out.toByteArray
      // rebuild: signature+IHDR from template (8 + 25 bytes), new IDAT, IEND
      val bb = new java.io.ByteArrayOutputStream()
      bb.write(filt0, 0, 8 + 25)
      def w32(v: Long): Unit = { bb.write(((v >> 24) & 0xFF).toInt); bb.write(((v >> 16) & 0xFF).toInt)
        bb.write(((v >> 8) & 0xFF).toInt); bb.write((v & 0xFF).toInt) }
      w32(idat.length.toLong); bb.write("IDAT".getBytes("US-ASCII")); bb.write(idat)
      val crc = new java.util.zip.CRC32()
      crc.update("IDAT".getBytes("US-ASCII")); crc.update(idat); w32(crc.getValue)
      w32(0L); bb.write("IEND".getBytes("US-ASCII"))
      val iendCrc = new java.util.zip.CRC32(); iendCrc.update("IEND".getBytes("US-ASCII"))
      w32(iendCrc.getValue)
      val Some((_, _, got)) = PngCodec.decodeGray(bb.toByteArray)
      assert(got.sameElements(px), s"filter $ft reconstruction")
    }
  }

  test("PNG codec: truncated and garbage bytes decode to None, never throw") {
    import graft.multimodal.PngCodec
    val px = Array.tabulate(64)(_ % 256)
    val good = PngCodec.encodeGray(px, 8, 8)
    assert(PngCodec.decodeGray(good).isDefined)
    // cuts through the signature, IHDR, and mid-IDAT must all reject;
    // losing only the IEND tail is legitimately decodable (IDAT complete)
    for (cut <- Seq(4, 12, 30, good.length - 20))
      assert(PngCodec.decodeGray(good.take(cut)).isEmpty, s"truncation at $cut")
    assert(PngCodec.decodeGray("not a png at all".getBytes).isEmpty)
    val corrupted = good.clone
    corrupted(40) = (corrupted(40) ^ 0x55).toByte // inside IDAT
    assert(PngCodec.decodeGray(corrupted).isEmpty ||
      PngCodec.decodeGray(corrupted).isDefined) // must not throw either way
  }

  test("perceptual dedup: re-encoded twins collide on aHash/dHash, byte dedup misses them") {
    import graft.multimodal.{Multimodal, PngCodec}
    import spark.implicits._
    val px = Array.tabulate(256)(p => (p * 31 + (p / 16) * 13) % 256)
    val orig = PngCodec.encodeGray(px, 16, 16, filterType = 0)
    val reenc = PngCodec.encodeGray(px, 16, 16, filterType = 1, level = 9)
    assert(!orig.sameElements(reenc), "re-encode must produce different bytes")
    val other = PngCodec.encodeGray(px.map(v => 255 - v), 16, 16)
    val media = Seq(
      Multimodal.MediaRow(1L, "image", orig),
      Multimodal.MediaRow(2L, "image", reenc),
      Multimodal.MediaRow(3L, "image", other),
      Multimodal.MediaRow(4L, "image", "junk".getBytes), // undecodable → dropped
      Multimodal.MediaRow(5L, "audio", orig)).toDS() // wrong modality → dropped
    val hashes = Multimodal.imageHashes(media).collect().map(h => h.doc_id -> h).toMap
    assert(hashes.keySet == Set(1L, 2L, 3L))
    assert(hashes(1L).ahash == hashes(2L).ahash && hashes(1L).dhash == hashes(2L).dhash,
      "identical pixels must hash identically regardless of encoding")
    assert(hashes(1L).ahash != hashes(3L).ahash, "inverted image must differ")
    val groups = Multimodal.phashDupGroups(media).collect()
    assert(groups.length == 1 &&
      groups.head.getAs[Long]("n_copies") == 2L &&
      groups.head.getAs[Long]("min_doc_id") == 1L &&
      groups.head.getAs[Long]("max_doc_id") == 2L)
  }

  test("Hamming-radius near pairs: probe join equals brute force; perturbed twin caught") {
    import graft.multimodal.{Multimodal, PngCodec}
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // 20 random 32×32 images + one perturbed twin of image 0 (a few pixels
    // bumped — lands within Hamming ≤ 2 of the original's aHash but is NOT
    // an exact hash collision in general)
    val imgs = (0 until 20).map { id =>
      id.toLong -> Array.fill(1024)(rnd.nextInt(256))
    }
    val twinPx = imgs.head._2.clone
    // bump one 4×4 downsample cell's pixels just past its threshold margin
    (0 until 8).foreach(i => twinPx(i) = (twinPx(i) + 6) % 256)
    val media = (imgs.map { case (id, px) =>
      Multimodal.MediaRow(id, "image", PngCodec.encodeGray(px, 32, 32))
    } :+ Multimodal.MediaRow(100L, "image", PngCodec.encodeGray(twinPx, 32, 32))).toDS()
    val hashes = Multimodal.imageHashes(media).collect().map(h => h.doc_id -> h.ahash).toMap
    def ham(a: String, b: String) = a.zip(b).count { case (x, y) => x != y }
    val brute = (for {
      (ida, ha) <- hashes; (idb, hb) <- hashes
      if ida < idb && ham(ha, hb) <= 2
    } yield (ida, idb, ham(ha, hb))).toSet
    val got = Multimodal.phashNearPairs(media).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == brute, s"probe join must equal the brute-force radius-2 definition")
    val twinHam = ham(hashes(0L), hashes(100L))
    assert(twinHam <= 2, s"fixture drift: twin at hamming $twinHam")
    assert(got.exists(p => p._1 == 0L && p._2 == 100L),
      "the perturbed twin must surface as a near pair")
  }

  test("identical-hash collapse: 1k byte-identical renders are ONE probe-join row; pair output exact") {
    import graft.multimodal.{Multimodal, PngCodec}
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val basePx = Array.fill(1024)(rnd.nextInt(256))
    val base = PngCodec.encodeGray(basePx, 32, 32)
    def ham0(a: String, b: String) = a.zip(b).count { case (x, y) => x != y }
    // a near twin at a GUARANTEED hamming 1..2: brighten cell (0,0)'s 16
    // pixels by increasing amounts until the hash (computed locally with the
    // same pure function the operator uses) lands in the radius — no fixture
    // drift possible
    val baseHash = Multimodal.aHashBits(basePx, 32, 32)
    def cellPx(c: Int): Seq[Int] = {
      val cy = c / 8; val cx = c % 8
      for (y <- cy * 4 until cy * 4 + 4; x <- cx * 4 until cx * 4 + 4) yield y * 32 + x
    }
    val twinPx = (for (c <- (0 until 64).iterator; m <- (1 to 200).iterator) yield {
      val p = basePx.clone
      cellPx(c).foreach(i => p(i) = math.min(255, p(i) + m))
      p
    }).find { p => val h = ham0(Multimodal.aHashBits(p, 32, 32), baseHash); h >= 1 && h <= 2 }
      .getOrElse(fail("no single-cell brightening lands at hamming 1..2"))
    val twin = PngCodec.encodeGray(twinPx, 32, 32)
    val far = PngCodec.encodeGray(basePx.map(v => 255 - v), 32, 32)
    val n = 1000
    val media = ((0 until n).map(i => Multimodal.MediaRow(i.toLong, "image", base))
      :+ Multimodal.MediaRow(2000L, "image", twin)
      :+ Multimodal.MediaRow(3000L, "image", far)).toDS()

    // the collapse the probe join consumes: one row per DISTINCT hash,
    // the flat-image group is a single row carrying its 1000 ids
    val groups = Multimodal.phashHashGroups(media).collect()
    val hashes = Multimodal.imageHashes(media).collect().map(h => h.doc_id -> h.ahash).toMap
    assert(groups.length == hashes.values.toSet.size,
      "probe-join input must be one row per distinct hash")
    val bigGroup = groups.find(_.getSeq[Long](1).length == n)
    assert(bigGroup.isDefined, "the 1000 identical renders must collapse into one group")
    assert(bigGroup.get.getSeq[Long](1) == (0L until n.toLong), "ids sorted within the group")

    // exact expected pair count from the hash table arithmetic: C(g,2) per
    // group + size products for cross-hash pairs within the radius
    def ham(a: String, b: String) = ham0(a, b)
    val groupSizes = hashes.values.groupBy(identity).map { case (h, v) => h -> v.size.toLong }
    val withinCount = groupSizes.values.map(g => g * (g - 1) / 2).sum
    val hs = groupSizes.keys.toSeq.sorted
    val crossCount = (for {
      i <- hs.indices; j <- (i + 1) until hs.length
      if ham(hs(i), hs(j)) <= 2
    } yield groupSizes(hs(i)) * groupSizes(hs(j))).sum
    val twinHam = ham(hashes(0L), hashes(2000L))
    assert(twinHam >= 1 && twinHam <= 2, s"fixture drift: twin at hamming $twinHam")
    val pairs = Multimodal.phashNearPairs(media)
    assert(pairs.count() == withinCount + crossCount)
    // spot checks: an identical pair at hamming 0; the twin pair at its true distance
    val spot = pairs.filter(col("doc_id_a").isin(0L, 998L) && col("doc_id_b").isin(999L, 2000L))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(spot((998L, 999L)) == 0)
    assert(spot((0L, 2000L)) == twinHam)
  }

  test("phash index delete/compact: tombstoned residents stop vetoing, ids stay burned") {
    import graft.multimodal.{Multimodal, PhashIndex, PngCodec}
    import spark.implicits._
    def png(src: Long, filter: Int = 0): Array[Byte] =
      PngCodec.encodeGray(Array.tabulate(1024) { p =>
        var h = src * 1000003L + p
        h ^= h >>> 33; h *= 0xff51afd7ed558ccdL; h ^= h >>> 33
        (h & 0xFF).toInt
      }, 32, 32, filterType = filter)
    def img(id: Long, src: Long, filter: Int = 0) =
      Multimodal.MediaRow(id, "image", png(src, filter))
    val dir = java.nio.file.Files.createTempDirectory("graft-phdel").toString + "/ph"
    PhashIndex.build(spark, (0L until 10L).map(i => img(i, i)).toDS(), dir)
    // a re-encode of resident 4 dies...
    val v0 = PhashIndex.dedupIngest(spark, dir, Seq(img(100L, 4L, filter = 1)).toDS())
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(v0(100L) == "near_dup")
    // ...until resident 4 is deleted — then the same pixels ingest
    PhashIndex.delete(spark, dir, Seq(4L).toDF("doc_id"))
    val v1 = PhashIndex.dedupIngest(spark, dir, Seq(img(101L, 4L, filter = 1)).toDS())
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(v1(101L) == "ingested", s"tombstoned resident must not veto, got $v1")
    // the deleted ID itself stays burned pre-compaction
    val burned = intercept[IllegalArgumentException] {
      PhashIndex.dedupIngest(spark, dir, Seq(img(4L, 4L)).toDS())
    }
    assert(burned.getMessage.contains("collide"))
    // compact folds the log; the freed id is appendable again and the
    // re-ingested pixels (doc 101) now veto as resident
    PhashIndex.compact(spark, dir)
    val v2 = PhashIndex.dedupIngest(spark, dir, Seq(img(4L, 90L)).toDS())
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(v2(4L) == "ingested", s"compacted id must be reusable, got $v2")
    val p = new org.apache.hadoop.fs.Path(s"$dir/tombstones")
    assert(!p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p))
  }

  test("phash gate on a LEGACY probes layout (no r_hash): fallback join, appends keep the legacy schema") {
    import graft.multimodal.{Multimodal, PhashIndex, PngCodec}
    import spark.implicits._
    import org.apache.spark.sql.functions._
    def png(src: Long, filter: Int = 0): Array[Byte] =
      PngCodec.encodeGray(Array.tabulate(1024) { p =>
        var h = src * 1000003L + p
        h ^= h >>> 33; h *= 0xff51afd7ed558ccdL; h ^= h >>> 33
        (h & 0xFF).toInt
      }, 32, 32, filterType = filter)
    def img(id: Long, src: Long, filter: Int = 0) =
      Multimodal.MediaRow(id, "image", png(src, filter))
    val dir = java.nio.file.Files.createTempDirectory("graft-phlegacy").toString + "/ph"
    PhashIndex.build(spark, (0L until 10L).map(i => img(i, i)).toDS(), dir)
    // rewrite probes down to the PRE-r12 two-column layout
    val legacy = spark.read.parquet(s"$dir/probes").select("probe", "doc_id")
      .localCheckpoint(true)
    legacy.write.mode("overwrite").parquet(s"$dir/probes")
    // re-encoded resident dies via the fallback join; fresh pixels ingest
    val v = PhashIndex.dedupIngest(spark, dir,
      Seq(img(100L, 4L, filter = 1), img(101L, 77L)).toDS())
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(v == Map(100L -> "near_dup", 101L -> "ingested"), s"got $v")
    // the survivor's probe rows appended in the LEGACY schema — a widened
    // append would leave r_hash invisible to non-merging readers
    val cols = spark.read.parquet(s"$dir/probes").columns.toSet
    assert(cols == Set("probe", "doc_id"), s"legacy layout widened in place: $cols")
    // and the appended rows gate the NEXT batch through the same fallback
    val v2 = PhashIndex.dedupIngest(spark, dir, Seq(img(102L, 77L)).toDS())
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(v2(102L) == "near_dup", s"appended legacy rows must veto, got $v2")
  }

  test("phash ingest fails fast on a within-batch duplicate doc_id") {
    import graft.multimodal.{Multimodal, PhashIndex, PngCodec}
    import spark.implicits._
    def png(src: Long): Array[Byte] =
      PngCodec.encodeGray(Array.tabulate(256)(p => ((src * 37 + p * 13) % 256).toInt), 16, 16)
    val dir = java.nio.file.Files.createTempDirectory("graft-phdup").toString + "/ph"
    PhashIndex.build(spark, Seq(Multimodal.MediaRow(1L, "image", png(1))).toDS(), dir)
    // an at-least-once source duplicating one record inside a micro-batch:
    // both copies would evade the batch_dup tier and burn the id twice
    val err = intercept[IllegalArgumentException] {
      PhashIndex.dedupIngest(spark, dir,
        Seq(Multimodal.MediaRow(7L, "image", png(2)),
          Multimodal.MediaRow(7L, "image", png(2))).toDS())
    }
    assert(err.getMessage.contains("duplicate doc_id"))
    // and the guard fired BEFORE any append: the id is still ingestable once
    val ok = PhashIndex.dedupIngest(spark, dir,
      Seq(Multimodal.MediaRow(7L, "image", png(2))).toDS())
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(ok(7L) == "ingested")
  }

  test("perceptual hash is robust to a one-pixel perturbation; RGB decode is integer-exact") {
    import graft.multimodal.{Multimodal, PngCodec}
    val px = Array.tabulate(1024)(p => (p * 7 + 3) % 256)
    val base = PngCodec.decodeGray(PngCodec.encodeGray(px, 32, 32)).get._3
    val bumped = px.clone; bumped(500) = (bumped(500) + 1) % 256
    val pert = PngCodec.decodeGray(PngCodec.encodeGray(bumped, 32, 32)).get._3
    def ham(a: String, b: String) = a.zip(b).count { case (x, y) => x != y }
    assert(ham(Multimodal.aHashBits(base, 32, 32), Multimodal.aHashBits(pert, 32, 32)) <= 2)
    assert(ham(Multimodal.dHashBits(base, 32, 32), Multimodal.dHashBits(pert, 32, 32)) <= 2)
    // RGB (color type 2): build by hand-splicing 3-channel scanlines
    val w = 4; val h = 2
    val rgb: Array[Int] = Array.tabulate(w * h * 3)(i => (i * 19 + 5) % 256)
    val raw = new Array[Byte]((w * 3 + 1) * h)
    for (y <- 0 until h; x <- 0 until w * 3)
      raw(y * (w * 3 + 1) + 1 + x) = rgb(y * w * 3 + x).toByte
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(raw); deflater.finish()
    val buf = new Array[Byte](raw.length + 64)
    val idatOut = new java.io.ByteArrayOutputStream()
    while (!deflater.finished()) idatOut.write(buf, 0, deflater.deflate(buf))
    val idat = idatOut.toByteArray
    val bb = new java.io.ByteArrayOutputStream()
    bb.write(Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte))
    val ihdr = new Array[Byte](13)
    ihdr(3) = w.toByte; ihdr(7) = h.toByte; ihdr(8) = 8; ihdr(9) = 2 // RGB
    def chunkBytes(tag: String, data: Array[Byte]): Array[Byte] = {
      val o = new java.io.ByteArrayOutputStream()
      def w32(v: Long): Unit = { o.write(((v >> 24) & 0xFF).toInt); o.write(((v >> 16) & 0xFF).toInt)
        o.write(((v >> 8) & 0xFF).toInt); o.write((v & 0xFF).toInt) }
      w32(data.length.toLong); o.write(tag.getBytes("US-ASCII")); o.write(data)
      val crc = new java.util.zip.CRC32(); crc.update(tag.getBytes("US-ASCII")); crc.update(data)
      w32(crc.getValue); o.toByteArray
    }
    bb.write(chunkBytes("IHDR", ihdr)); bb.write(chunkBytes("IDAT", idat))
    bb.write(chunkBytes("IEND", Array.empty[Byte]))
    val Some((dw, dh, gray)) = PngCodec.decodeGray(bb.toByteArray)
    assert((dw, dh) == ((w, h)))
    val want = Array.tabulate(w * h) { p =>
      (299 * rgb(p * 3) + 587 * rgb(p * 3 + 1) + 114 * rgb(p * 3 + 2)) / 1000
    }
    assert(gray.sameElements(want), "RGB→gray must be the documented integer luma")
  }

  // ---- JPEG codec ----------------------------------------------------------

  /** Per-8×8-flat pixels with EVEN values: the class of images whose DCT
    * roundtrip is provably exact in any conformant baseline codec (DC-only
    * blocks, DC = 8·(v−128) divisible by q₀₀ = 16) — what the registered
    * mixed-corpus oracles rely on.
    */
  private def blockyPx(src: Long, w: Int = 16, h: Int = 16): Array[Int] =
    Array.tabulate(w * h) { p =>
      val bx = (p % w) / 8; val by = (p / w) / 8
      (((src * 31 + bx * 7 + by * 13) % 128) * 2).toInt
    }

  test("JPEG codec: flat-block roundtrip bitwise; arbitrary images decode deterministically") {
    import graft.multimodal.JpegCodec
    // exact class: per-block-flat, even values
    for (src <- Seq(0L, 5L, 77L, 1234L)) {
      val px = blockyPx(src)
      val Some((w, h, got)) = JpegCodec.decodeGray(JpegCodec.encodeGray(px, 16, 16))
      assert((w, h) == ((16, 16)))
      assert(got.sameElements(px), s"flat even blocks must roundtrip exactly (src=$src)")
    }
    // DC-only hand case: a uniform 24×24 image (3×3 blocks, DC diffs = 0)
    val flat = Array.fill(24 * 24)(200)
    val Some((_, _, f)) = JpegCodec.decodeGray(JpegCodec.encodeGray(flat, 24, 24))
    assert(f.forall(_ == 200))
    // arbitrary (non-flat) content: lossy but deterministic and close
    val grad = Array.tabulate(32 * 16)(p => (p % 32 * 7 + p / 32 * 11) % 256)
    val enc = JpegCodec.encodeGray(grad, 32, 16)
    val Some((_, _, d1)) = JpegCodec.decodeGray(enc)
    val Some((_, _, d2)) = JpegCodec.decodeGray(enc)
    assert(d1.sameElements(d2), "decode must be deterministic")
    // the mod-256 sawtooth has hard wrap edges — the worst case for the
    // coarse high-frequency quants (up to 121), so bound the MEAN error
    // (a broken IDCT/dequant is off by ~100 everywhere, not ~6)
    val errs = grad.zip(d1).map { case (a, b) => math.abs(a - b) }
    assert(errs.sum.toDouble / errs.length <= 16.0,
      s"mean baseline quantization error out of range: ${errs.sum.toDouble / errs.length}")
    // odd dimensions exercise edge-replicated partial blocks
    val odd = Array.tabulate(13 * 9)(p => (p * 17) % 256)
    val Some((ow, oh, od)) = JpegCodec.decodeGray(JpegCodec.encodeGray(odd, 13, 9))
    assert((ow, oh) == ((13, 9)) && od.length == 13 * 9)
  }

  test("JPEG codec: garbage and truncation never throw; headers reject non-baseline") {
    import graft.multimodal.JpegCodec
    assert(JpegCodec.decodeGray("not a jpeg".getBytes).isEmpty)
    assert(JpegCodec.decodeGray(Array[Byte](0xFF.toByte, 0xD8.toByte)).isEmpty)
    val whole = JpegCodec.encodeGray(blockyPx(9L), 16, 16)
    // header truncation → None; scan truncation → prefix with mid-gray tail
    assert(JpegCodec.decodeGray(whole.take(20)).isEmpty)
    val cut = JpegCodec.decodeGray(whole.take(whole.length - 3))
    assert(cut.nonEmpty, "mid-scan truncation must yield the decoded prefix, not a throw")
    // a progressive SOF2 marker is rejected, not misparsed
    val prog = whole.clone()
    val sofAt = prog.indices.find(i =>
      (prog(i) & 0xFF) == 0xFF && (prog(i + 1) & 0xFF) == 0xC0).get
    prog(sofAt + 1) = 0xC2.toByte
    assert(JpegCodec.decodeGray(prog).isEmpty)
  }

  test("mixed corpus: the same pixels as PNG and JPEG collide on aHash through imageHashes") {
    import spark.implicits._
    import graft.multimodal.{JpegCodec, Multimodal, PngCodec}
    val rows = (1L to 20L).flatMap { src =>
      val px = blockyPx(src)
      Seq(Multimodal.MediaRow(src, "image", PngCodec.encodeGray(px, 16, 16)),
        Multimodal.MediaRow(src + 1000L, "image", JpegCodec.encodeGray(px, 16, 16)))
    }
    val hashes = Multimodal.imageHashes(spark.createDataset(rows)).collect()
      .map(h => h.doc_id -> (h.ahash, h.dhash)).toMap
    assert(hashes.size == 40, "every payload of both formats must decode")
    (1L to 20L).foreach { src =>
      assert(hashes(src) == hashes(src + 1000L),
        s"PNG and JPEG encodings of the same pixels must hash identically (src=$src)")
    }
  }

  // ---- perceptual audio tier -----------------------------------------------

  // The near twin dips TWO adjacent samples by 1: a uniform single-sample
  // shift cancels in the lag-comb differences (ΔE identical across bands),
  // while the pairwise dip changes ΔE(8,b) differentially in b — flipping
  // a couple of frame-8 sign bits, the Hamming-1..2 planted pair.
  private def pcm(src: Long, bumpAt: Int = -1): Array[Int] = Array.tabulate(576) { i =>
    val dip = if (bumpAt >= 0 && (i == bumpAt || i == bumpAt + 1)) 1L else 0L
    (((src * 37L + i.toLong * 11L - dip) % 4096L) - 2048L).toInt
  }

  test("WAV codec: PCM16 roundtrip exact; stereo duplicate downmixes to the identical mono") {
    import graft.multimodal.WavCodec
    val s = pcm(5L)
    val Some((rate, ch, mono)) = WavCodec.decodePcm16(WavCodec.encodePcm16(s, 8000, 1))
    assert(rate == 8000 && ch == 1 && mono.sameElements(s))
    // stereo duplicate + junk chunk: byte-different container, same signal
    val st = WavCodec.encodePcm16(s.flatMap(v => Array(v, v)), 8000, 2, extraChunk = true)
    assert(!st.sameElements(WavCodec.encodePcm16(s, 8000, 1)))
    val Some((r2, c2, m2)) = WavCodec.decodePcm16(st)
    assert(r2 == 8000 && c2 == 2 && m2.sameElements(s),
      "channel-duplicated stereo must decode to the identical mono samples")
    // asymmetric stereo with odd sums exercises the floor-division downmix
    val lr = Array(100, 101, -5, -6) // frames (100,101), (-5,-6)
    val Some((_, _, mixed)) = WavCodec.decodePcm16(WavCodec.encodePcm16(lr, 8000, 2))
    assert(mixed.toSeq == Seq(100, -6), "downmix must floor-divide (floorDiv, not truncate)")
    // truncation safety: cut mid-data → prefix decodes; garbage → None
    val whole = WavCodec.encodePcm16(s, 8000, 1)
    val Some((_, _, cut)) = WavCodec.decodePcm16(whole.take(whole.length - 7))
    assert(cut.length < s.length && cut.sameElements(s.take(cut.length)))
    assert(WavCodec.decodePcm16("not audio at all".getBytes).isEmpty)
    assert(WavCodec.decodePcm16(whole.take(20)).isEmpty)
  }

  test("audio near pairs: probe join equals brute force; re-encode at Hamming 0; bump within radius") {
    import spark.implicits._
    import graft.multimodal.{Multimodal, WavCodec}
    val srcs = (1L to 40L).map(_ * 11L)
    val rows = srcs.flatMap { id =>
      val base = Multimodal.MediaRow(id, "audio", WavCodec.encodePcm16(pcm(id), 8000, 1))
      val reEnc =
        if (id % 33 == 0) Seq(Multimodal.MediaRow(id + 4000000L, "audio",
          WavCodec.encodePcm16(pcm(id).flatMap(v => Array(v, v)), 8000, 2, extraChunk = true)))
        else Seq.empty
      val bumped =
        if (id % 44 == 0) Seq(Multimodal.MediaRow(id + 5000000L, "audio",
          WavCodec.encodePcm16(pcm(id, bumpAt = 570), 8000, 1)))
        else Seq.empty
      base +: (reEnc ++ bumped)
    } :+ Multimodal.MediaRow(999L, "video", Array[Byte](1, 2, 3)) // non-audio drops out
    val media = spark.createDataset(rows)
    val got = Multimodal.audioNearPairs(media).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq

    // brute-force the definition over driver-side hashes
    val hashes = rows.collect {
      case m if m.media_type == "audio" =>
        val Some((_, _, mono)) = WavCodec.decodePcm16(m.data)
        (m.doc_id, Multimodal.audioHashBits(mono))
    }
    val want = (for {
      (ia, ha) <- hashes; (ib, hb) <- hashes if ia < ib
      d = ha.zip(hb).count { case (x, y) => x != y } if d <= 2
    } yield (ia, ib, d)).sortBy(p => (p._1, p._2))
    assert(got == want, s"probe join must equal brute force:\n got=$got\nwant=$want")
    // every re-encoded twin collides at Hamming 0
    srcs.filter(_ % 33 == 0).foreach { id =>
      assert(got.contains((id, id + 4000000L, 0)), s"re-encode twin of $id must be Hamming 0")
    }
    // the planted one-sample bump stays within the probe radius
    val bumpPairs = got.filter { case (a, b, _) => b == a + 5000000L }
    assert(bumpPairs.nonEmpty, "at least one bumped twin must land within Hamming ≤ 2")
    assert(bumpPairs.exists(_._3 >= 1),
      "some bumped signal must flip bits yet stay within the probe radius")
  }

  /** Noise-like signals — phase-shifted SAWTOOTHS share lag-comb band
    * signatures (the mm_audio_near fixture exploits that), so the gate
    * test needs signals whose fingerprints genuinely differ per src.
    */
  private def noisyPcm(src: Long): Array[Int] = Array.tabulate(576) { i =>
    val h = (src * 2654435761L + i.toLong * 40503L) ^ (i.toLong * i * 97L)
    (((h % 4096L) + 4096L) % 4096L - 2048L).toInt
  }

  test("audio ingest gate: re-masters rejected, fresh audio admitted, lifecycle intact") {
    import spark.implicits._
    import graft.multimodal.{AudioHashIndex, Multimodal, WavCodec}
    val dir = java.nio.file.Files.createTempDirectory("graft-audidx").toString + "/idx"
    val resident = spark.createDataset((1L to 30L).map { i =>
      Multimodal.MediaRow(i, "audio", WavCodec.encodePcm16(noisyPcm(i * 11L), 8000, 1))
    })
    AudioHashIndex.build(spark, resident, dir)
    val offers = spark.createDataset(Seq(
      // a re-master of resident 5: stereo duplicate + extra chunk → near_dup at Hamming 0
      Multimodal.MediaRow(101L, "audio",
        WavCodec.encodePcm16(noisyPcm(5L * 11L).flatMap(v => Array(v, v)), 8000, 2, extraChunk = true)),
      // within-batch identical pair: min-id survives, the other is batch_dup
      Multimodal.MediaRow(102L, "audio", WavCodec.encodePcm16(noisyPcm(999L), 8000, 1)),
      Multimodal.MediaRow(103L, "audio", WavCodec.encodePcm16(noisyPcm(999L), 8000, 1)),
      // fresh signal → ingested
      Multimodal.MediaRow(104L, "audio", WavCodec.encodePcm16(noisyPcm(77777L), 8000, 1)),
      // not decodable audio → passes through labeled, never dropped
      Multimodal.MediaRow(105L, "audio", "not a wav".getBytes)))
    val verdicts = AudioHashIndex.dedupIngest(spark, dir, offers)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(verdicts(101L) == "near_dup", s"re-master must be caught: $verdicts")
    assert(verdicts(102L) == "ingested" && verdicts(103L) == "batch_dup")
    assert(verdicts(104L) == "ingested")
    assert(verdicts(105L) == "undecodable")
    // survivors are resident for the NEXT batch: a re-offer of 102's signal dies
    val reOffer = spark.createDataset(Seq(
      Multimodal.MediaRow(201L, "audio", WavCodec.encodePcm16(noisyPcm(999L), 8000, 1))))
    val v2 = AudioHashIndex.dedupIngest(spark, dir, reOffer)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(v2(201L) == "near_dup")
    // delete → stops vetoing; compact folds; id stays burned pre-compact
    AudioHashIndex.delete(spark, dir, Seq(102L).toDF("doc_id"))
    val v3 = AudioHashIndex.dedupIngest(spark, dir, spark.createDataset(Seq(
        Multimodal.MediaRow(202L, "audio", WavCodec.encodePcm16(noisyPcm(999L), 8000, 1)))))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(v3(202L) == "ingested", "a tombstoned resident must not veto new offers")
    val burned = intercept[IllegalArgumentException] {
      AudioHashIndex.dedupIngest(spark, dir, spark.createDataset(Seq(
        Multimodal.MediaRow(102L, "audio", WavCodec.encodePcm16(noisyPcm(1L), 8000, 1)))))
    }
    assert(burned.getMessage.contains("collide"))
    AudioHashIndex.compact(spark, dir)
    assert(spark.read.parquet(s"$dir/hashes")
      .filter(org.apache.spark.sql.functions.col("doc_id") === 102L).count() == 0)
  }

  /** The mm_video_near frame-pixel definition: 12×12 × 18 frames. The mod
    * wrap is the nonlinearity that makes hashes vary by src (a pure affine
    * shift would cancel in the second differences — the brightness
    * invariance working as designed); the bumped twin perturbs one spatial
    * cell (x,y ∈ [4,8)) of the last time segment (f ≥ 16), which by the
    * bit dependency structure can flip at most bits (8,3) and (8,4).
    */
  private def vframes(src: Long, bump: Int = 0): Array[Array[Int]] =
    Array.tabulate(18) { f =>
      Array.tabulate(144) { p =>
        val x = p % 12; val y = p / 12
        val b = if (bump != 0 && f >= 16 && x >= 4 && x < 8 && y >= 4 && y < 8) bump else 0
        ((src * 31L + f.toLong * f * 7L + x * 5L + y * 3L + b) % 256L).toInt
      }
    }

  test("AVI codec: frames roundtrip exact across 8/24-bit and row orders; truncation keeps the frame prefix") {
    import graft.multimodal.AviCodec
    val frames = vframes(5L)
    val variants = Seq(
      AviCodec.encodeGray(frames, 12, 12),
      AviCodec.encodeGray(frames, 12, 12, bits = 8),
      AviCodec.encodeGray(frames, 12, 12, topDown = true),
      AviCodec.encodeGray(frames, 12, 12, bits = 8, topDown = true, extraChunk = true))
    // byte-different containers, identical decoded pixels
    assert(variants.combinations(2).forall { case Seq(a, b) => !a.sameElements(b) })
    variants.foreach { bytes =>
      val Some((w, h, dec)) = AviCodec.decodeGray(bytes)
      assert(w == 12 && h == 12 && dec.length == 18)
      assert(dec.zip(frames).forall { case (a, b) => a.sameElements(b) },
        "every container variant must decode to the identical frames")
    }
    // header-only metadata path
    assert(AviCodec.aviMeta(variants.head).contains((12, 12, 18)))
    // truncation: cut inside the last frame chunk → 17-frame prefix
    val whole = variants.head
    val Some((_, _, cut)) = AviCodec.decodeGray(whole.take(whole.length - 10))
    assert(cut.length == 17 && cut.zip(frames).forall { case (a, b) => a.sameElements(b) })
    // garbage and non-AVI RIFF never throw
    assert(AviCodec.decodeGray("not a video".getBytes).isEmpty)
    assert(AviCodec.decodeGray(whole.take(30)).isEmpty)
    assert(AviCodec.decodeGray(
      graft.multimodal.WavCodec.encodePcm16(Array(1, 2, 3, 4), 8000, 1)).isEmpty)
    // adversarial chunk size inside the walk: clamp, don't stall or read past
    val evil = whole.clone()
    evil(whole.length - 14) = 0xFF.toByte // corrupt a late chunk-size byte
    AviCodec.decodeGray(evil) // must terminate without throwing
    // a muxed file listing its AUDIO stream first: splice an auds strl
    // into hdrl right after avih (patching hdrl + RIFF sizes) — the
    // decoder must skip it and find the video stream
    def le32(v: Int) = Array[Byte]((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
      ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)
    val audStrh = "strh".getBytes("US-ASCII") ++ le32(8) ++
      "auds".getBytes("US-ASCII") ++ "none".getBytes("US-ASCII")
    val audStrf = "strf".getBytes("US-ASCII") ++ le32(4) ++ le32(0)
    val audStrl = "LIST".getBytes("US-ASCII") ++
      le32(4 + audStrh.length + audStrf.length) ++
      "strl".getBytes("US-ASCII") ++ audStrh ++ audStrf
    val muxed = whole.take(88) ++ audStrl ++ whole.drop(88) // avih ends at 88
    def patchSize(a: Array[Byte], off: Int, delta: Int): Unit = {
      val v = (a(off) & 0xFF) | ((a(off + 1) & 0xFF) << 8) |
        ((a(off + 2) & 0xFF) << 16) | ((a(off + 3) & 0xFF) << 24)
      le32(v + delta).copyToArray(muxed, off)
      ()
    }
    patchSize(muxed, 4, audStrl.length) // RIFF size
    patchSize(muxed, 16, audStrl.length) // hdrl LIST size
    val Some((mw, mh, mdec)) = AviCodec.decodeGray(muxed)
    assert(mw == 12 && mh == 12 &&
      mdec.zip(frames).forall { case (a, b) => a.sameElements(b) },
      "the decoder must skip a leading audio strl and decode the video stream")
  }

  test("video near pairs: probe join equals brute force; re-container at Hamming 0; perturbed twin within radius") {
    import spark.implicits._
    import graft.multimodal.{AviCodec, Multimodal}
    val srcs = (1L to 40L).map(_ * 17L)
    val rows = srcs.flatMap { id =>
      val base = Multimodal.MediaRow(id, "video", AviCodec.encodeGray(vframes(id), 12, 12))
      val reEnc =
        if (id % 51 == 0) Seq(Multimodal.MediaRow(id + 8000000L, "video",
          AviCodec.encodeGray(vframes(id), 12, 12, bits = 8, topDown = true, extraChunk = true)))
        else Seq.empty
      val bumped =
        if (id % 68 == 0) Seq(Multimodal.MediaRow(id + 9000000L, "video",
          AviCodec.encodeGray(vframes(id, bump = 101), 12, 12)))
        else Seq.empty
      base +: (reEnc ++ bumped)
    } :+ Multimodal.MediaRow(999L, "image", Array[Byte](1, 2, 3)) // non-video drops out
    val media = spark.createDataset(rows)
    val got = Multimodal.videoNearPairs(media).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq

    val hashes = rows.collect {
      case m if m.media_type == "video" =>
        val Some((w, h, fr)) = AviCodec.decodeGray(m.data)
        (m.doc_id, Multimodal.videoHashBits(fr, w, h))
    }
    val want = (for {
      (ia, ha) <- hashes; (ib, hb) <- hashes if ia < ib
      d = ha.zip(hb).count { case (x, y) => x != y } if d <= 2
    } yield (ia, ib, d)).sortBy(p => (p._1, p._2))
    assert(got == want, s"probe join must equal brute force:\n got=$got\nwant=$want")
    srcs.filter(_ % 51 == 0).foreach { id =>
      assert(got.contains((id, id + 8000000L, 0)), s"re-containered twin of $id must be Hamming 0")
    }
    val bumpPairs = got.filter { case (a, b, _) => b == a + 9000000L }
    assert(bumpPairs.nonEmpty, "the perturbed twin must land within Hamming ≤ 2")
  }

  /** Gate-test frames: hash-mixed pixels (the noisyPcm rationale — the
    * near-pair fixture's structured definition shares block signatures
    * across srcs; the gate needs fingerprints that genuinely differ).
    */
  private def noisyFrames(src: Long): Array[Array[Int]] =
    Array.tabulate(18) { f =>
      Array.tabulate(144) { p =>
        val i = (f * 144 + p).toLong
        val h = (src * 2654435761L + i * 40503L) ^ (i * i * 97L)
        (((h % 256L) + 256L) % 256L).toInt
      }
    }

  test("video ingest gate: re-containered clips rejected, fresh clips admitted, lifecycle intact") {
    import spark.implicits._
    import graft.multimodal.{AviCodec, Multimodal, VideoHashIndex}
    val dir = java.nio.file.Files.createTempDirectory("graft-vididx").toString + "/idx"
    val resident = spark.createDataset((1L to 20L).map { i =>
      Multimodal.MediaRow(i, "video", AviCodec.encodeGray(noisyFrames(i * 17L), 12, 12))
    })
    VideoHashIndex.build(spark, resident, dir)
    val offers = spark.createDataset(Seq(
      // a re-container of resident 7 (8-bit, flipped rows, junk) → near_dup at 0
      Multimodal.MediaRow(101L, "video",
        AviCodec.encodeGray(noisyFrames(7L * 17L), 12, 12, bits = 8, topDown = true, extraChunk = true)),
      // fresh clip → ingested
      Multimodal.MediaRow(102L, "video", AviCodec.encodeGray(noisyFrames(88888L), 12, 12)),
      // undecodable payload passes through labeled
      Multimodal.MediaRow(103L, "video", "not an avi".getBytes)))
    val verdicts = VideoHashIndex.dedupIngest(spark, dir, offers)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(verdicts(101L) == "near_dup", s"re-container must be caught: $verdicts")
    assert(verdicts(102L) == "ingested")
    assert(verdicts(103L) == "undecodable")
    // the survivor is resident for the next batch; delete lets it back in
    val v2 = VideoHashIndex.dedupIngest(spark, dir, spark.createDataset(Seq(
        Multimodal.MediaRow(201L, "video", AviCodec.encodeGray(noisyFrames(88888L), 12, 12)))))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(v2(201L) == "near_dup")
    VideoHashIndex.delete(spark, dir, Seq(102L, 201L).toDF("doc_id"))
    VideoHashIndex.compact(spark, dir)
    val v3 = VideoHashIndex.dedupIngest(spark, dir, spark.createDataset(Seq(
        Multimodal.MediaRow(202L, "video", AviCodec.encodeGray(noisyFrames(88888L), 12, 12)))))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(v3(202L) == "ingested", "compacted takedown must re-admit the signal")
  }

  test("video shots: hard cuts segment, drift and brightness jumps do not, spans partition the frames") {
    import spark.implicits._
    import graft.multimodal.{AviCodec, Multimodal}
    def gradFrame(base: Int, drift: Int, flipX: Boolean): Array[Int] =
      Array.tabulate(144) { p =>
        val x = p % 12; val y = p / 12
        base + drift + (if (flipX) (11 - x) * 5 else x * 5) + y * 3
      }
    // doc 1: two hard cuts (gradient flips at frames 6 and 12)
    val cutFrames = Array.tabulate(18)(f => gradFrame(40, f % 4,
      flipX = f >= 6 && f < 12))
    // doc 2: single scene with per-frame drift AND a mid-video global
    // brightness jump — neither may segment (the mean-relative hash
    // ignores uniform shifts)
    val steady = Array.tabulate(18)(f => gradFrame(if (f < 9) 30 else 90, f % 4, flipX = false))
    val media = spark.createDataset(Seq(
      Multimodal.MediaRow(1L, "video", AviCodec.encodeGray(cutFrames, 12, 12)),
      Multimodal.MediaRow(2L, "video", AviCodec.encodeGray(steady, 12, 12)),
      Multimodal.MediaRow(3L, "video", "not a video".getBytes))) // drops out
    val shots = Multimodal.videoShots(media).collect()
      .groupBy(_.doc_id).view.mapValues(_.sortBy(_.shot_no)).toMap
    assert(shots(1L).map(s => (s.start_frame, s.end_frame)).toSeq ==
      Seq((0L, 5L), (6L, 11L), (12L, 17L)),
      s"hard cuts at 6 and 12 must yield exactly those spans: ${shots(1L).toSeq}")
    assert(shots(2L).map(s => (s.start_frame, s.end_frame)).toSeq == Seq((0L, 17L)),
      "drift and a global brightness jump must NOT cut a steady scene")
    assert(!shots.contains(3L))
    // spans partition the frame range with no overlap or gap
    shots(1L).sliding(2).foreach { case Array(a, b) =>
      assert(b.start_frame == a.end_frame + 1)
    }
    assert(shots(1L).map(_.n_frames).sum == 18L)
  }

  test("cross-modal still search: a video shot showing a corpus image surfaces; unrelated content does not") {
    import spark.implicits._
    import graft.multimodal.{AviCodec, Multimodal, PngCodec}
    // image 1 also appears as the MIDDLE shot of video 50; image 2 appears
    // in no video — its absence is the negative
    def pattern(src: Long): Array[Int] = Array.tabulate(144) { p =>
      ((src * 2654435761L + p.toLong * 40503L) % 256L + 256L).toInt % 256
    }
    def grad(flip: Boolean, f: Int): Array[Int] = Array.tabulate(144) { p =>
      val x = p % 12; val y = p / 12
      20 + (if (flip) (11 - x) * 5 else x * 5) + y * 3 + f % 4
    }
    val vidFrames = Array.tabulate(18) { f =>
      if (f >= 6 && f < 12) pattern(1L)
      else grad(f < 6, f)
    }
    val media = spark.createDataset(Seq(
      Multimodal.MediaRow(1L, "image", PngCodec.encodeGray(pattern(1L), 12, 12)),
      Multimodal.MediaRow(2L, "image", PngCodec.encodeGray(pattern(2L), 12, 12)),
      Multimodal.MediaRow(50L, "video", AviCodec.encodeGray(vidFrames, 12, 12))))
    val pairs = Multimodal.videoStillOfImagePairs(media).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    assert(pairs.contains((1L, 50L, 2L, 0)),
      s"the embedded image must surface as the video's shot 2 at Hamming 0: ${pairs.toSeq}")
    assert(!pairs.exists(_._1 == 2L), "the unembedded image must not match")
    // packed-id space violations fail LOUD, never misdecode: an id at the
    // keyframe base would masquerade as a keyframe in the modality filter
    val badId = spark.createDataset(Seq(
      Multimodal.MediaRow(500000000L, "image", PngCodec.encodeGray(pattern(3L), 12, 12)),
      Multimodal.MediaRow(50L, "video", AviCodec.encodeGray(vidFrames, 12, 12))))
    val ex = intercept[Exception] {
      Multimodal.videoStillOfImagePairs(badId).collect()
    }
    assert(ex.getMessage.contains("packed-id space violated") ||
      Option(ex.getCause).exists(_.getMessage.contains("packed-id space violated")),
      s"id-base violation must raise the guard, got: ${ex.getMessage}")
  }

  test("header decode: AVI bytes yield width/height/frames through extractMeta") {
    import spark.implicits._
    import graft.multimodal.AviCodec
    val avi = AviCodec.encodeGray(vframes(3L), 12, 12)
    val media = spark.createDataset(Seq(
      Multimodal.MediaRow(1L, "video", avi),
      Multimodal.MediaRow(2L, "video", "mystery codec".getBytes))) // → stub
    val metas = Multimodal.extractMeta(media).collect().map(m => m.doc_id -> m).toMap
    assert(metas(1L).width == 12 && metas(1L).height == 12 && metas(1L).frames == 18)
    val stub = new Multimodal.StubDecoder().decode("video", "mystery codec".getBytes)
    assert(metas(2L).frames == stub.frames, "unrecognized video falls back to the stub")
  }
}
