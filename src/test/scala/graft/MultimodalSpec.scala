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
}
