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
}
