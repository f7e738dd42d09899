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
