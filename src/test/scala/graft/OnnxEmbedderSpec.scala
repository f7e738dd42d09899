package graft

import org.apache.spark.sql.functions._
import graft.vector.{IndexPipeline, OnnxEmbedder, PooledEmbedder}

/** The ONNX adapter seam — trait wiring, not inference (no ML runtime
  * ships in this sandbox, by design).
  */
class OnnxEmbedderSpec extends SparkSpec {

  test("availability reports the exact missing piece; load refuses cleanly") {
    // this sandbox has no onnxruntime on the classpath
    val noRuntime = OnnxEmbedder.availability("/nonexistent/model.onnx")
    assert(noRuntime.isLeft && noRuntime.swap.exists(_.contains("ONNX Runtime not on the classpath")))
    // even with a model file present, the runtime check comes first
    val f = java.nio.file.Files.createTempFile("graft-onnx", ".onnx")
    val withModel = OnnxEmbedder.availability(f.toString)
    assert(withModel.isLeft && withModel.swap.exists(_.contains("ONNX Runtime")))
    assert(OnnxEmbedder.load(f.toString).isLeft)
  }

  test("an adapter forced into existence still fails loudly, never silently") {
    val e = new OnnxEmbedder("/nonexistent/model.onnx", 384,
      OnnxEmbedder.whitespaceIdTokenizer)
    val t = intercept[IllegalStateException](e.embedText("some query"))
    assert(t.getMessage.contains("PooledEmbedder"), "the error must name the fallback")
    val c = intercept[IllegalStateException](e.embedCol(col("text")))
    assert(c.getMessage.contains("fallback"))
  }

  test("loadOrFallback returns the validated fallback with the reason; the full lifecycle runs on it") {
    import spark.implicits._
    // word-vector table for the pooled fallback
    val words = Tables.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("word")).distinct()
      .join(Tables.embeddings(spark, sf),
        abs(hash(col("word"))) % 1000 === col("vec_id") % 1000)
      .groupBy(col("word")).agg(first(col("embedding")).as("embedding"))
    val pooled = PooledEmbedder.fromDataFrame(words)
    val (embedder, reason) = OnnxEmbedder.loadOrFallback("/nonexistent/model.onnx", pooled)
    assert(reason.exists(_.contains("ONNX Runtime")))
    assert(embedder eq pooled, "absent runtime must hand back the supplied fallback")
    // the seam is drop-in: the whole index→search lifecycle runs on
    // whatever loadOrFallback returned
    val dir = java.nio.file.Files.createTempDirectory("graft-onnxfb").toString + "/idx"
    val docs = Tables.documents(spark, sf).limit(50)
    IndexPipeline.indexRecords(docs, "text", "document", dir,
      java.sql.Date.valueOf("2024-03-01"), embedder = embedder)
    val probe = docs.filter(col("doc_id") === 7L).select("text").head.getString(0)
    val hits = IndexPipeline.searchIndex(spark, dir, probe, k = 3,
      asOf = java.sql.Date.valueOf("2024-03-02"), embedder = embedder).collect()
    assert(hits.length == 3 && hits.head.getAs[Long]("rank") == 1L)
    assert(hits.head.getAs[String]("data_json").contains("\"doc_id\":7"))
  }

  test("the stand-in id tokenizer is deterministic and in-range") {
    val ids = OnnxEmbedder.whitespaceIdTokenizer("hello world  hello")
    assert(ids.length == 3 && ids(0) == ids(2))
    assert(ids.forall(i => i >= 0 && i < 30000))
  }
}
