package graft

import org.apache.spark.sql.functions._
import graft.sources.CorpusIO

class CorpusIOSpec extends SparkSpec {

  test("documents round-trip through partitioned gzip JSONL exactly") {
    val docs = Tables.documents(spark, sf)
    val dir = java.nio.file.Files.createTempDirectory("graft-jsonl").toString + "/docs"
    CorpusIO.writeDocumentsJsonl(docs, dir)
    // layout: one directory per source, gzip'd part files inside
    val parts = new java.io.File(dir).listFiles().filter(_.isDirectory).map(_.getName)
    assert(parts.nonEmpty && parts.forall(_.startsWith("source=")))
    val back = CorpusIO.readDocumentsJsonl(spark, dir)
    assert(back.schema.fieldNames.toSeq ==
      Seq("doc_id", "text", "lang", "source", "n_chars"))
    val a = docs.orderBy("doc_id").collect().map(_.toSeq)
    val b = back.orderBy("doc_id").collect().map(_.toSeq)
    assert(a.length == b.length)
    a.zip(b).foreach { case (x, y) => assert(x == y) }
  }

  test("source partition pruning reaches the JSONL scan") {
    val docs = Tables.documents(spark, sf)
    val dir = java.nio.file.Files.createTempDirectory("graft-jsonl2").toString + "/docs"
    CorpusIO.writeDocumentsJsonl(docs, dir)
    val pruned = CorpusIO.readDocumentsJsonl(spark, dir).filter(col("source") === "src1")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("source"),
      s"expected partition filters on source:\n${plan.take(600)}")
    assert(pruned.count() == docs.filter(col("source") === "src1").count())
  }

  test("permissive JSONL read quarantines corrupt lines instead of failing") {
    val dir = java.nio.file.Files.createTempDirectory("graft-jsonl-bad").toString
    val f = new java.io.PrintWriter(s"$dir/part-0.json")
    f.println("""{"doc_id": 1, "text": "good row", "lang": "en", "n_chars": 8}""")
    f.println("""{"doc_id": 2, "text": "also fine", "lang": "en", "n_chars": 9}""")
    f.println("""{"doc_id": 3, "text": "truncated""") // malformed JSON
    f.println("""not json at all""")
    f.close()
    val (clean, corrupt) = CorpusIO.readDocumentsJsonlPermissive(spark, dir)
    assert(clean.collect().map(_.getAs[Long]("doc_id")).sorted.sameElements(Array(1L, 2L)))
    val bad = corrupt.collect().map(_.getString(0))
    assert(bad.length == 2)
    assert(bad.exists(_.contains("truncated")) && bad.exists(_.contains("not json")))
  }

  test("binary media columns survive the explicit-base64 JSONL contract") {
    import spark.implicits._
    val media = graft.multimodal.Multimodal.deriveMedia(
      Tables.documents(spark, sf).limit(20)).toDF()
    val dir = java.nio.file.Files.createTempDirectory("graft-jsonl3").toString + "/media"
    CorpusIO.writeMediaJsonl(media, dir)
    val back = CorpusIO.readMediaJsonl(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Array[Byte]]("data")).toMap
    val orig = media.collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Array[Byte]]("data")).toMap
    assert(back.keySet == orig.keySet)
    orig.foreach { case (id, bytes) => assert(back(id).sameElements(bytes)) }
  }

  test("CSV side input round-trips with explicit schema") {
    import org.apache.spark.sql.types._
    val nation = Tables.nation(spark, sf)
    val dir = java.nio.file.Files.createTempDirectory("graft-csv").toString + "/nation"
    CorpusIO.writeCsv(nation, dir)
    val schema = StructType(Seq(
      StructField("n_nationkey", IntegerType), StructField("n_name", StringType),
      StructField("n_regionkey", IntegerType), StructField("n_comment", StringType)))
    val back = CorpusIO.readCsv(spark, dir, schema)
    assert(back.count() == nation.count())
    val a = nation.select("n_nationkey", "n_name").orderBy("n_nationkey")
      .collect().map(r => (r.getInt(0), r.getString(1)))
    val b = back.select("n_nationkey", "n_name").orderBy("n_nationkey")
      .collect().map(r => (r.getInt(0), r.getString(1)))
    assert(a.sameElements(b))
  }

  test("compacted parquet sink: skewed partitions neither explode into small files nor stay giant") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // Pathological upstream: 64 partitions for 1200 rows (small-file bait)
    // where one partition also dwarfs the rest (skew bait).
    val skewed = (1L to 1200L).toDF("id")
      .repartition(64, (col("id") === 1L).cast("int")) // all rows land in ~1 of 64 slots
    val dir = java.nio.file.Files.createTempDirectory("graft-compact").toString + "/out"
    val n = CorpusIO.writeCompactedParquet(skewed, dir, maxRecordsPerFile = 400L)
    assert(n == 1200L)
    val files = new java.io.File(dir).listFiles
      .filter(f => f.getName.endsWith(".parquet")).toSeq
    // 1200 rows / 400-cap => at least 3 files (no giant file), and far
    // fewer than the 64 empty-partition shards the upstream would write.
    assert(files.size >= 3 && files.size <= 16,
      s"expected 3..16 compacted files, got ${files.size}")
    assert(spark.read.parquet(dir).count() == 1200L)
  }
}
