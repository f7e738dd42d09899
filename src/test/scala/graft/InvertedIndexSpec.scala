package graft

import org.apache.spark.sql.functions._
import graft.text.InvertedIndex
import graft.ops.TextAnalysis

/** Persisted inverted index: the index-served search must reproduce the
  * scan-based definition exactly, and the query plan must partition-prune
  * to the query terms' buckets (the corpus-size-independence claim).
  */
class InvertedIndexSpec extends SparkSpec {

  private lazy val indexDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-invidx-spec").toString + "/idx"
    InvertedIndex.build(spark, Tables.documents(spark, sf), dir, nBuckets = 16)
    dir
  }

  test("posting writes are file-bounded: one file per bucket directory from a multi-task writer") {
    val dir = java.nio.file.Files.createTempDirectory("graft-invidx-files").toString + "/idx"
    InvertedIndex.build(spark, Tables.documents(spark, sf).repartition(16), dir, nBuckets = 16)
    val bucketDirs = new java.io.File(s"$dir/postings").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("bucket="))
    assert(bucketDirs.nonEmpty)
    bucketDirs.foreach { d =>
      val n = d.listFiles().count(_.getName.endsWith(".parquet"))
      // exactly one at this scale; at corpus scale maxRecordsPerFile rolls
      // a hot bucket into more (bounded-SIZE, not unbounded-count)
      assert(n == 1, s"$d holds $n files — expected one per bucket below the roll size")
    }
  }

  test("index-served search equals the scan-based definition on several term sets") {
    val docs = Tables.documents(spark, sf)
    for (terms <- Seq(Seq("spark", "join"), Seq("table"), Seq("fast", "table", "scan"))) {
      val served = InvertedIndex.search(spark, indexDir, terms, k = 50).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
      val scanned = TextAnalysis.searchDocs(docs, terms, k = 50).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
      assert(served == scanned, s"terms=$terms")
    }
  }

  test("query scans ONLY the terms' posting buckets (partition pruning pinned)") {
    val q = InvertedIndex.search(spark, indexDir, Seq("spark", "join"), k = 10)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("bucket"),
      s"expected bucket partition pruning in:\n$plan")
    assert(!plan.contains("PartitionFilters: []"),
      "bucket filter did not reach the scan — query would read every posting bucket")
  }

  test("unknown term conjunction is empty; duplicate query terms collapse") {
    assert(InvertedIndex.search(spark, indexDir, Seq("nosuchtermxyz", "table")).count() == 0L)
    val dup = InvertedIndex.search(spark, indexDir, Seq("table", "table"), k = 20).collect()
    val single = InvertedIndex.search(spark, indexDir, Seq("table"), k = 20).collect()
    assert(dup.map(_.toString).toSeq == single.map(_.toString).toSeq)
  }

  test("appendBatch: incremental postings equal a from-scratch build (no resident rewrite)") {
    val docs = Tables.documents(spark, sf)
    val first = docs.filter(col("doc_id") % 2 === 0)
    val rest = docs.filter(col("doc_id") % 2 =!= 0)
    val incDir = java.nio.file.Files.createTempDirectory("graft-invidx-inc").toString + "/idx"
    InvertedIndex.build(spark, first, incDir, nBuckets = 16)
    InvertedIndex.appendBatch(spark, rest, incDir)
    for (terms <- Seq(Seq("spark", "join"), Seq("table"))) {
      val inc = InvertedIndex.search(spark, incDir, terms, k = 50).collect().map(_.toString).toSeq
      val full = InvertedIndex.search(spark, indexDir, terms, k = 50).collect().map(_.toString).toSeq
      assert(inc == full, s"terms=$terms")
    }
    val incDf = InvertedIndex.docFreq(spark, incDir, Seq("spark", "merge")).collect().map(_.toString).toSeq
    val fullDf = InvertedIndex.docFreq(spark, indexDir, Seq("spark", "merge")).collect().map(_.toString).toSeq
    assert(incDf == fullDf)
  }

  test("appendBatch fails fast on an already-indexed doc_id (replay gate)") {
    val docs = Tables.documents(spark, sf)
    val dir = java.nio.file.Files.createTempDirectory("graft-invidx-gate").toString + "/idx"
    InvertedIndex.build(spark, docs.limit(50), dir, nBuckets = 8)
    val err = intercept[IllegalArgumentException] {
      InvertedIndex.appendBatch(spark, docs.limit(10), dir)
    }
    assert(err.getMessage.contains("already indexed"))
  }

  test("index-served BM25 is bitwise-equal to the scan-based form") {
    val docs = Tables.documents(spark, sf)
    for (terms <- Seq(Seq("spark", "join"), Seq("table", "spark"), Seq("merge"))) {
      val served = InvertedIndex.bm25(spark, indexDir, terms, k = 30).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
      val scanned = TextAnalysis.bm25Search(docs, terms, k = 30).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
      assert(served == scanned, s"terms=$terms")
    }
  }

  test("tombstones: deletes leave search/df/BM25 immediately; compact folds the log and frees ids") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
    val dir = java.nio.file.Files.createTempDirectory("graft-invidx-del").toString + "/idx"
    InvertedIndex.build(spark, docs, dir, nBuckets = 16)
    val delIds = InvertedIndex.search(spark, dir, Seq("table"), k = 3)
      .collect().map(_.getLong(0)).toSeq
    InvertedIndex.delete(spark, dir, delIds.toDF("doc_id"))
    val live = docs.join(delIds.toDF("doc_id"), Seq("doc_id"), "left_anti")
    // search over the index ≡ scan over the live corpus
    val served = InvertedIndex.search(spark, dir, Seq("table"), k = 50)
      .collect().map(_.toString).toSeq
    val scanned = TextAnalysis.searchDocs(live, Seq("table"), k = 50)
      .collect().map(_.toString).toSeq
    assert(served == scanned)
    assert(!served.exists(s => delIds.exists(id => s.startsWith(s"[$id,"))))
    // BM25 stays BITWISE equal to the scan over the live corpus
    val bmServed = InvertedIndex.bm25(spark, dir, Seq("table", "spark"), k = 30)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
    val bmScanned = TextAnalysis.bm25Search(live, Seq("table", "spark"), k = 30)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
    assert(bmServed == bmScanned)
    // a tombstoned-but-uncompacted id is still burned for appends
    intercept[IllegalArgumentException] {
      InvertedIndex.appendBatch(spark,
        docs.filter(col("doc_id") === delIds.head), dir)
    }
    // compaction: identical results, log gone, freed ids re-appendable
    InvertedIndex.compact(spark, dir)
    val afterCompact = InvertedIndex.search(spark, dir, Seq("table"), k = 50)
      .collect().map(_.toString).toSeq
    assert(afterCompact == served)
    assert(!new java.io.File(s"$dir/tombstones").exists())
    InvertedIndex.appendBatch(spark,
      docs.filter(col("doc_id") === delIds.head), dir)
    val back = InvertedIndex.search(spark, dir, Seq("table"), k = 100000)
      .collect().map(_.getLong(0)).toSet
    assert(back.contains(delIds.head), "the replaced doc must be searchable again")
  }

  test("docFreq matches direct corpus counts") {
    val docs = Tables.documents(spark, sf)
    val got = InvertedIndex.docFreq(spark, indexDir, Seq("spark", "merge")).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val direct = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .filter(col("term").isin("spark", "merge"))
      .groupBy(col("term"))
      .agg(countDistinct(col("doc_id")).as("df"), count(lit(1)).as("tt"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == direct)
  }
}
