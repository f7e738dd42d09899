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
