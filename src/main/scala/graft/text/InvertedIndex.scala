package graft.text

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted inverted index — the at-scale serving path for term search.
  * The scan-based family (`TextAnalysis.searchDocs`/`tfidfSearch`/
  * `bm25Search`) re-reads the corpus per query: right when queries are
  * rare and the corpus is cold, wrong for a serving workload. This index
  * persists posting lists ONCE; a query then reads only the directories
  * its terms hash into — corpus-size-independent query cost, the Lucene
  * segment idea re-expressed as a partitioned columnar layout.
  *
  * Layout on disk:
  *   path/postings — (term, doc_id, source, tf), partitioned by
  *                   `bucket = pmod(hash(term), nBuckets)`. Directory-
  *                   level partition pruning means a query scans only its
  *                   terms' buckets (~vocab/nBuckets of the postings per
  *                   term), and the in-bucket `term` predicate pushes to
  *                   parquet row groups. At cluster scale the postings
  *                   within a bucket would additionally sort by term so
  *                   footer min/max prunes row groups exactly.
  *   path/meta     — (n_buckets, n_docs): the hash modulus queries must
  *                   reuse, plus the corpus size for idf-style weighting.
  *
  * Build cost: one explode + one (term, doc) aggregation — the same
  * vocabulary-keyed shuffle shape as `heavyHitters`, amortized over every
  * future query. Query cost: pruned scan + one doc-keyed aggregation over
  * the matched postings only (AND-semantics prune first), then a native
  * bounded top-k. No corpus scan anywhere at query time.
  */
object InvertedIndex {

  /** Tokenize, count, and persist the posting lists. */
  def build(spark: SparkSession, docs: DataFrame, path: String,
      nBuckets: Int = 64): Unit = {
    require(nBuckets > 0, "nBuckets must be positive")
    val postings = graft.ops.Par.seed(docs, col("doc_id"))
      .select(col("doc_id"), col("source"), explode(split(col("text"), " ")).as("term"))
      .groupBy(col("term"), col("doc_id"), col("source"))
      .agg(count(lit(1)).as("tf"))
      .withColumn("bucket", pmod(hash(col("term")), lit(nBuckets)))
    postings.write.mode(SaveMode.Overwrite).partitionBy("bucket")
      .parquet(s"$path/postings")
    val nDocs = docs.count()
    spark.range(1).select(lit(nBuckets).as("n_buckets"), lit(nDocs).as("n_docs"))
      .write.mode(SaveMode.Overwrite).parquet(s"$path/meta")
  }

  private def meta(spark: SparkSession, path: String): (Int, Long) = {
    val row = spark.read.parquet(s"$path/meta").head()
    (row.getAs[Int]("n_buckets"), row.getAs[Long]("n_docs"))
  }

  /** The bucket a term's postings live in — computed with the SAME
    * Murmur3 the build used, via a literal fold of Spark's own `hash`
    * expression so build and query can never disagree on the modulus
    * placement.
    */
  private def termBuckets(spark: SparkSession, terms: Seq[String],
      nBuckets: Int): Map[String, Int] = {
    import spark.implicits._
    terms.toDF("term")
      .select(col("term"), pmod(hash(col("term")), lit(nBuckets)).as("bucket"))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
  }

  /** Conjunctive term search served from the index: same contract and
    * ranking as `TextAnalysis.searchDocs` — docs containing EVERY term,
    * ranked by summed tf with doc_id tie-break — but reading posting
    * buckets instead of the corpus. Partition pruning on `bucket` is the
    * scale property (pinned by `InvertedIndexSpec`'s plan assert).
    */
  def search(spark: SparkSession, path: String, terms: Seq[String],
      k: Int = 20): DataFrame = {
    require(terms.nonEmpty, "need at least one term")
    val distinctTerms = terms.distinct
    val (nBuckets, _) = meta(spark, path)
    val buckets = termBuckets(spark, distinctTerms, nBuckets).values.toSeq.distinct
    spark.read.parquet(s"$path/postings")
      .filter(col("bucket").isin(buckets: _*) && col("term").isin(distinctTerms: _*))
      .groupBy(col("doc_id"), col("source"))
      .agg(count(lit(1)).as("n_matched"), sum(col("tf")).as("total_tf"))
      .filter(col("n_matched") === distinctTerms.size)
      .select(col("doc_id"), col("source"), col("total_tf"))
      .orderBy(col("total_tf").desc, col("doc_id"))
      .limit(k)
  }

  /** Document frequencies served from the index for a term list — the
    * idf building block; reads only the terms' buckets.
    */
  def docFreq(spark: SparkSession, path: String, terms: Seq[String]): DataFrame = {
    require(terms.nonEmpty, "need at least one term")
    val distinctTerms = terms.distinct
    val (nBuckets, _) = meta(spark, path)
    val buckets = termBuckets(spark, distinctTerms, nBuckets).values.toSeq.distinct
    spark.read.parquet(s"$path/postings")
      .filter(col("bucket").isin(buckets: _*) && col("term").isin(distinctTerms: _*))
      .groupBy(col("term"))
      .agg(count(lit(1)).as("df"), sum(col("tf")).as("total_tf"))
      .orderBy(col("term"))
  }
}
