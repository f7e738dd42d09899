package graft

import org.apache.spark.sql.functions._
import graft.ops.Par

/** The parallelism-seed guard: rebalance a too-narrow source, leave an
  * already-parallel one untouched (the real-corpus no-op path).
  */
class ParSpec extends SparkSpec {
  import spark.implicits._

  test("seed rebalances a single-split source to the cluster's slots") {
    val slots = spark.sparkContext.defaultParallelism
    val narrow = (1L to 100L).toDF("doc_id").coalesce(1)
    assert(narrow.rdd.getNumPartitions == 1)
    val seeded = Par.seed(narrow, col("doc_id"))
    assert(seeded.rdd.getNumPartitions == slots)
    // same rows, key-hashed layout (deterministic, not round-robin)
    assert(seeded.as[Long].collect().sorted.sameElements(1L to 100L))
  }

  test("seed is a no-op when the source already has enough splits") {
    val slots = spark.sparkContext.defaultParallelism
    val wide = (1L to 100L).toDF("doc_id").repartition(slots + 2)
    assert(Par.seed(wide, col("doc_id")) eq wide)
  }

  test("seed is identity on shuffle-derived inputs — no partition probe runs") {
    // A join-derived input arrives shuffle-partitioned; probing its RDD
    // under AQE would EXECUTE the join just to count partitions, so seed
    // must return it untouched without ever building the RDD.
    val a = (1L to 50L).toDF("doc_id")
    val joined = a.join(a.select(col("doc_id").as("doc_id")), "doc_id")
    assert(Par.seed(joined, col("doc_id")) eq joined)
    val agged = a.groupBy(col("doc_id")).count()
    assert(Par.seed(agged, col("doc_id")) eq agged)
  }
}
