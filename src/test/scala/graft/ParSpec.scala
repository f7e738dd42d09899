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
}
