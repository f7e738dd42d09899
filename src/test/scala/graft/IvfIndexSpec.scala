package graft

import org.apache.spark.sql.functions._
import graft.vector.IvfIndex
import graft.ops.Similarity

class IvfIndexSpec extends SparkSpec {

  test("physical IVF search equals the logical ivfSearch results") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf").toString + "/ivf"
    val emb = Tables.embeddings(spark, sf)
    IvfIndex.build(spark, emb, dir)
    val qv = emb.filter(col("vec_id") === 0L).select("embedding").head.getSeq[Float](0)
    val physical = IvfIndex.search(spark, dir, qv).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Double]("dist_sq"))).toSeq
    val logical = Similarity.ivfSearch(emb).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Double]("dist_sq"))).toSeq
    assert(physical == logical)
  }

  test("probe scan is partition-pruned to the probed cells") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf2").toString + "/ivf"
    val emb = Tables.embeddings(spark, sf)
    IvfIndex.build(spark, emb, dir)
    val qv = emb.filter(col("vec_id") === 0L).select("embedding").head.getSeq[Float](0)
    val probed = spark.read.parquet(s"$dir/centroids")
      .withColumn("qd2", graft.functions.VectorFunctions.l2Sq(col("c_embedding"),
        lit(qv.toArray)))
      .orderBy(col("qd2"), col("cid")).limit(2).select("cid")
      .collect().map(_.getLong(0))
    val df = spark.read.parquet(s"$dir/vectors").filter(col("cell").isin(probed: _*))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cell"),
      s"expected partition filters on cell:\n$plan")
    // and the pruned scan reads only the probed cells' rows
    val cells = df.select(col("cell").cast("long")).distinct().collect().map(_.getLong(0)).toSet
    assert(cells == probed.toSet)
  }
}
