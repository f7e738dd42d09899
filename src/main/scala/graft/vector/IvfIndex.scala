package graft.vector

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

/** Physical IVF index: the at-scale layout behind ops.Similarity.ivfSearch.
  *
  * Build assigns every vector to its nearest coarse centroid and writes the
  * corpus partitioned by `cell`, plus a tiny centroids sidecar. Search
  * embeds the probe, ranks centroids driver-side (the sidecar is a few KB),
  * and scans ONLY the probed cell directories — Catalyst partition pruning
  * on disk, so a query touches nProbe/nCells of a 100 TB corpus instead of
  * all of it. Brute force inside the probed cells reuses the codegen'd L2
  * expression.
  */
object IvfIndex {

  /** Deterministic seed centroids (first `nCells` vectors by id — k-means
    * would drop in here without changing the layout or the read path).
    */
  def build(spark: SparkSession, embeddings: DataFrame, path: String,
      nCells: Int = 8): Unit = {
    val centroids = embeddings.filter(col("vec_id") < nCells)
      .select(col("vec_id").as("cid"), col("embedding").as("c_embedding"))
    centroids.coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$path/centroids")
    val byVec = org.apache.spark.sql.expressions.Window
      .partitionBy(col("vec_id")).orderBy(col("cd2"), col("cid"))
    embeddings
      .crossJoin(broadcast(centroids))
      .withColumn("cd2", l2Sq(col("embedding"), col("c_embedding")))
      .withColumn("arn", row_number().over(byVec))
      .filter(col("arn") === 1)
      .select(col("vec_id"), col("label"), col("embedding"), col("cid").as("cell"))
      .write.mode(SaveMode.Overwrite).partitionBy("cell").parquet(s"$path/vectors")
  }

  /** Probe: rank cells against the tiny sidecar, scan only those partitions. */
  def search(spark: SparkSession, path: String, query: Seq[Float],
      k: Int = 10, nProbe: Int = 2): DataFrame = {
    val q = lit(query.toArray)
    val probed = spark.read.parquet(s"$path/centroids")
      .withColumn("qd2", l2Sq(col("c_embedding"), q))
      .orderBy(col("qd2"), col("cid"))
      .limit(nProbe)
      .select(col("cid")).collect().map(_.getLong(0))
    spark.read.parquet(s"$path/vectors")
      .filter(col("cell").isin(probed: _*)) // partition pruning: only probed dirs read
      .withColumn("d2", l2Sq(col("embedding"), q))
      .orderBy(col("d2"), col("vec_id"))
      .limit(k)
      .select(col("vec_id"), col("label"), col("cell").cast("long").as("cid"),
        col("d2").as("dist_sq"))
  }
}
