package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Partitioning patterns for the 100 TB tier — the pieces that do not show
  * up in small-scale correctness but decide whether a plan survives a
  * 1000-executor cluster.
  */
object ScalePatterns {

  /** Bucketed co-located join: persist both fact tables bucketed+sorted on
    * the join key, and the subsequent join needs NO Exchange — the classic
    * answer to "this fact-fact join shuffles 100 TB every run". Returns the
    * joined frame read back from the bucketed tables.
    */
  def bucketedOrdersLineitem(spark: SparkSession, orders: DataFrame,
      lineitem: DataFrame, buckets: Int = 8): DataFrame = {
    orders.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("graft_orders_b")
    lineitem.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("graft_lineitem_b")
    spark.table("graft_lineitem_b")
      .join(spark.table("graft_orders_b"), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_items"), sum(col("l_quantity")).as("sum_qty"))
  }

  /** Salted two-phase aggregation: when one group key carries a hot spot,
    * pre-aggregate on (key, salt) so every reducer sees at most
    * 1/`salts` of the hot key's rows, then combine. Equivalent result,
    * bounded per-task state. (For joins the analog is AQE skew-split,
    * enabled in our session configs.)
    */
  def saltedSum(df: DataFrame, key: String, value: String, salts: Int = 16): DataFrame =
    df.withColumn("__salt", pmod(hash(col(value)), lit(salts)))
      .groupBy(col(key), col("__salt"))
      .agg(sum(col(value)).as("partial"), count(lit(1)).as("pn"))
      .groupBy(col(key))
      .agg(sum(col("partial")).as(s"sum_$value"), sum(col("pn")).as("n_rows"))
}
