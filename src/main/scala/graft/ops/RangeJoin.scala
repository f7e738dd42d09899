package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval) join — match rows whose timestamps fall within a window
  * of each other. Spark plans a raw `a.key = b.key AND abs(a.t - b.t) <= w`
  * as an equi-join with the inequality as a post-filter, which is fine —
  * but when the window is small relative to the time span, bucketing the
  * time axis turns the band predicate into part of the JOIN KEY: each side
  * hashes to (key, t div w) and a left row probes only its own and the two
  * adjacent buckets. The shuffle then carries (key, bucket) — far better
  * key cardinality under hot join keys, and the per-task candidate set is
  * bounded by the bucket width instead of the key's full history.
  */
object RangeJoin {

  /** Pairs (left, right) with equal keys and |leftTs - rightTs| <= windowDays.
    * Each right row lands in one bucket; each left row probes buckets
    * {b-1, b, b+1}, which covers every possible in-window match exactly
    * once (no dedup needed).
    */
  def within(left: DataFrame, right: DataFrame,
      leftKey: Column, rightKey: Column, leftDate: Column, rightDate: Column,
      windowDays: Int): DataFrame = {
    val epoch = lit(java.sql.Date.valueOf("1970-01-01"))
    val lb = (datediff(leftDate, epoch) / windowDays).cast("long")
    val rb = (datediff(rightDate, epoch) / windowDays).cast("long")
    val probes = left
      .withColumn("__k", leftKey).withColumn("__lb", lb)
      .withColumn("__b", explode(array(col("__lb") - 1, col("__lb"), col("__lb") + 1)))
      .drop("__lb")
    val build = right.withColumn("__k", rightKey).withColumn("__b", rb)
    probes.join(build, Seq("__k", "__b"))
      .filter(abs(datediff(leftDate, rightDate)) <= windowDays)
      .drop("__k", "__b")
  }

  /** Oracle-checkable instance: events matched to same-customer orders
    * within 7 days of the derived in-era event time.
    */
  def eventsNearOrders(events: DataFrame, orders: DataFrame): DataFrame = {
    val e = events.select(col("event_id"), col("user_id"),
      date_add(lit(java.sql.Date.valueOf("1995-01-01")),
        (col("event_id") % 2400).cast("int")).as("evt_date"))
    val o = orders.groupBy(col("o_custkey"), col("o_orderdate"))
      .agg(max(col("o_orderkey")).as("o_orderkey"))
      .withColumn("o_date", col("o_orderdate").cast("date"))
    within(e, o,
      leftKey = col("user_id") + 1, rightKey = col("o_custkey"),
      leftDate = col("evt_date"), rightDate = col("o_date"), windowDays = 7)
      .select(col("event_id"), col("o_orderkey"),
        datediff(col("evt_date"), col("o_date")).cast("long").as("day_diff"))
      .orderBy(col("event_id"), col("o_orderkey"))
  }
}
