package graft

import org.apache.spark.sql.functions._
import graft.ops.AsOfJoin
import graft.functions.TopKAggregator

class AsOfJoinSpec extends SparkSpec {

  test("as-of picks the latest right row at or before the left timestamp") {
    import spark.implicits._
    val left = Seq((1L, 100L), (1L, 205L), (2L, 50L))
      .toDF("k", "t").withColumn("t", col("t").cast("timestamp"))
    val right = Seq((1L, 100L, "a"), (1L, 200L, "b"), (1L, 300L, "c"), (2L, 60L, "z"))
      .toDF("rk", "rt", "tag").withColumn("rt", col("rt").cast("timestamp"))
    val out = AsOfJoin.asOf(left, right, col("k"), col("rk"), col("t"), col("rt"), Seq("tag"))
      .orderBy(col("k"), col("t")).collect()
    // equal timestamps match (>= semantics); future right rows are invisible
    assert(out.map(_.getAs[String]("asof_tag")).toSeq == Seq("a", "b", null))
  }

  test("as-of join is stable under repartitioning (single-shuffle impl)") {
    val e = Tables.events(spark, sf)
    val o = Tables.orders(spark, sf)
    val a = AsOfJoin.eventOrderAsOf(e, o).collect().map(r =>
      (r.getAs[Long]("event_id"), r.getAs[Any]("asof_o_orderkey"))).toSeq
    val b = AsOfJoin.eventOrderAsOf(e.repartition(7), o.repartition(5)).collect().map(r =>
      (r.getAs[Long]("event_id"), r.getAs[Any]("asof_o_orderkey"))).toSeq
    assert(a == b)
  }

  test("bucketed range join equals the naive inequality join") {
    val e = Tables.events(spark, sf)
    val o = Tables.orders(spark, sf)
    val bucketed = graft.ops.RangeJoin.eventsNearOrders(e, o).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // naive formulation: equi-join on key, inequality as a filter
    val ev = e.select(col("event_id"), col("user_id"),
      date_add(lit(java.sql.Date.valueOf("1995-01-01")),
        (col("event_id") % 2400).cast("int")).as("evt_date"))
    val od = o.groupBy(col("o_custkey"), col("o_orderdate"))
      .agg(max(col("o_orderkey")).as("o_orderkey"))
      .withColumn("o_date", col("o_orderdate").cast("date"))
    val naive = ev.join(od, ev("user_id") + 1 === od("o_custkey") &&
        abs(datediff(col("evt_date"), col("o_date"))) <= 7)
      .select(col("event_id"), col("o_orderkey"),
        datediff(col("evt_date"), col("o_date")).cast("long")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(bucketed == naive)
  }

  test("top-k aggregator equals the window formulation") {
    import org.apache.spark.sql.expressions.Window
    val e = Tables.events(spark, sf)
    val viaAgg = TopKAggregator.topEventsPerUser(e, 3).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("rank"), r.getAs[Long]("event_id")))
    val viaWindow = e.withColumn("rank",
        row_number().over(Window.partitionBy(col("user_id"))
          .orderBy(col("value").desc, col("event_id"))).cast("long"))
      .filter(col("rank") <= 3)
      .orderBy(col("user_id"), col("rank")).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("rank"), r.getAs[Long]("event_id")))
    assert(viaAgg.toSeq == viaWindow.toSeq)
  }
}
