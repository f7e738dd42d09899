package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — an operator the reference never needed but
  * any time-series/training-data engine does, and one Spark lacks natively.
  *
  * Implementation is the scale-correct compose-built-ins form (preference
  * (a) of the custom-operator ladder): tag both sides, union on
  * (key, time), and carry the right payload forward with a last-non-null
  * window. This costs ONE shuffle on the join key plus a per-key sort —
  * versus the naive `l.join(r, key && r.ts <= l.ts)` + groupBy-max whose
  * inequality join explodes quadratically per key. The union keeps both
  * sides co-partitioned at any cluster size; the Exchange is AQE
  * skew-splittable.
  *
  * Ties: a right row at exactly the left timestamp IS visible (sorted
  * before the left row via the side tag) — matching DuckDB ASOF JOIN's
  * `l.ts >= r.ts` semantics, which the oracle uses.
  */
object AsOfJoin {

  /** For each left row, attach the latest right payload with
    * `rightKey == leftKey` and `rightTs <= leftTs`. Right rows must be
    * unique per (key, ts) for a deterministic result. Payload columns are
    * returned as `asof_<name>`.
    */
  def asOf(left: DataFrame, right: DataFrame,
      leftKey: Column, rightKey: Column, leftTs: Column, rightTs: Column,
      payload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val lPart = left.select(
      Seq(leftKey.as("__k"), leftTs.as("__t"), lit(1).as("__side")) ++
        leftCols.map(col) ++
        payload.map(p => lit(null).cast(right.schema(p).dataType).as(s"asof_$p")): _*)
    val rPart = right.select(
      Seq(rightKey.as("__k"), rightTs.as("__t"), lit(0).as("__side")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        payload.map(p => col(p).as(s"asof_$p")): _*)
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, 0)
    lPart.unionByName(rPart)
      .select(
        Seq(col("__side")) ++ leftCols.map(col) ++
          payload.map(p => last(col(s"asof_$p"), ignoreNulls = true).over(w).as(s"asof_$p")): _*)
      .filter(col("__side") === 1)
      .drop("__side")
  }

  /** Oracle-checkable instance: each event looks up the customer's most
    * recent order as of a derived in-era event time.
    */
  def eventOrderAsOf(events: DataFrame, orders: DataFrame): DataFrame = {
    val e = events.select(col("event_id"), col("user_id"), col("event_type"),
      date_add(lit(java.sql.Date.valueOf("1995-01-01")),
        (col("event_id") % 2400).cast("int")).cast("timestamp").as("evt_ts"))
    val o = orders.groupBy(col("o_custkey"), col("o_orderdate"))
      .agg(max(col("o_orderkey")).as("o_orderkey"))
    asOf(e, o,
      leftKey = col("user_id") + 1, rightKey = col("o_custkey"),
      leftTs = col("evt_ts"), rightTs = col("o_orderdate"),
      payload = Seq("o_orderkey"))
      .select(col("event_id"), col("user_id"), col("event_type"),
        graft.functions.Num.tsS(col("evt_ts")).as("evt_ts"), col("asof_o_orderkey"))
      .orderBy(col("event_id"))
  }
}
