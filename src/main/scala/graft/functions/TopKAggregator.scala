package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Typed top-k aggregator (SURVEY.md §2.11 "Top-k UDAF"): keeps a bounded
  * buffer of the k best (value desc, id asc) pairs per group instead of
  * sorting the whole group — the map-side-combining form of the
  * reference's per-index top-k + merge (`faiss_manager.py:254-291`). The
  * buffer is at most 2k elements on every executor, so group skew cannot
  * blow memory, and partial aggregation cuts the shuffle to k rows per
  * (partition, key).
  *
  * Pruning is amortized: append until the buffer hits 2k, then one
  * sort+take(k) — O(log k) amortized per row instead of the naive
  * O(k log k) per-row re-sort.
  */
case class ScoredId(value: Double, id: Long)

class TopKByValue(k: Int) extends Aggregator[ScoredId, Seq[ScoredId], Seq[ScoredId]] {
  import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
  private val ord: Ordering[ScoredId] = Ordering.by(s => (-s.value, s.id))
  private def prune(buf: Seq[ScoredId]): Seq[ScoredId] =
    if (buf.size >= 2 * k) buf.sorted(ord).take(k) else buf

  override def zero: Seq[ScoredId] = Seq.empty
  override def reduce(buf: Seq[ScoredId], a: ScoredId): Seq[ScoredId] = prune(buf :+ a)
  override def merge(a: Seq[ScoredId], b: Seq[ScoredId]): Seq[ScoredId] = prune(a ++ b)
  override def finish(buf: Seq[ScoredId]): Seq[ScoredId] = buf.sorted(ord).take(k)
  override def bufferEncoder: Encoder[Seq[ScoredId]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[ScoredId]] = ExpressionEncoder()
}

/** Bounded earliest-k rows per group, ordered (ts asc, id asc) — the
  * association fan-out cap (reference `clients/company_client.py:97`:
  * limit=500 engagements per company) WITHOUT the full per-group window
  * sort: a hot company with 10^8 engagements costs each executor at most a
  * 2k-element buffer, and the map-side partial aggregation means at most k
  * rows per (partition, company) ever reach the shuffle.
  */
case class EngRow(ts: java.sql.Timestamp, engagement_id: Long, etype: String, content: String)

class EarliestKEngagements(k: Int) extends Aggregator[EngRow, Seq[EngRow], Seq[EngRow]] {
  import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
  private val ord: Ordering[EngRow] = Ordering.by(e => (e.ts.getTime, e.engagement_id))
  private def prune(buf: Seq[EngRow]): Seq[EngRow] =
    if (buf.size >= 2 * k) buf.sorted(ord).take(k) else buf

  override def zero: Seq[EngRow] = Seq.empty
  override def reduce(buf: Seq[EngRow], a: EngRow): Seq[EngRow] = prune(buf :+ a)
  override def merge(a: Seq[EngRow], b: Seq[EngRow]): Seq[EngRow] = prune(a ++ b)
  override def finish(buf: Seq[EngRow]): Seq[EngRow] = buf.sorted(ord).take(k)
  override def bufferEncoder: Encoder[Seq[EngRow]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[EngRow]] = ExpressionEncoder()
}

object TopKAggregator {
  import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder

  /** Top-k events per user as flat ranked rows. */
  def topEventsPerUser(events: DataFrame, k: Int = 3): DataFrame = {
    val topk: org.apache.spark.sql.expressions.UserDefinedFunction =
      udaf(new TopKByValue(k), ExpressionEncoder[ScoredId]())
    events
      .groupBy(col("user_id"))
      .agg(topk(col("value"), col("event_id")).as("top"))
      .select(col("user_id"), posexplode(col("top")))
      .select(col("user_id"), (col("pos") + 1).cast("long").as("rank"),
        col("col.id").as("event_id"), col("col.value").as("value"))
      .orderBy(col("user_id"), col("rank"))
  }

  /** Cap a group's fan-out to the k earliest rows. Input columns must be
    * (ts, engagement_id, etype, content) in EngRow field order.
    */
  def earliestKUdaf(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(new EarliestKEngagements(k), ExpressionEncoder[EngRow]())
}
