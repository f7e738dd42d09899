package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Typed top-k aggregator (SURVEY.md §2.11 "Top-k UDAF"): keeps a bounded
  * buffer of the k best (value desc, id asc) pairs per group instead of
  * sorting the whole group — the map-side-combining form of the
  * reference's per-index top-k + merge (`faiss_manager.py:254-291`). The
  * buffer is at most k elements on every executor, so group skew cannot
  * blow memory, and partial aggregation cuts the shuffle to k rows per
  * (partition, key).
  */
case class ScoredId(value: Double, id: Long)

class TopKByValue(k: Int) extends Aggregator[ScoredId, Seq[ScoredId], Seq[ScoredId]] {
  import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
  private val ord: Ordering[ScoredId] = Ordering.by(s => (-s.value, s.id))

  override def zero: Seq[ScoredId] = Seq.empty
  override def reduce(buf: Seq[ScoredId], a: ScoredId): Seq[ScoredId] =
    (buf :+ a).sorted(ord).take(k)
  override def merge(a: Seq[ScoredId], b: Seq[ScoredId]): Seq[ScoredId] =
    (a ++ b).sorted(ord).take(k)
  override def finish(buf: Seq[ScoredId]): Seq[ScoredId] = buf.sorted(ord)
  override def bufferEncoder: Encoder[Seq[ScoredId]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[ScoredId]] = ExpressionEncoder()
}

object TopKAggregator {
  /** Top-k events per user as flat ranked rows. */
  def topEventsPerUser(events: DataFrame, k: Int = 3): DataFrame = {
    import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
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
}
