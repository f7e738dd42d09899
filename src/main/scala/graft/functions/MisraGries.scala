package graft.functions

import org.apache.spark.sql.{DataFrame, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Mergeable Misra–Gries heavy-hitters sketch (Misra & Gries, "Finding
  * repeated elements", 1982; distributed merge rule from Agarwal et al.,
  * "Mergeable Summaries", PODS 2012): each partial state holds at most
  * `capacity` counters regardless of key cardinality, so a 100-TB key
  * space that could never shuffle a full word-count table still
  * aggregates in one pass with constant executor memory.
  *
  * Guarantees over n processed tokens, preserved by ANY reduce/merge
  * tree (the mergeable-summaries property):
  *  - superset: every word with true count > n/(capacity+1) is present;
  *  - one-sided error: reported ≤ true, undercount ≤ n/(capacity+1);
  *  - when distinct keys ≤ capacity, the sketch IS the exact count (no
  *    eviction ever fires).
  *
  * The surviving candidate SET is processing-order-dependent below the
  * guarantee threshold (like every sketch), so the sketch is
  * spec-asserted against its exact twin (`TextAnalysis.heavyHitters`)
  * rather than oracle-hashed — the `ev_approx_*` contract.
  */
class MisraGries(capacity: Int) extends Aggregator[String, Map[String, Long], Map[String, Long]] {
  import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
  require(capacity >= 1, "capacity must be positive")

  override def zero: Map[String, Long] = Map.empty

  override def reduce(st: Map[String, Long], w: String): Map[String, Long] =
    st.get(w) match {
      case Some(c) => st.updated(w, c + 1L)
      case None if st.size < capacity => st.updated(w, 1L)
      // Table full: the classic step — decrement every counter, discard
      // the arriving token; (capacity+1) units of weight leave together,
      // which is where the n/(capacity+1) bound comes from.
      case None => st.collect { case (k, v) if v > 1L => k -> (v - 1L) }
    }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val summed = b.foldLeft(a) { case (m, (k, v)) => m.updated(k, m.getOrElse(k, 0L) + v) }
    if (summed.size <= capacity) summed
    else {
      // Subtract the (capacity+1)-th largest count from everything and
      // drop the non-positive — the PODS'12 merge that keeps the summed
      // error within the same n/(capacity+1) bound.
      val d = summed.values.toIndexedSeq.sorted(Ordering[Long].reverse)(capacity)
      summed.collect { case (k, v) if v > d => k -> (v - d) }
    }
  }

  override def finish(st: Map[String, Long]): Map[String, Long] = st
  override def bufferEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
}

object MisraGries {
  /** One-pass word heavy-hitter candidates over a (doc_id, text) corpus:
    * (word, est_n) sorted by estimate. est_n is a LOWER bound on the true
    * count; add n/(capacity+1) for the upper bound.
    */
  def sketchWords(docs: DataFrame, capacity: Int = 64): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select(explode(split(col("text"), " ")).as("word")).as[String]
      .select(new MisraGries(capacity).toColumn.name("sketch"))
      .select(explode(col("sketch")).as(Seq("word", "est_n")))
      .orderBy(col("est_n").desc, col("word"))
  }
}
