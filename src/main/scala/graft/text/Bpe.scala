package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer training, Spark-shaped (Sennrich et al.
  * 2016, "Neural Machine Translation of Rare Words with Subword Units" —
  * the GPT-2/LLaMA tokenizer family's training rule).
  *
  * The scale move: BPE never needs the corpus after ONE aggregation. The
  * classic algorithm trains on the word-frequency table, so the corpus
  * collapses to (word, count) — vocabulary-bounded, not volume-bounded —
  * and every merge round is then one small pair-count aggregation over
  * that table:
  *
  *   round := explode adjacent symbol pairs × word count
  *            → groupBy pair → sum → argmax (count desc, pair asc)
  *            → driver records the winning pair (2 strings — a bounded
  *              artifact, the centroid-sidecar class)
  *            → map-side merge of that pair inside every word's symbol
  *              sequence; repeat.
  *
  * At 100 TB the corpus pass is the only volume-proportional stage; k
  * merge rounds cost k aggregations over the distinct-word table. The
  * merge application inside a word is genuine per-row imperative logic
  * (a scan with lookahead), so it lives in a typed map — the documented
  * last-resort rung, kept off the corpus-sized path.
  */
object Bpe {

  /** Merge every non-overlapping left-to-right occurrence of (a, b) in a
    * symbol sequence. Exposed for the spec's reference-equivalence test.
    */
  private[text] def mergePair(syms: Seq[String], a: String, b: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toSeq
  }

  /** The corpus → (word, count) collapse: the only volume-proportional
    * stage of training.
    */
  def wordCounts(docs: DataFrame): DataFrame =
    docs.select(explode(split(col("text"), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))

  /** Train `nMerges` BPE merges. Deterministic: ties on pair count break
    * on (left, right) lexicographic order. Returns the merge list in
    * application order.
    */
  def train(docs: DataFrame, nMerges: Int): Seq[(String, String)] = {
    val spark = docs.sparkSession
    import spark.implicits._
    var words = wordCounts(docs).as[(String, Long)]
      .map { case (w, c) => (w.map(_.toString), c) }
      .toDF("syms", "cnt")
      .localCheckpoint(true)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var round = 0
    while (round < nMerges) {
      val best = words
        .select(posexplode(col("syms")).as(Seq("i", "a")), col("syms"), col("cnt"))
        .filter(col("i") < size(col("syms")) - 1)
        .select(col("a"), expr("syms[i + 1]").as("b"), col("cnt"))
        .groupBy(col("a"), col("b")).agg(sum(col("cnt")).as("n"))
        .orderBy(col("n").desc, col("a"), col("b"))
        .limit(1).collect()
      if (best.isEmpty || best.head.getLong(2) < 2) round = nMerges
      else {
        val (a, b) = (best.head.getString(0), best.head.getString(1))
        merges += ((a, b))
        val prev = words
        words = prev.as[(Seq[String], Long)]
          .map { case (syms, c) => (mergePair(syms, a, b), c) }
          .toDF("syms", "cnt")
          .localCheckpoint(true)
        round += 1
      }
    }
    merges.toSeq
  }

  /** Map-only tokenization with a trained merge list: every word splits
    * to characters and replays the merges in order. The merge table rides
    * the closure (bounded artifact); no shuffle, no join.
    */
  def tokenize(docs: DataFrame, merges: Seq[(String, String)]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val ms = merges.toArray
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        val toks = text.split(" ").filter(_.nonEmpty).flatMap { w =>
          var syms: Seq[String] = w.map(_.toString)
          ms.foreach { case (a, b) => syms = mergePair(syms, a, b) }
          syms
        }
        (id, toks.length.toLong, toks.mkString(" "))
      }
      .toDF("doc_id", "n_tokens", "token_str")
      .orderBy(col("doc_id"))
  }
}
