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
  def train(docs: DataFrame, nMerges: Int): Seq[(String, String)] =
    trainWithStats(docs, nMerges)._1

  /** As [[train]], also returning the number of Spark aggregation rounds
    * used. Each round applies a BATCH of merges — the ranked prefix of the
    * round's pair-count table that is provably equal to applying them one
    * at a time (see the acceptance rule below) — so a 50k-merge tokenizer
    * costs far fewer than 50k sequential jobs while reproducing the
    * classic algorithm EXACTLY (BpeSpec pins equality to the single-node
    * reference).
    *
    * Batch acceptance rule (walk the round's ranked list (n desc, a, b),
    * stop at the first rejection so the batch is a contiguous ranked
    * prefix):
    *  1. symbol-disjoint: {a_i, b_i, a_i+b_i} must not intersect any
    *     earlier accepted pair's {a_j, b_j, a_j+b_j}. Disjointness means
    *     earlier merges in the batch can neither destroy nor create
    *     occurrences of m_i, so m_i's count at its sequential turn is
    *     exactly its table count, and its rank among untouched pairs is
    *     exactly its rank in the list (same comparator).
    *  2. derived-pair bound: merging (a_j, b_j) can create or grow only
    *     pairs of the form (·, a_jb_j) / (a_jb_j, ·), and each such
    *     occurrence maps to a distinct pre-round occurrence of (z, a_j) /
    *     (b_j, z) — so every derived count is ≤
    *     D_j = max(maxCount(·, a_j), maxCount(b_j, ·)), both read from the
    *     SAME round's pair table. Accepting m_i requires n_i > D_j for all
    *     earlier accepted j: no derived pair can preempt m_i, even on a
    *     tie. (A self-pair (a, a) puts itself inside D_j and stops the
    *     batch — conservative and correct.)
    *  3. merged-string freshness: if a_i+b_i already exists as a symbol in
    *     the table, derived pairs inherit that symbol's PRE-EXISTING pair
    *     mass on top of the bounded growth, so such a candidate may close
    *     a batch (it is still the argmax at its turn) but never extend it.
    * Everything else ranks strictly below by construction, so the batch
    * replays the sequential argmax decisions verbatim.
    */
  def trainWithStats(docs: DataFrame, nMerges: Int,
      maxBatch: Int = 64): (Seq[(String, String)], Int) = {
    val spark = docs.sparkSession
    import spark.implicits._
    var words = wordCounts(docs).as[(String, Long)]
      .map { case (w, c) => (w.map(_.toString), c) }
      .toDF("syms", "cnt")
      .localCheckpoint(true)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var rounds = 0
    var done = false
    while (!done && merges.size < nMerges) {
      val pairs = words
        .select(posexplode(col("syms")).as(Seq("i", "a")), col("syms"), col("cnt"))
        .filter(col("i") < size(col("syms")) - 1)
        .select(col("a"), expr("syms[i + 1]").as("b"), col("cnt"))
        .groupBy(col("a"), col("b")).agg(sum(col("cnt")).as("n"))
        .localCheckpoint(true) // two consumers: ranked head + symbol maxima
      rounds += 1
      val top = pairs.orderBy(col("n").desc, col("a"), col("b"))
        .limit(math.min(maxBatch, nMerges - merges.size)).collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
        .filter(_._3 >= 2)
      if (top.isEmpty) done = true
      else {
        val candSyms = top.flatMap(t => Seq(t._1, t._2)).distinct.toSeq
        // per-symbol maxima over the FULL pair table (filtered to candidate
        // symbols — a bounded driver artifact): maxRight(s) = max n of
        // (·, s); maxLeft(s) = max n of (s, ·)
        val maxRight = pairs.filter(col("b").isin(candSyms: _*))
          .groupBy(col("b")).agg(max(col("n")).as("m")).collect()
          .map(r => r.getString(0) -> r.getLong(1)).toMap
        val maxLeft = pairs.filter(col("a").isin(candSyms: _*))
          .groupBy(col("a")).agg(max(col("n")).as("m")).collect()
          .map(r => r.getString(0) -> r.getLong(1)).toMap
        // a candidate whose merged string ALREADY exists as a table symbol
        // grows pre-existing pairs (old mass + growth — the D bound covers
        // only growth), so it may only close a batch, never extend one
        val candMerged = top.map(t => t._1 + t._2).distinct.toSeq
        val existingMerged = pairs.select(col("a").as("s"))
          .union(pairs.select(col("b").as("s")))
          .filter(col("s").isin(candMerged: _*)).distinct().collect()
          .map(_.getString(0)).toSet
        val used = scala.collection.mutable.Set.empty[String]
        var maxD = Long.MinValue
        val batch = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
        var stop = false
        for ((a, b, n) <- top if !stop) {
          val fresh = !used(a) && !used(b) && !used(a + b)
          if (batch.isEmpty || (fresh && n > maxD && !existingMerged(a + b))) {
            batch += ((a, b))
            used ++= Seq(a, b, a + b)
            val d = math.max(maxRight.getOrElse(a, Long.MinValue),
              maxLeft.getOrElse(b, Long.MinValue))
            maxD = math.max(maxD, d)
            if (existingMerged(a + b)) stop = true
          } else stop = true
        }
        merges ++= batch
        val toApply = batch.toArray
        val prev = words
        words = prev.as[(Seq[String], Long)]
          .map { case (syms, c) =>
            var s = syms
            toApply.foreach { case (a, b) => s = mergePair(s, a, b) }
            (s, c)
          }
          .toDF("syms", "cnt")
          .localCheckpoint(true)
        prev.unpersist() // keep at most one resident word-table copy
      }
      pairs.unpersist()
    }
    (merges.toSeq, rounds)
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
