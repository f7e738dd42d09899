package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Unigram-LM subword tokenizer training (Kudo 2018, "Subword
  * Regularization" — the SentencePiece `--model_type=unigram` algorithm;
  * the LLaMA/T5 tokenizer family), Spark-shaped. Completes the repo's
  * tokenizer-training ladder: frequency vocab (`Curation.buildVocab`) →
  * BPE merges (`Bpe`) → unigram LM (this file) — the three training rules
  * real pipelines choose between.
  *
  * The scale collapse is [[Bpe]]'s: the corpus is touched ONCE
  * (`Bpe.wordCounts` — the only volume-proportional stage); seeding and
  * every EM round then run over the vocabulary-bounded (word, count)
  * table. Per-word forward–backward / Viterbi is genuine imperative DP, so
  * it lives in a typed map over THAT table — the documented last-resort
  * rung, kept off the corpus-sized path. The model itself (piece → log
  * prob) is a driver-bounded artifact of the centroid/codebook class.
  *
  * Determinism contract (the cross-engine posture of the rest of the
  * repo, scoped to one engine since no SQL oracle can express EM):
  *  - per-word float work uses `StrictMath` only, so a word's expected
  *    counts are bit-identical on any JVM;
  *  - everything that crosses the shuffle is summed as DECIMAL(38,12)
  *    (exact, commutative — the `functions.Num` discipline), so round
  *    results never depend on partitioning;
  *  - ties in seeding, pruning and Viterbi break lexicographically.
  *  `UnigramLmSpec` pins E-step expected counts and Viterbi segmentations
  *  against brute segmentation enumeration, EM's loglik monotonicity, and
  *  bitwise run-to-run equality.
  */
object UnigramLm {

  /** piece → natural-log probability; `maxPieceLen` bounds the DP
    * lookback. Single characters are always present (coverage guarantee).
    */
  case class Model(logp: Map[String, Double], maxPieceLen: Int) {
    /** Floor score for characters never seen in training (tokenize-time
      * UNK): strictly below every trained piece.
      */
    val unkLogp: Double = (if (logp.isEmpty) 0.0 else logp.values.min) - 10.0
  }

  /** Seed vocabulary: every substring of length ≤ `maxPieceLen` of every
    * distinct word, weighted by word count; the top `maxPieces` multi-char
    * substrings by (mass desc, piece asc) plus ALL single characters.
    * One aggregation over the word table — vocab-bounded, map-side
    * combined. Returns (piece, mass) with mass in exact longs.
    */
  def seedVocab(wordCounts: DataFrame, maxPieces: Int,
      maxPieceLen: Int = 4): DataFrame = {
    val spark = wordCounts.sparkSession
    import spark.implicits._
    val pieceMass = wordCounts.as[(String, Long)]
      .flatMap { case (w, c) =>
        for {
          i <- 0 until w.length
          j <- (i + 1) to math.min(i + maxPieceLen, w.length)
        } yield (w.substring(i, j), c)
      }
      .toDF("piece", "c")
      .groupBy(col("piece")).agg(sum(col("c")).as("mass"))
      .localCheckpoint(true) // consumed by the char tier and the top-k tier
    val chars = pieceMass.filter(length(col("piece")) === 1)
    val multi = pieceMass.filter(length(col("piece")) > 1)
      .orderBy(col("mass").desc, col("piece")).limit(maxPieces)
    chars.unionByName(multi)
  }

  /** Per-word forward–backward expected piece counts and log-likelihood.
    * Pure function of (word, model) — `StrictMath` only. Returns the
    * per-piece expected counts for ONE occurrence of the word and the
    * word's log-evidence log Z; callers scale by the word count.
    */
  private[graft] def wordExpectations(w: String, model: Model)
      : (Seq[(String, Double)], Double) = {
    val n = w.length
    val L = model.maxPieceLen
    val neg = Double.NegativeInfinity
    def lp(j: Int, i: Int): Double = {
      val p = w.substring(j, i)
      model.logp.getOrElse(p,
        if (i - j == 1) model.unkLogp else neg)
    }
    def lse(a: Double, b: Double): Double =
      if (a == neg) b else if (b == neg) a
      else if (a > b) a + StrictMath.log1p(StrictMath.exp(b - a))
      else b + StrictMath.log1p(StrictMath.exp(a - b))
    val alpha = Array.fill(n + 1)(neg); alpha(0) = 0.0
    for (i <- 1 to n; j <- math.max(0, i - L) until i) {
      val s = lp(j, i)
      if (s != neg && alpha(j) != neg) alpha(i) = lse(alpha(i), alpha(j) + s)
    }
    val beta = Array.fill(n + 1)(neg); beta(n) = 0.0
    for (j <- (n - 1) to 0 by -1; i <- (j + 1) to math.min(j + L, n)) {
      val s = lp(j, i)
      if (s != neg && beta(i) != neg) beta(j) = lse(beta(j), s + beta(i))
    }
    val z = alpha(n)
    if (z == neg) (Seq.empty, neg) // uncoverable word (cannot happen post-seed)
    else {
      val acc = scala.collection.mutable.LinkedHashMap.empty[String, Double]
      for (j <- 0 until n; i <- (j + 1) to math.min(j + L, n)) {
        val s = lp(j, i)
        if (s != neg && alpha(j) != neg && beta(i) != neg) {
          val e = StrictMath.exp(alpha(j) + s + beta(i) - z)
          val p = w.substring(j, i)
          acc(p) = acc.getOrElse(p, 0.0) + e
        }
      }
      (acc.toSeq, z)
    }
  }

  /** One EM E-step over the word table: expected count per piece and the
    * corpus log-likelihood, both summed exactly (DECIMAL(38,12) through
    * the shuffle — partitioning-independent).
    */
  def expectedCounts(words: DataFrame, model: Model)
      : (Seq[(String, BigDecimal)], BigDecimal) = {
    val spark = words.sparkSession
    import spark.implicits._
    val perWord = words.as[(String, Long)]
      .flatMap { case (w, c) =>
        val (ecs, z) = wordExpectations(w, model)
        if (z == Double.NegativeInfinity) Seq.empty[(String, Double, Double)]
        else ecs.map { case (p, e) => (p, e * c, 0.0) } :+ (("", 0.0, z * c))
      }
      .toDF("piece", "ec", "ll")
      .groupBy(col("piece"))
      .agg(sum(col("ec").cast("decimal(38,12)")).as("ec"),
        sum(col("ll").cast("decimal(38,12)")).as("ll"))
      .collect()
    val ll = perWord.filter(_.getString(0) == "")
      .map(r => BigDecimal(r.getDecimal(2))).headOption.getOrElse(BigDecimal(0))
    val ecs = perWord.filter(_.getString(0) != "")
      .map(r => (r.getString(0), BigDecimal(r.getDecimal(1)))).toSeq
    (ecs, ll)
  }

  /** Train a unigram LM tokenizer: seed → (E-step, M-step, prune)×rounds.
    * Each round renormalizes probabilities from exact expected counts and
    * prunes the lowest-expected-count multi-char pieces (never single
    * chars, never below `vocabSize`) — `pruneFrac` of the surplus per
    * round. (SentencePiece prunes by likelihood LOSS; expected-count
    * pruning is the standard cheap proxy and keeps every round one
    * aggregation. Documented trade, spec-pinned behavior.)
    * Returns the model and the per-round log-likelihoods (non-decreasing
    * across a fixed-vocab E/M pair — the EM guarantee the spec asserts).
    */
  def train(docs: DataFrame, vocabSize: Int, seedSize: Int = 512,
      rounds: Int = 3, maxPieceLen: Int = 4, pruneFrac: Double = 0.5)
      : (Model, Seq[Double]) = {
    val words = Bpe.wordCounts(docs)
      .localCheckpoint(true) // the ONLY corpus-derived table EM touches
    val seed = seedVocab(words, seedSize, maxPieceLen).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val total = seed.map(_._2).sum.toDouble
    var model = Model(
      seed.map { case (p, m) => p -> StrictMath.log(m / total) }.toMap,
      maxPieceLen)
    val lls = scala.collection.mutable.ArrayBuffer.empty[Double]
    for (round <- 1 to rounds) {
      val (ecs, ll) = expectedCounts(words, model)
      lls += ll.toDouble
      // M-step: renormalize over ALL current pieces (exact sums)
      val ecMap = ecs.toMap
      val zero = BigDecimal(0)
      val kept0 = model.logp.keys.toSeq.sorted
        .map(p => (p, ecMap.getOrElse(p, zero)))
      // prune tier: multi-char pieces by (expected count asc, piece desc),
      // dropped until the target — never below vocabSize, never a char
      val multi = kept0.filter(_._1.length > 1)
      val nChars = kept0.size - multi.size
      val surplus = math.max(0, kept0.size - math.max(vocabSize, nChars))
      val nDrop = if (round == rounds) surplus
        else math.min(surplus, (surplus * pruneFrac).toInt)
      val dropped = multi.sortBy { case (p, e) => (e, p) }
        .take(nDrop).map(_._1).toSet
      val kept = kept0.filterNot { case (p, _) => dropped(p) }
      val mass = kept.map(_._2).sum
      require(mass > zero, "EM mass vanished — corpus and vocab are disjoint")
      model = Model(
        kept.map { case (p, e) =>
          val pe = if (e <= zero) 1e-12 else e.toDouble
          p -> StrictMath.log(pe / mass.toDouble)
        }.toMap,
        maxPieceLen)
    }
    (model, lls.toSeq)
  }

  /** Viterbi segmentation of one word — the max-probability path through
    * the same lattice the E-step sums. Deterministic tie-break: for each
    * end position the longest candidate piece is tried first and kept on
    * ties (strict > comparison), so backtracking resolves equal-score
    * paths toward the longest TRAILING pieces, identically on any JVM.
    */
  private[graft] def viterbi(w: String, model: Model): Seq[String] = {
    val n = w.length
    val L = model.maxPieceLen
    val neg = Double.NegativeInfinity
    val best = Array.fill(n + 1)(neg); best(0) = 0.0
    val back = Array.fill(n + 1)(-1)
    for (i <- 1 to n; j <- math.max(0, i - L) until i) {
      val p = w.substring(j, i)
      val s = model.logp.getOrElse(p, if (i - j == 1) model.unkLogp else neg)
      if (s != neg && best(j) != neg && best(j) + s > best(i)) {
        best(i) = best(j) + s; back(i) = j
      }
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = n
    while (i > 0) { val j = back(i); out += w.substring(j, i); i = j }
    out.reverse.toSeq
  }

  /** Map-only tokenization with a trained model ([[Bpe.tokenize]]'s
    * output contract): the model rides the closure (bounded artifact);
    * no shuffle, no join. Characters never seen in training segment as
    * single-char UNK-floor pieces, so every input round-trips.
    */
  def tokenize(docs: DataFrame, model: Model): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        val toks = text.split(" ").filter(_.nonEmpty)
          .flatMap(w => viterbi(w, model))
        (id, toks.length.toLong, toks.mkString(" "))
      }
      .toDF("doc_id", "n_tokens", "token_str")
      .orderBy(col("doc_id"))
  }
}
