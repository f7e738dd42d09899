package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** CCNet-style n-gram language-model quality filter (Wenzek et al. 2020):
  * train a pruned bigram LM with stupid backoff (Brants et al. 2007) on a
  * reference slice of the corpus, score every document by model fit, and
  * bucket each language's documents into head / middle / tail by rank — the
  * classic "keep the head, drop the tail" web-curation gate. Not a reference
  * operator (the reference has no LM tier); this is the training-data
  * extension the builder prompt asks for, sitting beside the trained word
  * classifier (`TextAnalysis.qualityClassifier`) as the second of the two
  * standard quality scorers.
  *
  * Cross-engine exactness follows the repo's BM25 precedent: the hash-oracled
  * surface is INTEGER ONLY. Per-token stupid-backoff probabilities are fixed
  * point (parts-per-million, floor division on longs — `div` both engines);
  * document fit is their exact long sum and its integer mean. True perplexity
  * (`ppl`, the exp/ln form over the SAME ppm integers) is a transcendental
  * double, so it rides the operator output but stays off the oracle queries
  * and is pinned by `NgramLmSpec` hand fixtures instead — exactly how
  * `bm25Search` is covered by integer-exact `tfidfSearch`.
  *
  * Scale shape: the MODEL is bounded by construction — top-`vocabSize`
  * unigrams and top-`maxBigrams` vocab-interior bigrams (count-desc,
  * key-asc: a total order, so pruning is deterministic at the cap boundary),
  * the KenLM-pruning analog. Training is two token-stream aggregations
  * (unigram keyspace = distinct words, bigram keyspace capped by the vocab
  * semi-join); the collected model is a driver artifact like
  * `Curation.buildVocab`. SCORING is map-only: the model rides as two literal
  * maps (the `tokenize` pattern; at a production vocab size the same plan
  * holds with the maps as broadcast joins) and each row folds its own token
  * array — no explode, no join, no shuffle, full codegen.
  */
object NgramLm {

  /** Fixed-point scale: probabilities in parts-per-million. */
  val ScalePpm = 1000000L

  /** Stupid-backoff alpha = 0.4 (Brants et al. 2007), pre-scaled. */
  val AlphaPpm = 400000L

  /** Pruned bigram LM: unigram counts, vocab-interior bigram counts keyed
    * "w1 w2", and the total training token count. All exact longs.
    */
  final case class LmModel(unigrams: Array[(String, Long)],
      bigrams: Array[(String, Long)], totalTokens: Long) {
    require(totalTokens > 0L, "empty training corpus")
  }

  /** Train on `train`'s `text` column. Unigrams: top `vocabSize` by
    * (count desc, word) — the same deterministic total order as
    * `buildVocab`. Bigrams: adjacent pairs whose BOTH words survived the
    * vocab cut (so every kept bigram can resolve its context count), top
    * `maxBigrams` by (count desc, pair). Two aggregations, one collect of
    * ≤ vocabSize + maxBigrams rows.
    */
  def train(train: DataFrame, vocabSize: Int = 24,
      maxBigrams: Int = 300): LmModel = {
    val ws = split(col("text"), " ")
    val tok = train.select(explode(ws).as("w"))
    val total = tok.count()
    require(total > 0L, "empty training corpus")
    val uni = tok.groupBy(col("w")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w")).limit(vocabSize)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val vocab = uni.map(_._1).toSeq.sorted
    val pairs = train.select(explode(zip_with(
        slice(ws, lit(1), greatest(size(ws) - 1, lit(0))),
        slice(ws, lit(2), greatest(size(ws) - 1, lit(0))),
        (a, b) => concat(a, lit(" "), b))).as("pr"))
    val big = pairs
      .filter(split(col("pr"), " ").getItem(0).isInCollection(vocab) &&
        split(col("pr"), " ").getItem(1).isInCollection(vocab))
      .groupBy(col("pr")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("pr")).limit(maxBigrams)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    LmModel(uni, big, total)
  }

  /** Score every document against a trained model, MAP-ONLY. Per adjacent
    * token pair (prev, w):
    *   - bigram hit (pair and prev both in model):
    *     ppm = (ScalePpm * c(prev,w)) div c(prev)
    *   - else backoff: ppm = (AlphaPpm * c(w)) div totalTokens (0 when w is
    *     out of vocab — the floor CCNet assigns unmodeled mass).
    * Output per doc: n_tokens, n_scored (= pairs), n_hits (bigram hits),
    * sum_ppm (exact long sum), fit_ppm (= sum_ppm div n_scored — the
    * integer mean-probability fit the oracle hashes), and ppl (true stupid-
    * backoff perplexity exp(−Σ ln(max(ppm,1)/1e6)/n_scored) over the same
    * integers — spec-pinned double, dropped from the oracled query).
    */
  def scoreDocs(docs: DataFrame, model: LmModel): DataFrame =
    scoredUnsorted(docs, model).orderBy(col("doc_id"))

  /** The scoring projection without the presentation sort — consumers that
    * re-shuffle anyway (the bucket window) start from this so the corpus
    * is sorted once, not twice.
    */
  private def scoredUnsorted(docs: DataFrame, model: LmModel): DataFrame = {
    val uniMap = map(model.unigrams.flatMap { case (w, c) =>
      Seq(lit(w), lit(c)) }.toSeq: _*)
    // The sentinel key has no space, so it can never equal a "prev w" pair
    // — a typed stand-in for the empty map when the model kept no bigrams.
    val bigMap =
      if (model.bigrams.isEmpty) map(lit(""), lit(0L))
      else map(model.bigrams.flatMap { case (p, c) =>
        Seq(lit(p), lit(c)) }.toSeq: _*)
    val scored = docs
      .withColumn("m_uni", uniMap)
      .withColumn("m_big", bigMap)
      .withColumn("pair_ppm", expr(
        s"""zip_with(
           |  slice(split(text, ' '), 1, greatest(size(split(text, ' ')) - 1, 0)),
           |  slice(split(text, ' '), 2, greatest(size(split(text, ' ')) - 1, 0)),
           |  (a, b) -> named_struct(
           |    'hit', m_big[concat(a, ' ', b)] IS NOT NULL AND m_uni[a] IS NOT NULL,
           |    'ppm', CASE
           |      WHEN m_big[concat(a, ' ', b)] IS NOT NULL AND m_uni[a] IS NOT NULL
           |        THEN (${ScalePpm}L * m_big[concat(a, ' ', b)]) div m_uni[a]
           |      ELSE (${AlphaPpm}L * coalesce(m_uni[b], 0L)) div ${model.totalTokens}L
           |    END))""".stripMargin))
      .select(col("doc_id"), col("lang"), col("source"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"),
        size(col("pair_ppm")).cast("long").as("n_scored"),
        expr("aggregate(pair_ppm, 0L, (acc, x) -> acc + CASE WHEN x.hit THEN 1L ELSE 0L END)")
          .as("n_hits"),
        expr("aggregate(pair_ppm, 0L, (acc, x) -> acc + x.ppm)").as("sum_ppm"),
        expr("aggregate(pair_ppm, CAST(0.0 AS DOUBLE), (acc, x) -> acc + ln(greatest(x.ppm, 1L) / 1e6))")
          .as("_lnsum"))
      .withColumn("fit_ppm",
        expr("sum_ppm div greatest(n_scored, 1L)"))
      .withColumn("ppl",
        when(col("n_scored") === 0L, lit(Double.NaN))
          .otherwise(exp(-col("_lnsum") / col("n_scored").cast("double"))))
      .drop("_lnsum")
    scored
  }

  /** Train-then-score in one call — the registered-query form. The training
    * slice is the docs matching `trainLang` (CCNet trains its reference LM
    * on the target language's clean corpus; here the generator's `lang`
    * column is that label).
    */
  def lmScore(docs: DataFrame, trainLang: String = "en",
      vocabSize: Int = 24, maxBigrams: Int = 300): DataFrame =
    scoreDocs(docs,
      train(docs.filter(col("lang") === trainLang), vocabSize, maxBigrams))

  /** Per-source LM quality audit — the per-domain perplexity table every
    * CCNet-style curation run reports (quality drift by source: a crawl
    * slice whose model fit craters relative to its siblings is the one to
    * re-filter or down-weight in the mixture). Trains the same pruned
    * bigram LM, scores every document, and rolls the EXACT integer
    * per-doc signals up by source: doc/token/pair/hit counts, the long
    * ppm sum, the integer mean fit, and bigram hits per 1000 scored pairs
    * (integer `div` — no float anywhere, so the whole row hashes
    * cross-engine). Scale shape: map-only scoring + one source-keyed
    * aggregation (bounded key space, map-side combined).
    */
  def lmSourceAudit(docs: DataFrame, trainLang: String = "en",
      vocabSize: Int = 24, maxBigrams: Int = 300): DataFrame =
    scoredUnsorted(docs,
      train(docs.filter(col("lang") === trainLang), vocabSize, maxBigrams))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        sum(col("n_scored")).as("n_scored"),
        sum(col("n_hits")).as("n_hits"),
        sum(col("sum_ppm")).as("sum_ppm"))
      .withColumn("fit_ppm", expr("sum_ppm div greatest(n_scored, 1L)"))
      .withColumn("hits_per_1000", expr("(1000L * n_hits) div greatest(n_scored, 1L)"))
      .orderBy(col("source"))

  /** CCNet head/middle/tail bucketing: within each language, rank documents
    * by model fit (fit_ppm desc — best fit first, doc_id tie-break: a total
    * order, so percent_rank is deterministic) and cut at 30% / 70%. Returns
    * the per-(lang, bucket) roll-up — doc counts and exact integer fit
    * sums/extremes. The window partitions by lang (bounded key space); at
    * corpus scale each partition is one language's docs, the same
    * distribution shape as any per-lang percentile gate.
    */
  def perplexityBuckets(docs: DataFrame, trainLang: String = "en",
      vocabSize: Int = 24, maxBigrams: Int = 300): DataFrame = {
    val scored = scoredUnsorted(docs,
      train(docs.filter(col("lang") === trainLang), vocabSize, maxBigrams))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang"))
      .orderBy(col("fit_ppm").desc, col("doc_id"))
    scored
      .withColumn("pr", percent_rank().over(w))
      .withColumn("bucket",
        when(col("pr") <= 0.3, lit("head"))
          .when(col("pr") <= 0.7, lit("middle"))
          .otherwise(lit("tail")))
      .groupBy(col("lang"), col("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("fit_ppm")).as("sum_fit_ppm"),
        min(col("fit_ppm")).as("min_fit_ppm"),
        max(col("fit_ppm")).as("max_fit_ppm"))
      .orderBy(col("lang"), col("bucket"))
  }
}
