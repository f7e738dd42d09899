package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling / splitting / rebalancing — the selection stages
  * of a training-data pipeline. Everything is keyed on a cryptographic
  * hash of a STABLE key (not `rand()`, not row position), which buys the
  * three properties production corpora need:
  *  - reproducible: the same corpus always yields the same sample;
  *  - stable under growth: adding rows never changes an existing row's
  *    sample membership or split assignment (no reshuffling the eval set
  *    when the corpus is re-ingested);
  *  - engine-portable: md5 hex is identical everywhere, so the DuckDB
  *    oracle reproduces the exact row set bit-for-bit.
  *
  * The uniform draw is the md5's first 8 hex chars COMPARED AS STRINGS —
  * lowercase-hex lexicographic order equals numeric order, so thresholds
  * are hex-string literals and neither engine parses hex integers (DuckDB
  * has no conv()). All three ops are map-only filters/projections except
  * the cap, which rides the bounded native top-k aggregate.
  */
object Sampling {

  /** First 8 hex chars of md5("graft|" + key) — the per-row uniform draw.
    * The salt keeps the draw independent of other md5 uses of the same key
    * (e.g. exact-dedup hashes).
    */
  def hashDraw(key: Column): Column =
    substring(md5(concat(lit("graft|"), key.cast("string"))), 1, 8)

  /** Deterministic ~fraction sample: keep rows whose draw falls below the
    * hex threshold. `fracHex` is floor(fraction · 16⁸) as 8 lowercase hex
    * chars — e.g. "33333333" ≈ 0.2, "80000000" = 0.5.
    */
  def hashSample(df: DataFrame, key: Column, fracHex: String): DataFrame =
    df.filter(hashDraw(key) < lit(fracHex))

  /** Stable train/validation/test assignment from the same draw: 2-hex-char
    * prefix buckets (256 of them) split at the given boundaries — defaults
    * "cc"/"e6" give 204/26/26 buckets ≈ 79.7% / 10.2% / 10.2%. A row's
    * split is a pure function of its key: re-ingesting or growing the
    * corpus never moves a row between splits (no eval-set contamination).
    */
  def assignSplits(df: DataFrame, key: Column,
      valBoundary: String = "cc", testBoundary: String = "e6"): DataFrame = {
    val prefix = substring(hashDraw(key), 1, 2)
    df.withColumn("split",
      when(prefix < valBoundary, "train")
        .when(prefix < testBoundary, "val")
        .otherwise("test"))
  }

  /** Per-group cap: keep the `cap` lowest-id rows of each group — class
    * rebalancing (a dominant language/source must not drown the corpus).
    * Rides the bounded native top-k aggregate (value = −id ⇒ lowest ids
    * win): ≤2·cap rows buffered per group on any executor and ≤cap rows
    * per (partition, group) into the shuffle — a 10⁹-row group never
    * sorts in one task, unlike the row_number window form the oracle uses.
    * Ids must be exact in a Double (< 2⁵³ — true for every table here).
    */
  def capPerGroup(df: DataFrame, groupCol: String, idCol: String, cap: Int): DataFrame =
    df.groupBy(col(groupCol))
      .agg(graft.functions.TopKAggregator.topK(cap, -col(idCol).cast("double"), col(idCol))
        .as("top"))
      .select(col(groupCol), explode(col("top")).as("t"))
      .select(col(groupCol), col("t.id").as(idCol))
      .orderBy(col(groupCol), col(idCol))

  /** Per-source cumulative token count in stable `hashDraw` draw order,
    * as a DISTRIBUTED prefix sum (the `Curation.packSequences` shape, keyed
    * on the draw instead of doc_id ranges): docs bucket by the leading
    * `bucketChars` hex chars of their draw — lowercase-hex lexicographic
    * order IS draw order, so bucket boundaries align with the ordering and
    * per-(source, bucket) totals (≤ sources · 16^bucketChars longs, a
    * bounded driver artifact) become exclusive prefix offsets; each window
    * task then sorts only its own (source, bucket) slice. A billion-row
    * web-crawl source never funnels through one reducer — the old
    * `Window.partitionBy(source)` cumsum did exactly that.
    *
    * Long addition is associative, so offset + within-bucket cumsum equals
    * the single-window cumsum bit-for-bit: the DuckDB oracle keeps the
    * declarative one-window form and still hash-matches.
    *
    * Input must carry (doc_id, source, n_tokens); adds `cum_tokens`.
    */
  private def cumTokensBySource(base: DataFrame, bucketChars: Int): DataFrame = {
    require(bucketChars >= 1 && bucketChars <= 4, "bucketChars must be in [1,4]")
    val bucketed = base
      .withColumn("_draw", hashDraw(col("doc_id")))
      .withColumn("_bucket", substring(col("_draw"), 1, bucketChars))
    val totals = bucketed.groupBy(col("source"), col("_bucket"))
      .agg(sum(col("n_tokens")).as("t")).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val offsets: Map[String, Long] = totals.keys.map(_._1).toSeq.distinct.flatMap { s =>
      val bs = totals.keys.collect { case (`s`, b) => b }.toSeq.sorted
      bs.zip(bs.scanLeft(0L)((acc, b) => acc + totals((s, b))).init)
        .map { case (b, off) => s"$s|$b" -> off }
    }.toMap
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source"), col("_bucket"))
      .orderBy(col("_draw"), col("doc_id"))
    val offCol =
      if (offsets.isEmpty) lit(0L)
      else element_at(typedLit(offsets), concat_ws("|", col("source"), col("_bucket")))
    bucketed
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w) + offCol)
      .drop("_draw", "_bucket")
  }

  /** Balanced training-shard assignment — the EXPORT step between curation
    * and the training loader (the webdataset/Megatron shard-writer
    * convention): docs are laid out in stable `hashDraw` order (a
    * deterministic global shuffle — exactly what a training run wants) and
    * greedily cut into shards of ~`targetTokens` whitespace tokens,
    * `shard_id = exclusive-prefix-tokens DIV targetTokens`. Docs never
    * split; the doc straddling a boundary overflows its shard by less than
    * one document, so every shard's token mass lands in
    * [target − max_doc, target + max_doc) — the balance the returned
    * manifest (one row per shard: docs, token mass, min doc id) audits.
    *
    * Scale shape: map-only token count + the bucketed distributed prefix
    * sum (`cumTokensBySource` under one constant source key — no
    * single-reducer window), then one bounded roll-up keyed on shard_id
    * (≤ corpus_tokens/target rows). Integer floor division, exact in any
    * engine.
    */
  def shardAssign(docs: DataFrame, targetTokens: Long = 2000L,
      bucketChars: Int = 2): DataFrame = {
    require(targetTokens > 0, "targetTokens must be positive")
    val base = docs.select(col("doc_id"), lit("all").as("source"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .localCheckpoint(true) // two consumers: bucket totals and the window
    cumTokensBySource(base, bucketChars)
      .withColumn("shard_id", expr(s"(cum_tokens - n_tokens) DIV $targetTokens"))
      .groupBy(col("shard_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"),
        min(col("doc_id")).as("min_doc_id"))
      .orderBy(col("shard_id"))
  }

  /** Source-proportional token-budget mixing — the static data-mixture
    * step of a training pipeline (fixed mixture weights à la The Pile;
    * DoReMi etc. LEARN these weights, then apply exactly this selection).
    * Each listed source contributes documents until its weight-share of
    * `tokenBudget` whitespace tokens is filled; unlisted sources are
    * excluded. Within a source, docs are taken in `hashDraw` order — the
    * same stable-under-growth draw as `hashSample`, so re-ingesting the
    * corpus or growing OTHER sources never changes a source's picks, and
    * the md5 ordering reproduces bit-for-bit in the DuckDB oracle.
    * A doc is kept iff its source's cumulative token count up to and
    * including it fits the source's budget: the budget is never
    * overfilled, the tail doc that would cross it (and everything after)
    * drops.
    *
    * Scale shape: map-only token count + the bucketed distributed prefix
    * sum of `cumTokensBySource` (no per-source single-reducer window) + a
    * literal when-chain for the per-source budgets (bounded driver
    * artifact, like vocab/centroids — no join).
    */
  def mixCorpus(docs: DataFrame, weights: Map[String, Double],
      tokenBudget: Long, bucketChars: Int = 2): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(_ > 0), "weights must be positive")
    val wSum = weights.values.sum
    val budgets = weights.map { case (s, w) => (s, (w / wSum * tokenBudget).toLong) }
    val budgetCol = budgets.tail.foldLeft(
      when(col("source") === budgets.head._1, lit(budgets.head._2))) {
      case (acc, (s, b)) => acc.when(col("source") === s, lit(b))
    }
    val base = docs.filter(col("source").isin(weights.keys.toSeq: _*))
      .select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .localCheckpoint(true) // two consumers: bucket totals and the cut
    cumTokensBySource(base, bucketChars)
      .filter(col("cum_tokens") <= budgetCol)
      .select(col("doc_id"), col("source"), col("n_tokens"), col("cum_tokens"))
      .orderBy(col("source"), col("doc_id"))
  }

  /** Mixture with EPOCH UPSAMPLING — the low-resource arm of data mixing
    * (high-weight, small sources repeat for multiple passes, the way
    * curated corpora are oversampled in published mixtures): a source
    * whose budget exceeds its size contributes ⌊budget/size⌋ full passes
    * (capped at `maxEpochs`), then — below the cap — a `hashDraw`-ordered
    * prefix of one more pass for the remainder. Output carries `epoch`
    * (0-based pass number) so a training loader can interleave passes.
    *
    * Scale shape: per-source token totals are a bounded driver artifact
    * (one row per listed source — the vocab/centroid class), so full
    * passes are a map-only explode of a literal epoch range and the
    * partial pass reuses the mixCorpus bucketed prefix sum; no join
    * anywhere.
    */
  /** Square-root temperature source mixing — the α = 0.5 point of the
    * p^α smoothing rule multilingual/multi-source corpora use (mT5,
    * CC-100): per-source budgets ∝ √(source token total), so large
    * sources are down-weighted and small ones up-weighted WITHOUT fixed
    * hand-set weights. α = 0.5 specifically because √ is IEEE
    * correctly-rounded — the budget longs are bit-identical cross-engine
    * (a general p^α would hit pow()'s last-ulp divergence), with the
    * √-sum folded in source-sorted order (the list_sum sequential-fold
    * parity pattern). One totals aggregation (bounded by the source list,
    * collected as a driver artifact), then the same per-source
    * hash-ordered cumulative cut as `mixCorpus`.
    */
  def temperatureMix(docs: DataFrame, tokenBudget: Long,
      bucketChars: Int = 2): DataFrame = {
    require(tokenBudget > 0, "budget must be positive")
    val base = docs.select(col("doc_id"), col("source"),
      size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .localCheckpoint(true) // two consumers: totals and the cut
    val totals = base.groupBy(col("source")).agg(sum(col("n_tokens")).as("t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).sortBy(_._1)
    require(totals.nonEmpty, "empty corpus")
    val sqs = totals.map { case (s, t) => s -> math.sqrt(t.toDouble) }
    val sumSq = sqs.map(_._2).sum // left fold in source-sorted order
    val budgets = sqs.map { case (s, q) =>
      s -> (tokenBudget.toDouble * q / sumSq).toLong }
    val budgetCol = budgets.tail.foldLeft(
      when(col("source") === budgets.head._1, lit(budgets.head._2))) {
      case (acc, (s, b)) => acc.when(col("source") === s, lit(b))
    }
    cumTokensBySource(base, bucketChars)
      .filter(col("cum_tokens") <= budgetCol)
      .select(col("doc_id"), col("source"), col("n_tokens"), col("cum_tokens"),
        budgetCol.as("source_budget"))
      .orderBy(col("source"), col("doc_id"))
  }

  def mixCorpusEpochs(docs: DataFrame, weights: Map[String, Double],
      tokenBudget: Long, maxEpochs: Int = 2, bucketChars: Int = 2): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(_ > 0), "weights must be positive")
    require(maxEpochs >= 1, "maxEpochs must be at least 1")
    val wSum = weights.values.sum
    val budgets = weights.map { case (s, w) => (s, (w / wSum * tokenBudget).toLong) }
    val base = docs.filter(col("source").isin(weights.keys.toSeq: _*))
      .select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .localCheckpoint(true) // three consumers: totals, full passes, partial pass
    val totals = base.groupBy(col("source")).agg(sum(col("n_tokens")).as("t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val fullEpochs = budgets.map { case (s, b) =>
      s -> math.min(b / totals.getOrElse(s, Long.MaxValue), maxEpochs.toLong) }
    val remaining = budgets.map { case (s, b) =>
      s -> (b - fullEpochs(s) * totals.getOrElse(s, 0L)) }
    def chain(m: Map[String, Long]) = m.tail.foldLeft(
      when(col("source") === m.head._1, lit(m.head._2))) {
      case (acc, (s, v)) => acc.when(col("source") === s, lit(v))
    }
    val fe = chain(fullEpochs)
    val rem = chain(remaining)
    val fullPasses = base
      .withColumn("epoch",
        explode(when(fe > 0, sequence(lit(0L), fe - 1)).otherwise(array())))
      .select(col("doc_id"), col("source"), col("n_tokens"), col("epoch"))
    val partial = cumTokensBySource(base, bucketChars)
      .filter(fe < maxEpochs.toLong && col("cum_tokens") <= rem)
      .select(col("doc_id"), col("source"), col("n_tokens"), fe.as("epoch"))
    fullPasses.unionByName(partial)
      .orderBy(col("source"), col("epoch"), col("doc_id"))
  }

  /** REPAIR the contamination `doc_split_leakage` only measures: a random
    * (even a stable hash-based) split puts near-duplicate documents on
    * both sides of the train/eval fence, so the eval set leaks into
    * training. The standard fix is group-aware splitting: every near-dup
    * CLUSTER moves atomically to one split — here, the split its min-id
    * representative already has, which (a) touches only clustered docs
    * (singletons keep their hash-assigned split, preserving stability
    * under growth), and (b) is itself stable: the representative's own
    * assignment never depends on the cluster's other members.
    *
    * Composes three proven ops: MinHash-LSH verified pairs → connected
    * components (min-label = the representative id) → the hash-split rule
    * applied to representatives. Scale shape: the dup-pair graph scales
    * with the duplicate fraction, the CC rounds are O(log n), and the
    * repair join is cluster-membership-sized — the full corpus is touched
    * only by the original map-only split assignment.
    */
  def repairSplitLeakage(docs: DataFrame,
      jaccardThreshold: Double = 0.3): DataFrame = {
    val pairs = graft.ops.Dedup.minhashDupPairs(docs, jaccardThreshold)
      .select(col("doc_a"), col("doc_b"))
    // label = min doc_id of the component = the representative
    val comps = graft.ops.Dedup.connectedComponents(pairs, "doc_a", "doc_b")
      .select(col("id").as("doc_id"), col("label").as("group_id"))
    val splits = assignSplits(docs.select(col("doc_id")), col("doc_id"))
    val repaired = comps.join(
      splits.select(col("doc_id").as("group_id"), col("split").as("rep_split")),
      "group_id")
    splits.join(repaired, Seq("doc_id"), "left")
      .select(col("doc_id"),
        col("split").as("original_split"),
        coalesce(col("rep_split"), col("split")).as("split"),
        coalesce(col("group_id"), col("doc_id")).as("group_id"))
      .orderBy(col("doc_id"))
  }

  /** Semantic-diversity sampling: cap the corpus per COARSE SEMANTIC
    * REGION instead of per source — the embedding-space twin of
    * `capPerGroup`, for "don't let one dense topic cluster dominate the
    * sample" (the selection step SemDeDup-style pruning leaves implicit).
    * Regions are the sign pattern of the first `bits` embedding dims — a
    * fixed sign-random-projection bucket (deterministic, model-free, and
    * computable by ANY engine reading the same floats, unlike k-means
    * cells); within a region, draws follow the stable `hashDraw` order
    * with vec_id tie-break.
    *
    * Scale shape: bucket assignment is a map-only projection; the cap
    * rides the bounded native top-k aggregate (≤2·cap rows per group
    * buffered anywhere, partial agg before the shuffle) — no per-region
    * window sort, and the shuffle key space is 2^bits, not the corpus.
    */
  def diverseSample(embeddings: DataFrame, cap: Int, bits: Int = 8): DataFrame = {
    require(cap > 0, "cap must be positive")
    require(bits >= 1 && bits <= 16, "bits must be in [1,16]")
    val bucket = (0 until bits).map(d =>
        when(element_at(col("embedding"), d + 1) > lit(0.0f), lit(1 << d)).otherwise(lit(0)))
      .reduce(_ + _)
    val drawNum = conv(hashDraw(col("vec_id")), 16, 10).cast("double")
    embeddings.select(col("vec_id"), bucket.as("bucket"), drawNum.as("draw"))
      .groupBy(col("bucket"))
      .agg(graft.functions.TopKAggregator.topK(cap, -col("draw"), col("vec_id")).as("top"))
      .select(col("bucket"), posexplode(col("top")))
      .select(col("bucket"), (col("pos") + 1).cast("long").as("draw_rank"),
        col("col.id").as("vec_id"))
      .orderBy(col("bucket"), col("draw_rank"))
  }
}
