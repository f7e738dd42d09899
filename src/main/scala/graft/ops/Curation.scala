package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators — the privacy / decontamination / repetition /
  * packing stages a large-scale training-data pipeline runs between raw
  * ingest and tokenization (builder-prompt scale extensions; complements
  * TextAnalysis's language/quality/dedup gates).
  *
  * Scale shapes, per operator:
  *  - PII redaction: one narrow projection of codegen'd regexps — map-only,
  *    no shuffle, column-pruned to (doc_id, text).
  *  - Decontamination: the benchmark side of the n-gram join is tiny by
  *    construction (eval sets are thousands of docs, not billions), so it
  *    BROADCASTS; corpus n-grams are generated map-side by a transform()
  *    over each row and never shuffle — the only wide stage is the per-doc
  *    count of matched n-grams.
  *  - Repetition signals: top-n-gram counts per doc are computed INSIDE the
  *    row (sort the row's n-gram array, fold for the longest run) — a
  *    map-only alternative to the classic explode→groupBy(doc, gram) whose
  *    shuffle would be corpus-token-sized at 100 TB.
  *  - Sequence packing: a distributed prefix sum — per-range-bucket token
  *    totals (constant-size driver collect) feed exclusive offsets, and
  *    each bucket computes its local running sum independently; no global
  *    single-partition window anywhere.
  */
object Curation {

  // ---- PII detection / redaction -----------------------------------------

  /** (pattern, replacement) in application order. Patterns are RE2-safe
    * (no backrefs/lookaround) so Spark (java.util.regex) and DuckDB (RE2)
    * agree on every match.
    */
  val piiPatterns: Seq[(String, String, String)] = Seq(
    ("email", """[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}""", "[EMAIL]"),
    ("phone", """555-[0-9]{4}""", "[PHONE]"),
    ("ip", """([0-9]{1,3}\.){3}[0-9]{1,3}""", "[IP]"))

  /** Per-doc PII match counts + the redacted text. Map-only: three codegen
    * regexp_extract_all counts and a chained regexp_replace over one scan.
    */
  /** C4-style LINE-level cleaning (Raffel et al. 2020, §2.2 — the cleaning
    * recipe behind the C4 corpus), the surgery tier between doc-level
    * quality gates (which drop whole documents) and span-level dedup: a
    * crawled page is mostly boilerplate LINES (menus, buttons, code), and
    * C4's fix is to keep only the prose lines and re-assemble the page.
    *
    * Line rules (a line survives iff ALL hold):
    *  - ends in terminal punctuation (`.` `!` `?` or a closing quote);
    *  - carries at least `minWordsPerLine` words;
    *  - does not contain the word "javascript" (the enable-JS boilerplate).
    * Document rules, applied to the RAW text (C4 drops these pages whole):
    *  - contains "lorem ipsum" → verdict `lorem_ipsum`;
    *  - contains a curly brace → verdict `brace` (code, not prose);
    *  - fewer than `minLines` surviving lines → verdict `too_short`.
    *
    * Output: one row per input doc — (doc_id, n_lines, n_kept, verdict,
    * clean_text), where clean_text is the surviving lines re-joined for
    * `kept` docs and NULL for dropped ones. Every rule is a codegen'd
    * string/array expression over one projection: map-only, no shuffle,
    * column-pruned to (doc_id, text) — the same 100-TB shape as the PII
    * pass. (C4's remaining rules live elsewhere: the bad-words list is the
    * keyword gate, three-sentence-span dedup is [[removeDupSpans]].)
    */
  def c4LineClean(docs: DataFrame, minWordsPerLine: Int = 3,
      minLines: Int = 5): DataFrame =
    c4LineSignals(docs, minWordsPerLine, minLines)
      .select(col("doc_id"), col("n_lines"), col("n_kept"), col("verdict"),
        col("clean_text"))
      .orderBy(col("doc_id"))

  /** [[c4LineClean]] minus its presentation sort and canonical projection —
    * the form that runs verbatim on an unaggregated STREAM (the
    * gopherSignals precedent) and composes into pipelines: every input
    * column PASSES THROUGH (a downstream gate still needs lang/source),
    * with (n_lines, n_kept, verdict, clean_text) appended. Every rule is a
    * row-local projection, so stream output equals batch output
    * bit-for-bit (`StreamingSpec`).
    */
  def c4LineSignals(docs: DataFrame, minWordsPerLine: Int = 3,
      minLines: Int = 5): DataFrame = {
    val lines = split(col("text"), "\n")
    // keyword rules match case-insensitively (the C4 recipe lowercases
    // before matching — real boilerplate says "JavaScript"/"Lorem Ipsum")
    val keepLine = (l: Column) =>
      substring(l, -1, 1).isin(".", "!", "?", "\"") &&
        (size(split(l, " ")) >= minWordsPerLine) &&
        !lower(l).contains("javascript")
    val kept = filter(lines, keepLine)
    docs
      .withColumn("n_lines", size(lines).cast("long"))
      .withColumn("n_kept", size(kept).cast("long"))
      .withColumn("verdict",
        when(lower(col("text")).contains("lorem ipsum"), "lorem_ipsum")
          .when(col("text").contains("{"), "brace")
          .when(col("n_kept") < minLines, "too_short")
          .otherwise("kept"))
      .withColumn("clean_text",
        when(col("verdict") === "kept", array_join(kept, "\n")))
  }

  def redactPii(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val counts = piiPatterns.map { case (name, pat, _) =>
      size(regexp_extract_all(col(textCol), lit(pat), lit(0))).cast("long").as(s"n_${name}s")
    }
    val redacted = piiPatterns.foldLeft(col(textCol)) { case (c, (_, pat, repl)) =>
      regexp_replace(c, pat, repl)
    }
    docs.select(col("doc_id") +: counts :+ redacted.as("redacted"): _*)
  }

  // ---- Decontamination (benchmark n-gram overlap) ------------------------

  /** Word n-grams of a text column as one array per row (map-side; empty
    * when the doc is shorter than n — sequence() would count DOWN there).
    */
  def ngrams(textCol: Column, n: Int): Column = {
    val words = split(textCol, " ")
    when(size(words) >= n,
      transform(sequence(lit(1), size(words) - n + 1),
        i => concat_ws(" ", slice(words, i, lit(n)))))
      .otherwise(array().cast("array<string>"))
  }

  /** Corpus docs sharing at least one word n-gram with any benchmark doc,
    * with the count of distinct shared n-grams — the "test-set leakage"
    * report. The benchmark n-gram set broadcasts (eval suites are tiny
    * relative to a training corpus); corpus n-grams never shuffle raw —
    * only (doc_id, matched n-gram) survivors reach the aggregation.
    */
  def contaminatedDocs(corpus: DataFrame, benchmark: DataFrame, n: Int = 4): DataFrame = {
    val benchNgrams = benchmark
      .select(explode(ngrams(col("text"), n)).as("ng")).distinct()
    corpus
      .select(col("doc_id"), explode(ngrams(col("text"), n)).as("ng"))
      .join(broadcast(benchNgrams), "ng")
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("ng")).as("n_shared"))
      .orderBy(col("doc_id"))
  }

  /** The removal form: corpus minus every contaminated doc (anti-join on
    * the report above).
    */
  def decontaminate(corpus: DataFrame, benchmark: DataFrame, n: Int = 4): DataFrame =
    corpus.join(contaminatedDocs(corpus, benchmark, n).select(col("doc_id")),
      Seq("doc_id"), "left_anti")

  /** Span-surgery decontamination — the GPT-3 appendix-C method: instead
    * of dropping every document that shares an n-gram with the benchmark
    * (whole-doc removal throws away a long document for one leaked
    * sentence), cut the matched window PLUS a `margin`-token buffer on
    * each side out of the document and keep the clean pieces, dropping
    * pieces shorter than `minPiece` tokens (fragments too short to train
    * on). Output: one row per kept piece — (doc_id, piece_idx, start_pos,
    * n_piece_tokens, piece_text), piece_idx numbered among KEPT pieces in
    * document order. A document with no contamination comes back as its
    * single piece 1; a saturated document vanishes.
    *
    * Scale shape: benchmark grams broadcast (the `contaminatedDocs`
    * contract); the corpus explodes once into (doc_id, pos, token) — one
    * doc_id-keyed shuffle, the `spanDupFractions` cost class — dirty
    * positions come only from matched grams (hit-bounded), and the
    * pieces are classic gaps-and-islands: pos − row_number() per doc, one
    * per-doc window, never a global one.
    */
  def decontaminateSpans(corpus: DataFrame, benchmark: DataFrame, n: Int = 4,
      margin: Int = 2, minPiece: Int = 5): DataFrame = {
    require(margin >= 0 && minPiece >= 1, "margin >= 0 and minPiece >= 1")
    val benchNgrams = benchmark
      .select(explode(ngrams(col("text"), n)).as("ng")).distinct()
    val toks = Par.seed(corpus, col("doc_id"))
      .select(col("doc_id"), posexplode(split(col("text"), " ")))
      .select(col("doc_id"), (col("pos") + 1).as("pos"), col("col").as("tok"))
    val grams = corpus
      .select(col("doc_id"), posexplode(ngrams(col("text"), n)))
      .select(col("doc_id"), (col("pos") + 1).as("gpos"), col("col").as("ng"))
    // every token position covered by a matched gram's [−margin, +margin]
    // halo; out-of-range positions anti-join as no-ops
    val dirty = grams.join(broadcast(benchNgrams), "ng")
      .select(col("doc_id"),
        explode(sequence(col("gpos") - margin, col("gpos") + (n - 1) + margin)).as("pos"))
      .distinct()
    val clean = toks.join(dirty, Seq("doc_id", "pos"), "left_anti")
    val byPos = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val pieces = clean
      .withColumn("grp", col("pos") - row_number().over(byPos))
      .groupBy(col("doc_id"), col("grp"))
      .agg(count(lit(1)).as("n_piece_tokens"),
        min(col("pos")).cast("long").as("start_pos"),
        array_join(
          transform(array_sort(collect_list(struct(col("pos"), col("tok")))),
            x => x.getField("tok")), " ").as("piece_text"))
      .filter(col("n_piece_tokens") >= minPiece)
    pieces
      .withColumn("piece_idx",
        row_number().over(Window.partitionBy(col("doc_id")).orderBy(col("start_pos"))).cast("long"))
      .select(col("doc_id"), col("piece_idx"), col("start_pos"),
        col("n_piece_tokens"), col("piece_text"))
      .orderBy(col("doc_id"), col("piece_idx"))
  }

  /** Bloom-guarded contamination report — output ≡ `contaminatedDocs`
    * (same rows, same counts), different 100-TB shape for the regime where
    * the benchmark suite is too large to broadcast as ROWS (hundreds of
    * eval sets, billions of held-out n-grams): the corpus gram stream is
    * pre-filtered by a Bloom fingerprint of the benchmark grams BEFORE the
    * exact join, so the join's probe input shrinks to true matches plus an
    * `fpp` share of the rest — on a mostly-clean corpus that cuts the wide
    * stage by ~(1 − fpp) while the downstream exact string join keeps the
    * result EXACT (Bloom has no false negatives; false positives die in
    * the join). The filter itself is a bounded driver artifact (~1.2 GB at
    * 1B grams / 1% fpp) built by Spark's distributed sketch aggregation —
    * the same artifact class as the IVF centroid sidecar.
    *
    * No broadcast hint on the exact join: AQE broadcasts the benchmark
    * side when it IS small and shuffles both sides when it isn't — the
    * bloom guard is what keeps the corpus side of that shuffle bounded.
    */
  def contaminatedDocsBloom(corpus: DataFrame, benchmark: DataFrame, n: Int = 4,
      fpp: Double = 0.01): DataFrame = {
    import org.apache.spark.sql.GraftSqlBridge
    val benchNgrams = benchmark
      .select(explode(ngrams(col("text"), n)).as("ng")).distinct()
      .localCheckpoint(true) // three consumers: size, bloom build, exact join
    val expected = math.max(1L, benchNgrams.count())
    val bloom = benchNgrams.select(xxhash64(col("ng")).as("gh"))
      .stat.bloomFilter("gh", expected, fpp)
    val mightContain = GraftSqlBridge.column(
      graft.functions.BloomMightContainLong.fromFilter(
        GraftSqlBridge.expression(xxhash64(col("ng"))), bloom))
    corpus
      .select(col("doc_id"), explode(ngrams(col("text"), n)).as("ng"))
      .filter(mightContain)
      .join(benchNgrams, "ng")
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("ng")).as("n_shared"))
      .orderBy(col("doc_id"))
  }

  // ---- Repetition signals (Gopher-style quality filters) -----------------

  /** Longest run of equal values in the SORTED array `arr` — i.e. the max
    * occurrence count of any single value — as a row-local fold: sort the
    * row's array, then one linear aggregate() pass. This keeps the top-gram
    * statistic map-only; the explode→groupBy(doc, gram)→max alternative
    * shuffles every token in the corpus.
    */
  private def maxRunSql(arr: String): String =
    s"""aggregate(array_sort($arr),
       |  named_struct('prev', CAST(NULL AS STRING), 'run', 0L, 'best', 0L),
       |  (acc, x) -> named_struct(
       |    'prev', x,
       |    'run', IF(acc.prev <=> x, acc.run + 1L, 1L),
       |    'best', GREATEST(acc.best, IF(acc.prev <=> x, acc.run + 1L, 1L))),
       |  acc -> acc.best)""".stripMargin

  /** Per-doc repetition statistics: duplicate-word fraction, top-bigram
    * fraction, top-trigram fraction — the standard repetitious-text gates
    * (cf. the Gopher/MassiveText quality rules: fraction of characters in
    * the most common n-gram). One projection, no shuffle.
    *
    * Docs too short for an n-gram keep their row with a NULL fraction:
    * sequence(1, size-n+1) counts DOWN below n words (sequence(1,0) =
    * [1,0]), so the gram arrays are guarded the same way ngrams() is, and
    * the fraction denominators are guarded against <= 0.
    */
  def repetitionSignals(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .withColumn("n_words", size(col("ws")).cast("long"))
      .withColumn("bgs", when(col("n_words") >= 2, expr(
        "transform(sequence(1, size(ws)-1), i -> concat_ws(' ', ws[i-1], ws[i]))"))
        .otherwise(array().cast("array<string>")))
      .withColumn("tgs", when(col("n_words") >= 3, expr(
        "transform(sequence(1, size(ws)-2), i -> concat_ws(' ', ws[i-1], ws[i], ws[i+1]))"))
        .otherwise(array().cast("array<string>")))
      .withColumn("top_bg", expr(maxRunSql("bgs")))
      .withColumn("top_tg", expr(maxRunSql("tgs")))
      .select(col("doc_id"), col("n_words"),
        (lit(1.0) - size(array_distinct(col("ws"))).cast("double") / col("n_words"))
          .as("dup_word_frac"),
        when(col("n_words") >= 2,
          col("top_bg").cast("double") / (col("n_words") - 1)).as("top_bigram_frac"),
        when(col("n_words") >= 3,
          col("top_tg").cast("double") / (col("n_words") - 2)).as("top_trigram_frac"))
      .orderBy(col("doc_id"))

  // ---- Sequence packing (concat-and-chunk) -------------------------------

  /** Length-bucketed batching audit — the dynamic-batching prep step: cut
    * the token-length distribution at its k-quantiles, assign each doc to
    * a bucket, and report the PADDING WASTE each bucket pays batching to
    * its own max length, next to the single-global-bucket baseline
    * (bucket 0). Padding to a per-bucket max instead of the corpus max is
    * the standard attention-FLOPs saver; this is the measurement that
    * justifies the cut points.
    *
    * The cuts come from the distributed exact-quantile engine
    * ([[Relational.exactQuantilesDistributed]] — bucket-located order
    * statistics whose interpolation matched DuckDB `quantile_cont`
    * bitwise), collected as a (k−1)-length driver array; assignment is
    * then map-only against the literal cuts (`len > cut` counts, so a
    * doc AT a cut value falls to the lower bucket — mirrored in the
    * oracle). Waste arithmetic is all-long; the fraction is the single
    * trailing double division.
    */
  def lengthBuckets(docs: DataFrame, nBuckets: Int = 4): DataFrame = {
    require(nBuckets >= 2, "need at least two buckets to cut anything")
    val toks = docs.select(col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .localCheckpoint(true) // feeds the quantile passes and the assignment
    val qs = (1 until nBuckets).map(_.toDouble / nBuckets)
    val cuts = graft.ops.Relational.exactQuantilesDistributed(
        toks.withColumn("g", lit(1)), "g", "n_tokens", qs)
      .orderBy(col("q")).collect().map(_.getAs[Double]("quantile"))
    val bucket = cuts.foldLeft(lit(1L).cast("long"))((acc, c) =>
      acc + when(col("n_tokens").cast("double") > lit(c), 1L).otherwise(0L))
    val assigned = toks.withColumn("bucket", bucket)
    def rollup(df: DataFrame, bucketCol: Column): DataFrame = df
      .groupBy(bucketCol.as("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("n_tokens")).as("min_tokens"),
        max(col("n_tokens")).as("max_tokens"),
        sum(col("n_tokens")).as("sum_tokens"))
    rollup(assigned, col("bucket")).unionByName(rollup(assigned, lit(0L)))
      .withColumn("pad_waste",
        col("n_docs") * col("max_tokens") - col("sum_tokens"))
      .withColumn("waste_frac", col("pad_waste").cast("double") /
        (col("n_docs") * col("max_tokens")).cast("double"))
      .orderBy(col("bucket"))
  }

  /** Assign each doc its position in the concatenated token stream and the
    * fixed-size training sequence that position falls in (GPT-style
    * concat-then-chunk packing: the stream is cut every `budget` tokens; a
    * doc belongs to the chunk where it starts).
    *
    * The global running sum is a DISTRIBUTED prefix sum, not one global
    * window: docs bucket by contiguous doc_id range; per-bucket token
    * totals (≤ nBuckets longs) come to the driver once and become
    * exclusive prefix offsets; each bucket then windows only over its own
    * rows. At 100 TB no task ever sees more than one bucket.
    */
  def packSequences(docs: DataFrame, budget: Int = 512, nBuckets: Int = 32): DataFrame = {
    val toks = docs.select(col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("n_tokens"))
    val maxIdRow = toks.agg(max(col("doc_id"))).head
    if (maxIdRow.isNullAt(0)) // empty corpus: empty result, same schema
      return toks.withColumn("start_off", lit(0L)).withColumn("seq_id", lit(0L))
        .select(col("doc_id"), col("n_tokens"), col("start_off"), col("seq_id"))
    val maxId = maxIdRow.getLong(0)
    val span = maxId / nBuckets + 1
    // integer DIV, not double division: exact for ids beyond 2^53
    val bucketed = toks.withColumn("bucket", expr(s"CAST(doc_id DIV $span AS INT)"))
    val totals = bucketed.groupBy(col("bucket"))
      .agg(sum(col("n_tokens")).as("t")).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val offsets: Seq[Long] = (0 until nBuckets)
      .scanLeft(0L)((acc, b) => acc + totals.getOrElse(b, 0L)).init
    val w = Window.partitionBy(col("bucket")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    bucketed
      .withColumn("start_off",
        coalesce(sum(col("n_tokens")).over(w), lit(0L)) +
          element_at(typedLit(offsets), col("bucket") + 1))
      .withColumn("seq_id", expr(s"start_off div $budget"))
      .select(col("doc_id"), col("n_tokens"), col("start_off"), col("seq_id"))
      .orderBy(col("doc_id"))
  }

  // ---- Span-level duplication (corpus-internal) --------------------------

  /** Per-doc duplicated-span fraction: the share of a doc's word n-gram
    * occurrences whose n-gram text also appears in at least one OTHER doc
    * — the span-level duplication metric of the Gopher/RefinedWeb family
    * (their suffix-array exact-substring dedup, re-expressed as the
    * n-gram-hash form that distributes). Complements doc-level dedup
    * (which drops whole documents) by quantifying boilerplate INSIDE
    * kept documents.
    *
    * Scale shape — ONE corpus-wide shuffle, then dup-only work:
    *  - the occurrence stream (doc_id, gram-hash) derives EXACTLY TWICE
    *    from the doc scan, and each derivation evaluates the n-gram
    *    transform once per doc (explode over the generator directly — no
    *    sibling size()/filter() columns that would re-evaluate the
    *    quadratic gram build per row).
    *  - n-grams hash to md5 before the wide stage (16-byte keys, not raw
    *    spans); the single corpus-token-sized aggregation keys on the
    *    gram hash and computes min/max doc_id — a gram is cross-doc iff
    *    min ≠ max, so no distinct-expand and no second corpus-wide pass.
    *  - the join-back BROADCASTS the dup-gram keys (typically a small
    *    fraction of the key space) against the occurrence stream, and
    *    `n_grams` folds into the SAME per-doc aggregation as the dup
    *    count — no third corpus pass and no doc-keyed re-join. (If a
    *    pathologically boilerplate-heavy corpus outgrows the broadcast
    *    budget, drop the hint: AQE falls back to a bloom-pruned shuffle
    *    join and the rest of the shape is unchanged.)
    *  - the doc stream rebalances by doc_id BEFORE gram expansion when
    *    the scan has fewer splits than the cluster has slots (the small-
    *    file case; a no-op guard at real corpus scale where splits are
    *    plentiful) — the cheapest point to seed parallelism, and the
    *    broadcast join preserves that partitioning so the per-doc
    *    aggregation needs no further exchange.
    * This is the honest exact form — the probabilistic tier above it is
    * the MinHash family.
    */
  def spanDupFractions(docs: DataFrame, n: Int = 4): DataFrame = {
    val occ = Par.seed(docs, col("doc_id"))
      .select(col("doc_id"), explode(ngrams(col("text"), n)).as("g"))
      .select(col("doc_id"), md5(col("g")).as("gh"))
    val dupGhs = occ
      .groupBy(col("gh"))
      .agg(min(col("doc_id")).as("mn"), max(col("doc_id")).as("mx"))
      .filter(col("mn") =!= col("mx"))
      .select(col("gh"), lit(true).as("is_dup"))
    occ
      .join(broadcast(dupGhs), Seq("gh"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("is_dup"), 1L).otherwise(0L)).as("n_dup_grams"))
      .withColumn("dup_span_frac",
        col("n_dup_grams").cast("double") / col("n_grams").cast("double"))
      .select(col("doc_id"), col("n_grams"), col("n_dup_grams"), col("dup_span_frac"))
      .orderBy(col("doc_id"))
  }

  // ---- Vocabulary tokenization -------------------------------------------

  /** Frequency vocabulary: the top `size` words by (count desc, word asc) —
    * a bounded artifact (like the IVF centroid sidecar), so it collects to
    * the driver and ids assign there. One aggregation + TakeOrdered; at
    * 100 TB the agg is the only wide stage and its key space is the
    * vocabulary, not the corpus.
    */
  def buildVocab(docs: DataFrame, size: Int = 1000): Array[(String, Int)] =
    docs.select(explode(split(col("text"), " ")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("w")).limit(size)
      .collect().map(_.getString(0)).zipWithIndex

  /** Map-only tokenization against a fixed vocabulary: every word becomes
    * its vocab id (OOV → `unkId` = vocab size), via a literal map — one
    * codegen projection, no shuffle, no per-token join. Emits the id
    * sequence as a joined string (engine-portable, hash-comparable) plus
    * token/UNK counts.
    */
  def tokenize(docs: DataFrame, vocab: Array[(String, Int)]): DataFrame = {
    require(vocab.nonEmpty, "tokenize needs a non-empty vocabulary")
    val unkId = vocab.length
    val vocabMap = map(vocab.flatMap { case (w, id) => Seq(lit(w), lit(id)) }.toSeq: _*)
    val ids = transform(split(col("text"), " "),
      w => coalesce(element_at(vocabMap, w), lit(unkId)))
    docs.select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"),
        size(filter(ids, i => i === unkId)).cast("long").as("n_unk"),
        array_join(ids, " ").as("token_str"))
      .orderBy(col("doc_id"))
  }

  /** Markup stripping — the extraction stage a crawl pipeline runs before
    * any text analysis (the trafilatura/jusText class, reduced to its
    * deterministic core): drop every `<...>` tag (replaced by a space so
    * adjacent words never merge), unescape the five predefined HTML
    * entities, collapse runs of spaces, trim. Returns (doc_id, n_tags,
    * text) in ONE map-only projection — no shuffle, the `redactPii`
    * shape.
    *
    * Cross-engine discipline (the PII-op precedent): every regex here is
    * RE2-safe (`<[^>]*>`, `[ ]+` — no backrefs, no lookaround) so Spark's
    * Java regex and DuckDB's RE2 agree byte-for-byte; entity unescaping
    * is plain string replacement with `&amp;` LAST (unescaping it first
    * would double-decode `&amp;lt;`).
    */
  def stripMarkup(docs: DataFrame): DataFrame = {
    val untagged = regexp_replace(col("text"), "<[^>]*>", " ")
    val unescaped = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&amp;" -> "&")
      .foldLeft(untagged) { case (c, (ent, ch)) =>
        replace(c, lit(ent), lit(ch))
      }
    docs.select(col("doc_id"),
        size(regexp_extract_all(col("text"), lit("<[^>]*>"), lit(0)))
          .cast("long").as("n_tags"),
        trim(regexp_replace(unescaped, "[ ]+", " ")).as("text"))
      .orderBy(col("doc_id"))
  }

  /** Per-source vocabulary-coverage / fertility audit — the data-card
    * number a tokenizer decision needs: what share of each source's tokens
    * a candidate vocabulary fails to cover (OOV → UNK mass, which directly
    * degrades training), plus chars-per-token (the fertility proxy:
    * sources with long rare words tokenize worse). Map-only per-doc
    * counting against the literal vocab map (no join, the `tokenize`
    * shape), then ONE aggregation whose key space is the source list.
    */
  def vocabCoverage(docs: DataFrame, vocab: Array[(String, Int)]): DataFrame = {
    require(vocab.nonEmpty, "vocabCoverage needs a non-empty vocabulary")
    val vocabMap = map(vocab.flatMap { case (w, _) => Seq(lit(w), lit(1)) }.toSeq: _*)
    val toks = split(col("text"), " ")
    docs.select(col("source"),
        size(toks).cast("long").as("n_tokens"),
        size(filter(toks, w => element_at(vocabMap, w).isNull)).cast("long").as("n_oov"),
        length(col("text")).cast("long").as("n_chars"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        sum(col("n_oov")).as("n_oov"),
        sum(col("n_chars")).as("n_chars"))
      .withColumn("oov_rate",
        col("n_oov").cast("double") / col("n_tokens").cast("double"))
      .withColumn("chars_per_token",
        col("n_chars").cast("double") / col("n_tokens").cast("double"))
      .orderBy(col("source"))
  }

  // ---- Training-example assembly -----------------------------------------

  /** The end-of-pipeline materialization: one row per doc carrying the
    * signals every curation stage produced — predicted language, quality,
    * token count, packed-sequence assignment, and the doc's embedding norm
    * (left join on the embeddings table; −1 when the doc has no vector).
    * One plan: the per-doc signals fuse into one scan of documents, the
    * pack offsets ride the distributed prefix sum, and the embedding join
    * is the only corpus-corpus shuffle (broadcast when one side is small).
    */
  def assembleExamples(docs: DataFrame, embeddings: DataFrame,
      budget: Int = 512): DataFrame = {
    val lang = TextAnalysis.languageId(docs).select(col("doc_id"), col("pred_lang"))
    val qual = TextAnalysis.qualityScore(docs).select(col("doc_id"), col("quality"))
    val pack = packSequences(docs, budget).select(col("doc_id"), col("n_tokens"), col("seq_id"))
    val norms = embeddings.select(col("vec_id").as("doc_id"),
      sqrt(graft.functions.VectorFunctions.dot(col("embedding"), col("embedding"))).as("emb_norm"))
    docs.select(col("doc_id"), col("source"))
      .join(lang, "doc_id").join(qual, "doc_id").join(pack, "doc_id")
      .join(norms, Seq("doc_id"), "left")
      .select(col("doc_id"), col("source"), col("pred_lang"), col("quality"),
        col("n_tokens"), col("seq_id"), coalesce(col("emb_norm"), lit(-1.0)).as("emb_norm"))
      .orderBy(col("doc_id"))
  }

  /** True bin-packing variant (first-fit within each partition): docs that
    * don't fit the current bin open a new one, so no doc spans a boundary
    * — the padding-minimizing form used when documents must stay intact.
    * Sequential by nature, so it runs per-partition (mapPartitions) with
    * globally-unique bin ids derived from the partition id; bin membership
    * depends on partitioning, hence spec-level (deterministic under a
    * fixed repartitionByRange) rather than oracle-checked.
    *
    * `n_tokens` is the TRUE document length; only the bin accounting clamps
    * to the budget, and an over-budget doc is flagged (`over_budget`) —
    * such a doc occupies a bin alone rather than silently misreporting its
    * length.
    */
  def packFirstFit(docs: DataFrame, budget: Int = 512, nPartitions: Int = 32): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val toks = docs.select(col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .repartitionByRange(nPartitions, col("doc_id"))
      .sortWithinPartitions(col("doc_id"))
      .as[(Long, Long)]
    toks.mapPartitions { it =>
      var binInPart = 0L
      var used = budget + 1L // over-budget sentinel: first doc opens a bin
      val pid = org.apache.spark.TaskContext.getPartitionId().toLong
      it.map { case (docId, n) =>
        val fit = math.min(n, budget.toLong) // bin-accounting value only
        if (used + fit > budget) { binInPart += 1; used = 0L }
        used += fit
        // bin id: partition-local counter offset into a per-partition range
        (docId, n, n > budget, pid * (1L << 40) + binInPart, used - fit)
      }
    }.toDF("doc_id", "n_tokens", "over_budget", "bin_id", "off_in_bin")
  }

  /** Sliding-window document chunking — the long-document splitter of a
    * training pipeline: each doc explodes into windows of `chunkTokens`
    * whitespace tokens advancing by `stride` (stride < chunkTokens ⇒
    * overlapping context windows, the usual pretraining shape). The final
    * window is the possibly-short tail; chunk starts are exactly
    * {1, 1+stride, 2·stride+1, …} clipped to the doc, each start emitted
    * once. Map-only: one explode over a row-local sequence, no shuffle —
    * at 100 TB this is a projection, and the (doc_id, chunk_id) key is
    * stable for downstream packing/dedup.
    */
  def chunkDocs(docs: DataFrame, chunkTokens: Int = 32, stride: Int = 24): DataFrame = {
    require(chunkTokens >= 1 && stride >= 1 && stride <= chunkTokens,
      "need 1 <= stride <= chunkTokens")
    val ws = split(col("text"), " ")
    // number of windows: 1 + ceil(max(0, n_words - chunkTokens) / stride)
    val nChunks = lit(1) + ceil(
      greatest(size(ws) - chunkTokens, lit(0)).cast("double") / stride).cast("int")
    docs
      .select(col("doc_id"), ws.as("ws"),
        explode(sequence(lit(0), nChunks - 1)).as("chunk_id"))
      .select(col("doc_id"), col("chunk_id").cast("long").as("chunk_id"),
        (col("chunk_id") * stride + 1).cast("long").as("start_tok"),
        slice(col("ws"), col("chunk_id") * stride + 1, lit(chunkTokens)).as("toks"))
      .select(col("doc_id"), col("chunk_id"), col("start_tok"),
        size(col("toks")).cast("long").as("n_tokens"),
        concat_ws(" ", col("toks")).as("chunk_text"))
      .orderBy(col("doc_id"), col("chunk_id"))
  }

  /** The composed ingest pipeline — exact dedup → decontaminate →
    * language/quality gate → source mixture — as ONE declarative plan, the
    * full curation pass a crawl snapshot takes before training. Each stage
    * is the already-verified operator; composing them in one plan (instead
    * of materializing between stages) lets Catalyst prune every column the
    * final mixture doesn't need all the way into the scans, and the
    * corpus-sized shuffles stay at exactly three: the text-hash window
    * (dedup), the n-gram contamination aggregation's doc_id anti-join side,
    * and the per-source mixture window.
    *
    * Stage order is the production order: dedup first (cheapest filter,
    * biggest volume cut on crawl data), decontamination before the gate
    * (a contaminated doc must never reach training even if high-quality),
    * mixture last (budgets apply to the CLEAN corpus).
    */
  def curationPipeline(corpus: DataFrame, benchmark: DataFrame,
      weights: Map[String, Double], tokenBudget: Long,
      lang: String = "en", minQuality: Double = 0.55, n: Int = 4): DataFrame = {
    // Exact dedup: keep the min-id copy of each distinct text. The window
    // shuffles on the text hash — the same single-shuffle shape as
    // Dedup.exactDupGroups, but survivor-producing instead of report-producing.
    val keepW = org.apache.spark.sql.expressions.Window.partitionBy(md5(col("text")))
    val deduped = corpus
      .withColumn("keep_id", min(col("doc_id")).over(keepW))
      .filter(col("doc_id") === col("keep_id")).drop("keep_id")
    // Contamination is a per-doc property (it depends only on the
    // benchmark, never on other corpus docs), so the contaminated id set
    // comes from the RAW corpus in a parallel branch — anti-joining it
    // against the dedup survivors gives the same result as
    // decontaminate(deduped) while consuming the windowed subtree ONCE
    // (deriving the n-gram stream from `deduped` would recompute the
    // text-hash window a second time; CurationSpec pins the single
    // occurrence).
    val contaminatedIds = contaminatedDocs(corpus, benchmark, n).select(col("doc_id"))
    val clean = deduped.join(contaminatedIds, Seq("doc_id"), "left_anti")
    val gated = TextAnalysis.gate(clean, lang, minQuality)
    Sampling.mixCorpus(gated, weights, tokenBudget)
  }

  // ---- Exact substring dedup (span REMOVAL) ------------------------------

  /** Exact substring deduplication (Lee et al. 2021, "Deduplicating
    * Training Data Makes Language Models Better"): every `n`-token span
    * that occurs more than once in the corpus keeps ONLY its globally
    * first occurrence (min (doc_id, position)); tokens covered by any
    * other occurrence are REMOVED and the document text is rebuilt from
    * the survivors in original order. The surgical complement of
    * `spanDupFractions`, which only measures the duplicated mass.
    *
    * Scale shape (the suffix-array batch pipeline re-expressed as joins):
    *  - one gram-hash-keyed aggregation finds each gram's global first
    *    occurrence and its occurrence count (`min(struct)` + count — no
    *    distinct-expand, no second corpus pass);
    *  - only multi-occurrence grams survive the filter, so the join back
    *    onto the occurrence stream carries the DUPLICATE mass, not the
    *    corpus (AQE broadcasts it on lightly-duplicated corpora);
    *  - covered positions explode from dup occurrences only (≤ n · dup
    *    mass rows), collapse to a per-doc position set, and the rebuild
    *    is one map-side indexed `filter` over the doc's own token array —
    *    docs with no removals never join anything.
    */
  /** CCNet-style corpus-wide PARAGRAPH deduplication (Wenzek et al. 2020,
    * §4.1): every paragraph (newline-separated) is normalized — lowercase,
    * digits and punctuation stripped — and each normalized paragraph keeps
    * only its global FIRST occurrence (min (doc_id, pos)); later
    * occurrences are cut from their documents and the text rebuilt. This
    * removes the dominant crawl artifact — site-level boilerplate
    * (navigation, copyright lines, cookie banners) repeated across
    * thousands of pages — that document-level dedup can never see.
    *
    * Output: (doc_id, n_pars, n_kept, dedup_text), dedup_text NULL when
    * every paragraph was a later duplicate. Paragraphs whose normalized
    * form is empty (whitespace / pure punctuation) never participate:
    * hashing them would collapse every blank line in the corpus onto one
    * global survivor.
    *
    * Scale shape ([[removeDupSpans]] discipline):
    *  - ONE map-side-combined aggregation on the normalized paragraph
    *    finds first occurrence + count — no window sort, so a boilerplate
    *    line repeated 10⁸ times combines map-side instead of sorting in
    *    one task;
    *  - only multi-occurrence paragraphs survive (`cnt > 1`) so the join
    *    back carries the DUPLICATE mass, not the corpus (AQE broadcasts
    *    it on lightly-duplicated corpora); a hot key hash-joins without
    *    buffering — work stays linear per row;
    *  - the rebuild is one per-doc aggregation (doc-bounded state).
    */
  def paragraphDedup(docs: DataFrame): DataFrame = {
    val lines = Par.seed(docs, col("doc_id"))
      .select(col("doc_id"), posexplode(split(col("text"), "\n")).as(Seq("pos", "line")))
      .withColumn("norm", trim(regexp_replace(lower(col("line")), "[^a-z ]", "")))
    val dupFirst = lines.filter(col("norm") =!= "")
      .groupBy(col("norm"))
      .agg(min(struct(col("doc_id"), col("pos"))).as("f"), count(lit(1)).as("cnt"))
      .filter(col("cnt") > 1)
      .select(col("norm"), col("f.doc_id").as("f_doc"), col("f.pos").as("f_pos"))
    val marked = lines.join(dupFirst, Seq("norm"), "left")
      .withColumn("keep", col("f_doc").isNull ||
        (col("doc_id") === col("f_doc") && col("pos") === col("f_pos")))
    marked.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_pars"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
        sort_array(collect_list(when(col("keep"),
          struct(col("pos"), col("line"))))).as("kp"))
      .select(col("doc_id"), col("n_pars"), col("n_kept"),
        when(col("n_kept") > 0,
          array_join(transform(col("kp"), _.getField("line")), "\n"))
          .as("dedup_text"))
      .orderBy(col("doc_id"))
  }

  def removeDupSpans(docs: DataFrame, n: Int = 8): DataFrame = {
    // The gram-occurrence stream feeds two gh-keyed consumers (the
    // first-occurrence aggregation and the join-back). Deliberately
    // RECOMPUTED per consumer, not staged: the stream is ~n× corpus size,
    // so re-running the map-only scan+explode is cheaper than
    // materializing it (measured: localCheckpoint staging is ~2× slower
    // here and loses the hash partitioning across the checkpoint anyway).
    // The join-back — rather than a per-gram collect_list of occurrences
    // off the single shuffle — is the skew-safe choice: a degenerate
    // corpus where one gram repeats millions of times would otherwise
    // buffer all its occurrences in one aggregation task.
    val occ = Par.seed(docs, col("doc_id"))
      .select(col("doc_id"), posexplode(ngrams(col("text"), n)))
      .select(col("doc_id"), col("pos").as("p"), md5(col("col")).as("gh"))
    val dupFirst = occ.groupBy(col("gh"))
      .agg(min(struct(col("doc_id"), col("p"))).as("f"), count(lit(1)).as("cnt"))
      .filter(col("cnt") > 1)
      .select(col("gh"), col("f.doc_id").as("f_doc"), col("f.p").as("f_p"))
    val removedPos = occ.join(dupFirst, Seq("gh"))
      .filter(!(col("doc_id") === col("f_doc") && col("p") === col("f_p")))
      .select(col("doc_id"), explode(sequence(col("p"), col("p") + lit(n - 1))).as("pos"))
      .groupBy(col("doc_id"))
      .agg(collect_set(col("pos")).as("rem"))
    docs.join(removedPos, Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("rem").isNull, col("text")).otherwise(array_join(
          filter(split(col("text"), " "), (_, i) => !array_contains(col("rem"), i)),
          " ")).as("clean_text"),
        coalesce(size(col("rem")).cast("long"), lit(0L)).as("n_removed_tokens"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .orderBy(col("doc_id"))
  }
}
