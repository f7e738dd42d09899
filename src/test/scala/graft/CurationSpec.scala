package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.Curation

class CurationSpec extends SparkSpec {

  private def docsDF(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("C4 line cleaning: each line rule and each doc rule isolated") {
    val good = "one two three words here."
    val docs = docsDF(
      // every line rule in isolation, one surviving doc
      (1L, Seq(good,
        "no terminal punctuation at all", // dropped: no terminal punct
        "two words.", //                     dropped: < 3 words
        "please enable javascript to continue.", // dropped: javascript
        "ends with a question mark?", //     kept: ? is terminal
        "ends with a quote.\"", //           kept: closing quote
        good, good, good).mkString("\n")),
      // doc rules, each verdict in isolation
      (2L, (Seq.fill(6)(good) :+ "lorem ipsum dolor sit amet.").mkString("\n")),
      (3L, (Seq.fill(6)(good) :+ "function() { return 1; }.").mkString("\n")),
      (4L, Seq(good, good, good, good).mkString("\n"))) // 4 kept < 5 → too_short
    val got = graft.ops.Curation.c4LineClean(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(got(1L).getAs[String]("verdict") == "kept")
    assert(got(1L).getAs[Long]("n_lines") == 9 && got(1L).getAs[Long]("n_kept") == 6)
    assert(got(1L).getAs[String]("clean_text") ==
      Seq(good, "ends with a question mark?", "ends with a quote.\"",
        good, good, good).mkString("\n"),
      "surviving lines re-join in order, dropped lines excised")
    assert(got(2L).getAs[String]("verdict") == "lorem_ipsum")
    assert(got(3L).getAs[String]("verdict") == "brace")
    assert(got(4L).getAs[String]("verdict") == "too_short")
    // dropped docs carry no clean text
    Seq(2L, 3L, 4L).foreach(id => assert(got(id).isNullAt(got(id).fieldIndex("clean_text"))))
    // lorem takes precedence over brace over too_short (one doc, all three)
    val multi = docsDF((9L, "lorem ipsum { x }"))
    assert(graft.ops.Curation.c4LineClean(multi).head.getAs[String]("verdict") == "lorem_ipsum")
    // keyword rules are case-insensitive (C4 lowercases before matching) —
    // the dominant real-world capitalizations must hit too
    val cased = docsDF(
      (10L, (Seq.fill(6)(good) :+ "Please enable JavaScript to view content.").mkString("\n")),
      (11L, (Seq.fill(6)(good) :+ "Lorem Ipsum dolor sit amet.").mkString("\n")))
    val gotCased = graft.ops.Curation.c4LineClean(cased).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(gotCased(10L).getAs[Long]("n_kept") == 6, "JavaScript line dropped case-insensitively")
    assert(gotCased(11L).getAs[String]("verdict") == "lorem_ipsum",
      "Lorem Ipsum flags case-insensitively")
  }

  test("length buckets: quantile cuts, at-cut values fall low, waste arithmetic exact") {
    import spark.implicits._
    // token counts 1..8: quartile cuts (interpolated) at 2.75 / 4.5 / 6.25
    val docs = (1 to 8).map(n => (n.toLong, Seq.fill(n)("w").mkString(" ")))
      .toDF("doc_id", "text")
    val got = graft.ops.Curation.lengthBuckets(docs, nBuckets = 4).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6)))).toMap
    // buckets 1..4 hold {1,2},{3,4},{5,6},{7,8}; global row is bucket 0
    assert(got.keySet == Set(0L, 1L, 2L, 3L, 4L))
    for ((b, mx) <- Seq(1L -> 2L, 2L -> 4L, 3L -> 6L, 4L -> 8L)) {
      val (n, mn, m, sum, waste, frac) = got(b)
      assert(n == 2L && m == mx && mn == mx - 1 && sum == 2 * mx - 1,
        s"bucket $b contents")
      assert(waste == 1L, s"pad to the bucket max: 2·$mx − ${2 * mx - 1}")
      assert(frac == 1.0 / (2.0 * mx))
    }
    val (gn, gmn, gmx, gsum, gwaste, gfrac) = got(0L)
    assert(gn == 8L && gmn == 1L && gmx == 8L && gsum == 36L && gwaste == 28L,
      "global baseline pads everything to the corpus max")
    assert(gfrac == 28.0 / 64.0)
    // bucketing saves: per-bucket waste sum (4) ≪ global waste (28)
    assert(Seq(1L, 2L, 3L, 4L).map(got(_)._5).sum < gwaste)
  }

  test("paragraph dedup: first occurrence wins, digit/punct-insensitive, empty lines pass") {
    val docs = docsDF(
      // doc 1 owns the first occurrence of the boilerplate line
      (1L, Seq("unique alpha text here.",
        "Copyright 2023 All Rights Reserved!",
        "more unique beta text.").mkString("\n")),
      // doc 2 repeats it with a DIFFERENT year and punctuation — same
      // normalized class, so it must be cut; its own line survives
      (2L, Seq("copyright 2024 all rights reserved.",
        "doc two keeps this line.").mkString("\n")),
      // doc 3: internal duplicate — the second occurrence inside the SAME
      // doc is also a later occurrence
      (3L, Seq("gamma gamma line.", "gamma gamma line.").mkString("\n")),
      // doc 4: every paragraph is a later duplicate → dedup_text NULL
      (4L, "unique alpha text here."),
      // doc 5: empty + punctuation-only lines never participate
      (5L, Seq("", "?!...", "delta survives.").mkString("\n")))
    val got = Curation.paragraphDedup(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(got(1L).getAs[Long]("n_kept") == 3 &&
      got(1L).getAs[String]("dedup_text").contains("Copyright 2023"),
      "the global first occurrence keeps its ORIGINAL surface form")
    assert(got(2L).getAs[Long]("n_pars") == 2 && got(2L).getAs[Long]("n_kept") == 1)
    assert(got(2L).getAs[String]("dedup_text") == "doc two keeps this line.",
      "the year-variant boilerplate is a later occurrence of the same normalized class")
    assert(got(3L).getAs[Long]("n_kept") == 1 &&
      got(3L).getAs[String]("dedup_text") == "gamma gamma line.",
      "within-doc repeats collapse to the first position")
    assert(got(4L).getAs[Long]("n_kept") == 0 && got(4L).isNullAt(got(4L).fieldIndex("dedup_text")),
      "a doc made entirely of later duplicates rebuilds to NULL")
    assert(got(5L).getAs[Long]("n_pars") == 3 && got(5L).getAs[Long]("n_kept") == 3,
      "empty-normalized lines pass through unconditioned")
  }

  test("paragraph index: shard ingest ≡ batch dedup, idempotent re-offer, delete frees") {
    import graft.text.ParagraphIndex
    val dir = java.nio.file.Files.createTempDirectory("graft-paridx").toString + "/idx"
    val shard1 = docsDF(
      (1L, "alpha one.\nshared boilerplate line."),
      (2L, "beta two.\nshared boilerplate line."))
    val shard2 = docsDF(
      (10L, "SHARED BOILERPLATE LINE!!\ngamma three."),
      (11L, "alpha one."))
    ParagraphIndex.build(spark, shard1, dir)
    val got1 = ParagraphIndex.ingestBatch(spark, dir, shard2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) null else r.getString(3)))
    // shard-at-a-time must equal the batch operator over the union
    // (shard1 ids < shard2 ids), restricted to the offered shard's rows
    val ref = graft.ops.Curation.paragraphDedup(shard1.unionByName(shard2))
      .filter(col("doc_id") >= 10L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) null else r.getString(3)))
    assert(got1.toSeq == ref.toSeq,
      "incremental ingest must reproduce the whole-corpus batch dedup")
    assert(got1.find(_._1 == 11L).get._4 == null,
      "a shard doc made entirely of resident paragraphs rebuilds to NULL")
    // idempotency: re-offering the SAME shard reproduces its output (the
    // self-match rule), instead of cutting everything against itself
    val got2 = ParagraphIndex.ingestBatch(spark, dir, shard2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) null else r.getString(3)))
    assert(got2.toSeq == got1.toSeq, "re-ingesting a shard must be a no-op")
    // takedown: deleting doc 1 frees the paragraphs it first claimed
    ParagraphIndex.delete(spark, dir, Seq(1L))
    val shard3 = docsDF((20L, "alpha one.\nshared boilerplate line."))
    val got3 = ParagraphIndex.ingestBatch(spark, dir, shard3).collect().head
    assert(got3.getLong(2) == 2L && got3.getString(3) ==
      "alpha one.\nshared boilerplate line.",
      "freed paragraphs are claimable again after the owner's deletion")
  }

  test("PII redaction counts and replaces emails, phones, IPs") {
    val docs = docsDF(
      1L -> "mail me at jane.doe@corp.example.org thanks",
      2L -> "call 555-1234 or 555-9999 tomorrow",
      3L -> "hosts 192.168.0.1 and 10.0.42.7 are down",
      4L -> "mixed a.b@c.io then 555-0000 then 8.8.8.8",
      5L -> "nothing sensitive here at all")
    val out = Curation.redactPii(docs).collect().map(r =>
      r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[Long]("n_emails") == 1 && out(1L).getAs[String]("redacted")
      == "mail me at [EMAIL] thanks")
    assert(out(2L).getAs[Long]("n_phones") == 2 && out(2L).getAs[String]("redacted")
      == "call [PHONE] or [PHONE] tomorrow")
    assert(out(3L).getAs[Long]("n_ips") == 2 && out(3L).getAs[String]("redacted")
      == "hosts [IP] and [IP] are down")
    assert(out(4L).getAs[Long]("n_emails") == 1 && out(4L).getAs[Long]("n_phones") == 1 &&
      out(4L).getAs[Long]("n_ips") == 1)
    assert(out(4L).getAs[String]("redacted") == "mixed [EMAIL] then [PHONE] then [IP]")
    assert(out(5L).getAs[String]("redacted") == "nothing sensitive here at all")
  }

  test("decontamination flags exactly the docs sharing an n-gram with the benchmark") {
    val bench = docsDF(100L -> "alpha beta gamma delta epsilon")
    val corpus = docsDF(
      1L -> "zzz alpha beta gamma delta yyy", // shares 2 distinct 4-grams? no: 1
      2L -> "beta gamma delta epsilon tail here", // shares 1
      3L -> "alpha beta gamma x delta epsilon", // longest shared run is 3 — no 4-gram
      4L -> "totally unrelated words in this doc",
      5L -> "tiny doc") // shorter than n: no n-grams, no crash
    val report = Curation.contaminatedDocs(corpus, bench, n = 4).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_shared")).toMap
    assert(report == Map(1L -> 1L, 2L -> 1L))
    val clean = Curation.decontaminate(corpus, bench, n = 4)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(clean.sameElements(Array(3L, 4L, 5L)))
  }

  test("span-surgery decontamination: matched window + margin cut out, clean pieces kept") {
    def toks(tag: String, n: Int, from: Int = 0): String =
      (from until from + n).map(i => s"$tag$i").mkString(" ")
    val bench = docsDF((100L, "b0 b1 b2 b3"))
    val corpus = docsDF(
      // 18 clean + the 4-gram at pos 19 + 18 clean: dirty [17, 24],
      // pieces 1..16 (16 toks) and 25..40 (16 toks)
      (1L, toks("p", 18) + " b0 b1 b2 b3 " + toks("q", 18)),
      // fully clean: one piece, the whole doc
      (2L, toks("c", 9)),
      // one token either side of the match: saturated, vanishes
      (3L, "x0 b0 b1 b2 b3 x1"),
      // clean runs of 4 < minPiece on both sides: vanishes too
      (4L, toks("y", 4) + " b0 b1 b2 b3 " + toks("z", 4)))
    val got = Curation.decontaminateSpans(corpus, bench, n = 4, margin = 2, minPiece = 5)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    assert(got.keySet == Set((1L, 1L), (1L, 2L), (2L, 1L)))
    assert(got((1L, 1L)) == ((1L, 16L, (0 until 16).map(i => s"p$i").mkString(" "))))
    assert(got((1L, 2L)) == ((25L, 16L, (2 until 18).map(i => s"q$i").mkString(" "))))
    assert(got((2L, 1L)) == ((1L, 9L, toks("c", 9))))
  }

  test("bloom-guarded decontamination: identical report, bloom guard in the plan") {
    val bench = docsDF(
      100L -> "alpha beta gamma delta epsilon",
      101L -> "one two three four five six")
    val corpus = docsDF(
      (1L -> "zzz alpha beta gamma delta yyy") +:
      (2L -> "beta gamma delta epsilon tail here") +:
      (3L -> "two three four five trailing words") +:
      (4L -> "totally unrelated words in this doc") +:
      (5L -> "tiny doc") +:
      (10L to 60L).map(i => i -> s"filler doc number $i with its own unshared tokens"): _*)
    val exact = Curation.contaminatedDocs(corpus, bench, n = 4).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_shared")).toMap
    val bloomed = Curation.contaminatedDocsBloom(corpus, bench, n = 4)
    val got = bloomed.collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_shared")).toMap
    assert(got == exact)
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
    // The guard must sit in the corpus-side scan stage, before the join.
    assert(bloomed.queryExecution.executedPlan.toString.contains("bloom_might_contain"),
      "bloom pre-filter missing from the physical plan")
  }

  test("bloom expression: no false negatives, bounded false positives, codegen ≡ interpreted") {
    import spark.implicits._
    import org.apache.spark.sql.GraftSqlBridge
    import graft.functions.BloomMightContainLong
    val members = (1L to 500L)
    val bloom = members.toDF("gh").stat.bloomFilter("gh", members.size.toLong, 0.01)
    val expr = BloomMightContainLong.fromFilter(
      GraftSqlBridge.expression(col("gh")), bloom)
    val probes = (1L to 50000L)
    val hits = probes.toDF("gh").filter(GraftSqlBridge.column(expr))
      .collect().map(_.getLong(0)).toSet
    assert(members.forall(hits.contains), "false negative: a member failed might-contain")
    assert(hits.size - members.size < (probes.size * 0.05).toInt,
      s"false-positive rate blown: ${hits.size - members.size} of ${probes.size}")
    // Interpreted eval (the non-codegen fallback) must agree with the
    // codegen'd filter above on every probe.
    probes.foreach { v =>
      assert(expr.nullSafeEval(v) == hits.contains(v), s"codegen/interpreted split on $v")
    }
  }

  test("repetition signals match hand-computed fractions") {
    val docs = docsDF(
      1L -> "a b a b a b",       // 6 words, 2 distinct; top bigram "a b" x3 of 5; top trigram x2 of 4
      2L -> "u v w x y z")       // all unique: top bigram/trigram runs of 1
    val out = Curation.repetitionSignals(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    val r1 = out(1L)
    assert(r1.getAs[Long]("n_words") == 6)
    assert(math.abs(r1.getAs[Double]("dup_word_frac") - (1.0 - 2.0 / 6)) < 1e-15)
    assert(math.abs(r1.getAs[Double]("top_bigram_frac") - 3.0 / 5) < 1e-15)
    assert(math.abs(r1.getAs[Double]("top_trigram_frac") - 2.0 / 4) < 1e-15)
    val r2 = out(2L)
    assert(r2.getAs[Double]("dup_word_frac") == 0.0)
    assert(math.abs(r2.getAs[Double]("top_bigram_frac") - 1.0 / 5) < 1e-15)
  }

  test("repetition signals on docs too short for an n-gram: row kept, fraction NULL") {
    val docs = docsDF(
      1L -> "solo",            // 1 word: no bigrams, no trigrams
      2L -> "two words",       // 2 words: one bigram, no trigrams
      3L -> "three word doc")  // 3 words: both defined
    val out = Curation.repetitionSignals(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out.keySet == Set(1L, 2L, 3L), "short docs must keep their rows")
    assert(out(1L).isNullAt(out(1L).fieldIndex("top_bigram_frac")))
    assert(out(1L).isNullAt(out(1L).fieldIndex("top_trigram_frac")))
    assert(out(2L).getAs[Double]("top_bigram_frac") == 1.0)
    assert(out(2L).isNullAt(out(2L).fieldIndex("top_trigram_frac")))
    assert(out(3L).getAs[Double]("top_bigram_frac") == 0.5)
    assert(out(3L).getAs[Double]("top_trigram_frac") == 1.0)
  }

  test("sequence packing equals the single-window definition and is bucket-count invariant") {
    val docs = Tables.documents(spark, sf)
    // Reference: the naive global-window cumsum (fine at test scale).
    val w = Window.orderBy(col("doc_id")).rowsBetween(Window.unboundedPreceding, -1)
    val expected = docs
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .withColumn("start_off", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .withColumn("seq_id", expr("start_off div 512"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    for (nBuckets <- Seq(1, 4, 32)) {
      val got = Curation.packSequences(docs, budget = 512, nBuckets = nBuckets)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
      assert(got == expected, s"distributed prefix sum diverged at nBuckets=$nBuckets")
    }
  }

  test("first-fit packing: bins never exceed the budget, every doc packed once") {
    val docs = Tables.documents(spark, sf)
    val budget = 512
    val out = Curation.packFirstFit(docs, budget).collect()
    assert(out.length == docs.count())
    assert(out.map(_.getAs[Long]("doc_id")).distinct.length == out.length)
    // n_tokens is the TRUE length; bin accounting uses min(n_tokens, budget)
    out.groupBy(_.getAs[Long]("bin_id")).foreach { case (bin, rows) =>
      val used = rows.map(r => math.min(r.getAs[Long]("n_tokens"), budget.toLong)).sum
      assert(used <= budget, s"bin $bin overflows: $used > $budget")
      // offsets tile the bin exactly (by the clamped accounting value)
      val sorted = rows.sortBy(_.getAs[Long]("off_in_bin"))
      sorted.foldLeft(0L) { (expectOff, r) =>
        assert(r.getAs[Long]("off_in_bin") == expectOff)
        expectOff + math.min(r.getAs[Long]("n_tokens"), budget.toLong)
      }
    }
    out.foreach(r =>
      assert(r.getAs[Boolean]("over_budget") == (r.getAs[Long]("n_tokens") > budget)))
    // Deterministic: same partitioning, same bins.
    val again = Curation.packFirstFit(docs, budget).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("bin_id")).toMap
    out.foreach(r => assert(again(r.getAs[Long]("doc_id")) == r.getAs[Long]("bin_id")))
  }

  test("first-fit packing reports true lengths for over-budget docs, which sit alone") {
    val docs = docsDF(
      1L -> Seq.fill(20)("w").mkString(" "),   // 20 tokens
      2L -> Seq.fill(50)("x").mkString(" "),   // 50 tokens — over a budget of 32
      3L -> Seq.fill(10)("y").mkString(" "))
    val out = Curation.packFirstFit(docs, budget = 32, nPartitions = 1).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(2L).getAs[Long]("n_tokens") == 50L, "true length must not be clamped")
    assert(out(2L).getAs[Boolean]("over_budget"))
    assert(!out(1L).getAs[Boolean]("over_budget") && !out(3L).getAs[Boolean]("over_budget"))
    // the over-budget doc fills its bin alone (accounting value = budget)
    val binOf2 = out(2L).getAs[Long]("bin_id")
    assert(out.values.count(_.getAs[Long]("bin_id") == binOf2) == 1)
  }

  test("tokenize: vocab ids by frequency, OOV becomes the UNK id, round-trippable") {
    val docs = docsDF(
      1L -> "cat dog cat bird cat",
      2L -> "dog fish cat",
      3L -> "newt")
    // counts: cat=4, dog=2, bird=1, fish=1, newt=1 → vocab(3) by (cnt desc, word asc):
    // cat=0, dog=1, bird=2; fish/newt are UNK (=3)
    val vocab = Curation.buildVocab(docs, 3)
    assert(vocab.toSeq == Seq("cat" -> 0, "dog" -> 1, "bird" -> 2))
    val out = Curation.tokenize(docs, vocab).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("n_unk"), r.getAs[String]("token_str")))).toMap
    assert(out(1L) == ((5L, 0L, "0 1 0 2 0")))
    assert(out(2L) == ((3L, 1L, "1 3 0")))
    assert(out(3L) == ((1L, 1L, "3")))
  }

  test("quality gate drops exactly each source's bottom decile by percent_rank") {
    val docs = Tables.documents(spark, sf)
    val gated = graft.ops.TextAnalysis.qualityGate(docs, 0.1).collect()
    val total = docs.count()
    assert(gated.length < total && gated.length > total * 0.8)
    assert(gated.forall(_.getAs[Double]("pr") >= 0.1))
    // per source: the dropped docs are precisely the lowest-quality ones
    val kept = gated.map(r => r.getAs[Long]("doc_id")).toSet
    val bySource = graft.ops.TextAnalysis.qualityScore(docs)
      .select("doc_id", "quality")
      .join(docs.select("doc_id", "source"), "doc_id")
      .collect().groupBy(_.getAs[String]("source"))
    bySource.foreach { case (_, rows) =>
      val sorted = rows.sortBy(r => (r.getAs[Double]("quality"), r.getAs[Long]("doc_id")))
      val n = sorted.length
      sorted.zipWithIndex.foreach { case (r, i) =>
        val pr = i.toDouble / (n - 1)
        assert(kept.contains(r.getAs[Long]("doc_id")) == (pr >= 0.1))
      }
    }
  }

  test("lang confusion: a planted misroute lands in its cell with the exact within-label rate") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the cat of a hat", "en"),
      (2L, "the dog of a log", "en"),
      (3L, "le chat la nuit les jours", "en"), // labeled en, predicted fr
      (4L, "le la les", "fr"))
      .toDF("doc_id", "text", "lang")
    val got = graft.ops.TextAnalysis.langConfusion(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getDouble(3)))).toMap
    assert(got(("en", "en")) == ((2L, 2.0 / 3.0)))
    assert(got(("en", "fr")) == ((1L, 1.0 / 3.0)),
      "the French-marker doc mislabeled en lands in the (en, fr) cell")
    assert(got(("fr", "fr")) == ((1L, 1.0)))
    assert(got.size == 3, "no phantom cells")
  }

  test("assembly carries every curation signal consistently in one row per doc") {
    val docs = Tables.documents(spark, sf)
    val emb = Tables.embeddings(spark, sf)
    val out = Curation.assembleExamples(docs, emb).collect()
    assert(out.length == docs.count())
    val langs = graft.ops.TextAnalysis.languageId(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("pred_lang")).toMap
    val packs = Curation.packSequences(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("seq_id")).toMap
    val withVec = emb.select("vec_id").collect().map(_.getLong(0)).toSet
    out.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(r.getAs[String]("pred_lang") == langs(id))
      assert(r.getAs[Long]("seq_id") == packs(id))
      if (withVec.contains(id)) assert(r.getAs[Double]("emb_norm") > 0)
      else assert(r.getAs[Double]("emb_norm") == -1.0)
    }
  }

  test("span-dup fractions count exactly the grams shared across docs") {
    val docs = docsDF(
      1L -> "a b c d e f",       // shares 4-gram "b c d e" with doc 2
      2L -> "x b c d e y",
      3L -> "p q r s t u")       // nothing shared
    val out = Curation.spanDupFractions(docs, n = 4).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_grams"), r.getAs[Long]("n_dup_grams")))).toMap
    // doc 1 grams: "a b c d","b c d e","c d e f" → only "b c d e" is shared
    assert(out(1L) == ((3L, 1L)))
    assert(out(2L) == ((3L, 1L)))
    assert(out(3L) == ((3L, 0L)))
  }

  test("span-dup plan: one corpus-wide shuffle on the gram hash, dup-only join-back") {
    val docs = Tables.documents(spark, sf)
    val df = Curation.spanDupFractions(docs)
    df.collect() // run it so AQE settles the final plan
    // AdaptiveSparkPlan.toString appends the pre-AQE "Initial Plan" section
    // — count shuffles in the FINAL plan only.
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    val ghShuffles = plan.sliding("Exchange hashpartitioning(gh".length)
      .count(_ == "Exchange hashpartitioning(gh")
    assert(ghShuffles == 1,
      s"the occurrence stream must hit exactly ONE wide stage keyed on gh, saw $ghShuffles:\n" +
        plan.take(1200))
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      s"the dup-gram join-back must not re-shuffle the occurrence stream:\n${plan.take(1200)}")
  }

  test("span-dup: docs with repeated internal grams count occurrences, not distinct grams") {
    val docs = docsDF(
      1L -> "a b c d a b c d", // gram "a b c d" occurs twice in doc 1 (positions 1 and 5)...
      2L -> "z a b c d y")
    // doc 1 grams: "a b c d","b c d a","c d a b","d a b c","a b c d" (5 occurrences);
    // only "a b c d" is cross-doc (also in doc 2) and it occurs TWICE in doc 1.
    val out = Curation.spanDupFractions(docs, n = 4).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_grams"), r.getAs[Long]("n_dup_grams")))).toMap
    assert(out(1L) == ((5L, 2L)))
    assert(out(2L) == ((3L, 1L)))
  }

  test("n-grams of a doc shorter than n are empty, not an error") {
    val out = docsDF(1L -> "one two")
      .select(Curation.ngrams(col("text"), 4).as("ngs")).head
    assert(out.getSeq[String](0).isEmpty)
  }

  test("chunking: every token covered, stride overlap, short tail, stable keys") {
    val words81 = (1 to 81).map(i => s"t$i")
    val docs = docsDF(1L -> words81.mkString(" "), 2L -> "a b c")
    val out = Curation.chunkDocs(docs, 32, 24).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))

    val d1 = out.filter(_._1 == 1L).sortBy(_._2)
    // 81 tokens, window 32, stride 24 -> starts 1, 25, 49, 73; tail is 9.
    assert(d1.map(_._3).toSeq == Seq(1L, 25L, 49L, 73L))
    assert(d1.map(_._4).toSeq == Seq(32L, 32L, 32L, 9L))
    d1.foreach { case (_, _, start, n, text) =>
      assert(text == words81.slice(start.toInt - 1, start.toInt - 1 + n.toInt).mkString(" "))
    }
    // every token index lands in at least one window
    val covered = d1.flatMap { case (_, _, s, n, _) => s until (s + n) }.toSet
    assert(covered == (1L to 81L).toSet)

    // short doc: one whole-doc chunk
    assert(out.filter(_._1 == 2L).toSeq == Seq((2L, 0L, 1L, 3L, "a b c")))
  }

  test("chunking boundary sweep: coverage and window count hold for every (n, chunk, stride)") {
    import spark.implicits._
    for ((c, s) <- Seq((32, 24), (8, 8), (5, 1), (7, 3))) {
      // one doc per length n = 1..3c+1 in a single DataFrame
      val docs = (1 to 3 * c + 1).map(n => (n.toLong, (1 to n).map(i => s"t$i").mkString(" ")))
        .toDF("doc_id", "text")
      val out = Curation.chunkDocs(docs, c, s).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .groupBy(_._1)
      (1 to 3 * c + 1).foreach { n =>
        val chunks = out(n.toLong).sortBy(_._2)
        val expected = 1 + math.ceil(math.max(0, n - c).toDouble / s).toInt
        assert(chunks.length == expected, s"c=$c s=$s n=$n: window count")
        val covered = chunks.flatMap { case (_, _, st, len) => st until (st + len) }.toSet
        assert(covered == (1L to n.toLong).toSet, s"c=$c s=$s n=$n: coverage")
        chunks.init.foreach { case (_, _, _, len) => assert(len == c.toLong) }
        assert(chunks.last._4 <= c.toLong && chunks.last._4 >= 1L)
      }
    }
  }

  test("keyword search: conjunctive filter, tf ranking, TakeOrdered plan") {
    import spark.implicits._
    import graft.ops.TextAnalysis
    val docs = Seq(
      (1L, "spark join spark", "s1"), (2L, "spark only here", "s1"),
      (3L, "join spark join join", "s2"), (4L, "neither word", "s2"))
      .toDF("doc_id", "text", "source")
    val hits = TextAnalysis.searchDocs(docs, Seq("spark", "join"), 10).collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    // doc 2 lacks 'join', doc 4 lacks both; 3 outranks 1 on total tf.
    assert(hits.toSeq == Seq((3L, 4L), (1L, 3L)))
    // plan assert against a real scan (a 4-row local relation pre-collapses)
    val plan = TextAnalysis.searchDocs(Tables.documents(spark, sf), Seq("spark", "join"), 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"top-k must not globally sort:\n${plan.take(600)}")
  }

  test("target relevance: integer token-count scoring, top-k lowers to TakeOrdered") {
    import graft.ops.TextAnalysis
    val corpus = docsDF(1L -> "x y z", 2L -> "z z z", 3L -> "x x x x")
    val target = docsDF(100L -> "x x y")
    val rel = TextAnalysis.targetRelevance(corpus, target).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // t_count: x=2, y=1, z=0
    assert(rel(1L) == ((3L, 3L, 1.0)))   // 2+1+0 over 3 tokens
    assert(rel(2L) == ((0L, 3L, 0.0)))
    assert(rel(3L) == ((8L, 4L, 2.0)))   // 4·2 over 4 tokens
    val top = TextAnalysis.selectByRelevance(corpus, target, 2).collect().map(_.getLong(0))
    assert(top.toSeq == Seq(3L, 1L), "densest target-like docs first")
    val plan = TextAnalysis.selectByRelevance(corpus, target, 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-k selection must not globally sort:\n${plan.take(600)}")
  }

  test("markup stripping: tags out, entities decoded once, whitespace collapsed") {
    import spark.implicits._
    val docs = Seq(
      (1L, """<html><body class="main">hello <b>bold</b> world</body></html>"""),
      (2L, "a &amp; b &lt;tag&gt; &quot;q&quot; &#39;s&#39;"),
      // double-escaped: &amp;lt; is the TEXT "&lt;", never a real <
      (3L, "literal &amp;lt;notatag&amp;gt; stays"),
      (4L, "plain text no markup"),
      (5L, "<div><p>nested</p><br/></div>")).toDF("doc_id", "text")
    val got = Curation.stripMarkup(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    assert(got(1L) == ((6L, "hello bold world")))
    assert(got(2L) == ((0L, "a & b <tag> \"q\" 's'")))
    assert(got(3L) == ((0L, "literal &lt;notatag&gt; stays")),
      "double-escaped entities must decode exactly once")
    assert(got(4L) == ((0L, "plain text no markup")))
    assert(got(5L) == ((5L, "nested")))
  }

  test("curation pipeline: each stage's teeth bite — dup copies, contaminated, low-quality all absent") {
    val docs = Tables.documents(spark, sf)
    val reIngested = docs.filter(col("doc_id") % 10 === 0)
      .withColumn("doc_id", col("doc_id") + 1000000L)
    val all = docs.unionByName(reIngested)
    val corpus = all.filter(col("doc_id") % 97 =!= 0)
    val benchmark = all.filter(col("doc_id") % 97 === 0)
    val weights = Map("src0" -> 0.5, "src1" -> 0.3, "src2" -> 0.2)
    val out = Sampling_pipelineRun(corpus, benchmark, weights)
    val picked = out.map(_._1).toSet

    // Dedup tooth: no re-ingested copy survives when its original is in
    // the corpus (the original has the smaller id).
    val copyWithOriginal = corpus.filter(col("doc_id") >= 1000000L)
      .select((col("doc_id") - 1000000L).as("orig")).collect().map(_.getLong(0)).toSet
        .intersect(corpus.select("doc_id").collect().map(_.getLong(0)).toSet)
    copyWithOriginal.foreach(o => assert(!picked.contains(o + 1000000L),
      s"copy of in-corpus doc $o must die at dedup"))

    // Decontam tooth: a corpus copy of a BENCHMARK doc shares all its
    // n-grams with the benchmark — must never be picked.
    val benchIds = benchmark.select("doc_id").collect().map(_.getLong(0)).toSet
    benchIds.filter(_ < 1000000L).foreach(b =>
      assert(!picked.contains(b + 1000000L),
        s"corpus copy of benchmark doc $b must die at decontamination"))

    // Gate tooth: every pick is en + quality >= 0.55 per the standalone ops.
    val gatedIds = graft.ops.TextAnalysis.gate(corpus).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(picked.subsetOf(gatedIds), "every pick must pass the standalone gate")

    // Mixture tooth: budgets hold.
    out.groupBy(_._2).foreach { case (src, rows) =>
      val budget = Map("src0" -> 1000L, "src1" -> 600L, "src2" -> 400L)(src)
      assert(rows.map(_._4).max <= budget, s"$src over budget")
    }

    // Plan shape: since the mixture stage grew its bucketed distributed
    // prefix sum (r6), mixCorpus checkpoints its narrow (doc_id, source,
    // n_tokens) base before collecting bucket totals — so the upstream
    // dedup/decontam/gate stages materialize exactly ONCE behind that
    // barrier, and the final plan shows only the post-checkpoint mixture
    // window, partitioned by (source, draw-bucket), never bare source.
    val plan = Curation.curationPipeline(corpus, benchmark, weights, 2000L)
      .queryExecution.executedPlan.toString
    val windowLines = plan.linesIterator.filter(_.contains("Window ")).toSeq
    assert(windowLines.size == 1, s"exactly the mixture window expected, got ${windowLines.size}")
    windowLines.foreach(l =>
      assert(l.contains("_bucket"), s"mixture window must partition by draw bucket: $l"))
  }

  test("pipeline v2: trained classifier gate + √-temperature mix compose over gated survivors") {
    val docs = Tables.documents(spark, sf)
    val gated = graft.ops.TextAnalysis.gate(docs)
    // the classifier trains on the PIPELINE's own intermediate, not the raw corpus
    val weights = graft.ops.TextAnalysis.trainWordClassifier(gated, "src0")
    val scored = graft.ops.TextAnalysis.classifyDocs(gated, weights)
    val kept = gated.join(scored.filter(col("pred_target")).select("doc_id"),
      Seq("doc_id"), "left_semi")
    val mixed = graft.ops.Sampling.temperatureMix(
      kept.select(col("doc_id"), col("source"), col("text")), 1000L)
    val out = mixed.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(3), r.getLong(4)))
    assert(out.nonEmpty, "the composed pipeline must select something")

    // every pick passed both gates
    val gatedIds = gated.select("doc_id").collect().map(_.getLong(0)).toSet
    val positiveIds = scored.filter(col("pred_target")).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    out.foreach { case (id, _, _, _) =>
      assert(gatedIds(id) && positiveIds(id), s"doc $id skipped a gate") }

    // budgets match an independent scalar recomputation over the kept corpus
    val totals = kept.select(col("source"),
        size(split(col("text"), " ")).cast("long").as("n"))
      .groupBy("source").agg(sum(col("n")).as("t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).sortBy(_._1)
    val sumSq = totals.map(t => math.sqrt(t._2.toDouble)).sum
    val wantBudgets = totals.map { case (s, t) =>
      s -> (1000.0 * math.sqrt(t.toDouble) / sumSq).toLong }.toMap
    out.groupBy(_._2).foreach { case (src, rows) =>
      assert(rows.map(_._4).toSet == Set(wantBudgets(src)),
        s"$src budget diverged from the scalar recomputation")
      assert(rows.map(_._3).max <= wantBudgets(src), s"$src cut exceeded its budget")
    }
  }

  private def Sampling_pipelineRun(corpus: org.apache.spark.sql.DataFrame,
      benchmark: org.apache.spark.sql.DataFrame,
      weights: Map[String, Double]): Array[(Long, String, Long, Long)] =
    Curation.curationPipeline(corpus, benchmark, weights, 2000L).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
}
