package graft

import org.apache.spark.sql.functions._
import graft.ops.{Curation, Sampling, TextAnalysis}

/** The corpus-release tier added in round 5's second wave: exact substring
  * REMOVAL (Lee et al. 2021 semantics), the per-source data card, and
  * region-balanced diversity sampling over embeddings.
  */
class CorpusOpsSpec extends SparkSpec {

  private def docsDf(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("shardAssign: greedy draw-order cuts, docs never split, every shard within one doc of target") {
    // 40 docs × 5 tokens, target 12 → a doc straddles every boundary, so
    // the overflow semantics genuinely exercise.
    val docs = docsDf((0L until 40L).map(i => (i, "a b c d e")): _*)
    val got = Sampling.shardAssign(docs, targetTokens = 12L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toList
    // Brute reference: sort by (md5 draw, doc_id), exclusive-prefix DIV 12.
    val order = (0L until 40L).sortBy(i =>
      (java.security.MessageDigest.getInstance("MD5")
        .digest(s"graft|$i".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8), i))
    val expected = order.zipWithIndex
      .map { case (_, pos) => (pos * 5L) / 12L }
      .groupBy(identity).toList.sortBy(_._1)
      .map { case (sid, xs) => (sid, xs.size.toLong, xs.size * 5L) }
    assert(got == expected, s"got $got vs $expected")
    // Balance: every shard's token mass within one doc of target (last
    // shard may be a remainder below it).
    assert(got.init.forall { case (_, _, t) => t >= 12L - 4L && t < 12L + 5L })
    val total = got.map(_._3).sum
    assert(total == 200L, "every token lands in exactly one shard")
  }

  test("collocations: exact PMI-ratio arithmetic, marginals from the bigram table, min-count and tie order") {
    // "x y x y z y" → bigrams (x y)×2, (y x), (y z), (z y); N = 5.
    // Left marginals x:2 y:2 z:1, right marginals y:3 x:1 z:1.
    //   x y: ⌊2·5·10⁶/(2·3)⌋ = 1,666,666   y x: ⌊5·10⁶/(2·1)⌋ = 2,500,000
    //   y z: 2,500,000                      z y: ⌊5·10⁶/(1·3)⌋ = 1,666,666
    // Rank: ppm desc then bigram asc — the two ties order lexicographically.
    val d = docsDf((1L, "x y x y z y"))
    val got = TextAnalysis.collocations(d, minCount = 1L).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toList
    assert(got == List(
      ("y x", 1L, 2L, 1L, 2500000L), ("y z", 1L, 2L, 1L, 2500000L),
      ("x y", 2L, 2L, 3L, 1666666L), ("z y", 1L, 1L, 3L, 1666666L)), got.toString)
    // min-count floor drops the singletons.
    val floored = TextAnalysis.collocations(d, minCount = 2L).collect()
    assert(floored.map(_.getString(0)).toList == List("x y"))
    // Single-word docs contribute nothing; empty corpus yields empty output.
    assert(TextAnalysis.collocations(docsDf((2L, "solo")), 1L).collect().isEmpty)
  }

  test("removeDupSpans cuts later occurrences of a shared 8-token span, keeps the first") {
    val span = "q w e r t y u i" // 8 tokens
    val d = docsDf(
      (1L, s"alpha $span omega"),
      (2L, s"prefix words here $span suffix"),
      (3L, "unrelated text entirely without any shared span"))
    val got = Curation.removeDupSpans(d, n = 8).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(got(1L) == (s"alpha $span omega", 0L), "first occurrence must be untouched")
    assert(got(2L) == ("prefix words here suffix", 8L), "later occurrence must be cut")
    assert(got(3L)._2 == 0L)
  }

  test("removeDupSpans: within-doc repeats cut too, and overlapping dup spans merge their cover") {
    // span repeats twice inside one doc: second occurrence (8 tokens) removed.
    val span = "a1 a2 a3 a4 a5 a6 a7 a8"
    val d = docsDf((1L, s"$span mid $span"))
    val got = Curation.removeDupSpans(d, n = 8).collect().head
    assert(got.getString(1) == s"$span mid")
    assert(got.getLong(2) == 8L)
  }

  test("removeDupSpans: docs shorter than the span width pass through; full removal gives empty string") {
    val span = "b1 b2 b3 b4 b5 b6 b7 b8"
    val d = docsDf(
      (1L, "short doc"),
      (2L, span), // first occurrence — kept
      (3L, span)) // exact 8-token duplicate — fully removed
    val got = Curation.removeDupSpans(d, n = 8).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(got(1L) == ("short doc", 0L))
    assert(got(2L) == (span, 0L))
    assert(got(3L) == ("", 8L), "fully-removed doc must be empty string, not null")
  }

  test("removeDupSpans agrees with a brute-force reference on the corpus sample") {
    val docs = Tables.documents(spark, sf).limit(200)
    val n = 8
    val rows = docs.select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1)).sortBy(_._1)
    val firstSeen = scala.collection.mutable.Map[String, (Long, Int)]()
    for ((id, ws) <- rows; p <- 0 to ws.length - n) {
      val g = ws.slice(p, p + n).mkString(" ")
      if (!firstSeen.contains(g)) firstSeen(g) = (id, p)
    }
    val want = rows.map { case (id, ws) =>
      val rem = scala.collection.mutable.Set[Int]()
      for (p <- 0 to ws.length - n) {
        val g = ws.slice(p, p + n).mkString(" ")
        if (firstSeen(g) != ((id, p))) rem ++= (p until p + n)
      }
      id -> (ws.zipWithIndex.collect { case (w, i) if !rem(i) => w }.mkString(" "), rem.size.toLong)
    }.toMap
    val got = Curation.removeDupSpans(docs, n).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(got == want)
  }

  test("docNovelty: df=1 grams count as novel, shared grams don't, short docs drop") {
    import spark.implicits._
    // A and B share "a b c"; each owns one private trigram; C is too short
    val docs = Seq(
      (1L, "a b c d"), (2L, "a b c x"), (3L, "zz yy"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.docNovelty(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got.keySet == Set(1L, 2L), "sub-n docs have no grams and drop out")
    assert(got(1L) == ((2L, 1L, 0.5)), s"doc 1: 2 grams, 1 novel (got ${got(1L)})")
    assert(got(2L) == ((2L, 1L, 0.5)))
    // a within-doc repeated gram counts once (distinct per doc), and a
    // gram repeated only WITHIN one doc is still corpus-novel
    val rep = Seq((7L, "p q r p q r")).toDF("doc_id", "text")
    val g7 = TextAnalysis.docNovelty(rep).collect().head
    // "p q r p q r" yields 4 positional trigrams but only 3 DISTINCT ones
    assert(g7.getLong(1) == 3L && g7.getLong(2) == 3L && g7.getDouble(3) == 1.0,
      "distinct-per-doc grams, all df=1")
  }

  test("sourceBalance: shares sum to 1; effective sources exact on a hand fixture") {
    import spark.implicits._
    // two sources, 30 vs 10 tokens → p = (0.75, 0.25), 1/Σp² = 1.6
    val d = Seq(
      (1L, ("w " * 30).trim, "big"),
      (2L, ("w " * 10).trim, "small")
    ).toDF("doc_id", "text", "source")
    val got = TextAnalysis.sourceBalance(d).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(got("big") == ((30L, 0.75, 1.6)))
    assert(got("small") == ((10L, 0.25, 1.6)))
    // real corpus: shares sum to 1, effective count within (1, n_sources]
    val real = TextAnalysis.sourceBalance(Tables.documents(spark, sf)).collect()
    assert(math.abs(real.map(_.getDouble(2)).sum - 1.0) < 1e-12)
    val eff = real.head.getDouble(3)
    assert(eff > 1.0 && eff <= real.length.toDouble)
  }

  test("corpusCard aggregates the fixture exactly") {
    import spark.implicits._
    val d = Seq(
      (1L, "a b c", "en", "s1"),
      (2L, "a b c", "en", "s1"), // exact dup of 1
      (3L, "d e", "fr", "s1"),
      (4L, "f g h i", "en", "s2"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
    val got = TextAnalysis.corpusCard(d).collect()
      .map(r => r.getString(0) -> r).toMap
    val s1 = got("s1")
    assert(s1.getAs[Long]("n_docs") == 3L)
    assert(s1.getAs[Long]("n_tokens") == 8L)
    assert(s1.getAs[Long]("n_langs") == 2L)
    assert(s1.getAs[Long]("n_distinct_texts") == 2L)
    assert(s1.getAs[Long]("n_dup_docs") == 1L)
    assert(math.abs(s1.getAs[Double]("dup_frac") - 1.0 / 3.0) < 1e-15)
    assert(got("s2").getAs[Long]("n_dup_docs") == 0L)
  }

  test("diverseSample caps every region, picks by (hashDraw, vec_id), and matches the window reference") {
    val emb = Tables.embeddings(spark, sf)
    val cap = 5
    val got = Sampling.diverseSample(emb, cap, bits = 4).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    // cap respected and ranks are 1..m per bucket
    got.groupBy(_._1).foreach { case (b, rs) =>
      assert(rs.length <= cap, s"bucket $b over cap")
      assert(rs.map(_._2).sorted.toSeq == (1L to rs.length).toSeq)
    }
    // window-reference: row_number over (draw, vec_id) per sign-bucket
    val bucket = (0 until 4).map(d =>
        when(element_at(col("embedding"), d + 1) > lit(0.0f), lit(1 << d)).otherwise(lit(0)))
      .reduce(_ + _)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("bucket")).orderBy(Sampling.hashDraw(col("vec_id")), col("vec_id"))
    val want = emb.select(col("vec_id"), bucket.as("bucket"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= cap)
      .collect().map(r => (r.getInt(1), r.getInt(2).toLong, r.getLong(0))).toSet
    assert(got.toSet == want)
  }

  test("temperature mix: √-smoothing up-weights small sources, budgets respected") {
    import spark.implicits._
    // skewed fixture: big source 10× the small one
    val docs = (
      (1L to 100L).map(i => (i, ("w " * 10).trim, "big")) ++
      (101L to 110L).map(i => (i, ("w " * 10).trim, "small"))
    ).toDF("doc_id", "text", "source")
    val B = 300L
    val got = Sampling.temperatureMix(docs, B)
    val taken = got.groupBy(col("source"))
      .agg(sum(col("n_tokens")).as("tok"), max(col("source_budget")).as("b"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // raw shares: big 1000/1100 ≈ 0.909; √-shares: √1000/(√1000+√100) ≈ 0.76
    val bigBudget = taken("big")._2
    val smallBudget = taken("small")._2
    assert(bigBudget + smallBudget <= B)
    assert(smallBudget.toDouble / (bigBudget + smallBudget) > 100.0 / 1100.0,
      "the small source's budget share must exceed its raw token share")
    assert(bigBudget.toDouble / (bigBudget + smallBudget) < 1000.0 / 1100.0,
      "the big source must be down-weighted")
    // the cut respects each budget
    taken.foreach { case (s, (tok, b)) =>
      assert(tok <= b, s"$s took $tok tokens over budget $b") }
  }

  test("normalized dedup unifies case/punctuation variants but never distinct content") {
    import spark.implicits._
    val d = Seq(
      (1L, "Hello, World!"),
      (2L, "hello   world"),
      (3L, "HELLO WORLD"),
      (4L, "hello worlds"), // distinct content — must NOT join the group
      (5L, "same raw"), (6L, "same raw") // plain exact dups: one raw variant
    ).toDF("doc_id", "text")
    val got = TextAnalysis.normalizedDupGroups(d).collect()
      .map(r => r.getString(3) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got === Map("1,2,3" -> ((3L, 3L)), "5,6" -> ((2L, 1L))))
  }
}
