package graft

import org.apache.spark.sql.functions.col
import graft.ops.{Dedup, TextAnalysis}

/** The ranked-retrieval / corpus-audit family: phrase search, scaled-integer
  * tf-idf, BM25, the cross-source overlap matrix, and the prefix-filtered
  * all-pairs Jaccard join (lossless-filter contract checked against the
  * brute-force definition).
  */
class TextSearchSpec extends SparkSpec {

  private def docsDf(rows: (Long, String, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text", "source")
  }

  test("phraseSearch counts OVERLAPPING occurrences at token boundaries") {
    val d = docsDf(
      (1L, "a b a b a", "s"), // "a b a" starts at 1 and 3 — overlapping = 2
      (2L, "fast tables are not fast table", "s"), // substring 'fast tab' inside 'fast tables' must NOT count
      (3L, "a b", "s"))
    assert(TextAnalysis.phraseSearch(d, Seq("a", "b", "a")).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSeq == Seq((1L, 2L)))
    assert(TextAnalysis.phraseSearch(d, Seq("fast", "table")).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSeq == Seq((2L, 1L)))
  }

  test("phraseSearch is safe on docs shorter than the phrase") {
    val d = docsDf((1L, "x", "s"), (2L, "", "s"))
    assert(TextAnalysis.phraseSearch(d, Seq("x", "y", "z")).count() == 0L)
  }

  test("phraseSearch agrees with a brute-force sliding-window count on the corpus") {
    val docs = Tables.documents(spark, sf)
    val phrase = Seq("fast", "table")
    val got = TextAnalysis.phraseSearch(docs, phrase, k = 1000000).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val want = docs.select(col("doc_id"), col("text")).collect().flatMap { r =>
      val ws = r.getString(1).split(" ", -1)
      val n = (0 to ws.length - phrase.length)
        .count(i => phrase.indices.forall(j => ws(i + j) == phrase(j)))
      if (n > 0) Some(r.getLong(0) -> n.toLong) else None
    }.toMap
    assert(got == want)
  }

  test("tfidfSearch: idf makes one rare-term hit outrank many common-term hits") {
    // 'rare' appears in 1 of 10 docs, 'com' in all 10. idf(rare)/idf(com) = 10,
    // so a single 'rare' hit must beat up to 9 'com' hits.
    val base = (1L to 9L).map(i => (i, "com com com com com com com com com", "s"))
    val d = docsDf(base :+ ((10L, "rare com", "s")): _*)
    val top = TextAnalysis.tfidfSearch(d, Seq("com", "rare"), k = 10).collect()
    assert(top.head.getLong(0) == 10L)
    // Exact integer score: tf_com * (1e6*10 DIV 10) + tf_rare * (1e6*10 DIV 1)
    assert(top.head.getLong(2) == 1L * 1000000L + 1L * 10000000L)
    assert(top(1).getLong(2) == 9L * 1000000L)
  }

  test("hybridSearch: RRF fuses both arms exactly, one-arm docs carry a NULL rank") {
    import spark.implicits._
    // lexical corpus: docs 1-3 mention the term with descending tf;
    // doc 4 never does (vector-only candidate)
    val docs = docsDf(
      (1L, "table table table x", "s"),
      (2L, "table table y z", "s"),
      (3L, "table y z w", "s"),
      (4L, "nothing relevant here", "s"))
    // embeddings: doc 4 closest to the query (vec 0), then 1, 3, 2 far
    val emb = Seq(
      (0L, Seq(1.0f, 0.0f), 0),
      (4L, Seq(0.99f, 0.1f), 0),
      (1L, Seq(0.8f, 0.6f), 0),
      (3L, Seq(0.0f, 1.0f), 0),
      (2L, Seq(-1.0f, 0.0f), 0)).toDF("vec_id", "embedding", "label")
    val got = TextAnalysis.hybridSearch(docs, emb, Seq("table"),
      queryId = 0L, nPerArm = 3, k = 10)
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        r.getLong(3))).toList
    def rrf(r: Long) = if (r < 0) 0L else 1000000000000L / (60L + r)
    // lexical top-3: 1, 2, 3; dense top-3 (cos desc, excl. nothing): 0, 4, 1
    val expected = Map(
      1L -> (1L, 3L), 2L -> (2L, -1L), 3L -> (3L, -1L),
      0L -> (-1L, 1L), 4L -> (-1L, 2L))
    for ((id, lr, vr, sc) <- got) {
      assert((lr, vr) == expected(id), s"arm ranks for doc $id")
      assert(sc == rrf(lr) + rrf(vr), s"RRF score for doc $id is the exact floored sum")
    }
    // doc 1 sits in BOTH arms and must outrank every single-arm doc
    assert(got.head._1 == 1L, "the both-arms doc fuses to the top")
    assert(got.map(_._1).toSet == expected.keySet)
  }

  test("bm25Search matches the hand-computed Okapi formula") {
    // 4 docs, term 'q' in 2 of them, uniform doc length 4 => dl/avgdl = 1.
    val d = docsDf(
      (1L, "q q x x", "s"), (2L, "q x x x", "s"),
      (3L, "x x x x", "s"), (4L, "y y y y", "s"))
    val got = TextAnalysis.bm25Search(d, Seq("q"), k = 10).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val idf = math.log((4.0 - 2.0 + 0.5) / (2.0 + 0.5) + 1.0)
    def s(tf: Double) = idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * 1.0))
    assert(got.keySet == Set(1L, 2L))
    assert(math.abs(got(1L) - s(2.0)) < 1e-12)
    assert(math.abs(got(2L) - s(1.0)) < 1e-12)
    // tf monotonicity at equal length: two occurrences beat one.
    assert(got(1L) > got(2L))
  }

  test("bm25Search length normalization: same tf, shorter doc scores higher") {
    val d = docsDf(
      (1L, "q x", "s"),
      (2L, "q x x x x x x x", "s"),
      (3L, "z z z z z", "s"))
    val got = TextAnalysis.bm25Search(d, Seq("q"), k = 10).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got(1L) > got(2L))
  }

  test("sourceOverlap computes the exact shared-gram matrix and Jaccard") {
    // srcA and srcB share exactly the gram "a b c d"; srcC shares nothing.
    val d = docsDf(
      (1L, "a b c d e", "srcA"), // grams: 'a b c d', 'b c d e'
      (2L, "a b c d", "srcB"),   // grams: 'a b c d'
      (3L, "z z z z z", "srcC"))
    val rows = TextAnalysis.sourceOverlap(d, n = 4).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getString(0) == "srcA" && r.getString(1) == "srcB")
    assert(r.getLong(2) == 1L) // shared
    assert(math.abs(r.getDouble(3) - 1.0 / 2.0) < 1e-15) // 1 / (2 + 1 - 1)
  }

  test("prefix-filtered Jaccard equals the brute-force all-pairs definition") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
    // Plant near-dups: every 5th doc re-ingested with its last 15 words
    // dropped — a high-but-not-1.0 Jaccard population (verbatim copies
    // would only exercise the J = 1 corner).
    val truncated = docs.filter(col("doc_id") % 5 === 0)
      .withColumn("doc_id", col("doc_id") + 1000000L)
      .withColumn("text", org.apache.spark.sql.functions.expr(
        "array_join(slice(split(text, ' '), 1, greatest(size(split(text, ' ')) - 15, 3)), ' ')"))
    val corpus = docs.unionByName(truncated)
    val got = Dedup.prefixJaccardPairs(corpus, n = 3, tauNum = 1, tauDen = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet

    // Brute force straight from the definition on collected shingle sets.
    val sets = Dedup.shingles(corpus, 3).as[(Long, String)].collect()
      .groupBy(_._1).map { case (id, g) => id -> g.map(_._2).toSet }
    val ids = sets.keys.toSeq.sorted
    val want = (for {
      i <- ids.indices; j <- (i + 1) until ids.length
      a = sets(ids(i)); b = sets(ids(j))
      inter = (a & b).size.toLong
      union = a.size + b.size - inter
      if inter * 4 >= union
    } yield (ids(i), ids(j), inter, union)).toSet
    assert(want.nonEmpty, "fixture must produce at least one qualifying pair")
    assert(got == want)
  }

  test("phraseSearch plan: map-only scan + TakeOrderedAndProject, zero shuffles") {
    val plan = TextAnalysis.phraseSearch(Tables.documents(spark, sf), Seq("fast", "table"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"phrase top-k should lower to TakeOrderedAndProject:\n$plan")
    assert(!plan.contains("Exchange"),
      s"phrase search is a scan — no shuffle belongs in this plan:\n$plan")
  }

  test("tfidfSearch plan: broadcast stats row, top-k lowering, no sort-merge join") {
    val plan = TextAnalysis.tfidfSearch(Tables.documents(spark, sf), Seq("table", "spark"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"tf-idf top-k should lower to TakeOrderedAndProject:\n$plan")
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      s"the single stats row must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"nothing here warrants a sort-merge join:\n$plan")
  }

  test("prefixJaccardPairs plan: every join is keyed — no cartesian product") {
    val plan = Dedup.prefixJaccardPairs(Tables.documents(spark, sf))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"prefix filtering must keep the candidate join keyed on gh:\n$plan")
  }

  test("prefixJaccardPairs keeps a pair at EXACTLY the threshold (integer cut)") {
    // Shingle sets: doc1 has 4 grams, doc2 has 2, sharing 2 => J = 2/4 = 1/2.
    val d = docsDf(
      (1L, "a b c d e f", "s"), // grams: abc bcd cde def
      (2L, "a b c d", "s"))     // grams: abc bcd
    val rows = Dedup.prefixJaccardPairs(d, n = 3, tauNum = 1, tauDen = 2).collect()
    assert(rows.length == 1)
    assert(rows.head.getLong(2) == 2L && rows.head.getLong(3) == 4L)
    // And a den just above J drops it: tau = 51/100 > 1/2.
    assert(Dedup.prefixJaccardPairs(d, n = 3, tauNum = 51, tauDen = 100).count() == 0L)
  }
}
