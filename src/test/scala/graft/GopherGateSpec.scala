package graft

import graft.ops.TextAnalysis

/** Gopher hand-rule gate: each rule triggered in isolation on a hand
  * fixture (integer cross-multiplied bounds exact at their boundaries),
  * plus the map-only plan.
  */
class GopherGateSpec extends SparkSpec {

  private val stops = Seq("the", "a", "table", "value")

  private def run(rows: (Long, String)*) = {
    import spark.implicits._
    val df = rows.toSeq.toDF("doc_id", "text")
      .withColumn("source", org.apache.spark.sql.functions.lit("s0"))
    TextAnalysis.gopherGate(df, stopwords = stops, minWords = 3L, maxWords = 6L)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
  }

  test("each rule fires in isolation; boundaries are inclusive") {
    val g = run(
      (1L, "the a table"), // 3 words: wordcount at min boundary, all rules pass
      (2L, "the a"), // 2 words < min -> r_wordcount false
      (3L, "the a table value cat dog fox"), // 7 > max -> r_wordcount false
      (4L, "aa the table"), // mean len (2+3+5)/3 pass; 2 stops
      (5L, "a b the"), // sum_word_chars 5 < 3*3 -> r_wordlen false
      (6L, "abcdefghijk abcdefghijklmno the table"), // mean 7.5 in [3,10] pass
      (7L, "# the table"), // 1 sym of 3 words: 10*1 > 3 -> r_symbol false
      (8L, "# # # # # # the table value a".split(" ").take(3).mkString(" ")), // "# # #": no stop, alpha 0
      (9L, "the table 123"), // 1 non-alpha of 3: 5*2 >= 4*3 -> r_alpha true (>=80% is 2.4 -> need >=2.4 -> 2 alpha of 3 is 66% fails: 10 < 12) -> false
      (10L, "the cat dog")) // only 1 stopword -> r_stop false
    assert(g(1L).getAs[Boolean]("pass"))
    assert(!g(2L).getAs[Boolean]("r_wordcount"))
    assert(!g(3L).getAs[Boolean]("r_wordcount"))
    assert(g(4L).getAs[Boolean]("r_wordlen") && g(4L).getAs[Boolean]("pass"))
    assert(!g(5L).getAs[Boolean]("r_wordlen"))
    assert(g(6L).getAs[Boolean]("r_wordlen"))
    assert(!g(7L).getAs[Boolean]("r_symbol"))
    assert(!g(8L).getAs[Boolean]("r_stop") && !g(8L).getAs[Boolean]("r_alpha"))
    assert(!g(9L).getAs[Boolean]("r_alpha"))
    assert(!g(10L).getAs[Boolean]("r_stop") && !g(10L).getAs[Boolean]("pass"))
  }

  test("published-threshold defaults split the real corpus, map-only plan") {
    val docs = Tables.documents(spark, sf)
    val gated = TextAnalysis.gopherGate(docs, stopwords = stops)
    val rows = gated.collect()
    assert(rows.length == docs.count())
    val passed = rows.count(_.getAs[Boolean]("pass"))
    assert(passed > 0 && passed < rows.length,
      s"gate should genuinely split the corpus, got $passed/${rows.length}")
    val plan = gated.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"gate must be map-only:\n$plan")
  }
}
