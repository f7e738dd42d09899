package graft

import org.apache.spark.sql.functions._
import graft.text.Bpe

/** BPE training: equivalence with a single-node reference implementation,
  * determinism, and tokenize-side invariants.
  */
class BpeSpec extends SparkSpec {

  /** Straightforward single-node BPE over a word-count map — the textbook
    * formulation the distributed trainer must reproduce exactly.
    */
  private def referenceTrain(wordCounts: Map[String, Long],
      nMerges: Int): Seq[(String, String)] = {
    var words: Map[Seq[String], Long] =
      wordCounts.map { case (w, c) => (w.map(_.toString): Seq[String]) -> c }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var continue = true
    while (continue && merges.size < nMerges) {
      val pairCounts = scala.collection.mutable.Map.empty[(String, String), Long]
      words.foreach { case (syms, c) =>
        syms.sliding(2).filter(_.size == 2).foreach { p =>
          val k = (p(0), p(1)); pairCounts(k) = pairCounts.getOrElse(k, 0L) + c
        }
      }
      val best = pairCounts.toSeq
        .sortBy { case ((a, b), n) => (-n, a, b) }.headOption
      best match {
        case Some(((a, b), n)) if n >= 2 =>
          merges += ((a, b))
          words = words.map { case (syms, c) =>
            referenceMerge(syms, a, b) -> c
          }.groupBy(_._1).map { case (k, vs) => k -> vs.values.sum }
        case _ => continue = false
      }
    }
    merges.toSeq
  }

  private def referenceMerge(syms: Seq[String], a: String, b: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toSeq
  }

  test("distributed training equals the single-node reference on the real corpus") {
    val docs = Tables.documents(spark, sf)
    val wc = Bpe.wordCounts(docs).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = Bpe.train(docs, nMerges = 12)
    val want = referenceTrain(wc, nMerges = 12)
    assert(got === want, s"merge sequences diverged:\n got=$got\nwant=$want")
    assert(got.size === 12, "the corpus should support 12 merges")
    // determinism: a second distributed run is identical
    assert(Bpe.train(docs, nMerges = 12) === got)
  }

  test("tokenize: merges shrink token counts, concatenation reproduces the text") {
    val docs = Tables.documents(spark, sf).limit(50)
    val merges = Bpe.train(docs, nMerges = 8)
    val before = Bpe.tokenize(docs, Seq.empty).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    val after = Bpe.tokenize(docs, merges).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    val raw = docs.select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    raw.foreach { case (id, text) =>
      val squashed = text.split(" ").filter(_.nonEmpty).mkString("")
      assert(after(id)._2.replace(" ", "") == squashed,
        s"doc $id: token concatenation must reproduce the text")
      assert(after(id)._1 <= before(id)._1,
        s"doc $id: merges must never increase the token count")
    }
    assert(after.values.map(_._1).sum < before.values.map(_._1).sum,
      "8 merges must shrink the corpus token count overall")
  }

  test("training stops early when no pair repeats") {
    import spark.implicits._
    val d = Seq((1L, "abc def")).toDF("doc_id", "text")
    // every adjacent pair occurs once — below the min-count-2 bar
    assert(Bpe.train(d, nMerges = 5) === Seq.empty)
  }

  test("batched rounds: fewer aggregation rounds than merges, same merge list") {
    val docs = Tables.documents(spark, sf)
    val wc = Bpe.wordCounts(docs).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val (got, rounds) = Bpe.trainWithStats(docs, nMerges = 24)
    assert(got === referenceTrain(wc, nMerges = 24),
      "batched training must replay the sequential argmax decisions verbatim")
    assert(rounds < got.size,
      s"batching must save rounds: $rounds rounds for ${got.size} merges")
    // maxBatch=1 degenerates to the sequential trainer — same list again
    assert(Bpe.trainWithStats(docs, nMerges = 24, maxBatch = 1)._1 === got)
  }

  test("batch acceptance is conservative on adversarial derived-pair corpora") {
    import spark.implicits._
    // "a b a b ..." — merging (a,b) creates high-count derived pairs
    // (ab,ab); a naive disjointness-only batch would also take a lower
    // pair and diverge from the sequential argmax.
    val d = Seq(
      (1L, ("ab " * 40).trim),         // word "ab" repeated: chars a,b
      (2L, ("abab " * 30).trim),       // "abab": a b a b
      (3L, ("cd " * 25).trim),
      (4L, ("xy " * 24).trim)).toDF("doc_id", "text")
    val wc = Bpe.wordCounts(d).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    for (m <- Seq(1, 2, 3, 4, 6)) {
      assert(Bpe.train(d, nMerges = m) === referenceTrain(wc, nMerges = m),
        s"divergence at nMerges=$m")
    }
  }
}
