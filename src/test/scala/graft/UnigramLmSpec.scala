package graft

import graft.text.UnigramLm
import graft.text.UnigramLm.Model

class UnigramLmSpec extends SparkSpec {

  private def docsDF(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  /** All segmentations of `w` into in-vocab pieces (≤ maxPieceLen),
    * single chars allowed as UNK-floor — the brute reference for both the
    * E-step sums and Viterbi.
    */
  private def segmentations(w: String, m: Model): Seq[Seq[String]] =
    if (w.isEmpty) Seq(Seq.empty)
    else (1 to math.min(m.maxPieceLen, w.length)).flatMap { l =>
      val p = w.substring(0, l)
      val ok = m.logp.contains(p) || l == 1
      if (!ok) Seq.empty
      else segmentations(w.substring(l), m).map(p +: _)
    }

  private def segLogProb(seg: Seq[String], m: Model): Double =
    seg.map(p => m.logp.getOrElse(p, m.unkLogp)).sum

  private val toyModel = Model(Map(
    "a" -> math.log(0.2), "b" -> math.log(0.1), "c" -> math.log(0.05),
    "ab" -> math.log(0.3), "bc" -> math.log(0.15), "abc" -> math.log(0.2)),
    maxPieceLen = 3)

  test("E-step expected counts and log-evidence equal brute segmentation enumeration") {
    for (w <- Seq("abc", "abab", "cab", "bcbc", "aaa")) {
      val segs = segmentations(w, toyModel)
      val probs = segs.map(s => math.exp(segLogProb(s, toyModel)))
      val z = probs.sum
      val (ecs, logZ) = UnigramLm.wordExpectations(w, toyModel)
      assert(math.abs(logZ - math.log(z)) < 1e-9,
        s"forward log-evidence for '$w' must equal the enumeration")
      val brute = segs.zip(probs).flatMap { case (s, p) => s.map(_ -> p / z) }
        .groupBy(_._1).map { case (p, xs) => p -> xs.map(_._2).sum }
      assert(ecs.map(_._1).toSet == brute.keySet)
      for ((p, e) <- ecs)
        assert(math.abs(e - brute(p)) < 1e-9,
          s"expected count of '$p' in '$w': got $e, brute ${brute(p)}")
    }
  }

  test("Viterbi picks the max-probability segmentation, ties toward longer pieces") {
    for (w <- Seq("abc", "abab", "cab", "bcbc", "ccc")) {
      val seg = UnigramLm.viterbi(w, toyModel)
      assert(seg.mkString == w, "segmentation must concatenate back to the word")
      val best = segmentations(w, toyModel).map(s => segLogProb(s, toyModel)).max
      assert(math.abs(segLogProb(seg, toyModel) - best) < 1e-12,
        s"Viterbi score for '$w' must equal the enumerated max")
    }
    // an explicit float-exact tie (integer logps): x·y·z = xy·z = x·yz =
    // -3.0 exactly — the DP tries the longest candidate ending at each
    // position first and keeps it on ties, so the longest TRAILING piece
    // wins and the tie resolves to x + yz deterministically
    val tie = Model(Map("x" -> -1.0, "y" -> -1.0, "z" -> -1.0,
      "xy" -> -2.0, "yz" -> -2.0), maxPieceLen = 2)
    assert(UnigramLm.viterbi("xyz", tie) == Seq("x", "yz"))
  }

  test("EM log-likelihood is non-decreasing over fixed-vocab rounds") {
    val docs = docsDF(
      (1L, "spark table scan spark table"),
      (2L, "table scan join spark"),
      (3L, "scan scan table join spark spark"))
    // seedSize large enough that nothing prunes until the final round
    val (_, lls) = UnigramLm.train(docs, vocabSize = 10000,
      seedSize = 10000, rounds = 4)
    assert(lls.size == 4)
    for (i <- 1 until lls.size)
      assert(lls(i) >= lls(i - 1) - 1e-9,
        s"EM must not decrease the log-likelihood: ${lls(i - 1)} -> ${lls(i)}")
  }

  test("training is deterministic run-to-run and pruning hits the target size") {
    val docs = docsDF(
      (1L, "aaa bbb aab abb aba bab"),
      (2L, "aab aab abb aaa bbb bbb"))
    val (m1, l1) = UnigramLm.train(docs, vocabSize = 6, seedSize = 64, rounds = 3)
    val (m2, l2) = UnigramLm.train(docs, vocabSize = 6, seedSize = 64, rounds = 3)
    assert(m1.logp == m2.logp && l1 == l2, "identical inputs must train bitwise-identical models")
    assert(m1.logp.size == 6, s"vocab must prune to the target: ${m1.logp.size}")
    assert(m1.logp.contains("a") && m1.logp.contains("b"),
      "single characters are never pruned")
  }

  test("tokenize round-trips every word, UNK chars fall to the floor piece") {
    val docs = docsDF((1L, "abab baba unseen"), (2L, "abc cab"))
    val train = docsDF((1L, "abab baba abc cab"))
    val (m, _) = UnigramLm.train(train, vocabSize = 8, seedSize = 64, rounds = 2)
    val got = UnigramLm.tokenize(docs, m).collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    for (r <- got) {
      val docText = if (r.getLong(0) == 1L) "abab baba unseen" else "abc cab"
      assert(r.getString(2).replace(" ", "") == docText.replace(" ", ""),
        "token concatenation must reproduce the input modulo spaces")
      assert(r.getLong(1) >= docText.split(" ").length,
        "at least one token per word")
    }
  }
}
