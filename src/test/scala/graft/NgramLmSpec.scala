package graft

import org.apache.spark.sql.functions._
import graft.text.NgramLm

/** CCNet-style pruned-bigram LM: hand-computed model counts under binding
  * caps, exact fixed-point stupid-backoff scores, the transcendental ppl
  * pinned against the closed-form over the same ppm integers (the
  * spec-level coverage the oracle deliberately omits — BM25 precedent),
  * degenerate docs, the no-shuffle scoring plan, and bucket sanity.
  */
class NgramLmSpec extends SparkSpec {

  private def trainDf() = {
    import spark.implicits._
    Seq(
      (1L, "a b a b c", "en", "s0"),
      (2L, "b a b b", "en", "s0")
    ).toDF("doc_id", "text", "lang", "source")
  }

  test("train prunes deterministically at both caps (count desc, key asc)") {
    val m = NgramLm.train(trainDf(), vocabSize = 2, maxBigrams = 2)
    // unigrams: b:5, a:3 survive the cap; c:1 pruned
    assert(m.unigrams.toSeq == Seq(("b", 5L), ("a", 3L)))
    assert(m.totalTokens == 9L)
    // vocab-interior bigrams: "a b":3, "b a":2 kept; "b b":1 cut by the
    // cap, "b c" cut by the vocab filter before the cap
    assert(m.bigrams.toSeq == Seq(("a b", 3L), ("b a", 2L)))
  }

  test("stupid-backoff ppm scores are exactly the hand computation") {
    import spark.implicits._
    val m = NgramLm.train(trainDf(), vocabSize = 2, maxBigrams = 2)
    val docs = Seq((10L, "a b c a q b b", "zz", "s1"))
      .toDF("doc_id", "text", "lang", "source")
    val r = NgramLm.scoreDocs(docs, m).collect()(0)
    // pairs: (a,b) hit 1000000*3 div 3 = 1000000
    //        (b,c) backoff c pruned -> 0
    //        (c,a) backoff 400000*3 div 9 = 133333
    //        (a,q) backoff q oov -> 0
    //        (q,b) backoff 400000*5 div 9 = 222222
    //        (b,b) pruned bigram -> backoff on b = 222222
    assert(r.getAs[Long]("n_tokens") == 7L)
    assert(r.getAs[Long]("n_scored") == 6L)
    assert(r.getAs[Long]("n_hits") == 1L)
    assert(r.getAs[Long]("sum_ppm") == 1577777L)
    assert(r.getAs[Long]("fit_ppm") == 1577777L / 6L)
  }

  test("ppl equals the closed form over the same ppm integers") {
    import spark.implicits._
    val m = NgramLm.train(trainDf(), vocabSize = 2, maxBigrams = 2)
    val docs = Seq((10L, "a b c a q b b", "zz", "s1"))
      .toDF("doc_id", "text", "lang", "source")
    val got = NgramLm.scoreDocs(docs, m).collect()(0).getAs[Double]("ppl")
    val ppms = Seq(1000000L, 0L, 133333L, 0L, 222222L, 222222L)
    val want = math.exp(-ppms.map(p => math.log(math.max(p, 1L) / 1e6)).sum / 6.0)
    assert(math.abs(got - want) / want < 1e-12)
    // a better-fitting doc must score lower perplexity
    val pair = Seq((1L, "a b a b", "zz", "s1"), (2L, "q r s t", "zz", "s1"))
      .toDF("doc_id", "text", "lang", "source")
    val m2 = NgramLm.scoreDocs(pair, m).collect().map(r =>
      r.getAs[Long]("doc_id") -> r.getAs[Double]("ppl")).toMap
    assert(m2(1L) < m2(2L))
  }

  test("degenerate docs: single token and empty text score zero, ppl NaN") {
    import spark.implicits._
    val m = NgramLm.train(trainDf(), vocabSize = 2, maxBigrams = 2)
    val docs = Seq((1L, "a", "zz", "s1"), (2L, "", "zz", "s1"))
      .toDF("doc_id", "text", "lang", "source")
    NgramLm.scoreDocs(docs, m).collect().foreach { r =>
      assert(r.getAs[Long]("n_scored") == 0L)
      assert(r.getAs[Long]("sum_ppm") == 0L)
      assert(r.getAs[Long]("fit_ppm") == 0L)
      assert(r.getAs[Double]("ppl").isNaN)
    }
  }

  test("scoring is map-only: the only Exchange is the presentation sort") {
    val docs = Tables.documents(spark, sf)
    val m = NgramLm.train(docs.filter(col("lang") === "en"))
    val plan = NgramLm.scoreDocs(docs, m).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"scoring must not shuffle by key — the model rides as literal maps:\n$plan")
  }

  // ---- production-shape scoring: broadcast data path + persisted artifact

  /** Toy model + 50k synthetic bigrams — comfortably past
    * LiteralMapMaxEntries, the CCNet-class regime where literal maps are
    * the wrong plan. One synthetic bigram ("b q") has an in-vocab context
    * so the HIT path exercises through the big model too.
    */
  private def overThresholdModel(): NgramLm.LmModel = {
    val base = NgramLm.train(trainDf(), vocabSize = 2, maxBigrams = 2)
    val syn = Array(("b q", 7L)) ++
      (0 until 50000).map(i => (f"zza$i%05d zzb$i%05d", (i % 97 + 1).toLong))
    base.copy(bigrams = base.bigrams ++ syn)
  }

  private def probeDocs() = {
    import spark.implicits._
    Seq(
      (10L, "a b c a q b b", "zz", "s1"),
      (11L, "zza00017 zzb00017 a b", "zz", "s1"),
      (12L, "x b q a", "zz", "s2"),
      (13L, "", "zz", "s2")
    ).toDF("doc_id", "text", "lang", "source")
  }

  /** Bitwise row image: longs as-is, ppl by raw IEEE bits (NaN included). */
  private def bitImage(df: org.apache.spark.sql.DataFrame) =
    df.collect().map { r =>
      (r.getAs[Long]("doc_id"), r.getAs[String]("lang"), r.getAs[String]("source"),
        r.getAs[Long]("n_tokens"), r.getAs[Long]("n_scored"), r.getAs[Long]("n_hits"),
        r.getAs[Long]("sum_ppm"), r.getAs[Long]("fit_ppm"),
        java.lang.Double.doubleToRawLongBits(r.getAs[Double]("ppl")))
    }.toSeq

  test("broadcast form ≡ literal form bitwise on an over-threshold model") {
    val m = overThresholdModel()
    assert(m.unigrams.length + m.bigrams.length > NgramLm.LiteralMapMaxEntries)
    val docs = probeDocs()
    val viaLiteral = bitImage(NgramLm.scoreDocsForm(docs, m, broadcastForm = false))
    val viaBroadcast = bitImage(NgramLm.scoreDocsForm(docs, m, broadcastForm = true))
    assert(viaLiteral == viaBroadcast,
      "the two map provenances must produce identical rows, ppl bits included")
    // the in-vocab synthetic bigram really hits through the big model:
    // doc 12 pair (b,q) -> 1000000*7 div 5
    val d12 = viaBroadcast.find(_._1 == 12L).get
    assert(d12._6 == 1L && d12._7 >= 1000000L * 7L / 5L)
  }

  test("over-threshold plan: one-row broadcast join, still no shuffle") {
    val m = overThresholdModel()
    val plan = NgramLm.scoreDocsForm(probeDocs(), m, broadcastForm = true)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"),
      s"big models must ride a broadcast join, not literal maps:\n$plan")
    assert(!plan.contains("Exchange hashpartitioning"),
      s"the data path must not introduce a shuffle:\n$plan")
  }

  test("save/load roundtrip; serve-from-artifact ≡ train-and-score bitwise") {
    val m = NgramLm.train(trainDf(), vocabSize = 2, maxBigrams = 2)
    val dir = java.nio.file.Files.createTempDirectory("graft-nglm-spec").toString + "/idx"
    NgramLm.save(spark, m, dir)
    val m2 = NgramLm.load(spark, dir)
    assert(m2.unigrams.toSeq == m.unigrams.toSeq)
    assert(m2.bigrams.toSeq == m.bigrams.toSeq)
    assert(m2.totalTokens == m.totalTokens)
    val docs = probeDocs()
    assert(bitImage(NgramLm.scoreDocsFrom(spark, docs, dir)) ==
      bitImage(NgramLm.scoreDocs(docs, m)))
  }

  test("serve path keeps an over-threshold persisted model distributed") {
    val m = overThresholdModel()
    val dir = java.nio.file.Files.createTempDirectory("graft-nglm-big").toString + "/idx"
    NgramLm.save(spark, m, dir)
    val served = NgramLm.scoreDocsFrom(spark, probeDocs(), dir)
    val plan = served.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"),
      s"a big persisted model must never collect to literal maps:\n$plan")
    assert(bitImage(served) == bitImage(NgramLm.scoreDocsForm(probeDocs(), m, broadcastForm = true)))
  }

  test("buckets: per-lang doc counts conserved, head fits at least tail fits") {
    val docs = Tables.documents(spark, sf)
    val b = NgramLm.perplexityBuckets(docs).collect()
    val perLang = b.groupBy(_.getAs[String]("lang"))
    val total = b.map(_.getAs[Long]("n_docs")).sum
    assert(total == docs.count())
    perLang.foreach { case (_, rows) =>
      val byB = rows.map(r => r.getAs[String]("bucket") -> r).toMap
      for (h <- byB.get("head"); t <- byB.get("tail"))
        assert(h.getAs[Long]("min_fit_ppm") >= t.getAs[Long]("max_fit_ppm"),
          "head bucket must dominate tail on the fit ordering")
    }
  }

  test("cutoffs: floors reproduce the buckets as value thresholds, up to floor ties") {
    val docs = Tables.documents(spark, sf)
    val dir = java.nio.file.Files.createTempDirectory("graft-lmcut").toString + "/idx"
    NgramLm.buildAt(spark, docs, dir)
    val cuts = NgramLm.lmCutoffsFrom(spark, docs, dir).collect()
      .map(r => r.getString(0) -> (r.getAs[Long]("n_docs"),
        r.getAs[Long]("head_floor_ppm"), r.getAs[Long]("middle_floor_ppm"))).toMap
    val labeled = NgramLm.lmGateFrom(spark, docs, dir, keep = Seq("head", "middle", "tail"))
      .collect().map(r => (r.getAs[String]("lang"), r.getAs[Long]("fit_ppm"),
        r.getAs[String]("bucket")))
    assert(cuts.values.map(_._1).sum == docs.count(), "doc counts conserved")
    labeled.groupBy(_._1).foreach { case (lang, rows) =>
      val (_, headFloor, midFloor) = cuts(lang)
      assert(midFloor <= headFloor, "the p70 floor cannot exceed the p30 floor")
      val head = rows.filter(_._3 == "head").map(_._2)
      assert(head.nonEmpty && head.min == headFloor,
        "head_floor_ppm must be the head bucket's minimum fit")
      // a value threshold admits the head bucket plus only floor-tied docs
      val admitted = rows.filter(_._2 >= headFloor)
      assert(admitted.size >= head.size &&
        admitted.filter(_._3 != "head").forall(_._2 == headFloor),
        "fit >= head floor = head ∪ {docs tied with the floor}")
    }
  }

  test("source audit == manual roll-up of per-doc scores; docs conserved") {
    val docs = Tables.documents(spark, sf)
    val audit = NgramLm.lmSourceAudit(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))).toSeq

    // independent composition: score per doc, then group in plain Scala
    val perDoc = NgramLm.lmScore(docs).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("n_tokens"),
        r.getAs[Long]("n_scored"), r.getAs[Long]("n_hits"), r.getAs[Long]("sum_ppm")))
    val want = perDoc.groupBy(_._1).toSeq.sortBy(_._1).map { case (src, rows) =>
      val (nt, ns, nh, sp) = (rows.map(_._2).sum, rows.map(_._3).sum,
        rows.map(_._4).sum, rows.map(_._5).sum)
      (src, rows.size.toLong, nt, ns, nh, sp,
        sp / math.max(ns, 1L), (1000L * nh) / math.max(ns, 1L))
    }
    assert(audit == want, s"audit rows must equal the manual roll-up")
    assert(audit.map(_._2).sum == docs.count(), "every doc in exactly one source row")
  }
}
