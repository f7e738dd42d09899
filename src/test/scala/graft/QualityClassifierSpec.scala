package graft

import org.apache.spark.sql.functions._
import graft.ops.TextAnalysis

/** Trained linear quality classifier: weight-sign faithfulness to
  * Naive-Bayes log-odds, map-only scoring ≡ an explode-join reference,
  * separation on the real corpus, and the no-shuffle scoring plan.
  */
class QualityClassifierSpec extends SparkSpec {

  private def fixture() = {
    import spark.implicits._
    Seq(
      (1L, "good clean prose with varied words", "tgt"),
      (2L, "good careful prose more varied words here", "tgt"),
      (3L, "spam spam spam buy now spam", "bg"),
      (4L, "buy now spam click buy now", "bg"),
      (5L, "varied prose words appear again", "tgt"),
      (6L, "click here now spam click", "bg")
    ).toDF("doc_id", "text", "source")
  }

  test("per-word weight sign equals the Naive-Bayes add-1 log-odds sign") {
    val d = fixture()
    val weights = TextAnalysis.trainWordClassifier(d, "tgt", vocabSize = 100).toMap
    // recompute NB log-odds in doubles from first principles
    val toks = d.collect().flatMap(r =>
      r.getString(1).split(" ").map(w => (w, r.getString(2) == "tgt")))
    val vocab = weights.keySet
    val inVocab = toks.filter(t => vocab(t._1))
    val v = vocab.size
    val totT = inVocab.count(_._2).toLong
    val totB = inVocab.size - totT
    weights.foreach { case (w, wt) =>
      val ct = inVocab.count(t => t._1 == w && t._2).toLong
      val cb = inVocab.count(t => t._1 == w && !t._2).toLong
      val logOdds = math.log((ct + 1.0) / (totT + v)) - math.log((cb + 1.0) / (totB + v))
      assert(math.signum(wt.toDouble) === math.signum(logOdds),
        s"weight sign diverges from NB log-odds for '$w' ($wt vs $logOdds)")
    }
  }

  test("domain classifier: argmax routes each distinctive doc home, margin audits ties") {
    import spark.implicits._
    val d = Seq(
      (1L, "alpha alpha alpha shared", "sA"),
      (2L, "alpha alpha shared words", "sA"),
      (3L, "beta beta beta shared", "sB"),
      (4L, "beta beta shared words", "sB"),
      (5L, "gamma gamma gamma shared", "sC"),
      (6L, "gamma gamma shared words", "sC")).toDF("doc_id", "text", "source")
    val model = TextAnalysis.trainDomainClassifier(d, vocabSize = 100)
    assert(model._1 == Seq("sA", "sB", "sC"), "sources surface sorted")
    val got = TextAnalysis.classifyDomains(d, model).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    for ((id, src, pred, margin) <- got) {
      assert(pred == src, s"doc $id with a dominant source word must route home")
      assert(margin > 0, s"doc $id routes with a positive margin")
    }
    // a doc of only shared words scores identically everywhere: tie →
    // lexicographically smallest source, margin exactly 0
    val tie = TextAnalysis.classifyDomains(
      Seq((9L, "shared words shared words", "sB")).toDF("doc_id", "text", "source"), model)
      .collect().head
    assert(tie.getString(2) == "sA" && tie.getLong(3) == 0L,
      "an all-shared doc ties and breaks toward the smallest source with margin 0")
    // scoring equals the explode-join reference on the integer weights
    val (srcs, weights) = model
    val wmap = weights.toMap
    val ref = d.collect().map { r =>
      val sums = srcs.indices.map(i => r.getString(1).split(" ")
        .map(w => wmap.get(w).map(_(i)).getOrElse(0L)).sum)
      val bi = sums.indexOf(sums.max)
      (r.getLong(0), srcs(bi))
    }.toMap
    got.foreach { case (id, _, pred, _) => assert(pred == ref(id)) }
  }

  test("map-only scoring equals the explode-join reference") {
    val d = fixture()
    val weights = TextAnalysis.trainWordClassifier(d, "tgt", vocabSize = 100)
    val got = TextAnalysis.classifyDocs(d, weights).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    import spark.implicits._
    val wdf = weights.toSeq.toDF("w", "wt")
    val want = d.select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .join(wdf, Seq("w"), "left")
      .groupBy(col("doc_id")).agg(sum(coalesce(col("wt"), lit(0L))).as("score"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === want)
  }

  test("the classifier separates the target source on the real corpus") {
    val docs = Tables.documents(spark, sf)
    val scored = TextAnalysis.qualityClassifier(docs, "src0")
    val byClass = scored
      .groupBy(col("source") === "src0")
      .agg(avg(col("score").cast("double")).as("m"))
      .collect().map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    assert(byClass(true) > byClass(false),
      s"target docs must score higher on average: $byClass")
    // and the decision threshold actually fires both ways at this SF
    val preds = scored.select(col("pred_target")).distinct().collect().map(_.getBoolean(0)).toSet
    assert(preds === Set(true, false))
  }

  test("held-out generalization: trained on the train fold, balanced accuracy well above chance on test") {
    // sf0.01 deliberately: the default spec SF leaves ~2 positive train
    // docs — nothing to learn from. Balanced accuracy (mean per-class
    // recall) is the imbalance-robust metric: src0 is 1 source in 20, so
    // raw accuracy would reward the trivial all-negative predictor.
    val docs = Tables.documents(spark, "/root/testdata/sf0.01")
    val split = graft.ops.Sampling.assignSplits(docs, col("doc_id"))
    val train = split.filter(col("split") === "train")
    val test = split.filter(col("split") === "test")
    val weights = TextAnalysis.trainWordClassifier(train, "src0")
    val scored = TextAnalysis.classifyDocs(test, weights).collect()
      .map(r => r.getString(1) -> r.getBoolean(3))
    val pos = scored.filter(_._1 == "src0")
    val neg = scored.filter(_._1 != "src0")
    assert(pos.nonEmpty && neg.nonEmpty, "both classes must appear in the test fold")
    val balanced = (pos.count(_._2).toDouble / pos.length +
      neg.count(!_._2).toDouble / neg.length) / 2
    assert(balanced >= 0.6,
      s"held-out balanced accuracy $balanced must clear 0.6 " +
        s"(pos ${pos.count(_._2)}/${pos.length}, neg ${neg.count(!_._2)}/${neg.length})")
  }

  test("threshold calibration matches a brute-force sweep; calibrated cutoff holds up held-out") {
    import spark.implicits._
    // fixture: brute-force the optimal balanced-accuracy cutoff
    val rows = Seq((10L, true), (8L, true), (7L, false), (5L, true),
      (3L, false), (1L, false), (0L, false))
    val got = TextAnalysis.calibrateThreshold(
      rows.toDF("score", "is_pos"), col("is_pos")).collect().head
    val (pTot, nTot) = (rows.count(_._2).toDouble, rows.count(!_._2).toDouble)
    val brute = rows.map(_._1).distinct.map { t =>
      val tp = rows.count(r => r._1 >= t && r._2)
      val tn = rows.count(r => r._1 < t && !r._2)
      (t, (tp / pTot + tn / nTot) / 2)
    }.maxBy { case (t, b) => (b, -t) }
    assert(got.getAs[Long]("threshold") === brute._1)
    assert(got.getAs[Double]("balanced_accuracy") === brute._2)

    // calibrate on the train fold, decide on the test fold: never worse
    // than the raw 0 cut, and strictly better on this corpus
    val docs = Tables.documents(spark, "/root/testdata/sf0.01")
    val split = graft.ops.Sampling.assignSplits(docs, col("doc_id"))
    val weights = TextAnalysis.trainWordClassifier(
      split.filter(col("split") === "train"), "src0")
    def balAt(fold: String, thr: Long): Double = {
      val s = TextAnalysis.classifyDocs(split.filter(col("split") === fold), weights)
        .collect().map(r => r.getLong(2) -> (r.getString(1) == "src0"))
      val pos = s.filter(_._2); val neg = s.filterNot(_._2)
      (pos.count(_._1 >= thr).toDouble / pos.length +
        neg.count(_._1 < thr).toDouble / neg.length) / 2
    }
    val trainScored = TextAnalysis.classifyDocs(
      split.filter(col("split") === "train"), weights)
    val cal = TextAnalysis.calibrateThreshold(trainScored, col("source") === "src0")
      .collect().head
    // on TRAIN the swept cutoff is optimal by construction — at least as
    // good as the raw 0 cut
    assert(cal.getAs[Double]("balanced_accuracy") >= balAt("train", 1L) - 1e-12)
    // held-out it stays well above chance (a strict-dominance claim would
    // be statistically naive with a handful of positive test docs)
    val heldOut = balAt("test", cal.getAs[Long]("threshold"))
    assert(heldOut >= 0.6, s"calibrated held-out balanced accuracy $heldOut below 0.6")
  }

  test("scoring is map-only: no join, no aggregate exchange before the output sort") {
    val d = Tables.documents(spark, sf)
    val weights = TextAnalysis.trainWordClassifier(d, "src0")
    val plan = TextAnalysis.classifyDocs(d, weights)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"scoring must not join:\n$plan")
    assert(!plan.contains("HashAggregate"), s"scoring must not aggregate:\n$plan")
  }
}
