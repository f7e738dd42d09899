package graft

import org.apache.spark.sql.functions._
import graft.ops.Similarity
import graft.vector.VectorIndex

class SimilaritySpec extends SparkSpec {

  test("semanticDecontam flags by best benchmark cosine with the (max cos, min bench_id) tie rule") {
    import spark.implicits._
    // bench 0 = e_x, bench 1 = e_y (unit axes); corpus: 10 = scaled e_x
    // (cos 1 vs bench 0), 11 = diagonal (cos 1/√2 vs BOTH — an exact
    // arithmetic tie, so evidence must name bench 0), 12 = negated e_y
    // (cos −1), 13 = e_z (orthogonal to both). Threshold 0.5 keeps 10
    // and 11 only.
    val bench = Seq((0L, Seq(1f, 0f, 0f)), (1L, Seq(0f, 1f, 0f)))
      .toDF("vec_id", "embedding")
    val corpus = Seq(
      (10L, Seq(4f, 0f, 0f)), (11L, Seq(2f, 2f, 0f)),
      (12L, Seq(0f, -3f, 0f)), (13L, Seq(0f, 0f, 1f)))
      .toDF("vec_id", "embedding")
    val got = Similarity.semanticDecontam(corpus, bench, 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toList
    assert(got.map(t => (t._1, t._2)) == List((10L, 0L), (11L, 0L)),
      s"flag set + evidence (got $got)")
    assert(got.head._3 == 1.0, "exact-direction cosine is exactly 1")
    // The benchmark side must broadcast — the corpus-sized pass is map-only.
    val plan = Similarity.semanticDecontam(corpus, bench, 0.5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Broadcast"), s"bench side should broadcast:\n$plan")
  }

  test("decontamSignals (literal-benchmark form) equals semanticDecontam bitwise on the corpus") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, sf)
    val benchDf = emb.filter(col("vec_id") % 97 === 0)
      .select(col("vec_id"), col("embedding"))
    val corpus = emb.filter(col("vec_id") % 97 =!= 0)
      .select(col("vec_id"), col("embedding"))
    val bench = benchDf.collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toSeq
    val viaBatch = Similarity.semanticDecontam(corpus, benchDf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toList
    val viaSignals = Similarity.decontamSignals(corpus, bench)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1).toList
    assert(viaBatch.nonEmpty, "fixture must flag something")
    assert(viaSignals == viaBatch,
      "literal-fold signals must equal the broadcast-join operator bitwise")
    // A zero-norm benchmark vector must refuse loudly in BOTH forms: its
    // NaN cosine is larger than any value in Spark's ordering AND
    // comparisons, so it would win the argmax and pass the threshold —
    // flagging the entire corpus with NaN evidence.
    val ex = intercept[IllegalArgumentException] {
      Similarity.decontamSignals(corpus, Seq((7L, Array(0f, 0f, 0f))))
    }
    assert(ex.getMessage.contains("zero norm"))
    import spark.implicits._
    val zeroBench = Seq((7L, Seq(0f, 0f, 0f))).toDF("vec_id", "embedding")
    val ex2 = intercept[IllegalArgumentException] {
      Similarity.semanticDecontam(corpus, zeroBench)
    }
    assert(ex2.getMessage.contains("zero or NaN norm"))
  }

  test("degenerate CORPUS vectors pass through unflagged (never deleted on NaN evidence) — both forms") {
    import spark.implicits._
    // A zero-norm corpus row's cosine is NaN against every benchmark;
    // under NaN-is-greatest ordering it would pass any threshold and be
    // flagged (= dropped from training data) on undefined evidence. Both
    // forms must leave it alone and stay bitwise-equivalent.
    val bench = Seq((0L, Seq(1f, 0f, 0f))).toDF("vec_id", "embedding")
    val corpus = Seq(
      (10L, Seq(2f, 0f, 0f)),   // cos 1 → flagged
      (11L, Seq(0f, 0f, 0f)),   // zero norm → must NOT flag
      (12L, Seq(0f, 5f, 0f)))   // orthogonal → not flagged
      .toDF("vec_id", "embedding")
    val viaBatch = Similarity.semanticDecontam(corpus, bench, 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toList
    assert(viaBatch.map(_._1) == List(10L), s"only the real match flags (got $viaBatch)")
    val viaSignals = Similarity.decontamSignals(corpus,
        Seq((0L, Array(1f, 0f, 0f))), 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1).toList
    assert(viaSignals == viaBatch, "the streaming-twin form agrees on degenerate input")
  }

  test("cellBalance: exact load factors, hot cell surfaces, counts conserve the corpus") {
    import spark.implicits._
    // 4 seeds at unit corners; 12 extra vectors huddle around seed 0 →
    // cell 0 holds 13 of 16 vectors: load_ppm = 13·4·10⁶ DIV 16 = 3,250,000
    // (13× the balanced 10⁶/4... i.e. 3.25× of 10⁶); the others 250,000.
    val rows =
      Seq((0L, Seq(1f, 0f, 0f, 0f)), (1L, Seq(0f, 1f, 0f, 0f)),
        (2L, Seq(0f, 0f, 1f, 0f)), (3L, Seq(0f, 0f, 0f, 1f))) ++
      (4L until 16L).map(i => (i, Seq(1f + (i % 3) * 0.01f, 0.01f, 0f, 0f)))
    val got = Similarity.cellBalance(rows.toDF("vec_id", "embedding"), nCells = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toList
    assert(got == List((0L, 13L, 3250000L), (1L, 1L, 250000L),
      (2L, 1L, 250000L), (3L, 1L, 250000L)), got.toString)
    assert(got.map(_._2).sum == 16L, "every vector lands in exactly one cell")
    // A corpus with no low ids has zero seeds — must refuse, not emit
    // NULL cells; a legitimately EMPTY corpus short-circuits to empty.
    val shifted = rows.map { case (i, e) => (i + 1000L, e) }
    val ex = intercept[IllegalArgumentException] {
      Similarity.cellBalance(shifted.toDF("vec_id", "embedding"), nCells = 4)
    }
    assert(ex.getMessage.contains("seed"))
    val empty = rows.take(0).toDF("vec_id", "embedding")
    assert(Similarity.assignSeedCells(empty, 4).collect().isEmpty,
      "empty corpus yields an empty assignment, not an exception")
    // …and the balance audit over it returns the empty frame with its full
    // schema (no NPE on the NULL sum-of-counts).
    val emptyAudit = Similarity.cellBalance(empty, nCells = 4)
    assert(emptyAudit.columns.toSeq == Seq("cell", "n_vectors", "load_ppm"))
    assert(emptyAudit.collect().isEmpty, "empty corpus audits to an empty frame")
  }

  test("MAD outlier audit flags the corrupted vector; zero-MAD dims never flag") {
    import spark.implicits._
    // dim 0: smooth spread, nothing past 2·MAD; dim 1: constant but for
    // one wild value — MAD 0, must NEVER flag (the conservative side);
    // dim 2: exact quarter steps with one corrupted 9.0 at vec 3
    val rows = (0 until 20).map { i =>
      val d0 = i * 0.01f
      val d1 = if (i == 7) 99f else 5f
      val d2 = if (i == 3) 9f else 1f + (i % 5) * 0.25f
      (i.toLong, Seq(d0, d1, d2), 0)
    }
    val emb = rows.toDF("vec_id", "embedding", "label")
    val got = graft.ops.Similarity.madOutliers(emb).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toList
    assert(got.map(_._1) == List(3L),
      s"exactly the corrupted vector flags (got ${got.map(_._1)})")
    assert(got.head._2 == 1L && got.head._3 == 7.5 / 0.25,
      "one flagged dim, ratio = deviation/MAD exactly (all quarter-exact floats)")
  }

  test("triplet mining: hardest positive and negative per anchor equal the brute definition") {
    val emb = Tables.embeddings(spark, sf)
    // probe-all: candidacy is total, so blocked ≡ brute ALGORITHMICALLY
    // (the hardNegatives spec posture). This is the exactness pin; the
    // REGISTERED config is the budgeted default probe, whose oracle
    // mirrors the blocked plan itself (recall-independent hash).
    val got = graft.ops.Similarity.tripletMine(emb, nCells = 8, nProbe = 8).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getDouble(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6)))).toMap
    val all = emb.select("vec_id", "label", "embedding").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Float](2)))
    def d2(a: Seq[Float], b: Seq[Float]): Double =
      a.zip(b).map { case (x, y) => (x.toDouble - y.toDouble) * (x.toDouble - y.toDouble) }.sum
    var checked = 0
    for ((aid, albl, aemb) <- all) {
      val pos = all.filter(o => o._1 != aid && o._2 == albl)
        .map(o => (d2(aemb, o._3), o._1)).sorted.headOption
      val neg = all.filter(o => o._2 != albl)
        .map(o => (d2(aemb, o._3), o._1)).sorted.headOption
      (pos, neg) match {
        case (Some((pd, pid)), Some((nd, nid))) =>
          val (gp, gpd, gn, gnd, gm) = got(aid)
          assert(gp == pid && gpd == pd, s"hardest positive for anchor $aid")
          assert(gn == nid && gnd == nd, s"hardest negative for anchor $aid")
          assert(gm == nd - pd, s"margin for anchor $aid")
          checked += 1
        case _ =>
          assert(!got.contains(aid), s"anchor $aid lacks an arm and must drop out")
      }
    }
    assert(checked > 0 && checked == got.size,
      "every emitted triplet checked against brute, nothing extra emitted")
    assert(got.values.exists(_._5 <= 0) || got.values.forall(_._5 > 0),
      "margins computed (sanity)")
  }

  test("bounded-anchor mining: probe-all covers every two-armed anchor; budgeted output ⊆ exact anchor set") {
    val emb = Tables.embeddings(spark, sf)
    val anchors = Similarity.anchorSample(emb)
    val anchorRows = anchors.select("vec_id", "label").collect()
      .map(r => (r.getLong(0), r.getInt(1)))
    assert(anchorRows.length == math.min(256L, emb.count()).toInt,
      "anchorSample returns exactly min(n, corpus) rows")
    // expected coverage from the DATA: an anchor has both arms iff the
    // corpus holds another vector with its label and any vector with a
    // different one.
    val labelCounts = emb.groupBy("label").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val nTotal = labelCounts.values.sum
    val expected = anchorRows.filter { case (_, lbl) =>
      labelCounts(lbl) >= 2 && nTotal > labelCounts(lbl)
    }.map(_._1).toSet
    // probe-all: candidacy total, so EXACTLY the two-armed anchors emit —
    // the anchor-coverage contract the budgeted config can't promise.
    val exact = Similarity.tripletMineFor(anchors, emb, nProbe = 1024)
      .select("anchor_id").collect().map(_.getLong(0)).toSet
    assert(exact == expected,
      s"probe-all emits exactly the two-armed anchors (${exact.size} vs ${expected.size})")
    // budgeted: anchors may drop when an arm sits outside probed cells,
    // but never ADD an anchor, and surviving arms must be valid rows.
    val budgeted = Similarity.tripletMineFor(anchors, emb)
      .select("anchor_id").collect().map(_.getLong(0)).toSet
    assert(budgeted.subsetOf(exact), "budgeted anchors ⊆ probe-all anchors")
    assert(budgeted.nonEmpty, "budgeted config mines a non-trivial anchor set")
  }

  test("tripletMineFor at probe-all equals brute force on random geometry") {
    import spark.implicits._
    // seeded random corpora (dim 8, 4 labels): the two-table probe-all
    // form must reproduce the exact FaceNet definition per anchor on ANY
    // geometry, not just the shipped generator's
    for (seed <- Seq(11, 22, 33)) {
      val rnd = new scala.util.Random(seed)
      val n = 60 + rnd.nextInt(60)
      val rows = (0 until n).map { i =>
        (i.toLong, Seq.fill(8)(rnd.nextFloat() * 2 - 1), rnd.nextInt(4))
      }
      val emb = rows.toDF("vec_id", "embedding", "label")
      val anchors = Similarity.anchorSample(emb, 20)
      val anchorIds = anchors.select("vec_id").collect().map(_.getLong(0)).toSet
      val got = Similarity.tripletMineFor(anchors, emb, nProbe = 1024).collect()
        .map(r => r.getLong(0) ->
          ((r.getLong(2), r.getDouble(3), r.getLong(4), r.getDouble(5)))).toMap
      def d2(a: Seq[Float], b: Seq[Float]) = a.zip(b).map { case (x, y) =>
        (x.toDouble - y.toDouble) * (x.toDouble - y.toDouble) }.sum
      rows.filter(t => anchorIds(t._1)).foreach { case (aid, ae, albl) =>
        val pos = rows.filter(o => o._1 != aid && o._3 == albl)
          .map(o => (d2(ae, o._2), o._1)).sorted.headOption
        val neg = rows.filter(o => o._3 != albl)
          .map(o => (d2(ae, o._2), o._1)).sorted.headOption
        (pos, neg) match {
          case (Some((pd, pid)), Some((nd, nid))) =>
            assert(got(aid) == ((pid, pd, nid, nd)), s"seed $seed anchor $aid")
          case _ => assert(!got.contains(aid), s"seed $seed armless anchor $aid must drop")
        }
      }
      assert(got.keySet.subsetOf(anchorIds), s"seed $seed: only anchors emit")
    }
  }

  test("anchorSample lowers to a bounded TakeOrderedAndProject, never a global sort") {
    val emb = Tables.embeddings(spark, sf)
    val plan = Similarity.anchorSample(emb).queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"anchor selection must be the bounded per-partition top-n merge, got:\n${plan.take(600)}")
    assert(!plan.contains("Sort ["),
      "no global sort may appear below the take")
  }

  test("bounded-anchor mining: two-table forms at probe-all equal the self forms restricted to anchors") {
    val emb = Tables.embeddings(spark, sf)
    val anchors = Similarity.anchorSample(emb, 64)
    val ids = anchors.select("vec_id").collect().map(_.getLong(0)).toSet
    // hardNegativesFor(anchors, corpus) ≡ hardNegatives(corpus) filtered
    // to the anchor ids — the anchor generalization changes WHO is mined
    // for, never the candidate pool or the per-anchor answer.
    val forForm = Similarity.hardNegativesFor(anchors, emb, k = 3, nProbe = 1024)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).toSet
    val selfForm = Similarity.hardNegatives(emb, k = 3, nProbe = 1024)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
      .filter(t => ids.contains(t._1)).toSet
    assert(forForm == selfForm, "hardNegativesFor ≡ anchor-filtered hardNegatives")
    val auditFor = Similarity.knnLabelAuditFor(anchors, emb, nProbe = 1024)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
    // the self form's per-label accuracy differs (different denominator);
    // the FOR form must count exactly the anchors per label.
    val perLabel = anchors.groupBy("label").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    auditFor.foreach { case (lbl, nVecs, nCorrect) =>
      assert(nVecs == perLabel(lbl), s"label $lbl audits exactly its anchors")
      assert(nCorrect >= 0 && nCorrect <= nVecs, s"label $lbl correct count bounded")
    }
    assert(auditFor.map(_._2).sum == ids.size, "every anchor voted exactly once")
  }

  test("memoCount: repeat counts of one held DataFrame run no further Spark jobs") {
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    // per-instance scope: the SAME DataFrame stacked through several
    // blocked operators pays the count once (separate file reads key
    // apart by relation identity — that miss is deliberate and sound)
    val a = Tables.embeddings(spark, sf)
    val n1 = graft.ops.Similarity.memoCount(a)
    spark.sparkContext.addSparkListener(listener)
    try {
      val n2 = graft.ops.Similarity.memoCount(a)
      val n3 = graft.ops.Similarity.memoCount(a)
      Thread.sleep(500) // listener bus drains async; a job event would land well within this
      assert(n1 == n2 && n2 == n3 && n1 > 0)
      assert(jobs.get() == 0, s"repeat memoCounts must run no Spark jobs (ran ${jobs.get()})")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("autoProbe: √cells with floor 4, exact at perfect squares") {
    import graft.ops.Similarity.autoProbe
    assert(autoProbe(8) == 4, "floor holds at the 8-cell floor (historical outputs)")
    assert(autoProbe(16) == 4, "perfect square: IEEE sqrt(16) is exactly 4")
    assert(autoProbe(20) == 5, "the sf0.1 cell count probes 5")
    assert(autoProbe(100) == 10 && autoProbe(1024) == 32,
      "probed fraction falls as 1/√cells, not 1/cells")
  }

  test("IVF recall curve: probe-all pins 1.0, recall is monotone in the budget") {
    val emb = Tables.embeddings(spark, sf)
    val rows = graft.ops.Similarity.ivfRecallCurve(emb).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.map(_._1).toSeq == Seq(1L, 2L, 4L, 8L))
    val nQ = rows.head._2
    for ((p, q, hits, recall) <- rows) {
      assert(q == nQ && hits <= 10 * nQ, s"hits bounded at budget $p")
      assert(math.abs(recall - hits.toDouble / (10.0 * nQ)) < 1e-15)
    }
    // candidacy only ever grows with the budget — recall is monotone
    assert(rows.map(_._4).sliding(2).forall(w => w(0) <= w(1)),
      "recall must not decrease as more cells are probed")
    assert(rows.last._4 == 1.0,
      "probe-all candidacy is total: the probed top-k IS the brute top-k")
    assert(rows.head._4 < 1.0,
      "a one-cell probe on this geometry must actually lose recall, or the curve has no teeth")
  }

  test("batch kNN join: probe-all is exact, default probes clear a recall floor") {
    import graft.functions.VectorFunctions.l2Sq
    import org.apache.spark.sql.expressions.Window
    val emb = Tables.embeddings(spark, sf)
    val queries = emb.filter(col("vec_id") % 37 === 0)
    val w = Window.partitionBy(col("q_vec_id")).orderBy(col("d2"), col("c_vec_id"))
    val brute = queries.select(col("vec_id").as("q_vec_id"), col("embedding").as("qe"))
      .crossJoin(emb.select(col("vec_id").as("c_vec_id"), col("embedding").as("ce")))
      .withColumn("d2", l2Sq(col("qe"), col("ce")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 10)
      .select(col("q_vec_id"), col("rank"), col("c_vec_id"), col("d2"))
      .orderBy(col("q_vec_id"), col("rank"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq

    // Probing every cell removes the approximation entirely: the blocked
    // plan is then a partitioned brute force and must match it bitwise
    // (same distances, same (d2, id) tie-breaking through the native top-k).
    val probeAll = Similarity.knnJoin(queries, emb, nProbe = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(probeAll == brute, "probe-all blocked kNN join must equal brute force")

    // Default multi-probe (4 of 8): every query answers with ranks 1..k,
    // finds itself at rank 1 with distance 0, and recalls most of the true
    // top-10 (the approximation the probe width buys).
    val blocked = Similarity.knnJoin(queries, emb).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    val perQuery = blocked.groupBy(_._1)
    assert(perQuery.size == queries.count())
    perQuery.foreach { case (q, rs) =>
      assert(rs.map(_._2).sorted == (1L to 10L))
      val self = rs.find(_._2 == 1L).get
      assert(self._3 == q && self._4 == 0.0, s"query $q must self-match at rank 1")
    }
    val bruteSets = brute.groupBy(_._1).view.mapValues(_.map(_._3).toSet)
    val recall = perQuery.map { case (q, rs) =>
      (rs.map(_._3).toSet intersect bruteSets(q)).size.toDouble / 10
    }
    val meanRecall = recall.sum / recall.size
    info(f"kNN join recall@10 (nProbe=4/8): $meanRecall%.2f")
    assert(meanRecall >= 0.7, f"mean recall $meanRecall%.2f below floor")

    // And the plan is the bounded native top-k, not a global sort.
    val plan = Similarity.knnJoin(queries, emb).queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate") && plan.contains("top_k_by_value"),
      s"expected bounded native top-k:\n$plan")
  }

  test("hard negatives: probe-all equals brute force, never a same-label neighbor") {
    import graft.functions.VectorFunctions.l2Sq
    import org.apache.spark.sql.expressions.Window
    val emb = Tables.embeddings(spark, sf)
    val w = Window.partitionBy(col("q_vec_id")).orderBy(col("d2"), col("c_vec_id"))
    val brute = emb.select(col("vec_id").as("q_vec_id"), col("label").as("q_label"),
        col("embedding").as("qe"))
      .crossJoin(emb.select(col("vec_id").as("c_vec_id"), col("label").as("c_label"),
        col("embedding").as("ce")))
      .filter(col("q_label") =!= col("c_label"))
      .withColumn("d2", l2Sq(col("qe"), col("ce")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 5)
      .select(col("q_vec_id"), col("rank"), col("c_vec_id"), col("d2"))
      .orderBy(col("q_vec_id"), col("rank"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    val probeAll = Similarity.hardNegatives(emb, k = 5, nProbe = 8).collect()
      .map(r => (r.getLong(0), r.getAs[Long]("rank"), r.getAs[Long]("c_vec_id"),
        r.getAs[Double]("dist_sq"))).toSeq
    assert(probeAll == brute,
      "probe-all hard negatives must equal the brute-force different-label top-k")

    // Default probes: full rank range per query, the label invariant holds
    // (no self-pairs either — a vector shares its own label), and the
    // re-joined neighbor label really is the neighbor's.
    val labels = emb.collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    val mined = Similarity.hardNegatives(emb).collect()
    mined.foreach { r =>
      val q = r.getAs[Long]("q_vec_id"); val c = r.getAs[Long]("c_vec_id")
      assert(q != c, "self-pair leaked")
      assert(r.getAs[Int]("q_label") == labels(q))
      assert(r.getAs[Int]("neg_label") == labels(c))
      assert(labels(q) != labels(c), s"same-label neighbor leaked for query $q")
    }
    assert(mined.groupBy(_.getAs[Long]("q_vec_id"))
      .forall(_._2.map(_.getAs[Long]("rank")).sorted.toSeq == (1L to 5L)))
  }

  test("autoCells: floor at the historical 8, linear in the corpus, capped for the literal plan") {
    // the registered SFs resolve to exactly 8 — adaptive sizing must not
    // move the oracle-bound outputs
    assert(Similarity.autoCells(500L) == 8, "sf0.01 corpus")
    assert(Similarity.autoCells(2000L) == 8, "sf0.1 corpus (2000/256 rounds up to exactly 8)")
    assert(Similarity.autoCells(20000L) == 79, "the 10x probe corpus gets ~corpus/256 cells")
    assert(Similarity.autoCells(10L * 1000 * 1000 * 1000) == 1024,
      "billion-vector corpora cap where the literal-centroid plan form ends")
    assert(Similarity.autoCells(0L) == 8 && Similarity.autoCells(1L) == 8)
  }

  test("hard negatives: salting is invariant on a hot-cell label-skewed corpus") {
    import spark.implicits._
    // centroids at one-hot corners; vectors 8..511 ALL cluster near
    // centroid 0 and 90% carry label 0 — the dense dominant-class region
    // that makes one IVF cell hot in a real contrastive corpus.
    def corner(c: Int): Array[Float] = Array.tabulate(4)(d => if (d == c % 4) (10f + c / 4 * 5f) else 0f)
    val emb = ((0 until 8).map(i => (i.toLong, corner(i), i % 3)) ++
      (8 until 512).map { i =>
        (i.toLong, Array(10f + (i % 17) * 0.01f, (i % 13) * 0.01f, (i % 11) * 0.01f, 0f),
          if (i % 10 == 0) 1 else 0)
      }).toDF("vec_id", "embedding", "label")
    def rows(maxCellRows: Long) =
      Similarity.hardNegatives(emb, k = 5, nProbe = 2, maxCellRows = maxCellRows)
        .collect().map(r => (r.getLong(0), r.getAs[Long]("rank"),
          r.getAs[Long]("c_vec_id"), r.getAs[Double]("dist_sq"))).toSeq
    val salted = rows(50L) // hot cell ~504 rows → ~11 salts
    val unsalted = rows(Long.MaxValue)
    assert(salted == unsalted, "hot-cell salting must not change mined negatives")
    assert(salted.nonEmpty)
  }

  test("kNN label audit: probe-all equals the brute-force leave-one-out majority vote") {
    import graft.functions.VectorFunctions.l2Sq
    import org.apache.spark.sql.expressions.Window
    val emb = Tables.embeddings(spark, sf)
    val w = Window.partitionBy(col("q_vec_id")).orderBy(col("d2"), col("c_vec_id"))
    val bruteTop = emb.select(col("vec_id").as("q_vec_id"), col("label").as("q_label"),
        col("embedding").as("qe"))
      .crossJoin(emb.select(col("vec_id").as("c_vec_id"), col("label").as("c_label"),
        col("embedding").as("ce")))
      .filter(col("q_vec_id") =!= col("c_vec_id"))
      .withColumn("d2", l2Sq(col("qe"), col("ce")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("q_vec_id"), col("q_label"), col("c_label"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    val want = bruteTop.groupBy(t => (t._1, t._2)).toSeq
      .map { case ((_, qLabel), nbs) =>
        val pred = nbs.groupBy(_._3).toSeq
          .maxBy { case (lbl, vs) => (vs.size, -lbl) }._1
        (qLabel, pred)
      }
      .groupBy(_._1).view.mapValues(ps => (ps.size.toLong, ps.count(p => p._1 == p._2).toLong))
      .toMap
    val got = Similarity.knnLabelAudit(emb, k = 5, nProbe = 8).collect()
      .map(r => r.getInt(0) -> (r.getAs[Long]("n_vecs"), r.getAs[Long]("n_correct"))).toMap
    assert(got == want, s"audit mismatch: got $got want $want")
    // accuracy column is the plain division of the two integer columns
    Similarity.knnLabelAudit(emb, k = 5, nProbe = 8).collect().foreach { r =>
      assert(r.getAs[Double]("acc") ==
        r.getAs[Long]("n_correct").toDouble / r.getAs[Long]("n_vecs").toDouble)
    }
  }

  test("kmeans step: hand-exact microunit sums, tie to lower cid, members conserved") {
    import spark.implicits._
    val emb = Seq(
      (0L, Array(0f, 0f), 0), // seed cell 0
      (1L, Array(10f, 10f), 0), // seed cell 1
      (2L, Array(1f, 2f), 0), // -> cell 0
      (3L, Array(9f, 9.5f), 0), // -> cell 1
      (4L, Array(0.5f, -0.25f), 0), // -> cell 0 (exact binary fractions)
      (5L, Array(5f, 5f), 0) // equidistant -> cid tie-break -> cell 0
    ).toDF("vec_id", "embedding", "label")
    val got = Similarity.kmeansStep(emb, k = 2).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getAs[Long]("n_members"),
        r.getAs[Long]("sum_micro"), r.getAs[Double]("mean"))).toSeq
    val want = Seq(
      (0L, 1, 4L, 6500000L, 6500000.0 / 4e6),
      (0L, 2, 4L, 6750000L, 6750000.0 / 4e6),
      (1L, 1, 2L, 19000000L, 19000000.0 / 2e6),
      (1L, 2, 2L, 19500000L, 19500000.0 / 2e6))
    assert(got == want, s"got $got")

    // real corpus: every vector lands in exactly one cell per dimension
    val corpus = Tables.embeddings(spark, sf)
    val step = Similarity.kmeansStep(corpus).collect()
    val n = corpus.count()
    step.groupBy(_.getInt(1)).foreach { case (_, rows) =>
      assert(rows.map(_.getAs[Long]("n_members")).sum == n,
        "per-dimension member counts must partition the corpus")
    }
  }

  test("kmeansTrain == single-node Lloyd reference, bitwise, every round") {
    val corpus = Tables.embeddings(spark, sf).limit(200)
    val k = 6
    val rounds = 4
    val (got, gotStats) = Similarity.kmeansTrain(corpus, k, rounds)

    // independent single-node Lloyd over the same quantization contract:
    // double-fold l2, (d, cid) tie-break, floor(x*1e6) long sums, one
    // double division, one float rounding
    val rows = corpus.select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).sortBy(_._1)
    def l2sq(a: Array[Float], b: Array[Float]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { val d = a(i).toDouble - b(i).toDouble; acc += d * d; i += 1 }
      acc
    }
    var cents = rows.take(k).map(_._2.clone())
    val refStats = scala.collection.mutable.ArrayBuffer.empty[Similarity.KmeansRound]
    for (round <- 1 to rounds) {
      val dim = cents(0).length
      val cnt = Array.fill(k)(0L)
      val sums = Array.fill(k, dim)(0L)
      rows.foreach { case (_, v) =>
        val cell = cents.indices.minBy(c => (l2sq(v, cents(c)), c))
        cnt(cell) += 1
        var i = 0
        while (i < dim) { sums(cell)(i) += math.floor(v(i).toDouble * 1000000.0).toLong; i += 1 }
      }
      val next = cents.map(_.clone())
      var empty = 0
      (0 until k).foreach { c =>
        if (cnt(c) == 0) empty += 1
        else (0 until dim).foreach { i =>
          next(c)(i) = (sums(c)(i).toDouble / (cnt(c).toDouble * 1000000.0)).toFloat
        }
      }
      var maxMove = 0.0; var totalMove = 0.0
      (0 until k).foreach { c =>
        val m = l2sq(next(c), cents(c)); maxMove = math.max(maxMove, m); totalMove += m
      }
      refStats += Similarity.KmeansRound(round, maxMove, totalMove, empty)
      cents = next
    }
    assert(got.length == cents.length)
    got.zip(cents).zipWithIndex.foreach { case ((g, w), c) =>
      assert(g.map(java.lang.Float.floatToRawIntBits).toSeq ==
        w.map(java.lang.Float.floatToRawIntBits).toSeq,
        s"cell $c centroid must match the reference bit-for-bit")
    }
    assert(gotStats == refStats.toSeq, "per-round movement metrics must match exactly")
    // a Lloyd trajectory's total movement shrinks as it converges
    assert(gotStats.last.totalMoveSq <= gotStats.head.totalMoveSq)
    // convergence early-stop: a tolerance above round-2's movement halts
    // the loop there; the rounds actually run are a PREFIX of the full
    // trajectory (same arithmetic, just fewer rounds)
    val (_, stopped) = Similarity.kmeansTrain(corpus, k, rounds,
      tolerance = gotStats(1).maxMoveSq + 1e-9)
    assert(stopped.length < rounds && stopped == gotStats.take(stopped.length))
  }

  test("cluster sample: bounded top-k agg == row_number window replay, caps hold") {
    import org.apache.spark.sql.expressions.Window
    val corpus = Tables.embeddings(spark, sf)
    val cap = 5
    val got = Similarity.clusterSample(corpus, k = 8, cap = cap).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSeq

    // independent formulation: full per-cell sort via a window
    val w = Window.partitionBy(col("cell")).orderBy(col("draw"), col("vec_id"))
    val want = Similarity.assignSeedCells(corpus, 8)
      .withColumn("draw", graft.ops.Sampling.hashDraw(col("vec_id")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= cap)
      .select(col("cell"), col("rank"), col("vec_id"), col("draw"))
      .orderBy(col("cell"), col("rank")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSeq
    assert(got == want, "bounded-agg selection must equal the window form")

    val perCell = got.groupBy(_._1)
    perCell.foreach { case (_, rows) =>
      assert(rows.size <= cap)
      assert(rows.map(_._2).sorted == (1L to rows.size.toLong), "ranks contiguous from 1")
    }
    // a cell with more members than the cap is actually capped
    val cellSizes = Similarity.assignSeedCells(corpus, 8)
      .groupBy(col("cell")).count().collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(cellSizes.exists(_._2 > cap), "fixture must exercise the cap")
    cellSizes.filter(_._2 > cap).keys.foreach { c =>
      assert(perCell(c).size == cap, s"over-full cell $c must hold exactly cap rows")
    }
  }

  test("native codegen dot/l2sq are bitwise-equal to the HOF formulation") {
    import graft.functions.VectorFunctions._
    val emb = Tables.embeddings(spark, sf)
    val q = emb.filter(col("vec_id") === 0L).select(col("embedding").as("qe"))
    val both = emb.crossJoin(q)
      .select(
        dot(col("embedding"), col("qe")).as("d_native"),
        dotHof(col("embedding"), col("qe")).as("d_hof"),
        l2Sq(col("embedding"), col("qe")).as("l_native"),
        l2SqHof(col("embedding"), col("qe")).as("l_hof"))
      .collect()
    both.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
      assert(java.lang.Double.doubleToLongBits(r.getDouble(2)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(3)))
    }
  }

  test("nearestCells equals the literal array_sort form — ties break by cid, k clamps") {
    import graft.functions.VectorFunctions._
    import org.apache.spark.sql.functions.{array, array_sort, element_at, lit, slice, struct, transform, typedLit}
    val emb = Tables.embeddings(spark, sf)
    // centroids with a PLANTED TIE: cid 7 duplicates cid 2's embedding,
    // so every row's distance to both is bit-identical and only the cid
    // tie-break orders them
    val base = emb.filter(col("vec_id") < 6)
      .orderBy("vec_id").collect()
      .map(r => r.getSeq[Float](r.fieldIndex("embedding")).toSeq)
    val cents: Seq[(Long, Seq[Float])] =
      base.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toSeq :+ (7L -> base(2).toSeq)
    val k = 4
    val centStructs = cents.map { case (cid, v) =>
      struct(l2Sq(col("embedding"), typedLit(v)).as("d"), lit(cid).as("cid"))
    }
    val literal = slice(transform(array_sort(array(centStructs: _*)),
      x => x.getField("cid")), 1, k)
    val rows = emb.select(
      orderedCellCids(col("embedding"), cents, k).as("fast"),
      literal.as("lit"),
      nearestCellCid(col("embedding"), cents).as("c1"),
      nearestCellDistSq(col("embedding"), cents).as("d1"))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1), s"probe order diverged: $r")
      assert(r.getLong(2) == r.getSeq[Long](0).head)
      assert(r.getDouble(3) >= 0.0)
    }
    // k past the centroid count clamps to all cells, still ordered
    val all = emb.limit(3)
      .select(orderedCellCids(col("embedding"), cents, 99).as("a")).collect()
    all.foreach(r => assert(r.getSeq[Long](0).length == cents.length))
    // the planted tie really ties: for the row AT cid-2's centroid both
    // 2 and 7 lead, in cid order
    val atC2 = emb.filter(col("vec_id") === 2L)
      .select(orderedCellCids(col("embedding"), cents, 2)).head.getSeq[Long](0)
    assert(atC2 == Seq(2L, 7L), s"tie-break drifted: $atC2")
  }

  test("signBits equals the concat-of-when literal form, bit for bit") {
    import graft.functions.VectorFunctions._
    import org.apache.spark.sql.functions.{concat, lit, typedLit, when}
    val emb = Tables.embeddings(spark, sf)
    val dim = emb.select(org.apache.spark.sql.functions.size(col("embedding"))).head.getInt(0)
    val rnd = new scala.util.Random(7L)
    val planes: Seq[Seq[Float]] =
      Seq.fill(16)(Seq.fill(dim)(rnd.nextGaussian().toFloat))
    val literal = concat(planes.map(p =>
      when(dot(col("embedding"), typedLit(p)) >= 0, lit("1")).otherwise(lit("0"))): _*)
    val rows = emb.select(signBits(col("embedding"), planes).as("fast"),
      literal.as("lit")).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getString(0) == r.getString(1), s"sig diverged: $r"))
    // a zero vector dots to +0.0 against every plane: all-ones, both forms
    val zero = emb.limit(1).select(
      org.apache.spark.sql.functions.expr(s"array_repeat(float(0.0), $dim)").as("embedding"))
    val z = zero.select(signBits(col("embedding"), planes).as("fast"), literal.as("lit")).head
    assert(z.getString(0) == "1" * 16 && z.getString(1) == z.getString(0))
  }

  test("knnL2: the query vector itself is rank 1 with distance 0") {
    val top = Similarity.knnL2(Tables.embeddings(spark, sf)).collect()
    assert(top.head.getAs[Long]("rank") == 1L)
    assert(top.head.getAs[Long]("vec_id") == 0L)
    assert(top.head.getAs[Double]("dist_sq") == 0.0)
    assert(top.head.getAs[Double]("similarity") == 1.0)
  }

  test("kNN merge invariant: per-partition top-k then merge == global top-k") {
    // the faiss_manager.py:254-291 invariant — repartitioning must not
    // change the result (TakeOrderedAndProject does partial+final top-k)
    val emb = Tables.embeddings(spark, sf)
    val a = Similarity.knnL2(emb).collect().map(_.getAs[Long]("vec_id")).toSeq
    val b = Similarity.knnL2(emb.repartition(13)).collect().map(_.getAs[Long]("vec_id")).toSeq
    assert(a == b)
  }

  test("IVF results are a subset of brute-force candidates by construction") {
    val emb = Tables.embeddings(spark, sf)
    val ivf = Similarity.ivfSearch(emb, k = 10).collect()
    assert(ivf.length == 10)
    // IVF distances are >= the true k-th best can't be asserted strictly;
    // but the probed-cell top hit must include the query vector itself
    // (vec 0 is its own nearest centroid's member)
    assert(ivf.head.getAs[Long]("vec_id") == 0L)
  }

  test("cosineDupPairs is symmetric-free (a < b) and thresholded") {
    Similarity.cosineDupPairs(Tables.embeddings(spark, sf), 0.4).collect().foreach { r =>
      assert(r.getAs[Long]("vec_id_a") < r.getAs[Long]("vec_id_b"))
      assert(r.getAs[Double]("cos_sim") >= 0.4 - 1e-6)
    }
  }

  test("salted kNN join equals the unsalted join while bounding per-key corpus rows") {
    import org.apache.spark.sql.functions.col
    val emb = Tables.embeddings(spark, sf)
    val queries = emb.filter(col("vec_id") % 37 === 0)
    val plain = graft.ops.Similarity.knnJoin(queries, emb).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // maxCellRows = 10 forces every non-trivial cell to salt into many
    // sub-keys — the hot-cell path, exercised on ALL cells.
    val salted = graft.ops.Similarity.knnJoinSalted(queries, emb, maxCellRows = 10L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(salted.sameElements(plain),
      "salting must only change shuffle granularity, never the result")
    // and with a huge threshold (no salting) it degenerates to the plain join
    val unsalted = graft.ops.Similarity.knnJoinSalted(queries, emb).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(unsalted.sameElements(plain))
  }

  test("RP-LSH cosine dedup: verified subset of all-pairs, full recall at high cosine") {
    val emb = Tables.embeddings(spark, sf)
    val exact = graft.ops.Similarity.cosineDupPairs(emb, 0.9).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Double]("cos_sim")).toMap
    val lsh = graft.ops.Similarity.rpLshDupPairs(emb, 0.9).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Double]("cos_sim")).toMap
    // every emitted pair is exact-verified: same cosine as the all-pairs form
    lsh.foreach { case (k, c) => assert(exact(k) == c) }
    // 8 bands of 2 bits at cos ≥ 0.9 (θ ≤ 26°): per-band collision
    // (1−θ/π)² ≈ 0.73, miss probability (1−0.73)^8 ≈ 3e-5 — with the
    // fixed seed this is deterministic, and on the fixture recall is total.
    assert(lsh.keySet == exact.keySet,
      s"missed: ${exact.keySet.diff(lsh.keySet)}")
  }

  test("RP-LSH bucket cap: no-op on the registered fixture, drops a hot bucket whole") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, transform => atransform}
    // the registered vec_rplsh_pairs fixture: planted doubled twins
    val emb = Tables.embeddings(spark, sf).select(col("vec_id"), col("embedding"))
    val planted = emb.filter(col("vec_id") % 25 === 0)
      .select((col("vec_id") + 100000L).as("vec_id"),
        atransform(col("embedding"), x => x + x).as("embedding"))
    val u = emb.unionByName(planted)
    def run(cap: Int) = graft.ops.Similarity
      .rpLshDupPairs(u, 0.9, nBits = 64, bandBits = 16, maxBucket = cap)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val capped = run(256)
    assert(capped == run(0),
      "the registered cap must not fire on the shipped fixture (oracle binds recall-free)")
    val exact = graft.ops.Similarity.cosineDupPairs(u, 0.9).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(capped == exact, "capped config keeps total recall on the fixture")
    // teeth: positive rescalings share every sign bit but are not
    // byte-identical (the representative collapse can't absorb them) —
    // one 60-deep bucket in every band, dropped WHOLE past the cap
    val hot = (0 until 60).map { i =>
      (i.toLong, Seq.tabulate(8)(d => (d + 1).toFloat * (1f + i * 1e-4f)))
    }.toDF("vec_id", "embedding")
    assert(graft.ops.Similarity.rpLshDupPairs(hot, 0.9, maxBucket = 10).count() == 0L,
      "a bucket past the cap contributes no candidates")
    assert(graft.ops.Similarity.rpLshDupPairs(hot, 0.9).count() == 60L * 59 / 2,
      "uncapped control emits the full clique")
  }

  test("blocked cosine dedup reproduces the all-pairs verifier exactly") {
    val emb = Tables.embeddings(spark, sf)
    val blocked = Similarity.cosineDupPairsBlocked(emb, 0.42).collect()
    val allPairs = Similarity.cosineDupPairs(emb, 0.42).collect()
    assert(blocked.length == allPairs.length)
    blocked.zip(allPairs).foreach { case (b, a) =>
      assert(b.getAs[Long]("vec_id_a") == a.getAs[Long]("vec_id_a"))
      assert(b.getAs[Long]("vec_id_b") == a.getAs[Long]("vec_id_b"))
      assert(b.getAs[Double]("cos_sim") == a.getAs[Double]("cos_sim"))
    }
  }

  test("semantic dedup: survivors partition the corpus, drops sit in their survivor's component") {
    val emb = Tables.embeddings(spark, sf)
    val kept = Similarity.semanticDedup(emb, 0.42)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val n = emb.count()

    // The survivors' cluster sizes tile the corpus exactly: every vector is
    // represented by exactly one survivor.
    assert(kept.values.sum == n, "cluster sizes must sum to the corpus size")

    // Ground truth from the all-pairs definition: union-find over the
    // exact cos >= 0.42 edge set.
    val edges = Similarity.cosineDupPairs(emb, 0.42)
      .collect().map(r => (r.getAs[Long]("vec_id_a"), r.getAs[Long]("vec_id_b")))
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = { val p = parent.getOrElse(x, x); if (p == x) x else { val r = find(p); parent(x) = r; r } }
    edges.foreach { case (a, b) => val (ra, rb) = (find(a), find(b)); if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb) }
    val allIds = emb.select(col("vec_id")).collect().map(_.getLong(0))
    val byComp = allIds.groupBy(find)

    // Exactly the component minima survive, each carrying its component size.
    assert(kept == byComp.map { case (root, members) => members.min -> members.length.toLong },
      "survivors must be the per-component minimum ids with component sizes")
  }

  test("vector index: append, prune, retain, search round-trip") {
    val dir = java.nio.file.Files.createTempDirectory("graft-index").toString
    val idx = VectorIndex.fromEmbeddings(Tables.embeddings(spark, sf))
    VectorIndex.append(idx, dir)
    val asOf = java.sql.Date.valueOf("2024-01-10")
    val recent = VectorIndex.loadRecent(spark, dir, asOf)
    assert(recent.select("ingest_date").distinct().count() == 7)
    val dropped = VectorIndex.retain(spark, dir, asOf)
    assert(dropped.nonEmpty)
    val left = spark.read.parquet(dir).select("ingest_date").distinct().count()
    assert(left == 7)
    // search over the persisted index returns FAISS-parity shape
    val qv = Tables.embeddings(spark, sf).filter(col("vec_id") === 0L)
      .select("embedding").head.getSeq[Float](0)
    val hits = VectorIndex.search(spark.read.parquet(dir), qv, 5).collect()
    assert(hits.length == 5)
    assert(hits.map(_.getAs[Long]("rank")).toSeq == Seq(1L, 2L, 3L, 4L, 5L))
    assert(hits.head.getAs[Double]("similarity_score") <= 1.0)
  }

  test("range search returns exactly the vectors within the radius") {
    import graft.functions.VectorFunctions.l2Sq
    val emb = Tables.embeddings(spark, sf)
    val r2 = 1.55
    val got = Similarity.rangeSearch(emb, queryId = 0L, radiusSq = r2).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Double]("dist_sq"))
    // brute-force definition: every non-query vector at d2 <= r2
    val qe = emb.filter(col("vec_id") === 0L).select("embedding").head.getSeq[Float](0)
    val expected = emb
      .withColumn("d2", l2Sq(col("embedding"), typedLit(qe)))
      .filter(col("d2") <= r2 && col("vec_id") =!= 0L)
      .select("vec_id", "d2").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).sortBy(_._1)
    assert(got.nonEmpty, "radius should capture the fixture's near tail")
    assert(got.toSeq == expected.toSeq)
  }

  test("prefix-rerank funnel with all-candidates equals brute-force kNN bitwise") {
    val emb = Tables.embeddings(spark, sf)
    val n = emb.count().toInt
    val funnel = Similarity.prefixRerankKnn(emb, dims = 16, m = n, k = 10).collect()
      .map(r => (r.getAs[Long]("rank"), r.getAs[Long]("vec_id"), r.getAs[Double]("dist_sq")))
    val brute = Similarity.knnL2(emb, k = 10).collect()
      .map(r => (r.getAs[Long]("rank"), r.getAs[Long]("vec_id"), r.getAs[Double]("dist_sq")))
    assert(funnel.toSeq == brute.toSeq,
      "with m = N the funnel must reproduce exact kNN bit-for-bit")
  }

  test("prefix-rerank candidates really are the prefix-distance top-m") {
    import graft.functions.VectorFunctions.l2Sq
    val emb = Tables.embeddings(spark, sf)
    val got = Similarity.prefixRerankKnn(emb, dims = 16, m = 50, k = 50).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Double]("prefix_dist_sq")).toMap
    // reference: prefix distances computed directly
    val qe = emb.filter(col("vec_id") === 0L).select("embedding").head.getSeq[Float](0)
    val want = emb
      .withColumn("pd2", l2Sq(slice(col("embedding"), 1, 16),
        typedLit(qe.slice(0, 16))))
      .orderBy(col("pd2"), col("vec_id")).limit(50)
      .select("vec_id", "pd2").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got == want)
  }
}
