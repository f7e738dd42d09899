package graft

import graft.ops.{Dedup, TextAnalysis}

class DedupSpec extends SparkSpec {

  test("exact dedup finds exactly the synthesized duplicate groups") {
    import org.apache.spark.sql.functions.col
    val docs = Tables.documents(spark, sf)
    // The operator takes the corpus as-is; the FIXTURE injects the dups
    // (every 7th doc re-ingested under a new id), mirroring SparkEntry.
    val reIngested = docs.filter(col("doc_id") % 7 === 0)
      .withColumn("doc_id", col("doc_id") + 1000000L)
    val groups = Dedup.exactDupGroups(docs.unionByName(reIngested)).collect()
    val expected = docs.filter("doc_id % 7 = 0").count()
    assert(groups.length == expected)
    groups.foreach(g => assert(g.getAs[Long]("n_copies") == 2L))
    // And on the pristine corpus the operator reports NO duplicates.
    assert(Dedup.exactDupGroups(docs).count() == 0L)
  }

  test("quality survivors: longest cluster member wins, singletons pass, sizes tile the corpus") {
    import spark.implicits._
    val base = "alpha beta gamma delta epsilon zeta"
    val longer = base + " extra tail words here"
    val docs = Seq(
      (10L, base, base.length.toLong),
      (11L, longer, longer.length.toLong), // longest of the cluster — must win
      (12L, base, base.length.toLong),     // verbatim copy of 10
      (20L, "totally unrelated text about something else entirely now", 57L))
      .toDF("doc_id", "text", "n_chars")
    val got = Dedup.qualitySurvivors(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got.keySet == Set(11L, 20L),
      s"one survivor per cluster plus the singleton, got ${got.keySet}")
    assert(got(11L)._1 == 3L, "the cluster's mass rides its survivor")
    assert(got(20L)._1 == 1L)
    assert(got.values.map(_._1).sum == 4L, "cluster sizes tile the corpus")
    // tie on n_chars → min doc_id: drop 11, leave the two verbatim copies
    val tied = Seq(
      (10L, base, base.length.toLong),
      (12L, base, base.length.toLong),
      (20L, "totally unrelated text about something else entirely now", 57L))
      .toDF("doc_id", "text", "n_chars")
    val tgot = Dedup.qualitySurvivors(tied).collect().map(_.getLong(0)).toSet
    assert(tgot == Set(10L, 20L), "equal quality falls to the smaller id")
  }

  test("capped blocked jaccard: exact path when cap doesn't bind, LSH fallback is a verified subset") {
    val docs = Tables.documents(spark, sf)
    val exact = Dedup.blockedJaccardPairs(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // Cap above every block size: capped ≡ exact, row for row.
    val uncappedPath = Dedup.blockedJaccardPairsCapped(docs, maxBlockDocs = 1000000).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(uncappedPath == exact)
    // Cap of 0: every block routes through the LSH fallback. Candidates are
    // exact-verified, so every emitted pair carries the TRUE jaccard and is
    // a subset of the exact result; the fixture's planted near-dups (all
    // ≥0.88 jaccard, far above the ~0.63 LSH threshold) must all survive.
    val lshPath = Dedup.blockedJaccardPairsCapped(docs, maxBlockDocs = 0).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    lshPath.foreach { case (k, j) => assert(exact(k) == j) }
    assert(lshPath.keySet == exact.keySet, "high-sim fixture pairs must survive the LSH fallback")
  }

  test("minhash candidate pairs are ordered and Jaccard-verified") {
    val pairs = Dedup.minhashDupPairs(Tables.documents(spark, sf)).collect()
    assert(pairs.nonEmpty, "fixture corpus has planted near-dups")
    pairs.foreach { p =>
      assert(p.getAs[Long]("doc_a") < p.getAs[Long]("doc_b"))
      assert(p.getAs[Double]("jaccard") >= 0.3)
      assert(p.getAs[Long]("n_shared_bands") >= 1L)
    }
  }

  test("minhash agrees with brute-force high-Jaccard pairs (recall check)") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sf)
    val sh = Dedup.shingles(docs)
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val brute = sh.as("a").join(sh.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
      .agg(count(lit(1)).as("ninter"))
      .join(sizes.select(col("doc_id").as("da"), col("n").as("na")), "da")
      .join(sizes.select(col("doc_id").as("db"), col("n").as("nb")), "db")
      .filter(col("ninter") / (col("na") + col("nb") - col("ninter")) >= 0.8)
      .select("da", "db").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minhashDupPairs(docs).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(brute.subsetOf(lsh), s"LSH missed high-sim pairs: ${brute.diff(lsh)}")
  }

  test("simhash signatures are 16-bit strings; near-dup docs collide") {
    val sig = Dedup.simhash(Tables.documents(spark, sf)).collect()
    sig.foreach(r => assert(r.getAs[String]("simhash").matches("[01]{16}")))
  }

  test("simhash hamming-radius pairs equal the brute-force definition exactly") {
    val docs = Tables.documents(spark, sf)
    def hamming(a: String, b: String): Int = a.zip(b).count { case (x, y) => x != y }
    val sigs = Dedup.simhashSigs(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("simhash"))
    val brute = (for {
      (ia, sa) <- sigs; (ib, sb) <- sigs
      if ia < ib && hamming(sa, sb) <= 2
    } yield (ia, ib, hamming(sa, sb).toLong)).toSet
    val probed = Dedup.simhashDupPairs(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // guaranteed recall at radius 2: the probe construction IS the definition
    assert(probed == brute, s"diff: ${brute.diff(probed)} / ${probed.diff(brute)}")
  }

  test("curated corpus writer partitions by predicted language") {
    val dir = java.nio.file.Files.createTempDirectory("graft-curated").toString + "/corpus"
    val summary = TextAnalysis.writeCurated(Tables.documents(spark, sf), dir, 0.4)
      .collect().map(r => r.getAs[String]("pred_lang") -> r.getAs[Long]("n_docs")).toMap
    assert(summary.values.sum > 0)
    val dirs = new java.io.File(dir).listFiles().filter(_.isDirectory).map(_.getName).toSet
    assert(summary.keySet.map(l => s"pred_lang=$l") == dirs)
  }

  test("fingerprint and token counts are consistent") {
    val docs = Tables.documents(spark, sf)
    val tc = TextAnalysis.tokenCounts(docs).collect()
    tc.foreach { r =>
      assert(r.getAs[Long]("n_distinct_tokens") <= r.getAs[Long]("n_ws_tokens"))
      assert(r.getAs[Long]("n_re_tokens") == r.getAs[Long]("n_ws_tokens"),
        "clean corpus: regex tokens == whitespace tokens")
    }
  }

  test("connected components labels every node with its component's min id") {
    import spark.implicits._
    // Two components: a path 1-2-3-4 (diameter > 1 forces multiple
    // propagation rounds) and a triangle 10-11-12; plus isolated edge 20-21.
    val edges = Seq((2L, 1L), (2L, 3L), (3L, 4L), (10L, 11L), (11L, 12L),
      (10L, 12L), (20L, 21L)).toDF("a", "b")
    val labels = Dedup.connectedComponents(edges, "a", "b")
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("label")).toMap
    assert(labels == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("sampling: deterministic, stable under growth, splits partition the corpus") {
    import org.apache.spark.sql.functions.col
    import graft.ops.Sampling
    val docs = Tables.documents(spark, sf)
    val s1 = Sampling.hashSample(docs, col("doc_id"), "33333333")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val s2 = Sampling.hashSample(docs, col("doc_id"), "33333333")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(s1 == s2, "same corpus, same sample")
    val n = docs.count()
    assert(math.abs(s1.size.toDouble / n - 0.2) < 0.1, s"~20% sample, got ${s1.size}/$n")
    // stability under growth: sampling a SUBSET never flips membership
    val sub = Sampling.hashSample(docs.filter(col("doc_id") < 100), col("doc_id"), "33333333")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(sub == s1.filter(_ < 100))
    // splits: total partition, deterministic, ~80/10/10
    val splits = Sampling.assignSplits(docs, col("doc_id"))
      .groupBy(col("split")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(splits.keySet == Set("train", "val", "test"))
    assert(splits.values.sum == n)
    assert(splits("train").toDouble / n > 0.7)
    // per-group cap: lowest ids survive, never more than cap per group
    val capped = Sampling.capPerGroup(docs, "source", "doc_id", 10).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    capped.groupBy(_._1).foreach { case (src, rows) =>
      assert(rows.length <= 10)
      val expected = docs.filter(col("source") === src)
        .select("doc_id").collect().map(_.getLong(0)).sorted.take(10).toSeq
      assert(rows.map(_._2).toSeq.sorted == expected, s"group $src must keep lowest ids")
    }
  }

  test("corpus mixing fills each source's budget share maximally, in draw order, never over") {
    import org.apache.spark.sql.functions.col
    import graft.ops.Sampling
    val docs = Tables.documents(spark, sf)
    val weights = Map("src0" -> 0.5, "src1" -> 0.3, "src2" -> 0.2)
    val budgets = Map("src0" -> 1000L, "src1" -> 600L, "src2" -> 400L)
    val mixed = Sampling.mixCorpus(docs, weights, 2000L).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))

    assert(mixed.map(_._2).toSet == weights.keySet, "only listed sources contribute")
    mixed.groupBy(_._2).foreach { case (src, rows) =>
      assert(rows.map(_._3).sum == rows.map(_._4).max, "cum_tokens is the running sum")
      assert(rows.map(_._4).max <= budgets(src), s"$src budget never overfilled")
    }

    // The selection is exactly the maximal draw-ordered prefix per source:
    // recompute from the raw corpus with an independent fold.
    val raw = docs.filter(col("source").isin(weights.keys.toSeq: _*))
      .select(col("doc_id"), col("source"),
        org.apache.spark.sql.functions.size(org.apache.spark.sql.functions.split(col("text"), " "))
          .cast("long").as("n"),
        Sampling.hashDraw(col("doc_id")).as("draw"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3)))
    val expected = raw.groupBy(_._2).flatMap { case (src, rows) =>
      var cum = 0L
      rows.toSeq.sortBy(r => (r._4, r._1)).flatMap { r =>
        cum += r._3
        if (cum <= budgets(src)) Some((r._1, src, r._3, cum)) else None
      }
    }.toSet
    assert(mixed.toSet == expected, "mixture must be the maximal per-source prefix")
  }

  test("winnowing: the shared-substring guarantee holds; fingerprints match a reference") {
    import spark.implicits._
    val k = 3; val w = 4
    // Single-node reference implementation of the published construction.
    def refFps(text: String): Set[String] = {
      val toks = text.split(" ").filter(_.nonEmpty)
      if (toks.length < k) return Set.empty
      val md = java.security.MessageDigest.getInstance("MD5")
      def md5hex(s: String): String =
        md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val grams = toks.sliding(k).map(g => md5hex(g.mkString(" "))).toVector
      if (grams.length < w) return Set.empty
      grams.sliding(w).map(_.min).toSet
    }
    val rnd = new scala.util.Random(11)
    def randWords(n: Int): String =
      Seq.fill(n)("w" + rnd.nextInt(5000)).mkString(" ")
    val sharedRun = randWords(k + w - 1) // the guarantee threshold length
    val docs = Seq(
      (1L, randWords(30) + " " + sharedRun + " " + randWords(30)),
      (2L, randWords(25) + " " + sharedRun + " " + randWords(40)),
      (3L, randWords(60)),
      (4L, "a b"), // shorter than k: no fingerprints
      (5L, "x y z")) // exactly k tokens but fewer than w grams
      .toDF("doc_id", "text")
    val got = Dedup.winnowFingerprints(docs, k, w).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    docs.collect().foreach { r =>
      assert(got(r.getLong(0)) == refFps(r.getString(1)),
        s"doc ${r.getLong(0)}: distributed fps must equal the reference construction")
    }
    // the published guarantee: a shared run of >= w+k-1 tokens forces a
    // shared fingerprint
    assert((got(1L) intersect got(2L)).nonEmpty,
      "docs sharing a (w+k-1)-token run must share a fingerprint")
    assert(got(4L).isEmpty && got(5L).isEmpty)
    // pair query surfaces the planted pair
    val pairs = Dedup.winnowDupPairs(docs, k, w, minShared = 1).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))

    // randomized sweep: 80 docs at every boundary length (0, 1, k−1, k,
    // k+w−2, k+w−1, and larger) must ALL reproduce the reference
    // construction exactly — one distributed job for the whole sweep
    val lengths = Seq(0, 1, k - 1, k, k + w - 2, k + w - 1, 10, 37, 120)
    val sweep = (0 until 80).map { i =>
      (1000L + i, randWords(lengths(i % lengths.length)))
    }.toDF("doc_id", "text")
    val sweepGot = Dedup.winnowFingerprints(sweep, k, w).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    sweep.collect().foreach { r =>
      assert(sweepGot(r.getLong(0)) == refFps(r.getString(1)),
        s"sweep doc ${r.getLong(0)} (len ${r.getString(1).split(" ").count(_.nonEmpty)})")
    }
  }

  test("winnowing df cap: boilerplate fp dropped, rare-run pairs survive, candidate volume linear") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val k = 3; val w = 4
    // Per-doc DISJOINT filler vocabularies: the only cross-doc grams are the
    // planted runs, so every shared fingerprint is attributable by design.
    def filler(d: Int, n: Int): String = Seq.tabulate(n)(j => s"d${d}x$j").mkString(" ")
    val boiler = Seq.tabulate(k + w - 1 + 6)(i => s"b$i").mkString(" ") // ultra-common run
    val nBoiler = 60
    val boilerDocs = (0 until nBoiler).map(i => (i.toLong, filler(i, 20) + " " + boiler + " " + filler(1000 + i, 20)))
    val rareRun = Seq.tabulate(k + w - 1)(i => s"r$i").mkString(" ") // guarantee-threshold run in exactly 2 docs
    val rarePair = Seq(
      (900L, filler(900, 15) + " " + rareRun + " " + filler(1900, 15)),
      (901L, filler(901, 18) + " " + rareRun + " " + filler(1901, 12)))
    val docs = (boilerDocs ++ rarePair).toDF("doc_id", "text")

    // The fp shared by ALL 60 boiler docs (the run's interior window minimum)
    // must be capped out at maxDf = 10; the rare-run pair must survive.
    val capped = Dedup.winnowDupPairs(docs, k, w, minShared = 1, maxDf = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped.contains((900L, 901L)), "pair sharing a rare (w+k-1)-token run must survive the cap")

    // A cap below any shared fp's df kills every pair — proves the cap binds.
    assert(Dedup.winnowDupPairs(docs, k, w, minShared = 1, maxDf = 1).count() == 0L)

    // Candidate-volume accounting straight from the fingerprint table:
    // uncapped volume includes the hot fp's C(60,2) = 1770 quadratic blowup;
    // capped volume obeys the documented Σ C(min(df,cap),2) linear bound.
    val dfTable = Dedup.winnowFingerprints(docs, k, w)
      .select(explode(col("fps")).as("fp"))
      .groupBy(col("fp")).agg(count(lit(1)).as("df"))
      .collect().map(_.getAs[Long]("df"))
    def volume(dfs: Seq[Long]): Long = dfs.map(d => d * (d - 1) / 2).sum
    val uncappedVol = volume(dfTable.toSeq)
    val cappedVol = volume(dfTable.toSeq.filter(_ <= 10))
    assert(dfTable.contains(nBoiler.toLong), "fixture must actually plant a df=60 hot fingerprint")
    assert(uncappedVol >= 1770L, "uncapped join volume is quadratic in the hot group")
    assert(cappedVol <= 10L * dfTable.count(_ <= 10), "capped volume respects the linear bound")
    assert(cappedVol * 3 < uncappedVol, "the cap removes the quadratic mass")
  }

  test("split repair: zero straddling near-dup pairs remain; singletons untouched") {
    import org.apache.spark.sql.functions.col
    val docs = Tables.documents(spark, sf)
    val repaired = graft.ops.Sampling.repairSplitLeakage(docs).cache()
    // the audit found real leakage pre-repair...
    val pairs = Dedup.minhashDupPairs(docs).select(col("doc_a"), col("doc_b")).cache()
    val pre = pairs
      .join(repaired.select(col("doc_id").as("doc_a"), col("original_split").as("sa")), "doc_a")
      .join(repaired.select(col("doc_id").as("doc_b"), col("original_split").as("sb")), "doc_b")
      .filter(col("sa") =!= col("sb")).count()
    assert(pre > 0, "fixture drift: the raw split must actually leak")
    // ...and none survives the repair
    val post = pairs
      .join(repaired.select(col("doc_id").as("doc_a"), col("split").as("sa")), "doc_a")
      .join(repaired.select(col("doc_id").as("doc_b"), col("split").as("sb")), "doc_b")
      .filter(col("sa") =!= col("sb")).count()
    assert(post == 0, s"repair must close every leak, $post pairs still straddle")
    // singletons (no near-dup edge) keep their hash-assigned split
    val moved = repaired.filter(col("split") =!= col("original_split"))
    assert(moved.count() > 0, "some clustered docs must actually move")
    assert(moved.filter(col("group_id") === col("doc_id")).count() == 0,
      "a representative (or singleton) never moves")
    pairs.unpersist(); repaired.unpersist()
  }

  test("mixture prefix sum is bucket-count invariant (distributed ≡ per-source window)") {
    // The packSequences precedent: the bucketed offsets must reproduce the
    // single-window cumsum exactly for ANY bucketing granularity.
    import graft.ops.Sampling
    val docs = Tables.documents(spark, sf)
    val weights = Map("src0" -> 0.5, "src1" -> 0.3, "src2" -> 0.2)
    def key(r: org.apache.spark.sql.Row) = r.toSeq.toList
    val ref = Sampling.mixCorpus(docs, weights, 2000L, bucketChars = 2).collect().map(key).toSet
    for (bc <- Seq(1, 3)) {
      assert(Sampling.mixCorpus(docs, weights, 2000L, bucketChars = bc)
        .collect().map(key).toSet == ref, s"mixCorpus differs at bucketChars=$bc")
    }
    val refT = Sampling.temperatureMix(docs, 2000L, bucketChars = 2).collect().map(key).toSet
    assert(Sampling.temperatureMix(docs, 2000L, bucketChars = 1)
      .collect().map(key).toSet == refT, "temperatureMix differs at bucketChars=1")
    val refE = Sampling.mixCorpusEpochs(docs, weights, 8000L, 2, bucketChars = 2)
      .collect().map(key).toSet
    assert(Sampling.mixCorpusEpochs(docs, weights, 8000L, 2, bucketChars = 1)
      .collect().map(key).toSet == refE, "mixCorpusEpochs differs at bucketChars=1")
  }

  test("epoch mixture: full passes under the cap, remainder as a draw-ordered prefix") {
    import org.apache.spark.sql.functions.{col, size, split}
    import graft.ops.Sampling
    val docs = Tables.documents(spark, sf)
    val weights = Map("src0" -> 0.5, "src1" -> 0.3, "src2" -> 0.2)
    val budgets = Map("src0" -> 4000L, "src1" -> 2400L, "src2" -> 1600L)
    val maxEpochs = 2
    val out = Sampling.mixCorpusEpochs(docs, weights, 8000L, maxEpochs).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))

    val raw = docs.filter(col("source").isin(weights.keys.toSeq: _*))
      .select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("long").as("n"),
        Sampling.hashDraw(col("doc_id")).as("draw"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3)))
    val expected = raw.groupBy(_._2).flatMap { case (src, rows) =>
      val t = rows.map(_._3).sum
      val fe = math.min(budgets(src) / t, maxEpochs.toLong)
      val rem = budgets(src) - fe * t
      val full = for { r <- rows.toSeq; e <- 0L until fe } yield (r._1, src, r._3, e)
      val partial = if (fe < maxEpochs) {
        var cum = 0L
        rows.toSeq.sortBy(r => (r._4, r._1)).flatMap { r =>
          cum += r._3
          if (cum <= rem) Some((r._1, src, r._3, fe)) else None
        }
      } else Seq.empty
      full ++ partial
    }.toSet
    assert(out.toSet == expected,
      "epoch mixture must be full passes plus the draw-ordered remainder prefix")
    // every source stays within budget across all passes
    out.groupBy(_._2).foreach { case (src, rows) =>
      assert(rows.map(_._3).sum <= budgets(src), s"$src over budget")
    }
  }

  test("connected components converges on a high-diameter path within the round budget") {
    import spark.implicits._
    // A 120-node chain: plain O(diameter) propagation would need 119
    // rounds — far over maxRounds — so only the pointer-jumping form
    // labels the far end correctly.
    val n = 120
    val edges = (0L until (n - 1).toLong).map(i => (i, i + 1)).toDF("a", "b")
    val labels = Dedup.connectedComponents(edges, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels.size == n)
    assert(labels.values.forall(_ == 0L), "every chain node must reach label 0")
  }

  test("connected components fails fast when the round budget exhausts mid-convergence") {
    import spark.implicits._
    // One round can't label a 120-node chain; partially-converged labels
    // must raise, never silently feed the survivor-drop stage.
    val edges = (0L until 119L).map(i => (i, i + 1)).toDF("a", "b")
    val err = intercept[IllegalArgumentException] {
      Dedup.connectedComponents(edges, "a", "b", maxRounds = 1)
    }
    assert(err.getMessage.contains("did not converge"))
  }

  test("connected components equals a reference union-find on random graphs") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    for (_ <- 0 until 8) {
      val n = 2 + rnd.nextInt(40)
      val nEdges = rnd.nextInt(60)
      val edges = Seq.fill(nEdges)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      if (edges.nonEmpty) {
        // reference: plain union-find over the same edges
        val parent = scala.collection.mutable.Map[Long, Long]()
        def find(x: Long): Long = {
          val p = parent.getOrElseUpdate(x, x)
          if (p == x) x else { val r = find(p); parent(x) = r; r }
        }
        edges.foreach { case (a, b) =>
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
        // canonical label = min id in component
        val byRoot = nodes.groupBy(find)
        val expected = byRoot.flatMap { case (_, ms) => ms.map(_ -> ms.min) }.toMap
        val got = Dedup.connectedComponents(edges.toDF("a", "b"), "a", "b")
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(got == expected, s"n=$n edges=$edges")
      }
    }
  }

  test("dup clusters: members connected, label is min id, sizes consistent") {
    val docs = Tables.documents(spark, sf)
    val pairs = Dedup.minhashDupPairs(docs).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")))
    val clusters = Dedup.dupClusters(docs).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("cluster_id"), r.getAs[Long]("cluster_size")))
    val label = clusters.map(c => c._1 -> c._2).toMap
    // every paired doc appears, pair members share a cluster
    pairs.foreach { case (a, b) => assert(label(a) == label(b)) }
    // label is the min member id, size matches the member count
    clusters.groupBy(_._2).foreach { case (cid, members) =>
      assert(members.map(_._1).min == cid)
      members.foreach(m => assert(m._3 == members.length.toLong))
    }
    assert(clusters.map(_._1).distinct.length == clusters.length)
  }

  test("clean corpus composes language, quality, and dedup gates") {
    import org.apache.spark.sql.functions.col
    val docs = Tables.documents(spark, sf)
    val out = TextAnalysis.cleanCorpus(docs).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[String]("pred_lang") == "en")
      assert(r.getAs[Double]("quality") >= 0.55)
    }
    val losers = Dedup.dupClusters(docs)
      .filter(col("doc_id") =!= col("cluster_id"))
      .collect().map(_.getAs[Long]("doc_id")).toSet
    out.foreach(r => assert(!losers.contains(r.getAs[Long]("doc_id")),
      "a near-dup cluster loser survived the pipeline"))
    // the pipeline actually filters something at each gate
    assert(out.length < docs.count())
  }
}
