package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.EventStream
import graft.streaming.EventStream.Event
import java.sql.Timestamp

class StreamingSpec extends SparkSpec {

  private def ts(minute: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 00:$minute%02d:00")
    .ensuring(_ => minute < 60)
  private def tsAt(hour: Int, minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 $hour%02d:$minute%02d:00")

  test("streaming tumbling counts equal the batch aggregation") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[Event]
    val events = Seq(
      Event(1, tsAt(0, 5), 1, "click", 1.0, "{}"),
      Event(2, tsAt(0, 40), 1, "click", 2.0, "{}"),
      Event(3, tsAt(1, 10), 2, "view", 3.0, "{}"),
      Event(4, tsAt(5, 0), 1, "view", 4.0, "{}")) // advances watermark past hours 0-1
    mem.addData(events: _*)
    val q = EventStream.tumblingHourly(mem.toDF())
      .writeStream.format("memory").queryName("tumbling").outputMode("append").start()
    q.processAllAvailable()
    mem.addData(Event(5, tsAt(9, 0), 3, "view", 0.0, "{}")) // push watermark, close hr 5
    q.processAllAvailable()
    q.stop()
    val got = spark.table("tumbling")
      .select("window_start", "event_type", "n_events", "sum_value").collect()
      .map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    assert(got.contains(("2024-01-01 00:00:00.0", "click", 2L, 3.0)))
    assert(got.contains(("2024-01-01 01:00:00.0", "view", 1L, 3.0)))
    assert(got.contains(("2024-01-01 05:00:00.0", "view", 1L, 4.0)))
  }

  test("restart from checkpoint resumes stateful aggregation without data loss") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    val (ckpt, out) = (s"$base/ckpt", s"$base/out")
    val mem = MemoryStream[Event]
    mem.addData(
      Event(1, tsAt(0, 5), 1, "click", 1.0, "{}"),
      Event(2, tsAt(0, 20), 1, "click", 2.0, "{}"))
    // file sink: the one that actually supports checkpoint recovery
    val q1 = EventStream.tumblingHourly(mem.toDF())
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ckpt).outputMode("append").start()
    q1.processAllAvailable()
    q1.stop() // hour-0 window still open in STATE, not yet emitted
    // Restart against the SAME checkpoint + source: state (the partially
    // aggregated hour-0 window) must survive the stop and close correctly
    // when the watermark finally passes it — the mid-failure recovery path
    // every long-running job exercises.
    mem.addData(
      Event(3, tsAt(0, 40), 1, "click", 4.0, "{}"), // same window, post-restart
      Event(4, tsAt(5, 0), 2, "view", 0.0, "{}"))   // watermark pusher
    val q2 = EventStream.tumblingHourly(mem.toDF())
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ckpt).outputMode("append").start()
    q2.processAllAvailable()
    q2.stop()
    val got = spark.read.parquet(out).collect()
      .map(r => (r.getAs[Timestamp]("window_start").toString, r.getAs[String]("event_type"),
        r.getAs[Long]("n_events"), r.getAs[Double]("sum_value"))).toSet
    // all three hour-0 clicks in ONE closed window: two from before the
    // restart (recovered from state), one appended after
    assert(got.contains(("2024-01-01 00:00:00.0", "click", 3L, 7.0)), got.toString)
  }

  test("stateful sessionization closes sessions on gap and emits totals") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[Event]
    mem.addData(
      Event(1, tsAt(0, 0), 7, "click", 1.0, "{}"),
      Event(2, tsAt(0, 10), 7, "click", 2.0, "{}"),
      Event(3, tsAt(2, 0), 7, "click", 5.0, "{}"), // > 30min gap: closes session 1
      Event(4, tsAt(8, 0), 9, "view", 1.0, "{}"))  // watermark pusher
    val q = EventStream.sessionize(mem.toDS())
      .writeStream.format("memory").queryName("sessions").outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("sessions").collect()
    val s1 = rows.find(r => r.getAs[Long]("user_id") == 7L).get
    assert(s1.getAs[Long]("n_events") == 2L)
    assert(s1.getAs[Double]("sum_value") == 3.0)
    assert(s1.getAs[Timestamp]("session_start") == tsAt(0, 0))
    assert(s1.getAs[Timestamp]("session_end") == tsAt(0, 10))
  }

  test("sessionization state runs on the RocksDB state store (the at-scale provider)") {
    // Default provider keeps all state on-heap: state size is bounded by
    // executor memory. RocksDB spills state to local disk — the provider a
    // 100-TB deployment runs with (millions of open sessions per
    // executor). Same query, same results; only the state backend changes.
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[Event]
      mem.addData(
        Event(1, tsAt(0, 0), 7, "click", 1.0, "{}"),
        Event(2, tsAt(0, 10), 7, "click", 2.0, "{}"),
        Event(3, tsAt(2, 0), 7, "click", 5.0, "{}"),
        Event(4, tsAt(8, 0), 9, "view", 1.0, "{}"))
      val q = EventStream.sessionize(mem.toDS())
        .writeStream.format("memory").queryName("sessions_rocks").outputMode("append").start()
      q.processAllAvailable()
      q.stop()
      val s1 = spark.table("sessions_rocks").collect()
        .find(r => r.getAs[Long]("user_id") == 7L).get
      assert(s1.getAs[Long]("n_events") == 2L && s1.getAs[Double]("sum_value") == 3.0)
      assert(s1.getAs[Timestamp]("session_start") == tsAt(0, 0) &&
        s1.getAs[Timestamp]("session_end") == tsAt(0, 10))
    } finally {
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("streaming dedup drops redelivered event ids within the watermark") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[Event]
    mem.addData(
      Event(1, tsAt(0, 0), 1, "click", 1.0, "{}"),
      Event(1, tsAt(0, 5), 1, "click", 1.0, "{}"), // redelivery of id 1
      Event(2, tsAt(0, 10), 1, "view", 2.0, "{}"))
    val q = EventStream.dedupEvents(mem.toDF())
      .writeStream.format("memory").queryName("deduped").outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    val ids = spark.table("deduped").select("event_id").collect().map(_.getLong(0)).sorted
    assert(ids.sameElements(Array(1L, 2L)))
  }

  test("streaming curation: PII redaction and decontamination run stateless on a doc stream") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Long, String)]
    mem.addData(
      1L -> "write to team.lead@corp.example.com about alpha beta gamma delta",
      2L -> "alpha beta gamma delta epsilon plus more words here",
      3L -> "completely unrelated content with no markers at all")
    val bench = Seq(100L -> "alpha beta gamma delta epsilon").toDF("doc_id", "text")
    val docs = mem.toDF().toDF("doc_id", "text")
    val q1 = EventStream.redactPiiStream(docs)
      .writeStream.format("memory").queryName("pii_stream").outputMode("append").start()
    val q2 = EventStream.decontaminateStream(docs, bench)
      .writeStream.format("memory").queryName("decontam_stream").outputMode("append").start()
    q1.processAllAvailable(); q2.processAllAvailable()
    q1.stop(); q2.stop()
    val pii = spark.table("pii_stream").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("redacted")).toMap
    assert(pii(1L) == "write to [EMAIL] about alpha beta gamma delta")
    assert(pii(3L) == "completely unrelated content with no markers at all")
    // docs 1 and 2 share a benchmark 4-gram; only doc 3 survives — and the
    // stream result equals the batch operator on the same rows.
    val survivors = spark.table("decontam_stream").select("doc_id").collect()
      .map(_.getLong(0)).sorted
    assert(survivors.sameElements(Array(3L)))
    val batch = graft.ops.Curation.decontaminate(
      Seq(1L -> "write to team.lead@corp.example.com about alpha beta gamma delta",
        2L -> "alpha beta gamma delta epsilon plus more words here",
        3L -> "completely unrelated content with no markers at all").toDF("doc_id", "text"),
      bench).select("doc_id").collect().map(_.getLong(0)).sorted
    assert(batch.sameElements(survivors))
  }

  test("streaming semantic decontam: literal-benchmark signals equal the batch operator bit-for-bit") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val rows = Seq(
      10L -> Seq(4f, 0f, 0f),   // exact benchmark direction — flags vs bench 0
      11L -> Seq(2f, 2f, 0f),   // exact two-way tie — evidence must be bench 0
      12L -> Seq(1f, 8f, 0f),   // closer to bench 1
      13L -> Seq(0f, 0f, 1f))   // orthogonal — survives
    val bench = Seq(0L -> Array(1f, 0f, 0f), 1L -> Array(0f, 1f, 0f))
    val mem = MemoryStream[(Long, Seq[Float])]
    mem.addData(rows: _*)
    val q = EventStream.semanticDecontamStream(
        mem.toDF().toDF("vec_id", "embedding"), bench, 0.5)
      .writeStream.format("memory").queryName("sem_decontam").outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("sem_decontam").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1).toList
    val batch = graft.ops.Similarity.semanticDecontam(
        rows.toDF("vec_id", "embedding"),
        bench.map { case (i, v) => (i, v.toSeq) }.toDF("vec_id", "embedding"), 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toList
    assert(streamed == batch, s"stream $streamed vs batch $batch")
    assert(streamed.map(t => (t._1, t._2)) == List((10L, 0L), (11L, 0L), (12L, 1L)))
  }

  test("streaming quality gates: Gopher rules and LM scores equal batch bit-for-bit") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    // rows exercising each rule: one clean passing doc, one too short,
    // one symbol-heavy, one with the LM's vocabulary
    val fill = (1 to 60).map(i => s"word$i").mkString(" ")
    val rows = Seq(
      (1L, s"the quick fox and the lazy dog $fill", "en", "s0"),
      (2L, "too short", "en", "s0"),
      (3L, s"the # ... # ... # ... and $fill # ... #", "en", "s1"),
      (4L, "a b a b c the and", "en", "s1"))
    val mem = MemoryStream[(Long, String, String, String)]
    mem.addData(rows: _*)
    val docs = mem.toDF().toDF("doc_id", "text", "lang", "source")

    val g = EventStream.gopherGateStream(docs)
      .writeStream.format("memory").queryName("gopher_stream").outputMode("append").start()
    // LM model trained offline on a static slice, persisted, stream-served
    val dir = java.nio.file.Files.createTempDirectory("graft-lm-stream").toString + "/idx"
    graft.text.NgramLm.buildAt(spark,
      rows.toDF("doc_id", "text", "lang", "source"), dir, vocabSize = 4, maxBigrams = 8)
    val l = EventStream.lmScoreStream(spark, docs, dir)
      .writeStream.format("memory").queryName("lm_stream").outputMode("append").start()
    g.processAllAvailable(); l.processAllAvailable()
    g.stop(); l.stop()

    val batchDocs = rows.toDF("doc_id", "text", "lang", "source")
    def img(r: org.apache.spark.sql.Row, cols: Seq[String]) = cols.map(c => r.getAs[Any](c))
    val gCols = Seq("doc_id", "n_words", "sum_word_chars", "n_sym", "n_alpha", "n_stop",
      "r_wordcount", "r_wordlen", "r_symbol", "r_alpha", "r_stop", "pass")
    val gGot = spark.table("gopher_stream").collect()
      .map(img(_, gCols)).sortBy(_.head.asInstanceOf[Long].toString)
    val gWant = graft.ops.TextAnalysis.gopherGate(batchDocs).collect()
      .map(img(_, gCols)).sortBy(_.head.asInstanceOf[Long].toString)
    assert(gGot.toSeq == gWant.toSeq, "stream gate must equal the batch gate row-for-row")
    assert(gGot.map(_.last).count(_ == true) == 1,
      "only doc 1 passes — 2/4 fail word count, 3 fails the symbol rule")

    val lCols = Seq("doc_id", "n_tokens", "n_scored", "n_hits", "sum_ppm", "fit_ppm")
    val lGot = spark.table("lm_stream").collect()
      .map(img(_, lCols)).sortBy(_.head.asInstanceOf[Long].toString)
    val lWant = graft.text.NgramLm.scoreDocsFrom(spark, batchDocs, dir).collect()
      .map(img(_, lCols)).sortBy(_.head.asInstanceOf[Long].toString)
    assert(lGot.toSeq == lWant.toSeq, "stream LM scores must equal batch scores")
    assert(lGot.exists(r => r(3).asInstanceOf[Long] > 0L), "some bigram hits must occur")
  }

  test("streaming domain routing equals the batch classifier bit-for-bit") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val train = Seq(
      (1L, "alpha alpha alpha shared", "sA"),
      (2L, "beta beta beta shared", "sB"),
      (3L, "gamma gamma gamma shared", "sC")).toDF("doc_id", "text", "source")
    val model = graft.ops.TextAnalysis.trainDomainClassifier(train, vocabSize = 64)
    val rows = Seq(
      (10L, "alpha alpha words", "sA"),
      (11L, "beta words beta", "sB"),
      (12L, "shared shared shared", "sC")) // all-shared: tie → sA, margin 0
    val mem = MemoryStream[(Long, String, String)]
    mem.addData(rows: _*)
    val q = EventStream.domainRouteStream(
        mem.toDF().toDF("doc_id", "text", "source"), model)
      .writeStream.format("memory").queryName("domain_stream").outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("domain_stream").collect()
      .map(r => (r.getLong(0), r.getString(2), r.getLong(3))).sortBy(_._1)
    val want = graft.ops.TextAnalysis.classifyDomains(
        rows.toDF("doc_id", "text", "source"), model).collect()
      .map(r => (r.getLong(0), r.getString(2), r.getLong(3))).sortBy(_._1)
    assert(got.toSeq == want.toSeq, "stream routes must equal the batch classifier")
    assert(got.toSeq.map(t => t._1 -> t._2) ==
      Seq(10L -> "sA", 11L -> "sB", 12L -> "sA"))
    assert(got.last._3 == 0L, "the all-shared doc ties with margin 0")
  }

  test("streaming C4 line cleaning equals the batch surgery bit-for-bit") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val good = "one two three words here."
    val rows = Seq(
      (1L, Seq(good, "no punctuation line", "two words.",
        "enable javascript now please.", good, good, good, good).mkString("\n")),
      (2L, (Seq.fill(6)(good) :+ "lorem ipsum dolor.").mkString("\n")),
      (3L, (Seq.fill(6)(good) :+ "code { x }.").mkString("\n")),
      (4L, Seq(good, good).mkString("\n")))
    val mem = MemoryStream[(Long, String)]
    mem.addData(rows: _*)
    val q = EventStream.c4CleanStream(mem.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("c4_stream").outputMode("append").start()
    q.processAllAvailable(); q.stop()
    def img(df: org.apache.spark.sql.DataFrame) = df
      .select("doc_id", "n_lines", "n_kept", "verdict", "clean_text").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3),
        Option(r.getString(4)))).sortBy(_._1)
    val got = img(spark.table("c4_stream"))
    val want = img(graft.ops.Curation.c4LineClean(rows.toDF("doc_id", "text")))
    assert(got.toSeq == want.toSeq, "stream surgery must equal the batch operator")
    assert(got.map(_._4).toSeq == Seq("kept", "lorem_ipsum", "brace", "too_short"))
  }

  test("composed curation ingest: C4 -> Gopher -> LM -> LSH dedup mid-stream equals the sequential composition") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.DataFrame
    val base = java.nio.file.Files.createTempDirectory("graft-curing").toString
    // good in-vocab lines: terminal punctuation, >=3 words, two distinct
    // stopwords somewhere in the doc, in the LM's vocabulary
    def goodLine(i: Int) = s"the quick fox and the lazy dog run$i."
    def doc(id: Long, lines: Seq[String]) = (id, lines.mkString("\n"), "en", "s0")
    val docLines: Map[Long, Seq[String]] = Map(
      1L -> (0 until 6).map(i => s"the small cat and the tall bird fly$i."),
      4L -> (0 until 6).map(i => s"the zzq$i qqz$i and wwx$i vvy$i."), // OOV page
      5L -> (0 until 6).map(goodLine),
      6L -> (0 until 6).map(i => s"the round fish and the flat crab swim$i."))
    // the offline reference slice covers every surviving page's vocabulary
    // (the CCNet posture: the LM models the wanted distribution)
    val reference = Seq(1L, 5L, 6L).zipWithIndex.map { case (id, i) =>
      (900L + i, docLines(id).map(_.stripSuffix(".")).mkString(" "), "en", "s0")
    }.toDF("doc_id", "text", "lang", "source")
    val lmDir = base + "/lm"
    graft.text.NgramLm.buildAt(spark, reference, lmDir, vocabSize = 40, maxBigrams = 200)
    def cleanedOf(lines: Seq[String]): String =
      graft.ops.Curation.c4LineClean(Seq((0L, lines.mkString("\n"))).toDF("doc_id", "text"))
        .head.getAs[String]("clean_text")
    // the resident dedup index holds the CLEANED form of doc 5's page
    val residentDocs = Seq((500L, cleanedOf(docLines(5L)))).toDF("doc_id", "text")
    val streamIdx = base + "/stream-idx"
    val twinIdx = base + "/twin-idx"
    graft.text.LshIndex.build(spark, residentDocs, streamIdx)
    graft.text.LshIndex.build(spark, residentDocs, twinIdx)
    // LM ceiling between the ACTUAL cleaned pages' scores, batch-side
    val probe = docLines.toSeq.map { case (id, lines) =>
      (id, cleanedOf(lines), "en", "s0") }.toDF("doc_id", "text", "lang", "source")
    val sc = graft.text.NgramLm.scoreDocsFrom(spark, probe, lmDir)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("fit_ppm")).toMap
    val inVocabMin = Seq(1L, 5L, 6L).map(sc).min
    val minFitPpm = (inVocabMin + sc(4L)) / 2
    assert(inVocabMin > minFitPpm && sc(4L) < minFitPpm,
      s"fixture needs in-vocab pages above the fit floor and the OOV page below it: $sc")

    val b1 = Seq(
      doc(1L, docLines(1L)), //                                           survives all → ingested
      doc(2L, "lorem ipsum dolor sit amet." +: (0 until 5).map(goodLine)), // c4: lorem_ipsum
      doc(3L, (0 until 6).map(i => s"cat$i dog$i fox$i bird$i cow$i.")), //   gopher: no stopwords
      doc(4L, docLines(4L)), //                                              lm: over the ceiling
      doc(5L, docLines(5L)), //                                              dedup: resident re-offer
      doc(6L, docLines(6L)),
      doc(7L, docLines(6L))) //                                              batch twin of 6
    val b2 = Seq(doc(8L, docLines(1L))) // re-offer of a batch-1 survivor
    val verdictLog = base + "/verdicts"
    val mem = MemoryStream[(Long, String, String, String)]
    val q = EventStream.curatedCorpusIngest(
      mem.toDF().toDF("doc_id", "text", "lang", "source"),
      lmDir, streamIdx, verdictLog, base + "/ckpt", minFitPpm, minWords = 5L)
    mem.addData(b1: _*); q.processAllAvailable()
    mem.addData(b2: _*); q.processAllAvailable()
    q.stop()

    // the sequential composition against the twin index, batch by batch
    def runStages(rows: Seq[(Long, String, String, String)]): Map[Long, (String, String)] = {
      val batch = rows.toDF("doc_id", "text", "lang", "source")
      val c4 = graft.ops.Curation.c4LineSignals(batch)
      val cleaned = c4.filter(col("verdict") === "kept")
        .select(col("doc_id"), col("clean_text").as("text"), col("lang"), col("source"))
      val gFail = graft.ops.TextAnalysis.gopherSignals(cleaned, minWords = 5L)
        .filter(!col("pass")).select("doc_id").collect().map(_.getLong(0)).toSet
      val afterG = cleaned.filter(!col("doc_id").isInCollection(gFail.toSeq :+ -1L))
      val lmFail = graft.text.NgramLm.scoreDocsFrom(spark, afterG, lmDir)
        .filter(col("fit_ppm") < minFitPpm).select("doc_id").collect().map(_.getLong(0)).toSet
      val survivors = afterG.filter(!col("doc_id").isInCollection(lmFail.toSeq :+ -1L))
      val dedup = graft.text.LshIndex.ingestBatch(spark, twinIdx,
          survivors.select(col("doc_id"), col("text")))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      val c4v = c4.select("doc_id", "verdict").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      rows.map { case (id, _, _, _) =>
        id -> (if (c4v(id) != "kept") ("c4", c4v(id))
          else if (gFail(id)) ("gopher", "gopher_fail")
          else if (lmFail(id)) ("lm", "lm_tail")
          else ("dedup", dedup(id)))
      }.toMap
    }
    val want = runStages(b1) ++ runStages(b2)
    val got = spark.read.parquet(verdictLog).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("stage"), r.getAs[String]("verdict"))).toMap
    assert(got == want, s"streamed composition must equal the sequential one:\n got=$got\nwant=$want")
    // every stage fires at least once, in the designed places
    assert(got(1L) == ("dedup", "ingested"))
    assert(got(2L) == ("c4", "lorem_ipsum"))
    assert(got(3L) == ("gopher", "gopher_fail"))
    assert(got(4L) == ("lm", "lm_tail"))
    assert(got(5L)._2 == "exact_dup", s"the resident re-offer must die in the dedup gate: ${got(5L)}")
    assert(got(7L)._2 == "batch_dup")
    assert(got(8L)._2 == "exact_dup", "a batch-1 survivor must veto its batch-2 re-offer mid-stream")
  }

  test("streaming LM scoring serves an over-threshold model via the static broadcast") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val base = graft.text.NgramLm.train(
      Seq((1L, "a b a b c", "en", "s0"), (2L, "b a b b", "en", "s0"))
        .toDF("doc_id", "text", "lang", "source"), vocabSize = 2, maxBigrams = 2)
    val syn = (0 until 3000).map(i => (f"zq$i%04d zr$i%04d", (i % 31 + 1).toLong)).toArray
    val big = base.copy(bigrams = base.bigrams ++ syn)
    assert(big.unigrams.length + big.bigrams.length > graft.text.NgramLm.LiteralMapMaxEntries)
    val dir = java.nio.file.Files.createTempDirectory("graft-lm-stream-big").toString + "/idx"
    graft.text.NgramLm.save(spark, big, dir)
    val mem = MemoryStream[(Long, String, String, String)]
    mem.addData((10L, "a b c a q b b", "zz", "s1"), (11L, "b a b", "zz", "s1"))
    val docs = mem.toDF().toDF("doc_id", "text", "lang", "source")
    val q = EventStream.lmScoreStream(spark, docs, dir)
      .writeStream.format("memory").queryName("lm_stream_big").outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("lm_stream_big").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_hits"), r.getAs[Long]("sum_ppm")))
      .sortBy(_._1)
    // the doc-10 hand computation from NgramLmSpec holds through the
    // stream + broadcast path too
    assert(got.head == ((10L, 1L, 1577777L)))
    val want = graft.text.NgramLm.scoreDocsFrom(spark,
      Seq((10L, "a b c a q b b", "zz", "s1"), (11L, "b a b", "zz", "s1"))
        .toDF("doc_id", "text", "lang", "source"), dir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_hits"), r.getAs[Long]("sum_ppm")))
      .sortBy(_._1)
    assert(got.toSeq == want.toSeq)
  }

  test("SQL registration exposes the native vector functions to spark.sql") {
    graft.functions.GraftFunctions.register(spark)
    Tables.embeddings(spark, sf).createOrReplaceTempView("emb_sql")
    val viaSql = spark.sql(
      """SELECT vec_l2sq(a.embedding, b.embedding) AS d
        |FROM emb_sql a JOIN emb_sql b ON b.vec_id = 0 WHERE a.vec_id = 7""".stripMargin)
      .head.getDouble(0)
    import org.apache.spark.sql.functions._
    val emb = Tables.embeddings(spark, sf)
    val viaApi = graft.ops.Similarity.knnL2(emb, 0L, 1000000).collect()
      .find(_.getAs[Long]("vec_id") == 7L).get.getAs[Double]("dist_sq")
    assert(viaSql == viaApi)
    val dim = spark.sql("SELECT size(feature_hash_embed('a b c', 64)) AS n").head.getInt(0)
    assert(dim == 64)
  }

  test("stream-stream interval join attributes purchases to in-window clicks only") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val clicks = MemoryStream[Event]
    val purchases = MemoryStream[Event]
    clicks.addData(
      Event(101, tsAt(0, 0), 1, "click", 0.0, "{}"),  // in window of purchase @0:30
      Event(102, tsAt(0, 25), 1, "click", 0.0, "{}"), // in window
      Event(103, tsAt(2, 0), 1, "click", 0.0, "{}"),  // AFTER the purchase: no match
      Event(104, tsAt(0, 20), 2, "click", 0.0, "{}")) // other user: no match for user 1
    purchases.addData(
      Event(201, tsAt(0, 30), 1, "purchase", 9.99, "{}"),
      Event(202, tsAt(3, 0), 2, "purchase", 5.00, "{}")) // user 2: click @0:20 outside 60min
    val q = EventStream.attributionJoin(clicks.toDF(), purchases.toDF())
      .writeStream.format("memory").queryName("attrib").outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("attrib").collect()
      .map(r => (r.getAs[Long]("purchase_id"), r.getAs[Long]("click_id"))).toSet
    assert(got == Set((201L, 101L), (201L, 102L)),
      s"expected purchase 201 matched to clicks 101,102 only; got $got")
  }

  test("left-outer stream-stream join emits unmatched purchases after watermark expiry") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val clicks = MemoryStream[Event]
    val purchases = MemoryStream[Event]
    clicks.addData(Event(101, tsAt(0, 10), 1, "click", 0.0, "{}"))
    purchases.addData(
      Event(201, tsAt(0, 30), 1, "purchase", 9.99, "{}"),  // matched
      Event(202, tsAt(0, 40), 2, "purchase", 5.00, "{}"))  // no click: outer row
    val q = EventStream.attributionJoin(clicks.toDF(), purchases.toDF(), joinType = "left_outer")
      .writeStream.format("memory").queryName("attrib_outer").outputMode("append").start()
    q.processAllAvailable()
    // Advance BOTH watermarks far past the join window so state for the
    // unmatched purchase expires and the null-click row can emit.
    clicks.addData(Event(109, tsAt(9, 0), 9, "click", 0.0, "{}"))
    purchases.addData(Event(209, tsAt(9, 0), 9, "purchase", 1.0, "{}"))
    q.processAllAvailable()
    // One more batch so the new watermark is applied to stored state.
    clicks.addData(Event(110, tsAt(10, 0), 9, "click", 0.0, "{}"))
    purchases.addData(Event(210, tsAt(10, 0), 9, "purchase", 1.0, "{}"))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("attrib_outer").collect()
      .map(r => (r.getAs[Long]("purchase_id"), Option(r.getAs[Any]("click_id")))).toSet
    assert(rows.contains((201L, Some(101L))), s"matched purchase missing: $rows")
    assert(rows.contains((202L, None)), s"unmatched purchase should emit null click: $rows")
  }

  test("streaming sliding windows close like the batch twin once the watermark passes") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[Event]
    val events = Seq(
      Event(1, tsAt(0, 5), 1, "click", 1.0, "{}"),
      Event(2, tsAt(0, 50), 1, "click", 2.0, "{}"),
      Event(3, tsAt(1, 10), 2, "view", 3.0, "{}"))
    mem.addData(events: _*)
    val q = EventStream.slidingQuarterHourly(mem.toDF())
      .writeStream.format("memory").queryName("sliding").outputMode("append").start()
    q.processAllAvailable()
    mem.addData(Event(9, tsAt(9, 0), 9, "view", 0.0, "{}")) // watermark pusher
    q.processAllAvailable()
    q.stop()
    val got = spark.table("sliding").collect()
      .map(r => (r.getAs[Timestamp]("window_start").toString, r.getAs[String]("event_type"),
        r.getAs[Long]("n_events"), r.getAs[Double]("sum_value"))).toSet
    // batch twin over the same rows (the closed subset)
    val batch = graft.ops.Events.slidingQuarterHourly(events.toDF()).collect()
      .map(r => (r.getAs[String]("window_start") + ".0", r.getAs[String]("event_type"),
        r.getAs[Long]("n_events"), r.getAs[Double]("sum_value"))).toSet
    assert(batch.subsetOf(got), s"missing windows: ${batch.diff(got)}")
    // each event appears in exactly 4 sliding windows
    assert(got.count(_._2 == "click") >= 4)
  }

  test("streaming IVF-PQ ingest lands vectors quantized and ADC-searchable") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("graft-sivfpq").toString + "/idx"
    val ckpt = java.nio.file.Files.createTempDirectory("graft-sivfpq-ck").toString
    val emb = Tables.embeddings(spark, sf)
    graft.vector.IvfPqIndex.build(spark, emb.filter(col("vec_id") < 400), dir)
    val late = emb.filter(col("vec_id") >= 400)
      .collect().map(r => (r.getAs[Long]("vec_id"), r.getAs[Int]("label"),
        r.getSeq[Float](r.fieldIndex("embedding"))))
    val mem = MemoryStream[(Long, Int, Seq[Float])]
    mem.addData(late.toSeq: _*)
    val q = EventStream.ivfPqIngest(
      mem.toDF().toDF("vec_id", "label", "embedding")
        .select(col("vec_id"), col("label"), col("embedding").cast("array<float>")), dir, ckpt)
    q.processAllAvailable(); q.stop()
    assert(spark.read.parquet(s"$dir/vectors").count() == emb.count())
    // a streamed vector surfaces through the quantized candidate stage +
    // exact re-rank at distance 0
    val (vid, _, qv) = late.head
    val hit = graft.vector.IvfPqIndex.search(spark, dir, qv, k = 1, nProbe = 8,
      refineFactor = 8).collect().head
    assert(hit.getAs[Long]("vec_id") == vid)
    assert(hit.getAs[Double]("dist_sq") == 0.0)
  }

  test("streaming IVF ingest lands vectors in probe-searchable cell partitions") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("graft-sivf").toString + "/ivf"
    val ckpt = java.nio.file.Files.createTempDirectory("graft-sivf-ck").toString
    val emb = Tables.embeddings(spark, sf)
    // Resident corpus: vec_id < 400. The rest arrives as a stream.
    graft.vector.IvfIndex.build(spark, emb.filter(col("vec_id") < 400), dir, kmeansIters = 0)
    case class VecRow(vec_id: Long, label: Int, embedding: Seq[Float])
    val late = emb.filter(col("vec_id") >= 400)
      .collect().map(r => VecRow(r.getAs[Long]("vec_id"), r.getAs[Int]("label"),
        r.getSeq[Float](r.fieldIndex("embedding"))))
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Int, Seq[Float])]
    mem.addData(late.map(v => (v.vec_id, v.label, v.embedding)).toSeq: _*)
    val q = EventStream.ivfIngest(
      mem.toDF().toDF("vec_id", "label", "embedding"), dir, ckpt)
    q.processAllAvailable(); q.stop()
    // A streamed vector must now be findable by the probe-pruned search at
    // distance 0 (its own cell is by construction its nearest).
    val target = late.head
    val hit = graft.vector.IvfIndex.search(spark, dir, target.embedding, k = 1, nProbe = 1)
      .collect().head
    assert(hit.getAs[Long]("vec_id") == target.vec_id)
    assert(hit.getAs[Double]("dist_sq") == 0.0)
    // And the resident corpus is untouched: total rows = 500.
    assert(spark.read.parquet(s"$dir/vectors").count() == emb.count())
  }

  test("streaming index ingest appends partitions and applies retention") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-stream-idx").toString
    val cp = java.nio.file.Files.createTempDirectory("graft-stream-cp").toString
    case class Vec(vec_id: Long, embedding: Seq[Float], data_type: String,
        data_json: String, ingest_date: java.sql.Date)
    val mem = MemoryStream[(Long, Int)] // (vec_id, day offset)
    val stream = mem.toDF()
      .select(col("_1").as("vec_id"),
        array(lit(0.1f), lit(0.2f)).as("embedding"),
        lit("t").as("data_type"), lit("{}").as("data_json"),
        date_add(lit(java.sql.Date.valueOf("2024-01-01")), col("_2")).as("ingest_date"))
    val q = EventStream.indexIngest(stream, dir, cp)
    mem.addData((1L, 0), (2L, 5), (3L, 9)) // day 0 falls outside 7-day window of day 9
    q.processAllAvailable()
    q.stop()
    val days = spark.read.parquet(dir).select("ingest_date").distinct().collect()
      .map(_.getDate(0).toString).sorted
    assert(days.sameElements(Array("2024-01-06", "2024-01-10")),
      s"retention should drop day 0, got ${days.mkString(",")}")
  }

  test("streaming corpus ingest dedups each micro-batch and grows the index mid-stream") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val base = java.nio.file.Files.createTempDirectory("graft-scorpus").toString
    val streamIdx = base + "/stream-idx"
    val twinIdx = base + "/twin-idx"
    val verdictLog = base + "/verdicts"
    val ckpt = base + "/ckpt"
    val docs = Tables.documents(spark, sf)
    val seed = docs.filter(col("doc_id") < 300).select("doc_id", "text")
    graft.text.LshIndex.build(spark, seed, streamIdx)
    graft.text.LshIndex.build(spark, seed, twinIdx)
    // Micro-batch 1: fresh docs plus verbatim re-offers of RESIDENT docs.
    val b1 = docs.filter(col("doc_id") >= 300 && col("doc_id") < 320).select("doc_id", "text")
      .unionByName(docs.filter(col("doc_id") < 20)
        .select((col("doc_id") + 6000000L).as("doc_id"), col("text")))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    // Micro-batch 2: fresh docs plus verbatim re-offers of BATCH 1 docs —
    // those dups are only catchable if batch 1's survivors became resident
    // before batch 2 ran.
    val b2 = docs.filter(col("doc_id") >= 320 && col("doc_id") < 340).select("doc_id", "text")
      .unionByName(docs.filter(col("doc_id") >= 300 && col("doc_id") < 310)
        .select((col("doc_id") + 7000000L).as("doc_id"), col("text")))
      .collect().map(r => (r.getLong(0), r.getString(1)))

    val mem = MemoryStream[(Long, String)]
    val q = EventStream.corpusIngest(
      mem.toDF().toDF("doc_id", "text"), streamIdx, verdictLog, ckpt)
    mem.addData(b1.toSeq: _*); q.processAllAvailable()
    mem.addData(b2.toSeq: _*); q.processAllAvailable()
    q.stop()

    // Sequential twin: the same two batches through the batch ingest loop
    // on an identical resident index must produce identical verdicts...
    val v1 = graft.text.LshIndex.ingestBatch(spark, twinIdx, b1.toSeq.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r.getString(1))
    val v2 = graft.text.LshIndex.ingestBatch(spark, twinIdx, b2.toSeq.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r.getString(1))
    val got = spark.read.parquet(verdictLog).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("verdict")).toMap
    assert(got == (v1 ++ v2).toMap, "streamed verdicts must equal the sequential ingest loop")
    // ...and per-batch attribution survives in the log.
    assert(spark.read.parquet(verdictLog).select("batch_id").distinct().count() == 2)

    // Mid-stream growth is observable: some batch-1 doc was ingested and
    // its batch-2 verbatim re-offer judged exact_dup against it.
    assert((300L until 310L).exists(id =>
      got(id) == "ingested" && got(id + 7000000L) == "exact_dup"),
      "a batch-2 re-offer of a batch-1 survivor must be an exact_dup")

    // The streamed index is row-identical to the sequential twin.
    val a = spark.read.parquet(s"$streamIdx/hashes").orderBy("doc_id").collect().toSeq
    val b = spark.read.parquet(s"$twinIdx/hashes").orderBy("doc_id").collect().toSeq
    assert(a == b, "streamed index must equal the sequential twin")
  }

  test("corpus ingest replay: skipReplayed makes a replayed micro-batch a no-op; default fails loud") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val base = java.nio.file.Files.createTempDirectory("graft-sreplay").toString
    val idx = base + "/idx"
    val verdictLog = base + "/verdicts"
    val docs = Tables.documents(spark, sf)
    val seed = docs.filter(col("doc_id") < 300).select("doc_id", "text")
    graft.text.LshIndex.build(spark, seed, idx)
    val b1 = docs.filter(col("doc_id") >= 300 && col("doc_id") < 310).select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq

    val mem = MemoryStream[(Long, String)]
    val q1 = EventStream.corpusIngest(mem.toDF().toDF("doc_id", "text"),
      idx, verdictLog, base + "/ckpt1", skipReplayed = true)
    mem.addData(b1: _*); q1.processAllAvailable(); q1.stop()
    val verdictsBefore = spark.read.parquet(verdictLog).orderBy("doc_id").collect().toSeq
    val hashesBefore = spark.read.parquet(s"$idx/hashes").count()

    // simulate an at-least-once redelivery: a FRESH checkpoint replays the
    // same source rows as batch 0, which the high-water mark already covers
    val mem2 = MemoryStream[(Long, String)]
    val q2 = EventStream.corpusIngest(mem2.toDF().toDF("doc_id", "text"),
      idx, verdictLog, base + "/ckpt2", skipReplayed = true)
    mem2.addData(b1: _*); q2.processAllAvailable(); q2.stop()
    assert(spark.read.parquet(verdictLog).orderBy("doc_id").collect().toSeq == verdictsBefore,
      "a replayed batch under skipReplayed must leave the verdict log untouched")
    assert(spark.read.parquet(s"$idx/hashes").count() == hashesBefore,
      "a replayed batch under skipReplayed must leave the index untouched")

    // control: WITHOUT the option the same replay trips the id gate loud
    val mem3 = MemoryStream[(Long, String)]
    val q3 = EventStream.corpusIngest(mem3.toDF().toDF("doc_id", "text"),
      idx, verdictLog, base + "/ckpt3")
    mem3.addData(b1: _*)
    val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q3.processAllAvailable()
    }
    q3.stop()
    assert(ex.getMessage.contains("disjoint") || ex.getMessage.contains("already"),
      s"default replay must fail loud on the id gate: ${ex.getMessage.take(300)}")
  }

  test("replay gates: skipReplayed no-ops a redelivered micro-batch on every ingest twin") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    import graft.multimodal.{Multimodal, PngCodec, WavCodec, AviCodec}
    val base = java.nio.file.Files.createTempDirectory("graft-sreplay-all").toString

    // Each twin: ingest one batch under skipReplayed, snapshot the durable
    // state, redeliver the SAME rows through a fresh checkpoint (replayed
    // as batch 0 — exactly the high-water mark), and assert the state is
    // untouched. The run(...) indirection is per-gate because MemoryStream
    // is typed.

    // -- vector gate --------------------------------------------------
    val emb = Tables.embeddings(spark, sf)
    val vIdx = base + "/vidx"; val vLog = base + "/vlog"
    graft.vector.IvfIndex.build(spark, emb.filter(col("vec_id") < 100), vIdx)
    val vb = emb.filter(col("vec_id") >= 100 && col("vec_id") < 120).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Int]("label"),
        r.getSeq[Float](r.fieldIndex("embedding")))).toSeq
    def runVec(ck: String): Unit = {
      val mem = MemoryStream[(Long, Int, Seq[Float])]
      val q = EventStream.vectorCorpusIngest(
        mem.toDF().toDF("vec_id", "label", "embedding"), vIdx, vLog,
        base + ck, skipReplayed = true)
      mem.addData(vb: _*); q.processAllAvailable(); q.stop()
    }
    runVec("/vck1")
    val vVerd = spark.read.parquet(vLog).orderBy("vec_id").collect().toSeq
    val vRows = spark.read.parquet(s"$vIdx/vectors").count()
    runVec("/vck2")
    assert(spark.read.parquet(vLog).orderBy("vec_id").collect().toSeq == vVerd,
      "vector gate: replayed batch must leave the verdict log untouched")
    assert(spark.read.parquet(s"$vIdx/vectors").count() == vRows,
      "vector gate: replayed batch must leave the index untouched")

    // -- media gates (image / audio / video share Hash64Index) --------
    def png(src: Long): Array[Byte] = PngCodec.encodeGray(
      Array.tabulate(1024) { p =>
        var h = src * 1000003L + p
        h ^= h >>> 33; h *= 0xff51afd7ed558ccdL; h ^= h >>> 33
        (h & 0xFF).toInt
      }, 32, 32)
    def wav(src: Long): Array[Byte] = WavCodec.encodePcm16(
      Array.tabulate(576) { i =>
        val h = (src * 2654435761L + i.toLong * 40503L) ^ (i.toLong * i * 97L)
        (((h % 4096L) + 4096L) % 4096L - 2048L).toInt
      }, 8000, 1)
    def avi(src: Long): Array[Byte] = AviCodec.encodeGray(
      Array.tabulate(18) { f =>
        Array.tabulate(144) { p =>
          var h = src * 6364136223846793005L + f * 1442695040888963407L + p
          h ^= h >>> 33; h *= 0xff51afd7ed558ccdL; h ^= h >>> 33
          (h & 0xFF).toInt
        }
      }, 12, 12)
    val mediaGates = Seq[(String, String, Long => Multimodal.MediaRow,
        (org.apache.spark.sql.DataFrame, String, String, String) =>
          org.apache.spark.sql.streaming.StreamingQuery)](
      ("img", "image", id => Multimodal.MediaRow(id, "image", png(id)),
        (df, idx, log, ck) => EventStream.mediaIngest(df, idx, log, ck, skipReplayed = true)),
      ("aud", "audio", id => Multimodal.MediaRow(id, "audio", wav(id)),
        (df, idx, log, ck) => EventStream.audioIngest(df, idx, log, ck, skipReplayed = true)),
      ("vid", "video", id => Multimodal.MediaRow(id, "video", avi(id)),
        (df, idx, log, ck) => EventStream.videoIngest(df, idx, log, ck, skipReplayed = true)))
    mediaGates.foreach { case (tag, _, row, start) =>
      val idx = s"$base/$tag-idx"; val log = s"$base/$tag-log"
      val resident = (0L until 8L).map(row)
      tag match {
        case "img" => graft.multimodal.PhashIndex.build(spark, resident.toDS(), idx)
        case "aud" => graft.multimodal.AudioHashIndex.build(spark, resident.toDS(), idx)
        case _ => graft.multimodal.VideoHashIndex.build(spark, resident.toDS(), idx)
      }
      val batch = (100L until 106L).map(row)
      def run(ck: String): Unit = {
        val mem = MemoryStream[(Long, String, Array[Byte])]
        val q = start(mem.toDF().toDF("doc_id", "media_type", "data"), idx, log, s"$base/$tag$ck")
        mem.addData(batch.map(m => (m.doc_id, m.media_type, m.data)): _*)
        q.processAllAvailable(); q.stop()
      }
      run("-ck1")
      val verd = spark.read.parquet(log).orderBy("doc_id").collect().toSeq
      val hashes = spark.read.parquet(s"$idx/hashes").count()
      run("-ck2")
      assert(spark.read.parquet(log).orderBy("doc_id").collect().toSeq == verd,
        s"$tag gate: replayed batch must leave the verdict log untouched")
      assert(spark.read.parquet(s"$idx/hashes").count() == hashes,
        s"$tag gate: replayed batch must leave the hash index untouched")
    }

    // -- inverted-index gate (batchlog sidecar) ------------------------
    val docs = Tables.documents(spark, sf)
    val iIdx = base + "/inv-idx"
    graft.text.InvertedIndex.build(spark, docs.filter(col("doc_id") < 50), iIdx, nBuckets = 8)
    val ib = docs.filter(col("doc_id") >= 50 && col("doc_id") < 70)
      .select("doc_id", "text", "source").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    def runInv(ck: String): Unit = {
      val mem = MemoryStream[(Long, String, String)]
      val q = EventStream.invertedIngest(
        mem.toDF().toDF("doc_id", "text", "source"), iIdx, base + ck, skipReplayed = true)
      mem.addData(ib: _*); q.processAllAvailable(); q.stop()
    }
    runInv("/ick1")
    val postings = spark.read.parquet(s"$iIdx/postings").count()
    val doclens = spark.read.parquet(s"$iIdx/doclens").count()
    runInv("/ick2")
    assert(spark.read.parquet(s"$iIdx/postings").count() == postings,
      "inverted gate: replayed batch must leave the postings untouched")
    assert(spark.read.parquet(s"$iIdx/doclens").count() == doclens,
      "inverted gate: replayed batch must leave the doclens untouched")
    assert(spark.read.parquet(s"$iIdx/batchlog").collect().map(_.getLong(0)).toSeq == Seq(0L),
      "inverted gate: exactly one batchlog row for the one real batch")

    // -- paragraph gate (output path as batch log) ---------------------
    val pIdx = base + "/par-idx"; val pOut = base + "/par-out"
    graft.text.ParagraphIndex.build(spark,
      Seq((1L, "alpha resident line.")).toDF("doc_id", "text"), pIdx)
    val pb = Seq((10L, "alpha resident line.\nfresh batch line."))
    def runPar(ck: String): Unit = {
      val mem = MemoryStream[(Long, String)]
      val q = EventStream.paragraphIngest(
        mem.toDF().toDF("doc_id", "text"), pIdx, pOut, base + ck, skipReplayed = true)
      mem.addData(pb: _*); q.processAllAvailable(); q.stop()
    }
    runPar("/pck1")
    val pRows = spark.read.parquet(pOut).orderBy("doc_id").collect().toSeq
    val pHashes = spark.read.parquet(s"$pIdx/hashes").count()
    runPar("/pck2")
    assert(spark.read.parquet(pOut).orderBy("doc_id").collect().toSeq == pRows,
      "paragraph gate: replayed batch must not duplicate output rows")
    assert(spark.read.parquet(s"$pIdx/hashes").count() == pHashes,
      "paragraph gate: replayed batch must leave the hash set untouched")
  }

  test("replay gates: skipReplayed no-ops a redelivered batch through the curated pipeline") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-sreplay-cur").toString
    // minimal healthy fixture: in-vocab punctuated stopword-bearing pages
    def page(tag: Int) = (0 until 6).map(i => s"the quick fox and the lazy dog run$tag$i.").mkString("\n")
    val reference = Seq((900L, page(9).replace(".", ""), "en", "s0"))
      .toDF("doc_id", "text", "lang", "source")
    val lmDir = base + "/lm"
    graft.text.NgramLm.buildAt(spark, reference, lmDir, vocabSize = 40, maxBigrams = 200)
    val idx = base + "/idx"
    graft.text.LshIndex.build(spark,
      Seq((500L, "resident seed page unrelated tokens entirely.")).toDF("doc_id", "text"), idx)
    val b1 = Seq((1L, page(1), "en", "s0"), (2L, page(2), "en", "s0"))
    val verdictLog = base + "/verdicts"
    def run(ck: String): Unit = {
      val mem = MemoryStream[(Long, String, String, String)]
      val q = EventStream.curatedCorpusIngest(
        mem.toDF().toDF("doc_id", "text", "lang", "source"),
        lmDir, idx, verdictLog, base + ck, minFitPpm = 0L, minWords = 5L,
        skipReplayed = true)
      mem.addData(b1: _*); q.processAllAvailable(); q.stop()
    }
    run("/ck1")
    val verd = spark.read.parquet(verdictLog).orderBy("doc_id").collect().toSeq
    assert(verd.map(_.getAs[String]("verdict")).count(_ == "ingested") == 2,
      s"fixture sanity: both pages pass all four gates, got $verd")
    val hashes = spark.read.parquet(s"$idx/hashes").count()
    run("/ck2")
    assert(spark.read.parquet(verdictLog).orderBy("doc_id").collect().toSeq == verd,
      "curated gate: replayed batch must leave the verdict log untouched")
    assert(spark.read.parquet(s"$idx/hashes").count() == hashes,
      "curated gate: replayed batch must leave the dedup index untouched")
  }

  test("replay gates: a batch id BEHIND the high-water mark fails loud (generation mismatch)") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val base = java.nio.file.Files.createTempDirectory("graft-sreplay-gen").toString
    val idx = base + "/idx"
    val verdictLog = base + "/verdicts"
    val docs = Tables.documents(spark, sf)
    graft.text.LshIndex.build(spark,
      docs.filter(col("doc_id") < 300).select("doc_id", "text"), idx)
    def rows(lo: Long, hi: Long) = docs
      .filter(col("doc_id") >= lo && col("doc_id") < hi).select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    // two committed batches → high-water mark 1
    val mem = MemoryStream[(Long, String)]
    val q1 = EventStream.corpusIngest(mem.toDF().toDF("doc_id", "text"),
      idx, verdictLog, base + "/ckpt1", skipReplayed = true)
    mem.addData(rows(300, 310): _*); q1.processAllAvailable()
    mem.addData(rows(310, 320): _*); q1.processAllAvailable()
    q1.stop()
    // a reset checkpoint delivers NEW data as batch 0 — below the mark.
    // The old >= semantics would silently skip it (data loss); the gate
    // must fail loud instead.
    val mem2 = MemoryStream[(Long, String)]
    val q2 = EventStream.corpusIngest(mem2.toDF().toDF("doc_id", "text"),
      idx, verdictLog, base + "/ckpt2", skipReplayed = true)
    mem2.addData(rows(320, 330): _*)
    val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q2.processAllAvailable()
    }
    q2.stop()
    assert(ex.getMessage.contains("behind the log's high-water mark"),
      s"generation mismatch must fail loud, got: ${ex.getMessage.take(300)}")
  }

  test("streaming paragraph ingest cuts resident dups and grows the hash set mid-stream") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-spar").toString
    val streamIdx = base + "/stream-idx"
    val twinIdx = base + "/twin-idx"
    val outLog = base + "/rebuilt"
    val ckpt = base + "/ckpt"
    val seed = Seq((1L, "alpha resident line.\nshared chrome line.")).toDF("doc_id", "text")
    graft.text.ParagraphIndex.build(spark, seed, streamIdx)
    graft.text.ParagraphIndex.build(spark, seed, twinIdx)
    // batch 1: a resident dup paragraph + a fresh one the stream must claim
    val b1 = Seq((10L, "shared chrome line.\nfresh batch one line."))
    // batch 2: re-offers batch 1's fresh paragraph — only catchable if
    // batch 1's hashes became resident before batch 2 ran
    val b2 = Seq((20L, "fresh batch one line.\nbatch two own line."))
    val mem = MemoryStream[(Long, String)]
    val q = EventStream.paragraphIngest(
      mem.toDF().toDF("doc_id", "text"), streamIdx, outLog, ckpt)
    mem.addData(b1: _*); q.processAllAvailable()
    mem.addData(b2: _*); q.processAllAvailable()
    q.stop()
    val t1 = graft.text.ParagraphIndex.ingestBatch(spark, twinIdx, b1.toDF("doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getString(3)))
    val t2 = graft.text.ParagraphIndex.ingestBatch(spark, twinIdx, b2.toDF("doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getString(3)))
    val got = spark.read.parquet(outLog).orderBy("doc_id").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_kept"),
        r.getAs[String]("dedup_text")))
    assert(got.toSeq == (t1 ++ t2).toSeq,
      "streamed surgery output must equal the sequential ingest loop")
    assert(got(0) == ((10L, 1L, "fresh batch one line.")),
      "the resident paragraph is cut, the fresh one kept")
    assert(got(1) == ((20L, 1L, "batch two own line.")),
      "a batch-2 re-offer of a batch-1 paragraph must be cut mid-stream")
    val a = spark.read.parquet(s"$streamIdx/hashes").orderBy("norm").collect().toSeq
    val b = spark.read.parquet(s"$twinIdx/hashes").orderBy("norm").collect().toSeq
    assert(a == b, "streamed hash set must equal the sequential twin")
  }

  test("streaming media ingest gates micro-batches on resident perceptual near-dups") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    import graft.multimodal.{Multimodal, PngCodec}
    val base = java.nio.file.Files.createTempDirectory("graft-smedia").toString
    val streamIdx = base + "/stream-ph"
    val twinIdx = base + "/twin-ph"
    val verdictLog = base + "/verdicts"
    val ckpt = base + "/ckpt"
    def png(src: Long, bump: Int = 0, filter: Int = 0): Array[Byte] =
      PngCodec.encodeGray(Array.tabulate(1024) { p =>
        // murmur3-finalizer mix: effectively-random pixels per (src, p), so
        // distinct sources get far-apart hashes (anything linear in p makes
        // striped, near-colliding hashes)
        var h = src * 1000003L + p
        h ^= h >>> 33; h *= 0xff51afd7ed558ccdL; h ^= h >>> 33
        ((h & 0xFF).toInt + (if (p == 0) bump else 0)) & 0xFF
      }, 32, 32, filterType = filter)
    def img(id: Long, src: Long, bump: Int = 0, filter: Int = 0) =
      Multimodal.MediaRow(id, "image", png(src, bump, filter))
    val resident = (0L until 30L).map(i => img(i, i))
    graft.multimodal.PhashIndex.build(spark, resident.toDS(), streamIdx)
    graft.multimodal.PhashIndex.build(spark, resident.toDS(), twinIdx)
    // batch 1: fresh + RE-ENCODED resident (same pixels, different filter)
    //          + one-pixel-bumped resident (Hamming-close) + junk bytes
    val b1 = (100L until 110L).map(i => img(i, i)) ++
      Seq(img(500L, 3L, filter = 1), img(501L, 5L, bump = 6),
        Multimodal.MediaRow(502L, "image", "not a png".getBytes))
    // batch 2: fresh + a re-offer of a BATCH-1 survivor (mid-stream growth)
    val b2 = (200L until 205L).map(i => img(i, i + 1000)) ++
      Seq(img(600L, 105L, filter = 1))
    val mem = MemoryStream[(Long, String, Array[Byte])]
    val q = EventStream.mediaIngest(
      mem.toDF().toDF("doc_id", "media_type", "data"), streamIdx, verdictLog, ckpt)
    mem.addData(b1.map(m => (m.doc_id, m.media_type, m.data)): _*); q.processAllAvailable()
    mem.addData(b2.map(m => (m.doc_id, m.media_type, m.data)): _*); q.processAllAvailable()
    q.stop()
    val v1 = graft.multimodal.PhashIndex.dedupIngest(spark, twinIdx, b1.toDS()).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val v2 = graft.multimodal.PhashIndex.dedupIngest(spark, twinIdx, b2.toDS()).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val got = spark.read.parquet(verdictLog).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("verdict")).toMap
    assert(got == (v1 ++ v2).toMap, "streamed verdicts must equal the sequential gate")
    assert(got(500L) == "near_dup", "re-encoded resident must die")
    assert(got(501L) == "near_dup", "one-pixel-bumped resident must die within the radius")
    assert(got(502L) == "undecodable", "junk bytes pass through flagged, never silently dropped")
    assert(got(100L) == "ingested")
    assert(got(600L) == "near_dup", "batch-2 re-offer of a batch-1 survivor must die mid-stream")
  }

  test("streaming audio ingest gates micro-batches through the shared hash engine") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    import graft.multimodal.{Multimodal, WavCodec}
    val base = java.nio.file.Files.createTempDirectory("graft-saud").toString
    val streamIdx = base + "/stream-aud"
    val twinIdx = base + "/twin-aud"
    val verdictLog = base + "/verdicts"
    val ckpt = base + "/ckpt"
    // noise-like signals so distinct sources fingerprint far apart (the
    // MultimodalSpec gate-fixture rationale)
    def sig(src: Long): Array[Int] = Array.tabulate(576) { i =>
      val h = (src * 2654435761L + i.toLong * 40503L) ^ (i.toLong * i * 97L)
      (((h % 4096L) + 4096L) % 4096L - 2048L).toInt
    }
    def wav(id: Long, src: Long, stereo: Boolean = false) =
      Multimodal.MediaRow(id, "audio",
        if (stereo) WavCodec.encodePcm16(sig(src).flatMap(v => Array(v, v)), 8000, 2,
          extraChunk = true)
        else WavCodec.encodePcm16(sig(src), 8000, 1))
    val resident = (0L until 20L).map(i => wav(i, i))
    graft.multimodal.AudioHashIndex.build(spark, resident.toDS(), streamIdx)
    graft.multimodal.AudioHashIndex.build(spark, resident.toDS(), twinIdx)
    // batch 1: fresh + a re-MASTERED resident (stereo + extra chunk) + junk
    val b1 = (100L until 105L).map(i => wav(i, i + 500)) ++
      Seq(wav(300L, 7L, stereo = true),
        Multimodal.MediaRow(301L, "audio", "not audio".getBytes))
    // batch 2: a re-offer of a batch-1 survivor (mid-stream growth)
    val b2 = Seq(wav(400L, 900L), wav(401L, 103L + 500L))
    val mem = MemoryStream[(Long, String, Array[Byte])]
    val q = EventStream.audioIngest(
      mem.toDF().toDF("doc_id", "media_type", "data"), streamIdx, verdictLog, ckpt)
    mem.addData(b1.map(m => (m.doc_id, m.media_type, m.data)): _*); q.processAllAvailable()
    mem.addData(b2.map(m => (m.doc_id, m.media_type, m.data)): _*); q.processAllAvailable()
    q.stop()
    val v1 = graft.multimodal.AudioHashIndex.dedupIngest(spark, twinIdx, b1.toDS()).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val v2 = graft.multimodal.AudioHashIndex.dedupIngest(spark, twinIdx, b2.toDS()).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val got = spark.read.parquet(verdictLog).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("verdict")).toMap
    assert(got == (v1 ++ v2).toMap, "streamed verdicts must equal the sequential gate")
    assert(got(300L) == "near_dup", "the re-mastered resident must die at Hamming 0")
    assert(got(301L) == "undecodable")
    assert(got(100L) == "ingested")
    assert(got(401L) == "near_dup", "batch-2 re-offer of a batch-1 survivor must die mid-stream")
  }

  test("streaming video ingest gates micro-batches through the shared hash engine") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    import graft.multimodal.{AviCodec, Multimodal, VideoHashIndex}
    val base = java.nio.file.Files.createTempDirectory("graft-svid").toString
    val streamIdx = base + "/stream-vid"
    val twinIdx = base + "/twin-vid"
    val verdictLog = base + "/verdicts"
    val ckpt = base + "/ckpt"
    // hash-mixed frames so distinct sources fingerprint far apart
    def frames(src: Long): Array[Array[Int]] = Array.tabulate(18) { f =>
      Array.tabulate(144) { p =>
        val i = (f * 144 + p).toLong
        val h = (src * 2654435761L + i * 40503L) ^ (i * i * 97L)
        (((h % 256L) + 256L) % 256L).toInt
      }
    }
    def avi(id: Long, src: Long, reContainer: Boolean = false) =
      Multimodal.MediaRow(id, "video",
        AviCodec.encodeGray(frames(src), 12, 12,
          bits = if (reContainer) 8 else 24, topDown = reContainer,
          extraChunk = reContainer))
    val resident = (0L until 15L).map(i => avi(i, i))
    VideoHashIndex.build(spark, resident.toDS(), streamIdx)
    VideoHashIndex.build(spark, resident.toDS(), twinIdx)
    // batch 1: fresh + a re-CONTAINERED resident + an undecodable payload
    val b1 = (100L until 104L).map(i => avi(i, i + 500)) ++
      Seq(avi(300L, 7L, reContainer = true),
        Multimodal.MediaRow(301L, "video", "not a video".getBytes))
    // batch 2: a re-offer of a batch-1 survivor (mid-stream growth)
    val b2 = Seq(avi(400L, 900L), avi(401L, 102L + 500L))
    val mem = MemoryStream[(Long, String, Array[Byte])]
    val q = EventStream.videoIngest(
      mem.toDF().toDF("doc_id", "media_type", "data"), streamIdx, verdictLog, ckpt)
    mem.addData(b1.map(m => (m.doc_id, m.media_type, m.data)): _*); q.processAllAvailable()
    mem.addData(b2.map(m => (m.doc_id, m.media_type, m.data)): _*); q.processAllAvailable()
    q.stop()
    val v1 = VideoHashIndex.dedupIngest(spark, twinIdx, b1.toDS()).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val v2 = VideoHashIndex.dedupIngest(spark, twinIdx, b2.toDS()).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val got = spark.read.parquet(verdictLog).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("verdict")).toMap
    assert(got == (v1 ++ v2).toMap, "streamed verdicts must equal the sequential gate")
    assert(got(300L) == "near_dup", "the re-containered resident must die at Hamming 0")
    assert(got(301L) == "undecodable")
    assert(got(100L) == "ingested")
    assert(got(401L) == "near_dup", "batch-2 re-offer of a batch-1 survivor must die mid-stream")
  }

  test("streaming vector ingest gates micro-batches on resident cosine near-dups") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val base = java.nio.file.Files.createTempDirectory("graft-svec").toString
    val streamIdx = base + "/stream-ivf"
    val twinIdx = base + "/twin-ivf"
    val verdictLog = base + "/verdicts"
    val ckpt = base + "/ckpt"
    val emb = Tables.embeddings(spark, sf)
    graft.vector.IvfIndex.build(spark, emb.filter(col("vec_id") < 400), streamIdx)
    graft.vector.IvfIndex.build(spark, emb.filter(col("vec_id") < 400), twinIdx)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Int]("label"),
        r.getSeq[Float](r.fieldIndex("embedding"))))
    // Batch 1: fresh vectors + verbatim re-offers of RESIDENT vectors
    // (identical embedding → identical probe cells → cos 1 ≥ threshold).
    val b1 = rows(emb.filter(col("vec_id") >= 400 && col("vec_id") < 450)) ++
      rows(emb.filter(col("vec_id") < 20)
        .withColumn("vec_id", col("vec_id") + 100000L))
    // Batch 2: fresh vectors + re-offers of BATCH 1 vectors — only
    // catchable if batch 1's survivors became resident mid-stream.
    val b2 = rows(emb.filter(col("vec_id") >= 450)) ++
      rows(emb.filter(col("vec_id") >= 400 && col("vec_id") < 410)
        .withColumn("vec_id", col("vec_id") + 200000L))

    val mem = MemoryStream[(Long, Int, Seq[Float])]
    val q = EventStream.vectorCorpusIngest(
      mem.toDF().toDF("vec_id", "label", "embedding"), streamIdx, verdictLog, ckpt)
    mem.addData(b1.toSeq: _*); q.processAllAvailable()
    mem.addData(b2.toSeq: _*); q.processAllAvailable()
    q.stop()

    val v1 = graft.vector.IvfIndex.dedupIngest(spark, twinIdx,
      b1.toSeq.toDF("vec_id", "label", "embedding")).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val v2 = graft.vector.IvfIndex.dedupIngest(spark, twinIdx,
      b2.toSeq.toDF("vec_id", "label", "embedding")).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val got = spark.read.parquet(verdictLog).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[String]("verdict")).toMap
    assert(got == (v1 ++ v2).toMap, "streamed verdicts must equal the sequential gate")

    // Resident re-offers die; batch-2 re-offers of batch-1 survivors die.
    (0L until 20L).foreach(i => assert(got(i + 100000L) == "near_dup"))
    assert((400L until 410L).exists(id =>
      got(id) == "ingested" && got(id + 200000L) == "near_dup"),
      "a batch-2 re-offer of a batch-1 survivor must be a near_dup")

    // Streamed layout ≡ sequential twin.
    val a = spark.read.parquet(s"$streamIdx/vectors").select("vec_id")
      .collect().map(_.getLong(0)).sorted.toSeq
    val b = spark.read.parquet(s"$twinIdx/vectors").select("vec_id")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(a == b, "streamed index must equal the sequential twin")
  }

  test("streaming inverted-index ingest: docs become searchable mid-stream, final index equals a batch build") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val base = java.nio.file.Files.createTempDirectory("graft-sinv").toString
    val streamIdx = base + "/stream-inv"
    val ckpt = base + "/ckpt"
    val docs = Tables.documents(spark, sf)
    val seed = docs.filter(col("doc_id") < 100)
    graft.text.InvertedIndex.build(spark, seed, streamIdx, nBuckets = 16)

    def rows(lo: Long, hi: Long) = docs
      .filter(col("doc_id") >= lo && col("doc_id") < hi)
      .select("doc_id", "text", "source")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))

    val mem = MemoryStream[(Long, String, String)]
    val q = EventStream.invertedIngest(
      mem.toDF().toDF("doc_id", "text", "source"), streamIdx, ckpt)
    mem.addData(rows(100, 200).toSeq: _*); q.processAllAvailable()
    // mid-stream: a batch-1 doc is already term-searchable
    val mid = graft.text.InvertedIndex.search(spark, streamIdx, Seq("table"), k = 100000)
      .collect().map(_.getLong(0)).toSet
    assert(mid.exists(id => id >= 100 && id < 200),
      "batch-1 docs must be searchable before the stream ends")
    mem.addData(rows(200, 300).toSeq: _*); q.processAllAvailable()
    q.stop()

    val batchIdx = base + "/batch-inv"
    graft.text.InvertedIndex.build(spark, docs.filter(col("doc_id") < 300), batchIdx, nBuckets = 16)
    for (terms <- Seq(Seq("spark", "join"), Seq("table"))) {
      val streamed = graft.text.InvertedIndex.search(spark, streamIdx, terms, k = 1000)
        .collect().map(_.toString).toSeq
      val batch = graft.text.InvertedIndex.search(spark, batchIdx, terms, k = 1000)
        .collect().map(_.toString).toSeq
      assert(streamed == batch, s"terms=$terms")
    }
  }

  test("snapshot CDC stream: per-batch dirty-bucket merges, last-change-per-id wins within a batch") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val base = java.nio.file.Files.createTempDirectory("graft-scdc").toString
    val snap = base + "/snap"
    val ckpt = base + "/ckpt"
    val docsInit = (0L until 40L).map(i => (i, s"orig$i", "en", "s", 5L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    graft.sources.SnapshotStore.init(spark, docsInit, snap, nBuckets = 8)

    // (op, seq, doc_id, text, lang, source, n_chars)
    val mem = MemoryStream[(String, Long, Long, String, String, String, Long)]
    val q = EventStream.snapshotCdc(
      mem.toDF().toDF("op", "seq", "doc_id", "text", "lang", "source", "n_chars"),
      snap, ckpt)
    // batch 1: doc 1 updated twice (seq 2 wins), doc 2 deleted, doc 100 inserted
    mem.addData(
      ("U", 1L, 1L, "one-v1", "en", "s", 6L),
      ("U", 2L, 1L, "one-v2", "en", "s", 6L),
      ("D", 1L, 2L, "", "en", "s", 0L),
      ("U", 1L, 100L, "new", "en", "s", 3L))
    q.processAllAvailable()
    val mid = graft.sources.SnapshotStore.read(spark, snap)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(mid(1L) == "one-v2", "last change per id within the batch must win")
    assert(!mid.contains(2L) && mid(100L) == "new")
    // batch 2: update-then-delete the same id — the delete (higher seq) wins
    mem.addData(
      ("U", 3L, 3L, "three-v2", "en", "s", 8L),
      ("D", 4L, 3L, "", "en", "s", 0L))
    q.processAllAvailable()
    q.stop()
    val fin = graft.sources.SnapshotStore.read(spark, snap)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(!fin.contains(3L), "an update-then-delete batch must end deleted")
    assert(fin.size == 40 - 1 + 1 - 1) // minus ids 2 and 3, plus id 100
  }

  test("versioned CDC stream: one atomic commit per micro-batch, history time-travelable") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    import graft.sources.VersionedStore
    val base = java.nio.file.Files.createTempDirectory("graft-vcdc").toString
    val store = base + "/store"
    val ckpt = base + "/ckpt"
    val docsInit = (0L until 40L).map(i => (i, s"orig$i", "en", "s", 5L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    VersionedStore.init(spark, docsInit, store, nBuckets = 8)

    val mem = MemoryStream[(String, Long, Long, String, String, String, Long)]
    val q = EventStream.versionedCdc(
      mem.toDF().toDF("op", "seq", "doc_id", "text", "lang", "source", "n_chars"),
      store, ckpt)
    mem.addData(
      ("U", 1L, 1L, "one-v1", "en", "s", 6L),
      ("U", 2L, 1L, "one-v2", "en", "s", 6L),
      ("D", 1L, 2L, "", "en", "s", 0L),
      ("U", 1L, 100L, "new", "en", "s", 3L))
    q.processAllAvailable()
    mem.addData(
      ("U", 3L, 3L, "three-v2", "en", "s", 8L),
      ("D", 4L, 3L, "", "en", "s", 0L))
    q.processAllAvailable()
    q.stop()
    // two batches on top of init → versions 1, 2, 3, all readable
    assert(VersionedStore.versions(spark, store) === Seq(1L, 2L, 3L))
    def texts(v: Long) = VersionedStore.read(spark, store, Some(v))
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val v1 = texts(1L)
    assert(v1(1L) == "orig1" && v1.contains(2L) && !v1.contains(100L))
    val v2 = texts(2L)
    assert(v2(1L) == "one-v2" && !v2.contains(2L) && v2(100L) == "new")
    val v3 = texts(3L)
    assert(!v3.contains(3L), "update-then-delete batch must end deleted")
    assert(v3.size == 40 - 1 + 1 - 1)
  }
}
