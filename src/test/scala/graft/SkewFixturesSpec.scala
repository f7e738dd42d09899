package graft

import java.util.concurrent.atomic.AtomicLong
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.functions._
import graft.ops.{Dedup, Similarity}

/** Adversarial-skew fixtures: the 100-TB arguments (df caps, identical-hash
  * collapse, hot-cell salting, banded candidate generation) get executable
  * teeth. Each test plants the pathological shape its operator claims to
  * survive — a dominant boilerplate source, a flat-image crawl, one hot IVF
  * cell, one hot LSH band — and asserts the claimed bound from REAL Spark
  * task metrics (shuffle read/write record counts), not from reasoning.
  */
class SkewFixturesSpec extends SparkSpec {

  private case class ShuffleStats(maxTaskRead: Long, totalWrite: Long)

  /** Run `action` and report (max per-task shuffle-read records, total
    * shuffle-write records) across every task it schedules. Listener
    * delivery is async: poll until the bus has been quiet for a beat.
    */
  private def shuffleStats(action: => Unit): ShuffleStats = {
    val maxRead = new AtomicLong(0L)
    val totWrite = new AtomicLong(0L)
    val lastEvent = new AtomicLong(System.nanoTime())
    val listener = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        lastEvent.set(System.nanoTime())
        val m = t.taskMetrics
        if (m != null) {
          maxRead.getAndUpdate(l => math.max(l, m.shuffleReadMetrics.recordsRead))
          totWrite.addAndGet(m.shuffleWriteMetrics.recordsWritten)
          ()
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      action
      val deadline = System.nanoTime() + 15L * 1000 * 1000 * 1000
      while (System.nanoTime() - lastEvent.get() < 700L * 1000 * 1000 &&
        System.nanoTime() < deadline) Thread.sleep(50)
    } finally spark.sparkContext.removeSparkListener(listener)
    ShuffleStats(maxRead.get(), totWrite.get())
  }

  test("winnow df cap: a 90%-dominant boilerplate source cannot go quadratic through the shuffle") {
    import spark.implicits._
    val k = 3; val w = 4
    def filler(d: Int, n: Int): String = Seq.tabulate(n)(j => s"d${d}x$j").mkString(" ")
    val boiler = Seq.tabulate(k + w - 1 + 6)(i => s"b$i").mkString(" ")
    // one dominant source carries 90% of the corpus, every doc stamped with
    // the same boilerplate run (the crawl-footer shape)
    val docs = ((0 until 450).map(i =>
      (i.toLong, "common-crawl", filler(i, 20) + " " + boiler + " " + filler(9000 + i, 20))) ++
      (450 until 500).map(i => (i.toLong, s"curated-$i", filler(i, 40))))
      .toDF("doc_id", "source", "text")
    val capped = shuffleStats {
      assert(Dedup.winnowDupPairs(docs, k, w, minShared = 1, maxDf = 10).count() == 0L)
    }
    val uncapped = shuffleStats {
      // cap lifted: the hot fingerprint's C(450,2) ≈ 101k pairs all cross
      // the pair-aggregation shuffle
      assert(Dedup.winnowDupPairs(docs, k, w, minShared = 1, maxDf = 1000000).count() >= 101025L)
    }
    assert(uncapped.totalWrite >= 100000L,
      s"fixture must actually produce the quadratic shuffle (got ${uncapped.totalWrite})")
    assert(capped.totalWrite <= 60000L,
      s"capped shuffle volume must stay linear in the corpus (got ${capped.totalWrite})")
    assert(capped.totalWrite * 2 < uncapped.totalWrite)
  }

  test("paragraph dedup: a 10k-copy boilerplate line never concentrates in one task") {
    import graft.ops.Curation
    import spark.implicits._
    // the crawl shape paragraph dedup exists for: every page carries the
    // same chrome line, plus its own content line
    // content lines must stay distinct AFTER digit-stripping — spell the
    // id in letters
    def tag(i: Int): String = i.toString.map(c => ('a' + (c - '0')).toChar)
    val docs = (0 until 10000).map(i =>
      (i.toLong, s"unique content line ${tag(i)}.\nshared boilerplate chrome line."))
      .toDF("doc_id", "text")
    // AQE's small-partition coalescing would merge these byte-tiny test
    // shuffles into one task and mask the DISTRIBUTION being measured —
    // at real scale nothing coalesces; disable it for the measurement
    val coalesceKey = "spark.sql.adaptive.coalescePartitions.enabled"
    val prev = spark.conf.get(coalesceKey, "true")
    spark.conf.set(coalesceKey, "false")
    try {
      val ours = shuffleStats {
        assert(Curation.paragraphDedup(docs)
          .agg(sum(col("n_kept"))).head.getLong(0) == 10001L,
          "doc 0 keeps both lines, every other doc keeps only its content line")
      }
      // the window formulation the operator deliberately avoids: the
      // surgery needs a keep/cut flag on EVERY line (not just the
      // winners — Spark's WindowGroupLimit would save a pure rank-1
      // filter), and ranking every occurrence per normalized paragraph
      // sorts every copy of the hot key inside one task
      val win = shuffleStats {
        val lines = docs
          .select(col("doc_id"), posexplode(split(col("text"), "\n")).as(Seq("pos", "line")))
          .withColumn("norm", trim(regexp_replace(lower(col("line")), "[^a-z ]", "")))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("norm")).orderBy(col("doc_id"), col("pos"))
        assert(lines.withColumn("rn", row_number().over(w))
          .agg(sum(when(col("rn") === 1, 1L).otherwise(0L)))
          .head.getLong(0) == 10001L)
      }
      assert(win.maxTaskRead >= 10000L,
        s"the window shape must actually concentrate the hot paragraph (got ${win.maxTaskRead})")
      // ours: the winners aggregation combines map-side (the hot key is 4
      // partial rows, not 10k), the dup side broadcasts, and the rebuild
      // hash-distributes on doc_id — max per-task read stays ~ lines /
      // shuffle partitions (20001/4 ≈ 5k), never the hot key's copy count
      assert(ours.maxTaskRead <= 7000L,
        s"min(struct) combine + broadcastable dup side: no task absorbs the hot key (got ${ours.maxTaskRead})")
    } finally spark.conf.set(coalesceKey, prev)
  }

  test("phash collapse: a crawl of 1k byte-identical renders keeps shuffle volume ~ output size") {
    import graft.multimodal.{Multimodal, PngCodec}
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val basePx = Array.fill(1024)(rnd.nextInt(256))
    val base = PngCodec.encodeGray(basePx, 32, 32)
    val far = PngCodec.encodeGray(basePx.map(v => 255 - v), 32, 32)
    val n = 1000
    val media = ((0 until n).map(i => Multimodal.MediaRow(i.toLong, "image", base))
      :+ Multimodal.MediaRow(3000L, "image", far)).toDS()
    val nPairs = n.toLong * (n - 1) / 2 // the query's own answer: all true dups
    var got = 0L
    val stats = shuffleStats { got = Multimodal.phashNearPairs(media).count() }
    assert(got == nPairs)
    // The answer itself is ~500k pairs; the bound says nothing BEYOND the
    // answer (plus the 65-probe fan-out of the DISTINCT hashes — 2 here)
    // crosses a shuffle. The pre-collapse shape shipped every identical
    // pair through the probe join under ~65 shared probes each (tens of
    // millions of rows); that regression would blow this bound 40×.
    assert(stats.totalWrite <= nPairs + 200000L,
      s"shuffle volume must stay ~ output size (got ${stats.totalWrite} for $nPairs pairs)")
  }

  test("knnJoinSalted: one hot IVF cell is salted into bounded tasks; unsalted proves the hazard") {
    import spark.implicits._
    // centroids (vec_id < 8) at distinct one-hot corners; vectors 8..2047
    // ALL cluster around centroid 0 — the pathological hot cell
    def corner(c: Int): Array[Float] = Array.tabulate(4)(d => if (d == c % 4) (10f + c / 4 * 5f) else 0f)
    val corpus = ((0 until 8).map(i => (i.toLong, corner(i))) ++
      (8 until 2048).map { i =>
        (i.toLong, Array(10f + (i % 17) * 0.01f, (i % 13) * 0.01f, (i % 11) * 0.01f, 0f))
      }).toDF("vec_id", "embedding")
    val queries = (0 until 40).map { i =>
      (10000L + i, Array(10f + (i % 7) * 0.013f, (i % 5) * 0.017f, 0f, 0f))
    }.toDF("vec_id", "embedding")
    // at 100 TB neither join side broadcasts — force the shuffle-join shape
    // the salting is designed for (at test scale the query side would
    // broadcast and hide the hot key entirely)
    def run(maxCellRows: Long) = {
      val keys = Seq("spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.coalescePartitions.enabled")
      val prev = keys.map(k => k -> spark.conf.getOption(k)).toMap
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      // KB-scale test data: AQE would coalesce every partition into one
      // task and blind the per-task metric; at 100 TB the partitions are
      // target-size and coalescing is exactly what we want
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      try {
        var rows: Array[org.apache.spark.sql.Row] = null
        val st = shuffleStats {
          rows = Similarity.knnJoinSalted(queries, corpus, k = 5, nCells = 8,
            nProbe = 2, maxCellRows = maxCellRows).collect()
        }
        (st, rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq)
      } finally prev.foreach { case (k, v) =>
        v.fold(spark.conf.unset(k))(spark.conf.set(k, _))
      }
    }
    val (salted, saltedRows) = run(100L) // hot cell (~2040 rows) → ~21 salts
    val (unsalted, unsaltedRows) = run(Long.MaxValue) // salt factor 1 everywhere
    assert(saltedRows == unsaltedRows, "salting must not change the result")
    assert(unsalted.maxTaskRead >= 2000L,
      s"unsalted hot cell concentrates in one task (got ${unsalted.maxTaskRead})")
    assert(salted.maxTaskRead <= 1500L,
      s"salted per-task input must stay bounded by ~maxCellRows·groups (got ${salted.maxTaskRead})")
    assert(salted.maxTaskRead * 4 <= unsalted.maxTaskRead * 3)
  }

  test("simhash collapse: 1k identical docs probe-join as one signature row") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    def randWords(n: Int): String = Seq.fill(n)("w" + rnd.nextInt(5000)).mkString(" ")
    val hotText = randWords(30)
    val n = 1000
    val docs = ((0 until n).map(i => (i.toLong, hotText))
      :+ (5000L, randWords(30))).toDF("doc_id", "text")
    val nPairs = n.toLong * (n - 1) / 2
    var got = 0L
    val stats = shuffleStats { got = Dedup.simhashDupPairs(docs).count() }
    // identical docs all pair at hamming 0 (+ whatever the random doc's
    // signature happens to land within radius 2 of — count ≥ the group)
    assert(got >= nPairs)
    // pre-collapse, every identical pair crossed the probe join under ~17
    // shared probes each (~8.5M rows); post-collapse the volume is the
    // answer itself plus the distinct-signature probe fan-out
    assert(stats.totalWrite <= got + 200000L,
      s"shuffle volume must stay ~ output size (got ${stats.totalWrite} for $got pairs)")
  }

  test("rplsh collapse: 1k byte-identical vectors band-join as one representative") {
    import spark.implicits._
    val rnd = new scala.util.Random(41)
    val hot = Array.fill(16)(rnd.nextGaussian().toFloat)
    val n = 1000
    // 1k identical vectors (a crawl's duplicated docs) + 50 spread ones
    val emb = ((0 until n).map(i => (i.toLong, hot)) ++
      (0 until 50).map(i => (5000L + i, Array.fill(16)(rnd.nextGaussian().toFloat))))
      .toDF("vec_id", "embedding")
    val nPairs = n.toLong * (n - 1) / 2
    var got = 0L
    val stats = shuffleStats {
      got = graft.ops.Similarity.rpLshDupPairs(emb, threshold = 0.9).count()
    }
    assert(got >= nPairs, "every identical pair is a true cos=1 dup")
    // pre-collapse, the identical group shared every band bucket: 16 bands
    // × C(1000,2) ≈ 8M candidate rows through the band join; post-collapse
    // the volume is the answer plus the distinct-vector banding fan-out
    assert(stats.totalWrite <= got + 200000L,
      s"shuffle volume must stay ~ output size (got ${stats.totalWrite} for $got pairs)")
  }

  test("minhash hot band: join INPUT per task stays linear; the quadratic part is the answer itself") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    def randWords(n: Int): String = Seq.fill(n)("w" + rnd.nextInt(5000)).mkString(" ")
    val hotText = randWords(30)
    // one hot band bucket: 200 byte-identical docs (all 4 bands collide);
    // 100 unique docs alongside
    val docs = ((0 until 200).map(i => (i.toLong, hotText)) ++
      (200 until 300).map(i => (i.toLong, randWords(30)))).toDF("doc_id", "text")
    var pairs: Long = 0
    val stats = shuffleStats { pairs = Dedup.minhashDupPairs(docs).count() }
    // every identical pair IS a true duplicate — the quadratic rows are the
    // query's own answer, not wasted candidates
    assert(pairs == 200L * 199 / 2)
    // identical-text collapse: the 200 copies ride the LSH + verify
    // pipeline as ONE representative, so shuffle volume stays ~ answer
    // size (pre-collapse the verify tier alone shuffled candidate ×
    // shingle ≈ ½M rows), and no task's input approaches docs²
    assert(stats.totalWrite <= pairs + 100000L,
      s"shuffle volume must stay ~ output size (got ${stats.totalWrite} for $pairs pairs)")
    assert(stats.maxTaskRead <= 4 * pairs,
      s"per-task shuffle input must stay ~linear in the bucket (got ${stats.maxTaskRead})")
  }
}
