package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming-throughput bench (r5 verdict #6): StreamingSpec proves the
  * streaming tier CORRECT (stream ≡ batch everywhere); this records what it
  * SUSTAINS. Three representative flows run over rate-limited sources for a
  * fixed wall-clock window and report end-to-end rows/s from the queries'
  * own progress metrics:
  *
  *  - `sessionize`  — the stateful (flatMapGroupsWithState) path: per-user
  *    session state, event-time timeouts; throughput is state-update bound.
  *  - `corpusIngest` — the heavy foreachBatch path: every micro-batch runs
  *    the full three-tier LSH dedup gate against a resident on-disk index
  *    and appends survivors; throughput is gate-join bound.
  *  - `versionedCdc` — the transactional path: every micro-batch becomes
  *    one atomic dirty-bucket commit on the versioned store; throughput is
  *    commit/IO bound.
  *  - `semanticDecontam` — the stateless map-only path: every row folds
  *    against a literal 128-vector benchmark (the eval-suite scale) with
  *    the threshold filter applied in-stream; throughput is codegen bound —
  *    the ceiling the stateful flows are measured against.
  *
  * The sessionize flow also runs under the RocksDB state store (the
  * at-scale provider) with two extra numbers: the state footprint (state
  * rows + bytes from StateOperatorProgress on the last micro-batch) and
  * the checkpoint-recovery time — stop the query, restart from the same
  * checkpoint against the still-running source, and clock start() to the
  * first completed micro-batch (state reload + source catch-up).
  *
  * Prints ONE JSON line: {"metric":"stream_rows_per_sec", ...,
  * "flows":{name:{rows,sec,rows_per_sec,batches[,state_rows,state_bytes,
  * recovery_ms]}}}. Not part of the driver BENCH contract — run manually;
  * numbers land in SURVEY.md.
  */
object StreamBench {

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-sb-$tag").toString

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runSec = sys.env.getOrElse("SPARK_GRAFT_STREAM_SEC", "20").toInt
    // Resident-curve knobs (r13, VERDICT #4): REPS amplifies the RESIDENT
    // index corpora (ScaleProbe.amplifyDocs — growth, not duplication) for
    // the index-gated flows, so the same recording run at 1/10/100 gives
    // the streaming twins' sustained-throughput-vs-resident-size curve
    // under real micro-batch re-planning (per-batch AQE context differs
    // from the batch operators the twins call). FLOWS filters which flows
    // run (comma-separated), so a curve run doesn't pay for the rest.
    val residentReps = sys.env.getOrElse("SPARK_GRAFT_STREAM_REPS", "1").toInt
    val onlyFlows = sys.env.get("SPARK_GRAFT_STREAM_FLOWS")
      .map(_.split(",").map(_.trim).toSet)
    def want(flow: String): Boolean = onlyFlows.forall(_.contains(flow))
    def residentDocs(spark: SparkSession): DataFrame = {
      val d = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
      if (residentReps <= 1) d
      else graft.tools.ScaleProbe.amplifyDocs(d, residentReps)
    }
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // sidecar point-lookups push batch-key In predicates to parquet
      // as OR-of-eq up to 1000 keys (page/row-group exact; see KeyedSidecar)
      .config("spark.sql.parquet.pushdown.inFilterThreshold", "1000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // Per flow: run for runSec of wall clock, then read rows + busy time
    // (sum of batch durations — excludes idle waits on the rate limiter,
    // so rows/busy-sec is sustained CAPACITY, not the source rate).
    def rate(rowsPerSecond: Int): DataFrame =
      spark.readStream.format("rate")
        .option("rowsPerSecond", rowsPerSecond)
        .option("numPartitions", 8).load()

    val results = scala.collection.mutable.LinkedHashMap.empty[String, (Long, Double, Int)]
    val extras = scala.collection.mutable.LinkedHashMap.empty[String, String]

    def sessionEvents(): org.apache.spark.sql.Dataset[streaming.EventStream.Event] =
      rate(100000)
        .select(col("value").as("event_id"), col("timestamp").as("ts"),
          pmod(col("value"), lit(10000L)).as("user_id"),
          lit("click").as("event_type"),
          pmod(col("value"), lit(100L)).cast("double").as("value"),
          lit("{}").as("props"))
        .as[streaming.EventStream.Event]

    // last micro-batch's state-store footprint across the query's
    // stateful operators
    def stateFootprint(q: org.apache.spark.sql.streaming.StreamingQuery): (Long, Long) =
      q.recentProgress.reverseIterator
        .map(_.stateOperators)
        .find(_.nonEmpty)
        .map(ops => (ops.map(_.numRowsTotal).sum, ops.map(_.memoryUsedBytes).sum))
        .getOrElse((0L, 0L))

    // ---- 1. stateful sessionization ----------------------------------------
    if (want("sessionize")) locally {
      val q = streaming.EventStream.sessionize(sessionEvents())
        .writeStream.format("noop")
        .option("checkpointLocation", tmp("sess-ckpt"))
        .outputMode("append").start()
      Thread.sleep(runSec * 1000L)
      val rows = q.recentProgress.map(_.numInputRows).sum
      val secs = q.recentProgress.map(_.batchDuration).sum / 1000.0
      val n = q.recentProgress.length
      val (stRows, stBytes) = stateFootprint(q)
      q.stop(); q.awaitTermination()
      results += "sessionize" -> ((rows, if (secs > 0) secs else runSec.toDouble, n))
      extras += "sessionize" -> s""","state_rows":$stRows,"state_bytes":$stBytes"""
    }

    // ---- 1b. sessionize under RocksDB: state footprint + checkpoint recovery
    if (want("sessionizeRocks")) locally {
      val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
      spark.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      try {
        val ckpt = tmp("sessrocks-ckpt")
        def startQ() = streaming.EventStream.sessionize(sessionEvents())
          .writeStream.format("noop")
          .option("checkpointLocation", ckpt)
          .outputMode("append").start()
        val q = startQ()
        Thread.sleep(runSec * 1000L)
        val rows = q.recentProgress.map(_.numInputRows).sum
        val secs = q.recentProgress.map(_.batchDuration).sum / 1000.0
        val n = q.recentProgress.length
        val (stRows, stBytes) = stateFootprint(q)
        q.stop(); q.awaitTermination()
        // recovery: restart from the same checkpoint; the clock covers
        // state-store reload + the catch-up batch over what the source
        // produced while the query was down
        val t0 = System.nanoTime()
        val q2 = startQ()
        val deadline = t0 + 180L * 1000 * 1000 * 1000
        while (q2.recentProgress.isEmpty && System.nanoTime() < deadline)
          Thread.sleep(50)
        val recoveryMs = (System.nanoTime() - t0) / 1000000L
        q2.stop(); q2.awaitTermination()
        results += "sessionizeRocks" -> ((rows, if (secs > 0) secs else runSec.toDouble, n))
        extras += "sessionizeRocks" ->
          s""","state_rows":$stRows,"state_bytes":$stBytes,"recovery_ms":$recoveryMs"""
      } finally prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }

    // ---- 2. LSH dedup-gated corpus ingest ----------------------------------
    if (want("corpusIngest")) locally {
      val indexPath = tmp("lsh-idx") + "/idx"
      val verdictPath = tmp("lsh-verd") + "/v"
      text.LshIndex.build(spark, residentDocs(spark), indexPath)
      // id offset clears every amplification replica (r·10⁷, r ≤ 127)
      val docs = rate(2000)
        .select((col("value") + 10000000000L).as("doc_id"),
          array_join(transform(sequence(lit(0), lit(29)),
            i => concat(lit("tok"), pmod(col("value") * 7 + i * 13, lit(997)))), " ")
            .as("text"))
      val q = streaming.EventStream.corpusIngest(docs, indexPath, verdictPath,
        tmp("lsh-ckpt"))
      Thread.sleep(runSec * 1000L)
      val rows = q.recentProgress.map(_.numInputRows).sum
      val secs = q.recentProgress.map(_.batchDuration).sum / 1000.0
      val n = q.recentProgress.length
      q.stop(); q.awaitTermination()
      results += "corpusIngest" -> ((rows, if (secs > 0) secs else runSec.toDouble, n))
    }

    // ---- 2b. the same gate under skipReplayed ------------------------------
    // quantifies the idempotent-replay option's per-micro-batch cost (one
    // footer-stats read of the verdict log's batch_id column) against the
    // fail-loud default above — same source, same gate, same window
    if (want("corpusIngestSkipReplayed")) locally {
      val indexPath = tmp("lsh-idx2") + "/idx"
      val verdictPath = tmp("lsh-verd2") + "/v"
      text.LshIndex.build(spark, residentDocs(spark), indexPath)
      val docs = rate(2000)
        .select((col("value") + 20000000000L).as("doc_id"),
          array_join(transform(sequence(lit(0), lit(29)),
            i => concat(lit("tok"), pmod(col("value") * 7 + i * 13, lit(997)))), " ")
            .as("text"))
      val q = streaming.EventStream.corpusIngest(docs, indexPath, verdictPath,
        tmp("lsh-ckpt2"), skipReplayed = true)
      Thread.sleep(runSec * 1000L)
      val rows = q.recentProgress.map(_.numInputRows).sum
      val secs = q.recentProgress.map(_.batchDuration).sum / 1000.0
      val n = q.recentProgress.length
      q.stop(); q.awaitTermination()
      results += "corpusIngestSkipReplayed" -> ((rows, if (secs > 0) secs else runSec.toDouble, n))
    }

    // ---- 2c. streaming semantic decontam (map-only literal-benchmark twin) -
    // the newest stream/batch twin: benchmark = the first 128 corpus
    // embeddings (eval-suite scale — the decontamSignals literal regime),
    // corpus = synthetic deterministic 64-dim vectors off the rate source.
    // Cos scatter keeps flags sparse (the decontam contract), so the number
    // measures the per-row fold cost, not sink volume.
    if (want("semanticDecontam")) locally {
      val bench = Tables.embeddings(spark, sfDir)
        .filter(col("vec_id") < 128)
        .select(col("vec_id"), col("embedding")).collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toSeq
      val dim = bench.head._2.length
      val vecs = rate(100000)
        .select(col("value").as("vec_id"),
          expr(s"transform(sequence(0, ${dim - 1}), " +
            "i -> cast((pmod(value * 31 + i * 17, 97) - 48) / 10.0 as float))")
            .as("embedding"))
      val q = streaming.EventStream.semanticDecontamStream(vecs, bench)
        .writeStream.format("noop")
        .option("checkpointLocation", tmp("semdec-ckpt"))
        .outputMode("append").start()
      Thread.sleep(runSec * 1000L)
      val rows = q.recentProgress.map(_.numInputRows).sum
      val secs = q.recentProgress.map(_.batchDuration).sum / 1000.0
      val n = q.recentProgress.length
      q.stop(); q.awaitTermination()
      results += "semanticDecontam" -> ((rows, if (secs > 0) secs else runSec.toDouble, n))
    }

    // ---- 2d. the same decontam through the BROADCAST batch operator --------
    // per micro-batch (foreachBatch → Similarity.semanticDecontam): the
    // benchmark-past-literal-regime form. Same fixture as 2c so the two
    // lines bracket the literal-vs-broadcast crossover at the eval-suite
    // scale (128 vectors — the literal fold's home turf; the broadcast
    // form's fixed per-batch overhead is the price being measured).
    if (want("semanticDecontamBroadcast")) locally {
      val benchDf = Tables.embeddings(spark, sfDir)
        .filter(col("vec_id") < 128)
        .select(col("vec_id"), col("embedding")).localCheckpoint(true)
      val dim = benchDf.select(size(col("embedding"))).head.getInt(0)
      val vecs = rate(100000)
        .select(col("value").as("vec_id"),
          expr(s"transform(sequence(0, ${dim - 1}), " +
            "i -> cast((pmod(value * 31 + i * 17, 97) - 48) / 10.0 as float))")
            .as("embedding"))
      val q = streaming.EventStream.semanticDecontamIngest(vecs, benchDf,
        tmp("semdecb-out") + "/flags", tmp("semdecb-ckpt"))
      Thread.sleep(runSec * 1000L)
      val rows = q.recentProgress.map(_.numInputRows).sum
      val secs = q.recentProgress.map(_.batchDuration).sum / 1000.0
      val n = q.recentProgress.length
      q.stop(); q.awaitTermination()
      results += "semanticDecontamBroadcast" -> ((rows, if (secs > 0) secs else runSec.toDouble, n))
    }

    // ---- 2e. perceptual-hash media ingest (r13, VERDICT #4) -----------------
    // the IMAGE twin through the same resident-curve knob: resident =
    // the mm fixture family rendered over the (amplified) doc ids,
    // stream = fresh ids alternating verbatim-pattern re-offers and a
    // different coefficient family (the ScaleProbe novel rule — the
    // resident generators are periodic in src, so only a different
    // family is genuinely novel). Throughput is probe-join bound.
    if (want("mediaIngest")) locally {
      import graft.multimodal.{Multimodal, PngCodec}
      val indexPath = tmp("phash-idx") + "/idx"
      val verdictPath = tmp("phash-verd") + "/v"
      def px(src: Long, novel: Boolean): Array[Int] = Array.tabulate(256) { p =>
        (if (novel) ((src * 53 + (p % 16) * 11 + (p / 16) * 5 + 3) % 256).toInt
         else ((src * 31 + (p % 16) * 7 + (p / 16) * 13) % 256).toInt)
      }
      val resident = residentDocs(spark).select(col("doc_id")).as[Long]
        .filter((id: Long) => id % 7 == 0)
        .map(id => Multimodal.MediaRow(id, "image",
          PngCodec.encodeGray(px(id, novel = false), 16, 16)))
      graft.multimodal.PhashIndex.build(spark, resident, indexPath)
      val media = rate(500)
        .select((col("value") + 30000000000L).as("doc_id"), col("value"))
        .as[(Long, Long)]
        .map { case (id, v) =>
          Multimodal.MediaRow(id, "image",
            PngCodec.encodeGray(px(v * 7, novel = v % 2 == 1), 16, 16))
        }.toDF()
      val q = streaming.EventStream.mediaIngest(media, indexPath, verdictPath,
        tmp("phash-ckpt"))
      Thread.sleep(runSec * 1000L)
      val rows = q.recentProgress.map(_.numInputRows).sum
      val secs = q.recentProgress.map(_.batchDuration).sum / 1000.0
      val n = q.recentProgress.length
      q.stop(); q.awaitTermination()
      results += "mediaIngest" -> ((rows, if (secs > 0) secs else runSec.toDouble, n))
    }

    // ---- 3. versioned CDC commits ------------------------------------------
    if (want("versionedCdc")) locally {
      val storePath = tmp("vstore") + "/store"
      sources.VersionedStore.init(spark,
        Tables.documents(spark, sfDir), storePath, nBuckets = 64)
      val changes = rate(5000)
        .select(pmod(col("value"), lit(200000L)).as("doc_id"),
          when(pmod(col("value"), lit(17L)) === 0, "D").otherwise("U").as("op"),
          col("value").as("seq"),
          concat(lit("updated "), col("value")).as("text"),
          lit("en").as("lang"), lit("stream").as("source"),
          length(concat(lit("updated "), col("value"))).cast("long").as("n_chars"))
      val q = streaming.EventStream.versionedCdc(changes, storePath, tmp("cdc-ckpt"))
      Thread.sleep(runSec * 1000L)
      val rows = q.recentProgress.map(_.numInputRows).sum
      val secs = q.recentProgress.map(_.batchDuration).sum / 1000.0
      val n = q.recentProgress.length
      q.stop(); q.awaitTermination()
      results += "versionedCdc" -> ((rows, if (secs > 0) secs else runSec.toDouble, n))
    }

    val flows = results.map { case (k, (rows, sec, batches)) =>
      val rps = if (sec > 0) rows / sec else 0.0
      val extra = extras.getOrElse(k, "")
      s""""$k":{"rows":$rows,"sec":${f"$sec%.1f"},"rows_per_sec":${f"$rps%.0f"},"batches":$batches$extra}"""
    }.mkString("{", ",", "}")
    println(s"""{"metric":"stream_rows_per_sec","flows":$flows,"sf":"$sfDir","run_sec":$runSec,"cpus":$cpus}""")
    spark.stop()
  }
}
