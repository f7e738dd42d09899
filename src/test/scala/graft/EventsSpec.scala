package graft

import org.apache.spark.sql.functions._
import graft.ops.{Events, Relational}

/** Tolerance asserts for the sketch aggregates (VERDICT r4 #2): sketches
  * can't hash-match a different engine by design, so the driver records
  * them rows-only — these asserts bind them to their EXACT twins instead.
  * Bounds are ~4-5× the sketch's nominal error so they fail on a broken
  * sketch, never on sketch variance.
  */
class EventsSpec extends SparkSpec {

  test("windowed funnel: steps convert only inside the deadline, earliest in-window wins") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      // A: every step inside the 60-min window → fully converted
      (1L, ts("2024-01-01 10:00:00"), 1L, "view"),
      (2L, ts("2024-01-01 10:10:00"), 1L, "click"),
      (3L, ts("2024-01-01 10:30:00"), 1L, "purchase"),
      // B: click 2h after the view → window kills step 2 (and thus 3)
      (4L, ts("2024-01-01 09:00:00"), 2L, "view"),
      (5L, ts("2024-01-01 11:00:01"), 2L, "click"),
      (6L, ts("2024-01-01 11:10:00"), 2L, "purchase"),
      // C: has a too-late click AND a qualifying one — the in-window
      // earliest wins, and the purchase window anchors on IT
      (7L, ts("2024-01-01 08:00:00"), 3L, "view"),
      (8L, ts("2024-01-01 08:30:00"), 3L, "click"),
      (9L, ts("2024-01-01 09:20:00"), 3L, "click"),
      (10L, ts("2024-01-01 09:40:00"), 3L, "purchase")) // 70min after first click
      .toDF("event_id", "ts", "user_id", "event_type")
    val got = Events.funnelWindowed(ev, Seq("view", "click", "purchase"), 60L)
      .collect().map(r => r.getLong(0) ->
        ((Option(r.getString(1)), Option(r.getString(2)), Option(r.getString(3))))).toMap
    assert(got(1L) == ((Some("2024-01-01 10:00:00"), Some("2024-01-01 10:10:00"),
      Some("2024-01-01 10:30:00"))))
    assert(got(2L)._2.isEmpty && got(2L)._3.isEmpty,
      "a step past the deadline must not convert, nor anything after it")
    assert(got(3L) == ((Some("2024-01-01 08:00:00"), Some("2024-01-01 08:30:00"), None)),
      "the earliest in-window click anchors step 3's window, which the purchase misses")
    // the unbounded funnel DOES convert user 2 and 3 fully — the window
    // is what changes the answer
    val unbounded = Events.funnel(ev, Seq("view", "click", "purchase")).collect()
      .map(r => r.getLong(0) -> Option(r.getString(3))).toMap
    assert(unbounded(2L).nonEmpty && unbounded(3L).nonEmpty)
  }

  test("conversion latency: as-of view per purchase, exact microsecond quantiles, no-view drops") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      // user 1: view at :00, purchase at :10 → 10s; a LATER view must not count
      (1L, ts("2024-01-01 10:00:00"), 1L, "view"),
      (2L, ts("2024-01-01 10:00:10"), 1L, "purchase"),
      (3L, ts("2024-01-01 10:00:20"), 1L, "view"),
      // user 2: two views, purchase converts from the most RECENT one → 30s
      (4L, ts("2024-01-01 09:00:00"), 2L, "view"),
      (5L, ts("2024-01-01 09:30:00"), 2L, "view"),
      (6L, ts("2024-01-01 09:30:30"), 2L, "purchase"),
      // user 3: purchase with NO prior view — never converts, drops out
      (7L, ts("2024-01-01 08:00:00"), 3L, "purchase"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val got = Events.conversionLatency(ev, Seq(0.0, 0.5, 1.0)).collect()
      .map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    assert(got(0.0) == 10000000.0 && got(1.0) == 30000000.0,
      "min = user 1's 10s, max = user 2's 30s from the most recent view, user 3 absent")
    assert(got(0.5) == 20000000.0, "median interpolates the two latencies")
  }

  test("HLL user counts land within rsd-derived bounds of exact countDistinct") {
    val events = Tables.events(spark, sf)
    // rsd = 0.02 (the registered query's setting); assert 4σ relative error.
    val approx = Events.approxUserCounts(events).collect()
      .map(r => r.getAs[String]("event_type") -> r.getAs[Long]("approx_users")).toMap
    val exact = events.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("exact_users")).collect()
      .map(r => r.getAs[String]("event_type") -> r.getAs[Long]("exact_users")).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (tpe, ex) =>
      val ap = approx(tpe)
      val relErr = math.abs(ap - ex).toDouble / ex
      assert(relErr <= 4 * 0.02,
        s"event_type=$tpe: HLL estimate $ap vs exact $ex (rel err $relErr > 8%)")
    }
  }

  test("approx quantiles sit at ranks within tolerance of their targets") {
    val events = Tables.events(spark, sf)
    // approx_percentile(accuracy=1000) ⇒ nominal rank error 1e-3; assert a
    // 10× margin by recomputing each estimate's TRUE rank in its group.
    val approx = Events.approxValueQuantiles(events).collect()
      .map(r => r.getAs[String]("event_type") ->
        Seq(0.5 -> r.getAs[Double]("p50"), 0.9 -> r.getAs[Double]("p90"),
          0.99 -> r.getAs[Double]("p99"))).toMap
    val tol = 0.01
    approx.foreach { case (tpe, qs) =>
      val grp = events.filter(col("event_type") === tpe).select(col("value").cast("double"))
      val n = grp.count().toDouble
      qs.foreach { case (q, est) =>
        val nLe = grp.filter(col("value") <= est).count().toDouble
        val nLt = grp.filter(col("value") < est).count().toDouble
        // the estimate's rank interval [nLt/n, nLe/n] must overlap q ± tol
        assert(nLe / n >= q - tol && nLt / n <= q + tol,
          s"event_type=$tpe q=$q: estimate $est has rank in " +
            s"[${nLt / n}, ${nLe / n}], outside $q ± $tol")
      }
    }
  }

  test("sketch quantile estimates agree with the exact distributed engine's values") {
    val events = Tables.events(spark, sf)
    // Cross-check the p50 estimate against exactQuantilesDistributed (the
    // scale-honest exact tier): the sketch median must fall between the
    // exact interpolated quantiles at 0.5 ∓ 10·nominal rank error.
    val lo = Relational.exactQuantilesDistributed(events, "event_type", "value", Seq(0.49))
      .collect().map(r => r.getAs[String]("event_type") -> r.getAs[Double]("quantile")).toMap
    val hi = Relational.exactQuantilesDistributed(events, "event_type", "value", Seq(0.51))
      .collect().map(r => r.getAs[String]("event_type") -> r.getAs[Double]("quantile")).toMap
    Events.approxValueQuantiles(events).collect().foreach { r =>
      val tpe = r.getAs[String]("event_type")
      val p50 = r.getAs[Double]("p50")
      assert(p50 >= lo(tpe) && p50 <= hi(tpe),
        s"event_type=$tpe: sketch p50 $p50 outside exact [${lo(tpe)}, ${hi(tpe)}]")
    }
  }

  test("Misra-Gries sketch: superset of true heavy hitters, one-sided bounded undercount") {
    import spark.implicits._
    import graft.functions.MisraGries
    // Skewed fixture: word w_i appears 2^i times, i = 0..9 (n = 1023),
    // shuffled across 8 partitions so reduce AND merge both evict.
    val toks = (0 until 10).flatMap(i => Seq.fill(1 << i)(s"w$i"))
    val docs = new scala.util.Random(7).shuffle(toks)
      .zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("doc_id", "text").repartition(8)
    val capacity = 4
    val n = toks.size.toLong
    val bound = n / (capacity + 1) // 204
    val sketch = MisraGries.sketchWords(docs, capacity).collect()
      .map(r => r.getAs[String]("word") -> r.getAs[Long]("est_n")).toMap
    val exact = toks.groupBy(identity).map { case (w, ws) => w -> ws.size.toLong }

    assert(sketch.size <= capacity, "state must stay within capacity")
    exact.filter(_._2 > bound).keys.foreach(w =>
      assert(sketch.contains(w), s"true heavy hitter $w (n=${exact(w)}) must survive"))
    sketch.foreach { case (w, est) =>
      assert(est <= exact(w), s"$w: sketch must never overcount")
      assert(exact(w) - est <= bound, s"$w: undercount ${exact(w) - est} exceeds n/(c+1)=$bound")
    }

    // When the vocabulary fits the capacity, the sketch IS the exact
    // count — run it over the real corpus (31 distinct words, cap 64).
    val corpus = Tables.documents(spark, sf)
    val full = MisraGries.sketchWords(corpus, 64).collect()
      .map(r => r.getAs[String]("word") -> r.getAs[Long]("est_n")).toMap
    val corpusExact = corpus.select(explode(split(col("text"), " ")).as("word"))
      .groupBy("word").count().collect()
      .map(r => r.getAs[String]("word") -> r.getAs[Long]("count")).toMap
    assert(full == corpusExact, "no-eviction sketch must equal the exact counts")
  }

  test("resampleHourly fills empty hours with zeros and carries the last observed sum forward") {
    import spark.implicits._
    val ev = Seq(
      ("a", "2024-01-01 00:10:00", 2.0),
      ("a", "2024-01-01 00:40:00", 3.0),
      // hour 01 empty for a
      ("a", "2024-01-01 02:05:00", 7.0),
      ("b", "2024-01-01 01:30:00", 1.0)
      // b missing hours 00 and 02
    ).toDF("event_type", "ts_s", "value")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
    val got = graft.ops.Events.resampleHourly(ev).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3), Option(r.get(4)).map(_.asInstanceOf[Double]))))
      .toMap
    assert(got.size === 6, s"2 types × 3 hours expected, got ${got.keySet}")
    assert(got(("a", "2024-01-01 00:00:00")) == ((2L, 5.0, Some(5.0))))
    assert(got(("a", "2024-01-01 01:00:00")) == ((0L, 0.0, Some(5.0))),
      "empty hour must zero-fill the sum and carry the last observation")
    assert(got(("a", "2024-01-01 02:00:00")) == ((1L, 7.0, Some(7.0))))
    assert(got(("b", "2024-01-01 00:00:00")) == ((0L, 0.0, None)),
      "hours before the first observation stay null in the LOCF column")
    assert(got(("b", "2024-01-01 01:00:00")) == ((1L, 1.0, Some(1.0))))
    assert(got(("b", "2024-01-01 02:00:00")) == ((0L, 0.0, Some(1.0))))
  }

  test("funnel enforces strict step order and carries NULLs from the drop-out stage") {
    import spark.implicits._
    val ev = Seq(
      // user 1: full funnel in order
      (1L, "view", "2024-01-01 10:00:00"),
      (1L, "click", "2024-01-01 10:05:00"),
      (1L, "purchase", "2024-01-01 10:10:00"),
      // user 2: clicked BEFORE viewing — click must not count; no purchase
      (2L, "click", "2024-01-01 09:00:00"),
      (2L, "view", "2024-01-01 09:30:00"),
      // user 3: view then purchase but never clicked — purchase must not count
      (3L, "view", "2024-01-01 08:00:00"),
      (3L, "purchase", "2024-01-01 08:30:00"),
      // user 4: never viewed — not in the funnel at all
      (4L, "purchase", "2024-01-01 07:00:00"),
      // user 5: two views; the EARLIEST anchors the funnel
      (5L, "view", "2024-01-01 06:00:00"),
      (5L, "view", "2024-01-01 06:30:00"),
      (5L, "click", "2024-01-01 06:10:00")
    ).toDF("user_id", "event_type", "ts_s")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
    val got = graft.ops.Events.funnel(ev, Seq("view", "click", "purchase")).collect()
      .map(r => r.getLong(0) ->
        ((Option(r.getString(1)), Option(r.getString(2)), Option(r.getString(3))))).toMap
    assert(got.keySet === Set(1L, 2L, 3L, 5L))
    assert(got(1L) == ((Some("2024-01-01 10:00:00"),
      Some("2024-01-01 10:05:00"), Some("2024-01-01 10:10:00"))))
    assert(got(2L) == ((Some("2024-01-01 09:30:00"), None, None)),
      "a click before the first view must not advance the funnel")
    assert(got(3L) == ((Some("2024-01-01 08:00:00"), None, None)),
      "a purchase without a prior click must not advance the funnel")
    assert(got(5L) == ((Some("2024-01-01 06:00:00"),
      Some("2024-01-01 06:10:00"), None)),
      "the earliest view anchors; the click between the two views counts")
  }

  test("cohort retention: signup-week anchors, pre-signup activity excluded, exact rates") {
    import spark.implicits._
    // week of 2024-01-01 is a Monday-anchored week
    val ev = Seq(
      (1L, "signup", "2024-01-01 10:00:00"), // cohort W0, active W0 + W1
      (1L, "view", "2024-01-08 10:00:00"),
      (2L, "signup", "2024-01-02 10:00:00"), // cohort W0, active only W0
      (2L, "view", "2023-12-28 10:00:00"), // pre-signup activity: ignored
      (3L, "view", "2024-01-01 09:00:00") // never signed up: not in any cohort
    ).toDF("user_id", "event_type", "ts_s")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
    val got = graft.ops.Events.cohortRetention(ev).collect()
      .map(r => (r.getDate(0).toString, r.getInt(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(got.keySet === Set(("2024-01-01", 0), ("2024-01-01", 1)))
    assert(got(("2024-01-01", 0)) == ((2L, 2L, 1.0)),
      "both cohort members are active in week 0 (the signup itself counts)")
    assert(got(("2024-01-01", 1)) == ((1L, 2L, 0.5)))
  }

  test("rolling WAU: a user counts for exactly the trailing window, gap days included") {
    import spark.implicits._
    val ev = Seq(
      (1L, "2024-01-01 10:00:00"),
      (2L, "2024-01-01 11:00:00"),
      (1L, "2024-01-10 09:00:00") // gap: days 02-09 have no events
    ).toDF("user_id", "ts_s")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
      .withColumn("event_type", lit("view")).withColumn("event_id", col("user_id"))
    val got = graft.ops.Events.rollingActiveUsers(ev, windowDays = 7).collect()
      .map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    assert(got.size === 10, "every calendar day of the extent must appear")
    (1 to 7).foreach(d => assert(got(f"2024-01-$d%02d") === 2L,
      s"both day-1 users are visible through day $d"))
    assert(got("2024-01-08") === 0L, "day-1 activity expires after 7 days")
    assert(got("2024-01-09") === 0L)
    assert(got("2024-01-10") === 1L)
  }

  test("transition matrix: per-user ordering, event_id tie-break, rows sum to 1 per from-state") {
    import spark.implicits._
    val ev = Seq(
      // user 1: view -> click -> purchase (by ts)
      (1L, 1L, "view", "2024-01-01 10:00:00"),
      (2L, 1L, "click", "2024-01-01 10:01:00"),
      (3L, 1L, "purchase", "2024-01-01 10:02:00"),
      // user 2: two events at the SAME ts — event_id breaks the tie
      (4L, 2L, "view", "2024-01-01 09:00:00"),
      (5L, 2L, "error", "2024-01-01 09:00:00"),
      // user 3: single event — contributes no transition
      (6L, 3L, "view", "2024-01-01 08:00:00")
    ).toDF("event_id", "user_id", "event_type", "ts_s")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
    val got = graft.ops.Events.transitionMatrix(ev).collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getDouble(3)))).toMap
    assert(got === Map(
      ("view", "click") -> ((1L, 0.5)),
      ("view", "error") -> ((1L, 0.5)),
      ("click", "purchase") -> ((1L, 1.0))))
    // real corpus: probabilities per from_type sum to 1
    val real = graft.ops.Events.transitionMatrix(Tables.events(spark, sf))
    val sums = real.groupBy(col("from_type")).agg(sum(col("p")).as("s"))
      .collect().map(r => r.getString(0) -> r.getDouble(1))
    sums.foreach { case (t, s) =>
      assert(math.abs(s - 1.0) < 1e-9, s"$t transition row sums to $s") }
  }

  test("HLL sketch cube: merged per-day sketches estimate EXACTLY like one sketch over the range") {
    val events = Tables.events(spark, sf)
    val dir = java.nio.file.Files.createTempDirectory("graft-hllcube").toString + "/cube"
    graft.ops.Events.buildDistinctSketchCube(events, dir)
    val served = graft.ops.Events
      .approxUsersOverRange(spark, dir, "2024-01-01", "2024-12-31")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // one sketch straight over the raw range — HLL registers are
    // order-independent maxima, so the union must be lossless
    val direct = events.groupBy(col("event_type"))
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"), lit(14))).as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(served === direct, s"union-served $served diverged from direct $direct")
    // and the estimate is within HLL error of the exact distinct count
    // (rsd ≈ 1.04/√2^14 ≈ 0.8%; assert a 5σ-ish 5% band)
    val exact = events.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    served.foreach { case (t, est) =>
      assert(math.abs(est - exact(t)) / exact(t).toDouble <= 0.05,
        s"$t: estimate $est vs exact ${exact(t)} outside the HLL error band")
    }
  }

  test("HLL sketch cube: appending a day adds partitions without touching resident files") {
    val events = Tables.events(spark, sf)
    val lastDay = events.select(max(to_date(col("ts")))).head.getDate(0).toString
    val resident = events.filter(to_date(col("ts")) < lit(lastDay))
    val incoming = events.filter(to_date(col("ts")) === lit(lastDay))
    val dir = java.nio.file.Files.createTempDirectory("graft-hllinc").toString + "/cube"
    graft.ops.Events.buildDistinctSketchCube(resident, dir)
    def files(): Map[String, Long] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk) else Seq(f)
      walk(new java.io.File(dir)).filter(_.getName.endsWith(".parquet"))
        .map(f => f.getAbsolutePath -> f.lastModified()).toMap
    }
    val before = files()
    graft.ops.Events.appendDaySketches(incoming, dir)
    val after = files()
    assert(before.forall { case (p, m) => after.get(p).contains(m) },
      "resident day files must be untouched by an append")
    assert(after.size > before.size, "the new day must add files")
    // served range over everything == a cube built from scratch
    val full = java.nio.file.Files.createTempDirectory("graft-hllfull").toString + "/cube"
    graft.ops.Events.buildDistinctSketchCube(events, full)
    val a = graft.ops.Events.approxUsersOverRange(spark, dir, "2024-01-01", "2024-12-31")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val b = graft.ops.Events.approxUsersOverRange(spark, full, "2024-01-01", "2024-12-31")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(a === b)
    // replaying an already-resident day must fail loud: HLL registers are
    // idempotent but the n_events sums would silently double
    val e = intercept[IllegalArgumentException] {
      graft.ops.Events.appendDaySketches(incoming, dir)
    }
    assert(e.getMessage.contains("replay"))
    // ...and the explicit correction door re-lands the day cleanly: the
    // cube still equals the from-scratch build afterwards
    graft.ops.Events.rebuildDaySketches(incoming, dir)
    val c = graft.ops.Events.approxUsersOverRange(spark, dir, "2024-01-01", "2024-12-31")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val d2 = graft.ops.Events.approxUsersOverRange(spark, full, "2024-01-01", "2024-12-31")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(c === d2, "rebuilt cube must equal a from-scratch build (incl. n_events)")
  }

  test("HLL sketch cube: a range query prunes to the range's day partitions") {
    val events = Tables.events(spark, sf)
    val dir = java.nio.file.Files.createTempDirectory("graft-hllprune").toString + "/cube"
    graft.ops.Events.buildDistinctSketchCube(events, dir)
    // the same pruned scan approxUsersOverRange builds, pre-aggregation so
    // input_file_name() is still row-attributable
    val scanned = spark.read.parquet(dir)
      .filter(col("day").between("2024-01-05", "2024-01-07"))
      .select(input_file_name()).distinct().collect().map(_.getString(0))
    assert(scanned.nonEmpty &&
      scanned.forall(f => f.contains("day=2024-01-05") || f.contains("day=2024-01-06") ||
        f.contains("day=2024-01-07")),
      s"scan leaked outside the range: ${scanned.mkString(", ")}")
  }
}
