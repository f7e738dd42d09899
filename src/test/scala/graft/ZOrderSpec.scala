package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import graft.sources.ZOrder

class ZOrderSpec extends SparkSpec {

  test("interleaveBits: hand-computed Morton codes") {
    import spark.implicits._
    // a=0b101 → bits at even positions 0,4 → 0b010001; b=0b011 → bits at
    // odd positions 1,3 → 0b001010; z = 0b011011 = 27.
    val out = Seq((5L, 3L)).toDF("a", "b")
      .select(ZOrder.interleaveBits(col("a"), col("b"), 3).as("z"))
      .head().getLong(0)
    assert(out == 27L)
    // Morton order is monotone per dimension when the other is fixed.
    val zs = (0L to 7L).map(a => Seq((a, 2L)).toDF("a", "b")
      .select(ZOrder.interleaveBits(col("a"), col("b"), 3)).head().getLong(0))
    assert(zs == zs.sorted && zs.distinct.size == 8)
  }

  test("interleaveBits matches a reference Morton implementation and is injective") {
    import spark.implicits._
    def ref(a: Long, b: Long, bits: Int): Long =
      (0 until bits).foldLeft(0L) { (acc, i) =>
        acc | (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1))
      }
    // Deterministic scatter over the full 12-bit × 12-bit plane.
    val pairs = (0L until 4000L).map(i =>
      ((i * 48271L) % 4096L, (i * 16807L) % 4096L)).distinct
    val got = pairs.toDF("a", "b")
      .select(col("a"), col("b"), ZOrder.interleaveBits(col("a"), col("b"), 12).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    pairs.foreach { case (a, b) =>
      assert(got((a, b)) == ref(a, b, 12), s"mismatch at ($a, $b)")
    }
    assert(got.values.toSeq.distinct.size == pairs.size, "z-codes must be injective")
  }

  private def fixture: DataFrame = {
    import spark.implicits._
    // Deterministic scatter: id steps by a large odd constant mod the
    // domain, so (uid, v) pairs spray across the plane like real traffic.
    (0L until 50000L).map { i =>
      (i, (i * 2654435761L) % 1024L, ((i * 40503L) % 100000L).toDouble / 100.0)
    }.toDF("event_id", "user_id", "value")
  }

  private def scanRows(df: DataFrame): Long = {
    df.collect()
    df.queryExecution.executedPlan
      .collect { case s: FileSourceScanExec => s }
      .map(_.metrics("numOutputRows").value).sum
  }

  test("z-ordered layout: content identical, both dimensions prune the scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft-zorder").toString
    val df = fixture
    ZOrder.writeZOrdered(df, s"$dir/z", "user_id", "value", nFiles = 64)
    // Control layout: sorted by the UNRELATED key — every file spans the
    // full (user_id, value) domain, so min/max stats prune nothing.
    df.repartitionByRange(64, col("event_id"))
      .sortWithinPartitions(col("event_id"))
      .write.parquet(s"$dir/linear")

    // Content roundtrip: not one row lost, duplicated, or altered.
    val back = spark.read.parquet(s"$dir/z")
    assert(back.count() == 50000L)
    assert(back.exceptAll(df).isEmpty && df.exceptAll(back).isEmpty)

    // A selective predicate on EITHER dimension must read far fewer rows
    // from the z-layout (row-group stats pruning) than from the control.
    for (pred <- Seq(
        col("user_id").between(100, 163),     // ~1/16 of dimension 1
        col("value") >= 937.5)) {             // ~1/16 of dimension 2
      val zRows = scanRows(spark.read.parquet(s"$dir/z").filter(pred))
      val linRows = scanRows(spark.read.parquet(s"$dir/linear").filter(pred))
      val zAns = spark.read.parquet(s"$dir/z").filter(pred)
        .orderBy(col("event_id")).collect().toSeq
      val linAns = spark.read.parquet(s"$dir/linear").filter(pred)
        .orderBy(col("event_id")).collect().toSeq
      assert(zAns == linAns, "layouts disagree on the answer")
      assert(linRows == 50000L, s"control layout unexpectedly pruned: $linRows")
      assert(zRows * 2 < linRows,
        s"z-layout failed to prune: scanned $zRows of $linRows for $pred")
    }
  }

  test("rank-bucketed z-order: hot-key equality predicates prune where linear bucketing cannot") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-zorder-r").toString
    // Heavy-hitter distribution: 10 hot user_ids carry 90% of the rows,
    // a uniform tail stretches the domain to ~1e9 — linear min/max
    // scaling crowds every hot id into bucket 0.
    val df = (0L until 50000L).map { i =>
      val uid = if (i < 45000L) i % 10L else 10L + (i * 7919L) % 999999989L
      (i, uid, ((i * 40503L) % 100000L).toDouble / 100.0)
    }.toDF("event_id", "user_id", "value")
    ZOrder.writeZOrdered(df, s"$dir/lin", "user_id", "value", nFiles = 64)
    ZOrder.writeZOrderedRank(df, s"$dir/rank", "user_id", "value", nFiles = 64)

    val pred = col("user_id") === 3L // one hot id: 4500 of 50000 rows
    val linAns = spark.read.parquet(s"$dir/lin").filter(pred)
      .orderBy(col("event_id")).collect().toSeq
    val rankAns = spark.read.parquet(s"$dir/rank").filter(pred)
      .orderBy(col("event_id")).collect().toSeq
    assert(linAns == rankAns && rankAns.size == 4500)

    val linRows = scanRows(spark.read.parquet(s"$dir/lin").filter(pred))
    val rankRows = scanRows(spark.read.parquet(s"$dir/rank").filter(pred))
    // Linear layout: every hot row shares bucket 0, so files mix all ten
    // hot ids and their stats cannot exclude id 3 — most hot rows scan.
    assert(linRows > 25000L, s"fixture no longer skew-degrades linear bucketing: $linRows")
    // Rank layout: id 3 owns its own bucket run — near-minimal scan.
    assert(rankRows < 15000L, s"rank bucketing failed to isolate the hot key: $rankRows")
    assert(rankRows * 3 < linRows, s"no separation: rank=$rankRows lin=$linRows")
  }

  test("bucketIdx: binary search matches the counting definition, ties go high") {
    import spark.implicits._
    import org.apache.spark.sql.GraftSqlBridge
    val cuts = Array(1.0, 3.0, 3.0, 7.5, 100.0)
    val expr = graft.functions.BucketIdx(
      GraftSqlBridge.expression(col("v")), cuts)
    val vals = Seq(-5.0, 1.0, 2.0, 3.0, 5.0, 7.5, 99.0, 100.0, 1e9)
    val got = vals.toDF("v").select(GraftSqlBridge.column(expr).as("b"))
      .collect().map(_.getLong(0)).toSeq
    val want = vals.map(v => cuts.count(_ <= v).toLong)
    assert(got == want)
    vals.foreach(v => assert(expr.bucketOf(v) == cuts.count(_ <= v).toLong))
  }

  test("degenerate domain: constant column collapses to one bucket, no crash") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-zorder-c").toString
    val df = (0L until 100L).map(i => (i, 7L, i.toDouble)).toDF("event_id", "user_id", "value")
    ZOrder.writeZOrdered(df, s"$dir/z", "user_id", "value", nFiles = 4)
    val back = spark.read.parquet(s"$dir/z")
    assert(back.count() == 100L)
    assert(back.exceptAll(df).isEmpty && df.exceptAll(back).isEmpty)
  }
}
