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
