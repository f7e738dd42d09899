package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout for multi-dimensional scan pruning —
  * the missing half of partition pruning at 100 TB.
  *
  * A corpus laid out by ingest time prunes time predicates and nothing
  * else: a `user_id BETWEEN` scan reads EVERY file because every file's
  * (min, max) user_id stats span the whole domain. Interleaving the bits
  * of two columns into one sort key clusters rows so each written file
  * covers a small RECTANGLE of the (c1, c2) space — each file's parquet
  * footer then carries tight min/max on BOTH columns, and Spark's
  * row-group pruning skips most files for a selective predicate on EITHER
  * dimension (the layout idea behind Delta Lake's `OPTIMIZE ZORDER BY` and
  * the Z-region concept from Morton 1966). Layout only: the rows, their
  * values, and every query answer are unchanged — pinned by the
  * `ev_zorder_scan` oracle, which must match the raw table byte-for-byte.
  *
  * Bucketing here is linear min/max scaling (one bounded aggregate job —
  * two longs per column to the driver). Heavily skewed columns would
  * crowd into few buckets; the skew-robust refinement is rank-based
  * bucketing (range-partition ids from approximate quantiles, as Delta
  * does) — same interleave, different normalizer.
  */
object ZOrder {

  /** Bit-interleave two already-bucketed long columns (each in
    * [0, 2^bits)): a's bit i lands at position 2i, b's at 2i+1. Unrolled
    * into `bits` native shift/mask/or expressions — stays inside
    * whole-stage codegen, no UDF.
    */
  def interleaveBits(a: Column, b: Column, bits: Int): Column =
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i))
        .bitwiseOR(shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }

  /** The z-value of two numeric columns given their domain bounds: linear
    * scale into [0, 2^bits), then interleave. Degenerate domains
    * (min == max) collapse to bucket 0 rather than dividing by zero.
    */
  def zValue(c1: Column, lo1: Double, hi1: Double,
      c2: Column, lo2: Double, hi2: Double, bits: Int = 12): Column = {
    val top = (1L << bits) - 1
    def bucket(c: Column, lo: Double, hi: Double): Column =
      if (hi <= lo) lit(0L)
      else least(lit(top), greatest(lit(0L),
        ((c.cast("double") - lit(lo)) * top / (hi - lo)).cast("long")))
    interleaveBits(bucket(c1, lo1, hi1), bucket(c2, lo2, hi2), bits)
  }

  /** Write `df` as parquet z-ordered on (c1, c2): one bounded min/max
    * aggregate, range-partition by z (so file k holds a contiguous z-run —
    * a compact region of the plane), sort within partitions by z (tight
    * row-group stats inside each file too). `nFiles` sizes the layout:
    * at cluster scale pick `rows / targetRowsPerFile`.
    */
  def writeZOrdered(df: DataFrame, path: String, c1: String, c2: String,
      nFiles: Int = 64, bits: Int = 12): Unit = {
    val Array(row) = df.agg(
      min(col(c1).cast("double")), max(col(c1).cast("double")),
      min(col(c2).cast("double")), max(col(c2).cast("double"))).collect()
    val z = zValue(col(c1), row.getDouble(0), row.getDouble(1),
      col(c2), row.getDouble(2), row.getDouble(3), bits)
    writeByZ(df, z, path, nFiles)
  }

  /** The skew-robust variant: buckets come from approximate QUANTILES of
    * each column instead of a linear min/max scale (the Delta
    * `range_partition_id` idea). On a heavy-hitter distribution linear
    * scaling crowds most rows into a handful of buckets — hot keys then
    * share every file with tail keys and the footer stats stop pruning;
    * rank bucketing gives hot keys their own bucket runs, so equality
    * predicates on them prune again. Cutpoints are a bounded driver
    * artifact (2 × (2^bits − 1) doubles); per-row assignment is a
    * binary-search codegen expression, not a 2^bits-branch when-chain.
    */
  def writeZOrderedRank(df: DataFrame, path: String, c1: String, c2: String,
      nFiles: Int = 64, bits: Int = 8, relErr: Double = 0.001): Unit = {
    val probs = (1 until (1 << bits)).map(_.toDouble / (1 << bits)).toArray
    // Duplicate cutpoints are KEPT deliberately: a heavy hitter owning p%
    // of the mass repeats across ~p% of the cutpoints, so its bucket
    // index (count of cutpoints ≤ value) lands proportional to its CDF
    // position — hot keys spread across the full bucket range and their
    // distinguishing bits sit at the interleave's significant positions.
    // Deduplicating would compress all hot keys into a few dense low
    // indexes whose differing bits fall below the per-file z-granularity,
    // and the layout would stop separating them.
    val Array(cut1, cut2) = df.stat.approxQuantile(
      Array(c1, c2), probs, relErr).map(_.sorted)
    val z = interleaveBits(
      bucketIdx(col(c1), cut1), bucketIdx(col(c2), cut2), bits)
    writeByZ(df, z, path, nFiles)
  }

  /** Bucket index of a value against sorted cutpoints (count of cutpoints
    * ≤ value) as a codegen'd binary-search expression.
    */
  def bucketIdx(c: Column, cutpoints: Array[Double]): Column = {
    import org.apache.spark.sql.GraftSqlBridge
    GraftSqlBridge.column(graft.functions.BucketIdx(
      GraftSqlBridge.expression(c.cast("double")), cutpoints))
  }

  private def writeByZ(df: DataFrame, z: Column, path: String, nFiles: Int): Unit =
    df.withColumn("_z", z)
      .repartitionByRange(nFiles, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_z")
      .write.mode(SaveMode.Overwrite).parquet(path)
}
