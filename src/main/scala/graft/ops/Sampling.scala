package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling / splitting / rebalancing — the selection stages
  * of a training-data pipeline. Everything is keyed on a cryptographic
  * hash of a STABLE key (not `rand()`, not row position), which buys the
  * three properties production corpora need:
  *  - reproducible: the same corpus always yields the same sample;
  *  - stable under growth: adding rows never changes an existing row's
  *    sample membership or split assignment (no reshuffling the eval set
  *    when the corpus is re-ingested);
  *  - engine-portable: md5 hex is identical everywhere, so the DuckDB
  *    oracle reproduces the exact row set bit-for-bit.
  *
  * The uniform draw is the md5's first 8 hex chars COMPARED AS STRINGS —
  * lowercase-hex lexicographic order equals numeric order, so thresholds
  * are hex-string literals and neither engine parses hex integers (DuckDB
  * has no conv()). All three ops are map-only filters/projections except
  * the cap, which rides the bounded native top-k aggregate.
  */
object Sampling {

  /** First 8 hex chars of md5("graft|" + key) — the per-row uniform draw.
    * The salt keeps the draw independent of other md5 uses of the same key
    * (e.g. exact-dedup hashes).
    */
  def hashDraw(key: Column): Column =
    substring(md5(concat(lit("graft|"), key.cast("string"))), 1, 8)

  /** Deterministic ~fraction sample: keep rows whose draw falls below the
    * hex threshold. `fracHex` is floor(fraction · 16⁸) as 8 lowercase hex
    * chars — e.g. "33333333" ≈ 0.2, "80000000" = 0.5.
    */
  def hashSample(df: DataFrame, key: Column, fracHex: String): DataFrame =
    df.filter(hashDraw(key) < lit(fracHex))

  /** Stable train/validation/test assignment from the same draw: 2-hex-char
    * prefix buckets (256 of them) split at the given boundaries — defaults
    * "cc"/"e6" give 204/26/26 buckets ≈ 79.7% / 10.2% / 10.2%. A row's
    * split is a pure function of its key: re-ingesting or growing the
    * corpus never moves a row between splits (no eval-set contamination).
    */
  def assignSplits(df: DataFrame, key: Column,
      valBoundary: String = "cc", testBoundary: String = "e6"): DataFrame = {
    val prefix = substring(hashDraw(key), 1, 2)
    df.withColumn("split",
      when(prefix < valBoundary, "train")
        .when(prefix < testBoundary, "val")
        .otherwise("test"))
  }

  /** Per-group cap: keep the `cap` lowest-id rows of each group — class
    * rebalancing (a dominant language/source must not drown the corpus).
    * Rides the bounded native top-k aggregate (value = −id ⇒ lowest ids
    * win): ≤2·cap rows buffered per group on any executor and ≤cap rows
    * per (partition, group) into the shuffle — a 10⁹-row group never
    * sorts in one task, unlike the row_number window form the oracle uses.
    * Ids must be exact in a Double (< 2⁵³ — true for every table here).
    */
  def capPerGroup(df: DataFrame, groupCol: String, idCol: String, cap: Int): DataFrame =
    df.groupBy(col(groupCol))
      .agg(graft.functions.TopKAggregator.topK(cap, -col(idCol).cast("double"), col(idCol))
        .as("top"))
      .select(col(groupCol), explode(col("top")).as("t"))
      .select(col(groupCol), col("t.id").as(idCol))
      .orderBy(col(groupCol), col(idCol))
}
