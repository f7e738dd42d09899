package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted perceptual-hash index + ingest gate for the IMAGE modality —
  * the third member of the ingest-gate family (text: `LshIndex.ingestBatch`,
  * vectors: `IvfIndex.dedupIngest`): a crawl keeps re-delivering the same
  * picture re-encoded, and the byte-exact CAS tier (`dedupStats`) cannot
  * see it.
  *
  * Layout:
  *   path/hashes — (doc_id, ahash, dhash): one row per resident image, the
  *     id gate's authority. Written FIRST on append, so an at-least-once
  *     replay trips the disjointness gate instead of double-appending
  *     derived rows (the LshIndex crash-ordering contract).
  *   path/probes — (probe, doc_id): each resident's aHash plus its 64
  *     one-bit flips — the Manku radius-2 probe family, PERSISTED so an
  *     arriving batch only expands its own side (the bands-table trade:
  *     65 short rows per image buys corpus-side-expansion-free serving).
  *
  * Gate tiers per batch, mirroring the text gate:
  *   1. id disjointness (fail fast — a collision would suppress a genuine
  *      dup verdict and persist a second row under the id);
  *   2. within-batch: identical aHash keeps the min-id copy (`batch_dup`);
  *   3. resident: batch probes equi-join the probe table, exact Hamming
  *      (codegen popcount) ≤ maxHamming against the resident aHash kills
  *      the offer (`near_dup`) — radius ≤ 2 candidacy is provably total;
  *   4. survivors append (hashes first, then probes) and are immediately
  *      visible to the NEXT batch (`ingested`).
  * Undecodable payloads pass through with verdict `undecodable` — the
  * gate must not silently drop rows it cannot judge.
  */
object PhashIndex {

  private def flipsOf(c: org.apache.spark.sql.Column) = {
    val flips = (0 until 64).map { i =>
      concat(substring(c, 1, i),
        when(substring(c, i + 1, 1) === "1", lit("0")).otherwise(lit("1")),
        substring(c, i + 2, 63 - i))
    }
    array((c +: flips): _*)
  }

  private def hamming(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) = {
    def half(c: org.apache.spark.sql.Column, off: Int) =
      conv(substring(c, off, 32), 2, 10).cast("long")
    (bit_count(half(a, 1).bitwiseXOR(half(b, 1))) +
      bit_count(half(a, 33).bitwiseXOR(half(b, 33)))).cast("int")
  }

  /** Create the index from an initial media corpus. */
  def build(spark: SparkSession, media: Dataset[Multimodal.MediaRow],
      path: String): Unit = {
    val hashes = Multimodal.imageHashes(media).toDF().localCheckpoint(true)
    hashes.write.mode(SaveMode.Overwrite).parquet(s"$path/hashes")
    hashes.select(explode(flipsOf(col("ahash"))).as("probe"), col("doc_id"))
      .write.mode(SaveMode.Overwrite).parquet(s"$path/probes")
  }

  /** Logical point deletes — image takedowns are the modality's most
    * common removal case. Same contract as the text/vector tiers: ids
    * append to a tombstone log, the gate's RESIDENT matching anti-joins it
    * (a deleted image stops vetoing new offers immediately), while the id
    * gate still sees the tombstoned row — deleted ids stay BURNED until
    * `compact` (delete → compact → append is the replacement path).
    */
  /** Open-time compact-swap crash recovery (see [[graft.sources.CompactSwap]]). */
  private def recover(spark: SparkSession, path: String): Unit =
    graft.sources.CompactSwap.recover(spark, path, Seq("probes", "hashes"))

  def delete(spark: SparkSession, path: String, ids: DataFrame): Unit = {
    recover(spark, path)
    ids.select(col("doc_id")).write.mode(SaveMode.Append)
      .parquet(s"$path/tombstones")
  }

  private def tombstones(spark: SparkSession, path: String): Option[DataFrame] = {
    val p = new org.apache.hadoop.fs.Path(s"$path/tombstones")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p))
      Some(spark.read.parquet(s"$path/tombstones").select(col("doc_id")).distinct())
    else None
  }

  private def dropTombstoned(spark: SparkSession, path: String,
      df: DataFrame): DataFrame =
    tombstones(spark, path) match {
      case Some(t) => df.join(broadcast(t), Seq("doc_id"), "left_anti")
      case None => df
    }

  /** Fold the tombstone log: rewrite both tables without the deleted docs
    * via the fresh-sibling-directory + rename swap (the LshIndex/IvfIndex
    * crash-safe pattern); `hashes` rewrites LAST so a mid-compaction crash
    * keeps deleted ids burned in the id gate (conservative failure), and
    * the log drops last of all.
    */
  def compact(spark: SparkSession, path: String): Unit = {
    recover(spark, path)
    if (tombstones(spark, path).isEmpty) return
    def rewrite(table: String): Unit =
      graft.sources.CompactSwap.rewrite(spark, path, table) { fresh =>
        dropTombstoned(spark, path, spark.read.parquet(s"$path/$table"))
          .write.mode(SaveMode.ErrorIfExists).parquet(fresh)
      }
    rewrite("probes")
    rewrite("hashes")
    val p = new org.apache.hadoop.fs.Path(s"$path/tombstones")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(p, true)
    ()
  }

  /** The gate: returns (doc_id, verdict) for the whole batch; survivors
    * are appended and visible to subsequent calls. Single-writer per index
    * path (the sidecar-merging store contract).
    */
  def dedupIngest(spark: SparkSession, path: String,
      batch: Dataset[Multimodal.MediaRow], maxHamming: Int = 2): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 2,
      "the persisted probe family covers Hamming radius ≤ 2")
    recover(spark, path)
    val hashesPath = new org.apache.hadoop.fs.Path(s"$path/hashes")
    val fs = hashesPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(hashesPath),
      s"no phash index at $path — build(...) it before dedupIngest")
    val residentHashes = spark.read.parquet(s"$path/hashes")
    val batchDf = batch.toDF().localCheckpoint(true)
    // One row per doc_id, enforced (the VersionedStore.upsert contract): an
    // at-least-once source duplicating a record INSIDE one micro-batch would
    // have both copies evade the batch_dup tier (keep_id equals doc_id for
    // both) and append the id twice into hashes/probes — permanently
    // duplicating the key in the id-gate authority table. Fail fast instead.
    val dupId = batchDf.groupBy(col("doc_id")).count()
      .filter(col("count") > 1).limit(1).collect()
    require(dupId.isEmpty,
      s"ingest batch carries duplicate doc_id ${dupId.headOption.map(_.get(0)).orNull}" +
        " — collapse to one row per key before dedupIngest")
    val clash = batchDf.select(col("doc_id"))
      .join(residentHashes.select(col("doc_id")), Seq("doc_id"), "left_semi")
      .limit(5).collect()
    require(clash.isEmpty,
      s"batch doc_ids collide with resident ids (e.g. ${clash.map(_.get(0)).mkString(", ")}): " +
        "ingest requires batch ids disjoint from the resident corpus")
    val bHashes = Multimodal.imageHashes(batchDf.as[Multimodal.MediaRow](
      org.apache.spark.sql.Encoders.product[Multimodal.MediaRow])).toDF()
      .localCheckpoint(true)
    val undecodable = batchDf.select(col("doc_id"))
      .join(bHashes.select(col("doc_id")), Seq("doc_id"), "left_anti")
      .select(col("doc_id"), lit("undecodable").as("verdict"))
    val batchLosers = bHashes
      .groupBy(col("ahash"))
      .agg(min(col("doc_id")).as("keep_id"), collect_list(col("doc_id")).as("ids"))
      .select(explode(col("ids")).as("doc_id"), col("keep_id"))
      .filter(col("doc_id") =!= col("keep_id"))
      .select(col("doc_id"), lit("batch_dup").as("verdict"))
      .localCheckpoint(true)
    val candidates = bHashes.join(batchLosers.select("doc_id"), Seq("doc_id"), "left_anti")
    // tombstoned residents stop vetoing offers; the id clash gate above
    // still reads them raw (deleted ids stay burned until compact)
    val probes = dropTombstoned(spark, path, spark.read.parquet(s"$path/probes"))
    val nearDups = candidates
      .select(col("doc_id"), col("ahash"), explode(flipsOf(col("ahash"))).as("probe"))
      .join(probes.select(col("probe"), col("doc_id").as("r_doc_id")), "probe")
      .join(residentHashes.select(col("doc_id").as("r_doc_id"), col("ahash").as("r_ahash")),
        "r_doc_id")
      .filter(hamming(col("ahash"), col("r_ahash")) <= maxHamming)
      .select(col("doc_id")).distinct()
      .select(col("doc_id"), lit("near_dup").as("verdict"))
      .localCheckpoint(true)
    val keep = candidates.join(nearDups.select("doc_id"), Seq("doc_id"), "left_anti")
      .localCheckpoint(true) // two consumers below; appends must not re-derive
    keep.select(col("doc_id"), col("ahash"), col("dhash"))
      .write.mode(SaveMode.Append).parquet(s"$path/hashes")
    keep.select(explode(flipsOf(col("ahash"))).as("probe"), col("doc_id"))
      .write.mode(SaveMode.Append).parquet(s"$path/probes")
    batchDf.select(col("doc_id"))
      .join(undecodable.unionByName(batchLosers).unionByName(nearDups),
        Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("verdict"), lit("ingested")).as("verdict"))
      .orderBy(col("doc_id"))
  }
}
