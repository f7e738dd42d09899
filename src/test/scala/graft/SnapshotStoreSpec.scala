package graft

import org.apache.spark.sql.functions._
import graft.sources.SnapshotStore

/** Bucketed snapshot upserts: merge semantics vs a full-rebuild reference,
  * and the partition-pruning contract — clean buckets' FILES are not
  * touched by an upsert (the no-write-amplification claim).
  */
class SnapshotStoreSpec extends SparkSpec {

  private def snapshotFiles(dir: String): Map[String, Long] = {
    val root = new java.io.File(s"$dir/snapshot")
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    walk(root).filter(_.getName.endsWith(".parquet"))
      .map(f => f.getAbsolutePath -> f.lastModified()).toMap
  }

  test("upsert merges keep-latest, inserts new ids, applies deletes — equals a full rebuild") {
    val docs = Tables.documents(spark, sf)
    val dir = java.nio.file.Files.createTempDirectory("graft-snap-spec").toString + "/s"
    SnapshotStore.init(spark, docs, dir, nBuckets = 16)
    val ups = docs.filter(col("doc_id") % 10 === 0)
        .withColumn("text", concat(col("text"), lit(" v2")))
      .unionByName(docs.filter(col("doc_id") % 25 === 0)
        .withColumn("doc_id", col("doc_id") + 1000000L))
    val dels = docs.filter(col("doc_id") % 97 === 0).select(col("doc_id"))
    SnapshotStore.upsert(spark, dir, ups, dels)
    val got = SnapshotStore.read(spark, dir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // full-rebuild reference
    val touched = ups.select(col("doc_id")).union(dels).collect().map(_.getLong(0)).toSet
    val delIds = dels.collect().map(_.getLong(0)).toSet
    val base = docs.select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val upRows = ups.select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val want = (base.view.filterKeys(id => !touched(id)).toMap ++
      upRows.view.filterKeys(id => !delIds(id)).toMap)
    assert(got == want)
  }

  test("an upsert rewrites ONLY dirty buckets — clean buckets' files stay byte-identical") {
    val docs = Tables.documents(spark, sf)
    val dir = java.nio.file.Files.createTempDirectory("graft-snap-prune").toString + "/s"
    SnapshotStore.init(spark, docs, dir, nBuckets = 16)
    val before = snapshotFiles(dir)
    // touch exactly one doc — one dirty bucket
    val one = docs.filter(col("doc_id") === 42)
      .withColumn("text", lit("rewritten"))
    SnapshotStore.upsert(spark, dir, one, one.limit(0).select(col("doc_id")))
    val after = snapshotFiles(dir)
    val dirtyBucket = spark.range(1)
      .select(pmod(hash(lit(42L)), lit(16)).as("b")).head().getInt(0)
    val (dirtyBefore, cleanBefore) = before.partition(_._1.contains(s"bucket=$dirtyBucket/"))
    val (dirtyAfter, cleanAfter) = after.partition(_._1.contains(s"bucket=$dirtyBucket/"))
    assert(cleanAfter == cleanBefore,
      "files outside the dirty bucket must be untouched (same paths, same mtimes)")
    assert(dirtyAfter.keySet != dirtyBefore.keySet,
      "the dirty bucket must have been rewritten")
    // and the content actually changed
    val txt = SnapshotStore.read(spark, dir).filter(col("doc_id") === 42)
      .select(col("text")).head().getString(0)
    assert(txt == "rewritten")
  }

  test("deleting every row of a bucket removes its directory") {
    import spark.implicits._
    val d = (0L until 64L).map(i => (i, s"t$i", "en", "s", 2L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("graft-snap-del").toString + "/s"
    SnapshotStore.init(spark, d, dir, nBuckets = 4)
    // delete every doc in bucket 0
    val b0 = d.withColumn("b", pmod(hash(col("doc_id")), lit(4)))
      .filter(col("b") === 0).select(col("doc_id"))
    SnapshotStore.upsert(spark, dir, d.limit(0), b0)
    assert(!new java.io.File(s"$dir/snapshot/bucket=0").exists())
    val remaining = SnapshotStore.read(spark, dir).count()
    assert(remaining == 64L - b0.count())
  }
}
