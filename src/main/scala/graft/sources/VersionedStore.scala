package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.hadoop.fs.{FileSystem, Path}
import java.net.URI

/** Versioned bucketed snapshot — the [[SnapshotStore]] IO shape (hash-bucket
  * partitioning, dirty-bucket-only upserts) lifted to IMMUTABLE files plus an
  * atomic manifest commit, i.e. the Iceberg/Delta idea reduced to exactly what
  * the corpus pipeline needs:
  *
  *   - each commit writes its rows ONCE, into a fresh uniquely-named data
  *     directory (`files/v<N>-<nonce>/bucket=B/`) that is never rewritten or
  *     appended, so a reader can never observe a half-replaced bucket (the
  *     documented race in [[SnapshotStore]]'s dynamic-overwrite design), and
  *     a writer that dies between data write and commit leaves only an
  *     unreferenced directory for `vacuum` to collect — never a wedged
  *     version number;
  *   - a manifest `manifests/v<N>.json` maps every live bucket to the data
  *     directory currently serving it — an upsert's manifest repoints only
  *     the DIRTY buckets and inherits every clean bucket's entry unchanged,
  *     so write amplification stays O(dirty share), exactly as before;
  *   - the commit is ONE atomic rename of the manifest into place. Rename
  *     refuses an existing destination, so of two committers racing from the
  *     same base exactly one wins; the loser gets a
  *     [[CommitConflictException]], deletes its own (uniquely named, still
  *     unreferenced) data directory, and must re-read and retry — optimistic
  *     concurrency, the Delta protocol's core move, REPLACING the mutable
  *     store's single-writer-by-contract caveat with an enforced protocol;
  *   - readers resolve a manifest first (latest, or any retained version for
  *     time travel) and read exactly the directories it lists — snapshot
  *     isolation for free, because those directories are immutable.
  *
  * At 100 TB: the manifest is O(nBuckets) driver-side JSON (4096 entries ≈
  * 100 KB — the same bounded-artifact class as the IVF centroid sidecar);
  * data IO per upsert is unchanged from [[SnapshotStore]]; `compact()`
  * bounds manifest fragmentation (the number of distinct data directories a
  * read must touch) and `vacuum()` bounds storage growth — with an age
  * guard so it cannot collect a directory an in-flight committer just wrote
  * (the Delta VACUUM retention rule). No table-format dependency — plain
  * parquet + one JSON file per version, readable by ANY engine that can
  * follow the manifest.
  */
object VersionedStore {

  final class CommitConflictException(msg: String) extends RuntimeException(msg)

  private def fs(spark: SparkSession, path: String): FileSystem =
    FileSystem.get(new URI(path), spark.sparkContext.hadoopConfiguration)

  private def withBucket(df: DataFrame, nBuckets: Int): DataFrame =
    df.withColumn("bucket", pmod(hash(col("doc_id")), lit(nBuckets)))

  // ---- manifest (hand-rolled fixed-shape JSON: {"version":N,"n_buckets":B,
  // ---- "owner":{"<bucket>":"<dataDir>",...}}) ------------------------------

  private def renderManifest(version: Long, nBuckets: Int,
      owner: Map[Int, String]): String = {
    val entries = owner.toSeq.sortBy(_._1)
      .map { case (b, d) => s""""$b":"$d"""" }.mkString(",")
    s"""{"version":$version,"n_buckets":$nBuckets,"owner":{$entries}}"""
  }

  private def parseManifest(s: String): (Long, Int, Map[Int, String]) = {
    def field(name: String): String = {
      val i = s.indexOf(s""""$name":""")
      require(i >= 0, s"manifest missing $name: $s")
      s.substring(i + name.length + 3).takeWhile(_.isDigit)
    }
    val version = field("version").toLong
    val nBuckets = field("n_buckets").toInt
    val start = s.indexOf("\"owner\":{") + 9
    val body = s.substring(start, s.indexOf("}", start))
    val owner = body.split(",").filter(_.nonEmpty).map { e =>
      val Array(k, v) = e.split(":")
      k.replace("\"", "").trim.toInt -> v.replace("\"", "").trim
    }.toMap
    (version, nBuckets, owner)
  }

  private def manifestPath(path: String, v: Long) =
    new Path(f"$path/manifests/v$v%08d.json")

  /** All committed versions, ascending. */
  def versions(spark: SparkSession, path: String): Seq[Long] = {
    val dir = new Path(s"$path/manifests")
    val f = fs(spark, path)
    if (!f.exists(dir)) return Seq.empty
    f.listStatus(dir).map(_.getPath.getName)
      .filter(n => n.startsWith("v") && n.endsWith(".json"))
      .map(n => n.stripPrefix("v").stripSuffix(".json").toLong)
      .sorted.toSeq
  }

  def currentVersion(spark: SparkSession, path: String): Long = {
    val vs = versions(spark, path)
    require(vs.nonEmpty, s"no committed version at $path")
    vs.last
  }

  private def readManifest(spark: SparkSession, path: String,
      v: Long): (Long, Int, Map[Int, String]) = {
    val f = fs(spark, path)
    val p = manifestPath(path, v)
    require(f.exists(p), s"version $v not found at $path")
    val in = f.open(p)
    val s = try scala.io.Source.fromInputStream(in).mkString finally in.close()
    parseManifest(s)
  }

  /** Atomically commit the manifest for version `v`. The temp-write + rename
    * IS the commit protocol: rename refuses an existing destination, so of
    * two racing committers producing the same next version exactly one wins.
    */
  private def commit(spark: SparkSession, path: String, v: Long,
      nBuckets: Int, owner: Map[Int, String]): Unit = {
    val f = fs(spark, path)
    f.mkdirs(new Path(s"$path/manifests"))
    val dst = manifestPath(path, v)
    if (f.exists(dst))
      throw new CommitConflictException(
        s"version $v already committed at $path — re-read and retry")
    val tmp = new Path(s"$path/manifests/_tmp-$v-${System.nanoTime()}")
    val out = f.create(tmp, false)
    try out.write(renderManifest(v, nBuckets, owner).getBytes("UTF-8"))
    finally out.close()
    if (!f.rename(tmp, dst)) {
      f.delete(tmp, false)
      throw new CommitConflictException(
        s"concurrent commit of version $v at $path — re-read and retry")
    }
  }

  // ---- writes --------------------------------------------------------------

  /** Write `bucketed`'s rows into a FRESH uniquely-named data directory;
    * returns (dirName, buckets that produced rows). The nonce means no two
    * writers ever contend on a directory, and a crash after this write
    * leaves only vacuum-collectable garbage.
    */
  private def writeDataDir(spark: SparkSession, path: String, v: Long,
      bucketed: DataFrame): (String, Set[Int]) = {
    val dirName = f"v$v%08d-${System.nanoTime()}%x"
    bucketed.write.mode(SaveMode.ErrorIfExists).partitionBy("bucket")
      .parquet(s"$path/files/$dirName")
    val f = fs(spark, path)
    val present = f.listStatus(new Path(s"$path/files/$dirName"))
      .map(_.getPath.getName).filter(_.startsWith("bucket="))
      .map(_.stripPrefix("bucket=").toInt).toSet
    (dirName, present)
  }

  private def dropOwnDir(spark: SparkSession, path: String, dirName: String): Unit =
    fs(spark, path).delete(new Path(s"$path/files/$dirName"), true)

  /** Create version 1 from the initial corpus. */
  def init(spark: SparkSession, docs: DataFrame, path: String,
      nBuckets: Int = 64): Long = {
    require(nBuckets > 0, "nBuckets must be positive")
    val (dirName, present) = writeDataDir(spark, path, 1L, withBucket(docs, nBuckets))
    try commit(spark, path, 1L, nBuckets, present.map(_ -> dirName).toMap)
    catch { case e: CommitConflictException =>
      dropOwnDir(spark, path, dirName); throw e
    }
    1L
  }

  /** Apply upserts + deletes on top of `expected` (default: latest),
    * committing `expected + 1`. Reads and rewrites ONLY dirty buckets;
    * clean buckets' manifest entries carry over untouched. Throws
    * [[CommitConflictException]] if someone else committed first — the
    * caller re-reads and retries (its merge must be recomputed against the
    * new state, so the data directory written here is deleted: it is
    * uniquely this writer's and referenced by nothing).
    */
  def upsert(spark: SparkSession, path: String, upserts: DataFrame,
      deletes: DataFrame, expected: Option[Long] = None): Long = {
    val base = expected.getOrElse(currentVersion(spark, path))
    val (_, nBuckets, owner) = readManifest(spark, path, base)
    val next = base + 1L
    // fail fast (and before any data IO) if the base is already stale; the
    // rename in commit() remains the authoritative check
    if (fs(spark, path).exists(manifestPath(path, next)))
      throw new CommitConflictException(
        s"version $next already committed at $path — re-read and retry")
    val up = withBucket(upserts, nBuckets).localCheckpoint(true)
    val del = withBucket(deletes.select(col("doc_id")), nBuckets)
      .localCheckpoint(true)
    val dirty = (up.select(col("bucket")).distinct().collect() ++
      del.select(col("bucket")).distinct().collect())
      .map(_.getInt(0)).distinct.toSet
    if (dirty.isEmpty) { commit(spark, path, next, nBuckets, owner); return next }
    val upClean = up.join(del.select(col("doc_id")), Seq("doc_id"), "left_anti")
    val dirtyOwner = owner.filter(e => dirty(e._1))
    // dirty buckets with no resident files yet (all-new ids): nothing to merge
    val merged = if (dirtyOwner.isEmpty) upClean else {
      val resident = readBuckets(spark, path, dirtyOwner)
      val touched = up.select(col("doc_id")).union(del.select(col("doc_id")))
      val kept = resident.join(touched, Seq("doc_id"), "left_anti")
      kept.unionByName(upClean.select(kept.columns.map(col).toSeq: _*))
    }
    // immutable-version write: no read-before-overwrite barrier needed —
    // the directories being read (owners) and written (fresh nonce dir)
    // are disjoint by construction.
    val (dirName, present) = writeDataDir(spark, path, next, merged)
    val newOwner = (owner -- dirty) ++ present.map(_ -> dirName)
    try commit(spark, path, next, nBuckets, newOwner)
    catch { case e: CommitConflictException =>
      dropOwnDir(spark, path, dirName); throw e
    }
    next
  }

  /** Rewrite every live bucket into one fresh data directory — bounds the
    * number of distinct directories a read touches (manifest
    * defragmentation; the Iceberg "rewrite data files" maintenance action).
    * Content is unchanged, so this is safe to run any time.
    */
  def compact(spark: SparkSession, path: String): Long = {
    val base = currentVersion(spark, path)
    val (_, nBuckets, owner) = readManifest(spark, path, base)
    val next = base + 1L
    val (dirName, present) = writeDataDir(spark, path, next,
      readBuckets(spark, path, owner))
    try commit(spark, path, next, nBuckets, present.map(_ -> dirName).toMap)
    catch { case e: CommitConflictException =>
      dropOwnDir(spark, path, dirName); throw e
    }
    next
  }

  /** Drop manifests older than the latest `retainVersions` (bounding how far
    * back time travel reaches), then delete every data directory referenced
    * by NO retained manifest — which also collects directories orphaned by
    * writers that died before committing. `olderThanMs` is the safety
    * window: a directory younger than it is NEVER deleted, because it may
    * belong to an in-flight commit that has written data but not yet
    * renamed its manifest (the Delta VACUUM retention rule; default 24 h —
    * tests pass 0 for immediacy).
    */
  def vacuum(spark: SparkSession, path: String, retainVersions: Int = 7,
      olderThanMs: Long = 24L * 3600 * 1000): Unit = {
    require(retainVersions >= 1, "must retain at least the current version")
    val f = fs(spark, path)
    val vs = versions(spark, path)
    val retained = vs.takeRight(retainVersions)
    val live: Set[String] = retained
      .flatMap(v => readManifest(spark, path, v)._3.values).toSet
    vs.dropRight(retainVersions)
      .foreach(v => f.delete(manifestPath(path, v), false))
    val filesDir = new Path(s"$path/files")
    val cutoff = System.currentTimeMillis() - olderThanMs
    if (f.exists(filesDir)) f.listStatus(filesDir)
      .filter(st => !live(st.getPath.getName) &&
        st.getModificationTime <= cutoff)
      .foreach(st => f.delete(st.getPath, true))
  }

  // ---- reads ---------------------------------------------------------------

  /** Assemble the rows a manifest describes: one pruned read per distinct
    * owning directory (buckets grouped so the plan stays a bounded union —
    * `compact` keeps that bound small), bucket column restored from the
    * directory layout via basePath.
    */
  private def readBuckets(spark: SparkSession, path: String,
      owner: Map[Int, String]): DataFrame = {
    require(owner.nonEmpty, "empty snapshot")
    owner.groupBy(_._2).toSeq.sortBy(_._1).map { case (d, entries) =>
      spark.read.option("basePath", s"$path/files/$d")
        .parquet(entries.keys.toSeq.sorted
          .map(b => s"$path/files/$d/bucket=$b"): _*)
    }.reduce(_ unionByName _)
  }

  /** Read a snapshot version (default: latest) — time travel is just naming
    * an older retained version. A version whose every row was deleted has
    * an empty owner map and no schema on disk to serve; reading it is an
    * error by contract (store a schema sidecar if empty snapshots must be
    * readable).
    */
  def read(spark: SparkSession, path: String, asOf: Option[Long] = None): DataFrame = {
    val v = asOf.getOrElse(currentVersion(spark, path))
    val (_, _, owner) = readManifest(spark, path, v)
    if (owner.isEmpty)
      throw new IllegalStateException(s"version $v has no live buckets")
    readBuckets(spark, path, owner).drop("bucket")
  }
}
