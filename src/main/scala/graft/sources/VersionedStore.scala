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
  *   - data files are written ONCE, under `files/v=N/bucket=B/`, and never
  *     rewritten or appended; a version's write touches only its own new
  *     directory, so a reader can never observe a half-replaced bucket (the
  *     documented race in [[SnapshotStore]]'s dynamic-overwrite design);
  *   - a manifest `manifests/v<N>.json` maps every live bucket to the version
  *     whose files currently serve it — an upsert's manifest repoints only the
  *     DIRTY buckets and inherits every clean bucket's entry unchanged, so
  *     write amplification stays O(dirty share), exactly as before;
  *   - the commit is ONE atomic rename of the manifest into place. Rename
  *     fails if the destination exists, which makes concurrent committers
  *     safe: the loser gets a [[CommitConflictException]] and must re-read
  *     and retry (optimistic concurrency, the Delta protocol's core move) —
  *     this REPLACES the single-writer-by-contract caveat with an enforced
  *     protocol;
  *   - readers resolve a manifest first (latest, or any retained version for
  *     time travel) and read exactly the files it lists — snapshot isolation
  *     for free, because those files are immutable.
  *
  * At 100 TB: the manifest is O(nBuckets) driver-side JSON (4096 entries ≈
  * 50 KB — the same bounded-artifact class as the IVF centroid sidecar);
  * data IO per upsert is unchanged from [[SnapshotStore]]; `compact()`
  * bounds manifest fragmentation (the number of distinct `v=` directories a
  * read must list) and `vacuum()` bounds storage growth, both standard
  * maintenance jobs. No table-format dependency — plain parquet + one JSON
  * file per version, readable by ANY engine that can follow the manifest.
  */
object VersionedStore {

  final class CommitConflictException(msg: String) extends RuntimeException(msg)

  private def fs(spark: SparkSession, path: String): FileSystem =
    FileSystem.get(new URI(path), spark.sparkContext.hadoopConfiguration)

  private def withBucket(df: DataFrame, nBuckets: Int): DataFrame =
    df.withColumn("bucket", pmod(hash(col("doc_id")), lit(nBuckets)))

  // ---- manifest (hand-rolled fixed-shape JSON: {"version":N,"n_buckets":B,
  // ---- "owner":{"<bucket>":<version>,...}}) --------------------------------

  private def renderManifest(version: Long, nBuckets: Int,
      owner: Map[Int, Long]): String = {
    val entries = owner.toSeq.sortBy(_._1)
      .map { case (b, v) => s""""$b":$v""" }.mkString(",")
    s"""{"version":$version,"n_buckets":$nBuckets,"owner":{$entries}}"""
  }

  private def parseManifest(s: String): (Long, Int, Map[Int, Long]) = {
    def field(name: String): String = {
      val i = s.indexOf(s""""$name":""")
      require(i >= 0, s"manifest missing $name: $s")
      s.substring(i + name.length + 3).takeWhile(c => c.isDigit)
    }
    val version = field("version").toLong
    val nBuckets = field("n_buckets").toInt
    val start = s.indexOf("\"owner\":{") + 9
    val body = s.substring(start, s.indexOf("}", start))
    val owner = body.split(",").filter(_.nonEmpty).map { e =>
      val Array(k, v) = e.split(":")
      k.replace("\"", "").trim.toInt -> v.trim.toLong
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
      v: Long): (Long, Int, Map[Int, Long]) = {
    val f = fs(spark, path)
    val p = manifestPath(path, v)
    require(f.exists(p), s"version $v not found at $path")
    val in = f.open(p)
    val s = try scala.io.Source.fromInputStream(in).mkString finally in.close()
    parseManifest(s)
  }

  /** Atomically commit manifest for version `v`. The temp-write + rename is
    * the entire commit protocol: rename refuses an existing destination, so
    * of two racing committers producing the same next version exactly one
    * wins; the loser must re-read the new state and retry its merge.
    */
  private def commit(spark: SparkSession, path: String, v: Long,
      nBuckets: Int, owner: Map[Int, Long]): Unit = {
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

  /** Write `df`'s rows (pre-bucketed) under `files/v=N/`, returning the set
    * of buckets that produced rows.
    */
  private def writeVersionFiles(spark: SparkSession, path: String, v: Long,
      bucketed: DataFrame): Set[Int] = {
    // ErrorIfExists doubles as the data-plane conflict detector: two
    // committers racing toward the same next version cannot both own this
    // directory, so the second writer fails here (and must NOT delete the
    // first writer's files — hence conflict, not cleanup).
    try bucketed.write.mode(SaveMode.ErrorIfExists).partitionBy("bucket")
      .parquet(s"$path/files/v=$v")
    catch { case e: org.apache.spark.sql.AnalysisException
        if e.getMessage.contains("already exists") =>
      throw new CommitConflictException(
        s"version $v data directory already written at $path — re-read and retry")
    }
    val f = fs(spark, path)
    f.listStatus(new Path(s"$path/files/v=$v"))
      .map(_.getPath.getName).filter(_.startsWith("bucket="))
      .map(_.stripPrefix("bucket=").toInt).toSet
  }

  /** Create version 1 from the initial corpus. */
  def init(spark: SparkSession, docs: DataFrame, path: String,
      nBuckets: Int = 64): Long = {
    require(nBuckets > 0, "nBuckets must be positive")
    val present = writeVersionFiles(spark, path, 1L, withBucket(docs, nBuckets))
    commit(spark, path, 1L, nBuckets, present.map(_ -> 1L).toMap)
    1L
  }

  /** Apply upserts + deletes on top of `expected` (default: latest),
    * committing `expected + 1`. Reads and rewrites ONLY dirty buckets;
    * clean buckets' manifest entries carry over untouched. Throws
    * [[CommitConflictException]] if someone else committed first.
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
    // the files being read (owner versions) and written (v=next) are
    // disjoint directories by construction.
    val present = writeVersionFiles(spark, path, next, merged)
    val newOwner = (owner -- dirty) ++ present.map(_ -> next)
    try commit(spark, path, next, nBuckets, newOwner)
    catch { case e: CommitConflictException =>
      fs(spark, path).delete(new Path(s"$path/files/v=$next"), true); throw e
    }
    next
  }

  /** Rewrite every live bucket into one fresh version directory — bounds the
    * number of distinct `v=` directories a read touches (manifest
    * defragmentation; the Iceberg "rewrite data files" maintenance action).
    * Content is unchanged, so this is safe to run any time.
    */
  def compact(spark: SparkSession, path: String): Long = {
    val base = currentVersion(spark, path)
    val (_, nBuckets, owner) = readManifest(spark, path, base)
    val next = base + 1L
    val present = writeVersionFiles(spark, path, next,
      readBuckets(spark, path, owner))
    try commit(spark, path, next, nBuckets, present.map(_ -> next).toMap)
    catch { case e: CommitConflictException =>
      fs(spark, path).delete(new Path(s"$path/files/v=$next"), true); throw e
    }
    next
  }

  /** Delete version directories referenced by NO retained manifest, keeping
    * the latest `retainVersions` manifests (older manifests are dropped, so
    * time travel reaches at most that far back — the standard vacuum
    * trade).
    */
  def vacuum(spark: SparkSession, path: String, retainVersions: Int = 7): Unit = {
    require(retainVersions >= 1, "must retain at least the current version")
    val f = fs(spark, path)
    val vs = versions(spark, path)
    val retained = vs.takeRight(retainVersions)
    val live: Set[Long] = retained
      .flatMap(v => readManifest(spark, path, v)._3.values).toSet
    vs.dropRight(retainVersions)
      .foreach(v => f.delete(manifestPath(path, v), false))
    val filesDir = new Path(s"$path/files")
    if (f.exists(filesDir)) f.listStatus(filesDir)
      .map(_.getPath.getName).filter(_.startsWith("v="))
      .map(_.stripPrefix("v=").toLong)
      .filterNot(live).filterNot(retained.toSet)
      .foreach(v => f.delete(new Path(s"$path/files/v=$v"), true))
  }

  // ---- reads ---------------------------------------------------------------

  /** Assemble the rows a manifest describes: one pruned read per distinct
    * owning version (buckets grouped so the plan stays a bounded union —
    * `compact` keeps that bound small), bucket column restored from the
    * directory layout via basePath.
    */
  private def readBuckets(spark: SparkSession, path: String,
      owner: Map[Int, Long]): DataFrame = {
    require(owner.nonEmpty, "empty snapshot")
    owner.groupBy(_._2).toSeq.sortBy(_._1).map { case (v, entries) =>
      spark.read.option("basePath", s"$path/files/v=$v")
        .parquet(entries.keys.toSeq.sorted
          .map(b => s"$path/files/v=$v/bucket=$b"): _*)
    }.reduce(_ unionByName _)
  }

  /** Read a snapshot version (default: latest) — time travel is just
    * naming an older retained version.
    */
  def read(spark: SparkSession, path: String, asOf: Option[Long] = None): DataFrame = {
    val v = asOf.getOrElse(currentVersion(spark, path))
    val (_, _, owner) = readManifest(spark, path, v)
    if (owner.isEmpty)
      throw new IllegalStateException(s"version $v has no live buckets")
    readBuckets(spark, path, owner).drop("bucket")
  }
}
