package graft

import org.apache.spark.sql.functions._
import graft.sources.VersionedStore

/** Versioned snapshot store: time travel, immutability of committed files,
  * optimistic-concurrency conflict detection, compaction, vacuum, and the
  * all-new-bucket upsert edge.
  */
class VersionedStoreSpec extends SparkSpec {

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-vstore").toString + "/s"

  private def contentMap(df: org.apache.spark.sql.DataFrame): Map[Long, String] =
    df.select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap

  private def filesUnder(dir: String): Map[String, Long] = {
    val root = new java.io.File(dir)
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk) else Seq(f)
    walk(root).filter(_.getName.endsWith(".parquet"))
      .map(f => f.getAbsolutePath -> f.lastModified()).toMap
  }

  test("upsert commits a new version; latest read = declarative merge; asOf reads the past") {
    val docs = Tables.documents(spark, sf)
    val dir = tmp()
    val v1 = VersionedStore.init(spark, docs, dir, nBuckets = 16)
    val ups = docs.filter(col("doc_id") % 10 === 0)
        .withColumn("text", concat(col("text"), lit(" v2")))
      .unionByName(docs.filter(col("doc_id") % 25 === 0)
        .withColumn("doc_id", col("doc_id") + 1000000L))
    val dels = docs.filter(col("doc_id") % 97 === 0).select(col("doc_id"))
    val v2 = VersionedStore.upsert(spark, dir, ups, dels)
    assert(v1 === 1L && v2 === 2L)
    assert(VersionedStore.versions(spark, dir) === Seq(1L, 2L))

    val base = contentMap(docs)
    val upRows = contentMap(ups)
    val delIds = dels.collect().map(_.getLong(0)).toSet
    val touched = upRows.keySet ++ delIds
    val want = (base.view.filterKeys(id => !touched(id)).toMap ++
      upRows.view.filterKeys(id => !delIds(id)).toMap)
    assert(contentMap(VersionedStore.read(spark, dir)) === want)
    // time travel: version 1 still serves the pre-upsert corpus exactly
    assert(contentMap(VersionedStore.read(spark, dir, Some(v1))) === base)
  }

  private def dataDirs(dir: String): Seq[String] =
    Option(new java.io.File(s"$dir/files").listFiles()).toSeq.flatten
      .map(_.getName).sorted

  test("committed version files are immutable — an upsert writes only its own new directory") {
    val docs = Tables.documents(spark, sf).limit(200)
    val dir = tmp()
    VersionedStore.init(spark, docs, dir, nBuckets = 8)
    val Seq(v1dir) = dataDirs(dir)
    assert(v1dir.startsWith("v00000001-"))
    val before = filesUnder(s"$dir/files/$v1dir")
    assert(before.nonEmpty)
    VersionedStore.upsert(spark, dir,
      docs.limit(20).withColumn("text", lit("rewritten")),
      spark.emptyDataFrame.selectExpr("CAST(1 AS BIGINT) AS doc_id").limit(0))
    assert(filesUnder(s"$dir/files/$v1dir") === before,
      "version-1 files changed — committed directories must be immutable")
    assert(dataDirs(dir).exists(_.startsWith("v00000002-")))
  }

  test("two committers racing from the same base: exactly one wins, the loser gets a conflict") {
    val docs = Tables.documents(spark, sf).limit(100)
    val dir = tmp()
    val v1 = VersionedStore.init(spark, docs, dir, nBuckets = 8)
    val upsA = docs.limit(5).withColumn("text", lit("A"))
    val upsB = docs.limit(5).withColumn("text", lit("B"))
    val none = docs.select(col("doc_id")).limit(0)
    VersionedStore.upsert(spark, dir, upsA, none, expected = Some(v1))
    val e = intercept[VersionedStore.CommitConflictException] {
      VersionedStore.upsert(spark, dir, upsB, none, expected = Some(v1))
    }
    assert(e.getMessage.contains("retry"))
    // winner's state intact; loser's data directory cleaned up
    val texts = VersionedStore.read(spark, dir).select(col("text"))
      .collect().map(_.getString(0))
    assert(texts.count(_ == "A") === 5 && !texts.contains("B"))
    // loser left no data directory behind (only init's and the winner's)
    assert(dataDirs(dir).size === 2, s"unexpected dirs: ${dataDirs(dir)}")
  }

  test("compact rewrites into one owning version; content unchanged; vacuum drops unreferenced versions") {
    val docs = Tables.documents(spark, sf).limit(300)
    val dir = tmp()
    VersionedStore.init(spark, docs, dir, nBuckets = 8)
    VersionedStore.upsert(spark, dir,
      docs.limit(30).withColumn("text", lit("u1")), docs.select(col("doc_id")).limit(0))
    VersionedStore.upsert(spark, dir,
      docs.filter(col("doc_id") % 3 === 0).withColumn("text", lit("u2")),
      docs.select(col("doc_id")).limit(0))
    val before = contentMap(VersionedStore.read(spark, dir))
    val vC = VersionedStore.compact(spark, dir)
    assert(contentMap(VersionedStore.read(spark, dir)) === before)
    // plant an orphan (a writer that died between data write and commit):
    // vacuum must collect it along with the superseded version directories
    new java.io.File(s"$dir/files/v00000099-deadbeef/bucket=0").mkdirs()
    VersionedStore.vacuum(spark, dir, retainVersions = 1, olderThanMs = 0L)
    val left = dataDirs(dir)
    assert(left.size === 1 && left.head.startsWith(f"v$vC%08d-"),
      s"vacuum left $left")
    assert(contentMap(VersionedStore.read(spark, dir)) === before)
    // the vacuumed-away version is no longer time-travelable
    intercept[IllegalArgumentException] {
      VersionedStore.read(spark, dir, Some(1L))
    }
  }

  test("upsert whose dirty buckets are all new (no resident files) inserts cleanly") {
    val docs = Tables.documents(spark, sf)
    val dir = tmp()
    // one resident doc → one resident bucket; the batch scatters over many
    VersionedStore.init(spark, docs.limit(1), dir, nBuckets = 16)
    val batch = docs.filter(col("doc_id").between(100, 199))
    VersionedStore.upsert(spark, dir, batch, docs.select(col("doc_id")).limit(0))
    val got = contentMap(VersionedStore.read(spark, dir))
    val want = contentMap(docs.limit(1)) ++ contentMap(batch)
    assert(got === want)
  }

  test("randomized op sequence: every version always equals the reference model's history") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val dir = tmp()
    def df(m: Map[Long, String]) = m.toSeq.toDF("doc_id", "text")
    // reference model: a plain Map folded through the same ops
    var model = (0L until 50L).map(i => i -> s"t$i").toMap
    VersionedStore.init(spark, df(model), dir, nBuckets = 8)
    val history = scala.collection.mutable.Map(1L -> model)
    var v = 1L
    for (step <- 1 to 6) {
      val ups = (0 until rnd.nextInt(10)).map(_ =>
        rnd.nextLong(70) -> s"s$step-${rnd.nextInt(100)}").toMap
      val dels = (0 until rnd.nextInt(6)).map(_ => rnd.nextLong(70)).toSet
      val op = rnd.nextInt(4)
      if (op == 3) {
        v = VersionedStore.compact(spark, dir)
        history(v) = model // compaction never changes content
      } else {
        v = VersionedStore.upsert(spark, dir,
          df(ups), dels.toSeq.toDF("doc_id"))
        model = (model -- dels -- ups.keys) ++ ups.view.filterKeys(k => !dels(k))
        history(v) = model
      }
      // EVERY retained version must still serve its recorded state
      history.foreach { case (ver, want) =>
        val got = contentMap(VersionedStore.read(spark, dir, Some(ver)))
        assert(got === want, s"step $step: version $ver drifted")
      }
    }
  }

  test("an upserts batch with duplicate doc_ids fails fast, committing nothing") {
    val docs = Tables.documents(spark, sf).limit(50)
    val dir = tmp()
    VersionedStore.init(spark, docs, dir, nBuckets = 8)
    val before = VersionedStore.currentVersion(spark, dir)
    val e = intercept[IllegalArgumentException] {
      VersionedStore.upsert(spark, dir,
        docs.limit(2).withColumn("doc_id", lit(7L)), // two rows, same id
        docs.limit(0).select(col("doc_id")))
    }
    assert(e.getMessage.contains("duplicate doc_id"))
    assert(VersionedStore.currentVersion(spark, dir) === before,
      "a rejected batch must not commit a version")
  }

  test("empty batch commits a metadata-only version") {
    val docs = Tables.documents(spark, sf).limit(50)
    val dir = tmp()
    VersionedStore.init(spark, docs, dir, nBuckets = 8)
    val none = docs.limit(0)
    val v2 = VersionedStore.upsert(spark, dir, none, none.select(col("doc_id")))
    assert(v2 === 2L)
    assert(contentMap(VersionedStore.read(spark, dir)) === contentMap(docs))
  }
}
