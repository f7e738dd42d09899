package graft

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import graft.sources.KeyedSidecar

class KeyedSidecarSpec extends SparkSpec {

  private def tmp(tag: String) =
    java.nio.file.Files.createTempDirectory(s"graft-ks-$tag").toString + "/t"

  test("round trip: write preserves rows, lookup drops the bucket column") {
    import spark.implicits._
    val df = (0L until 1000L).map(i => (i, s"v$i")).toDF("k", "v")
    val dir = tmp("rt")
    KeyedSidecar.write(df, "k", dir, SaveMode.Overwrite,
      estimatedBytes = Some(Long.MaxValue))
    // bucket directories exist
    val kbDirs = new java.io.File(dir).listFiles()
      .count(_.getName.startsWith(KeyedSidecar.BucketCol + "="))
    assert(kbDirs > 1, s"expected bucket directories, got $kbDirs")
    val back = KeyedSidecar.lookup(spark, dir, "k", spark.range(0).toDF("k"))
    assert(back.columns.sorted.toSeq == Seq("k", "v"))
    assert(back.count() == 1000L)
  }

  test("pruned lookup ≡ full scan restriction — long keys, string keys, appends") {
    import spark.implicits._
    val dirL = tmp("lk")
    val base = (0L until 5000L).map(i => (i, i * 3)).toDF("k", "payload")
    KeyedSidecar.write(base, "k", dirL, SaveMode.Overwrite,
      estimatedBytes = Some(Long.MaxValue))
    KeyedSidecar.write((5000L until 6000L).map(i => (i, i * 3)).toDF("k", "payload"),
      "k", dirL, SaveMode.Append)
    val wanted = Seq(0L, 17L, 4999L, 5500L, 5999L, 999999L) // last one absent
    val got = KeyedSidecar.lookup(spark, dirL, "k", wanted.toDF("k"), 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == wanted.filter(_ < 6000L).map(k => k -> k * 3).toMap)
    // string keys
    val dirS = tmp("sk")
    KeyedSidecar.write((0 until 3000).map(i => (s"key$i", i)).toDF("k", "n"),
      "k", dirS, SaveMode.Overwrite, estimatedBytes = Some(Long.MaxValue))
    val gotS = KeyedSidecar.lookup(spark, dirS, "k",
      Seq("key0", "key2999", "nope").toDF("k"), 0L)
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(gotS == Map("key0" -> 0, "key2999" -> 2999))
  }

  test("pruned plan: bucket partition filter + pushed key predicate reach the scan") {
    import spark.implicits._
    val dir = tmp("plan")
    KeyedSidecar.write((0L until 5000L).map(i => (i, i)).toDF("k", "p"),
      "k", dir, SaveMode.Overwrite, estimatedBytes = Some(Long.MaxValue))
    val pruned = KeyedSidecar.lookup(spark, dir, "k", Seq(7L, 4096L).toDF("k"), 0L)
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains(s"${KeyedSidecar.BucketCol}#"),
      s"bucket partition filter missing:\n${scan.take(1500)}")
    assert(scan.contains("PushedFilters: [") && scan.contains("In(k"),
      s"key predicate not pushed:\n${scan.take(1500)}")
  }

  test("fallbacks: small table full-scans, legacy layout reads unpruned, empty keys empty") {
    import spark.implicits._
    val dir = tmp("fb")
    KeyedSidecar.write((0L until 100L).map(i => (i, i)).toDF("k", "p"),
      "k", dir, SaveMode.Overwrite, estimatedBytes = Some(Long.MaxValue))
    // default threshold: tiny table → plain scan, all rows reachable
    assert(KeyedSidecar.lookup(spark, dir, "k", Seq(1L).toDF("k")).count() == 100L)
    // forced pruning with empty keys → empty
    assert(KeyedSidecar.lookup(spark, dir, "k",
      spark.range(0).select(col("id").as("k")), 0L).count() == 0L)
    // legacy: a plain unbucketed parquet dir still lookup-able (restricted)
    val legacy = tmp("legacy")
    (0L until 100L).map(i => (i, i)).toDF("k", "p")
      .write.mode(SaveMode.Overwrite).parquet(legacy)
    val got = KeyedSidecar.lookup(spark, legacy, "k", Seq(5L, 6L).toDF("k"), 0L)
    assert(got.collect().map(_.getLong(0)).sorted.toSeq == Seq(5L, 6L))
  }

  test("size cache: one walk per table, appends grow it, overwrite/compact invalidate") {
    import spark.implicits._
    val dir = tmp("sc")
    KeyedSidecar.write((0L until 500L).map(i => (i, i)).toDF("k", "p"),
      "k", dir, SaveMode.Overwrite)
    // fresh write leaves no entry; the first lookup walks once and caches
    assert(KeyedSidecar.cachedBytes(dir).isEmpty)
    KeyedSidecar.lookup(spark, dir, "k", Seq(1L).toDF("k")).count()
    val first = KeyedSidecar.cachedBytes(dir)
    assert(first.nonEmpty && first.get > 0L)
    // append grows the entry (estimate ≥ 0) without re-walking
    KeyedSidecar.write((500L until 600L).map(i => (i, i)).toDF("k", "p"),
      "k", dir, SaveMode.Append)
    val grown = KeyedSidecar.cachedBytes(dir)
    assert(grown.nonEmpty && grown.get >= first.get, s"$grown vs $first")
    // lookup correctness is unchanged with the cached size in place
    assert(KeyedSidecar.lookup(spark, dir, "k", Seq(1L).toDF("k")).count() == 600L)
    // overwrite invalidates — next lookup re-walks to the fresh truth
    KeyedSidecar.write((0L until 10L).map(i => (i, i)).toDF("k", "p"),
      "k", dir, SaveMode.Overwrite)
    assert(KeyedSidecar.cachedBytes(dir).isEmpty)
    assert(KeyedSidecar.lookup(spark, dir, "k", Seq(1L).toDF("k")).count() == 10L)
    // a compact-style swap invalidates through CompactSwap
    KeyedSidecar.lookup(spark, dir, "k", Seq(1L).toDF("k")).count()
    assert(KeyedSidecar.cachedBytes(dir).nonEmpty)
    val base = dir.stripSuffix("/t")
    graft.sources.CompactSwap.rewrite(spark, base, "t") { fresh =>
      KeyedSidecar.write((0L until 5L).map(i => (i, i)).toDF("k", "p"),
        "k", fresh, SaveMode.ErrorIfExists)
    }
    assert(KeyedSidecar.cachedBytes(dir).isEmpty)
    assert(KeyedSidecar.lookup(spark, dir, "k", Seq(1L).toDF("k")).count() == 5L)
  }

  test("size-adaptive: small fresh writes land FLAT, appends follow the layout") {
    import spark.implicits._
    // default estimate (Catalyst stats) is far below MinPruneBytes →
    // flat r12 shape: no bucket dirs, no partition column
    val dir = tmp("sa")
    KeyedSidecar.write((0L until 500L).map(i => (i, i)).toDF("k", "p"),
      "k", dir, SaveMode.Overwrite)
    val dirs = new java.io.File(dir).listFiles()
      .count(_.getName.startsWith(KeyedSidecar.BucketCol + "="))
    assert(dirs == 0, s"small write must stay flat, found $dirs bucket dirs")
    // append follows the flat resident layout
    KeyedSidecar.write((500L until 600L).map(i => (i, i)).toDF("k", "p"),
      "k", dir, SaveMode.Append)
    assert(!KeyedSidecar.isBucketed(spark, dir))
    assert(KeyedSidecar.lookup(spark, dir, "k", Seq(1L).toDF("k")).count() == 600L)
    // a big-estimate fresh write takes the bucketed layout, and appends
    // then extend it bucketed
    val dirB = tmp("sab")
    KeyedSidecar.write((0L until 500L).map(i => (i, i)).toDF("k", "p"),
      "k", dirB, SaveMode.Overwrite, estimatedBytes = Some(Long.MaxValue))
    assert(KeyedSidecar.isBucketed(spark, dirB))
    KeyedSidecar.write((500L until 600L).map(i => (i, i)).toDF("k", "p"),
      "k", dirB, SaveMode.Append)
    assert(KeyedSidecar.lookup(spark, dirB, "k", Seq(1L).toDF("k"), 0L)
      .collect().map(_.getLong(0)).toSeq == Seq(1L))
  }
}
