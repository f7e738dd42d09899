package graft

import graft.crm.{CrmOps, ThreadCache}

/** S13 observable cache semantics (`core/storage.py:14-67`,
  * `conversation_client.py:246-259`): serve-from-snapshot unless refreshing
  * or paginating; a first page replaces the snapshot; pagination bypasses it.
  */
class ThreadCacheSpec extends SparkSpec {

  private def freshCache(): ThreadCache = {
    val dir = java.nio.file.Files.createTempDirectory("graft-tcache").toString + "/threads"
    new ThreadCache(spark, dir)
  }

  test("first read computes and snapshots; second read serves from cache") {
    val cache = freshCache()
    assert(!cache.snapshotExists)

    val (first, servedFirst) = cache.recentConversations(sf, 10)
    assert(!servedFirst, "nothing cached yet — must recompute")
    val firstRows = first.collect()
    assert(cache.snapshotExists, "first page must replace the snapshot")

    val (second, servedSecond) = cache.recentConversations(sf, 10)
    assert(servedSecond, "snapshot exists and not refreshing — must serve from cache")
    assert(second.collect().map(_.toString).toSeq == firstRows.map(_.toString).toSeq)
  }

  test("refresh=true bypasses the snapshot and rewrites it") {
    val cache = freshCache()
    cache.recentConversations(sf, 10)._2 // prime
    val (_, served) = cache.recentConversations(sf, 10, refresh = true)
    assert(!served, "refresh must recompute even with a snapshot present")
    assert(cache.snapshotExists)
  }

  test("pagination neither serves from nor replaces the snapshot") {
    val cache = freshCache()
    // Paginating with no snapshot: recompute, but do NOT save (the
    // reference only caches page one).
    val (pageRows, served) = cache.recentConversations(sf, 10, paginating = true)
    assert(!served)
    assert(pageRows.collect().nonEmpty)
    assert(!cache.snapshotExists, "a paginating read must not create the snapshot")

    // Prime the snapshot, then paginate: still a recompute, snapshot kept.
    val baseline = cache.recentConversations(sf, 10)._1.collect()
    val (_, servedPaging) = cache.recentConversations(sf, 10, paginating = true)
    assert(!servedPaging, "pagination must bypass the snapshot")
    assert(cache.recentConversations(sf, 10)._1.collect().map(_.toString).toSeq ==
      baseline.map(_.toString).toSeq, "snapshot untouched by pagination")
  }

  test("invalidate removes the snapshot; next read recomputes") {
    val cache = freshCache()
    cache.recentConversations(sf, 10)
    assert(cache.snapshotExists)
    cache.invalidate()
    assert(!cache.snapshotExists)
    val (df, served) = cache.recentConversations(sf, 10)
    assert(!served)
    val expected = CrmOps.recentConversations(spark, sf, 10).collect()
    assert(df.collect().map(_.toString).toSeq == expected.map(_.toString).toSeq)
  }
}
