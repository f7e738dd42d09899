package graft

import org.apache.spark.sql.functions._
import graft.ops.Dedup
import graft.text.LshIndex

class LshIndexSpec extends SparkSpec {

  private def fixtureBatch(docs: org.apache.spark.sql.DataFrame) =
    docs.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 2000000L).as("doc_id"),
        when(col("doc_id") % 20 === 0, col("text"))
          .otherwise(concat(col("text"), lit(" zz yy xx"))).as("text"))

  test("batch-vs-index dedup equals recomputing minhash pairs over the union") {
    val docs = Tables.documents(spark, sf)
    val batch = fixtureBatch(docs)
    val dir = java.nio.file.Files.createTempDirectory("graft-lsh").toString + "/lsh"
    LshIndex.build(spark, docs, dir)
    val incr = LshIndex.dedupBatch(spark, dir, batch).collect()
      .map(r => (r.getAs[Long]("batch_doc_id"), r.getAs[Long]("resident_doc_id")) ->
        ((r.getAs[Long]("n_shared_bands"), r.getAs[Double]("jaccard")))).toMap
    // Reference: the full-recompute operator over resident ∪ batch,
    // restricted to cross pairs (resident ids < 2000000 ≤ batch ids).
    val full = Dedup.minhashDupPairs(docs.select("doc_id", "text").unionByName(batch))
      .filter(col("doc_a") < 2000000L && col("doc_b") >= 2000000L)
      .collect()
      .map(r => (r.getAs[Long]("doc_b"), r.getAs[Long]("doc_a")) ->
        ((r.getAs[Long]("n_shared_bands"), r.getAs[Double]("jaccard")))).toMap
    assert(incr.nonEmpty && incr == full,
      s"index-served dedup diverged: ${incr.size} vs ${full.size} pairs")
  }

  test("exact flag marks verbatim re-offers; perturbed docs are near-dups") {
    val docs = Tables.documents(spark, sf)
    val dir = java.nio.file.Files.createTempDirectory("graft-lsh2").toString + "/lsh"
    LshIndex.build(spark, docs, dir)
    val pairs = LshIndex.dedupBatch(spark, dir, fixtureBatch(docs)).collect()
    // Every batch doc pairs with its own source (id − 2000000) at least.
    val selfPairs = pairs.filter(r =>
      r.getAs[Long]("resident_doc_id") == r.getAs[Long]("batch_doc_id") - 2000000L)
    assert(selfPairs.nonEmpty)
    selfPairs.foreach { r =>
      val src = r.getAs[Long]("resident_doc_id")
      if (src % 20 == 0) {
        assert(r.getAs[Boolean]("is_exact") && r.getAs[Double]("jaccard") == 1.0)
      } else {
        assert(!r.getAs[Boolean]("is_exact") && r.getAs[Double]("jaccard") < 1.0)
      }
    }
  }

  test("ingest gate drops dups, appends survivors, and catches re-offers of ingested docs") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
    val dir = java.nio.file.Files.createTempDirectory("graft-lsh3").toString + "/lsh"
    LshIndex.build(spark, docs, dir)
    // A batch with one verbatim dup, one perturbed dup, one novel doc.
    val src = docs.orderBy("doc_id").limit(2).collect()
    val batch = Seq(
      (3000001L, src(0).getAs[String]("text")),
      (3000002L, src(1).getAs[String]("text") + " zz yy xx"),
      (3000003L, "qq ww ee rr tt uu ii oo pp aa ss dd ff gg hh jj"))
      .toDF("doc_id", "text")
    val report = LshIndex.ingestBatch(spark, dir, batch).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("verdict")).toMap
    assert(report(3000001L) == "exact_dup")
    assert(report(3000002L) == "near_dup")
    assert(report(3000003L) == "ingested")
    // The novel doc is now resident: re-offering it verbatim is an exact dup.
    val reoffer = Seq((4000001L,
      "qq ww ee rr tt uu ii oo pp aa ss dd ff gg hh jj")).toDF("doc_id", "text")
    val second = LshIndex.ingestBatch(spark, dir, reoffer).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("verdict")).toMap
    assert(second(4000001L) == "exact_dup")
  }

  test("within-batch exact copies: only the min-id copy ingests, the rest are batch_dups") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
    val dir = java.nio.file.Files.createTempDirectory("graft-lsh4").toString + "/lsh"
    LshIndex.build(spark, docs, dir)
    val novel = "mm nn bb vv cc xx ll kk jj hh gg ff dd ss aa qq"
    val batch = Seq(
      (5000001L, novel), (5000002L, novel), (5000003L, novel))
      .toDF("doc_id", "text")
    val report = LshIndex.ingestBatch(spark, dir, batch).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("verdict")).toMap
    assert(report == Map(5000001L -> "ingested",
      5000002L -> "batch_dup", 5000003L -> "batch_dup"))
    // exactly ONE copy became resident
    val resident = spark.read.parquet(s"$dir/hashes")
      .filter(col("doc_id") >= 5000000L).count()
    assert(resident == 1)
  }

  test("ingest fails fast when a batch reuses a resident doc_id") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
    val dir = java.nio.file.Files.createTempDirectory("graft-lsh6").toString + "/lsh"
    LshIndex.build(spark, docs, dir)
    val residentId = docs.orderBy("doc_id").limit(1).collect()(0).getAs[Long]("doc_id")
    val clashing = Seq((residentId, "totally different text under a reused id"))
      .toDF("doc_id", "text")
    val e1 = intercept[IllegalArgumentException](LshIndex.ingestBatch(spark, dir, clashing))
    assert(e1.getMessage.contains("doc_ids collide"))
    val e2 = intercept[IllegalArgumentException](LshIndex.dedupBatch(spark, dir, clashing))
    assert(e2.getMessage.contains("doc_ids collide"))
  }

  test("exact tier catches re-offers too short to shingle") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
    val dir = java.nio.file.Files.createTempDirectory("graft-lsh5").toString + "/lsh"
    LshIndex.build(spark, docs, dir)
    // A two-word doc has NO 3-gram shingles — invisible to the LSH report —
    // but the hash tier must still catch its verbatim re-offer.
    val first = LshIndex.ingestBatch(spark, dir,
      Seq((6000001L, "zz qq")).toDF("doc_id", "text")).collect()
    assert(first.head.getString(1) == "ingested")
    val second = LshIndex.ingestBatch(spark, dir,
      Seq((6000002L, "zz qq")).toDF("doc_id", "text")).collect()
    assert(second.head.getString(1) == "exact_dup")
  }

  test("deleted residents stop matching: near-dup and exact tiers both honor tombstones") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
    val dir = java.nio.file.Files.createTempDirectory("graft-lsh6").toString + "/lsh"
    LshIndex.build(spark, docs, dir)
    val batch = fixtureBatch(docs)
    val before = LshIndex.dedupBatch(spark, dir, batch).collect()
      .map(r => (r.getAs[Long]("batch_doc_id"), r.getAs[Long]("resident_doc_id")))
    assert(before.nonEmpty)
    // retract every resident that matched anything
    val deadIds = before.map(_._2).distinct
    LshIndex.delete(spark, dir, deadIds.toSeq.toDF("doc_id"))
    val after = LshIndex.dedupBatch(spark, dir, batch).collect()
    assert(after.isEmpty, s"tombstoned residents still matched: ${after.length} pairs")
    // exact tier: a verbatim re-offer of a deleted doc's text now ingests
    val deadText = docs.filter(col("doc_id") === deadIds.head)
      .select(col("text")).head.getString(0)
    val verdict = LshIndex.ingestBatch(spark, dir,
      Seq((7000001L, deadText)).toDF("doc_id", "text")).collect().head.getString(1)
    assert(verdict == "ingested", s"deleted text should re-ingest, got $verdict")
  }

  test("deleted ids stay burned until compact; compacted index equals a fresh build") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
    val dir = java.nio.file.Files.createTempDirectory("graft-lsh7").toString + "/lsh"
    LshIndex.build(spark, docs, dir)
    val deadIds = docs.filter(col("doc_id") % 10 === 0).select(col("doc_id"))
    LshIndex.delete(spark, dir, deadIds)
    // pre-compaction: the id is burned — re-offering it fails the gate
    val reuse = Seq((0L, "totally new text under a deleted id")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException](LshIndex.ingestBatch(spark, dir, reuse))
    assert(e.getMessage.contains("doc_ids collide"))
    LshIndex.compact(spark, dir)
    assert(!new java.io.File(s"$dir/tombstones").exists(), "compact must drop the log")
    // post-compaction: replacement path open again
    val verdict = LshIndex.ingestBatch(spark, dir, reuse).collect().head.getString(1)
    assert(verdict == "ingested")
    // and serving equals a FRESH index over the surviving corpus + the replacement
    val survivors = docs.filter(col("doc_id") % 10 =!= 0)
      .select(col("doc_id"), col("text"))
      .unionByName(reuse)
    val fresh = java.nio.file.Files.createTempDirectory("graft-lsh8").toString + "/lsh"
    LshIndex.build(spark, survivors, fresh)
    val batch = fixtureBatch(docs)
    val a = LshIndex.dedupBatch(spark, dir, batch).collect()
      .map(r => (r.getAs[Long]("batch_doc_id"), r.getAs[Long]("resident_doc_id"),
        r.getAs[Double]("jaccard"))).toSet
    val b = LshIndex.dedupBatch(spark, fresh, batch).collect()
      .map(r => (r.getAs[Long]("batch_doc_id"), r.getAs[Long]("resident_doc_id"),
        r.getAs[Double]("jaccard"))).toSet
    assert(a == b, s"compacted (${a.size}) vs fresh (${b.size}) diverged")
  }
}
