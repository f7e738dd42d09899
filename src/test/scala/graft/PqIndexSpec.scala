package graft

import org.apache.spark.sql.functions._
import graft.vector.PqIndex

class PqIndexSpec extends SparkSpec {

  private lazy val emb = Tables.embeddings(spark, sf)
  private lazy val books = PqIndex.train(emb)
  private lazy val qv = emb.filter(col("vec_id") === 0L)
    .select("embedding").head.getSeq[Float](0)

  test("codes are m small ints within [0, ksub) — the 32x compression holds") {
    val encoded = PqIndex.encode(emb, books)
    val rows = encoded.collect()
    assert(rows.length == emb.count())
    rows.foreach { r =>
      val codes = r.getSeq[Int](r.fieldIndex("codes"))
      assert(codes.length == 8, "m=8 codes per vector")
      codes.foreach(c => assert(c >= 0 && c < 16, "4-bit code range"))
    }
    // 64 float32 (256 B) -> 8 codes; even stored as ints the information
    // content is 8 * 4 bits. The compression claim is structural: the ADC
    // scan never touches the original floats.
  }

  test("training is deterministic") {
    val again = PqIndex.train(emb)
    assert(books.length == again.length)
    books.zip(again).foreach { case (a, b) =>
      a.zip(b).foreach { case (ca, cb) => assert(ca.sameElements(cb)) }
    }
  }

  test("ADC + exact re-rank achieves high recall vs brute force; distances exact") {
    val pq = PqIndex.searchAdc(PqIndex.encode(emb, books), emb, books, qv, k = 10)
      .collect()
    val brute = graft.ops.Similarity.knnL2(emb, 0L, 10).collect()
    val bruteIds = brute.map(_.getAs[Long]("vec_id")).toSet
    val pqIds = pq.map(_.getAs[Long]("vec_id")).toSet
    val recall = bruteIds.intersect(pqIds).size / 10.0
    assert(recall >= 0.8, s"recall@10 = $recall < 0.8")
    // every returned distance is the TRUE squared L2 (re-rank is exact)
    val bruteD = brute.map(r => r.getAs[Long]("vec_id") -> r.getAs[Double]("dist_sq")).toMap
    pq.filter(r => bruteD.contains(r.getAs[Long]("vec_id"))).foreach { r =>
      assert(r.getAs[Double]("dist_sq") == bruteD(r.getAs[Long]("vec_id")))
    }
  }

  test("training seeds from the smallest present ids — no dense 0..ksub-1 assumption") {
    // A filtered corpus (ids 100+) used to throw NoSuchElementException.
    val sparseIds = emb.filter(col("vec_id") >= 100L)
    val sparseBooks = PqIndex.train(sparseIds)
    assert(sparseBooks.length == 8 && sparseBooks(0).length == 16)
    // Still deterministic on the sparse corpus.
    val again = PqIndex.train(sparseIds)
    sparseBooks.zip(again).foreach { case (a, b) =>
      a.zip(b).foreach { case (ca, cb) => assert(ca.sameElements(cb)) }
    }
    // Too few vectors to seed ksub codes fails with a clear message.
    val err = intercept[IllegalArgumentException] {
      PqIndex.train(emb.filter(col("vec_id") < 5L))
    }
    assert(err.getMessage.contains("ksub"))
  }

  test("codebook sidecar round-trips through parquet") {
    val dir = java.nio.file.Files.createTempDirectory("graft-pq").toString + "/pq"
    val written = PqIndex.write(spark, emb, dir)
    val loaded = PqIndex.readBooks(spark, dir)
    written.zip(loaded).foreach { case (a, b) =>
      a.zip(b).foreach { case (ca, cb) => assert(ca.sameElements(cb)) }
    }
    val codes = spark.read.parquet(s"$dir/codes")
    assert(codes.count() == emb.count())
    // search straight off the persisted artifacts
    val out = PqIndex.searchAdc(codes, emb, loaded, qv, k = 5).collect()
    assert(out.length == 5 && out.head.getAs[Long]("vec_id") == 0L)
  }
}
