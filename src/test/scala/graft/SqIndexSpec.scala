package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.Similarity
import graft.vector.SqIndex

class SqIndexSpec extends SparkSpec {

  /** Deterministic scatter of 400 vectors in 8 dims, mixed scales per
    * dimension (so per-dim bounds actually matter), one constant dim.
    */
  private def fixture: DataFrame = {
    import spark.implicits._
    (0L until 400L).map { i =>
      val emb = Array.tabulate(8) {
        case 7 => 0.25f // constant dimension: span 0
        case d => (((i * 48271L + d * 16807L) % 1000L).toFloat - 500f) / (10f * (d + 1))
      }
      (i, s"v$i", emb)
    }.toDF("vec_id", "label", "embedding")
  }

  test("encode/decode roundtrip error is within half a quantization step per dim") {
    val df = fixture
    val (mins, maxs) = SqIndex.train(df)
    assert(mins.length == 8 && mins(7) == 0.25 && maxs(7) == 0.25)
    val decoded = SqIndex.encode(df, mins, maxs)
      .select(col("vec_id"),
        SqIndex.decodeCol(col("codes"), mins.toSeq, maxs.toSeq).as("dec"))
      .join(df, "vec_id")
      .select(col("vec_id"), expr(
        "aggregate(zip_with(dec, embedding, (a, b) -> abs(a - CAST(b AS DOUBLE)))," +
          " CAST(0 AS DOUBLE), (acc, v) -> greatest(acc, v))").as("max_abs_err"))
      .collect()
    val steps = mins.indices.map(d => (maxs(d) - mins(d)) / 255.0 / 2.0 + 1e-9)
    val worstStep = steps.max
    decoded.foreach(r =>
      assert(r.getAs[Double]("max_abs_err") <= worstStep,
        s"vec ${r.getLong(0)} err ${r.getAs[Double]("max_abs_err")} > $worstStep"))
  }

  test("exact config (refine covers corpus) equals brute-force kNN bitwise") {
    val df = fixture
    val brute = Similarity.knnL2(df, queryId = 3L, k = 10).collect().toSeq
    val sq = SqIndex.searchExact(df, queryId = 3L, k = 10).collect().toSeq
    assert(sq == brute)
  }

  test("banded kNN join equals the brute-force join, including duplicate-vector ties") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    import graft.functions.VectorFunctions.l2Sq
    // Fixture plus exact duplicates of vectors 5 and 6 under new ids —
    // the tie-break (d2, c_vec_id) must order them deterministically.
    val base = fixture
    val dups = base.filter(col("vec_id").isin(5L, 6L))
      .withColumn("vec_id", col("vec_id") + 1000L)
      .withColumn("label", concat(col("label"), lit("_dup")))
    val corpus = base.unionByName(dups)
    val queries = corpus.filter(col("vec_id") % 37 === 0)

    val got = graft.vector.SqIndex.knnJoin(queries, corpus, k = 5).collect().toSeq
    val brute = corpus.select(col("vec_id").as("c_vec_id"), col("embedding").as("c_emb"))
      .crossJoin(queries.select(col("vec_id").as("q_vec_id"), col("embedding").as("q_emb")))
      .withColumn("d2", l2Sq(col("q_emb"), col("c_emb")))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("q_vec_id")).orderBy(col("d2"), col("c_vec_id"))).cast("long"))
      .filter(col("rank") <= 5)
      .select(col("q_vec_id"), col("rank"), col("c_vec_id"), col("d2").as("dist_sq"))
      .orderBy(col("q_vec_id"), col("rank"))
      .collect().toSeq
    assert(got == brute)
    // Every query found its own duplicate-free self at rank 1, distance 0.
    assert(got.filter(_.getLong(1) == 1L).forall(_.getDouble(3) == 0.0))
  }

  test("quantErrorAudit: grid points reconstruct exactly, off-grid error exact, all within the analytic bound") {
    import spark.implicits._
    // dim 0 spans [0, 255] so the quantization grid is exactly the
    // integers; dim 1 is constant (span 0 — must contribute zero error).
    // v1/v2 sit ON the grid (err 0), v3 at 0.4 rounds to code 0 → decode
    // 0 → err² = 0.4² exactly (one IEEE multiply).
    val d = Seq(
      (1L, "a", Seq(0f, 7f)), (2L, "a", Seq(255f, 7f)), (3L, "a", Seq(0.4f, 7f)))
      .toDF("vec_id", "label", "embedding")
    val got = SqIndex.quantErrorAudit(d, topN = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3))).toList
    val e = 0.4f.toDouble * 0.4f.toDouble
    assert(got == List((1L, 3L, e, true), (2L, 1L, 0.0, true), (3L, 2L, 0.0, true)),
      got.toString)
    // Whole-corpus audit: a healthy corpus passes the bound on every row.
    val corpus = SqIndex.quantErrorAudit(Tables.embeddings(spark, sf)).collect()
    assert(corpus.length == 20 && corpus.forall(_.getBoolean(3)),
      "every top-20 reconstruction error must sit within the half-step bound")
    val errs = corpus.map(_.getDouble(2))
    assert(errs.zip(errs.tail).forall { case (a, b) => a >= b }, "ranked by err2 desc")
  }

  test("budgeted config: high recall at an 8x-over-k refine budget") {
    val df = fixture
    val brute = Similarity.knnL2(df, queryId = 3L, k = 10)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val approx = SqIndex.search(df, queryId = 3L, k = 10, refine = 80)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val recall = (brute intersect approx).size.toDouble / brute.size
    assert(recall >= 0.9, s"recall $recall below floor; got $approx vs $brute")
  }
}
