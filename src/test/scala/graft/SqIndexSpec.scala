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
