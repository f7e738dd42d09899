package graft

import org.apache.spark.sql.functions._

/** Two-proportion z-test: hand-computed statistic parity and the
  * degenerate-variance guard (all/none converted → NULL z, never an
  * engine-specific 0/0).
  */
class AbTestSpec extends SparkSpec {

  private def ev(rows: (Long, String, Double)*) = {
    import spark.implicits._
    rows.toDF("user_id", "event_type", "value")
  }

  test("z matches the hand computation on a known split") {
    // arm 0: users 0,2,4,6 (2 convert); arm 1: users 1,3,5 (1 converts)
    val rows = (0L to 6L).map(u => (u, "view", 0.0)) ++
      Seq(0L, 2L, 1L).map(u => (u, "purchase", 10.0))
    val r = graft.ops.Events.abTestConversion(ev(rows: _*),
      pmod(col("user_id"), lit(2L)), col("event_type") === "purchase")
      .collect().head
    assert(r.getAs[Long]("n_a") == 4 && r.getAs[Long]("x_a") == 2)
    assert(r.getAs[Long]("n_b") == 3 && r.getAs[Long]("x_b") == 1)
    val pA = 2.0 / 4.0; val pB = 1.0 / 3.0; val p = 3.0 / 7.0
    val want = (pA - pB) / math.sqrt(p * (1.0 - p) * (1.0 / 4.0 + 1.0 / 3.0))
    assert(r.getAs[Double]("z") == want, "bitwise z parity with the scalar formula")
  }

  test("zero pooled variance (everyone converted) yields NULL z, not an error") {
    val rows = (0L to 5L).map(u => (u, "purchase", 10.0))
    val r = graft.ops.Events.abTestConversion(ev(rows: _*),
      pmod(col("user_id"), lit(2L)), col("event_type") === "purchase")
      .collect().head
    assert(r.getAs[Double]("p_a") == 1.0 && r.getAs[Double]("p_b") == 1.0)
    assert(r.isNullAt(r.fieldIndex("z")))
  }
}
