package graft

import org.apache.spark.sql.functions._

/** The SQL surface: after GraftCatalog.register, every table/view/function
  * is reachable from spark.sql and produces the same results as the
  * DataFrame formulation (same Catalyst plans either way).
  */
class GraftCatalogSpec extends SparkSpec {

  test("SQL over registered views equals the DataFrame ops") {
    GraftCatalog.register(spark, sf)

    val sqlClosed = spark.sql(
      """SELECT id, subject FROM tickets
        |WHERE hs_pipeline_stage = '4' OR hs_ticket_status = 'closed'
        |ORDER BY hs_lastmodifieddate DESC, CAST(id AS BIGINT) LIMIT 50""".stripMargin)
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    val dfClosed = crm.CrmOps.ticketsClosed(spark, sf).select("id", "subject")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(sqlClosed == dfClosed)

    val sqlJoin = spark.sql(
      """SELECT c.industry, COUNT(*) AS n FROM companies c GROUP BY 1 ORDER BY 1""")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val dfJoin = crm.CrmViews.companies(spark, sf)
      .groupBy(col("industry")).agg(count(lit(1)).as("n")).orderBy(col("industry"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(sqlJoin == dfJoin)
  }

  test("native vector functions are callable from SQL over the embeddings view") {
    GraftCatalog.register(spark, sf)
    val viaSql = spark.sql(
      """SELECT a.vec_id, vec_l2sq(a.embedding, b.embedding) AS d2
        |FROM embeddings a JOIN embeddings b ON b.vec_id = 0
        |ORDER BY d2, a.vec_id LIMIT 5""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val viaDf = ops.Similarity.knnL2(Tables.embeddings(spark, sf), 0L, 5)
      .select(col("vec_id"), col("dist_sq"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(viaSql == viaDf)
  }
}
