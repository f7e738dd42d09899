package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.ops._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each `queries` entry is a named operator from SURVEY.md §2 (or a scale
  * extension), implemented Spark-first in graft.ops / graft.crm /
  * graft.vector; each `oracleSql` entry is the equivalent ANSI SQL the
  * driver runs in DuckDB over the same parquet tables. Column names and
  * output ordering match exactly on both sides; numeric aggregates are
  * decimal-exact (graft.functions.Num) so hashes match bit-for-bit.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.pricingSummary(Tables.lineitem(spark, "/root/testdata/sf0.001"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- relational core (SURVEY §2.2-2.8) ----
    "q1_pricing_summary" -> ((s, d) => Relational.pricingSummary(Tables.lineitem(s, d))),
    "q3_shipping_priority" -> ((s, d) =>
      Relational.shippingPriority(Tables.customer(s, d), Tables.orders(s, d), Tables.lineitem(s, d))),
    "q5_local_supplier" -> ((s, d) =>
      Relational.localSupplierVolume(Tables.region(s, d), Tables.nation(s, d), Tables.customer(s, d),
        Tables.orders(s, d), Tables.lineitem(s, d), Tables.supplier(s, d))),
    "q6_revenue_forecast" -> ((s, d) => Relational.revenueForecast(Tables.lineitem(s, d))),
    "q_window_running" -> ((s, d) => Relational.supplierRunningShipments(Tables.lineitem(s, d))),
    "q_rollup_returns" -> ((s, d) => Relational.returnsRollup(Tables.lineitem(s, d))),
    "q_setops_nations" -> ((s, d) =>
      Relational.nationSetOps(Tables.nation(s, d), Tables.customer(s, d), Tables.supplier(s, d))),
    "q_order_stats" -> ((s, d) => Relational.orderStats(Tables.orders(s, d))),
    "q_topk_parts" -> ((s, d) => Relational.topExpensiveParts(Tables.part(s, d))),
    "q_anti_join" -> ((s, d) =>
      Relational.customersWithoutOrders(Tables.customer(s, d), Tables.orders(s, d))),
    "q_semi_join" -> ((s, d) =>
      Relational.customersWithUrgentOrders(Tables.customer(s, d), Tables.orders(s, d))),
    // ---- event analytics (SURVEY §2.10 batch forms) ----
    "ev_tumbling_hourly" -> ((s, d) => Events.tumblingHourly(Tables.events(s, d))),
    "ev_sessionize" -> ((s, d) => Events.sessionize(Tables.events(s, d))),
    "ev_json_buckets" -> ((s, d) => Events.jsonPropBuckets(Tables.events(s, d))),
    "ev_top_users" -> ((s, d) => Events.topUsers(Tables.events(s, d), Tables.customer(s, d))),
    // ---- similarity search / vector index (SURVEY §3.1, scale extensions) ----
    "vec_knn_l2" -> ((s, d) => Similarity.knnL2(Tables.embeddings(s, d))),
    "vec_knn_cosine" -> ((s, d) => Similarity.knnCosine(Tables.embeddings(s, d))),
    "vec_ivf_search" -> ((s, d) => Similarity.ivfSearch(Tables.embeddings(s, d))),
    "vec_dup_pairs" -> ((s, d) => Similarity.cosineDupPairs(Tables.embeddings(s, d), 0.42)),
    "vec_index_prune" -> ((s, d) => graft.vector.VectorIndex.pruneStats(Tables.embeddings(s, d))),
    "vec_index_search" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val qv = emb.filter(org.apache.spark.sql.functions.col("vec_id") === 0L)
        .select("embedding").head.getSeq[Float](0)
      graft.vector.VectorIndex.search(graft.vector.VectorIndex.fromEmbeddings(emb), qv)
    }),
  )

  // DuckDB-side macros mirroring graft.functions.VectorFunctions exactly
  // (sequential float64 folds — verified bitwise-identical to Spark's
  // aggregate/zip_with HOFs).
  private def l2sqSql(a: String, b: String): String =
    s"list_sum(list_transform(list_zip($a, $b), x -> (x[1]-x[2])*(x[1]-x[2])))"
  private def dotSql(a: String, b: String): String =
    s"list_sum(list_transform(list_zip($a, $b), x -> x[1]*x[2]))"

  def oracleSql: Map[String, String] = Map(
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_qty,
        |  CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_disc,
        |  COUNT(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '2001-06-01'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q3_shipping_priority" ->
      """SELECT l_orderkey,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        |  strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS o_orderdate, o_orderpriority
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1998-06-01'
        |  AND l_shipdate > TIMESTAMP '1998-06-01'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,
    "q5_local_supplier" ->
      """SELECT n_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA' AND o_orderdate >= TIMESTAMP '1997-01-01'
        |  AND o_orderdate < TIMESTAMP '1999-01-01'
        |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin,
    "q6_revenue_forecast" ->
      """SELECT
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_rows
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
        |  AND l_discount BETWEEN 0.02 AND 0.04 AND l_quantity < 24""".stripMargin,
    "q_window_running" ->
      """SELECT l_suppkey, rn, l_orderkey, l_linenumber, l_quantity, running_qty, ship_ts
        |FROM (
        |  SELECT l_suppkey,
        |    row_number() OVER w AS rn, l_orderkey, l_linenumber, l_quantity,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) OVER (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_qty,
        |    strftime(l_shipdate, '%Y-%m-%d %H:%M:%S') AS ship_ts
        |  FROM lineitem
        |  WINDOW w AS (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber)
        |) WHERE rn <= 3 ORDER BY l_suppkey, rn""".stripMargin,
    "q_rollup_returns" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
        |  coalesce(l_linestatus, 'ALL') AS linestatus,
        |  COUNT(*) AS n_rows,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY returnflag, linestatus""".stripMargin,
    "q_setops_nations" ->
      """WITH cn AS (SELECT DISTINCT n_name FROM nation JOIN customer ON c_nationkey = n_nationkey WHERE c_acctbal > 7000),
        |     sn AS (SELECT DISTINCT n_name FROM nation JOIN supplier ON s_nationkey = n_nationkey WHERE s_acctbal > 5000)
        |SELECT n_name, set_op FROM (
        |  SELECT n_name, 'both' AS set_op FROM (SELECT n_name FROM cn INTERSECT SELECT n_name FROM sn)
        |  UNION ALL
        |  SELECT n_name, 'cust_only' AS set_op FROM (SELECT n_name FROM cn EXCEPT SELECT n_name FROM sn)
        |) ORDER BY set_op, n_name""".stripMargin,
    "q_order_stats" ->
      """SELECT o_orderstatus, COUNT(*) AS n_orders,
        |  COUNT(DISTINCT o_custkey) AS n_customers,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q_topk_parts" ->
      """SELECT p_partkey, p_name, p_type,
        |  CAST(CAST(p_retailprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) + CAST(0.1 AS DECIMAL(18,2))) AS DOUBLE) AS adj_price
        |FROM part ORDER BY adj_price DESC, p_partkey LIMIT 20""".stripMargin,
    "q_anti_join" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin,
    "q_semi_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin,
    "ev_tumbling_hourly" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_ts,
        |  event_type, COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "ev_sessionize" ->
      """WITH g AS (
        |  SELECT user_id, ts, event_id, value,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |         OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000 THEN 1 ELSE 0 END AS new_s
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |), s AS (
        |  SELECT user_id, value,
        |    SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        |  FROM g
        |)
        |SELECT user_id, MAX(session_id) AS n_sessions, COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM s GROUP BY user_id ORDER BY user_id""".stripMargin,
    "ev_json_buckets" ->
      """SELECT CAST(json_extract_string(props, '$.k') AS INT) % 10 AS k_bucket,
        |  COUNT(*) AS n_events, SUM(CAST(json_extract_string(props, '$.k') AS INT)) AS sum_k
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "ev_top_users" ->
      """SELECT user_id, c_name,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
        |  COUNT(*) AS n_events
        |FROM events JOIN customer ON user_id + 1 = c_custkey
        |GROUP BY user_id, c_name ORDER BY total_value DESC, user_id LIMIT 10""".stripMargin,
    "vec_knn_l2" ->
      s"""WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qe FROM embeddings WHERE vec_id = 0),
        |d AS (SELECT e.vec_id, e.label, ${l2sqSql("CAST(e.embedding AS DOUBLE[])", "q.qe")} AS d2
        |      FROM embeddings e, q)
        |SELECT CAST(row_number() OVER (ORDER BY d2, vec_id) AS BIGINT) AS rank, vec_id, label,
        |  round(d2, 6) AS dist_sq, round(1.0 - d2/2.0, 6) AS similarity
        |FROM (SELECT * FROM d ORDER BY d2, vec_id LIMIT 10) ORDER BY d2, vec_id""".stripMargin,
    "vec_knn_cosine" ->
      s"""WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qe FROM embeddings WHERE vec_id = 0),
        |d AS (SELECT e.vec_id, e.label,
        |  ${dotSql("CAST(e.embedding AS DOUBLE[])", "q.qe")} /
        |  (sqrt(${dotSql("CAST(e.embedding AS DOUBLE[])", "CAST(e.embedding AS DOUBLE[])")}) * sqrt(${dotSql("q.qe", "q.qe")})) AS cos
        |  FROM embeddings e, q)
        |SELECT vec_id, label, round(cos, 6) AS cos_sim
        |FROM d ORDER BY cos DESC, vec_id LIMIT 10""".stripMargin,
    "vec_ivf_search" ->
      s"""WITH emb AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        |c AS (SELECT vec_id AS cid, e AS ce FROM emb WHERE vec_id < 8),
        |q AS (SELECT e AS qe FROM emb WHERE vec_id = 0),
        |asn AS (SELECT vec_id, label, e, cid FROM (
        |  SELECT emb.vec_id, emb.label, emb.e, c.cid,
        |    row_number() OVER (PARTITION BY emb.vec_id ORDER BY ${l2sqSql("emb.e", "c.ce")}, c.cid) AS arn
        |  FROM emb, c) WHERE arn = 1),
        |probe AS (SELECT cid FROM (SELECT c.cid, ${l2sqSql("c.ce", "q.qe")} AS qd2 FROM c, q ORDER BY qd2, cid LIMIT 2))
        |SELECT vec_id, label, cid, round(d2, 6) AS dist_sq FROM (
        |  SELECT a.vec_id, a.label, a.cid, ${l2sqSql("a.e", "q.qe")} AS d2
        |  FROM asn a JOIN probe USING (cid), q
        |  ORDER BY d2, vec_id LIMIT 10) ORDER BY d2, vec_id""".stripMargin,
    "vec_dup_pairs" ->
      s"""WITH n AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        |m AS (SELECT vec_id, e, sqrt(${dotSql("e", "e")}) AS nrm FROM n)
        |SELECT vec_id_a, vec_id_b, round(cos, 6) AS cos_sim FROM (
        |  SELECT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b,
        |    ${dotSql("a.e", "b.e")} / (a.nrm * b.nrm) AS cos
        |  FROM m a JOIN m b ON a.vec_id < b.vec_id)
        |WHERE cos >= 0.42 ORDER BY vec_id_a, vec_id_b""".stripMargin,
    "vec_index_prune" ->
      """WITH idx AS (SELECT vec_id, DATE '2024-01-01' + CAST(vec_id % 10 AS INT) AS ingest_date FROM embeddings),
        |mx AS (SELECT max(ingest_date) AS mxd FROM idx)
        |SELECT strftime(ingest_date, '%Y-%m-%d') AS ingest_day,
        |  COUNT(*) AS n_vectors, MIN(vec_id) AS min_vec_id
        |FROM idx, mx WHERE ingest_date > mxd - 7
        |GROUP BY ingest_date ORDER BY 1""".stripMargin,
    "vec_index_search" ->
      s"""WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qe FROM embeddings WHERE vec_id = 0),
        |d AS (SELECT e.vec_id, e.label, ${l2sqSql("CAST(e.embedding AS DOUBLE[])", "q.qe")} AS d2
        |      FROM embeddings e, q)
        |SELECT CAST(row_number() OVER (ORDER BY d2, vec_id) AS BIGINT) AS rank,
        |  round(1.0 - d2/2.0, 6) AS similarity_score,
        |  'embedding' AS data_type,
        |  '{"vec_id":' || vec_id || ',"label":' || label || '}' AS data_json
        |FROM (SELECT * FROM d ORDER BY d2, vec_id LIMIT 10) ORDER BY d2, vec_id""".stripMargin,
  )
}
