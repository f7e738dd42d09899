package graft.oracles

/** Shared DuckDB-side SQL fragments for the oracle families (split out of
  * `SparkEntry`, r12): macros mirroring graft.functions.VectorFunctions,
  * the MinHash candidate CTEs, and the CRM entity CTEs.
  */
private[graft] object Sql {

  // DuckDB-side macros mirroring graft.functions.VectorFunctions exactly
  // (sequential float64 folds — verified bitwise-identical to Spark's
  // aggregate/zip_with HOFs).
  def l2sqSql(a: String, b: String): String =
    s"list_sum(list_transform(list_zip($a, $b), x -> (x[1]-x[2])*(x[1]-x[2])))"
  def dotSql(a: String, b: String): String =
    s"list_sum(list_transform(list_zip($a, $b), x -> x[1]*x[2]))"

  // MinHash-LSH candidate generation + exact-Jaccard verify (DuckDB side of
  // graft.ops.Dedup.minhashDupPairs) — shared by the pairs, clusters, and
  // clean-corpus oracles so all three see the identical candidate set.
  val minhashCtes =
    """w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents WHERE len(string_split(text, ' ')) >= 3),
      |sh AS (SELECT DISTINCT doc_id, shingle FROM (
      |  SELECT doc_id, unnest(list_transform(range(1, len(w)-1), i -> array_to_string(w[i:i+2], ' '))) AS shingle FROM w)),
      |mh AS (SELECT doc_id, h, min(substr(md5((h // 4) || '|' || shingle), (h % 4) * 8 + 1, 8)) AS mh
      |       FROM sh CROSS JOIN range(0, 12) t(h) GROUP BY doc_id, h),
      |bands AS (SELECT doc_id, h // 3 AS band_id, md5(string_agg(mh, '|' ORDER BY h)) AS band_key
      |          FROM mh GROUP BY doc_id, h // 3),
      |cand AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_shared_bands
      |         FROM bands a JOIN bands b ON a.band_id = b.band_id AND a.band_key = b.band_key AND a.doc_id < b.doc_id
      |         GROUP BY 1, 2),
      |sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
      |inter AS (SELECT c.doc_a, c.doc_b, c.n_shared_bands, COUNT(*) AS n_inter
      |          FROM cand c JOIN sh sa ON sa.doc_id = c.doc_a
      |          JOIN sh sb ON sb.doc_id = c.doc_b AND sa.shingle = sb.shingle
      |          GROUP BY 1, 2, 3)""".stripMargin
  val minhashScored =
    """SELECT i.doc_a, i.doc_b, i.n_shared_bands,
      |    CAST(i.n_inter AS DOUBLE) / CAST(na.n_sh + nb.n_sh - i.n_inter AS DOUBLE) AS jaccard
      |  FROM inter i JOIN sizes na ON na.doc_id = i.doc_a JOIN sizes nb ON nb.doc_id = i.doc_b""".stripMargin

  // Shared CRM-view CTE bodies (DuckDB side of graft.crm.CrmViews).
  val companiesCte =
    """companies AS (
      |  SELECT s_suppkey, CAST(s_suppkey AS VARCHAR) AS id, s_name AS name, n_name AS industry,
      |    lower(replace(s_name, '#', '')) || '.com' AS domain,
      |    lm.last_ship AS hs_lastmodifieddate
      |  FROM supplier JOIN nation ON s_nationkey = n_nationkey
      |  JOIN (SELECT l_suppkey, max(l_shipdate) AS last_ship FROM lineitem GROUP BY l_suppkey) lm
      |    ON lm.l_suppkey = s_suppkey)""".stripMargin
  val contactsCte =
    """contacts AS (
      |  SELECT c_custkey, CAST(c_custkey AS VARCHAR) AS id,
      |    substr(c_name, 1, 8) AS firstname, substr(c_name, 10, 9) AS lastname,
      |    substr(c_name, 10, 9) || '@' || lower(c_mktsegment) || '.example.com' AS email,
      |    '+' || c_nationkey || '-' || c_custkey AS phone,
      |    coalesce(lo.last_order, TIMESTAMP '1995-01-01') AS hs_lastmodifieddate
      |  FROM customer LEFT JOIN (SELECT o_custkey, max(o_orderdate) AS last_order FROM orders GROUP BY o_custkey) lo
      |    ON lo.o_custkey = c_custkey)""".stripMargin
  val ticketsCte =
    """tickets AS (
      |  SELECT o_orderkey, CAST(o_orderkey AS VARCHAR) AS id,
      |    'Order ' || o_orderkey AS subject,
      |    o_orderpriority AS hs_ticket_priority,
      |    CASE o_orderstatus WHEN 'F' THEN '4' WHEN 'P' THEN '2' ELSE '1' END AS hs_pipeline_stage,
      |    CASE WHEN o_orderstatus = 'F' THEN 'closed' ELSE 'open' END AS hs_ticket_status,
      |    o_orderdate AS createdate,
      |    CASE WHEN o_orderstatus = 'F' THEN o_orderdate + INTERVAL 30 DAY END AS closedate,
      |    o_orderdate + INTERVAL 15 DAY AS hs_lastmodifieddate
      |  FROM orders)""".stripMargin
  val messagesCte =
    """messages AS (
      |  SELECT l_orderkey AS thread_id,
      |    l_orderkey * 10 + l_linenumber AS message_id,
      |    CASE WHEN l_returnflag = 'N' THEN 'MESSAGE' WHEN l_returnflag = 'R' THEN 'SYSTEM_NOTICE' ELSE 'COMMENT' END AS msg_type,
      |    l_shipdate AS created_at,
      |    'part ' || l_partkey || ' qty ' || CAST(l_quantity AS INT) AS text,
      |    repeat('part ' || l_partkey || ' qty ' || CAST(l_quantity AS INT), 30) AS rich_text,
      |    CASE WHEN l_linestatus = 'F' THEN '0-1-' || l_suppkey ELSE '3-' || l_suppkey END AS actor_id,
      |    CASE WHEN l_linenumber % 3 = 0 THEN 'TO' ELSE 'FROM' END AS sender_field,
      |    l_linenumber
      |  FROM lineitem)""".stripMargin
  val engagementsCte =
    """engagements AS (
      |  SELECT event_id AS engagement_id,
      |    CASE event_type WHEN 'view' THEN 'NOTE' WHEN 'click' THEN 'TASK'
      |      WHEN 'purchase' THEN 'MEETING' WHEN 'error' THEN 'CALL' ELSE 'EMAIL' END AS etype,
      |    ts, value, user_id, props,
      |    user_id % (SELECT count(*) FROM supplier) + 1 AS company_key
      |  FROM events)""".stripMargin
  val fmtTs = "'%Y-%m-%d %H:%M:%S'"

}
