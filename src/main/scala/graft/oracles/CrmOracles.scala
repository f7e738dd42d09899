package graft.oracles

/** DuckDB oracle SQL for the `crm_*` registrations — split out of
  * `SparkEntry` (r12). Entries are byte-identical to the pre-split map;
  * oracle_sql.json is the diff-checked contract.
  */
private[graft] object CrmOracles {

  import Sql._

  val sql: Map[String, String] = Map(
    "crm_active_companies" ->
      s"""WITH $companiesCte
        |SELECT id, name, industry, domain,
        |  strftime(hs_lastmodifieddate, $fmtTs) AS hs_lastmodifieddate
        |FROM companies ORDER BY strftime(hs_lastmodifieddate, $fmtTs) DESC, s_suppkey LIMIT 10""".stripMargin,
    "crm_active_contacts" ->
      s"""WITH $contactsCte
        |SELECT id, firstname, lastname, email, phone,
        |  strftime(hs_lastmodifieddate, $fmtTs) AS lastmodifieddate
        |FROM contacts ORDER BY strftime(hs_lastmodifieddate, $fmtTs) DESC, c_custkey LIMIT 10""".stripMargin,
    "crm_tickets_default" ->
      s"""WITH $ticketsCte,
        |cut AS (SELECT max(o_orderdate) - INTERVAL 90 DAY AS cutoff FROM orders)
        |SELECT id, subject, hs_ticket_priority, hs_pipeline_stage, hs_ticket_status,
        |  strftime(createdate, $fmtTs) AS createdate,
        |  strftime(closedate, $fmtTs) AS closedate,
        |  strftime(hs_lastmodifieddate, $fmtTs) AS hs_lastmodifieddate
        |FROM tickets, cut
        |WHERE closedate > cutoff OR hs_lastmodifieddate > cutoff
        |ORDER BY strftime(hs_lastmodifieddate, $fmtTs) DESC, o_orderkey LIMIT 50""".stripMargin,
    "crm_tickets_closed" ->
      s"""WITH $ticketsCte
        |SELECT id, subject, hs_pipeline_stage, hs_ticket_status,
        |  strftime(closedate, $fmtTs) AS closedate,
        |  strftime(hs_lastmodifieddate, $fmtTs) AS hs_lastmodifieddate
        |FROM tickets
        |WHERE hs_pipeline_stage = '4' OR hs_ticket_status = 'closed'
        |ORDER BY strftime(hs_lastmodifieddate, $fmtTs) DESC, o_orderkey LIMIT 50""".stripMargin,
    "crm_recent_conversations" ->
      s"""WITH $messagesCte,
        |threads AS (SELECT o_orderkey AS thread_id, o_orderdate AS thread_created_at
        |            FROM orders ORDER BY o_orderkey DESC LIMIT 10),
        |m AS (SELECT *,
        |    CASE WHEN l_linenumber = 7 THEN 'UNKNOWN'
        |         WHEN sender_field = 'FROM' AND (actor_id LIKE '0-1%' OR actor_id LIKE '0-2%') THEN 'AGENT'
        |         ELSE 'CUSTOMER' END AS sender_type,
        |    substr(rich_text, 1, 200) AS truncated
        |  FROM messages WHERE msg_type = 'MESSAGE'),
        |fm AS (SELECT thread_id, truncated AS first_msg_truncated FROM (
        |    SELECT thread_id, truncated,
        |      row_number() OVER (PARTITION BY thread_id ORDER BY created_at, message_id) AS rn FROM m)
        |  WHERE rn = 1),
        |agg AS (SELECT t.thread_id, t.thread_created_at,
        |    COUNT(m.message_id) AS n_messages,
        |    CAST(COALESCE(SUM(CASE WHEN m.sender_type = 'AGENT' THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_agent,
        |    CAST(COALESCE(SUM(CASE WHEN m.sender_type = 'CUSTOMER' THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_customer,
        |    CAST(COALESCE(SUM(CASE WHEN m.sender_type = 'UNKNOWN' THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_unknown,
        |    MIN(m.created_at) AS first_ts, MAX(m.created_at) AS last_ts
        |  FROM threads t LEFT JOIN m ON m.thread_id = t.thread_id
        |  GROUP BY t.thread_id, t.thread_created_at)
        |SELECT a.thread_id, strftime(a.thread_created_at, $fmtTs) AS thread_created_at,
        |  n_messages, n_agent, n_customer, n_unknown,
        |  strftime(first_ts, $fmtTs) AS first_ts, strftime(last_ts, $fmtTs) AS last_ts,
        |  fm.first_msg_truncated
        |FROM agg a LEFT JOIN fm ON fm.thread_id = a.thread_id
        |ORDER BY a.thread_id DESC""".stripMargin,
    "crm_company_activity" ->
      s"""WITH $engagementsCte, $companiesCte,
        |e AS (SELECT *, CAST(CAST(value AS DECIMAL(18,2)) AS VARCHAR) AS vstr FROM engagements),
        |c2 AS (SELECT *, CASE etype
        |    WHEN 'NOTE' THEN 'note: k=' || json_extract_string(props, '$$.k')
        |    WHEN 'TASK' THEN 'task status ' || CASE WHEN value > 10 THEN 'DONE' ELSE 'PENDING' END
        |    WHEN 'MEETING' THEN 'meeting value ' || vstr
        |    WHEN 'CALL' THEN 'call ms ' || CAST(CAST(value AS DECIMAL(18,2)) * 1000 AS VARCHAR)
        |    ELSE 'email subject signup#' || engagement_id END AS content
        |  FROM e),
        |capped AS (SELECT * FROM (
        |    SELECT *, row_number() OVER (PARTITION BY company_key ORDER BY ts, engagement_id) AS rn
        |    FROM c2) WHERE rn <= 500)
        |SELECT company_key, name AS company_name, engagement_id, etype, content,
        |  strftime(ts, $fmtTs) AS ts
        |FROM capped JOIN companies ON company_key = s_suppkey
        |ORDER BY company_key, engagement_id""".stripMargin,
    "crm_create_contacts" ->
      s"""WITH $contactsCte,
        |cand AS (SELECT 'Customer' AS firstname,
        |    lpad(CAST(s_suppkey * 17 AS VARCHAR), 9, '0') AS lastname,
        |    s_suppkey AS cand_key FROM supplier)
        |SELECT cand_key, cand.firstname, cand.lastname,
        |  CASE WHEN ex.ex_lastname IS NOT NULL THEN 'exists' ELSE 'insert' END AS action
        |FROM cand LEFT JOIN (SELECT firstname AS ex_firstname, lastname AS ex_lastname FROM contacts) ex
        |  ON cand.firstname = ex.ex_firstname AND cand.lastname = ex.ex_lastname
        |ORDER BY cand_key""".stripMargin,
    "crm_ticket_threads" ->
      s"""WITH $ticketsCte, $messagesCte,
        |sel AS (SELECT o_orderkey AS ticket_key, id AS ticket_id, createdate
        |  FROM tickets
        |  WHERE hs_pipeline_stage = '4' OR hs_ticket_status = 'closed'
        |  ORDER BY strftime(hs_lastmodifieddate, $fmtTs) DESC, o_orderkey LIMIT 20),
        |selc AS (SELECT sel.*, o.o_custkey FROM sel JOIN orders o ON o.o_orderkey = sel.ticket_key),
        |edges AS (SELECT ticket_key, ticket_id, thread_id FROM (
        |    SELECT s.ticket_key, s.ticket_id, o.o_orderkey AS thread_id,
        |      row_number() OVER (PARTITION BY s.ticket_key
        |        ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
        |    FROM selc s JOIN orders o ON o.o_custkey = s.o_custkey AND o.o_orderdate <= s.createdate)
        |  WHERE rn <= 3),
        |m AS (SELECT thread_id, message_id, created_at,
        |    CASE WHEN l_linenumber = 7 THEN 'UNKNOWN'
        |         WHEN sender_field = 'FROM' AND (actor_id LIKE '0-1%' OR actor_id LIKE '0-2%') THEN 'AGENT'
        |         ELSE 'CUSTOMER' END AS sender_type,
        |    text
        |  FROM messages WHERE msg_type = 'MESSAGE')
        |SELECT e.ticket_id, e.thread_id,
        |  COALESCE(m.message_id, -1) AS message_id,
        |  COALESCE(strftime(m.created_at, $fmtTs), '') AS created_at,
        |  COALESCE(m.sender_type, '') AS sender_type,
        |  COALESCE(m.text, '') AS text
        |FROM edges e LEFT JOIN m ON m.thread_id = e.thread_id
        |ORDER BY CAST(e.ticket_id AS BIGINT), e.thread_id, created_at, message_id""".stripMargin,
    "crm_create_companies" ->
      s"""WITH $companiesCte,
        |base AS (SELECT s_suppkey, s_name FROM supplier WHERE s_suppkey <= 100),
        |cand AS (
        |  SELECT s_suppkey AS cand_key, s_name AS name FROM base
        |  UNION ALL
        |  SELECT s_suppkey + 100000 AS cand_key, 'Startup#' || s_suppkey AS name FROM base)
        |SELECT cand_key, cand.name,
        |  CASE WHEN c.id IS NOT NULL THEN 'exists' ELSE 'insert' END AS action,
        |  COALESCE(c.id, '') AS existing_id
        |FROM cand LEFT JOIN companies c ON cand.name = c.name
        |ORDER BY cand_key""".stripMargin,
    "crm_recent_emails" ->
      s"""WITH eid AS (
        |  SELECT *, md5(l_orderkey || '|' || l_linenumber || '|' || l_suppkey || '|'
        |      || l_partkey || '|' || strftime(l_shipdate, $fmtTs)) AS email_id
        |  FROM lineitem),
        |email_ids AS (
        |  SELECT email_id, l_returnflag = 'A' AS archived, l_shipdate AS created_at FROM eid),
        |email_details AS (
        |  SELECT email_id,
        |    'Re: Order ' || l_orderkey AS subject,
        |    'supplier' || l_suppkey || '@corp.example.com' AS from_email,
        |    'buyer' || l_partkey || '@client.example.com' AS to_email,
        |    CASE WHEN l_linestatus = 'F' THEN 'shipped qty ' || CAST(l_quantity AS INT) END AS text,
        |    '<p>order ' || l_orderkey || ' line ' || l_linenumber || '</p>' AS html,
        |    l_shipdate + INTERVAL 3 DAY AS updated_at
        |  FROM eid)
        |SELECT i.email_id AS id, d.subject, d.from_email, d.to_email,
        |  COALESCE(d.text, d.html) AS body,
        |  strftime(i.created_at, $fmtTs) AS created_at,
        |  strftime(d.updated_at, $fmtTs) AS updated_at
        |FROM email_ids i JOIN email_details d ON d.email_id = i.email_id
        |WHERE NOT i.archived
        |ORDER BY strftime(i.created_at, $fmtTs) DESC, i.email_id LIMIT 50""".stripMargin,
  )
}
