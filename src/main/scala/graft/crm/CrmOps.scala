package graft.crm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Num.tsS

/** The reference's tool surface re-expressed as Spark transforms — one op
  * per MCP tool (SURVEY.md §3 lifecycles). Remote search-API pushdown
  * becomes Catalyst pushdown; the per-ID REST loops become joins.
  */
object CrmOps {

  /** hubspot_get_active_companies (S1/O1/P1/R8,
    * `clients/company_client.py:31-65`): recency top-k + ISO output.
    */
  def activeCompanies(s: SparkSession, d: String, limit: Int = 10): DataFrame =
    CrmViews.companies(s, d)
      .orderBy(col("hs_lastmodifieddate").desc, col("s_suppkey"))
      .limit(limit)
      .select(col("id"), col("name"), col("industry"), col("domain"),
        tsS(col("hs_lastmodifieddate")).as("hs_lastmodifieddate"))

  /** hubspot_get_active_contacts (S2, `clients/contact_client.py:31-66`). */
  def activeContacts(s: SparkSession, d: String, limit: Int = 10): DataFrame =
    CrmViews.contacts(s, d)
      .orderBy(col("hs_lastmodifieddate").desc, col("c_custkey"))
      .limit(limit)
      .select(col("id"), col("firstname"), col("lastname"), col("email"), col("phone"),
        tsS(col("hs_lastmodifieddate")).as("lastmodifieddate"))

  /** hubspot_get_tickets criteria="default" (S3/P3/P4/O2,
    * `clients/ticket_client.py:84-116`): OR of two single-filter groups on
    * close/modified dates, relative to the corpus "now" (max order date —
    * the explicit asOf of SURVEY §7 hard-part 6).
    */
  def ticketsDefault(s: SparkSession, d: String, limit: Int = 50): DataFrame = {
    val cutoff = Tables.orders(s, d)
      .agg((max(col("o_orderdate")) - expr("INTERVAL 90 DAY")).as("cutoff"))
    CrmViews.tickets(s, d)
      .crossJoin(broadcast(cutoff))
      .filter(col("closedate") > col("cutoff") || col("hs_lastmodifieddate") > col("cutoff"))
      .orderBy(col("hs_lastmodifieddate").desc, col("o_orderkey"))
      .limit(limit)
      .select(col("id"), col("subject"), col("hs_ticket_priority"), col("hs_pipeline_stage"),
        col("hs_ticket_status"), tsS(col("createdate")).as("createdate"),
        tsS(col("closedate")).as("closedate"),
        tsS(col("hs_lastmodifieddate")).as("hs_lastmodifieddate"))
  }

  /** hubspot_get_tickets criteria="closed" (P2/P4,
    * `clients/ticket_client.py:118-146`): stage "4" OR status "closed".
    */
  def ticketsClosed(s: SparkSession, d: String, limit: Int = 50): DataFrame =
    CrmViews.tickets(s, d)
      .filter(col("hs_pipeline_stage") === "4" || col("hs_ticket_status") === "closed")
      .orderBy(col("hs_lastmodifieddate").desc, col("o_orderkey"))
      .limit(limit)
      .select(col("id"), col("subject"), col("hs_pipeline_stage"), col("hs_ticket_status"),
        tsS(col("closedate")).as("closedate"),
        tsS(col("hs_lastmodifieddate")).as("hs_lastmodifieddate"))

  /** hubspot_get_recent_conversations (S5/J3/P6/O3/O4/R4-R7/R9, SURVEY
    * §3.3): top threads by id desc, left-joined to type-filtered messages,
    * sender classification, 200-char truncation, ordered first-message
    * extraction via the thread window.
    */
  def recentConversations(s: SparkSession, d: String, limit: Int = 10): DataFrame = {
    val threads = Tables.orders(s, d)
      .orderBy(col("o_orderkey").desc).limit(limit)
      .select(col("o_orderkey").as("thread_id"), col("o_orderdate").as("thread_created_at"))
    // Prune messages to the selected threads BEFORE any window/agg: the
    // thread set is tiny (limit rows), so this is a broadcast semi-join and
    // the later per-thread sort touches only surviving threads — at corpus
    // scale the unpruned plan would sort every thread's messages for a
    // 10-thread answer.
    val msgs = CrmViews.messages(s, d)
      .filter(col("msg_type") === "MESSAGE") // P6
      .join(broadcast(threads.select(col("thread_id"))), Seq("thread_id"), "left_semi")
      .withColumn("sender_type", // R7 classifier
        when(col("l_linenumber") === 7, "UNKNOWN")
          .when(col("sender_field") === "FROM" &&
            (col("actor_id").startsWith("0-1") || col("actor_id").startsWith("0-2")), "AGENT")
          .otherwise("CUSTOMER"))
      .withColumn("truncated", substring(col("rich_text"), 1, 200)) // R9
    val w = Window.partitionBy(col("thread_id")).orderBy(col("created_at"), col("message_id"))
    val firstMsg = msgs.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("thread_id"), col("truncated").as("first_msg_truncated"))
    threads
      .join(msgs, Seq("thread_id"), "left")
      .groupBy(col("thread_id"), col("thread_created_at"))
      .agg(
        count(col("message_id")).as("n_messages"),
        sum(when(col("sender_type") === "AGENT", 1).otherwise(0)).as("n_agent"),
        sum(when(col("sender_type") === "CUSTOMER", 1).otherwise(0)).as("n_customer"),
        sum(when(col("sender_type") === "UNKNOWN", 1).otherwise(0)).as("n_unknown"),
        min(col("created_at")).as("first_ts"), max(col("created_at")).as("last_ts"))
      .join(firstMsg, Seq("thread_id"), "left")
      .select(col("thread_id"), tsS(col("thread_created_at")).as("thread_created_at"),
        col("n_messages"), col("n_agent"), col("n_customer"), col("n_unknown"),
        tsS(col("first_ts")).as("first_ts"), tsS(col("last_ts")).as("last_ts"),
        col("first_msg_truncated"))
      .orderBy(col("thread_id").desc)
  }

  /** hubspot_get_company_activity (J1/R1/R2/A-cap,
    * `clients/company_client.py:67-283`): association join to engagements,
    * tagged-union content dispatch, 500-per-company fan-out cap.
    */
  def companyActivity(s: SparkSession, d: String, fanoutCap: Int = 500): DataFrame = {
    val eng = CrmViews.engagements(s, d)
      .withColumn("vstr", col("value").cast("decimal(18,2)").cast("string"))
      .withColumn("content", // R2: per-type content structs as strings
        when(col("etype") === "NOTE",
          concat(lit("note: k="), get_json_object(col("props"), "$.k")))
          .when(col("etype") === "TASK",
            concat(lit("task status "), when(col("value") > 10, "DONE").otherwise("PENDING")))
          .when(col("etype") === "MEETING", concat(lit("meeting value "), col("vstr")))
          .when(col("etype") === "CALL",
            concat(lit("call ms "), (col("value").cast("decimal(18,2)") * 1000).cast("string")))
          .otherwise(concat(lit("email subject signup#"), col("engagement_id").cast("string"))))
    val capped = eng.withColumn("rn",
        row_number().over(Window.partitionBy(col("company_key"))
          .orderBy(col("ts"), col("engagement_id"))))
      .filter(col("rn") <= fanoutCap)
    capped
      .join(CrmViews.companies(s, d), col("company_key") === col("s_suppkey")) // J1
      .select(col("company_key"), col("name").as("company_name"),
        col("engagement_id"), col("etype"), col("content"), tsS(col("ts")).as("ts"))
      .orderBy(col("company_key"), col("engagement_id"))
  }

  /** hubspot_create_contact dedup path (J5/S15,
    * `clients/contact_client.py:100-150`): candidate inserts are checked
    * against existing contacts on the business key; one output covers both
    * the "exists" report (semi) and the insert set (anti).
    */
  def createContactsDedup(s: SparkSession, d: String): DataFrame = {
    val candidates = Tables.supplier(s, d).select(
      lit("Customer").as("firstname"),
      lpad((col("s_suppkey") * 17).cast("string"), 9, "0").as("lastname"),
      col("s_suppkey").as("cand_key"))
    val existing = CrmViews.contacts(s, d)
      .select(col("firstname").as("ex_firstname"), col("lastname").as("ex_lastname"))
    candidates
      .join(existing,
        col("firstname") === col("ex_firstname") && col("lastname") === col("ex_lastname"),
        "left")
      .select(col("cand_key"), col("firstname"), col("lastname"),
        when(col("ex_lastname").isNotNull, "exists").otherwise("insert").as("action"))
      .orderBy(col("cand_key"))
  }
}
