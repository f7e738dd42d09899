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
  def ticketsDefault(s: SparkSession, d: String, limit: Int = 50): DataFrame =
    ticketsDefaultView(s, d)
      .orderBy(col("hs_lastmodifieddate").desc, col("id").cast("long"))
      .limit(limit)

  /** Unlimited, UNSORTED "default"-criteria tickets — the pagination base.
    * The facade applies (keyset filter → orderBy → limit) exactly once on
    * top, so each page lowers to one TakeOrderedAndProject instead of a
    * global sort followed by a re-sort (`GraftApi.getTickets`).
    */
  def ticketsDefaultView(s: SparkSession, d: String): DataFrame = {
    val cutoff = Tables.orders(s, d)
      .agg((max(col("o_orderdate")) - expr("INTERVAL 90 DAY")).as("cutoff"))
    CrmViews.tickets(s, d)
      .crossJoin(broadcast(cutoff))
      .filter(col("closedate") > col("cutoff") || col("hs_lastmodifieddate") > col("cutoff"))
      .select(col("id"), col("subject"), col("hs_ticket_priority"), col("hs_pipeline_stage"),
        col("hs_ticket_status"), tsS(col("createdate")).as("createdate"),
        tsS(col("closedate")).as("closedate"),
        tsS(col("hs_lastmodifieddate")).as("hs_lastmodifieddate"))
  }

  /** hubspot_get_tickets criteria="closed" (P2/P4,
    * `clients/ticket_client.py:118-146`): stage "4" OR status "closed".
    */
  def ticketsClosed(s: SparkSession, d: String, limit: Int = 50): DataFrame =
    ticketsClosedView(s, d)
      .orderBy(col("hs_lastmodifieddate").desc, col("id").cast("long"))
      .limit(limit)

  /** Unlimited, unsorted "closed"-criteria tickets (pagination base). */
  def ticketsClosedView(s: SparkSession, d: String): DataFrame =
    CrmViews.tickets(s, d)
      .filter(col("hs_pipeline_stage") === "4" || col("hs_ticket_status") === "closed")
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

  import org.apache.spark.sql.types._

  /** Email-participant struct (`company_client.py:212-230`), derived
    * deterministically from a numeric tag.
    */
  private def participant(tag: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    struct(
      concat(lit("user "), tag.cast("string")).as("raw"),
      concat(lit("user"), tag.cast("string"), lit("@example.com")).as("email"),
      lit("User").as("firstName"),
      tag.cast("string").as("lastName"))

  private val participantType = StructType(Seq(
    StructField("raw", StringType), StructField("email", StringType),
    StructField("firstName", StringType), StructField("lastName", StringType)))

  /** The tagged-union content schema (R2 full fidelity): one nullable
    * per-type struct field, exactly one non-null per row — the Spark
    * StructType analog of `company_client.py:180-283`'s per-type dicts.
    */
  val engagementContentType: StructType = StructType(Seq(
    StructField("note", StructType(Seq(StructField("body", StringType)))),
    StructField("email", StructType(Seq(
      StructField("subject", StringType),
      StructField("from", participantType),
      StructField("to", ArrayType(participantType)),
      StructField("cc", ArrayType(participantType)),
      StructField("bcc", ArrayType(participantType)),
      StructField("sender", StructType(Seq(StructField("email", StringType)))),
      StructField("body", StringType)))),
    StructField("task", StructType(Seq(
      StructField("subject", StringType), StructField("body", StringType),
      StructField("status", StringType), StructField("for_object_type", StringType)))),
    StructField("meeting", StructType(Seq(
      StructField("title", StringType), StructField("body", StringType),
      StructField("start_time", StringType), StructField("end_time", StringType),
      StructField("internal_notes", StringType)))),
    StructField("call", StructType(Seq(
      StructField("body", StringType), StructField("from_number", StringType),
      StructField("to_number", StringType), StructField("duration_ms", DoubleType),
      StructField("status", StringType), StructField("disposition", StringType))))))

  // What actually rides through the fan-out cap: just the three source
  // fields content derives from. Both the rendered string and the typed
  // struct are rebuilt AFTER the cap, on ≤cap rows per company — the
  // pre-cap scan carries ~30 bytes of JSON per row instead of a fully
  // rendered participant-array struct.
  private val packedSrcType = StructType(Seq(
    StructField("v", DoubleType), StructField("u", LongType), StructField("k", StringType)))

  /** hubspot_get_company_activity (J1/R1/R2/A-cap,
    * `clients/company_client.py:67-283`): association join to engagements,
    * tagged-union content dispatch, 500-per-company fan-out cap.
    * Oracle-checked shape — the typed struct column is dropped here; see
    * `companyActivityTyped` for the full-fidelity output.
    */
  def companyActivity(s: SparkSession, d: String, fanoutCap: Int = 500): DataFrame =
    companyActivityTyped(s, d, fanoutCap).drop("content_struct")

  /** Full-fidelity variant: every row carries `content_struct`, the
    * per-type StructType content (EMAIL with from/to[]/cc[]/bcc[]
    * participants, MEETING with start/end times, CALL with numbers and
    * duration_ms — `company_client.py:194-283`), alongside the rendered
    * `content` string the oracle checks.
    *
    * Scale shape: the three SOURCE fields content derives from (value,
    * user_id, props.k — ~30 bytes of JSON) ride through the bounded
    * earliest-k aggregate's content channel; the rendered string AND the
    * typed struct are both built after the cap, on ≤cap rows per company.
    * Full fidelity therefore costs zero extra joins or shuffles, and the
    * pre-cap scan never materializes a participant-array struct for rows
    * the cap will drop.
    */
  def companyActivityTyped(s: SparkSession, d: String, fanoutCap: Int = 500): DataFrame = {
    // Fan-out cap WITHOUT a full per-company window sort: the bounded
    // earliest-k aggregate keeps at most 2k rows buffered per group and
    // partially aggregates map-side, so a hot company's 10^8-engagement
    // history never sorts in one task (reference cap: company_client.py:97).
    // Catalyst-native TypedImperativeAggregate: the buffer lives as a JVM
    // object inside ObjectHashAggregate — no per-row Encoder round-trip.
    val capped = CrmViews.engagements(s, d)
      .withColumn("packed", to_json(struct(
        col("value").as("v"), col("user_id").as("u"),
        get_json_object(col("props"), "$.k").as("k"))))
      .groupBy(col("company_key"))
      .agg(graft.functions.TopKAggregator.earliestK(fanoutCap,
        col("ts"), col("engagement_id"), col("etype"), col("packed")).as("top"))
      .select(col("company_key"), explode(col("top")).as("e"))
      .select(col("company_key"), col("e.engagement_id").as("engagement_id"),
        col("e.etype").as("etype"), col("e.ts").as("ts"),
        from_json(col("e.content"), packedSrcType).as("p"))
    val v = col("p.v"); val u = col("p.u"); val k = col("p.k")
    val vstr = v.cast("decimal(18,2)").cast("string")
    val withContent = capped
      .withColumn("content", // R2 rendered strings (oracle-checked output)
        when(col("etype") === "NOTE", concat(lit("note: k="), k))
          .when(col("etype") === "TASK",
            concat(lit("task status "), when(v > 10, "DONE").otherwise("PENDING")))
          .when(col("etype") === "MEETING", concat(lit("meeting value "), vstr))
          .when(col("etype") === "CALL",
            concat(lit("call ms "), (v.cast("decimal(18,2)") * 1000).cast("string")))
          .otherwise(concat(lit("email subject signup#"), col("engagement_id").cast("string"))))
      .withColumn("content_struct", struct( // R2 typed structs: one branch non-null
        when(col("etype") === "NOTE", struct(
          concat(lit("note: k="), k).as("body"))).as("note"),
        when(col("etype") === "EMAIL", struct(
          concat(lit("signup#"), col("engagement_id").cast("string")).as("subject"),
          participant(u).as("from"),
          array(participant(col("company_key"))).as("to"),
          // cc populated only for high-value engagements, bcc always empty:
          // both still carry the array<participant> shape through parquet.
          slice(array(participant(u + 1)), lit(1),
            when(v > 30, 1).otherwise(0)).as("cc"),
          slice(array(participant(u)), lit(1), lit(0)).as("bcc"),
          struct(concat(lit("user"), u.cast("string"),
            lit("@example.com")).as("email")).as("sender"),
          coalesce(k, lit("")).as("body"))).as("email"),
        when(col("etype") === "TASK", struct(
          concat(lit("Task #"), col("engagement_id").cast("string")).as("subject"),
          lit("").as("body"),
          when(v > 10, "DONE").otherwise("PENDING").as("status"),
          lit("COMPANY").as("for_object_type"))).as("task"),
        when(col("etype") === "MEETING", struct(
          concat(lit("Meeting #"), col("engagement_id").cast("string")).as("title"),
          vstr.as("body"),
          tsS(col("ts")).as("start_time"),
          tsS(col("ts") + expr("INTERVAL 1 HOUR")).as("end_time"),
          lit("").as("internal_notes"))).as("meeting"),
        when(col("etype") === "CALL", struct(
          lit("").as("body"),
          concat(lit("+1-"), u.cast("string")).as("from_number"),
          concat(lit("+1-"), col("company_key").cast("string")).as("to_number"),
          (v * 1000).as("duration_ms"),
          lit("COMPLETED").as("status"),
          lit("ANSWERED").as("disposition"))).as("call")))
    withContent
      .join(CrmViews.companies(s, d), col("company_key") === col("s_suppkey")) // J1
      .select(col("company_key"), col("name").as("company_name"),
        col("engagement_id"), col("etype"), col("content"), tsS(col("ts")).as("ts"),
        col("content_struct"))
      .orderBy(col("company_key"), col("engagement_id"))
  }

  /** hubspot_get_ticket_conversation_threads (J2/S9/R6/R7,
    * `clients/ticket_client.py:255-338` + `:356-399` + handler `:133`):
    * tickets (closed criteria) → association edges → threads → messages,
    * slim-formatted `{id, created_at, sender_type, text}` per message,
    * messages sorted by creation time, empty threads kept (the reference
    * emits a thread with `messages: []`; flattened here as a single
    * sentinel row so the result stays oracle-checkable).
    *
    * The association edge (ticket → conversation, SURVEY §1.1.2) is derived
    * deterministically: a ticket associates to its customer's
    * `threadsPerTicket` most recent threads as of the ticket's create date.
    *
    * Scale shape: the selected-ticket set is tiny (nTickets rows), so every
    * step is a broadcast join against it — edges never shuffle the orders
    * table, and messages are semi-join-pruned to the edge threads BEFORE the
    * left join, so the big fact table is touched by exactly one
    * broadcast-pruned scan.
    */
  def ticketConversationThreads(s: SparkSession, d: String, nTickets: Int = 20,
      threadsPerTicket: Int = 3): DataFrame = {
    val sel = CrmViews.tickets(s, d)
      .filter(col("hs_pipeline_stage") === "4" || col("hs_ticket_status") === "closed")
      .orderBy(col("hs_lastmodifieddate").desc, col("o_orderkey"))
      .limit(nTickets)
      .select(col("o_orderkey").as("ticket_key"), col("id").as("ticket_id"), col("createdate"))
    // S9: the association edge scan — recover the customer for each selected
    // ticket, then rank the customer's threads by recency at ticket time.
    val selCust = broadcast(sel)
      .join(Tables.orders(s, d).select(col("o_orderkey").as("ticket_key"), col("o_custkey")),
        Seq("ticket_key"))
    val threads = Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderkey").as("thread_id"),
        col("o_orderdate").as("thread_created"))
    val edges = broadcast(selCust).join(threads, Seq("o_custkey"))
      .filter(col("thread_created") <= col("createdate"))
      .withColumn("rn", row_number().over(Window.partitionBy(col("ticket_key"))
        .orderBy(col("thread_created").desc, col("thread_id").desc)))
      .filter(col("rn") <= threadsPerTicket)
      .select(col("ticket_key"), col("ticket_id"), col("thread_id"))
    // S6/P6/R6/R7: per-thread messages, actual MESSAGEs only, slim format.
    val msgs = CrmViews.messages(s, d)
      .filter(col("msg_type") === "MESSAGE") // ticket_client.py:381 type filter
      .join(broadcast(edges.select(col("thread_id")).distinct()), Seq("thread_id"), "left_semi")
      .withColumn("sender_type", // R7 (ticket_client.py:441-458)
        when(col("l_linenumber") === 7, "UNKNOWN")
          .when(col("sender_field") === "FROM" &&
            (col("actor_id").startsWith("0-1") || col("actor_id").startsWith("0-2")), "AGENT")
          .otherwise("CUSTOMER"))
      .select(col("thread_id"), col("message_id"), col("created_at"),
        col("sender_type"), col("text"))
    edges.join(broadcast(msgs), Seq("thread_id"), "left")
      .select(col("ticket_id"), col("thread_id"),
        coalesce(col("message_id"), lit(-1L)).as("message_id"),
        coalesce(tsS(col("created_at")), lit("")).as("created_at"),
        coalesce(col("sender_type"), lit("")).as("sender_type"),
        coalesce(col("text"), lit("")).as("text"))
      .orderBy(col("ticket_id").cast("long"), col("thread_id"),
        col("created_at"), col("message_id"))
  }

  /** Emails read path (S4 + J4 + R3/P7,
    * `clients/conversation_client.py:65-146`), in the reference's own
    * order of operations — which is also the right plan: page the
    * NON-ARCHIVED ENVELOPE first (filter + top-k lowers to one
    * TakeOrderedAndProject over the id scan), then batch-lookup details for
    * only the page (the batches-of-10 REST loop becomes one broadcast
    * equi-join of the ≤limit-row page against the details scan — SURVEY
    * §2.4 J4). Joining details before paging would drag the full detail
    * table through the sort for a 50-row answer.
    */
  def recentEmails(s: SparkSession, d: String, limit: Int = 50): DataFrame =
    emailPage(s, d, limit, after = None)
      .drop("created_at_ts", "email_id")

  /** Envelope-paged emails with keyset resume; keeps the raw timestamp +
    * numeric id as cursor columns for the facade. `after` = (formatted ts,
    * id) of the last row of the previous page.
    */
  def emailPage(s: SparkSession, d: String, limit: Int,
      after: Option[(String, String)]): DataFrame = {
    val env = CrmViews.emailIds(s, d).filter(!col("archived")) // P7 on the envelope scan
    val resumed = after match {
      case Some((ts, id)) =>
        env.filter(tsS(col("created_at")) < ts ||
          (tsS(col("created_at")) === ts && col("email_id") > id))
      case None => env
    }
    val page = resumed.orderBy(col("created_at").desc, col("email_id")).limit(limit)
    // J4: detail lookup for the page only. Joining on the NATURAL row key
    // (not the md5 id) means the detail scan never computes the hash for
    // the 599,950 rows that aren't in the page.
    CrmViews.emailDetails(s, d)
      .join(broadcast(page), CrmViews.emailJoinKey)
      .select(col("email_id"), col("created_at").as("created_at_ts"),
        col("email_id").as("id"), col("subject"),
        col("from_email"), col("to_email"),
        coalesce(col("text"), col("html")).as("body"), // R3
        tsS(col("created_at")).as("created_at"), tsS(col("updated_at")).as("updated_at"))
      .orderBy(col("created_at_ts").desc, col("email_id"))
  }

  /** hubspot_create_company dedup-create path (S14,
    * `handlers/company_handler.py:68-131`): EQ-search on name; existing
    * names report "exists" with the found record's id, fresh names report
    * "insert" — the company flavor of the dedup-create anti/semi join.
    */
  def createCompaniesDedup(s: SparkSession, d: String): DataFrame = {
    val base = Tables.supplier(s, d).filter(col("s_suppkey") <= 100)
    // Candidate batch: half collide with existing company names by
    // construction, half are fresh.
    val candidates = base.select(col("s_suppkey").as("cand_key"), col("s_name").as("name"))
      .unionByName(base.select((col("s_suppkey") + 100000).as("cand_key"),
        concat(lit("Startup#"), col("s_suppkey").cast("string")).as("name")))
    val existing = CrmViews.companies(s, d)
      .select(col("name").as("ex_name"), col("id").as("existing_id"))
    candidates
      .join(existing, col("name") === col("ex_name"), "left")
      .select(col("cand_key"), col("name"),
        when(col("existing_id").isNotNull, "exists").otherwise("insert").as("action"),
        coalesce(col("existing_id"), lit("")).as("existing_id"))
      .orderBy(col("cand_key"))
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
