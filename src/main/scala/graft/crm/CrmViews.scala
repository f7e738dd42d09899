package graft.crm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** CRM-shaped views derived deterministically from the star schema
  * (FIXTURES.md §B): customer→contacts, supplier+nation→companies,
  * orders→tickets/threads, lineitem→messages, events→engagements.
  *
  * These reproduce the reference's record shapes (SURVEY.md §1.1): the
  * object envelope `{id, properties..., created/modified timestamps}`, the
  * tagged-union engagement, the per-thread message children, and the
  * association edges — but as typed columns instead of string property bags
  * (§1.3 mapping table).
  */
object CrmViews {

  /** companies — projection per `clients/company_client.py:64`; last-modified
    * derived as the supplier's latest shipment.
    */
  def companies(s: SparkSession, d: String): DataFrame = {
    val lastShip = Tables.lineitem(s, d).groupBy(col("l_suppkey"))
      .agg(max(col("l_shipdate")).as("hs_lastmodifieddate"))
    Tables.supplier(s, d)
      .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
      .join(lastShip, col("l_suppkey") === col("s_suppkey"))
      .select(
        col("s_suppkey"),
        col("s_suppkey").cast("string").as("id"),
        col("s_name").as("name"),
        col("n_name").as("industry"),
        concat(lower(regexp_replace(col("s_name"), "#", "")), lit(".com")).as("domain"),
        col("hs_lastmodifieddate"))
  }

  /** contacts — projection per `clients/contact_client.py:64-65`; lastmod =
    * latest order date (epoch default for order-less customers).
    */
  def contacts(s: SparkSession, d: String): DataFrame = {
    val lastOrder = Tables.orders(s, d).groupBy(col("o_custkey"))
      .agg(max(col("o_orderdate")).as("last_order"))
    Tables.customer(s, d)
      .join(lastOrder, col("o_custkey") === col("c_custkey"), "left")
      .select(
        col("c_custkey"),
        col("c_custkey").cast("string").as("id"),
        substring(col("c_name"), 1, 8).as("firstname"),
        substring(col("c_name"), 10, 9).as("lastname"),
        concat(substring(col("c_name"), 10, 9), lit("@"), lower(col("c_mktsegment")), lit(".example.com")).as("email"),
        concat(lit("+"), col("c_nationkey").cast("string"), lit("-"), col("c_custkey").cast("string")).as("phone"),
        coalesce(col("last_order"), lit("1995-01-01").cast("timestamp")).as("hs_lastmodifieddate"))
  }

  /** tickets — the 10-property projection per `clients/ticket_client.py:169-180`;
    * pipeline stage "4" == closed mirrors the reference's closed-criteria
    * constant (`clients/ticket_client.py:118-146`).
    */
  def tickets(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d).select(
      col("o_orderkey"),
      col("o_orderkey").cast("string").as("id"),
      concat(lit("Order "), col("o_orderkey").cast("string")).as("subject"),
      col("o_orderpriority").as("hs_ticket_priority"),
      when(col("o_orderstatus") === "F", "4")
        .when(col("o_orderstatus") === "P", "2").otherwise("1").as("hs_pipeline_stage"),
      when(col("o_orderstatus") === "F", "closed").otherwise("open").as("hs_ticket_status"),
      col("o_orderdate").as("createdate"),
      when(col("o_orderstatus") === "F", col("o_orderdate") + expr("INTERVAL 30 DAY")).as("closedate"),
      (col("o_orderdate") + expr("INTERVAL 15 DAY")).as("hs_lastmodifieddate"))

  /** messages — per-thread children (thread == order) with the sender
    * classification inputs of `clients/ticket_client.py:441-458`: actor ids
    * starting 0-1/0-2 are agents; linenumber 7 simulates the empty-senders
    * UNKNOWN branch; non-'MESSAGE' types exercise filter P6.
    */
  def messages(s: SparkSession, d: String): DataFrame = {
    val base = concat(lit("part "), col("l_partkey").cast("string"),
      lit(" qty "), col("l_quantity").cast("int").cast("string"))
    Tables.lineitem(s, d).select(
      col("l_orderkey").as("thread_id"),
      (col("l_orderkey") * 10 + col("l_linenumber")).as("message_id"),
      when(col("l_returnflag") === "N", "MESSAGE")
        .when(col("l_returnflag") === "R", "SYSTEM_NOTICE").otherwise("COMMENT").as("msg_type"),
      col("l_shipdate").as("created_at"),
      base.as("text"),
      repeat(base, 30).as("rich_text"),
      when(col("l_linestatus") === "F", concat(lit("0-1-"), col("l_suppkey").cast("string")))
        .otherwise(concat(lit("3-"), col("l_suppkey").cast("string"))).as("actor_id"),
      when(col("l_linenumber") % 3 === 0, "TO").otherwise("FROM").as("sender_field"),
      col("l_linenumber"))
  }

  /** emails — the reference's fifth CRM object, kept as TWO views so the
    * paged-envelope-scan → batch-detail-lookup dataflow (S4 + J4,
    * `clients/conversation_client.py:65-146`) is a real equi-join, not
    * synthesized away: the scan pages over the id envelope (id, archived,
    * created) and the details arrive via a second lookup keyed by id.
    */
  /** Unique deterministic email id: md5 over the minimal unique row key.
    * (orderkey, linenumber) alone is NOT unique in this synthetic lineitem;
    * adding suppkey, partkey and shipdate is — verified at every SF. Only
    * integer and formatted-timestamp columns go into the hash so any engine
    * renders the preimage identically.
    */
  private def emailIdCol = md5(concat_ws("|",
    col("l_orderkey").cast("string"), col("l_linenumber").cast("string"),
    col("l_suppkey").cast("string"), col("l_partkey").cast("string"),
    date_format(col("l_shipdate"), "yyyy-MM-dd HH:mm:ss")))

  /** Natural unique row key — kept on BOTH email views so the detail
    * lookup joins on raw columns and never has to materialize the md5 id
    * for rows that aren't in the page.
    */
  private val emailNaturalKey = Seq("nk_orderkey", "nk_linenumber", "nk_suppkey",
    "nk_partkey", "nk_shipdate")

  private def naturalKeyCols = Seq(
    col("l_orderkey").as("nk_orderkey"), col("l_linenumber").as("nk_linenumber"),
    col("l_suppkey").as("nk_suppkey"), col("l_partkey").as("nk_partkey"),
    col("l_shipdate").as("nk_shipdate"))

  def emailIds(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d).select(
      (emailIdCol.as("email_id") +: naturalKeyCols) ++ Seq(
        (col("l_returnflag") === "A").as("archived"),
        col("l_shipdate").as("created_at")): _*)

  /** email details — the batch-lookup side of J4; `text` is null for open
    * linestatus rows so `body = coalesce(text, html)` (R3,
    * `conversation_client.py:172`) exercises both branches.
    */
  def emailDetails(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d).select(naturalKeyCols ++ Seq(
      concat(lit("Re: Order "), col("l_orderkey").cast("string")).as("subject"),
      concat(lit("supplier"), col("l_suppkey").cast("string"), lit("@corp.example.com")).as("from_email"),
      concat(lit("buyer"), col("l_partkey").cast("string"), lit("@client.example.com")).as("to_email"),
      when(col("l_linestatus") === "F",
        concat(lit("shipped qty "), col("l_quantity").cast("int").cast("string"))).as("text"),
      concat(lit("<p>order "), col("l_orderkey").cast("string"),
        lit(" line "), col("l_linenumber").cast("string"), lit("</p>")).as("html"),
      (col("l_shipdate") + expr("INTERVAL 3 DAY")).as("updated_at")): _*)

  /** Join column names of the natural email row key (shared by the two
    * email views).
    */
  def emailJoinKey: Seq[String] = emailNaturalKey

  /** engagements — tagged union on type (`clients/company_client.py:171-283`)
    * derived from events; company association edge via user→supplier hash
    * (the (from_id, to_id) edge relation of SURVEY §1.1.2).
    */
  def engagements(s: SparkSession, d: String): DataFrame = {
    val nSupp = Tables.supplier(s, d).agg(count(lit(1)).as("n_supp"))
    Tables.events(s, d)
      .crossJoin(broadcast(nSupp))
      .select(
        col("event_id").as("engagement_id"),
        when(col("event_type") === "view", "NOTE")
          .when(col("event_type") === "click", "TASK")
          .when(col("event_type") === "purchase", "MEETING")
          .when(col("event_type") === "error", "CALL")
          .otherwise("EMAIL").as("etype"),
        col("ts"), col("value"), col("user_id"), col("props"),
        (col("user_id") % col("n_supp") + 1).as("company_key"))
  }
}
