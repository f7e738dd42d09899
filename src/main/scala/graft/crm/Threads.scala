package graft.crm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Full-fidelity thread/message nesting (SURVEY.md §1.1.3, §2 J3/R4/R5/P9/O4):
  * messages carry the reference's real nested shape —
  * `senders array<struct<actorId,name,senderField,deliveryIdentifier
  * struct<type,value>>>` and a recipients array
  * (`clients/conversation_client.py:400-453`) — and threads aggregate an
  * in-order message array (`collect_list(struct)` + `array_sort`, the 1:N
  * nest join of `clients/conversation_client.py:301-333`).
  */
object Threads {

  /** Messages with nested sender/recipient structs, derived
    * deterministically from lineitem (same mapping as CrmViews.messages,
    * plus the array-of-struct shape; linenumber 7 -> empty senders for the
    * UNKNOWN branch; every 3rd recipient identifier is non-email to
    * exercise filter P9).
    */
  def messagesNested(s: SparkSession, d: String): DataFrame = {
    val base = CrmViews.messages(s, d)
    base.select(col("thread_id"), col("message_id"), col("msg_type"),
      col("created_at"), col("text"),
      when(col("l_linenumber") === 7, array().cast("array<struct<actorId:string,name:string,senderField:string,deliveryIdentifier:struct<type:string,value:string>>>"))
        .otherwise(array(struct(
          col("actor_id").as("actorId"),
          concat(lit("actor-"), col("actor_id")).as("name"),
          col("sender_field").as("senderField"),
          struct(lit("HS_EMAIL_ADDRESS").as("type"),
            concat(col("actor_id"), lit("@crm.example.com")).as("value"))
            .as("deliveryIdentifier")))).as("senders"),
      array(
        struct(lit("TO").as("recipientField"),
          struct(lit("HS_EMAIL_ADDRESS").as("type"),
            concat(lit("to-"), col("message_id").cast("string"), lit("@crm.example.com")).as("value"))
            .as("deliveryIdentifier")),
        struct(lit("CC").as("recipientField"),
          struct(when(col("message_id") % 3 === 0, "HS_PHONE_NUMBER")
              .otherwise("HS_EMAIL_ADDRESS").as("type"),
            concat(lit("cc-"), col("message_id").cast("string")).as("value"))
            .as("deliveryIdentifier"))).as("recipients"))
  }

  /** R5 extraction over the nested shape: first sender's conditional email
    * (`clients/conversation_client.py:424-435` -> element_at + CASE) and
    * P9's higher-order recipient filter (keep HS_EMAIL_ADDRESS only).
    */
  def messagesExtracted(s: SparkSession, d: String): DataFrame =
    messagesNested(s, d)
      .withColumn("first_sender", try_element_at(col("senders"), lit(1)))
      .select(col("thread_id"), col("message_id"), col("msg_type"), col("created_at"), col("text"),
        when(col("first_sender").isNotNull &&
            col("first_sender.deliveryIdentifier.type") === "HS_EMAIL_ADDRESS",
          col("first_sender.deliveryIdentifier.value")).otherwise(lit("")).as("sender_email"),
        filter(col("recipients"),
          r => r.getField("deliveryIdentifier").getField("type") === "HS_EMAIL_ADDRESS")
          .as("email_recipients"),
        size(col("senders")).as("n_senders"))

  /** J3 + O4: threads with their type-filtered messages as an array sorted
    * by (created_at, message_id) — the dual view to the flattened
    * CrmOps.recentConversations.
    */
  def threadsNested(s: SparkSession, d: String, limit: Int = 10): DataFrame = {
    val threads = Tables.orders(s, d)
      .orderBy(col("o_orderkey").desc).limit(limit)
      .select(col("o_orderkey").as("thread_id"), col("o_orderdate").as("created_at"))
    val msgs = messagesExtracted(s, d)
      .filter(col("msg_type") === "MESSAGE")
      .select(col("thread_id"),
        struct(col("created_at"), col("message_id"), col("text"),
          col("sender_email"), col("n_senders")).as("m"))
    threads.join(msgs, Seq("thread_id"), "left")
      .groupBy(col("thread_id"), col("created_at"))
      .agg(array_sort(collect_list(col("m"))).as("messages"))
      .withColumn("total_messages", size(col("messages")))
      .orderBy(col("thread_id").desc)
  }
}
