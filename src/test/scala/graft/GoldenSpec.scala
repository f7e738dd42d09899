package graft

import java.nio.file.{Files, Path, Paths}

/** Golden JSON outputs for the tool-equivalents at sf0.001 (SURVEY §5: the
  * reference dumps JSON without asserting; we pin it). Record-on-first-run:
  * a missing golden is written (and committed); thereafter any drift in
  * row content, order, or schema fails.
  */
class GoldenSpec extends SparkSpec {

  private val goldenDir = Paths.get("src/test/resources/golden")

  private def check(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
    val got = df.toJSON.collect().mkString("\n")
    val f = goldenDir.resolve(s"$name.jsonl")
    if (!Files.exists(f)) {
      Files.createDirectories(goldenDir)
      Files.writeString(f, got)
      info(s"recorded golden $name (${got.linesIterator.size} rows)")
    } else {
      assert(got == Files.readString(f), s"golden drift in $name")
    }
  }

  test("tool outputs match recorded goldens") {
    check("crm_active_companies", crm.CrmOps.activeCompanies(spark, sf))
    check("crm_active_contacts", crm.CrmOps.activeContacts(spark, sf))
    check("crm_tickets_default", crm.CrmOps.ticketsDefault(spark, sf))
    check("crm_tickets_closed", crm.CrmOps.ticketsClosed(spark, sf))
    check("crm_recent_conversations", crm.CrmOps.recentConversations(spark, sf))
    check("crm_create_contacts", crm.CrmOps.createContactsDedup(spark, sf))
    check("crm_create_companies", crm.CrmOps.createCompaniesDedup(spark, sf))
    check("crm_ticket_threads", crm.CrmOps.ticketConversationThreads(spark, sf))
    check("crm_recent_emails", crm.CrmOps.recentEmails(spark, sf, 20))
    check("vec_knn_l2", ops.Similarity.knnL2(Tables.embeddings(spark, sf)))
  }

  test("curation outputs match recorded goldens") {
    val docs = Tables.documents(spark, sf)
    check("doc_repetition_head", ops.Curation.repetitionSignals(docs).limit(20))
    check("doc_pack_head", ops.Curation.packSequences(docs).limit(20))
    check("doc_tokenize_head",
      ops.Curation.tokenize(docs, ops.Curation.buildVocab(docs, 16)).limit(20))
    check("vec_range_search", ops.Similarity.rangeSearch(Tables.embeddings(spark, sf)))
  }
}
