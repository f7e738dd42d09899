package graft

import java.nio.file.{Files, Path, Paths}

/** Golden JSON outputs for the tool-equivalents at sf0.001 (SURVEY §5: the
  * reference dumps JSON without asserting; we pin it). Record-on-first-run:
  * a missing golden is written (and committed); thereafter any drift in
  * row content, order, or schema fails.
  */
class GoldenSpec extends SparkSpec {

  private val goldenDir = Paths.get("src/test/resources/golden")

  private def checkText(name: String, got: String): Unit = {
    val f = goldenDir.resolve(s"$name.jsonl")
    if (!Files.exists(f)) {
      Files.createDirectories(goldenDir)
      Files.writeString(f, got)
      info(s"recorded golden $name (${got.linesIterator.size} rows)")
    } else {
      assert(got == Files.readString(f), s"golden drift in $name")
    }
  }

  private def check(name: String, df: org.apache.spark.sql.DataFrame): Unit =
    checkText(name, df.toJSON.collect().mkString("\n"))

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

  test("tool response ENVELOPES match recorded goldens — all nine tools (API-tier drift protection)") {
    import graft.api.GraftApi
    // Serialize the typed Page envelope exactly as the API tier shapes it:
    // {results, total, after} — results via the case-class Encoder's JSON
    // (field order = case-class declaration order, deterministic).
    def env[T <: Product](p: GraftApi.Page[T])(
        implicit enc: org.apache.spark.sql.Encoder[T]): String = {
      val rows = spark.createDataset(p.results)(enc).toJSON.collect().mkString("[", ",", "]")
      val after = p.after.map("\"" + _ + "\"").getOrElse("null")
      s"""{"results":$rows,"total":${p.total},"after":$after}"""
    }
    import spark.implicits._
    checkText("envelope_active_companies", env(GraftApi.getActiveCompanies(spark, sf)))
    checkText("envelope_active_contacts", env(GraftApi.getActiveContacts(spark, sf)))
    checkText("envelope_tickets_default", env(GraftApi.getTickets(spark, sf, limit = 10)))
    checkText("envelope_recent_emails", env(GraftApi.getRecentEmails(spark, sf, limit = 10)))
    checkText("envelope_recent_conversations",
      env(GraftApi.getRecentConversations(spark, sf, limit = 5)))
    checkText("envelope_company_activity",
      env(GraftApi.getCompanyActivity(spark, sf, fanoutCap = 5)))
    checkText("envelope_ticket_threads",
      env(GraftApi.getTicketThreads(spark, sf, nTickets = 5)))
    checkText("envelope_create_companies", env(GraftApi.createCompanies(spark, sf)))
    checkText("envelope_create_contacts", env(GraftApi.createContacts(spark, sf)))
    // The search tool's envelope, over a deterministic just-built index.
    val dir = java.nio.file.Files.createTempDirectory("graft-golden-idx").toString + "/idx"
    val docs = Tables.documents(spark, sf).limit(50)
    graft.vector.IndexPipeline.indexRecords(docs, "text", "document", dir,
      java.sql.Date.valueOf("2024-03-01"))
    val probe = docs.orderBy(org.apache.spark.sql.functions.col("doc_id"))
      .select("text").head.getString(0)
    checkText("envelope_search_data", env(GraftApi.searchData(spark, dir, probe, 5)))
    // The error envelope: structured, never a thrown exception.
    val err = GraftApi.guarded(GraftApi.getTickets(spark, sf, criteria = "bogus"))
      .left.map(e => s"""{"error":"${e.error}"}""").left.getOrElse(fail("expected error"))
    checkText("envelope_error", err)
  }

  test("curation outputs match recorded goldens") {
    val docs = Tables.documents(spark, sf)
    check("doc_repetition_head", ops.Curation.repetitionSignals(docs).limit(20))
    check("doc_pack_head", ops.Curation.packSequences(docs).limit(20))
    check("doc_tokenize_head",
      ops.Curation.tokenize(docs, ops.Curation.buildVocab(docs, 16)).limit(20))
    check("vec_range_search", ops.Similarity.rangeSearch(Tables.embeddings(spark, sf)))
    check("vec_semantic_dedup_head",
      ops.Similarity.semanticDedup(Tables.embeddings(spark, sf), 0.42).limit(20))
    check("doc_mix", ops.Sampling.mixCorpus(docs,
      Map("src0" -> 0.5, "src1" -> 0.3, "src2" -> 0.2), 2000L))
    check("doc_mix_epochs_head", ops.Sampling.mixCorpusEpochs(docs,
      Map("src0" -> 0.5, "src1" -> 0.3, "src2" -> 0.2), 8000L).limit(30))
    check("doc_chunks_head", ops.Curation.chunkDocs(docs).limit(20))
    check("doc_heavy_hitters", ops.TextAnalysis.heavyHitters(docs))
    check("doc_search", ops.TextAnalysis.searchDocs(docs, Seq("spark", "join")))
    check("doc_target_select_head", ops.TextAnalysis.selectByRelevance(
      docs.filter(org.apache.spark.sql.functions.col("doc_id") % 97 =!= 0),
      docs.filter(org.apache.spark.sql.functions.col("doc_id") % 97 === 0), 20))
    check("doc_decontam_bloom", ops.Curation.contaminatedDocsBloom(
      docs.filter(org.apache.spark.sql.functions.col("doc_id") % 97 =!= 0),
      docs.filter(org.apache.spark.sql.functions.col("doc_id") % 97 === 0)))
    check("vec_sq_search", vector.SqIndex.searchExact(Tables.embeddings(spark, sf)))
  }

  test("round-6 operator heads match recorded goldens") {
    import org.apache.spark.sql.functions._
    import graft.multimodal.{Multimodal, PngCodec}
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
    check("doc_winnow_pairs_head", ops.Dedup.winnowDupPairs(docs, minShared = 1).limit(20))
    check("doc_split_repair_head", ops.Sampling.repairSplitLeakage(docs).limit(30))
    check("doc_oov_rate",
      ops.Curation.vocabCoverage(docs, ops.Curation.buildVocab(docs, 16)))
    check("doc_strip_markup_head", ops.Curation.stripMarkup(
      docs.select(col("doc_id"),
        concat(lit("<p>"), col("text"), lit("</p><div>footer</div>")).as("text"))).limit(10))
    val media = docs.limit(12).select(col("doc_id")).as[Long].map { id =>
      val px = Array.tabulate(256)(p => ((id * 31 + p) % 256).toInt)
      Multimodal.MediaRow(id, "image", PngCodec.encodeGray(px, 16, 16))
    }
    check("mm_image_hashes", Multimodal.imageHashes(media).toDF()
      .orderBy(col("doc_id")))
  }
}
