package graft

import graft.crm.CrmOps

class CrmSpec extends SparkSpec {

  test("active companies: k rows, ISO timestamps, recency-ordered") {
    val out = CrmOps.activeCompanies(spark, sf).collect()
    assert(out.length == 10)
    val ts = out.map(_.getAs[String]("hs_lastmodifieddate"))
    ts.foreach(t => assert(t.matches("\\d{4}-\\d{2}-\\d{2} \\d{2}:\\d{2}:\\d{2}")))
    assert(ts.sameElements(ts.sorted.reverse))
  }

  test("closed tickets are exactly the stage-4 tickets") {
    val closed = CrmOps.ticketsClosed(spark, sf, limit = 1000000).collect()
    closed.foreach { r =>
      assert(r.getAs[String]("hs_pipeline_stage") == "4")
      assert(r.getAs[String]("hs_ticket_status") == "closed")
      assert(r.getAs[String]("closedate") != null)
    }
  }

  test("default-criteria tickets respect the 90-day OR-filter") {
    val out = CrmOps.ticketsDefault(spark, sf, limit = 1000000).collect()
    assert(out.nonEmpty)
    // every selected ticket has closedate or lastmodified in the window;
    // lastmodifieddate ordering is the search sort
    val lm = out.map(_.getAs[String]("hs_lastmodifieddate"))
    assert(lm.sameElements(lm.sorted.reverse))
  }

  test("conversation truncation caps message text at 200 chars") {
    CrmOps.recentConversations(spark, sf).collect().foreach { r =>
      val t = r.getAs[String]("first_msg_truncated")
      if (t != null) assert(t.length <= 200)
      val n = r.getAs[Long]("n_messages")
      assert(n == r.getAs[Long]("n_agent") + r.getAs[Long]("n_customer") + r.getAs[Long]("n_unknown"))
    }
  }

  test("company activity honors the per-company fan-out cap") {
    val out = CrmOps.companyActivity(spark, sf, fanoutCap = 5)
    val counts = out.groupBy("company_key").count().collect()
    counts.foreach(r => assert(r.getAs[Long]("count") <= 5))
  }

  test("native earliest-k aggregate equals the window formulation, plans object-hash partial agg") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val eng = graft.crm.CrmViews.engagements(spark, sf)
      .select(col("company_key"), col("ts"), col("engagement_id"),
        col("etype"), lit("x").as("content"))
    val agg = eng.groupBy(col("company_key"))
      .agg(graft.functions.TopKAggregator.earliestK(7,
        col("ts"), col("engagement_id"), col("etype"), col("content")).as("top"))
      .select(col("company_key"), explode(col("top")).as("e"))
      .select(col("company_key"), col("e.ts").as("ts"),
        col("e.engagement_id").as("engagement_id"), col("e.etype").as("etype"))
    val win = eng
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("company_key")).orderBy(col("ts"), col("engagement_id"))))
      .filter(col("rn") <= 7)
      .select(col("company_key"), col("ts"), col("engagement_id"), col("etype"))
    val a = agg.collect().map(_.toString).sorted
    val w = win.collect().map(_.toString).sorted
    assert(a.sameElements(w))
    // Plan shape: object-hash aggregate with a partial earliest_k pass —
    // the buffer combines map-side, so skewed groups never full-sort.
    val plan = agg.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), s"expected ObjectHashAggregate:\n$plan")
    assert(plan.contains("partial_earliest_k"), s"expected partial earliest_k:\n$plan")
  }

  test("create-contact dedup splits candidates into exists/insert") {
    val out = CrmOps.createContactsDedup(spark, sf).collect()
    val actions = out.map(_.getAs[String]("action")).toSet
    assert(actions == Set("exists", "insert"))
  }

  test("typed engagement content: tagged-union struct schema with participant arrays") {
    import org.apache.spark.sql.types._
    val df = CrmOps.companyActivityTyped(spark, sf)
    // Declared schema is the per-type StructType (company_client.py:194-283).
    val cs = df.schema("content_struct").dataType.asInstanceOf[StructType]
    assert(cs.fieldNames.toSeq == Seq("note", "email", "task", "meeting", "call"))
    // The produced column matches the DECLARED public schema exactly
    // (modulo nullability, which when()-branches widen).
    assert(cs.catalogString == CrmOps.engagementContentType.catalogString,
      s"content_struct diverged from engagementContentType:\n${cs.catalogString}")
    val email = cs("email").dataType.asInstanceOf[StructType]
    assert(email("to").dataType.isInstanceOf[ArrayType] &&
      email("cc").dataType.isInstanceOf[ArrayType] &&
      email("bcc").dataType.isInstanceOf[ArrayType])
    assert(email("from").dataType.asInstanceOf[StructType].fieldNames.toSeq ==
      Seq("raw", "email", "firstName", "lastName"))

    // Tagged-union invariant: exactly the branch matching etype is non-null.
    val rows = df.collect()
    assert(rows.nonEmpty)
    val branchIdx = Map("NOTE" -> 0, "EMAIL" -> 1, "TASK" -> 2, "MEETING" -> 3, "CALL" -> 4)
    rows.foreach { r =>
      val s = r.getStruct(r.fieldIndex("content_struct"))
      val nonNull = (0 until 5).filter(i => !s.isNullAt(i))
      assert(nonNull == Seq(branchIdx(r.getAs[String]("etype"))),
        s"row ${r.getAs[Long]("engagement_id")} etype=${r.getAs[String]("etype")} branches=$nonNull")
    }

    // Golden: an EMAIL row carries from + to[1] participants and the
    // subject that also appears in the rendered string.
    val e = rows.find(_.getAs[String]("etype") == "EMAIL").get
    val es = e.getStruct(e.fieldIndex("content_struct")).getStruct(1)
    assert(es.getSeq[org.apache.spark.sql.Row](2).size == 1) // to
    val from = es.getStruct(1)
    assert(from.getString(1).startsWith("user") && from.getString(1).endsWith("@example.com"))
    assert(e.getAs[String]("content") == s"email subject ${es.getString(0)}")

    // The rendered string column is unchanged vs the oracle-checked op.
    val plain = CrmOps.companyActivity(spark, sf)
    assert(plain.columns.toSeq ==
      Seq("company_key", "company_name", "engagement_id", "etype", "content", "ts"))
    assert(plain.count() == df.count())
  }
}
