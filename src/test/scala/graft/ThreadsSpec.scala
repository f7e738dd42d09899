package graft

import org.apache.spark.sql.functions._
import graft.crm.Threads

class ThreadsSpec extends SparkSpec {

  test("nested messages carry the reference sender/recipient struct shape") {
    val m = Threads.messagesNested(spark, sf)
    val schema = m.schema("senders").dataType.simpleString
    assert(schema.contains("actorId:string") && schema.contains("deliveryIdentifier:struct"))
    // linenumber-7 rows simulate the empty-senders UNKNOWN branch
    assert(m.filter(size(col("senders")) === 0).count() > 0)
  }

  test("P9 higher-order filter keeps only email recipients") {
    Threads.messagesExtracted(spark, sf).select(
        size(col("email_recipients")).as("n"), col("message_id")).collect().foreach { r =>
      val expected = if (r.getAs[Long]("message_id") % 3 == 0) 1 else 2
      assert(r.getAs[Int]("n") == expected)
    }
  }

  test("R5 sender email extraction: empty string for empty senders") {
    val rows = Threads.messagesExtracted(spark, sf).collect()
    rows.foreach { r =>
      if (r.getAs[Int]("n_senders") == 0) assert(r.getAs[String]("sender_email") == "")
      else assert(r.getAs[String]("sender_email").endsWith("@crm.example.com"))
    }
  }

  test("threadsNested: messages arrays are time-ordered and counted") {
    val out = Threads.threadsNested(spark, sf).collect()
    assert(out.length == 10)
    out.foreach { t =>
      val msgs = t.getSeq[org.apache.spark.sql.Row](t.fieldIndex("messages"))
      assert(t.getAs[Int]("total_messages") == msgs.length)
      val times = msgs.map(_.getAs[java.time.LocalDateTime]("created_at"))
      assert(times == times.sortBy(_.toString))
    }
  }
}
