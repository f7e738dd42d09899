package graft

import org.apache.spark.sql.SparkSession

/** SQL-surface registration: every base table, every CRM-shaped view, and
  * the native vector functions become nameable from `spark.sql(...)` — the
  * whole engine is usable SQL-first as well as DataFrame-first (SURVEY §7
  * design stance: declarative plans either way, same Catalyst pipeline).
  */
object GraftCatalog {

  /** Register base tables, derived CRM views, and native functions as
    * temp views/functions on this session, reading from `dir`.
    */
  def register(spark: SparkSession, dir: String): Unit = {
    functions.GraftFunctions.register(spark)
    Tables.names.foreach {
      case "events" => Tables.events(spark, dir).createOrReplaceTempView("events")
      case n => Tables.load(spark, dir, n).createOrReplaceTempView(n)
    }
    crm.CrmViews.companies(spark, dir).createOrReplaceTempView("companies")
    crm.CrmViews.contacts(spark, dir).createOrReplaceTempView("contacts")
    crm.CrmViews.tickets(spark, dir).createOrReplaceTempView("tickets")
    crm.CrmViews.messages(spark, dir).createOrReplaceTempView("messages")
    crm.CrmViews.engagements(spark, dir).createOrReplaceTempView("engagements")
    crm.CrmViews.emailIds(spark, dir).createOrReplaceTempView("email_ids")
    crm.CrmViews.emailDetails(spark, dir).createOrReplaceTempView("email_details")
  }
}
