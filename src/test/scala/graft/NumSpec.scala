package graft

import org.apache.spark.sql.functions._
import graft.functions.Num

/** Output-boundary formatter parity (`core/formatters.py:23-26`): offsets
  * render as "UTC±HH:MM" and are taken at each timestamp's own instant.
  */
class NumSpec extends SparkSpec {

  private def one(c: org.apache.spark.sql.Column): String = {
    import spark.implicits._
    Seq(1).toDF("x").select(c.as("v")).head.getString(0)
  }

  private def at(ts: String) = lit(ts).cast("timestamp")

  test("utcOffsetLabel renders UTC+08:00 / UTC-05:00 like the reference") {
    assert(one(Num.utcOffsetLabel(at("2024-01-15 12:00:00"), "Asia/Shanghai")) == "UTC+08:00")
    assert(one(Num.utcOffsetLabel(at("2024-01-15 12:00:00"), "America/New_York")) == "UTC-05:00")
    assert(one(Num.utcOffsetLabel(at("2024-01-15 12:00:00"), "UTC")) == "UTC+00:00")
    // Half-hour zone exercises the minutes field.
    assert(one(Num.utcOffsetLabel(at("2024-01-15 12:00:00"), "Asia/Kolkata")) == "UTC+05:30")
  }

  test("offset is instant-sensitive: DST zones flip across the year") {
    assert(one(Num.utcOffsetLabel(at("2024-07-15 12:00:00"), "America/New_York")) == "UTC-04:00")
    assert(one(Num.utcOffsetLabel(at("2024-01-15 12:00:00"), "America/New_York")) == "UTC-05:00")
  }

  test("tsWithZone renders local wall-clock + offset label (golden, non-UTC)") {
    assert(one(Num.tsWithZone(at("2024-01-15 12:00:00"), "Asia/Shanghai"))
      == "2024-01-15 20:00:00 UTC+08:00")
    assert(one(Num.tsWithZone(at("2024-01-15 12:00:00"), "America/New_York"))
      == "2024-01-15 07:00:00 UTC-05:00")
    assert(one(Num.tsWithZone(at("2024-01-15 12:00:00"), "UTC"))
      == "2024-01-15 12:00:00 UTC+00:00")
  }
}
