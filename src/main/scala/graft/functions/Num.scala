package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Cross-engine deterministic numerics.
  *
  * The driver hash-compares our parquet output against a DuckDB oracle.
  * `SUM(double)` is order-dependent floating point, so two engines (or two
  * runs with different partitioning) can disagree in the last ulp. We make
  * every aggregate exact by summing fixed-point decimals and casting the
  * exact result to double at the very end — bitwise identical everywhere,
  * and still codegen-friendly (decimal sum is a Catalyst built-in).
  */
object Num {
  /** Fixed-point view of a money/quantity column (2 fractional digits). */
  def dec(c: Column): Column = c.cast(DecimalType(18, 2))

  /** Exact SUM(x) as double: sum of decimals, cast once. */
  def dsum(c: Column): Column = sum(dec(c)).cast("double")

  /** Exact SUM(a*b) (e.g. price * (1-discount)) as double. */
  def dsumProd(a: Column, b: Column): Column = sum(dec(a) * b.cast(DecimalType(18, 2))).cast("double")

  /** Deterministic AVG: exact decimal sum divided by count, in doubles. */
  def davg(c: Column): Column = dsum(c) / count(lit(1)).cast("double")

  /** ISO timestamp string (UTC session tz pinned in the session builder). */
  def tsS(c: Column): Column = date_format(c, "yyyy-MM-dd HH:mm:ss")

  /** The reference's timezone-label rendering
    * (`core/formatters.py:23-26`): a zone's UTC offset formatted as
    * "UTC+08:00" / "UTC-05:00". The offset is taken at each timestamp's own
    * instant (via `from_utc_timestamp`), so DST zones render the offset in
    * force at that moment — e.g. America/New_York is UTC-05:00 in January
    * and UTC-04:00 in July — which is exactly what the reference's
    * `datetime.now(tzlocal()).strftime('%z')` does for "now".
    */
  def utcOffsetLabel(c: Column, zone: String): Column = {
    val off = (unix_timestamp(from_utc_timestamp(c, zone)) - unix_timestamp(c))
    val a = abs(off)
    concat(lit("UTC"), when(off < 0, "-").otherwise("+"),
      lpad(floor(a / 3600).cast("string"), 2, "0"), lit(":"),
      lpad(floor(a % 3600 / 60).cast("string"), 2, "0"))
  }

  /** Output-boundary timestamp rendering in an explicit zone with the
    * reference's offset label: local wall-clock time + " UTC±HH:MM".
    * Pass "UTC" to reproduce the plain pinned-UTC form with its label.
    */
  def tsWithZone(c: Column, zone: String): Column =
    concat(date_format(from_utc_timestamp(c, zone), "yyyy-MM-dd HH:mm:ss"),
      lit(" "), utcOffsetLabel(c, zone))
}
