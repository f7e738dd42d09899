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
}
