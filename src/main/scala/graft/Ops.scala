package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Determinism helpers shared by every oracle-able query (SURVEY.md §7.4).
  *
  * Doubles summed in arbitrary order are not reproducible across engines;
  * money/value sums therefore go through DECIMAL(18,2) (exact, associative)
  * and come back out as DOUBLE (exact conversion for |x| < 2^53/100).
  * The `SQL_*` twins are the textual DuckDB mirrors — keep them in sync.
  */
object Ops {
  /** Exact decimal-accumulated sum of a money/value column, as double. */
  def dsum(c: Column): Column = sum(c.cast("decimal(18,2)")).cast("double")
  def SQL_DSUM(x: String): String =
    s"CAST(SUM(CAST($x AS DECIMAL(18,2))) AS DOUBLE)"

  /** Higher-scale variant for small magnitudes (discounts, rates). */
  def dsum6(c: Column): Column = sum(c.cast("decimal(18,6)")).cast("double")
  def SQL_DSUM6(x: String): String =
    s"CAST(SUM(CAST($x AS DECIMAL(18,6))) AS DOUBLE)"

  /** Order-insensitive average rounded to 4 dp: exact decimal sum / count. */
  def avg4(c: Column): Column = round(dsum(c) / count(lit(1)), 4)
  def SQL_AVG4(x: String): String = s"ROUND(${SQL_DSUM(x)} / COUNT(*), 4)"

  def avg46(c: Column): Column = round(dsum6(c) / count(lit(1)), 4)
  def SQL_AVG46(x: String): String = s"ROUND(${SQL_DSUM6(x)} / COUNT(*), 4)"

  /** Per-row revenue expression (no accumulation: bit-exact both engines).
    * Safe to OUTPUT as a double column; NOT safe to cast to decimal and
    * sum — Spark rounds the double's shortest decimal repr (HALF_UP),
    * DuckDB rounds the exact binary value, and the per-row roundings
    * drift. For sums use [[revenueDec]]/[[chargeDec]].
    */
  def revenue(price: Column, discount: Column): Column =
    price * (lit(1.0) - discount)
  val SQL_REVENUE = "l_extendedprice * (1.0 - l_discount)"

  /** Exact decimal-domain revenue: base columns are clean 2-dp values
    * stored as doubles, where double→decimal casts agree across engines;
    * all further arithmetic stays decimal (exact, associative).
    * Intermediates are re-narrowed so DuckDB never exceeds width 38
    * (which would silently fall back to double).
    */
  def revenueDec(price: Column, discount: Column): Column =
    price.cast("decimal(12,2)") *
      (lit(1) - discount.cast("decimal(4,2)")).cast("decimal(4,2)")
  val SQL_REV_DEC =
    "CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(4,2))"

  def chargeDec(price: Column, discount: Column, tax: Column): Column =
    revenueDec(price, discount) *
      (lit(1) + tax.cast("decimal(4,2)")).cast("decimal(4,2)")
  val SQL_CHARGE_DEC =
    SQL_REV_DEC + " * CAST(1 + CAST(l_tax AS DECIMAL(4,2)) AS DECIMAL(4,2))"

  /** Sum an already-exact decimal column; emit double (exact for the
    * magnitudes in play: |sum| < 2^53 / 10^scale).
    */
  def dsumExact(c: Column): Column = sum(c).cast("double")
  def SQL_DSUM_EXACT(x: String): String = s"CAST(SUM($x) AS DOUBLE)"
}
