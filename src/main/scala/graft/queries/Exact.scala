package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Helpers for oracle-exact aggregation.
  *
  * Summing doubles is order-dependent, and Spark's partial aggregation
  * order differs from DuckDB's — so money aggregates are derived as
  * exact integer cents BEFORE aggregating: the per-row double products
  * are bit-identical in both engines (same IEEE-754 ops), `round` then
  * lands on the same integer, and integer sums are associative. This
  * gives hash-exact parity without weakening the check.
  */
object Exact {
  /** money column -> exact integer cents */
  def cents(c: Column): Column = round(c * lit(100)).cast("long")

  /** scale by 10^n and round to exact integer units */
  def unitsOf(c: Column, scale: Int): Column =
    round(c * pow(lit(10), lit(scale))).cast("long")

  /** classic TPC-H revenue expression, in cents */
  def revenueCents(price: Column, discount: Column): Column =
    cents(price * (lit(1.0) - discount))

  def chargeCents(price: Column, discount: Column, tax: Column): Column =
    cents(price * (lit(1.0) - discount) * (lit(1.0) + tax))
}
