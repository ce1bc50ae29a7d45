package org.apache.spark.sql

/** Direct codegen'd hash Column for graft engine internals.
  *
  * Spark 4 routes the scala-dsl `functions.xxhash64` through the
  * session function registry (Column.fn), and the graft session
  * registers a databend-exact unary `xxhash64` (interpreted,
  * u64-rendering) for SQL parity. Internal operators (minhash
  * shingles) want Spark's builtin XxHash64 — codegen'd, seed 42 —
  * regardless of the registry, so this shim builds the expression
  * directly (ExpressionUtils is private[sql], hence the package).
  */
object GraftHashShim {
  def xxh64(cols: Column*): Column =
    classic.ExpressionUtils.column(
      new catalyst.expressions.XxHash64(
        cols.map(classic.ExpressionUtils.expression)))
}
