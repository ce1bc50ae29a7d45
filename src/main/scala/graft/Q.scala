package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable query: a DataFrame program plus (when SQL-expressible)
  * an equivalent DuckDB oracle over the same parquet tables. The driver
  * hash-compares result values with columns sorted by name, so every
  * computed column must carry the SAME alias on both sides.
  */
final case class Q(
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None,
    /** headline queries are the ones Bench times */
    headline: Boolean = false)

trait QueryModule {
  def queries: Seq[(String, Q)]
}
