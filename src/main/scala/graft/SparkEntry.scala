package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Queries are contributed by modules under graft.queries, one entry per
  * implemented operator from SURVEY.md §2; each carries a DuckDB oracle
  * when SQL-expressible.
  */
object SparkEntry {

  private val modules: Seq[QueryModule] = Seq(
    graft.queries.TpchQueries,
    graft.queries.JoinQueries,
    graft.queries.AggQueries,
    graft.queries.WindowQueries,
    graft.queries.SetOpQueries,
    graft.queries.ScalarFnQueries,
    graft.queries.SrfQueries,
    graft.queries.EventQueries,
    graft.queries.TextQueries,
    graft.queries.VectorQueries,
    graft.queries.SourceQueries,
    graft.queries.CteQueries,
    graft.queries.RegistryQueries,
    graft.queries.DmlQueries,
    graft.queries.MultimodalQueries,
    graft.queries.HitsQueries,
    graft.queries.MoreScalarQueries,
    graft.queries.GeoQueries,
    graft.queries.TpcdsQueries,
    graft.queries.ClickBenchQueries)

  lazy val all: Map[String, Q] = {
    val entries = modules.flatMap(_.queries)
    val dups = entries.groupBy(_._1).filter(_._2.size > 1).keys
    require(dups.isEmpty, s"duplicate query names: ${dups.mkString(",")}")
    entries.toMap
  }

  /** Headline queries Bench times (TPC-H-shaped + scale-sensitive ops). */
  lazy val headline: Seq[String] =
    modules.flatMap(_.queries).collect { case (n, q) if q.headline => n }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    all("tpch_q5").fn(GraftSession.tune(spark), "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map { case (n, q) => n -> q.fn }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.collect { case (n, q) if q.oracle.isDefined => n -> q.oracle.get }
}
