package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Lazy handles to the driver-generated parquet tables of one scale
  * factor directory (TESTDATA.md). Mirrors the reference's catalog of
  * base tables (databend FUSE tables are parquet blocks on object
  * storage — src/query/storages/fuse/src/fuse_table.rs); here the
  * nearest Spark primitive is a plain parquet scan, which gives us
  * column pruning + predicate pushdown for free.
  */
final class Tables(val spark: SparkSession, val dir: String) {
  private def read(name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  lazy val region: DataFrame = read("region")
  lazy val nation: DataFrame = read("nation")
  lazy val customer: DataFrame = read("customer")
  lazy val supplier: DataFrame = read("supplier")
  lazy val part: DataFrame = read("part")
  lazy val orders: DataFrame = read("orders")
  lazy val lineitem: DataFrame = read("lineitem")

  /** events.ts has shipped under two encodings: legacy parquet
    * TIMESTAMP(NANOS) surfaced as long nanos (via
    * spark.sql.legacy.parquet.nanosAsLong) and, currently,
    * timestamp[us]. Read schema-adaptively and normalize both to
    * TIMESTAMP (session TZ is pinned to UTC, so the cast is
    * value-preserving) — the column type every downstream plan expects.
    */
  lazy val events: DataFrame = {
    val raw = read("events")
    val ts = raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        expr("timestamp_micros(ts div 1000)")
      case _ => col("ts").cast("timestamp")
    }
    raw.withColumn("ts", ts)
  }

  lazy val documents: DataFrame = read("documents")
  lazy val embeddings: DataFrame = read("embeddings")

  def byName(name: String): DataFrame = name match {
    case "region"     => region
    case "nation"     => nation
    case "customer"   => customer
    case "supplier"   => supplier
    case "part"       => part
    case "orders"     => orders
    case "lineitem"   => lineitem
    case "events"     => events
    case "documents"  => documents
    case "embeddings" => embeddings
    case other => throw new IllegalArgumentException(s"unknown table $other")
  }

  /** Register all tables as temp views so spark.sql(...) can be used. */
  def registerAll(): Unit =
    Tables.names.foreach(n => byName(n).createOrReplaceTempView(n))
}

object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  // One Tables instance per (session, dir): every query build used to
  // construct a fresh instance, and each lazy `spark.read.parquet`
  // re-listed the file and re-read the footer — profiled at 0.3-0.9s
  // of driver time PER QUERY BUILD (round-13, guide §1.2 step 2; same
  // caching pattern as sources.Tpcds.ensure). This caches the analyzed
  // DataFrame handles (metadata), never query results; the fixture
  // dirs are immutable within a session.
  //
  // Deliberately a STRONG per-JVM cache (round-13 advisory): the value
  // (Tables.spark) references the key, so weak keys could never be
  // collected anyway. Entries live for the JVM — fine for this
  // engine's long-lived singleton sessions; a caller that stops and
  // recreates sessions in one JVM should call invalidate(session).
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[
      SparkSession, java.util.concurrent.ConcurrentHashMap[String, Tables]]

  def apply(spark: SparkSession, dir: String): Tables = {
    GraftSession.tune(spark)
    cache.computeIfAbsent(spark,
        _ => new java.util.concurrent.ConcurrentHashMap[String, Tables])
      .computeIfAbsent(dir, d => new Tables(spark, d))
  }

  /** Drop every cached handle of `spark` (use after SparkSession.stop). */
  def invalidate(spark: SparkSession): Unit = cache.remove(spark)
}
