package graft.queries

import graft.{Q, QueryModule, Tables}
import graft.sources.GraftTable
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** DML + CDC lifecycle as verifiable queries (SURVEY.md §2.2 INSERT /
  * UPDATE / DELETE / MERGE, §2.10 STREAM change feed). Each run builds
  * a scratch GraftTable, applies the mutation sequence, and returns the
  * final aggregate; the oracle replays the same sequence relationally
  * in pure SQL — the comparison proves the storage layer's semantics,
  * not just that it ran.
  */
object DmlQueries extends QueryModule {

  private def scratch(prefix: String): String = {
    val base = Paths.get(sys.props("java.io.tmpdir"), "graft_scratch")
    Files.createDirectories(base)
    Files.createTempDirectory(base, prefix).toString
  }

  private def rmrf(dir: String): Unit = {
    import scala.jdk.CollectionConverters._
    val p = Paths.get(dir)
    if (Files.exists(p))
      Files.walk(p).iterator().asScala.toSeq.reverse.foreach(Files.delete)
  }

  /** materialize a small result so the scratch table can be deleted
    * before the caller writes/collects the returned frame */
  private def materialize(spark: SparkSession, df: DataFrame): DataFrame = {
    val rows: java.util.List[Row] = java.util.Arrays.asList(df.collect(): _*)
    spark.createDataFrame(rows, df.schema)
  }

  // insert -> update -> delete -> merge, then aggregate the final state
  private val lifecycle = Q(
    (spark, dir) => {
      val x = Tables(spark, dir)
      val path = scratch("dml")
      try {
        val base = x.customer.filter(col("c_custkey") < 100)
          .select(col("c_custkey").as("k"), col("c_mktsegment").as("seg"), col("c_acctbal").as("bal"))
        val t = GraftTable.create(spark, path, base)
        t.update(col("seg") === "BUILDING", Map("bal" -> (col("bal") + 1000.0)))
        t.delete(col("bal") < 0.0)
        val src = x.customer.filter(col("c_custkey") <= 5)
          .select(col("c_custkey").as("k"), col("c_mktsegment").as("seg"), lit(9999.0).as("bal"))
        t.mergeByKey(src, "k")
        val out = t.read().groupBy(col("seg"))
          .agg(count(lit(1)).as("n"), sum(Exact.cents(col("bal"))).as("bal_c"))
          .orderBy(col("seg"))
        materialize(spark, out)
      } finally rmrf(path)
    },
    Some("""WITH base AS (
      |  SELECT c_custkey AS k, c_mktsegment AS seg, c_acctbal AS bal
      |  FROM customer WHERE c_custkey < 100),
      |upd AS (
      |  SELECT k, seg, CASE WHEN seg = 'BUILDING' THEN bal + 1000.0 ELSE bal END AS bal FROM base),
      |del AS (SELECT * FROM upd WHERE NOT (bal < 0.0)),
      |src AS (
      |  SELECT c_custkey AS k, c_mktsegment AS seg, 9999.0 AS bal
      |  FROM customer WHERE c_custkey <= 5),
      |merged AS (
      |  SELECT * FROM del WHERE k NOT IN (SELECT k FROM src)
      |  UNION ALL SELECT * FROM src)
      |SELECT seg, count(*) AS n,
      |  CAST(sum(CAST(round(bal * 100) AS BIGINT)) AS BIGINT) AS bal_c
      |FROM merged GROUP BY seg ORDER BY seg""".stripMargin))

  // CDC: v0 snapshot -> delete -> append; change feed per action
  private val cdc = Q(
    (spark, dir) => {
      val x = Tables(spark, dir)
      val path = scratch("cdc")
      try {
        val v0 = x.orders.filter(col("o_orderkey") < 1000)
          .select(col("o_orderkey").as("k"), col("o_totalprice").as("price"))
        val t = GraftTable.create(spark, path, v0)
        t.delete(col("price") > 300000.0)
        t.append(x.orders.filter(col("o_orderkey") >= 1000 && col("o_orderkey") < 1500)
          .select(col("o_orderkey").as("k"), col("o_totalprice").as("price")))
        val feed = t.changes(0, 1).unionByName(t.changes(1, 2))
        val out = feed.groupBy(col("change$action").as("action"))
          .agg(count(lit(1)).as("n"), sum(Exact.cents(col("price"))).as("price_c"))
          .orderBy(col("action"))
        materialize(spark, out)
      } finally rmrf(path)
    },
    Some("""WITH deleted AS (
      |  SELECT o_orderkey AS k, o_totalprice AS price FROM orders
      |  WHERE o_orderkey < 1000 AND o_totalprice > 300000.0),
      |inserted AS (
      |  SELECT o_orderkey AS k, o_totalprice AS price FROM orders
      |  WHERE o_orderkey >= 1000 AND o_orderkey < 1500),
      |feed AS (
      |  SELECT 'DELETE' AS action, price FROM deleted
      |  UNION ALL SELECT 'INSERT', price FROM inserted)
      |SELECT action, count(*) AS n,
      |  CAST(sum(CAST(round(price * 100) AS BIGINT)) AS BIGINT) AS price_c
      |FROM feed GROUP BY action ORDER BY action""".stripMargin))

  // time travel: aggregate across three versions of the same table
  private val timeTravel = Q(
    (spark, dir) => {
      val x = Tables(spark, dir)
      val path = scratch("tt")
      try {
        val t = GraftTable.create(spark, path,
          x.nation.select(col("n_nationkey").as("k"), col("n_name").as("name")))
        t.append(x.region.select((col("r_regionkey") + 100).as("k"), col("r_name").as("name")))
        t.delete(col("k") < 10)
        val out = spark.range(1).select(
          lit(t.readAt(0).count()).as("v0_rows"),
          lit(t.readAt(1).count()).as("v1_rows"),
          lit(t.readAt(2).count()).as("v2_rows"))
        materialize(spark, out)
      } finally rmrf(path)
    },
    Some("""SELECT
      |  (SELECT count(*) FROM nation) AS v0_rows,
      |  (SELECT count(*) FROM nation) + (SELECT count(*) FROM region) AS v1_rows,
      |  (SELECT count(*) FROM nation WHERE n_nationkey >= 10) + (SELECT count(*) FROM region) AS v2_rows""".stripMargin))

  // virtual columns (sources/GraftTable.setVirtualColumns +
  // plans/VirtualColumnRule — reference fuse virtual_column_builder/
  // reader): declared JSON paths materialize at write; reads of
  // get_json_object over them rewrite to the stored column (the spec
  // asserts the plan; this query proves the VALUES match plain JSON
  // parsing, which is what DuckDB replays)
  private val virtualColumn = Q(
    (spark, dir) => {
      val path = scratch("virt")
      try {
        val events = spark.read.parquet(s"$dir/events.parquet")
          .filter(col("event_id") < 4000)
          .select(col("event_id"), col("event_type"), col("props"))
        val t = GraftTable.open(spark, path)
        t.setVirtualColumns("props", Seq("$.k"))
        t.append(events)
        val out = t.read()
          .filter(get_json_object(col("props"), "$.k").cast("long") % 10 === 3)
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"),
            sum(get_json_object(col("props"), "$.k").cast("long")).as("sum_k"))
          .orderBy(col("event_type"))
        materialize(spark, out)
      } finally rmrf(path)
    },
    Some("""SELECT event_type, count(*) AS n,
      |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
      |FROM events
      |WHERE event_id < 4000
      |  AND CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 = 3
      |GROUP BY event_type ORDER BY event_type""".stripMargin))

  override def queries: Seq[(String, Q)] = Seq(
    "dml_lifecycle" -> lifecycle,
    "dml_cdc_feed" -> cdc,
    "dml_time_travel" -> timeTravel,
    "dml_virtual_column" -> virtualColumn)
}
