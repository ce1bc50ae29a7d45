package graft.queries

import graft.{GraftSql, Q, QueryModule, Tables}
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

  // insert -> update -> delete -> merge, then aggregate the final state.
  // Driven ENTIRELY as SQL text through the GraftSql statement head
  // (reference: the user surface is SQL — ast/statements/statement.rs;
  // merge grammar merge_into.rs) — this gate proves the text surface,
  // not just the Scala API underneath it.
  private val lifecycle = Q(
    (spark, dir) => {
      Tables(spark, dir).registerAll()
      val path = scratch("dml")
      try {
        val g = GraftSql(spark, path)
        g.execute("""CREATE TABLE dml AS
          SELECT c_custkey AS k, c_mktsegment AS seg, c_acctbal AS bal
          FROM customer WHERE c_custkey < 100""")
        g.execute("UPDATE dml SET bal = bal + 1000.0 WHERE seg = 'BUILDING'")
        g.execute("DELETE FROM dml WHERE bal < 0.0")
        g.execute("""MERGE INTO dml USING (
            SELECT c_custkey AS k, c_mktsegment AS seg, CAST(9999.0 AS DOUBLE) AS bal
            FROM customer WHERE c_custkey <= 5) AS s
          ON dml.k = s.k
          WHEN MATCHED THEN UPDATE *
          WHEN NOT MATCHED THEN INSERT *""")
        val out = g.execute("""SELECT seg, count(*) AS n,
          CAST(sum(CAST(round(bal * 100) AS BIGINT)) AS BIGINT) AS bal_c
          FROM dml GROUP BY seg ORDER BY seg""")
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

  // CDC: v0 snapshot -> delete -> append; change feed per action, read
  // back with the SQL CHANGES clause (reference ast/query.rs:568-601)
  private val cdc = Q(
    (spark, dir) => {
      Tables(spark, dir).registerAll()
      val path = scratch("cdc")
      try {
        val g = GraftSql(spark, path)
        g.execute("""CREATE TABLE cdc AS
          SELECT o_orderkey AS k, o_totalprice AS price
          FROM orders WHERE o_orderkey < 1000""")
        g.execute("DELETE FROM cdc WHERE price > 300000.0")
        g.execute("""INSERT INTO cdc
          SELECT o_orderkey AS k, o_totalprice AS price
          FROM orders WHERE o_orderkey >= 1000 AND o_orderkey < 1500""")
        val out = g.execute("""SELECT action, count(*) AS n,
            CAST(sum(CAST(round(price * 100) AS BIGINT)) AS BIGINT) AS price_c
          FROM (
            SELECT `change$action` AS action, price
            FROM cdc CHANGES (INFORMATION => DEFAULT) AT (SNAPSHOT => 0) END (SNAPSHOT => 1)
            UNION ALL
            SELECT `change$action` AS action, price
            FROM cdc CHANGES (INFORMATION => DEFAULT) AT (SNAPSHOT => 1) END (SNAPSHOT => 2))
          GROUP BY action ORDER BY action""")
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

  // time travel: aggregate across three versions of the same table,
  // resolved with the SQL AT (SNAPSHOT => v) clause
  private val timeTravel = Q(
    (spark, dir) => {
      Tables(spark, dir).registerAll()
      val path = scratch("tt")
      try {
        val g = GraftSql(spark, path)
        g.execute("CREATE TABLE tt AS SELECT n_nationkey AS k, n_name AS name FROM nation")
        g.execute("INSERT INTO tt SELECT r_regionkey + 100 AS k, r_name AS name FROM region")
        g.execute("DELETE FROM tt WHERE k < 10")
        val out = g.execute("""SELECT
          (SELECT count(*) FROM tt AT (SNAPSHOT => 0)) AS v0_rows,
          (SELECT count(*) FROM tt AT (SNAPSHOT => 1)) AS v1_rows,
          (SELECT count(*) FROM tt AT (SNAPSHOT => 2)) AS v2_rows""")
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

  // schema evolution (round 8): metadata-only ADD/DROP COLUMN across
  // existing files — pre-alter rows read the added column's DEFAULT,
  // dropped columns vanish, and post-alter inserts carry real values.
  // The oracle replays the timeline relationally.
  private val alterColumn = Q(
    (spark, dir) => {
      Tables(spark, dir).registerAll()
      val path = scratch("alt")
      try {
        val g = GraftSql(spark, path)
        g.execute("""CREATE TABLE alt AS
          SELECT n_nationkey AS k, n_name AS name, n_regionkey AS region
          FROM nation""")
        g.execute("ALTER TABLE alt ADD COLUMN score INT DEFAULT 7")
        g.execute("INSERT INTO alt VALUES (100, 'ATLANTIS', 9, 42)")
        g.execute("ALTER TABLE alt DROP COLUMN region")
        val out = g.execute(
          "SELECT k, name, score FROM alt ORDER BY k")
        materialize(spark, out)
      } finally rmrf(path)
    },
    Some("""SELECT k, name, score FROM (
      |  SELECT n_nationkey AS k, n_name AS name, 7 AS score FROM nation
      |  UNION ALL SELECT 100, 'ATLANTIS', 42) ORDER BY k""".stripMargin))

  // dynamic PIVOT (reference pivot binder: IN (ANY ORDER BY ...)
  // resolves the value set at bind time) driven as SQL text; the
  // oracle enumerates the known value set as FILTERed counts.
  private val dynPivot = Q(
    (spark, dir) => {
      Tables(spark, dir).registerAll()
      val path = scratch("dynpivot")
      try {
        val g = GraftSql(spark, path)
        g.execute("""CREATE TABLE dp AS
          SELECT o_orderstatus AS st, o_orderpriority AS pri, o_totalprice AS price
          FROM orders""")
        val out = g.execute("""SELECT * FROM dp
          PIVOT(COUNT(price) FOR pri IN (ANY ORDER BY pri)) ORDER BY st""")
        materialize(spark, out)
      } finally rmrf(path)
    },
    Some("""SELECT o_orderstatus AS st,
      | count(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS "1-URGENT",
      | count(*) FILTER (WHERE o_orderpriority = '2-HIGH') AS "2-HIGH",
      | count(*) FILTER (WHERE o_orderpriority = '3-MEDIUM') AS "3-MEDIUM",
      | count(*) FILTER (WHERE o_orderpriority = '4-NOT SPECIFIED') AS "4-NOT SPECIFIED",
      | count(*) FILTER (WHERE o_orderpriority = '5-LOW') AS "5-LOW"
      |FROM orders GROUP BY o_orderstatus ORDER BY st""".stripMargin))

  // QUALIFY (window-predicate filter) through the SQL text head; the
  // oracle is the classic wrapped-subquery spelling.
  private val qualifyTop = Q(
    (spark, dir) => {
      Tables(spark, dir).registerAll()
      val path = scratch("qual")
      try {
        val g = GraftSql(spark, path)
        g.execute("""CREATE TABLE q AS
          SELECT c_mktsegment AS seg, c_custkey AS k, c_acctbal AS bal FROM customer""")
        val out = g.execute("""SELECT seg, k FROM q
          QUALIFY row_number() OVER (PARTITION BY seg ORDER BY bal DESC, k) <= 3
          ORDER BY seg, k""")
        materialize(spark, out)
      } finally rmrf(path)
    },
    Some("""SELECT seg, k FROM (SELECT c_mktsegment AS seg, c_custkey AS k,
      | row_number() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS rn
      | FROM customer) WHERE rn <= 3 ORDER BY seg, k""".stripMargin))

  override def queries: Seq[(String, Q)] = Seq(
    "dml_lifecycle" -> lifecycle,
    "dml_cdc_feed" -> cdc,
    "dml_time_travel" -> timeTravel,
    "dml_virtual_column" -> virtualColumn,
    "dml_alter_column" -> alterColumn,
    "sql_dyn_pivot" -> dynPivot,
    "sql_qualify" -> qualifyTop)
}
