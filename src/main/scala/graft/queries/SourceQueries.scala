package graft.queries

import graft.{Q, QueryModule}
import org.apache.spark.sql.functions._

/** Source formats beyond parquet (SURVEY.md §2.2; reference stage read
  * formats src/meta/app/src/principal/file_format.rs:67-76 — CSV, TSV,
  * NDJSON, ...): parse CSV and JSON from in-memory datasets so the
  * oracle is a constant VALUES table, plus a ConstantTableScan analog
  * (createDataFrame == reference plans/constant_table_scan.rs).
  */
object SourceQueries extends QueryModule {

  private val csvLines = Seq(
    "id,name,price,when",
    "1,widget,9.99,2024-01-02",
    "2,gizmo,19.50,2024-02-03",
    "3,doohickey,0.25,2024-03-04",
    "4,,5.00,2024-04-05")

  private val csvParse = Q(
    (spark, _) => {
      import spark.implicits._
      val ds = spark.createDataset(csvLines)
      spark.read
        .option("header", "true")
        .option("inferSchema", "true")
        .csv(ds)
        .select(col("id").cast("int").as("id"), col("name"),
          col("price").cast("double").as("price"), col("when").cast("timestamp").as("d"))
        .orderBy(col("id"))
    },
    Some("""SELECT * FROM (VALUES
      |  (1, 'widget', 9.99, TIMESTAMP '2024-01-02'),
      |  (2, 'gizmo', 19.50, TIMESTAMP '2024-02-03'),
      |  (3, 'doohickey', 0.25, TIMESTAMP '2024-03-04'),
      |  (4, NULL, 5.00, TIMESTAMP '2024-04-05')) t(id, name, price, d)
      |ORDER BY id""".stripMargin))

  private val jsonLines = Seq(
    """{"id": 1, "tags": ["a", "b"], "meta": {"score": 0.5, "ok": true}}""",
    """{"id": 2, "tags": [], "meta": {"score": 1.5, "ok": false}}""",
    """{"id": 3, "tags": ["c"], "meta": {"score": -2.0, "ok": true}}""")

  private val jsonParse = Q(
    (spark, _) => {
      import spark.implicits._
      val ds = spark.createDataset(jsonLines)
      spark.read.json(ds)
        .select(col("id").cast("int").as("id"),
          size(col("tags")).as("n_tags"),
          col("meta.score").as("score"),
          col("meta.ok").as("ok"))
        .orderBy(col("id"))
    },
    Some("""SELECT * FROM (VALUES
      |  (1, 2, 0.5, true), (2, 0, 1.5, false), (3, 1, -2.0, true)
      |) t(id, n_tags, score, ok) ORDER BY id""".stripMargin))

  // ConstantTableScan: a literal in-memory relation
  private val constantScan = Q(
    (spark, _) => {
      import spark.implicits._
      Seq((1, "a", 1.5), (2, "b", 2.5), (3, "c", 3.5))
        .toDF("k", "s", "v")
        .filter(col("k") > 1)
        .select(col("k"), col("s"), (col("v") * 2).as("v2"))
        .orderBy(col("k"))
    },
    Some("""SELECT k, s, v * 2 AS v2 FROM (VALUES
      |  (1, 'a', 1.5), (2, 'b', 2.5), (3, 'c', 3.5)) t(k, s, v)
      |WHERE k > 1 ORDER BY k""".stripMargin))

  override def queries: Seq[(String, Q)] = Seq(
    "src_csv_parse" -> csvParse,
    "src_json_parse" -> jsonParse,
    "src_constant_scan" -> constantScan)
}
