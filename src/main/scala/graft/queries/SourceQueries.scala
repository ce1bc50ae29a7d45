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

  // TSV: the CSV reader with a tab separator (reference TSV stage
  // format, file_format.rs:67-76)
  private val tsvLines = Seq(
    "id\tcity\tpop",
    "1\tOslo\t709000",
    "2\tLima\t10883000",
    "3\t\t42",
    "4\tPerth\t2141000")

  private val tsvParse = Q(
    (spark, _) => {
      import spark.implicits._
      val ds = spark.createDataset(tsvLines)
      spark.read
        .option("header", "true")
        .option("sep", "\t")
        .csv(ds)
        .select(col("id").cast("int").as("id"), col("city"),
          col("pop").cast("long").as("pop"))
        .orderBy(col("id"))
    },
    Some("""SELECT * FROM (VALUES
      |  (1, 'Oslo', 709000), (2, 'Lima', 10883000),
      |  (3, NULL, 42), (4, 'Perth', 2141000)) t(id, city, pop)
      |ORDER BY id""".stripMargin))

  // XML: Spark 4 native XML source (reference XML stage format) —
  // attributes land as _attr columns, nested elements as structs
  private val xmlLines = Seq(
    """<order id="1"><item sku="A1"><qty>3</qty><price>9.99</price></item></order>""",
    """<order id="2"><item sku="B2"><qty>1</qty><price>19.50</price></item></order>""",
    """<order id="3"><item sku="C3"><qty>7</qty><price>0.25</price></item></order>""")

  private val xmlParse = Q(
    (spark, _) => {
      import spark.implicits._
      val ds = spark.createDataset(xmlLines)
      spark.read
        .option("rowTag", "order")
        .xml(ds)
        .select(col("_id").cast("int").as("id"),
          col("item._sku").as("sku"),
          col("item.qty").cast("int").as("qty"),
          col("item.price").cast("double").as("price"))
        .orderBy(col("id"))
    },
    Some("""SELECT * FROM (VALUES
      |  (1, 'A1', 3, 9.99), (2, 'B2', 1, 19.50), (3, 'C3', 7, 0.25)
      |) t(id, sku, qty, price) ORDER BY id""".stripMargin))

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

  // ---- ORC / Avro stage reads (reference file_format.rs:67-76) --------
  // DuckDB reads neither format, so the check is a ROUNDTRIP oracle:
  // Spark writes a slice of orders to ORC/Avro, reads it back, and
  // aggregates; the oracle computes the same aggregate straight from
  // the parquet the slice came from. Any reader/writer corruption
  // (types, nulls, timestamps) breaks the hash match.
  private def roundtrip(fmt: String) = Q(
    (spark, dir) => {
      val stage = s"/tmp/graft_stage/${new java.io.File(dir).getName}/$fmt"
      val src = spark.read.parquet(s"$dir/orders.parquet")
        .filter(col("o_orderkey") < 2000)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
          col("o_totalprice"), col("o_orderdate"), col("o_orderpriority"))
      src.write.mode("overwrite").format(fmt).save(stage)
      spark.read.format(fmt).load(stage)
        .groupBy(col("o_orderstatus"))
        .agg(
          count(lit(1)).as("n"),
          sum(round(col("o_totalprice") * 100).cast("long")).as("sum_price_c"),
          countDistinct(col("o_custkey")).as("n_cust"),
          max(col("o_orderdate").cast("timestamp")).as("max_date"),
          min(col("o_orderpriority")).as("min_prio"))
        .orderBy(col("o_orderstatus"))
    },
    Some("""SELECT o_orderstatus,
      |  count(*) AS n,
      |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_c,
      |  CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_cust,
      |  CAST(max(o_orderdate) AS TIMESTAMP) AS max_date,
      |  min(o_orderpriority) AS min_prio
      |FROM orders WHERE o_orderkey < 2000
      |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin))

  private val orcParse = roundtrip("orc")

  // Avro via sources.AvroStage (no spark-avro module in this distro;
  // the container-file roundtrip runs on avro-core directly)
  private val avroParse = Q(
    (spark, dir) => {
      val stage = s"/tmp/graft_stage/${new java.io.File(dir).getName}/avro"
      val src = spark.read.parquet(s"$dir/orders.parquet")
        .filter(col("o_orderkey") < 2000)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
          col("o_totalprice"), col("o_orderdate"), col("o_orderpriority"))
      graft.sources.AvroStage.write(src, stage)
      graft.sources.AvroStage.read(spark, stage, src.schema)
        .groupBy(col("o_orderstatus"))
        .agg(
          count(lit(1)).as("n"),
          sum(round(col("o_totalprice") * 100).cast("long")).as("sum_price_c"),
          countDistinct(col("o_custkey")).as("n_cust"),
          max(col("o_orderdate").cast("timestamp")).as("max_date"),
          min(col("o_orderpriority")).as("min_prio"))
        .orderBy(col("o_orderstatus"))
    },
    roundtrip("orc").oracle) // same aggregate, same oracle

  // ---- Delta Lake external table (reference storages/delta/) ---------
  // Builds a partitioned delta table through its whole log lifecycle
  // (create -> append -> checkpoint -> partition delete), then reads it
  // back through the protocol-level log replay in sources.DeltaLake.
  // The oracle replays the same mutations relationally, so a wrong
  // active-file set, a mis-attached partition column, or a checkpoint
  // bug all break the hash match.
  private val deltaRead = Q(
    (spark, dir) => {
      import java.nio.file.{Files, Paths}
      val base = Paths.get(sys.props("java.io.tmpdir"), "graft_scratch")
      Files.createDirectories(base)
      val path = Files.createTempDirectory(base, "delta").toString
      try {
        val cust = spark.read.parquet(s"$dir/customer.parquet")
          .select(col("c_custkey").as("k"), col("c_mktsegment").as("seg"),
            col("c_acctbal").as("bal"))
        graft.sources.DeltaLake.create(spark, path,
          cust.filter(col("k") < 500), partitionColumns = Seq("seg"))
        graft.sources.DeltaLake.append(spark, path,
          cust.filter(col("k") >= 500 && col("k") < 700))
        graft.sources.DeltaLake.checkpoint(spark, path)
        graft.sources.DeltaLake.deleteWhere(spark, path,
          pv => pv.get("seg").contains("MACHINERY"))
        // row-level deletion vectors on top of the partition drop
        graft.sources.DeltaLake.deleteWhere(spark, path, col("k") % 10 === 3)
        val out = graft.sources.DeltaLake.read(spark, path)
          .groupBy(col("seg"))
          .agg(count(lit(1)).as("n"),
            sum(round(col("bal") * 100).cast("long")).as("bal_c"))
          .orderBy(col("seg"))
        val rows = java.util.Arrays.asList(out.collect(): _*)
        spark.createDataFrame(rows, out.schema)
      } finally {
        import scala.jdk.CollectionConverters._
        val p = Paths.get(path)
        if (Files.exists(p))
          graft.Fs.walk(p).iterator.toSeq.reverse.foreach(Files.delete)
      }
    },
    Some("""WITH data AS (
      |  SELECT c_custkey AS k, c_mktsegment AS seg, c_acctbal AS bal
      |  FROM customer WHERE c_custkey < 700)
      |SELECT seg, count(*) AS n,
      |  CAST(sum(CAST(round(bal * 100) AS BIGINT)) AS BIGINT) AS bal_c
      |FROM data WHERE seg <> 'MACHINERY' AND k % 10 <> 3
      |GROUP BY seg ORDER BY seg""".stripMargin))

  // ---- Iceberg external table (reference storages/iceberg/) ----------
  // Two snapshot writes (so the manifest list carries a prior
  // manifest), then a read through the metadata chain; the oracle is
  // the same slice straight from parquet.
  private val icebergRead = Q(
    (spark, dir) => {
      import java.nio.file.{Files, Paths}
      val base = Paths.get(sys.props("java.io.tmpdir"), "graft_scratch")
      Files.createDirectories(base)
      val path = Files.createTempDirectory(base, "iceberg").toString
      try {
        val src = spark.read.parquet(s"$dir/orders.parquet")
          .filter(col("o_orderkey") < 2000)
          .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
            col("o_totalprice"), col("o_orderdate"), col("o_orderpriority"))
        graft.sources.IcebergLake.write(spark, path, src.filter(col("o_orderkey") < 1000))
        graft.sources.IcebergLake.write(spark, path, src.filter(col("o_orderkey") >= 1000))
        // v2 positional deletes: a third snapshot deletes every key
        // ending in 3; the read must anti-join them back out
        graft.sources.IcebergLake.deleteWhere(spark, path, col("o_orderkey") % 10 === 3)
        // v2 equality deletes: a fourth snapshot deletes keys ending in
        // 7 by key equality, then a fifth re-inserts key 7 — the
        // strictly-smaller-sequence rule must let the re-insert survive
        graft.sources.IcebergLake.writeEqualityDeletes(spark, path,
          src.filter(col("o_orderkey") % 10 === 7).select(col("o_orderkey")),
          Seq("o_orderkey"))
        graft.sources.IcebergLake.write(spark, path, src.filter(col("o_orderkey") === 7))
        val out = graft.sources.IcebergLake.read(spark, path)
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n"),
            sum(round(col("o_totalprice") * 100).cast("long")).as("sum_price_c"),
            countDistinct(col("o_custkey")).as("n_cust"),
            max(col("o_orderdate").cast("timestamp")).as("max_date"),
            min(col("o_orderpriority")).as("min_prio"))
          .orderBy(col("o_orderstatus"))
        val rows = java.util.Arrays.asList(out.collect(): _*)
        spark.createDataFrame(rows, out.schema)
      } finally {
        import scala.jdk.CollectionConverters._
        val p = Paths.get(path)
        if (Files.exists(p))
          graft.Fs.walk(p).iterator.toSeq.reverse.foreach(Files.delete)
      }
    },
    // the orc-roundtrip slice/aggregate minus the positionally-deleted
    // keys (%10=3) and the equality-deleted keys (%10=7), except key 7
    // itself which is re-inserted after the equality delete
    Some("""SELECT o_orderstatus,
      |  count(*) AS n,
      |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_c,
      |  CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_cust,
      |  CAST(max(o_orderdate) AS TIMESTAMP) AS max_date,
      |  min(o_orderpriority) AS min_prio
      |FROM orders WHERE o_orderkey < 2000 AND o_orderkey % 10 <> 3
      |  AND (o_orderkey % 10 <> 7 OR o_orderkey = 7)
      |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin))

  // ---- Paimon external table (reference storages/paimon/) ------------
  // Two appended snapshots so the second snapshot's base manifest list
  // references the first commit's manifest; read replays base+delta
  // through the snapshot/manifest-list/manifest avro chain.
  private val paimonRead = Q(
    (spark, dir) => {
      import java.nio.file.{Files, Paths}
      val base = Paths.get(sys.props("java.io.tmpdir"), "graft_scratch")
      Files.createDirectories(base)
      val path = Files.createTempDirectory(base, "paimon").toString
      try {
        val src = spark.read.parquet(s"$dir/orders.parquet")
          .filter(col("o_orderkey") < 2000)
          .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
            col("o_totalprice"), col("o_orderdate"), col("o_orderpriority"))
        graft.sources.PaimonLake.write(spark, path, src.filter(col("o_orderkey") < 1000))
        graft.sources.PaimonLake.write(spark, path, src.filter(col("o_orderkey") >= 1000))
        val out = graft.sources.PaimonLake.read(spark, path)
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n"),
            sum(round(col("o_totalprice") * 100).cast("long")).as("sum_price_c"),
            countDistinct(col("o_custkey")).as("n_cust"),
            max(col("o_orderdate").cast("timestamp")).as("max_date"),
            min(col("o_orderpriority")).as("min_prio"))
          .orderBy(col("o_orderstatus"))
        val rows = java.util.Arrays.asList(out.collect(): _*)
        spark.createDataFrame(rows, out.schema)
      } finally {
        import scala.jdk.CollectionConverters._
        val p = Paths.get(path)
        if (Files.exists(p))
          graft.Fs.walk(p).iterator.toSeq.reverse.foreach(Files.delete)
      }
    },
    roundtrip("orc").oracle) // identical slice + aggregate, same oracle

  override def queries: Seq[(String, Q)] = Seq(
    "src_csv_parse" -> csvParse,
    "src_tsv_parse" -> tsvParse,
    "src_xml_parse" -> xmlParse,
    "src_json_parse" -> jsonParse,
    "src_orc_parse" -> orcParse,
    "src_avro_parse" -> avroParse,
    "src_delta_read" -> deltaRead,
    "src_iceberg_read" -> icebergRead,
    "src_paimon_read" -> paimonRead,
    "src_constant_scan" -> constantScan)
}
