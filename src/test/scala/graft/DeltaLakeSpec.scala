package graft

import graft.sources.DeltaLake
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** Protocol-level Delta Lake reader: hand-written logs (so the reader
  * is validated against the PUBLIC protocol's JSON shapes, not just our
  * own writer), the writer lifecycle, time travel, checkpoints, and the
  * unsupported-feature guards.
  */
class DeltaLakeSpec extends AnyFunSuite {
  private lazy val spark = GraftSession(cpus = 4, appName = "graft-delta-test")

  private def scratch(): String = {
    val base = Paths.get("target", "delta_spec")
    Files.createDirectories(base)
    Files.createTempDirectory(base, "t").toString
  }

  private def rmrf(dir: String): Unit = {
    val p = Paths.get(dir)
    if (Files.exists(p))
      Files.walk(p).iterator().asScala.toSeq.reverse.foreach(Files.delete)
  }

  /** write `df` as exactly one parquet file at `table/<name>` */
  private def onePart(df: org.apache.spark.sql.DataFrame, table: String, name: String): Unit = {
    val tmp = Files.createTempDirectory(Paths.get(table), "_w").toString
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = Files.list(Paths.get(tmp)).iterator().asScala
      .find(_.getFileName.toString.endsWith(".parquet")).get
    val dest = Paths.get(table, name)
    Files.createDirectories(dest.getParent)
    Files.move(part, dest)
    rmrf(tmp)
  }

  private def commit(table: String, v: Long, lines: String*): Unit = {
    val d = Paths.get(table, "_delta_log")
    Files.createDirectories(d)
    Files.write(d.resolve(f"$v%020d.json"), lines.mkString("", "\n", "\n").getBytes("UTF-8"))
  }

  private val schemaJson =
    """{"type":"struct","fields":[
      |{"name":"id","type":"long","nullable":true,"metadata":{}},
      |{"name":"ds","type":"date","nullable":true,"metadata":{}},
      |{"name":"v","type":"double","nullable":true,"metadata":{}}]}"""
      .stripMargin.replace("\n", "")

  test("reads a hand-written log: adds, removes, partition values, time travel") {
    import spark.implicits._
    val t = scratch()
    try {
      // data files carry only the non-partition columns (id, v)
      onePart(Seq((1L, 1.0), (2L, 2.0)).toDF("id", "v"), t, "ds=2024-01-01/f1.parquet")
      onePart(Seq((3L, 3.0)).toDF("id", "v"), t, "ds=2024-01-02/f2.parquet")
      onePart(Seq((4L, 4.0)).toDF("id", "v"), t, "ds=2024-01-02/f3.parquet")
      val escaped = schemaJson.replace("\"", "\\\"")
      commit(t, 0L,
        """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
        s"""{"metaData":{"id":"m1","format":{"provider":"parquet","options":{}},"schemaString":"$escaped","partitionColumns":["ds"],"configuration":{}}}""",
        """{"add":{"path":"ds=2024-01-01/f1.parquet","partitionValues":{"ds":"2024-01-01"},"size":1,"modificationTime":1,"dataChange":true}}""",
        """{"add":{"path":"ds=2024-01-02/f2.parquet","partitionValues":{"ds":"2024-01-02"},"size":1,"modificationTime":1,"dataChange":true}}""")
      // v1: replace f2 with f3 in the same partition
      commit(t, 1L,
        """{"commitInfo":{"operation":"REPLACE"}}""",
        """{"remove":{"path":"ds=2024-01-02/f2.parquet","deletionTimestamp":2,"dataChange":true}}""",
        """{"add":{"path":"ds=2024-01-02/f3.parquet","partitionValues":{"ds":"2024-01-02"},"size":1,"modificationTime":2,"dataChange":true}}""")

      val now = DeltaLake.read(spark, t)
        .select(col("id"), col("ds").cast("string").as("ds"), col("v"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
      assert(now == Set((1L, "2024-01-01", 1.0), (2L, "2024-01-01", 2.0), (4L, "2024-01-02", 4.0)))
      // partition column is a real DATE, reconstructed from the log
      assert(DeltaLake.read(spark, t).schema("ds").dataType.typeName == "date")

      val v0 = DeltaLake.read(spark, t, versionAsOf = Some(0L))
        .select(col("id")).collect().map(_.getLong(0)).toSet
      assert(v0 == Set(1L, 2L, 3L))
      intercept[IllegalArgumentException] { DeltaLake.state(t, spark, Some(9L)) }
    } finally rmrf(t)
  }

  test("writer lifecycle round-trips; checkpoint survives vacuumed commits") {
    import spark.implicits._
    val t = scratch()
    try {
      val d0 = Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "a", 3.0)).toDF("id", "seg", "v")
      DeltaLake.create(spark, t, d0, partitionColumns = Seq("seg"))
      DeltaLake.append(spark, t, Seq((4L, "c", 4.0)).toDF("id", "seg", "v"))
      DeltaLake.checkpoint(spark, t)                       // checkpoint at v1
      DeltaLake.deleteWhere(spark, t, _.get("seg").contains("b"))   // v2
      def ids(): Set[Long] =
        DeltaLake.read(spark, t).select("id").collect().map(_.getLong(0)).toSet
      assert(ids() == Set(1L, 3L, 4L))
      // simulate VACUUM of pre-checkpoint commits: replay must come
      // from the checkpoint + 2.json alone
      Files.delete(Paths.get(t, "_delta_log", f"${0L}%020d.json"))
      Files.delete(Paths.get(t, "_delta_log", f"${1L}%020d.json"))
      assert(ids() == Set(1L, 3L, 4L))
      // but version 0 is no longer reconstructable
      intercept[IllegalArgumentException] { DeltaLake.state(t, spark, Some(0L)) }
    } finally rmrf(t)
  }

  test("rejects unknown reader features and unknown columnMapping modes") {
    import spark.implicits._
    val t = scratch()
    try {
      onePart(Seq((1L, 1.0)).toDF("id", "v"), t, "f1.parquet")
      val sch = """{\"type\":\"struct\",\"fields\":[{\"name\":\"id\",\"type\":\"long\",\"nullable\":true,\"metadata\":{}},{\"name\":\"v\",\"type\":\"double\",\"nullable\":true,\"metadata\":{}}]}"""
      commit(t, 0L,
        """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["futureMagic"]}}""",
        s"""{"metaData":{"id":"m1","format":{"provider":"parquet","options":{}},"schemaString":"$sch","partitionColumns":[],"configuration":{}}}""",
        """{"add":{"path":"f1.parquet","partitionValues":{},"size":1,"modificationTime":1,"dataChange":true}}""")
      intercept[IllegalArgumentException] { DeltaLake.read(spark, t) }

      val t2 = scratch()
      try {
        onePart(Seq((1L, 1.0)).toDF("id", "v"), t2, "f1.parquet")
        commit(t2, 0L,
          """{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}""",
          s"""{"metaData":{"id":"m1","format":{"provider":"parquet","options":{}},"schemaString":"$sch","partitionColumns":[],"configuration":{"delta.columnMapping.mode":"weird"}}}""",
          """{"add":{"path":"f1.parquet","partitionValues":{},"size":1,"modificationTime":1,"dataChange":true}}""")
        intercept[IllegalArgumentException] { DeltaLake.read(spark, t2) }
      } finally rmrf(t2)
    } finally rmrf(t)
  }

  test("columnMapping name mode: physical->logical rename, nested structs, partition keys") {
    import spark.implicits._
    import org.apache.spark.sql.functions.struct
    val t = scratch()
    try {
      // data files carry PHYSICAL names: col-1 (id), col-2 (payload
      // struct with inner col-3 = v); partition column ds is col-9 in
      // add.partitionValues and never in the data files
      onePart(
        Seq((1L, 1.5), (2L, 2.5)).toDF("col-1", "x")
          .select(col("col-1"), struct(col("x").as("col-3")).as("col-2")),
        t, "f1.parquet")
      onePart(
        Seq((3L, 3.5)).toDF("col-1", "x")
          .select(col("col-1"), struct(col("x").as("col-3")).as("col-2")),
        t, "f2.parquet")
      val meta1 = """{\"delta.columnMapping.id\":1,\"delta.columnMapping.physicalName\":\"col-1\"}"""
      val meta3 = """{\"delta.columnMapping.id\":3,\"delta.columnMapping.physicalName\":\"col-3\"}"""
      val payloadType = raw"""{\"type\":\"struct\",\"fields\":[{\"name\":\"v\",\"type\":\"double\",\"nullable\":true,\"metadata\":$meta3}]}"""
      val meta2 = """{\"delta.columnMapping.id\":2,\"delta.columnMapping.physicalName\":\"col-2\"}"""
      val meta9 = """{\"delta.columnMapping.id\":9,\"delta.columnMapping.physicalName\":\"col-9\"}"""
      val sch = raw"""{\"type\":\"struct\",\"fields\":[{\"name\":\"id\",\"type\":\"long\",\"nullable\":true,\"metadata\":$meta1},{\"name\":\"payload\",\"type\":$payloadType,\"nullable\":true,\"metadata\":$meta2},{\"name\":\"ds\",\"type\":\"string\",\"nullable\":true,\"metadata\":$meta9}]}"""
      commit(t, 0L,
        """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["columnMapping"]}}""",
        s"""{"metaData":{"id":"m1","format":{"provider":"parquet","options":{}},"schemaString":"$sch","partitionColumns":["ds"],"configuration":{"delta.columnMapping.mode":"name"}}}""",
        """{"add":{"path":"f1.parquet","partitionValues":{"col-9":"a"},"size":1,"modificationTime":1,"dataChange":true}}""",
        """{"add":{"path":"f2.parquet","partitionValues":{"col-9":"b"},"size":1,"modificationTime":1,"dataChange":true}}""")
      val out = DeltaLake.read(spark, t)
      assert(out.columns.toSeq == Seq("id", "payload", "ds"))
      val rows = out.selectExpr("id", "payload.v", "ds")
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).toSet
      assert(rows == Set((1L, 1.5, "a"), (2L, 2.5, "a"), (3L, 3.5, "b")))
      // logical predicates prune/push down against the renamed scan
      assert(out.filter(col("id") === 3L).count() == 1)
      // DV writer refuses mapped tables rather than matching nothing
      intercept[IllegalArgumentException] {
        DeltaLake.deleteWhere(spark, t, col("id") === 1L)
      }
      // a mapped field without physicalName metadata is loud
      val t2 = scratch()
      try {
        onePart(Seq(Tuple1(1L)).toDF("col-1"), t2, "f1.parquet")
        val badSch = """{\"type\":\"struct\",\"fields\":[{\"name\":\"id\",\"type\":\"long\",\"nullable\":true,\"metadata\":{}}]}"""
        commit(t2, 0L,
          """{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}""",
          s"""{"metaData":{"id":"m1","format":{"provider":"parquet","options":{}},"schemaString":"$badSch","partitionColumns":[],"configuration":{"delta.columnMapping.mode":"name"}}}""",
          """{"add":{"path":"f1.parquet","partitionValues":{},"size":1,"modificationTime":1,"dataChange":true}}""")
        intercept[IllegalArgumentException] { DeltaLake.read(spark, t2) }
      } finally rmrf(t2)
    } finally rmrf(t)
  }

  test("partitioned read is ONE parquet scan with a broadcast attach") {
    import spark.implicits._
    val t = scratch()
    try {
      DeltaLake.create(spark, t,
        Seq((1L, "a", 1.0), (2L, "b", 2.0)).toDF("id", "seg", "v"),
        partitionColumns = Seq("seg"))
      val plan = DeltaLake.read(spark, t).queryExecution.executedPlan.toString
      assert("Scan parquet".r.findAllIn(plan).size == 1, s"expected one scan:\n$plan")
      assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
        s"partition attach should broadcast:\n$plan")
    } finally rmrf(t)
  }

  test("z85 + roaring64 DV payload round-trip (PROTOCOL.md formats)") {
    // z85: 4-byte groups -> 5 chars, reversible, rejects bad chars
    val bytes = Array.tabulate[Byte](16)(i => (i * 17 + 3).toByte)
    assert(DeltaLake.Z85.decode(DeltaLake.Z85.encode(bytes)).toSeq == bytes.toSeq)
    // the spec's canonical vector: "HelloWorld" decodes 0x86 0x4F 0xD2 0x6F 0xB5 0x59 0xF7 0x5B
    assert(DeltaLake.Z85.decode("HelloWorld").map(b => f"${b & 0xff}%02x").mkString == "864fd26fb559f75b")
    intercept[IllegalArgumentException](DeltaLake.Z85.decode("bad~char!!"))
    // bitmap: positions across multiple 32-bit buckets round-trip
    val pos = Seq(0L, 7L, 63L, 4294967295L, 4294967296L, 8589934592L + 42L)
    assert(DeltaLake.dvPositions(DeltaLake.dvSerialize(pos)).toSeq == pos.sorted)
  }

  test("deletion vectors: deleteWhere masks rows; DVs stack; time travel pre-delete") {
    import spark.implicits._
    val t = scratch()
    try {
      DeltaLake.create(spark, t, (1L to 100L).map(i => (i, s"n$i")).toDF("id", "name"))
      DeltaLake.append(spark, t, (101L to 200L).map(i => (i, s"n$i")).toDF("id", "name"))
      val v = DeltaLake.deleteWhere(spark, t, col("id") % 10 === 3)
      val after = DeltaLake.read(spark, t)
      assert(after.count() == 180)
      assert(after.filter(col("id") % 10 === 3).count() == 0)
      assert(after.agg(sum(col("id"))).head().getLong(0) ==
        (1L to 200L).filter(_ % 10 != 3).sum)
      // pre-delete version unaffected
      assert(DeltaLake.read(spark, t, Some(v - 1)).count() == 200)
      // second DV on the SAME files merges with the first
      DeltaLake.deleteWhere(spark, t, col("id") === 4L)
      assert(DeltaLake.read(spark, t).count() == 179)
      assert(DeltaLake.read(spark, t).filter(col("id") === 4L).count() == 0)
      // appends after deletes are unaffected
      DeltaLake.append(spark, t, Seq((300L, "x")).toDF("id", "name"))
      assert(DeltaLake.read(spark, t).count() == 180)
    } finally rmrf(t)
  }

  test("deletion vectors on a partitioned table compose with the attach join") {
    import spark.implicits._
    val t = scratch()
    try {
      DeltaLake.create(spark, t,
        (1L to 60L).map(i => (i, if (i % 3 == 0) "eu" else "us", i * 1.5)).toDF("id", "seg", "v"),
        partitionColumns = Seq("seg"))
      DeltaLake.deleteWhere(spark, t, col("id") % 2 === 0)
      val after = DeltaLake.read(spark, t)
      assert(after.count() == 30)
      // partition values still attach on the surviving rows
      assert(after.filter(col("seg") === "eu").count() == (1L to 60L).count(i => i % 3 == 0 && i % 2 == 1))
      assert(after.columns.toSeq == Seq("id", "seg", "v"))
    } finally rmrf(t)
  }
}
