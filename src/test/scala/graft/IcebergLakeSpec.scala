package graft

import graft.sources.IcebergLake
import org.apache.avro.Schema
import org.apache.avro.file.DataFileWriter
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Iceberg metadata-chain reader: writer round-trip + snapshot time
  * travel, a hand-written v1 metadata chain (reader vs the PUBLIC
  * spec's shapes, independent of our writer), and the delete-manifest /
  * deleted-entry guards.
  */
class IcebergLakeSpec extends AnyFunSuite {
  private lazy val spark = GraftSession(cpus = 4, appName = "graft-iceberg-test")

  private def scratch(): String = {
    val base = Paths.get("target", "iceberg_spec")
    Files.createDirectories(base)
    Files.createTempDirectory(base, "t").toString
  }

  private def rmrf(dir: String): Unit = {
    val p = Paths.get(dir)
    if (Files.exists(p))
      Files.walk(p).iterator().asScala.toSeq.reverse.foreach(Files.delete)
  }

  private val entrySchema = new Schema.Parser().parse(
    """{"type":"record","name":"manifest_entry","fields":[
      |{"name":"status","type":"int"},
      |{"name":"data_file","type":{"type":"record","name":"r2","fields":[
      |  {"name":"file_path","type":"string"},
      |  {"name":"file_format","type":"string"}]}}]}""".stripMargin)

  private def writeManifest(file: String, entries: Seq[(Int, String)]): Unit = {
    val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](entrySchema))
    w.create(entrySchema, new java.io.File(file))
    try entries.foreach { case (status, path) =>
      val e = new GenericData.Record(entrySchema)
      e.put("status", status)
      val d = new GenericData.Record(entrySchema.getField("data_file").schema())
      d.put("file_path", path)
      d.put("file_format", "PARQUET")
      e.put("data_file", d)
      w.append(e)
    } finally w.close()
  }

  test("writer round-trips; snapshot time travel reads the old file set") {
    import spark.implicits._
    val t = scratch()
    try {
      val s1 = IcebergLake.write(spark, t,
        Seq((1L, "a", BigDecimal("1.10")), (2L, "b", BigDecimal("2.20")))
          .toDF("id", "name", "amt").select(col("id"), col("name"),
            col("amt").cast("decimal(10,2)").as("amt")))
      val s2 = IcebergLake.write(spark, t,
        Seq((3L, "c", BigDecimal("3.30"))).toDF("id", "name", "amt")
          .select(col("id"), col("name"), col("amt").cast("decimal(10,2)").as("amt")))
      assert(s2 == s1 + 1)
      def ids(snap: Option[Long]): Set[Long] =
        IcebergLake.read(spark, t, snap).select("id").collect().map(_.getLong(0)).toSet
      assert(ids(None) == Set(1L, 2L, 3L))
      assert(ids(Some(s1)) == Set(1L, 2L))
      // decimal survives the schema JSON round trip
      assert(IcebergLake.read(spark, t).schema("amt").dataType == org.apache.spark.sql.types.DecimalType(10, 2))
      intercept[IllegalArgumentException] { IcebergLake.state(t, Some(99L)) }
    } finally rmrf(t)
  }

  test("reads a hand-written v1 metadata chain (inline manifests, `schema`)") {
    import spark.implicits._
    val t = scratch()
    try {
      val mdir = Paths.get(t, "metadata")
      Files.createDirectories(mdir)
      val data = Paths.get(t, "data")
      Seq((10L, "x"), (11L, "y")).toDF("id", "name").coalesce(1).write.parquet(data.toString)
      val pq = Files.walk(data).iterator().asScala
        .find(_.getFileName.toString.endsWith(".parquet")).get.toAbsolutePath.toString
      writeManifest(mdir.resolve("m1.avro").toString, Seq((1, pq)))
      val md =
        s"""{"format-version":1,"table-uuid":"u","location":"$t",
           |"schema":{"type":"struct","schema-id":0,"fields":[
           |  {"id":1,"name":"id","required":false,"type":"long"},
           |  {"id":2,"name":"name","required":false,"type":"string"}]},
           |"current-snapshot-id":7,
           |"snapshots":[{"snapshot-id":7,"timestamp-ms":1,
           |  "manifests":["${mdir.resolve("m1.avro").toAbsolutePath}"]}]}""".stripMargin
      Files.write(mdir.resolve("v1.metadata.json"), md.getBytes("UTF-8"))
      Files.write(mdir.resolve("version-hint.text"), "1".getBytes("UTF-8"))
      val rows = IcebergLake.read(spark, t).collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(rows == Set((10L, "x"), (11L, "y")))
    } finally rmrf(t)
  }

  test("deleted entries are excluded; delete manifests are rejected") {
    import spark.implicits._
    val t = scratch()
    try {
      // snapshot 1 with two files, then hand-mark one entry DELETED in a
      // follow-up manifest referencing the same file
      IcebergLake.write(spark, t, Seq((1L, "a")).toDF("id", "name"))
      val st = IcebergLake.state(t)
      val mdir = Paths.get(t, "metadata")
      // rewrite the manifest with status=2 for every file: nothing left
      writeManifest(mdir.resolve("m-del.avro").toString, st.files.map(f => (2, f)))
      // point snapshot at an inline-manifest v1-style chain for brevity
      val md2 =
        s"""{"format-version":1,"table-uuid":"u","location":"$t",
           |"schema":{"type":"struct","schema-id":0,"fields":[
           |  {"id":1,"name":"id","required":false,"type":"long"},
           |  {"id":2,"name":"name","required":false,"type":"string"}]},
           |"current-snapshot-id":9,
           |"snapshots":[{"snapshot-id":9,"timestamp-ms":1,
           |  "manifests":["${mdir.resolve("m-del.avro").toAbsolutePath}"]}]}""".stripMargin
      Files.write(mdir.resolve("v2.metadata.json"), md2.getBytes("UTF-8"))
      Files.write(mdir.resolve("version-hint.text"), "2".getBytes("UTF-8"))
      assert(IcebergLake.read(spark, t).count() == 0)

      // a manifest-list row with content=1 (delete manifest) must refuse
      val mlSchema = new Schema.Parser().parse(
        """{"type":"record","name":"manifest_file","fields":[
          |{"name":"manifest_path","type":"string"},
          |{"name":"content","type":"int"}]}""".stripMargin)
      // the delete manifest needs a LIVE entry for the guard to see it
      writeManifest(mdir.resolve("m-live.avro").toString, st.files.map(f => (1, f)))
      val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](mlSchema))
      w.create(mlSchema, mdir.resolve("ml-del.avro").toFile)
      val r = new GenericData.Record(mlSchema)
      r.put("manifest_path", mdir.resolve("m-live.avro").toAbsolutePath.toString)
      r.put("content", 1)
      w.append(r)
      w.close()
      val md3 =
        s"""{"format-version":1,"table-uuid":"u","location":"$t",
           |"schema":{"type":"struct","schema-id":0,"fields":[
           |  {"id":1,"name":"id","required":false,"type":"long"}]},
           |"current-snapshot-id":9,
           |"snapshots":[{"snapshot-id":9,"timestamp-ms":1,
           |  "manifest-list":"${mdir.resolve("ml-del.avro").toAbsolutePath}"}]}""".stripMargin
      Files.write(mdir.resolve("v3.metadata.json"), md3.getBytes("UTF-8"))
      Files.write(mdir.resolve("version-hint.text"), "3".getBytes("UTF-8"))
      // a content=1 manifest whose data_file carries content=0 is
      // malformed (delete manifests must hold delete files) — refuse
      // rather than guess
      intercept[IllegalArgumentException] { IcebergLake.read(spark, t) }
    } finally rmrf(t)
  }

  test("positional deletes apply on read; time travel sees pre-delete rows") {
    import spark.implicits._
    val t = scratch()
    try {
      IcebergLake.write(spark, t, (1L to 100L).map(i => (i, s"n$i")).toDF("id", "name"))
      IcebergLake.write(spark, t, (101L to 200L).map(i => (i, s"n$i")).toDF("id", "name"))
      val delSnap = IcebergLake.deleteWhere(spark, t, col("id") % 10 === 3)
      val after = IcebergLake.read(spark, t)
      assert(after.count() == 180)
      assert(after.filter(col("id") % 10 === 3).count() == 0)
      assert(after.agg(sum(col("id"))).head().getLong(0) ==
        (1L to 200L).filter(_ % 10 != 3).sum)
      // pre-delete snapshot still reads everything
      assert(IcebergLake.read(spark, t, Some(delSnap - 1)).count() == 200)
      // deletes stack across snapshots
      IcebergLake.deleteWhere(spark, t, col("id") === 4L)
      assert(IcebergLake.read(spark, t).count() == 179)
      // appends after deletes are unaffected by older delete files
      IcebergLake.write(spark, t, Seq((300L, "x")).toDF("id", "name"))
      assert(IcebergLake.read(spark, t).count() == 180)
      // equality deletes (content=2) refuse loudly
      val st = IcebergLake.state(t)
      assert(st.posDeletes.nonEmpty)
    } finally rmrf(t)
  }

  test("column rename resolves by field id (iceberg column projection)") {
    import org.apache.spark.sql.types._
    val t = scratch()
    try {
      // data files embed parquet field ids (1, 2) matching the iceberg
      // schema the writer generates
      val schema = StructType(Seq(
        StructField("a", LongType, nullable = true,
          new MetadataBuilder().putLong("parquet.field.id", 1L).build()),
        StructField("b", StringType, nullable = true,
          new MetadataBuilder().putLong("parquet.field.id", 2L).build())))
      val rows = new java.util.ArrayList[org.apache.spark.sql.Row]()
      rows.add(org.apache.spark.sql.Row(7L, "x"))
      rows.add(org.apache.spark.sql.Row(8L, "y"))
      IcebergLake.write(spark, t, spark.createDataFrame(rows, schema))
      // a rename commit: same field id, new name (edit the metadata the
      // way a real ALTER TABLE RENAME COLUMN does — ids never change)
      val mdir = java.nio.file.Paths.get(t, "metadata")
      val v = new String(java.nio.file.Files.readAllBytes(
        mdir.resolve("version-hint.text")), "UTF-8").trim.toInt
      val mp = mdir.resolve(s"v$v.metadata.json")
      val edited = new String(java.nio.file.Files.readAllBytes(mp), "UTF-8")
        .replace("\"a\"", "\"renamed\"")
      java.nio.file.Files.write(mp, edited.getBytes("UTF-8"))
      val out = IcebergLake.read(spark, t)
      assert(out.columns.toSeq == Seq("renamed", "b"))
      // by-id projection: the renamed column still reads the stored
      // values (name-based matching would return nulls here)
      assert(out.select("renamed").collect().map(_.getLong(0)).toSet == Set(7L, 8L))
    } finally rmrf(t)
  }

  test("equality deletes: sequence scoping, re-insert survives, null keys match") {
    import spark.implicits._
    val t = scratch()
    try {
      IcebergLake.write(spark, t,
        Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "name"))           // seq 1
      IcebergLake.write(spark, t,
        Seq((4L, "d"), (5L, "e")).toDF("id", "name"))                      // seq 2
      val delSnap = IcebergLake.writeEqualityDeletes(spark, t,
        Seq(Tuple1(2L), Tuple1(5L)).toDF("id"), Seq("id"))                 // seq 3
      val after = IcebergLake.read(spark, t)
      assert(after.select("id").collect().map(_.getLong(0)).toSet == Set(1L, 3L, 4L))
      // time travel before the delete sees everything
      assert(IcebergLake.read(spark, t, Some(delSnap - 1)).count() == 5)
      // re-insert of a deleted key AFTER the delete snapshot survives
      // (strictly-smaller sequence rule)
      IcebergLake.write(spark, t, Seq((2L, "b2")).toDF("id", "name"))      // seq 4
      val rows = IcebergLake.read(spark, t)
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(rows == Set((1L, "a"), (3L, "c"), (4L, "d"), (2L, "b2")))
      // multi-column equality set + null-safe matching
      val t2 = scratch()
      try {
        IcebergLake.write(spark, t2,
          Seq((1L, Option("x")), (1L, None), (2L, Option("x")))
            .toDF("k", "tag"))
        IcebergLake.writeEqualityDeletes(spark, t2,
          Seq((1L, Option.empty[String])).toDF("k", "tag"), Seq("k", "tag"))
        val left = IcebergLake.read(spark, t2)
          .collect().map(r => (r.getLong(0), Option(r.getString(1)))).toSet
        assert(left == Set((1L, Some("x")), (2L, Some("x"))))
      } finally rmrf(t2)
      // equality + positional deletes stack
      IcebergLake.deleteWhere(spark, t, col("id") === 4L)                  // seq 5
      assert(IcebergLake.read(spark, t).select("id").collect()
        .map(_.getLong(0)).toSet == Set(1L, 3L, 2L))
      // unknown equality column refuses loudly
      intercept[IllegalArgumentException] {
        IcebergLake.writeEqualityDeletes(spark, t, Seq(Tuple1(1L)).toDF("nope"), Seq("nope"))
      }
    } finally rmrf(t)
  }
}
