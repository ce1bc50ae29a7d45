package graft

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.GraftTable

/** Virtual columns: declared JSON paths materialize at write and the
  * optimizer rewrites get_json_object to the stored column — proven on
  * the optimized plan (no JSON parse), the scan (raw JSON column pruned
  * away, filter pushed to parquet), and the values (identical to raw
  * parsing, including after UPDATE rewrites of the JSON).
  */
class VirtualColumnSpec extends AnyFunSuite {
  private lazy val spark = GraftSession(cpus = 4, appName = "graft-virt-test")

  private def scratch(): String = {
    val base = Paths.get("target", "virt_spec")
    Files.createDirectories(base)
    Files.createTempDirectory(base, "t").toString
  }

  private def rmrf(dir: String): Unit = {
    val p = Paths.get(dir)
    if (Files.exists(p))
      Files.walk(p).iterator().asScala.toSeq.reverse.foreach(Files.delete)
  }

  private def mkTable(dir: String) = {
    import spark.implicits._
    val df = (1 to 200).map { i =>
      (i.toLong, s"""{"lang":"${if (i % 3 == 0) "en" else "de"}","score":$i}""")
    }.toDF("id", "props")
    val t = GraftTable.open(spark, dir)
    t.setVirtualColumns("props", Seq("$.lang", "$.score"))
    t.append(df)
    t
  }

  test("read() hides __virt_* from the user-visible schema") {
    val dir = scratch()
    try {
      val t = mkTable(dir)
      assert(t.read().columns.toSeq == Seq("id", "props"),
        "stored internals leaked into SELECT *")
      assert(t.readWithVirtual().columns.count(_.startsWith("__virt_")) == 2)
      // schema-sensitive round-trip: union with the source frame works
      import spark.implicits._
      val src = Seq((9999L, "{}")).toDF("id", "props")
      assert(t.read().unionByName(src).count() == 201)
    } finally rmrf(dir)
  }

  test("declared paths rewrite to stored columns; raw JSON never parsed") {
    val dir = scratch()
    try {
      val t = mkTable(dir)
      val q = t.read().select(get_json_object(col("props"), "$.lang").as("lang"))
      val opt = q.queryExecution.optimizedPlan.toString
      assert(!opt.contains("get_json_object"), s"rewrite missed:\n$opt")
      assert(opt.contains("__virt_props_lang"))
      // values identical to raw parsing
      val expected = t.read().selectExpr("get_json_object(props, '$.score') AS s")
        .collect().map(_.getString(0)).sorted.toSeq
      val viaRaw = (1 to 200).map(_.toString).sorted
      assert(expected == viaRaw)
    } finally rmrf(dir)
  }

  test("path filter pushes down on the virtual column; json column pruned from scan") {
    val dir = scratch()
    try {
      val t = mkTable(dir)
      val q = t.read()
        .filter(get_json_object(col("props"), "$.lang") === "en")
        .select(get_json_object(col("props"), "$.score").as("score"))
      assert(q.count() == 66) // i % 3 == 0
      val executed = q.queryExecution.executedPlan.toString
      assert(executed.contains("PushedFilters") &&
        executed.contains("__virt_props_lang"), s"no pushdown:\n$executed")
      // the fat JSON column is not read at all
      val readSchema = "ReadSchema: [^\\n]+".r.findFirstIn(executed).getOrElse("")
      assert(!readSchema.contains("props,") && !readSchema.contains("props:"),
        s"json column still scanned: $readSchema")
    } finally rmrf(dir)
  }

  test("a re-derived json column is NOT rewritten to the stale stored value") {
    val dir = scratch()
    try {
      val t = mkTable(dir)
      // overwrite props between scan and path read: the stored column
      // no longer describes this attribute
      val q = t.read()
        .withColumn("props", regexp_replace(col("props"), "en", "xx"))
        .select(get_json_object(col("props"), "$.lang").as("lang"))
      assert(q.queryExecution.optimizedPlan.toString.contains("get_json_object"),
        "rewrite fired on a modified column")
      val langs = q.collect().map(_.getString(0)).toSet
      assert(langs == Set("xx", "de")) // parsed from the MODIFIED json
    } finally rmrf(dir)
  }

  test("undeclared paths still parse raw") {
    val dir = scratch()
    try {
      val t = mkTable(dir)
      val q = t.read().select(get_json_object(col("props"), "$.missing").as("m"))
      assert(q.queryExecution.optimizedPlan.toString.contains("get_json_object"))
      assert(q.collect().forall(_.isNullAt(0)))
    } finally rmrf(dir)
  }

  test("UPDATE rewrites recompute the virtual columns") {
    val dir = scratch()
    try {
      val t = mkTable(dir)
      t.update(col("id") === 9, Map("props" -> lit("""{"lang":"fr","score":999}""")))
      val langs = t.read().filter(col("id") === 9)
        .select(get_json_object(col("props"), "$.lang")).collect().map(_.getString(0))
      assert(langs.toSeq == Seq("fr"))
      // and the stored column agrees (query the internals directly —
      // read() hides __virt_* from the user-visible schema)
      val stored = t.readWithVirtual().filter(col("id") === 9)
        .select(col(GraftTable.virtName("props", "$.lang"))).collect().map(_.getString(0))
      assert(stored.toSeq == Seq("fr"))
    } finally rmrf(dir)
  }

  test("declaration after the first write is rejected") {
    val dir = scratch()
    try {
      import spark.implicits._
      val t = GraftTable.create(spark, dir, Seq((1L, "{}")).toDF("id", "props"))
      val e = intercept[IllegalArgumentException](
        t.setVirtualColumns("props", Seq("$.x")))
      assert(e.getMessage.contains("before the first write"))
    } finally rmrf(dir)
  }
}
