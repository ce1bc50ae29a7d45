package graft

import org.apache.spark.sql.{Row, SparkSession}

/** Minimal sqllogictest-format runner (the reference's primary test
  * harness: tests/sqllogictests/suites/, 1011 .test files, runner
  * tests/sqllogictests/src/main.rs) re-expressed over `spark.sql`.
  *
  * Supported directives:
  *   statement ok          — run SQL, expect success
  *   statement error       — run SQL, expect an exception
  *   query <types>         — run SQL, compare formatted rows in order
  *   query <types> rowsort — same, rows sorted lexicographically
  * Expected rows follow a `----` line, one row per line, columns
  * TAB-separated.
  *
  * Cell formatting (canonical, both sides authored to match):
  * null → "NULL"; booleans → true/false; doubles → up to 6 significant
  * decimals with trailing zeros trimmed; everything else → toString.
  */
object Slt {

  private val TsFmt =
    java.time.format.DateTimeFormatter.ofPattern("uuuu-MM-dd HH:mm:ss.SSSSSS")

  sealed trait Case { def sql: String; def line: Int }
  final case class Statement(sql: String, line: Int, expectError: Boolean) extends Case
  final case class Query(sql: String, line: Int, expected: Seq[String], rowsort: Boolean)
      extends Case

  def parse(text: String): Seq[Case] = {
    val lines = text.linesIterator.toVector
    val out = Vector.newBuilder[Case]
    var i = 0
    def collectSql(start: Int, stop: String => Boolean): (String, Int) = {
      var j = start
      val sb = new StringBuilder
      var inDollar = false
      def dollars(s: String): Int = "\\$\\$".r.findAllIn(s).length
      while (j < lines.length && (inDollar || !stop(lines(j)))) {
        // a $$-quoted body (CREATE PROCEDURE / script UDFs) spans
        // blank lines — keep consuming until the closing $$
        if (dollars(lines(j)) % 2 == 1) inDollar = !inDollar
        sb.append(lines(j)).append('\n'); j += 1
      }
      (sb.toString.trim, j)
    }
    while (i < lines.length) {
      val l = lines(i).trim
      if (l.isEmpty || l.startsWith("#")) { i += 1 }
      else if (l.startsWith("statement")) {
        val expectError = l.contains("error")
        val (sql, j) = collectSql(i + 1, _.trim.isEmpty)
        out += Statement(sql, i + 1, expectError)
        i = j
      } else if (l.startsWith("query error")) {
        // reference runner: the query must fail (optionally matching a
        // message pattern, which we don't check — any failure passes)
        val (sql, j) = collectSql(i + 1, _.trim.isEmpty)
        out += Statement(sql, i + 1, expectError = true)
        i = j
      } else if (l.startsWith("query")) {
        val rowsort = l.split("\\s+").contains("rowsort")
        val (sql, j) = collectSql(i + 1, ln => ln.trim == "----" || ln.trim.isEmpty)
        if (j >= lines.length || lines(j).trim != "----") {
          // the reference's runner tolerates a query with no result
          // block — execute-only, like `statement ok`
          out += Statement(sql, i + 1, expectError = false)
          i = j
        } else {
          var k = j + 1 // skip ----
          val exp = Vector.newBuilder[String]
          while (k < lines.length && lines(k).trim.nonEmpty) {
            exp += lines(k); k += 1
          }
          out += Query(sql, i + 1, exp.result(), rowsort)
          i = k
        }
      } else sys.error(s"slt parse error at line ${i + 1}: $l")
    }
    out.result()
  }

  /** databend's jsonb renders object keys SORTED; Spark's VariantVal
    * keeps insertion order — recursively sort for comparison
    */
  private def sortedJson(n: com.fasterxml.jackson.databind.JsonNode)
      : com.fasterxml.jackson.databind.JsonNode = n match {
    case o: com.fasterxml.jackson.databind.node.ObjectNode =>
      import scala.jdk.CollectionConverters._
      val out = com.fasterxml.jackson.databind.node.JsonNodeFactory.instance.objectNode()
      o.properties().asScala.toSeq.sortBy(_.getKey)
        .foreach(e => out.set[com.fasterxml.jackson.databind.JsonNode](
          e.getKey, sortedJson(e.getValue)))
      out
    case a: com.fasterxml.jackson.databind.node.ArrayNode =>
      import scala.jdk.CollectionConverters._
      val out = com.fasterxml.jackson.databind.node.JsonNodeFactory.instance.arrayNode()
      a.elements().asScala.foreach(e => out.add(sortedJson(e)))
      out
    case other => other
  }

  def formatCell(v: Any): String = formatCell(v, java.time.ZoneOffset.UTC)

  def formatCell(v: Any, zone: java.time.ZoneId): String = v match {
    case null => "NULL"
    case vv: org.apache.spark.unsafe.types.VariantVal =>
      // toJson, not toString: the debug toString mangles non-ASCII
      try sortedJson(graft.functions.JsonFlatten.mapper.readTree(
        vv.toJson(zone))).toString
      catch { case _: Exception => vv.toJson(zone) }
    case d: java.lang.Double => formatDouble(d)
    case f: java.lang.Float => formatDouble(f.doubleValue())
    // plain form: BigDecimal.toString switches to scientific notation
    // below 1e-6, which no engine's text output does
    case b: java.math.BigDecimal => b.toPlainString
    // uppercase hex: the reference's binary display (binary_format)
    case b: Array[Byte] => b.map("%02X".format(_)).mkString
    // micro-precision timestamp text, the reference's rendering —
    // instants render in the session timezone (UTC unless the suite
    // SET a different one). fromJavaTimestamp/fromJavaDate undo the
    // proleptic-Gregorian -> Julian rebase Spark applies when
    // materializing java.sql values (pre-1582 dates arrive shifted
    // otherwise: 0001-01-01 renders 0000-12-30)
    case t: java.sql.Timestamp =>
      val us = org.apache.spark.sql.catalyst.util.DateTimeUtils.fromJavaTimestamp(t)
      java.time.LocalDateTime.ofInstant(
        org.apache.spark.sql.catalyst.util.DateTimeUtils.microsToInstant(us),
        zone).format(TsFmt)
    case d: java.sql.Date =>
      java.time.LocalDate.ofEpochDay(
        org.apache.spark.sql.catalyst.util.DateTimeUtils.fromJavaDate(d).toLong)
        .format(java.time.format.DateTimeFormatter.ofPattern("uuuu-MM-dd"))
    case t: java.time.LocalDateTime => t.format(TsFmt)
    case t: java.time.Instant =>
      java.time.LocalDateTime.ofInstant(t, zone).format(TsFmt)
    // TIMESTAMP_TZ struct (graft.functions.TimestampTz.TzTs shape):
    // the reference's `2024-11-03 05:30:00.000000 -0500` rendering
    case r: Row if r.schema != null &&
        r.schema.fieldNames.sameElements(Array("us", "offset_minutes")) =>
      graft.functions.TimestampTz.display(r.getLong(0), r.getInt(1))
    // tuples print parenthesized (databend's tuple rendering)
    case r: Row => r.toSeq.map(formatNested(_, zone)).mkString("(", ",", ")")
    case s: scala.collection.Seq[_] => s.map(formatNested(_, zone)).mkString("[", ",", "]")
    case m: scala.collection.Map[_, _] =>
      m.map { case (k, v) => s"${formatNested(k, zone)}:${formatNested(v, zone)}" }
        .mkString("{", ",", "}")
    case other => other.toString
  }

  /** Inside arrays/tuples/maps the reference renders text values
    * JSON-quoted (`["aa","bb"]`, `(-1,"x")`, `{"k":"v"}`, nested dates
    * `["2023-04-15"]`); numbers, booleans and NULL stay bare.
    */
  private def formatNested(v: Any, zone: java.time.ZoneId): String = v match {
    case null => "NULL"
    case s: String => "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    // booleans inside containers render 0/1 in the reference
    // ([1,0], tuple (1,...)), like its scalar boolean output
    case b: Boolean => if (b) "1" else "0"
    case b: java.lang.Boolean => if (b) "1" else "0"
    // floats inside arrays/tuples render Rust-Debug style in the
    // reference ([0.0,4999.5], not [0,4999.5]): integral values keep
    // one fractional digit
    case d: Double if !d.isNaN && !d.isInfinite &&
        d == math.rint(d) && math.abs(d) < 1e16 =>
      d.toLong.toString + ".0"
    case f: Float if !f.isNaN && !f.isInfinite &&
        f == math.rint(f) && math.abs(f) < 1e16 =>
      f.toLong.toString + ".0"
    case _: java.sql.Date | _: java.sql.Timestamp | _: java.time.LocalDateTime |
         _: java.time.Instant | _: java.time.LocalDate =>
      "\"" + formatCell(v, zone) + "\""
    case other => formatCell(other, zone)
  }

  private def formatDouble(d: Double): String = {
    if (d.isNaN || d.isInfinite) return d.toString
    val a = math.abs(d)
    // extreme magnitudes render in databend's scientific form
    // (`1.0234567899999998e+81`); the 6-dp plain form would print
    // 80-digit integers or round tiny values to 0
    if (a != 0.0 && (a >= 1e16 || a < 1e-6)) {
      val s = java.lang.Double.toString(d) // e.g. 1.023E81 / 1.2E-11
      val i = s.indexOf('E')
      if (i < 0) return s
      val mant = s.substring(0, i)
      val exp = s.substring(i + 1)
      val signed = if (exp.startsWith("-")) exp else "+" + exp
      return s"${mant}e$signed"
    }
    val s = BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP)
      .bigDecimal.stripTrailingZeros.toPlainString
    if (s == "-0") "0" else s
  }

  def formatRow(r: Row): String = r.toSeq.map(formatCell).mkString("\t")

  def formatRow(r: Row, zone: java.time.ZoneId): String =
    r.toSeq.map(formatCell(_, zone)).mkString("\t")

  /** Run one file's cases; returns failure messages (empty = pass). */
  def run(spark: SparkSession, name: String, text: String): Seq[String] =
    runWith(sql => spark.sql(sql), name, text)

  /** Run with a custom executor — a `GraftSql.execute` head lets suites
    * exercise the full statement surface (CREATE/INSERT/DROP/...) the
    * way the reference's own harness does.
    */
  def runWith(exec: String => org.apache.spark.sql.DataFrame, name: String,
              text: String): Seq[String] = {
    parse(text).flatMap {
      case Statement(sql, line, expectError) =>
        val r = try {
          val df = exec(sql)
          // commands (CREATE/INSERT/DROP/SET...) already ran eagerly —
          // spark.sql wraps them in CommandResult, GraftSql's statement
          // heads return LocalRelation handles. Skipping the noop sink
          // for those saves one Spark job per statement (~half the slt
          // corpus), which is most of the suite's wall clock; lazy
          // SELECT plans still execute through the sink.
          val analyzed = df.queryExecution.analyzed
          val alreadyRun =
            analyzed.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.CommandResult] ||
            analyzed.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.LocalRelation]
          if (!alreadyRun) df.write.format("noop").mode("overwrite").save()
          None
        }
        catch { case e: Throwable => Some(e) }
        (r, expectError) match {
          case (None, true) => Seq(s"$name:$line expected error, statement succeeded")
          case (Some(e), false) =>
            val msg = Option(e.getMessage).getOrElse(e.toString)
            Seq(s"$name:$line statement failed: $msg")
          case _ => Nil
        }
      case Query(sql, line, expected, rowsort) =>
        try {
          // "(empty)" is the reference runner's rendering of the empty
          // string (a bare empty line would terminate the expected
          // block) — normalize both sides so either spelling matches
          def normEmpty(row: String): String =
            row.split("\t", -1).map(c => if (c == "(empty)") "" else c).mkString("\t")
          val df = exec(sql)
          val zone = java.time.ZoneId.of(
            df.sparkSession.conf.get("spark.sql.session.timeZone", "UTC"))
          var got = df.collect().map(formatRow(_, zone)).map(normEmpty).toSeq
          var exp = expected.map(normEmpty)
          if (rowsort) { got = got.sorted; exp = exp.sorted }
          // a cell may contain literal newlines (SHOW CREATE TABLE,
          // EXPLAIN): the expected block records them as continuation
          // lines, so unsorted blocks compare as joined text
          // DOUBLE/FLOAT/DECIMAL columns tolerate text-variant
          // renderings of the same value ("2.0" vs "2", 18-scale vs
          // the 6dp form): the reference's own sqllogictest validator
          // maps MYSQL_TYPE_FLOAT/DOUBLE/DECIMAL all to FloatingPoint
          // and normalizes both sides before comparing
          // (client/mysql_client.rs), so declared scale is not part of
          // its gate either. Integer-textual cells (no '.'/'e') still
          // compare exactly — u64 hash digits keep full precision.
          val isFloat: Array[Boolean] = df.schema.fields.map(f =>
            f.dataType == org.apache.spark.sql.types.DoubleType ||
            f.dataType == org.apache.spark.sql.types.FloatType ||
            f.dataType.isInstanceOf[org.apache.spark.sql.types.DecimalType])
          def fractional(s: String): Boolean =
            s.indexOf('.') >= 0 || s.indexOf('e') >= 0 || s.indexOf('E') >= 0
          def cellsMatch(e: String, g: String): Boolean =
            e == g || {
              val ec = e.split("\t", -1); val gc = g.split("\t", -1)
              ec.length == gc.length && ec.indices.forall { i =>
                ec(i) == gc(i) || (i < isFloat.length && isFloat(i) &&
                  (fractional(ec(i)) || fractional(gc(i))) && {
                  try {
                    val a = ec(i).toDouble; val b = gc(i).toDouble
                    a == b || math.abs(a - b) <=
                      1e-6 * math.max(1.0, math.max(math.abs(a), math.abs(b)))
                  } catch { case _: NumberFormatException => false }
                })
              }
            }
          val same = if (rowsort)
                       got == exp || (got.length == exp.length &&
                         got.indices.forall(i => cellsMatch(exp(i), got(i))))
                     else got.mkString("\n") == exp.mkString("\n") ||
                       (got.length == exp.length &&
                         got.indices.forall(i => cellsMatch(exp(i), got(i))))
          if (same) Nil
          else Seq(s"$name:$line mismatch\n  expected: ${exp.mkString(" | ")}\n  got:      ${got.mkString(" | ")}")
        } catch {
          case e: Throwable => Seq(s"$name:$line query failed: ${e.getMessage}")
        }
    }
  }
}
