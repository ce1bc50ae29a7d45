package graft

/** Snapshot-accept helper for ported slt suites: runs one suite
  * through the GraftSql statement head and rewrites each mismatching
  * query's expected block with the engine's actual rows (statements
  * and passing queries are left untouched). Review the diff before
  * committing — this records current behavior, it does not judge it.
  *
  * Usage: Test/runMain graft.SltAccept src/test/resources/slt_sql/x.slt
  */
object SltAccept {
  def main(args: Array[String]): Unit = {
    val path = java.nio.file.Paths.get(args(0))
    val text = java.nio.file.Files.readString(path)
    val spark = GraftSession(cpus = 8, appName = "slt-accept")
    graft.functions.GraftFunctions.register(spark)
    val base = java.nio.file.Paths.get("target", "tmp")
    java.nio.file.Files.createDirectories(base)
    val wh = java.nio.file.Files.createTempDirectory(base, "sltaccept").toString
    val g = GraftSql(spark, wh)

    val lines = text.split("\n", -1).toBuffer
    var i = 0
    var patched = 0
    while (i < lines.length) {
      val l = lines(i).trim
      if (l.startsWith("query") && !l.startsWith("query error")) {
        val rowsort = l.split("\\s+").contains("rowsort")
        var j = i + 1
        val sb = new StringBuilder
        while (j < lines.length && lines(j).trim != "----" && lines(j).trim.nonEmpty) {
          sb.append(lines(j)).append('\n'); j += 1
        }
        if (j < lines.length && lines(j).trim == "----") {
          var k = j + 1
          while (k < lines.length && lines(k).trim.nonEmpty) k += 1
          val expected = lines.slice(j + 1, k).toSeq
          val got =
            try Some(g.execute(sb.toString).collect().map(Slt.formatRow).toSeq)
            catch { case e: Throwable =>
              println(s"KEEP (errors): line ${i + 1}: ${e.getMessage.take(120)}")
              None
            }
          got.foreach { rows =>
            val cmpGot = if (rowsort) rows.sorted else rows
            val cmpExp = if (rowsort) expected.sorted else expected
            if (cmpGot != cmpExp) {
              lines.remove(j + 1, k - j - 1)
              lines.insertAll(j + 1, if (rowsort) rows.sorted else rows)
              patched += 1
              println(s"PATCHED line ${i + 1} (${expected.length} -> ${rows.length} rows)")
            }
          }
        }
        i = j
      } else if (l.startsWith("statement")) {
        var j = i + 1
        val sb = new StringBuilder
        while (j < lines.length && lines(j).trim.nonEmpty) {
          sb.append(lines(j)).append('\n'); j += 1
        }
        val expectError = l.contains("error")
        try {
          g.execute(sb.toString).write.format("noop").mode("overwrite").save()
          if (expectError) println(s"NOTE: line ${i + 1} expected error but succeeded")
        } catch { case e: Throwable =>
          if (!expectError)
            println(s"NOTE: line ${i + 1} statement failed: ${String.valueOf(e.getMessage).take(160)}")
        }
        i = j
      } else i += 1
    }
    java.nio.file.Files.writeString(path, lines.mkString("\n"))
    println(s"accepted $patched blocks into $path")
  }
}
