package graft

/** Port-triage main: run candidate .slt files (paths as args) through
  * the GraftSql statement head and print failures, without the
  * ScalaTest wrapper — used while adapting reference sqllogictest
  * suites (scripts/port_slt.py output) before they land in
  * src/test/resources/slt_sql/.
  *
  *   sbt "Test/runMain graft.SltRunner /tmp/sltport/crdb_and_or.slt ..."
  */
object SltRunner {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession(cpus = 8, appName = "graft-slt-runner")
    graft.functions.GraftFunctions.register(spark)
    var bad = 0
    for (path <- args) {
      val base = java.nio.file.Paths.get("target", "tmp")
      java.nio.file.Files.createDirectories(base)
      val wh = java.nio.file.Files.createTempDirectory(base, "sltrun").toString
      val g = GraftSql(spark, wh)
      val failures =
        try Slt.runWith(g.execute, java.nio.file.Paths.get(path).getFileName.toString,
          java.nio.file.Files.readString(java.nio.file.Paths.get(path)))
        catch { case e: Throwable => Seq(s"$path: harness error: $e") }
        finally g.resetSessionSettings()
      if (failures.isEmpty) println(s"== PASS $path")
      else {
        bad += 1
        println(s"== FAIL $path (${failures.size})")
        failures.foreach(f => println(f.linesIterator.map("   " + _).mkString("\n")))
      }
    }
    println(s"== done: ${args.length - bad} pass, $bad fail")
    spark.stop()
    sys.exit(if (bad > 0) 1 else 0)
  }
}
