package graft

import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._

/** sqllogictest suites run through the GraftSql STATEMENT head — the
  * reference's own harness shape (CREATE/INSERT/DROP/UPDATE/... drive
  * the versioned table layer; SELECTs pass through to Catalyst with
  * the databend name surface + numbers() TVF rewrite active).
  */
class SqlSltSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = GraftSession(cpus = 8, appName = "graft-sqlslt-test")
    graft.functions.GraftFunctions.register(s)
    s
  }

  private val suiteDir = java.nio.file.Paths.get("src", "test", "resources", "slt_sql")
  private val suites: Seq[java.nio.file.Path] =
    java.nio.file.Files.list(suiteDir).iterator().asScala.toSeq
      .filter(_.toString.endsWith(".slt")).sortBy(_.toString)

  assert(suites.nonEmpty, s"no .slt suites under $suiteDir")

  for (path <- suites) {
    test(s"slt-sql ${path.getFileName}") {
      val base = java.nio.file.Paths.get("target", "tmp")
      java.nio.file.Files.createDirectories(base)
      val wh = java.nio.file.Files.createTempDirectory(base, "sqlslt").toString
      val g = GraftSql(spark, wh)
      val failures =
        try Slt.runWith(g.execute, path.getFileName.toString,
          java.nio.file.Files.readString(path))
        finally g.resetSessionSettings()
      assert(failures.isEmpty, failures.mkString("\n"))
    }
  }
}
