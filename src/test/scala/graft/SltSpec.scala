package graft

import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._

/** Runs every sqllogictest-format suite in src/test/resources/slt/
  * over spark.sql with the sf0.001 tables registered and the databend
  * function surface active (mirrors the reference's primary harness —
  * tests/sqllogictests/).
  */
class SltSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = GraftSession(cpus = 8, appName = "graft-slt-test")
    graft.functions.GraftFunctions.register(s)
    Tables(s, "/root/testdata/sf0.001").registerAll()
    s
  }

  private val suiteDir = java.nio.file.Paths.get("src", "test", "resources", "slt")
  private val suites: Seq[java.nio.file.Path] =
    java.nio.file.Files.list(suiteDir).iterator().asScala.toSeq
      .filter(_.toString.endsWith(".slt")).sortBy(_.toString)

  assert(suites.nonEmpty, s"no .slt suites under $suiteDir")

  for (path <- suites) {
    test(s"slt ${path.getFileName}") {
      val failures = Slt.run(spark, path.getFileName.toString,
        java.nio.file.Files.readString(path))
      assert(failures.isEmpty, failures.mkString("\n"))
    }
  }
}
