package graft

import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._

/** sqllogictest suites run through the GraftSql STATEMENT head — the
  * reference's own harness shape (CREATE/INSERT/DROP/UPDATE/... drive
  * the versioned table layer; SELECTs pass through to Catalyst with
  * the databend name surface + numbers() TVF rewrite active).
  *
  * Sharded (round-14): the corpus grew to ~480 files and a single
  * sequential spec exceeded the verification driver's test window
  * (r13 `tests_ok: false`, run truncated mid-suite). Each shard class
  * takes every `nShards`-th file and runs as its own forked-JVM test
  * group (build.sbt `Test / testGrouping`), so shards execute
  * concurrently with fully isolated SparkSessions, warehouses and temp
  * dirs. Shard assignment is by sorted index, deterministic.
  */
abstract class SqlSltShard(shard: Int, nShards: Int) extends AnyFunSuite {
  private lazy val spark = {
    val s = GraftSession(cpus = 8, appName = s"graft-sqlslt-test-$shard")
    graft.functions.GraftFunctions.register(s)
    s
  }

  private val suiteDir = java.nio.file.Paths.get("src", "test", "resources", "slt_sql")
  private val suites: Seq[java.nio.file.Path] =
    java.nio.file.Files.list(suiteDir).iterator().asScala.toSeq
      .filter(_.toString.endsWith(".slt")).sortBy(_.toString)
      .zipWithIndex.collect { case (p, i) if i % nShards == shard => p }

  assert(suites.nonEmpty, s"no .slt suites under $suiteDir for shard $shard/$nShards")

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

class SqlSltSpec0 extends SqlSltShard(0, 8)
class SqlSltSpec1 extends SqlSltShard(1, 8)
class SqlSltSpec2 extends SqlSltShard(2, 8)
class SqlSltSpec3 extends SqlSltShard(3, 8)
class SqlSltSpec4 extends SqlSltShard(4, 8)
class SqlSltSpec5 extends SqlSltShard(5, 8)
class SqlSltSpec6 extends SqlSltShard(6, 8)
class SqlSltSpec7 extends SqlSltShard(7, 8)
