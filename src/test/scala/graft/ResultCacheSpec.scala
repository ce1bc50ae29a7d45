package graft

import graft.operators.ResultCache
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** Result cache keyed by plan + input files (SURVEY §4.2). */
class ResultCacheSpec extends AnyFunSuite {
  private lazy val spark = GraftSession(cpus = 8, appName = "graft-rescache-test")

  private def tmp(): String = {
    val base = Paths.get("target", "tmp")
    Files.createDirectories(base)
    Files.createTempDirectory(base, "rescache").toString
  }

  test("same plan over unchanged files hits; data change misses") {
    import spark.implicits._
    ResultCache.invalidateAll()
    val dir = tmp()
    (1 to 100).toDF("x").write.mode("overwrite").parquet(dir)

    def q() = spark.read.parquet(dir).agg(sum(col("x")).as("s"))

    val a = ResultCache.cached(q())
    assert(a.head().getLong(0) == 5050L)
    assert(ResultCache.size == 1)

    // identical query, new DataFrame object -> same entry (no growth)
    val b = ResultCache.cached(q())
    assert(ResultCache.size == 1)
    assert(b eq a) // the pinned result itself is reused

    // different plan -> new entry
    ResultCache.cached(spark.read.parquet(dir).agg(count(lit(1)).as("n")))
    assert(ResultCache.size == 2)

    // data changes (append) -> file list changes -> miss, fresh result
    (101 to 110).toDF("x").write.mode("append").parquet(dir)
    val c = ResultCache.cached(q())
    assert(c.head().getLong(0) == 5050L + (101 to 110).sum)
    assert(ResultCache.size == 3)
  }
}
