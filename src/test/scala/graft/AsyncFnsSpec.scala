package graft

import graft.operators.AsyncFns
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** Sequences (nextval) and dict_get — SURVEY §2.11 async functions. */
class AsyncFnsSpec extends AnyFunSuite {
  private lazy val spark = GraftSession(cpus = 8, appName = "graft-async-test")
  private def tmp(): String = {
    val base = Paths.get("target", "tmp")
    Files.createDirectories(base)
    Files.createTempDirectory(base, "seq").toString
  }

  test("nextval assigns unique ids above the high-water mark, persists") {
    import spark.implicits._
    val dir = tmp()
    val seq = AsyncFns.createSequence(dir, "order_id")

    val a = seq.nextval((1 to 100).toDF("x").repartition(8), "id")
    val idsA = a.select("id").as[Long].collect()
    assert(idsA.distinct.length == 100)          // unique
    assert(idsA.forall(_ >= 1))                  // above initial mark
    val hwm1 = seq.highWaterMark
    assert(hwm1 == idsA.max)

    val b = seq.nextval((1 to 50).toDF("x").repartition(4), "id")
    val idsB = b.select("id").as[Long].collect()
    assert(idsB.forall(_ > hwm1))                // strictly above prior mark
    assert((idsA.toSet & idsB.toSet).isEmpty)    // never reused

    // reopen by name: mark survives
    val reopened = AsyncFns.openSequence(dir, "order_id")
    assert(reopened.highWaterMark == idsB.max)
  }

  test("system_query_log records completed actions") {
    import graft.operators.QueryLog
    import spark.implicits._
    QueryLog.clear()
    QueryLog.register(spark)
    Seq(1, 2, 3).toDF("x").filter(col("x") > 1).count()
    Seq("a").toDF("s").collect()
    // listener delivery is async; poll briefly
    var tries = 0
    while (QueryLog.refreshView(spark).count() < 2 && tries < 50) {
      Thread.sleep(100); tries += 1
    }
    val log = spark.sql(
      "SELECT action, status, duration_ms FROM system_query_log WHERE status = 'ok'")
      .collect()
    assert(log.length >= 2, s"got ${log.length} entries")
    assert(log.forall(_.getDouble(2) >= 0.0))
    assert(log.map(_.getString(0)).exists(a => a == "count" || a == "collect"))
  }

  test("dict_get broadcast lookup with default on miss") {
    import spark.implicits._
    val facts = Seq((1, "a"), (2, "b"), (9, "z")).toDF("k", "payload")
    val dict = Seq((1, "one"), (2, "two")).toDF("k", "label")
    val out = AsyncFns.dictGet(facts, dict, "k", "label", lit("<unknown>"))
      .select("k", "label").as[(Int, String)].collect().toSet
    assert(out == Set((1, "one"), (2, "two"), (9, "<unknown>")))
    // plan must broadcast the dictionary
    val plan = AsyncFns.dictGet(facts, dict, "k", "label", lit("?"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"))
  }

  test("dict_get by registered dictionary name") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "dictsrc").toString
    Seq((1, "one"), (2, "two")).toDF("k", "label").write.mode("overwrite").parquet(dir)
    graft.operators.SystemTables.Dictionaries.create("numbers_en", dir, "k", "label")
    try {
      val facts = Seq((2, "b"), (5, "e")).toDF("k", "payload")
      val out = AsyncFns.dictGet(spark, facts, "numbers_en", lit("?"))
        .select("k", "label").as[(Int, String)].collect().toSet
      assert(out == Set((2, "two"), (5, "?")))
      intercept[IllegalArgumentException] {
        AsyncFns.dictGet(spark, facts, "no_such_dict", lit("?"))
      }
    } finally graft.operators.SystemTables.Dictionaries.drop("numbers_en")
  }
}
