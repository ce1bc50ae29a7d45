package graft

import graft.operators.Skew
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Salted two-stage aggregation: equals direct aggregation, and
  * stage 1 actually spreads the hot key over multiple salt groups.
  */
class SkewSpec extends AnyFunSuite {
  private lazy val spark = GraftSession(cpus = 4, appName = "graft-skew-test")

  test("salted sum/count == direct, hot key spread over salts") {
    import spark.implicits._
    // 90% of rows share one hot key
    val rows = (1 to 10000).map { i =>
      (if (i % 10 != 0) "hot" else s"cold${i % 97}", i.toDouble)
    }
    val df = rows.toDF("k", "v").repartition(8)

    val direct = df.groupBy("k")
      .agg(sum("v").as("sum"), count(lit(1)).as("count"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    val salted = Skew.saltedSumCount(df, col("k"), col("v"), salts = 16)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    assert(salted == direct)

    // the hot key's stage-1 partials span many salt groups
    val spread = df.withColumn("__salt",
        pmod(spark_partition_id() + monotonically_increasing_id(), lit(16)))
      .filter(col("k") === "hot")
      .select("__salt").distinct().count()
    assert(spread >= 8, s"hot key only hit $spread salt groups")
  }

  test("salted join == plain join, inner and left") {
    import spark.implicits._
    // hot-keyed fact side, small dim missing some keys
    val fact = (1 to 20000).map { i =>
      (if (i % 20 != 0) 1L else (i % 7 + 2).toLong, i.toLong)
    }.toDF("k", "v").repartition(8)
    val dim = Seq((1L, "hot"), (2L, "a"), (3L, "b"), (5L, "c"))
      .toDF("dk", "name")

    def norm(df: org.apache.spark.sql.DataFrame) =
      df.select("k", "v", "name").collect()
        .map(r => (r.getLong(0), r.getLong(1), Option(r.getString(2)))).toSet

    val plainInner = norm(fact.join(dim, col("k") === col("dk"), "inner"))
    val saltedInner = norm(Skew.saltedJoin(fact, dim, col("k"), col("dk"), salts = 8))
    assert(saltedInner == plainInner)

    val plainLeft = norm(fact.join(dim, col("k") === col("dk"), "left"))
    val saltedLeft = norm(Skew.saltedJoin(fact, dim, col("k"), col("dk"),
      salts = 8, joinType = "left"))
    assert(saltedLeft == plainLeft)
    // left join kept the dim-missing keys
    assert(saltedLeft.exists(_._3.isEmpty))
  }
}
