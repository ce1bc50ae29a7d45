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
}
