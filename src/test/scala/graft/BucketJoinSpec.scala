package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketing = the pre-shuffled table layout (reference CLUSTER BY +
  * hash distribution): two tables bucketed on the join key join with
  * ZERO exchanges — the decisive technique when two 100 TB fact tables
  * must join repeatedly.
  */
class BucketJoinSpec extends AnyFunSuite {
  private lazy val spark = GraftSession(cpus = 8, appName = "graft-bucket-test")
  private val sf = "/root/testdata/sf0.01"

  test("bucketed fact-fact join plans without a shuffle") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_orderkey", "l_quantity", "l_extendedprice")
    val ord = spark.read.parquet(s"$sf/orders.parquet")
      .select("o_orderkey", "o_totalprice")

    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("li_bucketed")
    ord.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("ord_bucketed")

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("li_bucketed")
        .join(spark.table("ord_bucketed"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_orderkey"))
        .agg(sum(col("l_quantity")).as("q"), first(col("o_totalprice")).as("p"))

      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$plan")

      // same join over plain parquet DOES shuffle — the layout is the win
      val unbucketed = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_orderkey"))
        .agg(sum(col("l_quantity")).as("q"), first(col("o_totalprice")).as("p"))
      assert(unbucketed.queryExecution.executedPlan.toString
        .contains("Exchange hashpartitioning"))

      // and results agree
      assert(joined.count() == unbucketed.count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    }
  }
}
