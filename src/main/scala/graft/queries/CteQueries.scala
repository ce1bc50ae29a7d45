package graft.queries

import graft.{Q, QueryModule, Tables}
import graft.operators.RecursiveCte
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import Exact._

/** CTEs (plain, nested, recursive) and PIVOT/UNPIVOT.
  * Reference: MaterializedCTE/RecursiveCteScan
  * (src/query/sql/src/planner/plans/operator.rs:151-178), pivot suites
  * (tests/sqllogictests/suites/query/pivot_unpivot-ish coverage).
  */
object CteQueries extends QueryModule {

  private def t(spark: SparkSession, dir: String) = Tables(spark, dir)

  // plain + nested CTEs through spark.sql (Catalyst inlines them)
  private val cte = Q(
    (spark, dir) => {
      val x = t(spark, dir)
      x.registerAll()
      spark.sql(
        """WITH big AS (
          |  SELECT o_custkey, count(*) AS n_big
          |  FROM orders WHERE o_totalprice > 200000.0 GROUP BY o_custkey),
          |seg AS (
          |  SELECT c_mktsegment, c_custkey FROM customer)
          |SELECT c_mktsegment, count(*) AS n_cust, CAST(sum(n_big) AS BIGINT) AS total_big
          |FROM seg JOIN big ON c_custkey = o_custkey
          |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)
    },
    Some("""WITH big AS (
      |  SELECT o_custkey, count(*) AS n_big
      |  FROM orders WHERE o_totalprice > 200000.0 GROUP BY o_custkey),
      |seg AS (
      |  SELECT c_mktsegment, c_custkey FROM customer)
      |SELECT c_mktsegment, count(*) AS n_cust, CAST(sum(n_big) AS BIGINT) AS total_big
      |FROM seg JOIN big ON c_custkey = o_custkey
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin))

  // recursive CTE: binary-tree walk over nation keys (parent = (k-1)/2),
  // computing depth and root-path length. Driver-side fixpoint loop.
  private val recursive = Q(
    (spark, dir) => {
      val x = t(spark, dir)
      val base = x.nation.filter(col("n_nationkey") === 0)
        .select(col("n_nationkey").as("k"), lit(0).as("depth"),
          col("n_nationkey").cast("long").as("path_sum"))
      val nations = x.nation.select(col("n_nationkey"))
      val result = RecursiveCte.run(base, frontier => {
        val f = frontier.select(col("k").as("pk"), col("depth"), col("path_sum"))
        nations
          .join(f, col("n_nationkey") =!= 0 && floor((col("n_nationkey") - 1) / 2) === col("pk"))
          .select(col("n_nationkey").as("k"), (col("depth") + 1).as("depth"),
            (col("path_sum") + col("n_nationkey")).as("path_sum"))
      })
      result.orderBy(col("k"))
    },
    Some("""WITH RECURSIVE walk(k, depth, path_sum) AS (
      |  SELECT n_nationkey, 0, CAST(n_nationkey AS BIGINT) FROM nation WHERE n_nationkey = 0
      |  UNION ALL
      |  SELECT n_nationkey, depth + 1, path_sum + n_nationkey
      |  FROM nation JOIN walk ON n_nationkey <> 0 AND CAST(floor((n_nationkey - 1) / 2) AS INT) = k)
      |SELECT CAST(k AS INT) AS k, CAST(depth AS INT) AS depth, path_sum
      |FROM walk ORDER BY k""".stripMargin))

  // PIVOT: order counts+revenue per status x priority
  private val pivot = Q(
    (spark, dir) => {
      val x = t(spark, dir)
      x.orders
        .groupBy(col("o_orderstatus"))
        .pivot("o_orderpriority", Seq("1-URGENT", "2-HIGH", "3-MEDIUM"))
        .agg(sum(cents(col("o_totalprice"))))
        .withColumnRenamed("1-URGENT", "urgent_c")
        .withColumnRenamed("2-HIGH", "high_c")
        .withColumnRenamed("3-MEDIUM", "medium_c")
        .orderBy(col("o_orderstatus"))
    },
    Some("""SELECT o_orderstatus,
      |  CAST(sum(CASE WHEN o_orderpriority = '1-URGENT' THEN CAST(round(o_totalprice * 100) AS BIGINT) END) AS BIGINT) AS urgent_c,
      |  CAST(sum(CASE WHEN o_orderpriority = '2-HIGH' THEN CAST(round(o_totalprice * 100) AS BIGINT) END) AS BIGINT) AS high_c,
      |  CAST(sum(CASE WHEN o_orderpriority = '3-MEDIUM' THEN CAST(round(o_totalprice * 100) AS BIGINT) END) AS BIGINT) AS medium_c
      |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin))

  // UNPIVOT via stack(): wide per-nation aggregates -> long (metric, value)
  private val unpivot = Q(
    (spark, dir) => {
      val x = t(spark, dir)
      val wide = x.customer.groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("n_cust"),
          sum(when(col("c_acctbal") > 5000.0, 1L).otherwise(0L)).as("n_rich"),
          sum(when(col("c_acctbal") < 0.0, 1L).otherwise(0L)).as("n_neg"))
      wide.select(col("c_nationkey"),
          expr("stack(3, 'n_cust', n_cust, 'n_rich', n_rich, 'n_neg', n_neg) AS (metric, value)"))
        .orderBy(col("c_nationkey"), col("metric"))
    },
    Some("""WITH wide AS (
      |  SELECT c_nationkey, count(*) AS n_cust,
      |    CAST(sum(CASE WHEN c_acctbal > 5000.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_rich,
      |    CAST(sum(CASE WHEN c_acctbal < 0.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_neg
      |  FROM customer GROUP BY c_nationkey)
      |SELECT c_nationkey, metric, value FROM (
      |  SELECT c_nationkey, 'n_cust' AS metric, n_cust AS value FROM wide
      |  UNION ALL SELECT c_nationkey, 'n_rich', n_rich FROM wide
      |  UNION ALL SELECT c_nationkey, 'n_neg', n_neg FROM wide) u
      |ORDER BY c_nationkey, metric""".stripMargin))

  override def queries: Seq[(String, Q)] = Seq(
    "cte_plain" -> cte,
    "cte_recursive" -> recursive,
    "pivot_status_priority" -> pivot,
    "unpivot_stack" -> unpivot)
}
