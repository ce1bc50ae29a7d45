package graft.queries

import graft.{Q, QueryModule, Tables}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import Exact._

/** Set operations + sort/limit/offset (SURVEY.md §2.7-2.8). Reference:
  * UNION ALL plans/union_all.rs; INTERSECT/EXCEPT are bound to
  * semi/anti joins (binder/select.rs:554-566) — Spark's
  * intersect/except do the same rewrite in Catalyst.
  */
object SetOpQueries extends QueryModule {

  private def t(spark: SparkSession, dir: String) = Tables(spark, dir)

  private val unionAll = Q(
    (spark, dir) => {
      val x = t(spark, dir)
      val a = x.customer.select(col("c_nationkey").as("nk"), lit("cust").as("src"))
      val b = x.supplier.select(col("s_nationkey").as("nk"), lit("supp").as("src"))
      a.union(b).groupBy(col("nk"), col("src")).agg(count(lit(1)).as("n"))
        .orderBy(col("nk"), col("src"))
    },
    Some("""SELECT nk, src, count(*) AS n FROM (
      |  SELECT c_nationkey AS nk, 'cust' AS src FROM customer
      |  UNION ALL
      |  SELECT s_nationkey AS nk, 'supp' AS src FROM supplier) u
      |GROUP BY nk, src ORDER BY nk, src""".stripMargin))

  private val unionDistinct = Q(
    (spark, dir) => {
      val x = t(spark, dir)
      val a = x.customer.filter(col("c_acctbal") > 9900.0).select(col("c_nationkey").as("nk"))
      val b = x.supplier.filter(col("s_acctbal") > 9000.0).select(col("s_nationkey").as("nk"))
      a.union(b).distinct().orderBy(col("nk"))
    },
    Some("""SELECT c_nationkey AS nk FROM customer WHERE c_acctbal > 9900.0
      |UNION
      |SELECT s_nationkey FROM supplier WHERE s_acctbal > 9000.0
      |ORDER BY nk""".stripMargin))

  private val intersect = Q(
    (spark, dir) => {
      val x = t(spark, dir)
      val custNations = x.customer.filter(col("c_acctbal") > 9000.0).select(col("c_nationkey").as("nk"))
      val suppNations = x.supplier.filter(col("s_acctbal") > 5000.0).select(col("s_nationkey").as("nk"))
      custNations.intersect(suppNations).orderBy(col("nk"))
    },
    Some("""SELECT c_nationkey AS nk FROM customer WHERE c_acctbal > 9000.0
      |INTERSECT
      |SELECT s_nationkey FROM supplier WHERE s_acctbal > 5000.0
      |ORDER BY nk""".stripMargin))

  private val except = Q(
    (spark, dir) => {
      val x = t(spark, dir)
      val all = x.nation.select(col("n_nationkey").as("nk"))
      val withBig = x.customer.filter(col("c_acctbal") > 9900.0).select(col("c_nationkey").as("nk"))
      all.except(withBig).orderBy(col("nk"))
    },
    Some("""SELECT n_nationkey AS nk FROM nation
      |EXCEPT
      |SELECT c_nationkey FROM customer WHERE c_acctbal > 9900.0
      |ORDER BY nk""".stripMargin))

  private val intersectAll = Q(
    (spark, dir) => {
      val x = t(spark, dir)
      val a = x.orders.filter(col("o_orderstatus") === "O").select(col("o_custkey").as("ck"))
      val b = x.orders.filter(col("o_orderpriority") === "1-URGENT").select(col("o_custkey").as("ck"))
      a.intersectAll(b).groupBy(col("ck")).agg(count(lit(1)).as("n")).orderBy(col("ck"))
    },
    Some("""SELECT ck, count(*) AS n FROM (
      |  SELECT o_custkey AS ck FROM orders WHERE o_orderstatus = 'O'
      |  INTERSECT ALL
      |  SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT') t
      |GROUP BY ck ORDER BY ck""".stripMargin))

  private val exceptAll = Q(
    (spark, dir) => {
      val x = t(spark, dir)
      val a = x.orders.filter(col("o_orderstatus") === "O").select(col("o_custkey").as("ck"))
      val b = x.orders.filter(col("o_orderpriority") === "1-URGENT").select(col("o_custkey").as("ck"))
      a.exceptAll(b).groupBy(col("ck")).agg(count(lit(1)).as("n")).orderBy(col("ck"))
    },
    Some("""SELECT ck, count(*) AS n FROM (
      |  SELECT o_custkey AS ck FROM orders WHERE o_orderstatus = 'O'
      |  EXCEPT ALL
      |  SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT') t
      |GROUP BY ck ORDER BY ck""".stripMargin))

  // sort + limit + offset: Spark plans TakeOrderedAndProject (the
  // reference's fused TopN, plans/top_n.rs)
  private val sortLimitOffset = Q(
    (spark, dir) => {
      val x = t(spark, dir)
      x.orders
        .select(col("o_orderkey"), col("o_orderstatus"), cents(col("o_totalprice")).as("price_c"))
        .orderBy(col("price_c").desc, col("o_orderkey"))
        .offset(10).limit(20)
    },
    Some("""SELECT o_orderkey, o_orderstatus, CAST(round(o_totalprice * 100) AS BIGINT) AS price_c
      |FROM orders ORDER BY price_c DESC, o_orderkey
      |LIMIT 20 OFFSET 10""".stripMargin))

  // multi-key sort with explicit null ordering
  private val sortNulls = Q(
    (spark, dir) => {
      val x = t(spark, dir)
      x.orders.filter(col("o_orderkey") < 300)
        .select(col("o_orderkey"),
          nullif(col("o_orderstatus"), lit("P")).as("status_or_null"))
        .orderBy(col("status_or_null").asc_nulls_first, col("o_orderkey").desc)
    },
    Some("""SELECT o_orderkey, nullif(o_orderstatus, 'P') AS status_or_null
      |FROM orders WHERE o_orderkey < 300
      |ORDER BY status_or_null ASC NULLS FIRST, o_orderkey DESC""".stripMargin))

  override def queries: Seq[(String, Q)] = Seq(
    "set_union_all" -> unionAll,
    "set_union_distinct" -> unionDistinct,
    "set_intersect" -> intersect,
    "set_except" -> except,
    "set_intersect_all" -> intersectAll,
    "set_except_all" -> exceptAll,
    "sort_limit_offset" -> sortLimitOffset,
    "sort_nulls" -> sortNulls)
}
