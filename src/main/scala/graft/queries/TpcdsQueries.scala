package graft.queries

import graft.{Q, QueryModule}
import graft.sources.Tpcds

/** TPC-DS query ports (reference: tests/sqllogictests/suites/tpcds/Q1..
  * Q99 — 108 query suites). Each query runs the SAME SQL text in Spark
  * (over temp views of the generated parquet) and in the DuckDB oracle
  * (over read_parquet CTEs of the SAME files), so the check is a true
  * engine-vs-engine comparison on identical data.
  *
  * Determinism conventions (same as the TPC-H ports):
  *  - money aggregates go through exact integer cents:
  *    `sum(CAST(round(x * 100) AS BIGINT))`, aliased `*_c` — double
  *    sums are order-dependent across engines, integer sums are not;
  *  - money averages divide an exact cents-average: `round(avg(CAST(
  *    round(x*100) AS BIGINT)) / 100.0, 6)`;
  *  - unnamed aggregate columns get explicit aliases on both sides
  *    (the driver compares columns by name);
  *  - ORDER BY ... LIMIT keys are checked to be unique so the cut is
  *    deterministic across engines.
  */
object TpcdsQueries extends QueryModule {

  /** shared SQL -> (Spark run over views, DuckDB oracle over the same
    * parquet via CTE prologue). Verify always runs at sf0.01, so the
    * oracle prologue pins that dataset.
    */
  private def q(sql: String, headline: Boolean = false): Q = Q(
    (spark, dir) => { Tpcds.ensure(spark, dir); spark.sql(sql) },
    Some(oracleOf(sql)),
    headline)

  private def oracleOf(sql: String): String = {
    val base = Tpcds.dataDir("/root/testdata/sf0.01")
    val used = Tpcds.tableNames.filter(t => ("(?i)\\b" + t + "\\b").r.findFirstIn(sql).isDefined)
    val ctes = used.map(t => s"$t AS (SELECT * FROM read_parquet('$base/$t/*.parquet'))")
      .mkString(", ")
    val trimmed = sql.trim
    if (trimmed.length >= 4 && trimmed.substring(0, 4).equalsIgnoreCase("WITH"))
      "WITH " + ctes + ", " + trimmed.substring(4)
    else
      "WITH " + ctes + " " + trimmed
  }

  // ---- Q3: brand revenue by year for one manufacturer -----------------
  private val q3 = q("""
    SELECT dt.d_year,
           item.i_brand_id brand_id,
           item.i_brand brand,
           CAST(sum(CAST(round(ss_ext_sales_price * 100) AS BIGINT)) AS BIGINT) sum_agg_c
    FROM date_dim dt, store_sales, item
    WHERE dt.d_date_sk = store_sales.ss_sold_date_sk
      AND store_sales.ss_item_sk = item.i_item_sk
      AND item.i_manufact_id = 128
      AND dt.d_moy = 11
    GROUP BY dt.d_year, item.i_brand, item.i_brand_id
    ORDER BY dt.d_year, sum_agg_c DESC, brand_id
    LIMIT 100""", headline = true)

  // ---- Q42: category revenue, one month -------------------------------
  private val q42 = q("""
    SELECT dt.d_year,
           item.i_category_id,
           item.i_category,
           CAST(sum(CAST(round(ss_ext_sales_price * 100) AS BIGINT)) AS BIGINT) sum_sales_c
    FROM date_dim dt, store_sales, item
    WHERE dt.d_date_sk = store_sales.ss_sold_date_sk
      AND store_sales.ss_item_sk = item.i_item_sk
      AND item.i_manager_id = 1
      AND dt.d_moy = 11
      AND dt.d_year = 2000
    GROUP BY dt.d_year, item.i_category_id, item.i_category
    ORDER BY sum_sales_c DESC, dt.d_year, item.i_category_id, item.i_category
    LIMIT 100""")

  // ---- Q52: brand revenue, one month ----------------------------------
  private val q52 = q("""
    SELECT dt.d_year,
           item.i_brand_id brand_id,
           item.i_brand brand,
           CAST(sum(CAST(round(ss_ext_sales_price * 100) AS BIGINT)) AS BIGINT) ext_price_c
    FROM date_dim dt, store_sales, item
    WHERE dt.d_date_sk = store_sales.ss_sold_date_sk
      AND store_sales.ss_item_sk = item.i_item_sk
      AND item.i_manager_id = 1
      AND dt.d_moy = 11
      AND dt.d_year = 2000
    GROUP BY dt.d_year, item.i_brand, item.i_brand_id
    ORDER BY dt.d_year, ext_price_c DESC, brand_id
    LIMIT 100""")

  // ---- Q55: brand revenue for one manager-month -----------------------
  private val q55 = q("""
    SELECT i_brand_id brand_id,
           i_brand brand,
           CAST(sum(CAST(round(ss_ext_sales_price * 100) AS BIGINT)) AS BIGINT) ext_price_c
    FROM date_dim, store_sales, item
    WHERE d_date_sk = ss_sold_date_sk
      AND ss_item_sk = i_item_sk
      AND i_manager_id = 28
      AND d_moy = 11
      AND d_year = 1999
    GROUP BY i_brand, i_brand_id
    ORDER BY ext_price_c DESC, i_brand_id
    LIMIT 100""")

  // ---- Q7: demographic item averages ----------------------------------
  private val q7 = q("""
    SELECT i_item_id,
           round(avg(ss_quantity), 6) agg1,
           round(avg(CAST(round(ss_list_price * 100) AS BIGINT)) / 100.0, 6) agg2,
           round(avg(CAST(round(ss_coupon_amt * 100) AS BIGINT)) / 100.0, 6) agg3,
           round(avg(CAST(round(ss_sales_price * 100) AS BIGINT)) / 100.0, 6) agg4
    FROM store_sales, customer_demographics, date_dim, item, promotion
    WHERE ss_sold_date_sk = d_date_sk
      AND ss_item_sk = i_item_sk
      AND ss_cdemo_sk = cd_demo_sk
      AND ss_promo_sk = p_promo_sk
      AND cd_gender = 'M'
      AND cd_marital_status = 'S'
      AND cd_education_status = 'College'
      AND (p_channel_email = 'N' OR p_channel_event = 'N')
      AND d_year = 2000
    GROUP BY i_item_id
    ORDER BY i_item_id
    LIMIT 100""", headline = true)

  // ---- Q26: same shape over catalog_sales -----------------------------
  private val q26 = q("""
    SELECT i_item_id,
           round(avg(cs_quantity), 6) agg1,
           round(avg(CAST(round(cs_list_price * 100) AS BIGINT)) / 100.0, 6) agg2,
           round(avg(CAST(round(cs_coupon_amt * 100) AS BIGINT)) / 100.0, 6) agg3,
           round(avg(CAST(round(cs_sales_price * 100) AS BIGINT)) / 100.0, 6) agg4
    FROM catalog_sales, customer_demographics, date_dim, item, promotion
    WHERE cs_sold_date_sk = d_date_sk
      AND cs_item_sk = i_item_sk
      AND cs_bill_cdemo_sk = cd_demo_sk
      AND cs_promo_sk = p_promo_sk
      AND cd_gender = 'M'
      AND cd_marital_status = 'S'
      AND cd_education_status = 'College'
      AND (p_channel_email = 'N' OR p_channel_event = 'N')
      AND d_year = 2000
    GROUP BY i_item_id
    ORDER BY i_item_id
    LIMIT 100""")

  // ---- Q19: brand revenue where customer zip != store zip -------------
  private val q19 = q("""
    SELECT i_brand_id brand_id,
           i_brand brand,
           i_manufact_id,
           i_manufact,
           CAST(sum(CAST(round(ss_ext_sales_price * 100) AS BIGINT)) AS BIGINT) ext_price_c
    FROM date_dim, store_sales, item, customer, customer_address, store
    WHERE d_date_sk = ss_sold_date_sk
      AND ss_item_sk = i_item_sk
      AND i_manager_id = 8
      AND d_moy = 11
      AND d_year = 1998
      AND ss_customer_sk = c_customer_sk
      AND c_current_addr_sk = ca_address_sk
      AND SUBSTRING(ca_zip, 1, 5) <> SUBSTRING(s_zip, 1, 5)
      AND ss_store_sk = s_store_sk
    GROUP BY i_brand, i_brand_id, i_manufact_id, i_manufact
    ORDER BY ext_price_c DESC, i_brand, i_brand_id, i_manufact_id, i_manufact
    LIMIT 100""")

  // ---- Q13: OR-of-ANDs demographic/address bands ----------------------
  private val q13 = q("""
    SELECT round(avg(ss_quantity), 6) avg1,
           round(avg(CAST(round(ss_ext_sales_price * 100) AS BIGINT)) / 100.0, 6) avg2,
           round(avg(CAST(round(ss_ext_wholesale_cost * 100) AS BIGINT)) / 100.0, 6) avg3,
           CAST(sum(CAST(round(ss_ext_wholesale_cost * 100) AS BIGINT)) AS BIGINT) sum_wc_c
    FROM store_sales, store, customer_demographics, household_demographics,
         customer_address, date_dim
    WHERE s_store_sk = ss_store_sk
      AND ss_sold_date_sk = d_date_sk
      AND d_year = 2001
      AND ((ss_hdemo_sk = hd_demo_sk
            AND cd_demo_sk = ss_cdemo_sk
            AND cd_marital_status = 'M'
            AND cd_education_status = 'Advanced Degree'
            AND ss_sales_price BETWEEN 100.00 AND 150.00
            AND hd_dep_count = 3)
           OR (ss_hdemo_sk = hd_demo_sk
               AND cd_demo_sk = ss_cdemo_sk
               AND cd_marital_status = 'S'
               AND cd_education_status = 'College'
               AND ss_sales_price BETWEEN 50.00 AND 100.00
               AND hd_dep_count = 1)
           OR (ss_hdemo_sk = hd_demo_sk
               AND cd_demo_sk = ss_cdemo_sk
               AND cd_marital_status = 'W'
               AND cd_education_status = '2 yr Degree'
               AND ss_sales_price BETWEEN 150.00 AND 200.00
               AND hd_dep_count = 1))
      AND ((ss_addr_sk = ca_address_sk
            AND ca_country = 'United States'
            AND ca_state IN ('TX', 'OH', 'TX')
            AND ss_net_profit BETWEEN 100 AND 200)
           OR (ss_addr_sk = ca_address_sk
               AND ca_country = 'United States'
               AND ca_state IN ('OR', 'NM', 'KY')
               AND ss_net_profit BETWEEN 150 AND 300)
           OR (ss_addr_sk = ca_address_sk
               AND ca_country = 'United States'
               AND ca_state IN ('VA', 'TX', 'MS')
               AND ss_net_profit BETWEEN 50 AND 250))""", headline = true)

  // ---- Q43: store sales pivoted by weekday ----------------------------
  private val q43 = q("""
    SELECT s_store_name,
           s_store_id,
           CAST(sum(CAST(round(CASE WHEN (d_day_name = 'Sunday') THEN ss_sales_price ELSE NULL END * 100) AS BIGINT)) AS BIGINT) sun_sales_c,
           CAST(sum(CAST(round(CASE WHEN (d_day_name = 'Monday') THEN ss_sales_price ELSE NULL END * 100) AS BIGINT)) AS BIGINT) mon_sales_c,
           CAST(sum(CAST(round(CASE WHEN (d_day_name = 'Tuesday') THEN ss_sales_price ELSE NULL END * 100) AS BIGINT)) AS BIGINT) tue_sales_c,
           CAST(sum(CAST(round(CASE WHEN (d_day_name = 'Wednesday') THEN ss_sales_price ELSE NULL END * 100) AS BIGINT)) AS BIGINT) wed_sales_c,
           CAST(sum(CAST(round(CASE WHEN (d_day_name = 'Thursday') THEN ss_sales_price ELSE NULL END * 100) AS BIGINT)) AS BIGINT) thu_sales_c,
           CAST(sum(CAST(round(CASE WHEN (d_day_name = 'Friday') THEN ss_sales_price ELSE NULL END * 100) AS BIGINT)) AS BIGINT) fri_sales_c,
           CAST(sum(CAST(round(CASE WHEN (d_day_name = 'Saturday') THEN ss_sales_price ELSE NULL END * 100) AS BIGINT)) AS BIGINT) sat_sales_c
    FROM date_dim, store_sales, store
    WHERE d_date_sk = ss_sold_date_sk
      AND s_store_sk = ss_store_sk
      AND s_gmt_offset = -5
      AND d_year = 2000
    GROUP BY s_store_name, s_store_id
    ORDER BY s_store_name, s_store_id, sun_sales_c, mon_sales_c, tue_sales_c,
             wed_sales_c, thu_sales_c, fri_sales_c, sat_sales_c
    LIMIT 100""")

  // ---- Q73: basket-size counts per customer ---------------------------
  private val q73 = q("""
    SELECT c_last_name,
           c_first_name,
           c_salutation,
           c_preferred_cust_flag,
           ss_ticket_number,
           cnt
    FROM
      (SELECT ss_ticket_number, ss_customer_sk, count(*) cnt
       FROM store_sales, date_dim, store, household_demographics
       WHERE store_sales.ss_sold_date_sk = date_dim.d_date_sk
         AND store_sales.ss_store_sk = store.s_store_sk
         AND store_sales.ss_hdemo_sk = household_demographics.hd_demo_sk
         AND date_dim.d_dom BETWEEN 1 AND 2
         AND (household_demographics.hd_buy_potential = 'Unknown'
              OR household_demographics.hd_buy_potential = '>10000')
         AND household_demographics.hd_vehicle_count > 0
         AND CASE WHEN household_demographics.hd_vehicle_count > 0
                  THEN (household_demographics.hd_dep_count * 1.0) / household_demographics.hd_vehicle_count
                  ELSE NULL END > 1
         AND date_dim.d_year IN (1999, 1999+1, 1999+2)
         AND store.s_county IN ('Orange County', 'Bronx County',
                                'Franklin Parish', 'Williamson County')
       GROUP BY ss_ticket_number, ss_customer_sk) dj,
         customer
    WHERE ss_customer_sk = c_customer_sk
      AND cnt BETWEEN 1 AND 5
    ORDER BY cnt DESC, c_last_name ASC""")

  // ---- Q79: per-ticket coupon/profit for demographic slice ------------
  private val q79 = q("""
    SELECT c_last_name,
           c_first_name,
           SUBSTRING(s_city, 1, 30) city30,
           ss_ticket_number,
           amt_c,
           profit_c
    FROM
      (SELECT ss_ticket_number,
              ss_customer_sk,
              store.s_city,
              CAST(sum(CAST(round(ss_coupon_amt * 100) AS BIGINT)) AS BIGINT) amt_c,
              CAST(sum(CAST(round(ss_net_profit * 100) AS BIGINT)) AS BIGINT) profit_c
       FROM store_sales, date_dim, store, household_demographics
       WHERE store_sales.ss_sold_date_sk = date_dim.d_date_sk
         AND store_sales.ss_store_sk = store.s_store_sk
         AND store_sales.ss_hdemo_sk = household_demographics.hd_demo_sk
         AND (household_demographics.hd_dep_count = 6
              OR household_demographics.hd_vehicle_count > 2)
         AND date_dim.d_dow = 1
         AND date_dim.d_year IN (1999, 1999+1, 1999+2)
         AND store.s_number_employees BETWEEN 200 AND 295
       GROUP BY ss_ticket_number, ss_customer_sk, ss_addr_sk, store.s_city) ms,
         customer
    WHERE ss_customer_sk = c_customer_sk
    ORDER BY c_last_name NULLS FIRST, c_first_name NULLS FIRST,
             SUBSTRING(s_city, 1, 30) NULLS FIRST, profit_c NULLS FIRST,
             ss_ticket_number
    LIMIT 100""", headline = true)

  // ---- Q96: count of a time/demographic/store slice -------------------
  private val q96 = q("""
    SELECT count(*) cnt
    FROM store_sales, household_demographics, time_dim, store
    WHERE ss_sold_time_sk = time_dim.t_time_sk
      AND ss_hdemo_sk = household_demographics.hd_demo_sk
      AND ss_store_sk = s_store_sk
      AND time_dim.t_hour = 20
      AND time_dim.t_minute >= 30
      AND household_demographics.hd_dep_count = 7
      AND store.s_store_name = 'ese'
    ORDER BY cnt
    LIMIT 100""")

  // ---- Q68: two-city baskets where bought city != home city -----------
  private val q68 = q("""
    SELECT c_last_name,
           c_first_name,
           ca_city,
           bought_city,
           ss_ticket_number,
           extended_price_c,
           extended_tax_c,
           list_price_c
    FROM
      (SELECT ss_ticket_number,
              ss_customer_sk,
              ca_city bought_city,
              CAST(sum(CAST(round(ss_ext_sales_price * 100) AS BIGINT)) AS BIGINT) extended_price_c,
              CAST(sum(CAST(round(ss_ext_list_price * 100) AS BIGINT)) AS BIGINT) list_price_c,
              CAST(sum(CAST(round(ss_ext_tax * 100) AS BIGINT)) AS BIGINT) extended_tax_c
       FROM store_sales, date_dim, store, household_demographics, customer_address
       WHERE store_sales.ss_sold_date_sk = date_dim.d_date_sk
         AND store_sales.ss_store_sk = store.s_store_sk
         AND store_sales.ss_hdemo_sk = household_demographics.hd_demo_sk
         AND store_sales.ss_addr_sk = customer_address.ca_address_sk
         AND date_dim.d_dom BETWEEN 1 AND 2
         AND (household_demographics.hd_dep_count = 4
              OR household_demographics.hd_vehicle_count = 3)
         AND date_dim.d_year IN (1999, 1999+1, 1999+2)
         AND store.s_city IN ('Fairview', 'Midway')
       GROUP BY ss_ticket_number, ss_customer_sk, ss_addr_sk, ca_city) dn,
         customer,
         customer_address current_addr
    WHERE ss_customer_sk = c_customer_sk
      AND customer.c_current_addr_sk = current_addr.ca_address_sk
      AND current_addr.ca_city <> bought_city
    ORDER BY c_last_name NULLS FIRST, ss_ticket_number NULLS FIRST
    LIMIT 100""")

  override def queries: Seq[(String, Q)] = Seq(
    "tpcds_q3" -> q3,
    "tpcds_q7" -> q7,
    "tpcds_q13" -> q13,
    "tpcds_q19" -> q19,
    "tpcds_q26" -> q26,
    "tpcds_q42" -> q42,
    "tpcds_q43" -> q43,
    "tpcds_q52" -> q52,
    "tpcds_q55" -> q55,
    "tpcds_q68" -> q68,
    "tpcds_q73" -> q73,
    "tpcds_q79" -> q79,
    "tpcds_q96" -> q96)
}
