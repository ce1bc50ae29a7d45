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

  /** Split a top-level `WITH a AS (...), b AS (...) <main>` SQL text
    * into its CTE definitions and the main query. Single-quoted string
    * literals are skipped when balancing parentheses.
    */
  private[queries] def splitWith(sql: String): (Seq[(String, String)], String) = {
    val s = sql.trim
    require(s.length >= 4 && s.substring(0, 4).equalsIgnoreCase("WITH"), "not a WITH query")
    var i = 4
    def skipWs(): Unit = while (i < s.length && s(i).isWhitespace) i += 1
    val ctes = scala.collection.mutable.ArrayBuffer[(String, String)]()
    var more = true
    while (more) {
      skipWs()
      val start = i
      while (i < s.length && (s(i).isLetterOrDigit || s(i) == '_')) i += 1
      val name = s.substring(start, i)
      skipWs()
      require(s.regionMatches(true, i, "AS", 0, 2), s"expected AS after CTE name $name")
      i += 2
      skipWs()
      require(s(i) == '(', s"expected ( after $name AS")
      i += 1
      val bodyStart = i
      var depth = 1
      while (depth > 0) {
        s(i) match {
          case '\'' => i += 1; while (s(i) != '\'') i += 1
          case '('  => depth += 1
          case ')'  => depth -= 1
          case _    => ()
        }
        i += 1
      }
      ctes += name -> s.substring(bodyStart, i - 1)
      skipWs()
      if (i < s.length && s(i) == ',') i += 1 else more = false
    }
    (ctes.toSeq, s.substring(i))
  }

  /** Like q(), but materializes the top-level CTEs as temp views and
    * persists the named ones (MEMORY_AND_DISK), so the self-joined
    * year-over-year family computes its shared CTE ONCE instead of
    * re-reading and re-shuffling the base tables per reference —
    * Catalyst, like the reference's binder, inlines `WITH` (round-5
    * audit: q75's executed plan had 24 parquet scans, q4 had 18, zero
    * ReusedExchange). At 100x scale each extra CTE reference is a full
    * re-read of three sales channels, so the persist is the difference
    * between O(refs) and O(1) base-table passes. The DuckDB oracle runs
    * the UNCHANGED original SQL text. The views stay registered after
    * the call (catalog.dropTempView would also UNCACHE the plan);
    * that is safe because execution is sequential and a later query
    * using the same name as a CTE shadows the temp view. Bench clears
    * the cacheManager between samples so each sample pays the true
    * materialization cost.
    */
  private def qPersist(sql: String, persist: Set[String], headline: Boolean = false): Q = Q(
    (spark, dir) => {
      Tpcds.ensure(spark, dir)
      val (ctes, main) = splitWith(sql)
      // A/B switch (round-13): with AQE exchange reuse the persist's
      // value is in question (q14's was measured pure overhead); this
      // flag lets a bench run compare both arms on identical code
      val noPersist = sys.env.get("SPARK_GRAFT_NO_PERSIST").contains("1")
      for ((name, body) <- ctes) {
        val df = spark.sql(body)
        val out = if (!noPersist && persist(name))
          df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        else df
        out.createOrReplaceTempView(name)
      }
      spark.sql(main) // resolves the views into the plan now
    },
    Some(oracleOf(sql)),
    headline)

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
    LIMIT 100""")

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
    LIMIT 100""")

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

  // ---- Q6: states where customers buy pricier-than-category items -----
  // (two scalar/correlated subqueries: month_seq lookup + per-category avg)
  private val q6 = q("""
    SELECT a.ca_state state,
           count(*) cnt
    FROM customer_address a, customer c, store_sales s, date_dim d, item i
    WHERE a.ca_address_sk = c.c_current_addr_sk
      AND c.c_customer_sk = s.ss_customer_sk
      AND s.ss_sold_date_sk = d.d_date_sk
      AND s.ss_item_sk = i.i_item_sk
      AND d.d_month_seq =
        (SELECT DISTINCT (d_month_seq)
         FROM date_dim
         WHERE d_year = 2001 AND d_moy = 1)
      AND i.i_current_price > 1.2 *
        (SELECT avg(j.i_current_price)
         FROM item j
         WHERE j.i_category = i.i_category)
    GROUP BY a.ca_state
    HAVING count(*) >= 10
    ORDER BY cnt NULLS FIRST, a.ca_state NULLS FIRST
    LIMIT 100""")

  // ---- Q15: catalog sales by zip for a quarter ------------------------
  private val q15 = q("""
    SELECT ca_zip,
           CAST(sum(CAST(round(cs_sales_price * 100) AS BIGINT)) AS BIGINT) sum_sales_c
    FROM catalog_sales, customer, customer_address, date_dim
    WHERE cs_bill_customer_sk = c_customer_sk
      AND c_current_addr_sk = ca_address_sk
      AND (SUBSTRING(ca_zip, 1, 5) IN ('85669', '86197', '88274', '83405',
                                       '86475', '85392', '85460', '80348', '81792')
           OR ca_state IN ('CA', 'WA', 'GA')
           OR cs_sales_price > 500)
      AND cs_sold_date_sk = d_date_sk
      AND d_qoy = 2
      AND d_year = 2001
    GROUP BY ca_zip
    ORDER BY ca_zip NULLS FIRST
    LIMIT 100""")

  // ---- Q37: items in inventory band also sold via catalog -------------
  private val q37 = q("""
    SELECT i_item_id,
           i_item_desc,
           i_current_price
    FROM item, inventory, date_dim, catalog_sales
    WHERE i_current_price BETWEEN 68 AND 68 + 30
      AND inv_item_sk = i_item_sk
      AND d_date_sk = inv_date_sk
      AND d_date BETWEEN cast('2000-02-01' AS date) AND cast('2000-04-01' AS date)
      AND i_manufact_id IN (677, 940, 694, 808)
      AND inv_quantity_on_hand BETWEEN 100 AND 500
      AND cs_item_sk = i_item_sk
    GROUP BY i_item_id, i_item_desc, i_current_price
    ORDER BY i_item_id
    LIMIT 100""")

  // ---- Q93: actual sales net of returns for one return reason ---------
  private val q93 = q("""
    SELECT ss_customer_sk,
           CAST(sum(CAST(round(act_sales * 100) AS BIGINT)) AS BIGINT) sumsales_c
    FROM
      (SELECT ss_item_sk,
              ss_ticket_number,
              ss_customer_sk,
              CASE WHEN sr_return_quantity IS NOT NULL
                   THEN (ss_quantity - sr_return_quantity) * ss_sales_price
                   ELSE (ss_quantity * ss_sales_price)
              END act_sales
       FROM store_sales
       LEFT OUTER JOIN store_returns ON (sr_item_sk = ss_item_sk
                                         AND sr_ticket_number = ss_ticket_number),
            reason
       WHERE sr_reason_sk = r_reason_sk
         AND r_reason_desc = 'reason 28') t
    GROUP BY ss_customer_sk
    ORDER BY sumsales_c NULLS FIRST, ss_customer_sk NULLS FIRST
    LIMIT 100""")

  // ---- Q62: web shipping-latency buckets ------------------------------
  private val q62 = q("""
    SELECT w_substr,
           sm_type,
           web_name,
           CAST(sum(CASE WHEN (ws_ship_date_sk - ws_sold_date_sk <= 30) THEN 1 ELSE 0 END) AS BIGINT) AS d30,
           CAST(sum(CASE WHEN (ws_ship_date_sk - ws_sold_date_sk > 30)
                          AND (ws_ship_date_sk - ws_sold_date_sk <= 60) THEN 1 ELSE 0 END) AS BIGINT) AS d31_60,
           CAST(sum(CASE WHEN (ws_ship_date_sk - ws_sold_date_sk > 60)
                          AND (ws_ship_date_sk - ws_sold_date_sk <= 90) THEN 1 ELSE 0 END) AS BIGINT) AS d61_90,
           CAST(sum(CASE WHEN (ws_ship_date_sk - ws_sold_date_sk > 90)
                          AND (ws_ship_date_sk - ws_sold_date_sk <= 120) THEN 1 ELSE 0 END) AS BIGINT) AS d91_120,
           CAST(sum(CASE WHEN (ws_ship_date_sk - ws_sold_date_sk > 120) THEN 1 ELSE 0 END) AS BIGINT) AS d120_plus
    FROM web_sales,
      (SELECT SUBSTRING(w_warehouse_name, 1, 20) w_substr, * FROM warehouse) sq1,
         ship_mode, web_site, date_dim
    WHERE d_month_seq BETWEEN 1200 AND 1200 + 11
      AND ws_ship_date_sk = d_date_sk
      AND ws_warehouse_sk = w_warehouse_sk
      AND ws_ship_mode_sk = sm_ship_mode_sk
      AND ws_web_site_sk = web_site_sk
    GROUP BY w_substr, sm_type, web_name
    ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST
    LIMIT 100""")

  // ---- Q99: catalog shipping-latency buckets --------------------------
  private val q99 = q("""
    SELECT w_substr,
           sm_type,
           LOWER(cc_name) cc_name_lower,
           CAST(sum(CASE WHEN (cs_ship_date_sk - cs_sold_date_sk <= 30) THEN 1 ELSE 0 END) AS BIGINT) AS d30,
           CAST(sum(CASE WHEN (cs_ship_date_sk - cs_sold_date_sk > 30)
                          AND (cs_ship_date_sk - cs_sold_date_sk <= 60) THEN 1 ELSE 0 END) AS BIGINT) AS d31_60,
           CAST(sum(CASE WHEN (cs_ship_date_sk - cs_sold_date_sk > 60)
                          AND (cs_ship_date_sk - cs_sold_date_sk <= 90) THEN 1 ELSE 0 END) AS BIGINT) AS d61_90,
           CAST(sum(CASE WHEN (cs_ship_date_sk - cs_sold_date_sk > 90)
                          AND (cs_ship_date_sk - cs_sold_date_sk <= 120) THEN 1 ELSE 0 END) AS BIGINT) AS d91_120,
           CAST(sum(CASE WHEN (cs_ship_date_sk - cs_sold_date_sk > 120) THEN 1 ELSE 0 END) AS BIGINT) AS d120_plus
    FROM catalog_sales,
      (SELECT SUBSTRING(w_warehouse_name, 1, 20) w_substr, * FROM warehouse) AS sq1,
         ship_mode, call_center, date_dim
    WHERE d_month_seq BETWEEN 1200 AND 1200 + 11
      AND cs_ship_date_sk = d_date_sk
      AND cs_warehouse_sk = w_warehouse_sk
      AND cs_ship_mode_sk = sm_ship_mode_sk
      AND cs_call_center_sk = cc_call_center_sk
    GROUP BY w_substr, sm_type, cc_name
    ORDER BY w_substr NULLS FIRST, sm_type NULLS FIRST, cc_name_lower NULLS FIRST
    LIMIT 100""")

  // ---- Q12/Q20/Q98: revenue ratio within class (window over agg) ------
  private def revenueRatio(fact: String, pfx: String, limit: String): Q = q(s"""
    SELECT i_item_id,
           i_item_desc,
           i_category,
           i_class,
           i_current_price,
           CAST(sum(CAST(round(${pfx}_ext_sales_price * 100) AS BIGINT)) AS BIGINT) AS itemrevenue_c,
           round(CAST(sum(CAST(round(${pfx}_ext_sales_price * 100) AS BIGINT)) AS DOUBLE) * 100.0
             / CAST(sum(sum(CAST(round(${pfx}_ext_sales_price * 100) AS BIGINT))) OVER (PARTITION BY i_class) AS DOUBLE), 6) AS revenueratio
    FROM $fact, item, date_dim
    WHERE ${pfx}_item_sk = i_item_sk
      AND i_category IN ('Sports', 'Books', 'Home')
      AND ${pfx}_sold_date_sk = d_date_sk
      AND d_date BETWEEN cast('1999-02-22' AS date) AND cast('1999-03-24' AS date)
    GROUP BY i_item_id, i_item_desc, i_category, i_class, i_current_price
    ORDER BY i_category NULLS FIRST, i_class NULLS FIRST, i_item_id NULLS FIRST,
             i_item_desc NULLS FIRST, revenueratio NULLS FIRST
    $limit""")

  private val q12 = revenueRatio("web_sales", "ws", "LIMIT 100")
  private val q20 = revenueRatio("catalog_sales", "cs", "LIMIT 100")
  private val q98 = revenueRatio("store_sales", "ss", "")

  // ---- Q36: gross margin over a category/class rollup + rank ----------
  // (reference Q36 text spells the rollup as a UNION of grouping levels;
  // ported as written — Catalyst sees the same shape)
  private val q36 = q("""
    WITH results AS
      (SELECT CAST(sum(CAST(round(ss_net_profit * 100) AS BIGINT)) AS BIGINT) AS np_c,
              CAST(sum(CAST(round(ss_ext_sales_price * 100) AS BIGINT)) AS BIGINT) AS sp_c,
              i_category,
              i_class
       FROM store_sales, date_dim d1, item, store
       WHERE d1.d_year = 2001
         AND d1.d_date_sk = ss_sold_date_sk
         AND i_item_sk = ss_item_sk
         AND s_store_sk = ss_store_sk
         AND s_state = 'TN'
       GROUP BY i_category, i_class),
         results_rollup AS
      (SELECT round(CAST(np_c AS DOUBLE) / CAST(sp_c AS DOUBLE), 6) AS gross_margin,
              i_category, i_class,
              0 AS t_category, 0 AS t_class, 0 AS lochierarchy
       FROM results
       UNION SELECT round(CAST(sum(np_c) AS DOUBLE) / CAST(sum(sp_c) AS DOUBLE), 6) AS gross_margin,
                    i_category, NULL AS i_class,
                    0 AS t_category, 1 AS t_class, 1 AS lochierarchy
       FROM results GROUP BY i_category
       UNION SELECT round(CAST(sum(np_c) AS DOUBLE) / CAST(sum(sp_c) AS DOUBLE), 6) AS gross_margin,
                    NULL AS i_category, NULL AS i_class,
                    1 AS t_category, 1 AS t_class, 2 AS lochierarchy
       FROM results)
    SELECT gross_margin,
           i_category,
           i_class,
           lochierarchy,
           rank() OVER (PARTITION BY lochierarchy,
                          CASE WHEN t_class = 0 THEN i_category END
                        ORDER BY gross_margin ASC) AS rank_within_parent
    FROM results_rollup
    ORDER BY lochierarchy DESC NULLS FIRST,
             CASE WHEN lochierarchy = 0 THEN i_category END NULLS FIRST,
             rank_within_parent NULLS FIRST,
             i_category NULLS FIRST,
             i_class NULLS FIRST
    LIMIT 100""", headline = true)

  // ---- Q70: profit rollup over state/county with ranked-state filter --
  private val q70 = q("""
    SELECT CAST(sum(CAST(round(ss_net_profit * 100) AS BIGINT)) AS BIGINT) AS total_sum_c,
           s_state,
           s_county,
           grouping(s_state) + grouping(s_county) AS lochierarchy,
           rank() OVER (PARTITION BY grouping(s_state) + grouping(s_county),
                          CASE WHEN grouping(s_county) = 0 THEN s_state END
                        ORDER BY sum(CAST(round(ss_net_profit * 100) AS BIGINT)) DESC) AS rank_within_parent
    FROM store_sales, date_dim d1, store
    WHERE d1.d_month_seq BETWEEN 1200 AND 1200 + 11
      AND d1.d_date_sk = ss_sold_date_sk
      AND s_store_sk = ss_store_sk
      AND s_state IN
        (SELECT s_state
         FROM
           (SELECT s_state AS s_state,
                   rank() OVER (PARTITION BY s_state
                                ORDER BY sum(CAST(round(ss_net_profit * 100) AS BIGINT)) DESC) AS ranking
            FROM store_sales, store, date_dim
            WHERE d_month_seq BETWEEN 1200 AND 1200 + 11
              AND d_date_sk = ss_sold_date_sk
              AND s_store_sk = ss_store_sk
            GROUP BY s_state) tmp1
         WHERE ranking <= 5)
    GROUP BY rollup(s_state, s_county)
    ORDER BY lochierarchy DESC,
             CASE WHEN grouping(s_state) + grouping(s_county) = 0 THEN s_state END,
             rank_within_parent, s_state NULLS FIRST, s_county NULLS FIRST
    LIMIT 100""")

  // ---- Q89: monthly sales vs in-partition average --------------------
  private val q89 = q("""
    SELECT * FROM
      (SELECT i_category, i_class, i_brand, s_store_name, s_company_name, d_moy,
              CAST(sum(CAST(round(ss_sales_price * 100) AS BIGINT)) AS BIGINT) sum_sales_c,
              round(avg(sum(CAST(round(ss_sales_price * 100) AS BIGINT)))
                OVER (PARTITION BY i_category, i_brand, s_store_name, s_company_name), 4) avg_monthly_sales_c
       FROM item, store_sales, date_dim, store
       WHERE ss_item_sk = i_item_sk
         AND ss_sold_date_sk = d_date_sk
         AND ss_store_sk = s_store_sk
         AND d_year = 1999
         AND ((i_category IN ('Books', 'Electronics', 'Sports')
               AND i_class IN ('computers', 'stereo', 'football'))
              OR (i_category IN ('Men', 'Jewelry', 'Women')
                  AND i_class IN ('shirts', 'birdal', 'dresses')))
       GROUP BY i_category, i_class, i_brand, s_store_name, s_company_name, d_moy) tmp1
    WHERE CASE WHEN (avg_monthly_sales_c <> 0)
               THEN (abs(sum_sales_c - avg_monthly_sales_c) / avg_monthly_sales_c)
               ELSE NULL END > 0.1
    ORDER BY sum_sales_c - avg_monthly_sales_c, s_store_name, 1, 2, 3, 5, 6, 7, 8
    LIMIT 100""")

  // ---- Q51: cumulative web-vs-store sales crossover (full outer) ------
  private val q51 = q("""
    WITH web_v1 AS
      (SELECT ws_item_sk item_sk, d_date,
              sum(sum(CAST(round(ws_sales_price * 100) AS BIGINT)))
                OVER (PARTITION BY ws_item_sk ORDER BY d_date
                      ROWS BETWEEN unbounded preceding AND CURRENT ROW) cume_sales
       FROM web_sales, date_dim
       WHERE ws_sold_date_sk = d_date_sk
         AND d_month_seq BETWEEN 1200 AND 1200 + 11
         AND ws_item_sk IS NOT NULL
       GROUP BY ws_item_sk, d_date),
         store_v1 AS
      (SELECT ss_item_sk item_sk, d_date,
              sum(sum(CAST(round(ss_sales_price * 100) AS BIGINT)))
                OVER (PARTITION BY ss_item_sk ORDER BY d_date
                      ROWS BETWEEN unbounded preceding AND CURRENT ROW) cume_sales
       FROM store_sales, date_dim
       WHERE ss_sold_date_sk = d_date_sk
         AND d_month_seq BETWEEN 1200 AND 1200 + 11
         AND ss_item_sk IS NOT NULL
       GROUP BY ss_item_sk, d_date)
    SELECT item_sk,
           CAST(d_date AS TIMESTAMP) AS d_date,
           CAST(web_sales_c AS BIGINT) AS web_sales_c,
           CAST(store_sales_c AS BIGINT) AS store_sales_c,
           CAST(web_cumulative AS BIGINT) AS web_cumulative,
           CAST(store_cumulative AS BIGINT) AS store_cumulative
    FROM
      (SELECT item_sk, d_date, web_sales_c, store_sales_c,
              max(web_sales_c) OVER (PARTITION BY item_sk ORDER BY d_date
                    ROWS BETWEEN unbounded preceding AND CURRENT ROW) web_cumulative,
              max(store_sales_c) OVER (PARTITION BY item_sk ORDER BY d_date
                    ROWS BETWEEN unbounded preceding AND CURRENT ROW) store_cumulative
       FROM
         (SELECT CASE WHEN web.item_sk IS NOT NULL THEN web.item_sk ELSE store.item_sk END item_sk,
                 CASE WHEN web.d_date IS NOT NULL THEN web.d_date ELSE store.d_date END d_date,
                 web.cume_sales web_sales_c,
                 store.cume_sales store_sales_c
          FROM web_v1 web
          FULL OUTER JOIN store_v1 store ON (web.item_sk = store.item_sk
                                             AND web.d_date = store.d_date)) x) y
    WHERE web_cumulative > store_cumulative
    ORDER BY item_sk NULLS FIRST, d_date NULLS FIRST
    LIMIT 100""", headline = true)

  // ---- Q25: store buy -> store return -> catalog re-buy profit --------
  private val q25 = q("""
    SELECT i_item_id,
           i_item_desc,
           s_store_id,
           s_store_name,
           CAST(sum(CAST(round(ss_net_profit * 100) AS BIGINT)) AS BIGINT) AS store_sales_profit_c,
           CAST(sum(CAST(round(sr_net_loss * 100) AS BIGINT)) AS BIGINT) AS store_returns_loss_c,
           CAST(sum(CAST(round(cs_net_profit * 100) AS BIGINT)) AS BIGINT) AS catalog_sales_profit_c
    FROM store_sales, store_returns, catalog_sales,
         date_dim d1, date_dim d2, date_dim d3, store, item
    WHERE d1.d_moy = 4
      AND d1.d_year = 2001
      AND d1.d_date_sk = ss_sold_date_sk
      AND i_item_sk = ss_item_sk
      AND s_store_sk = ss_store_sk
      AND ss_customer_sk = sr_customer_sk
      AND ss_item_sk = sr_item_sk
      AND ss_ticket_number = sr_ticket_number
      AND sr_returned_date_sk = d2.d_date_sk
      AND d2.d_moy BETWEEN 4 AND 10
      AND d2.d_year = 2001
      AND sr_customer_sk = cs_bill_customer_sk
      AND sr_item_sk = cs_item_sk
      AND cs_sold_date_sk = d3.d_date_sk
      AND d3.d_moy BETWEEN 4 AND 10
      AND d3.d_year = 2001
    GROUP BY i_item_id, i_item_desc, s_store_id, s_store_name
    ORDER BY i_item_id, i_item_desc, s_store_id, s_store_name
    LIMIT 100""")

  // ---- Q29: same triple-channel path, quantities ----------------------
  private val q29 = q("""
    SELECT i_item_id,
           i_item_desc,
           s_store_id,
           s_store_name,
           CAST(sum(ss_quantity) AS BIGINT) AS store_sales_quantity,
           CAST(sum(sr_return_quantity) AS BIGINT) AS store_returns_quantity,
           CAST(sum(cs_quantity) AS BIGINT) AS catalog_sales_quantity
    FROM store_sales, store_returns, catalog_sales,
         date_dim d1, date_dim d2, date_dim d3, store, item
    WHERE d1.d_moy = 9
      AND d1.d_year = 1999
      AND d1.d_date_sk = ss_sold_date_sk
      AND i_item_sk = ss_item_sk
      AND s_store_sk = ss_store_sk
      AND ss_customer_sk = sr_customer_sk
      AND ss_item_sk = sr_item_sk
      AND ss_ticket_number = sr_ticket_number
      AND sr_returned_date_sk = d2.d_date_sk
      AND d2.d_moy BETWEEN 9 AND 9 + 3
      AND d2.d_year = 1999
      AND sr_customer_sk = cs_bill_customer_sk
      AND sr_item_sk = cs_item_sk
      AND cs_sold_date_sk = d3.d_date_sk
      AND d3.d_year IN (1999, 1999+1, 1999+2)
    GROUP BY i_item_id, i_item_desc, s_store_id, s_store_name
    ORDER BY i_item_id, i_item_desc, s_store_id, s_store_name
    LIMIT 100""")

  // ---- Q50: return-latency buckets per store --------------------------
  private val q50 = q("""
    SELECT s_store_name,
           s_company_id,
           s_street_number,
           s_street_name,
           s_street_type,
           s_suite_number,
           s_city,
           s_county,
           s_state,
           s_zip,
           CAST(sum(CASE WHEN (sr_returned_date_sk - ss_sold_date_sk <= 30) THEN 1 ELSE 0 END) AS BIGINT) AS d30,
           CAST(sum(CASE WHEN (sr_returned_date_sk - ss_sold_date_sk > 30)
                          AND (sr_returned_date_sk - ss_sold_date_sk <= 60) THEN 1 ELSE 0 END) AS BIGINT) AS d31_60,
           CAST(sum(CASE WHEN (sr_returned_date_sk - ss_sold_date_sk > 60)
                          AND (sr_returned_date_sk - ss_sold_date_sk <= 90) THEN 1 ELSE 0 END) AS BIGINT) AS d61_90,
           CAST(sum(CASE WHEN (sr_returned_date_sk - ss_sold_date_sk > 90)
                          AND (sr_returned_date_sk - ss_sold_date_sk <= 120) THEN 1 ELSE 0 END) AS BIGINT) AS d91_120,
           CAST(sum(CASE WHEN (sr_returned_date_sk - ss_sold_date_sk > 120) THEN 1 ELSE 0 END) AS BIGINT) AS d120_plus
    FROM store_sales, store_returns, store, date_dim d1, date_dim d2
    WHERE d2.d_year = 2001
      AND d2.d_moy = 8
      AND ss_ticket_number = sr_ticket_number
      AND ss_item_sk = sr_item_sk
      AND ss_sold_date_sk = d1.d_date_sk
      AND sr_returned_date_sk = d2.d_date_sk
      AND ss_customer_sk = sr_customer_sk
      AND ss_store_sk = s_store_sk
    GROUP BY s_store_name, s_company_id, s_street_number, s_street_name,
             s_street_type, s_suite_number, s_city, s_county, s_state, s_zip
    ORDER BY s_store_name, s_company_id, s_street_number, s_street_name,
             s_street_type, s_suite_number, s_city, s_county, s_state, s_zip
    LIMIT 100""")

  // ---- Q65: items selling under 10% of their store's average ----------
  private val q65 = q("""
    SELECT s_store_name,
           i_item_desc,
           sc.revenue_c,
           i_current_price,
           i_wholesale_cost,
           i_brand
    FROM store, item,
      (SELECT ss_store_sk, avg(revenue_c) AS ave
       FROM
         (SELECT ss_store_sk, ss_item_sk,
                 sum(CAST(round(ss_sales_price * 100) AS BIGINT)) AS revenue_c
          FROM store_sales, date_dim
          WHERE ss_sold_date_sk = d_date_sk
            AND d_month_seq BETWEEN 1176 AND 1176 + 11
          GROUP BY ss_store_sk, ss_item_sk) sa
       GROUP BY ss_store_sk) sb,
      (SELECT ss_store_sk, ss_item_sk,
              CAST(sum(CAST(round(ss_sales_price * 100) AS BIGINT)) AS BIGINT) AS revenue_c
       FROM store_sales, date_dim
       WHERE ss_sold_date_sk = d_date_sk
         AND d_month_seq BETWEEN 1176 AND 1176 + 11
       GROUP BY ss_store_sk, ss_item_sk) sc
    WHERE sb.ss_store_sk = sc.ss_store_sk
      AND sc.revenue_c <= 0.1 * sb.ave
      AND s_store_sk = sc.ss_store_sk
      AND i_item_sk = sc.ss_item_sk
    ORDER BY s_store_name NULLS FIRST, i_item_desc NULLS FIRST, sc.revenue_c
    LIMIT 100""")

  // ---- Q92: discounts above 1.3x the item's average -------------------
  private val q92 = q("""
    SELECT CAST(sum(CAST(round(ws_ext_discount_amt * 100) AS BIGINT)) AS BIGINT) AS excess_discount_c
    FROM web_sales, item, date_dim
    WHERE i_manufact_id = 350
      AND i_item_sk = ws_item_sk
      AND d_date BETWEEN '2000-01-27' AND cast('2000-04-26' AS date)
      AND d_date_sk = ws_sold_date_sk
      AND ws_ext_discount_amt >
        (SELECT 1.3 * avg(ws_ext_discount_amt)
         FROM web_sales, date_dim
         WHERE ws_item_sk = i_item_sk
           AND d_date BETWEEN '2000-01-27' AND cast('2000-04-26' AS date)
           AND d_date_sk = ws_sold_date_sk)
    ORDER BY excess_discount_c
    LIMIT 100""")

  // ---- Q94: multi-warehouse unreturned web orders (EXISTS/NOT EXISTS) -
  private val q94 = q("""
    SELECT count(DISTINCT ws_order_number) AS order_count,
           CAST(sum(CAST(round(ws_ext_ship_cost * 100) AS BIGINT)) AS BIGINT) AS total_ship_cost_c,
           CAST(sum(CAST(round(ws_net_profit * 100) AS BIGINT)) AS BIGINT) AS total_net_profit_c
    FROM web_sales ws1, date_dim, customer_address, web_site
    WHERE d_date BETWEEN '1999-02-01' AND cast('1999-04-02' AS date)
      AND ws1.ws_ship_date_sk = d_date_sk
      AND ws1.ws_ship_addr_sk = ca_address_sk
      AND ca_state = 'IL'
      AND ws1.ws_web_site_sk = web_site_sk
      AND web_company_name = 'pri'
      AND EXISTS
        (SELECT *
         FROM web_sales ws2
         WHERE ws1.ws_order_number = ws2.ws_order_number
           AND ws1.ws_warehouse_sk <> ws2.ws_warehouse_sk)
      AND NOT EXISTS
        (SELECT *
         FROM web_returns wr1
         WHERE ws1.ws_order_number = wr1.wr_order_number)
    ORDER BY order_count
    LIMIT 100""", headline = true)

  // ---- Q1: customers returning more than 1.2x their store's average ---
  private val q1 = q("""
    WITH customer_total_return AS
      (SELECT sr_customer_sk AS ctr_customer_sk,
              sr_store_sk AS ctr_store_sk,
              sum(CAST(round(sr_return_amt * 100) AS BIGINT)) AS ctr_total_return
       FROM store_returns, date_dim
       WHERE sr_returned_date_sk = d_date_sk
         AND d_year = 2000
       GROUP BY sr_customer_sk, sr_store_sk)
    SELECT c_customer_id
    FROM customer_total_return ctr1, store, customer
    WHERE ctr1.ctr_total_return >
        (SELECT avg(ctr_total_return) * 1.2
         FROM customer_total_return ctr2
         WHERE ctr1.ctr_store_sk = ctr2.ctr_store_sk)
      AND s_store_sk = ctr1.ctr_store_sk
      AND s_state = 'TN'
      AND ctr1.ctr_customer_sk = c_customer_sk
    ORDER BY c_customer_id
    LIMIT 100""", headline = true)

  // ---- Q2: web+catalog weekday sales year-over-year ratios ------------
  // (reference uses a 53-week offset from dsdgen's week_seq numbering;
  // this calendar's 2001->2002 same-week offset is 52)
  private val q2 = q("""
    WITH wscs AS
      (SELECT sold_date_sk, sales_price
       FROM
         (SELECT ws_sold_date_sk sold_date_sk, ws_ext_sales_price sales_price
          FROM web_sales
          UNION ALL SELECT cs_sold_date_sk sold_date_sk, cs_ext_sales_price sales_price
          FROM catalog_sales) sq1),
         wswscs AS
      (SELECT d_week_seq,
              sum(CAST(round(CASE WHEN (d_day_name = 'Sunday') THEN sales_price ELSE NULL END * 100) AS BIGINT)) sun_sales,
              sum(CAST(round(CASE WHEN (d_day_name = 'Monday') THEN sales_price ELSE NULL END * 100) AS BIGINT)) mon_sales,
              sum(CAST(round(CASE WHEN (d_day_name = 'Tuesday') THEN sales_price ELSE NULL END * 100) AS BIGINT)) tue_sales,
              sum(CAST(round(CASE WHEN (d_day_name = 'Wednesday') THEN sales_price ELSE NULL END * 100) AS BIGINT)) wed_sales,
              sum(CAST(round(CASE WHEN (d_day_name = 'Thursday') THEN sales_price ELSE NULL END * 100) AS BIGINT)) thu_sales,
              sum(CAST(round(CASE WHEN (d_day_name = 'Friday') THEN sales_price ELSE NULL END * 100) AS BIGINT)) fri_sales,
              sum(CAST(round(CASE WHEN (d_day_name = 'Saturday') THEN sales_price ELSE NULL END * 100) AS BIGINT)) sat_sales
       FROM wscs, date_dim
       WHERE d_date_sk = sold_date_sk
       GROUP BY d_week_seq)
    SELECT d_week_seq1,
           round(CAST(sun_sales1 AS DOUBLE) / CAST(sun_sales2 AS DOUBLE), 2) r1,
           round(CAST(mon_sales1 AS DOUBLE) / CAST(mon_sales2 AS DOUBLE), 2) r2,
           round(CAST(tue_sales1 AS DOUBLE) / CAST(tue_sales2 AS DOUBLE), 2) r3,
           round(CAST(wed_sales1 AS DOUBLE) / CAST(wed_sales2 AS DOUBLE), 2) r4,
           round(CAST(thu_sales1 AS DOUBLE) / CAST(thu_sales2 AS DOUBLE), 2) r5,
           round(CAST(fri_sales1 AS DOUBLE) / CAST(fri_sales2 AS DOUBLE), 2) r6,
           round(CAST(sat_sales1 AS DOUBLE) / CAST(sat_sales2 AS DOUBLE), 2) r7
    FROM
      (SELECT wswscs.d_week_seq d_week_seq1,
              sun_sales sun_sales1, mon_sales mon_sales1, tue_sales tue_sales1,
              wed_sales wed_sales1, thu_sales thu_sales1, fri_sales fri_sales1,
              sat_sales sat_sales1
       FROM wswscs, date_dim
       WHERE date_dim.d_week_seq = wswscs.d_week_seq AND d_year = 2001) y,
      (SELECT wswscs.d_week_seq d_week_seq2,
              sun_sales sun_sales2, mon_sales mon_sales2, tue_sales tue_sales2,
              wed_sales wed_sales2, thu_sales thu_sales2, fri_sales fri_sales2,
              sat_sales sat_sales2
       FROM wswscs, date_dim
       WHERE date_dim.d_week_seq = wswscs.d_week_seq AND d_year = 2001 + 1) z
    WHERE d_week_seq1 = d_week_seq2 - 52
    ORDER BY d_week_seq1 NULLS FIRST""")

  // ---- Q16: multi-warehouse unreturned catalog orders -----------------
  private val q16 = q("""
    SELECT count(DISTINCT cs_order_number) AS order_count,
           CAST(sum(CAST(round(cs_ext_ship_cost * 100) AS BIGINT)) AS BIGINT) AS total_ship_cost_c,
           CAST(sum(CAST(round(cs_net_profit * 100) AS BIGINT)) AS BIGINT) AS total_net_profit_c
    FROM catalog_sales cs1, date_dim, customer_address, call_center
    WHERE d_date BETWEEN '2002-02-01' AND cast('2002-04-02' AS date)
      AND cs1.cs_ship_date_sk = d_date_sk
      AND cs1.cs_ship_addr_sk = ca_address_sk
      AND ca_state = 'GA'
      AND cs1.cs_call_center_sk = cc_call_center_sk
      AND cc_county = 'Williamson County'
      AND EXISTS
        (SELECT *
         FROM catalog_sales cs2
         WHERE cs1.cs_order_number = cs2.cs_order_number
           AND cs1.cs_warehouse_sk <> cs2.cs_warehouse_sk)
      AND NOT EXISTS
        (SELECT *
         FROM catalog_returns cr1
         WHERE cs1.cs_order_number = cr1.cr_order_number)
    ORDER BY order_count
    LIMIT 100""")

  // ---- Q38: customers active in all three channels (INTERSECT) --------
  private val q38 = q("""
    SELECT count(*) cnt
    FROM
      (SELECT DISTINCT c_last_name, c_first_name, d_date
       FROM store_sales, date_dim, customer
       WHERE store_sales.ss_sold_date_sk = date_dim.d_date_sk
         AND store_sales.ss_customer_sk = customer.c_customer_sk
         AND d_month_seq BETWEEN 1200 AND 1200 + 11
       INTERSECT
       SELECT DISTINCT c_last_name, c_first_name, d_date
       FROM catalog_sales, date_dim, customer
       WHERE catalog_sales.cs_sold_date_sk = date_dim.d_date_sk
         AND catalog_sales.cs_bill_customer_sk = customer.c_customer_sk
         AND d_month_seq BETWEEN 1200 AND 1200 + 11
       INTERSECT
       SELECT DISTINCT c_last_name, c_first_name, d_date
       FROM web_sales, date_dim, customer
       WHERE web_sales.ws_sold_date_sk = date_dim.d_date_sk
         AND web_sales.ws_bill_customer_sk = customer.c_customer_sk
         AND d_month_seq BETWEEN 1200 AND 1200 + 11) hot_cust
    LIMIT 100""")

  // ---- Q87: store-only customers (EXCEPT chain) -----------------------
  private val q87 = q("""
    SELECT count(*) cnt
    FROM ((SELECT DISTINCT c_last_name, c_first_name, d_date
           FROM store_sales, date_dim, customer
           WHERE store_sales.ss_sold_date_sk = date_dim.d_date_sk
             AND store_sales.ss_customer_sk = customer.c_customer_sk
             AND d_month_seq BETWEEN 1200 AND 1200 + 11)
          EXCEPT
          (SELECT DISTINCT c_last_name, c_first_name, d_date
           FROM catalog_sales, date_dim, customer
           WHERE catalog_sales.cs_sold_date_sk = date_dim.d_date_sk
             AND catalog_sales.cs_bill_customer_sk = customer.c_customer_sk
             AND d_month_seq BETWEEN 1200 AND 1200 + 11)
          EXCEPT
          (SELECT DISTINCT c_last_name, c_first_name, d_date
           FROM web_sales, date_dim, customer
           WHERE web_sales.ws_sold_date_sk = date_dim.d_date_sk
             AND web_sales.ws_bill_customer_sk = customer.c_customer_sk
             AND d_month_seq BETWEEN 1200 AND 1200 + 11)) cool_cust""")

  // ---- Q88: 8 half-hour store traffic counts (cross join of scalars) --
  private def q88block(alias: String, hour: Int, minuteCond: String): String = s"""
      (SELECT count(*) $alias
       FROM store_sales, household_demographics, time_dim, store
       WHERE ss_sold_time_sk = time_dim.t_time_sk
         AND ss_hdemo_sk = household_demographics.hd_demo_sk
         AND ss_store_sk = s_store_sk
         AND time_dim.t_hour = $hour
         AND time_dim.t_minute $minuteCond
         AND ((household_demographics.hd_dep_count = 4
               AND household_demographics.hd_vehicle_count <= 4 + 2)
              OR (household_demographics.hd_dep_count = 2
                  AND household_demographics.hd_vehicle_count <= 2 + 2)
              OR (household_demographics.hd_dep_count = 0
                  AND household_demographics.hd_vehicle_count <= 0 + 2))
         AND store.s_store_name = 'ese')"""

  private val q88 = q(s"""
    SELECT *
    FROM
    ${q88block("h8_30_to_9", 8, ">= 30")} s1,
    ${q88block("h9_to_9_30", 9, "< 30")} s2,
    ${q88block("h9_30_to_10", 9, ">= 30")} s3,
    ${q88block("h10_to_10_30", 10, "< 30")} s4,
    ${q88block("h10_30_to_11", 10, ">= 30")} s5,
    ${q88block("h11_to_11_30", 11, "< 30")} s6,
    ${q88block("h11_30_to_12", 11, ">= 30")} s7,
    ${q88block("h12_to_12_30", 12, "< 30")} s8""")

  // ---- Q90: AM/PM web-order ratio -------------------------------------
  private val q90 = q("""
    SELECT CASE WHEN pmc = 0 THEN NULL
                ELSE round(CAST(amc AS DOUBLE) / CAST(pmc AS DOUBLE), 6) END am_pm_ratio
    FROM
      (SELECT count(*) amc
       FROM web_sales, household_demographics, time_dim, web_page
       WHERE ws_sold_time_sk = time_dim.t_time_sk
         AND ws_ship_hdemo_sk = household_demographics.hd_demo_sk
         AND ws_web_page_sk = web_page.wp_web_page_sk
         AND time_dim.t_hour BETWEEN 8 AND 8 + 1
         AND household_demographics.hd_dep_count = 6
         AND web_page.wp_char_count BETWEEN 5000 AND 5200) at_c,
      (SELECT count(*) pmc
       FROM web_sales, household_demographics, time_dim, web_page
       WHERE ws_sold_time_sk = time_dim.t_time_sk
         AND ws_ship_hdemo_sk = household_demographics.hd_demo_sk
         AND ws_web_page_sk = web_page.wp_web_page_sk
         AND time_dim.t_hour BETWEEN 19 AND 19 + 1
         AND household_demographics.hd_dep_count = 6
         AND web_page.wp_char_count BETWEEN 5000 AND 5200) pt
    ORDER BY am_pm_ratio
    LIMIT 100""")

  // ---- Q97: store/catalog channel overlap (full outer over groups) ----
  private val q97 = q("""
    WITH ssci AS
      (SELECT ss_customer_sk customer_sk, ss_item_sk item_sk
       FROM store_sales, date_dim
       WHERE ss_sold_date_sk = d_date_sk
         AND d_month_seq BETWEEN 1200 AND 1200 + 11
       GROUP BY ss_customer_sk, ss_item_sk),
         csci AS
      (SELECT cs_bill_customer_sk customer_sk, cs_item_sk item_sk
       FROM catalog_sales, date_dim
       WHERE cs_sold_date_sk = d_date_sk
         AND d_month_seq BETWEEN 1200 AND 1200 + 11
       GROUP BY cs_bill_customer_sk, cs_item_sk)
    SELECT CAST(sum(CASE WHEN ssci.customer_sk IS NOT NULL
                          AND csci.customer_sk IS NULL THEN 1 ELSE 0 END) AS BIGINT) store_only,
           CAST(sum(CASE WHEN ssci.customer_sk IS NULL
                          AND csci.customer_sk IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) catalog_only,
           CAST(sum(CASE WHEN ssci.customer_sk IS NOT NULL
                          AND csci.customer_sk IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) store_and_catalog
    FROM ssci
    FULL OUTER JOIN csci ON (ssci.customer_sk = csci.customer_sk
                             AND ssci.item_sk = csci.item_sk)
    LIMIT 100""", headline = true)

  // ---- Q47: months deviating >10% from the year average, with
  // previous/next month via rank self-joins -----------------------------
  private val q47 = q("""
    WITH v1 AS
      (SELECT i_category, i_brand, s_store_name, s_company_name, d_year, d_moy,
              CAST(sum(CAST(round(ss_sales_price * 100) AS BIGINT)) AS BIGINT) sum_sales_c,
              round(avg(sum(CAST(round(ss_sales_price * 100) AS BIGINT)))
                OVER (PARTITION BY i_category, i_brand, s_store_name,
                                   s_company_name, d_year), 4) avg_monthly_sales_c,
              rank() OVER (PARTITION BY i_category, i_brand, s_store_name, s_company_name
                           ORDER BY d_year, d_moy) rn
       FROM item, store_sales, date_dim, store
       WHERE ss_item_sk = i_item_sk
         AND ss_sold_date_sk = d_date_sk
         AND ss_store_sk = s_store_sk
         AND (d_year = 1999
              OR (d_year = 1999 - 1 AND d_moy = 12)
              OR (d_year = 1999 + 1 AND d_moy = 1))
       GROUP BY i_category, i_brand, s_store_name, s_company_name, d_year, d_moy),
         v2 AS
      (SELECT v1.i_category, v1.i_brand, v1.s_store_name, v1.s_company_name,
              v1.d_year, v1.d_moy, v1.avg_monthly_sales_c, v1.sum_sales_c,
              v1_lag.sum_sales_c psum_c,
              v1_lead.sum_sales_c nsum_c
       FROM v1, v1 v1_lag, v1 v1_lead
       WHERE v1.i_category = v1_lag.i_category
         AND v1.i_category = v1_lead.i_category
         AND v1.i_brand = v1_lag.i_brand
         AND v1.i_brand = v1_lead.i_brand
         AND v1.s_store_name = v1_lag.s_store_name
         AND v1.s_store_name = v1_lead.s_store_name
         AND v1.s_company_name = v1_lag.s_company_name
         AND v1.s_company_name = v1_lead.s_company_name
         AND v1.rn = v1_lag.rn + 1
         AND v1.rn = v1_lead.rn - 1)
    SELECT *
    FROM v2
    WHERE d_year = 1999
      AND avg_monthly_sales_c > 0
      AND CASE WHEN avg_monthly_sales_c > 0
               THEN abs(sum_sales_c - avg_monthly_sales_c) / avg_monthly_sales_c
               ELSE NULL END > 0.1
    ORDER BY sum_sales_c - avg_monthly_sales_c, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10
    LIMIT 100""", headline = true)

  // ---- Q95: returned multi-warehouse web orders (CTE reused twice) ----
  private val q95 = q("""
    WITH ws_wh AS
      (SELECT ws1.ws_order_number, ws1.ws_warehouse_sk wh1, ws2.ws_warehouse_sk wh2
       FROM web_sales ws1, web_sales ws2
       WHERE ws1.ws_order_number = ws2.ws_order_number
         AND ws1.ws_warehouse_sk <> ws2.ws_warehouse_sk)
    SELECT count(DISTINCT ws_order_number) AS order_count,
           CAST(sum(CAST(round(ws_ext_ship_cost * 100) AS BIGINT)) AS BIGINT) AS total_ship_cost_c,
           CAST(sum(CAST(round(ws_net_profit * 100) AS BIGINT)) AS BIGINT) AS total_net_profit_c
    FROM web_sales ws1, date_dim, customer_address, web_site
    WHERE d_date BETWEEN '1999-02-01' AND cast('1999-04-02' AS date)
      AND ws1.ws_ship_date_sk = d_date_sk
      AND ws1.ws_ship_addr_sk = ca_address_sk
      AND ca_state = 'IL'
      AND ws1.ws_web_site_sk = web_site_sk
      AND web_company_name = 'pri'
      AND ws1.ws_order_number IN
        (SELECT ws_order_number FROM ws_wh)
      AND ws1.ws_order_number IN
        (SELECT wr_order_number
         FROM web_returns, ws_wh
         WHERE wr_order_number = ws_wh.ws_order_number)
    ORDER BY order_count
    LIMIT 100""")

  // ---- Q9: five quantity-band scalar-subquery CASEs -------------------
  private def q9band(i: Int, lo: Int, hi: Int, threshold: Int): String = s"""
       CASE WHEN (SELECT count(*) FROM store_sales
                  WHERE ss_quantity BETWEEN $lo AND $hi) > $threshold
            THEN (SELECT round(avg(CAST(round(ss_ext_discount_amt * 100) AS BIGINT)) / 100.0, 6)
                  FROM store_sales WHERE ss_quantity BETWEEN $lo AND $hi)
            ELSE (SELECT round(avg(CAST(round(ss_net_paid * 100) AS BIGINT)) / 100.0, 6)
                  FROM store_sales WHERE ss_quantity BETWEEN $lo AND $hi)
       END bucket$i"""

  private val q9 = q(s"""
    SELECT ${q9band(1, 1, 20, 74129)},
           ${q9band(2, 21, 40, 122840)},
           ${q9band(3, 41, 60, 56580)},
           ${q9band(4, 61, 80, 10097)},
           ${q9band(5, 81, 100, 165306)}
    FROM reason
    WHERE r_reason_sk = 1""")

  // ---- Q21: inventory before/after a date, ratio-banded ---------------
  private val q21 = q("""
    SELECT *
    FROM
      (SELECT w_warehouse_name,
              i_item_id,
              CAST(sum(CASE WHEN (cast(d_date AS date) < CAST('2000-03-11' AS date))
                            THEN inv_quantity_on_hand ELSE 0 END) AS BIGINT) AS inv_before,
              CAST(sum(CASE WHEN (cast(d_date AS date) >= CAST('2000-03-11' AS date))
                            THEN inv_quantity_on_hand ELSE 0 END) AS BIGINT) AS inv_after
       FROM inventory, warehouse, item, date_dim
       WHERE i_current_price BETWEEN 0.99 AND 1.49
         AND i_item_sk = inv_item_sk
         AND inv_warehouse_sk = w_warehouse_sk
         AND inv_date_sk = d_date_sk
         AND d_date BETWEEN CAST('2000-02-10' AS date) AND CAST('2000-04-10' AS date)
       GROUP BY w_warehouse_name, i_item_id) x
    WHERE (CASE WHEN inv_before > 0 THEN (inv_after * 1.0) / inv_before ELSE NULL END)
          BETWEEN 2.0/3.0 AND 3.0/2.0
    ORDER BY w_warehouse_name NULLS FIRST, i_item_id NULLS FIRST
    LIMIT 100""")

  // ---- Q27: demographic averages over a state grouping ladder ---------
  private val q27 = q("""
    WITH results AS
      (SELECT i_item_id, s_state, 0 AS g_state,
              ss_quantity agg1, ss_list_price agg2,
              ss_coupon_amt agg3, ss_sales_price agg4
       FROM store_sales, customer_demographics, date_dim, store, item
       WHERE ss_sold_date_sk = d_date_sk
         AND ss_item_sk = i_item_sk
         AND ss_store_sk = s_store_sk
         AND ss_cdemo_sk = cd_demo_sk
         AND cd_gender = 'M'
         AND cd_marital_status = 'S'
         AND cd_education_status = 'College'
         AND d_year = 2002
         AND s_state = 'TN')
    SELECT i_item_id, s_state, g_state, agg1, agg2, agg3, agg4
    FROM
      (SELECT i_item_id, s_state, 0 AS g_state,
              round(avg(agg1), 6) agg1,
              round(avg(CAST(round(agg2 * 100) AS BIGINT)) / 100.0, 6) agg2,
              round(avg(CAST(round(agg3 * 100) AS BIGINT)) / 100.0, 6) agg3,
              round(avg(CAST(round(agg4 * 100) AS BIGINT)) / 100.0, 6) agg4
       FROM results GROUP BY i_item_id, s_state
       UNION ALL SELECT i_item_id, NULL AS s_state, 1 AS g_state,
              round(avg(agg1), 6) agg1,
              round(avg(CAST(round(agg2 * 100) AS BIGINT)) / 100.0, 6) agg2,
              round(avg(CAST(round(agg3 * 100) AS BIGINT)) / 100.0, 6) agg3,
              round(avg(CAST(round(agg4 * 100) AS BIGINT)) / 100.0, 6) agg4
       FROM results GROUP BY i_item_id
       UNION ALL SELECT NULL AS i_item_id, NULL AS s_state, 1 AS g_state,
              round(avg(agg1), 6) agg1,
              round(avg(CAST(round(agg2 * 100) AS BIGINT)) / 100.0, 6) agg2,
              round(avg(CAST(round(agg3 * 100) AS BIGINT)) / 100.0, 6) agg3,
              round(avg(CAST(round(agg4 * 100) AS BIGINT)) / 100.0, 6) agg4
       FROM results) foo
    ORDER BY i_item_id NULLS FIRST, s_state NULLS FIRST
    LIMIT 100""")

  // ---- Q34: 15-20 item baskets for high-buy-potential households ------
  private val q34 = q("""
    SELECT c_last_name, c_first_name, c_salutation, c_preferred_cust_flag,
           ss_ticket_number, cnt
    FROM
      (SELECT ss_ticket_number, ss_customer_sk, count(*) cnt
       FROM store_sales, date_dim, store, household_demographics
       WHERE store_sales.ss_sold_date_sk = date_dim.d_date_sk
         AND store_sales.ss_store_sk = store.s_store_sk
         AND store_sales.ss_hdemo_sk = household_demographics.hd_demo_sk
         AND (date_dim.d_dom BETWEEN 1 AND 3 OR date_dim.d_dom BETWEEN 25 AND 28)
         AND (household_demographics.hd_buy_potential = '>10000'
              OR household_demographics.hd_buy_potential = 'Unknown')
         AND household_demographics.hd_vehicle_count > 0
         AND (CASE WHEN household_demographics.hd_vehicle_count > 0
                   THEN (household_demographics.hd_dep_count * 1.0) / household_demographics.hd_vehicle_count
                   ELSE NULL END) > 1.2
         AND date_dim.d_year IN (1999, 1999+1, 1999+2)
         AND store.s_county = 'Williamson County'
       GROUP BY ss_ticket_number, ss_customer_sk) dn,
         customer
    WHERE ss_customer_sk = c_customer_sk
      AND cnt BETWEEN 15 AND 20
    ORDER BY c_last_name NULLS FIRST, c_first_name NULLS FIRST,
             c_salutation NULLS FIRST, c_preferred_cust_flag DESC NULLS FIRST,
             ss_ticket_number NULLS FIRST""")

  // ---- Q41: manufacturers with fancy-combination items (correlated
  // count subquery over item itself) ------------------------------------
  private val q41 = q("""
    SELECT distinct(i_product_name)
    FROM item i1
    WHERE i_manufact_id BETWEEN 738 AND 738 + 40
      AND
        (SELECT count(*) AS item_cnt
         FROM item
         WHERE (i_manufact = i1.i_manufact
                AND ((i_category = 'Women'
                      AND (i_color = 'powder' OR i_color = 'khaki')
                      AND (i_units = 'Ounce' OR i_units = 'Oz')
                      AND (i_size = 'medium' OR i_size = 'extra large'))
                     OR (i_category = 'Women'
                         AND (i_color = 'brown' OR i_color = 'honeydew')
                         AND (i_units = 'Bunch' OR i_units = 'Ton')
                         AND (i_size = 'N/A' OR i_size = 'small'))
                     OR (i_category = 'Men'
                         AND (i_color = 'floral' OR i_color = 'deep')
                         AND (i_units = 'N/A' OR i_units = 'Dozen')
                         AND (i_size = 'petite' OR i_size = 'petite'))
                     OR (i_category = 'Men'
                         AND (i_color = 'light' OR i_color = 'cornflower')
                         AND (i_units = 'Box' OR i_units = 'Pound')
                         AND (i_size = 'medium' OR i_size = 'extra large'))))
           OR (i_manufact = i1.i_manufact
               AND ((i_category = 'Women'
                     AND (i_color = 'midnight' OR i_color = 'snow')
                     AND (i_units = 'Pallet' OR i_units = 'Gross')
                     AND (i_size = 'medium' OR i_size = 'extra large'))
                    OR (i_category = 'Women'
                        AND (i_color = 'cyan' OR i_color = 'papaya')
                        AND (i_units = 'Cup' OR i_units = 'Dram')
                        AND (i_size = 'N/A' OR i_size = 'small'))
                    OR (i_category = 'Men'
                        AND (i_color = 'orange' OR i_color = 'frosted')
                        AND (i_units = 'Each' OR i_units = 'Tbl')
                        AND (i_size = 'petite' OR i_size = 'petite'))
                    OR (i_category = 'Men'
                        AND (i_color = 'forest' OR i_color = 'ghost')
                        AND (i_units = 'Lb' OR i_units = 'Bundle')
                        AND (i_size = 'medium' OR i_size = 'extra large'))))) > 0
    ORDER BY i_product_name
    LIMIT 100""")

  // ---- Q45: web sales by zip with item-id IN subquery -----------------
  private val q45 = q("""
    SELECT ca_zip,
           ca_city,
           CAST(sum(CAST(round(ws_sales_price * 100) AS BIGINT)) AS BIGINT) AS sum_sales_c
    FROM web_sales, customer, customer_address, date_dim, item
    WHERE ws_bill_customer_sk = c_customer_sk
      AND c_current_addr_sk = ca_address_sk
      AND ws_item_sk = i_item_sk
      AND (SUBSTRING(ca_zip, 1, 5) IN ('85669', '86197', '88274', '83405',
                                       '86475', '85392', '85460', '80348', '81792')
           OR i_item_id IN
             (SELECT i_item_id
              FROM item
              WHERE i_item_sk IN (2, 3, 5, 7, 11, 13, 17, 19, 23, 29)))
      AND ws_sold_date_sk = d_date_sk
      AND d_qoy = 2
      AND d_year = 2001
    GROUP BY ca_zip, ca_city
    ORDER BY ca_zip, ca_city
    LIMIT 100""")

  // ---- Q46: weekend baskets bought outside the home city --------------
  private val q46 = q("""
    SELECT c_last_name, c_first_name, ca_city, bought_city, ss_ticket_number,
           amt_c, profit_c
    FROM
      (SELECT ss_ticket_number, ss_customer_sk, ca_city bought_city,
              CAST(sum(CAST(round(ss_coupon_amt * 100) AS BIGINT)) AS BIGINT) amt_c,
              CAST(sum(CAST(round(ss_net_profit * 100) AS BIGINT)) AS BIGINT) profit_c
       FROM store_sales, date_dim, store, household_demographics, customer_address
       WHERE store_sales.ss_sold_date_sk = date_dim.d_date_sk
         AND store_sales.ss_store_sk = store.s_store_sk
         AND store_sales.ss_hdemo_sk = household_demographics.hd_demo_sk
         AND store_sales.ss_addr_sk = customer_address.ca_address_sk
         AND (household_demographics.hd_dep_count = 4
              OR household_demographics.hd_vehicle_count = 3)
         AND date_dim.d_dow IN (6, 0)
         AND date_dim.d_year IN (1999, 1999+1, 1999+2)
         AND store.s_city IN ('Fairview', 'Midway')
       GROUP BY ss_ticket_number, ss_customer_sk, ss_addr_sk, ca_city) dn,
         customer,
         customer_address current_addr
    WHERE ss_customer_sk = c_customer_sk
      AND customer.c_current_addr_sk = current_addr.ca_address_sk
      AND current_addr.ca_city <> bought_city
    ORDER BY c_last_name NULLS FIRST, c_first_name NULLS FIRST,
             ca_city NULLS FIRST, bought_city NULLS FIRST,
             ss_ticket_number NULLS FIRST
    LIMIT 100""")

  // ---- Q48: quantity over demographic/address OR-bands ----------------
  private val q48 = q("""
    SELECT CAST(SUM(ss_quantity) AS BIGINT) AS sum_qty
    FROM store_sales, store, customer_demographics, customer_address, date_dim
    WHERE s_store_sk = ss_store_sk
      AND ss_sold_date_sk = d_date_sk
      AND d_year = 2000
      AND ((cd_demo_sk = ss_cdemo_sk
            AND cd_marital_status = 'M'
            AND cd_education_status = '4 yr Degree'
            AND ss_sales_price BETWEEN 100.00 AND 150.00)
           OR (cd_demo_sk = ss_cdemo_sk
               AND cd_marital_status = 'D'
               AND cd_education_status = '2 yr Degree'
               AND ss_sales_price BETWEEN 50.00 AND 100.00)
           OR (cd_demo_sk = ss_cdemo_sk
               AND cd_marital_status = 'S'
               AND cd_education_status = 'College'
               AND ss_sales_price BETWEEN 150.00 AND 200.00))
      AND ((ss_addr_sk = ca_address_sk
            AND ca_country = 'United States'
            AND ca_state IN ('CO', 'OH', 'TX')
            AND ss_net_profit BETWEEN 0 AND 2000)
           OR (ss_addr_sk = ca_address_sk
               AND ca_country = 'United States'
               AND ca_state IN ('OR', 'MN', 'KY')
               AND ss_net_profit BETWEEN 150 AND 3000)
           OR (ss_addr_sk = ca_address_sk
               AND ca_country = 'United States'
               AND ca_state IN ('VA', 'CA', 'MS')
               AND ss_net_profit BETWEEN 50 AND 25000))""")

  // ---- Q53: manufacturer quarterly sales vs average -------------------
  private val q53 = q("""
    SELECT *
    FROM
      (SELECT i_manufact_id,
              CAST(sum(CAST(round(ss_sales_price * 100) AS BIGINT)) AS BIGINT) sum_sales_c,
              round(avg(sum(CAST(round(ss_sales_price * 100) AS BIGINT)))
                OVER (PARTITION BY i_manufact_id), 4) avg_quarterly_sales_c
       FROM item, store_sales, date_dim, store
       WHERE ss_item_sk = i_item_sk
         AND ss_sold_date_sk = d_date_sk
         AND ss_store_sk = s_store_sk
         AND d_month_seq IN (1200, 1200+1, 1200+2, 1200+3, 1200+4, 1200+5,
                             1200+6, 1200+7, 1200+8, 1200+9, 1200+10, 1200+11)
         AND ((i_category IN ('Books', 'Children', 'Electronics')
               AND i_class IN ('personal', 'portable', 'reference', 'self-help')
               AND i_brand IN ('scholaramalgamalg #14', 'scholaramalgamalg #7',
                               'exportiunivamalg #9', 'scholaramalgamalg #9'))
              OR (i_category IN ('Women', 'Music', 'Men')
                  AND i_class IN ('accessories', 'classical', 'fragrances', 'pants')
                  AND i_brand IN ('amalgimporto #1', 'edu packscholar #1',
                                  'exportiimporto #1', 'importoamalg #1')))
       GROUP BY i_manufact_id, d_qoy) tmp1
    WHERE CASE WHEN avg_quarterly_sales_c > 0
               THEN ABS(sum_sales_c - avg_quarterly_sales_c) / avg_quarterly_sales_c
               ELSE NULL END > 0.1
    ORDER BY avg_quarterly_sales_c, sum_sales_c, i_manufact_id
    LIMIT 100""")

  // ---- Q59: store weekday sales, year-over-year ratio matrix ----------
  // (52-week offset for this calendar, as in Q2)
  private val q59 = q("""
    WITH wss AS
      (SELECT d_week_seq, ss_store_sk,
              sum(CAST(round(CASE WHEN (d_day_name = 'Sunday') THEN ss_sales_price ELSE NULL END * 100) AS BIGINT)) sun_sales,
              sum(CAST(round(CASE WHEN (d_day_name = 'Monday') THEN ss_sales_price ELSE NULL END * 100) AS BIGINT)) mon_sales,
              sum(CAST(round(CASE WHEN (d_day_name = 'Tuesday') THEN ss_sales_price ELSE NULL END * 100) AS BIGINT)) tue_sales,
              sum(CAST(round(CASE WHEN (d_day_name = 'Wednesday') THEN ss_sales_price ELSE NULL END * 100) AS BIGINT)) wed_sales,
              sum(CAST(round(CASE WHEN (d_day_name = 'Thursday') THEN ss_sales_price ELSE NULL END * 100) AS BIGINT)) thu_sales,
              sum(CAST(round(CASE WHEN (d_day_name = 'Friday') THEN ss_sales_price ELSE NULL END * 100) AS BIGINT)) fri_sales,
              sum(CAST(round(CASE WHEN (d_day_name = 'Saturday') THEN ss_sales_price ELSE NULL END * 100) AS BIGINT)) sat_sales
       FROM store_sales, date_dim
       WHERE d_date_sk = ss_sold_date_sk
       GROUP BY d_week_seq, ss_store_sk)
    SELECT s_store_name1, s_store_id1, d_week_seq1,
           round(CAST(sun_sales1 AS DOUBLE) / CAST(sun_sales2 AS DOUBLE), 6) AS sun_sales_ratio,
           round(CAST(mon_sales1 AS DOUBLE) / CAST(mon_sales2 AS DOUBLE), 6) AS mon_sales_ratio,
           round(CAST(tue_sales1 AS DOUBLE) / CAST(tue_sales2 AS DOUBLE), 6) AS tue_sales_ratio,
           round(CAST(wed_sales1 AS DOUBLE) / CAST(wed_sales2 AS DOUBLE), 6) AS wed_sales_ratio,
           round(CAST(thu_sales1 AS DOUBLE) / CAST(thu_sales2 AS DOUBLE), 6) AS thu_sales_ratio,
           round(CAST(fri_sales1 AS DOUBLE) / CAST(fri_sales2 AS DOUBLE), 6) AS fri_sales_ratio,
           round(CAST(sat_sales1 AS DOUBLE) / CAST(sat_sales2 AS DOUBLE), 6) AS sat_sales_ratio
    FROM
      (SELECT s_store_name s_store_name1, wss.d_week_seq d_week_seq1,
              s_store_id s_store_id1, sun_sales sun_sales1, mon_sales mon_sales1,
              tue_sales tue_sales1, wed_sales wed_sales1, thu_sales thu_sales1,
              fri_sales fri_sales1, sat_sales sat_sales1
       FROM wss, store, date_dim d
       WHERE d.d_week_seq = wss.d_week_seq
         AND ss_store_sk = s_store_sk
         AND d_month_seq BETWEEN 1212 AND 1212 + 11) y,
      (SELECT s_store_name s_store_name2, wss.d_week_seq d_week_seq2,
              s_store_id s_store_id2, sun_sales sun_sales2, mon_sales mon_sales2,
              tue_sales tue_sales2, wed_sales wed_sales2, thu_sales thu_sales2,
              fri_sales fri_sales2, sat_sales sat_sales2
       FROM wss, store, date_dim d
       WHERE d.d_week_seq = wss.d_week_seq
         AND ss_store_sk = s_store_sk
         AND d_month_seq BETWEEN 1212 + 12 AND 1212 + 23) x
    WHERE s_store_id1 = s_store_id2
      AND d_week_seq1 = d_week_seq2 - 52
    ORDER BY s_store_name1 NULLS FIRST, s_store_id1 NULLS FIRST,
             d_week_seq1 NULLS FIRST
    LIMIT 100""")

  // ---- Q61: promotional share of category sales -----------------------
  private val q61 = q("""
    SELECT promotions_c,
           total_c,
           round(CAST(promotions_c AS DOUBLE) / CAST(total_c AS DOUBLE) * 100, 6) AS promo_pct
    FROM
      (SELECT CAST(sum(CAST(round(ss_ext_sales_price * 100) AS BIGINT)) AS BIGINT) promotions_c
       FROM store_sales, store, promotion, date_dim, customer, customer_address, item
       WHERE ss_sold_date_sk = d_date_sk
         AND ss_store_sk = s_store_sk
         AND ss_promo_sk = p_promo_sk
         AND ss_customer_sk = c_customer_sk
         AND ca_address_sk = c_current_addr_sk
         AND ss_item_sk = i_item_sk
         AND ca_gmt_offset = -5
         AND i_category = 'Jewelry'
         AND (p_channel_dmail = 'Y' OR p_channel_email = 'Y' OR p_channel_tv = 'Y')
         AND s_gmt_offset = -5
         AND d_year = 1998
         AND d_moy = 11) promotional_sales,
      (SELECT CAST(sum(CAST(round(ss_ext_sales_price * 100) AS BIGINT)) AS BIGINT) total_c
       FROM store_sales, store, date_dim, customer, customer_address, item
       WHERE ss_sold_date_sk = d_date_sk
         AND ss_store_sk = s_store_sk
         AND ss_customer_sk = c_customer_sk
         AND ca_address_sk = c_current_addr_sk
         AND ss_item_sk = i_item_sk
         AND ca_gmt_offset = -5
         AND i_category = 'Jewelry'
         AND s_gmt_offset = -5
         AND d_year = 1998
         AND d_moy = 11) all_sales
    ORDER BY promotions_c, total_c
    LIMIT 100""")

  // ---- Q76: sales with NULL channel keys ------------------------------
  private val q76 = q("""
    SELECT channel, col_name, d_year, d_qoy, i_category,
           COUNT(*) sales_cnt,
           CAST(SUM(CAST(round(ext_sales_price * 100) AS BIGINT)) AS BIGINT) sales_amt_c
    FROM
      (SELECT 'store' AS channel, 'ss_store_sk' col_name, d_year, d_qoy,
              i_category, ss_ext_sales_price ext_sales_price
       FROM store_sales, item, date_dim
       WHERE ss_store_sk IS NULL
         AND ss_sold_date_sk = d_date_sk
         AND ss_item_sk = i_item_sk
       UNION ALL SELECT 'web' AS channel, 'ws_ship_customer_sk' col_name, d_year,
              d_qoy, i_category, ws_ext_sales_price ext_sales_price
       FROM web_sales, item, date_dim
       WHERE ws_ship_customer_sk IS NULL
         AND ws_sold_date_sk = d_date_sk
         AND ws_item_sk = i_item_sk
       UNION ALL SELECT 'catalog' AS channel, 'cs_ship_addr_sk' col_name, d_year,
              d_qoy, i_category, cs_ext_sales_price ext_sales_price
       FROM catalog_sales, item, date_dim
       WHERE cs_ship_addr_sk IS NULL
         AND cs_sold_date_sk = d_date_sk
         AND cs_item_sk = i_item_sk) foo
    GROUP BY channel, col_name, d_year, d_qoy, i_category
    ORDER BY channel NULLS FIRST, col_name NULLS FIRST, d_year NULLS FIRST,
             d_qoy NULLS FIRST, i_category NULLS FIRST
    LIMIT 100""", headline = true)

  // ---- Q82: items in inventory band also sold in store ----------------
  private val q82 = q("""
    SELECT i_item_id, i_item_desc, i_current_price
    FROM item, inventory, date_dim, store_sales
    WHERE i_current_price BETWEEN 62 AND 62 + 30
      AND inv_item_sk = i_item_sk
      AND d_date_sk = inv_date_sk
      AND d_date BETWEEN cast('2000-05-25' AS date) AND cast('2000-07-24' AS date)
      AND i_manufact_id IN (129, 270, 821, 423)
      AND inv_quantity_on_hand BETWEEN 100 AND 500
      AND ss_item_sk = i_item_sk
    GROUP BY i_item_id, i_item_desc, i_current_price
    ORDER BY i_item_id
    LIMIT 100""")

  // ---- Q86: web rollup with rank-within-parent ------------------------
  private val q86 = q("""
    SELECT CAST(sum(CAST(round(ws_net_paid * 100) AS BIGINT)) AS BIGINT) AS total_sum_c,
           i_category,
           i_class,
           grouping(i_category) + grouping(i_class) AS lochierarchy,
           rank() OVER (PARTITION BY grouping(i_category) + grouping(i_class),
                          CASE WHEN grouping(i_class) = 0 THEN i_category END
                        ORDER BY sum(CAST(round(ws_net_paid * 100) AS BIGINT)) DESC) AS rank_within_parent
    FROM web_sales, date_dim d1, item
    WHERE d1.d_month_seq BETWEEN 1200 AND 1200 + 11
      AND d1.d_date_sk = ws_sold_date_sk
      AND i_item_sk = ws_item_sk
    GROUP BY rollup(i_category, i_class)
    ORDER BY lochierarchy DESC NULLS FIRST,
             CASE WHEN grouping(i_category) + grouping(i_class) = 0 THEN i_category END NULLS FIRST,
             rank_within_parent NULLS FIRST,
             i_category NULLS FIRST, i_class NULLS FIRST
    LIMIT 100""")

  // ---- Q22: inventory quantity-on-hand rollup -------------------------
  private val q22 = q("""
    SELECT i_product_name, i_brand, i_class, i_category,
           round(avg(inv_quantity_on_hand), 6) qoh
    FROM inventory, date_dim, item
    WHERE inv_date_sk = d_date_sk
      AND inv_item_sk = i_item_sk
      AND d_month_seq BETWEEN 1200 AND 1200 + 11
    GROUP BY rollup(i_product_name, i_brand, i_class, i_category)
    ORDER BY qoh NULLS FIRST, i_product_name NULLS FIRST, i_brand NULLS FIRST,
             i_class NULLS FIRST, i_category NULLS FIRST
    LIMIT 100""", headline = true)

  // ---- Q28: six quantity-band list-price stats (cross join) -----------
  private def q28band(i: Int, qlo: Int, qhi: Int, lp: Int, cp: Int, wc: Int): String = s"""
      (SELECT round(avg(CAST(round(ss_list_price * 100) AS BIGINT)) / 100.0, 6) B${i}_LP,
              count(ss_list_price) B${i}_CNT,
              CAST(count(DISTINCT ss_list_price) AS BIGINT) B${i}_CNTD
       FROM store_sales
       WHERE ss_quantity BETWEEN $qlo AND $qhi
         AND (ss_list_price BETWEEN $lp AND $lp + 10
              OR ss_coupon_amt BETWEEN $cp AND $cp + 1000
              OR ss_wholesale_cost BETWEEN $wc AND $wc + 20)) B$i"""

  private val q28 = q(s"""
    SELECT * FROM
    ${q28band(1, 0, 5, 8, 459, 57)},
    ${q28band(2, 6, 10, 90, 2323, 31)},
    ${q28band(3, 11, 15, 142, 12214, 79)},
    ${q28band(4, 16, 20, 135, 6071, 38)},
    ${q28band(5, 21, 25, 122, 836, 17)},
    ${q28band(6, 26, 30, 154, 7326, 7)}
    LIMIT 100""")

  // ---- Q30: web returners above 1.2x their state's average ------------
  private val q30 = q("""
    WITH customer_total_return AS
      (SELECT wr_returning_customer_sk AS ctr_customer_sk,
              ca_state AS ctr_state,
              sum(CAST(round(wr_return_amt * 100) AS BIGINT)) AS ctr_total_return
       FROM web_returns, date_dim, customer_address
       WHERE wr_returned_date_sk = d_date_sk
         AND d_year = 2002
         AND wr_returning_addr_sk = ca_address_sk
       GROUP BY wr_returning_customer_sk, ca_state)
    SELECT c_customer_id, c_salutation, c_first_name, c_last_name,
           c_preferred_cust_flag, c_birth_day, c_birth_month, c_birth_year,
           c_birth_country, c_login, c_email_address, c_last_review_date_sk,
           CAST(ctr_total_return AS BIGINT) AS ctr_total_return
    FROM customer_total_return ctr1, customer_address, customer
    WHERE ctr1.ctr_total_return >
        (SELECT avg(ctr_total_return) * 1.2
         FROM customer_total_return ctr2
         WHERE ctr1.ctr_state = ctr2.ctr_state)
      AND ca_address_sk = c_current_addr_sk
      AND ca_state = 'GA'
      AND ctr1.ctr_customer_sk = c_customer_sk
    ORDER BY c_customer_id NULLS FIRST, c_salutation NULLS FIRST,
             c_first_name NULLS FIRST, c_last_name NULLS FIRST,
             c_preferred_cust_flag NULLS FIRST, c_birth_day NULLS FIRST,
             c_birth_month NULLS FIRST, c_birth_year NULLS FIRST,
             c_birth_country NULLS FIRST, c_login NULLS FIRST,
             c_email_address NULLS FIRST, c_last_review_date_sk NULLS FIRST,
             ctr_total_return NULLS FIRST
    LIMIT 100""")

  // ---- Q32: catalog excess discounts (correlated 1.3x average) --------
  private val q32 = q("""
    SELECT CAST(sum(CAST(round(cs_ext_discount_amt * 100) AS BIGINT)) AS BIGINT) AS excess_discount_c
    FROM catalog_sales, item, date_dim
    WHERE i_manufact_id = 977
      AND i_item_sk = cs_item_sk
      AND d_date BETWEEN '2000-01-27' AND cast('2000-04-26' AS date)
      AND d_date_sk = cs_sold_date_sk
      AND cs_ext_discount_amt >
        (SELECT 1.3 * avg(cs_ext_discount_amt)
         FROM catalog_sales, date_dim
         WHERE cs_item_sk = i_item_sk
           AND d_date BETWEEN '2000-01-27' AND cast('2000-04-26' AS date)
           AND d_date_sk = cs_sold_date_sk)
    LIMIT 100""")

  // ---- Q33/Q56/Q60: three-channel totals for an item slice ------------
  // (i_manufact_id tiebreaker added to the LIMIT ORDER so the cut is
  // deterministic across engines — ties on total are common)
  private def threeChannel(groupCol: String, itemFilter: String, when_ : String,
                           orderBy: String): String = s"""
    WITH ss AS
      (SELECT $groupCol, sum(CAST(round(ss_ext_sales_price * 100) AS BIGINT)) total_sales
       FROM store_sales, date_dim, customer_address, item
       WHERE $groupCol IN (SELECT $groupCol FROM item WHERE $itemFilter)
         AND ss_item_sk = i_item_sk
         AND ss_sold_date_sk = d_date_sk
         AND $when_
         AND ss_addr_sk = ca_address_sk
         AND ca_gmt_offset = -5
       GROUP BY $groupCol),
         cs AS
      (SELECT $groupCol, sum(CAST(round(cs_ext_sales_price * 100) AS BIGINT)) total_sales
       FROM catalog_sales, date_dim, customer_address, item
       WHERE $groupCol IN (SELECT $groupCol FROM item WHERE $itemFilter)
         AND cs_item_sk = i_item_sk
         AND cs_sold_date_sk = d_date_sk
         AND $when_
         AND cs_bill_addr_sk = ca_address_sk
         AND ca_gmt_offset = -5
       GROUP BY $groupCol),
         ws AS
      (SELECT $groupCol, sum(CAST(round(ws_ext_sales_price * 100) AS BIGINT)) total_sales
       FROM web_sales, date_dim, customer_address, item
       WHERE $groupCol IN (SELECT $groupCol FROM item WHERE $itemFilter)
         AND ws_item_sk = i_item_sk
         AND ws_sold_date_sk = d_date_sk
         AND $when_
         AND ws_bill_addr_sk = ca_address_sk
         AND ca_gmt_offset = -5
       GROUP BY $groupCol)
    SELECT $groupCol,
           CAST(sum(total_sales) AS BIGINT) total_sales_c
    FROM (SELECT * FROM ss UNION ALL SELECT * FROM cs UNION ALL SELECT * FROM ws) tmp1
    GROUP BY $groupCol
    ORDER BY $orderBy
    LIMIT 100"""

  private val q33 = q(threeChannel("i_manufact_id",
    "i_category IN ('Electronics')", "d_year = 1998 AND d_moy = 5",
    "total_sales_c, i_manufact_id"))
  private val q56 = q(threeChannel("i_item_id",
    "i_color IN ('slate', 'blanched', 'burnished')", "d_year = 2001 AND d_moy = 2",
    "total_sales_c NULLS FIRST, i_item_id NULLS FIRST"))
  private val q60 = q(threeChannel("i_item_id",
    "i_category = 'Music'", "d_year = 1998 AND d_moy = 9",
    "i_item_id, total_sales_c"))

  // ---- Q40: catalog sales net of returns around a date ----------------
  private val q40 = q("""
    SELECT w_state,
           i_item_id,
           CAST(sum(CASE WHEN (cast(d_date AS date) < CAST('2000-03-11' AS date))
                         THEN CAST(round((cs_sales_price - coalesce(cr_refunded_cash, 0)) * 100) AS BIGINT)
                         ELSE 0 END) AS BIGINT) AS sales_before_c,
           CAST(sum(CASE WHEN (cast(d_date AS date) >= CAST('2000-03-11' AS date))
                         THEN CAST(round((cs_sales_price - coalesce(cr_refunded_cash, 0)) * 100) AS BIGINT)
                         ELSE 0 END) AS BIGINT) AS sales_after_c
    FROM catalog_sales
    LEFT OUTER JOIN catalog_returns ON (cs_order_number = cr_order_number
                                        AND cs_item_sk = cr_item_sk),
         warehouse, item, date_dim
    WHERE i_current_price BETWEEN 0.99 AND 1.49
      AND i_item_sk = cs_item_sk
      AND cs_warehouse_sk = w_warehouse_sk
      AND cs_sold_date_sk = d_date_sk
      AND d_date BETWEEN CAST('2000-02-10' AS date) AND CAST('2000-04-10' AS date)
    GROUP BY w_state, i_item_id
    ORDER BY w_state, i_item_id
    LIMIT 100""")

  // ---- Q44: best/worst performing items by rank pairing ---------------
  private val q44 = q("""
    SELECT asceding.rnk,
           i1.i_product_name best_performing,
           i2.i_product_name worst_performing
    FROM
      (SELECT * FROM
         (SELECT item_sk, rank() OVER (ORDER BY rank_col ASC) rnk
          FROM
            (SELECT ss_item_sk item_sk,
                    avg(CAST(round(ss_net_profit * 100) AS BIGINT)) rank_col
             FROM store_sales ss1
             WHERE ss_store_sk = 4
             GROUP BY ss_item_sk
             HAVING avg(CAST(round(ss_net_profit * 100) AS BIGINT)) > 0.9 *
               (SELECT avg(CAST(round(ss_net_profit * 100) AS BIGINT)) rank_col
                FROM store_sales
                WHERE ss_store_sk = 4
                  AND ss_addr_sk IS NULL
                GROUP BY ss_store_sk)) V1) V11
       WHERE rnk < 11) asceding,
      (SELECT * FROM
         (SELECT item_sk, rank() OVER (ORDER BY rank_col DESC) rnk
          FROM
            (SELECT ss_item_sk item_sk,
                    avg(CAST(round(ss_net_profit * 100) AS BIGINT)) rank_col
             FROM store_sales ss1
             WHERE ss_store_sk = 4
             GROUP BY ss_item_sk
             HAVING avg(CAST(round(ss_net_profit * 100) AS BIGINT)) > 0.9 *
               (SELECT avg(CAST(round(ss_net_profit * 100) AS BIGINT)) rank_col
                FROM store_sales
                WHERE ss_store_sk = 4
                  AND ss_addr_sk IS NULL
                GROUP BY ss_store_sk)) V2) V21
       WHERE rnk < 11) descending,
         item i1, item i2
    WHERE asceding.rnk = descending.rnk
      AND i1.i_item_sk = asceding.item_sk
      AND i2.i_item_sk = descending.item_sk
    ORDER BY asceding.rnk, best_performing, worst_performing
    LIMIT 100""")

  // ---- Q57: catalog monthly deviation with lag/lead (Q47 analog) ------
  private val q57 = q("""
    WITH v1 AS
      (SELECT i_category, i_brand, cc_name, d_year, d_moy,
              CAST(sum(CAST(round(cs_sales_price * 100) AS BIGINT)) AS BIGINT) sum_sales_c,
              round(avg(sum(CAST(round(cs_sales_price * 100) AS BIGINT)))
                OVER (PARTITION BY i_category, i_brand, cc_name, d_year), 4) avg_monthly_sales_c,
              rank() OVER (PARTITION BY i_category, i_brand, cc_name
                           ORDER BY d_year, d_moy) rn
       FROM item, catalog_sales, date_dim, call_center
       WHERE cs_item_sk = i_item_sk
         AND cs_sold_date_sk = d_date_sk
         AND cc_call_center_sk = cs_call_center_sk
         AND (d_year = 1999
              OR (d_year = 1999 - 1 AND d_moy = 12)
              OR (d_year = 1999 + 1 AND d_moy = 1))
       GROUP BY i_category, i_brand, cc_name, d_year, d_moy),
         v2 AS
      (SELECT v1.i_category, v1.i_brand, v1.cc_name, v1.d_year, v1.d_moy,
              v1.avg_monthly_sales_c, v1.sum_sales_c,
              v1_lag.sum_sales_c psum_c,
              v1_lead.sum_sales_c nsum_c
       FROM v1, v1 v1_lag, v1 v1_lead
       WHERE v1.i_category = v1_lag.i_category
         AND v1.i_category = v1_lead.i_category
         AND v1.i_brand = v1_lag.i_brand
         AND v1.i_brand = v1_lead.i_brand
         AND v1.cc_name = v1_lag.cc_name
         AND v1.cc_name = v1_lead.cc_name
         AND v1.rn = v1_lag.rn + 1
         AND v1.rn = v1_lead.rn - 1)
    SELECT *
    FROM v2
    WHERE d_year = 1999
      AND avg_monthly_sales_c > 0
      AND CASE WHEN avg_monthly_sales_c > 0
               THEN abs(sum_sales_c - avg_monthly_sales_c) / avg_monthly_sales_c
               ELSE NULL END > 0.1
    ORDER BY sum_sales_c - avg_monthly_sales_c NULLS FIRST, 1, 2, 3, 4, 5, 6, 7, 8, 9
    LIMIT 100""")

  // ---- Q63: manager monthly deviation (Q53 analog) --------------------
  private val q63 = q("""
    SELECT *
    FROM
      (SELECT i_manager_id,
              CAST(sum(CAST(round(ss_sales_price * 100) AS BIGINT)) AS BIGINT) sum_sales_c,
              round(avg(sum(CAST(round(ss_sales_price * 100) AS BIGINT)))
                OVER (PARTITION BY i_manager_id), 4) avg_monthly_sales_c
       FROM item, store_sales, date_dim, store
       WHERE ss_item_sk = i_item_sk
         AND ss_sold_date_sk = d_date_sk
         AND ss_store_sk = s_store_sk
         AND d_month_seq IN (1200, 1200+1, 1200+2, 1200+3, 1200+4, 1200+5,
                             1200+6, 1200+7, 1200+8, 1200+9, 1200+10, 1200+11)
         AND ((i_category IN ('Books', 'Children', 'Electronics')
               AND i_class IN ('personal', 'portable', 'reference', 'self-help')
               AND i_brand IN ('scholaramalgamalg #14', 'scholaramalgamalg #7',
                               'exportiunivamalg #9', 'scholaramalgamalg #9'))
              OR (i_category IN ('Women', 'Music', 'Men')
                  AND i_class IN ('accessories', 'classical', 'fragrances', 'pants')
                  AND i_brand IN ('amalgimporto #1', 'edu packscholar #1',
                                  'exportiimporto #1', 'importoamalg #1')))
       GROUP BY i_manager_id, d_moy) tmp1
    WHERE CASE WHEN avg_monthly_sales_c > 0
               THEN ABS(sum_sales_c - avg_monthly_sales_c) / avg_monthly_sales_c
               ELSE NULL END > 0.1
    ORDER BY i_manager_id, avg_monthly_sales_c, sum_sales_c
    LIMIT 100""")

  // ---- Q74/Q11: web-growth > store-growth customers (yoy CTE) ---------
  private def yoyGrowth(extra: Boolean): String = {
    val moreCols = if (extra)
      """c_preferred_cust_flag customer_preferred_cust_flag,
         c_birth_country customer_birth_country,
         c_login customer_login,
         c_email_address customer_email_address,""" else ""
    val moreGroup = if (extra)
      "c_preferred_cust_flag, c_birth_country, c_login, c_email_address," else ""
    val sel = if (extra) ", t_s_secyear.customer_preferred_cust_flag" else ""
    val measure = if (extra)
      "sum(CAST(round((%s_ext_list_price - %s_ext_discount_amt) * 100) AS BIGINT))"
    else "sum(CAST(round(%s_net_paid * 100) AS BIGINT))"
    def m(p: String) = measure.replace("%s", p)
    s"""
    WITH year_total AS
      (SELECT c_customer_id customer_id,
              c_first_name customer_first_name,
              c_last_name customer_last_name,
              $moreCols
              d_year dyear,
              ${m("ss")} year_total,
              's' sale_type
       FROM customer, store_sales, date_dim
       WHERE c_customer_sk = ss_customer_sk
         AND ss_sold_date_sk = d_date_sk
         AND d_year IN (2001, 2001+1)
       GROUP BY c_customer_id, c_first_name, c_last_name, $moreGroup d_year
       UNION ALL SELECT c_customer_id customer_id,
              c_first_name customer_first_name,
              c_last_name customer_last_name,
              $moreCols
              d_year dyear,
              ${m("ws")} year_total,
              'w' sale_type
       FROM customer, web_sales, date_dim
       WHERE c_customer_sk = ws_bill_customer_sk
         AND ws_sold_date_sk = d_date_sk
         AND d_year IN (2001, 2001+1)
       GROUP BY c_customer_id, c_first_name, c_last_name, $moreGroup d_year)
    SELECT t_s_secyear.customer_id,
           t_s_secyear.customer_first_name,
           t_s_secyear.customer_last_name
           $sel
    FROM year_total t_s_firstyear, year_total t_s_secyear,
         year_total t_w_firstyear, year_total t_w_secyear
    WHERE t_s_secyear.customer_id = t_s_firstyear.customer_id
      AND t_s_firstyear.customer_id = t_w_secyear.customer_id
      AND t_s_firstyear.customer_id = t_w_firstyear.customer_id
      AND t_s_firstyear.sale_type = 's'
      AND t_w_firstyear.sale_type = 'w'
      AND t_s_secyear.sale_type = 's'
      AND t_w_secyear.sale_type = 'w'
      AND t_s_firstyear.dyear = 2001
      AND t_s_secyear.dyear = 2001+1
      AND t_w_firstyear.dyear = 2001
      AND t_w_secyear.dyear = 2001+1
      AND t_s_firstyear.year_total > 0
      AND t_w_firstyear.year_total > 0
      AND CASE WHEN t_w_firstyear.year_total > 0
               THEN CAST(t_w_secyear.year_total AS DOUBLE) / CAST(t_w_firstyear.year_total AS DOUBLE)
               ELSE NULL END
        > CASE WHEN t_s_firstyear.year_total > 0
               THEN CAST(t_s_secyear.year_total AS DOUBLE) / CAST(t_s_firstyear.year_total AS DOUBLE)
               ELSE NULL END
    ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST
    LIMIT 100"""
  }

  private val q74 = qPersist(yoyGrowth(extra = false), Set("year_total"), headline = true)
  private val q11 = qPersist(yoyGrowth(extra = true), Set("year_total"))

  // ---- Q10/Q35/Q69: demographics of multi-channel shoppers ------------
  private val q10 = q("""
    SELECT cd_gender, cd_marital_status, cd_education_status, count(*) cnt1,
           cd_purchase_estimate, count(*) cnt2, cd_credit_rating, count(*) cnt3,
           cd_dep_count, count(*) cnt4, cd_dep_employed_count, count(*) cnt5,
           cd_dep_college_count, count(*) cnt6
    FROM customer c, customer_address ca, customer_demographics
    WHERE c.c_current_addr_sk = ca.ca_address_sk
      AND ca_county IN ('Rush County', 'Toole County', 'Jefferson County',
                        'Dona Ana County', 'La Porte County')
      AND cd_demo_sk = c.c_current_cdemo_sk
      AND EXISTS
        (SELECT * FROM store_sales, date_dim
         WHERE c.c_customer_sk = ss_customer_sk
           AND ss_sold_date_sk = d_date_sk
           AND d_year = 2002 AND d_moy BETWEEN 1 AND 1+3)
      AND (EXISTS
             (SELECT * FROM web_sales, date_dim
              WHERE c.c_customer_sk = ws_bill_customer_sk
                AND ws_sold_date_sk = d_date_sk
                AND d_year = 2002 AND d_moy BETWEEN 1 AND 1+3)
           OR EXISTS
             (SELECT * FROM catalog_sales, date_dim
              WHERE c.c_customer_sk = cs_ship_customer_sk
                AND cs_sold_date_sk = d_date_sk
                AND d_year = 2002 AND d_moy BETWEEN 1 AND 1+3))
    GROUP BY cd_gender, cd_marital_status, cd_education_status,
             cd_purchase_estimate, cd_credit_rating, cd_dep_count,
             cd_dep_employed_count, cd_dep_college_count
    ORDER BY cd_gender, cd_marital_status, cd_education_status,
             cd_purchase_estimate, cd_credit_rating, cd_dep_count,
             cd_dep_employed_count, cd_dep_college_count
    LIMIT 100""")

  private val q35 = q("""
    SELECT ca_state, cd_gender, cd_marital_status, cd_dep_count,
           count(*) cnt1,
           min(cd_dep_count) min1, max(cd_dep_count) max1,
           round(avg(cd_dep_count), 6) avg1,
           cd_dep_employed_count, count(*) cnt2,
           min(cd_dep_employed_count) min2, max(cd_dep_employed_count) max2,
           round(avg(cd_dep_employed_count), 6) avg2,
           cd_dep_college_count, count(*) cnt3,
           min(cd_dep_college_count) min3, max(cd_dep_college_count) max3,
           round(avg(cd_dep_college_count), 6) avg3
    FROM customer c, customer_address ca, customer_demographics
    WHERE c.c_current_addr_sk = ca.ca_address_sk
      AND cd_demo_sk = c.c_current_cdemo_sk
      AND EXISTS
        (SELECT * FROM store_sales, date_dim
         WHERE c.c_customer_sk = ss_customer_sk
           AND ss_sold_date_sk = d_date_sk
           AND d_year = 2002 AND d_qoy < 4)
      AND (EXISTS
             (SELECT * FROM web_sales, date_dim
              WHERE c.c_customer_sk = ws_bill_customer_sk
                AND ws_sold_date_sk = d_date_sk
                AND d_year = 2002 AND d_qoy < 4)
           OR EXISTS
             (SELECT * FROM catalog_sales, date_dim
              WHERE c.c_customer_sk = cs_ship_customer_sk
                AND cs_sold_date_sk = d_date_sk
                AND d_year = 2002 AND d_qoy < 4))
    GROUP BY ca_state, cd_gender, cd_marital_status, cd_dep_count,
             cd_dep_employed_count, cd_dep_college_count
    ORDER BY ca_state NULLS FIRST, cd_gender NULLS FIRST,
             cd_marital_status NULLS FIRST, cd_dep_count NULLS FIRST,
             cd_dep_employed_count NULLS FIRST, cd_dep_college_count NULLS FIRST
    LIMIT 100""", headline = true)

  private val q69 = q("""
    SELECT cd_gender, cd_marital_status, cd_education_status, count(*) cnt1,
           cd_purchase_estimate, count(*) cnt2, cd_credit_rating, count(*) cnt3
    FROM customer c, customer_address ca, customer_demographics
    WHERE c.c_current_addr_sk = ca.ca_address_sk
      AND ca_state IN ('KY', 'GA', 'NM')
      AND cd_demo_sk = c.c_current_cdemo_sk
      AND EXISTS
        (SELECT * FROM store_sales, date_dim
         WHERE c.c_customer_sk = ss_customer_sk
           AND ss_sold_date_sk = d_date_sk
           AND d_year = 2001 AND d_moy BETWEEN 4 AND 4+2)
      AND (NOT EXISTS
             (SELECT * FROM web_sales, date_dim
              WHERE c.c_customer_sk = ws_bill_customer_sk
                AND ws_sold_date_sk = d_date_sk
                AND d_year = 2001 AND d_moy BETWEEN 4 AND 4+2)
           AND NOT EXISTS
             (SELECT * FROM catalog_sales, date_dim
              WHERE c.c_customer_sk = cs_ship_customer_sk
                AND cs_sold_date_sk = d_date_sk
                AND d_year = 2001 AND d_moy BETWEEN 4 AND 4+2))
    GROUP BY cd_gender, cd_marital_status, cd_education_status,
             cd_purchase_estimate, cd_credit_rating
    ORDER BY cd_gender, cd_marital_status, cd_education_status,
             cd_purchase_estimate, cd_credit_rating
    LIMIT 100""")

  // ---- Q17: quantity statistics across the return path ----------------
  private val q17 = q("""
    SELECT i_item_id,
           i_item_desc,
           s_state,
           count(ss_quantity) AS store_sales_quantitycount,
           round(avg(ss_quantity), 6) AS store_sales_quantityave,
           round(stddev_samp(ss_quantity), 4) AS store_sales_quantitystdev,
           round(stddev_samp(ss_quantity) / avg(ss_quantity), 4) AS store_sales_quantitycov,
           count(sr_return_quantity) AS store_returns_quantitycount,
           round(avg(sr_return_quantity), 6) AS store_returns_quantityave,
           round(stddev_samp(sr_return_quantity), 4) AS store_returns_quantitystdev,
           round(stddev_samp(sr_return_quantity) / avg(sr_return_quantity), 4) AS store_returns_quantitycov,
           count(cs_quantity) AS catalog_sales_quantitycount,
           round(avg(cs_quantity), 6) AS catalog_sales_quantityave,
           round(stddev_samp(cs_quantity), 4) AS catalog_sales_quantitystdev,
           round(stddev_samp(cs_quantity) / avg(cs_quantity), 4) AS catalog_sales_quantitycov
    FROM store_sales, store_returns, catalog_sales,
         date_dim d1, date_dim d2, date_dim d3, store, item
    WHERE d1.d_quarter_name = '2001Q1'
      AND d1.d_date_sk = ss_sold_date_sk
      AND i_item_sk = ss_item_sk
      AND s_store_sk = ss_store_sk
      AND ss_customer_sk = sr_customer_sk
      AND ss_item_sk = sr_item_sk
      AND ss_ticket_number = sr_ticket_number
      AND sr_returned_date_sk = d2.d_date_sk
      AND d2.d_quarter_name IN ('2001Q1', '2001Q2', '2001Q3')
      AND sr_customer_sk = cs_bill_customer_sk
      AND sr_item_sk = cs_item_sk
      AND cs_sold_date_sk = d3.d_date_sk
      AND d3.d_quarter_name IN ('2001Q1', '2001Q2', '2001Q3')
    GROUP BY i_item_id, i_item_desc, s_state
    ORDER BY i_item_id NULLS FIRST, i_item_desc NULLS FIRST, s_state NULLS FIRST
    LIMIT 100""")

  // ---- Q31: counties where web growth outpaces store growth -----------
  private val q31 = q("""
    WITH ss AS
      (SELECT ca_county, d_qoy, d_year,
              sum(CAST(round(ss_ext_sales_price * 100) AS BIGINT)) AS store_sales
       FROM store_sales, date_dim, customer_address
       WHERE ss_sold_date_sk = d_date_sk
         AND ss_addr_sk = ca_address_sk
       GROUP BY ca_county, d_qoy, d_year),
         ws AS
      (SELECT ca_county, d_qoy, d_year,
              sum(CAST(round(ws_ext_sales_price * 100) AS BIGINT)) AS web_sales
       FROM web_sales, date_dim, customer_address
       WHERE ws_sold_date_sk = d_date_sk
         AND ws_bill_addr_sk = ca_address_sk
       GROUP BY ca_county, d_qoy, d_year)
    SELECT ss1.ca_county,
           ss1.d_year,
           round(CAST(ws2.web_sales AS DOUBLE) / CAST(ws1.web_sales AS DOUBLE), 6) web_q1_q2_increase,
           round(CAST(ss2.store_sales AS DOUBLE) / CAST(ss1.store_sales AS DOUBLE), 6) store_q1_q2_increase,
           round(CAST(ws3.web_sales AS DOUBLE) / CAST(ws2.web_sales AS DOUBLE), 6) web_q2_q3_increase,
           round(CAST(ss3.store_sales AS DOUBLE) / CAST(ss2.store_sales AS DOUBLE), 6) store_q2_q3_increase
    FROM ss ss1, ss ss2, ss ss3, ws ws1, ws ws2, ws ws3
    WHERE ss1.d_qoy = 1 AND ss1.d_year = 2000
      AND ss1.ca_county = ss2.ca_county
      AND ss2.d_qoy = 2 AND ss2.d_year = 2000
      AND ss2.ca_county = ss3.ca_county
      AND ss3.d_qoy = 3 AND ss3.d_year = 2000
      AND ss1.ca_county = ws1.ca_county
      AND ws1.d_qoy = 1 AND ws1.d_year = 2000
      AND ws1.ca_county = ws2.ca_county
      AND ws2.d_qoy = 2 AND ws2.d_year = 2000
      AND ws1.ca_county = ws3.ca_county
      AND ws3.d_qoy = 3 AND ws3.d_year = 2000
      AND CASE WHEN ws1.web_sales > 0
               THEN CAST(ws2.web_sales AS DOUBLE) / CAST(ws1.web_sales AS DOUBLE)
               ELSE NULL END
        > CASE WHEN ss1.store_sales > 0
               THEN CAST(ss2.store_sales AS DOUBLE) / CAST(ss1.store_sales AS DOUBLE)
               ELSE NULL END
      AND CASE WHEN ws2.web_sales > 0
               THEN CAST(ws3.web_sales AS DOUBLE) / CAST(ws2.web_sales AS DOUBLE)
               ELSE NULL END
        > CASE WHEN ss2.store_sales > 0
               THEN CAST(ss3.store_sales AS DOUBLE) / CAST(ss2.store_sales AS DOUBLE)
               ELSE NULL END
    ORDER BY ss1.ca_county""")

  // ---- Q4: customers whose catalog growth beats store AND web ---------
  // year_total is the official ((lp - wc - disc) + sp) / 2 measure kept
  // in exact integer cents WITHOUT the /2 (a positive constant factor
  // changes neither the >0 guards nor the ratio comparisons, and odd
  // cents / 2 would force engine-specific rounding).
  private val q4 = qPersist("""
    WITH year_total AS
      (SELECT c_customer_id customer_id,
              c_first_name customer_first_name,
              c_last_name customer_last_name,
              c_preferred_cust_flag customer_preferred_cust_flag,
              d_year dyear,
              sum(CAST(round((ss_ext_list_price - ss_ext_wholesale_cost - ss_ext_discount_amt + ss_ext_sales_price) * 100) AS BIGINT)) year_total,
              's' sale_type
       FROM customer, store_sales, date_dim
       WHERE c_customer_sk = ss_customer_sk AND ss_sold_date_sk = d_date_sk
         AND d_year IN (2001, 2001+1)
       GROUP BY c_customer_id, c_first_name, c_last_name,
                c_preferred_cust_flag, d_year
       UNION ALL
       SELECT c_customer_id customer_id,
              c_first_name customer_first_name,
              c_last_name customer_last_name,
              c_preferred_cust_flag customer_preferred_cust_flag,
              d_year dyear,
              sum(CAST(round((cs_ext_list_price - cs_ext_wholesale_cost - cs_ext_discount_amt + cs_ext_sales_price) * 100) AS BIGINT)) year_total,
              'c' sale_type
       FROM customer, catalog_sales, date_dim
       WHERE c_customer_sk = cs_bill_customer_sk AND cs_sold_date_sk = d_date_sk
         AND d_year IN (2001, 2001+1)
       GROUP BY c_customer_id, c_first_name, c_last_name,
                c_preferred_cust_flag, d_year
       UNION ALL
       SELECT c_customer_id customer_id,
              c_first_name customer_first_name,
              c_last_name customer_last_name,
              c_preferred_cust_flag customer_preferred_cust_flag,
              d_year dyear,
              sum(CAST(round((ws_ext_list_price - ws_ext_wholesale_cost - ws_ext_discount_amt + ws_ext_sales_price) * 100) AS BIGINT)) year_total,
              'w' sale_type
       FROM customer, web_sales, date_dim
       WHERE c_customer_sk = ws_bill_customer_sk AND ws_sold_date_sk = d_date_sk
         AND d_year IN (2001, 2001+1)
       GROUP BY c_customer_id, c_first_name, c_last_name,
                c_preferred_cust_flag, d_year)
    SELECT t_s_secyear.customer_id,
           t_s_secyear.customer_first_name,
           t_s_secyear.customer_last_name,
           t_s_secyear.customer_preferred_cust_flag
    FROM year_total t_s_firstyear, year_total t_s_secyear,
         year_total t_c_firstyear, year_total t_c_secyear,
         year_total t_w_firstyear, year_total t_w_secyear
    WHERE t_s_secyear.customer_id = t_s_firstyear.customer_id
      AND t_s_firstyear.customer_id = t_c_secyear.customer_id
      AND t_s_firstyear.customer_id = t_c_firstyear.customer_id
      AND t_s_firstyear.customer_id = t_w_firstyear.customer_id
      AND t_s_firstyear.customer_id = t_w_secyear.customer_id
      AND t_s_firstyear.sale_type = 's'
      AND t_c_firstyear.sale_type = 'c'
      AND t_w_firstyear.sale_type = 'w'
      AND t_s_secyear.sale_type = 's'
      AND t_c_secyear.sale_type = 'c'
      AND t_w_secyear.sale_type = 'w'
      AND t_s_firstyear.dyear = 2001
      AND t_s_secyear.dyear = 2001+1
      AND t_c_firstyear.dyear = 2001
      AND t_c_secyear.dyear = 2001+1
      AND t_w_firstyear.dyear = 2001
      AND t_w_secyear.dyear = 2001+1
      AND t_s_firstyear.year_total > 0
      AND t_c_firstyear.year_total > 0
      AND t_w_firstyear.year_total > 0
      AND CASE WHEN t_c_firstyear.year_total > 0
               THEN CAST(t_c_secyear.year_total AS DOUBLE) / CAST(t_c_firstyear.year_total AS DOUBLE)
               ELSE NULL END
        > CASE WHEN t_s_firstyear.year_total > 0
               THEN CAST(t_s_secyear.year_total AS DOUBLE) / CAST(t_s_firstyear.year_total AS DOUBLE)
               ELSE NULL END
      AND CASE WHEN t_c_firstyear.year_total > 0
               THEN CAST(t_c_secyear.year_total AS DOUBLE) / CAST(t_c_firstyear.year_total AS DOUBLE)
               ELSE NULL END
        > CASE WHEN t_w_firstyear.year_total > 0
               THEN CAST(t_w_secyear.year_total AS DOUBLE) / CAST(t_w_firstyear.year_total AS DOUBLE)
               ELSE NULL END
    ORDER BY t_s_secyear.customer_id NULLS FIRST,
             t_s_secyear.customer_first_name NULLS FIRST,
             t_s_secyear.customer_last_name NULLS FIRST,
             t_s_secyear.customer_preferred_cust_flag NULLS FIRST
    LIMIT 100""", Set("year_total"), headline = true)

  // ---- Q5: sales/returns/profit rollup across all three channels ------
  private val q5 = q("""
    WITH ssr AS
      (SELECT s_store_id,
              sum(sales_price_c) AS sales_c,
              sum(profit_c) AS profit_c,
              sum(return_amt_c) AS returns_c,
              sum(net_loss_c) AS profit_loss_c
       FROM
         (SELECT ss_store_sk AS store_sk, ss_sold_date_sk AS date_sk,
                 CAST(round(ss_ext_sales_price * 100) AS BIGINT) AS sales_price_c,
                 CAST(round(ss_net_profit * 100) AS BIGINT) AS profit_c,
                 CAST(0 AS BIGINT) AS return_amt_c, CAST(0 AS BIGINT) AS net_loss_c
          FROM store_sales
          UNION ALL
          SELECT sr_store_sk, sr_returned_date_sk,
                 CAST(0 AS BIGINT), CAST(0 AS BIGINT),
                 CAST(round(sr_return_amt * 100) AS BIGINT),
                 CAST(round(sr_net_loss * 100) AS BIGINT)
          FROM store_returns) salesreturns, date_dim, store
       WHERE date_sk = d_date_sk
         AND d_date BETWEEN CAST('2000-08-23' AS DATE) AND CAST('2000-09-06' AS DATE)
         AND store_sk = s_store_sk
       GROUP BY s_store_id),
    csr AS
      (SELECT cp_catalog_page_id,
              sum(sales_price_c) AS sales_c,
              sum(profit_c) AS profit_c,
              sum(return_amt_c) AS returns_c,
              sum(net_loss_c) AS profit_loss_c
       FROM
         (SELECT cs_catalog_page_sk AS page_sk, cs_sold_date_sk AS date_sk,
                 CAST(round(cs_ext_sales_price * 100) AS BIGINT) AS sales_price_c,
                 CAST(round(cs_net_profit * 100) AS BIGINT) AS profit_c,
                 CAST(0 AS BIGINT) AS return_amt_c, CAST(0 AS BIGINT) AS net_loss_c
          FROM catalog_sales
          UNION ALL
          SELECT cr_catalog_page_sk, cr_returned_date_sk,
                 CAST(0 AS BIGINT), CAST(0 AS BIGINT),
                 CAST(round(cr_return_amount * 100) AS BIGINT),
                 CAST(round(cr_net_loss * 100) AS BIGINT)
          FROM catalog_returns) salesreturns, date_dim, catalog_page
       WHERE date_sk = d_date_sk
         AND d_date BETWEEN CAST('2000-08-23' AS DATE) AND CAST('2000-09-06' AS DATE)
         AND page_sk = cp_catalog_page_sk
       GROUP BY cp_catalog_page_id),
    wsr AS
      (SELECT web_site_id,
              sum(sales_price_c) AS sales_c,
              sum(profit_c) AS profit_c,
              sum(return_amt_c) AS returns_c,
              sum(net_loss_c) AS profit_loss_c
       FROM
         (SELECT ws_web_site_sk AS wsr_web_site_sk, ws_sold_date_sk AS date_sk,
                 CAST(round(ws_ext_sales_price * 100) AS BIGINT) AS sales_price_c,
                 CAST(round(ws_net_profit * 100) AS BIGINT) AS profit_c,
                 CAST(0 AS BIGINT) AS return_amt_c, CAST(0 AS BIGINT) AS net_loss_c
          FROM web_sales
          UNION ALL
          SELECT ws_web_site_sk, wr_returned_date_sk,
                 CAST(0 AS BIGINT), CAST(0 AS BIGINT),
                 CAST(round(wr_return_amt * 100) AS BIGINT),
                 CAST(round(wr_net_loss * 100) AS BIGINT)
          FROM web_returns
          LEFT OUTER JOIN web_sales ON (wr_item_sk = ws_item_sk
                                        AND wr_order_number = ws_order_number)) salesreturns,
            date_dim, web_site
       WHERE date_sk = d_date_sk
         AND d_date BETWEEN CAST('2000-08-23' AS DATE) AND CAST('2000-09-06' AS DATE)
         AND wsr_web_site_sk = web_site_sk
       GROUP BY web_site_id)
    SELECT channel, id,
           CAST(sum(sales_c) AS BIGINT) AS sales_c,
           CAST(sum(returns_c) AS BIGINT) AS returns_c,
           CAST(sum(profit_c) AS BIGINT) AS profit_c
    FROM
      (SELECT 'store channel' AS channel, concat('store', s_store_id) AS id,
              sales_c, returns_c, (profit_c - profit_loss_c) AS profit_c
       FROM ssr
       UNION ALL
       SELECT 'catalog channel', concat('catalog_page', cp_catalog_page_id),
              sales_c, returns_c, (profit_c - profit_loss_c)
       FROM csr
       UNION ALL
       SELECT 'web channel', concat('web_site', web_site_id),
              sales_c, returns_c, (profit_c - profit_loss_c)
       FROM wsr) x
    GROUP BY ROLLUP (channel, id)
    ORDER BY channel NULLS FIRST, id NULLS FIRST
    LIMIT 100""", headline = true)

  // ---- Q8: store profit where the store shares a zip-prefix with -----
  // preferred-customer neighborhoods (IN-list INTERSECT dense zips).
  // Zip constants and the HAVING threshold are adapted to the generated
  // domain (hash-uniform 5-digit zips) so the intersection is non-empty
  // at sf0.01; the 2-digit prefix match keeps the shape of the official
  // query.
  private val q8 = q("""
    SELECT s_store_name,
           CAST(sum(CAST(round(ss_net_profit * 100) AS BIGINT)) AS BIGINT) profit_c
    FROM store_sales, date_dim, store,
      (SELECT ca_zip
       FROM
         (SELECT substring(ca_zip, 1, 5) ca_zip
          FROM customer_address
          WHERE substring(ca_zip, 1, 5) IN
            ('88781', '12701', '12837', '63215', '88405', '12650', '12765',
             '63647', '68654', '68756', '88349', '88827', '47213', '20437',
             '33850', '50506', '58084', '64447', '66728', '74985', '83765',
             '89064', '20707', '21883', '23036', '26155', '26431', '26611')
          INTERSECT
          SELECT ca_zip
          FROM
            (SELECT substring(ca_zip, 1, 5) ca_zip, count(*) cnt
             FROM customer_address, customer
             WHERE ca_address_sk = c_current_addr_sk
               AND c_preferred_cust_flag = 'Y'
             GROUP BY ca_zip
             HAVING count(*) > 1) A1) A2) V1
    WHERE ss_store_sk = s_store_sk
      AND ss_sold_date_sk = d_date_sk
      AND d_qoy = 2
      AND d_year = 1998
      AND (substring(s_zip, 1, 2) = substring(V1.ca_zip, 1, 2))
    GROUP BY s_store_name
    ORDER BY s_store_name
    LIMIT 100""")

  // ---- Q18: catalog purchase averages by geography rollup -------------
  private val q18 = q("""
    SELECT i_item_id, ca_country, ca_state, ca_county,
           round(avg(cs_quantity), 6) agg1,
           round(avg(CAST(round(cs_list_price * 100) AS BIGINT)) / 100.0, 6) agg2,
           round(avg(CAST(round(cs_coupon_amt * 100) AS BIGINT)) / 100.0, 6) agg3,
           round(avg(CAST(round(cs_sales_price * 100) AS BIGINT)) / 100.0, 6) agg4,
           round(avg(CAST(round(cs_net_profit * 100) AS BIGINT)) / 100.0, 6) agg5,
           round(avg(c_birth_year), 6) agg6,
           round(avg(cd1.cd_dep_count), 6) agg7
    FROM catalog_sales, customer_demographics cd1,
         customer_demographics cd2, customer, customer_address,
         date_dim, item
    WHERE cs_sold_date_sk = d_date_sk
      AND cs_item_sk = i_item_sk
      AND cs_bill_cdemo_sk = cd1.cd_demo_sk
      AND cs_bill_customer_sk = c_customer_sk
      AND cd1.cd_gender = 'F'
      AND cd1.cd_education_status = 'Unknown'
      AND c_current_cdemo_sk = cd2.cd_demo_sk
      AND c_current_addr_sk = ca_address_sk
      AND c_birth_month IN (1, 6, 8, 9, 12, 2)
      AND d_year = 1998
      AND ca_state IN ('VA', 'TX', 'MO', 'OH', 'KY', 'GA')
    GROUP BY ROLLUP (i_item_id, ca_country, ca_state, ca_county)
    ORDER BY ca_country NULLS FIRST, ca_state NULLS FIRST,
             ca_county NULLS FIRST, i_item_id NULLS FIRST
    LIMIT 100""")

  // ---- Q39: inventory demand-variability pairs across months ----------
  private val q39 = q("""
    WITH inv AS
      (SELECT w_warehouse_name, w_warehouse_sk, i_item_sk, d_moy,
              stdev, mean,
              CASE mean WHEN 0 THEN NULL ELSE stdev / mean END cov
       FROM
         (SELECT w_warehouse_name, w_warehouse_sk, i_item_sk, d_moy,
                 stddev_samp(inv_quantity_on_hand) * 1.000 stdev,
                 avg(inv_quantity_on_hand) mean
          FROM inventory, item, warehouse, date_dim
          WHERE inv_item_sk = i_item_sk
            AND inv_warehouse_sk = w_warehouse_sk
            AND inv_date_sk = d_date_sk
            AND d_year = 2001
          GROUP BY w_warehouse_name, w_warehouse_sk, i_item_sk, d_moy) foo
       WHERE CASE mean WHEN 0 THEN 0 ELSE stdev / mean END > 1)
    SELECT inv1.w_warehouse_sk wsk1, inv1.i_item_sk isk1,
           inv1.d_moy dmoy1, inv1.mean mean1, round(inv1.cov, 3) cov1,
           inv2.w_warehouse_sk wsk2, inv2.i_item_sk isk2,
           inv2.d_moy dmoy2, inv2.mean mean2, round(inv2.cov, 3) cov2
    FROM inv inv1, inv inv2
    WHERE inv1.i_item_sk = inv2.i_item_sk
      AND inv1.w_warehouse_sk = inv2.w_warehouse_sk
      AND inv1.d_moy = 1
      AND inv2.d_moy = 1+1""")

  // ---- Q71: brand revenue at breakfast/dinner across channels ---------
  private val q71 = q("""
    SELECT i_brand_id brand_id, i_brand brand, t_hour, t_minute,
           CAST(sum(ext_price_c) AS BIGINT) ext_price_c
    FROM item,
      (SELECT CAST(round(ws_ext_sales_price * 100) AS BIGINT) AS ext_price_c,
              ws_sold_date_sk AS sold_date_sk,
              ws_item_sk AS sold_item_sk,
              ws_sold_time_sk AS time_sk
       FROM web_sales, date_dim
       WHERE d_date_sk = ws_sold_date_sk AND d_moy = 11 AND d_year = 1999
       UNION ALL
       SELECT CAST(round(cs_ext_sales_price * 100) AS BIGINT),
              cs_sold_date_sk, cs_item_sk, cs_sold_time_sk
       FROM catalog_sales, date_dim
       WHERE d_date_sk = cs_sold_date_sk AND d_moy = 11 AND d_year = 1999
       UNION ALL
       SELECT CAST(round(ss_ext_sales_price * 100) AS BIGINT),
              ss_sold_date_sk, ss_item_sk, ss_sold_time_sk
       FROM store_sales, date_dim
       WHERE d_date_sk = ss_sold_date_sk AND d_moy = 11 AND d_year = 1999) tmp,
      time_dim
    WHERE sold_item_sk = i_item_sk
      AND i_manager_id = 1
      AND time_sk = t_time_sk
      AND (t_meal_time = 'breakfast' OR t_meal_time = 'dinner')
    GROUP BY i_brand, i_brand_id, t_hour, t_minute""")

  // ---- Q84: customers in an income band with store returns ------------
  // (city constant adapted to the generated domain; ORDER BY covers all
  // output columns so the LIMIT cut is stable under duplicate rows)
  private val q84 = q("""
    SELECT c_customer_id AS customer_id,
           concat(concat(coalesce(c_last_name, ''), ', '),
                  coalesce(c_first_name, '')) AS customername
    FROM customer, customer_address, customer_demographics,
         household_demographics, income_band, store_returns
    WHERE ca_city = 'Fairview'
      AND c_current_addr_sk = ca_address_sk
      AND ib_lower_bound >= 38128
      AND ib_upper_bound <= 38128 + 50000
      AND ib_income_band_sk = hd_income_band_sk
      AND cd_demo_sk = c_current_cdemo_sk
      AND hd_demo_sk = c_current_hdemo_sk
      AND sr_cdemo_sk = cd_demo_sk
    ORDER BY c_customer_id NULLS FIRST, customername NULLS FIRST
    LIMIT 100""")

  // ---- Q91: call-center return losses for targeted demographics -------
  private val q91 = q("""
    SELECT cc_call_center_id call_center, cc_name call_center_name,
           cc_manager manager,
           CAST(sum(CAST(round(cr_net_loss * 100) AS BIGINT)) AS BIGINT) returns_loss_c
    FROM call_center, catalog_returns, date_dim, customer,
         customer_address, customer_demographics, household_demographics
    WHERE cr_call_center_sk = cc_call_center_sk
      AND cr_returned_date_sk = d_date_sk
      AND cr_returning_customer_sk = c_customer_sk
      AND cd_demo_sk = c_current_cdemo_sk
      AND hd_demo_sk = c_current_hdemo_sk
      AND ca_address_sk = c_current_addr_sk
      AND d_year = 1999
      AND ((cd_marital_status = 'M' AND cd_education_status = 'Unknown')
           OR (cd_marital_status = 'W' AND cd_education_status = 'Advanced Degree'))
      AND hd_buy_potential LIKE 'Unknown%'
      AND ca_gmt_offset IN (-5, -6, -7, -8)
    GROUP BY cc_call_center_id, cc_name, cc_manager,
             cd_marital_status, cd_education_status""")

  // ---- Q49: worst return ratios per channel (rank + union) ------------
  // (the official `wr_return_amt > 10000` is adapted to > 100 for the
  // generated value range)
  private def q49Channel(alias: String, sales: String, rets: String,
      sp: String, rp: String, ordL: String, ordR: String, amtCol: String,
      qtyRet: String): String = s"""
     (SELECT item, return_ratio, currency_ratio,
             rank() OVER (ORDER BY return_ratio) AS return_rank,
             rank() OVER (ORDER BY currency_ratio) AS currency_rank
      FROM
        (SELECT $sp.${sp}_item_sk AS item,
                (CAST(sum(coalesce($rp.$qtyRet, 0)) AS DOUBLE) /
                 CAST(sum(coalesce($sp.${sp}_quantity, 0)) AS DOUBLE)) AS return_ratio,
                (CAST(sum(coalesce(CAST(round($rp.$amtCol * 100) AS BIGINT), 0)) AS DOUBLE) /
                 CAST(sum(CAST(round($sp.${sp}_net_paid * 100) AS BIGINT)) AS DOUBLE)) AS currency_ratio
         FROM $sales $sp
         LEFT OUTER JOIN $rets $rp ON ($sp.$ordL = $rp.$ordR
                                       AND $sp.${sp}_item_sk = $rp.${rp}_item_sk), date_dim
         WHERE $rp.$amtCol > 100
           AND $sp.${sp}_net_profit > 1
           AND $sp.${sp}_net_paid > 0
           AND $sp.${sp}_quantity > 0
           AND ${sp}_sold_date_sk = d_date_sk
           AND d_year = 2001 AND d_moy = 12
         GROUP BY $sp.${sp}_item_sk) in_$alias) $alias"""

  private val q49 = q(s"""
    SELECT channel, item, return_ratio, return_rank, currency_rank
    FROM
      (SELECT 'web' AS channel, web.item, web.return_ratio,
              web.return_rank, web.currency_rank
       FROM ${q49Channel("web", "web_sales", "web_returns", "ws", "wr",
          "ws_order_number", "wr_order_number", "wr_return_amt", "wr_return_quantity")}
       WHERE (web.return_rank <= 10 OR web.currency_rank <= 10)
       UNION
       SELECT 'catalog' AS channel, cat.item, cat.return_ratio,
              cat.return_rank, cat.currency_rank
       FROM ${q49Channel("cat", "catalog_sales", "catalog_returns", "cs", "cr",
          "cs_order_number", "cr_order_number", "cr_return_amount", "cr_return_quantity")}
       WHERE (cat.return_rank <= 10 OR cat.currency_rank <= 10)
       UNION
       SELECT 'store' AS channel, sts.item, sts.return_ratio,
              sts.return_rank, sts.currency_rank
       FROM ${q49Channel("sts", "store_sales", "store_returns", "ss", "sr",
          "ss_ticket_number", "sr_ticket_number", "sr_return_amt", "sr_return_quantity")}
       WHERE (sts.return_rank <= 10 OR sts.currency_rank <= 10)) u
    ORDER BY channel, return_rank, currency_rank, item
    LIMIT 100""")

  // ---- Q54: revenue segments of cross-channel maternity shoppers ------
  // (the official (Women, maternity) single-month filter is widened to
  // the category + a two-month window: the generated class vocabulary
  // has no 'maternity' and the county+state store match leaves the
  // official constants with an empty result at sf0.01)
  private val q54 = q("""
    WITH my_customers AS
      (SELECT DISTINCT c_customer_sk, c_current_addr_sk
       FROM
         (SELECT cs_sold_date_sk sold_date_sk,
                 cs_bill_customer_sk customer_sk, cs_item_sk item_sk
          FROM catalog_sales
          UNION ALL
          SELECT ws_sold_date_sk, ws_bill_customer_sk, ws_item_sk
          FROM web_sales) cs_or_ws_sales, item, date_dim, customer
       WHERE sold_date_sk = d_date_sk
         AND item_sk = i_item_sk
         AND i_category = 'Women'
         AND c_customer_sk = cs_or_ws_sales.customer_sk
         AND d_moy BETWEEN 11 AND 12 AND d_year = 1998),
    my_revenue AS
      (SELECT c_customer_sk,
              sum(CAST(round(ss_ext_sales_price * 100) AS BIGINT)) AS revenue_c
       FROM my_customers, store_sales, customer_address, store, date_dim
       WHERE c_current_addr_sk = ca_address_sk
         AND ca_county = s_county AND ca_state = s_state
         AND ss_sold_date_sk = d_date_sk
         AND c_customer_sk = ss_customer_sk
         AND d_month_seq BETWEEN
           (SELECT DISTINCT d_month_seq + 1 FROM date_dim
            WHERE d_year = 1998 AND d_moy = 12)
           AND
           (SELECT DISTINCT d_month_seq + 3 FROM date_dim
            WHERE d_year = 1998 AND d_moy = 12)
       GROUP BY c_customer_sk),
    segments AS
      (SELECT CAST(round(revenue_c / 100.0 / 50) AS INT) AS segment
       FROM my_revenue)
    SELECT segment, CAST(count(*) AS BIGINT) AS num_customers,
           segment * 50 AS segment_base
    FROM segments
    GROUP BY segment
    ORDER BY segment NULLS FIRST, num_customers NULLS FIRST, segment_base
    LIMIT 100""")

  // ---- Q58: items with comparable revenue across all three channels ---
  // (week granularity -> quarter and the 0.9..1.1 band -> 0.5..2: at
  // sf0.01 no item sells in all three channels in one week, so the
  // official constants always return empty)
  private val q58 = q("""
    WITH ss_items AS
      (SELECT i_item_id item_id,
              sum(CAST(round(ss_ext_sales_price * 100) AS BIGINT)) ss_item_rev_c
       FROM store_sales, item, date_dim
       WHERE ss_item_sk = i_item_sk
         AND d_date IN (SELECT d_date FROM date_dim
                        WHERE d_quarter_seq = (SELECT d_quarter_seq FROM date_dim
                                               WHERE d_date = '2000-01-03'))
         AND ss_sold_date_sk = d_date_sk
       GROUP BY i_item_id),
    cs_items AS
      (SELECT i_item_id item_id,
              sum(CAST(round(cs_ext_sales_price * 100) AS BIGINT)) cs_item_rev_c
       FROM catalog_sales, item, date_dim
       WHERE cs_item_sk = i_item_sk
         AND d_date IN (SELECT d_date FROM date_dim
                        WHERE d_quarter_seq = (SELECT d_quarter_seq FROM date_dim
                                               WHERE d_date = '2000-01-03'))
         AND cs_sold_date_sk = d_date_sk
       GROUP BY i_item_id),
    ws_items AS
      (SELECT i_item_id item_id,
              sum(CAST(round(ws_ext_sales_price * 100) AS BIGINT)) ws_item_rev_c
       FROM web_sales, item, date_dim
       WHERE ws_item_sk = i_item_sk
         AND d_date IN (SELECT d_date FROM date_dim
                        WHERE d_quarter_seq = (SELECT d_quarter_seq FROM date_dim
                                               WHERE d_date = '2000-01-03'))
         AND ws_sold_date_sk = d_date_sk
       GROUP BY i_item_id)
    SELECT ss_items.item_id,
           CAST(ss_item_rev_c AS BIGINT) AS ss_item_rev_c,
           round(CAST(ss_item_rev_c AS DOUBLE) / ((ss_item_rev_c + cs_item_rev_c + ws_item_rev_c) / 3) * 100, 6) ss_dev,
           CAST(cs_item_rev_c AS BIGINT) AS cs_item_rev_c,
           round(CAST(cs_item_rev_c AS DOUBLE) / ((ss_item_rev_c + cs_item_rev_c + ws_item_rev_c) / 3) * 100, 6) cs_dev,
           CAST(ws_item_rev_c AS BIGINT) AS ws_item_rev_c,
           round(CAST(ws_item_rev_c AS DOUBLE) / ((ss_item_rev_c + cs_item_rev_c + ws_item_rev_c) / 3) * 100, 6) ws_dev,
           round(CAST(ss_item_rev_c + cs_item_rev_c + ws_item_rev_c AS DOUBLE) / 3, 6) average_c
    FROM ss_items, cs_items, ws_items
    WHERE ss_items.item_id = cs_items.item_id
      AND ss_items.item_id = ws_items.item_id
      AND ss_item_rev_c BETWEEN 0.5 * cs_item_rev_c AND 2 * cs_item_rev_c
      AND ss_item_rev_c BETWEEN 0.5 * ws_item_rev_c AND 2 * ws_item_rev_c
      AND cs_item_rev_c BETWEEN 0.5 * ss_item_rev_c AND 2 * ss_item_rev_c
      AND cs_item_rev_c BETWEEN 0.5 * ws_item_rev_c AND 2 * ws_item_rev_c
      AND ws_item_rev_c BETWEEN 0.5 * ss_item_rev_c AND 2 * ss_item_rev_c
      AND ws_item_rev_c BETWEEN 0.5 * cs_item_rev_c AND 2 * cs_item_rev_c
    ORDER BY ss_items.item_id NULLS FIRST, ss_item_rev_c
    LIMIT 100""")

  // ---- Q66: warehouse monthly shipping report, web + catalog ----------
  // (carrier constants adapted: the generated carrier vocabulary has no
  // 'BARIAN'; 'LATVIAN' keeps the two-carrier IN shape)
  private def q66Channel(tbl: String, p: String, priceCol: String,
      netCol: String): String = {
    val months = Seq("jan", "feb", "mar", "apr", "may", "jun", "jul",
      "aug", "sep", "oct", "nov", "dec")
    val salesCases = months.zipWithIndex.map { case (m, i) =>
      s"sum(CASE WHEN d_moy = ${i + 1} THEN CAST(round($priceCol * 100) AS BIGINT) * ${p}_quantity ELSE 0 END) AS ${m}_sales_c"
    }.mkString(",\n              ")
    val netCases = months.zipWithIndex.map { case (m, i) =>
      s"sum(CASE WHEN d_moy = ${i + 1} THEN CAST(round($netCol * 100) AS BIGINT) * ${p}_quantity ELSE 0 END) AS ${m}_net_c"
    }.mkString(",\n              ")
    s"""SELECT w_warehouse_name, w_warehouse_sq_ft, w_city, w_county,
              w_state, w_country,
              'DHL,LATVIAN' AS ship_carriers,
              d_year AS year_,
              $salesCases,
              $netCases
       FROM $tbl, warehouse, date_dim, time_dim, ship_mode
       WHERE ${p}_warehouse_sk = w_warehouse_sk
         AND ${p}_sold_date_sk = d_date_sk
         AND ${p}_sold_time_sk = t_time_sk
         AND ${p}_ship_mode_sk = sm_ship_mode_sk
         AND d_year = 2001
         AND t_time BETWEEN 30838 AND 30838 + 28800
         AND sm_carrier IN ('DHL', 'LATVIAN')
       GROUP BY w_warehouse_name, w_warehouse_sq_ft, w_city, w_county,
                w_state, w_country, d_year"""
  }

  private val q66 = q {
    val months = Seq("jan", "feb", "mar", "apr", "may", "jun", "jul",
      "aug", "sep", "oct", "nov", "dec")
    val sums = months.map(m => s"CAST(sum(${m}_sales_c) AS BIGINT) AS ${m}_sales_c").mkString(",\n           ")
    val perFt = months.map(m =>
      s"round(sum(CAST(${m}_sales_c AS DOUBLE) / w_warehouse_sq_ft), 6) AS ${m}_sales_per_sq_foot").mkString(",\n           ")
    val nets = months.map(m => s"CAST(sum(${m}_net_c) AS BIGINT) AS ${m}_net_c").mkString(",\n           ")
    s"""
    SELECT w_warehouse_name, w_warehouse_sq_ft, w_city, w_county,
           w_state, w_country, ship_carriers, year_,
           $sums,
           $perFt,
           $nets
    FROM (${q66Channel("web_sales", "ws", "ws_ext_sales_price", "ws_net_paid")}
          UNION ALL
          ${q66Channel("catalog_sales", "cs", "cs_sales_price", "cs_net_paid")}) x
    GROUP BY w_warehouse_name, w_warehouse_sq_ft, w_city, w_county,
             w_state, w_country, ship_carriers, year_
    ORDER BY w_warehouse_name NULLS FIRST
    LIMIT 100"""
  }

  // ---- Q67: top items per category over a rollup of store sales -------
  private val q67 = q("""
    SELECT *
    FROM
      (SELECT i_category, i_class, i_brand, i_product_name,
              d_year, d_qoy, d_moy, s_store_id, sumsales_c,
              CAST(rank() OVER (PARTITION BY i_category
                           ORDER BY sumsales_c DESC) AS BIGINT) rk
       FROM
         (SELECT i_category, i_class, i_brand, i_product_name,
                 d_year, d_qoy, d_moy, s_store_id,
                 CAST(sum(coalesce(CAST(round(ss_sales_price * 100) AS BIGINT) * ss_quantity, 0)) AS BIGINT) sumsales_c
          FROM store_sales, date_dim, store, item
          WHERE ss_sold_date_sk = d_date_sk
            AND ss_item_sk = i_item_sk
            AND ss_store_sk = s_store_sk
            AND d_month_seq BETWEEN 1200 AND 1200 + 11
          GROUP BY ROLLUP (i_category, i_class, i_brand, i_product_name,
                           d_year, d_qoy, d_moy, s_store_id)) dw1) dw2
    WHERE rk <= 100
    ORDER BY i_category NULLS FIRST, i_class NULLS FIRST,
             i_brand NULLS FIRST, i_product_name NULLS FIRST,
             d_year NULLS FIRST, d_qoy NULLS FIRST, d_moy NULLS FIRST,
             s_store_id NULLS FIRST, sumsales_c NULLS FIRST, rk NULLS FIRST
    LIMIT 100""", headline = true)

  // ---- Q75: items whose sales dropped >10% year over year -------------
  private def q75Channel(tbl: String, p: String, rets: String, rp: String,
      joinL: String, joinR: String, amtCol: String): String = s"""
      SELECT d_year, i_brand_id, i_class_id, i_category_id, i_manufact_id,
             ${p}_quantity - COALESCE(${rp}_return_quantity, 0) AS sales_cnt,
             CAST(round(${p}_ext_sales_price * 100) AS BIGINT)
               - COALESCE(CAST(round($amtCol * 100) AS BIGINT), 0) AS sales_amt_c
      FROM $tbl
      JOIN item ON i_item_sk = ${p}_item_sk
      JOIN date_dim ON d_date_sk = ${p}_sold_date_sk
      LEFT JOIN $rets ON ($joinL = $joinR AND ${p}_item_sk = ${rp}_item_sk)
      WHERE i_category = 'Books'"""

  private val q75 = qPersist(s"""
    WITH all_sales AS
      (SELECT d_year, i_brand_id, i_class_id, i_category_id, i_manufact_id,
              CAST(SUM(sales_cnt) AS BIGINT) AS sales_cnt,
              SUM(sales_amt_c) AS sales_amt_c
       FROM
         (${q75Channel("catalog_sales", "cs", "catalog_returns", "cr",
            "cs_order_number", "cr_order_number", "cr_return_amount")}
          UNION
          ${q75Channel("store_sales", "ss", "store_returns", "sr",
            "ss_ticket_number", "sr_ticket_number", "sr_return_amt")}
          UNION
          ${q75Channel("web_sales", "ws", "web_returns", "wr",
            "ws_order_number", "wr_order_number", "wr_return_amt")}) sales_detail
       GROUP BY d_year, i_brand_id, i_class_id, i_category_id, i_manufact_id)
    SELECT prev_yr.d_year AS prev_year,
           curr_yr.d_year AS year_,
           curr_yr.i_brand_id, curr_yr.i_class_id,
           curr_yr.i_category_id, curr_yr.i_manufact_id,
           prev_yr.sales_cnt AS prev_yr_cnt,
           curr_yr.sales_cnt AS curr_yr_cnt,
           curr_yr.sales_cnt - prev_yr.sales_cnt AS sales_cnt_diff,
           CAST(curr_yr.sales_amt_c - prev_yr.sales_amt_c AS BIGINT) AS sales_amt_diff_c
    FROM all_sales curr_yr, all_sales prev_yr
    WHERE curr_yr.i_brand_id = prev_yr.i_brand_id
      AND curr_yr.i_class_id = prev_yr.i_class_id
      AND curr_yr.i_category_id = prev_yr.i_category_id
      AND curr_yr.i_manufact_id = prev_yr.i_manufact_id
      AND curr_yr.d_year = 2002
      AND prev_yr.d_year = 2002 - 1
      AND CAST(curr_yr.sales_cnt AS DOUBLE) / CAST(prev_yr.sales_cnt AS DOUBLE) < 0.9
    ORDER BY sales_cnt_diff, sales_amt_diff_c, curr_yr.i_brand_id,
             curr_yr.i_class_id, curr_yr.i_category_id, curr_yr.i_manufact_id
    LIMIT 100""", Set("all_sales"), headline = true)

  // ---- Q77: period profit rollup per channel entity -------------------
  private val q77 = q("""
    WITH ss AS
      (SELECT s_store_sk,
              sum(CAST(round(ss_ext_sales_price * 100) AS BIGINT)) AS sales_c,
              sum(CAST(round(ss_net_profit * 100) AS BIGINT)) AS profit_c
       FROM store_sales, date_dim, store
       WHERE ss_sold_date_sk = d_date_sk
         AND d_date BETWEEN CAST('2000-08-23' AS DATE) AND CAST('2000-09-22' AS DATE)
         AND ss_store_sk = s_store_sk
       GROUP BY s_store_sk),
    sr AS
      (SELECT s_store_sk,
              sum(CAST(round(sr_return_amt * 100) AS BIGINT)) AS returns_c,
              sum(CAST(round(sr_net_loss * 100) AS BIGINT)) AS profit_loss_c
       FROM store_returns, date_dim, store
       WHERE sr_returned_date_sk = d_date_sk
         AND d_date BETWEEN CAST('2000-08-23' AS DATE) AND CAST('2000-09-22' AS DATE)
         AND sr_store_sk = s_store_sk
       GROUP BY s_store_sk),
    cs AS
      (SELECT cs_call_center_sk,
              sum(CAST(round(cs_ext_sales_price * 100) AS BIGINT)) AS sales_c,
              sum(CAST(round(cs_net_profit * 100) AS BIGINT)) AS profit_c
       FROM catalog_sales, date_dim
       WHERE cs_sold_date_sk = d_date_sk
         AND d_date BETWEEN CAST('2000-08-23' AS DATE) AND CAST('2000-09-22' AS DATE)
       GROUP BY cs_call_center_sk),
    cr AS
      (SELECT cr_call_center_sk,
              sum(CAST(round(cr_return_amount * 100) AS BIGINT)) AS returns_c,
              sum(CAST(round(cr_net_loss * 100) AS BIGINT)) AS profit_loss_c
       FROM catalog_returns, date_dim
       WHERE cr_returned_date_sk = d_date_sk
         AND d_date BETWEEN CAST('2000-08-23' AS DATE) AND CAST('2000-09-22' AS DATE)
       GROUP BY cr_call_center_sk),
    ws AS
      (SELECT wp_web_page_sk,
              sum(CAST(round(ws_ext_sales_price * 100) AS BIGINT)) AS sales_c,
              sum(CAST(round(ws_net_profit * 100) AS BIGINT)) AS profit_c
       FROM web_sales, date_dim, web_page
       WHERE ws_sold_date_sk = d_date_sk
         AND d_date BETWEEN CAST('2000-08-23' AS DATE) AND CAST('2000-09-22' AS DATE)
         AND ws_web_page_sk = wp_web_page_sk
       GROUP BY wp_web_page_sk),
    wr AS
      (SELECT wp_web_page_sk,
              sum(CAST(round(wr_return_amt * 100) AS BIGINT)) AS returns_c,
              sum(CAST(round(wr_net_loss * 100) AS BIGINT)) AS profit_loss_c
       FROM web_returns, date_dim, web_page
       WHERE wr_returned_date_sk = d_date_sk
         AND d_date BETWEEN CAST('2000-08-23' AS DATE) AND CAST('2000-09-22' AS DATE)
         AND wr_web_page_sk = wp_web_page_sk
       GROUP BY wp_web_page_sk)
    SELECT channel, id,
           CAST(sum(sales_c) AS BIGINT) AS sales_c,
           CAST(sum(returns_c) AS BIGINT) AS returns_c,
           CAST(sum(profit_c) AS BIGINT) AS profit_c
    FROM
      (SELECT 'store channel' AS channel, ss.s_store_sk AS id,
              sales_c, coalesce(returns_c, 0) AS returns_c,
              (profit_c - coalesce(profit_loss_c, 0)) AS profit_c
       FROM ss LEFT JOIN sr ON ss.s_store_sk = sr.s_store_sk
       UNION ALL
       SELECT 'catalog channel', cs_call_center_sk,
              sales_c, returns_c, (profit_c - profit_loss_c)
       FROM cs, cr
       UNION ALL
       SELECT 'web channel', ws.wp_web_page_sk,
              sales_c, coalesce(returns_c, 0),
              (profit_c - coalesce(profit_loss_c, 0))
       FROM ws LEFT JOIN wr ON ws.wp_web_page_sk = wr.wp_web_page_sk) x
    GROUP BY ROLLUP (channel, id)
    ORDER BY channel NULLS FIRST, id NULLS FIRST, returns_c DESC
    LIMIT 100""")

  // ---- Q72: catalog orders short on inventory at order time -----------
  private val q72 = q("""
    SELECT i_item_desc, w_warehouse_name, d1.d_week_seq,
           CAST(sum(CASE WHEN p_promo_sk IS NULL THEN 1 ELSE 0 END) AS BIGINT) no_promo,
           CAST(sum(CASE WHEN p_promo_sk IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) promo,
           CAST(count(*) AS BIGINT) total_cnt
    FROM catalog_sales
    JOIN inventory ON (cs_item_sk = inv_item_sk)
    JOIN warehouse ON (w_warehouse_sk = inv_warehouse_sk)
    JOIN item ON (i_item_sk = cs_item_sk)
    JOIN customer_demographics ON (cs_bill_cdemo_sk = cd_demo_sk)
    JOIN household_demographics ON (cs_bill_hdemo_sk = hd_demo_sk)
    JOIN date_dim d1 ON (cs_sold_date_sk = d1.d_date_sk)
    JOIN date_dim d2 ON (inv_date_sk = d2.d_date_sk)
    JOIN date_dim d3 ON (cs_ship_date_sk = d3.d_date_sk)
    LEFT OUTER JOIN promotion ON (cs_promo_sk = p_promo_sk)
    LEFT OUTER JOIN catalog_returns ON (cr_item_sk = cs_item_sk
                                        AND cr_order_number = cs_order_number)
    WHERE d1.d_week_seq = d2.d_week_seq
      AND inv_quantity_on_hand < cs_quantity
      AND d3.d_date > d1.d_date + 5
      AND hd_buy_potential = '>10000'
      AND d1.d_year = 1999
      AND cd_marital_status = 'D'
    GROUP BY i_item_desc, w_warehouse_name, d1.d_week_seq
    ORDER BY total_cnt DESC NULLS FIRST, i_item_desc NULLS FIRST,
             w_warehouse_name NULLS FIRST, d1.d_week_seq NULLS FIRST
    LIMIT 100""", headline = true)

  // ---- Q78: store loyalty vs other channels, unreturned sales ---------
  private val q78 = q("""
    WITH ws AS
      (SELECT d_year AS ws_sold_year, ws_item_sk,
              ws_bill_customer_sk ws_customer_sk,
              CAST(sum(ws_quantity) AS BIGINT) ws_qty,
              sum(CAST(round(ws_wholesale_cost * 100) AS BIGINT)) ws_wc_c,
              sum(CAST(round(ws_sales_price * 100) AS BIGINT)) ws_sp_c
       FROM web_sales
       LEFT JOIN web_returns ON wr_order_number = ws_order_number
                            AND ws_item_sk = wr_item_sk
       JOIN date_dim ON ws_sold_date_sk = d_date_sk
       WHERE wr_order_number IS NULL
       GROUP BY d_year, ws_item_sk, ws_bill_customer_sk),
    cs AS
      (SELECT d_year AS cs_sold_year, cs_item_sk,
              cs_bill_customer_sk cs_customer_sk,
              CAST(sum(cs_quantity) AS BIGINT) cs_qty,
              sum(CAST(round(cs_wholesale_cost * 100) AS BIGINT)) cs_wc_c,
              sum(CAST(round(cs_sales_price * 100) AS BIGINT)) cs_sp_c
       FROM catalog_sales
       LEFT JOIN catalog_returns ON cr_order_number = cs_order_number
                                AND cs_item_sk = cr_item_sk
       JOIN date_dim ON cs_sold_date_sk = d_date_sk
       WHERE cr_order_number IS NULL
       GROUP BY d_year, cs_item_sk, cs_bill_customer_sk),
    ss AS
      (SELECT d_year AS ss_sold_year, ss_item_sk, ss_customer_sk,
              CAST(sum(ss_quantity) AS BIGINT) ss_qty,
              sum(CAST(round(ss_wholesale_cost * 100) AS BIGINT)) ss_wc_c,
              sum(CAST(round(ss_sales_price * 100) AS BIGINT)) ss_sp_c
       FROM store_sales
       LEFT JOIN store_returns ON sr_ticket_number = ss_ticket_number
                              AND ss_item_sk = sr_item_sk
       JOIN date_dim ON ss_sold_date_sk = d_date_sk
       WHERE sr_ticket_number IS NULL
       GROUP BY d_year, ss_item_sk, ss_customer_sk)
    SELECT ss_sold_year, ss_item_sk, ss_customer_sk,
           round(CAST(ss_qty AS DOUBLE) / (coalesce(ws_qty, 0) + coalesce(cs_qty, 0)), 2) ratio,
           ss_qty store_qty,
           CAST(ss_wc_c AS BIGINT) store_wholesale_cost_c,
           CAST(ss_sp_c AS BIGINT) store_sales_price_c,
           coalesce(ws_qty, 0) + coalesce(cs_qty, 0) other_chan_qty,
           CAST(coalesce(ws_wc_c, 0) + coalesce(cs_wc_c, 0) AS BIGINT) other_chan_wholesale_cost_c,
           CAST(coalesce(ws_sp_c, 0) + coalesce(cs_sp_c, 0) AS BIGINT) other_chan_sales_price_c
    FROM ss
    LEFT JOIN ws ON (ws_sold_year = ss_sold_year AND ws_item_sk = ss_item_sk
                     AND ws_customer_sk = ss_customer_sk)
    LEFT JOIN cs ON (cs_sold_year = ss_sold_year AND cs_item_sk = ss_item_sk
                     AND cs_customer_sk = ss_customer_sk)
    WHERE (coalesce(ws_qty, 0) > 0 OR coalesce(cs_qty, 0) > 0)
      AND ss_sold_year = 2000
    ORDER BY ss_sold_year, ss_item_sk, ss_customer_sk, ss_qty DESC,
             ss_wc_c DESC, ss_sp_c DESC, other_chan_qty,
             other_chan_wholesale_cost_c, other_chan_sales_price_c, ratio
    LIMIT 100""", headline = true)

  // ---- Q80: promo-filtered channel rollup of sales/returns/profit -----
  private val q80 = q("""
    WITH ssr AS
      (SELECT s_store_id AS store_id,
              sum(CAST(round(ss_ext_sales_price * 100) AS BIGINT)) AS sales_c,
              sum(coalesce(CAST(round(sr_return_amt * 100) AS BIGINT), 0)) AS returns_c,
              sum(CAST(round(ss_net_profit * 100) AS BIGINT)
                  - coalesce(CAST(round(sr_net_loss * 100) AS BIGINT), 0)) AS profit_c
       FROM store_sales
       LEFT OUTER JOIN store_returns ON (ss_item_sk = sr_item_sk
                                         AND ss_ticket_number = sr_ticket_number),
            date_dim, store, item, promotion
       WHERE ss_sold_date_sk = d_date_sk
         AND d_date BETWEEN CAST('2000-08-23' AS DATE) AND CAST('2000-09-22' AS DATE)
         AND ss_store_sk = s_store_sk
         AND ss_item_sk = i_item_sk
         AND i_current_price > 50
         AND ss_promo_sk = p_promo_sk
         AND p_channel_tv = 'N'
       GROUP BY s_store_id),
    csr AS
      (SELECT cp_catalog_page_id AS catalog_page_id,
              sum(CAST(round(cs_ext_sales_price * 100) AS BIGINT)) AS sales_c,
              sum(coalesce(CAST(round(cr_return_amount * 100) AS BIGINT), 0)) AS returns_c,
              sum(CAST(round(cs_net_profit * 100) AS BIGINT)
                  - coalesce(CAST(round(cr_net_loss * 100) AS BIGINT), 0)) AS profit_c
       FROM catalog_sales
       LEFT OUTER JOIN catalog_returns ON (cs_item_sk = cr_item_sk
                                           AND cs_order_number = cr_order_number),
            date_dim, catalog_page, item, promotion
       WHERE cs_sold_date_sk = d_date_sk
         AND d_date BETWEEN CAST('2000-08-23' AS DATE) AND CAST('2000-09-22' AS DATE)
         AND cs_catalog_page_sk = cp_catalog_page_sk
         AND cs_item_sk = i_item_sk
         AND i_current_price > 50
         AND cs_promo_sk = p_promo_sk
         AND p_channel_tv = 'N'
       GROUP BY cp_catalog_page_id),
    wsr AS
      (SELECT web_site_id,
              sum(CAST(round(ws_ext_sales_price * 100) AS BIGINT)) AS sales_c,
              sum(coalesce(CAST(round(wr_return_amt * 100) AS BIGINT), 0)) AS returns_c,
              sum(CAST(round(ws_net_profit * 100) AS BIGINT)
                  - coalesce(CAST(round(wr_net_loss * 100) AS BIGINT), 0)) AS profit_c
       FROM web_sales
       LEFT OUTER JOIN web_returns ON (ws_item_sk = wr_item_sk
                                       AND ws_order_number = wr_order_number),
            date_dim, web_site, item, promotion
       WHERE ws_sold_date_sk = d_date_sk
         AND d_date BETWEEN CAST('2000-08-23' AS DATE) AND CAST('2000-09-22' AS DATE)
         AND ws_web_site_sk = web_site_sk
         AND ws_item_sk = i_item_sk
         AND i_current_price > 50
         AND ws_promo_sk = p_promo_sk
         AND p_channel_tv = 'N'
       GROUP BY web_site_id)
    SELECT channel, id,
           CAST(sum(sales_c) AS BIGINT) AS sales_c,
           CAST(sum(returns_c) AS BIGINT) AS returns_c,
           CAST(sum(profit_c) AS BIGINT) AS profit_c
    FROM
      (SELECT 'store channel' AS channel, concat('store', store_id) AS id,
              sales_c, returns_c, profit_c
       FROM ssr
       UNION ALL
       SELECT 'catalog channel', concat('catalog_page', catalog_page_id),
              sales_c, returns_c, profit_c
       FROM csr
       UNION ALL
       SELECT 'web channel', concat('web_site', web_site_id),
              sales_c, returns_c, profit_c
       FROM wsr) x
    GROUP BY ROLLUP (channel, id)
    ORDER BY channel NULLS FIRST, id NULLS FIRST
    LIMIT 100""")

  // ---- Q81: customers returning far above their state's average -------
  private val q81 = q("""
    WITH customer_total_return AS
      (SELECT cr_returning_customer_sk AS ctr_customer_sk,
              ca_state AS ctr_state,
              sum(CAST(round(cr_return_amt_inc_tax * 100) AS BIGINT)) AS ctr_total_return_c
       FROM catalog_returns, date_dim, customer_address
       WHERE cr_returned_date_sk = d_date_sk
         AND d_year = 2000
         AND cr_returning_addr_sk = ca_address_sk
       GROUP BY cr_returning_customer_sk, ca_state)
    SELECT c_customer_id, c_salutation, c_first_name, c_last_name,
           ca_street_number, ca_street_name, ca_street_type,
           ca_suite_number, ca_city, ca_county, ca_state, ca_zip,
           ca_country, ca_gmt_offset, ca_location_type,
           CAST(ctr_total_return_c AS BIGINT) AS ctr_total_return_c
    FROM customer_total_return ctr1, customer_address, customer
    WHERE ctr1.ctr_total_return_c >
        (SELECT avg(ctr_total_return_c) * 1.2
         FROM customer_total_return ctr2
         WHERE ctr1.ctr_state = ctr2.ctr_state)
      AND ca_address_sk = c_current_addr_sk
      AND ca_state = 'GA'
      AND ctr1.ctr_customer_sk = c_customer_sk
    ORDER BY c_customer_id, c_salutation, c_first_name, c_last_name,
             ca_street_number, ca_street_name, ca_street_type,
             ca_suite_number, ca_city, ca_county, ca_state, ca_zip,
             ca_country, ca_gmt_offset, ca_location_type,
             ctr_total_return_c
    LIMIT 100""")

  // ---- Q83: items returned in the same periods across channels --------
  // (week -> quarter granularity: at sf0.01 no item is returned in all
  // three channels within the official three weeks)
  private val q83 = q("""
    WITH sr_items AS
      (SELECT i_item_id item_id,
              CAST(sum(sr_return_quantity) AS BIGINT) sr_item_qty
       FROM store_returns, item, date_dim
       WHERE sr_item_sk = i_item_sk
         AND d_date IN (SELECT d_date FROM date_dim
                        WHERE d_quarter_seq IN
                          (SELECT d_quarter_seq FROM date_dim
                           WHERE d_date IN ('2000-06-30', '2000-09-27', '2000-11-17')))
         AND sr_returned_date_sk = d_date_sk
       GROUP BY i_item_id),
    cr_items AS
      (SELECT i_item_id item_id,
              CAST(sum(cr_return_quantity) AS BIGINT) cr_item_qty
       FROM catalog_returns, item, date_dim
       WHERE cr_item_sk = i_item_sk
         AND d_date IN (SELECT d_date FROM date_dim
                        WHERE d_quarter_seq IN
                          (SELECT d_quarter_seq FROM date_dim
                           WHERE d_date IN ('2000-06-30', '2000-09-27', '2000-11-17')))
         AND cr_returned_date_sk = d_date_sk
       GROUP BY i_item_id),
    wr_items AS
      (SELECT i_item_id item_id,
              CAST(sum(wr_return_quantity) AS BIGINT) wr_item_qty
       FROM web_returns, item, date_dim
       WHERE wr_item_sk = i_item_sk
         AND d_date IN (SELECT d_date FROM date_dim
                        WHERE d_quarter_seq IN
                          (SELECT d_quarter_seq FROM date_dim
                           WHERE d_date IN ('2000-06-30', '2000-09-27', '2000-11-17')))
         AND wr_returned_date_sk = d_date_sk
       GROUP BY i_item_id)
    SELECT sr_items.item_id,
           sr_item_qty,
           round(CAST(sr_item_qty AS DOUBLE) / (sr_item_qty + cr_item_qty + wr_item_qty) / 3 * 100, 6) sr_dev,
           cr_item_qty,
           round(CAST(cr_item_qty AS DOUBLE) / (sr_item_qty + cr_item_qty + wr_item_qty) / 3 * 100, 6) cr_dev,
           wr_item_qty,
           round(CAST(wr_item_qty AS DOUBLE) / (sr_item_qty + cr_item_qty + wr_item_qty) / 3 * 100, 6) wr_dev,
           round(CAST(sr_item_qty + cr_item_qty + wr_item_qty AS DOUBLE) / 3, 6) average_qty
    FROM sr_items, cr_items, wr_items
    WHERE sr_items.item_id = cr_items.item_id
      AND sr_items.item_id = wr_items.item_id
    ORDER BY sr_items.item_id NULLS FIRST, sr_item_qty NULLS FIRST
    LIMIT 100""")

  // ---- Q85: web return reasons for targeted demographics --------------
  // (state lists and price/profit bands adapted to the generated
  // domains; the demographic-pair structure is unchanged)
  private val q85 = q("""
    SELECT substring(r_reason_desc, 1, 20) reason_prefix,
           round(avg(ws_quantity), 6) avg1,
           round(avg(CAST(round(wr_refunded_cash * 100) AS BIGINT)) / 100.0, 6) avg2,
           round(avg(CAST(round(wr_fee * 100) AS BIGINT)) / 100.0, 6) avg3
    FROM web_sales, web_returns, web_page, customer_demographics cd1,
         customer_demographics cd2, customer_address, date_dim, reason
    WHERE ws_web_page_sk = wp_web_page_sk
      AND ws_item_sk = wr_item_sk
      AND ws_order_number = wr_order_number
      AND ws_sold_date_sk = d_date_sk
      AND d_year = 2000
      AND cd1.cd_demo_sk = wr_refunded_cdemo_sk
      AND cd2.cd_demo_sk = wr_returning_cdemo_sk
      AND ca_address_sk = wr_refunded_addr_sk
      AND r_reason_sk = wr_reason_sk
      AND ((cd1.cd_marital_status = 'M'
            AND cd1.cd_marital_status = cd2.cd_marital_status
            AND cd1.cd_education_status = 'Advanced Degree'
            AND cd1.cd_education_status = cd2.cd_education_status
            AND ws_sales_price BETWEEN 50.00 AND 200.00)
           OR (cd1.cd_marital_status = 'S'
               AND cd1.cd_marital_status = cd2.cd_marital_status
               AND cd1.cd_education_status = 'College'
               AND cd1.cd_education_status = cd2.cd_education_status
               AND ws_sales_price BETWEEN 10.00 AND 100.00)
           OR (cd1.cd_marital_status = 'W'
               AND cd1.cd_marital_status = cd2.cd_marital_status
               AND cd1.cd_education_status = '2 yr Degree'
               AND cd1.cd_education_status = cd2.cd_education_status
               AND ws_sales_price BETWEEN 0.00 AND 50.00))
      AND ((ca_country = 'United States'
            AND ca_state IN ('OH', 'KY', 'TX')
            AND ws_net_profit BETWEEN -5000 AND 5000)
           OR (ca_country = 'United States'
               AND ca_state IN ('MO', 'IL', 'AL')
               AND ws_net_profit BETWEEN -5000 AND 5000)
           OR (ca_country = 'United States'
               AND ca_state IN ('SC', 'VA', 'GA')
               AND ws_net_profit BETWEEN -5000 AND 5000))
    GROUP BY r_reason_desc
    ORDER BY reason_prefix, avg1, avg2, avg3
    LIMIT 100""")

  // ---- Q14: cross-channel brand/class/category INTERSECT report -------
  private def q14Channel(chan: String, tbl: String, p: String,
      custSk: String): String = s"""
       SELECT '$chan' channel, i_brand_id, i_class_id, i_category_id,
              sum(${p}_quantity * CAST(round(${p}_list_price * 100) AS BIGINT)) sales_c,
              CAST(count(*) AS BIGINT) number_sales
       FROM $tbl, item, date_dim
       WHERE ${p}_item_sk IN (SELECT ss_item_sk FROM cross_items)
         AND ${p}_item_sk = i_item_sk
         AND ${p}_sold_date_sk = d_date_sk
         AND d_year = 1999 + 2
         AND d_moy = 11
       GROUP BY i_brand_id, i_class_id, i_category_id
       HAVING sum(${p}_quantity * CAST(round(${p}_list_price * 100) AS BIGINT)) >
         (SELECT average_sales_c FROM avg_sales)"""

  // round-13 note: cross_items/avg_sales are referenced 3x but
  // qPersist was MEASURED SLOWER here (2.80s -> 3.09s at sf0.1):
  // AQE's runtime exchange reuse already dedupes the identical
  // inlined subtrees, so the persist only added cache-build cost.
  private val q14 = q(s"""
    WITH cross_items AS
      (SELECT i_item_sk ss_item_sk
       FROM item,
         -- round-14 rewrite (results identical, oracle-verified): the
         -- 3-way INTERSECT planned as 3 distinct aggregates + 2
         -- left-semi joins + a final distinct (6 aggregate/join
         -- pipelines). A set appears in the intersection iff it appears
         -- in ALL THREE channels, so one distinct over the channel-
         -- tagged UNION ALL (one wide exchange with map-side partial
         -- dedup) + a tiny count-per-set aggregate computes the same
         -- set in 2 passes (guide §2.4; DISTINCT/GROUP BY and INTERSECT
         -- share null-safe grouping semantics, so NULL keys behave
         -- identically). Same SQL runs in the DuckDB oracle.
         (SELECT brand_id, class_id, category_id
          FROM
            (SELECT DISTINCT chan, brand_id, class_id, category_id
             FROM
               (SELECT 1 chan, iss.i_brand_id brand_id,
                       iss.i_class_id class_id,
                       iss.i_category_id category_id
                FROM store_sales, item iss, date_dim d1
                WHERE ss_item_sk = iss.i_item_sk
                  AND ss_sold_date_sk = d1.d_date_sk
                  AND d1.d_year BETWEEN 1999 AND 1999 + 2
                UNION ALL
                SELECT 2 chan, ics.i_brand_id, ics.i_class_id, ics.i_category_id
                FROM catalog_sales, item ics, date_dim d2
                WHERE cs_item_sk = ics.i_item_sk
                  AND cs_sold_date_sk = d2.d_date_sk
                  AND d2.d_year BETWEEN 1999 AND 1999 + 2
                UNION ALL
                SELECT 3 chan, iws.i_brand_id, iws.i_class_id, iws.i_category_id
                FROM web_sales, item iws, date_dim d3
                WHERE ws_item_sk = iws.i_item_sk
                  AND ws_sold_date_sk = d3.d_date_sk
                  AND d3.d_year BETWEEN 1999 AND 1999 + 2) raw) chans
          GROUP BY brand_id, class_id, category_id
          HAVING count(*) = 3) sq1
       WHERE i_brand_id = brand_id
         AND i_class_id = class_id
         AND i_category_id = category_id),
    avg_sales AS
      (SELECT avg(quantity * list_price_c) average_sales_c
       FROM
         (SELECT ss_quantity quantity,
                 CAST(round(ss_list_price * 100) AS BIGINT) list_price_c
          FROM store_sales, date_dim
          WHERE ss_sold_date_sk = d_date_sk
            AND d_year BETWEEN 1999 AND 1999 + 2
          UNION ALL
          SELECT cs_quantity, CAST(round(cs_list_price * 100) AS BIGINT)
          FROM catalog_sales, date_dim
          WHERE cs_sold_date_sk = d_date_sk
            AND d_year BETWEEN 1999 AND 1999 + 2
          UNION ALL
          SELECT ws_quantity, CAST(round(ws_list_price * 100) AS BIGINT)
          FROM web_sales, date_dim
          WHERE ws_sold_date_sk = d_date_sk
            AND d_year BETWEEN 1999 AND 1999 + 2) sq2)
    SELECT channel, i_brand_id, i_class_id, i_category_id,
           CAST(sum(sales_c) AS BIGINT) AS sum_sales_c,
           CAST(sum(number_sales) AS BIGINT) AS sum_number_sales
    FROM
      (${q14Channel("store", "store_sales", "ss", "ss_customer_sk")}
       UNION ALL
       ${q14Channel("catalog", "catalog_sales", "cs", "cs_bill_customer_sk")}
       UNION ALL
       ${q14Channel("web", "web_sales", "ws", "ws_bill_customer_sk")}) y
    GROUP BY ROLLUP (channel, i_brand_id, i_class_id, i_category_id)
    ORDER BY channel NULLS FIRST, i_brand_id NULLS FIRST,
             i_class_id NULLS FIRST, i_category_id NULLS FIRST
    LIMIT 100""", headline = true)

  // ---- Q23: best store customers buying frequent items off-store ------
  // (the official d_moy = 2 cut leaves an empty result at sf0.01; the
  // frequent-item and 50%-of-max-customer structure is unchanged)
  private val q23 = qPersist("""
    WITH frequent_ss_items AS
      (SELECT itemdesc, i_item_sk item_sk, d_date solddate, count(*) cnt
       FROM store_sales, date_dim,
         (SELECT substring(i_item_desc, 1, 30) itemdesc, * FROM item) sq1
       WHERE ss_sold_date_sk = d_date_sk
         AND ss_item_sk = i_item_sk
         AND d_year IN (2000, 2000+1, 2000+2, 2000+3)
       GROUP BY itemdesc, i_item_sk, d_date
       HAVING count(*) > 4),
    max_store_sales AS
      (SELECT max(csales_c) tpcds_cmax_c
       FROM
         (SELECT c_customer_sk,
                 sum(ss_quantity * CAST(round(ss_sales_price * 100) AS BIGINT)) csales_c
          FROM store_sales, customer, date_dim
          WHERE ss_customer_sk = c_customer_sk
            AND ss_sold_date_sk = d_date_sk
            AND d_year IN (2000, 2000+1, 2000+2, 2000+3)
          GROUP BY c_customer_sk) sq2),
    best_ss_customer AS
      (SELECT c_customer_sk,
              sum(ss_quantity * CAST(round(ss_sales_price * 100) AS BIGINT)) ssales_c
       FROM store_sales, customer, max_store_sales
       WHERE ss_customer_sk = c_customer_sk
       GROUP BY c_customer_sk
       HAVING sum(ss_quantity * CAST(round(ss_sales_price * 100) AS BIGINT)) >
              (50 / 100.0) * max(tpcds_cmax_c))
    SELECT c_last_name, c_first_name, CAST(sales_c AS BIGINT) AS sales_c
    FROM
      (SELECT c_last_name, c_first_name,
              sum(cs_quantity * CAST(round(cs_list_price * 100) AS BIGINT)) sales_c
       FROM catalog_sales, customer, date_dim, frequent_ss_items, best_ss_customer
       WHERE d_year = 2000
         AND d_moy BETWEEN 1 AND 12
         AND cs_sold_date_sk = d_date_sk
         AND cs_item_sk = item_sk
         AND cs_bill_customer_sk = best_ss_customer.c_customer_sk
         AND cs_bill_customer_sk = customer.c_customer_sk
       GROUP BY c_last_name, c_first_name
       UNION ALL
       SELECT c_last_name, c_first_name,
              sum(ws_quantity * CAST(round(ws_list_price * 100) AS BIGINT))
       FROM web_sales, customer, date_dim, frequent_ss_items, best_ss_customer
       WHERE d_year = 2000
         AND d_moy BETWEEN 1 AND 12
         AND ws_sold_date_sk = d_date_sk
         AND ws_item_sk = item_sk
         AND ws_bill_customer_sk = best_ss_customer.c_customer_sk
         AND ws_bill_customer_sk = customer.c_customer_sk
       GROUP BY c_last_name, c_first_name) sq3
    ORDER BY c_last_name NULLS FIRST, c_first_name NULLS FIRST,
             sales_c NULLS FIRST
    LIMIT 100""", Set("frequent_ss_items", "best_ss_customer"), headline = true)

  // ---- Q24: returned-item net-paid by customer/store, color cut -------
  // (the official s_zip = ca_zip correlation never matches in the
  // hash-uniform zip domain; s_state = ca_state keeps the store-local
  // customer correlation with the same grouped shape. market and color
  // constants adapted to the generated domains.)
  private val q24 = qPersist("""
    WITH ssales AS
      (SELECT c_last_name, c_first_name, s_store_name, ca_state, s_state,
              i_color, i_current_price, i_manager_id, i_units, i_size,
              sum(CAST(round(ss_net_paid * 100) AS BIGINT)) netpaid_c
       FROM store_sales, store_returns, store, item, customer,
            customer_address
       WHERE ss_ticket_number = sr_ticket_number
         AND ss_item_sk = sr_item_sk
         AND ss_customer_sk = c_customer_sk
         AND ss_item_sk = i_item_sk
         AND ss_store_sk = s_store_sk
         AND c_current_addr_sk = ca_address_sk
         AND c_birth_country <> upper(ca_country)
         AND s_state = ca_state
         AND s_market_id = 8
       GROUP BY c_last_name, c_first_name, s_store_name, ca_state,
                s_state, i_color, i_current_price, i_manager_id,
                i_units, i_size)
    SELECT c_last_name, c_first_name, s_store_name,
           CAST(sum(netpaid_c) AS BIGINT) paid_c
    FROM ssales
    WHERE i_color = 'honeydew'
    GROUP BY c_last_name, c_first_name, s_store_name
    HAVING sum(netpaid_c) > (SELECT 0.05 * avg(netpaid_c) FROM ssales)
    ORDER BY c_last_name, c_first_name, s_store_name""", Set("ssales"))

  // ---- Q64: same-store repeat purchases of discounted items, yoy ------
  // (color and price-band constants adapted to the generated domains)
  private val q64 = qPersist("""
    WITH cs_ui AS
      (SELECT cs_item_sk,
              sum(CAST(round(cs_ext_list_price * 100) AS BIGINT)) AS sale_c,
              sum(CAST(round(cr_refunded_cash * 100) AS BIGINT)
                  + CAST(round(cr_reversed_charge * 100) AS BIGINT)
                  + CAST(round(cr_store_credit * 100) AS BIGINT)) AS refund_c
       FROM catalog_sales, catalog_returns
       WHERE cs_item_sk = cr_item_sk
         AND cs_order_number = cr_order_number
       GROUP BY cs_item_sk
       HAVING sum(CAST(round(cs_ext_list_price * 100) AS BIGINT)) >
              2 * sum(CAST(round(cr_refunded_cash * 100) AS BIGINT)
                      + CAST(round(cr_reversed_charge * 100) AS BIGINT)
                      + CAST(round(cr_store_credit * 100) AS BIGINT))),
    cross_sales AS
      (SELECT i_product_name product_name,
              i_item_sk item_sk,
              s_store_name store_name,
              s_zip store_zip,
              ad1.ca_street_number b_street_number,
              ad1.ca_street_name b_street_name,
              ad1.ca_city b_city,
              ad1.ca_zip b_zip,
              ad2.ca_street_number c_street_number,
              ad2.ca_street_name c_street_name,
              ad2.ca_city c_city,
              ad2.ca_zip c_zip,
              d1.d_year AS syear,
              d2.d_year AS fsyear,
              d3.d_year s2year,
              CAST(count(*) AS BIGINT) cnt,
              sum(CAST(round(ss_wholesale_cost * 100) AS BIGINT)) s1_c,
              sum(CAST(round(ss_list_price * 100) AS BIGINT)) s2_c,
              sum(CAST(round(ss_coupon_amt * 100) AS BIGINT)) s3_c
       FROM store_sales, store_returns, cs_ui,
            date_dim d1, date_dim d2, date_dim d3,
            store, customer,
            customer_demographics cd1, customer_demographics cd2,
            promotion,
            household_demographics hd1, household_demographics hd2,
            customer_address ad1, customer_address ad2,
            income_band ib1, income_band ib2, item
       WHERE ss_store_sk = s_store_sk
         AND ss_sold_date_sk = d1.d_date_sk
         AND ss_customer_sk = c_customer_sk
         AND ss_cdemo_sk = cd1.cd_demo_sk
         AND ss_hdemo_sk = hd1.hd_demo_sk
         AND ss_addr_sk = ad1.ca_address_sk
         AND ss_item_sk = i_item_sk
         AND ss_item_sk = sr_item_sk
         AND ss_ticket_number = sr_ticket_number
         AND ss_item_sk = cs_ui.cs_item_sk
         AND c_current_cdemo_sk = cd2.cd_demo_sk
         AND c_current_hdemo_sk = hd2.hd_demo_sk
         AND c_current_addr_sk = ad2.ca_address_sk
         AND c_first_sales_date_sk = d2.d_date_sk
         AND c_first_shipto_date_sk = d3.d_date_sk
         AND ss_promo_sk = p_promo_sk
         AND hd1.hd_income_band_sk = ib1.ib_income_band_sk
         AND hd2.hd_income_band_sk = ib2.ib_income_band_sk
         AND cd1.cd_marital_status <> cd2.cd_marital_status
         AND i_color IN ('red', 'navy', 'ghost', 'pink', 'gold', 'brown')
         AND i_current_price BETWEEN 1 AND 100
         AND i_current_price BETWEEN 2 AND 100
       GROUP BY i_product_name, i_item_sk, s_store_name, s_zip,
                ad1.ca_street_number, ad1.ca_street_name, ad1.ca_city,
                ad1.ca_zip, ad2.ca_street_number, ad2.ca_street_name,
                ad2.ca_city, ad2.ca_zip, d1.d_year, d2.d_year, d3.d_year)
    SELECT cs1.product_name,
           cs1.store_name,
           cs1.store_zip,
           cs1.b_street_number,
           cs1.b_street_name,
           cs1.b_city,
           cs1.b_zip,
           cs1.c_street_number,
           cs1.c_street_name,
           cs1.c_city,
           cs1.c_zip,
           cs1.syear cs1syear,
           cs1.cnt cs1cnt,
           CAST(cs1.s1_c AS BIGINT) AS s11_c,
           CAST(cs1.s2_c AS BIGINT) AS s21_c,
           CAST(cs1.s3_c AS BIGINT) AS s31_c,
           CAST(cs2.s1_c AS BIGINT) AS s12_c,
           CAST(cs2.s2_c AS BIGINT) AS s22_c,
           CAST(cs2.s3_c AS BIGINT) AS s32_c,
           cs2.syear,
           cs2.cnt
    FROM cross_sales cs1, cross_sales cs2
    WHERE cs1.item_sk = cs2.item_sk
      AND cs1.syear = 1999
      AND cs2.syear = 1999 + 1
      AND cs2.cnt <= cs1.cnt
      AND cs1.store_name = cs2.store_name
      AND cs1.store_zip = cs2.store_zip
    ORDER BY cs1.product_name NULLS FIRST, cs1.store_name NULLS FIRST,
             cs2.cnt NULLS FIRST, cs1.s1_c NULLS FIRST""", Set("cross_sales"), headline = true)

  override def queries: Seq[(String, Q)] = Seq(
    "tpcds_q14" -> q14,
    "tpcds_q23" -> q23,
    "tpcds_q24" -> q24,
    "tpcds_q64" -> q64,
    "tpcds_q72" -> q72,
    "tpcds_q78" -> q78,
    "tpcds_q80" -> q80,
    "tpcds_q81" -> q81,
    "tpcds_q83" -> q83,
    "tpcds_q85" -> q85,
    "tpcds_q49" -> q49,
    "tpcds_q54" -> q54,
    "tpcds_q58" -> q58,
    "tpcds_q66" -> q66,
    "tpcds_q67" -> q67,
    "tpcds_q75" -> q75,
    "tpcds_q77" -> q77,
    "tpcds_q4" -> q4,
    "tpcds_q5" -> q5,
    "tpcds_q8" -> q8,
    "tpcds_q18" -> q18,
    "tpcds_q39" -> q39,
    "tpcds_q71" -> q71,
    "tpcds_q84" -> q84,
    "tpcds_q91" -> q91,
    "tpcds_q10" -> q10,
    "tpcds_q11" -> q11,
    "tpcds_q17" -> q17,
    "tpcds_q31" -> q31,
    "tpcds_q35" -> q35,
    "tpcds_q69" -> q69,
    "tpcds_q74" -> q74,
    "tpcds_q22" -> q22,
    "tpcds_q28" -> q28,
    "tpcds_q30" -> q30,
    "tpcds_q32" -> q32,
    "tpcds_q33" -> q33,
    "tpcds_q40" -> q40,
    "tpcds_q44" -> q44,
    "tpcds_q56" -> q56,
    "tpcds_q57" -> q57,
    "tpcds_q60" -> q60,
    "tpcds_q63" -> q63,
    "tpcds_q9" -> q9,
    "tpcds_q21" -> q21,
    "tpcds_q27" -> q27,
    "tpcds_q34" -> q34,
    "tpcds_q41" -> q41,
    "tpcds_q45" -> q45,
    "tpcds_q46" -> q46,
    "tpcds_q48" -> q48,
    "tpcds_q53" -> q53,
    "tpcds_q59" -> q59,
    "tpcds_q61" -> q61,
    "tpcds_q76" -> q76,
    "tpcds_q82" -> q82,
    "tpcds_q86" -> q86,
    "tpcds_q47" -> q47,
    "tpcds_q95" -> q95,
    "tpcds_q1" -> q1,
    "tpcds_q2" -> q2,
    "tpcds_q16" -> q16,
    "tpcds_q38" -> q38,
    "tpcds_q87" -> q87,
    "tpcds_q88" -> q88,
    "tpcds_q90" -> q90,
    "tpcds_q97" -> q97,
    "tpcds_q25" -> q25,
    "tpcds_q29" -> q29,
    "tpcds_q50" -> q50,
    "tpcds_q65" -> q65,
    "tpcds_q92" -> q92,
    "tpcds_q94" -> q94,
    "tpcds_q12" -> q12,
    "tpcds_q20" -> q20,
    "tpcds_q36" -> q36,
    "tpcds_q51" -> q51,
    "tpcds_q70" -> q70,
    "tpcds_q89" -> q89,
    "tpcds_q98" -> q98,
    "tpcds_q6" -> q6,
    "tpcds_q15" -> q15,
    "tpcds_q37" -> q37,
    "tpcds_q62" -> q62,
    "tpcds_q93" -> q93,
    "tpcds_q99" -> q99,
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
