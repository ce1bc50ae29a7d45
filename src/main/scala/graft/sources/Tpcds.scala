package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic TPC-DS-shaped dataset generator + view registry.
  *
  * The reference ships 108 TPC-DS query suites
  * (tests/sqllogictests/suites/tpcds/Q1..Q99); to oracle-check ports of
  * those queries we need the TPC-DS schema as parquet BOTH engines can
  * read. The driver's testdata only has the TPC-H-ish tables, so this
  * module generates a seeded, fully deterministic TPC-DS dataset under
  * /tmp/graft_tpcds/<sfname> the first time a tpcds_* query runs; the
  * DuckDB oracle then reads the SAME parquet files via read_parquet()
  * CTEs, so Spark and the oracle always see identical data.
  *
  * Generation is Spark-native and distributed: every value is a pure
  * function of the row id via xxhash64, so there is no driver-side data
  * path and regeneration is bit-stable. Money columns are exact cents
  * (integer cents / 100.0) so queries can aggregate them exactly with
  * the `Exact.cents` convention. Returns tables are SAMPLED FROM the
  * corresponding sales tables so (ticket, item) / (order, item) join
  * paths genuinely match, and per-ticket attributes (customer, date,
  * store) are keyed by ticket so basket queries (Q73/Q79/Q68) group
  * correctly.
  */
object Tpcds {

  val tableNames: Seq[String] = Seq(
    "date_dim", "time_dim", "item", "customer", "customer_address",
    "customer_demographics", "household_demographics", "income_band",
    "store", "promotion", "warehouse", "ship_mode", "reason",
    "call_center", "web_site", "web_page", "catalog_page",
    "store_sales", "store_returns", "catalog_sales", "catalog_returns",
    "web_sales", "web_returns", "inventory")

  def dataDir(sfDir: String): String =
    s"/tmp/graft_tpcds/${new java.io.File(sfDir).getName}"

  private def sfOf(sfDir: String): Double = {
    val n = new java.io.File(sfDir).getName.stripPrefix("sf")
    try math.max(n.toDouble, 0.001) catch { case _: NumberFormatException => 0.01 }
  }

  // hash-derived deterministic pseudo-random in [0, m)
  private def H(seed: String, k: Column, m: Long): Column =
    pmod(xxhash64(lit(seed), k), lit(m))
  // integer division on positive longs
  private def idiv(c: Column, n: Long): Column = (c / n).cast("long")
  private def pick(seed: String, k: Column, vs: Seq[String]): Column = {
    val arr = array(vs.map(lit): _*)
    element_at(arr, (H(seed, k, vs.length) + 1).cast("int"))
  }

  private val registered =
    new java.util.concurrent.ConcurrentHashMap[String, Seq[(String, DataFrame)]]()

  /** Generate (if missing) and register temp views; returns the data
    * dir. Views are RE-registered on every call from cached DataFrames
    * (cheap — no footer re-read): `customer` collides with the TPC-H
    * view name that other query modules register into the same
    * session, so a one-time registration would be silently clobbered
    * between queries.
    */
  /** bump when generation logic/domains change: a stale on-disk dataset
    * regenerates instead of silently serving old domains
    */
  private val genVersion = "graft-tpcds-v5"

  def ensure(spark: SparkSession, sfDir: String): String = synchronized {
    val out = dataDir(sfDir)
    val marker = java.nio.file.Paths.get(out, "_GRAFT_OK")
    val fresh = java.nio.file.Files.exists(marker) &&
      new String(java.nio.file.Files.readAllBytes(marker)) == genVersion
    if (!fresh) {
      generate(spark, sfOf(sfDir), out)
      java.nio.file.Files.createDirectories(marker.getParent)
      java.nio.file.Files.write(marker, genVersion.getBytes)
      registered.keySet.removeIf(_.startsWith(out + "@"))
    }
    val key = out + "@" + System.identityHashCode(spark)
    val dfs = registered.computeIfAbsent(key, _ =>
      tableNames.map(t => t -> spark.read.parquet(s"$out/$t")))
    dfs.foreach { case (t, df) => df.createOrReplaceTempView(t) }
    out
  }

  // ----- sizing ---------------------------------------------------------
  private final case class Sizes(items: Long, customers: Long, addrs: Long,
      stores: Long, promos: Long, warehouses: Long, callCenters: Long,
      webSites: Long, webPages: Long, catalogPages: Long,
      storeSales: Long, catalogSales: Long, webSales: Long)

  private def sizes(sf: Double): Sizes = Sizes(
    items = math.max(2000, (18000 * sf).toLong), // >= 2000 so 3-digit i_manufact_id constants (Q37's 677/940/...) resolve
    customers = math.max(1000, (100000 * sf).toLong),
    addrs = math.max(500, (50000 * sf).toLong),
    stores = math.max(6, (60 * sf).toLong),
    promos = math.max(30, (300 * sf).toLong),
    warehouses = math.max(3, (15 * sf).toLong),
    callCenters = math.max(2, (8 * sf).toLong),
    webSites = math.max(2, (24 * sf).toLong),
    webPages = math.max(60, (200 * sf).toLong),
    catalogPages = math.max(100, (1000 * sf).toLong),
    storeSales = math.max(2000, (2880000 * sf).toLong),
    catalogSales = math.max(1200, (1440000 * sf).toLong),
    webSales = math.max(800, (720000 * sf).toLong))

  private val nDates = 1826L // 1998-01-01 .. 2002-12-31
  private val nTimes = 8640L // every 10 seconds
  private val nCdemo = 5600L // full demographic cross product
  private val nHdemo = 7200L
  private val nBands = 20L

  private val categories = Seq("Books", "Children", "Electronics", "Home",
    "Jewelry", "Men", "Music", "Shoes", "Sports", "Women")
  private val states = Seq("TN", "TN", "TN", "GA", "KY", "AL", "SC", "VA",
    "MO", "TX", "OH", "IL") // TN-heavy like dsdgen's s_state skew
  private val firstNames = Seq("James", "Mary", "John", "Linda", "Robert",
    "Barbara", "Michael", "Susan", "William", "Jessica", "David", "Sarah",
    "Richard", "Karen", "Joseph", "Nancy", "Thomas", "Lisa", "Charles",
    "Betty", "Daniel", "Helen", "Matthew", "Sandra", "Anthony", "Donna",
    "Mark", "Carol", "Paul", "Ruth", "Steven", "Sharon", "Andrew", "Laura",
    "Kenneth", "Amy", "George", "Anna", "Joshua", "Maria")
  private val lastNames = Seq("Smith", "Johnson", "Williams", "Brown",
    "Jones", "Garcia", "Miller", "Davis", "Rodriguez", "Martinez",
    "Hernandez", "Lopez", "Gonzalez", "Wilson", "Anderson", "Thomas",
    "Taylor", "Moore", "Jackson", "Martin", "Lee", "Perez", "Thompson",
    "White", "Harris", "Sanchez", "Clark", "Ramirez", "Lewis", "Robinson",
    "Walker", "Young", "Allen", "King", "Wright", "Scott", "Torres",
    "Nguyen", "Hill", "Flores")
  private val counties = Seq("Williamson County", "Walker County",
    "Ziebach County", "Fairfield County", "Bronx County", "Orange County",
    "Franklin Parish", "Sierra County", "Mobile County", "Huron County",
    "Kittitas County", "Mesa County", "Dauphin County", "Levy County",
    "Barrow County", "Oglethorpe County", "Pennington County",
    "Perry County", "Halifax County", "Dona Ana County")
  private val cities = Seq("Midway", "Fairview", "Oak Grove", "Five Points",
    "Pleasant Hill", "Centerville", "Liberty", "Salem", "Glendale",
    "Marion", "Union", "Wilson", "Greenfield", "Clinton", "Springdale",
    "Shiloh", "Mount Olive", "Kingston", "Woodville", "Bethel",
    "Highland", "Brownsville", "Georgetown", "Ashland", "Riverside",
    "Sulphur Springs", "Pine Grove", "Harmony", "Concord", "Antioch",
    "Lakeview", "Newport", "Oakdale", "Hopewell", "Friendship",
    "Cedar Grove", "Farmington", "Jamestown", "Clifton", "Waterloo")
  private val colors = Seq("red", "blue", "green", "yellow", "black",
    "white", "purple", "orange", "pink", "brown", "gray", "cyan",
    "magenta", "olive", "navy", "teal", "maroon", "beige", "ivory", "gold",
    // dsdgen color vocabulary referenced by query constants (Q41 etc.)
    "powder", "khaki", "honeydew", "floral", "deep", "light",
    "cornflower", "midnight", "snow", "papaya", "frosted", "forest", "ghost",
    "slate", "blanched", "burnished")
  private val brandBases = Seq("amalgamalg", "importoamalg", "edu packamalg",
    "exportiamalg", "scholaramalgamalg", "amalgimporto", "edu packscholar",
    "exportiimporto", "exportiunivamalg", "univamalgamalg", "amalgnameless",
    "maxibrand")
  private val buyPotentials = Seq(">10000", "5001-10000", "1001-5000",
    "501-1000", "0-500", "Unknown")
  private val eduLevels = Seq("Primary", "Secondary", "College",
    "2 yr Degree", "4 yr Degree", "Advanced Degree", "Unknown")
  private val maritals = Seq("M", "S", "D", "W", "U")
  private val credits = Seq("Low Risk", "Good", "High Risk", "Unknown")
  private val countriesList = Seq("United States", "Canada", "Mexico",
    "Brazil", "Germany", "France", "Japan", "India", "China", "Italy")

  // ----- generation -----------------------------------------------------
  private def generate(spark: SparkSession, sf: Double, out: String): Unit = {
    val z = sizes(sf)

    def rng(n: Long): DataFrame = spark.range(n).toDF("id")
    def save(df: DataFrame, name: String, parts: Int = 0): Unit = {
      val d = if (parts > 0) df.repartition(parts) else df
      d.write.mode("overwrite").parquet(s"$out/$name")
    }

    // date_dim: 1998-01-01 is a Thursday; week_seq aligns Sunday starts
    val dd = rng(nDates)
      .withColumn("d_date", date_add(lit("1998-01-01").cast("date"), col("id").cast("int")))
      .select(
        col("id").as("d_date_sk"),
        concat(lit("AAAAAAAA"), lpad(col("id").cast("string"), 8, "0")).as("d_date_id"),
        col("d_date"),
        year(col("d_date")).as("d_year"),
        month(col("d_date")).as("d_moy"),
        dayofmonth(col("d_date")).as("d_dom"),
        quarter(col("d_date")).as("d_qoy"),
        (dayofweek(col("d_date")) - 1).as("d_dow"), // Sunday = 0
        date_format(col("d_date"), "EEEE").as("d_day_name"),
        ((year(col("d_date")) - 1900) * 12 + month(col("d_date")) - 1).as("d_month_seq"),
        (idiv(col("id") + 4, 7) + 5270).as("d_week_seq"),
        (year(col("d_date")) * 10 + quarter(col("d_date"))).as("d_quarter_seq"),
        concat(year(col("d_date")), lit("Q"), quarter(col("d_date"))).as("d_quarter_name"),
        when(dayofweek(col("d_date")).isin(1, 7), lit("Y")).otherwise(lit("N")).as("d_weekend"),
        lit(0).as("d_holiday"),
        year(col("d_date")).as("d_fy_year"))
    save(dd, "date_dim")

    val td = rng(nTimes)
      .withColumn("t_time", col("id") * 10)
      .select(
        col("id").as("t_time_sk"),
        col("t_time"),
        idiv(col("t_time"), 3600).cast("int").as("t_hour"),
        idiv(pmod(col("t_time"), lit(3600)), 60).cast("int").as("t_minute"),
        pmod(col("t_time"), lit(60)).cast("int").as("t_second"),
        when(idiv(col("t_time"), 3600) < 12, lit("AM")).otherwise(lit("PM")).as("t_am_pm"),
        when(idiv(col("t_time"), 3600).between(6, 8), lit("breakfast"))
          .when(idiv(col("t_time"), 3600).between(11, 13), lit("dinner"))
          .otherwise(lit(null: String)).as("t_meal_time"))
    save(td, "time_dim")

    val item = rng(z.items).select(
      col("id").as("i_item_sk"),
      concat(lit("ITEM"), lpad(col("id").cast("string"), 12, "0")).as("i_item_id"),
      concat(lit("Description of item "), col("id"), lit(" "),
        pick("idesc", col("id"), colors)).as("i_item_desc"),
      pick("icat", col("id"), categories).as("i_category"),
      (pmod(col("id"), lit(categories.length)) + 1).cast("int").as("i_category_id"),
      // real dsdgen class names so query constants (Q89's 'computers',
      // 'football', Q36's output classes) resolve; drawn independently
      // of category like a hash, which keeps every (category, class)
      // combination populated
      pick("iclass", col("id"), Seq("computers", "stereo", "football",
        "shirts", "birdal", "dresses", "womens", "pants", "glassware",
        "swimwear", "flatware", "scanners", "classical", "fiction",
        "romance", "mystery", "baseball", "basketball", "camping",
        "optics", "personal", "portable", "reference", "self-help",
        "accessories", "fragrances")).as("i_class"),
      (pmod(col("id"), lit(20)) + 1).cast("int").as("i_class_id"),
      (lit(1001001) + pmod(col("id"), lit(900)).cast("int")).as("i_brand_id"),
      // dsdgen-style brand names so brand-constant filters (Q53's
      // 'scholaramalgamalg #14' etc.) resolve
      concat(pick("ibrand", col("id"), brandBases), lit(" #"),
        (H("ibrandn", col("id"), 15) + 1)).as("i_brand"),
      pmod(col("id"), lit(1000)).cast("int").as("i_manufact_id"),
      concat(lit("mfg#"), pmod(col("id"), lit(1000))).as("i_manufact"),
      ((H("iprice", col("id"), 9900) + 100) / 100.0).as("i_current_price"),
      ((H("iwhole", col("id"), 6000) + 50) / 100.0).as("i_wholesale_cost"),
      pick("icolor", col("id"), colors).as("i_color"),
      pick("iunit", col("id"), Seq("Each", "Dozen", "Case", "Pallet", "Gross",
        "Box", "Bundle", "Carton", "Ounce", "Pound", "Oz", "Bunch", "Ton",
        "N/A", "Cup", "Dram", "Tbl", "Lb")).as("i_units"),
      pick("isize", col("id"), Seq("small", "medium", "large", "extra large",
        "economy", "petite", "N/A")).as("i_size"),
      pmod(col("id"), lit(100)).cast("int").as("i_manager_id"),
      concat(lit("product"), col("id")).as("i_product_name"))
    save(item, "item")

    val cust = rng(z.customers).select(
      col("id").as("c_customer_sk"),
      concat(lit("CUST"), lpad(col("id").cast("string"), 12, "0")).as("c_customer_id"),
      H("caddr", col("id"), z.addrs).as("c_current_addr_sk"),
      H("ccdemo", col("id"), nCdemo).as("c_current_cdemo_sk"),
      H("chdemo", col("id"), nHdemo).as("c_current_hdemo_sk"),
      pick("cfirst", col("id"), firstNames).as("c_first_name"),
      pick("clast", col("id"), lastNames).as("c_last_name"),
      when(H("cpref", col("id"), 2) === 0, lit("Y")).otherwise(lit("N")).as("c_preferred_cust_flag"),
      pick("cctry", col("id"), countriesList).as("c_birth_country"),
      (H("cbm", col("id"), 12) + 1).cast("int").as("c_birth_month"),
      (H("cby", col("id"), 60) + 1930).cast("int").as("c_birth_year"),
      (H("cbd", col("id"), 28) + 1).cast("int").as("c_birth_day"),
      H("clrd", col("id"), nDates).as("c_last_review_date_sk"),
      pick("csal", col("id"), Seq("Mr.", "Mrs.", "Ms.", "Dr.", "Miss", "Sir")).as("c_salutation"),
      concat(lit("user"), col("id"), lit("@example.com")).as("c_email_address"),
      H("cfsd", col("id"), nDates).as("c_first_sales_date_sk"),
      least(H("cfsd", col("id"), nDates) + 30, lit(nDates - 1)).as("c_first_shipto_date_sk"),
      lit(null: String).as("c_login"))
    save(cust, "customer")

    val ca = rng(z.addrs).select(
      col("id").as("ca_address_sk"),
      concat(lit("ADDR"), lpad(col("id").cast("string"), 12, "0")).as("ca_address_id"),
      pick("cast8", col("id"), states).as("ca_state"),
      pick("cacnty", col("id"), counties).as("ca_county"),
      pick("cacity", col("id"), cities).as("ca_city"),
      lpad((H("cazip", col("id"), 90000) + 10000).cast("string"), 5, "0").as("ca_zip"),
      lit("United States").as("ca_country"),
      (lit(-5) - H("cagmt", col("id"), 4)).cast("int").cast("double").as("ca_gmt_offset"),
      (H("casn", col("id"), 999) + 1).cast("string").as("ca_street_number"),
      concat(pick("casname", col("id"), cities), lit(" ") ,
        pick("castype0", col("id"), Seq("Oak", "Main", "First", "Elm", "Park"))).as("ca_street_name"),
      pick("castype", col("id"), Seq("St", "Ave", "Blvd", "Way", "Dr", "Ct", "Ln")).as("ca_street_type"),
      concat(lit("Suite "), H("casuite", col("id"), 600)).as("ca_suite_number"),
      pick("caloc", col("id"), Seq("apartment", "condo", "single family")).as("ca_location_type"))
    save(ca, "customer_address")

    // full cross product: 2 x 5 x 7 x 20 x 4 = 5600 rows
    val cd = rng(nCdemo).select(
      col("id").as("cd_demo_sk"),
      when(pmod(col("id"), lit(2)) === 0, lit("M")).otherwise(lit("F")).as("cd_gender"),
      element_at(array(maritals.map(lit): _*),
        (pmod(idiv(col("id"), 2), lit(5)) + 1).cast("int")).as("cd_marital_status"),
      element_at(array(eduLevels.map(lit): _*),
        (pmod(idiv(col("id"), 10), lit(7)) + 1).cast("int")).as("cd_education_status"),
      ((pmod(idiv(col("id"), 70), lit(20)) + 1) * 500).cast("int").as("cd_purchase_estimate"),
      element_at(array(credits.map(lit): _*),
        (pmod(idiv(col("id"), 1400), lit(4)) + 1).cast("int")).as("cd_credit_rating"),
      H("cddep", col("id"), 7).cast("int").as("cd_dep_count"),
      H("cddepe", col("id"), 7).cast("int").as("cd_dep_employed_count"),
      H("cddepc", col("id"), 7).cast("int").as("cd_dep_college_count"))
    save(cd, "customer_demographics")

    val hd = rng(nHdemo).select(
      col("id").as("hd_demo_sk"),
      pmod(col("id"), lit(nBands)).as("hd_income_band_sk"),
      element_at(array(buyPotentials.map(lit): _*),
        (pmod(idiv(col("id"), 20), lit(6)) + 1).cast("int")).as("hd_buy_potential"),
      pmod(idiv(col("id"), 120), lit(10)).cast("int").as("hd_dep_count"),
      pmod(idiv(col("id"), 1200), lit(6)).cast("int").as("hd_vehicle_count"))
    save(hd, "household_demographics")

    val ib = rng(nBands).select(
      col("id").as("ib_income_band_sk"),
      (col("id") * 10000).cast("int").as("ib_lower_bound"),
      ((col("id") + 1) * 10000 - 1).cast("int").as("ib_upper_bound"))
    save(ib, "income_band")

    val store = rng(z.stores).select(
      col("id").as("s_store_sk"),
      concat(lit("STORE"), lpad(col("id").cast("string"), 8, "0")).as("s_store_id"),
      concat(pick("sname", col("id"), Seq("ese", "ought", "able", "pri",
        "cally", "ation", "eing", "bar", "anti", "cation"))).as("s_store_name"),
      pick("sstate", col("id"), states).as("s_state"),
      // stores draw from SHORT county/city lists so the literal
      // constants in TPC-DS queries (Q73's counties, Q68's cities)
      // always have matching stores even with few stores at small sf
      pick("scnty", col("id"), Seq("Williamson County", "Orange County",
        "Bronx County", "Franklin Parish", "Ziebach County",
        "Walker County")).as("s_county"),
      pick("scity", col("id"), Seq("Fairview", "Midway", "Five Points",
        "Oak Grove", "Pleasant Hill", "Centerville")).as("s_city"),
      (H("semp", col("id"), 100) + 200).cast("int").as("s_number_employees"),
      (H("sfloor", col("id"), 5000000) + 5000000).cast("int").as("s_floor_space"),
      pick("shours", col("id"), Seq("8AM-8PM", "8AM-4PM", "8AM-12AM")).as("s_hours"),
      concat(pick("smgrf", col("id"), firstNames), lit(" "),
        pick("smgrl", col("id"), lastNames)).as("s_manager"),
      (H("smkt", col("id"), 10) + 1).cast("int").as("s_market_id"),
      lit(1).as("s_company_id"),
      lit("Unknown").as("s_company_name"),
      lpad((H("szip", col("id"), 90000) + 10000).cast("string"), 5, "0").as("s_zip"),
      lit(-5.0).as("s_gmt_offset"),
      (H("ssn", col("id"), 999) + 1).cast("string").as("s_street_number"),
      pick("ssnm", col("id"), Seq("Main", "Oak", "First", "Elm", "Park",
        "Cedar", "Maple", "Pine")).as("s_street_name"),
      pick("sst", col("id"), Seq("St", "Ave", "Blvd", "Way", "Dr")).as("s_street_type"),
      concat(lit("Suite "), H("ssu", col("id"), 600)).as("s_suite_number"))
    save(store, "store", parts = 1)

    val promo = rng(z.promos).select(
      col("id").as("p_promo_sk"),
      concat(lit("PROMO"), lpad(col("id").cast("string"), 8, "0")).as("p_promo_id"),
      when(H("pdm", col("id"), 10) === 0, lit("Y")).otherwise(lit("N")).as("p_channel_dmail"),
      when(H("pem", col("id"), 10) === 0, lit("Y")).otherwise(lit("N")).as("p_channel_email"),
      when(H("pev", col("id"), 10) === 0, lit("Y")).otherwise(lit("N")).as("p_channel_event"),
      when(H("ptv", col("id"), 10) === 0, lit("Y")).otherwise(lit("N")).as("p_channel_tv"),
      pick("pname", col("id"), Seq("ese", "ought", "able", "pri", "cally",
        "ation", "eing", "bar", "anti", "cation")).as("p_promo_name"))
    save(promo, "promotion", parts = 1)

    val wh = rng(z.warehouses).select(
      col("id").as("w_warehouse_sk"),
      concat(lit("Warehouse "), pick("wname", col("id"), cities)).as("w_warehouse_name"),
      (H("wsqft", col("id"), 900000) + 100000).cast("int").as("w_warehouse_sq_ft"),
      pick("wcity", col("id"), cities).as("w_city"),
      pick("wcnty", col("id"), counties).as("w_county"),
      pick("wstate", col("id"), states).as("w_state"),
      lit("United States").as("w_country"))
    save(wh, "warehouse", parts = 1)

    val sm = rng(20).select(
      col("id").as("sm_ship_mode_sk"),
      concat(lit("SM"), lpad(col("id").cast("string"), 6, "0")).as("sm_ship_mode_id"),
      element_at(array(Seq("EXPRESS", "NEXT DAY", "OVERNIGHT", "REGULAR",
        "LIBRARY").map(lit): _*), (pmod(col("id"), lit(5)) + 1).cast("int")).as("sm_type"),
      pick("smcar", col("id"), Seq("UPS", "FEDEX", "AIRBORNE", "USPS", "DHL",
        "TBS", "ZHOU", "ZOUROS", "MSC", "LATVIAN")).as("sm_carrier"),
      concat(lit("code"), pmod(col("id"), lit(5))).as("sm_code"))
    save(sm, "ship_mode", parts = 1)

    val reason = rng(35).select(
      col("id").as("r_reason_sk"),
      concat(lit("REASON"), lpad(col("id").cast("string"), 4, "0")).as("r_reason_id"),
      concat(lit("reason "), col("id")).as("r_reason_desc"))
    save(reason, "reason", parts = 1)

    val cc = rng(z.callCenters).select(
      col("id").as("cc_call_center_sk"),
      concat(lit("CC"), lpad(col("id").cast("string"), 6, "0")).as("cc_call_center_id"),
      concat(pick("ccname", col("id"), Seq("NY Metro", "Mid Atlantic",
        "North Midwest", "California", "Pacific Northwest"))).as("cc_name"),
      pick("cccnty", col("id"), counties).as("cc_county"),
      concat(pick("ccmgrf", col("id"), firstNames), lit(" "),
        pick("ccmgrl", col("id"), lastNames)).as("cc_manager"))
    save(cc, "call_center", parts = 1)

    val ws0 = rng(z.webSites).select(
      col("id").as("web_site_sk"),
      concat(lit("WEB"), lpad(col("id").cast("string"), 6, "0")).as("web_site_id"),
      concat(lit("site_"), pmod(col("id"), lit(10))).as("web_name"),
      lit("pri").as("web_company_name"))
    save(ws0, "web_site", parts = 1)

    val wp = rng(z.webPages).select(
      col("id").as("wp_web_page_sk"),
      concat(lit("WP"), lpad(col("id").cast("string"), 8, "0")).as("wp_web_page_id"),
      (lit(2000) + pmod(col("id"), lit(60)) * 100).cast("int").as("wp_char_count"),
      (H("wplink", col("id"), 25) + 2).cast("int").as("wp_link_count"),
      (H("wpimg", col("id"), 7) + 1).cast("int").as("wp_image_count"),
      when(H("wpauto", col("id"), 2) === 0, lit("Y")).otherwise(lit("N")).as("wp_autogen_flag"))
    save(wp, "web_page", parts = 1)

    val cp = rng(z.catalogPages).select(
      col("id").as("cp_catalog_page_sk"),
      concat(lit("CP"), lpad(col("id").cast("string"), 10, "0")).as("cp_catalog_page_id"),
      pmod(col("id"), lit(100)).cast("int").as("cp_catalog_page_number"),
      idiv(col("id"), 100).cast("int").as("cp_catalog_number"))
    save(cp, "catalog_page", parts = 1)

    // ---- store_sales: ~3 line items per ticket; ticket-level attrs are
    // keyed by ticket so baskets are coherent. Half the line items come
    // from the customer's 5 "favorite" items — a joint (customer, item)
    // distribution shared with catalog_sales so cross-channel queries
    // (Q25/Q29: store buy -> store return -> catalog re-buy by the same
    // customer+item) actually find matches -----------------------------
    def favoriteItem(cust: Column, slot: Column): Column =
      pmod(xxhash64(lit("affin"), cust, slot), lit(z.items))
    val ssParts = math.max(8, (z.storeSales / 200000L).toInt)
    val ss = rng(z.storeSales)
      // ~1/12 of 6-ticket groups merge into one 18-item basket
      // (negative ticket ids, disjoint from the normal range) so
      // basket-size-band queries (Q34's 15..20) have matches; the rest
      // are 3-item tickets
      .withColumn("tkt0", idiv(col("id"), 3))
      .withColumn("tkt",
        when(H("bigb", idiv(col("tkt0"), 6), 12) === 0,
          -(idiv(col("tkt0"), 6) + 1))
          .otherwise(col("tkt0")))
      .withColumn("cust", when(H("sscn", col("tkt"), 50) === 0, lit(null: java.lang.Long))
        .otherwise(H("ssc", col("tkt"), z.customers)))
      .withColumn("itm",
        when(H("ssaff", col("id"), 2) === 0 && col("cust").isNotNull,
          favoriteItem(col("cust"), H("ssfav", col("id"), 5)))
          .otherwise(H("ssi", col("id"), z.items)))
      .withColumn("qty", (H("ssq", col("id"), 100) + 1).cast("int"))
      .withColumn("wc_c", H("sswc", col("id"), 6000) + 50)
      .withColumn("lp_c", idiv(col("wc_c") * (lit(120) + H("sslp", col("id"), 80)), 100))
      .withColumn("sp_c", idiv(col("lp_c") * (lit(30) + H("sssp", col("id"), 70)), 100))
      .withColumn("ext_sp_c", col("sp_c") * col("qty"))
      .withColumn("coup_c", idiv(col("ext_sp_c") * H("sscp", col("id"), 30), 100))
      .withColumn("tax_c", idiv((col("ext_sp_c") - col("coup_c")) * 8, 100))
      .select(
        H("ssd", col("tkt"), nDates).as("ss_sold_date_sk"),
        H("sst", col("tkt"), nTimes).as("ss_sold_time_sk"),
        col("itm").as("ss_item_sk"),
        col("cust").as("ss_customer_sk"),
        H("sscd", col("tkt"), nCdemo).as("ss_cdemo_sk"),
        H("ssh", col("tkt"), nHdemo).as("ss_hdemo_sk"),
        when(H("ssan", col("tkt"), 60) === 0, lit(null: java.lang.Long))
          .otherwise(H("ssa", col("tkt"), z.addrs)).as("ss_addr_sk"),
        when(H("ssnn", col("tkt"), 60) === 0, lit(null: java.lang.Long))
          .otherwise(H("sss", col("tkt"), z.stores)).as("ss_store_sk"),
        when(H("sspn", col("id"), 20) === 0, lit(null: java.lang.Long))
          .otherwise(H("ssp", col("id"), z.promos)).as("ss_promo_sk"),
        col("tkt").as("ss_ticket_number"),
        col("qty").as("ss_quantity"),
        (col("wc_c") / 100.0).as("ss_wholesale_cost"),
        (col("lp_c") / 100.0).as("ss_list_price"),
        (col("sp_c") / 100.0).as("ss_sales_price"),
        ((col("lp_c") - col("sp_c")) * col("qty") / 100.0).as("ss_ext_discount_amt"),
        (col("ext_sp_c") / 100.0).as("ss_ext_sales_price"),
        (col("wc_c") * col("qty") / 100.0).as("ss_ext_wholesale_cost"),
        (col("lp_c") * col("qty") / 100.0).as("ss_ext_list_price"),
        (col("tax_c") / 100.0).as("ss_ext_tax"),
        (col("coup_c") / 100.0).as("ss_coupon_amt"),
        ((col("ext_sp_c") - col("coup_c")) / 100.0).as("ss_net_paid"),
        ((col("ext_sp_c") - col("coup_c") + col("tax_c")) / 100.0).as("ss_net_paid_inc_tax"),
        ((col("ext_sp_c") - col("coup_c") - col("wc_c") * col("qty")) / 100.0).as("ss_net_profit"))
    save(ss, "store_sales", parts = ssParts)

    // store_returns: 10% of sales rows, return linked by (ticket, item)
    val ssAll = spark.read.parquet(s"$out/store_sales")
    val sr = ssAll
      .filter(pmod(xxhash64(lit("srsel"), col("ss_ticket_number"), col("ss_item_sk")), lit(10)) === 0)
      .withColumn("rq", (pmod(xxhash64(lit("srq"), col("ss_ticket_number"), col("ss_item_sk")),
        col("ss_quantity")) + 1).cast("int"))
      .withColumn("amt_c", (round(col("ss_sales_price") * 100).cast("long") * col("rq")))
      .select(
        least(col("ss_sold_date_sk") + 1 +
          pmod(xxhash64(lit("srd"), col("ss_ticket_number"), col("ss_item_sk")), lit(60)),
          lit(nDates - 1)).as("sr_returned_date_sk"),
        col("ss_sold_time_sk").as("sr_return_time_sk"),
        col("ss_item_sk").as("sr_item_sk"),
        col("ss_customer_sk").as("sr_customer_sk"),
        col("ss_cdemo_sk").as("sr_cdemo_sk"),
        col("ss_hdemo_sk").as("sr_hdemo_sk"),
        col("ss_addr_sk").as("sr_addr_sk"),
        col("ss_store_sk").as("sr_store_sk"),
        pmod(xxhash64(lit("srr"), col("ss_ticket_number"), col("ss_item_sk")), lit(35)).as("sr_reason_sk"),
        col("ss_ticket_number").as("sr_ticket_number"),
        col("rq").as("sr_return_quantity"),
        (col("amt_c") / 100.0).as("sr_return_amt"),
        (idiv(col("amt_c") * 8, 100) / 100.0).as("sr_return_tax"),
        ((col("amt_c") + idiv(col("amt_c") * 8, 100)) / 100.0).as("sr_return_amt_inc_tax"),
        (pmod(xxhash64(lit("srf"), col("ss_ticket_number")), lit(10000)) / 100.0).as("sr_fee"),
        (idiv(col("amt_c"), 10) / 100.0).as("sr_return_ship_cost"),
        (idiv(col("amt_c") * 6, 10) / 100.0).as("sr_refunded_cash"),
        (idiv(col("amt_c") * 2, 10) / 100.0).as("sr_reversed_charge"),
        ((col("amt_c") - idiv(col("amt_c") * 6, 10) - idiv(col("amt_c") * 2, 10)) / 100.0).as("sr_store_credit"),
        ((col("amt_c") + idiv(col("amt_c") * 8, 100) - idiv(col("amt_c") * 6, 10)) / 100.0).as("sr_net_loss"))
    save(sr, "store_returns", parts = math.max(2, ssParts / 4))

    // ---- catalog_sales: ~4 line items per order ------------------------
    val csParts = math.max(4, (z.catalogSales / 200000L).toInt)
    val cs = rng(z.catalogSales)
      .withColumn("ord", idiv(col("id"), 4))
      .withColumn("cust", H("csc", col("ord"), z.customers))
      .withColumn("itm",
        when(H("csaff", col("id"), 2) === 0,
          favoriteItem(col("cust"), H("csfav", col("id"), 5)))
          .otherwise(H("csi", col("id"), z.items)))
      .withColumn("qty", (H("csq", col("id"), 100) + 1).cast("int"))
      .withColumn("wc_c", H("cswc", col("id"), 6000) + 50)
      .withColumn("lp_c", idiv(col("wc_c") * (lit(120) + H("cslp", col("id"), 80)), 100))
      .withColumn("sp_c", idiv(col("lp_c") * (lit(30) + H("cssp", col("id"), 70)), 100))
      .withColumn("ext_sp_c", col("sp_c") * col("qty"))
      .withColumn("disc_c", (col("lp_c") - col("sp_c")) * col("qty"))
      .withColumn("tax_c", idiv(col("ext_sp_c") * 8, 100))
      .withColumn("ship_c", idiv(col("ext_sp_c"), 10))
      .select(
        H("csd", col("ord"), nDates).as("cs_sold_date_sk"),
        H("cst", col("ord"), nTimes).as("cs_sold_time_sk"),
        least(H("csd", col("ord"), nDates) + 2 + H("cssd", col("id"), 90),
          lit(nDates - 1)).as("cs_ship_date_sk"),
        col("cust").as("cs_bill_customer_sk"),
        H("cscd", col("ord"), nCdemo).as("cs_bill_cdemo_sk"),
        H("csh", col("ord"), nHdemo).as("cs_bill_hdemo_sk"),
        H("csa", col("ord"), z.addrs).as("cs_bill_addr_sk"),
        when(H("cssame", col("ord"), 10) < 8, col("cust"))
          .otherwise(H("csc2", col("ord"), z.customers)).as("cs_ship_customer_sk"),
        when(H("csnn", col("ord"), 60) === 0, lit(null: java.lang.Long))
          .when(H("cssame", col("ord"), 10) < 8, H("csa", col("ord"), z.addrs))
          .otherwise(H("csa2", col("ord"), z.addrs)).as("cs_ship_addr_sk"),
        H("cscc", col("ord"), z.callCenters).as("cs_call_center_sk"),
        H("cscp", col("id"), z.catalogPages).as("cs_catalog_page_sk"),
        H("cssm", col("ord"), 20).as("cs_ship_mode_sk"),
        H("csw", col("id"), z.warehouses).as("cs_warehouse_sk"),
        col("itm").as("cs_item_sk"),
        when(H("cspn", col("id"), 20) === 0, lit(null: java.lang.Long))
          .otherwise(H("csp", col("id"), z.promos)).as("cs_promo_sk"),
        col("ord").as("cs_order_number"),
        col("qty").as("cs_quantity"),
        (col("wc_c") / 100.0).as("cs_wholesale_cost"),
        (col("lp_c") / 100.0).as("cs_list_price"),
        (col("sp_c") / 100.0).as("cs_sales_price"),
        (col("disc_c") / 100.0).as("cs_ext_discount_amt"),
        (col("ext_sp_c") / 100.0).as("cs_ext_sales_price"),
        (col("wc_c") * col("qty") / 100.0).as("cs_ext_wholesale_cost"),
        (col("lp_c") * col("qty") / 100.0).as("cs_ext_list_price"),
        (col("tax_c") / 100.0).as("cs_ext_tax"),
        lit(0.0).as("cs_coupon_amt"),
        (col("ship_c") / 100.0).as("cs_ext_ship_cost"),
        (col("ext_sp_c") / 100.0).as("cs_net_paid"),
        ((col("ext_sp_c") + col("tax_c")) / 100.0).as("cs_net_paid_inc_tax"),
        ((col("ext_sp_c") + col("ship_c")) / 100.0).as("cs_net_paid_inc_ship"),
        ((col("ext_sp_c") + col("ship_c") + col("tax_c")) / 100.0).as("cs_net_paid_inc_ship_tax"),
        ((col("ext_sp_c") - col("wc_c") * col("qty")) / 100.0).as("cs_net_profit"))
    save(cs, "catalog_sales", parts = csParts)

    val csAll = spark.read.parquet(s"$out/catalog_sales")
    val cr = csAll
      .filter(pmod(xxhash64(lit("crsel"), col("cs_order_number"), col("cs_item_sk")), lit(10)) === 0)
      .withColumn("rq", (pmod(xxhash64(lit("crq"), col("cs_order_number"), col("cs_item_sk")),
        col("cs_quantity")) + 1).cast("int"))
      .withColumn("amt_c", (round(col("cs_sales_price") * 100).cast("long") * col("rq")))
      .select(
        least(col("cs_ship_date_sk") + 1 +
          pmod(xxhash64(lit("crd"), col("cs_order_number"), col("cs_item_sk")), lit(60)),
          lit(nDates - 1)).as("cr_returned_date_sk"),
        col("cs_item_sk").as("cr_item_sk"),
        col("cs_bill_customer_sk").as("cr_refunded_customer_sk"),
        col("cs_ship_customer_sk").as("cr_returning_customer_sk"),
        col("cs_bill_addr_sk").as("cr_refunded_addr_sk"),
        col("cs_ship_addr_sk").as("cr_returning_addr_sk"),
        col("cs_call_center_sk").as("cr_call_center_sk"),
        col("cs_catalog_page_sk").as("cr_catalog_page_sk"),
        col("cs_ship_mode_sk").as("cr_ship_mode_sk"),
        col("cs_warehouse_sk").as("cr_warehouse_sk"),
        pmod(xxhash64(lit("crr"), col("cs_order_number"), col("cs_item_sk")), lit(35)).as("cr_reason_sk"),
        col("cs_order_number").as("cr_order_number"),
        col("rq").as("cr_return_quantity"),
        (col("amt_c") / 100.0).as("cr_return_amount"),
        (idiv(col("amt_c") * 8, 100) / 100.0).as("cr_return_tax"),
        ((col("amt_c") + idiv(col("amt_c") * 8, 100)) / 100.0).as("cr_return_amt_inc_tax"),
        (pmod(xxhash64(lit("crf"), col("cs_order_number")), lit(10000)) / 100.0).as("cr_fee"),
        (idiv(col("amt_c"), 10) / 100.0).as("cr_return_ship_cost"),
        (idiv(col("amt_c") * 6, 10) / 100.0).as("cr_refunded_cash"),
        (idiv(col("amt_c") * 2, 10) / 100.0).as("cr_reversed_charge"),
        ((col("amt_c") - idiv(col("amt_c") * 6, 10) - idiv(col("amt_c") * 2, 10)) / 100.0).as("cr_store_credit"),
        ((col("amt_c") + idiv(col("amt_c") * 8, 100) - idiv(col("amt_c") * 6, 10)) / 100.0).as("cr_net_loss"))
    save(cr, "catalog_returns", parts = math.max(2, csParts / 4))

    // ---- web_sales: ~3 items per order; warehouse varies WITHIN an
    // order (per item) so Q94's multi-warehouse EXISTS has matches ------
    val wsParts = math.max(4, (z.webSales / 200000L).toInt)
    val ws = rng(z.webSales)
      .withColumn("ord", idiv(col("id"), 3))
      .withColumn("qty", (H("wsq", col("id"), 100) + 1).cast("int"))
      .withColumn("wc_c", H("wswc", col("id"), 6000) + 50)
      .withColumn("lp_c", idiv(col("wc_c") * (lit(120) + H("wslp", col("id"), 80)), 100))
      .withColumn("sp_c", idiv(col("lp_c") * (lit(30) + H("wssp", col("id"), 70)), 100))
      .withColumn("ext_sp_c", col("sp_c") * col("qty"))
      .withColumn("tax_c", idiv(col("ext_sp_c") * 8, 100))
      .withColumn("ship_c", idiv(col("ext_sp_c"), 10))
      .select(
        H("wsd", col("ord"), nDates).as("ws_sold_date_sk"),
        H("wst", col("ord"), nTimes).as("ws_sold_time_sk"),
        least(H("wsd", col("ord"), nDates) + 1 + H("wssd", col("id"), 120),
          lit(nDates - 1)).as("ws_ship_date_sk"),
        H("wsi", col("id"), z.items).as("ws_item_sk"),
        H("wsc", col("ord"), z.customers).as("ws_bill_customer_sk"),
        H("wscd", col("ord"), nCdemo).as("ws_bill_cdemo_sk"),
        H("wsh", col("ord"), nHdemo).as("ws_bill_hdemo_sk"),
        H("wsh", col("ord"), nHdemo).as("ws_ship_hdemo_sk"),
        H("wsa", col("ord"), z.addrs).as("ws_bill_addr_sk"),
        when(H("wsnn", col("ord"), 60) === 0, lit(null: java.lang.Long))
          .otherwise(H("wsc", col("ord"), z.customers)).as("ws_ship_customer_sk"),
        H("wsa", col("ord"), z.addrs).as("ws_ship_addr_sk"),
        H("wsweb", col("ord"), z.webSites).as("ws_web_site_sk"),
        H("wswp", col("id"), z.webPages).as("ws_web_page_sk"),
        H("wssm", col("ord"), 20).as("ws_ship_mode_sk"),
        H("wsw", col("id"), z.warehouses).as("ws_warehouse_sk"),
        when(H("wspn", col("id"), 20) === 0, lit(null: java.lang.Long))
          .otherwise(H("wsp", col("id"), z.promos)).as("ws_promo_sk"),
        col("ord").as("ws_order_number"),
        col("qty").as("ws_quantity"),
        (col("wc_c") / 100.0).as("ws_wholesale_cost"),
        (col("lp_c") / 100.0).as("ws_list_price"),
        (col("sp_c") / 100.0).as("ws_sales_price"),
        ((col("lp_c") - col("sp_c")) * col("qty") / 100.0).as("ws_ext_discount_amt"),
        (col("ext_sp_c") / 100.0).as("ws_ext_sales_price"),
        (col("wc_c") * col("qty") / 100.0).as("ws_ext_wholesale_cost"),
        (col("lp_c") * col("qty") / 100.0).as("ws_ext_list_price"),
        (col("tax_c") / 100.0).as("ws_ext_tax"),
        lit(0.0).as("ws_coupon_amt"),
        (col("ship_c") / 100.0).as("ws_ext_ship_cost"),
        (col("ext_sp_c") / 100.0).as("ws_net_paid"),
        ((col("ext_sp_c") + col("tax_c")) / 100.0).as("ws_net_paid_inc_tax"),
        ((col("ext_sp_c") + col("ship_c")) / 100.0).as("ws_net_paid_inc_ship"),
        ((col("ext_sp_c") + col("ship_c") + col("tax_c")) / 100.0).as("ws_net_paid_inc_ship_tax"),
        ((col("ext_sp_c") - col("wc_c") * col("qty")) / 100.0).as("ws_net_profit"))
    save(ws, "web_sales", parts = wsParts)

    val wsAll = spark.read.parquet(s"$out/web_sales")
    val wr = wsAll
      .filter(pmod(xxhash64(lit("wrsel"), col("ws_order_number"), col("ws_item_sk")), lit(10)) === 0)
      .withColumn("rq", (pmod(xxhash64(lit("wrq"), col("ws_order_number"), col("ws_item_sk")),
        col("ws_quantity")) + 1).cast("int"))
      .withColumn("amt_c", (round(col("ws_sales_price") * 100).cast("long") * col("rq")))
      .select(
        least(col("ws_ship_date_sk") + 1 +
          pmod(xxhash64(lit("wrd"), col("ws_order_number"), col("ws_item_sk")), lit(60)),
          lit(nDates - 1)).as("wr_returned_date_sk"),
        col("ws_item_sk").as("wr_item_sk"),
        col("ws_bill_customer_sk").as("wr_refunded_customer_sk"),
        col("ws_bill_cdemo_sk").as("wr_refunded_cdemo_sk"),
        col("ws_bill_addr_sk").as("wr_refunded_addr_sk"),
        col("ws_ship_customer_sk").as("wr_returning_customer_sk"),
        col("ws_bill_cdemo_sk").as("wr_returning_cdemo_sk"),
        col("ws_ship_addr_sk").as("wr_returning_addr_sk"),
        col("ws_web_page_sk").as("wr_web_page_sk"),
        pmod(xxhash64(lit("wrr"), col("ws_order_number"), col("ws_item_sk")), lit(35)).as("wr_reason_sk"),
        col("ws_order_number").as("wr_order_number"),
        col("rq").as("wr_return_quantity"),
        (col("amt_c") / 100.0).as("wr_return_amt"),
        (idiv(col("amt_c") * 8, 100) / 100.0).as("wr_return_tax"),
        ((col("amt_c") + idiv(col("amt_c") * 8, 100)) / 100.0).as("wr_return_amt_inc_tax"),
        (pmod(xxhash64(lit("wrf"), col("ws_order_number")), lit(10000)) / 100.0).as("wr_fee"),
        (idiv(col("amt_c"), 10) / 100.0).as("wr_return_ship_cost"),
        (idiv(col("amt_c") * 6, 10) / 100.0).as("wr_refunded_cash"),
        (idiv(col("amt_c") * 2, 10) / 100.0).as("wr_reversed_charge"),
        ((col("amt_c") - idiv(col("amt_c") * 6, 10) - idiv(col("amt_c") * 2, 10)) / 100.0).as("wr_account_credit"),
        ((col("amt_c") + idiv(col("amt_c") * 8, 100) - idiv(col("amt_c") * 6, 10)) / 100.0).as("wr_net_loss"))
    save(wr, "web_returns", parts = math.max(2, wsParts / 4))

    // inventory: weekly snapshots x item x warehouse
    val nWeeks = (nDates / 7).toInt // 260
    val invN = nWeeks.toLong * z.items * z.warehouses
    val inv = rng(invN)
      .withColumn("wk", pmod(col("id"), lit(nWeeks.toLong)))
      .withColumn("rest", idiv(col("id"), nWeeks.toLong))
      .select(
        (col("wk") * 7).as("inv_date_sk"),
        pmod(col("rest"), lit(z.items)).as("inv_item_sk"),
        idiv(col("rest"), z.items).as("inv_warehouse_sk"),
        H("invq", col("id"), 1000).cast("int").as("inv_quantity_on_hand"))
    save(inv, "inventory", parts = math.max(4, (invN / 500000L).toInt))
  }
}
