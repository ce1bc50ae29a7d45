package graft.queries

import graft.{Q, QueryModule}
import graft.sources.ClickBench

/** The full 43-query ClickBench suite (reference:
  * benchmark/hits/queries/00..42.sql) over the deterministic
  * denormalized `hits` table from `sources/ClickBench`. The SAME SQL
  * text runs in Spark (temp view) and in the DuckDB oracle
  * (read_parquet CTE over the same files), so every check is
  * engine-vs-engine on identical data.
  *
  * Determinism / portability conventions:
  *  - every aggregate output is explicitly aliased (auto-generated
  *    names differ between engines);
  *  - COUNT/SUM-of-int casts to BIGINT (DuckDB sums ints as HUGEINT);
  *  - every LIMIT/OFFSET query's ORDER BY is extended with the group
  *    keys so ties cannot make the cut engine-dependent (the official
  *    suite orders by the count alone; 17.sql has NO order by);
  *  - 28.sql's REGEXP_REPLACE backreference (`\1` vs `$1` — engines
  *    disagree) becomes the equivalent regexp_extract group, and the
  *    pattern uses [.] classes instead of backslash escapes (Spark
  *    string literals eat backslashes, DuckDB's don't);
  *  - HAVING > 100000 thresholds and deep OFFSETs are scaled to the
  *    generated row counts; point-lookup constants (19/40/41) are
  *    in-domain values.
  */
object ClickBenchQueries extends QueryModule {

  private def q(sql: String, headline: Boolean = false): Q = Q(
    (spark, dir) => { ClickBench.ensure(spark, dir); spark.sql(sql) },
    Some("WITH hits AS (SELECT * FROM read_parquet('" +
      ClickBench.dataDir("/root/testdata/sf0.01") + "/hits/*.parquet')) " + sql),
    headline)

  private val q00 = q("SELECT CAST(COUNT(*) AS BIGINT) AS c FROM hits")

  private val q01 = q(
    "SELECT CAST(COUNT(*) AS BIGINT) AS c FROM hits WHERE AdvEngineID <> 0")

  private val q02 = q("""
    SELECT CAST(SUM(AdvEngineID) AS BIGINT) AS s,
           CAST(COUNT(*) AS BIGINT) AS c,
           AVG(ResolutionWidth) AS avg_rw
    FROM hits""")

  private val q03 = q("SELECT AVG(UserID) AS avg_uid FROM hits")

  private val q04 = q(
    "SELECT CAST(COUNT(DISTINCT UserID) AS BIGINT) AS u FROM hits")

  private val q05 = q(
    "SELECT CAST(COUNT(DISTINCT SearchPhrase) AS BIGINT) AS p FROM hits")

  private val q06 = q(
    """SELECT CAST(MIN(EventDate) AS STRING) AS mind,
           CAST(MAX(EventDate) AS STRING) AS maxd FROM hits""")

  private val q07 = q("""
    SELECT AdvEngineID, CAST(COUNT(*) AS BIGINT) AS c
    FROM hits WHERE AdvEngineID <> 0
    GROUP BY AdvEngineID ORDER BY c DESC, AdvEngineID""")

  private val q08 = q("""
    SELECT RegionID, CAST(COUNT(DISTINCT UserID) AS BIGINT) AS u
    FROM hits GROUP BY RegionID
    ORDER BY u DESC, RegionID LIMIT 10""", headline = true)

  private val q09 = q("""
    SELECT RegionID,
           CAST(SUM(AdvEngineID) AS BIGINT) AS s,
           CAST(COUNT(*) AS BIGINT) AS c,
           AVG(ResolutionWidth) AS avg_rw,
           CAST(COUNT(DISTINCT UserID) AS BIGINT) AS u
    FROM hits GROUP BY RegionID
    ORDER BY c DESC, RegionID LIMIT 10""")

  private val q10 = q("""
    SELECT MobilePhoneModel, CAST(COUNT(DISTINCT UserID) AS BIGINT) AS u
    FROM hits WHERE MobilePhoneModel <> ''
    GROUP BY MobilePhoneModel
    ORDER BY u DESC, MobilePhoneModel LIMIT 10""")

  private val q11 = q("""
    SELECT MobilePhone, MobilePhoneModel,
           CAST(COUNT(DISTINCT UserID) AS BIGINT) AS u
    FROM hits WHERE MobilePhoneModel <> ''
    GROUP BY MobilePhone, MobilePhoneModel
    ORDER BY u DESC, MobilePhone, MobilePhoneModel LIMIT 10""")

  private val q12 = q("""
    SELECT SearchPhrase, CAST(COUNT(*) AS BIGINT) AS c
    FROM hits WHERE SearchPhrase <> ''
    GROUP BY SearchPhrase
    ORDER BY c DESC, SearchPhrase LIMIT 10""")

  private val q13 = q("""
    SELECT SearchPhrase, CAST(COUNT(DISTINCT UserID) AS BIGINT) AS u
    FROM hits WHERE SearchPhrase <> ''
    GROUP BY SearchPhrase
    ORDER BY u DESC, SearchPhrase LIMIT 10""")

  private val q14 = q("""
    SELECT SearchEngineID, SearchPhrase, CAST(COUNT(*) AS BIGINT) AS c
    FROM hits WHERE SearchPhrase <> ''
    GROUP BY SearchEngineID, SearchPhrase
    ORDER BY c DESC, SearchEngineID, SearchPhrase LIMIT 10""")

  private val q15 = q("""
    SELECT UserID, CAST(COUNT(*) AS BIGINT) AS c
    FROM hits GROUP BY UserID
    ORDER BY c DESC, UserID LIMIT 10""")

  private val q16 = q("""
    SELECT UserID, SearchPhrase, CAST(COUNT(*) AS BIGINT) AS c
    FROM hits GROUP BY UserID, SearchPhrase
    ORDER BY c DESC, UserID, SearchPhrase LIMIT 10""")

  private val q17 = q("""
    SELECT UserID, SearchPhrase, CAST(COUNT(*) AS BIGINT) AS c
    FROM hits GROUP BY UserID, SearchPhrase
    ORDER BY UserID, SearchPhrase LIMIT 10""", headline = true)

  private val q18 = q("""
    SELECT UserID, extract(minute FROM EventTime) AS m, SearchPhrase,
           CAST(COUNT(*) AS BIGINT) AS c
    FROM hits GROUP BY UserID, m, SearchPhrase
    ORDER BY c DESC, UserID, m, SearchPhrase LIMIT 10""")

  private val q19 = q("SELECT UserID FROM hits WHERE UserID = 57")

  private val q20 = q(
    "SELECT CAST(COUNT(*) AS BIGINT) AS c FROM hits WHERE URL LIKE '%google%'")

  private val q21 = q("""
    SELECT SearchPhrase, MIN(URL) AS min_url, CAST(COUNT(*) AS BIGINT) AS c
    FROM hits
    WHERE URL LIKE '%google%' AND SearchPhrase <> ''
    GROUP BY SearchPhrase
    ORDER BY c DESC, SearchPhrase LIMIT 10""", headline = true)

  private val q22 = q("""
    SELECT SearchPhrase, MIN(URL) AS min_url, MIN(Title) AS min_title,
           CAST(COUNT(*) AS BIGINT) AS c,
           CAST(COUNT(DISTINCT UserID) AS BIGINT) AS u
    FROM hits
    WHERE Title LIKE '%Google%' AND URL NOT LIKE '%.google.%'
      AND SearchPhrase <> ''
    GROUP BY SearchPhrase
    ORDER BY c DESC, SearchPhrase LIMIT 10""")

  private val q23 = q("""
    SELECT WatchID, UserID, CAST(EventDate AS STRING) AS EventDate,
           EventTime, CounterID, ClientIP, RegionID, ResolutionWidth,
           SearchPhrase, SearchEngineID, AdvEngineID, MobilePhone,
           MobilePhoneModel, Title, URL, Referer, IsRefresh,
           DontCountHits, IsLink, IsDownload, TraficSourceID, URLHash,
           RefererHash, WindowClientWidth, WindowClientHeight
    FROM hits
    WHERE URL LIKE '%google%'
    ORDER BY EventTime, WatchID, UserID, URL LIMIT 10""")

  private val q24 = q("""
    SELECT SearchPhrase FROM hits WHERE SearchPhrase <> ''
    ORDER BY EventTime, SearchPhrase, WatchID LIMIT 10""")

  private val q25 = q("""
    SELECT SearchPhrase FROM hits WHERE SearchPhrase <> ''
    ORDER BY SearchPhrase, EventTime, WatchID LIMIT 10""")

  private val q26 = q("""
    SELECT SearchPhrase FROM hits WHERE SearchPhrase <> ''
    ORDER BY EventTime, SearchPhrase, WatchID LIMIT 10""")

  private val q27 = q("""
    SELECT CounterID, AVG(length(URL)) AS l, CAST(COUNT(*) AS BIGINT) AS c
    FROM hits WHERE URL <> ''
    GROUP BY CounterID HAVING COUNT(*) > 100
    ORDER BY l DESC, CounterID LIMIT 25""")

  private val q28 = q("""
    SELECT regexp_extract(Referer, '^https?://(?:www[.])?([^/]+)/.*$', 1) AS k,
           AVG(length(Referer)) AS l,
           CAST(COUNT(*) AS BIGINT) AS c,
           MIN(Referer) AS min_ref
    FROM hits WHERE Referer <> ''
    GROUP BY k HAVING COUNT(*) > 100
    ORDER BY l DESC, k LIMIT 25""", headline = true)

  private val q29 = q {
    val sums = (0 to 89).map {
      case 0 => "CAST(SUM(ResolutionWidth) AS BIGINT) AS s0"
      case k => s"CAST(SUM(ResolutionWidth + $k) AS BIGINT) AS s$k"
    }.mkString(",\n           ")
    s"SELECT $sums\n    FROM hits"
  }

  private val q30 = q("""
    SELECT SearchEngineID, ClientIP, CAST(COUNT(*) AS BIGINT) AS c,
           CAST(SUM(IsRefresh) AS BIGINT) AS sum_refresh,
           AVG(ResolutionWidth) AS avg_rw
    FROM hits WHERE SearchPhrase <> ''
    GROUP BY SearchEngineID, ClientIP
    ORDER BY c DESC, SearchEngineID, ClientIP LIMIT 10""")

  private val q31 = q("""
    SELECT WatchID, ClientIP, CAST(COUNT(*) AS BIGINT) AS c,
           CAST(SUM(IsRefresh) AS BIGINT) AS sum_refresh,
           AVG(ResolutionWidth) AS avg_rw
    FROM hits WHERE SearchPhrase <> ''
    GROUP BY WatchID, ClientIP
    ORDER BY c DESC, WatchID, ClientIP LIMIT 10""")

  private val q32 = q("""
    SELECT WatchID, ClientIP, CAST(COUNT(*) AS BIGINT) AS c,
           CAST(SUM(IsRefresh) AS BIGINT) AS sum_refresh,
           AVG(ResolutionWidth) AS avg_rw
    FROM hits
    GROUP BY WatchID, ClientIP
    ORDER BY c DESC, WatchID, ClientIP LIMIT 10""", headline = true)

  private val q33 = q("""
    SELECT URL, CAST(COUNT(*) AS BIGINT) AS c
    FROM hits GROUP BY URL
    ORDER BY c DESC, URL LIMIT 10""")

  private val q34 = q("""
    SELECT 1 AS one, URL, CAST(COUNT(*) AS BIGINT) AS c
    FROM hits GROUP BY 1, 2
    ORDER BY c DESC, URL LIMIT 10""")

  private val q35 = q("""
    SELECT ClientIP, ClientIP - 1 AS cm1, ClientIP - 2 AS cm2,
           ClientIP - 3 AS cm3, CAST(COUNT(*) AS BIGINT) AS c
    FROM hits
    GROUP BY ClientIP, ClientIP - 1, ClientIP - 2, ClientIP - 3
    ORDER BY c DESC, ClientIP LIMIT 10""")

  private val q36 = q("""
    SELECT URL, CAST(COUNT(*) AS BIGINT) AS PageViews
    FROM hits
    WHERE CounterID = 62
      AND EventDate >= '2013-07-01' AND EventDate <= '2013-07-31'
      AND DontCountHits = 0 AND IsRefresh = 0 AND URL <> ''
    GROUP BY URL
    ORDER BY PageViews DESC, URL LIMIT 10""")

  private val q37 = q("""
    SELECT Title, CAST(COUNT(*) AS BIGINT) AS PageViews
    FROM hits
    WHERE CounterID = 62
      AND EventDate >= '2013-07-01' AND EventDate <= '2013-07-31'
      AND DontCountHits = 0 AND IsRefresh = 0 AND Title <> ''
    GROUP BY Title
    ORDER BY PageViews DESC, Title LIMIT 10""")

  private val q38 = q("""
    SELECT URL, CAST(COUNT(*) AS BIGINT) AS PageViews
    FROM hits
    WHERE CounterID = 62
      AND EventDate >= '2013-07-01' AND EventDate <= '2013-07-31'
      AND IsRefresh = 0 AND IsLink <> 0 AND IsDownload = 0
    GROUP BY URL
    ORDER BY PageViews DESC, URL LIMIT 10 OFFSET 10""")

  private val q39 = q("""
    SELECT TraficSourceID, SearchEngineID, AdvEngineID,
           CASE WHEN (SearchEngineID = 0 AND AdvEngineID = 0)
                THEN Referer ELSE '' END AS Src,
           URL AS Dst,
           CAST(COUNT(*) AS BIGINT) AS PageViews
    FROM hits
    WHERE CounterID = 62
      AND EventDate >= '2013-07-01' AND EventDate <= '2013-07-31'
      AND IsRefresh = 0
    GROUP BY TraficSourceID, SearchEngineID, AdvEngineID, Src, Dst
    ORDER BY PageViews DESC, TraficSourceID, SearchEngineID,
             AdvEngineID, Src, Dst
    LIMIT 10 OFFSET 10""")

  private val q40 = q("""
    SELECT URLHash, CAST(EventDate AS STRING) AS EventDate, CAST(COUNT(*) AS BIGINT) AS PageViews
    FROM hits
    WHERE CounterID = 62
      AND EventDate >= '2013-07-01' AND EventDate <= '2013-07-31'
      AND IsRefresh = 0
      AND TraficSourceID IN (-1, 6)
      AND RefererHash = 17
    GROUP BY URLHash, EventDate
    ORDER BY PageViews DESC, URLHash, EventDate
    LIMIT 10 OFFSET 1""")

  private val q41 = q("""
    SELECT WindowClientWidth, WindowClientHeight,
           CAST(COUNT(*) AS BIGINT) AS PageViews
    FROM hits
    WHERE CounterID = 62
      AND EventDate >= '2013-07-01' AND EventDate <= '2013-07-31'
      AND IsRefresh = 0 AND DontCountHits = 0
      AND URLHash = 5099
    GROUP BY WindowClientWidth, WindowClientHeight
    ORDER BY PageViews DESC, WindowClientWidth, WindowClientHeight
    LIMIT 10 OFFSET 1""")

  private val q42 = q("""
    SELECT DATE_TRUNC('minute', EventTime) AS M,
           CAST(COUNT(*) AS BIGINT) AS PageViews
    FROM hits
    WHERE CounterID = 62
      AND EventDate >= '2013-07-14' AND EventDate <= '2013-07-15'
      AND IsRefresh = 0 AND DontCountHits = 0
    GROUP BY DATE_TRUNC('minute', EventTime)
    ORDER BY DATE_TRUNC('minute', EventTime)
    LIMIT 10 OFFSET 10""")

  override def queries: Seq[(String, Q)] = Seq(
    "cb_q00" -> q00, "cb_q01" -> q01, "cb_q02" -> q02, "cb_q03" -> q03,
    "cb_q04" -> q04, "cb_q05" -> q05, "cb_q06" -> q06, "cb_q07" -> q07,
    "cb_q08" -> q08, "cb_q09" -> q09, "cb_q10" -> q10, "cb_q11" -> q11,
    "cb_q12" -> q12, "cb_q13" -> q13, "cb_q14" -> q14, "cb_q15" -> q15,
    "cb_q16" -> q16, "cb_q17" -> q17, "cb_q18" -> q18, "cb_q19" -> q19,
    "cb_q20" -> q20, "cb_q21" -> q21, "cb_q22" -> q22, "cb_q23" -> q23,
    "cb_q24" -> q24, "cb_q25" -> q25, "cb_q26" -> q26, "cb_q27" -> q27,
    "cb_q28" -> q28, "cb_q29" -> q29, "cb_q30" -> q30, "cb_q31" -> q31,
    "cb_q32" -> q32, "cb_q33" -> q33, "cb_q34" -> q34, "cb_q35" -> q35,
    "cb_q36" -> q36, "cb_q37" -> q37, "cb_q38" -> q38, "cb_q39" -> q39,
    "cb_q40" -> q40, "cb_q41" -> q41, "cb_q42" -> q42)
}
