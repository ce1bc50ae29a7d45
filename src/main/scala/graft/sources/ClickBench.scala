package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic ClickBench-shaped `hits` table + view registry.
  *
  * The reference ships the full 43-query ClickBench suite
  * (benchmark/hits/queries/00..42.sql) over a denormalized web-hits
  * table. This module generates a seeded, fully deterministic hits
  * dataset with the 26 columns those queries touch, the same way
  * `Tpcds` does: every value is a pure function of the row id via
  * xxhash64, generation is distributed (spark.range), and the DuckDB
  * oracle reads the SAME parquet via read_parquet() CTEs.
  *
  * Domain choices the queries depend on:
  *  - UserID < 1e8 and a hot-user head, so AVG(UserID) sums stay
  *    exactly representable in doubles on BOTH engines (the real
  *    ClickBench 2^64 ids would make avg() order-dependent);
  *  - URL/Title/Referer vocabularies contain 'google'/'Google'/
  *    '.google.' spellings so the LIKE-family queries select real
  *    subsets;
  *  - URLHash/RefererHash are small-domain hashes so the
  *    point-lookup queries (40/41) can use constants that exist at
  *    every scale factor;
  *  - EventDate spans 2013-07-01..2013-09-30 (the suite's constants
  *    live in July 2013).
  */
object ClickBench {

  def dataDir(sfDir: String): String =
    s"/tmp/graft_hits_cb/${new java.io.File(sfDir).getName}"

  private def sfOf(sfDir: String): Double = {
    val n = new java.io.File(sfDir).getName.stripPrefix("sf")
    try math.max(n.toDouble, 0.001) catch { case _: NumberFormatException => 0.01 }
  }

  private val genVersion = "graft-hits-cb-v1"

  private val registered =
    new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()

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
    val df = registered.computeIfAbsent(key, _ => spark.read.parquet(s"$out/hits"))
    df.createOrReplaceTempView("hits")
    out
  }

  private def H(seed: String, k: Column, m: Long): Column =
    pmod(xxhash64(lit(seed), k), lit(m))
  private def pick(seed: String, k: Column, vs: Seq[String]): Column =
    element_at(array(vs.map(lit): _*), (H(seed, k, vs.length) + 1).cast("int"))

  private val widths = Seq(1366, 1920, 1280, 1440, 1536, 360, 414, 768, 1600, 2560)
  private val hosts = Seq("example", "google", "www.google", "shop", "news",
    "maps.google", "video", "forum", "blog", "wiki", "mail", "social")
  private val refHosts = Seq("example", "google", "search", "news", "portal",
    "www.referrer", "social", "blog")
  private val titleWords = Seq("Home", "Google Search", "News", "Shop",
    "Maps by Google", "Video", "Forum", "Blog", "Wiki", "Mail")

  private def generate(spark: SparkSession, sf: Double, out: String): Unit = {
    val n = math.max(50000L, (10000000L * sf).toLong)
    val nUrls = 5000L
    val nTitles = 2000L
    val nRefs = 3000L
    val parts = math.max(8, (n / 250000L).toInt)
    val baseDate = lit("2013-07-01").cast("date")

    val id = col("id")
    // ~35% of traffic from 1000 hot users; the rest uniform below 1e8
    val userId = when(H("uhot", id, 100) < 35, H("uh", id, 1000L))
      .otherwise(H("uc", id, 100000000L))
    val day = H("day", id, 92L)
    val secs = H("sec", id, 86400L)
    val urlN = H("urln", id, nUrls)
    val url = concat(lit("http://"), pick("uhost", urlN, hosts),
      lit(".com/path"), urlN, lit("/page"), H("upage", urlN, 50L))
    val titleN = H("titn", id, nTitles)
    val title = concat(pick("tw", titleN, titleWords), lit(" - page "), titleN)
    val refN = H("refn", id, nRefs)
    val referer = when(H("refe", id, 100) < 20, lit(""))
      .otherwise(concat(lit("https://"), pick("rhost", refN, refHosts),
        lit(".org/ref"), refN))
    val phrase = when(H("spe", id, 100) < 80, lit(""))
      .otherwise(concat(lit("search phrase "), H("spn", id, 1000L)))

    val hits = spark.range(n).toDF("id").select(
      H("wid", id, 1000000000000000L).as("WatchID"),
      userId.as("UserID"),
      date_add(baseDate, day.cast("int")).as("EventDate"),
      to_timestamp(from_unixtime(
        unix_timestamp(baseDate) + day * 86400L + secs)).as("EventTime"),
      H("cnt", id, 100L).cast("int").as("CounterID"),
      H("cip", id, 2147483647L).cast("int").as("ClientIP"),
      H("reg", id, 200L).cast("int").as("RegionID"),
      element_at(array(widths.map(lit): _*),
        (H("rw", id, widths.length) + 1).cast("int")).as("ResolutionWidth"),
      phrase.as("SearchPhrase"),
      when(phrase === "", lit(0))
        .otherwise((H("se", id, 5) + 1).cast("int")).cast("int").as("SearchEngineID"),
      when(H("adv", id, 10) === 0, (H("advid", id, 18) + 1).cast("int"))
        .otherwise(lit(0)).cast("int").as("AdvEngineID"),
      when(H("mp", id, 100) < 15, (H("mpv", id, 10) + 1).cast("int"))
        .otherwise(lit(0)).cast("int").as("MobilePhone"),
      when(H("mp", id, 100) < 15, concat(lit("Model "), H("mpm", id, 30L)))
        .otherwise(lit("")).as("MobilePhoneModel"),
      title.as("Title"),
      url.as("URL"),
      referer.as("Referer"),
      when(H("rf", id, 10) === 0, 1).otherwise(0).cast("int").as("IsRefresh"),
      when(H("dch", id, 20) === 0, 1).otherwise(0).cast("int").as("DontCountHits"),
      when(H("lnk", id, 5) === 0, 1).otherwise(0).cast("int").as("IsLink"),
      when(H("dl", id, 20) === 0, 1).otherwise(0).cast("int").as("IsDownload"),
      (H("tsrc", id, 11) - 1).cast("int").as("TraficSourceID"), // -1..9
      pmod(xxhash64(lit("uh2"), url), lit(10000L)).as("URLHash"),
      pmod(xxhash64(lit("rh2"), referer), lit(10000L)).as("RefererHash"),
      (H("wcw", id, 1920) + 1).cast("int").as("WindowClientWidth"),
      (H("wch", id, 1080) + 1).cast("int").as("WindowClientHeight"))

    hits.repartition(parts).write.mode("overwrite").parquet(s"$out/hits")
  }
}
