package graft

import org.scalatest.funsuite.AnyFunSuite

/** The reference's full aggregate registry (aggregates/aggregator.rs:
  * 71-192, 62 registrations) resolved through SQL, plus semantics
  * checks for the names added in round 6. The parameterized-call forms
  * (window_funnel / retention / intersect_count use databend's
  * `fn(params)(args)` syntax, which Spark SQL cannot parse) are
  * library-level Aggregators and asserted as such.
  */
class AggSurfaceSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = GraftSession(cpus = 8, appName = "graft-agg-surface")
    graft.functions.GraftFunctions.register(s)
    s
  }

  /** Names whose databend parameterized call syntax required a flat
    * SQL respelling: window_funnel(w, t, c...), retention(c...),
    * intersect_count(bm, tag, v...). All resolve — nothing is left at
    * library level.
    */
  private val LibraryLevel = Set.empty[String]

  test("every aggregator.rs registration resolves (or is documented library-level)") {
    val src = "/root/reference/src/query/functions/src/aggregates/aggregator.rs"
    assume(new java.io.File(src).exists(), "reference checkout not present")
    val text = scala.io.Source.fromFile(src).getLines().mkString("\n")
    val names = scala.collection.mutable.LinkedHashSet.empty[String]
    """register(?:_multi_names)?\(\s*(?:&\[)?((?:\s*"[a-z0-9_]+",?)+)""".r
      .findAllMatchIn(text)
      .foreach(m => """"([a-z0-9_]+)"""".r.findAllMatchIn(m.group(1))
        .foreach(g => names += g.group(1)))
    // drop the suffix combinators (_if/_distinct/_state): Spark spells
    // them FILTER (WHERE ...), DISTINCT, and the *_state/merge UDAFs
    val plain = names.toSeq.filterNot(_.startsWith("_"))
    assert(plain.size >= 60, s"parse drift: only ${plain.size} aggregate names")
    val missing = plain.filter { n =>
      !(try spark.catalog.functionExists(n) catch { case _: Exception => false })
    }.toSet
    assert(missing == LibraryLevel,
      s"not SQL-resolvable and not documented: ${(missing -- LibraryLevel).toSeq.sorted.mkString(",")}; " +
        s"documented-but-now-registered: ${(LibraryLevel -- missing).toSeq.sorted.mkString(",")}")
  }

  test("sum0/sum_zero return 0 on empty input where sum returns NULL") {
    val r = spark.sql(
      "SELECT sum(x) AS s, sum0(x) AS s0, sum_zero(x) AS sz FROM (SELECT 1 AS x WHERE false)")
      .head()
    assert(r.isNullAt(0) && !r.isNullAt(1) && !r.isNullAt(2))
    assert(r.getLong(1) == 0L && r.getLong(2) == 0L)
  }

  test("quantile / quantile_disc pick floor((n-1)*q); quantile_cont interpolates") {
    import spark.implicits._
    Seq(10.0, 20.0, 30.0, 40.0).toDF("v").createOrReplaceTempView("qd_probe")
    // (n-1)*q = 3*0.5 = 1.5 -> floor 1 -> 20.0 (reference
    // aggregate_quantile_disc.rs:185)
    assert(spark.sql("SELECT quantile_disc(v, 0.5) FROM qd_probe").head().getDouble(0) == 20.0)
    assert(spark.sql("SELECT quantile(v, 0.5) FROM qd_probe").head().getDouble(0) == 20.0)
    assert(spark.sql("SELECT quantile_cont(v, 0.5) FROM qd_probe").head().getDouble(0) == 25.0)
    assert(spark.sql("SELECT quantile_disc(v, 1.0) FROM qd_probe").head().getDouble(0) == 40.0)
    assert(spark.sql("SELECT quantile_disc(v, 0.0) FROM qd_probe").head().getDouble(0) == 10.0)
  }

  test("median_tdigest and weighted tdigest spellings agree with exact medians") {
    import spark.implicits._
    (1 to 1001).map(_.toDouble).toDF("v").createOrReplaceTempView("td_probe")
    val m = spark.sql("SELECT median_tdigest(v) FROM td_probe").head().getDouble(0)
    assert(math.abs(m - 501.0) <= 5.0, s"median_tdigest = $m")
    val q9 = spark.sql("SELECT quantile_tdigest(v, 0.9) FROM td_probe").head().getDouble(0)
    assert(math.abs(q9 - 901.0) <= 10.0, s"quantile_tdigest(0.9) = $q9")
    // weight w ~ w copies: median of {1x1, 2x2, 3x3} (mass 6) is ~2.5
    Seq((1.0, 1L), (2.0, 2L), (3.0, 3L)).toDF("v", "w")
      .createOrReplaceTempView("tdw_probe")
    val wm = spark.sql("SELECT median_tdigest_weighted(v, w) FROM tdw_probe")
      .head().getDouble(0)
    assert(wm >= 2.0 && wm <= 3.0, s"median_tdigest_weighted = $wm")
    val wq = spark.sql("SELECT quantile_tdigest_weighted(v, w, 0.99) FROM tdw_probe")
      .head().getDouble(0)
    assert(math.abs(wq - 3.0) < 0.51, s"quantile_tdigest_weighted(0.99) = $wq")
  }

  test("list/string_agg/std/variance aliases carry reference semantics") {
    import spark.implicits._
    Seq(2.0, 4.0, 4.0, 4.0, 5.0, 5.0, 7.0, 9.0).toDF("v")
      .coalesce(1).createOrReplaceTempView("alias_probe")
    assert(spark.sql("SELECT sort_array(list(v)) FROM alias_probe")
      .head().getSeq[Double](0).head == 2.0)
    // reference std = stddev_POP (aggregator.rs:102): this sample has
    // pop stddev exactly 2
    assert(math.abs(spark.sql("SELECT std(v) FROM alias_probe").head().getDouble(0) - 2.0) < 1e-12)
    assert(math.abs(spark.sql("SELECT variance_pop(v) FROM alias_probe").head().getDouble(0) - 4.0) < 1e-12)
    val vs = spark.sql("SELECT variance_samp(v), var_samp(v) FROM alias_probe").head()
    assert(vs.getDouble(0) == vs.getDouble(1))
    assert(spark.sql("SELECT string_agg(cast(v AS INT), '|') FROM alias_probe")
      .head().getString(0) == "2|4|4|4|5|5|7|9")
  }

  test("json_agg / json_array_agg / json_object_agg emit variant JSON") {
    import spark.implicits._
    Seq(("a", 1), ("b", 2)).toDF("k", "n").coalesce(1)
      .createOrReplaceTempView("json_probe")
    assert(spark.sql("SELECT json_array_agg(n) FROM json_probe")
      .head().getString(0) == "[1,2]")
    assert(spark.sql("SELECT json_agg(k) FROM json_probe")
      .head().getString(0) == """["a","b"]""")
    assert(spark.sql("SELECT json_object_agg(k, n) FROM json_probe")
      .head().getString(0) == """{"a":1,"b":2}""")
  }

  test("bitmap aggregate family: construct/union/intersect/xor/not counts") {
    import spark.implicits._
    // three bitmaps: {1,2,3}, {2,3,4}, {3,4,5}
    Seq("1,2,3", "2,3,4", "3,4,5").toDF("s")
      .selectExpr("to_bitmap(s) AS bm").coalesce(1)
      .createOrReplaceTempView("bm_probe")
    def one(q: String): Long = spark.sql(q).head().getLong(0)
    assert(one("SELECT bitmap_or_count(bm) FROM bm_probe") == 5L)   // {1..5}
    assert(one("SELECT bitmap_and_count(bm) FROM bm_probe") == 1L)  // {3}
    // xor: {1,2,3}^{2,3,4}^{3,4,5} = {1,3,5}
    assert(one("SELECT bitmap_xor_count(bm) FROM bm_probe") == 3L)
    // not: {1,2,3} \ {2,3,4} \ {3,4,5} = {1}
    assert(one("SELECT bitmap_not_count(bm) FROM bm_probe") == 1L)
    assert(one("SELECT bitmap_count(bitmap_union(bm)) FROM bm_probe") == 5L)
    assert(one("SELECT bitmap_count(bitmap_intersect(bm)) FROM bm_probe") == 1L)
    assert(one("SELECT bitmap_count(bitmap_xor_agg(bm)) FROM bm_probe") == 3L)
    // construct from ints
    Seq(1, 2, 2, 7).toDF("x").createOrReplaceTempView("bmc_probe")
    assert(one("SELECT bitmap_count(bitmap_construct_agg(x)) FROM bmc_probe") == 3L)
    assert(one("SELECT bitmap_count(group_bitmap(x)) FROM bmc_probe") == 3L)
    // intersect_count: SQL spelling and library helper agree, and an
    // absent tag is SKIPPED per the reference's own slt (its group with
    // only tag 'b' present returns that union's count, not 0)
    val df = Seq(("a", "1,2,3"), ("a", "4"), ("b", "2,4")).toDF("tag", "s")
      .selectExpr("tag", "to_bitmap(s) AS bm")
    assert(graft.functions.BitmapAggs.intersectCount(df, "bm", "tag", Seq("a", "b")) == 2L) // {2,4}
    assert(graft.functions.BitmapAggs.intersectCount(df, "bm", "tag", Seq("b", "zz")) == 2L) // skip zz
    assert(graft.functions.BitmapAggs.intersectCount(df, "bm", "tag", Seq("zz", "yy")) == 0L)
    df.createOrReplaceTempView("ic_probe")
    assert(one("SELECT intersect_count(bm, tag, 'a', 'b') FROM ic_probe") == 2L)
    assert(one("SELECT intersect_count(bm, tag, 'b', 'zz') FROM ic_probe") == 2L)
    assert(one("SELECT intersect_count(bm, tag, 'zz', 'yy') FROM ic_probe") == 0L)
  }

  test("group_array_moving_sum / moving_avg windows") {
    import spark.implicits._
    Seq(1.0, 2.0, 3.0, 4.0).toDF("v").coalesce(1)
      .createOrReplaceTempView("mov_probe")
    assert(spark.sql("SELECT group_array_moving_sum(v) FROM mov_probe")
      .head().getSeq[Double](0) == Seq(1.0, 3.0, 6.0, 10.0))
    assert(spark.sql("SELECT group_array_moving_sum(v, 2) FROM mov_probe")
      .head().getSeq[Double](0) == Seq(1.0, 3.0, 5.0, 7.0))
    assert(spark.sql("SELECT group_array_moving_avg(v, 2) FROM mov_probe")
      .head().getSeq[Double](0) == Seq(1.0, 1.5, 2.5, 3.5))
  }

  test("flat SQL window_funnel and retention spellings") {
    import spark.implicits._
    // events at t=0..8 carrying ids 1000..1008 (reference
    // 02_0011_function_window_funnel.test shape)
    (0 to 8).map(i => (i, 1000 + i)).toDF("t", "event")
      .createOrReplaceTempView("funnel_sql_probe")
    def lvl(conds: String): Int = spark.sql(
      s"SELECT window_funnel(10000, t, $conds) FROM funnel_sql_probe").head().getInt(0)
    assert(lvl("event = 1000") == 1)
    assert(lvl("event = 1000, event = 1001") == 2)
    assert(lvl("event = 1000, event = 1001, event = 1002") == 3)
    assert(lvl("event = 1000, event = 1001, event = 1002, event = 1008") == 4)
    // a tight window cuts the chain: step 2 at t=8 is outside w=5 of t=0
    assert(spark.sql(
      "SELECT window_funnel(5, t, event = 1000, event = 1008) FROM funnel_sql_probe")
      .head().getInt(0) == 1)
    // retention: conditions fire on different rows of the same group
    Seq((1, "a"), (1, "b"), (2, "a")).toDF("uid", "day")
      .createOrReplaceTempView("ret_sql_probe")
    val r = spark.sql(
      "SELECT uid, retention(day = 'a', day = 'b') AS r FROM ret_sql_probe GROUP BY uid ORDER BY uid")
      .collect().map(x => (x.getInt(0), x.getSeq[Int](1)))
    assert(r.toSeq == Seq((1, Seq(1, 1)), (2, Seq(1, 0))))
  }

  test("histogram emits equi-height JSON buckets with pre_sum") {
    import spark.implicits._
    (1 to 100).map(_.toDouble).toDF("v").createOrReplaceTempView("hist_probe")
    val js = spark.sql("SELECT histogram(v, 4) FROM hist_probe").head().getString(0)
    val counts = """"count":(\d+)""".r.findAllMatchIn(js).map(_.group(1).toInt).toSeq
    assert(counts.sum == 100 && counts.length == 4, js)
    val preSums = """"pre_sum":(\d+)""".r.findAllMatchIn(js).map(_.group(1).toInt).toSeq
    assert(preSums == Seq(0, 25, 50, 75), js)
    assert(js.contains(""""lower":"1"""") && js.contains(""""upper":"100""""), js)
    // reference slt: equal values never split across buckets —
    // histogram(c_id) over 2 ids x 6 rows = 2 buckets of count 6
    import spark.implicits._
    (Seq.fill(6)(1.0) ++ Seq.fill(6)(2.0)).toDF("v").createOrReplaceTempView("hist2_probe")
    assert(spark.sql("SELECT histogram(v) FROM hist2_probe").head().getString(0) ==
      """[{"lower":"1","upper":"1","ndv":1,"count":6,"pre_sum":0},""" +
      """{"lower":"2","upper":"2","ndv":1,"count":6,"pre_sum":6}]""")
  }
}
