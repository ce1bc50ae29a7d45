package graft

import graft.sources.GraftTable
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SparkSessionExtensions injection + cluster-by write path. */
class ExtensionsSpec extends AnyFunSuite {

  test("GraftExtensions injects functions into a fresh session") {
    SparkSession.getActiveSession.foreach(_.stop())
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-ext-test")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      val r = spark.sql(
        """SELECT hamming64(7, 56) AS hd,
          |  to_year(TIMESTAMP '2020-03-04') AS y,
          |  uniq(x) AS u
          |FROM VALUES (1), (2), (2) t(x)
          |GROUP BY 1, 2""".stripMargin).head()
      assert(r.getInt(0) == java.lang.Long.bitCount(7L ^ 56L))
      assert(r.getInt(1) == 2020)
      assert(r.getLong(2) == 2L)
      val fl = spark.sql(
        "SELECT f.path, f.value FROM VALUES (1) t(x) " +
        "LATERAL VIEW flatten_json('{\"a\": [10, 20]}') f AS key, path, index, value")
        .collect().map(r2 => (r2.getString(0), r2.getString(1))).toSeq
      assert(fl == Seq(("a", "[10,20]")))
      // databend keypath syntax -> JSONPath at bind time
      val kp = spark.sql(
        """SELECT get_by_keypath('{"a": {"b": [10, 20]}}', '{a,b,1}') AS v,
          |  get_by_keypath_string('{"a": {"name": "x"}}', '{a,name}') AS s,
          |  get_by_keypath('{"a": 1}', '{missing}') AS miss""".stripMargin).head()
      assert(kp.getString(0) == "20")
      assert(kp.getString(1) == "x")
      assert(kp.isNullAt(2))
    } finally {
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
  }

  test("recluster produces range-disjoint files enabling zone-map pruning") {
    val spark = GraftSession(cpus = 4, appName = "graft-recluster-test")
    import spark.implicits._
    val base = java.nio.file.Files.createDirectories(java.nio.file.Paths.get("target", "tmp"))
    val dir = java.nio.file.Files.createTempDirectory(base, "clus").toString
    // keys deliberately interleaved so unclustered files all span the full range
    val df = (0 until 10000).map(i => ((i * 37) % 1000, s"row$i")).toDF("k", "v")
    val t = GraftTable.create(spark, dir, df.repartition(8))
    t.recluster(Seq("k"), numFiles = 8)

    val files = t.snapshot(t.currentVersion).files
    assert(files.size > 1)
    val ranges = files.map { f =>
      val r = spark.read.parquet(s"$dir/$f").agg(min($"k"), max($"k")).head()
      (r.getInt(0), r.getInt(1))
    }.sortBy(_._1)
    // ranges must not overlap: file i's max < file i+1's min (range partitioned)
    ranges.sliding(2).foreach {
      case Seq((_, hi), (lo2, _)) => assert(hi <= lo2, s"overlapping ranges: $ranges")
      case _ =>
    }
    // a selective key predicate now maps to exactly one file's range
    val hit = ranges.count { case (lo, hi) => lo <= 500 && 500 <= hi }
    assert(hit == 1)
    assert(t.read().count() == 10000)
  }

  test("hilbert recluster keeps BOTH key ranges narrow per file") {
    val spark = GraftSession(cpus = 4, appName = "graft-hilbert-test")
    import spark.implicits._
    val base = java.nio.file.Files.createDirectories(java.nio.file.Paths.get("target", "tmp"))
    // a 100x100 grid: lexicographic sort on (x, y) makes every file
    // span the FULL y domain; the hilbert curve keeps both tight
    val grid = (0 until 10000).map(i => (i / 100, i % 100)).toDF("x", "y")

    def avgSpans(t: GraftTable): (Double, Double) = {
      val spans = t.snapshot(t.currentVersion).files.map { f =>
        val r = spark.read.parquet(s"${t.path}/$f")
          .agg(min($"x"), max($"x"), min($"y"), max($"y")).head()
        (r.getInt(1) - r.getInt(0), r.getInt(3) - r.getInt(2))
      }
      (spans.map(_._1).sum.toDouble / spans.size,
       spans.map(_._2).sum.toDouble / spans.size)
    }

    val lin = GraftTable.create(spark,
      java.nio.file.Files.createTempDirectory(base, "lin").toString, grid.repartition(8))
    lin.recluster(Seq("x", "y"), numFiles = 16)
    val (_, linY) = avgSpans(lin)

    val hil = GraftTable.create(spark,
      java.nio.file.Files.createTempDirectory(base, "hil").toString, grid.repartition(8))
    hil.recluster(Seq("x", "y"), numFiles = 16, curve = "hilbert")
    val (hilX, hilY) = avgSpans(hil)

    // lexicographic: y spans ~the full 0..99 domain in every file
    assert(linY > 90, s"expected full y span under linear sort, got $linY")
    // hilbert: both dimensions stay well under half the domain
    assert(hilX < 50 && hilY < 50, s"hilbert spans too wide: x=$hilX y=$hilY")
    assert(hil.read().count() == 10000)

    // hilbert index sanity: consecutive d values are grid neighbours
    val pts = (0 until 256).map { d0 =>
      val d = d0.toLong
      (0 until 256).collectFirst {
        case i if GraftTable.hilbertIndex(4, i / 16, i % 16) == d => (i / 16, i % 16)
      }.get
    }
    pts.sliding(2).foreach { case Seq((x1, y1), (x2, y2)) =>
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"hilbert discontinuity between ($x1,$y1) and ($x2,$y2)")
    }
  }

  test("n-dim hilbert: Skilling key is a true curve; 3-key recluster narrows all dims") {
    val spark = GraftSession(cpus = 4, appName = "graft-hilbert3-test")
    import spark.implicits._
    // curve property in 3-D: sorting all 8^3 cells of an order-3 cube
    // by hilbertBytes visits grid NEIGHBOURS consecutively
    val cells = for (x <- 0 until 8; y <- 0 until 8; z <- 0 until 8)
      yield (x.toLong, y.toLong, z.toLong)
    implicit val byteOrd: Ordering[Array[Byte]] =
      (a, b) => java.util.Arrays.compareUnsigned(a, b)
    val walk = cells.sortBy { case (x, y, z) =>
      GraftTable.hilbertBytes(3, Array(x, y, z))
    }
    assert(walk.distinct.size == 512)
    walk.sliding(2).foreach { case Seq((x1, y1, z1), (x2, y2, z2)) =>
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) + math.abs(z1 - z2) == 1,
        s"3-D hilbert discontinuity ($x1,$y1,$z1) -> ($x2,$y2,$z2)")
    }
    // 2-D Skilling agrees with the curve property too (same path family
    // as hilbertIndex even if the traversal orientation differs)
    val walk2 = (for (x <- 0 until 16; y <- 0 until 16) yield (x.toLong, y.toLong))
      .sortBy { case (x, y) => GraftTable.hilbertBytes(4, Array(x, y)) }
    walk2.sliding(2).foreach { case Seq((x1, y1), (x2, y2)) =>
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1)
    }

    // recluster with THREE keys (the reference's ClickBench table
    // clusters on five): every dimension's per-file span stays well
    // under the domain, where lexicographic leaves later keys full-span
    val base = java.nio.file.Files.createDirectories(java.nio.file.Paths.get("target", "tmp"))
    val grid = (0 until 8000).map { i =>
      (i / 400, (i / 20) % 20, i % 20)
    }.toDF("x", "y", "z")
    val hil = GraftTable.create(spark,
      java.nio.file.Files.createTempDirectory(base, "hil3").toString, grid.repartition(8))
    hil.recluster(Seq("x", "y", "z"), numFiles = 16, curve = "hilbert")
    val spans = hil.snapshot(hil.currentVersion).files.map { f =>
      val r = spark.read.parquet(s"${hil.path}/$f")
        .agg(min($"x"), max($"x"), min($"y"), max($"y"), min($"z"), max($"z")).head()
      (r.getInt(1) - r.getInt(0), r.getInt(3) - r.getInt(2), r.getInt(5) - r.getInt(4))
    }
    val (ax, ay, az) = (
      spans.map(_._1).sum.toDouble / spans.size,
      spans.map(_._2).sum.toDouble / spans.size,
      spans.map(_._3).sum.toDouble / spans.size)
    assert(ax < 12 && ay < 14 && az < 14, s"3-key hilbert spans too wide: $ax $ay $az")
    assert(hil.read().count() == 8000)
  }
}
